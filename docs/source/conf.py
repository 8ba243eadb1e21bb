"""Sphinx configuration for dis_project_tpu.

NumPy-style docstrings are the API contract (mirroring the reference's
autodoc+napoleon docs, reference ``docs/source/conf.py:1-48``); build with
``make -C docs html``.
"""

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "dis_project_tpu"
author = "dis_project_tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]

autodoc_member_order = "bysource"
autodoc_typehints = "description"
napoleon_numpy_docstring = True
napoleon_google_docstring = False

# Heavy/optional imports the doc build should not require.
autodoc_mock_imports = ["torch", "orbax", "matplotlib", "tabulate"]

html_theme = "alabaster"
exclude_patterns = []
