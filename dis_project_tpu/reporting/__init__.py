"""Reporting: plots, tables, CSV artifacts (parity with reference src/plots)."""

from dis_project_tpu.reporting.plotter import (
    plot_comparison,
    plot_gene_predictions,
    plot_lf,
)
from dis_project_tpu.reporting.tables import (
    format_hyperparams,
    print_hyperparams,
    write_hyperparams_csv,
)

__all__ = [
    "plot_comparison",
    "plot_gene_predictions",
    "plot_lf",
    "format_hyperparams",
    "print_hyperparams",
    "write_hyperparams_csv",
]
