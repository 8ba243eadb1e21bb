"""Data layer tests: container semantics, encodings, validation, generator."""

import jax.numpy as jnp
import numpy as np
import pytest

from dis_project_tpu.data import barenco
from dis_project_tpu.data.dataset import (
    P53Data,
    dataset_3d,
    flatten_blocked,
)


def test_shapes_single_replicate():
    d = P53Data(replicate=0, source="synthetic")
    assert d.num_genes == 5
    assert d.num_replicates == 1
    assert d.gene_expressions.shape == (1, 5, 7)
    X, y, var = dataset_3d(d)
    assert X.shape == (35, 3)
    assert y.shape == (35, 1)
    assert var.shape == (35, 1)
    # Row layout: gene-major blocks of 7 timepoints, flag 1.
    np.testing.assert_array_equal(np.asarray(X[:7, 1]), np.zeros(7))
    np.testing.assert_array_equal(np.asarray(X[7:14, 1]), np.ones(7))
    np.testing.assert_array_equal(np.asarray(X[:, 2]), np.ones(35))
    np.testing.assert_allclose(np.asarray(X[:7, 0]), np.linspace(0, 12, 7))


def test_shapes_all_replicates():
    d = P53Data(replicate=None, source="synthetic")
    assert d.num_replicates == 3
    X, y, var = dataset_3d(d)
    assert X.shape == (105, 3)
    # Replicate-major then gene-major: rows 35..41 are replicate 1, gene 0.
    np.testing.assert_array_equal(np.asarray(X[35:42, 1]), np.zeros(7))
    # y ordering matches container indexing.
    t, expr = d[5]  # replicate 1, gene 0
    np.testing.assert_allclose(np.asarray(y[35:42, 0]), np.asarray(expr))


def test_replicate_validation():
    with pytest.raises(AssertionError):
        P53Data(replicate=3, source="synthetic")


def test_gene_subset_selection_and_validation():
    d = P53Data(replicate=0, selected_genes=["p21", "DDB2"], source="synthetic")
    # Dataset order is preserved (DDB2 before p21), like the reference.
    assert d.gene_names == ["DDB2", "p21"]
    assert d.num_genes == 2
    B, S, D = d.params_ground_truth()
    np.testing.assert_allclose(B, [0.0649, 0.0033])
    np.testing.assert_allclose(D, [0.2829, 0.8000])

    with pytest.raises(ValueError, match="Invalid gene names"):
        P53Data(selected_genes=["NOPE"], source="synthetic")
    with pytest.raises(ValueError, match="Duplicate genes"):
        P53Data(selected_genes=["p21", "p21"], source="synthetic")
    with pytest.raises(ValueError, match="Empty list"):
        P53Data(selected_genes=[], source="synthetic")


def test_flatten_blocked():
    d = P53Data(replicate=0, source="synthetic")
    t, y = flatten_blocked(d)
    assert t.shape == (35,)
    assert y.shape == (35,)
    np.testing.assert_allclose(np.asarray(t[:7]), np.linspace(0, 12, 7))
    np.testing.assert_allclose(np.asarray(t[7:14]), np.linspace(0, 12, 7))


def test_synthetic_deterministic():
    a = barenco.synthetic(seed=0)
    b = barenco.synthetic(seed=0)
    np.testing.assert_array_equal(a["gene_expressions"], b["gene_expressions"])
    c = barenco.synthetic(seed=1)
    assert not np.array_equal(a["gene_expressions"], c["gene_expressions"])


def test_synthetic_dynamics_plausible():
    """The generator integrates the true ODE: expressions must be positive,
    and the p21 (high-decay) gene must track the force with the least lag."""
    d = barenco.synthetic(seed=0)
    expr = d["gene_expressions"]
    assert expr.shape == (3, 5, 7)
    assert np.all(expr > -0.5)
    # Clean simulation check: steady start near B/D.
    clean = barenco.simulate_expression(
        barenco.TIMEPOINTS, barenco.B_EXACT, barenco.S_EXACT, barenco.D_EXACT
    )
    np.testing.assert_allclose(
        clean[0], barenco.B_EXACT / barenco.D_EXACT, rtol=1e-6
    )
    # Response rises after the force peak at t=4.
    assert np.all(clean[2] > clean[0])


def test_f_observed_published_profile():
    d = P53Data(replicate=0, source="synthetic")
    np.testing.assert_allclose(
        np.asarray(d.f_observed).ravel(),
        [0.1845, 1.1785, 1.6160, 0.8156, 0.6862, -0.1828, 0.5131],
    )
