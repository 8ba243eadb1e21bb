"""Posterior prediction tests: interpolation sanity, latent-force recovery,
reference-parity structural details."""

import jax.numpy as jnp
import numpy as np
import pytest

from dis_project_tpu.data import barenco
from dis_project_tpu.data.dataset import P53Data, dataset_3d
from dis_project_tpu.models import simm
from dis_project_tpu.training import trainer as tr
from dis_project_tpu.utils.test_grids import (
    latent_grid,
    expression_grid,
)


@pytest.fixture(scope="module")
def trained():
    data = P53Data(replicate=0, source="synthetic")
    X, y, var = dataset_3d(data)
    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    res = tr.fit(model, simm.init_params(5), X, y, tr.TrainConfig(num_iters=150))
    return data, model, res.params, X, y, var


def test_latent_predict_shapes(trained):
    data, model, params, X, y, var = trained
    t = latent_grid(100)
    dist = model.latent_predict(params, t, X, y, var)
    assert dist.mean.shape == (100,)
    assert dist.cov.shape == (100, 100)
    # Diagonalised covariance: off-diagonals exactly zero.
    off = np.asarray(dist.cov) - np.diag(np.diagonal(np.asarray(dist.cov)))
    assert np.all(off == 0.0)
    assert np.all(np.asarray(dist.stddev()) > 0)


def test_latent_force_recovered(trained):
    """On synthetic data generated from the true ODE, the inferred latent
    force must correlate strongly with the force that generated the data."""
    data, model, params, X, y, var = trained
    t = latent_grid(100)
    dist = model.latent_predict(params, t, X, y, var)
    truth = barenco.interpolate_force(np.asarray(t[:, 0]))
    m = np.asarray(dist.mean)
    corr = np.corrcoef(m, truth)[0, 1]
    assert corr > 0.9


def test_gene_expression_interpolates_data(trained):
    """Posterior mean at the training times must track the observations."""
    data, model, params, X, y, var = trained
    grid = expression_grid(data.num_genes, t=100)
    dist = model.multi_gene_predict(params, grid, X, y, var)
    assert dist.mean.shape == (500,)
    times = np.asarray(grid[:100, 0])
    y_np = np.asarray(y).reshape(5, 7)
    # The posterior smooths through both the fixed per-point measurement
    # variance and the learned observation noise.
    obs = float(params.obs_stddev)
    for g in range(5):
        mean_g = np.asarray(dist.mean[g * 100 : (g + 1) * 100])
        for ti, tv in enumerate(np.linspace(0, 12, 7)):
            idx = np.argmin(np.abs(times - tv))
            resid = abs(mean_g[idx] - y_np[g, ti])
            noise = np.sqrt(np.asarray(var).reshape(5, 7)[g, ti] + obs**2)
            assert resid < 3 * noise


def test_multi_gene_predict_forces_flag(trained):
    data, model, params, X, y, var = trained
    grid = expression_grid(data.num_genes, t=20)
    grid_flag0 = grid.at[:, 2].set(0)
    d1 = model.multi_gene_predict(params, grid, X, y, var)
    d2 = model.multi_gene_predict(params, grid_flag0, X, y, var)
    np.testing.assert_allclose(np.asarray(d1.mean), np.asarray(d2.mean), rtol=1e-12)


def test_legacy_one_based_grid_shifts_params(trained):
    """The reference's 1-based expression grid (src/utils.py:92) silently
    evaluates gene i's rows with gene i+1's kinetics via clamped gathers —
    verify our one_based grid reproduces that shift against the 0-based one."""
    data, model, params, X, y, var = trained
    grid0 = expression_grid(data.num_genes, t=30, one_based=False)
    grid1 = expression_grid(data.num_genes, t=30, one_based=True)
    d0 = model.multi_gene_predict(params, grid0, X, y, var)
    d1 = model.multi_gene_predict(params, grid1, X, y, var)
    m0 = np.asarray(d0.mean).reshape(5, 30)
    m1 = np.asarray(d1.mean).reshape(5, 30)
    # one-based block g uses kinetics of gene g+1 (clamped): its covariance
    # rows differ from the 0-based block g for every non-terminal gene.
    assert not np.allclose(m0[0], m1[0])
    # Means differ between the two conventions overall.
    assert not np.allclose(m0, m1)


def test_latent_predict_excludes_learned_noise(trained):
    """Reference latent_predict adds fixed variances + jitter but NOT the
    learned obs noise (src/model.py:446-449); inflating obs_stddev must not
    change the latent posterior."""
    data, model, params, X, y, var = trained
    t = latent_grid(50)
    d1 = model.latent_predict(params, t, X, y, var)
    params_noisy = params._replace(obs_stddev=jnp.asarray(17.0, params.obs_stddev.dtype))
    d2 = model.latent_predict(params_noisy, t, X, y, var)
    np.testing.assert_allclose(np.asarray(d1.mean), np.asarray(d2.mean), rtol=1e-12)
