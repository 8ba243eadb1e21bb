"""Reporting-layer units: hyperparameter table/CSV (reference
``src/utils.py:237-265``) and the honest-timing helper."""

import csv

import jax.numpy as jnp
import numpy as np

from dis_project_tpu.data.dataset import P53Data
from dis_project_tpu.models import simm
from dis_project_tpu.reporting import tables


class TestHyperparamTables:
    def _fixtures(self):
        data = P53Data(replicate=0, source="synthetic")
        params = simm.init_params(5)
        return data, params

    def test_rows_match_params(self):
        data, params = self._fixtures()
        rows = tables.hyperparam_rows(params, data)
        assert [r[0] for r in rows] == list(data.gene_names)
        np.testing.assert_allclose([r[1] for r in rows], 0.05)
        np.testing.assert_allclose([r[2] for r in rows], 1.0)
        np.testing.assert_allclose([r[3] for r in rows], 0.4)

    def test_shared_kinetics_broadcast_per_gene(self):
        data, _ = self._fixtures()
        params = simm.init_params(5, shared_kinetics=True)
        rows = tables.hyperparam_rows(params, data)
        assert len(rows) == 5  # (1,)-shaped kinetics shown for every gene

    def test_format_contains_every_gene(self):
        data, params = self._fixtures()
        out = tables.format_hyperparams(params, data)
        for name in data.gene_names:
            assert name in out

    def test_csv_round_trip(self, tmp_path):
        data, params = self._fixtures()
        path = tables.write_hyperparams_csv(
            params, data, str(tmp_path / "h.csv")
        )
        with open(path) as f:
            got = list(csv.reader(f))
        assert got[0] == tables.HEADERS
        assert len(got) == 1 + 5
        assert [r[0] for r in got[1:]] == list(data.gene_names)
        np.testing.assert_allclose(
            [float(r[3]) for r in got[1:]], np.asarray(params.decay)
        )


def test_time_op_returns_positive_seconds():
    """time_op's chained-execution slope estimator must work on CPU too
    (it is the only trusted timer over the remote-TPU tunnel)."""
    from dis_project_tpu.utils.benchmarking import time_op

    x = jnp.ones((64, 64))
    s = time_op(lambda eps, x: (x + eps) @ x, x, iters=2, repeats=1)
    assert np.isfinite(s) and s > 0
