"""Config/CLI surface: argument parsing, preset routing fields, and the
canonical pipeline entry (smoke, synthetic source, tiny iteration count)."""

import argparse

from dis_project_tpu import config as cfg


def _parse(argv):
    p = argparse.ArgumentParser()
    cfg.add_cli_args(p)
    return cfg.config_from_args(p.parse_args(argv))


class TestConfigParsing:
    def test_defaults_match_reference_canonical_run(self):
        c = _parse([])
        assert c.num_iters == 150
        assert c.learning_rate == 0.01
        # --jitter defaults to None and resolves per path: 1e-4 for the
        # exact pipelines (reference src/main.py:41), 1e-6 sparse.
        assert c.jitter is None
        assert c.exact_jitter == 1e-4
        assert c.sparse_jitter == 1e-6
        assert c.fix_params is True
        assert c.x64 is True
        assert c.replicate == 0
        assert c.preset == "p53"
        assert c.model == "simm"

    def test_replicate_all(self):
        assert _parse(["--replicate", "all"]).replicate is None
        assert _parse(["--replicate", "2"]).replicate == 2

    def test_gene_subset(self):
        c = _parse(["--genes", "p21,DDB2"])
        assert c.selected_genes == ["p21", "DDB2"]

    def test_preset_and_engine_flags(self):
        c = _parse(
            ["--preset", "dense10k", "--mll-engine", "cg",
             "--synth-genes", "20", "--synth-timepoints", "50"]
        )
        assert c.preset == "dense10k"
        assert c.mll_engine == "cg"
        assert c.synth_genes == 20 and c.synth_timepoints == 50

    def test_sparse_flags(self):
        c = _parse(
            ["--preset", "sparse100k", "--num-inducing", "64",
             "--batch-size", "512", "--num-epochs", "7"]
        )
        assert (c.num_inducing, c.batch_size, c.num_epochs) == (64, 512, 7)

    def test_ablation_and_precision_flags(self):
        c = _parse(["--no-fix-params", "--no-x64", "--optimizer", "lbfgs"])
        assert c.fix_params is False
        assert c.x64 is False
        assert c.optimizer == "lbfgs"

    def test_resume_and_io_flags(self):
        c = _parse(
            ["--checkpoint-dir", "/tmp/x", "--resume",
             "--metrics-path", "m.jsonl", "--out-dir", "o"]
        )
        assert c.resume is True
        assert c.checkpoint_dir == "/tmp/x"
        assert c.metrics_path == "m.jsonl"
        assert c.out_dir == "o"


class TestPipelineEntry:
    def test_resume_from_legacy_checkpoint(self, tmp_path, capsys):
        """--resume against a pre-r2 checkpoint ({params, step} only, no
        optimizer state) must warm-start instead of failing on the orbax
        tree-structure mismatch (r2 review finding)."""
        from dis_project_tpu import main as entry
        from dis_project_tpu.models import simm
        from dis_project_tpu.training import checkpoint as ckpt

        ckdir = str(tmp_path / "ck")
        legacy_params = simm.init_params(5)
        ckpt.save(ckdir, {"params": legacy_params, "step": 3}, 3)
        c = cfg.RunConfig(
            replicate=0,
            data_source="synthetic",
            num_iters=4,
            out_dir=str(tmp_path / "plots"),
            checkpoint_dir=ckdir,
            resume=True,
        )
        entry.run(c)
        out = capsys.readouterr().out
        assert "legacy checkpoint step 3" in out

    def test_canonical_run_smoke(self, tmp_path):
        """The full run() path end-to-end on synthetic data: trains, writes
        metrics JSONL, hyperparams CSV and the three plots."""
        import json
        import os

        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            replicate=0,
            data_source="synthetic",
            num_iters=5,
            out_dir=str(tmp_path / "plots"),
            metrics_path=str(tmp_path / "m.jsonl"),
        )
        entry.run(c)
        lines = open(c.metrics_path).read().strip().splitlines()
        assert len(lines) == 5
        rec = json.loads(lines[-1])
        assert {"step", "loss", "grad_norm"} <= set(rec)
        for name in ("lf.png", "gxpr.png", "comparison.png"):
            assert os.path.exists(os.path.join(c.out_dir, name))

    def test_zero_iteration_smoke(self, tmp_path):
        """--num-iters 0 exercises the data/report plumbing without
        training (r2 review: the empty history used to crash at [-1])."""
        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            replicate=0,
            data_source="synthetic",
            num_iters=0,
            out_dir=str(tmp_path / "plots"),
        )
        entry.run(c)  # must complete; final loss prints as nan

    def test_dense_route_smoke(self, tmp_path):
        """run_dense end-to-end at toy scale (the dense10k preset's code
        path: segmented scan, table/row Gram dispatch, recovery report)."""
        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            data_source="synthetic",
            num_iters=6,
            synth_genes=4,
            synth_timepoints=16,
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_dense(c)

    def test_dense_route_dist_engine_smoke(self, tmp_path):
        """run_dense with --mll-engine dist: the row-sharded GSPMD
        Cholesky MLL over the 8-device virtual mesh as the training
        objective (N=288 > the 128 leaf block, so the factorisation
        actually shards)."""
        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            data_source="synthetic",
            num_iters=4,
            synth_genes=4,
            synth_timepoints=72,
            mll_engine="dist",
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_dense(c)

    def test_dense_route_ss_engine_smoke(self, tmp_path):
        """run_dense with --mll-engine ss: the O(T) state-space Kalman
        MLL as the training objective; recovery sanity on a short fit."""
        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            data_source="synthetic",
            num_iters=6,
            synth_genes=4,
            synth_timepoints=32,
            mll_engine="ss",
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_dense(c)

    def test_dense_route_ss_shard_smoke(self, tmp_path):
        """run_dense with --mll-engine ss --ss-shard: the temporally-
        sharded Kalman filter over the 8-device virtual mesh as the
        training objective (T-1 = 32 splits over 8 devices), and the
        trajectory matches the unsharded engine's exactly."""
        import numpy as np

        from dis_project_tpu import main as entry

        kw = dict(
            data_source="synthetic",
            num_iters=4,
            synth_genes=4,
            synth_timepoints=33,
            mll_engine="ss",
        )
        r_sh = entry.run_dense(cfg.RunConfig(
            ss_shard=True, out_dir=str(tmp_path / "sh"), **kw
        ))
        r_ref = entry.run_dense(cfg.RunConfig(
            out_dir=str(tmp_path / "ref"), **kw
        ))
        delta = np.abs(
            np.asarray(r_sh.history) - np.asarray(r_ref.history)
        ).max()
        assert delta < 1e-8, delta

    def test_dense_ss_posterior_smoke(self, tmp_path):
        """run_dense --mll-engine ss --posterior-samples: full-Bayes
        kinetics through the O(T) state-space likelihood — accept line,
        capped credible-interval report, and the BMA smoothed-force band
        (dense_ss_bma) written."""
        import os

        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            data_source="synthetic",
            num_iters=4,
            synth_genes=4,
            synth_timepoints=24,
            mll_engine="ss",
            posterior_samples=6,
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_dense(c)
        assert os.path.exists(tmp_path / "plots" / "lf_dense_ss_bma.png")
        assert os.path.exists(
            tmp_path / "plots" / "posterior_kinetics_dense_ss.png"
        )

    def test_dense_multiforce_ss_route_smoke(self, tmp_path):
        """run_dense with --model multisimm --mll-engine ss: dense-scale
        R-force training through the block-diagonal-force Kalman engine
        (the family's only dense-scale route), recovery report printed."""
        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            data_source="synthetic",
            model="multisimm",
            num_forces=2,
            num_iters=6,
            synth_genes=4,
            synth_timepoints=32,
            mll_engine="ss",
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_dense(c)

    def test_dense_delay_ss_route_smoke(self, tmp_path):
        """run_dense with --model delaysimm --mll-engine ss: dense-scale
        delayed-response training through the warped-event Kalman engine
        (the family's only dense-scale route), delay-recovery report
        printed; plain dense10k delaysimm must fail loudly."""
        import pytest

        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            data_source="synthetic",
            model="delaysimm",
            num_iters=6,
            synth_genes=4,
            synth_timepoints=24,
            mll_engine="ss",
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_dense(c)
        with pytest.raises(SystemExit, match="requires --mll-engine ss"):
            entry.main([
                "--preset", "dense10k", "--model", "delaysimm",
                "--data-source", "synthetic",
            ])

    def test_dense_ss_matern_force_smoke(self, tmp_path):
        """--mll-engine ss --force-kernel matern32: the EXACT Matern
        force prior through the Kalman engine; --force-kernel outside
        the simm ss route must fail loudly."""
        import pytest

        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            data_source="synthetic",
            num_iters=6,
            synth_genes=4,
            synth_timepoints=24,
            mll_engine="ss",
            force_kernel="matern32",
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_dense(c)
        with pytest.raises(SystemExit, match="force-kernel requires"):
            entry.main(["--force-kernel", "matern32"])
        # --stationary-after (r5): the steady-state gain knob shares the
        # ss-engine requirement and rejects non-uniform families.
        with pytest.raises(SystemExit, match="stationary-after requires"):
            entry.main(["--stationary-after", "32"])
        with pytest.raises(SystemExit, match="UNIFORM-grid family"):
            entry.main([
                "--preset", "dense10k", "--mll-engine", "ss",
                "--model", "delaysimm", "--stationary-after", "32",
            ])
        with pytest.raises(SystemExit, match="incompatible with --ss-shard"):
            entry.main([
                "--preset", "dense10k", "--mll-engine", "ss", "--ss-shard",
                "--stationary-after", "32",
            ])
        with pytest.raises(SystemExit, match="force-kernel requires"):
            entry.main([
                "--preset", "dense10k", "--mll-engine", "cholesky",
                "--force-kernel", "matern52",
            ])
        # multisimm + ss ACCEPTS the flag (same prior for every force).
        c2 = cfg.RunConfig(
            data_source="synthetic",
            model="multisimm",
            num_forces=2,
            num_iters=3,
            synth_genes=4,
            synth_timepoints=24,
            mll_engine="ss",
            force_kernel="matern32",
            out_dir=str(tmp_path / "plots2"),
        )
        entry.run_dense(c2)

    def test_dense_delay_ss_posterior_smoke(self, tmp_path):
        """--preset dense10k --model delaysimm --mll-engine ss
        --posterior-samples: full-Bayes (kinetics, delays) through the
        warped-event likelihood — the accept line, the capped CI table
        and the posterior-delay-vs-truth table print."""
        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            data_source="synthetic",
            model="delaysimm",
            num_iters=6,
            synth_genes=4,
            synth_timepoints=24,
            mll_engine="ss",
            posterior_samples=8,
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_dense(c)

    def test_dense_nlfm_ekf_route_smoke(self, tmp_path):
        """run_dense with --model nlfm --mll-engine ss: the extended
        Kalman marginal route (force integrated out); plain dense10k nlfm
        and --ss-shard on the EKF route must fail loudly."""
        import pytest

        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            data_source="synthetic",
            model="nlfm",
            num_iters=6,
            synth_genes=4,
            synth_timepoints=24,
            mll_engine="ss",
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_dense(c)
        with pytest.raises(SystemExit, match="requires --mll-engine ss"):
            entry.main([
                "--preset", "dense10k", "--model", "nlfm",
                "--data-source", "synthetic",
            ])
        with pytest.raises(SystemExit, match="not supported on the nlfm"):
            entry.main([
                "--preset", "dense10k", "--model", "nlfm",
                "--mll-engine", "ss", "--ss-shard",
            ])

    def test_dense_second_order_ss_route_smoke(self, tmp_path):
        """run_dense with --model simm2 --mll-engine ss: the spring-damper
        family through the (x, v)-state Kalman engine instead of the
        order-2 table Gram."""
        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            data_source="synthetic",
            model="simm2",
            num_iters=6,
            synth_genes=4,
            synth_timepoints=32,
            mll_engine="ss",
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_dense(c)

    def test_multiforce_route_smoke(self, tmp_path):
        """run_multiforce end-to-end at toy scale: 2-force fit on the
        p53-shaped synthetic data, per-force latent plots written."""
        import os

        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            model="multisimm",
            num_forces=2,
            data_source="synthetic",
            num_iters=8,
            out_dir=str(tmp_path / "plots"),
        )
        params, hist = entry.run_multiforce(c)
        assert params.sensitivity.shape == (5, 2)
        for r in range(2):
            assert os.path.exists(
                str(tmp_path / "plots" / f"lf_multiforce_f{r}.png")
            )

    def test_posterior_samples_smoke(self, tmp_path, capsys):
        """--posterior-samples: HMC kinetics posterior after training,
        credible-interval table + histogram grid artifact, and the BMA
        latent-force band (or its honest skip when every draw lands where
        the reference-convention covariance fails PSD)."""
        import os

        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            data_source="synthetic",
            num_iters=10,
            posterior_samples=20,
            out_dir=str(tmp_path / "plots"),
        )
        entry.run(c)
        assert os.path.exists(
            str(tmp_path / "plots" / "posterior_kinetics.png")
        )
        # BMA latent force: band artifact when any component survived,
        # otherwise the explicit skip line — never a silent NaN plot.
        out = capsys.readouterr().out
        if "skipping the BMA band" in out:
            assert not os.path.exists(str(tmp_path / "plots" / "lf_bma.png"))
        else:
            assert "BMA latent-force band" in out
            assert os.path.exists(str(tmp_path / "plots" / "lf_bma.png"))

    def test_nonlinear_route_smoke(self, tmp_path):
        """run_nonlinear end-to-end at toy scale: exp-response MAP fit,
        Laplace latent + per-gene band plots written."""
        import os

        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            model="nlfm",
            response="exp",
            num_quad=25,
            data_source="synthetic",
            num_iters=30,
            out_dir=str(tmp_path / "plots"),
        )
        params, hist = entry.run_nonlinear(c)
        assert params.w.shape == (25,)
        # p21 pin applied (by name) on the constrained result.
        import numpy as np

        np.testing.assert_allclose(float(params.kinetics.sensitivity[3]),
                                   1.0, rtol=1e-6)
        assert os.path.exists(str(tmp_path / "plots" / "lf_nlfm.png"))
        assert os.path.exists(str(tmp_path / "plots" / "gxpr_nlfm.png"))

    def test_nonlinear_posterior_force_band_smoke(self, tmp_path, capsys):
        """--posterior-samples on the nlfm route: the HMC state carries the
        whitened force, so the route must emit the full-Bayes force band
        (empirical over f_s = L(l_s) w_s) next to the Laplace band."""
        import os

        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            model="nlfm",
            response="exp",
            num_quad=25,
            data_source="synthetic",
            num_iters=30,
            posterior_samples=10,
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_nonlinear(c)
        out = capsys.readouterr().out
        assert "HMC force band" in out
        assert os.path.exists(str(tmp_path / "plots" / "lf_nlfm_hmc.png"))
        assert os.path.exists(
            str(tmp_path / "plots" / "posterior_kinetics_nlfm.png")
        )

    def test_nonlinear_guards(self):
        import pytest

        from dis_project_tpu import main as entry

        with pytest.raises(SystemExit, match="nlfm"):
            entry.main(["--model", "nlfm", "--preset", "dense10k"])
        with pytest.raises(SystemExit, match="num-quad"):
            entry.run_nonlinear(
                cfg.RunConfig(model="nlfm", num_quad=2,
                              data_source="synthetic")
            )
        with pytest.raises(SystemExit, match="--shared-kinetics"):
            entry.run_nonlinear(
                cfg.RunConfig(model="nlfm", shared_kinetics=True,
                              data_source="synthetic")
            )
        with pytest.raises(SystemExit, match="--resume requires"):
            entry.run_nonlinear(
                cfg.RunConfig(model="nlfm", resume=True,
                              data_source="synthetic")
            )

    def test_nonlinear_metrics_and_trace(self, tmp_path, capsys):
        """r3: --metrics-path / --track-parameters are shared route
        infrastructure — the nlfm route writes the same JSONL records and
        the param-trace artifact as the exact route (VERDICT r2 #6)."""
        import json as json_

        import os

        from dis_project_tpu import main as entry

        mpath = str(tmp_path / "m.jsonl")
        c = cfg.RunConfig(
            model="nlfm",
            data_source="synthetic",
            num_iters=10,
            num_quad=33,
            metrics_path=mpath,
            track_parameters=True,
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_nonlinear(c)
        rows = [json_.loads(l) for l in open(mpath)]
        assert len(rows) == 10
        assert {"step", "loss", "grad_norm"} <= set(rows[0])
        assert os.path.exists(str(tmp_path / "plots" / "param_trace_nlfm.png"))

    def test_nonlinear_num_iters_default(self):
        assert _parse(["--model", "nlfm"]).num_iters == 2000
        assert _parse([]).num_iters == 150
        assert _parse(["--model", "nlfm", "--num-iters", "7"]).num_iters == 7

    def test_posterior_chains_smoke(self, tmp_path, capsys):
        """--posterior-chains 2: per-chain accept rates and the
        split-R-hat / ESS convergence line."""
        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            data_source="synthetic",
            num_iters=20,
            posterior_samples=20,
            posterior_chains=2,
            out_dir=str(tmp_path / "plots"),
        )
        entry.run(c)
        out = capsys.readouterr().out
        assert "convergence over 2 chains" in out
        assert "split-R-hat" in out and "ESS" in out

    def test_posterior_chains_guards(self):
        import pytest

        from dis_project_tpu import main as entry

        with pytest.raises(SystemExit, match="posterior-samples"):
            entry.main(["--posterior-chains", "2"])
        with pytest.raises(SystemExit, match="posterior-chains"):
            entry.main(["--posterior-chains", "0"])
        assert _parse(["--posterior-chains", "4"]).posterior_chains == 4
        assert _parse([]).posterior_chains == 1

    def test_version_in_sync_with_pyproject(self):
        import os
        import re

        import dis_project_tpu

        root = os.path.dirname(os.path.dirname(dis_project_tpu.__file__))
        with open(os.path.join(root, "pyproject.toml")) as f:
            m = re.search(r'^version = "([^"]+)"', f.read(), re.M)
        assert m and m.group(1) == dis_project_tpu.__version__

    def test_delay_route_smoke(self, tmp_path):
        """run_delay end-to-end at toy scale: delayed exact SIMM fit, p21
        kinetics + delay anchor pinned, latent plot written."""
        import os

        import numpy as np

        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            model="delaysimm",
            data_source="synthetic",
            num_iters=30,
            out_dir=str(tmp_path / "plots"),
        )
        params, hist = entry.run_delay(c)
        assert hist.shape == (30,)
        np.testing.assert_allclose(float(params.sensitivity[3]), 1.0,
                                   rtol=1e-6)
        assert float(params.delay[3]) < 1e-8  # p21 delay anchored at 0
        assert os.path.exists(str(tmp_path / "plots" / "lf_delay.png"))

    def test_delay_guards(self):
        import pytest

        from dis_project_tpu import main as entry

        with pytest.raises(SystemExit, match="delaysimm"):
            entry.main(["--model", "delaysimm", "--preset", "dense10k"])
        with pytest.raises(SystemExit, match="--shared-kinetics"):
            entry.run_delay(
                cfg.RunConfig(model="delaysimm", shared_kinetics=True,
                              data_source="synthetic")
            )

    def test_delay_metrics_lbfgs_checkpoint(self, tmp_path):
        """r3 shared route infrastructure on the delay route: metrics
        JSONL, --optimizer lbfgs, and checkpointed resume (the generic
        fit_checkpointed segments)."""
        import json as json_

        import os

        import numpy as np

        from dis_project_tpu import main as entry

        mpath = str(tmp_path / "m.jsonl")
        ckdir = str(tmp_path / "ckpt")
        c = cfg.RunConfig(
            model="delaysimm",
            data_source="synthetic",
            num_iters=12,
            optimizer="lbfgs",
            metrics_path=mpath,
            track_parameters=True,
            checkpoint_dir=ckdir,
            out_dir=str(tmp_path / "plots"),
        )
        params, hist = entry.run_delay(c)
        rows = [json_.loads(l) for l in open(mpath)]
        assert len(rows) == 12 and rows[-1]["loss"] <= rows[0]["loss"]
        assert os.path.exists(
            str(tmp_path / "plots" / "param_trace_delay.png")
        )
        # Resume from the persisted checkpoint: a rerun restores the final
        # step and trains 0 further steps (empty history).
        c2 = cfg.RunConfig(
            model="delaysimm",
            data_source="synthetic",
            num_iters=12,
            optimizer="lbfgs",
            checkpoint_dir=ckdir,
            resume=True,
            out_dir=str(tmp_path / "plots"),
        )
        params2, hist2 = entry.run_delay(c2)
        assert hist2.shape == (0,)
        for a, b in zip(
            np.asarray(params.delay), np.asarray(params2.delay)
        ):
            np.testing.assert_allclose(a, b, rtol=1e-12)

    def test_delay_posterior_smoke(self, tmp_path, capsys):
        """--posterior-samples on the delay route: joint (kinetics, delay)
        HMC with the credible-interval tables and histogram artifact."""
        import os

        import numpy as np

        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            model="delaysimm",
            data_source="synthetic",
            num_iters=20,
            posterior_samples=15,
            out_dir=str(tmp_path / "plots"),
        )
        params, _ = entry.run_delay(c)
        assert np.isfinite(np.asarray(params.delay)).all()
        assert os.path.exists(
            str(tmp_path / "plots" / "posterior_kinetics_delay.png")
        )
        # BMA latent force over the joint (kinetics, delay) posterior:
        # band artifact when any component survived, explicit skip if not.
        out = capsys.readouterr().out
        if "skipping the BMA band" not in out:
            assert "BMA latent-force band" in out
            assert os.path.exists(
                str(tmp_path / "plots" / "lf_delay_bma.png")
            )

    def test_multiforce_guards(self):
        import pytest

        from dis_project_tpu import main as entry

        with pytest.raises(SystemExit, match="multisimm"):
            entry.main(["--model", "multisimm", "--preset", "dense10k"])
        with pytest.raises(SystemExit, match="num-forces"):
            entry.run_multiforce(
                cfg.RunConfig(model="multisimm", num_forces=0,
                              data_source="synthetic")
            )

    def test_sparse_multiforce_route_smoke(self, tmp_path):
        """run_sparse with --model multisimm: multi-force quadrature data,
        stacked-inducing SVI, per-force recovery plots."""
        import os

        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            preset="sparse100k",
            model="multisimm",
            num_forces=2,
            data_source="synthetic",
            synth_genes=4,
            synth_timepoints=24,
            num_inducing=8,
            batch_size=32,
            num_epochs=2,
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_sparse(c)
        for r in range(2):
            assert os.path.exists(
                str(tmp_path / "plots" / f"lf_sparse_lf_f{r}.png")
            )

    def test_mll_engine_guard(self):
        """--mll-engine beyond 'cholesky' must fail loudly outside the
        first-order dense10k route."""
        import pytest

        from dis_project_tpu import main as entry

        with pytest.raises(SystemExit, match="mll-engine"):
            entry.main(["--preset", "p53", "--mll-engine", "dist"])
        with pytest.raises(SystemExit, match="mll-engine"):
            entry.main(
                ["--preset", "dense10k", "--model", "simm2",
                 "--mll-engine", "cg"]
            )
        # simm2/multisimm dense routes accept the state-space engine ONLY;
        # multisimm additionally REQUIRES it (no dense table Gram exists).
        with pytest.raises(SystemExit, match="mll-engine"):
            entry.main(
                ["--preset", "dense10k", "--model", "multisimm",
                 "--mll-engine", "dist"]
            )
        with pytest.raises(SystemExit, match="requires --mll-engine ss"):
            entry.main(["--preset", "dense10k", "--model", "multisimm"])
        # --ss-shard is a state-space-engine knob.
        with pytest.raises(SystemExit, match="requires --mll-engine ss"):
            entry.main(["--preset", "dense10k", "--ss-shard"])
        # The dense posterior route exists ONLY through the O(T)
        # state-space likelihood (and only for the first-order family).
        with pytest.raises(SystemExit, match="only supported"):
            entry.main(
                ["--preset", "dense10k", "--posterior-samples", "4"]
            )
        with pytest.raises(SystemExit, match="only supported"):
            entry.main(
                ["--preset", "dense10k", "--mll-engine", "ss",
                 "--model", "simm2", "--posterior-samples", "4"]
            )

    def test_sparse_route_smoke(self, tmp_path):
        """run_sparse end-to-end at toy scale (the sparse100k preset's
        code path: SVI minibatch loop, latent recovery plot)."""
        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            data_source="synthetic",
            synth_genes=4,
            synth_timepoints=24,
            num_inducing=8,
            batch_size=32,
            num_epochs=2,
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_sparse(c)

    def test_sparse_route_dp_shard_smoke(self, tmp_path):
        """run_sparse with --dp-shard: data-parallel SVI over the
        8-device virtual mesh (minibatch rows sharded, grads psum'd);
        --dp-shard outside sparse100k must fail loudly."""
        import pytest

        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            data_source="synthetic",
            synth_genes=4,
            synth_timepoints=24,
            num_inducing=8,
            batch_size=32,
            num_epochs=2,
            dp_shard=True,
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_sparse(c)
        with pytest.raises(SystemExit, match="requires --preset sparse100k"):
            entry.main(["--dp-shard"])

    def test_second_order_route_smoke(self, tmp_path):
        """run_second_order end-to-end (spring-damper kinetics table +
        latent plot) at a small iteration count."""
        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            data_source="synthetic",
            num_iters=5,
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_second_order(c)

    def test_ensemble_route_smoke(self, tmp_path):
        """run_replicate_ensemble end-to-end: the SPMD per-replicate
        ensemble route (single lax.scan program over the vmapped fit)."""
        from dis_project_tpu import main as entry

        c = cfg.RunConfig(
            data_source="synthetic",
            num_iters=5,
            replicate="all",
            ensemble=True,
            out_dir=str(tmp_path / "plots"),
        )
        entry.run_replicate_ensemble(c)

    def test_invalid_gene_raises(self):
        import pytest

        from dis_project_tpu.data.dataset import P53Data

        with pytest.raises(ValueError, match="Invalid gene names"):
            P53Data(replicate=0, source="synthetic", selected_genes=["FAKE"])

    def test_clamp_follows_p21_index_in_subsets(self, tmp_path):
        """The identifiability clamp targets p21 BY NAME: with a subset it
        must clamp p21's moved index, and with p21 absent it must not fire
        at all (regression: a hard-coded index 3 clamped SESN1)."""
        import numpy as np

        from dis_project_tpu import main as entry

        # p21 at index 1 -> clamped there.
        c = cfg.RunConfig(
            replicate=0, data_source="synthetic", num_iters=5,
            selected_genes=["p21", "DDB2"],
            out_dir=str(tmp_path / "a"),
        )
        res = entry.run(c)
        assert float(res.params.sensitivity[1]) == 1.0
        assert float(res.params.decay[1]) == 0.8
        assert float(res.params.sensitivity[0]) != 1.0

        # p21 absent -> nothing clamped.
        c = cfg.RunConfig(
            replicate=0, data_source="synthetic", num_iters=5,
            selected_genes=["DDB2", "BIK", "DR5", "SESN1"],
            out_dir=str(tmp_path / "b"),
        )
        res = entry.run(c)
        s = np.asarray(res.params.sensitivity)
        d = np.asarray(res.params.decay)
        assert not np.any(s == 1.0)
        assert not np.any(d == 0.8)
