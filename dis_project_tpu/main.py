"""Canonical end-to-end pipeline (the reference's ``python src/main.py``).

Run as ``python -m dis_project_tpu.main [flags]``. Reproduces the reference
pipeline (``src/main.py:30-78``): load replicate -> 3-column encoding ->
ExactSIMM(jitter=1e-4) -> negative conjugate MLL + Adam(0.01), 150
jit-compiled iterations with the p21 clamp -> hyperparameter table + CSV ->
latent-force posterior on a 100-point grid -> plots (latent force, per-gene
expression, kinetics comparison) — with a real CLI, metrics JSONL, and
checkpointing the reference lacks.
"""

from __future__ import annotations

import argparse
import json
import time

from dis_project_tpu import config as cfg


def _setup_backend(config: cfg.RunConfig):
    import jax

    platform = config.platform
    if platform is None and config.x64:
        # f64 on TPU is software-emulated and extremely slow to compile; the
        # parity (x64) pipeline defaults to CPU. Pass --platform tpu or
        # --no-x64 for the accelerator path. Checked via the configured
        # platforms string (not jax.default_backend()) to avoid initialising
        # the backend before we can still switch it.
        import os

        configured = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        first = configured.split(",")[0] if configured else ""
        if first and first != "cpu":
            print("x64 run: using CPU backend (TPU f64 is emulated; "
                  "use --no-x64 for the TPU-native f32 path)")
            platform = "cpu"
    if platform:
        jax.config.update("jax_platforms", platform)
    if config.x64:
        jax.config.update("jax_enable_x64", True)
    # Persistent XLA compile cache for ACCELERATOR runs: the stress configs
    # compile ~40 s of programs at N=1e4 over the remote-compile tunnel;
    # caching cuts warm dense10k walls ~62 -> ~19 s. Deliberately NOT
    # enabled for CPU runs: the axon remote service cross-compiles CPU AOT
    # with the server's machine features, and reloading such an entry
    # locally risks SIGILL (observed "+prefer-no-scatter ... could lead to
    # execution errors"). The guard checks the EFFECTIVE platform — the
    # --platform flag, the x64 CPU fallback above, or the JAX_PLATFORMS
    # environment — not just the flag. Opt out with DIS_TPU_COMPILE_CACHE=off.
    import os

    effective = platform or (
        jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    ).split(",")[0]
    # Fail CLOSED when nothing is configured (effective == ""): an
    # unconfigured host resolves its backend only at first use, and
    # enabling the cache before knowing it is not a CPU run would violate
    # the exclusion above on CPU-only hosts.
    if effective and effective != "cpu":
        cache_dir = os.environ.get(
            "DIS_TPU_COMPILE_CACHE", "/tmp/dis_tpu_xla_cache"
        )
        if cache_dir.lower() not in ("off", "0", "none"):
            try:
                jax.config.update("jax_compilation_cache_dir", cache_dir)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 0.0
                )
            except Exception:
                pass  # older jax without the knob — harmless


def _final_loss(hist) -> float:
    """Last entry of a loss history as float; NaN for a zero-iteration run
    (--num-iters 0 smoke-tests the data/plot plumbing without training)."""
    return float(hist[-1]) if len(hist) else float("nan")


def _finish_posterior(post, t0, config, data, save_name,
                      kin_from=lambda s: s, max_report_genes=None):
    """Shared post-sampling tail for every HMC route: timing + accept
    line, split-R-hat / ESS convergence diagnostics when more than one
    chain ran, chain pooling, and the credible-interval report.  Returns
    the (pooled) constrained samples pytree.

    ``kin_from`` extracts the SIMMParams-like kinetics view from the
    samples (identity for the exact/delay routes; ``.kinetics`` for nlfm).
    ``max_report_genes`` caps the credible-interval table and histogram
    grid (the dense stress routes have 50 genes; the full samples are
    still returned and marginalised).
    """
    import jax
    import numpy as np

    acc = np.atleast_1d(np.asarray(post.accept_rate))
    eps = np.atleast_1d(np.asarray(post.step_size))
    print(f"Sampled in {time.perf_counter() - t0:.2f}s "
          f"(accept rate {', '.join(f'{a:.2f}' for a in acc)}; "
          f"step size {', '.join(f'{e:.4f}' for e in eps)})")
    samples = post.samples
    if config.posterior_chains > 1:
        from dis_project_tpu.training import hmc

        rhat, ess = hmc.pytree_diagnostics(samples)
        total = config.posterior_chains * config.posterior_samples
        print(f"convergence over {config.posterior_chains} chains: "
              f"max split-R-hat {rhat:.4f} (converged: < ~1.05), "
              f"min ESS {ess:.0f} of {total} draws")
        samples = jax.tree_util.tree_map(
            lambda a: a.reshape((-1,) + a.shape[2:]), samples
        )
    _report_kinetics_posterior(
        kin_from(samples), data, save_name, config.out_dir,
        max_genes=max_report_genes,
    )
    return samples


def _plot_bma_latent(predict_fn, samples, plugin_dist, t_grid, data, config,
                     save_base, title):
    """Shared BMA tail for the exact/delay posterior routes: marginalise
    the pooled hyperparameter draws through ``predict_fn`` (one vmapped
    program), report the band-widening factor vs the plug-in predictive
    and any dropped non-PSD components, and write ``lf_<save_base>.png``.
    """
    import jax

    from dis_project_tpu.reporting import plotter
    from dis_project_tpu.training import hmc

    # Pass max_components EXPLICITLY and derive `requested` from the same
    # value, so the reported drop count can never desynchronise from
    # mixture_predict's default (ADVICE r2).
    max_components = 64
    requested = min(
        max_components, jax.tree_util.tree_leaves(samples)[0].shape[0]
    )
    bma, comp = hmc.mixture_predict(
        predict_fn, samples, max_components=max_components
    )
    if comp.shape[0] == 0:
        print(
            "BMA latent force: every mixture component landed where the "
            "reference-convention covariance fails PSD (non-finite "
            "predictive) — skipping the BMA band"
        )
        return
    dropped = requested - comp.shape[0]
    drop_note = f"; {dropped} non-PSD draws dropped" if dropped else ""
    widen = float(jax.numpy.mean(bma.stddev() / plugin_dist.stddev()))
    print(
        f"BMA latent-force band ({comp.shape[0]} mixture components"
        f"{drop_note}): mean stddev {widen:.2f}x the plug-in band"
    )
    plotter.plot_lf(
        t_grid,
        bma,
        y_scatter=data.f_observed,
        scatter_times=data.timepoints,
        title=title,
        save_name=save_base,
        out_dir=config.out_dir,
    )


def _report_kinetics_posterior(kin_samples, data, save_name, out_dir,
                               max_genes=None):
    """Unclamped-model note + credible-interval table + histogram grid for
    HMC kinetics samples (shared by the exact and nlfm posterior routes).

    ``kin_samples`` is any pytree with stacked (num_samples, G) ``basal``/
    ``sensitivity``/``decay`` leaves (``SIMMParams`` of samples).
    ``max_genes`` truncates the table and the histogram grid to the first
    K genes (the dense stress routes have 50; a 3 x 50 subplot grid is
    unreadable and the table would be 150 lines).
    """
    import numpy as np

    from dis_project_tpu.reporting import plotter

    print(
        "NOTE: the posterior is over the UNCLAMPED model — the p21 "
        "identifiability clamp is a point constraint the full "
        "posterior does not impose, so scale-coupled parameters "
        "(S x force amplitude, and decays through them) show the "
        "broad/shifted intervals the clamp exists to resolve."
    )
    names = list(data.gene_names)
    if max_genes is not None and len(names) > max_genes:
        print(f"(reporting the first {max_genes} of {len(names)} genes)")
        names = names[:max_genes]
        kin = {k: np.asarray(v) for k, v in kin_samples._asdict().items()}
        for k in ("basal", "sensitivity", "decay"):  # per-gene leaves only
            kin[k] = kin[k][..., :max_genes]
        kin_samples = type(kin_samples)(**kin)
        truth = tuple(
            np.asarray(v).ravel()[:max_genes]
            for v in data.params_ground_truth()
        )
        data = _KineticsReportView(names, truth)
    print("\nPosterior kinetics (mean +/- std [5%, 95%]):")
    for key in ("basal", "sensitivity", "decay"):
        vals = np.asarray(getattr(kin_samples, key))
        if vals.ndim == 1:
            vals = vals[:, None]
        for g, name in enumerate(names[: vals.shape[1]]):
            lo, hi = np.percentile(vals[:, g], [5, 95])
            print(f"  {key[:4]:<5} {name:<10} "
                  f"{vals[:, g].mean():.4f} +/- {vals[:, g].std():.4f} "
                  f"[{lo:.4f}, {hi:.4f}]")
    plotter.plot_posterior_kinetics(
        {
            "basal": np.asarray(kin_samples.basal),
            "sensitivity": np.asarray(kin_samples.sensitivity),
            "decay": np.asarray(kin_samples.decay),
        },
        data,
        save_name=save_name,
        out_dir=out_dir,
    )


class _KineticsReportView:
    """Gene-truncated view of a dataset for the posterior report plots:
    just the two members ``plot_posterior_kinetics`` reads."""

    def __init__(self, gene_names, truth):
        self.gene_names = gene_names
        self._truth = truth

    def params_ground_truth(self):
        return self._truth


def _write_metrics(path, result):
    """Per-step metrics JSONL shared by the model-family routes (r3: the
    bespoke routes used to hard-reject --metrics-path; now every route
    writes the same {step, loss, grad_norm} records as the exact route)."""
    with open(path, "w") as f:
        for i, (loss, gn) in enumerate(
            zip(result.history.tolist(), result.grad_norms.tolist())
        ):
            f.write(
                json.dumps({"step": i, "loss": loss, "grad_norm": gn}) + "\n"
            )
    print(f"Metrics written to {path}")


def _plot_route_trace(trace_dict, names, config, default_name):
    """Parameter-trace artifact shared by the model-family routes."""
    from dis_project_tpu.reporting import plotter

    plotter.plot_param_trace(
        trace_dict,
        names,
        save_name=config.save_name or default_name,
        out_dir=config.out_dir,
    )
    print("Parameter trace plotted")


def _check_route_flags(config, route: str, rejected):
    """Fail-loudly policy for flags a route genuinely does not implement
    (silent ignoring would misreport what ran). r3 shrank these lists to
    the truly-unsupported set — metrics/trace/optimizer/checkpointing are
    now shared infrastructure (``training.generic``)."""
    if config.resume and not config.checkpoint_dir:
        raise SystemExit("--resume requires --checkpoint-dir")
    for flag, name in rejected:
        if flag:
            raise SystemExit(
                f"{name} is not supported by the --model {route} route"
            )


def run(config: cfg.RunConfig):
    import jax

    _setup_backend(config)

    from dis_project_tpu.data.dataset import P53Data, dataset_3d
    from dis_project_tpu.models import simm
    from dis_project_tpu.reporting import plotter, tables
    from dis_project_tpu.training import trainer as tr
    from dis_project_tpu.utils.test_grids import expression_grid, latent_grid

    data = P53Data(
        replicate=config.replicate,
        data_dir=config.data_dir,
        selected_genes=config.selected_genes,
        source=config.data_source,
        seed=config.seed,
    )
    X, y, var = dataset_3d(data)
    model = simm.ExactSIMM(
        num_genes=data.num_genes,
        jitter=config.exact_jitter,
        legacy_block_mean=config.legacy_block_mean,
        shared_kinetics=config.shared_kinetics,
    )
    params0 = simm.init_params(
        data.num_genes, shared_kinetics=config.shared_kinetics
    )
    # The identifiability clamp targets p21 BY NAME: with gene-subset
    # ablations its index moves (or it is absent), and a hard-coded index 3
    # would clamp the wrong gene / silently no-op.
    has_p21 = "p21" in data.gene_names
    clamp_gene = data.gene_names.index("p21") if has_p21 else 0
    train_cfg = tr.TrainConfig(
        num_iters=config.num_iters,
        learning_rate=config.learning_rate,
        # The per-gene p21 clamp is meaningless with tied kinetics or
        # when p21 is not in the selected subset.
        fix_params=config.fix_params and not config.shared_kinetics and has_p21,
        clamp_gene=clamp_gene,
        num_steps_per_epoch=config.num_steps_per_epoch,
        track_parameters=config.track_parameters,
        optimizer=config.optimizer,
    )

    # Resume restores the FULL training state — unconstrained params,
    # optimizer state (Adam moments / L-BFGS memory) and step — so a
    # resumed run continues bit-exactly, matching the --resume help text
    # (ADVICE r1: the old path restored params only, a silent warm start).
    optimizer = tr.make_optimizer(train_cfg)
    raw0 = simm.unconstrain(params0)
    init_state = None
    start_step = 0
    if config.resume and config.checkpoint_dir:
        from dis_project_tpu.training import checkpoint as ckpt

        latest = ckpt.latest_step(config.checkpoint_dir)
        if latest is not None:
            try:
                restored = ckpt.restore(
                    config.checkpoint_dir,
                    latest,
                    template={
                        "raw": raw0,
                        "opt_state": optimizer.init(raw0),
                        "step": 0,
                    },
                )
                init_state = (restored["raw"], restored["opt_state"])
                start_step = int(restored["step"])
                print(f"Resumed from checkpoint step {start_step} "
                      f"({config.checkpoint_dir})")
            except Exception:
                # Pre-r2 checkpoints hold {params, step} only (no optimizer
                # state): restore what exists and warm-start Adam fresh
                # rather than failing on the tree-structure mismatch.
                restored = ckpt.restore(
                    config.checkpoint_dir, latest,
                    template={"params": params0, "step": 0},
                )
                init_state = (
                    simm.unconstrain(restored["params"]),
                    optimizer.init(raw0),
                )
                start_step = int(restored["step"])
                print(f"Resumed PARAMETERS from legacy checkpoint step "
                      f"{start_step} ({config.checkpoint_dir}); optimizer "
                      "state not in checkpoint — warm start")

    print("Training model...")
    t0 = time.perf_counter()
    # dataset_3d rows are canonical gene-major grid blocks -> the
    # Kronecker/table fast path applies exactly (parity 1e-12).
    result = tr.fit(
        model, params0, X, y, train_cfg,
        optimizer=optimizer,
        init_state=init_state,
        step_offset=start_step,
        gridded=(data.timepoints, data.num_replicates),
    )
    jax.block_until_ready(result.history)
    wall = time.perf_counter() - t0
    print(
        f"Trained {config.num_iters} iters in {wall:.2f}s "
        f"(final loss {_final_loss(result.history):.6f})"
    )

    if config.metrics_path:
        with open(config.metrics_path, "w") as f:
            for i, (loss, gn) in enumerate(
                zip(result.history.tolist(), result.grad_norms.tolist())
            ):
                f.write(json.dumps({"step": i, "loss": loss, "grad_norm": gn}) + "\n")

    if config.checkpoint_dir:
        from dis_project_tpu.training import checkpoint as ckpt

        ckpt.save(
            config.checkpoint_dir,
            {
                "raw": result.raw_params,
                "opt_state": result.opt_state,
                "step": start_step + config.num_iters,
            },
            step=start_step + config.num_iters,
        )

    tables.print_hyperparams(result.params, data, csv_path="hyperparams.csv")

    print("Making predictions and plotting...")
    t_grid = latent_grid(100)
    latent_dist = model.latent_predict(result.params, t_grid, X, y, var)
    plotter.plot_lf(
        t_grid,
        latent_dist,
        y_scatter=data.f_observed,
        scatter_times=data.timepoints,
        save_name=config.save_name,
        out_dir=config.out_dir,
    )

    x_grid = expression_grid(data.num_genes, t=100)
    gene_dist = model.multi_gene_predict(result.params, x_grid, X, y, var)
    plotter.plot_gene_predictions(
        x_grid, gene_dist, data, save_name=config.save_name, out_dir=config.out_dir
    )
    plotter.plot_comparison(
        result.params, data, save_name=config.save_name, out_dir=config.out_dir
    )
    if config.posterior_samples > 0:
        # Full-Bayes kinetics (beyond the reference's point estimates;
        # Lawrence et al. report parameter uncertainty): HMC over the
        # hyperparameters, exact-MLL likelihood, flat prior in constrained
        # space, chain seeded at the trained point.
        from dis_project_tpu.training import hmc

        n_draws = config.posterior_samples
        print(f"Sampling hyperparameter posterior: {n_draws} HMC draws "
              f"({n_draws} warmup)...")
        t0 = time.perf_counter()
        post = hmc.kinetics_posterior(
            model, result.params, X, y, jax.random.PRNGKey(config.seed + 7),
            num_warmup=n_draws, num_samples=n_draws,
            num_chains=config.posterior_chains,
        )
        jax.block_until_ready(post.log_probs)
        samples = _finish_posterior(post, t0, config, data, config.save_name)
        # Hyperparameter-marginalised (BMA) latent force: push the pooled
        # kinetics posterior through the exact GP conditional instead of
        # plugging in the single trained point — the band the plug-in
        # estimate understates whenever the kinetics are uncertain.
        _plot_bma_latent(
            lambda p: model.latent_predict(p, t_grid, X, y, var),
            samples, latent_dist, t_grid, data, config,
            f"{config.save_name}_bma" if config.save_name else "bma",
            "hyperparameters marginalised",
        )
    if config.track_parameters and result.param_trace is not None:
        # The parameter trace gets a first-class consumer (VERDICT r1 #8):
        # per-step constrained-kinetics trajectories.
        import numpy as np

        trace = {
            "basal": np.asarray(result.param_trace.basal),
            "sensitivity": np.asarray(result.param_trace.sensitivity),
            "decay": np.asarray(result.param_trace.decay),
        }
        plotter.plot_param_trace(
            trace, data.gene_names, save_name=config.save_name,
            out_dir=config.out_dir,
        )
    print(f"Plots saved under {config.out_dir}/")
    return result


def run_replicate_ensemble(config: cfg.RunConfig):
    """Per-replicate model ensemble as ONE SPMD program (BASELINE config 2
    via the mesh layer): each replicate's single-replicate model trains as
    an ensemble member, data-parallel over the device mesh."""
    _setup_backend(config)

    import jax
    import jax.numpy as jnp

    from dis_project_tpu.data.dataset import P53Data
    from dis_project_tpu.models import simm
    from dis_project_tpu.parallel import fit_ensemble, make_mesh
    from dis_project_tpu.reporting import tables

    data = P53Data(
        replicate=None,
        data_dir=config.data_dir,
        selected_genes=config.selected_genes,
        source=config.data_source,
        seed=config.seed,
    )
    for flag, name in (
        (config.shared_kinetics, "--shared-kinetics"),
        (config.checkpoint_dir, "--checkpoint-dir"),
        (config.optimizer != "adam", "--optimizer " + config.optimizer),
    ):
        if flag:
            raise SystemExit(
                f"{name} is not supported by the --ensemble path"
            )

    # One member per replicate: identical X rows (the single-replicate
    # gene-major grid, built directly — no second dataset load needed),
    # member-specific targets.
    T = int(data.timepoints.shape[0])
    G = data.num_genes
    X = jnp.stack(
        [
            jnp.tile(data.timepoints, G),
            jnp.repeat(jnp.arange(G, dtype=data.timepoints.dtype), T),
            jnp.ones(G * T, data.timepoints.dtype),
        ],
        axis=-1,
    )
    y_batch = jnp.asarray(data.gene_expressions.reshape(data.num_replicates, -1))

    n_dev = len(jax.devices())
    shape = tuple(config.mesh_shape) if config.mesh_shape else (n_dev, 1)
    if len(shape) == 1:  # pure data-parallel spelling, e.g. --mesh-shape 8
        shape = (shape[0], 1)
    mesh = make_mesh(shape, axis_names=tuple(config.mesh_axes))
    print(f"Training {data.num_replicates} per-replicate models as one "
          f"SPMD program over mesh {dict(mesh.shape)}...")
    t0 = time.perf_counter()
    model = simm.ExactSIMM(num_genes=data.num_genes, jitter=config.exact_jitter)
    has_p21 = "p21" in data.gene_names
    params_batch, hist = fit_ensemble(
        model,
        simm.init_params(data.num_genes),
        mesh,
        X,
        y_batch,
        num_iters=config.num_iters,
        learning_rate=config.learning_rate,
        fix_params=config.fix_params and has_p21,
        clamp_gene=data.gene_names.index("p21") if has_p21 else 0,
    )
    jax.block_until_ready(hist)
    print(f"Trained in {time.perf_counter() - t0:.2f}s; final losses "
          f"{[round(float(l), 4) for l in (hist[-1] if len(hist) else [])]}")
    if config.metrics_path:
        with open(config.metrics_path, "w") as f:
            for i, row in enumerate(hist.tolist()):
                f.write(json.dumps({"step": i, "losses": row}) + "\n")
    for r in range(data.num_replicates):
        member = jax.tree.map(lambda v: v[r], params_batch)
        print(f"\nReplicate {r}:")
        tables.print_hyperparams(member, data, csv_path=None)
    return params_batch, hist


def run_second_order(config: cfg.RunConfig):
    """Second-order (spring-damper) LFM on the p53 data — the ``--model
    simm2`` route. New model family beyond the reference."""
    import jax
    import optax

    # Fail-loudly policy for the flags this family genuinely lacks: the
    # second-order kernels have no p21-style clamp, so the fix-params
    # TOGGLE has no meaning here (r3: metrics/trace/optimizer/checkpoint
    # are shared route infrastructure now, VERDICT r2 #6).
    _check_route_flags(
        config, "simm2",
        ((not config.fix_params, "--no-fix-params"),),
    )

    _setup_backend(config)

    from dis_project_tpu.data.dataset import P53Data, train_arrays
    from dis_project_tpu.models import simm2
    from dis_project_tpu.reporting import plotter
    from dis_project_tpu.utils.test_grids import latent_grid

    data = P53Data(
        replicate=config.replicate,
        data_dir=config.data_dir,
        selected_genes=config.selected_genes,
        source=config.data_source,
        seed=config.seed,
    )
    X, y, var = train_arrays(data)
    model = simm2.SecondOrderSIMM(num_genes=data.num_genes, jitter=config.exact_jitter)
    raw = simm2.unconstrain_jit(simm2.init_params(data.num_genes))

    def loss(raw):
        return -model.mll(simm2.constrain(raw), X, y)

    from dis_project_tpu.training import generic

    print("Training second-order LFM...")
    t0 = time.perf_counter()
    loop_kw = dict(
        num_iters=config.num_iters,
        learning_rate=config.learning_rate,
        optimizer=config.optimizer,
        constrain_fn=simm2.constrain,
        track_parameters=config.track_parameters,
    )
    if config.checkpoint_dir:
        result = generic.fit_checkpointed(
            loss, raw, directory=config.checkpoint_dir,
            resume=config.resume, **loop_kw,
        )
    else:
        result = generic.fit_loop(loss, raw, **loop_kw)
    hist = result.history
    final = _final_loss(hist)
    wall = time.perf_counter() - t0
    print(f"Trained {config.num_iters} iters in {wall:.2f}s (final loss {final:.6f})")
    if config.metrics_path:
        _write_metrics(config.metrics_path, result)
    if config.track_parameters and result.param_trace is not None:
        import numpy as np

        tr = result.param_trace
        _plot_route_trace(
            {
                "basal": np.asarray(tr.basal),
                "sensitivity": np.asarray(tr.sensitivity),
                "alpha": np.asarray(tr.alpha),
                "omega": np.asarray(tr.omega),
            },
            data.gene_names, config, "simm2",
        )

    params = result.params
    print("\nGene       Basal     Sensitivity  Alpha     Omega     Damping   Spring")
    import numpy as np

    for i, g in enumerate(data.gene_names):
        print(
            f"{g:<10} {float(params.basal[i]):<9.4f} "
            f"{float(params.sensitivity[i]):<12.4f} "
            f"{float(params.alpha[i]):<9.4f} {float(params.omega[i]):<9.4f} "
            f"{float(simm2.damping(params)[i]):<9.4f} "
            f"{float(simm2.spring(params)[i]):<9.4f}"
        )

    t_grid = latent_grid(100)
    # jit: eager complex ops are unimplemented on the TPU backend.
    latent = jax.jit(model.latent_predict)(params, t_grid, X, y, var)
    plotter.plot_lf(
        t_grid,
        latent,
        y_scatter=data.f_observed,
        scatter_times=data.timepoints,
        save_name=config.save_name or "simm2",
        out_dir=config.out_dir,
    )
    print(f"Latent-force plot saved under {config.out_dir}/")
    return params, hist


def run_multiforce(config: cfg.RunConfig):
    """Multi-force exact SIMM on the p53 data — the ``--model multisimm``
    route. New model family beyond the reference (R independent latent
    forces, per-gene-per-force sensitivities; ``models/multisimm.py``)."""
    # Fail-loudly policy for flags this family genuinely lacks: no p21
    # clamp schedule (identifiability comes from distinct per-force
    # lengthscale inits) and no tied-kinetics variant.
    _check_route_flags(
        config, "multisimm",
        (
            (not config.fix_params, "--no-fix-params"),
            (config.shared_kinetics, "--shared-kinetics"),
        ),
    )
    if config.num_forces < 1:
        raise SystemExit("--num-forces must be >= 1")

    _setup_backend(config)

    import jax
    import jax.numpy as jnp

    from dis_project_tpu.data.dataset import P53Data, train_arrays
    from dis_project_tpu.models import multisimm
    from dis_project_tpu.reporting import plotter

    data = P53Data(
        replicate=config.replicate,
        data_dir=config.data_dir,
        selected_genes=config.selected_genes,
        source=config.data_source,
        seed=config.seed,
    )
    X, y, var = train_arrays(data)
    R = config.num_forces
    model = multisimm.ExactMultiSIMM(
        num_genes=data.num_genes, num_forces=R, jitter=config.exact_jitter
    )
    print(f"Training {R}-force exact SIMM...")
    t0 = time.perf_counter()
    result = multisimm.fit(
        model,
        multisimm.init_params(data.num_genes, R),
        X,
        y,
        num_iters=config.num_iters,
        learning_rate=config.learning_rate,
        optimizer=config.optimizer,
        track_parameters=config.track_parameters,
        checkpoint_dir=config.checkpoint_dir,
        resume=config.resume,
        full_result=True,
    )
    params, hist = result.params, result.history
    final = _final_loss(hist)
    print(f"Trained {config.num_iters} iters in {time.perf_counter() - t0:.2f}s "
          f"(final loss {final:.6f})")
    if config.metrics_path:
        _write_metrics(config.metrics_path, result)
    if config.track_parameters and result.param_trace is not None:
        import numpy as np

        tr_ = result.param_trace
        trace = {
            "basal": np.asarray(tr_.basal),
            "decay": np.asarray(tr_.decay),
        }
        for r in range(R):
            trace[f"sensitivity f{r}"] = np.asarray(tr_.sensitivity[:, :, r])
        _plot_route_trace(trace, data.gene_names, config, "multiforce")

    print("\nlengthscales:",
          [round(float(l), 4) for l in params.lengthscale])
    header = "Gene       Basal     Decay     " + "  ".join(
        f"S[f{r}]   " for r in range(R)
    )
    print(header)
    for i, g in enumerate(data.gene_names):
        srow = "  ".join(
            f"{float(params.sensitivity[i, r]):<8.4f}" for r in range(R)
        )
        print(f"{g:<10} {float(params.basal[i]):<9.4f} "
              f"{float(params.decay[i]):<9.4f} {srow}")

    t_lin = jnp.linspace(0.0, 13.0, 100)
    # One jit wrapper for all forces: the traced program is identical
    # across r (the force index is row data, not a static arg), so a
    # per-force jax.jit(...) would recompile R times for nothing.
    predict = jax.jit(model.latent_predict)
    for r in range(R):
        rows = multisimm.force_rows(t_lin, r, X.dtype)
        post = predict(params, rows, X, y, var)
        plotter.plot_lf(
            rows,
            post,
            y_scatter=data.f_observed,
            scatter_times=data.timepoints,
            title=f"force {r}",
            save_name=(config.save_name or "multiforce") + f"_f{r}",
            out_dir=config.out_dir,
        )
    print(f"Per-force latent plots saved under {config.out_dir}/")
    return params, hist


def run_nonlinear(config: cfg.RunConfig):
    """Nonlinear-response LFM on the p53 data — the ``--model nlfm``
    route. New model family beyond the reference: Lawrence et al. (2006)
    §5's nonlinear response dx/dt = B + S*g(f) - D*x (``g=exp`` is their
    positivity-constrained MAP model), inferred by MAP over (kinetics,
    whitened force values) with Laplace credible bands; optional
    full-Bayes HMC via --posterior-samples (``models/nlfm.py``)."""
    # Fail-loudly policy for the flag this family genuinely lacks.
    _check_route_flags(
        config, "nlfm",
        ((config.shared_kinetics, "--shared-kinetics"),),
    )
    if config.num_quad < 3:
        raise SystemExit("--num-quad must be >= 3")

    _setup_backend(config)

    import jax
    import jax.numpy as jnp

    from dis_project_tpu.data.dataset import P53Data
    from dis_project_tpu.models import nlfm
    from dis_project_tpu.reporting import plotter, tables

    data = P53Data(
        replicate=config.replicate,
        data_dir=config.data_dir,
        selected_genes=config.selected_genes,
        source=config.data_source,
        seed=config.seed,
    )
    t_obs = jnp.asarray(data.timepoints)
    Y = jnp.asarray(data.gene_expressions)
    V = jnp.asarray(data.gene_variances)
    model = nlfm.NonlinearLFM(
        num_genes=data.num_genes,
        response=config.response,
        t_max=float(data.timepoints[-1]),
        num_quad=config.num_quad,
        jitter=config.sparse_jitter,
    )
    # The identifiability clamp targets p21 BY NAME (see run()); for the
    # exp response the S <-> force-shift degeneracy g(f+c) = e^c g(f)
    # makes the pin MORE relevant than in the linear family.
    has_p21 = "p21" in data.gene_names
    print(f"Training nonlinear-response LFM (g={config.response}, "
          f"Q={config.num_quad}) by MAP...")
    t0 = time.perf_counter()
    result = nlfm.fit(
        model,
        nlfm.init_params(data.num_genes, config.num_quad),
        t_obs, Y, V,
        num_iters=config.num_iters,
        learning_rate=config.learning_rate,
        fix_params=config.fix_params and has_p21,
        clamp_gene=data.gene_names.index("p21") if has_p21 else 0,
        optimizer=config.optimizer,
        track_parameters=config.track_parameters,
        checkpoint_dir=config.checkpoint_dir,
        resume=config.resume,
        full_result=True,
    )
    params, hist = result.params, result.history
    jax.block_until_ready(hist)
    print(f"Trained {config.num_iters} iters in "
          f"{time.perf_counter() - t0:.2f}s "
          f"(final negative log-joint {_final_loss(hist):.6f})")
    if config.metrics_path:
        _write_metrics(config.metrics_path, result)
    if config.track_parameters and result.param_trace is not None:
        import numpy as np

        kin = result.param_trace.kinetics
        _plot_route_trace(
            {
                "basal": np.asarray(kin.basal),
                "sensitivity": np.asarray(kin.sensitivity),
                "decay": np.asarray(kin.decay),
            },
            data.gene_names, config, "nlfm",
        )
    if config.response == "exp":
        print("NOTE: the exp response has an exact (f+c, S*e^-c) shift "
              "degeneracy; the force is identified up to an additive "
              "constant (resolved in practice by the p21 sensitivity pin).")

    tables.print_hyperparams(params.kinetics, data, csv_path="hyperparams.csv")

    print("Making predictions and plotting...")
    grid = model.quad_grid()
    rows = grid[:, None]  # the plotters read time from column 0
    # ONE Hessian solve feeds both Laplace posteriors (the Q x Q Hessian
    # of the ODE-integrated log-joint dominates post-fit cost).
    lap, bands = jax.jit(model.laplace_posteriors)(params, t_obs, Y, V)
    # The Barenco measured-activity profile lives in the LINEAR (response)
    # domain: it is comparable to the pre-response force f only for
    # g=identity — for any other response the curve is f = g^{-1}(activity)
    # -scale (and for exp, shifted), so the overlay would mislead.
    identity = config.response == "identity"
    plotter.plot_lf(
        rows, lap,
        y_scatter=data.f_observed if identity else None,
        scatter_times=data.timepoints if identity else None,
        title=f"nonlinear ({config.response})",
        save_name=config.save_name or "nlfm",
        out_dir=config.out_dir,
    )
    gene_grid = jnp.tile(grid, data.num_genes)[:, None]
    plotter.plot_gene_predictions(
        gene_grid, bands, data,
        save_name=config.save_name or "nlfm",
        out_dir=config.out_dir,
        points_per_gene=config.num_quad,
    )

    if config.posterior_samples > 0:
        n_draws = config.posterior_samples
        print(f"Sampling (kinetics, force) posterior: {n_draws} HMC draws "
              f"({n_draws} warmup)...")
        t0 = time.perf_counter()
        post = nlfm.force_posterior_hmc(
            model, params, t_obs, Y, V,
            jax.random.PRNGKey(config.seed + 7),
            num_warmup=n_draws, num_samples=n_draws,
            num_chains=config.posterior_chains,
        )
        jax.block_until_ready(post.log_probs)
        pooled = _finish_posterior(post, t0, config, data,
                                   config.save_name or "nlfm",
                                   kin_from=lambda s: s.kinetics)
        # The HMC state contains the FORCE itself (whitened w), so the
        # full-Bayes force band is the empirical moment over the draws
        # f_s = L(l_s) w_s — kinetics, lengthscale, and force uncertainty
        # all marginalised jointly (the Laplace band above is a fixed-
        # kinetics Gaussian approximation around the MAP).
        import numpy as np

        forces = np.asarray(jax.jit(jax.vmap(model.force))(pooled))
        finite = np.isfinite(forces).all(axis=1)
        forces = forces[finite]
        if forces.shape[0] == 0:
            # Mirror _plot_bma_latent's all-dropped message (ADVICE r2):
            # a silent skip left the smoke test failing with no clue.
            print(
                "HMC force band: every draw's force values were non-finite "
                "— skipping the full-Bayes force band"
            )
        if forces.shape[0] > 0:
            fmean = forces.mean(axis=0)
            fcov = jnp.diag(jnp.asarray(forces.var(axis=0)))
            hmc_widen = float(np.mean(
                np.sqrt(np.diag(np.asarray(fcov)))
                / np.asarray(lap.stddev())
            ))
            print(
                f"HMC force band ({forces.shape[0]} draws): mean stddev "
                f"{hmc_widen:.2f}x the Laplace band"
            )
            from dis_project_tpu.models.base import Gaussian

            plotter.plot_lf(
                rows,
                Gaussian(mean=jnp.asarray(fmean), cov=fcov),
                y_scatter=data.f_observed if identity else None,
                scatter_times=data.timepoints if identity else None,
                title=f"nonlinear ({config.response}), full-Bayes force",
                save_name=f"{config.save_name or 'nlfm'}_hmc",
                out_dir=config.out_dir,
            )

    print(f"Plots saved under {config.out_dir}/")
    return params, hist


def run_delay(config: cfg.RunConfig):
    """Delayed-response exact SIMM on the p53 data — the ``--model
    delaysimm`` route. New model family beyond the reference: per-gene
    transcriptional delays dx/dt = B + S f(t - delta_j) - D x via the exact
    time-warp reduction onto the instantaneous closed forms
    (``models/delaysimm.py``). ``fix_params`` pins the p21 kinetics AND its
    delay to 0 — the family's identifiability anchor (remaining delays are
    relative to p21's)."""
    # Fail-loudly policy for the flag this family genuinely lacks.
    _check_route_flags(
        config, "delaysimm",
        ((config.shared_kinetics, "--shared-kinetics"),),
    )

    _setup_backend(config)

    import jax

    from dis_project_tpu.data.dataset import P53Data, train_arrays
    from dis_project_tpu.models import delaysimm
    from dis_project_tpu.reporting import plotter, tables
    from dis_project_tpu.utils.test_grids import latent_grid

    data = P53Data(
        replicate=config.replicate,
        data_dir=config.data_dir,
        selected_genes=config.selected_genes,
        source=config.data_source,
        seed=config.seed,
    )
    X, y, var = train_arrays(data)
    model = delaysimm.ExactDelaySIMM(
        num_genes=data.num_genes, jitter=config.exact_jitter
    )
    has_p21 = "p21" in data.gene_names
    print("Training delayed-response exact SIMM...")
    t0 = time.perf_counter()
    result = delaysimm.fit(
        model,
        delaysimm.init_params(data.num_genes),
        X,
        y,
        num_iters=config.num_iters,
        learning_rate=config.learning_rate,
        fix_params=config.fix_params and has_p21,
        clamp_gene=data.gene_names.index("p21") if has_p21 else 0,
        optimizer=config.optimizer,
        track_parameters=config.track_parameters,
        checkpoint_dir=config.checkpoint_dir,
        resume=config.resume,
        full_result=True,
    )
    params, hist = result.params, result.history
    final = _final_loss(hist)
    print(f"Trained {config.num_iters} iters in {time.perf_counter() - t0:.2f}s "
          f"(final loss {final:.6f})")
    if config.metrics_path:
        _write_metrics(config.metrics_path, result)
    if config.track_parameters and result.param_trace is not None:
        import numpy as np

        tr_ = result.param_trace
        _plot_route_trace(
            {
                "basal": np.asarray(tr_.basal),
                "sensitivity": np.asarray(tr_.sensitivity),
                "decay": np.asarray(tr_.decay),
                "delay": np.asarray(tr_.delay),
            },
            data.gene_names, config, "delay",
        )

    tables.print_hyperparams(params, data, csv_path="hyperparams.csv")
    anchor = (" (anchor: p21 pinned to 0)"
              if config.fix_params and has_p21 else "")
    print(f"\nper-gene transcriptional delays{anchor}:")
    for i, g in enumerate(data.gene_names):
        print(f"  {g:<10} {float(params.delay[i]):.4f}")

    t_grid = latent_grid(100).astype(X.dtype)
    latent = jax.jit(model.latent_predict)(params, t_grid, X, y, var)
    plotter.plot_lf(
        t_grid,
        latent,
        y_scatter=data.f_observed,
        scatter_times=data.timepoints,
        title="delayed response",
        save_name=config.save_name or "delay",
        out_dir=config.out_dir,
    )
    print(f"Latent-force plot saved under {config.out_dir}/")

    if config.posterior_samples > 0:
        import numpy as np

        n_draws = config.posterior_samples
        print(f"Sampling (kinetics, delay) posterior: {n_draws} HMC draws "
              f"({n_draws} warmup)...")
        t0 = time.perf_counter()
        post = delaysimm.kinetics_posterior(
            model, params, X, y, jax.random.PRNGKey(config.seed + 7),
            num_warmup=n_draws, num_samples=n_draws,
            num_chains=config.posterior_chains,
        )
        jax.block_until_ready(post.log_probs)
        pooled = _finish_posterior(
            post, t0, config, data, config.save_name or "delay"
        )
        print("\nPosterior delays (mean +/- std [5%, 95%]):")
        dvals = np.asarray(pooled.delay)
        for g, name in enumerate(data.gene_names[: dvals.shape[1]]):
            lo, hi = np.percentile(dvals[:, g], [5, 95])
            print(f"  delay {name:<10} "
                  f"{dvals[:, g].mean():.4f} +/- {dvals[:, g].std():.4f} "
                  f"[{lo:.4f}, {hi:.4f}]")
        # BMA latent force: marginalise (kinetics, delay) uncertainty
        # through the warped-input exact GP conditional.
        _plot_bma_latent(
            lambda p: model.latent_predict(p, t_grid, X, y, var),
            pooled, latent, t_grid, data, config,
            f"{config.save_name or 'delay'}_bma",
            "delayed response, hyperparameters marginalised",
        )
    return params, hist


def run_alfi_parity(config: cfg.RunConfig):
    """Cross-framework validation run (BASELINE config 3): train the JAX
    stack and the independent torch stack on the same data and report
    MLL/posterior agreement — the reference's GPJax-vs-GPyTorch check."""
    import numpy as np

    _setup_backend(config)

    import jax.numpy as jnp
    import torch

    from dis_project_tpu.data.dataset import P53Data, train_arrays
    from dis_project_tpu.models import simm
    from dis_project_tpu.training import trainer as tr
    from dis_project_tpu.validation.torch_lfm import TorchSIMM

    data = P53Data(
        replicate=config.replicate,
        data_dir=config.data_dir,
        source=config.data_source,
        seed=config.seed,
    )
    X, y, var = train_arrays(data)

    model = simm.ExactSIMM(num_genes=data.num_genes, jitter=config.exact_jitter)
    params0 = simm.init_params(data.num_genes)
    tm = TorchSIMM(
        num_genes=data.num_genes,
        timepoints=torch.tensor(np.asarray(data.timepoints)),
        variances=torch.tensor(np.asarray(var)),
        jitter=config.exact_jitter,
        num_replicates=data.num_replicates,
    )
    tm.set_train_targets(torch.tensor(np.asarray(y)))
    y_t = torch.tensor(np.asarray(y))
    t_test = np.linspace(0.0, 13.0, 80)
    rows = jnp.stack(
        [jnp.asarray(t_test), -jnp.ones(80), jnp.zeros(80)], axis=-1
    )

    # --- Gate 1: like-for-like MLL at the SAME fixed (init) parameters.
    # Both stacks share the inits (B=0.05, S=1, D=0.4, l=2.5, obs=1); the
    # torch MLL is evaluated WITHOUT the in-kernel measurement variances so
    # the Sigma conventions match (the documented reference asymmetry,
    # src/objectives.py:70-73 vs gpytorch_alfi/model_alfi.py:295-299).
    # Two f64 implementations of identical math must agree to ~1e-9.
    mll_jax = float(model.mll(params0, X, y))
    with torch.no_grad():
        mll_torch = float(tm.mll(y_t, include_meas_var=False))
    mll_delta = abs(mll_jax - mll_torch)
    print(f"Fixed-params MLL  jax={mll_jax:.9f}  torch={mll_torch:.9f}  "
          f"|delta|={mll_delta:.3e}  (gate: <= 1e-6)")

    # --- Gate 2: latent-force posterior at the same fixed parameters.
    f_jax0 = np.asarray(model.latent_predict(params0, rows, X, y, var).mean)
    f_torch0, _ = tm.predict_f(torch.tensor(t_test))
    corr0 = float(np.corrcoef(f_torch0.numpy(), f_jax0)[0, 1])
    max_diff0 = float(np.abs(f_torch0.numpy() - f_jax0).max())
    print(f"Fixed-params latent posterior  corr={corr0:.6f}  "
          f"max|diff|={max_diff0:.3e}  (gate: corr >= 0.999)")

    # --- Trained-model agreement (the stacks train their own reference
    # conventions — torch includes measurement variances in its MLL — so
    # trained params differ slightly; this is a recovery check, not an
    # implementation-parity bound).
    print("Training JAX stack...")
    res = tr.fit(
        model, params0, X, y,
        tr.TrainConfig(num_iters=config.num_iters,
                       learning_rate=config.learning_rate),
    )
    print("Training torch validation stack...")
    hist_t = tm.fit(y_t, epochs=config.num_iters, lr=config.learning_rate,
                    track_parameters=True)

    f_torch, f_var_torch = tm.predict_f(torch.tensor(t_test))
    f_jax = model.latent_predict(res.params, rows, X, y, var).mean
    corr = float(np.corrcoef(f_torch.numpy(), np.asarray(f_jax))[0, 1])
    print(f"\nFinal loss  jax={_final_loss(res.history):.6f}  "
          f"torch={hist_t[-1]:.6f}")
    print(f"Trained latent-force posterior correlation: {corr:.4f}")

    # --- Torch-side artifacts (reference plotter_alfi.py surface).
    from dis_project_tpu.validation import torch_report

    torch_report.plot_lf_torch(
        t_test, f_torch.numpy(), f_var_torch.numpy(), data,
        out_dir=config.out_dir,
    )
    m_means, m_vars = tm.predict_m(torch.tensor(t_test))
    torch_report.plot_gxpred_torch(
        t_test, m_means.numpy(), m_vars.numpy(), data, out_dir=config.out_dir
    )
    torch_report.plot_comparison_torch(
        tm.param_trace, data, out_dir=config.out_dir
    )
    torch_report.plot_param_trace_torch(
        tm.param_trace, data, out_dir=config.out_dir
    )
    print(f"Torch-side plots saved under {config.out_dir}/ "
          "(lf_torch, gxpr_torch, comparison_torch, param_trace_torch)")

    if mll_delta > 1e-6:
        raise SystemExit(
            f"cross-framework parity FAILED (fixed-params |MLL delta| "
            f"{mll_delta:.3e} > 1e-6)"
        )
    if corr0 < 0.999:
        raise SystemExit(
            f"cross-framework parity FAILED (fixed-params corr {corr0:.6f} "
            "< 0.999)"
        )
    if corr < 0.95:
        raise SystemExit(
            f"cross-framework parity FAILED (trained corr {corr:.4f} < 0.95)"
        )
    print("Cross-framework parity OK")
    return corr


def _ss_shard_spec(config: cfg.RunConfig):
    """``(mesh, axis)`` for the temporally-sharded Kalman filter when
    ``--ss-shard`` is set, else None.

    The mesh is 1-D over EVERY visible device with axis name "t": the
    filter splits the time-step axis across it (sequence parallelism —
    local associative scans, one all-gather of chunk composites). On a
    single chip this is a degenerate 1-device mesh (same program, no
    collective traffic); the 8-device virtual CPU mesh in the tests is
    the real exercise.
    """
    if not config.ss_shard:
        return None
    import numpy as np

    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    print(f"Temporally-sharded filter: time axis over {devices.size} "
          "device(s)")
    return Mesh(devices, ("t",)), "t"


def run_dense(config: cfg.RunConfig):
    """Dense exact-GP stress run (BASELINE config 4): synthetic first-order
    data at N = genes x timepoints, full-batch exact MLL training with the
    Pallas/XLA dispatch, and ground-truth kinetics recovery metrics."""
    import numpy as np

    _setup_backend(config)

    import jax
    import jax.numpy as jnp

    from dis_project_tpu.data import synthetic
    from dis_project_tpu.data.dataset import train_arrays
    from dis_project_tpu.models import simm
    from dis_project_tpu.training import trainer as tr

    scfg = synthetic.SyntheticConfig(
        num_genes=config.synth_genes,
        num_timepoints=config.synth_timepoints,
        num_replicates=1,
        noise_std=0.1,
    )
    if config.model == "simm2":
        return _run_dense_second_order(config, scfg)
    if config.model == "multisimm":
        return _run_dense_multiforce(config, scfg)
    if config.model == "delaysimm":
        return _run_dense_delay(config, scfg)
    if config.model == "nlfm":
        return _run_dense_nlfm(config, scfg)
    print(f"Sampling synthetic LFM dataset: {scfg.num_genes} genes x "
          f"{scfg.num_timepoints} timepoints (N={scfg.n_points})...")
    data = synthetic.sample_prior(jax.random.PRNGKey(config.seed), scfg)
    X, y, var = train_arrays(data)

    model = simm.ExactSIMM(
        num_genes=scfg.num_genes, jitter=config.exact_jitter, canonical_rows=True
    )
    t0 = time.perf_counter()
    if config.mll_engine == "cg":
        # Matmul-only BBMM engine (ops.iterative): O(N^2 * iters) per step
        # with unbiased stochastic gradients — the fast path at N >= 1e4.
        import optax

        print("Training (full-batch exact MLL, CG/Lanczos engine)...")
        raw0 = simm.unconstrain_jit(simm.init_params(scfg.num_genes, dtype=X.dtype))
        # Clip: the Hutchinson d_sigma estimator's variance grows with N
        # per probe, and an unlucky large sample can kick the unconstrained
        # decay into exp(gamma^2) overflow territory in f32.
        optimizer = optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.adam(config.learning_rate),
        )

        @jax.jit
        def fit_cg(raw):
            opt_state = optimizer.init(raw)

            def step(carry, key):
                raw, opt_state = carry
                loss, grads = jax.value_and_grad(
                    lambda r: -model.mll_iterative(
                        simm.constrain(r), X, y, key,
                        num_probes=16, lanczos_iters=24, cg_iters=128,
                    )
                )(raw)
                updates, opt_state = optimizer.update(grads, opt_state)
                return (optax.apply_updates(raw, updates), opt_state), loss

            keys = jax.random.split(
                jax.random.PRNGKey(config.seed + 1), config.num_iters
            )
            (raw, _), hist = jax.lax.scan(step, (raw, opt_state), keys)
            return raw, hist

        raw_f, history = fit_cg(raw0)
        params_f = simm.constrain_jit(raw_f)
        # Exact final loss for reporting (one Cholesky evaluation).
        final = float(-model.mll(params_f, X, y))
        res = tr.TrainResult(
            params=params_f, history=history,
            grad_norms=jnp.zeros_like(history),
        )
    else:
        # Exact-MLL dispatch at stress scale: on TPU f32 the row path (the
        # lower-triangle Pallas Gram + kind-specialised VJP) overtook the
        # table/gridded Gram for training in r2 — the table assembly's
        # backward is an N^2-cotangent scatter-add (v5e, N=1e4: 28.2 vs
        # 36.7 ms per step). The gridded path stays the CPU/f64 choice
        # (small transcendental tables beat N^2 erf evaluations there).
        import optax

        on_tpu_f32 = (
            jax.default_backend() not in ("cpu", "gpu") and not config.x64
        )
        if config.mll_engine == "dist":
            engine = (f"distributed Cholesky, "
                      f"{jax.device_count()}-device mesh")
        elif config.mll_engine == "ss":
            prior = (
                "order-10 SDE"
                if config.force_kernel == "rbf"
                else f"EXACT {config.force_kernel} prior"
            )
            engine = f"state-space Kalman engine (O(T), {prior})"
            if config.stationary_after is not None:
                engine += (
                    f", steady-state gain after {config.stationary_after} "
                    "warmup steps"
                )
        else:
            engine = ("row Gram" if on_tpu_f32 else "gridded Gram") \
                + ", Cholesky engine"
        print(f"Training (full-batch exact MLL, {engine})...")
        timepoints = jnp.asarray(data.timepoints, X.dtype)
        raw0 = simm.unconstrain_jit(simm.init_params(scfg.num_genes, dtype=X.dtype))
        optimizer = optax.adam(config.learning_rate)

        # Segmented like the second-order route: a single 150-step scan is
        # ~1 min of device time at N=1e4 (fine), but grows past the remote
        # worker's dispatch patience at larger N — near-equal <= 50-step
        # segments bound every dispatch (round counts compile one program).
        import functools as _ft

        # max(1, ...): num_iters=0 still runs one (empty) segment instead
        # of dividing by zero — useful to smoke-test the data/plot plumbing.
        n_segs = max(1, -(-config.num_iters // 50))
        seg_q, seg_r = divmod(config.num_iters, n_segs)

        if config.mll_engine == "dist":
            # Mesh-distributed exact MLL (parallel.dist_cholesky): the Gram
            # is row-sharded P("model", None) over a 1-D mesh of every
            # visible device and the factorisation runs as one GSPMD
            # program — the beyond-HBM dense path (SURVEY §2d mesh row),
            # driven from the CLI. On the single tunnelled chip this is a
            # 1-device mesh (same code path, degenerate collectives); the
            # tests exercise it on the 8-device virtual CPU mesh.
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            from dis_project_tpu.ops import gram as gram_ops
            from dis_project_tpu.ops import mll as mll_ops
            from dis_project_tpu.parallel import dist_cholesky as dc

            mesh = Mesh(np.asarray(jax.devices()), ("model",))
            spec = NamedSharding(mesh, P("model", None))
            blk = 1024 if X.shape[0] >= 4096 else 128

            def objective(r):
                p = simm.constrain(r)
                K = gram_ops.gram(X, p.decay, p.sensitivity, p.lengthscale)
                K = jax.lax.with_sharding_constraint(K, spec)
                sigma = mll_ops.add_diagonal(
                    K, model.jitter + p.obs_stddev**2
                )
                mx = model.mean_function(p, X)
                return -dc.sharded_mvn_logpdf(
                    y, mx, sigma, mesh, "model", block=blk
                )

        elif config.mll_engine == "ss":
            # State-space Kalman engine (ops.statespace): O(T (p+G)^3)
            # instead of O(N^3) — exact MLL of an order-10 SDE
            # approximation of the force prior (~1e-4 nats at these
            # scales). The associative-scan filter auto-engages on TPU.
            from dis_project_tpu.ops import statespace as ss_ops

            shard = _ss_shard_spec(config)
            objective = lambda r: -ss_ops.lfm_mll_ss(
                simm.constrain(r), timepoints, y, jitter=model.jitter,
                shard=shard, force_kernel=config.force_kernel,
                stationary_after=config.stationary_after,
            )
        elif on_tpu_f32:
            objective = lambda r: -model.mll(simm.constrain(r), X, y)
        else:
            objective = lambda r: -model.mll_gridded(
                simm.constrain(r), timepoints, y
            )

        @_ft.partial(jax.jit, static_argnames=("length",))
        def fit_gridded(raw, opt_state, length):
            def step(carry, _):
                raw, opt_state = carry
                loss, grads = jax.value_and_grad(objective)(raw)
                updates, opt_state = optimizer.update(grads, opt_state)
                return (optax.apply_updates(raw, updates), opt_state), loss

            (raw, opt_state), hist = jax.lax.scan(
                step, (raw, opt_state), None, length=length
            )
            return raw, opt_state, hist

        raw_f, opt_state = raw0, optimizer.init(raw0)
        seg_hists = []
        for i in range(n_segs):
            raw_f, opt_state, h = fit_gridded(
                raw_f, opt_state, seg_q + (1 if i < seg_r else 0)
            )
            seg_hists.append(np.asarray(h))  # host fetch = sync point
        history = jnp.asarray(np.concatenate(seg_hists))
        res = tr.TrainResult(
            params=simm.constrain_jit(raw_f),
            history=history,
            grad_norms=jnp.zeros_like(history),
        )
        final = _final_loss(res.history)
    jax.block_until_ready(res.history)
    wall = time.perf_counter() - t0
    print(f"Trained {config.num_iters} iters in {wall:.2f}s "
          f"(final loss {final:.4f}, N={scfg.n_points})")

    b, s, d = data.params_ground_truth()
    corr_d = float(np.corrcoef(np.asarray(res.params.decay), d)[0, 1])
    corr_s = float(np.corrcoef(np.asarray(res.params.sensitivity), s)[0, 1])
    print(f"Ground-truth recovery: corr(decay)={corr_d:.3f} "
          f"corr(sensitivity)={corr_s:.3f}")
    if config.mll_engine == "ss":
        # Smoothed latent-force artifact: the dense conditional is O(N^3)
        # at stress scale, but the engine's RTS pass gives the force
        # posterior in O(T) — plotted against the generating force.
        from dis_project_tpu.models.base import Gaussian
        from dis_project_tpu.ops import statespace as ss_ops
        from dis_project_tpu.reporting import plotter

        grid = jnp.linspace(
            float(timepoints[0]), float(timepoints[-1]) * 13.0 / 12.0,
            200, dtype=X.dtype,
        )
        nv = var.reshape(scfg.num_genes, timepoints.shape[0]).T \
            + model.jitter
        f_mean, f_var, _, _ = ss_ops.lfm_predict_ss(
            res.params, timepoints, y, grid, noise_var=nv,
            shard=_ss_shard_spec(config),  # r4: smoother shards too
            force_kernel=config.force_kernel,
        )
        plotter.plot_lf(
            grid[:, None],  # plotters read time from column 0
            Gaussian(mean=f_mean, cov=jnp.diag(f_var)),
            y_scatter=np.asarray(data.f_true),
            scatter_times=np.asarray(timepoints),
            title="Smoothed latent force (state-space engine)",
            save_name="dense_ss_lf",
            out_dir=config.out_dir,
        )
        print(f"Smoothed latent-force plot saved under {config.out_dir}/")
        if config.posterior_samples > 0:
            # Full-Bayes kinetics AT DENSE SCALE: the O(T) state-space
            # likelihood makes every leapfrog gradient ~constant-time in
            # N = G x T, so HMC is feasible where the exact O(N^3)-per-
            # gradient route is not (the guard in main() only admits
            # --posterior-samples here with --mll-engine ss).
            from dis_project_tpu.training import hmc

            n_draws = config.posterior_samples
            print(f"Sampling hyperparameter posterior at N={scfg.n_points} "
                  f"via the O(T) state-space likelihood: {n_draws} HMC "
                  f"draws ({n_draws} warmup)...")
            t0p = time.perf_counter()
            post = hmc.kinetics_posterior_ss(
                res.params, timepoints, y,
                jax.random.PRNGKey(config.seed + 7),
                jitter=model.jitter,
                num_warmup=n_draws, num_samples=n_draws,
                num_chains=config.posterior_chains,
                force_kernel=config.force_kernel,
                stationary_after=config.stationary_after,
            )
            jax.block_until_ready(post.log_probs)
            samples = _finish_posterior(
                post, t0p, config, data, "dense_ss",
                max_report_genes=10,
            )

            def _predict(p):
                fm, fv, _, _ = ss_ops.lfm_predict_ss(
                    p, timepoints, y, grid, noise_var=nv,
                    force_kernel=config.force_kernel,
                )
                return Gaussian(mean=fm, cov=jnp.diag(fv))

            _plot_bma_latent(
                _predict, samples,
                Gaussian(mean=f_mean, cov=jnp.diag(f_var)),
                grid[:, None], data, config,
                "dense_ss_bma",
                "Smoothed latent force (BMA over the kinetics posterior)",
            )
    if config.metrics_path:
        with open(config.metrics_path, "w") as f:
            for i, l in enumerate(res.history.tolist()):
                f.write(json.dumps({"step": i, "loss": l}) + "\n")
    return res


def _run_dense_second_order(config: cfg.RunConfig, scfg):
    """Dense exact second-order stress run: full-batch MLL on quadrature-
    generated spring-damper data, with alpha/omega recovery metrics."""
    import functools

    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    from dis_project_tpu.data import synthetic
    from dis_project_tpu.data.dataset import train_arrays
    from dis_project_tpu.models import simm2

    print(f"Sampling synthetic order-2 ODE dataset: {scfg.num_genes} x "
          f"{scfg.num_timepoints} (N={scfg.n_points})...")
    data = synthetic.generate_ode2(
        jax.random.PRNGKey(config.seed), scfg, oversample=4
    )
    X, y, var = train_arrays(data)
    model = simm2.SecondOrderSIMM(num_genes=scfg.num_genes,
                                  jitter=config.exact_jitter)
    raw0 = simm2.unconstrain_jit(simm2.init_params(scfg.num_genes, dtype=X.dtype))
    opt = optax.adam(config.learning_rate)

    # Segmented dispatch: at N=1e4 a single 150-step scan is minutes of
    # device time in ONE call, which the remote-TPU transport kills
    # (observed as "TPU worker process crashed"); 10-step scans complete
    # fine (r2 isolation). ~25-step segments keep each dispatch well under
    # the transport's patience at every supported N.  Segments are sized
    # as num_iters split into ceil(num_iters/25) near-equal parts so that
    # round counts like 150/100/40 compile ONE program; only iteration
    # counts with a remainder pay a second (q+1-length) compile.
    n_segs = max(1, -(-config.num_iters // 25))  # num_iters=0: one empty segment
    seg_q, seg_r = divmod(config.num_iters, n_segs)

    # The data sits on one uniform grid, so the per-step Gram build goes
    # through the order-2 table Gram (milliseconds at N=1e4 vs ~2.4 s for
    # the direct complex-erf build) — or, with --mll-engine ss, through
    # the O(T) state-space Kalman engine (ops.statespace.lfm2_mll_ss),
    # which is also the overflow-free route where the complex-erf closed
    # forms leave their omega*l safe region.
    tgrid = jnp.asarray(data.timepoints, X.dtype)
    if config.mll_engine == "ss":
        from dis_project_tpu.ops import statespace as ss_ops

        prior = ("order-10 SDE" if config.force_kernel == "rbf"
                 else f"EXACT {config.force_kernel} prior")
        engine = f"state-space Kalman engine (O(T), {prior})"
        shard = _ss_shard_spec(config)
        objective = lambda r: -ss_ops.lfm2_mll_ss(  # noqa: E731
            simm2.constrain(r), tgrid, y, jitter=config.exact_jitter,
            shard=shard, force_kernel=config.force_kernel,
            stationary_after=config.stationary_after,
        )
    else:
        engine = "order-2 table Gram, Cholesky engine"
        objective = lambda r: -model.mll_gridded(  # noqa: E731
            simm2.constrain(r), tgrid, y
        )

    @functools.partial(jax.jit, static_argnames=("length",))
    def fit_segment(raw, state, length):
        def step(carry, _):
            raw, state = carry
            l, g = jax.value_and_grad(objective)(raw)
            upd, state = opt.update(g, state)
            return (optax.apply_updates(raw, upd), state), l

        (raw, state), hist = jax.lax.scan(step, (raw, state), None,
                                          length=length)
        return raw, state, hist

    print(f"Training (full-batch exact second-order MLL, {engine})...")
    t0 = time.perf_counter()
    raw_f, state = raw0, opt.init(raw0)
    chunks = []
    for i in range(n_segs):
        n_seg = seg_q + (1 if i < seg_r else 0)
        raw_f, state, h = fit_segment(raw_f, state, n_seg)
        chunks.append(np.asarray(h))  # host fetch = segment sync point
    hist = jnp.asarray(np.concatenate(chunks)) if chunks else jnp.zeros(0)
    final = _final_loss(hist)
    print(f"Trained {config.num_iters} iters in "
          f"{time.perf_counter() - t0:.2f}s (final loss {final:.4f}, "
          f"N={scfg.n_points})")
    p = simm2.constrain_jit(raw_f)
    b, s, a_true, w_true = data.params_ground_truth()
    corr_a = float(np.corrcoef(np.asarray(p.alpha), a_true)[0, 1])
    corr_w = float(np.corrcoef(np.asarray(p.omega), w_true)[0, 1])
    print(f"Ground-truth recovery: corr(alpha)={corr_a:.3f} "
          f"corr(omega)={corr_w:.3f}")
    if config.metrics_path:
        with open(config.metrics_path, "w") as f:
            for i, l in enumerate(hist.tolist()):
                f.write(json.dumps({"step": i, "loss": l}) + "\n")
    return p, hist


def _run_dense_multiforce(config: cfg.RunConfig, scfg):
    """Dense multi-force stress run: full-batch exact MLL on R-force
    quadrature-generated data via the O(T (Rp+G)^3) state-space engine
    (``ops.statespace.multisimm_mll_ss``) — the engine is what makes this
    config tractable (no table/Kronecker Gram exists for the R-force
    family), so the route is state-space only (gated in :func:`main`)."""
    import functools

    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    from dis_project_tpu.data import synthetic
    from dis_project_tpu.data.dataset import train_arrays
    from dis_project_tpu.models import multisimm
    from dis_project_tpu.ops import statespace as ss_ops

    R = config.num_forces
    if R < 1:
        raise SystemExit("--num-forces must be >= 1")
    print(f"Sampling synthetic {R}-force ODE dataset via quadrature: "
          f"{scfg.num_genes} x {scfg.num_timepoints} (N={scfg.n_points})...")
    data = synthetic.generate_ode_multi(
        jax.random.PRNGKey(config.seed), scfg, num_forces=R, oversample=4
    )
    X, y, var = train_arrays(data)
    tgrid = jnp.asarray(data.timepoints, X.dtype)
    raw0 = multisimm.unconstrain_jit(
        multisimm.init_params(scfg.num_genes, R, dtype=X.dtype)
    )
    opt = optax.adam(config.learning_rate)
    ss_shard = _ss_shard_spec(config)
    fks = (config.force_kernel,) * R  # same prior for every force
    objective = lambda r: -ss_ops.multisimm_mll_ss(  # noqa: E731
        multisimm.constrain(r), tgrid, y, jitter=config.exact_jitter,
        shard=ss_shard, force_kernels=fks,
        stationary_after=config.stationary_after,
    )

    # Same segmented dispatch as the other dense routes: bound every
    # device dispatch at <= 25 scan steps (remote-transport patience).
    n_segs = max(1, -(-config.num_iters // 25))
    seg_q, seg_r = divmod(config.num_iters, n_segs)

    @functools.partial(jax.jit, static_argnames=("length",))
    def fit_segment(raw, state, length):
        def step(carry, _):
            raw, state = carry
            l, g = jax.value_and_grad(objective)(raw)
            upd, state = opt.update(g, state)
            return (optax.apply_updates(raw, upd), state), l

        (raw, state), hist = jax.lax.scan(step, (raw, state), None,
                                          length=length)
        return raw, state, hist

    prior = ("order-10 SDE" if config.force_kernel == "rbf"
             else f"EXACT {config.force_kernel} priors")
    print(f"Training (full-batch exact {R}-force MLL, state-space Kalman "
          f"engine (O(T), {prior}))...")
    t0 = time.perf_counter()
    raw_f, state = raw0, opt.init(raw0)
    chunks = []
    for i in range(n_segs):
        n_seg = seg_q + (1 if i < seg_r else 0)
        raw_f, state, h = fit_segment(raw_f, state, n_seg)
        chunks.append(np.asarray(h))  # host fetch = segment sync point
    hist = jnp.asarray(np.concatenate(chunks)) if chunks else jnp.zeros(0)
    final = _final_loss(hist)
    print(f"Trained {config.num_iters} iters in "
          f"{time.perf_counter() - t0:.2f}s (final loss {final:.4f}, "
          f"N={scfg.n_points})")
    p = multisimm.constrain_jit(raw_f)
    s_true = np.asarray(data.params_true["sensitivity"])  # (G, R)
    d_true = np.asarray(data.params_true["decay"])
    corr_d = float(np.corrcoef(np.asarray(p.decay), d_true)[0, 1])
    # Per-force sensitivity-column recovery under a UNIQUE greedy |corr|
    # matching (the MLL is invariant to force relabeling — same rationale
    # as the sparse multi-force route's matching).
    s_fit = np.asarray(p.sensitivity)
    cors = np.array([
        [float(np.corrcoef(s_fit[:, r], s_true[:, j])[0, 1])
         for j in range(R)]
        for r in range(R)
    ])
    match, taken = {}, set()
    for r, j in sorted(((r, j) for r in range(R) for j in range(R)),
                       key=lambda rj: -abs(cors[rj])):
        if r not in match and j not in taken:
            match[r] = j
            taken.add(j)
    corr_s = [cors[r, match[r]] for r in range(R)]
    print(f"Ground-truth recovery: corr(decay)={corr_d:.3f} "
          + " ".join(f"corr(S[:,{r}])={c:.3f}" for r, c in enumerate(corr_s)))
    if config.metrics_path:
        with open(config.metrics_path, "w") as f:
            for i, l in enumerate(hist.tolist()):
                f.write(json.dumps({"step": i, "loss": l}) + "\n")
    return p, hist


def _run_dense_nlfm(config: cfg.RunConfig, scfg):
    """Dense nonlinear-response stress run: approximate MARGINAL
    likelihood via the extended Kalman engine
    (``ops.statespace.nlfm_mll_ekf`` — the force integrated out, the
    gene drift linearized around the filtered mean). The MAP route
    (``run_nonlinear``) carries the Q-point force as a parameter; this
    engine is the O(T) kinetics-estimation route at stress scale, so the
    dense preset is state-space only (gated in :func:`main`). Force
    reconstruction quality is EKF-limited for strongly nonlinear
    responses — the p53-preset MAP/HMC routes remain the recommendation
    there (see nlfm_mll_ekf's docstring)."""
    import functools

    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    from dis_project_tpu.data import synthetic
    from dis_project_tpu.data.dataset import train_arrays
    from dis_project_tpu.models import simm
    from dis_project_tpu.ops import statespace as ss_ops

    resp = config.response
    print(f"Sampling synthetic {resp}-response ODE dataset via quadrature: "
          f"{scfg.num_genes} x {scfg.num_timepoints} (N={scfg.n_points})...")
    data = synthetic.generate_ode_nonlinear(
        jax.random.PRNGKey(config.seed), scfg, response=resp, oversample=4
    )
    X, y, var = train_arrays(data)
    tgrid = jnp.asarray(data.timepoints, X.dtype)
    raw0 = simm.unconstrain_jit(simm.init_params(scfg.num_genes,
                                                 dtype=X.dtype))
    opt = optax.adam(config.learning_rate)
    objective = lambda r: -ss_ops.nlfm_mll_ekf(  # noqa: E731
        simm.constrain(r), tgrid, y, response=resp,
        jitter=config.exact_jitter, force_kernel=config.force_kernel,
    )

    n_segs = max(1, -(-config.num_iters // 25))
    seg_q, seg_r = divmod(config.num_iters, n_segs)

    @functools.partial(jax.jit, static_argnames=("length",))
    def fit_segment(raw, state, length):
        def step(carry, _):
            raw, state = carry
            l, g = jax.value_and_grad(objective)(raw)
            upd, state = opt.update(g, state)
            return (optax.apply_updates(raw, upd), state), l

        (raw, state), hist = jax.lax.scan(step, (raw, state), None,
                                          length=length)
        return raw, state, hist

    prior = ("order-10 SDE" if config.force_kernel == "rbf"
             else f"EXACT {config.force_kernel} prior")
    print(f"Training (approximate marginal {resp}-response likelihood, "
          f"extended Kalman engine (O(T), {prior}))...")
    t0 = time.perf_counter()
    raw_f, state = raw0, opt.init(raw0)
    chunks = []
    for i in range(n_segs):
        n_seg = seg_q + (1 if i < seg_r else 0)
        raw_f, state, h = fit_segment(raw_f, state, n_seg)
        chunks.append(np.asarray(h))
    hist = jnp.asarray(np.concatenate(chunks)) if chunks else jnp.zeros(0)
    final = _final_loss(hist)
    print(f"Trained {config.num_iters} iters in "
          f"{time.perf_counter() - t0:.2f}s (final loss {final:.4f}, "
          f"N={scfg.n_points})")
    p = simm.constrain_jit(raw_f)
    corr_d = float(np.corrcoef(
        np.asarray(p.decay), np.asarray(data.params_true["decay"])
    )[0, 1])
    corr_s = float(np.corrcoef(
        np.asarray(p.sensitivity),
        np.asarray(data.params_true["sensitivity"]),
    )[0, 1])
    print(f"Ground-truth recovery: corr(decay)={corr_d:.3f} "
          f"corr(sensitivity)={corr_s:.3f}")
    if config.metrics_path:
        with open(config.metrics_path, "w") as f:
            for i, l in enumerate(hist.tolist()):
                f.write(json.dumps({"step": i, "loss": l}) + "\n")
    return p, hist


def _run_dense_delay(config: cfg.RunConfig, scfg):
    """Dense delayed-response stress run: full-batch exact MLL on
    delayed-ODE quadrature data via the O(T G (p+G)^3) state-space engine
    (``ops.statespace.delaysimm_mll_ss`` — each (timepoint, gene) pair is
    one warped-time filter step). The engine is what makes this config
    tractable: the delay family's dense Gram has no table/Kronecker form
    (the per-gene warp breaks the shared-grid structure), so the route is
    state-space only (gated in :func:`main`). Gene 0's delay is pinned to
    0 every step — the same identifiability anchor as ``delaysimm.fit``
    and the generator's gene-0 ground-truth pin, so recovered delays are
    directly comparable."""
    import functools

    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    from dis_project_tpu.data import synthetic
    from dis_project_tpu.data.dataset import train_arrays
    from dis_project_tpu.models import delaysimm
    from dis_project_tpu.ops import statespace as ss_ops

    print(f"Sampling synthetic delayed-ODE dataset via quadrature: "
          f"{scfg.num_genes} x {scfg.num_timepoints} (N={scfg.n_points})...")
    data = synthetic.generate_ode_delay(
        jax.random.PRNGKey(config.seed), scfg, oversample=4
    )
    X, y, var = train_arrays(data)
    tgrid = jnp.asarray(data.timepoints, X.dtype)
    raw0 = delaysimm.unconstrain(
        delaysimm.init_params(scfg.num_genes, dtype=X.dtype)
    )
    opt = optax.adam(config.learning_rate)
    ss_shard = _ss_shard_spec(config)
    zero_raw = jnp.asarray(-20.0, X.dtype)  # softplus^-1 of ~2e-9

    objective = lambda r: -ss_ops.delaysimm_mll_ss(  # noqa: E731
        delaysimm.constrain(r), tgrid, y, jitter=config.exact_jitter,
        shard=ss_shard, force_kernel=config.force_kernel,
    )

    # Same segmented dispatch as the other dense routes (remote-transport
    # patience: <= 25 scan steps per dispatch).
    n_segs = max(1, -(-config.num_iters // 25))
    seg_q, seg_r = divmod(config.num_iters, n_segs)

    @functools.partial(jax.jit, static_argnames=("length",))
    def fit_segment(raw, state, length):
        def step(carry, _):
            raw, state = carry
            l, g = jax.value_and_grad(objective)(raw)
            upd, state = opt.update(g, state)
            raw = optax.apply_updates(raw, upd)
            raw = raw._replace(delay=raw.delay.at[0].set(zero_raw))
            return (raw, state), l

        (raw, state), hist = jax.lax.scan(step, (raw, state), None,
                                          length=length)
        return raw, state, hist

    prior = ("order-10 SDE" if config.force_kernel == "rbf"
             else f"EXACT {config.force_kernel} prior")
    print(f"Training (full-batch exact delayed MLL, state-space Kalman "
          f"engine (O(T G), {prior}))...")
    t0 = time.perf_counter()
    raw_f, state = raw0, opt.init(raw0)
    chunks = []
    for i in range(n_segs):
        n_seg = seg_q + (1 if i < seg_r else 0)
        raw_f, state, h = fit_segment(raw_f, state, n_seg)
        chunks.append(np.asarray(h))  # host fetch = segment sync point
    hist = jnp.asarray(np.concatenate(chunks)) if chunks else jnp.zeros(0)
    final = _final_loss(hist)
    print(f"Trained {config.num_iters} iters in "
          f"{time.perf_counter() - t0:.2f}s (final loss {final:.4f}, "
          f"N={scfg.n_points})")
    p = delaysimm.constrain(raw_f)
    d_true = np.asarray(data.params_true["decay"])
    del_true = np.asarray(data.params_true["delay"])
    corr_d = float(np.corrcoef(np.asarray(p.decay), d_true)[0, 1])
    del_fit = np.asarray(p.delay)
    corr_del = float(np.corrcoef(del_fit, del_true)[0, 1])
    mae_del = float(np.abs(del_fit - del_true).mean())
    print(f"Ground-truth recovery: corr(decay)={corr_d:.3f} "
          f"corr(delay)={corr_del:.3f} delay MAE={mae_del:.3f}")
    if config.posterior_samples > 0:
        # Full-Bayes (kinetics, delays) AT DENSE SCALE through the O(T G)
        # warped-event likelihood (training.hmc.delay_posterior_ss) — the
        # exact route's O(N^3)-per-gradient is impractical here.
        from dis_project_tpu.training import hmc

        n_draws = config.posterior_samples
        print(f"Sampling (kinetics, delay) posterior at N={scfg.n_points} "
              f"via the O(T G) warped-event likelihood: {n_draws} HMC "
              f"draws ({n_draws} warmup)...")
        t0p = time.perf_counter()
        post = hmc.delay_posterior_ss(
            p, tgrid, y, jax.random.PRNGKey(config.seed + 7),
            jitter=config.exact_jitter,
            num_warmup=n_draws, num_samples=n_draws,
            num_chains=config.posterior_chains,
            force_kernel=config.force_kernel,
        )
        jax.block_until_ready(post.log_probs)
        pooled = _finish_posterior(
            post, t0p, config, data, "dense_delay_ss",
            max_report_genes=10,
        )
        dvals = np.asarray(pooled.delay)
        n_rep = min(10, dvals.shape[1])
        extra = (f" (reporting the first {n_rep} of {dvals.shape[1]} "
                 "genes)" if dvals.shape[1] > n_rep else "")
        print(f"\nPosterior delays vs generating truth{extra}:")
        for g_i in range(n_rep):
            lo, hi = np.percentile(dvals[:, g_i], [5, 95])
            print(f"  delay g{g_i:03d} {dvals[:, g_i].mean():.4f} "
                  f"+/- {dvals[:, g_i].std():.4f} [{lo:.4f}, {hi:.4f}] "
                  f"(true {del_true[g_i]:.4f})")
    if config.metrics_path:
        with open(config.metrics_path, "w") as f:
            for i, l in enumerate(hist.tolist()):
                f.write(json.dumps({"step": i, "loss": l}) + "\n")
    return p, hist


def run_sparse(config: cfg.RunConfig):
    """Sparse variational stress run (BASELINE config 5): synthetic data at
    N up to 1e5, minibatch SVI on the whitened ELBO with latent-force
    inducing points."""
    import numpy as np

    _setup_backend(config)

    import jax

    from dis_project_tpu.data import synthetic
    from dis_project_tpu.data.dataset import train_arrays
    from dis_project_tpu.models import svlfm
    from dis_project_tpu.training import svtrainer

    scfg = synthetic.SyntheticConfig(
        num_genes=config.synth_genes,
        num_timepoints=config.synth_timepoints,
        num_replicates=1,
        noise_std=0.1,
    )
    order = 2 if config.model == "simm2" else 1
    n_forces = config.num_forces if config.model == "multisimm" else 1
    kind = (f"{n_forces}-force order-1" if n_forces > 1
            else f"order-{order}")
    print(f"Sampling synthetic {kind} ODE dataset via quadrature: "
          f"{scfg.num_genes} x {scfg.num_timepoints} (N={scfg.n_points})...")
    # The ODE-integrator path scales to N=1e5 (no N x N output Gram to
    # sample); oversample=4 keeps the fine-grid force Cholesky tractable
    # at 1000 output timepoints while holding quadrature error ~1e-4.
    if n_forces > 1:
        data = synthetic.generate_ode_multi(
            jax.random.PRNGKey(config.seed), scfg, num_forces=n_forces,
            oversample=4,
        )
    elif order == 2:
        data = synthetic.generate_ode2(
            jax.random.PRNGKey(config.seed), scfg, oversample=4
        )
    else:
        data = synthetic.generate_ode(
            jax.random.PRNGKey(config.seed), scfg, oversample=4
        )
    X, y, var = train_arrays(data)

    # Honor --jitter (SparseSIMM applies its own f32 floor for Kuu);
    # the sparse default is tighter than the exact path's 1e-4.
    sparse_jitter = config.sparse_jitter
    model = svlfm.SparseSIMM(
        num_genes=scfg.num_genes,
        num_inducing=config.num_inducing,
        jitter=sparse_jitter,
        order=order,
        num_forces=n_forces,
    )
    params = svlfm.init_params(scfg.num_genes, config.num_inducing,
                               t_max=scfg.t_max, dtype=X.dtype, order=order,
                               num_forces=n_forces)
    dp_mesh = None
    if config.dp_shard:
        # Data-parallel SVI: minibatch rows sharded over a 1-D mesh of
        # every visible device (per-device ELBO shards, psum'd grads —
        # GSPMD inserts the collectives). Degenerate 1-device mesh on the
        # single chip; the 8-device virtual mesh in the tests is the real
        # exercise. Identical trajectory to the single-device run.
        from jax.sharding import Mesh

        dp_mesh = Mesh(np.asarray(jax.devices()), ("data",))
        print(f"Data-parallel SVI over {jax.device_count()} devices "
              "(minibatch rows sharded, grads psum'd)")
    print(f"Training SVI: {config.num_epochs} epochs, batch "
          f"{config.batch_size}, M={config.num_inducing} inducing points...")
    t0 = time.perf_counter()
    res = svtrainer.fit(
        model,
        params,
        X,
        y,
        var,
        svtrainer.SVTrainConfig(
            num_epochs=config.num_epochs,
            batch_size=config.batch_size,
            learning_rate=config.learning_rate,
            seed=config.seed,
        ),
        mesh=dp_mesh,
    )
    hist = np.asarray(res.history)
    wall = time.perf_counter() - t0
    print(f"Trained {hist.size} minibatch steps in {wall:.2f}s "
          f"(neg-ELBO first epoch {hist[0].mean():.1f} -> "
          f"last epoch {hist[-1].mean():.1f})")

    import jax.numpy as jnp

    t_grid = jnp.asarray(np.linspace(0.0, scfg.t_max, scfg.num_timepoints),
                         X.dtype)
    from dis_project_tpu.reporting import plotter

    if n_forces > 1:
        # Per-force recovery: match posterior forces to true forces by
        # |corr| under a UNIQUE (greedy, best-first) assignment — the ELBO
        # is invariant to force relabeling, but independent per-force
        # argmax could map two posterior forces onto the SAME truth when
        # recovery is partial, overstating it.
        f_true = np.asarray(data.f_true)  # (R, T)
        posts = [
            jax.jit(model.latent_predict, static_argnames=("force",))(
                res.params, t_grid, force=r
            )
            for r in range(n_forces)
        ]
        cors_mat = np.array([
            [float(np.corrcoef(np.asarray(post.mean), f_true[j])[0, 1])
             for j in range(n_forces)]
            for post in posts
        ])
        match = {}
        taken = set()
        for r, j in sorted(
            ((r, j) for r in range(n_forces) for j in range(n_forces)),
            key=lambda rj: -abs(cors_mat[rj]),
        ):
            if r not in match and j not in taken:
                match[r] = j
                taken.add(j)
        for r, post in enumerate(posts):
            best = match[r]
            cors = cors_mat[r]
            print(f"Latent force {r} recovery: corr {cors[best]:+.3f} "
                  f"(vs generating force {best})")
            plotter.plot_lf(
                jnp.stack(
                    [t_grid, jnp.full_like(t_grid, r),
                     jnp.zeros_like(t_grid)], -1
                ),
                post,
                y_scatter=np.sign(cors[best]) * f_true[best],
                scatter_times=data.timepoints,
                title=f"force {r}",
                save_name=(config.save_name or "sparse_lf") + f"_f{r}",
                out_dir=config.out_dir,
            )
        corr = None
    else:
        # jit: eager complex ops (order-2 kernels) are unimplemented on the
        # TPU backend; the compiled graph lowers them to real pairs.
        post = jax.jit(model.latent_predict)(res.params, t_grid)
        corr = float(np.corrcoef(np.asarray(post.mean),
                                 np.asarray(data.f_true))[0, 1])
        print(f"Latent-force recovery correlation vs generating force: "
              f"{corr:.3f}")
        plotter.plot_lf(
            jnp.stack(
                [t_grid, -jnp.ones_like(t_grid), jnp.zeros_like(t_grid)], -1
            ),
            post,
            y_scatter=np.asarray(data.f_true).reshape(1, 1, -1),
            scatter_times=data.timepoints,
            save_name=config.save_name or "sparse_lf",
            out_dir=config.out_dir,
        )
    print(f"Latent-force recovery plot saved under {config.out_dir}/")
    if config.metrics_path:
        with open(config.metrics_path, "w") as f:
            for e, row in enumerate(hist):
                f.write(json.dumps(
                    {"epoch": e, "neg_elbo_mean": float(row.mean())}) + "\n")
    return res


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    cfg.add_cli_args(parser)
    args = parser.parse_args(argv)
    config = cfg.config_from_args(args)
    # Unsupported flag combinations fail loudly rather than silently
    # running a different experiment than the flags describe.
    if config.model == "simm2" and config.preset in (
        "alfi-parity", "p53-replicates"
    ):
        raise SystemExit(
            f"--model simm2 is not supported with --preset {config.preset} "
            "(second-order routes: the default preset, dense10k, sparse100k)"
        )
    if config.model == "multisimm" and config.preset not in (
        "p53", "sparse100k", "dense10k"
    ):
        raise SystemExit(
            f"--model multisimm is not supported with --preset "
            f"{config.preset} (multi-force routes: the default preset, "
            "dense10k with --mll-engine ss, and sparse100k)"
        )
    if config.model == "nlfm" and config.preset not in ("p53", "dense10k"):
        raise SystemExit(
            f"--model nlfm is not supported with --preset {config.preset} "
            "(nonlinear-response routes: the default p53 preset, and "
            "dense10k with --mll-engine ss)"
        )
    if config.model == "delaysimm" and config.preset not in (
        "p53", "dense10k"
    ):
        raise SystemExit(
            f"--model delaysimm is not supported with --preset "
            f"{config.preset} (delayed-response routes: the default p53 "
            "preset, and dense10k with --mll-engine ss)"
        )
    if config.ensemble and config.preset != "p53-replicates":
        raise SystemExit("--ensemble requires --preset p53-replicates")
    if config.mll_engine != "cholesky":
        # Engine support matrix: the first-order dense route takes every
        # engine; simm2/multisimm dense routes take the state-space engine
        # only (no CG probes or row-sharded Gram exist for those
        # families). Everything else is Cholesky-only.
        engine_ok = config.preset == "dense10k" and (
            config.model == "simm" or config.mll_engine == "ss"
        )
        if not engine_ok:
            raise SystemExit(
                f"--mll-engine {config.mll_engine} is only supported by "
                "the dense10k routes (--model simm: any engine; simm2/"
                "multisimm/delaysimm: --mll-engine ss only)"
            )
    elif config.model == "multisimm" and config.preset == "dense10k":
        raise SystemExit(
            "--preset dense10k --model multisimm requires --mll-engine ss "
            "(the R-force family has no dense table Gram; the O(T) "
            "state-space engine is the dense-scale route)"
        )
    elif config.model == "delaysimm" and config.preset == "dense10k":
        raise SystemExit(
            "--preset dense10k --model delaysimm requires --mll-engine ss "
            "(the per-gene warp breaks the shared-grid table Gram; the "
            "O(T G) warped-event state-space engine is the dense-scale "
            "route)"
        )
    elif config.model == "nlfm" and config.preset == "dense10k":
        raise SystemExit(
            "--preset dense10k --model nlfm requires --mll-engine ss "
            "(no closed-form Gram exists for the nonlinear family; the "
            "extended Kalman engine is the dense-scale marginal route)"
        )
    if config.posterior_chains < 1:
        raise SystemExit("--posterior-chains must be >= 1")
    if config.posterior_chains > 1 and not config.posterior_samples:
        raise SystemExit("--posterior-chains requires --posterior-samples")
    if config.ss_shard and config.mll_engine != "ss":
        raise SystemExit(
            "--ss-shard requires --mll-engine ss (it shards the Kalman "
            "filter's time axis)"
        )
    if config.stationary_after is not None:
        if config.mll_engine != "ss":
            raise SystemExit(
                "--stationary-after requires --mll-engine ss (it freezes "
                "the Kalman gain at the covariance fixed point)"
            )
        if config.ss_shard:
            raise SystemExit(
                "--stationary-after is incompatible with --ss-shard "
                "(the sharded filter keeps per-chunk exact covariances)"
            )
        if config.model in ("delaysimm", "nlfm"):
            raise SystemExit(
                "--stationary-after requires a UNIFORM-grid family "
                "(simm/simm2/multisimm): the delay family's warped event "
                "chain and the EKF's state-dependent prediction have no "
                "shared-step gain fixed point"
            )
        if config.stationary_after < 1:
            raise SystemExit("--stationary-after must be >= 1")
    if config.force_kernel != "rbf" and config.mll_engine != "ss":
        raise SystemExit(
            "--force-kernel requires --mll-engine ss (the Matern priors "
            "are exactly Markovian but have NO closed-form dense Gram; "
            "every state-space route supports them — multisimm applies "
            "the kernel to every force)"
        )
    if config.ss_shard and config.model == "nlfm":
        raise SystemExit(
            "--ss-shard is not supported on the nlfm EKF route (the "
            "extended prediction step is state-dependent, so the "
            "filtering-semigroup factorisation does not apply)"
        )
    if config.dp_shard and config.preset != "sparse100k":
        raise SystemExit(
            "--dp-shard requires --preset sparse100k (it shards the SVI "
            "minibatch's row axis over the device mesh)"
        )
    # dense10k + the state-space engine admits the posterior route: the
    # O(T) likelihood is what makes HMC feasible at N >= 1e4 (first-order
    # simm, and r4 the delay family through the warped-event likelihood).
    dense_ss_posterior = (
        config.preset == "dense10k"
        and config.mll_engine == "ss"
        and config.model in ("simm", "delaysimm")
    )
    if config.posterior_samples and (
        (config.preset in ("alfi-parity", "dense10k", "sparse100k")
         and not dense_ss_posterior)
        or config.model in ("simm2", "multisimm")
        or config.ensemble
    ):
        raise SystemExit(
            "--posterior-samples is only supported on the exact "
            "first-order p53 routes (the default preset, and "
            "--preset p53-replicates without --ensemble), the "
            "nlfm route, and --preset dense10k --mll-engine ss "
            "(the O(T) state-space likelihood)"
        )

    if config.preset == "alfi-parity":
        run_alfi_parity(config)
    elif config.preset == "dense10k":
        run_dense(config)
    elif config.preset == "sparse100k":
        # --model simm2 selects the second-order sparse path (order=2).
        run_sparse(config)
    elif config.model == "simm2":
        run_second_order(config)
    elif config.model == "multisimm":
        run_multiforce(config)
    elif config.model == "nlfm":
        run_nonlinear(config)
    elif config.model == "delaysimm":
        run_delay(config)
    elif config.preset == "p53-replicates":
        if config.ensemble:
            run_replicate_ensemble(config)
        else:
            config.replicate = None
            run(config)
    else:
        run(config)


if __name__ == "__main__":
    main()
