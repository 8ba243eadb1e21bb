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


def run(config: cfg.RunConfig):
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
        jitter=config.jitter,
        legacy_block_mean=config.legacy_block_mean,
    )
    params0 = simm.init_params(data.num_genes)

    train_cfg = tr.TrainConfig(
        num_iters=config.num_iters,
        learning_rate=config.learning_rate,
        fix_params=config.fix_params,
        num_steps_per_epoch=config.num_steps_per_epoch,
        track_parameters=config.track_parameters,
        optimizer=config.optimizer,
    )

    print("Training model...")
    t0 = time.perf_counter()
    result = tr.fit(model, params0, X, y, train_cfg)
    jax.block_until_ready(result.history)
    wall = time.perf_counter() - t0
    print(
        f"Trained {config.num_iters} iters in {wall:.2f}s "
        f"(final loss {float(result.history[-1]):.6f})"
    )

    if config.metrics_path:
        with open(config.metrics_path, "w") as f:
            for i, (loss, gn) in enumerate(
                zip(result.history.tolist(), result.grad_norms.tolist())
            ):
                f.write(json.dumps({"step": i, "loss": loss, "grad_norm": gn}) + "\n")

    if config.checkpoint_dir:
        from dis_project_tpu.training import checkpoint as ckpt

        ckpt.save(config.checkpoint_dir, result.params, step=config.num_iters)

    tables.print_hyperparams(result.params, data, csv_path="hyperparams.csv")

    print("Making predictions and plotting...")
    t_grid = latent_grid(100)
    latent_dist = model.latent_predict(result.params, t_grid, X, y, var)
    plotter.plot_lf(
        t_grid,
        latent_dist,
        y_scatter=data.f_observed,
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
    print(f"Plots saved under {config.out_dir}/")
    return result


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    cfg.add_cli_args(parser)
    args = parser.parse_args()
    run(cfg.config_from_args(args))


if __name__ == "__main__":
    main()
