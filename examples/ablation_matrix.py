"""Reproduce the reference's full ablation artifact matrix
(reference ``src/plots/`` + ``src/plots/ablation/``, SURVEY.md §2 #35):

- per-replicate runs (replicate 2 and 3 in the reference's 1-based naming),
- gene-subset ablations: two / three / four genes, four genes incl. p21,
  p21 alone, DR5 alone,
- zero measurement noise,
- p21 clamp released (``p21_not_fixed``).

Each cell trains the canonical 150-iteration pipeline and writes the
latent-force and gene-expression plots under ``plots/ablation/`` with the
reference's naming scheme. Run: ``python examples/ablation_matrix.py``
(CPU, a few minutes; add ``--source csv`` when the Barenco CSVs are in
``data/``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp


CELLS = [
    # (name, replicate, genes, fix_params, zero_noise)
    ("replicate2", 1, None, True, False),
    ("replicate3", 2, None, True, False),
    ("two_genes", 0, ["DDB2", "p21"], True, False),
    ("three_genes", 0, ["DDB2", "p21", "SESN1"], True, False),
    ("four_genes", 0, ["DDB2", "BIK", "DR5", "SESN1"], False, False),
    ("four_genes_p21", 0, ["DDB2", "BIK", "DR5", "p21"], True, False),
    ("p21", 0, ["p21"], True, False),
    ("DR5", 0, ["DR5"], False, False),
    ("zero_noise", 0, None, True, True),
    ("p21_not_fixed", 0, None, False, False),
]


def run_cell(name, replicate, genes, fix_params, zero_noise, source, out_dir):
    from dis_project_tpu.data.dataset import P53Data, train_arrays
    from dis_project_tpu.models import simm
    from dis_project_tpu.reporting import plotter
    from dis_project_tpu.training import trainer as tr
    from dis_project_tpu.utils.test_grids import expression_grid, latent_grid

    data = P53Data(replicate=replicate, selected_genes=genes, source=source)
    X, y, var = train_arrays(data)
    if zero_noise:
        var = jnp.zeros_like(var)

    model = simm.ExactSIMM(num_genes=data.num_genes, jitter=1e-4)
    clamp_gene = (
        data.gene_names.index("p21") if "p21" in data.gene_names else 0
    )
    fix = fix_params and "p21" in data.gene_names
    res = tr.fit(
        model,
        simm.init_params(data.num_genes),
        X,
        y,
        tr.TrainConfig(num_iters=150, fix_params=fix, clamp_gene=clamp_gene),
    )

    t_grid = latent_grid(100)
    latent = model.latent_predict(res.params, t_grid, X, y, var)
    plotter.plot_lf(
        t_grid,
        latent,
        y_scatter=data.f_observed,
        save_name=name,
        out_dir=out_dir,
    )
    x_grid = expression_grid(data.num_genes, t=100)
    gene_dist = model.multi_gene_predict(res.params, x_grid, X, y, var)
    plotter.plot_gene_predictions(
        x_grid, gene_dist, data, save_name=name, out_dir=out_dir
    )
    print(f"  {name}: genes={data.gene_names} N={X.shape[0]} "
          f"final={float(res.history[-1]):.4f} fix_params={fix}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", default="synthetic",
                    choices=["auto", "csv", "synthetic"])
    ap.add_argument("--out-dir", default="plots/ablation")
    args = ap.parse_args()

    print(f"Running {len(CELLS)} ablation cells -> {args.out_dir}/")
    for cell in CELLS:
        run_cell(*cell, source=args.source, out_dir=args.out_dir)
    print("Ablation matrix complete.")


if __name__ == "__main__":
    main()
