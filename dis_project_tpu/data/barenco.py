"""Barenco et al. (2006) p53 microarray data: loader + synthetic fallback.

The reference loads two CSVs (``barencoPUMA_exprs.csv``/``_se.csv``) that are
*not* redistributed with it (downloaded separately, see reference
``data/README.md``), selects 6 probes, renames them to
DDB2/p21/SESN1/BIK/DR5/p53, log-normal-transforms means and variances, and
rescales per gene (reference ``src/dataset.py:213-321``). :func:`load_csv`
reproduces that pipeline exactly when the CSVs are present.

Because the CSVs are typically absent, :func:`synthetic` generates a
deterministic stand-in with identical shapes and realistic dynamics: the
published Barenco latent-force profile is smoothly interpolated and pushed
through the actual SIMM ODE ``dx/dt = B + S f(t) - D x`` with the published
ground-truth kinetics (reference ``src/dataset.py:201-203``), integrated with
RK4, plus fixed-seed replicate noise. :func:`load` dispatches between them.
"""

from __future__ import annotations

import os
import warnings

import numpy as np

GENE_NAMES = ["DDB2", "BIK", "DR5", "p21", "SESN1"]

# Published Barenco kinetics (reference src/dataset.py:201-203), ordered as
# GENE_NAMES above.
B_EXACT = np.array([0.0649, 0.0069, 0.0181, 0.0033, 0.0869])
D_EXACT = np.array([0.2829, 0.3720, 0.3617, 0.8000, 0.3573])
S_EXACT = np.array([0.9075, 0.9748, 0.9785, 1.0000, 0.9680])

# Published latent p53 activity at the 7 measurement times
# (reference src/dataset.py:111-113).
F_BARENCO = np.array([0.1845, 1.1785, 1.6160, 0.8156, 0.6862, -0.1828, 0.5131])

TIMEPOINTS = np.linspace(0.0, 12.0, 7)

_PROBE_TO_GENE = {
    "203409_at": "DDB2",
    "202284_s_at": "p21",
    "218346_s_at": "SESN1",
    "205780_at": "BIK",
    "209295_at": "DR5",
    "211300_s_at": "p53",
}


def load_csv(dir_path: str) -> dict:
    """Reference-parity CSV pipeline (``src/dataset.py:213-321``)."""
    import pandas as pd

    exprs = pd.read_csv(os.path.join(dir_path, "barencoPUMA_exprs.csv"), index_col=0)
    se = pd.read_csv(os.path.join(dir_path, "barencoPUMA_se.csv"), index_col=0)

    columns = [f"cARP{r}-{t}hrs.CEL" for r in range(1, 4) for t in np.arange(7) * 2]
    known = list(_PROBE_TO_GENE)

    genes = exprs[exprs.index.isin(known)][columns].rename(index=_PROBE_TO_GENE)
    genes_se = se[se.index.isin(known)][columns].rename(index=_PROBE_TO_GENE)

    order = ["DDB2", "BIK", "DR5", "p21", "SESN1", "p53"]
    genes = genes.reindex(order)
    genes_se = genes_se.reindex(order)

    p53 = genes.iloc[-1:].values
    targets = genes.iloc[:-1].values
    p53_var = genes_se.iloc[-1:].values ** 2
    targets_var = genes_se.iloc[:-1].values ** 2

    # Log-normal transform of means and variances.
    p53_full = np.exp(p53 + p53_var / 2)
    targets_full = np.exp(targets + targets_var / 2)
    p53_var_full = (np.exp(p53_var) - 1) * np.exp(2 * p53 + p53_var)
    targets_var_full = (np.exp(targets_var) - 1) * np.exp(2 * targets + targets_var)

    # Per-gene rescale by the std-dev over the first replicate's 7 points.
    p53_scale = np.sqrt(np.var(p53_full[:, :7], ddof=1))
    p53_scale = np.c_[[p53_scale for _ in range(7 * 3)]].T
    p53_expr = np.float64(p53_full / p53_scale).reshape((3, 1, 7))
    p53_vars = np.float64(p53_var_full / p53_scale**2).reshape((3, 1, 7))

    t_scale = np.sqrt(np.var(targets_full[:, :7], axis=1, ddof=1))
    t_scale = np.c_[[t_scale for _ in range(7 * 3)]].T
    gene_expr = np.float64(targets_full / t_scale).reshape((5, 3, 7)).swapaxes(0, 1)
    gene_vars = (
        np.float64(targets_var_full / t_scale**2).reshape((5, 3, 7)).swapaxes(0, 1)
    )

    return {
        "gene_names": list(GENE_NAMES),
        "gene_expressions": gene_expr,
        "gene_variances": gene_vars,
        "p53_expressions": p53_expr,
        "p53_variances": p53_vars,
    }


def interpolate_force(t, anchors_t=TIMEPOINTS, anchors_f=F_BARENCO, width=1.6):
    """Smooth RBF interpolant through the published latent-force profile.

    Solves the tiny (7x7) RBF system once so f(t) passes through the
    published points and stays C-infinity — the latent force a SIMM GP with
    the published kinetics would plausibly have produced.
    """
    gram_a = np.exp(-((anchors_t[:, None] - anchors_t[None, :]) ** 2) / (2 * width**2))
    weights = np.linalg.solve(gram_a + 1e-10 * np.eye(len(anchors_t)), anchors_f)
    basis = np.exp(-((np.asarray(t)[:, None] - anchors_t[None, :]) ** 2) / (2 * width**2))
    return basis @ weights


def simulate_expression(t_grid, basal, sens, decay, dt=0.005):
    """RK4-integrate dx/dt = B + S f(t) - D x from x(0) = B/D, sample t_grid."""
    t_fine = np.arange(0.0, float(t_grid[-1]) + dt, dt)
    f_fine = interpolate_force(t_fine)

    def f_at(time):
        idx = min(int(round(time / dt)), len(f_fine) - 1)
        return f_fine[idx]

    x = basal / decay
    out = np.empty((len(t_grid), len(basal)))
    next_sample = 0
    for i, time in enumerate(t_fine):
        if next_sample < len(t_grid) and time >= t_grid[next_sample] - 1e-9:
            out[next_sample] = x
            next_sample += 1
        if i + 1 >= len(t_fine):
            break

        def deriv(xv, tv):
            return basal + sens * f_at(tv) - decay * xv

        k1 = deriv(x, time)
        k2 = deriv(x + 0.5 * dt * k1, time + 0.5 * dt)
        k3 = deriv(x + 0.5 * dt * k2, time + 0.5 * dt)
        k4 = deriv(x + dt * k3, time + dt)
        x = x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    while next_sample < len(t_grid):
        out[next_sample] = x
        next_sample += 1
    return out  # (T, G)


def synthetic(seed: int = 0, noise_frac: float = 0.08) -> dict:
    """Deterministic Barenco-shaped dataset from the real SIMM dynamics."""
    rng = np.random.default_rng(seed)
    clean = simulate_expression(TIMEPOINTS, B_EXACT, S_EXACT, D_EXACT).T  # (G, T)

    reps = []
    var_reps = []
    for _ in range(3):
        std = np.maximum(noise_frac * np.abs(clean), 0.02)
        noisy = clean + rng.normal(size=clean.shape) * std
        reps.append(noisy)
        var_reps.append(std**2)
    gene_expr = np.stack(reps)  # (3, G, T)
    gene_vars = np.stack(var_reps)

    f_clean = interpolate_force(TIMEPOINTS)
    p53_reps, p53_vars = [], []
    for _ in range(3):
        std = np.maximum(noise_frac * np.abs(f_clean), 0.02)
        p53_reps.append(f_clean + rng.normal(size=f_clean.shape) * std)
        p53_vars.append(std**2)
    p53_expr = np.stack(p53_reps)[:, None, :]  # (3, 1, T)
    p53_var = np.stack(p53_vars)[:, None, :]

    return {
        "gene_names": list(GENE_NAMES),
        "gene_expressions": gene_expr,
        "gene_variances": gene_vars,
        "p53_expressions": p53_expr,
        "p53_variances": p53_var,
    }


def load(data_dir: str = "data", source: str = "auto", seed: int = 0) -> dict:
    """Load Barenco data: ``csv``, ``synthetic``, or ``auto`` (csv if found)."""
    if source not in ("auto", "csv", "synthetic"):
        raise ValueError(f"unknown source {source!r}")
    if source in ("auto", "csv"):
        path = os.path.join(data_dir, "barencoPUMA_exprs.csv")
        if os.path.exists(path):
            return load_csv(data_dir)
        if source == "csv":
            raise FileNotFoundError(f"Barenco CSVs not found under {data_dir!r}")
        warnings.warn(
            "Barenco CSVs not found; using the deterministic synthetic "
            "stand-in (dis_project_tpu.data.barenco.synthetic).",
            stacklevel=2,
        )
    return synthetic(seed=seed)
