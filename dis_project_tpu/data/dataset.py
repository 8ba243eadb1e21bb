"""Dataset container and input encodings for the p53 SIMM LFM.

``P53Data`` mirrors the reference's ``JaxP53Data`` semantics
(``src/dataset.py:21-210``): replicate selection (None = all three,
int = one), gene-subset selection for ablations with full validation of
unknown / duplicate / empty gene lists, ``timepoints = linspace(0, 12, 7)``,
the published latent-force profile, and ground-truth kinetics filtered by the
selected genes.

Two input encodings are provided:

- :func:`dataset_3d` — the reference GPJax encoding: rows
  ``(t, gene_index, flag)`` with flag 1 = expression, 0 = latent force
  (``src/dataset.py:358-399``); replicate-major, then gene-major blocks of T.
- :func:`flatten_blocked` — the reference GPyTorch/ALFI encoding: a 1-D
  blocked time vector with gene identity implied by block position
  (``src/gpytorch_alfi/model_alfi.py:545-569``), used by the validation
  stack.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from dis_project_tpu.data import barenco


class P53Data:
    """Gene-expression container with replicate / gene-subset selection."""

    def __init__(
        self,
        replicate: Optional[int] = None,
        data_dir: str = "data",
        selected_genes: Optional[Sequence[str]] = None,
        source: str = "auto",
        seed: int = 0,
    ):
        gene_data = barenco.load(data_dir=data_dir, source=source, seed=seed)
        all_genes = gene_data["gene_names"]

        if not (replicate is None or 0 <= replicate < 3):
            raise AssertionError("Invalid replicate number")

        if selected_genes is not None:
            selected_genes = list(selected_genes)
            valid = set(all_genes)
            chosen = set(selected_genes)
            if not chosen.issubset(valid):
                missing = chosen - valid
                raise ValueError(
                    f"Invalid gene names provided: {', '.join(sorted(missing))}"
                )
            if len(selected_genes) != len(chosen):
                dupes = {g for g in selected_genes if selected_genes.count(g) > 1}
                raise ValueError(f"Duplicate genes provided: {', '.join(sorted(dupes))}")
            if len(selected_genes) == 0:
                raise ValueError(
                    "Empty list of genes selected, set 'selected_genes' to None"
                )
            # Keep the dataset's gene order (the reference filters by
            # membership, not by the order genes were requested in:
            # src/dataset.py:90-94).
            indices = [i for i, g in enumerate(all_genes) if g in chosen]
            self.selected_indices = indices
            self.gene_names = [all_genes[i] for i in indices]
        else:
            self.selected_indices = list(range(len(all_genes)))
            self.gene_names = list(all_genes)

        idx = np.asarray(self.selected_indices)
        expressions = np.asarray(gene_data["gene_expressions"])[:, idx]
        variances = np.asarray(gene_data["gene_variances"])[:, idx]

        self.num_genes = len(self.gene_names)
        self.timepoints = jnp.asarray(barenco.TIMEPOINTS)
        self.f_observed = jnp.asarray(barenco.F_BARENCO).reshape(1, 1, 7)
        self.replicate = replicate

        if replicate is None:
            self.gene_expressions = jnp.asarray(expressions)  # (3, G, T)
            self.gene_variances = jnp.asarray(variances)
        else:
            self.gene_expressions = jnp.asarray(expressions[replicate : replicate + 1])
            self.gene_variances = jnp.asarray(variances[replicate : replicate + 1])

        self.num_replicates = int(self.gene_expressions.shape[0])

    def __len__(self) -> int:
        return self.num_replicates * self.num_genes

    def __getitem__(self, index: int):
        """(timepoints, expression) for flat index replicate-major over genes,
        matching the reference's list ordering (``src/dataset.py:121-125``)."""
        if index < 0 or index >= len(self):
            raise IndexError("Index out of range")
        r, g = divmod(index, self.num_genes)
        return self.timepoints, self.gene_expressions[r, g]

    @property
    def shape(self):
        return (len(self), 2, int(self.timepoints.shape[0]))

    def params_ground_truth(self):
        """Published Barenco kinetics (B, S, D), filtered to selected genes
        (reference ``src/dataset.py:189-210``)."""
        idx = np.asarray(self.selected_indices)
        return barenco.B_EXACT[idx], barenco.S_EXACT[idx], barenco.D_EXACT[idx]


def _encode_3d_host(data: P53Data):
    """3-column encoding assembled in HOST numpy (bit-identical to the
    device ops it replaces: tile/repeat/ones/stack are exact).

    These encoders run at pipeline top level, never under jit, and the
    remote-TPU tunnel charges ~0.37 s of executable-load round trip per
    device program — tiny tile/stack programs included.  Building the rows
    on host and device_put-ting the result costs zero programs.
    """
    T = int(data.timepoints.shape[0])
    G, R = data.num_genes, data.num_replicates
    t_host = np.asarray(data.timepoints)

    times = np.tile(t_host, G * R)
    gene_idx = np.tile(np.repeat(np.arange(G), T), R).astype(t_host.dtype)
    flags = np.ones(R * G * T, dtype=t_host.dtype)
    X = np.stack([times, gene_idx, flags], axis=-1)

    y = np.asarray(data.gene_expressions).reshape(-1, 1)
    variances = np.asarray(data.gene_variances).reshape(-1, 1)
    return X, y, variances


def dataset_3d(data: P53Data):
    """Reference 3-column encoding (``src/dataset.py:358-399``).

    Returns ``(X, y, variances)`` with X of shape (R*G*T, 3) rows
    ``(t, gene_index, 1)``, replicate-major then gene-major, and y/variances
    of shape (R*G*T, 1).
    """
    X, y, variances = _encode_3d_host(data)
    return jnp.asarray(X), jnp.asarray(y), jnp.asarray(variances)


def flatten_blocked(data: P53Data):
    """Reference ALFI 1-D blocked encoding
    (``src/gpytorch_alfi/model_alfi.py:545-569``): times tiled per
    (replicate, gene) block; gene identity implied by block position."""
    n_blocks = data.num_replicates * data.num_genes
    train_t = np.tile(np.asarray(data.timepoints), n_blocks)
    train_y = np.asarray(data.gene_expressions).reshape(-1)
    return jnp.asarray(train_t), jnp.asarray(train_y)


def train_arrays(data: P53Data):
    """Convenience: the (X, y, variances) triple as flat device arrays with
    y and variances squeezed to 1-D — the shape the trainer consumes."""
    X, y, var = _encode_3d_host(data)
    return (
        jnp.asarray(X),
        jnp.asarray(y.reshape(-1)),
        jnp.asarray(var.reshape(-1)),
    )
