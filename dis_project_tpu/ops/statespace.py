r"""State-space (Markovian) LFM engine: O(T) exact inference for the
first-order SIMM family via Kalman filtering, with a log-depth
``associative_scan`` filter for TPU.

The reference evaluates the SIMM marginal likelihood by materialising the
dense N x N Gram and factorising it — O(N^2) memory, O(N^3) FLOPs with a
sequential panel dependency (reference ``src/objectives.py:70-78``). This
module replaces that with the classical GP <-> stochastic-differential-
equation duality (Hartikainen & Sarkka 2010, "Kalman filtering and
smoothing solutions to temporal Gaussian process regression models"):

1. The latent force's RBF prior — in the Lawrence convention the
   closed-form ``k_xx`` analytically integrates,
   ``k_f(tau) = exp(-tau^2 / l^2)`` (see
   :func:`dis_project_tpu.ops.lfm_kernels.k_ff_consistent`) — is
   approximated by a linear-time-invariant SDE of order ``p``: truncate
   the reciprocal spectral density's Taylor series at order ``p``,
   spectrally factorise, and keep the stable half. The approximation
   error is measured and monotone: max kernel error 6.0e-4 at p=8,
   1.28e-4 at p=10, 2.9e-5 at p=12, independent of the lengthscale
   (the SDE is the canonical unit system scaled by ``l/2`` — exactly the
   ``gamma = D*l/2`` time scale of the closed forms).
2. The gene ODE ``dx_j/dt = B_j + S_j f - D_j x_j`` (reference
   ``src/model.py:1-7``) is *already* linear state evolution, so the
   augmented state ``z = [f-state (p), x (G)]`` is jointly Markovian-
   Gaussian and the exact MLL of the approximated model is a Kalman
   filter: O(T (p+G)^3) FLOPs, O((p+G)^2) working memory — linear in the
   number of timepoints instead of cubic in N = G*T*R.
3. On TPU the filter runs either as a ``lax.scan`` (sequential, minimal
   memory — the measured single-device default, see
   ``_AUTO_PARALLEL_NOTE``) or as a parallel prefix over the filtering
   semigroup (``jax.lax.associative_scan``; Sarkka & Garcia-Fernandez
   2021, "Temporal parallelization of Bayesian smoothers") — log-depth
   in T, every level a batched (T, m, m) matmul on the MXU; the
   factorisation's real payoff is the TEMPORALLY-SHARDED filter, where
   it buys cross-device parallelism.

Numerical design: the force SDE is built host-side in a **balanced
realization** (controllability and observability Gramians equal and
diagonal). The naive companion realization carries coefficients up to
``~p!`` and is unusable in f32 past p~6; balancing brings every entry to
O(1) (measured |F| <= ~4 at p=12) at zero runtime cost, so the same
constants serve the f64 parity oracle and the f32 TPU path.

Faithfulness notes (same contract as the dense path):

- The *training* MLL convention matches reference
  ``src/objectives.py:70-73``: observation noise is
  ``jitter + obs_stddev^2`` only, per-point measurement variances
  excluded. Pass ``r_var`` accordingly.
- The reference's generative convention "the force acts from t=0, with
  x_j(0) = B_j/D_j deterministically" (the ``erf(t/l + gamma)`` terms of
  ``h_term``) is reproduced exactly by the filter's initial state:
  ``m_0 = 0`` (centered), ``P_0 = blockdiag(P_inf_ff, 0)``.
- The only approximation is the order-p SDE of the force prior; the
  Kalman recursion itself is the exact MLL of that approximated model.
  Measured end-to-end MLL error vs the dense closed-form path at the
  reference inits: ~1e-4 nats at p=10 (pinned in tests/test_statespace.py).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

LOG_2PI = 1.8378770664093453

# _AUTO_PARALLEL_NOTE — measured dispatch for ``parallel=None`` (r4):
# the associative-scan filter was assumed to beat the sequential scan on
# TPU from T >= 64 ("log-depth vs a T-step chain"). A v5e sweep refuted
# that at EVERY single-device shape tried — sequential wins 1.1x-2.3x:
#
#   G=2/8/22/64, T=128:   par 1.80/3.01/5.58/14.90 ms
#                         seq 1.53/1.67/3.15/ 6.58 ms
#   G=2/8/22,   T=1024:   par 11.84/18.96/36.30  seq 10.50/13.68/21.47
#   G=2 T=8192, G=8 T=4096: par 92.2/75.6        seq 83.4/54.5
#
# Cause: one combine costs ~4x a filter step (5-field elements, two
# batched LU solves + five (m, m) matmuls), and the scan does T combines
# PER LEVEL x log2(T) levels — an O(log T) WORK multiplier the depth
# saving never repays at these state sizes on one core, while the
# sequential scan's small matmuls pipeline well. ``parallel=None``
# therefore resolves to the sequential scan everywhere single-device;
# ``parallel=True`` stays available (and the TEMPORALLY-SHARDED filter
# keeps its local associative scans — there the factorisation buys
# cross-device parallelism, not just depth).


# Matmul precision pinned over every engine entry point (read at CALL
# time, so it is overridable for experiments). TPU's default f32 matmul
# is a single-pass bf16 product (~1e-2 rel error); a Gram matmul
# tolerates it, but the filter's T-step covariance recurrence
# ``P <- A P A^T + Q`` compounds it — measured on v5e (G=10, T=40, f32):
# the MLL is ~1.7 nats off at init and the training trajectory is NaN
# within one Adam step, while the identical program on CPU f32 is clean
# (r3; pinned by the on-device lane, tests/test_tpu_lane.py).
#
# r4 tier sweep at the dense10k shape (G=64, T=128, value+grad, v5e):
# highest 11.39 ms / reference; high (3-pass) 11.15 ms but 0.154 nats
# off; default 11.03 ms and NaN. The engine is SEQUENTIAL-CHAIN-latency
# bound, not matmul-throughput bound, so cheaper precision buys ~2% at a
# real accuracy cost — "highest" stays.
SS_MATMUL_PRECISION = "highest"


# Unroll factor for the sequential filter/smoother scans. Unrolling
# amortises the TPU while-loop per-iteration overhead and lets XLA
# overlap the independent pieces of consecutive steps around the (m, P)
# carry dependency — but only pays when the per-step ops are small
# enough for loop overhead to matter. Measured on v5e (r5 sweep,
# value+grad of lfm_mll_ss): m=12 (G=2, T=8192) unroll 8 wins 1.2x
# (198 -> 165 ms); m=18 (G=8) it is a wash (20.4 vs 20.7 ms); m=74
# (G=64) it LOSES 5% and doubles compile time. Policy: unroll 8 only
# for small states on the accelerator; CPU always 1 (no dispatch
# overhead to amortise).
_SCAN_UNROLL_TPU = 8
_SCAN_UNROLL_MAX_STATE = 16


def _scan_unroll(m_dim):
    if jax.default_backend() in ("cpu",) or m_dim > _SCAN_UNROLL_MAX_STATE:
        return 1
    return _SCAN_UNROLL_TPU


def _pin_precision(fn):
    """Pin ``SS_MATMUL_PRECISION`` matmuls over the function's trace
    (see the constant's rationale above)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision(SS_MATMUL_PRECISION):
            return fn(*args, **kwargs)

    return wrapped


# ---------------------------------------------------------------------------
# Canonical (unit-time-scale) balanced SDE of the RBF prior — host-side
# f64 constants per order, cached.
# ---------------------------------------------------------------------------


def _psd_sqrt(a: np.ndarray) -> np.ndarray:
    """Symmetric PSD square root via eigh with clipping.

    The highest-order modes of the RBF SDE carry Hankel singular values
    near f64 eps; a plain Cholesky of the observability Gramian fails PSD
    at p=12 even though the balanced system is fine. Clipping at
    ``eps * max`` keeps the transform well-defined (those modes contribute
    nothing to the kernel by the same measure).
    """
    w, v = np.linalg.eigh(a)
    w = np.clip(w, np.finfo(np.float64).eps * w.max(), None)
    return v @ np.diag(np.sqrt(w))


@functools.lru_cache(maxsize=None)
def canonical_system(order: int):
    """Balanced LTI SDE realising ``k(tau) ~= exp(-tau^2)`` at unit
    time-scale ``l/2 = 1``.

    Returns host-side f64 constants ``(F_c, h_c, q_c, p_diag)``:
    ``F_c`` (p, p) stable drift, ``h_c`` (p,) the row reading f out of the
    state, ``q_c`` scalar white-noise density on the (balanced) input
    direction — returned folded into ``p_diag`` — and ``p_diag`` (p,) the
    stationary covariance, exactly diagonal by construction. The physical
    system at lengthscale ``l`` is ``F = F_c / (l/2)`` with stationary
    covariance ``diag(p_diag)`` unchanged.

    Construction: roots of the truncated series ``sum_{k<=p} z^k / k!``
    give the spectral factorisation of the Taylor-inverted RBF density
    (Hartikainen & Sarkka 2010 eq. 29-32); companion form; then balance
    with the two Gramians' square roots.
    """
    p = order
    coeffs = [1.0 / math.factorial(k) for k in range(p, -1, -1)]
    z = np.roots(coeffs)
    w = np.sqrt(-z.astype(complex))
    w = np.where(w.real > 0, -w, w)  # stable half-plane
    a = np.poly(w).real  # monic stable polynomial, length p+1

    f_comp = np.zeros((p, p))
    f_comp[: p - 1, 1:] = np.eye(p - 1)
    f_comp[p - 1, :] = -a[::-1][:p]
    lvec = np.zeros(p)
    lvec[p - 1] = 1.0
    hvec = np.zeros(p)
    hvec[0] = 1.0
    # Canonical white-noise density: S(w) = sqrt(2 pi) * l_std * p! /
    # |a_c(i W)|^2 in unit scale works out to 2 sqrt(pi) p!.
    q_c = 2.0 * np.sqrt(np.pi) * math.factorial(p)

    from scipy.linalg import solve_lyapunov, svd

    gram_c = solve_lyapunov(f_comp, -q_c * np.outer(lvec, lvec))
    gram_o = solve_lyapunov(f_comp.T, -np.outer(hvec, hvec))
    r_c = _psd_sqrt(gram_c)
    r_o = _psd_sqrt(gram_o)
    u, s, vt = svd(r_o.T @ r_c)
    t_bal = r_c @ vt.T @ np.diag(s**-0.5)
    t_inv = np.diag(s**-0.5) @ u.T @ r_o.T
    f_bal = t_inv @ f_comp @ t_bal
    h_bal = hvec @ t_bal
    # In balanced coordinates the stationary covariance IS diag(s).
    return f_bal, h_bal, q_c, s


@functools.lru_cache(maxsize=None)
def matern_canonical_system(kind: str):
    """EXACT canonical LTI SDE of a Matern force prior at unit rate
    (``lambda = 1``), in coordinates with IDENTITY stationary covariance.

    Unlike the RBF (whose SDE is an order-p APPROXIMATION), the
    Matern-1/2, -3/2 and -5/2 priors are exactly Markovian with state
    dimension 1/2/3 (Hartikainen & Sarkka 2010, sec. III) — so the O(T)
    engine computes the EXACT MLL of the Matern-force LFM, a force-prior
    family the reference's closed-form (RBF-only) dense Gram cannot
    express at all. Returns host-f64 ``(F_c, h_c, p_diag)`` with
    ``p_diag = ones(p)`` by construction; the physical system at
    lengthscale ``l`` is ``F = F_c * (sqrt(2 nu) / l)``.
    """
    from scipy.linalg import solve_lyapunov

    if kind == "matern12":
        f = np.array([[-1.0]])
        lvec = np.array([1.0])
        q = 2.0
    elif kind == "matern32":
        f = np.array([[0.0, 1.0], [-1.0, -2.0]])
        lvec = np.array([0.0, 1.0])
        q = 4.0
    elif kind == "matern52":
        f = np.array([
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
            [-1.0, -3.0, -3.0],
        ])
        lvec = np.array([0.0, 0.0, 1.0])
        q = 16.0 / 3.0
    else:
        raise ValueError(
            f"unknown force kernel {kind!r}; expected rbf, matern12, "
            "matern32 or matern52"
        )
    p_inf = solve_lyapunov(f, -q * np.outer(lvec, lvec))
    # Whiten: z_tilde = L^-1 z with P_inf = L L^T -> identity stationary
    # covariance (the diagonal form the augmented builders assume).
    l_chol = np.linalg.cholesky(p_inf)
    l_inv = np.linalg.inv(l_chol)
    f_bal = l_inv @ f @ l_chol
    h_bal = np.zeros(f.shape[0])
    h_bal[0] = 1.0
    h_bal = h_bal @ l_chol
    return f_bal, h_bal, np.ones(f.shape[0])


_FORCE_RATE = {
    "rbf": 2.0,            # canonical time unit is l/2
    "matern12": 1.0,       # lambda = sqrt(2 nu)/l, nu = 1/2
    "matern32": math.sqrt(3.0),
    "matern52": math.sqrt(5.0),
}


def _force_system(order: int, force_kernel: str):
    """(F_c, h_c, p_diag, rate_over_l) for the selected force prior.
    ``order`` applies to the RBF approximation only; the Matern systems
    are exact at their fixed dimension."""
    if force_kernel == "rbf":
        f_c, h_c, _, p_diag = canonical_system(order)
    else:
        f_c, h_c, p_diag = matern_canonical_system(force_kernel)
    return f_c, h_c, p_diag, _FORCE_RATE[force_kernel]


# ---------------------------------------------------------------------------
# Augmented (force-state, genes) model — traced, differentiable in params.
# ---------------------------------------------------------------------------


def build_lfm_ssm(decay, sens, lengthscale, order: int = 10,
                  force_kernel: str = "rbf"):
    """Augmented LFM state-space model for the first-order SIMM.

    ``force_kernel``: ``'rbf'`` (the Lawrence-consistent prior the dense
    closed forms integrate, order-``order`` SDE approximation) or
    ``'matern12'``/``'matern32'``/``'matern52'`` — EXACT Markovian force
    priors (:func:`matern_canonical_system`) the dense path cannot
    express; ``order`` is ignored for those (state dims 1/2/3).

    State ``z = [f-state (p), x (G)]`` (centered: the constant mean
    ``B/D`` is subtracted from the data, legal because the system is
    linear). Returns ``(F, P_inf, P0, h_force)``:

    - ``F`` (m, m): drift — balanced force block scaled by ``2/l``, gene
      coupling rows ``S_j * h_force``, gene decay ``-D_j``;
    - ``P_inf`` (m, m): stationary covariance, assembled from the constant
      force block and *closed-form* cross/gene blocks (columnwise
      (p, p) Sylvester solves — no m^2 x m^2 Lyapunov system);
    - ``P0`` (m, m): the reference's t=0 convention — force at its
      stationary marginal, genes deterministic at ``B/D``, zero cross;
    - ``h_force`` (m,): row reading f(t) out of the state.
    """
    dtype = jnp.result_type(decay, sens, lengthscale)
    f_c, h_c, p_diag, rate = _force_system(order, force_kernel)
    p = f_c.shape[0]
    g = decay.shape[0]
    m = p + g

    f_c = jnp.asarray(f_c, dtype)
    h_c = jnp.asarray(h_c, dtype)
    p_ff = jnp.asarray(np.diag(p_diag), dtype)

    inv_lp = rate / lengthscale
    f_force = f_c * inv_lp

    # F = [[F_f, 0], [S h_c^T, -diag(D)]]
    top = jnp.concatenate([f_force, jnp.zeros((p, g), dtype)], axis=1)
    bottom = jnp.concatenate(
        [sens[:, None] * h_c[None, :], -jnp.diag(decay)], axis=1
    )
    f_aug = jnp.concatenate([top, bottom], axis=0)

    # Stationary covariance blocks (continuous Lyapunov, closed form):
    #   ff: the canonical constant (l-invariant in balanced coordinates);
    #   fx column j: (F_f - D_j I) c_j = -S_j P_ff h_c^T;
    #   xx: (D_i + D_j) P_xx[i,j] = sym(S_i (h_c P_fx)[j]).
    rhs = p_ff @ h_c  # (p,)
    eye_p = jnp.eye(p, dtype=dtype)

    def col(d_j, s_j):
        return -s_j * jnp.linalg.solve(f_force - d_j * eye_p, rhs)

    p_fx = jax.vmap(col, in_axes=(0, 0), out_axes=1)(decay, sens)  # (p, g)
    hp = h_c @ p_fx  # (g,)
    mx = sens[:, None] * hp[None, :]  # (g, g): S_i * (h P_fx)_j
    p_xx = (mx + mx.T) / (decay[:, None] + decay[None, :])
    p_inf = jnp.concatenate(
        [
            jnp.concatenate([p_ff, p_fx], axis=1),
            jnp.concatenate([p_fx.T, p_xx], axis=1),
        ],
        axis=0,
    )

    p0 = jnp.zeros((m, m), dtype).at[:p, :p].set(p_ff)
    h_force = jnp.concatenate([h_c, jnp.zeros((g,), dtype)])
    return f_aug, p_inf, p0, h_force


def build_multiforce_ssm(decay, sens, lengthscales, order: int = 10,
                         force_kernels=None):
    """Augmented SSM for the R-force SIMM (``models.multisimm``):
    ``dx_j/dt = B_j + sum_r S_jr f_r - D_j x_j`` with R INDEPENDENT
    force priors — by default the Lawrence-convention RBF per force
    (``k_ff_consistent`` — exactly the prior the multi-force closed
    forms integrate).

    ``force_kernels`` (optional, STATIC tuple of R strings): per-force
    prior choice from ``rbf``/``matern12``/``matern32``/``matern52`` —
    forces may have DIFFERENT smoothness (e.g. one smooth RBF driver +
    one rough Matern-1/2 driver), with the Matern members exactly
    Markovian (:func:`matern_canonical_system`). The force blocks are
    then ragged (dims p_r), assembled with host-side loops over the
    static R.

    State ``z = [f_1-state (p_1), ..., f_R-state (p_R), x (G)]``. The
    force blocks are independent, so ``P_ff`` is block-diagonal, the
    cross blocks solve one (p_r, p_r) Sylvester system per (force,
    gene), and the gene-gene block sums the per-force closed forms.

    ``sens``: (G, R); ``lengthscales``: (R,). Returns
    ``(F, P_inf, P0, h_forces)`` with ``h_forces`` (R, m) reading each
    force out of the state (zero-padded rows for the shorter blocks).
    """
    dtype = jnp.result_type(decay, sens, lengthscales)
    g, r = sens.shape
    if force_kernels is None:
        force_kernels = ("rbf",) * r
    if len(force_kernels) != r:
        raise ValueError(
            f"force_kernels has {len(force_kernels)} entries for "
            f"{r} forces"
        )

    # Per-force canonical pieces (ragged dims p_r; R is static).
    f_cs, h_cs, p_ffs, f_blocks = [], [], [], []
    for i, kind in enumerate(force_kernels):
        f_c, h_c, p_diag, rate = _force_system(order, kind)
        f_c = jnp.asarray(f_c, dtype)
        h_c = jnp.asarray(h_c, dtype)
        f_cs.append(f_c)
        h_cs.append(h_c)
        p_ffs.append(jnp.asarray(np.diag(p_diag), dtype))
        f_blocks.append(f_c * (rate / lengthscales[i]))
    dims = [fc.shape[0] for fc in f_cs]
    p_tot = sum(dims)
    m = p_tot + g
    offs = np.concatenate([[0], np.cumsum(dims)])

    f_force = jax.scipy.linalg.block_diag(*f_blocks)

    # Gene coupling: row j reads sum_r S_jr f_r; f_r = h_c_r . z_r-block.
    coupling = jnp.concatenate(
        [sens[:, i:i + 1] * h_cs[i][None, :] for i in range(r)], axis=1
    )  # (g, p_tot)
    top = jnp.concatenate([f_force, jnp.zeros((p_tot, g), dtype)], axis=1)
    bottom = jnp.concatenate([coupling, -jnp.diag(decay)], axis=1)
    f_aug = jnp.concatenate([top, bottom], axis=0)

    # Stationary blocks. Per force r, gene j:
    #   (F_r - D_j I) c_rj = -S_jr P_ff_r h_c_r
    p_fx_parts, hp_parts = [], []
    for i in range(r):
        rhs = p_ffs[i] @ h_cs[i]
        eye_p = jnp.eye(dims[i], dtype=dtype)

        def col(d_j, s_jr, f_r=f_blocks[i], rhs=rhs, eye_p=eye_p):
            return -s_jr * jnp.linalg.solve(f_r - d_j * eye_p, rhs)

        p_fx_i = jax.vmap(col, in_axes=(0, 0), out_axes=1)(
            decay, sens[:, i]
        )  # (p_i, G)
        p_fx_parts.append(p_fx_i)
        hp_parts.append(h_cs[i] @ p_fx_i)  # (G,)
    # Gene-gene: (D_i + D_j) P_xx[i,j] = sum_r sym(S_ir (h_r P_fx_r)_j).
    mx = sum(
        sens[:, i][:, None] * hp_parts[i][None, :] for i in range(r)
    )
    p_xx = (mx + mx.T) / (decay[:, None] + decay[None, :])

    p_fx_flat = jnp.concatenate(p_fx_parts, axis=0)  # (p_tot, g)
    p_ff = jax.scipy.linalg.block_diag(*p_ffs)
    p_inf = jnp.concatenate(
        [
            jnp.concatenate([p_ff, p_fx_flat], axis=1),
            jnp.concatenate([p_fx_flat.T, p_xx], axis=1),
        ],
        axis=0,
    )
    p0 = jnp.zeros((m, m), dtype).at[:p_tot, :p_tot].set(p_ff)
    h_forces = jnp.zeros((r, m), dtype)
    for i in range(r):
        h_forces = h_forces.at[i, offs[i]:offs[i + 1]].set(h_cs[i])
    return f_aug, p_inf, p0, h_forces


def build_lfm2_ssm(alpha, omega, sens, lengthscale, order: int = 10,
                   force_kernel: str = "rbf"):
    """Augmented SSM for the second-order (spring-damper) LFM
    (``models.simm2``): ``x_j'' + 2 alpha_j x_j' + k_j x_j = B_j + S_j f``
    with ``k_j = alpha_j^2 + omega_j^2`` — linear state evolution in
    ``(x_j, v_j)``, same Lawrence-convention force prior by default;
    ``force_kernel`` selects an EXACT Matern prior instead (as
    :func:`build_lfm_ssm`).

    State ``z = [f-state (p), x (G), v (G)]``; the t=0 convention matches
    the closed forms (``ops.lfm_kernels2``): position at the steady state
    ``B/k`` and velocity 0, both deterministic, force stationary.

    Unlike the complex-erf closed forms — whose intermediates scale like
    ``exp((omega l / 2)^2)`` and overflow past ``omega*l ~ 12`` — the SSM
    has no such hazard: its only transcendental is ``expm`` of a stable
    matrix, so this engine is also the numerically safe route to the
    strongly-oscillatory corner of parameter space.

    Returns ``(F, P_inf, P0, h_force)``.
    """
    dtype = jnp.result_type(alpha, omega, sens, lengthscale)
    f_c, h_c, p_diag, rate = _force_system(order, force_kernel)
    p = f_c.shape[0]
    g = alpha.shape[0]
    m = p + 2 * g
    spring = alpha**2 + omega**2

    f_c = jnp.asarray(f_c, dtype)
    h_c = jnp.asarray(h_c, dtype)
    p_ff = jnp.asarray(np.diag(p_diag), dtype)
    f_force = f_c * (rate / lengthscale)

    f_aug = jnp.zeros((m, m), dtype)
    f_aug = f_aug.at[:p, :p].set(f_force)
    idx = jnp.arange(g)
    f_aug = f_aug.at[p + idx, p + g + idx].set(1.0)  # dx = v
    f_aug = f_aug.at[p + g :, :p].set(sens[:, None] * h_c[None, :])  # S f
    f_aug = f_aug.at[p + g + idx, p + idx].set(-spring)
    f_aug = f_aug.at[p + g + idx, p + g + idx].set(-2.0 * alpha)

    # Stationary blocks. Per gene j with A_j = [[0, 1], [-k_j, -2a_j]]
    # and coupling M_j = [0; S_j h_c] (2, p):
    #   F_f C_j + C_j A_j^T + P_ff M_j^T = 0      (C_j: (p, 2))
    # vec (row-major on C): (F_f (x) I_2 + I_p (x) A_j) vec(C_j) =
    #   -vec(P_ff M_j^T).
    eye2 = jnp.eye(2, dtype=dtype)
    eye_p = jnp.eye(p, dtype=dtype)
    rhs_base = p_ff @ h_c  # (p,)

    def cross_col(a_j, k_j, s_j):
        a_mat = jnp.array([[0.0, 1.0], [-k_j, -2.0 * a_j]], dtype)
        lhs = jnp.kron(f_force, eye2) + jnp.kron(eye_p, a_mat)
        b = jnp.zeros((p, 2), dtype).at[:, 1].set(s_j * rhs_base)
        return jnp.linalg.solve(lhs, -b.reshape(-1)).reshape(p, 2)

    c_blocks = jax.vmap(cross_col)(alpha, spring, sens)  # (G, p, 2)

    # Gene-pair blocks: A_i P_ij + P_ij A_j^T + M_i C_j + (M_j C_i)^T = 0
    # (P_ij: (2, 2)); same row-major vec recipe with 4x4 solves.
    def pair_block(a_i, k_i, s_i, c_i, a_j, k_j, s_j, c_j):
        a_mat_i = jnp.array([[0.0, 1.0], [-k_i, -2.0 * a_i]], dtype)
        a_mat_j = jnp.array([[0.0, 1.0], [-k_j, -2.0 * a_j]], dtype)
        m_i_c_j = jnp.zeros((2, 2), dtype).at[1, :].set(s_i * (h_c @ c_j))
        m_j_c_i = jnp.zeros((2, 2), dtype).at[1, :].set(s_j * (h_c @ c_i))
        b = m_i_c_j + m_j_c_i.T
        lhs = jnp.kron(a_mat_i, eye2) + jnp.kron(eye2, a_mat_j)
        return jnp.linalg.solve(lhs, -b.reshape(-1)).reshape(2, 2)

    pair = jax.vmap(
        jax.vmap(pair_block, in_axes=(None,) * 4 + (0,) * 4),
        in_axes=(0,) * 4 + (None,) * 4,
    )(alpha, spring, sens, c_blocks, alpha, spring, sens, c_blocks)
    # pair: (G, G, 2, 2) with [i, j] = P_{(x_i,v_i),(x_j,v_j)}.

    p_inf = jnp.zeros((m, m), dtype)
    p_inf = p_inf.at[:p, :p].set(p_ff)
    # State layout is [x-block, v-block], so scatter the 2x2 entries.
    c_x = c_blocks[:, :, 0].T  # (p, G) -> cov(f-state, x)
    c_v = c_blocks[:, :, 1].T
    p_inf = p_inf.at[:p, p : p + g].set(c_x)
    p_inf = p_inf.at[:p, p + g :].set(c_v)
    p_inf = p_inf.at[p : p + g, :p].set(c_x.T)
    p_inf = p_inf.at[p + g :, :p].set(c_v.T)
    p_inf = p_inf.at[p : p + g, p : p + g].set(pair[:, :, 0, 0])
    p_inf = p_inf.at[p : p + g, p + g :].set(pair[:, :, 0, 1])
    p_inf = p_inf.at[p + g :, p : p + g].set(pair[:, :, 1, 0])
    p_inf = p_inf.at[p + g :, p + g :].set(pair[:, :, 1, 1])
    p_inf = _symmetrize(p_inf)

    p0 = jnp.zeros((m, m), dtype).at[:p, :p].set(p_ff)
    h_force = jnp.concatenate([h_c, jnp.zeros((2 * g,), dtype)])
    return f_aug, p_inf, p0, h_force


@_pin_precision
def discretize(f_aug, p_inf, dts, max_unique: int | None = None):
    """Exact discretization over step sizes ``dts`` (scalar or (T,)).

    ``A = expm(F dt)``; the process noise uses the stationarity identity
    ``Q = P_inf - A P_inf A^T`` (exact for a stable stationary system —
    no Van Loan double-size expm needed). Scalar ``dts`` returns (m, m)
    matrices shared by every step; a (T,) vector returns (T, m, m).

    Unique-dt bucketing (r5, VERDICT r4 #2): when ``dts`` is CONCRETE
    (not a tracer — every eager predict/sample call qualifies), the
    per-step ``expm`` sweep collapses to one ``expm`` per DISTINCT step
    size plus a gather. Union grids of regular train and test grids
    have a handful of distinct dts, and equal inputs give bitwise-equal
    expm outputs, so the gathered result is bit-identical to the
    per-step build (pinned in tests/test_statespace.py).

    TRACED ``dts`` keep the per-step vmap unless the caller passes the
    static ``max_unique`` — a PROMISE that ``dts`` takes at most that
    many distinct values (compute it host-side from the concrete grids,
    as the predict entry points' ``unique_dts`` plumbing does): the
    bucketing then runs under jit via a fixed-size ``jnp.unique`` +
    ``searchsorted`` gather. An UNDERSTATED ``max_unique`` silently
    assigns wrong transitions to the overflow steps — it is exactness-
    critical, which is why it is never inferred. The delay family's
    param-dependent warped steps are generically all-distinct and gain
    nothing either way.
    """
    expm = jax.scipy.linalg.expm

    def one(dt):
        a = expm(f_aug * dt)
        q = p_inf - a @ p_inf @ a.T
        # Exact-math Q is PSD; roundoff can leave tiny negative diagonal.
        return a, _symmetrize(q)

    dts = jnp.asarray(dts)
    if dts.ndim == 0:
        return one(dts)
    if not isinstance(dts, jax.core.Tracer):
        u, inv = np.unique(np.asarray(dts), return_inverse=True)
        if u.size < dts.shape[0]:
            a_u, q_u = jax.vmap(one)(jnp.asarray(u, dts.dtype))
            inv = jnp.asarray(inv)
            return a_u[inv], q_u[inv]
    elif max_unique is not None and max_unique < dts.shape[0]:
        u = jnp.unique(dts, size=max_unique, fill_value=jnp.max(dts))
        # NEAREST-bucket gather, not exact-match: insertion position
        # then the closer of the two neighbours. Exact when every dt is
        # in u (the promise); robust to any ulp-level discrepancy
        # between the caller's host-side unique count and the on-device
        # values (an exact-match searchsorted silently pairs a step
        # with a NEIGHBOURING dt's transition on a mismatch).
        idx = jnp.clip(jnp.searchsorted(u, dts), 1, max_unique - 1)
        pick_left = jnp.abs(dts - u[idx - 1]) <= jnp.abs(u[idx] - dts)
        idx = jnp.where(pick_left, idx - 1, idx)
        a_u, q_u = jax.vmap(one)(u)
        return a_u[idx], q_u[idx]
    return jax.vmap(one)(dts)


def _symmetrize(p):
    return 0.5 * (p + jnp.swapaxes(p, -1, -2))


def gene_observation_matrix(order: int, num_genes: int, replicates: int = 1,
                            dtype=jnp.float64):
    """H reading the gene states out of ``z``, replicate-tiled.

    Replicates in the reference share one latent trajectory and differ
    only in observation noise (``dataset_3d`` rows carry no replicate
    index — reference ``src/dataset.py:358-399``), so R replicates are
    R independent observation rows of the same state.
    """
    h_x = jnp.concatenate(
        [jnp.zeros((num_genes, order), dtype), jnp.eye(num_genes, dtype=dtype)],
        axis=1,
    )
    return jnp.tile(h_x, (replicates, 1))


# ---------------------------------------------------------------------------
# Kalman filtering: sequential scan and log-depth associative scan.
# ---------------------------------------------------------------------------


def _gauss_ll_chol(r, chol):
    """log N(r; 0, L L^T) from the innovation covariance's Cholesky
    factor (n_o, n_o)."""
    al = jax.scipy.linalg.solve_triangular(chol, r, lower=True)
    return (
        -0.5 * jnp.sum(al * al)
        - jnp.sum(jnp.log(jnp.diagonal(chol)))
        - 0.5 * r.shape[0] * LOG_2PI
    )


def _gauss_ll(r, s_mat):
    """log N(r; 0, s_mat) for one innovation (n_o,)."""
    return _gauss_ll_chol(r, jnp.linalg.cholesky(s_mat))


def _joseph_update(m_pred, p_pred, h, r_var, y):
    """One measurement update; returns (m, P, ll). Joseph-form covariance
    update for f32 robustness.

    ONE Cholesky of the innovation covariance serves both the gain and
    the log-density (r5 — the r4 version LU-solved for the gain and then
    Cholesky-factorised the same S again inside ``_gauss_ll``; on TPU
    the pivoted LU is the single most expensive op in the filter step,
    and S is PSD by construction, so the LU was pure waste — measured
    1.92x on the T-step value+grad chain at the bench shape, 11.29 ms
    -> 5.88 ms, r5 sweep)."""
    s_mat = h @ p_pred @ h.T + jnp.diag(r_var)
    chol = jnp.linalg.cholesky(s_mat)
    r = y - h @ m_pred
    gain = jax.scipy.linalg.cho_solve((chol, True), h @ p_pred).T  # P H^T S^-1
    m_new = m_pred + gain @ r
    ikh = jnp.eye(p_pred.shape[0], dtype=p_pred.dtype) - gain @ h
    p_new = ikh @ p_pred @ ikh.T + (gain * r_var[None, :]) @ gain.T
    return m_new, _symmetrize(p_new), _gauss_ll_chol(r, chol)


def _joseph_update_solve(m_pred, p_pred, h, r_var, y):
    """The LU-gain variant of :func:`_joseph_update`, kept for the EKF
    routes ONLY: the extended filter's linearized covariance integration
    can leave the innovation covariance SLIGHTLY INDEFINITE (the
    documented failure mode of ``nlfm_predict_ekf``'s covariance
    subtraction), where a Cholesky gain NaNs but an LU gain stays finite
    — r5's shared-Cholesky swap broke the exp-response recovery test
    exactly this way (smoothed gene means NaN). The log-density still
    goes through the Cholesky (an indefinite S honestly NaNs the
    likelihood; the predict path discards it at masked steps). The
    LINEAR engine keeps the Cholesky update: its predicted covariance is
    PSD by construction and the LU costs ~2x the step (r5 sweep)."""
    s_mat = h @ p_pred @ h.T + jnp.diag(r_var)
    r = y - h @ m_pred
    gain = jnp.linalg.solve(s_mat.T, h @ p_pred).T  # P H^T S^-1
    m_new = m_pred + gain @ r
    ikh = jnp.eye(p_pred.shape[0], dtype=p_pred.dtype) - gain @ h
    p_new = ikh @ p_pred @ ikh.T + (gain * r_var[None, :]) @ gain.T
    return m_new, _symmetrize(p_new), _gauss_ll(r, s_mat)


def _joseph_update_sel(m_pred, p_pred, p_off, r_var, y):
    """Measurement update specialised to a contiguous SELECTION
    observation ``H = [0 | I_{n_o} | 0]`` reading state coordinates
    ``p_off : p_off + n_o`` (the single-replicate gridded families:
    first-order/multi-force read the trailing gene block, the
    second-order family reads the mid-state position block): ``H P`` is
    a row slice, ``S`` a corner slice, and ``I - K H`` a column scatter,
    so the three O(m^2 n_o) H-matmuls of :func:`_joseph_update` vanish
    from the latency chain. Same Joseph-form covariance and
    shared-Cholesky log-density; equality with the dense-H update is
    pinned in tests."""
    n_o = y.shape[0]
    pg = p_pred[p_off:p_off + n_o, :]  # H P  (n_o, m)
    s_mat = pg[:, p_off:p_off + n_o] + jnp.diag(r_var)
    chol = jnp.linalg.cholesky(s_mat)
    r = y - m_pred[p_off:p_off + n_o]
    gain = jax.scipy.linalg.cho_solve((chol, True), pg).T  # (m, n_o)
    m_new = m_pred + gain @ r
    m_dim = p_pred.shape[0]
    ikh = (
        jnp.eye(m_dim, dtype=p_pred.dtype)
        .at[:, p_off:p_off + n_o]
        .add(-gain)
    )
    p_new = ikh @ p_pred @ ikh.T + (gain * r_var[None, :]) @ gain.T
    return m_new, _symmetrize(p_new), _gauss_ll_chol(r, chol)


def _mask_obs(h, r_var, ys, obs_mask):
    """Per-ENTRY observation masking as an exact input transform.

    A missing entry i (``obs_mask[t, i] == 0``) is deleted from the
    update by zeroing H's i-th row, setting its noise variance to 1 and
    its (possibly NaN) observation to 0: the innovation coordinate
    becomes N(0; 0, 1), decoupled from the rest (S turns block-diagonal,
    the gain column is exactly 0), so the update and the likelihood of
    the OBSERVED coordinates are bit-for-bit those of the row-deleted
    model — up to the constant ``-log(2*pi)/2`` each deleted coordinate
    still contributes, which :func:`_mask_ll_correction` adds back.
    Returns per-step ``h`` of shape (T, n_o, m) and sanitised
    ``(r_var, ys)``.
    """
    h_t = h[None, :, :] * obs_mask[:, :, None]
    r_var = jnp.where(obs_mask > 0, r_var, jnp.ones_like(r_var))
    ys = jnp.where(obs_mask > 0, ys, jnp.zeros_like(ys))
    return h_t, r_var, ys


def _mask_ll_correction(obs_mask):
    """(T,) per-step log-lik corrections for :func:`_mask_obs`'s
    placeholder N(0; 0, 1) coordinates: +log(2*pi)/2 per masked entry."""
    n_o = obs_mask.shape[1]
    return 0.5 * LOG_2PI * (n_o - obs_mask.sum(axis=1))


@_pin_precision
def kalman_filter(a, q, h, r_var, ys, p0, m0=None, mask=None,
                  obs_mask=None, obs_slice=None):
    """Sequential Kalman filter (one ``lax.scan``).

    ``a``/``q``: (m, m) shared by all steps (uniform grid) or (T, m, m);
    ``h``: (n_o, m); ``r_var``: (n_o,) or (T, n_o) observation noise
    variances; ``ys``: (T, n_o) **centered** observations; ``p0`` the
    prior covariance *at the first step's predict input* (the state at
    t=0, before the first transition); ``mask``: optional (T,) {0,1} —
    steps with mask 0 skip the measurement update and contribute no
    likelihood (used by the smoother-based predict on union grids);
    ``obs_mask``: optional (T, n_o) {0,1} — per-ENTRY missingness
    (dropouts, irregular per-gene sampling): entries with 0 are exactly
    deleted from the update and the likelihood (see :func:`_mask_obs`);
    their ``ys`` values may be NaN. ``obs_slice``: optional static int —
    a promise that ``h`` is exactly the selection ``[0 | I]`` reading
    the last ``n_o`` state coordinates (the single-replicate gridded
    families); the update then runs the sliced fast path
    (:func:`_joseph_update_sel`, three H-matmuls fewer per step).
    Ignored when ``obs_mask`` is given (masking rewrites H rows).

    Returns ``(ms, ps, ll)``: filtered means (T, m), covariances
    (T, m, m), and the total marginal log-likelihood.
    """
    t_steps, n_o = ys.shape
    m_dim = p0.shape[0]
    dtype = p0.dtype
    if m0 is None:
        m0 = jnp.zeros((m_dim,), dtype)
    r_var = jnp.broadcast_to(jnp.asarray(r_var, dtype), (t_steps, n_o))
    # mask/obs_mask are STATIC presence flags: the unmasked hot loop
    # (every gridded MLL) carries no per-step selects or corrections.
    masked = mask is not None
    if obs_mask is not None:
        obs_mask = jnp.asarray(obs_mask, dtype)
        h_t, r_var, ys = _mask_obs(h, r_var, ys, obs_mask)
        ll_corr = _mask_ll_correction(obs_mask)
        obs_slice = None
    else:
        h_t = None
        ll_corr = None
    shared_aq = a.ndim == 2

    def step(carry, xs):
        m_cur, p_cur, ll = carry
        y_i, rv_i, mk_i, corr_i, h_i = xs[:5]
        a_i, q_i = (a, q) if shared_aq else xs[5:]
        if h_i is None:
            h_i = h
        m_pred = a_i @ m_cur
        p_pred = _symmetrize(a_i @ p_cur @ a_i.T + q_i)
        if obs_slice is not None:
            m_up, p_up, ll_i = _joseph_update_sel(
                m_pred, p_pred, obs_slice, rv_i, y_i
            )
        else:
            m_up, p_up, ll_i = _joseph_update(m_pred, p_pred, h_i, rv_i, y_i)
        if corr_i is not None:
            ll_i = ll_i + corr_i
        if mk_i is None:
            m_new, p_new = m_up, p_up
            ll = ll + ll_i
        else:
            m_new = jnp.where(mk_i > 0, m_up, m_pred)
            p_new = jnp.where(mk_i > 0, p_up, p_pred)
            ll = ll + mk_i * ll_i
        return (m_new, p_new, ll), (m_new, p_new)

    xs = (ys, r_var, mask if masked else None, ll_corr, h_t)
    if not shared_aq:
        xs = xs + (a, q)
    (_, _, ll), (ms, ps) = jax.lax.scan(
        step, (m0, p0, jnp.zeros((), dtype)), xs, unroll=_scan_unroll(m_dim)
    )
    return ms, ps, ll


def _filter_element(a_i, q_i, h, rv_i, y_i, mask_i):
    """Per-step element of the filtering semigroup (Sarkka &
    Garcia-Fernandez 2021, eq. 10): (A, b, C, eta, J) such that composing
    elements left-to-right yields the filtered posterior.

    A masked step (no observation) degenerates to the pure prediction
    element (A_i, 0, Q_i, 0, 0).
    """
    s_mat = h @ q_i @ h.T + jnp.diag(rv_i)
    s_chol = jnp.linalg.cholesky(s_mat)

    def solve_s(b):
        z = jax.scipy.linalg.solve_triangular(s_chol, b, lower=True)
        return jax.scipy.linalg.solve_triangular(s_chol.T, z, lower=False)

    gain = solve_s(h @ q_i).T  # Q H^T S^-1   (m, n_o)
    ikh = jnp.eye(q_i.shape[0], dtype=q_i.dtype) - gain @ h
    ha = h @ a_i
    sinv_ha = solve_s(ha)  # S^-1 H A

    a_e = ikh @ a_i
    b_e = gain @ y_i
    c_e = _symmetrize(ikh @ q_i)
    eta_e = sinv_ha.T @ y_i
    j_e = _symmetrize(ha.T @ sinv_ha)

    a_e = jnp.where(mask_i > 0, a_e, a_i)
    b_e = jnp.where(mask_i > 0, b_e, jnp.zeros_like(b_e))
    c_e = jnp.where(mask_i > 0, c_e, q_i)
    eta_e = jnp.where(mask_i > 0, eta_e, jnp.zeros_like(eta_e))
    j_e = jnp.where(mask_i > 0, j_e, jnp.zeros_like(j_e))
    return a_e, b_e, c_e, eta_e, j_e


def _mv(mat, vec):
    """Batched matrix-vector product over arbitrary leading axes."""
    return (mat @ vec[..., None])[..., 0]


def _combine(e1, e2):
    """Associative composition of filtering elements (ibid., lemma 8).
    ``e1`` is the earlier interval. Batched over the leading axis by
    ``associative_scan``.

    Shared-LU combine (r5): ``C1`` and ``J2`` are symmetric by
    construction, so the two resolvents the lemma needs —
    ``(I + C1 J2)^-T`` and ``(I + J2 C1)^-T`` — are one matrix
    ``E = I + J2 C1`` solved plain and transposed. ONE LU factorization
    of E serves both (``lu_solve`` trans=0/1), replacing the two
    independent ``jnp.linalg.solve`` LUs of r4 (the win flagged in the
    r4 closing commit 9d0173b). Every combine consumer inherits it:
    the associative-scan filter, the blocked filter, and the sharded
    local scans."""
    a1, b1, c1, eta1, j1 = e1
    a2, b2, c2, eta2, j2 = e2
    m = a1.shape[-1]
    eye = jnp.eye(m, dtype=a1.dtype)
    e_mat = eye + j2 @ c1  # = (I + C1 J2)^T for symmetric C1, J2
    lu_piv = jax.scipy.linalg.lu_factor(e_mat)
    # A2 (I + C1 J2)^-1 = (E^-1 A2^T)^T    — trans=0 solve
    a2d = jnp.swapaxes(
        jax.scipy.linalg.lu_solve(lu_piv, jnp.swapaxes(a2, -1, -2)),
        -1, -2,
    )
    a_new = a2d @ a1
    b_new = _mv(a2d, b1 + _mv(c1, eta2)) + b2
    c_new = _symmetrize(a2d @ c1 @ jnp.swapaxes(a2, -1, -2) + c2)
    # A1^T (I + J2 C1)^-1 = (E^-T A1)^T    — trans=1 solve, same LU
    a1t_einv = jnp.swapaxes(
        jax.scipy.linalg.lu_solve(lu_piv, a1, trans=1), -1, -2
    )
    eta_new = _mv(a1t_einv, eta2 - _mv(j2, b1)) + eta1
    j_new = _symmetrize(a1t_einv @ j2 @ a1 + j1)
    return a_new, b_new, c_new, eta_new, j_new


def _apply_state(m_s, p_s, elem):
    """Fold a filtered STATE ``(m, P)`` through a composite element —
    ``combine((0, m, P, 0, 0), elem)`` specialised to the two outputs a
    terminal application needs. With ``A1 = 0`` the lemma collapses to

        m' = A2 (I + P J2)^-1 (m + P eta2) + b2
        P' = A2 (I + P J2)^-1 P A2^T + C2

    — one LU, three matmuls; the (eta, J) legs vanish. This is what the
    blocked filter uses to (a) chain block composites into block-start
    states and (b) expand every within-block prefix into filtered
    moments, at ~40% of a full combine each. Batched over arbitrary
    leading axes."""
    a2, b2, c2, eta2, j2 = elem
    m_dim = m_s.shape[-1]
    eye = jnp.eye(m_dim, dtype=m_s.dtype)
    e_mat = eye + j2 @ p_s  # = (I + P J2)^T (P, J2 symmetric)
    lu_piv = jax.scipy.linalg.lu_factor(e_mat)
    a2d = jnp.swapaxes(
        jax.scipy.linalg.lu_solve(lu_piv, jnp.swapaxes(a2, -1, -2)),
        -1, -2,
    )  # A2 (I + P J2)^-1
    m_new = _mv(a2d, m_s + _mv(p_s, eta2)) + b2
    p_new = _symmetrize(a2d @ p_s @ jnp.swapaxes(a2, -1, -2) + c2)
    return m_new, p_new


@_pin_precision
def parallel_filter(a, q, h, r_var, ys, p0, m0=None, mask=None,
                    obs_mask=None):
    """Log-depth Kalman filter: ``jax.lax.associative_scan`` over the
    filtering semigroup. Identical output contract to
    :func:`kalman_filter` (filtered means/covs and the exact total MLL,
    including per-entry ``obs_mask`` missingness); every scan level is a
    batched (T, m, m) matmul — MXU work, depth O(log T) instead of O(T).

    The first step's element folds the prior in directly (A=0): its
    (b, C) are the filtered posterior at step 0, which makes every prefix
    composition the exact filtered result with no special-casing in the
    combine.

    The log-likelihood is recovered after the scan from the one-step
    predictive densities ``N(y_i; H A_i m_{i-1}, H (A_i P_{i-1} A_i^T +
    Q_i) H^T + R)`` — a batched ``vmap`` over the scan's outputs.
    """
    t_steps, n_o = ys.shape
    m_dim = p0.shape[0]
    dtype = p0.dtype
    if m0 is None:
        m0 = jnp.zeros((m_dim,), dtype)
    r_var = jnp.broadcast_to(jnp.asarray(r_var, dtype), (t_steps, n_o))
    if mask is None:
        mask = jnp.ones((t_steps,), dtype)
    if obs_mask is not None:
        obs_mask = jnp.asarray(obs_mask, dtype)
        h_t, r_var, ys = _mask_obs(h, r_var, ys, obs_mask)
        ll_corr = _mask_ll_correction(obs_mask)
        h_ax = 0
    else:
        h_t = h
        ll_corr = jnp.zeros((t_steps,), dtype)
        h_ax = None
    if a.ndim == 2:
        a = jnp.broadcast_to(a, (t_steps, m_dim, m_dim))
        q = jnp.broadcast_to(q, (t_steps, m_dim, m_dim))

    elems = jax.vmap(_filter_element, in_axes=(0, 0, h_ax, 0, 0, 0))(
        a, q, h_t, r_var, ys, mask
    )

    # Fold the prior into element 0: predict (m0, p0) through step 0's
    # transition, then measurement-update -> (A=0, b=m_f0, C=P_f0).
    h0 = h_t if h_ax is None else h_t[0]
    m_pred0 = a[0] @ m0
    p_pred0 = _symmetrize(a[0] @ p0 @ a[0].T + q[0])
    m_f0, p_f0, _ = _joseph_update(m_pred0, p_pred0, h0, r_var[0], ys[0])
    m_f0 = jnp.where(mask[0] > 0, m_f0, m_pred0)
    p_f0 = jnp.where(mask[0] > 0, p_f0, p_pred0)
    a_e, b_e, c_e, eta_e, j_e = elems
    a_e = a_e.at[0].set(jnp.zeros((m_dim, m_dim), dtype))
    b_e = b_e.at[0].set(m_f0)
    c_e = c_e.at[0].set(p_f0)
    eta_e = eta_e.at[0].set(jnp.zeros((m_dim,), dtype))
    j_e = j_e.at[0].set(jnp.zeros((m_dim, m_dim), dtype))

    _, ms, ps, _, _ = jax.lax.associative_scan(
        _combine, (a_e, b_e, c_e, eta_e, j_e)
    )

    # Exact per-step predictive log-densities from the filtered prefix.
    m_prev = jnp.concatenate([m0[None], ms[:-1]], axis=0)
    p_prev = jnp.concatenate([p0[None], ps[:-1]], axis=0)

    def step_ll(a_i, q_i, h_i, m_im1, p_im1, rv_i, y_i):
        m_pred = a_i @ m_im1
        p_pred = a_i @ p_im1 @ a_i.T + q_i
        s_mat = h_i @ p_pred @ h_i.T + jnp.diag(rv_i)
        return _gauss_ll(y_i - h_i @ m_pred, s_mat)

    lls = jax.vmap(step_ll, in_axes=(0, 0, h_ax, 0, 0, 0, 0))(
        a, q, h_t, m_prev, p_prev, r_var, ys
    )
    return ms, ps, jnp.sum(mask * (lls + ll_corr))


def _identity_element(m_dim, dtype):
    """Identity of the filtering semigroup: combine(e, I) == e == combine(I, e)."""
    return (
        jnp.eye(m_dim, dtype=dtype),
        jnp.zeros((m_dim,), dtype),
        jnp.zeros((m_dim, m_dim), dtype),
        jnp.zeros((m_dim,), dtype),
        jnp.zeros((m_dim, m_dim), dtype),
    )


def _prior_element(m0, p0):
    """The prior as a semigroup element: composing ``(0, m0, P0, 0, 0)``
    on the LEFT of the per-step elements yields the filtered posterior at
    every prefix (verified to machine precision against the sequential
    filter). This removes all first-step special-casing — the form the
    temporally-sharded filter needs, where 'first' is device-relative."""
    m_dim = m0.shape[0]
    return (
        jnp.zeros((m_dim, m_dim), p0.dtype),
        m0,
        p0,
        jnp.zeros((m_dim,), p0.dtype),
        jnp.zeros((m_dim, m_dim), p0.dtype),
    )


def _blocked_layout(t_steps, block):
    """(L, B, pad) for the hybrid blocked scans: L = within-block length
    (batched combines, sequential depth L), B = number of blocks
    (sequential composite chain, depth B). ``block=None`` picks
    L ≈ sqrt(T) rounded to a power of two — the depth L + B is minimised
    at L = B = sqrt(T), and the batched-combine work per level is MXU
    work that the sweep (``_AUTO_PARALLEL_NOTE_R5``) showed is cheap."""
    if block is None:
        block = 1 << max(1, round(math.log2(max(t_steps, 4)) / 2))
    block = max(2, min(int(block), t_steps))
    n_blocks = -(-t_steps // block)
    return block, n_blocks, n_blocks * block - t_steps


@_pin_precision
def blocked_filter(a, q, h, r_var, ys, p0, m0=None, mask=None,
                   obs_mask=None, block: int | None = None):
    """Hybrid blocked Kalman filter: batched associative combines INSIDE
    blocks, a sequential chain ACROSS blocks — the middle ground between
    the T-step sequential scan and the full log-depth associative scan
    (VERDICT r4 #1). Identical output contract to :func:`kalman_filter`.

    Why it wins single-device: the sequential scan is latency-bound
    (T tiny-matmul steps, ~1 us each on TPU regardless of MXU width);
    the full associative scan does T combines PER LEVEL x log2(T)
    levels — an O(log T) work multiplier (``_AUTO_PARALLEL_NOTE``).
    This schedule does ~2T combines TOTAL at sequential depth
    L + B ≈ 2 sqrt(T):

    1. build the T semigroup elements (one vmap — fully parallel);
    2. within each of B blocks, a LENGTH-L sequential scan whose carry
       is the B-wide BATCH of running block-local prefixes — every
       level is a (B, m, m) batched combine on the MXU, depth L;
    3. chain the B block composites through :func:`_apply_state`
       (depth B, ~40% of a combine each) — block-start filtered states;
    4. expand every block-local prefix through its block-start state
       (one batched ``_apply_state`` over all T — depth 1), and read
       the per-step predictive log-densities off the filtered prefix
       exactly as :func:`parallel_filter` does.

    T that does not divide ``L * B`` is padded with true semigroup
    identity elements (likelihood-neutral, state-neutral).
    ``block=None`` resolves L ≈ sqrt(T) (see :func:`_blocked_layout`).
    """
    t_steps, n_o = ys.shape
    m_dim = p0.shape[0]
    dtype = p0.dtype
    if m0 is None:
        m0 = jnp.zeros((m_dim,), dtype)
    r_var = jnp.broadcast_to(jnp.asarray(r_var, dtype), (t_steps, n_o))
    if mask is None:
        mask = jnp.ones((t_steps,), dtype)
    if obs_mask is not None:
        obs_mask = jnp.asarray(obs_mask, dtype)
        h_t, r_var, ys = _mask_obs(h, r_var, ys, obs_mask)
        ll_corr = _mask_ll_correction(obs_mask)
        h_ax = 0
    else:
        h_t = h
        ll_corr = jnp.zeros((t_steps,), dtype)
        h_ax = None
    if a.ndim == 2:
        a = jnp.broadcast_to(a, (t_steps, m_dim, m_dim))
        q = jnp.broadcast_to(q, (t_steps, m_dim, m_dim))

    elems = jax.vmap(_filter_element, in_axes=(0, 0, h_ax, 0, 0, 0))(
        a, q, h_t, r_var, ys, mask
    )

    block_l, n_blocks, pad = _blocked_layout(t_steps, block)
    if pad:
        ident = _identity_element(m_dim, dtype)
        elems = jax.tree_util.tree_map(
            lambda e, i: jnp.concatenate(
                [e, jnp.broadcast_to(i, (pad,) + i.shape)], axis=0
            ),
            elems, ident,
        )
    # (T, ...) -> (L, B, ...): within-block offset leads so the L-scan
    # carries the B-wide batch.
    elems_lb = jax.tree_util.tree_map(
        lambda e: jnp.moveaxis(
            e.reshape((n_blocks, block_l) + e.shape[1:]), 0, 1
        ),
        elems,
    )

    ident_b = jax.tree_util.tree_map(
        lambda i: jnp.broadcast_to(i, (n_blocks,) + i.shape),
        _identity_element(m_dim, dtype),
    )

    def level(carry, elem_j):
        new = _combine(carry, elem_j)
        return new, new

    composites, prefixes_lb = jax.lax.scan(level, ident_b, elems_lb)

    # Block-start states: chain the prior state through the composites.
    def fold(state, comp_b):
        return _apply_state(state[0], state[1], comp_b), state

    _, (starts_m, starts_p) = jax.lax.scan(fold, (m0, p0), composites)

    # Expand: filtered moments at (block b, offset j) from block b's
    # start state — one batched _apply_state over all L*B steps.
    prefixes_bl = jax.tree_util.tree_map(
        lambda e: jnp.moveaxis(e, 0, 1).reshape(
            (n_blocks * block_l,) + e.shape[2:]
        ),
        prefixes_lb,
    )
    starts_m_t = jnp.repeat(starts_m, block_l, axis=0)
    starts_p_t = jnp.repeat(starts_p, block_l, axis=0)
    ms, ps = _apply_state(starts_m_t, starts_p_t, prefixes_bl)
    ms, ps = ms[:t_steps], ps[:t_steps]

    m_prev = jnp.concatenate([m0[None], ms[:-1]], axis=0)
    p_prev = jnp.concatenate([p0[None], ps[:-1]], axis=0)

    def step_ll(a_i, q_i, h_i, m_im1, p_im1, rv_i, y_i):
        m_pred = a_i @ m_im1
        p_pred = a_i @ p_im1 @ a_i.T + q_i
        s_mat = h_i @ p_pred @ h_i.T + jnp.diag(rv_i)
        return _gauss_ll(y_i - h_i @ m_pred, s_mat)

    lls = jax.vmap(step_ll, in_axes=(0, 0, h_ax, 0, 0, 0, 0))(
        a, q, h_t, m_prev, p_prev, r_var, ys
    )
    return ms, ps, jnp.sum(mask * (lls + ll_corr))


@_pin_precision
def blocked_rts_smoother(a, q, ms, ps, block: int | None = None):
    """Hybrid blocked RTS smoother — the backward mirror of
    :func:`blocked_filter` over the SMOOTHING semigroup (depth
    L + B ≈ 2 sqrt(T) instead of the T-step backward chain). Identical
    output contract to :func:`rts_smoother`.

    Within each block, a length-L reverse scan carries the B-wide batch
    of running block-local SUFFIX composites; the B block composites
    chain sequentially (suffix direction) into block-end boundary
    composites; one batched combine expands every local suffix. The
    terminal step's absorbing element makes every suffix composite's
    (g, L) the smoothed moments directly, so padding uses the smoothing
    identity (I, 0, 0) — an exact pass-through."""
    t_steps, m_dim = ms.shape
    dtype = ms.dtype
    rcond = _rts_rcond(dtype)
    elems = _build_smoother_elements(a, q, ms, ps, rcond)

    block_l, n_blocks, pad = _blocked_layout(t_steps, block)
    if pad:
        ident = _smoother_identity(m_dim, dtype)
        elems = jax.tree_util.tree_map(
            lambda e, i: jnp.concatenate(
                [e, jnp.broadcast_to(i, (pad,) + i.shape)], axis=0
            ),
            elems, ident,
        )
    elems_lb = jax.tree_util.tree_map(
        lambda e: jnp.moveaxis(
            e.reshape((n_blocks, block_l) + e.shape[1:]), 0, 1
        ),
        elems,
    )
    ident_b = jax.tree_util.tree_map(
        lambda i: jnp.broadcast_to(i, (n_blocks,) + i.shape),
        _smoother_identity(m_dim, dtype),
    )

    def level(carry, elem_j):
        new = _combine_smoother(elem_j, carry)
        return new, new

    composites, suffixes_lb = jax.lax.scan(
        level, ident_b, elems_lb, reverse=True
    )

    # Boundary composites: for block b, the composite of blocks b+1..B-1
    # (suffix direction) — a reverse scan over the B composites.
    def fold(carry, comp_b):
        return _combine_smoother(comp_b, carry), carry

    _, bounds = jax.lax.scan(
        fold, _smoother_identity(m_dim, dtype), composites, reverse=True
    )

    suffixes_bl = jax.tree_util.tree_map(
        lambda e: jnp.moveaxis(e, 0, 1).reshape(
            (n_blocks * block_l,) + e.shape[2:]
        ),
        suffixes_lb,
    )
    bounds_t = jax.tree_util.tree_map(
        lambda e: jnp.repeat(e, block_l, axis=0), bounds
    )
    _, ms_s, ps_s = _combine_smoother(suffixes_bl, bounds_t)
    return ms_s[:t_steps], ps_s[:t_steps]


# _AUTO_PARALLEL_NOTE_R5 — measured dispatch for ``parallel=None``, r5.
# The r4 sweep (``_AUTO_PARALLEL_NOTE``) showed the FULL associative
# scan loses single-device (O(log T) work multiplier). r5 built the
# hybrid blocked scan the r4 verdict asked for — ~2T combines total at
# depth L + B ≈ 2 sqrt(T) — and MEASURED IT REFUTED single-device too
# (v5e, value+grad of lfm_mll_ss, blocks swept {8,16,32,64,128}):
#
#   G=64 T=128:  seq 11.29 ms   blk8/16/32 22.99/23.37/25.35 ms
#   G=8  T=1024: seq 26.08 ms   blk16/32/64 28.83/31.11/39.52 ms
#   G=2  T=8192: seq 221.7 ms   blk64/128   300.9/317.5 ms
#
# Cause: each combine does a BATCHED PIVOTED LU of the m x m resolvent
# — on TPU the LU's row-pivot chain is itself latency-serial, so a
# B-wide batched combine level costs far more than B/depth accounting
# predicts, and the blocked schedule's ~2x work multiplier never
# repays. What DID break the r4 latency wall is making the sequential
# step cheaper: the shared-Cholesky Joseph update (no LU anywhere in
# the step — ``_joseph_update``), the selection-H fast path
# (``_joseph_update_sel``), static mask elision, and small-state scan
# unrolling (``_scan_unroll``). Same sweep, same shapes, sequential:
# 5.78 / 19.45 / 155.3 ms — 1.95x / 1.34x / 1.43x over r4, inherited
# by every family route, the smoother-based predicts, and the EKF.
# ``parallel=None`` therefore resolves to the SEQUENTIAL pair
# single-device at every shape; the blocked pair stays available as
# ``parallel='blocked'`` (or an int block length) — it is exact and
# parity-tested — for hardware where batched LU behaves.
_AUTO_BLOCKED_MIN_T = None  # measured: auto never picks blocked on v5e


def _select_schedule(parallel, t_steps):
    """Map the user-facing ``parallel`` knob to a (filter, smoother)
    pair sharing :func:`kalman_filter` / :func:`rts_smoother` signatures.

    ``None``  — measured auto dispatch (``_AUTO_PARALLEL_NOTE_R5``).
    ``False`` — sequential scan pair (minimal constant, depth T).
    ``True``  — full log-depth associative-scan pair.
    ``"blocked"`` or an int — hybrid blocked pair (int = block length L).
    """
    if parallel is None:
        on_accel = jax.default_backend() not in ("cpu",)
        if (
            on_accel
            and _AUTO_BLOCKED_MIN_T is not None
            and t_steps >= _AUTO_BLOCKED_MIN_T
        ):
            return blocked_filter, blocked_rts_smoother
        return kalman_filter, rts_smoother
    if parallel == "blocked":
        return blocked_filter, blocked_rts_smoother
    if isinstance(parallel, int) and not isinstance(parallel, bool):
        # An int is a block LENGTH, never a truthiness flag: 0/1 would
        # previously have meant sequential/associative as booleans, and
        # a silent clamp to block=2 would run the schedule the
        # _AUTO_PARALLEL_NOTE_R5 sweep measured slower — reject loudly.
        if parallel < 2:
            raise ValueError(
                f"parallel={parallel}: an integer selects the blocked "
                "schedule's block length and must be >= 2; pass "
                "True/False for the associative/sequential schedules"
            )
        return (
            functools.partial(blocked_filter, block=parallel),
            functools.partial(blocked_rts_smoother, block=parallel),
        )
    if parallel:
        return parallel_filter, parallel_rts_smoother
    return kalman_filter, rts_smoother




def _sel_kwargs(fil, obs_slice):
    """Forward the selection-H promise to the one schedule that honors
    it (the sequential filter); the semigroup schedules keep dense H."""
    if fil is kalman_filter and obs_slice is not None:
        return {"obs_slice": obs_slice}
    return {}

@_pin_precision
def sharded_parallel_filter(a, q, h, r_var, ys, p0, mesh, axis,
                            m0=None, mask=None, obs_mask=None):
    """Temporally-sharded Kalman filter: the TIME axis split over a mesh.

    The filtering semigroup is associative, so the parallel-prefix
    factorises across devices exactly like it factorises across scan
    levels (Sarkka & Garcia-Fernandez 2021, sec. V):

    1. each device builds the elements of its T/D-step chunk and runs a
       LOCAL ``associative_scan`` (no communication);
    2. one ``all_gather`` of the D chunk *composites* — tiny: D x
       (3 m^2 + 2 m) floats, the only collective in the program;
    3. each device left-composes the prior element with the composites of
       the chunks before it (O(D) small combines) and applies the result
       to its local prefixes — its filtered states, exactly.

    The per-step predictive log-densities then need only chunk-local
    state (the chunk-start filtered state is step 3's left factor), and
    the total MLL is one ``psum``. Sequence parallelism for state-space
    models: O(T/D) work per device, one small collective, bitwise the
    same answer as the single-device filter (tested on the virtual mesh).

    ``T`` must divide by the mesh axis size — pad with ``mask=0`` steps
    (prediction-only; they provably do not change the likelihood of the
    observed prefix). ``a``/``q``: (m, m) shared or (T, m, m) per-step;
    ``obs_mask``: optional (T, n_o) per-entry missingness, exactly as in
    :func:`kalman_filter`. Returns ``(ms, ps, ll)`` with ``ms``/``ps``
    sharded over time.
    """
    from jax.sharding import PartitionSpec as P

    t_steps, n_o = ys.shape
    m_dim = p0.shape[0]
    dtype = p0.dtype
    n_dev = mesh.shape[axis]
    if t_steps % n_dev != 0:
        raise ValueError(
            f"T={t_steps} must divide by the '{axis}' axis size {n_dev}; "
            "pad with mask=0 steps"
        )
    if m0 is None:
        m0 = jnp.zeros((m_dim,), dtype)
    r_var = jnp.broadcast_to(jnp.asarray(r_var, dtype), (t_steps, n_o))
    if mask is None:
        mask = jnp.ones((t_steps,), dtype)
    if obs_mask is None:
        obs_mask = jnp.ones((t_steps, n_o), dtype)
    else:
        obs_mask = jnp.asarray(obs_mask, dtype)
    shared_aq = a.ndim == 2
    aq_spec = P(None, None) if shared_aq else P(axis, None, None)

    def local_filter(a_l, q_l, h_l, rv_l, ys_l, mask_l, om_l, m0_l, p0_l):
        t_local = ys_l.shape[0]
        if shared_aq:
            a_steps = jnp.broadcast_to(a_l, (t_local, m_dim, m_dim))
            q_steps = jnp.broadcast_to(q_l, (t_local, m_dim, m_dim))
        else:
            a_steps, q_steps = a_l, q_l
        h_steps, rv_l, ys_l = _mask_obs(h_l, rv_l, ys_l, om_l)
        ll_corr = _mask_ll_correction(om_l)
        elems = jax.vmap(_filter_element, in_axes=(0, 0, 0, 0, 0, 0))(
            a_steps, q_steps, h_steps, rv_l, ys_l, mask_l
        )
        local_prefix = jax.lax.associative_scan(_combine, elems)
        composite = jax.tree_util.tree_map(lambda x: x[-1], local_prefix)

        gathered = jax.lax.all_gather(composite, axis)  # leaves (D, ...)
        my = jax.lax.axis_index(axis)
        ident = _identity_element(m_dim, dtype)

        def fold(carry, j):
            e_j = jax.tree_util.tree_map(
                lambda g, i: jnp.where(j < my, g[j], i), gathered, ident
            )
            return _combine(carry, e_j), None

        # The fold carry is device-varying (it depends on axis_index);
        # mark the replicated prior accordingly for the vma checker.
        prior = jax.tree_util.tree_map(
            lambda x: jax.lax.pcast(x, (axis,), to="varying"),
            _prior_element(m0_l, p0_l),
        )
        start, _ = jax.lax.scan(fold, prior, jnp.arange(n_dev))
        full = jax.vmap(lambda e: _combine(start, e))(local_prefix)
        ms_l, ps_l = full[1], full[2]

        # Predictive log-densities from chunk-local filtered states.
        m_prev = jnp.concatenate([start[1][None], ms_l[:-1]], axis=0)
        p_prev = jnp.concatenate([start[2][None], ps_l[:-1]], axis=0)

        def step_ll(a_i, q_i, h_i, m_im1, p_im1, rv_i, y_i):
            m_pred = a_i @ m_im1
            p_pred = a_i @ p_im1 @ a_i.T + q_i
            s_mat = h_i @ p_pred @ h_i.T + jnp.diag(rv_i)
            return _gauss_ll(y_i - h_i @ m_pred, s_mat)

        lls = jax.vmap(step_ll)(
            a_steps, q_steps, h_steps, m_prev, p_prev, rv_l, ys_l
        )
        ll = jax.lax.psum(jnp.sum(mask_l * (lls + ll_corr)), axis)
        return ms_l, ps_l, ll

    fil = jax.shard_map(
        local_filter,
        mesh=mesh,
        in_specs=(aq_spec, aq_spec, P(None, None), P(axis, None),
                  P(axis, None), P(axis), P(axis, None), P(None),
                  P(None, None)),
        out_specs=(P(axis, None), P(axis, None, None), P()),
    )
    # jit so eager callers' (replicated) inputs are re-sharded to the
    # in_specs instead of tripping the eager-shard_map layout check; under
    # an outer jit this inner jit is inlined.
    return jax.jit(fil)(a, q, h, r_var, ys, mask, obs_mask, m0, p0)


def _chol_gain(p_f_at, p_pred):
    """RTS gain ``(P_f A^T) P_pred^{-1}`` via shifted Cholesky — a
    RESEARCH KNOB ONLY (``rts_smoother(chol_gain_from=...)``), and the
    r5 MEASURED REFUTATION of the second cheap-gain escape:

    The hypothesis was that ``P_pred = A P_f A^T + Q(dt)`` is PD in
    exact arithmetic past the leading dt=0 run, so Cholesky (an order
    of magnitude cheaper than the eigendecomposition pseudo-solve)
    should serve there, with a machine-scale relative shift
    ``64 eps tr(P)/m`` absorbing the ~-eps*||P|| roundoff negatives
    (measured -2e-16 on the p53 union grid in f64). MEASURED OUTCOME:
    at SDE orders >= 10 the high-order force coordinates barely couple
    over one step — P_pred carries exact-positive eigenvalues BELOW the
    f64 noise floor, numerically indistinguishable from singular. The
    shifted solve inverts them, amplifying noise by ~1/delta: smoothed
    means NaN'd on six of the brute-force-oracle test points at order
    14, exactly where the pseudo-solve's rcond cutoff (1e6 x larger
    than the shift) zeroes the correction. Together with the r3 fixed-
    ridge study (2e-2 variance corruption) this closes BOTH cheap-gain
    routes: the eigh pseudo-solve is load-bearing, and the smoothing
    pass's eigendecompositions are the measured price of a correct
    union-grid predict."""
    m_dim = p_pred.shape[-1]
    scale = jnp.trace(p_pred) / m_dim
    delta = 64 * jnp.finfo(p_pred.dtype).eps * scale
    shifted = _symmetrize(p_pred) + delta * jnp.eye(m_dim, dtype=p_pred.dtype)
    chol = jnp.linalg.cholesky(shifted)
    return jax.scipy.linalg.cho_solve((chol, True), p_f_at.T).T


@_pin_precision
def rts_smoother(a, q, ms, ps, chol_gain_from: int | None = None):
    """Rauch-Tung-Striebel backward pass over filtered results.

    ``a``/``q``: (m, m) or (T, m, m) as in :func:`kalman_filter`.
    Returns smoothed means (T, m) and covariances (T, m, m).

    ``chol_gain_from`` (r5, static): RESEARCH KNOB — use shifted-
    Cholesky gains from that step index on instead of the pseudo-solve.
    MEASURED REFUTED as a default (see :func:`_chol_gain`): exact-PD
    structure past the leading dt=0 run does not imply NUMERIC
    distinguishability from singular at SDE order >= 10, and the
    shifted solve NaN'd the brute-force-oracle predict. ``None`` (the
    shipped default everywhere) = eigh pseudo-solve for every gain.

    Scheduling (r5): the smoothing gains depend only on the FILTERED
    moments, never on the backward carry — so the per-step gain
    eigendecompositions (see :func:`_pseudo_gain`) and prediction
    moments are hoisted out of the scan into one batched build (a
    (T, m, m) vmapped ``eigh`` — throughput work), and the sequential
    backward chain keeps only the classic CORRECTION-form recursion

        m_s[k] = m_f[k] + G_k (m_s[k+1] - A m_f[k])
        P_s[k] = P_f[k] + G_k (P_s[k+1] - P_pred[k+1]) G_k^T

    — two matmuls of latency per step instead of an eigendecomposition.
    (The affine ELEMENT form E P E^T + L computes the same algebra but
    through a catastrophic cancellation — measured 6e-7 f64 covariance
    error vs this form near the t=0 deterministic directions, which
    scales to garbage in f32 — so the semigroup representation stays
    confined to the associative/sharded schedules where it is load-
    bearing.)
    """
    t_steps, m_dim = ms.shape
    shared_aq = a.ndim == 2
    # The RTS gain solves against P_pred, which is EXACTLY singular
    # wherever the model is deterministic — the t=0 convention zeroes the
    # gene block of P0, and duplicate times on a union grid give dt=0
    # steps with Q=0. A fixed additive ridge is the obvious fix but a bad
    # one: the balanced realization's Hankel spectrum reaches ~1e-8 of
    # lambda_max by order 14, and a 1e-9 ridge perturbs the gain by
    # eps/lambda_min in those directions — measured 2e-2 posterior-
    # variance error vs the brute-force joint-Gaussian oracle, GROWING
    # with order. Instead: eigendecomposition pseudo-solve with a
    # RELATIVE cutoff — deterministic directions get zero correction
    # (their filtered moments are already exact), live directions are
    # untouched.
    rcond = _rts_rcond(ms.dtype)

    def pieces(a_i, q_i, m_f, p_f, solver):
        p_pred = _symmetrize(a_i @ p_f @ a_i.T + q_i)
        gain = solver(p_f @ a_i.T, p_pred)
        return gain, a_i @ m_f, p_pred

    def build(lo, hi, solver):
        if shared_aq:
            return jax.vmap(
                lambda m_f, p_f: pieces(a, q, m_f, p_f, solver)
            )(ms[lo:hi], ps[lo:hi])
        return jax.vmap(
            lambda a_i, q_i, m_f, p_f: pieces(a_i, q_i, m_f, p_f, solver)
        )(a[1 + lo : 1 + hi], q[1 + lo : 1 + hi], ms[lo:hi], ps[lo:hi])

    pseudo = functools.partial(_pseudo_gain, rcond=rcond)
    n_gain = t_steps - 1
    k_split = (
        n_gain
        if chol_gain_from is None
        else max(0, min(int(chol_gain_from), n_gain))
    )
    if k_split >= n_gain:
        gains, am_f, p_preds = build(0, n_gain, pseudo)
    elif k_split == 0:
        gains, am_f, p_preds = build(0, n_gain, _chol_gain)
    else:
        head = build(0, k_split, pseudo)
        tail = build(k_split, n_gain, _chol_gain)
        gains, am_f, p_preds = jax.tree_util.tree_map(
            lambda x, y_arr: jnp.concatenate([x, y_arr], axis=0), head, tail
        )

    def step(carry, xs):
        m_next_s, p_next_s = carry
        m_f, p_f, gain, am_i, p_pred = xs
        m_s = m_f + gain @ (m_next_s - am_i)
        p_s = _symmetrize(p_f + gain @ (p_next_s - p_pred) @ gain.T)
        return (m_s, p_s), (m_s, p_s)

    xs = (ms[:-1], ps[:-1], gains, am_f, p_preds)
    (_, _), (ms_s, ps_s) = jax.lax.scan(
        step, (ms[-1], ps[-1]), xs, reverse=True, unroll=_scan_unroll(m_dim)
    )
    ms_s = jnp.concatenate([ms_s, ms[-1:]], axis=0)
    ps_s = jnp.concatenate([ps_s, ps[-1:]], axis=0)
    return ms_s, ps_s


def _rts_rcond(dtype):
    """Relative eigenvalue cutoff for the RTS pseudo-solve (see the
    rationale in :func:`rts_smoother`)."""
    return jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-6, dtype)


def _pseudo_gain(p_f_at, p_pred, rcond):
    """RTS gain ``(P_f A^T) P_pred^+`` via the eigendecomposition
    pseudo-solve with a RELATIVE cutoff — the ONE copy of the
    numerically-delicate kernel every smoother shares (the r3 fixed-ridge
    bug was re-tuned here; keeping three copies in sync is how it comes
    back). The cutoff uses the double-``where`` form so gradients stay
    finite through cut-off eigenvalues (``1/w`` differentiated at w≈0 is
    the classic where-NaN trap — deterministic directions like the t=0
    gene block guarantee cut-off eigenvalues on EVERY call)."""
    w, v = jnp.linalg.eigh(_symmetrize(p_pred))
    keep = w > rcond * w[-1]
    w_inv = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
    return (p_f_at @ v) * w_inv[None, :] @ v.T


def _smoother_element(a_i, q_i, m_f, p_f, rcond):
    """Per-step element of the SMOOTHING semigroup (Sarkka &
    Garcia-Fernandez 2021, sec. IV): ``(E, g, L)`` such that
    ``m_s[k] = E_k m_s[k+1] + g_k`` and
    ``P_s[k] = E_k P_s[k+1] E_k^T + L_k``.

    ``a_i``/``q_i`` are the transition INTO step k+1 (the same shift as
    :func:`rts_smoother`'s ``a[1:]``). The gain uses the identical
    eigendecomposition pseudo-solve as the sequential smoother —
    deterministic directions (the t=0 gene block, dt=0 union-grid
    duplicates) get zero correction instead of a ridge-perturbed one.
    """
    p_pred = _symmetrize(a_i @ p_f @ a_i.T + q_i)
    gain = _pseudo_gain(p_f @ a_i.T, p_pred, rcond)
    g_vec = m_f - gain @ (a_i @ m_f)
    l_mat = _symmetrize(p_f - gain @ p_pred @ gain.T)
    return gain, g_vec, l_mat


def _combine_smoother(e1, e2):
    """Associative composition of smoothing elements; ``e1`` is the
    EARLIER interval (suffix direction: the composite maps the smoothed
    state after ``e2``'s span onto ``e1``'s start)."""
    ea, ga, la = e1
    eb, gb, lb = e2
    e_new = ea @ eb
    g_new = _mv(ea, gb) + ga
    l_new = _symmetrize(ea @ lb @ jnp.swapaxes(ea, -1, -2) + la)
    return e_new, g_new, l_new


def _combine_smoother_rev(e2, e1):
    """Argument-flipped combine for ``associative_scan(reverse=True)``:
    the reverse scan flips the element array, so the accumulated
    composite (the LATER interval) arrives first."""
    return _combine_smoother(e1, e2)


def _smoother_identity(m_dim, dtype):
    """Identity of the smoothing semigroup: (I, 0, 0)."""
    return (
        jnp.eye(m_dim, dtype=dtype),
        jnp.zeros((m_dim,), dtype),
        jnp.zeros((m_dim, m_dim), dtype),
    )


def _build_smoother_elements(a, q, ms, ps, rcond):
    """Elements for every step 0..T-1; the terminal step's element is the
    absorbing ``(0, m_f[T-1], P_f[T-1])`` so every suffix composite's
    (g, L) IS the smoothed moment pair. ``a``/``q`` shared (m, m) or
    per-step (T, m, m) exactly as :func:`rts_smoother`."""
    t_steps, m_dim = ms.shape
    dtype = ms.dtype
    if a.ndim == 2:
        e, g, l = jax.vmap(
            lambda m_f, p_f: _smoother_element(a, q, m_f, p_f, rcond)
        )(ms[:-1], ps[:-1])
    else:
        e, g, l = jax.vmap(
            lambda a_i, q_i, m_f, p_f: _smoother_element(
                a_i, q_i, m_f, p_f, rcond
            )
        )(a[1:], q[1:], ms[:-1], ps[:-1])
    e = jnp.concatenate([e, jnp.zeros((1, m_dim, m_dim), dtype)], axis=0)
    g = jnp.concatenate([g, ms[-1:]], axis=0)
    l = jnp.concatenate([l, ps[-1:]], axis=0)
    return e, g, l


@_pin_precision
def parallel_rts_smoother(a, q, ms, ps):
    """Log-depth RTS smoother: ``jax.lax.associative_scan`` (reverse) over
    the smoothing semigroup — the backward-pass dual of
    :func:`parallel_filter` (ibid., sec. IV). Identical output contract
    to :func:`rts_smoother`; every scan level is a batched (T, m, m)
    matmul, depth O(log T) instead of the sequential backward chain.
    """
    rcond = _rts_rcond(ms.dtype)
    elems = _build_smoother_elements(a, q, ms, ps, rcond)
    _, ms_s, ps_s = jax.lax.associative_scan(
        _combine_smoother_rev, elems, reverse=True
    )
    return ms_s, ps_s


@_pin_precision
def sharded_rts_smoother(a, q, ms, ps, mesh, axis):
    """Temporally-sharded RTS smoother: the backward mirror of
    :func:`sharded_parallel_filter`.

    1. each device builds the smoothing elements of its T/D chunk from
       its (already time-sharded) filtered moments and runs a LOCAL
       reverse ``associative_scan`` — no communication;
    2. one ``all_gather`` of the D chunk composites (the suffix composite
       at each chunk's first step) — the only collective;
    3. each device right-composes the composites of the chunks AFTER it
       (O(D) small combines) onto its local suffixes — its smoothed
       moments, exactly.

    ``ms``/``ps`` arrive sharded over ``axis`` (the filter's output
    layout); ``a``/``q`` shared (m, m) or per-step (T, m, m) sharded the
    same way. T must divide by the axis size (the callers pad with
    prediction-only steps, which smooth through as exact pass-throughs).
    Returns smoothed ``(ms, ps)`` sharded over time like the inputs.
    """
    from jax.sharding import PartitionSpec as P

    t_steps, m_dim = ms.shape
    dtype = ms.dtype
    n_dev = mesh.shape[axis]
    if t_steps % n_dev != 0:
        raise ValueError(
            f"T={t_steps} must divide by the '{axis}' axis size {n_dev}; "
            "pad with mask=0 steps"
        )
    rcond = _rts_rcond(dtype)
    shared_aq = a.ndim == 2
    if shared_aq:
        a_next, q_next = a, q
        aq_spec = P(None, None)
    else:
        # Element k needs the transition INTO k+1; shift so it is local.
        # The dummy at T-1 is never used (terminal element overwrites it).
        a_next = jnp.concatenate([a[1:], a[-1:]], axis=0)
        q_next = jnp.concatenate([q[1:], q[-1:]], axis=0)
        aq_spec = P(axis, None, None)

    def local_smooth(a_l, q_l, ms_l, ps_l):
        t_local = ms_l.shape[0]
        if shared_aq:
            a_steps = jnp.broadcast_to(a_l, (t_local, m_dim, m_dim))
            q_steps = jnp.broadcast_to(q_l, (t_local, m_dim, m_dim))
        else:
            a_steps, q_steps = a_l, q_l
        e, g, l = jax.vmap(
            lambda a_i, q_i, m_f, p_f: _smoother_element(
                a_i, q_i, m_f, p_f, rcond
            )
        )(a_steps, q_steps, ms_l, ps_l)
        # The global terminal step's element is absorbing: (0, m_f, P_f).
        my = jax.lax.axis_index(axis)
        gidx = my * t_local + jnp.arange(t_local)
        is_last = (gidx == t_steps - 1)[:, None, None]
        e = jnp.where(is_last, jnp.zeros_like(e), e)
        g = jnp.where(is_last[..., 0], ms_l, g)
        l = jnp.where(is_last, ps_l, l)
        elems = (e, g, l)
        local_suffix = jax.lax.associative_scan(
            _combine_smoother_rev, elems, reverse=True
        )
        composite = jax.tree_util.tree_map(lambda x: x[0], local_suffix)

        gathered = jax.lax.all_gather(composite, axis)
        ident = _smoother_identity(m_dim, dtype)

        def fold(carry, j):
            e_j = jax.tree_util.tree_map(
                lambda gth, i: jnp.where(j > my, gth[j], i), gathered, ident
            )
            return _combine_smoother(carry, e_j), None

        ident_v = jax.tree_util.tree_map(
            lambda x: jax.lax.pcast(x, (axis,), to="varying"), ident
        )
        suffix, _ = jax.lax.scan(fold, ident_v, jnp.arange(n_dev))
        full = jax.vmap(lambda el: _combine_smoother(el, suffix))(
            local_suffix
        )
        return full[1], full[2]

    smo = jax.shard_map(
        local_smooth,
        mesh=mesh,
        in_specs=(aq_spec, aq_spec, P(axis, None), P(axis, None, None)),
        out_specs=(P(axis, None), P(axis, None, None)),
    )
    return jax.jit(smo)(a_next, q_next, ms, ps)


# ---------------------------------------------------------------------------
# Model-level entry points.
# ---------------------------------------------------------------------------


@_pin_precision
def lfm_mll_ss(
    params,
    timepoints,
    y,
    *,
    jitter: float,
    replicates: int = 1,
    order: int = 10,
    parallel: bool | None = None,
    uniform: bool = True,
    shard=None,
    obs_mask=None,
    force_kernel: str = "rbf",
    stationary_after: int | None = None,
):
    """State-space marginal log-likelihood of gridded SIMM data.

    Same data layout as ``ExactSIMM.mll_gridded`` (gene-major blocks of
    one shared time grid, replicate-tiled) and the same noise convention
    (``jitter + obs_stddev^2``, per-point variances excluded — reference
    ``src/objectives.py:70-73``), evaluated in O(T (p+G)^3) by Kalman
    filtering instead of O((GTR)^3) by Cholesky.

    ``params``: a SIMMParams-like namedtuple (basal/sensitivity/decay/
    lengthscale/obs_stddev). ``parallel=None`` resolves to the SEQUENTIAL
    scan (the r4 v5e sweep — ``_AUTO_PARALLEL_NOTE`` above — measured it
    1.1x-2.3x faster than the associative scan at every single-device
    shape: the combine's O(log T) work multiplier never repays the depth
    saving); explicit True/False forces it. ``uniform=True`` (a static promise about the grid — every
    gridded caller passes linspace) discretizes ONCE and shares (A, Q)
    across steps; the step from the t=0 prior to ``t[0]`` gets its own
    transition and runs outside the scan, so grids starting anywhere are
    handled exactly. ``uniform=False`` discretizes per step (vmapped
    expm) for arbitrary sorted grids.

    ``shard=(mesh, axis_name)`` runs the temporally-sharded filter
    (:func:`sharded_parallel_filter`): the time axis splits over the mesh
    axis (steps 1..T-1, padded with masked prediction-only steps to a
    multiple of the axis size — provably likelihood-neutral), one tiny
    all-gather of chunk composites is the only collective. Requires
    ``uniform=True``.

    ``obs_mask``: optional {0,1} per-entry missingness in the SAME
    gene-major flat layout as ``y`` (dropouts / irregular per-gene
    sampling — something the gridded DENSE paths cannot express without
    falling back to the O(N^3) row path on the observed subset). Masked
    entries are EXACTLY deleted from the likelihood (zero-H-row
    reduction, see :func:`_mask_obs`) and may hold NaN in ``y``.
    Composes with every schedule, including ``shard``.

    ``stationary_after`` (static int, r5): OPT-IN steady-state filter —
    run that many exact warmup steps, then freeze the gain/innovation
    Cholesky at the covariance fixed point and run the remaining steps
    with no covariance leg at all (:func:`_stationary_tail_ll`).
    Measured: 5.6-10x at T=5e4 (CPU f32); error geometric in the warmup
    — 9.3e-8 relative at K=4096/T=5e4 f64, 2.6e-5 at K=1024 (pinned in
    tests). Pick K as a few multiples of the force correlation time
    over the grid step (``lengthscale / dt``). Requires
    ``uniform=True``, no ``shard``, no ``obs_mask``; the CLI flag is
    ``--stationary-after`` on the simm/simm2/multisimm ss routes.
    """
    f_aug, p_inf, p0, _ = build_lfm_ssm(
        params.decay, params.sensitivity, params.lengthscale, order=order,
        force_kernel=force_kernel,
    )
    g = params.decay.shape[0]
    t = jnp.asarray(timepoints)
    h = gene_observation_matrix(p0.shape[0] - g, g, replicates, t.dtype)
    mean_obs = jnp.tile(params.basal / params.decay, (replicates,))
    r_var = (
        jnp.full((replicates * g,), jitter, t.dtype) + params.obs_stddev**2
    )
    return _gridded_ssm_mll(
        f_aug, p_inf, p0, h, mean_obs, t, y, r_var,
        parallel=parallel, uniform=uniform, shard=shard,
        obs_mask=obs_mask,
        obs_slice=(p0.shape[0] - g) if replicates == 1 else None,
        stationary_after=stationary_after,
    )


def _stationary_tail_ll(a, q, h, r_var, ys_tail, m_k, p_k):
    """Frozen-gain (steady-state Kalman) likelihood of the remaining
    steps of a UNIFORM-grid chain, given the exact filtered state
    ``(m_k, P_k)`` after the warmup prefix.

    On a shared-(A, Q) grid the covariance recursion is data-
    independent and converges geometrically to the DARE fixed point, so
    past the warmup the gain, innovation Cholesky, and log-det are
    frozen at their step-K values and each remaining step is

        r_t = y_t - (H A) m_{t-1};   m_t = M m_{t-1} + K_ss y_t

    with ``M = (I - K_ss H) A`` — one m^2 matvec + one triangular solve
    per step instead of two m^3 matmuls + a Cholesky (the whole
    covariance leg vanishes). The approximation error is the gap
    ``P_K - P_inf`` (geometric in K; measured decay pinned in tests).
    """
    dtype = m_k.dtype
    p_pred = _symmetrize(a @ p_k @ a.T + q)
    s_mat = h @ p_pred @ h.T + jnp.diag(r_var)
    chol = jnp.linalg.cholesky(s_mat)
    gain = jax.scipy.linalg.cho_solve((chol, True), h @ p_pred).T
    m_dim = m_k.shape[0]
    mmat = (jnp.eye(m_dim, dtype=dtype) - gain @ h) @ a
    ha = h @ a
    logdet = jnp.sum(jnp.log(jnp.diagonal(chol)))
    n_o = r_var.shape[0]
    const = logdet + 0.5 * n_o * LOG_2PI

    def step(carry, y_t):
        m_cur, ll = carry
        r = y_t - ha @ m_cur
        al = jax.scipy.linalg.solve_triangular(chol, r, lower=True)
        m_new = mmat @ m_cur + gain @ y_t
        return (m_new, ll - 0.5 * jnp.sum(al * al) - const), None

    (_, ll), _ = jax.lax.scan(
        step, (m_k, jnp.zeros((), dtype)), ys_tail,
        unroll=_scan_unroll(m_dim),
    )
    return ll


def _gridded_ssm_mll(f_aug, p_inf, p0, h, mean_obs, t, y, r_var, *,
                     parallel, uniform, shard, obs_mask=None,
                     obs_slice=None, stationary_after=None):
    """Shared filter driver for every gridded SSM family: center the
    gene-major flat ``y``, discretize per the grid promise, run the
    selected filter schedule. See :func:`lfm_mll_ss` for the contract.
    ``obs_mask``: optional per-entry missingness in the SAME gene-major
    flat layout as ``y`` (or pre-shaped (n_o, T)); masked entries are
    exactly deleted from the likelihood and may hold NaN in ``y``.
    ``obs_slice``: static offset promise that ``h`` is the contiguous
    selection ``[0 | I | 0]`` (see :func:`kalman_filter`) — forwarded to
    the sequential filter only (the semigroup schedules keep dense H).
    ``stationary_after``: static int K — run K exact steps then the
    frozen-gain steady-state tail (:func:`_stationary_tail_ll`);
    requires ``uniform=True``, no shard, no obs_mask."""
    dtype = t.dtype
    t_steps = t.shape[0]
    n_o = mean_obs.shape[0]

    # y arrives block-major ((R blocks of) G blocks of T): -> (T, n_o).
    ys = y.reshape(n_o, t_steps).T - mean_obs[None, :]
    om = (
        None
        if obs_mask is None
        else jnp.asarray(obs_mask, dtype).reshape(n_o, t_steps).T
    )

    fil, _ = _select_schedule(parallel, t_steps)
    if uniform and t_steps >= 2:
        # Step 0 (prior at t=0 -> first observation) outside the scan;
        # steps 1..T-1 share one (A, Q).
        a0, q0 = discretize(f_aug, p_inf, t[0])
        p_pred0 = _symmetrize(a0 @ p0 @ a0.T + q0)  # mean stays 0 (centered)
        if om is None:
            h0, rv0, y0 = h, r_var, ys[0]
            corr0 = jnp.zeros((), dtype)
        else:
            h_both, rv_both, ys_both = _mask_obs(
                h, jnp.broadcast_to(r_var, (1, n_o)), ys[:1], om[:1]
            )
            h0, rv0, y0 = h_both[0], rv_both[0], ys_both[0]
            corr0 = _mask_ll_correction(om[:1])[0]
        m_f0, p_f0, ll0 = _joseph_update(
            jnp.zeros((p0.shape[0],), dtype), p_pred0, h0, rv0, y0
        )
        ll0 = ll0 + corr0
        a, q = discretize(f_aug, p_inf, (t[-1] - t[0]) / (t_steps - 1))
        if stationary_after is not None:
            if shard is not None or om is not None:
                raise ValueError(
                    "stationary_after requires no shard and no obs_mask "
                    "(the frozen gain presumes every step's update "
                    "pattern is identical)"
                )
            k_ex = max(0, min(int(stationary_after), t_steps - 1))
            ll = ll0
            if k_ex > 0:
                ms_k, ps_k, ll_ex = kalman_filter(
                    a, q, h, r_var, ys[1:1 + k_ex], p_f0, m0=m_f0,
                    **_sel_kwargs(kalman_filter, obs_slice),
                )
                m_k, p_k = ms_k[-1], ps_k[-1]
                ll = ll + ll_ex
            else:
                m_k, p_k = m_f0, p_f0
            if k_ex < t_steps - 1:
                rv_vec = jnp.broadcast_to(
                    jnp.asarray(r_var, dtype), (n_o,)
                )
                ll = ll + _stationary_tail_ll(
                    a, q, h, rv_vec, ys[1 + k_ex:], m_k, p_k
                )
            return ll
        if shard is not None:
            mesh, axis = shard
            n_dev = mesh.shape[axis]
            t_rest = t_steps - 1
            pad = (-t_rest) % n_dev
            ys_rest = jnp.concatenate(
                [ys[1:], jnp.zeros((pad, ys.shape[1]), dtype)], axis=0
            )
            mask = jnp.concatenate(
                [jnp.ones((t_rest,), dtype), jnp.zeros((pad,), dtype)]
            )
            om_rest = (
                None
                if om is None
                else jnp.concatenate(
                    [om[1:], jnp.ones((pad, n_o), dtype)], axis=0
                )
            )
            _, _, ll = sharded_parallel_filter(
                a, q, h, r_var, ys_rest, p_f0, mesh, axis,
                m0=m_f0, mask=mask, obs_mask=om_rest,
            )
            return ll0 + ll
        _, _, ll = fil(
            a, q, h, r_var, ys[1:], p_f0, m0=m_f0,
            obs_mask=None if om is None else om[1:],
            **_sel_kwargs(fil, obs_slice),
        )
        return ll0 + ll
    if shard is not None:
        raise ValueError("shard requires uniform=True (shared-step grid)")
    if stationary_after is not None:
        raise ValueError(
            "stationary_after requires uniform=True (the frozen gain is "
            "the shared-(A, Q) covariance fixed point)"
        )
    dts = jnp.diff(t, prepend=jnp.zeros((1,), dtype))
    a, q = discretize(f_aug, p_inf, dts)
    _, _, ll = fil(a, q, h, r_var, ys, p0, obs_mask=om,
                   **_sel_kwargs(fil, obs_slice))
    return ll


@_pin_precision
def multisimm_mll_ss(
    params,
    timepoints,
    y,
    *,
    jitter: float,
    replicates: int = 1,
    order: int = 10,
    parallel: bool | None = None,
    uniform: bool = True,
    shard=None,
    obs_mask=None,
    force_kernels=None,
    stationary_after: int | None = None,
):
    """State-space MLL for the R-force family (``models.multisimm``):
    same contract as :func:`lfm_mll_ss` with ``params`` a
    MultiSIMMParams-like namedtuple (sensitivity (G, R), lengthscale (R,)).
    O(T (Rp + G)^3) instead of O((GTR)^3). ``force_kernels``: optional
    static tuple of R per-force prior choices (see
    :func:`build_multiforce_ssm`) — forces may mix RBF with exact Matern
    smoothness."""
    f_aug, p_inf, p0, _ = build_multiforce_ssm(
        params.decay, params.sensitivity, params.lengthscale, order=order,
        force_kernels=force_kernels,
    )
    g, r = params.sensitivity.shape
    t = jnp.asarray(timepoints)
    h = gene_observation_matrix(p0.shape[0] - g, g, replicates, t.dtype)
    mean_obs = jnp.tile(params.basal / params.decay, (replicates,))
    r_var = (
        jnp.full((replicates * g,), jitter, t.dtype) + params.obs_stddev**2
    )
    return _gridded_ssm_mll(
        f_aug, p_inf, p0, h, mean_obs, t, y, r_var,
        parallel=parallel, uniform=uniform, shard=shard,
        obs_mask=obs_mask,
        obs_slice=(p0.shape[0] - g) if replicates == 1 else None,
        stationary_after=stationary_after,
    )


@_pin_precision
def lfm2_mll_ss(
    params,
    timepoints,
    y,
    *,
    jitter: float,
    replicates: int = 1,
    order: int = 10,
    parallel: bool | None = None,
    uniform: bool = True,
    shard=None,
    obs_mask=None,
    force_kernel: str = "rbf",
    stationary_after: int | None = None,
):
    """State-space MLL for the second-order family (``models.simm2``):
    same contract as :func:`lfm_mll_ss` with ``params`` a
    SIMM2Params-like namedtuple (alpha/omega instead of decay).
    O(T (p + 2G)^3); also the overflow-free route where the complex-erf
    closed forms leave their ``omega*l`` safe region (see
    :func:`build_lfm2_ssm`). ``force_kernel`` as :func:`lfm_mll_ss`."""
    f_aug, p_inf, p0, _ = build_lfm2_ssm(
        params.alpha, params.omega, params.sensitivity, params.lengthscale,
        order=order, force_kernel=force_kernel,
    )
    g = params.alpha.shape[0]
    t = jnp.asarray(timepoints)
    p_f = p0.shape[0] - 2 * g
    # Observe the position block only: H = [0 | I_G | 0], replicate-tiled.
    h_x = jnp.concatenate(
        [
            jnp.zeros((g, p_f), t.dtype),
            jnp.eye(g, dtype=t.dtype),
            jnp.zeros((g, g), t.dtype),
        ],
        axis=1,
    )
    h = jnp.tile(h_x, (replicates, 1))
    spring = params.alpha**2 + params.omega**2
    mean_obs = jnp.tile(params.basal / spring, (replicates,))
    r_var = (
        jnp.full((replicates * g,), jitter, t.dtype) + params.obs_stddev**2
    )
    return _gridded_ssm_mll(
        f_aug, p_inf, p0, h, mean_obs, t, y, r_var,
        parallel=parallel, uniform=uniform, shard=shard,
        obs_mask=obs_mask,
        obs_slice=p_f if replicates == 1 else None,
        stationary_after=stationary_after,
    )


def _delay_event_grid(params, t, replicates):
    """Per-gene-warped observation events for the delay family.

    The delayed gene trajectory is the ZERO-delay solution read at warped
    time (``models.delaysimm`` module notes: ``x_j(t) =
    x_tilde_j(max(t - delta_j, 0))``), and the zero-delay augmented state
    is Markovian over warped time — so gene j's observation at physical
    time ``t_i`` is a linear read of that shared state at
    ``w_ij = max(t_i - delta_j, 0)``. Different genes warp differently,
    so each (timepoint, gene) pair becomes its own filter step observing
    ONLY that gene's replicate rows (a per-entry ``obs_mask`` — the exact
    row-deletion reduction of :func:`_mask_obs`).

    Returns ``(ev_t_sorted, step_ids, gene_sel, order_idx)``: the T*G
    sorted warped event times, each event's source timepoint index, its
    (T*G, n_o) one-gene observation selector, and the sort permutation.
    Sorting is ``argsort``-stable and differentiable in ``delay`` through
    the gathered time VALUES (the permutation is piecewise constant).
    """
    g = params.decay.shape[0]
    n_o = replicates * g
    w = jnp.maximum(t[:, None] - params.delay[None, :], 0.0)  # (T, G)
    ev_t = w.reshape(-1)  # event k = (i, j) at k = i*G + j
    order_idx = jnp.argsort(ev_t, stable=True)
    ev_t = ev_t[order_idx]
    gene_ids = order_idx % g
    step_ids = order_idx // g
    col = jnp.arange(n_o)
    gene_sel = (col[None, :] % g) == gene_ids[:, None]  # (T*G, n_o)
    return ev_t, step_ids, gene_sel, order_idx


@_pin_precision
def delaysimm_mll_ss(
    params,
    timepoints,
    y,
    *,
    jitter: float,
    replicates: int = 1,
    order: int = 10,
    parallel: bool | None = None,
    shard=None,
    obs_mask=None,
    force_kernel: str = "rbf",
):
    """State-space MLL for the delayed-response family
    (``models.delaysimm``): same contract as :func:`lfm_mll_ss` with
    ``params`` a DelaySIMMParams-like namedtuple carrying per-gene
    ``delay``. O(T G (p+G)^3) — each (timepoint, gene) pair is one
    warped-time filter step (see :func:`_delay_event_grid`) — instead of
    O((GTR)^3) dense; the delays are differentiable through the warped
    step sizes. ``shard=(mesh, axis)`` runs the event chain through the
    temporally-sharded filter (events padded with prediction-only
    steps). ``force_kernel`` as :func:`lfm_mll_ss` — the warp reduction
    is prior-agnostic, so exact Matern delays work too."""
    g = params.decay.shape[0]
    t = jnp.asarray(timepoints)
    t_steps = t.shape[0]
    n_o = replicates * g
    dtype = t.dtype
    f_aug, p_inf, p0, _ = build_lfm_ssm(
        params.decay, params.sensitivity, params.lengthscale, order=order,
        force_kernel=force_kernel,
    )
    h = gene_observation_matrix(p0.shape[0] - g, g, replicates, dtype)
    mean_obs = jnp.tile(params.basal / params.decay, (replicates,))
    r_var = jnp.full((n_o,), jitter, dtype) + params.obs_stddev**2

    ev_t, step_ids, gene_sel, _ = _delay_event_grid(params, t, replicates)
    ys_full = y.reshape(n_o, t_steps).T - mean_obs[None, :]  # (T, n_o)
    ys_ev = jnp.where(gene_sel, ys_full[step_ids], 0.0)
    om_ev = gene_sel.astype(dtype)
    if obs_mask is not None:
        om_user = jnp.asarray(obs_mask, dtype).reshape(n_o, t_steps).T
        om_ev = om_ev * om_user[step_ids]

    dts = jnp.diff(ev_t, prepend=jnp.zeros((1,), dtype))
    a, q = discretize(f_aug, p_inf, dts)
    n_ev = ev_t.shape[0]
    if shard is not None:
        mesh, axis = shard
        pad = (-n_ev) % mesh.shape[axis]
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(jnp.eye(a.shape[-1], dtype=dtype),
                                     (pad,) + a.shape[1:])]
            )
            q = jnp.concatenate([q, jnp.zeros((pad,) + q.shape[1:], dtype)])
            ys_ev = jnp.concatenate([ys_ev, jnp.zeros((pad, n_o), dtype)])
            om_ev = jnp.concatenate([om_ev, jnp.ones((pad, n_o), dtype)])
        mask = jnp.concatenate(
            [jnp.ones((n_ev,), dtype), jnp.zeros((pad,), dtype)]
        )
        _, _, ll = sharded_parallel_filter(
            a, q, h, r_var, ys_ev, p0, mesh, axis, mask=mask,
            obs_mask=om_ev,
        )
        return ll
    fil, _ = _select_schedule(parallel, n_ev)
    if fil is kalman_filter and obs_mask is None and replicates == 1:
        # Every event observes EXACTLY ONE gene (replicates=1, no user
        # missingness), so the masked n_o-wide update — a chol(G) per
        # event — collapses to the SCALAR update (r5): one gathered
        # column, one division. Same likelihood as the row-deleted
        # model the obs_mask reduction reconstructs (pinned in tests).
        gene_ids = jnp.argmax(gene_sel, axis=1)
        y_sc = jnp.take_along_axis(
            ys_full[step_ids], gene_ids[:, None], axis=1
        )[:, 0]
        return _scalar_obs_filter_ll(
            a, q, p0, p0.shape[0] - g + gene_ids, r_var[0], y_sc
        )
    _, _, ll = fil(a, q, h, r_var, ys_ev, p0, obs_mask=om_ev)
    return ll


@_pin_precision
def _scalar_obs_filter_ll(a, q, p0, state_idx, r_var_sc, ys_sc):
    """Sequential Kalman MLL for a chain of SCALAR observations, each
    reading one (per-step) state coordinate ``state_idx[t]`` — the delay
    family's event chain. The innovation covariance is a scalar, so the
    per-step linear algebra is one gathered covariance column and a
    division (the Joseph form collapses algebraically to the rank-1
    downdate ``P - c c^T / s`` for a scalar update — the three
    correction terms coincide). O(T m^2) instead of O(T (G^3 + m^2 G)).
    """
    m_dim = p0.shape[0]
    dtype = p0.dtype

    def step(carry, xs):
        m_cur, p_cur, ll = carry
        a_i, q_i, idx_i, y_i = xs
        m_pred = a_i @ m_cur
        p_pred = _symmetrize(a_i @ p_cur @ a_i.T + q_i)
        col = jnp.take(p_pred, idx_i, axis=1)
        s = jnp.take(col, idx_i) + r_var_sc
        r = y_i - jnp.take(m_pred, idx_i)
        m_new = m_pred + col * (r / s)
        p_new = _symmetrize(p_pred - jnp.outer(col, col) / s)
        ll_i = -0.5 * (r * r / s + jnp.log(s) + LOG_2PI)
        return (m_new, p_new, ll + ll_i), None

    (_, _, ll), _ = jax.lax.scan(
        step,
        (jnp.zeros((m_dim,), dtype), p0, jnp.zeros((), dtype)),
        (a, q, state_idx, ys_sc),
        unroll=_scan_unroll(m_dim),
    )
    return ll


@_pin_precision
def delaysimm_predict_ss(
    params,
    timepoints,
    y,
    t_test,
    *,
    noise_var,
    replicates: int = 1,
    order: int = 10,
    obs_mask=None,
    parallel=None,
    shard=None,
    force_kernel: str = "rbf",
):
    """Smoothed posterior for the delay family: the state-space analogue
    of ``ExactDelaySIMM.latent_predict`` / ``multi_gene_predict`` in one
    pass. ``force_kernel`` as :func:`delaysimm_mll_ss`. The union event grid holds three categories: warped train
    observations (T*G, per-gene rows), warped per-gene test reads
    (T_test*G, prediction-only — gene j's posterior at physical time tau
    is the state's gene-j component at ``max(tau - delta_j, 0)``), and
    UNWARPED force reads (T_test — the force is not delayed).

    Returns ``(f_mean, f_var, x_mean, x_var)`` with x_mean/x_var
    (T_test, G). Variance caveat as :func:`lfm_predict_ss`: the force
    posterior is the self-consistent model's."""
    g = params.decay.shape[0]
    t_train = jnp.asarray(timepoints)
    t_test = jnp.asarray(t_test)
    t_steps = t_train.shape[0]
    n_test = t_test.shape[0]
    n_o = replicates * g
    dtype = t_train.dtype

    f_aug, p_inf, p0, h_force = build_lfm_ssm(
        params.decay, params.sensitivity, params.lengthscale, order=order,
        force_kernel=force_kernel,
    )
    p_f = p0.shape[0] - g
    h = gene_observation_matrix(p_f, g, replicates, dtype)
    mean = params.basal / params.decay
    mean_obs = jnp.tile(mean, (replicates,))

    # Event times: T*G warped train + T_test*G warped test + T_test force.
    w_train = jnp.maximum(
        t_train[:, None] - params.delay[None, :], 0.0
    ).reshape(-1)
    w_test = jnp.maximum(
        t_test[:, None] - params.delay[None, :], 0.0
    ).reshape(-1)
    ev_t = jnp.concatenate([w_train, w_test, t_test])
    n_ev = ev_t.shape[0]
    order_idx = jnp.argsort(ev_t, stable=True)
    ev_sorted = ev_t[order_idx]
    # Inverse permutation: original event k sits at sorted row inv[k].
    inv = jnp.argsort(order_idx)

    gene_ids = order_idx % g  # meaningful only for train rows
    step_ids = order_idx // g
    is_train = (order_idx < t_steps * g).astype(dtype)
    col = jnp.arange(n_o)
    gene_sel = (col[None, :] % g) == gene_ids[:, None]

    ys_full = y.reshape(n_o, t_steps).T - mean_obs[None, :]
    step_tr = jnp.clip(step_ids, 0, t_steps - 1)
    ys_ev = jnp.where(gene_sel, ys_full[step_tr], 0.0)
    ys_ev = jnp.where(is_train[:, None] > 0, ys_ev, 0.0)
    om_ev = gene_sel.astype(dtype) * is_train[:, None]
    # Step-level mask: update only on train events; keep om rows of
    # masked steps all-ones so the ll correction stays finite (unused).
    om_ev = jnp.where(is_train[:, None] > 0, om_ev, 1.0)
    if obs_mask is not None:
        om_user = jnp.asarray(obs_mask, dtype).reshape(n_o, t_steps).T
        om_ev = jnp.where(
            is_train[:, None] > 0, om_ev * om_user[step_tr], om_ev
        )

    noise_var = jnp.broadcast_to(
        jnp.asarray(noise_var, dtype), (t_steps, n_o)
    )
    rv_ev = jnp.where(
        is_train[:, None] > 0, noise_var[step_tr], jnp.ones((1, n_o), dtype)
    )

    dts = jnp.diff(ev_sorted, prepend=jnp.zeros((1,), dtype))
    pad = 0
    if shard is not None:
        mesh, axis = shard
        pad = (-n_ev) % mesh.shape[axis]
        if pad:
            dts = jnp.concatenate([dts, jnp.zeros((pad,), dtype)])
            is_train = jnp.concatenate([is_train, jnp.zeros((pad,), dtype)])
            ys_ev = jnp.concatenate([ys_ev, jnp.zeros((pad, n_o), dtype)])
            om_ev = jnp.concatenate([om_ev, jnp.ones((pad, n_o), dtype)])
            rv_ev = jnp.concatenate([rv_ev, jnp.ones((pad, n_o), dtype)])
    a, q = discretize(f_aug, p_inf, dts)
    if shard is not None:
        ms, ps, _ = sharded_parallel_filter(
            a, q, h, rv_ev, ys_ev, p0, mesh, axis, mask=is_train,
            obs_mask=om_ev,
        )
        ms_s, ps_s = sharded_rts_smoother(a, q, ms, ps, mesh, axis)
    else:
        fil, smo = _select_schedule(parallel, ys_ev.shape[0])
        ms, ps, _ = fil(a, q, h, rv_ev, ys_ev, p0, mask=is_train,
                        obs_mask=om_ev)
        ms_s, ps_s = smo(a, q, ms, ps)

    # Force reads: original events T*G + T_test*G .. end (unwarped).
    force_rows = inv[t_steps * g + n_test * g:]
    f_mean = ms_s[force_rows] @ h_force
    f_var = jnp.einsum("i,tij,j->t", h_force, ps_s[force_rows], h_force)
    # Gene reads: original events T*G .. T*G + T_test*G, k = i*G + j.
    gene_rows = inv[t_steps * g: t_steps * g + n_test * g]
    x_sel = jnp.arange(g)
    m_gene = ms_s[gene_rows][:, p_f:]  # (T_test*G, G)
    v_gene = jnp.diagonal(ps_s[gene_rows], axis1=1, axis2=2)[:, p_f:]
    pick = jnp.tile(x_sel, (n_test,))
    x_mean = m_gene[jnp.arange(n_test * g), pick].reshape(n_test, g)
    x_var = v_gene[jnp.arange(n_test * g), pick].reshape(n_test, g)
    x_mean = x_mean + mean[None, :]
    return f_mean, f_var, x_mean, x_var


@_pin_precision
def lfm_predict_ss(
    params,
    timepoints,
    y,
    t_test,
    *,
    noise_var,
    replicates: int = 1,
    order: int = 10,
    obs_mask=None,
    parallel=None,
    shard=None,
    unique_dts=None,
    force_kernel: str = "rbf",
    interp: str = "union",
):
    """Smoothed latent-force posterior at ``t_test`` (and the gene states).

    The state-space analogue of ``ExactSIMM.latent_predict``: filter +
    RTS smoother on the union grid of train and test times, observation
    updates masked to train steps (``interp="union"``), or the exact
    bridge-interpolation route that smooths the TRAIN grid only and
    conditions each test time on its bracketing smoothed states
    (``interp="bridge"`` — see :func:`_bridge_smooth`; same posterior
    to roundoff, parity-pinned, and the cheaper dispatch at dense
    scale). Matches the dense path's *posterior
    mean* (the cross-covariances k_xf are consistent with k_xx); the
    posterior *variance* is that of the self-consistent model — the dense
    path's test-test prior block uses the reference's quirky ``2l``
    ``k_ff``, which is NOT the prior its own k_xx integrates (see
    ``ops.lfm_kernels.k_ff_consistent``), so variances agree only in
    shape, not value.

    ``noise_var``: observation noise variance — scalar, (G*R,), or
    (T_train, G*R). ``latent_predict`` parity is per-point variances +
    jitter with NO learned noise (reference ``src/model.py:446-449``);
    the training convention would be ``jitter + obs_stddev**2``. The
    caller picks.

    Returns ``(f_mean, f_var, x_mean, x_var)`` at ``t_test`` — x_mean/var
    per gene, mean added back.

    ``unique_dts`` (static int): EXACTNESS-CRITICAL jit promise — an
    upper bound on the number of DISTINCT step sizes of the union grid
    (the diffs of sorted train+test times INCLUDING the prepend-0 first
    step; duplicate train/test times contribute a dt=0 value). When
    given, the jitted path computes one expm per distinct dt and
    gathers by NEAREST value (see :func:`discretize`); an UNDERSTATED
    bound silently assigns neighbouring transitions to the overflow
    steps. Compute it host-side, e.g.
    ``np.unique(np.diff(np.sort(np.concatenate([t, t_test])),
    prepend=0.0)).size``. ``None`` (default) keeps the per-step build
    under jit; eager calls bucket host-side automatically either way.
    """
    t_train = jnp.asarray(timepoints)
    t_test = jnp.asarray(t_test)
    g = params.decay.shape[0]

    f_aug, p_inf, p0, h_force = build_lfm_ssm(
        params.decay, params.sensitivity, params.lengthscale, order=order,
        force_kernel=force_kernel,
    )
    p = p0.shape[0] - g
    h = gene_observation_matrix(p, g, replicates, t_train.dtype)
    mean = params.basal / params.decay
    m_t, p_t = _pick_smooth(interp)(
        f_aug, p_inf, p0, h, t_train, t_test, y,
        jnp.tile(mean, (replicates,)), noise_var, obs_mask=obs_mask,
        parallel=parallel, shard=shard, unique_dts=unique_dts,
        obs_slice=p if replicates == 1 else None,
    )
    f_mean = m_t @ h_force
    f_var = jnp.einsum("i,tij,j->t", h_force, p_t, h_force)
    x_mean = m_t[:, p:] + mean[None, :]
    x_var = jnp.diagonal(p_t, axis1=1, axis2=2)[:, p:]
    return f_mean, f_var, x_mean, x_var


def _union_grid_smooth(f_aug, p_inf, p0, h, t_train, t_test, y, mean_obs,
                       noise_var, obs_mask=None, parallel=None, shard=None,
                       unique_dts=None, obs_slice=None):
    """Shared smoothing driver for every gridded SSM family: filter + RTS
    smoother on the union grid of train and test times, observation
    updates masked to train steps. ``y`` arrives block-major flat (n_o
    blocks of T_train); ``mean_obs`` (n_o,) is subtracted; ``obs_mask``
    is optional per-entry missingness in ``y``'s layout (masked entries
    are exactly excluded from the conditioning and may be NaN). Returns
    the smoothed state ``(m_t, p_t)`` at the test times (means centered —
    callers add their family's observation mean back).

    ``parallel=None`` resolves to the sequential filter AND smoother
    (the same measured dispatch as :func:`_gridded_ssm_mll` —
    ``_AUTO_PARALLEL_NOTE``); explicit True/False forces the log-depth
    associative-scan pair.
    ``shard=(mesh, axis)`` shards the TIME axis over the mesh for both
    passes (:func:`sharded_parallel_filter` +
    :func:`sharded_rts_smoother`) — prediction then scales over devices
    exactly like the MLL; the grid is padded with prediction-only steps
    (dt=0 — provably posterior-neutral pass-throughs) to a multiple of
    the axis size."""
    dtype = t_train.dtype
    n_o = mean_obs.shape[0]

    t_all = jnp.concatenate([t_train, t_test])
    order_idx = jnp.argsort(t_all, stable=True)
    t_sorted = t_all[order_idx]
    is_train = jnp.concatenate(
        [jnp.ones_like(t_train), jnp.zeros_like(t_test)]
    )[order_idx]
    n_all = t_sorted.shape[0]

    pad = 0
    if shard is not None:
        mesh, axis = shard
        pad = (-n_all) % mesh.shape[axis]

    dts = jnp.diff(t_sorted, prepend=jnp.zeros((1,), dtype))
    if pad:
        # dt=0 pad steps: A=I, Q=0 — exact pass-throughs for the filter
        # (masked) and the smoother (pseudo-solve gain is a projection).
        dts = jnp.concatenate([dts, jnp.zeros((pad,), dtype)])
        is_train = jnp.concatenate([is_train, jnp.zeros((pad,), dtype)])
    # unique_dts: static distinct-step bound so the bucketed discretize
    # also fires under jit (see :func:`discretize`); +1 covers the pad
    # zeros when the union grid itself contains no dt=0 duplicate.
    a, q = discretize(
        f_aug, p_inf, dts,
        max_unique=None if unique_dts is None else unique_dts + (1 if pad else 0),
    )

    ys_train = y.reshape(n_o, t_train.shape[0]).T - mean_obs[None, :]
    # Scatter train observations into the union grid (zeros elsewhere —
    # masked steps never read them).
    ys = jnp.zeros((n_all + pad, n_o), dtype)
    train_pos = jnp.nonzero(is_train, size=t_train.shape[0])[0]
    ys = ys.at[train_pos].set(ys_train)

    noise_var = jnp.broadcast_to(
        jnp.asarray(noise_var, dtype), (t_train.shape[0], n_o)
    )
    # Masked steps never use their noise row; 1.0 keeps Cholesky happy.
    rv_all = jnp.ones((n_all + pad, n_o), dtype).at[train_pos].set(
        noise_var
    )

    om_all = None
    if obs_mask is not None:
        om_train = jnp.asarray(obs_mask, dtype).reshape(
            n_o, t_train.shape[0]
        ).T
        om_all = jnp.ones((n_all + pad, n_o), dtype).at[train_pos].set(
            om_train
        )

    if shard is not None:
        ms, ps, _ = sharded_parallel_filter(
            a, q, h, rv_all, ys, p0, mesh, axis, mask=is_train,
            obs_mask=om_all,
        )
        ms_s, ps_s = sharded_rts_smoother(a, q, ms, ps, mesh, axis)
    else:
        fil, smo = _select_schedule(parallel, ys.shape[0])
        ms, ps, _ = fil(a, q, h, rv_all, ys, p0, mask=is_train,
                        obs_mask=om_all, **_sel_kwargs(fil, obs_slice))
        ms_s, ps_s = smo(a, q, ms, ps)

    test_pos = jnp.nonzero(1.0 - is_train, size=t_test.shape[0])[0]
    return ms_s[test_pos], ps_s[test_pos]


def _bridge_smooth(f_aug, p_inf, p0, h, t_train, t_test, y, mean_obs,
                   noise_var, obs_mask=None, parallel=None, shard=None,
                   unique_dts=None, obs_slice=None):
    """Bridge-interpolation smoothing driver (r5): exact test-time
    conditioning WITHOUT the union grid — the ``interp="bridge"``
    backend of every gridded-family predict.

    The filter + RTS smoother run on the TRAIN grid only; each test
    time then conditions on its two bracketing smoothed states through
    the discretized prior's Gaussian bridge. Exact by the Markov
    property: every observation lives at a train node, so given the
    bracketing states ``(x_L, x_R)`` the state at ``t*`` is independent
    of the data:

        p(x* | Y) = \\int p(x* | x_L, x_R) p(x_L, x_R | Y) dx_L dx_R

    with the pairwise smoothed joint's cross-covariance ``G_k Sigma_R``
    (``G_k`` the RTS gain over the full bracket step — the same
    identity the FFBS sampler uses) and the Gaussian bridge

        x* | x_L, x_R ~ N(W_a x_L + W_b x_R, Lambda),
        W_b = Q_1 A_2^T S^+,  W_a = A_1 - W_b A_2 A_1,
        Lambda = Q_1 - W_b A_2 Q_1,   S = A_2 Q_1 A_2^T + Q_2,

    where ``(A_1, Q_1)`` discretizes ``t_L -> t*`` and ``(A_2, Q_2)``
    ``t* -> t_R``. ``S``'s pseudo-solve reuses the smoother's
    relative-rcond eigendecomposition (:func:`_pseudo_gain`): its null
    directions carry bridge components that are DETERMINISTIC given
    ``x_L`` — their residual ``u^T (x_R - A_2 A_1 x_L)`` is zero almost
    surely under the prior, hence under the (absolutely continuous)
    posterior, so zeroing the correction there is exact — the same
    argument that makes the RTS pseudo-gain exact on dt=0 steps. Test
    times past the last train node extrapolate one-sided from the
    terminal smoothed state (the two-sided formula is only valid INSIDE
    a bracket); times in ``[0, t_train[0])`` bridge against a virtual
    t=0 prior node ``(0, p0)`` smoothed backward one step; negative
    times clamp to that node (out of the model's domain — the union
    driver would build a negative-dt transition there).

    Why it beats the union grid (measured — PARITY.md r5): the union of
    two f32 grids has thousands of roundoff-distinct dts (one ``expm``
    each) and runs T_train + T_test masked filter+smoother steps; here
    the sequential chain stays at T_train steps with the train grid's
    own few distinct dts, and the per-test work — 3 small ``expm``s,
    2 ``eigh``s, a dozen (m, m) matmuls — is batched over test points,
    off the latency-bound critical path.

    Same argument/return contract as :func:`_union_grid_smooth`, except
    ``unique_dts`` bounds the TRAIN grid's distinct steps (including
    the prepend-0 first one) and the returned moments follow
    ``t_test``'s own order (the union driver returns time-sorted order
    — identical for the sorted test grids every caller passes).
    """
    dtype = t_train.dtype
    n_o = mean_obs.shape[0]
    t_steps = t_train.shape[0]

    dts = jnp.diff(t_train, prepend=jnp.zeros((1,), dtype))
    pad = 0
    mask = None
    if shard is not None:
        mesh, axis = shard
        pad = (-t_steps) % mesh.shape[axis]
    if pad:
        # dt=0 pad steps (A=I, Q=0), masked: exact pass-throughs for
        # both passes — the same divisibility trick as the union driver.
        dts = jnp.concatenate([dts, jnp.zeros((pad,), dtype)])
        mask = jnp.concatenate(
            [jnp.ones((t_steps,), dtype), jnp.zeros((pad,), dtype)]
        )
    a, q = discretize(
        f_aug, p_inf, dts,
        max_unique=None if unique_dts is None
        else unique_dts + (1 if pad else 0),
    )

    ys = y.reshape(n_o, t_steps).T - mean_obs[None, :]
    rv = jnp.broadcast_to(jnp.asarray(noise_var, dtype), (t_steps, n_o))
    om = None
    if obs_mask is not None:
        om = jnp.asarray(obs_mask, dtype).reshape(n_o, t_steps).T
    if pad:
        ys = jnp.concatenate([ys, jnp.zeros((pad, n_o), dtype)])
        rv = jnp.concatenate([rv, jnp.ones((pad, n_o), dtype)])
        if om is not None:
            om = jnp.concatenate([om, jnp.ones((pad, n_o), dtype)])

    if shard is not None:
        ms, ps, _ = sharded_parallel_filter(
            a, q, h, rv, ys, p0, mesh, axis, mask=mask, obs_mask=om,
        )
        ms_s, ps_s = sharded_rts_smoother(a, q, ms, ps, mesh, axis)
    else:
        fil, smo = _select_schedule(parallel, ys.shape[0])
        ms, ps, _ = fil(a, q, h, rv, ys, p0, mask=mask,
                        obs_mask=om, **_sel_kwargs(fil, obs_slice))
        ms_s, ps_s = smo(a, q, ms, ps)
    if pad:
        ms, ps = ms[:t_steps], ps[:t_steps]
        ms_s, ps_s = ms_s[:t_steps], ps_s[:t_steps]

    rcond = _rts_rcond(dtype)
    # Virtual t=0 node: the chain's prior reference point (m0=0, p0),
    # smoothed backward one step so test times before the first train
    # node have a left bracket.
    a0 = a[0] if a.ndim == 3 else a
    q0 = q[0] if q.ndim == 3 else q
    p_pred0 = _symmetrize(a0 @ p0 @ a0.T + q0)
    g0 = _pseudo_gain(p0 @ a0.T, p_pred0, rcond)
    m_node = jnp.concatenate([(g0 @ ms_s[0])[None], ms_s])
    s_node = jnp.concatenate(
        [_symmetrize(p0 + g0 @ (ps_s[0] - p_pred0) @ g0.T)[None], ps_s]
    )
    pf_node = jnp.concatenate([p0[None], ps])
    t_node = jnp.concatenate([jnp.zeros((1,), dtype), t_train])
    k_hi = t_steps - 1  # largest left-bracket index

    def one(tq):
        k = jnp.clip(
            jnp.searchsorted(t_node, tq, side="right") - 1, 0, k_hi
        )
        dt1 = jnp.maximum(tq - t_node[k], jnp.zeros((), dtype))
        dt2 = jnp.maximum(t_node[k + 1] - tq, jnp.zeros((), dtype))
        a1, q1 = discretize(f_aug, p_inf, dt1)
        a2, q2 = discretize(f_aug, p_inf, dt2)
        m_l, m_r = m_node[k], m_node[k + 1]
        s_l, s_r = s_node[k], s_node[k + 1]
        # Pairwise smoothed joint over the bracket: the full-step
        # transition is the semigroup composite of the two half-steps,
        # so no extra discretize is needed.
        a12 = a2 @ a1
        q12 = _symmetrize(a2 @ q1 @ a2.T + q2)
        p_pred = _symmetrize(a12 @ pf_node[k] @ a12.T + q12)
        g_k = _pseudo_gain(pf_node[k] @ a12.T, p_pred, rcond)
        c_lr = g_k @ s_r  # Cov(x_L, x_R | Y)
        # Bridge weights (S == q12 by the same semigroup identity).
        w_b = _pseudo_gain(q1 @ a2.T, q12, rcond)
        w_b_a2 = w_b @ a2
        w_a = a1 - w_b_a2 @ a1
        lam = q1 - w_b_a2 @ q1
        cross = w_a @ c_lr @ w_b.T
        m_in = w_a @ m_l + w_b @ m_r
        p_in = _symmetrize(
            lam + w_a @ s_l @ w_a.T + w_b @ s_r @ w_b.T + cross + cross.T
        )
        # One-sided extrapolation past the terminal node.
        dte = jnp.maximum(tq - t_node[-1], jnp.zeros((), dtype))
        ae, qe = discretize(f_aug, p_inf, dte)
        m_ex = ae @ m_node[-1]
        p_ex = _symmetrize(ae @ s_node[-1] @ ae.T + qe)
        is_ex = tq > t_node[-1]
        return (
            jnp.where(is_ex, m_ex, m_in),
            jnp.where(is_ex, p_ex, p_in),
        )

    return jax.vmap(one)(t_test)


def _pick_smooth(interp):
    if interp == "union":
        return _union_grid_smooth
    if interp == "bridge":
        return _bridge_smooth
    raise ValueError(
        f"interp must be 'union' or 'bridge', got {interp!r}"
    )


@_pin_precision
def multisimm_predict_ss(
    params,
    timepoints,
    y,
    t_test,
    *,
    noise_var,
    replicates: int = 1,
    order: int = 10,
    obs_mask=None,
    parallel=None,
    shard=None,
    unique_dts=None,
    force_kernels=None,
    interp: str = "union",
):
    """Smoothed posterior for the R-force family: the state-space
    analogue of ``ExactMultiSIMM.latent_predict`` across ALL forces in
    one filter pass. Unlike the first-order family, the multi-force
    closed forms use the self-consistent force prior
    (``k_ff_consistent``), so both the posterior mean AND variance match
    the dense path (to SDE-order error). ``force_kernels`` as
    :func:`multisimm_mll_ss`.

    Returns ``(f_mean, f_var, x_mean, x_var)`` with f_mean/f_var shaped
    (R, T_test) and x_mean/x_var (T_test, G). ``unique_dts`` as
    :func:`lfm_predict_ss` (the exactness-critical jit promise)."""
    t_train = jnp.asarray(timepoints)
    t_test = jnp.asarray(t_test)
    g, _ = params.sensitivity.shape

    f_aug, p_inf, p0, h_forces = build_multiforce_ssm(
        params.decay, params.sensitivity, params.lengthscale, order=order,
        force_kernels=force_kernels,
    )
    p_tot = p0.shape[0] - g
    h = gene_observation_matrix(p_tot, g, replicates, t_train.dtype)
    mean = params.basal / params.decay
    m_t, p_t = _pick_smooth(interp)(
        f_aug, p_inf, p0, h, t_train, t_test, y,
        jnp.tile(mean, (replicates,)), noise_var, obs_mask=obs_mask,
        parallel=parallel, shard=shard, unique_dts=unique_dts,
        obs_slice=p_tot if replicates == 1 else None,
    )
    f_mean = (m_t @ h_forces.T).T  # (R, T_test)
    f_var = jnp.einsum("ri,tij,rj->rt", h_forces, p_t, h_forces)
    x_mean = m_t[:, p_tot:] + mean[None, :]
    x_var = jnp.diagonal(p_t, axis1=1, axis2=2)[:, p_tot:]
    return f_mean, f_var, x_mean, x_var


@_pin_precision
def lfm2_predict_ss(
    params,
    timepoints,
    y,
    t_test,
    *,
    noise_var,
    replicates: int = 1,
    order: int = 10,
    obs_mask=None,
    parallel=None,
    shard=None,
    unique_dts=None,
    force_kernel: str = "rbf",
    interp: str = "union",
):
    """Smoothed posterior for the second-order family: the state-space
    analogue of ``SecondOrderSIMM.latent_predict``. The simm2 closed
    forms use the self-consistent force prior, so posterior mean AND
    variance match the dense path (to SDE-order error) — and this route
    stays finite past the complex-erf forms' ``omega*l ~ 12`` wall.

    Returns ``(f_mean, f_var, x_mean, x_var)`` — x is the position
    block, mean ``B/k`` added back. ``unique_dts`` as
    :func:`lfm_predict_ss` (the exactness-critical jit promise)."""
    t_train = jnp.asarray(timepoints)
    t_test = jnp.asarray(t_test)
    g = params.alpha.shape[0]

    f_aug, p_inf, p0, h_force = build_lfm2_ssm(
        params.alpha, params.omega, params.sensitivity, params.lengthscale,
        order=order, force_kernel=force_kernel,
    )
    p_f = p0.shape[0] - 2 * g
    h_x = jnp.concatenate(
        [
            jnp.zeros((g, p_f), t_train.dtype),
            jnp.eye(g, dtype=t_train.dtype),
            jnp.zeros((g, g), t_train.dtype),
        ],
        axis=1,
    )
    h = jnp.tile(h_x, (replicates, 1))
    spring = params.alpha**2 + params.omega**2
    mean = params.basal / spring
    m_t, p_t = _pick_smooth(interp)(
        f_aug, p_inf, p0, h, t_train, t_test, y,
        jnp.tile(mean, (replicates,)), noise_var, obs_mask=obs_mask,
        parallel=parallel, shard=shard, unique_dts=unique_dts,
        obs_slice=p_f if replicates == 1 else None,
    )
    f_mean = m_t @ h_force
    f_var = jnp.einsum("i,tij,j->t", h_force, p_t, h_force)
    x_mean = m_t[:, p_f:p_f + g] + mean[None, :]
    x_var = jnp.diagonal(p_t, axis1=1, axis2=2)[:, p_f:p_f + g]
    return f_mean, f_var, x_mean, x_var


# ---------------------------------------------------------------------------
# Extended Kalman engine for the nonlinear-response family (models.nlfm).
# ---------------------------------------------------------------------------


def _response_and_deriv(name: str):
    """Elementwise response g and its derivative g' (closed forms — the
    four responses of ``ops.odeint.RESPONSE_NAMES``)."""
    if name == "identity":
        return (lambda f: f), (lambda f: jnp.ones_like(f))
    if name == "exp":
        return jnp.exp, jnp.exp
    if name == "softplus":
        return (
            lambda f: jnp.logaddexp(0.0, f),
            lambda f: 1.0 / (1.0 + jnp.exp(-f)),
        )
    if name == "sigmoid":
        def _sig(f):
            return 1.0 / (1.0 + jnp.exp(-f))

        return _sig, (lambda f: _sig(f) * (1.0 - _sig(f)))
    raise ValueError(f"unknown response {name!r}")


def _nlfm_ekf_pieces(params, response: str, order: int,
                     force_kernel: str = "rbf"):
    """Shared EKF machinery: drift, Jacobian, diffusion, initial moments.

    The state is ``z = [f-state (p), x (G)]`` with ABSOLUTE gene levels
    (the nonlinear drift has no constant fixed point to center away):

        dz_f = F_f z_f dt + dW      (the order-p RBF force SDE)
        dx_j = (B_j + S_j g(h z_f) - D_j x_j) dt

    — exactly the generative model of ``ops.odeint.gene_curves`` /
    ``data.synthetic.generate_ode_nonlinear`` (x(0) = B/D, force from
    t=0). The continuous diffusion on the balanced force block solves the
    stationarity identity ``F P_inf + P_inf F^T + Qc = 0``.
    """
    decay, sens, basal = params.decay, params.sensitivity, params.basal
    dtype = jnp.result_type(decay, sens, params.lengthscale)
    g_genes = decay.shape[0]
    f_c, h_c, p_diag, rate = _force_system(order, force_kernel)
    p = f_c.shape[0]
    m = p + g_genes
    f_c = jnp.asarray(f_c, dtype)
    h_c = jnp.asarray(h_c, dtype)
    p_ff = jnp.asarray(np.diag(p_diag), dtype)
    f_force = f_c * (rate / params.lengthscale)
    qc = jnp.zeros((m, m), dtype).at[:p, :p].set(
        -(f_force @ p_ff + p_ff @ f_force.T)
    )
    g_fn, gp_fn = _response_and_deriv(response)

    def drift(mz):
        zf, x = mz[:p], mz[p:]
        fval = h_c @ zf
        return jnp.concatenate(
            [f_force @ zf, basal + sens * g_fn(fval) - decay * x]
        )

    def jac(mz):
        zf = mz[:p]
        fval = h_c @ zf
        jl = sens[:, None] * (gp_fn(fval) * h_c)[None, :]
        return (
            jnp.zeros((m, m), dtype)
            .at[:p, :p].set(f_force)
            .at[p:, :p].set(jl)
            .at[p:, p:].set(-jnp.diag(decay))
        )

    m0 = jnp.concatenate([jnp.zeros((p,), dtype), basal / decay])
    p0 = jnp.zeros((m, m), dtype).at[:p, :p].set(p_ff)
    h_force = jnp.concatenate([h_c, jnp.zeros((g_genes,), dtype)])
    return drift, jac, qc, m0, p0, h_force, dtype, m


def _ekf_propagate(drift, jac, qc, mz, P, phi, dt, substeps: int,
                   with_phi: bool = True):
    """RK4 integration of the joint EKF moment ODE over one interval:

        dm/dt   = a(m)
        dP/dt   = J(m) P + P J(m)^T + Qc      (linearized Lyapunov)
        dPhi/dt = J(m) Phi                    (discrete-map sensitivity)

    ``Phi`` (the state-transition Jacobian across the whole interval) is
    what the extended RTS smoother consumes. Fixed ``substeps`` RK4 steps
    — static shapes, O(dt^5) local error, differentiable throughout.
    """
    h = dt / substeps

    def ode(state):
        mz, P, phi = state
        J = jac(mz)
        # The MLL path never reads Phi — skip its matmul (one of three
        # per ODE evaluation) so the training hot loop does not pay for
        # the smoother's sensitivity.
        return (
            drift(mz),
            J @ P + P @ J.T + qc,
            J @ phi if with_phi else phi,
        )

    def rk4_step(carry, _):
        mz, P, phi = carry
        k1 = ode((mz, P, phi))
        k2 = ode(tuple(a + 0.5 * h * b for a, b in zip(carry, k1)))
        k3 = ode(tuple(a + 0.5 * h * b for a, b in zip(carry, k2)))
        k4 = ode(tuple(a + h * b for a, b in zip(carry, k3)))
        new = tuple(
            a + (h / 6.0) * (b1 + 2 * b2 + 2 * b3 + b4)
            for a, b1, b2, b3, b4 in zip(carry, k1, k2, k3, k4)
        )
        mz, P, phi = new
        return (mz, _symmetrize(P), phi), None

    (mz, P, phi), _ = jax.lax.scan(
        rk4_step, (mz, P, phi), None, length=substeps
    )
    return mz, P, phi


@_pin_precision
def nlfm_mll_ekf(
    params,
    timepoints,
    y,
    *,
    response: str = "exp",
    jitter: float,
    replicates: int = 1,
    order: int = 10,
    substeps: int = 4,
    force_kernel: str = "rbf",
):
    """Extended-Kalman approximate MARGINAL likelihood for the
    nonlinear-response family (``models.nlfm``) — the force integrated
    out, O(T (p+G)^3).

    The MAP route (``models.nlfm.fit``) treats the Q-point force as a
    parameter and maximises the JOINT density; this engine linearizes the
    gene drift around the filtered mean (classic continuous-discrete EKF)
    and returns an approximate marginal p(y | kinetics) — the quantity
    the linear families' ``lfm_mll_ss`` computes exactly. With
    ``response='identity'`` the drift is linear, the linearization is
    exact, and the value matches :func:`lfm_mll_ss` to RK4-vs-expm
    integration error (pinned in tests/test_statespace.py).

    Same data layout and noise convention as :func:`lfm_mll_ss`
    (gene-major flat ``y``, ``jitter + obs_stddev^2``). The filter is a
    sequential scan — the prediction step is state-dependent, so the
    associative-scan factorisation does not apply (documented limit).

    TRUST REGION (r5, pinned by ``tests/test_statespace.py::
    TestEKFNonlinear::test_marginal_bias_vs_qmc_oracle`` against a
    scrambled-Sobol QMC ground-truth marginal): the EKF biases the
    marginal LOW, monotonically in the response's convexity — measured
    gaps at T=6 obs, G=2, prior-predictive data: identity +0.0006 nats
    (noise floor), sigmoid -0.08, softplus -0.28, exp -0.48 (about
    0.007 / 0.023 / 0.04 nats per observation). Model COMPARISON across
    kinetics at a fixed response is safe (the bias is shared);
    comparisons ACROSS responses, or absolute evidence readings for
    strongly convex responses (exp), should use the MAP/Laplace or HMC
    routes instead.

    Stability: the moment ODE is integrated by fixed-step RK4, so
    ``(dt / substeps) * rho(F_f)`` must sit inside the RK4 stability
    region (~2.8); the order-10 balanced force SDE has spectral radius
    ~4 * (2 / lengthscale), so ``substeps=4`` is safe for grid spacings
    up to ~dt = 2 at the reference lengthscales — increase it for
    coarser grids (a too-coarse setting NaNs loudly rather than
    silently degrading; pinned in tests).
    """
    g_count = params.decay.shape[0]
    t = jnp.asarray(timepoints)
    t_steps = t.shape[0]
    n_o = replicates * g_count
    drift, jac, qc, m0, p0, h_force, dtype, m = _nlfm_ekf_pieces(
        params, response, order, force_kernel
    )
    h = gene_observation_matrix(m - g_count, g_count, replicates, dtype)
    r_var = jnp.full((n_o,), jitter, dtype) + params.obs_stddev**2
    ys = y.reshape(n_o, t_steps).T  # absolute levels, not centered
    dts = jnp.diff(t, prepend=jnp.zeros((1,), dtype))
    eye_m = jnp.eye(m, dtype=dtype)

    def step(carry, xs):
        mz, P, ll = carry
        dt_i, y_i = xs
        mz, P, _ = _ekf_propagate(drift, jac, qc, mz, P, eye_m, dt_i,
                                  substeps, with_phi=False)
        mz, P, ll_i = _joseph_update_solve(mz, P, h, r_var, y_i)
        return (mz, P, ll + ll_i), None

    (_, _, ll), _ = jax.lax.scan(
        step, (m0, p0, jnp.zeros((), dtype)), (dts, ys)
    )
    return ll


def _ekf_rts_smoother(phis, ms, ps, m_preds, p_preds):
    """Extended RTS backward pass over EKF filter outputs.

    Unlike the LINEAR :func:`rts_smoother`, the prediction here is
    AFFINE in the previous state (the nonlinear drift carries the basal
    constants), so the recursion must use the stored nonlinear prediction
    moments ``(m_pred, P_pred)`` directly — ``Phi m_f`` alone drops the
    constant part and destroys the posterior (measured: force corr -0.14
    vs the truth before this fix). Gains reuse the eigendecomposition
    pseudo-solve rationale of :func:`rts_smoother`. ``phis[k]`` is the
    sensitivity of the k-1 -> k prediction map.
    """
    rcond = _rts_rcond(ms.dtype)

    def step(carry, xs):
        m_next_s, p_next_s = carry
        m_f, p_f, phi_next, m_pred_next, p_pred_next = xs
        gain = _pseudo_gain(p_f @ phi_next.T, p_pred_next, rcond)
        m_s = m_f + gain @ (m_next_s - m_pred_next)
        p_s = _symmetrize(
            p_f + gain @ (p_next_s - p_pred_next) @ gain.T
        )
        return (m_s, p_s), (m_s, p_s)

    xs = (ms[:-1], ps[:-1], phis[1:], m_preds[1:], p_preds[1:])
    (_, _), (ms_s, ps_s) = jax.lax.scan(
        step, (ms[-1], ps[-1]), xs, reverse=True
    )
    ms_s = jnp.concatenate([ms_s, ms[-1:]], axis=0)
    ps_s = jnp.concatenate([ps_s, ps[-1:]], axis=0)
    return ms_s, ps_s


@_pin_precision
def nlfm_predict_ekf(
    params,
    timepoints,
    y,
    t_test,
    *,
    response: str = "exp",
    noise_var,
    replicates: int = 1,
    order: int = 10,
    substeps: int = 4,
    force_kernel: str = "rbf",
):
    """Extended-RTS smoothed posterior for the nonlinear family: forward
    EKF on the union grid (observation updates masked to train steps)
    recording each interval's sensitivity ``Phi`` and process-noise
    equivalent ``Q_k = P_pred - Phi P_f Phi^T``, then the EXISTING
    sequential RTS pass over the per-step (Phi, Q) — the extended
    smoother is the linear one along the linearization trajectory.

    Returns ``(f_mean, f_var, x_mean, x_var)`` at ``t_test``; the force
    read is linear in the state so no extra approximation enters the
    readout. ``noise_var`` as :func:`lfm_predict_ss`.
    """
    g_count = params.decay.shape[0]
    t_train = jnp.asarray(timepoints)
    t_test = jnp.asarray(t_test)
    n_o = replicates * g_count
    drift, jac, qc, m0, p0, h_force, dtype, m = _nlfm_ekf_pieces(
        params, response, order, force_kernel
    )
    h = gene_observation_matrix(m - g_count, g_count, replicates, dtype)

    t_all = jnp.concatenate([t_train, t_test])
    order_idx = jnp.argsort(t_all, stable=True)
    t_sorted = t_all[order_idx]
    is_train = jnp.concatenate(
        [jnp.ones_like(t_train), jnp.zeros_like(t_test)]
    )[order_idx]
    n_all = t_sorted.shape[0]
    dts = jnp.diff(t_sorted, prepend=jnp.zeros((1,), dtype))

    ys_train = y.reshape(n_o, t_train.shape[0]).T
    ys = jnp.zeros((n_all, n_o), dtype)
    train_pos = jnp.nonzero(is_train, size=t_train.shape[0])[0]
    ys = ys.at[train_pos].set(ys_train)
    noise_var = jnp.broadcast_to(
        jnp.asarray(noise_var, dtype), (t_train.shape[0], n_o)
    )
    rv_all = jnp.ones((n_all, n_o), dtype).at[train_pos].set(noise_var)
    eye_m = jnp.eye(m, dtype=dtype)

    def step(carry, xs):
        mz, P = carry
        dt_i, y_i, rv_i, mk_i = xs
        m_pred, p_pred, phi = _ekf_propagate(
            drift, jac, qc, mz, P, eye_m, dt_i, substeps
        )
        m_up, p_up, _ = _joseph_update_solve(m_pred, p_pred, h, rv_i, y_i)
        mz = jnp.where(mk_i > 0, m_up, m_pred)
        P = jnp.where(mk_i > 0, p_up, p_pred)
        return (mz, P), (mz, P, phi, m_pred, p_pred)

    (_, _), (ms, ps, phis, m_preds, p_preds) = jax.lax.scan(
        step, (m0, p0), (dts, ys, rv_all, is_train)
    )
    ms_s, ps_s = _ekf_rts_smoother(phis, ms, ps, m_preds, p_preds)

    test_pos = jnp.nonzero(1.0 - is_train, size=t_test.shape[0])[0]
    m_t, p_t = ms_s[test_pos], ps_s[test_pos]
    p = m - g_count
    f_mean = m_t @ h_force
    # The extended smoother's covariance subtraction can go slightly
    # indefinite along near-deterministic directions (the linear path's
    # pseudo-solve argument does not fully transfer when P_pred comes
    # from linearized integration) — floor the marginals at 0 (measured
    # undershoot ~-7e-3 on the exp-response recovery problem; means are
    # unaffected).
    f_var = jnp.maximum(
        jnp.einsum("i,tij,j->t", h_force, p_t, h_force), 0.0
    )
    x_mean = m_t[:, p:]
    x_var = jnp.maximum(
        jnp.diagonal(p_t, axis1=1, axis2=2)[:, p:], 0.0
    )
    return f_mean, f_var, x_mean, x_var


# ---------------------------------------------------------------------------
# Streaming (online) inference — constant-memory serving API.
# ---------------------------------------------------------------------------


class FilterCarry(NamedTuple):
    """Streaming filter state: the sufficient statistics of everything
    seen so far. ``t_last`` is the time of the last absorbed observation
    (the prior sits at ``t=0``); ``ll`` accumulates the exact marginal
    log-likelihood of the absorbed prefix."""

    mean: jnp.ndarray     # (m,) filtered state mean (centered)
    cov: jnp.ndarray      # (m, m) filtered state covariance
    t_last: jnp.ndarray   # () time of last update
    ll: jnp.ndarray       # () accumulated marginal log-likelihood


def streaming_init(params, *, replicates: int = 1, order: int = 10,
                   force_kernel: str = "rbf"):
    """Open a streaming SIMM inference session (``models.simm`` kinetics).

    Returns ``(carry, aux)`` where ``aux`` holds the static model pieces
    (``f_aug, p_inf, h, mean_obs, h_force``) that every subsequent
    :func:`streaming_update` / :func:`streaming_predict` consumes —
    build once, jit the update closed over it. The serving pattern for
    the O(T) engine: each new observation vector costs ONE O((p+G)^3)
    update at constant memory, no reprocessing of history (the batch
    filter over the same grid gives bitwise the same trajectory —
    pinned in tests/test_statespace.py).
    """
    g = params.decay.shape[0]
    f_aug, p_inf, p0, h_force = build_lfm_ssm(
        params.decay, params.sensitivity, params.lengthscale, order=order,
        force_kernel=force_kernel,
    )
    dtype = p0.dtype
    h = gene_observation_matrix(p0.shape[0] - g, g, replicates, dtype)
    mean_obs = jnp.tile(params.basal / params.decay, (replicates,))
    carry = FilterCarry(
        mean=jnp.zeros((p0.shape[0],), dtype),
        cov=p0,
        t_last=jnp.zeros((), dtype),
        ll=jnp.zeros((), dtype),
    )
    aux = (f_aug, p_inf, h, mean_obs, h_force)
    return carry, aux


@_pin_precision
def streaming_update(carry: FilterCarry, aux, t_new, y_new, noise_var,
                     obs_mask=None):
    """Absorb one observation vector ``y_new`` (n_o,) at time ``t_new``
    (> ``carry.t_last``): predict across the gap, measurement-update,
    accumulate the likelihood. ``noise_var``: (n_o,) or scalar;
    ``obs_mask``: optional (n_o,) {0,1} per-entry missingness (masked
    entries may be NaN — deleted exactly, as the batch filter).
    Returns the new carry.

    Out-of-order times are CHECKED: ``t_new < carry.t_last`` poisons the
    carry's ``ll`` to NaN at THIS call (a negative dt would otherwise
    make the discretized transition expansive and the noise increment
    negative-definite — silent covariance corruption that surfaces many
    updates later). Replay/reordering buffers belong upstream of this
    API."""
    f_aug, p_inf, h, mean_obs, _ = aux
    dtype = carry.mean.dtype
    n_o = mean_obs.shape[0]
    t_new = jnp.asarray(t_new, dtype)
    in_order = t_new >= carry.t_last
    yc = jnp.asarray(y_new, dtype) - mean_obs
    rv = jnp.broadcast_to(jnp.asarray(noise_var, dtype), (n_o,))
    a, q = discretize(f_aug, p_inf, t_new - carry.t_last)
    m_pred = a @ carry.mean
    p_pred = _symmetrize(a @ carry.cov @ a.T + q)
    if obs_mask is not None:
        om = jnp.asarray(obs_mask, dtype)[None, :]
        h_m, rv_m, yc_m = _mask_obs(h, rv[None, :], yc[None, :], om)
        corr = _mask_ll_correction(om)[0]
        h_u, rv_u, yc_u = h_m[0], rv_m[0], yc_m[0]
    else:
        h_u, rv_u, yc_u = h, rv, yc
        corr = jnp.zeros((), dtype)
    m_up, p_up, ll_i = _joseph_update(m_pred, p_pred, h_u, rv_u, yc_u)
    # Out-of-order: the moments stay at the (valid) pre-call state and
    # only the ll is poisoned — the error is visible without corrupting
    # the filter.
    nan = jnp.asarray(jnp.nan, dtype)
    return FilterCarry(
        mean=jnp.where(in_order, m_up, carry.mean),
        cov=jnp.where(in_order, p_up, carry.cov),
        t_last=jnp.maximum(t_new, carry.t_last),
        ll=jnp.where(in_order, carry.ll + ll_i + corr, nan),
    )


@_pin_precision
def streaming_freeze(carry: FilterCarry, aux, dt, noise_var):
    """Freeze the per-arrival update at the steady-state gain for a
    FIXED arrival cadence ``dt`` (r5 — the serving face of
    ``stationary_after``): returns a pack for
    :func:`streaming_update_frozen`, whose per-arrival cost is one
    m^2 matvec + a triangular solve instead of the full O(m^3)
    covariance update of :func:`streaming_update`.

    The pack freezes the gain/Cholesky at the fixed point implied by
    the CURRENT carry covariance — call it after a warmup of exact
    updates (the same geometric-in-warmup error contract as
    ``stationary_after``, pinned in tests against the batch tail).
    ``noise_var``: (n_o,) or scalar, fixed across arrivals."""
    f_aug, p_inf, h, mean_obs, _ = aux
    dtype = carry.mean.dtype
    n_o = mean_obs.shape[0]
    rv = jnp.broadcast_to(jnp.asarray(noise_var, dtype), (n_o,))
    a, q = discretize(f_aug, p_inf, jnp.asarray(dt, dtype))
    p_pred = _symmetrize(a @ carry.cov @ a.T + q)
    s_mat = h @ p_pred @ h.T + jnp.diag(rv)
    chol = jnp.linalg.cholesky(s_mat)
    gain = jax.scipy.linalg.cho_solve((chol, True), h @ p_pred).T
    m_dim = carry.mean.shape[0]
    ikh = jnp.eye(m_dim, dtype=dtype) - gain @ h
    p_filt = _symmetrize(
        ikh @ p_pred @ ikh.T + (gain * rv[None, :]) @ gain.T
    )
    mmat = ikh @ a
    ha = h @ a
    const = (
        jnp.sum(jnp.log(jnp.diagonal(chol))) + 0.5 * n_o * LOG_2PI
    )
    return {
        "dt": jnp.asarray(dt, dtype), "mmat": mmat, "ha": ha,
        "gain": gain, "chol": chol, "const": const, "p_filt": p_filt,
        "mean_obs": mean_obs,
    }


def streaming_update_frozen(carry: FilterCarry, pack, y_new):
    """Absorb one on-cadence observation through the frozen pack: the
    O(m^2) serving update (see :func:`streaming_freeze`). The carry's
    covariance is pinned at the pack's steady filtered covariance, so
    :func:`streaming_predict` keeps working off the same carry."""
    yc = jnp.asarray(y_new, carry.mean.dtype) - pack["mean_obs"]
    r = yc - pack["ha"] @ carry.mean
    al = jax.scipy.linalg.solve_triangular(pack["chol"], r, lower=True)
    m_new = pack["mmat"] @ carry.mean + pack["gain"] @ yc
    ll_i = -0.5 * jnp.sum(al * al) - pack["const"]
    return FilterCarry(
        mean=m_new,
        cov=pack["p_filt"],
        t_last=carry.t_last + pack["dt"],
        ll=carry.ll + ll_i,
    )


@_pin_precision
def streaming_predict(carry: FilterCarry, aux, params, t_query):
    """Forecast the latent force and gene levels at ``t_query`` (>=
    ``carry.t_last``) from the current carry — the serving read path
    (filtered/predictive, NOT smoothed: it conditions on the absorbed
    prefix only, so it never reprocesses history). Returns
    ``(f_mean, f_var, x_mean, x_var)`` with x per gene, mean added
    back."""
    f_aug, p_inf, h, mean_obs, h_force = aux
    dtype = carry.mean.dtype
    a, q = discretize(
        f_aug, p_inf, jnp.asarray(t_query, dtype) - carry.t_last
    )
    m_q = a @ carry.mean
    p_q = _symmetrize(a @ carry.cov @ a.T + q)
    f_mean = h_force @ m_q
    f_var = h_force @ p_q @ h_force
    order = carry.mean.shape[0] - params.decay.shape[0]
    x_mean = m_q[order:] + params.basal / params.decay
    x_var = jnp.diagonal(p_q)[order:]
    return f_mean, f_var, x_mean, x_var


# ---------------------------------------------------------------------------
# Posterior trajectory sampling (FFBS) — joint force draws in O(T).
# ---------------------------------------------------------------------------


def _psd_sqrt_traced(p):
    """Traced symmetric PSD square root via eigh with clipping — the
    sampling covariances ``P_f - G P_pred G^T`` are exactly singular
    along deterministic directions (t=0 gene block, dt=0 duplicates), so
    a Cholesky would fail where the eigendecomposition is fine."""
    w, v = jnp.linalg.eigh(_symmetrize(p))
    return v * jnp.sqrt(jnp.maximum(w, 0.0))[None, :]


@_pin_precision
def posterior_sample_ss(
    params,
    timepoints,
    y,
    t_test,
    key,
    *,
    noise_var,
    num_samples: int = 1,
    replicates: int = 1,
    order: int = 10,
    force_kernel: str = "rbf",
    unique_dts=None,
):
    """JOINT posterior samples of the latent force at ``t_test`` —
    forward-filter backward-sampling (FFBS; Carter & Kohn 1994) on the
    union train/test grid, O(T (p+G)^3) per draw.

    The smoothed band (:func:`lfm_predict_ss`) gives MARGINAL
    mean/variance; these draws carry the posterior's full temporal
    correlation — functionals of the whole trajectory (peak time, area
    under the force, threshold crossings) can be Monte-Carlo'd correctly
    from them, which marginals cannot do. Backward recursion:
    ``z_T ~ N(m_T, P_T)`` then ``z_k | z_{k+1} ~ N(m_k + G_k (z_{k+1} -
    A m_k), P_k - G_k P_pred G_k^T)`` with the same pseudo-solve gain as
    the smoother. Samples are vmapped into one program.

    Returns ``(num_samples, T_test)`` force draws. ``noise_var`` and
    ``unique_dts`` as :func:`lfm_predict_ss` (the latter is the
    exactness-critical jit promise on the union grid's distinct steps).
    """
    g = params.decay.shape[0]
    t_train = jnp.asarray(timepoints)
    t_test = jnp.asarray(t_test)
    dtype = t_train.dtype
    n_o = replicates * g

    f_aug, p_inf, p0, h_force = build_lfm_ssm(
        params.decay, params.sensitivity, params.lengthscale, order=order,
        force_kernel=force_kernel,
    )
    m_dim = p0.shape[0]
    h = gene_observation_matrix(m_dim - g, g, replicates, dtype)
    mean_obs = jnp.tile(params.basal / params.decay, (replicates,))

    t_all = jnp.concatenate([t_train, t_test])
    order_idx = jnp.argsort(t_all, stable=True)
    t_sorted = t_all[order_idx]
    is_train = jnp.concatenate(
        [jnp.ones_like(t_train), jnp.zeros_like(t_test)]
    )[order_idx]
    n_all = t_sorted.shape[0]
    dts = jnp.diff(t_sorted, prepend=jnp.zeros((1,), dtype))
    a, q = discretize(f_aug, p_inf, dts, max_unique=unique_dts)

    ys_train = y.reshape(n_o, t_train.shape[0]).T - mean_obs[None, :]
    ys = jnp.zeros((n_all, n_o), dtype)
    train_pos = jnp.nonzero(is_train, size=t_train.shape[0])[0]
    ys = ys.at[train_pos].set(ys_train)
    noise_var = jnp.broadcast_to(
        jnp.asarray(noise_var, dtype), (t_train.shape[0], n_o)
    )
    rv_all = jnp.ones((n_all, n_o), dtype).at[train_pos].set(noise_var)

    ms, ps, _ = kalman_filter(
        a, q, h, rv_all, ys, p0, mask=is_train,
        obs_slice=(m_dim - g) if replicates == 1 else None,
    )
    rcond = _rts_rcond(dtype)

    # Per-step backward-sampling pieces (shared by every draw).
    def pieces(a_next, q_next, m_f, p_f):
        p_pred = _symmetrize(a_next @ p_f @ a_next.T + q_next)
        gain = _pseudo_gain(p_f @ a_next.T, p_pred, rcond)
        cov = _symmetrize(p_f - gain @ p_pred @ gain.T)
        return gain, _psd_sqrt_traced(cov)

    gains, sqrts = jax.vmap(pieces)(a[1:], q[1:], ms[:-1], ps[:-1])
    sqrt_t = _psd_sqrt_traced(ps[-1])

    # ONE backward pass shared by all S draws (VERDICT r4 #7): the
    # gains/moments/noise-sqrts are draw-independent, so the scan carry
    # is the (S, m) BATCH of trajectories and every step is two
    # (S, m) x (m, m) matmuls — S draws cost one backward-chain latency,
    # not S chains (measured ~flat in S on TPU, bench ``ffbs_draws64_s``).
    k_t, k_rest = jax.random.split(key)
    z_t = ms[-1][None, :] + jax.random.normal(
        k_t, (num_samples, m_dim), dtype
    ) @ sqrt_t.T
    eps = jax.random.normal(k_rest, (n_all - 1, num_samples, m_dim), dtype)

    def back(z_next, xs):
        m_f, a_next, gain, sq, e = xs
        mean = m_f[None, :] + (z_next - (a_next @ m_f)[None, :]) @ gain.T
        z = mean + e @ sq.T
        return z, z

    _, zs = jax.lax.scan(
        back, z_t, (ms[:-1], a[1:], gains, sqrts, eps), reverse=True
    )
    traj = jnp.concatenate([zs, z_t[None]], axis=0)  # (n_all, S, m)
    draws = (traj @ h_force).T  # (S, n_all)
    test_pos = jnp.nonzero(1.0 - is_train, size=t_test.shape[0])[0]
    return draws[:, test_pos]


@_pin_precision
def sample_trajectory_ss(
    params,
    timepoints,
    key,
    *,
    num_samples: int = 1,
    order: int = 10,
    force_kernel: str = "rbf",
):
    """PRIOR draws of (force, gene) trajectories from the state-space
    model at arbitrary T — one forward pass per draw, O(T (p+G)^3),
    where a dense prior draw needs an O(N^3) factorisation (the
    synthetic generators cap out around N~1e4 for exactly that reason).

    The t=0 convention matches the reference generative model (force at
    its stationary marginal, genes deterministic at ``B/D``); with a
    Matern ``force_kernel`` the draw is from the EXACT prior. Returns
    ``(f, x)`` with shapes ``(num_samples, T)`` and
    ``(num_samples, T, G)`` — gene means added back. Model checking,
    synthetic benchmarks, and prior-predictive calibration at any scale.
    """
    g = params.decay.shape[0]
    t = jnp.asarray(timepoints)
    dtype = t.dtype
    f_aug, p_inf, p0, h_force = build_lfm_ssm(
        params.decay, params.sensitivity, params.lengthscale, order=order,
        force_kernel=force_kernel,
    )
    m_dim = p0.shape[0]
    dts = jnp.diff(t, prepend=jnp.zeros((1,), dtype))
    a, q = discretize(f_aug, p_inf, dts)
    sqrts = jax.vmap(_psd_sqrt_traced)(q)
    sqrt0 = _psd_sqrt_traced(p0)
    mean_x = params.basal / params.decay

    def one(k):
        k0, k_rest = jax.random.split(k)
        z0 = sqrt0 @ jax.random.normal(k0, (m_dim,), dtype)
        eps = jax.random.normal(k_rest, (t.shape[0], m_dim), dtype)

        def step(z, xs):
            a_i, sq_i, e_i = xs
            z = a_i @ z + sq_i @ e_i
            return z, z

        _, zs = jax.lax.scan(step, z0, (a, sqrts, eps))
        return zs @ h_force, zs[:, m_dim - g:] + mean_x[None, :]

    f, x = jax.vmap(one)(jax.random.split(key, num_samples))
    return f, x
