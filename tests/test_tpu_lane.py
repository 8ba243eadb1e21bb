"""On-device test lane (VERDICT r2 #4): one command re-verifies every
on-chip claim previously frozen in docstrings/PARITY.md.

    DIS_TPU_LANE=1 python -m pytest tests/ -m tpu -q

Runs on the default accelerator (the axon TPU tunnel; any non-cpu backend)
in f32. Sizes are kept at the smallest scale where the claims are
meaningful (N=2048-4096); first-run compiles go through the shared
persistent cache, so a lane rerun after bench.py is seconds, not minutes.

Forcing semantics over the tunnel: host fetches (float()/np.asarray) are
the only reliable sync points (see utils.benchmarking), so every assertion
here goes through a fetched value.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _real_gram(n, genes=50, seed=0):
    from dis_project_tpu.ops import gram as gram_ops

    rng = np.random.default_rng(seed)
    t = rng.uniform(0, 12.0, n)
    gi = rng.integers(0, genes, n)
    x = jnp.asarray(np.stack([t, gi, np.ones(n)], 1), jnp.float32)
    decay = jnp.asarray(rng.uniform(0.2, 1.0, genes), jnp.float32)
    sens = jnp.asarray(rng.uniform(0.5, 1.5, genes), jnp.float32)
    ell = jnp.asarray(2.5, jnp.float32)
    return x, decay, sens, ell


def test_backend_is_accelerator():
    assert jax.default_backend() not in ("cpu", "gpu"), (
        "the TPU lane must run on the accelerator; got "
        f"{jax.default_backend()} (unset JAX_PLATFORMS pins?)"
    )


def test_pallas_gram_sym_matches_xla_on_device():
    """The symmetric (lower-triangle + DMA-mirror) Pallas Gram kernel must
    reproduce the XLA closed forms ON DEVICE — the A&S erf approximation
    and the manual-DMA mirroring are exactly the parts interpret-mode CPU
    tests cannot exercise for real."""
    from dis_project_tpu.ops import gram as gram_ops
    from dis_project_tpu.ops import pallas_gram as pg

    x, decay, sens, ell = _real_gram(2048)

    @jax.jit
    def both(x):
        sym = pg.gram_sym(x, decay, sens, ell, kind="xx")
        ref = gram_ops.gram(x, decay, sens, ell)
        return (
            jnp.max(jnp.abs(sym - ref)),
            jnp.max(jnp.abs(sym - sym.T)),
            jnp.max(jnp.abs(ref)),
        )

    err, asym, scale = (float(v) for v in both(x))
    # On-device, Mosaic's VPU transcendental codegen and XLA's differ at
    # ~1e-6 relative per exp/erf, which the h-term CANCELLATION amplifies
    # to ~2e-4 relative on the worst Gram entries (measured 1.4e-3 abs on
    # values up to ~12) — both routes are the same distance from the f64
    # truth (see test_gram_error_class_vs_f64_oracle below).
    assert err < 1e-3 * max(scale, 1.0), (err, scale)
    assert asym == 0.0  # mirrored writes: exactly symmetric


def test_pallas_rect_gram_matches_xla_on_device():
    from dis_project_tpu.ops import gram as gram_ops
    from dis_project_tpu.ops import pallas_gram as pg

    x, decay, sens, ell = _real_gram(1024)
    rows = x[:512]
    cols = x.at[:, 2].set(0.0)[:768]

    @jax.jit
    def both(rows, cols):
        out = pg.cross_covariance(rows, cols, decay, sens, ell, kind="xf")
        ref = gram_ops.cross_covariance(rows, cols, decay, sens, ell)
        return jnp.max(jnp.abs(out - ref)), jnp.max(jnp.abs(ref))

    err, scale = (float(v) for v in both(rows, cols))
    assert err < 1e-3 * max(scale, 1.0), (err, scale)


def test_gram_error_class_vs_f64_oracle():
    """Anchor the on-device f32 Gram tolerance: against the (emulated) f64
    oracle at N=512, the Pallas kernel's error must be in the SAME class
    as XLA's own f32 closed forms (within 3x) — i.e. the A&S erf and
    Mosaic transcendental codegen cost nothing beyond the f32
    cancellation both routes share."""
    from dis_project_tpu.ops import gram as gram_ops
    from dis_project_tpu.ops import pallas_gram as pg

    x, decay, sens, ell = _real_gram(512)

    # f32 kernels compile OUTSIDE the x64 context (Mosaic does not lower
    # under enable_x64 even for all-f32 operands); only the oracle runs
    # inside it. Comparison happens host-side in f64 numpy.
    sym = np.asarray(
        jax.jit(lambda x: pg.gram_sym(x, decay, sens, ell, kind="xx"))(x),
        dtype=np.float64,
    )
    xla = np.asarray(
        jax.jit(lambda x: gram_ops.gram(x, decay, sens, ell))(x),
        dtype=np.float64,
    )
    # The oracle is exact math — compute it on the host CPU device (true
    # f64; the TPU's emulated f64 takes minutes to compile for the erf
    # chain and proves nothing extra).
    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(True):
        # jit follows the committed device of its inputs -> CPU program.
        ref64 = np.asarray(
            jax.jit(gram_ops.gram)(
                jax.device_put(x.astype(jnp.float64), cpu),
                jax.device_put(decay.astype(jnp.float64), cpu),
                jax.device_put(sens.astype(jnp.float64), cpu),
                jax.device_put(ell.astype(jnp.float64), cpu),
            )
        )
    e_sym = np.max(np.abs(sym - ref64))
    e_xla = np.max(np.abs(xla - ref64))
    assert e_sym < 3 * max(e_xla, 1e-6), (e_sym, e_xla)


def test_blocked_cholesky_real_gram_canary():
    """The r2 NaN regression as a permanent on-device test: factor a REAL
    (cond ~1e3) LFM Sigma — not a random diagonally-dominant stand-in —
    and check finiteness + reconstruction + XLA-factor agreement. This is
    exactly the case single-pass-bf16 matmul products corrupt."""
    from dis_project_tpu.ops import gram as gram_ops
    from dis_project_tpu.ops import pallas_cholesky as pc

    x, decay, sens, ell = _real_gram(4096)

    @jax.jit
    def run(x):
        A = gram_ops.gram(x, decay, sens, ell)
        A = A + 1.0001 * jnp.eye(A.shape[0], dtype=A.dtype)
        Lt = pc.blocked_cholesky_t(A)
        L = jnp.tril(Lt.T)
        L_ref = jnp.linalg.cholesky(A)
        finite = jnp.all(jnp.isfinite(Lt))
        recon = jnp.max(jnp.abs(L[:256] @ L.T[:, :256] - A[:256, :256]))
        dfac = jnp.max(jnp.abs(L - L_ref))
        return finite, recon, dfac

    finite, recon, dfac = run(x)
    assert bool(finite)
    assert float(recon) < 1e-1
    # Two f32 factorisation orders agree to f32-class error.
    assert float(dfac) < 5e-2, float(dfac)


def test_blocked_mll_grads_finite_on_device():
    """The full custom-VJP blocked MLL (fwd Lt factor + bwd diag-reuse
    tri-inverse + minimal-tile Pallas SYRK) at N=4096 on device: value and
    hyperparameter gradients finite and matching the xla impl to f32
    tolerance."""
    from dis_project_tpu.ops import gram as gram_ops
    from dis_project_tpu.ops import mll as mll_ops

    x, decay0, sens, ell = _real_gram(4096)
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal(4096), jnp.float32)

    def logp(decay, impl):
        K = gram_ops.cross_covariance(x, x, decay, sens, ell)
        sigma = mll_ops.add_diagonal(K, jnp.asarray(1.01, jnp.float32))
        return mll_ops.mvn_logpdf(y, jnp.zeros_like(y), sigma, impl=impl)

    v_b, g_b = jax.jit(
        jax.value_and_grad(lambda d: logp(d, "blocked"))
    )(decay0)
    v_x, g_x = jax.jit(jax.value_and_grad(lambda d: logp(d, "xla")))(decay0)
    v_b, v_x = float(v_b), float(v_x)
    assert np.isfinite(v_b)
    np.testing.assert_allclose(v_b, v_x, rtol=5e-5)
    gb, gx = np.asarray(g_b), np.asarray(g_x)
    assert np.isfinite(gb).all()
    # Per-entry agreement between two INDEPENDENT f32 factorisation orders
    # is NOT the right assertion at this scale: the f32 exact-MLL gradient
    # at N=4096 / cond ~1e3 carries ~23% rel-norm error from the f64 truth
    # on BOTH routes (measured on device: blocked 0.2324 vs xla 0.2302,
    # equidistant — the cotangent is the cancellation-dominated difference
    # alpha alpha^T - Sigma^{-1}). What must hold: the two routes agree on
    # the descent direction essentially exactly.
    cos = float(gb @ gx / (np.linalg.norm(gb) * np.linalg.norm(gx)))
    assert cos > 0.999, cos
    ratio = float(np.linalg.norm(gb) / np.linalg.norm(gx))
    assert 0.9 < ratio < 1.1, ratio


def test_blocked_grad_error_class_vs_f64_oracle():
    """Anchor the f32 gradient tolerance: at N=1024 against the (emulated)
    f64 oracle, the blocked route's gradient error must be in the SAME
    class as the xla route's (within 1.3x) — measured on device: rel-norm
    0.0763 vs 0.0760, i.e. the f32 error is conditioning, not the blocked
    factoriser."""
    from dis_project_tpu.ops import gram as gram_ops
    from dis_project_tpu.ops import mll as mll_ops

    x, decay0, sens, ell = _real_gram(1024)
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal(1024), jnp.float32)

    def logp(decay, impl, x, y, sens, ell, dt):
        K = gram_ops.cross_covariance(x, x, decay, sens, ell)
        sigma = mll_ops.add_diagonal(K, jnp.asarray(1.01, dt))
        return mll_ops.mvn_logpdf(y, jnp.zeros_like(y), sigma, impl=impl)

    g_b = np.asarray(jax.jit(jax.grad(
        lambda d: logp(d, "blocked", x, y, sens, ell, jnp.float32)
    ))(decay0))
    g_x = np.asarray(jax.jit(jax.grad(
        lambda d: logp(d, "xla", x, y, sens, ell, jnp.float32)
    ))(decay0))
    # Oracle gradient in true f64 on the host CPU device (the TPU's
    # emulated-f64 Cholesky takes minutes to compile and adds nothing).
    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(True):
        put = lambda a: jax.device_put(a.astype(jnp.float64), cpu)
        x64, y64, s64, l64 = put(x), put(y), put(sens), put(ell)
        g64 = np.asarray(jax.jit(jax.grad(
            lambda d: logp(d, "xla", x64, y64, s64, l64, jnp.float64)
        ))(put(decay0)))
    e_b = np.linalg.norm(g_b - g64) / np.linalg.norm(g64)
    e_x = np.linalg.norm(g_x - g64) / np.linalg.norm(g64)
    assert e_b < 1.3 * max(e_x, 1e-4), (e_b, e_x)


def test_dispatch_thresholds_on_device():
    """Trace-time dispatch sanity ON the accelerator: the resolved backend
    strings match the measured-crossover thresholds the docstrings claim."""
    from dis_project_tpu.models import simm
    from dis_project_tpu.ops import mll as mll_ops

    assert mll_ops.resolve_chol_impl(2048, jnp.float32) == "blocked"
    assert mll_ops.resolve_chol_impl(1024, jnp.float32) == "xla"
    assert mll_ops.resolve_chol_impl(8192, jnp.float64) == "xla"

    model = simm.ExactSIMM(num_genes=5)
    assert model._resolve_gram(1024, jnp.float32) == "pallas"
    assert model._resolve_gram(8192, jnp.float32) == "xla"  # rect window
    assert model._resolve_gram(1024, jnp.float64) == "xla"


def test_statespace_mll_precision_pinned_on_device():
    """The Kalman engine's precision pin (`ops/statespace._pin_precision`)
    as a permanent on-device test. TPU's default f32 matmul is a
    single-pass bf16 product; the T-step covariance recurrence
    ``P <- A P A^T + Q`` compounds its ~1e-2 relative error — measured
    pre-fix at G=10/T=40: the MLL lands ~1.7 nats off the CPU-f32 value
    and the training trajectory NaNs within one Adam step. Pinned
    HIGHEST, device and host f32 agree to f32 roundoff."""
    from dis_project_tpu.models import simm
    from dis_project_tpu.ops import statespace as ss

    genes, steps = 10, 40
    rng = np.random.default_rng(3)
    t = jnp.asarray(np.linspace(0.0, 12.0, steps), jnp.float32)
    params = simm.init_params(genes, dtype=jnp.float32)
    mean = np.repeat(np.asarray(params.basal / params.decay), steps)
    y = jnp.asarray(
        rng.normal(0.0, 0.3, size=(genes * steps,)) + mean, jnp.float32
    )

    def loss(raw, t, y):
        return -ss.lfm_mll_ss(
            simm.constrain(raw), t, y, jitter=1e-4, order=10, parallel=True
        )

    raw = simm.unconstrain(params)
    v_dev, g_dev = jax.jit(jax.value_and_grad(loss))(raw, t, y)
    v_dev = float(v_dev)
    assert np.isfinite(v_dev)
    assert all(
        np.isfinite(np.asarray(g)).all()
        for g in jax.tree_util.tree_leaves(g_dev)
    )

    cpu = jax.devices("cpu")[0]
    raw_c, t_c, y_c = jax.device_put((raw, t, y), cpu)
    v_cpu = float(jax.jit(jax.value_and_grad(loss))(raw_c, t_c, y_c)[0])
    # Pre-fix the gap here is ~1.7 nats; post-fix it is f32 roundoff.
    assert abs(v_dev - v_cpu) < 5e-4 * max(1.0, abs(v_cpu)), (v_dev, v_cpu)


def test_gram_dispatch_uses_sym_kernel_on_device():
    """ExactSIMM.gram at an in-window size must produce the symmetric-
    kernel result (exact symmetry is its signature: the dense XLA build is
    symmetric only to roundoff... both are, actually — so check against
    the closed forms and exact symmetry, which the DMA mirror guarantees
    bitwise)."""
    from dis_project_tpu.models import simm
    from dis_project_tpu.ops import gram as gram_ops

    x, decay, sens, ell = _real_gram(1024)
    model = simm.ExactSIMM(num_genes=50, canonical_rows=True)
    params = simm.init_params(50, dtype=jnp.float32)._replace(
        decay=decay, sensitivity=sens, lengthscale=ell
    )

    @jax.jit
    def run(x):
        K = model.gram(params, x, "xx")
        ref = gram_ops.gram(x, decay, sens, ell)
        return (
            jnp.max(jnp.abs(K - K.T)),
            jnp.max(jnp.abs(K - ref)),
            jnp.max(jnp.abs(ref)),
        )

    asym, err, scale = (float(v) for v in run(x))
    assert asym == 0.0
    assert err < 1e-3 * max(scale, 1.0), (err, scale)
