"""Pallas-kernel-vs-XLA-reference numerical tests (interpret mode on CPU).

The Pallas kernels must reproduce the vectorised XLA ops (`ops.gram`,
`jnp.linalg.cholesky`) that are themselves tested against the reference
math — so these are second-level parity tests: same algebra, hand-tiled.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dis_project_tpu.ops import gram as gram_ops
from dis_project_tpu.ops import pallas_cholesky as pc
from dis_project_tpu.ops import pallas_gram as pg

RNG = np.random.default_rng(42)


def _rows(n, G=5, flag=None):
    t = RNG.uniform(0, 12, n)
    g = RNG.integers(0, G, n)
    f = RNG.integers(0, 2, n) if flag is None else np.full(n, flag)
    return jnp.asarray(np.stack([t, g, f], axis=1))


def _params(G=5):
    return (
        jnp.asarray(RNG.uniform(0.2, 1.0, G)),
        jnp.asarray(RNG.uniform(0.5, 1.5, G)),
        jnp.asarray(2.5),
    )


class TestErfApprox:
    def test_matches_reference_erf(self):
        x = jnp.linspace(-6, 6, 4001)
        err = jnp.abs(pg.erf_approx(x) - jnp.asarray(np_erf(x)))
        assert float(err.max()) < 2e-7

    def test_odd_and_limits(self):
        x = jnp.asarray([0.0, 1e4, -1e4])
        v = pg.erf_approx(x)
        assert float(v[0]) == 0.0
        assert float(v[1]) == pytest.approx(1.0)
        assert float(v[2]) == pytest.approx(-1.0)


def np_erf(x):
    from scipy.special import erf as serf  # scipy ships with the env

    return serf(np.asarray(x))


@pytest.mark.parametrize("kind,flags", [("mixed", None), ("xx", 1), ("ff", 0)])
def test_pallas_cross_covariance_matches_xla(kind, flags):
    decay, sens, ell = _params()
    x1, x2 = _rows(70, flag=flags), _rows(90, flag=flags)
    ref = gram_ops.cross_covariance(x1, x2, decay, sens, ell)
    out = pg.cross_covariance(
        x1, x2, decay, sens, ell, kind=kind, interpret=True, tile_m=32, tile_n=128
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_pallas_xf_kind():
    decay, sens, ell = _params()
    x1, x2 = _rows(40, flag=1), _rows(50, flag=0)
    ref = gram_ops.cross_covariance(x1, x2, decay, sens, ell)
    out = pg.cross_covariance(
        x1, x2, decay, sens, ell, kind="xf", interpret=True, tile_m=32, tile_n=128
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)
    # and the transpose orientation
    ref_t = gram_ops.cross_covariance(x2, x1, decay, sens, ell)
    out_t = pg.cross_covariance(
        x2, x1, decay, sens, ell, kind="fx", interpret=True, tile_m=32, tile_n=128
    )
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t), atol=5e-5)


@pytest.mark.parametrize(
    "kind,f1,f2", [("xx", 1, 1), ("ff", 0, 0), ("xf", 1, 0), ("fx", 0, 1)]
)
def test_cross_covariance_kind_matches_mixed(kind, f1, f2):
    """Branch-specialised closed form == flag-weighted combination whenever
    the flags match the declared kind (values AND parameter gradients —
    this is the AD route of the Pallas kernels' backward pass)."""
    import jax

    decay, sens, ell = _params()
    x1, x2 = _rows(40, flag=f1), _rows(50, flag=f2)
    ref = gram_ops.cross_covariance(x1, x2, decay, sens, ell)
    out = gram_ops.cross_covariance_kind(x1, x2, decay, sens, ell, kind)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)

    def loss(fn):
        def inner(d, s, l):
            K = fn(x1, x2, d, s, l)
            return jnp.sum(K * jnp.cos(K))

        return inner

    g_ref = jax.grad(loss(gram_ops.cross_covariance), argnums=(0, 1, 2))(
        decay, sens, ell
    )
    g_kind = jax.grad(
        loss(lambda *a: gram_ops.cross_covariance_kind(*a, kind)),
        argnums=(0, 1, 2),
    )(decay, sens, ell)
    for a, b in zip(g_kind, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10,
                                   atol=1e-12)


def test_pallas_gram_differentiable():
    """pallas_call has no AD rule; the custom VJP must route gradients
    through the XLA closed forms — parity with differentiating the XLA
    implementation directly."""
    import jax

    decay, sens, ell = _params()
    x = _rows(40, flag=1)

    def loss_pallas(d, s, l):
        K = pg.gram(x, d, s, l, kind="xx", interpret=True, tile_m=32, tile_n=128)
        return jnp.sum(K * jnp.cos(K))

    def loss_xla(d, s, l):
        K = gram_ops.gram(x, d, s, l)
        return jnp.sum(K * jnp.cos(K))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(decay, sens, ell)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(decay, sens, ell)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


@pytest.mark.parametrize("kind,flags,n", [("mixed", None, 35), ("xx", 1, 70),
                                          ("ff", 0, 40), ("xx", 1, 64)])
def test_gram_sym_matches_dense(kind, flags, n):
    """Lower-triangle symmetric kernel == dense Pallas kernel (same erf)."""
    decay, sens, ell = _params()
    x = _rows(n, flag=flags)
    dense = pg.gram(x, decay, sens, ell, kind=kind, interpret=True,
                    tile_m=32, tile_n=32)
    sym = pg.gram_sym(x, decay, sens, ell, kind=kind, interpret=True, tile=32)
    np.testing.assert_allclose(np.asarray(sym), np.asarray(dense), atol=2e-6)
    # mirrored writes produce an exactly-symmetric matrix
    np.testing.assert_allclose(np.asarray(sym), np.asarray(sym.T), atol=0)
    ref = gram_ops.gram(x, decay, sens, ell)
    np.testing.assert_allclose(np.asarray(sym), np.asarray(ref), atol=5e-5)


def test_gram_dispatch_falls_back_under_vmap(monkeypatch):
    """r2 regression: the symmetric Gram kernel (manual-DMA output) has no
    Pallas vmap lowering on TPU, so vmapped ensemble fits crashed at
    compile. Batched calls must take the vmap-safe XLA/dense route — here
    simulated on CPU by forcing the TPU dispatch predicate."""
    import jax

    from dis_project_tpu.models import simm

    monkeypatch.setattr(simm, "_on_tpu", lambda: True)
    # Shrink the dense-kernel window so the batched fallback resolves to
    # XLA at a CPU-friendly size (the real window tops out at 6144).
    monkeypatch.setattr(simm.ExactSIMM, "PALLAS_GRAM_MAX_N", 512)
    n = 640
    decay, sens, ell = _params()
    x = jnp.asarray(
        np.stack([RNG.uniform(0, 12, n), RNG.integers(0, 5, n), np.ones(n)], 1),
        jnp.float32,
    )
    model = simm.ExactSIMM(num_genes=5)
    params = simm.init_params(5, dtype=jnp.float32)
    decays = jnp.stack([params.decay, params.decay * 1.1])
    out = jax.vmap(
        lambda d: model.gram(params._replace(decay=d), x, "xx")
    )(decays)
    ref = jax.vmap(
        lambda d: gram_ops.gram(x, d, params.sensitivity, params.lengthscale)
    )(decays)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gram_sym_differentiable():
    import jax

    decay, sens, ell = _params()
    x = _rows(40, flag=1)

    def loss_sym(d, s, l):
        K = pg.gram_sym(x, d, s, l, kind="xx", interpret=True, tile=32)
        return jnp.sum(K * jnp.cos(K))

    def loss_xla(d, s, l):
        K = gram_ops.gram(x, d, s, l)
        return jnp.sum(K * jnp.cos(K))

    gp = jax.grad(loss_sym, argnums=(0, 1, 2))(decay, sens, ell)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(decay, sens, ell)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


def test_pallas_gram_symmetric_psd():
    decay, sens, ell = _params()
    x = _rows(64, flag=1)
    K = pg.gram(x, decay, sens, ell, kind="xx", interpret=True, tile_m=32, tile_n=128)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K.T), atol=1e-12)
    # The A&S erf approximation (1.5e-7 abs, amplified by exp(gamma^2))
    # perturbs exact PSD-ness at the ~1e-5 level; consumers add jitter/noise
    # diagonals far above that (>= 1e-4 on the f32 perf path).
    w = np.linalg.eigvalsh(np.asarray(K))
    assert w.min() > -1e-4


class TestBlockedCholesky:
    def _spd(self, n, dtype=jnp.float64):
        A = RNG.standard_normal((n, n))
        A = A @ A.T + n * np.eye(n)
        return jnp.asarray(A, dtype)

    @pytest.mark.parametrize("n", [32, 100, 256, 300, 640])
    def test_matches_xla_cholesky(self, n):
        A = self._spd(n)
        Lref = jnp.linalg.cholesky(A)
        L = pc.blocked_cholesky(A, block=128, interpret=True)
        np.testing.assert_allclose(np.asarray(L), np.asarray(Lref), atol=1e-10)

    def test_real_gram_factor_and_inverse_f32(self):
        """Regression (r2): factorisation + triangular inverse on a REAL
        SIMM Gram (cond ~1e3), not a diagonally-dominant random SPD.

        Two real bugs hid behind well-conditioned test matrices: TPU's
        default single-pass-bf16 matmuls corrupted the Schur complements
        (NaN factor at N=1e4 — fixed by the module-wide 'high' precision
        pin, only observable on TPU), and the nilpotent-doubling leaf
        inverter diverges on real factors (|LiL-I| ~ 0.6 at N=3000 even on
        CPU — fixed by defaulting every leaf to exact substitution)."""
        import jax

        from dis_project_tpu.data import synthetic
        from dis_project_tpu.models import simm
        from dis_project_tpu.ops import gram as gram_ops

        scfg = synthetic.SyntheticConfig(
            num_genes=50, num_timepoints=30, num_replicates=1, noise_std=0.1
        )
        data = synthetic.sample_prior(jax.random.PRNGKey(0), scfg)
        t = jnp.asarray(data.timepoints, jnp.float32)
        params = simm.init_params(50, dtype=jnp.float32)
        K = gram_ops.gram_xx_blocked_fast(
            t, params.decay, params.sensitivity, params.lengthscale
        )
        n = K.shape[0]
        sigma = K + 1.0001 * jnp.eye(n, dtype=K.dtype)
        L = pc.blocked_cholesky(sigma)
        assert bool(jnp.all(jnp.isfinite(L)))
        np.testing.assert_allclose(
            np.asarray(jnp.tril(L) @ jnp.tril(L).T), np.asarray(sigma),
            atol=5e-5,
        )
        eye = np.eye(n, dtype=np.float32)
        for Li in (pc.tri_inv(L), pc.tri_inv_panels(L, panel=1024)):
            err = float(jnp.max(jnp.abs(Li @ L - eye)))
            assert err < 1e-4, err

    @pytest.mark.parametrize("n", [300, 512, 1000])
    def test_diag_inverse_reuse(self, n):
        """blocked_cholesky(return_diag_inv=True) + tri_inv_from_diag —
        the MLL-backward factor-reuse path — must agree with the plain
        factoriser and the standalone triangular inverse, including on
        identity-padded (non-multiple-of-block) sizes."""
        A = self._spd(n)
        L, dinvs = pc.blocked_cholesky(A, block=128, return_diag_inv=True)
        L2 = pc.blocked_cholesky(A, block=128)
        np.testing.assert_array_equal(np.asarray(L), np.asarray(L2))
        assert dinvs.shape == (-(-n // 128), 128, 128)
        Li = pc.tri_inv_from_diag(L, dinvs)
        ref = np.tril(np.linalg.inv(np.asarray(jnp.tril(L), np.float64)))
        np.testing.assert_allclose(np.asarray(Li), ref, atol=1e-9)
        t = pc.inv_from_factor_tril(L, diag_inv=dinvs)
        tref = np.tril(np.linalg.inv(np.asarray(A, np.float64)))
        np.testing.assert_allclose(np.asarray(t), tref, atol=1e-9)

    @pytest.mark.parametrize("sb", [3, 100, 200])
    def test_doubling_inverse_non_power_of_two(self, sb):
        """r2 review finding: the doubling step count only covered the
        nilpotent series for power-of-two sizes; other sizes returned a
        silently truncated (garbage) inverse."""
        A = self._spd(sb)
        Lb = jnp.linalg.cholesky(A)
        Li = pc._tri_inv_doubling(Lb)
        np.testing.assert_allclose(
            np.asarray(Li @ Lb), np.eye(sb), atol=1e-9
        )

    @pytest.mark.parametrize("n", [300, 1000, 1100])
    def test_tri_inv_awkward_sizes(self, n):
        """r2 review finding: tri_inv padded up to base*2^m (up to ~8x the
        FLOPs near a boundary); it now splits at the largest conforming
        size instead — exactness at non-conforming n, both leaves."""
        A = self._spd(n)
        Lb = jnp.linalg.cholesky(A)
        for leaf in ("solve", "doubling"):
            Li = pc.tri_inv(Lb, leaf=leaf)
            np.testing.assert_allclose(
                np.asarray(Li @ Lb), np.eye(n), atol=1e-8
            )

    def test_unblocked_pallas_kernel_f32(self):
        A = self._spd(96, jnp.float32)
        L = pc.chol_unblocked(A, interpret=True)
        np.testing.assert_allclose(
            np.asarray(L @ L.T), np.asarray(A), rtol=2e-5, atol=2e-4
        )
        assert float(jnp.abs(jnp.triu(L, 1)).max()) == 0.0

    def test_tri_inv(self):
        A = self._spd(200)
        L = jnp.linalg.cholesky(A)
        Li = pc.tri_inv(L)
        np.testing.assert_allclose(
            np.asarray(Li @ L), np.eye(200), atol=1e-10
        )

    def test_mvn_logpdf_blocked_impl_matches_xla(self):
        import jax

        from dis_project_tpu.ops import mll as mll_ops

        n = 300
        A = self._spd(n)
        y = jnp.asarray(RNG.standard_normal(n))
        mean = jnp.asarray(RNG.standard_normal(n))

        def f(impl):
            return lambda m, s: mll_ops.mvn_logpdf(y, m, s, impl=impl)

        v_x, g_x = jax.value_and_grad(f("xla"), argnums=(0, 1))(mean, A)
        v_b, g_b = jax.value_and_grad(f("blocked"), argnums=(0, 1))(mean, A)
        np.testing.assert_allclose(float(v_b), float(v_x), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g_b[0]), np.asarray(g_x[0]), atol=1e-10)
        # The sigma cotangent is defined up to symmetrization (the blocked
        # backward emits the mirror-free tril form, ops.mll._mvn_bwd):
        # compare sym parts, which is what any parameter gradient consumes.
        sb = np.asarray(g_b[1])
        sx = np.asarray(g_x[1])
        np.testing.assert_allclose(
            0.5 * (sb + sb.T), 0.5 * (sx + sx.T), atol=1e-10
        )

    def test_chol_inv_unblocked_f32(self):
        """One VMEM program returns both L and L^{-1} (f32, sub-blocked)."""
        A = self._spd(256, jnp.float32)
        L, Li = pc.chol_inv_unblocked(A, interpret=True)
        ref = np.linalg.cholesky(np.asarray(A, np.float64))
        np.testing.assert_allclose(np.asarray(L), ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(Li) @ np.asarray(L), np.eye(256), atol=5e-5
        )

    def test_blocked_cholesky_pallas_inv_diag(self):
        A = self._spd(640, jnp.float32)
        Lref = np.linalg.cholesky(np.asarray(A, np.float64))
        L = pc.blocked_cholesky(A, block=256, diag="pallas_inv", interpret=True)
        np.testing.assert_allclose(np.asarray(L), Lref, rtol=2e-4, atol=2e-4)

    def test_fused_cholesky_interpret(self):
        """Experimental manual-DMA kernels (v1 2-D grid, v2 1-D active-only
        grid) against the f64 factor; includes a non-multiple-of-quantum
        size to exercise the identity-tail padding."""
        from dis_project_tpu.ops import pallas_cholesky_fused as pcf

        for n, kw in ((1024, {}), (768, {})):
            A = self._spd(n, jnp.float32)
            ref = np.linalg.cholesky(np.asarray(A, np.float64))
            L1 = pcf.fused_cholesky(A, block=256, interpret=True, **kw)
            np.testing.assert_allclose(np.asarray(L1), ref, rtol=2e-3, atol=6e-3)
            L2 = pcf.fused_cholesky2(A, block=256, chunk=2, interpret=True)
            np.testing.assert_allclose(np.asarray(L2), ref, rtol=2e-3, atol=6e-3)
            assert float(np.abs(np.triu(np.asarray(L2), 1)).max()) == 0.0

    @pytest.mark.parametrize("n,tile", [(96, 32), (100, 32)])
    def test_syrk_ltl_matches_dense(self, n, tile):
        """Minimal-tile Pallas SYRK vs the f64 dense reference.

        Interpret mode loses the in-kernel split-bf16 3-pass precision
        (XLA:CPU jit accumulates the bf16 passes in bf16 — measured ~5e-3
        vs 1.4e-5 for the same kernel on v5e hardware), so the value
        tolerance here is bf16-class; the mirror symmetry and the tile
        enumeration (any missing (i, j, k) triple is an O(1) error) are
        exact either way."""
        L = np.tril(RNG.standard_normal((n, n))).astype(np.float32)
        L /= np.sqrt(n)
        np.fill_diagonal(L, np.abs(np.diagonal(L)) + 1.0)
        ref = L.astype(np.float64).T @ L.astype(np.float64)
        got = np.asarray(pc.syrk_ltl(jnp.asarray(L), tile=tile,
                                     interpret=True), np.float64)
        np.testing.assert_allclose(got, got.T, atol=0)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-2

    def test_blocked_solve_and_inverse(self):
        A = self._spd(300)
        L = jnp.linalg.cholesky(A)
        b = jnp.asarray(RNG.standard_normal((300, 4)))
        np.testing.assert_allclose(
            np.asarray(pc.blocked_chol_solve(L, b)),
            np.asarray(jnp.linalg.solve(A, b)),
            atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(pc.inv_from_factor(L)),
            np.asarray(jnp.linalg.inv(A)),
            atol=1e-10,
        )
        # Mirror-free variant: exact lower triangle of the same inverse.
        np.testing.assert_allclose(
            np.asarray(pc.inv_from_factor_tril(L)),
            np.tril(np.asarray(jnp.linalg.inv(A))),
            atol=1e-10,
        )

    def test_blocked_param_grads_invariant_to_cotangent_form(self):
        """End-to-end: hyperparameter gradients must be IDENTICAL between the
        xla and blocked impls (the tril-form sigma cotangent is equivalent
        under every symmetric Gram builder)."""
        import jax

        from dis_project_tpu.data.dataset import P53Data, dataset_3d
        from dis_project_tpu.models import simm
        from dis_project_tpu.ops import gram as gram_ops
        from dis_project_tpu.ops import mll as mll_ops

        data = P53Data(replicate=0, source="synthetic")
        X, y, _ = dataset_3d(data)
        y = y.reshape(-1)
        model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
        raw0 = simm.unconstrain(simm.init_params(5))

        def loss(raw, impl):
            p = simm.constrain(raw)
            K = gram_ops.gram(X, p.decay, p.sensitivity, p.lengthscale)
            sigma = mll_ops.add_diagonal(K, model.jitter + p.obs_stddev**2)
            mx = model.mean_function(p, X)
            return -mll_ops.mvn_logpdf(y, mx, sigma, impl=impl)

        g_x = jax.grad(loss)(raw0, "xla")
        g_b = jax.grad(loss)(raw0, "blocked")
        for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_b)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12
            )


class TestBatchedDispatch:
    """The public custom_vmap fallback (r3, replacing the jax._src
    BatchTracer sniff): under vmap — at any nesting, including through jit
    and grad — the Pallas Gram kernels rewrite to the XLA closed forms BY
    CONSTRUCTION, so a vmapped ``ExactSIMM.gram`` can never hit the
    non-vmappable manual-DMA symmetric kernel."""

    def test_vmapped_gram_takes_dense_path_by_construction(self):
        """``gram_impl='pallas'`` forces the Pallas kernel, which cannot
        lower on CPU (no interpret flag through the model API) — yet the
        vmapped call succeeds and matches the closed forms, proving the
        batch rule routed off Pallas before lowering."""
        import jax

        from dis_project_tpu.models import simm

        decay, sens, ell = _params()
        X = _rows(40, flag=1)
        model = simm.ExactSIMM(num_genes=5, gram_impl="pallas")
        params = simm.init_params(5)._replace(
            decay=decay, sensitivity=sens, lengthscale=ell
        )

        batched = jax.vmap(lambda p: model.gram(p, X, kind="xx"))(
            jax.tree.map(lambda a: jnp.stack([a, a + 0.01]), params)
        )
        ref0 = gram_ops.cross_covariance(X, X, decay, sens, ell)
        np.testing.assert_allclose(
            np.asarray(batched[0]), np.asarray(ref0), rtol=1e-12
        )
        assert batched.shape == (2, 40, 40)

    def test_vmap_of_jit_and_grad_compose(self):
        """The r2 sniff could not see vmap(jit(f)); the custom_vmap rule
        can — and it composes with the custom VJP."""
        import jax

        decay, sens, ell = _params()
        X = _rows(24, flag=1)

        def f(d):
            return jnp.sum(pg.gram_sym(X, d, sens, ell, kind="xx"))

        D = jnp.stack([decay, decay * 1.1])
        ref = jnp.stack(
            [jnp.sum(gram_ops.cross_covariance(X, X, d, sens, ell)) for d in D]
        )
        np.testing.assert_allclose(
            np.asarray(jax.vmap(jax.jit(f))(D)), np.asarray(ref), rtol=1e-12
        )
        g = jax.vmap(jax.grad(f))(D)
        g_ref = jnp.stack(
            [
                jax.grad(
                    lambda d: jnp.sum(
                        gram_ops.cross_covariance(X, X, d, sens, ell)
                    )
                )(d)
                for d in D
            ]
        )
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-9)

    def test_no_private_jax_imports(self):
        """Package-wide guard: no ``jax._src`` anywhere (VERDICT r2 #5)."""
        import pathlib
        import re

        # Imports or attribute uses only — prose mentions in docstrings
        # (e.g. the changelog note in pallas_gram) are fine.
        pat = re.compile(r"(from|import)\s+jax\._src|jax\._src\.")
        pkg = pathlib.Path(__file__).parent.parent / "dis_project_tpu"
        offenders = [
            p for p in pkg.rglob("*.py") if pat.search(p.read_text())
        ]
        assert offenders == [], f"private jax._src imports in: {offenders}"


class TestTransposedBlockedCholesky:
    """r3 factoriser: transposed-layout two-level left-looking blocked
    Cholesky (``blocked_cholesky_t``) — the op the f32 MLL hot path
    consumes."""

    @pytest.mark.parametrize("n,block,inner", [
        (256, None, 64), (300, None, 64), (512, 256, 64),
        (700, 256, 128), (1024, None, 128),
    ])
    def test_matches_xla_cholesky(self, n, block, inner):
        rng = np.random.default_rng(n)
        t = rng.uniform(0, 12, n)
        g = rng.integers(0, 5, n)
        x = jnp.asarray(np.stack([t, g, np.ones(n)], 1))
        decay = jnp.asarray(rng.uniform(0.2, 1.0, 5))
        sens = jnp.asarray(rng.uniform(0.5, 1.5, 5))
        A = gram_ops.gram(x, decay, sens, jnp.asarray(2.5))
        A = A + 1.0001 * jnp.eye(n, dtype=A.dtype)
        Lt = pc.blocked_cholesky_t(A, block=block, inner=inner)
        L_ref = jnp.linalg.cholesky(A)
        np.testing.assert_allclose(
            np.asarray(jnp.tril(Lt.T)), np.asarray(L_ref),
            rtol=1e-9, atol=1e-10,
        )

    def test_diag_inv_and_probe_eps(self):
        rng = np.random.default_rng(7)
        n, inner = 384, 128
        M = rng.standard_normal((n, n))
        A = jnp.asarray(M @ M.T + n * np.eye(n))
        Lt, dinvs = pc.blocked_cholesky_t(
            A, inner=inner, return_diag_inv=True, probe_eps=jnp.asarray(0.0)
        )
        assert dinvs.shape == (n // inner, inner, inner)
        L = jnp.tril(Lt.T)
        for k in range(n // inner):
            blk = L[k * inner:(k + 1) * inner, k * inner:(k + 1) * inner]
            np.testing.assert_allclose(
                np.asarray(dinvs[k] @ blk), np.eye(inner), atol=1e-8
            )
        # the probe hook is numerically negligible but dependency-creating
        Lt2 = pc.blocked_cholesky_t(A, inner=inner, probe_eps=jnp.asarray(1e-30))
        np.testing.assert_allclose(np.asarray(Lt2), np.asarray(Lt), rtol=0, atol=1e-12)

    def test_block_inner_divisibility_guard(self):
        A = jnp.eye(256)
        with pytest.raises(ValueError, match="multiple of"):
            pc.blocked_cholesky_t(A, block=300, inner=128)

    def test_f32_mll_blocked_path_value_and_grads(self):
        """The Lt-native blocked MLL (f32) must agree with the xla impl in
        value and in hyperparameter gradients at f32 tolerance."""
        import jax

        from dis_project_tpu.ops import mll as mll_ops

        rng = np.random.default_rng(3)
        n = 320
        t = rng.uniform(0, 12, n)
        g = rng.integers(0, 5, n)
        x = jnp.asarray(np.stack([t, g, np.ones(n)], 1), jnp.float32)
        y = jnp.asarray(rng.standard_normal(n), jnp.float32)
        decay0 = jnp.asarray(rng.uniform(0.2, 1.0, 5), jnp.float32)
        sens = jnp.asarray(rng.uniform(0.5, 1.5, 5), jnp.float32)

        def logp(decay, impl):
            K = gram_ops.cross_covariance(
                x, x, decay, sens, jnp.asarray(2.5, jnp.float32)
            )
            sigma = mll_ops.add_diagonal(K, jnp.asarray(1.01, jnp.float32))
            return mll_ops.mvn_logpdf(y, jnp.zeros_like(y), sigma, impl=impl)

        v_x, g_x = jax.value_and_grad(logp)(decay0, "xla")
        v_b, g_b = jax.value_and_grad(logp)(decay0, "blocked")
        np.testing.assert_allclose(float(v_b), float(v_x), rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(g_b), np.asarray(g_x), rtol=2e-4, atol=1e-4
        )
