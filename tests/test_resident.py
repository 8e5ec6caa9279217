"""VMEM-resident 1-D recurrence kernel (ops/kernels/resident.py) vs
independent dense oracles, in interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from exponentialutilities_jl_tpu import StencilOperator
from exponentialutilities_jl_tpu.ops.kernels.resident import (
    RESIDENT_MAX_N, _layout_1d, _resident_call, recurrence_apply_resident,
    resident_supported)


def _dense_1d(n, offsets, coeffs):
    A = np.zeros((n, n))
    for o, c in zip(offsets, coeffs):
        for i in range(n):
            if 0 <= i + o < n:
                A[i, i + o] = c
    return A


def _oracle(A, b, rows, scale=1.0):
    wp = np.zeros_like(b)
    wc = scale * b
    w = np.zeros_like(b)
    for ca, cb, cc, cw in np.asarray(rows, np.float64):
        w = w + cw * wc
        wp, wc = wc, ca * (A @ wc) + cb * wc + cc * wp
    return w


def _run(n, offsets, coeffs, m, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    b = rng.standard_normal(n).astype(np.float32)
    rows = rng.standard_normal((m, 4)).astype(np.float32) * 0.5
    op = StencilOperator((n,), tuple((o,) for o in offsets),
                         jnp.asarray(coeffs, jnp.float32))
    w = np.asarray(recurrence_apply_resident(op, b, rows,
                                             scale=scale,
                                             interpret=True))
    A = _dense_1d(n, offsets, coeffs)
    ref = _oracle(A, b.astype(np.float64), rows, scale)
    assert w.shape == (n,)
    scale_ref = max(np.abs(ref).max(), 1e-30)
    np.testing.assert_allclose(w, ref, atol=3e-5 * scale_ref, rtol=3e-5)


def test_three_point_laplacian():
    _run(700, (-1, 0, 1), (1.0, -2.0, 1.0), 8)


def test_unaligned_n_dirichlet_tail():
    # n far from a multiple of 1024: pad-tail cells must stay zero and
    # never leak back through the ± shifts
    _run(1025, (-1, 0, 1), (0.3, -1.0, 0.7), 12)


def test_wide_offsets_cross_row():
    # |o| > 128 exercises the two-row-shift decomposition
    _run(2000, (-129, -1, 0, 1, 129), (0.2, 0.4, -1.5, 0.4, 0.2), 6)


def test_lane_aligned_offsets():
    # o ≡ 0 (mod 128): pure row-shift branch
    _run(1500, (-128, 0, 128), (0.5, -1.0, 0.5), 5)


def test_asymmetric_stencil():
    _run(900, (0, 1, 3), (-1.0, 0.8, 0.1), 7)


def test_fori_path_m_large():
    # m > unroll cap exercises the in-kernel fori_loop with dynamic
    # SMEM row reads
    _run(600, (-1, 0, 1), (1.0, -2.0, 1.0), 60)


def test_scale_and_norm_output():
    n = 800
    rng = np.random.default_rng(3)
    b = rng.standard_normal(n).astype(np.float32)
    rows = rng.standard_normal((5, 4)).astype(np.float32) * 0.5
    offsets = (-1, 0, 1)
    coeffs = (1.0, -2.0, 1.0)
    R, mask = _layout_1d(n)
    Xp = jnp.pad(jnp.asarray(b), (0, R * 128 - n)).reshape(R, 128)
    Wp, nrm2 = _resident_call(Xp, jnp.asarray(mask), jnp.asarray(rows),
                              jnp.asarray(coeffs, jnp.float32),
                              0.25, offsets=offsets, interpret=True)
    w = np.asarray(Wp).reshape(-1)[:n]
    ref = _oracle(_dense_1d(n, offsets, coeffs), b.astype(np.float64),
                  rows, 0.25)
    np.testing.assert_allclose(w, ref, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(nrm2), float(ref @ ref), rtol=1e-4)
    # pad tail of the padded output is exactly zero (chainable input)
    assert not np.asarray(Wp).reshape(-1)[n:].any()


def test_chebyshev_rows_match_scan():
    # the resident Chebyshev rows reproduce the scan apply exactly
    from exponentialutilities_jl_tpu.models.chebyshev import (
        _chebyshev_apply_resident, _chebyshev_apply_scan, _exp_ucoeffs)

    n, t = 1111, 0.4
    op = StencilOperator((n,), ((-1,), (0,), (1,)),
                         jnp.asarray([1.0, -2.0, 1.0], jnp.float32),
                         is_hermitian=True)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    lo, hi = -4.0, 0.0
    c, h = 0.5 * (hi + lo), 0.5 * (hi - lo)
    cnp, scale = _exp_ucoeffs(t * h, 1e-7)
    cheb = jnp.asarray(cnp * np.exp(t * c + scale), jnp.float32)
    w_res = np.asarray(_chebyshev_apply_resident(op, b, cheb, c, h,
                                                 interpret=True))
    w_scan = np.asarray(_chebyshev_apply_scan(op, b, cheb, c, 1.0 / h))
    np.testing.assert_allclose(w_res, w_scan, atol=2e-6, rtol=2e-5)


def test_supported_guards():
    ok = StencilOperator((100,), ((-1,), (0,), (1,)),
                         jnp.asarray([1.0, -2.0, 1.0]))
    assert resident_supported(ok)
    too_big = StencilOperator((RESIDENT_MAX_N + 1,), ((0,),),
                              jnp.asarray([1.0]))
    assert not resident_supported(too_big)
    two_d = StencilOperator((8, 8), ((0, 0),), jnp.asarray([1.0]))
    assert not resident_supported(two_d)
    with pytest.raises(ValueError):
        recurrence_apply_resident(two_d, jnp.ones(64),
                                  jnp.zeros((3, 4)))


def test_recurrence_engine_selection():
    # dispatch.recurrence_engine picks resident (1-D), plane sweep
    # (3-D), tiled (giant 3-D), None (auto on CPU / fused=False)
    from exponentialutilities_jl_tpu import laplacian_nd_stencil
    from exponentialutilities_jl_tpu.ops.kernels.dispatch import (
        recurrence_engine)
    from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
        recurrence_apply_fused)
    from exponentialutilities_jl_tpu.ops.kernels.resident import (
        recurrence_apply_resident, recurrence_apply_resident_grid)
    from exponentialutilities_jl_tpu.ops.kernels.tiled import (
        recurrence_apply_fused_tiled)

    op1 = StencilOperator((500,), ((-1,), (0,), (1,)),
                          jnp.asarray([1.0, -2.0, 1.0], jnp.float32))
    small3 = laplacian_nd_stencil(16, 16, 16, dtype=jnp.float32)
    op3 = laplacian_nd_stencil(128, 128, 128, dtype=jnp.float32)
    giant = laplacian_nd_stencil(608, 608, 608, dtype=jnp.float32)

    assert recurrence_engine(op1, jnp.float32, True) \
        is recurrence_apply_resident
    assert recurrence_engine(small3, jnp.float32, True) \
        is recurrence_apply_resident_grid
    assert recurrence_engine(op3, jnp.float32, True) \
        is recurrence_apply_fused
    assert recurrence_engine(giant, jnp.float32, True) \
        is recurrence_apply_fused_tiled
    # auto on a CPU backend → scan path
    assert recurrence_engine(op3, jnp.float32, None) is None
    assert recurrence_engine(op3, jnp.float32, False) is None
    with pytest.raises(ValueError):
        recurrence_engine(object(), jnp.float32, True)


class TestResidentLanczos:
    """One-dispatch pass-1 Lanczos + two-dispatch two-pass expv."""

    def _op(self, n):
        return StencilOperator((n,), ((-1,), (0,), (1,)),
                               jnp.asarray([1.0, -2.0, 1.0], jnp.float32),
                               is_hermitian=True)

    def test_coeffs_match_xla_lanczos(self):
        from exponentialutilities_jl_tpu.ops.krylov import lanczos_coeffs
        from exponentialutilities_jl_tpu.ops.kernels.resident import (
            lanczos_coeffs_resident)
        n, m = 900, 12
        op = self._op(n)
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        a_r, b_r, beta0_r, mu_r, _ = lanczos_coeffs_resident(
            op, b, m, interpret=True)
        a_x, b_x, beta0_x, mu_x, _ = lanczos_coeffs(op, b, m)
        np.testing.assert_allclose(np.asarray(a_r), np.asarray(a_x),
                                   atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(b_r), np.asarray(b_x),
                                   atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(float(beta0_r), float(beta0_x),
                                   rtol=1e-6)
        assert int(mu_r) == int(mu_x)

    def test_two_pass_vs_scipy(self):
        import scipy.sparse as sp
        from scipy.sparse.linalg import expm_multiply
        from exponentialutilities_jl_tpu.ops.kernels.resident import (
            expv_two_pass_resident)
        n, m, t = 1200, 30, 0.4
        op = self._op(n)
        rng = np.random.default_rng(1)
        b_host = rng.standard_normal(n)
        b = jnp.asarray(b_host, jnp.float32)
        w = np.asarray(expv_two_pass_resident(op, b, t, m,
                                              interpret=True))
        A = sp.diags([np.ones(n - 1), -2 * np.ones(n), np.ones(n - 1)],
                     [-1, 0, 1], format="csr")
        want = expm_multiply(t * A, b_host)
        assert (np.linalg.norm(w - want) / np.linalg.norm(want)) < 2e-5

    def test_breakdown_eigvector_input(self):
        # b = exact eigenvector of the 1-D Laplacian → breakdown at
        # step 1; result must still be exp(t*lambda)*b
        from exponentialutilities_jl_tpu.ops.kernels.resident import (
            expv_two_pass_resident)
        n, t = 300, 0.3
        op = self._op(n)
        k = 3
        x = np.sin(np.pi * k * np.arange(1, n + 1) / (n + 1))
        lam = -4 * np.sin(np.pi * k / (2 * (n + 1))) ** 2
        w = np.asarray(expv_two_pass_resident(
            op, jnp.asarray(x, jnp.float32), t, 10, interpret=True))
        want = np.exp(t * lam) * x
        assert (np.linalg.norm(w - want) / np.linalg.norm(want)) < 1e-5

    def test_zero_b(self):
        from exponentialutilities_jl_tpu.ops.kernels.resident import (
            expv_two_pass_resident)
        w = np.asarray(expv_two_pass_resident(
            self._op(200), jnp.zeros(200, jnp.float32), 0.5, 8,
            interpret=True))
        assert not w.any()

    def test_fori_path(self):
        from exponentialutilities_jl_tpu.ops.kernels.resident import (
            expv_two_pass_resident)
        import scipy.sparse as sp
        from scipy.sparse.linalg import expm_multiply
        n, m, t = 700, 60, 0.2         # m > unroll cap
        op = self._op(n)
        rng = np.random.default_rng(2)
        b_host = rng.standard_normal(n)
        w = np.asarray(expv_two_pass_resident(
            op, jnp.asarray(b_host, jnp.float32), t, m, interpret=True))
        A = sp.diags([np.ones(n - 1), -2 * np.ones(n), np.ones(n - 1)],
                     [-1, 0, 1], format="csr")
        want = expm_multiply(t * A, b_host)
        assert (np.linalg.norm(w - want) / np.linalg.norm(want)) < 2e-5


def test_multi_column_matches_single(rng):
    # W[:, j] from the multi kernel equals p independent single passes
    from exponentialutilities_jl_tpu.ops.kernels.resident import (
        recurrence_apply_resident, recurrence_apply_resident_multi)
    n, m, p = 777, 9, 3
    op = StencilOperator((n,), ((-1,), (0,), (1,)),
                         jnp.asarray([1.0, -2.0, 1.0], jnp.float32))
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    rows3 = jnp.asarray(rng.standard_normal((m, 3)) * 0.4, jnp.float32)
    cw = jnp.asarray(rng.standard_normal((m, p)), jnp.float32)
    rows4 = jnp.concatenate([rows3, jnp.zeros((m, 1), jnp.float32)], 1)
    W = np.asarray(recurrence_apply_resident_multi(op, b, rows4, cw,
                                                   interpret=True))
    assert W.shape == (n, p)
    for j in range(p):
        rj = rows4.at[:, 3].set(cw[:, j])
        wj = np.asarray(recurrence_apply_resident(op, b, rj,
                                                  interpret=True))
        np.testing.assert_allclose(W[:, j], wj, atol=1e-6, rtol=1e-5)


def test_phiv_chebyshev_multi_column_path(rng):
    # the public phiv_chebyshev path through the multi-column apply
    # (forced via _chebyshev_apply_resident_multi in interpret mode)
    from exponentialutilities_jl_tpu.models.chebyshev import (
        _chebyshev_apply_resident_multi, _chebyshev_apply_scan,
        _fun_ucoeffs, _phi_scalar_np)
    n, t, k = 600, 0.3, 2
    op = StencilOperator((n,), ((-1,), (0,), (1,)),
                         jnp.asarray([1.0, -2.0, 1.0], jnp.float32),
                         is_hermitian=True)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    lo, hi = -4.0, 0.0
    c, h = 0.5 * (hi + lo), 0.5 * (hi - lo)
    C = _fun_ucoeffs(lambda x: _phi_scalar_np(t * (c + h * x), k),
                     1e-8, 512)                          # (m, k+1)
    Cj = jnp.asarray(C, jnp.float32)
    W_res = np.asarray(_chebyshev_apply_resident_multi(op, b, Cj, c, h,
                                                       interpret=True))
    W_scan = np.asarray(_chebyshev_apply_scan(op, b, Cj, c, 1.0 / h))
    np.testing.assert_allclose(W_res, W_scan,
                               atol=3e-6 * np.abs(W_scan).max(),
                               rtol=1e-4)


class TestResidentGrid:
    """Whole-grid resident engine for small 2-D/3-D grids."""

    def _check(self, op, m=6, seed=0, tol=3e-5):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            recurrence_apply_fused)
        from exponentialutilities_jl_tpu.ops.kernels.resident import (
            recurrence_apply_resident_grid)
        rng = np.random.default_rng(seed)
        b = jnp.asarray(rng.standard_normal(op.shape[0]), jnp.float32)
        rows = jnp.asarray(rng.standard_normal((m, 4)) * 0.3, jnp.float32)
        w_g = np.asarray(recurrence_apply_resident_grid(op, b, rows,
                                                        interpret=True))
        w_f = np.asarray(recurrence_apply_fused(op, b, rows,
                                                interpret=True))
        scale = max(np.abs(w_f).max(), 1e-30)
        np.testing.assert_allclose(w_g, w_f, atol=tol * scale, rtol=1e-4)

    def test_3d_laplacian(self):
        from exponentialutilities_jl_tpu import laplacian_nd_stencil
        self._check(laplacian_nd_stencil(8, 10, 12, dtype=jnp.float32))

    def test_2d_9pt(self, rng):
        import itertools
        offs = list(itertools.product((-1, 0, 1), repeat=2))
        cs = rng.standard_normal(len(offs)) * 0.3
        op = StencilOperator((40, 130), tuple(offs),
                             jnp.asarray(cs, jnp.float32))
        self._check(op)

    def test_3d_27pt_asym(self, rng):
        import itertools
        offs = list(itertools.product((-1, 0, 1), repeat=3))
        cs = rng.standard_normal(len(offs)) * 0.15
        op = StencilOperator((6, 9, 140), tuple(offs),
                             jnp.asarray(cs, jnp.float32))
        self._check(op)

    def test_wide_dz(self, rng):
        offs = [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (2, 0, 0), (-2, 0, 0),
                (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
        cs = [-4.0, 1.0, 1.0, 0.25, 0.25, 0.8, 0.8, 0.6, 0.6]
        op = StencilOperator((7, 10, 20), tuple(offs),
                             jnp.asarray(cs, jnp.float32))
        self._check(op)

    def test_too_big_rejected(self):
        from exponentialutilities_jl_tpu import laplacian_nd_stencil
        from exponentialutilities_jl_tpu.ops.kernels.resident import (
            resident_grid_supported)
        assert not resident_grid_supported(
            laplacian_nd_stencil(64, 64, 200, dtype=jnp.float32))
        assert not resident_grid_supported(
            laplacian_nd_stencil(100, dtype=jnp.float32))  # 1-D → other


def test_grid_plan_rejects_deep_dz():
    # review r5 #2: |dz| >= nz must be rejected (0-size concat on real
    # hardware), not crash at apply time
    from exponentialutilities_jl_tpu.ops.kernels.resident import (
        resident_grid_supported)
    bad = StencilOperator((3, 8, 20), ((4, 0, 0), (0, 0, 0)),
                          jnp.asarray([1.0, -2.0], jnp.float32))
    assert not resident_grid_supported(bad)
    edge = StencilOperator((3, 8, 20), ((3, 0, 0), (0, 0, 0)),
                           jnp.asarray([1.0, -2.0], jnp.float32))
    assert not resident_grid_supported(edge)
    ok = StencilOperator((3, 8, 20), ((2, 0, 0), (0, 0, 0)),
                         jnp.asarray([1.0, -2.0], jnp.float32))
    assert resident_grid_supported(ok)


def test_nw_combination_multi_column_equivalence(rng):
    # the phiv_timestep_chebyshev resident route: Σ_j multi(b_j, C[:,:,j])
    # equals the stacked-column combination scan
    from exponentialutilities_jl_tpu.models.chebyshev import (
        _chebyshev_combination_scan, _fun_ucoeffs, _phi_scalar_np)
    from exponentialutilities_jl_tpu.ops.kernels.dispatch import (
        chebyshev_rows)
    from exponentialutilities_jl_tpu.ops.kernels.resident import (
        recurrence_apply_resident_multi)

    n, p = 500, 2
    ts = np.asarray([0.1, 0.25])
    op = StencilOperator((n,), ((-1,), (0,), (1,)),
                         jnp.asarray([1.0, -2.0, 1.0], jnp.float32),
                         is_hermitian=True)
    B = jnp.asarray(rng.standard_normal((n, p + 1)), jnp.float32)
    lo, hi = -4.0, 0.0
    c, h = 0.5 * (hi + lo), 0.5 * (hi - lo)

    def f(x):
        out = []
        for t in ts:
            vals = _phi_scalar_np(t * (c + h * x), p)
            out.append(vals * (t ** np.arange(p + 1))[:, None])
        return np.concatenate(out, axis=0)

    C = _fun_ucoeffs(f, 1e-8, 512).reshape(-1, len(ts), p + 1)
    Cj = jnp.asarray(C, jnp.float32)
    rows = chebyshev_rows(jnp.zeros((len(C),), jnp.float32), c, h,
                          jnp.float32)
    U = None
    for j in range(p + 1):
        Uj = recurrence_apply_resident_multi(op, B[:, j], rows,
                                             Cj[:, :, j], interpret=True)
        U = Uj if U is None else U + Uj
    W = _chebyshev_combination_scan(op, B.T, Cj, c, 1.0 / h, len(C))
    np.testing.assert_allclose(np.asarray(U), np.asarray(W.T),
                               atol=3e-6 * float(jnp.abs(W).max()),
                               rtol=1e-4)


def test_phiv_two_pass_resident_vs_xla(rng):
    from exponentialutilities_jl_tpu.models.phiv import _phiv_two_pass
    from exponentialutilities_jl_tpu.ops.kernels.resident import (
        phiv_two_pass_resident)
    n, m, k, t = 900, 20, 2, 0.3
    op = StencilOperator((n,), ((-1,), (0,), (1,)),
                         jnp.asarray([1.0, -2.0, 1.0], jnp.float32),
                         is_hermitian=True)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    w_r, err_r = phiv_two_pass_resident(op, b, t, m, k, interpret=True)
    w_x, err_x = _phiv_two_pass(op, b, jnp.float32(t), m, k)
    assert w_r.shape == (n, k + 1)
    np.testing.assert_allclose(np.asarray(w_r), np.asarray(w_x),
                               atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(float(err_r), float(err_x), rtol=1e-2,
                               atol=1e-7)


class TestResidentBanded:
    def test_matches_banded_matvec_recurrence(self, rng):
        from exponentialutilities_jl_tpu import BandedOperator
        from exponentialutilities_jl_tpu.ops.kernels.resident import (
            recurrence_apply_resident_banded)
        n, k, m = 900, 5, 7
        offsets = (-30, -1, 0, 1, 30)
        diags = rng.standard_normal((k, n)).astype(np.float32) * 0.4
        op = BandedOperator(jnp.asarray(diags), offsets)
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        rows = jnp.asarray(rng.standard_normal((m, 4)) * 0.4, jnp.float32)
        w = np.asarray(recurrence_apply_resident_banded(op, b, rows,
                                                        interpret=True))
        # XLA-recurrence oracle using the operator's own matvec
        wp = np.zeros(n); wc = np.asarray(b, np.float64)
        acc = np.zeros(n)
        rn = np.asarray(rows, np.float64)
        for ca, cb, cc, cw in rn:
            z = np.asarray(op.matvec(jnp.asarray(wc, jnp.float32)),
                           np.float64)
            acc = acc + cw * wc
            wp, wc = wc, ca * z + cb * wc + cc * wp
        scale = max(np.abs(acc).max(), 1e-30)
        np.testing.assert_allclose(w, acc, atol=5e-5 * scale, rtol=1e-3)

    def test_poisson2d_banded_chebyshev(self, rng):
        # a 2-D grid in banded storage (validity baked into the diags)
        import scipy.linalg as sla
        from exponentialutilities_jl_tpu import poisson_2d
        from exponentialutilities_jl_tpu.ops.kernels.dispatch import (
            chebyshev_rows)
        from exponentialutilities_jl_tpu.models.chebyshev import (
            _exp_ucoeffs)
        from exponentialutilities_jl_tpu.ops.kernels.resident import (
            recurrence_apply_resident_banded)
        op = poisson_2d(16, 12)
        op = type(op)(op.diags.astype(jnp.float32), op.offsets,
                      is_hermitian=True)
        n = 192
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        lo, hi = -8.0, 0.0
        c, h = 0.5 * (hi + lo), 0.5 * (hi - lo)
        cnp, scale = _exp_ucoeffs(0.1 * h, 1e-8)
        cheb = jnp.asarray(cnp * np.exp(0.1 * c + scale), jnp.float32)
        rows = chebyshev_rows(cheb, c, h, jnp.float32)
        w = np.asarray(recurrence_apply_resident_banded(op, b, rows,
                                                        interpret=True))
        cols = [np.asarray(op.matvec(jnp.eye(n, dtype=jnp.float32)[:, j]),
                           np.float64) for j in range(n)]
        D = np.stack(cols, 1)
        want = sla.expm(0.1 * D) @ np.asarray(b, np.float64)
        assert (np.linalg.norm(w - want) / np.linalg.norm(want)) < 1e-4

    def test_gate(self):
        from exponentialutilities_jl_tpu import BandedOperator, poisson_2d
        from exponentialutilities_jl_tpu.ops.kernels.resident import (
            resident_banded_supported)
        assert resident_banded_supported(poisson_2d(16, 12))
        big = BandedOperator(jnp.zeros((9, 3_000_000), jnp.float32),
                             tuple(range(-4, 5)))
        assert not resident_banded_supported(big)
