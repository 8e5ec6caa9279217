"""Row-tiled fused sweeps (ops/kernels/tiled.py) vs the untiled fused
kernel and dense oracles, interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from exponentialutilities_jl_tpu import StencilOperator, laplacian_nd_stencil
from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
    recurrence_apply_fused)
from exponentialutilities_jl_tpu.ops.kernels.tiled import (
    TiledPlan, recurrence_apply_fused_tiled, tiled_plan_for)
from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
    _stencil_coeffs_static)


def _run_tiled(op, ky, m=5, perm=(0, 1, 2), seed=0):
    rng = np.random.default_rng(seed)
    n = op.shape[0]
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    rows = jnp.asarray(rng.standard_normal((m, 4)) * 0.3, jnp.float32)
    cs = _stencil_coeffs_static(op, hermitian=False)
    plan = TiledPlan(op.grid_shape, tuple(op.offsets), cs, ky, perm)
    w_t = np.asarray(recurrence_apply_fused_tiled(op, b, rows, plan=plan,
                                                  interpret=True))
    w_f = np.asarray(recurrence_apply_fused(op, b, rows, interpret=True))
    scale = max(np.abs(w_f).max(), 1e-30)
    np.testing.assert_allclose(w_t, w_f, atol=3e-6 * scale, rtol=1e-4)


def test_laplacian_7pt_2tiles():
    op = laplacian_nd_stencil(6, 24, 10, dtype=jnp.float32)
    _run_tiled(op, 2)


def test_partial_last_tile():
    # ny = 25, ky = 4 → tiles of 7/7/7/4 rows: pad rows + the partial
    # bottom ghost must stay clean
    op = laplacian_nd_stencil(5, 25, 10, dtype=jnp.float32)
    _run_tiled(op, 4)


def test_27pt_box_3tiles(rng):
    import itertools
    offs = list(itertools.product((-1, 0, 1), repeat=3))
    cs = rng.standard_normal(len(offs)) * 0.2
    op = StencilOperator((6, 21, 12), tuple(offs),
                         jnp.asarray(cs, jnp.float32))
    _run_tiled(op, 3)


def test_wide_dz_2tiles(rng):
    # |dz| = 2 (zb >= 2 slabs) with row tiling on top
    offs = [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (2, 0, 0), (-2, 0, 0),
            (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    cs = [-4.0, 1.0, 1.0, 0.25, 0.25, 0.8, 0.8, 0.6, 0.6]
    op = StencilOperator((8, 18, 10), tuple(offs),
                         jnp.asarray(cs, jnp.float32))
    _run_tiled(op, 2)


def test_asymmetric_stencil():
    op = StencilOperator(
        (6, 16, 10),
        ((0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
         (0, 0, 1), (0, 0, -1)),
        jnp.asarray([-6.0, 1.3, 0.7, 1.2, 0.8, 1.1, 0.9], jnp.float32))
    _run_tiled(op, 2)


def test_planner_rejects_wide_dy_everywhere():
    # |o| = 2 on every axis → no orientation has |dy| <= 1 → ValueError
    offs = [(0, 0, 0), (2, 0, 0), (-2, 0, 0), (0, 2, 0), (0, -2, 0),
            (0, 0, 2), (0, 0, -2)]
    op = StencilOperator((8, 8, 8), tuple(offs),
                         jnp.asarray([-6.0] + [1.0] * 6, jnp.float32))
    with pytest.raises(ValueError, match="dy"):
        tiled_plan_for(op)


def test_planner_giant_cube_feasible():
    # 608³ overflows the plane budget in EVERY orientation (S ≈ 3050)
    # but row-tiles cleanly — the VERDICT r4 #6 target class
    op = laplacian_nd_stencil(608, 608, 608, dtype=jnp.float32)
    from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
        ghost_grid_for)
    with pytest.raises(ValueError):
        ghost_grid_for(op)
    plan = tiled_plan_for(op, hermitian=True)
    assert plan.ky >= 2
    S = plan.gg.S
    assert S * max(1, max(abs(o[0]) for o in op.offsets)) <= 2900


def test_chebyshev_rows_equivalence():
    # the tiled Chebyshev apply matches the scan apply on a small grid
    from exponentialutilities_jl_tpu.models.chebyshev import (
        _chebyshev_apply_scan, _exp_ucoeffs)
    from exponentialutilities_jl_tpu.ops.kernels.tiled import (
        recurrence_apply_fused_tiled)
    op = laplacian_nd_stencil(6, 20, 10, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal(op.shape[0]), jnp.float32)
    lo, hi = op.spectral_bounds_hint()
    c, h = 0.5 * (hi + lo), 0.5 * (hi - lo)
    cnp, scale = _exp_ucoeffs(0.05 * h, 1e-7)
    cheb = jnp.asarray(cnp * np.exp(0.05 * c + scale), jnp.float32)
    m = len(cnp)
    rows = jnp.stack([jnp.full((m,), 2.0 / h, jnp.float32),
                      jnp.full((m,), -2.0 * c / h, jnp.float32),
                      jnp.full((m,), -1.0, jnp.float32),
                      cheb], axis=1)
    cs = _stencil_coeffs_static(op, hermitian=True)
    plan = TiledPlan(op.grid_shape, tuple(op.offsets), cs, 2, (0, 1, 2))
    w_t = np.asarray(recurrence_apply_fused_tiled(op, b, rows, plan=plan,
                                                  interpret=True))
    w_s = np.asarray(_chebyshev_apply_scan(op, b, cheb, c, 1.0 / h))
    np.testing.assert_allclose(w_t, w_s, atol=3e-6 * np.abs(w_s).max(),
                               rtol=1e-4)


class TestTiledLanczos:
    def test_coeffs_match_untiled(self, rng):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            lanczos_coeffs_fused)
        from exponentialutilities_jl_tpu.ops.kernels.tiled import (
            TiledPlan, lanczos_coeffs_fused_tiled)
        op = laplacian_nd_stencil(6, 24, 10, dtype=jnp.float32)
        cs = _stencil_coeffs_static(op, hermitian=True)
        plan = TiledPlan(op.grid_shape, tuple(op.offsets), cs, 3,
                         (0, 1, 2))
        b = jnp.asarray(rng.standard_normal(op.shape[0]), jnp.float32)
        a_t, b_t, beta0_t, mu_t, _ = lanczos_coeffs_fused_tiled(
            op, b, 10, plan=plan, interpret=True)
        a_u, b_u, beta0_u, mu_u, _ = lanczos_coeffs_fused(
            op, b, 10, interpret=True)
        np.testing.assert_allclose(np.asarray(a_t), np.asarray(a_u),
                                   atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(b_t), np.asarray(b_u),
                                   atol=1e-4, rtol=1e-3)
        assert int(mu_t) == int(mu_u)

    def test_two_pass_vs_scipy(self, rng):
        import scipy.linalg as sla
        from exponentialutilities_jl_tpu.ops.kernels.tiled import (
            TiledPlan, expv_two_pass_fused_tiled)
        op = laplacian_nd_stencil(5, 20, 10, dtype=jnp.float32)
        n = op.shape[0]
        cs = _stencil_coeffs_static(op, hermitian=True)
        plan = TiledPlan(op.grid_shape, tuple(op.offsets), cs, 4,
                         (0, 1, 2))
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        w = np.asarray(expv_two_pass_fused_tiled(op, b, 0.15, 25,
                                                 plan=plan,
                                                 interpret=True))
        cols = [np.asarray(op.matvec(jnp.eye(n, dtype=jnp.float64)[:, j]))
                for j in range(n)]
        D = np.stack(cols, axis=1)
        want = sla.expm(0.15 * D) @ np.asarray(b, np.float64)
        assert (np.linalg.norm(w - want) / np.linalg.norm(want)) < 5e-5

    def test_two_pass_partial_last_tile(self, rng):
        from exponentialutilities_jl_tpu.models.expv import _expv_two_pass
        from exponentialutilities_jl_tpu.ops.kernels.tiled import (
            TiledPlan, expv_two_pass_fused_tiled)
        op = laplacian_nd_stencil(5, 23, 10, dtype=jnp.float32)
        cs = _stencil_coeffs_static(op, hermitian=True)
        plan = TiledPlan(op.grid_shape, tuple(op.offsets), cs, 4,
                         (0, 1, 2))
        b = jnp.asarray(rng.standard_normal(op.shape[0]), jnp.float32)
        w_t = np.asarray(expv_two_pass_fused_tiled(op, b, 0.2, 20,
                                                   plan=plan,
                                                   interpret=True))
        w_x = np.asarray(_expv_two_pass(op, b, jnp.float32(0.2), 20))
        assert (np.linalg.norm(w_t - w_x) / np.linalg.norm(w_x)) < 5e-5
