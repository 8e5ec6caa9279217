"""Fused Lanczos-step kernel (ops/kernels/lanczos_fused.py) vs the
reference recurrence (VERDICT r1 item 7)."""

import numpy as np
import pytest
import jax.numpy as jnp

from exponentialutilities_jl_tpu import laplacian_nd_stencil
from exponentialutilities_jl_tpu.ops.krylov import lanczos_coeffs
from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
    GhostGrid, lanczos_coeffs_fused)


def test_ghost_roundtrip(rng):
    gg = GhostGrid(5, 6, 7)
    x = rng.standard_normal(gg.n).astype(np.float32)
    back = np.asarray(gg.from_ghost(gg.to_ghost(jnp.asarray(x))))
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("shape", [(6, 5, 7), (4, 4, 130)])
def test_fused_matches_reference(rng, shape):
    op = laplacian_nd_stencil(*shape, dtype=jnp.float32)
    n = shape[0] * shape[1] * shape[2]
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    m = 10
    a1, b1, beta0_1, mu1, br1 = lanczos_coeffs(op, b, m)
    a2, b2, beta0_2, mu2, br2 = lanczos_coeffs_fused(op, b, m,
                                                     interpret=True)
    scale = float(jnp.max(jnp.abs(a1)))
    assert float(jnp.max(jnp.abs(a1 - a2))) / scale < 1e-4
    assert float(jnp.max(jnp.abs(b1 - b2))) / scale < 1e-4
    assert abs(float(beta0_1) - float(beta0_2)) < 1e-4 * float(beta0_1)
    assert int(mu1) == int(mu2)


def test_fused_two_pass_expv(rng):
    # the fused coeffs drive the SAME downstream reduced problem: build a
    # tridiagonal from them and compare expv against the dense oracle
    import scipy.linalg as sla
    shape = (6, 6, 6)
    op = laplacian_nd_stencil(*shape, dtype=jnp.float32)
    n = 216
    b = rng.standard_normal(n).astype(np.float32)
    m = 20
    al, be, beta0, mu, br = lanczos_coeffs_fused(op, jnp.asarray(b), m,
                                                 interpret=True)
    T = (np.diag(np.asarray(al)) + np.diag(np.asarray(be)[:-1], 1)
         + np.diag(np.asarray(be)[:-1], -1))
    e1 = np.zeros(m); e1[0] = 1
    coeffs = float(beta0) * sla.expm(0.05 * T) @ e1
    from exponentialutilities_jl_tpu.ops.krylov import lanczos_replay
    w = np.asarray(lanczos_replay(op, jnp.asarray(b), jnp.asarray(
        coeffs.astype(np.float32)), al, be, m))
    A = np.asarray(op.to_banded().to_dense())
    want = sla.expm(0.05 * A) @ b
    assert np.linalg.norm(w - want) / np.linalg.norm(want) < 1e-5


def test_fused_rejects_unsupported(rng):
    from exponentialutilities_jl_tpu import laplacian_1d
    op1 = laplacian_1d(64)
    with pytest.raises(ValueError):
        lanczos_coeffs_fused(op1, jnp.ones(64), 4, interpret=True)


def test_fused_replay_two_pass_expv(rng):
    # full fused two-pass: coeffs pass + accumulating replay pass
    import scipy.linalg as sla
    from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
        lanczos_replay_fused)
    shape = (6, 6, 6)
    op = laplacian_nd_stencil(*shape, dtype=jnp.float32)
    n = 216
    b = rng.standard_normal(n).astype(np.float32)
    m = 20
    al, be, beta0, mu, br = lanczos_coeffs_fused(op, jnp.asarray(b), m,
                                                 interpret=True)
    T = (np.diag(np.asarray(al)) + np.diag(np.asarray(be)[:-1], 1)
         + np.diag(np.asarray(be)[:-1], -1))
    e1 = np.zeros(m); e1[0] = 1
    coeffs = float(beta0) * sla.expm(0.05 * T) @ e1
    w = np.asarray(lanczos_replay_fused(
        op, jnp.asarray(b), jnp.asarray(coeffs.astype(np.float32)),
        interpret=True))
    A = np.asarray(op.to_banded().to_dense())
    want = sla.expm(0.05 * A) @ b
    assert np.linalg.norm(w - want) / np.linalg.norm(want) < 1e-5


def test_stencil_matvec_fused(rng):
    from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
        stencil_matvec_fused)
    op = laplacian_nd_stencil(6, 5, 7, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal(210).astype(np.float32))
    y = np.asarray(stencil_matvec_fused(op, x, interpret=True))
    want = np.asarray(op.matvec(x))
    assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5


# ---- variable-coefficient (per-cell field) path ------------------------

def _var_op(rng, shape, dtype=np.float32):
    from exponentialutilities_jl_tpu import variable_diffusion_nd_stencil
    a = rng.uniform(0.5, 2.0, shape).astype(dtype)
    return variable_diffusion_nd_stencil(a)


def test_variable_operator_matches_dense(rng):
    op = _var_op(rng, (5, 6, 7), np.float64)
    D = np.asarray(op.to_banded().to_dense())
    np.testing.assert_allclose(D, D.T, atol=1e-14)   # symmetric FV build
    x = rng.standard_normal(210)
    np.testing.assert_allclose(np.asarray(op.matvec(jnp.asarray(x))),
                               D @ x, atol=1e-12)
    assert float(op.opnorm_hint()) >= np.abs(D).sum(1).max() - 1e-12


@pytest.mark.parametrize("shape", [(6, 5, 7), (4, 4, 130)])
def test_variable_fused_matches_reference(rng, shape):
    op = _var_op(rng, shape)
    n = shape[0] * shape[1] * shape[2]
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    m = 10
    a1, b1, beta0_1, mu1, br1 = lanczos_coeffs(op, b, m)
    a2, b2, beta0_2, mu2, br2 = lanczos_coeffs_fused(op, b, m,
                                                     interpret=True)
    scale = float(jnp.max(jnp.abs(a1)))
    assert float(jnp.max(jnp.abs(a1 - a2))) / scale < 1e-4
    assert float(jnp.max(jnp.abs(b1 - b2))) / scale < 1e-4
    assert int(mu1) == int(mu2)


def test_variable_matvec_fused(rng):
    from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
        stencil_matvec_fused)
    op = _var_op(rng, (6, 5, 7))
    x = jnp.asarray(rng.standard_normal(210).astype(np.float32))
    y = np.asarray(stencil_matvec_fused(op, x, interpret=True))
    want = np.asarray(op.matvec(x))
    assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5


def test_variable_fused_replay_two_pass_expv(rng):
    import scipy.linalg as sla
    from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
        lanczos_replay_fused)
    op = _var_op(rng, (6, 6, 6))
    n = 216
    b = rng.standard_normal(n).astype(np.float32)
    m = 20
    al, be, beta0, mu, br = lanczos_coeffs_fused(op, jnp.asarray(b), m,
                                                 interpret=True)
    T = (np.diag(np.asarray(al)) + np.diag(np.asarray(be)[:-1], 1)
         + np.diag(np.asarray(be)[:-1], -1))
    e1 = np.zeros(m); e1[0] = 1
    coeffs = float(beta0) * sla.expm(0.05 * T) @ e1
    w = np.asarray(lanczos_replay_fused(
        op, jnp.asarray(b), jnp.asarray(coeffs.astype(np.float32)),
        interpret=True))
    A = np.asarray(op.to_banded().to_dense())
    want = sla.expm(0.05 * A) @ b
    assert np.linalg.norm(w - want) / np.linalg.norm(want) < 1e-5


def test_variable_fused_rejects_nonhermitian(rng):
    from exponentialutilities_jl_tpu import VariableStencilOperator
    n = 4 * 4 * 4
    C = rng.standard_normal((2, n)).astype(np.float32)
    op = VariableStencilOperator((4, 4, 4),
                                 ((0, 0, 0), (0, 0, 1)), jnp.asarray(C),
                                 is_hermitian=False)
    with pytest.raises(ValueError):
        lanczos_coeffs_fused(op, jnp.ones(n, jnp.float32), 4,
                             interpret=True)


class TestAsymmetricFused:
    """Round-3: the fused sweep's constant path takes per-direction
    coefficients, so ASYMMETRIC 7-point stencils (advection–diffusion —
    the non-Hermitian drivers' domain) ride the same kernel
    (recurrence_apply_fused; VERDICT r2 next-round item 6)."""

    def _asym_op(self):
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        offsets = [(0, 0, 0), (0, 0, 1), (0, 0, -1), (0, 1, 0),
                   (0, -1, 0), (1, 0, 0), (-1, 0, 0)]
        coeffs = [-6.5, 1.0, 1.5, 1.0, 1.0, 0.9, 1.1]
        return StencilOperator((6, 5, 7), offsets,
                               jnp.asarray(coeffs, jnp.float32),
                               is_hermitian=False)

    def test_asymmetric_matvec(self, rng):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            stencil_matvec_fused)
        op = self._asym_op()
        x = jnp.asarray(rng.standard_normal(210).astype(np.float32))
        y = np.asarray(stencil_matvec_fused(op, x, interpret=True))
        want = np.asarray(op.matvec(x))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5

    def test_lanczos_still_rejects_asymmetric(self, rng):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            lanczos_coeffs_fused)
        with pytest.raises(ValueError, match="symmetric"):
            lanczos_coeffs_fused(self._asym_op(), jnp.ones(210), 4,
                                 interpret=True)

    def test_fused_newton_apply(self, rng):
        from exponentialutilities_jl_tpu.models.leja import (
            _apply_fused_newton, _leja_apply)
        op = self._asym_op()
        b = jnp.asarray(rng.standard_normal(210).astype(np.float32))
        m = 10
        xi = rng.standard_normal(m) * 0.3
        d = rng.standard_normal(m) * 0.5
        c, inv_s = -1.2, 0.21
        w = np.asarray(_apply_fused_newton(op, b, d, xi, c, inv_s, q=2,
                                           interpret=True))
        want = np.asarray(_leja_apply(
            op, b, jnp.asarray(d, jnp.float32),
            jnp.asarray(xi, jnp.float32), c, inv_s, m, 2))
        assert np.max(np.abs(w - want)) / np.max(np.abs(want)) < 1e-4

    def test_fused_newton_apply_matrix_coeffs(self, rng):
        from exponentialutilities_jl_tpu.models.leja import (
            _apply_fused_newton, _leja_apply)
        op = self._asym_op()
        b = jnp.asarray(rng.standard_normal(210).astype(np.float32))
        m, p = 8, 2
        xi = rng.standard_normal(m) * 0.3
        D = rng.standard_normal((m, p + 1)) * 0.5
        c, inv_s = -1.2, 0.21
        W = np.asarray(_apply_fused_newton(op, b, D, xi, c, inv_s, q=1,
                                           interpret=True))
        want = np.asarray(_leja_apply(
            op, b, jnp.asarray(D, jnp.float32),
            jnp.asarray(xi, jnp.float32), c, inv_s, m, 1))
        assert np.max(np.abs(W - want)) / np.max(np.abs(want)) < 1e-4

    def test_fused_faber_apply(self, rng):
        from exponentialutilities_jl_tpu.models.faber import (
            _apply_fused_faber, _faber_apply)
        op = self._asym_op()
        b = jnp.asarray(rng.standard_normal(210).astype(np.float32))
        m = 12
        a = rng.standard_normal(m) * 0.4
        c, inv_g, rho = -1.2, 0.21, 0.55
        w = np.asarray(_apply_fused_faber(op, b, a, c, inv_g, rho, q=2,
                                          interpret=True))
        want = np.asarray(_faber_apply(
            op, b, jnp.asarray(a, jnp.float32), c, inv_g, rho, m, 2))
        assert np.max(np.abs(w - want)) / np.max(np.abs(want)) < 1e-4

    def test_fused_nw_substep_matches_scan(self, rng):
        from exponentialutilities_jl_tpu.models.leja import (
            _nw_fused_substep, _nw_leja_scan)
        op = self._asym_op()
        n, m, p = 210, 8, 2
        u = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        B = jnp.asarray(rng.standard_normal((n, p + 1)).astype(np.float32))
        xi = rng.standard_normal(m) * 0.3
        D = rng.standard_normal((m, p + 1)) * 0.5
        c, inv_s, tau = -1.2, 0.21, 0.3
        w = np.asarray(_nw_fused_substep(op, u, B, 0.7, D, xi, c, inv_s,
                                         p, interpret=True))
        want = np.asarray(_nw_leja_scan(
            op, u, B, jnp.asarray(D, jnp.float32),
            jnp.asarray(xi, jnp.float32), c, inv_s,
            jnp.asarray(0.7), jnp.asarray(tau), p=p, m=m, q=1))
        assert np.max(np.abs(w - want)) / np.max(np.abs(want)) < 1e-4


class Test2DSlabSweep:
    """2-D slab mode (GhostGrid2D, round-3 STATUS gap #2): planes are
    y-slabs; cross-slab coupling = masked boundary shifts of the
    neighbour plane riding the cy± coefficients."""

    def _op5(self, ny, nx, coeffs=(4.0, -1.0, -1.0, -1.0, -1.0),
             hermitian=True):
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        return StencilOperator(
            (ny, nx), [(0, 0), (0, 1), (0, -1), (1, 0), (-1, 0)],
            jnp.asarray(coeffs, jnp.float32), is_hermitian=hermitian)

    def test_ghost2d_roundtrip_partial_slab(self, rng):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            GhostGrid2D)
        gg = GhostGrid2D(37, 150, ys=8)       # nz=5, last slab 5 rows
        assert gg.nz == 5 and gg.P == 2
        x = rng.standard_normal(gg.n).astype(np.float32)
        back = np.asarray(gg.from_ghost(gg.to_ghost(jnp.asarray(x))))
        np.testing.assert_array_equal(back, x)

    def test_grid_eq_type_strict(self):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            GhostGrid2D)
        g3 = GhostGrid(3, 8, 150)
        g2 = GhostGrid2D(24, 150, ys=8)        # same (nz, ny, nx) triple
        assert g3 != g2 and g2 != g3
        assert g2 == GhostGrid2D(24, 150, ys=8)

    @pytest.mark.parametrize("ny,nx,ys", [(37, 150, 8), (16, 40, 16),
                                          (9, 260, 1), (64, 130, None)])
    def test_matvec_2d(self, rng, ny, nx, ys):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            GhostGrid2D, fused_lanczos_step, _stencil_coeffs_static)
        op = self._op5(ny, nx)
        x = jnp.asarray(rng.standard_normal(ny * nx), jnp.float32)
        gg = GhostGrid2D(ny, nx, ys=ys)
        c7 = _stencil_coeffs_static(op, hermitian=False)
        zeros = jnp.zeros((gg.nz, gg.rows_per_plane, 128), jnp.float32)
        Xg = gg.to_ghost(x)
        _, Zn, _, _ = fused_lanczos_step(
            Xg, zeros, zeros, (1.0, 0.0, 0.0), jnp.asarray(gg.xmask()),
            grid_desc=gg, coeffs_static=c7, interpret=True)
        y = np.asarray(gg.from_ghost(Zn))
        want = np.asarray(op.matvec(x))
        assert np.max(np.abs(y - want)) <= 1e-5 * max(np.max(np.abs(want)),
                                                      1.0)

    def test_asymmetric_matvec_2d(self, rng):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            stencil_matvec_fused)
        op = self._op5(37, 150, coeffs=(4.0, -1.3, -0.7, -1.6, -0.4),
                       hermitian=False)
        x = jnp.asarray(rng.standard_normal(37 * 150), jnp.float32)
        y = np.asarray(stencil_matvec_fused(op, x, interpret=True))
        want = np.asarray(op.matvec(x))
        assert np.max(np.abs(y - want)) < 1e-5 * np.max(np.abs(want)) + 1e-6

    def test_lanczos_coeffs_2d(self, rng):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            lanczos_coeffs_fused)
        op = laplacian_nd_stencil(33, 140, dtype=jnp.float32)
        b = jnp.asarray(rng.standard_normal(33 * 140), jnp.float32)
        m = 10
        a1, b1, beta0_1, mu1, _ = lanczos_coeffs(op, b, m)
        a2, b2, beta0_2, mu2, _ = lanczos_coeffs_fused(op, b, m,
                                                       interpret=True)
        scale = float(jnp.max(jnp.abs(a1)))
        assert float(jnp.max(jnp.abs(a1 - a2))) / scale < 1e-4
        assert float(jnp.max(jnp.abs(b1 - b2))) / scale < 1e-4
        assert int(mu1) == int(mu2)

    def test_replay_2d(self, rng):
        from exponentialutilities_jl_tpu.ops.krylov import lanczos_replay
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            lanczos_replay_fused)
        op = laplacian_nd_stencil(29, 70, dtype=jnp.float32)
        n = 29 * 70
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        co = jnp.asarray(rng.standard_normal(10), jnp.float32)
        al, be, _, _, _ = lanczos_coeffs(op, b, 10)
        w1 = np.asarray(lanczos_replay_fused(op, b, co, interpret=True))
        w2 = np.asarray(lanczos_replay(op, b, co, al, be, 10))
        assert np.max(np.abs(w1 - w2)) / np.max(np.abs(w2)) < 1e-4

    def test_recurrence_apply_2d(self, rng):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            recurrence_apply_fused)
        op = self._op5(37, 150, coeffs=(4.0, -1.3, -0.7, -1.6, -0.4),
                       hermitian=False)
        b = rng.standard_normal(37 * 150).astype(np.float32)
        rows = (rng.standard_normal((6, 4)) / 3).astype(np.float32)
        wf = np.asarray(recurrence_apply_fused(op, jnp.asarray(b),
                                               jnp.asarray(rows),
                                               interpret=True))
        om_p = np.zeros_like(b)
        om = b.copy()
        w = np.zeros_like(b)
        for ca, cb, cc, cw in rows:
            w = w + cw * om
            om, om_p = (ca * np.asarray(op.matvec(jnp.asarray(om)))
                        + cb * om + cc * om_p), om
        assert np.max(np.abs(wf - w)) / np.max(np.abs(w)) < 1e-4

    def test_variable_2d_matvec(self, rng):
        from exponentialutilities_jl_tpu.ops.stencil import (
            VariableStencilOperator)
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            stencil_matvec_fused)
        ny, nx = 37, 150
        offs = [(0, 0), (0, 1), (0, -1), (1, 0), (-1, 0)]
        fields = [jnp.asarray(rng.standard_normal(ny * nx), jnp.float32)
                  for _ in offs]
        vop = VariableStencilOperator((ny, nx), offs, fields)
        x = jnp.asarray(rng.standard_normal(ny * nx), jnp.float32)
        y = np.asarray(stencil_matvec_fused(vop, x, interpret=True))
        want = np.asarray(vop.matvec(x))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5

    def test_variable_2d_matvec_multislab(self, rng):
        # ny=300 > ys=238 (ghost_grid_for's variable-2-D default at
        # nx=150), so the masked cross-slab boundary terms (bnd_p/bnd_m
        # riding the cy± coefficient planes) are actually exercised —
        # the ny=37 test above collapses to a single slab (ADVICE r3).
        from exponentialutilities_jl_tpu.ops.stencil import (
            VariableStencilOperator)
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            ghost_grid_for, stencil_matvec_fused)
        ny, nx = 300, 150
        offs = [(0, 0), (0, 1), (0, -1), (1, 0), (-1, 0)]
        fields = [jnp.asarray(rng.standard_normal(ny * nx), jnp.float32)
                  for _ in offs]
        vop = VariableStencilOperator((ny, nx), offs, fields)
        assert ghost_grid_for(vop).nslabs > 1   # guard the premise
        x = jnp.asarray(rng.standard_normal(ny * nx), jnp.float32)
        y = np.asarray(stencil_matvec_fused(vop, x, interpret=True))
        want = np.asarray(vop.matvec(x))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5

    def test_chebyshev_apply_2d_fused(self, rng):
        from exponentialutilities_jl_tpu.models.chebyshev import (
            _chebyshev_apply_fused, _chebyshev_apply_scan)
        op = laplacian_nd_stencil(33, 140, dtype=jnp.float32)
        b = jnp.asarray(rng.standard_normal(33 * 140), jnp.float32)
        co = jnp.asarray(rng.standard_normal(12) / 5, jnp.float32)
        lo, hi = op.spectral_bounds_hint()
        c, h = 0.5 * (hi + lo), 0.5 * (hi - lo)
        wf = np.asarray(_chebyshev_apply_fused(op, b, co, c, h,
                                               interpret=True))
        ws = np.asarray(_chebyshev_apply_scan(op, b, co, c, 1.0 / h))
        assert np.max(np.abs(wf - ws)) / np.max(np.abs(ws)) < 1e-4


class TestBoxStencilsAndSlabs:
    """Round-3 late: 27-point/9-point box stencils through the constant
    sweep, and z-slabbed 3-D planes (zb layers per pallas step) with
    masked boundary coupling."""

    def _matvec_via(self, gg, op, x):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            fused_lanczos_step, _stencil_coeffs_static)
        c = _stencil_coeffs_static(op, hermitian=False)
        mask = jnp.asarray(gg.xmask())
        Xg = gg.to_ghost(jnp.asarray(x))
        zeros = jnp.zeros_like(Xg)
        _, Zn, _, _ = fused_lanczos_step(Xg, zeros, zeros,
                                         (1.0, 0.0, 0.0), mask,
                                         grid_desc=gg, coeffs_static=c,
                                         interpret=True)
        return np.asarray(gg.from_ghost(Zn))

    def test_ghost_roundtrip_zb_partial(self, rng):
        gg = GhostGrid(11, 9, 140, zb=4)      # 3 slabs, last holds 3
        assert gg.nslabs == 3 and gg.rows_per_plane == gg.S * 4
        x = rng.standard_normal(gg.n).astype(np.float32)
        back = np.asarray(gg.from_ghost(gg.to_ghost(jnp.asarray(x))))
        np.testing.assert_array_equal(back, x)

    @pytest.mark.parametrize("zb", [1, 3, 4])
    def test_7pt_asym_matvec_zslab(self, rng, zb):
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        shape = (11, 9, 140)
        op = StencilOperator(
            shape, [(0, 0, 0), (0, 0, 1), (0, 0, -1), (0, 1, 0),
                    (0, -1, 0), (1, 0, 0), (-1, 0, 0)],
            jnp.asarray((rng.standard_normal(7) / 3), jnp.float32))
        x = rng.standard_normal(np.prod(shape)).astype(np.float32)
        y = self._matvec_via(GhostGrid(*shape, zb=zb), op, x)
        want = np.asarray(op.matvec(jnp.asarray(x)))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5

    def test_27pt_matvec(self, rng):
        import itertools
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        shape = (12, 9, 140)
        offs = list(itertools.product((-1, 0, 1), repeat=3))
        op = StencilOperator(
            shape, offs,
            jnp.asarray((rng.standard_normal(27) / 9), jnp.float32))
        x = rng.standard_normal(np.prod(shape)).astype(np.float32)
        y = self._matvec_via(GhostGrid(*shape, zb=3), op, x)
        want = np.asarray(op.matvec(jnp.asarray(x)))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5

    def test_9pt_2d_matvec(self, rng):
        import itertools
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            GhostGrid2D)
        ny, nx = 37, 150
        offs = list(itertools.product((-1, 0, 1), repeat=2))
        op = StencilOperator(
            (ny, nx), offs,
            jnp.asarray((rng.standard_normal(9) / 3), jnp.float32))
        x = rng.standard_normal(ny * nx).astype(np.float32)
        y = self._matvec_via(GhostGrid2D(ny, nx, ys=8), op, x)
        want = np.asarray(op.matvec(jnp.asarray(x)))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5

    def test_27pt_symmetric_lanczos(self, rng):
        import itertools
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            lanczos_coeffs_fused)
        shape = (10, 9, 140)
        cmap = {}
        for o in itertools.product((-1, 0, 1), repeat=3):
            mo = tuple(-v for v in o)
            cmap[o] = cmap.get(mo, float(rng.standard_normal() / 9))
        op = StencilOperator(shape, list(cmap),
                             jnp.asarray(list(cmap.values()), jnp.float32),
                             is_hermitian=True)
        b = jnp.asarray(rng.standard_normal(np.prod(shape)), jnp.float32)
        a1, b1, _, mu1, _ = lanczos_coeffs(op, b, 8)
        a2, b2, _, mu2, _ = lanczos_coeffs_fused(op, b, 8, interpret=True)
        scale = float(jnp.max(jnp.abs(a1)))
        assert float(jnp.max(jnp.abs(a1 - a2))) / scale < 1e-4
        assert float(jnp.max(jnp.abs(b1 - b2))) / scale < 1e-4

    def test_third_neighbour_now_supported(self, rng):
        # |o| = 3 used to be rejected at coeff extraction; it now rides
        # the generalized sweep (TestThirdNeighbourOffsets covers the
        # numerics — this pins the dispatch accepting it)
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            _fused_dispatch, ghost_grid_for)
        op = StencilOperator((8, 130), [(0, 0), (0, 3)],
                             jnp.asarray([1.0, 1.0], jnp.float32))
        cs, _ = _fused_dispatch(op, hermitian=False)
        assert ((0, 0, 3), 1.0) in cs
        assert ghost_grid_for(op).nxp - 130 >= 3

    def test_replay_zslab(self, rng):
        from exponentialutilities_jl_tpu.ops.krylov import lanczos_replay
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            lanczos_replay_fused)
        op = laplacian_nd_stencil(11, 9, 60, dtype=jnp.float32)
        n = 11 * 9 * 60
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        co = jnp.asarray(rng.standard_normal(8), jnp.float32)
        al, be, _, _, _ = lanczos_coeffs(op, b, 8)
        w1 = np.asarray(lanczos_replay_fused(op, b, co, interpret=True))
        w2 = np.asarray(lanczos_replay(op, b, co, al, be, 8))
        assert np.max(np.abs(w1 - w2)) / np.max(np.abs(w2)) < 1e-4


class TestWideOffsets:
    """Second-neighbour (|o| = 2) offsets through the fused sweep
    (VERDICT r3 #4): wide 4th-order FD stencils (13-point) ride the
    flagship kernel via two-layer boundary masks on the same 3-plane
    ring (sources stay within adjacent slabs when L >= 2; ghost_grid_for
    arranges zb >= 2 automatically)."""

    @staticmethod
    def _wide13(shape, rng, symmetric=False):
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        offs = [(0, 0, 0)]
        for ax in range(3):
            for o in (1, -1, 2, -2):
                off = [0, 0, 0]
                off[ax] = o
                offs.append(tuple(off))
        co = rng.standard_normal(len(offs)).astype(np.float32) / 4
        if symmetric:
            cmap = dict(zip(offs, co))
            for off in offs:
                mo = tuple(-v for v in off)
                cmap[off] = cmap[mo] = cmap[mo]
            co = np.asarray([cmap[o] for o in offs], np.float32)
        return StencilOperator(shape, offs, jnp.asarray(co),
                               is_hermitian=symmetric)

    def _matvec_via(self, gg, op, x):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            fused_lanczos_step, _stencil_coeffs_static)
        c = _stencil_coeffs_static(op, hermitian=False)
        mask = jnp.asarray(gg.xmask())
        Xg = gg.to_ghost(jnp.asarray(x))
        zeros = jnp.zeros_like(Xg)
        _, Zn, _, _ = fused_lanczos_step(Xg, zeros, zeros,
                                         (1.0, 0.0, 0.0), mask,
                                         grid_desc=gg, coeffs_static=c,
                                         interpret=True)
        return np.asarray(gg.from_ghost(Zn))

    @pytest.mark.parametrize("zb", [2, 3, 12])
    def test_13pt_matvec(self, rng, zb):
        shape = (12, 9, 140)
        op = self._wide13(shape, rng)
        x = rng.standard_normal(np.prod(shape)).astype(np.float32)
        y = self._matvec_via(GhostGrid(*shape, zb=zb), op, x)
        want = np.asarray(op.matvec(jnp.asarray(x)))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5

    def test_125pt_box_matvec(self, rng):
        import itertools
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        offs = list(itertools.product((-2, -1, 0, 1, 2), repeat=3))
        co = (rng.standard_normal(len(offs)) / 25).astype(np.float32)
        op = StencilOperator((10, 8, 130), offs, jnp.asarray(co))
        x = rng.standard_normal(10 * 8 * 130).astype(np.float32)
        y = self._matvec_via(GhostGrid(10, 8, 130, zb=3), op, x)
        want = np.asarray(op.matvec(jnp.asarray(x)))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 2e-5

    def test_25pt_2d_matvec(self, rng):
        import itertools
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            GhostGrid2D)
        ny, nx = 61, 140
        offs = list(itertools.product((-2, -1, 0, 1, 2), repeat=2))
        co = (rng.standard_normal(len(offs)) / 8).astype(np.float32)
        op = StencilOperator((ny, nx), offs, jnp.asarray(co))
        x = rng.standard_normal(ny * nx).astype(np.float32)
        y = self._matvec_via(GhostGrid2D(ny, nx, ys=8), op, x)
        want = np.asarray(op.matvec(jnp.asarray(x)))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 2e-5

    def test_ghost_grid_for_picks_multilayer(self, rng):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            ghost_grid_for, stencil_matvec_fused)
        op = self._wide13((12, 9, 140), rng)
        gg = ghost_grid_for(op)
        assert gg.zb >= 2
        x = rng.standard_normal(12 * 9 * 140).astype(np.float32)
        y = np.asarray(stencil_matvec_fused(op, jnp.asarray(x),
                                            interpret=True))
        want = np.asarray(op.matvec(jnp.asarray(x)))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5

    def test_single_layer_slab_raises(self, rng):
        op = self._wide13((12, 9, 140), rng)
        x = rng.standard_normal(12 * 9 * 140).astype(np.float32)
        with pytest.raises(ValueError, match="layers"):
            self._matvec_via(GhostGrid(12, 9, 140, zb=1), op, x)

    def test_pad_lane_guard(self, rng):
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        op = StencilOperator((8, 8, 127), [(0, 0, 2), (0, 0, 0)],
                             jnp.asarray([1.0, 2.0], jnp.float32))
        x = rng.standard_normal(8 * 8 * 127).astype(np.float32)
        with pytest.raises(ValueError, match="pad lanes"):
            self._matvec_via(GhostGrid(8, 8, 127, zb=2), op, x)

    def test_wide_symmetric_lanczos(self, rng):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            lanczos_coeffs_fused)
        op = self._wide13((10, 9, 140), rng, symmetric=True)
        b = jnp.asarray(rng.standard_normal(10 * 9 * 140), jnp.float32)
        a1, b1, _, mu1, _ = lanczos_coeffs(op, b, 8)
        a2, b2, _, mu2, _ = lanczos_coeffs_fused(op, b, 8, interpret=True)
        scale = float(jnp.max(jnp.abs(a1)))
        assert float(jnp.max(jnp.abs(a1 - a2))) / scale < 1e-4
        assert float(jnp.max(jnp.abs(b1 - b2))) / scale < 1e-4

    def test_wide_chebyshev_recurrence(self, rng):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            recurrence_apply_fused)
        op = self._wide13((10, 9, 140), rng)
        b = rng.standard_normal(10 * 9 * 140).astype(np.float32)
        rows = (rng.standard_normal((6, 4)) / 3).astype(np.float32)
        wf = np.asarray(recurrence_apply_fused(op, jnp.asarray(b),
                                               jnp.asarray(rows),
                                               interpret=True))
        om_p = np.zeros_like(b)
        om = b.copy()
        w = np.zeros_like(b)
        for ca, cb, cc, cw in rows:
            w = w + cw * om
            om, om_p = (ca * np.asarray(op.matvec(jnp.asarray(om)))
                        + cb * om + cc * om_p), om
        assert np.max(np.abs(wf - w)) / np.max(np.abs(w)) < 1e-4


class TestThirdNeighbourOffsets:
    """Arbitrary per-axis offsets (round-4 gap closure): the slab-axis
    boundary band generalizes to |ds| <= L, |dy| > 2 rides extra zero
    pad rows (GhostGrid ypad), |dx| > 1 extra pad lanes (xpad) —
    6th-order 19-point FD stars and beyond run the flagship sweep.
    ghost_grid_for sizes all three from the operator's offsets."""

    @staticmethod
    def _star(shape, rng, reach=3, symmetric=False):
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        nd = len(shape)
        offs = [(0,) * nd]
        for ax in range(nd):
            for o in range(1, reach + 1):
                for s in (o, -o):
                    off = [0] * nd
                    off[ax] = s
                    offs.append(tuple(off))
        co = rng.standard_normal(len(offs)).astype(np.float32) / 6
        if symmetric:
            cmap = dict(zip(offs, co))
            for off in offs:
                cmap[off] = cmap[tuple(-v for v in off)]
            co = np.asarray([cmap[o] for o in offs], np.float32)
        return StencilOperator(shape, offs, jnp.asarray(co),
                               is_hermitian=symmetric)

    def _matvec_via(self, gg, op, x):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            fused_lanczos_step, _stencil_coeffs_static)
        c = _stencil_coeffs_static(op, hermitian=False)
        mask = jnp.asarray(gg.xmask())
        Xg = gg.to_ghost(jnp.asarray(x))
        zeros = jnp.zeros_like(Xg)
        _, Zn, _, _ = fused_lanczos_step(Xg, zeros, zeros,
                                         (1.0, 0.0, 0.0), mask,
                                         grid_desc=gg, coeffs_static=c,
                                         interpret=True)
        return np.asarray(gg.from_ghost(Zn))

    def test_19pt_6th_order_star_3d(self, rng):
        # |o| = 3 on every axis: dz=3 boundary bands, dy=3 pad rows,
        # dx=3 pad lanes, all sized by ghost_grid_for
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            ghost_grid_for)
        shape = (13, 9, 140)
        op = self._star(shape, rng, reach=3)
        gg = ghost_grid_for(op)
        assert gg.zb >= 3 and gg.ypad >= 3 and gg.nxp - gg.nx >= 3
        x = rng.standard_normal(np.prod(shape)).astype(np.float32)
        y = self._matvec_via(gg, op, x)
        want = np.asarray(op.matvec(jnp.asarray(x)))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 2e-5

    @pytest.mark.parametrize("zb", [3, 4, 13])
    def test_star_3d_any_slabbing(self, rng, zb):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            GhostGrid)
        shape = (13, 9, 140)
        op = self._star(shape, rng, reach=3)
        gg = GhostGrid(*shape, zb=zb, ypad=3, xpad=3)
        x = rng.standard_normal(np.prod(shape)).astype(np.float32)
        y = self._matvec_via(gg, op, x)
        want = np.asarray(op.matvec(jnp.asarray(x)))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 2e-5

    def test_star_2d(self, rng):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            ghost_grid_for)
        ny, nx = 37, 140
        op = self._star((ny, nx), rng, reach=3)
        gg = ghost_grid_for(op)
        x = rng.standard_normal(ny * nx).astype(np.float32)
        y = self._matvec_via(gg, op, x)
        want = np.asarray(op.matvec(jnp.asarray(x)))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 2e-5

    def test_auto_pad_piece_for_tight_nx(self, rng):
        # nx = 127 leaves one pad lane at P=1; a |dx| = 2 offset now
        # gets a second 128-lane piece automatically instead of falling
        # back to scan (the round-4 gate rejected this case)
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            ghost_grid_for, stencil_matvec_fused)
        from exponentialutilities_jl_tpu.models.leja import _fused_poly_ok
        op = StencilOperator((8, 8, 127), [(0, 0, 2), (0, 0, 0)],
                             jnp.asarray([1.0, 2.0], jnp.float32))
        gg = ghost_grid_for(op)
        assert gg.P == 2 and gg.nxp - gg.nx >= 2
        x = rng.standard_normal(8 * 8 * 127).astype(np.float32)
        y = np.asarray(stencil_matvec_fused(op, jnp.asarray(x),
                                            interpret=True))
        want = np.asarray(op.matvec(jnp.asarray(x)))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5

    def test_wide_symmetric_lanczos_3rd(self, rng):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            lanczos_coeffs_fused)
        op = self._star((10, 9, 140), rng, reach=3, symmetric=True)
        b = jnp.asarray(rng.standard_normal(10 * 9 * 140), jnp.float32)
        a1, b1, _, _, _ = lanczos_coeffs(op, b, 8)
        a2, b2, _, _, _ = lanczos_coeffs_fused(op, b, 8, interpret=True)
        scale = float(jnp.max(jnp.abs(a1)))
        assert float(jnp.max(jnp.abs(a1 - a2))) / scale < 1e-4
        assert float(jnp.max(jnp.abs(b1 - b2))) / scale < 1e-4

    def test_ypad_guard_without_ghost_grid_for(self, rng):
        # a manually-built GhostGrid without ypad must be rejected for
        # |dy| = 3 (the shift would leak into the neighbour layer)
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            GhostGrid)
        # ny = 14, P = 2: (ny+2)·P = 32 rows is already a multiple of 8,
        # so the default layout has NO spare pad rows and |dy| = 3 leaks
        # (a geometry where round-to-8 happens to leave enough zero rows
        # is correctly accepted — the check is exact, not conservative)
        op = self._star((10, 14, 140), rng, reach=3)
        x = rng.standard_normal(10 * 14 * 140).astype(np.float32)
        with pytest.raises(ValueError, match="ypad"):
            self._matvec_via(GhostGrid(10, 14, 140, zb=3, xpad=3), op, x)


class TestVariableBoxStencils:
    """Round-4 gap closure: the variable-coefficient sweep now covers
    ANY box stencil (the constant path's generalized coupling geometry
    with per-cell coefficient planes streamed per slot), not just
    7/5-point. The coefficient stream is (nz, C, R, 128) in the
    operator's offset order."""

    @staticmethod
    def _vop(shape, offs, rng):
        from exponentialutilities_jl_tpu.ops.stencil import (
            VariableStencilOperator)
        n = int(np.prod(shape))
        fields = [jnp.asarray(rng.standard_normal(n), jnp.float32)
                  for _ in offs]
        return VariableStencilOperator(shape, offs, fields)

    def test_variable_9pt_2d_matvec(self, rng):
        import itertools
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            stencil_matvec_fused)
        ny, nx = 61, 150
        offs = list(itertools.product((-1, 0, 1), repeat=2))
        vop = self._vop((ny, nx), offs, rng)
        x = jnp.asarray(rng.standard_normal(ny * nx), jnp.float32)
        y = np.asarray(stencil_matvec_fused(vop, x, interpret=True))
        want = np.asarray(vop.matvec(x))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 2e-5

    def test_variable_27pt_3d_matvec(self, rng):
        import itertools
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            ghost_grid_for, stencil_matvec_fused)
        shape = (9, 8, 140)
        offs = list(itertools.product((-1, 0, 1), repeat=3))
        vop = self._vop(shape, offs, rng)
        # the variable planner grows zb toward the pipeline sweet spot
        # (ADVICE r4 #1) — this small grid fits in one slab entirely
        assert ghost_grid_for(vop).zb == shape[0]
        x = jnp.asarray(rng.standard_normal(int(np.prod(shape))),
                        jnp.float32)
        y = np.asarray(stencil_matvec_fused(vop, x, interpret=True))
        want = np.asarray(vop.matvec(x))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 2e-5

    def test_variable_wide_13pt_3d_matvec(self, rng):
        # |dz| = 2 variable offsets: zb = 2 slabs, coefficient planes
        # slab-stacked by to_ghost, boundary bands ride per-cell fields
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            ghost_grid_for, stencil_matvec_fused)
        shape = (12, 9, 140)
        offs = [(0, 0, 0)]
        for ax in range(3):
            for o in (1, -1, 2, -2):
                off = [0, 0, 0]
                off[ax] = o
                offs.append(tuple(off))
        vop = self._vop(shape, offs, rng)
        gg = ghost_grid_for(vop)
        assert gg.zb >= 2 and gg.nxp - gg.nx >= 2
        x = jnp.asarray(rng.standard_normal(int(np.prod(shape))),
                        jnp.float32)
        y = np.asarray(stencil_matvec_fused(vop, x, interpret=True))
        want = np.asarray(vop.matvec(x))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 2e-5

    def test_variable_9pt_2d_multislab_recurrence(self, rng):
        import itertools
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            ghost_grid_for, recurrence_apply_fused)
        ny, nx = 300, 150
        offs = list(itertools.product((-1, 0, 1), repeat=2))
        vop = self._vop((ny, nx), offs, rng)
        # scale down so the 6-step recurrence stays O(1)
        vop.coeff_fields = vop.coeff_fields / 8.0
        assert ghost_grid_for(vop).nslabs > 1   # cross-slab bands live
        b = rng.standard_normal(ny * nx).astype(np.float32)
        rows = (rng.standard_normal((6, 4)) / 3).astype(np.float32)
        wf = np.asarray(recurrence_apply_fused(vop, jnp.asarray(b),
                                               jnp.asarray(rows),
                                               interpret=True))
        om_p = np.zeros_like(b)
        om = b.copy()
        w = np.zeros_like(b)
        for ca, cb, cc, cw in rows:
            w = w + cw * om
            om, om_p = (ca * np.asarray(vop.matvec(jnp.asarray(om)))
                        + cb * om + cc * om_p), om
        assert np.max(np.abs(wf - w)) / np.max(np.abs(w)) < 1e-4

    def test_variable_hermitian_box_lanczos(self, rng):
        # Hermitian variable 9-point: coeff pairing
        # c_k[i] == c_{-k}[i + off_k] (the operator's Hermitian
        # condition); the fused Lanczos coeffs must match the XLA path
        import itertools
        from exponentialutilities_jl_tpu.ops.stencil import (
            VariableStencilOperator)
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            lanczos_coeffs_fused)
        from exponentialutilities_jl_tpu.ops.krylov import lanczos_coeffs
        ny, nx = 45, 140
        offs = [o for o in itertools.product((-1, 0, 1), repeat=2)]
        F = {}
        for off in offs:
            if off in F:
                continue
            mo = (-off[0], -off[1])
            f = rng.standard_normal((ny, nx)).astype(np.float32)
            F[off] = f
            if mo != off:
                # c_{-k}[i] = c_k[i - off] — roll with Dirichlet cut
                g = np.zeros_like(f)
                sy, sx = off
                ys0, ys1 = max(0, sy), ny + min(0, sy)
                xs0, xs1 = max(0, sx), nx + min(0, sx)
                g[ys0:ys1, xs0:xs1] = f[ys0 - sy:ys1 - sy,
                                        xs0 - sx:xs1 - sx]
                F[mo] = g
        vop = VariableStencilOperator(
            (ny, nx), offs, [F[o].reshape(-1) / 6 for o in offs],
            is_hermitian=True)
        # verify Hermitian premise against the dense operator
        import jax
        n = ny * nx
        cols_dense = np.asarray(
            jax.vmap(vop.matvec, in_axes=1, out_axes=1)(
                jnp.eye(n, dtype=jnp.float32)))
        assert np.max(np.abs(cols_dense - cols_dense.T)) < 1e-5
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        a1, b1, _, _, _ = lanczos_coeffs(vop, b, 8)
        a2, b2, _, _, _ = lanczos_coeffs_fused(vop, b, 8, interpret=True)
        scale = float(jnp.max(jnp.abs(a1)))
        assert float(jnp.max(jnp.abs(a1 - a2))) / scale < 1e-4
        assert float(jnp.max(jnp.abs(b1 - b2))) / scale < 1e-4

    def test_variable_vmem_budget_rejected(self, rng):
        # a 27-point variable operator on a grid whose layers overflow
        # VMEM in EVERY sweep orientation must be rejected at dispatch
        # (falls back to scan), not crash in the kernel. (600³ would
        # need 23 GB of coefficient fields, so probe the planner
        # through _fused_dispatch with an uninitialized shell — the
        # dispatch gate only reads grid_shape/offsets.)
        import itertools
        from exponentialutilities_jl_tpu.ops.stencil import (
            VariableStencilOperator)
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            _fused_dispatch)
        vop = VariableStencilOperator.__new__(VariableStencilOperator)
        vop.grid_shape = (600, 600, 600)
        vop.offsets = list(itertools.product((-1, 0, 1), repeat=3))
        with pytest.raises(ValueError, match="scoped-VMEM"):
            _fused_dispatch(vop, hermitian=False)

    def test_variable_giant_xy_reoriented(self, rng):
        # the shape the pre-r4 guard used to REJECT ((4, big, big)
        # 27-point variable) now rides the kernel via an axis-permuted
        # layout — correctness checked on a scaled-down twin whose
        # natural orientation is still infeasible for C = 27
        # ((ny+2)·P rows · 45.7 KB/row > 100 MB ⇔ S > 2294)
        import itertools
        from exponentialutilities_jl_tpu.ops.stencil import (
            VariableStencilOperator)
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            ghost_grid_for, stencil_matvec_fused)
        shape = (3, 70, 4080)          # identity: P=32, S=2304 > 2294
        offs = list(itertools.product((-1, 0, 1), repeat=3))
        n = int(np.prod(shape))
        fields = [rng.standard_normal(n).astype(np.float32) * 0.1
                  for _ in offs]
        vop = VariableStencilOperator(shape, offs, fields)
        gg = ghost_grid_for(vop)
        assert gg.perm != (0, 1, 2)
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        y = np.asarray(stencil_matvec_fused(vop, x, interpret=True))
        want = np.asarray(vop.matvec(x))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 2e-5

    def test_legacy_fixed_slot_contract(self, rng):
        # fused_lanczos_step(coeffs_static=None, cfields=(nz,8,R,128))
        # must keep working for external callers of the round-3 API
        from exponentialutilities_jl_tpu.ops.stencil import (
            VariableStencilOperator)
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            ghost_grid_for, fused_lanczos_step, _SEVEN_POINT)
        shape = (6, 7, 130)
        n = int(np.prod(shape))
        offs = list(_SEVEN_POINT)
        fields = [rng.standard_normal(n).astype(np.float32)
                  for _ in offs]
        vop = VariableStencilOperator(shape, offs, fields)
        gg = ghost_grid_for(vop)
        planes = [gg.to_ghost(jnp.asarray(f)) for f in fields]
        planes.append(jnp.zeros_like(planes[0]))
        C = jnp.stack(planes, axis=1)           # legacy 8-slot layout
        mask = jnp.asarray(gg.xmask())
        x = rng.standard_normal(n).astype(np.float32)
        Xg = gg.to_ghost(jnp.asarray(x))
        zeros = jnp.zeros_like(Xg)
        _, Zn, _, _ = fused_lanczos_step(
            Xg, zeros, zeros, (1.0, 0.0, 0.0), mask, grid_desc=gg,
            coeffs_static=None, cfields=C, interpret=True)
        y = np.asarray(gg.from_ghost(Zn))
        want = np.asarray(vop.matvec(jnp.asarray(x)))
        assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 2e-5


class TestWideDispatchGate:
    """Review r4: infeasible wide-offset operators must be rejected at
    DISPATCH time (ValueError from _fused_dispatch) so the auto gates
    (_fused_poly_ok & co) fall back to the XLA scan path instead of
    crashing at apply time. (The round-4 pad-lane infeasibility is gone:
    ghost_grid_for now sizes xpad from the offsets — see
    TestThirdNeighbourOffsets.test_auto_pad_piece_for_tight_nx.)"""

    def test_big_plane_wide_z_rejected_at_dispatch(self):
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            _fused_dispatch)
        from exponentialutilities_jl_tpu.models.expv import (
            _fused_two_pass_supported)
        # a CUBE with |dz| = 2: every orientation needs 2 layers/slab of
        # ~3016 rows each — over the VMEM budget in all six sweeps
        # (a pancake grid like (16, 1024, 1024) is now RE-ORIENTED
        # instead: see TestPermutedOrientation)
        op = StencilOperator((600, 600, 600),
                             [(2, 0, 0), (-2, 0, 0), (0, 0, 0)],
                             jnp.asarray([1.0, 1.0, -2.0], jnp.float32),
                             is_hermitian=True)
        with pytest.raises(ValueError, match="too large"):
            _fused_dispatch(op)
        assert _fused_two_pass_supported(op) is False

    def test_giant_plane_rejected_even_at_nearest_neighbour(self):
        # |o| <= 1 on a giant cube used to be a LATENT apply-time VMEM
        # fault (the dispatch gate only probed wide offsets); it must
        # now be rejected at dispatch in every orientation
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            _fused_dispatch)
        op = StencilOperator((3000, 3000, 3000),
                             [(1, 0, 0), (-1, 0, 0), (0, 0, 0)],
                             jnp.asarray([1.0, 1.0, -2.0], jnp.float32),
                             is_hermitian=True)
        with pytest.raises(ValueError, match="too large"):
            _fused_dispatch(op)


class TestPermutedOrientation:
    """Axis-permuted ghost layouts (GhostGrid(perm=...)): giant-xy /
    pancake grids whose natural layers overflow the scoped-VMEM budget
    sweep along a different axis instead of falling to the XLA scan.
    to_ghost/from_ghost transpose once per solve; the kernel's offsets
    are permuted to match inside fused_lanczos_step."""

    def test_ghost_roundtrip_all_perms(self, rng):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            GhostGrid)
        import itertools
        gs = (5, 7, 131)
        x = jnp.asarray(rng.standard_normal(int(np.prod(gs)))
                        .astype(np.float32))
        for perm in itertools.permutations(range(3)):
            dims = tuple(gs[p] for p in perm)
            gg = GhostGrid(*dims, zb=2, perm=perm)
            rt = gg.from_ghost(gg.to_ghost(x))
            np.testing.assert_array_equal(np.asarray(rt), np.asarray(x))

    def test_asymmetric_matvec_all_perms(self, rng):
        # an asymmetric stencil with distinct couplings per axis catches
        # any axis-mapping or sign error in the offset permutation
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            GhostGrid, fused_lanczos_step, _stencil_coeffs_static)
        gs = (5, 7, 131)
        offs = [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                (0, 0, 1), (0, 0, -1), (2, -1, 0), (0, 1, -2)]
        cf = [-6.0, 1.0, 1.3, 0.9, 1.1, 0.8, 1.2, 0.31, 0.17]
        op = StencilOperator(gs, offs, jnp.asarray(cf, jnp.float32),
                             is_hermitian=False)
        x = jnp.asarray(rng.standard_normal(int(np.prod(gs)))
                        .astype(np.float32))
        want = np.asarray(op.matvec(x))
        cs = _stencil_coeffs_static(op, hermitian=False)
        for perm in ((1, 0, 2), (2, 0, 1), (0, 2, 1), (1, 2, 0),
                     (2, 1, 0)):
            dims = tuple(gs[p] for p in perm)
            mo = [max(abs(o[p]) for o in offs) for p in perm]
            gg = GhostGrid(*dims, zb=max(2, mo[0]), ypad=max(2, mo[1]),
                           xpad=max(1, mo[2]), perm=perm)
            Xg = gg.to_ghost(x)
            zeros = jnp.zeros_like(Xg)
            _, Zn, _, _ = fused_lanczos_step(
                Xg, zeros, zeros, (1.0, 0.0, 0.0),
                jnp.asarray(gg.xmask()), grid_desc=gg, coeffs_static=cs,
                interpret=True)
            got = np.asarray(gg.from_ghost(Zn))
            err = np.max(np.abs(got - want)) / np.max(np.abs(want))
            assert err < 2e-6, (perm, err)

    def test_planner_reorients_pancake_wide_z(self):
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            _plan_3d)
        gg = _plan_3d((16, 1024, 1024),
                      ((2, 0, 0), (-2, 0, 0), (0, 0, 0)), variable=False)
        assert gg.perm != (0, 1, 2)
        assert gg.rows_per_plane <= 2900
        assert gg.zb >= 1

    def test_planner_keeps_identity_when_feasible(self):
        # the benchmarked flagship layouts must be byte-identical
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            ghost_grid_for)
        op = StencilOperator((216, 216, 216),
                             [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                              (0, 0, 1), (0, 0, -1), (0, 0, 0)],
                             jnp.asarray([1, 1, 1, 1, 1, 1, -6],
                                         jnp.float32),
                             is_hermitian=True)
        gg = ghost_grid_for(op)
        assert gg.perm == (0, 1, 2)
        assert (gg.nz, gg.ny, gg.nx) == (216, 216, 216)

    def test_auto_reorient_wide_z_lanczos_expv(self, rng):
        # end-to-end: two-pass fused expv on a grid whose |dz| = 3
        # layers only fit after re-orientation (identity S = 984,
        # 3·S > 2900); oracle = the XLA scan Lanczos path
        from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
            ghost_grid_for, lanczos_coeffs_fused, lanczos_replay_fused)
        from exponentialutilities_jl_tpu.ops.krylov import lanczos_coeffs
        gs = (4, 120, 1020)
        offs = [(0, 0, 0), (3, 0, 0), (-3, 0, 0), (0, 1, 0), (0, -1, 0),
                (0, 0, 1), (0, 0, -1)]
        op = StencilOperator(gs, offs,
                             jnp.asarray([-6, 1, 1, 1, 1, 1, 1],
                                         jnp.float32) * 0.1,
                             is_hermitian=True)
        gg = ghost_grid_for(op)
        assert gg.perm != (0, 1, 2)
        b = jnp.asarray(rng.standard_normal(int(np.prod(gs)))
                        .astype(np.float32))
        al_f, be_f, b0_f, mu_f, _ = lanczos_coeffs_fused(
            op, b, 6, interpret=True)
        al, be, b0, mu, _ = lanczos_coeffs(op, b, 6)
        np.testing.assert_allclose(np.asarray(al_f), np.asarray(al),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(float(b0_f), float(b0), rtol=1e-6)
        co = jnp.asarray(rng.standard_normal(6).astype(np.float32))
        w_f = lanczos_replay_fused(op, b, co, interpret=True)
        # scan-path replay oracle
        from exponentialutilities_jl_tpu.ops.krylov import lanczos_replay
        w = lanczos_replay(op, b, co, al, be, 6)
        scale = float(jnp.max(jnp.abs(w)))
        assert float(jnp.max(jnp.abs(w_f - w))) / scale < 2e-5
