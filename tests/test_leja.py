"""Real-Leja-point expv (models/leja.py). Oracles: scipy dense expm,
the Krylov expv path (no shared code), semigroup identity."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.linalg as sla

from exponentialutilities_jl_tpu import (advection_diffusion_1d, expv,
                                         laplacian_1d, DenseOperator)
from exponentialutilities_jl_tpu.models.leja import (expv_leja,
                                                     leja_points,
                                                     real_interval,
                                                     _divided_differences)


class TestLejaMachinery:
    def test_leja_points_shape_and_spread(self):
        xi = leja_points(40)
        assert xi[0] == 2.0
        assert np.min(xi) >= -2.0 and np.max(xi) <= 2.0
        # first few alternate across the interval (standard Leja order)
        assert xi[1] == pytest.approx(-2.0)
        assert abs(xi[2]) < 0.5

    def test_divided_differences_vs_recursive_small(self):
        """At tiny degree the recursive formula is still stable."""
        xi = leja_points(6)
        t, c, s = 0.7, -1.0, 0.5
        d = _divided_differences(t, c, s, xi)
        f = lambda x: np.exp(t * (c + s * x))
        # recursive table
        tab = [f(x) for x in xi]
        dd = [tab[0]]
        for k in range(1, len(xi)):
            tab = [(tab[i + 1] - tab[i]) / (xi[i + k] - xi[i])
                   for i in range(len(tab) - 1)]
            dd.append(tab[0])
        assert np.allclose(d, dd, rtol=1e-9)

    def test_real_interval_encloses(self, rng):
        op = advection_diffusion_1d(100, peclet=5.0)
        lo, hi = real_interval(op)
        ev = np.linalg.eigvals(np.asarray(op.to_dense()))
        assert lo <= ev.real.min() and hi >= ev.real.max()


class TestExpvLeja:
    def test_advection_diffusion_vs_dense(self, rng):
        n = 300
        op = advection_diffusion_1d(n, peclet=10.0)
        b = jnp.asarray(rng.standard_normal(n))
        t = 2e-5                      # moderate z for the stiff operator
        w = expv_leja(t, op, b, tol=1e-10)
        ref = sla.expm(t * np.asarray(op.to_dense())) @ np.asarray(b)
        assert np.linalg.norm(np.asarray(w) - ref) / np.linalg.norm(ref) \
            < 1e-8

    def test_substepped_large_t(self, rng):
        """|t|·s beyond one substep: exact substepping engages."""
        n = 200
        op = advection_diffusion_1d(n, peclet=2.0)
        b = jnp.asarray(rng.standard_normal(n))
        t = 3e-4                      # z = t*s ~ 120 -> q >= 3
        w = expv_leja(t, op, b, tol=1e-10)
        ref = sla.expm(t * np.asarray(op.to_dense())) @ np.asarray(b)
        assert np.linalg.norm(np.asarray(w) - ref) / np.linalg.norm(ref) \
            < 1e-7

    def test_vs_krylov_larger_n(self, rng):
        n = 2000
        op = advection_diffusion_1d(n, peclet=5.0)
        b = jnp.asarray(rng.standard_normal(n))
        t = 5e-7
        w_leja = expv_leja(t, op, b, tol=1e-11)
        w_kry = expv(t, op, b, m=40)
        assert (np.linalg.norm(np.asarray(w_leja) - np.asarray(w_kry))
                / np.linalg.norm(np.asarray(w_kry))) < 1e-8

    def test_hermitian_matches_chebyshev(self, rng):
        from exponentialutilities_jl_tpu import expv_chebyshev
        op = laplacian_1d(300)
        b = jnp.asarray(rng.standard_normal(300))
        w_l = expv_leja(0.6, op, b, tol=1e-11)
        w_c = expv_chebyshev(0.6, op, b, tol=1e-11)
        assert (np.linalg.norm(np.asarray(w_l) - np.asarray(w_c))
                / np.linalg.norm(np.asarray(w_c))) < 1e-9

    def test_dense_nonnormal_real_spectrum(self, rng):
        """Dense nonnormal matrix with real spectrum (upper triangular
        plus small perturbation) — the method's dense use case. A
        circular-law random matrix (disk-shaped spectrum, imaginary
        extent ~‖A‖) is OUT of the real-Leja domain by design; use the
        Krylov expv there."""
        n = 80
        A = np.triu(rng.standard_normal((n, n))) / 6
        np.fill_diagonal(A, rng.uniform(-1.0, 0.2, n))
        b = rng.standard_normal(n)
        w = expv_leja(1.0, DenseOperator(A), b, tol=1e-11)
        ref = sla.expm(A) @ b
        assert np.linalg.norm(np.asarray(w) - ref) / np.linalg.norm(ref) \
            < 1e-8

    def test_semigroup_identity(self, rng):
        n = 400
        op = advection_diffusion_1d(n, peclet=8.0)
        b = jnp.asarray(rng.standard_normal(n))
        t = 4e-5
        w_full = np.asarray(expv_leja(t, op, b, tol=1e-11), np.float64)
        w_half = expv_leja(t / 2, op, b, tol=1e-11)
        w_two = np.asarray(expv_leja(t / 2, op, w_half, tol=1e-11),
                           np.float64)
        assert (np.linalg.norm(w_full - w_two)
                / np.linalg.norm(w_two)) < 1e-7


class TestPhivLeja:
    def test_vs_phiv_krylov(self, rng):
        from exponentialutilities_jl_tpu.models.leja import phiv_leja
        from exponentialutilities_jl_tpu import phiv
        n = 300
        op = advection_diffusion_1d(n, peclet=6.0)
        b = jnp.asarray(rng.standard_normal(n))
        t = 2e-5
        P_l = phiv_leja(t, op, b, 3, tol=1e-11)
        P_k = phiv(t, op, b, 3, m=50)
        assert P_l.shape == (n, 4)
        err = (np.linalg.norm(np.asarray(P_l) - np.asarray(P_k))
               / np.linalg.norm(np.asarray(P_k)))
        assert err < 1e-8

    def test_phi_identity(self, rng):
        import math
        from exponentialutilities_jl_tpu.models.leja import phiv_leja
        n = 200
        op = advection_diffusion_1d(n, peclet=4.0)
        A = np.asarray(op.to_dense())
        b = rng.standard_normal(n)
        t = 1e-5
        P = np.asarray(phiv_leja(t, op, jnp.asarray(b), 2, tol=1e-12))
        for j in range(2):
            lhs = t * (A @ P[:, j + 1])
            rhs = P[:, j] - b / math.factorial(j)
            assert np.linalg.norm(lhs - rhs) < 1e-9 * max(
                np.linalg.norm(P[:, j]), 1.0)

    def test_stiff_raises(self, rng):
        from exponentialutilities_jl_tpu.models.leja import phiv_leja
        op = advection_diffusion_1d(500, peclet=2.0)
        with pytest.raises(ValueError, match="substepping"):
            phiv_leja(1.0, op, jnp.ones(500), 2)


class TestPhivTimestepLeja:
    def test_vs_nw_adaptive(self, rng):
        from exponentialutilities_jl_tpu.models.leja import (
            phiv_timestep_leja)
        from exponentialutilities_jl_tpu import phiv_timestep
        n = 300
        op = advection_diffusion_1d(n, peclet=6.0)
        B = jnp.asarray(rng.standard_normal((n, 3)))
        ts = [2e-5, 5e-5]
        U_l = phiv_timestep_leja(ts, op, B, tol=1e-10)
        U_nw = phiv_timestep(ts, op, B, adaptive=True, tol=1e-10, m=40)
        assert U_l.shape == (n, 2)
        err = (np.linalg.norm(np.asarray(U_l) - np.asarray(U_nw))
               / np.linalg.norm(np.asarray(U_nw)))
        assert err < 1e-7

    def test_stiff_substepped_vs_dense(self, rng):
        """t·s far beyond one substep: the uniform-τ scan engages
        (q > 25) and matches a dense oracle."""
        from exponentialutilities_jl_tpu.models.leja import (
            phiv_timestep_leja, real_interval)
        n = 120
        op = advection_diffusion_1d(n, peclet=3.0)
        lo, hi = real_interval(op)
        s = (hi - lo) / 4
        t_end = 1000.0 * 40.0 / s / 25     # q ≈ 40 substeps
        B = rng.standard_normal((n, 2))
        u = phiv_timestep_leja(t_end, op, jnp.asarray(B), tol=1e-10)
        A = np.asarray(op.to_dense())
        # Sidje block oracle: exp([[tA, t·b1],[0,0]]) column n holds
        # φ1(tA)·(t·b1); u(t) = φ0(tA)b0 + t·φ1(tA)b1.
        import scipy.linalg as sla
        Aug = np.zeros((n + 1, n + 1))
        Aug[:n, :n] = t_end * A
        Aug[:n, n] = t_end * B[:, 1]
        P = sla.expm(Aug)
        ref = P[:n, :n] @ B[:, 0] + P[:n, n]
        err = np.linalg.norm(np.asarray(u) - ref) / np.linalg.norm(ref)
        assert err < 1e-7

    def test_scalar_ts_and_p0(self, rng):
        from exponentialutilities_jl_tpu.models.leja import (
            phiv_timestep_leja, expv_leja)
        n = 150
        op = advection_diffusion_1d(n, peclet=4.0)
        b = jnp.asarray(rng.standard_normal(n))
        t = 3e-5
        u = phiv_timestep_leja(t, op, b, tol=1e-11)
        w = expv_leja(t, op, b, tol=1e-11)
        assert u.shape == (n,)
        assert (np.linalg.norm(np.asarray(u) - np.asarray(w))
                / np.linalg.norm(np.asarray(w))) < 1e-8

    def test_advection_dominated_raises_not_nan(self, rng):
        """Fat-ellipse FoV (advection-dominated) must raise, never
        return NaN silently (the drivers' no-throw-NaN contract)."""
        from exponentialutilities_jl_tpu.models.leja import (
            phiv_timestep_leja)
        from exponentialutilities_jl_tpu import StencilOperator
        n = 2000
        d_c, a_c = 1.0, 40.0          # |Im FoV| ~ a >> real width ~ 4d
        op = StencilOperator((n,), ((-1,), (0,), (1,)),
                             jnp.asarray([d_c + a_c, -2 * d_c - a_c,
                                          d_c], jnp.float32),
                             is_hermitian=False)
        B = jnp.asarray(rng.standard_normal((n, 2)), jnp.float32)
        with pytest.raises(FloatingPointError, match="diverged"):
            phiv_timestep_leja(50.0, op, B, tol=1e-7)

    def test_unsorted_ts_preserves_caller_order(self, rng):
        """Output columns must follow the CALLER's ts order (the NW
        driver restores its sort; review found this one didn't)."""
        from exponentialutilities_jl_tpu.models.leja import (
            phiv_timestep_leja)
        n = 150
        op = advection_diffusion_1d(n, peclet=4.0)
        B = jnp.asarray(rng.standard_normal((n, 2)))
        ts = [5e-5, 2e-5]              # deliberately descending
        U = phiv_timestep_leja(ts, op, B, tol=1e-10)
        U0 = phiv_timestep_leja(5e-5, op, B, tol=1e-10)
        U1 = phiv_timestep_leja(2e-5, op, B, tol=1e-10)
        # the multi-snapshot march passes through the intermediate
        # time with its own substep grid — agreement is at the tol
        # class, not bitwise
        np.testing.assert_allclose(np.asarray(U[:, 0]), np.asarray(U0),
                                   rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(np.asarray(U[:, 1]), np.asarray(U1),
                                   rtol=1e-7, atol=1e-10)

    def test_negative_t_backward_evolution(self, rng):
        """t < 0 must evolve backward, not silently return b_0."""
        from exponentialutilities_jl_tpu.models.leja import (
            phiv_timestep_leja)
        import scipy.linalg as sla
        n = 100
        op = advection_diffusion_1d(n, peclet=2.0)
        b = jnp.asarray(rng.standard_normal(n))
        t = -2e-5
        u = phiv_timestep_leja(t, op, b, tol=1e-10)
        ref = sla.expm(t * np.asarray(op.to_dense())) @ np.asarray(b)
        assert np.linalg.norm(np.asarray(u) - ref) / np.linalg.norm(ref) \
            < 1e-7


class TestNonFiniteDDTable:
    """An overflowed divided-difference table must raise, never pass as a
    silently-wrong degree-0 interpolation (ADVICE r2 medium: every
    comparison against a NaN threshold is False, so _truncate_dd used to
    fall back to m_used=1)."""

    def test_truncate_dd_raises_on_nonfinite(self):
        from exponentialutilities_jl_tpu.models.leja import _truncate_dd
        mag = np.array([1.0, 0.5, np.nan, 0.1])
        with pytest.raises(FloatingPointError, match="non-finite"):
            _truncate_dd(mag, 1e-7, 10, None, "test")
        mag_inf = np.array([1.0, np.inf, 0.1])
        with pytest.raises(FloatingPointError, match="non-finite"):
            _truncate_dd(mag_inf, 1e-7, 10, None, "test")

    def test_expv_leja_overflowed_table_raises(self, rng):
        # growth spectrum + raised max_z → the host expm of the shift
        # matrix overflows (entries ~ e^2000); must raise, not return a
        # finite degree-0 result
        n = 20
        d = np.linspace(1.0, 1999.0, n)
        A = jnp.asarray(np.diag(d))
        b = jnp.asarray(rng.standard_normal(n))
        with pytest.raises(FloatingPointError, match="non-finite"):
            expv_leja(1.0, A, b, interval=(0.0, 2000.0), max_z=2000.0)

    def test_max_degree_cap_cannot_swallow_overflow(self, rng):
        # the max_degree CAP downgrades the slow-convergence ValueError
        # to best-effort truncation, but must never swallow the
        # FloatingPointError from a non-finite table
        from exponentialutilities_jl_tpu import phiv_timestep_leja
        n = 20
        d = np.linspace(1.0, 1999.0, n)
        A = jnp.asarray(np.diag(d))
        b = rng.standard_normal(n)
        with pytest.raises(FloatingPointError):
            phiv_timestep_leja(1.0, A, b[:, None],
                               interval=(0.0, 2000.0), max_z=2000.0,
                               max_degree=64)
