"""Exponential integrators (models/integrators.py): exprb32/exprb43
exactness on linear problems, convergence orders, scipy Radau oracles on
a stiff semilinear problem, matrix-free Jacobians, stencil-container L,
and the no-silent-failure protocol. The reference serves these methods
from downstream (reference README.md:16); here they are part of the
library."""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.linalg as sla

import exponentialutilities_jl_tpu as eu


def _ac_problem(nx=96, nu=0.01):
    """1-D Allen–Cahn-class reaction–diffusion: u' = nu*Lap u + u - u^3."""
    dx = 1.0 / (nx + 1)
    D = (np.diag(-2.0 * np.ones(nx)) + np.diag(np.ones(nx - 1), 1)
         + np.diag(np.ones(nx - 1), -1)) / dx ** 2 * nu
    Dj = jnp.asarray(D)

    def f(u):
        return Dj @ u + u - u ** 3

    u0 = np.sin(np.pi * np.arange(1, nx + 1) * dx) * 0.5
    return Dj, f, u0


@pytest.fixture(scope="module")
def ac_ref():
    """High-accuracy Radau reference for the Allen–Cahn problem."""
    from scipy.integrate import solve_ivp
    Dj, f, u0 = _ac_problem()
    sol = solve_ivp(lambda t, u: np.asarray(f(jnp.asarray(u))),
                    (0.0, 1.5), u0, method="Radau",
                    rtol=1e-11, atol=1e-13)
    return Dj, f, u0, sol.y[:, -1]


def test_exprb32_linear_exact(rng):
    # linear f => g == 0 => every step is exactly expm
    n = 50
    A = rng.standard_normal((n, n)) / 5 - 2 * np.eye(n)
    Aj = jnp.asarray(A)
    u0 = rng.standard_normal(n)
    u1, st = eu.exprb32(lambda u: Aj @ u, u0, (0.0, 1.0),
                        rtol=1e-8, atol=1e-10)
    want = sla.expm(A) @ u0
    assert np.linalg.norm(np.asarray(u1) - want) / np.linalg.norm(want) \
        < 1e-9
    assert st.rejected == 0 and st.info == 0


def test_exprb32_vs_radau(ac_ref):
    Dj, f, u0, ref = ac_ref
    u, st = eu.exprb32(f, u0, (0.0, 1.5), rtol=1e-7, atol=1e-9)
    assert np.linalg.norm(np.asarray(u) - ref) / np.linalg.norm(ref) < 1e-6
    assert st.steps > 10            # genuinely multi-step (stiff)


def test_exprb43_vs_radau(ac_ref):
    Dj, f, u0, ref = ac_ref
    u, st = eu.exprb43(f, u0, (0.0, 1.5), rtol=1e-9, atol=1e-11)
    assert np.linalg.norm(np.asarray(u) - ref) / np.linalg.norm(ref) < 1e-8


def test_exprb43_order4(ac_ref):
    # fixed-step error should scale like dt^4 (Hochbruck-Ostermann
    # exprb43 tableau check: a wrong coefficient drops the order)
    Dj, f, u0, ref = ac_ref
    errs = []
    for m in (6, 12):
        u, _ = eu.exprb43(f, u0, (0.0, 1.5), dt0=1.5 / m, adaptive=False)
        errs.append(np.linalg.norm(np.asarray(u) - ref)
                    / np.linalg.norm(ref))
    ratio = errs[0] / errs[1]
    assert 10.0 < ratio < 26.0      # ~2^4 = 16


def test_exprb32_order3(ac_ref):
    Dj, f, u0, ref = ac_ref
    errs = []
    for m in (8, 16):
        u, _ = eu.exprb32(f, u0, (0.0, 1.5), dt0=1.5 / m, adaptive=False)
        errs.append(np.linalg.norm(np.asarray(u) - ref)
                    / np.linalg.norm(ref))
    ratio = errs[0] / errs[1]
    assert 5.0 < ratio < 13.0       # ~2^3 = 8


def test_etdrk4_order4_and_oracle(ac_ref):
    Dj, f, u0, ref = ac_ref
    op = eu.aslinearoperator(Dj, is_hermitian=True)
    Nf = lambda u: u - u ** 3
    errs = []
    for m in (5, 10):
        u, st = eu.etdrk4(op, Nf, u0, (0.0, 1.5), 1.5 / m)
        errs.append(np.linalg.norm(np.asarray(u) - ref)
                    / np.linalg.norm(ref))
        assert st.steps == m and st.n_kiops == 4 * m
    assert errs[1] < 2e-5           # close to the Radau reference
    ratio = errs[0] / errs[1]
    assert 10.0 < ratio < 26.0      # 4th order


def test_stencil_container_L(ac_ref):
    # L as a StencilOperator: etdrk4 rides the library's container stack
    Dj, f, u0, ref = ac_ref
    nx = len(u0)
    dx = 1.0 / (nx + 1)
    op = eu.StencilOperator((nx,), ((-1,), (0,), (1,)),
                            jnp.asarray([1.0, -2.0, 1.0]) / dx ** 2 * 0.01,
                            is_hermitian=True)
    u, _ = eu.etdrk4(op, lambda u: u - u ** 3, u0, (0.0, 1.5), 0.15)
    assert np.linalg.norm(np.asarray(u) - ref) / np.linalg.norm(ref) < 2e-5


def test_matrix_free_jacobian_default(ac_ref):
    # default jac=None uses JacobianOperator (jvp) — same answer as an
    # explicit dense Jacobian
    Dj, f, u0, ref = ac_ref
    u_jvp, _ = eu.exprb32(f, u0, (0.0, 0.5), rtol=1e-8, atol=1e-10)

    def jac(u):
        return Dj + jnp.diag(1.0 - 3.0 * u ** 2)

    u_dense, _ = eu.exprb32(f, u0, (0.0, 0.5), jac=jac,
                            rtol=1e-8, atol=1e-10)
    assert np.linalg.norm(np.asarray(u_jvp) - np.asarray(u_dense)) \
        / np.linalg.norm(np.asarray(u_dense)) < 1e-7


def test_jacobian_operator_matvec(rng):
    n = 30
    A = jnp.asarray(rng.standard_normal((n, n)))
    u = jnp.asarray(rng.standard_normal(n))
    f = lambda v: A @ v + v ** 2
    J = eu.JacobianOperator(f, u)
    v = jnp.asarray(rng.standard_normal(n))
    want = A @ v + 2.0 * u * v
    assert float(jnp.linalg.norm(J.matvec(v) - want)) < 1e-12
    assert J.shape == (n, n)


def test_trajectory_output(ac_ref):
    Dj, f, u0, ref = ac_ref
    ts, us, st = eu.exprb32(f, u0, (0.0, 0.3), rtol=1e-6, atol=1e-9,
                            return_trajectory=True)
    assert ts[0] == 0.0 and abs(ts[-1] - 0.3) < 1e-12
    assert us.shape == (len(ts), len(u0))
    np.testing.assert_array_equal(np.asarray(us[0]), u0)


def test_wrms_vector_atol_two_scale():
    # VERDICT r3 #9: per-component WRMS + vector atol must integrate a
    # stiff TWO-SCALE field (an O(1) block and an exact 1e-6-scaled
    # mirror block) with step counts comparable to scipy Radau at equal
    # tolerance, controlling BOTH blocks at their own scales.
    from scipy.integrate import solve_ivp
    nx, nu, S = 64, 0.01, 1e-6
    dx = 1.0 / (nx + 1)
    D = (np.diag(-2.0 * np.ones(nx)) + np.diag(np.ones(nx - 1), 1)
         + np.diag(np.ones(nx - 1), -1)) / dx ** 2 * nu
    Dj = jnp.asarray(D)

    def f(z):
        u, v = z[:nx], z[nx:]
        return jnp.concatenate(
            [Dj @ u + u - u ** 3,
             Dj @ v + v - (v ** 3) * (1.0 / S ** 2)])   # v ≡ S·u exactly

    u0 = np.sin(np.pi * np.arange(1, nx + 1) * dx) * 0.5
    z0 = np.concatenate([u0, S * u0])
    atol_vec = np.concatenate([np.full(nx, 1e-9), np.full(nx, 1e-9 * S)])
    rtol = 1e-7
    sol = solve_ivp(lambda t, z: np.asarray(f(jnp.asarray(z))), (0, 1.5),
                    z0, method="Radau", rtol=rtol, atol=atol_vec)
    radau_steps = len(sol.t) - 1
    ref = sol.y[:, -1]
    z, st = eu.exprb43(f, z0, (0.0, 1.5), rtol=rtol,
                       atol=jnp.asarray(atol_vec))
    z = np.asarray(z)
    for blk in (slice(0, nx), slice(nx, 2 * nx)):       # both scales
        assert (np.linalg.norm(z[blk] - ref[blk])
                / np.linalg.norm(ref[blk])) < 1e-6
    assert st.steps + st.rejected <= 4 * radau_steps    # measured: 46 vs 27
    # the plain I-controller path stays available and consistent
    z2, st2 = eu.exprb43(f, z0, (0.0, 1.5), rtol=rtol,
                         atol=jnp.asarray(atol_vec), controller="i")
    assert np.linalg.norm(np.asarray(z2) - ref) / np.linalg.norm(ref) < 1e-6
    with pytest.raises(ValueError, match="atol"):
        eu.exprb43(f, z0, (0.0, 1.5), atol=jnp.ones(3))
    with pytest.raises(ValueError, match="controller"):
        eu.exprb43(f, z0, (0.0, 1.5), controller="pid")


def test_blowup_raises():
    # u' = u^2 blows up in finite time; the controller must hit the
    # step floor / budget and RAISE, never return a truncated answer
    f = lambda u: u ** 2
    u0 = np.full(4, 3.0)
    with pytest.raises(FloatingPointError, match="stopped at"):
        eu.exprb32(f, u0, (0.0, 5.0), rtol=1e-6, atol=1e-9,
                   max_steps=200)


def test_etdrk4_nonfinite_raises():
    # a wildly unstable nonlinearity at a huge fixed dt goes non-finite;
    # the driver raises instead of returning NaN
    nx = 32
    op = eu.StencilOperator((nx,), ((0,),), jnp.asarray([1.0]),
                            is_hermitian=True)
    with pytest.raises((FloatingPointError, ValueError)):
        eu.etdrk4(op, lambda u: jnp.exp(u) * 1e4, np.full(nx, 10.0),
                  (0.0, 10.0), 2.0)


def test_bad_tspan_raises():
    with pytest.raises(ValueError):
        eu.exprb32(lambda u: u, np.ones(4), (1.0, 0.5))
    with pytest.raises(ValueError):
        eu.etdrk4(eu.DiagonalOperator(jnp.ones(4)), lambda u: u,
                  np.ones(4), (0.0, 1.0), 0.3)   # dt does not divide


class TestDeviceResident:
    """Fixed-step serving forms: whole integration as ONE lax.scan
    program, fixed Krylov size, solver-free reduced exponentials."""

    def test_etdrk4_device_matches_host(self, ac_ref):
        Dj, f, u0, ref = ac_ref
        nx = len(u0)
        dx = 1.0 / (nx + 1)
        op = eu.StencilOperator(
            (nx,), ((-1,), (0,), (1,)),
            jnp.asarray([1.0, -2.0, 1.0]) / dx ** 2 * 0.01,
            is_hermitian=True)
        Nf = lambda u: u - u ** 3
        ud = eu.etdrk4_device(op, Nf, u0, (0.0, 1.5), 0.15, m=24)
        uh, _ = eu.etdrk4(op, Nf, u0, (0.0, 1.5), 0.15)
        assert np.linalg.norm(np.asarray(ud) - np.asarray(uh)) \
            / np.linalg.norm(np.asarray(uh)) < 1e-8
        assert np.linalg.norm(np.asarray(ud) - ref) \
            / np.linalg.norm(ref) < 1e-4

    def test_exprb43_device_order4(self, ac_ref):
        Dj, f, u0, ref = ac_ref
        errs = []
        for m in (6, 12):
            u = eu.exprb43_device(f, u0, (0.0, 1.5), 1.5 / m, m=30)
            errs.append(np.linalg.norm(np.asarray(u) - ref)
                        / np.linalg.norm(ref))
        assert 10.0 < errs[0] / errs[1] < 26.0

    def test_device_nonfinite_raises(self):
        nx = 32
        op = eu.StencilOperator((nx,), ((0,),), jnp.asarray([1.0]),
                                is_hermitian=True)
        with pytest.raises(FloatingPointError, match="non-finite"):
            eu.etdrk4_device(op, lambda u: jnp.exp(u) * 1e4,
                             np.full(nx, 50.0), (0.0, 10.0), 2.0, m=12)


class TestDeviceAdaptive:
    """Round-4 (VERDICT r3 #1): the ADAPTIVE exprb controller — WRMS
    norm, PI step control, rejections, failure protocol — folded into
    one lax.while_loop per m bucket. The contract: same trajectory and
    step counts as the host driver, zero host round-trips except
    m-bucket changes."""

    def test_exprb43_device_adaptive_matches_host(self, ac_ref):
        Dj, f, u0, ref = ac_ref
        uh, sth = eu.exprb43(f, u0, (0.0, 1.5), rtol=1e-9, atol=1e-11)
        ud, std = eu.exprb43_device(f, u0, (0.0, 1.5), rtol=1e-9,
                                    atol=1e-11, m=30, return_stats=True)
        # same controller data -> identical accept/reject sequence
        # (measured: 142 steps / 1 rejection both)
        assert std.steps == sth.steps and std.rejected == sth.rejected
        assert np.linalg.norm(np.asarray(ud) - np.asarray(uh)) \
            / np.linalg.norm(np.asarray(uh)) < 1e-9
        assert np.linalg.norm(np.asarray(ud) - ref) \
            / np.linalg.norm(ref) < 1e-8

    def test_exprb32_device_adaptive(self, ac_ref):
        Dj, f, u0, ref = ac_ref
        uh, sth = eu.exprb32(f, u0, (0.0, 1.5), rtol=1e-7, atol=1e-9)
        ud, std = eu.exprb32_device(f, u0, (0.0, 1.5), rtol=1e-7,
                                    atol=1e-9, m=25, return_stats=True)
        assert std.steps == sth.steps
        assert np.linalg.norm(np.asarray(ud) - ref) \
            / np.linalg.norm(ref) < 1e-6

    def test_exprb32_device_fixed_order3(self, ac_ref):
        Dj, f, u0, ref = ac_ref
        errs = []
        for k in (8, 16):
            u = eu.exprb32_device(f, u0, (0.0, 1.5), 1.5 / k,
                                  adaptive=False, m=30)
            errs.append(np.linalg.norm(np.asarray(u) - ref)
                        / np.linalg.norm(ref))
        assert 5.0 < errs[0] / errs[1] < 13.0

    def test_m_bucket_growth(self):
        # stiff diffusion (||J|| ~ 1.6e5): the kiops-style phi-error
        # estimate at m=6 breaches phi_tol, so the program exits with
        # want_m and the host re-enters at larger buckets
        from scipy.integrate import solve_ivp
        nx = 200
        dx = 1.0 / (nx + 1)
        D = (np.diag(-2.0 * np.ones(nx)) + np.diag(np.ones(nx - 1), 1)
             + np.diag(np.ones(nx - 1), -1)) / dx ** 2
        Dj = jnp.asarray(D)
        f = lambda u: Dj @ u + u - u ** 3
        u0 = np.sin(np.pi * np.arange(1, nx + 1) * dx) * 0.5
        u, st = eu.exprb43_device(f, u0, (0.0, 0.05), rtol=1e-8,
                                  atol=1e-10, m=6, return_stats=True)
        assert st.final_m > 6 and st.info == 0
        sol = solve_ivp(lambda t, z: np.asarray(f(jnp.asarray(z))),
                        (0, 0.05), u0, method="Radau",
                        rtol=1e-11, atol=1e-13)
        ref = sol.y[:, -1]
        assert np.linalg.norm(np.asarray(u) - ref) \
            / np.linalg.norm(ref) < 1e-8

    def test_device_adaptive_blowup_raises(self):
        f = lambda u: u ** 2
        with pytest.raises(FloatingPointError, match="stopped at"):
            eu.exprb32_device(f, np.full(4, 3.0), (0.0, 5.0), rtol=1e-6,
                              atol=1e-9, max_steps=200, m=8)

    def test_device_adaptive_bad_args(self):
        f = lambda u: -u
        with pytest.raises(ValueError, match="controller"):
            eu.exprb43_device(f, np.ones(4), (0.0, 1.0), controller="x")
        with pytest.raises(ValueError, match="requires dt"):
            eu.exprb43_device(f, np.ones(4), (0.0, 1.0), adaptive=False)


class TestDeviceSnapshots:
    """Round-4 gap closure: trajectory snapshots IN the device-resident
    adaptive drivers. Each requested time is a forced step endpoint;
    the segments re-dispatch the same compiled program with controller
    state carried across, so the output contract matches
    expv_timestep's (n, nt)."""

    SNAPS = (0.375, 0.75, 1.5)

    @pytest.fixture(scope="class")
    def snap_ref(self, ac_ref):
        from scipy.integrate import solve_ivp
        Dj, f, u0, _ = ac_ref
        sol = solve_ivp(lambda t, u: np.asarray(f(jnp.asarray(u))),
                        (0.0, 1.5), u0, method="Radau",
                        rtol=1e-11, atol=1e-13, t_eval=self.SNAPS)
        return sol.y                                     # (n, 3)

    def test_exprb43_device_snapshots(self, ac_ref, snap_ref):
        Dj, f, u0, _ = ac_ref
        U, st = eu.exprb43_device(f, u0, (0.0, 1.5), rtol=1e-9,
                                  atol=1e-11, m=30, return_stats=True,
                                  snapshots=self.SNAPS)
        assert U.shape == (len(u0), 3) and st.info == 0
        for k in range(3):
            err = np.linalg.norm(np.asarray(U[:, k]) - snap_ref[:, k]) \
                / np.linalg.norm(snap_ref[:, k])
            assert err < 1e-8, (k, err)

    def test_exprb32_device_fixed_snapshots(self, ac_ref, snap_ref):
        # fixed-step mode runs in the while-loop program, so snapshots
        # work there too (the step landing on each time is clamped)
        Dj, f, u0, _ = ac_ref
        U = eu.exprb32_device(f, u0, (0.0, 1.5), 0.05, adaptive=False,
                              m=30, snapshots=self.SNAPS)
        assert U.shape == (len(u0), 3)
        for k in range(3):
            err = np.linalg.norm(np.asarray(U[:, k]) - snap_ref[:, k]) \
                / np.linalg.norm(snap_ref[:, k])
            assert err < 1e-4, (k, err)

    def test_snapshot_validation(self, ac_ref):
        Dj, f, u0, _ = ac_ref
        with pytest.raises(ValueError, match="strictly increasing"):
            eu.exprb43_device(f, u0, (0.0, 1.5), snapshots=[0.8, 0.5, 1.5])
        with pytest.raises(ValueError, match="include it"):
            eu.exprb43_device(f, u0, (0.0, 1.5), snapshots=[0.5, 0.8])
        with pytest.raises(ValueError, match="adaptive=True"):
            eu.exprb43_device(f, u0, (0.0, 1.5), 0.1, adaptive=False,
                              snapshots=[0.5, 1.5])

    def test_snapshots_carry_controller_state(self, ac_ref):
        # splitting the span must not restart the controller: the total
        # attempt count with 3 forced endpoints stays close to the
        # plain solve's (a restart would re-ramp dt from (tf-t0)/100
        # three times and blow the count up)
        Dj, f, u0, _ = ac_ref
        _, st0 = eu.exprb43_device(f, u0, (0.0, 1.5), rtol=1e-7,
                                   atol=1e-9, m=30, return_stats=True)
        U, st1 = eu.exprb43_device(f, u0, (0.0, 1.5), rtol=1e-7,
                                   atol=1e-9, m=30, return_stats=True,
                                   snapshots=self.SNAPS)
        total0 = st0.steps + st0.rejected
        total1 = st1.steps + st1.rejected
        assert total1 <= total0 + 8, (total0, total1)


def test_wrms_atol_zero_with_zero_component():
    # review r4: atol=0 plus a component zero in both states made the
    # WRMS scale 0/0 = NaN and every step spuriously rejected
    f = lambda u: -u
    u, st = eu.exprb32(f, np.array([1.0, 0.0, 2.0]), (0.0, 1.0),
                       rtol=1e-6, atol=0.0)
    want = np.exp(-1.0) * np.array([1.0, 0.0, 2.0])
    assert np.linalg.norm(np.asarray(u) - want) < 1e-5
    ud = eu.exprb32_device(f, np.array([1.0, 0.0, 2.0]), (0.0, 1.0),
                           rtol=1e-6, atol=0.0, m=3)
    assert np.linalg.norm(np.asarray(ud) - want) < 1e-5


def test_exprb43_device_fixed_return_stats(ac_ref):
    # review r4: fixed-step mode silently ignored return_stats
    Dj, f, u0, ref = ac_ref
    u, st = eu.exprb43_device(f, u0, (0.0, 0.3), 0.1, adaptive=False,
                              m=20, return_stats=True)
    assert st.steps == 3 and st.n_kiops == 9 and st.final_m == 20
    assert np.all(np.isfinite(np.asarray(u)))
