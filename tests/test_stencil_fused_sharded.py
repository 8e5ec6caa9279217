"""Shard-local fused plane sweeps (parallel/stencil_fused.py) on the
8-virtual-device CPU mesh: the flagship Pallas kernel (interpret mode)
under shard_map, halo layers exchanged by ppermute.

Oracles: the XLA-scan sharded paths (themselves pinned against scipy in
test_parallel.py), the single-device fused/scan actions, and scipy on a
dense build for the small grids."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from jax.sharding import PartitionSpec as P

from exponentialutilities_jl_tpu import laplacian_nd_stencil, StencilOperator
from exponentialutilities_jl_tpu.parallel import (
    expv_chebyshev_sharded, expv_sharded, make_mesh, shard_vector)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def _dense(op):
    n = op.shape[0]
    cols = [np.asarray(op.matvec(jnp.eye(n, dtype=jnp.float64)[:, j]))
            for j in range(n)]
    return np.stack(cols, axis=1)


class TestFusedShardedChebyshev:
    def test_matches_scan_path_and_scipy(self, mesh, rng):
        op = laplacian_nd_stencil(16, 6, 10, dtype=jnp.float32)
        n = 16 * 6 * 10
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        t = 0.2
        w_fused = expv_chebyshev_sharded(t, op, b, mesh, fused=True)
        w_scan = expv_chebyshev_sharded(t, op, b, mesh, fused=False)
        assert (float(jnp.linalg.norm(jnp.asarray(w_fused) - w_scan))
                / float(jnp.linalg.norm(w_scan))) < 2e-6
        want = sla.expm(t * _dense(op)) @ np.asarray(b, np.float64)
        err = (np.linalg.norm(np.asarray(w_fused, np.float64) - want)
               / np.linalg.norm(want))
        assert err < 1e-5

    def test_dispatch_policy(self, mesh):
        # review r5: AUTO engages only on a real TPU (interpret mode is
        # orders of magnitude slower — it must never be auto-selected);
        # fused=True forces the plan anywhere, interpret off-TPU
        from exponentialutilities_jl_tpu.parallel.krylov import \
            _fused_shard_ok
        op = laplacian_nd_stencil(16, 6, 10, dtype=jnp.float32)
        plan_auto, _ = _fused_shard_ok(op, mesh, "shard",
                                       jnp.ones(960, jnp.float32),
                                       hermitian=True, fused=None)
        assert plan_auto is None            # CPU backend, auto → scan
        plan, interp = _fused_shard_ok(op, mesh, "shard",
                                       jnp.ones(960, jnp.float32),
                                       hermitian=True, fused=True)
        assert plan is not None and interp  # forced: interpret on CPU
        # f64 data falls back even when forced (plan gate is f32-only)
        plan64, _ = _fused_shard_ok(op, mesh, "shard", jnp.ones(960),
                                    hermitian=True, fused=True)
        assert plan64 is None

    def test_wide_halo_h0_2(self, mesh, rng):
        # |dz| = 2 star: two halo layers each way; sz = 16/8 = 2 = h0
        offs, cs = [], []
        for ax in range(3):
            for o in (-2, -1, 1, 2):
                off = [0, 0, 0]
                off[ax] = o
                offs.append(tuple(off))
                cs.append(-1.0 / 12 if abs(o) == 2 else 4.0 / 3)
        offs.append((0, 0, 0))
        cs.append(-3 * 5.0 / 2)
        op = StencilOperator((16, 6, 10), tuple(offs),
                             jnp.asarray(cs, jnp.float32),
                             is_hermitian=True)
        n = 16 * 6 * 10
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        t = 0.05
        w_fused = expv_chebyshev_sharded(t, op, b, mesh, fused=True)
        want = sla.expm(t * _dense(op)) @ np.asarray(b, np.float64)
        err = (np.linalg.norm(np.asarray(w_fused, np.float64) - want)
               / np.linalg.norm(want))
        assert err < 1e-5

    def test_halo_deeper_than_shard_rejected(self, mesh, rng):
        # h0 = 2 > sz = 1: the fused plan refuses (auto falls through to
        # the scan path, whose LocalStencilOperator enforces the SAME
        # halo <= shard-depth contract and raises — consistent behavior)
        offs = [(0, 0, 0), (2, 0, 0), (-2, 0, 0), (0, 1, 0), (0, -1, 0)]
        op = StencilOperator((8, 6, 10), tuple(offs),
                             jnp.asarray([-2.0, 0.5, 0.5, 0.5, 0.5],
                                         jnp.float32),
                             is_hermitian=True)
        from exponentialutilities_jl_tpu.parallel.krylov import \
            _fused_shard_ok
        plan, _ = _fused_shard_ok(op, mesh, "shard",
                                  jnp.ones(480, jnp.float32),
                                  hermitian=True)
        assert plan is None
        b = jnp.asarray(rng.standard_normal(480), jnp.float32)
        with pytest.raises(ValueError, match="halo"):
            expv_chebyshev_sharded(0.05, op, b, mesh)

    def test_census_permute_only(self, mesh, rng):
        # the compiled fused-sharded recurrence body: NO all-reduce,
        # halo collective-permute only (VERDICT r4 #2's census bar)
        from exponentialutilities_jl_tpu.parallel.stencil_fused import (
            chebyshev_rows, fused_shard_plan, recurrence_apply_fused_sharded)
        op = laplacian_nd_stencil(16, 6, 10, dtype=jnp.float32)
        plan = fused_shard_plan(op, mesh, "shard", hermitian=True)
        rows = chebyshev_rows(jnp.linspace(1.0, 0.1, 9), -3.0, 3.0,
                              jnp.float32)

        @jax.jit
        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(P("shard"),), out_specs=P("shard"))
        def run(b_local):
            return recurrence_apply_fused_sharded(plan, b_local, rows,
                                                  interpret=True)

        b = shard_vector(jnp.ones(960, jnp.float32), mesh)
        hlo = run.lower(b).compile().as_text()
        assert "all-reduce" not in hlo
        assert "collective-permute" in hlo


class TestFusedShardedTwoPass:
    def test_two_pass_fused_vs_xla_and_scipy(self, mesh, rng):
        op = laplacian_nd_stencil(16, 6, 10, dtype=jnp.float32)
        n = 16 * 6 * 10
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        t = 0.3
        w_f = expv_sharded(t, op, b, mesh, m=25, two_pass=True, fused=True)
        w_x = expv_sharded(t, op, b, mesh, m=25, two_pass=True,
                           fused=False)
        assert (float(jnp.linalg.norm(jnp.asarray(w_f) - w_x))
                / float(jnp.linalg.norm(w_x))) < 5e-5
        want = sla.expm(t * _dense(op)) @ np.asarray(b, np.float64)
        err = (np.linalg.norm(np.asarray(w_f, np.float64) - want)
               / np.linalg.norm(want))
        assert err < 5e-5

    def test_lanczos_coeffs_match_single_device(self, mesh, rng):
        # the psum'd halo-corrected (α, β) equal the single-device fused
        # record to f32 roundoff
        from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import \
            lanczos_coeffs_fused
        from exponentialutilities_jl_tpu.parallel.stencil_fused import (
            fused_shard_plan, lanczos_coeffs_fused_sharded)
        op = laplacian_nd_stencil(16, 6, 10, dtype=jnp.float32)
        n = 16 * 6 * 10
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        plan = fused_shard_plan(op, mesh, "shard", hermitian=True)

        @jax.jit
        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(P("shard"),),
                           out_specs=(P(), P(), P(), P(), P()))
        def run(b_local):
            return lanczos_coeffs_fused_sharded(plan, b_local, 12,
                                                interpret=True)

        a_s, b_s, beta0_s, mu_s, _ = run(shard_vector(b, mesh))
        a_1, b_1, beta0_1, mu_1, _ = lanczos_coeffs_fused(op, b, 12,
                                                          interpret=True)
        np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_1),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(b_s), np.asarray(b_1),
                                   rtol=1e-4, atol=1e-5)
        assert int(mu_s) == int(mu_1)

    def test_zero_b_returns_zero(self, mesh):
        op = laplacian_nd_stencil(16, 6, 10, dtype=jnp.float32)
        w = expv_sharded(0.3, op, jnp.zeros(960, jnp.float32), mesh,
                         m=10, two_pass=True, fused=True)
        assert not np.asarray(w).any()


class TestFusedSharded2D:
    def test_2d_chebyshev_fused_vs_scan_and_scipy(self, mesh, rng):
        from exponentialutilities_jl_tpu import laplacian_nd_stencil
        op = laplacian_nd_stencil(32, 20, dtype=jnp.float32)
        n = 32 * 20
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        t = 0.1
        w_f = expv_chebyshev_sharded(t, op, b, mesh, fused=True)
        w_s = expv_chebyshev_sharded(t, op, b, mesh, fused=False)
        assert (float(jnp.linalg.norm(jnp.asarray(w_f) - w_s))
                / float(jnp.linalg.norm(w_s))) < 2e-6
        want = sla.expm(t * _dense(op)) @ np.asarray(b, np.float64)
        assert (np.linalg.norm(np.asarray(w_f, np.float64) - want)
                / np.linalg.norm(want)) < 1e-5

    def test_2d_9pt_wide_halo(self, mesh, rng):
        # 9-point box: |dy| = 1 halo; asymmetric coefficients rejected
        # by hermitian gate → build symmetric
        import itertools
        offs = list(itertools.product((-1, 0, 1), repeat=2))
        cmap = {}
        for off in offs:
            key = tuple(sorted((off, tuple(-o for o in off))))
            cmap.setdefault(key, rng.standard_normal() * 0.3)
        cs = [cmap[tuple(sorted((off, tuple(-o for o in off))))]
              for off in offs]
        op = StencilOperator((32, 20), tuple(offs),
                             jnp.asarray(cs, jnp.float32),
                             is_hermitian=True)
        b = jnp.asarray(rng.standard_normal(640), jnp.float32)
        w_f = expv_chebyshev_sharded(0.05, op, b, mesh, fused=True,
                                     bounds=(-4.0, 4.0), tol=1e-6)
        want = sla.expm(0.05 * _dense(op)) @ np.asarray(b, np.float64)
        assert (np.linalg.norm(np.asarray(w_f, np.float64) - want)
                / np.linalg.norm(want)) < 1e-4

    def test_2d_two_pass_fused(self, mesh, rng):
        from exponentialutilities_jl_tpu import laplacian_nd_stencil
        op = laplacian_nd_stencil(32, 20, dtype=jnp.float32)
        b = jnp.asarray(rng.standard_normal(640), jnp.float32)
        w_f = expv_sharded(0.2, op, b, mesh, m=25, two_pass=True,
                           fused=True)
        want = sla.expm(0.2 * _dense(op)) @ np.asarray(b, np.float64)
        assert (np.linalg.norm(np.asarray(w_f, np.float64) - want)
                / np.linalg.norm(want)) < 5e-5


def test_fused_true_without_two_pass_raises(mesh):
    op = laplacian_nd_stencil(16, 6, 10, dtype=jnp.float32)
    with pytest.raises(ValueError, match="two_pass"):
        expv_sharded(0.1, op, jnp.ones(960, jnp.float32), mesh, m=10,
                     fused=True)


def test_complex_t_keeps_xla_two_pass(mesh, rng):
    # review r5: complex t must NOT ride the f32 sharded fused replay
    # (its coefficients are complex); result stays complex + accurate
    op = laplacian_nd_stencil(16, 6, 10, dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(960), jnp.float32)
    w = expv_sharded(0.1j, op, b, mesh, m=30, two_pass=True)
    assert jnp.iscomplexobj(w)
    want = sla.expm(0.1j * _dense(op)) @ np.asarray(b, np.float64)
    assert (np.linalg.norm(np.asarray(w) - want)
            / np.linalg.norm(want)) < 1e-4


class TestFusedShardedPoly:
    def _ad_op(self):
        from exponentialutilities_jl_tpu import (
            advection_diffusion_3d_stencil)
        return advection_diffusion_3d_stencil(16, 6, 10, peclet=1.5,
                                              dtype=jnp.float32)

    def test_leja_fused_matches_scan(self, mesh, rng):
        from exponentialutilities_jl_tpu.parallel import expv_leja_sharded
        op = self._ad_op()
        b = jnp.asarray(rng.standard_normal(op.shape[0]), jnp.float32)
        wf = expv_leja_sharded(0.002, op, b, mesh, tol=1e-6, fused=True)
        ws = expv_leja_sharded(0.002, op, b, mesh, tol=1e-6, fused=False)
        assert (float(jnp.linalg.norm(jnp.asarray(wf) - ws))
                / float(jnp.linalg.norm(ws))) < 5e-6

    def test_faber_fused_matches_scan(self, mesh, rng):
        from exponentialutilities_jl_tpu.parallel import expv_faber_sharded
        op = self._ad_op()
        b = jnp.asarray(rng.standard_normal(op.shape[0]), jnp.float32)
        wf = expv_faber_sharded(0.002, op, b, mesh, tol=1e-6, fused=True)
        ws = expv_faber_sharded(0.002, op, b, mesh, tol=1e-6,
                                fused=False)
        assert (float(jnp.linalg.norm(jnp.asarray(wf) - ws))
                / float(jnp.linalg.norm(ws))) < 5e-6


class TestFusedShardedVariable:
    def _vop(self, shape, rng):
        from exponentialutilities_jl_tpu import (
            variable_diffusion_nd_stencil)
        a = rng.uniform(0.5, 2.0, shape).astype(np.float32)
        return variable_diffusion_nd_stencil(jnp.asarray(a))

    def test_variable_chebyshev_fused_vs_single_device(self, mesh, rng):
        from exponentialutilities_jl_tpu.models.chebyshev import (
            expv_chebyshev)
        op = self._vop((16, 6, 10), rng)
        n = 16 * 6 * 10
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        t = 0.05
        w_sh = expv_chebyshev_sharded(t, op, b, mesh, fused=True,
                                      tol=1e-6)
        w_1 = expv_chebyshev(t, op, b, tol=1e-6, fused=False)
        assert (float(jnp.linalg.norm(jnp.asarray(w_sh) - w_1))
                / float(jnp.linalg.norm(w_1))) < 5e-6
        want = sla.expm(t * _dense(op)) @ np.asarray(b, np.float64)
        assert (np.linalg.norm(np.asarray(w_sh, np.float64) - want)
                / np.linalg.norm(want)) < 1e-4

    def test_variable_f64_routes_to_gspmd_error(self, mesh, rng):
        op = self._vop((16, 6, 10), rng)
        b = jnp.ones(960)                # f64 under the x64 conftest
        with pytest.raises(TypeError, match="GSPMD"):
            expv_chebyshev_sharded(0.05, op, b, mesh, fused=True)
