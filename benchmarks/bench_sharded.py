"""Per-chip throughput of the SHARDED stencil paths vs the single-device
fused kernel (VERDICT r4 #9): shard_map over a 1-device mesh on the real
chip is the honest per-chip-efficiency proxy available on this rig — the
program contains the full sharded machinery (ghost-resident state, halo
refresh dynamic-update-slices, degenerate ppermutes) with zero actual
ICI traffic, so single-device-fused vs shard_map(1)-fused isolates the
sharding overhead exactly.

Config: 216³ (10.08M cells) 7-point 3-D Laplacian, f32, fixed-degree-8
Chebyshev exp action chained K times inside one jitted program
(calibrated-slope timing, bench.py methodology — the tunnel round trip
is ~25 ms and overlaps device execution, so K grows until the chain
dominates it).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_sharded.py
"""

import functools
import sys
import time

import numpy as np


def calibrated_slope(call, floor_signal=0.05, passes=4):
    def t(K):
        t0 = time.perf_counter()
        call(K)
        return time.perf_counter() - t0

    call(1)
    lat = min(t(1) for _ in range(3))
    K = 4
    while K < 1_000_000:
        tk = min(t(K), t(K))
        if tk >= lat + max(2.0 * lat, floor_signal):
            break
        K *= 4
    K1, K2 = K, 5 * K
    b1 = b2 = float("inf")
    for _ in range(passes):
        b1, b2 = min(b1, t(K1)), min(b2, t(K2))
    per = (b2 - b1) / (K2 - K1)
    return (b2 / K2 if per <= 0 else per), (K1, K2, lat)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from exponentialutilities_jl_tpu import laplacian_nd_stencil
    from exponentialutilities_jl_tpu.models.chebyshev import (
        _chebyshev_apply_fused, _chebyshev_apply_scan, _full_exp_coeffs)
    from exponentialutilities_jl_tpu.parallel import make_mesh, shard_vector
    from exponentialutilities_jl_tpu.parallel.stencil_fused import (
        chebyshev_rows, fused_shard_plan, recurrence_apply_fused_sharded)

    nz = 216
    n = nz ** 3
    t_exp = 0.02
    op = laplacian_nd_stencil(nz, nz, nz, dtype=jnp.float32)
    lo, hi = op.spectral_bounds_hint()
    full, c, h = _full_exp_coeffs(t_exp, float(lo), float(hi), None, 8)
    coeffs = jnp.asarray(full, jnp.float32)
    m = len(full)
    print(f"n = {n/1e6:.2f}M, degree {m}", flush=True)

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    results = {}

    def report(name, per_call):
        per_iter = per_call / m
        gbs = 5 * n * 4 / per_iter / 1e9        # fused-sweep traffic model
        results[name] = (per_call, per_iter, gbs)
        print(f"{name:14s}: {per_call*1e3:7.3f} ms/call  "
              f"{per_iter*1e3:6.3f} ms/iter  {gbs:6.1f} GB/s(5n)",
              flush=True)

    if which in ("all", "fused1"):
        @jax.jit
        def chain1(b, K):
            def body(i, x):
                return _chebyshev_apply_fused(op, x, coeffs, c, h)
            return jnp.sum(jax.lax.fori_loop(0, K, body, b))

        per, diag = calibrated_slope(lambda K: float(chain1(b, K)))
        print("  diag:", diag, flush=True)
        report("single_fused", per)

    if which in ("all", "shard_fused", "shard"):
        mesh = make_mesh(1)
        plan = fused_shard_plan(op, mesh, hermitian=True)
        rows = chebyshev_rows(coeffs, c, h, jnp.float32)

        @jax.jit
        def chain_sf2(b_sh, K):
            @functools.partial(jax.shard_map, mesh=mesh,
                               in_specs=(P("shard"), P()),
                               out_specs=P())
            def run(b_local, K):
                def body(i, x):
                    return recurrence_apply_fused_sharded(plan, x, rows)
                w = jax.lax.fori_loop(0, K[0], body, b_local)
                return jax.lax.psum(jnp.sum(w), "shard")
            return run(b_sh, K)

        b_sh = shard_vector(b, mesh)
        per, diag = calibrated_slope(
            lambda K: float(chain_sf2(b_sh, jnp.asarray([K]))))
        print("  diag:", diag, flush=True)
        report("shard1_fused", per)

    if which in ("all", "shard_scan", "shard"):
        mesh = make_mesh(1)
        from exponentialutilities_jl_tpu.parallel.krylov import _shard_op
        params, make_local, pspec = _shard_op(op, mesh, "shard")

        @jax.jit
        def chain_ss(params, b_sh, K):
            @functools.partial(jax.shard_map, mesh=mesh,
                               in_specs=(pspec, P("shard"), P()),
                               out_specs=P())
            def run(pl_, b_local, K):
                lop = make_local(pl_)

                def body(i, x):
                    return _chebyshev_apply_scan(lop, x, coeffs, c,
                                                 1.0 / h)
                w = jax.lax.fori_loop(0, K[0], body, b_local)
                return jax.lax.psum(jnp.sum(w), "shard")
            return run(params, b_sh, K)

        b_sh = shard_vector(b, mesh)
        per, diag = calibrated_slope(
            lambda K: float(chain_ss(params, b_sh, jnp.asarray([K]))))
        print("  diag:", diag, flush=True)
        report("shard1_scan", per)

    if "single_fused" in results and "shard1_fused" in results:
        r = results["shard1_fused"][0] / results["single_fused"][0]
        print(f"shard_map(1) fused overhead vs single-device: "
              f"{(r - 1) * 100:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
