"""Row-tiled fused sweep vs the XLA scan on a grid past the plane
budget in EVERY orientation (VERDICT r4 #6): 608³ = 224.8M cells — the
untiled planner raises (S ≈ 3050 rows/plane), so this grid used to fall
to the XLA pad/slice recurrence.

Measures per recurrence iteration (8-step Chebyshev-class chains,
calibrated traced-K slopes): tiled fused vs scan, plus the ky/tile
geometry; correctness via on-chip comparison of one 5-step recurrence.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_tiled.py [nz]
"""
import functools
import sys
import time

import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')
from exponentialutilities_jl_tpu import laplacian_nd_stencil
from exponentialutilities_jl_tpu.models.chebyshev import (
    _chebyshev_apply_scan, _full_exp_coeffs)
from exponentialutilities_jl_tpu.ops.kernels.dispatch import chebyshev_rows
from exponentialutilities_jl_tpu.ops.kernels.tiled import (
    recurrence_apply_fused_tiled, tiled_plan_for)


def calibrated_slope(call, floor_signal=0.05, passes=3):
    def t(K):
        t0 = time.perf_counter()
        call(K)
        return time.perf_counter() - t0
    call(1)
    lat = min(t(1) for _ in range(2))
    K = 2
    while K < 1_000_000:
        tk = t(K)
        if tk >= lat + max(2.0 * lat, floor_signal):
            break
        K *= 4
    K1, K2 = K, 5 * K
    b1 = b2 = float("inf")
    for _ in range(passes):
        b1, b2 = min(b1, t(K1)), min(b2, t(K2))
    per = (b2 - b1) / (K2 - K1)
    return b2 / K2 if per <= 0 else per


def main():
    nz = int(sys.argv[1]) if len(sys.argv) > 1 else 608
    print("devices:", jax.devices(), flush=True)
    op = laplacian_nd_stencil(nz, nz, nz, dtype=jnp.float32)
    n = nz ** 3
    plan = tiled_plan_for(op, hermitian=True)
    print(f"n = {n/1e6:.1f}M | tiled plan ky={plan.ky} ny_t={plan.ny_t} "
          f"rows/plane={plan.gg.rows_per_plane} zb={plan.gg.zb} "
          f"perm={plan.perm}", flush=True)

    lo, hi = op.spectral_bounds_hint()
    full, c, h = _full_exp_coeffs(0.01, float(lo), float(hi), None, 8)
    coeffs = jnp.asarray(full, jnp.float32)
    m = len(full)
    rows = chebyshev_rows(coeffs, c, h, jnp.float32)

    @jax.jit
    def make_b():
        x = jnp.arange(n, dtype=jnp.float32)
        b = jnp.sin(1e-3 * x) + 0.5 * jnp.cos(2.7e-4 * x)
        return b / jnp.linalg.norm(b)
    b = make_b()
    jax.block_until_ready(b)

    # correctness: one 5-step recurrence, tiled vs scan, on-chip
    rows5 = rows[:5]

    @jax.jit
    def one_tiled(b):
        return recurrence_apply_fused_tiled(op, b, rows5, plan=plan)

    @jax.jit
    def one_scan(b):
        return _chebyshev_apply_scan(op, b, coeffs[:5], c, 1.0 / h)

    wt = one_tiled(b)
    ws = one_scan(b)
    rel = float(jnp.linalg.norm(wt - ws) / jnp.linalg.norm(ws))
    print(f"tiled vs scan correctness (5 steps): rel={rel:.2e}",
          flush=True)
    del wt, ws

    @jax.jit
    def chain_tiled(b, K):
        def body(i, x):
            w = recurrence_apply_fused_tiled(op, x, rows, plan=plan)
            return w / jnp.linalg.norm(w)
        return jnp.sum(jax.lax.fori_loop(0, K, body, b))

    @jax.jit
    def chain_scan(b, K):
        def body(i, x):
            w = _chebyshev_apply_scan(op, x, coeffs, c, 1.0 / h)
            return w / jnp.linalg.norm(w)
        return jnp.sum(jax.lax.fori_loop(0, K, body, b))

    t_tiled = calibrated_slope(lambda K: float(chain_tiled(b, K)))
    t_scan = calibrated_slope(lambda K: float(chain_scan(b, K)))
    per_t, per_s = t_tiled / m, t_scan / m
    print(f"tiled : {t_tiled*1e3:8.2f} ms/call  {per_t*1e3:6.2f} ms/iter "
          f"{5*n*4/per_t/1e9:6.1f} GB/s(5n)", flush=True)
    print(f"scan  : {t_scan*1e3:8.2f} ms/call  {per_s*1e3:6.2f} ms/iter "
          f"{9*n*4/per_s/1e9:6.1f} GB/s(9n)", flush=True)
    print(f"speedup: {t_scan/t_tiled:.2f}x", flush=True)


if __name__ == "__main__":
    main()
