"""Quarter-billion-row scale demonstration on one v5e chip.

Two grids, both through the PUBLIC ``expv_chebyshev`` path (fused
Pallas sweep, no inner products — the flagship large-n Hermitian
action):

  * 512³  = 134.2M cells — the largest CUBE whose natural xy layer
    fits the scoped-VMEM plane budget (S = 2576 ≤ 2900 rows).
  * 368×768×768 = 217.1M cells — a grid whose NATURAL layers overflow
    the budget (S = 5390) and only runs fused through the round-4
    axis-permuted ghost layout (sweep along the 768 axis, S = 2592).

Correctness at this n has no dense oracle; the check is the semigroup
identity exp(tA)b = exp(t/2·A)(exp(t/2·A)b) evaluated entirely
on-chip (the SURVEY §4 large-n strategy), plus the Chebyshev
truncation guard (raises on non-convergence).

Timing: chained-slope rule (.claude/skills/verify/SKILL.md) — K
dependent full expv evaluations inside ONE jitted program, scalar out.
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
from exponentialutilities_jl_tpu.models.chebyshev import expv_chebyshev
from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
    ghost_grid_for)


def slope(fn, ks=(2, 6), reps=3):
    out = {}
    for k in ks:
        float(fn(k))
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            float(fn(k))
            best = min(best, time.time() - t0)
        out[k] = best
    k0, k1 = ks
    return (out[k1] - out[k0]) / (k1 - k0)


def run(shape, t=50.0):
    # unit-coefficient Laplacian spectrum ⊂ [-12, 0]; t = 50 puts the
    # Chebyshev argument at z = t·(hi−lo)/2 ≈ 300 — the stiff-action
    # regime (degree ≈ z + O(log 1/tol))
    n = int(np.prod(shape))
    op = laplacian_nd_stencil(*shape, dtype=jnp.float32)
    gg = ghost_grid_for(op)
    print(f"[{shape}] n = {n/1e6:.1f}M cells | ghost perm={gg.perm} "
          f"rows/plane={gg.rows_per_plane}", flush=True)
    lo, hi = op.spectral_bounds_hint()
    bounds = (float(lo), float(hi))

    # deterministic unit-norm b built ON-CHIP (a 217M-element host
    # transfer through the tunnel is slower than the whole solve)
    @jax.jit
    def make_b():
        # f32 indices quantize above 2^24 (n reaches 217M), so the tail
        # of b plateaus piecewise — acceptable for a deterministic bench
        # seed (the semigroup oracle only needs a fixed unit vector)
        x = jnp.arange(n, dtype=jnp.float32)
        b = jnp.sin(1e-3 * x) + 0.5 * jnp.cos(2.7e-4 * x)
        return b / jnp.linalg.norm(b)
    b = make_b()
    jax.block_until_ready(b)

    ev = functools.partial(expv_chebyshev, bounds=bounds, tol=1e-7)

    # semigroup check, fully on-chip
    @jax.jit
    def semigroup(b):
        w_full = ev(t, op, b)
        w_half = ev(0.5 * t, op, ev(0.5 * t, op, b))
        num = jnp.linalg.norm(w_full - w_half)
        den = jnp.linalg.norm(w_full)
        return num / den
    rel = float(semigroup(b))
    print(f"[{shape}] semigroup identity rel err: {rel:.2e}", flush=True)

    # the degree the tail control picked (host-side, from the bounds)
    from exponentialutilities_jl_tpu.models.chebyshev import (
        _full_exp_coeffs)
    full, _, _ = _full_exp_coeffs(t, bounds[0], bounds[1], 1e-7, None)
    deg = len(full)
    print(f"[{shape}] Chebyshev degree m = {deg}", flush=True)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(b, k):
        def body(i, x):
            w = ev(t, op, x)
            return w / jnp.linalg.norm(w)
        return jnp.sum(jax.lax.fori_loop(0, k, body, b))

    tw = slope(lambda k: chain(b, k))
    gbs = 5 * 4 * n * deg / tw / 1e9      # 5n fused traffic per degree
    print(f"[{shape}] full expv wall: {tw*1e3:.1f} ms "
          f"({tw/deg*1e3:.3f} ms/iter, {gbs:.0f} GB/s fused-sweep rate)",
          flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    if which in ("cube", "all"):
        run((512, 512, 512))
    if which in ("perm", "all"):
        run((368, 768, 768))


if __name__ == "__main__":
    main()
