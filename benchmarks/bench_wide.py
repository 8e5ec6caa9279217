"""Wide-offset (second/third-neighbour) fused sweep benchmark.

Part 1 (VERDICT r3 #4): 13-point 4th-order FD Laplacian at 10M rows
(216³-class grid): one Chebyshev-style recurrence iteration through the
fused plane sweep (boundary-band masks, zb ≥ 2 slabs) vs the XLA scan
path (the r3 fallback for wide stencils). Done criterion: fused ≥ 2×
scan. Part 2 (round-4 generalization): the 19-point 6th-order FD star
(|o| = 3: three-layer boundary bands, ypad = 3 pad rows, xpad = 3 pad
lanes) through the same kernel. Chained-slope timing per
.claude/skills/verify/SKILL.md.
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
from exponentialutilities_jl_tpu.ops.stencil import StencilOperator
from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
    ghost_grid_for, recurrence_apply_fused)


def wide13(shape, dtype=jnp.float32):
    """4th-order accurate 13-point Laplacian: per axis
    (-1/12, 4/3, -5/2, 4/3, -1/12) / h² at offsets (-2..2)."""
    h = 1.0 / (shape[-1] + 1)
    offs = [(0, 0, 0)]
    co = [3 * (-5.0 / 2.0) / h ** 2]
    for ax in range(3):
        for o, c in ((1, 4 / 3), (-1, 4 / 3), (2, -1 / 12), (-2, -1 / 12)):
            off = [0, 0, 0]
            off[ax] = o
            offs.append(tuple(off))
            co.append(c / h ** 2)
    return StencilOperator(shape, offs, jnp.asarray(co, dtype),
                           is_hermitian=True)


def wide19(shape, dtype=jnp.float32):
    """6th-order accurate 19-point Laplacian star: per axis
    (1/90, -3/20, 3/2, -49/18, 3/2, -3/20, 1/90) / h² at offsets
    (-3..3)."""
    h = 1.0 / (shape[-1] + 1)
    offs = [(0, 0, 0)]
    co = [3 * (-49.0 / 18.0) / h ** 2]
    for ax in range(3):
        for o, c in ((1, 3 / 2), (-1, 3 / 2), (2, -3 / 20), (-2, -3 / 20),
                     (3, 1 / 90), (-3, 1 / 90)):
            off = [0, 0, 0]
            off[ax] = o
            offs.append(tuple(off))
            co.append(c / h ** 2)
    return StencilOperator(shape, offs, jnp.asarray(co, dtype),
                           is_hermitian=True)


def slope(fn, ks=(3, 13), reps=3):
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


def run_case(name, op, shape):
    n = int(np.prod(shape))
    sc = 1.0 / float(op.opnorm_hint())      # keep the chain finite
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    rows = jnp.asarray(np.stack([np.full(8, sc, np.float32),
                                 np.zeros(8, np.float32),
                                 np.full(8, -0.98, np.float32),
                                 np.full(8, 0.1, np.float32)], axis=1))

    gg = ghost_grid_for(op)
    print(f"[{name}] ghost grid: zb={gg.zb} rows/plane="
          f"{gg.rows_per_plane} ypad={gg.ypad} xpad={gg.nxp - gg.nx}",
          flush=True)

    # correctness guard (on-chip, one iteration vs the scan recurrence)
    @jax.jit
    def one_scan(op, b, rows):
        def step(c, r):
            om, om_p, w = c
            ca, cb, cc, cw = r[0], r[1], r[2], r[3]
            w = w + cw * om
            om, om_p = ca * op.matvec(om) + cb * om + cc * om_p, om
            return (om, om_p, w), None
        (om, _, w), _ = jax.lax.scan(step, (b, jnp.zeros_like(b),
                                            jnp.zeros_like(b)), rows)
        return w
    wf = recurrence_apply_fused(op, b, rows)
    ws = one_scan(op, b, rows)
    rel = float(jnp.max(jnp.abs(wf - ws)) / jnp.max(jnp.abs(ws)))
    print(f"[{name}] fused vs scan correctness (8 iters): {rel:.2e}",
          flush=True)

    # per-iteration slope: chain K recurrence_apply_fused(8 iters) calls.
    # CONSTANT op rides in the CLOSURE (the fused dispatch builds static
    # cpairs from concrete coefficients — a handful of floats, safe to
    # embed); a VARIABLE op must ride as a pytree ARGUMENT or its
    # GB-scale coefficient fields become embedded constants and blow the
    # remote-compile request (HTTP 413 — the CLAUDE.md closure trap).
    from exponentialutilities_jl_tpu.ops.stencil import (
        VariableStencilOperator as _V)
    if isinstance(op, _V):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain_fused_v(op_, b, rows, k):
            def body(i, x):
                w = recurrence_apply_fused(op_, x, rows)
                return w / jnp.max(jnp.abs(w))
            return jnp.sum(jax.lax.fori_loop(0, k, body, b))

        def chain_fused(b, rows, k):
            return chain_fused_v(op, b, rows, k)
    else:
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain_fused(b, rows, k):
            def body(i, x):
                w = recurrence_apply_fused(op, x, rows)
                return w / jnp.max(jnp.abs(w))
            return jnp.sum(jax.lax.fori_loop(0, k, body, b))

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain_scan(op, b, rows, k):
        def body(i, x):
            w = one_scan(op, x, rows)
            return w / jnp.max(jnp.abs(w))
        return jnp.sum(jax.lax.fori_loop(0, k, body, b))

    from exponentialutilities_jl_tpu.ops.stencil import (
        VariableStencilOperator)
    tr = 5 + (len(op.offsets) if isinstance(op, VariableStencilOperator)
              else 0)                        # coefficient planes stream
    tf = slope(lambda k: chain_fused(b, rows, k)) / 8
    print(f"[{name}] fused per-iter: {tf*1e3:.3f} ms | "
          f"{tr*4*n/tf/1e9:.0f} GB/s ({tr}n traffic)", flush=True)
    ts = slope(lambda k: chain_scan(op, b, rows, k)) / 8
    print(f"[{name}] scan  per-iter: {ts*1e3:.3f} ms", flush=True)
    print(f"[{name}] speedup: {ts/tf:.2f}x", flush=True)


def var9_2d(ny, nx, seed=0):
    """Variable-coefficient 9-point 2-D box (anisotropic diffusion with
    cross terms): per-cell fields for all 9 offsets — the round-4
    variable-box generalization (the r3 kernel was 5-point-only in
    variable mode)."""
    import itertools
    from exponentialutilities_jl_tpu.ops.stencil import (
        VariableStencilOperator)
    rng = np.random.default_rng(seed)
    offs = list(itertools.product((-1, 0, 1), repeat=2))
    fields = [jnp.asarray(
        (0.2 + rng.random(ny * nx)).astype(np.float32) / 8)
        for _ in offs]
    return VariableStencilOperator((ny, nx), offs, fields)


def seven(shape, dtype=jnp.float32):
    h = 1.0 / (shape[-1] + 1)
    offs = [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
            (0, 0, 1), (0, 0, -1)]
    co = [-6.0 / h ** 2] + [1.0 / h ** 2] * 6
    return StencilOperator(shape, offs, jnp.asarray(co, dtype),
                           is_hermitian=True)


def main():
    print("devices:", jax.devices(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    shape = (216, 216, 216)                 # 10.08M rows
    if which in ("13", "all", "both"):
        run_case("13pt-4th", wide13(shape), shape)
    if which in ("19", "all", "both"):
        run_case("19pt-6th", wide19(shape), shape)
    if which in ("var9", "all"):
        run_case("var9pt-2d", var9_2d(3162, 3162), (3162, 3162))
    # Part 3 (round-4 late): PANCAKE grids whose natural xy layers
    # overflow the scoped-VMEM budget — the axis-permuted ghost layout
    # (GhostGrid(perm=...)) re-orients the sweep along the long axis
    # instead of falling to the XLA scan (STATUS r4 "giant-xy" gap).
    if which in ("perm7", "perm", "all"):
        ps = (8, 1448, 1448)                # 16.8M cells, S=17400 natural
        run_case("perm-7pt", seven(ps), ps)
    if which in ("perm13", "perm", "all"):
        ps = (16, 1024, 1024)               # 16.8M cells, |dz|=2 wide
        run_case("perm-13pt", wide13(ps), ps)


if __name__ == "__main__":
    main()
