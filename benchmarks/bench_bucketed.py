"""Degree-bucketed SELL SpMV benchmark (round 3, STATUS gap #1).

Mixed-degree 10M-row matrix with CLUSTERED degree regions (the realistic
shape: refined mesh zones / boundary layers / multi-physics blocks have
locally uniform stencil degree). Compares:
  - dynamic subroll schedule (uniform_k=False) — the r3 ~72 GB/s path,
  - forced uniform-k padding (k = max tiles/group everywhere),
  - the degree-bucketed static-per-class pack (SellBucketed).
Chained-slope timing per .claude/skills/verify/SKILL.md.
"""
import functools
import os
import sys
import time

import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')
from exponentialutilities_jl_tpu.ops.kernels.sell import (
    sell_pack, sell_spmv, sell_pack_bucketed, sell_spmv_bucketed,
    sell_pack_seg, sell_spmv_seg)

BAND = int(os.environ.get('SELL_BAND', '700'))


def gen_clustered(n, band, rng, shuffle_deg=False):
    """85% of rows degree 6 (k=1), 10% degree 20 (k=3), 5% degree 40
    (k=5) in contiguous regions — maxdeg 40 pushes the single uniform-k
    repack past its 2x padding bail-out, so plain sell_pack lands on the
    dynamic schedule. ``shuffle_deg=True`` scatters the degree
    ASSIGNMENT across rows (columns stay banded): the r3 bucketed-pack
    failure case — every 128-row group contains a degree-40 row, the
    class split degenerates, and only the lane-compacted seg pack keeps
    the static uniform-k rate (VERDICT r3 #3)."""
    deg = np.full(n, 6, np.int64)
    deg[int(0.85 * n):int(0.95 * n)] = 20
    deg[int(0.95 * n):] = 40
    if shuffle_deg:
        deg = deg[rng.permutation(n)]
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = np.clip(rows + rng.integers(-band // 2, band // 2, len(rows)),
                   0, n - 1)
    vals = rng.standard_normal(len(rows)).astype(np.float32) / 8
    return rows, cols, vals


def chain_time(fn, data, x, ks=(2, 8), reps=3):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(data, x, k):
        def body(i, x):
            y = fn(data, x)
            return y / jnp.max(jnp.abs(y))
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))
    out = {}
    for k in ks:
        float(chained(data, x, k))
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            float(chained(data, x, k))
            best = min(best, time.time() - t0)
        out[k] = best
    k0, k1 = ks
    return (out[k1] - out[k0]) / (k1 - k0)


def report(tag, t, nnz, n):
    print(f"{tag}: per-matvec {t*1e3:.3f} ms | effective-CSR "
          f"{(8*nnz + 8*n)/t/1e9:.0f} GB/s | {nnz/t/1e9:.1f} Gnnz/s",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    # correctness at n=1e6 on-chip
    import scipy.sparse as sp
    n1 = 1_000_000
    r1, c1, v1 = gen_clustered(n1, BAND, rng)
    A1 = sp.coo_matrix((v1, (r1, c1)), shape=(n1, n1)).tocsr()
    bk1 = sell_pack_bucketed((r1, c1, v1), n1)
    x1 = rng.standard_normal(n1).astype(np.float32)
    y1 = np.asarray(sell_spmv_bucketed(bk1, jnp.asarray(x1)))
    want1 = A1 @ x1
    rel = np.max(np.abs(y1 - want1)) / np.max(np.abs(want1))
    print(f"bucketed on-chip correctness (n=1e6): rel={rel:.2e}",
          flush=True)

    n = 10_000_000
    rows, cols, vals = gen_clustered(n, BAND, rng)
    nnz = len(vals)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    t0 = time.time()
    bk = sell_pack_bucketed((rows, cols, vals), n)
    print(f"bucketed pack {time.time()-t0:.1f}s classes="
          f"{[(b.uk, b.group_ptr.shape[0]-1) for b in bk.buckets]}",
          flush=True)
    t = chain_time(sell_spmv_bucketed, bk, x)
    report("bucketed", t, nnz, n)

    t0 = time.time()
    dd = sell_pack((rows, cols, vals), n, uniform_k=False)
    print(f"dynamic pack {time.time()-t0:.1f}s mode={dd.mode} "
          f"uk={dd.uk} tiles={dd.vals.shape[0]}", flush=True)
    t = chain_time(sell_spmv, dd, x)
    report("dynamic", t, nnz, n)

    t0 = time.time()
    du = sell_pack((rows, cols, vals), n, uniform_k=True)
    print(f"forced uniform pack {time.time()-t0:.1f}s uk={du.uk} "
          f"tiles={du.vals.shape[0]}", flush=True)
    t = chain_time(sell_spmv, du, x)
    report("uniform-padded", t, nnz, n)

    t0 = time.time()
    sg = sell_pack_seg((rows, cols, vals), n)
    print(f"seg pack (clustered) {time.time()-t0:.1f}s steps="
          f"{sg.base.seg} tiles={sg.base.vals.shape[0]}", flush=True)
    t = chain_time(sell_spmv_seg, sg, x)
    report("seg (clustered)", t, nnz, n)

    # ---- SCATTERED degree assignment (VERDICT r3 #3): bucketing
    # degenerates (every group holds a degree-40 row); the seg pack is
    # degree-layout-blind.
    del rows, cols, vals, sg, dd, du, bk
    rows, cols, vals = gen_clustered(n, BAND, rng, shuffle_deg=True)
    nnz = len(vals)

    t0 = time.time()
    sg = sell_pack_seg((rows, cols, vals), n)
    print(f"seg pack (scattered) {time.time()-t0:.1f}s steps="
          f"{sg.base.seg} tiles={sg.base.vals.shape[0]}", flush=True)
    t = chain_time(sell_spmv_seg, sg, x)
    report("seg (scattered)", t, nnz, n)
    del sg

    t0 = time.time()
    bk = sell_pack_bucketed((rows, cols, vals), n)
    print(f"bucketed pack (scattered) {time.time()-t0:.1f}s classes="
          f"{[(b.uk, b.group_ptr.shape[0]-1) for b in bk.buckets]}",
          flush=True)
    t = chain_time(sell_spmv_bucketed, bk, x)
    report("bucketed (scattered)", t, nnz, n)


if __name__ == "__main__":
    main()
