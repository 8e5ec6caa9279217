"""On-chip SELL SpMV benchmark (VERDICT r1 item 1).

Correctness on-chip at n = 1e6 vs scipy; chained-slope timing at n = 1e7
(timing methodology: .claude/skills/verify/SKILL.md). Matrix class:
banded-random (what an RCM-permuted local/mesh graph looks like), degree
d, bandwidth `band`. SELL_RESIDUE=1 selects the residue-packed variant;
SELL_BAND/SELL_DEG/SELL_WINDOW override the matrix/window.
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
from exponentialutilities_jl_tpu.ops.kernels.sell import sell_pack, sell_spmv

RESIDUE = os.environ.get('SELL_RESIDUE', '0') == '1'
MODE = os.environ.get('SELL_MODE', None)
BAND = int(os.environ.get('SELL_BAND', '700'))
DEG = int(os.environ.get('SELL_DEG', '8'))
WINDOW = int(os.environ.get('SELL_WINDOW', '2048'))


def gen(n, d, band, rng):
    rows = np.repeat(np.arange(n, dtype=np.int64), d)
    cols = np.clip(rows + rng.integers(-band // 2, band // 2, n * d), 0, n - 1)
    vals = rng.standard_normal(n * d).astype(np.float32) / d
    return rows, cols, vals


def chain_time(data, x, ks=(2, 8), reps=3):
    # data passed as a pytree ARGUMENT (a closure constant would be
    # embedded into the remote-compile request -> HTTP 413 at 10M rows)
    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(data, x, k):
        def body(i, x):
            y = sell_spmv(data, x)
            return y / jnp.max(jnp.abs(y))
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))
    out = {}
    for k in ks:
        float(chained(data, x, k))          # warm/compile
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            float(chained(data, x, k))
            best = min(best, time.time() - t0)
        out[k] = best
    k0, k1 = ks
    return (out[k1] - out[k0]) / (k1 - k0)


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    # --- correctness on-chip at n = 1e6
    import scipy.sparse as sp
    n1 = 1_000_000
    r1, c1, v1 = gen(n1, DEG, BAND, rng)
    d1 = sell_pack((r1, c1, v1), n1, window=WINDOW, residue=RESIDUE, mode=MODE)
    x1 = rng.standard_normal(n1).astype(np.float32)
    y1 = np.asarray(sell_spmv(d1, jnp.asarray(x1)))
    want1 = sp.coo_matrix((v1, (r1, c1)), shape=(n1, n1)) @ x1
    rel = np.max(np.abs(y1 - want1)) / np.max(np.abs(want1))
    print(f"on-chip correctness (n=1e6): rel={rel:.2e}", flush=True)

    # --- timing at n = 1e7
    n, d, band = 10_000_000, DEG, BAND
    rows, cols, vals = gen(n, d, band, rng)
    t0 = time.time()
    data = sell_pack((rows, cols, vals), n, window=WINDOW, residue=RESIDUE, mode=MODE)
    print(f"packed in {time.time()-t0:.1f}s tiles={data.vals.shape} "
          f"fill={data.nnz/data.vals.size:.3f} mode={data.mode}", flush=True)
    xj = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    t = chain_time(data, xj)
    nnz = data.nnz
    stream = data.vals.size * 4 + data.lidx.size * 4 + 2 * n * 4
    print(f"per-matvec {t*1e3:.3f} ms | raw-stream {(stream/t)/1e9:.0f} GB/s"
          f" | effective-CSR {(8*nnz + 8*n)/t/1e9:.0f} GB/s | "
          f"{nnz/t/1e9:.1f} Gnnz/s", flush=True)


if __name__ == "__main__":
    main()
