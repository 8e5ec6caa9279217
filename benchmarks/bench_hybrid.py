"""Hybrid structured+SELL SpMV benchmark (VERDICT r2 item 2b).

Matrix class: what an RCM-permuted FEM/mesh graph actually looks like —
a few DENSE diagonals (self + regular-neighbor couplings) plus an
irregular low-degree tail inside the band. The hybrid decomposition
(ops/sparse.hybrid_from_scipy) routes the dense diagonals through the
BandedOperator shift kernel and only the tail through the SELL gather
kernel; this script measures pure-SELL vs hybrid on the same matrix at
n = 1e7 (chained-slope timing; methodology in
.claude/skills/verify/SKILL.md). Env: HYB_DENSE (dense diagonals,
default 5), HYB_TAIL (tail degree, default 3), HYB_BAND (default 700).
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
import scipy.sparse as sp

sys.path.insert(0, '/root/repo')
import exponentialutilities_jl_tpu as eu

NDENSE = int(os.environ.get('HYB_DENSE', '5'))
DTAIL = int(os.environ.get('HYB_TAIL', '3'))
BAND = int(os.environ.get('HYB_BAND', '700'))


def gen(n, rng):
    """NDENSE dense diagonals (offsets 0, ±1, ±2, …) + DTAIL random tail
    nnz per row within BAND."""
    rows, cols, vals = [], [], []
    offs = [0]
    for k in range(1, (NDENSE + 1) // 2 + 1):
        offs += [k, -k]
    offs = offs[:NDENSE]
    for o in offs:
        i = np.arange(max(0, -o), min(n, n - o))
        rows.append(i)
        cols.append(i + o)
        vals.append((np.full(len(i), 4.0) if o == 0
                     else np.full(len(i), -1.0)).astype(np.float32))
    tr = np.repeat(np.arange(n, dtype=np.int64), DTAIL)
    tc = np.clip(tr + rng.integers(-BAND // 2, BAND // 2, n * DTAIL),
                 0, n - 1)
    rows.append(tr)
    cols.append(tc)
    vals.append((rng.standard_normal(n * DTAIL) / 8).astype(np.float32))
    return (np.concatenate(rows), np.concatenate(cols),
            np.concatenate(vals))


def chain_time(op, x, ks=(2, 8), reps=3):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(op, x, k):
        def body(i, x):
            y = op.matvec(x)
            return y / jnp.max(jnp.abs(y))
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))
    out = {}
    for k in ks:
        float(chained(op, x, k))
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            float(chained(op, x, k))
            best = min(best, time.time() - t0)
        out[k] = best
    k0, k1 = ks
    return (out[k1] - out[k0]) / (k1 - k0)


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    # correctness at 1e6
    n1 = 1_000_000
    r1, c1, v1 = gen(n1, rng)
    A1 = sp.coo_matrix((v1, (r1, c1)), shape=(n1, n1))
    hy1 = eu.hybrid_from_scipy(A1, min_fill=0.5)
    x1 = rng.standard_normal(n1).astype(np.float32)
    y = np.asarray(hy1.matvec(jnp.asarray(x1)))
    want = A1 @ x1
    rel = np.max(np.abs(y - want)) / np.max(np.abs(want))
    nb = 0 if hy1.banded is None else int(
        np.count_nonzero(np.asarray(hy1.banded.diags)))
    print(f"hybrid correctness (n=1e6): rel={rel:.2e}; split: "
          f"banded {nb} nnz / sell "
          f"{0 if hy1.sell is None else hy1.sell.nnz} nnz", flush=True)

    # timing at 1e7
    n = 10_000_000
    rows, cols, vals = gen(n, rng)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n))
    nnz = A.tocsr().nnz
    t0 = time.time()
    hy = eu.hybrid_from_scipy(A, min_fill=0.5)
    print(f"hybrid packed in {time.time()-t0:.1f}s "
          f"(sell mode={None if hy.sell is None else hy.sell.data.mode})",
          flush=True)
    t0 = time.time()
    pure = eu.SellOperator.from_scipy(A)
    print(f"pure SELL packed in {time.time()-t0:.1f}s "
          f"(mode={pure.data.mode})", flush=True)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    for name, op in (("pure-SELL", pure), ("hybrid", hy)):
        dt = chain_time(op, x)
        gbs = (8 * nnz + 8 * n) / dt / 1e9
        print(f"{name}: {dt*1e3:.2f} ms/matvec, "
              f"effective-CSR {gbs:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
