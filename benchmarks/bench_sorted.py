"""Scattered-degree SpMV: the degree-sorted conjugated container AND
the experimental settlement of the r4 ~100 GB/s floor (VERDICT r4 #5).

Two configs:
  * WIDE band (±350, the r4 bench layout): the degree-sort conversion
    CANNOT pack — the conjugated matrix's per-group column spans exceed
    the hard 1024-column gather window for ANY usable sort window
    (3·sort_window + band > budget). This script demonstrates the raise:
    the windowed-gather constraint that caps the seg pack at ~100 GB/s
    blocks the permutation route too — the floor is an experiment now,
    not an analysis. seg is measured as the answer for this domain.
  * NARROW band (±120): mode="sorted" applies — measures the inner
    window-sorted bucketed SpMV, the (banded) permutation passes, the
    hoisted-solve effective rate, and seg on the same matrix for
    comparison.

Effective-CSR GB/s convention matches bench_bucketed.py: bytes =
nnz·(4+4) + rows·4 + 2·n·4 per matvec.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_sorted.py
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
from exponentialutilities_jl_tpu.ops.sparse import SellOperator


def gen_scattered(n, rng, band=350):
    deg = np.full(n, 6, np.int64)
    deg[int(0.85 * n):int(0.95 * n)] = 20
    deg[int(0.95 * n):] = 40
    rng.shuffle(deg)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = np.clip(rows + rng.integers(-band, band, rows.size), 0, n - 1)
    vals = rng.standard_normal(rows.size).astype(np.float32) / deg[rows]
    return rows, cols, vals, int(rows.size)


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
    return b2 / K2 if per <= 0 else per


def csr_bytes(nnz, n):
    return nnz * 8 + n * 4 + 2 * n * 4


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    # the WIDE-band conversion impossibility (floor evidence)
    n1 = 1_000_000
    rw, cw, vw, _ = gen_scattered(n1, rng, band=350)
    try:
        SellOperator.from_coo(rw, cw, vw, n1, mode="sorted")
        print("UNEXPECTED: wide-band sorted pack succeeded", flush=True)
    except ValueError as e:
        print(f"wide band=350: sorted conversion rejected as expected "
              f"({str(e)[:80]}...)", flush=True)

    # correctness at 1e6 on-chip (narrow band where sorted applies)
    import scipy.sparse as sp
    r1, c1, v1, _ = gen_scattered(n1, rng, band=120)
    op1 = SellOperator.from_coo(r1, c1, v1, n1, mode="sorted")
    x1 = rng.standard_normal(n1).astype(np.float32)
    y1 = np.asarray(op1.matvec(jnp.asarray(x1)))
    want = sp.coo_matrix((v1, (r1, c1)), shape=(n1, n1)) @ x1
    print(f"sorted on-chip correctness (n=1e6, band=120): "
          f"rel={np.max(np.abs(y1-want))/np.max(np.abs(want)):.2e}",
          flush=True)

    n = 10_000_000
    rows, cols, vals, nnz = gen_scattered(n, rng, band=350)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    eff = csr_bytes(nnz, n)

    def spmv_chain(data_op):
        @jax.jit
        def chain(op, x, K):
            def body(i, x):
                y = op.matvec(x)
                return y / jnp.max(jnp.abs(y))
            return jnp.sum(jax.lax.fori_loop(0, K[0], body, x))
        return lambda K: float(chain(data_op, x, jnp.asarray([K])))

    results = {}
    if which in ("all", "seg"):
        t0 = time.time()
        op = SellOperator.from_coo(rows, cols, vals, n, mode="seg")
        print(f"seg pack {time.time()-t0:.1f}s", flush=True)
        t_mv = calibrated_slope(spmv_chain(op))
        results["seg"] = t_mv
        print(f"seg (scattered):    {t_mv*1e3:7.3f} ms  "
              f"{eff/t_mv/1e9:6.1f} GB/s-effCSR", flush=True)

    if which in ("all", "sorted"):
        # narrow-band scattered config — the sorted container's domain
        rows, cols, vals, nnz = gen_scattered(n, rng, band=120)
        x = jnp.asarray(np.asarray(x))
        eff = csr_bytes(nnz, n)
        t0 = time.time()
        sop = SellOperator.from_coo(rows, cols, vals, n, mode="sorted")
        print(f"sorted pack (band=120) {time.time()-t0:.1f}s", flush=True)

        t0 = time.time()
        op_seg2 = SellOperator.from_coo(rows, cols, vals, n, mode="seg")
        print(f"seg pack (band=120) {time.time()-t0:.1f}s", flush=True)
        t_s2 = calibrated_slope(spmv_chain(op_seg2))
        print(f"seg (band=120):     {t_s2*1e3:7.3f} ms  "
              f"{eff/t_s2/1e9:6.1f} GB/s-effCSR", flush=True)

        # inner clustered SpMV alone (per-iteration cost when hoisted)
        t_in = calibrated_slope(spmv_chain(sop.inner))
        print(f"sorted inner SpMV:  {t_in*1e3:7.3f} ms  "
              f"{eff/t_in/1e9:6.1f} GB/s-effCSR", flush=True)

        # one permutation pass (degree-1 SELL)
        t_p = calibrated_slope(spmv_chain(sop.pfwd))
        print(f"permute pass:       {t_p*1e3:7.3f} ms  "
              f"{2*n*4/t_p/1e9:6.1f} GB/s(2n)", flush=True)

        # hoisted-solve effective rate: m iterations + 2 permutes
        for m in (8, 30):
            t_eff = t_in + 2 * t_p / m
            print(f"hoisted m={m:2d}:       {t_eff*1e3:7.3f} ms/mv  "
                  f"{eff/t_eff/1e9:6.1f} GB/s-effCSR", flush=True)
        results["sorted_inner"] = t_in
        results["permute"] = t_p

        # full conjugated matvec (unhoisted 3-SpMV form)
        t_c = calibrated_slope(spmv_chain(sop))
        print(f"conjugated matvec:  {t_c*1e3:7.3f} ms  "
              f"{eff/t_c/1e9:6.1f} GB/s-effCSR", flush=True)


if __name__ == "__main__":
    main()
