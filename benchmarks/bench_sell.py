"""On-chip SELL SpMV benchmark: 10M-row banded-random (RCM'd-graph class)
matrix. Chained-slope timing per .claude/skills/verify/SKILL.md."""
import sys, time
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, '/root/repo')
from exponentialutilities_jl_tpu.ops.kernels.sell import sell_pack, sell_spmv
import os
RESIDUE = os.environ.get('SELL_RESIDUE', '0') == '1'

def chain_time(fn, x, ks=(2, 8), reps=3):
    import functools
    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(x, k):
        def body(i, x):
            y = fn(x)
            return y / jnp.max(jnp.abs(y))   # normalize to avoid overflow
        return jnp.sum(body(0, x) if k == 1 else jax.lax.fori_loop(0, k, body, x))
    ts = {}
    for k in ks:
        float(chained(x, k))  # warm
        best = min(time.time() * 0 + _t(chained, x, k) for _ in range(reps))
        ts[k] = best
    k0, k1 = ks
    return (ts[k1] - ts[k0]) / (k1 - k0)

def _t(f, x, k):
    t0 = time.time()
    float(f(x, k))
    return time.time() - t0

def main():
    rng = np.random.default_rng(0)
    n, d, band = 10_000_000, 8, 700
    print(f"gen n={n} d={d} band={band} ...", flush=True)
    rows = np.repeat(np.arange(n, dtype=np.int64), d)
    cols = np.clip(rows + rng.integers(-band//2, band//2, n*d), 0, n-1)
    vals = rng.standard_normal(n*d).astype(np.float32) / d
    t0 = time.time()
    data = sell_pack((rows, cols, vals), n, window=1024, residue=RESIDUE)
    print(f"packed in {time.time()-t0:.1f}s tiles={data.vals.shape} "
          f"fill={data.nnz/data.vals.size:.3f}", flush=True)
    x = rng.standard_normal(n).astype(np.float32)
    xj = jnp.asarray(x)

    # correctness vs the XLA reference path (same math, different code)
    from exponentialutilities_jl_tpu.ops.kernels.sell import sell_spmv_ref
    y = np.asarray(sell_spmv(data, xj))
    want = np.asarray(sell_spmv_ref(data, xj))
    rel = np.max(np.abs(y - want)) / np.max(np.abs(want))
    print(f"on-chip kernel vs XLA-ref rel={rel:.2e}", flush=True)

    t = chain_time(lambda v: sell_spmv(data, v), xj)
    nnz = data.nnz
    stream = (data.vals.size * 4 + data.lidx.size * 4 + 2 * n * 4)
    eff_csr = (8 * nnz + 8 * n) / t / 1e9
    print(f"per-matvec {t*1e3:.3f} ms | raw-stream {(stream/t)/1e9:.0f} GB/s "
          f"| effective-CSR {eff_csr:.0f} GB/s | {nnz/t/1e9:.1f} Gnnz/s",
          flush=True)

if __name__ == "__main__":
    main()
