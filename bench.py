"""Benchmark: Krylov expv on the 1-D Laplacian, N=1e5 (BASELINE config #2).

Prints ONE JSON line:
  metric       expv wall-time per call (Lanczos m=30 on N=100k stencil)
  value        milliseconds on the current default backend (TPU when present)
  vs_baseline  speedup over scipy.sparse.linalg.expm_multiply on host CPU —
               the Python stand-in for the reference's expv path (the
               reference publishes no numbers of its own, BASELINE.md).

Extra keys record accuracy vs the float64 oracle and the effective SpMV
bandwidth of the stencil matvec so per-chip speed-of-light is trackable.
"""

import json
import time

import numpy as np


def _time(fn, iters: int) -> float:
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    import jax
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from exponentialutilities_jl_tpu import laplacian_1d
    from exponentialutilities_jl_tpu.models.expv import (build_subspace,
                                                        expv_from_basis)

    backend = jax.default_backend()
    n = 100_000
    m = 30
    t = 0.5
    dtype = jnp.float32 if backend == "tpu" else jnp.float64

    op = laplacian_1d(n, dtype=dtype)
    rng = np.random.default_rng(0)
    b_host = rng.standard_normal(n)
    b = jnp.asarray(b_host, dtype=dtype)

    @jax.jit
    def run(diags, b):
        from exponentialutilities_jl_tpu import BandedOperator
        lop = BandedOperator(diags, (-1, 0, 1), is_hermitian=True)
        Ks = build_subspace(lop, b, m)
        return expv_from_basis(t, Ks)

    w = run(op.diags, b)
    jax.block_until_ready(w)  # compile
    iters = 20
    dt_s = _time(lambda: run(op.diags, b), iters)
    ms = dt_s * 1e3

    # Accuracy vs scipy's Krylov oracle (float64 host).
    import scipy.sparse as sp
    from scipy.sparse.linalg import expm_multiply

    A = sp.diags([np.ones(n - 1), -2 * np.ones(n), np.ones(n - 1)],
                 [-1, 0, 1], format="csr")
    t0 = time.perf_counter()
    ref = expm_multiply(t * A, b_host)
    scipy_ms = (time.perf_counter() - t0) * 1e3
    rel_err = float(np.linalg.norm(np.asarray(w, np.float64) - ref)
                    / np.linalg.norm(ref))

    # Effective stencil-SpMV bandwidth: bytes touched per matvec ≈
    # diags (3n) read + x read + y write, m+1 matvecs per call.
    itemsize = np.dtype(np.float32 if backend == "tpu" else np.float64).itemsize
    bytes_per_mv = (3 * n + 2 * n) * itemsize
    spmv_gbs = (m + 1) * bytes_per_mv / dt_s / 1e9

    print(json.dumps({
        "metric": "expv_laplacian1d_n1e5_m30_ms",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(scipy_ms / ms, 2),
        "backend": backend,
        "rel_err_vs_scipy": rel_err,
        "scipy_expm_multiply_ms": round(scipy_ms, 1),
        "effective_spmv_gbs": round(spmv_gbs, 2),
    }))


if __name__ == "__main__":
    main()
