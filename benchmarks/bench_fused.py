"""On-chip measurements for the fused Lanczos sweep and the banded Pallas
kernel (fills the round-2 BENCHMARKS.md placeholders).

Timing: slope method (chained dependent work inside one jit, scalar fetch,
slope between two chain lengths) — the only method that survives the axon
remote-PJRT tunnel (see .claude/skills/verify/SKILL.md).

  * lanczos per-iteration: time lanczos_coeffs{,_fused} at m=M1 and m=M2;
    slope = per-iteration cost (fixed costs cancel).
  * banded_spmv / stencil matvec: fori_loop chain of matvecs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_fused.py
"""

import functools
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
import exponentialutilities_jl_tpu as eu
from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
    lanczos_coeffs_fused, stencil_matvec_fused)
from exponentialutilities_jl_tpu.ops.krylov import lanczos_coeffs
from exponentialutilities_jl_tpu.ops.kernels.spmv import banded_spmv

SHAPE = (216, 216, 216)
N = SHAPE[0] * SHAPE[1] * SHAPE[2]


def _best(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def lanczos_periter(coeffs_fn, op, b, M1=8, M2=24):
    @functools.partial(jax.jit, static_argnames=("m",))
    def run(b, m):
        alphas, betas, beta0, m_used, broke = coeffs_fn(op, b, m)
        return jnp.sum(alphas) + jnp.sum(betas)

    out = {}
    for m in (M1, M2):
        float(run(b, m))  # compile + warm
        out[m] = _best(lambda: float(run(b, m)))
    return max(out[M2] - out[M1], 1e-9) / (M2 - M1)


def chain_time(step, x0, K1=3, K2=13, carry=None):
    """Slope timing. Pass big operand pytrees via ``carry`` (jit ARG, not
    closure — closure constants get embedded in the remote-compile
    request and blow the HTTP length limit at ~GB scale)."""
    @functools.partial(jax.jit, static_argnames=("K",))
    def chain(c, x, K):
        y = jax.lax.fori_loop(0, K, lambda i, y: step(c, y), x)
        return jnp.sum(y)

    out = {}
    for K in (K1, K2):
        float(chain(carry, x0, K))
        out[K] = _best(lambda: float(chain(carry, x0, K)))
    return max(out[K2] - out[K1], 1e-9) / (K2 - K1)


def main():
    res = {"backend": jax.default_backend(), "n": N}
    op = eu.laplacian_nd_stencil(*SHAPE, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(N), jnp.float32)

    # correctness cross-check first (cheap m)
    a1 = lanczos_coeffs(op, b, 8)
    a2 = lanczos_coeffs_fused(op, b, 8)
    rel = float(jnp.linalg.norm(a1[0] - a2[0]) /
                jnp.linalg.norm(a1[0]))
    res["fused_vs_xla_alpha_rel"] = rel
    print(json.dumps({"check": "fused alphas", "rel": rel}), flush=True)

    # Interleave the two variants over several passes and keep per-variant
    # minima: tunnel noise (chip re-grabs, compile-service load) perturbs
    # minutes-apart measurements by 2-5x.
    t_xla, t_fused = [], []
    for p in range(3):
        t_xla.append(lanczos_periter(lanczos_coeffs, op, b))
        t_fused.append(lanczos_periter(lanczos_coeffs_fused, op, b))
        print(json.dumps({"pass": p,
                          "xla_ms": round(t_xla[-1] * 1e3, 3),
                          "fused_ms": round(t_fused[-1] * 1e3, 3)}),
              flush=True)
    res["lanczos_xla_ms_per_iter"] = round(min(t_xla) * 1e3, 3)
    res["lanczos_fused_ms_per_iter"] = round(min(t_fused) * 1e3, 3)

    # banded k=7: the 3-D Laplacian stored as diagonals (the
    # variable-coefficient layout — same traffic as any var-coeff operator)
    nx, ny, nz = SHAPE
    offs = (-nx * ny, -nx, -1, 0, 1, nx, nx * ny)
    i = np.arange(N)
    diags = np.zeros((7, N), np.float32)
    for k, o in enumerate(offs):
        if o == 0:
            diags[k] = -6.0
        elif abs(o) == 1:  # x-neighbour: zero at x faces
            diags[k] = np.where((i % nx) != (nx - 1 if o > 0 else 0),
                                1.0, 0.0)
        elif abs(o) == nx:  # y-neighbour: zero at y faces
            iy = (i // nx) % ny
            diags[k] = np.where(iy != (ny - 1 if o > 0 else 0), 1.0, 0.0)
        else:
            diags[k] = 1.0  # z-neighbour handled by range clipping
    dj = jnp.asarray(diags)
    # cross-check Pallas banded vs the stencil matvec
    y_band = banded_spmv(dj, offs, b)
    y_sten = op.matvec(b)
    res["banded_vs_stencil_rel"] = float(
        jnp.linalg.norm(y_band - y_sten) / jnp.linalg.norm(y_sten))
    print(json.dumps({"check": "banded vs stencil",
                      "rel": res["banded_vs_stencil_rel"]}), flush=True)
    t_band = chain_time(lambda d, x: banded_spmv(d, offs, x), b,
                        K1=2, K2=6, carry=dj)
    res["banded_ms_per_matvec"] = round(t_band * 1e3, 3)
    # effective-CSR traffic: (8·nnz + 8·n) bytes at nnz = 7n
    res["banded_effective_csr_gbs"] = round(
        (8 * 7 * N + 8 * N) / t_band / 1e9, 1)
    print(json.dumps({"banded_ms": res["banded_ms_per_matvec"],
                      "banded_gbs": res["banded_effective_csr_gbs"]}),
          flush=True)

    t_sten = min(chain_time(lambda c, x: op.matvec(x), b, K1=4, K2=20)
                 for _ in range(3))
    res["stencil_ms_per_matvec"] = round(t_sten * 1e3, 3)
    t_stenf = min(chain_time(lambda c, x: stencil_matvec_fused(op, x), b,
                             K1=4, K2=20) for _ in range(3))
    res["stencil_fused_ms_per_matvec"] = round(t_stenf * 1e3, 3)
    print(json.dumps(res), flush=True)
    with open("/tmp/bench_fused.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
