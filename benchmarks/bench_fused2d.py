"""On-chip measurements for the 2-D slab-mode fused sweep (GhostGrid2D,
round-3 STATUS gap #2): per-iteration Lanczos and Chebyshev-apply costs
on a 3162x3162 (~10M cell) 2-D Laplacian, fused vs the XLA scan paths.

Timing: slope method (chained work inside one jit, scalar fetch, slope
between two sizes) per .claude/skills/verify/SKILL.md.
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
from exponentialutilities_jl_tpu.models.chebyshev import (
    _chebyshev_apply_fused, _chebyshev_apply_scan)

NY = NX = 3162
N = NY * NX


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
        float(run(b, m))
        out[m] = _best(lambda: float(run(b, m)))
    return max(out[M2] - out[M1], 1e-9) / (M2 - M1)


def cheb_periter(apply_fn, op, b, c, h, M1=16, M2=64):
    @jax.jit
    def run(b, co):
        return jnp.sum(apply_fn(op, b, co, c, h))

    rng = np.random.default_rng(1)
    out = {}
    for m in (M1, M2):
        co = jnp.asarray(rng.standard_normal(m) / m, jnp.float32)
        float(run(b, co))
        out[m] = _best(lambda: float(run(b, co)))
    return max(out[M2] - out[M1], 1e-9) / (M2 - M1)


def main():
    res = {"backend": jax.default_backend(), "n": N, "grid": [NY, NX]}
    op = eu.laplacian_nd_stencil(NY, NX, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(N), jnp.float32)

    # on-chip correctness: fused 2-D matvec + Lanczos coeffs vs XLA
    y1 = stencil_matvec_fused(op, b)
    y2 = op.matvec(b)
    res["matvec_rel"] = float(jnp.linalg.norm(y1 - y2)
                              / jnp.linalg.norm(y2))
    a1 = lanczos_coeffs(op, b, 8)
    a2 = lanczos_coeffs_fused(op, b, 8)
    res["alphas_rel"] = float(jnp.linalg.norm(a1[0] - a2[0])
                              / jnp.linalg.norm(a1[0]))
    print(json.dumps({"check": "2d fused", "matvec_rel": res["matvec_rel"],
                      "alphas_rel": res["alphas_rel"]}), flush=True)

    lo, hi = op.spectral_bounds_hint()
    c, h = 0.5 * (hi + lo), 0.5 * (hi - lo)

    t_lx, t_lf, t_cs, t_cf = [], [], [], []
    for p in range(3):
        t_lx.append(lanczos_periter(lanczos_coeffs, op, b))
        t_lf.append(lanczos_periter(lanczos_coeffs_fused, op, b))
        t_cs.append(cheb_periter(
            lambda o, x, co, cc, hh: _chebyshev_apply_scan(
                o, x, co, cc, 1.0 / hh), op, b, c, h))
        t_cf.append(cheb_periter(_chebyshev_apply_fused, op, b, c, h))
        print(json.dumps({"pass": p,
                          "lanczos_xla_ms": round(t_lx[-1] * 1e3, 3),
                          "lanczos_fused_ms": round(t_lf[-1] * 1e3, 3),
                          "cheb_scan_ms": round(t_cs[-1] * 1e3, 3),
                          "cheb_fused_ms": round(t_cf[-1] * 1e3, 3)}),
              flush=True)
    res["lanczos_xla_ms_per_iter"] = round(min(t_lx) * 1e3, 3)
    res["lanczos_fused_ms_per_iter"] = round(min(t_lf) * 1e3, 3)
    res["cheb_scan_ms_per_iter"] = round(min(t_cs) * 1e3, 3)
    res["cheb_fused_ms_per_iter"] = round(min(t_cf) * 1e3, 3)
    print(json.dumps(res), flush=True)
    with open("/tmp/bench_fused2d.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
