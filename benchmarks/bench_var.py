"""On-chip measurement: variable-coefficient fused Lanczos sweep vs the
XLA alternatives at 10M rows (216³ ∇·(a∇u), f32).

Per-iteration cost via the m-slope method (see bench_fused.py): time
lanczos_coeffs{,_fused} at m=M1 and m=M2, slope = cost/iteration —
M2 = 104 so the slope signal (~80 ms) clearly dominates the ~25 ms
tunnel round-trip that OVERLAPS device execution (r5 postmortem). The
operator rides as a jit ARG (its (7, n) coefficient fields are ~283 MB —
closure constants blow the remote-compile request size).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_var.py
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
    lanczos_coeffs_fused)
from exponentialutilities_jl_tpu.ops.krylov import lanczos_coeffs

SHAPE = (216, 216, 216)
N = SHAPE[0] * SHAPE[1] * SHAPE[2]


def _best(fn, reps=4):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def periter(coeffs_fn, op, b, M1=8, M2=104):
    @functools.partial(jax.jit, static_argnames=("m",))
    def run(op, b, m):
        alphas, betas, beta0, m_used, broke = coeffs_fn(op, b, m)
        return jnp.sum(alphas) + jnp.sum(betas)

    out = {}
    for m in (M1, M2):
        float(run(op, b, m))   # compile + warm
        out[m] = _best(lambda: float(run(op, b, m)))
    return max(out[M2] - out[M1], 1e-9) / (M2 - M1)


def main():
    res = {"backend": jax.default_backend(), "n": N}
    rng = np.random.default_rng(0)
    a = rng.uniform(0.5, 2.0, SHAPE).astype(np.float32)
    op = eu.variable_diffusion_nd_stencil(a)
    b = jnp.asarray(rng.standard_normal(N), jnp.float32)

    # correctness cross-check (cheap m)
    a1 = lanczos_coeffs(op, b, 8)
    a2 = lanczos_coeffs_fused(op, b, 8)
    rel = float(jnp.linalg.norm(a1[0] - a2[0]) / jnp.linalg.norm(a1[0]))
    res["var_fused_vs_xla_alpha_rel"] = rel
    print(json.dumps({"check": "var fused alphas", "rel": rel}), flush=True)

    t_xla, t_fused = [], []
    for p in range(3):
        t_xla.append(periter(lanczos_coeffs, op, b))
        t_fused.append(periter(lanczos_coeffs_fused, op, b))
        print(json.dumps({"pass": p,
                          "xla_ms": round(t_xla[-1] * 1e3, 3),
                          "fused_ms": round(t_fused[-1] * 1e3, 3)}),
              flush=True)
    res["var_lanczos_xla_ms_per_iter"] = round(min(t_xla) * 1e3, 3)
    res["var_lanczos_fused_ms_per_iter"] = round(min(t_fused) * 1e3, 3)
    # effective traffic of the fused sweep: 12n f32 words/iteration
    res["var_fused_gbs"] = round(12 * N * 4 / min(t_fused) / 1e9, 1)
    print(json.dumps(res), flush=True)
    with open("/tmp/bench_var.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
