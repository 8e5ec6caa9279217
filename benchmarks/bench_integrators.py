"""On-chip exponential-integrator benchmark: 2-D Allen-Cahn at 2048²
(4.2M cells), u' = ν·Δu + u − u³, Dirichlet.

Compares the device-resident fixed-step `etdrk4_device` (whole
integration = ONE lax.scan program) against the host-looped adaptive
`etdrk4` (4 kiops calls per step through the tunnel) and reports
ms/step. Correctness: device vs host drivers cross-checked at 256²
against a scipy Radau reference first.

Timing: slope between two scan lengths inside one jitted program
(.claude/skills/verify/SKILL.md).
"""
import json
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import exponentialutilities_jl_tpu as eu
from exponentialutilities_jl_tpu.models.integrators import _etdrk4_scan

NU = 1e-4


def make_problem(ny, nx, dtype=jnp.float32):
    dx = 1.0 / (nx + 1)
    op = eu.StencilOperator(
        (ny, nx), [(0, 0), (0, 1), (0, -1), (1, 0), (-1, 0)],
        jnp.asarray([-4.0, 1.0, 1.0, 1.0, 1.0], dtype) / dx ** 2 * NU,
        is_hermitian=True)
    yy, xx = np.meshgrid(np.arange(1, ny + 1) / (ny + 1),
                         np.arange(1, nx + 1) / (nx + 1), indexing="ij")
    u0 = (np.sin(np.pi * xx) * np.sin(np.pi * yy)
          * (1 + 0.3 * np.cos(4 * np.pi * xx))).reshape(-1) * 0.5
    return op, jnp.asarray(u0, dtype)


def _best(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    Nf = lambda u: u - u ** 3

    # --- correctness at 256² vs scipy Radau (f32 device, f64 reference)
    op_s, u0_s = make_problem(256, 256)
    from scipy.integrate import solve_ivp
    D = op_s.to_banded()
    f_np = lambda t, u: (np.asarray(D.matvec(jnp.asarray(
        u, jnp.float32)), np.float64) + u - u ** 3)
    sol = solve_ivp(f_np, (0.0, 1.0), np.asarray(u0_s, np.float64),
                    method="Radau", rtol=1e-8, atol=1e-10)
    ref = sol.y[:, -1]
    ud = np.asarray(eu.etdrk4_device(op_s, Nf, u0_s, (0.0, 1.0), 0.05,
                                     m=16))
    rel = np.linalg.norm(ud - ref) / np.linalg.norm(ref)
    print(json.dumps({"check": "256^2 etdrk4_device vs Radau",
                      "rel": float(rel)}), flush=True)

    # --- scale: 2048² (4.2M cells), ms per ETDRK4 step
    ny = nx = 2048
    op, u0 = make_problem(ny, nx)
    h = 0.02
    m = 16

    def run(nsteps):
        u = _etdrk4_scan(op, u0, h, N=Nf, nsteps=nsteps, m=m, iop=2,
                         expm_method="taylor")
        return float(jnp.sum(u))

    out = {}
    for K in (2, 10):
        run(K)                        # compile + warm
        out[K] = _best(lambda: run(K))
    dev_ms = (out[10] - out[2]) / 8 * 1e3
    print(json.dumps({"n": ny * nx, "m": m,
                      "etdrk4_device_ms_per_step": round(dev_ms, 2)}),
          flush=True)

    # host-looped adaptive etdrk4, same problem, few steps
    t0 = time.perf_counter()
    eu.etdrk4(op, Nf, u0, (0.0, 4 * h), h, m=m)
    host_ms = (time.perf_counter() - t0) / 4 * 1e3
    print(json.dumps({"etdrk4_host_ms_per_step": round(host_ms, 2),
                      "device_speedup": round(host_ms / dev_ms, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
