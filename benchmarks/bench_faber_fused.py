"""Round-3 non-Hermitian benchmarks: the fused asymmetric plane sweep
and the Faber ellipse basis.

1. Fused recurrence vs XLA scan, per polynomial iteration, on the
   10M-row asymmetric 3-D advection–diffusion stencil
   (VERDICT r2 item 6: the non-Hermitian drivers' inner loop).
2. Faber vs Leja stiff φ-driver at t·s ≈ 1100 on 1-D n = 1e6
   (VERDICT r2 item 7: 28 substeps → ≤8; both on the XLA scan path so
   the substep-count effect is isolated).

Timing: chained-slope (methodology: .claude/skills/verify/SKILL.md).
"""
import functools
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import exponentialutilities_jl_tpu as eu
from exponentialutilities_jl_tpu.models.faber import (
    _faber_rows, _resolve_ellipse, _psi_samples, faber_coeffs)
from exponentialutilities_jl_tpu.models.leja import (
    _leja_points_sup, _divided_differences, _newton_rows)
from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
    recurrence_apply_fused)


def slope(fn, ks=(2, 8), reps=3):
    out = {}
    for k in ks:
        float(fn(k))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(k))
            best = min(best, time.perf_counter() - t0)
        out[k] = best
    k0, k1 = ks
    return (out[k1] - out[k0]) / (k1 - k0)


def bench_fused_iteration():
    print("== fused asymmetric sweep vs XLA scan (10M rows) ==",
          flush=True)
    from exponentialutilities_jl_tpu.models.faber import _faber_apply

    op = eu.advection_diffusion_3d_stencil(216, 216, 216, peclet=10.0,
                                           dtype=jnp.float32)
    n = 216 ** 3
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    c, alpha, beta, gamma, rho = _resolve_ellipse(op, None)
    m = 64
    tau = 30.0 / gamma
    nsamp = 1 << int(np.ceil(np.log2(4 * m)))
    with np.errstate(over="ignore"):
        vals = np.exp(_psi_samples(tau, c, gamma, rho, nsamp))
    a, _ = faber_coeffs(vals, rho, m)
    a = np.real(a).astype(np.float32)
    rows = jnp.asarray(_faber_rows(a, c, 1.0 / gamma, rho), jnp.float32)
    aj = jnp.asarray(a)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain_xla(b, k):
        def body(i, x):
            y = _faber_apply(op, x, aj, c, 1.0 / gamma, rho, m, 1)
            return y / jnp.max(jnp.abs(y))
        return jnp.sum(jax.lax.fori_loop(0, k, body, b))

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain_fused(b, k):
        def body(i, x):
            y = recurrence_apply_fused(op, x, rows)
            return y / jnp.max(jnp.abs(y))
        return jnp.sum(jax.lax.fori_loop(0, k, body, b))

    # numerics cross-check first
    w_x = np.asarray(_faber_apply(op, b, aj, c, 1.0 / gamma, rho, m, 1))
    w_f = np.asarray(recurrence_apply_fused(op, b, rows))
    rel = np.max(np.abs(w_x - w_f)) / np.max(np.abs(w_x))
    print(f"fused vs XLA numerics: {rel:.2e}", flush=True)

    t_x = slope(lambda k: chain_xla(b, k)) / m
    t_f = slope(lambda k: chain_fused(b, k)) / m
    print(f"XLA scan: {t_x*1e3:.3f} ms/iteration; "
          f"fused: {t_f*1e3:.3f} ms/iteration; "
          f"speedup {t_x/t_f:.1f}x (degree {m})", flush=True)


def bench_faber_vs_leja_driver():
    print("== stiff phi-driver: Faber (3 substeps) vs Leja (28) ==",
          flush=True)
    n = 1_000_000
    dt = jnp.float32
    d_c, a_c = 1e3, 2e2
    op = eu.StencilOperator((n,), ((-1,), (0,), (1,)),
                            jnp.asarray([d_c + a_c, -2 * d_c - a_c, d_c],
                                        dt), is_hermitian=False)
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.standard_normal((n, 3)), dt)
    t_end = 1.0

    def best(fn, reps=3):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    U = {}

    def run_leja():
        U["leja"] = jax.block_until_ready(eu.phiv_timestep_leja(
            [t_end], op, B, tol=1e-7, max_z=40.0))

    def run_faber():
        U["faber"] = jax.block_until_ready(eu.phiv_timestep_faber(
            [t_end], op, B, tol=1e-7))

    tl = best(run_leja)
    tf = best(run_faber)
    rel = (np.linalg.norm(np.asarray(U["faber"]) - np.asarray(U["leja"]))
           / np.linalg.norm(np.asarray(U["leja"])))
    print(f"leja (max_z=40): {tl:.3f} s; faber (max_z=512): {tf:.3f} s; "
          f"speedup {tl/tf:.1f}x; cross-driver rel {rel:.2e}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "fused"):
        bench_fused_iteration()
    if which in ("all", "driver"):
        bench_faber_vs_leja_driver()
