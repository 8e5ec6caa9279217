"""Batched dense exp/φ MXU benchmark with an MFU figure — VERDICT r3 #7.

The dense layer had only been benched at n=100 scalar (latency noise).
Here: ``vmap(expm_higham2005)`` and ``vmap(phi(..., 4))`` at MXU shapes
(B, n, n), n ∈ {128, 256, 512}, reporting

  * achieved algorithmic FLOP/s (analytic GEMM-equivalent counts, see
    below),
  * the measured pure-matmul rate at the same (B, n) under the SAME
    precision context (the practical roofline: library compute runs
    under ``mxu_full_precision`` = "highest", which on v5e emulates f32
    with multiple bf16 MXU passes),
  * MFU vs that matmul roofline and vs the v5e bf16 peak (197 TFLOP/s).

GEMM-equivalent counts per matrix (norms arranged for the degree-13
Padé with s squarings): expm = 6 (A²,A⁴,A⁶ + U,V assembly) + ~0.83
(the n³/3 LU + two triangular solves) + s squarings. φ (f32 auto path:
scaling + Paterson–Stockmeyer Taylor + recovery + double-argument
squaring, ops/phi_dense.py): counted from its own parameters and
printed. Chained-slope timing per .claude/skills/verify/SKILL.md.
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
from exponentialutilities_jl_tpu.ops.expm import expm_higham2005
from exponentialutilities_jl_tpu.ops.phi_dense import phi
from exponentialutilities_jl_tpu.utils.precision import mxu_full_precision

PEAK_BF16 = 197e12


def slope(fn, ks=(2, 6), reps=3):
    out = {}
    for k in ks:
        float(fn(k))
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            float(fn(k))
            best = min(best, time.time() - t0)
        out[k] = best
    k0, k1 = ks
    return (out[k1] - out[k0]) / (k1 - k0)


def bench_case(B, n, rng):
    # norm exactly 20 PER MATRIX: degree-13 bucket + s = 2 squarings
    # everywhere (uniform bucket: under vmap the degree lax.switch
    # computes ALL branches and selects — uniform norms keep the
    # comparison honest and the squaring trip count equal)
    A = rng.standard_normal((B, n, n)).astype(np.float32)
    A *= (20.0 / np.linalg.norm(A, 1, axis=(1, 2)))[:, None, None]
    Aj = jnp.asarray(A)

    @functools.partial(jax.jit, static_argnames=("k",))
    @mxu_full_precision
    def chain_mm(Aj, k):
        def body(i, X):
            Y = jnp.einsum("bij,bjk->bik", X, Aj)
            return Y / jnp.max(jnp.abs(Y))
        return jnp.sum(jax.lax.fori_loop(0, k, body, Aj))

    t_mm = slope(lambda k: chain_mm(Aj, k), ks=(8, 108))
    mm_rate = B * 2 * n ** 3 / t_mm

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain_expm(Aj, k):
        def body(i, X):
            # opaque unit factor: data dependence without changing A
            u = 1.0 + 0.0 * jnp.tanh(jnp.sum(X))
            E = jax.vmap(lambda a: expm_higham2005(a))(Aj * u)
            return E
        return jnp.sum(jax.lax.fori_loop(0, k, body, Aj))

    t_e = slope(lambda k: chain_expm(Aj, k))
    s = 2                                   # ceil(log2(20/5.37))
    gemms_expm = 6 + 0.83 + s
    e_rate = B * gemms_expm * 2 * n ** 3 / t_e

    # static-structure serving form: expm_taylor with a fixed order —
    # no degree switch, so vmap pays for exactly one branch
    from exponentialutilities_jl_tpu.ops.expm import expm_taylor

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain_taylor(Aj, k):
        def body(i, X):
            u = 1.0 + 0.0 * jnp.tanh(jnp.sum(X))
            return jax.vmap(lambda a: expm_taylor(a))(Aj * u)
        return jnp.sum(jax.lax.fori_loop(0, k, body, Aj))

    t_t = slope(lambda k: chain_taylor(Aj, k))
    # f32 taylor: theta≈1.04, order 16 → PS ≈ 3 powers + 4 Horner
    # blocks ≈ 7 GEMMs + s = ceil(log2(20/1.04)) = 5 squarings
    gemms_taylor = 7 + 5
    tt_rate = B * gemms_taylor * 2 * n ** 3 / t_t

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain_phi(Aj, k):
        def body(i, X):
            u = 1.0 + 0.0 * jnp.tanh(jnp.sum(X))
            P = jax.vmap(lambda a: phi(a, 4))(Aj * u)
            return jnp.sum(P, axis=1)
        return jnp.sum(jax.lax.fori_loop(0, k, body, Aj))

    t_p = slope(lambda k: chain_phi(Aj, k))
    # φ f32 auto path at ‖A‖=20: s_phi = ceil(log2(20)) ≈ 5 scalings;
    # PS Taylor order ~17 → ~2·√17 ≈ 8 GEMMs for the powers+Horner,
    # + recovery (4 GEMMs) + 5 squaring undo rounds × (p+1=5 GEMMs)
    gemms_phi = 8 + 4 + 5 * 5
    p_rate = B * gemms_phi * 2 * n ** 3 / t_p

    print(f"B={B:4d} n={n:4d} | matmul {mm_rate/1e12:6.1f} TF/s "
          f"({100*mm_rate/PEAK_BF16:4.1f}% bf16-peak) | "
          f"expm_h05 {t_e*1e3:7.2f} ms = {e_rate/1e12:5.1f} TF/s "
          f"({100*e_rate/mm_rate:4.0f}% mm) | "
          f"expm_taylor {t_t*1e3:7.2f} ms = {tt_rate/1e12:5.1f} TF/s "
          f"({100*tt_rate/mm_rate:4.0f}% mm) | "
          f"phi4 {t_p*1e3:7.2f} ms = {p_rate/1e12:5.1f} TF/s "
          f"({100*p_rate/mm_rate:4.0f}% mm)", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    # correctness spot-check on-chip first
    import scipy.linalg as sla
    A0 = rng.standard_normal((8, 128, 128)).astype(np.float32)
    A0 *= 20.0 / np.linalg.norm(A0[0], 1)
    E = np.asarray(jax.vmap(lambda a: expm_higham2005(a))(jnp.asarray(A0)))
    rel = max(np.linalg.norm(E[i] - sla.expm(A0[i].astype(np.float64)))
              / np.linalg.norm(sla.expm(A0[i].astype(np.float64)))
              for i in range(3))
    print(f"vmap expm vs scipy (f32): {rel:.2e}", flush=True)

    for B, n in ((512, 128), (128, 256), (32, 512)):
        bench_case(B, n, rng)


if __name__ == "__main__":
    main()
