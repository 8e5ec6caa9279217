"""Batched dense exp/φ MXU benchmark with an AUDITED MFU figure.

VERDICT r3 #7 introduced this bench; VERDICT r4 #8 flagged two defects,
both fixed here:

  * the matmul roofline baseline paid a data-dependent renormalization
    (full reduce + elementwise pass) per chain link, handicapping the
    denominator — kernels could report > 100% "of matmul". The baseline
    now rescales by a CONSTANT (the matrices are norm-20 by
    construction, so 1/20 keeps the chain bounded, no reduce).
  * algorithmic FLOPs were hand-counted GEMM equivalents. They are now
    read off the compiled executable (``compile().cost_analysis()``
    'flops' — XLA's own count of the optimized HLO), so the MFU column
    is defensible by construction. The hand counts are kept as a
    printed cross-check.
  * chains use the latency-calibrated traced-K harness (bench.py
    methodology): the axon tunnel round-trip is ~25 ms and overlaps
    device compute, so the old K=2/6 slopes measured noise.

Paths measured at (B, n) ∈ {(512,128), (128,256), (32,512)}, f32,
per-matrix 1-norm exactly 20:

  * matmul       — einsum bik baseline under mxu_full_precision
  * expm(batch)  — expm_higham2005_batched (the expm() route for
                   stacked input: ONE Padé branch + unmasked squaring)
  * vmap(expm)   — the per-element lax.switch form (kept to show the
                   gap the batched route closes)
  * expm_taylor  — vmapped static-structure Taylor
  * phi4         — vmap(phi(·, 4)) Taylor scaling-and-recovering

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_dense_mfu.py
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
from exponentialutilities_jl_tpu.ops.expm import (
    expm_higham2005, expm_higham2005_batched, expm_taylor)
from exponentialutilities_jl_tpu.ops.phi_dense import phi
from exponentialutilities_jl_tpu.utils.precision import mxu_full_precision

PEAK_BF16 = 197e12


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


def hlo_flops(fn, *args):
    """XLA's flop count of the optimized single-call executable."""
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception as e:                      # noqa: BLE001
        print("  (cost_analysis unavailable:", repr(e), ")", flush=True)
        return float("nan")


def bench_case(B, n, rng):
    A = rng.standard_normal((B, n, n)).astype(np.float32)
    A *= (20.0 / np.linalg.norm(A, 1, axis=(1, 2)))[:, None, None]
    Aj = jnp.asarray(A)

    rows = []

    def run(name, body, analytic_gemms=None):
        @jax.jit
        def chain(Aj, K):
            def b_(i, c):
                # opaque data dependence: the operand picks up a unit
                # factor derived from the previous link's output scalar,
                # so links serialize without changing the computation
                u = 1.0 + 0.0 * c
                out = body(Aj * u)
                return jnp.sum(out[..., 0, 0])
            return jax.lax.fori_loop(0, K, b_, jnp.float32(1.0))

        t_call = calibrated_slope(lambda K: float(chain(Aj, K)))
        fl = hlo_flops(lambda a: body(a), Aj)
        rate = fl / t_call
        rows.append((name, t_call, fl, rate))
        extra = ""
        if analytic_gemms is not None:
            extra = (f"  [hand-count {analytic_gemms:.1f} GEMMs = "
                     f"{analytic_gemms * B * 2 * n**3 / 1e9:.1f} GF vs "
                     f"HLO {fl/1e9:.1f} GF]")
        print(f"  {name:12s}: {t_call*1e3:8.3f} ms  "
              f"HLO {fl/1e9:8.1f} GF  -> {rate/1e12:6.2f} TF/s{extra}",
              flush=True)
        return rate

    print(f"B={B} n={n}", flush=True)

    @mxu_full_precision
    def mm(X):
        # constant rescale: matrices are norm-20 by construction, so
        # 1/20 bounds the chain with no data-dependent reduce (VERDICT
        # r4 #8: a reduce here handicapped the roofline denominator)
        return jnp.einsum("bij,bjk->bik", X, X) * 0.05

    mm_rate = run("matmul", mm)

    # f32 path: degree-7 cap (θ7 = 3.93) → s = ceil(log2(20/3.93)) = 3
    run("expm_batch", expm_higham2005_batched,
        analytic_gemms=4 + 1.33 + 3)
    run("vmap_expm", jax.vmap(expm_higham2005))
    run("expm_taylor", jax.vmap(expm_taylor))
    run("phi4_batch", lambda X: phi(X, 4))      # stacked → batched route
    run("phi4_vmap", jax.vmap(lambda a: phi(a, 4)))

    print("  -- % of matmul roofline:", flush=True)
    for name, t_call, fl, rate in rows[1:]:
        print(f"  {name:12s}: {100 * rate / mm_rate:5.1f}% of matmul "
              f"({100 * rate / PEAK_BF16:4.1f}% of bf16 peak)", flush=True)
    return {name: (t_call, fl, rate) for name, t_call, fl, rate in rows}


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    import scipy.linalg as sla
    A0 = rng.standard_normal((8, 128, 128)).astype(np.float32)
    A0 *= 20.0 / np.linalg.norm(A0[0], 1)
    E = np.asarray(expm_higham2005_batched(jnp.asarray(A0)))
    rel = max(np.linalg.norm(E[i] - sla.expm(A0[i].astype(np.float64)))
              / np.linalg.norm(sla.expm(A0[i].astype(np.float64)))
              for i in range(3))
    print(f"expm_batched vs scipy (f32): {rel:.2e}", flush=True)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cases = {"512": (512, 128), "128": (128, 256), "32": (32, 512)}
    for key, (B, n) in cases.items():
        if which in ("all", key):
            bench_case(B, n, rng)


if __name__ == "__main__":
    main()
