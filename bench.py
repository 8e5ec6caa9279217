"""Benchmark: expv on the 1-D Laplacian, N=1e5 (BASELINE config #2).

Prints ONE JSON line:
  metric       expv wall-time per call on the N=100k stencil — the
               library's fastest correct method for this (Hermitian)
               operator: the single-pass Chebyshev action with the
               WHOLE recurrence in one VMEM-resident Pallas dispatch
               (ops/kernels/resident.py; exact Gershgorin interval,
               degree from the 1e-7 coefficient tail). The storage-free
               two-pass Lanczos time is reported alongside
               (two_pass_lanczos_m30_ms).
  value        milliseconds on the current default backend (TPU when present)
  vs_baseline  speedup over scipy.sparse.linalg.expm_multiply on host CPU —
               the Python stand-in for the reference's expv path (the
               reference publishes no numbers of its own, BASELINE.md).

Timing methodology (hardened in r5 — BENCHMARKS.md "tunnel-latency
postmortem"): chained dependent evaluations inside ONE jitted program
returning a scalar, with the chain length K a TRACED argument (one
compile serves every K). The tunnel round-trip is ~25 ms and device
execution OVERLAPS with it, so any chain shorter than the latency
window measures zero compute — the harness therefore CALIBRATES K
until the chain time clearly exceeds the round-trip floor, then takes
the slope between K and 5K (best-of interleaved passes, spread
reported). The r3/r4 driver captures (0.010/0.032 ms) used K=43 chains
— 0.4 ms of signal under 25 ms of latency — and were both
noise-dominated.
"""

import functools
import json
import time

import numpy as np


def _calibrated_slope(call, *, floor_signal=0.05, passes=4):
    """Per-call seconds from a traced-K chain ``call(K) -> host float``.

    Grows K until the chain wall time exceeds the empty-chain latency
    floor by max(2×floor, ``floor_signal`` s), then slopes K → 5K.
    Returns (per_call_s, diag dict)."""
    def t(K):
        t0 = time.perf_counter()
        call(K)
        return time.perf_counter() - t0

    call(1)                                   # compile + warm
    lat = min(t(1) for _ in range(3))
    K = 256
    while K < 4_000_000:
        tk = min(t(K), t(K))
        if tk >= lat + max(2.0 * lat, floor_signal):
            break
        K *= 4
    K1, K2 = K, 5 * K
    b1 = b2 = float("inf")
    slopes = []
    for _ in range(passes):
        t1, t2 = t(K1), t(K2)
        b1, b2 = min(b1, t1), min(b2, t2)
        slopes.append((t2 - t1) / (K2 - K1))
    per_call = (b2 - b1) / (K2 - K1)
    if per_call <= 0:                          # pathological noise
        per_call = b2 / K2
    diag = {"latency_ms": round(lat * 1e3, 2), "K1": K1, "K2": K2,
            "slope_spread_us": [round(min(slopes) * 1e6, 3),
                                round(max(slopes) * 1e6, 3)]}
    return per_call, diag


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    from exponentialutilities_jl_tpu import StencilOperator
    from exponentialutilities_jl_tpu.models.expv import _expv_two_pass

    backend = jax.default_backend()
    n = 100_000
    m = 30
    t = 0.5
    dtype = jnp.float32 if backend == "tpu" else jnp.float64

    coeffs = jnp.asarray([1.0, -2.0, 1.0], dtype=dtype)

    def make_op(c):
        # constant-coefficient stencil container: 3 scalars of operator
        # data instead of 3n diagonal values (ops/stencil.py)
        return StencilOperator((n,), ((-1,), (0,), (1,)), c,
                               is_hermitian=True)
    rng = np.random.default_rng(0)
    b_host = rng.standard_normal(n)
    b = jnp.asarray(b_host, dtype=dtype)

    # Chebyshev action (models/chebyshev.py): single pass, no inner
    # products — the library's fastest Hermitian expv. Spectrum of the
    # 1-D Laplacian stencil is [-4, 0] exactly (Gershgorin); z = t·h = 1.
    from exponentialutilities_jl_tpu.models.chebyshev import (
        _exp_ucoeffs, _chebyshev_apply_scan)
    lo, hi = -4.0, 0.0
    c_ctr, h_half = 0.5 * (hi + lo), 0.5 * (hi - lo)
    cheb_np, cheb_scale = _exp_ucoeffs(t * h_half, 1e-7)
    cheb = jnp.asarray(cheb_np * np.exp(t * c_ctr + cheb_scale), dtype)
    m_cheb = len(cheb_np)

    if backend == "tpu":
        # VMEM-resident one-dispatch Chebyshev (what expv_chebyshev
        # auto-selects for this operator on TPU); the chain renormalizes
        # through the kernel's own scale input + Σw² output, so each
        # link is exactly one kernel dispatch + one scalar rsqrt.
        from exponentialutilities_jl_tpu.ops.kernels.resident import (
            _layout_1d, _resident_call)
        R, mask_np = _layout_1d(n)
        mask = jnp.asarray(mask_np)
        rows_np = np.stack([np.full(m_cheb, 2.0 / h_half),
                            np.full(m_cheb, -2.0 * c_ctr / h_half),
                            np.full(m_cheb, -1.0),
                            np.asarray(cheb)], 1)
        rows = jnp.asarray(rows_np, dtype)
        offsets = (-1, 0, 1)
        method = f"chebyshev_deg{m_cheb}_resident"

        @jax.jit
        def chain(c, b, K):
            Xp = jnp.pad(b, (0, R * 128 - n)).reshape(R, 128)

            def body(i, carry):
                Xp, s = carry
                Wp, nrm2 = _resident_call(Xp, mask, rows, c, s,
                                          offsets=offsets)
                return (Wp, jax.lax.rsqrt(jnp.maximum(nrm2, 1e-30)))

            Wp, s = jax.lax.fori_loop(0, K, body, (Xp, dtype(1.0)))
            return jnp.sum(Wp) * s
    else:
        method = f"chebyshev_deg{m_cheb}_scan"

        @jax.jit
        def chain(c, b, K):
            lop = make_op(c)

            def body(i, b):
                w = _chebyshev_apply_scan(lop, b, cheb, c_ctr,
                                          1.0 / h_half)
                return w / jnp.linalg.norm(w)

            return jnp.sum(jax.lax.fori_loop(0, K, body, b))

    def make_chain_lanczos(impl):
        @jax.jit
        def chain_lanczos(c, b, K):
            lop = make_op(c)

            def body(i, b):
                # storage-free two-pass Lanczos: no (m+1, n) basis buffer
                w = impl(lop, b, t, m)
                return w / jnp.linalg.norm(w)

            return jnp.sum(jax.lax.fori_loop(0, K, body, b))
        return chain_lanczos

    if backend == "tpu":
        # 1-D small n on TPU: both Lanczos passes VMEM-resident (what
        # expv(two_pass=True) auto-selects; ops/kernels/resident.py)
        from exponentialutilities_jl_tpu.ops.kernels.resident import (
            expv_two_pass_resident)
        lanczos_impls = [expv_two_pass_resident, _expv_two_pass]
    else:
        lanczos_impls = [_expv_two_pass]

    try:
        dt_s, diag = _calibrated_slope(
            lambda K: float(chain(coeffs, b, K)))
    except Exception:                   # noqa: BLE001 — driver-facing
        # insurance: if the resident kernel fails to build on this
        # backend, fall back to the scan chain rather than dying
        method = f"chebyshev_deg{m_cheb}_scan"

        @jax.jit
        def chain_scan(c, b, K):
            lop = make_op(c)

            def body(i, b):
                w = _chebyshev_apply_scan(lop, b, cheb, c_ctr,
                                          1.0 / h_half)
                return w / jnp.linalg.norm(w)

            return jnp.sum(jax.lax.fori_loop(0, K, body, b))

        dt_s, diag = _calibrated_slope(
            lambda K: float(chain_scan(coeffs, b, K)))
    lanczos_s = None
    for impl in lanczos_impls:
        try:
            cl = make_chain_lanczos(impl)
            lanczos_s, _ = _calibrated_slope(
                lambda K: float(cl(coeffs, b, K)))
            break
        except Exception:               # noqa: BLE001 — driver-facing
            continue                    # metric: never die on a variant
    ms = dt_s * 1e3

    # Accuracy + host-baseline timing vs scipy's Krylov expm_multiply —
    # through the PUBLIC path (expv_chebyshev auto-dispatches to the
    # same resident kernel the chain times).
    import scipy.sparse as sp
    from scipy.sparse.linalg import expm_multiply
    from exponentialutilities_jl_tpu import expv_chebyshev

    w = np.asarray(expv_chebyshev(t, make_op(coeffs), b,
                                  bounds=(lo, hi), tol=1e-7), np.float64)
    A = sp.diags([np.ones(n - 1), -2 * np.ones(n), np.ones(n - 1)],
                 [-1, 0, 1], format="csr")
    t0 = time.perf_counter()
    ref = expm_multiply(t * A, b_host)
    scipy_ms = (time.perf_counter() - t0) * 1e3
    rel_err = float(np.linalg.norm(w - ref) / np.linalg.norm(ref))

    # f64 accuracy through the host-staged reduced path (BASELINE's
    # 1e-10 class; the timed metric above stays f32 — the serving dtype).
    rel_err_64 = None
    try:
        jax.config.update("jax_enable_x64", True)
        from exponentialutilities_jl_tpu import expv as _expv
        op64 = make_op(jnp.asarray([1.0, -2.0, 1.0], jnp.float64))
        w64 = np.asarray(_expv(t, op64, jnp.asarray(b_host), m=40,
                               hermitian=True, two_pass=True))
        rel_err_64 = float(np.linalg.norm(w64 - ref) / np.linalg.norm(ref))
    except Exception:
        pass

    # Effective stencil-SpMV bandwidth: bytes touched per matvec ≈
    # x read + y write (stencil coefficients are 3 scalars), m_cheb
    # matvecs per Chebyshev call.
    itemsize = np.dtype(np.float32 if backend == "tpu" else np.float64).itemsize
    bytes_per_mv = 2 * n * itemsize
    spmv_gbs = m_cheb * bytes_per_mv / max(dt_s, 1e-12) / 1e9

    print(json.dumps({
        "metric": "expv_laplacian1d_n1e5_ms",
        "value": round(ms, 4),
        "unit": "ms",
        "vs_baseline": round(scipy_ms / ms, 2),
        "backend": backend,
        "method": method,
        "two_pass_lanczos_m30_ms": (round(lanczos_s * 1e3, 3)
                                    if lanczos_s else None),
        "rel_err_vs_scipy": rel_err,
        "rel_err_f64_vs_scipy": rel_err_64,
        "scipy_expm_multiply_ms": round(scipy_ms, 1),
        "effective_spmv_gbs": round(spmv_gbs, 2),
        "timing": diag,
    }))


if __name__ == "__main__":
    main()
