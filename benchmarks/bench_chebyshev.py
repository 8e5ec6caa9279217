"""TPU benchmark: Chebyshev expv vs the Lanczos paths on the flagship
configs (BASELINE config 5-style 10M-row 3-D Laplacian, config 2-style
1-D Laplacian).

Timing: chained-slope method (see run_baseline._chain_time docstring) —
the only trustworthy method through the axon tunnel.
"""

import functools
import time

import numpy as np


def _setup():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return jax


def _chain_time(step, x0, K1=2, K2=6, reps=3):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("K",))
    def chain(x, K):
        y = jax.lax.fori_loop(0, K, lambda i, y: step(y), x)
        return jnp.real(jnp.sum(y))

    best = {}
    for K in (K1, K2):
        float(chain(x0, K))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(x0, K))
            ts.append(time.perf_counter() - t0)
        best[K] = min(ts)
    return max(best[K2] - best[K1], 1e-9) / (K2 - K1)


def main():
    jax = _setup()
    import jax.numpy as jnp
    from exponentialutilities_jl_tpu import expv, laplacian_nd_stencil
    from exponentialutilities_jl_tpu.models.chebyshev import (
        _exp_ucoeffs, chebyshev_apply, _chebyshev_apply_scan,
        _chebyshev_apply_fused)
    from exponentialutilities_jl_tpu.models.expv import (
        _combine_expv, _exp_reduced_e1, build_subspace)

    print(f"backend: {jax.default_backend()}")
    nx = ny = nz = 216
    n = nx * ny * nz
    dt = jnp.float32
    t = 0.05
    op = laplacian_nd_stencil(nz, ny, nx, dtype=dt)
    rng = np.random.default_rng(0)
    bj = jnp.asarray(rng.standard_normal(n), dtype=dt)

    lo, hi = op.spectral_bounds_hint()
    c = 0.5 * (hi + lo)
    h = 0.5 * (hi - lo)
    coeffs, scale = _exp_ucoeffs(t * h, 1e-7)
    full = jnp.asarray(coeffs * np.exp(t * c + scale), dt)
    m_cheb = len(coeffs)
    print(f"config5-style: t={t}, gershgorin=({lo},{hi}), "
          f"chebyshev degree={m_cheb} (vs Lanczos m=20)")

    # --- Lanczos basis path (the config-5 timed step) ---
    def step_lanczos(v):
        Ks = build_subspace(op, v, 20)
        w = _combine_expv(Ks, _exp_reduced_e1(Ks, t))
        return w / jnp.linalg.norm(w)

    # --- Chebyshev XLA scan ---
    inv_h = 1.0 / h

    def step_cheb(v):
        w = _chebyshev_apply_scan(op, v, full, c, inv_h)
        return w / jnp.linalg.norm(w)

    t_lan = _chain_time(step_lanczos, bj)
    t_cheb = _chain_time(step_cheb, bj)
    print(f"lanczos basis path   : {t_lan*1e3:8.2f} ms")
    print(f"chebyshev XLA scan   : {t_cheb*1e3:8.2f} ms  "
          f"({t_lan/t_cheb:.1f}x)")

    # --- Chebyshev fused plane sweep ---
    try:
        def step_fused(v):
            w = _chebyshev_apply_fused(op, v, full, c, h)
            return w / jnp.linalg.norm(w)

        t_fus = _chain_time(step_fused, bj)
        print(f"chebyshev fused sweep: {t_fus*1e3:8.2f} ms  "
              f"({t_lan/t_fus:.1f}x)")
    except Exception as e:  # pragma: no cover
        print(f"fused sweep unavailable: {e}")
        t_fus = None

    # --- accuracy: semigroup + cross-path ---
    w_kry = np.asarray(expv(t, op, bj, m=20, reduced="device"),
                       np.float64)
    w_cheb = np.asarray(chebyshev_apply(op, bj, full, (lo, hi),
                                        fused=False), np.float64)
    err_cross = float(np.linalg.norm(w_cheb - w_kry)
                      / np.linalg.norm(w_kry))
    print(f"chebyshev-vs-krylov rel err: {err_cross:.2e}")
    if t_fus is not None:
        w_f = np.asarray(chebyshev_apply(op, bj, full, (lo, hi),
                                         fused=True), np.float64)
        err_f = float(np.linalg.norm(w_f - w_cheb)
                      / np.linalg.norm(w_cheb))
        print(f"fused-vs-scan rel err: {err_f:.2e}")

    # tighter tolerance degree scaling
    for tol in (1e-5, 1e-7, 1e-10):
        cs, _ = _exp_ucoeffs(t * h, tol)
        print(f"  tol={tol:g}: degree {len(cs)}")

    # ---- variable-coefficient operator: fused sweep territory ----
    from exponentialutilities_jl_tpu.ops.stencil import (
        variable_diffusion_nd_stencil)
    from exponentialutilities_jl_tpu.ops.krylov import (lanczos_coeffs,
                                                        lanczos_replay)

    print("\nvariable-coefficient 216^3 .(a.u):")
    a = (0.5 + np.random.default_rng(1).random((nz, ny, nx))).astype(
        np.float32)
    vop = variable_diffusion_nd_stencil(a, dtype=np.float32)
    lo_v, hi_v = vop.spectral_bounds_hint()
    c_v = 0.5 * (hi_v + lo_v)
    h_v = 0.5 * (hi_v - lo_v)
    coeffs_v, scale_v = _exp_ucoeffs(t * h_v, 1e-7)
    full_v = jnp.asarray(coeffs_v * np.exp(t * c_v + scale_v), dt)
    m_v = len(coeffs_v)
    print(f"gershgorin=({lo_v:.2f},{hi_v:.2f}), degree={m_v}")

    # The operator must ride as a jit ARG: its (7, n) coefficient fields
    # are ~283 MB — closed over, they become HLO literals and overflow
    # the remote-compile transport (HTTP 413). Same pattern as
    # benchmarks/bench_var.py.
    def _chain_arg(step, op_arg, x0, K1=2, K2=6, reps=3):
        @functools.partial(jax.jit, static_argnames=("K",))
        def chain(op_arg, x, K):
            y = jax.lax.fori_loop(0, K, lambda i, y: step(op_arg, y), x)
            return jnp.real(jnp.sum(y))

        best = {}
        for K in (K1, K2):
            float(chain(op_arg, x0, K))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chain(op_arg, x0, K))
                ts.append(time.perf_counter() - t0)
            best[K] = min(ts)
        return max(best[K2] - best[K1], 1e-9) / (K2 - K1)

    def step_two_pass(op_arg, v):
        al, be, b0, mu, br = lanczos_coeffs(op_arg, v, 20)
        T = jnp.diag(al) + jnp.diag(be[:-1], 1) + jnp.diag(be[:-1], -1)
        w_eig, Q = jnp.linalg.eigh(T)
        cf = (Q @ (jnp.exp(t * w_eig) * Q[0, :])) * b0
        w = lanczos_replay(op_arg, v, cf, al, be, 20)
        return w / jnp.linalg.norm(w)

    def step_cheb_v(op_arg, v):
        w = _chebyshev_apply_scan(op_arg, v, full_v, c_v, 1.0 / h_v)
        return w / jnp.linalg.norm(w)

    def step_cheb_vf(op_arg, v):
        w = _chebyshev_apply_fused(op_arg, v, full_v, c_v, h_v)
        return w / jnp.linalg.norm(w)

    t_tp = _chain_arg(step_two_pass, vop, bj)
    t_cv = _chain_arg(step_cheb_v, vop, bj)
    print(f"two-pass lanczos (XLA) : {t_tp*1e3:8.2f} ms")
    print(f"chebyshev XLA scan     : {t_cv*1e3:8.2f} ms  "
          f"({t_tp/t_cv:.1f}x)")
    try:
        t_cf = _chain_arg(step_cheb_vf, vop, bj)
        print(f"chebyshev fused sweep  : {t_cf*1e3:8.2f} ms  "
              f"({t_tp/t_cf:.1f}x)")
        w_s = np.asarray(step_cheb_v(vop, bj), np.float64)
        w_f = np.asarray(step_cheb_vf(vop, bj), np.float64)
        print(f"fused-vs-scan rel err: "
              f"{np.linalg.norm(w_f-w_s)/np.linalg.norm(w_s):.2e}")
    except Exception as e:  # pragma: no cover
        print(f"fused unavailable: {e}")


if __name__ == "__main__":
    main()
