"""Polynomial (reduction-free) matrix-function actions — end-use demo.

Three scenarios a user of the reference's expv/phiv would hit, solved
with the Chebyshev/Leja layer (models/chebyshev.py, models/leja.py):

1. Heat propagation on a 3-D grid (Hermitian, interval exact from
   Gershgorin) — `expv_chebyshev`, single pass, no inner products.
2. An exponential-integrator step u' = Au + b with snapshots — the
   whole Niesen–Wright φ-combination in ONE scan
   (`phiv_timestep_chebyshev`).
3. Advection–diffusion (non-Hermitian) — `expv_leja` Newton
   interpolation at real Leja points.

Run: PYTHONPATH=. python examples/chebyshev_actions.py
"""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402

from exponentialutilities_jl_tpu import (                  # noqa: E402
    advection_diffusion_1d, expv, expv_chebyshev, expv_leja,
    laplacian_nd_stencil, phiv_timestep, phiv_timestep_chebyshev)


def main():
    rng = np.random.default_rng(0)

    # 1. Heat semigroup on a 32^3 grid --------------------------------
    op = laplacian_nd_stencil(32, 32, 32)
    n = op.shape[0]
    u0 = jnp.asarray(rng.standard_normal(n))
    t = 0.4
    u_cheb = expv_chebyshev(t, op, u0, tol=1e-10)   # bounds: Gershgorin
    u_kry = expv(t, op, u0, m=40)
    rel = float(jnp.linalg.norm(u_cheb - u_kry) / jnp.linalg.norm(u_kry))
    print(f"[1] 32^3 heat: chebyshev vs krylov rel diff {rel:.2e} "
          f"(bounds {op.spectral_bounds_hint()})")

    # Stiff horizon in ONE pass: t*||A|| ~ 1200, degree ~ sqrt scale.
    u_long = expv_chebyshev(100.0, op, u0, tol=1e-10)
    print(f"[1b] t=100 (t*||A||=1200) one-pass norm "
          f"{float(jnp.linalg.norm(u_long)):.3e}")

    # 2. phi-combination with snapshots in one scan -------------------
    B = jnp.asarray(rng.standard_normal((n, 3)))    # b_0, b_1, b_2
    ts = [0.25, 0.5, 1.0]
    U = phiv_timestep_chebyshev(ts, op, B, tol=1e-9)
    U_nw = phiv_timestep(ts, op, B, adaptive=True, tol=1e-9, m=40)
    rel = float(jnp.linalg.norm(U - U_nw) / jnp.linalg.norm(U_nw))
    print(f"[2] NW combination, 3 snapshots, one scan: vs adaptive "
          f"driver rel diff {rel:.2e}")

    # 3. Non-Hermitian advection–diffusion ----------------------------
    opad = advection_diffusion_1d(4000, peclet=10.0)
    b = jnp.asarray(rng.standard_normal(4000))
    tad = 2e-7
    w_leja = expv_leja(tad, opad, b, tol=1e-10)
    w_kry = expv(tad, opad, b, m=40)
    rel = float(jnp.linalg.norm(w_leja - w_kry) / jnp.linalg.norm(w_kry))
    print(f"[3] advection–diffusion expv: leja vs arnoldi rel diff "
          f"{rel:.2e}")

    # 4. Stiff non-Hermitian φ-combination: the Leja driver -----------
    from exponentialutilities_jl_tpu import (StencilOperator,
                                             phiv_timestep_leja)
    n4 = 2000
    d_c, a_c = 1e3, 2e2     # diffusion-dominated (thin-ellipse FoV)
    op4 = StencilOperator((n4,), ((-1,), (0,), (1,)),
                          jnp.asarray([d_c + a_c, -2 * d_c - a_c, d_c]),
                          is_hermitian=False)
    B4 = jnp.asarray(rng.standard_normal((n4, 3)))
    u_l = phiv_timestep_leja(1.0, op4, B4, tol=1e-9)
    u_nw = phiv_timestep(1.0, op4, B4, adaptive=True, tol=1e-9, m=60)
    rel = float(jnp.linalg.norm(u_l - u_nw) / jnp.linalg.norm(u_nw))
    print(f"[4] stiff φ-combination (t·s=1100): leja driver vs "
          f"adaptive NW rel diff {rel:.2e}")


if __name__ == "__main__":
    main()
