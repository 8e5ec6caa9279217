"""Standard benchmark/test operators (BASELINE.json configs).

All are ``BandedOperator`` stencils (the speed-of-light container); each can
be converted via ``.to_ell()`` / ``BlockELLOperator.from_dense`` when the
ELL or blocked code paths are under test.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.sparse import BandedOperator

__all__ = ["laplacian_1d", "poisson_2d", "laplacian_3d",
           "advection_diffusion_1d"]


def laplacian_1d(n: int, dtype=jnp.float64, scale: float = 1.0) -> BandedOperator:
    """Second-difference stencil (−2, 1, 1)·scale — the reference's default
    Hermitian test operator (test/basictests.jl tridiagonal Laplacians)."""
    main = np.full(n, -2.0 * scale)
    off = np.full(n, 1.0 * scale)
    lower = off.copy(); lower[0] = 0.0     # A[i, i-1] undefined at i=0
    upper = off.copy(); upper[-1] = 0.0    # A[i, i+1] undefined at i=n-1
    diags = np.stack([lower, main, upper])
    return BandedOperator(jnp.asarray(diags, dtype=dtype), (-1, 0, 1),
                          is_hermitian=True)


def poisson_2d(nx: int, ny: int, dtype=jnp.float64,
               scale: float = 1.0) -> BandedOperator:
    """5-point 2-D Poisson stencil on an nx × ny grid (row-major), Dirichlet."""
    n = nx * ny
    i = np.arange(n)
    ix = i % nx
    main = np.full(n, -4.0 * scale)
    west = np.where(ix > 0, scale, 0.0)
    east = np.where(ix < nx - 1, scale, 0.0)
    south = np.where(i >= nx, scale, 0.0)
    north = np.where(i < n - nx, scale, 0.0)
    diags = np.stack([south, west, main, east, north])
    return BandedOperator(jnp.asarray(diags, dtype=dtype),
                          (-nx, -1, 0, 1, nx), is_hermitian=True)


def laplacian_3d(nx: int, ny: int, nz: int, dtype=jnp.float64,
                 scale: float = 1.0) -> BandedOperator:
    """7-point 3-D Laplacian stencil (row-major x-fastest), Dirichlet."""
    n = nx * ny * nz
    i = np.arange(n)
    ix = i % nx
    iy = (i // nx) % ny
    main = np.full(n, -6.0 * scale)
    west = np.where(ix > 0, scale, 0.0)
    east = np.where(ix < nx - 1, scale, 0.0)
    south = np.where(iy > 0, scale, 0.0)
    north = np.where(iy < ny - 1, scale, 0.0)
    down = np.where(i >= nx * ny, scale, 0.0)
    up = np.where(i < n - nx * ny, scale, 0.0)
    diags = np.stack([down, south, west, main, east, north, up])
    return BandedOperator(jnp.asarray(diags, dtype=dtype),
                          (-nx * ny, -nx, -1, 0, 1, nx, nx * ny),
                          is_hermitian=True)


def advection_diffusion_1d(n: int, peclet: float = 10.0,
                           dtype=jnp.float64) -> BandedOperator:
    """Stiff 1-D advection–diffusion u_xx + Pe·u_x, upwind advection —
    the non-Hermitian stiff operator of BASELINE config #4."""
    h = 1.0 / (n + 1)
    dcoef = 1.0 / h**2
    acoef = peclet / h
    main = np.full(n, -2.0 * dcoef - acoef)
    lower = np.full(n, dcoef + acoef); lower[0] = 0.0
    upper = np.full(n, dcoef); upper[-1] = 0.0
    diags = np.stack([lower, main, upper])
    return BandedOperator(jnp.asarray(diags, dtype=dtype), (-1, 0, 1),
                          is_hermitian=False)
