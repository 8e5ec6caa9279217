"""Engine selection for the generic three-term recurrence

    ω_{k+1} = ca_k·(A·ω_k) + cb_k·ω_k + cc_k·ω_{k−1},  w += cw_k·ω_k

shared by every polynomial action (Chebyshev, Leja/Newton, Faber).
Three Pallas engines implement the same (m, 4)-rows contract:

  * ``resident``  — 1-D constant stencils, whole recurrence in ONE
                    VMEM-resident dispatch (ops/kernels/resident.py)
  * ``fused``     — 2-D/3-D box stencils, sliding-plane sweep per step
                    (ops/kernels/lanczos_fused.recurrence_apply_fused)
  * ``tiled``     — giant 3-D grids past the plane budget, row-tiled
                    sweeps (ops/kernels/tiled.py)

``recurrence_engine`` picks the first that applies (TPU + f32 real
data), or None → the caller's XLA scan path."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["recurrence_engine", "chebyshev_rows"]


def chebyshev_rows(coeffs, center, halfwidth, dt):
    """(m, 4) recurrence-engine rows of the Chebyshev-U recurrence on
    the interval (center ± halfwidth) with accumulation coefficients
    ``coeffs`` — shared by the resident, plane-sweep, tiled and sharded
    Chebyshev applies."""
    m = coeffs.shape[0]
    ca = jnp.full((m,), 2.0 / halfwidth, dt)
    cb = jnp.full((m,), -2.0 * center / halfwidth, dt)
    cc = jnp.full((m,), -1.0, dt)
    return jnp.stack([ca, cb, cc, coeffs.astype(dt)], axis=1)


def recurrence_engine(op, dtype, fused=None, *, hermitian: bool = False):
    """An ``apply(op, b, rows, *, interpret=False) -> w`` callable for
    the best Pallas recurrence engine, or None for the XLA scan path.
    ``fused=False`` forces None; ``fused=True`` raises when no engine
    applies (same contract as the historical per-model gates)."""
    if fused is False:
        return None
    on_tpu = jax.default_backend() == "tpu"
    f32 = jnp.dtype(dtype) == jnp.float32
    auto_ok = on_tpu and f32

    from .resident import (recurrence_apply_resident,
                           recurrence_apply_resident_banded,
                           recurrence_apply_resident_grid,
                           resident_banded_supported,
                           resident_grid_supported, resident_supported)
    if resident_supported(op) and (fused or auto_ok):
        return recurrence_apply_resident
    if resident_banded_supported(op) and (fused or auto_ok):
        return recurrence_apply_resident_banded
    if resident_grid_supported(op) and (fused or auto_ok):
        return recurrence_apply_resident_grid

    from .lanczos_fused import _fused_dispatch, recurrence_apply_fused
    try:
        _fused_dispatch(op, hermitian=hermitian)
        if fused or auto_ok:
            return recurrence_apply_fused
        return None
    except (ValueError, TypeError):
        pass

    from .tiled import recurrence_apply_fused_tiled, tiled_plan_for
    try:
        tiled_plan_for(op, hermitian=hermitian)
        if fused or auto_ok:
            return recurrence_apply_fused_tiled
        return None
    except (ValueError, TypeError):
        pass

    if fused:
        raise ValueError(
            "fused=True: no Pallas recurrence engine for this operator "
            "(needs a constant Stencil/VariableStencil within the "
            "resident/plane-sweep/tiled budgets)")
    return None
