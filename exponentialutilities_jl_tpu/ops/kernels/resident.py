"""VMEM-resident polynomial-recurrence kernel for 1-D constant stencils.

The plane-sweep pipeline (lanczos_fused.py) streams every recurrence
vector through HBM — the right design at 10M rows, but at bench scale
(n = 1e5, m ≈ 8) each sweep moves ~1 µs of data and the solve is
LAUNCH-bound: dozens of kernel dispatches plus XLA glue dominate the
wall time (measured ~21 µs/solve for ~8 µs of HBM traffic through the
axon tunnel, BENCHMARKS.md r5). This kernel runs the ENTIRE m-step
recurrence in ONE Pallas dispatch with every state vector resident in
VMEM — HBM traffic is read x once + write w once (2n total, vs ≥5n·m
for any streaming form):

    ω_{k+1} = ca_k·(A·ω_k) + cb_k·ω_k + cc_k·ω_{k−1},
    w      += cw_k·ω_k,          k = 0…m−1,   ω_0 = s·x,  ω_{−1} = 0,

with ``rows`` the (m, 4) per-step scalars (ca, cb, cc, cw) as traced
data — the same contract as ``recurrence_apply_fused`` — and ``s`` an
input scalar so chained solves can renormalize without an extra
elementwise pass (the kernel also emits Σw² for exactly that purpose).
This serves every 1-D polynomial action: Chebyshev (constant rows),
Leja/Newton and Faber (per-step rows).

A is a 1-D constant-coefficient stencil, y = Σ_j c_j·flatshift(x, o_j)
with Dirichlet ends. The coefficient VALUES ride in SMEM (traced — one
compiled program per offset pattern); the offsets are static.

Layout: x padded to (R, 128), R a multiple of 8, pad tail zero. A flat
shift by o = ro·128 + lo (lo ∈ [0, 128)) is one lane roll + two row
shifts + a lane select — the same decomposition as
``lanczos_fused._lane_shift_full`` but with the row wrap KEPT: in flat
1-D indexing the element after [r, 127] IS [r+1, 0]. Row shifts feed
zeros at the buffer ends and one mask multiply per step re-zeroes the
pad tail, so out-of-range reads are exact Dirichlet.

Capacity: the kernel holds ~6 live (R, 128) f32 buffers (+ Mosaic
temporaries); ``RESIDENT_MAX_N`` caps n so the footprint stays well
under VMEM. Larger 1-D problems fall back to the XLA scan path.

No reference counterpart (the reference's expv path is Krylov-only and
allocation-based, src/krylov_phiv.jl); this is pure north-star
territory — the library's fastest small-n action path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lanczos_fused import _row_shift_full

__all__ = ["recurrence_apply_resident", "resident_supported",
           "recurrence_apply_resident_banded",
           "resident_banded_supported",
           "lanczos_coeffs_resident", "expv_two_pass_resident",
           "phiv_two_pass_resident", "RESIDENT_MAX_N"]

_LANES = 128
# ~6 live (R, 128) buffers + temporaries; 2M rows f32 ≈ 6×8 MB — well
# under the raised 100 MB scoped budget the fused kernels already use
RESIDENT_MAX_N = 2_000_000
_UNROLL_MAX = 48


def _flat_shift(buf, o: int):
    """out[r·128+l] = buf[r·128+l+o] in flat order, zeros past the
    buffer ends (|o| < R·128)."""
    if o == 0:
        return buf
    ro, lo = divmod(o, _LANES)          # lo in [0, 128)
    if lo == 0:
        return _row_shift_full(buf, ro)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    a = pltpu.roll(buf, _LANES - lo, 1)      # a[r, l] = buf[r, (l+lo)%128]

    def rshift(x, off):                      # Mosaic rejects 0-size concat
        return x if off == 0 else _row_shift_full(x, off)

    low = rshift(a, ro)                      # lanes l < 128−lo: row r+ro
    high = rshift(a, ro + 1)                 # wrapped lanes: row r+ro+1
    return jnp.where(lane < _LANES - lo, low, high)


def _resident_kernel(scal_ref, rows_ref, cvals_ref, x_ref, mask_ref,
                     w_ref, nrm_ref, wp_ref, wc_ref,
                     *, offsets, m: int):
    mask = mask_ref[...]
    wc_ref[...] = x_ref[...] * scal_ref[0]
    wp_ref[...] = jnp.zeros_like(mask)
    w_ref[...] = jnp.zeros_like(mask)

    def step(k, _):
        wc = wc_ref[...]
        z = None
        for j, o in enumerate(offsets):
            term = cvals_ref[j] * _flat_shift(wc, o)
            z = term if z is None else z + term
        w_ref[...] = w_ref[...] + rows_ref[k, 3] * wc
        wn = mask * (rows_ref[k, 0] * z + rows_ref[k, 1] * wc
                     + rows_ref[k, 2] * wp_ref[...])
        wp_ref[...] = wc
        wc_ref[...] = wn
        return 0

    if m <= _UNROLL_MAX:
        for k in range(m):
            step(k, 0)
    else:
        lax.fori_loop(0, m, step, 0)
    w = w_ref[...]
    nrm_ref[...] = jnp.broadcast_to(jnp.sum(w * w), nrm_ref.shape)


def _resident_call(Xp, mask, rows, cvals, s, *, offsets,
                   interpret: bool = False):
    """Padded-form entry: Xp/mask (R, 128) → (Wp (R, 128), Σw² scalar).
    Offsets static; rows (m, 4), cvals (k,), s scalar all traced."""
    R = Xp.shape[0]
    dt = Xp.dtype
    m = int(rows.shape[0])
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    Wp, nrm = pl.pallas_call(
        functools.partial(_resident_kernel, offsets=tuple(offsets), m=m),
        in_specs=[smem, smem, smem, vmem, vmem],
        out_specs=(vmem, vmem),
        out_shape=(jax.ShapeDtypeStruct((R, _LANES), dt),
                   jax.ShapeDtypeStruct((8, _LANES), dt)),
        scratch_shapes=[pltpu.VMEM((R, _LANES), dt),
                        pltpu.VMEM((R, _LANES), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(jnp.asarray(s, dt).reshape(1), rows.astype(dt), cvals.astype(dt),
      Xp, mask.astype(dt))
    return Wp, nrm[0, 0]


def _offsets_fit(offsets, n: int) -> bool:
    """Every row shift _flat_shift will issue must stay strictly inside
    the (R, 128) buffer — a shift of exactly ±R is a 0-size concatenate
    that passes interpret mode but faults on real Mosaic (SKILL.md)."""
    R, _ = _layout_1d(n)
    for o in offsets:
        o = int(o)
        if o == 0:
            continue
        ro, lo = divmod(o, _LANES)
        shifts = (ro,) if lo == 0 else (ro, ro + 1)
        if any(abs(sh) >= R for sh in shifts):
            return False
    return True


def _layout_1d(n: int):
    """(R, mask) for the padded (R, 128) flat layout of an (n,) vector."""
    R = -(-n // _LANES)
    R = -(-R // 8) * 8
    mask = np.zeros((R, _LANES), np.float32)
    mask.reshape(-1)[:n] = 1.0
    return R, mask


def resident_supported(op, n_max: int = RESIDENT_MAX_N) -> bool:
    """True when ``op`` is a 1-D constant-coefficient StencilOperator
    small enough for the VMEM-resident kernel."""
    from ..stencil import StencilOperator, VariableStencilOperator

    if isinstance(op, VariableStencilOperator):
        return False
    if not isinstance(op, StencilOperator) or len(op.grid_shape) != 1:
        return False
    if jnp.iscomplexobj(op.coeffs):
        return False                     # f32 kernel: complex would
    n = op.grid_shape[0]                 # silently drop Im parts
    return (0 < n <= n_max
            and all(abs(off[0]) < n for off in op.offsets)
            and _offsets_fit([off[0] for off in op.offsets], n))


def _resident_banded_kernel(rows_ref, x_ref, mask_ref, D_ref, w_ref,
                            wp_ref, wc_ref, *, offsets, m: int):
    """Banded variant: per-row diagonal VALUES ride in VMEM alongside
    the state, z = Σ_j D_j ⊙ flatshift(ω, o_j) — Dirichlet/validity is
    baked into the diagonal entries (the BandedOperator storage
    convention), so any banded matrix (including 2-D/3-D grids in
    banded storage) is exact; the mask only re-zeroes the pad tail."""
    mask = mask_ref[...]
    wc_ref[...] = x_ref[...]
    wp_ref[...] = jnp.zeros_like(mask)
    w_ref[...] = jnp.zeros_like(mask)

    def step(k, _):
        wc = wc_ref[...]
        z = None
        for j, o in enumerate(offsets):
            term = D_ref[j] * _flat_shift(wc, o)
            z = term if z is None else z + term
        w_ref[...] = w_ref[...] + rows_ref[k, 3] * wc
        wn = mask * (rows_ref[k, 0] * z + rows_ref[k, 1] * wc
                     + rows_ref[k, 2] * wp_ref[...])
        wp_ref[...] = wc
        wc_ref[...] = wn
        return 0

    if m <= _UNROLL_MAX:
        for k in range(m):
            step(k, 0)
    else:
        lax.fori_loop(0, m, step, 0)


def resident_banded_supported(op, budget: int = 48 * 2 ** 20) -> bool:
    """True for a ``BandedOperator`` whose (k+6) whole-vector buffers
    fit the resident VMEM budget."""
    from ..sparse import BandedOperator

    if not isinstance(op, BandedOperator):
        return False
    if jnp.iscomplexobj(op.diags):
        return False                     # f32 kernel: complex would
    k, n = op.diags.shape                # silently drop Im parts
    return (0 < n and n * (k + 6) * 4 <= budget
            and all(abs(o) < n for o in op.offsets)
            and _offsets_fit(op.offsets, n))


def recurrence_apply_resident_banded(op, b, rows, *,
                                     interpret: bool = False):
    """One-dispatch recurrence for ``BandedOperator`` (module doc):
    the k diagonal arrays live in VMEM with the state. Returns (n,)."""
    if not resident_banded_supported(op):
        raise ValueError("recurrence_apply_resident_banded requires a "
                         "BandedOperator within the VMEM budget")
    b = jnp.asarray(b)
    dt = b.dtype
    k, n = op.diags.shape
    R, mask_np = _layout_1d(n)
    pad = R * _LANES - n
    Xp = jnp.pad(b, (0, pad)).reshape(R, _LANES)
    D = jnp.pad(op.diags.astype(dt), ((0, 0), (0, pad))).reshape(
        k, R, _LANES)
    rows = jnp.asarray(rows, dt)
    m = int(rows.shape[0])
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    Wp = pl.pallas_call(
        functools.partial(_resident_banded_kernel,
                          offsets=tuple(int(o) for o in op.offsets),
                          m=m),
        in_specs=[smem, vmem, vmem, vmem],
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((R, _LANES), dt),
        scratch_shapes=[pltpu.VMEM((R, _LANES), dt),
                        pltpu.VMEM((R, _LANES), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(rows, Xp, jnp.asarray(mask_np), D)
    return Wp.reshape(-1)[:n]


_GRID_MAX_ROWS = 6000      # whole-grid buffers: ~6 live (R, 128) f32


def _grid_plan(op):
    """(gg, cpairs) for the whole-grid resident layout of a SMALL
    2-D/3-D constant stencil: ONE slab holding every layer, stencil
    application = composite row shift (dy·P + dz·S) + lane shift —
    exactly the fused sweep's in-slab coupling case with no ring
    neighbours. Raises when the grid exceeds the VMEM row budget."""
    from .lanczos_fused import GhostGrid, GhostGrid2D, \
        _stencil_coeffs_static
    from ..stencil import StencilOperator, VariableStencilOperator

    if isinstance(op, VariableStencilOperator) \
            or not isinstance(op, StencilOperator) \
            or len(op.grid_shape) not in (2, 3):
        raise ValueError("whole-grid resident engine requires a 2-D/3-D "
                         "constant StencilOperator")
    cs = _stencil_coeffs_static(op, hermitian=False)
    gs = op.grid_shape
    if len(gs) == 3:
        mo = [max(abs(o[a]) for o in op.offsets) for a in range(3)]
        gg = GhostGrid(gs[0], gs[1], gs[2], zb=gs[0],
                       ypad=max(2, mo[1]), xpad=max(1, mo[2]))
        if gg.nslabs != 1:
            raise ValueError("grid does not fit one resident slab")
        if mo[0] >= gs[0]:
            # |dz| = nz would be a zero-contribution Dirichlet term but
            # the composite row shift hits the buffer edge (a 0-size
            # concat that only faults on real hardware) — reject toward
            # the streaming/scan paths
            raise ValueError("|dz| offsets must stay below the grid "
                             "depth for the resident layout")
        S = gg._lr
        cpairs = tuple((dz * S + dy * gg.P, dx, c)
                       for (dz, dy, dx), c in cs)
    else:
        mo = [max(abs(o[a]) for o in op.offsets) for a in range(2)]
        gg = GhostGrid2D(gs[0], gs[1], ys=gs[0], xpad=max(1, mo[1]))
        if gg.nslabs != 1:
            raise ValueError("grid does not fit one resident slab")
        if mo[0] >= gs[0]:
            raise ValueError("|dy| offsets must stay below the grid "
                             "height for the resident layout")
        cpairs = tuple((dy * gg.P, dx, c) for (dz, dy, dx), c in cs)
    if gg.rows_per_plane > _GRID_MAX_ROWS:
        raise ValueError(
            f"whole-grid resident layout needs {gg.rows_per_plane} rows "
            f"> {_GRID_MAX_ROWS} budget — use the streaming sweeps")
    mx = max((abs(dx) for _, dx, _ in cpairs), default=0)
    if mx > gg.nxp - gg.nx:
        raise ValueError(f"|dx| = {mx} exceeds the pad lanes")
    return gg, cpairs


def resident_grid_supported(op) -> bool:
    try:
        _grid_plan(op)
        return True
    except (ValueError, TypeError):
        return False


def _resident_grid_kernel(rows_ref, x_ref, mask_ref, w_ref,
                          wp_ref, wc_ref, *, cpairs, m: int):
    from .lanczos_fused import _lane_shift_full

    mask = mask_ref[...]
    wc_ref[...] = x_ref[...]
    wp_ref[...] = jnp.zeros_like(mask)
    w_ref[...] = jnp.zeros_like(mask)

    def step(k, _):
        wc = wc_ref[...]
        z = None
        cache = {}
        for rs, dx, c in cpairs:
            if rs not in cache:
                cache[rs] = _row_shift_full(wc, rs) if rs else wc
            t = cache[rs]
            t = _lane_shift_full(t, dx) if dx else t
            term = c * t
            z = term if z is None else z + term
        w_ref[...] = w_ref[...] + rows_ref[k, 3] * wc
        wn = mask * (rows_ref[k, 0] * z + rows_ref[k, 1] * wc
                     + rows_ref[k, 2] * wp_ref[...])
        wp_ref[...] = wc
        wc_ref[...] = wn
        return 0

    if m <= _UNROLL_MAX:
        for k in range(m):
            step(k, 0)
    else:
        lax.fori_loop(0, m, step, 0)


def recurrence_apply_resident_grid(op, b, rows, *,
                                   interpret: bool = False):
    """Whole-grid resident recurrence for SMALL 2-D/3-D constant
    stencils (module doc): one dispatch for the entire m-step chain,
    ghost-layout geometry shared with the fused sweep. (n, ) → (n,)."""
    gg, cpairs = _grid_plan(op)
    b = jnp.asarray(b)
    dt = b.dtype
    rows = jnp.asarray(rows, dt)
    m = int(rows.shape[0])
    Xg = gg.to_ghost(b)                  # (1, R, 128) — one slab
    R = Xg.shape[-2]
    mask = jnp.asarray(gg.xmask())
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    Wp = pl.pallas_call(
        functools.partial(_resident_grid_kernel, cpairs=cpairs, m=m),
        in_specs=[smem, vmem, vmem],
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((R, _LANES), dt),
        scratch_shapes=[pltpu.VMEM((R, _LANES), dt),
                        pltpu.VMEM((R, _LANES), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(rows, Xg.reshape(R, _LANES), mask.astype(dt))
    return gg.from_ghost(Wp[None])


def _resident_kernel_multi(rows_ref, cw_ref, cvals_ref, x_ref, mask_ref,
                           w_ref, wp_ref, wc_ref, *, offsets, m: int,
                           p: int):
    """Multi-column variant: p accumulators share ONE ω_k chain,
    w[j] += cw[k, j]·ω_k — all φ orders / snapshot combinations of a
    Chebyshev/Newton/Faber stack in a single dispatch."""
    mask = mask_ref[...]
    wc_ref[...] = x_ref[...]
    wp_ref[...] = jnp.zeros_like(mask)
    w_ref[...] = jnp.zeros_like(w_ref[...])

    def step(k, _):
        wc = wc_ref[...]
        z = None
        for j, o in enumerate(offsets):
            term = cvals_ref[j] * _flat_shift(wc, o)
            z = term if z is None else z + term
        for j in range(p):
            w_ref[j] = w_ref[j] + cw_ref[k, j] * wc
        wn = mask * (rows_ref[k, 0] * z + rows_ref[k, 1] * wc
                     + rows_ref[k, 2] * wp_ref[...])
        wp_ref[...] = wc
        wc_ref[...] = wn
        return 0

    if m <= _UNROLL_MAX:
        for k in range(m):
            step(k, 0)
    else:
        lax.fori_loop(0, m, step, 0)


def recurrence_apply_resident_multi(op, b, rows, cw, *,
                                    interpret: bool = False):
    """W[:, j] = Σ_k cw[k, j]·ω_k over the shared three-term ω chain
    (module doc) — returns (n, p). One dispatch regardless of p (the
    streaming paths run one pass per combination column)."""
    if not resident_supported(op):
        raise ValueError("recurrence_apply_resident_multi requires a "
                         "1-D constant StencilOperator with n <= "
                         f"{RESIDENT_MAX_N}")
    b = jnp.asarray(b)
    dt = b.dtype
    n = op.grid_shape[0]
    R, mask_np = _layout_1d(n)
    Xp = jnp.pad(b, (0, R * _LANES - n)).reshape(R, _LANES)
    rows = jnp.asarray(rows, dt)
    cw = jnp.asarray(cw, dt)
    m, p = int(cw.shape[0]), int(cw.shape[1])
    offsets = tuple(off[0] for off in op.offsets)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    Wp = pl.pallas_call(
        functools.partial(_resident_kernel_multi, offsets=offsets, m=m,
                          p=p),
        in_specs=[smem, smem, smem, vmem, vmem],
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((p, R, _LANES), dt),
        scratch_shapes=[pltpu.VMEM((R, _LANES), dt),
                        pltpu.VMEM((R, _LANES), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(rows[:, :3], cw, op.coeffs.astype(dt), Xp, jnp.asarray(mask_np))
    return Wp.reshape(p, -1)[:, :n].T


def _resident_lanczos_kernel(cvals_ref, x_ref, mask_ref, ab_ref,
                             wp_ref, wc_ref, *, offsets, m: int,
                             tol: float):
    """Pass-1 Lanczos with EVERYTHING resident: classical normalized
    three-term recurrence, per-step (α, β) computed in-kernel (the
    scalar feedback that forces the streaming kernels to run one sweep
    per iteration costs nothing here), written to the (m, 2) SMEM
    output. Breakdown (β < tol) zeroes the remaining steps — the same
    masked-trailing convention as ops/krylov.lanczos_coeffs."""
    mask = mask_ref[...]
    wc_ref[...] = x_ref[...]            # caller passes v0 (normalized)
    wp_ref[...] = jnp.zeros_like(mask)

    def step(k, beta_prev_alive):
        beta_prev, alive = beta_prev_alive
        vc = wc_ref[...]
        z = None
        for j, o in enumerate(offsets):
            term = cvals_ref[j] * _flat_shift(vc, o)
            z = term if z is None else z + term
        alpha = jnp.sum(vc * z)
        y = mask * (z - alpha * vc) - beta_prev * wp_ref[...]
        beta = jnp.sqrt(jnp.maximum(jnp.sum(y * y), 0.0))
        ok = alive & (beta >= tol)
        ab_ref[k, 0] = jnp.where(alive, alpha, 0.0)
        ab_ref[k, 1] = jnp.where(ok, beta, 0.0)
        inv = jnp.where(ok, 1.0 / jnp.where(beta > 0, beta, 1.0), 0.0)
        wp_ref[...] = vc
        wc_ref[...] = y * inv
        return (jnp.where(ok, beta, 0.0), ok)

    state = (jnp.zeros((), mask.dtype), jnp.asarray(True))
    if m <= _UNROLL_MAX:
        for k in range(m):
            state = step(k, state)
    else:
        state = lax.fori_loop(0, m, step, state)


def lanczos_coeffs_resident(op, b, m: int, *, tol: float = 1e-7,
                            interpret: bool = False):
    """(alphas, betas, beta0, m_used, broke) — drop-in twin of
    ``ops.krylov.lanczos_coeffs`` for 1-D constant stencils, the whole
    pass in ONE VMEM-resident dispatch."""
    if not resident_supported(op):
        raise ValueError("lanczos_coeffs_resident requires a 1-D "
                         "constant StencilOperator with n <= "
                         f"{RESIDENT_MAX_N}")
    b = jnp.asarray(b)
    dt = b.dtype
    n = op.grid_shape[0]
    R, mask_np = _layout_1d(n)
    beta0 = jnp.linalg.norm(b)
    v0 = jnp.where(beta0 > 0, b / jnp.where(beta0 > 0, beta0, 1), 0.0)
    Xp = jnp.pad(v0, (0, R * _LANES - n)).reshape(R, _LANES)
    offsets = tuple(off[0] for off in op.offsets)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    ab = pl.pallas_call(
        functools.partial(_resident_lanczos_kernel,
                          offsets=offsets, m=int(m), tol=float(tol)),
        in_specs=[smem, vmem, vmem],
        out_specs=smem,
        out_shape=jax.ShapeDtypeStruct((int(m), 2), dt),
        scratch_shapes=[pltpu.VMEM((R, _LANES), dt),
                        pltpu.VMEM((R, _LANES), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(op.coeffs.astype(dt), Xp, jnp.asarray(mask_np))
    alphas, betas = ab[:, 0], ab[:, 1]
    # α_k is recorded through the first sub-tol β (inclusive): m_used =
    # index of the first zero β + 1, or m when none broke
    any0 = jnp.any(betas == 0)
    first0 = jnp.argmax(betas == 0).astype(jnp.int32)
    m_used = jnp.where(any0, first0 + 1, m)
    m_used = jnp.where(beta0 > 0, m_used, 0)
    broke = any0 | (beta0 == 0)
    return alphas, betas, beta0.astype(jnp.result_type(dt, jnp.float32)), \
        m_used.astype(jnp.int32), broke


def expv_two_pass_resident(op, b, t, m: int, *, tol: float = 1e-7,
                           interpret: bool = False):
    """Storage-free 1-D Hermitian expv with BOTH passes VMEM-resident:
    pass 1 = ``lanczos_coeffs_resident`` (one dispatch), the m×m
    reduced tridiagonal exponential on device, pass 2 = the resident
    recurrence with replay rows derived from the recorded (α, β) —
    v_{k+1} = (A v_k − α_k v_k − β_{k−1} v_{k−1})/β_k, w += c_k v_k.
    Two kernel dispatches total (the streaming two-pass runs 2m
    sweeps)."""
    from ...models.expv import _lanczos_reduced_coeffs

    b = jnp.asarray(b)
    t = jnp.asarray(t)
    dt = b.dtype
    alphas, betas, beta0, m_used, broke = lanczos_coeffs_resident(
        op, b, m, tol=tol, interpret=interpret)
    coeffs = _lanczos_reduced_coeffs(alphas, betas, beta0, t)
    # replay rows from the record (cc_0 multiplies ω_{−1} = 0 — value
    # irrelevant, kept 0 via the zero-padded β_{k−1} shift)
    live = betas > 0
    safe = jnp.where(live, betas, 1.0)
    bprev = jnp.concatenate([jnp.zeros((1,), dt), betas[:-1]])
    ca = jnp.where(live, 1.0 / safe, 0.0)
    cb = -alphas * ca
    cc = jnp.where(live, -bprev / safe, 0.0)
    rows = jnp.stack([ca, cb, cc, coeffs.astype(dt)], axis=1)
    scale = jnp.where(beta0 > 0, 1.0 / jnp.where(beta0 > 0, beta0, 1.0),
                      0.0)
    w = recurrence_apply_resident(op, b, rows, scale=scale,
                                  interpret=interpret)
    return jnp.where(beta0 > 0, w, jnp.zeros_like(w))


def phiv_two_pass_resident(op, b, t, m: int, k: int, *,
                           tol: float = 1e-7, interpret: bool = False):
    """Storage-free 1-D Hermitian φ-actions (w (n, k+1), err) with both
    passes VMEM-resident: pass 1 = ``lanczos_coeffs_resident``; the
    reduced augmented exponential on device (``phiv_dense``); pass 2 =
    ONE multi-column resident dispatch accumulating every φ order from
    the shared regenerated basis chain."""
    from ..phi_dense import phiv_dense

    b = jnp.asarray(b)
    t = jnp.asarray(t)
    dt = b.dtype
    alphas, betas, beta0, m_used, broke = lanczos_coeffs_resident(
        op, b, m, tol=tol, interpret=interpret)
    T = (jnp.diag(alphas) + jnp.diag(betas[:-1], 1)
         + jnp.diag(betas[:-1], -1))
    e1 = jnp.zeros((m,), dt).at[0].set(1)
    C2 = phiv_dense(t.astype(dt) * T, e1, k)          # (m, k+1)
    coeffs = C2 * beta0.astype(dt)

    live = betas > 0
    safe = jnp.where(live, betas, 1.0)
    bprev = jnp.concatenate([jnp.zeros((1,), dt), betas[:-1]])
    ca = jnp.where(live, 1.0 / safe, 0.0)
    cb = -alphas * ca
    cc = jnp.where(live, -bprev / safe, 0.0)
    rows = jnp.stack([ca, cb, cc, jnp.zeros_like(ca)], axis=1)
    v0 = jnp.where(beta0 > 0, b / jnp.where(beta0 > 0, beta0, 1), 0.0)
    w = recurrence_apply_resident_multi(op, v0, rows, coeffs,
                                        interpret=interpret)

    last = jnp.maximum(m_used - 1, 0)
    h_res = jnp.where(m_used < m, betas[jnp.minimum(m_used, m - 1)],
                      betas[m - 1]).astype(dt)
    err = jnp.abs(beta0.astype(dt) * h_res * t.astype(dt) * C2[last, k])
    zero = beta0 > 0
    w = jnp.where(zero, w, jnp.zeros_like(w))
    err = jnp.where(zero, err, jnp.zeros_like(err))
    return w, err


def recurrence_apply_resident(op, b, rows, *, scale=1.0,
                              interpret: bool = False):
    """w = Σ_k cw_k·ω_k over the three-term recurrence (module doc) for a
    1-D constant ``StencilOperator`` — ONE Pallas dispatch, all state in
    VMEM. Drop-in 1-D sibling of ``recurrence_apply_fused``; callers
    gate on ``resident_supported(op)``."""
    if not resident_supported(op):
        raise ValueError("recurrence_apply_resident requires a 1-D "
                         f"constant StencilOperator with n <= "
                         f"{RESIDENT_MAX_N} (got {type(op).__name__})")
    b = jnp.asarray(b)
    n = op.grid_shape[0]
    R, mask_np = _layout_1d(n)
    Xp = jnp.pad(b, (0, R * _LANES - n)).reshape(R, _LANES)
    rows = jnp.asarray(rows, b.dtype)
    offsets = tuple(off[0] for off in op.offsets)
    Wp, _ = _resident_call(Xp, jnp.asarray(mask_np), rows, op.coeffs,
                           scale, offsets=offsets, interpret=interpret)
    return Wp.reshape(-1)[:n]
