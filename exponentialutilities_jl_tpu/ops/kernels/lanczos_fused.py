"""Fused Lanczos-step Pallas kernel for 3-D constant-coefficient stencils.

One Lanczos iteration is: z = A·v_j; α = v_j·z; y = z − α·v_j − β·v_{j-1};
β_{j+1} = ‖y‖; v_{j+1} = y/β_{j+1}. As separate XLA ops (matvec, dot,
axpy, norm, scale) this streams ~9n of HBM traffic per iteration
(measured 0.54 ms at n = 10M in round 1). This kernel fuses the WHOLE
iteration — recurrence combination, next matvec, and both reductions —
into one sliding-plane sweep with ~5n traffic:

    read  Z̃_p, Ṽc_p, Ṽp_p                        (3 planes per step)
    y_p  = ca·Z̃_p + cb·Ṽc_p + cc·Ṽp_p           → write + 3-plane VMEM ring
    Zn_{p-1} = stencil(y_{p-2}, y_{p-1}, y_p)     → write (one-plane lag)
    partials: Σ y², Σ y·Zn                         → per-step rows

**No normalization pass ever runs.** The sweep stores the UNNORMALIZED
y_j = β_{j+1}·v_{j+1} and its image Z̃_j = A·y_j; the NEXT sweep's scalar
coefficients absorb the normalizations exactly:

    ca = 1/β_j,  cb = −α_j/β_j,  cc = −β_j/β_{j−1},

with α_j = (y·Ay)/‖y‖² and β_j = ‖y‖ read off the previous sweep's
moments. Iteration 0 is the same kernel with (ca, cb, cc) = (1, 0, 0)
and Z̃ = v_0, which emits A·v_0 and the first moments.

Geometry: ghosted plane layout (GhostGrid) — x padded to >nx multiple of
128 lanes, pad lanes identically zero so the ±1 lane shift's row wrap is
exact Dirichlet; y ghost rows zero; z ends masked. The y-ring scratch
persists across the sequential TPU grid (planes stream once).

Used by ``lanczos_coeffs_fused`` — drop-in pass-1 twin of
ops/krylov.lanczos_coeffs for ``StencilOperator`` grids (two-pass expv /
NW / KIOPS all consume the same (α, β) record). Reference context: the
Lanczos recurrence, src/arnoldi.jl:375-466; the fusion has no reference
counterpart (SURVEY §7 phase 4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["GhostGrid", "GhostGrid2D", "ghost_grid_for",
           "fused_lanczos_step", "lanczos_coeffs_fused",
           "recurrence_apply_fused",
           "lanczos_replay_fused", "stencil_matvec_fused"]

_LANES = 128

# scoped-VMEM footprint model (measured r4, BENCHMARKS.md): bytes per
# plane row for the accum sweep + per double-buffered coefficient slot,
# and the raised Mosaic cap the kernels request. Shared by _plan_3d,
# fused_lanczos_step and the sharded variable planner — recalibrate in
# ONE place.
VMEM_CAP_BYTES = 100 * 2 ** 20


def row_budget_bytes(n_coeff_slots: int = 0) -> int:
    return 16_000 + 1100 * n_coeff_slots



class GhostGrid:
    """Static description of the ghosted plane layout for (nz, ny, nx).

    Each grid LAYER (z-plane) has (ny + 2) ghosted grid rows of
    P = ceil((nx+1)/128) row pieces (≥ 1 pad lane guaranteed so lane
    wraps land in zeros), padded up to a multiple of 8 rows (= ``S``).
    ``zb`` layers are stacked per pallas plane (a SLAB): within-slab
    z coupling is a ±S row shift, and the slab-edge layers read the
    neighbour slab through the kernel's masked boundary shifts — fewer,
    fatter planes amortize the per-step pipeline overhead (measured
    745 GB/s at R ≈ 1450 vs 435 GB/s at R ≈ 300 on a v5e).
    Hashable → usable as a static jit arg.
    """

    def __init__(self, nz, ny, nx, zb: int = 1, ypad: int = 2,
                 xpad: int = 1, perm=(0, 1, 2)):
        # ``perm`` reorients the sweep: (nz, ny, nx) are the extents of
        # the ORIGINAL grid axes perm[0], perm[1], perm[2] — the sweep
        # streams along original axis perm[0], rows run along perm[1],
        # lanes along perm[2]. to_ghost/from_ghost transpose once per
        # solve (the sweeps themselves operate on ghost planes), so a
        # giant-xy grid whose natural layers overflow the scoped-VMEM
        # budget rides the fused kernel by sweeping its longest axis
        # (ghost_grid_for picks the orientation). Offsets are permuted
        # to match inside fused_lanczos_step.
        self.perm = tuple(int(p) for p in perm)
        if sorted(self.perm) != [0, 1, 2]:
            raise ValueError(f"perm {self.perm} is not a permutation of "
                             "(0, 1, 2)")
        self.nz, self.ny, self.nx = int(nz), int(ny), int(nx)
        self.ypad = max(2, int(ypad))          # max |dy| the layout absorbs
        self.xpad = max(1, int(xpad))          # min zero pad lanes (max |dx|)
        self.P = -(-(self.nx + self.xpad) // _LANES)
        self.nxp = self.P * _LANES
        # S >= (ny + max|dy|)·P keeps every |dy|-shifted read inside this
        # layer's ghost/pad rows or the neighbour layer's bottom ghost
        # row (see the wide-offset analysis in _fused_kernel); the two
        # ghost rows alone cover |dy| <= 2 (the historical layout)
        rp = (self.ny + self.ypad) * self.P
        self._lr = -(-rp // 8) * 8             # geometric rows per layer
        self.S = self._lr                      # kernel layer stride
        self.zb = max(1, min(int(zb), self.nz))
        self.nslabs = -(-self.nz // self.zb)
        self.rows_per_plane = self._lr * self.zb
        self.n = self.nz * self.ny * self.nx
        self.L = self.zb                       # layers per slab
        self.NL = self.nz                      # total layers
        self.B0 = 0                            # first layer's row offset

    d2 = False                   # 2-D slab mode (GhostGrid2D)

    def __hash__(self):
        return hash((self.nz, self.ny, self.nx, self.zb, self.ypad,
                     self.xpad, self.perm))

    def __eq__(self, other):
        # type-strict: a GhostGrid2D with (nz, ys, nx) matching a true
        # 3-D grid must NOT hit the same jit cache entry
        return (type(other) is type(self)
                and (self.nz, self.ny, self.nx, self.zb, self.ypad,
                     self.xpad, self.perm)
                == (other.nz, other.ny, other.nx, other.zb, other.ypad,
                    other.xpad, other.perm))

    def to_ghost(self, x):
        """(n,) flat row-major grid vector → (nslabs, rows_per_plane,
        128)."""
        if self.perm != (0, 1, 2):
            orig = [0, 0, 0]
            for i, ax in enumerate(self.perm):
                orig[ax] = (self.nz, self.ny, self.nx)[i]
            X = x.reshape(orig).transpose(self.perm)
        else:
            X = x.reshape(self.nz, self.ny, self.nx)
        Xp = jnp.pad(X, ((0, 0), (1, 1), (0, self.nxp - self.nx)))
        Xp = Xp.reshape(self.nz, (self.ny + 2) * self.P, _LANES)
        extra = self._lr - (self.ny + 2) * self.P
        if extra:
            Xp = jnp.pad(Xp, ((0, 0), (0, extra), (0, 0)))
        if self.zb > 1:
            pz = self.nslabs * self.zb - self.nz
            if pz:
                Xp = jnp.pad(Xp, ((0, pz), (0, 0), (0, 0)))
            Xp = Xp.reshape(self.nslabs, self.rows_per_plane, _LANES)
        return Xp

    def from_ghost(self, Xg):
        Xl = Xg.reshape(-1, self._lr, _LANES)[:self.nz]
        Xp = Xl[:, :(self.ny + 2) * self.P, :].reshape(
            self.nz, self.ny + 2, self.nxp)
        X = Xp[:, 1:-1, :self.nx]
        if self.perm != (0, 1, 2):
            X = X.transpose(tuple(np.argsort(self.perm)))
        return X.reshape(-1)

    def xmask(self):
        """(rows_per_plane, 128) 1/0 mask of real cells (identical for
        every layer of a slab; partial final slabs are cut in-kernel)."""
        m = np.zeros((self._lr, _LANES), np.float32)
        for piece in range(self.P):
            lo = piece * _LANES
            hi = min(self.nx, lo + _LANES)
            if hi > lo:
                for yrow in range(1, self.ny + 1):
                    m[yrow * self.P + piece, :hi - lo] = 1.0
        return np.tile(m, (self.zb, 1))


class GhostGrid2D(GhostGrid):
    """Slab layout for a 2-D (ny, nx) grid (round-3 STATUS gap #2).

    A 2-D grid has no natural "plane" axis for the sliding sweep, so the
    y axis is cut into slabs of ``ys`` grid rows: plane p holds rows
    [p·ys, (p+1)·ys) in the same ghosted row-piece layout as a 3-D plane
    (zero ghost rows top/bottom). The 5-point stencil's within-slab y
    coupling is the usual ±P row shift; the CROSS-slab coupling (last
    real row of slab p ↔ first real row of slab p±1) is applied by the
    kernel in ``d2`` mode as a masked row shift of the NEIGHBOUR plane
    already in the y-ring — the cz couplings of the 3-D sweep replaced
    by two masked boundary terms riding the same cy± coefficients.

    The final slab may be partial (ny % ys ≠ 0); its pad rows are kept
    identically zero by an in-kernel row cutoff so no sweep ever leaks
    pad values back into real cells.

    ``ys`` default targets R ≈ 1100 rows (~560 KB planes): the measured
    on-chip sweet spot at 10M cells (0.137 ms/matvec = 1459 GB/s at
    ys=40/P=25 vs 0.29 ms at R≈500 — per-step overhead dominates small
    slabs) while staying under the 16 MB scoped-VMEM limit (R = 2056
    OOMs: the kernel holds ~11 plane buffers, more in variable mode —
    ``ghost_grid_for`` picks a smaller default for variable-coefficient
    operators, whose coefficient stream adds 16 plane buffers). Any
    1 ≤ ys ≤ ny works.
    """

    d2 = True

    def __init__(self, ny, nx, ys=None, xpad: int = 1):
        ny, nx = int(ny), int(nx)
        if ys is None:
            P = -(-(nx + max(1, xpad)) // _LANES)
            ys = max(8, 1100 // P - 2)
        ys = int(min(ys, ny))
        super().__init__(-(-ny // ys), ys, nx, xpad=xpad)
        self.ys = ys
        self.nyg = ny
        self.n = ny * nx                 # override the nz·ys·nx of super
        self.S = self.P                  # a LAYER is one grid row
        self.L = ys
        self.NL = ny
        self.B0 = self.P                 # ghost row above the first layer

    def __hash__(self):
        return hash((2, self.nyg, self.nx, self.ys, self.xpad))

    def __eq__(self, other):
        return (type(other) is type(self)
                and (self.nyg, self.nx, self.ys, self.xpad)
                == (other.nyg, other.nx, other.ys, other.xpad))

    def to_ghost(self, x):
        """(ny·nx,) flat row-major vector → (nslabs, rows_per_plane,
        128)."""
        X = jnp.asarray(x).reshape(self.nyg, self.nx)
        X = jnp.pad(X, ((0, self.nz * self.ys - self.nyg), (0, 0)))
        return super().to_ghost(X.reshape(-1))

    def from_ghost(self, Xg):
        flat = super().from_ghost(Xg)     # (nz·ys·nx,)
        return flat.reshape(-1, self.nx)[:self.nyg].reshape(-1)


def _plan_3d(gs, offsets, *, variable: bool, C: int = 0,
             many: bool = False) -> GhostGrid:
    """Pick the sweep orientation for a 3-D grid.

    The natural orientation (sweep along axis 0) is kept whenever it
    fits the scoped-VMEM budget — the benchmarked layouts are
    unchanged. When a single xy layer is too large (giant-xy grids, or
    wide-|dz| stencils whose max|dz| layers per slab overflow), the
    grid is re-oriented: to_ghost/from_ghost transpose once per SOLVE
    (the sweeps operate on ghost planes throughout), so sweeping the
    longest axis instead costs two transposes total and rescues
    pancake/thin grids from the XLA scan fallback. Among feasible
    orientations the one streaming the fewest padded cells per real
    cell wins (ties → plane size closest to the R ≈ 1100 pipeline
    sweet spot). Raises ValueError when NO orientation fits (callers
    fall back to the XLA scan path)."""
    n = gs[0] * gs[1] * gs[2]
    tgt = 700 if many else 1100
    best = None
    for perm in ((0, 1, 2), (1, 0, 2), (2, 0, 1),
                 (0, 2, 1), (1, 2, 0), (2, 1, 0)):
        dims = tuple(gs[p] for p in perm)
        mo = [max((abs(o[p]) for o in offsets), default=0) for p in perm]
        xpad, ypad = max(1, mo[2]), max(2, mo[1])
        P = -(-(dims[2] + xpad) // _LANES)
        S = -(-((dims[1] + ypad) * P) // 8) * 8
        zmin = max(1, mo[0])
        if variable:
            # per-row scoped footprint ≈ 15.5 KB + ~1.1 KB per
            # double-buffered coefficient slot (the kernel raises its
            # own VMEM cap to match — fused_lanczos_step)
            row_b = row_budget_bytes(C)
            if zmin * S * row_b > VMEM_CAP_BYTES:
                continue
            # grow zb toward the R ≈ tgt pipeline sweet spot like the
            # constant branch (tiny-S orientations would otherwise run
            # thousands of per-step-overhead-bound pipeline steps),
            # bounded by the scoped-VMEM footprint model
            zb = max(zmin, min(VMEM_CAP_BYTES // (S * row_b),
                               max(1, tgt // S)))
        else:
            # beyond ~2900 rows/plane even the raised VMEM cap
            # overflows (measured footprint model, BENCHMARKS.md r4)
            if zmin * S > 2900:
                continue
            zb = max(zmin, max(1, tgt // S))
        if perm == (0, 1, 2):
            return GhostGrid(*dims, zb=zb, ypad=ypad, xpad=xpad)
        zb = min(zb, dims[0])
        nslabs = -(-dims[0] // zb)
        key = (round(nslabs * zb * S * _LANES / n, 3), abs(zb * S - 1100))
        if best is None or key < best[0]:
            best = (key, dims, zb, ypad, xpad, perm)
    if best is None:
        kind = (f"variable-coefficient sweep: {C} coefficient planes"
                if variable else "fused sweep: the stencil's slab layers")
        raise ValueError(
            f"{kind} overflow the scoped-VMEM budget in every sweep "
            f"orientation of grid {tuple(gs)} — the xy plane is too "
            "large; falling back to the XLA scan path")
    _, dims, zb, ypad, xpad, perm = best
    return GhostGrid(*dims, zb=zb, ypad=ypad, xpad=xpad, perm=perm)


def ghost_grid_for(op):
    """The ghost layout matching an operator's grid: 3-D slabbed plane
    sweep (orientation chosen by ``_plan_3d`` — axis-permuted when the
    natural xy layers overflow the scoped-VMEM budget) or 2-D slab
    sweep (``GhostGrid2D``). Slab sizes target R ≈ 1100 rows (the
    measured DMA-pipeline sweet spot); variable-coefficient operators
    keep max|slab-offset| layers per plane — their coefficient stream
    is laid out per layer and adds 2·C plane buffers to the kernel's
    VMEM footprint."""
    from ..stencil import VariableStencilOperator

    gs = op.grid_shape
    if len(gs) == 3:
        if isinstance(op, VariableStencilOperator):
            return _plan_3d(gs, tuple(op.offsets), variable=True,
                            C=len(op.offsets))
        return _plan_3d(gs, tuple(op.offsets), variable=False,
                        many=len(op.offsets) > 7)
    if len(gs) == 2:
        if isinstance(op, VariableStencilOperator):
            maxdy = max((abs(o[0]) for o in op.offsets), default=0)
            maxdx = max((abs(o[1]) for o in op.offsets), default=0)
            xpad = max(1, maxdx)
            P = -(-(gs[1] + xpad) // _LANES)
            C = len(op.offsets)
            # keep the r3-measured R ≈ 480 sweet spot at the 5-point
            # C = 5..8 stream, scaling rows down as slots grow
            ys = max(8, maxdy, (3840 // max(8, C)) // P - 2)
            if (ys + 2) * P * row_budget_bytes(C) > VMEM_CAP_BYTES:
                raise ValueError(
                    f"variable-coefficient sweep: {C} coefficient "
                    "planes overflow the scoped-VMEM budget — falling "
                    "back to the XLA scan path")
            return GhostGrid2D(*gs, ys=ys, xpad=xpad)
        maxdy = max((abs(o[0]) for o in op.offsets), default=0)
        maxdx = max((abs(o[1]) for o in op.offsets), default=0)
        xpad = max(1, maxdx)
        P = -(-(gs[1] + xpad) // _LANES)
        if len(op.offsets) > 5:          # 9-point+: larger shift cache
            ys = max(8, maxdy, 700 // P - 2)
        else:
            ys = max(8, maxdy, 1100 // P - 2)
        return GhostGrid2D(*gs, ys=ys, xpad=xpad)
    raise ValueError("fused sweep requires a 2-D or 3-D grid")


def _lane_shift_full(buf, s: int):
    """±s element shift of the flat (rows, 128) plane (any |s| < 128);
    row wraps land in the guaranteed x-pad/ghost zero lanes, so the
    result is exact Dirichlet (|s| pad lanes required — checked at
    dispatch; GhostGrid(xpad=...) provides them). Built from native
    lane rotates + a sublane-aligned row shift + one lane-mask select
    (Mosaic rejects lane-offset concats)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    a = abs(s)
    if s > 0:
        # S[r, l] = buf[r, l+a] (l < 128−a); else buf[r+1, l+a−128]
        same = pltpu.roll(buf, _LANES - a, 1)       # [r, l] <- buf[r, l+a]
        nxt = pltpu.roll(_row_shift_full(buf, 1), _LANES - a, 1)
        return jnp.where(lane < _LANES - a, same, nxt)
    # S[r, l] = buf[r, l−a] (l ≥ a); else buf[r−1, l−a+128]
    same = pltpu.roll(buf, a, 1)                    # [r, l] <- buf[r, l-a]
    prv = pltpu.roll(_row_shift_full(buf, -1), a, 1)
    return jnp.where(lane >= a, same, prv)


def _row_shift_full(buf, off: int):
    """Row shift by ``off`` (zeros shift in — ghost rows absorb)."""
    R = buf.shape[0]
    o = abs(off)
    z = jnp.zeros((o, _LANES), buf.dtype)
    if off > 0:
        return jnp.concatenate([buf[o:, :], z], axis=0)
    return jnp.concatenate([z, buf[:R - o, :]], axis=0)


def _fused_kernel(coef_ref, Z_hbm, Vc_hbm, Vp_hbm, mask_ref, C_hbm, W_hbm,
                  Y_hbm, Znext_hbm, part_ref, W_out,
                  yring, zbuf, vcbuf, vpbuf, stage, cbuf, wbuf, sems, *,
                  P: int, nz: int, cpairs: tuple,
                  S: int, L: int, NL: int, B0: int,
                  accum: bool, variable: bool = False,
                  d2: bool = False):
    """Pipelined plane schedule: input planes for step i+1 prefetch while
    step i computes (double-buffered zbuf/vcbuf/vpbuf); the Y/Znext writes
    are fire-and-forget, waited just before their buffer is reused (ring
    slot i%3 / stage parity) and drained at the final step.

    ``variable=True``: the stencil coefficients are PER-CELL fields —
    ``C_hbm`` is (nz, C, R, 128) holding, for each output plane, one
    ghost-layout coefficient plane per stencil offset (slot order =
    the operator's offset order; the coupling geometry rides ``cpairs``
    with the 4th element the SLOT index instead of a constant). One
    (C, R, 128) block DMAs per step, double-buffered one step ahead of
    its use (plane p = i−1 computes at step i), so the 7-point
    variable sweep streams 12n/iteration vs the constant sweep's 5n —
    still one pass, reductions included. Box/wide offsets use the same
    generalized boundary bands as the constant path.

    Slab statics (see GhostGrid/GhostGrid2D): each pallas plane holds
    ``L`` grid LAYERS of ``S`` rows starting at row ``B0`` (a layer =
    one z-plane in 3-D, one grid row in 2-D; ``NL`` = total layers).
    Within-slab layer coupling is a ±S row shift; the edge layers read
    the neighbour plane through masked boundary shifts. ``cpairs``
    holds (ds, rs, dx, c|slot): slab-axis offset, inner row shift
    (dy·P in 3-D, 0 in 2-D), lane shift, coefficient (constant path)
    or coefficient-plane slot (variable path)."""
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    par = i % 2
    ca = coef_ref[0]
    cb = coef_ref[1]
    cc = coef_ref[2]

    @pl.when(i % 8 == 0)
    def _():
        part_ref[:, :] = jnp.zeros_like(part_ref)

    lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    def in_dmas(p, plane):
        return [pltpu.make_async_copy(src.at[plane], dst.at[p],
                                      sems.at[p * 3 + k])
                for src, dst, k in ((Z_hbm, zbuf, 0), (Vc_hbm, vcbuf, 1),
                                    (Vp_hbm, vpbuf, 2))]

    def ywrite(slot, plane):
        return pltpu.make_async_copy(yring.at[slot], Y_hbm.at[plane],
                                     sems.at[6 + slot])

    def zwrite(p, plane):
        return pltpu.make_async_copy(stage.at[p], Znext_hbm.at[plane],
                                     sems.at[9 + p])

    def cdma(p, plane):
        return pltpu.make_async_copy(C_hbm.at[plane], cbuf.at[p],
                                     sems.at[12 + p])

    def wread(slot, plane):
        return pltpu.make_async_copy(W_hbm.at[plane], wbuf.at[slot],
                                     sems.at[14 + slot])

    def wwrite(slot, plane):
        return pltpu.make_async_copy(wbuf.at[slot], W_out.at[plane],
                                     sems.at[16 + slot])

    @pl.when(i == 0)
    def _():
        for cp in in_dmas(0, 0):
            cp.start()
        if accum:
            wread(0, 0).start()

    @pl.when(i + 1 < nz)
    def _():
        for cp in in_dmas((i + 1) % 2, i + 1):
            cp.start()

    if variable:
        # coefficient planes: plane i prefetches at step i, is consumed
        # at step i+1 (the z-compute for plane p = i runs one step late)
        @pl.when(i < nz)
        def _():
            cdma(i % 2, i).start()

    @pl.when(i < nz)
    def _():
        for cp in in_dmas(par, i):
            cp.wait()
        # y_i = ca·Z + cb·Vc + cc·Vp (masked so pads stay zero)
        y = (ca * zbuf[par] + cb * vcbuf[par] + cc * vpbuf[par]) \
            * mask_ref[:, :]
        if NL % L:
            # partial final slab: rows past the true grid end must stay
            # identically zero or later sweeps leak pad values back in
            rowi = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
            cut = jnp.minimum(L, NL - i * L)
            y = jnp.where(rowi < B0 + S * cut, y, 0.0)
        # ring slot i%3 may still have step i-3's Y write in flight
        @pl.when(i >= 3)
        def _():
            ywrite(i % 3, i - 3).wait()
        yring[i % 3] = y
        prow = jnp.where(lane2 == 0, jnp.sum(y * y), 0.0)
        part_ref[pl.ds(i % 8, 1), :] = part_ref[pl.ds(i % 8, 1), :] + prow
        ywrite(i % 3, i).start()
        if accum:
            # w += cw·v_j: accumulate the ALREADY-LOADED Vc plane into the
            # aliased accumulator (the replay pass of two-pass expv/phiv).
            # Pipelined like the main planes (a first cut did blocking
            # start/wait round-trips here and measured ~2x the plain
            # sweep instead of 7n/5n): plane i+1's W prefetches during
            # step i's compute, the write is fire-and-forget, and slot
            # reuse is guarded by waiting the write two steps back.
            cw = coef_ref[3]
            s0 = i % 2

            @pl.when(i >= 1)
            def _():
                wwrite((i + 1) % 2, i - 1).wait()   # frees slot (i+1)%2

            @pl.when(i + 1 < nz)
            def _():
                wread((i + 1) % 2, i + 1).start()
            wread(s0, i).wait()
            wbuf[s0] = wbuf[s0] + cw * vcbuf[par]
            wwrite(s0, i).start()

    @pl.when(i >= 1)
    def _():
        p = i - 1
        yc = yring[p % 3]
        zm = jnp.where(p >= 1, yring[(p - 1) % 3], 0.0)
        zp = jnp.where(p + 1 < nz, yring[(p + 1) % 3], 0.0)
        rowi2 = jax.lax.broadcasted_iota(jnp.int32, yc.shape, 0)
        # static (ds, rs, dx, c|slot) couplings — any box stencil whose
        # slab-axis offsets satisfy |ds| <= L (13-point 4th-order,
        # 19-point 6th-order FD, 9/27/125-point boxes; asymmetric
        # allowed): one shift-multiply-add per coupling inside the slab
        # (row-shift results shared per (plane, shift)); a slab-axis
        # coupling of |ds| = d additionally reads the d masked edge
        # layers of the neighbour plane already in the 3-plane ring —
        # layer l ∈ [L−d, L) reads zp layer l+d−L, a single row shift
        # of rs + (d−L)·S for the whole band (and mirrored for zm).
        # The within-slab shift pulls zeros past the plane edge for
        # those band layers, so the two terms never double-count.
        # L == 1 degenerates exactly to whole-plane neighbour coupling
        # for |ds| <= 1 (band = the full layer, shift = rs).
        # Variable mode: cv is the slot's PER-CELL coefficient plane
        # (indexed at the OUTPUT cell, the VariableStencilOperator
        # convention) instead of a compile-time constant — same
        # geometry, (R, 128) broadcast instead of scalar.
        if variable:
            cdma(p % 2, p).wait()
            cpar = p % 2
        cache = {}

        def sh(tag, base, rshift, dx):
            key = (tag, rshift)
            if key not in cache:
                cache[key] = (_row_shift_full(base, rshift)
                              if rshift else base)
            t = cache[key]
            return _lane_shift_full(t, dx) if dx else t

        zn = jnp.zeros(yc.shape, yc.dtype)
        for ds, rs, dx, key in cpairs:
            if variable:
                cv = cbuf[cpar, key]
            else:
                if key == 0.0:
                    continue
                cv = key
            if L > abs(ds) or ds == 0:
                zn = zn + cv * sh("c", yc, rs + ds * S, dx)
            if ds > 0:
                mk = (rowi2 >= B0 + max(L - ds, 0) * S) \
                    & (rowi2 < B0 + L * S)
                zn = zn + cv * jnp.where(
                    mk, sh("p", zp, rs + (ds - L) * S, dx), 0.0)
            elif ds < 0:
                mk = (rowi2 >= B0) \
                    & (rowi2 < B0 + min(-ds, L) * S)
                zn = zn + cv * jnp.where(
                    mk, sh("m", zm, rs + (L + ds) * S, dx), 0.0)
        zn = zn * mask_ref[:, :]
        if NL % L:
            zn = jnp.where(
                rowi2 < B0 + S * jnp.minimum(L, NL - p * L), zn, 0.0)
        # stage parity: step i-2's Znext write may still be in flight
        @pl.when(i >= 3)
        def _():
            zwrite(par, i - 3).wait()
        stage[par] = zn
        prow = jnp.where(lane2 == 1, jnp.sum(zn * yc), 0.0)
        part_ref[pl.ds(i % 8, 1), :] = part_ref[pl.ds(i % 8, 1), :] + prow
        zwrite(par, p).start()

    @pl.when(i == nsteps - 1)
    def _():
        # Drain every write that can still be in flight. The last ywrite
        # was started at step i-1 (plane i-1); the in-loop wait for plane
        # j-3 is gated on j < nz, so planes i-3..i-1 are all pending here
        # (an unwaited DMA semaphore at kernel exit faults real hardware
        # even though interpret mode accepts it).
        for d in (3, 2, 1):
            plane = i - d

            @pl.when((plane >= 0) & (plane < nz))
            def _():
                ywrite(plane % 3, plane).wait()
        for d in (1, 0):
            step = i - d

            @pl.when(step >= 1)
            def _():
                zwrite(step % 2, step - 1).wait()
        if accum:
            # last W write started at the final accum step (plane nz-1);
            # earlier ones were waited in-loop before slot reuse
            wwrite((nz - 1) % 2, nz - 1).wait()


def _kernel_plain(coef, Z, Vc, Vp, mask, Y, Zn, parts,
                  yring, zbuf, vcbuf, vpbuf, stage, sems, **kw):
    _fused_kernel(coef, Z, Vc, Vp, mask, None, None, Y, Zn, parts, None,
                  yring, zbuf, vcbuf, vpbuf, stage, None, None, sems,
                  accum=False, **kw)


def _kernel_accum(coef, Z, Vc, Vp, mask, W, Y, Zn, parts, Wout,
                  yring, zbuf, vcbuf, vpbuf, stage, wbuf, sems, **kw):
    _fused_kernel(coef, Z, Vc, Vp, mask, None, W, Y, Zn, parts, Wout,
                  yring, zbuf, vcbuf, vpbuf, stage, None, wbuf, sems,
                  accum=True, **kw)


def _kernel_var(coef, Z, Vc, Vp, mask, C, Y, Zn, parts,
                yring, zbuf, vcbuf, vpbuf, stage, cbuf, sems, **kw):
    _fused_kernel(coef, Z, Vc, Vp, mask, C, None, Y, Zn, parts, None,
                  yring, zbuf, vcbuf, vpbuf, stage, cbuf, None, sems,
                  accum=False, variable=True, **kw)


def _kernel_var_accum(coef, Z, Vc, Vp, mask, C, W, Y, Zn, parts, Wout,
                      yring, zbuf, vcbuf, vpbuf, stage, cbuf, wbuf, sems,
                      **kw):
    _fused_kernel(coef, Z, Vc, Vp, mask, C, W, Y, Zn, parts, Wout,
                  yring, zbuf, vcbuf, vpbuf, stage, cbuf, wbuf, sems,
                  accum=True, variable=True, **kw)


@functools.partial(jax.jit, static_argnames=("grid_desc", "coeffs_static",
                                             "interpret", "vma"))
def fused_lanczos_step(Zg, Vcg, Vpg, coefs, mask, *, grid_desc: GhostGrid,
                       coeffs_static, w_accum=None, cfields=None,
                       interpret: bool = False, vma=None):
    """One fused sweep. ``coefs`` = (ca, cb, cc[, cw]) scalars (module doc).

    Returns (Yg, Zng, ypy, yzy) — plus W_new when ``w_accum`` planes are
    given (the replay accumulator: W_new = w_accum + cw·Vc, updated
    in-place through an input/output alias during the same sweep).

    ``cfields`` = (nz, C, R, 128) per-cell coefficient planes switches
    the sweep to the variable-coefficient stencil; ``coeffs_static``
    then holds the ((dz, dy, dx), slot) offset→plane-slot pairs (what
    ``_fused_dispatch`` returns), or ``None`` for the legacy fixed
    8-slot layout (c0, cx+, cx−, cy+, cy−, cz+, cz−, pad). The matvec
    coefficients stream one (C, R, 128) block per plane step.
    """
    nz = grid_desc.nslabs            # pallas planes = slabs, not slices
    R = grid_desc.rows_per_plane
    P = grid_desc.P
    variable = cfields is not None
    if variable:
        if coeffs_static is None:       # legacy fixed-slot contract
            slots = (_SEVEN_POINT if not grid_desc.d2
                     else tuple((0,) + off for off in _FIVE_POINT))
            pairs3 = tuple((off, k) for k, off in enumerate(slots))
        else:
            pairs3 = tuple(coeffs_static)   # ((dz, dy, dx), slot)
    else:
        cs = tuple(coeffs_static)
        if cs and isinstance(cs[0], tuple):  # ((dz, dy, dx), c) pairs
            pairs3 = cs
        elif len(cs) == 4:              # legacy symmetric (c0, cx, cy, cz)
            c0s, cxs, cys, czs = cs
            pairs3 = tuple(zip(_SEVEN_POINT,
                               (c0s, cxs, cxs, cys, cys, czs, czs)))
        else:                           # legacy per-direction 7-tuple
            pairs3 = tuple(zip(_SEVEN_POINT, cs))
    if not grid_desc.d2 and grid_desc.perm != (0, 1, 2):
        # the grid layout is axis-permuted (GhostGrid(perm=...)): map
        # each original-axis offset onto the (sweep, row, lane) axes
        pm = grid_desc.perm
        pairs3 = tuple((tuple(off[p] for p in pm), c) for off, c in pairs3)
    if True:
        # decompose onto the slab geometry: (slab-axis offset, inner row
        # shift, lane shift, coeff|slot) — the slab axis is y in 2-D
        # (pairs were lifted to dz = 0) and z in 3-D
        if grid_desc.d2:
            cpairs = tuple((dy, 0, dx, c) for (dz, dy, dx), c in pairs3)
        else:
            cpairs = tuple((dz, dy * grid_desc.P, dx, c)
                           for (dz, dy, dx), c in pairs3)
        live = (list(cpairs) if variable
                else [p for p in cpairs if p[3] != 0.0])
        maxds = max((abs(p[0]) for p in live), default=0)
        maxdx = max((abs(p[2]) for p in live), default=0)
        if maxds > grid_desc.L:
            raise ValueError(
                f"|slab-axis offset| = {maxds} needs >= {maxds} layers "
                f"per slab (got {grid_desc.L}) so sources stay within "
                "the 3-plane ring — build the GhostGrid with zb >= "
                f"{maxds} / ys >= {maxds} (ghost_grid_for does this "
                "automatically when the plane budget allows)")
        if maxdx > grid_desc.nxp - grid_desc.nx:
            raise ValueError(
                f"|dx| = {maxdx} lane shifts need >= {maxdx} zero pad "
                f"lanes per grid row (nx = {grid_desc.nx} leaves "
                f"{grid_desc.nxp - grid_desc.nx}) — build the GhostGrid "
                f"with xpad >= {maxdx} (ghost_grid_for does) or fall "
                "back to the XLA scan path")
        if not grid_desc.d2:
            maxdy = max((abs(p[1]) // grid_desc.P for p in live),
                        default=0)
            if maxdy > 2 and grid_desc.S < \
                    (grid_desc.ny + maxdy) * grid_desc.P:
                raise ValueError(
                    f"|dy| = {maxdy} row shifts leak past this layer's "
                    "ghost/pad rows into the neighbour layer — build "
                    f"the GhostGrid with ypad >= {maxdy} "
                    "(ghost_grid_for does)")
    nsteps = nz + 1
    ns8 = -(-nsteps // 8) * 8
    dt = Zg.dtype
    accum = w_accum is not None

    plane_any = pl.BlockSpec(memory_space=pltpu.ANY)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),      # coefficients
        plane_any, plane_any, plane_any,            # Z, Vc, Vp
        pl.BlockSpec(memory_space=pltpu.VMEM),      # mask (R, 128)
    ]
    out_specs = [plane_any, plane_any,
                 pl.BlockSpec((8, _LANES), lambda i: (i // 8, 0),
                              memory_space=pltpu.VMEM)]
    # vma: inside shard_map with check_vma, pallas outputs must declare
    # their varying mesh axes (the sharded fused sweep passes the shard
    # axis name; single-device callers leave None)
    sds = (functools.partial(jax.ShapeDtypeStruct, vma=frozenset(vma))
           if vma else jax.ShapeDtypeStruct)
    out_shape = [sds((nz, R, _LANES), dt),
                 sds((nz, R, _LANES), dt),
                 sds((ns8, _LANES), dt)]
    scratch = [
        pltpu.VMEM((3, R, _LANES), dt),             # y ring
        pltpu.VMEM((2, R, _LANES), dt),             # z planes (dbl buf)
        pltpu.VMEM((2, R, _LANES), dt),             # vc planes
        pltpu.VMEM((2, R, _LANES), dt),             # vp planes
        pltpu.VMEM((2, R, _LANES), dt),             # znext staging
    ]
    operands = [jnp.asarray(coefs, dt), Zg, Vcg, Vpg, mask.astype(dt)]
    kw = dict(P=P, nz=nz, cpairs=cpairs, S=grid_desc.S, L=grid_desc.L,
              NL=grid_desc.NL, B0=grid_desc.B0, d2=grid_desc.d2)
    if variable:
        in_specs.append(plane_any)                  # coefficient planes
        operands.append(cfields)
    if accum:
        in_specs.append(plane_any)                  # W accumulator
        out_specs.append(plane_any)
        out_shape.append(sds((nz, R, _LANES), dt))
        operands.append(w_accum)
        # alias the W input (its operand index) onto the W_out output (3)
        alias = {len(operands) - 1: 3}
    else:
        alias = {}
    if variable:
        scratch.append(pltpu.VMEM((2, int(cfields.shape[1]), R, _LANES),
                                  dt))                     # coeff blocks
    if accum:
        scratch.append(pltpu.VMEM((2, R, _LANES), dt))     # w planes (dbl)
    scratch.append(pltpu.SemaphoreType.DMA((18,)))
    kern = {(False, False): _kernel_plain,
            (False, True): _kernel_accum,
            (True, False): _kernel_var,
            (True, True): _kernel_var_accum}[(variable, accum)]

    # Scoped-VMEM budget: Mosaic's default 16 MiB cap rejects fat planes
    # (zb = maxdz slabbing at 216²-class xy puts R past ~1100 rows for
    # the accum variant — measured 19.17M scoped at R = 1320). The v5e
    # TensorCore has far more physical VMEM, so raise the cap to the
    # kernel's measured footprint (~15.5 KB/row constant-accum +
    # ~1.1 KB/row per double-buffered coefficient slot), bounded well
    # under the hardware; ghost_grid_for's dispatch guard keeps R in a
    # range this covers.
    csl = int(cfields.shape[1]) if variable else 0
    vlim = max(16 * 2 ** 20,
               min(VMEM_CAP_BYTES, int(R * row_budget_bytes(csl))))
    out = pl.pallas_call(
        functools.partial(kern, **kw),
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        input_output_aliases=alias,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vlim),
        interpret=interpret,
    )(*operands)
    if accum:
        Yg, Zn, parts, Wn = out
    else:
        Yg, Zn, parts = out
        Wn = None
    ypy = jnp.sum(parts[:, 0])
    yzy = jnp.sum(parts[:, 1])
    if accum:
        return Yg, Zn, ypy, yzy, Wn
    return Yg, Zn, ypy, yzy


_SEVEN_POINT = ((0, 0, 0), (0, 0, 1), (0, 0, -1), (0, 1, 0), (0, -1, 0),
                (1, 0, 0), (-1, 0, 0))
# 2-D 5-point offsets lifted to the 7-point slot order (cz± slots unused:
# the d2 kernel replaces the cross-plane couplings with masked boundary
# shifts riding cy±)
_FIVE_POINT = ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0))


def _stencil_coeffs_static(op, hermitian: bool = True) -> tuple:
    """Static ((dz, dy, dx), coeff) pairs from a constant-coefficient
    StencilOperator — any box stencil: nearest-neighbour Laplacians,
    compact 9/27-point HOC, wide 4th-order (13-point, |o| = 2) AND
    6th-/8th-order FD stars (|o| = 3, 4, …), one shift-multiply-add per
    nonzero coupling. A slab-axis offset of |d| reads d masked boundary
    layers of the ring neighbours and needs L ≥ d layers per slab; |dy|
    > 2 needs extra zero pad rows per layer; |dx| > 1 needs that many
    pad lanes (``ghost_grid_for`` arranges all three from the offsets;
    ``fused_lanczos_step`` validates against the grid it is given —
    only an xy plane too large for |dz| layers under the VMEM budget
    falls back to the XLA scan path).
    ``hermitian=True`` (the Lanczos-path consumers) additionally
    requires a symmetric stencil; the polynomial recurrences
    (Chebyshev/Newton/Faber applies) pass ``False`` and run asymmetric
    stencils (advection–diffusion) through the same sweep."""
    from ..stencil import StencilOperator

    if not isinstance(op, StencilOperator) \
            or len(op.grid_shape) not in (2, 3):
        raise ValueError("fused sweep requires a 2-D or 3-D "
                         "StencilOperator")
    cmap = {off: float(c) for off, c in
            zip(op.offsets, np.asarray(op.coeffs))}
    if hermitian and any(
            cmap.get(off, 0.0) != cmap.get(tuple(-o for o in off), 0.0)
            for off in cmap):
        raise ValueError("fused Lanczos requires a symmetric stencil")
    if len(op.grid_shape) == 2:
        return tuple(((0,) + off, c) for off, c in sorted(cmap.items()))
    return tuple((off, c) for off, c in sorted(cmap.items()))


def _fused_dispatch(op, hermitian: bool = True):
    """(coeffs_static, cfields_builder) for a supported operator.

    StencilOperator (constant box stencil; symmetric when ``hermitian``)
    → (((dz, dy, dx), coeff) pairs, None); VariableStencilOperator (ANY
    box stencil — the coupling geometry is the same generalized sweep
    as the constant path, the coefficient VALUES stream as per-cell
    planes) → (((dz, dy, dx), slot) pairs, builder) where builder(gg,
    dt) packs the (nz, C, R, 128) coefficient-plane stream in the
    operator's offset order.
    """
    from ..stencil import VariableStencilOperator

    if isinstance(op, VariableStencilOperator):
        if len(op.grid_shape) not in (2, 3):
            raise ValueError("fused sweep requires a 2-D or 3-D grid")
        if hermitian and not op.is_hermitian:
            raise ValueError("fused Lanczos (a Lanczos recurrence) "
                             "requires a Hermitian operator")
        ghost_grid_for(op)      # raises when the C-plane stream or the
        #                         |slab-offset| layers overflow VMEM
        offs3 = tuple(off if len(off) == 3 else (0,) + off
                      for off in op.offsets)
        pairs = tuple((off, k) for k, off in enumerate(offs3))

        def builder(gg: GhostGrid, dt):
            # The packed (nz, C, R, 128) stream is ~C full-grid passes
            # (~450 MB of traffic at 216³ f32, C = 8); cache it on the
            # operator instance so repeated fused calls (two-pass expv
            # runs two) pay it once. Never cache tracers: when the
            # operator rides as a jit argument the build is part of the
            # traced program.
            key = (gg, jnp.dtype(dt).name)
            cached = getattr(op, "_ghost_planes_cache", None)
            # identity check on the source array: a reassigned
            # op.coeff_fields must not serve stale planes (the strong
            # ref also pins the id against reuse after GC)
            if (cached is not None and cached[0] == key
                    and cached[2] is op.coeff_fields):
                return cached[1]
            planes = [gg.to_ghost(op.coeff_fields[k].astype(dt))
                      for k in range(len(op.offsets))]
            stacked = jnp.stack(planes, axis=1)     # (nz, C, R, 128)
            if not isinstance(stacked, jax.core.Tracer):
                op._ghost_planes_cache = (key, stacked, op.coeff_fields)
            return stacked

        return pairs, builder
    cs = _stencil_coeffs_static(op, hermitian=hermitian)
    # Feasibility must be decided HERE, not at apply time: the
    # auto-dispatch gates (_fused_poly_ok, _fused_two_pass_supported,
    # chebyshev's _fused_ok) probe this function inside try/except and
    # fall back to the XLA scan path on ValueError — a late raise in
    # fused_lanczos_step would crash auto mode instead. Pad lanes / pad
    # rows are always arrangeable (ghost_grid_for sizes xpad/ypad from
    # the offsets, at worst one extra 128-lane piece per row); the only
    # genuine infeasibility is a grid whose layers overflow the
    # scoped-VMEM budget in EVERY sweep orientation (_plan_3d) — a
    # giant-xy plane used to be a latent apply-time VMEM fault even at
    # |o| ≤ 1, so probe unconditionally.
    if len(op.grid_shape) == 3:
        ghost_grid_for(op)      # raises when no orientation fits VMEM
    return cs, None


def lanczos_coeffs_fused(op, b, m: int, *, tol: float = 1e-7,
                         interpret: bool = False):
    """Drop-in twin of ``ops.krylov.lanczos_coeffs`` for symmetric
    2-D/3-D box ``StencilOperator``s (constant coefficients, ~5n HBM
    traffic per iteration) and Hermitian ``VariableStencilOperator``s
    (per-cell coefficient fields streamed as planes, ~(5+C)n) via
    ``fused_lanczos_step``.
    """
    coeffs_static, cbuilder = _fused_dispatch(op)
    gg = ghost_grid_for(op)
    b = jnp.asarray(b)
    dt = b.dtype
    mask = jnp.asarray(gg.xmask())
    cfields = cbuilder(gg, dt) if cbuilder is not None else None

    beta0 = jnp.linalg.norm(b)
    v0 = jnp.where(beta0 > 0, b / jnp.where(beta0 > 0, beta0, 1), 0.0)
    V0g = gg.to_ghost(v0)

    step = functools.partial(fused_lanczos_step, grid_desc=gg,
                             coeffs_static=coeffs_static, cfields=cfields,
                             interpret=interpret)

    # Iteration 0: (1,0,0) sweep emits y = v0, Z̃ = A v0, moments.
    zeros = jnp.zeros_like(V0g)
    Y, Z, ypy, yzy = step(V0g, zeros, zeros, (1.0, 0.0, 0.0), mask)

    def body(carry, _):
        Y, Z, Yprev, ypy, yzy, beta_prev, broke, m_used, j = carry
        beta = jnp.sqrt(jnp.maximum(ypy, 0.0))
        alpha = jnp.where(ypy > 0, yzy / jnp.maximum(ypy, 1e-300), 0.0)
        now_broke = beta < tol
        active = jnp.logical_not(broke)
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        safe_bp = jnp.where(beta_prev > 0, beta_prev, 1.0)
        ca = jnp.where(active & ~now_broke, 1.0 / safe_beta, 0.0)
        cb = -alpha * ca
        cc = jnp.where(active & ~now_broke, -beta / safe_bp, 0.0)
        Yn, Zn, ypy_n, yzy_n = step(Z, Y, Yprev,
                                    jnp.stack([ca, cb, cc]), mask)
        m_used_n = jnp.where(active, j + 1, m_used)
        out_alpha = jnp.where(active, alpha, 0.0)
        # β reported at position j is the NEXT off-diagonal ‖y_{j+1}‖
        beta_next = jnp.sqrt(jnp.maximum(ypy_n, 0.0))
        out_beta = jnp.where(active & ~now_broke, beta_next, 0.0)
        carry = (Yn, Zn, Y, ypy_n, yzy_n, beta,
                 broke | now_broke, m_used_n, j + 1)
        return carry, (out_alpha, out_beta)

    init = (Y, Z, jnp.zeros_like(Y), ypy, yzy,
            jnp.asarray(1.0, dt), jnp.asarray(beta0 == 0),
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    (_, _, _, _, _, _, broke, m_used, _), (alphas, betas) = lax.scan(
        body, init, None, length=m)
    m_used = jnp.where(beta0 == 0, 0, m_used).astype(jnp.int32)
    return alphas, betas, beta0.astype(jnp.result_type(dt, jnp.float32)), \
        m_used, broke


def lanczos_replay_fused(op, b, coeffs, *, tol: float = 1e-7,
                         interpret: bool = False):
    """Replay twin: w = Σ_j coeffs[j]·v_j regenerating the basis with the
    SAME fused sweeps (7n traffic each — the extra 2n is the aliased
    in-place accumulator). ``coeffs`` has length m. Numerically identical
    recurrence to ``lanczos_coeffs_fused`` (bitwise same kernel)."""
    coeffs_static, cbuilder = _fused_dispatch(op)
    gg = ghost_grid_for(op)
    b = jnp.asarray(b)
    dt = b.dtype
    mask = jnp.asarray(gg.xmask())
    m = coeffs.shape[0]
    cfields = cbuilder(gg, dt) if cbuilder is not None else None

    beta0 = jnp.linalg.norm(b)
    v0 = jnp.where(beta0 > 0, b / jnp.where(beta0 > 0, beta0, 1), 0.0)
    V0g = gg.to_ghost(v0)

    step = functools.partial(fused_lanczos_step, grid_desc=gg,
                             coeffs_static=coeffs_static, cfields=cfields,
                             interpret=interpret)

    W0 = jnp.zeros_like(V0g)
    # Sweep 0: y = v0 (ca = 1 on Z = v0); nothing to accumulate yet.
    Y, Z, ypy, yzy, W = step(V0g, V0g, jnp.zeros_like(V0g),
                             jnp.stack([jnp.asarray(1.0, dt),
                                        jnp.asarray(0.0, dt),
                                        jnp.asarray(0.0, dt),
                                        jnp.asarray(0.0, dt)]),
                             mask, w_accum=W0)

    def body(carry, cj):
        # Sweep k accumulates cj·v_{k-1} from its Vc INPUT plane
        # (Vc = Ỹ_{k-2} with ‖Vc‖ = β_{k-1}·…; Vc/beta = v_{k-1}),
        # while producing Ỹ_{k-1} for the next step — m+1 sweeps total.
        Y, Z, Yprev, ypy, yzy, beta_prev, broke, W = carry
        beta = jnp.sqrt(jnp.maximum(ypy, 0.0))
        alpha = jnp.where(ypy > 0, yzy / jnp.maximum(ypy, 1e-300), 0.0)
        now_broke = beta < tol
        active = jnp.logical_not(broke)
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        safe_bp = jnp.where(beta_prev > 0, beta_prev, 1.0)
        ca = jnp.where(active & ~now_broke, 1.0 / safe_beta, 0.0)
        cb = -alpha * ca
        cc = jnp.where(active & ~now_broke, -beta / safe_bp, 0.0)
        cw = jnp.where(active, cj / safe_beta, 0.0)
        Yn, Zn, ypy_n, yzy_n, Wn = step(
            Z, Y, Yprev, jnp.stack([ca, cb, cc, cw.astype(dt)]), mask,
            w_accum=W)
        return (Yn, Zn, Y, ypy_n, yzy_n, beta, broke | now_broke, Wn), None

    init = (Y, Z, jnp.zeros_like(Y), ypy, yzy, jnp.asarray(1.0, dt),
            jnp.asarray(beta0 == 0), W)
    (Y, Z, _, _, _, _, _, W), _ = lax.scan(body, init, coeffs.astype(dt))
    return gg.from_ghost(W)


def stencil_matvec_fused(op, x, *, interpret: bool = False):
    """Plane-pipelined Pallas stencil matvec: ``A @ x`` for a 2-D/3-D
    box Stencil/VariableStencil operator via one fused sweep (the (1,0,0)-coefficient
    Lanczos sweep emits y = x and Zn = A·x). Traffic: read x planes once,
    write A·x planes once (+ the pass-through y write) — an alternative
    to the XLA pad+slice matvec with fully explicit DMA pipelining."""
    coeffs_static, cbuilder = _fused_dispatch(op, hermitian=False)
    gg = ghost_grid_for(op)
    x = jnp.asarray(x)
    mask = jnp.asarray(gg.xmask())
    cfields = cbuilder(gg, x.dtype) if cbuilder is not None else None
    Xg = gg.to_ghost(x)
    zeros = jnp.zeros_like(Xg)
    _, Zn, _, _ = fused_lanczos_step(
        Xg, zeros, zeros, (1.0, 0.0, 0.0), mask, grid_desc=gg,
        coeffs_static=coeffs_static, cfields=cfields, interpret=interpret)
    return gg.from_ghost(Zn)


def recurrence_apply_fused(op, b, rows, *, interpret: bool = False):
    """Generic fused POLYNOMIAL recurrence — the non-Hermitian twin of the
    Chebyshev fused apply (models/chebyshev._chebyshev_apply_fused), one
    sweep per degree, ~5n traffic (constant stencil) / ~12n (per-cell
    fields), NO reductions:

        ω_{k+1} = ca_k·(A·ω_k) + cb_k·ω_k + cc_k·ω_{k−1},
        w      += cw_k·ω_k,              k = 0 … m−1,  ω_0 = b,

    with ``rows`` the (m, 4) per-step scalars (ca, cb, cc, cw) as traced
    data — ONE compiled program serves every coefficient table of a given
    length. This is exactly the execution shape of

      * the Leja Newton form  ω_{k+1} = (Â − ξ_k)ω_k
        (rows = [1/s, −c/s − ξ_k, 0, d_k]; models/leja.py),
      * the Faber three-term form  g_{k+1} = Â·g_k − ρ·g_{k−1}
        (rows = [1/γ, −c/γ, −ρ (−2ρ at k=1), a_k]; models/faber.py),

    and — because the asymmetric per-direction constants ride the same
    kernel — it runs ADVECTION–DIFFUSION class stencils, the
    domain the Lanczos-only fused path had to exclude (round-2 STATUS
    known-gap; reference non-Hermitian workhorse: src/arnoldi.jl:285-364).
    """
    coeffs_static, cbuilder = _fused_dispatch(op, hermitian=False)
    gg = ghost_grid_for(op)
    b = jnp.asarray(b)
    dt = b.dtype
    mask = jnp.asarray(gg.xmask())
    cfields = cbuilder(gg, dt) if cbuilder is not None else None
    step = functools.partial(fused_lanczos_step, grid_desc=gg,
                             coeffs_static=coeffs_static, cfields=cfields,
                             interpret=interpret)
    rows = jnp.asarray(rows, dt)

    Bg = gg.to_ghost(b)
    zeros = jnp.zeros_like(Bg)
    # Sweep 0 emits ω_0 = b and Z = A·ω_0 (no accumulation yet).
    Y, Z, _, _, W = step(Bg, Bg, zeros,
                         jnp.asarray([1.0, 0.0, 0.0, 0.0], dt),
                         mask, w_accum=zeros)

    def body(carry, row):
        # Sweep k: accumulate cw_k·ω_k from the Vc input while emitting
        # ω_{k+1} = ca_k·(A ω_k) + cb_k·ω_k + cc_k·ω_{k−1}.
        Y, Z, Yprev, W = carry
        Yn, Zn, _, _, Wn = step(Z, Y, Yprev, row, mask, w_accum=W)
        return (Yn, Zn, Y, Wn), None

    (_, _, _, W), _ = lax.scan(body, (Y, Z, zeros, W), rows)
    return gg.from_ghost(W)
