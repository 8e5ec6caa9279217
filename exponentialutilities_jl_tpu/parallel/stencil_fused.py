"""Shard-local FUSED plane sweeps: the flagship Pallas kernel under shard_map.

Closes SURVEY §5's distributed directive (overlap/fuse the halo exchange
with the local stencil compute) for the recurrence actions: the
row-partitioned stencil paths used to run the plain XLA pad/slice matvec
per shard (parallel/stencil.py — 2–3× slower per chip than the fused
sweep by the repo's own measurements). Here each shard runs the SAME
~5n-traffic sliding-plane Pallas sweep as the single-device flagship
(ops/kernels/lanczos_fused.py), and the cross-shard coupling is reduced
to its true size: 2·h0 grid LAYERS each way per sweep.

Mechanics (3-D grid sharded on axis 0, identity orientation):

* each shard owns an EXTENDED local grid of sz + 2·h0 layers — h0 halo
  layers at each end live at the positions the sweep's ring already
  reads, so the kernel needs no modification and no per-step concat of
  the local slab (the r4 complaint): state stays ghost-resident across
  the whole recurrence, and the refresh writes ONLY the halo layers
  (``dynamic_update_slice`` on freshly-produced arrays — XLA performs
  it in place; the interior planes are never copied or repacked).
* after each sweep, the halo layers of the produced ω (Y) and A·ω (Z)
  arrays are exchanged with the ring neighbours via ``lax.ppermute``
  (missing neighbours contribute zeros = the global Dirichlet
  truncation). The elementwise recurrence combination is then correct
  on halo layers too, so the NEXT sweep's stencil reads correct values
  at the shard boundary.
* cost model: the exchange moves 4·h0·ny·nx values per sweep against
  the sweep's ~5·sz·ny·nx HBM traffic — below 1% for production slabs
  (h0 = 1, sz ≥ 64), riding ICI while XLA's async collective-permute
  scheduling overlaps it with the surrounding halo-moment/update ops.
  The halo layers are also recomputed by every shard (2·h0 of sz+2·h0
  layers) — the classic ghost-cell trade of bandwidth for latency.
* Lanczos moments: the kernel's Σy² / Σy·Ay partials cover the extended
  grid, so halo layers would be double-counted across shards; the
  PRE-refresh outputs provide exactly the terms to subtract before the
  one ``psum`` per iteration (the same collective count as the XLA
  sharded Lanczos).

Supported: 3-D constant-coefficient box ``StencilOperator``s whose
extended local layers fit the plane budget (callers fall back to the
XLA scan path otherwise). Reference context: the reference is
single-process (SURVEY §2); this layer is pure north-star territory.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.kernels.lanczos_fused import (GhostGrid, _stencil_coeffs_static,
                                         fused_lanczos_step)
from ..ops.stencil import StencilOperator

__all__ = ["fused_shard_plan", "FusedShardPlan"]

_LANES = 128


class FusedShardPlan:
    """Static per-shard plan: extended-grid ghost layout + halo geometry.

    Hashable/static; built once per (operator grid, mesh size) by
    ``fused_shard_plan``. All methods are trace-time helpers used inside
    ``shard_map``.
    """

    def __init__(self, gs, offsets, coeffs_static, nshards: int,
                 axis_name: str, _plane_check: bool = True):
        nz, ny, nx = (int(s) for s in gs)
        self.nshards = int(nshards)
        self.axis_name = axis_name
        if nz % self.nshards:
            raise ValueError(f"grid axis 0 ({nz}) must divide evenly over "
                             f"{self.nshards} shards")
        self.sz = nz // self.nshards
        self.h0 = max((abs(o[0]) for o in offsets), default=0)
        if self.h0 > self.sz:
            raise ValueError(f"axis-0 halo {self.h0} exceeds local slab "
                             f"depth {self.sz}")
        self.sze = self.sz + 2 * self.h0
        mo = [max((abs(o[a]) for o in offsets), default=0) for a in range(3)]
        xpad, ypad = max(1, mo[2]), max(2, mo[1])
        P = -(-(nx + xpad) // _LANES)
        S = -(-((ny + ypad) * P) // 8) * 8
        zmin = max(1, mo[0])
        if _plane_check and zmin * S > 2900:
            raise ValueError(
                "fused sharded sweep: the stencil's slab layers overflow "
                f"the scoped-VMEM plane budget at grid {tuple(gs)} — "
                "falling back to the XLA scan path")
        zb = max(zmin, max(1, 1100 // S))
        self.gg = GhostGrid(self.sze, ny, nx, zb=zb, ypad=ypad, xpad=xpad)
        self.coeffs_static = coeffs_static
        self.ny, self.nx = ny, nx

    def _key(self):
        return (self.sz, self.h0, self.nshards, self.axis_name,
                self.gg, self.coeffs_static)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return (type(other) is type(self) and self._key() == other._key())

    # -- layout helpers (trace-time, inside shard_map) ------------------

    def to_ghost_local(self, b_local):
        """(sz·ny·nx,) local shard → extended ghost planes with ZERO
        halo layers (callers refresh them)."""
        X = b_local.reshape(self.sz, self.ny, self.nx)
        Xe = jnp.pad(X, ((self.h0, self.h0), (0, 0), (0, 0)))
        return self.gg.to_ghost(Xe.reshape(-1))

    def from_ghost_local(self, Wg):
        """Extended ghost planes → (sz·ny·nx,) interior of this shard."""
        w = self.gg.from_ghost(Wg).reshape(self.sze, self.ny, self.nx)
        return w[self.h0:self.h0 + self.sz].reshape(-1)

    def _layers(self, Xg):
        """(nslabs, R, 128) ghost array viewed as (nlayers, _lr, 128)."""
        return Xg.reshape(-1, self.gg._lr, _LANES)

    def refresh(self, Xg):
        """Overwrite the halo layers with the ring neighbours' boundary
        interior layers (zeros at the global ends — Dirichlet)."""
        h0, sz = self.h0, self.sz
        if h0 == 0:
            return Xg
        L = self._layers(Xg)
        if self.nshards > 1:
            ax = self.axis_name
            # bottom halo [0, h0) ← previous shard's top interior
            up = lax.ppermute(L[sz:sz + h0], ax,
                              [(i, i + 1) for i in range(self.nshards - 1)])
            # top halo [sz+h0, sze) ← next shard's bottom interior
            dn = lax.ppermute(L[h0:2 * h0], ax,
                              [(i + 1, i) for i in range(self.nshards - 1)])
        else:
            up = jnp.zeros_like(L[:h0])
            dn = jnp.zeros_like(L[:h0])
        L = lax.dynamic_update_slice_in_dim(L, up, 0, axis=0)
        L = lax.dynamic_update_slice_in_dim(L, dn, sz + h0, axis=0)
        return L.reshape(Xg.shape)

    def halo_moments(self, Yg, Zg):
        """(Σy², Σy·z) over the halo layers of the PRE-refresh outputs —
        exactly the kernel's double-counted moment contributions."""
        h0, sz = self.h0, self.sz
        if h0 == 0:
            z = jnp.zeros((), Yg.dtype)
            return z, z
        LY, LZ = self._layers(Yg), self._layers(Zg)
        lo_y, lo_z = LY[:h0], LZ[:h0]
        hi_y = lax.dynamic_slice_in_dim(LY, sz + h0, h0, axis=0)
        hi_z = lax.dynamic_slice_in_dim(LZ, sz + h0, h0, axis=0)
        ypy = jnp.sum(lo_y * lo_y) + jnp.sum(hi_y * hi_y)
        yzy = jnp.sum(lo_y * lo_z) + jnp.sum(hi_y * hi_z)
        return ypy, yzy

    def step(self, interpret: bool = False):
        """The fused sweep bound to this plan's layout; vma declares the
        kernel outputs varying over the shard axis (shard_map
        check_vma)."""
        return functools.partial(
            fused_lanczos_step, grid_desc=self.gg,
            coeffs_static=self.coeffs_static, cfields=None,
            interpret=interpret, vma=(self.axis_name,))

    def mask(self):
        return jnp.asarray(self.gg.xmask())


class FusedShardPlanVar(FusedShardPlan):
    """Variable-coefficient twin of :class:`FusedShardPlan` (3-D): the
    per-cell coefficient planes stream through the same sweep, and the
    cross-shard coefficient halos are exchanged ONCE per solve (the
    fields are static data — unlike ω/A·ω they never change between
    sweeps)."""

    def __init__(self, gs, offsets, nshards: int, axis_name: str):
        if len(gs) != 3:
            raise ValueError(
                "variable fused sharding supports 3-D grids only — for "
                "2-D VariableStencilOperator use the GSPMD route "
                "(parallel/gspmd.shard_operator)")
        offs3 = tuple(off if len(off) == 3 else (0,) + tuple(off)
                      for off in offsets)
        pairs = tuple((off, k) for k, off in enumerate(offs3))
        # feasibility: the variable sweep streams 2·C extra coefficient
        # plane buffers — the SHARED footprint model (lanczos_fused),
        # on the EXTENDED local grid; the base-class constant-plane
        # check is skipped (this one is stricter in the regime it
        # rejects, more permissive where the variable model allows it)
        from ..ops.kernels.lanczos_fused import (VMEM_CAP_BYTES,
                                                 row_budget_bytes)
        nz, ny, nx = (int(s) for s in gs)
        C = len(offs3)
        mo = [max((abs(o[a]) for o in offs3), default=0) for a in range(3)]
        P = -(-(nx + max(1, mo[2])) // _LANES)
        S = -(-((ny + max(2, mo[1])) * P) // 8) * 8
        zmin = max(1, mo[0])
        row_b = row_budget_bytes(C)
        if zmin * S * row_b > VMEM_CAP_BYTES:
            raise ValueError(
                "variable fused sharded sweep: the coefficient stream "
                "overflows the scoped-VMEM budget — falling back")
        super().__init__(gs, offs3, pairs, nshards, axis_name,
                         _plane_check=False)
        self.C = C
        # variable planes: keep zb at the VMEM-feasible sweet spot
        zb = max(zmin, min(VMEM_CAP_BYTES // (S * row_b),
                           max(1, 1100 // S)))
        self.gg = GhostGrid(self.sze, ny, nx, zb=zb,
                            ypad=max(2, mo[1]), xpad=max(1, mo[2]))

    def build_cfields_local(self, cf_local):
        """(C, sz·ny·nx) local coefficient fields → the extended
        (nslabs, C, R, 128) ghost stream with halo layers filled by ONE
        ppermute per field (coefficients are per-solve constants)."""
        planes = []
        for k in range(self.C):
            g = self.refresh(self.to_ghost_local(cf_local[k]))
            planes.append(g)
        return jnp.stack(planes, axis=1)

    def step(self, cfields, interpret: bool = False):
        return functools.partial(
            fused_lanczos_step, grid_desc=self.gg,
            coeffs_static=self.coeffs_static, cfields=cfields,
            interpret=interpret, vma=(self.axis_name,))


def recurrence_apply_fused_sharded_var(plan: FusedShardPlanVar, cf_local,
                                       b_local, rows,
                                       interpret: bool = False):
    """Shard-local fused recurrence for VARIABLE-coefficient stencils:
    same per-iteration structure as ``recurrence_apply_fused_sharded``,
    with the coefficient halo exchange hoisted to one ppermute pass per
    solve."""
    mask = plan.mask()
    b_local = jnp.asarray(b_local)
    dt = b_local.dtype
    rows = jnp.asarray(rows, dt)
    cfields = plan.build_cfields_local(jnp.asarray(cf_local, dt))
    step = plan.step(cfields, interpret=interpret)

    Bg = plan.refresh(plan.to_ghost_local(b_local))
    zeros = jnp.zeros_like(Bg)
    Y, Z, _, _, W = step(Bg, Bg, zeros,
                         jnp.asarray([1.0, 0.0, 0.0, 0.0], dt),
                         mask, w_accum=zeros)
    Z = plan.refresh(Z)

    def body(carry, row):
        Y, Z, Yp, W = carry
        Yn, Zn, _, _, Wn = step(Z, Y, Yp, row, mask, w_accum=W)
        Zn = plan.refresh(Zn)
        return (Yn, Zn, Y, Wn), None

    (_, _, _, W), _ = lax.scan(body, (Y, Z, zeros, W), rows)
    return plan.from_ghost_local(W)


class FusedShardPlan2D:
    """2-D twin of :class:`FusedShardPlan`: the grid (ny, nx) is sharded
    on y, and since a ``GhostGrid2D`` LAYER is one grid row, the halo is
    h0 = max|dy| layers each way — same refresh-the-layers pattern as
    the 3-D plan, with layer extraction addressed through the slab
    layout (layer l lives in slab l//ys at row offset B0 + (l%ys)·P)."""

    def __init__(self, gs, offsets, coeffs_static, nshards: int,
                 axis_name: str):
        ny, nx = (int(s) for s in gs)
        self.nshards = int(nshards)
        self.axis_name = axis_name
        if ny % self.nshards:
            raise ValueError(f"grid axis 0 ({ny}) must divide evenly "
                             f"over {self.nshards} shards")
        self.sy = ny // self.nshards
        self.h0 = max((abs(o[0]) for o in offsets), default=0)
        if self.h0 > self.sy:
            raise ValueError(f"axis-0 halo {self.h0} exceeds local "
                             f"shard depth {self.sy}")
        self.sye = self.sy + 2 * self.h0
        from ..ops.kernels.lanczos_fused import GhostGrid2D
        mo1 = max((abs(o[1]) for o in offsets), default=0)
        self.gg = GhostGrid2D(self.sye, nx, xpad=max(1, mo1))
        # lift 2-D offsets to the ((dz, dy, dx), c) pairs the kernel's
        # d2 mode expects (dz = 0)
        self.coeffs_static = tuple(((0,) + tuple(off), c)
                                   for off, c in coeffs_static)
        self.ny, self.nx = ny, nx

    def _key(self):
        return (self.sy, self.h0, self.nshards, self.axis_name, self.gg,
                self.coeffs_static)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return type(other) is type(self) and self._key() == other._key()

    def to_ghost_local(self, b_local):
        X = b_local.reshape(self.sy, self.nx)
        Xe = jnp.pad(X, ((self.h0, self.h0), (0, 0)))
        return self.gg.to_ghost(Xe.reshape(-1))

    def from_ghost_local(self, Wg):
        w = self.gg.from_ghost(Wg).reshape(self.sye, self.nx)
        return w[self.h0:self.h0 + self.sy].reshape(-1)

    def _layer_pos(self, l: int):
        s, o = divmod(l, self.gg.ys)
        return s, self.gg.B0 + o * self.gg.P

    def _get_layer(self, Xg, l: int):
        s, r = self._layer_pos(l)
        return lax.dynamic_slice_in_dim(Xg[s], r, self.gg.P, axis=0)

    def _set_layer(self, Xg, l: int, rows):
        s, r = self._layer_pos(l)
        slab = lax.dynamic_update_slice_in_dim(Xg[s], rows, r, axis=0)
        return lax.dynamic_update_slice_in_dim(Xg, slab[None], s, axis=0)

    def refresh(self, Xg):
        h0, sy = self.h0, self.sy
        if h0 == 0:
            return Xg
        for k in range(h0):
            if self.nshards > 1:
                ax = self.axis_name
                pairs_up = [(i, i + 1) for i in range(self.nshards - 1)]
                pairs_dn = [(i + 1, i) for i in range(self.nshards - 1)]
                up = lax.ppermute(self._get_layer(Xg, sy + k), ax,
                                  pairs_up)
                dn = lax.ppermute(self._get_layer(Xg, h0 + k), ax,
                                  pairs_dn)
            else:
                up = jnp.zeros((self.gg.P, _LANES), Xg.dtype)
                dn = up
            Xg = self._set_layer(Xg, k, up)
            Xg = self._set_layer(Xg, sy + h0 + k, dn)
        return Xg

    def halo_moments(self, Yg, Zg):
        h0, sy = self.h0, self.sy
        if h0 == 0:
            z = jnp.zeros((), Yg.dtype)
            return z, z
        ypy = yzy = jnp.zeros((), Yg.dtype)
        for k in list(range(h0)) + [sy + h0 + k2 for k2 in range(h0)]:
            y = self._get_layer(Yg, k)
            z = self._get_layer(Zg, k)
            ypy = ypy + jnp.sum(y * y)
            yzy = yzy + jnp.sum(y * z)
        return ypy, yzy

    def step(self, interpret: bool = False):
        return functools.partial(
            fused_lanczos_step, grid_desc=self.gg,
            coeffs_static=self.coeffs_static, cfields=None,
            interpret=interpret, vma=(self.axis_name,))

    def mask(self):
        return jnp.asarray(self.gg.xmask())


def fused_shard_plan(op, mesh, axis_name: str | None = None,
                     hermitian: bool = False):
    """Plan the shard-local fused sweep for a 2-D/3-D constant
    ``StencilOperator`` row-partitioned on grid axis 0 over ``mesh``.
    Raises ValueError when unsupported (callers fall back to the XLA
    scan path)."""
    if not isinstance(op, StencilOperator) \
            or len(op.grid_shape) not in (2, 3):
        raise ValueError("fused sharded sweep requires a 2-D/3-D "
                         "constant StencilOperator")
    axis = axis_name or mesh.axis_names[0]
    cs = _stencil_coeffs_static(op, hermitian=hermitian)
    if len(op.grid_shape) == 2:
        cs2 = tuple((off[1:] if len(off) == 3 else off, c)
                    for off, c in cs)
        return FusedShardPlan2D(op.grid_shape, tuple(op.offsets), cs2,
                                mesh.shape[axis], axis)
    return FusedShardPlan(op.grid_shape, tuple(op.offsets), cs,
                          mesh.shape[axis], axis)


def recurrence_apply_fused_sharded(plan: FusedShardPlan, b_local, rows,
                                   interpret: bool = False):
    """Shard-local fused polynomial recurrence (module doc) — the
    distributed twin of ``recurrence_apply_fused``:

        ω_{k+1} = ca_k·(A·ω_k) + cb_k·ω_k + cc_k·ω_{k−1},
        w      += cw_k·ω_k,          ω_0 = b,

    with ``rows`` (m, 4) per-step scalars as traced data. Runs INSIDE
    shard_map over ``plan.axis_name``; per iteration: one fused sweep +
    one halo ppermute each for ω and A·ω. Returns the local interior w.
    """
    step = plan.step(interpret)
    mask = plan.mask()
    b_local = jnp.asarray(b_local)
    dt = b_local.dtype
    rows = jnp.asarray(rows, dt)

    Bg = plan.refresh(plan.to_ghost_local(b_local))
    zeros = jnp.zeros_like(Bg)
    # Sweep 0 emits ω_0 = Bg (halos already correct) and Z = A·ω_0
    # (halo layers garbage → refreshed).
    Y, Z, _, _, W = step(Bg, Bg, zeros,
                         jnp.asarray([1.0, 0.0, 0.0, 0.0], dt),
                         mask, w_accum=zeros)
    Z = plan.refresh(Z)

    def body(carry, row):
        Y, Z, Yp, W = carry
        Yn, Zn, _, _, Wn = step(Z, Y, Yp, row, mask, w_accum=W)
        # ω halo = elementwise combo of refreshed inputs — already
        # correct; A·ω halo layers read past the extended grid → refresh
        Zn = plan.refresh(Zn)
        return (Yn, Zn, Y, Wn), None

    (_, _, _, W), _ = lax.scan(body, (Y, Z, zeros, W), rows)
    return plan.from_ghost_local(W)


# shared row builder (re-export: the sharded callers import it here)
from ..ops.kernels.dispatch import chebyshev_rows  # noqa: E402


def lanczos_coeffs_fused_sharded(plan: FusedShardPlan, b_local, m: int,
                                 *, tol: float = 1e-7,
                                 interpret: bool = False):
    """Shard-local fused Lanczos pass 1 — the distributed twin of
    ``lanczos_coeffs_fused``. One fused sweep + one moment ``psum`` +
    one halo ppermute pair per iteration (the same collective count as
    the XLA sharded Lanczos body). The kernel's extended-grid moments
    are corrected by the pre-refresh halo contributions
    (``plan.halo_moments``) so every (α, β) matches the global
    recurrence exactly. Returns (alphas, betas, beta0, m_used, broke) —
    replicated scalars."""
    ax = plan.axis_name
    step = plan.step(interpret)
    mask = plan.mask()
    b_local = jnp.asarray(b_local)
    dt = b_local.dtype

    beta0 = jnp.sqrt(lax.psum(jnp.sum(b_local * b_local), ax))
    v0 = jnp.where(beta0 > 0, b_local / jnp.where(beta0 > 0, beta0, 1), 0.0)
    V0g = plan.refresh(plan.to_ghost_local(v0))
    zeros = jnp.zeros_like(V0g)

    def sweep(Zg, Yg, Ypg, coefs):
        # plain (no-accumulator) kernel — ~5n traffic per sweep
        Yn, Zn, ypy, yzy = step(Zg, Yg, Ypg, coefs, mask)
        hy, hz = plan.halo_moments(Yn, Zn)
        ypy = lax.psum(ypy - hy, ax)
        yzy = lax.psum(yzy - hz, ax)
        return Yn, plan.refresh(Zn), ypy, yzy

    Y, Z, ypy, yzy = sweep(V0g, V0g, zeros,
                           jnp.asarray([1.0, 0.0, 0.0], dt))

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
        Yn, Zn, ypy_n, yzy_n = sweep(Z, Y, Yprev,
                                     jnp.stack([ca, cb, cc]))
        m_used_n = jnp.where(active, j + 1, m_used)
        out_alpha = jnp.where(active, alpha, 0.0)
        beta_next = jnp.sqrt(jnp.maximum(ypy_n, 0.0))
        out_beta = jnp.where(active & ~now_broke, beta_next, 0.0)
        carry = (Yn, Zn, Y, ypy_n, yzy_n, beta,
                 broke | now_broke, m_used_n, j + 1)
        return carry, (out_alpha, out_beta)

    init = (Y, Z, zeros, ypy, yzy, jnp.asarray(1.0, dt),
            jnp.asarray(beta0 == 0), jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32))
    (_, _, _, _, _, _, broke, m_used, _), (alphas, betas) = lax.scan(
        body, init, None, length=m)
    m_used = jnp.where(beta0 == 0, 0, m_used).astype(jnp.int32)
    return alphas, betas, beta0.astype(jnp.result_type(dt, jnp.float32)), \
        m_used, broke


def lanczos_replay_fused_sharded(plan: FusedShardPlan, b_local, coeffs,
                                 *, tol: float = 1e-7,
                                 interpret: bool = False):
    """Shard-local fused Lanczos replay (pass 2): w = Σ_j coeffs[j]·v_j,
    regenerating the basis with the same sharded sweeps. The moments are
    re-derived (one ``psum``/step — bitwise the same recurrence as pass
    1, so the regenerated v_j match exactly); the in-place W accumulator
    rides the sweep (~7n traffic). Returns the local interior w."""
    ax = plan.axis_name
    step = plan.step(interpret)
    mask = plan.mask()
    b_local = jnp.asarray(b_local)
    dt = b_local.dtype
    m = coeffs.shape[0]

    beta0 = jnp.sqrt(lax.psum(jnp.sum(b_local * b_local), ax))
    v0 = jnp.where(beta0 > 0, b_local / jnp.where(beta0 > 0, beta0, 1), 0.0)
    V0g = plan.refresh(plan.to_ghost_local(v0))
    zeros = jnp.zeros_like(V0g)

    Y, Z, ypy, yzy, W = step(V0g, V0g, zeros,
                             jnp.asarray([1.0, 0.0, 0.0, 0.0], dt),
                             mask, w_accum=zeros)
    hy, hz = plan.halo_moments(Y, Z)
    ypy = lax.psum(ypy - hy, ax)
    yzy = lax.psum(yzy - hz, ax)
    Z = plan.refresh(Z)

    def body(carry, cj):
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
        hy, hz = plan.halo_moments(Yn, Zn)
        ypy_n = lax.psum(ypy_n - hy, ax)
        yzy_n = lax.psum(yzy_n - hz, ax)
        Zn = plan.refresh(Zn)
        return (Yn, Zn, Y, ypy_n, yzy_n, beta, broke | now_broke, Wn), None

    init = (Y, Z, zeros, ypy, yzy, jnp.asarray(1.0, dt),
            jnp.asarray(beta0 == 0), W)
    (_, _, _, _, _, _, _, W), _ = lax.scan(body, init, coeffs.astype(dt))
    return plan.from_ghost_local(W)
