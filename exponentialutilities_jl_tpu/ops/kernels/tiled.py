"""Row-tiled fused plane sweeps: giant-cube grids past the plane budget.

``_plan_3d`` re-orients the sweep for pancake grids, but a big CUBE
(≳ 600³) overflows the scoped-VMEM plane budget in EVERY orientation —
its xy layer alone exceeds ~2900 rows — and fell to the XLA scan path
(STATUS r4 gap; VERDICT r4 #6). This module lifts the ceiling by
tiling the ROW (y) axis: the grid is split into ``ky`` y-slabs, each a
perfectly ordinary ``GhostGrid`` whose layers fit the budget, and the
cross-tile coupling is reduced to its true size — ONE ghost grid row
per layer per direction per sweep:

* each tile's ghosted layout already reserves a zero ghost row above
  and below every layer (the Dirichlet rows); for an interior tile
  those rows are REFRESHED between sweeps with the neighbour tile's
  boundary rows (``dynamic_update_slice`` on row slices — the tile
  interiors are never copied). Global-boundary ghosts stay zero.
* per recurrence iteration each tile runs the standard fused sweep
  (one Pallas call, ~5n_t traffic); the produced A·ω needs its ghost
  rows refreshed (they read past the tile), while ω's ghosts are the
  elementwise combination of refreshed inputs and stay correct by
  induction — exactly the argument of the z-sharded sweeps
  (parallel/stencil_fused.py), applied to rows instead of layers.

Supported: 3-D constant-coefficient stencils with |dy| ≤ 1 in the
chosen orientation (the ghosted layout holds one ghost row above each
layer; 7/27-point boxes and all |dz|/|dx|-wide stars qualify). The
last tile may be partial — its mask zeroes the pad rows, and the
refresh skips its missing neighbour.

Reference context: none (the reference is single-process and has no
stencil engine); this is the continuation of SURVEY §7 phase 4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .lanczos_fused import (GhostGrid, _stencil_coeffs_static,
                            fused_lanczos_step)

__all__ = ["TiledPlan", "tiled_plan_for", "recurrence_apply_fused_tiled",
           "lanczos_coeffs_fused_tiled", "lanczos_replay_fused_tiled",
           "expv_two_pass_fused_tiled"]

_LANES = 128


class TiledPlan:
    """Static row-tiling plan: ``ky`` tiles of ``ny_t`` grid rows (the
    last holding ``ny_last``), each laid out by one shared GhostGrid."""

    def __init__(self, gs, offsets, coeffs_static, ky: int, perm):
        self.perm = tuple(perm)
        dims = tuple(gs[p] for p in self.perm)
        nz, ny, nx = dims
        self.ky = int(ky)
        self.ny_t = -(-ny // self.ky)
        self.ny_last = ny - (self.ky - 1) * self.ny_t
        if self.ny_last <= 0:
            raise ValueError(f"ky={ky} leaves an empty last tile of "
                             f"ny={ny}")
        mo = [max((abs(o[p]) for o in offsets), default=0)
              for p in self.perm]
        if mo[1] > 1:
            raise ValueError("row-tiled sweep supports |dy| <= 1 in the "
                             f"sweep orientation (got {mo[1]})")
        xpad = max(1, mo[2])
        zmin = max(1, mo[0])
        P = -(-(nx + xpad) // _LANES)
        S = -(-((self.ny_t + 2) * P) // 8) * 8
        if zmin * S > 2900:
            raise ValueError(
                f"row-tiled sweep: {zmin}×{S} rows/plane still exceeds "
                "the scoped-VMEM budget — raise ky")
        zb = max(zmin, max(1, 1100 // S))
        self.gg = GhostGrid(nz, self.ny_t, nx, zb=zb, xpad=xpad)
        self.coeffs_static = tuple(
            (tuple(off[p] for p in self.perm), c)
            for off, c in coeffs_static)
        self.nz, self.ny, self.nx = nz, ny, nx
        self.gs = tuple(gs)

    def _key(self):
        return (self.gs, self.perm, self.ky, self.gg, self.coeffs_static)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return type(other) is type(self) and self._key() == other._key()

    # -- layout ---------------------------------------------------------

    def to_tiles(self, x):
        """(n,) flat grid vector → list of ky ghost arrays."""
        if self.perm != (0, 1, 2):
            orig = [0, 0, 0]
            for i, ax in enumerate(self.perm):
                orig[ax] = (self.nz, self.ny, self.nx)[i]
            X = x.reshape(orig).transpose(self.perm)
        else:
            X = x.reshape(self.nz, self.ny, self.nx)
        pad_y = self.ky * self.ny_t - self.ny
        if pad_y:
            X = jnp.pad(X, ((0, 0), (0, pad_y), (0, 0)))
        tiles = []
        for t in range(self.ky):
            Xt = X[:, t * self.ny_t:(t + 1) * self.ny_t, :]
            tiles.append(self.gg.to_ghost(Xt.reshape(-1)))
        return tiles

    def from_tiles(self, tiles):
        parts = [self.gg.from_ghost(Tg).reshape(self.nz, self.ny_t,
                                                self.nx)
                 for Tg in tiles]
        X = jnp.concatenate(parts, axis=1)[:, :self.ny, :]
        if self.perm != (0, 1, 2):
            X = X.transpose(tuple(np.argsort(self.perm)))
        return X.reshape(-1)

    def _tile_mask(self, ny_real: int):
        """Like ``GhostGrid.xmask`` but with the GHOST rows marked VALID
        (lane pattern of a real row): the kernel's masked y-combination
        then computes the ghost-row values as the elementwise combo of
        the refreshed inputs — which IS the neighbour tile's boundary
        value (same scalars, same operands) — so the in-ring stencil
        reads correct cross-tile data without any kernel change. Global
        ends and the partial last tile's pad rows stay zero (their
        input ghosts are re-zeroed by ``refresh`` every iteration)."""
        gg = self.gg
        m = np.zeros((gg._lr, _LANES), np.float32)
        for piece in range(gg.P):
            lo = piece * _LANES
            hi = min(gg.nx, lo + _LANES)
            if hi > lo:
                for y in range(0, ny_real + 2):     # ghosts INCLUDED
                    m[y * gg.P + piece, :hi - lo] = 1.0
        return np.tile(m, (gg.zb, 1))

    def mask_for(self, t: int):
        ny_real = self.ny_last if t == self.ky - 1 else self.ny_t
        return jnp.asarray(self._tile_mask(ny_real))

    def refresh(self, tiles):
        """Fill each tile's ghost rows from the neighbour tiles'
        boundary rows (row slices per layer; global ends stay zero)."""
        P, lr = self.gg.P, self.gg._lr
        nyt = self.ny_t

        def layers(Tg):
            return Tg.reshape(-1, lr, _LANES)

        out = []
        for t in range(self.ky):
            L = layers(tiles[t])
            if t > 0:
                # top ghost rows [0:P] ← t−1's last real row
                prev = layers(tiles[t - 1])[:, nyt * P:(nyt + 1) * P, :]
                L = lax.dynamic_update_slice_in_dim(L, prev, 0, axis=1)
            else:
                L = lax.dynamic_update_slice_in_dim(
                    L, jnp.zeros_like(L[:, :P]), 0, axis=1)
            # bottom ghost sits after this tile's REAL rows (the partial
            # last tile's ghost is at (ny_last+1)·P, not (ny_t+1)·P)
            nyr = self.ny_last if t == self.ky - 1 else nyt
            bot = (nyr + 1) * P
            if t < self.ky - 1:
                # bottom ghost rows ← t+1's first real row
                nxt = layers(tiles[t + 1])[:, P:2 * P, :]
                L = lax.dynamic_update_slice_in_dim(L, nxt, bot, axis=1)
            else:
                L = lax.dynamic_update_slice_in_dim(
                    L, jnp.zeros_like(L[:, :P]), bot, axis=1)
            out.append(L.reshape(tiles[t].shape))
        return out


def tiled_plan_for(op, *, hermitian: bool = False) -> TiledPlan:
    """Plan a row-tiled sweep for a 3-D constant StencilOperator whose
    plane overflows the budget in every orientation. Prefers the
    orientation with |dy| ≤ 1 and the fewest tiles; raises ValueError
    when none qualifies (callers fall back to the XLA scan)."""
    from ..stencil import StencilOperator

    if not isinstance(op, StencilOperator) or len(op.grid_shape) != 3:
        raise ValueError("row-tiled sweep requires a 3-D constant "
                         "StencilOperator")
    cs = _stencil_coeffs_static(op, hermitian=hermitian)
    gs = op.grid_shape
    best = None
    for perm in ((0, 1, 2), (1, 0, 2), (2, 0, 1),
                 (0, 2, 1), (1, 2, 0), (2, 1, 0)):
        dims = tuple(gs[p] for p in perm)
        mo = [max((abs(o[p]) for o in op.offsets), default=0)
              for p in perm]
        if mo[1] > 1:
            continue
        xpad = max(1, mo[2])
        zmin = max(1, mo[0])
        P = -(-(dims[2] + xpad) // _LANES)
        # smallest ky whose tile layers fit the budget
        ky = None
        for k in range(2, dims[1] + 1):
            ny_t = -(-dims[1] // k)
            S = -(-((ny_t + 2) * P) // 8) * 8
            if zmin * S <= 2900:
                ky = k
                break
        if ky is None:
            continue
        # padded-cell ratio, then fewest tiles
        ny_t = -(-dims[1] // ky)
        key = (round(ky * ny_t * dims[0] * P * _LANES
                     / (gs[0] * gs[1] * gs[2]), 3), ky)
        if best is None or key < best[0]:
            best = (key, perm, ky)
    if best is None:
        raise ValueError(
            f"row-tiled sweep: no orientation of grid {tuple(gs)} has "
            "|dy| <= 1 with feasible tile layers — falling back to the "
            "XLA scan path")
    _, perm, ky = best
    return TiledPlan(gs, tuple(op.offsets), cs, ky, perm)


def _tile_ghost_moments(plan: TiledPlan, Yt, Zt):
    """(Σy², Σy·z) over every tile's GHOST rows on the PRE-refresh
    outputs — the tiled masks mark ghost rows valid (module doc), so
    the kernel's moment partials double-count them (interior tile
    boundaries duplicate the neighbour's real rows; global ends are
    zero). Subtracting these recovers the exact global moments."""
    P, lr = plan.gg.P, plan.gg._lr
    ypy = yzy = None
    for t in range(plan.ky):
        nyr = plan.ny_last if t == plan.ky - 1 else plan.ny_t
        LY = Yt[t].reshape(-1, lr, _LANES)
        LZ = Zt[t].reshape(-1, lr, _LANES)
        for lo in (0, (nyr + 1) * P):
            y = LY[:, lo:lo + P]
            z = LZ[:, lo:lo + P]
            a = jnp.sum(y * y)
            b_ = jnp.sum(y * z)
            ypy = a if ypy is None else ypy + a
            yzy = b_ if yzy is None else yzy + b_
    return ypy, yzy


def lanczos_coeffs_fused_tiled(op, b, m: int, *, plan: TiledPlan = None,
                               tol: float = 1e-7,
                               interpret: bool = False):
    """Row-tiled fused Lanczos pass 1 — (alphas, betas, beta0, m_used,
    broke), the giant-grid twin of ``lanczos_coeffs_fused``: ky sweeps
    + one ghost-row refresh + the ghost-moment correction per
    iteration."""
    if plan is None:
        plan = tiled_plan_for(op, hermitian=True)
    b = jnp.asarray(b)
    dt = b.dtype
    masks = [plan.mask_for(t) for t in range(plan.ky)]
    step = functools.partial(fused_lanczos_step, grid_desc=plan.gg,
                             coeffs_static=plan.coeffs_static,
                             cfields=None, interpret=interpret)

    beta0 = jnp.linalg.norm(b)
    v0 = jnp.where(beta0 > 0, b / jnp.where(beta0 > 0, beta0, 1), 0.0)
    V0 = plan.refresh(plan.to_tiles(v0))
    zeros = [jnp.zeros_like(T) for T in V0]

    def sweep(Zs, Ys, Yps, coefs):
        Yn, Zn = [], []
        ypy = yzy = jnp.zeros((), dt)
        for t in range(plan.ky):
            y, z, a, c = step(Zs[t], Ys[t], Yps[t], coefs, masks[t])
            Yn.append(y)
            Zn.append(z)
            ypy = ypy + a
            yzy = yzy + c
        ha, hc = _tile_ghost_moments(plan, Yn, Zn)
        return Yn, plan.refresh(Zn), ypy - ha, yzy - hc

    Y, Z, ypy, yzy = sweep(V0, V0, zeros, jnp.asarray([1.0, 0.0, 0.0], dt))

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


def lanczos_replay_fused_tiled(op, b, coeffs, *, plan: TiledPlan = None,
                               tol: float = 1e-7,
                               interpret: bool = False):
    """Row-tiled fused Lanczos replay (pass 2): w = Σ_j coeffs[j]·v_j
    with re-derived moments (bitwise the same recurrence as pass 1) and
    the in-place W accumulator riding each tile's sweep."""
    if plan is None:
        plan = tiled_plan_for(op, hermitian=True)
    b = jnp.asarray(b)
    dt = b.dtype
    masks = [plan.mask_for(t) for t in range(plan.ky)]
    step = functools.partial(fused_lanczos_step, grid_desc=plan.gg,
                             coeffs_static=plan.coeffs_static,
                             cfields=None, interpret=interpret)

    beta0 = jnp.linalg.norm(b)
    v0 = jnp.where(beta0 > 0, b / jnp.where(beta0 > 0, beta0, 1), 0.0)
    V0 = plan.refresh(plan.to_tiles(v0))
    zeros = [jnp.zeros_like(T) for T in V0]

    def sweep(Zs, Ys, Yps, coefs, Ws):
        Yn, Zn, Wn = [], [], []
        ypy = yzy = jnp.zeros((), dt)
        for t in range(plan.ky):
            y, z, a, c, w = step(Zs[t], Ys[t], Yps[t], coefs, masks[t],
                                 w_accum=Ws[t])
            Yn.append(y)
            Zn.append(z)
            Wn.append(w)
            ypy = ypy + a
            yzy = yzy + c
        ha, hc = _tile_ghost_moments(plan, Yn, Zn)
        return Yn, plan.refresh(Zn), ypy - ha, yzy - hc, Wn

    Y, Z, ypy, yzy, W = sweep(V0, V0, zeros,
                              jnp.asarray([1.0, 0.0, 0.0, 0.0], dt),
                              zeros)

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
        Yn, Zn, ypy_n, yzy_n, Wn = sweep(
            Z, Y, Yprev, jnp.stack([ca, cb, cc, cw.astype(dt)]), W)
        return (Yn, Zn, Y, ypy_n, yzy_n, beta, broke | now_broke,
                Wn), None

    init = (Y, Z, zeros, ypy, yzy, jnp.asarray(1.0, dt),
            jnp.asarray(beta0 == 0), W)
    (_, _, _, _, _, _, _, W), _ = lax.scan(body, init, coeffs.astype(dt))
    w = plan.from_tiles(W)
    return jnp.where(beta0 > 0, w, jnp.zeros_like(w))


def expv_two_pass_fused_tiled(op, b, t, m: int, *,
                              plan: TiledPlan = None, tol: float = 1e-7,
                              interpret: bool = False):
    """Storage-free Hermitian expv for GIANT grids: both Lanczos passes
    as row-tiled fused sweeps + the shared reduced-coefficient stage."""
    from ...models.expv import _lanczos_reduced_coeffs

    if plan is None:
        plan = tiled_plan_for(op, hermitian=True)
    b = jnp.asarray(b)
    t = jnp.asarray(t)
    alphas, betas, beta0, m_used, broke = lanczos_coeffs_fused_tiled(
        op, b, m, plan=plan, tol=tol, interpret=interpret)
    coeffs = _lanczos_reduced_coeffs(alphas, betas, beta0, t)
    return lanczos_replay_fused_tiled(op, b, coeffs, plan=plan, tol=tol,
                                      interpret=interpret)


def recurrence_apply_fused_tiled(op, b, rows, *, plan: TiledPlan = None,
                                 hermitian: bool = False,
                                 interpret: bool = False):
    """Row-tiled fused polynomial recurrence (module doc) — the
    giant-grid twin of ``recurrence_apply_fused``:

        ω_{k+1} = ca_k·(A·ω_k) + cb_k·ω_k + cc_k·ω_{k−1},
        w      += cw_k·ω_k,          ω_0 = b,

    ``rows`` (m, 4) traced per-step scalars. ky fused sweeps + one
    ghost-row refresh per iteration."""
    if plan is None:
        plan = tiled_plan_for(op, hermitian=hermitian)
    b = jnp.asarray(b)
    dt = b.dtype
    rows = jnp.asarray(rows, dt)
    masks = [plan.mask_for(t) for t in range(plan.ky)]
    step = functools.partial(fused_lanczos_step, grid_desc=plan.gg,
                             coeffs_static=plan.coeffs_static,
                             cfields=None, interpret=interpret)

    Bg = plan.refresh(plan.to_tiles(b))
    zeros = [jnp.zeros_like(T) for T in Bg]

    def sweep_all(Zs, Ys, Yps, coefs, Ws):
        Yn, Zn, Wn = [], [], []
        for t in range(plan.ky):
            y, z, _, _, w = step(Zs[t], Ys[t], Yps[t], coefs, masks[t],
                                 w_accum=Ws[t])
            Yn.append(y)
            Zn.append(z)
            Wn.append(w)
        return Yn, plan.refresh(Zn), Wn

    c0 = jnp.asarray([1.0, 0.0, 0.0, 0.0], dt)
    Y, Z, W = sweep_all(Bg, Bg, zeros, c0, zeros)

    def body(carry, row):
        Y, Z, Yp, W = carry
        Yn, Zn, Wn = sweep_all(Z, Y, Yp, row, W)
        return (Yn, Zn, Y, Wn), None

    (_, _, _, W), _ = lax.scan(body, (Y, Z, zeros, W), rows)
    return plan.from_tiles(W)
