"""SELL-window SpMV — vector-gather sparse kernel for unstructured matrices.

Round-1's ``blockell_spmv`` gathers x one 128-lane row-copy per 8×128 dense
block: great when blocks are dense, but an UNSTRUCTURED matrix (~10 nnz
scattered per row) makes the blocks nearly empty and the effective rate
collapses. This kernel removes both problems:

* **Value stream without block padding** — a SELL-style lane-major layout:
  rows are grouped in 128s (lane l of a tile = row l of the group); each
  group stores ``v = ceil(maxdeg/8)`` tiles of shape (8, 128), tile t's
  sublane s holding slot ``8·t+s`` of every row. Padded slots carry value
  0. The value/index streams are contiguous (T, 8, 128) arrays read at
  full HBM rate.
* **Gather at VPU vector rate** — each (8, 128) tile of 1024 x-elements is
  gathered with EIGHT ``tpu.dynamic_gather`` ops (exposed through
  ``jnp.take_along_axis`` on a (8, 128) table): the group's x-window
  (1024 contiguous elements, ONE DMA) is viewed as (8, 128); a local
  index decomposes as q·128+r, and the cross-sublane part is handled by
  8 sublane-rolls of the window, each followed by one lane-gather and a
  masked accumulate. ~35 VPU ops per 1024 slots ≈ 30 slots/cycle — two
  orders of magnitude over per-element gathers (XLA scalar-ELL measured
  ~1 GB/s in round 1).
* **Reduction with no scatter** — row-per-lane means the per-row sum is a
  plain sublane-axis reduction; output rows are written contiguously.

Constraint: each 128-row group's columns must fit one 1024-wide aligned
window (checked at pack time). After RCM this holds for bandwidth ≤ ~900;
wider matrices fall back to the k-chunk variant or block-ELL. SpMV role in
the reference: outsourced to SparseArrays (src/arnoldi.jl:182); this layer
is the BASELINE.json per-chip speed-of-light metric.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sell_pack", "sell_spmv", "sell_spmv_ref", "SellData"]

_W = 1024            # window width (elements); (8, 128) as a gather table
_LANES = 128
_SUB = 8


class SellData:
    """Packed SELL-window arrays (host-built, device-resident).

    vals:      (T, 8, 128) float values, 0 in padded slots.
    lidx:      (T, 8, 128) int32 window-local element indices (0 padded).
    group_ptr: (G + 1,) int32 tile offsets per 128-row group.
    win_row:   (G,) int32 window start as a 128-lane ROW index into
               x.reshape(-1, 128).
    n:         logical dimension. nnz: true nonzero count.
    """

    def __init__(self, vals, lidx, group_ptr, win_row, n, nnz,
                 win_rows=_SUB, residue=False):
        self.vals = vals
        self.lidx = lidx
        self.group_ptr = group_ptr
        self.win_row = win_row
        self.n = int(n)
        self.nnz = int(nnz)
        self.win_rows = int(win_rows)   # window size in 128-lane rows
        self.residue = bool(residue)    # sublane == window row (q) packing

    def tree_flatten(self):
        return ((self.vals, self.lidx, self.group_ptr, self.win_row),
                (self.n, self.nnz, self.win_rows, self.residue))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


jax.tree_util.register_pytree_node(
    SellData,
    lambda s: s.tree_flatten(),
    lambda aux, ch: SellData(*ch, *aux),
)


def sell_pack(rows_cols_vals, n: int, dtype=np.float32,
              window: int = 1024, residue: bool = False) -> SellData:
    """Pack COO (rows, cols, vals) into SELL-window form.

    ``window`` (multiple of 1024): per-group x-window width. Wider windows
    admit wider bands at proportionally more gather work per tile (the
    kernel runs one 8-step roll-gather pass per 1024-element half).
    ``residue=True`` (requires window=1024) places each nnz at the
    sublane equal to its window ROW q = local_idx // 128, so the kernel
    needs exactly ONE lane-gather per tile (no rolls/selects) — fastest
    when the extra padding it induces (v = max per-row per-q-class count)
    stays moderate.

    Raises ValueError if any 128-row group's columns exceed its aligned
    window — the caller should RCM-permute first (the packer does not
    reorder) or fall back to another container.
    """
    if window % _W:
        raise ValueError("window must be a multiple of 1024")
    if residue and window != _W:
        raise ValueError("residue packing requires window=1024")
    if not residue:
        # Native C++ single-pass packer (≈20× the numpy path at 80M nnz).
        try:
            import scipy.sparse as _sp
            from ...native import sell_pack_csr
            r, c, v = rows_cols_vals
            A = _sp.coo_matrix((np.asarray(v, dtype=dtype),
                                (np.asarray(r), np.asarray(c))),
                               shape=(n, n))
            nnz_true = len(np.asarray(v))
            packed = sell_pack_csr(A, window=window)
            if packed is not None:
                va, li, gp, wr = packed
                return SellData(jnp.asarray(va), jnp.asarray(li),
                                jnp.asarray(gp), jnp.asarray(wr),
                                n, nnz_true, win_rows=window // _LANES)
        except ImportError:
            pass
    rows, cols, vals = rows_cols_vals
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals, dtype=dtype)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]

    G = -(-n // _LANES)
    n_pad = G * _LANES
    counts = np.bincount(rows, minlength=n_pad)
    row_start = np.concatenate([[0], np.cumsum(counts)])

    # Per-group column window (vectorized over groups via reduceat on the
    # row-sorted column stream; empty groups get window 0). reduceat runs
    # over the NONEMPTY groups' start offsets only — their segments end at
    # the next nonempty start, which is exactly the group boundary since
    # empty groups contribute no elements.
    gb = row_start[np.arange(G) * _LANES]          # group nnz boundaries
    nonempty = np.diff(np.concatenate([gb, [len(cols)]])) > 0
    cmin = np.zeros(G, np.int64)
    cmax = np.zeros(G, np.int64)
    ne = np.flatnonzero(nonempty)
    if len(ne):
        cmin[ne] = np.minimum.reduceat(cols, gb[ne])
        cmax[ne] = np.maximum.reduceat(cols, gb[ne])
    ws = (cmin // _LANES) * _LANES
    bad = cmax >= ws + window
    if np.any(bad):
        g = int(np.argmax(bad))
        raise ValueError(
            f"group {g}: column span [{cmin[g]}, {cmax[g]}] exceeds the "
            f"{window}-wide window; RCM-permute, widen the window, or "
            "use block-ELL/banded instead")

    g_of = rows // _LANES
    lane = rows % _LANES
    if residue:
        # Sublane = window row q; depth within the (row, q) class picks
        # the tile. v_g = max class count over the group's rows.
        li = cols - ws[g_of]
        q = li >> 7
        key = rows * _SUB + q          # rows ascending → still row-sorted
        order2 = np.argsort(key, kind="stable")
        inv = np.empty_like(order2)
        inv[order2] = np.arange(len(order2))
        ks = key[order2]
        change = np.concatenate([[True], ks[1:] != ks[:-1]])             if len(ks) else np.zeros(0, bool)
        startpos = np.maximum.accumulate(
            np.where(change, np.arange(len(ks)), 0)) if len(ks) else ks
        depth = (np.arange(len(ks)) - startpos)[inv]
        if len(depth):
            vmax = np.zeros(G, np.int64)
            np.maximum.at(vmax, g_of, depth + 1)
            v = np.maximum(1, vmax)
        else:
            v = np.ones(G, np.int64)
        group_ptr = np.concatenate([[0], np.cumsum(v)]).astype(np.int32)
        T = int(group_ptr[-1])
        tile = group_ptr[g_of] + depth
        sub = q
        lidx_store = li & 127          # r only; q == sublane
    else:
        maxdeg = counts.reshape(G, _LANES).max(axis=1)
        v = np.maximum(1, -(-maxdeg // _SUB)).astype(np.int64)
        group_ptr = np.concatenate([[0], np.cumsum(v)]).astype(np.int32)
        T = int(group_ptr[-1])
        i_in_row = np.arange(len(rows)) - row_start[rows]
        tile = group_ptr[g_of] + i_in_row // _SUB
        sub = i_in_row % _SUB
        lidx_store = cols - ws[g_of]

    vals_all = np.zeros((T, _SUB, _LANES), dtype)
    lidx_all = np.zeros((T, _SUB, _LANES), np.int32)
    vals_all[tile, sub, lane] = vals
    lidx_all[tile, sub, lane] = lidx_store
    return SellData(jnp.asarray(vals_all), jnp.asarray(lidx_all),
                    jnp.asarray(group_ptr),
                    jnp.asarray((ws // _LANES).astype(np.int32)),
                    n, len(vals), win_rows=window // _LANES,
                    residue=residue)


def _sell_kernel(group_ptr_ref, win_row_ref, vals_hbm, lidx_hbm, x_hbm,
                 out_ref, win_ref, vbuf, ibuf, sems, *, wr: int,
                 residue: bool):
    """One grid step = 8 consecutive 128-row groups (the output tile is a
    full (8, 128) register). Per group: one contiguous window DMA (wr·512
    bytes), then v double-buffered (vals, lidx) tile streams; per (8, 128)
    tile, one 8-step roll + lane-gather (tpu.dynamic_gather) pass per
    1024-element window half."""
    gblk = pl.program_id(0)
    sid = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 0)
    halves = wr // _SUB

    def tile_dma(slot, t):
        return (pltpu.make_async_copy(vals_hbm.at[t], vbuf.at[slot],
                                      sems.at[slot]),
                pltpu.make_async_copy(lidx_hbm.at[t], ibuf.at[slot],
                                      sems.at[3 + slot]))

    for gi in range(_SUB):
        g = gblk * _SUB + gi
        wrow = win_row_ref[g]
        wcp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(wrow, wr)], win_ref, sems.at[2])
        wcp.start()

        t0 = group_ptr_ref[g]
        nt = group_ptr_ref[g + 1] - t0

        @pl.when(nt > 0)
        def _():
            c0 = tile_dma(0, t0)
            c0[0].start()
            c0[1].start()
        wcp.wait()

        def body(i, acc):
            slot = i % 2
            nxt = (i + 1) % 2

            @pl.when(i + 1 < nt)
            def _():
                cn = tile_dma(nxt, t0 + i + 1)
                cn[0].start()
                cn[1].start()

            cw = tile_dma(slot, t0 + i)
            cw[0].wait()
            cw[1].wait()

            li = ibuf[slot]
            if residue:
                # sublane == window row by construction: ONE lane-gather.
                gathered = jnp.take_along_axis(
                    win_ref[:, :], li, axis=1, mode="promise_in_bounds")
                return acc + vbuf[slot] * gathered
            q = li >> 7                    # window row in [0, wr)
            r = li & 127
            gathered = jnp.zeros((_SUB, _LANES), win_ref.dtype)
            for h in range(halves):
                half = win_ref[h * _SUB:(h + 1) * _SUB, :]
                qh = q - h * _SUB
                in_half = (q >> 3) == h
                jd = (qh - sid + _SUB) & 7
                for j in range(_SUB):
                    Wj = (pltpu.roll(half, _SUB - j, 0) if j else half)
                    Gj = jnp.take_along_axis(Wj, r, axis=1,
                                             mode="promise_in_bounds")
                    gathered = jnp.where(in_half & (jd == j), Gj,
                                         gathered)
            return acc + vbuf[slot] * gathered

        acc = lax.fori_loop(0, nt, body,
                            jnp.zeros((_SUB, _LANES), out_ref.dtype))
        out_ref[gi, :] = jnp.sum(acc, axis=0)


@jax.jit
def sell_spmv_ref(data: SellData, x):
    """Pure-XLA reference/fallback path: identical math, any platform."""
    n = data.n
    G = data.win_row.shape[0]
    n_pad = G * _LANES
    T = data.vals.shape[0]
    x_pad = jnp.pad(x, (0, n_pad - n + data.win_rows * _LANES))
    tile_group = jnp.searchsorted(data.group_ptr[1:], jnp.arange(T),
                                  side="right")
    ws = data.win_row[tile_group] * _LANES               # (T,)
    if data.residue:
        sub_off = (_LANES * np.arange(_SUB, dtype=np.int32))[None, :, None]
        gidx = data.lidx + ws[:, None, None] + sub_off
    else:
        gidx = data.lidx + ws[:, None, None]
    gx = x_pad[gidx]                                     # (T, 8, 128)
    contrib = jnp.sum(data.vals * gx, axis=1)            # (T, 128)
    y = jax.ops.segment_sum(contrib, tile_group, num_segments=G)
    return y.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def sell_spmv(data: SellData, x, *, interpret: bool = False):
    """y = A @ x for a SELL-window packed matrix (see module docstring)."""
    n = data.n
    G = data.win_row.shape[0]
    n_pad = G * _LANES
    T = data.vals.shape[0]
    # Pad x so every window read is in range (windows are clamped to
    # start ≥ 0 and extend at most _W beyond any referenced column).
    W = data.win_rows * _LANES
    x_pad = jnp.pad(x, (0, n_pad - n + W))
    x2 = x_pad.reshape(-1, _LANES)

    # 8 groups per grid step (the output tile must be a full (8, 128)
    # register); padded trailing groups have nt = 0 and write zeros.
    G8 = -(-G // _SUB)
    gp = jnp.concatenate([data.group_ptr,
                          jnp.full((G8 * _SUB - G,), data.group_ptr[-1],
                                   jnp.int32)])
    wr = jnp.concatenate([data.win_row,
                          jnp.zeros((G8 * _SUB - G,), jnp.int32)])

    out = pl.pallas_call(
        functools.partial(_sell_kernel, wr=data.win_rows,
                          residue=data.residue),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(G8,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),   # vals (HBM)
                pl.BlockSpec(memory_space=pltpu.ANY),   # lidx (HBM)
                pl.BlockSpec(memory_space=pltpu.ANY),   # x2   (HBM)
            ],
            out_specs=pl.BlockSpec((_SUB, _LANES), lambda g, *_: (g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((data.win_rows, _LANES), x.dtype),   # window
                pltpu.VMEM((2, _SUB, _LANES), data.vals.dtype),
                pltpu.VMEM((2, _SUB, _LANES), jnp.int32),
                pltpu.SemaphoreType.DMA((6,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((G8 * _SUB, _LANES), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * _SUB * _LANES,
            bytes_accessed=(data.vals.size * data.vals.dtype.itemsize
                            + data.lidx.size * 4
                            + 2 * n * x.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(gp, wr, data.vals, data.lidx, x2)
    return out.reshape(-1)[:n]
