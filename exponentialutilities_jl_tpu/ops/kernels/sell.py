"""SELL-window SpMV — vector-gather sparse kernel for unstructured matrices.

Round-1's ``blockell_spmv`` gathers x one 128-lane row-copy per 8×128 dense
block: fine when blocks are dense, but an UNSTRUCTURED matrix (~10 nnz
scattered per row) makes the blocks nearly empty and the effective rate
collapses (XLA scalar-ELL measured ~1 GB/s). This kernel's design:

* **Value stream without block padding** — SELL lane-major layout: rows
  grouped in 128s (lane l = row l of the group); each group stores
  ``v = ceil(maxdeg/8)`` tiles of (8, 128), sublane s of tile t holding
  slot ``8·t+s`` of every row. Padded slots carry value 0. The value and
  index streams are contiguous (T, 8, 128) arrays.
* **Gather at VPU vector rate** — ``tpu.dynamic_gather`` (via
  ``jnp.take_along_axis`` on an (8, 128) table) gathers 1024 elements per
  op. Two packings:
  - default (roll): arbitrary slot placement; one 8-step sublane-roll +
    lane-gather + select pass per 1024-element window half;
  - ``residue=True``: each nnz placed at sublane ≡ window-row (mod 8), so
    a tile needs ONE gather per window half + one select — ~4 VPU ops per
    1024 slots — at the cost of more padding (v = max per-row per-class
    count).
* **Latency-proof DMA schedule** — the v1 kernel issued 3 blocking DMAs
  per 128-row group (window + values + indices) and measured 37 ms at
  10M rows: pure DMA round-trip latency. v2 amortizes: ONE x-window, ONE
  value-chunk and ONE index-chunk DMA per 8-group block (the block's
  tiles are contiguous by construction), double-buffered across grid
  steps so the next block's transfers overlap the current block's
  compute.
* **Reduction with no scatter** — row-per-lane makes the per-row sum a
  sublane-axis reduction; output rows are written contiguously.

Constraint: each 8-group block's (1024 rows') columns must fit one aligned
``window``-wide span (default 2048; any multiple of 1024). After RCM this
holds for bandwidth ≲ window − 1150; wider matrices fall back to
block-ELL/banded. SpMV role in the reference: outsourced to SparseArrays
(src/arnoldi.jl:182); this layer is the BASELINE.json per-chip
speed-of-light metric.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sell_pack", "sell_spmv", "sell_spmv_ref", "SellData",
           "pack_index_pairs", "SellBucketed", "sell_pack_bucketed",
           "sell_spmv_bucketed", "sell_spmv_bucketed_ref",
           "SellSeg", "sell_pack_seg", "sell_spmv_seg",
           "sell_spmv_seg_ref"]

_W = 1024
_LANES = 128
_SUB = 8
_GPB = 8                     # groups per block (output tile = (8, 128))


class SellData:
    """Packed SELL-window arrays (host-built, device-resident).

    vals:      (T + cap, 8, 128) values, 0 in padded slots (cap trailing
               pad tiles let the fixed-size chunk DMA over-read safely).
    lidx:      same shape, int32 block-window-local element indices.
    group_ptr: (G + 1,) int32 tile offsets per 128-row group.
    win_row:   (B,) int32 per-BLOCK window start (128-lane row units).
    n, nnz:    logical dimension / true nonzero count.
    win_rows:  window size in 128-lane rows (static).
    residue:   sublane ≡ window-row (mod 8) packing (static).
    cap:       chunk-DMA tile capacity = max tiles per block (static).
    """

    def __init__(self, vals, lidx, group_ptr, win_row, n, nnz,
                 win_rows=_SUB * 2, mode="roll", cap=_GPB, pptr=None,
                 capp=0, chunks=1, uniform=0, seg=0):
        self.vals = vals
        self.lidx = lidx             # (T+cap, 8, 128) int32, or pair-packed
        self.group_ptr = group_ptr
        self.win_row = win_row       # (B,) or (B, chunks) window starts
        self.pptr = (pptr if pptr is not None
                     else jnp.zeros((1,), jnp.int32))
        self.n = int(n)
        self.nnz = int(nnz)
        self.win_rows = int(win_rows)
        self.mode = str(mode)        # "roll" | "residue" | "rowsel"
                                     # | "chunked"
        self.cap = int(cap)
        self.capp = int(capp)        # 0 = indices unpacked; else packed
                                     # pair-chunk capacity per block
        self.chunks = int(chunks)    # window slabs per block (chunked)
        self.uk = int(uniform)       # >0: EVERY group has exactly uk
                                     # tiles (static kernel schedule);
                                     # 0: dynamic per-group tile counts
        self.seg = int(seg)          # >0: lane-compacted pack — lanes are
                                     # ROW SEGMENTS (seg id in lidx bits
                                     # 10+); value = suffix-sum doubling
                                     # steps of the in-kernel segmented
                                     # lane reduction

    @property
    def uniform(self):
        """Static-schedule flag (uk >= 1: uniform-k tiles per group)."""
        return self.uk

    @property
    def residue(self):
        return self.mode == "residue"

    def tree_flatten(self):
        return ((self.vals, self.lidx, self.group_ptr, self.win_row,
                 self.pptr),
                (self.n, self.nnz, self.win_rows, self.mode, self.cap,
                 self.capp, self.chunks, self.uk, self.seg))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def save(self, path: str) -> None:
        """Persist the packed layout (npz). Packing 10M rows takes tens
        of seconds of host work — production serving should pack once
        and ``SellData.load`` on every restart."""
        np.savez(path, vals=np.asarray(self.vals),
                 lidx=np.asarray(self.lidx),
                 group_ptr=np.asarray(self.group_ptr),
                 win_row=np.asarray(self.win_row),
                 pptr=np.asarray(self.pptr),
                 meta=np.asarray([self.n, self.nnz, self.win_rows,
                                  self.cap, self.capp, self.chunks,
                                  self.uk, self.seg],
                                 np.int64),
                 mode=np.asarray(self.mode))

    @classmethod
    def load(cls, path: str) -> "SellData":
        import os
        if not os.path.exists(path) and not path.endswith(".npz"):
            path = path + ".npz"       # np.savez auto-appends .npz
        z = np.load(path, allow_pickle=False)
        meta = [int(v) for v in z["meta"]]
        n, nnz, win_rows, cap, capp, chunks = meta[:6]
        uniform = int(meta[6]) if len(meta) > 6 else 0
        seg = int(meta[7]) if len(meta) > 7 else 0
        return cls(jnp.asarray(z["vals"]), jnp.asarray(z["lidx"]),
                   jnp.asarray(z["group_ptr"]), jnp.asarray(z["win_row"]),
                   n, nnz, win_rows=win_rows, mode=str(z["mode"]),
                   cap=cap, pptr=jnp.asarray(z["pptr"]), capp=capp,
                   chunks=chunks, uniform=uniform, seg=seg)


jax.tree_util.register_pytree_node(
    SellData,
    lambda s: s.tree_flatten(),
    lambda aux, ch: SellData(ch[0], ch[1], ch[2], ch[3], aux[0], aux[1],
                             win_rows=aux[2], mode=aux[3], cap=aux[4],
                             pptr=ch[4], capp=aux[5], chunks=aux[6],
                             uniform=aux[7] if len(aux) > 7 else 0,
                             seg=aux[8] if len(aux) > 8 else 0),
)


def pack_index_pairs(data: SellData) -> SellData:
    """Halve the index stream: two tiles' 11-bit indices share one int32
    plane (block-locally paired so the per-block chunk DMA stays one
    contiguous read). Valid for window ≤ 8192 (indices < 16 bits).
    A ``SellBucketed`` pack is pair-packed bucket by bucket."""
    if isinstance(data, SellBucketed):
        return SellBucketed([pack_index_pairs(b) for b in data.buckets],
                            data.group_src, data.n, data.nnz,
                            win_rows=data.win_rows)
    if data.capp:
        return data
    if data.win_rows * _LANES > 8192:
        raise ValueError("pair packing needs window <= 8192")
    import numpy as _onp
    gp = _onp.asarray(data.group_ptr)
    G = gp.shape[0] - 1
    B = (-(-G // _GPB) if data.mode == "subroll"
         else data.win_row.shape[0])
    T = int(gp[-1])
    gp_blk = gp[_onp.minimum(_onp.arange(B + 1) * _GPB, G)]
    nt_b = _onp.diff(gp_blk)
    ntp_b = (nt_b + 1) // 2
    pptr = _onp.concatenate([[0], _onp.cumsum(ntp_b)]).astype(_onp.int32)
    TP = int(pptr[-1])
    capp = (data.cap + 1) // 2 + 1
    li = _onp.asarray(data.lidx[:T])
    packed = _onp.zeros((TP + capp, _SUB, _LANES), _onp.int32)
    tb = _onp.searchsorted(gp_blk[1:], _onp.arange(T), side="right")
    loc = _onp.arange(T) - gp_blk[tb]
    dest = pptr[tb] + loc // 2
    even = (loc % 2) == 0
    packed[dest[even]] += li[even]
    packed[dest[~even]] += li[~even] << 16
    return SellData(data.vals, jnp.asarray(packed), data.group_ptr,
                    data.win_row, data.n, data.nnz, uniform=data.uniform,
                    win_rows=data.win_rows, mode=data.mode, cap=data.cap,
                    pptr=jnp.asarray(pptr), capp=capp, chunks=data.chunks)


def _pack_chunked(A, n: int, dtype, window: int, max_chunks: int):
    """Chunked-window packing: each 8-group block's columns are covered by
    up to ``max_chunks`` aligned ``window``-wide slabs (greedy cover);
    every TILE is chunk-pure (all its slots gather from one slab), so the
    kernel's gather stays one-slab-wide regardless of total column span.
    The slab id rides the index high bits (li = c·8192 + local), including
    in padded slots, so the kernel can read a tile's slab from any slot.
    """
    if window > 8192:
        raise ValueError("chunked mode needs window <= 8192 (13-bit "
                         "local indices)")
    if not 1 <= max_chunks <= 8:
        raise ValueError("max_chunks must be in 1..8 (3-bit slab ids)")
    W = window
    C = int(max_chunks)
    indptr = A.indptr.astype(np.int64)
    indices = A.indices.astype(np.int64)
    data = A.data
    nnz = A.nnz

    G = -(-n // _LANES)
    B = -(-G // _GPB)
    r_all = np.repeat(np.arange(n), np.diff(indptr))
    g_of = r_all // _LANES
    lane = r_all % _LANES

    # Greedy aligned-slab cover per block (loop is over slabs, <= C each).
    bb = indptr[np.minimum(np.arange(B + 1) * _GPB * _LANES, n)]
    span_start = np.zeros((B, C), np.int64)
    c_of = np.zeros(nnz, np.int64)
    for b in range(B):
        lo, hi = bb[b], bb[b + 1]
        if lo == hi:
            continue
        u = np.unique(indices[lo:hi])
        starts = []
        ptr = 0
        while ptr < len(u):
            if len(starts) == C:
                raise ValueError(
                    f"block {b}: columns need more than {C} "
                    f"{W}-wide slabs; raise max_chunks/window, RCM-"
                    "permute, or use block-ELL instead")
            s = (u[ptr] // _LANES) * _LANES
            starts.append(s)
            ptr = np.searchsorted(u, s + W)
        st = np.asarray(starts)
        span_start[b, :len(st)] = st
        span_start[b, len(st):] = st[-1]
        c_of[lo:hi] = np.searchsorted(st, indices[lo:hi], side="right") - 1

    # Position of each nnz within its (row, chunk) run. CSR column order
    # makes chunk ids non-decreasing within a row, so runs are contiguous.
    key = r_all * C + c_of
    if nnz:
        change = np.concatenate([[True], key[1:] != key[:-1]])
        pos = (np.arange(nnz)
               - np.maximum.accumulate(np.where(change, np.arange(nnz), 0)))
    else:
        pos = np.zeros(0, np.int64)

    # Tiles per (group, chunk): ceil(max per-row run length / 8).
    md_gc = np.zeros(G * C, np.int64)
    if nnz:
        np.maximum.at(md_gc, g_of * C + c_of, pos + 1)
    md_gc = md_gc.reshape(G, C)
    v_gc = -(-md_gc // _SUB)
    v_gc[v_gc.sum(axis=1) == 0, 0] = 1              # every group >= 1 tile
    off_gc = np.cumsum(v_gc, axis=1) - v_gc         # exclusive, within group
    v_g = v_gc.sum(axis=1)
    group_ptr = np.concatenate([[0], np.cumsum(v_g)]).astype(np.int32)
    T = int(group_ptr[-1])

    tile = group_ptr[g_of] + off_gc[g_of, c_of] + pos // _SUB
    sub = pos % _SUB

    gp_blk = group_ptr[np.minimum(np.arange(B + 1) * _GPB, G)]
    cap = max(int(np.max(np.diff(gp_blk))) if B else 1, 1)

    # Every slot of a tile (padded included) carries the tile's slab id.
    # Tiles are chunk-major within each group, so the per-tile slab id
    # sequence is repeat(c, v_gc[g, c]) in (g, c) order.
    tile_chunk = np.concatenate([
        np.repeat(np.tile(np.arange(C), G), v_gc.reshape(-1)),
        np.zeros(cap, np.int64)]).astype(np.int32)
    lidx_all = np.broadcast_to(
        (tile_chunk << 13)[:, None, None], (T + cap, _SUB, _LANES)).copy()
    vals_all = np.zeros((T + cap, _SUB, _LANES), dtype)
    li = (c_of << 13) | (indices - span_start[g_of // _GPB, c_of])
    vals_all[tile, sub, lane] = data.astype(dtype)
    lidx_all[tile, sub, lane] = li
    return SellData(jnp.asarray(vals_all), jnp.asarray(lidx_all.astype(
                        np.int32)),
                    jnp.asarray(group_ptr),
                    jnp.asarray((span_start // _LANES).astype(np.int32)),
                    n, int(nnz), win_rows=W // _LANES, mode="chunked",
                    cap=cap, chunks=C)


def _subroll_transform(lidx_all, group_ptr, g_of, indices, wsb_group,
                       wr: int):
    """Rebase indices onto per-GROUP 1024-wide 128-aligned subwindows.

    The kernel DMAs each group's (8, 128) x-subwindow into its own
    sublane-ALIGNED VMEM slot (8 small x-DMAs per block instead of one
    block-window DMA — a traced-offset VMEM slice at arbitrary sublane
    offset is NOT free: the first cut of this mode sliced the block
    window at goff and measured 25.6 ms vs roll's 10.6 at 10M rows) and
    gathers with ONE 8-step roll pass — half the full-window sequence,
    no in-half masking. Returns the per-group window starts (128-lane
    row units, absolute), or None when some group's span does not fit
    1024 after alignment (caller falls back to plain roll)."""
    G = len(group_ptr) - 1
    cmin = np.full(G, np.iinfo(np.int64).max)
    cmax = np.full(G, -1, np.int64)
    np.minimum.at(cmin, g_of, indices)
    np.maximum.at(cmax, g_of, indices)
    empty = cmax < 0
    cmin[empty] = wsb_group[empty] if len(wsb_group) else 0
    cmax[empty] = cmin[empty]
    gwin = np.clip(cmin // _LANES, wsb_group // _LANES,
                   wsb_group // _LANES + wr - _SUB)
    if np.any(cmax >= (gwin + _SUB) * _LANES):
        return None
    # Rebase every slot to its group window (real indices are in range
    # by the check above, so the clip only catches value-0 PAD slots,
    # keeping promise_in_bounds honest).
    T = lidx_all.shape[0]
    tile_base = np.zeros(T, np.int64)
    counts = np.diff(group_ptr).astype(np.int64)
    tile_base[:group_ptr[G]] = np.repeat(
        gwin * _LANES - wsb_group, counts)
    lidx_all[:] = np.clip(lidx_all - tile_base[:, None, None], 0, _W - 1)
    return gwin.astype(np.int32)


_UK_MAX = 8          # uniform-k static unroll cap (8 gather seqs/group)
_SEG_DIRECT_MAX = 8  # seg pack: max segment length for DIRECT-sum compaction
_UK_PAD = 2.0        # auto repack only if k·G <= _UK_PAD · T (pad traffic)


def _maybe_uniform_k(va, lia, gp, mode: str, uniform_k):
    """Repack to a STATIC uniform-k schedule when profitable.

    The measured per-tile cost of the dynamic subroll path is ~2/3
    bookkeeping (group_ptr lookups + ``fori_loop`` carry, BENCHMARKS.md):
    padding every 128-row group to exactly k = max tiles/group lets the
    kernel run a fully static schedule (the d<=8 "uniform" fast path
    generalized), trading zero-padded value/index DMA traffic for the
    bookkeeping. Auto policy (``uniform_k=None``): repack when
    k <= _UK_MAX and the padded tile count k·G <= _UK_PAD·T.

    Returns (va, lia, gp, cap_or_None, uk); uk=0 keeps the dynamic path,
    uk>=1 means every group holds exactly uk tiles (group g's tiles at
    [g·uk, (g+1)·uk); trailing phantom groups up to the block boundary
    are all-zero so the fixed-size chunk DMA stays in range).
    """
    gp64 = np.asarray(gp, np.int64)
    G = len(gp64) - 1
    v = np.diff(gp64)
    T = int(gp64[-1])
    k = int(v.max()) if G else 1
    if k == 1 and T == G:
        return va, lia, gp, None, 1
    if mode != "subroll" or uniform_k is False:
        return va, lia, gp, None, 0
    if uniform_k and k > _UK_MAX:
        raise ValueError(
            f"uniform_k: max tiles/group {k} exceeds the static unroll "
            f"cap {_UK_MAX} — use the dynamic path (uniform_k=False)")
    if not (uniform_k or (uniform_k is None and k <= _UK_MAX
                          and k * G <= _UK_PAD * T)):
        return va, lia, gp, None, 0
    B = -(-G // _GPB)
    T2 = B * _GPB * k
    va2 = np.zeros((T2,) + va.shape[1:], va.dtype)
    li2 = np.zeros((T2,) + lia.shape[1:], np.asarray(lia).dtype)
    src = np.arange(T)
    tg = np.repeat(np.arange(G), v)
    dest = tg * k + (src - gp64[:-1][tg])
    va2[dest] = np.asarray(va)[src]
    li2[dest] = np.asarray(lia)[src]
    gp2 = (np.arange(G + 1, dtype=np.int64) * k).astype(np.int32)
    return va2, li2, gp2, _GPB * k, k


def sell_pack(rows_cols_vals, n: int, dtype=np.float32,
              window: int = 2048, residue: bool = False,
              mode: str | None = None, max_chunks: int = 4,
              uniform_k: bool | None = None) -> SellData:
    """Pack COO (rows, cols, vals) into SELL-window form (module doc).

    ``mode=None`` auto-selects: "subroll" (per-group 1024-wide
    subwindows — half the gather work of "roll") when every 128-row
    group's column span fits an aligned 1024 subwindow, else "roll".

    ``uniform_k``: static-schedule repack policy for subroll packings
    whose max tiles/group k exceeds 1 — pad every group to exactly k
    tiles so the kernel runs the fully static fast path (no group_ptr /
    ``fori_loop`` bookkeeping, measured ~2/3 of dynamic per-tile cost).
    None (default) auto-repacks when k <= 8 and padding k·G <= 2·T;
    True forces (k <= 8 required); False keeps the dynamic path.

    Raises ValueError if any 8-group block's columns exceed its aligned
    ``window`` — RCM-permute first (the packer does not reorder), widen
    the window, or fall back to another container. Duplicate (row, col)
    entries are summed.
    """
    if window % _W:
        raise ValueError("window must be a multiple of 1024")
    auto = mode is None and not residue
    if mode is None:
        mode = "residue" if residue else "subroll"
    want_subroll = mode == "subroll"
    if want_subroll:
        mode = "roll"
    residue = mode == "residue"
    rows, cols, vals = rows_cols_vals
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals, dtype=dtype)

    import scipy.sparse as sp
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    A.sort_indices()
    nnz = A.nnz
    if mode == "chunked":
        return _pack_chunked(A, n, dtype, window, max_chunks)
    if mode == "rowsel":
        from ...native import sell_rowsel_pack_csr
        packed = sell_rowsel_pack_csr(A, window=window)
        if packed is None:
            raise RuntimeError(
                "rowsel packing requires the native library "
                "(exponentialutilities_jl_tpu/native)")
        va, lia, gp, wr, cap = packed
        return SellData(jnp.asarray(va.astype(dtype)), jnp.asarray(lia),
                        jnp.asarray(gp), jnp.asarray(wr), n, int(nnz),
                        win_rows=window // _LANES, mode="rowsel", cap=cap)
    if not residue:
        # Native C++ single-pass packer when available.
        try:
            from ...native import sell_pack_csr
            packed = sell_pack_csr(A, window=window)
        except ImportError:
            packed = None
        if packed is not None:
            va, lia, gp, wrow, cap = packed
            out_mode = "roll"
            if want_subroll or auto:
                ip = A.indptr.astype(np.int64)
                g_all = (np.repeat(np.arange(n), np.diff(ip))
                         // _LANES)
                Gn = len(gp) - 1
                wsb_group = (np.asarray(wrow, np.int64)[
                    np.minimum(np.arange(Gn) // _GPB, len(wrow) - 1)]
                    * _LANES)
                lia = np.ascontiguousarray(lia)
                gwin = _subroll_transform(
                    lia, np.asarray(gp, np.int64), g_all,
                    A.indices.astype(np.int64), wsb_group,
                    window // _LANES)
                if gwin is not None:
                    out_mode = "subroll"
                    wrow = gwin          # (G,) per-group window starts
                elif want_subroll and not auto:
                    raise ValueError(
                        "subroll: some 128-row group's column span "
                        "exceeds an aligned 1024 subwindow — use "
                        "mode='roll' or RCM-permute")
            va, lia, gp, ncap, uk = _maybe_uniform_k(
                va, lia, gp, out_mode, uniform_k)
            if ncap is not None:
                cap = ncap
            return SellData(jnp.asarray(va.astype(dtype)),
                            jnp.asarray(lia), jnp.asarray(gp),
                            jnp.asarray(wrow), n, int(nnz),
                            win_rows=window // _LANES, mode=out_mode,
                            cap=cap, uniform=uk)
    indptr = A.indptr.astype(np.int64)
    indices = A.indices.astype(np.int64)
    data = A.data

    G = -(-n // _LANES)
    B = -(-G // _GPB)
    n_pad = G * _LANES
    counts = np.zeros(n_pad, np.int64)
    counts[:n] = np.diff(indptr)

    # Per-BLOCK window from per-block column extrema.
    bb = indptr[np.minimum(np.arange(B) * _GPB * _LANES, n)]
    nonempty = np.diff(np.concatenate([bb, [nnz]])) > 0
    cmin = np.zeros(B, np.int64)
    cmax = np.zeros(B, np.int64)
    ne = np.flatnonzero(nonempty)
    if len(ne):
        cmin[ne] = np.minimum.reduceat(indices, bb[ne])
        cmax[ne] = np.maximum.reduceat(indices, bb[ne])
    wsb = (cmin // _LANES) * _LANES
    bad = cmax >= wsb + window
    if np.any(bad):
        blk = int(np.argmax(bad))
        raise ValueError(
            f"block {blk}: column span [{cmin[blk]}, {cmax[blk]}] exceeds "
            f"the {window}-wide window; RCM-permute, widen the window, or "
            "use block-ELL/banded instead")

    r_all = np.repeat(np.arange(n), np.diff(indptr))
    g_of = r_all // _LANES
    lane = r_all % _LANES
    li = indices - wsb[g_of // _GPB]

    if residue:
        q = li >> 7
        key = r_all * _SUB + (q & 7)
        order2 = np.argsort(key, kind="stable")
        inv = np.empty_like(order2)
        inv[order2] = np.arange(len(order2))
        ks = key[order2]
        if len(ks):
            change = np.concatenate([[True], ks[1:] != ks[:-1]])
            startpos = np.maximum.accumulate(
                np.where(change, np.arange(len(ks)), 0))
            depth = (np.arange(len(ks)) - startpos)[inv]
            vmax_g = np.zeros(G, np.int64)
            np.maximum.at(vmax_g, g_of, depth + 1)
            v = np.maximum(1, vmax_g)
        else:
            depth = r_all  # empty
            v = np.ones(G, np.int64)
        group_ptr = np.concatenate([[0], np.cumsum(v)]).astype(np.int32)
        tile = group_ptr[g_of] + depth
        sub = (q & 7)
    else:
        maxdeg = counts.reshape(G, _LANES).max(axis=1)
        v = np.maximum(1, -(-maxdeg // _SUB)).astype(np.int64)
        group_ptr = np.concatenate([[0], np.cumsum(v)]).astype(np.int32)
        i_in_row = np.arange(nnz) - indptr[r_all]
        tile = group_ptr[g_of] + i_in_row // _SUB
        sub = i_in_row % _SUB

    T = int(group_ptr[-1])
    # chunk capacity: max tiles in any 8-group block (+ trailing pad)
    gp_blk = group_ptr[np.minimum(np.arange(B + 1) * _GPB, G)]
    cap = int(np.max(np.diff(gp_blk))) if B else 1
    cap = max(cap, 1)

    vals_all = np.zeros((T + cap, _SUB, _LANES), dtype)
    lidx_all = np.zeros((T + cap, _SUB, _LANES), np.int32)
    vals_all[tile, sub, lane] = data.astype(dtype)
    lidx_all[tile, sub, lane] = li
    out_mode = "residue" if residue else "roll"
    wrow_out = (wsb // _LANES).astype(np.int32)
    if not residue and (want_subroll or auto):
        wsb_group = wsb[np.minimum(np.arange(G) // _GPB, B - 1)]
        gwin = _subroll_transform(lidx_all, group_ptr.astype(np.int64),
                                  g_of, indices, wsb_group,
                                  window // _LANES)
        if gwin is not None:
            out_mode = "subroll"
            wrow_out = gwin              # (G,) per-group window starts
        elif want_subroll and not auto:
            raise ValueError(
                "subroll: some 128-row group's column span exceeds an "
                "aligned 1024 subwindow — use mode='roll' or RCM-permute")
    vals_all, lidx_all, group_ptr, ncap, uk = _maybe_uniform_k(
        vals_all, lidx_all, group_ptr, out_mode, uniform_k)
    if ncap is not None:
        cap = ncap
    return SellData(jnp.asarray(vals_all), jnp.asarray(lidx_all),
                    jnp.asarray(group_ptr),
                    jnp.asarray(wrow_out),
                    n, int(nnz), win_rows=window // _LANES,
                    mode=out_mode, cap=cap, uniform=uk)


def _gather_tile(win, li, wr: int, mode: str, sid):
    """Gather 1024 x-elements for one (8, 128) tile from the (wr, 128)
    VMEM window (see module doc)."""
    if mode == "rowsel":
        # Two-step gather: (1) build the per-sublane row table
        # T[s, :] = win[qrow_s, :] with one axis-0 dynamic_gather per
        # half (qrow = li >> 7 is uniform along lanes by construction);
        # (2) one lane gather by r. ~9 VPU ops per 1024 slots.
        qv = li >> 7
        r = li & 127
        T8 = None
        for h in range(wr // _SUB):
            idxh = jnp.clip(qv - h * _SUB, 0, _SUB - 1)
            Th = jnp.take_along_axis(win[h * _SUB:(h + 1) * _SUB, :],
                                     idxh, axis=0,
                                     mode="promise_in_bounds")
            if T8 is None:
                T8 = Th
            else:
                T8 = jnp.where((qv >> 3) == h, Th, T8)
        return jnp.take_along_axis(T8, r, axis=1,
                                   mode="promise_in_bounds")
    if mode == "residue":
        r = li & 127
        gathered = None
        for h in range(wr // _SUB):
            half = win[h * _SUB:(h + 1) * _SUB, :]
            Gh = jnp.take_along_axis(half, r, axis=1,
                                     mode="promise_in_bounds")
            if gathered is None:
                gathered = Gh
            else:
                gathered = jnp.where((li >> 10) == h, Gh, gathered)
        return gathered
    if mode == "subroll":
        # ``win`` is the group's (8, 128) subwindow (the kernel sliced it
        # by the tile's tagged offset): ONE 8-step roll/gather/select
        # pass — half the full-window roll sequence, no in-half selects.
        q = li >> 7
        r = li & 127
        jd = (q - sid) & 7
        gathered = jnp.zeros(li.shape, win.dtype)
        for j in range(_SUB):
            Wj = pltpu.roll(win, _SUB - j, 0) if j else win
            Gj = jnp.take_along_axis(Wj, r, axis=1,
                                     mode="promise_in_bounds")
            gathered = jnp.where(jd == j, Gj, gathered)
        return gathered
    q = li >> 7
    r = li & 127
    gathered = jnp.zeros(li.shape, win.dtype)
    for h in range(wr // _SUB):
        half = win[h * _SUB:(h + 1) * _SUB, :]
        qh = q - h * _SUB
        in_half = (q >> 3) == h
        jd = (qh - sid + _SUB) & 7
        for j in range(_SUB):
            Wj = pltpu.roll(half, _SUB - j, 0) if j else half
            Gj = jnp.take_along_axis(Wj, r, axis=1,
                                     mode="promise_in_bounds")
            gathered = jnp.where(in_half & (jd == j), Gj, gathered)
    return gathered


def _sell_kernel(group_ptr_ref, win_row_ref, pptr_ref, vals_hbm, lidx_hbm,
                 x_hbm, out_ref, win2, vbuf, ibuf, sems, *, wr: int,
                 cap: int, mode: str, nblocks: int, capp: int, nc: int = 1,
                 uniform: int = 0, seg: int = 0):
    b = pl.program_id(0)
    par = b % 2
    nxt = (b + 1) % 2
    sid = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 0)
    nwin = _GPB if mode == "subroll" else nc
    nsem = nwin + 2                  # per-parity: x-slabs + vals + idx

    def block_dmas(p, blk):
        t0 = group_ptr_ref[blk * _GPB]
        if capp:
            icp = pltpu.make_async_copy(
                lidx_hbm.at[pl.ds(pptr_ref[blk], capp)], ibuf.at[p],
                sems.at[p * nsem + nwin + 1])
        else:
            icp = pltpu.make_async_copy(lidx_hbm.at[pl.ds(t0, cap)],
                                        ibuf.at[p],
                                        sems.at[p * nsem + nwin + 1])
        if mode == "subroll":
            # one ALIGNED (8, 128) x-subwindow per 128-row group: eight
            # small DMAs per block, landing each group's window in its
            # own sublane-aligned VMEM slot (win_row is per-GROUP here)
            xcps = tuple(
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(win_row_ref[blk * _GPB + g], _SUB)],
                    win2.at[p, pl.ds(g * _SUB, _SUB)],
                    sems.at[p * nsem + g])
                for g in range(_GPB))
        else:
            xcps = tuple(
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(win_row_ref[blk * nc + c], wr)],
                    win2.at[p] if nc == 1
                    else win2.at[p, pl.ds(c * wr, wr)],
                    sems.at[p * nsem + c])
                for c in range(nc))
        return xcps + (
            pltpu.make_async_copy(vals_hbm.at[pl.ds(t0, cap)],
                                  vbuf.at[p], sems.at[p * nsem + nwin]),
            icp,
        )

    @pl.when(b == 0)
    def _():
        for cp in block_dmas(0, 0):
            cp.start()

    @pl.when(b + 1 < nblocks)
    def _():
        for cp in block_dmas(nxt, b + 1):
            cp.start()

    for cp in block_dmas(par, b):
        cp.wait()

    if uniform and mode == "subroll":
        # Fast path for the UNIFORM k-tiles-per-group regime (uk=1 is
        # the maxdeg ≤ 8 low-degree unstructured class; uk>1 is the
        # zero-padded repack of _maybe_uniform_k): no group_ptr lookups,
        # no fori_loop, fully static schedule — the measured non-gather
        # bookkeeping was ~2/3 of the per-tile cost.
        uk = int(uniform)
        for g in range(_GPB):
            sub = win2[par, g * _SUB:(g + 1) * _SUB]
            acc = None
            li0 = None
            for t in range(uk):
                jloc = g * uk + t
                if capp:
                    word = ibuf[par, jloc >> 1]
                    li = (word >> ((jloc & 1) * 16)) & 0xFFFF
                else:
                    li = ibuf[par, jloc]
                if li0 is None:
                    li0 = li
                gathered = _gather_tile(sub, li, wr, "subroll", sid)
                term = vbuf[par, jloc] * gathered
                acc = term if acc is None else acc + term
            if seg:
                # Lane-compacted pack: lanes are ROW SEGMENTS (a row of
                # degree d occupies ceil(d/8) adjacent lanes). Segmented
                # SUFFIX sum by doubling: after step 2^k, lane l holds
                # Σ x[l .. min(l + 2^k − 1, segment end)] — the HEAD
                # lane of each segment ends with the full row sum, which
                # the compaction kernel (_seg_compact_call) picks up.
                # The same-segment decision for step k is PRECOMPUTED at
                # pack time as bit 17+k of lidx (all sublanes of a lane
                # agree; bits 0..9 are the gather index, 10..16 the seg
                # id for the XLA reference path — both harmless to the
                # gather, whose q/jd extraction masks to 3 bits), so the
                # hot loop is one lane-roll + one bit-test + one masked
                # add per step on the native (8, 128) layout — the
                # segid-roll/compare variant measured +4.1 ms and a
                # (1, 128) variant relayouts (14.4 vs ~5 ms) at 10M.
                for st in range(seg):
                    sh = 1 << st
                    acc_s = pltpu.roll(acc, _LANES - sh, 1)
                    ok = (li0 & (1 << (17 + st))) > 0
                    acc = acc + jnp.where(ok, acc_s, 0)
            out_ref[g, :] = jnp.sum(acc, axis=0)
        return

    tbase = group_ptr_ref[b * _GPB]
    win = None if mode in ("chunked", "subroll") else win2[par]
    for g in range(_GPB):
        t0 = group_ptr_ref[b * _GPB + g] - tbase
        nt = group_ptr_ref[b * _GPB + g + 1] - tbase - t0

        def body(t, acc):
            if capp:
                jloc = t0 + t
                word = ibuf[par, jloc >> 1]
                li = (word >> ((jloc & 1) * 16)) & 0xFFFF
            else:
                li = ibuf[par, t0 + t]
            if mode == "chunked":
                # Tiles are chunk-pure: every slot (padded included)
                # carries the tile's slab id in bits 13+, so any
                # reduction recovers it; gather from that one slab.
                cid = jnp.max(li) >> 13
                slab = win2[par, pl.ds(cid * wr, wr)]
                gathered = _gather_tile(slab, li & 0x1FFF, wr, "roll",
                                        sid)
            elif mode == "subroll":
                # this group's subwindow sits in its own aligned slot
                sub = win2[par, pl.ds(g * _SUB, _SUB)]
                gathered = _gather_tile(sub, li, wr, "subroll", sid)
            else:
                gathered = _gather_tile(win, li, wr, mode, sid)
            return acc + vbuf[par, t0 + t] * gathered

        # (A 2× manual unroll with a clamped+masked odd tail was
        # measured at 13.3 ms vs this loop's 10.6 ms at 10M rows —
        # the pair's extra masked tile and select outweigh the loop
        # bookkeeping; the fixed per-tile cost is in the gather
        # sequence itself, not the back-edge.)
        acc = lax.fori_loop(0, nt, body,
                            jnp.zeros((_SUB, _LANES), out_ref.dtype))
        out_ref[g, :] = jnp.sum(acc, axis=0)


def _ref_group_rows(data: SellData, x_pad):
    """Pure-XLA per-group row results (G, 128) given the FULL padded x.
    Shared by ``sell_spmv_ref`` and the bucketed reference path (whose
    per-bucket SellData index into the full vector)."""
    G = data.group_ptr.shape[0] - 1
    T = data.vals.shape[0]
    tile_group = jnp.searchsorted(data.group_ptr[1:], jnp.arange(T),
                                  side="right")
    tile_group = jnp.minimum(tile_group, G - 1)      # trailing pad tiles
    if data.mode == "chunked":
        # per-slot slab id rides bits 13+; win_row is (B, chunks).
        wr2 = data.win_row.reshape(-1, data.chunks)
        blk = jnp.minimum(tile_group // _GPB, wr2.shape[0] - 1)
        ws = wr2[blk[:, None, None], data.lidx >> 13] * _LANES
        gidx = (data.lidx & 0x1FFF) + ws
    elif data.mode == "subroll":
        # win_row is per-GROUP: indices are group-subwindow-local
        ws = data.win_row[tile_group] * _LANES
        gidx = data.lidx + ws[:, None, None]
    else:
        ws = data.win_row[jnp.minimum(tile_group // _GPB,
                                      data.win_row.shape[0] - 1)] * _LANES
        # lidx is the block-window-local element index in BOTH packings
        # (residue only constrains WHICH sublane a slot uses).
        gidx = data.lidx + ws[:, None, None]
    gx = x_pad[gidx]
    contrib = jnp.sum(data.vals * gx, axis=1)
    return jax.ops.segment_sum(contrib, tile_group, num_segments=G)


@jax.jit
def sell_spmv_ref(data: SellData, x):
    """Pure-XLA reference/fallback path: identical math, any platform.
    Operates on UNPACKED indices (call before ``pack_index_pairs``)."""
    if data.capp:
        raise ValueError("sell_spmv_ref needs unpacked indices; keep the "
                         "pre-pack_index_pairs SellData for reference runs")
    n = data.n
    G = data.group_ptr.shape[0] - 1
    x_pad = jnp.pad(x, (0, G * _LANES - n + data.win_rows * _LANES))
    y = _ref_group_rows(data, x_pad)
    return y.reshape(-1)[:n]


def _sell_call(data: SellData, x2, *, interpret: bool = False):
    """Launch the Pallas kernel over a prepared padded x2 (already
    reshaped to (rows, 128)); returns the (B·8, 128) per-group row
    results (trailing phantom groups up to the block boundary are
    zero). Shared by ``sell_spmv`` and the bucketed dispatcher, whose
    per-bucket SellData index into the FULL padded x."""
    G = data.group_ptr.shape[0] - 1
    subroll = data.mode == "subroll"
    B = -(-G // _GPB) if subroll else data.win_row.shape[0]
    x = x2  # dtype carrier for the specs below

    G8 = B
    gp = data.group_ptr
    need = G8 * _GPB + 1
    if gp.shape[0] < need:
        gp = jnp.concatenate([gp, jnp.full((need - gp.shape[0],), gp[-1],
                                           jnp.int32)])
    wrow = data.win_row.reshape(-1)
    if subroll and wrow.shape[0] < B * _GPB:
        wrow = jnp.concatenate([wrow, jnp.zeros((B * _GPB
                                                 - wrow.shape[0],),
                                                jnp.int32)])

    nc = data.chunks
    out = pl.pallas_call(
        functools.partial(_sell_kernel, wr=data.win_rows, cap=data.cap,
                          mode=data.mode, nblocks=B, capp=data.capp,
                          nc=nc, uniform=data.uk, seg=data.seg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),   # vals (HBM)
                pl.BlockSpec(memory_space=pltpu.ANY),   # lidx (HBM)
                pl.BlockSpec(memory_space=pltpu.ANY),   # x2   (HBM)
            ],
            out_specs=pl.BlockSpec((_GPB, _LANES), lambda b, *_: (b, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, _GPB * _SUB if subroll
                            else nc * data.win_rows, _LANES), x.dtype),
                pltpu.VMEM((2, data.cap, _SUB, _LANES), data.vals.dtype),
                pltpu.VMEM((2, data.capp or data.cap, _SUB, _LANES),
                           jnp.int32),
                pltpu.SemaphoreType.DMA(
                    (2 * ((_GPB if subroll else nc) + 2),)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B * _GPB, _LANES), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * data.vals.shape[0] * _SUB * _LANES,
            bytes_accessed=(data.vals.size * data.vals.dtype.itemsize
                            + data.lidx.size * 4
                            + 2 * data.n * x.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(gp, wrow, data.pptr, data.vals, data.lidx, x2)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def sell_spmv(data: SellData, x, *, interpret: bool = False):
    """y = A @ x for a SELL-window packed matrix (see module docstring)."""
    n = data.n
    G = data.group_ptr.shape[0] - 1
    n_pad = G * _LANES
    W = data.win_rows * _LANES
    x2 = jnp.pad(x, (0, n_pad - n + W)).reshape(-1, _LANES)
    out = _sell_call(data, x2, interpret=interpret)
    return out.reshape(-1)[:n]


class SellBucketed:
    """Degree-bucketed SELL-window pack (round 3, STATUS gap #1).

    Mixed-degree matrices defeat the single uniform-k static schedule:
    padding EVERY 128-row group to k = max tiles/group costs k·G tile
    traffic, so ``_maybe_uniform_k`` bails past 2× padding and the
    kernel falls back to the ~72 GB/s dynamic path (group_ptr lookups +
    ``fori_loop`` carry are the measured ~2/3 of per-tile cost,
    BENCHMARKS.md). In subroll mode each 128-row group carries its OWN
    window start, so groups are freely reorderable: this container
    sorts groups by their tile count k, launches the fully static
    uniform-k kernel once per class present (k ≤ 8; ZERO padding within
    a class), routes k > 8 groups to one dynamic-schedule residual
    bucket, and reassembles y with a single group-granular gather
    (a 40 MB row move at 10M rows — noise next to the tile streams).

    buckets:   per-class SellData, each over its own rows but indexing
               the FULL x (win_row stays absolute).
    group_src: (G,) int32 — concat-output row block (128-row group)
               holding original group g (inverse of the class sort).

    Reference context: the SpMV is THE device kernel of the Krylov
    stack (reference src/arnoldi.jl:182); SELL-C-σ-style degree sorting
    is the standard fix for mixed-degree ELL storage — here it sorts
    GROUPS (not rows), which preserves every per-group subwindow.
    """

    def __init__(self, buckets, group_src, n, nnz, win_rows=_SUB * 2):
        self.buckets = tuple(buckets)
        self.group_src = group_src
        self.n = int(n)
        self.nnz = int(nnz)
        self.win_rows = int(win_rows)

    @property
    def vals_dtype(self):
        return self.buckets[0].vals.dtype

    def tree_flatten(self):
        return ((self.buckets, self.group_src),
                (self.n, self.nnz, self.win_rows))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    def save(self, path: str) -> None:
        """Persist all buckets + the group permutation in one npz."""
        arrs = {"group_src": np.asarray(self.group_src),
                "meta": np.asarray([self.n, self.nnz, self.win_rows,
                                    len(self.buckets)], np.int64)}
        for i, b in enumerate(self.buckets):
            arrs[f"b{i}_vals"] = np.asarray(b.vals)
            arrs[f"b{i}_lidx"] = np.asarray(b.lidx)
            arrs[f"b{i}_group_ptr"] = np.asarray(b.group_ptr)
            arrs[f"b{i}_win_row"] = np.asarray(b.win_row)
            arrs[f"b{i}_pptr"] = np.asarray(b.pptr)
            arrs[f"b{i}_meta"] = np.asarray(
                [b.n, b.nnz, b.win_rows, b.cap, b.capp, b.chunks, b.uk],
                np.int64)
        np.savez(path, **arrs)

    @classmethod
    def load(cls, path: str) -> "SellBucketed":
        import os
        if not os.path.exists(path) and not path.endswith(".npz"):
            path = path + ".npz"
        z = np.load(path, allow_pickle=False)
        n, nnz, win_rows, nb = [int(v) for v in z["meta"]]
        buckets = []
        for i in range(nb):
            bn, bnnz, bwr, cap, capp, chunks, uk = [
                int(v) for v in z[f"b{i}_meta"]]
            buckets.append(SellData(
                jnp.asarray(z[f"b{i}_vals"]), jnp.asarray(z[f"b{i}_lidx"]),
                jnp.asarray(z[f"b{i}_group_ptr"]),
                jnp.asarray(z[f"b{i}_win_row"]), bn, bnnz,
                win_rows=bwr, mode="subroll", cap=cap,
                pptr=jnp.asarray(z[f"b{i}_pptr"]), capp=capp,
                chunks=chunks, uniform=uk))
        return cls(buckets, jnp.asarray(z["group_src"]), n, nnz,
                   win_rows=win_rows)


jax.tree_util.register_pytree_node(
    SellBucketed,
    lambda s: s.tree_flatten(),
    lambda aux, ch: SellBucketed(ch[0], ch[1], *aux),
)


def bucket_sell(base: SellData, kmax: int = _UK_MAX) -> SellBucketed:
    """Split a dynamic subroll SellData into per-degree-class uniform-k
    buckets (class docstring). Host-side; call once at pack time."""
    if base.mode != "subroll":
        raise ValueError(
            "bucketed packing requires subroll mode (per-group windows); "
            f"this matrix packed as '{base.mode}' — RCM-permute for "
            "locality or use roll/chunked/block-ELL instead")
    if base.capp:
        raise ValueError("bucket before pack_index_pairs")
    gp = np.asarray(base.group_ptr, np.int64)
    vals = np.asarray(base.vals)
    lidx = np.asarray(base.lidx)
    wrow = np.asarray(base.win_row).reshape(-1)
    G = len(gp) - 1
    v = np.diff(gp)
    pos = np.zeros(G, np.int64)
    buckets = []
    off = 0
    for k in (int(kk) for kk in np.unique(v) if kk <= kmax):
        gs = np.flatnonzero(v == k)
        Gc = len(gs)
        Bc = -(-Gc // _GPB)
        cap = _GPB * k
        tiles = (gp[gs][:, None] + np.arange(k)).reshape(-1)
        va = np.zeros((Gc * k + cap,) + vals.shape[1:], vals.dtype)
        li = np.zeros((Gc * k + cap,) + lidx.shape[1:], lidx.dtype)
        va[:Gc * k] = vals[tiles]
        li[:Gc * k] = lidx[tiles]
        gpc = (np.arange(Gc + 1, dtype=np.int64) * k).astype(np.int32)
        buckets.append(SellData(
            jnp.asarray(va), jnp.asarray(li), jnp.asarray(gpc),
            jnp.asarray(wrow[gs]), Gc * _LANES,
            int(np.count_nonzero(va)), win_rows=base.win_rows,
            mode="subroll", cap=cap, uniform=k))
        pos[gs] = off + np.arange(Gc)
        off += Bc * _GPB
    dyn = np.flatnonzero(v > kmax)
    if len(dyn):
        vd = v[dyn]
        Gd = len(dyn)
        Bd = -(-Gd // _GPB)
        gpd = np.concatenate([[0], np.cumsum(vd)])
        Td = int(gpd[-1])
        src = (np.repeat(gp[dyn], vd)
               + (np.arange(Td) - np.repeat(gpd[:-1], vd)))
        gp_blk = gpd[np.minimum(np.arange(Bd + 1) * _GPB, Gd)]
        cap = max(int(np.max(np.diff(gp_blk))), 1)
        va = np.zeros((Td + cap,) + vals.shape[1:], vals.dtype)
        li = np.zeros((Td + cap,) + lidx.shape[1:], lidx.dtype)
        va[:Td] = vals[src]
        li[:Td] = lidx[src]
        buckets.append(SellData(
            jnp.asarray(va), jnp.asarray(li),
            jnp.asarray(gpd.astype(np.int32)), jnp.asarray(wrow[dyn]),
            Gd * _LANES, int(np.count_nonzero(va)),
            win_rows=base.win_rows, mode="subroll", cap=cap, uniform=0))
        pos[dyn] = off + np.arange(Gd)
    return SellBucketed(buckets, jnp.asarray(pos.astype(np.int32)),
                        base.n, base.nnz, win_rows=base.win_rows)


def sell_pack_bucketed(rows_cols_vals, n: int, dtype=np.float32,
                       window: int = 2048,
                       kmax: int = _UK_MAX) -> SellBucketed:
    """Pack COO into the degree-bucketed SELL form (``SellBucketed``).
    Requires subroll locality (every 128-row group's column span inside
    an aligned 1024 subwindow — RCM-permute first if needed)."""
    base = sell_pack(rows_cols_vals, n, dtype=dtype, window=window,
                     mode="subroll", uniform_k=False)
    return bucket_sell(base, kmax=kmax)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sell_spmv_bucketed(data: SellBucketed, x, *, interpret: bool = False):
    """y = A @ x for a degree-bucketed SELL pack: one static uniform-k
    kernel launch per degree class + one group-granular regather."""
    n = data.n
    G = data.group_src.shape[0]
    W = data.win_rows * _LANES
    x2 = jnp.pad(x, (0, G * _LANES - n + W)).reshape(-1, _LANES)
    outs = [_sell_call(b, x2, interpret=interpret) for b in data.buckets]
    ys = jnp.concatenate(outs, axis=0)
    return ys[data.group_src].reshape(-1)[:n]


@jax.jit
def sell_spmv_bucketed_ref(data: SellBucketed, x):
    """Pure-XLA reference path for the bucketed pack (any platform;
    unpacked indices — call before ``pack_index_pairs``)."""
    n = data.n
    G = data.group_src.shape[0]
    x_pad = jnp.pad(x, (0, G * _LANES - n + data.win_rows * _LANES))
    outs = []
    for b in data.buckets:
        if b.capp:
            raise ValueError("bucketed ref path needs unpacked indices")
        Gc = b.group_ptr.shape[0] - 1
        Bc = -(-Gc // _GPB)
        rows = _ref_group_rows(b, x_pad)
        outs.append(jnp.pad(rows, ((0, Bc * _GPB - Gc), (0, 0))))
    ys = jnp.concatenate(outs, axis=0)
    return ys[data.group_src].reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Lane-compacted ("segmented") SELL — SCATTERED-degree matrices at the
# uniform-k=1 static rate (VERDICT r3 #3).
#
# Degree bucketing (SellBucketed) needs the degree classes to be
# CLUSTERED in the row order: with scattered high-degree rows every
# 128-row group contains one, all groups land in the top class, and the
# per-slot padding (or the dynamic-path bookkeeping) eats the rate. A
# degree-sorting row permutation cannot fix it either: 128 same-class
# rows of a 5%-density class span ~2500 rows of a banded matrix — far
# outside the kernel's 1024-column x-gather window, which is a hard
# VPU-gather invariant.
#
# This pack dissolves the row↔lane identity instead: a row of degree d
# occupies ceil(d/8) ADJACENT LANES ("row segment") of one (8, 128)
# tile, so EVERY group is exactly one tile (uniform k = 1, the fastest
# static schedule, zero slot padding beyond the ≤7 tail slots of each
# row) for ANY degree mix — scattered or clustered, up to 1024 nnz/row.
# Groups are plain 128-lane slices of the lane sequence (rows may
# straddle a group boundary), each with its own aligned x-subwindow
# (span = ~91 rows of the band — tighter than the row-per-lane pack).
# The per-row totals are reassembled by a SECOND small Pallas pass
# (_seg_compact_kernel) over the lane-sum array — an XLA element gather
# here measured 150 ms at 10M rows (the TPU has no scalar-gather path),
# and in-main-kernel segmented suffix-sums cost a lane-axis roll per
# doubling step per tile (+2 ms/step at 78k tiles). The compaction runs
# on ~8·avg_seg× fewer tiles, so it absorbs the segment logic almost
# for free: per 1024 output rows, eight per-sublane (D, 128) window
# DMAs + one packed index tile; DIRECT mode (segments ≤ 8 lanes, i.e.
# degree ≤ 64) sums each row's consecutive lane sums right there
# (rows may straddle any boundary — lanes are globally contiguous);
# longer segments fall back to in-kernel doubling + two-head pickup.
#
# Measured (v5e, 10M rows, band 700, degrees 6/20/40 SHUFFLED):
#   dynamic subroll 12.8 ms (63 GB/s) | bucketed 10.4 (78) |
#   seg 8.08 ms (100 GB/s effective-CSR, 11.3 Gnnz/s) — and the same
#   8.2 ms for the clustered layout (degree-layout-blind).
# Container guidance: CLUSTERED degree mixes → SellBucketed (4.9 ms:
# zero slot padding per class beats seg's 1.4× lane inflation);
# uniform maxdeg ≤ 8 → plain uniform pack (3.9 ms); SCATTERED mixes /
# anything the bucketed split degenerates on → this pack.
# ---------------------------------------------------------------------------


class SellSeg:
    """Lane-compacted SELL pack (see banner above).

    base:  SellData (mode="subroll", uk=1, seg=doubling steps) whose
           lanes are row segments.
    h1/h2: (n,) int32 flat lane-sum positions of each row's head lane
           and its straddle-continuation head (h2 = h1's group-boundary
           continuation, or h1 itself when unused — the flag lives in
           ``cidx``); used by the pure-XLA reference path.
    cws:   (nblk,) int32 compaction window starts (128-element rows of
           the lane-sum array) per 1024-output block.
    cidx:  (nblk, 8, 128) int32 packed compaction indices:
           rel1 | rel2 << 13 | straddle << 26 (window-relative).
    cwr:   static compaction window size in 128-element rows.
    """

    def __init__(self, base: SellData, h1, h2, cws, cidx, cwr: int,
                 lmax: int = 0):
        self.base = base
        self.h1 = h1
        self.h2 = h2
        self.cws = cws
        self.cidx = cidx
        self.cwr = int(cwr)
        self.lmax = int(lmax)    # >0: DIRECT compaction (sum lmax
                                 # consecutive lane sums per row);
                                 # 0: two-head mode (doubling pack)

    @property
    def n(self):
        return self.base.n

    @property
    def nnz(self):
        return self.base.nnz

    def tree_flatten(self):
        return ((self.base, self.h1, self.h2, self.cws, self.cidx),
                (self.cwr, self.lmax))

    def save(self, path: str) -> None:
        import os
        self.base.save(path)
        p = path if os.path.exists(path) else (
            path if path.endswith(".npz") else path + ".npz")
        with np.load(p, allow_pickle=False) as z:
            arrs = dict(z)
        arrs["h1"] = np.asarray(self.h1)
        arrs["h2"] = np.asarray(self.h2)
        arrs["cws"] = np.asarray(self.cws)
        arrs["cidx"] = np.asarray(self.cidx)
        arrs["cmeta"] = np.asarray([self.cwr, self.lmax], np.int64)
        np.savez(p, **arrs)

    @classmethod
    def load(cls, path: str) -> "SellSeg":
        import os
        p = path if os.path.exists(path) else (
            path if path.endswith(".npz") else path + ".npz")
        base = SellData.load(p)
        with np.load(p, allow_pickle=False) as z:
            h1, h2 = jnp.asarray(z["h1"]), jnp.asarray(z["h2"])
            cws, cidx = jnp.asarray(z["cws"]), jnp.asarray(z["cidx"])
            cm = [int(v) for v in z["cmeta"]]
            cwr = cm[0]
            lmax = cm[1] if len(cm) > 1 else 0
        return cls(base, h1, h2, cws, cidx, cwr, lmax)


jax.tree_util.register_pytree_node(
    SellSeg,
    lambda s: s.tree_flatten(),
    lambda aux, ch: SellSeg(*ch, *aux),
)


def sell_pack_seg(rows_cols_vals, n: int, dtype=np.float32) -> SellSeg:
    """Pack COO into the lane-compacted SELL form (class banner).

    Host-side, fully vectorized numpy. Raises when a 128-lane group's
    column span exceeds the 1024 gather window (bandwidth ≳ 900 after
    RCM → use roll/chunked/banded containers) or a row has > 1024 nnz.
    """
    import scipy.sparse as sp

    rows, cols, vals = rows_cols_vals
    A = sp.coo_matrix((np.asarray(vals, dtype),
                       (np.asarray(rows), np.asarray(cols))),
                      shape=(n, n)).tocsr()
    A.sort_indices()
    deg = np.diff(A.indptr).astype(np.int64)
    if deg.max(initial=0) > _W:
        raise ValueError(
            f"seg pack: max row degree {int(deg.max())} exceeds {_W} "
            "(a row segment must fit one 128-lane group twice over)")
    k = np.maximum(1, -(-deg // _SUB))          # lanes per row
    lane_start = np.concatenate([[0], np.cumsum(k)])
    L = int(lane_start[-1])
    G = -(-L // _LANES) + 1          # +1: guaranteed all-pad dummy group
    B = -(-G // _GPB)
    T = B * _GPB                      # uniform k=1: tiles == groups

    nnz = int(A.nnz)
    off = np.arange(nnz, dtype=np.int64) - np.repeat(A.indptr[:-1].astype(
        np.int64), deg)
    lane = np.repeat(lane_start[:-1], deg) + off // _SUB
    sub = (off % _SUB).astype(np.int64)
    g_of = lane // _LANES
    l_of = lane % _LANES

    cmin = np.full(G, np.iinfo(np.int64).max)
    cmax = np.full(G, -1, np.int64)
    idx64 = A.indices.astype(np.int64)
    np.minimum.at(cmin, g_of, idx64)
    np.maximum.at(cmax, g_of, idx64)
    emp = cmax < 0
    cmin[emp] = 0
    cmax[emp] = 0
    ws = cmin // _LANES
    if np.any(cmax >= ws * _LANES + _W):
        raise ValueError(
            "seg pack: a 128-lane group's column span exceeds the 1024 "
            "gather window — RCM-permute first, or use the roll/chunked "
            "modes / banded containers for bandwidth over ~900")

    max_seg = int(np.max(np.minimum(k, _LANES))) if n else 1
    if max_seg <= _SEG_DIRECT_MAX:
        # DIRECT mode: the main kernel emits raw lane sums (seg = 0 —
        # the pure uniform-k=1 fast path) and the compaction kernel sums
        # each row's ≤ Lmax consecutive lane sums itself: it runs on
        # ~avg_seg·8× fewer tiles, so Lmax·D gathers there cost a few
        # percent of one in-kernel doubling step (a lane-axis roll per
        # tile measured +2 ms at 78k tiles). Rows may straddle ANY
        # boundary — lanes are globally contiguous.
        steps = 0
        bits2d = None
    else:
        # DOUBLING mode (segments up to 128 lanes): in-kernel segmented
        # suffix-sum; head positions compacted afterwards.
        # seg id = the row's first lane within this group (monotone +
        # unique per group); pad lanes take their own lane index.
        gl = np.arange(G * _LANES, dtype=np.int64) % _LANES
        first_lane = np.repeat(lane_start[:-1], k)          # (L,)
        grp_start = (np.arange(L, dtype=np.int64) // _LANES) * _LANES
        seg_full = gl.copy()
        seg_full[:L] = np.maximum(first_lane, grp_start) % _LANES
        ms = min(max_seg, _LANES)
        steps = 0
        while (1 << steps) < ms:
            steps += 1
        # per-step same-segment masks (kernel bit 17+st):
        # ok[l] = (l + 2^st < 128) & (seg[l] == seg[l + 2^st])
        seg2d = seg_full.reshape(G, _LANES)
        bits = np.zeros((G, _LANES), np.int64)
        for st in range(steps):
            sh = 1 << st
            ok = np.zeros((G, _LANES), bool)
            ok[:, :_LANES - sh] = seg2d[:, :_LANES - sh] == seg2d[:, sh:]
            bits |= ok.astype(np.int64) << (17 + st)
        bits2d = (seg2d << 10) | bits

    li_all = np.zeros((T, _SUB, _LANES), np.int32)
    if bits2d is not None:
        li_all[:G] = np.broadcast_to(
            bits2d[:, None, :], (G, _SUB, _LANES)).astype(np.int32)
    va = np.zeros((T, _SUB, _LANES), dtype)
    widx = (idx64 - ws[g_of] * _LANES).astype(np.int32)
    li_all[g_of, sub, l_of] |= widx
    va[g_of, sub, l_of] = A.data

    # head positions: lane-sum flat index == global lane index
    h1 = lane_start[:-1]
    last_lane = lane_start[1:] - 1
    straddle = (h1 // _LANES) != (last_lane // _LANES)
    h2 = np.where(straddle, (h1 // _LANES + 1) * _LANES, h1)

    # --- compaction plan: PER-SUBLANE lane-sum windows + packed
    # (lane, row-delta) indices (banner). 128 consecutive outputs span
    # ~128·avg_seg lane-sum positions, so each sublane needs only
    # D = ceil(span/128)+1 window rows — D lane-gathers + selects per
    # candidate instead of a full-window roll pass.
    nblk = max(1, -(-n // (_SUB * _LANES)))
    npad = nblk * _SUB * _LANES
    h1p = np.full(npad, h1[-1] if n else 0, np.int64)
    h1p[:n] = h1
    sg = np.arange(npad) // _LANES          # global sublane index
    lo = np.full(nblk * _SUB, np.iinfo(np.int64).max)
    np.minimum.at(lo, sg, h1p)
    cws = lo // _LANES
    rel1 = h1p - cws[sg] * _LANES
    if steps == 0:
        # DIRECT mode: rel0 | segment length (lanes) in bits 10..13;
        # the window must also cover each row's LAST lane
        lmax = max_seg
        lenp = np.ones(npad, np.int64)
        lenp[:n] = k
        rel_last = rel1 + lenp - 1
        D = int(rel_last.max()) // _LANES + 1
        cidx = (rel1 | (lenp << 10)) \
            .reshape(nblk, _SUB, _LANES).astype(np.int32)
    else:
        # DOUBLING mode: head + straddle-continuation head + flag
        lmax = 0
        h2p = h1p.copy()
        h2p[:n] = h2
        flagp = np.zeros(npad, bool)
        flagp[:n] = straddle
        rel2 = h2p - cws[sg] * _LANES
        D = int(max(rel1.max(), rel2.max())) // _LANES + 1
        cidx = (rel1 | (rel2 << 10) | (flagp.astype(np.int64) << 20)) \
            .reshape(nblk, _SUB, _LANES).astype(np.int32)
    if D > 8:
        raise ValueError(
            f"seg pack: 128 consecutive rows span {D * _LANES} lane-sum "
            "positions — average degree too high for the compaction "
            "window; use the bucketed/dynamic modes")
    cwr = D

    # the compaction window DMA reads lane-sum rows [cws, cws + cwr):
    # grow the pack with empty trailing groups so the main kernel's
    # output (whose row count _sell_call derives from group_ptr) covers
    # every window
    B = max(B, -(-int(cws.max() + cwr) // _GPB))
    T2 = B * _GPB
    if T2 > T:
        va = np.concatenate(
            [va, np.zeros((T2 - T,) + va.shape[1:], va.dtype)])
        li_all = np.concatenate(
            [li_all, np.zeros((T2 - T,) + li_all.shape[1:],
                              li_all.dtype)])
    G = T2                            # empty phantom groups included

    wrow = np.zeros(B * _GPB, np.int32)
    wrow[:len(ws)] = ws.astype(np.int32)
    gp = (np.arange(G + 1, dtype=np.int64)).astype(np.int32)
    base = SellData(jnp.asarray(va), jnp.asarray(li_all),
                    jnp.asarray(gp), jnp.asarray(wrow), n, nnz,
                    win_rows=_SUB * 2, mode="subroll", cap=_GPB,
                    uniform=1, seg=steps)
    return SellSeg(base, jnp.asarray(h1.astype(np.int32)),
                   jnp.asarray(h2.astype(np.int32)),
                   jnp.asarray(cws.astype(np.int32)), jnp.asarray(cidx),
                   cwr, lmax)


def _seg_compact_kernel(cws_ref, cidx_hbm, src_hbm, out_ref, win2, ibuf,
                        sems, *, D: int, nblocks: int, lmax: int):
    """Compaction (banner): per 1024 output rows, eight PER-SUBLANE
    lane-sum windows of D rows + one packed index tile. DIRECT mode
    (lmax > 0): sum each row's ≤ lmax consecutive lane sums (the main
    kernel emitted RAW lane sums). Head mode (lmax == 0): pick the two
    suffix-summed head lanes. Every candidate is one of D
    lane-gather+select reads (positions within a sublane span at most
    D·128)."""
    b = pl.program_id(0)
    par = b % 2

    def dmas(p, blk):
        cps = tuple(
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(cws_ref[blk * _SUB + s], D)],
                win2.at[p, s], sems.at[p * (_SUB + 1) + s])
            for s in range(_SUB))
        return cps + (pltpu.make_async_copy(
            cidx_hbm.at[blk], ibuf.at[p],
            sems.at[p * (_SUB + 1) + _SUB]),)

    @pl.when(b == 0)
    def _():
        for cp in dmas(0, 0):
            cp.start()

    @pl.when(b + 1 < nblocks)
    def _():
        for cp in dmas((b + 1) % 2, b + 1):
            cp.start()

    for cp in dmas(par, b):
        cp.wait()
    packed = ibuf[par]

    def gather(rel):
        r, dsel = rel & 0x7F, rel >> 7
        g = jnp.zeros((_SUB, _LANES), win2.dtype)
        for d in range(D):
            Wd = win2[par, :, d, :]            # (8, 128): row d per sublane
            Gd = jnp.take_along_axis(Wd, r, axis=1,
                                     mode="promise_in_bounds")
            g = jnp.where(dsel == d, Gd, g)
        return g

    if lmax:
        rel0 = packed & 0x3FF
        ln = packed >> 10
        acc = gather(rel0)                     # j = 0 always in range
        for j in range(1, lmax):
            acc = acc + jnp.where(j < ln, gather(rel0 + j), 0)
        out_ref[...] = acc
    else:
        g1 = gather(packed & 0x3FF)
        g2 = gather((packed >> 10) & 0x3FF)
        out_ref[...] = g1 + jnp.where((packed >> 20) > 0, g2, 0)


def _seg_compact_call(data: "SellSeg", src, *, interpret: bool = False):
    """Run the compaction pass over the (rows, 128) lane-sum array."""
    nblk = data.cidx.shape[0]
    D = data.cwr
    out = pl.pallas_call(
        functools.partial(_seg_compact_kernel, D=D, nblocks=nblk,
                          lmax=data.lmax),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),    # cidx (HBM)
                pl.BlockSpec(memory_space=pltpu.ANY),    # lane sums
            ],
            out_specs=pl.BlockSpec((_SUB, _LANES), lambda b, *_: (b, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, _SUB, D, _LANES), src.dtype),
                pltpu.VMEM((2, _SUB, _LANES), jnp.int32),
                pltpu.SemaphoreType.DMA((2 * (_SUB + 1),)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nblk * _SUB, _LANES), src.dtype),
        interpret=interpret,
    )(data.cws, data.cidx, src)
    return out.reshape(-1)[:data.n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def sell_spmv_seg(data: SellSeg, x, *, interpret: bool = False):
    """y = A @ x for a lane-compacted SELL pack: ONE static uniform-k=1
    kernel pass + the windowed head-compaction pass."""
    base = data.base
    n = base.n
    G = base.group_ptr.shape[0] - 1
    W = base.win_rows * _LANES
    x2 = jnp.pad(x, (0, G * _LANES - n + W)).reshape(-1, _LANES)
    out = _sell_call(base, x2, interpret=interpret)
    return _seg_compact_call(data, out, interpret=interpret)


@jax.jit
def sell_spmv_seg_ref(data: SellSeg, x):
    """Pure-XLA reference path (any platform): per-lane slot sums, a
    lane-axis segmented suffix-sum, then the same two-head gather."""
    base = data.base
    G = base.group_ptr.shape[0] - 1
    x_pad = jnp.pad(x, (0, G * _LANES - base.n + base.win_rows * _LANES))
    T = base.vals.shape[0]
    ws = jnp.concatenate([base.win_row.reshape(-1)[:G],
                          jnp.zeros((T - G,), jnp.int32)])
    gidx = (base.lidx & (_W - 1)) + (ws * _LANES)[:, None, None]
    lanesum = jnp.sum(base.vals * x_pad[gidx], axis=1)       # (T, 128)
    flat0 = lanesum.reshape(-1)
    if data.lmax:
        # DIRECT mode: sum each row's consecutive lane sums
        ln = data.cidx.reshape(-1)[:base.n] >> 10
        y = flat0[data.h1]
        for j in range(1, data.lmax):
            y = y + jnp.where(j < ln, flat0[jnp.minimum(
                data.h1 + j, flat0.shape[0] - 1)], 0)
        return y
    segid = (base.lidx[:, 0, :] >> 10) & (_LANES - 1)
    lane = jnp.arange(_LANES)[None, :]
    for st in range(base.seg):
        sh = 1 << st
        ok = (lane + sh < _LANES) & (segid == jnp.roll(segid, -sh, 1))
        lanesum = lanesum + jnp.where(ok, jnp.roll(lanesum, -sh, 1), 0)
    flat = lanesum.reshape(-1)
    straddle = (data.cidx.reshape(-1)[:base.n] >> 20) > 0
    return flat[data.h1] + jnp.where(straddle, flat[data.h2], 0)
