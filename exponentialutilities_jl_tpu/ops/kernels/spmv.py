"""Pallas TPU SpMV kernels.

The per-chip speed-of-light SpMV is the headline native-kernel metric
(BASELINE.json). The reference has no SpMV of its own (it leans on Julia's
SparseArrays CSC, reference test/basictests.jl:670); this is new TPU-native
work, designed around the hardware rather than CSR semantics.

SpMV at ~1 flop/byte is bandwidth-bound: the kernel's job is to stream the
block values at full HBM→VMEM DMA rate and keep the compute on the VPU.

* **Block-ELL layout** (see ops/sparse.py): each block-row owns exactly
  ``w`` dense (br × bc) blocks. Uniform trip counts → a static grid whose
  block tiles are pipelined (double-buffered) by the Pallas grid machinery.
* **SMEM-blocked indices**: each grid step receives its (rows_per_tile, w)
  index slice in SMEM; x-block loads are dynamic VMEM row slices — the VPU
  has no gather, and XLA's gather lowering is catastrophically slow on TPU
  (measured ~1 GB/s for scalar ELL gathers on v5e).
* **Gather-then-reduce compute**: a short ``fori_loop`` copies the needed
  x rows into a VMEM scratch (rows_per_tile·w VPU row copies), then ONE
  vectorized multiply + axis-reduce produces the whole output tile — no
  per-block matvecs (tiny (8,128)@(128,1) MXU ops are latency-bound and
  were measured 5× slower than the XLA einsum; this formulation beats
  both).
* **x resident in VMEM**, reshaped (nbc, bc). For f32 this caps n at
  roughly 2M per kernel launch — beyond that the row-partitioned
  distributed path (parallel/ops.py) splits x across chips anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["blockell_spmv", "banded_spmv"]


def _spmv_kernel(bcols_ref, blocks_ref, x_ref, out_ref, xg_ref, sem, *,
                 w: int, rpt: int, dma_gather: bool):
    """One grid step: ``rpt`` block-rows, each with ``w`` dense blocks.

    bcols_ref:  (rpt, w) SMEM tile of block-column indices.
    blocks_ref: (rpt, w, br, bc) VMEM tile of this step's blocks.
    x_ref:      (nbc, bc) full input vector in VMEM.
    out_ref:    (rpt, br) output tile.
    xg_ref:     (rpt, w, bc) VMEM scratch for the gathered x rows.
    sem:        DMA semaphore shared by all gather copies.
    """
    bc = blocks_ref.shape[3]

    if dma_gather:
        # Queue every row copy on the DMA engines then drain. Measured
        # SLOWER than the VPU gather on v5e (per-start overhead dominates
        # 512-byte copies: 66 vs 116 GB/s) — kept as an option for parts
        # with larger bc where each copy amortizes better.
        def dma_at(i):
            r = i // w
            k = i % w
            return pltpu.make_async_copy(
                x_ref.at[bcols_ref[r, k]], xg_ref.at[r, k], sem)

        lax.fori_loop(0, rpt * w, lambda i, _: (dma_at(i).start(), 0)[1],
                      0, unroll=1)
        # Each wait consumes one completion signal from the shared DMA
        # semaphore (semaphore_wait does not accept DMA semaphores).
        lax.fori_loop(0, rpt * w, lambda i, _: (dma_at(i).wait(), 0)[1],
                      0, unroll=1)
    else:
        def gather(i, _):
            r = i // w
            k = i % w
            xg_ref[r, k, :] = x_ref[bcols_ref[r, k], :]
            return 0

        lax.fori_loop(0, rpt * w, gather, 0, unroll=True)

    # One vectorized multiply-reduce on the VPU: (rpt, w, br, bc) ⊙
    # (rpt, w, 1, bc) summed over (w, bc).
    prod = blocks_ref[:] * xg_ref[:].reshape(rpt, w, 1, bc)
    out_ref[:] = jnp.sum(prod, axis=(1, 3)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows_per_tile", "interpret",
                                             "dma_gather"))
def blockell_spmv(blocks, bcols, x, *, rows_per_tile: int = 128,
                  interpret: bool = False, dma_gather: bool = False):
    """y = A @ x for a block-ELL matrix (see BlockELLOperator).

    Args:
      blocks: (nbr, w, br, bc) dense blocks.
      bcols: (nbr, w) int32 block-column indices.
      x: (n,) with n = nbr * br = nbc * bc.
    """
    nbr, w, br, bc = blocks.shape
    n = x.shape[0]
    nbc = n // bc
    rpt = min(rows_per_tile, nbr)
    while nbr % rpt:
        rpt -= 1
    x2 = x.reshape(nbc, bc)

    flops = 2 * nbr * w * br * bc
    out = pl.pallas_call(
        functools.partial(_spmv_kernel, w=w, rpt=rpt,
                          dma_gather=dma_gather and not interpret),
        grid=(nbr // rpt,),
        in_specs=[
            pl.BlockSpec((rpt, w), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rpt, w, br, bc), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full x
        ],
        out_specs=pl.BlockSpec((rpt, br), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbr, br), x.dtype),
        scratch_shapes=[pltpu.VMEM((rpt, w, bc), x.dtype),
                        pltpu.SemaphoreType.DMA(())],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + n * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bcols, blocks, x2)
    return out.reshape(n)


def _banded_kernel(diags_ref, xe_ref, out_ref, xs2_ref, sems, *,
                   offsets, R: int, Hr: int, Wr: int):
    """One grid step: R·128 output rows of a diagonal-storage (stencil) SpMV,
    in the native (rows, 128) lane layout.

    A global shift by offset o decomposes as o = 128·q + r; the shifted
    vector is two static slices of the halo window concatenated on the lane
    axis — Mosaic-friendly 2-D ops (a flat 1-D formulation compiled into
    per-1024-tile scalar code and never finished compiling).

    The x-window is DOUBLE-BUFFERED across the sequential grid: step i
    issues step i+1's window DMA before computing, so the transfer hides
    behind the k-diagonal multiply-accumulate (the r1 version waited on a
    blocking per-step copy).

    diags_ref: (k, R, 128) VMEM tile of diagonal values.
    xe_ref:    (n_rows_pad, 128) padded input in HBM; rows
               [i·R, i·R + Wr) are DMA'd into xs2_ref[i % 2].
    out_ref:   (R, 128) output tile.
    """
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)

    def win_dma(par, step):
        return pltpu.make_async_copy(
            xe_ref.at[pl.ds(step * R, Wr)], xs2_ref.at[par], sems.at[par])

    @pl.when(i == 0)
    def _():
        win_dma(0, 0).start()

    @pl.when(i + 1 < nsteps)
    def _():
        win_dma((i + 1) % 2, i + 1).start()

    win_dma(i % 2, i).wait()
    xs_ref = xs2_ref.at[i % 2]

    h0 = Hr * 128
    acc = None
    for k, o in enumerate(offsets):
        q, r = divmod(h0 + o, 128)
        if r == 0:
            S = xs_ref[q:q + R, :]
        else:
            S = jnp.concatenate(
                [xs_ref[q:q + R, r:], xs_ref[q + 1:q + R + 1, :r]], axis=1)
        term = diags_ref[k] * S
        acc = term if acc is None else acc + term
    out_ref[:, :] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("offsets", "tile"))
def banded_spmv(diags, offsets, x, *, tile: int = 131072):
    """y = A @ x for diagonal storage (BandedOperator layout): one pass over
    the diagonal values at HBM streaming rate — the speed-of-light stencil
    SpMV. Boundary rows are exact because the input is zero-padded by the
    halo width (out-of-range reads hit the pad zeros).

    diags: (k, n) with diags[k, i] = A[i, i + offsets[k]].
    offsets: static tuple of ints. x: (n,).
    """
    k, n = diags.shape
    h = max((abs(o) for o in offsets), default=0)
    R = max(8, min(tile // 128, -(-n // 128)))
    T = R * 128
    n_pad = -(-n // T) * T
    Hr = -(-h // 128)
    # window rows: R + 2·Hr + 1 (the +1 covers the lane spill of positive
    # shifts), rounded to the f32 sublane tile (8).
    Wr = -(-(R + 2 * Hr + 1) // 8) * 8
    n_rows = n_pad // 128
    # xe rows: Hr left halo + data + enough right rows for the last window.
    right_rows = (n_rows + Wr - R) - (Hr + n_rows)
    xe = jnp.pad(x, (Hr * 128, (n_pad - n) + max(right_rows, 0) * 128))
    xe2 = xe.reshape(-1, 128)
    diags_p = jnp.pad(diags, ((0, 0), (0, n_pad - n))).reshape(k, -1, 128)

    out = pl.pallas_call(
        functools.partial(_banded_kernel, offsets=tuple(offsets), R=R,
                          Hr=Hr, Wr=Wr),
        grid=(n_pad // T,),
        in_specs=[
            pl.BlockSpec((k, R, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # padded x stays in HBM
        ],
        out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, 128), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, Wr, 128), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        cost_estimate=pl.CostEstimate(
            flops=2 * k * n,
            bytes_accessed=(k * n + 2 * n) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(diags_p, xe2)
    return out.reshape(n_pad)[:n]
