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

__all__ = ["blockell_spmv"]


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
