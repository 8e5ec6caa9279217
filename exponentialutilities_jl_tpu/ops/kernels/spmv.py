"""Pallas TPU SpMV kernels.

The per-chip speed-of-light SpMV is the headline native-kernel metric
(BASELINE.json). The reference has no SpMV of its own (it leans on Julia's
SparseArrays CSC, reference test/basictests.jl:670); this is new TPU-native
work, designed around the hardware rather than CSR semantics:

* **Block-ELL layout** (see ops/sparse.py): each block-row owns exactly
  ``w`` dense (br × bc) blocks. Uniform trip counts → a static grid; dense
  blocks → MXU contractions; bc = 128 puts x-slices on full lanes.
* **Scalar-prefetched indices**: the block-column index array rides in SMEM
  via ``PrefetchScalarGridSpec`` so each x-block load is a dynamic VMEM
  slice — no gather instruction exists on the VPU, and this sidesteps it.
* **x resident in VMEM**: the whole input vector is pinned in VMEM
  (reshaped (nbc, bc)); block-rows stream through the grid. For f32 this
  caps n at roughly 2M per kernel launch — beyond that the row-partitioned
  distributed path (parallel/ops.py) splits x across chips anyway.

A row-tiled variant processes ``rows_per_tile`` block-rows per grid step so
small ``br`` still fills the sublane dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["blockell_spmv"]


def _spmv_kernel(bcols_ref, blocks_ref, x_ref, out_ref, *, w: int, rpt: int):
    """One grid step: ``rpt`` block-rows, each with ``w`` dense blocks.

    blocks_ref: (rpt, w, br, bc) VMEM tile of this step's blocks.
    x_ref:      (nbc, bc) full input vector in VMEM.
    out_ref:    (rpt, br) output tile.
    """
    i = pl.program_id(0)
    br = blocks_ref.shape[2]
    bc = blocks_ref.shape[3]

    def row_body(r, _):
        def blk_body(k, acc):
            c = bcols_ref[i * rpt + r, k]
            xs = x_ref[c, :]                       # (bc,) dynamic VMEM row
            blk = blocks_ref[r, k]                 # (br, bc)
            return acc + jnp.dot(blk, xs.reshape(bc, 1),
                                 preferred_element_type=jnp.float32)
        acc = lax.fori_loop(0, w, blk_body,
                            jnp.zeros((br, 1), dtype=jnp.float32))
        out_ref[r, :] = acc[:, 0].astype(out_ref.dtype)
        return 0

    lax.fori_loop(0, rpt, row_body, 0)


@functools.partial(jax.jit, static_argnames=("rows_per_tile", "interpret"))
def blockell_spmv(blocks, bcols, x, *, rows_per_tile: int = 8,
                  interpret: bool = False):
    """y = A @ x for a block-ELL matrix (see BlockELLOperator).

    Args:
      blocks: (nbr, w, br, bc) dense blocks.
      bcols: (nbr, w) int32 block-column indices (scalar-prefetched).
      x: (n,) with n = nbr * br = nbc * bc.
    """
    nbr, w, br, bc = blocks.shape
    n = x.shape[0]
    nbc = n // bc
    rpt = min(rows_per_tile, nbr)
    while nbr % rpt:
        rpt -= 1
    x2 = x.reshape(nbc, bc)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr // rpt,),
        in_specs=[
            pl.BlockSpec((rpt, w, br, bc), lambda i, b: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full x
        ],
        out_specs=pl.BlockSpec((rpt, br), lambda i, b: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    flops = 2 * nbr * w * br * bc
    out = pl.pallas_call(
        functools.partial(_spmv_kernel, w=w, rpt=rpt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr, br), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + n * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bcols, blocks, x2)
    return out.reshape(n)
