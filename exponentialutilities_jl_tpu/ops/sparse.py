"""TPU-native sparse operator containers: ELL, block-ELL (BSR), banded.

The reference outsources sparse matvecs entirely to Julia's
``SparseArrays.SparseMatrixCSC`` (used as an operator type in its tests,
reference: test/basictests.jl:670, test/gpu/gputests.jl:41-58). A CSC/CSR
scalar-indexed SpMV is the wrong shape for a TPU — variable-length rows
defeat XLA tiling and the MXU entirely. This module provides three
TPU-first containers, all of which satisfy the ``LinearOperator`` protocol
and hence plug into every Krylov-level API:

* ``SparseELLOperator`` — padded ELLPACK: every row holds exactly ``w``
  (column, value) slots, padded with zeros. The matvec is one gather +
  one multiply-reduce, fully vectorized by XLA. The right default for
  unstructured sparsity with bounded row degree.
* ``BlockELLOperator`` — blocked ELLPACK (the TPU analogue of BSR): dense
  (br × bc) blocks, a fixed number per block-row. The matvec is a batch of
  small dense GEMMs that land on the MXU; on TPU it runs as a Pallas
  kernel with scalar-prefetched block-column indices
  (ops/kernels/spmv.py), elsewhere as an einsum-of-gathered-blocks.
* ``BandedOperator`` — diagonal storage for stencil matrices (Laplacians,
  advection-diffusion): the matvec is shift-multiply-add on the VPU with
  **zero gathers**, and the shifts become nearest-neighbor ``ppermute``
  halo exchanges when row-partitioned over a mesh (parallel/ops.py).

Constructors for the standard test/benchmark operators (1-D/2-D/3-D
Laplacians, advection–diffusion) live in ``utils/testmatrices.py``.
"""

from __future__ import annotations

import dataclasses
from functools import reduce as functools_reduce
from typing import Optional

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from ..utils.linop import LinearOperator

__all__ = [
    "SparseELLOperator",
    "BlockELLOperator",
    "BandedOperator",
    "SellOperator",
    "SortedSellOperator",
    "ell_from_scipy",
    "blockell_from_scipy",
    "banded_from_scipy",
    "HybridOperator",
    "hybrid_from_scipy",
]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseELLOperator(LinearOperator):
    """Padded-ELLPACK sparse operator.

    data: (n, w) values, zero in padded slots.
    cols: (n, w) int32 column indices, 0 in padded slots (safe: value is 0).

    Performance note: the matvec is gather-based. XLA's gather lowering on
    TPU is very slow (~1 GB/s measured on v5e); on TPU prefer
    ``BlockELLOperator`` (Pallas kernel, 120 GB/s), ``BandedOperator``, or
    ``StencilOperator`` — use ELL on TPU only for genuinely unstructured
    sparsity at small n, or on CPU where the gather vectorizes fine.
    """

    data: jax.Array
    cols: jax.Array
    is_hermitian: bool = False

    @property
    def shape(self):
        n = self.data.shape[0]
        return (n, n)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0] * self.data.shape[1])

    def matvec(self, x):
        # One gather + one fused multiply-reduce; XLA vectorizes both.
        return jnp.sum(self.data * x[self.cols], axis=1)

    def opnorm_hint(self):
        return jnp.max(jnp.sum(jnp.abs(self.data), axis=1))

    def to_dense(self):
        n, w = self.data.shape
        A = jnp.zeros((n, n), dtype=self.dtype)
        rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, w))
        return A.at[rows, self.cols].add(self.data)

    def tree_flatten(self):
        return (self.data, self.cols), (self.is_hermitian,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, is_hermitian=aux[0])

    @classmethod
    def from_dense(cls, A, is_hermitian: bool = False) -> "SparseELLOperator":
        A = np.asarray(A)
        n = A.shape[0]
        nz = [np.nonzero(A[i])[0] for i in range(n)]
        w = max(1, max(len(z) for z in nz))
        data = np.zeros((n, w), dtype=A.dtype)
        cols = np.zeros((n, w), dtype=np.int32)
        for i, z in enumerate(nz):
            data[i, : len(z)] = A[i, z]
            cols[i, : len(z)] = z
        return cls(jnp.asarray(data), jnp.asarray(cols),
                   is_hermitian=is_hermitian)


def ell_from_scipy(A, is_hermitian: bool = False,
                   dtype=None) -> SparseELLOperator:
    """Convert a ``scipy.sparse`` matrix to padded ELL (native C++ packer
    when available — see native/)."""
    from ..native import csr_to_ell_arrays

    vals, cols = csr_to_ell_arrays(A, dtype=dtype)
    return SparseELLOperator(jnp.asarray(vals), jnp.asarray(cols),
                             is_hermitian=is_hermitian)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BlockELLOperator(LinearOperator):
    """Blocked-ELLPACK (BSR-style) operator with dense (br × bc) blocks.

    blocks: (nbr, w, br, bc) values; zero blocks in padded slots.
    bcols:  (nbr, w) int32 block-column indices; 0 in padded slots.

    The matvec gathers x as (nbc, bc) block slices and contracts each
    (br × bc) block on the MXU. On TPU backends the contraction runs as a
    Pallas kernel (ops/kernels/spmv.py) with the block-column indices
    scalar-prefetched so x-block loads are dynamic VMEM slices.
    """

    blocks: jax.Array
    bcols: jax.Array
    is_hermitian: bool = False
    use_pallas: bool = True

    @property
    def block_shape(self):
        return (self.blocks.shape[2], self.blocks.shape[3])

    @property
    def shape(self):
        n = self.blocks.shape[0] * self.blocks.shape[2]
        return (n, n)

    @property
    def dtype(self):
        return self.blocks.dtype

    @property
    def nnz(self) -> int:
        nbr, w, br, bc = self.blocks.shape
        return int(nbr * w * br * bc)

    def matvec(self, x):
        nbr, w, br, bc = self.blocks.shape
        if self.use_pallas and jax.default_backend() == "tpu":
            from .kernels.spmv import blockell_spmv
            return blockell_spmv(self.blocks, self.bcols, x)
        xb = x.reshape(-1, bc)[self.bcols]              # (nbr, w, bc) gather
        y = jnp.einsum("nwij,nwj->ni", self.blocks, xb,
                       precision=jax.lax.Precision.HIGHEST)  # batched MXU GEMMs
        return y.reshape(-1)

    def opnorm_hint(self):
        rowsums = jnp.sum(jnp.abs(self.blocks), axis=(1, 3))  # (nbr, br)
        return jnp.max(rowsums)

    def to_dense(self):
        nbr, w, br, bc = self.blocks.shape
        n = nbr * br
        A = jnp.zeros((n, n), dtype=self.dtype)
        for i in range(nbr):
            for k in range(w):
                c = int(self.bcols[i, k])
                A = A.at[i * br:(i + 1) * br, c * bc:(c + 1) * bc].add(
                    self.blocks[i, k])
        return A

    def tree_flatten(self):
        return (self.blocks, self.bcols), (self.is_hermitian, self.use_pallas)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, is_hermitian=aux[0], use_pallas=aux[1])

    @classmethod
    def from_dense(cls, A, br: int, bc: Optional[int] = None,
                   is_hermitian: bool = False) -> "BlockELLOperator":
        A = np.asarray(A)
        bc = bc if bc is not None else br
        n = A.shape[0]
        if n % br or n % bc:
            raise ValueError(f"n={n} not divisible by block shape ({br},{bc})")
        nbr, nbc = n // br, n // bc
        blk = A.reshape(nbr, br, nbc, bc).transpose(0, 2, 1, 3)
        nzmask = np.abs(blk).sum(axis=(2, 3)) != 0     # (nbr, nbc)
        w = max(1, int(nzmask.sum(axis=1).max()))
        blocks = np.zeros((nbr, w, br, bc), dtype=A.dtype)
        bcols = np.zeros((nbr, w), dtype=np.int32)
        for i in range(nbr):
            z = np.nonzero(nzmask[i])[0]
            blocks[i, : len(z)] = blk[i, z]
            bcols[i, : len(z)] = z
        return cls(jnp.asarray(blocks), jnp.asarray(bcols),
                   is_hermitian=is_hermitian)


def blockell_from_scipy(A, br: int, bc: Optional[int] = None,
                        is_hermitian: bool = False,
                        dtype=None) -> BlockELLOperator:
    """Convert a ``scipy.sparse`` matrix to blocked ELL with (br × bc)
    blocks (native C++ packer when available — see native/)."""
    from ..native import bsr_to_blockell_arrays

    blocks, bcols = bsr_to_blockell_arrays(A, br, bc, dtype=dtype)
    return BlockELLOperator(jnp.asarray(blocks), jnp.asarray(bcols),
                            is_hermitian=is_hermitian)


def banded_from_scipy(A, offsets=None, is_hermitian: bool = False,
                      dtype=None) -> "BandedOperator":
    """Convert a ``scipy.sparse`` matrix with banded structure to diagonal
    storage. Raises if the matrix has entries outside ``offsets`` (or more
    than 64 distinct diagonals when offsets are auto-detected)."""
    from ..native import csr_band_offsets, csr_to_banded_arrays

    A = A.tocsr()
    if offsets is None:
        offsets = csr_band_offsets(A)
        if offsets is None:
            raise ValueError(
                "matrix has >64 distinct diagonals; pass offsets explicitly "
                "or use ell_from_scipy")
    diags, dropped = csr_to_banded_arrays(A, offsets, dtype=dtype)
    if dropped:
        raise ValueError(
            f"{dropped} entries fall outside the given offsets {offsets}")
    return BandedOperator(jnp.asarray(diags), [int(o) for o in offsets],
                          is_hermitian=is_hermitian)


@jax.tree_util.register_pytree_node_class
class BandedOperator(LinearOperator):
    """Diagonal-storage (stencil) operator: A[i, i+o] = diags[k][i] for each
    static offset o = offsets[k].

    The matvec is a sum of shifted elementwise products — pure VPU work with
    no gathers; the shifts become halo ``ppermute`` exchanges on a
    row-partitioned mesh (parallel/ops.py). This is the speed-of-light
    container for Laplacians and advection–diffusion stencils (the
    reference's benchmark operators are all of this form).

    diags: (len(offsets), n); diags[k, i] = A[i, i+offsets[k]], zero where
    i+offsets[k] is out of range.
    """

    def __init__(self, diags, offsets, is_hermitian: bool = False):
        self.diags = jnp.asarray(diags)
        self.offsets = tuple(int(o) for o in offsets)
        self.is_hermitian = bool(is_hermitian)
        if self.diags.shape[0] != len(self.offsets):
            raise ValueError("diags rows must match number of offsets")

    @property
    def shape(self):
        n = self.diags.shape[1]
        return (n, n)

    @property
    def dtype(self):
        return self.diags.dtype

    @property
    def nnz(self) -> int:
        return int(self.diags.size)

    def matvec(self, x):
        n = x.shape[0]
        h = max((abs(o) for o in self.offsets), default=0)
        # y[i] += diags[k, i] * x[i+o]. Zero-padding both ends makes every
        # shifted read a static slice AND handles the boundary rows exactly
        # (out-of-range x values read the pad zeros) — no masks, no rolls;
        # XLA fuses the k shifted multiply-adds into one pass.
        xe = jnp.pad(x, (h, h))
        y = jnp.zeros_like(x, dtype=jnp.result_type(self.dtype, x.dtype))
        for k, o in enumerate(self.offsets):
            y = y + self.diags[k] * lax.dynamic_slice_in_dim(xe, h + o, n)
        return y

    def opnorm_hint(self):
        return jnp.max(jnp.sum(jnp.abs(self.diags), axis=0))

    def _gershgorin_real(self):
        """Per-row Gershgorin enclosure of the spectrum's REAL parts
        over the diagonal storage (diags[k][i] = A[i, i+offset_k], so
        rows are direct). One device reduction, fetched once. Shared by
        ``spectral_bounds_hint`` (Hermitian: the spectrum itself) and
        ``models/leja.real_interval`` (non-Hermitian real extent)."""
        n = self.shape[0]
        d = jnp.zeros((n,), self.dtype)
        r = jnp.zeros((n,), jnp.finfo(self.dtype).dtype)
        i = np.arange(n)
        for k, o in enumerate(self.offsets):
            valid = jnp.asarray((i + o >= 0) & (i + o < n))
            row = jnp.where(valid, self.diags[k], 0)
            if o == 0:
                d = d + row
            else:
                r = r + jnp.abs(row)
        return (float(jnp.min(jnp.real(d) - r)),
                float(jnp.max(jnp.real(d) + r)))

    def spectral_bounds_hint(self):
        """Gershgorin spectrum enclosure — Chebyshev actions
        (models/chebyshev.py); Hermitian only (else see
        ``models/leja.real_interval``)."""
        return self._gershgorin_real() if self.is_hermitian else None

    def to_dense(self):
        n = self.shape[0]
        A = jnp.zeros((n, n), dtype=self.dtype)
        for k, o in enumerate(self.offsets):
            i = jnp.arange(max(0, -o), min(n, n - o))
            A = A.at[i, i + o].set(self.diags[k, i])
        return A

    def to_ell(self) -> SparseELLOperator:
        n = self.shape[0]
        w = len(self.offsets)
        i = np.arange(n)
        cols = np.zeros((n, w), dtype=np.int32)
        data = np.zeros((n, w), dtype=self.diags.dtype)
        dn = np.asarray(self.diags)
        for k, o in enumerate(self.offsets):
            idx = i + o
            valid = (idx >= 0) & (idx < n)
            cols[:, k] = np.where(valid, idx, 0)
            data[:, k] = np.where(valid, dn[k], 0)
        return SparseELLOperator(jnp.asarray(data), jnp.asarray(cols),
                                 is_hermitian=self.is_hermitian)

    def tree_flatten(self):
        return (self.diags,), (self.offsets, self.is_hermitian)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], is_hermitian=aux[1])

    @classmethod
    def from_dense(cls, A, offsets=None, is_hermitian: bool = False):
        A = np.asarray(A)
        n = A.shape[0]
        if offsets is None:
            offsets = sorted({int(j - i) for i, j in zip(*np.nonzero(A))})
            if not offsets:
                offsets = [0]
        diags = np.zeros((len(offsets), n), dtype=A.dtype)
        for k, o in enumerate(offsets):
            i = np.arange(max(0, -o), min(n, n - o))
            diags[k, i] = A[i, i + o]
        return cls(jnp.asarray(diags), offsets, is_hermitian=is_hermitian)


@jax.tree_util.register_pytree_node_class
class SellOperator(LinearOperator):
    """Unstructured sparse operator in SELL-window form — the vector-gather
    Pallas SpMV container (ops/kernels/sell.py; VERDICT r1 item 1).

    Build with ``SellOperator.from_coo`` / ``from_scipy`` (optionally
    RCM-permuting for window locality via the native C++ RCM). matvec
    dispatches to the Pallas kernel on TPU and the identical-math XLA
    path elsewhere. Note: with ``rcm=True`` the operator acts in the
    PERMUTED basis — use ``.perm`` to map vectors in/out, or keep the
    whole Krylov solve in permuted space (y = P·A·Pᵀ(P x)).
    """

    def __init__(self, data, is_hermitian: bool = False, perm=None):
        self.data = data
        self.is_hermitian = bool(is_hermitian)
        self.perm = perm           # perm[new] = old (None if unpermuted)

    @property
    def shape(self):
        return (self.data.n, self.data.n)

    @property
    def dtype(self):
        from .kernels.sell import SellBucketed
        if isinstance(self.data, SellBucketed):
            return self.data.vals_dtype
        return self.data.vals.dtype

    @property
    def nnz(self) -> int:
        return self.data.nnz

    def matvec(self, x):
        from .kernels.sell import (SellBucketed, SellSeg, sell_spmv,
                                   sell_spmv_ref, sell_spmv_bucketed,
                                   sell_spmv_bucketed_ref, sell_spmv_seg,
                                   sell_spmv_seg_ref)
        if isinstance(self.data, SellSeg):
            if jax.default_backend() == "tpu":
                return sell_spmv_seg(self.data, x)
            return sell_spmv_seg_ref(self.data, x)
        if isinstance(self.data, SellBucketed):
            if jax.default_backend() == "tpu":
                return sell_spmv_bucketed(self.data, x)
            return sell_spmv_bucketed_ref(self.data, x)
        if jax.default_backend() == "tpu":
            return sell_spmv(self.data, x)
        return sell_spmv_ref(self.data, x)

    @staticmethod
    def _rowsum_max(data):
        # inf-norm bound: max row sum of |values| = per-lane sums.
        a = jnp.sum(jnp.abs(data.vals), axis=1)         # (T, 128)
        G = data.group_ptr.shape[0] - 1                 # row groups
        tg = jnp.searchsorted(data.group_ptr[1:],
                              jnp.arange(a.shape[0]), side="right")
        tg = jnp.minimum(tg, G - 1)                     # trailing pad tiles
        rowsum = jax.ops.segment_sum(a, tg, num_segments=G)
        return jnp.max(rowsum)

    def opnorm_hint(self):
        from .kernels.sell import _LANES, _W, SellBucketed, SellSeg
        if isinstance(self.data, SellSeg):
            # lanes are row segments: per-lane |v| sums, then the same
            # per-row reassembly as the matvec (direct consecutive-lane
            # sum, or segmented suffix-sum + two-head gather)
            base = self.data.base
            a = jnp.sum(jnp.abs(base.vals), axis=1)       # (T, 128)
            flat = a.reshape(-1)
            if self.data.lmax:
                ln = self.data.cidx.reshape(-1)[:base.n] >> 10
                y = flat[self.data.h1]
                for j in range(1, self.data.lmax):
                    y = y + jnp.where(
                        j < ln,
                        flat[jnp.minimum(self.data.h1 + j,
                                         flat.shape[0] - 1)], 0)
                return jnp.max(y)
            segid = (base.lidx[:, 0, :] >> 10) & (_LANES - 1)
            lane = jnp.arange(_LANES)[None, :]
            for st in range(base.seg):
                sh = 1 << st
                ok = ((lane + sh < _LANES)
                      & (segid == jnp.roll(segid, -sh, 1)))
                a = a + jnp.where(ok, jnp.roll(a, -sh, 1), 0)
            flat = a.reshape(-1)
            straddle = (self.data.cidx.reshape(-1)[:base.n] >> 20) > 0
            return jnp.max(flat[self.data.h1]
                           + jnp.where(straddle, flat[self.data.h2], 0))
        if isinstance(self.data, SellBucketed):
            # every row lives in exactly one bucket
            return functools_reduce(
                jnp.maximum,
                [self._rowsum_max(b) for b in self.data.buckets])
        return self._rowsum_max(self.data)

    @classmethod
    def from_coo(cls, rows, cols, vals, n, *, dtype=np.float32,
                 window: int = 2048, residue: bool = False,
                 mode: str | None = None, rcm: bool = False,
                 is_hermitian: bool = False, max_chunks: int = 4,
                 uniform_k: bool | None = None):
        from .kernels.sell import sell_pack
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        vals = np.asarray(vals)
        perm = None
        if rcm:
            import scipy.sparse as sp
            from ..native import rcm_ordering
            A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n))
            perm = rcm_ordering(A.tocsr())
            inv = np.empty_like(perm)
            inv[perm] = np.arange(n)
            rows, cols = inv[rows], inv[cols]
        if mode == "sorted":
            try:
                return SortedSellOperator._build(
                    rows, cols, vals, n, dtype=dtype, window=window,
                    is_hermitian=is_hermitian, rcm_perm=perm)
            except ValueError as e:
                raise ValueError(
                    "mode='sorted': the degree-sorted layout does not "
                    "fit the 1024-column gather windows (the matrix "
                    "bandwidth is too wide for the window-local sort) — "
                    "use mode='seg', the degree-layout-blind container "
                    f"(underlying pack error: {e})") from None
        if mode == "seg":
            from .kernels.sell import sell_pack_seg
            data = sell_pack_seg((rows, cols, vals), n, dtype=dtype)
        elif mode == "bucketed":
            from .kernels.sell import sell_pack_bucketed
            data = sell_pack_bucketed((rows, cols, vals), n, dtype=dtype,
                                      window=window)
        else:
            data = sell_pack((rows, cols, vals), n, dtype=dtype,
                             window=window, residue=residue, mode=mode,
                             max_chunks=max_chunks, uniform_k=uniform_k)
        return cls(data, is_hermitian=is_hermitian, perm=perm)

    @classmethod
    def from_scipy(cls, A, **kwargs):
        A = A.tocoo()
        return cls.from_coo(A.row, A.col, A.data, A.shape[0], **kwargs)

    def tree_flatten(self):
        return (self.data,), (self.is_hermitian, self.perm)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], is_hermitian=aux[0], perm=aux[1])


@jax.tree_util.register_pytree_node_class
class SortedSellOperator(LinearOperator):
    """Degree-sorted conjugated SELL: the SCATTERED-degree SpMV answer
    (VERDICT r4 #5).

    Scattered high-degree rows defeat ``SellBucketed``'s 128-row degree
    classes (every group holds a top-degree row → uniform-k degenerate,
    ~63 GB/s) and cap the lane-compacted ``seg`` pack at ~100 GB/s (the
    hard 1024-column gather window + 1.4× lane inflation,
    BENCHMARKS.md r4). This container converts scattered → clustered by
    a STABLE degree-sort row permutation P applied as a conjugation:

        A_s = P A Pᵀ   (clustered degrees → the 170 GB/s bucketed pack)
        A x = Pᵀ · A_s · (P x)

    with P and Pᵀ themselves packed as degree-1 SELL matrices — the
    windowed Pallas gather machinery applies the 10M-element permutation
    in ~one 2n pass (an XLA element gather at this size costs ~150 ms —
    the known trap). ``matvec`` is the 3-SpMV conjugated form (correct
    everywhere); the polynomial/Krylov drivers HOIST the conjugation to
    once per solve (exp(P A Pᵀ) = P exp(A) Pᵀ — true for every matrix
    function), so an m-iteration solve pays m clustered SpMVs + 2
    permutes instead of m scattered SpMVs. Build via
    ``SellOperator.from_coo(..., mode="sorted")`` (optionally composed
    with ``rcm=True`` — the stable sort preserves RCM locality within
    each degree class).

    Reference context: the reference outsources SpMV entirely
    (SURVEY §2); this is pure north-star territory.
    """

    def __init__(self, inner, pfwd, pinv, order, is_hermitian=False):
        self.inner = inner          # SellOperator over A_s = P A Pᵀ
        self.pfwd = pfwd            # SellOperator applying x ↦ x[order]
        self.pinv = pinv            # SellOperator applying x ↦ x[inv]
        self.order = order          # order[new] = old (numpy, static)
        self.is_hermitian = bool(is_hermitian)

    @property
    def shape(self):
        return self.inner.shape

    @property
    def dtype(self):
        return self.inner.dtype

    @property
    def nnz(self) -> int:
        return self.inner.nnz

    def permute(self, x):
        """x in original order → sorted order (columns looped for 2-D)."""
        if x.ndim == 2:
            return jnp.stack([self.pfwd.matvec(x[:, j])
                              for j in range(x.shape[1])], axis=1)
        return self.pfwd.matvec(x)

    def unpermute(self, x):
        if x.ndim == 2:
            return jnp.stack([self.pinv.matvec(x[:, j])
                              for j in range(x.shape[1])], axis=1)
        return self.pinv.matvec(x)

    def matvec(self, x):
        return self.unpermute(self.inner.matvec(self.permute(x)))

    def opnorm_hint(self):
        return self.inner.opnorm_hint()     # conjugation preserves norms

    @classmethod
    def _build(cls, rows, cols, vals, n, *, dtype, window,
               is_hermitian, rcm_perm=None, sort_window: int = 256):
        # rows/cols arrive RCM-relabeled when rcm_perm is given; the
        # degree sort happens in that space (stable → preserves RCM
        # window locality within each degree class), and the PUBLIC
        # permutation operators compose BOTH relabelings so the
        # container maps original-order vectors to original-order
        # vectors: permute(x) == x[order] always holds.
        #
        # The sort is WINDOW-LOCAL (blocks of ``sort_window`` rows), not
        # global: a global degree sort gathers each 128-row group's rows
        # from all over the matrix, shattering the column locality every
        # SELL pack depends on (the packers reject the resulting spans —
        # measured, BENCHMARKS.md r5). Window-local sorting bounds the
        # conjugated span by ~3·sort_window (a group's columns touch
        # the window and both neighbours; sort_window is a multiple of
        # 128 so groups never straddle windows), which must fit the
        # hard 1024-column gather window — the container therefore
        # applies to NARROW-BAND scattered-degree matrices (bandwidth ≲
        # sort_window); wide-band scattered layouts CANNOT be
        # converted this way at all (the same windowed-gather constraint
        # that caps the seg pack at ~100 GB/s — the r4 floor, now an
        # experiment rather than an analysis) and should use
        # mode="seg". The pack raises with that guidance.
        from .kernels.sell import sell_pack_bucketed
        deg = np.bincount(rows, minlength=n)
        order = np.empty(n, np.int64)
        for w0 in range(0, n, sort_window):
            w1 = min(n, w0 + sort_window)
            order[w0:w1] = w0 + np.argsort(deg[w0:w1], kind="stable")
        inv = np.empty_like(order)
        inv[order] = np.arange(n, dtype=np.int64)
        inner = SellOperator(
            sell_pack_bucketed((inv[rows], inv[cols], vals), n,
                               dtype=dtype, window=window),
            is_hermitian=is_hermitian)
        if rcm_perm is not None:
            # x_sorted[i] = x_rcm[order[i]] = x[rcm_perm[order[i]]]
            order_full = np.asarray(rcm_perm, np.int64)[order]
        else:
            order_full = order
        inv_full = np.empty_like(order_full)
        inv_full[order_full] = np.arange(n, dtype=np.int64)
        ar = np.arange(n, dtype=np.int64)
        ones = np.ones(n, dtype)
        pfwd = SellOperator(sell_pack_bucketed((ar, order_full, ones), n,
                                               dtype=dtype, window=window))
        pinv = SellOperator(sell_pack_bucketed((ar, inv_full, ones), n,
                                               dtype=dtype, window=window))
        return cls(inner, pfwd, pinv, order_full,
                   is_hermitian=is_hermitian)

    def save(self, prefix: str) -> None:
        """Persist the pack-once serving form: three bucketed packs +
        the composed order map (``<prefix>_{inner,pfwd,pinv}.npz`` and
        ``<prefix>_order.npy`` — same contract as ``SellData.save``)."""
        import numpy as _np
        self.inner.data.save(f"{prefix}_inner.npz")
        self.pfwd.data.save(f"{prefix}_pfwd.npz")
        self.pinv.data.save(f"{prefix}_pinv.npz")
        _np.save(f"{prefix}_order.npy", self.order)

    @classmethod
    def load(cls, prefix: str, *,
             is_hermitian: bool = False) -> "SortedSellOperator":
        import numpy as _np
        from .kernels.sell import SellBucketed
        inner = SellOperator(SellBucketed.load(f"{prefix}_inner.npz"),
                             is_hermitian=is_hermitian)
        pfwd = SellOperator(SellBucketed.load(f"{prefix}_pfwd.npz"))
        pinv = SellOperator(SellBucketed.load(f"{prefix}_pinv.npz"))
        order = _np.load(f"{prefix}_order.npy")
        return cls(inner, pfwd, pinv, order, is_hermitian=is_hermitian)

    def tree_flatten(self):
        # order is a static numpy map — ride the aux data (id-hashable
        # wrapper) so pytree round-trips keep it intact
        return (self.inner, self.pfwd, self.pinv), \
            (self.is_hermitian, _StaticArray(self.order))

    @classmethod
    def tree_unflatten(cls, aux, children):
        ob = object.__new__(cls)
        ob.inner, ob.pfwd, ob.pinv = children
        ob.is_hermitian = aux[0]
        ob.order = aux[1].value if aux[1] is not None else None
        return ob


class _StaticArray:
    """Hashable identity wrapper so a static numpy array can live in
    pytree aux data (jit cache keys compare aux by equality)."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def __hash__(self):
        return hash(id(self.value)) if self.value is not None else 0

    def __eq__(self, other):
        return (isinstance(other, _StaticArray)
                and self.value is other.value)


def hoist_conjugation(op, b):
    """(inner_op, permuted_b, postprocess) for conjugation-hoistable
    operators; identity triple otherwise. Matrix functions commute with
    the conjugation (f(P A Pᵀ) = P f(A) Pᵀ), so drivers call this once
    and run the whole solve in the sorted basis."""
    if isinstance(op, SortedSellOperator):
        return op.inner, op.permute(jnp.asarray(b)), op.unpermute
    return op, b, None


@jax.tree_util.register_pytree_node_class
class HybridOperator(LinearOperator):
    """A = banded + residual: the hybrid sparse decomposition
    (VERDICT r2 next-round item 2b).

    RCM'd PDE/mesh-class matrices concentrate most nonzeros on a handful
    of DENSE diagonals (self + regular-neighbor couplings); only the
    irregular tail is genuinely unstructured. The hybrid matvec runs the
    dense diagonals through the shift-based ``BandedOperator`` kernel
    (~236 GB/s measured at 10M rows) and only the tail through the
    VPU-gather SELL kernel — moving the bulk of the traffic off the
    gather path entirely instead of fighting its measured per-tile
    ceiling. Build with ``hybrid_from_scipy``.

    Measured domain boundary (benchmarks/bench_hybrid.py, 10M rows):
    when the WHOLE matrix already fits SELL's uniform d<=8 fast path,
    the hybrid is a regression (7.46 ms vs 4.90 ms pure SELL) — SELL's
    low-degree cost is tile-count bound, so removing nnz does not remove
    tiles and the banded kernel re-traverses all n rows. Use the hybrid
    only when maxdeg > 8 and the split brings the residual under the
    d<=8 static schedule (see BENCHMARKS.md).

    Reference context: the matvec is THE device kernel of the Krylov
    stack (src/arnoldi.jl:182); this container slots under every action/
    driver like any other LinearOperator.
    """

    def __init__(self, banded, sell, is_hermitian: bool = False):
        self.banded = banded
        self.sell = sell
        self.is_hermitian = bool(is_hermitian)

    @property
    def shape(self):
        part = self.banded if self.banded is not None else self.sell
        return part.shape

    @property
    def dtype(self):
        part = self.banded if self.banded is not None else self.sell
        return part.dtype

    @property
    def nnz(self) -> int:
        nb = 0 if self.banded is None else int(
            np.count_nonzero(np.asarray(self.banded.diags)))
        ns = 0 if self.sell is None else self.sell.nnz
        return nb + ns

    def matvec(self, x):
        if self.banded is None:
            return self.sell.matvec(x)
        y = self.banded.matvec(x)
        if self.sell is not None:
            y = y + self.sell.matvec(x)
        return y

    def opnorm_hint(self):
        h = 0.0
        if self.banded is not None:
            h = h + self.banded.opnorm_hint()
        if self.sell is not None:
            h = h + self.sell.opnorm_hint()
        return h

    def tree_flatten(self):
        return (self.banded, self.sell), (self.is_hermitian,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], is_hermitian=aux[0])


def hybrid_from_scipy(A, *, min_fill: float = 0.4, max_offsets: int = 31,
                      dtype=np.float32, window: int = 2048,
                      mode: str | None = None, is_hermitian: bool = False,
                      rcm: bool = False) -> HybridOperator:
    """Split ``A`` into dense diagonals + SELL residual (HybridOperator).

    Diagonals whose fill (nnz on the offset / n) is ≥ ``min_fill`` are
    extracted into a BandedOperator (up to ``max_offsets``, densest
    first); everything else packs into the SELL container. ``rcm=True``
    RCM-permutes FIRST (symmetrically), which is what concentrates
    mesh-graph nonzeros onto diagonals; the returned operator then acts
    in the permuted basis (see ``SellOperator`` notes — use ``.perm``).
    """
    import scipy.sparse as sp

    A = A.tocoo()
    n = A.shape[0]
    rows, cols, vals = (np.asarray(A.row, np.int64),
                        np.asarray(A.col, np.int64),
                        np.asarray(A.data))
    perm = None
    if rcm:
        from ..native import rcm_ordering
        perm = rcm_ordering(sp.csr_matrix((vals, (rows, cols)),
                                          shape=(n, n)))
        inv = np.empty_like(perm)
        inv[perm] = np.arange(n)
        rows, cols = inv[rows], inv[cols]

    off = cols - rows
    uniq, counts = np.unique(off, return_counts=True)
    dense = uniq[counts >= min_fill * n]
    if len(dense) > max_offsets:
        order = np.argsort(counts[np.isin(uniq, dense)])[::-1]
        dense = dense[order[:max_offsets]]
    dense_set = set(int(o) for o in dense)

    banded = None
    sell = None
    if dense_set:
        sel = np.isin(off, dense)
        offsets = sorted(dense_set)
        omap = {o: k for k, o in enumerate(offsets)}
        diags = np.zeros((len(offsets), n),
                         dtype or np.result_type(vals.dtype, np.float32))
        ok = np.array([omap[int(o)] for o in off[sel]])
        np.add.at(diags, (ok, rows[sel]), vals[sel])
        banded = BandedOperator(jnp.asarray(diags, dtype), offsets,
                                is_hermitian=is_hermitian)
        res = ~sel
    else:
        res = np.ones(len(off), bool)
    if res.any():
        sell = SellOperator.from_coo(rows[res], cols[res], vals[res], n,
                                     dtype=dtype, window=window, mode=mode,
                                     is_hermitian=is_hermitian)
    hy = HybridOperator(banded, sell, is_hermitian=is_hermitian)
    hy.perm = perm
    return hy
