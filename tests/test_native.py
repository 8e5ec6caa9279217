"""Native C++ sparse-preprocessing library + numpy fallbacks.

Both code paths are exercised: the ctypes-loaded library (skipped when no
toolchain) and the numpy-vectorized fallbacks, cross-checked against each
other and scipy.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from exponentialutilities_jl_tpu import banded_from_scipy, laplacian_1d
from exponentialutilities_jl_tpu import native as nat


def _rand_csr(n=60, density=0.08, seed=5):
    A = sp.random(n, n, density=density,
                  random_state=np.random.RandomState(seed), format="csr")
    A.setdiag(np.arange(1, n + 1, dtype=float))
    return A.tocsr()


@pytest.fixture(scope="module")
def lib():
    lib = nat.load_native()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestNativeBuild:
    def test_builds_and_loads(self, lib):
        assert nat.native_available()


class TestEllPack:
    def test_matches_dense(self):
        A = _rand_csr()
        vals, cols = nat.csr_to_ell_arrays(A)
        n = A.shape[0]
        dense = np.zeros((n, n))
        rows = np.broadcast_to(np.arange(n)[:, None], vals.shape)
        np.add.at(dense, (rows, cols), vals)
        np.testing.assert_allclose(dense, A.toarray())

    def test_f32(self):
        A = _rand_csr()
        vals, cols = nat.csr_to_ell_arrays(A, dtype=np.float32)
        assert vals.dtype == np.float32

    def test_native_matches_fallback(self, lib):
        A = _rand_csr(seed=9)
        v1, c1 = nat.csr_to_ell_arrays(A)
        # force fallback
        saved, nat._lib = nat._lib, None
        try:
            v2, c2 = nat.csr_to_ell_arrays(A)
        finally:
            nat._lib = saved
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(c1, c2)


class TestBlockEllPack:
    def test_spmv_roundtrip(self):
        A = _rand_csr(n=64)
        blocks, bcols = nat.bsr_to_blockell_arrays(A, 4)
        x = np.random.default_rng(1).standard_normal(64)
        xb = x.reshape(-1, 4)[bcols]
        y = np.einsum("nwij,nwj->ni", blocks, xb).reshape(-1)
        np.testing.assert_allclose(y, A @ x, rtol=1e-12, atol=1e-12)

    def test_native_matches_fallback(self, lib):
        A = _rand_csr(n=64, seed=11)
        b1, c1 = nat.bsr_to_blockell_arrays(A, 8)
        saved, nat._lib = nat._lib, None
        try:
            b2, c2 = nat.bsr_to_blockell_arrays(A, 8)
        finally:
            nat._lib = saved
        np.testing.assert_array_equal(b1, b2)
        np.testing.assert_array_equal(c1, c2)


class TestBanded:
    def test_extract_tridiag(self):
        n = 40
        A = sp.diags([np.ones(n - 1), -2 * np.ones(n), np.ones(n - 1)],
                     [-1, 0, 1], format="csr")
        op = banded_from_scipy(A, is_hermitian=True)
        np.testing.assert_allclose(np.asarray(op.to_dense()), A.toarray())
        ref = laplacian_1d(n)
        np.testing.assert_allclose(np.asarray(op.diags),
                                   np.asarray(ref.diags))

    def test_auto_offsets(self):
        n = 30
        A = sp.diags([2 * np.ones(n - 5), np.ones(n)], [-5, 0], format="csr")
        offs = nat.csr_band_offsets(A)
        np.testing.assert_array_equal(offs, [-5, 0])
        op = banded_from_scipy(A)
        np.testing.assert_allclose(np.asarray(op.to_dense()), A.toarray())

    def test_dropped_raises(self):
        A = _rand_csr(n=30)
        with pytest.raises(ValueError, match="outside"):
            banded_from_scipy(A, offsets=[0])


class TestRcm:
    def test_reduces_bandwidth(self, lib):
        rng = np.random.RandomState(3)
        perm0 = rng.permutation(80)
        L = sp.diags([np.ones(79), -2 * np.ones(80), np.ones(79)],
                     [-1, 0, 1]).tocsr()
        A = L[perm0][:, perm0].tocsr()   # scrambled tridiagonal

        def bandwidth(M):
            coo = M.tocoo()
            return int(np.abs(coo.row - coo.col).max())

        perm = nat.rcm_ordering(A)
        B = A[perm][:, perm].tocsr()
        assert bandwidth(B) <= 2  # RCM recovers near-tridiagonal
        # permutation is a bijection
        assert sorted(perm) == list(range(80))


class TestPartition:
    def test_balanced(self, lib):
        A = _rand_csr(n=100, density=0.2)
        bounds = nat.balance_partition(A, 4)
        assert bounds[0] == 0 and bounds[-1] == 100
        nnz = np.diff(A.indptr)
        loads = [nnz[bounds[i]:bounds[i + 1]].sum() for i in range(4)]
        # bottleneck within 2x of ideal (binary-search optimum for
        # contiguous partitions is tighter, this is a sanity bound)
        assert max(loads) <= 2 * A.nnz / 4 + nnz.max()

    def test_fallback(self):
        saved, nat._lib = nat._lib, None
        try:
            A = _rand_csr(n=50)
            bounds = nat.balance_partition(A, 5)
        finally:
            nat._lib = saved
        assert bounds[0] == 0 and bounds[-1] == 50
        assert all(bounds[i] <= bounds[i + 1] for i in range(5))
