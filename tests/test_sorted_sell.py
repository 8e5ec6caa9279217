"""Degree-sorted conjugated SELL (ops/sparse.SortedSellOperator) — the
scattered-degree container — on the CPU reference SpMV paths."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla
import scipy.sparse as sp

import exponentialutilities_jl_tpu as eu


def _scattered(n, rng, herm=False):
    """85% degree-6 / 10% degree-20 / 5% degree-40 rows, degree values
    SCATTERED over row indices (the SellBucketed failure case)."""
    deg = np.full(n, 6, np.int64)
    deg[int(0.85 * n):int(0.95 * n)] = 20
    deg[int(0.95 * n):] = 40
    rng.shuffle(deg)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = np.clip(rows + rng.integers(-60, 60, rows.size), 0, n - 1)
    vals = rng.standard_normal(rows.size).astype(np.float32) / deg[rows]
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    A.sum_duplicates()
    if herm:
        A = 0.5 * (A + A.T) - sp.diags(np.full(n, 3.0))
    A = A.tocoo()
    return A


@pytest.fixture()
def op_and_dense(rng):
    n = 600
    A = _scattered(n, rng)
    op = eu.SellOperator.from_coo(A.row, A.col, A.data.astype(np.float32),
                                  n, mode="sorted")
    return op, np.asarray(A.todense())


def test_returns_sorted_container(op_and_dense):
    op, _ = op_and_dense
    assert isinstance(op, eu.SortedSellOperator)
    # the inner pack is clustered: degrees ascend along sorted rows
    assert op.order is not None


def test_permute_roundtrip(op_and_dense, rng):
    op, _ = op_and_dense
    x = jnp.asarray(rng.standard_normal(op.shape[0]), jnp.float32)
    xr = op.unpermute(op.permute(x))
    np.testing.assert_array_equal(np.asarray(xr), np.asarray(x))
    # permute applies x[order]
    np.testing.assert_array_equal(np.asarray(op.permute(x)),
                                  np.asarray(x)[op.order])


def test_matvec_matches_scipy(op_and_dense, rng):
    op, D = op_and_dense
    x = rng.standard_normal(D.shape[0]).astype(np.float32)
    y = np.asarray(op.matvec(jnp.asarray(x)))
    want = D @ x
    np.testing.assert_allclose(y, want, atol=1e-5, rtol=1e-4)


def test_expv_hoists_and_matches_dense(rng):
    n = 300
    A = _scattered(n, rng, herm=True)
    op = eu.SellOperator.from_coo(A.row, A.col, A.data.astype(np.float64),
                                  n, mode="sorted", dtype=np.float64,
                                  is_hermitian=True)
    b = rng.standard_normal(n)
    w = np.asarray(eu.expv(0.15, op, jnp.asarray(b), m=40))
    want = sla.expm(0.15 * np.asarray(A.todense())) @ b
    assert np.linalg.norm(w - want) / np.linalg.norm(want) < 1e-9


def test_phiv_hoists(rng):
    n = 250
    A = _scattered(n, rng, herm=True)
    op = eu.SellOperator.from_coo(A.row, A.col, A.data.astype(np.float64),
                                  n, mode="sorted", dtype=np.float64,
                                  is_hermitian=True)
    b = rng.standard_normal(n)
    W = np.asarray(eu.phiv(0.1, op, jnp.asarray(b), 2, m=40))
    D = np.asarray(A.todense())
    # block oracle: phi columns from exp of the augmented matrix
    aug = np.zeros((n + 2, n + 2))
    aug[:n, :n] = 0.1 * D
    aug[:n, n] = b
    aug[n, n + 1] = 1.0
    E = sla.expm(aug)
    w1 = E[:n, n]                      # = phi_1(tA) b  (tA in the block)
    assert (np.linalg.norm(W[:, 1] - w1)
            / np.linalg.norm(w1)) < 1e-8


def test_chebyshev_hoists(rng):
    n = 300
    A = _scattered(n, rng, herm=True)
    op = eu.SellOperator.from_coo(A.row, A.col, A.data.astype(np.float64),
                                  n, mode="sorted", dtype=np.float64,
                                  is_hermitian=True)
    D = np.asarray(A.todense())
    lo = float(np.linalg.eigvalsh(D).min()) - 0.1
    hi = float(np.linalg.eigvalsh(D).max()) + 0.1
    b = rng.standard_normal(n)
    w = np.asarray(eu.expv_chebyshev(0.2, op, jnp.asarray(b),
                                     bounds=(lo, hi), tol=1e-10))
    want = sla.expm(0.2 * D) @ b
    assert np.linalg.norm(w - want) / np.linalg.norm(want) < 1e-7


def test_rcm_compose_invariant(rng):
    # review r5: with rcm=True the public permute/order must still map
    # ORIGINAL-order vectors (the conjugation composes both relabelings)
    n = 400
    A = _scattered(n, rng)
    op = eu.SellOperator.from_coo(A.row, A.col, A.data.astype(np.float32),
                                  n, mode="sorted", rcm=True)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    np.testing.assert_array_equal(np.asarray(op.permute(x)),
                                  np.asarray(x)[op.order])
    y = np.asarray(op.matvec(x))
    want = np.asarray(A.todense()) @ np.asarray(x)
    np.testing.assert_allclose(y, want, atol=1e-5, rtol=1e-4)


def test_pytree_roundtrip_keeps_order(rng):
    import jax
    n = 200
    A = _scattered(n, rng)
    op = eu.SellOperator.from_coo(A.row, A.col, A.data.astype(np.float32),
                                  n, mode="sorted")
    leaves, treedef = jax.tree_util.tree_flatten(op)
    op2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert op2.order is op.order


def test_kiops_and_timestep_hoist(rng):
    # the adaptive drivers hoist the conjugation to once per solve
    n = 200
    A = _scattered(n, rng, herm=True)
    op = eu.SellOperator.from_coo(A.row, A.col, A.data.astype(np.float64),
                                  n, mode="sorted", dtype=np.float64,
                                  is_hermitian=True)
    D = np.asarray(A.todense())
    b = rng.standard_normal(n)
    w_k, stats = eu.kiops([0.4], op, jnp.asarray(b)[:, None], m=40)
    want = sla.expm(0.4 * D) @ b
    assert (np.linalg.norm(np.asarray(w_k)[:, 0] - want)
            / np.linalg.norm(want)) < 1e-6
    U = eu.phiv_timestep([0.4], op, jnp.asarray(b)[:, None],
                         adaptive=True, hermitian=True)
    assert (np.linalg.norm(np.asarray(U)[:, -1] - want)
            / np.linalg.norm(want)) < 1e-6


def test_save_load_roundtrip(tmp_path, rng):
    n = 300
    A = _scattered(n, rng)
    op = eu.SellOperator.from_coo(A.row, A.col, A.data.astype(np.float32),
                                  n, mode="sorted")
    prefix = str(tmp_path / "sorted")
    op.save(prefix)
    op2 = eu.SortedSellOperator.load(prefix)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    np.testing.assert_array_equal(np.asarray(op.matvec(x)),
                                  np.asarray(op2.matvec(x)))
    np.testing.assert_array_equal(op.order, op2.order)


def test_jit_argument(rng):
    # the container rides as a jit ARGUMENT (operators-are-pytrees rule)
    import jax
    n = 200
    A = _scattered(n, rng)
    op = eu.SellOperator.from_coo(A.row, A.col, A.data.astype(np.float32),
                                  n, mode="sorted")

    @jax.jit
    def mv(op, x):
        return op.matvec(x)

    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y1 = mv(op, x)
    y2 = mv(op, 2 * x)        # same op instance → cache hit
    np.testing.assert_allclose(np.asarray(y2), 2 * np.asarray(y1),
                               rtol=1e-5, atol=1e-5)
