"""Fused Lanczos-step kernel (ops/kernels/lanczos_fused.py) vs the
reference recurrence (VERDICT r1 item 7)."""

import numpy as np
import pytest
import jax.numpy as jnp

from exponentialutilities_jl_tpu import laplacian_nd_stencil
from exponentialutilities_jl_tpu.ops.krylov import lanczos_coeffs
from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
    GhostGrid, lanczos_coeffs_fused)


def test_ghost_roundtrip(rng):
    gg = GhostGrid(5, 6, 7)
    x = rng.standard_normal(gg.n).astype(np.float32)
    back = np.asarray(gg.from_ghost(gg.to_ghost(jnp.asarray(x))))
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("shape", [(6, 5, 7), (4, 4, 130)])
def test_fused_matches_reference(rng, shape):
    op = laplacian_nd_stencil(*shape, dtype=jnp.float32)
    n = shape[0] * shape[1] * shape[2]
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    m = 10
    a1, b1, beta0_1, mu1, br1 = lanczos_coeffs(op, b, m)
    a2, b2, beta0_2, mu2, br2 = lanczos_coeffs_fused(op, b, m,
                                                     interpret=True)
    scale = float(jnp.max(jnp.abs(a1)))
    assert float(jnp.max(jnp.abs(a1 - a2))) / scale < 1e-4
    assert float(jnp.max(jnp.abs(b1 - b2))) / scale < 1e-4
    assert abs(float(beta0_1) - float(beta0_2)) < 1e-4 * float(beta0_1)
    assert int(mu1) == int(mu2)


def test_fused_two_pass_expv(rng):
    # the fused coeffs drive the SAME downstream reduced problem: build a
    # tridiagonal from them and compare expv against the dense oracle
    import scipy.linalg as sla
    shape = (6, 6, 6)
    op = laplacian_nd_stencil(*shape, dtype=jnp.float32)
    n = 216
    b = rng.standard_normal(n).astype(np.float32)
    m = 20
    al, be, beta0, mu, br = lanczos_coeffs_fused(op, jnp.asarray(b), m,
                                                 interpret=True)
    T = (np.diag(np.asarray(al)) + np.diag(np.asarray(be)[:-1], 1)
         + np.diag(np.asarray(be)[:-1], -1))
    e1 = np.zeros(m); e1[0] = 1
    coeffs = float(beta0) * sla.expm(0.05 * T) @ e1
    from exponentialutilities_jl_tpu.ops.krylov import lanczos_replay
    w = np.asarray(lanczos_replay(op, jnp.asarray(b), jnp.asarray(
        coeffs.astype(np.float32)), al, be, m))
    A = np.asarray(op.to_banded().to_dense())
    want = sla.expm(0.05 * A) @ b
    assert np.linalg.norm(w - want) / np.linalg.norm(want) < 1e-5


def test_fused_rejects_unsupported(rng):
    from exponentialutilities_jl_tpu import laplacian_1d
    op1 = laplacian_1d(64)
    with pytest.raises(ValueError):
        lanczos_coeffs_fused(op1, jnp.ones(64), 4, interpret=True)


def test_fused_replay_two_pass_expv(rng):
    # full fused two-pass: coeffs pass + accumulating replay pass
    import scipy.linalg as sla
    from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
        lanczos_replay_fused)
    shape = (6, 6, 6)
    op = laplacian_nd_stencil(*shape, dtype=jnp.float32)
    n = 216
    b = rng.standard_normal(n).astype(np.float32)
    m = 20
    al, be, beta0, mu, br = lanczos_coeffs_fused(op, jnp.asarray(b), m,
                                                 interpret=True)
    T = (np.diag(np.asarray(al)) + np.diag(np.asarray(be)[:-1], 1)
         + np.diag(np.asarray(be)[:-1], -1))
    e1 = np.zeros(m); e1[0] = 1
    coeffs = float(beta0) * sla.expm(0.05 * T) @ e1
    w = np.asarray(lanczos_replay_fused(
        op, jnp.asarray(b), jnp.asarray(coeffs.astype(np.float32)),
        interpret=True))
    A = np.asarray(op.to_banded().to_dense())
    want = sla.expm(0.05 * A) @ b
    assert np.linalg.norm(w - want) / np.linalg.norm(want) < 1e-5


def test_stencil_matvec_fused(rng):
    from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
        stencil_matvec_fused)
    op = laplacian_nd_stencil(6, 5, 7, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal(210).astype(np.float32))
    y = np.asarray(stencil_matvec_fused(op, x, interpret=True))
    want = np.asarray(op.matvec(x))
    assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5


# ---- variable-coefficient (per-cell field) path ------------------------

def _var_op(rng, shape, dtype=np.float32):
    from exponentialutilities_jl_tpu import variable_diffusion_nd_stencil
    a = rng.uniform(0.5, 2.0, shape).astype(dtype)
    return variable_diffusion_nd_stencil(a)


def test_variable_operator_matches_dense(rng):
    op = _var_op(rng, (5, 6, 7), np.float64)
    D = np.asarray(op.to_banded().to_dense())
    np.testing.assert_allclose(D, D.T, atol=1e-14)   # symmetric FV build
    x = rng.standard_normal(210)
    np.testing.assert_allclose(np.asarray(op.matvec(jnp.asarray(x))),
                               D @ x, atol=1e-12)
    assert float(op.opnorm_hint()) >= np.abs(D).sum(1).max() - 1e-12


@pytest.mark.parametrize("shape", [(6, 5, 7), (4, 4, 130)])
def test_variable_fused_matches_reference(rng, shape):
    op = _var_op(rng, shape)
    n = shape[0] * shape[1] * shape[2]
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    m = 10
    a1, b1, beta0_1, mu1, br1 = lanczos_coeffs(op, b, m)
    a2, b2, beta0_2, mu2, br2 = lanczos_coeffs_fused(op, b, m,
                                                     interpret=True)
    scale = float(jnp.max(jnp.abs(a1)))
    assert float(jnp.max(jnp.abs(a1 - a2))) / scale < 1e-4
    assert float(jnp.max(jnp.abs(b1 - b2))) / scale < 1e-4
    assert int(mu1) == int(mu2)


def test_variable_matvec_fused(rng):
    from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
        stencil_matvec_fused)
    op = _var_op(rng, (6, 5, 7))
    x = jnp.asarray(rng.standard_normal(210).astype(np.float32))
    y = np.asarray(stencil_matvec_fused(op, x, interpret=True))
    want = np.asarray(op.matvec(x))
    assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5


def test_variable_fused_replay_two_pass_expv(rng):
    import scipy.linalg as sla
    from exponentialutilities_jl_tpu.ops.kernels.lanczos_fused import (
        lanczos_replay_fused)
    op = _var_op(rng, (6, 6, 6))
    n = 216
    b = rng.standard_normal(n).astype(np.float32)
    m = 20
    al, be, beta0, mu, br = lanczos_coeffs_fused(op, jnp.asarray(b), m,
                                                 interpret=True)
    T = (np.diag(np.asarray(al)) + np.diag(np.asarray(be)[:-1], 1)
         + np.diag(np.asarray(be)[:-1], -1))
    e1 = np.zeros(m); e1[0] = 1
    coeffs = float(beta0) * sla.expm(0.05 * T) @ e1
    w = np.asarray(lanczos_replay_fused(
        op, jnp.asarray(b), jnp.asarray(coeffs.astype(np.float32)),
        interpret=True))
    A = np.asarray(op.to_banded().to_dense())
    want = sla.expm(0.05 * A) @ b
    assert np.linalg.norm(w - want) / np.linalg.norm(want) < 1e-5


def test_variable_fused_rejects_nonhermitian(rng):
    from exponentialutilities_jl_tpu import VariableStencilOperator
    n = 4 * 4 * 4
    C = rng.standard_normal((2, n)).astype(np.float32)
    op = VariableStencilOperator((4, 4, 4),
                                 ((0, 0, 0), (0, 0, 1)), jnp.asarray(C),
                                 is_hermitian=False)
    with pytest.raises(ValueError):
        lanczos_coeffs_fused(op, jnp.ones(n, jnp.float32), 4,
                             interpret=True)
