"""Arbitrary-precision host exponential (ops/expm_mp.py) — the
reference's 300-bit BigFloat exp_generic capability
(test/basictests.jl:205-231), oracled against mpmath's own expm."""

import math

import numpy as np
import pytest

from exponentialutilities_jl_tpu.ops.expm_mp import (expm_mp,
                                                     pade_order_for_eps_mp)

mpmath = pytest.importorskip("mpmath")
from mpmath import mp, matrix, workprec  # noqa: E402


def _relerr(X, Y, n):
    num = max(abs(X[i, j] - Y[i, j]) for i in range(n) for j in range(n))
    den = max(abs(Y[i, j]) for i in range(n) for j in range(n))
    return num / den


def test_300bit_vs_mpmath_expm(rng):
    # the reference's bar: rel err < 100·eps at 300-bit precision
    A = rng.standard_normal((6, 6)) / 3
    X = expm_mp(A, prec_bits=300)
    with workprec(320):
        ref = mpmath.expm(matrix([[mp.mpf(v) for v in row]
                                  for row in A.tolist()]))
        err = _relerr(X, ref, 6)
        assert err < 100 * mp.mpf(2) ** (-300)


def test_large_norm_scaling_path(rng):
    A = rng.standard_normal((5, 5)) * 40.0
    X = expm_mp(A, prec_bits=300)
    with workprec(320):
        ref = mpmath.expm(matrix([[mp.mpf(v) for v in row]
                                  for row in A.tolist()]))
        assert _relerr(X, ref, 5) < 1e-85


def test_nilpotent_exact():
    # exp([[0,1],[0,0]]) = [[1,1],[0,1]] exactly
    X = expm_mp([[0.0, 1.0], [0.0, 0.0]], prec_bits=200)
    with workprec(200):
        assert abs(X[0, 0] - 1) < mp.mpf(2) ** -190
        assert abs(X[0, 1] - 1) < mp.mpf(2) ** -190
        assert abs(X[1, 0]) == 0
        assert abs(X[1, 1] - 1) < mp.mpf(2) ** -190


def test_f64_view_matches_scipy(rng):
    import scipy.linalg as sla
    A = rng.standard_normal((8, 8)) / 4
    X = np.array(expm_mp(A, prec_bits=120).tolist(), dtype=float)
    want = sla.expm(A)
    assert np.max(np.abs(X - want)) / np.max(np.abs(want)) < 1e-13


def test_order_grows_with_precision():
    with workprec(60):
        k60 = pade_order_for_eps_mp(mp.eps)
    with workprec(300):
        k300 = pade_order_for_eps_mp(mp.eps)
    with workprec(1000):
        k1000 = pade_order_for_eps_mp(mp.eps)
    assert k60 < k300 < k1000


def test_rejects_nonsquare():
    with pytest.raises(ValueError):
        expm_mp(np.ones((2, 3)))
