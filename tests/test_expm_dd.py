"""Double-double matrix exponential (ops/expm_dd.py).

Oracle: EXACT rational arithmetic — for a matrix with small rational
entries, exp(A) is computed with ``fractions.Fraction`` (exact scaling
by 2^-s, exact Taylor partial sums, exact squarings), then compared to
the DD result. This mirrors the reference's inline 300-bit BigFloat
oracle (test/basictests.jl:136-174) without any high-precision
dependency.
"""

from fractions import Fraction

import numpy as np
import pytest

from exponentialutilities_jl_tpu.ops.expm_dd import (
    DD, dd_from_f64, dd_add, dd_mul, dd_matmul, dd_div_int, expm_dd,
    _taylor_order)


def _exact_expm(Afrac, s=4, terms=40):
    """exp(A) for a Fraction matrix: scale 2^-s, Taylor, square — exact."""
    n = len(Afrac)
    As = [[a / (2 ** s) for a in row] for row in Afrac]

    def matmul(X, Y):
        return [[sum(X[i][k] * Y[k][j] for k in range(n))
                 for j in range(n)] for i in range(n)]

    eye = [[Fraction(int(i == j)) for j in range(n)] for i in range(n)]
    P = eye
    for k in range(terms, 0, -1):
        Q = matmul(As, P)
        Q = [[q / k for q in row] for row in Q]
        P = [[Q[i][j] + eye[i][j] for j in range(n)] for i in range(n)]
    for _ in range(s):
        P = matmul(P, P)
    return P


def _dd_value(X: DD):
    """Full-precision value of the DD result as Fractions (exact)."""
    hi = np.asarray(X.hi)
    lo = np.asarray(X.lo)
    n = hi.shape[0]
    return [[Fraction(float(hi[i, j])) + Fraction(float(lo[i, j]))
             for j in range(n)] for i in range(n)]


class TestPrimitives:
    def test_two_sum_exact(self):
        a = dd_from_f64(np.array(1.0))
        b = dd_from_f64(np.array(1e-20))
        s = dd_add(a, b)
        # 1 + 1e-20 is NOT representable in f64; DD keeps it exactly
        assert float(s.hi) == 1.0
        assert float(s.lo) == 1e-20

    def test_mul_captures_error(self):
        x = dd_from_f64(np.array(1.0 + 2.0 ** -30))
        y = dd_from_f64(np.array(1.0 - 2.0 ** -30))
        p = dd_mul(x, y)
        exact = (Fraction(1) + Fraction(2) ** -30) * \
                (Fraction(1) - Fraction(2) ** -30)
        got = Fraction(float(p.hi)) + Fraction(float(p.lo))
        assert got == exact

    def test_div_int_exact_class(self):
        x = dd_from_f64(np.array(1.0))
        q = dd_div_int(x, 3)
        err = abs(Fraction(float(q.hi)) + Fraction(float(q.lo))
                  - Fraction(1, 3))
        assert err < Fraction(1, 2 ** 104)

    def test_matmul_compensated(self, rng):
        A = rng.standard_normal((8, 8))
        B = rng.standard_normal((8, 8))
        C = dd_matmul(dd_from_f64(A), dd_from_f64(B))
        Af = [[Fraction(float(a)) for a in row] for row in A]
        Bf = [[Fraction(float(b)) for b in row] for row in B]
        exact = [[sum(Af[i][k] * Bf[k][j] for k in range(8))
                  for j in range(8)] for i in range(8)]
        got = _dd_value(C)
        errs = [abs(got[i][j] - exact[i][j])
                for i in range(8) for j in range(8)]
        scale = max(abs(e) for row in exact for e in row)
        assert max(errs) < Fraction(1, 2 ** 100) * scale


class TestExpmDD:
    def test_taylor_order_reasonable(self):
        m = _taylor_order()
        assert 20 <= m <= 40

    def test_vs_exact_rational_oracle(self):
        """~1e-30 class accuracy on a rational-entry matrix — the
        Double64 tier the reference reaches (test/basictests.jl:136-174
        records ~1e-28 for Double64)."""
        rng = np.random.default_rng(7)
        n = 6
        # entries k/64 with |k| ≤ 64: exactly representable, norm ~1
        K = rng.integers(-64, 65, size=(n, n))
        A = K / 64.0
        Afrac = [[Fraction(int(K[i, j]), 64) for j in range(n)]
                 for i in range(n)]
        X = expm_dd(A)
        exact = _exact_expm(Afrac, s=6, terms=45)
        got = _dd_value(X)
        scale = max(abs(float(e)) for row in exact for e in row)
        err = max(abs(float(got[i][j] - exact[i][j]))
                  for i in range(n) for j in range(n))
        assert err / scale < 1e-29

    def test_hi_is_correctly_rounded_f64(self):
        """result.hi must agree with scipy's expm to f64 roundoff and be
        strictly more accurate against the exact oracle."""
        import scipy.linalg as sla
        rng = np.random.default_rng(3)
        n = 5
        K = rng.integers(-32, 33, size=(n, n))
        A = K / 32.0
        Afrac = [[Fraction(int(K[i, j]), 32) for j in range(n)]
                 for i in range(n)]
        X = expm_dd(A)
        exact = _exact_expm(Afrac, s=6, terms=45)
        exact_f = np.array([[float(e) for e in row] for row in exact])
        err_dd = np.max(np.abs(np.asarray(X.hi) - exact_f))
        err_scipy = np.max(np.abs(sla.expm(A) - exact_f))
        scale = np.max(np.abs(exact_f))
        assert err_dd / scale < 1e-15
        assert err_dd <= err_scipy * 1.01 + 1e-18 * scale

    def test_large_norm_scaling(self):
        """‖A‖ ≈ 40 exercises the automatic squaring count."""
        rng = np.random.default_rng(11)
        n = 4
        K = rng.integers(-64, 65, size=(n, n))
        A = K / 64.0 * 32.0            # entries k/2: exact, norm ~40
        Afrac = [[Fraction(int(K[i, j]), 2) for j in range(n)]
                 for i in range(n)]
        X = expm_dd(A)
        exact = _exact_expm(Afrac, s=9, terms=60)
        got = _dd_value(X)
        scale = max(abs(float(e)) for row in exact for e in row)
        err = max(abs(float(got[i][j] - exact[i][j]))
                  for i in range(n) for j in range(n))
        assert err / scale < 1e-26

    def test_explicit_squarings_jittable(self):
        import jax
        rng = np.random.default_rng(5)
        A = rng.standard_normal((4, 4)) / 4
        f = jax.jit(lambda M: expm_dd(M, squarings=2))
        X = f(A)
        Y = expm_dd(A, squarings=2)
        assert np.array_equal(np.asarray(X.hi), np.asarray(Y.hi))
        assert np.array_equal(np.asarray(X.lo), np.asarray(Y.lo))
