"""Exponential time integrators built on the library's φ-machinery.

The reference package exists to serve "exponential integrators in
OrdinaryDiffEq" (reference README.md:16, docs/src/index.md:5) — the
integrators themselves live downstream in Julia. This module closes the
loop on the TPU side: adaptive exponential Rosenbrock methods
(``exprb32``, ``exprb43`` — Hochbruck & Ostermann, Acta Numerica 2010)
for general stiff ``u' = f(u)``, and the fixed-step ``etdrk4``
(Cox & Matthews 2002, φ-form) for semilinear ``u' = L u + N(u)``.

All φ-function actions run through :func:`models.kiops.kiops` — ONE
augmented Krylov subspace per linear combination Σ τ^k φ_k(τJ) b_k, with
the library's adaptive (τ, m) machinery, host-staged f64 reduced
problems on TPU, and any LinearOperator container (stencil, banded,
SELL, matrix-free). Jacobians default to the matrix-free
:class:`utils.linop.JacobianOperator` (one ``jax.jvp`` per Krylov
matvec; the linearization point is a pytree leaf, so re-linearizing
every step never recompiles).

Exponential Rosenbrock structure: with J = f'(u_n) and
g(v) = f(v) − J v, the exact variation-of-constants step is approximated
by φ-combinations of the D_i = g(U_i) − g(u_n) stage differences;
because g is the NONLINEAR remainder only, stiffness lives entirely in
the φ-actions and the methods have no step-size stability limit.

Tableaux (Hochbruck–Ostermann):
  exprb32 (order 3, embedded 2):
    U₂ = u + h φ₁(hJ) F₁
    u⁺ = U₂ + 2h φ₃(hJ) D₂,     err = ‖2h φ₃(hJ) D₂‖
  exprb43 (order 4, embedded 3):
    U₂ = u + (h/2) φ₁(h/2 J) F₁
    U₃ = u + h φ₁(hJ) F₁
    u⁺ = u + h[φ₁ F₁ + φ₃(16D₂ − 2D₃) + φ₄(−48D₂ + 12D₃)]
    err = h‖φ₄(−48D₂ + 12D₃)‖
Both orders are pinned by convergence tests (tests/test_integrators.py).
"""

from __future__ import annotations

import dataclasses
import math

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.linop import JacobianOperator, LinearOperator, aslinearoperator
from ..utils.precision import mxu_full_precision
from .kiops import kiops

__all__ = ["exprb32", "exprb43", "etdrk4", "ExpIntStats",
           "etdrk4_device", "exprb43_device", "exprb32_device"]


@dataclasses.dataclass
class ExpIntStats:
    """Accepted/rejected step counts and φ-action tallies."""

    steps: int = 0
    rejected: int = 0
    n_f_evals: int = 0
    n_kiops: int = 0
    info: int = 0          # 0 ok; 1 dt underflow; 2 max_steps hit;
                           # 3 non-finite state in fixed-step mode
    final_m: int = 0       # device drivers: Krylov bucket at exit


def _norm(v):
    return float(jnp.linalg.norm(v))


def _phi_comb(J, bs, h, *, tol, kw):
    """w = Σ_k h^k φ_k(hJ) b_k via ONE kiops call (b_0 included)."""
    B = jnp.stack(bs, axis=1)
    w, _ = kiops(float(h), J, B, tol=tol, **kw)   # scalar tstop -> (n,)
    return w


def _wrms(err_vec, u, u_new, rtol, atol):
    """Per-component weighted RMS error norm (the OrdinaryDiffEq /
    Hairer–Wanner practice): sqrt(mean((err_i / (atol_i + rtol·|u_i|))²))
    with elementwise |u_i| = max of the old and new state. ``atol`` may
    be a scalar or a per-component vector, so fields whose components
    span scales (e.g. u and 1e-6·u blocks) are controlled individually
    instead of through one global norm."""
    sc = atol + rtol * jnp.maximum(jnp.abs(u), jnp.abs(u_new))
    # guard sc == 0 (atol = 0 with a component zero in BOTH states):
    # err = 0 there contributes 0, err != 0 blows up to inf (a zero
    # tolerance demands exactness) — never 0/0 = NaN
    ratio = err_vec / jnp.maximum(sc, jnp.finfo(sc.dtype).tiny)
    return float(jnp.sqrt(jnp.mean(jnp.abs(ratio) ** 2)))


def _controller(dt, enorm, order, *, enorm_prev=None, safety=0.9,
                fmin=0.2, fmax=5.0):
    """Step-size factor. PI (Gustafsson) control when the error of the
    previous ACCEPTED step is available — the production-integrator
    default (smooths the step sequence, prevents reject/accept
    oscillation on stiff fields) — falling back to the plain
    I-controller on the first step and after any rejection:

        PI: dt · safety · enorm^(−0.7/k) · enorm_prev^(0.4/k)
        I:  dt · safety · enorm^(−1/k)
    """
    if enorm <= 0:
        return dt * fmax
    if enorm_prev is not None and enorm_prev > 0:
        fac = safety * enorm ** (-0.7 / order) * enorm_prev ** (0.4 / order)
    else:
        fac = safety * enorm ** (-1.0 / order)
    return dt * min(fmax, max(fmin, fac))


def _run_rosenbrock(step_fn, order, f, u0, t_span, *, jac, dt0, rtol, atol,
                    max_steps, return_trajectory, phi_tol, kiops_kwargs,
                    adaptive=True, controller="pi"):
    t0, tf = float(t_span[0]), float(t_span[1])
    if tf <= t0:
        raise ValueError("t_span must satisfy tf > t0")
    if not adaptive and not dt0:
        raise ValueError("adaptive=False requires dt0")
    if controller not in ("pi", "i"):
        raise ValueError(f"controller must be 'pi' or 'i', got {controller!r}")
    u = jnp.asarray(u0)
    atol_arr = jnp.asarray(atol)
    if atol_arr.ndim not in (0, 1) or (atol_arr.ndim == 1
                                       and atol_arr.shape != u.shape):
        raise ValueError("atol must be a scalar or match u0's shape")
    stats = ExpIntStats()
    make_jac = (jac if jac is not None
                else (lambda uu: JacobianOperator(f, uu)))
    dt = float(dt0) if dt0 else (tf - t0) / 100
    t = t0
    ts, us = [t0], [u]
    dt_floor = 1e-12 * (tf - t0)
    enorm_prev = None                    # last ACCEPTED step's error norm
    while t < tf - 1e-14 * (tf - t0):
        if stats.steps + stats.rejected >= max_steps:
            stats.info = 2
            break
        dt = min(dt, tf - t)
        J = make_jac(u)
        if not isinstance(J, LinearOperator):
            J = aslinearoperator(J)
        u_new, err_vec, nf, nk = step_fn(f, J, u, dt, phi_tol,
                                         kiops_kwargs)
        stats.n_f_evals += nf
        stats.n_kiops += nk
        if not bool(jnp.all(jnp.isfinite(u_new))):
            enorm = math.inf
        else:
            enorm = _wrms(err_vec, u, u_new, rtol, atol_arr)
        if not adaptive:
            if not math.isfinite(enorm):
                # no controller ran: this is fixed-step divergence, not a
                # step-size underflow (distinct info code — ADVICE r3)
                stats.info = 3
                break
            t += dt
            u = u_new
            stats.steps += 1
            if return_trajectory:
                ts.append(t)
                us.append(u)
            continue
        if enorm <= 1.0:
            t += dt
            u = u_new
            stats.steps += 1
            if return_trajectory:
                ts.append(t)
                us.append(u)
            dt = _controller(dt, enorm, order,
                             enorm_prev=(enorm_prev if controller == "pi"
                                         else None))
            enorm_prev = enorm if enorm > 0 else None
        else:
            stats.rejected += 1
            # rejection: plain I-control, and the PI memory resets (the
            # standard Gustafsson practice — the rejected error is not a
            # valid smoothness sample)
            dt = _controller(dt, enorm if math.isfinite(enorm) else 100.0,
                             order)
            enorm_prev = None
        if dt < dt_floor:
            stats.info = 1
            break
    if stats.info:
        # no-silent-failure protocol (CLAUDE.md): a truncated integration
        # must never masquerade as a solution
        reason = {1: "step size underflow",
                  2: f"max_steps={max_steps} exceeded",
                  3: "non-finite state at fixed dt — reduce dt0"
                  }[stats.info]
        raise FloatingPointError(
            f"exponential integrator stopped at t={t:.6g} < tf={tf:.6g}: "
            f"{reason} (u finite: {bool(jnp.all(jnp.isfinite(u)))}; "
            "loosen tolerances, raise max_steps, or check f/Jacobian)")
    if return_trajectory:
        return np.asarray(ts), jnp.stack(us, axis=0), stats
    return u, stats


def _step_exprb32(f, J, u, h, tol, kw):
    # kiops applies φ0 = e^{hJ} to column 0, so the STATE rides b0 and
    # the nonlinear remainder g_n = f(u) − J u rides b1:
    #   e^{hJ}u + hφ1(hJ)g_n  ==  u + hφ1(hJ)f(u)   (exactly)
    F1 = f(u)
    gn = F1 - J.matvec(u)
    zero = jnp.zeros_like(u)
    U2 = _phi_comb(J, [u, gn], h, tol=tol, kw=kw)
    D2 = f(U2) - J.matvec(U2) - gn            # = g(U2) − g(u_n)
    b3 = (2.0 / h ** 2) * D2
    u_new = _phi_comb(J, [u, gn, zero, b3], h, tol=tol, kw=kw)
    return u_new, u_new - U2, 2, 2


def _step_exprb43(f, J, u, h, tol, kw):
    F1 = f(u)
    gn = F1 - J.matvec(u)
    zero = jnp.zeros_like(u)
    # U2 (at h/2) and U3 (at h) share one augmented subspace: kiops
    # returns w(τ) at BOTH substop times in a single call.
    B = jnp.stack([u, gn], axis=1)
    W, _ = kiops([h / 2, float(h)], J, B, tol=tol, **kw)
    U2, U3 = W[:, 0], W[:, 1]
    D2 = f(U2) - J.matvec(U2) - gn
    D3 = f(U3) - J.matvec(U3) - gn
    b3 = (16.0 * D2 - 2.0 * D3) / h ** 2
    b4 = (-48.0 * D2 + 12.0 * D3) / h ** 3
    u_new = _phi_comb(J, [u, gn, zero, b3, b4], h, tol=tol, kw=kw)
    u_emb = _phi_comb(J, [u, gn, zero, b3], h, tol=tol, kw=kw)
    return u_new, u_new - u_emb, 3, 3


@mxu_full_precision
def exprb32(f, u0, t_span, *, jac=None, dt0=None, rtol=1e-6, atol=1e-9,
            max_steps=100_000, return_trajectory=False, phi_tol=None,
            adaptive=True, controller="pi", **kiops_kwargs):
    """Adaptive 3(2) exponential Rosenbrock for stiff ``u' = f(u)``.

    Args:
      f: traceable right-hand side ``u -> f(u)``.
      u0: initial state (n,).
      t_span: (t0, tf).
      jac: ``u -> LinearOperator | matrix`` (default: matrix-free
        ``JacobianOperator(f, u)`` — one jvp per Krylov matvec).
      dt0: initial step (default (tf−t0)/100).
      rtol/atol: per-component WRMS error control
        sqrt(mean((err_i/(atol_i + rtol·|u_i|))²)) ≤ 1. ``atol`` may be
        a scalar or an (n,) vector for fields whose components span
        scales.
      phi_tol: tolerance for the inner kiops φ-actions (default
        min(rtol, 1e-7)/10 — the φ error must not pollute the
        controller).
      adaptive: False runs fixed steps of dt0 (no controller) — for
        order studies and fully deterministic serving.
      controller: "pi" (Gustafsson PI, default) or "i" (plain
        I-control) step-size selection.
      kiops_kwargs: forwarded to kiops (mmin/mmax/iop/two_pass...).

    Returns (u_final, ExpIntStats), or (ts, us, stats) with
    ``return_trajectory=True``. Raises FloatingPointError on step-size
    underflow / step-budget exhaustion (no silent truncation).
    """
    phi_tol = phi_tol if phi_tol is not None else min(rtol, 1e-7) / 10
    # the step functions require kiops' tuple return form; a user-passed
    # return_stats=False would crash the unpack with a confusing error
    kiops_kwargs["return_stats"] = True
    return _run_rosenbrock(_step_exprb32, 3, f, u0, t_span, jac=jac,
                           dt0=dt0, rtol=rtol, atol=atol,
                           max_steps=max_steps, adaptive=adaptive,
                           return_trajectory=return_trajectory,
                           phi_tol=phi_tol, kiops_kwargs=kiops_kwargs,
                           controller=controller)


@mxu_full_precision
def exprb43(f, u0, t_span, *, jac=None, dt0=None, rtol=1e-8, atol=1e-11,
            max_steps=100_000, return_trajectory=False, phi_tol=None,
            adaptive=True, controller="pi", **kiops_kwargs):
    """Adaptive 4(3) exponential Rosenbrock (see :func:`exprb32`)."""
    phi_tol = phi_tol if phi_tol is not None else min(rtol, 1e-7) / 10
    kiops_kwargs["return_stats"] = True     # tuple form required (ADVICE r3)
    return _run_rosenbrock(_step_exprb43, 4, f, u0, t_span, jac=jac,
                           dt0=dt0, rtol=rtol, atol=atol,
                           max_steps=max_steps, adaptive=adaptive,
                           return_trajectory=return_trajectory,
                           phi_tol=phi_tol, kiops_kwargs=kiops_kwargs,
                           controller=controller)


@mxu_full_precision
def etdrk4(L, N, u0, t_span, dt, *, phi_tol=1e-9, return_trajectory=False,
           **kiops_kwargs):
    """Fixed-step ETDRK4 (Cox–Matthews 2002) for ``u' = L u + N(u)``.

    The classical semilinear workhorse (KdV/KS/Allen–Cahn class): L is a
    FIXED linear operator (any container — a Hermitian StencilOperator
    rides the fused-sweep Lanczos inside kiops), N a traceable
    nonlinearity. Stages in φ-form, each one kiops call:

      a = u + (h/2)φ₁(h/2 L)[L u + N(u)]            (≡ e^{hL/2}u + …)
      b = u + (h/2)φ₁(h/2 L)[L u + N(a)]
      c = a + (h/2)φ₁(h/2 L)[L a + 2N(b) − N(u)]
      u⁺ = u + h[φ₁(hL)(Lu + N₁) + φ₂(hL)(−3N₁+2Nₐ+2N_b−N_c)
                 + φ₃(hL)(4N₁−4Nₐ−4N_b+4N_c)]

    Returns (u_final, ExpIntStats) (or trajectory). Non-finite states
    raise (no silent NaN propagation).
    """
    t0, tf = float(t_span[0]), float(t_span[1])
    h = float(dt)
    if h <= 0 or tf <= t0:
        raise ValueError("need dt > 0 and tf > t0")
    op = L if isinstance(L, LinearOperator) else aslinearoperator(L)
    kiops_kwargs["return_stats"] = True     # tuple form required (ADVICE r3)
    u = jnp.asarray(u0)
    stats = ExpIntStats()
    nsteps = int(round((tf - t0) / h))
    if abs(nsteps * h - (tf - t0)) > 1e-9 * (tf - t0):
        raise ValueError("dt must divide tf - t0 (fixed-step method)")
    ts, us = [t0], [u]

    def phi1_half(v0, v1):
        W, _ = kiops(h / 2, op, jnp.stack([v0, v1], axis=1),
                     tol=phi_tol, **kiops_kwargs)
        return W

    for k in range(nsteps):
        # kiops applies φ0 = e^{τL} to column 0 — the stage states ride
        # b0 directly, the nonlinear terms ride b1..b3
        try:
            N1 = N(u)
            a = phi1_half(u, N1)
            Na = N(a)
            b = phi1_half(u, Na)
            Nb = N(b)
            c = phi1_half(a, 2.0 * Nb - N1)
            Nc = N(c)
            b2 = (-3.0 * N1 + 2.0 * Na + 2.0 * Nb - Nc) / h
            b3 = (4.0 * N1 - 4.0 * Na - 4.0 * Nb + 4.0 * Nc) / h ** 2
            W, _ = kiops(float(h), op,
                         jnp.stack([u, N1, b2, b3], axis=1),
                         tol=phi_tol, **kiops_kwargs)
        except (OverflowError, FloatingPointError) as e:
            # a stage overflowed inside the φ-machinery: surface it as
            # the no-silent-failure protocol error with step context
            raise FloatingPointError(
                f"etdrk4: stage overflow at step {k + 1} "
                f"(t={t0 + k * h:.6g}) — reduce dt or check L/N") from e
        u = W
        stats.steps += 1
        stats.n_f_evals += 4
        stats.n_kiops += 4
        if not bool(jnp.all(jnp.isfinite(u))):
            raise FloatingPointError(
                f"etdrk4: non-finite state at step {k + 1} "
                f"(t={t0 + (k + 1) * h:.6g}) — reduce dt or check L/N")
        if return_trajectory:
            ts.append(t0 + (k + 1) * h)
            us.append(u)
    if return_trajectory:
        return np.asarray(ts), jnp.stack(us, axis=0), stats
    return u, stats


# ---------------------------------------------------------------------------
# Device-resident fixed-step serving forms: the whole integration is ONE
# compiled lax.scan program — no host round-trips between steps (the same
# design move as models/nw_device.py / models/kiops_device.py). Krylov
# size m is FIXED (the serving contract: validate against the adaptive
# drivers once, then serve); reduced exponentials use the solver-free
# Taylor engine so f64 compiles on TPU.
# ---------------------------------------------------------------------------


def _phi_comb_device(op, B, taus, m: int, iop: int, expm_method: str,
                     with_err: bool = False):
    """[Σ τ^k φ_k(τ·op) b_k for τ in taus] with ONE fixed-m augmented
    Krylov subspace, fully traceable (kiops' single-substep core without
    the adaptivity loop). B is (n, p+1) with p ≥ 1; taus > 0 traced
    scalars (static count). With ``with_err=True`` also returns kiops'
    per-action error estimate |β·h_{j+1,j}·F[j−1,j]| for each τ (the
    quantity kiops' own acceptance test uses, src-parity:
    models/kiops.py) so adaptive callers can police the fixed-m
    approximation."""
    from .expv import build_subspace
    from .kiops import AugmentedOperator, _kiops_x0
    from .kiops_device import _aug_F

    n, ppo = B.shape
    p = ppo - 1
    dt = B.dtype
    rdt = jnp.finfo(jnp.result_type(dt, jnp.float32)).dtype
    norm_u = jnp.sum(jnp.abs(B[:, 1:])).astype(rdt)
    pos = norm_u > 0
    ex = jnp.ceil(jnp.log2(jnp.maximum(norm_u, jnp.finfo(rdt).tiny)))
    # ldexp, not exp2: XLA's exp2 is exp(x·ln2) (not correctly rounded),
    # and nu/mu must be exact inverses for the normalization to cancel
    one_r = jnp.ones((), rdt)
    nu = jnp.where(pos, jnp.ldexp(one_r, -ex.astype(jnp.int32)),
                   1.0).astype(dt)
    mu = jnp.where(pos, jnp.ldexp(one_r, ex.astype(jnp.int32)), 1.0)
    aug = AugmentedOperator(op, B[:, 1:][:, ::-1] * nu)
    x0 = _kiops_x0(B[:, 0], jnp.zeros((), rdt), mu, p)
    Ks = build_subspace(aug, x0, m, iop=iop, hermitian=False)
    j = Ks.m_used
    outs, errs = [], []
    for tau in taus:
        F, nrm = _aug_F(Ks.H, j, jnp.asarray(tau, rdt), m,
                        expm_method)
        coeffs = Ks.beta.astype(rdt) * F[:, 0].astype(rdt)
        outs.append((coeffs.astype(Ks.V.dtype) @ Ks.V[:, :n]).astype(dt))
        if with_err:
            errs.append(jnp.abs(Ks.beta.astype(rdt) * nrm.astype(rdt)
                                * F[jnp.maximum(j - 1, 0), j].astype(rdt)))
    if with_err:
        return outs, errs
    return outs


@functools.partial(jax.jit, static_argnames=("N", "nsteps", "m",
                                              "iop", "expm_method"))
def _etdrk4_scan(L, u0, h, *, N, nsteps: int, m: int, iop: int,
                 expm_method: str):
    # L rides as a pytree ARGUMENT (operators must never be closed over
    # or made static: embedded constants blow the remote-compile request
    # at scale and id()-hash statics recompile per instance)

    def step(u, _):
        N1 = N(u)
        (a,) = _phi_comb_device(L, jnp.stack([u, N1], 1), [h / 2],
                                m, iop, expm_method)
        Na = N(a)
        (b,) = _phi_comb_device(L, jnp.stack([u, Na], 1), [h / 2],
                                m, iop, expm_method)
        Nb = N(b)
        (c,) = _phi_comb_device(L, jnp.stack([a, 2.0 * Nb - N1], 1),
                                [h / 2], m, iop, expm_method)
        Nc = N(c)
        b2 = (-3.0 * N1 + 2.0 * Na + 2.0 * Nb - Nc) / h
        b3 = (4.0 * N1 - 4.0 * Na - 4.0 * Nb + 4.0 * Nc) / h ** 2
        (u_new,) = _phi_comb_device(L, jnp.stack([u, N1, b2, b3], 1),
                                    [h], m, iop, expm_method)
        return u_new, None

    u, _ = lax.scan(step, u0, None, length=nsteps)
    return u


@mxu_full_precision
def etdrk4_device(L, N, u0, t_span, dt, *, m: int = 20, iop: int = 2,
                  expm_method: str = "taylor"):
    """ETDRK4 with the ENTIRE integration as one compiled program.

    Fixed step AND fixed Krylov size m (no adaptivity, no host work
    between steps — the device-resident twin of :func:`etdrk4`, same
    relationship as ``kiops_device`` to ``kiops``). Each stage is one
    fixed-m augmented-Krylov φ-combination; reduced exponentials use the
    solver-free Taylor engine (f64-safe on TPU). Validate m once against
    :func:`etdrk4` at your tolerances, then serve.

    Raises FloatingPointError on a non-finite final state (single sync
    at the end — the in-scan states are never fetched)."""
    t0, tf = float(t_span[0]), float(t_span[1])
    h = float(dt)
    if h <= 0 or tf <= t0:
        raise ValueError("need dt > 0 and tf > t0")
    nsteps = int(round((tf - t0) / h))
    if abs(nsteps * h - (tf - t0)) > 1e-9 * (tf - t0):
        raise ValueError("dt must divide tf - t0 (fixed-step method)")
    op = L if isinstance(L, LinearOperator) else aslinearoperator(L)
    u = _etdrk4_scan(op, jnp.asarray(u0), h, N=N, nsteps=nsteps, m=m,
                     iop=iop, expm_method=expm_method)
    if not bool(jnp.all(jnp.isfinite(u))):
        raise FloatingPointError(
            "etdrk4_device: non-finite final state — raise m, reduce dt, "
            "or validate against the adaptive etdrk4/exprb drivers")
    return u


@functools.partial(jax.jit, static_argnames=("f", "nsteps", "m", "iop",
                                              "expm_method"))
def _exprb43_scan(u0, h, *, f, nsteps: int, m: int, iop: int,
                  expm_method: str):
    zero = jnp.zeros_like(u0)

    def step(u, _):
        J = JacobianOperator(f, u)
        F1 = f(u)
        gn = F1 - J.matvec(u)
        U2, U3 = _phi_comb_device(J, jnp.stack([u, gn, zero], 1),
                                  [h / 2, h], m, iop, expm_method)
        D2 = f(U2) - J.matvec(U2) - gn
        D3 = f(U3) - J.matvec(U3) - gn
        b3 = (16.0 * D2 - 2.0 * D3) / h ** 2
        b4 = (-48.0 * D2 + 12.0 * D3) / h ** 3
        (u_new,) = _phi_comb_device(
            J, jnp.stack([u, gn, zero, b3, b4], 1), [h], m, iop,
            expm_method)
        return u_new, None

    u, _ = lax.scan(step, u0, None, length=nsteps)
    return u


@mxu_full_precision
def exprb43_device(f, u0, t_span, dt=None, *, adaptive=None, m: int = 20,
                   iop: int = 2, expm_method: str = "taylor",
                   m_max: int = 128, rtol=1e-8, atol=1e-11, phi_tol=None,
                   controller: str = "pi", max_steps: int = 100_000,
                   return_stats: bool = False, snapshots=None):
    """exprb43 with the whole integration in one compiled program.

    Two modes:
      * ``adaptive=False`` (the default when ``dt`` is given): fixed
        steps of ``dt`` via one ``lax.scan`` — the round-3 serving form.
        Returns the final state ``u``.
      * ``adaptive=True`` (the default when ``dt`` is None): the FULL
        accept/reject controller — WRMS error norm, PI step control,
        the no-silent-failure protocol — folded into one bounded
        ``lax.while_loop`` per Krylov bucket m (VERDICT r3 #1; the
        ``nw_device``/``kiops_device`` design applied one level up).
        ``dt`` seeds the first step. Per attempt the Jacobian is
        re-linearized IN-TRACE (``JacobianOperator`` jvp — u is data,
        not a constant); each φ-combination carries kiops' own error
        estimate, and a φ-accuracy failure requests the next m bucket
        (ONE host re-entry, state preserved) instead of burning steps.

    Both modes return ``u``, or ``(u, ExpIntStats)`` with
    ``return_stats``. rtol/atol/phi_tol/controller/max_steps only act
    in adaptive mode; fixed-step requires ``dt`` to divide the span
    exactly (``exprb32_device`` clamps the final step instead — its
    fixed mode runs in the while-loop program, this one in a scan).

    ``snapshots`` (adaptive mode): strictly increasing times in
    (t0, tf] ending at tf — each becomes a forced step endpoint
    (dt is clamped to land an accepted step exactly on it) and the
    return becomes the (n, nt) state matrix at those times, the
    :func:`timestepping.expv_timestep` output contract. Implementation:
    one while-loop dispatch per snapshot reusing the SAME compiled
    program (tf is traced data); controller memory, dt and the m
    bucket carry across segments, so the cost over a plain solve is
    nt extra dispatches, not nt recompiles.

    Host round-trips in adaptive mode: 0–2 per solve (m-bucket changes
    only) vs one per kiops TRIAL in :func:`exprb43` — the same
    dispatch-latency fix that took config-4 from 82 s to 1.03 s
    (models/nw_device.py)."""
    if adaptive is None:
        adaptive = dt is None
    if adaptive:
        return _run_exprb_device(
            "exprb43", 4, f, u0, t_span, dt, m=m, m_max=m_max, iop=iop,
            expm_method=expm_method, rtol=rtol, atol=atol,
            phi_tol=phi_tol, controller=controller, max_steps=max_steps,
            return_stats=return_stats, adaptive=True, snapshots=snapshots)
    if snapshots is not None:
        raise ValueError(
            "snapshots requires adaptive=True in exprb43_device (the "
            "fixed-step mode runs as one lax.scan; use exprb32_device "
            "for fixed-step snapshots, or slice the span)")
    t0, tf = float(t_span[0]), float(t_span[1])
    if dt is None:
        raise ValueError("adaptive=False requires dt")
    h = float(dt)
    if h <= 0 or tf <= t0:
        raise ValueError("need dt > 0 and tf > t0")
    nsteps = int(round((tf - t0) / h))
    if abs(nsteps * h - (tf - t0)) > 1e-9 * (tf - t0):
        raise ValueError("dt must divide tf - t0 (fixed-step method)")
    u = _exprb43_scan(jnp.asarray(u0), h, f=f, nsteps=nsteps, m=m,
                      iop=iop, expm_method=expm_method)
    if not bool(jnp.all(jnp.isfinite(u))):
        raise FloatingPointError(
            "exprb43_device: non-finite final state — raise m, reduce "
            "dt, or validate against the adaptive exprb43 driver")
    if return_stats:
        return u, ExpIntStats(steps=nsteps, n_f_evals=3 * nsteps,
                              n_kiops=3 * nsteps, final_m=m)
    return u


# ---------------------------------------------------------------------------
# Device-resident ADAPTIVE exponential Rosenbrock (VERDICT r3 #1).
#
# The host drivers above pay one kiops dispatch per stage PER TRIAL —
# the exact 1–10 ms/dispatch latency class that motivated nw_device
# (whose docstring records config-4 going 82 s → 1.03 s). Here the whole
# controller — WRMS norm, PI/I step selection, rejections, the
# non-finite failure protocol — runs as data inside ONE bounded
# lax.while_loop. The Krylov size is a compiled constant per bucket;
# each fixed-m φ-combination polices itself with kiops' own error
# estimate |β·h_{j+1,j}·F[j−1,j]| and a breach exits the program with
# ``want_m`` set so the host re-enters at the next bucket with the
# trajectory state preserved (0–2 re-dispatches per solve).
# Reference control flow being folded: src/krylov_phiv_adaptive.jl
# :308-413 / the exprb tableaux of Hochbruck–Ostermann 2010.
# ---------------------------------------------------------------------------

_EXPRB_M_LADDER = (6, 8, 10, 13, 17, 22, 29, 38, 49, 64, 83, 108, 128)


def _next_bucket(m, m_max):
    for b in _EXPRB_M_LADDER:
        if b > m:
            return min(b, m_max)
    return m_max


@functools.partial(jax.jit, static_argnames=(
    "f", "scheme", "m", "iop", "expm_method", "max_steps", "use_pi",
    "at_mmax", "adaptive"))
@mxu_full_precision
def _exprb_device_loop(state, tf, t_eps, dt_floor, rtol, atol, phi_tol, *,
                       f, scheme: str, m: int, iop: int, expm_method: str,
                       max_steps: int, use_pi: bool, at_mmax: bool,
                       adaptive: bool):
    order = 4 if scheme == "exprb43" else 3
    safety, fmin, fmax = 0.9, 0.2, 5.0
    u0 = state[0]
    rdt = jnp.finfo(jnp.result_type(u0.dtype, jnp.float32)).dtype
    zero = jnp.zeros_like(u0)

    def attempt(c):
        (u, t, dt_c, eprev, steps, rejected, nk, want_m, info) = c
        dt = jnp.minimum(dt_c, tf - t)
        J = JacobianOperator(f, u)
        F1 = f(u)
        gn = F1 - J.matvec(u)
        if scheme == "exprb43":
            (U2, U3), (e1, e2) = _phi_comb_device(
                J, jnp.stack([u, gn, zero], 1), [dt / 2, dt], m, iop,
                expm_method, with_err=True)
            D2 = f(U2) - J.matvec(U2) - gn
            D3 = f(U3) - J.matvec(U3) - gn
            b3 = (16.0 * D2 - 2.0 * D3) / dt ** 2
            b4 = (-48.0 * D2 + 12.0 * D3) / dt ** 3
            (u_new,), (e3,) = _phi_comb_device(
                J, jnp.stack([u, gn, zero, b3, b4], 1), [dt], m, iop,
                expm_method, with_err=True)
            (u_emb,), (e4,) = _phi_comb_device(
                J, jnp.stack([u, gn, zero, b3], 1), [dt], m, iop,
                expm_method, with_err=True)
            err_vec = u_new - u_emb
            eps_phi = jnp.maximum(jnp.maximum(e1, e2),
                                  jnp.maximum(e3, e4))
            nk_step = 3
        else:                                   # exprb32
            (U2,), (e1,) = _phi_comb_device(
                J, jnp.stack([u, gn], 1), [dt], m, iop, expm_method,
                with_err=True)
            D2 = f(U2) - J.matvec(U2) - gn
            b3 = (2.0 / dt ** 2) * D2
            (u_new,), (e2,) = _phi_comb_device(
                J, jnp.stack([u, gn, zero, b3], 1), [dt], m, iop,
                expm_method, with_err=True)
            err_vec = u_new - U2
            eps_phi = jnp.maximum(e1, e2)
            nk_step = 2

        finite = (jnp.all(jnp.isfinite(u_new))
                  & jnp.all(jnp.isfinite(err_vec)))
        sc = atol + rtol * jnp.maximum(jnp.abs(u), jnp.abs(u_new))
        # sc == 0 guard as in the host _wrms (atol = 0 + zero component)
        sc = jnp.maximum(sc, jnp.finfo(sc.dtype).tiny)
        enorm = jnp.where(
            finite,
            jnp.sqrt(jnp.mean(jnp.abs(
                jnp.where(finite, err_vec, 0) / sc) ** 2)),
            jnp.inf).astype(rdt)
        # kiops' own per-substep acceptance bound (ω = err/tol ≤ δ=1.4
        # at tau_end == τ) polices the fixed-m approximation:
        phi_ok = jnp.isfinite(eps_phi) & (eps_phi <= 1.4 * phi_tol)
        phi_fail = finite & ~phi_ok

        if not adaptive:
            # fixed-step serving: accept anything finite, keep dt, and
            # surface divergence through the info protocol (code 3)
            accept = finite
            want_new = jnp.zeros((), jnp.int32)
            dt_new = dt_c
            info_new = jnp.where(finite, info, 3).astype(jnp.int32)
        else:
            if at_mmax:
                want_new = jnp.zeros((), jnp.int32)
            else:
                # a φ breach on finite data requests the next m bucket
                # (Krylov error decays superlinearly in m; shrinking dt
                # instead taxes the whole remaining trajectory)
                want_new = jnp.where(phi_fail & (enorm <= 1.0), 1,
                                     0).astype(jnp.int32)
            accept = finite & (enorm <= 1.0) & phi_ok

            pi_ok = jnp.asarray(use_pi) & (eprev > 0)
            en = jnp.maximum(enorm, 1e-300)
            fac_pi = safety * en ** (-0.7 / order) * \
                jnp.maximum(eprev, 1e-300) ** (0.4 / order)
            fac_i = safety * en ** (-1.0 / order)
            fac_acc = jnp.where(enorm <= 0, fmax,
                                jnp.clip(jnp.where(pi_ok, fac_pi, fac_i),
                                         fmin, fmax))
            fac_rej = jnp.clip(
                safety * jnp.where(finite, en, 100.0) ** (-1.0 / order),
                fmin, fmax)
            # priority: non-finite → hard shrink; enorm > 1 → controller
            # shrink (also repairs a simultaneous φ breach); φ-only
            # breach → next bucket (want_m, dt kept) or dt/2 at m_max
            dt_new = jnp.where(
                accept, dt * fac_acc,
                jnp.where(~finite, dt / 5,
                          jnp.where(enorm > 1.0, dt * fac_rej,
                                    (dt / 2 if at_mmax else dt_c))))
            underflow = (~accept) & (want_new == 0) & (dt_new < dt_floor)
            info_new = jnp.where(underflow, 1, info).astype(jnp.int32)

        real_attempt = want_new == 0
        return (jnp.where(accept, u_new, u),
                jnp.where(accept, t + dt, t),
                dt_new.astype(rdt),
                jnp.where(accept & (enorm > 0), enorm,
                          jnp.asarray(-1.0, rdt)),
                steps + accept.astype(jnp.int32),
                rejected + ((~accept) & real_attempt).astype(jnp.int32),
                nk + jnp.where(real_attempt, nk_step, 0).astype(jnp.int32),
                want_new, info_new)

    def cond(c):
        (u, t, dt_c, eprev, steps, rejected, nk, want_m, info) = c
        return ((t < tf - t_eps) & (steps + rejected < max_steps)
                & (want_m == 0) & (info == 0))

    return lax.while_loop(cond, attempt, state)


def _run_exprb_device(scheme, order, f, u0, t_span, dt0, *, m, m_max, iop,
                      expm_method, rtol, atol, phi_tol, controller,
                      max_steps, return_stats, adaptive, snapshots=None):
    t0, tf = float(t_span[0]), float(t_span[1])
    if tf <= t0:
        raise ValueError("t_span must satisfy tf > t0")
    if controller not in ("pi", "i"):
        raise ValueError(f"controller must be 'pi' or 'i', got {controller!r}")
    if snapshots is not None:
        snaps = [float(s) for s in np.asarray(snapshots).ravel()]
        if not snaps or any(b <= a for a, b in zip(snaps, snaps[1:])):
            raise ValueError("snapshots must be strictly increasing")
        if snaps[0] <= t0 or snaps[-1] > tf + 1e-14 * (tf - t0):
            raise ValueError("snapshots must lie in (t0, tf]")
        if abs(snaps[-1] - tf) > 1e-14 * (tf - t0):
            raise ValueError(
                "snapshots[-1] must equal t_span[1] (the driver "
                "integrates to tf; include it as the last snapshot)")
        snaps[-1] = tf
        seg_ends = snaps
    else:
        seg_ends = [tf]
    u = jnp.asarray(u0)
    atol_arr = jnp.asarray(atol)
    if atol_arr.ndim not in (0, 1) or (atol_arr.ndim == 1
                                       and atol_arr.shape != u.shape):
        raise ValueError("atol must be a scalar or match u0's shape")
    rdt = jnp.finfo(jnp.result_type(u.dtype, jnp.float32)).dtype
    phi_tol = phi_tol if phi_tol is not None else min(rtol, 1e-7) / 10
    dt = float(dt0) if dt0 else (tf - t0) / 100
    m = max(3, min(m, m_max))
    state = (u, jnp.asarray(t0, rdt), jnp.asarray(dt, rdt),
             jnp.asarray(-1.0, rdt), jnp.zeros((), jnp.int32),
             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    stats = ExpIntStats()
    cols = []
    for tf_seg in seg_ends:
        # each snapshot time is a forced step endpoint: the in-program
        # clamp dt = min(dt, tf_seg - t) lands an accepted step EXACTLY
        # on it. tf_seg is traced data, so every segment re-dispatches
        # the SAME compiled program (one cheap dispatch per snapshot);
        # controller memory, dt, and the m bucket carry across segments.
        for _ in range(len(_EXPRB_M_LADDER) + 2):     # bucket-change bound
            state = _exprb_device_loop(
                state, jnp.asarray(tf_seg, rdt),
                jnp.asarray(1e-14 * (tf - t0), rdt),
                jnp.asarray(1e-12 * (tf - t0), rdt),
                jnp.asarray(rtol, rdt), atol_arr.astype(rdt),
                jnp.asarray(phi_tol, rdt),
                f=f, scheme=scheme, m=m, iop=iop, expm_method=expm_method,
                max_steps=max_steps, use_pi=(controller == "pi"),
                at_mmax=(m >= m_max), adaptive=adaptive)
            if int(state[7]) == 0:
                break
            m = _next_bucket(m, m_max)
            state = state[:7] + (jnp.zeros((), jnp.int32),) + state[8:]
        if int(state[8]) != 0 or float(state[1]) < tf_seg - 1e-14 * (tf - t0):
            break                       # failure — raised below, no silence
        if snapshots is not None:
            cols.append(state[0])
    (u, t, _, _, steps, rejected, nk, want, info) = state
    stats.steps = int(steps)
    stats.rejected = int(rejected)
    stats.n_kiops = int(nk)
    stats.n_f_evals = (3 if scheme == "exprb43" else 2) * \
        (stats.steps + stats.rejected)
    stats.final_m = m
    stats.info = int(info)
    t_f = float(t)
    if stats.info == 0 and t_f < tf - 1e-14 * (tf - t0):
        stats.info = 2
    if stats.info:
        # no-silent-failure protocol (CLAUDE.md)
        reason = {1: "step size underflow",
                  2: f"attempt budget max_steps={max_steps} exceeded",
                  3: "non-finite state at fixed dt — reduce dt"
                  }[stats.info]
        raise FloatingPointError(
            f"{scheme}_device stopped at t={t_f:.6g} < tf={tf:.6g}: "
            f"{reason} (final m={m}; loosen tolerances, raise max_steps/"
            "m_max, or check f)")
    out = u if snapshots is None else jnp.stack(cols, axis=1)   # (n, nt)
    return (out, stats) if return_stats else out


@mxu_full_precision
def exprb32_device(f, u0, t_span, dt=None, *, adaptive=None, m: int = 20,
                   iop: int = 2, expm_method: str = "taylor",
                   m_max: int = 128, rtol=1e-6, atol=1e-9, phi_tol=None,
                   controller: str = "pi", max_steps: int = 100_000,
                   return_stats: bool = False, snapshots=None):
    """Device-resident exprb32 (see :func:`exprb43_device`): adaptive
    3(2) controller in one ``lax.while_loop`` per m bucket when
    ``adaptive=True`` (the default with ``dt=None``); finite-checked
    fixed steps of ``dt`` in the same program otherwise. ``snapshots``
    works in BOTH modes here (the fixed mode runs in the while-loop
    program, so forced endpoints just clamp the step that lands on
    each snapshot time)."""
    if adaptive is None:
        adaptive = dt is None
    if not adaptive and dt is None:
        raise ValueError("adaptive=False requires dt")
    if not adaptive and (float(dt) <= 0):
        raise ValueError("need dt > 0")
    return _run_exprb_device(
        "exprb32", 3, f, u0, t_span, dt, m=m, m_max=m_max, iop=iop,
        expm_method=expm_method, rtol=rtol, atol=atol, phi_tol=phi_tol,
        controller=controller, max_steps=max_steps,
        return_stats=return_stats, adaptive=adaptive, snapshots=snapshots)
