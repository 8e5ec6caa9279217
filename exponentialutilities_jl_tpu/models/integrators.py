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
           "etdrk4_device", "exprb43_device"]


@dataclasses.dataclass
class ExpIntStats:
    """Accepted/rejected step counts and φ-action tallies."""

    steps: int = 0
    rejected: int = 0
    n_f_evals: int = 0
    n_kiops: int = 0
    info: int = 0          # 0 ok; 1 dt underflow; 2 max_steps hit;
                           # 3 non-finite state in fixed-step mode


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
    return float(jnp.sqrt(jnp.mean(jnp.abs(err_vec / sc) ** 2)))


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


def _phi_comb_device(op, B, taus, m: int, iop: int, expm_method: str):
    """[Σ τ^k φ_k(τ·op) b_k for τ in taus] with ONE fixed-m augmented
    Krylov subspace, fully traceable (kiops' single-substep core without
    the adaptivity loop). B is (n, p+1) with p ≥ 1; taus > 0 traced
    scalars (static count)."""
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
    nu = jnp.where(pos, jnp.exp2(-ex), 1.0).astype(dt)
    mu = jnp.where(pos, jnp.exp2(ex), 1.0)
    aug = AugmentedOperator(op, B[:, 1:][:, ::-1] * nu)
    x0 = _kiops_x0(B[:, 0], jnp.zeros((), rdt), mu, p)
    Ks = build_subspace(aug, x0, m, iop=iop, hermitian=False)
    outs = []
    for tau in taus:
        F, _ = _aug_F(Ks.H, Ks.m_used, jnp.asarray(tau, rdt), m,
                      expm_method)
        coeffs = Ks.beta.astype(rdt) * F[:, 0].astype(rdt)
        outs.append((coeffs.astype(Ks.V.dtype) @ Ks.V[:, :n]).astype(dt))
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
def exprb43_device(f, u0, t_span, dt, *, m: int = 20, iop: int = 2,
                   expm_method: str = "taylor"):
    """Fixed-step exprb43 with the whole integration in one program
    (see :func:`etdrk4_device`): per step the Jacobian is re-linearized
    IN-TRACE (``JacobianOperator`` jvp — u is data, not a constant), two
    fixed-m augmented subspaces serve all five φ-terms."""
    t0, tf = float(t_span[0]), float(t_span[1])
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
    return u
