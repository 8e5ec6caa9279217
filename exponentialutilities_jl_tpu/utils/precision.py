"""Matmul-precision control.

On TPU, XLA's default matmul precision for float32 is bf16-grade (one MXU
pass) — fine for neural nets, catastrophic for a numerics library
(measured: degree-13 Padé exp at 6.7e-3 relative error instead of ~1e-6).
Every compute-path function in this package is wrapped with
``mxu_full_precision`` so its matmuls are traced under
``jax.default_matmul_precision("highest")`` (6-pass f32 on the MXU).
Users who explicitly want bf16-grade speed can set a lower precision
inside their own ``jax.default_matmul_precision`` context — this wrapper
only sets the default for the library's traces.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["mxu_full_precision"]


def mxu_full_precision(fn):
    """Decorator: trace ``fn`` with matmul precision 'highest'."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
