"""Round-5 surface tour: scattered-degree SpMV, general matrix
functions, batched dense stacks, arbitrary precision.

Runs on any backend (CPU shown; on TPU the same calls pick up the
Pallas engines automatically — resident one-dispatch Chebyshev for 1-D,
plane sweeps for grids, clustered SELL for the sorted container).

    PYTHONPATH=/root/repo python examples/round5_tour.py
"""

import numpy as np
import scipy.linalg as sla
import scipy.sparse as sp

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import exponentialutilities_jl_tpu as eu

rng = np.random.default_rng(0)

# --- 1. scattered-degree sparse matrix → the sorted conjugated container
n = 2000
deg = np.full(n, 6)
deg[: n // 10] = 40                      # a few heavy rows ...
rng.shuffle(deg)                         # ... scattered anywhere
rows = np.repeat(np.arange(n), deg)
cols = np.clip(rows + rng.integers(-60, 60, rows.size), 0, n - 1)
vals = rng.standard_normal(rows.size) / deg[rows]
A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n))
A = (0.5 * (A + A.T) - sp.diags(np.full(n, 2.0))).tocoo()

op = eu.SellOperator.from_coo(A.row, A.col, A.data, n, mode="sorted",
                              dtype=np.float64, is_hermitian=True)
b = rng.standard_normal(n)
w = eu.expv(0.3, op, jnp.asarray(b), m=40)   # conjugation hoisted:
#   the whole Lanczos solve runs in the degree-sorted basis, two
#   permutes total (each itself a degree-1 SELL SpMV on TPU)
dense = np.asarray(A.todense())
print("sorted-SELL expv rel err:",
      np.linalg.norm(np.asarray(w) - sla.expm(0.3 * dense) @ b)
      / np.linalg.norm(b))

# --- 2. general matrix functions (non-normal, defective input allowed)
G = np.diag(np.linspace(-2, 2, 30)) + np.triu(rng.standard_normal((30, 30)), 1) * 0.4
L = np.asarray(eu.funm(G, "log"))        # device Parlett fixed point
print("funm log->exp roundtrip:",
      np.linalg.norm(sla.expm(L) - G) / np.linalg.norm(G))

# --- 3. batched dense stacks at MXU rate (one Padé branch per batch)
B = rng.standard_normal((16, 64, 64)) / 8
E = eu.expm(jnp.asarray(B))              # ndim > 2 → batched route
P = eu.phi(jnp.asarray(B), 2)            # (16, 3, 64, 64)
print("batched expm err:", max(
    np.linalg.norm(np.asarray(E[i]) - sla.expm(B[i]))
    / np.linalg.norm(sla.expm(B[i])) for i in range(4)))
print("phi stack shape:", P.shape)

# --- 4. arbitrary precision on the host (the 300-bit BigFloat tier)
X = eu.expm_mp(B[0][:6, :6], prec_bits=300)
print("expm_mp [0,0] at 300 bits:", X[0, 0])
