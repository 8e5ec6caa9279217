"""Distributed (mesh / shard_map) layer — see parallel/ops.py and
parallel/krylov.py."""

from .ops import (make_mesh, shard_vector, shard_banded,
                  LocalBandedOperator)
from .krylov import (expv_sharded, phiv_sharded, make_expv_step,
                     expv_chebyshev_sharded)
from .poly import expv_leja_sharded, expv_faber_sharded
from .gspmd import shard_operator
from .multihost import (initialize_distributed, make_global_mesh,
                        make_host_data_mesh)
from .stencil import shard_stencil, LocalStencilOperator

__all__ = [
    "make_mesh", "shard_vector", "shard_banded", "LocalBandedOperator",
    "expv_sharded", "phiv_sharded", "make_expv_step",
    "expv_chebyshev_sharded", "expv_leja_sharded", "expv_faber_sharded",
    "shard_operator",
    "shard_stencil", "LocalStencilOperator",
    "initialize_distributed", "make_global_mesh", "make_host_data_mesh",
]
