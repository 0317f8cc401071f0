"""Multi-host initialization helpers.

The reference has no distributed layer at all (SURVEY.md §2.3); on TPU
pods, multi-host runs need jax.distributed plus a mesh spanning all
processes. These helpers wrap the standard recipe so the solver's sharded
paths (parallel/sharded.py GSPMD, parallel/halo.py shard_map) work
unchanged across hosts: global arrays are constructed with
`jax.make_array_from_process_local_data` against the global mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_hosts(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op on a single process).

    On Cloud TPU pods the arguments auto-detect; pass them explicitly for
    other fabrics (coordinator = "host:port").
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "x") -> Mesh:
    """1-D mesh over every device of every participating process."""
    return Mesh(np.array(jax.devices()).reshape(-1), (axis,))


def shard_rows_across_hosts(mesh: Mesh, local_rows: np.ndarray, axis: str = "x"):
    """Assemble a row-sharded global array from per-process row slabs.

    Each process passes its own contiguous rows (bank-aligned); the result
    is a jax.Array laid out row-partitioned over the global mesh, ready for
    the sharded solve paths.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_rows)
