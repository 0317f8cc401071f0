"""Multi-chip sharding of the solve step.

Strategy (SURVEY.md §2.3, §7.1): shard the Morton-sorted fine vertex axis
over a 1-D device mesh — shards are multiples of the 32-node bank, so
domains never straddle a shard boundary. Coarse levels are <= N/32 nodes
and are replicated; their assembly reduces with a psum-like collective that
XLA inserts from sharding annotations (GSPMD). CG dot products become
cross-shard reductions automatically.

This module provides the GSPMD path: explicit NamedShardings on the solver
state + jit. A hand-fused shard_map/Pallas path for SpMV halo overlap is
the follow-up optimization layer.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SchwarzConfig
from ..ops.apply import ApplyState, precondition
from ..ops.blockcsr import BlockEll, spmv
from ..solver import SortMaps, compute_sort_maps, prepare_preconditioner
from .pcg import PcgResult, pcg


def make_mesh(devices=None, axis: str = "x") -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices).reshape(-1), (axis,))


def shard_system(mesh: Mesh, ell: BlockEll, axis: str = "x") -> BlockEll:
    """Place the ELL system row-partitioned over the mesh (vertex axis)."""
    row = NamedSharding(mesh, P(axis))
    return BlockEll(
        diag=jax.device_put(ell.diag, row),
        idx=jax.device_put(ell.idx, row),
        blocks=jax.device_put(ell.blocks, row),
        mask=jax.device_put(ell.mask, row),
    )


def solve_step(
    ell: BlockEll,
    maps: SortMaps,
    b: jnp.ndarray,
    cfg: SchwarzConfig,
    tol: float = 1e-4,
    max_iters: int = 200,
) -> PcgResult:
    """One full implicit step solve: prepare preconditioner + PCG.

    Pure function of device arrays; shard `ell`/`b` row-wise and jit over a
    mesh for multi-chip execution (GSPMD inserts the collectives: psum for
    CG dots and coarse-level assembly, all-gather for SpMV columns).
    """
    state = prepare_preconditioner(ell, maps, cfg)
    return pcg(
        lambda x: spmv(ell, x),
        lambda r: precondition(state, r, cfg),
        b,
        tol=tol,
        max_iters=max_iters,
    )


def sharded_solve_step(mesh: Mesh, cfg: SchwarzConfig, axis: str = "x",
                       tol: float = 1e-4, max_iters: int = 200):
    """jit-compiled solve_step with row shardings pinned on inputs/outputs."""
    row = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def step(ell: BlockEll, maps: SortMaps, b: jnp.ndarray) -> PcgResult:
        return solve_step(ell, maps, b, cfg, tol=tol, max_iters=max_iters)

    return jax.jit(
        step,
        in_shardings=(
            BlockEll(diag=row, idx=row, blocks=row, mask=row),
            SortMaps(sorted_to_orig=rep, orig_to_sorted=rep),
            row,
        ),
        out_shardings=PcgResult(x=row, iterations=rep, rel_residual=rep),
    )
