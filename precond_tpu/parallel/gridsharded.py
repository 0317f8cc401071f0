"""Multi-chip sharding of the structured-grid fast path.

The static grid pipeline (ops/gridassembly.py, ops/gridapply.py) is
GSPMD-friendly by construction: the fine vertex axis shards in bank
multiples (tile rows of the grid), restriction is a per-level reshape-sum
(a local reduce + one collective for the replicated coarse levels),
prolongation is a broadcast, and the stencil SpMV's window slices become
halo exchanges XLA inserts automatically. No index arrays exist to
reshard at all — the only communicated state is the thin SpMV halo, the
coarse residual/z levels, and the CG dot products.

This is the GSPMD grid path; parallel/halo.py remains the hand-scheduled
shard_map layer for the general (unstructured) pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SchwarzConfig
from ..ops import gridstencil
from ..ops.gridapply import precondition_grid
from ..ops.gridstencil import StencilSystem
from ..solver import prepare_grid
from ..utils import gridmorton as gm
from .pcg import PcgResult, pcg


def grid_solve_step(
    ssys: StencilSystem,
    diag_rows: jnp.ndarray,
    dirs_rows: jnp.ndarray,
    b: jnp.ndarray,
    offsets,
    k: int,
    cfg: SchwarzConfig,
    tol: float = 1e-4,
    max_iters: int = 200,
) -> PcgResult:
    """prepare_grid + grid-order PCG, pure function of device arrays."""
    # GSPMD cannot partition a pallas_call: the packed-symv storage is a
    # single-chip / shard_map feature, so this path pins dense inverses.
    # Row-major layout pinned too: under row-sharding every grid<->Morton
    # crossing is an all-to-all either way, and the comp-major form has
    # no multi-chip measurement yet (docs/ROADMAP.md "next perf levers").
    import dataclasses

    cfg = dataclasses.replace(cfg, symv_kernel="dense", solve_layout="rows")
    inv96 = prepare_grid(diag_rows, dirs_rows, offsets, k, cfg)

    def pre_op(r):
        rs = gm.grid_to_morton(r, k)
        return gm.morton_to_grid(precondition_grid(inv96, rs, cfg), k)

    return pcg(
        lambda v: gridstencil.spmv(ssys, v), pre_op, b,
        tol=tol, max_iters=max_iters,
    )


def grid_contact_solve_step(
    ssys: StencilSystem,
    diag_rows: jnp.ndarray,
    dirs_rows: jnp.ndarray,
    b: jnp.ndarray,
    stencils,
    ce,
    o2s: jnp.ndarray,
    offsets,
    k: int,
    cfg: SchwarzConfig,
    tol: float = 1e-4,
    max_iters: int = 200,
) -> PcgResult:
    """Contact-enabled grid solve: stencil Hessians in M (arithmetic
    climbs inside prepare_grid), contact ELL in the solved system."""
    import dataclasses

    from ..ops.contact import contact_spmv

    cfg = dataclasses.replace(
        cfg, symv_kernel="dense", solve_layout="rows"
    )  # see grid_solve_step
    inv96 = prepare_grid(diag_rows, dirs_rows, offsets, k, cfg, stencils, o2s)

    def pre_op(r):
        rs = gm.grid_to_morton(r, k)
        return gm.morton_to_grid(precondition_grid(inv96, rs, cfg), k)

    return pcg(
        lambda v: gridstencil.spmv(ssys, v) + contact_spmv(ce, v), pre_op, b,
        tol=tol, max_iters=max_iters,
    )


def sharded_grid_contact_solve_step(
    mesh: Mesh, cfg: SchwarzConfig, offsets, k: int, axis: str = "x",
    tol: float = 1e-4, max_iters: int = 200,
):
    """Contact-enabled sharded grid solve.

    The fine vertex axis shards as in sharded_grid_solve_step; collision
    state (stencils, contact ELL, the grid->tile map) is REPLICATED — the
    contact set is O(contacts), tiny next to the sharded system, and its
    scatter targets cross shard boundaries, so replication + XLA's
    automatic collectives beat any manual distribution at realistic
    contact densities.
    """
    row = NamedSharding(mesh, P(axis))
    d_row = NamedSharding(mesh, P(None, axis))
    vm3 = NamedSharding(mesh, P(None, None, axis))
    vm4 = NamedSharding(mesh, P(None, None, None, axis))
    rep = NamedSharding(mesh, P())

    def step(ssys, diag_rows, dirs_rows, b, stencils, ce, o2s):
        return grid_contact_solve_step(
            ssys, diag_rows, dirs_rows, b, stencils, ce, o2s,
            offsets, k, cfg, tol=tol, max_iters=max_iters,
        )

    grid_shape = (1 << k, 1 << k)
    return jax.jit(
        step,
        in_shardings=(
            StencilSystem(vm3, vm4, offsets, grid_shape, sym=False),
            row, d_row, row,
            jax.tree.map(lambda _: rep, _stencils_struct()),
            jax.tree.map(lambda _: rep, _ce_struct()),
            rep,
        ),
        out_shardings=PcgResult(x=row, iterations=rep, rel_residual=rep),
    )


def _stencils_struct():
    from ..ops.stencils import empty_stencils

    return empty_stencils()


def _ce_struct():
    from ..ops.contact import ContactEll

    z = jnp.zeros(())
    return ContactEll(rows=z, idx=z, blocks=z, mask=z, diag=z, dropped=z)


def sharded_grid_solve_step(mesh: Mesh, cfg: SchwarzConfig, offsets, k: int,
                            axis: str = "x", tol: float = 1e-4,
                            max_iters: int = 200, sym: bool = False):
    """jit-compiled grid_solve_step with the fine axis row-sharded.

    Vertex-axis shardings: diag_rows/dirs_rows/b over rows; the
    vertex-minor StencilSystem shards its trailing axis.
    """
    row = NamedSharding(mesh, P(axis))
    d_row = NamedSharding(mesh, P(None, axis))
    vm3 = NamedSharding(mesh, P(None, None, axis))
    vm4 = NamedSharding(mesh, P(None, None, None, axis))
    rep = NamedSharding(mesh, P())

    # ssys may hold only the canonical planes (sym=True); prepare always
    # takes the full +/- direction list (assemble_system_grid's layout).
    full = offsets if not sym else tuple(
        o for (di, dj) in offsets for o in ((di, dj), (-di, -dj))
    )

    def step(ssys, diag_rows, dirs_rows, b):
        return grid_solve_step(
            ssys, diag_rows, dirs_rows, b, full, k, cfg,
            tol=tol, max_iters=max_iters,
        )

    return jax.jit(
        step,
        in_shardings=(
            StencilSystem(vm3, vm4, offsets, (1 << k, 1 << k), sym=sym),
            row, d_row, row,
        ),
        out_shardings=PcgResult(x=row, iterations=rep, rel_residual=rep),
    )
