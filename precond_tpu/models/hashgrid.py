"""Uniform-grid spatial binning for collision broad phase.

The reference's own detection lives in its host simulator (not shipped);
its L3 layer carries the AABB contain/overlap machinery a broad phase
needs (/root/reference/SeAabb.h:109-178). The round-1 detector built dense
[N,F]/[E,E] distance matrices — O(N·F) memory, unusable past ~10k verts.

TPU-native redesign: bin primitives into a uniform grid over the scene
AABB, sort primitive ids by cell key (one on-device argsort), and answer
"primitives near q" with 27 binary searches into the sorted key array plus
a bounded gather — all static shapes, no atomics, no host round-trips.

  build:  keys = linearized cell coords of each primitive's representative
          point; order = argsort(keys)                    -- O(P log P)
  query:  for each of the 27 neighbor cells: searchsorted(left/right) to
          get the [start,end) run of that cell, take up to `cap` ids from
          it                                              -- O(Q·27·log P)

Correctness contract: a query at q finds every primitive whose
representative point lies within one cell of q's cell. With cell size
>= (primitive radius + threshold), any primitive whose *surface* comes
within `threshold` of q has its representative point within that
neighborhood, so the narrow phase sees every true pair. Cells can hold
arbitrarily many primitives; only the first `cap` per cell are returned
(reported via the `truncated` flag).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

# Cells per axis cap: 2^10 per axis keeps the linearized key within i32.
GRID_MAX = 1024

_NEIGHBOR_OFFSETS = [
    (dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
]


class HashGrid(NamedTuple):
    keys: jnp.ndarray      # i32[P] sorted linearized cell keys
    order: jnp.ndarray     # i32[P] primitive id occupying each sorted slot
    origin: jnp.ndarray    # f32[3] scene AABB min
    inv_cell: jnp.ndarray  # f32[3] 1 / effective cell size per axis
    dims: jnp.ndarray      # i32[3] cells per axis (<= GRID_MAX)


def _cell_coords(points: jnp.ndarray, grid: HashGrid) -> jnp.ndarray:
    c = jnp.floor((points - grid.origin[None]) * grid.inv_cell[None]).astype(jnp.int32)
    return jnp.clip(c, 0, grid.dims[None] - 1)


def _linearize(c: jnp.ndarray, dims: jnp.ndarray) -> jnp.ndarray:
    return (c[..., 0] * dims[1] + c[..., 1]) * dims[2] + c[..., 2]


def build_grid(points: jnp.ndarray, cell_size: jnp.ndarray) -> HashGrid:
    """Bin representative points into cells of (at least) `cell_size`.

    `cell_size` may be a traced scalar (e.g. data-dependent primitive
    radius + threshold); shapes stay static. If the scene is larger than
    GRID_MAX cells per axis, cells grow to fit — more candidates per cell,
    never missed pairs.
    """
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    extent = jnp.maximum(hi - lo, 1e-12)
    cell = jnp.maximum(jnp.asarray(cell_size, jnp.float32), extent / GRID_MAX)
    dims = jnp.clip(jnp.ceil(extent / cell).astype(jnp.int32), 1, GRID_MAX)
    inv_cell = 1.0 / cell * jnp.ones((3,), jnp.float32)
    grid = HashGrid(
        keys=jnp.zeros((points.shape[0],), jnp.int32),
        order=jnp.zeros((points.shape[0],), jnp.int32),
        origin=lo,
        inv_cell=inv_cell,
        dims=dims,
    )
    keys = _linearize(_cell_coords(points, grid), dims)
    order = jnp.argsort(keys).astype(jnp.int32)
    return grid._replace(keys=jnp.take(keys, order), order=order)


def query(
    grid: HashGrid, points: jnp.ndarray, cap: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Candidate primitive ids near each query point.

    Returns (ids i32[Q, 27*cap], valid bool[Q, 27*cap], truncated bool[]):
    up to `cap` primitives from each of the 27 cells around the query's
    cell. `truncated` is True if any searched cell held more than `cap`
    primitives (raise `cap` or shrink cells to be exhaustive).
    """
    p = grid.keys.shape[0]
    base = _cell_coords(points, grid)                    # [Q,3]
    ids, valids, truncated = [], [], jnp.asarray(False)
    slots = jnp.arange(cap, dtype=jnp.int32)
    for off in _NEIGHBOR_OFFSETS:
        c = base + jnp.asarray(off, jnp.int32)[None]
        in_range = jnp.all((c >= 0) & (c < grid.dims[None]), axis=-1)  # [Q]
        key = _linearize(c, grid.dims)
        start = jnp.searchsorted(grid.keys, key, side="left").astype(jnp.int32)
        end = jnp.searchsorted(grid.keys, key, side="right").astype(jnp.int32)
        truncated = truncated | jnp.any(in_range & (end - start > cap))
        pos = start[:, None] + slots[None]               # [Q,cap]
        valid = (pos < end[:, None]) & in_range[:, None]
        ids.append(jnp.take(grid.order, jnp.clip(pos, 0, p - 1)))
        valids.append(valid)
    return (
        jnp.concatenate(ids, axis=1),
        jnp.concatenate(valids, axis=1),
        truncated,
    )
