"""Analytic spatial sort for power-of-two vertex boxes (tet lattices).

3-D sibling of utils/gridmorton.py: a bank is a 4x4x2 vertex tile (= 32
nodes) and tiles are ranked by a round-robin bit interleave of their
(ti, tj, tk) coordinates, so every 32-rank group at every level is a
product of dyadic intervals — a contiguous box. The 5-tet cube
decomposition (models/tetmesh.py) contains all 12 cube edges, so axis
neighbors are always adjacent and every box of vertices is connected:
every bank at every level is ONE cluster and the hierarchy is the
arithmetic one (ops/gridapply.py), verified against the general builder
in tests/test_boxprep.py.
"""

from __future__ import annotations

import numpy as np

TILE = (4, 4, 2)  # (i, j, k) extents; 32 vertices = one Schwarz bank


def _is_pow2(v: int) -> bool:
    return v > 0 and (v & (v - 1)) == 0


def supported(nx: int, ny: int, nz: int) -> bool:
    return (
        all(_is_pow2(d) for d in (nx, ny, nz))
        and nx >= TILE[0] and ny >= TILE[1] and nz >= TILE[2]
    )


def _tile_rank(dims_t) -> np.ndarray:
    """Round-robin bit interleave of tile coords -> rank, row-major input.

    In round r, the r-th bit of each dimension that still has bits is
    appended (order i, j, k). Any fixed interleave gives nested dyadic
    boxes; round-robin keeps them near-cubical.
    """
    nti, ntj, ntk = dims_t
    ti, tj, tk = np.meshgrid(
        np.arange(nti), np.arange(ntj), np.arange(ntk), indexing="ij"
    )
    bits = [nti.bit_length() - 1, ntj.bit_length() - 1, ntk.bit_length() - 1]
    coords = [ti.astype(np.uint64), tj.astype(np.uint64), tk.astype(np.uint64)]
    rank = np.zeros_like(coords[0])
    out_bit = 0
    for r in range(max(bits) if bits else 0):
        for d in range(3):
            if r < bits[d]:
                rank |= ((coords[d] >> r) & 1) << out_bit
                out_bit += 1
    return rank.reshape(-1).astype(np.int64)  # row-major tile index -> rank


def _rank_to_tile(dims_t) -> np.ndarray:
    rank = _tile_rank(dims_t)
    out = np.empty_like(rank)
    out[rank] = np.arange(rank.size)
    return out


def box_to_morton(x, nx: int, ny: int, nz: int):
    """[N, ...] row-major box order -> tile order (transposes + tile gather)."""
    import jax.numpy as jnp

    t = (nx // TILE[0], ny // TILE[1], nz // TILE[2])
    lead = x.shape[1:]
    la = len(lead)
    tiles = (
        x.reshape((t[0], TILE[0], t[1], TILE[1], t[2], TILE[2]) + lead)
        .transpose((0, 2, 4, 1, 3, 5) + tuple(6 + a for a in range(la)))
        .reshape((t[0] * t[1] * t[2], 32) + lead)
    )
    n = nx * ny * nz
    return jnp.take(tiles, jnp.asarray(_rank_to_tile(t)), axis=0).reshape((n,) + lead)


def morton_to_box(x, nx: int, ny: int, nz: int):
    """Inverse of box_to_morton."""
    import jax.numpy as jnp

    t = (nx // TILE[0], ny // TILE[1], nz // TILE[2])
    lead = x.shape[1:]
    la = len(lead)
    banks = x.reshape((t[0] * t[1] * t[2], 32) + lead)
    tiles = jnp.take(banks, jnp.asarray(_tile_rank(t)), axis=0)
    n = nx * ny * nz
    return (
        tiles.reshape((t[0], t[1], t[2], TILE[0], TILE[1], TILE[2]) + lead)
        .transpose((0, 3, 1, 4, 2, 5) + tuple(6 + a for a in range(la)))
        .reshape((n,) + lead)
    )


def sort_maps(nx: int, ny: int, nz: int):
    """(sorted_to_orig, orig_to_sorted) np.int32 for an (nx,ny,nz) box."""
    assert supported(nx, ny, nz)
    t = (nx // TILE[0], ny // TILE[1], nz // TILE[2])
    rank = _tile_rank(t)
    r2t = np.empty_like(rank)
    r2t[rank] = np.arange(rank.size)
    ti = r2t // (t[1] * t[2])
    tj = (r2t // t[2]) % t[1]
    tk = r2t % t[2]
    wi, wj, wk = np.meshgrid(
        np.arange(TILE[0]), np.arange(TILE[1]), np.arange(TILE[2]), indexing="ij"
    )
    i = ti[:, None, None, None] * TILE[0] + wi[None]
    j = tj[:, None, None, None] * TILE[1] + wj[None]
    k = tk[:, None, None, None] * TILE[2] + wk[None]
    s2o = ((i * ny + j) * nz + k).reshape(-1).astype(np.int32)
    o2s = np.empty_like(s2o)
    o2s[s2o] = np.arange(s2o.size, dtype=np.int32)
    return s2o, o2s
