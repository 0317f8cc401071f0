"""Analytic spatial sort for power-of-two square grids.

The Schwarz hierarchy only needs a CONSISTENT spatial ordering whose
32-vertex banks are compact (the reference Morton-sorts positions purely
for that locality, SeSchwarzPreconditioner.cpp:213-243). For a 2^k x 2^k
grid we define the order analytically:

    bank   = Morton rank of the vertex's 8x4 grid tile
    lane   = row-major index within the tile

so crossing grid order <-> sorted order is ONE modest-rank transpose
(tiling) plus ONE per-bank row gather (T = N/32 rows of 32 vertices), not
an N-row permute gather. Measured at 1M vertices on v5e: ~0.25 ms per
crossing vs ~4.4 ms for take(x, perm) (~4.2 ns/row), and the 2-D analytic
order clusters slightly BETTER than the 3-D float Morton sort of a wavy
cloth (90 vs 139 PCG iterations at 65k, z_wave=0.02).

(A single bit-interleave expressed as a 2k-axis binary transpose lowers
badly — ~1.9 ms at 65k — hence the tile/bank split.)

The generic float-position Morton sort (utils/morton.py, reference
SeMorton.h:75-101) remains the path for unstructured meshes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

TILE_I, TILE_J = 8, 4  # 32 vertices per tile = one Schwarz bank


def _is_pow2(v: int) -> bool:
    return v > 0 and (v & (v - 1)) == 0


def supported(nx: int, ny: int) -> bool:
    """True when the analytic order applies (square power-of-two, >= 8x4)."""
    return nx == ny and _is_pow2(nx) and nx >= TILE_I


def _tile_rank(k: int) -> np.ndarray:
    """Morton-style rank of each 8x4 tile, row-major tile index -> rank.

    Tiles form a (2^(k-3), 2^(k-2)) grid: interleave ti with the high bits
    of tj and keep tj's lowest bit as the LSB (pairs of horizontally
    adjacent tiles stay together -> 8x8 supertiles, then Z-curve).
    """
    nti, ntj = 1 << (k - 3), 1 << (k - 2)
    ti, tj = np.meshgrid(np.arange(nti), np.arange(ntj), indexing="ij")
    hi = tj >> 1

    def spread(b):
        out = np.zeros_like(b, dtype=np.uint64)
        for t in range(k - 3):
            out |= ((b.astype(np.uint64) >> t) & 1) << (2 * t)
        return out

    rank = ((2 * spread(ti) + spread(hi)) << 1) | (tj & 1).astype(np.uint64)
    return rank.reshape(-1).astype(np.int64)          # [T]


def _rank_to_tile(k: int) -> np.ndarray:
    rank = _tile_rank(k)
    out = np.empty_like(rank)
    out[rank] = np.arange(rank.size)
    return out                                        # [T] rank -> tile


def sort_maps(k: int):
    """(sorted_to_orig, orig_to_sorted) np.int32 for a 2^k square grid."""
    n = 1 << k
    r2t = _rank_to_tile(k)                            # [T]
    ti, tj = r2t // (n // TILE_J), r2t % (n // TILE_J)
    wi, wj = np.meshgrid(np.arange(TILE_I), np.arange(TILE_J), indexing="ij")
    i = ti[:, None, None] * TILE_I + wi[None]
    j = tj[:, None, None] * TILE_J + wj[None]
    s2o = (i * n + j).reshape(-1).astype(np.int32)
    o2s = np.empty_like(s2o)
    o2s[s2o] = np.arange(s2o.size, dtype=np.int32)
    return s2o, o2s


def grid_to_morton(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """[4^k, ...] row-major -> analytic sorted order (transpose + bank gather)."""
    n = 1 << k
    lead = x.shape[1:]
    tiles = (
        x.reshape((n // TILE_I, TILE_I, n // TILE_J, TILE_J) + lead)
        .transpose((0, 2, 1, 3) + tuple(4 + a for a in range(len(lead))))
        .reshape((4**k // 32, 32) + lead)
    )
    return jnp.take(tiles, jnp.asarray(_rank_to_tile(k)), axis=0).reshape(
        (4**k,) + lead
    )


def morton_to_grid(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inverse of grid_to_morton."""
    n = 1 << k
    lead = x.shape[1:]
    banks = x.reshape((4**k // 32, 32) + lead)
    tiles = jnp.take(banks, jnp.asarray(_tile_rank(k)), axis=0)
    return (
        tiles.reshape((n // TILE_I, n // TILE_J, TILE_I, TILE_J) + lead)
        .transpose((0, 2, 1, 3) + tuple(4 + a for a in range(len(lead))))
        .reshape((4**k,) + lead)
    )
