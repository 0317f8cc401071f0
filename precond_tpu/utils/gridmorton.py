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

import functools

import jax
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


# ---- selector-matmul crossing -------------------------------------------
# The reshape/transpose crossing above moves elements across lane tiles
# with a 3-wide minor dim. The same (row-slab, col-tile) transpose is a
# fixed permutation, so it can ride the MXU as a 0/1 selector matmul
# (exact under HIGHEST precision: each output is a sum with exactly one
# nonzero product) followed by a cheap per-bank row take.
#
# Measured composition behavior on v5e at 65k (the reason crossing_pair
# currently always returns the streaming form): inside a straight
# fori_loop PCG chain the matmul form wins 0.41 -> 0.34 ms/iter
# (bit-identical), but inside the production lax.while_loop solve the
# fixed carry layouts force relayout copies around the einsum and it
# LOSES 0.394 -> 0.428 ms/iter; at 1M the selector is [2048,2048] and the
# O(N^1.5) FLOPs lose outright (8.7 vs 10.1 ms/iter in the chain).

_MM_MAX_K = -1  # while-loop composition currently always favors streaming


@functools.lru_cache(maxsize=8)
def _slab_selector(k: int) -> np.ndarray:
    """P[(ct*TILE_I+wi), (wi*nct+ct)] = 1: per-slab (wi, ct) transpose."""
    n = 1 << k
    nct = n // TILE_J
    p = np.zeros((nct * TILE_I, TILE_I * nct), np.float32)
    wi = np.repeat(np.arange(TILE_I), nct)
    ct = np.tile(np.arange(nct), TILE_I)
    p[ct * TILE_I + wi, wi * nct + ct] = 1.0
    return p


def grid_to_morton_mm(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """grid_to_morton as selector matmul + bank take (bit-identical)."""
    n = 1 << k
    nslab, nct = n // TILE_I, n // TILE_J
    lead = x.shape[1:]
    w = int(np.prod(lead)) if lead else 1
    xr = x.reshape(nslab, TILE_I * nct, TILE_J * w)
    y = jnp.einsum(
        "ij,rjk->rik", jnp.asarray(_slab_selector(k)), xr,
        precision=jax.lax.Precision.HIGHEST,
    )
    tiles = y.reshape(nslab * nct, TILE_I * TILE_J * w)
    return jnp.take(tiles, jnp.asarray(_rank_to_tile(k)), axis=0).reshape(
        (4**k,) + lead
    )


def morton_to_grid_mm(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inverse of grid_to_morton_mm (transposed selector, rank take)."""
    n = 1 << k
    nslab, nct = n // TILE_I, n // TILE_J
    lead = x.shape[1:]
    w = int(np.prod(lead)) if lead else 1
    banks = x.reshape(nslab * nct, TILE_I * TILE_J * w)
    tiles = jnp.take(banks, jnp.asarray(_tile_rank(k)), axis=0)
    y = jnp.einsum(
        "ji,rjk->rik", jnp.asarray(_slab_selector(k)),
        tiles.reshape(nslab, TILE_I * nct, TILE_J * w),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape((4**k,) + lead)


def crossing_pair(k: int):
    """(grid_to_morton, morton_to_grid) best for iteration vectors at 2^k."""
    if k <= _MM_MAX_K:
        return grid_to_morton_mm, morton_to_grid_mm
    return grid_to_morton, morton_to_grid


# ---- patch-Morton crossing ----------------------------------------------
# The analytic order factors EXACTLY as "Morton over 32x32 grid patches,
# fixed 1024-permutation within each patch": for tile (ti, tj) write
# ti = 4a+u, tj = 8b+(2v+w') with u, v two bits and hi = tj>>1 = 4b+v;
# then spread(ti) = spread(u) + (spread(a) << 4), so
#   rank = [(2 spread(u) + spread(v)) << 1 | w']  +  [(2 spread(a) + spread(b)) << 5]
# and the bracketed low 5+5 bits sweep all of [0,1024) within one patch.
# Hence crossing = ONE (32,32)-tile-granular transpose (moved axis is
# 32-wide: pure (8,128)-tile block moves, unlike the 3/4-minor transposes
# above) + ONE row gather of N/1024 patch rows + ONE FIXED [1024,1024]
# one-hot selector matmul (bit-exact under HIGHEST: each output row has
# exactly one nonzero product). O(N*1024) MXU FLOPs at ANY n — the slab
# selector's O(N^1.5) growth is gone.

_PATCH = 32  # 4x8 tiles = 32 banks = 1024 vertices per patch


@functools.lru_cache(maxsize=1)
def _patch_perm() -> np.ndarray:
    """perm[1024]: bank-flat position p holds patch-local grid index perm[p]."""
    i, j = np.meshgrid(np.arange(_PATCH), np.arange(_PATCH), indexing="ij")
    ti, tj = i >> 3, j >> 2
    lane = (i & 7) * TILE_J + (j & 3)
    sp2 = lambda t: (t & 1) + ((t >> 1) & 1) * 4  # noqa: E731
    bank = ((2 * sp2(ti) + sp2(tj >> 1)) << 1) | (tj & 1)
    perm = np.empty(_PATCH * _PATCH, np.int64)
    perm[(bank * 32 + lane).ravel()] = (i * _PATCH + j).ravel()
    return perm


@functools.lru_cache(maxsize=1)
def _patch_selector() -> np.ndarray:
    """S[1024,1024] one-hot: (S @ x_gridflat) = x in bank-flat order."""
    s = np.zeros((1024, 1024), np.float32)
    s[np.arange(1024), _patch_perm()] = 1.0
    return s


@functools.lru_cache(maxsize=8)
def _patch_rank(k: int) -> np.ndarray:
    """Morton rank of each 32x32 patch, row-major patch index -> rank."""
    m = 1 << (k - 5)
    a, b = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")

    def spread(t):
        out = np.zeros_like(t, dtype=np.uint64)
        for q in range(max(k - 5, 1)):
            out |= ((t.astype(np.uint64) >> q) & 1) << (2 * q)
        return out

    return (2 * spread(a) + spread(b)).reshape(-1).astype(np.int64)


@functools.lru_cache(maxsize=8)
def _rank_to_patch(k: int) -> np.ndarray:
    r = _patch_rank(k)
    out = np.empty_like(r)
    out[r] = np.arange(r.size)
    return out


def grid_to_morton_patch(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """grid_to_morton via the patch factorization (bit-identical)."""
    assert k >= 5, "patch crossing needs a >=32x32 grid"
    n = 1 << k
    m = n // _PATCH
    lead = x.shape[1:]
    w = int(np.prod(lead)) if lead else 1
    tiles = (
        x.reshape(m, _PATCH, m, _PATCH * w)
        .transpose(0, 2, 1, 3)
        .reshape(m * m, _PATCH * _PATCH, w)
    )
    xp = jnp.take(tiles, jnp.asarray(_rank_to_patch(k)), axis=0)
    out = jnp.einsum(
        "xy,pyw->pxw", jnp.asarray(_patch_selector()), xp,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape((4**k,) + lead)


def grid_to_morton_cm(xt: jnp.ndarray, k: int) -> jnp.ndarray:
    """Component-major crossing: [w, 4^k] grid-flat -> [w, 4^k] sorted.

    The MXU-efficient orientation of the patch factorization: the payload
    axis w rides the matmul M-dim ([w*P, 1024] @ S^T, no 128-lane padding
    waste), the moved transpose axis is 32-wide (tile-granular), and the
    patch gather is w*4 KB rows. The comp-major solve path's crossing.
    """
    assert k >= 5
    n = 1 << k
    m = n // _PATCH
    w = xt.shape[0]
    tiles = (
        xt.reshape(w, m, _PATCH, m, _PATCH)
        .transpose(0, 1, 3, 2, 4)
        .reshape(w, m * m, _PATCH * _PATCH)
    )
    xp = jnp.take(tiles, jnp.asarray(_rank_to_patch(k)), axis=1)
    out = jnp.matmul(
        xp.reshape(w * m * m, _PATCH * _PATCH),
        jnp.asarray(_patch_selector()).T,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(w, 4**k)


def morton_to_grid_cm(xt: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inverse of grid_to_morton_cm."""
    assert k >= 5
    n = 1 << k
    m = n // _PATCH
    w = xt.shape[0]
    y = jnp.matmul(
        xt.reshape(w * m * m, _PATCH * _PATCH),
        jnp.asarray(_patch_selector()),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(w, m * m, _PATCH * _PATCH)
    tiles = jnp.take(y, jnp.asarray(_patch_rank(k)), axis=1)
    return (
        tiles.reshape(w, m, m, _PATCH, _PATCH)
        .transpose(0, 1, 3, 2, 4)
        .reshape(w, 4**k)
    )


def morton_to_grid_patch(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inverse of grid_to_morton_patch (transposed selector, rank take)."""
    assert k >= 5
    n = 1 << k
    m = n // _PATCH
    lead = x.shape[1:]
    w = int(np.prod(lead)) if lead else 1
    xp = x.reshape(m * m, _PATCH * _PATCH, w)
    y = jnp.einsum(
        "yx,pyw->pxw", jnp.asarray(_patch_selector()), xp,
        precision=jax.lax.Precision.HIGHEST,
    )
    tiles = jnp.take(y, jnp.asarray(_patch_rank(k)), axis=0)
    return (
        tiles.reshape(m, m, _PATCH, _PATCH * w)
        .transpose(0, 2, 1, 3)
        .reshape((4**k,) + lead)
    )
