"""Axis-aligned bounding box of a point set.

The reference grows an AABB serially over all positions
(/root/reference/SeSchwarzPreconditioner.cpp:193-211, with a comment
lamenting MSVC's OpenMP 2.0 lack of custom reductions). On TPU this is a
two-lane min/max reduction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Aabb(NamedTuple):
    lower: jnp.ndarray  # f32[3]
    upper: jnp.ndarray  # f32[3]

    @property
    def extent(self) -> jnp.ndarray:
        # Zero-extent axes are padded so the unit-cube normalization below
        # never divides by zero (flat/degenerate meshes).
        e = self.upper - self.lower
        return jnp.where(e > 0, e, jnp.ones_like(e))


def compute_aabb(positions: jnp.ndarray) -> Aabb:
    """[N,3] -> Aabb."""
    return Aabb(lower=jnp.min(positions, axis=0), upper=jnp.max(positions, axis=0))


def to_unit_cube(positions: jnp.ndarray, aabb: Aabb) -> jnp.ndarray:
    """Normalize positions into [0,1]^3 (reference FillSortingData, cpp:219-235)."""
    return (positions - aabb.lower) / aabb.extent


# ---- predicates (reference SeAabb.h:109-178, vectorized over leading dims)


def grow(aabb: Aabb, points: jnp.ndarray) -> Aabb:
    """Enlarge to cover additional points ([...,3]); SeAabb.h:64-82."""
    pts = points.reshape(-1, 3)
    return Aabb(
        lower=jnp.minimum(aabb.lower, jnp.min(pts, axis=0)),
        upper=jnp.maximum(aabb.upper, jnp.max(pts, axis=0)),
    )


def contains(aabb: Aabb, p: jnp.ndarray, radius: float = 0.0) -> jnp.ndarray:
    """Point-in-box test, optionally with the box enlarged by `radius`.

    Reference IsContain (SeAabb.h:110-145). The reference's radius variant
    (SeAabb.h:124-129) builds the enlarged box and then calls
    IsContain(aabb, enlargedAabb) — passing a box where a point belongs, a
    bug that never compiles to the intended test; implemented correctly
    here. Vectorized: p is [...,3], returns bool[...]."""
    lo = aabb.lower - radius
    hi = aabb.upper + radius
    return jnp.all((p >= lo) & (p <= hi), axis=-1)


def overlaps(a: Aabb, b: Aabb) -> jnp.ndarray:
    """Box-box overlap. The reference declares IsOverlap but stubs it to
    `return false` (SeAabb.h:182) — implemented for real here."""
    return jnp.all((a.lower <= b.upper) & (b.lower <= a.upper), axis=-1)


def segment_intersects(aabb: Aabb, pa: jnp.ndarray, pb: jnp.ndarray) -> jnp.ndarray:
    """Segment-box slab test (reference IsIntersect, SeAabb.h:157-178).

    pa, pb are [...,3] segment endpoints; returns bool[...]. Matches the
    reference's conventions: zero direction components replaced by 1e-6,
    parameter range clipped to [0,1], strict inequality."""
    d = pb - pa
    d = jnp.where(d == 0.0, 1e-6, d)
    inv = 1.0 / d
    left = (aabb.lower - pa) * inv
    right = (aabb.upper - pa) * inv
    tmin = jnp.minimum(left, right)
    tmax = jnp.maximum(left, right)
    lo = jnp.maximum(jnp.max(tmin, axis=-1), 0.0)
    hi = jnp.minimum(jnp.min(tmax, axis=-1), 1.0)
    return lo < hi
