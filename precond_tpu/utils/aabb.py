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
