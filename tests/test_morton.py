"""Morton encode: device (hi,lo)-pair path vs. exact uint64 reference spec
(SeMorton.h:75-101), ordering, and permutation utilities."""

import jax.numpy as jnp
import numpy as np

from precond_tpu.utils import aabb, morton


def _rand_unit(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((n, 3), dtype=np.float32)


def test_jax_encode_matches_uint64_spec():
    pts = _rand_unit(4096)
    ref = morton.encode_np(pts)
    hi, lo = morton.encode_jax(jnp.asarray(pts))
    hi, lo = np.asarray(hi), np.asarray(lo)
    got = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    np.testing.assert_array_equal(got, ref)


def test_encode_clamps_outside_unit_cube():
    pts = np.array([[-1.0, 2.0, 0.5], [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]], np.float32)
    ref = morton.encode_np(pts)
    hi, lo = morton.encode_jax(jnp.asarray(pts))
    got = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | np.asarray(lo).astype(np.uint64)
    np.testing.assert_array_equal(got, ref)


def test_argsort_orders_by_key():
    pts = _rand_unit(2048, seed=1)
    keys = morton.encode_np(pts)
    perm = np.asarray(morton.argsort_morton(jnp.asarray(pts)))
    sorted_keys = keys[perm]
    assert np.all(sorted_keys[:-1] <= sorted_keys[1:])
    assert np.array_equal(np.sort(perm), np.arange(len(pts)))


def test_morton_locality_on_grid():
    # Consecutive Morton ranks on a regular grid must be spatially compact:
    # average distance between rank-adjacent points stays within a few cells.
    n = 32
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    pts = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3).astype(np.float32)
    unit = np.asarray(aabb.to_unit_cube(jnp.asarray(pts), aabb.compute_aabb(jnp.asarray(pts))))
    perm = np.asarray(morton.argsort_morton(jnp.asarray(unit)))
    ordered = pts[perm]
    jumps = np.linalg.norm(np.diff(ordered, axis=0), axis=1)
    assert jumps.mean() < 2.0
    assert np.median(jumps) <= np.sqrt(2) + 1e-6


def test_inverse_permutation():
    rng = np.random.default_rng(2)
    perm = rng.permutation(257)
    inv = np.asarray(morton.inverse_permutation(jnp.asarray(perm)))
    np.testing.assert_array_equal(inv[perm], np.arange(257))


def test_aabb_extent_degenerate():
    pts = jnp.zeros((5, 3))
    box = aabb.compute_aabb(pts)
    assert np.all(np.asarray(box.extent) == 1.0)
    unit = aabb.to_unit_cube(pts, box)
    assert np.all(np.isfinite(np.asarray(unit)))


def test_aabb_predicates():
    """contain / overlap / segment-slab (reference SeAabb.h:109-178; the
    radius-contain and IsOverlap variants are buggy/stubbed there and are
    implemented for real here)."""
    box = aabb.Aabb(lower=jnp.asarray([0.0, 0.0, 0.0]), upper=jnp.asarray([1.0, 2.0, 3.0]))

    pts = jnp.asarray([[0.5, 1.0, 1.5], [1.5, 1.0, 1.5], [-0.05, 0.0, 0.0]])
    np.testing.assert_array_equal(
        np.asarray(aabb.contains(box, pts)), [True, False, False])
    np.testing.assert_array_equal(
        np.asarray(aabb.contains(box, pts, radius=0.1)), [True, False, True])

    other = aabb.Aabb(lower=jnp.asarray([0.9, 1.9, 2.9]), upper=jnp.asarray([2.0, 3.0, 4.0]))
    disjoint = aabb.Aabb(lower=jnp.asarray([1.1, 0.0, 0.0]), upper=jnp.asarray([2.0, 1.0, 1.0]))
    assert bool(aabb.overlaps(box, other))
    assert not bool(aabb.overlaps(box, disjoint))

    pa = jnp.asarray([[-1.0, 1.0, 1.5], [-1.0, 3.0, 1.5], [0.2, 0.5, 0.5]])
    pb = jnp.asarray([[2.0, 1.0, 1.5], [2.0, 3.0, 1.5], [0.8, 0.5, 0.5]])
    hits = np.asarray(aabb.segment_intersects(box, pa, pb))
    np.testing.assert_array_equal(hits, [True, False, True])  # crossing, missing, inside

    grown = aabb.grow(box, jnp.asarray([[2.0, -1.0, 0.5]]))
    np.testing.assert_allclose(np.asarray(grown.upper), [2.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(grown.lower), [0.0, -1.0, 0.0])
