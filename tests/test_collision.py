"""Proximity detection geometry + end-to-end detect -> stencils -> prepare."""

import jax.numpy as jnp
import numpy as np

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth, collision
from precond_tpu.ops import stencils as st
from precond_tpu.solver import SchwarzPreconditioner


def test_point_triangle_closest():
    a = jnp.asarray([0.0, 0.0, 0.0])
    b = jnp.asarray([1.0, 0.0, 0.0])
    c = jnp.asarray([0.0, 1.0, 0.0])
    # interior projection
    bary, q = collision.point_triangle_closest(jnp.asarray([0.25, 0.25, 1.0]), a, b, c)
    np.testing.assert_allclose(np.asarray(q), [0.25, 0.25, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(bary), [0.5, 0.25, 0.25], atol=1e-6)
    # vertex region
    _, q = collision.point_triangle_closest(jnp.asarray([-1.0, -1.0, 0.5]), a, b, c)
    np.testing.assert_allclose(np.asarray(q), [0.0, 0.0, 0.0], atol=1e-6)
    # edge region
    _, q = collision.point_triangle_closest(jnp.asarray([0.5, -2.0, 0.0]), a, b, c)
    np.testing.assert_allclose(np.asarray(q), [0.5, 0.0, 0.0], atol=1e-6)


def test_segment_segment_closest():
    s, t = collision.segment_segment_closest(
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([1.0, 0.0, 0.0]),
        jnp.asarray([0.5, 1.0, 1.0]), jnp.asarray([0.5, -1.0, 1.0]),
    )
    np.testing.assert_allclose(float(s), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(t), 0.5, atol=1e-6)


def test_detect_vf_finds_nearby_vertex():
    # Flat 4x4 sheet + one hovering vertex just above the middle.
    mesh = cloth.make_grid(4, 4)
    pos = np.concatenate([mesh.positions, [[0.45, 0.45, 0.01]]]).astype(np.float32)
    vf = collision.detect_vf(jnp.asarray(pos), jnp.asarray(mesh.faces), 0.05, 100.0, 8)
    found = np.asarray(vf.v_id)
    assert (found == 16).any()  # the hovering vertex
    # normals unit-length for valid hits
    ok = found >= 0
    norms = np.linalg.norm(np.asarray(vf.normal)[ok], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_detect_to_prepare_roundtrip():
    # Two stacked sheets close enough to collide: detection feeds stencils,
    # prepare ingests them, and connectivity merges across the sheets.
    m1 = cloth.make_grid(6, 6)
    n1 = m1.num_verts
    pos = np.concatenate([m1.positions, m1.positions + [0, 0, 0.012]]).astype(np.float32)
    faces = np.concatenate([m1.faces, m1.faces + n1]).astype(np.int32)
    edges = np.concatenate([m1.edges, np.where(m1.edges >= 0, m1.edges + n1, -1)]).astype(np.int32)
    springs = np.concatenate([m1.springs, m1.springs + n1])
    stiffness = np.concatenate([m1.stiffness, m1.stiffness])
    mesh2 = cloth.ClothMesh(pos, edges, faces, springs, stiffness, m1.mass, m1.dt)
    ell = cloth.assemble_system(mesh2)

    vf = collision.detect_vf(jnp.asarray(pos), jnp.asarray(faces), 0.02, 500.0, 64)
    assert int((np.asarray(vf.v_id) >= 0).sum()) > 0
    sten = st.build_stencils(jnp.asarray(edges), jnp.asarray(faces), vf=vf)

    pre = SchwarzPreconditioner(SchwarzConfig())
    pre.allocate(pos)
    pre.prepare(ell, sten)
    assert not bool(pre.state.overflow)
    rng = np.random.default_rng(0)
    r = rng.standard_normal((2 * n1, 3)).astype(np.float32)
    z = np.asarray(pre.apply(jnp.asarray(r)))
    assert np.all(np.isfinite(z))


# ---- hash-grid broad phase ------------------------------------------------

def _two_layer(n=10, gap=0.012):
    m1 = cloth.make_grid(n, n)
    n1 = m1.num_verts
    pos = np.concatenate([m1.positions, m1.positions + [0, 0, gap]]).astype(np.float32)
    faces = np.concatenate([m1.faces, m1.faces + n1]).astype(np.int32)
    edges = np.concatenate(
        [m1.edges, np.where(m1.edges >= 0, m1.edges + n1, -1)]
    ).astype(np.int32)
    return pos, edges, faces


def _pair_set(ids_a, ids_b):
    a, b = np.asarray(ids_a), np.asarray(ids_b)
    ok = (a >= 0) & (b >= 0)
    return set(zip(a[ok].tolist(), b[ok].tolist()))


def test_vf_grid_matches_bruteforce():
    pos, edges, faces = _two_layer()
    vf_b = collision.detect_vf(jnp.asarray(pos), jnp.asarray(faces), 0.02, 1.0, 4096)
    vf_g, info = collision.detect_vf_grid(
        jnp.asarray(pos), jnp.asarray(faces), 0.02, 1.0, 4096,
        per_vertex_cap=32, cell_cap=16,
    )
    assert not bool(info.truncated)
    assert int(info.dropped) == 0
    assert _pair_set(vf_g.v_id, vf_g.f_id) == _pair_set(vf_b.v_id, vf_b.f_id)
    ok = np.asarray(vf_g.v_id) >= 0
    norms = np.linalg.norm(np.asarray(vf_g.normal)[ok], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_ee_grid_matches_bruteforce():
    pos, edges, faces = _two_layer()
    ee_b = collision.detect_ee(jnp.asarray(pos), jnp.asarray(edges), 0.015, 1.0, 4096)
    ee_g, info = collision.detect_ee_grid(
        jnp.asarray(pos), jnp.asarray(edges), 0.015, 1.0, 4096,
        per_edge_cap=32, cell_cap=32,
    )
    assert not bool(info.truncated)
    assert _pair_set(ee_g.e_id0, ee_g.e_id1) == _pair_set(ee_b.e_id0, ee_b.e_id1)


def test_ef_grid_matches_bruteforce():
    pos, edges, faces = _two_layer()
    ef_b = collision.detect_ef(
        jnp.asarray(pos), jnp.asarray(edges), jnp.asarray(faces), 0.02, 1.0, 4096
    )
    ef_g, info = collision.detect_ef_grid(
        jnp.asarray(pos), jnp.asarray(edges), jnp.asarray(faces), 0.02, 1.0, 4096,
        per_edge_cap=32, cell_cap=16,
    )
    assert not bool(info.truncated)
    assert _pair_set(ef_g.e_id, ef_g.f_id) == _pair_set(ef_b.e_id, ef_b.f_id)


def test_vf_grid_per_vertex_budget():
    # One vertex surrounded by many faces: the per-vertex cap bounds how
    # many pairs that vertex can claim, so other vertices keep theirs.
    pos, edges, faces = _two_layer()
    _, info_tight = collision.detect_vf_grid(
        jnp.asarray(pos), jnp.asarray(faces), 0.02, 1.0, 4096,
        per_vertex_cap=1, cell_cap=16,
    )
    vf, _ = collision.detect_vf_grid(
        jnp.asarray(pos), jnp.asarray(faces), 0.02, 1.0, 4096,
        per_vertex_cap=1, cell_cap=16,
    )
    vids = np.asarray(vf.v_id)
    vids = vids[vids >= 0]
    # no vertex appears more than once under cap=1
    assert np.unique(vids).size == vids.size


def test_vf_grid_chunked_equals_unchunked():
    pos, edges, faces = _two_layer()
    a, _ = collision.detect_vf_grid(
        jnp.asarray(pos), jnp.asarray(faces), 0.02, 1.0, 512,
        per_vertex_cap=8, cell_cap=16, chunk=64,
    )
    b, _ = collision.detect_vf_grid(
        jnp.asarray(pos), jnp.asarray(faces), 0.02, 1.0, 512,
        per_vertex_cap=8, cell_cap=16,
    )
    assert _pair_set(a.v_id, a.f_id) == _pair_set(b.v_id, b.f_id)


def test_vf_grid_dropped_counter():
    pos, edges, faces = _two_layer()
    _, info = collision.detect_vf_grid(
        jnp.asarray(pos), jnp.asarray(faces), 0.02, 1.0, 4,
        per_vertex_cap=8, cell_cap=16,
    )
    assert int(info.dropped) > 0
