"""Proximity detection: produces the EF/EE/VF sets the preconditioner eats.

The reference deliberately excludes detection (the host simulator passes
already-found proximity sets, SeSchwarzPreconditioner.cpp:67-72 /
SURVEY.md §1); a usable framework needs one. This is a vectorized
broad+narrow phase: candidate pruning by bounding-sphere distance, exact
point-triangle / segment-segment closest-point tests (Ericson, RTCD ch.5),
all jittable with static candidate budgets.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.stencils import EeSets, EfSets, VfSets
from .hashgrid import build_grid, query


def point_triangle_closest(p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                           c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest point on triangle abc to p. Returns (bary[...,3], point).

    Vectorized over leading dims; branch-free region selection.
    """
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom_in = va + vb + vc

    # interior barycentrics (guarded)
    v_in = vb / jnp.where(denom_in != 0, denom_in, 1.0)
    w_in = vc / jnp.where(denom_in != 0, denom_in, 1.0)

    # edge/vertex regions
    v_ab = d1 / jnp.where(d1 - d3 != 0, d1 - d3, 1.0)
    w_ac = d2 / jnp.where(d2 - d6 != 0, d2 - d6, 1.0)
    t_bc = (d4 - d3) / jnp.where((d4 - d3) + (d5 - d6) != 0, (d4 - d3) + (d5 - d6), 1.0)

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (~in_a) & (~in_b) & (~in_c) & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (~in_a) & (~in_b) & (~in_c) & (~on_ab) & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (~in_a) & (~in_b) & (~in_c) & (~on_ab) & (~on_ac) & (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    u = jnp.where(in_a, 1.0,
        jnp.where(in_b, 0.0,
        jnp.where(in_c, 0.0,
        jnp.where(on_ab, 1.0 - v_ab,
        jnp.where(on_ac, 1.0 - w_ac,
        jnp.where(on_bc, 0.0, 1.0 - v_in - w_in))))))
    v = jnp.where(in_a, 0.0,
        jnp.where(in_b, 1.0,
        jnp.where(in_c, 0.0,
        jnp.where(on_ab, v_ab,
        jnp.where(on_ac, 0.0,
        jnp.where(on_bc, 1.0 - t_bc, v_in))))))
    w = 1.0 - u - v
    bary = jnp.stack([u, v, w], -1)
    point = u[..., None] * a + v[..., None] * b + w[..., None] * c
    return bary, point


def segment_segment_closest(p1, q1, p2, q2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest points of segments p1q1 / p2q2: returns (s, t) parameters."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    f = jnp.sum(d2 * r, -1)
    c = jnp.sum(d1 * r, -1)
    b = jnp.sum(d1 * d2, -1)
    denom = a * e - b * b
    s = jnp.clip(jnp.where(denom != 0, (b * f - c * e) / jnp.where(denom != 0, denom, 1.0), 0.0), 0.0, 1.0)
    t = jnp.where(e != 0, (b * s + f) / jnp.where(e != 0, e, 1.0), 0.0)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip(jnp.where(e != 0, (b * t_cl - c) / jnp.where(a != 0, a, 1.0), s), 0.0, 1.0)
    return s, t_cl


class DetectInfo(NamedTuple):
    """Broad-phase health flags, the analogue of the reference's stencil
    overflow clamp + warning (cpp:312-316)."""

    truncated: jnp.ndarray  # bool[]: some grid cell exceeded cell_cap
    dropped: jnp.ndarray    # i32[]: true hits evicted by the global budget


def _chunked(fn, queries: jnp.ndarray, chunk: int):
    """lax.map `fn` over row-chunks of `queries` plus their global indices.

    fn((q_chunk f32[M,3], id_chunk i32[M])) -> pytree with leading dim M.
    Padded tail rows carry id = -1; fn must mask them out itself.
    """
    nq = queries.shape[0]
    ids = jnp.arange(nq, dtype=jnp.int32)
    if nq <= chunk:
        return fn((queries, ids))
    pad = (-nq) % chunk
    qp = jnp.concatenate([queries, jnp.broadcast_to(queries[:1], (pad, 3))])
    ip = jnp.concatenate([ids, jnp.full((pad,), -1, jnp.int32)])
    out = jax.lax.map(
        fn, (qp.reshape(-1, chunk, 3), ip.reshape(-1, chunk))
    )
    return jax.tree_util.tree_map(
        lambda a: a.reshape((-1,) + a.shape[2:])[:nq] if a.ndim > 1 else a, out
    )


def _compact(score: jnp.ndarray, max_pairs: int, *fields):
    """Global budget: keep the `max_pairs` best-scoring rows.

    score = -distance for hits, -inf otherwise. Returns (ok, dropped,
    *fields[top]) where dropped counts true hits beyond the budget."""
    flat = score.reshape(-1)
    k = min(max_pairs, flat.shape[0])
    top_score, top = jax.lax.top_k(flat, k)
    if k < max_pairs:
        top_score = jnp.concatenate([top_score, jnp.full((max_pairs - k,), -jnp.inf)])
        top = jnp.concatenate([top, jnp.zeros((max_pairs - k,), top.dtype)])
    ok = top_score > -jnp.inf
    dropped = jnp.maximum(jnp.sum(flat > -jnp.inf) - max_pairs, 0).astype(jnp.int32)
    return (ok, dropped) + tuple(f.reshape((-1,) + f.shape[score.ndim:])[top] for f in fields)


def _safe_normal(diff: jnp.ndarray) -> jnp.ndarray:
    nlen = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    return diff / jnp.where(nlen > 1e-12, nlen, 1.0)


def detect_vf_grid(
    positions: jnp.ndarray,
    faces: jnp.ndarray,
    threshold: float,
    stiffness: float,
    max_pairs: int,
    per_vertex_cap: int = 8,
    cell_cap: int = 8,
    chunk: int = 65536,
) -> Tuple[VfSets, DetectInfo]:
    """Hash-grid vertex-face proximity with a per-vertex stencil budget.

    Broad phase: faces binned by centroid with cell size >= face radius +
    threshold (so the 27-cell query is exhaustive, models/hashgrid.py).
    Each vertex keeps at most `per_vertex_cap` nearest faces (the
    reference budgets 32 stencils/vertex, cpp:187-188 — a global top-k
    would let one contact-dense region evict all stencils elsewhere), then
    the global `max_pairs` budget keeps the nearest of those.
    """
    fa = faces[:, :3]
    va = jnp.take(positions, fa[:, 0], axis=0)
    vb = jnp.take(positions, fa[:, 1], axis=0)
    vc = jnp.take(positions, fa[:, 2], axis=0)
    centroid = (va + vb + vc) / 3.0
    radius = jnp.sqrt(
        jnp.max(
            jnp.maximum(
                jnp.sum((va - centroid) ** 2, -1),
                jnp.maximum(
                    jnp.sum((vb - centroid) ** 2, -1),
                    jnp.sum((vc - centroid) ** 2, -1),
                ),
            )
        )
    )
    grid = build_grid(centroid, radius + threshold)
    kv = per_vertex_cap

    def process(args):
        q, vid = args
        cand, cvalid, trunc = query(grid, q, cell_cap)          # [M,C]
        tri = jnp.take(fa, cand, axis=0)                         # [M,C,3]
        a = jnp.take(positions, tri[..., 0], axis=0)
        b = jnp.take(positions, tri[..., 1], axis=0)
        c = jnp.take(positions, tri[..., 2], axis=0)
        bary, qp = point_triangle_closest(q[:, None], a, b, c)
        diff = q[:, None] - qp
        dist = jnp.linalg.norm(diff, axis=-1)
        own = jnp.any(tri == vid[:, None, None], axis=-1)
        hit = (dist < threshold) & ~own & cvalid & (vid >= 0)[:, None]
        score = jnp.where(hit, -dist, -jnp.inf)
        sc, si = jax.lax.top_k(score, kv)                        # [M,kv]
        take = lambda f: jnp.take_along_axis(f, si.reshape(si.shape + (1,) * (f.ndim - 2)), axis=1)
        return (
            sc,
            take(cand),
            take(bary)[..., :2],
            take(diff),
            jnp.broadcast_to(vid[:, None], sc.shape),
            trunc,
        )

    sc, fid, bary2, diff, vid, trunc = _chunked(process, positions, chunk)
    ok, dropped, sc_t, fid_t, bary_t, diff_t, vid_t = _compact(
        sc, max_pairs, sc, fid, bary2, diff, vid
    )
    sets = VfSets(
        v_id=jnp.where(ok, vid_t, -1),
        f_id=jnp.where(ok, fid_t, -1),
        stiff=jnp.full((max_pairs,), stiffness, jnp.float32),
        bary=bary_t,
        normal=_safe_normal(diff_t),
    )
    return sets, DetectInfo(truncated=jnp.any(trunc), dropped=dropped)


def detect_ee_grid(
    positions: jnp.ndarray,
    edges: jnp.ndarray,
    threshold: float,
    stiffness: float,
    max_pairs: int,
    per_edge_cap: int = 8,
    cell_cap: int = 8,
    chunk: int = 65536,
) -> Tuple[EeSets, DetectInfo]:
    """Hash-grid edge-edge proximity (non-adjacent pairs, i < j dedupe)."""
    e2 = edges[:, :2]
    p0 = jnp.take(positions, e2[:, 0], axis=0)
    p1 = jnp.take(positions, e2[:, 1], axis=0)
    mid = 0.5 * (p0 + p1)
    half = 0.5 * jnp.sqrt(jnp.max(jnp.sum((p1 - p0) ** 2, -1)))
    grid = build_grid(mid, 2.0 * half + threshold)
    kv = per_edge_cap

    def process(args):
        q, eid = args
        cand, cvalid, trunc = query(grid, q, cell_cap)           # [M,C]
        ce = jnp.take(e2, cand, axis=0)                          # [M,C,2]
        cp0 = jnp.take(positions, ce[..., 0], axis=0)
        cp1 = jnp.take(positions, ce[..., 1], axis=0)
        mp0 = jnp.take(positions, jnp.take(e2[:, 0], jnp.clip(eid, 0, None)), axis=0)
        mp1 = jnp.take(positions, jnp.take(e2[:, 1], jnp.clip(eid, 0, None)), axis=0)
        s, t = segment_segment_closest(mp0[:, None], mp1[:, None], cp0, cp1)
        c1 = mp0[:, None] + s[..., None] * (mp1 - mp0)[:, None]
        c2 = cp0 + t[..., None] * (cp1 - cp0)
        diff = c1 - c2
        dist = jnp.linalg.norm(diff, axis=-1)
        my = jnp.take(e2, jnp.clip(eid, 0, None), axis=0)        # [M,2]
        shares = jnp.any(ce[..., :, None] == my[:, None, None, :], axis=(-1, -2))
        hit = (
            (dist < threshold) & ~shares & cvalid
            & (cand > eid[:, None]) & (eid >= 0)[:, None]
        )
        score = jnp.where(hit, -dist, -jnp.inf)
        sc, si = jax.lax.top_k(score, kv)
        take = lambda f: jnp.take_along_axis(f, si.reshape(si.shape + (1,) * (f.ndim - 2)), axis=1)
        return (
            sc,
            take(cand),
            take(jnp.stack([s, t], -1)),
            take(diff),
            jnp.broadcast_to(eid[:, None], sc.shape),
            trunc,
        )

    sc, cid, st, diff, eid, trunc = _chunked(process, mid, chunk)
    ok, dropped, sc_t, cid_t, st_t, diff_t, eid_t = _compact(
        sc, max_pairs, sc, cid, st, diff, eid
    )
    sets = EeSets(
        e_id0=jnp.where(ok, eid_t, -1),
        e_id1=jnp.where(ok, cid_t, -1),
        stiff=jnp.full((max_pairs,), stiffness, jnp.float32),
        bary=st_t,
        normal=_safe_normal(diff_t),
    )
    return sets, DetectInfo(truncated=jnp.any(trunc), dropped=dropped)


def detect_ef_grid(
    positions: jnp.ndarray,
    edges: jnp.ndarray,
    faces: jnp.ndarray,
    threshold: float,
    stiffness: float,
    max_pairs: int,
    per_edge_cap: int = 8,
    cell_cap: int = 8,
    chunk: int = 65536,
) -> Tuple[EfSets, DetectInfo]:
    """Hash-grid edge-face proximity: edge midpoints queried against the
    face-centroid grid (cell size covers face radius + edge half-length +
    threshold so the 27-cell neighborhood is exhaustive)."""
    fa = faces[:, :3]
    e2 = edges[:, :2]
    va = jnp.take(positions, fa[:, 0], axis=0)
    vb = jnp.take(positions, fa[:, 1], axis=0)
    vc = jnp.take(positions, fa[:, 2], axis=0)
    centroid = (va + vb + vc) / 3.0
    fradius = jnp.sqrt(
        jnp.max(
            jnp.maximum(
                jnp.sum((va - centroid) ** 2, -1),
                jnp.maximum(
                    jnp.sum((vb - centroid) ** 2, -1),
                    jnp.sum((vc - centroid) ** 2, -1),
                ),
            )
        )
    )
    p0 = jnp.take(positions, e2[:, 0], axis=0)
    p1 = jnp.take(positions, e2[:, 1], axis=0)
    mid = 0.5 * (p0 + p1)
    ehalf = 0.5 * jnp.sqrt(jnp.max(jnp.sum((p1 - p0) ** 2, -1)))
    grid = build_grid(centroid, fradius + ehalf + threshold)
    kv = per_edge_cap

    def process(args):
        q, eid = args
        cand, cvalid, trunc = query(grid, q, cell_cap)           # [M,C]
        tri = jnp.take(fa, cand, axis=0)
        a = jnp.take(positions, tri[..., 0], axis=0)
        b = jnp.take(positions, tri[..., 1], axis=0)
        c = jnp.take(positions, tri[..., 2], axis=0)
        bary, qp = point_triangle_closest(q[:, None], a, b, c)
        diff = q[:, None] - qp
        dist = jnp.linalg.norm(diff, axis=-1)
        my = jnp.take(e2, jnp.clip(eid, 0, None), axis=0)
        shares = jnp.any(tri[..., :, None] == my[:, None, None, :], axis=(-1, -2))
        hit = (dist < threshold) & ~shares & cvalid & (eid >= 0)[:, None]
        score = jnp.where(hit, -dist, -jnp.inf)
        sc, si = jax.lax.top_k(score, kv)
        take = lambda f: jnp.take_along_axis(f, si.reshape(si.shape + (1,) * (f.ndim - 2)), axis=1)
        return (
            sc,
            take(cand),
            take(bary)[..., :2],
            take(diff),
            jnp.broadcast_to(eid[:, None], sc.shape),
            trunc,
        )

    sc, fid, bary2, diff, eid, trunc = _chunked(process, mid, chunk)
    ok, dropped, sc_t, fid_t, bary_t, diff_t, eid_t = _compact(
        sc, max_pairs, sc, fid, bary2, diff, eid
    )
    # EfSet bary layout (SeCollisionElements.h:33-40): x on the edge (the
    # midpoint sample -> 0.5), (y,z) on the face.
    bary3 = jnp.concatenate(
        [jnp.full((max_pairs, 1), 0.5, jnp.float32), bary_t], axis=1
    )
    sets = EfSets(
        e_id=jnp.where(ok, eid_t, -1),
        f_id=jnp.where(ok, fid_t, -1),
        stiff=jnp.full((max_pairs,), stiffness, jnp.float32),
        bary=bary3,
        normal=_safe_normal(diff_t),
    )
    return sets, DetectInfo(truncated=jnp.any(trunc), dropped=dropped)


def detect_vf(positions: jnp.ndarray, faces: jnp.ndarray, threshold: float,
              stiffness: float, max_pairs: int) -> VfSets:
    """Vertex-face proximity below `threshold`, excluding the face's own
    vertices. Static output budget `max_pairs` (invalid rows get id -1,
    matching the reference's negative-id convention, cpp:385)."""
    n = positions.shape[0]
    f = faces.shape[0]
    a = jnp.take(positions, faces[:, 0], axis=0)
    b = jnp.take(positions, faces[:, 1], axis=0)
    c = jnp.take(positions, faces[:, 2], axis=0)

    p = positions[:, None, :]                                # [N,1,3]
    bary, q = point_triangle_closest(p, a[None], b[None], c[None])  # [N,F,...]
    diff = p - q
    dist = jnp.linalg.norm(diff, axis=-1)
    own = (faces[None, :, 0] == jnp.arange(n)[:, None]) | \
          (faces[None, :, 1] == jnp.arange(n)[:, None]) | \
          (faces[None, :, 2] == jnp.arange(n)[:, None])
    hit = (dist < threshold) & ~own

    flat = hit.reshape(-1)
    score = jnp.where(flat, -dist.reshape(-1), -jnp.inf)
    top = jax.lax.top_k(score, max_pairs)[1]
    ok = jnp.take(flat, top)
    vids = (top // f).astype(jnp.int32)
    fids = (top % f).astype(jnp.int32)
    normal = diff.reshape(-1, 3)[top]
    nlen = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.where(nlen > 1e-12, nlen, 1.0)
    return VfSets(
        v_id=jnp.where(ok, vids, -1),
        f_id=jnp.where(ok, fids, -1),
        stiff=jnp.full((max_pairs,), stiffness, jnp.float32),
        bary=bary.reshape(-1, 3)[top][:, :2],
        normal=normal,
    )


def detect_ef(positions: jnp.ndarray, edges: jnp.ndarray, faces: jnp.ndarray,
              threshold: float, stiffness: float, max_pairs: int) -> "EfSets":
    """Edge-face proximity: edge midspan points near (or crossing) a face.

    Samples the edge at its closest approach to each triangle plane and
    reports pairs below `threshold`, excluding edges sharing a vertex with
    the face. Bary layout matches EfSet (SeCollisionElements.h:33-40):
    (x) along the edge, (y,z) on the face.
    """
    from ..ops.stencils import EfSets

    e = edges.shape[0]
    f = faces.shape[0]
    p0 = jnp.take(positions, edges[:, 0], axis=0)
    p1 = jnp.take(positions, edges[:, 1], axis=0)
    mid = 0.5 * (p0 + p1)

    a = jnp.take(positions, faces[:, 0], axis=0)
    b = jnp.take(positions, faces[:, 1], axis=0)
    c = jnp.take(positions, faces[:, 2], axis=0)

    bary, q = point_triangle_closest(mid[:, None], a[None], b[None], c[None])  # [E,F,..]
    diff = mid[:, None] - q
    dist = jnp.linalg.norm(diff, axis=-1)

    shares = jnp.zeros((e, f), bool)
    for ei in range(2):
        for fi in range(3):
            shares = shares | (edges[:, None, ei] == faces[None, :, fi])
    hit = (dist < threshold) & ~shares

    flat = hit.reshape(-1)
    score = jnp.where(flat, -dist.reshape(-1), -jnp.inf)
    top = jax.lax.top_k(score, max_pairs)[1]
    ok = jnp.take(flat, top)
    eids = (top // f).astype(jnp.int32)
    fids = (top % f).astype(jnp.int32)
    normal = diff.reshape(-1, 3)[top]
    nlen = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.where(nlen > 1e-12, nlen, 1.0)
    bf = bary.reshape(-1, 3)[top]
    # (edge t = 0.5 at midspan sample, face y,z)
    bary3 = jnp.concatenate([jnp.full((max_pairs, 1), 0.5, jnp.float32), bf[:, :2]], axis=1)
    return EfSets(
        e_id=jnp.where(ok, eids, -1),
        f_id=jnp.where(ok, fids, -1),
        stiff=jnp.full((max_pairs,), stiffness, jnp.float32),
        bary=bary3,
        normal=normal,
    )


def detect_ee(positions: jnp.ndarray, edges: jnp.ndarray, threshold: float,
              stiffness: float, max_pairs: int) -> EeSets:
    """Edge-edge proximity below `threshold` for non-adjacent edge pairs."""
    e = edges.shape[0]
    p1 = jnp.take(positions, edges[:, 0], axis=0)
    q1 = jnp.take(positions, edges[:, 1], axis=0)

    s, t = segment_segment_closest(p1[:, None], q1[:, None], p1[None], q1[None])
    c1 = p1[:, None] + s[..., None] * (q1 - p1)[:, None]
    c2 = p1[None] + t[..., None] * (q1 - p1)[None]
    diff = c1 - c2
    dist = jnp.linalg.norm(diff, axis=-1)

    shares = (
        (edges[:, None, 0] == edges[None, :, 0]) | (edges[:, None, 0] == edges[None, :, 1])
        | (edges[:, None, 1] == edges[None, :, 0]) | (edges[:, None, 1] == edges[None, :, 1])
    )
    upper = jnp.arange(e)[:, None] < jnp.arange(e)[None, :]
    hit = (dist < threshold) & ~shares & upper

    flat = hit.reshape(-1)
    score = jnp.where(flat, -dist.reshape(-1), -jnp.inf)
    top = jax.lax.top_k(score, max_pairs)[1]
    ok = jnp.take(flat, top)
    e0 = (top // e).astype(jnp.int32)
    e1 = (top % e).astype(jnp.int32)
    normal = diff.reshape(-1, 3)[top]
    nlen = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.where(nlen > 1e-12, nlen, 1.0)
    bary = jnp.stack([s.reshape(-1)[top], t.reshape(-1)[top]], -1)
    return EeSets(
        e_id0=jnp.where(ok, e0, -1),
        e_id1=jnp.where(ok, e1, -1),
        stiff=jnp.full((max_pairs,), stiffness, jnp.float32),
        bary=bary,
        normal=normal,
    )
