"""Collision stencils: EF/EE/VF proximity sets -> unified stencils.

Reference: SeCollisionElements.h:33-69 (the POD contract between host
collision detection and the preconditioner) and PrepareCollisionStencils
(cpp:304-413), which flattens the three set types into `Stencil`s with
signed barycentric weights:

  EF (cpp:335-353): 5 verts (2 edge + 3 face), w = (b0, 1-b0, -b1, -b2, -(1-b1-b2))
  EE (cpp:356-380): 4 verts (2 + 2),           w = (b0, 1-b0, -b1, -(1-b1))
  VF (cpp:381-405): 4 verts (3 face + vertex),  w = (-b0, -b1, -(1-b0-b1), 1)

Note: the reference's VF branch reads `m_bary[2]` from a Float2 (cpp:399)
— an out-of-bounds read. We implement the physically consistent weight
-(1-b0-b1) for the third face vertex (weights of each primitive sum to ±1).

The reference appends stencils with an atomic counter, making stencil order
nondeterministic (cpp:407); here the order is fixed (EF, EE, VF) so builds
are bit-reproducible.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .assembly import CollisionTerms
from .hierarchy import StencilPairs

MAX_STENCIL_VERTS = 5
# static (ita, itb) combos, ita < itb (cpp:534-536)
_COMBOS = [(a, b) for a in range(MAX_STENCIL_VERTS) for b in range(a + 1, MAX_STENCIL_VERTS)]


class EfSets(NamedTuple):
    """Edge-face proximity pairs (SeCollisionElements.h:33-40)."""
    e_id: jnp.ndarray    # i32[M]
    f_id: jnp.ndarray    # i32[M]
    stiff: jnp.ndarray   # f32[M]
    bary: jnp.ndarray    # f32[M,3]: (x) on edge, (y,z) on face
    normal: jnp.ndarray  # f32[M,3]


class EeSets(NamedTuple):
    """Edge-edge proximity pairs (SeCollisionElements.h:51-58)."""
    e_id0: jnp.ndarray
    e_id1: jnp.ndarray
    stiff: jnp.ndarray
    bary: jnp.ndarray    # f32[M,2]
    normal: jnp.ndarray


class VfSets(NamedTuple):
    """Vertex-face proximity pairs (SeCollisionElements.h:42-49)."""
    v_id: jnp.ndarray
    f_id: jnp.ndarray
    stiff: jnp.ndarray
    bary: jnp.ndarray    # f32[M,2]
    normal: jnp.ndarray


class Stencils(NamedTuple):
    """Unified collision stencil array (reference Stencil, h:60-69)."""
    idx: jnp.ndarray       # i32[S,5] vertex ids
    weight: jnp.ndarray    # f32[S,5] signed barycentric weights
    nverts: jnp.ndarray    # i32[S] in {4,5}
    nfirst: jnp.ndarray    # i32[S] verts of the first primitive
    stiff: jnp.ndarray     # f32[S]
    direction: jnp.ndarray # f32[S,3] repulsion direction
    valid: jnp.ndarray     # bool[S]

    @property
    def count(self) -> int:
        return self.idx.shape[0]


def build_stencils(
    edges: jnp.ndarray,
    faces: jnp.ndarray,
    ef: EfSets | None = None,
    ee: EeSets | None = None,
    vf: VfSets | None = None,
) -> Stencils:
    """Flatten EF/EE/VF sets into stencils (PrepareCollisionStencils).

    edges: i32[E,4] (two endpoints first, h:48); faces: i32[F,3].
    Negative primitive ids mark invalid entries (cpp:330,359,385).
    """
    parts = []

    def _part(idx, w, nv, nf, stiff, direction, valid):
        s = idx.shape[0]
        idx5 = jnp.zeros((s, 5), jnp.int32).at[:, : idx.shape[1]].set(idx.astype(jnp.int32))
        w5 = jnp.zeros((s, 5), jnp.float32).at[:, : w.shape[1]].set(w)
        parts.append(
            Stencils(
                idx=idx5, weight=w5,
                nverts=jnp.full((s,), nv, jnp.int32),
                nfirst=jnp.full((s,), nf, jnp.int32),
                stiff=stiff.astype(jnp.float32),
                direction=direction.astype(jnp.float32),
                valid=valid,
            )
        )

    if ef is not None and ef.e_id.shape[0]:
        ok = (ef.e_id >= 0) & (ef.f_id >= 0)
        e = jnp.take(edges, jnp.clip(ef.e_id, 0, None), axis=0)
        f = jnp.take(faces, jnp.clip(ef.f_id, 0, None), axis=0)
        idx = jnp.concatenate([e[:, :2], f[:, :3]], axis=1)
        b = ef.bary
        w = jnp.stack(
            [b[:, 0], 1.0 - b[:, 0], -b[:, 1], -b[:, 2], -(1.0 - b[:, 1] - b[:, 2])], axis=1
        )
        _part(idx, w, 5, 2, ef.stiff, ef.normal, ok)

    if ee is not None and ee.e_id0.shape[0]:
        ok = (ee.e_id0 >= 0) & (ee.e_id1 >= 0)
        e0 = jnp.take(edges, jnp.clip(ee.e_id0, 0, None), axis=0)
        e1 = jnp.take(edges, jnp.clip(ee.e_id1, 0, None), axis=0)
        idx = jnp.concatenate([e0[:, :2], e1[:, :2]], axis=1)
        b = ee.bary
        w = jnp.stack([b[:, 0], 1.0 - b[:, 0], -b[:, 1], -(1.0 - b[:, 1])], axis=1)
        _part(idx, w, 4, 2, ee.stiff, ee.normal, ok)

    if vf is not None and vf.v_id.shape[0]:
        ok = (vf.v_id >= 0) & (vf.f_id >= 0)
        f = jnp.take(faces, jnp.clip(vf.f_id, 0, None), axis=0)
        idx = jnp.concatenate([f[:, :3], vf.v_id[:, None]], axis=1)
        b = vf.bary
        w = jnp.stack([-b[:, 0], -b[:, 1], -(1.0 - b[:, 0] - b[:, 1]), jnp.ones_like(b[:, 0])], axis=1)
        _part(idx, w, 4, 3, vf.stiff, vf.normal, ok)

    if not parts:
        return empty_stencils()
    return Stencils(*[jnp.concatenate(cols) for cols in zip(*parts)])


def empty_stencils() -> Stencils:
    return Stencils(
        idx=jnp.zeros((0, 5), jnp.int32),
        weight=jnp.zeros((0, 5), jnp.float32),
        nverts=jnp.zeros((0,), jnp.int32),
        nfirst=jnp.zeros((0,), jnp.int32),
        stiff=jnp.zeros((0,), jnp.float32),
        direction=jnp.zeros((0, 3), jnp.float32),
        valid=jnp.zeros((0,), bool),
    )


def stencil_pairs(mapped: Stencils) -> StencilPairs:
    """Cross-primitive pairs for connectivity injection (cpp:534-552)."""
    a = jnp.stack([mapped.idx[:, ca] for ca, _ in _COMBOS], axis=1)
    b = jnp.stack([mapped.idx[:, cb] for _, cb in _COMBOS], axis=1)
    ca = jnp.asarray([c for c, _ in _COMBOS])
    cb = jnp.asarray([c for _, c in _COMBOS])
    valid = (
        mapped.valid[:, None]
        & (ca[None] < mapped.nfirst[:, None])
        & (cb[None] >= mapped.nfirst[:, None])
        & (cb[None] < mapped.nverts[:, None])
    )
    return StencilPairs(a=a.reshape(-1), b=b.reshape(-1), valid=valid.reshape(-1))


def collision_terms(mapped: Stencils) -> CollisionTerms:
    """Rank-1 collision Hessian terms (PrepareCollisionHessian, cpp:1201-1227).

    hmat = stiff * d d^T; the diagonal gets w_i^2 * hmat per stencil vertex,
    every (unordered) vertex pair gets w_a * w_b * hmat routed to its common
    bank. Unlike connectivity injection, *all* pairs count here, not just
    cross-primitive ones (cpp:1219-1224).
    """
    d = mapped.direction
    hmat = mapped.stiff[:, None, None] * d[:, :, None] * d[:, None, :]  # [S,3,3]

    it = jnp.arange(MAX_STENCIL_VERTS)
    diag_valid = mapped.valid[:, None] & (it[None] < mapped.nverts[:, None])
    diag_mat = (mapped.weight**2)[:, :, None, None] * hmat[:, None]

    ca = jnp.asarray([c for c, _ in _COMBOS])
    cb = jnp.asarray([c for _, c in _COMBOS])
    pair_valid = mapped.valid[:, None] & (cb[None] < mapped.nverts[:, None])
    wa = jnp.take_along_axis(mapped.weight, jnp.broadcast_to(ca[None], (mapped.count, len(_COMBOS))), axis=1)
    wb = jnp.take_along_axis(mapped.weight, jnp.broadcast_to(cb[None], (mapped.count, len(_COMBOS))), axis=1)
    pair_mat = (wa * wb)[:, :, None, None] * hmat[:, None]
    pa = jnp.take_along_axis(mapped.idx, jnp.broadcast_to(ca[None], (mapped.count, len(_COMBOS))), axis=1)
    pb = jnp.take_along_axis(mapped.idx, jnp.broadcast_to(cb[None], (mapped.count, len(_COMBOS))), axis=1)

    return CollisionTerms(
        pair_a=pa.reshape(-1),
        pair_b=pb.reshape(-1),
        pair_mat=pair_mat.reshape(-1, 3, 3),
        pair_valid=pair_valid.reshape(-1),
        diag_ids=mapped.idx.reshape(-1),
        diag_mat=diag_mat.reshape(-1, 3, 3),
        diag_valid=diag_valid.reshape(-1),
    )
