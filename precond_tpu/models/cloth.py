"""Cloth model: grid mesh, mass-spring Hessian, implicit-Euler system.

The reference ships no simulator — its API consumes an already-assembled
system Hessian (diag + 3x3 CSR) and mesh topology (edges as Int4 with the
two opposite vertices, faces as triangles; SeSchwarzPreconditioner.h:44-51).
This module provides the host-simulator side for cloth: an n x m grid with
structural, shear and bending springs, and the SPD implicit-Euler system

    H = (m / dt^2) M + sum_e k_e (d_e d_e^T expanded over the edge stencil)

assembled in Gauss-Newton form (k d d^T per spring), which is SPD for any
configuration. Assembly is jittable so Hessians refresh on-device each step.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.blockcsr import BlockEll, from_coo


class ClothMesh(NamedTuple):
    positions: np.ndarray   # f32[N,3] rest positions
    edges: np.ndarray       # i32[E,4]: two endpoints + two opposite verts (-1 if boundary)
    faces: np.ndarray       # i32[F,3] triangles
    springs: np.ndarray     # i32[S,2] all spring endpoint pairs
    stiffness: np.ndarray   # f32[S]
    mass: float
    dt: float

    @property
    def num_verts(self) -> int:
        return self.positions.shape[0]


def make_grid(nx: int, ny: int, size: float = 1.0, mass: float = 1.0, dt: float = 1.0 / 60.0,
              k_struct: float = 1e4, k_shear: float = 1e4, k_bend: float = 1e2,
              z_wave: float = 0.0) -> ClothMesh:
    """Regular nx x ny cloth grid in the XY plane (optionally z-perturbed)."""
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    scale = size / max(nx - 1, 1)
    pos = np.stack([xs * scale, ys * scale, np.zeros_like(xs, np.float64)], -1).reshape(-1, 3)
    if z_wave:
        pos[:, 2] = z_wave * np.sin(pos[:, 0] * 7.3) * np.cos(pos[:, 1] * 5.1)
    vid = lambda i, j: i * ny + j

    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a, b, c, d = vid(i, j), vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)
            faces.append((a, b, c))
            faces.append((a, c, d))
    faces = np.asarray(faces, np.int32).reshape(-1, 3)

    # Unique mesh edges with opposite vertices (for collision stencils).
    edge_opp = {}
    for f in faces:
        for e0, e1, opp in ((f[0], f[1], f[2]), (f[1], f[2], f[0]), (f[2], f[0], f[1])):
            key = (min(e0, e1), max(e0, e1))
            edge_opp.setdefault(key, []).append(opp)
    edges = np.asarray(
        [(a, b, opp[0], opp[1] if len(opp) > 1 else -1) for (a, b), opp in sorted(edge_opp.items())],
        np.int32,
    ).reshape(-1, 4)

    springs, stiff = [], []
    for i in range(nx):
        for j in range(ny):
            if i + 1 < nx:
                springs.append((vid(i, j), vid(i + 1, j))); stiff.append(k_struct)
            if j + 1 < ny:
                springs.append((vid(i, j), vid(i, j + 1))); stiff.append(k_struct)
            if i + 1 < nx and j + 1 < ny:
                springs.append((vid(i, j), vid(i + 1, j + 1))); stiff.append(k_shear)
                springs.append((vid(i + 1, j), vid(i, j + 1))); stiff.append(k_shear)
            if i + 2 < nx:
                springs.append((vid(i, j), vid(i + 2, j))); stiff.append(k_bend)
            if j + 2 < ny:
                springs.append((vid(i, j), vid(i, j + 2))); stiff.append(k_bend)

    return ClothMesh(
        positions=pos.astype(np.float32),
        edges=edges,
        faces=faces,
        springs=np.asarray(springs, np.int32),
        stiffness=np.asarray(stiff, np.float32),
        mass=mass,
        dt=dt,
    )


def adjacency_from_springs(num_verts: int, springs: np.ndarray) -> list[np.ndarray]:
    """Vertex adjacency lists (the reference's m_neighbours CSR, h:51)."""
    adj = [[] for _ in range(num_verts)]
    for a, b in springs:
        adj[int(a)].append(int(b))
        adj[int(b)].append(int(a))
    return [np.asarray(sorted(set(x)), np.int32) for x in adj]


def spring_hessian_blocks(positions: jnp.ndarray, springs: jnp.ndarray,
                          stiffness: jnp.ndarray) -> jnp.ndarray:
    """Per-spring Gauss-Newton 3x3 block k * d d^T. [S,3,3]."""
    d = jnp.take(positions, springs[:, 1], axis=0) - jnp.take(positions, springs[:, 0], axis=0)
    len2 = jnp.sum(d * d, axis=-1, keepdims=True)
    dn = d * jax.lax.rsqrt(jnp.maximum(len2, 1e-12))
    return stiffness[:, None, None] * dn[:, :, None] * dn[:, None, :]


def assemble_system(mesh: ClothMesh, positions: np.ndarray | None = None) -> BlockEll:
    """Implicit-Euler system H = (m/dt^2) I + spring Hessian, as BlockEll."""
    pos = jnp.asarray(mesh.positions if positions is None else positions)
    ke = np.asarray(spring_hessian_blocks(pos, jnp.asarray(mesh.springs), jnp.asarray(mesh.stiffness)))

    n = mesh.num_verts
    a, b = mesh.springs[:, 0], mesh.springs[:, 1]
    diag = np.tile((mesh.mass / mesh.dt**2) * np.eye(3, dtype=np.float32), (n, 1, 1))
    np.add.at(diag, a, ke)
    np.add.at(diag, b, ke)
    rows = np.concatenate([a, b])
    cols = np.concatenate([b, a])
    vals = np.concatenate([-ke, -ke])
    return from_coo(n, rows, cols, vals, diag)


def update_ell_blocks(h: BlockEll, mesh_springs: jnp.ndarray, stiffness: jnp.ndarray,
                      positions: jnp.ndarray, mass_over_dt2: float,
                      slot_a: jnp.ndarray, slot_b: jnp.ndarray) -> BlockEll:
    """Jittable per-step refresh of spring blocks into a fixed ELL sparsity.

    slot_a[s] / slot_b[s] give the ELL slot of spring s in rows
    springs[s,0] / springs[s,1] (computed once at setup; sparsity is fixed).
    """
    ke = spring_hessian_blocks(positions, mesh_springs, stiffness)
    n = h.diag.shape[0]
    a, b = mesh_springs[:, 0], mesh_springs[:, 1]
    diag = jnp.tile(mass_over_dt2 * jnp.eye(3, dtype=h.diag.dtype), (n, 1, 1))
    diag = diag.at[a].add(ke).at[b].add(ke)
    blocks = jnp.zeros_like(h.blocks)
    blocks = blocks.at[a, slot_a].set(-ke)
    blocks = blocks.at[b, slot_b].set(-ke)
    return h._replace(diag=diag, blocks=blocks)


def ell_slots_for_springs(h: BlockEll, springs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Find each spring's ELL slot in both of its rows (host, setup-time)."""
    idx = np.asarray(h.idx)
    slot_a = np.empty(len(springs), np.int32)
    slot_b = np.empty(len(springs), np.int32)
    for s, (a, b) in enumerate(springs):
        slot_a[s] = int(np.where(idx[a] == b)[0][0])
        slot_b[s] = int(np.where(idx[b] == a)[0][0])
    return slot_a, slot_b
