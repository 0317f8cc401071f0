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
    # (nx, ny) when the mesh is a regular grid (enables the stencil-form
    # SpMV fast path); None for general meshes.
    grid: Tuple[int, int] | None = None

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

    # fully vectorized topology construction (usable at 1M+ vertices)
    gi, gj = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1), indexing="ij")
    a = (gi * ny + gj).reshape(-1)
    b = ((gi + 1) * ny + gj).reshape(-1)
    c = ((gi + 1) * ny + gj + 1).reshape(-1)
    d = (gi * ny + gj + 1).reshape(-1)
    faces = np.concatenate(
        [np.stack([a, b, c], 1), np.stack([a, c, d], 1)]
    ).astype(np.int32)

    # unique mesh edges with opposite vertices (for collision stencils)
    he0 = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    he1 = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
    hopp = np.concatenate([faces[:, 2], faces[:, 0], faces[:, 1]])
    n_total = nx * ny
    lo = np.minimum(he0, he1).astype(np.int64)
    hi = np.maximum(he0, he1).astype(np.int64)
    key = lo * n_total + hi
    order = np.argsort(key, kind="stable")
    key_s, lo_s, hi_s, opp_s = key[order], lo[order], hi[order], hopp[order]
    first = np.empty(len(key_s), bool)
    first[:1] = True
    first[1:] = key_s[1:] != key_s[:-1]
    starts = np.flatnonzero(first)
    counts = np.diff(np.append(starts, len(key_s)))
    opp1 = np.where(counts > 1, opp_s[np.minimum(starts + 1, len(key_s) - 1)], -1)
    edges = np.stack([lo_s[starts], hi_s[starts], opp_s[starts], opp1], 1).astype(np.int32)

    def grid_springs(di, dj):
        ii, jj = np.meshgrid(np.arange(nx - di), np.arange(ny - dj), indexing="ij")
        s0 = (ii * ny + jj).reshape(-1)
        s1 = ((ii + di) * ny + jj + dj).reshape(-1)
        return np.stack([s0, s1], 1)

    def shear_springs():
        ii, jj = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1), indexing="ij")
        s = np.stack([(ii * ny + jj).reshape(-1), ((ii + 1) * ny + jj + 1).reshape(-1)], 1)
        t = np.stack([((ii + 1) * ny + jj).reshape(-1), (ii * ny + jj + 1).reshape(-1)], 1)
        return np.concatenate([s, t])

    groups = [
        (grid_springs(1, 0), k_struct),
        (grid_springs(0, 1), k_struct),
        (shear_springs(), k_shear),
        (grid_springs(2, 0), k_bend),
        (grid_springs(0, 2), k_bend),
    ]
    springs = np.concatenate([g for g, _ in groups]).astype(np.int32)
    stiff = np.concatenate([np.full(len(g), k, np.float32) for g, k in groups])

    return ClothMesh(
        positions=pos.astype(np.float32),
        edges=edges,
        faces=faces,
        springs=springs,
        stiffness=stiff,
        mass=mass,
        dt=dt,
        grid=(nx, ny),
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


def ell_structure_from_springs(n: int, springs: np.ndarray):
    """Host-side INT-ONLY setup: ELL sparsity + the slot->spring inverse.

    Returns (idx i32[N,K], mask bool[N,K], spring_of_slot i32[N,K]) where
    spring_of_slot[v,k] is the spring whose off-diagonal block belongs in
    slot (v,k) (S for padded slots). With this table the per-step value
    fill is GATHER-only — scatters into [N*K,3,3] buffers pick a tiled
    layout that is ~56x oversized on TPU (docs/DESIGN.md §3), and values
    never touch the host.
    """
    from .. import native

    idx, mask = native.elements_to_adjacency_ell(n, springs)
    k = idx.shape[1]
    s_count = len(springs)
    # rows are sorted ascending; key flattening makes the table globally
    # sorted so both slot lookups are two vectorized searchsorteds
    keys = np.where(mask, np.arange(n, dtype=np.int64)[:, None] * (n + 1) + idx,
                    np.arange(n, dtype=np.int64)[:, None] * (n + 1) + n).reshape(-1)
    a = springs[:, 0].astype(np.int64)
    b = springs[:, 1].astype(np.int64)
    pos_a = np.searchsorted(keys, a * (n + 1) + b)
    pos_b = np.searchsorted(keys, b * (n + 1) + a)
    slot_a = (pos_a - a * k).astype(np.int64)
    slot_b = (pos_b - b * k).astype(np.int64)
    assert np.all(slot_a >= 0) and np.all(slot_a < k)
    assert np.all(slot_b >= 0) and np.all(slot_b < k)
    spring_of_slot = np.full(n * k, s_count, np.int32)
    spring_of_slot[a * k + slot_a] = np.arange(s_count, dtype=np.int32)
    spring_of_slot[b * k + slot_b] = np.arange(s_count, dtype=np.int32)
    return idx, mask, spring_of_slot.reshape(n, k)


def assemble_system(mesh: ClothMesh, positions: np.ndarray | None = None) -> BlockEll:
    """Implicit-Euler system H = (m/dt^2) I + spring Hessian, as BlockEll.

    Structure on host (ints only), values entirely on device.
    """
    n = mesh.num_verts
    idx, mask, spring_of_slot = ell_structure_from_springs(n, mesh.springs)
    shell = BlockEll(
        diag=jnp.zeros((n, 3, 3), jnp.float32),
        idx=jnp.asarray(idx),
        blocks=jnp.zeros(idx.shape + (3, 3), jnp.float32),
        mask=jnp.asarray(mask),
    )
    pos = jnp.asarray(mesh.positions if positions is None else positions)
    return _fill_ell(shell, jnp.asarray(mesh.springs), jnp.asarray(mesh.stiffness),
                     pos, mesh.mass / mesh.dt**2, jnp.asarray(spring_of_slot))


def _fill_ell(*args):
    return _fill_ell_jit(*args)


def update_ell_blocks(h: BlockEll, mesh_springs: jnp.ndarray, stiffness: jnp.ndarray,
                      positions: jnp.ndarray, mass_over_dt2: float,
                      spring_of_slot: jnp.ndarray) -> BlockEll:
    """Jittable per-step refresh of spring blocks into a fixed ELL sparsity.

    GATHER-only: blocks[v,k] = -ke[spring_of_slot[v,k]] and the diagonal is
    the mass term plus the row-sum of gathered spring blocks (H row sums to
    the mass for interior rows). No scatters — scatter targets with (3,3)
    trailing dims get catastrophically tiled layouts (docs/DESIGN.md §3).
    Assumes at most one spring per vertex pair (duplicates would need
    coalescing — the mesh builders never produce them).
    """
    ke = spring_hessian_blocks(positions, mesh_springs, stiffness)  # [S,3,3]
    s_count = ke.shape[0]
    ke_pad = jnp.concatenate([ke, jnp.zeros((1, 3, 3), ke.dtype)])
    gathered = jnp.take(ke_pad, jnp.minimum(spring_of_slot, s_count), axis=0)  # [N,K,3,3]
    diag = mass_over_dt2 * jnp.eye(3, dtype=h.diag.dtype)[None] + jnp.sum(gathered, axis=1)
    return h._replace(diag=diag, blocks=-gathered)


_fill_ell_jit = jax.jit(update_ell_blocks)


# ---- stencil-form assembly (structured-grid fast path) ---------------------
#
# On a regular grid every spring lies at one of ~6 canonical (di, dj)
# offsets, so the system can be held in stencil form (ops/gridstencil.py)
# and both assembly and SpMV run with ZERO gathers/scatters: position
# differences are window slices, and each direction's blocks pad into place.
# Measured SpMV: 0.64 ms vs 3.27 ms (gather ELL) at 65k verts on v5e.

def stencil_structure_from_springs(nx: int, ny: int, springs: np.ndarray,
                                   stiffness: np.ndarray):
    """Host-side one-time structure: canonical offsets + stiffness grids.

    Returns (offsets, ks) where offsets is a tuple of canonical (di, dj)
    with di > 0 or (di == 0 and dj > 0), and ks f32[Dc, nx, ny] holds the
    stiffness of the spring leaving vertex (i, j) in that direction (0 if
    absent; duplicates accumulate). Raises if any spring is not grid-
    representable (only produced by non-grid meshes).
    """
    a, b = springs[:, 0].astype(np.int64), springs[:, 1].astype(np.int64)
    di = b // ny - a // ny
    dj = b % ny - a % ny
    flip = (di < 0) | ((di == 0) & (dj < 0))
    a, b = np.where(flip, b, a), np.where(flip, a, b)
    di, dj = np.where(flip, -di, di), np.where(flip, -dj, dj)
    keys = list({(int(p), int(q)) for p, q in zip(di, dj)})
    keys.sort()
    ks = np.zeros((len(keys), nx, ny), np.float32)
    for d, (p, q) in enumerate(keys):
        sel = (di == p) & (dj == q)
        np.add.at(ks[d].reshape(-1), a[sel], stiffness[sel])
    return tuple(keys), ks


def _stencil_block_fields(offsets, ks: jnp.ndarray, positions: jnp.ndarray,
                          mass_over_dt2: float, grid):
    """Shared block computation: positions -> (diag [n,3,3], dirs list of
    [n,3,3] row-major, full_offsets). Gather-free.

    Per canonical direction: window-slice the endpoint positions, form the
    Gauss-Newton block k d̂ d̂ᵀ per spring, pad it into both endpoints'
    direction planes (negated off-diagonal), and accumulate the diagonal.
    """
    nx, ny = grid
    n = nx * ny
    pos = positions.reshape(nx, ny, 3)
    diag = jnp.broadcast_to(
        mass_over_dt2 * jnp.eye(3, dtype=positions.dtype), (nx, ny, 3, 3)
    )
    dirs, full_offsets = [], []
    for d, (di, dj) in enumerate(offsets):
        ai0, aj0 = max(0, -di), max(0, -dj)
        bi0, bj0 = max(0, di), max(0, dj)
        mx, my = nx - abs(di), ny - abs(dj)
        pa = pos[ai0 : ai0 + mx, aj0 : aj0 + my]
        pb = pos[bi0 : bi0 + mx, bj0 : bj0 + my]
        dv = pb - pa
        dn = dv * jax.lax.rsqrt(jnp.maximum(jnp.sum(dv * dv, -1, keepdims=True), 1e-12))
        kb = ks[d, ai0 : ai0 + mx, aj0 : aj0 + my][..., None, None] \
            * dn[..., :, None] * dn[..., None, :]            # [mx,my,3,3]
        pad_a = ((ai0, nx - mx - ai0), (aj0, ny - my - aj0), (0, 0), (0, 0))
        pad_b = ((bi0, nx - mx - bi0), (bj0, ny - my - bj0), (0, 0), (0, 0))
        at_a = jnp.pad(kb, pad_a)
        at_b = jnp.pad(kb, pad_b)
        diag = diag + at_a + at_b
        dirs.append(-at_a.reshape(n, 3, 3))
        full_offsets.append((di, dj))
        dirs.append(-at_b.reshape(n, 3, 3))
        full_offsets.append((-di, -dj))
    return diag.reshape(n, 3, 3), dirs, tuple(full_offsets)


def update_stencil_blocks(offsets, ks: jnp.ndarray, positions: jnp.ndarray,
                          mass_over_dt2: float, grid, sym: bool = False):
    """Jittable stencil refresh: positions -> StencilSystem.

    sym=True keeps only the canonical half of the direction planes (the
    symmetric SpMV applies each plane to both endpoints) — half the block
    memory and half the SpMV's dominant traffic."""
    from ..ops.gridstencil import StencilSystem

    nx, ny = grid
    n = nx * ny
    diag, dirs, full_offsets = _stencil_block_fields(
        offsets, ks, positions, mass_over_dt2, grid
    )
    if sym:
        dirs = dirs[0::2]                 # canonical (+d) planes only
        full_offsets = full_offsets[0::2]
    # vertex-minor storage: the layout the SpMV contraction wants (see
    # ops/gridstencil.py) — one assembly-time transpose instead of a
    # per-PCG-iteration relayout copy of the whole block array.
    return StencilSystem(
        diag.reshape(n, 9).T.reshape(3, 3, n),
        jnp.stack(dirs).reshape(-1, n, 9).transpose(0, 2, 1).reshape(-1, 3, 3, n),
        tuple(full_offsets), (nx, ny), sym=sym,
    )


def update_grid_blocks(offsets, ks: jnp.ndarray, positions: jnp.ndarray,
                       mass_over_dt2: float, grid):
    """Jittable refresh of ROW-MAJOR blocks for the static grid assembly
    (ops/gridassembly.py): (diag f32[N,3,3], dirs f32[D,N,3,3], offsets)."""
    diag, dirs, _ = _stencil_block_fields(
        offsets, ks, positions, mass_over_dt2, grid
    )
    return diag, jnp.stack(dirs)


_update_stencil_jit = jax.jit(
    update_stencil_blocks, static_argnames=("offsets", "grid", "sym")
)
_update_grid_jit = jax.jit(update_grid_blocks, static_argnames=("offsets", "grid"))


def assemble_system_grid(mesh: ClothMesh, positions: np.ndarray | None = None):
    """Row-major per-direction blocks for the static grid assembly.

    Returns (diag f32[N,3,3], dirs f32[D,N,3,3], full_offsets) — the same
    physics as assemble_system_stencil in the layout ops/gridassembly.py
    consumes (the prepare phase; the StencilSystem's vertex-minor layout
    is what the SpMV wants)."""
    assert mesh.grid is not None, "grid assembly needs a grid mesh"
    nx, ny = mesh.grid
    offsets, ks = stencil_structure_from_springs(nx, ny, mesh.springs, mesh.stiffness)
    pos = jnp.asarray(mesh.positions if positions is None else positions)
    full_offsets = tuple(o for di, dj in offsets for o in ((di, dj), (-di, -dj)))
    diag, dirs = _update_grid_jit(offsets, jnp.asarray(ks), pos,
                                  mesh.mass / mesh.dt**2, (nx, ny))
    return diag, dirs, full_offsets


def assemble_system_stencil(mesh: ClothMesh, positions: np.ndarray | None = None,
                            sym: bool = False):
    """Implicit-Euler system as a StencilSystem (structured grids only)."""
    assert mesh.grid is not None, "stencil assembly needs a grid mesh"
    nx, ny = mesh.grid
    offsets, ks = stencil_structure_from_springs(nx, ny, mesh.springs, mesh.stiffness)
    pos = jnp.asarray(mesh.positions if positions is None else positions)
    return _update_stencil_jit(offsets, jnp.asarray(ks), pos,
                               mesh.mass / mesh.dt**2, (nx, ny), sym)


