"""Tet-mesh deformable body: linear-elastic FEM Hessian + implicit system.

Exercises the preconditioner on volumetric adjacency (denser rows than
cloth — the K-padding stress test of SURVEY.md §7.2 step 7). The reference
has no models at all; its API just consumes a 3x3-block system
(SeSchwarzPreconditioner.h:59), which this module produces for a
deformable solid:

    H = (m/dt^2) M + K,   K_ab = V (λ g_a g_b^T + μ g_b g_a^T + μ (g_a·g_b) I)

with g_i the linear shape-function gradients (standard isotropic linear
elasticity; SPD together with the mass term).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.blockcsr import BlockEll, from_coo


class TetMesh(NamedTuple):
    positions: np.ndarray  # f32[N,3]
    tets: np.ndarray       # i32[T,4]
    faces: np.ndarray      # i32[F,3] surface triangles (for collisions)
    edges: np.ndarray      # i32[E,4] surface edges (2 endpoints + 2 opposite)
    mass: float
    dt: float
    lam: float             # Lamé lambda
    mu: float              # Lamé mu
    dims: tuple | None = None  # (nx, ny, nz) for structured boxes

    @property
    def num_verts(self) -> int:
        return self.positions.shape[0]


def make_box(nx: int, ny: int, nz: int, size: float = 1.0, mass: float = 1.0,
             dt: float = 1.0 / 60.0, youngs: float = 1e5, poisson: float = 0.4) -> TetMesh:
    """Box of (nx-1)(ny-1)(nz-1) cubes, 5 tets each."""
    xs, ys, zs = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    scale = size / max(nx - 1, 1)
    pos = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.float32) * scale
    vid = lambda i, j, k: (i * ny + j) * nz + k

    tets = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            for k in range(nz - 1):
                c = [vid(i + a, j + b, k + d) for a in (0, 1) for b in (0, 1) for d in (0, 1)]
                # 5-tet decomposition, parity-flipped for conformity
                if (i + j + k) % 2 == 0:
                    ts = [(0, 1, 2, 4), (1, 2, 3, 7), (1, 4, 5, 7), (2, 4, 6, 7), (1, 2, 4, 7)]
                else:
                    ts = [(0, 1, 3, 5), (0, 2, 3, 6), (0, 4, 5, 6), (3, 5, 6, 7), (0, 3, 5, 6)]
                tets.extend(tuple(c[t] for t in tet) for tet in ts)
    tets = np.asarray(tets, np.int32)

    # surface triangles: faces appearing in exactly one tet
    face_count = {}
    for t in tets:
        for f in ((t[0], t[1], t[2]), (t[0], t[1], t[3]), (t[0], t[2], t[3]), (t[1], t[2], t[3])):
            key = tuple(sorted(map(int, f)))
            face_count[key] = face_count.get(key, 0) + 1
    faces = np.asarray([k for k, c in face_count.items() if c == 1], np.int32).reshape(-1, 3)

    edge_opp = {}
    for f in faces:
        for e0, e1, opp in ((f[0], f[1], f[2]), (f[1], f[2], f[0]), (f[2], f[0], f[1])):
            key = (min(e0, e1), max(e0, e1))
            edge_opp.setdefault(key, []).append(int(opp))
    edges = np.asarray(
        [(a, b, o[0], o[1] if len(o) > 1 else -1) for (a, b), o in sorted(edge_opp.items())],
        np.int32,
    ).reshape(-1, 4)

    lam = youngs * poisson / ((1 + poisson) * (1 - 2 * poisson))
    mu = youngs / (2 * (1 + poisson))
    return TetMesh(positions=pos, tets=tets, faces=faces, edges=edges,
                   mass=mass, dt=dt, lam=lam, mu=mu, dims=(nx, ny, nz))


def element_blocks(positions: jnp.ndarray, tets: jnp.ndarray, lam: float, mu: float) -> jnp.ndarray:
    """Per-tet 4x4 grid of 3x3 stiffness blocks. [T,4,4,3,3] (jittable)."""
    x = jnp.take(positions, tets, axis=0)                       # [T,4,3]
    dm = jnp.stack([x[:, 1] - x[:, 0], x[:, 2] - x[:, 0], x[:, 3] - x[:, 0]], axis=2)  # [T,3,3]
    vol = jnp.abs(jnp.linalg.det(dm)) / 6.0
    dminv = jnp.linalg.inv(dm)                                  # [T,3,3]
    # dm's COLUMNS are the edge vectors, so the barycentric map is
    # xi = dm^-1 (X - x0) and grad N_i is the i-th ROW of dm^-1 (taking
    # columns instead breaks linear consistency sum_b x_b g_b^T = I on any
    # element whose dm is not symmetric — axis-aligned tets hid this)
    g123 = dminv                                                # [T, i, :] = grad N_i
    g0 = -jnp.sum(g123, axis=1, keepdims=True)
    g = jnp.concatenate([g0, g123], axis=1)                     # [T,4,3]

    outer_ab = jnp.einsum("tai,tbj->tabij", g, g)               # g_a g_b^T
    outer_ba = jnp.swapaxes(outer_ab, -1, -2)                   # g_b g_a^T
    dots = jnp.einsum("tai,tbi->tab", g, g)
    eye = jnp.eye(3)
    ke = lam * outer_ab + mu * outer_ba + mu * dots[..., None, None] * eye
    return vol[:, None, None, None, None] * ke


def ell_structure_from_tets(n: int, tets: np.ndarray):
    """Host INT-ONLY setup for device-resident tet assembly.

    Unlike springs, several tets contribute to the same (row, col) block,
    so each ELL slot gets a padded contributor list:
      off_src  i32[N,K,C]: tet*16 + a_loc*4 + b_loc  (T*16 = padding)
      diag_src i32[N,D]:   tet*16 + a_loc*5          (self pairs)
    Device assembly is then gather + sum — no scatters (docs/DESIGN.md §3).
    """
    from .. import native

    t_count = len(tets)
    idx, mask = native.elements_to_adjacency_ell(n, tets)
    k = idx.shape[1]

    # directed off-diagonal contributions (a!=b): slot of b in row a
    al, bl = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    sel = al != bl
    al, bl = al[sel], bl[sel]                       # 12 pairs
    rows = tets[:, al].reshape(-1).astype(np.int64)  # [T*12]
    cols = tets[:, bl].reshape(-1).astype(np.int64)
    src = (np.repeat(np.arange(t_count, dtype=np.int64) * 16, 12)
           + np.tile(al * 4 + bl, t_count))
    keys = np.where(mask, np.arange(n, dtype=np.int64)[:, None] * (n + 1) + idx,
                    np.arange(n, dtype=np.int64)[:, None] * (n + 1) + n).reshape(-1)
    pos = np.searchsorted(keys, rows * (n + 1) + cols)
    slot = pos - rows * k
    assert np.all(slot >= 0) and np.all(slot < k)
    flat = rows * k + slot                           # target slot per contribution
    order = np.argsort(flat, kind="stable")
    flat_s, src_s = flat[order], src[order]
    # rank within slot
    first = np.flatnonzero(np.concatenate([[True], flat_s[1:] != flat_s[:-1]]))
    counts = np.diff(np.append(first, len(flat_s)))
    c_max = int(counts.max()) if len(counts) else 1
    rank = np.arange(len(flat_s)) - np.repeat(first, counts)
    off_src = np.full((n * k, c_max), t_count * 16, np.int64)
    off_src[flat_s, rank] = src_s
    off_src = off_src.reshape(n, k, c_max).astype(np.int32)

    # diagonal contributions: tets containing each vertex
    drows = tets.reshape(-1).astype(np.int64)        # [T*4]
    dsrc = (np.repeat(np.arange(t_count, dtype=np.int64) * 16, 4)
            + np.tile(np.arange(4) * 5, t_count))
    dorder = np.argsort(drows, kind="stable")
    drows_s, dsrc_s = drows[dorder], dsrc[dorder]
    dfirst = np.flatnonzero(np.concatenate([[True], drows_s[1:] != drows_s[:-1]]))
    dcounts = np.diff(np.append(dfirst, len(drows_s)))
    d_max = int(dcounts.max()) if len(dcounts) else 1
    drank = np.arange(len(drows_s)) - np.repeat(dfirst, dcounts)
    diag_src = np.full((n, d_max), t_count * 16, np.int64)
    diag_src[drows_s, drank] = dsrc_s
    return idx, mask, off_src, diag_src.astype(np.int32)


def fill_ell_from_ke(idx, mask, off_src, diag_src, ke, mass_over_dt2) -> BlockEll:
    """Jittable device assembly from per-element blocks [T,4,4,3,3]: ELL via
    contributor gathers (the multi-contributor analogue of cloth's
    slot->spring table)."""
    ke_flat = jnp.concatenate(
        [ke.reshape(-1, 3, 3), jnp.zeros((1, 3, 3), ke.dtype)]
    )
    pad = ke_flat.shape[0] - 1
    blocks = jnp.sum(
        jnp.take(ke_flat, jnp.minimum(off_src, pad), axis=0), axis=2
    )                                                         # [N,K,3,3]
    diag = mass_over_dt2 * jnp.eye(3, dtype=jnp.float32)[None] + jnp.sum(
        jnp.take(ke_flat, jnp.minimum(diag_src, pad), axis=0), axis=1
    )
    return BlockEll(diag=diag, idx=idx, blocks=blocks, mask=mask)


def fill_ell_tets(idx, mask, off_src, diag_src, positions, tets, lam, mu,
                  mass_over_dt2) -> BlockEll:
    """Linear-elastic device assembly (constant K, evaluated at `positions`)."""
    ke = element_blocks(positions, tets, lam, mu)            # [T,4,4,3,3]
    return fill_ell_from_ke(idx, mask, off_src, diag_src, ke, mass_over_dt2)


def corot_rotations(x: jnp.ndarray, rest: jnp.ndarray, tets: jnp.ndarray) -> jnp.ndarray:
    """Per-element polar rotations R of the deformation gradient. [T,3,3].

    F = Ds(x) Dm(rest)^-1; R from the SVD polar decomposition with the
    reflection fix (det R = +1 even for inverted elements), the standard
    corotational extraction.
    """
    xs = jnp.take(x, tets, axis=0)                              # [T,4,3]
    rs = jnp.take(rest, tets, axis=0)
    ds = jnp.stack([xs[:, 1] - xs[:, 0], xs[:, 2] - xs[:, 0], xs[:, 3] - xs[:, 0]], axis=2)
    dm = jnp.stack([rs[:, 1] - rs[:, 0], rs[:, 2] - rs[:, 0], rs[:, 3] - rs[:, 0]], axis=2)
    f = ds @ jnp.linalg.inv(dm)                                 # [T,3,3]
    u, _, vt = jnp.linalg.svd(f)
    det = jnp.linalg.det(u @ vt)
    l = jnp.broadcast_to(jnp.eye(3, dtype=f.dtype), f.shape)
    l = l.at[:, 2, 2].set(det)                                  # reflection fix
    return u @ l @ vt


def element_blocks_corot(
    ke0: jnp.ndarray, r: jnp.ndarray
) -> jnp.ndarray:
    """Warped-stiffness element blocks: ke'_ab = R ke0_ab R^T. [T,4,4,3,3].

    The corotational (ARAP-flavored) Gauss-Newton Hessian: rotating the
    rest-state stiffness by the element's current rotation keeps the
    per-element blocks SPD (R K R^T with K SPD), so H = M/dt^2 + sum_e
    R_e K_e R_e^T stays a valid CG system at arbitrary rotations — unlike
    the small-strain K, which fights rigid rotation with spurious forces.
    """
    return jnp.einsum(
        "tij,tabjk,tlk->tabil", r, ke0, r, preferred_element_type=jnp.float32
    )


def _shape_grads(rest: jnp.ndarray, tets: jnp.ndarray):
    """Per-element shape gradients g [T,4,3], volumes [T], Dm^-1 [T,3,3]."""
    rs = jnp.take(rest, tets, axis=0)
    dm = jnp.stack([rs[:, 1] - rs[:, 0], rs[:, 2] - rs[:, 0], rs[:, 3] - rs[:, 0]], axis=2)
    vol = jnp.abs(jnp.linalg.det(dm)) / 6.0
    dminv = jnp.linalg.inv(dm)
    g123 = dminv
    g0 = -jnp.sum(g123, axis=1, keepdims=True)
    return jnp.concatenate([g0, g123], axis=1), vol, dminv


def _snh_psi(f: jnp.ndarray, lam: float, mu: float) -> jnp.ndarray:
    """Stable Neo-Hookean energy density (Smith, de Goes & Kim 2018):

        psi = mu/2 (I_C - 3) + lam/2 (J - alpha)^2,  alpha = 1 + mu/lam

    The alpha shift makes the rest state (F = I) a stationary point without
    the non-smooth log(J) barrier, and psi stays finite (and meaningful)
    through inversion — the property that makes it the production choice
    for large-deformation solids.
    """
    alpha = 1.0 + mu / lam
    ic = jnp.sum(f * f)
    j = jnp.linalg.det(f)
    return 0.5 * mu * (ic - 3.0) + 0.5 * lam * (j - alpha) ** 2


def snh_forces(
    x: jnp.ndarray, rest: jnp.ndarray, tets: jnp.ndarray, lam: float, mu: float
) -> jnp.ndarray:
    """Exact stable-Neo-Hookean internal forces f = -dE/dx. -> f32[N,3]."""

    def energy(xx):
        xs = jnp.take(xx, tets, axis=0)
        g, vol, dminv = _shape_grads(rest, tets)
        ds = jnp.stack(
            [xs[:, 1] - xs[:, 0], xs[:, 2] - xs[:, 0], xs[:, 3] - xs[:, 0]], axis=2
        )
        f = ds @ dminv
        return jnp.sum(vol * jax.vmap(_snh_psi, in_axes=(0, None, None))(f, lam, mu))

    return -jax.grad(energy)(x)


def snh_element_blocks(
    x: jnp.ndarray, rest: jnp.ndarray, tets: jnp.ndarray, lam: float, mu: float,
    eig_floor: float = 0.0,
) -> jnp.ndarray:
    """SPD-projected stable-Neo-Hookean element Hessians. [T,4,4,3,3].

    The exact 9x9 energy-density Hessian d2psi/dF2 (autodiff) is indefinite
    under compression; each element's is eigen-projected to PSD (eigenvalue
    clamp at `eig_floor`) — the standard Newton-PCG treatment that keeps
    H = M/dt^2 + K solvable by CG at every state. Element 12x12 blocks are
    ke_ab = vol * g_a^T H9 g_b contracted over the F indices (B = dvecF/dx
    is constant per element: dF_iJ/dx_bk = delta_ik g_bJ).
    """
    g, vol, dminv = _shape_grads(rest, tets)
    xs = jnp.take(x, tets, axis=0)
    ds = jnp.stack(
        [xs[:, 1] - xs[:, 0], xs[:, 2] - xs[:, 0], xs[:, 3] - xs[:, 0]], axis=2
    )
    f = ds @ dminv                                              # [T,3,3]
    h9 = jax.vmap(jax.hessian(_snh_psi), in_axes=(0, None, None))(f, lam, mu)
    h9 = h9.reshape(-1, 9, 9)
    h9 = 0.5 * (h9 + jnp.swapaxes(h9, 1, 2))
    w, v = jnp.linalg.eigh(h9)
    h9 = jnp.einsum(
        "tik,tk,tjk->tij", v, jnp.maximum(w, eig_floor), v,
        preferred_element_type=jnp.float32,
    ).reshape(-1, 3, 3, 3, 3)                                   # [T,i,J,k,L]
    ke = jnp.einsum(
        "taJ,tiJkL,tbL->tabik", g, h9, g, preferred_element_type=jnp.float32
    )
    return vol[:, None, None, None, None] * ke


def corot_forces(
    ke0: jnp.ndarray, r: jnp.ndarray, x: jnp.ndarray, rest: jnp.ndarray,
    tets: jnp.ndarray,
) -> jnp.ndarray:
    """Corotational internal forces f_a = -sum_b R ke0_ab (R^T x_b - x0_b),
    scattered per vertex. -> f32[N,3]. Exact zero on rigid motions."""
    n = x.shape[0]
    xs = jnp.take(x, tets, axis=0)                              # [T,4,3]
    rs = jnp.take(rest, tets, axis=0)
    dloc = jnp.einsum("tji,tbj->tbi", r, xs) - rs               # R^T x_b - x0_b
    fe = -jnp.einsum(
        "tij,tabjk,tbk->tai", r, ke0, dloc, preferred_element_type=jnp.float32
    )                                                           # [T,4,3]
    tgt, fv = jax.lax.optimization_barrier((tets.reshape(-1), fe.reshape(-1, 3)))
    return jnp.zeros((n + 1, 3), jnp.float32).at[tgt].add(fv, mode="drop")[:n]


def assemble_system(mesh: TetMesh, positions: np.ndarray | None = None) -> BlockEll:
    """H = (m/dt^2) I + K as BlockEll. Structure on host (ints only),
    values entirely on device."""
    n = mesh.num_verts
    idx, mask, off_src, diag_src = ell_structure_from_tets(n, mesh.tets)
    pos = jnp.asarray(mesh.positions if positions is None else positions)
    return _fill_tets_jit(
        jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(off_src),
        jnp.asarray(diag_src), pos, jnp.asarray(mesh.tets),
        mesh.lam, mesh.mu, mesh.mass / mesh.dt**2,
    )


_fill_tets_jit = jax.jit(fill_ell_tets)


def adjacency_lists(mesh: TetMesh) -> list[np.ndarray]:
    adj = [set() for _ in range(mesh.num_verts)]
    for t in mesh.tets:
        for a in range(4):
            for b in range(4):
                if a != b:
                    adj[int(t[a])].add(int(t[b]))
    return [np.asarray(sorted(s), np.int32) for s in adj]
