"""Coarse-level damping study for contact-stiff systems.

probe_stiff.py found the additive multilevel apply DEGRADES vs Jacobi at
contact stiffness 1e4-1e5 (iters ratio 0.85-0.99) and recovers at 1e6 —
classic additive-Schwarz over-correction along directions represented at
several levels. Damped additive Schwarz (z = z0 + theta * sum_{l>=1} z_l)
is the textbook remedy; this scan measures PCG iterations over
(stiffness x theta) on the folded-sheet system.

CPU-runnable. Usage: probe_damping.py [grid]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth, collision as coll
from precond_tpu.ops import gridstencil
from precond_tpu.ops.batched_inverse import apply_block_inverse
from precond_tpu.ops.contact import build_contact_slots, contact_diag, slot_contact_spmv
from precond_tpu.ops.gridapply import grid_level_sizes
from precond_tpu.ops.hierarchy import BANK
from precond_tpu.ops.stencils import build_stencils
from precond_tpu.parallel.pcg import pcg
from precond_tpu.solver import SortMaps, prepare_grid
from precond_tpu.utils import gridmorton as gm


def precondition_grid_damped(inv96, r_sorted, cfg, theta):
    """precondition_grid with coarse corrections scaled by theta."""
    n = r_sorted.shape[0]
    offs = cfg.level_offsets(n)
    levels = cfg.num_levels(n)
    sizes = grid_level_sizes(n, cfg)
    parts = [r_sorted]
    cur = r_sorted
    for l in range(levels - 1):
        s = cur.reshape(-1, BANK, 3).sum(axis=1)
        cap_next = offs[l + 2] - offs[l + 1]
        cur = jnp.pad(s, ((0, cap_next - s.shape[0]), (0, 0)))
        parts.append(cur)
    mr = jnp.concatenate(parts, axis=0)
    z96 = apply_block_inverse(inv96, mr.reshape(-1, 3 * BANK))
    z = z96.reshape(-1, 3)
    top = min(levels, cfg.max_applied_levels)
    pz = z[offs[top - 1]: offs[top]] * theta
    for l in range(top - 2, -1, -1):
        curz = z[offs[l]: offs[l + 1]] * (theta if l > 0 else 1.0)
        nb = (offs[l + 1] - offs[l]) // BANK
        pz = curz + jnp.repeat(pz[:nb], BANK, axis=0)
    return pz[:n]


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    import dataclasses

    cfg = dataclasses.replace(SchwarzConfig(), solve_layout="rows",
                              symv_kernel="dense")
    mesh = cloth.make_grid(grid, grid, z_wave=0.0, mass=0.001, dt=1.0 / 60.0)
    n = mesh.num_verts
    h = 1.0 / max(grid - 1, 1)
    p = np.asarray(mesh.positions).copy()
    fold = p[:, 0] > 0.5
    p[:, 2] = np.where(fold, 0.5 * h, 0.0)
    p[:, 0] = np.where(fold, 1.0 - p[:, 0], p[:, 0]).astype(np.float32)
    positions = p.astype(np.float32)
    budget, cap = n // 4, 2
    thresh = 0.75 * h
    pj = jnp.asarray(positions)
    fj, ej = jnp.asarray(mesh.faces), jnp.asarray(mesh.edges)
    vf, _ = coll.detect_vf_grid(pj, fj, thresh, 1.0, budget, per_vertex_cap=cap)
    ee, _ = coll.detect_ee_grid(pj, ej, thresh, 1.0, budget, per_edge_cap=cap)
    ef, _ = coll.detect_ef_grid(pj, ej, fj, thresh, 1.0, budget, per_edge_cap=cap)
    st1 = build_stencils(ej, fj, ef=ef, ee=ee, vf=vf)
    keep = np.flatnonzero(np.asarray(st1.valid))
    pad8 = (-keep.size) % 8
    keep = np.concatenate([keep, np.zeros(pad8, np.int64)])
    st1 = type(st1)(*(jnp.asarray(np.asarray(f)[keep]) for f in st1))
    if pad8:
        st1 = st1._replace(valid=st1.valid.at[-pad8:].set(False))

    ssys = cloth.assemble_system_stencil(mesh, positions=positions)
    ell = cloth.assemble_system(mesh, positions=positions)
    dgr, drr, goffsets = cloth.assemble_system_grid(mesh, positions=positions)
    k = grid.bit_length() - 1
    s2o, o2s = gm.sort_maps(k)
    maps = SortMaps(jnp.asarray(s2o), jnp.asarray(o2s))
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

    for stiff in (1e3, 1e4, 1e5, 1e6):
        st = st1._replace(stiff=st1.stiff * stiff)
        cs = jax.jit(build_contact_slots, static_argnums=1)(st, n)
        inv = jax.jit(
            lambda dg, dr, s, o: prepare_grid(dg, dr, goffsets, k, cfg, s, o)
        )(dgr, drr, st, maps.orig_to_sorted)

        def spmv(v):
            return gridstencil.spmv(ssys, v) + slot_contact_spmv(st, cs, v)

        row = [f"stiff={stiff:8.0e} "]
        for theta in (1.0, 0.5, 0.25, 0.125):
            def pre(r, th=theta):
                return gm.morton_to_grid(
                    precondition_grid_damped(
                        inv, gm.grid_to_morton(r, k), cfg, th), k)

            res = jax.jit(
                lambda bb, th=theta: pcg(
                    spmv, lambda r: pre(r, th), bb,
                    tol=1e-4, max_iters=20000, check_every=8))(b)
            row.append(f"th{theta}={int(res.iterations)}")
        dinv = jnp.linalg.inv(ell.diag + contact_diag(st, n))
        res_j = jax.jit(
            lambda bb: pcg(spmv,
                           lambda r: jnp.einsum("nij,nj->ni", dinv, r), bb,
                           tol=1e-4, max_iters=20000, check_every=8))(b)
        row.append(f"jacobi={int(res_j.iterations)}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
