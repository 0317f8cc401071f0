"""Contact-stiffness regime scan: Schwarz vs block-Jacobi PCG iterations.

The collide bench's penalty stiffness (1e3) is SOFTER than the cloth
springs it opposes (1e4) — not the penetration-enforcing regime. This
scan measures how the iteration-count gap (the vs_baseline ceiling)
moves with contact stiffness on the identical folded-sheet system.

CPU-runnable (iteration counts only). Usage: probe_stiff.py [grid].
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
from precond_tpu.ops.contact import (
    build_contact_slots, contact_diag, slot_contact_spmv,
)
from precond_tpu.ops.stencils import build_stencils
from precond_tpu.parallel.pcg import pcg
from precond_tpu.solver import SortMaps, prepare_grid
from precond_tpu.utils import gridmorton as gm


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    mass = 0.001
    import dataclasses

    cfg = dataclasses.replace(SchwarzConfig(), solve_layout="rows")
    mesh = cloth.make_grid(grid, grid, z_wave=0.0, mass=mass, dt=1.0 / 60.0)
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
    print(f"n={n} stencils={int(np.asarray(st1.valid).sum())}", flush=True)

    ssys = cloth.assemble_system_stencil(mesh, positions=positions)
    ell = cloth.assemble_system(mesh, positions=positions)
    dgr, drr, goffsets = cloth.assemble_system_grid(mesh, positions=positions)
    k = grid.bit_length() - 1
    s2o, o2s = gm.sort_maps(k)
    maps = SortMaps(jnp.asarray(s2o), jnp.asarray(o2s))
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

    from precond_tpu.ops.gridapply import precondition_grid

    from precond_tpu.ops.apply import precondition_sorted
    from precond_tpu.solver import compute_sort_maps, prepare_with_system

    # POSITION-based Morton maps (the reference's actual sort, cpp:54-63):
    # the folded sheet's contact pairs share (x, y) and sit h/2 apart in
    # z, so this sort puts them in the SAME bank; the analytic tile order
    # (index-based) is contact-blind and separates them.
    pmaps = compute_sort_maps(pj)

    for stiff in (1e3, 1e4, 1e5, 1e6):
        st = st1._replace(stiff=st1.stiff * stiff)
        cs = jax.jit(build_contact_slots, static_argnums=1)(st, n)
        inv = jax.jit(
            lambda dg, dr, s, o: prepare_grid(dg, dr, goffsets, k, cfg, s, o)
        )(dgr, drr, st, maps.orig_to_sorted)

        def spmv(v):
            return gridstencil.spmv(ssys, v) + slot_contact_spmv(st, cs, v)

        def pre(r):
            return gm.morton_to_grid(
                precondition_grid(inv, gm.grid_to_morton(r, k), cfg), k)

        res_s = jax.jit(
            lambda bb: pcg(spmv, pre, bb, tol=1e-4, max_iters=20000,
                           check_every=8))(b)
        # general path: position-Morton sort + built hierarchy with
        # contact connectivity (BuildCollisionConnection, cpp:514-563)
        gstate, _ = jax.jit(
            lambda e, m, s: prepare_with_system(e, m, cfg, s)
        )(ell, pmaps, st)

        def pre_gen(r):
            return precondition_sorted_orig(gstate, r)

        def precondition_sorted_orig(gs, r):
            zs = precondition_sorted(
                gs, jnp.take(r, gs.sorted_to_orig, axis=0), cfg)
            return jnp.take(zs, gs.orig_to_sorted, axis=0)

        res_g = jax.jit(
            lambda bb: pcg(spmv, pre_gen, bb, tol=1e-4, max_iters=20000,
                           check_every=8))(b)
        dinv = jnp.linalg.inv(ell.diag + contact_diag(st, n))
        res_j = jax.jit(
            lambda bb: pcg(spmv,
                           lambda r: jnp.einsum("nij,nj->ni", dinv, r), bb,
                           tol=1e-4, max_iters=20000, check_every=8))(b)
        si, gi, ji = (int(res_s.iterations), int(res_g.iterations),
                      int(res_j.iterations))
        print(f"stiff={stiff:8.0e}  static={si:6d}  general={gi:6d}  "
              f"jacobi={ji:6d}  j/static={ji / max(si, 1):.2f} "
              f"j/general={ji / max(gi, 1):.2f}", flush=True)


if __name__ == "__main__":
    main()
