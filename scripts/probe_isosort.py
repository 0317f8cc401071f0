"""Isotropic vs per-axis Morton normalization on the folded contact sheet.

The reference normalizes each axis independently into the unit cube
(FillSortingData, cpp:225-231). On near-flat configurations this
stretches the thin axis to unit scale: the fold's contact pairs sit h/2
apart in REAL space but land in opposite halves of the sort, so no L0/L1
bank ever contains a contact pair and the preconditioner resolves the
stiff constraints only via coarse compensation (probe_stiff.py: Schwarz
degrades to Jacobi-or-worse at stiffness 1e4-1e5).

Isotropic normalization (divide by the max extent) preserves true
distances; contact pairs then sort adjacently and their rank-1 Hessians
land INSIDE fine domain blocks. This scan measures the iteration counts.

CPU-runnable. Usage: probe_isosort.py [grid]
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
from precond_tpu.ops.apply import precondition_sorted
from precond_tpu.ops.contact import build_contact_slots, contact_diag, slot_contact_spmv
from precond_tpu.ops.stencils import build_stencils
from precond_tpu.parallel.pcg import pcg
from precond_tpu.solver import SortMaps, compute_sort_maps, prepare_with_system
from precond_tpu.utils import aabb, morton


def iso_maps(positions):
    box = aabb.compute_aabb(positions)
    ext = jnp.max(box.extent)
    unit = (positions - box.lower) / ext
    perm = morton.argsort_morton(unit).astype(jnp.int32)
    return SortMaps(perm, morton.inverse_permutation(perm))


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
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

    maps_axis = compute_sort_maps(pj)   # per-axis (reference behavior)
    maps_iso = iso_maps(pj)             # isotropic

    for stiff in (1e3, 1e4, 1e5, 1e6):
        st = st1._replace(stiff=st1.stiff * stiff)
        cs = jax.jit(build_contact_slots, static_argnums=1)(st, n)

        def spmv(v):
            return gridstencil.spmv(ssys, v) + slot_contact_spmv(st, cs, v)

        row = [f"stiff={stiff:8.0e} "]
        for name, maps in (("axis", maps_axis), ("iso", maps_iso)):
            gstate, _ = jax.jit(
                lambda e, m, s: prepare_with_system(e, m, cfg, s)
            )(ell, maps, st)

            def pre(r, gs=gstate):
                zs = precondition_sorted(
                    gs, jnp.take(r, gs.sorted_to_orig, axis=0), cfg)
                return jnp.take(zs, gs.orig_to_sorted, axis=0)

            res = jax.jit(
                lambda bb, gs=gstate: pcg(
                    spmv, lambda r: pre(r, gs), bb,
                    tol=1e-4, max_iters=20000, check_every=8))(b)
            row.append(f"{name}={int(res.iterations)}")
        dinv = jnp.linalg.inv(ell.diag + contact_diag(st, n))
        res_j = jax.jit(
            lambda bb: pcg(spmv,
                           lambda r: jnp.einsum("nij,nj->ni", dinv, r), bb,
                           tol=1e-4, max_iters=20000, check_every=8))(b)
        row.append(f"jacobi={int(res_j.iterations)}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
