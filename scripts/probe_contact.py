"""Dissect the collide-256 config (VERDICT r4 item 1: contact is the
weakest recorded number).

Measures, on the real chip, with the bench's exact collide setup:
  1. prepare_grid wall with vs without stencils (the 250 ms mystery);
     plus standalone walls for collision_terms and grid_collision_terms.
  2. per-iteration wall of the composed PCG loop for three contact SpMV
     forms: none (base), scatter-add rank-1 (stencil_contact_spmv),
     slot-sorted scatter-free (slot_contact_spmv).
  3. Schwarz iteration counts of the static-grid M vs the general-path M
     (contact connectivity in clustering, the reference's
     BuildCollisionConnection) on the IDENTICAL system.

Usage: python scripts/probe_contact.py [grid]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth, collision as coll
from precond_tpu.ops import gridstencil
from precond_tpu.ops.contact import (
    build_contact_ell, build_contact_slots, slot_contact_spmv,
    stencil_contact_spmv,
)
from precond_tpu.ops.stencils import build_stencils, collision_terms
from precond_tpu.solver import SortMaps, prepare_grid, prepare_with_system
from precond_tpu.utils import gridmorton as gm


def sync(a):
    return float(np.asarray(a).ravel()[0])


def timed(fn, *args, reps=5, fetch=lambda o: o):
    out = fn(*args)
    sync(fetch(out))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(fetch(out))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mass = 0.001
    cfg = SchwarzConfig()

    mesh = cloth.make_grid(grid, grid, z_wave=0.0, mass=mass, dt=1.0 / 60.0)
    n = mesh.num_verts
    h = 1.0 / max(grid - 1, 1)
    p = np.asarray(mesh.positions).copy()
    fold = p[:, 0] > 0.5
    p[:, 2] = np.where(fold, 0.5 * h, 0.0)
    p[:, 0] = np.where(fold, 1.0 - p[:, 0], p[:, 0]).astype(np.float32)
    positions = p.astype(np.float32)
    budget, cap = n // 4, 2
    thresh, stiff = 0.75 * h, 1e3
    pj = jnp.asarray(positions)
    fj, ej = jnp.asarray(mesh.faces), jnp.asarray(mesh.edges)
    vf, _ = coll.detect_vf_grid(pj, fj, thresh, stiff, budget, per_vertex_cap=cap)
    ee, _ = coll.detect_ee_grid(pj, ej, thresh, stiff, budget, per_edge_cap=cap)
    ef, _ = coll.detect_ef_grid(pj, ej, fj, thresh, stiff, budget, per_edge_cap=cap)
    stencils = build_stencils(ej, fj, ef=ef, ee=ee, vf=vf)
    keep = np.flatnonzero(np.asarray(stencils.valid))
    pad8 = (-keep.size) % 8
    keep = np.concatenate([keep, np.zeros(pad8, np.int64)])
    stencils = type(stencils)(*(jnp.asarray(np.asarray(f)[keep]) for f in stencils))
    if pad8:
        stencils = stencils._replace(valid=stencils.valid.at[-pad8:].set(False))
    nst = int(np.asarray(stencils.valid).sum())
    print(f"n={n} stencils={nst} (slots={stencils.idx.size})", flush=True)

    ssys = cloth.assemble_system_stencil(mesh, positions=positions)
    ell = cloth.assemble_system(mesh, positions=positions)
    dgr, drr, goffsets = cloth.assemble_system_grid(mesh, positions=positions)
    k = grid.bit_length() - 1
    s2o, o2s = gm.sort_maps(k)
    maps = SortMaps(jnp.asarray(s2o), jnp.asarray(o2s))
    ce = jax.jit(lambda s: build_contact_ell(s, n, kc=32))(stencils)
    cslots = jax.jit(build_contact_slots, static_argnums=1)(stencils, n)

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

    # ---- 1. prepare walls -------------------------------------------------
    inv_leaf = lambda o: o.m if hasattr(o, "m") else (o.f if hasattr(o, "f") else o)

    p_plain = jax.jit(lambda dg, dr: prepare_grid(dg, dr, goffsets, k, cfg))
    p_cont = jax.jit(
        lambda dg, dr, s, o: prepare_grid(dg, dr, goffsets, k, cfg, s, o)
    )
    t, _ = timed(p_plain, dgr, drr, fetch=lambda o: inv_leaf(o)[0, 0, :1])
    print(f"prepare_grid plain       {t*1e3:8.2f} ms", flush=True)
    t, inv_static = timed(
        p_cont, dgr, drr, stencils, maps.orig_to_sorted,
        fetch=lambda o: inv_leaf(o)[0, 0, :1],
    )
    print(f"prepare_grid +stencils   {t*1e3:8.2f} ms", flush=True)

    # standalone: collision_terms + grid_collision_terms
    from precond_tpu.ops.gridassembly import grid_collision_terms

    def map_st(s, o2s_):
        return s._replace(
            idx=jnp.where(
                s.valid[:, None] & (jnp.arange(5) < s.nverts[:, None]),
                jnp.take(o2s_, jnp.clip(s.idx, 0, n - 1)), 0,
            )
        )

    ct_fn = jax.jit(lambda s, o: collision_terms(map_st(s, o)))
    t, terms = timed(ct_fn, stencils, maps.orig_to_sorted,
                     fetch=lambda o: o.pair_mat[0, 0, :1])
    print(f"  collision_terms        {t*1e3:8.2f} ms", flush=True)
    gct = jax.jit(lambda tr: grid_collision_terms(tr, cfg, n))
    t, _ = timed(gct, terms, fetch=lambda o: o[0][0, :1])
    print(f"  grid_collision_terms   {t*1e3:8.2f} ms", flush=True)

    # contact ELL + slots build walls (system-assembly side)
    t, _ = timed(jax.jit(lambda s: build_contact_ell(s, n, kc=32)), stencils,
                 fetch=lambda o: o.diag[0, 0, :1])
    print(f"  build_contact_ell      {t*1e3:8.2f} ms", flush=True)
    t, _ = timed(jax.jit(lambda s: build_contact_slots(s, n)), stencils,
                 fetch=lambda o: o.w[:1])
    print(f"  build_contact_slots    {t*1e3:8.2f} ms", flush=True)

    # ---- 2. iteration walls ----------------------------------------------
    from precond_tpu.ops.gridapply import precondition_grid, precondition_grid_cm
    from precond_tpu.ops.pallas.packed_symv import DenseInverseCM, PackedInverseCM

    cm = isinstance(inv_static, (DenseInverseCM, PackedInverseCM))
    print(f"static inv type: {type(inv_static).__name__} (cm={cm})", flush=True)

    def make_k_iter(contact_form, K):
        def run(op, st_, cst, state, bb):
            if cm:
                def pre(r):
                    rs = gm.grid_to_morton_cm(r, k)
                    return gm.morton_to_grid_cm(
                        precondition_grid_cm(state, rs, cfg), k)

                def sp(v):
                    q = gridstencil.spmv_t(op, v)
                    if contact_form == "scatter":
                        q = q + jnp.transpose(
                            stencil_contact_spmv(st_, jnp.transpose(v)))
                    elif contact_form == "slots":
                        q = q + jnp.transpose(
                            slot_contact_spmv(st_, cst, jnp.transpose(v)))
                    return q

                bi = jnp.transpose(bb)
            else:
                def pre(r):
                    rs = gm.grid_to_morton(r, k)
                    return gm.morton_to_grid(
                        precondition_grid(state, rs, cfg), k)

                def sp(v):
                    q = gridstencil.spmv(op, v)
                    if contact_form == "scatter":
                        q = q + stencil_contact_spmv(st_, v)
                    elif contact_form == "slots":
                        q = q + slot_contact_spmv(st_, cst, v)
                    return q

                bi = bb

            def body(_, carry):
                x, r, pp, z, rz = carry
                q = sp(pp)
                alpha = rz / jnp.sum(pp * q)
                x = x + alpha * pp
                r = r - alpha * q
                z = pre(r)
                rz_new = jnp.sum(r * z)
                pp = z + (rz_new / rz) * pp
                return (x, r, pp, z, rz_new)

            z0 = pre(bi)
            init = (jnp.zeros_like(bi), bi, z0, z0, jnp.sum(bi * z0))
            return jax.lax.fori_loop(0, K, body, init)[0].ravel()[:1]

        return jax.jit(run)

    for form in ("none", "scatter", "slots"):
        walls = {}
        for mult in (1, 3):
            kitm = make_k_iter(form, 50 * mult)
            t, _ = timed(kitm, ssys, stencils, cslots, inv_static, b, reps=3)
            walls[mult] = t
        it = (walls[3] - walls[1]) / 100
        print(f"iter[{form:7s}]          {it*1e3:8.4f} ms", flush=True)

    # ---- 3. convergence: static-grid M vs general-path M ------------------
    from precond_tpu.ops.apply import precondition_sorted
    from precond_tpu.ops.contact import contact_spmv
    from precond_tpu.parallel.pcg import pcg

    def spmv_full(v):
        return gridstencil.spmv(ssys, v) + slot_contact_spmv(stencils, cslots, v)

    # static-grid M (row-major so both Ms share a layout for iters parity)
    import dataclasses

    cfg_rows = dataclasses.replace(cfg, solve_layout="rows")
    inv_rows = jax.jit(
        lambda dg, dr, s, o: prepare_grid(dg, dr, goffsets, k, cfg_rows, s, o)
    )(dgr, drr, stencils, maps.orig_to_sorted)

    def pre_static(r):
        return gm.morton_to_grid(
            precondition_grid(inv_rows, gm.grid_to_morton(r, k), cfg_rows), k)

    sol_static = jax.jit(
        lambda bb: pcg(spmv_full, pre_static, bb, tol=1e-4, max_iters=2000,
                       check_every=8))
    t, res = timed(sol_static, b, reps=2, fetch=lambda r: r.x[0, :1])
    print(f"solve[static M]   iters={int(res.iterations)} "
          f"rel={float(res.rel_residual):.2e} wall={t*1e3:.1f} ms", flush=True)

    # general-path M (contact connectivity in clustering)
    pws = jax.jit(
        lambda e, m, s: prepare_with_system(e, m, cfg_rows, s)
    )
    t, (gstate, ell_sorted) = timed(
        pws, ell, maps, stencils,
        fetch=lambda o: inv_leaf(o[0].inv96)[0, 0, :1])
    print(f"prepare general +stencils {t*1e3:8.2f} ms", flush=True)

    def pre_general(r):
        zs = precondition_sorted(
            gstate, jnp.take(r, gstate.sorted_to_orig, axis=0), cfg_rows)
        return jnp.take(zs, gstate.orig_to_sorted, axis=0)

    sol_gen = jax.jit(
        lambda bb: pcg(spmv_full, pre_general, bb, tol=1e-4, max_iters=2000,
                       check_every=8))
    t, res = timed(sol_gen, b, reps=2, fetch=lambda r: r.x[0, :1])
    print(f"solve[general M]  iters={int(res.iterations)} "
          f"rel={float(res.rel_residual):.2e} wall={t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
