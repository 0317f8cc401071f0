"""3-D box (tet lattice) analytic ordering: the single-cluster-bank claim
and the analytic-hierarchy prepare against the general builder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import tetmesh
from precond_tpu.ops.gridapply import grid_going_next, precondition_grid
from precond_tpu.solver import SortMaps, prepare_with_system
from precond_tpu.utils import boxmorton as bm


@pytest.mark.parametrize("dims", [(8, 8, 4), (8, 8, 8), (16, 8, 8)])
def test_general_hierarchy_is_arithmetic_on_boxes(dims):
    cfg = SchwarzConfig()
    mesh = tetmesh.make_box(*dims, mass=0.05, youngs=5e4)
    n = mesh.num_verts
    ell = tetmesh.assemble_system(mesh)
    s2o, o2s = bm.sort_maps(*dims)
    maps = SortMaps(jnp.asarray(s2o), jnp.asarray(o2s))
    state, _ = jax.jit(lambda e, m: prepare_with_system(e, m, cfg, None))(ell, maps)
    assert not bool(state.overflow)
    np.testing.assert_array_equal(
        np.asarray(state.going_next), np.asarray(grid_going_next(n, cfg))
    )


def test_box_analytic_prepare_matches_general():
    dims = (8, 8, 8)
    cfg = SchwarzConfig()
    mesh = tetmesh.make_box(*dims, mass=0.05, youngs=5e4)
    n = mesh.num_verts
    ell = tetmesh.assemble_system(mesh)
    s2o, o2s = bm.sort_maps(*dims)
    maps = SortMaps(jnp.asarray(s2o), jnp.asarray(o2s))
    st_gen, ells = jax.jit(lambda e, m: prepare_with_system(e, m, cfg, None))(ell, maps)
    st_ana, _ = jax.jit(
        lambda e, m: prepare_with_system(e, m, cfg, None, analytic_hier=True)
    )(ell, maps)
    np.testing.assert_array_equal(
        np.asarray(st_gen.going_next), np.asarray(st_ana.going_next)
    )
    np.testing.assert_allclose(
        np.asarray(st_ana.inv96), np.asarray(st_gen.inv96), rtol=2e-4, atol=1e-6
    )
    # static-transfer apply works on the analytic state's inverse directly
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    from precond_tpu.ops.apply import precondition_sorted

    z_gen = np.asarray(precondition_sorted(st_gen, r, cfg))
    z_box = np.asarray(precondition_grid(st_ana.inv96, r, cfg))
    scale = np.abs(z_gen).max()
    np.testing.assert_allclose(z_box, z_gen, rtol=1e-5, atol=1e-5 * scale)


def test_box_static_assembly_matches_general():
    """assemble_box_hessian (static 3-D placement) == general assembly."""
    from precond_tpu.ops import boxstencil
    from precond_tpu.ops.assembly import assemble_banked_hessian
    from precond_tpu.ops.gridassembly import assemble_box_hessian
    from precond_tpu.ops import hierarchy as hi
    from precond_tpu.ops.blockcsr import permute

    dims = (8, 8, 8)
    cfg = SchwarzConfig()
    mesh = tetmesh.make_box(*dims, mass=0.05, youngs=5e4)
    ell = tetmesh.assemble_system(mesh)
    s2o, o2s = bm.sort_maps(*dims)
    maps = SortMaps(jnp.asarray(s2o), jnp.asarray(o2s))
    ells = jax.jit(lambda e, m: permute(e, m.sorted_to_orig, m.orig_to_sorted))(ell, maps)
    hier = jax.jit(lambda i, m: hi.build_hierarchy(i, m, cfg, None))(ells.idx, ells.mask)
    h_gen = np.asarray(
        jax.jit(lambda e, h: assemble_banked_hessian(e, h, cfg, None))(ells, hier)
    )

    diag, dirs = boxstencil.planes_from_ell(ell, dims)
    h_box = np.asarray(
        jax.jit(
            lambda dg, dr: assemble_box_hessian(
                dg, dr, boxstencil.BOX_OFFSETS, dims, cfg
            )
        )(diag, dirs)
    )
    scale = np.abs(h_gen).max()
    np.testing.assert_allclose(h_box, h_gen, rtol=1e-5, atol=3e-5 * scale)


def test_prepare_box_solves():
    from precond_tpu.ops import boxstencil
    from precond_tpu.parallel.pcg import pcg
    from precond_tpu.solver import prepare_box

    dims = (8, 8, 8)
    cfg = SchwarzConfig()
    mesh = tetmesh.make_box(*dims, mass=0.05, youngs=5e4)
    n = mesh.num_verts
    ell = tetmesh.assemble_system(mesh)
    bsys = boxstencil.from_ell(ell, dims)
    diag, dirs = boxstencil.planes_from_ell(ell, dims)
    inv96 = jax.jit(
        lambda dg, dr: prepare_box(dg, dr, boxstencil.BOX_OFFSETS, dims, cfg)
    )(diag, dirs)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

    def pre_op(r):
        rs = bm.box_to_morton(r, *dims)
        return bm.morton_to_box(precondition_grid(inv96, rs, cfg), *dims)

    res = jax.jit(
        lambda b: pcg(lambda v: boxstencil.spmv(bsys, v), pre_op, b,
                      tol=1e-4, max_iters=300)
    )(b)
    assert float(res.rel_residual) <= 1e-4 * 1.01


def test_prepare_box_with_stencils_matches_general():
    """Collision terms on the 3-D box path: arithmetic climbs must
    reproduce the general assembly exactly (clustering is invariant)."""
    from precond_tpu.models import collision as coll
    from precond_tpu.ops.stencils import build_stencils
    from precond_tpu.ops import boxstencil
    from precond_tpu.solver import prepare_box

    dims = (8, 8, 8)
    cfg = SchwarzConfig()
    mesh = tetmesh.make_box(*dims, mass=0.05, youngs=5e4)
    n = mesh.num_verts
    ell = tetmesh.assemble_system(mesh)
    pos = jnp.asarray(mesh.positions)
    fj, ej = jnp.asarray(mesh.faces), jnp.asarray(mesh.edges)
    # over-wide threshold: non-incident surface pairs across box edges
    # produce real stencils (physicality is irrelevant to assembly equality)
    h = 1.0 / 7
    vf, _ = coll.detect_vf_grid(pos, fj, 1.2 * h, 1e3, 256, per_vertex_cap=4)
    ee, _ = coll.detect_ee_grid(pos, ej, 1.2 * h, 1e3, 256, per_edge_cap=4)
    stencils = build_stencils(ej, fj, ee=ee, vf=vf)
    assert int(np.asarray(stencils.valid).sum()) > 0, "fixture found no contacts"

    s2o, o2s = bm.sort_maps(*dims)
    maps = SortMaps(jnp.asarray(s2o), jnp.asarray(o2s))
    state, _ = jax.jit(lambda e, m, s: prepare_with_system(e, m, cfg, s))(
        ell, maps, stencils
    )
    np.testing.assert_array_equal(
        np.asarray(state.going_next), np.asarray(grid_going_next(n, cfg))
    )
    dgr, drr = jax.jit(lambda e: boxstencil.planes_from_ell(e, dims))(ell)
    inv96 = jax.jit(
        lambda dg, dr, s, o: prepare_box(
            dg, dr, boxstencil.BOX_OFFSETS, dims, cfg, s, o
        )
    )(dgr, drr, stencils, jnp.asarray(o2s))
    np.testing.assert_allclose(
        np.asarray(inv96), np.asarray(state.inv96), rtol=2e-4, atol=1e-5
    )
