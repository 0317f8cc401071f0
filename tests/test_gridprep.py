"""Structured-grid fast-path oracle tests.

Validate the claim ops/gridapply.py rests on — the general hierarchy
builder (ops/hierarchy.py) produces EXACTLY the arithmetic-progression
hierarchy on tile-ordered grid meshes (every bank at every level is one
connected cluster) — and that the static-transfer apply matches the
general one-hot apply bit-for-tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth
from precond_tpu.ops.apply import precondition_sorted
from precond_tpu.ops.gridapply import (
    grid_going_next,
    grid_level_sizes,
    precondition_grid,
)
from precond_tpu.solver import SortMaps, prepare_with_system
from precond_tpu.utils import gridmorton as gm


def _grid_state(k: int, cfg: SchwarzConfig):
    grid = 1 << k
    mesh = cloth.make_grid(grid, grid, z_wave=0.02, mass=0.001, dt=1.0 / 60.0)
    ell = cloth.assemble_system(mesh)
    s2o, o2s = gm.sort_maps(k)
    maps = SortMaps(jnp.asarray(s2o), jnp.asarray(o2s))
    state, ells = jax.jit(
        lambda e, m: prepare_with_system(e, m, cfg, None), static_argnums=()
    )(ell, maps)
    return mesh, state, ells


@pytest.mark.parametrize("k", [3, 5, 6])
def test_general_hierarchy_is_arithmetic_on_grids(k):
    cfg = SchwarzConfig(solve_layout="rows")
    mesh, state, _ = _grid_state(k, cfg)
    n = mesh.num_verts
    assert not bool(state.overflow)
    np.testing.assert_array_equal(
        np.asarray(state.going_next), np.asarray(grid_going_next(n, cfg))
    )
    sizes = grid_level_sizes(n, cfg)
    assert sizes[0] == n and all(
        sizes[l + 1] == max(sizes[l] // 32, 1) for l in range(len(sizes) - 1)
    )


@pytest.mark.parametrize("k", [3, 5, 6, 7])
def test_grid_assembly_matches_general(k):
    """Grid vs general banked assembly (k=7 exercises 3 levels incl. the
    m=2 off-diagonal/chain paths; a k=8 four-level run was verified
    out-of-suite: both paths sit within 3e-7/1.4e-6 relative of a float64
    oracle — the residual difference is summation order, the grid path's
    tree reshape-sums being slightly MORE accurate than the general
    path's sequential one-hot chains)."""
    from precond_tpu.ops.assembly import assemble_banked_hessian
    from precond_tpu.ops.gridassembly import assemble_grid_hessian
    from precond_tpu.ops import hierarchy as hi
    from precond_tpu.ops.blockcsr import permute

    cfg = SchwarzConfig(solve_layout="rows")
    grid = 1 << k
    mesh = cloth.make_grid(grid, grid, z_wave=0.02, mass=0.001, dt=1.0 / 60.0)
    n = mesh.num_verts
    ell = cloth.assemble_system(mesh)
    s2o, o2s = gm.sort_maps(k)
    maps = SortMaps(jnp.asarray(s2o), jnp.asarray(o2s))
    ells = jax.jit(lambda e, m: permute(e, m.sorted_to_orig, m.orig_to_sorted))(ell, maps)
    hier = jax.jit(lambda i, m: hi.build_hierarchy(i, m, cfg, None))(ells.idx, ells.mask)
    h_gen = np.asarray(
        jax.jit(lambda e, h: assemble_banked_hessian(e, h, cfg, None))(ells, hier)
    )

    diag_rows, dirs_rows, offsets = cloth.assemble_system_grid(mesh)
    h_grid = np.asarray(
        jax.jit(
            lambda dg, dr: assemble_grid_hessian(dg, dr, offsets, k, cfg)
        )(diag_rows, dirs_rows)
    )
    scale = np.abs(h_gen).max()
    np.testing.assert_allclose(h_grid, h_gen, rtol=1e-5, atol=3e-5 * scale)


@pytest.mark.parametrize("k", [5, 6])
def test_grid_prepare_solves(k):
    """prepare_grid + precondition_grid drive a PCG solve to tolerance and
    produce the same iteration count as the general path."""
    from precond_tpu.ops import gridstencil
    from precond_tpu.parallel.pcg import pcg
    from precond_tpu.solver import prepare_grid

    cfg = SchwarzConfig(solve_layout="rows")
    grid = 1 << k
    mesh = cloth.make_grid(grid, grid, z_wave=0.02, mass=0.001, dt=1.0 / 60.0)
    n = mesh.num_verts
    ssys = cloth.assemble_system_stencil(mesh)
    diag_rows, dirs_rows, offsets = cloth.assemble_system_grid(mesh)
    inv96 = jax.jit(
        lambda dg, dr: prepare_grid(dg, dr, offsets, k, cfg)
    )(diag_rows, dirs_rows)

    _, state, _ = _grid_state(k, cfg)
    np.testing.assert_allclose(
        np.asarray(inv96), np.asarray(state.inv96), rtol=2e-4, atol=1e-5
    )

    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

    def pre_op(r):
        rs = gm.grid_to_morton(r, k)
        return gm.morton_to_grid(precondition_grid(inv96, rs, cfg), k)

    res = jax.jit(
        lambda b: pcg(lambda v: gridstencil.spmv(ssys, v), pre_op, b,
                      tol=1e-4, max_iters=500)
    )(b)
    assert float(res.rel_residual) <= 1e-4 * 1.01
    assert int(res.iterations) < 200


@pytest.mark.parametrize("k", [5, 6])
def test_grid_apply_matches_general(k):
    cfg = SchwarzConfig(solve_layout="rows")
    mesh, state, _ = _grid_state(k, cfg)
    n = mesh.num_verts
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    z_gen = np.asarray(precondition_sorted(state, r, cfg))
    z_grid = np.asarray(precondition_grid(state.inv96, r, cfg))
    scale = np.abs(z_gen).max()
    np.testing.assert_allclose(z_grid, z_gen, rtol=1e-5, atol=1e-6 * scale)


@pytest.mark.parametrize("k", [5, 6])
def test_grid_path_with_collisions_matches_general(k):
    """Contacts don't change grid clustering (every bank is already one
    fully-merged cluster), so the static path + arithmetic collision
    climbs must reproduce the general hierarchy AND assembly exactly."""
    from precond_tpu.models import collision as coll
    from precond_tpu.ops.stencils import build_stencils
    from precond_tpu.solver import prepare_grid

    cfg = SchwarzConfig(solve_layout="rows")
    grid = 1 << k
    mesh = cloth.make_grid(grid, grid, z_wave=0.02, mass=0.001, dt=1.0 / 60.0)
    n = mesh.num_verts
    # fold the sheet onto itself (still a grid mesh) -> real VF/EE sets
    p = np.asarray(mesh.positions).copy()
    fold = p[:, 0] > 0.5
    p[:, 2] = np.where(fold, 0.006, 0.0)
    p[:, 0] = np.where(fold, 1.0 - p[:, 0], p[:, 0])
    pos = jnp.asarray(p)
    fj, ej = jnp.asarray(mesh.faces), jnp.asarray(mesh.edges)
    vf, _ = coll.detect_vf_grid(pos, fj, 0.01, 1e3, 4 * grid)
    ee, _ = coll.detect_ee_grid(pos, ej, 0.01, 1e3, 4 * grid)
    stencils = build_stencils(ej, fj, ee=ee, vf=vf)
    assert int(np.asarray(stencils.valid).sum()) > 0, "fixture found no contacts"

    ell = cloth.assemble_system(mesh, positions=p)
    s2o, o2s = gm.sort_maps(k)
    maps = SortMaps(jnp.asarray(s2o), jnp.asarray(o2s))
    state, _ = jax.jit(lambda e, m, s: prepare_with_system(e, m, cfg, s))(
        ell, maps, stencils
    )
    # clustering is unchanged by the contacts
    np.testing.assert_array_equal(
        np.asarray(state.going_next), np.asarray(grid_going_next(n, cfg))
    )

    diag_rows, dirs_rows, offsets = cloth.assemble_system_grid(mesh, positions=p)
    inv96 = jax.jit(
        lambda dg, dr, s, o: prepare_grid(dg, dr, offsets, k, cfg, s, o)
    )(diag_rows, dirs_rows, stencils, jnp.asarray(o2s))
    np.testing.assert_allclose(
        np.asarray(inv96), np.asarray(state.inv96), rtol=2e-4, atol=1e-5
    )
