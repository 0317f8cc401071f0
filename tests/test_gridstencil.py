"""Stencil-form SpMV (structured-grid fast path) vs the block-ELL oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from precond_tpu.models import cloth
from precond_tpu.ops import blockcsr, gridstencil


@pytest.mark.parametrize("nx,ny", [(8, 8), (12, 20), (33, 17)])
def test_stencil_spmv_matches_ell(nx, ny):
    mesh = cloth.make_grid(nx, ny, z_wave=0.03, mass=0.002)
    ell = cloth.assemble_system(mesh)
    sys = cloth.assemble_system_stencil(mesh)
    assert sys.num_verts == mesh.num_verts
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((mesh.num_verts, 3)).astype(np.float32))
    y_ell = np.asarray(blockcsr.spmv(ell, x))
    y_st = np.asarray(gridstencil.spmv(sys, x))
    scale = np.abs(y_ell).max()
    np.testing.assert_allclose(y_st, y_ell, rtol=0, atol=2e-5 * scale)


def test_stencil_refresh_tracks_positions():
    """Refreshing with moved positions must match a fresh ELL assembly."""
    mesh = cloth.make_grid(10, 10, z_wave=0.0)
    rng = np.random.default_rng(1)
    moved = mesh.positions + 0.05 * rng.standard_normal(mesh.positions.shape).astype(np.float32)
    ell = cloth.assemble_system(mesh, positions=moved)
    sys = cloth.assemble_system_stencil(mesh, positions=moved)
    x = jnp.asarray(rng.standard_normal((mesh.num_verts, 3)).astype(np.float32))
    y_ell = np.asarray(blockcsr.spmv(ell, x))
    y_st = np.asarray(gridstencil.spmv(sys, x))
    np.testing.assert_allclose(y_st, y_ell, rtol=0, atol=2e-5 * np.abs(y_ell).max())


@pytest.mark.parametrize("nx,ny", [(8, 8), (12, 20), (33, 17)])
def test_sym_spmv_matches_full(nx, ny):
    """Canonical-half symmetric SpMV == full two-plane SpMV, incl. pinning."""
    mesh = cloth.make_grid(nx, ny, z_wave=0.03, mass=0.002)
    sys_full = cloth.assemble_system_stencil(mesh)
    sys_sym = cloth.assemble_system_stencil(mesh, sym=True)
    assert sys_sym.dirs_t.shape[0] * 2 == sys_full.dirs_t.shape[0]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((mesh.num_verts, 3)).astype(np.float32))
    y_full = np.asarray(gridstencil.spmv(sys_full, x))
    y_sym = np.asarray(gridstencil.spmv(sys_sym, x))
    scale = np.abs(y_full).max()
    np.testing.assert_allclose(y_sym, y_full, rtol=0, atol=2e-5 * scale)

    pinned = jnp.zeros((mesh.num_verts,), bool).at[jnp.asarray([0, 5, 17])].set(True)
    pf = gridstencil.pin_vertices(sys_full, pinned, 123.0)
    ps = gridstencil.pin_vertices(sys_sym, pinned, 123.0)
    y_full = np.asarray(gridstencil.spmv(pf, x))
    y_sym = np.asarray(gridstencil.spmv(ps, x))
    np.testing.assert_allclose(y_sym, y_full, rtol=0, atol=2e-5 * scale)
