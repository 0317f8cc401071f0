"""Tet-mesh deformable body: FEM assembly sanity + preconditioner oracle."""

import jax.numpy as jnp
import numpy as np

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import tetmesh
from precond_tpu.ops import blockcsr
from precond_tpu.parallel.pcg import jacobi_preconditioner, pcg
from precond_tpu.solver import SchwarzPreconditioner


def test_stiffness_properties():
    mesh = tetmesh.make_box(3, 3, 3)
    ell = tetmesh.assemble_system(mesh)
    dense = np.asarray(blockcsr.to_dense(ell)).astype(np.float64)
    # symmetric
    np.testing.assert_allclose(dense, dense.T, rtol=1e-5, atol=1e-2)
    # SPD with the mass term
    evals = np.linalg.eigvalsh(0.5 * (dense + dense.T))
    assert evals.min() > 0
    # stiffness annihilates rigid translations: K @ translation = mass-only
    n = mesh.num_verts
    t = np.tile(np.array([1.0, 0.0, 0.0]), n)
    m_dt2 = mesh.mass / mesh.dt**2
    np.testing.assert_allclose(dense @ t, m_dt2 * t, rtol=1e-4, atol=1e-2)


def test_single_domain_exact_tet():
    mesh = tetmesh.make_box(3, 3, 3)  # 27 verts <= 32: one domain
    n = mesh.num_verts
    ell = tetmesh.assemble_system(mesh)
    pre = SchwarzPreconditioner(SchwarzConfig())
    pre.allocate(mesh.positions)
    pre.prepare(ell)
    assert not bool(pre.state.overflow)
    dense = np.asarray(blockcsr.to_dense(ell)).astype(np.float64)
    rng = np.random.default_rng(0)
    r = rng.standard_normal((n, 3)).astype(np.float32)
    z = np.asarray(pre.apply(jnp.asarray(r))).reshape(-1)
    z_ref = np.linalg.solve(dense, r.reshape(-1))
    np.testing.assert_allclose(z, z_ref, rtol=3e-4, atol=1e-10)


def test_pcg_on_soft_body():
    mesh = tetmesh.make_box(6, 6, 6, mass=0.01)  # 216 verts, volumetric rows
    n = mesh.num_verts
    ell = tetmesh.assemble_system(mesh)
    assert ell.max_degree >= 14  # volumetric adjacency is denser than cloth
    pre = SchwarzPreconditioner(SchwarzConfig())
    pre.allocate(mesh.positions)
    pre.prepare(ell)
    assert not bool(pre.state.overflow)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    spmv = lambda x: blockcsr.spmv(ell, x)
    rs = pcg(spmv, pre.apply, b, tol=1e-4, max_iters=500)
    rj = pcg(spmv, jacobi_preconditioner(ell.diag), b, tol=1e-4, max_iters=2000)
    assert float(rs.rel_residual) <= 1e-4
    assert int(rs.iterations) < int(rj.iterations)
