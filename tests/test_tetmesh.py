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


def test_element_stiffness_annihilates_rigid_modes():
    """Every element K must annihilate translations AND infinitesimal
    rotations (the 6-dim rigid null space of linear elasticity). Catches
    the gradient-convention bug: grad N_i is the i-th ROW of Dm^-1; using
    columns breaks this on any element whose Dm is not symmetric."""
    mesh = tetmesh.make_box(3, 3, 3, youngs=1e4)
    rest = jnp.asarray(mesh.positions)
    tets = jnp.asarray(mesh.tets)
    ke = np.asarray(tetmesh.element_blocks(rest, tets, mesh.lam, mesh.mu)).astype(np.float64)
    w = np.array([[0, -0.3, 0.2], [0.3, 0, -0.1], [-0.2, 0.1, 0]])
    scale = np.abs(ke).max()
    for t in range(len(mesh.tets)):
        k12 = ke[t].transpose(0, 2, 1, 3).reshape(12, 12)
        x0 = mesh.positions[mesh.tets[t]].astype(np.float64)
        u_rot = (w @ x0.T).T.reshape(-1)
        u_trn = np.tile([1.0, 2.0, 3.0], 4)
        assert np.abs(k12 @ u_rot).max() < 1e-5 * scale, t
        assert np.abs(k12 @ u_trn).max() < 1e-5 * scale, t


def test_corot_rest_and_rigid_motion():
    """Corotational blocks/forces: identity at rest; zero forces and
    R-conjugated blocks under rigid motion (where the linear model
    produces large spurious forces)."""
    mesh = tetmesh.make_box(3, 3, 3, youngs=1e4)
    rest = jnp.asarray(mesh.positions)
    tets = jnp.asarray(mesh.tets)
    ke0 = tetmesh.element_blocks(rest, tets, mesh.lam, mesh.mu)

    r = tetmesh.corot_rotations(rest, rest, tets)
    assert float(jnp.abs(r - jnp.eye(3)).max()) < 1e-5
    f0 = tetmesh.corot_forces(ke0, r, rest, rest, tets)
    assert float(jnp.abs(f0).max()) == 0.0

    th = 0.7
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    xr = rest @ rot.T + jnp.asarray([0.3, -0.2, 0.5])
    rr = tetmesh.corot_rotations(xr, rest, tets)
    assert float(jnp.abs(rr - jnp.asarray(rot)).max()) < 1e-5
    fr = tetmesh.corot_forces(ke0, rr, xr, rest, tets)
    scale = float(jnp.abs(ke0).max())
    assert float(jnp.abs(fr).max()) < 1e-5 * scale
    ker = tetmesh.element_blocks_corot(ke0, rr)
    want = jnp.einsum("ij,tabjk,lk->tabil", jnp.asarray(rot), ke0, jnp.asarray(rot))
    assert float(jnp.abs(ker - want).max()) < 1e-4 * scale


def test_corot_matches_linear_to_first_order():
    mesh = tetmesh.make_box(3, 3, 3, youngs=1e4)
    rest = jnp.asarray(mesh.positions)
    tets = jnp.asarray(mesh.tets)
    ke0 = tetmesh.element_blocks(rest, tets, mesh.lam, mesh.mu)
    rng = np.random.default_rng(0)
    dx = (1e-4 * rng.standard_normal(mesh.positions.shape)).astype(np.float32)
    xs = rest + dx
    r = tetmesh.corot_rotations(xs, rest, tets)
    fc = tetmesh.corot_forces(ke0, r, xs, rest, tets)
    ell = tetmesh.assemble_system(mesh)
    flin = -(blockcsr.spmv(ell, jnp.asarray(dx))
             - (mesh.mass / mesh.dt**2) * jnp.asarray(dx))
    scale = float(jnp.abs(flin).max())
    assert float(jnp.abs(fc - flin).max()) < 2e-3 * scale


def test_stable_neohookean_forces_and_hessian():
    """Stable Neo-Hookean (Smith et al. 2018): zero forces at rest and
    under rigid motion; forces are the exact energy gradient (FD); the
    eig-projected assembled H stays SPD under heavy compression."""
    mesh = tetmesh.make_box(3, 3, 3, youngs=1e4)
    rest = jnp.asarray(mesh.positions)
    tets = jnp.asarray(mesh.tets)
    lam, mu = mesh.lam, mesh.mu

    f0 = tetmesh.snh_forces(rest, rest, tets, lam, mu)
    assert float(jnp.abs(f0).max()) < 1e-3

    th = 0.7
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    xr = rest @ jnp.asarray(rot).T + jnp.asarray([0.3, -0.2, 0.5])
    fr = tetmesh.snh_forces(xr, rest, tets, lam, mu)
    assert float(jnp.abs(fr).max()) < 0.1  # f32 roundoff vs lam~1e4

    # finite-difference gradient check at a deformed state (f64 oracle)
    rng = np.random.default_rng(0)
    x = np.asarray(rest, np.float64) + 0.05 * rng.standard_normal(rest.shape)
    f = np.asarray(tetmesh.snh_forces(jnp.asarray(x, jnp.float32), rest, tets, lam, mu))

    def energy(xx):
        xs = xx[mesh.tets]
        rs = np.asarray(rest, np.float64)[mesh.tets]
        dm = np.stack([rs[:, 1] - rs[:, 0], rs[:, 2] - rs[:, 0], rs[:, 3] - rs[:, 0]], axis=2)
        ds = np.stack([xs[:, 1] - xs[:, 0], xs[:, 2] - xs[:, 0], xs[:, 3] - xs[:, 0]], axis=2)
        fg = ds @ np.linalg.inv(dm)
        vol = np.abs(np.linalg.det(dm)) / 6
        alpha = 1 + mu / lam
        ic = (fg * fg).sum((1, 2))
        jdet = np.linalg.det(fg)
        return float((vol * (0.5 * mu * (ic - 3) + 0.5 * lam * (jdet - alpha) ** 2)).sum())

    eps = 1e-6
    for v, k in [(3, 0), (10, 2), (20, 1)]:
        xp, xm = x.copy(), x.copy()
        xp[v, k] += eps
        xm[v, k] -= eps
        fd = -(energy(xp) - energy(xm)) / (2 * eps)
        assert abs(f[v, k] - fd) < 5e-3 * max(abs(fd), 1.0), (v, k, f[v, k], fd)

    # SPD projection under 60% compression
    xc = rest * jnp.asarray([1.0, 1.0, 0.4])
    ke = tetmesh.snh_element_blocks(xc, rest, tets, lam, mu)
    idx, mask, off_src, diag_src = tetmesh.ell_structure_from_tets(mesh.num_verts, mesh.tets)
    ell = tetmesh.fill_ell_from_ke(
        jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(off_src),
        jnp.asarray(diag_src), ke, mesh.mass / mesh.dt**2,
    )
    n = mesh.num_verts
    h = np.zeros((3 * n, 3 * n))
    bl, ix, mk, dg = map(np.asarray, (ell.blocks, ell.idx, ell.mask, ell.diag))
    for i in range(n):
        h[3 * i : 3 * i + 3, 3 * i : 3 * i + 3] += dg[i]
        for s in range(ix.shape[1]):
            if mk[i, s]:
                j = ix[i, s]
                h[3 * i : 3 * i + 3, 3 * j : 3 * j + 3] += bl[i, s]
    assert np.linalg.eigvalsh(0.5 * (h + h.T)).min() > 0


def test_soft_body_neohookean_steps():
    from precond_tpu.models.simulator import SoftBodySim

    mesh = tetmesh.make_box(8, 8, 4, mass=0.05, youngs=5e4)
    base = np.flatnonzero(np.asarray(mesh.positions)[:, 2] < 1e-6)
    sim = SoftBodySim(mesh, SchwarzConfig(), pinned=base, material="neohookean")
    for _ in range(3):
        st = sim.step()
        assert np.all(np.isfinite(np.asarray(st.positions)))
        assert float(sim.last_solve.rel_residual) <= 1e-4
