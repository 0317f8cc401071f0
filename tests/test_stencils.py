"""Collision stencil pipeline: flattening semantics (cpp:304-413), rank-1
Hessian routing (cpp:1164-1227), and a dense single-domain oracle."""

import jax.numpy as jnp
import numpy as np

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth
from precond_tpu.ops import blockcsr, stencils as st
from precond_tpu.solver import SchwarzPreconditioner


def _vf(v_id, f_id, stiff, bary, normal):
    return st.VfSets(
        v_id=jnp.asarray(v_id, jnp.int32),
        f_id=jnp.asarray(f_id, jnp.int32),
        stiff=jnp.asarray(stiff, jnp.float32),
        bary=jnp.asarray(bary, jnp.float32),
        normal=jnp.asarray(normal, jnp.float32),
    )


def _ee(e0, e1, stiff, bary, normal):
    return st.EeSets(
        e_id0=jnp.asarray(e0, jnp.int32),
        e_id1=jnp.asarray(e1, jnp.int32),
        stiff=jnp.asarray(stiff, jnp.float32),
        bary=jnp.asarray(bary, jnp.float32),
        normal=jnp.asarray(normal, jnp.float32),
    )


def _ef(e, f, stiff, bary, normal):
    return st.EfSets(
        e_id=jnp.asarray(e, jnp.int32),
        f_id=jnp.asarray(f, jnp.int32),
        stiff=jnp.asarray(stiff, jnp.float32),
        bary=jnp.asarray(bary, jnp.float32),
        normal=jnp.asarray(normal, jnp.float32),
    )


def dense_stencil_hessian(n, sten):
    """Oracle: H_c = sum_s stiff * (w w^T) kron (d d^T) scattered to verts."""
    h = np.zeros((3 * n, 3 * n))
    idx = np.asarray(sten.idx)
    w = np.asarray(sten.weight)
    nv = np.asarray(sten.nverts)
    dirs = np.asarray(sten.direction)
    stiff = np.asarray(sten.stiff)
    valid = np.asarray(sten.valid)
    for s in range(sten.count):
        if not valid[s]:
            continue
        dd = stiff[s] * np.outer(dirs[s], dirs[s])
        for a in range(nv[s]):
            for b in range(nv[s]):
                ia, ib = idx[s, a], idx[s, b]
                h[3 * ia : 3 * ia + 3, 3 * ib : 3 * ib + 3] += w[s, a] * w[s, b] * dd
    return h


def test_flattening_weights():
    mesh = cloth.make_grid(4, 4)
    edges, faces = jnp.asarray(mesh.edges), jnp.asarray(mesh.faces)
    ef = _ef([0], [1], [7.0], [[0.3, 0.2, 0.4]], [[0.0, 0.0, 1.0]])
    ee = _ee([0], [5], [5.0], [[0.25, 0.6]], [[0.0, 1.0, 0.0]])
    vf = _vf([15], [2], [3.0], [[0.2, 0.3]], [[1.0, 0.0, 0.0]])
    s = st.build_stencils(edges, faces, ef=ef, ee=ee, vf=vf)
    assert s.count == 3
    w = np.asarray(s.weight)
    # EF (cpp:344-348)
    np.testing.assert_allclose(w[0, :5], [0.3, 0.7, -0.2, -0.4, -0.4], rtol=1e-6)
    # EE (cpp:372-375)
    np.testing.assert_allclose(w[1, :4], [0.25, 0.75, -0.6, -0.4], rtol=1e-6)
    # VF: physically-consistent -(1-b0-b1) third weight (reference cpp:399
    # reads OOB from a Float2 here; see stencils.py docstring)
    np.testing.assert_allclose(w[2, :4], [-0.2, -0.3, -0.5, 1.0], rtol=1e-6)
    # first-primitive split
    np.testing.assert_array_equal(np.asarray(s.nfirst), [2, 2, 3])
    np.testing.assert_array_equal(np.asarray(s.nverts), [5, 4, 4])
    # negative ids are masked invalid
    s2 = st.build_stencils(edges, faces, vf=_vf([-1], [0], [1.0], [[0.1, 0.1]], [[0, 0, 1]]))
    assert not bool(s2.valid[0])


def test_single_domain_exact_with_collisions():
    # 25 verts, one domain: apply must equal (H + H_collision)^{-1} exactly.
    mesh = cloth.make_grid(5, 5, z_wave=0.02)
    n = mesh.num_verts
    ell = cloth.assemble_system(mesh)
    edges, faces = jnp.asarray(mesh.edges), jnp.asarray(mesh.faces)
    vf = _vf([24, 7], [0, 11], [50.0, 80.0], [[0.2, 0.5], [0.4, 0.3]],
             [[0.0, 0.0, 1.0], [0.6, 0.8, 0.0]])
    ee = _ee([0], [30], [60.0], [[0.5, 0.5]], [[0.0, 1.0, 0.0]])
    sten = st.build_stencils(edges, faces, ee=ee, vf=vf)

    pre = SchwarzPreconditioner(SchwarzConfig())
    pre.allocate(mesh.positions)
    pre.prepare(ell, sten)
    assert not bool(pre.state.overflow)

    h_sys = np.asarray(blockcsr.to_dense(ell)).astype(np.float64) + dense_stencil_hessian(n, sten)
    rng = np.random.default_rng(0)
    r = rng.standard_normal((n, 3)).astype(np.float32)
    z = np.asarray(pre.apply(jnp.asarray(r))).reshape(-1)
    z_ref = np.linalg.solve(h_sys, r.reshape(-1).astype(np.float64))
    np.testing.assert_allclose(z, z_ref, rtol=3e-4, atol=1e-8)


def test_multilevel_collisions_spd_and_convergence():
    # 144 verts, 2 levels, cross-mesh contacts: M^{-1} stays symmetric PSD
    # and PCG on H+H_c converges faster with the collision-aware M.
    # long dt -> stiffness-dominated, genuinely ill-conditioned system
    mesh = cloth.make_grid(12, 12, z_wave=0.02, dt=0.5)
    n = mesh.num_verts
    ell = cloth.assemble_system(mesh)
    edges, faces = jnp.asarray(mesh.edges), jnp.asarray(mesh.faces)
    rng = np.random.default_rng(3)
    vf = _vf([140, 3, 77], [0, 100, 30], [200.0, 150.0, 120.0],
             rng.random((3, 2), dtype=np.float32) * 0.4,
             [[0, 0, 1], [1, 0, 0], [0, 1, 0]])
    sten = st.build_stencils(edges, faces, vf=vf)

    pre = SchwarzPreconditioner(SchwarzConfig())
    pre.allocate(mesh.positions)
    pre.prepare(ell, sten)
    assert not bool(pre.state.overflow)

    h_sys = np.asarray(blockcsr.to_dense(ell)).astype(np.float64) + dense_stencil_hessian(n, sten)

    minv = []
    for i in range(3 * n):
        e = np.zeros((n, 3), np.float32)
        e[i // 3, i % 3] = 1.0
        minv.append(np.asarray(pre.apply(jnp.asarray(e))).reshape(-1))
    minv = np.stack(minv, 1).astype(np.float64)
    asym = np.abs(minv - minv.T).max() / np.abs(minv).max()
    assert asym < 1e-5
    evals = np.linalg.eigvalsh(0.5 * (minv + minv.T))
    assert evals.min() > -1e-10 * evals.max()

    # preconditioned spectrum should be clustered: cond(M^-1 H) << cond(H)
    mh = minv @ h_sys
    ev = np.abs(np.linalg.eigvals(mh))
    cond_pre = ev.max() / ev.min()
    ev_h = np.linalg.eigvalsh(h_sys)
    cond_h = ev_h.max() / ev_h.min()
    assert cond_pre < cond_h / 3, (cond_pre, cond_h)
