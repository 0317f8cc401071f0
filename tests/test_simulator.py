"""End-to-end simulation: hanging cloth under gravity stays finite, pinned
vertices hold, solves converge, and the sheet sags downward."""

import numpy as np

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth
from precond_tpu.models.simulator import ClothSim


def test_hanging_cloth_steps():
    n = 12
    mesh = cloth.make_grid(n, n, mass=0.05, dt=1.0 / 60.0, k_struct=3e3, k_shear=3e3, k_bend=30.0)
    # pin the top edge (x == 0 row)
    pinned = np.arange(n)  # vertices (0, j)
    sim = ClothSim(mesh, SchwarzConfig(), pinned=pinned)

    z0 = np.asarray(sim.state.positions)[:, 2].mean()
    for _ in range(6):
        st = sim.step()
        assert np.all(np.isfinite(np.asarray(st.positions)))
        assert float(sim.last_solve.rel_residual) <= 1e-4
        assert int(sim.last_solve.iterations) < 400

    pos = np.asarray(sim.state.positions)
    # pinned vertices never moved
    np.testing.assert_allclose(pos[pinned], mesh.positions[pinned], atol=1e-6)
    # the free part sagged downward
    assert pos[:, 2].mean() < z0 - 1e-4
    # velocities stay bounded (no explosion)
    assert np.abs(np.asarray(sim.state.velocities)).max() < 50.0


def test_soft_body_settles():
    from precond_tpu.models import tetmesh
    from precond_tpu.models.simulator import SoftBodySim

    mesh = tetmesh.make_box(5, 5, 5, mass=0.05, youngs=5e4)
    # pin the bottom face (z == 0 plane): indices with k == 0
    nz = 5
    pinned = np.asarray([i for i in range(mesh.num_verts) if i % nz == 0])
    sim = SoftBodySim(mesh, SchwarzConfig(), pinned=pinned)
    z0 = np.asarray(sim.state.positions)[:, 2].mean()
    for _ in range(5):
        st = sim.step()
        assert np.all(np.isfinite(np.asarray(st.positions)))
        assert float(sim.last_solve.rel_residual) <= 1e-4
    pos = np.asarray(sim.state.positions)
    np.testing.assert_allclose(pos[pinned], mesh.positions[pinned], atol=1e-6)
    assert pos[:, 2].mean() < z0  # compresses under gravity
    assert np.abs(np.asarray(sim.state.velocities)).max() < 50.0


def test_two_layer_cloth_with_collisions():
    # stacked sheets with penalty collisions: solver must stay stable
    n = 8
    mesh = cloth.make_grid(n, n, mass=0.05, dt=1.0 / 60.0, k_struct=2e3, k_shear=2e3, k_bend=20.0)
    pinned = np.arange(n)
    sim = ClothSim(
        mesh, SchwarzConfig(), pinned=pinned,
        collision_stiffness=1e3, collision_threshold=0.02, collision_budget=64,
    )
    for _ in range(3):
        st = sim.step()
        assert np.all(np.isfinite(np.asarray(st.positions)))
        assert float(sim.last_solve.rel_residual) <= 1e-4


def test_collision_sim_uses_all_three_set_types():
    # A genuinely two-layer cloth (stacked sheets joined only by proximity):
    # the step must detect VF, EE and EF sets through the hash-grid broad
    # phase and keep the solve stable. VERDICT round-1 item 4.
    n = 12
    m1 = cloth.make_grid(n, n, mass=0.05, dt=1.0 / 60.0,
                         k_struct=2e3, k_shear=2e3, k_bend=20.0)
    n1 = m1.num_verts
    pos = np.concatenate([m1.positions, m1.positions + [0, 0, 0.012]]).astype(np.float32)
    faces = np.concatenate([m1.faces, m1.faces + n1]).astype(np.int32)
    edges = np.concatenate(
        [m1.edges, np.where(m1.edges >= 0, m1.edges + n1, -1)]
    ).astype(np.int32)
    springs = np.concatenate([m1.springs, m1.springs + n1])
    stiffness = np.concatenate([m1.stiffness, m1.stiffness])
    mesh2 = cloth.ClothMesh(pos, edges, faces, springs, stiffness, m1.mass, m1.dt)
    pinned = np.concatenate([np.arange(n), n1 + np.arange(n)])
    sim = ClothSim(
        mesh2, SchwarzConfig(), pinned=pinned,
        collision_stiffness=1e3, collision_threshold=0.015, collision_budget=512,
        collision_cell_cap=32,
    )
    for _ in range(2):
        st = sim.step()
        assert np.all(np.isfinite(np.asarray(st.positions)))
        assert float(sim.last_solve.rel_residual) <= 1e-4
    info = sim.last_detect_info
    assert not bool(info.truncated)


def test_grid_fast_path_matches_generic():
    """The analytic-order stencil fast path and the generic ELL path must
    integrate to the same trajectory (same matrix, same rhs; only the
    solver's internal ordering/SpMV differ)."""
    import numpy as np
    import jax.numpy as jnp
    from precond_tpu.config import SchwarzConfig
    from precond_tpu.models import cloth
    from precond_tpu.models.simulator import ClothSim

    mesh = cloth.make_grid(16, 16, mass=0.05, dt=1.0 / 60.0,
                           k_struct=3e3, k_shear=3e3, k_bend=30.0)
    pinned = np.asarray([0, 15])
    fast = ClothSim(mesh, SchwarzConfig(), pinned=pinned)
    assert fast._gmk is not None  # 16x16 qualifies
    slow = ClothSim(mesh, SchwarzConfig(), pinned=pinned)
    slow._gmk = None
    slow._step_fn = slow._build_step()
    for _ in range(3):
        sf = fast.step()
        ss = slow.step()
    diff = float(jnp.abs(sf.positions - ss.positions).max())
    scale = float(jnp.abs(ss.positions).max())
    assert diff < 2e-4 * scale, diff
    assert np.allclose(np.asarray(sf.positions)[pinned],
                       np.asarray(mesh.positions)[pinned])


def test_contact_forces_separate_close_sheets():
    """Penalty forces in the rhs push two too-close sheets apart: the mean
    inter-layer gap must GROW over steps (Hessians alone only damp relative
    motion; the rhs term is what resolves proximity violations)."""
    n = 8
    m1 = cloth.make_grid(n, n, mass=0.05, dt=1.0 / 60.0,
                         k_struct=2e3, k_shear=2e3, k_bend=20.0)
    n1 = m1.num_verts
    gap0 = 0.006
    pos = np.concatenate([m1.positions, m1.positions + [0, 0, gap0]]).astype(np.float32)
    faces = np.concatenate([m1.faces, m1.faces + n1]).astype(np.int32)
    edges = np.concatenate(
        [m1.edges, np.where(m1.edges >= 0, m1.edges + n1, -1)]
    ).astype(np.int32)
    springs = np.concatenate([m1.springs, m1.springs + n1])
    stiffness = np.concatenate([m1.stiffness, m1.stiffness])
    mesh2 = cloth.ClothMesh(pos, edges, faces, springs, stiffness, m1.mass, m1.dt)
    # pin ALL of the lower sheet so gravity can't move it; the upper sheet
    # hangs by its x=0 row and is pressed toward the lower only by contacts
    pinned = np.concatenate([np.arange(n1), n1 + np.arange(n)])
    sim = ClothSim(
        mesh2, SchwarzConfig(), gravity=(0.0, 0.0, 0.0), pinned=pinned,
        collision_stiffness=5e3, collision_threshold=0.015, collision_budget=512,
        collision_cell_cap=32,
    )
    for _ in range(4):
        st = sim.step()
        assert np.all(np.isfinite(np.asarray(st.positions)))
    p = np.asarray(st.positions)
    gap = p[n1:, 2].mean() - p[:n1, 2].mean()
    assert gap > gap0 * 1.5, gap  # contacts pushed the layers apart
    # ... and gently: pinned-eliminated contact Hessians in H bound the
    # step near the rest gap (an unpinned contact H lets the penalty rhs
    # overshoot by 100x+ — the sheet would be several mesh-widths away)
    assert gap < 0.06, gap
    assert np.abs(np.asarray(st.velocities)).max() < 5.0


def test_soft_body_corotational_rigid_invariance():
    """Corotational material: a rigidly rotated body produces no internal
    forces — one zero-gravity step leaves it in place (the linear material
    fights the rotation with spurious forces)."""
    import jax.numpy as jnp
    from precond_tpu.models import tetmesh
    from precond_tpu.models.simulator import SoftBodySim

    mesh = tetmesh.make_box(8, 8, 8, mass=0.05, youngs=5e4)
    th = 0.6
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    sim = SoftBodySim(mesh, SchwarzConfig(), gravity=(0.0, 0.0, 0.0),
                      material="corotational")
    xr = jnp.asarray(mesh.positions) @ jnp.asarray(rot).T
    sim.state = sim.state._replace(positions=xr)
    st = sim.step()
    drift = float(jnp.abs(st.positions - xr).max())
    assert drift < 1e-4, drift
    assert float(sim.last_solve.rel_residual) <= 1e-4

    sim_lin = SoftBodySim(mesh, SchwarzConfig(), gravity=(0.0, 0.0, 0.0),
                          material="linear")
    sim_lin.state = sim_lin.state._replace(positions=xr)
    st_lin = sim_lin.step()
    drift_lin = float(jnp.abs(st_lin.positions - xr).max())
    assert drift_lin > 10 * max(drift, 1e-6), (drift, drift_lin)


def test_soft_body_corotational_box_drop_steps():
    """Corotational tet box under gravity on the structured-box fast path:
    steps stay finite, solves converge."""
    from precond_tpu.models import tetmesh
    from precond_tpu.models.simulator import SoftBodySim

    mesh = tetmesh.make_box(8, 8, 4, mass=0.05, youngs=5e4)
    base = np.flatnonzero(np.asarray(mesh.positions)[:, 2] < 1e-6)
    sim = SoftBodySim(mesh, SchwarzConfig(), pinned=base,
                      material="corotational")
    for _ in range(3):
        st = sim.step()
        assert np.all(np.isfinite(np.asarray(st.positions)))
        assert float(sim.last_solve.rel_residual) <= 1e-4


def test_soft_body_collision_separates_boxes():
    """Two tet boxes placed within the contact threshold: surface VF/EE/EF
    detection + penalty forces push them apart toward the rest gap
    (general path: the union of two boxes is not a single box)."""
    from precond_tpu.models import tetmesh
    from precond_tpu.models.simulator import SoftBodySim

    m1 = tetmesh.make_box(4, 4, 4, mass=0.05, youngs=5e4)
    n1 = m1.num_verts
    gap0 = 0.08
    pos = np.concatenate(
        [m1.positions, m1.positions + [0.0, 0.0, 1.0 + gap0]]
    ).astype(np.float32)
    tets = np.concatenate([m1.tets, m1.tets + n1]).astype(np.int32)
    faces = np.concatenate([m1.faces, m1.faces + n1]).astype(np.int32)
    edges = np.concatenate(
        [m1.edges, np.where(m1.edges >= 0, m1.edges + n1, -1)]
    ).astype(np.int32)
    mesh2 = tetmesh.TetMesh(
        positions=pos, tets=tets, faces=faces, edges=edges,
        mass=m1.mass, dt=m1.dt, lam=m1.lam, mu=m1.mu, dims=None,
    )
    pinned = np.arange(n1)  # lower box fixed
    sim = SoftBodySim(
        mesh2, SchwarzConfig(), gravity=(0.0, 0.0, 0.0), pinned=pinned,
        material="corotational",
        collision_stiffness=5e3, collision_threshold=0.15,
        collision_budget=512, collision_cell_cap=32,
    )
    ztop0 = pos[n1:, 2].mean()
    for _ in range(4):
        st = sim.step()
        assert np.all(np.isfinite(np.asarray(st.positions)))
    p = np.asarray(st.positions)
    rise = p[n1:, 2].mean() - ztop0
    assert rise > 0.01, rise          # pushed apart...
    assert rise < 0.5, rise           # ...boundedly (pinned-eliminated H)
