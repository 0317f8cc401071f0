"""Implicit-Euler cloth/deformable simulator driving the preconditioned PCG.

The reference ships only the preconditioner; the host simulator that owns
time integration, force/Hessian assembly, collision detection and the PCG
loop is reconstructed in SURVEY.md §3.4 from the API comments
(SeSchwarzPreconditioner.h:55-63). This module is that host, TPU-native:
one jitted step = inertia target -> Gauss-Newton system -> Schwarz-PCG
solve -> velocity update, with pinned-vertex constraints and optional
self-collision penalties.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SchwarzConfig
from ..ops import blockcsr
from ..ops.apply import precondition
from ..ops.stencils import Stencils, build_stencils
from ..parallel.pcg import pcg
from ..solver import SchwarzPreconditioner
from . import cloth as cloth_model
from . import collision as collision_model


class SimState(NamedTuple):
    positions: jnp.ndarray   # f32[N,3]
    velocities: jnp.ndarray  # f32[N,3]
    step_count: int = 0


class SoftBodySim:
    """Tet-body deformable, implicit Euler, Schwarz-PCG solve.

    material="linear": small-strain elasticity keeps K constant — H is
    assembled once, internal forces f = -K (x - x0) reuse the solver SpMV.

    material="corotational": warped-stiffness (ARAP-flavored) elasticity —
    per-element rotations R from the deformation gradient's polar factor,
    H = M/dt^2 + sum_e R_e K_e R_e^T reassembled every step (SPD at
    arbitrary rotations), forces f_a = -sum R K (R^T x - x0).

    material="neohookean": stable Neo-Hookean (Smith, de Goes & Kim 2018)
    — exact autodiff forces and eigen-projected SPD element Hessians
    reassembled every step; finite through inversion. Together these are
    the BASELINE "tet-mesh deformable body (ARAP/Neo-Hookean Hessian)"
    config.

    collision_stiffness > 0 enables self-contact on the surface mesh
    (VF/EE/EF hash-grid detection on mesh.faces/mesh.edges), with the same
    treatment as ClothSim: penalty Hessians in H and M (pinned-eliminated
    via weight masking), gap-aware penalty forces in the rhs.
    """

    def __init__(self, mesh, cfg: SchwarzConfig = SchwarzConfig(),
                 gravity=(0.0, 0.0, -9.8), pinned: Optional[np.ndarray] = None,
                 tol: float = 1e-4, max_iters: int = 400,
                 material: str = "linear",
                 collision_stiffness: float = 0.0,
                 collision_threshold: float = 0.0,
                 collision_budget: int = 256,
                 collision_cell_cap: int = 16,
                 collision_rest_gap: Optional[float] = None):
        from . import tetmesh as tet_model

        assert material in ("linear", "corotational", "neohookean"), material
        self.mesh = mesh
        self.cfg = cfg
        self.tol = tol
        self.max_iters = max_iters
        self.material = material
        self.gravity = jnp.asarray(gravity, jnp.float32)
        self.pinned = jnp.zeros((mesh.num_verts,), bool)
        if pinned is not None:
            self.pinned = self.pinned.at[jnp.asarray(pinned)].set(True)
        self.collide = collision_stiffness > 0.0
        self.collision_stiffness = collision_stiffness
        self.collision_threshold = collision_threshold
        self.collision_budget = collision_budget
        self.collision_cell_cap = collision_cell_cap
        self.collision_rest_gap = (
            collision_threshold if collision_rest_gap is None else collision_rest_gap
        )

        from ..utils import boxmorton as bm

        self._box = mesh.dims if (mesh.dims and bm.supported(*mesh.dims)) else None
        self._static_system = material == "linear" and not self.collide
        self.pre = SchwarzPreconditioner(cfg)
        if self._box is not None:
            # analytic box ordering (topology-derived, never re-sorts);
            # maps are ARGUMENTS to the jitted step, not baked constants
            from ..solver import SortMaps

            s2o, o2s = bm.sort_maps(*self._box)
            self.pre.maps = SortMaps(jnp.asarray(s2o), jnp.asarray(o2s))
        elif not self._static_system or self._box is None:
            # general-path sort maps from REST positions (static: domain
            # quality follows rest-space locality; bodies deform locally)
            self.pre.allocate(mesh.positions)
        # device-resident assembly structure + rest element stiffness
        idx, mask, off_src, diag_src = tet_model.ell_structure_from_tets(
            mesh.num_verts, mesh.tets
        )
        self._ell_struct = tuple(map(jnp.asarray, (idx, mask, off_src, diag_src)))
        self._tets_d = jnp.asarray(mesh.tets)
        self._rest_d = jnp.asarray(mesh.positions)
        self._faces_d = jnp.asarray(mesh.faces)
        self._edges_d = jnp.asarray(mesh.edges)
        self._ke0 = jax.jit(tet_model.element_blocks, static_argnums=(2, 3))(
            self._rest_d, self._tets_d, mesh.lam, mesh.mu
        )

        if self._static_system:
            ell = tet_model.assemble_system(mesh)
            p = self.pinned
            touches = p[:, None] | jnp.take(p, ell.idx)
            big = (mesh.mass / mesh.dt**2) * jnp.eye(3, dtype=jnp.float32)
            self.ell = ell._replace(
                blocks=jnp.where(touches[:, :, None, None], 0.0, ell.blocks),
                diag=jnp.where(p[:, None, None], big, ell.diag),
            )
            # structured-box fast path: analytic 3-D tile ordering (no
            # runtime sort, arithmetic hierarchy) + gather-free SpMV
            self._bsys = None
            if self._box is not None:
                from ..ops import boxstencil
                from ..solver import prepare_box

                self._bsys = jax.jit(
                    lambda e: boxstencil.from_ell(e, self._box)
                )(self.ell)
                dgr, drr = jax.jit(
                    lambda e: boxstencil.planes_from_ell(e, self._box)
                )(self.ell)
                self._inv96 = jax.jit(
                    lambda a, b: prepare_box(
                        a, b, boxstencil.BOX_OFFSETS, self._box, cfg
                    )
                )(dgr, drr)
            else:
                self.pre.prepare(self.ell)
        else:
            self._step_fn = self._build_step()
        self.state = SimState(
            positions=jnp.asarray(mesh.positions),
            velocities=jnp.zeros((mesh.num_verts, 3), jnp.float32),
        )

    # -- static-system step (constant K, prepared once) ---------------------

    def _step_static(self) -> SimState:
        x, v = self.state.positions, self.state.velocities
        dt = self.mesh.dt
        m_dt2 = self.mesh.mass / dt**2
        x0 = jnp.asarray(self.mesh.positions)

        if self._box is not None:
            from ..ops import boxstencil
            from ..ops.gridapply import precondition_grid
            from ..utils import boxmorton as bm

            nx, ny, nz = self._box
            spmv_op = lambda p_: boxstencil.spmv(self._bsys, p_)  # noqa: E731
            pre_apply = lambda r_: bm.morton_to_box(  # noqa: E731
                precondition_grid(
                    self._inv96, bm.box_to_morton(r_, nx, ny, nz), self.cfg
                ),
                nx, ny, nz,
            )
        else:
            spmv_op = lambda p_: blockcsr.spmv(self.ell, p_)  # noqa: E731
            pre_apply = self.pre.apply

        # f_int = -K (x - x0); K = H - (m/dt^2) I on unpinned rows
        dxr = x - x0
        f_int = -(spmv_op(dxr) - m_dt2 * dxr)
        y = x + dt * v + dt * dt * self.gravity[None, :]
        rhs = m_dt2 * (y - x) + f_int
        rhs = jnp.where(self.pinned[:, None], 0.0, rhs)

        res = pcg(spmv_op, pre_apply, rhs,
                  tol=self.tol, max_iters=self.max_iters)
        dx = jnp.where(self.pinned[:, None], 0.0, res.x)
        x_new = x + dx
        self.state = SimState(positions=x_new, velocities=(x_new - x) / dt,
                              step_count=self.state.step_count + 1)
        self.last_solve = res
        return self.state

    # -- dynamic-system step (corotational and/or colliding) ----------------

    def _build_step(self):
        """Whole frame as one jitted dispatch: per-element rotations,
        H reassembly, detection, prepare, PCG (big arrays are arguments)."""
        from . import tetmesh as tet_model
        from ..ops.contact import contact_forces, stencil_contact_spmv
        from ..ops.stencils import build_stencils
        from ..solver import prepare_with_system

        cfg = self.cfg
        dt = self.mesh.dt
        m_dt2 = self.mesh.mass / dt**2
        tol, max_iters = self.tol, self.max_iters
        material = self.material
        lam, mu = self.mesh.lam, self.mesh.mu
        collide = self.collide
        box = self._box
        c_thresh, c_stiff = self.collision_threshold, self.collision_stiffness
        c_budget, c_cap, c_rest = (
            self.collision_budget, self.collision_cell_cap, self.collision_rest_gap
        )

        @jax.jit
        def step_fn(estruct, ke0, tets, rest, faces, edges, maps, pinned,
                    gravity, x, v):
            n = x.shape[0]
            idx, mask, off_src, diag_src = estruct
            if material == "corotational":
                r = tet_model.corot_rotations(x, rest, tets)
                ke = tet_model.element_blocks_corot(ke0, r)
                f_int = tet_model.corot_forces(ke0, r, x, rest, tets)
            elif material == "neohookean":
                ke = tet_model.snh_element_blocks(x, rest, tets, lam, mu)
                f_int = tet_model.snh_forces(x, rest, tets, lam, mu)
            else:
                ke = ke0
                rI = jnp.broadcast_to(jnp.eye(3), (tets.shape[0], 3, 3))
                f_int = tet_model.corot_forces(ke0, rI, x, rest, tets)
            ell = tet_model.fill_ell_from_ke(idx, mask, off_src, diag_src, ke, m_dt2)
            touches = pinned[:, None] | jnp.take(pinned, ell.idx)
            big = m_dt2 * jnp.eye(3, dtype=jnp.float32)
            ell = ell._replace(
                blocks=jnp.where(touches[:, :, None, None], 0.0, ell.blocks),
                diag=jnp.where(pinned[:, None, None], big, ell.diag),
            )

            stencils, st_sys, detect_info = None, None, None
            if collide:
                kv = cfg.max_collision_per_vert
                vf, i1 = collision_model.detect_vf_grid(
                    x, faces, c_thresh, c_stiff, c_budget,
                    per_vertex_cap=kv, cell_cap=c_cap)
                ee, i2 = collision_model.detect_ee_grid(
                    x, edges, c_thresh, c_stiff, c_budget,
                    per_edge_cap=kv, cell_cap=c_cap)
                ef, i3 = collision_model.detect_ef_grid(
                    x, edges, faces, c_thresh, c_stiff, c_budget,
                    per_edge_cap=kv, cell_cap=c_cap)
                stencils = build_stencils(edges, faces, ef=ef, ee=ee, vf=vf)
                detect_info = collision_model.DetectInfo(
                    truncated=i1.truncated | i2.truncated | i3.truncated,
                    dropped=i1.dropped + i2.dropped + i3.dropped,
                )
                # pinned-eliminated contact Hessian (see ClothSim note):
                # rank-1 in the weights, so masking pinned weights is exact
                wmask = ~jnp.take(pinned, jnp.clip(stencils.idx, 0, n - 1))
                st_sys = stencils._replace(
                    weight=stencils.weight * wmask.astype(jnp.float32)
                )

            # rhs: inertia target + internal + contact penalty forces
            y = x + dt * v + dt * dt * gravity[None, :]
            rhs = m_dt2 * (y - x) + f_int
            if stencils is not None:
                rhs = rhs + contact_forces(stencils, x, c_rest)
            rhs = jnp.where(pinned[:, None], 0.0, rhs)

            if box is not None:
                from ..ops import boxstencil
                from ..ops.gridapply import precondition_grid
                from ..solver import prepare_box
                from ..utils import boxmorton as bm

                nx, ny, nz = box
                bsys = boxstencil.from_ell(ell, box)
                dgr, drr = boxstencil.planes_from_ell(ell, box)
                inv96 = prepare_box(
                    dgr, drr, boxstencil.BOX_OFFSETS, box, cfg,
                    st_sys, maps.orig_to_sorted,
                )
                if st_sys is not None:
                    # rank-1 stencil form: ~30x fewer gathered rows than the
                    # compact ELL at production contact counts (ops/contact.py)
                    spmv_op = lambda p_: (  # noqa: E731
                        boxstencil.spmv(bsys, p_) + stencil_contact_spmv(st_sys, p_)
                    )
                else:
                    spmv_op = lambda p_: boxstencil.spmv(bsys, p_)  # noqa: E731
                pre_op = lambda r_: bm.morton_to_box(  # noqa: E731
                    precondition_grid(
                        inv96, bm.box_to_morton(r_, nx, ny, nz), cfg
                    ),
                    nx, ny, nz,
                )
                res = pcg(spmv_op, pre_op, rhs, tol=tol, max_iters=max_iters)
                x_unsorted = res.x
            else:
                from ..ops.apply import precondition_sorted

                state, ells = prepare_with_system(ell, maps, cfg, st_sys)
                if st_sys is not None:
                    mapped = st_sys._replace(
                        idx=jnp.take(
                            maps.orig_to_sorted,
                            jnp.clip(st_sys.idx, 0, n - 1),
                        )
                    )
                    spmv_op = lambda p_: (  # noqa: E731
                        blockcsr.spmv(ells, p_) + stencil_contact_spmv(mapped, p_)
                    )
                else:
                    spmv_op = lambda p_: blockcsr.spmv(ells, p_)  # noqa: E731
                rhs_sorted = jnp.take(rhs, maps.sorted_to_orig, axis=0)
                res = pcg(
                    spmv_op,
                    lambda r_: precondition_sorted(state, r_, cfg),
                    rhs_sorted, tol=tol, max_iters=max_iters,
                )
                x_unsorted = jnp.take(res.x, maps.orig_to_sorted, axis=0)

            dx = jnp.where(pinned[:, None], 0.0, x_unsorted)
            x_new = x + dx
            return x_new, (x_new - x) / dt, res, detect_info

        return step_fn

    def step(self) -> SimState:
        if self._static_system:
            return self._step_static()
        x, v = self.state.positions, self.state.velocities
        x_new, v_new, res, detect_info = self._step_fn(
            self._ell_struct, self._ke0, self._tets_d, self._rest_d,
            self._faces_d, self._edges_d, self.pre.maps, self.pinned,
            self.gravity, x, v,
        )
        self.state = SimState(positions=x_new, velocities=v_new,
                              step_count=self.state.step_count + 1)
        self.last_solve = res
        self.last_detect_info = detect_info
        return self.state


class ClothSim:
    """Mass-spring cloth with implicit Euler and multilevel Schwarz PCG."""

    def __init__(
        self,
        mesh: cloth_model.ClothMesh,
        cfg: SchwarzConfig = SchwarzConfig(),
        gravity=(0.0, 0.0, -9.8),
        pinned: Optional[np.ndarray] = None,
        tol: float = 1e-4,
        max_iters: int = 400,
        collision_stiffness: float = 0.0,
        collision_threshold: float = 0.0,
        collision_budget: int = 256,
        collision_cell_cap: int = 16,
        collision_rest_gap: Optional[float] = None,
    ):
        self.mesh = mesh
        self.cfg = cfg
        self.tol = tol
        self.max_iters = max_iters
        self.gravity = jnp.asarray(gravity, jnp.float32)
        self.pinned = jnp.zeros((mesh.num_verts,), bool)
        if pinned is not None:
            self.pinned = self.pinned.at[jnp.asarray(pinned)].set(True)
        self.collide = collision_stiffness > 0.0
        self.collision_stiffness = collision_stiffness
        self.collision_threshold = collision_threshold
        self.collision_budget = collision_budget
        self.collision_cell_cap = collision_cell_cap
        # penalty rest separation: contacts push apart until this gap
        # (defaults to the detection threshold)
        self.collision_rest_gap = (
            collision_threshold if collision_rest_gap is None else collision_rest_gap
        )

        self.pre = SchwarzPreconditioner(cfg)
        # fixed ELL sparsity from rest topology; per-step refresh is jitted
        self._ell0 = cloth_model.assemble_system(mesh)
        _, _, self._spring_of_slot = cloth_model.ell_structure_from_springs(
            mesh.num_verts, mesh.springs
        )
        # Grid fast path: analytic tile-Morton ordering (domain quality
        # follows CONNECTIVITY, which is static for a grid, so the order
        # never needs re-sorting) + stencil-form SpMV in the PCG loop with
        # transform-based order crossings in the apply.
        from ..utils import gridmorton as gm

        self._gmk = None
        if mesh.grid is not None and gm.supported(*mesh.grid):
            self._gmk = mesh.grid[0].bit_length() - 1
            from ..solver import SortMaps

            s2o, o2s = gm.sort_maps(self._gmk)
            self._grid_maps = SortMaps(jnp.asarray(s2o), jnp.asarray(o2s))
            self._stencil_offsets, ks = cloth_model.stencil_structure_from_springs(
                mesh.grid[0], mesh.grid[1], mesh.springs, mesh.stiffness
            )
            self._stencil_ks = jnp.asarray(ks)
        self.state = SimState(
            positions=jnp.asarray(mesh.positions),
            velocities=jnp.zeros((mesh.num_verts, 3), jnp.float32),
        )
        self._springs_d = jnp.asarray(mesh.springs)
        self._stiff_d = jnp.asarray(mesh.stiffness)
        self._rest_pos = jnp.asarray(mesh.positions)
        self._faces_d = jnp.asarray(mesh.faces)
        self._edges_d = jnp.asarray(mesh.edges)
        self._sos_d = jnp.asarray(self._spring_of_slot)
        self._step_fn = self._build_step()

    # -- fully-jitted step (one dispatch per frame) -------------------------

    def _build_step(self):
        """The whole frame — ELL refresh, detection, prepare, PCG — as one
        jitted function; big arrays are arguments, never closures (closure
        constants both serialize badly and blow the remote-compile size
        cap; docs/DESIGN.md §3)."""
        cfg = self.cfg
        dt = self.mesh.dt
        m_dt2 = self.mesh.mass / dt**2
        tol, max_iters = self.tol, self.max_iters
        collide = self.collide
        gmk = self._gmk
        grid_shape = self.mesh.grid
        st_offsets = self._stencil_offsets if gmk is not None else None
        from ..ops import gridstencil
        c_thresh, c_stiff, c_budget = (
            self.collision_threshold, self.collision_stiffness, self.collision_budget
        )
        c_cap = self.collision_cell_cap
        c_rest = self.collision_rest_gap

        @jax.jit
        def step_fn(ell0, maps, springs, stiffness, rest_pos, sos, faces, edges,
                    pinned, gravity, st_ks, x, v):
            ell = None
            if gmk is None:
                # the grid path never touches the ELL form
                ell = cloth_model.update_ell_blocks(
                    ell0, springs, stiffness, x, m_dt2, sos
                )
                # pinned vertices: decouple rows/cols, keep SPD mass diagonal
                touches = pinned[:, None] | jnp.take(pinned, ell.idx)
                big = m_dt2 * jnp.eye(3, dtype=jnp.float32)
                ell = ell._replace(
                    blocks=jnp.where(touches[:, :, None, None], 0.0, ell.blocks),
                    diag=jnp.where(pinned[:, None, None], big, ell.diag),
                )

            stencils = None
            st_sys = None
            detect_info = None
            if collide:
                # Hash-grid broad phase, all three set types (the reference
                # consumes EF+EE+VF, cpp:67-72), per-vertex/edge budget from
                # cfg.max_collision_per_vert (cpp:187-188).
                kv = cfg.max_collision_per_vert
                vf, i1 = collision_model.detect_vf_grid(
                    x, faces, c_thresh, c_stiff, c_budget,
                    per_vertex_cap=kv, cell_cap=c_cap)
                ee, i2 = collision_model.detect_ee_grid(
                    x, edges, c_thresh, c_stiff, c_budget,
                    per_edge_cap=kv, cell_cap=c_cap)
                ef, i3 = collision_model.detect_ef_grid(
                    x, edges, faces, c_thresh, c_stiff, c_budget,
                    per_edge_cap=kv, cell_cap=c_cap)
                stencils = build_stencils(edges, faces, ef=ef, ee=ee, vf=vf)
                detect_info = collision_model.DetectInfo(
                    truncated=i1.truncated | i2.truncated | i3.truncated,
                    dropped=i1.dropped + i2.dropped + i3.dropped,
                )
                # Pinned DOF are eliminated from the solve (dx = 0), so the
                # contact Hessian entering H and M must be the eliminated
                # one too — the stencil Hessian is rank-1 in the weights
                # (stiff * w w^T (x) d d^T), so zeroing pinned vertices'
                # weights reproduces it exactly. Without this, contact
                # coupling drags pinned rows inside the solve (their dx is
                # only zeroed afterward): relative contact motion goes
                # unresisted and the penalty rhs overshoots by 100x+.
                # contact_forces below keeps the FULL weights: the gap g
                # depends on pinned positions even though their DOF don't.
                wmask = ~jnp.take(
                    pinned, jnp.clip(stencils.idx, 0, x.shape[0] - 1)
                )
                st_sys = stencils._replace(
                    weight=stencils.weight * wmask.astype(jnp.float32)
                )
                # contacts belong IN the system the PCG solves, not just in
                # M (ops/contact.py): H dx = rhs with penalty Hessians in H
                # resists relative contact motion this step; M then tracks
                # exactly the coupling H carries. Applied in rank-1 stencil
                # form at SpMV time (ops/contact.stencil_contact_spmv).

            from ..solver import prepare_grid, prepare_with_system
            from ..ops.apply import precondition_sorted
            from ..ops.gridapply import precondition_grid
            from ..ops.gridassembly import pin_grid_blocks

            grid_prep = gmk is not None
            if grid_prep:
                # Static-pattern grid prepare: no ELL permute, no hierarchy
                # build (ops/gridapply.py proves the hierarchy is the
                # arithmetic one). Contacts cannot change grid clustering
                # (every bank is already one fully-merged cluster), so
                # collision frames ride the same static path with
                # arithmetic-climb Hessian terms (tests/test_gridprep.py).
                full_off = tuple(
                    o for di, dj in st_offsets for o in ((di, dj), (-di, -dj))
                )
                dgr, drr = cloth_model.update_grid_blocks(
                    st_offsets, st_ks, x, m_dt2, grid_shape
                )
                dgr, drr = pin_grid_blocks(
                    dgr, drr, full_off, grid_shape, pinned, m_dt2
                )
                inv96 = prepare_grid(
                    dgr, drr, full_off, gmk, cfg,
                    st_sys, maps.orig_to_sorted,
                )
                state = None
            else:
                state, ells = prepare_with_system(ell, maps, cfg, st_sys)
            if gmk is not None:
                # st_ks is an ARGUMENT (never a closure constant: a [D,nx,ny]
                # stiffness plane baked into the program blows the remote-
                # compile size cap at 1M vertices, docs/DESIGN.md §3)
                ssys = gridstencil.pin_vertices(
                    cloth_model.update_stencil_blocks(
                        st_offsets, st_ks, x, m_dt2, grid_shape
                    ),
                    pinned, m_dt2,
                )

            # Gauss-Newton rhs around current x with inertia target
            rest = jnp.linalg.norm(
                jnp.take(rest_pos, springs[:, 1], 0) - jnp.take(rest_pos, springs[:, 0], 0),
                axis=-1,
            )
            d = jnp.take(x, springs[:, 1], 0) - jnp.take(x, springs[:, 0], 0)
            length = jnp.linalg.norm(d, axis=-1)
            dn = d / jnp.maximum(length, 1e-12)[:, None]
            f = (stiffness * (length - rest))[:, None] * dn
            f_int = jnp.zeros_like(x).at[springs[:, 0]].add(f).at[springs[:, 1]].add(-f)
            y = x + dt * v + dt * dt * gravity[None, :]
            rhs = m_dt2 * (y - x) + f_int
            if stencils is not None:
                # gap-aware penalty forces: the rhs counterpart of the
                # contact Hessians already in H/M (ops/contact.py) —
                # without them contacts only damp relative motion instead
                # of resolving penetration
                from ..ops.contact import contact_forces

                rhs = rhs + contact_forces(stencils, x, c_rest)
            rhs = jnp.where(pinned[:, None], 0.0, rhs)

            if gmk is not None:
                # grid order with stencil SpMV (zero gathers); the apply
                # crosses into sorted order via analytic transforms
                from ..utils import gridmorton as gm
                from ..ops.pallas.packed_symv import DenseInverseCM, PackedInverseCM

                if grid_prep and isinstance(inv96, (PackedInverseCM, DenseInverseCM)):
                    # comp-major solve: [3,N] carries, transpose-free SpMV,
                    # MXU-oriented crossings (ops/gridapply docstring)
                    from ..ops.gridapply import precondition_grid_cm

                    pre_op = lambda r_: gm.morton_to_grid_cm(  # noqa: E731
                        precondition_grid_cm(
                            inv96, gm.grid_to_morton_cm(r_, gmk), cfg
                        ),
                        gmk,
                    )
                    if st_sys is not None:
                        from ..ops.contact import stencil_contact_spmv

                        spmv_op = lambda p_: (  # noqa: E731
                            gridstencil.spmv_t(ssys, p_)
                            + jnp.transpose(
                                stencil_contact_spmv(st_sys, jnp.transpose(p_))
                            )
                        )
                    else:
                        spmv_op = lambda p_: gridstencil.spmv_t(ssys, p_)  # noqa: E731
                    res = pcg(
                        spmv_op, pre_op, jnp.transpose(rhs),
                        tol=tol, max_iters=max_iters,
                    )
                    x_unsorted = jnp.transpose(res.x)
                else:
                    _g2m, _m2g = gm.crossing_pair(gmk)
                    if grid_prep:
                        pre_op = lambda r_: _m2g(  # noqa: E731
                            precondition_grid(inv96, _g2m(r_, gmk), cfg), gmk
                        )
                    else:
                        pre_op = lambda r_: _m2g(  # noqa: E731
                            precondition_sorted(state, _g2m(r_, gmk), cfg), gmk
                        )
                    if st_sys is not None:
                        from ..ops.contact import stencil_contact_spmv

                        spmv_op = lambda p_: (  # noqa: E731
                            gridstencil.spmv(ssys, p_)
                            + stencil_contact_spmv(st_sys, p_)
                        )
                    else:
                        spmv_op = lambda p_: gridstencil.spmv(ssys, p_)  # noqa: E731
                    res = pcg(
                        spmv_op,
                        pre_op,
                        rhs, tol=tol, max_iters=max_iters,
                    )
                    x_unsorted = res.x
            else:
                # Solve in Morton-sorted space: permute rhs once, x back
                # once (drops two N-row gathers per PCG iteration).
                if st_sys is not None:
                    from ..ops.contact import stencil_contact_spmv

                    mapped = st_sys._replace(
                        idx=jnp.take(
                            maps.orig_to_sorted,
                            jnp.clip(st_sys.idx, 0, x.shape[0] - 1),
                        )
                    )
                    spmv_op = lambda p_: (  # noqa: E731
                        blockcsr.spmv(ells, p_) + stencil_contact_spmv(mapped, p_)
                    )
                else:
                    spmv_op = lambda p_: blockcsr.spmv(ells, p_)  # noqa: E731
                rhs_sorted = jnp.take(rhs, maps.sorted_to_orig, axis=0)
                res = pcg(
                    spmv_op,
                    lambda r_: precondition_sorted(state, r_, cfg),
                    rhs_sorted, tol=tol, max_iters=max_iters,
                )
                x_unsorted = jnp.take(res.x, maps.orig_to_sorted, axis=0)
            dx = jnp.where(pinned[:, None], 0.0, x_unsorted)
            x_new = x + dx
            return x_new, (x_new - x) / dt, res, detect_info

        return step_fn

    def step(self) -> SimState:
        """Advance one frame: re-sort on cadence (host), then one dispatch."""
        x, v = self.state.positions, self.state.velocities
        if self._gmk is not None:
            # analytic grid ordering is topology-derived: never re-sorts
            self.pre.maps = self._grid_maps
            self.pre.frame_index += 1
        else:
            self.pre.allocate(x)  # refreshes Morton maps on the cadence
        st_ks = self._stencil_ks if self._gmk is not None else jnp.zeros((), jnp.float32)
        x_new, v_new, res, detect_info = self._step_fn(
            self._ell0, self.pre.maps, self._springs_d, self._stiff_d,
            self._rest_pos, self._sos_d, self._faces_d, self._edges_d,
            self.pinned, self.gravity, st_ks, x, v,
        )
        self.state = SimState(positions=x_new, velocities=v_new,
                              step_count=self.state.step_count + 1)
        self.last_solve = res
        self.last_detect_info = detect_info
        return self.state
