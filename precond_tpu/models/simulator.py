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
    """Linear-elastic tet body, implicit Euler, Schwarz-PCG solve.

    Small-strain elasticity keeps K constant: H = M/dt^2 + K is assembled
    once, internal forces are f = -K (x - x0) = -(H - M/dt^2)(x - x0)
    computed with the same SpMV as the solver — no per-step reassembly.
    """

    def __init__(self, mesh, cfg: SchwarzConfig = SchwarzConfig(),
                 gravity=(0.0, 0.0, -9.8), pinned: Optional[np.ndarray] = None,
                 tol: float = 1e-4, max_iters: int = 400):
        from . import tetmesh as tet_model

        self.mesh = mesh
        self.cfg = cfg
        self.tol = tol
        self.max_iters = max_iters
        self.gravity = jnp.asarray(gravity, jnp.float32)
        self.pinned = jnp.zeros((mesh.num_verts,), bool)
        if pinned is not None:
            self.pinned = self.pinned.at[jnp.asarray(pinned)].set(True)

        ell = tet_model.assemble_system(mesh)
        p = self.pinned
        touches = p[:, None] | jnp.take(p, ell.idx)
        big = (mesh.mass / mesh.dt**2) * jnp.eye(3, dtype=jnp.float32)
        self.ell = ell._replace(
            blocks=jnp.where(touches[:, :, None, None], 0.0, ell.blocks),
            diag=jnp.where(p[:, None, None], big, ell.diag),
        )
        self.pre = SchwarzPreconditioner(cfg)
        self.pre.allocate(mesh.positions)
        self.pre.prepare(self.ell)
        self.state = SimState(
            positions=jnp.asarray(mesh.positions),
            velocities=jnp.zeros((mesh.num_verts, 3), jnp.float32),
        )

    def step(self) -> SimState:
        x, v = self.state.positions, self.state.velocities
        dt = self.mesh.dt
        m_dt2 = self.mesh.mass / dt**2
        x0 = jnp.asarray(self.mesh.positions)

        # f_int = -K (x - x0); K = H - (m/dt^2) I on unpinned rows
        dxr = x - x0
        f_int = -(blockcsr.spmv(self.ell, dxr) - m_dt2 * dxr)
        y = x + dt * v + dt * dt * self.gravity[None, :]
        rhs = m_dt2 * (y - x) + f_int
        rhs = jnp.where(self.pinned[:, None], 0.0, rhs)

        res = pcg(lambda p_: blockcsr.spmv(self.ell, p_), self.pre.apply, rhs,
                  tol=self.tol, max_iters=self.max_iters)
        dx = jnp.where(self.pinned[:, None], 0.0, res.x)
        x_new = x + dx
        self.state = SimState(positions=x_new, velocities=(x_new - x) / dt,
                              step_count=self.state.step_count + 1)
        self.last_solve = res
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

        self.pre = SchwarzPreconditioner(cfg)
        # fixed ELL sparsity from rest topology; per-step refresh is jitted
        self._ell0 = cloth_model.assemble_system(mesh)
        _, _, self._spring_of_slot = cloth_model.ell_structure_from_springs(
            mesh.num_verts, mesh.springs
        )
        self.state = SimState(
            positions=jnp.asarray(mesh.positions),
            velocities=jnp.zeros((mesh.num_verts, 3), jnp.float32),
        )

    # -- physics pieces ----------------------------------------------------

    def _spring_forces(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.asarray(self.mesh.springs)
        k = jnp.asarray(self.mesh.stiffness)
        x0 = jnp.asarray(self.mesh.positions)
        rest = jnp.linalg.norm(jnp.take(x0, s[:, 1], 0) - jnp.take(x0, s[:, 0], 0), axis=-1)
        d = jnp.take(x, s[:, 1], 0) - jnp.take(x, s[:, 0], 0)
        length = jnp.linalg.norm(d, axis=-1)
        dn = d / jnp.maximum(length, 1e-12)[:, None]
        f = (k * (length - rest))[:, None] * dn  # force on endpoint 0 toward 1
        out = jnp.zeros_like(x)
        out = out.at[s[:, 0]].add(f).at[s[:, 1]].add(-f)
        return out

    def _system(self, x: jnp.ndarray) -> blockcsr.BlockEll:
        ell = cloth_model.update_ell_blocks(
            self._ell0,
            jnp.asarray(self.mesh.springs),
            jnp.asarray(self.mesh.stiffness),
            x,
            self.mesh.mass / self.mesh.dt**2,
            jnp.asarray(self._spring_of_slot),
        )
        # pinned vertices: decouple their rows/cols, keep an SPD mass diag
        p = self.pinned
    # zero blocks whose row or col touches a pinned vertex
        touches = p[:, None] | jnp.take(p, ell.idx)
        blocks = jnp.where(touches[:, :, None, None], 0.0, ell.blocks)
        big = (self.mesh.mass / self.mesh.dt**2) * jnp.eye(3, dtype=jnp.float32)
        diag = jnp.where(p[:, None, None], big, ell.diag)
        return ell._replace(blocks=blocks, diag=diag)

    def _detect(self, x: jnp.ndarray) -> Optional[Stencils]:
        if not self.collide:
            return None
        vf = collision_model.detect_vf(
            x, jnp.asarray(self.mesh.faces), self.collision_threshold,
            self.collision_stiffness, self.collision_budget,
        )
        return build_stencils(jnp.asarray(self.mesh.edges), jnp.asarray(self.mesh.faces), vf=vf)

    # -- stepping ----------------------------------------------------------

    def step(self) -> SimState:
        """Advance one frame. Host-level orchestration; inner solves jitted."""
        x, v = self.state.positions, self.state.velocities
        dt = self.mesh.dt
        m_dt2 = self.mesh.mass / dt**2

        self.pre.allocate(x)
        ell = self._system(x)
        stencils = self._detect(x)
        self.pre.prepare(ell, stencils)

        # Gauss-Newton rhs around current x with inertia target
        y = x + dt * v + dt * dt * self.gravity[None, :]
        rhs = m_dt2 * (y - x) + self._spring_forces(x)
        rhs = jnp.where(self.pinned[:, None], 0.0, rhs)

        res = pcg(
            lambda p_: blockcsr.spmv(ell, p_),
            self.pre.apply,
            rhs,
            tol=self.tol,
            max_iters=self.max_iters,
        )
        dx = jnp.where(self.pinned[:, None], 0.0, res.x)
        x_new = x + dx
        v_new = (x_new - x) / dt
        self.state = SimState(positions=x_new, velocities=v_new,
                              step_count=self.state.step_count + 1)
        self.last_solve = res
        return self.state
