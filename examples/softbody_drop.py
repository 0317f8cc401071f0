"""Deformable tet box pinned at the top face, settling under gravity.

Runs the structured-box fast path when the box dims are powers of two
(analytic 3-D tile ordering, arithmetic hierarchy, gather-free stencil
SpMV): python examples/softbody_drop.py  (JAX_PLATFORMS=cpu for speed).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# honor JAX_PLATFORMS even when a platform plugin (axon) outranks it
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import tetmesh
from precond_tpu.models.simulator import SoftBodySim

DIMS = tuple(int(v) for v in os.environ.get("BOX_DIMS", "8,8,8").split(","))
FRAMES = int(os.environ.get("FRAMES", "24"))
# MATERIAL=corotational reassembles the warped-stiffness (ARAP-flavored)
# Hessian every step — rotation-safe large deformation
MATERIAL = os.environ.get("MATERIAL", "linear")

mesh = tetmesh.make_box(*DIMS, mass=0.05, youngs=5e4)
nx, ny, nz = DIMS
top = np.flatnonzero(np.arange(mesh.num_verts) % nz == nz - 1)
sim = SoftBodySim(mesh, SchwarzConfig(), pinned=top, max_iters=400,
                  material=MATERIAL)
print(f"box {DIMS} = {mesh.num_verts} verts, {len(mesh.tets)} tets, "
      f"material: {MATERIAL}, fast path: {sim._box is not None}")

frames = []
for f in range(FRAMES):
    t0 = time.perf_counter()
    state = sim.step()
    wall = (time.perf_counter() - t0) * 1e3
    z = float(np.asarray(state.positions)[:, 2].mean())
    print(f"frame {f:3d}: pcg_iters={int(sim.last_solve.iterations):4d} "
          f"rel_res={float(sim.last_solve.rel_residual):.2e} "
          f"wall={wall:7.1f} ms z_mean={z:.4f}", flush=True)
    frames.append(np.asarray(state.positions))

out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out_softbody.npz")
np.savez_compressed(out, positions=np.stack(frames), tets=mesh.tets)
print("wrote", out)
