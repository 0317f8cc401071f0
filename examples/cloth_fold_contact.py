"""Self-colliding folded sheet: contact detection, fill-in and penalty
forces resolving a proximity violation.

A 2^k x 2^k cloth is folded onto itself half a grid-spacing apart (under
the detection threshold). Each frame the simulator detects VF/EE/EF sets
through the hash-grid broad phase, injects contact Hessians into H and M,
adds gap-aware penalty forces to the rhs, and solves with the multilevel
Schwarz PCG on the static grid fast path. The fold gap must OPEN toward
the rest separation while the solve stays converged.

    JAX_PLATFORMS=cpu python examples/cloth_fold_contact.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth
from precond_tpu.models.simulator import ClothSim

GRID = int(os.environ.get("GRID", "32"))
FRAMES = int(os.environ.get("FRAMES", "12"))

mesh = cloth.make_grid(GRID, GRID, z_wave=0.0, mass=0.002, dt=1.0 / 60.0,
                       k_struct=2e3, k_shear=2e3, k_bend=20.0)
n = mesh.num_verts
h = 1.0 / (GRID - 1)

# fold the right half over the left, 0.5 spacings above
p = np.asarray(mesh.positions).copy()
fold = p[:, 0] > 0.5
p[:, 2] = np.where(fold, 0.5 * h, 0.0)
p[:, 0] = np.where(fold, 1.0 - p[:, 0], p[:, 0]).astype(np.float32)

# pin the crease column of both layers so the fold can't just fly apart
crease = np.flatnonzero(np.abs(p[:, 0] - 0.5) < 0.25 * h)
sim = ClothSim(
    mesh, SchwarzConfig(), gravity=(0.0, 0.0, 0.0), pinned=crease,
    collision_stiffness=2e3, collision_threshold=0.75 * h,
    collision_budget=max(n // 2, 256), collision_cell_cap=32,
)
sim.state = sim.state._replace(positions=jnp.asarray(p.astype(np.float32)))

frames = []
for f in range(FRAMES):
    t0 = time.perf_counter()
    st = sim.step()
    wall = (time.perf_counter() - t0) * 1e3
    pos = np.asarray(st.positions)
    gap = pos[fold, 2].mean() - pos[~fold, 2].mean()
    print(f"frame {f:3d}: pcg_iters={int(sim.last_solve.iterations):4d} "
          f"rel_res={float(sim.last_solve.rel_residual):.2e} "
          f"gap={gap / h:5.3f} h  wall={wall:7.1f} ms", flush=True)
    frames.append(pos)

out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "out_cloth_fold.npz")
np.savez_compressed(out, positions=np.stack(frames), faces=mesh.faces)
print("wrote", out)
