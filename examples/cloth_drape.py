"""Demo: pinned cloth draping under gravity with self-collision penalties.

Run:  python examples/cloth_drape.py [grid] [steps]
Prints per-frame solve stats and writes the final mesh to
examples/out_cloth.npz (positions + faces — load with numpy/any viewer).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    # honor JAX_PLATFORMS even when a platform plugin (axon) outranks it
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from precond_tpu.config import SchwarzConfig
    from precond_tpu.models import cloth
    from precond_tpu.models.simulator import ClothSim

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    mesh = cloth.make_grid(grid, grid, mass=0.02, dt=1.0 / 60.0,
                           k_struct=5e3, k_shear=5e3, k_bend=50.0)
    pinned = np.asarray([0 * grid + j for j in range(grid)])  # top row
    sim = ClothSim(
        mesh, SchwarzConfig(), pinned=pinned,
        collision_stiffness=2e3, collision_threshold=0.01, collision_budget=256,
    )

    for i in range(steps):
        t0 = time.perf_counter()
        st = sim.step()
        dt_ms = (time.perf_counter() - t0) * 1e3
        print(
            f"frame {i:3d}: pcg_iters={int(sim.last_solve.iterations):4d} "
            f"rel_res={float(sim.last_solve.rel_residual):.2e} "
            f"wall={dt_ms:7.1f} ms "
            f"z_mean={float(jnp.mean(st.positions[:, 2])):+.4f}"
        )

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out_cloth.npz")
    np.savez(out, positions=np.asarray(sim.state.positions), faces=mesh.faces)
    print("wrote", out)


if __name__ == "__main__":
    main()
