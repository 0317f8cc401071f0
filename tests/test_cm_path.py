"""Component-major solve path: [3,N] carries end-to-end.

The comp-major path (spmv_t + grid_to_morton_cm + precondition_grid_cm +
pack_sym96_cm) is the 1M-scale iteration layout: no payload interleaves,
MXU-oriented crossings, reshape-sum transfers, batch-minor packed symv.
Each piece must match its row-major twin exactly (pure permutations) or
to accumulation tolerance (reordered f32 sums).
"""

import numpy as np
import jax
import jax.numpy as jnp

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth
from precond_tpu.ops import gridstencil
from precond_tpu.ops.gridapply import precondition_grid, precondition_grid_cm
from precond_tpu.ops.pallas.packed_symv import pack_sym96, pack_sym96_cm
from precond_tpu.solver import prepare_grid
from precond_tpu.utils import gridmorton as gm

K = 6
GRID = 1 << K


def _system():
    mesh = cloth.make_grid(GRID, GRID, z_wave=0.02, mass=0.001, dt=1.0 / 60.0)
    ssys = cloth.assemble_system_stencil(mesh)
    return mesh, ssys


def test_spmv_t_matches_spmv():
    mesh, ssys = _system()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((mesh.num_verts, 3)).astype(np.float32))
    y_rows = gridstencil.spmv(ssys, x)
    y_cm = gridstencil.spmv_t(ssys, jnp.transpose(x))
    assert (np.asarray(y_rows) == np.asarray(y_cm).T).all()


def test_cm_crossing_bit_identical():
    rng = np.random.default_rng(1)
    n = 4**K
    x = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    xt = jnp.transpose(x)
    a = gm.grid_to_morton_cm(xt, K)
    assert (np.asarray(a) == np.asarray(gm.grid_to_morton(x, K)).T).all()
    back = gm.morton_to_grid_cm(a, K)
    assert (np.asarray(back) == np.asarray(xt)).all()


def test_precondition_grid_cm_matches_row_major():
    mesh, _ = _system()
    dgr, drr, goffsets = cloth.assemble_system_grid(mesh)
    s2o, o2s = gm.sort_maps(K)
    cfg_d = SchwarzConfig(symv_kernel="dense", solve_layout="rows")
    inv96 = jax.jit(
        lambda dg, dr, o: prepare_grid(dg, dr, goffsets, K, cfg_d, None, o)
    )(dgr, drr, jnp.asarray(o2s)).astype(jnp.float32)
    cfgp = SchwarzConfig(symv_kernel="packed", packed_symv_block_b=128)
    packed = pack_sym96(inv96, block_b=128)
    packed_cm = pack_sym96_cm(inv96, block_b=128)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((mesh.num_verts, 3)).astype(np.float32))
    z_ref = precondition_grid(packed, gm.grid_to_morton(x, K), cfgp)
    z_cm = precondition_grid_cm(
        packed_cm, gm.grid_to_morton_cm(jnp.transpose(x), K), cfgp
    )
    ref = np.asarray(z_ref)
    got = np.asarray(z_cm).T
    assert np.abs(got - ref).max() <= 1e-5 * np.abs(ref).max()


def test_cm_pcg_converges_identically():
    """A full comp-major PCG solve reaches the same tolerance in the same
    iteration count (up to f32 dot-order wiggle) as the row-major loop."""
    from precond_tpu.parallel.pcg import pcg

    mesh, ssys = _system()
    dgr, drr, goffsets = cloth.assemble_system_grid(mesh)
    s2o, o2s = gm.sort_maps(K)
    cfg_d = SchwarzConfig(symv_kernel="dense", solve_layout="rows")
    inv96 = jax.jit(
        lambda dg, dr, o: prepare_grid(dg, dr, goffsets, K, cfg_d, None, o)
    )(dgr, drr, jnp.asarray(o2s)).astype(jnp.float32)
    cfgp = SchwarzConfig(symv_kernel="packed", packed_symv_block_b=128)
    packed = pack_sym96(inv96, block_b=128)
    packed_cm = pack_sym96_cm(inv96, block_b=128)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal((mesh.num_verts, 3)).astype(np.float32))

    res_rows = pcg(
        lambda p: gridstencil.spmv(ssys, p),
        lambda r: gm.morton_to_grid(
            precondition_grid(packed, gm.grid_to_morton(r, K), cfgp), K
        ),
        b, tol=1e-4, max_iters=400,
    )
    res_cm = pcg(
        lambda p: gridstencil.spmv_t(ssys, p),
        lambda r: gm.morton_to_grid_cm(
            precondition_grid_cm(packed_cm, gm.grid_to_morton_cm(r, K), cfgp), K
        ),
        jnp.transpose(b), tol=1e-4, max_iters=400,
    )
    assert float(res_rows.rel_residual) < 1e-4
    assert float(res_cm.rel_residual) < 1e-4
    assert abs(int(res_cm.iterations) - int(res_rows.iterations)) <= 2


def test_clothsim_cm_matches_rows():
    """Full simulator steps agree between the comp-major and row-major
    solve layouts (forced via config at a CPU-testable size)."""
    from precond_tpu.models.simulator import ClothSim

    mesh = cloth.make_grid(
        GRID, GRID, mass=0.05, dt=1.0 / 60.0, k_struct=3e3, k_shear=3e3, k_bend=30.0
    )
    pinned = np.arange(GRID)
    out = {}
    for name, layout in (("cm", "cm"), ("rows", "rows")):
        cfg = SchwarzConfig(
            symv_kernel="packed", solve_layout=layout, packed_symv_block_b=128
        )
        sim = ClothSim(mesh, cfg, pinned=pinned)
        for _ in range(2):
            st = sim.step()
            assert float(sim.last_solve.rel_residual) <= 1e-4
        out[name] = np.asarray(sim.state.positions)
    assert np.abs(out["cm"] - out["rows"]).max() < 1e-5


def test_dense_cm_apply_matches():
    """Below the packed threshold the forced-cm layout uses the dense
    comp-plane einsum (DenseInverseCM): must match the row-major dense
    apply to accumulation tolerance."""
    from precond_tpu.ops.pallas.packed_symv import dense_cm

    mesh, _ = _system()
    dgr, drr, goffsets = cloth.assemble_system_grid(mesh)
    cfg_d = SchwarzConfig(symv_kernel="dense", solve_layout="rows")
    inv96 = jax.jit(
        lambda dg, dr, o: prepare_grid(dg, dr, goffsets, K, cfg_d, None, o)
    )(dgr, drr, None).astype(jnp.float32)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((mesh.num_verts, 3)).astype(np.float32))
    z_ref = precondition_grid(inv96, gm.grid_to_morton(x, K), cfg_d)
    z_cm = precondition_grid_cm(
        dense_cm(inv96), gm.grid_to_morton_cm(jnp.transpose(x), K), cfg_d
    )
    ref, got = np.asarray(z_ref), np.asarray(z_cm).T
    assert np.abs(got - ref).max() <= 1e-4 * np.abs(ref).max()


def test_clothsim_cm_dense_matches_rows():
    """Forced cm layout with the dense symv (the 65k configuration)."""
    from precond_tpu.models.simulator import ClothSim

    mesh = cloth.make_grid(
        GRID, GRID, mass=0.05, dt=1.0 / 60.0, k_struct=3e3, k_shear=3e3, k_bend=30.0
    )
    pinned = np.arange(GRID)
    out = {}
    for layout in ("cm", "rows"):
        cfg = SchwarzConfig(symv_kernel="dense", solve_layout=layout)
        sim = ClothSim(mesh, cfg, pinned=pinned)
        for _ in range(2):
            st = sim.step()
            assert float(sim.last_solve.rel_residual) <= 1e-4
        out[layout] = np.asarray(sim.state.positions)
    assert np.abs(out["cm"] - out["rows"]).max() < 1e-5
