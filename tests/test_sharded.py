"""Distributed tests without a cluster (SURVEY.md §4.5): the 8-fake-device
sharded solve must match the single-device result to tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth
from precond_tpu.parallel.sharded import shard_system, sharded_solve_step, solve_step
from precond_tpu.solver import compute_sort_maps

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _problem(nx, ny):
    mesh = cloth.make_grid(nx, ny, z_wave=0.02, mass=0.01)
    ell = cloth.assemble_system(mesh)
    maps = compute_sort_maps(jnp.asarray(mesh.positions))
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((mesh.num_verts, 3)).astype(np.float32))
    return ell, maps, b


def test_sharded_matches_single_device():
    cfg = SchwarzConfig()
    ell, maps, b = _problem(32, 32)  # 1024 verts = 8 x 128 rows, bank aligned

    single = jax.jit(lambda e, m, bb: solve_step(e, m, bb, cfg, max_iters=100))
    res1 = single(ell, maps, b)

    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    step = sharded_solve_step(mesh, cfg, max_iters=100)
    with mesh:
        res8 = step(shard_system(mesh, ell), maps, b)

    # FP reduction order differs across shardings, so iteration counts may
    # drift by a step or two near the tolerance; solutions must agree.
    assert abs(int(res1.iterations) - int(res8.iterations)) <= 3
    scale = np.abs(np.asarray(res1.x)).max()
    np.testing.assert_allclose(np.asarray(res8.x), np.asarray(res1.x), rtol=5e-3, atol=5e-4 * scale)
    assert float(res8.rel_residual) <= 1e-4


def test_sharded_ragged_vertex_count():
    # N = 24*24 = 576 rows: not divisible by 8*32; GSPMD must still shard.
    cfg = SchwarzConfig()
    ell, maps, b = _problem(24, 24)
    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    step = sharded_solve_step(mesh, cfg, max_iters=100)
    with mesh:
        res8 = step(shard_system(mesh, ell), maps, b)
    single = jax.jit(lambda e, m, bb: solve_step(e, m, bb, cfg, max_iters=100))
    res1 = single(ell, maps, b)
    scale = np.abs(np.asarray(res1.x)).max()
    np.testing.assert_allclose(np.asarray(res8.x), np.asarray(res1.x), rtol=5e-3, atol=5e-4 * scale)
