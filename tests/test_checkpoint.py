"""Checkpoint round-trip: restored solver produces identical applies."""

import os

import jax.numpy as jnp
import numpy as np

from precond_tpu.config import SchwarzConfig
from precond_tpu.io import checkpoint
from precond_tpu.models import cloth
from precond_tpu.solver import SchwarzPreconditioner


def test_save_load_roundtrip(tmp_path):
    mesh = cloth.make_grid(10, 10, z_wave=0.02)
    ell = cloth.assemble_system(mesh)
    pre = SchwarzPreconditioner(SchwarzConfig())
    pre.allocate(mesh.positions)
    pre.prepare(ell)
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((mesh.num_verts, 3)).astype(np.float32))
    z_before = np.asarray(pre.apply(r))
    x = jnp.asarray(rng.standard_normal((mesh.num_verts, 3)).astype(np.float32))

    path = os.path.join(tmp_path, "ckpt.npz")
    checkpoint.save_solver(path, pre, x=x)

    pre2 = SchwarzPreconditioner(SchwarzConfig())
    x2 = checkpoint.load_solver(path, pre2)
    assert pre2.frame_index == pre.frame_index
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))
    z_after = np.asarray(pre2.apply(r))
    np.testing.assert_array_equal(z_after, z_before)  # bit-identical
    # restored solver can continue the allocate/prepare cadence
    pre2.allocate(mesh.positions)
    pre2.prepare(ell)
    assert np.all(np.isfinite(np.asarray(pre2.apply(r))))


def test_bf16_roundtrip_and_fingerprint(tmp_path):
    import pytest

    cfg = SchwarzConfig(inverse_dtype="bfloat16")
    mesh = cloth.make_grid(10, 10, z_wave=0.02)
    ell = cloth.assemble_system(mesh)
    pre = SchwarzPreconditioner(cfg)
    pre.allocate(mesh.positions)
    pre.prepare(ell)
    assert pre.state.inv96.dtype == jnp.bfloat16
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal((mesh.num_verts, 3)).astype(np.float32))
    z_before = np.asarray(pre.apply(r))

    path = os.path.join(tmp_path, "ckpt_bf16.npz")
    checkpoint.save_solver(path, pre)

    pre2 = SchwarzPreconditioner(cfg)
    checkpoint.load_solver(path, pre2)
    assert pre2.state.inv96.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(pre2.apply(r)), z_before)

    # a solver with a different config must refuse the checkpoint
    pre3 = SchwarzPreconditioner(SchwarzConfig())
    with pytest.raises(ValueError, match="config mismatch"):
        checkpoint.load_solver(path, pre3)

    # a solver prepared on a different mesh size must refuse it too
    pre4 = SchwarzPreconditioner(cfg)
    pre4.allocate(cloth.make_grid(6, 6).positions)
    with pytest.raises(ValueError, match="mesh mismatch"):
        checkpoint.load_solver(path, pre4)
