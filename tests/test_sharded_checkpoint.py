"""Orbax-backed sharded checkpoint round-trip on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth
from precond_tpu.io import sharded as shio
from precond_tpu.solver import SchwarzPreconditioner

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _solver(n=16):
    mesh_c = cloth.make_grid(n, n, z_wave=0.02)
    ell = cloth.assemble_system(mesh_c)
    pre = SchwarzPreconditioner(SchwarzConfig())
    pre.allocate(mesh_c.positions)
    pre.prepare(ell)
    return pre


def test_solver_roundtrip_and_fingerprint(tmp_path):
    pre = _solver()
    x = jnp.ones((pre.maps.sorted_to_orig.shape[0], 3), jnp.float32)
    path = str(tmp_path / "ckpt")
    shio.save_solver_sharded(path, pre, x=x)

    pre2 = SchwarzPreconditioner(SchwarzConfig())
    pre2.allocate(jnp.zeros((pre.maps.sorted_to_orig.shape[0], 3)))
    x2 = shio.load_solver_sharded(path, pre2)
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(pre2.state.inv96), np.asarray(pre.state.inv96)
    )
    np.testing.assert_array_equal(
        np.asarray(pre2.maps.sorted_to_orig), np.asarray(pre.maps.sorted_to_orig)
    )

    # config mismatch must refuse
    pre3 = SchwarzPreconditioner(SchwarzConfig(max_applied_levels=2))
    pre3.allocate(jnp.zeros((pre.maps.sorted_to_orig.shape[0], 3)))
    with pytest.raises(ValueError, match="config mismatch"):
        shio.load_solver_sharded(path, pre3)


def test_sharded_restore_preserves_sharding(tmp_path):
    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    sh = NamedSharding(mesh, P("x"))
    a = jax.device_put(jnp.arange(8 * 32 * 3, dtype=jnp.float32).reshape(8 * 32, 3), sh)
    path = str(tmp_path / "tree")
    shio.save_tree(path, {"a": a})
    template = {"a": jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh)}
    out = shio.load_tree(path, template)
    assert out["a"].sharding == sh
    np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(a))
