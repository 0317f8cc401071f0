"""Multi-host helpers on the virtual 8-device mesh (single process)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from precond_tpu.parallel import hosts

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def test_initialize_noop_single_process():
    hosts.initialize_hosts(num_processes=1)  # must not raise


def test_global_mesh_and_row_slabs():
    mesh = hosts.global_mesh()
    assert mesh.shape["x"] == len(jax.devices())
    rows = np.arange(8 * 32 * 3, dtype=np.float32).reshape(8 * 32, 3)
    arr = hosts.shard_rows_across_hosts(mesh, rows)
    assert arr.shape == rows.shape
    np.testing.assert_array_equal(np.asarray(arr), rows)
    # row-sharded: each device holds a contiguous 32-row slab
    shard_shapes = {s.data.shape for s in arr.addressable_shards}
    assert shard_shapes == {(32, 3)}
