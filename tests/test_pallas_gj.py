"""Pallas Gauss-Jordan inverse vs numpy oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from precond_tpu.ops.pallas.gj_inverse import invert_spd_blocks_pallas


@pytest.mark.parametrize("b,group", [(16, 8), (5, 8)])
def test_gj_inverse_matches_numpy(b, group):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, 96, 96)).astype(np.float32)
    spd = np.einsum("bij,bkj->bik", q, q) + 96 * np.eye(96, dtype=np.float32)
    with pltpu.force_tpu_interpret_mode():
        inv = np.asarray(invert_spd_blocks_pallas(jnp.asarray(spd), group=group))
    ref = np.linalg.inv(spd.astype(np.float64))
    err = np.abs(inv - ref).max() / np.abs(ref).max()
    assert err < 1e-3, err
    # symmetric
    np.testing.assert_allclose(inv, np.swapaxes(inv, 1, 2), rtol=1e-6, atol=1e-8)
