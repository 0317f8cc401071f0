"""Pallas batched symv vs jnp oracle (runs in interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from precond_tpu.ops.pallas import symv as psymv


@pytest.mark.parametrize("b,group", [(32, 16), (7, 16), (48, 8)])
def test_batched_symv_matches_einsum(b, group):
    rng = np.random.default_rng(0)
    inv = jnp.asarray(rng.standard_normal((b, 96, 96)).astype(np.float32))
    rhs = jnp.asarray(rng.standard_normal((b, 96)).astype(np.float32))
    ref = jnp.einsum("bij,bj->bi", inv, rhs)
    # interpret mode on CPU
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = psymv.batched_symv(inv, rhs, group=group)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
