"""Packed symmetric 96x96 symv vs the dense einsum oracle.

The packed layout stores 4704 floats per block (the reference's exact
count, cpp:165) and must apply the identical operator: pack -> symv must
match apply_block_inverse on the dense matrix to f32 reassociation noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from precond_tpu.ops.batched_inverse import apply_block_inverse
from precond_tpu.ops.pallas.packed_symv import (
    pack_sym96,
    packed_symv,
    packed_symv_ref,
)


def _random_sym(b, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((b, 96, 96)).astype(np.float32)
    return jnp.asarray(0.5 * (a + np.swapaxes(a, 1, 2)))


@pytest.mark.parametrize("b", [1, 3, 256, 300])
def test_pack_roundtrip_via_ref(b):
    a = _random_sym(b)
    rhs = jnp.asarray(
        np.random.default_rng(1).standard_normal((b, 96)).astype(np.float32)
    )
    packed = pack_sym96(a, block_b=128)
    want = apply_block_inverse(a, rhs)
    got = packed_symv_ref(packed, rhs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("b,block_b", [(64, 64), (256, 128), (130, 128)])
def test_packed_symv_kernel_matches_dense(b, block_b):
    a = _random_sym(b, seed=2)
    rhs = jnp.asarray(
        np.random.default_rng(3).standard_normal((b, 96)).astype(np.float32)
    )
    packed = pack_sym96(a, block_b=block_b)
    want = apply_block_inverse(a, rhs)
    got = packed_symv(packed, rhs, block_b=block_b)  # interpret on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_packed_apply_is_exactly_symmetric():
    """<e_i, M e_j> == <e_j, M e_i> bit-exactly: each off-diagonal element
    is stored once and used in both orientations (the property that keeps
    CG valid)."""
    a = _random_sym(4, seed=5)
    packed = pack_sym96(a, block_b=128)
    ei = jnp.zeros((4, 96)).at[:, 7].set(1.0)
    ej = jnp.zeros((4, 96)).at[:, 63].set(1.0)
    mij = packed_symv(packed, ej, block_b=128)[:, 7]
    mji = packed_symv(packed, ei, block_b=128)[:, 63]
    np.testing.assert_array_equal(np.asarray(mij), np.asarray(mji))
