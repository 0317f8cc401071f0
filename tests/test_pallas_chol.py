"""Pallas LDL^T-inverse kernel vs numpy oracle (interpret mode on CPU).

The "onehot" row-extraction path is the interpret-compilable twin of the
"ds" path used on hardware; both run the identical elimination/Gram math.
Hardware validation of the ds path happens in bench runs (same outputs
checked against the XLA inverse there).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from precond_tpu.ops.pallas.chol_inverse import invert_spd_blocks_chol


@pytest.mark.parametrize("b,group", [(16, 8), (5, 8)])
def test_chol_inverse_matches_numpy(b, group):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, 96, 96)).astype(np.float32)
    spd = np.einsum("bij,bkj->bik", q, q) + 96 * np.eye(96, dtype=np.float32)
    with pltpu.force_tpu_interpret_mode():
        inv = np.asarray(invert_spd_blocks_chol(jnp.asarray(spd), group=group, extract="onehot"))
    ref = np.linalg.inv(spd.astype(np.float64))
    err = np.abs(inv - ref).max() / np.abs(ref).max()
    assert err < 1e-5, err
    np.testing.assert_array_equal(inv, np.swapaxes(inv, 1, 2))  # exactly symmetric


def test_chol_inverse_stiff_psd():
    """cond ~1e7 (the stiff-cloth regime that broke the GJ kernel): the
    Gram-form inverse must stay accurate and strictly PSD."""
    rng = np.random.default_rng(1)
    b = 4
    d = np.exp(rng.uniform(0, 16, size=(b, 96))).astype(np.float32)
    q, _ = np.linalg.qr(rng.standard_normal((b, 96, 96)))
    spd = np.einsum("bik,bk,bjk->bij", q, d, q).astype(np.float32)
    spd = 0.5 * (spd + np.swapaxes(spd, 1, 2))
    with pltpu.force_tpu_interpret_mode():
        inv = np.asarray(invert_spd_blocks_chol(jnp.asarray(spd), group=4, extract="onehot"))
    ref = np.linalg.inv(spd.astype(np.float64))
    relerr = np.abs(inv - ref).max() / np.abs(ref).max()
    # cond*eps ~ 1e0 in f32; the incumbent XLA cholesky+trsm path measures
    # 2.1e-2 on this same batch, the Gram-form kernel 1.3e-2.
    assert relerr < 3e-2, relerr
    ev = np.linalg.eigvalsh(inv.astype(np.float64))
    assert ev.min() > 0, ev.min()


from precond_tpu.ops.pallas.chol_inverse import invert_spd_blocks_chol_panel


@pytest.mark.parametrize("b,group", [(16, 8), (5, 8)])
def test_panel_inverse_matches_numpy(b, group):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, 96, 96)).astype(np.float32)
    spd = np.einsum("bij,bkj->bik", q, q) + 96 * np.eye(96, dtype=np.float32)
    with pltpu.force_tpu_interpret_mode():
        inv = np.asarray(invert_spd_blocks_chol_panel(jnp.asarray(spd), group=group))
    ref = np.linalg.inv(spd.astype(np.float64))
    err = np.abs(inv - ref).max() / np.abs(ref).max()
    assert err < 1e-5, err
    np.testing.assert_array_equal(inv, np.swapaxes(inv, 1, 2))  # exactly symmetric


def test_panel_inverse_stiff_psd():
    rng = np.random.default_rng(1)
    b = 4
    d = np.exp(rng.uniform(0, 16, size=(b, 96))).astype(np.float32)
    q, _ = np.linalg.qr(rng.standard_normal((b, 96, 96)))
    spd = np.einsum("bik,bk,bjk->bij", q, d, q).astype(np.float32)
    spd = 0.5 * (spd + np.swapaxes(spd, 1, 2))
    with pltpu.force_tpu_interpret_mode():
        inv = np.asarray(invert_spd_blocks_chol_panel(jnp.asarray(spd), group=4))
    ref = np.linalg.inv(spd.astype(np.float64))
    relerr = np.abs(inv - ref).max() / np.abs(ref).max()
    assert relerr < 3e-2, relerr
    ev = np.linalg.eigvalsh(inv.astype(np.float64))
    assert ev.min() > 0, ev.min()
