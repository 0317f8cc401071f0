"""Unit tests for the panel-32 blocked LDL^T inverse (ops/batched_inverse).

The balanced-chunk branch (b > chunk_threshold: non-power-of-two chunk
sizes, identity padding, reshape/slice recombination) was previously only
exercised by large TPU benchmarks (ADVICE r2, batched_inverse.py:145);
chunk_threshold is parameterizable so the branch runs at CPU-test sizes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from precond_tpu.ops.batched_inverse import (
    invert_spd_blocks,
    invert_spd_blocks_panel,
)


def _random_spd(b, n=96, seed=0, cond_boost=0.0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((b, n, n)).astype(np.float32)
    spd = a @ np.swapaxes(a, 1, 2) + n * np.eye(n, dtype=np.float32)
    if cond_boost:
        # crank some diagonal entries to widen the spectrum
        idx = rng.integers(0, n, size=n // 4)
        spd[:, idx, idx] += cond_boost
    return spd


@pytest.mark.parametrize("b,threshold", [(37, 16), (18, 16), (16, 16)])
def test_panel_inverse_chunked_matches_unchunked(b, threshold):
    spd = _random_spd(b, seed=3)
    ref = np.asarray(invert_spd_blocks_panel(jnp.asarray(spd)))
    chunked = np.asarray(
        invert_spd_blocks_panel(jnp.asarray(spd), chunk_threshold=threshold)
    )
    # b=16 stays on the unchunked path (b == threshold); the others chunk.
    np.testing.assert_allclose(chunked, ref, rtol=2e-5, atol=2e-5)


def test_panel_inverse_chunked_matches_cholesky_oracle():
    b, threshold = 21, 8  # 3 chunks of 8 with 3 identity-padded blocks
    spd = _random_spd(b, seed=7, cond_boost=500.0)
    oracle = np.asarray(invert_spd_blocks(jnp.asarray(spd)))
    chunked = np.asarray(
        invert_spd_blocks_panel(jnp.asarray(spd), chunk_threshold=threshold)
    )
    err = np.abs(chunked - oracle).max() / np.abs(oracle).max()
    assert err < 1e-4
    # exact symmetry by construction (Gram form)
    np.testing.assert_array_equal(chunked, np.swapaxes(chunked, 1, 2))


def test_nonfinite_block_repair():
    """A non-finite block in the factorization output is replaced by the
    identity (defense against the fused-program miscompile observed at 1M
    on v5e) instead of poisoning the whole preconditioner."""
    from precond_tpu.ops.batched_inverse import _repair_nonfinite

    rng = np.random.default_rng(0)
    inv = jnp.asarray(rng.standard_normal((5, 96, 96)).astype(np.float32))
    bad = inv.at[2, 10, 3].set(jnp.nan).at[4, 0, 0].set(jnp.inf)
    out = np.asarray(_repair_nonfinite(bad))
    np.testing.assert_array_equal(out[[0, 1, 3]], np.asarray(inv)[[0, 1, 3]])
    np.testing.assert_array_equal(out[2], np.eye(96, dtype=np.float32))
    np.testing.assert_array_equal(out[4], np.eye(96, dtype=np.float32))
