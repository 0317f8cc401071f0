"""Fused Pallas stencil SpMV vs the XLA per-direction einsum form."""

import jax.numpy as jnp
import numpy as np
import pytest

from precond_tpu.models import cloth
from precond_tpu.ops import gridstencil
from precond_tpu.ops.pallas.stencil_spmv import spmv_system


@pytest.mark.parametrize("g", [32, 64])
def test_pallas_stencil_spmv_matches_xla(g):
    mesh = cloth.make_grid(g, g, z_wave=0.02, mass=0.001)
    sys_ = cloth.assemble_system_stencil(mesh)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((g * g, 3)).astype(np.float32))
    y_ref = gridstencil.spmv(sys_, x)
    y = spmv_system(sys_, x, tile=512, interpret=True)
    scale = float(jnp.abs(y_ref).max())
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=0, atol=5e-6 * scale
    )


def test_pallas_stencil_spmv_pinned(g=32):
    """Pinned systems (zeroed direction blocks at the boundary rows) ride
    the same masks."""
    mesh = cloth.make_grid(g, g, z_wave=0.0, mass=0.001)
    sys_ = cloth.assemble_system_stencil(mesh)
    pinned = jnp.zeros((g * g,), bool).at[jnp.arange(g)].set(True)
    sys_ = gridstencil.pin_vertices(sys_, pinned, 360.0)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((g * g, 3)).astype(np.float32))
    y_ref = gridstencil.spmv(sys_, x)
    y = spmv_system(sys_, x, tile=256, interpret=True)
    scale = float(jnp.abs(y_ref).max())
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=0, atol=5e-6 * scale
    )
