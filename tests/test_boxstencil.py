"""3-D box stencil SpMV vs the block-ELL oracle on tet lattices."""

import jax.numpy as jnp
import numpy as np
import pytest

from precond_tpu.models import tetmesh
from precond_tpu.ops import blockcsr, boxstencil


@pytest.mark.parametrize("dims", [(6, 5, 4), (8, 8, 4)])
def test_box_stencil_spmv_matches_ell(dims):
    mesh = tetmesh.make_box(*dims, mass=0.05, youngs=5e4)
    n = mesh.num_verts
    ell = tetmesh.assemble_system(mesh)
    sys = boxstencil.from_ell(ell, dims)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    y_ell = np.asarray(blockcsr.spmv(ell, x))
    y_st = np.asarray(boxstencil.spmv(sys, x))
    scale = np.abs(y_ell).max()
    np.testing.assert_allclose(y_st, y_ell, rtol=0, atol=2e-5 * scale)
    # completeness: total block mass carried by the planes equals the ELL's
    tot_planes = float(jnp.sum(jnp.abs(sys.dirs_t)))
    tot_ell = float(
        jnp.sum(jnp.abs(ell.blocks * ell.mask[:, :, None, None]))
    )
    np.testing.assert_allclose(tot_planes, tot_ell, rtol=1e-5)
