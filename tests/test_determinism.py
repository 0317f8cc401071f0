"""Bit-reproducibility: same input -> same bits, twice over.

The reference cannot pass this (nondeterministic atomic stencil append,
cpp:407, and thread-order-dependent float accumulation); the functional
rewrite makes it a testable invariant (SURVEY.md §5 race-detection row).
"""

import jax.numpy as jnp
import numpy as np

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth
from precond_tpu.ops import stencils as st
from precond_tpu.solver import SchwarzPreconditioner
from precond_tpu.utils.guards import assert_healthy, validate_apply_state


def _build():
    mesh = cloth.make_grid(16, 16, z_wave=0.02)
    ell = cloth.assemble_system(mesh)
    edges, faces = jnp.asarray(mesh.edges), jnp.asarray(mesh.faces)
    vf = st.VfSets(
        v_id=jnp.asarray([200, 14], jnp.int32),
        f_id=jnp.asarray([3, 100], jnp.int32),
        stiff=jnp.asarray([100.0, 90.0], jnp.float32),
        bary=jnp.asarray([[0.2, 0.3], [0.1, 0.5]], jnp.float32),
        normal=jnp.asarray([[0, 0, 1], [1, 0, 0]], jnp.float32),
    )
    sten = st.build_stencils(edges, faces, vf=vf)
    pre = SchwarzPreconditioner(SchwarzConfig())
    pre.allocate(mesh.positions)
    pre.prepare(ell, sten)
    return mesh, pre


def test_prepare_and_apply_bit_reproducible():
    mesh, pre1 = _build()
    _, pre2 = _build()
    for f in ("inv96", "going_next", "ancestors"):
        np.testing.assert_array_equal(
            np.asarray(getattr(pre1.state, f)), np.asarray(getattr(pre2.state, f))
        )
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((mesh.num_verts, 3)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(pre1.apply(r)), np.asarray(pre2.apply(r)))


def test_guards_pass_on_healthy_state():
    _, pre = _build()
    assert_healthy(pre.state)


def test_guards_catch_nan():
    _, pre = _build()
    bad = pre.state._replace(inv96=pre.state.inv96.at[0, 0, 0].set(jnp.nan))
    problems = validate_apply_state(bad)
    assert any("non-finite" in p for p in problems)


def test_prepare_debug_checks_fire_on_poisoned_system():
    """The production path itself runs the guards when cfg.debug_checks is
    set: a poisoned input system (NaN diagonal block) must abort prepare()
    instead of silently factorizing garbage."""
    import pytest

    mesh = cloth.make_grid(16, 16, z_wave=0.02)
    ell = cloth.assemble_system(mesh)
    bad = ell._replace(diag=ell.diag.at[7, 0, 0].set(jnp.nan))
    pre = SchwarzPreconditioner(SchwarzConfig(debug_checks=True))
    pre.allocate(mesh.positions)
    # a real exception, not `assert` — the guards survive python -O
    # (advisor r4)
    with pytest.raises(ValueError, match="non-finite"):
        pre.prepare(bad)
    # and the same config passes cleanly on the healthy system
    pre.prepare(ell)
