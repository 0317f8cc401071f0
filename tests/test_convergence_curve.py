"""Convergence-curve artifact: monotone-ish decay, Schwarz curve dominates
Jacobi, matches the while-loop solver's final state."""

import jax.numpy as jnp
import numpy as np

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth, collision
from precond_tpu.ops import blockcsr
from precond_tpu.parallel.pcg import jacobi_preconditioner, pcg, pcg_with_history
from precond_tpu.solver import SchwarzPreconditioner


def test_history_matches_solver_and_beats_jacobi():
    mesh = cloth.make_grid(20, 20, z_wave=0.02, mass=0.01)
    ell = cloth.assemble_system(mesh)
    pre = SchwarzPreconditioner(SchwarzConfig())
    pre.allocate(mesh.positions)
    pre.prepare(ell)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((mesh.num_verts, 3)).astype(np.float32))
    spmv = lambda v: blockcsr.spmv(ell, v)

    x, curve = pcg_with_history(spmv, pre.apply, b, num_iters=60)
    curve = np.asarray(curve)
    res = pcg(spmv, pre.apply, b, tol=1e-4, max_iters=200)
    it = int(res.iterations)
    # curve crosses tol at the same iteration count the solver reports (+-1)
    crossed = int(np.argmax(curve <= 1e-4)) + 1
    assert abs(crossed - it) <= 1, (crossed, it)
    # overall decay by >= 3 orders of magnitude within 60 iterations
    assert curve[-1] < 1e-4

    _, jcurve = pcg_with_history(spmv, jacobi_preconditioner(ell.diag), b, num_iters=60)
    jcurve = np.asarray(jcurve)
    # Schwarz residual is below Jacobi's at every recorded iteration tail
    assert np.all(curve[5:] <= jcurve[5:])


def test_detect_ef():
    mesh = cloth.make_grid(4, 4)
    # a free-floating extra edge crossing just above face 0's plane
    pos = np.concatenate([mesh.positions, [[0.1, 0.05, 0.008], [0.25, 0.3, 0.008]]]).astype(np.float32)
    edges = np.concatenate([mesh.edges, [[16, 17, -1, -1]]]).astype(np.int32)
    ef = collision.detect_ef(jnp.asarray(pos), jnp.asarray(edges), jnp.asarray(mesh.faces),
                             0.02, 100.0, 8)
    eid = np.asarray(ef.e_id)
    assert (eid == len(edges) - 1).any()
