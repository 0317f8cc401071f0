"""Observability plumbing: phase timers and structured solve metrics."""

import json
import time

import jax.numpy as jnp

from precond_tpu.profiling import PhaseTimer, SolveMetrics


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("b") as out:
        out["sync"] = jnp.ones((8,)) * 2  # device sync hook
    d = t.as_dict()
    assert d["a"] >= 15.0  # ms
    assert t.counts["a"] == 2
    assert "b" in d
    assert "a:" in t.report()


def test_solve_metrics_json():
    m = SolveMetrics(num_verts=100, nnz_blocks=700, iterations=12,
                     rel_residual=5e-5, phase_ms={"iterate": 6.0},
                     residual_curve=[1.0, 0.1, 0.01])
    j = json.loads(m.to_json())
    assert j["iterations"] == 12
    assert j["nnz_per_s"] == 9 * 700 * 12 / 6e-3
    assert len(j["residual_curve"]) == 3
