"""Observability: per-phase timing and solver metrics.

The reference has no tracing at all — only commented-out printfs
(cpp:1089,1593-1597) and dead file-dump blocks (cpp:1379-1391). Here every
solve can emit structured metrics (iterations, residual curve, per-phase
milliseconds, nnz/s) — these are exactly the BASELINE.md scoreboard rows.
jax.profiler traces can be layered on with `trace_dir`.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


@dataclass
class PhaseTimer:
    """Wall-clock per-phase accumulator (device-synchronized)."""

    phases: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, sync: object = None):
        if sync is not None:
            jax.block_until_ready(sync)
        t0 = time.perf_counter()
        out = {}
        try:
            yield out
        finally:
            if "sync" in out:
                jax.block_until_ready(out["sync"])
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def as_dict(self) -> Dict[str, float]:
        return {k: round(v * 1e3, 3) for k, v in self.phases.items()}

    def report(self) -> str:
        rows = [f"{k}: {v * 1e3:8.2f} ms (x{self.counts[k]})" for k, v in self.phases.items()]
        return "\n".join(rows)


@dataclass
class SolveMetrics:
    """Structured record of one preconditioned solve."""

    num_verts: int = 0
    nnz_blocks: int = 0
    iterations: int = 0
    rel_residual: float = 0.0
    phase_ms: Dict[str, float] = field(default_factory=dict)
    residual_curve: List[float] = field(default_factory=list)

    def nnz_per_second(self) -> Optional[float]:
        it_ms = self.phase_ms.get("iterate")
        if not it_ms or not self.iterations:
            return None
        return 9 * self.nnz_blocks * self.iterations / (it_ms / 1e3)

    def to_json(self) -> str:
        d = {
            "num_verts": self.num_verts,
            "nnz_blocks": self.nnz_blocks,
            "iterations": self.iterations,
            "rel_residual": self.rel_residual,
            "phase_ms": self.phase_ms,
        }
        nps = self.nnz_per_second()
        if nps is not None:
            d["nnz_per_s"] = nps
        if self.residual_curve:
            d["residual_curve"] = self.residual_curve
        return json.dumps(d)


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]):
    """Optional jax.profiler trace around a region (no-op when dir is None)."""
    if trace_dir is None:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
