"""bench.py is the driver-recorded scoreboard — keep it importable and
runnable end-to-end (tiny CPU config) so scoreboard bitrot fails CI, not
the recorded round."""

import json
import os
import sys


def test_bench_main_smoke(capsys, monkeypatch):
    # exercise the multi-config driver path: one general (unstructured,
    # runtime sort + hierarchy build) line and the headline cloth line last
    monkeypatch.setenv("BENCH_CONFIGS", "general:16,cloth:16")
    monkeypatch.delenv("BENCH_CONFIG", raising=False)
    monkeypatch.setenv("BENCH_ITERS", "2")
    monkeypatch.setenv("BENCH_SOLVE_REPS", "2")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    bench.main()
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    assert [r["config"] for r in lines] == ["general", "cloth"]
    for rec in lines:
        assert "error" not in rec, rec
        assert rec["metric"] == "pcg_iteration_nnz_throughput"
        assert rec["unit"] == "Gnnz/s"
        for key in ("vs_baseline", "vs_baseline_excl_prepare", "prepare_ms",
                    "dispatch_ms", "iter_ms", "schwarz_iters", "jacobi_iters",
                    "vs_baseline_min", "vs_baseline_median",
                    "vs_baseline_frames", "nnz_spmv", "nnz_apply"):
            assert key in rec, key
        assert rec["value"] > 0
        assert rec["nnz_spmv"] + rec["nnz_apply"] > 0
        assert rec["schwarz_iters"] < rec["jacobi_iters"]


def test_bench_single_config_env(capsys, monkeypatch):
    """BENCH_CONFIG + BENCH_GRID still runs exactly one config (round-3 CLI)."""
    monkeypatch.setenv("BENCH_CONFIG", "cloth")
    monkeypatch.setenv("BENCH_GRID", "16")
    monkeypatch.setenv("BENCH_ITERS", "2")
    monkeypatch.setenv("BENCH_SOLVE_REPS", "2")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    bench.main()
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    assert len(lines) == 1 and lines[0]["config"] == "cloth"
