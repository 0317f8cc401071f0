"""bench.py is the driver-recorded scoreboard — keep it importable and
runnable end-to-end (tiny CPU config) so scoreboard bitrot fails CI, not
the recorded round."""

import json
import os
import sys


def test_bench_main_smoke(capsys, monkeypatch):
    monkeypatch.setenv("BENCH_GRID", "16")
    monkeypatch.setenv("BENCH_ITERS", "2")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "pcg_iteration_nnz_throughput"
    assert rec["unit"] == "Gnnz/s"
    for key in ("vs_baseline", "vs_baseline_excl_prepare", "prepare_ms",
                "dispatch_ms", "iter_ms", "schwarz_iters", "jacobi_iters"):
        assert key in rec, key
    assert rec["value"] > 0
    assert rec["schwarz_iters"] < rec["jacobi_iters"]
