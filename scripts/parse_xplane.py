"""Aggregate an XLA op trace (jax.profiler xplane.pb) into a top-ops table.

Usage: python scripts/parse_xplane.py <trace.xplane.pb> [--reps N] [--top K]

Groups the 'XLA Ops' line of the TPU device plane by op name (fusion names
collapse to their root), prints total/per-rep durations. --reps divides by
the number of identical repetitions the traced program ran (chained-loop
harnesses), so numbers read as per-op-instance costs.
"""

import argparse
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def load(path):
    sp = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        sp.ParseFromString(f.read())
    return sp


def device_plane(sp):
    for pl in sp.planes:
        if "/device:TPU" in pl.name or pl.name.startswith("/device:"):
            if any(l.name == "XLA Ops" for l in pl.lines):
                return pl
    raise SystemExit("no device plane with an 'XLA Ops' line found")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--raw", action="store_true", help="no name collapsing")
    args = ap.parse_args()

    sp = load(args.trace)
    pl = device_plane(sp)
    ev_names = pl.event_metadata

    tot = defaultdict(float)
    cnt = defaultdict(int)
    grand = 0.0
    for line in pl.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = ev_names[ev.metadata_id].name
            dur = ev.duration_ps / 1e9  # ms
            grand += dur
            if not args.raw:
                # collapse e.g. fusion.123 -> fusion, dynamic-update-slice.5 ->
                # dynamic-update-slice, but keep named scopes if present
                name = re.sub(r"\.\d+$", "", name)
            tot[name] += dur
            cnt[name] += 1

    print(f"total device op time: {grand:.3f} ms "
          f"({grand / args.reps:.3f} ms/rep over {args.reps} reps)")
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[: args.top]
    print(f"{'op':60s} {'count':>7s} {'total ms':>10s} {'ms/rep':>9s} {'%':>6s}")
    for name, ms in rows:
        print(f"{name[:60]:60s} {cnt[name]:7d} {ms:10.3f} "
              f"{ms / args.reps:9.4f} {100 * ms / grand:5.1f}%")


if __name__ == "__main__":
    main()
