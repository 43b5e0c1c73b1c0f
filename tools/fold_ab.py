#!/usr/bin/env python
"""Same-window A/B matrix for the round-6 fixed-cost fold at saturated cores.

BENCH_r06 flagged every pipeline stage >1.3x anchor-normalized vs r5
while every non-pipeline query was flat-to-faster — the classic signature
of a real code regression, and round 6's only pipeline-DAG change was
8534eb4 (same-schema sink fold + side-stage overlap). Those are two
INDEPENDENT changes, so this tool A/Bs the 2x2 matrix in one window:

    base     SPARK_GRAFT_SIDE_OVERLAP=0  SPARK_GRAFT_FOLD_SINKS=0  (pre-fold)
    fold     overlap off, fold on
    overlap  overlap on,  fold off
    both     round-6 default

Interleaved (base, fold, overlap, both) x rounds; each cell a fresh
subprocess session (bench.pinned_cell, unpinned = the 32c bench
methodology, wedge-watchdogged), warm input + 1 timed run per cell.
Prints one `FOLD_AB {...}` JSON line with per-variant walls, medians and
median stage splits.
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402

VARIANTS = {
    "base": {"SPARK_GRAFT_SIDE_OVERLAP": "0", "SPARK_GRAFT_FOLD_SINKS": "0"},
    "fold": {"SPARK_GRAFT_SIDE_OVERLAP": "0", "SPARK_GRAFT_FOLD_SINKS": "1"},
    "overlap": {"SPARK_GRAFT_SIDE_OVERLAP": "1",
                "SPARK_GRAFT_FOLD_SINKS": "0"},
    "both": {"SPARK_GRAFT_SIDE_OVERLAP": "1", "SPARK_GRAFT_FOLD_SINKS": "1"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input",
                    default="/tmp/binlogpipe_bench/input_f36145.parquet")
    ap.add_argument("--warm",
                    default="/tmp/binlogpipe_bench/input_warm.parquet")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--variants", default="base,fold,overlap,both")
    args = ap.parse_args()
    names = args.variants.split(",")
    unknown = [n for n in names if n not in VARIANTS]
    if unknown:
        raise SystemExit(
            f"unknown variant(s) {unknown}; choose from {sorted(VARIANTS)}")
    walls: dict[str, list[float]] = {v: [] for v in names}
    stages: dict[str, list[dict]] = {v: [] for v in names}
    for r in range(args.rounds):
        for v in names:
            saved = {k: os.environ.get(k) for k in VARIANTS[v]}
            os.environ.update(VARIANTS[v])
            try:
                c = bench.pinned_cell(
                    "pipeline", args.cores, input=args.input,
                    tag=f"fab_{v}", warm=args.warm,
                    out_base="/tmp/binlogpipe_bench", n_timed=1,
                    pin=False, timeout_sec=900)
            finally:
                for k, old in saved.items():
                    if old is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = old
            walls[v].append(c["wall"])
            stages[v].append(c.get("stages", {}) or {})
            print(f"[round {r}] {v}: {c['wall']:.2f}s", flush=True)
    out = {}
    for v in names:
        # union across rounds, not round 0's keys: a round that returned
        # empty stages (wedge-retry path) must not drop every stage median
        keys = sorted(set().union(*stages[v])) if stages[v] else []
        out[v] = {
            "walls": walls[v],
            "median": round(statistics.median(walls[v]), 3),
            "best": round(min(walls[v]), 3),
            "stages_median": {
                k: round(statistics.median(
                    [s.get(k) or 0.0 for s in stages[v]]), 2)
                for k in keys},
        }
    print("FOLD_AB " + json.dumps(out))


if __name__ == "__main__":
    main()
