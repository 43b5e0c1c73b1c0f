#!/usr/bin/env python
"""Fixed-cost probe for the 1→4 scaling pair (round-4 verdict item 2).

The pair's efficiency is (t1/t4)/4 with t_N = W/N + F: solving round-4's
recorded walls gives F ≈ 12.7s of per-run cost that does NOT shrink with
cores (driver-side planning + commit for the ~22 write jobs a run
issues, Python-worker spin-up, per-job scheduling). F is what holds the
recorded efficiency at ~0.78-0.83: efficiency = (W+F)/(W+4F), so
shrinking F raises the ratio AND the absolute 32-core wall — the only
honest lever.

Cell 1 measures F directly: the full pipeline on a ~10k-event input
(W ≈ 0) at local[1] and local[4], interleaved — the two walls should
nearly coincide, and their level IS the fixed cost.

Cell 2 A/Bs mapreduce.fileoutputcommitter.algorithm.version=2 (tasks
move their own outputs at commit; v1 has the driver sequentially rename
every task file at job commit — a per-job serial term paid ~22x per
run) on the same tiny input, interleaved.

  python tools/fixed_cost_probe.py [rounds]
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402

V2 = {"spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2"}
# v1 must be EXPLICIT: build_spark's default became v2 in round 5, so a
# conf=None cell would silently rerun v2 against itself and report a
# meaningless ~1.0 ratio (round-5 advice item 2)
V1 = {"spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "1"}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    tiny = Path("/tmp/binlogpipe_bench/input_warm.parquet")
    if not tiny.exists():
        from tools import fixture_gen
        fixture_gen.write_synth_parquet(tiny, 60)

    # cell 1: F at 1 vs 4 cores (no warm-up *run* beyond the session warm
    # query — the probe wants the steady-state small-job wall, so use
    # n_timed=3 and best-of inside one session)
    f_walls: dict[str, list] = {"f1": [], "f4": []}
    for _ in range(rounds):
        for cores, key in ((1, "f1"), (4, "f4")):
            m = bench.run_pipeline_at(cores, str(tiny), f"fc{cores}",
                                      warmup_path=str(tiny), n_timed=2)
            f_walls[key].append(m["bench_wall_sec"])
            print(f"# F probe {cores}c: {m['bench_wall_sec']}s",
                  file=sys.stderr)

    # cell 2: committer v1 vs v2 on the same tiny input at 4 cores
    c_walls: dict[str, list] = {"v1": [], "v2": []}
    for _ in range(rounds):
        for key, conf in (("v1", V1), ("v2", V2)):
            m = bench.run_pipeline_at(4, str(tiny), f"cm_{key}",
                                      warmup_path=str(tiny), n_timed=2,
                                      spark_conf=conf)
            c_walls[key].append(m["bench_wall_sec"])
            print(f"# committer {key}: {m['bench_wall_sec']}s",
                  file=sys.stderr)

    print(json.dumps({
        "fixed_cost": {k: v for k, v in f_walls.items()},
        "fixed_cost_best": {k: min(v) for k, v in f_walls.items()},
        "committer": {k: v for k, v in c_walls.items()},
        "committer_best": {k: min(v) for k, v in c_walls.items()},
        "v2_vs_v1": round(min(c_walls["v2"]) / min(c_walls["v1"]), 3),
    }))


if __name__ == "__main__":
    main()
