#!/usr/bin/env python
"""A/B: single-bridge-crossing route stage (fuse_hot_decode) vs the
two-crossing default, interleaved at two core counts in one time window
(this sandbox's throughput swings between windows — only within-window
comparisons are meaningful). Prints one JSON line."""
from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def run_once(cores: int, fuse: bool, input_path: str, warm: str) -> dict:
    from binlogpipe.job import run_pipeline
    from binlogpipe.session import build_spark

    tag = f"ab_{cores}_{'fuse' if fuse else 'base'}"
    out = f"/tmp/binlogpipe_bench/out_{tag}"
    spark = build_spark(app=tag, cores=cores)
    try:
        spark.range(1000).selectExpr("sum(id)").collect()
        shutil.rmtree(out + "_warm", ignore_errors=True)
        run_pipeline(spark, warm, out + "_warm", run_id="warm",
                     resume=False, collect_metrics=False,
                     fuse_hot_decode=fuse)
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        m = run_pipeline(spark, input_path, out, run_id=tag, resume=False,
                         fuse_hot_decode=fuse)
        wall = time.time() - t0
        return {"wall": round(wall, 2),
                "stages": {k: v.get("wall_sec")
                           for k, v in m["stages"].items()}}
    finally:
        spark.stop()


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    input_path, n_rows = bench.synth_input(0.1)
    warm = "/tmp/binlogpipe_bench/input_warm.parquet"
    if not Path(warm).exists():
        from tools import fixture_gen
        fixture_gen.write_synth_parquet(Path(warm), 60)
    best: dict = {}
    for r in range(rounds):
        for cores in (8, 32):
            for fuse in (False, True):
                run = run_once(cores, fuse, input_path, warm)
                key = f"{cores}c_{'fuse' if fuse else 'base'}"
                print(f"[round {r}] {key}: {run['wall']}s "
                      f"{json.dumps(run['stages'])}", flush=True)
                if key not in best or run["wall"] < best[key]["wall"]:
                    best[key] = run
    eff = {
        "base": round((best["8c_base"]["wall"] / best["32c_base"]["wall"]) / 4, 3),
        "fuse": round((best["8c_fuse"]["wall"] / best["32c_fuse"]["wall"]) / 4, 3),
    }
    print(json.dumps({"rows": n_rows, "best": best, "efficiency": eff}))


if __name__ == "__main__":
    main()
