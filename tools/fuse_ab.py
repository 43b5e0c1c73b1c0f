#!/usr/bin/env python
"""A/B: single-bridge-crossing route stage (fuse_hot_decode) vs the
two-crossing default, interleaved at two core counts in one time window
(this sandbox's throughput swings between windows — only within-window
comparisons are meaningful). Prints one JSON line."""
from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def run_once(cores: int, fuse: bool, input_path: str, warm: str) -> dict:
    # exact bench methodology (session, warm-up, timing) — one code path
    tag = f"ab_{cores}_{'fuse' if fuse else 'base'}"
    m = bench.run_pipeline_at(cores, input_path, tag, warm, n_timed=1,
                              fuse_hot_decode=fuse)
    return {"wall": round(m["bench_wall_sec"], 2),
            "stages": {k: v.get("wall_sec")
                       for k, v in m["stages"].items()}}


def main() -> None:
    rounds = max(1, int(sys.argv[1])) if len(sys.argv) > 1 else 2
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
