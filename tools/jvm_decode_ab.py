#!/usr/bin/env python
"""Interleaved A/B of the Catalyst-expression decoders (jvm_decode.py)
vs the pandas decoders, at CPU-pinned core budgets — the contract-pair
methodology (an unpinned local[N] lets Python decode workers free-ride
extra host cores, which structurally favors the pandas path; a cgroup'd
executor forbids exactly that).

Usage: python tools/jvm_decode_ab.py [sf] [cores ...]
Writes one JSON line per cell; summary at the end.
"""
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.05
    cores_list = [int(c) for c in sys.argv[2:]] or [1, 4]
    input_path, n_rows = bench.synth_input(sf)
    warm = "/tmp/binlogpipe_bench/input_warm.parquet"
    out: dict = {"sf": sf, "rows": n_rows, "cells": []}
    for cores in cores_list:
        # interleave on/off, alternating order per round to cancel
        # window-drift bias
        for rnd, order in enumerate((("1", "0"), ("0", "1"))):
            for flag in order:
                os.environ["SPARK_GRAFT_JVM_DECODE"] = flag
                c = bench.pinned_cell(
                    "pipeline", cores, input=input_path,
                    tag=f"jvmab_{cores}c_{rnd}_{flag}", warm=warm,
                    out_base="/tmp/binlogpipe_bench", n_timed=1, pin=True,
                    timeout_sec=120 + int(n_rows * 160e-6 / cores))
                cell = {"cores": cores, "jvm": flag == "1",
                        "wall": c["wall"], "stages": c["stages"]}
                out["cells"].append(cell)
                print(json.dumps(cell), flush=True)
    for cores in cores_list:
        on = [c["wall"] for c in out["cells"]
              if c["cores"] == cores and c["jvm"]]
        off = [c["wall"] for c in out["cells"]
               if c["cores"] == cores and not c["jvm"]]
        print(json.dumps({
            "cores": cores, "on_walls": on, "off_walls": off,
            "on_vs_off_median": round(sorted(on)[len(on) // 2]
                                      / sorted(off)[len(off) // 2], 3)}),
            flush=True)


if __name__ == "__main__":
    main()
