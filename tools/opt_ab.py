#!/usr/bin/env python
"""Same-window pinned pipeline A/B over env-knobbed variants (round 7).

Each optimization this round ships behind an env knob (e.g.
SPARK_GRAFT_ARROW_PACK) so the A and B sides run the SAME tree in the
same time window — the only trustworthy comparison on this shared host
(bench.py module docstring). Cells reuse bench.pinned_cell: fresh
subprocess, optional CPU pinning to exactly the core budget, wedge
watchdog, warm pipeline pass before the timed run. Variants interleave
per round (A,B,A,B,...) and the report carries per-round walls + stage
splits, median and best.

  python tools/opt_ab.py --cores 1 --sf 0.1 --rounds 2 \
      --variant 'base;SPARK_GRAFT_ARROW_PACK=0' \
      --variant 'arrow;SPARK_GRAFT_ARROW_PACK=1'
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def run_cell(cores: int, input_path: str, n_rows: int, tag: str,
             env: dict[str, str], pin: bool) -> dict:
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        return bench.pinned_cell(
            "pipeline", cores, input=input_path, tag=f"optab_{tag}",
            warm="/tmp/binlogpipe_bench/input_warm.parquet",
            n_timed=1, pin=pin,
            timeout_sec=120 + n_rows * 110e-6 / cores)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=1)
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--no-pin", action="store_true")
    ap.add_argument("--variant", action="append", required=True,
                    help="'name;KEY=V;KEY=V'")
    args = ap.parse_args()

    variants: list[tuple[str, dict[str, str]]] = []
    for v in args.variant:
        parts = v.split(";")
        env = dict(p.split("=", 1) for p in parts[1:] if p)
        variants.append((parts[0], env))

    input_path, n_rows = bench.synth_input(args.sf)
    warm = Path("/tmp/binlogpipe_bench/input_warm.parquet")
    if not warm.exists():
        from tools import fixture_gen
        fixture_gen.write_synth_parquet(warm, 60)

    walls: dict[str, list[float]] = {n: [] for n, _ in variants}
    stages: dict[str, list[dict]] = {n: [] for n, _ in variants}
    for i in range(args.rounds):
        for name, env in variants:
            c = run_cell(args.cores, input_path, n_rows, f"{name}{i}",
                         env, not args.no_pin)
            walls[name].append(c["wall"])
            stages[name].append(c.get("stages", {}))
            print(f"# round {i} {name}: {c['wall']}s "
                  f"{json.dumps(c.get('stages', {}))}", file=sys.stderr)

    out = {"cores": args.cores, "sf": args.sf, "rows": n_rows,
           "pinned": not args.no_pin, "rounds": args.rounds, "cells": {}}
    for name, _ in variants:
        out["cells"][name] = {
            "walls": walls[name],
            "best": min(walls[name]),
            "median": round(statistics.median(walls[name]), 2),
            "stages_last": stages[name][-1],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
