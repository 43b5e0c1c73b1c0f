#!/usr/bin/env python
"""Same-window, same-tree query A/B over env-knobbed variants (round 7).

query_ab.py compares the current tree against a git rev; this tool
compares two env-knob settings of ONE tree (the round-7 pattern: every
optimization ships behind a knob so A and B run in the same window).
Each cell is a fresh subprocess (knobs are read at query-build time, and
two expression shapes must never share one warmed JIT profile), own
Spark session, JVM warm-up, 2 timed noop-forced runs, best-of; variants
interleave per round.

  python tools/qenv_ab.py doc_minhash_sig --rounds 3 \
      --variant 'old;SPARK_GRAFT_UNROLL_SHINGLE=0' \
      --variant 'new;SPARK_GRAFT_UNROLL_SHINGLE=1'
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import json, sys, time
query, sf_dir, cores = sys.argv[1:4]
import __spark_entry__ as entry_mod
from binlogpipe.session import build_spark

spark = build_spark(app=f"qeab-{query}", cores=int(cores))
spark.range(1000).selectExpr("sum(id)").collect()
q = entry_mod.queries()[query]
best = None
for _ in range(2):
    t0 = time.time()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    w = time.time() - t0
    best = w if best is None or w < best else best
spark.stop()
print(json.dumps({"wall": round(best, 3)}))
"""


def run_cell(query: str, sf_dir: str, cores: int, env: dict[str, str]) -> float:
    cell_env = dict(os.environ)
    cell_env.update(env)
    cell_env["PYTHONPATH"] = str(REPO)
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, query, sf_dir, str(cores)],
        capture_output=True, text=True, cwd=str(REPO), env=cell_env,
        timeout=1800)
    if p.returncode != 0:
        raise RuntimeError(f"cell failed ({env}):\n{p.stderr[-3000:]}")
    return json.loads(p.stdout.strip().splitlines()[-1])["wall"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--variant", action="append", required=True,
                    help="'name;KEY=V;KEY=V'")
    args = ap.parse_args()

    variants: list[tuple[str, dict[str, str]]] = []
    for v in args.variant:
        parts = v.split(";")
        variants.append((parts[0],
                         dict(p.split("=", 1) for p in parts[1:] if p)))

    walls: dict[str, list[float]] = {n: [] for n, _ in variants}
    for i in range(args.rounds):
        for name, env in variants:
            w = run_cell(args.query, args.sf_dir, args.cores, env)
            walls[name].append(w)
            print(f"# round {i} {name}: {w}s", file=sys.stderr)

    out = {"query": args.query, "cores": args.cores, "sf_dir": args.sf_dir,
           "rounds": args.rounds, "cells": {
               n: {"walls": walls[n], "best": min(walls[n]),
                   "median": round(statistics.median(walls[n]), 3)}
               for n, _ in variants}}
    ms = [out["cells"][n]["median"] for n, _ in variants]
    if len(ms) == 2 and ms[0]:
        out["ratio_median_1_over_0"] = round(ms[1] / ms[0], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
