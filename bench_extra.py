#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (bench.py itself is
frozen for the driver's measurement — guide §1.4 noop-sink isolation and
plan capture live here instead).

Modes:
  python bench_extra.py queries [--names a,b,c] [--cores N] [--sf-dir D]
      time each declared query noop-forced (bench.run_queries
      methodology: one warmed session, one timed run per query), print
      one JSON line {"queries": {...}}.
  python bench_extra.py plans [--names a,b,c] [--out plans/r07] [--suffix _before]
      write .explain("formatted") for each named query to
      <out>/<name><suffix>.txt (judge-checkable plan evidence).
  python bench_extra.py sf1docs
      synthesize the 10x doc/embedding replica (bench.synth_sf1_docs)
      and print its path — the sf1 near-dup/ANN family input.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def _session(cores: int):
    from binlogpipe.session import build_spark

    spark = build_spark(app="bench-extra", cores=cores)
    spark.range(1000).selectExpr("sum(id)").collect()
    return spark


def cmd_queries(args) -> None:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = args.names.split(",") if args.names else list(qs)
    spark = _session(args.cores)
    try:
        # same warm protocol as bench.run_queries: parquet scan + a tiny
        # Python-bridge pass so the first timed query isn't the cold one
        (spark.read.parquet(f"{args.sf_dir}/documents.parquet")
         .limit(2000).selectExpr("md5(text) h").groupBy("h").count()
         .write.format("noop").mode("overwrite").save())
        timings = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, args.sf_dir).write.format("noop") \
                .mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
            print(f"# {name}: {timings[name]}s", file=sys.stderr)
        print(json.dumps({"sf_dir": args.sf_dir, "cores": args.cores,
                          "queries": timings}))
    finally:
        spark.stop()


def cmd_plans(args) -> None:
    import io
    from contextlib import redirect_stdout

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = args.names.split(",") if args.names else list(qs)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    spark = _session(args.cores)
    try:
        for name in names:
            df = qs[name](spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out / f"{name}{args.suffix}.txt").write_text(buf.getvalue())
            print(f"# wrote {out}/{name}{args.suffix}.txt", file=sys.stderr)
    finally:
        spark.stop()


def cmd_sf1docs(args) -> None:
    import bench

    print(bench.synth_sf1_docs(os.environ.get("SPARK_GRAFT_SF_DIR",
                                              "/root/testdata/sf0.1")))


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)
    for m in ("queries", "plans"):
        p = sub.add_parser(m)
        p.add_argument("--names", default=None)
        p.add_argument("--cores", type=int,
                       default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        p.add_argument("--sf-dir",
                       default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                              "/root/testdata/sf0.1"))
        if m == "plans":
            p.add_argument("--out", default="plans/r07")
            p.add_argument("--suffix", default="")
    sub.add_parser("sf1docs")
    args = ap.parse_args()
    {"queries": cmd_queries, "plans": cmd_plans,
     "sf1docs": cmd_sf1docs}[args.mode](args)


if __name__ == "__main__":
    main()
