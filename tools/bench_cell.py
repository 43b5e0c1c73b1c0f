#!/usr/bin/env python
"""One pinned bench cell in a fresh process: pins this process's CPU
affinity to exactly `cores` CPUs BEFORE any pyspark import, then runs one
cell (pipeline | sha2 | bridge) and prints one JSON line.

Why a subprocess: pyspark launches ONE JVM gateway per python process and
reuses it across SparkSessions, so in-process `sched_setaffinity` between
cells leaves every later cell running in the first cell's cpuset
(measured: a "4-core" cell after a 1-core cell walled SLOWER than the
1-core cell — 8.77s vs 6.4s — because all 4 task threads shared the one
inherited CPU). A fresh process per cell makes the JVM, the pyspark
daemon, and every forked Python UDF worker inherit the intended cpuset.

Why pin at all: a YARN/K8s executor's core budget is enforced by a cgroup
cpuset/quota that covers the executor JVM AND its Python UDF workers. An
unpinned local[1] run is NOT a 1-core configuration — the Python workers
and JVM GC/IO threads free-ride other host CPUs (measured on this VM: the
identity-UDF bridge cell walls 6.04s unpinned vs 8.75s pinned at 1 core —
~1.45 cores of actual CPU), under-measuring the 1-core wall and so
DEFLATING any 1->4N scaling ratio built on it. Pinned cells are the
faithful sandbox analog of "N-core executor vs 4N-core executor".
"""
import json
import os
import sys


def main() -> None:
    spec = json.loads(sys.argv[1])
    cores = int(spec["cores"])
    # pin=False runs the cell UNPINNED but still in this fresh subprocess
    # — callers use it to get the wedge-watchdog (see bench.pinned_cell)
    # for cells whose methodology is deliberately unpinned, e.g. the
    # free-ride reference pair
    if spec.get("pin", True):
        ncpu = os.cpu_count() or cores
        base = int(spec.get("pin_base", 2))
        if base + cores > ncpu:
            base = 0
        os.sched_setaffinity(0, set(range(base, base + cores)))

    sys.path.insert(0, spec.get("repo", "/root/repo"))
    import bench

    kind = spec["kind"]
    if kind == "pipeline":
        r = bench.run_pipeline_at(
            cores, spec["input"], spec["tag"], spec.get("warm"),
            spec.get("out_base", "/tmp/binlogpipe_bench"),
            n_timed=int(spec.get("n_timed", 1)))
        out = {"wall": r["bench_wall_sec"],
               "stages": {k: v.get("wall_sec")
                          for k, v in r.get("stages", {}).items()}}
    elif kind == "sha2":
        import time

        from binlogpipe.session import build_spark
        spark = build_spark(app=f"sha2p-{cores}", cores=cores)
        try:
            spark.range(1000).selectExpr("sum(id)").collect()
            # warm the sha2 codegen + JIT on the SAME plan shape before
            # timing: in a pinned cpuset the JVM's JIT compiler threads
            # share the budget, so first-pass compilation otherwise lands
            # inside the timed region and skews the short 4-core cell
            # (measured: 4c wall 4.99s cold vs 3.63s unpinned)
            (spark.range(2_000_000, numPartitions=4 * cores)
             .selectExpr("sha2(cast(id as string), 256) as h")
             .selectExpr("sha2(h, 256) as h2")
             .selectExpr("max(h2)").collect())
            df = spark.range(int(spec["rows"]), numPartitions=4 * cores)
            t0 = time.time()
            (df.selectExpr("sha2(cast(id as string), 256) as h")
               .selectExpr("sha2(h, 256) as h2")
               .selectExpr("max(h2)").collect())
            out = {"wall": round(time.time() - t0, 2)}
        finally:
            spark.stop()
    elif kind == "bridge":
        import time

        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        from binlogpipe.session import build_spark
        spark = build_spark(app=f"bridgep-{cores}", cores=cores)
        try:
            spark.range(1000).selectExpr("sum(id)").collect()
            df = (spark.range(6_000_000, numPartitions=4 * cores)
                  .selectExpr("id",
                              "cast(repeat(uuid(), 3) as binary) as payload")
                  .persist())
            df.count()

            @pandas_udf("int")
            def blen(s: pd.Series) -> pd.Series:
                return s.map(len).astype("int32")

            best = None
            for _ in range(2):
                t0 = time.time()
                df.select(blen("payload")).selectExpr("max(*)").collect()
                w = time.time() - t0
                best = w if best is None or w < best else best
            out = {"wall": round(best, 2)}
        finally:
            spark.stop()
    elif kind == "idle":
        # watchdog test hook: burns no CPU forever — the signature of the
        # PythonRunner wedge bench.pinned_cell's watchdog must kill
        # (tests/test_bench_watchdog.py); never used by a real bench run
        import time
        while True:
            time.sleep(60)
    else:
        raise SystemExit(f"unknown cell kind: {kind}")
    print("CELL " + json.dumps(out))


if __name__ == "__main__":
    main()
