#!/usr/bin/env python
"""Route-stage attribution + shuffle-codec A/B (round-4 verdict item 5).

The route stage is the co-dominant pipeline wall (7.5s of 18.6 at 32c in
r4) and its work is three distinct resources stacked in one stage:
scan+header+pack-UDF (the JVM→Python bridge), the salted exchange, and
the partitioned parquet fan-out write. This tool splits them with three
interleaved cells per round, each the SAME projection truncated one
operator earlier (all cells run in one session, one time window):

  pack_noop    = scan + header exprs + pack UDF + salt col → noop sink
  shuffle_noop = pack_noop + repartition(width, sink, salt) → noop sink
  full_write   = shuffle_noop + partitionBy(sink) parquet write

so  bridge+scan ≈ pack_noop,  exchange ≈ shuffle_noop − pack_noop,
    fan-out write ≈ full_write − shuffle_noop.

Second experiment: spark.io.compression.codec lz4(default) vs zstd for
the FULL pipeline, interleaved — token payloads compress well, and route
shuffle bytes are the sf1.0 bottleneck's second term (route scaled 0.59
in the r4 sf1.0 pair). Run:

  python tools/route_profile.py [rounds] [sf]
"""
from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def _projection(spark, input_path: str):
    from pyspark.sql import functions as F

    from binlogpipe import layout, parse, route
    from binlogpipe.job import ROWS_SINKS, read_input

    # the exact route-stage projection from job.run_pipeline (same UDF
    # position constraint: pack sits directly on the with_header output)
    hdr = parse.with_header(read_input(spark, input_path))
    hdr = hdr.withColumn("tokens_bin",
                         parse.pack_tokens_udf()(F.col("tokens")))
    hdr = hdr.withColumn(
        "rows_table_id",
        F.when(F.col("sink").isin(*ROWS_SINKS + ("TABLE_MAP",)),
               layout.u48le(F.col("tokens"), 19)))
    hdr = hdr.withColumn("input_partition", F.spark_partition_id())
    hdr = hdr.withColumn("input_pos", F.monotonically_increasing_id())
    return hdr.withColumn("salt", route.salt_expr())


def split_cells(spark, input_path: str, out_base: str) -> dict[str, float]:
    from binlogpipe import route
    from binlogpipe.job import ROUTED_COLS

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    walls: dict[str, float] = {}

    t0 = time.time()
    noop(_projection(spark, input_path).select(*ROUTED_COLS))
    walls["pack_noop"] = round(time.time() - t0, 2)

    t0 = time.time()
    noop(route.routed(_projection(spark, input_path)).select(*ROUTED_COLS))
    walls["shuffle_noop"] = round(time.time() - t0, 2)

    out = f"{out_base}/route_profile_out"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    (route.routed(_projection(spark, input_path)).select(*ROUTED_COLS)
     .write.mode("overwrite").partitionBy("sink").parquet(out))
    walls["full_write"] = round(time.time() - t0, 2)
    return walls


def main() -> None:
    from binlogpipe.session import build_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    input_path, n_rows = bench.synth_input(sf)
    warm = "/tmp/binlogpipe_bench/input_warm.parquet"
    if not Path(warm).exists():
        from tools import fixture_gen
        fixture_gen.write_synth_parquet(Path(warm), 60)

    # --- experiment 1: stage split, one session, interleaved ---
    spark = build_spark(app="route-profile", cores=bench.CPUS)
    best: dict[str, float] = {}
    try:
        spark.range(1000).selectExpr("sum(id)").collect()
        split_cells(spark, warm, "/tmp/binlogpipe_bench")  # warm UDF workers
        for i in range(rounds):
            w = split_cells(spark, input_path, "/tmp/binlogpipe_bench")
            print(f"# split round {i}: {w}", file=sys.stderr)
            for k, v in w.items():
                best[k] = min(best.get(k, v), v)
    finally:
        spark.stop()
    split = {
        **best,
        "attr_bridge_scan": best["pack_noop"],
        "attr_exchange": round(best["shuffle_noop"] - best["pack_noop"], 2),
        "attr_fanout_write": round(best["full_write"] - best["shuffle_noop"],
                                   2),
    }

    # --- experiment 2: shuffle codec A/B, full pipeline, interleaved ---
    codec_walls: dict[str, list[float]] = {"lz4": [], "zstd": []}
    for i in range(rounds):
        for codec in ("lz4", "zstd"):
            m = bench.run_pipeline_at(
                bench.CPUS, input_path, f"codec_{codec}", warm, n_timed=1,
                spark_conf={"spark.io.compression.codec": codec})
            codec_walls[codec].append(m["bench_wall_sec"])
            print(f"# codec round {i} {codec}: {m['bench_wall_sec']}s "
                  f"(route {m['stages']['route']['wall_sec']}s)",
                  file=sys.stderr)
    codec = {
        "lz4_walls": codec_walls["lz4"],
        "zstd_walls": codec_walls["zstd"],
        "lz4_best": min(codec_walls["lz4"]),
        "zstd_best": min(codec_walls["zstd"]),
        "zstd_vs_lz4": round(min(codec_walls["zstd"])
                             / min(codec_walls["lz4"]), 3),
    }

    print(json.dumps({"sf": sf, "rows": n_rows, "rounds": rounds,
                      "split": split, "codec": codec}))


if __name__ == "__main__":
    main()
