"""The end-to-end DAG: scan -> validate/header -> route -> enrich ->
per-type decode -> typed sinks -> aggregate, with checkpoint/resume,
lineage and per-stage metrics.

Spark lifecycle equivalent of `bcrab trans` (SURVEY §3.1):

  read input table -> with_header (JVM) ->
  routed fan-out write partitioned by sink (one shuffle, salted) ->
  [pass 1] TABLE_MAP slice -> decode -> table-map dimension (broadcast) ->
  [pass 2] per-sink typed decode (partition-pruned reads of the routed
           table; rows events join the broadcast dimension first) ->
  aggregates (sink counts, per-(source,sink) token stats, desc report) ->
  lineage + metrics + _checkpoint state.

Sinks are parquet directories with per-sink typed schemas (the Iceberg
catalog is an optional seam: set sink_format="iceberg" + a configured
catalog on a real cluster; the sandbox has no Iceberg jars, and parquet
keeps identical layout semantics: partition pruning + fan-out writes).

Resumability: each stage is idempotent (overwrite of its own output dir)
and recorded in ``_checkpoint/state.json`` keyed by run_id + stage name;
re-running skips completed stages, so a killed job resumes where it
stopped (BASELINE.json "resumable from snapshot + checkpoint").
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import aggregate as agg
from . import enrich, layout, lineage, parse, route

ROUTED_COLS = [
    "doc_id", "tokens", "n_tok", "source", "timestamp", "event_type",
    "server_id", "event_size", "log_pos", "flags", "checksum", "sink", "salt",
]


class Checkpoint:
    """Tiny JSON stage ledger; the parquet/Iceberg snapshot is the data
    checkpoint, this records which stages of a run committed."""

    def __init__(self, out_dir: str, run_id: str):
        self.path = Path(out_dir) / "_checkpoint" / "state.json"
        self.run_id = run_id
        self.state: dict = {"run_id": run_id, "stages": {}}
        if self.path.exists():
            prev = json.loads(self.path.read_text())
            if prev.get("run_id") == run_id:
                self.state = prev

    def done(self, stage: str) -> bool:
        return stage in self.state["stages"]

    def mark(self, stage: str, **info) -> None:
        self.state["stages"][stage] = {"ts": time.time(), **info}
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(self.state, indent=1))
        tmp.replace(self.path)


def read_input(spark: SparkSession, input_path: str) -> DataFrame:
    return spark.read.parquet(input_path)


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    run_id: str = "run0",
    resume: bool = True,
    typed_sinks: bool = True,
    collect_metrics: bool = True,
) -> dict:
    """Execute the full DAG. Returns a metrics dict (also persisted)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    ck = Checkpoint(out_dir, run_id)
    if not resume:
        ck.state["stages"] = {}
    metrics: dict = {"run_id": run_id, "stages": {}}
    t_start = time.time()

    src = read_input(spark, input_path)

    # ---- stage: route (header decode + validation + salted fan-out) ----
    routed_path = str(out / "routed")
    if not (resume and ck.done("route")):
        t0 = time.time()
        hdr = parse.with_header(src)
        obs = lineage.stage_observation("route")
        hdr = lineage.observe_counts(hdr, obs)
        routed_df = route.routed(hdr)
        (routed_df.select(*ROUTED_COLS)
         .write.mode("overwrite").partitionBy("sink").parquet(routed_path))
        stage_metrics = {k: (int(v) if v is not None else None)
                         for k, v in obs.get.items()}
        stage_metrics["wall_sec"] = round(time.time() - t0, 3)
        metrics["stages"]["route"] = stage_metrics
        ck.mark("route", **stage_metrics)
    routed_df = spark.read.parquet(routed_path)

    # ---- stage: lineage (per input partition) ----
    if not (resume and ck.done("lineage")):
        t0 = time.time()
        lin = lineage.partition_lineage(parse.with_header(src))
        lin.write.mode("overwrite").parquet(str(out / "lineage"))
        metrics["stages"]["lineage"] = {"wall_sec": round(time.time() - t0, 3)}
        ck.mark("lineage")

    # ---- stage: enrich (table-map dictionary from the TABLE_MAP slice) ----
    dim_path = str(out / "table_map_dim")
    if not (resume and ck.done("enrich")):
        t0 = time.time()
        tm_sink = routed_df.filter(F.col("sink") == "TABLE_MAP")
        schema, udf_factory = parse.DECODERS["TABLE_MAP"]
        tm = tm_sink.withColumn("d", udf_factory()(F.col("tokens")))
        tm_decoded = tm.select("source", "log_pos", "d.*")
        dim = enrich.build_table_map_dim(
            tm_decoded.filter(F.col("parse_error").isNull()))
        dim.write.mode("overwrite").parquet(dim_path)
        metrics["stages"]["enrich"] = {"wall_sec": round(time.time() - t0, 3)}
        ck.mark("enrich")
    dim = spark.read.parquet(dim_path)

    # ---- stage: per-sink typed decode ----
    if typed_sinks and not (resume and ck.done("decode")):
        t0 = time.time()
        present = [r["sink"] for r in routed_df.select("sink").distinct().collect()]
        decoded_rows = 0
        for sink in sorted(present):
            sink_df = routed_df.filter(F.col("sink") == sink)
            tgt = str(out / "sinks" / sink)
            base_cols = ["doc_id", "tokens", "n_tok", "source", "timestamp",
                         "event_type", "server_id", "event_size", "log_pos",
                         "flags", "checksum"]
            if sink in ("WRITE_ROWS_V2", "UPDATE_ROWS_V2", "DELETE_ROWS_V2"):
                n_images = 2 if sink == "UPDATE_ROWS_V2" else 1
                # JVM-computed join key (u48 at offset 19, mod.rs:1182-1186)
                sink_df = sink_df.withColumn(
                    "join_table_id", layout.u48le(F.col("tokens"), 19))
                joined = enrich.enrich_rows_events(
                    sink_df.withColumnRenamed("join_table_id", "table_id"), dim)
                udf = parse.make_rows_udf(n_images)
                dec = joined.withColumn(
                    "d", udf(F.col("tokens"), F.col("columns_type")))
                dec = dec.select(*base_cols, "tm_schema_name",
                                 "tm_table_name", "d.*")
            elif sink in parse.DECODERS:
                schema, udf_factory = parse.DECODERS[sink]
                dec = sink_df.withColumn("d", udf_factory()(F.col("tokens")))
                dec = dec.select(*base_cols, "d.*")
                if sink in ("QUERY", "EXEC_LOAD_QUERY"):
                    dec = dec.withColumn(
                        "statement_kind", parse.statement_kind(F.col("query")))
                elif sink == "ROWS_QUERY":
                    dec = dec.withColumn(
                        "statement_kind",
                        parse.statement_kind(F.col("query_text")))
            else:
                # header-only sinks + quarantine keep raw tokens
                dec = sink_df.select(*base_cols)
            dec.write.mode("overwrite").parquet(tgt)
            decoded_rows += spark.read.parquet(tgt).count()
        metrics["stages"]["decode"] = {
            "wall_sec": round(time.time() - t0, 3), "rows": decoded_rows}
        ck.mark("decode", rows=decoded_rows)

    # ---- stage: aggregate ----
    if not (resume and ck.done("aggregate")):
        t0 = time.time()
        agg.sink_counts(routed_df).write.mode("overwrite").parquet(
            str(out / "agg" / "sink_counts"))
        agg.source_type_stats(routed_df).write.mode("overwrite").parquet(
            str(out / "agg" / "source_type_stats"))
        metrics["stages"]["aggregate"] = {"wall_sec": round(time.time() - t0, 3)}
        ck.mark("aggregate")

    metrics["wall_sec"] = round(time.time() - t_start, 3)
    n_in = metrics.get("stages", {}).get("route", {}).get("rows")
    if n_in is None:
        n_in = routed_df.count()
        metrics["rows"] = n_in
    else:
        metrics["rows"] = n_in
    metrics["rows_per_sec"] = round(n_in / metrics["wall_sec"], 1)
    if collect_metrics:
        (out / "metrics.json").write_text(json.dumps(metrics, indent=1))
    return metrics


def main() -> None:  # spark-submit entrypoint
    import argparse

    from .session import build_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()
    spark = build_spark(cores=args.cores)
    m = run_pipeline(spark, args.input, args.out, run_id=args.run_id,
                     resume=not args.no_resume)
    print(json.dumps(m))


if __name__ == "__main__":
    main()
