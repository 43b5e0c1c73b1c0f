"""Structured Streaming variant of the pipeline.

The reference's live replication source (`Connection::recv` packet loop,
`crates/old/src/connection.rs:41-80`) maps to a Structured Streaming
source over the same input table (SURVEY §2.1 S4): `readStream` on the
sequence directory -> identical JVM header/route transforms ->
watermarked per-sink counts and per-(source, sink) token stats ->
checkpointed sinks. Batch and stream share the exact transform code
(parse.with_header / route.salt_expr), so stream results converge to the
batch goldens when drained with Trigger.AvailableNow.

The wire/replication client itself (handshake, auth, COM_BINLOG_DUMP) is
deliberately NOT ported — it carries no analytics semantics (SURVEY §3.3)
and is superseded by the table source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import parse, route

INPUT_SCHEMA = ("doc_id string, tokens array<int>, n_tok int, source string")


def read_stream(spark: SparkSession, input_dir: str,
                max_files_per_trigger: int | None = None) -> DataFrame:
    r = spark.readStream.schema(INPUT_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(input_dir)


def routed_stream(stream_df: DataFrame) -> DataFrame:
    """Same parse+route transforms as the batch DAG, on a stream."""
    hdr = parse.with_header(stream_df)
    return hdr.withColumn("salt", route.salt_expr())


def sink_counts_stream(routed: DataFrame) -> DataFrame:
    """Running per-sink counts. Event time = the binlog header timestamp;
    a 1-hour watermark bounds state for late events (the reference has no
    late-data notion — file order is total — so the watermark only matters
    for the live-replication analog)."""
    with_ts = routed.withColumn(
        "event_time", F.to_timestamp(F.col("timestamp")))
    return (
        with_ts.withWatermark("event_time", "1 hour")
        .groupBy("sink")
        .agg(F.count("*").alias("n"))
    )


def run_available_now(spark: SparkSession, input_dir: str, out_dir: str,
                      checkpoint_dir: str) -> None:
    """Drain the current table contents through the streaming DAG (used by
    tests to prove batch/stream parity); restartable from the checkpoint."""
    routed = routed_stream(read_stream(spark, input_dir))
    q = (
        routed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_counts_available_now(spark: SparkSession, input_dir: str,
                             checkpoint_dir: str) -> dict[str, int]:
    """Streaming per-sink counts drained to memory, for golden comparison."""
    counts = sink_counts_stream(routed_stream(read_stream(spark, input_dir)))
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory").queryName("stream_sink_counts")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from stream_sink_counts").collect()
    return {r["sink"]: r["n"] for r in rows}
