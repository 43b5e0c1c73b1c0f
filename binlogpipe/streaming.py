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
                max_files_per_trigger: int | None = None,
                input_format: str = "parquet") -> DataFrame:
    """Streaming source seam: the contract parquet table (primary) or raw
    `.bin` binlog files split in-stream (binaryFile readStream + the same
    mapInPandas splitter as the batch binsource) — the closest Spark-native
    analog of tailing a binlog directory on a replication host."""
    if input_format == "binlog":
        from . import binsource

        r = spark.readStream.format("binaryFile") \
            .schema("path string, modificationTime timestamp, "
                    "length long, content binary") \
            .option("pathGlobFilter", "*.bin")
        if max_files_per_trigger:
            r = r.option("maxFilesPerTrigger", max_files_per_trigger)
        files = r.load(input_dir).select("path", "content")
        return binsource.split_stream(
            files, root=binsource._glob_root(input_dir))
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


def transaction_assembler(routed: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): assemble binlog
    transactions per source — a transaction opens at a GTID/ANON_GTID event
    and commits at the next XID (the reference leaves this to downstream
    consumers; replication semantics per MySQL's GTID protocol).

    State per source: (open transaction's gtid log_pos, events so far).
    Events are processed in log_pos order within each micro-batch; the
    replication stream delivers in order, and the table-source analog sorts
    per batch. Emits one row per committed transaction.
    """
    out_schema = ("source string, gtid_log_pos long, xid_log_pos long, "
                  "n_events int")
    state_schema = "gtid_log_pos long, n_events int, open int"

    def fn(key, pdfs, state):
        import pandas as pd

        (source,) = key
        if state.exists:
            gpos, n, is_open = state.get
        else:
            gpos, n, is_open = -1, 0, 0
        out = []
        # applyInPandasWithState gives no cross-chunk ordering guarantee:
        # a group spanning multiple Arrow chunks must be concatenated and
        # sorted ONCE, or the GTID/XID state machine runs out of log_pos
        # order across chunk boundaries.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values("log_pos")
            for sink, pos in zip(pdf["sink"], pdf["log_pos"]):
                if sink in ("GTID", "ANON_GTID"):
                    gpos, n, is_open = int(pos), 1, 1
                elif is_open:
                    n += 1
                    if sink == "XID":
                        out.append((source, gpos, int(pos), n))
                        gpos, n, is_open = -1, 0, 0
        state.update((gpos, n, is_open))
        yield pd.DataFrame(
            out, columns=["source", "gtid_log_pos", "xid_log_pos", "n_events"])

    return (routed.groupBy("source")
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", "NoTimeout"))


def run_transactions_available_now(spark: SparkSession, input_dir: str,
                                   checkpoint_dir: str) -> list:
    txns = transaction_assembler(
        routed_stream(read_stream(spark, input_dir))
        .select("source", "sink", "log_pos"))
    q = (txns.writeStream.outputMode("append")
         .format("memory").queryName("stream_txns")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.sql(
        "select * from stream_txns order by source, gtid_log_pos").collect()


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


def run_full_available_now(spark: SparkSession, input_dir: str, out_dir: str,
                           checkpoint_dir: str,
                           max_files_per_trigger: int | None = None,
                           input_format: str = "parquet") -> None:
    """Incremental FULL DAG: the streaming twin of job.run_pipeline. Each
    micro-batch routes to the routed table, refreshes the TableMap
    dimension (cumulative latest-wins — a rows event may arrive batches
    after its TableMap), and appends per-sink typed decodes, reusing the
    exact batch decoders (parse.DECODERS).

    Idempotence on retry: every write lands in a `batch=<id>` subdirectory
    with mode=overwrite, so a replayed micro-batch overwrites its own
    output instead of duplicating (the parquet stand-in for an Iceberg
    transactional append); the dim is a chain of per-batch snapshots
    (`table_map_dim/v=<id>`), each rebuilt deterministically from the
    previous snapshot + the current batch, so a replay rewrites only its
    own version.

    The dim is maintained INCREMENTALLY: snapshot v=N = latest-wins over
    (snapshot v<N ∪ batch N's decoded TableMaps). Each trigger touches the
    current batch plus one dim-sized read — O(batches) total over the
    stream's life, not the O(batches²) of rescanning all routed history
    every trigger. Winner-of-winners equals the global winner, so the
    snapshot chain reproduces the full-history window exactly.

    Batch-parity precondition (same as enrich.build_table_map_dim
    documents): at most one TableMap per (source, table_id) per stream.
    A rows event decoded in batch N is never re-decoded if a NEWER
    TableMap for its table arrives in batch M>N, while the batch DAG
    applies global latest-wins — the two agree only under that
    single-TableMap assumption (real replication streams satisfy it per
    binlog file; the fixtures do too)."""
    from pathlib import Path

    from . import enrich, layout
    from .job import ROUTED_COLS, ROWS_SINKS, list_sink_partitions

    out = Path(out_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id == 0:
            # fresh stream start (new checkpoint): everything under this
            # out dir belongs to a PREVIOUS run — without this wipe, a
            # later batch N would pick the stale max(v<N) as its dim
            # rebuild base, and any whole-directory read of routed/ or a
            # sink would mix the old run's batch=* rows with the new run's.
            # Runs BEFORE this batch's own writes (its dirs are batch=0).
            import shutil as _sh
            for p in (out / "table_map_dim").glob("v=*"):
                _sh.rmtree(p, ignore_errors=True)
            for p in (out / "routed").glob("batch=*"):
                _sh.rmtree(p, ignore_errors=True)
            sinks_root = out / "sinks"
            if sinks_root.is_dir():
                for s in sinks_root.iterdir():
                    for p in s.glob("batch=*"):
                        _sh.rmtree(p, ignore_errors=True)
                    # a sink dir with no surviving batches must disappear
                    # entirely: "empty directory" breaks whole-directory
                    # parquet reads where "absent" would not
                    if s.is_dir() and not any(s.iterdir()):
                        _sh.rmtree(s, ignore_errors=True)
        hdr = parse.with_header(batch_df)
        hdr = hdr.withColumn(
            "tokens_bin", parse.pack_tokens_udf()(F.col("tokens")))
        hdr = hdr.withColumn(
            "rows_table_id",
            F.when(F.col("sink").isin(*ROWS_SINKS + ("TABLE_MAP",)),
                   layout.u48le(F.col("tokens"), 19)))
        hdr = hdr.withColumn("input_partition", F.spark_partition_id())
        hdr = hdr.withColumn("input_pos", F.monotonically_increasing_id())
        hdr = hdr.withColumn("salt", route.salt_expr())
        routed_batch = str(out / "routed" / f"batch={batch_id}")
        (hdr.select(*ROUTED_COLS).write.mode("overwrite")
            .partitionBy("sink").parquet(routed_batch))

        # incremental cumulative dim: previous snapshot ∪ this batch's
        # decoded TableMaps, latest-wins per (source, table_id). The
        # window is THE shared pipeline key (log_pos desc, doc_id desc —
        # enrich.pipeline_table_map_window), identical to the batch
        # route-stage pre-decode dedup, so an exact log_pos collision with
        # differing payloads picks the SAME winner in both DAGs.
        batch_routed = spark.read.option(
            "basePath", str(out / "routed")).parquet(routed_batch)
        schema, factory = parse.DECODERS["TABLE_MAP"]
        cand = (batch_routed.filter(F.col("sink") == "TABLE_MAP")
                .withColumn("d", factory()(F.col("tokens_bin")))
                .select("source", "log_pos", "doc_id", "d.*")
                .filter(F.col("parse_error").isNull())
                .select("source", "log_pos", "doc_id", "table_id",
                        "schema_name", "table_name", "column_count",
                        "columns_type", "null_bits"))
        dim_root = out / "table_map_dim"
        prior = [int(p.name[2:]) for p in dim_root.glob("v=*")
                 if p.name[2:].isdigit() and int(p.name[2:]) < batch_id]
        if prior:
            prev = spark.read.parquet(str(dim_root / f"v={max(prior)}"))
            cand = prev.unionByName(cand)
        w = enrich.pipeline_table_map_window()
        snap = (cand.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn"))
        snap_path = str(dim_root / f"v={batch_id}")
        snap.write.mode("overwrite").parquet(snap_path)
        dim = spark.read.parquet(snap_path).drop("doc_id")
        # retention: a long-running stream would otherwise accumulate one
        # snapshot dir per micro-batch. Keep the current one plus the two
        # newest predecessors — Structured Streaming replays at most the
        # last uncommitted batch, and its rebuild reads only max(v<N).
        import shutil as _sh
        for k in sorted(prior)[:-2]:
            _sh.rmtree(dim_root / f"v={k}", ignore_errors=True)

        # which sinks this batch produced is filesystem metadata (the
        # routed batch write is partitioned by sink) — list the sink=*
        # directory names (scheme-aware) instead of re-scanning the batch
        present = list_sink_partitions(spark, routed_batch)
        base_cols = ["doc_id", "n_tok", "source", "timestamp", "event_type",
                     "server_id", "event_size", "log_pos", "flags",
                     "checksum"]
        for sink in sorted(present):
            sink_df = batch_routed.filter(F.col("sink") == sink)
            if sink in ROWS_SINKS:
                n_images = 2 if sink == "UPDATE_ROWS_V2" else 1
                sink_df = sink_df.withColumnRenamed("rows_table_id",
                                                    "table_id")
                joined = enrich.enrich_rows_events(sink_df, dim)
                dec = joined.withColumn(
                    "d", parse.make_rows_udf(n_images)(
                        F.col("tokens_bin"), F.col("columns_type")))
                dec = dec.select(*base_cols, "tm_schema_name",
                                 "tm_table_name", "d.*")
            elif sink in parse.DECODERS:
                schema, factory = parse.DECODERS[sink]
                dec = sink_df.withColumn(
                    "d", factory()(F.col("tokens_bin")))
                dec = dec.select(*base_cols, "d.*")
            else:
                dec = sink_df.select(*base_cols, "tokens_bin")
            dec.write.mode("overwrite").parquet(
                str(out / "sinks" / sink / f"batch={batch_id}"))

    q = (read_stream(spark, input_dir, max_files_per_trigger, input_format)
         .writeStream.foreachBatch(process)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
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
