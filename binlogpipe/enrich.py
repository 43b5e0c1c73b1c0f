"""Enrich stage: TableMap dictionary build + broadcast lookup join.

Replaces the reference's cross-event mutable state — the global
``TABLE_MAP: HashMap<table_id, Vec<ColTypes>>`` written by the TableMap
parser and read by the rows parsers
(`/root/reference/crates/old/src/events/mod.rs:23-26, 999-1001,
1244-1250`) — with an explicit dataflow edge: a two-pass broadcast join
(SURVEY §4 "Cross-event mutable state").

Semantic note (SURVEY §7.3 hard #2): the reference resolves each rows event
against the *latest preceding* TableMap in file order. Every fixture has at
most one TableMap per table_id per source, so a plain broadcast join is
exact; when that is violated the builder keeps the latest-by-log_pos entry
per (source, table_id), with payload-field tie-breaks so the winner is
deterministic across runs even on exact log_pos collisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pipeline_table_map_window(table_id_col: str = "table_id"):
    """THE authoritative latest-wins ordering for the pipeline TableMap
    dimension: (log_pos desc, doc_id desc) per (source, table_id).

    Both DAGs must use this one window or an exact log_pos collision with
    differing payloads deterministically picks DIFFERENT winners, silently
    breaking batch/stream parity: the batch pipeline dedups BEFORE
    decoding (job.py route stage — payload fields don't exist yet, so the
    key must come from pre-decode columns), and the streaming snapshot
    (streaming.run_full_available_now) merges prev-snapshot ∪ batch rows.
    doc_id is present and unique on both sides, which makes the winner
    deterministic everywhere."""
    return Window.partitionBy("source", table_id_col).orderBy(
        F.col("log_pos").desc(), F.col("doc_id").desc())


def latest_table_map_window():
    """Deterministic ordering for build_table_map_dim's standalone use
    (inputs that may carry duplicated DECODED TableMaps without a doc_id
    column, e.g. the bl_enrich_dim oracle query): log_pos desc, then the
    FULL payload as tie-breaks — the JSON rendering of
    (columns_type, null_bits) closes the case of rows that tie on every
    name/count field but differ in column types, which previously left
    row_number's winner arbitrary per run. The oracle's dedup orders by
    the name/count keys only, which is parity-safe: candidates still tied
    there agree on every field the oracle projects. Inside the pipeline
    this window is a no-op — both DAGs have already deduped with
    pipeline_table_map_window, the authoritative key."""
    return Window.partitionBy("source", "table_id").orderBy(
        F.col("log_pos").desc(), F.col("schema_name"), F.col("table_name"),
        F.col("column_count"),
        F.to_json(F.struct(F.col("columns_type"), F.col("null_bits"))))


def build_table_map_dim(table_map_decoded: DataFrame) -> DataFrame:
    """Decoded TABLE_MAP sink rows -> broadcastable dimension.

    Input must carry: source, log_pos, table_id, schema_name, table_name,
    column_count, columns_type, null_bits.
    Output: one row per (source, table_id), latest by log_pos; ties broken
    on payload fields so row_number's winner is deterministic (duplicated
    ingests of the same event tie on IDENTICAL rows, which is harmless).
    """
    w = latest_table_map_window()
    return (
        table_map_decoded
        .select("source", "log_pos", "table_id", "schema_name", "table_name",
                "column_count", "columns_type", "null_bits")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def enrich_rows_events(rows_df: DataFrame, dim: DataFrame) -> DataFrame:
    """Broadcast-join rows events with their column layout.

    `rows_df` must carry `source` and a JVM-computed `table_id` (u48 at
    byte offset 19, mod.rs:1182-1186). Left join: rows with no dictionary
    entry keep NULL columns_type and are quarantined by the decoder
    (the reference would panic on the missing-entry unwrap, mod.rs:1248).
    """
    d = dim.select(
        "source",
        F.col("table_id").alias("tm_table_id"),
        F.col("schema_name").alias("tm_schema_name"),
        F.col("table_name").alias("tm_table_name"),
        "columns_type",
    )
    return rows_df.join(
        F.broadcast(d),
        on=[rows_df["source"] == d["source"],
            rows_df["table_id"] == d["tm_table_id"]],
        how="left",
    ).drop(d["source"]).drop("tm_table_id")
