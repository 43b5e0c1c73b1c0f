"""Aggregate stage: per-sink counts + per-(source, event_type) token stats.

The reference's only aggregate is the `bcrab desc` event count + first
FormatDesc summary (`cli.rs:143-161`); at pipeline scale this becomes
native groupBy aggregations (map-side partial aggregation, no UDFs) whose
per-sink counts must match BASELINE.md §2 exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sink_counts(routed_df: DataFrame) -> DataFrame:
    return routed_df.groupBy("sink").agg(F.count("*").alias("n")).orderBy("sink")


def source_type_stats(routed_df: DataFrame) -> DataFrame:
    """Per-(source, sink): count + n_tok statistics (SURVEY §2.5 aggregate)."""
    return (
        routed_df.groupBy("source", "sink")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_tok").alias("sum_tok"),
            F.min("n_tok").alias("min_tok"),
            F.max("n_tok").alias("max_tok"),
            F.round(F.avg("n_tok"), 4).alias("avg_tok"),
        )
        .orderBy("source", "sink")
    )


def desc_report(routed_df: DataFrame, format_desc_decoded: DataFrame) -> DataFrame:
    """`bcrab desc` analog (cli.rs:143-161): total events + first
    FormatDesc (by log_pos) per source.

    Callers pass DECODED (parse_error-free) FormatDesc rows — a corrupt
    first FD must not win the window and report null fields while a later
    valid one exists. Payload fields join the ordering as tie-breaks so a
    log_pos collision picks a deterministic winner (same approach as the
    enrich dim; duplicated ingests tie on identical rows, harmless)."""
    totals = routed_df.groupBy("source").agg(F.count("*").alias("n_events"))
    first_fd = (
        format_desc_decoded
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("source").orderBy(
                "log_pos", "binlog_version", "mysql_server_version",
                "create_timestamp")),
        )
        .filter(F.col("_rn") == 1)
        .select("source", "binlog_version", "mysql_server_version",
                "create_timestamp")
    )
    return totals.join(first_fd, "source", "left").orderBy("source")
