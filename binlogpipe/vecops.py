"""Similarity search over the `embeddings` table (array<float>, 64-dim).

Brute-force cosine top-k is the baseline (exact); a sign-bit LSH-bucketed
variant is the scale path (candidates only within a hash bucket — an
equi-join, never a full cross product). Dot products use built-in
`zip_with`/`aggregate` lambda expressions — JVM-side, codegen'd, no Python.
Floats are cast to double *before* any arithmetic so the DuckDB oracle
(double math over the same float32 parquet values) is bit-compatible;
similarities are rounded to 6 dp to wash out any residual FP noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
       "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
NORM = ("sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")


def _cosine(a: str, b: str) -> str:
    return (f"({DOT.format(a=a, b=b)}) / "
            f"(({NORM.format(a=a)}) * ({NORM.format(a=b)}))")


def cosine_topk(emb: DataFrame, k: int = 5, n_queries: int = 10) -> DataFrame:
    """Exact brute-force top-k cosine neighbors for the first `n_queries`
    vectors. The query side is broadcast (tiny), so the scan side streams
    once with no shuffle of the big table."""
    q = (emb.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")))
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", F.expr(_cosine("qv", "cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
        .orderBy("query_id", "rank")
    )


def signbit_lsh_ann(emb: DataFrame, bits: int = 4, k: int = 3) -> DataFrame:
    """LSH-bucketed ANN: bucket = sign bits of the first `bits` dimensions
    (deterministic hyperplanes = coordinate axes), then exact top-k cosine
    within each bucket. At 100 TB the bucket key is the shuffle key; buckets
    are bounded and the per-bucket join is local."""
    bucket = None
    for j in range(bits):
        bit = F.when(F.element_at("embedding", j + 1) >= 0, 1).otherwise(0)
        bucket = bit if bucket is None else bucket * 2 + bit
    e = emb.withColumn("bucket", bucket)
    a = e.select("bucket", F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qv"))
    b = e.select("bucket", F.col("vec_id").alias("neighbor_id"),
                 F.col("embedding").alias("cv"))
    scored = (
        a.join(b, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.expr(_cosine("qv", "cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
        .orderBy("query_id", "rank")
    )


def ivf_ann(emb: DataFrame, n_centroids: int = 8, k: int = 3,
            n_queries: int = 20) -> DataFrame:
    """IVF-style ANN: deterministic coarse quantizer (the first
    `n_centroids` vectors serve as centroids), every vector is assigned to
    its nearest centroid (inverted list), and each query searches only its
    own list (nprobe=1). At scale the centroid assignment is a map-only
    pass over broadcast centroid literals and the search is an equi-join on
    centroid id — the big table never cross-joins."""
    centroids = (emb.where(F.col("vec_id") < n_centroids)
                 .select("vec_id", "embedding")
                 .orderBy("vec_id").collect())

    def centroid_expr(col: str):
        # argmax over inlined centroid literals: cosine(col, c_i)
        best_id, best_sim = None, None
        for crow in centroids:
            lit = "array(" + ",".join(
                f"CAST({float(x)} AS DOUBLE)" for x in crow["embedding"]) + ")"
            sim = F.expr(_cosine(col, lit))
            if best_id is None:
                best_id, best_sim = F.lit(crow["vec_id"]), sim
            else:
                cond = sim > best_sim
                best_id = F.when(cond, crow["vec_id"]).otherwise(best_id)
                best_sim = F.when(cond, sim).otherwise(best_sim)
        return best_id

    assigned = emb.withColumn("centroid", centroid_expr("embedding"))
    q = (assigned.where(F.col("vec_id") < n_queries)
         .select("centroid", F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qv")))
    c = assigned.select("centroid", F.col("vec_id").alias("neighbor_id"),
                        F.col("embedding").alias("cv"))
    scored = (c.join(F.broadcast(q), "centroid")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("sim", F.expr(_cosine("qv", "cv"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id",
                    F.round("sim", 6).alias("sim"))
            .orderBy("query_id", "rank"))


def cosine_neardup_pairs(emb: DataFrame, threshold: float = 0.35,
                         bits: int = 2) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-prefiltered: only pairs sharing
    a sign-bit bucket are scored (recall trades with `bits`)."""
    bucket = None
    for j in range(bits):
        bit = F.when(F.element_at("embedding", j + 1) >= 0, 1).otherwise(0)
        bucket = bit if bucket is None else bucket * 2 + bit
    e = emb.withColumn("bucket", bucket)
    a = e.select("bucket", F.col("vec_id").alias("vec_a"),
                 F.col("embedding").alias("va"))
    b = e.select("bucket", F.col("vec_id").alias("vec_b"),
                 F.col("embedding").alias("vb"))
    return (
        a.join(b, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("sim", F.round(F.expr(_cosine("va", "vb")), 6))
        .where(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", "sim")
        .orderBy("vec_a", "vec_b")
    )
