"""Driver-style correctness harness: run every `queries()` entry in Spark
and its `oracle_sql()` in DuckDB on the same sf0.01 tables, then compare
row count + sorted-column values exactly (the driver hash-compares values
after sorting columns by name — exact equality is the bar)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_cell(x):
        if isinstance(x, bool):
            return int(x)
        if isinstance(x, float):
            if math.isnan(x):
                return "NaN"
            return x
        return x

    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(map(repr, t)))


ORACLES = entry_mod.oracle_sql()
ALL_QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    q = ALL_QUERIES[name]
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    sc, sr = _normalize(s_cols, s_rows)
    dc, dr = _normalize(d_cols, d_rows)
    assert sc == dc, f"{name}: column sets differ: {sc} vs {dc}"
    assert len(sr) == len(dr), f"{name}: row counts {len(sr)} vs {len(dr)}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


def test_rows_only_queries_run(spark):
    """Queries without oracles must still run and return stable schemas."""
    for name in sorted(set(ALL_QUERIES) - set(ORACLES)):
        df = ALL_QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() == 18


def test_oracle_u64_wraps_like_spark(duck):
    """_u(off, 8) must wrap two's-complement like np_codec.u64 — the naive
    unsigned BIGINT sum hard-errors in DuckDB for any top-bit-set value."""
    import __spark_entry__ as E
    from binlogpipe import np_codec as c

    payload = bytes(19) + (0xFEDCBA9876543210).to_bytes(8, "little")
    toks = list(payload)
    (got,) = duck.execute(
        f"SELECT {E._u(19, 8)} FROM (SELECT ? AS tokens)", [toks]).fetchone()
    want, _ = c.u64(payload, 19)
    assert got == want == 0xFEDCBA9876543210 - (1 << 64)
