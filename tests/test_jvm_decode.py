"""Parity pins for the Catalyst-expression decoders (binlogpipe/jvm_decode.py).

The JVM decoders replace the pandas-UDF decode for the eight fixed-layout
sinks (~62% of fixture rows) on the production decode stage; these tests
pin them to the Python decoders three ways:

1. corpus parity — every fixture + rare-event row, field-exact, both the
   packed-binary form (the routed table's) and the array<int> form (the
   oracle queries');
2. corrupt-buffer parity — every truncation length of a real event, plus
   seeded random buffers, must reproduce the scalar path's outputs AND its
   exact parse_error text ("ValueError: need 8 bytes at 19, have 23", ...);
   text-bearing regions draw printable ASCII (the documented U+FFFD
   granularity divergence only exists for invalid UTF-8, which no
   reference fixture or synth row contains);
3. plan shape — the decode projection for a JVM sink contains NO Python
   evaluation node.
"""
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from binlogpipe import jvm_decode, parse

SCALAR_FNS = {
    "GTID": parse._gtid_fields,
    "ANON_GTID": parse._gtid_fields,
    "XID": parse.decode_xid_py,
    "INTVAR": parse.decode_intvar_py,
    "RAND": parse.decode_rand_py,
    "ROTATE": parse.decode_rotate_py,
    "ROWS_QUERY": parse.decode_rows_query_py,
    "FORMAT_DESC": parse.decode_format_desc_py,
    "PREV_GTIDS": parse.decode_previous_gtids_py,
}

TEXT_SINKS = {"ROTATE", "ROWS_QUERY", "FORMAT_DESC"}


def _norm(v):
    if isinstance(v, list):
        return tuple(v)
    if isinstance(v, float) and v != v:  # _decode_frame nulls numeric
        return None                      # columns as NaN via pandas
    return v


def _scalar_rows(sink: str, bufs: list[bytes]) -> list[tuple]:
    schema, _ = parse.DECODERS[sink]
    names = [f.name for f in schema.fields]
    frame = parse._decode_frame(pd.Series(bufs, dtype=object), names,
                                SCALAR_FNS[sink], None)
    return [tuple(_norm(v) for v in row)
            for row in frame[names].itertuples(index=False, name=None)]


def _jvm_rows(spark, sink: str, bufs: list[bytes]) -> list[tuple]:
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(bufs)],
        "id long, tokens_bin binary").orderBy("id")
    out = df.select(*jvm_decode.JVM_DECODERS[sink](F.col("tokens_bin")))
    return [tuple(_norm(v) for v in row) for row in out.collect()]


def _corpus(spark, fixture_parquet, sink: str) -> list[bytes]:
    import __spark_entry__ as entry

    rows = []
    for path in (fixture_parquet, entry.RARE):
        df = parse.with_header(spark.read.parquet(path))
        rows += [bytes(r[0]) for r in
                 df.filter(F.col("sink") == sink).select("tokens").collect()]
    return rows


@pytest.mark.parametrize("sink", sorted(SCALAR_FNS))
def test_corpus_parity(spark, fixture_parquet, sink):
    bufs = _corpus(spark, fixture_parquet, sink)
    assert bufs, f"no {sink} rows in the corpus"
    assert _jvm_rows(spark, sink, bufs) == _scalar_rows(sink, bufs)


@pytest.mark.parametrize("sink", sorted(jvm_decode.ARRAY_SAFE))
def test_array_form_parity(spark, fixture_parquet, sink):
    """The oracle queries decode the pre-route array<int> form — it must
    match the packed-binary form field-for-field."""
    bufs = _corpus(spark, fixture_parquet, sink)
    df = spark.createDataFrame(
        [(i, list(b)) for i, b in enumerate(bufs)],
        "id long, tokens array<int>").orderBy("id")
    arr = df.select(
        *jvm_decode.JVM_DECODERS[sink](F.col("tokens"), form="arr"))
    got = [tuple(_norm(v) for v in row) for row in arr.collect()]
    assert got == _jvm_rows(spark, sink, bufs)


@pytest.mark.parametrize("sink", sorted(SCALAR_FNS))
def test_truncation_parity(spark, fixture_parquet, sink):
    """Every truncation of a real event must reproduce the scalar loop's
    row exactly — nulled fields AND the parse_error text (the scalar
    try/except's f"{type(e).__name__}: {e}"). PREV_GTIDS truncations stay
    >= 19 bytes: below the header length no buffer ever reaches a payload
    decoder (quarantined upstream), and its scalar path's negative-offset
    Python slice semantics are deliberately not replicated."""
    base = _corpus(spark, fixture_parquet, sink)[0]
    lo = 19 if sink == "PREV_GTIDS" else 0
    bufs = [base[:n] for n in range(lo, len(base) + 1)]
    bufs.append(base + b"\x07\x01")  # longer than nominal: trailing ignored
    assert _jvm_rows(spark, sink, bufs) == _scalar_rows(sink, bufs)


@pytest.mark.parametrize("sink", sorted(SCALAR_FNS))
def test_random_buffer_parity(spark, fixture_parquet, sink):
    """Seeded random buffers across the interesting length range. Text
    regions draw printable ASCII (see module docstring); numeric sinks
    draw fully random bytes — the GTID decimal uuid rendering, the i64
    wrap, and every guard boundary get hit."""
    rng = random.Random(0xB10C + len(sink))
    nominal = len(_corpus(spark, fixture_parquet, sink)[0])
    bufs = []
    for _ in range(120):
        n = rng.randrange(19 if sink == "PREV_GTIDS" else 0, nominal + 12)
        if sink in TEXT_SINKS:
            b = bytes(rng.randrange(0x20, 0x7F) for _ in range(n))
        else:
            b = bytes(rng.randrange(256) for _ in range(n))
        bufs.append(b)
    assert _jvm_rows(spark, sink, bufs) == _scalar_rows(sink, bufs)


def test_u64_wraps_to_i64(spark):
    """np_codec.u64 parity: a value >= 2**63 wraps two's-complement (the
    sink columns are LongType)."""
    buf = bytes(range(19)) + b"\xff" * 8 + b"\x00" * 4
    assert _jvm_rows(spark, "XID", [buf]) == [(-1, None)]
    buf2 = bytes(range(19)) + b"\x00" * 7 + b"\x80" + b"\x00" * 4
    assert _jvm_rows(spark, "XID", [buf2]) == [(-(2 ** 63), None)]


def test_decode_projection_is_jvm_only(spark, fixture_parquet, tmp_path,
                                       monkeypatch):
    """With the opt-in ON, the decode projection for a JVM sink crosses
    the bridge zero times — the property the A/B priced (it lost on this
    host, but the zero-crossing claim must stay true for the cluster
    scenario the opt-in exists for). The input is a parquet round-trip of
    the routed shape, like the real decode stage's scan of the routed
    table, so the plan carries no upstream pack UDF to confuse the
    assertion."""
    from binlogpipe import job

    monkeypatch.setenv("SPARK_GRAFT_JVM_DECODE", "1")

    hdr = parse.with_header(spark.read.parquet(fixture_parquet))
    hdr = hdr.withColumn(
        "tokens_bin", parse.pack_tokens_udf()(F.col("tokens")))
    routed_path = str(tmp_path / "routed")
    hdr.select(*job.DECODE_BASE_COLS, "sink", "tokens_bin").write.parquet(
        routed_path)
    routed = spark.read.parquet(routed_path)
    for sink in ("GTID", "XID", "FORMAT_DESC", "PREV_GTIDS"):
        dec = job.sink_decode_projection(
            sink, routed.filter(F.col("sink") == sink), None)
        dec.collect()  # finalize AQE so the executed plan is the real one
        plan = dec._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                       "FlatMapGroupsInPandas"):
            assert marker not in plan, f"{marker} in {sink} decode:\n{plan}"


def test_pipeline_flag_off_restores_pandas_path(spark, fixture_parquet,
                                                monkeypatch):
    """The two sink_decode_projection paths (opt-in Catalyst vs default
    pandas) must agree on the fixture corpus, flipped by the env flag."""
    from binlogpipe import job

    hdr = parse.with_header(spark.read.parquet(fixture_parquet))
    hdr = hdr.withColumn(
        "tokens_bin", parse.pack_tokens_udf()(F.col("tokens")))
    gtid = hdr.filter(F.col("sink") == "GTID")
    cols = ["doc_id"] + [f.name for f in parse.GTID_SCHEMA.fields]

    def run() -> list[tuple]:
        dec = job.sink_decode_projection("GTID", gtid, None)
        return sorted(tuple(r) for r in dec.select(*cols).collect())

    monkeypatch.setenv("SPARK_GRAFT_JVM_DECODE", "1")
    jvm_rows = run()
    monkeypatch.setenv("SPARK_GRAFT_JVM_DECODE", "0")
    pandas_rows = run()
    assert jvm_rows == pandas_rows and len(jvm_rows) == 32
