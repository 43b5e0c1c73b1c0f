"""Catalyst-expression twins of the fixed-layout payload decoders.

MEASURED NEGATIVE — default OFF (the third entry in the deleted-vs-
relocated-work series after the round-4 fuse and round-5 i8 pre-cast;
full numbers in BENCH/BASELINE.md "Round-6: Catalyst-expression decode").
Hypothesis: the decode stage's non-scaling term is the JVM<->Python
Arrow bridge (~0.6 GB/s per host regardless of core count), so decoding
fixed-layout event types as pure whole-stage-codegen'd column
expressions — zero Python crossing for ~62% of rows — should DELETE
bridge traffic rather than relocate it. Result (tools/jvm_decode_ab.py,
CPU-pinned interleaved cells, 3M events): the Catalyst path LOSES x1.30
at 1 core and x1.24 at 4 cores — decode-stage wall 119s vs 74-77s (1c),
37-39s vs 22-25s (4c). Per-byte access via ascii(substring(decode(...)))
allocates a UTF8String per byte read, while the pandas path decodes each
sink's whole Arrow batch with a handful of strided numpy views; the
vectorized-numpy work it would delete is CHEAPER per CPU-second than the
codegen'd string churn that replaces it, at every core budget, even with
the bridge transfer priced in (the bridge's bytes were already hidden by
pipeline overlap — same lesson as the fuse and i8 experiments). Kept as
an opt-in (SPARK_GRAFT_JVM_DECODE=1) with full parity pins because the
trade could invert on a cluster whose many concurrent decode jobs
contend for one host's bridge; the default stays the pandas decoders.

The eight decoders cover GTID/ANON_GTID, XID, INTVAR, RAND, ROTATE,
ROWS_QUERY, FORMAT_DESC and PREV_GTIDS — ~62% of all events in the
reference fixture distribution (BASELINE.md §2); QUERY (status-var walk),
USER_VAR (variant layouts), TABLE_MAP and the rows events have only the
vectorized pandas decoders in parse.py.

Parity contract (pinned by tests/test_jvm_decode.py):

- Byte-exact field parity with the parse.py decoders on every fixture and
  rare-event row, AND on truncated buffers of every length — including
  the exact `parse_error` text the scalar path's try/except produces
  ("ValueError: need 8 bytes at 19, have 23", "IndexError: index out of
  range", ...), derived here from the same offset arithmetic
  (np_codec._take / bytes.__getitem__ failure points).
- Known, documented divergence: Python decodes text lossily
  (errors="replace", one U+FFFD per invalid byte) while the JVM
  `decode(bin,'UTF-8')` uses java.nio REPLACE (one U+FFFD per malformed
  *sequence*). Identical on valid UTF-8 — which every reference fixture
  and every synth row is; the parity fuzz therefore draws text bytes from
  valid UTF-8. The scalar decoders in parse.py remain the semantic owner.

Two input forms, selected by `form`:
- "bin": the routed table's packed-binary `tokens_bin` (the production
  decode-stage path) — byte access via a latin-1 char view + ascii()
  codepoints (see _chars).
- "arr": the pre-route `tokens` array<int> column (the oracle queries'
  path in __spark_entry__) — byte access via element_at. Text-bearing
  decoders (ROTATE, ROWS_QUERY, FORMAT_DESC) are binary-only: there is no
  JVM array<int>->string conversion worth its cost (measured: the round-3
  JVM binary pack lost 1.7x to per-token UTF8String churn).

Reference layouts: crates/old/src/events/mod.rs (cited per decoder).
"""
from __future__ import annotations

import os
from decimal import Decimal

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

H = 19  # header length; payload offsets below are 0-based like parse.py,
#         converted to 1-based substring/element_at positions at the edge

_I64_MAX = 9223372036854775807
_U64_MOD = 18446744073709551616  # 2**64
_DEC20 = T.DecimalType(20, 0)
_DEC21 = T.DecimalType(21, 0)


def enabled() -> bool:
    """Feature flag, default OFF (measured x1.24-1.30 slower than the
    pandas decoders at pinned 1 and 4 cores — module docstring);
    SPARK_GRAFT_JVM_DECODE=1 opts in for A/B runs or bridge-contended
    cluster hosts."""
    return os.environ.get("SPARK_GRAFT_JVM_DECODE", "0") == "1"


# -- byte accessors ----------------------------------------------------------

def _len(col: Column, form: str) -> Column:
    return F.length(col) if form == "bin" else F.size(col)


def _chars(col: Column) -> Column:
    """Per-byte char view of a binary column: ISO-8859-1 maps every byte
    to exactly one char whose codepoint IS the byte value, so
    ascii(substring(chars, i, 1)) reads byte i-1 as an int with no hex
    string building or conv() re-parsing (the first cut used
    hex+conv per byte; ascii halved the decode-stage JVM cost).
    Catalyst's subexpression elimination evaluates the repeated decode()
    once per row inside the codegen'd projection."""
    return F.decode(col, "ISO-8859-1")


def _u8(col: Column, pos0: int, form: str) -> Column:
    if form == "arr":
        return F.element_at(col, pos0 + 1).cast("int")
    return F.ascii(F.substring(_chars(col), pos0 + 1, 1))


def _uint(col: Column, pos0: int, nbytes: int, form: str) -> Column:
    """Little-endian unsigned int of up to 7 bytes (max 2**56-1 — long
    arithmetic can never overflow, ANSI-safe)."""
    v = _u8(col, pos0, form).cast("long")
    for k in range(1, nbytes):
        v = v + _u8(col, pos0 + k, form).cast("long") * (1 << (8 * k))
    return v


def _u64_i64(col: Column, pos0: int, form: str) -> Column:
    """u64 LE wrapped two's-complement to i64 — np_codec.u64 parity (the
    sink columns are LongType; >= 2**63 wraps negative). The low 7 bytes
    stay in exact long arithmetic; only the top byte's 2**56 shift needs
    DECIMAL (2**64 exceeds both a long and py4j's literal range, hence
    the BigDecimal literals) — no ANSI overflow anywhere."""
    lo = _uint(col, pos0, 7, form)
    hi = _u8(col, pos0 + 7, form)
    u = (lo.cast(_DEC20)
         + hi.cast(_DEC20) * F.lit(Decimal(1 << 56)).cast(_DEC20))
    return (F.when(u > F.lit(_I64_MAX).cast(_DEC20),
                   (u - F.lit(Decimal(_U64_MOD)).cast(_DEC21)))
            .otherwise(u)).cast("long")


def _byte_dec(col: Column, pos0: int, n: int, form: str) -> Column:
    """Per-byte *decimal* concat (np_codec.byte_decimal_concat — the
    reference's GTID uuid rendering, mod.rs:1067-1097): bytes [1, 44]
    render "144", NOT hex."""
    return F.concat(*[_u8(col, pos0 + k, form).cast("string")
                      for k in range(n)])


def _utf8(col: Column, pos1: Column | int, length: Column | int) -> Column:
    """Lossy UTF-8 decode of a binary slice (1-based pos). java.nio
    REPLACE semantics — see the module docstring's divergence note."""
    return F.decode(F.substring(col, pos1, length), "UTF-8")


def _need(nbytes: int, at: int, ln: Column) -> Column:
    """The exact np_codec._take underflow message."""
    return F.concat(F.lit(f"ValueError: need {nbytes} bytes at {at}, have "),
                    ln.cast("string"))


# lazy: F.lit needs an active SparkContext, which imports must not assume
def _idx_err() -> Column:
    return F.lit("IndexError: index out of range")  # bytes.__getitem__


def _null_str() -> Column:
    return F.lit(None).cast("string")


def _guarded(ok: Column, err: Column, fields: list[tuple[str, Column]],
             ) -> list[Column]:
    """Schema-ordered output: every field nulled unless `ok` (the scalar
    path's try/except nulls ALL fields of an errored row), parse_error
    last (its when-chain returns null on ok rows)."""
    return ([F.when(ok, expr).alias(name) for name, expr in fields]
            + [err.alias("parse_error")])


# -- decoders (each returns columns in the sink schema's order) --------------

def gtid_cols(col: Column, form: str = "bin") -> list[Column]:
    """GTID/AnonymousGtid, fixed 65-byte layout (parse_events_gtid,
    mod.rs:1063-1114): flag + 16B sid + 8B txn + ts_type + 2x i64.
    Failure points of parse._gtid_fields in offset order: buf[44]
    (IndexError) then i64 at 45 and 53 (_take ValueError)."""
    ln = _len(col, form)
    ok = ln >= 61
    err = (F.when(ln < 45, _idx_err())
           .when(ln < 53, _need(8, 45, ln))
           .when(ln < 61, _need(8, 53, ln))
           .otherwise(_null_str()))
    source_id = F.concat_ws("-", _byte_dec(col, 20, 4, form),
                            _byte_dec(col, 24, 2, form),
                            _byte_dec(col, 26, 2, form),
                            _byte_dec(col, 28, 2, form),
                            _byte_dec(col, 30, 6, form))
    return _guarded(ok, err, [
        ("rbr_only", _u8(col, 19, form) == 0),
        ("source_id", source_id),
        ("transaction_id", _byte_dec(col, 36, 8, form)),
        ("ts_type", _u8(col, 44, form)),
        ("last_committed", _u64_i64(col, 45, form)),
        ("sequence_number", _u64_i64(col, 53, form)),
    ])


def xid_cols(col: Column, form: str = "bin") -> list[Column]:
    """Xid (mod.rs:884-894): one u64 at the header edge."""
    ln = _len(col, form)
    ok = ln >= 27
    err = F.when(~ok, _need(8, 19, ln)).otherwise(_null_str())
    return _guarded(ok, err, [("xid", _u64_i64(col, 19, form))])


def intvar_cols(col: Column, form: str = "bin") -> list[Column]:
    """IntVar (mod.rs:537-554): type byte + u64. Scalar failure order:
    buf[19] IndexError, then the bad-type ValueError (decode_intvar_py
    raises BEFORE reading the value), then the value-read underflow."""
    ln = _len(col, form)
    t = _u8(col, 19, form)
    ok = (ln >= 28) & t.isin(0, 1, 2)
    err = (F.when(ln < 20, _idx_err())
           .when(~t.isin(0, 1, 2),
                 F.concat(F.lit("ValueError: bad intvar type "),
                          t.cast("string")))
           .when(ln < 28, _need(8, 20, ln))
           .otherwise(_null_str()))
    e_type = (F.when(t == 0, "InvalidIntEvent")
              .when(t == 1, "LastInsertIdEvent")
              .otherwise("InsertIdEvent"))
    return _guarded(ok, err, [("e_type", e_type),
                              ("value", _u64_i64(col, 20, form))])


def rand_cols(col: Column, form: str = "bin") -> list[Column]:
    """Rand (mod.rs:773-784): two u64 seeds."""
    ln = _len(col, form)
    ok = ln >= 35
    err = (F.when(ln < 27, _need(8, 19, ln))
           .when(ln < 35, _need(8, 27, ln))
           .otherwise(_null_str()))
    return _guarded(ok, err, [("seed1", _u64_i64(col, 19, form)),
                              ("seed2", _u64_i64(col, 27, form))])


def rotate_cols(col: Column, form: str = "bin") -> list[Column]:
    """Rotate (mod.rs:521-535): u64 position + name to the checksum edge
    (str_len = len-19-8-4; a 27..30-byte event yields the scalar path's
    empty string, greatest(...,0) mirrors the negative-length slice)."""
    if form != "bin":
        raise ValueError("rotate_cols decodes text: binary form only")
    ln = _len(col, form)
    ok = ln >= 27
    err = F.when(~ok, _need(8, 19, ln)).otherwise(_null_str())
    return _guarded(ok, err, [
        ("position", _u64_i64(col, 19, form)),
        ("next_binlog", _utf8(col, 28, F.greatest(ln - 31, F.lit(0)))),
    ])


def rows_query_cols(col: Column, form: str = "bin") -> list[Column]:
    """RowsQuery (mod.rs:1048-1061): length byte + text; a length byte
    larger than the row remainder truncates at the row end (substring
    clamps exactly like the scalar slice)."""
    if form != "bin":
        raise ValueError("rows_query_cols decodes text: binary form only")
    ln = _len(col, form)
    ok = ln >= 20
    err = F.when(~ok, _idx_err()).otherwise(_null_str())
    qlen = _u8(col, 19, form)
    return _guarded(ok, err, [
        ("length", qlen),
        ("query_text", _utf8(col, 21, qlen)),
    ])


def format_desc_cols(col: Column, form: str = "bin") -> list[Column]:
    """FormatDescription (mod.rs:860-882): u16 version, 50-byte
    NUL-trimmed server version, u32 create_ts, header length byte,
    per-type header lengths array, checksum_alg byte. Scalar failure
    order: u16 at 19, u32 at 71, buf[75] IndexError, then
    decode_format_desc_py's own too-short guard (num < 0)."""
    if form != "bin":
        raise ValueError("format_desc_cols decodes text: binary form only")
    ln = _len(col, form)
    ok = ln >= 81
    err = (F.when(ln < 21, _need(2, 19, ln))
           .when(ln < 75, _need(4, 71, ln))
           .when(ln < 76, _idx_err())
           .when(ln < 81, F.concat(
               F.lit("ValueError: format_desc event too short ("),
               ln.cast("string"), F.lit(" bytes)")))
           .otherwise(_null_str()))
    # extract_string: trim at first NUL byte, then decode — for valid
    # UTF-8 a NUL byte is always the NUL char, so decode-then-trim is
    # byte-identical (locate() counts chars, but no multibyte sequence
    # contains 0x00)
    raw = _utf8(col, 22, F.lit(50))
    nul = F.locate("\x00", raw)
    server_version = F.when(nul > 0, F.substring(raw, 1, nul - 1)
                            ).otherwise(raw)
    num = ln - 81  # supported-types byte count (0-based 76 .. 76+num)
    supported = F.when(num > 0, F.transform(
        F.sequence(F.lit(77), F.lit(76) + num),
        lambda p: F.ascii(F.substring(_chars(col), p, 1)),
    )).otherwise(F.expr("cast(array() as array<int>)"))
    return _guarded(ok, err, [
        ("binlog_version", _uint(col, 19, 2, form).cast("int")),
        ("mysql_server_version", server_version),
        ("create_timestamp", _uint(col, 71, 4, form)),
        ("event_header_length", _u8(col, 75, form)),
        ("supported_types", supported),
        ("checksum_alg", _u8_at(col, F.lit(76) + num)),
    ])


def prev_gtids_cols(col: Column, form: str = "bin") -> list[Column]:
    """PreviousGtids (mod.rs:1164-1177): raw byte array + trailing u32.
    decode_previous_gtids_py never raises for ln >= 19 (short slices give
    an empty set and the u32 reads inside the header) — parse_error stays
    null and the arithmetic mirrors n = ln - 27 exactly."""
    if form != "bin":
        raise ValueError("prev_gtids_cols: binary form only (array field)")
    ln = _len(col, form)
    n = ln - 27
    sets = F.when(n > 0, F.transform(
        F.sequence(F.lit(20), F.lit(19) + n),
        lambda p: F.ascii(F.substring(_chars(col), p, 1)),
    )).otherwise(F.expr("cast(array() as array<int>)"))
    buf_size = _u32_at(col, ln - 8)
    return [sets.alias("gtid_sets"), buf_size.alias("buf_size"),
            _null_str().alias("parse_error")]


def _u8_at(col: Column, pos0: Column) -> Column:
    """u8 at a *dynamic* 0-based offset (binary form)."""
    return F.ascii(F.substring(_chars(col), pos0 + 1, 1))


def _u32_at(col: Column, pos0: Column) -> Column:
    """u32 LE at a *dynamic* 0-based offset (binary form)."""
    v = _u8_at(col, pos0).cast("long")
    for k in (1, 2, 3):
        v = v + _u8_at(col, pos0 + k).cast("long") * (1 << (8 * k))
    return v


# sinks whose JVM decoder accepts the array<int> form (no text fields)
ARRAY_SAFE = frozenset({"GTID", "ANON_GTID", "XID", "INTVAR", "RAND"})

JVM_DECODERS = {
    "GTID": gtid_cols,
    "ANON_GTID": gtid_cols,
    "XID": xid_cols,
    "INTVAR": intvar_cols,
    "RAND": rand_cols,
    "ROTATE": rotate_cols,
    "ROWS_QUERY": rows_query_cols,
    "FORMAT_DESC": format_desc_cols,
    "PREV_GTIDS": prev_gtids_cols,
}
