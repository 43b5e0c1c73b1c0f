"""Fixture generator: reference binlog files -> pipeline input table.

Test-side only (stdlib + pyarrow, no Spark). Walks each
`/root/reference/tests/events/<fixture>/log.bin`: skips the 4-byte magic
(`crates/old/src/events/mod.rs:83-85`), then repeatedly reads the 19-byte
fixed header (`mod.rs:52-81`) and steps by its `event_size` field —
exactly the reference's `many1(Event::parse)` framing (`mod.rs:419-422`)
without decoding payloads.

Emits the contract input table (FIXTURES.md §1):
  doc_id:string = "<fixture>/<event_idx>"
  tokens:array<int32> = event bytes (header ‖ payload ‖ checksum)
  n_tok:int32, source:string = fixture dir name

Also provides deterministic scale-up synthesis for benchmarks: events are
replicated with seeded rewrites of the timestamp/server_id/log_pos header
bytes only (payload untouched, so per-type decode goldens still hold) and
fresh doc_ids; the skewed event-type distribution is preserved
(BASELINE.md §2 note).
"""

from __future__ import annotations

import argparse
import struct
from collections import Counter
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF_EVENTS = Path("/root/reference/tests/events")
MAGIC = b"\xfebin"
HEADER_LEN = 19


def split_binlog(path: Path) -> list[bytes]:
    """One .bin file -> list of raw event byte strings."""
    data = path.read_bytes()
    if not data.startswith(MAGIC):
        raise ValueError(f"{path}: missing binlog magic")
    events, off = [], len(MAGIC)
    while off < len(data):
        if off + HEADER_LEN > len(data):
            raise ValueError(f"{path}: trailing garbage at {off}")
        (event_size,) = struct.unpack_from("<I", data, off + 9)
        if event_size < HEADER_LEN or off + event_size > len(data):
            raise ValueError(f"{path}: bad event_size {event_size} at {off}")
        events.append(data[off:off + event_size])
        off += event_size
    return events


def load_fixture_events() -> list[tuple[str, str, bytes]]:
    """[(doc_id, source, event_bytes)] over all 16 fixtures, file order."""
    rows = []
    for d in sorted(REF_EVENTS.iterdir()):
        bin_path = d / "log.bin"
        if not bin_path.exists():
            continue
        for idx, ev in enumerate(split_binlog(bin_path)):
            rows.append((f"{d.name}/{idx}", d.name, ev))
    return rows


def rows_to_table(rows: list[tuple[str, str, bytes]]) -> pa.Table:
    doc_ids = [r[0] for r in rows]
    sources = [r[1] for r in rows]
    tokens = [np.frombuffer(r[2], dtype=np.uint8).astype(np.int32) for r in rows]
    n_tok = [len(t) for t in tokens]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "tokens": pa.array([t.tolist() for t in tokens], pa.list_(pa.int32())),
            "n_tok": pa.array(n_tok, pa.int32()),
            "source": pa.array(sources, pa.string()),
        }
    )


def write_synth_parquet(path: Path, factor: int, seed: int = 42,
                        row_group_size: int = 25_000) -> int:
    """Deterministic scale-up: `factor` copies of every fixture event with
    seeded header perturbation (timestamp/server_id/log_pos bytes only —
    payloads untouched so per-type decode goldens hold; event-type skew
    preserved).

    Fully vectorized: one flat byte buffer of all replicas with patched
    header fields, turned into an Arrow list<int32> column zero-copy via
    (offsets, values)."""
    rows = load_fixture_events()
    rng = np.random.default_rng(seed)
    base_flat = np.frombuffer(b"".join(ev for _, _, ev in rows), np.uint8)
    lens = np.array([len(ev) for _, _, ev in rows], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    base_len = int(lens.sum())
    n_base = len(rows)
    n_total = n_base * factor

    flat = np.tile(base_flat, factor).astype(np.int64)
    # per-replica random header fields, little-endian patched in bulk
    ev_starts = (np.tile(starts, factor)
                 + np.repeat(np.arange(factor, dtype=np.int64), n_base) * base_len)
    for field_off, vals in (
        (0, rng.integers(0, 2**31, n_total, dtype=np.int64)),    # timestamp
        (5, rng.integers(1, 2**31, n_total, dtype=np.int64)),    # server_id
        (13, rng.integers(4, 2**31, n_total, dtype=np.int64)),   # log_pos
    ):
        for k in range(4):
            flat[ev_starts + field_off + k] = (vals >> (8 * k)) & 0xFF

    all_lens = np.tile(lens, factor)
    offsets = np.concatenate(([0], np.cumsum(all_lens))).astype(np.int64)
    tokens_col = pa.LargeListArray.from_arrays(
        pa.array(offsets), pa.array(flat.astype(np.int32)))
    tokens_col = tokens_col.cast(pa.list_(pa.int32()))

    srcs = [src for _, src, _ in rows]
    base_ids = [doc_id for doc_id, _, _ in rows]  # "<fixture>/<event_idx>"
    doc_ids = [f"{base_ids[j]}/r{rep}"
               for rep in range(factor) for j in range(n_base)]
    source_col = pa.DictionaryArray.from_arrays(
        pa.array(np.tile(np.arange(n_base, dtype=np.int32), factor)),
        pa.array(srcs)).cast(pa.string())
    table = pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "tokens": tokens_col,
        "n_tok": pa.array(all_lens.astype(np.int32)),
        "source": source_col,
    })
    pq.write_table(table, path, row_group_size=row_group_size)
    return n_total


def golden_sink_counts(rows) -> Counter:
    from binlogpipe.layout import EVENT_TYPES, QUARANTINE_SINK

    c: Counter = Counter()
    for _, _, ev in rows:
        c[EVENT_TYPES.get(ev[4], QUARANTINE_SINK)] += 1
    return c


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/data/fixture_events.parquet")
    ap.add_argument("--synth-out", default=None,
                    help="also write a scaled-up parquet here")
    ap.add_argument("--factor", type=int, default=1000)
    args = ap.parse_args()

    rows = load_fixture_events()
    table = rows_to_table(rows)
    pq.write_table(table, args.out)
    counts = golden_sink_counts(rows)
    print(f"wrote {table.num_rows} events from {len(set(r[1] for r in rows))} "
          f"fixtures to {args.out}")
    for k, v in counts.most_common():
        print(f"  {k}: {v}")
    if args.synth_out:
        n = write_synth_parquet(Path(args.synth_out), args.factor)
        print(f"wrote {n} synthesized events to {args.synth_out}")


if __name__ == "__main__":
    main()
