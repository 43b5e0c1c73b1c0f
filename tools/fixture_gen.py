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


def synthesize(rows: list[tuple[str, str, bytes]], factor: int, seed: int = 42):
    """Deterministic scale-up: `factor` copies of every fixture event with
    seeded header perturbation (timestamp/server_id/log_pos only)."""
    rng = np.random.default_rng(seed)
    base = [(src, np.frombuffer(ev, np.uint8).copy()) for _, src, ev in rows]
    out_doc, out_src, out_tok = [], [], []
    for rep in range(factor):
        # one draw per (rep, event): cheap vectorized randoms
        ts_jit = rng.integers(0, 2**31, len(base), dtype=np.int64)
        sid = rng.integers(1, 2**31, len(base), dtype=np.int64)
        pos = rng.integers(4, 2**31, len(base), dtype=np.int64)
        for j, (src, ev) in enumerate(base):
            b = ev.copy()
            b[0:4] = np.frombuffer(struct.pack("<I", int(ts_jit[j])), np.uint8)
            b[5:9] = np.frombuffer(struct.pack("<I", int(sid[j])), np.uint8)
            b[13:17] = np.frombuffer(struct.pack("<I", int(pos[j])), np.uint8)
            out_doc.append(f"{src}/r{rep}/{j}")
            out_src.append(src)
            out_tok.append(b.astype(np.int32))
    return out_doc, out_src, out_tok


def write_synth_parquet(path: Path, factor: int, seed: int = 42,
                        row_group_size: int = 25_000) -> int:
    rows = load_fixture_events()
    doc, src, tok = synthesize(rows, factor, seed)
    table = pa.table(
        {
            "doc_id": pa.array(doc, pa.string()),
            "tokens": pa.array([t.tolist() for t in tok], pa.list_(pa.int32())),
            "n_tok": pa.array([len(t) for t in tok], pa.int32()),
            "source": pa.array(src, pa.string()),
        }
    )
    pq.write_table(table, path, row_group_size=row_group_size)
    return len(doc)


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
