"""Multimodal columns: opaque `binary` payloads + typed metadata, with real
decode / feature-extract / resize / frame-sample over `mapInPandas`.

Codecs are stdlib/numpy-pure (no PIL/libav in this container, none needed):

- image  -> BMP, 24 bpp uncompressed (BITMAPFILEHEADER + BITMAPINFOHEADER,
  the 54-byte layout every BMP reader parses). Rows are written bottom-up
  per the spec; pixel statistics are order-free so decode just takes the
  pixel array.
- audio  -> WAV PCM16 mono 8 kHz via the stdlib `wave` module (both encode
  and decode go through `wave`, so the RIFF framing is real).
- video  -> `BVID`, a documented synthetic frame container (magic + u8
  n_frames/w/h + grayscale frames): stands in for a real codec so the
  frame-sample path (decode N, sample k evenly) is exercised end-to-end.

Feature math is integer-exact on both engines: decode yields integer
pixels/samples, stats come from BIGINT sum and sum-of-squares with the SAME
two floating divisions on each side, so the DuckDB oracle reproduces
feat_mean/feat_std bit-for-bit — deliberately NO rounding (see _stats:
Python rounds half-even, DuckDB half-away, so rounding would reintroduce
divergence). The content
digest is sha256 over the DECODED integer csv — content-level identity that
survives container/codec differences, which is the dedup semantics a
training pipeline actually wants.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
    T.StructField("meta_width", T.IntegerType()),
    T.StructField("meta_height", T.IntegerType()),
    T.StructField("meta_duration_ms", T.IntegerType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_digest", T.StringType()),
    T.StructField("feat_mean", T.DoubleType()),
    T.StructField("feat_std", T.DoubleType()),
    T.StructField("n_frames_sampled", T.IntegerType()),
])

# synthetic-table geometry (shared with the DuckDB oracle's replication)
IMG_W, IMG_H = 16, 8                  # 16*3 = 48 B/row -> no BMP row padding
AUDIO_SAMPLES, AUDIO_RATE = 400, 8000
VID_FRAMES, VID_W, VID_H = 6, 8, 8
FRAMES_SAMPLED = 4


# ---------------------------------------------------------------------------
# encoders (real container formats)
# ---------------------------------------------------------------------------

def encode_bmp(pixels: bytes, w: int, h: int) -> bytes:
    """24bpp uncompressed BMP. `pixels` is h*w*3 BGR bytes, top row first;
    rows are stored bottom-up per the format. Row stride must be a multiple
    of 4 (callers use w with w*3 % 4 == 0, e.g. 16)."""
    stride = w * 3
    if stride % 4:
        raise ValueError("row stride must be 4-aligned for this encoder")
    data = b"".join(
        pixels[(h - 1 - y) * stride:(h - y) * stride] for y in range(h))
    size = 54 + len(data)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> tuple[bytes, int, int]:
    """Parse the 54-byte header, return (pixel bytes bottom-up, w, |h|).

    Handles the two spec cases our encoder never emits but real BMPs do:
    per-row padding when the stride isn't 4-aligned (padding bytes are
    stripped, not counted as pixels), and top-down storage (negative
    biHeight — rows are reversed so the returned bytes are ALWAYS in
    bottom-up convention, which decode_real then un-reverses)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    habs = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    # fail loudly on truncated/degenerate payloads (same policy as
    # decode_bvid): a silently short pixel buffer feeds wrong-but-clean
    # stats downstream
    if w <= 0 or habs <= 0:
        raise ValueError(f"degenerate BMP geometry {w}x{h}")
    rows = [payload[off + y * stride:off + y * stride + w * 3]
            for y in range(habs)]
    if any(len(r) != w * 3 for r in rows):
        raise ValueError(
            f"truncated BMP: {w}x{habs}x24bpp needs "
            f"{off + (habs - 1) * stride + w * 3} bytes, have {len(payload)}")
    if h < 0:  # top-down storage -> normalize to bottom-up
        rows.reverse()
    return b"".join(rows), w, habs


def encode_wav(samples: list[int], rate: int = AUDIO_RATE) -> bytes:
    """PCM16 mono WAV via the stdlib wave module."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> list[int]:
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2 or f.getnchannels() != 1:
            raise ValueError("expected PCM16 mono")
        n = f.getnframes()
        raw = f.readframes(n)
    if len(raw) != n * 2:
        # the wave module silently returns what's present — a data chunk
        # shorter than the header's frame count must fail loudly
        raise ValueError(f"truncated WAV: header claims {n} frames, "
                         f"data has {len(raw) // 2}")
    return list(struct.unpack(f"<{len(raw) // 2}h", raw))


def encode_bvid(frames: list[bytes], w: int, h: int) -> bytes:
    """BVID synthetic frame container: 'BVID' + u8 n_frames + u8 w + u8 h +
    n_frames grayscale frames of w*h bytes."""
    return b"BVID" + bytes([len(frames), w, h]) + b"".join(frames)


def decode_bvid(payload: bytes) -> tuple[list[bytes], int, int]:
    if payload[:4] != b"BVID":
        raise ValueError("not a BVID payload")
    n, w, h = payload[4], payload[5], payload[6]
    fs = w * h
    frames = [payload[7 + i * fs:7 + (i + 1) * fs] for i in range(n)]
    if any(len(f) != fs for f in frames):
        raise ValueError("truncated BVID frames")
    return frames, w, h


def sample_frames(frames: list[bytes], k: int) -> list[bytes]:
    """Evenly-spaced frame sampling: indices floor(i*n/k), i in 0..k-1."""
    n = len(frames)
    if n <= k:
        return frames
    return [frames[(i * n) // k] for i in range(k)]


def decode_real(payload: bytes, kind: str,
                frames_per_video: int = FRAMES_SAMPLED) -> tuple[list[int], int]:
    """Decode a payload to (integer content values, n_frames_sampled).
    image -> pixel bytes; audio -> PCM16 samples; video -> bytes of
    `frames_per_video` evenly-sampled frames."""
    payload = bytes(payload)
    if kind == "image":
        px, w, h = decode_bmp(payload)
        # un-reverse the bottom-up row storage: content identity must be
        # over the IMAGE (top-down), not the container's row order
        stride = w * 3
        top_down = b"".join(
            px[(h - 1 - y) * stride:(h - y) * stride] for y in range(h))
        return list(top_down), 1
    if kind == "audio":
        return decode_wav(payload), 1
    if kind == "video":
        frames, _, _ = decode_bvid(payload)
        picked = sample_frames(frames, frames_per_video)
        return [b for f in picked for b in f], len(picked)
    raise ValueError(f"unknown media kind {kind!r}")


# ---------------------------------------------------------------------------
# synthetic media table (deterministic from the documents table)
# ---------------------------------------------------------------------------

def _codes(text: str) -> list[int]:
    """Character codes & 255 (the oracle mirrors with ascii(ch) % 256)."""
    return [ord(c) & 255 for c in text] or [0]


def synth_payload(doc_id: int, text: str) -> tuple[str, bytes]:
    """Deterministic real-container payload for one document."""
    codes = _codes(text)
    n = len(codes)
    kind = ("image", "audio", "video")[doc_id % 3]
    if kind == "image":
        px = bytes(codes[i % n] for i in range(IMG_W * IMG_H * 3))
        return kind, encode_bmp(px, IMG_W, IMG_H)
    if kind == "audio":
        samples = [(codes[i % n] - 128) * 231 for i in range(AUDIO_SAMPLES)]
        return kind, encode_wav(samples)
    frames = [
        bytes((codes[(f * 7 + j) % n] + f) % 256 for j in range(VID_W * VID_H))
        for f in range(VID_FRAMES)
    ]
    return kind, encode_bvid(frames, VID_W, VID_H)


def synth_media_df(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table with REAL encoded payloads
    (BMP/WAV/BVID), derived from the documents table — stands in for an
    object-store table of encoded blobs."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            media_id, kinds, payloads = [], [], []
            widths, heights, durations = [], [], []
            for did, text in zip(b["doc_id"], b["text"]):
                kind, payload = synth_payload(int(did), text)
                media_id.append(int(did))
                kinds.append(kind)
                payloads.append(payload)
                widths.append(IMG_W if kind == "image" else
                              VID_W if kind == "video" else 0)
                heights.append(IMG_H if kind == "image" else
                               VID_H if kind == "video" else 0)
                durations.append(
                    1000 * AUDIO_SAMPLES // AUDIO_RATE if kind == "audio"
                    else VID_FRAMES * 40 if kind == "video" else 0)
            yield pd.DataFrame({
                "media_id": media_id, "kind": kinds, "payload": payloads,
                "meta_width": widths, "meta_height": heights,
                "meta_duration_ms": durations,
            })

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# feature extraction / resize
# ---------------------------------------------------------------------------

def _stats(ints: list[int]) -> tuple[float, float]:
    """Integer-exact sums, then the SAME floating ops the oracle performs —
    bit-identical doubles across engines, so NO rounding (rounding would
    reintroduce divergence: Python rounds half-even, DuckDB half-away)."""
    n = len(ints)
    if n == 0:
        return 0.0, 0.0
    s = sum(ints)
    q = sum(v * v for v in ints)
    mean = s / n
    var = max(0.0, q / n - mean * mean)
    return mean, var ** 0.5


def feature_extract(media: DataFrame,
                    frames_per_video: int = FRAMES_SAMPLED,
                    ordered: bool = False) -> DataFrame:
    """mapInPandas feature extraction: real decode per kind, integer-exact
    stats, content digest over the decoded csv. Repartitions by media_id so
    batches are balanced at scale. `ordered=True` adds the oracle-compare
    sort; scale callers keep the default sort-free plan."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            cols: dict[str, list] = {f.name: [] for f in FEATURE_SCHEMA.fields}
            for r in b.itertuples(index=False):
                payload = bytes(r.payload)
                ints, n_sampled = decode_real(payload, r.kind,
                                              frames_per_video)
                mean, std = _stats(ints)
                csv = ",".join(map(str, ints))
                cols["media_id"].append(r.media_id)
                cols["kind"].append(r.kind)
                cols["n_bytes"].append(len(payload))
                cols["content_digest"].append(
                    hashlib.sha256(csv.encode()).hexdigest()[:16])
                cols["feat_mean"].append(mean)
                cols["feat_std"].append(std)
                cols["n_frames_sampled"].append(n_sampled)
            yield pd.DataFrame(cols)

    out = media.repartition("media_id").mapInPandas(gen, FEATURE_SCHEMA)
    return out.orderBy("media_id") if ordered else out


RESIZE_SCHEMA = T.StructType(
    MEDIA_SCHEMA.fields + [T.StructField("resize_status", T.StringType())])


def resize_images(media: DataFrame, factor: int = 2) -> DataFrame:
    """Nearest-neighbor integer downscale of BMP image payloads (other
    kinds pass through). Re-encodes a real BMP at w/factor x h/factor —
    the distributed shape of a preprocessing stage: binary in, binary out,
    no driver involvement.

    A row that cannot be resized (non-image kind, undecodable payload,
    source width < 4) passes through UNCHANGED with the reason in
    `resize_status` — one bad image is data, not a stage failure
    (quarantine-not-panic, same policy as the event decoders). The BMP
    encoder requires a 4-byte row stride (nw*3 % 4 == 0), so the target
    width is aligned DOWN to a multiple of 4; when that changes the naive
    w//factor width, the adjustment is surfaced as
    `width_aligned:<naive>-><actual>` instead of silently resizing to a
    different geometry."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = b.copy()
            payloads, widths, heights, status = [], [], [], []
            for r in b.itertuples(index=False):
                if r.kind != "image":
                    payloads.append(bytes(r.payload))
                    widths.append(r.meta_width)
                    heights.append(r.meta_height)
                    status.append(f"passthrough:kind={r.kind}")
                    continue
                try:
                    px, w, h = decode_bmp(bytes(r.payload))
                    # decode_bmp returns BOTTOM-UP rows (container order);
                    # the sampling below and encode_bmp both speak
                    # top-row-first — without this normalization every
                    # resized image came out vertically flipped
                    stride0 = w * 3
                    px = b"".join(
                        px[(h - 1 - y) * stride0:(h - y) * stride0]
                        for y in range(h))
                    if w < 4:
                        raise ValueError(
                            f"source width {w} < 4 — cannot produce a "
                            f"4-aligned-stride BMP")
                    naive = max(1, w // factor)
                    nh = max(1, h // factor)
                    nw = max(4, naive - naive % 4)
                    rows = []
                    for y in range(nh):
                        sy = min(h - 1, y * factor)
                        row = bytearray()
                        for x in range(nw):
                            sx = min(w - 1, x * factor)
                            o = (sy * w + sx) * 3
                            row += px[o:o + 3]
                        rows.append(bytes(row))
                    payloads.append(encode_bmp(b"".join(rows), nw, nh))
                    widths.append(nw)
                    heights.append(nh)
                    status.append(None if nw == naive
                                  else f"width_aligned:{naive}->{nw}")
                except Exception as e:  # noqa: BLE001 — passthrough, don't
                    # fail the whole Spark stage on one bad payload
                    payloads.append(bytes(r.payload))
                    widths.append(r.meta_width)
                    heights.append(r.meta_height)
                    status.append(f"error:{type(e).__name__}: {e}")
            out["payload"] = payloads
            out["meta_width"] = widths
            out["meta_height"] = heights
            out["resize_status"] = status
            yield out

    return media.mapInPandas(gen, RESIZE_SCHEMA)
