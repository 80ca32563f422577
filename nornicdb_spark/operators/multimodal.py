"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched Pandas UDFs.

Two decode tiers:

- ``extract_features`` — generic feature extraction whose decoder is
  STUBBED (no PIL/torchaudio in this container): deterministic
  byte-histogram moments stand in for a real decoder; the Spark-side
  contract (schema, partitioning, mapInPandas batch shape) is real.
- ``decode_media`` — a REAL pure-stdlib decode path for the two formats
  simple enough to parse without libraries: PCM WAV (RIFF chunk walk +
  int16 sample scan) and binary P6 PPM (header tokenizer + raster scan).
  ``synthesize_encoded_media`` writes genuinely-encoded fixtures whose
  every decoded field is a closed form of doc_id, so a SQL oracle checks
  the encode→decode loop end-to-end.

Schema convention:
    media(doc_id long, media_type string, content binary,
          meta struct<width int, height int, duration_ms int>)
Feature extraction returns (doc_id, media_type, n_bytes, features
array<float>) — FEATURE_DIM-dim, batch-vectorized via numpy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

MEDIA_SCHEMA = (
    "doc_id long, media_type string, content binary, "
    "meta struct<width: int, height: int, duration_ms: int>"
)

FEATURE_SCHEMA = "doc_id long, media_type string, n_bytes long, features array<float>"

_HAVE_REAL_DECODERS = False
try:  # real decoders, absent in this container — plumbing gated cleanly
    import PIL.Image  # noqa: F401

    _HAVE_REAL_DECODERS = True
except ImportError:
    pass


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table from the documents fixture: the text
    bytes stand in for encoded media; media_type cycles by id."""
    mtype = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        (F.length(text_col) % 640 + 1).cast("int").alias("width"),
        (F.length(text_col) % 480 + 1).cast("int").alias("height"),
        (F.length(text_col) * 10).cast("int").alias("duration_ms"),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        mtype.alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        meta.alias("meta"),
    )


def extract_features(media: DataFrame, use_real_decoders: bool | None = None) -> DataFrame:
    """Batch feature extraction over the binary column via mapInPandas —
    one Arrow batch in, one out; no per-row Python crossing.

    The decode is a STUB: deterministic byte-histogram moments stand in
    for a real decoder. The batch function is deliberately self-contained
    (imports + constants inside the closure): executor Python workers must
    not need ``nornicdb_spark`` importable — the driver may run from any
    cwd without shipping the package via addPyFile."""
    if use_real_decoders is None:
        use_real_decoders = _HAVE_REAL_DECODERS
    if use_real_decoders and not _HAVE_REAL_DECODERS:
        raise NotImplementedError(
            "real media decoders (PIL/torchaudio) are not installed; "
            "run with use_real_decoders=False for the deterministic stub"
        )

    feature_dim = FEATURE_DIM

    def batches(it):
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            out = _np.zeros((len(pdf), feature_dim), dtype="float32")
            for i, blob in enumerate(pdf["content"]):
                arr = _np.frombuffer(bytes(blob), dtype="uint8").astype("float64")
                if arr.size == 0:
                    continue
                out[i] = [
                    arr.mean(),
                    arr.std(),
                    arr.min(),
                    arr.max(),
                    float(arr.size % 251),
                    arr[:16].mean() if arr.size >= 16 else arr.mean(),
                    float((arr > 96).mean()),
                    float((arr % 7).mean()),
                ]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "features": list(out),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, sample_rate long, "
    "channels long, n_samples long, duration_ms long, width long, "
    "height long, maxval long, val_sum long, val_peak long"
)


def synthesize_encoded_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Genuinely-ENCODED media fixtures: even doc_ids become a canonical
    44-byte-header PCM16 WAV, odd doc_ids a binary P6 PPM. All synthesis
    parameters (sample rate, channel count, frame count, image dims,
    sample/pixel values) are closed forms of doc_id, so an independent SQL
    oracle can recompute every field :func:`decode_media` extracts —
    including the exact encoded byte length — without parsing bytes.
    Returns (doc_id, media_type, content binary)."""

    def batches(it):
        import struct as _struct

        import pandas as _pd

        def wav(d):
            sr = 8000 + (d % 3) * 4000
            ch = 1 + (d % 2)
            n = (50 + (d % 100)) * ch
            samples = [((d * 31 + i * 7) % 2048) - 1024 for i in range(n)]
            data = _struct.pack("<%dh" % n, *samples)
            return (
                b"RIFF" + _struct.pack("<I", 36 + len(data)) + b"WAVE"
                + _struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, sr, sr * ch * 2, ch * 2, 16)
                + b"data" + _struct.pack("<I", len(data)) + data
            )

        def ppm(d):
            w, h = 4 + d % 13, 3 + d % 11
            raster = bytes((d * 7 + i * 5) % 256 for i in range(3 * w * h))
            return b"P6\n%d %d\n255\n" % (w, h) + raster

        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield _pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": ["audio" if d % 2 == 0 else "image" for d in ids],
                    "content": [wav(d) if d % 2 == 0 else ppm(d) for d in ids],
                }
            )

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        batches, schema="doc_id long, media_type string, content binary"
    )


def decode_media(media: DataFrame) -> DataFrame:
    """REAL decode of the binary column — no stub, no external libs:

    - ``audio`` rows are parsed as RIFF/WAVE (chunk walk to ``fmt `` and
      ``data``, little-endian int16 PCM sample scan),
    - ``image`` rows as binary P6 PPM (whitespace/comment-tolerant header
      tokenizer, then the raster).

    Emits the header fields plus integer sample statistics (sum of
    absolute sample values / sum of raster bytes, and the peak) so the
    oracle comparison is float-free. One Arrow batch in/out via
    mapInPandas — the per-row byte parsing is the documented
    Python-unavoidable step; everything before and after stays JVM-side.
    Unknown/corrupt payloads raise rather than silently passing."""

    def batches(it):
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        def parse_wav(b):
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                raise ValueError("not a RIFF/WAVE payload")
            pos, fmt, data = 12, None, None
            while pos + 8 <= len(b):
                cid, sz = b[pos:pos + 4], _struct.unpack("<I", b[pos + 4:pos + 8])[0]
                body = b[pos + 8:pos + 8 + sz]
                if cid == b"fmt ":
                    fmt = _struct.unpack("<HHIIHH", body[:16])
                elif cid == b"data":
                    data = body
                pos += 8 + sz + (sz & 1)  # chunks are word-aligned
            if fmt is None or data is None:
                raise ValueError("missing fmt/data chunk")
            _, ch, sr, _, _, bits = fmt
            if bits != 16:
                raise ValueError(f"only PCM16 supported, got {bits}-bit")
            s = _np.abs(_np.frombuffer(data, dtype="<i2").astype("int64"))
            return {
                "sample_rate": sr, "channels": ch, "n_samples": s.size,
                "duration_ms": (s.size // ch) * 1000 // sr,
                "val_sum": int(s.sum()), "val_peak": int(s.max()) if s.size else 0,
            }

        def parse_ppm(b):
            toks, pos = [], 2
            if b[:2] != b"P6":
                raise ValueError("not a P6 PPM payload")
            while len(toks) < 3:
                while pos < len(b) and b[pos:pos + 1].isspace():
                    pos += 1
                if b[pos:pos + 1] == b"#":  # comment to end of line
                    while pos < len(b) and b[pos:pos + 1] != b"\n":
                        pos += 1
                    continue
                start = pos
                while pos < len(b) and not b[pos:pos + 1].isspace():
                    pos += 1
                toks.append(int(b[start:pos]))
            pos += 1  # single whitespace after maxval
            w, h, maxval = toks
            raster = _np.frombuffer(b[pos:pos + 3 * w * h], dtype="uint8").astype("int64")
            if raster.size != 3 * w * h:
                raise ValueError("truncated raster")
            return {
                "width": w, "height": h, "maxval": maxval,
                "val_sum": int(raster.sum()),
                "val_peak": int(raster.max()) if raster.size else 0,
            }

        cols = [
            "sample_rate", "channels", "n_samples", "duration_ms",
            "width", "height", "maxval", "val_sum", "val_peak",
        ]
        for pdf in it:
            rows = []
            for d, mt, blob in zip(pdf["doc_id"], pdf["media_type"], pdf["content"]):
                b = bytes(blob)
                got = parse_wav(b) if mt == "audio" else parse_ppm(b)
                rows.append(
                    {"doc_id": d, "media_type": mt, "n_bytes": len(b), **got}
                )
            out = _pd.DataFrame(rows)
            for c in cols:
                out[c] = _pd.array(
                    [r.get(c) for r in rows], dtype="Int64"
                )
            yield out[["doc_id", "media_type", "n_bytes"] + cols]

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def resize_plan(
    media: DataFrame, max_w: int = 224, max_h: int = 224
) -> DataFrame:
    """Aspect-preserving resize *plan* for image rows: target dimensions
    are pure column arithmetic over the metadata (scale = min(max_w/w,
    max_h/h, 1), floored, ≥1) — the decode+resample itself is the stubbed
    step behind ``extract_features``-style mapInPandas. Map-only; at
    100 TB this is metadata bookkeeping ahead of the expensive decode,
    letting the pipeline skip no-op resizes (scale = 1) before touching
    bytes. Returns (doc_id, width, height, target_w, target_h, skip)."""
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(float(max_w)) / w, F.lit(float(max_h)) / h, F.lit(1.0))
    tw = F.greatest(F.floor(w * scale), F.lit(1)).cast("long")
    th = F.greatest(F.floor(h * scale), F.lit(1)).cast("long")
    return (
        media.filter(F.col("media_type") == "image")
        .select(
            "doc_id",
            F.col("meta.width").cast("long").alias("width"),
            F.col("meta.height").cast("long").alias("height"),
            tw.alias("target_w"),
            th.alias("target_h"),
            (scale >= 1.0).alias("skip"),
        )
    )


def audio_window_plan(
    media: DataFrame, window_ms: int = 2000, stride_ms: int = 1000
) -> DataFrame:
    """Overlapping analysis windows per audio clip — the audio twin of
    frame sampling (windows feed the stubbed decode/feature step).
    Returns (doc_id, window_no, start_ms, end_ms)."""
    dur = F.col("meta.duration_ms")
    starts = F.sequence(
        F.lit(0),
        F.greatest(dur - 1 - ((dur - 1) % stride_ms), F.lit(0)),
        F.lit(stride_ms),
    )
    return (
        media.filter(F.col("media_type") == "audio")
        .select("doc_id", dur.alias("dur"), F.posexplode(starts).alias("window_no", "start_ms"))
        .select(
            "doc_id",
            F.col("window_no").cast("long").alias("window_no"),
            F.col("start_ms").cast("long").alias("start_ms"),
            F.least(F.col("start_ms") + window_ms, F.col("dur"))
            .cast("long")
            .alias("end_ms"),
        )
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame timestamp (the
    decode itself is the stubbed step). Shows the explode-then-decode
    partitioning shape: frames of one video land in one partition group."""
    frames = F.sequence(
        F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms)
    )
    return (
        media.filter(F.col("media_type") == "video")
        .select("doc_id", F.explode(frames).alias("frame_ms"))
    )
