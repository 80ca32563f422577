"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched Pandas UDFs.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_media`` produces a deterministic fake feature vector derived from
the raw bytes, clearly marked; swap `_fake_decode` for a real
PIL/torchaudio call in production — the Spark-side contract (schema,
partitioning, mapInPandas batch shape) is real and tested.

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
