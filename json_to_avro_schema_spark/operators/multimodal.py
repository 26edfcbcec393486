"""Multimodal (image/audio/video) column handling.

Media payloads are opaque ``binary`` columns with a typed metadata struct —
the Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec step is STUBBED because
image/audio libraries are not in this container:

* ``decode_media`` raises ``NotImplementedError`` when ``real_codecs=True``;
* with the default deterministic fake, "decoding" derives reproducible
  features from the bytes themselves (hash-seeded), so downstream operators
  (resize plumbing, frame sampling, feature joins) are exercised end-to-end.

All media processing goes through ``mapInPandas`` — Arrow batches, zero
per-row Python.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),    # image|audio|video
        T.StructField("format", T.StringType()),        # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

FEATURE_DIM = 16

_FEATURES_OUT = (
    "media_ref string, media_type string, feature array<float>, "
    "frames_sampled int, decode_ok boolean"
)


def synthesize_media_table(spark, n: int = 1000, *, seed: int = 42) -> DataFrame:
    """Deterministic fake media rows matching MEDIA_SCHEMA (payload bytes are
    a hash-derived prefix; metadata consistent with the bytes)."""
    h = F.xxhash64(F.col("id"), F.lit(seed))
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(h, 3) + 1).cast("int"),
    )
    fmt = F.when(mt == "image", "png").when(mt == "audio", "wav").otherwise("mp4")
    payload = F.encode(F.format_string("payload-%016x", h), "utf-8")
    return spark.range(n).select(
        F.format_string("m-%08d", F.col("id").cast("int")).alias("media_ref"),
        payload.alias("payload"),
        F.struct(
            mt.alias("media_type"),
            fmt.alias("format"),
            F.when(mt == "image", (F.pmod(h, 1920) + 1).cast("int")).alias("width"),
            F.when(mt == "image", (F.pmod(h, 1080) + 1).cast("int")).alias("height"),
            F.when(mt != "image", F.pmod(h, 600_000)).alias("duration_ms"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic unit-norm 'embedding' from the payload bytes (sha256
    expansion) — the stand-in for a real encoder."""
    d = hashlib.sha256(payload).digest()
    raw = np.frombuffer((d * ((dim * 4) // len(d) + 1))[: dim * 4], dtype=np.uint32)
    v = raw.astype(np.float64) / 2**32 - 0.5
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def extract_features(
    media: DataFrame,
    *,
    frames_per_video: int = 4,
    real_codecs: bool = False,
) -> DataFrame:
    """Decode → feature-extract over mapInPandas (Arrow batches).

    real_codecs=True is the integration point for actual PIL/ffmpeg decode —
    deliberately NotImplemented in this container.
    """
    if real_codecs:
        raise NotImplementedError(
            "real image/audio/video codecs are not available in this "
            "environment; run with real_codecs=False for the deterministic "
            "fake-decode path (plumbing is identical)"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats, frames, oks = [], [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                if payload is None:
                    feats.append(None)
                    frames.append(0)
                    oks.append(False)
                    continue
                mt = meta["media_type"] if meta is not None else None
                n_frames = frames_per_video if mt == "video" else 1
                # frame sampling: feature = mean of per-frame fake features
                fs = [
                    _fake_feature(bytes(payload) + i.to_bytes(2, "big"))
                    for i in range(n_frames)
                ]
                feats.append(np.mean(fs, axis=0).astype(np.float32).tolist())
                frames.append(n_frames)
                oks.append(True)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": [m["media_type"] if m is not None else None for m in pdf["meta"]],
                    "feature": feats,
                    "frames_sampled": frames,
                    "decode_ok": oks,
                }
            )

    return media.mapInPandas(run, schema=_FEATURES_OUT)


def resize_plan(media: DataFrame, *, max_px: int = 512) -> DataFrame:
    """Pure-Column resize planning (no decode needed): target dims preserving
    aspect ratio, capped at max_px — metadata-only, runs at full scan speed."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(float(max_px)) / F.greatest(w, F.lit(1)),
        F.lit(float(max_px)) / F.greatest(h, F.lit(1)),
        F.lit(1.0),
    )
    # floor(x + 0.5) == HALF_UP for positive dims, and (unlike round())
    # evaluates identically across engines — the IEEE formula is the same
    # everywhere, so an external SQL oracle reproduces it bit-for-bit
    return media.filter(F.col("meta.media_type") == "image").select(
        "media_ref",
        w.alias("width"),
        h.alias("height"),
        F.floor(w * scale + 0.5).cast("int").alias("target_width"),
        F.floor(h * scale + 0.5).cast("int").alias("target_height"),
        (scale < 1.0).alias("needs_resize"),
    )
