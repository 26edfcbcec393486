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


def _splitmix(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (uint64 wraps like C)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = x * np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x = x * np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _payload_seeds(payloads: list) -> np.ndarray:
    """One uint64 seed per payload, fully vectorized: the byte streams are
    concatenated once, position-weighted, and reduced per row with
    ``np.add.reduceat`` — no per-row Python in the numeric work (same
    pattern as the simhash bit-vote UDF). None ⇒ seed 0 (masked upstream).
    """
    n = len(payloads)
    lens = np.array([0 if p is None else len(p) for p in payloads], dtype=np.int64)
    seeds = np.zeros(n, dtype=np.uint64)
    nz = np.flatnonzero(lens > 0)
    if len(nz):
        flat = np.frombuffer(
            b"".join(payloads[i] for i in nz), dtype=np.uint8
        ).astype(np.uint64)
        starts = np.zeros(len(nz), dtype=np.int64)
        np.cumsum(lens[nz][:-1], out=starts[1:])
        pos = np.arange(len(flat), dtype=np.uint64) - np.repeat(
            starts, lens[nz]
        ).astype(np.uint64)
        contrib = (flat + np.uint64(1)) * _splitmix(pos)
        seeds[nz] = _splitmix(
            np.add.reduceat(contrib, starts) + lens[nz].astype(np.uint64)
        )
    return seeds


def _fake_features_batch(
    seeds: np.ndarray, n_frames: np.ndarray, dim: int = FEATURE_DIM
) -> np.ndarray:
    """(N, dim) float32 frame-mean features: per (row, frame) a
    deterministic unit-norm vector expanded from the row seed, averaged
    over that row's first ``n_frames`` frames. One numpy pipeline over the
    whole (N, max_frames, dim) block — zero per-row Python."""
    n = len(seeds)
    fmax = int(n_frames.max()) if n else 1
    lane = _splitmix(np.arange(fmax * dim, dtype=np.uint64) + np.uint64(1))
    x = _splitmix(seeds[:, None, None] ^ lane.reshape(1, fmax, dim))
    v = (x >> np.uint64(11)).astype(np.float64) / float(1 << 53) - 0.5
    norms = np.linalg.norm(v, axis=2, keepdims=True)
    unit = v / np.where(norms == 0.0, 1.0, norms)
    mask = (np.arange(fmax)[None, :, None] < n_frames[:, None, None])
    mean = unit.sum(axis=1, where=mask) / np.maximum(n_frames, 1)[:, None]
    return mean.astype(np.float32)


def extract_features(
    media: DataFrame,
    *,
    frames_per_video: int = 4,
    real_codecs: bool = False,
) -> DataFrame:
    """Decode → feature-extract over mapInPandas (Arrow batches).

    real_codecs=True is the integration point for actual PIL/ffmpeg decode —
    deliberately NotImplemented in this container. The deterministic fake
    codec is vectorized end-to-end (segmented byte hash + splitmix lane
    expansion, all numpy over the Arrow batch), so the bench cost of this
    operator measures the plumbing, not a Python loop.
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
            payloads = [
                bytes(p) if p is not None else None for p in pdf["payload"]
            ]
            mtypes = pd.Series(
                [m["media_type"] if m is not None else None for m in pdf["meta"]],
                index=pdf.index, dtype=object,
            )
            ok = np.array([p is not None for p in payloads], dtype=bool)
            n_frames = np.where(
                ok & (mtypes == "video").to_numpy(dtype=bool),
                frames_per_video,
                np.where(ok, 1, 0),
            ).astype(np.int64)
            feats_arr = _fake_features_batch(
                _payload_seeds(payloads), np.maximum(n_frames, 1)
            )
            feats = [
                feats_arr[i].tolist() if ok[i] else None for i in range(len(pdf))
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": mtypes,
                    "feature": feats,
                    "frames_sampled": n_frames,
                    "decode_ok": ok,
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
