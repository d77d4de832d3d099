"""Multimodal columns: opaque ``binary`` payloads + typed metadata structs,
processed with Arrow-batched ``mapInPandas`` kernels.

Pattern (BASELINE.json mandate): image/audio/video ride through the lake as
``binary`` columns next to a metadata struct; decode / feature-extract /
resize / frame-sample run as Pandas UDF stages so the heavy per-byte work is
vectorized numpy over Arrow batches — never row-at-a-time Python.

The actual image codec is STUBBED: this container has no PIL/opencv, so
``decode_payload`` uses a clearly-marked deterministic fake (bytes ->
uint8 grid) and raises ``NotImplementedError`` if a real codec is requested.
Everything Spark-side — schemas, UDF signatures, Arrow batch iteration,
partition behavior — is real and tested; swapping in a real codec changes
one function.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_FIELDS = "meta struct<width: int, height: int, channels: int, format: string>"

IMAGE_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, "
    "mean_byte double, std_byte double, edge_density double"
)


def attach_fake_image_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministically synthesize a binary 'image' column from text bytes
    (test/fixture path — real pipelines read payloads from the lake).
    Width is derived from payload length; metadata struct carries it."""
    payload = F.col(text_col).cast("binary")
    n = F.length(payload)
    width = F.greatest(F.floor(F.sqrt(n)).cast("int"), F.lit(1))
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            width.alias("width"),
            F.greatest((n / F.greatest(width, F.lit(1))).cast("int"), F.lit(1)).alias("height"),
            F.lit(1).alias("channels"),
            F.lit("fake/raw").alias("format"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, width: int, height: int, fmt: str = "fake/raw") -> np.ndarray:
    """STUB decode: real codecs are unavailable in this environment.

    ``fake/raw`` interprets the payload bytes as a row-major uint8 grid
    (truncated/padded to width*height) — deterministic, so every downstream
    stage is testable.  Any other format raises, loudly.
    """
    if fmt != "fake/raw":
        raise NotImplementedError(
            f"real image codec for format={fmt!r} is stubbed in this environment; "
            "plug PIL/opencv into decode_payload"
        )
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    if arr.size < need:
        arr = np.pad(arr, (0, need - arr.size))
    return arr[:need].reshape(height, width)


def image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode + feature-extract per image: byte stats and a gradient-based
    edge density.  One Arrow batch in, one numpy loop per batch (the loop is
    per-image because widths vary; all per-pixel math is vectorized)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = row.meta
                img = decode_payload(
                    bytes(row.payload), meta["width"], meta["height"], meta["format"]
                ).astype(np.float64)
                gx = np.abs(np.diff(img, axis=1)).mean() if img.shape[1] > 1 else 0.0
                gy = np.abs(np.diff(img, axis=0)).mean() if img.shape[0] > 1 else 0.0
                out.append(
                    (
                        getattr(row, id_col),
                        len(row.payload),
                        meta["width"],
                        meta["height"],
                        round(float(img.mean()), 6),
                        round(float(img.std()), 6),
                        round(float(gx + gy), 6),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    id_col, "n_bytes", "width", "height",
                    "mean_byte", "std_byte", "edge_density",
                ],
            )

    return df.mapInPandas(extract, IMAGE_FEATURE_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int, id_col: str = "doc_id") -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h); emits the resized payload
    with updated metadata.  Same Arrow-batch shape as a real resize stage."""
    schema = f"{id_col} long, payload binary, {META_FIELDS}"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for row in pdf.itertuples(index=False):
                meta = row.meta
                img = decode_payload(
                    bytes(row.payload), meta["width"], meta["height"], meta["format"]
                )
                ys = (np.arange(out_h) * img.shape[0] // out_h).clip(0, img.shape[0] - 1)
                xs = (np.arange(out_w) * img.shape[1] // out_w).clip(0, img.shape[1] - 1)
                resized = img[np.ix_(ys, xs)]
                ids.append(getattr(row, id_col))
                payloads.append(resized.tobytes())
                metas.append(
                    {"width": out_w, "height": out_h, "channels": 1, "format": "fake/raw"}
                )
            yield pd.DataFrame({id_col: ids, "payload": payloads, "meta": metas})

    return df.mapInPandas(resize, schema)


def frame_sample(
    df: DataFrame, every_k: int = 4, frame_bytes: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """Video-style frame sampling: treat the payload as consecutive
    ``frame_bytes`` chunks, keep every k-th chunk — pure Spark array ops
    (no UDF needed for the slicing itself)."""
    n_frames = F.floor(F.length("payload") / frame_bytes).cast("int")
    frame_idx = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: (i % every_k == 0) & (n_frames > 0),
    )
    return df.select(
        F.col(id_col),
        F.explode(frame_idx).alias("frame_no"),
        F.expr(f"substring(payload, frame_no * {frame_bytes} + 1, {frame_bytes})").alias(
            "frame_payload"
        ),
    )


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, n_samples long, sample_rate int, n_windows int, "
    "rms double, peak double, zero_cross_rate double"
)


def attach_fake_audio_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", sample_rate: int = 16_000
) -> DataFrame:
    """Deterministically synthesize a binary 'audio' column (16-bit PCM)
    from text bytes — fixture path, same role as the fake image payload."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(sample_rate).alias("sample_rate"),
            F.lit(1).alias("channels"),
            F.lit("fake/pcm16").alias("codec"),
        ).alias("meta"),
    )


def decode_audio(payload: bytes, codec: str = "fake/pcm16") -> np.ndarray:
    """STUB audio decode: real codecs (ffmpeg/soundfile) are unavailable.

    ``fake/pcm16`` interprets the payload as little-endian int16 samples
    (odd trailing byte dropped) normalized to [-1, 1).  Any other codec
    raises, loudly — same contract as the image stub."""
    if codec != "fake/pcm16":
        raise NotImplementedError(
            f"real audio codec for codec={codec!r} is stubbed in this environment; "
            "plug ffmpeg/soundfile into decode_audio"
        )
    usable = len(payload) - (len(payload) % 2)
    samples = np.frombuffer(payload[:usable], dtype="<i2")
    return samples.astype(np.float64) / 32768.0


def audio_features(
    df: DataFrame, window: int = 400, id_col: str = "doc_id"
) -> DataFrame:
    """Decode + per-clip audio features: RMS energy, peak amplitude, and
    zero-crossing rate (the standard cheap speech/music discriminators),
    plus the whole-clip window count at ``window`` samples per frame.
    Arrow-batched mapInPandas; per-clip loop (variable lengths), all
    per-sample math vectorized — mirror of ``image_features``."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                x = decode_audio(bytes(row.payload), row.meta["codec"])
                n = x.size
                if n == 0:
                    out.append((getattr(row, id_col), 0, row.meta["sample_rate"], 0, 0.0, 0.0, 0.0))
                    continue
                zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
                out.append(
                    (
                        getattr(row, id_col),
                        n,
                        row.meta["sample_rate"],
                        int(np.ceil(n / window)),
                        round(float(np.sqrt(np.mean(x * x))), 6),
                        round(float(np.abs(x).max()), 6),
                        round(zc, 6),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    id_col, "n_samples", "sample_rate", "n_windows",
                    "rms", "peak", "zero_cross_rate",
                ],
            )

    return df.mapInPandas(extract, AUDIO_FEATURE_SCHEMA)
