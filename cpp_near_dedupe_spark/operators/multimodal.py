"""Multimodal (binary-payload) column plumbing.

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata, processed per Arrow batch with ``mapInPandas`` — the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested; the actual
media decode is stubbed because no image/audio libraries exist in this
container. ``decode_stub=True`` (default) emits deterministic pseudo-
features derived from the bytes; ``decode_stub=False`` raises
NotImplementedError at the point where PIL/librosa/ffmpeg would be called.

The pipeline shapes a 100 TB media table needs, each with real Spark-side
plumbing:

* ``binary_features``   — byte-level features (size, md5) + decode stub
* ``frame_offsets``     — evenly-spaced frame sampling plan, pure JVM
                          arithmetic (driver-oracle-checkable)
* ``sample_frames``     — the actual binary frame slices (JVM substring on
                          binary) + per-frame md5
* ``decode_media``      — stub decoder → typed (width, height, channels,
                          pixels) struct; NotImplementedError without stub
* ``resize_image``      — REAL nearest-neighbor resampling arithmetic over
                          the decoded pixel grid (vectorized numpy) — the
                          resample math is what survives a real decoder swap
* ``media_embedding``   — deterministic bytes→float16-vector featurizer
                          (md5-chunk based), compatible with the ANN
                          operators (operators/embedding_ann.py)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binary_features(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    decode_stub: bool = True,
) -> DataFrame:
    """(id, n_bytes, md5_hex, fake_width, fake_height).

    n_bytes/md5_hex are real byte-level features (SQL-checkable);
    fake_width/height stand in for a decoder's output: deterministic
    functions of the first bytes, so tests pin the full plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode needs PIL/librosa/ffmpeg — not in this container"
                )
            payloads = [bytes(b) if b is not None else b"" for b in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": [len(b) for b in payloads],
                    "md5_hex": [hashlib.md5(b).hexdigest() for b in payloads],
                    "fake_width": [(b[0] if b else 0) + 1 for b in payloads],
                    "fake_height": [(b[-1] if b else 0) + 1 for b in payloads],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(
        run,
        schema=f"{id_col} long, n_bytes long, md5_hex string, fake_width int, fake_height int",
    )


def frame_offsets(
    df: DataFrame,
    frame_bytes: int = 256,
    n_frames: int = 8,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Evenly-spaced frame sampling plan over a binary payload: for a
    payload holding ``n_avail = floor(octet_length / frame_bytes)`` whole
    frames, pick ``min(n_frames, n_avail)`` sample indices spread evenly
    (``floor(i * n_avail / k)``) and emit 1-based byte offsets. Pure JVM
    arithmetic — whole-stage codegen, driver-oracle-checkable. Payloads
    shorter than one frame yield no rows."""
    n_avail = F.floor(F.octet_length(bin_col) / F.lit(frame_bytes))
    k = F.least(F.lit(n_frames), n_avail)
    idx = F.explode(
        F.when(k > 0, F.sequence(F.lit(0), k - F.lit(1))).otherwise(
            F.array().cast("array<int>")
        )
    )
    out = df.select(
        F.col(id_col), n_avail.alias("_n"), k.alias("_k"), idx.alias("frame_idx")
    )
    offset = (F.floor(F.col("frame_idx") * F.col("_n") / F.col("_k"))
              * F.lit(frame_bytes) + F.lit(1))
    return out.select(
        id_col,
        F.col("frame_idx").cast("long").alias("frame_idx"),
        offset.cast("long").alias("frame_offset"),
        F.lit(frame_bytes).cast("long").alias("frame_len"),
    )


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 256,
    n_frames: int = 8,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """The sampled frames themselves: binary slices via JVM substring-on-
    binary (no Python), plus a per-frame md5. Byte-exactness is pinned by
    tests against driver-side python slicing (DuckDB cannot slice blobs,
    so the driver oracle covers the offset arithmetic via frame_offsets)."""
    offs = frame_offsets(df, frame_bytes, n_frames, id_col, bin_col)
    joined = offs.join(df.select(id_col, bin_col), id_col)
    frame = F.expr(f"substring({bin_col}, frame_offset, frame_len)")
    return joined.select(
        id_col,
        "frame_idx",
        "frame_offset",
        frame.alias("frame"),
        F.md5(frame).alias("frame_md5"),
    )


_DECODE_SCHEMA = "{id} long, width int, height int, channels int, pixels array<float>"


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    decode_stub: bool = True,
) -> DataFrame:
    """Binary → typed decoded-image struct (width, height, channels,
    row-major pixel grid). The stub decoder derives a deterministic
    (w, h, 1) grid from the payload bytes (w = byte0 % 13 + 2,
    h = byte1 % 11 + 2, pixels = repeating payload bytes / 255); a real
    deployment swaps ONE function (the body of ``decode``) for PIL — the
    schema, batch shape and downstream resample are unchanged."""

    def decode(b: bytes):
        if not decode_stub:
            raise NotImplementedError(
                "real media decode needs PIL/ffmpeg — not in this container"
            )
        if not b:
            return 2, 2, 1, np.zeros(4, dtype=np.float32)
        w = b[0] % 13 + 2
        h = b[1 % len(b)] % 11 + 2
        buf = np.frombuffer(b, dtype=np.uint8)
        reps = int(np.ceil(w * h / buf.size))
        px = np.tile(buf, reps)[: w * h].astype(np.float32) / np.float32(255.0)
        return w, h, 1, px

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode(bytes(b) if b is not None else b"") for b in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "channels": [r[2] for r in rows],
                    "pixels": [r[3] for r in rows],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(
        run, schema=_DECODE_SCHEMA.format(id=id_col)
    )


def resize_image(
    decoded: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Nearest-neighbor resample of the decoded pixel grid to
    (out_w, out_h). The index arithmetic is REAL image processing
    (``src = floor(dst * src_dim / dst_dim)``, vectorized gather per Arrow
    batch) and is tested against a scalar python oracle — only the decode
    that FEEDS it is stubbed in this container."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = np.arange(out_h)
        xs = np.arange(out_w)
        for pdf in batches:
            out = []
            for w, h, px in zip(pdf["width"], pdf["height"], pdf["pixels"]):
                grid = np.asarray(px, dtype=np.float32).reshape(int(h), int(w))
                sy = (ys * int(h)) // out_h
                sx = (xs * int(w)) // out_w
                out.append(grid[np.ix_(sy, sx)].reshape(-1))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": out_w,
                    "height": out_h,
                    "channels": pdf["channels"].values,
                    "pixels": out,
                }
            )

    return decoded.mapInPandas(run, schema=_DECODE_SCHEMA.format(id=id_col))


def media_embedding(
    df: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Deterministic bytes → unit-norm float vector (md5-chunk featurizer):
    the stand-in for a real image/audio embedding model, producing a column
    directly usable by the ANN operators (embedding_ann.brute_force_topk /
    lsh_topk with vec_col='embedding')."""
    n_hashes = (dim + 15) // 16

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for b in pdf[bin_col]:
                raw = bytes(b) if b is not None else b""
                digest = b"".join(
                    hashlib.md5(raw + bytes([i])).digest() for i in range(n_hashes)
                )
                v = np.frombuffer(digest, dtype=np.uint8)[:dim].astype(np.float64)
                norm = np.linalg.norm(v)
                vecs.append((v / norm if norm else v).astype(np.float32))
            yield pd.DataFrame({id_col: pdf[id_col].values, "embedding": vecs})

    return df.select(id_col, bin_col).mapInPandas(
        run, schema=f"{id_col} long, embedding array<float>"
    )


def with_binary_payload(docs: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text) — used
    by tests/queries since the sandbox tables carry no real media bytes."""
    return docs.withColumn(out_col, F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8"))
