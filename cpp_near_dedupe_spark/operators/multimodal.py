"""Multimodal (binary-payload) column plumbing.

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata, processed per Arrow batch with ``mapInPandas`` — the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested; the actual
media decode is stubbed because no image/audio libraries exist in this
container. ``decode_stub=True`` (default) emits deterministic pseudo-
features derived from the bytes; ``decode_stub=False`` raises
NotImplementedError at the point where PIL/librosa/ffmpeg would be called.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

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


def with_binary_payload(docs: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text) — used
    by tests/queries since the sandbox tables carry no real media bytes."""
    return docs.withColumn(out_col, F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8"))
