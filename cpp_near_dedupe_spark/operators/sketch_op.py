"""Sketch operator: DataFrame[text] → DataFrame[signature].

Spark-first replacement for the reference's loader+hasher stages
(`/root/reference/CPPDeduper/ArrowLoaderThread.h:112-212`,
`HasherThread.h:60-91`): instead of per-row queue hops between threads, one
``mapInPandas`` pass computes every document's bottom-N sketch per Arrow
batch with the vectorized kernel (functions/sketch.py). The signature is
stored as ``array<bigint>`` — uint64 values as two's-complement longs,
ascending in *unsigned* order; all consumers view them back as uint64.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..config import DedupeConfig


def sketch_documents(df: DataFrame, cfg: DedupeConfig) -> DataFrame:
    """Project (id, text), compute sketches; → (id, sig_len, signature).

    Column pruning matters at scale: only ``id_col`` and ``text_col`` are
    read (Catalyst pushes the projection into the scan, so e.g. the `html`
    payload column of a pages table is never deserialized).
    """
    id_col, text_col = cfg.id_col, cfg.text_col
    k, n, seed, bits = cfg.shingle_k, cfg.num_hashes, cfg.seed, cfg.hash_bits

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.sketch import sketch_batch

        for pdf in batches:
            sigs = sketch_batch(
                pdf[text_col].tolist(), k=k, num_hashes=n, seed=seed, hash_bits=bits
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "sig_len": np.fromiter((s.size for s in sigs), dtype=np.int32, count=len(sigs)),
                    "signature": [s.view(np.int64) for s in sigs],
                }
            )

    projected = df.select(id_col, text_col)
    # The scan often yields far fewer partitions than cores (one big parquet
    # file ~= 1-2 splits): redistribute the 2-column projection so the
    # CPU-heavy sketch kernel uses the whole cluster. Shuffling (id, text)
    # is cheap relative to sketching it; round-robin balances variable doc
    # lengths better than hash-of-id.
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if projected.rdd.getNumPartitions() < target:
        projected = projected.repartition(target)
    return projected.mapInPandas(
        run, schema=f"{id_col} long, sig_len int, signature array<long>"
    )
