"""Blocking operator: signatures → exploded (band_id, band_key, doc_id).

Replaces the reference's mutable per-band LSH index
(`/root/reference/CPPDeduper/LSHBandHashMap.h:234-358`) with a materialized
DataFrame: "inserting into the index" becomes appending rows, and "candidate
lookup" becomes a self-equi-join on (band_id, band_key) (see pairs.py).
Band keys are computed batch-vectorized (functions/bands.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..config import DedupeConfig


def explode_bands(signatures: DataFrame, cfg: DedupeConfig) -> DataFrame:
    """(id, signature) → (id, band_id, band_key). Docs with empty sketches
    produce no rows — they can never collide (reference parity: empty
    sketches are never duplicates)."""
    id_col = cfg.id_col
    bands, num_hashes = cfg.bands, cfg.num_hashes
    mode, rbs_seed = cfg.band_key_mode, cfg.rbs_seed

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.bands import band_keys_batch, rbs_band_keys_batch

        for pdf in batches:
            sigs = [np.asarray(s, dtype=np.int64).view(np.uint64) for s in pdf["signature"]]
            if mode == "rbs":
                doc_idx, band_id, band_key = rbs_band_keys_batch(
                    sigs, bands=bands, num_hashes=num_hashes, seed=rbs_seed
                )
                # rbs keys are per-band bucket numbers (< 2^32), NOT
                # namespaced by band like the content-hash keys; downstream
                # joins use band_key alone, so fold the band index into the
                # high bits (equal iff same band AND same rbs bucket —
                # exactly the reference's per-band multimap semantics)
                band_key = band_key + (band_id.astype(np.uint64) << np.uint64(33))
            else:
                doc_idx, band_id, band_key = band_keys_batch(
                    sigs, bands=bands, num_hashes=num_hashes
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values[doc_idx],
                    "band_id": band_id.astype(np.int32),
                    "band_key": band_key.view(np.int64),
                }
            )

    return signatures.select(id_col, "signature").mapInPandas(
        run, schema=f"{id_col} long, band_id int, band_key long"
    )
