"""Blocking operator: signatures → exploded (band_id, band_key, doc_id).

Replaces the reference's mutable per-band LSH index
(`/root/reference/CPPDeduper/LSHBandHashMap.h:234-358`) with a materialized
DataFrame: "inserting into the index" becomes appending rows, and "candidate
lookup" becomes a self-equi-join on (band_id, band_key) (see pairs.py).

The canonical "content" band key is ANY deterministic hash of
(band_index, band slice) — equal slices collide, unequal slices don't
(SURVEY §2 B2a: the reference's own hpb64 mixing is quality-degenerate and
author-flagged; only the collision structure is semantics). So the default
path computes keys entirely JVM-side with the built-in ``xxhash64`` over
the slice — whole-stage codegen, no Python, no Arrow round-trip (measured
~2× faster than the numpy kernel at low parallelism). The numpy kernel in
functions/bands.py remains the spec for the emulated reference modes (rbs)
and the driver-side quality harness; a structure-equivalence test pins
that both produce identical collision sets (tests/test_operators.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupeConfig


def explode_bands(signatures: DataFrame, cfg: DedupeConfig) -> DataFrame:
    """(id, signature) → (id, band_id, band_key). Docs with empty sketches
    produce no rows — they can never collide (reference parity: empty
    sketches are never duplicates). Only bands fully inside the sketch
    participate (our replacement for the reference's read-past-hashLen UB,
    `LSHBandHashMap.h:326-331`)."""
    id_col = cfg.id_col
    bands, num_hashes = cfg.bands, cfg.num_hashes
    mode, rbs_seed = cfg.band_key_mode, cfg.rbs_seed
    bs = cfg.band_size

    if mode == "content":
        # pure built-ins: explode the per-doc list of complete band ids,
        # key = xxhash64(band_id, 4-value slice) — codegen end to end
        band_ids = F.filter(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.col("sig_len") >= (b + F.lit(1)) * bs,
        )
        exploded = signatures.select(
            F.col(id_col), "signature", F.explode(band_ids).alias("band_id")
        )
        key = F.xxhash64(
            "band_id", F.slice("signature", F.col("band_id") * bs + 1, bs)
        )
        return exploded.select(
            id_col, F.col("band_id").cast("int").alias("band_id"), key.alias("band_key")
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.bands import rbs_band_keys_batch

        for pdf in batches:
            sigs = [np.asarray(s, dtype=np.int64).view(np.uint64) for s in pdf["signature"]]
            doc_idx, band_id, band_key = rbs_band_keys_batch(
                sigs, bands=bands, num_hashes=num_hashes, seed=rbs_seed
            )
            # rbs keys are per-band bucket numbers (< 2^32), NOT
            # namespaced by band like the content-hash keys; downstream
            # joins use band_key alone, so fold the band index into the
            # high bits (equal iff same band AND same rbs bucket —
            # exactly the reference's per-band multimap semantics)
            band_key = band_key + (band_id.astype(np.uint64) << np.uint64(33))
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
