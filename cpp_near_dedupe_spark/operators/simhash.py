"""SimHash near-duplicate detection (Charikar 2002; Manku et al., WWW 2007).

A complementary near-dup signal to the MinHash pipeline: each doc gets a
64-bit fingerprint — bit b is the sign of Σ(±1 over tokens, + if the
token's XXH64 has bit b set, weighted by token frequency). Similar docs
have small Hamming distance. Candidate generation: split the fingerprint
into 4 × 16-bit bands (Manku's trick: Hamming ≤ 3 ⇒ some band equal) and
self-join on band equality — the same blocking shape as the MinHash
pipeline, so skew handling and scale behavior carry over.

The fingerprint is computed in a vectorized Arrow pass (tokenize with the
same reference table as the sketch kernel; token hashing and bit counting
are numpy matrix ops). Distinct-token weighting uses term frequency.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import track as _track


def simhash_batch_perdoc(texts, seed: int = 0) -> np.ndarray:
    """(m,) uint64 simhash fingerprints; 0 for docs with no tokens.

    Per-doc reference formulation (one numpy pass per document) — kept as
    the readable definition and the equality oracle for the batch-global
    production kernel below."""
    from ..functions.alphanum import ALPHANUM
    from ..functions.xxh64 import xxh64_rows

    m = len(texts)
    out = np.zeros(m, dtype=np.uint64)
    for i, text in enumerate(texts):
        if not text:
            continue
        codes = np.frombuffer(text.encode("utf-16-le", "surrogatepass"), dtype="<u2")
        mask = ALPHANUM[codes]
        if not mask.any():
            continue
        m8 = mask.astype(np.int8)
        d = np.diff(m8)
        starts = np.flatnonzero(d == 1) + 1
        ends = np.flatnonzero(d == -1) + 1
        if mask[0]:
            starts = np.concatenate(([0], starts))
        if mask[-1]:
            ends = np.concatenate((ends, [codes.size]))
        lens = ends - starts
        # hash words grouped by length (same trick as the sketch kernel)
        hashes = np.empty(starts.size, dtype=np.uint64)
        for L in np.unique(lens):
            idx = np.flatnonzero(lens == L)
            mat = codes[starts[idx][:, None] + np.arange(L)]
            hashes[idx] = xxh64_rows(
                np.ascontiguousarray(mat).view(np.uint8).reshape(idx.size, 2 * L), seed
            )
        # weighted bit vote: +tf for set bits, -tf for clear bits
        uniq, tf = np.unique(hashes, return_counts=True)
        bits = np.unpackbits(
            uniq.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        ).astype(np.int64)
        votes = (tf[:, None] * (2 * bits - 1)).sum(axis=0)
        sign = votes > 0
        out[i] = np.packbits(sign, bitorder="little").view(np.uint64)[0]
    return out


def simhash_batch(texts, seed: int = 0) -> np.ndarray:
    """(m,) uint64 simhash fingerprints; 0 for docs with no tokens.

    Batch-global production kernel: ALL documents of the Arrow batch are
    concatenated (0-code separators — non-alphanumeric, so no token can
    span a boundary) and tokenized with ONE run-detection pass; tokens are
    hashed in one length-grouped XXH64 pass over the whole batch. The
    distinct-then-tf-weight step of the per-doc spec is skipped because it
    is algebraically redundant (Σ over distinct hashes of tf·(2·bit−1)
    equals Σ over the raw token stream of (2·bit−1)); the 64 per-doc bit
    votes come from per-byte ``np.bincount`` histograms times a (256 × 8)
    bit table — 8 linear passes over the token stream, no sort, no unique,
    no (n_tok × 64) bit matrix (see the inline comment). The per-doc loop
    above costs dozens of small numpy calls per document — batch-global
    amortizes them across the batch (~4× measured at the bench shape).
    Pinned bit-equal to ``simhash_batch_perdoc`` by tests/test_extras.py."""
    from ..functions.alphanum import ALPHANUM
    from ..functions.xxh64 import xxh64_rows

    m = len(texts)
    out = np.zeros(m, dtype=np.uint64)
    if m == 0:
        return out
    bufs = [
        (t or "").encode("utf-16-le", "surrogatepass") + b"\x00\x00" for t in texts
    ]
    codes = np.frombuffer(b"".join(bufs), dtype="<u2")
    # start offset of each doc in the concatenated code stream
    doc_starts = np.zeros(m, dtype=np.int64)
    np.cumsum([len(b) // 2 for b in bufs[:-1]], out=doc_starts[1:])
    mask = ALPHANUM[codes]
    if not mask.any():
        return out
    m8 = mask.astype(np.int8)
    d = np.diff(m8)
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if mask[0]:
        starts = np.concatenate(([0], starts))
    # trailing separator guarantees the stream never ends alphanumeric
    lens = ends - starts
    tok_doc = np.searchsorted(doc_starts, starts, side="right") - 1

    hashes = np.empty(starts.size, dtype=np.uint64)
    for L in np.unique(lens):
        idx = np.flatnonzero(lens == L)
        mat = codes[starts[idx][:, None] + np.arange(L)]
        hashes[idx] = xxh64_rows(
            np.ascontiguousarray(mat).view(np.uint8).reshape(idx.size, 2 * L), seed
        )

    # Votes: Σ over DISTINCT hashes of tf·(2·bit−1) ≡ Σ over the RAW token
    # stream of (2·bit−1) — term-frequency weighting makes the distinct
    # step algebraically redundant, so no sort and no unique are needed.
    # Per-doc set-bit counts WITHOUT expanding to an (n_tok × 64) bit
    # matrix (unpackbits measured as the whole kernel's bottleneck): for
    # each of the 8 little-endian hash bytes, one np.bincount histograms
    # byte values per doc, and a (256 × 8) bit table turns histograms into
    # per-bit counts — 8 linear passes over the token stream, tiny matmul.
    # votes_d[bit] = 2·count_set − n_tokens_d.
    hb = hashes.view(np.uint8).reshape(-1, 8)
    base = tok_doc * np.int64(256)
    bit_table = (np.arange(256)[:, None] >> np.arange(8)[None, :]) & 1  # (256, 8)
    count_set = np.empty((m, 8, 8), dtype=np.int64)
    for j in range(8):
        hist = np.bincount(base + hb[:, j], minlength=m * 256).reshape(m, 256)
        count_set[:, j, :] = hist @ bit_table
    n_tok = np.bincount(tok_doc, minlength=m)
    votes = 2 * count_set.reshape(m, 64) - n_tok[:, None]
    sign = votes > 0
    packed = np.packbits(sign, axis=1, bitorder="little").view(np.uint64).reshape(m)
    # docs with no tokens keep fingerprint 0 even if their sign row packs
    # to 0 anyway (votes all zero -> sign all False -> packed 0): exact
    has_tok = np.zeros(m, dtype=bool)
    has_tok[np.unique(tok_doc)] = True
    out[has_tok] = packed[has_tok]
    return out


def simhash_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", seed: int = 0
) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "simhash": simhash_batch(pdf[text_col].tolist(), seed).view(np.int64),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, simhash long"
    )


def simhash_bands(sims: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Explode the 64-bit fingerprint into 4 × 16-bit band keys.

    One explode pass, NOT a 4-way union: each union branch is a separate
    subtree that would re-evaluate ``sims`` (Spark does not CSE duplicated
    plan subtrees), which matters when sims is the unpersisted kernel."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftrightunsigned(F.col("simhash"), 16 * b)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("band_key"),
            )
            for b in range(4)
        ]
    )
    return sims.select(F.col(id_col), F.explode(bands).alias("_b")).select(
        id_col, F.col("_b.band_id").alias("band_id"), F.col("_b.band_key").alias("band_key")
    )


def simhash_sql_fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 60,
) -> DataFrame:
    """SQL-expressible simhash twin: the same Charikar weighted-bit-vote
    construction as ``simhash_batch`` — per-token hash, ±tf vote per bit,
    sign-pack — but over the regex tokenizer and a 60-bit md5-derived token
    hash, entirely in built-in expressions, so a DuckDB oracle can mirror
    it bit-for-bit (60 bits: 15 md5 hex chars parse into a BIGINT without
    overflow in either engine). The parity simhash (XXH64 over the
    reference tokenizer) stays the production twin; this one gives the
    vote/sign/packing semantics a driver hash check.

    Physical shape: explode tokens → one hash aggregation computing all
    60 bit votes map-side (no per-bit passes), then a JVM expression packs
    the signs. Docs with no tokens get fingerprint 0 (matching
    ``simhash_batch``) via the left join."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
    )
    tok = docs.select(id_col, F.explode(toks).alias("tok"))
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    th = tok.select(id_col, h.alias("h"))
    votes = th.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(n_bits)
        ]
    )
    fp = None
    for b in range(n_bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp + term
    sims = votes.select(id_col, fp.alias("simhash"))
    return docs.select(id_col).join(sims, id_col, "left").select(
        id_col, F.coalesce("simhash", F.lit(0)).alias("simhash")
    )


def simhash_sql_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hamming-≤3 pairs over the SQL-expressible fingerprint: 4 × 15-bit
    band blocking (Manku: Hamming ≤ 3 ⇒ at least one band equal) + exact
    JVM bit_count verification — the same blocking shape as
    ``simhash_candidate_pairs``, with a full DuckDB oracle."""
    sims = _track(simhash_sql_fingerprint(docs, id_col, text_col))
    pieces = [
        sims.select(
            F.col(id_col),
            F.lit(b).alias("band_id"),
            F.shiftright("simhash", 15 * b).bitwiseAND(F.lit(0x7FFF)).alias(
                "band_key"
            ),
        )
        for b in range(4)
    ]
    bands = pieces[0]
    for p in pieces[1:]:
        bands = bands.unionByName(p)
    left = bands.select("band_id", "band_key", F.col(id_col).alias("a"))
    right = bands.select("band_id", "band_key", F.col(id_col).alias("b"))
    cand = (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sa = sims.select(F.col(id_col).alias("a"), F.col("simhash").alias("sh_a"))
    sb = sims.select(F.col(id_col).alias("b"), F.col("simhash").alias("sh_b"))
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= F.lit(max_hamming))
    )


def simhash_candidate_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hot_bucket_cap: int = 256,
) -> DataFrame:
    """(a, b, hamming) pairs with Hamming distance <= max_hamming, found via
    band blocking + exact popcount verification (bit_count is JVM-side).

    The fingerprint table feeds every plan subtree (the band branches and
    both sides of the verification join); without a persist the Arrow
    kernel would run once per subtree. The persist is registered with the
    session cache registry (``cpp_near_dedupe_spark.cache``) — the caller
    releases it after materializing the result.

    Hot buckets: a degenerate band value — most prominently fingerprint 0,
    which every empty/untokenizable doc shares, a large class at web scale
    — would make a plain band self-join quadratic. Buckets over
    ``hot_bucket_cap`` use the shared WINDOWLESS capped+star routing
    (``operators.pairs.capped_star_pairs``, same scheme as the text and
    embedding pair paths): hash-agg bucket stats, hash-selected head,
    bucket-min star — no task ever sorts the degenerate bucket, the bucket
    stays one connected group, every pair still popcount-verified. The SQL
    twin (``simhash_sql_pairs``) deliberately stays UNCAPPED because its
    DuckDB oracle defines the candidate set as all band-colliding pairs —
    the cap here is a scale guard on the rows-only production path."""
    from .pairs import capped_star_pairs

    sims = _track(simhash_documents(docs, id_col, text_col))
    bands = simhash_bands(sims, id_col)
    cand = capped_star_pairs(bands, ["band_id", "band_key"], id_col, hot_bucket_cap)
    sa = sims.select(F.col(id_col).alias("a"), F.col("simhash").alias("sh_a"))
    sb = sims.select(F.col(id_col).alias("b"), F.col("simhash").alias("sh_b"))
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= F.lit(max_hamming))
    )
