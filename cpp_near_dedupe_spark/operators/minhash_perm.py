"""k-permutation MinHash signatures (the classical MinHash construction).

The parity pipeline uses the reference's bottom-k sketch (one hash, k
smallest values — `/root/reference/CPPDeduper/Shingler64.hpp:189-243`);
this operator provides the north-star's classical alternative: ``num_perm``
independent universal-hash permutations ``h_i(x) = (a_i·x + b_i) mod p``
(p = 2³¹−1) over a 32-bit base hash of each distinct shingle, signature =
the per-permutation minimum. Signature AGREEMENT fraction is an unbiased
estimator of Jaccard similarity (each component matches with probability
J), pinned by a property test.

Entirely JVM-side: tokenize → 5-shingle → md5 → hex-parse base → nested
``transform``/``array_min`` over a literal (a, b) parameter array — whole
chain in codegen, no Python, and expressible verbatim in the DuckDB
oracle. All arithmetic stays below 2⁶³ (a < p ≤ 2³¹, x < 2³²), so ANSI
mode never overflows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import DedupeConfig
from ..plans.sql_mode import _tokens

MERSENNE_P = 2147483647  # 2^31 - 1


def perm_params(num_perm: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs from a Lehmer LCG (x -> 48271·x mod
    p) — trivially reproducible in any engine, shared with the SQL oracle
    as literals."""
    out, state = [], seed
    for _ in range(num_perm):
        state = (state * 48271) % MERSENNE_P
        a = state if state > 0 else 1
        state = (state * 48271) % MERSENNE_P
        out.append((a, state))
    return out


def _base_hashes(toks: Column, k: int) -> Column:
    """Distinct k-word shingles → 32-bit base hash (first 8 hex chars of
    md5, the same base both engines can compute). ``toks`` must be an
    already-materialized token-array COLUMN: the shingle lambda references
    it once per shingle, and Catalyst would re-inline (and re-evaluate) a
    raw split/filter expression at every reference."""
    shingles = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        F.array_distinct(shingles),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )


def minhash_perm_signatures(
    docs: DataFrame, num_perm: int = 128, cfg: DedupeConfig | None = None
) -> DataFrame:
    """(id, n_shingles, signature array<long> of length num_perm).
    Docs with no shingles (<k tokens) get an empty signature."""
    cfg = cfg or DedupeConfig()
    params = perm_params(num_perm)
    params_arr = F.array(
        *[F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in params]
    )
    based = docs.select(
        F.col(cfg.id_col), _tokens(F.col(cfg.text_col)).alias("_w")
    ).select(
        F.col(cfg.id_col),
        _base_hashes(F.col("_w"), cfg.shingle_k).alias("bs"),
    )
    sig = F.when(
        F.size("bs") > 0,
        F.transform(
            params_arr,
            lambda pr: F.array_min(
                F.transform(F.col("bs"), lambda x: (pr.a * x + pr.b) % MERSENNE_P)
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return based.select(
        cfg.id_col,
        F.size("bs").cast("long").alias("n_shingles"),
        sig.alias("signature"),
    )


def minhash_perm_jaccard(
    signatures: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(a, b) × signatures → (a, b, est_jaccard): the fraction of agreeing
    signature components — the classical MinHash Jaccard estimator."""
    sa = signatures.select(F.col(id_col).alias("a"), F.col("signature").alias("_sa"))
    sb = signatures.select(F.col(id_col).alias("b"), F.col("signature").alias("_sb"))
    agree = F.size(
        F.filter(F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda e: e)
    )
    est = F.when(
        (F.size("_sa") > 0) & (F.size("_sb") > 0),
        agree.cast("double") / F.size("_sa").cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", F.round(est, 6).alias("est_jaccard"))
    )
