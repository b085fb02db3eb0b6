"""Word n-gram operators, entirely JVM-side (no UDFs).

``word_ngrams`` builds the n-gram array with ``transform(sequence(...))`` +
``slice`` — Spark has no built-in ngrams function, but the composition
whole-stage-codegens. ``ngram_jaccard_adjacent`` computes exact n-gram-set
Jaccard between consecutive doc ids: a linear-size, SQL-expressible probe of
the same tokenize→shingle→Jaccard semantic chain the sketch pipeline uses
(with the plain regex tokenizer; the sketch pipeline uses the reference's
exact classification table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import words_col


def word_ngrams(n: int, text_col: str = "text"):
    """Column expression: array of space-joined word n-grams.

    PLAN HYGIENE: the returned expression references its token array ~one
    time PER GRAM (inside the transform lambda). If ``text_col`` is the
    raw text column, Catalyst inlines the split/filter tokenizer at every
    reference and re-tokenizes the document once per gram — measured 11×
    slower at sf0.1. Callers must materialize the token array as its own
    projection first and pass THAT column name (see
    ``ngram_jaccard_adjacent``); this helper applies ``words_col`` only
    when handed the raw text column for API compatibility."""
    w = words_col(text_col)
    return word_ngrams_from_tokens(n, w)


def word_ngrams_from_tokens(n: int, w):
    """n-gram array from an ALREADY-MATERIALIZED token array column."""
    # guard: F.sequence(1, 0) yields a DESCENDING [1, 0], not an empty array
    return F.when(
        F.size(w) >= F.lit(n),
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _adjacent_gram_overlap(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(a, b=a+1, inter, na, nb): distinct-n-gram set sizes and overlap
    between consecutive doc ids — the shared relation behind Jaccard
    (symmetric) and containment (asymmetric). Single definition so the
    plan-hygiene rule below can never diverge between the two measures.
    """
    # two-step projection: tokens become a real column BEFORE the per-gram
    # lambda references them, so the tokenizer runs once per doc, not once
    # per gram (see word_ngrams docstring; measured 11× at sf0.1)
    toks = docs.select(F.col(id_col).alias("a"), words_col(text_col).alias("_w"))
    grams = toks.select(
        "a",
        F.array_distinct(word_ngrams_from_tokens(n, F.col("_w"))).alias("grams_a"),
    )
    right = grams.select(
        (F.col("a") - F.lit(1)).alias("a"),
        F.col("grams_a").alias("grams_b"),
    )
    return grams.join(right, "a").select(
        "a",
        (F.col("a") + F.lit(1)).alias("b"),
        F.size(F.array_intersect("grams_a", "grams_b")).alias("inter"),
        F.size("grams_a").alias("na"),
        F.size("grams_b").alias("nb"),
    )


def ngram_jaccard_adjacent(
    docs: DataFrame, n: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Jaccard of distinct n-gram sets between each doc and the next id.

    (a, b, jaccard) — deterministic linear pair set; rounded to 6 dp for
    cross-engine comparability.
    """
    joined = _adjacent_gram_overlap(docs, n, id_col, text_col)
    union = F.col("na") + F.col("nb") - F.col("inter")
    return joined.select(
        "a",
        "b",
        F.round(
            F.when(union > 0, F.col("inter") / union).otherwise(F.lit(0.0)), 6
        ).alias("jaccard"),
    )


def ngram_dupe_pairs_adjacent(
    docs: DataFrame,
    n: int = 5,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    return ngram_jaccard_adjacent(docs, n, id_col, text_col).filter(
        F.col("jaccard") >= F.lit(threshold)
    )


def ngram_containment_adjacent(
    docs: DataFrame, n: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT between each doc and the next id:
    c_ab = |G(a)∩G(b)| / |G(a)| and c_ba = |G(a)∩G(b)| / |G(b)|
    (Broder 1997's containment, next to his resemblance = Jaccard).

    Why a separate measure: when document B embeds document A verbatim
    inside a larger page (syndicated article + surrounding boilerplate —
    the common-crawl quotation pattern), Jaccard is diluted by B's extra
    grams (|A|/|B| at best) while c_ab stays ≈ 1. A near-dup policy that
    also drops contained docs needs this number; symmetric Jaccard
    cannot express it. Shares ``_adjacent_gram_overlap`` (and therefore
    the materialize-tokens-first plan hygiene) with
    ``ngram_jaccard_adjacent``; docs with no n-grams yield containment 0
    (empty gram set is contained in nothing, mirrored by the oracle).
    """
    joined = _adjacent_gram_overlap(docs, n, id_col, text_col)
    contain = lambda denom: F.round(  # noqa: E731
        F.when(F.col(denom) > 0, F.col("inter") / F.col(denom)).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    return joined.select(
        "a", "b", contain("na").alias("c_ab"), contain("nb").alias("c_ba")
    )
