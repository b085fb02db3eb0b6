"""TF-IDF cosine similarity — the classic sparse lexical pair scorer.

Complements the set-overlap scorers (sketch-Jaccard, n-gram Jaccard) and
the dense-embedding cosine path: TF-IDF cosine weighs rare terms up and
boilerplate down, which is the standard IR answer to "near-dup score two
web pages by their words" when no embedding model is available. Same
adjacent-pair driver harness shape as ``ngram_jaccard_adjacent``, fully
SQL-expressible (DuckDB oracle, hash-compared).

Scale shape: everything is groupBy/join on (doc, term) — pure shuffled
hash aggregations and equi-joins over the posting-list relation, the
exact layout distributed IR systems use. The document-frequency join keys
on the term (vocabulary-sized, not corpus-sized); the corpus size joins
in as a broadcast 1-row aggregate; nothing ever collects. Cosine between
specific pairs joins the two posting lists on (pair, term) — for the
adjacent harness the pair key is derived from doc_id arithmetic; a
general candidate-pair scorer would join the (a, b) pair list against
the weights relation the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import words_col


def tfidf_weights(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, tok, w): smoothed TF-IDF weight per (document, term).

    w = tf · (ln((N+1)/(df+1)) + 1) — the add-one-smoothed idf (sklearn's
    ``smooth_idf``), so a term present in every document still carries
    weight 1·tf and the log never sees a zero. Tokens come from the
    shared analytics tokenizer (``text_analysis.words_col``); documents
    with no tokens simply have no rows (and so no similarity — mirrored
    by the oracle's inner joins).
    """
    toks = docs.select(F.col(id_col), F.explode(words_col(text_col)).alias("tok"))
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = docs.select(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            F.col("tok"),
            (
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0)
            ).alias("w"),
        )
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a, b, tfidf_cosine) for an arbitrary candidate-pair relation
    (a, b) — the general scorer: attach each side's posting list by id,
    join the two lists on (pair, term), aggregate the dot product, divide
    by the per-doc norms. Pairs sharing no term are dropped (cosine 0).

    Scale shape: the pair relation joins the weights relation on its id
    keys (the same two-equi-join layout as ``er_score_pairs``); the dot
    aggregation keys on the pair — a candidate-pair list from LSH/SN
    blocking stays linear end-to-end. The weights relation feeds four
    plan branches (two join sides, two norm lookups), so it is persisted
    through the session cache registry; the caller releases after
    materializing."""
    from ..cache import track

    w = track(tfidf_weights(docs, id_col, text_col))
    # nrm feeds both norm-lookup joins; persisted (slim: one row per doc)
    # so the norm aggregation runs ONE pass over the corpus-sized posting
    # relation instead of one per join side (r6)
    nrm = track(
        w.groupBy(id_col).agg(
            F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
        )
    )
    lhs = w.select(F.col(id_col).alias("a"), "tok", F.col("w").alias("wa"))
    rhs = w.select(F.col(id_col).alias("b"), "tok", F.col("w").alias("wb"))
    dot = (
        pairs.join(lhs, "a")
        .join(rhs, ["b", "tok"])
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = nrm.select(F.col(id_col).alias("a"), F.col("nrm").alias("_na"))
    nb = nrm.select(F.col(id_col).alias("b"), F.col("nrm").alias("_nb"))
    return (
        dot.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            F.round(F.col("dot") / (F.col("_na") * F.col("_nb")), 6).alias(
                "tfidf_cosine"
            ),
        )
    )


def tfidf_cosine_adjacent(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(a, b=a+1, tfidf_cosine) for consecutive doc ids that share at
    least one term — the oracle-able adjacent-pair probe of the general
    ``tfidf_cosine_pairs`` scorer."""
    ids = docs.select(F.col(id_col).alias("a"))
    pairs = ids.join(
        docs.select((F.col(id_col) - 1).alias("a"), F.col(id_col).alias("b")),
        "a",
    )
    return tfidf_cosine_pairs(docs, pairs, id_col, text_col)
