"""Language-model fluency scoring — the CCNet "perplexity filter" slot.

CCNet (Wenzek et al. 2020) ranks Common-Crawl documents by the perplexity
of a KenLM 5-gram model trained on Wikipedia; low-fluency (high-perplexity)
pages are gibberish, menus, or keyword stuffing. No KenLM model exists in
this environment, so this operator fills the same pipeline slot with a
SELF-TRAINED word-bigram LM: corpus bigram/context counts with add-one
(Laplace) smoothing give each document a mean conditional log-probability

    avg_logprob(d) = mean over bigram positions i of
                     ln( (c(w_{i-1}, w_i) + 1) / (ctx(w_{i-1}) + V) )

where ``c`` is the corpus bigram count, ``ctx(w)`` the count of bigrams
starting with ``w`` (so the smoothed conditional normalizes), and ``V``
the corpus vocabulary size. Lower = less fluent under the corpus's own
statistics — the same ranking role as perplexity, honest about being a
bigram (not 5-gram) model. A deployment with a real KenLM/CC-style model
plugs it in as a Pandas-UDF scorer over the identical projection; the
relational shape below (what a 100 TB run needs) does not change.

Scale shape: the bigram relation is exploded once (corpus-token-sized,
the same cost class as the token histogram); counts are two hash
aggregations; the vocabulary size is a 1-row broadcast; the per-doc score
re-joins the doc's bigrams against the count relations on their natural
keys. No window, no UDF, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import words_col


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, docs in order.
    Tokens are materialized as a real column before the pairwise zip so
    the tokenizer runs once per doc (plan-hygiene rule, see ngram.py)."""
    toks = docs.select(F.col(id_col), words_col(text_col).alias("_w"))
    pairs = F.when(
        F.size("_w") >= 2,
        F.zip_with(
            F.expr("slice(_w, 1, size(_w) - 1)"),
            F.expr("slice(_w, 2, size(_w) - 1)"),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return toks.select(F.col(id_col), F.explode(pairs).alias("_bg")).select(
        F.col(id_col), F.col("_bg.w1"), F.col("_bg.w2")
    )


def lm_fluency_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_bigrams, avg_logprob): mean Laplace-smoothed bigram
    conditional log-probability per document under the corpus's own
    bigram statistics. Documents with fewer than two tokens have no
    bigrams and are absent (mirrored by the oracle's inner joins).

    The bigram relation feeds three consumers (bigram counts, context
    counts, the per-doc score join), so it is persisted through the
    session cache registry; the caller releases after materializing."""
    from ..cache import track

    bi = track(_doc_bigrams(docs, id_col, text_col))
    bi_counts = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bi"))
    ctx = bi_counts.groupBy("w1").agg(F.sum("c_bi").alias("c_ctx"))
    vocab = (
        docs.select(F.explode(words_col(text_col)).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    lp = F.log(
        (F.col("c_bi") + 1.0) / (F.col("c_ctx") + F.col("v"))
    )
    return (
        bi.join(bi_counts, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(lp), 6).alias("avg_logprob"),
        )
    )
