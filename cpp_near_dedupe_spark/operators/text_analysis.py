"""Text-analysis operators for training-data pipelines.

All of these stay JVM-side (built-in ``pyspark.sql.functions`` only — no
Python in the hot path), so they whole-stage-codegen and push projections
into the scan. Each has an exact ANSI-SQL oracle (see __spark_entry__.py).

Ops: whitespace/word token counts, quality scoring (character-class
ratios), document fingerprinting (normalized-text hash), token histogram,
stopword-ratio language ID, BPE-ish pre-tokenizer stats, corpus-wide
repeated-line removal (the C4/RefinedWeb boilerplate filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny built-in stopword lists for the language-ID heuristic; deliberately
# short so the SQL oracle can inline them
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "dans", "pour", "une"],
    "es": ["el", "la", "que", "de", "los", "se", "por", "con", "una", "para"],
}

_WORD_SPLIT = "[^a-z0-9]+"


def words_col(text_col: str = "text"):
    """Lower-cased word array, empties removed (shared tokenizer for the
    analysis ops; the dedupe sketch uses the exact reference tokenizer —
    functions/alphanum.py — these analytics ops use a plain regex one)."""
    return F.array_remove(F.split(F.lower(F.col(text_col)), _WORD_SPLIT), "")


def doc_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_chars_actual, n_words, n_distinct_words, avg_word_len)."""
    w = words_col(text_col)
    return docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars_actual"),
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct_words"),
        F.round(
            F.when(F.size(w) > 0, F.aggregate(F.transform(w, F.length), F.lit(0), lambda a, x: a + x) / F.size(w)).otherwise(F.lit(0.0)),
            4,
        ).alias("avg_word_len"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Character-class ratios + composite quality score (rounded for
    engine-independent comparability)."""
    t = F.col(text_col)
    n = F.length(t)
    alpha = n - F.length(F.regexp_replace(t, "[a-zA-Z]", ""))
    digit = n - F.length(F.regexp_replace(t, "[0-9]", ""))
    space = n - F.length(F.regexp_replace(t, " ", ""))
    safe_n = F.when(n > 0, n.cast("double")).otherwise(F.lit(None))
    return docs.select(
        F.col(id_col),
        F.round(F.coalesce(alpha / safe_n, F.lit(0.0)), 6).alias("alpha_ratio"),
        F.round(F.coalesce(digit / safe_n, F.lit(0.0)), 6).alias("digit_ratio"),
        F.round(F.coalesce(space / safe_n, F.lit(0.0)), 6).alias("space_ratio"),
        F.round(
            F.coalesce(
                (alpha + space) / safe_n - F.lit(0.5) * digit / safe_n, F.lit(0.0)
            ),
            6,
        ).alias("quality"),
    )


def doc_fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercase, whitespace-collapsed
    text. Groups docs that differ only in case/whitespace."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    return docs.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


def token_histogram(
    docs: DataFrame, text_col: str = "text", min_count: int = 100
) -> DataFrame:
    """Corpus-wide token counts (tokens with count >= min_count — a
    threshold, not a LIMIT, so the result set is deterministic)."""
    return (
        docs.select(F.explode(words_col(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-ratio language ID: for each language, the fraction of its
    stopword list present in the doc's distinct words; argmax wins, ties
    broken by language code, all-zero scores -> 'und' (undetermined).
    JVM-side only: array_intersect against literal arrays."""
    w = F.array_distinct(words_col(text_col))
    scores = {
        lang: F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in sw])))
        for lang, sw in STOPWORDS.items()
    }
    best_score = F.greatest(*scores.values())
    pred = F.lit("und")
    # iterate in reverse-sorted order so earlier-alphabet languages win ties
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(pred)
    pred = F.when(best_score > 0, pred).otherwise(F.lit("und"))
    return docs.select(
        F.col(id_col),
        pred.alias("lang_pred"),
        F.round(best_score / F.lit(10.0), 4).alias("lang_score"),
    )


# GPT-2-style pre-tokenization classes, engine-identical by construction:
# explicit whitespace set (Java's \s and RE2's \s disagree on \x0B), plain
# character classes, no lookaround (RE2 has none). A run of letters, a run
# of digits, or a run of anything-else-non-space is one piece — the shape
# a byte-pair encoder's pre-tokenizer feeds the merge table.
_BPE_SPLIT = "[a-z]+|[0-9]+|[^a-z0-9\t\n\f\r ]+"


def bpe_token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_pieces, n_alpha_pieces, n_digit_pieces, n_other_pieces,
    n_piece_chars): BPE-ish pre-tokenizer counts — the token-budget
    estimate a training-data pipeline uses before the (model-specific)
    merge step. Pure built-ins; the pieces array is materialized as a
    column BEFORE the four counting expressions reference it, so the
    regex scan runs once per doc (plan hygiene — see operators/ngram.py)."""
    pieces = docs.select(
        F.col(id_col),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(_BPE_SPLIT), F.lit(0)
        ).alias("_p"),
    )
    first = lambda p: F.substring(p, 1, 1)
    alpha = F.size(
        F.filter("_p", lambda p: (first(p) >= "a") & (first(p) <= "z"))
    )
    digit = F.size(
        F.filter("_p", lambda p: (first(p) >= "0") & (first(p) <= "9"))
    )
    return pieces.select(
        F.col(id_col),
        F.size("_p").cast("long").alias("n_pieces"),
        alpha.cast("long").alias("n_alpha_pieces"),
        digit.cast("long").alias("n_digit_pieces"),
        (F.size("_p") - alpha - digit).cast("long").alias("n_other_pieces"),
        F.coalesce(
            F.aggregate(F.transform("_p", F.length), F.lit(0), lambda a, x: a + x),
            F.lit(0),
        ).cast("long").alias("n_piece_chars"),
    )


def remove_repeated_lines(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    emit_text: bool = False,
) -> DataFrame:
    """Corpus-wide repeated-line removal — the C4/RefinedWeb boilerplate
    filter: a line occurring in ≥ ``min_docs`` DISTINCT documents
    (navigation chrome, cookie banners, "subscribe" calls at web scale)
    is dropped from every document; remaining lines keep their original
    order. Returns (id, n_lines, n_removed, clean_md5) — the cleaned text
    travels as its md5 so result rows stay fixed-width (``emit_text=True``
    appends the full ``clean_text`` for pipeline composition).

    Scale shape: one ``posexplode`` pass over the corpus (inherent — the
    statistic is corpus-global), line identity as ``md5(line)`` so the
    repeated-line aggregation shuffles fixed-width hashes with map-side
    combine, a hash join of the (typically tiny) boilerplate set back
    onto the exploded lines, and one per-doc re-aggregation whose
    ``array_sort(collect_list(struct(idx, line)))`` restores order — the
    same two-shuffle MapReduce the published pipelines use. Everything is
    built-in functions; the DuckDB oracle mirrors it expression for
    expression (zipped unnest, count-distinct per line hash,
    string_agg ORDER BY idx)."""
    lines = docs.select(
        F.col(id_col),
        # \Q..\E: ``sep`` is a LITERAL separator — F.split takes a Java
        # regex, so an unquoted '. ' would split on any-char-plus-space
        F.posexplode(
            F.split(F.col(text_col), F.lit("\\Q" + sep + "\\E"), -1)
        ).alias("idx", "line"),
    ).withColumn("h", F.md5("line"))
    boiler = (
        lines.groupBy("h")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("h")
    )
    tagged = lines.join(
        boiler.withColumn("is_boiler", F.lit(True)), "h", "left"
    ).withColumn("is_boiler", F.coalesce("is_boiler", F.lit(False)))
    kept = (
        tagged.filter(~F.col("is_boiler"))
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "line"))),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("_clean")
        )
    )
    stats = tagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.col("is_boiler").cast("long")).alias("n_removed"),
    )
    out_cols = [
        F.col(id_col),
        F.col("n_lines"),
        F.col("n_removed"),
        F.md5(F.coalesce("_clean", F.lit(""))).alias("clean_md5"),
    ]
    if emit_text:
        # full cleaned text for pipeline composition (plans/web_pipeline
        # feeds it to downstream dedupe); the default stays md5-only so
        # the driver result rows are fixed-width
        out_cols.append(F.coalesce("_clean", F.lit("")).alias("clean_text"))
    return stats.join(kept, id_col, "left").select(*out_cols)
