"""Gopher-style document quality rules (repetition/format heuristics).

The published web-text pipelines (Gopher — Rae et al. 2021 §A1.1, C4,
RefinedWeb) gate documents on cheap structural heuristics before any
model-based filtering. This operator implements the classic rule set as
named per-document booleans plus an overall verdict, complementing
``text_analysis.quality_score`` (which emits continuous ratios — these
are the hard gates a pipeline filters on).

Every threshold is evaluated in INTEGER arithmetic (``cnt * 10 <= 9 *
n`` instead of ``cnt / n <= 0.9``), so there is no float-rounding hazard
between engines and the whole operator is hash-verifiable against a
DuckDB oracle. Rules (document passes when ALL hold):

  * ``ok_word_count``     — 50 ≤ words ≤ 100 000
  * ``ok_mean_word_len``  — mean word length in [3, 10]
  * ``ok_symbol_ratio``   — (# of '#' chars + '...' runs) ≤ 0.1 × words
  * ``ok_bullet_ratio``   — ≤ 90% of lines start with a bullet (- or *)
  * ``ok_ellipsis_ratio`` — ≤ 30% of lines end with '...'
  * ``ok_alpha_words``    — ≥ 80% of words contain a letter
  * ``ok_stopwords``      — ≥ 2 distinct hits from an 8-word English
                            stop list (the Gopher "real text" check)

Words are the shared analysis tokenizer (``text_analysis.words_col``:
lowercased ``[^a-z0-9]+`` split); lines split on newline. At 100 TB this
is a pure per-row projection — higher-order array expressions, no UDF,
no shuffle, whole-stage codegen throughout; the scan reads (id, text)
only. Reference scope note: the reference engine has no quality gate
(`/root/reference/CPPDeduper/main.cpp` goes straight to sketching);
this is part of the training-data surface built on top of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import _WORD_SPLIT

_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _rule_columns(t, w):
    """The seven rule booleans over a coalesced text column ``t`` and its
    token array ``w`` (shared by the filter and the composition
    predicate)."""
    n_words = F.size(w).cast("long")
    word_chars = F.aggregate(
        F.transform(w, F.length), F.lit(0), lambda a, x: a + x
    ).cast("long")

    hash_cnt = (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))).cast(
        "long"
    )
    # '...' runs: non-overlapping left-to-right replace in both engines
    ell_cnt = (
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    ).cast("long")

    lines = F.split(t, "\n")
    n_lines = F.size(lines).cast("long")
    bullet_cnt = F.size(
        F.filter(
            lines,
            lambda x: F.trim(x).startswith("-") | F.trim(x).startswith("*"),
        )
    ).cast("long")
    ell_line_cnt = F.size(
        F.filter(lines, lambda x: F.trim(x).endswith("..."))
    ).cast("long")

    # a token contains a letter iff deleting all letters changes it
    alpha_cnt = F.size(
        F.filter(w, lambda x: F.translate(x, _LETTERS, "") != x)
    ).cast("long")
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(w),
            F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
        )
    ).cast("long")

    ok = {
        "ok_word_count": (n_words >= 50) & (n_words <= 100000),
        "ok_mean_word_len": (n_words > 0)
        & (word_chars >= 3 * n_words)
        & (word_chars <= 10 * n_words),
        "ok_symbol_ratio": (n_words > 0)
        & ((hash_cnt + ell_cnt) * 10 <= n_words),
        "ok_bullet_ratio": bullet_cnt * 10 <= 9 * n_lines,
        "ok_ellipsis_ratio": ell_line_cnt * 10 <= 3 * n_lines,
        "ok_alpha_words": (n_words > 0) & (alpha_cnt * 5 >= 4 * n_words),
        "ok_stopwords": stop_hits >= 2,
    }
    return n_words, ok


def _coalesced(text_col: str):
    t = F.coalesce(F.col(text_col), F.lit(""))
    # same tokenizer as text_analysis.words_col, over the COALESCED text so
    # a NULL document scores (0 words, fails) instead of all-NULL rules
    w = F.array_remove(F.split(F.lower(t), _WORD_SPLIT), "")
    return t, w


def gopher_passes(text_col: str = "text"):
    """Single boolean Column: ALL rules hold — the composition predicate
    (plans/web_pipeline filters on it without materializing the per-rule
    booleans)."""
    _, ok = _rule_columns(*_coalesced(text_col))
    passes = None
    for c in ok.values():
        passes = c if passes is None else (passes & c)
    return passes


def gopher_quality_filter(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_words, ok_* rule booleans, passes) per document."""
    n_words, ok = _rule_columns(*_coalesced(text_col))
    passes = None
    for c in ok.values():
        passes = c if passes is None else (passes & c)
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        *[c.alias(name) for name, c in ok.items()],
        passes.alias("passes"),
    )


def _rules_sql(toks_sql: str, text_sql: str = "text") -> tuple[str, dict]:
    """(n_words expr, {rule name: boolean expr}) — the DuckDB twin of
    ``_rule_columns``; ``toks_sql`` is the caller's tokenizer expression
    (the `_TOKS` twin of ``words_col``)."""
    t = f"coalesce({text_sql}, '')"
    nw = f"len({toks_sql})::BIGINT"
    wc = f"coalesce(list_sum(list_transform({toks_sql}, x -> length(x))), 0)::BIGINT"
    hc = f"(length({t}) - length(replace({t}, '#', '')))::BIGINT"
    ec = f"((length({t}) - length(replace({t}, '...', ''))) // 3)::BIGINT"
    lines = f"string_split({t}, chr(10))"
    nl = f"len({lines})::BIGINT"
    bc = (
        f"len(list_filter({lines}, x -> starts_with(trim(x), '-')"
        f" OR starts_with(trim(x), '*')))::BIGINT"
    )
    elc = f"len(list_filter({lines}, x -> ends_with(trim(x), '...')))::BIGINT"
    ac = (
        f"len(list_filter({toks_sql},"
        f" x -> translate(x, '{_LETTERS}', '') != x))::BIGINT"
    )
    sw = ", ".join(repr(s) for s in _GOPHER_STOPWORDS)
    sh = f"len(list_intersect(list_distinct({toks_sql}), [{sw}]))::BIGINT"
    ok = {
        "ok_word_count": f"({nw} >= 50 AND {nw} <= 100000)",
        "ok_mean_word_len": f"({nw} > 0 AND {wc} >= 3 * {nw} AND {wc} <= 10 * {nw})",
        "ok_symbol_ratio": f"({nw} > 0 AND ({hc} + {ec}) * 10 <= {nw})",
        "ok_bullet_ratio": f"({bc} * 10 <= 9 * {nl})",
        "ok_ellipsis_ratio": f"({elc} * 10 <= 3 * {nl})",
        "ok_alpha_words": f"({nw} > 0 AND {ac} * 5 >= 4 * {nw})",
        "ok_stopwords": f"({sh} >= 2)",
    }
    return nw, ok


def gopher_passes_sql(toks_sql: str, text_sql: str = "text") -> str:
    """Single boolean expression: ALL rules hold (the SQL twin of
    ``gopher_passes`` for pipeline-composition oracles)."""
    _, ok = _rules_sql(toks_sql, text_sql)
    return "(" + " AND ".join(ok.values()) + ")"


def gopher_quality_sql(
    toks_sql: str, id_sql: str = "doc_id", text_sql: str = "text"
) -> str:
    """DuckDB mirror (SELECT over a relation exposing ``{id,text}``)."""
    nw, ok = _rules_sql(toks_sql, text_sql)
    cols = ", ".join(f"{expr} AS {name}" for name, expr in ok.items())
    allok = " AND ".join(ok.values())
    return (
        f"SELECT {id_sql}, {nw} AS n_words, {cols}, ({allok}) AS passes"
    )
