"""C4-style line and page filters (Raffel et al. 2020 §2.2).

The third published web-text cleaning family next to the Gopher gates
(``quality_rules``, ``quality_repetition``): C4 cleans at the LINE level
and then gates the page. Rules implemented (the public set):

  line kept iff ALL of:
    * ends in terminal punctuation — one of ``.``, ``!``, ``?``, ``"``
      (after trimming spaces)
    * has ≥ 3 whitespace-separated words
    * does not contain the word "javascript" (case-insensitive)
  page kept (``keep_page``) iff ALL of:
    * the CLEANED text contains ≥ 3 sentence terminators (counted as
      occurrences of ``.``/``!``/``?`` — the deterministic stand-in for
      C4's sentence count, pinned here)
    * the original text does not contain "lorem ipsum" (lowercased)
    * the original text does not contain ``{`` (the code heuristic)

C4's final rule — a bad-words blocklist — is deployment-specific policy
(the published pipeline points at an external list), so it is not baked
in; apply it as one more ``F.filter`` predicate over the same lines.

Output per document: the cleaned text plus audit counts, all computed by
pure codegen'd expressions — no UDF, no shuffle, no window; the scan
reads (id, text) only. The DuckDB twin (``c4_clean_sql``) mirrors every
expression, so the operator is hash-verifiable end to end. Reference
scope note: the reference engine has no cleaning stage
(`/root/reference/CPPDeduper/main.cpp` goes straight to sketching); this
extends the training-data surface built on top of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TERMINALS = (".", "!", "?", '"')


def _line_kept(x: Column) -> Column:
    s = F.trim(x)
    ends_ok = None
    for term in _TERMINALS:
        c = s.endswith(term)
        ends_ok = c if ends_ok is None else (ends_ok | c)
    words = F.size(F.array_remove(F.split(s, "\\s+"), ""))
    return ends_ok & (words >= 3) & ~F.contains(F.lower(x), F.lit("javascript"))


def _terminator_count(c: Column) -> Column:
    cnt = None
    for term in (".", "!", "?"):
        k = (F.length(c) - F.length(F.replace(c, F.lit(term), F.lit("")))).cast("long")
        cnt = k if cnt is None else (cnt + k)
    return cnt


def c4_clean(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, clean_text, n_lines, n_lines_kept, n_sentences, has_lorem_ipsum,
    has_brace, keep_page) per document."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, "\n")
    kept = F.filter(lines, _line_kept)
    clean = F.array_join(kept, "\n")
    n_sent = _terminator_count(clean)
    lorem = F.contains(F.lower(t), F.lit("lorem ipsum"))
    brace = F.contains(t, F.lit("{"))
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        n_sent.alias("n_sentences"),
        lorem.alias("has_lorem_ipsum"),
        brace.alias("has_brace"),
        ((n_sent >= 3) & ~lorem & ~brace).alias("keep_page"),
    )


def c4_clean_sql(source: str = "documents", id_sql: str = "doc_id") -> str:
    """DuckDB mirror of ``c4_clean`` (expression-for-expression)."""
    t = "coalesce(text, '')"
    line_ok = (
        "(ends_with(trim(x), '.') OR ends_with(trim(x), '!')"
        " OR ends_with(trim(x), '?') OR ends_with(trim(x), '\"'))"
        " AND len(list_filter(string_split_regex(trim(x), '\\s+'),"
        " w -> w != '')) >= 3"
        " AND NOT contains(lower(x), 'javascript')"
    )
    sent = " + ".join(
        f"(length(clean_text) - length(replace(clean_text, '{term}', '')))"
        for term in (".", "!", "?")
    )
    return f"""
WITH d AS (
  SELECT {id_sql},
         {t} AS t,
         coalesce(array_to_string(list_filter(string_split({t}, chr(10)),
                                              x -> {line_ok}), chr(10)),
                  '') AS clean_text,
         len(string_split({t}, chr(10)))::BIGINT AS n_lines,
         len(list_filter(string_split({t}, chr(10)),
                         x -> {line_ok}))::BIGINT AS n_lines_kept
  FROM {source}
)
SELECT {id_sql}, clean_text, n_lines, n_lines_kept,
       ({sent})::BIGINT AS n_sentences,
       contains(lower(t), 'lorem ipsum') AS has_lorem_ipsum,
       contains(t, '{{') AS has_brace,
       (({sent}) >= 3 AND NOT contains(lower(t), 'lorem ipsum')
        AND NOT contains(t, '{{')) AS keep_page
FROM d
"""
