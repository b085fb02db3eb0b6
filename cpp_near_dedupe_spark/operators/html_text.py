"""HTML → text extraction over the pages table's ``html`` binary column.

The north-rule input table carries raw page markup (``html binary``)
alongside extracted ``text``; a crawl pipeline's first content step is
producing that text column FROM the markup (the reference consumes
pre-extracted text — `/root/reference/CPPDeduper/ArrowLoaderThread.h`
reads a ready-made text column — so this operator is the upstream stage
a Spark user needs before any of the dedup machinery runs).

This is a conservative, dependency-free extraction — the regex subset
that Java regex (Spark) and RE2 (DuckDB) implement identically, so the
whole operator is hash-verifiable against a DuckDB oracle:

  1. UTF-8 decode the binary column (``cast(html as string)`` /
     ``decode(html)``);
  2. drop ``<script>…</script>`` and ``<style>…</style>`` blocks and
     HTML comments (``(?is)`` inline flags + lazy quantifiers — both
     engines support these; backreferences are avoided because RE2 has
     none, hence two separate script/style passes);
  3. strip every remaining tag to a space;
  4. decode the five ubiquitous entities (&lt; &gt; &quot; &#39; &nbsp;)
     and LAST ``&amp;`` (so ``&amp;lt;`` decodes to the literal ``&lt;``
     the author wrote, not to ``<``);
  5. collapse whitespace runs (explicit ``[ \\t\\r\\n\\f]`` class —
     ``\\s`` differs between the engines on vertical-tab) and trim.

At 100 TB this is a narrow projection: per-row string expressions, fully
codegen'd, no UDF, no shuffle — the scan's ReadSchema carries only the
id and html columns and every executor streams batches through
whole-stage codegen. Real-world extraction quality beyond this (DOM
parsing, boilerplate removal a la trafilatura) needs a Python library
that is not in this container; the seam for it is a ``mapInPandas`` over
the same (id, html) projection, and the repeated-line operator
(text_analysis.remove_repeated_lines) already covers corpus-level
boilerplate downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) applied in order, all-global, both engines.
_TAG_PASSES = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]*>", " "),
)

# plain substring replaces; &amp; LAST (see module docstring)
_ENTITY_PASSES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

_WS = r"[ \t\r\n\f]+"


def extract_text(html_col: Column) -> Column:
    """html binary/string column → extracted plain-text column."""
    s = html_col.cast("string")
    for pat, rep in _TAG_PASSES:
        s = F.regexp_replace(s, pat, rep)
    for ent, ch in _ENTITY_PASSES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, _WS, " "))


def html_extract_text(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, extracted_text, n_chars) for every page."""
    ext = extract_text(F.col(html_col))
    return pages.select(
        F.col(url_col).alias("url"),
        ext.alias("extracted_text"),
        F.length(ext).cast("long").alias("n_chars"),
    )


def extract_text_sql(html_sql: str) -> str:
    """DuckDB mirror of ``extract_text`` over a BLOB/VARCHAR expression
    (kept next to the implementation so the rule lists stay in sync)."""
    s = f"decode({html_sql})"
    for pat, rep in _TAG_PASSES:
        # DuckDB regexp_replace is first-match-only without the 'g'
        # option; standard-SQL strings pass backslashes through verbatim,
        # so the Python pattern is embedded as-is (quotes doubled only)
        pat_sql = pat.replace("'", "''")
        s = f"regexp_replace({s}, '{pat_sql}', '{rep}', 'g')"
    for ent, ch in _ENTITY_PASSES:
        ch_sql = ch.replace("'", "''")
        s = f"replace({s}, '{ent}', '{ch_sql}')"
    return f"trim(regexp_replace({s}, '[ \\t\\r\\n\\f]+', ' ', 'g'))"
