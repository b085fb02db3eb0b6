"""PII detection and redaction over the documents/pages text column.

Training-data pipelines scrub personally identifiable information before
a corpus ships (the reference has no such stage — it stops at duplicate
removal, `/root/reference/CPPDeduper/DupeResolverThread.h` — but every
production web-text pipeline runs one). This operator covers the three
classically regex-detectable classes with conservative patterns drawn
from the Java-regex ∩ RE2 subset (no backreferences, no lookaround,
explicit character classes), so detection AND redaction are
hash-verifiable against a DuckDB oracle:

  * e-mail addresses     → ``<EMAIL>``
  * IPv4 addresses       → ``<IP>``
  * NNN[-.]NNN[-.]NNNN phone shapes → ``<PHONE>``

Counts are measured on the RAW text, each class independently (no
interaction with the other classes' redactions); the scrubbed text
applies the three passes in the order above. The e-mail pattern cannot
match inside an already-redacted ``<IP>`` token and vice versa, so pass
order only matters for pathological overlaps (documented, not defended —
a real deployment swaps in an NER model via ``mapInPandas`` on the same
projection).

At 100 TB: narrow projection, per-row codegen'd regex, no UDF, no
shuffle. ``regexp_extract_all``/``regexp_replace`` run JVM-side inside
whole-stage codegen; the scan reads only (id, text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java-regex ∩ RE2: [0-9] not \d (identical anyway, but explicit), \b is
# supported by both, {m,n} quantifiers, no backrefs/lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"

_PASSES = (
    (EMAIL_RE, "<EMAIL>", "n_emails"),
    (IPV4_RE, "<IP>", "n_ips"),
    (PHONE_RE, "<PHONE>", "n_phones"),
)


def pii_scrub_expr(text_col: str = "text"):
    """Scrubbed-text Column (all three passes, in order) — the
    expression-level face for pipeline composition."""
    scrubbed = F.coalesce(F.col(text_col), F.lit(""))
    for pat, token, _ in _PASSES:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return scrubbed


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text_scrubbed, n_emails, n_ips, n_phones) per document."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    scrubbed = raw
    counts = []
    for pat, token, name in _PASSES:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
        # F.lit(pat) (not an F.expr SQL literal) so the pattern's
        # backslashes survive — Spark's SQL parser eats unknown escapes
        counts.append(
            F.size(F.regexp_extract_all(raw, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(name)
        )
    return docs.select(
        F.col(id_col), scrubbed.alias("text_scrubbed"), *counts
    )


def pii_scrub_expr_sql(text_sql: str = "text") -> str:
    """DuckDB twin of ``pii_scrub_expr`` (scrubbed-text expression)."""
    scrubbed = f"coalesce({text_sql}, '')"
    for pat, token, _ in _PASSES:
        pat_sql = pat.replace("'", "''")
        scrubbed = f"regexp_replace({scrubbed}, '{pat_sql}', '{token}', 'g')"
    return scrubbed


def pii_scrub_sql(id_sql: str = "doc_id", text_sql: str = "text") -> str:
    """DuckDB mirror of ``pii_scrub`` (SELECT-list fragment source)."""
    raw = f"coalesce({text_sql}, '')"
    counts = []
    for pat, token, name in _PASSES:
        pat_sql = pat.replace("'", "''")
        counts.append(
            f"len(regexp_extract_all({raw}, '{pat_sql}'))::BIGINT AS {name}"
        )
    return (
        f"SELECT {id_sql}, {pii_scrub_expr_sql(text_sql)} AS text_scrubbed, "
        + ", ".join(counts)
    )
