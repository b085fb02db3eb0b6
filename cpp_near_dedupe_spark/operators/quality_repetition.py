"""Gopher-style per-document repetition rules (Rae et al. 2021 §A1.2).

The format gate (``quality_rules``, Gopher §A1.1) rejects documents whose
*shape* is wrong; this operator implements the companion *repetition*
signals that catch boilerplate-heavy pages — the per-document complement
of the corpus-wide ``text_analysis.remove_repeated_lines``. Signals (all
per document, thresholds from Gopher Table A1):

  * ``ok_dup_line_frac``   — duplicate lines ≤ 30% of lines
  * ``ok_dup_para_frac``   — duplicate paragraphs ≤ 30% of paragraphs
  * ``ok_dup_line_chars``  — chars in duplicate line occurrences ≤ 20%
  * ``ok_dup_para_chars``  — chars in duplicate paragraph occ.   ≤ 20%
  * ``ok_top{2,3,4}gram``  — chars of the single most frequent word
                             n-gram ≤ {20, 18, 16}% of the document
  * ``ok_dup{5..10}gram``  — chars of word n-grams occurring ≥ 2 times
                             ≤ {15, 14, 13, 12, 11, 10}%

Exact counting conventions (deterministic, engine-portable — published
implementations vary, so they are pinned here): lines split on ``\\n``,
paragraphs on ``\\n\\n``; "duplicate" line/paragraph chars count the
occurrences BEYOND the first (the removable mass); top-n-gram chars are
``max over n-grams of freq × length`` and duplicate-n-gram chars are
``Σ over n-grams with freq ≥ 2 of freq × length`` (ALL occurrences,
overlap-naive, as in the Gopher text); n-gram length includes the single
joining spaces; every denominator is ``length(text)``. Words are the
shared analysis tokenizer (``text_analysis.words_col`` over the coalesced
text). All thresholds are evaluated in INTEGER cross-multiplication
(``chars * 5 <= total`` instead of ``chars / total <= 0.2``), so the
operator is hash-verifiable against a DuckDB oracle.

Scale: a per-row map — no shuffle, no window. Splitting (lower + regex
tokenize, line/paragraph split) stays JVM-side, so the engine-parity
contract is exactly the one every other hash-green text query already
relies on; the frequency counting runs in ONE batch-GLOBAL vectorized
Arrow kernel (``repetition_counts_batch`` under a ``pandas_udf`` — r6;
the per-doc ``repetition_counts`` loop stays as the readable definition
and equality oracle) because the same counts as Catalyst higher-order
``aggregate`` lambdas are interpreted per-element and measured ~50×
slower (37 s for 5k docs vs <1 s) — the same batch-kernel trade
``operators/simhash.py`` makes. The kernel sees only pre-split
token/line arrays (no locale-sensitive work), runs a handful of O(N)
factorize/unique passes per batch (memory bounded by the token-budget
split), and is embarrassingly parallel at 100 TB.
The DuckDB oracle (``gopher_repetition_sql``) replays the counts
relationally (unnest → per-doc GROUP BY), which is free to shuffle
because it only ever runs at verification scale. Reference scope note:
the reference engine has no quality stage
(`/root/reference/CPPDeduper/main.cpp` goes straight to sketching); this
extends the training-data surface built on top of it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import _WORD_SPLIT

# (signal name, n, numerator multiplier, denominator multiplier): rule is
# ``chars * num_mult <= den_mult * length(text)`` — the integer form of
# chars/total <= threshold. Gopher Table A1 thresholds.
_TOP_NGRAM_RULES = [("top2gram", 2, 5, 1), ("top3gram", 3, 50, 9), ("top4gram", 4, 25, 4)]
_DUP_NGRAM_RULES = [
    ("dup5gram", 5, 20, 3),
    ("dup6gram", 6, 50, 7),
    ("dup7gram", 7, 100, 13),
    ("dup8gram", 8, 25, 3),
    ("dup9gram", 9, 100, 11),
    ("dup10gram", 10, 10, 1),
]


_NGRAM_NS = [n for _, n, _, _ in _TOP_NGRAM_RULES + _DUP_NGRAM_RULES]
_COUNT_FIELDS = (
    ["n_lines", "dup_line_cnt", "dup_line_chars",
     "n_paras", "dup_para_cnt", "dup_para_chars"]
    + [f"{name}_chars" for name, _, _, _ in _TOP_NGRAM_RULES + _DUP_NGRAM_RULES]
)


def _seg_counts(arr) -> tuple:
    """(n, duplicate count beyond first, duplicate chars beyond first)."""
    freq: dict = {}
    for s in arr:
        freq[s] = freq.get(s, 0) + 1
    n = len(arr)
    dup_cnt = n - len(freq)
    dup_chars = sum((c - 1) * len(s) for s, c in freq.items() if c > 1)
    return n, dup_cnt, dup_chars


def _ngram_stats(toks, n: int) -> tuple:
    """(max over n-grams of freq × chars, Σ over n-grams with freq ≥ 2 of
    freq × chars); n-gram chars include the single joining spaces. Tokens
    are interned to small-int ids so the counting keys are int tuples."""
    m = len(toks) - n + 1
    if m <= 0:
        return 0, 0
    ids: dict = {}
    id_of = [ids.setdefault(t, len(ids)) for t in toks]
    lens = [len(t) for t in toks]
    pre = [0]
    for ln in lens:
        pre.append(pre[-1] + ln)
    stats: dict = {}
    for i in range(m):
        key = tuple(id_of[i : i + n])
        e = stats.get(key)
        if e is None:
            stats[key] = [1, pre[i + n] - pre[i] + n - 1]
        else:
            e[0] += 1
    top = 0
    dup = 0
    for c, ln in stats.values():
        v = c * ln
        if v > top:
            top = v
        if c >= 2:
            dup += v
    return top, dup


def repetition_counts(toks, lines, paras) -> list:
    """The 15 integer repetition counts for one document (kernel body —
    module-level for direct testing; the pandas_udf maps it per row)."""
    out = list(_seg_counts(lines)) + list(_seg_counts(paras))
    per_n = {n: _ngram_stats(toks, n) for n in set(_NGRAM_NS)}
    for _, n, _, _ in _TOP_NGRAM_RULES:
        out.append(per_n[n][0])
    for _, n, _, _ in _DUP_NGRAM_RULES:
        out.append(per_n[n][1])
    return out


def _flatten(seqs) -> tuple[np.ndarray, np.ndarray]:
    """list of per-doc string sequences → (flat object array, per-doc
    counts). Empty-total batches yield an empty object array."""
    m = len(seqs)
    counts = np.fromiter((len(s) for s in seqs), dtype=np.int64, count=m)
    if counts.sum() == 0:
        return np.empty(0, dtype=object), counts
    flat = np.concatenate(
        [np.asarray(s, dtype=object) for s in seqs if len(s)]
    )
    return flat, counts


#: max total tokens one batch-global kernel pass may hold (see the memory
#: guard in ``repetition_counts_batch``)
_BATCH_TOKEN_BUDGET = 2_000_000


def repetition_counts_batch(toks_list, lines_list, paras_list) -> np.ndarray:
    """(m, 15) int64 — the batch-GLOBAL vectorized twin of the per-doc
    ``repetition_counts`` loop (pinned element-equal by
    tests/test_quality_repetition.py). Same design as the simhash batch
    kernel (operators/simhash.py): all documents of the Arrow batch are
    processed in a handful of whole-batch numpy/pandas passes instead of
    dozens of small dict loops per document.

    * strings are interned ONCE per batch with ``pd.factorize`` (khash,
      C-speed) — exact, no hashing shortcuts;
    * line/paragraph duplicate stats: one ``np.unique`` over packed
      (doc, string-id) int64 keys + ``np.bincount`` segment aggregation;
    * n-gram stats (9 sizes): iterative gram interning — the id of the
      n-gram ending at position i is ``factorize(id_{n-1}[i-1] · U +
      tok[i])``, one O(N) khash pass per level (the classic suffix-
      doubling-style trick, no wide-row sorts); per-(doc, gram) counts
      from one int64 ``np.unique`` per counted level, then per-doc
      max/sum via ``np.maximum.at`` / ``np.bincount`` over unique grams.
      Positions whose within-doc offset < n-1 carry garbage ids (their
      window would span a doc boundary) and are masked out before
      counting; they cannot corrupt later levels because a position is
      valid at level n only if its predecessor was valid at level n-1.
    """
    m = len(toks_list)
    out = np.zeros((m, 15), dtype=np.int64)
    if m == 0:
        return out

    # memory guard: the batch-global arrays are O(total tokens) × ~10
    # int64 columns. Arrow batches are capped in ROWS (maxRecordsPerBatch),
    # not bytes, so a batch of pathologically long documents could exceed
    # worker memory — split it in half by document (per-doc stats are
    # independent, so the split is exact) until each chunk fits the token
    # budget (~2M tokens ≈ 200 MB of working arrays).
    if m > 1:
        total = sum(len(t) for t in toks_list)
        if total > _BATCH_TOKEN_BUDGET:
            h = m // 2
            return np.vstack(
                [
                    repetition_counts_batch(
                        toks_list[:h], lines_list[:h], paras_list[:h]
                    ),
                    repetition_counts_batch(
                        toks_list[h:], lines_list[h:], paras_list[h:]
                    ),
                ]
            )

    # --- line / paragraph duplicate stats (columns 0..5) -------------------
    for base, seqs in ((0, lines_list), (3, paras_list)):
        flat, counts = _flatten(seqs)
        out[:, base] = counts  # n_lines / n_paras
        if not len(flat):
            continue
        codes, uniques = pd.factorize(flat)
        seg_lens = np.fromiter(
            (len(s) for s in uniques), dtype=np.int64, count=len(uniques)
        )
        doc_idx = np.repeat(np.arange(m, dtype=np.int64), counts)
        key = doc_idx * np.int64(len(uniques)) + codes
        ukey, c = np.unique(key, return_counts=True)
        udoc = ukey // len(uniques)
        uln = seg_lens[ukey % len(uniques)]
        # dup count beyond first = n - distinct
        out[:, base + 1] = counts - np.bincount(udoc, minlength=m)
        out[:, base + 2] = np.bincount(
            udoc, weights=(c - 1) * uln, minlength=m
        ).astype(np.int64)

    # --- word n-gram stats (columns 6..14) ---------------------------------
    flat_toks, tok_counts = _flatten(toks_list)
    if not len(flat_toks):
        return out
    n_tok = len(flat_toks)
    tok_codes, tok_uniques = pd.factorize(flat_toks)
    tok_codes = tok_codes.astype(np.int64)
    n_vocab = np.int64(len(tok_uniques))
    tok_lens = np.fromiter(
        (len(t) for t in tok_uniques), dtype=np.int64, count=len(tok_uniques)
    )
    # global char prefix over the concatenated stream (doc spans are
    # contiguous, so within-doc differences equal the per-doc prefix sums)
    gpre = np.zeros(n_tok + 1, dtype=np.int64)
    np.cumsum(tok_lens[tok_codes], out=gpre[1:])
    doc_start = np.zeros(m, dtype=np.int64)
    np.cumsum(tok_counts[:-1], out=doc_start[1:])
    tok_doc = np.repeat(np.arange(m, dtype=np.int64), tok_counts)
    # within-doc position of every token (0-based)
    offset = np.arange(n_tok, dtype=np.int64) - np.repeat(doc_start, tok_counts)

    col_of = {2: 6, 3: 7, 4: 8, 5: 9, 6: 10, 7: 11, 8: 12, 9: 13, 10: 14}
    gram_id = tok_codes  # level-1 gram id ending at position i
    for n in range(2, max(_NGRAM_NS) + 1):
        prev = np.empty(n_tok, dtype=np.int64)
        prev[0] = 0
        prev[1:] = gram_id[:-1]
        gram_id, _ = pd.factorize(prev * n_vocab + tok_codes)
        if n not in col_of:
            continue
        valid = np.flatnonzero(offset >= n - 1)  # window fits in the doc
        if not len(valid):
            continue
        key = gram_id[valid] * np.int64(m) + tok_doc[valid]
        ukey, first, c = np.unique(key, return_index=True, return_counts=True)
        vi = valid[first]  # flat END position of one occurrence
        udoc = ukey % m
        uchars = gpre[vi + 1] - gpre[vi - n + 1] + n - 1
        v = c * uchars
        col = col_of[n]
        if n <= 4:  # top-n-gram rules: max over grams of freq × chars
            np.maximum.at(out[:, col], udoc, v)
        else:  # dup-n-gram rules: Σ over grams with freq ≥ 2
            dup_mask = c >= 2
            if dup_mask.any():
                out[:, col] = np.bincount(
                    udoc[dup_mask], weights=v[dup_mask], minlength=m
                ).astype(np.int64)
    return out


def gopher_repetition_filter(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, counts, ok_* rule booleans, passes_repetition) per document."""
    struct_type = "struct<" + ", ".join(f"{f}: long" for f in _COUNT_FIELDS) + ">"

    @F.pandas_udf(struct_type)
    def _kernel(toks: pd.Series, lines: pd.Series, paras: pd.Series) -> pd.DataFrame:
        counts = repetition_counts_batch(
            toks.tolist(), lines.tolist(), paras.tolist()
        )
        return pd.DataFrame(counts, columns=_COUNT_FIELDS)

    t = F.coalesce(F.col(text_col), F.lit(""))
    w = F.array_remove(F.split(F.lower(t), _WORD_SPLIT), "")
    split = docs.select(
        F.col(id_col),
        F.length(t).cast("long").alias("total_chars"),
        _kernel(w, F.split(t, "\n"), F.split(t, "\n\n")).alias("k"),
    )

    total = F.col("total_chars")
    k = {f: F.col(f"k.{f}") for f in _COUNT_FIELDS}
    ok = {
        "ok_dup_line_frac": k["dup_line_cnt"] * 10 <= 3 * k["n_lines"],
        "ok_dup_para_frac": k["dup_para_cnt"] * 10 <= 3 * k["n_paras"],
        "ok_dup_line_chars": k["dup_line_chars"] * 5 <= total,
        "ok_dup_para_chars": k["dup_para_chars"] * 5 <= total,
    }
    for name, _, num, den in _TOP_NGRAM_RULES + _DUP_NGRAM_RULES:
        ok[f"ok_{name}"] = k[f"{name}_chars"] * num <= den * total

    passes = None
    for c in ok.values():
        passes = c if passes is None else (passes & c)
    return split.select(
        F.col(id_col),
        total,
        *[c.alias(name) for name, c in k.items()],
        *[c.alias(name) for name, c in ok.items()],
        passes.alias("passes_repetition"),
    )


def gopher_repetition_sql(
    toks_sql: str, source: str = "documents", id_sql: str = "doc_id"
) -> str:
    """DuckDB oracle: the same counts replayed relationally (unnest →
    per-doc GROUP BY — fine at verification scale). ``toks_sql`` is the
    caller's tokenizer twin bound to column ``text``."""
    top = {name: (n, num, den) for name, n, num, den in _TOP_NGRAM_RULES}
    dup = {name: (n, num, den) for name, n, num, den in _DUP_NGRAM_RULES}

    def ng_cte(name: str, n: int) -> str:
        return f"""
ng_{name} AS (
  SELECT {id_sql}, ng, count(*)::BIGINT AS c, length(ng)::BIGINT AS ln
  FROM (
    SELECT {id_sql},
           unnest(list_transform(range(1, greatest(len(w) - {n} + 2, 1)),
                                 i -> array_to_string(w[i:i+{n - 1}], ' '))) AS ng
    FROM toks
  ) GROUP BY 1, 2
)"""

    top_ctes = ",".join(ng_cte(name, n) for name, (n, _, _) in top.items())
    dup_ctes = ",".join(ng_cte(name, n) for name, (n, _, _) in dup.items())
    top_aggs = ",".join(
        f"""
agg_{name} AS (SELECT {id_sql}, max(c * ln) AS v FROM ng_{name} GROUP BY 1)"""
        for name in top
    )
    dup_aggs = ",".join(
        f"""
agg_{name} AS (SELECT {id_sql}, sum(CASE WHEN c >= 2 THEN c * ln ELSE 0 END) AS v
               FROM ng_{name} GROUP BY 1)"""
        for name in dup
    )
    joins = "".join(
        f"\nLEFT JOIN agg_{name} USING ({id_sql})" for name in [*top, *dup]
    )
    chars_cols = ",\n       ".join(
        f"coalesce(agg_{name}.v, 0)::BIGINT AS {name}_chars" for name in [*top, *dup]
    )
    ok_cols = ",\n       ".join(
        f"coalesce(agg_{name}.v, 0) * {num} <= {den} * total_chars AS ok_{name}"
        for name, (_, num, den) in {**top, **dup}.items()
    )
    all_ok = " AND ".join(
        ["ok_dup_line_frac", "ok_dup_para_frac", "ok_dup_line_chars",
         "ok_dup_para_chars"]
        + [f"ok_{name}" for name in [*top, *dup]]
    )
    return f"""
WITH d AS (
  SELECT {id_sql}, coalesce(text, '') AS t FROM {source}
),
toks AS (
  SELECT {id_sql}, {toks_sql.replace('text', 't')} AS w,
         length(t)::BIGINT AS total_chars FROM d
),
seg AS (
  SELECT {id_sql}, l, count(*)::BIGINT AS c, length(l)::BIGINT AS ln
  FROM (SELECT {id_sql}, unnest(string_split(t, chr(10))) AS l FROM d)
  GROUP BY 1, 2
),
seg_stats AS (
  SELECT {id_sql}, sum(c) AS n_lines, sum(c - 1) AS dup_line_cnt,
         sum((c - 1) * ln) AS dup_line_chars
  FROM seg GROUP BY 1
),
par AS (
  SELECT {id_sql}, p, count(*)::BIGINT AS c, length(p)::BIGINT AS ln
  FROM (SELECT {id_sql},
               unnest(string_split(t, chr(10) || chr(10))) AS p FROM d)
  GROUP BY 1, 2
),
par_stats AS (
  SELECT {id_sql}, sum(c) AS n_paras, sum(c - 1) AS dup_para_cnt,
         sum((c - 1) * ln) AS dup_para_chars
  FROM par GROUP BY 1
),{top_ctes},{dup_ctes},{top_aggs},{dup_aggs}
SELECT toks.{id_sql},
       total_chars,
       n_lines::BIGINT AS n_lines,
       dup_line_cnt::BIGINT AS dup_line_cnt,
       dup_line_chars::BIGINT AS dup_line_chars,
       n_paras::BIGINT AS n_paras,
       dup_para_cnt::BIGINT AS dup_para_cnt,
       dup_para_chars::BIGINT AS dup_para_chars,
       {chars_cols},
       dup_line_cnt * 10 <= 3 * n_lines AS ok_dup_line_frac,
       dup_para_cnt * 10 <= 3 * n_paras AS ok_dup_para_frac,
       dup_line_chars * 5 <= total_chars AS ok_dup_line_chars,
       dup_para_chars * 5 <= total_chars AS ok_dup_para_chars,
       {ok_cols},
       ({all_ok}) AS passes_repetition
FROM toks
JOIN seg_stats USING ({id_sql})
JOIN par_stats USING ({id_sql}){joins}
"""
