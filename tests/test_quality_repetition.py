"""Gopher §A1.2 repetition rules (operators/quality_repetition.py)."""

from pyspark.sql import functions as F


def _rep(spark, rows):
    from cpp_near_dedupe_spark.operators.quality_repetition import (
        gopher_repetition_filter,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = gopher_repetition_filter(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


CLEAN = (
    "the quick brown fox jumps over one lazy dog while seven other animals "
    "watch from behind a tall green fence near the old stone barn today "
    "meanwhile across the river two farmers discuss how much rain fell "
    "during april and whether planting corn earlier might improve their "
    "harvest given that last autumn brought an unusually warm spell which "
    "confused both birds and insects alike throughout most of this valley"
)


def test_clean_doc_passes(spark):
    out = _rep(spark, [(1, CLEAN)])
    r = out[1]
    assert r["passes_repetition"] is True
    assert r["dup_line_cnt"] == 0 and r["dup_para_cnt"] == 0
    assert all(v for k, v in r.items() if k.startswith("ok_"))


def test_duplicate_lines_counted(spark):
    text = CLEAN + "\nsame line\nsame line\nsame line"
    r = _rep(spark, [(1, text)])[1]
    # 4 lines, 'same line' ×3 → 2 occurrences beyond the first
    assert r["n_lines"] == 4
    assert r["dup_line_cnt"] == 2
    assert r["dup_line_chars"] == 2 * len("same line")
    # 2/4 lines duplicated > 30%
    assert r["ok_dup_line_frac"] is False


def test_duplicate_paragraphs_counted(spark):
    text = CLEAN + "\n\nsame para\n\nsame para\n\nsame para"
    r = _rep(spark, [(1, text)])[1]
    assert r["n_paras"] == 4
    assert r["dup_para_cnt"] == 2
    assert r["dup_para_chars"] == 2 * len("same para")
    assert r["ok_dup_para_frac"] is False


def test_top_ngram_chars(spark):
    # 'alpha beta' ×6 dominates: top 2-gram chars = 6 × len('alpha beta')
    text = " ".join(["alpha beta"] * 6)
    r = _rep(spark, [(1, text)])[1]
    assert r["top2gram_chars"] == 6 * len("alpha beta")
    # 59/65 chars in the top 2-gram ≫ 20%
    assert r["ok_top2gram"] is False


def test_dup_ngram_counts_all_occurrences(spark):
    # a 5-gram phrase repeated twice with unique filler between: every
    # 5-gram inside the repeated phrase occurs exactly twice, and the
    # duplicate count includes BOTH occurrences (freq × length)
    phrase = "one two three four five"
    text = phrase + " unique filler words here " + phrase
    r = _rep(spark, [(1, text)])[1]
    assert r["dup5gram_chars"] == 2 * len(phrase)


def test_short_doc_has_no_ngrams(spark):
    r = _rep(spark, [(1, "only three words")])[1]
    assert r["dup5gram_chars"] == 0 and r["dup10gram_chars"] == 0
    assert r["top4gram_chars"] == 0
    # 3 words still yield 2-grams
    assert r["top2gram_chars"] > 0


def test_null_and_empty_text(spark):
    out = _rep(spark, [(1, None), (2, "")])
    for i in (1, 2):
        r = out[i]
        assert r["total_chars"] == 0
        assert r["n_lines"] == 1 and r["dup_line_cnt"] == 0
        # vacuous pass — the §A1.1 word-count gate rejects empties
        assert r["passes_repetition"] is True


def test_plan_is_shuffle_free(spark):
    """The production operator is a per-row map (JVM split → Arrow kernel
    → projection): no exchange, no window, no aggregate node in the
    physical plan."""
    from cpp_near_dedupe_spark.operators.quality_repetition import (
        gopher_repetition_filter,
    )

    df = spark.createDataFrame([(1, CLEAN)], "doc_id long, text string")
    plan = gopher_repetition_filter(df)._jdf.queryExecution().toString()
    for node in ("Exchange", "Window", "HashAggregate", "SortAggregate"):
        assert node not in plan, node


def test_matches_duckdb_on_adversarial_text(spark):
    """Cross-engine parity on text nastier than the driver corpus: every
    count and rule boolean must agree row-for-row with the DuckDB mirror."""
    import random

    import duckdb
    import pandas as pd

    from cpp_near_dedupe_spark.operators.quality_repetition import (
        gopher_repetition_filter,
        gopher_repetition_sql,
    )

    rng = random.Random(11)
    pieces = [
        "the", "be", "spam", "\n", "\n\n", "same line\n", "word " * 5,
        "lorem ipsum dolor sit amet ", "", "  ", "x1 y2 z3", "a" * 30,
        "tail...", "#", "naïve café",
    ]
    rows = [(0, None), (1, ""), (2, "\n" * 10), (3, ("ab cd ef gh ij " * 40))]
    for i in range(4, 150):
        rows.append(
            (i, "".join(rng.choice(pieces) for _ in range(rng.randint(0, 60))))
        )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        gopher_repetition_filter(df)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    toks = (
        "list_filter(string_split_regex(lower(coalesce(text, '')), "
        "'[^a-z0-9]+'), x -> x != '')"
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    exp = (
        con.execute(
            gopher_repetition_sql(toks, source="t")
            + " ORDER BY doc_id"
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert sorted(got.columns) == sorted(exp.columns)
    for col in got.columns:
        assert [*map(int, got[col])] == [*map(int, exp[col])], col


# --- kernel-level property tests (no Spark session needed) ----------------


def test_kernel_ngram_stats_match_bruteforce():
    """_ngram_stats (interned-id tuples + prefix sums) equals the obvious
    string-ngram Counter formulation on random token streams."""
    import random
    from collections import Counter

    from cpp_near_dedupe_spark.operators.quality_repetition import _ngram_stats

    rng = random.Random(3)
    vocab = ["a", "bb", "ccc", "dddd", "e", "ff", "naïve"]
    for trial in range(200):
        toks = [rng.choice(vocab) for _ in range(rng.randint(0, 40))]
        for n in (2, 3, 5, 10):
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            freq = Counter(grams)
            top = max((c * len(g) for g, c in freq.items()), default=0)
            dup = sum(c * len(g) for g, c in freq.items() if c >= 2)
            assert _ngram_stats(toks, n) == (top, dup), (trial, n, toks)


def test_batch_kernel_matches_perdoc_kernel():
    """repetition_counts_batch (r6 batch-global vectorized kernel) is
    element-equal to the per-doc repetition_counts loop on adversarial
    random batches — empty docs, no-token docs, heavy repetition, mixed."""
    import random

    import numpy as np

    from cpp_near_dedupe_spark.operators.quality_repetition import (
        repetition_counts,
        repetition_counts_batch,
    )

    rng = random.Random(17)
    vocab = ["a", "bb", "ccc", "dddd", "e", "ff", "naïve", "x1"]
    lines_vocab = ["", "x", "same line", "other", "  "]
    for _ in range(20):
        m = rng.randint(0, 12)
        toks_l, lines_l, paras_l = [], [], []
        for _ in range(m):
            toks_l.append([rng.choice(vocab) for _ in range(rng.randint(0, 30))])
            lines_l.append([rng.choice(lines_vocab) for _ in range(rng.randint(1, 8))])
            paras_l.append([rng.choice(lines_vocab) for _ in range(rng.randint(1, 5))])
        got = repetition_counts_batch(toks_l, lines_l, paras_l)
        exp = np.array(
            [
                repetition_counts(t, l, p)
                for t, l, p in zip(toks_l, lines_l, paras_l)
            ],
            dtype=np.int64,
        ).reshape(m, 15)
        assert got.shape == (m, 15)
        assert (got == exp).all(), (got.tolist(), exp.tolist())


def test_batch_kernel_token_budget_split_is_exact():
    """The memory-guard split (token budget exceeded → halve by doc)
    returns exactly the unsplit answer."""
    import random

    import numpy as np

    import cpp_near_dedupe_spark.operators.quality_repetition as qr

    rng = random.Random(23)
    vocab = ["a", "bb", "ccc", "dddd"]
    T = [[rng.choice(vocab) for _ in range(rng.randint(0, 25))] for _ in range(9)]
    L = [["x", "same line"] for _ in range(9)]
    P = [["p"] for _ in range(9)]
    unsplit = qr.repetition_counts_batch(T, L, P)
    budget = qr._BATCH_TOKEN_BUDGET
    try:
        qr._BATCH_TOKEN_BUDGET = 10  # force recursive splitting
        split = qr.repetition_counts_batch(T, L, P)
    finally:
        qr._BATCH_TOKEN_BUDGET = budget
    assert (split == unsplit).all()


def test_kernel_seg_counts_match_bruteforce():
    import random
    from collections import Counter

    from cpp_near_dedupe_spark.operators.quality_repetition import _seg_counts

    rng = random.Random(9)
    vocab = ["", "x", "line one", "line two", "  ", "same"]
    for _ in range(200):
        arr = [rng.choice(vocab) for _ in range(rng.randint(0, 30))]
        freq = Counter(arr)
        n, dup_cnt, dup_chars = _seg_counts(arr)
        assert n == len(arr)
        assert dup_cnt == len(arr) - len(freq)
        assert dup_chars == sum((c - 1) * len(s) for s, c in freq.items() if c > 1)
