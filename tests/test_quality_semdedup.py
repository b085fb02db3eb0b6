"""Gopher-rule quality gate (operators/quality_rules.py) and the SemDeDup
composition (operators/embedding_ann.semantic_dedupe)."""

import math

from pyspark.sql import functions as F


def _gopher(spark, rows):
    from cpp_near_dedupe_spark.operators.quality_rules import (
        gopher_quality_filter,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = gopher_quality_filter(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs back to "
    "the barn where it can have a long rest with all of its friends "
    "because that is what foxes like to do when they have some spare "
    "time on their paws and nothing else going on in the forest today"
)


def test_gopher_good_doc_passes(spark):
    out = _gopher(spark, [(1, GOOD)])
    r = out[1]
    assert r["passes"] is True
    assert all(v for k, v in r.items() if k.startswith("ok_"))


def test_gopher_word_count_gate(spark):
    out = _gopher(spark, [(1, "too short to pass")])
    assert out[1]["ok_word_count"] is False
    assert out[1]["passes"] is False


def test_gopher_mean_word_len(spark):
    # 60 one-letter words: mean length 1 < 3
    out = _gopher(spark, [(1, " ".join(["a the to of"] * 15))])
    assert out[1]["ok_mean_word_len"] is False


def test_gopher_symbol_ratio(spark):
    # hashes plus ellipsis runs exceed 10% of words
    out = _gopher(spark, [(1, GOOD + " #### #### #### ... ... ...")])
    assert out[1]["ok_symbol_ratio"] is False
    clean = _gopher(spark, [(1, GOOD)])
    assert clean[1]["ok_symbol_ratio"] is True


def test_gopher_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join(f"- {w}" for w in GOOD.split()[:20])
    out = _gopher(spark, [(1, bullets)])
    assert out[1]["ok_bullet_ratio"] is False
    ell = "\n".join(f"{w}..." for w in GOOD.split()[:20])
    out2 = _gopher(spark, [(1, ell)])
    assert out2[1]["ok_ellipsis_ratio"] is False


def test_gopher_alpha_and_stopwords(spark):
    nums = " ".join(str(i) for i in range(60))
    out = _gopher(spark, [(1, nums)])
    assert out[1]["ok_alpha_words"] is False
    assert out[1]["ok_stopwords"] is False
    # GOOD has 'the', 'to', 'and', 'that' etc. -> >= 2 distinct stop hits
    assert _gopher(spark, [(1, GOOD)])[1]["ok_stopwords"] is True


def test_gopher_null_text(spark):
    out = _gopher(spark, [(1, None)])
    assert out[1]["n_words"] == 0
    assert out[1]["passes"] is False


def test_gopher_matches_duckdb_on_adversarial_text(spark):
    """One-job cross-engine parity pin on text far nastier than the
    driver corpus: the Spark operator and its gopher_quality_sql mirror
    must agree row-for-row on every rule boolean."""
    import random

    import duckdb
    import pandas as pd

    from cpp_near_dedupe_spark.operators.quality_rules import (
        gopher_quality_filter,
        gopher_quality_sql,
    )

    rng = random.Random(7)
    pieces = [
        "the", "be", "to", "#", "...", "-", "*", "\n", "  ", "a" * 40,
        "word", "123", "x1", "naïve", "résumé", "-bullet", "* star",
        "end...", "#tag", "", "\n\n", ". ", "mixed#", "..x",
    ]
    rows = [(0, None), (1, ""), (2, "#" * 100), (3, "...\n" * 50)]
    for i in range(4, 200):
        rows.append(
            (i, " ".join(rng.choice(pieces) for _ in range(rng.randint(0, 120))))
        )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        gopher_quality_filter(df)
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
        con.execute(gopher_quality_sql(toks) + " FROM t ORDER BY doc_id")
        .df()
        .reset_index(drop=True)
    )
    for col in got.columns:
        assert list(got[col]) == list(exp[col]), col


# --- semantic_dedupe -------------------------------------------------------


def _vec(angle):
    return [math.cos(angle), math.sin(angle), 0.0, 0.0]


def _semdedup(spark, rows, **kw):
    from cpp_near_dedupe_spark.operators.embedding_ann import semantic_dedupe

    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = semantic_dedupe(df, **kw)
    return {r["vec_id"]: (r["cluster_id"], r["is_kept"]) for r in out.collect()}


def test_semantic_dedupe_transitive_min_id(spark):
    # 1~2 and 2~3 via small angular steps (cos(0.1) ~ 0.995 >= 0.95),
    # but 1~3 alone is below threshold at 0.2 rad?  cos(0.2)=0.980 -- still
    # above; use steps of 0.25 rad: cos(0.25)=0.969 pair, cos(0.5)=0.878
    # non-pair -> transitivity is what links 1 to 3.
    rows = [
        (1, _vec(0.0)),
        (2, _vec(0.25)),
        (3, _vec(0.5)),
        (9, _vec(2.0)),  # singleton far from everything
    ]
    out = _semdedup(spark, rows, threshold=0.95, method="exact")
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[3] == (1, False)  # linked only transitively through 2
    assert out[9] == (9, True)  # singleton keeps itself
    assert len(out) == 4  # every input row present


def test_semantic_dedupe_lsh_agrees_on_separated_clusters(spark):
    # two tight clusters far apart: LSH candidate generation must find
    # the same clusters as the exact path
    rows = []
    for i in range(5):
        rows.append((i, _vec(0.02 * i)))
        rows.append((100 + i, _vec(2.0 + 0.02 * i)))
    exact = _semdedup(spark, rows, threshold=0.95, method="exact")
    lsh = _semdedup(
        spark, rows, threshold=0.95, method="lsh", n_tables=8, n_planes=4, dim=4
    )
    assert exact == lsh
    assert exact[0] == (0, True) and exact[104] == (100, False)
