"""Sorted-neighborhood blocking, TF-IDF cosine, and Levenshtein scoring
(operators/sorted_neighborhood.py, operators/tfidf.py,
operators/string_sim.levenshtein_adjacent) — r5b linkage additions."""

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def records(spark):
    from cpp_near_dedupe_spark.operators.entity_resolution import (
        dirty_customer_records,
    )

    df = dirty_customer_records(
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
    ).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(autouse=True)
def _drain_registry():
    """global_rank/tfidf track() their intermediates; drain per test."""
    from cpp_near_dedupe_spark.cache import release_all

    yield
    release_all()


# --- distributed global rank ------------------------------------------------


def test_global_rank_matches_single_window(spark):
    from cpp_near_dedupe_spark.operators.sorted_neighborhood import global_rank

    df = spark.range(0, 500).select(
        F.col("id").alias("rid"),
        # non-monotone sort key with DUPLICATES so the id tiebreak and
        # cross-boundary ties are both exercised
        ((F.col("id") * 37) % 91).alias("k"),
    )
    got = global_rank(df, ["k"], "rid", num_partitions=7)
    w = Window.orderBy("k", "rid")
    want = df.withColumn("rank", F.row_number().over(w).cast("long"))
    assert got.select("rid", "k", "rank").exceptAll(want).count() == 0
    assert want.exceptAll(got.select("rid", "k", "rank")).count() == 0


def test_global_rank_is_dense_and_unique(spark):
    from cpp_near_dedupe_spark.operators.sorted_neighborhood import global_rank

    df = spark.range(0, 333).select(
        F.col("id").alias("rid"), (F.col("id") % 5).alias("k")
    )
    ranks = [r["rank"] for r in global_rank(df, ["k"], "rid").collect()]
    assert sorted(ranks) == list(range(1, 334))


def test_global_rank_plan_has_no_global_data_window(spark):
    """The only single-partition window may be the P-row offset prefix
    sum; the data-sized window must partition by the range-partition id."""
    from cpp_near_dedupe_spark.operators.sorted_neighborhood import global_rank

    df = spark.range(0, 1000).select(
        F.col("id").alias("rid"), (F.col("id") % 97).alias("k")
    )
    plan = global_rank(df, ["k"], "rid")._jdf.queryExecution().executedPlan().toString()
    windows = [ln for ln in plan.splitlines() if "Window" in ln and "row_number" in ln]
    data_windows = [ln for ln in windows if "_pid" in ln and "_lr" in ln]
    assert data_windows, plan  # the big window is partitioned by _pid
    # the offset window ranks over _n (partition counts), never over data
    for ln in windows:
        if ln not in data_windows:
            assert "_n" in ln or "_off" in ln, ln


# --- sorted-neighborhood pairs ----------------------------------------------


def _brute_sn_pairs(spark, df, sort_cols, id_col, window):
    w = Window.orderBy(*sort_cols, id_col)
    ranked = df.withColumn("rnk", F.row_number().over(w))
    l = ranked.select(F.col(id_col).alias("_ia"), F.col("rnk").alias("ra"))
    r = ranked.select(F.col(id_col).alias("_ib"), F.col("rnk").alias("rb"))
    return (
        l.crossJoin(r)
        .filter((F.col("rb") > F.col("ra")) & (F.col("rb") - F.col("ra") < window))
        .select(
            F.least("_ia", "_ib").alias("a"), F.greatest("_ia", "_ib").alias("b")
        )
    )


@pytest.mark.parametrize(
    "window,n_parts",
    [
        (2, 5),
        (5, 5),
        (8, 5),
        # partitions of ~2 rows << window: every window spans several
        # range partitions — the bucket join is rank-based, so the
        # partition layout must not matter
        (8, 100),
    ],
)
def test_sn_pairs_match_definition(spark, window, n_parts):
    from cpp_near_dedupe_spark.operators.sorted_neighborhood import (
        sorted_neighborhood_pairs,
    )

    df = spark.range(0, 200).select(
        F.col("id").alias("rid"), ((F.col("id") * 53) % 77).alias("k")
    )
    got = sorted_neighborhood_pairs(
        df, ["k"], "rid", window, num_partitions=n_parts
    )
    want = _brute_sn_pairs(spark, df, ["k"], "rid", window)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_sn_pair_count_is_linear(spark):
    """N records, window w -> exactly (N-1) + ... i.e. sum over gap g of
    (N-g) for g in 1..w-1 — the sorted-neighborhood compare budget."""
    from cpp_near_dedupe_spark.operators.sorted_neighborhood import (
        sorted_neighborhood_pairs,
    )

    n, w = 240, 6
    df = spark.range(0, n).select(
        F.col("id").alias("rid"), ((F.col("id") * 11) % 301).alias("k")
    )
    got = sorted_neighborhood_pairs(df, ["k"], "rid", w).count()
    assert got == sum(n - g for g in range(1, w))


def test_er_sn_recall_on_dirty_fixture(records):
    """Sort-order blocking catches most fixture dupes: every copy damages
    the name at position >= 4, so base and copy share a 3-char prefix and
    sort near each other. Pin the measured floor (and that the %13 copies
    with damaged PHONES — invisible to the ph: key pass — are found)."""
    from cpp_near_dedupe_spark.operators.entity_resolution import (
        er_sn_pairs,
        er_truth_pairs,
    )

    truth = er_truth_pairs(records)
    n_truth = truth.count()
    got = er_sn_pairs(records)
    caught = got.join(truth, ["a", "b"], "left_semi").count()
    assert n_truth > 0
    assert caught / n_truth >= 0.9


def test_er_sn_matches_agree_with_key_blocking_on_shared_pairs(records):
    """Same scorer, same threshold: a pair found by BOTH blockings must
    carry the identical score row in er_matches and er_sn_matches."""
    from cpp_near_dedupe_spark.operators.entity_resolution import (
        er_matches,
        er_sn_matches,
    )

    km = er_matches(records).select("a", "b", "jw", "score")
    sn = er_sn_matches(records).select("a", "b", "jw", "score")
    shared_keys = km.select("a", "b").intersect(sn.select("a", "b"))
    km_shared = km.join(shared_keys, ["a", "b"])
    sn_shared = sn.join(shared_keys, ["a", "b"])
    assert shared_keys.count() > 0
    assert km_shared.exceptAll(sn_shared).count() == 0


# --- TF-IDF cosine ------------------------------------------------------------


def _brute_tfidf_cosine(texts):
    """Pure-python replay of tfidf_cosine_adjacent over texts[i] with
    doc_id = i; returns {(a, b): cosine} rounded to 6 dp."""
    import re
    from collections import Counter

    toks = [
        [t for t in re.split(r"[^a-z0-9]+", (s or "").lower()) if t]
        for s in texts
    ]
    n = len(texts)
    tf = [Counter(ts) for ts in toks]
    df = Counter()
    for c in tf:
        df.update(c.keys())
    vecs = [
        {
            t: cnt * (math.log((n + 1.0) / (df[t] + 1.0)) + 1.0)
            for t, cnt in c.items()
        }
        for c in tf
    ]
    out = {}
    for a in range(n - 1):
        va, vb = vecs[a], vecs[a + 1]
        dot = sum(w * vb[t] for t, w in va.items() if t in vb)
        if dot == 0 or not va or not vb:
            continue
        na = math.sqrt(sum(w * w for w in va.values()))
        nb = math.sqrt(sum(w * w for w in vb.values()))
        out[(a, a + 1)] = round(dot / (na * nb), 6)
    return out


def test_tfidf_cosine_matches_brute_force(spark):
    from cpp_near_dedupe_spark.operators.tfidf import tfidf_cosine_adjacent

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "entirely different words appear in this one",
        "entirely different words appear in this one",  # identical pair
        "",  # no tokens: pairs (2?,) -- (3,4) dropped, (4,5) dropped
        "numbers 123 and 456 mixed with words",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["a"], r["b"]): r["tfidf_cosine"]
        for r in tfidf_cosine_adjacent(df).collect()
    }
    want = _brute_tfidf_cosine(texts)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)
    # identical adjacent docs score exactly 1
    assert got[(2, 3)] == pytest.approx(1.0, abs=1e-6)


def test_tfidf_rare_terms_outweigh_common(spark):
    """A pair overlapping on corpus-rare terms must outscore a pair
    overlapping only on corpus-common (low-idf) terms — the weighting
    property that distinguishes TF-IDF cosine from plain Jaccard."""
    from cpp_near_dedupe_spark.operators.tfidf import tfidf_cosine_adjacent

    filler = " shared common words everywhere"
    texts = [
        "zebra quagga okapi" + filler,  # 0-1 overlap on rare terms
        "zebra quagga okapi distinct tail here" + filler,
        "shared common words everywhere alpha beta",  # 2-3 overlap on common
        "shared common words everywhere gamma delta",
        "shared common words everywhere epsilon one",
        "shared common words everywhere epsilon two",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["a"], r["b"]): r["tfidf_cosine"]
        for r in tfidf_cosine_adjacent(df).collect()
    }
    assert got[(0, 1)] > got[(2, 3)]


# --- Levenshtein ---------------------------------------------------------------


def test_levenshtein_adjacent_known_values(spark):
    from cpp_near_dedupe_spark.operators.string_sim import levenshtein_adjacent

    df = spark.createDataFrame(
        [(0, "kitten"), (1, "sitting"), (2, "sitting"), (3, None)],
        "doc_id long, text string",
    )
    rows = {
        r["a"]: (r["lev"], r["lev_sim"])
        for r in levenshtein_adjacent(df).collect()
    }
    assert rows[0] == (3, round(1 - 3 / 7, 6))  # kitten -> sitting
    assert rows[1] == (0, 1.0)  # identical strings
    assert rows[2] == (7, 0.0)  # null coalesces to empty


# --- blocking-quality report -----------------------------------------------


def test_er_blocking_report_values(records):
    """Report rows must equal metrics computed independently from the
    (already-tested) candidate generators and the ground truth."""
    from cpp_near_dedupe_spark.operators.entity_resolution import (
        er_blocking_report,
        er_candidate_pairs,
        er_sn_pairs,
        er_truth_pairs,
    )

    rows = {r["strategy"]: r for r in er_blocking_report(records).collect()}
    assert set(rows) == {"key", "sorted_neighborhood"}
    truth = er_truth_pairs(records)
    n_truth = truth.count()
    n = records.count()
    for name, cand in (
        ("key", er_candidate_pairs(records)),
        ("sorted_neighborhood", er_sn_pairs(records)),
    ):
        n_cand = cand.count()
        n_hit = cand.join(truth, ["a", "b"], "left_semi").count()
        r = rows[name]
        assert r["n_candidates"] == n_cand
        assert r["pairs_completeness"] == pytest.approx(
            round(n_hit / n_truth, 6), abs=1e-9
        )
        assert r["reduction_ratio"] == pytest.approx(
            round(1.0 - n_cand / (n * (n - 1) / 2.0), 6), abs=1e-9
        )
        # both strategies must actually block (reduce the pair space)
        # while keeping most of the labeled dupes
        assert r["reduction_ratio"] > 0.9
        assert r["pairs_completeness"] >= 0.9


def test_er_matches_combined_superset_and_dedup(records):
    """The union-blocking match set contains every key-blocking match and
    every SN-blocking match, scores each pair exactly once, and equals
    their row-level union (same scorer, same threshold)."""
    from cpp_near_dedupe_spark.operators.entity_resolution import (
        er_matches,
        er_matches_combined,
        er_sn_matches,
    )

    comb = er_matches_combined(records).cache()
    km = er_matches(records)
    sn = er_sn_matches(records)
    assert km.exceptAll(comb).count() == 0
    assert sn.exceptAll(comb).count() == 0
    # nothing beyond the two inputs, and no duplicate (a, b) rows
    assert comb.exceptAll(km.unionByName(sn).distinct()).count() == 0
    assert comb.count() == comb.select("a", "b").distinct().count()
    comb.unpersist()


# --- bigram-LM fluency -------------------------------------------------------


def test_lm_fluency_matches_brute_force(spark):
    from cpp_near_dedupe_spark.operators.lm_score import lm_fluency_score

    texts = [
        "the cat sat on the mat",
        "the cat sat on the hat",
        "cat the on sat mat the",  # same unigrams, scrambled order
        "zz",                      # single token: no bigrams -> absent
        "",                        # no tokens -> absent
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in lm_fluency_score(df).collect()
    }

    import re
    from collections import Counter

    toks = [
        [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t] for s in texts
    ]
    bigrams = [list(zip(ts, ts[1:])) for ts in toks]
    bc = Counter(bg for doc in bigrams for bg in doc)
    cx = Counter()
    for (w1, _), c in bc.items():
        cx[w1] += c
    vocab = len({t for ts in toks for t in ts})
    want = {}
    for i, doc in enumerate(bigrams):
        if not doc:
            continue
        lps = [
            math.log((bc[bg] + 1.0) / (cx[bg[0]] + vocab)) for bg in doc
        ]
        want[i] = (len(doc), round(sum(lps) / len(lps), 6))
    assert set(got) == set(want) == {0, 1, 2}
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6)
    # fluency ordering: the natural sentences share most bigrams and must
    # outscore the scrambled doc whose bigrams are mostly singletons
    assert got[0][1] > got[2][1] and got[1][1] > got[2][1]


def test_tfidf_cosine_pairs_general_scorer(spark):
    """The general pair scorer on an explicit pair list must agree with
    the adjacent probe, and must score arbitrary (non-adjacent) pairs."""
    from cpp_near_dedupe_spark.operators.tfidf import (
        tfidf_cosine_adjacent,
        tfidf_cosine_pairs,
    )

    texts = [
        "alpha beta gamma delta",
        "alpha beta gamma epsilon",
        "totally different content here",
        "alpha beta gamma delta",  # exact copy of doc 0
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    adj = {
        (r["a"], r["b"]): r["tfidf_cosine"]
        for r in tfidf_cosine_adjacent(df).collect()
    }
    pairs = spark.createDataFrame([(0, 1), (0, 3), (1, 2)], "a long, b long")
    gen = {
        (r["a"], r["b"]): r["tfidf_cosine"]
        for r in tfidf_cosine_pairs(df, pairs).collect()
    }
    assert gen[(0, 1)] == adj[(0, 1)]
    assert gen[(0, 3)] == pytest.approx(1.0, abs=1e-6)  # exact copy
    assert (1, 2) not in gen  # no shared term -> dropped


def test_global_rank_all_equal_sort_keys(spark):
    """Degenerate sort key (every record identical — the boilerplate-name
    hot spot): the range partitioner keys on the full (key, id) tuple, so
    the tie block still spreads across partitions and the rank equals the
    id order."""
    from cpp_near_dedupe_spark.operators.sorted_neighborhood import global_rank

    n = 5000
    df = spark.range(0, n).select(
        F.col("id").alias("rid"), F.lit("same").alias("k")
    )
    got = global_rank(df, ["k"], "rid", num_partitions=8)
    rows = got.select("rid", "rank").collect()
    assert all(r["rank"] == r["rid"] + 1 for r in rows)
    # the tie block must not collapse into one range partition: the
    # partitioner keys on (k, rid), and rid breaks every tie
    npart = (
        df.repartitionByRange(8, F.col("k"), F.col("rid"))
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert npart > 1


# --- containment and token-sort JW -------------------------------------------


def test_ngram_containment_asymmetry(spark):
    """B = A + extra boilerplate: containment of A in B stays 1.0 while
    Jaccard is diluted — the property the measure exists for."""
    from cpp_near_dedupe_spark.operators.ngram import (
        ngram_containment_adjacent,
        ngram_jaccard_adjacent,
    )

    core = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [
        core,
        core + " extra nav footer menu copyright terms privacy contact "
        "subscribe newsletter related articles trending now",
        "short",  # < 5 tokens: no grams -> containment 0 both ways
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    cont = {
        (r["a"], r["b"]): (r["c_ab"], r["c_ba"])
        for r in ngram_containment_adjacent(df).collect()
    }
    jac = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_adjacent(df).collect()
    }
    assert cont[(0, 1)][0] == pytest.approx(1.0, abs=1e-6)  # A fully in B
    assert cont[(0, 1)][1] < 1.0  # B not contained in A
    assert jac[(0, 1)] < cont[(0, 1)][0]  # jaccard diluted by B's extras
    assert cont[(1, 2)] == (0.0, 0.0)  # gram-less side -> 0


def test_token_sort_jw_order_insensitive(spark):
    """Scrambled token order scores 1.0 under token-sort JW (raw JW on
    the same texts is far lower); character damage still shows."""
    from cpp_near_dedupe_spark.operators.string_sim import (
        jaro_winkler_adjacent,
        token_sort_jw_adjacent,
    )

    texts = [
        "john doe 42 main street springfield",
        "springfield main street doe john 42",  # same tokens, scrambled
        "springfield main street doe jhon 42",  # + one typo
        None,  # NULL text must coalesce to '' (module NULL contract)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    ts = {
        (r["a"], r["b"]): r["ts_jw"]
        for r in token_sort_jw_adjacent(df).collect()
    }
    raw = {
        (r["a"], r["b"]): r["jw"] for r in jaro_winkler_adjacent(df).collect()
    }
    assert ts[(0, 1)] == pytest.approx(1.0, abs=1e-6)
    assert raw[(0, 1)] < 0.9
    assert 0.9 < ts[(1, 2)] < 1.0  # typo visible, order not
    assert ts[(2, 3)] == 0.0  # NULL side coalesces to '' on both engines


def test_levenshtein_parity_on_non_ascii(spark):
    """Spark's levenshtein counts codepoints, DuckDB's counts UTF-8
    bytes; the shared ASCII projection must make the two engines agree
    on text the sf fixtures never contain (accents, NULL)."""
    import duckdb

    rows = [(0, "café crème brûlée"), (1, "cafe creme brulee"),
            (2, None), (3, "naïve résumé ok")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from cpp_near_dedupe_spark.operators.string_sim import levenshtein_adjacent

    got = {
        r["a"]: (r["lev"], r["lev_sim"])
        for r in levenshtein_adjacent(df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    import __spark_entry__ as entry

    oracle = con.execute(entry.oracle_sql()["edit_distance_adjacent"]).fetchall()
    want = {int(a): (int(lev), float(sim)) for a, _, lev, sim in oracle}
    assert got == want
    # the projection really dropped the accents: 'café'->'caf' vs 'cafe'
    assert got[0][0] > 0
