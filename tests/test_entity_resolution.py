"""Record-linkage (operators/entity_resolution.py): ground-truth F1,
blocking recall, transitive clustering, golden records, hot-block cap."""

import pytest
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


def _true_pairs(records):
    """All unordered same-entity pairs from the ground-truth entity_id."""
    l = records.select("entity_id", F.col("rec_id").alias("a"))
    r = records.select("entity_id", F.col("rec_id").alias("b"))
    return (
        l.join(r, "entity_id")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )


def test_fixture_shape(records):
    n_base = records.filter(F.col("rec_id") % 10 == 0).count()
    n_a = records.filter(F.col("rec_id") % 10 == 1).count()
    n_b = records.filter(F.col("rec_id") % 10 == 2).count()
    assert n_a > 0 and n_b > 0
    assert records.count() == n_base + n_a + n_b
    # 3-member entities exist (divisible by both 7 and 13)
    triple = (
        records.groupBy("entity_id").count().filter(F.col("count") == 3)
    )
    assert triple.count() > 0


def test_blocking_recall_is_total(records):
    """Every true same-entity pair shares at least one block: fixture
    perturbations never touch the first two name chars, so the nm: pass
    alone guarantees recall; missing pairs would be unrecoverable."""
    from cpp_near_dedupe_spark.operators.entity_resolution import (
        er_candidate_pairs,
    )

    cand = er_candidate_pairs(records)
    missed = _true_pairs(records).join(cand, ["a", "b"], "left_anti")
    assert missed.count() == 0


def test_match_f1_at_blocking_keys(records):
    """The north-star acceptance metric: pairwise F1 >= 0.99 on labeled
    pairs at the same blocking key. On this fixture separation is total,
    so F1 should be exactly 1.0."""
    from cpp_near_dedupe_spark.operators.entity_resolution import er_matches

    got = er_matches(records).select("a", "b").cache()
    truth = _true_pairs(records).cache()
    tp = got.join(truth, ["a", "b"], "inner").count()
    fp = got.count() - tp
    fn = truth.count() - tp
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, (tp, fp, fn)


def test_clusters_equal_entities(records):
    """Transitive clustering recovers the ground-truth partition exactly:
    cluster_id of every record = 10x its entity_id (the base record)."""
    from cpp_near_dedupe_spark.operators.entity_resolution import er_clusters

    out = er_clusters(records)
    joined = out.join(records.select("rec_id", "entity_id"), "rec_id")
    bad = joined.filter(
        F.col("cluster_id") != F.col("entity_id") * 10
    ).count()
    assert bad == 0


def test_golden_records(records):
    from cpp_near_dedupe_spark.operators.entity_resolution import (
        er_golden_records,
    )

    golden = er_golden_records(records).cache()
    # one golden row per true entity
    assert golden.count() == records.select("entity_id").distinct().count()
    # representative is always the base record, whose bal is the max of
    # the cluster (variants subtract 1.0/2.0)
    assert golden.filter(F.col("rep_id") % 10 != 0).count() == 0
    base = records.filter(F.col("rec_id") % 10 == 0).select(
        F.col("rec_id").alias("rep_id"), F.col("bal").alias("base_bal")
    )
    mismatched = (
        golden.join(base, "rep_id")
        .filter(F.abs(F.col("max_bal") - F.col("base_bal")) > 1e-9)
        .count()
    )
    assert mismatched == 0
    # member counts: 3 where entity divisible by 91, else 2 for 7 or 13
    n3 = golden.filter(F.col("n_members") == 3).count()
    n1 = golden.filter(F.col("n_members") == 1).count()
    ids = records.select("entity_id").distinct()
    expect3 = ids.filter(F.col("entity_id") % 91 == 0).count()
    expect1 = ids.filter(
        (F.col("entity_id") % 7 != 0) & (F.col("entity_id") % 13 != 0)
    ).count()
    assert (n3, n1) == (expect3, expect1)


def test_hot_block_is_capped(spark):
    """A degenerate block (e.g. a shared default phone) must not cost
    O(h^2) candidate pairs: the capped+star topology bounds it at
    ~cap^2/2 head pairs + h star edges."""
    from cpp_near_dedupe_spark.operators.entity_resolution import (
        er_candidate_pairs,
    )

    h, cap = 2000, 16
    rows = spark.range(h).select(
        (F.col("id") * 10).alias("rec_id"),
        F.col("id").alias("entity_id"),
        F.concat(F.lit("zz"), F.col("id").cast("string")).alias("name"),
        F.lit("000000000").alias("phone"),  # one shared degenerate block
        F.lit(0).alias("nation"),
        F.lit("SEG").alias("segment"),
        F.lit(0.0).alias("bal"),
    )
    pairs = er_candidate_pairs(rows, cap=cap)
    n = pairs.count()
    # name prefix "zz" is also one hot block; both are capped. Upper
    # bound: 2 blocks x (cap^2/2 head pairs + h star edges), minus
    # overlap; the uncapped count would be ~2 x h^2/2 = 4M.
    assert n <= 2 * (cap * cap // 2 + h), n


def test_pages_record_linkage_roundtrip(spark):
    """pages shape end-to-end: url identity, min-url representative;
    is_kept count + cluster closure sanity on the sf0.001 corpus."""
    from cpp_near_dedupe_spark.plans.pages_pipeline import (
        pages_record_linkage,
        synthesize_pages,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pages = synthesize_pages(docs)
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    out = pages_record_linkage(spark, pages).cache()
    assert out.count() == docs.count()
    # every cluster_url is itself a kept page, and kept pages are exactly
    # the distinct cluster representatives
    reps = out.select(F.col("cluster_url").alias("url")).distinct()
    kept = out.filter("is_kept").select("url")
    assert reps.join(kept, "url", "left_anti").count() == 0
    assert kept.count() == reps.count()
    # duplicates exist in the corpus, so some pages must be dropped
    assert out.filter(~F.col("is_kept")).count() > 0

    # first-seen keep rule: same cluster membership partition, but the
    # scrambled warc_ts makes at least one representative differ from
    # the min-url rule (non-vacuous fixture)
    fs = pages_record_linkage(spark, pages, keep="first_seen").cache()
    assert fs.count() == out.count()
    both = out.select("url", F.col("cluster_url").alias("cu_min")).join(
        fs.select("url", F.col("cluster_url").alias("cu_fs")), "url"
    )
    # partitions agree: grouping by either representative column yields
    # identical co-membership (cu_min determines cu_fs and vice versa)
    assert (
        both.groupBy("cu_min")
        .agg(F.countDistinct("cu_fs").alias("n"))
        .filter(F.col("n") != 1)
        .count()
        == 0
    )
    assert both.filter(F.col("cu_min") != F.col("cu_fs")).count() > 0
