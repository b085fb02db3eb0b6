"""Candidate-pair generation: band self-join with hot-bucket skew handling.

The reference finds candidates by probing a per-band multimap and dedupes
re-reached pairs with CAS flags (`/root/reference/CPPDeduper/
LSHBandHashMap.h:360-374`, `ComparerThread.h:120-150`). The Spark-first
equivalent is a self-equi-join of the exploded bands on
``(band_id, band_key)`` with ``a < b`` plus ``dropDuplicates`` — the CAS
flag trick becomes a plain distinct *before* the expensive signature join.

Scale design (north_rule: explicit skew handling). A "hot band" — one
bucket holding h documents (boilerplate/template pages at Common-Crawl
scale) — would make the naive self-join emit h·(h−1)/2 pairs. We bound
this without silently losing the cluster:

* buckets with ≤ ``hot_band_cap`` docs: exact all-pairs (the normal path;
  AQE skew-join splits oversized shuffle partitions underneath).
* hotter buckets: all-pairs among the first ``hot_band_cap`` docs (ranked
  by doc id — deterministic), plus a *star* — every remaining doc paired
  with the bucket's minimum doc — so the bucket stays one connected
  candidate group at O(h) extra pairs instead of O(h²). Every emitted pair
  is still Jaccard-verified downstream, so the star cannot cause false
  merges; it can only miss pairs of docs that are each dissimilar to the
  star center but similar to each other *and* collide in no other band.
  The count of star-routed docs is reported in the stage metrics (no
  silent truncation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DedupeConfig


def bucket_sizes(bands: DataFrame) -> DataFrame:
    """(band_key, bucket_size) hash aggregation — map-side combined, no
    sort. Computed ONCE per run and shared by candidate_pairs and the
    hot-bucket metrics (it is a full pass over the hottest table)."""
    return bands.groupBy("band_key").agg(F.count("*").alias("bucket_size"))


def candidate_pairs(
    bands: DataFrame, cfg: DedupeConfig, sizes: DataFrame | None = None
) -> DataFrame:
    """(id, band_id, band_key) → distinct (a, b) with a < b.

    Physical shape: bucket sizes come from a hash aggregation (map-side
    combine, no sort); only rows of over-cap buckets — found with a
    broadcast semi/anti-join against the (tiny) hot-key list — pay for a
    window sort. The cold path is a plain self-equi-join that AQE's
    skew-join splitting handles. A naive global row_number window would
    sort the entire bands table; at 10^12 docs that sort IS the job.

    ``sizes``: optionally pass a precomputed/persisted ``bucket_sizes``
    DataFrame so callers that also log hot-bucket stats don't pay for the
    aggregation twice.

    ``cfg.pair_topology == "chain_star"`` switches to the linear-cost
    topology (see ``_chain_star_pairs``).
    """
    if cfg.pair_topology == "chain_star":
        return _chain_star_pairs(bands, cfg, sizes=sizes)
    id_col = cfg.id_col
    cap = cfg.hot_band_cap
    # the band key is already namespaced by band index (computed with
    # seed = band_id, functions/bands.py), so joining on the single long
    # key is equivalent to the composite join w.p. 1 - 2^-64 per bucket —
    # and shuffles ~30% fewer bytes through the hottest stage
    keys = ["band_key"]

    if sizes is None:
        sizes = bucket_sizes(bands)
    # hot_keys feeds two broadcast joins (anti + semi); persist so the
    # aggregation under it runs once, not once per broadcast exchange
    hot_keys = sizes.filter(F.col("bucket_size") > cap).select(*keys).persist()

    cold = bands.join(F.broadcast(hot_keys), keys, "left_anti")
    cold_pairs = (
        cold.select(*keys, F.col(id_col).alias("a"))
        .join(cold.select(*keys, F.col(id_col).alias("b")), keys)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )

    hot = bands.join(F.broadcast(hot_keys), keys, "left_semi")
    w = Window.partitionBy(*keys).orderBy(F.col(id_col))
    ranked = hot.withColumn("rn", F.row_number().over(w))
    head = ranked.filter(F.col("rn") <= cap)
    hot_pairs = (
        head.select(*keys, F.col(id_col).alias("a"), F.col("rn").alias("rn_a"))
        .join(
            head.select(*keys, F.col(id_col).alias("b"), F.col("rn").alias("rn_b")),
            keys,
        )
        .filter(F.col("rn_a") < F.col("rn_b"))
        .select("a", "b")
    )
    # star edges keep over-cap buckets connected at O(h) cost
    centers = ranked.filter(F.col("rn") == 1).select(*keys, F.col(id_col).alias("a"))
    overflow = ranked.filter(F.col("rn") > cap).select(*keys, F.col(id_col).alias("b"))
    pairs_star = overflow.join(centers, keys).select("a", "b")

    return cold_pairs.unionByName(hot_pairs).unionByName(pairs_star).dropDuplicates(
        ["a", "b"]
    )


def _chain_star_window(bands: DataFrame, id_col: str, part_cols: list[str]) -> DataFrame:
    """Chain + star pairs within each window partition (docs sorted by id):
    (predecessor, doc) chain pairs plus (partition_min, doc) star pairs —
    2 candidates per row instead of h²/2 per bucket."""
    w = Window.partitionBy(*part_cols).orderBy(F.col(id_col))
    ranked = bands.select(*part_cols, id_col).select(
        F.col(id_col),
        F.lag(id_col).over(w).alias("prev"),
        F.first(id_col).over(w).alias("bmin"),  # running first = partition min
    )
    chain = ranked.filter(F.col("prev").isNotNull()).select(
        F.col("prev").alias("a"), F.col(id_col).alias("b")
    )
    star = ranked.filter(
        (F.col("bmin") != F.col(id_col)) & (F.col("bmin") != F.col("prev"))
    ).select(F.col("bmin").alias("a"), F.col(id_col).alias("b"))
    return chain.unionByName(star)


def _chain_star_pairs(
    bands: DataFrame, cfg: DedupeConfig, sizes: DataFrame | None = None
) -> DataFrame:
    """Linear-cost candidate topology: within each bucket (docs sorted by
    id) emit (predecessor, doc) chain pairs plus (bucket_min, doc) star
    pairs — 2 candidates per band row instead of h²/2 per bucket.

    Why this preserves clustering recall in practice: a bucket is a dupe
    family plus (rarely) unrelated band-colliders. The chain connects every
    contiguous id-run of family members; the star connects everything to
    the bucket min, and a true pair (A,B) co-occurs in MANY buckets (their
    sketches share most values, so many of the 64 bands match), so a miss
    requires every such bucket to have an unrelated doc as its minimum —
    probability decays geometrically with the band redundancy. Measured on
    the labeled F1 harness (BENCH/BASELINE.md); the all_pairs topology
    remains the maximal-recall reference. Every emitted pair is still
    Jaccard-verified, so precision is unaffected by construction.

    Physical shape: one window sort of the bands table (shuffle on
    band_key), no self-join, no quadratic intermediate — the dominant cost
    of all_pairs on corpora with dense duplicate families (a 500-member
    bucket emits 999 pairs here vs 125k capped pairs there).

    Skew: AQE's skew-join splitting does NOT apply to window partitions,
    so without intervention the hottest band bucket (boilerplate at web
    scale, possibly 10⁷ rows) would land in ONE window task. Buckets over
    ``hot_band_cap`` are therefore salted into ⌈h/cap⌉ sub-buckets of
    ~cap expected rows each (deterministic ``xxhash64(id) % n_salts``):
    chain+star runs per sub-bucket, and each sub-bucket minimum is linked
    to the bucket's global minimum, so the bucket stays one connected
    candidate group — still O(h) pairs total, but no window partition
    exceeds ~cap rows. Hot buckets are found from a 2% sample of the bands
    table (or from the caller's exact ``sizes`` aggregate when one was
    already computed for metrics) + a broadcast routing join; nothing is
    capped or dropped.
    """
    id_col = cfg.id_col
    cap = cfg.hot_band_cap
    if sizes is not None:
        hot_keys = (
            sizes.filter(F.col("bucket_size") > cap)
            .select("band_key", "bucket_size")
            .persist()
        )
    else:
        # Statistical hot detection: an exact bucket_sizes pass is a full
        # hash aggregation over the hottest table in the pipeline, and it
        # exists only to find buckets worth salting — a ROUTING decision,
        # not a semantic one (salting any bucket is always correct;
        # leaving a mildly-over-cap bucket unsalted costs one window task
        # of that size, which is harmless). A 2% sample finds every bucket
        # that actually matters: a 10⁴-row bucket shows ~200 sampled rows
        # (P[miss] ≈ 0), a 10⁷-row one ~2·10⁵; only buckets within a few ×
        # of the cap are detected noisily, and those are exactly the ones
        # that don't need salting. ~50× less aggregation input than the
        # exact pass. Exact sizes (the ``sizes`` argument) are still used
        # when the caller has already paid for them (checkpointed runs
        # compute them for the hot-bucket metrics).
        frac = 0.02
        hot_keys = (
            bands.select("band_key")
            .sample(fraction=frac, seed=7)
            .groupBy("band_key")
            .agg((F.count("*") / F.lit(frac)).cast("long").alias("bucket_size"))
            .filter(F.col("bucket_size") > cap)
            .persist()
        )
    # adaptive plan choice (one tiny driver action over the aggregated
    # hot-key list — the AQE-style runtime decision Spark cannot make for
    # window partitions): when NO bucket exceeds the cap, the whole salting
    # apparatus (broadcast routing join, link aggregates, union) is dead
    # weight — emit the plain single-window plan instead.
    if hot_keys.limit(1).count() == 0:
        hot_keys.unpersist()
        return _chain_star_window(
            bands.select("band_key", id_col), id_col, ["band_key"]
        ).dropDuplicates(["a", "b"])

    # ONE broadcast left join routes every row: cold rows (the vast
    # majority) get salt 0, i.e. the plain per-bucket window; over-cap rows
    # are split into ⌈h/cap⌉ sub-buckets of ~cap expected rows. Same single
    # window pass either way — the hot machinery adds no extra shuffle of
    # the bands table.
    n_salts = F.floor((F.col("bucket_size") + cap - 1) / cap).cast("long")
    salted = bands.select("band_key", id_col).join(
        F.broadcast(hot_keys), ["band_key"], "left"
    ).select(
        "band_key",
        id_col,
        F.when(F.col("bucket_size").isNull(), F.lit(0))
        .otherwise(F.pmod(F.xxhash64(F.col(id_col)), n_salts))
        .alias("salt"),
    )
    pairs = _chain_star_window(salted, id_col, ["band_key", "salt"])

    # link each hot sub-bucket minimum to its bucket's global minimum so a
    # salted bucket stays ONE connected candidate group (a < b holds: the
    # global min is ≤ every sub-bucket min). Both aggregates run on the
    # (tiny) hot subset only.
    hot_rows = salted.join(
        F.broadcast(hot_keys.select("band_key")), ["band_key"], "left_semi"
    )
    sub_mins = hot_rows.groupBy("band_key", "salt").agg(F.min(id_col).alias("b"))
    g_mins = hot_rows.groupBy("band_key").agg(F.min(id_col).alias("a"))
    links = (
        sub_mins.join(g_mins, "band_key")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
    )

    return pairs.unionByName(links).dropDuplicates(["a", "b"])


def hot_bucket_stats(
    bands: DataFrame, cfg: DedupeConfig, sizes: DataFrame | None = None
) -> DataFrame:
    """Per-bucket sizes above the cap — logged to the metrics table so
    star-routing is observable, never silent. Pass the shared ``sizes``
    aggregate to avoid a second full pass over the bands table."""
    if sizes is None:
        sizes = bucket_sizes(bands)
    return sizes.filter(F.col("bucket_size") > cfg.hot_band_cap)
