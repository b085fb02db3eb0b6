"""Strict arrival-order greedy resolution (operators/greedy.py) — the
reference's exact keep/drop semantics (`ComparerThread.h:271-414`), pinned
against a sequential Python oracle, plus the incremental mode's
arrival-order discrimination between retained and dropped state docs.
"""

from collections import defaultdict

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cpp_near_dedupe_spark.config import DedupeConfig
from cpp_near_dedupe_spark.operators.greedy import greedy_resolve

CFG = DedupeConfig(id_col="doc_id", text_col="text")


def _py_greedy(ids, edges):
    """The reference's sequential pass: in arrival order, drop a doc iff it
    matches an already-retained earlier doc."""
    earlier = defaultdict(set)
    for a, b in edges:
        lo, hi = (a, b) if a < b else (b, a)
        earlier[hi].add(lo)
    retained = set()
    for d in sorted(ids):
        if not earlier[d] & retained:
            retained.add(d)
    return retained


def _ids_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def _edges_df(spark, edges):
    return spark.createDataFrame([(a, b) for a, b in edges], "a long, b long")


def test_chain_differs_from_cc(spark):
    """A~B, B~C, no A~C: CC drops B and C; greedy keeps C (its only match
    B was itself dropped) — the defining divergence of the two semantics."""
    ids = [1, 2, 3]
    out = greedy_resolve(
        _ids_df(spark, ids), _edges_df(spark, [(1, 2), (2, 3)]), CFG
    ).toPandas()
    kept = set(out[out.is_kept].doc_id)
    assert kept == {1, 3}
    from cpp_near_dedupe_spark.operators.clustering import connected_components

    cc = connected_components(_edges_df(spark, [(1, 2), (2, 3)])).toPandas()
    assert set(cc[cc.id != cc.cluster_id].id) == {2, 3}  # CC drops both


def test_clique_and_singletons(spark):
    ids = range(10)
    # clique 0-1-2 (all pairs), edge-free docs 3..9
    out = greedy_resolve(
        _ids_df(spark, ids), _edges_df(spark, [(0, 1), (0, 2), (1, 2)]), CFG
    ).toPandas()
    assert set(out[out.is_kept].doc_id) == {0, 3, 4, 5, 6, 7, 8, 9}
    assert len(out) == 10


def test_long_decision_chain(spark):
    """Alternating keep/drop down a 40-doc chain — exercises many rounds."""
    n = 40
    edges = [(i, i + 1) for i in range(n - 1)]
    out = greedy_resolve(_ids_df(spark, range(n)), _edges_df(spark, edges), CFG)
    kept = set(out.toPandas().query("is_kept").doc_id)
    assert kept == set(range(0, n, 2))


def test_matches_python_oracle_on_pipeline_edges(spark, pages_600):
    """End-to-end: real pipeline edges over the labeled corpus; the
    distributed fixed-point must equal the sequential reference pass."""
    from cpp_near_dedupe_spark.plans.pipeline import run_pipeline

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(pages_600)), "text": pages_600.text.values})
    )
    res = run_pipeline(spark, docs, CFG, stop_after="edges")
    edge_list = [(r.a, r.b) for r in res.edges.select("a", "b").collect()]
    expected = _py_greedy(range(len(pages_600)), edge_list)

    out = greedy_resolve(docs, res.edges.select("a", "b"), CFG).toPandas()
    assert set(out[out.is_kept].doc_id) == expected
    assert len(out) == len(pages_600)


def test_incremental_drops_only_vs_retained(spark, tmp_path):
    """Reference arrival-order semantics across batches
    (`ComparerThread.h:271-414`): a batch-2 doc near-duplicating a batch-1
    RETAINED doc is dropped; one near-duplicating only a batch-1 DROPPED
    doc is kept (the dropped doc is not in the retained state)."""
    from cpp_near_dedupe_spark.streaming.incremental import (
        SignatureState,
        dedupe_increment,
    )

    toks = [f"w{i}" for i in range(400)]
    d1 = " ".join(toks)
    # d2: first 60 tokens replaced -> J(d1,d2) ~ 0.72 (dup of d1, dropped)
    d2 = " ".join([f"x{i}" for i in range(60)] + toks[60:])
    # d11: d2 with the LAST 60 tokens also replaced -> near-dup of d2
    # (~0.72) but J vs d1 ~ 0.5 (two disjoint 60-token blocks differ)
    d11 = " ".join([f"x{i}" for i in range(60)] + toks[60:340] + [f"y{i}" for i in range(60)])
    # d10: exact copy of d1 (dup of the RETAINED doc)
    state = SignatureState(spark, str(tmp_path / "state"))
    b1 = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    kept1 = dedupe_increment(spark, b1, state, CFG)
    assert {r.doc_id for r in kept1.collect()} == {1}  # d2 dropped vs d1

    b2 = spark.createDataFrame([(10, d1), (11, d11)], "doc_id long, text string")
    kept2 = dedupe_increment(spark, b2, state, CFG)
    # 10 matches retained doc 1 -> dropped; 11 matches only DROPPED doc 2
    # -> kept (this is what distinguishes arrival-order from CC semantics)
    assert {r.doc_id for r in kept2.collect()} == {11}


def test_compact_crash_recovery(spark, tmp_path):
    """A crash between compact's two renames (live dir missing, _old
    present) must be recovered on the next use; stale _compacting dirs
    must not break the next compact (ADVICE r2)."""
    import os
    import shutil

    from cpp_near_dedupe_spark.streaming.incremental import (
        SignatureState,
        dedupe_increment,
    )

    text = " ".join(f"w{i % 97}" for i in range(300))
    state = SignatureState(spark, str(tmp_path / "state"))
    b1 = spark.createDataFrame([(1, text)], "doc_id long, text string")
    dedupe_increment(spark, b1, state, CFG)
    before = state.signatures().toPandas().sort_values("doc_id")

    # simulate the crash window: live dir renamed away, _old left behind
    os.rename(state.sig_path, state.sig_path + "_old")
    assert state.exists()  # recovery happens on access
    after = state.signatures().toPandas().sort_values("doc_id")
    assert list(before.doc_id) == list(after.doc_id)
    assert not os.path.exists(state.sig_path + "_old")

    # stale _compacting junk from a crashed rewrite must be cleared
    os.makedirs(state.sig_path + "_compacting/junk")
    state.compact(target_partitions=1)
    assert not os.path.exists(state.sig_path + "_compacting")
    assert list(state.signatures().toPandas().sort_values("doc_id").doc_id) == [1]

    # the recovered+compacted state still serves batches
    b2 = spark.createDataFrame([(2, text)], "doc_id long, text string")
    kept = dedupe_increment(spark, b2, state, CFG)
    assert kept.count() == 0


def test_chained_corpus_pins_greedy_vs_cc_divergence(spark):
    """The lsh_sql_greedy_kept fixture (__spark_entry__._chain_docs:
    prefix-truncated 4/5 and 13/20 token copies) must produce a~b~c
    jaccard chains with no a~c edge, where greedy keeps strictly MORE docs
    than connected-components — otherwise the driver's hash-green row
    would not distinguish the greedy semantics from CC. Also cross-checks
    the distributed greedy against the sequential Python oracle on these
    real pipeline edges."""
    import __spark_entry__ as em
    from cpp_near_dedupe_spark.operators.clustering import connected_components
    from cpp_near_dedupe_spark.plans.sql_mode import run_sql_pipeline

    docs = em._chain_docs(spark, "/root/testdata/sf0.01")
    res = run_sql_pipeline(spark, docs, em.CFG, stop_after="edges")
    edges = res.edges.select("a", "b").cache()
    edge_list = [(r.a, r.b) for r in edges.collect()]
    ids = [r.doc_id for r in docs.select("doc_id").collect()]

    out = greedy_resolve(docs, edges, em.CFG).toPandas()
    greedy_kept = set(out[out.is_kept].doc_id)
    assert greedy_kept == _py_greedy(ids, edge_list)

    cc = connected_components(edges, distinct_pairs=True).toPandas()
    cc_dropped = set(cc[cc.id != cc.cluster_id].id)
    cc_kept = set(ids) - cc_dropped
    # strict superset: every CC-kept doc is greedy-kept, plus the chain
    # endpoints whose only matches were themselves dropped
    assert cc_kept < greedy_kept
    assert len(greedy_kept - cc_kept) >= 5


def test_incremental_strict_order_matches_per_doc_reference(spark, tmp_path):
    """strict_order=True must reproduce the reference's per-doc pass where
    the default (within-batch CC first) provably differs: batch docs X < Y
    with X~Y, X matching state, Y not. Reference: X arrives, matches a
    retained state doc, dropped (never retained); Y arrives, its only
    match X is not retained, state has no match -> Y KEPT. The default
    mode drops both. Also cross-checks a 3-doc chain within one batch."""
    from cpp_near_dedupe_spark.streaming.incremental import (
        SignatureState,
        dedupe_increment,
    )

    toks = [f"w{i}" for i in range(400)]
    d_state = " ".join(toks)
    # X: ~0.72 vs d_state (matches state). Y: ~0.72 vs X, ~0.5 vs d_state.
    d_x = " ".join([f"x{i}" for i in range(60)] + toks[60:])
    d_y = " ".join(
        [f"x{i}" for i in range(60)] + toks[60:340] + [f"y{i}" for i in range(60)]
    )

    for strict, expect in ((False, set()), (True, {21})):
        state = SignatureState(spark, str(tmp_path / f"state_{strict}"))
        b1 = spark.createDataFrame([(1, d_state)], "doc_id long, text string")
        dedupe_increment(spark, b1, state, CFG, strict_order=strict)
        b2 = spark.createDataFrame(
            [(20, d_x), (21, d_y)], "doc_id long, text string"
        )
        kept = dedupe_increment(spark, b2, state, CFG, strict_order=strict)
        assert {r.doc_id for r in kept.collect()} == expect, f"strict={strict}"

    # within-batch chain a~b~c (no state): strict mode = greedy (keep a, c)
    d_a = d_state
    d_b = d_x
    d_c = d_y
    state = SignatureState(spark, str(tmp_path / "state_chain"))
    batch = spark.createDataFrame(
        [(1, d_a), (2, d_b), (3, d_c)], "doc_id long, text string"
    )
    kept = dedupe_increment(spark, batch, state, CFG, strict_order=True)
    assert {r.doc_id for r in kept.collect()} == {1, 3}


def test_engines_agree_and_deep_chain_is_one_job(spark):
    """r4: the per-component pandas engine must equal the frontier engine
    on a mixed graph, and a 500-link decision chain — 500 rounds under
    the frontier — resolves under 'auto' without touching max_rounds."""
    import time

    from cpp_near_dedupe_spark.operators import greedy as G

    n = 500
    chain = [(i, i + 1) for i in range(n - 1)]
    extra = [(1000, 1001), (1000, 1002), (1001, 1002)]  # a clique component
    ids = list(range(n)) + [1000, 1001, 1002, 2000]  # 2000 = edgeless
    docs = _ids_df(spark, ids)
    edges = _edges_df(spark, chain + extra)

    t0 = time.time()
    auto = {
        r.doc_id: r.is_kept
        for r in greedy_resolve(docs, edges, CFG, engine="auto").collect()
    }
    auto_wall = time.time() - t0
    # alternating keep on the chain (greedy MIS from the minimum)
    for i in range(n):
        assert auto[i] == (i % 2 == 0), f"doc {i}"
    assert auto[1000] and not auto[1001] and not auto[1002]
    assert auto[2000]
    # the frontier engine on the same chain would need n-1 rounds — prove
    # the claim on a shorter chain and pin the round count
    short = [(i, i + 1) for i in range(39)]
    frontier = {
        r.doc_id: r.is_kept
        for r in greedy_resolve(
            _ids_df(spark, range(40)),
            _edges_df(spark, short),
            CFG,
            engine="frontier",
            max_rounds=60,
        ).collect()
    }
    # rounds == decision-chain depth in NODES: doc 0 decides in round 1,
    # each successor one round later -> 40 rounds for a 40-node chain
    assert G.LAST_FRONTIER_ROUNDS == 40
    assert all(frontier[i] == (i % 2 == 0) for i in range(40))
    print(f"auto engine resolved 500-chain in {auto_wall:.1f}s "
          f"(frontier: 40 rounds for a 40-node chain)")


def test_frontier_converging_on_last_round_is_success(spark):
    """ADVICE r3: converging in exactly max_rounds must not raise (the old
    for/else raised 'did not converge' despite full convergence)."""
    chain = [(i, i + 1) for i in range(5)]  # decision depth exactly 6 nodes
    out = greedy_resolve(
        _ids_df(spark, range(6)),
        _edges_df(spark, chain),
        CFG,
        engine="frontier",
        max_rounds=6,
    ).toPandas()
    assert len(out) == 6  # no RuntimeError


def test_frontier_round_budget_exceeded_raises_cleanly(spark):
    import pytest as _pytest

    chain = [(i, i + 1) for i in range(10)]
    with _pytest.raises(RuntimeError, match="did not converge"):
        greedy_resolve(
            _ids_df(spark, range(11)),
            _edges_df(spark, chain),
            CFG,
            engine="frontier",
            max_rounds=3,
        ).collect()


def test_pandas_engine_rejects_over_cap_component(spark):
    import pytest as _pytest

    edges = _edges_df(spark, [(i, i + 1) for i in range(9)])
    with _pytest.raises(ValueError, match="component_cap"):
        greedy_resolve(
            _ids_df(spark, range(10)),
            edges,
            CFG,
            engine="pandas",
            component_cap=5,
        ).collect()


def test_auto_falls_back_to_frontier_for_big_components(spark):
    """Over-cap components route through the frontier engine; results must
    still match the python oracle."""
    from cpp_near_dedupe_spark.operators.greedy import greedy_decide_py

    star = [(0, j) for j in range(1, 30)]          # big (cap=10) star
    small = [(100, 101), (101, 102)]               # small chain
    ids = list(range(30)) + [100, 101, 102]
    out = {
        r.doc_id: r.is_kept
        for r in greedy_resolve(
            _ids_df(spark, ids),
            _edges_df(spark, star + small),
            CFG,
            engine="auto",
            component_cap=10,
        ).collect()
    }
    expect = greedy_decide_py(star + small, ids)
    assert out == expect


def test_component_cap_counts_edges_not_nodes(spark):
    """r5 (VERDICT #3): the cap bounds the per-task EDGE list. A clique on
    8 nodes carries 28 edges — under a node-count reading of cap=20 it
    would stay on the pandas path, but the task materializes 28 edge rows,
    so it must route to the frontier engine. The pandas engine (which
    raises on over-cap) proves the routing; auto must still match the
    python oracle through the fallback."""
    import pytest as _pytest

    from cpp_near_dedupe_spark.operators.greedy import greedy_decide_py

    clique = [(i, j) for i in range(8) for j in range(i + 1, 8)]  # 28 edges
    ids = list(range(8))
    with _pytest.raises(ValueError, match="component_cap"):
        greedy_resolve(
            _ids_df(spark, ids),
            _edges_df(spark, clique),
            CFG,
            engine="pandas",
            component_cap=20,
        ).collect()
    out = {
        r.doc_id: r.is_kept
        for r in greedy_resolve(
            _ids_df(spark, ids),
            _edges_df(spark, clique),
            CFG,
            engine="auto",
            component_cap=20,
        ).collect()
    }
    assert out == greedy_decide_py(clique, ids)


def test_compact_lock_single_writer(spark, tmp_path):
    """r4 (VERDICT #7): compaction is single-writer — a concurrent compact
    raises instead of racing the renames; a crashed holder's stale lock is
    broken after the timeout; an interrupted compact still recovers."""
    import os

    import pandas as pd
    import pytest as _pytest

    from cpp_near_dedupe_spark.streaming.incremental import SignatureState

    state = SignatureState(spark, str(tmp_path / "state"))
    sigs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(20), "sig_len": [1] * 20}),
    )
    bands = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(20), "band_key": range(20)})
    )
    state.append(sigs, bands)

    # holder alive: second compact refuses
    state._acquire_lock()
    with _pytest.raises(RuntimeError, match="single-writer"):
        state.compact()
    state._release_lock()

    # stale lock (holder long dead): broken and compaction proceeds
    state._acquire_lock()
    old = os.path.getmtime(state._lock_path)
    os.utime(state._lock_path, (old - 7200, old - 7200))
    state.compact()  # breaks the stale lock, runs, releases
    assert not os.path.exists(state._lock_path)

    # crash mid-swap (live dir renamed away, _old left) with a leftover
    # lock: the next compact breaks the stale lock and _recover restores
    os.rename(state.sig_path, state.sig_path + "_old")
    state._acquire_lock()
    os.utime(state._lock_path, (old - 7200, old - 7200))
    state.compact()
    assert state.signatures().count() == 20
    assert state.bands().count() == 20
