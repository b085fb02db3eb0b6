"""Strict arrival-order greedy resolution — the reference's exact keep/drop
semantics as a distributed fixed-point.

The reference processes documents in arrival order and drops a doc iff it
scores ≥ threshold against an already-RETAINED earlier doc
(`/root/reference/CPPDeduper/ComparerThread.h:271-414`); a doc whose only
matches were themselves dropped is KEPT. This differs from the pipeline's
default connected-components resolve on chains: for edges A~B, B~C with no
A~C edge, CC keeps only A (one cluster), greedy keeps A and C (B dropped
against A; C's only match B is not retained).

The greedy retained set is the lexicographically-first maximal independent
set of the duplicate graph — inherently sequential in general, but
computable in parallel rounds because a doc's fate depends only on its
EARLIER neighbors: each round decides every doc whose earlier neighbors
are all decided (the frontier). Round count = length of the longest
decision chain; real dupe families are stars/cliques around their minimum,
so 2-3 rounds decide virtually everything.

Per round, everything is hash joins on ids (no windows, no sorts):

* ``frontier`` = undecided docs with no undecided earlier neighbor
  (anti-join against the undecided edge heads);
* frontier docs with an edge from a retained doc → dropped (semi-join);
* the rest of the frontier → retained;
* edges out of dropped docs are discarded (they can never drop anyone).

Like connected_components, every round is lazily localCheckpoint-ed and
the same job that materializes it counts the remaining undecided set —
one Spark job per round, bounded lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupeConfig


def greedy_resolve(
    docs: DataFrame,
    edges: DataFrame,
    cfg: DedupeConfig,
    max_rounds: int = 60,
) -> DataFrame:
    """docs × duplicate edges (a, b) → (id, is_kept) for ALL docs, under
    the reference's arrival-order semantics (arrival order = ascending
    ``cfg.id_col``, the reference's (file_index, row_number) packed id).

    ``edges`` is undirected input; it is canonicalized to (earlier, later)
    here. Docs without any edge never enter the loop (kept by definition,
    unioned in at the end) — the loop's working set is only the duplicate
    mass, a small fraction of the corpus at any scale.
    """
    id_col = cfg.id_col
    e = (
        edges.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    undecided = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    retained = None  # ids decided kept, accumulated
    dropped = None  # ids decided dropped

    remaining = undecided.count()
    for _ in range(max_rounds):
        if remaining == 0:
            break
        # frontier: undecided docs none of whose EARLIER neighbors are
        # still undecided (edge heads `a` still in play)
        live_heads = e.join(
            undecided.withColumnRenamed("id", "a"), "a", "left_semi"
        )
        frontier = undecided.join(
            live_heads.select(F.col("b").alias("id")), "id", "left_anti"
        )
        # dropped iff some retained earlier neighbor exists
        if retained is not None:
            killer_edges = e.join(
                retained.withColumnRenamed("id", "a"), "a", "left_semi"
            )
            new_dropped = frontier.join(
                killer_edges.select(F.col("b").alias("id")), "id", "left_semi"
            )
            new_retained = frontier.join(new_dropped, "id", "left_anti")
        else:
            new_dropped = None
            new_retained = frontier

        retained = (
            new_retained
            if retained is None
            else retained.unionByName(new_retained)
        ).localCheckpoint(eager=False)
        if new_dropped is not None:
            dropped = (
                new_dropped if dropped is None else dropped.unionByName(new_dropped)
            ).localCheckpoint(eager=False)
            # edges whose head was dropped can never drop anyone: discard
            e = e.join(
                dropped.withColumnRenamed("id", "a"), "a", "left_anti"
            ).localCheckpoint(eager=False)
        undecided = undecided.join(frontier, "id", "left_anti").localCheckpoint(
            eager=False
        )
        new_remaining = undecided.count()
        if new_remaining == remaining:
            raise RuntimeError(
                "greedy_resolve made no progress (cyclic ordering impossible "
                "— this indicates corrupt edge input)"
            )
        remaining = new_remaining
    else:
        raise RuntimeError(f"greedy_resolve did not converge in {max_rounds} rounds")

    dropped_ids = (
        dropped
        if dropped is not None
        else docs.sparkSession.createDataFrame([], "id long")
    )
    return docs.select(F.col(id_col)).join(
        dropped_ids.withColumnRenamed("id", id_col), id_col, "left_anti"
    ).select(id_col, F.lit(True).alias("is_kept")).unionByName(
        dropped_ids.select(
            F.col("id").alias(id_col), F.lit(False).alias("is_kept")
        )
    )
