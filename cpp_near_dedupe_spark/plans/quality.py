"""Quality harness: pairwise F1 at matched LSH band keys (the BASELINE metric).

Ground truth is derived — never hand-labeled — by running the pure-Python /
vectorized oracle kernels driver-side over the corpus (FIXTURES.md §2):

* labeled pair set = all pairs sharing ≥1 of the 64 deterministic band keys
  (the metric conditions on "matched LSH band keys", BASELINE.json);
* label = exact sketch-Jaccard ≥ threshold
  (J1 semantics, `/root/reference/CPPDeduper/Jaccard.h:23-43`).

Prediction = "the pipeline put the two docs in the same cluster". Note the
documented divergence (SURVEY.md §7.3): transitive chains make CC merge
docs whose direct Jaccard is sub-threshold — those count as false
positives under this pairwise metric even though transitive clustering is
the specified behavior (north_rule); the F1≥0.99 target budgets for them.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass

import numpy as np


@dataclass
class PairwiseF1:
    f1: float
    precision: float
    recall: float
    tp: int
    fp: int
    fn: int
    n_labeled_pairs: int


def oracle_labeled_pairs(texts, threshold: float = 0.7):
    """(pairs, jaccards, sketches): all doc-index pairs sharing a band key,
    with their exact sketch-Jaccard. Vectorized; fine up to ~50k docs."""
    from ..functions import band_keys_batch, jaccard_batch, sketch_batch

    sigs = sketch_batch(list(texts))
    di, bi, bk = band_keys_batch(sigs)
    buckets = defaultdict(list)
    for d, b, k in zip(di.tolist(), bi.tolist(), bk.tolist()):
        buckets[(b, k)].append(d)
    pairs = set()
    for docs in buckets.values():
        if len(docs) > 1:
            docs = sorted(docs)
            for x in range(len(docs)):
                for y in range(x + 1, len(docs)):
                    pairs.add((docs[x], docs[y]))
    pairs = sorted(pairs)
    jac = jaccard_batch([sigs[i] for i, _ in pairs], [sigs[j] for _, j in pairs])
    return pairs, jac, sigs


def pairwise_f1(pairs, jaccards, same_cluster, threshold: float = 0.7) -> PairwiseF1:
    """same_cluster: callable (i, j) -> bool from the pipeline's clusters."""
    tp = fp = fn = 0
    for (i, j), jv in zip(pairs, jaccards):
        truth = jv >= threshold
        pred = same_cluster(i, j)
        if truth and pred:
            tp += 1
        elif truth:
            fn += 1
        elif pred:
            fp += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return PairwiseF1(f1, precision, recall, tp, fp, fn, len(pairs))


def union_find_clusters(n: int, edges) -> list[int]:
    """Exact CC oracle over explicit edges (test ground truth for clustering)."""
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return [find(i) for i in range(n)]
