"""k-permutation MinHash: estimator property + determinism.

The signature agreement fraction must estimate true shingle-set Jaccard
within binomial error (sd = sqrt(J(1-J)/128) <= 0.045)."""

import numpy as np
import pytest

from cpp_near_dedupe_spark.operators.minhash_perm import (
    minhash_perm_jaccard,
    minhash_perm_signatures,
    perm_params,
)


def _doc(words):
    return " ".join(words)


@pytest.fixture(scope="module")
def corpus(spark):
    # controlled overlap: doc pairs (2i, 2i+1) share a known fraction of
    # their shingles by sharing a prefix of the word stream
    rng = np.random.default_rng(11)
    rows = []
    for i, overlap in enumerate([1.0, 0.9, 0.7, 0.5, 0.3, 0.0]):
        vocab_a = [f"w{i}x{j}" for j in range(200)]
        n_shared = int(200 * overlap)
        vocab_b = vocab_a[:n_shared] + [f"w{i}y{j}" for j in range(200 - n_shared)]
        rows.append((2 * i, _doc(vocab_a)))
        rows.append((2 * i + 1, _doc(vocab_b)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _true_jaccard(t1, t2, k=5):
    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}
    a, b = sh(t1), sh(t2)
    return len(a & b) / len(a | b) if a | b else 0.0


def test_estimator_tracks_true_jaccard(spark, corpus):
    sigs = minhash_perm_signatures(corpus, num_perm=128)
    pairs = spark.createDataFrame(
        [(2 * i, 2 * i + 1) for i in range(6)], "a long, b long"
    )
    est = {(r.a, r.b): r.est_jaccard for r in minhash_perm_jaccard(sigs, pairs).collect()}
    docs = {r.doc_id: r.text for r in corpus.collect()}
    for (a, b), e in est.items():
        true = _true_jaccard(docs[a], docs[b])
        assert abs(e - true) <= 0.14, (a, b, e, true)  # ~3 binomial sd
    # identical docs -> exact 1.0; disjoint -> ~0
    assert est[(0, 1)] == 1.0
    assert est[(10, 11)] <= 0.05


def test_signature_shape_and_determinism(spark, corpus):
    sigs = minhash_perm_signatures(corpus, num_perm=128).toPandas()
    assert (sigs.signature.map(len) == 128).all()
    again = minhash_perm_signatures(corpus, num_perm=128).toPandas()
    for s1, s2 in zip(sigs.sort_values("doc_id").signature, again.sort_values("doc_id").signature):
        assert list(s1) == list(s2)
    # params are deterministic and in-range
    ps = perm_params(128)
    assert ps == perm_params(128)
    assert all(1 <= a < 2147483647 and 0 <= b < 2147483647 for a, b in ps)


def test_short_docs_empty_signature(spark):
    docs = spark.createDataFrame([(0, "too few words"), (1, None)], "doc_id long, text string")
    out = minhash_perm_signatures(docs, num_perm=16).toPandas()
    assert (out.n_shingles == 0).all()
    assert (out.signature.map(len) == 0).all()
