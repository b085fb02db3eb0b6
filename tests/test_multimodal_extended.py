"""Extended multimodal plumbing: frame sampling, decode→resize, embedding.

The container has no media libraries, so decode is a deterministic stub —
but the frame-slice extraction, nearest-neighbor resample arithmetic, and
embedding featurizer are REAL computations, pinned here against scalar
python oracles.
"""

import hashlib

import numpy as np
import pandas as pd
import pytest

from cpp_near_dedupe_spark.operators.multimodal import (
    decode_media,
    frame_offsets,
    media_embedding,
    resize_image,
    sample_frames,
    with_binary_payload,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rng = np.random.default_rng(5)
    rows = [(i, bytes(rng.integers(0, 256, size=int(n), dtype=np.uint8)))
            for i, n in enumerate([0, 100, 256, 1000, 5000])]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_frame_offsets_arithmetic(spark, media_df):
    got = frame_offsets(media_df, frame_bytes=256, n_frames=4).toPandas()
    # oracle: evenly spaced whole frames, 1-based offsets
    exp = []
    for i, n in enumerate([0, 100, 256, 1000, 5000]):
        n_avail = n // 256
        k = min(4, n_avail)
        for j in range(k):
            exp.append((i, j, (j * n_avail // k) * 256 + 1, 256))
    got_t = sorted(
        map(tuple, got[["doc_id", "frame_idx", "frame_offset", "frame_len"]].values)
    )
    assert got_t == sorted(exp)
    # payloads shorter than one frame yield no rows
    assert not (got.doc_id == 0).any() and not (got.doc_id == 1).any()


def test_sample_frames_bytes_match_python_slicing(spark, media_df):
    pdf = media_df.toPandas()
    payloads = {r.doc_id: bytes(r.payload) for r in pdf.itertuples()}
    got = sample_frames(media_df, frame_bytes=256, n_frames=4).toPandas()
    for r in got.itertuples():
        sliced = payloads[r.doc_id][r.frame_offset - 1 : r.frame_offset - 1 + 256]
        assert bytes(r.frame) == sliced
        assert r.frame_md5 == hashlib.md5(sliced).hexdigest()


def test_decode_stub_and_resize_oracle(spark, media_df):
    decoded = decode_media(media_df)
    resized = resize_image(decoded, out_w=4, out_h=3).toPandas()
    dec = decoded.toPandas()
    for r in resized.itertuples():
        d = dec[dec.doc_id == r.doc_id].iloc[0]
        grid = np.asarray(d.pixels, dtype=np.float32).reshape(d.height, d.width)
        # scalar nearest-neighbor oracle
        exp = [
            grid[(y * d.height) // 3][(x * d.width) // 4]
            for y in range(3)
            for x in range(4)
        ]
        assert r.width == 4 and r.height == 3
        assert np.allclose(np.asarray(r.pixels), exp)


def test_decode_gate_raises_without_stub(spark, media_df):
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        decode_media(media_df, decode_stub=False).collect()


def test_media_embedding_feeds_ann(spark):
    """The featurizer output plugs directly into the ANN operators —
    identical payloads are exact neighbors (cosine 1.0)."""
    from cpp_near_dedupe_spark.operators.embedding_ann import brute_force_topk

    docs = spark.createDataFrame(
        [(0, "same bytes"), (1, "same bytes"), (2, "different"), (3, "other")],
        "doc_id long, text string",
    )
    emb = media_embedding(with_binary_payload(docs), dim=16)
    pdf = emb.toPandas()
    # deterministic: equal payloads -> equal vectors, unit norm
    v0, v1, v2 = (np.asarray(pdf[pdf.doc_id == i].embedding.iloc[0]) for i in range(3))
    assert np.array_equal(v0, v1) and not np.array_equal(v0, v2)
    assert abs(np.linalg.norm(v0) - 1.0) < 1e-5
    top = brute_force_topk(emb, query_ids=[0], k=1, id_col="doc_id").toPandas()
    assert top.neighbor_id.iloc[0] == 1 and top.cosine.iloc[0] == pytest.approx(1.0)
