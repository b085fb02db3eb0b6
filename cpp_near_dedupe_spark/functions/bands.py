"""LSH banding: split a sketch into contiguous bands and key each band.

The reference splits the sorted sketch into ``bands`` (default 64,
`/root/reference/CPPDeduper/CPPDeduper.cpp:358`) contiguous slices of
``band_size = num_hashes / bands`` values (256/64 = 4) and derives one
bucket key per band (`LSHBandHashMap.h:327-331`). Two documents collide —
become a candidate pair — iff some band slice is equal.

Band-key function: the reference's default (`rbs32`) is seeded with
``std::time(0)`` (`LSHBandHashMap.h:171`) and therefore irreproducible
across runs; its alternative (`hpb64`) is a weak hand-rolled mix the author
flags as "terrible" (`LSHBandHashMap.h:54-57`). We canonicalize on the
*semantics that matter* — equal band content ⇒ equal key, unequal content ⇒
unequal key w.h.p. — using XXH64(band values' LE bytes, seed = band index).
Divergence from the reference documented in SURVEY.md §2 B2a/B2b.

Short sketches: the reference reads past the end of short sketches
(undefined behavior, author TODO at `LSHBandHashMap.h:326`); we instead
define that only bands fully inside the sketch participate (SURVEY.md §2.1
item 6): a doc with ``sig_len`` values yields ``sig_len // band_size``
bands. Docs with empty sketches yield no bands and thus never collide,
matching the reference's "empty sketch is never a duplicate" normalization.
"""

from __future__ import annotations

import numpy as np

from .xxh64 import xxh64, xxh64_u64_rows

DEFAULT_BANDS = 64  # `/root/reference/CPPDeduper/CPPDeduper.cpp:358`


def band_keys_oracle(signature: list[int], bands: int = DEFAULT_BANDS,
                     num_hashes: int = 256) -> list[tuple[int, int]]:
    """(band_id, band_key) pairs for one signature — scalar test oracle."""
    band_size = num_hashes // bands
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    out = []
    for b in range(len(signature) // band_size):
        payload = b"".join(
            int(v).to_bytes(8, "little") for v in signature[b * band_size : (b + 1) * band_size]
        )
        out.append((b, xxh64(payload, seed=b)))
    return out


def band_keys_batch(
    signatures: list[np.ndarray],
    bands: int = DEFAULT_BANDS,
    num_hashes: int = 256,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized band keys for a batch of sketches.

    Returns ``(doc_idx, band_id, band_key)`` int64/int64/uint64 arrays —
    the exploded (document, band) pairs for every *complete* band of every
    signature in the batch. One XXH64 call per band column over the whole
    batch (each is a ``(m, band_size*8)`` byte matrix).
    """
    band_size = num_hashes // bands
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    m = len(signatures)
    if m == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), np.empty(0, dtype=np.uint64)
    sig_len = np.fromiter((s.size for s in signatures), count=m, dtype=np.int64)
    n_bands_doc = sig_len // band_size
    # pad into a (m, num_hashes) matrix once; zero-padding never produces a
    # *kept* band key because bands past n_bands_doc are masked out.
    padded = np.zeros((m, num_hashes), dtype=np.uint64)
    for i, s in enumerate(signatures):
        padded[i, : s.size] = s
    keys = np.empty((m, bands), dtype=np.uint64)
    for b in range(bands):
        keys[:, b] = xxh64_u64_rows(padded[:, b * band_size : (b + 1) * band_size], seed=b)
    band_ids = np.broadcast_to(np.arange(bands, dtype=np.int64), (m, bands))
    keep = band_ids < n_bands_doc[:, None]
    doc_idx = np.broadcast_to(np.arange(m, dtype=np.int64)[:, None], (m, bands))
    return doc_idx[keep], band_ids[keep], keys[keep]


# ---------------------------------------------------------------------------
# rbs band keys — emulation of the reference's default `rbs32/rbs64` mode
# ---------------------------------------------------------------------------

def _rbs_tables(band_u16_words: int, buckets: int, seed: int):
    """The reference's random tables (`LSHBandHashMap.h:167-189`): ~16
    distinct bit-check positions in [0, C] (C = 65535) and one random
    bucket weight per position. The reference seeds these with
    ``std::time(0)`` — irreproducible across runs by construction — so this
    emulation fixes the seed (and uses numpy's RNG; libstdc++'s
    distribution algorithm is implementation-defined anyway). Divergence
    documented in SURVEY.md §2 B2b.
    """
    rng = np.random.default_rng(seed)
    c = 65535
    positions = []
    while len(positions) < band_u16_words:
        t = int(rng.integers(0, c + 1))
        if t not in positions:
            positions.append(t)
    positions = np.array(sorted(positions), dtype=np.int64)
    weights = rng.integers(0, min(buckets, 1 << 16), size=band_u16_words).astype(
        np.uint64
    )
    return positions, weights


def rbs_band_keys_batch(
    signatures: list[np.ndarray],
    bands: int = DEFAULT_BANDS,
    num_hashes: int = 256,
    buckets: int = (1 << 32) - 1,
    seed: int = 1234,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random-bit-sampling band keys (`LSHBandHashMap.h:202-217` semantics):
    the band is viewed as uint16 words; for each random position p, if
    ``(p % C) <= band_words[p % W]`` add that position's random weight; the
    key is the sum mod ``buckets``. Returns the same exploded triple as
    ``band_keys_batch``. Lossier than content-hash keys (a sum of a subset
    of 16 weights collides easily) — kept for reference-mode parity, not
    the default."""
    band_size = num_hashes // bands
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    w = band_size * 4  # uint16 words per band (64-bit values)
    positions, weights = _rbs_tables(w, buckets, seed)
    m = len(signatures)
    if m == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), np.empty(0, dtype=np.uint64)
    sig_len = np.fromiter((s.size for s in signatures), count=m, dtype=np.int64)
    n_bands_doc = sig_len // band_size
    padded = np.zeros((m, num_hashes), dtype=np.uint64)
    for i, s in enumerate(signatures):
        padded[i, : s.size] = s
    words = padded.view("<u2").reshape(m, bands, w)  # uint16 view per band
    thresholds = (positions % 65535).astype(np.uint16)  # (p % C)
    word_idx = (positions % w).astype(np.int64)  # p % VectorLength
    # (m, bands, 16) comparison -> weighted sum
    sel = words[:, :, word_idx] >= thresholds[None, None, :]
    keys = (sel.astype(np.uint64) * weights[None, None, :]).sum(axis=2)
    with np.errstate(over="ignore"):
        keys = keys % np.uint64(buckets)
    band_ids = np.broadcast_to(np.arange(bands, dtype=np.int64), (m, bands))
    keep = band_ids < n_bands_doc[:, None]
    doc_idx = np.broadcast_to(np.arange(m, dtype=np.int64)[:, None], (m, bands))
    return doc_idx[keep], band_ids[keep], keys[keep]
