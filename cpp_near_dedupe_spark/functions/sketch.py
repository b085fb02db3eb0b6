"""Document sketching: tokenize → k-word shingles → XXH64 → bottom-N sketch.

Reproduces the reference's fingerprint contract (SURVEY.md §2.1):

1. UTF-8 → UTF-16 code units; 4-byte (non-BMP) UTF-8 lead/continuation bytes
   each become a space (`/root/reference/CPPDeduper/Hashing.h:49-92`).
   ``transcode_oracle`` reproduces this byte-exactly; the fast path uses
   Python's ``str.encode('utf-16-le')`` which emits surrogate pairs instead —
   token-equivalent because surrogates are delimiters in the classification
   table (see functions/alphanum.py), and delimiter code units never reach a
   hash.
2. Words = maximal runs of table-alphanumeric code units
   (`/root/reference/CPPDeduper/isalphanum.h:7-9`,
   `Shingler64.hpp:145-160`).
3. Every window of K=5 consecutive words is a shingle; its hash is
   XXH64(seed) over the concatenated UTF-16LE bytes of the 5 words, no
   separators (`Shingler64.hpp:151-192`; seed=0 at `Hashing.h:41`).
   Documents with fewer than K words have an empty sketch
   (`Shingler64.hpp:182-187`).
4. The sketch is the N=256 smallest *distinct* shingle hashes, sorted
   ascending; shorter if the document has fewer distinct shingles
   (`Shingler64.hpp:189-243`). This equals ``np.unique(hashes)[:N]`` — the
   reference's fill+max-heap phases are an online computation of exactly
   that (proof sketch: the heap max only decreases, so a value rejected or
   evicted once can never re-enter).

Two implementations:

* ``sketch_oracle`` — pure Python, structured exactly like the contract
  above; the test oracle.
* ``sketch_batch`` — numpy-vectorized over a batch of documents: per doc,
  token runs are found with one boolean-diff pass; all shingle windows in
  the batch are then hashed together, grouped by byte length, with the
  vectorized XXH64. This is the kernel the Spark Arrow UDF calls.
"""

from __future__ import annotations

import struct

import numpy as np

from .alphanum import ALPHANUM
from .xxh64 import xxh64, xxh64_rows

DEFAULT_K = 5  # shingle width in words (`/root/reference/CPPDeduper/CPPDeduper.cpp:20`)
DEFAULT_NUM_HASHES = 256  # bottom-N sketch size (`CPPDeduper.cpp:341`)
DEFAULT_SEED = 0  # XXH64 seed (`/root/reference/CPPDeduper/Hashing.h:41`)
HASH_CHUNK_WINDOWS = 1 << 14  # windows per vectorized hash call (L2-sized)


# ---------------------------------------------------------------------------
# Oracle path (pure Python, reference-faithful, used only in tests)
# ---------------------------------------------------------------------------

def transcode_oracle(utf8: bytes) -> list[int]:
    """UTF-8 bytes → UTF-16 code units, per `Hashing.h:49-92`.

    1/2/3-byte sequences decode normally; any other lead byte (4-byte
    sequences, stray continuation bytes) becomes ``0x20`` and consumes one
    byte. Malformed continuation bytes inside a 2/3-byte sequence raise.
    """
    out: list[int] = []
    i = 0
    n = len(utf8)

    def require(offset: int, count: int) -> None:
        if offset + count > n:
            raise ValueError("String too short")
        for j in range(count):
            if (utf8[offset + j] & 0xC0) != 0x80:
                raise ValueError("Illegal utf8 sequence")

    while i < n:
        c = utf8[i]
        if (c & 0x80) == 0:
            out.append(c)
            i += 1
        elif (c & 0xE0) == 0xC0:
            require(i + 1, 1)
            out.append(((c & 0x1F) << 6) | (utf8[i + 1] & 0x3F))
            i += 2
        elif (c & 0xF0) == 0xE0:
            require(i + 2, 1)
            out.append(((c & 0x0F) << 12) | ((utf8[i + 1] & 0x3F) << 6) | (utf8[i + 2] & 0x3F))
            i += 3
        else:
            out.append(0x20)
            i += 1
    return out


def tokenize_oracle(code_units: list[int]) -> list[list[int]]:
    """Maximal runs of table-alphanumeric code units."""
    words: list[list[int]] = []
    cur: list[int] = []
    for c in code_units:
        if ALPHANUM[c]:
            cur.append(c)
        elif cur:
            words.append(cur)
            cur = []
    if cur:
        words.append(cur)
    return words


def sketch_oracle(
    text: str | None,
    k: int = DEFAULT_K,
    num_hashes: int = DEFAULT_NUM_HASHES,
    seed: int = DEFAULT_SEED,
    hash_bits: int = 64,
) -> list[int]:
    """Bottom-N distinct shingle-hash sketch of ``text`` (sorted, unsigned).

    ``hash_bits=64`` (default): XXH64 over the shingle's UTF-16LE bytes;
    ``hash_bits=32``: the reference's FNV variant (`-s 32` mode, see
    functions/fnv32.py).
    """
    if text is None:
        return []
    words = tokenize_oracle(transcode_oracle(text.encode("utf-8")))
    if len(words) < k:
        return []
    hashes = set()
    for j in range(len(words) - k + 1):
        units = [c for w in words[j : j + k] for c in w]
        if hash_bits == 32:
            from .fnv32 import fnv32_shingle

            hashes.add(fnv32_shingle(units))
        else:
            payload = b"".join(struct.pack("<H", c) for c in units)
            hashes.add(xxh64(payload, seed))
    return sorted(hashes)[:num_hashes]


# ---------------------------------------------------------------------------
# Vectorized batch path (the Spark kernel)
# ---------------------------------------------------------------------------

_EMPTY_U64 = np.empty(0, dtype=np.uint64)
_EMPTY_U16 = np.empty(0, dtype="<u2")


def sketch_batch(
    texts,
    k: int = DEFAULT_K,
    num_hashes: int = DEFAULT_NUM_HASHES,
    seed: int = DEFAULT_SEED,
    hash_bits: int = 64,
) -> list[np.ndarray]:
    """Sketch a batch of documents; returns one sorted uint64 array per doc.

    Strategy: per document, one vectorized pass finds word runs and
    "compacts" word code units into a contiguous array, in which every
    k-word window is a contiguous slice. All windows across the whole batch
    are then hashed together, grouped by window length (each group is one
    ``(m, 2L)`` uint8 matrix → one vectorized XXH64 call). Per-doc
    ``np.unique`` produces the sorted bottom-N distinct sketch.
    """
    # Phase 1: per-doc tokenization (cheap numpy ops), collect windows.
    doc_tokens: list[np.ndarray] = []  # compacted word code units per doc
    doc_wstart: list[np.ndarray] = []  # window start offsets into compacted
    doc_wlen: list[np.ndarray] = []  # window lengths (code units)
    n_windows = 0
    for text in texts:
        if not text:
            doc_tokens.append(_EMPTY_U16)
            doc_wstart.append(None)
            doc_wlen.append(None)
            continue
        codes = np.frombuffer(text.encode("utf-16-le", "surrogatepass"), dtype="<u2")
        mask = ALPHANUM[codes]
        # word run boundaries via sign changes of the mask
        m8 = mask.astype(np.int8)
        d = np.diff(m8)
        starts = np.flatnonzero(d == 1) + 1
        ends = np.flatnonzero(d == -1) + 1
        if mask[0]:
            starts = np.concatenate(([0], starts))
        if mask[-1]:
            ends = np.concatenate((ends, [codes.size]))
        nw = starts.size
        if nw < k:
            doc_tokens.append(_EMPTY_U16)
            doc_wstart.append(None)
            doc_wlen.append(None)
            continue
        lens = ends - starts
        cum = np.concatenate(([0], np.cumsum(lens)))
        wlen = (cum[k:] - cum[: nw - k + 1]).astype(np.int64)
        wstart = cum[: nw - k + 1].astype(np.int64)
        doc_tokens.append(codes[mask])
        doc_wstart.append(wstart)
        doc_wlen.append(wlen)
        n_windows += wstart.size

    # Phase 2: hash all windows in the batch, grouped by byte length.
    # Build global arrays: for window g -> (doc offset into concat tokens).
    if n_windows == 0:
        return [_EMPTY_U64 for _ in doc_tokens]

    from .xxh64 import _SCRATCH

    tok_offsets = np.zeros(len(doc_tokens) + 1, dtype=np.int64)
    np.cumsum([t.size for t in doc_tokens], out=tok_offsets[1:])
    n_tok = int(tok_offsets[-1])
    all_tokens = _SCRATCH.get("sk_all_tok", max(n_tok, 1), np.uint16)[:n_tok]
    for di, t in enumerate(doc_tokens):
        if t.size:
            all_tokens[tok_offsets[di] : tok_offsets[di + 1]] = t

    g_start = _SCRATCH.get("sk_gstart", n_windows, np.int64)
    g_len = _SCRATCH.get("sk_glen", n_windows, np.int64)
    g_doc = _SCRATCH.get("sk_gdoc", n_windows, np.int64)
    pos = 0
    for di, (ws, wl) in enumerate(zip(doc_wstart, doc_wlen)):
        if ws is None:
            continue
        cnt = ws.size
        g_start[pos : pos + cnt] = ws + tok_offsets[di]
        g_len[pos : pos + cnt] = wl
        g_doc[pos : pos + cnt] = di
        pos += cnt

    g_hash = _SCRATCH.get("sk_ghash", n_windows, np.uint64)
    order = np.argsort(g_len, kind="stable")
    sorted_len = g_len[order]
    # group boundaries over the sorted length array
    bounds = np.flatnonzero(np.diff(sorted_len)) + 1
    group_slices = np.split(order, bounds)
    # gather windows into reused scratch (fresh allocations fault-storm on
    # ballooned VMs — see functions/xxh64.py _Scratch). Chunk size 16384
    # keeps the per-call working set L2-resident: measured 4× faster than
    # 128k chunks when 8 workers share the memory bus. (A sliding-window
    # strided view + np.take(axis=0) was tried instead of the index matrix
    # and is ~200× slower — numpy row-take on overlapping strided views is
    # pathological.)
    from .xxh64 import _SCRATCH

    max_chunk = HASH_CHUNK_WINDOWS
    for idx in group_slices:
        L = int(g_len[idx[0]])
        for off in range(0, idx.size, max_chunk):
            sub = idx[off : off + max_chunk]
            mm = sub.size
            idxbuf = _SCRATCH.get("sk_idx", mm * L, np.int64)[: mm * L].reshape(mm, L)
            np.add(g_start[sub][:, None], np.arange(L)[None, :], out=idxbuf)
            tokbuf = _SCRATCH.get("sk_tok", mm * L, np.uint16)[: mm * L].reshape(mm, L)
            np.take(all_tokens, idxbuf, out=tokbuf)
            if hash_bits == 32:
                from .fnv32 import fnv32_u16_rows

                g_hash[sub] = fnv32_u16_rows(tokbuf).astype(np.uint64)
            else:
                g_hash[sub] = xxh64_rows(
                    tokbuf.view(np.uint8).reshape(mm, 2 * L), seed
                )

    # Phase 3: per-doc distinct + bottom-N (np.unique sorts ascending).
    out: list[np.ndarray] = []
    doc_order = np.argsort(g_doc, kind="stable")
    doc_bounds = np.flatnonzero(np.diff(g_doc[doc_order])) + 1
    per_doc = iter(zip(
        np.split(g_hash[doc_order], doc_bounds),
        np.split(g_doc[doc_order], doc_bounds),
    ))
    nxt = next(per_doc, None)
    for di in range(len(doc_tokens)):
        if nxt is not None and nxt[1][0] == di:
            out.append(np.unique(nxt[0])[:num_hashes])
            nxt = next(per_doc, None)
        else:
            out.append(_EMPTY_U64)
    return out
