"""Jaro-Winkler string similarity — batched kernel for entity resolution.

Classic definition (Winkler 1990, as implemented by DuckDB's
``jaro_winkler_similarity``, which is this module's test oracle):

* match window = max(0, max(|s1|, |s2|) // 2 - 1)
* jaro = (m/|s1| + m/|s2| + (m - t)/m) / 3   (m = matches, t = half the
  transpositions); 0.0 when either string is empty or m = 0
* winkler boost: jaro + L · 0.1 · (1 - jaro) applied ONLY when
  jaro > 0.7, with L = common prefix length capped at 4

Jaro-Winkler is designed for short identity-ish strings (names, titles,
url slugs) — the record-linkage complement to the sketch-Jaccard used for
document bodies. The kernel is a per-pair scalar loop over numpy char
codes inside an Arrow batch; strings are short by contract, so the batch
loop (not per-char Python) dominates.
"""

from __future__ import annotations

import numpy as np

_PREFIX_CAP = 4
_PREFIX_WEIGHT = 0.1
_BOOST_THRESHOLD = 0.7


def jaro(s1: str, s2: str) -> float:
    # operates on UTF-8 BYTES, not codepoints — matching DuckDB (and most
    # C implementations); for the ASCII identity strings JW is meant for,
    # the two definitions coincide
    a = np.frombuffer(s1.encode("utf-8"), dtype=np.uint8)
    b = np.frombuffer(s2.encode("utf-8"), dtype=np.uint8)
    l1, l2 = a.size, b.size
    if l1 == 0 or l2 == 0:
        return 0.0
    if l1 == l2 and np.array_equal(a, b):
        return 1.0
    window = max(0, max(l1, l2) // 2 - 1)
    b_taken = np.zeros(l2, dtype=bool)
    a_match = np.full(l1, -1, dtype=np.int64)
    m = 0
    for i in range(l1):
        lo = max(0, i - window)
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not b_taken[j] and a[i] == b[j]:
                b_taken[j] = True
                a_match[i] = j
                m += 1
                break
    if m == 0:
        return 0.0
    # transpositions: matched chars of a, in order, vs matched chars of b
    a_chars = a[a_match >= 0]
    b_chars = b[np.sort(a_match[a_match >= 0])]
    t = int(np.count_nonzero(a_chars != b_chars)) // 2
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str) -> float:
    j = jaro(s1, s2)
    if j > _BOOST_THRESHOLD:
        b1, b2 = s1.encode("utf-8"), s2.encode("utf-8")
        cap = min(_PREFIX_CAP, len(b1), len(b2))
        L = 0
        while L < cap and b1[L] == b2[L]:
            L += 1
        j += L * _PREFIX_WEIGHT * (1.0 - j)
    return j


def jaro_winkler_batch(left: list[str], right: list[str]) -> np.ndarray:
    return np.fromiter(
        (jaro_winkler(a or "", b or "") for a, b in zip(left, right)),
        dtype=np.float64,
        count=len(left),
    )
