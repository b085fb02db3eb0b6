"""Set-Jaccard over sorted, distinct sketch arrays.

Reproduces `JaccardClassical` (`/root/reference/CPPDeduper/Jaccard.h:23-43`):
sorted-merge intersection count, ``J = |∩| / (len1 + len2 - |∩|)``. The
reference's early-out (`JaccardFast`, `Jaccard.h:45-72`) and SIMD
(`JaccardTurbo2`, `Jaccard.h:193-312`) variants are decision-equivalent
optimizations of this; our vectorization comes from numpy batch set-ops
instead, so we always report the exact score (SURVEY.md §7.4: Fast/Turbo
zero out sub-threshold scores — a quirk we deliberately do not reproduce).

Empty-sketch normalization: the reference computes 0/0 = NaN for two empty
sketches, which fails the ``>= threshold`` test (`Jaccard.h:41-42`,
`ComparerThread.h:156`); empty-vs-nonempty is 0.0. We normalize both to
score 0.0 ⇒ never a duplicate.

``jaccard_batch`` exploits that each sketch is internally distinct: for a
pair (a, b), ``|a ∩ b|`` equals the number of adjacent equal values in
``sort(concat(a, b))``. Pairs are grouped by total length so each group is
one rectangular ``(m, L)`` matrix sorted along axis 1 in one numpy call —
no per-pair Python beyond the gather.
"""

from __future__ import annotations

import numpy as np


def jaccard_oracle(a, b) -> float:
    """Exact set-Jaccard of two sorted distinct arrays (scalar oracle)."""
    sa, sb = set(map(int, a)), set(map(int, b))
    union = len(sa) + len(sb) - len(sa & sb)
    if union == 0:
        return 0.0
    return len(sa & sb) / union


def jaccard_batch(sigs_a: list[np.ndarray], sigs_b: list[np.ndarray]) -> np.ndarray:
    """Vectorized Jaccard for aligned lists of sketch arrays → (m,) float64."""
    m = len(sigs_a)
    out = np.zeros(m, dtype=np.float64)
    if m == 0:
        return out
    la = np.fromiter((a.size for a in sigs_a), count=m, dtype=np.int64)
    lb = np.fromiter((b.size for b in sigs_b), count=m, dtype=np.int64)
    total = la + lb
    nonzero = np.flatnonzero((la > 0) & (lb > 0))
    if nonzero.size == 0:
        return out
    from .xxh64 import _SCRATCH

    order = nonzero[np.argsort(total[nonzero], kind="stable")]
    bounds = np.flatnonzero(np.diff(total[order])) + 1
    max_chunk = 1 << 11  # pairs per chunk: keeps the concat-sort matrix ~8MB
    for idx0 in np.split(order, bounds):
        L = int(total[idx0[0]])
        for off in range(0, idx0.size, max_chunk):
            idx = idx0[off : off + max_chunk]
            mat = _SCRATCH.get("jac_mat", idx.size * L)[: idx.size * L].reshape(
                idx.size, L
            )
            for r, i in enumerate(idx):
                mat[r, : la[i]] = sigs_a[i]
                mat[r, la[i] :] = sigs_b[i]
            mat.sort(axis=1)
            eq = _SCRATCH.get("jac_eq", idx.size * (L - 1), np.bool_)[
                : idx.size * (L - 1)
            ].reshape(idx.size, L - 1)
            np.equal(mat[:, 1:], mat[:, :-1], out=eq)
            ninter = eq.sum(axis=1)
            out[idx] = ninter / (total[idx] - ninter)
    return out
