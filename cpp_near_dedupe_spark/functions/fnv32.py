"""32-bit shingle hash — the reference's `-s 32` mode.

Per UTF-16 code unit ``c`` the reference folds
(`/root/reference/CPPDeduper/Shingler32.hpp:151-164`, init 2166136261):

    h ^= (c & 0xff); h *= 16777619
    h ^= (c >> 16);  h *= 16777619      # c is uint16 -> this xor is 0

i.e. an FNV-1a variant where ONLY THE LOW BYTE of each code unit
participates and every unit multiplies by the FNV prime twice. The
``c >> 16`` no-op (compiler-warned in the reference) is part of the
observable contract, so we reproduce the low-byte-only behavior exactly.
Default mode stays 64-bit XXH64; this exists for reference CLI parity.
"""

from __future__ import annotations

import numpy as np

FNV_INIT = np.uint32(2166136261)
FNV_PRIME = np.uint32(16777619)
_M32 = (1 << 32) - 1


def fnv32_shingle(code_units) -> int:
    """Scalar oracle: hash of one shingle's concatenated code units."""
    h = 2166136261
    for c in code_units:
        h = ((h ^ (c & 0xFF)) * 16777619) & _M32
        h = (h * 16777619) & _M32  # the (c >> 16) xor is always 0
    return h


def fnv32_u16_rows(mat: np.ndarray) -> np.ndarray:
    """Vectorized: (m, L) uint16 code-unit rows → (m,) uint32 hashes.

    Sequential fold over the L positions (FNV is a chain), vectorized
    across the m windows.
    """
    m, L = mat.shape
    h = np.full(m, FNV_INIT, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for j in range(L):
            np.bitwise_xor(h, mat[:, j].astype(np.uint32) & np.uint32(0xFF), out=h)
            np.multiply(h, FNV_PRIME, out=h)
            np.multiply(h, FNV_PRIME, out=h)
    return h
