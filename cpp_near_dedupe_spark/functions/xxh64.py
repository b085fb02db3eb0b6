"""XXH64 — independent implementations of the public xxHash64 algorithm.

The reference engine hashes every k-word shingle with XXH64(seed=0)
(`/root/reference/CPPDeduper/Shingler64.hpp:126,155-157,192` via the vendored
upstream xxhash). We need bit-identical hash values for sketch parity, but the
`xxhash` python package is not available in this environment, so this module
implements the published xxHash64 specification
(https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) twice:

* ``xxh64`` — scalar, pure-Python big-int arithmetic. Used by the test oracle.
* ``xxh64_rows`` — numpy-vectorized over a matrix of fixed-length byte rows.
  Used by the Spark-side vectorized sketch/banding kernels: one call hashes
  every same-length shingle window in an Arrow batch at once.

The two implementations are developed independently (python ints vs uint64
numpy lanes) and cross-checked against each other and against the published
test vectors in tests/test_xxh64.py.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """Scalar XXH64 per the public spec; returns an unsigned 64-bit int."""
    n = len(data)
    p = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M64
        a2 = (seed + _P2) & _M64
        a3 = seed & _M64
        a4 = (seed - _P1) & _M64
        while n - p >= 32:
            lanes = [int.from_bytes(data[p + 8 * i : p + 8 * i + 8], "little") for i in range(4)]
            a1 = (_rotl((a1 + lanes[0] * _P2) & _M64, 31) * _P1) & _M64
            a2 = (_rotl((a2 + lanes[1] * _P2) & _M64, 31) * _P1) & _M64
            a3 = (_rotl((a3 + lanes[2] * _P2) & _M64, 31) * _P1) & _M64
            a4 = (_rotl((a4 + lanes[3] * _P2) & _M64, 31) * _P1) & _M64
            p += 32
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M64
        for a in (a1, a2, a3, a4):
            h = ((h ^ (_rotl((a * _P2) & _M64, 31) * _P1) & _M64) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while n - p >= 8:
        lane = int.from_bytes(data[p : p + 8], "little")
        h = (_rotl(h ^ ((_rotl((lane * _P2) & _M64, 31) * _P1) & _M64), 27) * _P1 + _P4) & _M64
        p += 8
    if n - p >= 4:
        lane = int.from_bytes(data[p : p + 4], "little")
        h = (_rotl(h ^ ((lane * _P1) & _M64), 23) * _P2 + _P3) & _M64
        p += 4
    while p < n:
        h = (_rotl(h ^ ((data[p] * _P5) & _M64), 11) * _P1) & _M64
        p += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


_U = np.uint64
_uP1, _uP2, _uP3, _uP4, _uP5 = (_U(_P1), _U(_P2), _U(_P3), _U(_P4), _U(_P5))


def _vrotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U(r)) | (x >> _U(64 - r))


def xxh64_rows(data: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 over the rows of a 2-D uint8 array.

    ``data`` is ``(m, B)`` uint8 — m independent messages, each exactly B
    bytes. Returns ``(m,)`` uint64 of XXH64(row, seed). All arithmetic is
    wrap-around uint64 (numpy semantics match the spec's mod-2^64 math).
    """
    if data.ndim != 2 or data.dtype != np.uint8:
        raise ValueError("xxh64_rows expects a (m, B) uint8 array")
    m, n = data.shape
    useed = _U(seed & _M64)
    with np.errstate(over="ignore"):
        p = 0
        if n >= 32:
            nstripes = n // 32
            body = np.ascontiguousarray(data[:, : nstripes * 32])
            lanes = body.view("<u8").reshape(m, nstripes, 4)
            acc = [
                np.full(m, useed + _uP1 + _uP2, dtype=_U),
                np.full(m, useed + _uP2, dtype=_U),
                np.full(m, useed, dtype=_U),
                np.full(m, useed - _uP1, dtype=_U),
            ]
            for s in range(nstripes):
                for i in range(4):
                    acc[i] = _vrotl(acc[i] + lanes[:, s, i] * _uP2, 31) * _uP1
            h = _vrotl(acc[0], 1) + _vrotl(acc[1], 7) + _vrotl(acc[2], 12) + _vrotl(acc[3], 18)
            for i in range(4):
                h = (h ^ (_vrotl(acc[i] * _uP2, 31) * _uP1)) * _uP1 + _uP4
            p = nstripes * 32
        else:
            h = np.full(m, useed + _uP5, dtype=_U)
        h = h + _U(n)
        while n - p >= 8:
            lane = np.ascontiguousarray(data[:, p : p + 8]).view("<u8")[:, 0]
            h = _vrotl(h ^ (_vrotl(lane * _uP2, 31) * _uP1), 27) * _uP1 + _uP4
            p += 8
        if n - p >= 4:
            lane = np.ascontiguousarray(data[:, p : p + 4]).view("<u4")[:, 0].astype(_U)
            h = _vrotl(h ^ (lane * _uP1), 23) * _uP2 + _uP3
            p += 4
        while p < n:
            h = _vrotl(h ^ (data[:, p].astype(_U) * _uP5), 11) * _uP1
            p += 1
        h ^= h >> _U(33)
        h *= _uP2
        h ^= h >> _U(29)
        h *= _uP3
        h ^= h >> _U(32)
    return h


def xxh64_u64_rows(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """XXH64 of each row of a (m, W) uint64 array, hashing the rows'
    little-endian byte serialization (W*8 bytes per message)."""
    values = np.ascontiguousarray(values, dtype="<u8")
    m, w = values.shape
    return xxh64_rows(values.view(np.uint8).reshape(m, w * 8), seed)
