"""Vectorized numeric kernels (numpy) + pure-Python test oracles."""

from .xxh64 import xxh64, xxh64_rows, xxh64_u64_rows
from .alphanum import ALPHANUM, is_alphanum
from .sketch import sketch_oracle, sketch_batch, transcode_oracle, tokenize_oracle
from .bands import band_keys_oracle, band_keys_batch
from .jaccard import jaccard_oracle, jaccard_batch

__all__ = [
    "xxh64", "xxh64_rows", "xxh64_u64_rows",
    "ALPHANUM", "is_alphanum",
    "sketch_oracle", "sketch_batch", "transcode_oracle", "tokenize_oracle",
    "band_keys_oracle", "band_keys_batch",
    "jaccard_oracle", "jaccard_batch",
]
