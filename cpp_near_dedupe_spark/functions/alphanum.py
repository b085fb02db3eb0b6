"""Unicode-alphanumeric classification table for the tokenizer.

The reference tokenizes text into maximal runs of "alphanumeric" UTF-16 code
units classified by a 65536-bit lookup table
(`/root/reference/CPPDeduper/isalphanum.h:7-9`, table data
`/root/reference/CPPDeduper/isalphanum.cc:3`, originally from the public
https://gudok.xyz/minhash1/ article). The table predates current Unicode
(it differs from Python's ``str.isalnum`` on 892 code points, e.g. it
excludes superscript digits and characters added after ~Unicode 7), so it
cannot be regenerated from ``unicodedata`` — exact tokenizer parity requires
the exact bit pattern. We therefore embed the 8 KiB bitmap itself
(zlib+base64, little-endian bit order) as data, with this provenance note.

``ALPHANUM`` is a ``(65536,)`` bool ndarray: ``ALPHANUM[c]`` is True iff
UTF-16 code unit ``c`` is part of a word. Notable properties relied on
elsewhere:

* surrogates (0xD800-0xDFFF) are all False — so encoding non-BMP characters
  as surrogate pairs produces delimiters, matching the reference's
  "4-byte UTF-8 lead -> space" replacement (`Hashing.h:87-90`) at the token
  level (both yield a word break; delimiter bytes are never hashed).
* ASCII space/punctuation/underscore/hyphen are all False; [a-zA-Z0-9] True.
"""

from __future__ import annotations

import base64
import zlib

import numpy as np

_PACKED_B64 = (
    "eNrtmTuP00AQgMdxDlNw8pUpIjnSCVGGkuISR+IP3C8gp6OmhybrAol/QBtqCkSP0FmK0JV0UHDC"
    "PtFQgIh0RYLO9rCzDz9yxyNHkCjmk/zY3ZnZmd21tR4DEOgWiB4dqtjutREF6uNqzNCFYB9WSPZG"
    "7xHPS6mjC3pudokxKMiXVqHuLfLe8+yd8hxnRU2pDwcxTgFyrZRWLSG0jM5tGWfY3nGUDcdazoPK"
    "47lW2QVwZExFkU6/I+ZvdmEELynG9AmVH7hS9F6MXUiPZHT5V5KHmexXy1OZ5Fvw+XjwrnMsFWV7"
    "TO2J9C//Ru3urFkezfCaLiPekv2RvSxFIUfovC+MfzribRBANgGe3pwXL75s98aAZ1R21OzKgwQp"
    "rqA5I2bsInTDvcP4FN0Rumpmeqpl8ccTPhADfbUFu3YGVsLT/Zk+FQEUuEGmSGF6WOsRE1f2Z47E"
    "MX370pNoR4+YjteuNHXeqlaKGTU5V1QMwKoXZrzlugQbi7HmRrXxTY1C6mv5JS202FrXY0He4Key"
    "quLjffhZqI35+yVhaM7P6aLrkvFJ8NbH4GRlNbSk69ioe5z1h/uv8Sy9q8sdYDaJmg5RO9cIHt6A"
    "2rOIGOn1Jgylkejq/R+o87BTPYcirT2TC7V+w1qN0G9e6/1G4mcYZg1Cfn4YhmEYhmGY9Qj+0/1j"
    "0NjZhr+X1wkU820alTmccpccYSOl+MgH+/VKnbxa6I9ZmxfKyvwQ5Wuy6zYLJLRMMLeJpcjmf3Tm"
    "cOFTHkm0tZ3D4RbAHfS6MJlMoPal3ti3e83cE8MwDPOP8el9vixf9AzDMH//f6K5W1X7QwHLZ5iL"
    "8YcLTcu1LFeemN2s9m7l/ZVcspuu/u3HVb3IsqxLGj8A3UyduQ=="
)

ALPHANUM: np.ndarray = np.unpackbits(
    np.frombuffer(zlib.decompress(base64.b64decode(_PACKED_B64)), dtype=np.uint8),
    bitorder="little",
).astype(bool)

assert ALPHANUM.shape == (65536,)


def is_alphanum(code_units: np.ndarray) -> np.ndarray:
    """Vectorized word-character predicate over uint16 code units."""
    return ALPHANUM[code_units]
