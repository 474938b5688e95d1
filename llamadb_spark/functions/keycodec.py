"""Memcmp-sortable key encoding — parity with the reference's
indexing design (docs/Indexing and Sorting.md): composite keys are
encoded so that PLAIN BYTEWISE comparison orders them exactly like
the typed comparison, which is what lets a B+Tree (there) or a
range-partitioner / clustered file layout (here) handle any key
type with one ignorant comparator.

Reference rules re-expressed:
- integers: big-endian with the sign bias ("add half of the unsigned
  maximum" — docs/Indexing and Sorting.md §Integers). Implemented as
  sign-bit XOR, the same bias in two's complement, rendered as
  fixed-width lowercase hex (a hex string of fixed width compares
  exactly like the underlying bytes, and stays printable/debuggable).
- strings: raw UTF-8 with a NUL terminator ("null-terminated … a
  length is not prefixed because this would effectively make the
  strings sorted by length" — §Strings). The terminator makes a
  shorter string that is a prefix of a longer one sort FIRST, and
  keeps later fragments from bleeding into the comparison.

At 100 TB the use case is composite range partitioning / clustered
layouts: one string column can carry any (int…, string…, int…) key
through repartitionByRange, file-footer min/max stats, and the
dialect's CREATE INDEX layout without per-type comparator logic.

All pure built-ins (hex/lpad/concat) — codegen-friendly, no UDFs.
Order-preservation is property-tested against Python's typed tuple
sort in tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SIGN_BIT = -9223372036854775808  # 1 << 63 in two's complement

#: width of one encoded int64 fragment (16 hex chars = 8 bytes)
INT64_WIDTH = 16


def int64_key(c: Column | str) -> Column:
    """Fixed-width, sign-biased hex fragment: lexicographic order of
    the 16-char string == numeric order of the signed 64-bit value
    over the full range (min/max/0/negatives — tested)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.lower(
        F.lpad(F.hex(c.cast("long").bitwiseXOR(F.lit(_SIGN_BIT))), 16, "0")
    )


def string_key(c: Column | str) -> Column:
    """NUL-terminated raw fragment (reference §Strings). Assumes the
    value itself contains no NUL — the same assumption the
    reference's encoder makes."""
    c = F.col(c) if isinstance(c, str) else c
    return F.concat(c, F.lit("\x00"))


def sort_key(*fragments: Column) -> Column:
    """Concatenate encoded fragments into one memcmp-sortable
    composite key. Fragments must each be produced by int64_key /
    string_key (fixed width or terminated) so segment boundaries
    stay aligned across rows."""
    return F.concat(*fragments)
