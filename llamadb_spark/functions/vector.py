"""Vector math over array<float>/array<double> columns.

Everything is built-in higher-order functions (zip_with/aggregate) —
JVM-side, codegen-friendly, no UDFs. Inputs are cast to double
before accumulation so results agree bit-for-bit with a
double-precision oracle (float32 accumulation would drift ~1e-6,
enough to flip a rounded value hash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm2(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """cos(a,b) = dot / sqrt(|a|² · |b|²)."""
    return dot(a, b) / F.sqrt(norm2(a) * norm2(b))


def cosine_pre(a: Column, b: Column, a_n2: Column, b_n2: Column) -> Column:
    """cosine() with the squared norms PRE-computed per vector and
    carried through the candidate join, instead of re-folded per
    pair (r10: the zip_with/aggregate lambdas are interpreted, not
    codegen'd — on a k-candidate join the per-pair norms were 4 of
    the 6 array traversals). Bit-identical to cosine(): norm2 is the
    same deterministic left fold over the same array, and the
    sqrt(n2a · n2b) multiplication tree is unchanged."""
    return dot(a, b) / F.sqrt(a_n2 * b_n2)
