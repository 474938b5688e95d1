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
