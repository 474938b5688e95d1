"""Skew-salted join (SURVEY §4): when one join key dominates (a
hot user, a null-bucket), a plain shuffle join puts the whole hot
key in ONE task. Salting splits it:

  large side: salt = xxhash64(stable row id) mod n  (deterministic)
  small side: replicated n times with salt 0..n-1
  join on (key, salt) → hot key spread over n tasks

AQE's skew-join split handles moderate skew automatically; explicit
salting is for the pathological keys AQE can't split (single-key
partitions beyond spark.sql.adaptive.skewJoin thresholds) and for
deterministic layout control. Result is row-identical to the plain
join (asserted in tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit


def salted_join(
    large: DataFrame,
    small: DataFrame,
    large_key: str,
    small_key: str,
    num_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side salted into num_salts shards.

    salt_source: a stable column on the large side to derive the
    deterministic salt from (defaults to the key itself plus every
    column via monotonic row content — pass an id column for clean
    determinism).
    """
    src = col(salt_source) if salt_source else col(large_key)
    salted_large = large.withColumn(
        "_salt", F.pmod(F.xxhash64(src), lit(num_salts)).cast("int")
    )
    salts = large.sparkSession.range(num_salts).select(
        col("id").cast("int").alias("_salt")
    )
    salted_small = small.crossJoin(F.broadcast(salts))
    out = salted_large.join(
        salted_small,
        (salted_large[large_key] == salted_small[small_key])
        & (salted_large["_salt"] == salted_small["_salt"]),
        how,
    )
    return out.drop("_salt")
