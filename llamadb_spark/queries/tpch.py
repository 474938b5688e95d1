"""TPC-H query shapes (adapted to the testdata star schema) — the
canonical decision-support suite a migrating analytics user expects
to run unchanged. Complements the llamadb-parity surface (q01-q46)
with the classic multi-join/filter/top-k patterns: Q3 shipping
priority, Q4 priority checking, Q6 revenue forecast, Q7 volume
shipping, Q10 returned items, Q14 promo effect.

Adaptations (testdata lacks some TPC-H columns): Q4's
commitdate<receiptdate becomes "shipped >30 days after order";
date windows use the generator's 1995-2001 span; nation/segment
literals use the synthetic domains.

Scale rules: filters sit directly on the parquet scans (pushdown —
the date/segment predicates prune row groups), dims broadcast,
facts join on their natural keys, every top-k orders by a rounded
deterministic key set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_CUT = "1998-01-01"


# --- Q3: shipping priority — top unshipped-revenue orders ----------------
def h03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        col("o_orderdate") < lit(_CUT).cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        col("l_shipdate") > lit(_CUT).cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(col("l_extendedprice") * (1 - col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(col("revenue").desc(), col("o_orderdate"), col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


ORACLE_H03 = f"""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_CUT}'
  AND l_shipdate > TIMESTAMP '{_CUT}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# --- Q4: order priority checking (EXISTS over late-shipped lines) --------
def h04_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


ORACLE_H04 = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- Q6: revenue-change forecast (pure pushdown filter + agg) ------------
def h06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
            & (col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
            & (col("l_discount") >= 0.03)
            & (col("l_discount") <= 0.07)
            & (col("l_quantity") < 25)
        )
        .agg(
            F.round(F.sum(col("l_extendedprice") * col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(lit(1)).alias("n_items"),
        )
    )


ORACLE_H06 = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07
  AND l_quantity < 25
"""


# --- Q7: volume shipping between two nations -----------------------------
def h07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(broadcast(nation), col("s_nationkey") == col("n_nationkey"))
        .select("s_suppkey", col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(broadcast(nation), col("c_nationkey") == col("n_nationkey"))
        .select("c_custkey", col("n_name").alias("cust_nation"))
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").alias("l_year"),
        (col("l_extendedprice") * (1 - col("l_discount"))).alias("volume"),
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = (
        (col("supp_nation") == "NATION_1") & (col("cust_nation") == "NATION_2")
    ) | ((col("supp_nation") == "NATION_2") & (col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


ORACLE_H07 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# --- Q10: returned-item reporting (top-20 lossy customers) ---------------
def h10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        & (col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(col("l_extendedprice") * (1 - col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(col("revenue").desc(), col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


ORACLE_H10 = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       c_acctbal, n_name
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- Q14: promotion effect (conditional revenue ratio) -------------------
def h14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        & (col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = col("l_extendedprice") * (1 - col("l_discount"))
    return li.join(broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.round(
            100 * F.sum(F.when(col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            6,
        ).alias("promo_revenue_pct"),
        F.count(lit(1)).alias("n_items"),
    )


ORACLE_H14 = """
SELECT round(100 * sum(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1997-07-01'
"""


# --- Q16: parts/supplier relationship (count distinct + NOT IN) ---------
def h16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier counts per (brand, size) for small parts,
    excluding distressed suppliers (negative balance) via NOT IN —
    the count-distinct-with-exclusion shape of TPC-H Q16 (complaint
    filter adapted to s_acctbal < 0).

    Scale: the exclusion list is tiny → broadcast anti join before
    counting; count(DISTINCT supplier) per group is one Expand pass."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        _t(spark, sf_dir, "part")
        .filter(col("p_size") <= 10)
        .select("p_partkey", "p_brand", "p_size")
    )
    distressed = (
        _t(spark, sf_dir, "supplier")
        .filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(broadcast(distressed), "l_suppkey", "left_anti")
        .join(broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc(), col("p_brand"), col("p_size"))
    )


ORACLE_H16 = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size <= 10
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


# --- Q18: large-volume customers (agg-filtered IN on the fact) -----------
H18_QTY = 250


def h18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with any order above the quantity threshold — the
    TPC-H Q18 shape: an aggregate-HAVING subquery over the fact
    drives an IN filter, then the survivors re-join for reporting.

    Scale: the heavy work is one map-side-combined sum per orderkey;
    the HAVING survivors are few → broadcast semi join on orders,
    then dims broadcast for the report columns."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(col("sum_qty") > H18_QTY)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(col("sum_qty").desc(), col("o_orderkey"))
    )


ORACLE_H18 = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       sum_qty
FROM orders
JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING round(sum(l_quantity), 2) > {H18_QTY}) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY sum_qty DESC, o_orderkey
"""


QUERIES = {
    "h03_shipping_priority": h03_shipping_priority,
    "h04_priority_checking": h04_priority_checking,
    "h06_revenue_forecast": h06_revenue_forecast,
    "h07_volume_shipping": h07_volume_shipping,
    "h10_returned_items": h10_returned_items,
    "h14_promo_effect": h14_promo_effect,
    "h16_supplier_counts": h16_supplier_counts,
    "h18_large_orders": h18_large_orders,
}

ORACLES = {
    "h03_shipping_priority": ORACLE_H03,
    "h04_priority_checking": ORACLE_H04,
    "h06_revenue_forecast": ORACLE_H06,
    "h07_volume_shipping": ORACLE_H07,
    "h10_returned_items": ORACLE_H10,
    "h14_promo_effect": ORACLE_H14,
    "h16_supplier_counts": ORACLE_H16,
    "h18_large_orders": ORACLE_H18,
}
