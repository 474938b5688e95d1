"""Surface-batch-5 tests: RIGHT JOIN, QUALIFY-shape dedup, VALUES
inline tables, interval arithmetic, multi-agg PIVOT, ROWS frames —
semantics spot-checks + plan-shape assertions."""

from __future__ import annotations

import pyspark.sql.functions as F

from llamadb_spark.queries import surface2


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q55_right_join_keeps_orderless_customers(spark, sf_dir):
    df = surface2.q55_right_join(spark, sf_dir).cache()
    try:
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        # every customer appears at least once; null-extended rows are
        # exactly the customers with no orders (0 at this SF is fine —
        # the identity must hold either way)
        assert df.select("c_custkey").distinct().count() == cust.count()
        n_orderless = cust.join(
            orders, cust.c_custkey == orders.o_custkey, "left_anti"
        ).count()
        assert df.filter(F.col("o_orderkey").isNull()).count() == n_orderless
        # the fact side is projected before the join: no o_orderdate
        assert "o_orderdate" not in plan(df)
    finally:
        df.unpersist()


def test_q56_one_latest_row_per_customer(spark, sf_dir):
    df = surface2.q56_qualify_latest(spark, sf_dir).cache()
    try:
        assert df.groupBy("o_custkey").count().filter("count > 1").count() == 0
        # the kept row is that customer's max orderdate
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        mx = orders.groupBy("o_custkey").agg(F.max("o_orderdate").alias("mx"))
        bad = df.join(mx, "o_custkey").filter(F.col("o_orderdate") != F.col("mx"))
        assert bad.count() == 0
    finally:
        df.unpersist()


def test_q57_values_table_broadcasts(spark, sf_dir):
    df = surface2.q57_values_inline(spark, sf_dir).cache()
    try:
        rows = {r.tier: r for r in df.collect()}
        assert set(rows) == {"expedited", "standard"}
        n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
        assert sum(r.n_orders for r in rows.values()) == n_orders
        # inline VALUES → LocalTableScan on the build side, broadcast join
        p = plan(df)
        assert "LocalTableScan" in p and "BroadcastHashJoin" in p
    finally:
        df.unpersist()


def test_q58_buckets_partition_all_orders(spark, sf_dir):
    df = surface2.q58_date_arith(spark, sf_dir).cache()
    try:
        n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
        agg = df.agg(F.sum("n_orders").alias("s")).collect()[0]
        assert agg.s == n_orders
        # deadline is exactly +30 days on the bucket's max date, so it
        # always lands strictly after the bucket's first day
        assert df.filter(F.col("last_deadline") <= F.col("first_day")).count() == 0
    finally:
        df.unpersist()


def test_q59_pivot_cells_partition_year_totals(spark, sf_dir):
    df = surface2.q59_multi_pivot(spark, sf_dir).cache()
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        per_year = {
            r.order_year: r.n
            for r in orders.groupBy(
                F.year("o_orderdate").alias("order_year")
            ).agg(F.count(F.lit(1)).alias("n")).collect()
        }
        for r in df.collect():
            cells = [(r.open_n or 0), (r.filled_n or 0), (r.partial_n or 0)]
            assert sum(cells) == per_year[r.order_year]
        # one pass over the fact: the pivot is a single aggregate
        # (PivotFirst), never "one scan per measure joined back"
        assert "Join" not in plan(df)
    finally:
        df.unpersist()


def test_q60_frame_bounded_and_warmup_exact(spark, sf_dir):
    rows = surface2.q60_rows_frame(spark, sf_dir).orderBy("o_orderdate").collect()
    assert rows and all(1 <= r.n_in_frame <= 7 for r in rows)
    # warm-up row: frame of size 1 → ma7 equals the day's own revenue
    assert abs(rows[0].ma7 - rows[0].day_rev) < 1e-6
    # steady state reaches the full 7-row frame
    assert any(r.n_in_frame == 7 for r in rows)
