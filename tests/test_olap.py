"""OLAP extension tests: rollup structure, asof correctness against
a per-row reference, approx-aggregate error bounds, salted join
equivalence."""

from __future__ import annotations

import pyspark.sql.functions as F

from llamadb_spark.operators.asof import asof_join
from llamadb_spark.operators.skew import salted_join
from llamadb_spark.queries import olap


def test_rollup_has_subtotals_and_grand_total(spark, sf_dir):
    rows = olap.q19_rollup(spark, sf_dir).collect()
    grand = [r for r in rows if r.o_year is None and r.o_orderpriority is None]
    year_subtotals = [r for r in rows if r.o_year is not None and r.o_orderpriority is None]
    detail = [r for r in rows if r.o_year is not None and r.o_orderpriority is not None]
    assert len(grand) == 1
    assert len(year_subtotals) >= 2
    assert abs(grand[0].revenue - round(sum(r.revenue for r in detail), 2)) < 1.0


def test_pivot_row_sums(spark, sf_dir):
    out = olap.q20_pivot(spark, sf_dir)
    total = sum((r.F + r.O + r.P) for r in out.collect())
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert total == n_orders  # every order lands in exactly one cell


def test_asof_join_matches_reference(spark):
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3")],
        "k long, ts long, name string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (1, 25, 250.0), (3, 1, 999.0)],
        "k long, ts long, v double",
    )
    out = {
        r.name: (r.v_right, r.ts_right)
        for r in asof_join(left, right, key="k", right_value_cols=["v"]).collect()
    }
    assert out == {
        "p1": (100.0, 10),   # equal ts matches (inclusive)
        "p2": (150.0, 15),   # latest at-or-before 20
        "p3": (None, None),  # no right row for key 2
    }


def test_approx_stats_near_exact(spark, sf_dir):
    """a02 banded-boolean contract: exact columns match an
    independent recomputation and every sketch lands in its band."""
    approx = {r.event_type: r for r in olap.a02_approx_stats(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert a.exact_users == e.users
        assert a.n_events == e.n
        assert a.users_within_10pct
        assert a.p50_in_band
        assert a.p95_in_band


def test_sketch_rollup_bounds_and_merge_identity(spark, sf_dir):
    """a06: merged daily HLL sketches stay within HLL_4/lgK=12 error
    of exact distincts, and the union-of-dailies path gives the SAME
    estimate as one direct sketch over all rows (register-wise max is
    associative — the property that makes stored sketches safe to
    roll up along any grouping)."""
    rolled = {
        r.event_type: r
        for r in olap.a06_sketch_rollup(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r.event_type: r.users
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    direct = {
        r.event_type: r.est
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("est")
        )
        .collect()
    }
    assert set(rolled) == set(exact)
    union = {
        r.event_type: r.est
        for r in ev.select(
            "event_type", F.to_date("ts").alias("day"), "user_id"
        )
        .groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
        )
        .collect()
    }
    for et, r in rolled.items():
        assert r.n_days >= 1
        assert r.exact_users == exact[et]
        # lgK=12 relative standard error ≈ 1.04/sqrt(2^12) ≈ 1.6%;
        # 5% bound gives ~3 sigma headroom (query attests 10%)
        assert abs(union[et] - exact[et]) / max(exact[et], 1) < 0.05
        assert r.rollup_within_10pct
        # register-wise max is associative: union-of-dailies ==
        # one direct sketch over all rows
        assert union[et] == direct[et]


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    plain = orders.join(customer, orders.o_custkey == customer.c_custkey)
    salted = salted_join(
        orders, customer, "o_custkey", "c_custkey", num_salts=4,
        salt_source="o_orderkey",
    )
    assert salted.count() == plain.count()
    a = {(r.o_orderkey, r.c_name) for r in salted.collect()}
    b = {(r.o_orderkey, r.c_name) for r in plain.collect()}
    assert a == b


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_range_join_is_hash_join_not_nested_loop(spark, sf_dir):
    df = olap.r01_range_join(spark, sf_dir)
    p = _plan(df)
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    rows = {r.band_id: r.n_items for r in df.collect()}
    assert rows and all(n > 0 for n in rows.values())


def test_range_join_left_keeps_unmatched_points(spark):
    from llamadb_spark.operators.range_join import range_join

    pts = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 99.0)], "pid long, v double"
    )
    ivs = spark.createDataFrame(
        [(10, 0.0, 10.0), (11, 4.0, 20.0)], "iid long, lo double, hi double"
    )
    got = range_join(
        pts, ivs, point_col="v", lo_col="lo", hi_col="hi",
        bucket_width=5.0, how="left",
    ).collect()
    pairs = {(r.pid, r.iid) for r in got}
    # v=5 hits both intervals, v=15 only the second, v=99 none (null)
    assert pairs == {(1, 10), (1, 11), (2, 11), (3, None)}


def test_salted_join_spreads_hot_key(spark, sf_dir):
    """The salted path's partition-size invariant: after salting, no
    (key, salt) group holds more than ~1/num_salts of the hot key's
    rows — the property that turns one oversized task into
    num_salts bounded ones."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.when(F.col("l_orderkey") % 2 == 0, 0)
        .otherwise(F.col("l_orderkey") % 1000)
        .alias("k"),
        "l_orderkey",
    )
    num_salts = 8
    salted = li.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("l_orderkey")), F.lit(num_salts))
    )
    hot = li.filter(F.col("k") == 0).count()
    assert hot > 0
    max_group = (
        salted.groupBy("k", "_salt").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_group <= hot / num_salts * 1.5, (
        f"hot key not spread: max (key,salt) group {max_group} vs "
        f"hot key rows {hot}"
    )


def test_asof_tolerance_nulls_stale_matches(spark):
    import datetime as dt

    from pyspark.sql import Row

    from llamadb_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([
        Row(k=1, ts=t0, lv="fresh"),                       # right 10 min before
        Row(k=1, ts=t0 + dt.timedelta(hours=5), lv="stale"),  # right 5 h before
        Row(k=2, ts=t0, lv="none"),                        # no right row at all
    ])
    right = spark.createDataFrame([
        Row(k=1, ts=t0 - dt.timedelta(minutes=10), rv="quote"),
    ])
    out = {
        r.lv: (r.rv_right, r.ts_right)
        for r in asof_join(
            left, right, key="k", right_value_cols=["rv"], tolerance_s=1800
        ).collect()
    }
    assert out["fresh"][0] == "quote" and out["fresh"][1] is not None
    # match exists but exceeds tolerance -> nulled, row retained
    assert out["stale"] == (None, None)
    assert out["none"] == (None, None)


def test_asof_tolerance_left_column_named_like_suffix(spark):
    """Regression (round-5 advisory): the tolerance branch used to
    drop every column ENDING with the carry suffix, so a LEFT column
    literally named '*_right' was dropped and the final select threw
    an unresolved-column error. It must ride through untouched."""
    import datetime as dt

    from pyspark.sql import Row

    from llamadb_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([
        Row(k=1, ts=t0, price_right=7.5),
    ])
    right = spark.createDataFrame([
        Row(k=1, ts=t0 - dt.timedelta(minutes=5), rv="quote"),
    ])
    rows = asof_join(
        left, right, key="k", right_value_cols=["rv"], tolerance_s=1800
    ).collect()
    assert len(rows) == 1
    assert rows[0].price_right == 7.5      # left column survives
    assert rows[0].rv_right == "quote"     # carried right column too


def test_asof_nearest_direction(spark):
    """direction="nearest" (pandas merge_asof parity): each left row
    takes whichever right row is closer in time, ties going backward;
    tolerance still nulls a too-far nearest match."""
    import datetime as dt

    from pyspark.sql import Row

    from llamadb_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([
        Row(k=1, ts=t0, lv="back_wins"),        # back 5 min, fwd 20 min
        Row(k=1, ts=t0 + dt.timedelta(minutes=14), lv="fwd_wins"),
        Row(k=1, ts=t0 + dt.timedelta(minutes=5), lv="tie"),  # 10 / 10
        Row(k=2, ts=t0, lv="only_fwd"),         # no earlier right row
        Row(k=3, ts=t0, lv="none"),
    ])
    right = spark.createDataFrame([
        Row(k=1, ts=t0 - dt.timedelta(minutes=5), rv="B"),
        Row(k=1, ts=t0 + dt.timedelta(minutes=15), rv="F"),
        Row(k=2, ts=t0 + dt.timedelta(hours=2), rv="LATE"),
    ])
    out = {
        r.lv: r.rv_right
        for r in asof_join(
            left, right, key="k", right_value_cols=["rv"],
            direction="nearest",
        ).collect()
    }
    assert out == {
        "back_wins": "B",
        "fwd_wins": "F",
        "tie": "B",          # exact tie -> backward
        "only_fwd": "LATE",  # forward is the only candidate
        "none": None,
    }

    with_tol = {
        r.lv: r.rv_right
        for r in asof_join(
            left, right, key="k", right_value_cols=["rv"],
            direction="nearest", tolerance_s=1800,
        ).collect()
    }
    assert with_tol["back_wins"] == "B"
    assert with_tol["only_fwd"] is None  # nearest is 2h away -> nulled


def test_asof_nearest_tolerance_per_direction(spark):
    """pandas merge_asof parity: in nearest mode tolerance restricts
    each direction's candidate BEFORE the closer-side choice. Rows
    where only one side is within tolerance take that side; rows
    where both sides are out come back null."""
    import datetime as dt

    from pyspark.sql import Row

    from llamadb_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([
        # back 10 min (in tol), fwd 50 min (out) -> back
        Row(k=1, ts=t0, lv="back_in"),
        # back 50 min (out), fwd 10 min (in) -> fwd
        Row(k=2, ts=t0, lv="fwd_in"),
        # back 40 min (out), fwd 50 min (out) -> null
        Row(k=3, ts=t0, lv="both_out"),
    ])
    right = spark.createDataFrame([
        Row(k=1, ts=t0 - dt.timedelta(minutes=10), rv="B1"),
        Row(k=1, ts=t0 + dt.timedelta(minutes=50), rv="F1"),
        Row(k=2, ts=t0 - dt.timedelta(minutes=50), rv="B2"),
        Row(k=2, ts=t0 + dt.timedelta(minutes=10), rv="F2"),
        Row(k=3, ts=t0 - dt.timedelta(minutes=40), rv="B3"),
        Row(k=3, ts=t0 + dt.timedelta(minutes=50), rv="F3"),
    ])
    out = {
        r.lv: r.rv_right
        for r in asof_join(
            left, right, key="k", right_value_cols=["rv"],
            direction="nearest", tolerance_s=1200,
        ).collect()
    }
    assert out == {"back_in": "B1", "fwd_in": "F2", "both_out": None}
