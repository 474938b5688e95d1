"""As-of join: for each left row, the most recent right row at or
before its timestamp (per key). Spark has no ASOF JOIN; the
Spark-first construction is the union-window trick:

  1. tag both sides, union them (no join at all!)
  2. one window per key ordered by (ts, side-tag): carry the last
     right-side value forward with last(..., ignorenulls=True)
  3. keep left rows; each now holds the right row that preceded it

One shuffle on the key (same as any join would need), no range
explosion, no nested-loop — at 100 TB this beats the naive
range-join (BroadcastNestedLoop) by orders of magnitude because the
window is a single sort within partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance_s: int | None = None,
) -> DataFrame:
    """For each left row: the nearest right row on `key`'s timeline —
    ``direction="backward"`` (default) takes the latest right row
    with right.ts <= left.ts; ``"forward"`` the earliest right row
    with right.ts >= left.ts; ``"nearest"`` whichever of the two is
    closer in absolute time (exact ties go backward — deterministic).
    Right rows at the exact same timestamp DO match in all directions
    (sort tag orders right before left at ties).

    ``tolerance_s`` bounds the match: a right row further than that
    many seconds from the left timestamp is rejected and the right
    columns come back null (pandas merge_asof's ``tolerance``
    semantics — a quote from last Tuesday should not enrich today's
    trade). Applied as a post-window null-out, so the plan is
    unchanged: same single shuffle, no range join.

    Both directions are the same single-shuffle union-window plan —
    forward just sorts the per-key timeline descending, so the
    carried "last seen right row" is the next one in event time.

    Output: all left columns + right_value_cols renamed with suffix
    (null when no right row exists in the chosen direction).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in (key, right_ts)]

    lt = left.select(
        col(key),
        col(left_ts).alias("_ts"),
        lit(1).alias("_side"),
        *[col(c) for c in left.columns if c not in (key,)],
        *[lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_value_cols],
        lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    rt = right.select(
        col(key),
        col(right_ts).alias("_ts"),
        lit(0).alias("_side"),
        *[lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != key],
        *[col(c).alias(f"_r_{c}") for c in right_value_cols],
        col(right_ts).alias("_r_ts"),
    )
    unioned = lt.unionByName(rt)
    if direction == "nearest":
        # pandas merge_asof(direction="nearest") parity: carry the
        # latest-at-or-before AND earliest-at-or-after right row with
        # two windows over the SAME key partitioning (one Exchange,
        # two in-partition sorts), then pick whichever is closer in
        # time per row; exact ties go backward. Still a single
        # shuffle — never a range join.
        wb = (
            Window.partitionBy(key)
            .orderBy(col("_ts").asc(), col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wf = (
            Window.partitionBy(key)
            .orderBy(col("_ts").desc(), col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        both = unioned.select(
            "*",
            *[
                F.last(f"_r_{c}", ignorenulls=True).over(wb).alias(f"_b_{c}")
                for c in right_value_cols
            ],
            F.last("_r_ts", ignorenulls=True).over(wb).alias("_b_ts"),
            *[
                F.last(f"_r_{c}", ignorenulls=True).over(wf).alias(f"_f_{c}")
                for c in right_value_cols
            ],
            F.last("_r_ts", ignorenulls=True).over(wf).alias("_f_ts"),
        )
        if tolerance_s is not None:
            # pandas merge_asof restricts candidates to the tolerance
            # window PER DIRECTION before choosing the nearest: when
            # the closer side is out of tolerance but the other side
            # is within it, the in-tolerance side must win (not come
            # back null). So null out each side's candidate here,
            # before the back_wins comparison; the post-hoc tolerance
            # filter below is then skipped for this path.
            tol = float(tolerance_s)
            b_ok = (
                col("_ts").cast("double") - col("_b_ts").cast("double")
            ) <= tol
            f_ok = (
                col("_f_ts").cast("double") - col("_ts").cast("double")
            ) <= tol
            cand_names = (
                {f"_b_{c}" for c in right_value_cols}
                | {f"_f_{c}" for c in right_value_cols}
                | {"_b_ts", "_f_ts"}
            )
            both = both.select(
                *[c for c in both.columns if c not in cand_names],
                *[
                    F.when(b_ok, col(f"_b_{c}"))
                    .otherwise(lit(None))
                    .alias(f"_b_{c}")
                    for c in right_value_cols
                ],
                F.when(b_ok, col("_b_ts")).otherwise(lit(None)).alias("_b_ts"),
                *[
                    F.when(f_ok, col(f"_f_{c}"))
                    .otherwise(lit(None))
                    .alias(f"_f_{c}")
                    for c in right_value_cols
                ],
                F.when(f_ok, col("_f_ts")).otherwise(lit(None)).alias("_f_ts"),
            )
        back_wins = col("_f_ts").isNull() | (
            col("_b_ts").isNotNull()
            & (
                (col("_ts").cast("double") - col("_b_ts").cast("double"))
                <= (col("_f_ts").cast("double") - col("_ts").cast("double"))
            )
        )
        carried = both.select(
            "*",
            *[
                F.when(back_wins, col(f"_b_{c}"))
                .otherwise(col(f"_f_{c}"))
                .alias(f"{c}{suffix}")
                for c in right_value_cols
            ],
            F.when(back_wins, col("_b_ts"))
            .otherwise(col("_f_ts"))
            .alias(f"{right_ts}{suffix}"),
        )
    else:
        ts_order = (
            col("_ts").asc() if direction == "backward" else col("_ts").desc()
        )
        w = (
            Window.partitionBy(key)
            .orderBy(ts_order, col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = unioned.select(
            "*",
            *[
                F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
                for c in right_value_cols
            ],
            F.last("_r_ts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}"),
        )
    out = carried.filter(col("_side") == 1)
    # nearest applies tolerance per-direction pre-choice (above);
    # backward/forward apply it post-window here
    if tolerance_s is not None and direction != "nearest":
        within = (
            F.abs(
                col("_ts").cast("double")
                - col(f"{right_ts}{suffix}").cast("double")
            )
            <= float(tolerance_s)
        )
        # drop exactly the carried columns generated above — an
        # endswith(suffix) test would also drop a LEFT column that
        # happens to end with "_right" and break the final select
        carried_names = {f"{c}{suffix}" for c in right_value_cols} | {
            f"{right_ts}{suffix}"
        }
        out = out.select(
            *[c for c in out.columns if c not in carried_names],
            *[
                F.when(within, col(f"{c}{suffix}"))
                .otherwise(lit(None))
                .alias(f"{c}{suffix}")
                for c in right_value_cols
            ],
            F.when(within, col(f"{right_ts}{suffix}"))
            .otherwise(lit(None))
            .alias(f"{right_ts}{suffix}"),
        )
    return out.select(
        col(key),
        *[col(c) for c in left.columns if c != key],
        *[col(f"{c}{suffix}") for c in right_value_cols],
        col(f"{right_ts}{suffix}"),
    )
