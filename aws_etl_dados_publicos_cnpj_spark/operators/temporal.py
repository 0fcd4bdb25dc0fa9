"""Temporal operators Spark lacks natively: as-of join (plus the
latest-snapshot window form lives in relational.py).

``asof_join`` uses the union-window technique: tag both inputs, sort
by (key, ts) once, and carry the most recent right-side payload forward
with ``last(..., ignorenulls=True)``. One shuffle on the key — no
range-bucketing cross join, no per-group Python. This is the
scale-correct shape: a 100 TB left side joins against a right side of
any size with a single co-partitioned sort, and skew on hot keys is
handled by AQE.

(Alternative implementation for wildly mismatched-frequency inputs:
``applyInPandas`` + ``pd.merge_asof`` per key group — kept out of the
default path because the union-window form stays JVM-side.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``on`` value that is < (strict) / <= the left's, within the same
    ``by`` key. Right columns arrive prefixed ``asof_``; unmatched left
    rows keep nulls (left-outer as-of).
    """
    left_cols = list(left.columns)
    lt = left.select(
        *left_cols,
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    rt = right.select(
        F.col(by),
        F.col(on),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in (by, on)
        ],
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = lt.unionByName(rt)

    # At equal ts: strict → right rows sort after left (not visible);
    # non-strict → right rows sort before left (visible).
    side_order = F.col("_side").asc() if strict else F.col("_side").desc()
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned
    for c in right_cols:
        out = out.withColumn(f"asof_{c}", F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 0).drop("_side", *[f"_r_{c}" for c in right_cols])


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    strict: bool = True,
) -> DataFrame:
    """``applyInPandas`` twin of :func:`asof_join` — cogroup by key,
    ``pd.merge_asof`` per group (one Arrow batch each side).

    Same contract, different physical shape: the union-window form is
    the default (stays JVM-side, one co-partitioned sort), but when the
    right side is orders of magnitude denser than the left (e.g. one
    query timestamp vs millions of ticks per key), sorting the union
    makes every left row pay for the right side's volume; here each
    group is two already-small Arrow frames and merge_asof is a linear
    scan. Equality with the default path is pinned in
    tests/test_temporal.py."""
    import pandas as pd
    from pyspark.sql import types as T

    out_fields = list(left.schema.fields) + [
        T.StructField(f"asof_{c}", right.schema[c].dataType, True) for c in right_cols
    ]
    out_schema = T.StructType(out_fields)
    left_cols = list(left.columns)

    # Alias every non-key right column to a unique name BEFORE the
    # cogroup: when a right column shares its attribute id with a left
    # column (both sides unaliased from one scan — e.g. events.ts on
    # both), Catalyst's cogroup column pruning assigns the needed
    # attribute to the left child and silently DROPS it from the right
    # frame, and merge() dies on the missing column. Fresh aliases give
    # the right child its own attribute ids, which the pruner keeps.
    r_on = "__asof_r_on"
    rprep = right.select(
        F.col(by),
        F.col(on).alias(r_on),
        *[F.col(c).alias(f"__asof_r_{c}") for c in right_cols],
    )

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l = l.sort_values(on, kind="mergesort")
        if r.empty:
            for c in right_cols:
                l[f"asof_{c}"] = None
            return l[left_cols + [f"asof_{c}" for c in right_cols]]
        r = r[[r_on] + [f"__asof_r_{c}" for c in right_cols]].rename(
            columns={f"__asof_r_{c}": f"asof_{c}" for c in right_cols}
        ).sort_values(r_on, kind="mergesort")
        out = pd.merge_asof(
            l, r, left_on=on, right_on=r_on,
            allow_exact_matches=not strict, direction="backward",
        )
        for c in right_cols:
            col = out[f"asof_{c}"]
            # NaN-padded numerics must reach Arrow as nullable objects,
            # not float-upcast columns
            out[f"asof_{c}"] = col.astype(object).where(col.notna(), None)
        return out[left_cols + [f"asof_{c}" for c in right_cols]]

    return (
        left.groupBy(by)
        .cogroup(rprep.groupBy(by))
        .applyInPandas(lambda _key, l, r: merge(l, r), out_schema)
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    window_s: int,
    count_col: str = "n_in_range",
) -> DataFrame:
    """For each left row, count right rows with the same ``by`` key and
    ``|left.on - right.on| <= window_s`` (timestamps).

    Bucketed implementation: both sides bucket to ``floor(epoch/w)``;
    the left probes its own and both neighbor buckets, so the join is a
    plain equi-join on (key, bucket) followed by the exact range filter
    — never a per-key cross join. At 100 TB the bucket width trades
    probe fan-out (3×) against bucket selectivity, same as any interval
    index."""
    lb = F.floor(F.unix_timestamp(F.col(on)) / window_s)
    rb = F.floor(F.unix_timestamp(F.col(on)) / window_s)
    l = left.select(
        F.col(by).alias("_k"),
        F.col(on).alias("_lts"),
        F.explode(F.array(lb - 1, lb, lb + 1)).alias("_b"),
        *[c for c in left.columns],
    )
    r = right.select(
        F.col(by).alias("_k"), F.col(on).alias("_rts"), rb.alias("_b")
    )
    in_range = (
        F.abs(F.unix_timestamp(F.col("_lts")) - F.unix_timestamp(F.col("_rts")))
        <= window_s
    )
    joined = l.join(r, ["_k", "_b"]).filter(in_range)
    group_cols = [c for c in left.columns]
    counts = joined.groupBy(*group_cols).agg(F.count("*").alias(count_col))
    return left.join(counts, group_cols, "left").withColumn(
        count_col, F.coalesce(F.col(count_col), F.lit(0))
    )


# --- driver-contract query form --------------------------------------------


def _asof_click_query(spark: SparkSession, sf_dir: str, join_fn) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value"), F.col("ts").alias("click_ts")
    )
    joined = join_fn(
        errors, clicks.select("user_id", "ts", "click_value", "click_ts"),
        on="ts", by="user_id", right_cols=["click_value", "click_ts"], strict=True,
    )
    return (
        joined.filter(F.col("asof_click_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("error_ts"),
            F.date_format("asof_click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.round("asof_click_value", 2).alias("click_value"),
        )
    )


def asof_last_click_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each error event, the user's most recent strictly-earlier
    click (inner form to match DuckDB's ASOF JOIN semantics)."""
    return _asof_click_query(spark, sf_dir, asof_join)


def asof_last_click_before_error_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same as-of query through the ``applyInPandas``/``merge_asof``
    backend — registered as its own oracled query so the cogrouped Arrow
    path gets driver-style (vanilla-session) coverage, not just the
    equality unit test (VERDICT r3 #7)."""
    return _asof_click_query(spark, sf_dir, asof_join_pandas)


ORACLE_ASOF = """
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       round(c.value, 2) AS click_value
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts > c.ts
"""


def range_join_clicks_near_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each error event, how many clicks the same user made within
    ±30 minutes."""
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = range_join_count(
        errors, clicks, on="ts", by="user_id", window_s=1800, count_col="n_nearby_clicks"
    )
    return out.select("event_id", "user_id", "n_nearby_clicks")


ORACLE_RANGE_JOIN = """
SELECT e.event_id, e.user_id,
       count(c.ts) AS n_nearby_clicks
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id
 AND abs(floor(epoch(e.ts)) - floor(epoch(c.ts))) <= 1800
GROUP BY e.event_id, e.user_id
"""


QUERIES = {
    "asof_last_click_before_error": asof_last_click_before_error,
    "asof_last_click_before_error_pandas": asof_last_click_before_error_pandas,
    "range_join_clicks_near_errors": range_join_clicks_near_errors,
}
ORACLES = {
    "asof_last_click_before_error": ORACLE_ASOF,
    "asof_last_click_before_error_pandas": ORACLE_ASOF,
    "range_join_clicks_near_errors": ORACLE_RANGE_JOIN,
}
