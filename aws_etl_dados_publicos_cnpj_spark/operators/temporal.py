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


# --- driver-contract query form --------------------------------------------


def asof_last_click_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each error event, the user's most recent strictly-earlier
    click (inner form to match DuckDB's ASOF JOIN semantics)."""
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value"), F.col("ts").alias("click_ts")
    )
    joined = asof_join(
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


ORACLE_ASOF = """
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       round(c.value, 2) AS click_value
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts > c.ts
"""


QUERIES = {"asof_last_click_before_error": asof_last_click_before_error}
ORACLES = {"asof_last_click_before_error": ORACLE_ASOF}
