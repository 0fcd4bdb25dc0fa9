"""As-of join semantics on hand-built frames."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from aws_etl_dados_publicos_cnpj_spark.operators.temporal import asof_join

from conftest import SF_SMALL


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_strict_takes_latest_earlier_row(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00")), (2, 1, _ts("2024-01-01 12:00:00"))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 10.0),
            (1, _ts("2024-01-01 11:00:00"), 20.0),
            (1, _ts("2024-01-01 13:00:00"), 30.0),
        ],
        "k long, ts timestamp, v double",
    )
    out = {
        r.id: r.asof_v
        for r in asof_join(left, right, on="ts", by="k", right_cols=["v"]).collect()
    }
    assert out == {1: 10.0, 2: 20.0}


def test_asof_strict_excludes_equal_ts(spark):
    left = spark.createDataFrame([(1, 1, _ts("2024-01-01 10:00:00"))], "id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 99.0)], "k long, ts timestamp, v double"
    )
    strict = asof_join(left, right, on="ts", by="k", right_cols=["v"]).collect()
    assert strict[0].asof_v is None
    loose = asof_join(left, right, on="ts", by="k", right_cols=["v"], strict=False).collect()
    assert loose[0].asof_v == 99.0


def test_asof_respects_key_partitions(spark):
    left = spark.createDataFrame([(1, 1, _ts("2024-01-01 10:00:00"))], "id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(2, _ts("2024-01-01 09:00:00"), 7.0)], "k long, ts timestamp, v double"
    )
    out = asof_join(left, right, on="ts", by="k", right_cols=["v"]).collect()
    assert out[0].asof_v is None


def test_asof_pandas_fallback_equals_union_window_form(spark):
    from aws_etl_dados_publicos_cnpj_spark.operators import load_table
    from aws_etl_dados_publicos_cnpj_spark.operators.temporal import (
        asof_join,
        asof_join_pandas,
    )

    events = load_table(spark, SF_SMALL, "events")
    errors = events.filter(F.col("event_type") == "error")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value"), F.col("ts").alias("click_ts")
    )
    kw = dict(on="ts", by="user_id", right_cols=["click_value", "click_ts"])
    for strict in (True, False):
        a = sorted(
            tuple(r) for r in asof_join(errors, clicks, strict=strict, **kw).collect()
        )
        b = sorted(
            tuple(r)
            for r in asof_join_pandas(errors, clicks, strict=strict, **kw).collect()
        )
        assert a == b and len(a) > 0
