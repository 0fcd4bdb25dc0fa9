"""Range-join semantics on hand-built frames: boundary inclusion,
neighbor-bucket coverage, zero-fill."""

from __future__ import annotations

from datetime import datetime

from aws_etl_dados_publicos_cnpj_spark.operators.temporal import range_join_count


def _ts(s):
    return datetime.fromisoformat(s)


def test_range_join_boundaries_and_buckets(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 12:00:00")), (2, 2, _ts("2024-01-01 00:00:00"))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 11:30:00")),  # exactly -1800 s → included
            (1, _ts("2024-01-01 12:29:59")),  # +1799 s → included
            (1, _ts("2024-01-01 12:30:01")),  # +1801 s → excluded
            (1, _ts("2024-01-01 11:29:59")),  # -1801 s → excluded
            (2, _ts("2024-01-02 00:00:00")),  # same key, next day → excluded
        ],
        "k long, ts timestamp",
    )
    out = {
        r.id: r.n_in_range
        for r in range_join_count(left, right, on="ts", by="k", window_s=1800).collect()
    }
    assert out == {1: 2, 2: 0}


def test_range_join_crosses_bucket_edges(spark):
    """A pair within the window but in adjacent coarse buckets must
    still match (the neighbor-bucket probe)."""
    left = spark.createDataFrame([(1, 1, _ts("2024-01-01 12:00:10"))], "id long, k long, ts timestamp")
    right = spark.createDataFrame([(1, _ts("2024-01-01 11:59:50"))], "k long, ts timestamp")
    out = range_join_count(left, right, on="ts", by="k", window_s=1800).collect()
    assert out[0].n_in_range == 1
