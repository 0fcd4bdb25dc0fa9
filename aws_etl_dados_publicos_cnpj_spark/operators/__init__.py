"""Consumption-layer operators.

Each module exports ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB-runnable ANSI SQL
with identical output column names). ``__spark_entry__.py`` merges them
for the driver's correctness gate.
"""

from __future__ import annotations


def load_table(spark, sf_dir: str, name: str):
    """Read one driver-corpus parquet table (TESTDATA.md).

    The ``events`` table is written with parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects; read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and floor-convert to a
    micros timestamp — the same truncation DuckDB applies, so oracle
    comparisons stay exact.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # The driver invokes queries() with its own SparkSession; pin the
    # runtime confs the query semantics depend on (the engine's own
    # build_session also sets them, so this is a no-op there):
    # UTC so date_format/strftime agree with the UTC-naive oracle,
    # nanosAsLong so the events table's TIMESTAMP(NANOS) parquet reads.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
