"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries/oracles live next to their operators in
``aws_etl_dados_publicos_cnpj_spark/operators/*``; this module only
merges the per-module registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registries():
    from aws_etl_dados_publicos_cnpj_spark.operators import relational

    modules = [relational]
    for mod_name in ("dedup", "similarity", "text", "multimodal", "temporal", "corpus"):
        try:
            mod = __import__(
                f"aws_etl_dados_publicos_cnpj_spark.operators.{mod_name}",
                fromlist=[mod_name],
            )
            modules.append(mod)
        except ImportError:
            pass
    queries: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for mod in modules:
        queries.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 6-table star join
    revenue-by-nation (SURVEY.md §7.2)."""
    from aws_etl_dados_publicos_cnpj_spark.operators.relational import q05_revenue_by_nation

    return q05_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registries()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return _registries()[1]
