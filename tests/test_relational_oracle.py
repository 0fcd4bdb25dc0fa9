"""Every SQL-expressible query must match its DuckDB oracle at sf0.001
(the driver repeats this at sf0.01 — this is the fast in-repo gate)."""

from __future__ import annotations

import pytest

import sys

sys.path.insert(0, "/root/repo")

from aws_etl_dados_publicos_cnpj_spark.operators import relational  # noqa: E402
from tools.check_oracle import compare  # noqa: E402

from conftest import SF_SMALL  # noqa: E402


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = relational.QUERIES[name](spark, SF_SMALL)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(relational.ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_queries_have_oracles():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 21
