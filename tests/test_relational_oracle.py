"""Every SQL-expressible query must match its DuckDB oracle at sf0.001
(the driver repeats this at sf0.01 — this is the fast in-repo gate);
rows-only queries must at least run and return a stable schema."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from conftest import SF_SMALL  # noqa: E402
from tools.check_oracle import compare  # noqa: E402

ALL_QUERIES = entrymod.queries()
ALL_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = ALL_QUERIES[name](spark, SF_SMALL)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    if name not in ALL_ORACLES:
        assert spark_cols, f"{name}: no columns"
        return
    res = duck.execute(ALL_ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_registry_shape():
    assert set(ALL_ORACLES) <= set(ALL_QUERIES)
    assert len(ALL_QUERIES) >= 55
    assert len(ALL_ORACLES) >= 51
