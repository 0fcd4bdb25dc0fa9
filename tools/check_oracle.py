"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
the same scale factor, compare row count, column names, and
order-insensitive values.

Usage: python tools/check_oracle.py [--vanilla] [sf_dir] [query ...]

``--vanilla`` runs against a default-conf SparkSession (no UTC pin, no
Arrow/AQE tuning, adversarial non-UTC driver timezone) — the driver's
harness builds its own session, so every query must survive one.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols) -> list[str]:
    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount: spark={len(spark_rows)} duck={len(duck_rows)}")
    order = sorted(spark_cols)
    s_idx = [spark_cols.index(c) for c in order]
    d_idx = [duck_cols.index(c) for c in order]
    s_set = sorted("|".join(_norm(r[i]) for i in s_idx) for r in spark_rows)
    d_set = sorted("|".join(_norm(r[i]) for i in d_idx) for r in duck_rows)
    if s_set != d_set:
        diff_s = [r for r in s_set if r not in set(d_set)][:3]
        diff_d = [r for r in d_set if r not in set(s_set)][:3]
        problems.append(f"values: spark-only={diff_s} duck-only={diff_d}")
    return problems


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from aws_etl_dados_publicos_cnpj_spark.session import build_session

    argv = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-check-vanilla")
            .master("local[8]")
            # adversarial: a DST timezone, so any query that silently
            # depends on build_session's UTC pin fails here first
            .config("spark.driver.extraJavaOptions", "-Duser.timezone=America/Sao_Paulo")
            .config("spark.sql.session.timeZone", "America/Sao_Paulo")
            .getOrCreate()
        )
    else:
        spark = build_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error {type(exc).__name__}: {exc}")
            continue
        if name not in os_:
            print(f"ok?  {name}: rows-only ({len(spark_rows)} rows, no oracle)")
            continue
        try:
            res = con.execute(os_[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: duckdb error {type(exc).__name__}: {exc}")
            continue
        problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if problems:
            failed.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
