"""Dump `.explain("formatted")` for headline queries to plans/<tag>/.

Optimization-round evidence (guide §1): the judge cannot run Spark, so
every plan claim in OPTIMIZATION_r*.md must be checkable against a
committed `<query>_<suffix>.txt`.

Usage:
    python tools/dump_explains.py <tag> <suffix> [sf_dir] [q1,q2,...]

e.g. `python tools/dump_explains.py r13 before /root/testdata/sf0.1`
writes plans/r13/<query>_before.txt for every bench headline query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    import bench
    import __spark_entry__ as entrymod
    from aws_etl_dados_publicos_cnpj_spark.session import build_session

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = build_session(
        "explains", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.conf.set("spark.sql.maxMetadataStringLength", "500")

    qs = dict(entrymod.queries())
    qs["incremental_dedup_refresh"] = bench._incremental_dedup_refresh
    names = [q for q in bench.HEADLINE if only is None or q in only]
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, keep going
            plan = f"ERROR {type(exc).__name__}: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else "ERROR")
    spark.stop()


if __name__ == "__main__":
    main()
