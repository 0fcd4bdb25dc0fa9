"""Measure per-query DataFrame CONSTRUCTION time (driver-side py4j
work before any action) for the headline set. Construction runs inside
every timed bench run, so a query whose builder burns driver time on
py4j round trips (the r14 semantic_dedup `_nearest_cells_expr` case:
0.648 s -> 0.335 s by collapsing ~520 F.lit calls into one SQL string)
is a real optimization target even when its execution plan is ideal.

Usage: python tools/time_construction.py [sf_dir]
Prints per-query construction seconds (min of 3 after a warmup), slowest
first. Measurement-only tool; never used by the bench."""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bench import HEADLINE, _incremental_dedup_refresh  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from aws_etl_dados_publicos_cnpj_spark.session import build_session
    import __spark_entry__ as entry

    spark = build_session(
        "time_construction",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    reg = entry.queries()
    rows: list[tuple[str, float]] = []
    for name in HEADLINE:
        if name == "incremental_dedup_refresh":
            fn = lambda s, d: _incremental_dedup_refresh(s, d)  # noqa: E731
        else:
            fn = reg[name]
        # warmup once (JVM classloading, table caches), then min of 3
        fn(spark, sf_dir)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            best = min(best, time.perf_counter() - t0)
        rows.append((name, best))
    rows.sort(key=lambda r: -r[1])
    total = sum(t for _, t in rows)
    for name, t in rows:
        print(f"{t:7.3f}  {name}")
    print(f"{total:7.3f}  TOTAL construction")


if __name__ == "__main__":
    main()
