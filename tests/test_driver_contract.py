"""Driver-contract invariants (no Spark session needed): the generated
priority ordering covers the whole registry, puts every
never-driver-green query inside the driver's ~50-row check budget, and
every query has an oracle twin."""

from __future__ import annotations

import __spark_entry__ as entrymod

CHECK_BUDGET = 50  # queries the driver checks per round (observed r01-r04)


def test_priority_names_all_resolve():
    qs = entrymod.queries()
    missing = [n for n in entrymod._DRIVER_PRIORITY if n not in qs]
    assert missing == [], f"priority list names unknown queries: {missing}"


def test_priority_covers_registry_and_orders_it():
    """The generated window is a total order over the registry — the
    first CHECK_BUDGET entries are what the driver will actually check."""
    qs = list(entrymod.queries())
    assert entrymod._DRIVER_PRIORITY == qs, "window must be a total order"
    assert len(qs) == len(set(qs))


def test_never_green_queries_inside_budget():
    """Regenerating with tools/driver_window.py must keep every query
    lacking a fully-green driver row inside the checked window — the
    r4 failure mode was 20 queries stranded past position 50."""
    import sys

    sys.path.insert(0, "tools")
    from driver_window import history

    green = history()
    stranded = [
        n
        for i, n in enumerate(entrymod._DRIVER_PRIORITY)
        if i >= CHECK_BUDGET and green.get(n, 0) == 0
    ]
    assert stranded == [], f"never-green queries past the budget: {stranded}"


def test_every_query_has_an_oracle():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    orphans = [n for n in oracles if n not in qs]
    assert orphans == []
    # round 5 closed the last gap: approx_aggregates became
    # self-checking with an exact-column oracle — nothing may regress
    # to rows-only silently.
    no_oracle = sorted(n for n in qs if n not in oracles)
    assert no_oracle == []


def test_bench_headline_names_resolve():
    """Every bench headline name must exist in the registry (or be the
    bench-only incremental wrapper) — a renamed query should fail here,
    not as a silent per-query error line in the landed artifact."""
    import bench

    qs = set(entrymod.queries())
    unknown = [
        n for n in bench.HEADLINE if n not in qs and n != "incremental_dedup_refresh"
    ]
    assert unknown == [], f"headline names not in registry: {unknown}"


def test_window_regenerated_from_latest_correctness():
    """The checked-in window must be derived from EVERY landed
    CORRECTNESS file — when a round's file lands without re-running
    tools/driver_window.py, the schedule silently re-verifies fresh
    queries while stale ones rot (the r5 verdict's #1 item). Fails
    loudly instead: re-run tools/driver_window.py."""
    import glob
    import os

    from aws_etl_dados_publicos_cnpj_spark import _driver_window

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    on_disk = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    )
    assert getattr(_driver_window, "GENERATED_FROM", None) == on_disk, (
        "stale driver window — re-run `python tools/driver_window.py "
        "[--front touched,...]` after landing correctness results"
    )
