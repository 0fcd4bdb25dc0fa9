"""Recorded-event-style planner test (the reference's `__main__`
harness pattern, `check_update.py:113-218`, as pytest fixtures): a
realistic 10-table listing with multi-part files, folders, chrome, and
a mixed catalog state — asserts the full manifest document."""

from __future__ import annotations

from aws_etl_dados_publicos_cnpj_spark.plans.planner import CatalogState, plan_status, plan_updates
from aws_etl_dados_publicos_cnpj_spark.sources.listing import ListingRow, listing_df

BASE = "https://dadosabertos.example/cnpj/"

LISTING = [
    ListingRow("regime_tributario/", "regime_tributario/", "2023-04-14 10:00", True),
    ListingRow("Cnaes.zip", "Cnaes.zip", "2023-05-06 10:01", False),
    ListingRow("Empresas0.zip", "Empresas0.zip", "2023-05-06 10:22", False),
    ListingRow("Empresas1.zip", "Empresas1.zip", "2023-05-06 10:23", False),
    ListingRow("Empresas2.zip", "Empresas2.zip", "2023-05-07 08:00", False),  # later date
    ListingRow("Estabelecimentos0.zip", "Estabelecimentos0.zip", "2023-05-06 11:00", False),
    ListingRow("Motivos.zip", "Motivos.zip", "2023-05-06 10:02", False),
    ListingRow("Municipios.zip", "Municipios.zip", "2023-05-06 10:03", False),
    ListingRow("Naturezas.zip", "Naturezas.zip", "2023-05-06 10:04", False),
    ListingRow("Paises.zip", "Paises.zip", "2023-05-06 10:05", False),
    ListingRow("Qualificacoes.zip", "Qualificacoes.zip", "2023-05-06 10:06", False),
    ListingRow("Simples.zip", "Simples.zip", "2023-05-06 10:07", False),
    ListingRow("Socios0.zip", "Socios0.zip", "2023-05-06 10:08", False),
    ListingRow("LAYOUT.pdf", "LAYOUT.pdf", "2023-01-01 00:00", False),  # not a table
]

CATALOG = CatalogState(
    {
        # fresh: max partition == site date
        "municipios": ["20230506"],
        # stale: older partitions only (out of order on purpose)
        "empresas": ["20230101", "20221001"],
        # fresh even though site has same-day file (no strict >)
        "cnaes": ["20230506"],
        # socios/estabelecimentos/etc. absent → new tables
    }
)


def test_manifest_routes_new_stale_fresh(spark):
    listing = listing_df(spark, LISTING)
    manifest = {
        (r.table_name, r.url): r.date
        for r in plan_updates(spark, listing, CATALOG, base_url=BASE).collect()
    }
    # stale empresas: all 3 parts, dated with the table-level MAX (20230507)
    assert manifest[("empresas", BASE + "Empresas0.zip")] == "20230507"
    assert manifest[("empresas", BASE + "Empresas1.zip")] == "20230507"
    assert manifest[("empresas", BASE + "Empresas2.zip")] == "20230507"
    # new tables appear
    assert ("socios", BASE + "Socios0.zip") in manifest
    assert ("estabelecimentos", BASE + "Estabelecimentos0.zip") in manifest
    # fresh tables and non-tables don't
    tables_planned = {t for t, _ in manifest}
    assert "municipios" not in tables_planned
    assert "cnaes" not in tables_planned
    assert all(not u.endswith("LAYOUT.pdf") for _, u in manifest)
    # full expected table set
    assert tables_planned == {
        "empresas", "estabelecimentos", "motivos", "naturezas",
        "paises", "qualificacoes", "simples", "socios",
    }


def test_status_document_shape(spark):
    listing = listing_df(spark, LISTING)
    status = {r.table_name: r for r in plan_status(spark, listing, CATALOG).collect()}
    assert status["empresas"].n_files == 3
    assert status["empresas"].ref_date == 20230507
    assert status["empresas"].latest_partition == 20230101  # true max of its partitions
    assert status["empresas"].should_update
    assert status["municipios"].exists and not status["municipios"].should_update
    assert not status["socios"].exists and status["socios"].should_update


def test_requested_subset_limits_plan(spark):
    listing = listing_df(spark, LISTING)
    manifest = plan_updates(
        spark, listing, CATALOG, requested_tables=["socios", "not_a_real_table"]
    ).collect()
    assert {r.table_name for r in manifest} == {"socios"}


def test_planner_scales_to_10k_file_listing(spark):
    """The planner's no-driver-bottleneck claim (planner.py module
    docstring), exercised: a 10^4-file listing built distributedly
    (spark.range, never a Python list), planned end to end. The plan
    must contain no Python evaluation node — pure JVM DataFrame ops —
    and the only collect is the bounded per-table status."""
    from pyspark.sql import functions as F

    n = 10_000
    listing = spark.range(n).select(
        F.concat(F.lit("Empresas"), F.col("id"), F.lit(".zip")).alias("file_name"),
        F.concat(F.lit("Empresas"), F.col("id"), F.lit(".zip")).alias("href"),
        F.lit("2023-05-06 10:00").alias("last_modified"),
        F.lit(False).alias("is_folder"),
    )
    manifest = plan_updates(spark, listing, CatalogState({}), base_url=BASE)
    plan = manifest._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert manifest.count() == n
    status = plan_status(spark, listing, CatalogState({})).collect()
    assert len(status) == 1  # bounded: one row per table, not per file
    assert status[0].n_files == n and status[0].should_update
