"""ANSI-mode resilience: malformed cells must degrade to nulls with
documented planner semantics, never kill the job (Spark 4 ANSI casts
throw by default)."""

from __future__ import annotations

from aws_etl_dados_publicos_cnpj_spark.plans.planner import CatalogState, plan_status
from aws_etl_dados_publicos_cnpj_spark.sources.cnpj_csv import read_cnpj_csv
from aws_etl_dados_publicos_cnpj_spark.sources.listing import ListingRow, listing_df


def test_malformed_money_cell_becomes_null(spark, tmp_path):
    p = tmp_path / "e.csv"
    p.write_text(
        "1;OK LTDA;2046;10;NOT_A_NUMBER;3;SP\n2;FINE SA;2046;10;9,99;1;AM\n",
        encoding="latin-1",
    )
    rows = {r.cnpj_raiz: r.cap_soc for r in read_cnpj_csv(spark, [str(p)], "empresas").collect()}
    assert rows == {1: None, 2: 9.99}


def test_malformed_listing_date_skips_existing_ingests_new(spark):
    listing = listing_df(
        spark,
        [
            ListingRow("Empresas0.zip", "http://x/E0.zip", "GARBAGE-DATE", False),
            ListingRow("Socios0.zip", "http://x/S0.zip", "ALSO-BAD", False),
        ],
    )
    st = {
        r.table_name: (r.ref_date, r.should_update)
        for r in plan_status(spark, listing, CatalogState({"empresas": ["20230101"]})).collect()
    }
    # existing table + no parseable evidence of staleness → skip
    assert st["empresas"] == (None, False)
    # new table always ingests, even with a bad date
    assert st["socios"] == (None, True)


def test_malformed_catalog_partition_ignored_in_max(spark):
    listing = listing_df(
        spark, [ListingRow("Municipios.zip", "http://x/M.zip", "2023-05-06 10:22", False)]
    )
    st = plan_status(
        spark, listing, CatalogState({"municipios": ["oops", "20230101"]})
    ).collect()[0]
    assert st.latest_partition == 20230101
    assert st.should_update  # 20230506 > 20230101
