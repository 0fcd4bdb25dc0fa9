"""End-to-end CNPJ ingest: latin-1 ';' decimal-comma zipped CSV →
planner → acquisition → typed snapshot parquet → catalog → query.
This is the reference's whole state machine as one test
(SURVEY.md §7.2 minimum slice)."""

from __future__ import annotations

import os
import zipfile

import pytest
from pyspark.sql import functions as F

from aws_etl_dados_publicos_cnpj_spark.plans.pipeline import run_pipeline
from aws_etl_dados_publicos_cnpj_spark.plans.planner import CatalogState, plan_updates
from aws_etl_dados_publicos_cnpj_spark.sources.cnpj_csv import read_cnpj_csv
from aws_etl_dados_publicos_cnpj_spark.sources.listing import ListingRow, listing_df
from aws_etl_dados_publicos_cnpj_spark.sources.sink import latest_partition, list_partitions

EMPRESAS_CSV = (
    "12345678;EMPRESA SÃO PAULO LTDA;2046;10;1234,56;3;SP\n"
    "87654321;AÇAÍ DO NORTE ME;2062;49;0,00;1;AM\n"
    "11222333;;2046;;;;\n"  # empty fields
)
MUNICIPIOS_CSV = "3550308;SÃO PAULO\n1302603;MANAUS\n"


@pytest.fixture()
def fixture_zips(tmp_path):
    for name, content in [
        ("Empresas0.zip", EMPRESAS_CSV),
        ("Municipios.zip", MUNICIPIOS_CSV),
    ]:
        with zipfile.ZipFile(tmp_path / name, "w") as zf:
            zf.writestr(name.replace(".zip", ".CSV"), content.encode("latin-1"))
    return tmp_path


def _listing(spark, tmp_path):
    rows = [
        ListingRow("Empresas0.zip", f"file://{tmp_path}/Empresas0.zip", "2023-05-06 10:22", False),
        ListingRow("Municipios.zip", f"file://{tmp_path}/Municipios.zip", "2023-05-06 10:22", False),
        ListingRow("parent-dir", "#", "", True),
        ListingRow("LAYOUT.pdf", "file://nope", "2023-05-06 10:22", False),
    ]
    return listing_df(spark, rows)


def test_full_pipeline_roundtrip(spark, fixture_zips):
    listing = _listing(spark, fixture_zips)
    wh = str(fixture_zips / "warehouse")
    refreshed = run_pipeline(
        spark, listing, CatalogState({}), wh, str(fixture_zips / "scratch")
    )
    assert refreshed == {"empresas": "20230506", "municipios": "20230506"}

    emp = spark.sql("SELECT * FROM default.empresas ORDER BY cnpj_raiz")
    rows = emp.collect()
    assert len(rows) == 3
    by_key = {r.cnpj_raiz: r for r in rows}
    # latin-1 accents survive; decimal comma became double
    assert by_key[12345678].raz_soc == "EMPRESA SÃO PAULO LTDA"
    assert by_key[12345678].cap_soc == 1234.56
    assert by_key[87654321].raz_soc == "AÇAÍ DO NORTE ME"
    assert by_key[87654321].cap_soc == 0.0
    assert by_key[11222333].raz_soc is None and by_key[11222333].cap_soc is None
    assert dict(emp.dtypes)["cap_soc"] == "double"

    # catalog: partitions registered, true-max helper works
    assert list_partitions(spark, "empresas") == ["20230506"]
    assert latest_partition(spark, "empresas") == 20230506

    # dimension join over the landed warehouse (the §7.2 slice query)
    q = spark.sql(
        "SELECT m.`desc` AS city FROM default.municipios m WHERE m.codigo = 3550308"
    )
    assert q.collect()[0].city == "SÃO PAULO"


def test_freshness_skip_and_stale(spark, fixture_zips):
    listing = _listing(spark, fixture_zips)
    fresh = CatalogState({"empresas": ["20230506"], "municipios": ["20230506"]})
    assert plan_updates(spark, listing, fresh).count() == 0

    # out-of-order multi-partition catalog → true max decides (S14 intent)
    stale = CatalogState({"empresas": ["20230101", "20220615"], "municipios": ["20230506"]})
    manifest = plan_updates(spark, listing, stale).collect()
    assert [(r.table_name, r.date) for r in manifest] == [("empresas", "20230506")]


def test_partition_overwrite_idempotent(spark, fixture_zips):
    """Dynamic partition overwrite: re-ingesting the same ref_date must
    not duplicate rows (the reference's blind PutObject can)."""
    listing = _listing(spark, fixture_zips)
    wh = str(fixture_zips / "warehouse")
    for _ in range(2):
        run_pipeline(spark, listing, CatalogState({}), wh, str(fixture_zips / "scratch"))
    assert spark.sql("SELECT count(*) AS n FROM default.empresas").collect()[0].n == 3


def test_read_unknown_table_fails(spark):
    with pytest.raises(KeyError):
        read_cnpj_csv(spark, ["/nonexistent.csv"], "not_a_table")


def test_estabelecimentos_30_cols(spark, tmp_path):
    row = ";".join(["1"] * 4 + ["NOME"] + ["2"] * 3 + ["X", "3", "20230101", "4711"] + ["f{}".format(i) for i in range(18)])
    p = tmp_path / "estab.csv"
    p.write_text(row + "\n", encoding="latin-1")
    df = read_cnpj_csv(spark, [str(p)], "estabelecimentos")
    assert len(df.columns) == 30
    assert df.count() == 1
