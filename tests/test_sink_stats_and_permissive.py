"""Catalog statistics (S25 crawler-stats parity) and malformed-row
tolerance of the CNPJ CSV source."""

from __future__ import annotations

from aws_etl_dados_publicos_cnpj_spark.sources.cnpj_csv import read_cnpj_csv
from aws_etl_dados_publicos_cnpj_spark.sources.sink import (
    analyze_table,
    register_table,
    write_snapshot,
)


def test_analyze_table_records_stats(spark, tmp_path):
    root = str(tmp_path / "wh" / "municipios")
    df = spark.createDataFrame([(1, "A"), (2, "B")], "codigo long, desc string")
    write_snapshot(df, root, "20230506")
    register_table(spark, "stats_municipios", root)
    stats = analyze_table(spark, "stats_municipios", columns=["codigo"])
    assert "Statistics" in stats and "bytes" in stats["Statistics"]
    assert "2 rows" in stats["Statistics"]
    spark.sql("DROP TABLE stats_municipios")


def test_permissive_mode_tolerates_malformed_rows(spark, tmp_path):
    """A short row must not kill the job (PERMISSIVE): missing trailing
    fields land as nulls, well-formed rows are untouched."""
    p = tmp_path / "bad.csv"
    p.write_text(
        "3550308;SÃO PAULO\n"
        "9999999\n"  # missing the desc field entirely
        "1302603;MANAUS\n",
        encoding="latin-1",
    )
    rows = {r.codigo: r for r in read_cnpj_csv(spark, [str(p)], "municipios").collect()}
    assert len(rows) == 3
    assert rows[3550308]["desc"] == "SÃO PAULO"
    assert rows[9999999]["desc"] is None
