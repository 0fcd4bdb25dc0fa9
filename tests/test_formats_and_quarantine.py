"""Sink/source format breadth (ORC, JSON round-trips) and the
corrupt-record quarantine path."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_dados_publicos_cnpj_spark.operators import load_table
from aws_etl_dados_publicos_cnpj_spark.sources.cnpj_csv import read_cnpj_csv

from conftest import SF_SMALL


def test_orc_and_json_roundtrip_match_parquet(spark, tmp_path):
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    want = li.groupBy("l_returnflag").agg(F.round(F.sum("l_quantity"), 2).alias("s"))
    want_rows = {(r.l_returnflag, r.s) for r in want.collect()}

    orc_path, json_path = str(tmp_path / "orc"), str(tmp_path / "json")
    li.write.mode("overwrite").orc(orc_path)
    li.write.mode("overwrite").json(json_path)

    orc_back = spark.read.orc(orc_path)
    json_back = spark.read.schema(li.schema).json(json_path)
    for back in (orc_back, json_back):
        got = {
            (r.l_returnflag, r.s)
            for r in back.groupBy("l_returnflag")
            .agg(F.round(F.sum("l_quantity"), 2).alias("s"))
            .collect()
        }
        assert got == want_rows


def test_quarantine_captures_overflow_rows(spark, tmp_path):
    """A row with MORE fields than the schema is a layout violation:
    PERMISSIVE parses the prefix, and the quarantine column keeps the
    raw line for the quarantine sink."""
    p = tmp_path / "drift.csv"
    p.write_text(
        "3550308;SÃO PAULO\n"
        "1302603;MANAUS;EXTRA_FIELD\n",  # drifted layout
        encoding="latin-1",
    )
    # cache: Spark disallows scans that prune to only the corrupt column
    df = read_cnpj_csv(spark, [str(p)], "municipios", quarantine_col="_raw").cache()
    rows = {r.codigo: r for r in df.collect()}
    assert rows[3550308]["_raw"] is None
    assert rows[1302603]["_raw"] == "1302603;MANAUS;EXTRA_FIELD"
    quarantined = df.filter(F.col("_raw").isNotNull())
    assert quarantined.count() == 1
