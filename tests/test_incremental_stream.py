"""Exactly-once file-level incrementality of the streaming ingest:
run 1 drains the initial files, run 2 picks up only the new file."""

from __future__ import annotations

import os

from aws_etl_dados_publicos_cnpj_spark.plans.incremental_stream import stream_ingest_table


def _land(landing, ref_date, name, content):
    d = os.path.join(landing, f"ref_date={ref_date}")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w", encoding="latin-1") as f:
        f.write(content)


def test_streaming_ingest_is_exactly_once(spark, tmp_path):
    landing = str(tmp_path / "landing")
    root = str(tmp_path / "wh" / "municipios")
    ckpt = str(tmp_path / "ckpt")

    _land(landing, "20230506", "m0.csv", "3550308;SÃO PAULO\n1302603;MANAUS\n")
    _land(landing, "20230506", "m1.csv", "4106902;CURITIBA\n")
    stream_ingest_table(spark, landing, "municipios", root, ckpt)

    df = spark.read.parquet(root)
    assert df.count() == 3
    assert set(r.ref_date for r in df.select("ref_date").distinct().collect()) == {"20230506"}

    # second run with one NEW file (new snapshot date): only it is ingested
    _land(landing, "20230513", "m2.csv", "2304400;FORTALEZA\n")
    stream_ingest_table(spark, landing, "municipios", root, ckpt)
    df2 = spark.read.parquet(root)
    assert df2.count() == 4
    assert df2.filter("ref_date = '20230513'").collect()[0]["desc"] == "FORTALEZA"

    # third run with nothing new: no duplicates (exactly-once)
    stream_ingest_table(spark, landing, "municipios", root, ckpt)
    assert spark.read.parquet(root).count() == 4
