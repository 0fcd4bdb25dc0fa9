"""IVF ANN recall on clustered data, and the ingest pipeline across all
10 CNPJ table schemas."""

from __future__ import annotations

import os
import zipfile

from aws_etl_dados_publicos_cnpj_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_ivf_topk,
)
from aws_etl_dados_publicos_cnpj_spark.plans.pipeline import run_pipeline
from aws_etl_dados_publicos_cnpj_spark.plans.planner import CatalogState
from aws_etl_dados_publicos_cnpj_spark.schemas import ALLOWED_TABLE_NAMES, RAW_SCHEMAS
from aws_etl_dados_publicos_cnpj_spark.sources.listing import ListingRow, listing_df


def test_ivf_matches_bruteforce_on_clustered_data(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    for c in range(4):
        center = rng.randn(8) * 5
        for i in range(40):
            rows.append((c * 40 + i, (center + rng.randn(8) * 0.1).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = emb.filter("vec_id IN (0, 40, 80, 120)")
    exact = {
        (r.probe_id, r.rk): r.neighbor_id
        for r in ann_bruteforce_topk(emb, probes, k=3).collect()
    }
    ivf = {
        (r.probe_id, r.rk): r.neighbor_id
        for r in ann_ivf_topk(emb, probes, k=3, n_cells=4, n_probe_cells=1).collect()
    }
    # tight clusters → the quantizer isolates them → IVF recall is exact
    assert ivf == exact


def _fixture_row(table: str) -> str:
    """One CSV row matching the table's schema (decimal-comma on
    double-bound cols, text with latin-1 accents)."""
    parts = []
    for field in RAW_SCHEMAS[table].fields:
        if field.name == "cap_soc":
            parts.append("1234,56")
        elif str(field.dataType) == "LongType()":
            parts.append("7")
        else:
            parts.append("VALORAÇÃO")
    return ";".join(parts) + "\n"


def test_pipeline_all_ten_tables(spark, tmp_path):
    zip_names = {
        "empresas": "Empresas0.zip",
        "estabelecimentos": "Estabelecimentos0.zip",
        "socios": "Socios0.zip",
        "simples": "Simples.zip",
        "cnaes": "Cnaes.zip",
        "motivos": "Motivos.zip",
        "municipios": "Municipios.zip",
        "naturezas": "Naturezas.zip",
        "paises": "Paises.zip",
        "qualificacoes": "Qualificacoes.zip",
    }
    rows = []
    for table, zname in zip_names.items():
        with zipfile.ZipFile(tmp_path / zname, "w") as zf:
            zf.writestr(zname.replace(".zip", ".CSV"), _fixture_row(table).encode("latin-1"))
        rows.append(ListingRow(zname, f"file://{tmp_path}/{zname}", "2023-05-06 10:22", False))

    refreshed = run_pipeline(
        spark,
        listing_df(spark, rows),
        CatalogState({}),
        str(tmp_path / "wh"),
        str(tmp_path / "scratch"),
    )
    assert set(refreshed) == set(ALLOWED_TABLE_NAMES)
    for table in ALLOWED_TABLE_NAMES:
        got = spark.sql(f"SELECT * FROM default.{table}").collect()
        assert len(got) == 1, table
        expected_cols = len(RAW_SCHEMAS[table].fields) + 1  # + ref_date
        assert len(got[0]) == expected_cols, table
        if table == "empresas":
            assert got[0].cap_soc == 1234.56
    for table in ALLOWED_TABLE_NAMES:
        spark.sql(f"DROP TABLE IF EXISTS default.{table}")
