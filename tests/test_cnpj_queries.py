"""CNPJ-domain consumption queries over a pipeline-landed fixture
warehouse — the 'a user of the reference can switch' proof: ingest via
the real pipeline, query via the domain pack, check decoded values."""

from __future__ import annotations

import zipfile

import pytest

from aws_etl_dados_publicos_cnpj_spark.operators.cnpj_queries import (
    capital_by_company_size,
    companies_by_municipality,
    main_activity_ranking,
    partners_per_company,
    simples_adherence,
)
from aws_etl_dados_publicos_cnpj_spark.plans.pipeline import run_pipeline
from aws_etl_dados_publicos_cnpj_spark.plans.planner import CatalogState
from aws_etl_dados_publicos_cnpj_spark.sources.listing import ListingRow, listing_df

FIXTURES = {
    "Empresas0.zip": (
        "10000001;PADARIA SÃO JORGE LTDA;2062;49;50000,00;1;SP\n"
        "10000002;TRANSPORTES AZUL SA;2054;10;1500000,50;3;AM\n"
        "10000003;MERCADO VERDE ME;2062;49;20000,00;1;SP\n"
    ),
    "Estabelecimentos0.zip": (
        "10000001;1;81;1;PADARIA SJ;2;20200101;0;;;20190105;4721102;;RUA;A;1;;CENTRO;01000000;SP;3550308;11;999;;;;;mail@x;;\n"
        "10000002;1;44;1;TA MATRIZ;2;20200101;0;;;20180215;4930201;;AV;B;2;;PORTO;69000000;AM;1302603;92;888;;;;;mail@y;;\n"
        "10000003;1;27;1;MV LOJA;2;20200101;0;;;20210330;4721102;;RUA;C;3;;CENTRO;01000001;SP;3550308;11;777;;;;;mail@z;;\n"
    ),
    "Socios0.zip": (
        "10000001;2;JOÃO DA SILVA;***111***;49;20190105;;;;;4\n"
        "10000001;2;MARIA SOUZA;***222***;49;20190105;;;;;5\n"
        "10000002;2;CARLOS LIMA;***333***;10;20180215;;;;;6\n"
    ),
    "Simples.zip": (
        "10000001;S;20190201;;N;;\n"
        "10000002;N;;;N;;\n"
        "10000003;S;20210401;;S;20210401;\n"
    ),
    "Municipios.zip": "3550308;SÃO PAULO\n1302603;MANAUS\n",
    "Cnaes.zip": "4721102;PADARIA E CONFEITARIA\n4930201;TRANSPORTE RODOVIÁRIO DE CARGA\n",
    "Naturezas.zip": "2062;SOCIEDADE EMPRESÁRIA LIMITADA\n2054;SOCIEDADE ANÔNIMA ABERTA\n",
    "Motivos.zip": "0;SEM MOTIVO\n",
    "Paises.zip": "105;BRASIL\n",
    "Qualificacoes.zip": "49;SÓCIO-ADMINISTRADOR\n10;DIRETOR\n",
}


@pytest.fixture(scope="module")
def cnpj_warehouse(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cnpj_wh")
    rows = []
    for zname, content in FIXTURES.items():
        with zipfile.ZipFile(tmp / zname, "w") as zf:
            zf.writestr(zname.replace(".zip", ".CSV"), content.encode("latin-1"))
        rows.append(ListingRow(zname, f"file://{tmp}/{zname}", "2023-05-06 10:22", False))
    refreshed = run_pipeline(
        spark, listing_df(spark, rows), CatalogState({}), str(tmp / "wh"), str(tmp / "scratch")
    )
    assert len(refreshed) == 10
    yield "default"


def test_companies_by_municipality(spark, cnpj_warehouse):
    out = {r.municipio: r.n_estabelecimentos for r in companies_by_municipality(spark).collect()}
    assert out == {"SÃO PAULO": 2, "MANAUS": 1}


def test_capital_by_company_size(spark, cnpj_warehouse):
    out = {r.porte: r for r in capital_by_company_size(spark).collect()}
    assert out[1].n_empresas == 2
    assert out[1].total_capital == 70000.0
    assert out[3].avg_capital == 1500000.5


def test_partners_per_company(spark, cnpj_warehouse):
    out = {r.cnpj_raiz: r for r in partners_per_company(spark).collect()}
    assert out[10000001].n_socios == 2
    assert out[10000001].natureza_juridica == "SOCIEDADE EMPRESÁRIA LIMITADA"
    assert out[10000002].n_socios == 1
    assert out[10000003].n_socios == 0


def test_simples_adherence(spark, cnpj_warehouse):
    r = simples_adherence(spark).collect()[0]
    assert (r.n_empresas, r.n_simples, r.adherence) == (3, 2, 0.6667)


def test_main_activity_ranking(spark, cnpj_warehouse):
    rows = main_activity_ranking(spark).collect()
    assert rows[0].atividade == "PADARIA E CONFEITARIA"
    assert rows[0].n_estabelecimentos == 2
