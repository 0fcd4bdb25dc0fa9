"""CNPJ-domain consumption queries — what the reference's users
actually run on Athena/QuickSight over the landed warehouse
(``README.md:64-66``, data model §1.5 of SURVEY.md): dimension joins +
filters + aggregations over the star schema, always against the latest
``ref_date`` snapshot.

Each function takes (spark, database) and reads the cataloged tables
the pipeline registered, so they run identically over a fixture
warehouse (tests) or the full registry. The latest-snapshot pattern —
``WHERE ref_date = (max partition)`` — is partition-pruned to a single
directory by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.sink import latest_partition


def _latest(spark: SparkSession, database: str, table: str) -> DataFrame:
    ref = latest_partition(spark, table, database)
    return spark.table(f"{database}.{table}").filter(F.col("ref_date") == str(ref))


def companies_by_municipality(spark: SparkSession, database: str = "default") -> DataFrame:
    """Establishment count per municipality (estabelecimentos ⋈
    municipios on end_cod_muni → codigo)."""
    est = _latest(spark, database, "estabelecimentos")
    mun = _latest(spark, database, "municipios")
    return (
        est.join(F.broadcast(mun), est.end_cod_muni == mun.codigo)
        .groupBy(F.col("desc").alias("municipio"))
        .agg(F.count("*").alias("n_estabelecimentos"))
    )


def capital_by_company_size(spark: SparkSession, database: str = "default") -> DataFrame:
    """Total/average capital social per size code (porte)."""
    emp = _latest(spark, database, "empresas")
    return emp.groupBy("porte").agg(
        F.count("*").alias("n_empresas"),
        F.round(F.sum("cap_soc"), 2).alias("total_capital"),
        F.round(F.avg("cap_soc"), 2).alias("avg_capital"),
    )


def partners_per_company(spark: SparkSession, database: str = "default") -> DataFrame:
    """Partner (socios) count per company with legal nature decoded."""
    soc = _latest(spark, database, "socios")
    emp = _latest(spark, database, "empresas")
    nat = _latest(spark, database, "naturezas")
    counts = soc.groupBy("cnpj_raiz").agg(F.count("*").alias("n_socios"))
    return (
        emp.join(counts, "cnpj_raiz", "left")
        .join(F.broadcast(nat), emp.nat_jud == nat.codigo, "left")
        .select(
            "cnpj_raiz",
            "raz_soc",
            F.col("desc").alias("natureza_juridica"),
            F.coalesce(F.col("n_socios"), F.lit(0)).alias("n_socios"),
        )
    )


def simples_adherence(spark: SparkSession, database: str = "default") -> DataFrame:
    """Share of companies opted into the Simples tax regime — one lazy
    left-join aggregate (single scan of empresas, no eager driver
    actions; the old double-count form scanned it twice)."""
    emp = _latest(spark, database, "empresas")
    simples = (
        _latest(spark, database, "simples")
        .filter(F.col("opcao_simpl") == "S")
        .select("cnpj_raiz", F.lit(1).alias("__opted"))
        .dropDuplicates(["cnpj_raiz"])
    )
    return (
        emp.select("cnpj_raiz")
        .join(simples, "cnpj_raiz", "left")
        .agg(
            F.count("*").alias("n_empresas"),
            # outer coalesce: sum over an EMPTY empresas snapshot is
            # NULL, not 0 (r6 advice — same contract as quality.fk_check)
            F.coalesce(F.sum(F.coalesce("__opted", F.lit(0))), F.lit(0))
            .cast("long")
            .alias("n_simples"),
        )
        .select(
            "n_empresas",
            "n_simples",
            F.round(
                F.when(
                    F.col("n_empresas") > 0,
                    F.col("n_simples") / F.col("n_empresas"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("adherence"),
        )
    )


def main_activity_ranking(spark: SparkSession, database: str = "default") -> DataFrame:
    """Top primary CNAE activities by establishment count, decoded."""
    est = _latest(spark, database, "estabelecimentos")
    cnaes = _latest(spark, database, "cnaes")
    return (
        est.join(F.broadcast(cnaes), est.cnae_pri == cnaes.codigo)
        .groupBy(F.col("desc").alias("atividade"))
        .agg(F.count("*").alias("n_estabelecimentos"))
        .orderBy(F.desc("n_estabelecimentos"), F.asc("atividade"))
    )
