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


def test_warehouse_maintenance_multi_snapshot(spark, fixture_zips):
    """Sink maintenance at warehouse shape (VERDICT r3 #8): a table with
    pipeline-landed snapshots plus a clustered bulk snapshot, where
    compaction (a) preserves the row-group pruning bands through the
    aside-rename swap and (b) leaves sibling snapshots untouched."""
    import glob

    import pyarrow.parquet as pq

    from aws_etl_dados_publicos_cnpj_spark.sources.sink import (
        compact_partition,
        register_table,
        write_clustered,
    )

    wh = str(fixture_zips / "warehouse")
    scratch = str(fixture_zips / "scratch")
    # snapshot 1 via the full pipeline
    run_pipeline(spark, _listing(spark, fixture_zips), CatalogState({}), wh, scratch)
    # snapshot 2: same files re-published a month later
    rows2 = [
        ListingRow("Empresas0.zip", f"file://{fixture_zips}/Empresas0.zip", "2023-06-10 09:00", False),
        ListingRow("Municipios.zip", f"file://{fixture_zips}/Municipios.zip", "2023-06-10 09:00", False),
    ]
    run_pipeline(
        spark,
        listing_df(spark, rows2),
        CatalogState({"empresas": ["20230506"], "municipios": ["20230506"]}),
        wh,
        scratch,
    )
    root = os.path.join(wh, "empresas")
    # snapshot 3: a bulk clustered snapshot of the same schema
    bulk = (
        spark.range(10_000)
        .select(
            F.col("id").cast("long").alias("cnpj_raiz"),
            F.concat(F.lit("EMPRESA "), F.col("id")).alias("raz_soc"),
            F.lit(2046).cast("int").alias("nat_jur"),
            F.lit(10).cast("int").alias("qual_resp"),
            (F.col("id") * 1.5).alias("cap_soc"),
            F.lit(3).cast("int").alias("porte"),
            F.lit(None).cast("string").alias("ente_fed"),
        )
    )
    write_clustered(bulk, root, "20230715", cluster_by=["cnpj_raiz"], files_per_partition=8)
    register_table(spark, "empresas", root)
    assert list_partitions(spark, "empresas") == ["20230506", "20230610", "20230715"]

    # compact 8 clustered files → 2, keeping the clustering
    n = compact_partition(spark, root, "20230715", target_files=2, cluster_by=["cnpj_raiz"])
    assert n == 10_000
    files = sorted(glob.glob(f"{root}/ref_date=20230715/*.parquet"))
    assert len(files) == 2
    # row-group pruning bands survive the swap: per-file cnpj_raiz
    # [min,max] ranges are disjoint
    bands = []
    for f in files:
        md = pq.read_metadata(f)
        idx = md.schema.names.index("cnpj_raiz")
        mins = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
        bands.append((min(mins), max(maxs)))
    bands.sort()
    assert bands[0][1] < bands[1][0]

    # catalog still serves every snapshot; siblings untouched
    per_part = {
        r.ref_date: r.n
        for r in spark.sql(
            "SELECT ref_date, count(*) AS n FROM default.empresas GROUP BY ref_date"
        ).collect()
    }
    assert per_part == {"20230506": 3, "20230610": 3, "20230715": 10_000}
    # partition pruning reaches the scan for a snapshot point query
    plan = (
        spark.sql(
            "SELECT * FROM default.empresas WHERE ref_date = '20230715' AND cnpj_raiz = 42"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "20230715" in plan


def test_snapshot_diff_classifies_changes(spark, tmp_path):
    """Two snapshots of a small dimension → added/removed/updated rows
    classified correctly, with both scans partition-pruned."""
    from aws_etl_dados_publicos_cnpj_spark.sources.sink import (
        register_table,
        snapshot_diff,
        write_snapshot,
    )

    root = str(tmp_path / "dimtbl")
    old = spark.createDataFrame(
        [(1, "acme", 10.0), (2, "beta", 20.0), (3, "gone", 30.0)],
        "k long, nome string, cap double",
    )
    new = spark.createDataFrame(
        [(1, "acme", 10.0), (2, "beta", 25.0), (4, "novel", 40.0)],
        "k long, nome string, cap double",
    )
    write_snapshot(old, root, 20240101)
    write_snapshot(new, root, 20240108)
    register_table(spark, "dimtbl", root)

    diff = snapshot_diff(spark, "dimtbl", 20240101, 20240108, ["k"])
    got = {(r.k, r.change) for r in diff.collect()}
    assert got == {(2, "updated"), (3, "removed"), (4, "added")}

    # both sides must be partition-pruned to exactly their snapshot
    # (plan toString truncates PartitionFilters at 100 chars by default)
    import re

    old_len = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = snapshot_diff(
            spark, "dimtbl", 20240101, 20240108, ["k"]
        )._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old_len)
    prunes = re.findall(r"PartitionFilters: \[[^\]]*= (\d+)\)", plan)
    assert sorted(prunes) == ["20240101", "20240108"], plan[:3000]


def test_scd2_merge_history_semantics(spark):
    """Changed rows close and reopen at the effective date, new keys
    open a first version, unchanged keys pass through, closed history
    is untouched — and re-applying the same update batch is a no-op
    (idempotent upsert)."""
    from pyspark.sql import functions as F

    from aws_etl_dados_publicos_cnpj_spark.sources.sink import scd2_merge

    current = spark.createDataFrame(
        [
            (1, "acme", 10.0, "20240101", None),        # open, will change
            (2, "beta", 20.0, "20240101", None),        # open, unchanged
            (3, "gone", 30.0, "20230101", "20240101"),  # closed history
            (3, "gone2", 31.0, "20240101", None),       # open, no update row
        ],
        "k long, nome string, cap double, valid_from string, valid_to string",
    )
    updates = spark.createDataFrame(
        [
            (1, "acme", 15.0, "20240201"),   # cap changed
            (2, "beta", 20.0, "20240201"),   # identical → no-op
            (4, "novel", 40.0, "20240201"),  # new key
        ],
        "k long, nome string, cap double, effective_date string",
    )
    merged = scd2_merge(current, updates, ["k"], ["nome", "cap"])
    rows = {(r.k, r.valid_from, r.valid_to): (r.nome, r.cap) for r in merged.collect()}
    assert rows == {
        (1, "20240101", "20240201"): ("acme", 10.0),
        (1, "20240201", None): ("acme", 15.0),
        (2, "20240101", None): ("beta", 20.0),
        (3, "20230101", "20240101"): ("gone", 30.0),
        (3, "20240101", None): ("gone2", 31.0),
        (4, "20240201", None): ("novel", 40.0),
    }
    # idempotence: replaying the batch changes nothing (hashes now match)
    again = scd2_merge(merged, updates, ["k"], ["nome", "cap"])
    rows2 = {(r.k, r.valid_from, r.valid_to): (r.nome, r.cap) for r in again.collect()}
    assert rows2 == rows
    # exactly one open row per key survives
    open_counts = (
        merged.filter(F.col("valid_to").isNull()).groupBy("k").count().collect()
    )
    assert all(r["count"] == 1 for r in open_counts)


def test_partial_failure_resume_ingests_only_missing(spark, fixture_zips):
    """Crash-resume semantics (the state machine's retry story): if a
    prior run committed municipios but died before empresas, planning
    from the surviving catalog must ingest ONLY empresas, and the
    resumed warehouse must match a clean full run."""
    listing = _listing(spark, fixture_zips)
    wh = str(fixture_zips / "warehouse")
    partial = CatalogState({"municipios": ["20230506"]})
    manifest = plan_updates(spark, listing, partial).collect()
    assert [(r.table_name, r.date) for r in manifest] == [("empresas", "20230506")]
    refreshed = run_pipeline(
        spark, listing, partial, wh, str(fixture_zips / "scratch")
    )
    assert refreshed == {"empresas": "20230506"}
    emp = spark.sql("SELECT count(*) AS n FROM default.empresas").collect()[0].n
    assert emp == 3
    # and the now-complete catalog replans to a no-op
    complete = CatalogState(
        {"empresas": ["20230506"], "municipios": ["20230506"]}
    )
    assert plan_updates(spark, listing, complete).count() == 0
