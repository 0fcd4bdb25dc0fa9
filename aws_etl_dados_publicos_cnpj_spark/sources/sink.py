"""Partitioned Parquet sink + catalog registration.

Replaces three reference operators (SURVEY.md §2.1 S22/S23/S25):

- Parquet write (``lambdas/fetch_data/fetch_data.py:75-77``)
- Hive-partitioned object-store layout
  ``cnpj_db/<table>/ref_date=<YYYYMMDD>/...`` (``fetch_data.py:80-83``,
  layout spec ``README.md:94-117``)
- Glue crawler catalog registration
  (``state_machines/state_machine.asl:132-139``) → Spark catalog
  external table + partition recovery.

Scale notes: dynamic partition overwrite makes snapshot re-ingest
idempotent per ``ref_date`` (the reference blindly re-PUTs objects and
can leave mixed partial state — SURVEY.md §7.4). ``target_file_rows``
compacts output files so a 100 TB table lands as bounded-size parquet
files instead of one file per upstream task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import PARTITION_COLUMN


def write_snapshot(
    df: DataFrame,
    table_root: str,
    ref_date: str | int,
    mode: str = "overwrite",
    target_partitions: int | None = None,
) -> None:
    """Land one snapshot partition: ``<table_root>/ref_date=<date>/``.

    With ``partitionOverwriteMode=dynamic`` (session default) only the
    written ``ref_date`` value is replaced — other snapshots are
    untouched, so a weekly incremental run is exactly-once per
    partition.
    """
    out = df.withColumn(PARTITION_COLUMN, F.lit(str(ref_date)))
    if target_partitions is not None:
        out = out.repartition(target_partitions)
    out.write.mode(mode).partitionBy(PARTITION_COLUMN).parquet(table_root)


def register_table(
    spark: SparkSession,
    name: str,
    table_root: str,
    database: str = "default",
) -> None:
    """Register the partitioned parquet directory as an external table
    and recover partitions — the crawler's job
    (``state_machine.asl:132-139``) done natively.

    Schema (including the partition column) is inferred from the
    parquet footers + directory layout, like the crawler; Spark 4
    requires either a full explicit column list or none with
    ``PARTITIONED BY``, so we omit both and let inference find the
    ``ref_date`` directories, then recover partitions.
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    spark.sql(f"DROP TABLE IF EXISTS {database}.{name}")
    spark.sql(f"CREATE TABLE {database}.{name} USING PARQUET LOCATION '{table_root}'")
    spark.sql(f"MSCK REPAIR TABLE {database}.{name}")


def compact_partition(
    spark: SparkSession,
    table_root: str,
    ref_date: str,
    target_files: int = 1,
    cluster_by: list[str] | None = None,
) -> int:
    """Rewrite one snapshot partition into ``target_files`` parquet
    files. Small-file compaction is the maintenance op a weekly
    incremental sink needs at scale (thousands of per-task files →
    bounded, scan-efficient objects). Uses an overwrite of just the one
    partition directory. Returns the row count rewritten.

    ``cluster_by`` keeps (or establishes) range clustering through the
    rewrite — plain round-robin repartition would destroy the narrow
    per-file min/max bands a ``write_clustered`` snapshot relies on for
    row-group pruning, so clustered tables must compact with the same
    keys."""
    part_path = f"{table_root}/{PARTITION_COLUMN}={ref_date}"
    df = spark.read.parquet(part_path)
    n = df.count()
    if cluster_by:
        compacted = df.repartitionByRange(target_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        compacted = df.repartition(target_files)
    tmp_path = f"{table_root}/.compact_tmp_{ref_date}"
    compacted.write.mode("overwrite").parquet(tmp_path)
    # crash-safe swap via filesystem renames (atomic on HDFS/local;
    # object stores would use a manifest commit instead): move the live
    # partition ASIDE first, install the compacted copy, then delete
    # the aside — every intermediate state retains one full copy, so a
    # crash mid-swap never loses the partition (recover by renaming
    # .compact_old_<date> back).
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(table_root).getFileSystem(spark._jsc.hadoopConfiguration())
    old_path = f"{table_root}/.compact_old_{ref_date}"
    fs.delete(jvm_path(old_path), True)  # leftover aside from a prior crash
    fs.rename(jvm_path(part_path), jvm_path(old_path))
    fs.rename(jvm_path(tmp_path), jvm_path(part_path))
    fs.delete(jvm_path(old_path), True)
    return n


def write_clustered(
    df: DataFrame,
    table_root: str,
    ref_date: str | int,
    cluster_by: list[str],
    files_per_partition: int = 8,
) -> None:
    """Range-cluster a snapshot on ``cluster_by`` before writing:
    repartitionByRange + sortWithinPartitions gives every parquet file
    a narrow min/max band on the cluster keys, so row-group statistics
    prune point/range scans (the Z-order-lite that plain parquet
    supports)."""
    out = (
        df.repartitionByRange(files_per_partition, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .withColumn(PARTITION_COLUMN, F.lit(str(ref_date)))
    )
    out.write.mode("overwrite").partitionBy(PARTITION_COLUMN).parquet(table_root)


def analyze_table(
    spark: SparkSession, name: str, columns: list[str] | None = None, database: str = "default"
) -> dict[str, str]:
    """Collect table + column statistics for Catalyst's cost-based
    optimizer — the engine's form of the crawler-collected
    recordCount/sizeKey/averageRecordSize stats
    (``lambdas/check_update/check_update.py:133-144``). Returns the
    recorded statistics line for inspection."""
    spark.sql(f"ANALYZE TABLE {database}.{name} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {database}.{name} COMPUTE STATISTICS FOR COLUMNS {cols}")
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {database}.{name}").collect()
    return {r.col_name: r.data_type for r in rows if r.col_name == "Statistics"}


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    buckets: int = 32,
    sort_by: str | None = None,
) -> None:
    """Bucketed managed table: pre-shuffles once at write so every later
    join/agg on ``key`` is co-located — no Exchange in the plan
    (SURVEY.md §7.4 / guide's bucketing row; the pattern for fact-fact
    joins repeated across a 100 TB warehouse's workload)."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.format("parquet").saveAsTable(name)


def list_partitions(spark: SparkSession, name: str, database: str = "default") -> list[str]:
    """``SHOW PARTITIONS`` → list of ``ref_date`` values (S13,
    ``state_machine.asl:43-55``)."""
    rows = spark.sql(f"SHOW PARTITIONS {database}.{name}").collect()
    return sorted(r[0].split("=", 1)[1] for r in rows)


def latest_partition(spark: SparkSession, name: str, database: str = "default") -> int | None:
    """True max over partition values — the *intended* semantics of the
    reference's freshness check (``lambdas/download_test/lambda_function.py:6``
    takes ``partitionValues[0]`` relying on service ordering; intent per
    ``README.md:222`` is the max — SURVEY.md §2.1 S14)."""
    parts = list_partitions(spark, name, database)
    return max((int(p) for p in parts), default=None)


def snapshot_diff(
    spark: SparkSession,
    name: str,
    old_ref: str | int,
    new_ref: str | int,
    key_cols: list[str],
    database: str = "default",
) -> DataFrame:
    """Time-travel diff between two ``ref_date`` snapshots of a
    catalog table: one row per changed entity with ``change ∈
    {added, removed, updated}``.

    The reference's weekly full re-uploads ARE snapshots
    (``README.md:222``); "what changed since last week" is the first
    consumption question that layout exists to answer. Both sides are
    partition-pruned scans (the ``ref_date =`` filters hit the Hive
    layout, no other snapshot is read); the diff is a single full-outer
    key join; ``updated`` compares a row-content hash of the non-key
    columns so wide tables diff without shipping both full rows to the
    driver."""
    tbl = spark.table(f"{database}.{name}")
    data_cols = [
        c for c in tbl.columns if c not in (*key_cols, PARTITION_COLUMN)
    ]
    def side(ref, tag):
        return tbl.filter(F.col(PARTITION_COLUMN) == str(ref)).select(
            *key_cols,
            F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in data_cols]).alias(f"h_{tag}"),
        )
    old, new = side(old_ref, "old"), side(new_ref, "new")
    joined = old.join(new, key_cols, "full_outer")
    change = (
        F.when(F.col("h_old").isNull(), "added")
        .when(F.col("h_new").isNull(), "removed")
        .when(F.col("h_old") != F.col("h_new"), "updated")
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_col: str = "effective_date",
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge: history-preserving upsert
    of a dimension snapshot (the warehouse consumption feature the
    reference's weekly full re-uploads approximate by overwriting —
    this keeps every version queryable).

    ``current`` rows carry ``valid_from`` / ``valid_to`` (NULL = open);
    ``updates`` carries the new attribute values with their effective
    date. Semantics: an open row whose attribute CONTENT HASH differs
    from its update closes at the effective date and a new open row
    begins there; brand-new keys open a first row; unchanged rows and
    already-closed history pass through untouched.

    Plan shape: ONE key-partitioned join of open rows × updates decides
    everything (closed history is a pass-through union, no join); the
    attribute comparison is an xxhash64 of the attr columns, so wide
    dimensions compare without shipping both attribute sets through the
    plan twice."""
    attr_hash = F.xxhash64(
        *[F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in attr_cols]
    )
    closed = current.filter(F.col("valid_to").isNotNull())
    open_rows = current.filter(F.col("valid_to").isNull())

    u = updates.select(
        *key_cols,
        *[F.col(c).alias(f"__new_{c}") for c in attr_cols],
        F.col(effective_col).alias("__eff"),
        F.xxhash64(
            *[F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in attr_cols]
        ).alias("__new_hash"),
    )
    joined = open_rows.withColumn("__hash", attr_hash).join(u, key_cols, "full_outer")

    unchanged_or_no_update = joined.filter(
        F.col("__eff").isNull() | (F.col("__hash") == F.col("__new_hash"))
    ).select(*key_cols, *attr_cols, "valid_from", "valid_to")

    closing = joined.filter(
        F.col("__hash").isNotNull()
        & F.col("__eff").isNotNull()
        & (F.col("__hash") != F.col("__new_hash"))
    )
    closed_now = closing.select(
        *key_cols, *attr_cols, "valid_from", F.col("__eff").alias("valid_to")
    )
    opened_now = joined.filter(
        F.col("__eff").isNotNull()
        & (F.col("__hash").isNull() | (F.col("__hash") != F.col("__new_hash")))
    ).select(
        *key_cols,
        *[F.col(f"__new_{c}").alias(c) for c in attr_cols],
        F.col("__eff").alias("valid_from"),
        F.lit(None).cast(current.schema["valid_to"].dataType).alias("valid_to"),
    )
    return closed.unionByName(unchanged_or_no_update).unionByName(
        closed_now
    ).unionByName(opened_now)
