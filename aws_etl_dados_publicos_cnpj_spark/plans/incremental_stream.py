"""Streaming incremental ingest — the reference's weekly-scheduler +
skip-if-fresh semantics (SURVEY.md §2.1 S26/S14) in its native Spark
form: a checkpointed file-source stream over a landing directory with
``Trigger.AvailableNow``.

Where the batch pipeline (plans/pipeline.py) re-derives freshness from
the catalog each run, the streaming form gets exactly-once *file-level*
incrementality from the checkpoint: every run drains only files the
checkpoint hasn't seen, then stops. At 100 TB this is the
arrival-driven lake pattern — no listing diff, no manual manifest; new
partitions appear as files land, and a crashed run resumes from the
checkpoint without re-ingesting.

Landing layout: ``<landing>/ref_date=<YYYYMMDD>/<file>.csv`` in the
CNPJ dialect; the partition value rides the directory name exactly like
the warehouse layout (``lambdas/fetch_data/fetch_data.py:82``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import decimal_comma_to_double
from ..schemas import DECIMAL_COMMA_COLUMNS, PARTITION_COLUMN, RAW_SCHEMAS
from ..sources.cnpj_csv import CNPJ_CSV_OPTIONS


def stream_ingest_table(
    spark: SparkSession,
    landing_dir: str,
    table: str,
    table_root: str,
    checkpoint_dir: str,
) -> None:
    """Drain all unseen CSV files for ``table`` from the landing dir
    into the partitioned warehouse, exactly once, then return."""
    raw_schema = RAW_SCHEMAS[table]
    stream = (
        spark.readStream.options(**CNPJ_CSV_OPTIONS)
        .schema(raw_schema)
        .csv(f"{landing_dir}/ref_date=*/")
    )
    # partition value from the directory name, like the sink layout
    stream = stream.withColumn(
        PARTITION_COLUMN,
        F.regexp_extract(F.input_file_name(), r"ref_date=(\d{8})", 1),
    )
    for col in DECIMAL_COMMA_COLUMNS.get(table, []):
        stream = stream.withColumn(col, decimal_comma_to_double(F.col(col)))

    def _write_batch(batch: DataFrame, epoch_id: int) -> None:
        (
            batch.write.mode("append")
            .partitionBy(PARTITION_COLUMN)
            .parquet(table_root)
        )

    q = (
        stream.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
