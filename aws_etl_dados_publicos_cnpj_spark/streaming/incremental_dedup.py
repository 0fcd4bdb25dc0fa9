"""Continuous near-dedup: a document stream deduped batch-by-batch
against an accumulating parquet signature store.

This is the streaming face of ``dedup.minhash_lsh_dedup_incremental``:
each micro-batch (a) computes its MinHash signature table once, (b)
bands itself against the persisted corpus signatures — new×(corpus+new),
never corpus×corpus — and (c) appends its own signatures to the store
for the next batch. ``foreachBatch`` is the right Spark primitive: the
band join + exact verify is a batch plan.

Crash-replay safety: both sinks are partitioned by ``batch_id`` and
written with ``mode('overwrite')`` + dynamic partition overwrite, so a
replayed batch REPLACES its own partition instead of appending duplicate
part files (plain ``mode('append')`` would duplicate rows in both
tables on every replay, and duplicated signature rows would then
multiply future pair output through the verify joins). The corpus read
also excludes the replaying batch's own partition, so a half-written
store partition from a crashed attempt can never band against itself.

At 100 TB the signature store is ~1% of corpus bytes (96 longs + the
distinct shingle set per doc) and is the ONLY thing history contributes
to each refresh — raw text is never re-read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _write_batch_partition(df: DataFrame, batch_id: int, path: str) -> None:
    """Idempotent per-batch sink: the rows land in ``batch_id=<n>/`` and
    a replay of the same batch overwrites exactly that partition
    (dynamic partition overwrite touches only partitions present in the
    written data)."""
    (
        df.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def process_dedup_batch(
    batch: DataFrame,
    batch_id: int,
    sig_store: str,
    out_table: str,
    threshold: float = 0.8,
) -> None:
    """One micro-batch of the continuous dedup loop — exposed at module
    level so tests can replay a batch and assert idempotency."""
    from ..operators.dedup import (
        minhash_lsh_dedup_incremental,
        minhash_signature_table,
    )

    sigs = minhash_signature_table(batch).cache()
    try:
        if os.path.isdir(sig_store) and any(
            not e.startswith(("_", ".")) for e in os.listdir(sig_store)
        ):
            corpus = (
                batch.sparkSession.read.parquet(sig_store)
                # a crashed attempt may have written this batch's own
                # partition already — never band the batch against it
                .filter(F.col("batch_id") != batch_id)
                .drop("batch_id")
            )
        else:
            corpus = sigs.limit(0)
        pairs = minhash_lsh_dedup_incremental(sigs, corpus, threshold=threshold)
        _write_batch_partition(pairs, batch_id, out_table)
        _write_batch_partition(sigs, batch_id, sig_store)
    finally:
        sigs.unpersist()


def start_streaming_dedup(
    spark: SparkSession,
    docs_stream: DataFrame,
    sig_store: str,
    out_table: str,
    checkpoint: str,
    threshold: float = 0.8,
):
    """Wire a documents stream into the incremental dedup loop.

    ``out_table`` accumulates (doc_a, doc_b, jaccard) pairs where at
    least one side arrived in the emitting batch."""

    def process(batch: DataFrame, batch_id: int) -> None:
        process_dedup_batch(batch, batch_id, sig_store, out_table, threshold)

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
