"""Continuous near-dedup: a document stream deduped batch-by-batch
against an accumulating parquet signature store.

This is the streaming face of ``dedup.minhash_lsh_dedup_incremental``:
each micro-batch (a) computes its MinHash signature table once, (b)
bands itself against the persisted corpus signatures — new×(corpus+new),
never corpus×corpus — and (c) appends its own signatures to the store
for the next batch. ``foreachBatch`` is the right Spark primitive: the
band join + exact verify is a batch plan, and the store append is an
idempotent-by-path parquet write, so checkpoint recovery replays a
batch without corrupting history (same batch → same signature rows).

At 100 TB the signature store is ~1% of corpus bytes (96 longs + the
distinct shingle set per doc) and is the ONLY thing history contributes
to each refresh — raw text is never re-read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


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
    from ..operators.dedup import (
        minhash_lsh_dedup_incremental,
        minhash_signature_table,
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        sigs = minhash_signature_table(batch).cache()
        if os.path.isdir(sig_store) and any(
            f.endswith(".parquet") for f in os.listdir(sig_store)
        ):
            corpus = batch.sparkSession.read.parquet(sig_store)
        else:
            corpus = sigs.limit(0)
        pairs = minhash_lsh_dedup_incremental(sigs, corpus, threshold=threshold)
        pairs.write.mode("append").parquet(out_table)
        sigs.write.mode("append").parquet(sig_store)
        sigs.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
