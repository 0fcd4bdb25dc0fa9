"""Corpus-management ops: accounting, deterministic stratified
sampling, reproducible splits."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_dados_publicos_cnpj_spark.operators import load_table
from aws_etl_dados_publicos_cnpj_spark.operators.corpus import (
    corpus_stats,
    stratified_sample,
    train_val_test_split,
)

from conftest import SF_SMALL


def test_corpus_stats_tiny_frame(spark):
    df = spark.createDataFrame(
        [(1, "a bb", "en", "s1"), (2, "cc dd ee", "en", "s1"), (3, "x", "de", "s2")],
        "doc_id long, text string, lang string, source string",
    )
    out = {(r.lang, r.source): r for r in corpus_stats(df).collect()}
    assert out[("en", "s1")].n_docs == 2
    assert out[("en", "s1")].total_tokens == 5
    assert out[("en", "s1")].total_chars == 12
    assert out[("de", "s2")].avg_chars == 1.0


def test_stratified_sample_deterministic_and_rate_shaped(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    a = sorted(r.doc_id for r in stratified_sample(docs).collect())
    b = sorted(r.doc_id for r in stratified_sample(docs).collect())
    assert a == b  # content-hash selection: identical across runs
    kept = stratified_sample(docs).groupBy("lang").count().collect()
    total = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    for r in kept:
        assert r["count"] <= total[r.lang]
    # the dominant language is actually downsampled
    en_kept = next(r["count"] for r in kept if r.lang == "en")
    assert en_kept < total["en"]


def test_train_val_test_split_partitions_everything(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    out = train_val_test_split(docs)
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)
    # deterministic: same docs land in the same split on re-run
    first = {r.doc_id: r.split for r in out.collect()}
    again = {r.doc_id: r.split for r in train_val_test_split(docs).collect()}
    assert first == again
