"""Degenerate-input robustness: empty text, single-word docs, NULL
text, and empty frames must flow through the corpus operators without
crashing — at 100 TB every pathological row shape WILL occur."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def weird_docs(spark):
    return spark.createDataFrame(
        [
            (1, "", "en", "src0"),
            (2, "word", "en", "src0"),
            (3, None, "pt", "src1"),
            (4, "a b", "pt", "src1"),
            (5, "the exact same text here", "en", "src0"),
            (6, "the exact same text here", "en", "src1"),
        ],
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text"))


def test_dedup_family_survives_weird_docs(spark, weird_docs):
    from aws_etl_dados_publicos_cnpj_spark.operators import dedup

    nn = weird_docs.filter(F.col("text").isNotNull())
    pairs = dedup.jaccard_pairs(dedup.shingles(nn), threshold=0.8).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(5, 6)}
    fast = dedup.prefix_filter_jaccard_pairs(nn, threshold=0.8).collect()
    assert {(r.doc_a, r.doc_b) for r in fast} == {(5, 6)}
    sims = dedup.simhash(nn).collect()
    assert len(sims) == len(nn.collect())


def test_text_family_survives_weird_docs(spark, weird_docs):
    from aws_etl_dados_publicos_cnpj_spark.operators import text

    nn = weird_docs.filter(F.col("text").isNotNull())
    assert text.text_quality(nn).count() == 5
    assert text.repetition_ratio(nn).count() == 5
    spans = {r.doc_id: r.n_dup_ngrams for r in text.repeated_ngram_spans(nn).collect()}
    assert spans[1] == 0 and spans[5] >= 1 and spans[6] >= 1


def test_empty_frame_flows_through(spark, weird_docs):
    from aws_etl_dados_publicos_cnpj_spark.operators import corpus, dedup, text

    empty = weird_docs.filter(F.lit(False))
    assert dedup.jaccard_pairs(dedup.shingles(empty)).count() == 0
    assert text.text_quality(empty).count() == 0
    assert corpus.reservoir_sample(empty).count() == 0
    assert corpus.corpus_stats(empty).count() == 0
