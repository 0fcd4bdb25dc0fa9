"""Corpus-management ops: accounting, deterministic stratified
sampling, reproducible splits."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_dados_publicos_cnpj_spark.operators import load_table
from aws_etl_dados_publicos_cnpj_spark.operators.corpus import (
    corpus_stats,
    decontaminate,
    pack_sequences,
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


def test_decontaminate_flags_planted_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated training text about spark engines here"),
            (3, "short doc"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        # shares the 5-gram "quick brown fox jumps over" with doc 1
        [(100, "a quick brown fox jumps over a fence")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_hit_shingles for r in decontaminate(train, bench).collect()}
    assert 1 in out and out[1] >= 1
    assert 2 not in out and 3 not in out


def test_decontaminate_short_doc_whole_text_shingle(spark):
    # docs under n words fall back to the whole text as one shingle
    train = spark.createDataFrame([(1, "tiny doc")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    out = decontaminate(train, bench).collect()
    assert len(out) == 1 and out[0].n_hit_shingles == 1


def test_pack_sequences_budget_and_determinism(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    a = pack_sequences(docs, budget=64, groups=8)
    rows = a.collect()
    assert sorted(tuple(r) for r in rows) == sorted(
        tuple(r) for r in pack_sequences(docs, budget=64, groups=8).collect()
    )
    # within each group, seq ids are the chunk index of the doc's first
    # token under concat-then-chunk semantics: recompute serially
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r.pack_group, []).append(r)
    for grp in by_group.values():
        grp.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in grp:
            assert r.seq_id == cum // 64
            cum += r.n_tokens
    # packing is dense: total sequences ~ total tokens / budget, never
    # one-doc-per-sequence sparse
    n_seqs = a.select("pack_group", "seq_id").distinct().count()
    total_tokens = a.agg(F.sum("n_tokens")).collect()[0][0]
    assert n_seqs <= total_tokens // 64 + 8  # ≤ one partial chunk per group


def test_repetition_ratio_planted(spark):
    from aws_etl_dados_publicos_cnpj_spark.operators.text import repetition_ratio

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),   # one bigram repeated 4x
            (2, "all words here are unique"),  # no repetition
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_ratio(df).collect()}
    assert out[1].dup_bigram_ratio == 0.75   # 4 bigrams, 1 distinct
    assert out[1].top_word_ratio == 1.0
    assert out[2].dup_bigram_ratio == 0.0
    assert out[2].top_word_ratio == 0.2


def test_shuffle_order_is_a_permutation_and_deterministic(spark):
    from aws_etl_dados_publicos_cnpj_spark.operators.corpus import shuffle_order

    docs = load_table(spark, SF_SMALL, "documents")
    a = {r.doc_id: r.shuffle_rank for r in shuffle_order(docs).collect()}
    b = {r.doc_id: r.shuffle_rank for r in shuffle_order(docs, partitions=5).collect()}
    n = docs.count()
    assert sorted(a.values()) == list(range(1, n + 1))  # contiguous global ranks
    assert a == b  # rank independent of partition count (pure hash order)
    # a different seed reshuffles
    c = {r.doc_id: r.shuffle_rank for r in shuffle_order(docs, seed=8).collect()}
    assert c != a


def test_domain_mix_replicates_by_weight(spark):
    from aws_etl_dados_publicos_cnpj_spark.operators.corpus import domain_mix

    df = spark.createDataFrame(
        [(1, "t", "en"), (2, "t", "zh"), (3, "t", "de")],
        "doc_id long, text string, lang string",
    )
    rows = domain_mix(df).collect()
    per_doc: dict[int, list[int]] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.epoch_copy)
    assert sorted(per_doc[1]) == [1]
    assert sorted(per_doc[2]) == [1, 2, 3]
    assert sorted(per_doc[3]) == [1, 2]
