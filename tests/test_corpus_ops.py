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


def test_chunk_documents_windows_and_tail(spark):
    """A 100-word doc at chunk=50/stride=40 yields starts 0,40,80 with
    the tail chunk truncated; a short doc yields one whole-text chunk."""
    from aws_etl_dados_publicos_cnpj_spark.operators.corpus import chunk_documents

    long_text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, long_text), (2, "only three words")], "doc_id long, text string"
    )
    rows = {
        (r.doc_id, r.chunk_start): r
        for r in chunk_documents(df, chunk=50, stride=40).collect()
    }
    assert set(rows) == {(1, 0), (1, 40), (1, 80), (2, 0)}
    assert rows[(1, 0)].n_words == 50
    assert rows[(1, 80)].n_words == 20
    assert rows[(1, 80)].chunk_text.startswith("w80 ")
    assert rows[(2, 0)].chunk_text == "only three words"
    # overlap: chunk at 40 re-covers words 40..49 of chunk at 0
    assert rows[(1, 40)].chunk_text.split(" ")[0] == "w40"


def test_domain_cap_sample_keeps_lowest_ids(spark):
    from aws_etl_dados_publicos_cnpj_spark.operators.corpus import domain_cap_sample

    df = spark.createDataFrame(
        [(i, "a" if i < 10 else "b") for i in range(15)],
        "doc_id long, source string",
    )
    out = domain_cap_sample(df, cap=3, key="source").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    assert by_src == {"a": {0, 1, 2}, "b": {10, 11, 12}}


def test_bloom_decontaminate_no_false_negatives_and_flags_planted(spark):
    """Planted contamination must surface with bloom_hit=True (the
    no-false-negative guarantee of the relational Bloom filter)."""
    from aws_etl_dados_publicos_cnpj_spark.operators.corpus import bloom_decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix words then the quick brown fox jumps over and more"),
            (2, "completely unrelated content about spark partitions here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.bloom_hit for r in bloom_decontaminate(train, bench).collect()}
    assert out == {1: True}
