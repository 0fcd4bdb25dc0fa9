"""Plan-quality regression guards: the physical plans we tuned for must
stay tuned (broadcast strategy, pushdown, pruning, no cartesian
products). These assert on `.explain` output, the same way the plans
were originally audited."""

from __future__ import annotations

import re

import pytest

from aws_etl_dados_publicos_cnpj_spark.operators import relational

from conftest import SF_SMALL


@pytest.fixture(autouse=True)
def _full_metadata(spark):
    # plan toString truncates PushedFilters/ReadSchema at 100 chars
    old = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    yield
    spark.conf.set("spark.sql.maxMetadataStringLength", old)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q05_star_join_all_broadcast(spark):
    plan = _plan(relational.q05_revenue_by_nation(spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q06_filters_pushed_and_columns_pruned(spark):
    plan = _plan(relational.q06_forecast_revenue(spark, SF_SMALL))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_q01_scan_prunes_to_agg_columns(spark):
    plan = _plan(relational.q01_pricing_summary(spark, SF_SMALL))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert {"l_returnflag", "l_linestatus", "l_quantity"} <= cols


@pytest.mark.parametrize(
    "name",
    ["q03_shipping_priority", "semi_join_customers_with_orders", "left_join_order_counts"],
)
def test_no_cartesian_products_anywhere(spark, name):
    plan = _plan(relational.QUERIES[name](spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sampling_and_split_are_map_only(spark):
    """Deterministic sampling/splitting must stay shuffle-free: a pure
    scan→filter/project plan (the content-hash filter pushes no
    Exchange into the pipeline)."""
    from aws_etl_dados_publicos_cnpj_spark.operators import corpus

    for fn in (corpus.stratified_sample_docs, corpus.train_val_test_split_docs):
        plan = _plan(fn(spark, SF_SMALL))
        assert "Exchange" not in plan, plan
        assert "CartesianProduct" not in plan


def test_edit_distance_no_cartesian(spark):
    from aws_etl_dados_publicos_cnpj_spark.operators import dedup

    plan = _plan(dedup.edit_distance_pairs_docs(spark, SF_SMALL))
    assert "CartesianProduct" not in plan


def test_tfidf_single_corpus_scan(spark):
    """tfidf must not pre-count the corpus with a driver action or a
    second scan: tf is the one materialization point, and the document
    count N, the doc-frequency table, and the scoring join all read the
    cache — every branch of the plan sits above InMemoryTableScan, so
    the parquet scan of documents runs exactly once."""
    from aws_etl_dados_publicos_cnpj_spark.operators import text

    df = text.tfidf_top_terms_docs(spark, SF_SMALL)
    plan = _plan(df)
    # 3 consumers of the cached tf: scoring join, doc_freq, n_docs
    assert plan.count("InMemoryTableScan") == 3, plan
    assert "CartesianProduct" not in plan
    # and it still computes the right thing end to end
    assert df.count() > 0


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The corpus side must never shuffle: benchmark shingles broadcast,
    corpus scan → map-side join → one partial-agg exchange."""
    from aws_etl_dados_publicos_cnpj_spark.operators.corpus import (
        decontaminate_train_docs,
    )

    plan = _plan(decontaminate_train_docs(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pack_sequences_single_shuffle(spark):
    """Packing is one hash exchange on pack_group feeding the window —
    no joins, no extra sorts beyond the per-group window sort."""
    from aws_etl_dados_publicos_cnpj_spark.operators.corpus import pack_sequences_docs

    plan = _plan(pack_sequences_docs(spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


@pytest.mark.parametrize(
    "mod,name,want_cols",
    [
        ("text", "redact_pii_docs", {"doc_id", "text"}),
        ("similarity", "quantize_embeddings_int8", {"vec_id", "embedding"}),
        ("corpus", "pack_sequences_docs", {"doc_id", "text"}),
    ],
)
def test_new_ops_prune_scan_columns(spark, mod, name, want_cols):
    """Map-shaped pipeline ops must read only the columns they use —
    at 100 TB an unpruned documents/embeddings scan dominates cost."""
    import importlib

    m = importlib.import_module(f"aws_etl_dados_publicos_cnpj_spark.operators.{mod}")
    plan = _plan(m.QUERIES[name](spark, SF_SMALL))
    got = set()
    for match in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        got |= {c.split(":")[0] for c in match.group(1).split(",") if c}
    assert got == want_cols, plan[:2000]


def test_q04_semi_join_is_hash_not_nested_loop(spark):
    """The non-equi conjunct (l_shipdate > o_orderdate) must ride as a
    residual on the EQUI semi-join — if Spark ever planned it as a
    nested-loop the query would be quadratic at scale."""
    plan = _plan(relational.q04_order_priority(spark, SF_SMALL))
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q07_dimensions_broadcast_single_fact_shuffle(spark):
    """supplier/customer/nation×2 broadcast (≥4 BHJ); at sf0.001 the
    orders side also fits the broadcast threshold so lineitem⋈orders may
    broadcast too — the invariant is: every join is hash-equi, nothing
    sort-merges or nested-loops at this scale."""
    plan = _plan(relational.q07_volume_shipping(spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q10_top20_is_take_ordered(spark):
    """The top-20 must plan as TakeOrderedAndProject (partial per-
    partition top-k + one merge), never a global Sort."""
    plan = _plan(relational.q10_returned_items(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan


def test_q19_part_filter_pushed_to_scan(spark):
    """The brand disjunction's part-side conjuncts must reach the part
    scan as an In filter so the broadcast side shrinks pre-join."""
    plan = _plan(relational.q19_discounted_revenue(spark, SF_SMALL))
    assert re.search(r"PushedFilters: \[[^\]]*In\(p_brand", plan), plan[:3000]


def test_behavioral_no_cartesian_and_anomaly_preaggregates(spark):
    from aws_etl_dados_publicos_cnpj_spark.operators import behavioral

    for name in ("funnel_events", "retention_cohorts_events", "volume_anomaly_events"):
        plan = _plan(behavioral.QUERIES[name](spark, SF_SMALL))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # anomaly: the window runs over the (type, hour) AGGREGATE — the
    # plan must place HashAggregate below the Window operator
    plan = _plan(behavioral.QUERIES["volume_anomaly_events"](spark, SF_SMALL))
    assert plan.index("Window") < plan.index("HashAggregate"), plan[:2000]


def test_pq_encode_is_map_only_and_prunes_scan(spark):
    """PQ encoding must be a pure scan→project pipeline: no Exchange, no
    UDF, and the embeddings scan reads only (vec_id, embedding)."""
    from aws_etl_dados_publicos_cnpj_spark.operators import similarity

    plan = _plan(similarity.QUERIES["pq_encode_embeddings"](spark, SF_SMALL))
    assert "Exchange" not in plan, plan[:2000]
    got = set()
    for match in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        got |= {c.split(":")[0] for c in match.group(1).split(",") if c}
    assert got == {"vec_id", "embedding"}


def test_ann_pq_corpus_read_map_only(spark):
    """ADC scoring streams the corpus once through mapInPandas — no
    joins at all; the only Exchange is the (batches × probes × k)-row
    top-k window shuffle, independent of corpus size."""
    from aws_etl_dados_publicos_cnpj_spark.operators import similarity

    plan = _plan(similarity.QUERIES["ann_pq_topk"](spark, SF_SMALL))
    assert "Join" not in plan, plan[:2000]
    assert plan.count("Exchange hashpartitioning") == 1


def test_prefix_filter_jaccard_no_cartesian(spark):
    """The prefix-filter join must stay an equi-join on prefix shingles
    — never a cross product — and verification must be candidate-keyed."""
    from aws_etl_dados_publicos_cnpj_spark.operators import dedup

    plan = _plan(dedup.prefix_filter_jaccard_docs(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_moving_window_single_sort_exchange(spark):
    """The RANGE-frame query must be one hash exchange + one sort on
    (custkey, day) — no self-join, no extra exchanges."""
    plan = _plan(relational.QUERIES["moving_window_orders"](spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "Join" not in plan


def test_scrub_repeated_ngrams_no_cartesian(spark):
    from aws_etl_dados_publicos_cnpj_spark.operators import text

    plan = _plan(text.QUERIES["scrub_repeated_ngrams_docs"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_no_row_python_or_cartesian_anywhere(spark):
    """Blanket guard over the ENTIRE registry: no query may plan a
    row-at-a-time Python eval (BatchEvalPython) or a cartesian product.
    Arrow paths (ArrowEvalPython/MapInPandas/FlatMapGroupsInPandas) are
    the only sanctioned Python surfaces."""
    import __spark_entry__ as entrymod

    offenders = {}
    for name, fn in entrymod.queries().items():
        plan = _plan(fn(spark, SF_SMALL))
        hits = [
            m
            for m in ("BatchEvalPython", "CartesianProduct")
            if m in plan
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, offenders


def test_quality_buckets_scores_once(spark):
    """The unigram-NLL scoring subtree feeds both the boundary
    computation and the assignment join; the lazy localCheckpoint must
    keep the plan at ≤4 exchanges (it was 9 when the subtree executed
    three times — r4 verdict finding #1)."""
    from aws_etl_dados_publicos_cnpj_spark.operators import text

    plan = _plan(text.QUERIES["quality_buckets_docs"](spark, SF_SMALL))
    assert plan.count("Exchange") <= 4, plan[:3000]


def test_q17_aggregates_only_matched_parts(spark):
    """The per-part aggregate must sit ABOVE a broadcast semi-join on
    the Brand#1 part keys — aggregating every part shuffles ~25x the
    needed groups (r4 verdict finding #2)."""
    plan = _plan(relational.q17_small_quantity_revenue(spark, SF_SMALL))
    # the broadcast semi-join on partkey exists, and sits below (later
    # in toString than) the first per-part HashAggregate (r5 advice:
    # assert the positional relationship, not just membership)
    semi = plan.find("LeftSemi")
    first_agg = plan.find("HashAggregate")
    assert semi != -1 and first_agg != -1 and semi > first_agg, plan[:3000]
    assert "BroadcastHashJoin [l_partkey" in plan, plan[:3000]


@pytest.mark.parametrize(
    "name,max_hashpart",
    [
        ("q02_min_cost_supplier", 2),  # r6: window min replaced the self-join
        ("q11_important_stock", 2),
        ("q12_shipping_delay_priority", 1),
        ("q20_promotion_candidates", 2),
        ("q21_waiting_orders", 3),
    ],
)
def test_tpch_r5_additions_exchange_counts_pinned(spark, name, max_hashpart):
    """Pin the shuffle-exchange count of the round-5 TPC-H completions
    (r5 verdict item #7): a future edit that adds a hash exchange to
    any of these fails fast. Bounds are the measured-at-landing counts;
    <= so a genuine improvement doesn't break the pin."""
    plan = _plan(relational.QUERIES[name](spark, SF_SMALL))
    n = plan.count("Exchange hashpartitioning")
    assert n <= max_hashpart, f"{name}: {n} hash exchanges (pin {max_hashpart})\n" + plan[:3000]
    assert "CartesianProduct" not in plan


def test_q15_checkpointed_form_pinned(spark):
    """q15's r6 rewrite: the supplier-revenue aggregate is lazily
    localCheckpointed so lineitem is scanned ONCE and both consumers
    (scalar max + equality join-back) read the checkpoint. Pin the
    visible (above-checkpoint) shape: exactly 2 `Scan ExistingRDD`
    consumers of the SAME checkpoint, zero hash exchanges, both joins
    broadcast — a future edit that drops the checkpoint re-executes
    the revenue subtree twice and changes all three counts (r6
    verdict item #5)."""
    plan = _plan(relational.QUERIES["q15_top_supplier"](spark, SF_SMALL))
    assert plan.count("Scan ExistingRDD") == 2, plan[:3000]
    assert plan.count("Exchange hashpartitioning") == 0, plan[:3000]
    assert plan.count("BroadcastHashJoin") == 2, plan[:3000]


def test_dq_suite_scan_counts_pinned(spark):
    """The DQ suite's single-scan shapes, pinned on the pre-AQE
    physical plan (executedPlan duplicates scans in the adaptive
    string): orders appears exactly 3x (row rules / uniqueness / FK
    probe — once per component, never twice per rule like the eager
    r5 fk_check), customer exactly once (r6 verdict item #5)."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["dq_orders_checks"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    orders = len(re.findall(r"Scan parquet[^\n]*orders", plan))
    customer = len(re.findall(r"Scan parquet[^\n]*customer", plan))
    assert orders == 3, f"orders scanned {orders}x\n" + plan[:3000]
    assert customer == 1, f"customer scanned {customer}x\n" + plan[:3000]


def test_chunk_documents_is_map_only(spark):
    """Chunking must be scan→project→generate with ZERO exchanges —
    a 100 TB corpus chunks at scan speed."""
    from aws_etl_dados_publicos_cnpj_spark.operators import corpus

    plan = _plan(corpus.QUERIES["chunk_documents_docs"](spark, SF_SMALL))
    assert "Exchange" not in plan, plan[:2000]


def test_domain_cap_single_keyed_exchange(spark):
    """Quota capping is one keyed window — exactly one hash exchange,
    no global sort."""
    from aws_etl_dados_publicos_cnpj_spark.operators import corpus

    plan = _plan(corpus.QUERIES["domain_cap_sample_docs"](spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "Exchange rangepartitioning" not in plan


def test_bloom_probe_side_joins_are_broadcast(spark):
    """The corpus side of the Bloom probe must see only broadcast
    joins (k semi-joins + the exact-verify join) — no shuffle of the
    corpus shingle table by position or shingle."""
    from aws_etl_dados_publicos_cnpj_spark.operators import corpus

    plan = _plan(corpus.QUERIES["bloom_decontaminate_docs"](spark, SF_SMALL))
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_q02_cost_agg_behind_semi_joins(spark):
    """q02's per-(part,supplier) aggregate must sit above the two
    broadcast semi-joins so only qualifying lineitems aggregate."""
    plan = _plan(relational.q02_min_cost_supplier(spark, SF_SMALL))
    assert plan.count("LeftSemi") >= 2, plan[:2000]
    first_agg = plan.find("HashAggregate")
    assert "LeftSemi" in plan[first_agg:], plan[:2000]
