"""[EXT] Corpus-management operators for training-data pipelines
(BASELINE.json north star; SURVEY.md §2.3): accounting, deterministic
stratified sampling, and reproducible train/val/test splits.

Sampling and splitting key off a CONTENT hash (md5, the engine's
DuckDB-reproducible 60-bit word-hash trick — see ``dedup.word_hash60``)
rather than ``rand()``: re-runs, retries, and engine swaps all select
the same rows, which is what makes a 100 TB data mix auditable. Both
are pure map-side filters — zero shuffle; the accounting rollup is one
partial-agg shuffle on (lang, source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load_table
from .dedup import shingles, word_hash60

# Per-language keep-rates (percent): the classic pretraining rebalance —
# downsample the dominant language, keep the tail.
SAMPLE_RATES = {"en": 50, "de": 80, "es": 80, "fr": 80, "zh": 30}
DEFAULT_RATE = 100


def content_bucket(text_col: str = "text", buckets: int = 100):
    """Deterministic [0, buckets) bucket from the md5 content hash."""
    return F.pmod(word_hash60(F.col(text_col)), F.lit(buckets))


def corpus_stats(df: DataFrame) -> DataFrame:
    """Corpus accounting per (lang, source): document count, characters,
    whitespace tokens, and mean document length."""
    toks = F.size(F.split(F.col("text"), " "))
    return (
        df.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.sum(toks).alias("total_tokens"),
            F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        )
    )


def stratified_sample(df: DataFrame, rates: dict[str, int] | None = None) -> DataFrame:
    """Keep a per-language fraction of documents, selected by content
    hash: doc survives iff bucket(text) < rate[lang]. Deterministic and
    engine-reproducible — the same corpus always yields the same
    sample."""
    rates = rates or SAMPLE_RATES
    rate = F.lit(DEFAULT_RATE)
    for lang, r in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return df.withColumn("__b", content_bucket()).filter(F.col("__b") < rate).drop("__b")


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag every training document that
    shares at least one word ``n``-gram with any benchmark document
    (the standard eval-leakage guard before pretraining).

    Scale shape: the benchmark side is tiny relative to the corpus
    (MBs vs 100 TB), so its DISTINCT shingle set is **broadcast** and
    the corpus side is a map-side hash join — the training corpus is
    scanned once and never shuffled; only the per-doc hit counts
    (bounded by flagged docs) aggregate.

    Output: (id_col, n_hit_shingles) for contaminated docs only.
    """
    t_sh = shingles(train, text_col, id_col, n)
    b_sh = shingles(benchmark, text_col, id_col, n).select("shingle").distinct()
    return (
        t_sh.join(F.broadcast(b_sh), "shingle")
        # shingle_array is distinct per doc, so count(*) == distinct hits
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_shingles"))
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 256,
    groups: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing for training batches: concatenate documents in a
    deterministic order and chunk the stream into ``budget``-token
    sequences; a document's ``seq_id`` is the chunk holding its first
    token (GPT-style boundary-agnostic concat packing).

    Scale shape: a single global cumsum window would serialize the
    corpus through one task, so packing runs inside ``groups``
    independent content-hash groups — each window sorts only
    corpus/groups rows, and parallelism scales with ``groups`` (set it
    to a multiple of the cluster's task slots at 100 TB). Ordering is
    (pack_group, doc_id): reruns and engine swaps produce identical
    packs.
    """
    from pyspark.sql import Window

    toks = F.greatest(F.size(F.split(F.col(text_col), " ")), F.lit(1))
    w = Window.partitionBy("pack_group").orderBy(id_col)
    out = (
        df.withColumn("pack_group", F.pmod(word_hash60(F.col(text_col)), F.lit(groups)))
        .withColumn("n_tokens", toks.cast("long"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        # first-token offset DIV budget — integer arithmetic end to end
        .withColumn(
            "seq_id", F.expr(f"(cum_tokens - n_tokens) DIV {budget}").cast("long")
        )
    )
    return out.select(id_col, "pack_group", "n_tokens", "seq_id")


# Per-language replication factors for domain mixing: upsample the
# under-represented tail, keep the head at one epoch.
MIX_WEIGHTS = {"zh": 3, "fr": 2, "de": 2}
DEFAULT_WEIGHT = 1


def shuffle_order(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 7,
    partitions: int = 32,
) -> DataFrame:
    """Deterministic global training order: rank documents by a seeded
    content hash — the corpus-shuffle step before sequence packing, but
    reproducible across reruns and engines (no ``rand()``).

    A bare ``row_number() OVER (ORDER BY …)`` would drag the corpus
    through ONE task, so the global rank is two-phase: range-partition
    on the hash (distributed sort, Spark samples split points), rank
    within each partition, then add the broadcast cumulative offset of
    the preceding partitions. The rank is a pure function of
    (hash, id) order, so it's identical whatever boundaries the range
    sampler picks."""
    from pyspark.sql import Window

    h = word_hash60(F.concat(F.lit(str(seed) + ":"), F.col(text_col)))
    ranked = (
        df.withColumn("__h", h)
        .repartitionByRange(partitions, "__h", id_col)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("__pid").orderBy("__h", id_col)
            ),
        )
        # pin ONE materialization: the offsets aggregate and the final
        # join must see identical range-partition boundaries and
        # spark_partition_id values. Without this that only holds via
        # Spark's ReuseExchange rule — if reuse misses, offsets from a
        # differently-sampled partitioning silently corrupt the ranks.
        # localCheckpoint (not cache) so storage is freed on GC.
        .localCheckpoint(eager=False)
    )
    offsets = (
        ranked.groupBy("__pid")
        .agg(F.count("*").alias("__n"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__off")
    )
    return (
        ranked.join(F.broadcast(offsets), "__pid")
        .select(id_col, (F.col("__rk") + F.col("__off")).alias("shuffle_rank"))
    )


def domain_mix(df: DataFrame, weights: dict[str, int] | None = None) -> DataFrame:
    """Weighted domain mixing: replicate each document ``weight(lang)``
    times, tagging copies with an epoch index — the classic pretraining
    mix shaping (e.g. 3 epochs of the low-resource tail, 1 of the head).

    Pure map-side ``explode(sequence(...))`` on the scan: zero shuffle,
    output volume = Σ weights — the replication happens where the data
    lives, never through the driver."""
    weights = weights or MIX_WEIGHTS
    wcol = F.lit(DEFAULT_WEIGHT)
    for lang, k in sorted(weights.items()):
        wcol = F.when(F.col("lang") == lang, F.lit(k)).otherwise(wcol)
    return df.select(
        "doc_id", "lang", F.explode(F.sequence(F.lit(1), wcol)).alias("epoch_copy")
    )


def train_val_test_split(df: DataFrame, val_pct: int = 10, test_pct: int = 10) -> DataFrame:
    """Assign each document to train/val/test by content-hash bucket —
    reproducible splits with no shuffle and no stored split table."""
    b = content_bucket()
    split = (
        F.when(b < 100 - val_pct - test_pct, "train")
        .when(b < 100 - test_pct, "val")
        .otherwise("test")
    )
    return df.withColumn("split", split)


# --- driver-contract query forms -------------------------------------------


def corpus_stats_by_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_stats(load_table(spark, sf_dir, "documents"))


ORACLE_CORPUS_STATS = """
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       round(avg(length(text)), 4) AS avg_chars
FROM documents GROUP BY lang, source
"""

# The md5 content bucket, reproduced in SQL (same 15-hex-char trick as
# the SimHash oracle).
_BUCKET_SQL = "CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 100"


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = stratified_sample(load_table(spark, sf_dir, "documents"))
    return out.select("doc_id", "lang", "source")


ORACLE_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_BUCKET_SQL} < (CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 80
                                 WHEN 'es' THEN 80 WHEN 'fr' THEN 80
                                 WHEN 'zh' THEN 30 ELSE 100 END)
"""


def train_val_test_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = train_val_test_split(load_table(spark, sf_dir, "documents"))
    return out.select("doc_id", "split")


def shuffle_order_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shuffle_order(load_table(spark, sf_dir, "documents"))


ORACLE_SHUFFLE_ORDER = """
SELECT doc_id,
       row_number() OVER (
         ORDER BY CAST('0x' || substr(md5('7:' || text), 1, 15) AS BIGINT), doc_id
       ) AS shuffle_rank
FROM documents
"""


def domain_mix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain_mix(load_table(spark, sf_dir, "documents"))


ORACLE_DOMAIN_MIX = """
SELECT doc_id, lang, u.epoch_copy
FROM documents, LATERAL (
  SELECT unnest(generate_series(1,
    CASE lang WHEN 'de' THEN 2 WHEN 'fr' THEN 2 WHEN 'zh' THEN 3 ELSE 1 END)) AS epoch_copy
) u
"""


def decontaminate_train_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontaminate the content-hash train split against the test
    split (the held-out 10% standing in for an eval benchmark)."""
    docs = train_val_test_split(load_table(spark, sf_dir, "documents"))
    train = docs.filter(F.col("split") == "train")
    benchmark = docs.filter(F.col("split") == "test")
    return decontaminate(train, benchmark)


ORACLE_DECONTAMINATE = f"""
WITH split AS (
  SELECT doc_id, text, {_BUCKET_SQL} AS b FROM documents
),
tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM split WHERE b < 80),
bw AS (SELECT string_split(text, ' ') AS w FROM split WHERE b >= 90),
tsh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(w) >= 5 THEN array_to_string(w[i.i:i.i+4], ' ')
              ELSE array_to_string(w, ' ') END AS shingle
  FROM tw, LATERAL (
    SELECT unnest(generate_series(1, greatest(len(w) - 4, 1))) AS i
  ) i
),
bsh AS (
  SELECT DISTINCT
         CASE WHEN len(w) >= 5 THEN array_to_string(w[i.i:i.i+4], ' ')
              ELSE array_to_string(w, ' ') END AS shingle
  FROM bw, LATERAL (
    SELECT unnest(generate_series(1, greatest(len(w) - 4, 1))) AS i
  ) i
)
SELECT doc_id, count(*) AS n_hit_shingles
FROM tsh JOIN bsh USING (shingle)
GROUP BY doc_id
"""


def pack_sequences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(load_table(spark, sf_dir, "documents"))


ORACLE_PACK = """
WITH t AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 64 AS pack_group,
         greatest(len(string_split(text, ' ')), 1) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, pack_group, n_tokens,
         sum(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id) AS cum
  FROM t
)
SELECT doc_id, pack_group, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((cum - n_tokens) // 256 AS BIGINT) AS seq_id
FROM c
"""


ORACLE_SPLIT = f"""
SELECT doc_id,
       CASE WHEN {_BUCKET_SQL} < 80 THEN 'train'
            WHEN {_BUCKET_SQL} < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def reservoir_sample(
    df: DataFrame,
    n_per_group: int = 20,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size per-group sample (the eval-set / human-review cut):
    exactly ``n_per_group`` docs per group, chosen by md5-content-hash
    order — deterministic across runs AND engines (unlike
    ``TABLESAMPLE`` / reservoir randomness), and stable under corpus
    append ONLY where new docs hash above the cut, exactly like a
    true reservoir's inclusion property.

    Scale shape: one hash-partition shuffle on the group key; the
    per-group window is a partial top-k problem, so with a rank filter
    this small Spark pushes a WindowGroupLimit (per-partition top-k
    before the exchange) — never a global sort."""
    w = Window.partitionBy(group_col).orderBy(F.md5(F.col(text_col)), F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_group)
        .select(id_col, group_col, "sample_rank")
    )


def reservoir_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return reservoir_sample(load_table(spark, sf_dir, "documents"))


ORACLE_RESERVOIR = """
SELECT doc_id, lang, sample_rank FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id)
             AS sample_rank
  FROM documents)
WHERE sample_rank <= 20
"""


def split_leakage(df: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Train/eval LEAKAGE audit: near-duplicate pairs that straddle the
    train/val/test boundary — the QA check every split needs, since a
    near-dup of a training doc sitting in test silently inflates eval.
    Composes the content-hash split with MinHash-grade exact Jaccard
    pairs (prefix-filtered, sub-quadratic); only pairs with different
    split labels survive."""
    from .dedup import prefix_filter_jaccard_pairs

    pairs = prefix_filter_jaccard_pairs(df, threshold=threshold)
    splits = train_val_test_split(df).select("doc_id", "split")
    sa = splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b", "jaccard")
    )


def split_leakage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_leakage(load_table(spark, sf_dir, "documents"))


def kl_lang_by_source(df: DataFrame) -> DataFrame:
    """Per-source distribution drift: KL(source's lang distribution ‖
    corpus lang distribution), the standard check that one ingest
    source isn't skewing the language mix. ONE corpus scan: the
    (source, lang) contingency table contains every marginal, so the
    per-source totals, corpus lang marginal, and grand total all
    re-aggregate the tiny checkpointed table instead of re-scanning
    the corpus (the r5 form scanned documents four times — pruned
    scans, but 4x the fact I/O at 100 TB; r6)."""
    src = (
        df.groupBy("source", "lang")
        .agg(F.count("*").alias("n_sl"))
        .localCheckpoint(eager=False)
    )
    src_tot = src.groupBy("source").agg(F.sum("n_sl").alias("n_s"))
    corpus = src.groupBy("lang").agg(F.sum("n_sl").alias("n_l"))
    total = src.agg(F.sum("n_sl").alias("n"))
    p = F.col("n_sl") / F.col("n_s")
    q = F.col("n_l") / F.col("n")
    return (
        src.join(src_tot, "source")
        .join(F.broadcast(corpus), "lang")
        .crossJoin(F.broadcast(total))
        .groupBy("source")
        .agg(F.round(F.sum(p * F.log(p / q)), 6).alias("kl_lang"))
    )


def kl_lang_by_source_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kl_lang_by_source(load_table(spark, sf_dir, "documents"))


def _oracle_split_leakage() -> str:
    from .dedup import _ORACLE_EXACT_JACCARD

    return f"""
WITH jac AS MATERIALIZED ({_ORACLE_EXACT_JACCARD}),
sp AS (
  SELECT doc_id, CASE WHEN {_BUCKET_SQL} < 80 THEN 'train'
                      WHEN {_BUCKET_SQL} < 90 THEN 'val'
                      ELSE 'test' END AS split
  FROM documents
)
SELECT doc_a, doc_b, a.split AS split_a, b.split AS split_b, jaccard
FROM jac JOIN sp a ON doc_a = a.doc_id JOIN sp b ON doc_b = b.doc_id
WHERE a.split <> b.split
"""


ORACLE_KL = """
WITH src AS (SELECT source, lang, count(*) AS n_sl FROM documents GROUP BY 1, 2),
st AS (SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
c AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
t AS (SELECT count(*) AS n FROM documents)
SELECT source,
       round(sum((n_sl * 1.0 / n_s)
                 * ln((n_sl * 1.0 / n_s) / (n_l * 1.0 / n))), 6) AS kl_lang
FROM src JOIN st USING (source) JOIN c USING (lang), t
GROUP BY source
"""


def chunk_documents(
    df: DataFrame,
    chunk: int = 50,
    stride: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG-style sliding-window chunking: split each document into
    word-based chunks of ``chunk`` words every ``stride`` words
    (overlap = chunk − stride), keeping the shorter tail chunk.

    Scale shape: pure map-side — split, sequence-of-starts explode,
    slice, join — no shuffle at all; each input partition emits its own
    chunks, so a 100 TB corpus chunks at scan speed and the output can
    be written partition-aligned with the input."""
    words = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("ws") - 1, F.lit(0)), F.lit(stride)
    )
    return (
        df.select(id_col, words.alias("ws"))
        .select(id_col, "ws", F.explode(starts).alias("start"))
        .select(
            id_col,
            F.col("start").cast("long").alias("chunk_start"),
            F.array_join(F.slice("ws", F.col("start") + 1, chunk), " ").alias(
                "chunk_text"
            ),
            F.least(F.size("ws") - F.col("start"), F.lit(chunk))
            .cast("long")
            .alias("n_words"),
        )
    )


def chunk_documents_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(load_table(spark, sf_dir, "documents"))


ORACLE_CHUNK = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
s AS (
  SELECT doc_id, ws,
         unnest(generate_series(0, greatest(len(ws) - 1, 0), 40)) AS start
  FROM w
)
SELECT doc_id, CAST(start AS BIGINT) AS chunk_start,
       array_to_string(ws[start + 1 : start + 50], ' ') AS chunk_text,
       CAST(least(len(ws) - start, 50) AS BIGINT) AS n_words
FROM s
"""


def domain_cap_sample(
    df: DataFrame, cap: int = 200, key: str = "source", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain quota sampling: keep at most ``cap`` documents per
    ``key`` group (the standard web-corpus guard against a single host
    dominating the mix), deterministically — the ``cap`` LOWEST doc ids
    win, so reruns and engine swaps keep identical rows.

    Scale shape: one hash-partition window per key; each task ranks
    only its own keys' rows. Skewed hosts cap out early, and because
    row_number needs no global order the shuffle carries (key, id)
    pairs only after column pruning."""
    w = Window.partitionBy(key).orderBy(id_col)
    return (
        df.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= cap)
        .select(id_col, key, "rn")
    )


def domain_cap_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain_cap_sample(load_table(spark, sf_dir, "documents"))


ORACLE_DOMAIN_CAP = """
SELECT doc_id, source, rn
FROM (SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
                  AS BIGINT) AS rn
      FROM documents)
WHERE rn <= 200
"""


def bloom_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decontamination via a BROADCAST partitioned Bloom filter over
    the benchmark shingle set — the 100 TB shape where even the
    benchmark's distinct-shingle table is awkward to hash-join: the
    corpus probes k tiny per-hash POSITION sets via k successive
    broadcast SEMI-joins (each one map-side, zero shuffle), and only
    all-k-positive shingles continue to exact verification. The
    position sets are ``pmod(xxhash64(shingle, seed_k), m)`` distinct
    values — ≤ m ints each, a few MB broadcast like a bitset would be.
    (Spark's internal ``bloom_filter_agg`` is not SQL-registered, so
    the filter is expressed relationally; the false-positive behavior
    is that of a blocked Bloom filter with k=3, m=400k bits/hash.)

    SELF-CHECKING output (sketch op, same contract as
    ``approx_aggregates``): rows are the EXACTLY-contaminated docs
    (shared n-gram with the benchmark, recomputed in-query) and
    ``bloom_hit`` asserts the filter's no-false-negative guarantee —
    any lost insert flips a value and fails the driver's hash compare.
    False positives only cost extra verification work; they never
    appear in the output."""
    k, m = 3, 400_000
    # b_sh (pinned, benchmark-sized) feeds the k position sets AND the
    # exact-verify side; t_sh feeds the k-stage probe chain AND the
    # exact-verify join.
    # t_sh is NOT pinned (r14, VERDICT r13 item 3): the exploded
    # (id, shingle) string relation is the largest intermediate in the
    # engine (~shingles-per-doc × corpus bytes), and its two consumers
    # (probe chain, exact verify) are pure map passes off the scan —
    # no exchange, so nothing for ReusedExchange to share either way.
    # A 10-round fresh-JVM pin-vs-recompute grid at sf0.1 measured the
    # two forms box-equal (mins 1.91–2.17 s both ways), so the r6
    # doctrine decides: corpus-sized subtrees stay
    # recompute-on-reference — two pruned scans beat materializing a
    # 10×-corpus relation to non-fault-tolerant executor storage at
    # 100 TB (SCALE.md "r14 — bloom pin grid").
    t_sh = shingles(train, text_col, id_col, n)
    b_sh = (
        shingles(benchmark, text_col, id_col, n)
        .select("shingle")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # all k position sets come from ONE explode + distinct over b_sh
    # (pinned — the k broadcast builds each reference it) instead of k
    # separate distinct aggregations, each its own exchange + two agg
    # phases over the benchmark shingles (guide §2.4 shared exchanges)
    pos_all = (
        b_sh.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            F.pmod(
                                F.xxhash64("shingle", F.lit(i)), F.lit(m)
                            ).alias("p"),
                        )
                        for i in range(k)
                    ]
                )
            ).alias("s")
        )
        .select(F.col("s.i").alias("i"), F.col("s.p").alias("p"))
        .distinct()
        # pinned — and the pin is load-bearing: r14 ran the unpinned
        # form and the EXECUTED plan got ZERO ReusedExchange (the k=3
        # broadcast builds each recompute the explode+distinct: 4→10
        # hash exchanges, 8→20 HashAggregates), so the r6 "don't pin
        # what ReusedExchange shares" lesson does not apply; the
        # pinned relation is ≤ k·m ints regardless of corpus size
        .localCheckpoint(eager=False)
    )
    probe = t_sh
    for i in range(k):
        pos = pos_all.filter(F.col("i") == i).select("p")
        probe = (
            probe.withColumn(
                "p", F.pmod(F.xxhash64("shingle", F.lit(i)), F.lit(m))
            )
            .join(F.broadcast(pos), "p", "left_semi")
            .drop("p")
        )
    bloom_pos = probe.select(id_col).distinct().withColumn("bloom_hit", F.lit(True))
    exact = t_sh.join(F.broadcast(b_sh), "shingle").select(id_col).distinct()
    return exact.join(bloom_pos, id_col, "left").select(
        id_col, F.coalesce("bloom_hit", F.lit(False)).alias("bloom_hit")
    )


def bloom_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-decontaminate the content-hash train split against the
    test split (same splits as ``decontaminate_train_docs``)."""
    docs = train_val_test_split(load_table(spark, sf_dir, "documents"))
    train = docs.filter(F.col("split") == "train")
    benchmark = docs.filter(F.col("split") == "test")
    return bloom_decontaminate(train, benchmark)


def _oracle_bloom_decontaminate() -> str:
    return f"""
WITH hits AS ({ORACLE_DECONTAMINATE})
SELECT doc_id, TRUE AS bloom_hit FROM hits
"""


def weighted_sample(
    df: DataFrame, pivot: int = 200, scale: int = 1_000_000
) -> DataFrame:
    """Deterministic WEIGHTED downsampling: keep each document with
    probability n_chars/(n_chars+pivot) — longer (higher-value) docs
    survive more often, the smooth quality-weighted cut pretraining
    mixes use instead of a hard length filter. The coin is the md5
    content hash (engine-reproducible, like every sampler here), and
    the comparison is cross-multiplied into exact integer arithmetic:
    keep ⇔ h·(n+pivot) < scale·n with h = hash mod scale — no float
    probability on a knife edge. Pure map-side filter, zero shuffle."""
    h = F.pmod(word_hash60(F.col("text")), F.lit(scale))
    return df.filter(
        h * (F.col("n_chars") + F.lit(pivot)) < F.lit(scale) * F.col("n_chars")
    ).select("doc_id", "lang", "source", "n_chars")


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_sample(load_table(spark, sf_dir, "documents"))


ORACLE_WEIGHTED_SAMPLE = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE (CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 1000000)
      * (n_chars + 200) < 1000000 * n_chars
"""


QUERIES = {
    "corpus_stats_by_lang_source": corpus_stats_by_lang_source,
    "weighted_sample_docs": weighted_sample_docs,
    "chunk_documents_docs": chunk_documents_docs,
    "domain_cap_sample_docs": domain_cap_sample_docs,
    "bloom_decontaminate_docs": bloom_decontaminate_docs,
    "reservoir_sample_docs": reservoir_sample_docs,
    "split_leakage_docs": split_leakage_docs,
    "kl_lang_by_source_docs": kl_lang_by_source_docs,
    "stratified_sample_docs": stratified_sample_docs,
    "train_val_test_split_docs": train_val_test_split_docs,
    "decontaminate_train_docs": decontaminate_train_docs,
    "pack_sequences_docs": pack_sequences_docs,
    "shuffle_order_docs": shuffle_order_docs,
    "domain_mix_docs": domain_mix_docs,
}

ORACLES = {
    "weighted_sample_docs": ORACLE_WEIGHTED_SAMPLE,
    "chunk_documents_docs": ORACLE_CHUNK,
    "domain_cap_sample_docs": ORACLE_DOMAIN_CAP,
    "bloom_decontaminate_docs": _oracle_bloom_decontaminate(),
    "reservoir_sample_docs": ORACLE_RESERVOIR,
    "split_leakage_docs": _oracle_split_leakage(),
    "kl_lang_by_source_docs": ORACLE_KL,
    "shuffle_order_docs": ORACLE_SHUFFLE_ORDER,
    "domain_mix_docs": ORACLE_DOMAIN_MIX,
    "corpus_stats_by_lang_source": ORACLE_CORPUS_STATS,
    "stratified_sample_docs": ORACLE_STRATIFIED_SAMPLE,
    "train_val_test_split_docs": ORACLE_SPLIT,
    "decontaminate_train_docs": ORACLE_DECONTAMINATE,
    "pack_sequences_docs": ORACLE_PACK,
}
