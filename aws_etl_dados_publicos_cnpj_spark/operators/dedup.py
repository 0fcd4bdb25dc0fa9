"""[EXT] Deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash (BASELINE.json north star; SURVEY.md §2.3).

Scale design (the 100 TB story):

- **exact**: hash-groupBy on the dedup key — one shuffle, map-side
  partial agg.
- **n-gram Jaccard**: exact pairwise similarity via a shingle-explode
  self-join. Correct but quadratic in the worst case — the small-data
  oracle baseline.
- **MinHash+LSH**: the scale path. Shingles → K=96 deterministic
  min-hashes → B=24 bands of R=4 → candidates join only within equal
  band buckets (shuffle on band hash, no cross join anywhere) → exact
  Jaccard verification on the candidate set only. At threshold 0.8 the
  miss probability per true pair is (1-0.8^4)^24 ≈ 3e-6, so the output
  equals the exact operator's with near-certainty while scaling
  linearly in corpus size (band-bucket skew is handled by AQE skew
  splitting; a hot bucket can additionally be salted by prefix).
- **SimHash**: 60-bit signed-projection signature per doc (md5-derived
  word hashes, integer bit-packing); near-pairs via 4-block pigeonhole
  Hamming search with exact recall at distance ≤ 3. Signature
  computation is a single explode + groupBy (one shuffle).

Everything is built from JVM-side expressions (xxhash64, higher-order
array functions) — no Python UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import load_table

NUM_MINHASH = 96
LSH_BANDS = 24
LSH_ROWS = 4  # NUM_MINHASH = LSH_BANDS * LSH_ROWS
SHINGLE_SIZE = 3
SIMHASH_BITS = 60  # 15 hex chars of md5 → fits a signed long exactly


# Matches shuffle-introducing node NAMES at the start of a plan-tree
# line (after the `+- : |` tree art), never inside rendered
# expressions — a column literally named "Join" or a string literal
# containing "Sort" appears mid-line inside Project/Filter brackets
# and must not trip the guard (r7 advice: raw substring containment
# made the probe data/schema-dependent).
_SHUFFLE_NODE_RE = re.compile(
    r"^[\s+:|-]*(?:Join|Aggregate|Repartition\w*|Rebalance\w*|Window|Sort"
    r"|Deduplicate\w*|GlobalLimit|MapInPandas|FlatMap\w*)\b",
    re.MULTILINE,
)


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition before heavy per-row work — ONLY when the plan is
    scan-shaped AND under-splits. A small table read from one parquet
    file scans as ONE partition, serializing the shingle/hash/codec
    stage on a single core; there the round-robin shuffle buys
    core-count parallelism for the price of one small exchange. On a
    real multi-file 100 TB table the scan already yields >= core-count
    splits and this returns the input UNCHANGED — an unconditional
    repartition would re-shuffle the whole corpus for nothing.

    Probe safety (r7 review finding): ``df.rdd`` on a plan containing
    an exchange EXECUTES that exchange eagerly under AQE — a job at
    query-construction time, run again at action time. So the
    partition probe only runs on plans whose optimized LOGICAL plan
    (analysis only, never a job) is shuffle-free; anything downstream
    of a join/aggregate/window already runs at
    ``spark.sql.shuffle.partitions`` and is returned unchanged.

    Known limitation: the probe sees partition COUNT, not balance — a
    caller holding an already-wide-but-skewed frame should repartition
    explicitly (scan splits, the only frames this probes, are
    size-balanced by construction)."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    if _SHUFFLE_NODE_RE.search(plan):
        return df
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def _base_pin(df: DataFrame) -> DataFrame:
    """Pin the per-doc (id, sh_set) base relation that feeds a
    signature/ranking pass AND both verify sides (three consumers).

    r14 measured the alternatives (VERDICT r13 item 2) with 4
    alternating fresh-JVM rounds over the minhash/clusters/prefix/
    containment family at sf0.1: recompute-per-consumer 11.75 s total,
    persist(DISK_ONLY) 9.88 s, localCheckpoint 9.58 s — the r6
    "corpus-sized subtrees stay recompute-on-reference" doctrine does
    not apply because shingle_array itself (not the scan) is the
    expensive part and three consumers pay it. DISK_ONLY is
    speed-equal and lineage-recoverable, but CacheManager entries
    outlive the query unless every caller unpersists (long driver
    sessions leak); localCheckpoint blocks are dropped by the
    ContextCleaner with the result DF. 100 TB note: an executor loss
    mid-query kills a checkpointed run instead of recomputing lineage
    — a deployment that cannot afford the retry flips this one
    function to persist(StorageLevel.DISK_ONLY) at equal speed
    (SCALE.md "r14 — base-pin A/B/C")."""
    return df.localCheckpoint(eager=False)


def dedup_exact(df: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    """Exact dedup via hash-groupBy: one surviving (min id) row pointer
    per key group + the duplicate count."""
    return df.groupBy(*keys).agg(
        F.min(id_col).alias("keep_" + id_col),
        F.count("*").alias("n_copies"),
    )


def shingle_array(text_col: str = "text", n: int = SHINGLE_SIZE):
    """Column of distinct word n-gram shingles — a pure per-row
    expression (no explode, no shuffle).

    Built as an (n-1)-fold ``zip_with`` of shifted word arrays: n-1
    whole-array slices per row plus one cheap concat per element —
    measured 3.2× faster than the ``transform(sequence, slice+concat_ws)``
    form, whose interpreted lambda allocates a slice array PER element.
    Same split-on-space semantics, so the DuckDB oracles are unchanged."""
    words = F.split(F.col(text_col), " ")
    m = F.greatest(F.size(words) - (n - 1), F.lit(1))
    acc = F.slice(words, 1, m)
    for k in range(2, n + 1):
        acc = F.zip_with(
            acc, F.slice(words, k, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    sh = F.when(F.size(words) >= n, acc).otherwise(F.array(F.concat_ws(" ", words)))
    return F.array_distinct(sh)


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = SHINGLE_SIZE) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    return df.select(
        F.col(id_col), F.explode(shingle_array(text_col, n)).alias("shingle")
    )


def jaccard_pairs(
    sh: DataFrame, id_col: str = "doc_id", threshold: float = 0.8
) -> DataFrame:
    """Exact Jaccard over distinct-shingle sets: self-join on shingle →
    per-pair intersection counts → |A∩B| / (|A|+|B|-|A∩B|).

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    counts = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    ca = counts.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.join(F.broadcast(ca), "doc_a")
        .join(F.broadcast(cb), "doc_b")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id", k: int = NUM_MINHASH) -> DataFrame:
    """K deterministic min-hashes per doc: the shingle STRING is hashed
    once (``xxhash64(shingle)``) and the K family members derive from
    that 8-byte base (``xxhash64(i, base)``) — hashing a long K times
    is ~30% cheaper than re-hashing the string K times, with the same
    universal-family independence. Output: (id, sig array<long>).

    Implemented as K codegen'd min-aggregates over exploded shingle
    rows — partial (map-side) aggregation reduces the shuffle to one
    (docs × K) row set, so at 100 TB the network carries signatures,
    not shingles. (A per-row nested-lambda form was tried and is ~30×
    slower: higher-order functions are interpreted, not codegen'd.)"""
    hashed = sh.withColumn("__hb", F.xxhash64("shingle"))
    aggs = [F.expr(f"min(xxhash64({i}L, __hb))").alias(f"h{i}") for i in range(k)]
    with_sig = hashed.groupBy(id_col).agg(*aggs)
    return with_sig.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(k)]).alias("sig")
    )


def _xxh64_long(v, seed):
    """Vectorized numpy twin of Spark's ``XxHash64`` on a LongType
    input (XXH64 of the 8 little-endian bytes): hash = fmix(rotl(seed +
    P5 + 8 ^ rotl(v·P2, 31)·P1, 27)·P1 + P4). Bit-exactness vs the JVM
    expression is pinned by tests/test_ext_operators.py (signature
    equality across the exploded-agg and set-based paths). ``v`` and
    ``seed`` are uint64 arrays/scalars and broadcast together."""
    import numpy as np

    p1 = np.uint64(0x9E3779B185EBCA87)
    p2 = np.uint64(0xC2B2AE3D27D4EB4F)
    p3 = np.uint64(0x165667B19E3779F9)
    p4 = np.uint64(0x85EBCA77C2B2AE63)
    p5 = np.uint64(0x27D4EB2F165667C5)
    with np.errstate(over="ignore"):
        h = seed + p5 + np.uint64(8)
        k1 = v * p2
        k1 = (k1 << np.uint64(31)) | (k1 >> np.uint64(33))
        k1 = k1 * p1
        h = h ^ k1
        h = ((h << np.uint64(27)) | (h >> np.uint64(37))) * p1 + p4
        h = h ^ (h >> np.uint64(33))
        h = h * p2
        h = h ^ (h >> np.uint64(29))
        h = h * p3
        h = h ^ (h >> np.uint64(32))
    return h


def minhash_signatures_from_sets(
    base: DataFrame,
    id_col: str = "doc_id",
    set_col: str = "sh_set",
    k: int = NUM_MINHASH,
    passthrough: bool = False,
    chunk_elems: int = 100_000,
) -> DataFrame:
    """K min-hashes per doc straight from the per-doc shingle ARRAY —
    the map-side form of ``minhash_signatures`` (r13 optimization,
    guide §4.2): the shingle string is base-hashed ONCE in the JVM
    (one ``xxhash64`` per element through ``transform``), then the
    K-family derivation (``xxhash64(i, base)``) and the per-doc min
    run as one vectorized numpy pass inside ``mapInPandas`` —
    seeds[i] = xxh64(i, 42), H = xxh64(base, seeds), segmented min
    via ``minimum.reduceat``. Bit-identical signatures to the
    exploded-aggregation form (pinned by test), with NO explode and
    NO shuffle: at 100 TB the signature stage becomes embarrassingly
    parallel map work instead of a (docs × shingles) explode feeding
    a 96-slot partial-agg exchange.

    ``passthrough=True`` carries ``set_col`` through to the output
    (the persisted signature-table shape) — one pipeline instead of
    a sig⋈base re-join."""
    import numpy as np
    import pandas as pd

    id_type = base.schema[id_col].dataType
    cols = [F.col(id_col), F.expr(f"transform({set_col}, s -> xxhash64(s))").alias("__hbs")]
    if passthrough:
        cols.append(F.col(set_col))
    hashed = base.filter(F.size(set_col) > 0).select(*cols)

    out_fields = [
        T.StructField(id_col, id_type),
        T.StructField("sig", T.ArrayType(T.LongType())),
    ]
    if passthrough:
        out_fields.append(base.schema[set_col])
    out_schema = T.StructType(out_fields)

    # Sub-batch chunking (r14, guide §5): the (k × shingles) hash pass
    # allocates ~4 k·N·8 B of temporaries per call — unbounded by the
    # Arrow batch's ROW count when docs are long (10k rows × 15k
    # shingles × k=96 would be >100 GB). Splitting each batch into
    # doc-aligned groups of ≤ chunk_elems base hashes bounds the peak
    # at ~max(chunk_elems, longest single doc) × k × 8 B × 4 ≈ 256 MB,
    # and per-doc results are untouched (the reduceat segments are the
    # same) — bit-equality stays pinned by the existing twin test.
    def gen(batches):
        seeds = _xxh64_long(np.arange(k, dtype=np.uint64), np.uint64(42))[:, None]
        for pdf in batches:
            if not len(pdf):
                continue
            arrs = [np.asarray(a, dtype=np.int64) for a in pdf["__hbs"]]
            lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
            bounds = [0]  # doc-index boundaries of ≤chunk_elems groups
            acc = 0
            for di, ln in enumerate(lens):
                if acc and acc + ln > chunk_elems:
                    bounds.append(di)
                    acc = 0
                acc += ln
            bounds.append(len(arrs))
            sig_parts = []
            for g0, g1 in zip(bounds[:-1], bounds[1:]):
                flat = np.concatenate(arrs[g0:g1]).astype(np.uint64)
                h = _xxh64_long(flat[None, :], seeds).view(np.int64)
                offs = np.zeros(g1 - g0, dtype=np.int64)
                np.cumsum(lens[g0 : g1 - 1], out=offs[1:])
                sig_parts.append(np.minimum.reduceat(h, offs, axis=1))
            sig = np.concatenate(sig_parts, axis=1)  # (k, docs)
            out = {id_col: pdf[id_col], "sig": list(sig.T)}
            if passthrough:
                out[set_col] = pdf[set_col]
            yield pd.DataFrame(out)

    return hashed.mapInPandas(gen, out_schema)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> DataFrame:
    """Band the signature and join docs sharing any band bucket.

    One explode (docs × bands) + one equi-join on (band, band_hash) —
    the join key space is large, so buckets stay small and the shuffle
    is balanced; no cross join. Band structs are unrolled statically
    (codegen'd slice+hash) rather than built with an interpreted
    ``transform`` lambda.

    The banded relation is localCheckpointed (lazy): the self-join
    references it twice, and when one side is planned as a broadcast
    the ReusedExchange rule cannot kick in — without the pin BOTH
    sides recompute the whole upstream signature pipeline (shingle
    explode + K min-agg shuffle, the r13 before-plan's duplicate
    Exchange 6/15 subtrees). The only caller feeds signatures computed
    from raw text (never a scan-backed table), so materializing
    (docs × bands) small rows once is strictly cheaper than computing
    signatures twice — at any scale (this is the banded projection of
    the signature table the incremental path persists anyway)."""
    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.slice(F.col("sig"), b * rows + 1, rows)).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    ).localCheckpoint(eager=False)
    a = banded.select(F.col(id_col).alias("doc_a"), "band", "bh")
    b = banded.select(F.col(id_col).alias("doc_b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs at `threshold` Jaccard via MinHash-LSH candidate
    generation + exact verification on candidates only.

    Plan shape (the 100 TB path): signatures map-side from the per-doc
    shingle arrays (``minhash_signatures_from_sets`` — no explode, no
    shuffle; r13); candidates via the band-bucket equi-join; exact
    Jaccard via ``array_intersect`` on just the candidate pairs —
    never on the full pair space."""
    # localCheckpoint (lazy), not cache(): same compute-once sharing across
    # the sigs/sa/sb branches, but storage is released by the ContextCleaner
    # when the result DF is dropped — CacheManager entries would pin
    # per-call storage for the life of a long driver session (50+ queries)
    base = _base_pin(
        spread(df).select(F.col(id_col), shingle_array(text_col).alias("sh_set"))
    )
    sigs = minhash_signatures_from_sets(base, id_col)
    candidates = lsh_candidate_pairs(sigs, id_col)
    sa = base.select(F.col(id_col).alias("doc_a"), F.col("sh_set").alias("sh_a"))
    sb = base.select(F.col(id_col).alias("doc_b"), F.col("sh_set").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signature_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Persistable (id, sig, sh_set) signature table for INCREMENTAL
    dedup: compute once per ingest batch, store next to the corpus, and
    future batches dedup against it without re-shingling history.

    r13: signatures come map-side from the shingle arrays with the
    set column passed through — one pipeline, no explode/shuffle and
    no sig⋈base re-join (bit-identical rows; column order preserved).
    The input is spread first (adaptive no-op when the scan already
    splits >= cores): the whole per-doc hash/min pass now rides the
    scan partitioning, and a small one-file table would otherwise run
    it on one or two cores — the r12 form was insulated because its
    heavy aggregation ran post-shuffle on full parallelism."""
    base = spread(df).select(F.col(id_col), shingle_array(text_col).alias("sh_set"))
    sigs = minhash_signatures_from_sets(base, id_col, passthrough=True)
    return sigs.select(id_col, "sig", "sh_set")


def minhash_lsh_dedup_incremental(
    new_sigs: DataFrame,
    corpus_sigs: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> DataFrame:
    """Incremental near-dedup: find pairs BETWEEN a new ingest batch and
    the existing corpus, plus pairs WITHIN the batch — without ever
    re-banding old×old (history was already deduped when it landed).

    This is the weekly-refresh shape at 100 TB: the corpus side only
    streams its (persisted) signature table through the band join, the
    new side is typically small, and the candidate space is
    new×(corpus+new), never corpus×corpus. Inputs are
    ``minhash_signature_table`` outputs; the same band-bucket equi-join
    and candidate-only exact verify as the batch path, so results equal
    the full recompute restricted to pairs touching the new batch
    (property-tested)."""

    def banded(sigs):
        return sigs.select(
            F.col(id_col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                F.slice(F.col("sig"), b * rows + 1, rows)
                            ).alias("bh"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    # The new batch is referenced THREE times (band-join left side,
    # the all_b union, the sh_set verify side) — checkpoint it so a
    # non-persisted input computes once (r5 verdict item #6: the bench
    # shape re-built the new half's signatures 3x). The CORPUS side is
    # deliberately NOT checkpointed: at 100 TB it must stream from its
    # persisted parquet signature table (2 scan-only references), never
    # materialize to executor disk.
    new_sigs = new_sigs.localCheckpoint(eager=False)
    new_b = banded(new_sigs)
    all_b = banded(corpus_sigs).union(new_b)
    cand = (
        new_b.select(F.col(id_col).alias("doc_a"), "band", "bh")
        .join(all_b.select(F.col(id_col).alias("doc_b"), "band", "bh"), ["band", "bh"])
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )
        .distinct()
    )
    sets = corpus_sigs.select(id_col, "sh_set").union(
        new_sigs.select(id_col, "sh_set")
    )
    sa = sets.select(F.col(id_col).alias("doc_a"), F.col("sh_set").alias("sh_a"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col("sh_set").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def word_hash60(w: Column) -> Column:
    """60-bit word hash: the top 15 hex chars of md5, as a LongType.
    md5 is a codegen'd JVM expression AND bit-exact reproducible in the
    DuckDB oracle (`CAST('0x' || substr(md5(w),1,15) AS BIGINT)`), so
    SimHash signatures are hash-checkable end to end."""
    return F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash signature: per word w, h = 60-bit md5 hash; bit b of the
    signature is 1 iff sum over words of sign(bit b of h) > 0.

    The signature is packed with INTEGER ops only — `shiftleft` into a
    LongType (distinct powers of two, so plain addition is exact) —
    never floating-point `pow`, which silently rounds away low bits
    above 2^53. One explode + one partial-agg shuffle carrying 60
    small ints per doc.

    The 60 per-bit aggregates and the pack are built as SQL ``expr``
    strings: one parse each instead of hundreds of Py4J Column calls,
    which measurably dominated per-query driver time (~0.6 s saved at
    sf0.1)."""
    df = spread(df)
    wordrows = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).withColumn("h", word_hash60(F.col("w")))
    bit_aggs = [
        F.expr(f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)").alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = wordrows.groupBy(id_col).agg(*bit_aggs)
    pack = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN shiftleft(CAST(1 AS BIGINT), {b}) "
        "ELSE CAST(0 AS BIGINT) END)"
        for b in range(SIMHASH_BITS)
    )
    return sums.select(id_col, F.expr(pack).alias("simhash"))


def hamming_block_pairs(
    sigs: DataFrame,
    bits: int,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
) -> DataFrame:
    """Generic pigeonhole block search over ANY integer signature
    column (SimHash text signatures, image aHashes, …): the `bits`-wide
    signature splits into `max_hamming + 1` contiguous blocks; a pair
    with ≤ max_hamming differing bits must agree on at least one whole
    block, so joining on (block_id, block_value) has EXACT recall at
    any threshold — never an all-pairs compare.

    Scale shape: one (blocks)× explode + one equi-join (AQE splits hot
    buckets) + exact Hamming on candidates only.

    The signature relation is pinned (lazy localCheckpoint) because the
    self-join references it twice and broadcast planning defeats
    ReusedExchange — without the pin every caller's signature pipeline
    runs twice, which for the multimodal callers means decoding every
    image/audio/video payload twice (r13 before-plans showed the
    MapInPandas decode duplicated on both join sides). Signatures are
    one long per doc, so the pinned blocks are tiny."""
    sigs = sigs.localCheckpoint(eager=False)
    nblocks = min(max_hamming + 1, bits)
    base_w, extra = divmod(bits, nblocks)
    bounds = []  # (start_bit, width) per block — widths differ by ≤1
    start = 0
    for i in range(nblocks):
        w = base_w + (1 if i < extra else 0)
        bounds.append((start, w))
        start += w
    blocked = sigs.select(
        F.col(id_col),
        F.col(sig_col).alias("_sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"),
                        F.shiftright(F.col(sig_col), s)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("bv"),
                    )
                    for i, (s, w) in enumerate(bounds)
                ]
            )
        ).alias("blk"),
    ).select(id_col, "_sig", F.col("blk.bi").alias("bi"), F.col("blk.bv").alias("bv"))
    a = blocked.select(
        F.col(id_col).alias("doc_a"), F.col("_sig").alias("sig_a"), "bi", "bv"
    )
    b = blocked.select(
        F.col(id_col).alias("doc_b"), F.col("_sig").alias("sig_b"), "bi", "bv"
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["bi", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ `max_hamming` —
    the pigeonhole block join over the 60-bit text signature (see
    ``hamming_block_pairs``; at the default max_hamming=3 that is 4
    blocks of 15 bits)."""
    sigs = simhash(df, text_col, id_col)
    return hamming_block_pairs(
        sigs, SIMHASH_BITS, id_col, "simhash", max_hamming
    )


def _seg_start(i: int, k: int, lcol: str) -> str:
    """0-based start of even-partition segment i of a length-`lcol`
    string split into k segments (first l%k segments get the extra
    char)."""
    return f"({i} * ({lcol} div {k}) + least({i}, {lcol} % {k}))"


def _seg_len(i: int, k: int, lcol: str) -> str:
    return f"(({lcol} div {k}) + (CASE WHEN {i} < {lcol} % {k} THEN 1 ELSE 0 END))"


def edit_distance_near_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str = "doc_id",
    max_dist: int = 3,
) -> DataFrame:
    """Near-dup pairs by Levenshtein distance ≤ `max_dist` on a key
    column (title / normalized prefix — edit distance on full 100 TB
    payloads is the wrong tool; keys are how it is used at scale).

    Segment-filter (PassJoin-style, Li et al., VLDB'12 — public
    algorithm) with EXACT recall: split each indexed key into
    ``max_dist+1`` even segments; a pair within edit distance d has at
    least one segment untouched by any edit, so that segment appears
    VERBATIM in the other string, shifted by at most d positions (each
    indel shifts alignment by 1). The probe side therefore enumerates,
    for every candidate index length l2 ∈ [l-d, l+d], the substrings
    at the segment's position ±d — a constant ~(d+1)(2d+1)² substring
    keys per row — and candidates join on (index_len, segment_idx,
    segment_text). Only candidates pay the O(len²) verify.

    Unlike naive length-band blocking, this stays sub-quadratic when
    every key has the SAME length (the common case for fixed-width
    prefixes), because the block key carries segment CONTENT, not just
    length. Never all-pairs.

    Degenerate case: keys SHORTER than max_dist+1 chars have empty
    segments, so the pigeonhole argument needs the index side to have
    ≥ d+1 chars. Pairs involving a < d+1-char key are matched through
    a separate short pool (keys of length < 2d+1 — a bounded, cheap
    population at any realistic threshold) with direct verification."""
    d = max_dist
    k = d + 1
    # spread the narrow (id, key, len) projection: a one-file table
    # scans as one partition, serializing the segment/probe substring
    # enumeration (measured −12% at sf0.1; same internal-spread
    # discipline as minhash_lsh_dedup/simhash)
    # pinned (lazy localCheckpoint): five branches reference this
    # relation (index segments, corpus lengths, probe enumeration, and
    # both short-pool sides) — without the pin each branch re-scans the
    # source table with its full-width key column (the r13 before-plan
    # showed four parquet scans of `documents` for one query). The
    # pinned rows are (id, ≤40-char key, len) — tiny.
    base = spread(
        df.select(
            F.col(id_col), F.col(key_col).alias("k"), F.length(key_col).alias("l")
        )
    ).localCheckpoint(eager=False)

    idx_structs = ", ".join(
        f"struct({i} AS i, substring(k, {_seg_start(i, k, 'l')} + 1, "
        f"{_seg_len(i, k, 'l')}) AS seg)"
        for i in range(k)
    )
    idx = (
        base.select(
            F.col(id_col).alias("id_b"),
            F.col("k").alias("k_b"),
            F.col("l").alias("l_b"),
            F.expr(f"explode(array({idx_structs}))").alias("s"),
        )
        .select("id_b", "k_b", "l_b", F.col("s.i").alias("i"), F.col("s.seg").alias("seg"))
        .filter(F.length("seg") > 0)
    )

    # Probe enumeration as a chain of tiny sequence-explodes with a
    # LENGTH FILTER between them: candidate index lengths l2 = l+e are
    # semi-joined against the lengths that actually EXIST in the corpus
    # (broadcast — bounded by max key width) before the (i, sh) fan-out
    # and the substring work. For fixed-width keys this kills 2d/(2d+1)
    # of the enumeration immediately, and the substring extraction is
    # plain codegen'd column arithmetic, not an interpreted lambda.
    # (A single (d+1)(2d+1)² unrolled-struct expression was tried and
    # OOMs codegen above d≈4.)
    lengths = base.select(F.col("l").alias("l2")).distinct()
    probe = (
        base.select(
            F.col(id_col).alias("id_a"),
            F.col("k").alias("k_a"),
            "l",
            F.explode(F.sequence(F.lit(-d), F.lit(d))).alias("e"),
        )
        .withColumn("l2", F.col("l") + F.col("e"))
        .join(F.broadcast(lengths), "l2")
        .select(
            "id_a", "k_a", "l", "l2",
            F.explode(F.sequence(F.lit(0), F.lit(d))).alias("i"),
        )
        .select(
            "id_a", "k_a", "l", "l2", "i",
            F.explode(F.sequence(F.lit(-d), F.lit(d))).alias("sh"),
        )
        .withColumn("st", F.expr(f"i * (l2 div {k}) + least(i, l2 % {k})"))
        .withColumn(
            "ln", F.expr(f"(l2 div {k}) + (CASE WHEN i < l2 % {k} THEN 1 ELSE 0 END)")
        )
        .withColumn("pos", F.col("st") + F.col("sh"))
        .filter(
            (F.col("l2") >= 1)
            & (F.col("ln") > 0)
            & (F.col("pos") >= 0)
            & (F.col("pos") + F.col("ln") <= F.col("l"))
        )
        .select(
            "id_a", "k_a", "l2", "i",
            F.expr("substring(k_a, pos + 1, ln)").alias("seg"),
        )
        .distinct()
    )

    # Pigeonhole guarantees a verbatim segment only for the orientation
    # whose INDEX side has >= d+1 chars, so normalize (least, greatest)
    # rather than filter id_a < id_b — the surviving orientation may
    # have them in either order.
    main_cand = (
        probe.join(idx, (probe.l2 == idx.l_b) & (probe.i == idx.i) & (probe.seg == idx.seg))
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(F.col("l_b") >= k)  # short index keys go through the short pool
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("k_a")).otherwise(F.col("k_b")).alias("k_a"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("k_b")).otherwise(F.col("k_a")).alias("k_b"),
        )
    )
    # Short pool: any pair touching a key of length < d+1 chars. Both
    # partners have length < 2d+1 (length difference bounds), so the
    # pool is a bounded micro-population verified directly.
    short = base.filter(F.col("l") < k).select(
        F.col(id_col).alias("id_a"), F.col("k").alias("k_a"), F.col("l").alias("l_a")
    )
    shortish = base.filter(F.col("l") < k + d).select(
        F.col(id_col).alias("id_b"), F.col("k").alias("k_b"), F.col("l").alias("l_b")
    )
    short_cand = (
        short.join(
            shortish,
            (short.id_a != shortish.id_b)
            & (F.abs(short.l_a - shortish.l_b) <= d),
        )
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("k_a")).otherwise(F.col("k_b")).alias("k_a"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("k_b")).otherwise(F.col("k_a")).alias("k_b"),
        )
    )
    cand = main_cand.unionAll(short_cand).distinct()
    dist = F.levenshtein(F.col("k_a"), F.col("k_b"))
    return (
        cand.select("id_a", "id_b", dist.alias("edit_dist"))
        .filter(F.col("edit_dist") <= d)
    )


# --- driver-contract query forms -------------------------------------------


def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a normalized key (first 10 words) — the corpus has
    no byte-identical dups, so the key demonstrates group collapse."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 10), " ")
    return dedup_exact(docs.withColumn("dedup_key", key), ["dedup_key"], "doc_id")


ORACLE_DEDUP_EXACT = """
SELECT array_to_string(string_split(text, ' ')[1:10], ' ') AS dedup_key,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY 1
"""

_ORACLE_EXACT_JACCARD = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(w) >= 3 THEN array_to_string(w[i.i:i.i+2], ' ')
              ELSE array_to_string(w, ' ') END AS shingle
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i
  ) i
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(inter * 1.0 / (ca.n + cb.n - inter), 4) AS jaccard
FROM pairs
JOIN cnt ca ON doc_a = ca.doc_id
JOIN cnt cb ON doc_b = cb.doc_id
WHERE round(inter * 1.0 / (ca.n + cb.n - inter), 4) >= 0.8
"""


def ngram_jaccard_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return jaccard_pairs(shingles(docs), threshold=0.8)


def minhash_lsh_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-accelerated near-dedup; oracle is the exact-Jaccard SQL (the
    LSH miss probability at j≥0.8 with 24×4 bands is ≈3e-6 per pair)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_dedup(docs, threshold=0.8)


def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures — hash-checked: the md5-derived word hash is
    bit-exact reproducible in DuckDB."""
    return simhash(load_table(spark, sf_dir, "documents"))


# The md5-based 60-bit signature, reproduced sign-sum-for-sign-sum in SQL.
_ORACLE_SIMHASH_SIG = """
WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
h AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM words),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, (SELECT unnest(generate_series(0, 59)) AS b) bb
  GROUP BY doc_id, b
),
sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)
"""

ORACLE_SIMHASH = _ORACLE_SIMHASH_SIG + "SELECT doc_id, simhash FROM sig"

# Brute-force all-pairs Hamming — a STRONGER oracle than mirroring the
# blocked plan: it also proves the 4-block pigeonhole recall claim.
ORACLE_SIMHASH_PAIRS = _ORACLE_SIMHASH_SIG + """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def simhash_near_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_pairs(load_table(spark, sf_dir, "documents"), max_hamming=3)


def edit_distance_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup on the first-40-char key; brute-force
    all-pairs oracle also proves the segment-filter recall."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.withColumn("key40", F.substring("text", 1, 40))
    return edit_distance_near_pairs(keyed, "key40", max_dist=3)


ORACLE_EDIT_DISTANCE = """
WITH k AS (SELECT doc_id, substr(text, 1, 40) AS key40 FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(a.key40, b.key40) AS edit_dist
FROM k a JOIN k b ON a.doc_id < b.doc_id
WHERE levenshtein(a.key40, b.key40) <= 3
"""


def hybrid_near_dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite near-dup: MinHash-LSH text candidates (j ≥ 0.8, miss
    prob ≈3e-6) verified AND scored against the documents' embedding
    vectors — the two-modality agreement check a production dedup pass
    runs before dropping data. Candidate-only cosine: the N×N
    embedding space is never touched."""
    from .similarity import pairwise_cosine

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    cand = minhash_lsh_dedup(docs, threshold=0.8)
    ea = emb.select(
        F.col("vec_id").alias("doc_a"),
        F.col("embedding").cast("array<double>").alias("va"),
    )
    eb = emb.select(
        F.col("vec_id").alias("doc_b"),
        F.col("embedding").cast("array<double>").alias("vb"),
    )
    return (
        cand.join(ea, "doc_a")
        .join(eb, "doc_b")
        .withColumn("cos_sim", pairwise_cosine(F.col("va"), F.col("vb")))
        .select("doc_a", "doc_b", "jaccard", "cos_sim")
    )


ORACLE_HYBRID = f"""
WITH jac AS ({_ORACLE_EXACT_JACCARD})
SELECT jac.doc_a, jac.doc_b, jac.jaccard,
       round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                    CAST(eb.embedding AS DOUBLE[])), 4) AS cos_sim
FROM jac
JOIN embeddings ea ON jac.doc_a = ea.vec_id
JOIN embeddings eb ON jac.doc_b = eb.vec_id
"""


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components over an undirected pair graph: every vertex
    gets the MIN vertex id of its component as ``cluster_id`` — the
    step that turns near-dup PAIRS into duplicate CLUSTERS (keep one
    canonical doc per cluster, drop the rest).

    Iterative min-label propagation with pointer jumping (label := its
    label's label each round), so convergence is O(log diameter) rounds
    rather than O(diameter) — the classic Spark CC shape (cf. Kiveris
    et al., "Connected Components in MapReduce", SOCC'14). Scale notes:
    the label table holds only vertices that appear in a pair (tiny vs
    the corpus); each round is two key-joins on it; the per-round
    convergence action reads ONE scalar (the changed-row count — zero
    changes ⇒ fixpoint), not the table.

    Small-graph fast path: the edge list is materialized (cached) and
    counted anyway; when it holds ≤ ``local_threshold`` edges (≈32 MB of
    longs — the same order as a broadcast side) it is collected once and
    solved with union-find on the driver, because each distributed round
    costs ~6 shuffle stages of pure scheduling latency on a graph this
    size. Near-dup edge lists are ~0.1% of corpus rows, so even a 100 TB
    corpus often fits; above the threshold the O(log d) rounds run.
    Equality of the two paths is pinned in tests."""
    # cache the edge list: every propagation round joins against it, and
    # without pinning it each round's action would re-execute the whole
    # upstream pair pipeline (MinHash+LSH) from the scan
    edges = (
        pairs.select(F.col(a_col).alias("v"), F.col(b_col).alias("u"))
        .union(pairs.select(F.col(b_col).alias("v"), F.col(a_col).alias("u")))
        .cache()
    )
    n_edges = edges.count()
    if n_edges <= local_threshold:
        # read the CACHED edge list (count() just materialized it) — a
        # pairs.collect() here would re-execute the whole upstream
        # MinHash pipeline; both edge directions are harmless to
        # union-find (the second is a no-op union)
        rows = edges.collect()
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in rows:
            a, b = r.v, r.u
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # min-id representative == the iterative path's label
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        import pandas as pd

        # ship the labels back as ONE Arrow batch — createDataFrame on a
        # list of tuples serializes row-at-a-time through pickle and
        # dominated wall-time at near-gate sizes (measured ~20 s for
        # 900k labels vs <2 s via Arrow, tools/bench_cc_gate.py)
        verts = list(parent)
        pdf = pd.DataFrame({"v": verts, "cluster_id": [find(v) for v in verts]})
        spark = pairs.sparkSession
        id_type = pairs.schema[a_col].dataType
        schema = T.StructType(
            [T.StructField("v", id_type), T.StructField("cluster_id", id_type)]
        )
        edges.unpersist()
        return spark.createDataFrame(pdf, schema)
    # Distributed path — contraction with full path compression:
    # each round (1) points every CURRENT root at the min root in its
    # contracted neighborhood, (2) fully compresses the pointer forest
    # by SQUARING (p := p∘p until idempotent — pointers strictly
    # decrease, so the forest is acyclic and depth halves per
    # squaring), (3) rewrites the edge list onto the new roots,
    # dropping self-loops. Contraction at least halves the local-min
    # count per round ⇒ O(log n) rounds, each with O(log depth)
    # squarings; a path/chain collapses in ONE round. (The r4 version
    # did a single jump per round on the UNcontracted graph — O(d)
    # rounds, caught unconverged at max_iter by
    # tools/bench_cc_gate.py --check: 882k wrong labels at 1.3M
    # vertices, 60 at 55k.)
    #
    # Engineering notes, each load-bearing (measured in the gate tool):
    # - every loop table localCheckpoints (NOT cache): squaring
    #   references p twice, so un-truncated lineage doubles per
    #   iteration and plan rendering goes exponential;
    # - `pinned` holds a strong ref to every checkpointed table until
    #   the RESULT is eagerly checkpointed — dropping them mid-loop
    #   lets the ContextCleaner evict the blocks and every later
    #   action recomputes the whole history (observed: rounds going
    #   5 s → 300 s), and stragglers of the evicted stages are the
    #   'non-existent accumulator' noise in BENCH_r04;
    # - convergence = the contracted edge list is EMPTY (count
    #   action), not a label-sum fixpoint.
    pinned = []

    def _ckpt(df):
        out = df.localCheckpoint(eager=False)
        pinned.append(out)
        return out

    labels = _ckpt(edges.select("v").distinct().withColumn("lab", F.col("v")))
    ec = edges  # contracted edge list, both directions, root ids
    converged = False
    for _ in range(max_iter):
        # min root in each root's closed contracted neighborhood
        p = _ckpt(
            ec.groupBy("v")
            .agg(F.min("u").alias("nlab"))
            .select("v", F.least(F.col("v"), F.col("nlab")).alias("lab"))
        )
        for _ in range(max_iter):
            pj = p.select(F.col("v").alias("lab"), F.col("lab").alias("plab"))
            # fixpoint check = changed-row count, not a label sum:
            # int64 sums of 60-bit hash ids can wrap in non-ANSI mode,
            # so two distinct states could compare equal and end
            # compression early (r5 advice); a count can't collide
            p2 = _ckpt(
                p.join(pj, "lab", "left").select(
                    "v",
                    F.coalesce("plab", "lab").alias("lab"),
                    (F.col("plab").isNotNull() & (F.col("plab") != F.col("lab")))
                    .cast("int")
                    .alias("_chg"),
                )
            )
            n_chg = p2.agg(F.sum("_chg")).collect()[0][0]
            p = p2
            if not n_chg:
                break
        # fold the round's relabeling into the global labels
        relab = p.select(F.col("v").alias("lab"), F.col("lab").alias("newlab"))
        labels = _ckpt(
            labels.join(relab, "lab", "left").select(
                "v", F.coalesce("newlab", "lab").alias("lab")
            )
        )
        # contract: rewrite edges onto new roots, drop self-loops
        pv = p.select(F.col("v").alias("_v"), F.col("lab").alias("_vl"))
        pu = p.select(F.col("v").alias("_u"), F.col("lab").alias("_ul"))
        ec = _ckpt(
            ec.join(pv, ec.v == F.col("_v"))
            .join(pu, ec.u == F.col("_u"))
            .select(F.col("_vl").alias("v"), F.col("_ul").alias("u"))
            .filter(F.col("v") != F.col("u"))
            .distinct()
        )
        if ec.count() == 0:
            converged = True
            break
    if not converged:
        # returning silently-unconverged labels is WRONG OUTPUT (the r4
        # defect class); contraction halves local-min count per round so
        # max_iter=20 covers >1M-component graphs — exhaustion means a
        # bug or a pathological graph, either way an error (r5 advice)
        edges.unpersist()
        raise RuntimeError(
            f"connected_components: contracted edge list non-empty after "
            f"{max_iter} rounds — labels would be unconverged; raise max_iter"
        )
    result = labels.select(F.col("v"), F.col("lab").alias("cluster_id")).localCheckpoint(
        eager=True
    )
    del pinned
    edges.unpersist()
    return result


def near_dup_clusters(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", threshold: float = 0.8
) -> DataFrame:
    """End-to-end near-dedup: MinHash-LSH pairs → connected components
    → (doc, cluster, canonical?) keep-list for every doc in a dup
    cluster."""
    pairs = minhash_lsh_dedup(df, text_col, id_col, threshold)
    cc = connected_components(pairs)
    return cc.select(
        F.col("v").alias(id_col),
        "cluster_id",
        # int flag (not boolean) for engine-neutral value hashing
        (F.col("v") == F.col("cluster_id")).cast("int").alias("is_canonical"),
    )


def near_dup_clusters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return near_dup_clusters(load_table(spark, sf_dir, "documents"))


def _oracle_cc(
    pairs_sql: str | None = None,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    id_name: str = "doc_id",
    iters: int = 10,
) -> str:
    """Unrolled neighbor-min propagation (no pointer jumping) over ANY
    pair-producing SQL (defaults to the exact-Jaccard text pairs):
    exact CC when every component's diameter ≤ ``iters`` — guaranteed
    for the driver corpus where dup clusters are small planted groups.
    The Spark side iterates to a true fixpoint, so results agree."""
    pairs_sql = pairs_sql or _ORACLE_EXACT_JACCARD
    # every l{i} is referenced twice by l{i+1}; DuckDB inlines plain
    # CTEs, which would re-evaluate the whole chain 2^iters times —
    # MATERIALIZED pins each round to one evaluation
    sql = f"WITH jac AS MATERIALIZED ({pairs_sql}),\n"
    sql += (
        f"e AS MATERIALIZED (SELECT {a_col} AS v, {b_col} AS u FROM jac "
        f"UNION ALL SELECT {b_col} AS v, {a_col} AS u FROM jac),\n"
    )
    sql += "l0 AS MATERIALIZED (SELECT DISTINCT v, v AS lab FROM e),\n"
    for i in range(1, iters + 1):
        sql += (
            f"l{i} AS MATERIALIZED ("
            f"SELECT l.v, least(l.lab, coalesce(min(n.lab), l.lab)) AS lab "
            f"FROM l{i - 1} l LEFT JOIN e ON l.v = e.v "
            f"LEFT JOIN l{i - 1} n ON e.u = n.v "
            f"GROUP BY l.v, l.lab),\n"
        )
    sql = sql.rstrip(",\n") + "\n"
    sql += (
        f"SELECT v AS {id_name}, lab AS cluster_id, "
        f"CAST(v = lab AS INTEGER) AS is_canonical FROM l{iters}"
    )
    return sql


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = SHINGLE_SIZE,
) -> DataFrame:
    """EXACT Jaccard near-dup via AllPairs/PPJoin prefix filtering
    (Bayardo et al. 2007; Xiao et al. 2008) — same output contract as
    ``jaccard_pairs`` (doc_a < doc_b, jaccard ≥ threshold, 4 dp) but
    sub-quadratic: candidates only need to COLLIDE ON A PREFIX SHINGLE.

    Order every doc's shingles by global rarity (corpus frequency asc,
    shingle asc). If |A∩B|/|A∪B| ≥ t then A and B must share at least
    one shingle among each one's first ``|d| - ceil(t*|d|) + 1`` rarest
    shingles — so the candidate self-join runs only on PREFIX shingles,
    whose buckets are small BY CONSTRUCTION (rare tokens), while the
    plain shingle self-join (`jaccard_pairs`) is dominated by its
    hottest shingle bucket. A length filter (min/max ≥ t) prunes
    further before verification; verification computes the exact
    intersection only for surviving candidates.

    Scale shape: one shuffle to attach shingle frequencies, one per-doc
    window for prefix ranks, a candidate equi-join on (rare) prefix
    shingles, and a candidate-restricted verify join — never an
    all-pairs product and never a hot-bucket quadratic blowup.

    r13 plan work (guide §2.3 — shuffle fewer bytes): (1) ranking and
    candidate joining run on the 8-byte ``xxhash64`` of the shingle,
    not the string — the prefix theorem holds for ANY fixed total
    order of the shingle universe, and a hash collision can only ADD
    a candidate (equal strings ⇒ equal hashes), never lose one, so
    recall stays exact and the brute-force oracle still proves it;
    (2) the per-doc set size rides the ranking window as a windowed
    count instead of a separate aggregate + join; (3) verification is
    ``array_intersect`` over the checkpointed per-doc STRING arrays
    (exact, same as the minhash verify) instead of re-exploding the
    candidates to (pair × shingle) rows through a join + count-agg.
    """
    # compute-once sharing: the per-doc array relation feeds the
    # ranking branch and both verify sides — without pinning, each
    # branch re-shingles the corpus from the scan. Lazy localCheckpoint
    # (not cache) so the ContextCleaner releases the blocks when the
    # result is dropped (same rationale as minhash_lsh_dedup above).
    base = _base_pin(
        spread(df).select(F.col(id_col), shingle_array(text_col, n).alias("sh_set"))
    )
    # hashed shingle rows pinned too: referenced by the frequency agg
    # and the ranking join — and (id, long) rows are far smaller than
    # the string rows the r12 form checkpointed
    sh = base.select(
        F.col(id_col), F.explode("sh_set").alias("shingle")
    ).select(id_col, F.xxhash64("shingle").alias("shl")).localCheckpoint(eager=False)
    freq = sh.groupBy("shl").agg(F.count("*").alias("df_sh"))
    w = Window.partitionBy(id_col)
    ranked = (
        sh.join(freq, "shl")
        .withColumn(
            "rk",
            F.row_number().over(w.orderBy(F.asc("df_sh"), F.asc("shl"))),
        )
        .withColumn("n_sh", F.count("*").over(w))
    )
    # prefix length |d| - ceil(t|d|) + 1 — NOT pinned: the candidate
    # self-join's two sides are identical plans over the pinned `sh`,
    # so the ranking window's exchange is shared via ReusedExchange;
    # a checkpoint here replaced that reuse with a serialize/read
    # barrier and measured strictly slower (interleaved 5-round A/B:
    # median 2.89 -> 2.45 s without it)
    pref = ranked.filter(
        F.col("rk") <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    ).select(F.col(id_col), "shl", "n_sh")
    a = pref.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"), "shl")
    b = pref.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"), "shl")
    cand = (
        a.join(b, "shl")
        .filter(F.col("doc_a") < F.col("doc_b"))
        # length filter: jaccard >= t requires min(|A|,|B|)/max(|A|,|B|) >= t
        .filter(
            F.least("n_a", "n_b") >= F.lit(threshold) * F.greatest("n_a", "n_b")
        )
        .select("doc_a", "doc_b", "n_a", "n_b")
        .distinct()
    )
    sa = base.select(F.col(id_col).alias("doc_a"), F.col("sh_set").alias("sh_a"))
    sb = base.select(F.col(id_col).alias("doc_b"), F.col("sh_set").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    jac = inter / (F.col("n_a") + F.col("n_b") - inter)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def prefix_filter_jaccard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact Jaccard; the oracle is the brute-force
    all-pairs SQL — passing it PROVES the prefix filter loses no pair
    (exact recall), the same oracle-strengthening trick as MinHash."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return prefix_filter_jaccard_pairs(docs, threshold=0.8)


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = SHINGLE_SIZE,
) -> DataFrame:
    """ASYMMETRIC containment join: pairs (A, B) where
    |A∩B|/|A| ≥ t — the subset-duplicate case Jaccard misses (a doc
    embedded verbatim inside a much longer one scores low Jaccard but
    containment ≈ 1). Both directions are reported independently.

    Prefix filtering adapts to containment: if |A∩B| ≥ ⌈t·|A|⌉ then B
    must share one of A's first |A| − ⌈t·|A|⌉ + 1 RAREST shingles (any
    miss-set that avoids A's prefix is too small to reach t·|A|) — so
    the candidate join runs A-prefix × B-all-shingles. There is no
    length filter (B may be arbitrarily large) and no symmetric
    pruning; the rarity ordering is what keeps the probe buckets
    small. Verification counts exact intersections on candidates only.

    Scale shape: same as ``prefix_filter_jaccard_pairs`` — frequency
    attach, per-doc window, candidate equi-join on rare prefix
    shingles, candidate-restricted verify; never all-pairs. Same r13
    plan work as that function too: hashed-shingle ranking/joining
    (exact recall for any fixed total order; collisions only add
    candidates), windowed per-doc count, and ``array_intersect``
    verification over the checkpointed string arrays."""
    base = _base_pin(
        spread(df).select(F.col(id_col), shingle_array(text_col, n).alias("sh_set"))
    )
    # pinned like the jaccard form: referenced by the frequency agg,
    # the ranking join, and the candidate probe side
    sh = base.select(
        F.col(id_col), F.explode("sh_set").alias("shingle")
    ).select(id_col, F.xxhash64("shingle").alias("shl")).localCheckpoint(eager=False)
    freq = sh.groupBy("shl").agg(F.count("*").alias("df_sh"))
    w = Window.partitionBy(id_col)
    ranked = (
        sh.join(freq, "shl")
        .withColumn(
            "rk",
            F.row_number().over(w.orderBy(F.asc("df_sh"), F.asc("shl"))),
        )
        .withColumn("n_sh", F.count("*").over(w))
    )
    pref = ranked.filter(
        F.col("rk") <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    ).select(F.col(id_col), "shl", "n_sh")
    a = pref.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"), "shl")
    b = sh.select(F.col(id_col).alias("doc_b"), "shl")
    cand = (
        a.join(b, "shl")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b", "n_a")
        .distinct()
    )
    sa = base.select(F.col(id_col).alias("doc_a"), F.col("sh_set").alias("sh_a"))
    sb = base.select(F.col(id_col).alias("doc_b"), F.col("sh_set").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("containment", F.round(inter / F.col("n_a"), 4))
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


def containment_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment join on the doc corpus; the oracle is the
    brute-force all-pairs SQL, so passing PROVES the asymmetric prefix
    filter loses no qualifying pair (exact recall)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return containment_pairs(docs, threshold=0.9)


ORACLE_CONTAINMENT = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(w) >= 3 THEN array_to_string(w[i.i:i.i+2], ' ')
              ELSE array_to_string(w, ' ') END AS shingle
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i
  ) i
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, round(inter * 1.0 / ca.n, 4) AS containment
FROM pairs JOIN cnt ca ON doc_a = ca.doc_id
WHERE round(inter * 1.0 / ca.n, 4) >= 0.9
"""


QUERIES = {
    "dedup_exact_docs": dedup_exact_docs,
    "containment_pairs_docs": containment_pairs_docs,
    "prefix_filter_jaccard_docs": prefix_filter_jaccard_docs,
    "near_dup_clusters_docs": near_dup_clusters_docs,
    "hybrid_near_dup_docs": hybrid_near_dup_docs,
    "ngram_jaccard_pairs_docs": ngram_jaccard_pairs_docs,
    "minhash_lsh_pairs_docs": minhash_lsh_pairs_docs,
    "simhash_docs": simhash_docs,
    "simhash_near_pairs_docs": simhash_near_pairs_docs,
    "edit_distance_pairs_docs": edit_distance_pairs_docs,
}

ORACLES = {
    "dedup_exact_docs": ORACLE_DEDUP_EXACT,
    "containment_pairs_docs": ORACLE_CONTAINMENT,
    "near_dup_clusters_docs": _oracle_cc(),
    "hybrid_near_dup_docs": ORACLE_HYBRID,
    "ngram_jaccard_pairs_docs": _ORACLE_EXACT_JACCARD,
    "prefix_filter_jaccard_docs": _ORACLE_EXACT_JACCARD,
    "minhash_lsh_pairs_docs": _ORACLE_EXACT_JACCARD,
    "simhash_docs": ORACLE_SIMHASH,
    "simhash_near_pairs_docs": ORACLE_SIMHASH_PAIRS,
    "edit_distance_pairs_docs": ORACLE_EDIT_DISTANCE,
}
