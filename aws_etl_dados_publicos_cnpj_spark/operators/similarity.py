"""[EXT] Similarity search over embedding columns (BASELINE.json north
star; SURVEY.md §2.3).

- ``cosine``: JVM-side zip_with/aggregate dot product — sequential left
  fold, so the float result is bit-deterministic (and matches DuckDB's
  ``list_cosine_similarity`` loop for the oracle).
- ``ann_bruteforce_topk``: broadcast the (small) probe set against the
  full corpus — a map-side-only plan: no shuffle except the final
  per-probe top-k window. The exact baseline.
- ``ann_lsh_topk``: the scale path — random-hyperplane (sign) LSH:
  16-bit deterministic bucket codes, probes join only their bucket.
  At 100 TB the bucket join replaces the N×M cross product; recall is
  tunable via code width / multi-probe.
- ``embedding_near_dup_pairs``: blocked all-pairs cosine (block =
  ``label`` here; at scale the block key is an LSH bucket) — the
  embedding-cosine near-dup family for dedup.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from . import load_table

LSH_PLANES = 16
LSH_SEED = 42
EMBED_DIM = 64


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (cast float
    arrays with ``.cast('array<double>')`` first)."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def ann_bruteforce_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per probe. The probe side is
    broadcast, so the scan of the (huge) corpus never shuffles; only the
    tiny (probes × k) result does, in the ranking window."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    ).withColumn("cnorm", F.sqrt(_dot(F.col("cvec"), F.col("cvec"))))
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("pvec"),
    ).withColumn("pnorm", F.sqrt(_dot(F.col("pvec"), F.col("pvec"))))
    # norms are computed once per row before the join; the per-pair work
    # is a single dot product
    scored = (
        c.join(F.broadcast(p), F.col("neighbor_id") != F.col("probe_id"))
        .withColumn(
            "sim",
            F.round(_dot(F.col("pvec"), F.col("cvec")) / (F.col("pnorm") * F.col("cnorm")), 4),
        )
        .select("probe_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("probe_id", "neighbor_id", "sim", "rk")
    )


def _hyperplanes(dim: int = EMBED_DIM, planes: int = LSH_PLANES, seed: int = LSH_SEED) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(planes, dim).tolist()


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket code: bit p = 1 iff dot(vec, plane_p) > 0."""
    code: Column = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        code = code + F.when(_dot(vec_col, plane_col) > 0, F.lit(2).cast("long") ** p).otherwise(0)
    return code


def ann_lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = LSH_PLANES,
) -> DataFrame:
    """Approximate top-k: probe and corpus vectors are bucketed by a
    16-bit sign-LSH code; candidates come only from the probe's bucket.
    The corpus-side bucket computation is a map-only pass that would be
    precomputed/persisted at scale (write-once, reuse per query)."""
    hp = _hyperplanes(planes=planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    ).withColumn("bucket", lsh_bucket(F.col("cvec"), hp))
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("pvec"),
    ).withColumn("bucket", lsh_bucket(F.col("pvec"), hp))
    scored = (
        c.join(F.broadcast(p), "bucket")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .withColumn("sim", F.round(cosine(F.col("pvec"), F.col("cvec")), 4))
        .select("probe_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("probe_id", "neighbor_id", "sim", "rk")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    block_col: str = "label",
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs within blocks: all-pairs cosine
    restricted to equal ``block_col`` (at scale: an LSH bucket), keeping
    pairs at or above `threshold`."""
    base = embeddings.select(
        F.col(id_col), F.col(block_col).alias("block"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    a = base.select(F.col(id_col).alias("id_a"), "block", F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = base.select(F.col(id_col).alias("id_b"), "block", F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def ann_ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe_cells: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
    corpus vector to a cell; each probe searches only its
    ``n_probe_cells`` nearest cells.

    Scale shape: training samples the corpus (KMeans on a fraction),
    cell assignment is one map-side pass (persisted at scale, like the
    LSH buckets), and the search join hits ~n_probe/n_cells of the
    corpus. Deterministic for fixed seed."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    ).withColumn("features", array_to_vector("cvec"))
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(train)
    assigned = model.transform(train).select(
        "neighbor_id", "cvec", F.col("prediction").alias("cell")
    ).withColumn("cnorm", F.sqrt(_dot(F.col("cvec"), F.col("cvec"))))

    centers = [c.tolist() for c in model.clusterCenters()]

    def _nearest_cells(vec_col_: Column) -> Column:
        # distances to each center, pick the n_probe_cells smallest
        dists = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            vec_col_,
                            F.array(*[F.lit(float(x)) for x in center]),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    F.lit(i).alias("cell"),
                )
                for i, center in enumerate(centers)
            ]
        )
        return F.slice(F.array_sort(dists), 1, n_probe_cells).getField("cell")

    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("pvec"),
    ).withColumn("pnorm", F.sqrt(_dot(F.col("pvec"), F.col("pvec"))))
    p = p.withColumn("cell", F.explode(_nearest_cells(F.col("pvec"))))

    scored = (
        assigned.join(F.broadcast(p), "cell")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .withColumn(
            "sim",
            F.round(_dot(F.col("pvec"), F.col("cvec")) / (F.col("pnorm") * F.col("cnorm")), 4),
        )
        .select("probe_id", "neighbor_id", "sim")
        .distinct()
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("probe_id", "neighbor_id", "sim", "rk")
    )


# --- driver-contract query forms -------------------------------------------


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return ann_bruteforce_topk(emb, probes, k=5)


ORACLE_ANN = """
WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pvec
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cvec FROM embeddings),
s AS (SELECT probe_id, neighbor_id,
             round(list_cosine_similarity(pvec, cvec), 4) AS sim
      FROM p, c WHERE neighbor_id <> probe_id)
SELECT probe_id, neighbor_id, sim, rk
FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY sim DESC, neighbor_id ASC) AS rk
      FROM s)
WHERE rk <= 5
"""


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup_pairs(load_table(spark, sf_dir, "embeddings"))


ORACLE_NEAR_DUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 4) >= 0.4
"""


def ann_lsh_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (rows-only check: approximate recall — the
    bucket restriction is not SQL-reproducible bit-for-bit)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    # 6 planes → 64 buckets: sized so sf0.01's 500 vectors give each
    # probe a non-trivial candidate set; at scale widen the code and
    # multi-probe instead.
    return ann_lsh_topk(emb, probes, k=5, planes=6)


def ann_ivf_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN (rows-only check: approximate recall)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return ann_ivf_topk(emb, probes, k=5)


QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "embedding_near_dup": embedding_near_dup,
    "ann_lsh_topk": ann_lsh_topk_query,
    "ann_ivf_topk": ann_ivf_topk_query,
}

ORACLES = {
    "ann_cosine_topk": ORACLE_ANN,
    "embedding_near_dup": ORACLE_NEAR_DUP,
}
