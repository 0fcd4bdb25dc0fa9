"""Data-quality validation (Deequ-shaped): declarative per-column rules
evaluated in ONE aggregate pass, plus referential-integrity checks as
a single lazy left-join aggregate — the gate a warehouse pipeline runs
between landing
and publishing a snapshot (the reference publishes unvalidated,
``fetch_data.py`` writes straight to the bucket; this is the missing
guard).

Scale shape: all row-level rules fold into a single map-side partial
aggregate over one scan (violations are ``sum(bool)`` columns, then a
tiny unpivot); each FK rule is one lazy left join against the
referenced dimension (broadcast when it fits) folded into one
aggregate — exactly one job per fact table, no eager driver actions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_table


def run_checks(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate boolean row-level ``rules`` (True = row passes) in one
    aggregate pass: (check, n_rows, n_violations, passed)."""
    # coalesce: sum over ZERO rows is NULL — an empty-but-landed
    # snapshot must report 0 violations / passed=1, not NULLs that a
    # passed==1 gate silently treats as failure-shaped (r6 advice)
    aggs = [F.count("*").alias("__n")] + [
        F.coalesce(F.sum(F.when(~cond, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias(f"__v_{i}")
        for i, cond in enumerate(rules.values())
    ]
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(f"__v_{i}").alias("n_violations"),
            )
            for i, name in enumerate(rules)
        ]
    )
    return (
        row.select(F.col("__n").alias("n_rows"), F.explode(pairs).alias("p"))
        .select(
            F.col("p.check").alias("check"),
            "n_rows",
            F.col("p.n_violations").alias("n_violations"),
            (F.col("p.n_violations") == 0).cast("int").alias("passed"),
        )
    )


def fk_check(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str, name: str
) -> DataFrame:
    """Referential integrity in ONE lazy aggregate over a left join:
    orphans = fact rows whose key finds no dim match. Emitted in the
    same (check, n_rows, n_violations, passed) contract so it unions
    with ``run_checks`` output. Unlike an anti-join + two eager
    ``count()`` actions this is a single scan, stays lazy, and the
    dim side broadcasts when small — at 100 TB the fact table is read
    once per suite, not twice per FK rule."""
    marker = f"__fk_hit_{name}"
    joined = fact.select(F.col(fact_key)).join(
        dim.select(F.col(dim_key).alias(fact_key), F.lit(1).alias(marker))
        .dropDuplicates([fact_key]),
        fact_key,
        "left",
    )
    return joined.agg(
        F.count("*").alias("n_rows"),
        # coalesce: an EMPTY fact table must yield n_violations=0 /
        # passed=1, not NULL/NULL (sum over zero rows) — uniqueness_check
        # already coalesces this case (r6 advice, medium)
        F.coalesce(
            F.sum(F.when(F.col(marker).isNull(), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_violations"),
    ).select(
        F.lit(name).alias("check"),
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    )


def uniqueness_check(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """Key uniqueness: violations = rows beyond the first per key (one
    partial-agg shuffle on the key)."""
    dup = (
        df.groupBy(*cols)
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum(F.col("c") - 1).cast("long").alias("extra"),
            F.sum("c").cast("long").alias("n"),
        )
    )
    return dup.select(
        F.lit(name).alias("check"),
        # empty input → zero groups → sum is NULL; report 0 rows
        F.coalesce("n", F.lit(0)).alias("n_rows"),
        F.coalesce("extra", F.lit(0)).alias("n_violations"),
        (F.coalesce("extra", F.lit(0)) == 0).cast("int").alias("passed"),
    )


# --- driver-contract query forms -------------------------------------------


def dq_orders_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The validation suite a pipeline would gate the orders snapshot
    on: completeness, domain, range, key uniqueness, and customer FK
    integrity — one scan for the row rules + one lazy FK-join agg +
    one key agg."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    row_rules = run_checks(
        orders,
        {
            "orderkey_not_null": F.col("o_orderkey").isNotNull(),
            "totalprice_positive": F.col("o_totalprice") > 0,
            "status_in_domain": F.col("o_orderstatus").isin("O", "F", "P"),
            "orderdate_in_range": (
                F.col("o_orderdate") >= F.lit("1990-01-01").cast("timestamp")
            )
            & (F.col("o_orderdate") < F.lit("2005-01-01").cast("timestamp")),
        },
    )
    uniq = uniqueness_check(orders, ["o_orderkey"], "orderkey_unique")
    fk = fk_check(orders, "o_custkey", cust, "c_custkey", "custkey_fk")
    return row_rules.unionByName(uniq).unionByName(fk)


ORACLE_DQ_ORDERS = """
WITH base AS (
  SELECT count(*) AS n,
         sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS v_null,
         sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS v_price,
         sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS v_status,
         sum(CASE WHEN NOT (o_orderdate >= TIMESTAMP '1990-01-01 00:00:00'
                            AND o_orderdate < TIMESTAMP '2005-01-01 00:00:00')
                  THEN 1 ELSE 0 END) AS v_date
  FROM orders
),
uniq AS (
  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(c - 1) AS BIGINT) AS extra
  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
),
fk AS (
  SELECT (SELECT count(*) FROM orders) AS n,
         (SELECT count(*) FROM orders
          WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS orphans
)
SELECT 'orderkey_not_null' AS check, n AS n_rows,
       CAST(v_null AS BIGINT) AS n_violations,
       CAST(v_null = 0 AS INT) AS passed FROM base
UNION ALL
SELECT 'totalprice_positive', n, CAST(v_price AS BIGINT),
       CAST(v_price = 0 AS INT) FROM base
UNION ALL
SELECT 'status_in_domain', n, CAST(v_status AS BIGINT),
       CAST(v_status = 0 AS INT) FROM base
UNION ALL
SELECT 'orderdate_in_range', n, CAST(v_date AS BIGINT),
       CAST(v_date = 0 AS INT) FROM base
UNION ALL
SELECT 'orderkey_unique', n, extra, CAST(extra = 0 AS INT) FROM uniq
UNION ALL
SELECT 'custkey_fk', n, CAST(orphans AS BIGINT),
       CAST(orphans = 0 AS INT) FROM fk
"""


def dq_documents_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-side validation: non-empty text, n_chars consistency,
    lang domain, doc_id uniqueness."""
    docs = load_table(spark, sf_dir, "documents")
    row_rules = run_checks(
        docs,
        {
            "text_not_empty": F.length("text") > 0,
            "n_chars_consistent": F.col("n_chars") == F.length("text"),
            "lang_known": F.col("lang").isin("en", "de", "fr", "pt", "es"),
        },
    )
    uniq = uniqueness_check(docs, ["doc_id"], "doc_id_unique")
    return row_rules.unionByName(uniq)


ORACLE_DQ_DOCS = """
WITH base AS (
  SELECT count(*) AS n,
         sum(CASE WHEN NOT (length(text) > 0) THEN 1 ELSE 0 END) AS v_empty,
         sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS v_chars,
         sum(CASE WHEN lang NOT IN ('en','de','fr','pt','es') THEN 1 ELSE 0 END) AS v_lang
  FROM documents
),
uniq AS (
  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(c - 1) AS BIGINT) AS extra
  FROM (SELECT count(*) AS c FROM documents GROUP BY doc_id)
)
SELECT 'text_not_empty' AS check, n AS n_rows,
       CAST(v_empty AS BIGINT) AS n_violations,
       CAST(v_empty = 0 AS INT) AS passed FROM base
UNION ALL
SELECT 'n_chars_consistent', n, CAST(v_chars AS BIGINT),
       CAST(v_chars = 0 AS INT) FROM base
UNION ALL
SELECT 'lang_known', n, CAST(v_lang AS BIGINT), CAST(v_lang = 0 AS INT) FROM base
UNION ALL
SELECT 'doc_id_unique', n, extra, CAST(extra = 0 AS INT) FROM uniq
"""


QUERIES = {
    "dq_orders_checks": dq_orders_checks,
    "dq_documents_checks": dq_documents_checks,
}

ORACLES = {
    "dq_orders_checks": ORACLE_DQ_ORDERS,
    "dq_documents_checks": ORACLE_DQ_DOCS,
}
