"""Measure connected_components on BOTH sides of the union-find gate.

The small-graph fast path collects the edge list and solves union-find
on the driver when it holds ≤ ``local_threshold`` (2M) edges; above
that the distributed O(log d) pointer-jumping rounds run. This tool
builds deterministic synthetic graphs just below and just above the
gate and times each path at its real operating point, so the crossover
in ``SCALE.md`` is a measured number rather than an estimate.

Graph shape: chains of length 64 (diameter stress for the iterative
path) plus xxhash64-derived cross edges (~12% of chain edges) that
merge chains into larger components — deterministic, no RNG.

Usage: python tools/bench_cc_gate.py [edges_below] [edges_above]
Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def synthetic_edges(spark, n_edges: int):
    """~n_edges deterministic edges over chains of 64 + hash cross-links."""
    chain = 64
    n_vertices = n_edges  # chain edges ≈ vertices (minus one per chain)
    v = spark.range(n_vertices).select(F.col("id").alias("v"))
    chain_edges = v.filter(F.col("v") % chain != chain - 1).select(
        F.col("v").alias("doc_a"), (F.col("v") + 1).alias("doc_b")
    )
    cross = (
        v.filter(F.xxhash64("v") % 8 == 0)
        .select(
            F.col("v").alias("doc_a"),
            (F.pmod(F.xxhash64("v", F.lit(1)), F.lit(n_vertices))).alias("doc_b"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
    )
    return chain_edges.union(cross)


def run(spark, n_edges: int, force: str | None = None) -> dict:
    from aws_etl_dados_publicos_cnpj_spark.operators.dedup import connected_components

    pairs = synthetic_edges(spark, n_edges).localCheckpoint(eager=True)
    actual = pairs.count()
    kw = {}
    if force == "distributed":
        kw["local_threshold"] = 0
    elif force == "local":
        kw["local_threshold"] = 1 << 60
    t0 = time.perf_counter()
    out = connected_components(pairs, **kw)
    n_out = out.count()
    wall = round(time.perf_counter() - t0, 2)
    path = force or ("local" if 2 * actual <= 2_000_000 else "distributed")
    return {
        "metric": "cc_gate",
        "edges": actual,
        "path": path,
        "vertices_labeled": n_out,
        "wall_sec": wall,
    }


def main() -> None:
    from aws_etl_dados_publicos_cnpj_spark.session import build_session

    nums = [int(a) for a in sys.argv[1:] if not a.startswith("--")]
    below = nums[0] if nums else 900_000
    above = nums[1] if len(nums) > 1 else 1_300_000
    spark = build_session(
        "bench-cc-gate", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    # NOTE the gate compares the DIRECTED edge count (2x the input
    # pairs), so pairs≈900k → 1.8M directed (below gate) and
    # pairs≈1.3M → 2.6M directed (above gate).
    for n, force in [(below, None), (above, None), (above, "local")]:
        print(json.dumps(run(spark, n, force)), flush=True)
    if "--check" in sys.argv:
        # fast/distributed equality AT the boundary operating point —
        # same above-gate graph through both paths, labels must match
        # exactly (the small-graph pytest pin covers shape, this covers
        # size).
        from aws_etl_dados_publicos_cnpj_spark.operators.dedup import (
            connected_components,
        )

        pairs = synthetic_edges(spark, above).localCheckpoint(eager=True)
        loc = connected_components(pairs, local_threshold=1 << 60)
        dist = connected_components(pairs, local_threshold=0)
        diff = loc.join(dist.withColumnsRenamed({"cluster_id": "d"}), "v").filter(
            "cluster_id <> d"
        )
        n_diff = diff.count()
        print(json.dumps({"metric": "cc_gate_equality", "edges_pairs": above,
                          "mismatched_labels": n_diff}), flush=True)
        assert n_diff == 0
    spark.stop()


if __name__ == "__main__":
    main()
