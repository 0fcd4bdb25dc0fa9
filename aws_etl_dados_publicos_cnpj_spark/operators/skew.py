"""Skew-aware join: explicit key salting for hot keys.

AQE's skew-join splitting (enabled in ``session.py``) handles most skew
at runtime; explicit salting remains the tool when one side's hot key
would overwhelm even a split partition (e.g. a null-heavy foreign key
or a power-law entity in a 100 TB fact table).

Technique: append ``salt ∈ [0, buckets)`` to the big side's key
(deterministic per-row via a hash of the whole row, so re-runs are
stable), and replicate the small/dimension side once per salt value.
The join key becomes (key, salt) → the hot key's rows spread over
``buckets`` shuffle partitions instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted
    across ``buckets`` partitions per key. Result equals
    ``big.join(small, key, how)`` (column order: big's then small's
    non-key columns)."""
    if how not in ("inner", "left", "left_outer", "left_semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, got {how!r}: "
            "right/full joins against the replicated side would duplicate unmatched small rows"
        )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(buckets))
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<bigint>"))
    )
    return salted_big.join(replicated_small, [key, "_salt"], how).drop("_salt")
