"""Skew-safe joins.

AQE's skew-join splitting (on by default in session.py) handles most
cases at runtime by splitting oversized shuffle partitions. Salting is
the explicit fallback for the pathological case AQE can't fix: ONE hot
key whose single-key hash partition exceeds executor memory (AQE can
split a partition, but a single key's rows still co-locate per split
boundary only for sort-merge; for hash aggregation the hot key stays
hot).

salted_join: replicate the small side R times, scatter the big side's
hot keys across R sub-keys. Turns one executor-killing partition into
R even ones at the cost of R-1 extra copies of the (small) right side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__sfs_salt"


def top_keys(df: DataFrame, key: str, n: int = 20) -> list:
    """The n heaviest keys (driver-side list — used to decide whether
    salting is worth it; at scale run on a sample)."""
    rows = df.groupBy(key).count().orderBy(F.col("count").desc()).limit(n).collect()
    return [(r[0], r["count"]) for r in rows]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Join big⋈small on `key` with the big side salted across `salt`
    sub-partitions. The small side is exploded x salt (cheap when small
    is actually small); the big side gets a deterministic salt from
    xxhash64 of its full row position-independent content surrogate
    (monotonically_increasing_id is NOT used — it's
    partitioning-dependent).
    """
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    # Deterministic per-row salt derived from the key AND a row hash so
    # a hot key spreads across all salt buckets.
    big_salted = big.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int"),
    )
    out = big_salted.join(salted_small, on=[key, SALT_COL], how=how)
    return out.drop(SALT_COL)
