"""Storage layout: partitioned writes (partition pruning) and
small-file compaction — table hygiene that keeps 100 TB scannable.

Streaming sinks produce one file-set per trigger; without compaction a
day of 1-minute triggers is 1440 file-sets and the scan planner drowns
in footers. ``compact_directory`` rewrites a directory to
target-sized files; ``write_partitioned`` lays data out so time/key
predicates prune whole directories (visible as PartitionFilters in the
scan).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    format: str = "parquet",
    mode: str = "overwrite",
):
    """Hive-style partitioned layout. Queries filtering on
    partition_cols scan only matching directories."""
    (
        df.write.format(format)
        .mode(mode)
        .partitionBy(*partition_cols)
        .save(path)
    )


def with_date_partition(df: DataFrame, ts_col: str, out_col: str = "dt") -> Column | DataFrame:
    """Add the canonical daily partition column."""
    return df.withColumn(out_col, F.to_date(ts_col))


def compact_directory(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    format: str = "parquet",
) -> int:
    """Rewrite a (possibly many-small-files) directory into
    ~target-sized files. Returns the new file count. Uses a size-based
    estimate from the input listing; the rewrite is a single coalesce
    job (no shuffle when reducing file count)."""
    df = spark.read.format(format).load(path)
    # estimate current bytes from the file listing
    files = df.inputFiles()
    import os

    total_bytes = 0
    for f in files:
        p = f.removeprefix("file:")
        try:
            total_bytes += os.path.getsize(p)
        except OSError:
            total_bytes = 0
            break
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024))) if total_bytes else 1
    tmp = path.rstrip("/") + ".compacting"
    df.coalesce(n_files).write.format(format).mode("overwrite").save(tmp)
    # atomic-ish swap (same filesystem)
    import shutil

    bak = path.rstrip("/") + ".old"
    shutil.move(path, bak)
    shutil.move(tmp, path)
    shutil.rmtree(bak)
    return n_files


# ------------------------------------------------------- z-order layout

Z_BITS = 16


def _range_checked(c: Column, bits: int) -> Column:
    """Fail loudly when a value falls outside [0, 2^bits): assert_true
    returns NULL when the predicate holds, so the when() yields the
    value; a violation raises at execution instead of silently
    degrading pruning."""
    # NULL passes through (yields a NULL key, sorted together by the
    # range partitioner); only concrete out-of-range values raise.
    ok = c.isNull() | ((c >= 0) & (c < F.lit(1 << bits).cast("long")))
    msg = F.concat(
        F.lit(f"zorder_key input out of range [0, {1 << bits}): "),
        c.cast("string"),
    )
    return F.when(F.assert_true(ok, msg).isNull(), c)


def zorder_key(
    a: Column | str, b: Column | str, bits: int = Z_BITS
) -> Column:
    """Morton (Z-order) interleave of two non-negative int columns,
    quantized to ``bits`` bits each — the multi-dimensional clustering
    key behind Delta/Iceberg OPTIMIZE ZORDER. Sorting by one column
    gives perfect pruning on it and none on the other; sorting by the
    interleaved key gives BOTH columns locality, so parquet row-group
    min/max stats prune on either predicate.

    Pure Catalyst bit math (shiftleft/or over a fixed ``bits`` unroll)
    — compiles to one codegen expression, no Python, no UDF. Values
    must be pre-scaled to [0, 2^bits); use ntile/percent_rank or
    (x - min) * (2^bits - 1) / (max - min) to quantize arbitrary
    ranges first. Out-of-range inputs fail the job loudly
    (assert_true) — silently dropping high bits or mangling negatives
    would alias values into unrelated Morton cells and quietly corrupt
    clustering/pruning."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    ca = _range_checked(ca.cast("long"), bits)
    cb = _range_checked(cb.cast("long"), bits)
    key = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(ca, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(cb, i).bitwiseAND(F.lit(1))
        key = (
            key.bitwiseOR(F.shiftleft(bit_a, 2 * i))
            .bitwiseOR(F.shiftleft(bit_b, 2 * i + 1))
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = Z_BITS,
    format: str = "parquet",
    mode: str = "overwrite",
):
    """Write ``df`` clustered by the Z-order of (col_a, col_b):
    range-partition on the interleaved key (co-locates nearby cells in
    the same file) and sort within partitions (tight row-group
    min/max). Point/range predicates on EITHER column then skip most
    files via footer stats — the scan-pruning win OPTIMIZE ZORDER buys
    on lakehouse tables, with no table format required."""
    keyed = df.withColumn("__z", zorder_key(col_a, col_b, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(format)
        .mode(mode)
        .save(path)
    )
