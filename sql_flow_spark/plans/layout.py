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
