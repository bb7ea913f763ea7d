"""Test-data table loading.

The driver's synthetic TPC-H-ish tables (TESTDATA.md) are one parquet
file per table. ``load_tables`` reads them lazily and registers temp
views so operators can be written either via the DataFrame API or
``spark.sql``. Reads are plain ``spark.read.parquet`` — column pruning
and predicate pushdown then happen per-query via Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at ANY scale factor (they grow
# sublinearly or are fixed-size in TPC-H-style generators).
BROADCAST_DIMS = ("region", "nation")

# Columns stored as parquet TIMESTAMP(NANOS): Spark reads them as long
# (spark.sql.legacy.parquet.nanosAsLong) and we convert to micros the
# same way DuckDB does (truncating integer division).
_NANO_TS_COLS = {"events": ("ts",)}


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TABLE_NAMES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load parquet tables from ``sf_dir`` and return {name: DataFrame}."""
    # Defensive runtime confs: the grading driver (and any embedding
    # application) supplies its OWN SparkSession, which may lack the
    # session-factory settings. Both are runtime-settable:
    # - nanosAsLong: events.parquet stores TIMESTAMP(NANOS); without it
    #   every events read dies with PARQUET_TYPE_ILLEGAL.
    # - UTC session tz: formatted timestamp outputs must render the
    #   stored instant unshifted to match DuckDB's naive timestamps.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = spark.read.parquet(path)
        for col in _NANO_TS_COLS.get(name, ()):
            if dict(df.dtypes).get(col) == "bigint":
                df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
