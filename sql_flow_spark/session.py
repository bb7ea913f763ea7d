"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the same confs are what we would set
cluster-side for the 100 TB target:

- AQE on (runtime coalesce, skew-join splitting, dynamic broadcast)
- Arrow for any pandas hand-off (functions/ uses mapInPandas)
- shuffle partitions sized for the local box; on a real cluster AQE
  coalesces from a high initial number, so the value is a ceiling not
  a tuning knob
- parquet vectorized reader + pushdown are Spark defaults; we rely on
  them and audit plans with .explain("formatted") in tests.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Self-describing timestamps; keeps parity with DuckDB TIMESTAMP (no TZ).
    "spark.sql.session.timeZone": "UTC",
    # local[32]: one shuffle partition per core; AQE coalesces further.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    # 128 MiB splits keep scan tasks balanced at any SF.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    # The driver testdata stores events.ts as parquet TIMESTAMP(NANOS),
    # which Spark has no native type for; read as long and convert in
    # tables.load_tables (micros = nanos div 1000, matching DuckDB's
    # truncation).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Runtime bloom-filter pruning for selective shuffle joins: a
    # no-op at test scale (the creation side never crosses the size
    # threshold locally), but on the 100 TB target it row-prunes the
    # big side of fact-fact joins before the exchange. Harmless when
    # it doesn't fire; large win when it does.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
}


def get_spark(app_name: str = "sql-flow-spark", extra_confs: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    )
    for k, v in DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
