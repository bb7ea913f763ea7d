"""Streaming incremental rollup — a maintained aggregate table across
micro-batches (the "materialized view" of the config pipeline).

Completes the incremental-state trio beside the corpus fingerprint
index (streaming/ingest_dedup.py) and the IVF index
(streaming/ann_index.py): each micro-batch contributes a MERGEABLE
per-key partial aggregate (sum / count / min / max — avg is derived
from sum+count at read time), written to a batch-keyed Hive partition
``table_dir/b=<batch>`` with overwrite, so a replayed batch overwrites
its own previous attempt instead of double-counting — exactly-once
without transactions, the same protocol the dedup index proved.

Read = merge-on-read: one groupBy over the partials (partials are
key-cardinality × batches, not row-cardinality — the fact rows were
collapsed before the write). ``compact()`` bounds the partition count:
it folds every batch partition into the seed partition ``b=-1`` with a
``_COMPACTED_UPTO`` watermark INSIDE the seed data (a column, so it
rides the same atomic parquet overwrite), and readers drop any batch
partition ≤ the watermark — so a crash between the fold and the
best-effort deletion of stale partitions cannot double-count.

Scale shape: per batch one shuffle onto the rollup keys with map-side
partials (the classic combiner); the maintained table grows with KEY
cardinality, not event volume. At 100 TB/day the read-side merge is a
partials-sized aggregation, and compaction keeps it bounded by
key-cardinality regardless of stream lifetime. The reference's closest
surface is the managed tumbling-window table + sink-DB upsert
(/root/reference/sqlflow/managers/window.py:1,
dev/config/examples/kafka.motherduck.idempotent.yml); here the
maintained aggregate is a first-class queryable parquet table.
"""

from __future__ import annotations

import logging
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

logger = logging.getLogger(__name__)

SEED_BATCH = -1  # compaction target partition; never a real batch id
_SUPPORTED = ("sum", "count", "min", "max", "avg")
_WM_COL = "_compacted_upto"


class StreamingRollup:
    """Maintained per-key aggregate table. ``aggs`` maps input column
    -> op in {sum, count, min, max, avg}."""

    def __init__(
        self,
        spark: SparkSession,
        table_dir: str,
        keys: list[str],
        aggs: dict[str, str],
    ):
        bad = {c: op for c, op in aggs.items() if op not in _SUPPORTED}
        if bad:
            raise ValueError(
                f"unsupported rollup ops {bad}; supported: {_SUPPORTED}"
            )
        if not keys or not aggs:
            raise ValueError("rollup needs at least one key and one agg")
        self.spark = spark
        self.table_dir = table_dir
        self.keys = list(keys)
        self.aggs = dict(aggs)

    # ------------------------------------------------------ partials

    def _partial_cols(self):
        """(partial column name, source column, partial op) triples —
        avg stores sum+count partials, everything else stores itself."""
        out = []
        for col, op in sorted(self.aggs.items()):
            if op == "avg":
                out.append((f"{col}__sum", col, "sum"))
                out.append((f"{col}__count", col, "count"))
            else:
                out.append((f"{col}__{op}", col, op))
        # dedupe (sum+avg on the same column share the sum partial)
        seen, uniq = set(), []
        for name, col, op in out:
            if name not in seen:
                seen.add(name)
                uniq.append((name, col, op))
        return uniq

    def _partial_agg(self, df: DataFrame) -> DataFrame:
        exprs = []
        for name, col, op in self._partial_cols():
            if op == "sum":
                exprs.append(F.sum(col).alias(name))
            elif op == "count":
                exprs.append(F.count(col).cast("long").alias(name))
            elif op == "min":
                exprs.append(F.min(col).alias(name))
            elif op == "max":
                exprs.append(F.max(col).alias(name))
        return df.groupBy(*self.keys).agg(*exprs)

    def process_batch(self, df: DataFrame, batch_id: int) -> None:
        """Fold one micro-batch: per-key partials overwrite
        ``b=<batch_id>`` (replay-idempotent). Refuses a batch id at or
        below the compaction watermark — readers would silently ignore
        it (the one way the marker protocol could lose data; streaming
        batch ids only grow, so this only bites a one-shot ``invoke``
        (fixed slot 0) against a previously compacted table)."""
        wm = self._watermark()
        if wm is not None and batch_id <= wm:
            raise ValueError(
                f"rollup batch id {batch_id} is at/below the compaction "
                f"watermark {wm}; readers would ignore its partition. "
                "Use a fresh table_dir (or larger batch ids) after "
                "compacting a table fed by one-shot invokes."
            )
        part = self._partial_agg(df).withColumn(
            _WM_COL, F.lit(None).cast("long")
        )
        part.write.mode("overwrite").parquet(
            f"{self.table_dir}/b={batch_id}"
        )

    def _watermark(self) -> Optional[int]:
        """Cached compaction watermark (batch ids only grow within a
        run; compact() refreshes the cache)."""
        if not hasattr(self, "_wm_cache"):
            try:
                seed = self.spark.read.parquet(
                    f"{self.table_dir}/b={SEED_BATCH}"
                )
                self._wm_cache = seed.agg(F.max(_WM_COL)).first()[0]
            except AnalysisException:
                self._wm_cache = None
        return self._wm_cache

    # --------------------------------------------------------- reads

    def _read_partials(self) -> Optional[DataFrame]:
        try:
            df = self.spark.read.option("basePath", self.table_dir).parquet(
                self.table_dir
            )
        except AnalysisException:
            return None
        if not set(self.keys).issubset(df.columns):
            return None
        # compaction watermark: the seed partition carries the max
        # folded batch id; any surviving stale partition <= it is a
        # leftover of a crashed cleanup and must be ignored.
        wm = (
            df.where(F.col("b") == SEED_BATCH)
            .agg(F.max(_WM_COL))
            .first()[0]
        )
        if wm is not None:
            df = df.where(
                (F.col("b") == SEED_BATCH) | (F.col("b") > F.lit(wm))
            )
        return df

    def _merge_exprs(self):
        exprs = []
        for name, _col, op in self._partial_cols():
            merge_op = F.sum if op in ("sum", "count") else (
                F.min if op == "min" else F.max
            )
            e = merge_op(name)
            if op == "count":
                e = e.cast("long")
            exprs.append(e.alias(name))
        return exprs

    def _merge(self, partials: DataFrame) -> DataFrame:
        merged = partials.groupBy(*self.keys).agg(*self._merge_exprs())
        # final projection: derived avg, user-facing names
        out_cols = [F.col(k) for k in self.keys]
        for col, op in sorted(self.aggs.items()):
            if op == "avg":
                out_cols.append(
                    (
                        F.col(f"{col}__sum").cast("double")
                        / F.col(f"{col}__count").cast("double")
                    ).alias(f"{col}_avg")
                )
            else:
                out_cols.append(F.col(f"{col}__{op}").alias(f"{col}_{op}"))
        return merged.select(*out_cols)

    def read(self) -> Optional[DataFrame]:
        """The maintained aggregate as of all committed batches."""
        partials = self._read_partials()
        return None if partials is None else self._merge(partials)

    # ---------------------------------------------------- compaction

    def compact(self) -> int:
        """Fold every live batch partition into ``b=-1``. Returns the
        number of partitions folded. Crash-safe: the fold lands first
        (with the watermark column set), stale-partition deletion is
        best-effort afterwards — readers honor the watermark either
        way. Run from maintenance, not from the hot path."""
        partials = self._read_partials()
        if partials is None:
            return 0
        live = partials.where(F.col("b") != SEED_BATCH)
        ids = [r[0] for r in live.select("b").distinct().collect()]
        if not ids:
            return 0
        upto = max(ids)
        folded = (
            partials.drop("b")
            .groupBy(*self.keys)
            .agg(*self._merge_exprs())
            .withColumn(_WM_COL, F.lit(upto).cast("long"))
        )
        # localCheckpoint: the fold READS b=-1 and then OVERWRITES it —
        # materialize before the self-referential write
        folded = folded.localCheckpoint(eager=True)
        folded.write.mode("overwrite").parquet(
            f"{self.table_dir}/b={SEED_BATCH}"
        )
        for b in ids:
            try:
                shutil.rmtree(f"{self.table_dir}/b={b}")
            except OSError as e:  # pragma: no cover - best-effort
                logger.warning("rollup compact: could not remove b=%s: %s", b, e)
        self._wm_cache = upto
        return len(ids)
