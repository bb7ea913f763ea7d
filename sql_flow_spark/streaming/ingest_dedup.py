"""Streaming ingestion dedup — the production shape of exact corpus
dedup, run per micro-batch.

Marries the two families the batch layer already proves: the
``incremental_dedup`` operator (functions/dedup.py — batch
fingerprints probed against the corpus's DISTINCT fingerprint index,
first-id-wins within the batch) and the Pipeline's foreachBatch
engine. Every micro-batch is scored against the fingerprint index of
everything ingested BEFORE it, verdicts are emitted per batch, and the
batch's new fingerprints are appended to the index — so a document
that arrived in micro-batch 3 is a ``dup_of_corpus`` when it arrives
again in micro-batch 7, across restarts. This is the reference's
idempotent-pipeline idea (dev/config/examples/
kafka.motherduck.idempotent.yml — dedup-on-insert in the sink DB)
applied to the LLM-corpus ingest brief, with the index as a first-class
queryable table instead of a DB constraint.

Exactly-once without transactions: both the verdict output and the
index append for micro-batch N go to batch-keyed directories
(``.../b=N``) written with ``overwrite`` — a replay of batch N (crash
between the writes and the checkpoint commit) overwrites its own
previous attempt instead of duplicating it, and scoring EXCLUDES index
partition ``b=N`` so a half-written previous attempt can never make a
batch's own rows look like corpus duplicates. Directory names are
Hive-style partitions, so the index and the verdict log are both plain
``spark.read.parquet(root)`` tables with a ``b`` partition column.

Scale shape: the index contributes only its DISTINCT fingerprint
column (16 bytes/doc); the probe is one equi-join on ``f`` per batch —
O(batch + index-probe), never O(corpus). At 100 TB the index is a
bucketed table on ``f`` (plans/bucketing.py) so the probe join is
exchange-free on the index side; the per-batch partition layout here
keeps writes idempotent, and ``FingerprintIndex.compact()`` (the
marker-commit protocol shared with the rollup —
streaming/compaction.py) folds history into one DISTINCT slot so the
directory count stays bounded regardless of stream lifetime.
"""

from __future__ import annotations

import logging
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from sql_flow_spark.functions.textops import fingerprint
from sql_flow_spark.streaming.compaction import (
    MarkerCommit,
    assert_no_live_writer,
    lease_heartbeat,
)

logger = logging.getLogger(__name__)

# Partition key for index rows seeded from a pre-existing corpus
# (never excluded by replay protection: -1 is not a valid batch id).
SEED_BATCH = -1
# Marker-commit fold slots (streaming/compaction.py). Distinct from
# SEED_BATCH: b=-1 is the bootstrap corpus partition, the slots are
# where compact() folds history (bootstrap included) into.
FOLD_SLOTS = (-101, -102)


class FingerprintIndex:
    """The corpus fingerprint index: Hive-partitioned parquet
    ``index_dir/b=<batch>/`` holding one column ``f`` (md5 of the
    normalized text). Batch-keyed overwrite makes every write
    idempotent under streaming replay."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self._mc = MarkerCommit(index_dir, FOLD_SLOTS)

    def read(self, exclude_batch: Optional[int] = None) -> Optional[DataFrame]:
        """The index as of 'before batch ``exclude_batch``' (replay
        protection: a crashed attempt of the same batch id must not
        count as corpus). None when the index is empty.

        Marker-aware: once a compaction has committed, the folded
        history lives in the active slot and every partition at or
        below the watermark (including the bootstrap b=-1) is dead —
        reading them would double-count crash leftovers the best-effort
        cleanup missed."""
        try:
            df = self.spark.read.parquet(self.index_dir)
        except AnalysisException:
            return None  # nothing ingested yet
        if "f" not in df.columns:  # empty dir discovered with no schema
            return None
        wm, slot = self._mc.marker()
        if wm is not None:
            df = df.where(
                (F.col("b") == slot)
                | ((F.col("b") >= 0) & (F.col("b") > wm))
            )
        if exclude_batch is not None:
            df = df.where(F.col("b") != F.lit(exclude_batch))
        return df.select("f")

    def append(self, new_fps: DataFrame, batch_id: int) -> None:
        """Overwrite partition ``b=batch_id`` with the batch's new
        DISTINCT fingerprints (idempotent under replay). Refuses a
        batch id at/below the compaction watermark and heartbeats the
        writer lease (streaming/compaction.py)."""
        if batch_id >= 0:
            self._mc.check_batch_writable(batch_id)
        with lease_heartbeat(self.index_dir):
            (
                new_fps.select("f")
                .distinct()
                .write.mode("overwrite")
                .parquet(f"{self.index_dir}/b={batch_id}")
            )

    def seed(self, corpus: DataFrame, text_col: str = "text") -> None:
        """Bootstrap from an existing corpus (the batch world's
        dedup_exact output feeding the streaming world's index)."""
        wm, _slot = self._mc.marker()
        if wm is not None:
            raise ValueError(
                f"index {self.index_dir} already has a compaction "
                "watermark; the bootstrap partition b=-1 would be "
                "invisible to marker-filtered readers. Seed a fresh "
                "index dir."
            )
        fps = corpus.select(fingerprint(text_col).alias("f"))
        self.append(fps, SEED_BATCH)

    def compact(self, force: bool = False) -> int:
        """Fold committed batch partitions (and the bootstrap, if any)
        into the inactive slot; commit by atomic marker rename; remove
        dead directories best-effort. The newest live batch is never
        folded (replay protection — see streaming/compaction.py).
        Returns the number of batch partitions folded. The fold is a
        DISTINCT over fingerprints, so the folded slot is no bigger
        than the unique corpus."""
        if not force:
            assert_no_live_writer(self.index_dir)
        fold_ids, upto = self._mc.foldable()
        if not fold_ids:
            return 0
        wm, slot = self._mc.marker()
        try:
            df = self.spark.read.parquet(self.index_dir)
        except AnalysisException:  # pragma: no cover - dirs vanished
            return 0
        sources = [F.col("b").isin(fold_ids)]
        if slot is not None:
            sources.append(F.col("b") == slot)
        seed_present = wm is None and self._mc.has_dir(SEED_BATCH)
        if seed_present:
            sources.append(F.col("b") == SEED_BATCH)
        cond = sources[0]
        for c in sources[1:]:
            cond = cond | c
        target = self._mc.inactive_slot(slot)
        folded = df.where(cond).select("f").distinct()
        folded.write.mode("overwrite").parquet(f"{self.index_dir}/b={target}")
        self._mc.write_marker(upto, target)  # COMMIT
        # the bootstrap dir is dead once ANY marker exists (first fold
        # absorbed it) — clean it even if it is a crash leftover from a
        # previous compact's interrupted cleanup
        self._mc.cleanup(
            upto,
            slot if slot != target else None,
            extra=[SEED_BATCH] if self._mc.has_dir(SEED_BATCH) else [],
        )
        return len(fold_ids)


def probe_index(
    fp: DataFrame, index: Optional[DataFrame], id_col: str
) -> DataFrame:
    """The replay-sensitive duplicate-probe plumbing, defined ONCE for
    every index-backed verdict (score_batch here, CurationGate in
    streaming/curation_gate.py): takes a batch of (id, f, *extras)
    rows and returns the same rows with ``_in_corpus`` (TRUE when the
    fingerprint is already indexed, NULL otherwise — NULL so the OR
    short-circuit in verdict CASEs behaves) and ``_first_id`` (MIN id
    per fingerprint within the batch, the first-id-wins tiebreak)."""
    firsts = fp.groupBy("f").agg(F.min(id_col).alias("_first_id"))
    if index is not None:
        probed = fp.join(
            index.distinct().withColumn("_in_corpus", F.lit(True)),
            "f",
            "left",
        )
    else:
        probed = fp.withColumn("_in_corpus", F.lit(None).cast("boolean"))
    return probed.join(firsts, "f")


def attach_foreach(
    process,
    name: str,
    stream: DataFrame,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Run a (batch_df, batch_id) -> DataFrame processor as a
    standalone foreachBatch streaming query (shared by IngestDedup
    and CurationGate)."""

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        n = process(batch_df, batch_id).count()
        logger.info("%s batch %s: %s verdicts", name, batch_id, n)

    writer = (
        stream.writeStream.foreachBatch(_step)
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def score_batch(
    fp: DataFrame, index: Optional[DataFrame], id_col: str
) -> DataFrame:
    """incremental_dedup's verdict semantics on one bounded batch of
    (id, f) rows: ``dup_of_corpus`` (fingerprint already indexed —
    authoritative even if also repeated in-batch), ``dup_in_batch``
    (first id wins within the batch), else ``new``."""
    return probe_index(fp, index, id_col).select(
        id_col,
        "f",
        F.when(F.col("_in_corpus"), F.lit("dup_of_corpus"))
        .when(F.col(id_col) > F.col("_first_id"), F.lit("dup_in_batch"))
        .otherwise(F.lit("new"))
        .alias("verdict"),
    )


class IngestDedup:
    """foreachBatch processor: score, emit verdicts, grow the index.

    ``out_dir`` (optional) receives the per-batch verdict log at
    ``out_dir/b=<batch>/`` (same idempotent overwrite contract);
    readable as one partitioned table."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        out_dir: Optional[str] = None,
    ):
        self.spark = spark
        self.index = FingerprintIndex(spark, index_dir)
        self.id_col = id_col
        self.text_col = text_col
        self.out_dir = out_dir

    def process(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        """Idempotent per-batch step. Returns the verdicts DataFrame
        (already written when out_dir is set)."""
        fp = batch_df.select(
            F.col(self.id_col),
            fingerprint(self.text_col).alias("f"),
        )
        # One batch-sized materialization, three consumers (verdict
        # join, firsts agg, index append). localCheckpoint not persist:
        # no CacheManager entry to leak across micro-batches.
        fp = fp.localCheckpoint(eager=True)
        verdicts = score_batch(
            fp, self.index.read(exclude_batch=batch_id), self.id_col
        )
        if self.out_dir is not None:
            verdicts.write.mode("overwrite").parquet(
                f"{self.out_dir}/b={batch_id}"
            )
            # re-read: cheaper than recomputing the probe join if the
            # caller inspects the result, and exactly what was written
            verdicts = self.spark.read.parquet(f"{self.out_dir}/b={batch_id}")
        # The index grows by fingerprints NOT already present (new +
        # the batch-first copy of in-batch dups share one f row).
        new_fps = verdicts.where(F.col("verdict") != "dup_of_corpus").select("f")
        self.index.append(new_fps, batch_id)
        return verdicts

    def attach(
        self,
        stream: DataFrame,
        checkpoint_dir: str,
        available_now: bool = True,
        processing_time: str | None = None,
    ) -> StreamingQuery:
        """Run as a standalone streaming query over ``stream``."""
        return attach_foreach(
            self.process, "ingest-dedup", stream, checkpoint_dir,
            available_now, processing_time,
        )
