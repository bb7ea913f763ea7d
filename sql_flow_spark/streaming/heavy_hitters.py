"""Streaming heavy hitters — Misra–Gries summaries maintained across
micro-batches.

The batch operator (functions/textprep.py ``heavy_hitters``) proves
the pattern: per-partition MG summaries → tiny candidate merge →
exact broadcast recount, no full-keyspace shuffle. A stream needs the
same answer CONTINUOUSLY: "which keys exceed share θ of everything
seen so far". This module keeps one MG summary table on disk
(batch-keyed overwrite directories — the ingest-dedup exactly-once
contract) and folds each micro-batch's partition summaries into it.

Guarantee carried across batches: summing MG summaries preserves the
undercount bound — each batch's summaries undercount by ≤ n_b/(K+1),
so the merged counter for key w satisfies
  true(w) − N/(K+1) ≤ merged(w) ≤ true(w)
over the whole stream (N = total rows so far). Every key with
true share > 1/(K+1) therefore survives in the state and clears the
report's upper-bound threshold (no false negatives); a reported key's
true count is bounded within [merged, merged+N/(K+1)], both bounds
are emitted, and ``certain`` marks keys whose LOWER bound already
clears the threshold — uncertainty is surfaced, not hidden behind a
point estimate pretending to be exact.
(The batch operator's exact-recount step needs a second pass over the
data, which a stream cannot replay — the bounds are the honest
streaming substitute.)

Scale shape: per batch, one narrow mapInPandas (≤ K rows per
partition) + a merge groupBy over ≤ K x partitions + prior-candidates
keys. Each ``b=`` directory is a FULL ≤ K-row snapshot; after every
successful write, snapshots older than the immediate predecessor are
pruned (the predecessor survives for crash-replay), so BOTH the row
count and the directory count stay bounded for the stream's lifetime.
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

logger = logging.getLogger(__name__)

DEFAULT_K = 63


def mg_partition_summaries(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """≤ k (key, c) rows per partition via classic Misra–Gries."""

    def _mg(batches):
        counters: dict = {}
        for pdf in batches:
            for w in pdf[key_col]:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < k:
                    counters[w] = 1
                else:
                    dead = [x for x in counters if counters[x] == 1]
                    for x in counters:
                        counters[x] -= 1
                    for x in dead:
                        del counters[x]
        if counters:
            yield pd.DataFrame(
                {"key": list(counters), "c": list(counters.values())}
            )

    # cast to string BEFORE the Arrow boundary: the declared output
    # schema is `key string`, and a bigint key column (e.g. a user_id
    # stream) would otherwise raise an Arrow type error inside the UDF
    return df.select(F.col(key_col).cast("string").alias(key_col)).mapInPandas(
        _mg, "key string, c long"
    )


def _mg_compact(rows: list[tuple[str, int]], k: int) -> list[tuple[str, int]]:
    """Reduce a merged counter table back to ≤ k entries, preserving
    the MG bound: repeatedly subtract the (k+1)-th largest count from
    the top k+1 and drop non-positives — equivalent to running MG over
    the expanded multiset, O(n log n) on a k-x-partitions-sized list."""
    rows = sorted(rows, key=lambda t: (-t[1], t[0]))
    while len(rows) > k:
        cut = rows[k][1]  # (k+1)-th largest
        rows = [(w, c - cut) for w, c in rows if c - cut > 0]
        rows.sort(key=lambda t: (-t[1], t[0]))
    return rows


class StreamingHeavyHitters:
    """Disk-backed MG state folded per micro-batch.

    Layout: ``state_dir/b=<batch>/`` holds the FULL compacted summary
    as of that batch (plus ``n`` total rows seen) — overwrite-idempotent
    under replay, and the newest ``b=`` partition is the whole state, so
    recovery reads one directory."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        key_col: str,
        k: int = DEFAULT_K,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.key_col = key_col
        self.k = k

    def _latest(self, before_batch: int):
        """(batch_id, rows, n) of the newest state strictly older than
        ``before_batch`` (replay protection, as in ingest_dedup)."""
        try:
            df = self.spark.read.parquet(self.state_dir)
        except AnalysisException:
            return None, [], 0
        df = df.where(F.col("b") < F.lit(before_batch))
        head = df.agg(F.max("b").alias("mb")).collect()[0]["mb"]
        if head is None:
            return None, [], 0
        rows = df.where(F.col("b") == head).collect()
        n = rows[0]["n"] if rows else 0
        return head, [(r["key"], r["c"]) for r in rows], n

    def _prune(self, batch_id: int, pred: int | None) -> None:
        """Drop state snapshots older than the predecessor snapshot
        this fold actually read (``pred``, from _latest).

        Each ``b=<batch>`` directory is a FULL snapshot, so only the
        newest matters for reads — but the read predecessor must
        survive so a crash-replay of ``batch_id`` (which reads state
        strictly older than itself) still finds its input. Pruning
        relative to the READ predecessor (not batch_id - 1) keeps
        replay safe under gapped batch ids too: a manual fold 0 then 5
        keeps b=0 until batch 5's successor commits (ADVICE r9).
        Without pruning, the per-batch listing cost of _latest grows
        linearly with stream lifetime even though the row count never
        does."""
        import shutil

        keep_from = pred if pred is not None else batch_id
        try:
            names = os.listdir(self.state_dir)
        except OSError:  # pragma: no cover - dir vanished
            return
        for nm in names:
            if not nm.startswith("b="):
                continue
            try:
                b = int(nm[2:])
            except ValueError:
                continue
            if b < keep_from:
                try:
                    shutil.rmtree(os.path.join(self.state_dir, nm))
                except OSError as e:  # pragma: no cover - best-effort
                    logger.warning(
                        "heavy-hitters prune: could not remove %s: %s", nm, e
                    )

    def fold_batch(self, batch_df: DataFrame, batch_id: int) -> dict:
        """Fold one micro-batch; returns the current heavy-hitter
        report {key: {count_lo, count_hi, share_lo}} plus totals."""
        summaries = (
            mg_partition_summaries(batch_df, self.key_col, self.k)
            .groupBy("key")
            .agg(F.sum("c").alias("c"))
            .collect()
        )
        batch_n = batch_df.count()
        pred, prior, prior_n = self._latest(batch_id)
        merged: dict = dict(prior)
        for r in summaries:
            merged[r["key"]] = merged.get(r["key"], 0) + r["c"]
        compact = _mg_compact(list(merged.items()), self.k)
        n = prior_n + batch_n
        state = self.spark.createDataFrame(
            [(w, int(c), int(n)) for w, c in compact] or [("", 0, int(n))],
            "key string, c long, n long",
        )
        state.coalesce(1).write.mode("overwrite").parquet(
            f"{self.state_dir}/b={batch_id}"
        )
        self._prune(batch_id, pred)
        slack = n // (self.k + 1)
        # No false negatives: true(w) <= count_hi, so every key whose
        # true share exceeds 1/(K+1) has count_hi past the threshold
        # and is reported; `certain` marks keys whose LOWER bound
        # already clears it (guaranteed hitters).
        report = {
            w: {
                "count_lo": c,
                "count_hi": c + slack,
                "share_lo": c / n if n else 0.0,
                "certain": c * (self.k + 1) > n,
            }
            for w, c in compact
            if w and (c + slack) * (self.k + 1) > n
        }
        return {"n": n, "batch_n": batch_n, "hitters": report}

    def attach(
        self,
        stream: DataFrame,
        checkpoint_dir: str,
        on_batch: Optional[Callable[[int, dict], None]] = None,
        available_now: bool = True,
        processing_time: str | None = None,
    ):
        def _step(batch_df: DataFrame, batch_id: int) -> None:
            result = self.fold_batch(batch_df, batch_id)
            logger.info(
                "heavy-hitters batch %s: n=%s, %s hitters",
                batch_id, result["n"], len(result["hitters"]),
            )
            if on_batch is not None:
                on_batch(batch_id, result)

        writer = (
            stream.writeStream.foreachBatch(_step)
            .queryName("heavy-hitters")
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()
