"""Incremental ANN (IVF) index maintenance — append without retrain,
with a drift trigger for when retraining is due.

The batch ANN family (functions/similarity.py) covers build-and-query:
``ivf_centroids`` trains the coarse quantizer on a bounded sample,
``ann_ivf_topk`` assigns + probes in one job. A 100 TB ingest pipeline
needs the third verb: APPEND. New vectors arriving per micro-batch are
assigned to the EXISTING cells (one Arrow-batched matmul against the
frozen centroids — no retraining, no index rebuild), and written to
the index's partitioned layout. Retraining is a deliberate, monitored
event, not a per-batch cost: each appended batch's cell-occupancy
histogram is scored against the occupancy profile frozen at train
time with a categorical PSI (the drift family's metric over cells
instead of deciles); when the data distribution moves, cells go
lopsided, PSI crosses the act threshold, and the index flags
``needs_retrain`` — the signal to schedule a rebuild, exactly how
production vector stores (faiss-on-object-store layouts) handle
distribution shift.

Layout: ``index_dir/b=<batch>/cell=<c>/*.parquet`` — Hive-partitioned
on batch AND cell, so (a) a replayed micro-batch overwrites only its
own ``b=`` directory (the ingest-dedup exactly-once contract), and
(b) a query probing ``nprobe`` cells prunes every other cell's files
at the scan (PartitionFilters, no data read). Centroids + the
reference occupancy live in ``_meta.json`` beside the data — the
index is self-describing and reload-able after restart.
``compact()`` (the marker-commit protocol shared with the rollup and
the fingerprint index — streaming/compaction.py) folds batch
partitions into a cell-partitioned slot, so the directory count stays
bounded by k cells + the live tail regardless of stream lifetime.

Scale shape: append is a narrow map (assign UDF) + one partitioned
write — no shuffle, no driver traffic beyond the k-sized occupancy
counts. Search reads only nprobe/k of the index (partition pruning),
broadcasts the query batch, exact-reranks inside probed cells — the
ann_ivf_topk plan against a disk-resident, incrementally-grown index.

The serving tier (r13): ``build(pq_k=...)`` additionally trains
residual-PQ codebooks (faiss IVFADC — ann_ivfpq_topk's quantizer) so
every row carries a ``codes`` column; ``search_pq`` ranks candidates
by asymmetric distance reading ONLY the codes (partition- and
column-pruned scan) and exact-reranks the shortlist;
``recall_audit(pq=True)`` grades that live path against brute force.
``rebuild()`` is the retrain verb the PSI flag schedules — blue/green
into a fresh directory (pipeline.ann_index.rebuild_on_drift automates
the rotation behind a generation root + atomic CURRENT pointer).
"""

from __future__ import annotations

import json
import logging
import math
import os
from typing import Callable, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql_flow_spark.functions.similarity import (
    dot_dec_fast,
    ivf_assign,
    ivf_centroids,
    safe_cos,
    sq_norm_dec,
)
from sql_flow_spark.streaming.compaction import (
    MarkerCommit,
    assert_no_live_writer,
    lease_heartbeat,
)

logger = logging.getLogger(__name__)

# PSI act threshold — same 0.25 "act" level as the drift family
# (operators/drift.py psi_drift docstring has the scale).
RETRAIN_PSI = 0.25

_META = "_meta.json"
SEED_BATCH = -1
# Marker-commit fold slots (streaming/compaction.py); distinct from
# SEED_BATCH, which is the build()-time corpus partition.
FOLD_SLOTS = (-101, -102)


def occupancy_psi(
    batch_counts: dict[int, int], ref_counts: dict[int, int], k: int
) -> float:
    """Categorical PSI over cell ids (k categories), smoothed +0.5 per
    cell so empty cells stay finite — the cell-space analog of
    psi_drift's binned PSI. Driver-side: both inputs are k-sized."""
    bt = sum(batch_counts.values()) + 0.5 * k
    rt = sum(ref_counts.values()) + 0.5 * k
    psi = 0.0
    for c in range(k):
        pb = (batch_counts.get(c, 0) + 0.5) / bt
        pr = (ref_counts.get(c, 0) + 0.5) / rt
        psi += (pb - pr) * math.log(pb / pr)
    return psi


def prune_generations(root: str, keep: int = 2) -> list[int]:
    """Disk hygiene for the rebuild_on_drift generation layout: delete
    ``g<N>`` directories older than the newest ``keep`` generations at
    or below CURRENT (generations ABOVE the pointer are never touched —
    an in-flight rotation owns them). Keeping at least 2 preserves the
    blue/green contract: readers that resolved CURRENT just before a
    rotation can still be scanning the previous generation. Returns the
    pruned generation numbers. Pure filesystem — call it from the
    maintenance cadence that also runs compact()."""
    import re
    import shutil

    if keep < 1:
        raise ValueError("keep must be >= 1")
    cur_path = os.path.join(root, "CURRENT")
    if not os.path.exists(cur_path):
        return []
    with open(cur_path) as f:
        current = int(f.read().strip())
    gens = sorted(
        int(m.group(1))
        for d in os.listdir(root)
        if (m := re.fullmatch(r"g(\d+)", d))
        and os.path.isdir(os.path.join(root, d))
    )
    victims = [g for g in gens if g <= current][:-keep]
    for g in victims:
        shutil.rmtree(os.path.join(root, f"g{g}"), ignore_errors=True)
        logger.info("ann index %s: pruned generation g%s", root, g)
    return victims


class IncrementalIVF:
    """A disk-resident IVF(-PQ) index that grows per micro-batch.

    Build once (``build``), append forever (``append_batch`` /
    ``attach``), search anytime (``search`` exact-in-cell /
    ``search_pq`` ADC), ``rebuild()`` when ``needs_retrain`` fires."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        centroids,
        ref_occupancy: dict[int, int],
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        nprobe: int = 4,
        pq_sub_dim: int = 8,
        pq_codebook=None,
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.centroids = centroids  # (k, dim) ndarray, L2-normalized
        self.ref_occupancy = dict(ref_occupancy)
        self.id_col = id_col
        self.emb_col = emb_col
        self.nprobe = nprobe
        self.pq_sub_dim = pq_sub_dim
        # (n_sub, pq_k, pq_sub_dim) ndarray or None (PQ off). NaN rows
        # mark codewords that lost every member during training — the
        # encoder never selects them, the LUT zeroes them.
        self.pq_codebook = pq_codebook
        self._mc = MarkerCommit(index_dir, FOLD_SLOTS)
        self._index_schema = None  # memoized on first index_df() read

    @property
    def k(self) -> int:
        return len(self.centroids)

    @property
    def pq(self) -> bool:
        return self.pq_codebook is not None

    # ------------------------------------------------------ lifecycle

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        index_dir: str,
        corpus: DataFrame,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        k: int = 16,
        nprobe: int = 4,
        pq_k: int = 0,
        pq_sub_dim: int = 8,
    ) -> "IncrementalIVF":
        """Train the coarse quantizer on the corpus (bounded sample —
        ivf_centroids' contract), assign + write the corpus as the
        seed partition, freeze the occupancy profile. With ``pq_k`` > 0
        the build also trains residual-PQ codebooks (faiss IVFADC —
        ann_ivfpq_topk's quantizer pointed at the disk index): every
        written row then carries a ``codes`` column (one codeword id
        per ``pq_sub_dim``-wide subspace of the vector's residual to
        its cell centroid), and ``search_pq`` serves ADC-shortlisted
        queries reading those codes instead of raw vectors."""
        cent = ivf_centroids(corpus, emb_col=emb_col, id_col=id_col, k=k)
        idx = cls(
            spark, index_dir, cent, {}, id_col=id_col,
            emb_col=emb_col, nprobe=nprobe, pq_sub_dim=pq_sub_dim,
        )
        if pq_k > 0:
            idx.pq_codebook = idx._train_pq(corpus, pq_k)
        occ = idx._write_batch(corpus, SEED_BATCH)
        idx.ref_occupancy = occ
        idx._save_meta()
        return idx

    def _train_pq(self, corpus: DataFrame, pq_k: int):
        """Train per-subspace codebooks on the CELL RESIDUALS of the
        build corpus (x − c_cell — residuals are small, so codewords
        describe within-cell structure; the flat-PQ variant measured
        recall 0.075 in ann_ivfpq_topk's A/B). Training is
        functions/similarity._pq_train's pinned Lloyd trajectory; seeds
        are the pq_k smallest vec_ids (deterministic, id-contract-free).
        Returns the (n_sub, pq_k, sub_dim) codebook; codewords that
        lost every member stay NaN (never encoded to, zeroed in the
        LUT).

        r14 optimization: quantizer training is a bounded-input job by
        construction (faiss trains coarse and PQ quantizers on a
        corpus sample, never the corpus — ivf_centroids already makes
        that argument for the coarse stage). When the build corpus
        fits the driver bound, collect it ONCE and run the identical
        fixed-point trajectory in numpy (_pq_train_driver in
        functions/similarity.py — bit-equal by construction, verified
        bit-for-bit against the distributed trainer at sf0.01/sf0.1):
        the exploded-fact checkpoint, the seed collect and the
        per-iteration distributed Lloyd jobs (~10 Spark jobs) collapse
        into one bounded collect. Beyond the bound the distributed
        trajectory runs unchanged — the same small-side/large-side
        switch a broadcast join makes."""
        import numpy as np

        from sql_flow_spark.functions.similarity import (
            _PQ_DRIVER_TRAIN_CAP,
            _ivf_assign_np,
            _pq_train_driver,
            _TwinOverflow,
        )

        dim = len(self.centroids[0])
        sd = self.pq_sub_dim
        if dim % sd:
            raise ValueError(
                f"embedding dim {dim} is not divisible by pq_sub_dim {sd}"
            )
        rows = (
            corpus.select(self.id_col, self.emb_col)
            .limit(_PQ_DRIVER_TRAIN_CAP + 1)
            .collect()
        )
        clean = len(rows) <= _PQ_DRIVER_TRAIN_CAP and all(
            r[1] is not None
            and len(r[1]) == dim
            and all(v is not None for v in r[1])
            for r in rows
        )
        if clean:
            ids = np.array([r[0] for r in rows], dtype=np.int64)
            if len(np.unique(ids)) == len(ids):  # dup ids -> distributed
                embs = np.array([r[1] for r in rows], dtype=np.float64)
                if np.all(np.isfinite(embs)):
                    cells = _ivf_assign_np(embs, self.centroids, 1)[:, 0]
                    res = embs - self.centroids[cells]
                    try:
                        _, book = _pq_train_driver(ids, res, pq_k, sd)
                        return book
                    except _TwinOverflow:
                        pass  # magnitudes past the exactness bound
        return self._train_pq_distributed(corpus, pq_k)

    def _train_pq_distributed(self, corpus: DataFrame, pq_k: int):
        """The at-scale trainer: similarity._pq_train's distributed
        Lloyd over the exploded residual fact (see _train_pq)."""
        import numpy as np

        from sql_flow_spark.functions.similarity import PQ_ITERS, _pq_train

        dim = len(self.centroids[0])
        sd = self.pq_sub_dim
        n_sub = dim // sd
        from sql_flow_spark.functions.mat import materialize_once
        from sql_flow_spark.localdf import local_df

        cent_df = local_df(
            self.spark,
            [
                (int(c), int(d), float(v))
                for c, row in enumerate(self.centroids)
                for d, v in enumerate(row)
            ],
            "cell int, dim int, cval double",
        )
        assigned = self._assigned_base(corpus)
        # checkpointed ONCE (r13): _pq_train reads this fact twice per
        # iteration plus the seed join — without the materialization
        # every pass re-ran the cell-assign pandas UDF and the
        # centroid join; partitioned at core count because the
        # training aggregates are CPU-bound on tiny bytes (see
        # similarity._lloyd)
        fact = materialize_once(
            assigned.select(
                "vec_id", "cell",
                F.posexplode("embedding").alias("dim", "rawval"),
            )
            .join(F.broadcast(cent_df), ["cell", "dim"])
            .select(
                "vec_id",
                F.col("dim").cast("int").alias("dim"),
                F.floor(F.col("dim") / F.lit(sd)).cast("int").alias("sub"),
                (F.col("rawval") - F.col("cval")).alias("val"),
            )
            .repartition(
                self.spark.sparkContext.defaultParallelism, "vec_id"
            )
        )
        seed_ids = [
            r[0]
            for r in fact.select("vec_id")
            .distinct()
            .orderBy("vec_id")
            .limit(pq_k)
            .collect()
        ]
        _, cb = _pq_train(fact, k=pq_k, iters=PQ_ITERS, seed_ids=seed_ids)
        book = np.full((n_sub, pq_k, sd), np.nan, dtype=np.float64)
        for r in cb.collect():
            book[r["dim"] // sd, r["cluster"], r["dim"] % sd] = r["c"]
        return book

    @classmethod
    def load(cls, spark: SparkSession, index_dir: str) -> "IncrementalIVF":
        import numpy as np

        with open(os.path.join(index_dir, _META)) as f:
            meta = json.load(f)
        book = meta.get("pq_codebook")
        return cls(
            spark,
            index_dir,
            np.array(meta["centroids"], dtype=np.float64),
            {int(c): n for c, n in meta["ref_occupancy"].items()},
            id_col=meta["id_col"],
            emb_col=meta["emb_col"],
            nprobe=meta["nprobe"],
            pq_sub_dim=meta.get("pq_sub_dim", 8),
            pq_codebook=(
                None if book is None
                else np.array(book, dtype=np.float64)
            ),
        )

    def _save_meta(self) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        book = None
        if self.pq_codebook is not None:
            # JSON has no NaN — dead codewords serialize as null
            book = [
                [
                    [None if v != v else float(v) for v in cw]
                    for cw in sub
                ]
                for sub in self.pq_codebook
            ]
        with open(os.path.join(self.index_dir, _META), "w") as f:
            json.dump(
                {
                    "centroids": [list(map(float, c)) for c in self.centroids],
                    "ref_occupancy": self.ref_occupancy,
                    "id_col": self.id_col,
                    "emb_col": self.emb_col,
                    "nprobe": self.nprobe,
                    "pq_sub_dim": self.pq_sub_dim,
                    "pq_codebook": book,
                },
                f,
            )

    def rebuild(
        self,
        new_index_dir: str,
        k: int | None = None,
        nprobe: int | None = None,
        pq_k: int | None = None,
        pq_sub_dim: int | None = None,
    ) -> "IncrementalIVF":
        """The RETRAIN verb — what ``needs_retrain`` schedules: train
        fresh coarse (and, if enabled, residual-PQ) quantizers on the
        CURRENT index contents and seed a NEW index directory with
        them, so the occupancy profile re-freezes around the data that
        actually arrived. Blue/green by design: an object-store index
        cannot be retrained in place while readers probe it, so the
        old directory stays live until the caller swaps serving to the
        returned index and deletes the old path. Parameters default to
        the current index's (pq_k from the stored codebook shape);
        duplicate vec_ids (re-inserts) collapse to one row, making the
        rebuild also the point where re-inserted vectors stop being
        double-stored.

        Scale shape: one pass over the old index (the corpus read),
        then build()'s budget — a bounded-sample centroid fit, the
        PQ Lloyd trajectory on the residual fact, and one partitioned
        seed write."""
        if pq_k is None and self.pq:
            pq_k = self.pq_codebook.shape[1]
        corpus = (
            self.index_df()
            .select(
                F.col("vec_id").alias(self.id_col),
                F.col("embedding").alias(self.emb_col),
            )
            .dropDuplicates([self.id_col])
        )
        return IncrementalIVF.build(
            self.spark,
            new_index_dir,
            corpus,
            id_col=self.id_col,
            emb_col=self.emb_col,
            k=k if k is not None else self.k,
            nprobe=nprobe if nprobe is not None else self.nprobe,
            pq_k=pq_k or 0,
            pq_sub_dim=(
                pq_sub_dim if pq_sub_dim is not None else self.pq_sub_dim
            ),
        )

    # -------------------------------------------------------- append

    def _assigned_base(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.col(self.id_col).alias("vec_id"),
            F.col(self.emb_col).alias("embedding"),
            F.sqrt(sq_norm_dec(F.col(self.emb_col))).alias("nrm"),
            ivf_assign(F.col(self.emb_col), self.centroids, 1)[0].alias("cell"),
        )

    def _assigned(self, df: DataFrame) -> DataFrame:
        out = self._assigned_base(df)
        if self.pq:
            out = out.withColumn(
                "codes", self._pq_encode(F.col("embedding"), F.col("cell"))
            )
        return out

    def _pq_encode(self, emb, cell):
        """Residual-PQ encoder: per row, residual = x − c_cell, then
        per subspace the nearest codeword id (L2, ties → lowest id).
        One Arrow-batched numpy pass per batch — centroids + codebook
        ride the closure (k*dim + n_sub*pq_k*sub_dim doubles,
        broadcast-sized); map-only, no shuffle: append stays O(batch)."""
        from pyspark.sql.types import ArrayType, IntegerType

        cent = self.centroids
        book = self.pq_codebook  # (n_sub, pq_k, sd); NaN = dead codeword
        sd = self.pq_sub_dim
        n_sub = book.shape[0]

        @F.pandas_udf(ArrayType(IntegerType()))
        def _enc(embs: pd.Series, cells: pd.Series) -> pd.Series:
            mat = np.stack(embs.to_numpy()).astype(np.float64)
            res = mat - cent[cells.to_numpy(dtype=np.int64)]
            out = np.empty((len(mat), n_sub), dtype=np.int32)
            for s in range(n_sub):
                seg = res[:, s * sd:(s + 1) * sd]  # (n, sd)
                d = ((seg[:, None, :] - book[s][None, :, :]) ** 2).sum(-1)
                d = np.where(np.isnan(d), np.inf, d)  # dead codewords
                out[:, s] = np.argmin(d, axis=1)
            return pd.Series(list(out))

        return _enc(emb, cell)

    def _write_batch(self, df: DataFrame, batch_id: int) -> dict[int, int]:
        """Assign + write one batch to ``b=<id>`` (idempotent overwrite,
        cell-partitioned). Returns the batch's cell occupancy (k-sized
        driver transfer — the only collect on this path). Refuses a
        batch id at/below the compaction watermark and heartbeats the
        writer lease (streaming/compaction.py)."""
        if batch_id >= 0:
            self._mc.check_batch_writable(batch_id)
        elif self._mc.marker()[0] is not None:
            raise ValueError(
                f"index {self.index_dir} already has a compaction "
                "watermark; a build()-time seed partition would be "
                "invisible to marker-filtered readers. Build into a "
                "fresh index dir."
            )
        # Align the write layout with partitionBy (guide §6): without
        # this, every upstream task writes a file into every cell dir
        # (tasks × k small files — after the r13 embeddings scan
        # spread, 32×16 per batch; the occupancy footer pass and every
        # index_df() read then pay per-file costs: the read-back stage
        # profiled 882 tasks). One cheap batch-sized shuffle keyed on
        # cell collapses it to one file per cell, the shape a 100 TB
        # partitioned index write needs anyway.
        assigned = self._assigned(df).repartition("cell")
        with lease_heartbeat(self.index_dir):
            (
                assigned.write.mode("overwrite")
                .partitionBy("cell")
                .parquet(f"{self.index_dir}/b={batch_id}")
            )
        # occupancy from what was written — replay-consistent by
        # construction. r13: read per-cell row counts from the parquet
        # FOOTERS driver-side (k cell dirs, metadata-only reads)
        # instead of a Spark scan+groupBy job over the fresh batch —
        # the same numbers (footer num_rows IS the written row count),
        # ~two full Spark jobs cheaper per append/build; at object-
        # store scale this is the standard list+footer pass over one
        # batch directory, O(files in the batch).
        import pyarrow.parquet as pq

        base = f"{self.index_dir}/b={batch_id}"
        occ: dict[int, int] = {}
        for d in os.listdir(base):
            if not d.startswith("cell="):
                continue
            cell = int(d.split("=", 1)[1])
            n = 0
            cdir = os.path.join(base, d)
            for fn in os.listdir(cdir):
                if fn.endswith(".parquet") and not fn.startswith((".", "_")):
                    n += pq.ParquetFile(
                        os.path.join(cdir, fn)
                    ).metadata.num_rows
            if n:
                occ[cell] = n
        return occ

    def append_batch(self, df: DataFrame, batch_id: int) -> dict:
        """Append one micro-batch without retraining. Returns
        ``{"n", "psi", "needs_retrain", "occupancy"}`` — the drift
        verdict for the monitoring loop."""
        occ = self._write_batch(df, batch_id)
        psi = occupancy_psi(occ, self.ref_occupancy, self.k)
        verdict = {
            "n": sum(occ.values()),
            "psi": psi,
            "needs_retrain": psi > RETRAIN_PSI,
            "occupancy": occ,
        }
        if verdict["needs_retrain"]:
            logger.warning(
                "ann index %s: batch %s occupancy PSI %.3f > %.2f — "
                "schedule a retrain",
                self.index_dir, batch_id, psi, RETRAIN_PSI,
            )
        return verdict

    def attach(
        self,
        stream: DataFrame,
        checkpoint_dir: str,
        on_batch: Optional[Callable[[int, dict], None]] = None,
        available_now: bool = True,
        processing_time: str | None = None,
    ):
        """Maintain the index from a streaming DataFrame; ``on_batch``
        receives each batch's drift verdict."""

        def _step(batch_df: DataFrame, batch_id: int) -> None:
            verdict = self.append_batch(batch_df, batch_id)
            if on_batch is not None:
                on_batch(batch_id, verdict)

        writer = (
            stream.writeStream.foreachBatch(_step)
            .queryName("ann-index-append")
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    # ---------------------------------------------------- compaction

    def compact(self, force: bool = False) -> int:
        """Fold committed batch partitions (and the build()-time seed,
        if any) into the inactive slot, preserving the ``cell``
        partitioning so search keeps its partition-pruned scans. Commit
        = atomic marker rename; the newest live batch is never folded
        (replay protection); dead directories are removed best-effort
        (streaming/compaction.py). Returns the number of batch
        partitions folded. Rows are concatenated as-is — a vec_id
        re-inserted in a later batch stays duplicated, exactly as it is
        across live ``b=`` partitions (search dropDuplicates on
        (qid, vec_id) already handles it)."""
        if not force:
            assert_no_live_writer(self.index_dir)
        fold_ids, upto = self._mc.foldable()
        if not fold_ids:
            return 0
        wm, slot = self._mc.marker()
        df = self.spark.read.parquet(self.index_dir)
        cond = F.col("b").isin(fold_ids)
        if slot is not None:
            cond = cond | (F.col("b") == slot)
        if wm is None and self._mc.has_dir(SEED_BATCH):
            cond = cond | (F.col("b") == SEED_BATCH)
        target = self._mc.inactive_slot(slot)
        cols = ["vec_id", "embedding", "nrm", "cell"] + (
            ["codes"] if self.pq else []
        )
        (
            df.where(cond)
            .select(*cols)
            .repartition("cell")  # one file per cell (see _write_batch)
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(f"{self.index_dir}/b={target}")
        )
        self._mc.write_marker(upto, target)  # COMMIT
        self._mc.cleanup(
            upto,
            slot if slot != target else None,
            extra=[SEED_BATCH] if self._mc.has_dir(SEED_BATCH) else [],
        )
        return len(fold_ids)

    # -------------------------------------------------------- search

    def index_df(self) -> DataFrame:
        # Schema memo (r14, guide §6): the index schema is fixed at
        # build time, but a bare read infers it from file footers on
        # EVERY call — search_pq alone reads the index twice (candidate
        # + rerank scans). Infer once per IncrementalIVF instance and
        # pass it explicitly afterwards; partition discovery still runs
        # (the file set does change between batches).
        reader = self.spark.read
        if getattr(self, "_index_schema", None) is not None:
            reader = reader.schema(self._index_schema)
        df = reader.parquet(self.index_dir)
        self._index_schema = df.schema
        wm, slot = self._mc.marker()
        if wm is not None:
            df = df.where(
                (F.col("b") == slot)
                | ((F.col("b") >= 0) & (F.col("b") > wm))
            )
        return df

    def recall_audit(
        self,
        queries: DataFrame,
        topk: int = 5,
        pq: bool = False,
        shortlist: int | None = None,
    ) -> DataFrame:
        """Scheduled search-quality audit: grade ``search()`` (or the
        ADC serving path ``search_pq()`` when ``pq=True``) against a
        brute-force exact-cosine scan of the SAME indexed corpus and
        return one row — (n_queries, macro_recall, min_recall,
        perfect_queries), the ann_recall_report contract pointed at the
        live index. The two monitors are complementary: the per-batch
        cell-occupancy PSI fires on ingest DISTRIBUTION shift (cheap,
        every batch), this audit measures the resulting search
        degradation DIRECTLY (one full corpus pass — run it on the
        retrain-decision cadence, not per batch). recall = exact
        integer hits / (|Q| * topk), no order-sensitive double sums.

        Scale shape: the exact leg broadcasts the (small) query batch
        and makes one pass over the index table (no cell pruning — the
        whole point is to see what probing missed); the approx leg is
        ``search()`` with its pruned scan; scoring joins |Q|*topk-row
        frames."""
        q = queries.select(
            F.col(self.id_col).alias("qid"),
            F.col(self.emb_col).alias("ea"),
            F.sqrt(sq_norm_dec(F.col(self.emb_col))).alias("qnrm"),
        )
        # dropDuplicates mirrors search(): the index permits duplicate
        # vec_ids (re-inserts, post-replay seed rows — compact()
        # docstring), and a duplicated vector must not occupy multiple
        # exact top-k slots or its hits double-count (ADVICE r12).
        scored = (
            self.index_df()
            .crossJoin(F.broadcast(q))
            .where(F.col("vec_id") != F.col("qid"))
            .select(
                "qid",
                F.col("vec_id").alias("nid"),
                safe_cos(
                    dot_dec_fast("ea", "embedding", "qnrm", "nrm"),
                    F.col("qnrm"),
                    F.col("nrm"),
                ).alias("cosine"),
            )
            .dropDuplicates(["qid", "nid"])
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("cosine").desc(), F.col("nid")
        )
        exact = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= topk)
            .select("qid", "nid")
            .localCheckpoint(eager=True)
        )
        approx = (
            self.search_pq(queries, topk, shortlist=shortlist)
            if pq
            else self.search(queries, topk)
        )
        hits = (
            approx.select("qid", "nid")
            .join(F.broadcast(exact), ["qid", "nid"])
            .groupBy("qid")
            .agg(F.count("*").alias("hits"))
        )
        per_q = (
            exact.select("qid")
            .distinct()
            .join(hits, "qid", "left")
            .select(
                F.coalesce(F.col("hits"), F.lit(0))
                .cast("long")
                .alias("hits")
            )
        )
        return per_q.agg(
            F.count("*").cast("long").alias("n_queries"),
            (
                F.sum("hits").cast("double")
                / (F.count("*") * F.lit(topk)).cast("double")
            ).alias("macro_recall"),
            (F.min("hits").cast("double") / F.lit(float(topk))).alias(
                "min_recall"
            ),
            F.sum((F.col("hits") == topk).cast("long"))
            .cast("long")
            .alias("perfect_queries"),
        )

    def search(self, queries: DataFrame, topk: int = 5) -> DataFrame:
        """Probe nprobe cells per query, exact-cosine rerank inside
        them. The cell IN-filter reaches the scan as a partition
        filter: only nprobe/k of the index's files are read."""
        q = queries.select(
            F.col(self.id_col).alias("qid"),
            F.col(self.emb_col).alias("ea"),
            F.sqrt(sq_norm_dec(F.col(self.emb_col))).alias("qnrm"),
            F.explode(
                ivf_assign(F.col(self.emb_col), self.centroids, self.nprobe)
            ).alias("qcell"),
        )
        cand = (
            self.index_df()
            .join(F.broadcast(q), F.col("cell") == F.col("qcell"))
            .where(F.col("vec_id") != F.col("qid"))
            .dropDuplicates(["qid", "vec_id"])
        )
        scored = cand.select(
            "qid",
            F.col("vec_id").alias("nid"),
            safe_cos(
                dot_dec_fast("ea", "embedding", "qnrm", "nrm"),
                F.col("qnrm"),
                F.col("nrm"),
            ).alias("cosine"),
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("cosine").desc(), F.col("nid")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= topk)
            .select("qid", "nid", "cosine", "rank")
        )

    def search_pq(
        self,
        queries: DataFrame,
        topk: int = 5,
        shortlist: int | None = None,
    ) -> DataFrame:
        """The ADC serving path (faiss IVFADC — ann_ivfpq_topk's plan
        pointed at the disk index): probe nprobe cells per query, rank
        ALL candidates by asymmetric distance on the stored residual-PQ
        ``codes`` (4 bits–1 byte per subspace read from the index, the
        raw ``embedding`` column never deserialized — columnar pruning
        makes the candidate scan read bytes-per-vector, the
        memory-bandwidth win that serves billion-vector cells), then
        exact-cosine rerank only the per-query ``shortlist`` (default
        10*topk) survivors. Same output contract as ``search()``:
        (qid, nid, cosine, rank).

        Scale shape: the query batch is collected once (it is already
        broadcast-sized by search()'s own contract) to build the
        per-query LUTs — |Q| * (k + n_sub*pq_k) doubles riding the
        encode closure; ADC scoring is a MAP over the partition-pruned,
        column-pruned candidate scan (no join, no shuffle); the only
        shuffles are the two per-qid top-k windows, over |cand| and
        |Q|*shortlist rows. ADC ranks dot(q, c_cell + r̂)/|x| — true
        norms ride the index rows, |q| is rank-neutral per query."""
        if not self.pq:
            raise ValueError(
                f"index {self.index_dir} has no PQ codes — build with "
                "pq_k > 0 (or use search())"
            )
        qrows = queries.select(
            F.col(self.id_col).alias("qid"),
            F.col(self.emb_col).alias("emb"),
        ).collect()
        if not qrows:
            return self.search(queries, topk)  # empty in, empty out
        short = shortlist if shortlist is not None else 10 * topk
        cent = self.centroids  # (k, dim)
        book = np.nan_to_num(self.pq_codebook)  # dead codewords -> 0
        sd = self.pq_sub_dim
        n_sub = book.shape[0]
        # per-query ADC tables: cell_terms[qid][c] = q . c_cell,
        # lut[qid][s, cw] = q_sub . codeword  (driver-side, tiny);
        # probed = union of every query's nprobe cells — known BEFORE
        # the plan, so BOTH scans below carry a literal cell IN-filter
        # that prunes at the Hive partition index (without it the
        # rerank leg's embedding read would scan every cell)
        tables = {}
        qcell_rows: list[tuple[int, int]] = []
        for r in qrows:
            qv = np.asarray(r["emb"], dtype=np.float64)
            lut = np.array(
                [book[s] @ qv[s * sd:(s + 1) * sd] for s in range(n_sub)]
            )
            tables[int(r["qid"])] = (cent @ qv, lut)
            qn = qv / max(float(np.linalg.norm(qv)), 1e-12)
            sims = cent @ qn
            for c in np.argsort(-sims)[: self.nprobe]:
                qcell_rows.append((int(r["qid"]), int(c)))
        # the driver-side assignment is AUTHORITATIVE for this search:
        # the probe frame and the scans' literal cell filter come from
        # the same arithmetic, so no candidate can fall between them
        probed_lit = sorted({c for _, c in qcell_rows})

        @F.pandas_udf("double")
        def _adc(qids: pd.Series, cells: pd.Series, codes: pd.Series) -> pd.Series:
            qa = qids.to_numpy(dtype=np.int64)
            ca = cells.to_numpy(dtype=np.int64)
            cd = np.stack(codes.to_numpy()).astype(np.int64)
            out = np.zeros(len(qa), dtype=np.float64)
            subs = np.arange(n_sub)
            for qid in np.unique(qa):
                m = qa == qid
                ct, lut = tables[int(qid)]
                out[m] = ct[ca[m]] + lut[subs[None, :], cd[m]].sum(axis=1)
            return pd.Series(out)

        from sql_flow_spark.localdf import local_df

        q = local_df(self.spark, qcell_rows, "qid long, qcell int")
        # candidate scan: ids + codes only — the embedding column is
        # pruned at the parquet reader, cells outside the probe set at
        # the partition index (literal IN on the partition column)
        cand = (
            self.index_df()
            .where(F.col("cell").isin(probed_lit))
            .select("vec_id", "nrm", "cell", "codes")
            .join(F.broadcast(q), F.col("cell") == F.col("qcell"))
            .where(F.col("vec_id") != F.col("qid"))
            .dropDuplicates(["qid", "vec_id"])
        )
        adc = cand.select(
            "qid",
            F.col("vec_id").alias("nid"),
            F.when(F.col("nrm") == 0, F.lit(0.0))
            .otherwise(
                _adc(F.col("qid"), F.col("cell"), F.col("codes"))
                / F.col("nrm")
            )
            .alias("adc_score"),
        )
        ws = Window.partitionBy("qid").orderBy(
            F.col("adc_score").desc(), F.col("nid")
        )
        sl = (
            adc.withColumn("srank", F.row_number().over(ws))
            .where(F.col("srank") <= short)
            .select("qid", "nid")
        )
        # rerank query frame from the rows already collected above
        # (r14): same ids/vectors, same exact-decimal norm expression —
        # skips a second scan of the queries source per search
        emb_t = queries.schema[self.emb_col].dataType.simpleString()
        id_t = queries.schema[self.id_col].dataType.simpleString()
        qv = local_df(
            self.spark,
            [(r["qid"], list(r["emb"])) for r in qrows],
            f"qid {id_t}, ea {emb_t}",
        ).select(
            "qid", "ea", F.sqrt(sq_norm_dec(F.col("ea"))).alias("qnrm")
        )
        # rerank reads raw vectors ONLY from the probed cells (every
        # shortlist member lives there by construction) — the same
        # partition pruning as the candidate scan, on the heavy column
        emb_side = (
            self.index_df()
            .where(F.col("cell").isin(probed_lit))
            .select(F.col("vec_id").alias("nid"), "embedding", "nrm")
            .dropDuplicates(["nid"])
        )
        scored = (
            sl.join(emb_side, "nid")
            .join(F.broadcast(qv), "qid")
            .select(
                "qid",
                "nid",
                safe_cos(
                    dot_dec_fast("ea", "embedding", "qnrm", "nrm"),
                    F.col("qnrm"),
                    F.col("nrm"),
                ).alias("cosine"),
            )
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("cosine").desc(), F.col("nid")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= topk)
            .select("qid", "nid", "cosine", "rank")
        )
