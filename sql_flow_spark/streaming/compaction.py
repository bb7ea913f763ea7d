"""Shared marker-commit compaction protocol for batch-partitioned
incremental state tables (r8 verdict item 2).

Three streaming engines maintain on-disk state as one Hive partition
directory per micro-batch (``table_dir/b=<batch>``): the rollup table
(streaming/rollup.py), the corpus fingerprint index
(streaming/ingest_dedup.py) and the incremental IVF index
(streaming/ann_index.py). Batch-keyed overwrite makes every write
replay-idempotent, but without a fold the directory count grows one
per micro-batch forever — at a 100 TB/day cadence that is thousands of
partition directories per day of pure listing cost.

The protocol (proven by the rollup in r8, generalized here):

- two SEED SLOTS (negative ids that can never be real batch ids); a
  fold writes the merged history into the INACTIVE slot, never
  overwriting the slot readers are using;
- the commit point is an atomic rename of ``_watermark.json``
  (watermark + active slot). A crash before the rename leaves the old
  marker — readers keep the old, complete state; a crash after it
  leaves only stale directories, removed by the NEXT compact;
- the NEWEST live batch is never folded: under a serial streaming
  writer only the latest batch can be replayed after a restart, so
  keeping it out of the fold makes replay and compaction commute;
- writers re-read the marker per batch and refuse a batch id at or
  below the watermark (readers would silently ignore its partition);
- CONCURRENCY GUARD (r8 verdict item 6): writers heartbeat an
  advisory ``_writer.lease`` file (pid + mtime) on every batch;
  ``assert_no_live_writer`` refuses to compact while a DIFFERENT
  process's lease is fresh. Same-pid compaction stays allowed — the
  supported "compact between triggers from the driver" pattern.

Both metadata files start with ``_`` so Spark's partition discovery
ignores them.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import shutil
import threading
import time
from collections.abc import Sequence
from typing import Optional

logger = logging.getLogger(__name__)

_MARKER = "_watermark.json"
_LEASE = "_writer.lease"
DEFAULT_LEASE_TTL = 120.0  # seconds a silent writer is presumed alive


def touch_writer_lease(table_dir: str) -> None:
    """Heartbeat the advisory writer lease (one small local write, no
    Spark job). Writers wrap the batch write in lease_heartbeat() so
    the lease stays fresh even when a single write outruns the TTL."""
    os.makedirs(table_dir, exist_ok=True)
    path = os.path.join(table_dir, _LEASE)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(str(os.getpid()))
    os.replace(tmp, path)  # atomic; mtime = now


@contextlib.contextmanager
def lease_heartbeat(
    table_dir: str, interval: float = DEFAULT_LEASE_TTL / 4
):
    """Keep the writer lease fresh for the duration of a batch write.

    A lease touched only at batch START goes stale mid-write whenever
    one Spark write runs longer than the TTL — plausible at the
    100 TB scale this protocol targets — and a foreign `cli compact`
    would then pass assert_no_live_writer while the write is in
    flight (ADVICE r9). A daemon timer thread re-touches the lease
    every TTL/4 until the write completes; the touch is a local
    rename, so the cost is nil and the guard now holds for writes of
    any duration."""
    touch_writer_lease(table_dir)
    stop = threading.Event()

    def _beat() -> None:
        while not stop.wait(interval):
            try:
                touch_writer_lease(table_dir)
            except OSError as e:  # pragma: no cover - advisory only
                logger.warning("lease heartbeat failed for %s: %s",
                               table_dir, e)

    t = threading.Thread(target=_beat, daemon=True)
    t.start()
    try:
        yield
    finally:
        stop.set()
        t.join(timeout=interval + 1.0)


def assert_no_live_writer(
    table_dir: str, ttl: float = DEFAULT_LEASE_TTL
) -> None:
    """Raise RuntimeError if another process's writer lease is fresh.

    The guard is advisory (a writer that never heartbeats is not
    detected) but closes the operational hazard the r8 review named:
    `cli compact` run against a live stream could fold a half-written
    batch partition and commit a watermark covering it, after which
    the stream's replay of that batch is refused and the data is
    permanently undercounted."""
    path = os.path.join(table_dir, _LEASE)
    try:
        st = os.stat(path)
        with open(path) as f:
            pid = int(f.read().strip() or "0")
    except (OSError, ValueError):
        return
    age = time.time() - st.st_mtime
    if pid != os.getpid() and age < ttl:
        raise RuntimeError(
            f"refusing to compact {table_dir}: writer lease held by pid "
            f"{pid}, heartbeat {age:.0f}s ago (< ttl {ttl:.0f}s). Stop the "
            "stream (or wait for the lease to expire) before compacting."
        )


class MarkerCommit:
    """Marker + slot + partition-directory bookkeeping for one
    batch-partitioned state table. The data fold itself stays in the
    owning module (merge semantics differ per engine); this class owns
    everything crash-safety-critical around it."""

    def __init__(self, table_dir: str, slots: tuple[int, int] = (-1, -2)):
        if slots[0] >= 0 or slots[1] >= 0 or slots[0] == slots[1]:
            raise ValueError(f"seed slots must be distinct negatives: {slots}")
        self.table_dir = table_dir
        self.slots = slots

    # ------------------------------------------------------- marker

    def marker(self) -> tuple[Optional[int], Optional[int]]:
        """(watermark, active seed slot) — re-read every call; a plain
        local file read, no Spark job."""
        try:
            with open(os.path.join(self.table_dir, _MARKER)) as f:
                m = json.load(f)
            return int(m["wm"]), int(m["slot"])
        except (OSError, ValueError, KeyError):
            return None, None

    def write_marker(self, wm: int, slot: int) -> None:
        path = os.path.join(self.table_dir, _MARKER)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"wm": wm, "slot": slot}, f)
        os.rename(tmp, path)  # the atomic commit point

    def inactive_slot(self, active: Optional[int]) -> int:
        return self.slots[1] if active == self.slots[0] else self.slots[0]

    # ---------------------------------------------------- directories

    def disk_batch_ids(self) -> list[int]:
        """Sorted non-negative batch ids present on disk."""
        try:
            names = os.listdir(self.table_dir)
        except OSError:
            return []
        ids = []
        for n in names:
            if n.startswith("b="):
                try:
                    v = int(n[2:])
                except ValueError:
                    continue
                if v >= 0:
                    ids.append(v)
        return sorted(ids)

    def has_dir(self, batch_id: int) -> bool:
        return os.path.isdir(os.path.join(self.table_dir, f"b={batch_id}"))

    def foldable(self) -> tuple[list[int], Optional[int]]:
        """(batch ids to fold, new watermark) — every committed live
        batch above the watermark EXCEPT the newest. (None, None)-ish
        empty result when fewer than two live batches exist."""
        wm, _slot = self.marker()
        live = [b for b in self.disk_batch_ids() if wm is None or b > wm]
        if len(live) < 2:
            return [], None
        return live[:-1], live[-2]

    def cleanup(
        self, upto: int, old_slot: Optional[int], extra: Sequence[int] = ()
    ) -> None:
        """Best-effort removal of everything a committed marker makes
        dead: batch partitions at/below the watermark (including
        leftovers of a previously crashed cleanup), the old seed slot,
        and any extra dirs (e.g. a folded bootstrap partition). A crash
        here is repaired by the next compact."""
        stale = [f"b={b}" for b in self.disk_batch_ids() if b <= upto]
        if old_slot is not None:
            stale.append(f"b={old_slot}")
        stale.extend(f"b={b}" for b in extra)
        for d in stale:
            try:
                shutil.rmtree(os.path.join(self.table_dir, d))
            except OSError as e:  # pragma: no cover - best-effort
                logger.warning("compact: could not remove %s: %s", d, e)

    # -------------------------------------------------------- writers

    def check_batch_writable(self, batch_id: int) -> None:
        """Writer-side replay protection: refuse a batch id at or
        below the compaction watermark (its partition would be
        silently ignored by marker-filtered readers)."""
        wm, _slot = self.marker()
        if wm is not None and batch_id <= wm:
            raise ValueError(
                f"batch id {batch_id} is at/below the compaction "
                f"watermark {wm} of {self.table_dir}; readers would "
                "ignore its partition. Use a fresh state dir (or larger "
                "batch ids) after compacting a table fed by one-shot "
                "invokes."
            )
