"""Multi-batch growth e2e for the four streaming state engines (r8
verdict item 5 / r9 item 3): per-batch cost must stay flat and the
partition-directory count bounded when periodic compact() runs —
the no-compaction run is the documented counterfactual in SCALING.md
(linear dir growth), not asserted here.

Reduced batch count for CI; scripts/state_growth_probe.py runs the
full 100-batch version for the SCALING.md table. Thresholds are loose
(3x medians) because the sandbox VM has recorded co-tenant contention
windows (SCALING.md "Bench reproducibility")."""

import sys

import pytest

sys.path.insert(0, "scripts")

from state_growth_probe import run_probe, summarize  # noqa: E402


@pytest.mark.full
@pytest.mark.parametrize(
    "engine", ["ingest_dedup", "rollup", "heavy_hitters", "ann_index"]
)
def test_per_batch_cost_flat_and_dirs_bounded(spark, tmp_path, engine):
    batches, every = 30, 10
    recs = run_probe(
        spark,
        engine,
        str(tmp_path),
        batches=batches,
        compact_every=0 if engine == "heavy_hitters" else every,
        rows=120,
    )
    s = summarize(recs)
    # Flat per-batch cost: last-decade median within 3x of the
    # first-decade median (first decade carries JVM warmup, so the
    # real signal — no linear growth — has ample headroom).
    assert s["median_wall_last_decade"] <= 3.0 * max(
        s["median_wall_first_decade"], 0.05
    ), f"{engine} per-batch cost grew: {s}"
    if engine == "heavy_hitters":
        # inline prune keeps exactly snapshot + read-predecessor
        assert s["dirs_max"] <= 3, s
    else:
        # bounded by the compaction cadence: live batches since the
        # last fold + the active seed slot + the never-folded newest
        # (+1 pre-commit transient)
        assert s["dirs_last"] <= every + 3, f"{engine} dirs unbounded: {s}"
        assert s["dirs_max"] <= every + 4, s


@pytest.mark.full
def test_nocompact_dirs_grow_linearly(spark, tmp_path):
    """The counterfactual that motivates the protocol: without
    compact(), one directory per batch accumulates forever."""
    recs = run_probe(
        spark, "rollup", str(tmp_path), batches=12, compact_every=0, rows=60
    )
    assert recs[-1]["n_dirs"] >= 12
