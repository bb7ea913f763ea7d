"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1).

Output contract (r7 — the r6 payload outgrew the driver's 2000-char
stdout-tail capture and arrived unparseable):

  1. the FULL per-key payload is written to ``bench_out.json`` at the
     repo root (committed — truncation can never eat it), and printed
     as an early stdout line for humans;
  2. the LAST stdout line is a COMPACT summary guaranteed to fit the
     driver's tail window: metric/value/unit/sf/streaming plus only
     the slowest keys, with a pointer to the full file.

Headline = every key in the operator registry except EXCLUDED (each
exclusion has a named reason).  The deliberately-quadratic
``dedup_clusters`` blocked oracle twin is benched at sf0.01 next to
its linear production path ``dedup_clusters_lsh`` so the A/B stays
visible without an O(block^2) entry in the sf0.1 headline total.

Each query is executed to completion via the noop sink (full plan
runs, no collect/driver cost — the number measures the engine, not
the transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql_flow_spark.operators import QUERIES  # noqa: E402
from sql_flow_spark.session import get_spark  # noqa: E402

# Registry keys deliberately NOT in the sf0.1 headline, with reasons.
# tests/test_entry_contract.py asserts HEADLINE ∪ EXCLUDED == registry.
EXCLUDED: dict[str, str] = {
    "dedup_clusters": (
        "O(block^2) blocked oracle twin of dedup_clusters_lsh; benched "
        "at sf0.01 in the small_sf_ab section so the A/B stays visible"
    ),
    "ngram_jaccard": (
        "source-blocked exact-pair oracle twin (near-quadratic per "
        "block by design); production is dedup_minhash_lsh candidates "
        "+ the same verifier; benched at sf0.01 in small_sf_ab"
    ),
    "containment_pairs": (
        "source-blocked exact-pair oracle twin, same contract as "
        "ngram_jaccard; production feeds LSH candidates; benched at "
        "sf0.01 in small_sf_ab"
    ),
}

# Every registry key gets a bench number (r6 verdict item 3); sorted
# for a stable, diffable payload ordering.
HEADLINE = tuple(sorted(k for k in QUERIES if k not in EXCLUDED))

# sf0.01 A/B: quadratic oracle twins next to their linear production
# paths, so the cost gap stays measured without an O(block^2) entry in
# the sf0.1 headline.
SMALL_SF_AB = (
    "dedup_clusters",
    "dedup_clusters_lsh",
    "ngram_jaccard",
    "containment_pairs",
    "dedup_minhash_lsh",
)
SMALL_SF_DIR = "/root/testdata/sf0.01"

# The driver records the last ~2000 chars of stdout; keep the final
# summary line comfortably inside that.
SUMMARY_BUDGET = 1600


def run_one(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    df = QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def run_stream_pipeline(spark, sf_dir: str) -> tuple[float, int]:
    """End-to-end engine throughput: the events table streamed through
    the full pipeline machinery (file stream -> handler SQL per
    micro-batch -> sink), availableNow. Comparable to the reference's
    msgs/sec benchmarks (reference README.md:235 — 45k msgs/s simple
    agg single-node)."""
    import tempfile

    from sql_flow_spark.handlers import InferredBatch
    from sql_flow_spark.pipeline import Pipeline
    from sql_flow_spark.sinks import NoopSink
    from sql_flow_spark.sources import FileSource

    n_rows = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # the file-stream source wants a directory; link the table in
    stream_dir = tempfile.mkdtemp(prefix="sfs-bench-in-")
    os.symlink(f"{sf_dir}/events.parquet", f"{stream_dir}/events.parquet")
    pipe = Pipeline(
        spark=spark,
        source=FileSource(stream_dir, format="parquet"),
        handler=InferredBatch(
            "SELECT event_type, count(*) AS n, sum(value) AS total "
            "FROM batch GROUP BY event_type"
        ),
        sink=NoopSink(),
    )
    t0 = time.time()
    q = pipe.start(
        available_now=True, checkpoint_dir=tempfile.mkdtemp(prefix="sfs-bench-")
    )
    q.awaitTermination()
    return time.time() - t0, n_rows


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # The engine default split size (128 MiB) is the cluster setting;
    # the local bench reads single small parquet files, so use small
    # splits to spread the scan across local cores.
    spark = get_spark(
        "bench", extra_confs={"spark.sql.files.maxPartitionBytes": "2097152"}
    )
    # Warm the JVM/codegen paths and the OS page cache for the input
    # files so query timings measure plan execution (steady state),
    # not first-touch IO + classloading.
    spark.range(1000).selectExpr("sum(id)").collect()
    from sql_flow_spark.tables import TABLE_NAMES, load_tables

    for df in load_tables(spark, sf_dir, TABLE_NAMES, register_views=False).values():
        df.write.format("noop").mode("overwrite").save()

    # Streaming first, on a fresh engine: measured AFTER the headline
    # sweep its number degrades with accumulated JVM state (codegen
    # cache, listener backlog) and stops being comparable across
    # rounds as the registry grows — observed 89k -> 22k rows/s purely
    # from key-count growth moving it later in the run. Run it twice
    # and keep the second (steady state): the first pass pays
    # streaming-stack classloading/codegen that batch keys amortize
    # through their own warm pass above.
    run_stream_pipeline(spark, sf_dir)
    stream_sec, stream_rows = run_stream_pipeline(spark, sf_dir)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run_one(spark, name, sf_dir), 3)

    timings["streaming_pipeline_agg"] = round(stream_sec, 3)

    small_ab: dict[str, float] = {}
    if os.path.isdir(SMALL_SF_DIR):
        for name in SMALL_SF_AB:
            small_ab[name] = round(run_one(spark, name, SMALL_SF_DIR), 3)

    total = round(sum(timings.values()), 3)
    streaming_rps = int(stream_rows / stream_sec)

    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "streaming_rows_per_sec": streaming_rps,
        "n_queries": len(timings),
        "excluded": EXCLUDED,
        "small_sf_ab": {"sf": 0.01, "queries": small_ab},
    }
    full_line = json.dumps(payload, separators=(",", ":"))

    # Full payload: committed file + early stdout line (humans / logs).
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_out.json")
    with open(out_path, "w") as f:
        f.write(full_line + "\n")
    print(full_line)

    # Compact summary LAST: must fit the driver's stdout-tail window.
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])
    summary = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "streaming_rows_per_sec": streaming_rps,
        "n_queries": len(timings),
        "full_payload": "bench_out.json",
        "queries": {},
    }
    for name, sec in slowest:
        summary["queries"][name] = sec
        if len(json.dumps(summary, separators=(",", ":"))) > SUMMARY_BUDGET:
            del summary["queries"][name]
            break
    summary["queries_shown"] = len(summary["queries"])
    print(json.dumps(summary, separators=(",", ":")))


if __name__ == "__main__":
    main()
