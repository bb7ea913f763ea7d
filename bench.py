"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:

  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec}, "sf": ...}

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

HEADLINE = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "basic_agg",
    "tumbling_window",
    "sliding_window",
    "latest_by_key",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "dedup_embedding",
    "text_quality",
    "lang_id",
    "token_count",
    "doc_fingerprint",
    "multimodal_features",
    "enrich",
    # r3 additions (BENCH_r03 ⊇ BENCH_r02 keys, r2 advice item 7)
    "tfidf_top_term",
    "train_val_split",
    "best_docs_per_lang",
    # r3 new-operator coverage: curation family + TPC-H depth + IVF
    "pii_scrub",
    "repetition_ratio",
    "contamination_check",
    "dedup_clusters",
    "doc_packing",
    "ann_ivf_topk",
    "q7_nation_volume",
    "q8_market_share",
    "q10_returned_items",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q18_large_orders",
    "q19_flexible_predicates",
    "q22_idle_customers",
    # r5 additions (BENCH_r05 ⊇ r04 keys, r4 verdict item 2): the
    # heaviest previously-unbenched shapes
    "user_funnel",
    "cohort_retention",
    "curation_pipeline",
    "events_enrich_salted",
    # r5 new operators
    "q12_late_shipments",
    "q21_waiting_supplier",
    "boilerplate_flag",
    "stratified_sample",
    "mix_weights",
    "corpus_report",
    # r6: the production (linear LSH) cluster path benched next to its
    # quadratic oracle twin — this is the number that matters at scale
    "dedup_clusters_lsh",
    # r6 new operators: the remaining TPC-H shapes, adapted
    "q9_product_profit",
    "q11_important_stock",
    "q16_parts_suppliers",
    "q20_dominant_supplier",
    # r6 new training-data operators
    "cross_split_contamination",
    "unigram_logprob",
    "events_anomaly",
    "q2_min_cost_supplier",
    "gopher_quality",
    "chunk_dedup",
    "asof_attribution",
    "range_join_attribution",
    "events_gapfill",
    "embedding_centroids",
    "value_quartiles",
    "embedding_top_pc",
    "bpe_learn_merges",
    "knn_classify",
    "time_weighted_avg",
    "embedding_outliers",
    "media_frame_sample",
    "bpe_apply",
    "events_gapfill_interp",
    "dedup_keep_best",
    "events_moving_avg",
    "customer_rfm",
    "revenue_yoy",
    "revenue_share_by_priority",
    "event_transition_matrix",
    "orders_monthly_seasonality",
    "events_equidepth_histogram",
    "scd2_user_status",
    "user_gap_stats",
    "orders_open_backlog",
    "user_activity_streaks",
    "part_copurchase_topk",
    "lexical_diversity",
    "copurchase_lift",
    "dedup_family_sizes",
    "events_weekday_hour",
)


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

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run_one(spark, name, sf_dir), 3)

    stream_sec, stream_rows = run_stream_pipeline(spark, sf_dir)
    timings["streaming_pipeline_agg"] = round(stream_sec, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "streaming_rows_per_sec": int(stream_rows / stream_sec),
            }
        )
    )


if __name__ == "__main__":
    main()
