"""Streaming joins + storage layout utilities."""

import glob
import json

from pyspark.sql import functions as F

from sql_flow_spark.plans import (
    compact_directory,
    plan_string,
    with_date_partition,
    write_partitioned,
)
from sql_flow_spark.sources import FileSource
from sql_flow_spark.streaming.joins import stream_static_join, stream_stream_join


def _write_jsonl(dirpath, name, rows):
    dirpath.mkdir(parents=True, exist_ok=True)
    (dirpath / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _drain(out, tmp_path, name):
    got = []
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / f"{name}-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return got


def test_stream_static_join_enriches_each_batch(spark, tmp_path):
    """Reference: csv.mem.join.yml — per-batch join against a static
    dimension, dim broadcast so the stream never shuffles."""
    in_dir = tmp_path / "ssj-in"
    _write_jsonl(in_dir, "a.jsonl", [{"city": "nyc", "n": 1}, {"city": "xxx", "n": 2}])
    dim = spark.createDataFrame([("nyc", "New York")], "city string, full string")
    stream = FileSource(str(in_dir), format="json").read_stream(spark)
    got = _drain(stream_static_join(stream, dim, on="city", how="left"), tmp_path, "ssj")
    assert {r.city: r.full for r in got} == {"nyc": "New York", "xxx": None}


def test_stream_stream_join_within_time_bound(spark, tmp_path):
    """Clicks x purchases within 1 hour — a join the reference cannot
    express (its joins are batch-vs-static only)."""
    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    _write_jsonl(clicks_dir, "a.jsonl", [
        {"ct": "2024-01-01 00:00:00", "user": "u1", "page": "p"},
        {"ct": "2024-01-01 05:00:00", "user": "u2", "page": "q"},
    ])
    _write_jsonl(buys_dir, "a.jsonl", [
        {"bt": "2024-01-01 00:30:00", "buyer": "u1", "amount": 9.0},   # within 1h
        {"bt": "2024-01-01 23:00:00", "buyer": "u2", "amount": 5.0},   # outside bound
    ])
    clicks = (
        FileSource(str(clicks_dir), format="json").read_stream(spark)
        .withColumn("ct", F.to_timestamp("ct"))
    )
    buys = (
        FileSource(str(buys_dir), format="json").read_stream(spark)
        .withColumn("bt", F.to_timestamp("bt"))
    )
    out = stream_stream_join(
        clicks, buys,
        left_key="user", right_key="buyer",
        left_time="ct", right_time="bt",
        watermark_delay="0 seconds", max_lag="1 hour",
    )
    got = _drain(out, tmp_path, "ss")
    assert [(r.user, r.amount) for r in got] == [("u1", 9.0)]


def test_partitioned_write_prunes(spark, tmp_path, sf_dir):
    from sql_flow_spark.tables import load_tables

    events = load_tables(spark, sf_dir, ("events",))["events"]
    out = str(tmp_path / "events-part")
    write_partitioned(with_date_partition(events, "ts"), out, ["dt"])
    back = spark.read.parquet(out).where(F.col("dt") == "2024-01-05")
    p = plan_string(back)
    assert "PartitionFilters" in p and "2024-01-05" in p
    assert back.count() > 0


def test_compact_directory(spark, tmp_path):
    out = str(tmp_path / "frag")
    df = spark.range(10000).withColumn("v", F.rand(seed=1))
    df.repartition(64).write.parquet(out)  # 64 small files

    assert len(glob.glob(f"{out}/*.parquet")) == 64
    n = compact_directory(spark, out, target_file_mb=128)
    assert n == 1
    assert len(glob.glob(f"{out}/*.parquet")) == 1
    assert spark.read.parquet(out).count() == 10000


def test_stream_scd_lookup_point_in_time(spark, tmp_path):
    """Each event joins the dim VERSION valid at its event time: an
    event replayed from before a dim change must see the old version,
    a post-change event the new one, and the open (valid_to NULL)
    version catches current events."""
    from sql_flow_spark.streaming.joins import stream_scd_lookup

    in_dir = tmp_path / "scd-in"
    _write_jsonl(
        in_dir,
        "events.jsonl",
        [
            {"uid": 1, "ts": "2024-01-05 00:00:00", "what": "old-era"},
            {"uid": 1, "ts": "2024-02-05 00:00:00", "what": "new-era"},
            {"uid": 2, "ts": "2024-01-01 00:00:00", "what": "no-dim"},
        ],
    )
    dim = spark.createDataFrame(
        [
            (1, "bronze", "2024-01-01 00:00:00", "2024-02-01 00:00:00"),
            (1, "gold", "2024-02-01 00:00:00", None),
        ],
        "cust int, tier string, valid_from string, valid_to string",
    ).select(
        "cust",
        "tier",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    stream = (
        FileSource(str(in_dir), format="json")
        .read_stream(spark)
        .select("uid", "what", F.col("ts").cast("timestamp").alias("ts"))
    )
    got = _drain(
        stream_scd_lookup(stream, dim, "uid", "cust", "ts"),
        tmp_path,
        "scd",
    )
    tiers = {r.what: r.tier for r in got}
    assert tiers == {"old-era": "bronze", "new-era": "gold", "no-dim": None}


def test_stream_scd_lookup_plan_broadcasts(spark, tmp_path):
    from sql_flow_spark.streaming.joins import stream_scd_lookup

    dim = spark.createDataFrame(
        [(1, "x", None, None)],
        "cust int, tier string, valid_from timestamp, valid_to timestamp",
    )
    stream = spark.createDataFrame(
        [(1, "e")], "uid int, what string"
    ).withColumn("ts", F.current_timestamp())
    plan = plan_string(stream_scd_lookup(stream, dim, "uid", "cust", "ts"))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
