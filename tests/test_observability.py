import json
import os
import time

from sql_flow_spark.handlers import InferredBatch
from sql_flow_spark.observability import attach_metrics
from sql_flow_spark.pipeline import Pipeline
from sql_flow_spark.sinks import NoopSink
from sql_flow_spark.sources import FileSource


def test_metrics_listener_captures_stream_progress(spark, tmp_path):
    listener = attach_metrics(spark)
    try:
        in_dir = tmp_path / "obs-in"
        in_dir.mkdir()
        (in_dir / "a.jsonl").write_text(
            "\n".join(json.dumps({"k": i}) for i in range(100)) + "\n"
        )
        pipe = Pipeline(
            spark=spark,
            source=FileSource(str(in_dir), format="json"),
            handler=InferredBatch("SELECT count(*) AS n FROM batch"),
            sink=NoopSink(),
        )
        q = pipe.start(available_now=True, checkpoint_dir=str(tmp_path / "obs-ckpt"))
        q.awaitTermination(120)
        # listener events are async on the bus thread
        deadline = time.time() + 30
        rows = 0
        while time.time() < deadline:
            s = listener.summary()
            rows = sum(m["num_input_rows"] for m in s.values())
            if rows >= 100:
                break
            time.sleep(0.5)
        assert rows >= 100
        assert any(m["num_batches"] >= 1 for m in listener.summary().values())
    finally:
        spark.streams.removeListener(listener)
