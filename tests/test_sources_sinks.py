"""Source/sink unit coverage: kafka option building (reference:
tests/sinks/test_kafka.py builds producer conf), file sink round-trip,
sqlcommand substitutions, spooling push sources, serde."""

import json
import re

import pytest

from sql_flow_spark import config as cfg
from sql_flow_spark.serde import JSONSerde, RawSerde, new_serde
from sql_flow_spark.sinks import FileSink, SQLCommandSink, new_sink_from_conf
from sql_flow_spark.sources import KafkaSource, new_source_from_conf
from sql_flow_spark.sources.push import WebhookSource, WebsocketSource


def test_kafka_source_option_building():
    src = KafkaSource(
        brokers=["b1:9092", "b2:9092"],
        topics=["t1", "t2"],
        group_id="cg",
        auto_offset_reset="earliest",
        options={"security.protocol": "SASL_SSL", "kafka.sasl.mechanism": "PLAIN"},
    )
    opts = src.reader_options()
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "t1,t2"
    assert opts["startingOffsets"] == "earliest"
    assert opts["kafka.group.id"] == "cg"
    # non-prefixed options get the kafka. prefix; prefixed pass through
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.mechanism"] == "PLAIN"


def test_source_factory_from_conf():
    conf = cfg.SourceConf(type="kafka", brokers=["b:9092"], topics=["t"])
    src = new_source_from_conf(conf)
    assert isinstance(src, KafkaSource)
    with pytest.raises(NotImplementedError):
        new_source_from_conf(cfg.SourceConf(type="bogus"))


def test_file_sink_roundtrip(spark, tmp_path):
    sink = FileSink(path=str(tmp_path / "out"), format="parquet")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    sink.write_table(df)
    sink.write_table(df)  # append mode
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == 4


def test_sqlcommand_sink_with_uuid_substitution(spark, tmp_path):
    out_dir = tmp_path / "sqlcmd"
    sink = SQLCommandSink(
        spark,
        sql=(
            "CREATE OR REPLACE GLOBAL TEMPORARY VIEW `sqlcmd_$UUID` AS "
            "SELECT COUNT(*) AS n FROM sqlflow_sink_batch"
        ),
        substitutions=[{"var": "$UUID", "type": "uuid4"}],
    )
    df = spark.createDataFrame([(1,), (2,)], "id long")
    sink.write_table(df)
    views = [
        v.viewName for v in spark.sql("SHOW VIEWS IN global_temp").collect()
    ]
    created = [v for v in views if re.match(r"sqlcmd_[0-9a-f\-]{36}", v)]
    assert created, f"no substituted view found in {views}"
    assert spark.table(f"global_temp.`{created[0]}`").first().n == 2


def test_console_sink_writes_json_lines(spark):
    # reference: tests/sinks/test_console.py
    import io

    from sql_flow_spark.sinks import ConsoleSink

    buf = io.StringIO()
    sink = ConsoleSink(f=buf)
    sink.write_table(spark.createDataFrame([(1, "a")], "id long, v string"))
    sink.flush()
    assert buf.getvalue() == '{"id":1,"v":"a"}\n'
    assert sink.batch() is not None


def test_all_example_configs_parse():
    # reference: tests/test_configs.py parses every example config
    import glob
    import os

    examples = glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "examples", "*.yml")
    )
    assert len(examples) >= 7
    for path in examples:
        conf = cfg.new_from_path(path)
        assert conf.pipeline.handler.sql
        assert conf.pipeline.source.type
        assert conf.pipeline.sink.type


def test_iceberg_sink_config_parse():
    from sql_flow_spark.sinks.core import IcebergSink

    sink = new_sink_from_conf(cfg.SinkConf(type="iceberg", name="cat.db.t"), spark=None)
    assert isinstance(sink, IcebergSink)
    assert sink.table == "cat.db.t"


def test_spooling_webhook_push_and_read(spark, tmp_path):
    src = WebhookSource(hmac_secret="s3cret", spool_dir=str(tmp_path / "spool"))
    src.push([{"a": 1}, {"a": 2}])
    src.push(['{"a": 3}'])
    df = src.read(spark)
    assert sorted(r.a for r in df.collect()) == [1, 2, 3]
    with pytest.raises(NotImplementedError):
        src.start_server()


def test_webhook_hmac_validation():
    src = WebhookSource(hmac_secret="s3cret", spool_dir="/tmp/sfs-hmac-test")
    import hashlib
    import hmac as hmac_mod

    body = b'{"x": 1}'
    good = hmac_mod.new(b"s3cret", body, hashlib.sha256).hexdigest()
    assert src.validate_hmac(body, good)
    assert not src.validate_hmac(body, "0" * 64)


def test_websocket_source_stub(tmp_path):
    src = WebsocketSource(uri="wss://example.test/feed", spool_dir=str(tmp_path / "ws"))
    with pytest.raises(NotImplementedError):
        src.start_client()


def test_serde_roundtrip(spark):
    js = new_serde("json")
    assert isinstance(js, JSONSerde)
    df = js.to_dataframe(spark, ['{"a": 1, "b": "x"}', '{"a": 2}'])
    assert df.count() == 2
    encoded = js.encode_rows(df.orderBy("a"))
    assert json.loads(encoded[0])["b"] == "x"

    raw = new_serde("raw")
    assert isinstance(raw, RawSerde)
    rdf = raw.to_dataframe(spark, ["payload-1", "payload-2"])
    assert rdf.columns == ["value"]
    with pytest.raises(NotImplementedError):
        new_serde("xml")
