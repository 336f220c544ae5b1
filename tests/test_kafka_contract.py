"""K1 Kafka branch, executed without a broker (VERDICT r3 item 4).

No Kafka broker or spark-sql-kafka package exists in this container, so
the real wire cannot run. What CAN be executed is everything the engine
owns: the exact ``format``/``option`` calls ``write_kafka_stream`` /
``read_kafka_stream`` issue, the JSON payload serialization (reference
``rss_consumer.py:72`` topic.send record serializer), and the
``from_json`` typed-decode path (reference ``rss_consumer.py:33-37``
topic subscription) — by monkeypatching the stream writer/reader so the
"kafka" format transparently lands on an in-container source/sink while
every option and the payload schema are captured and asserted.
"""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)

ROWS = [
    {"event_id": 1, "user_id": 7, "event_type": "view"},
    {"event_id": 2, "user_id": 8, "event_type": "click"},
]


def test_write_kafka_stream_contract(spark, tmp_path, monkeypatch):
    from pyspark.sql.streaming.readwriter import DataStreamWriter

    from ingestion_scripts_spark.streaming.streams import write_kafka_stream

    captured = {"options": {}}
    orig_format = DataStreamWriter.format
    orig_option = DataStreamWriter.option
    orig_start = DataStreamWriter.start

    def fake_format(self, fmt):
        captured["format"] = fmt
        # the memory sink stands in for the broker; everything upstream of
        # the sink (payload projection, serialization) is the real path
        return orig_format(self, "memory" if fmt == "kafka" else fmt)

    def fake_option(self, k, v):
        captured["options"][k] = v
        if k in ("kafka.bootstrap.servers", "topic"):
            return self  # kafka-only options would error on the memory sink
        return orig_option(self, k, v)

    def fake_start(self, *a, **kw):
        captured["payload_schema"] = self._df.schema
        return orig_start(self, queryName="k1_smoke")

    monkeypatch.setattr(DataStreamWriter, "format", fake_format)
    monkeypatch.setattr(DataStreamWriter, "option", fake_option)
    monkeypatch.setattr(DataStreamWriter, "start", fake_start)

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "part0.json", "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema(EVENT).json(str(src))

    q = write_kafka_stream(
        stream,
        brokers="broker:9092",
        topic="events.out",
        checkpoint=str(tmp_path / "ckpt"),
        value_cols=["event_id", "event_type"],
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # the writer spoke the kafka sink protocol...
    assert captured["format"] == "kafka"
    assert captured["options"]["kafka.bootstrap.servers"] == "broker:9092"
    assert captured["options"]["topic"] == "events.out"
    assert "checkpointLocation" in captured["options"]
    # ...with the kafka payload contract: exactly one string `value` column
    fields = captured["payload_schema"].fields
    assert [f.name for f in fields] == ["value"]
    assert isinstance(fields[0].dataType, T.StringType)
    # and the serialized messages are the selected columns as JSON
    got = sorted(
        json.loads(r.value)["event_id"]
        for r in spark.sql("SELECT value FROM k1_smoke").collect()
    )
    assert got == [1, 2]
    payload = json.loads(spark.sql("SELECT value FROM k1_smoke").first().value)
    assert set(payload) == {"event_id", "event_type"}


def test_read_kafka_stream_contract(spark, tmp_path, monkeypatch):
    from pyspark.sql.streaming.readwriter import DataStreamReader

    from ingestion_scripts_spark.sources.readers import read_kafka_stream

    captured = {"options": {}}
    orig_format = DataStreamReader.format
    orig_option = DataStreamReader.option
    orig_load = DataStreamReader.load

    src = tmp_path / "topic"
    src.mkdir()
    with open(src / "part0.txt", "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")

    def fake_format(self, fmt):
        captured["format"] = fmt
        # the text file source is the stand-in wire: it yields exactly the
        # kafka shape the decode path consumes — a string `value` column
        return orig_format(self, "text" if fmt == "kafka" else fmt)

    def fake_option(self, k, v):
        captured["options"][k] = v
        if k.startswith("kafka.") or k in ("subscribe",):
            return self
        return orig_option(self, k, v)

    def fake_load(self, path=None, **kw):
        return orig_load(self, path or str(src), **kw)

    monkeypatch.setattr(DataStreamReader, "format", fake_format)
    monkeypatch.setattr(DataStreamReader, "option", fake_option)
    monkeypatch.setattr(DataStreamReader, "load", fake_load)

    typed = read_kafka_stream(spark, brokers="broker:9092", topic="events.in", schema=EVENT)
    assert captured["format"] == "kafka"
    assert captured["options"]["kafka.bootstrap.servers"] == "broker:9092"
    assert captured["options"]["subscribe"] == "events.in"
    # the decode path produced the TYPED schema, not raw bytes
    assert typed.schema == EVENT

    q = (
        typed.writeStream.format("memory")
        .queryName("k1_read_smoke")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT event_id, user_id, event_type FROM k1_read_smoke ORDER BY event_id"
    ).collect()
    assert [(r.event_id, r.user_id, r.event_type) for r in rows] == [
        (1, 7, "view"),
        (2, 8, "click"),
    ]


def test_kafka_round_trip_write_then_read(spark, tmp_path, monkeypatch):
    """K1 ROUND-TRIP (VERDICT r4 item 5): records leave through
    ``write_kafka_stream`` and come back through ``read_kafka_stream`` as
    the same typed rows. No broker exists in this container, so the wire
    is an in-container stand-in — a text directory carrying exactly what
    Kafka carries (one string ``value`` per message) — while BOTH engine
    code paths (payload projection + JSON serialization on the way out,
    subscription + ``from_json`` typed decode on the way in) execute for
    real and unmodified."""
    from pyspark.sql.streaming.readwriter import DataStreamReader, DataStreamWriter

    from ingestion_scripts_spark.sources.readers import read_kafka_stream
    from ingestion_scripts_spark.streaming.streams import write_kafka_stream

    wire = tmp_path / "wire"
    wire.mkdir()

    # --- outbound: "kafka" sink lands each micro-batch's value column on the wire
    orig_wformat, orig_woption = DataStreamWriter.format, DataStreamWriter.option
    orig_wstart = DataStreamWriter.start

    def w_format(self, fmt):
        return orig_wformat(self, "memory" if fmt == "kafka" else fmt)

    def w_option(self, k, v):
        return self if k in ("kafka.bootstrap.servers", "topic") else orig_woption(self, k, v)

    def w_start(self, *a, **kw):
        return orig_wstart(self, queryName="k1_wire")

    monkeypatch.setattr(DataStreamWriter, "format", w_format)
    monkeypatch.setattr(DataStreamWriter, "option", w_option)
    monkeypatch.setattr(DataStreamWriter, "start", w_start)

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "part0.json", "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    q = write_kafka_stream(
        spark.readStream.schema(EVENT).json(str(src)),
        brokers="broker:9092",
        topic="events.rt",
        checkpoint=str(tmp_path / "ckpt_out"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    with open(wire / "messages.txt", "w") as f:
        for r in spark.sql("SELECT value FROM k1_wire").collect():
            f.write(r.value + "\n")

    # restore the writer before the inbound leg (its memory sink must keep
    # its own queryName)
    monkeypatch.setattr(DataStreamWriter, "format", orig_wformat)
    monkeypatch.setattr(DataStreamWriter, "option", orig_woption)
    monkeypatch.setattr(DataStreamWriter, "start", orig_wstart)

    # --- inbound: "kafka" source reads the wire (string value per message)
    orig_rformat, orig_roption = DataStreamReader.format, DataStreamReader.option
    orig_rload = DataStreamReader.load

    def r_format(self, fmt):
        return orig_rformat(self, "text" if fmt == "kafka" else fmt)

    def r_option(self, k, v):
        return self if k.startswith("kafka.") or k == "subscribe" else orig_roption(self, k, v)

    def r_load(self, path=None, **kw):
        return orig_rload(self, path or str(wire), **kw)

    monkeypatch.setattr(DataStreamReader, "format", r_format)
    monkeypatch.setattr(DataStreamReader, "option", r_option)
    monkeypatch.setattr(DataStreamReader, "load", r_load)

    typed = read_kafka_stream(spark, brokers="broker:9092", topic="events.rt", schema=EVENT)
    q2 = (
        typed.writeStream.format("memory")
        .queryName("k1_back")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    back = sorted(
        (r.event_id, r.user_id, r.event_type)
        for r in spark.table("k1_back").collect()
    )
    assert back == sorted((r["event_id"], r["user_id"], r["event_type"]) for r in ROWS)
