"""Testdata contract smoke: the driver regenerates the parquet between
rounds and has already changed the events timestamp flavor once (INT64
NANOS -> MICROS/NTZ). These assertions catch the next flavor/schema drift
in seconds instead of via a failing query deep in a join."""

import pyarrow.parquet as pq

from ingestion_scripts_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_events_ts_normalizes_to_timestamp(spark):
    ev = load_table(spark, SF, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp", ev.dtypes
    # wall-clock values must match what DuckDB/pyarrow read from the file
    raw = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "ts"])
    want = {r["event_id"]: r["ts"] for r in raw.to_pylist()[:100]}
    got = {
        r.event_id: r.ts
        for r in ev.select("event_id", "ts").limit(10000).collect()
        if r.event_id in want
    }
    mismatch = {k for k in want if want[k].replace(tzinfo=None) != got[k]}
    assert not mismatch, sorted(mismatch)[:5]


def test_table_schemas_are_stable(spark):
    expect = {
        "documents": {"doc_id", "text", "lang", "source", "n_chars"},
        "embeddings": {"vec_id", "embedding", "label"},
        "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    }
    for name, cols in expect.items():
        got = set(load_table(spark, SF, name).columns)
        assert got == cols, (name, got)
