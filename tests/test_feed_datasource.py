"""Custom Python DataSource: partition planning + row-law determinism."""

from pyspark.sql import functions as F

from ingestion_scripts_spark.sources.feed_datasource import (
    FeedFixtureReader,
    register,
)


def test_partition_planning_covers_range_disjointly():
    r = FeedFixtureReader({"rows": "103", "numPartitions": "4"})
    parts = r.partitions()
    assert len(parts) == 4
    spans = sorted((p.start, p.end) for p in parts)
    assert spans[0][0] == 0 and spans[-1][1] == 103
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert e0 == s1  # contiguous, disjoint
    # rows=0 still plans one (empty) partition
    assert len(FeedFixtureReader({"rows": "0"}).partitions()) == 1


def test_source_reads_parallel_and_deterministic(spark):
    register(spark)
    df = (
        spark.read.format("feed_fixture")
        .option("rows", "1000")
        .option("numPartitions", "8")
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000
    # row law: item 0 belongs to feed_0, score = (i*37) % 101
    first = df.filter(F.col("item_id") == 0).collect()[0]
    assert first.feed_source == "feed_0" and first.score == 0
    probe = df.filter(F.col("item_id") == 42).collect()[0]
    assert probe.feed_source == "feed_2" and probe.score == (42 * 37) % 101
    # ids are exactly 0..999, no dup / no gap across partitions
    agg = df.agg(
        F.countDistinct("item_id").alias("d"), F.max("item_id").alias("m")
    ).collect()[0]
    assert (agg.d, agg.m) == (1000, 999)


def test_stream_reader_offsets_tile_exactly():
    from ingestion_scripts_spark.sources.feed_datasource import (
        FeedFixtureStreamReader,
    )

    r = FeedFixtureStreamReader({"rows": "600", "batchRows": "250"})
    off = r.initialOffset()
    seen = []
    for _ in range(5):  # 3 real polls then empty batches
        batch, off = r.read(off)
        seen.extend(batch)
    assert len(seen) == 600
    assert [t[3] for t in seen] == list(range(600))  # item_id tiles 0..599
    # replay of a committed middle range is bit-identical
    replay = list(r.readBetweenOffsets({"i": 250}, {"i": 500}))
    assert replay == seen[250:500]


def test_jsonl_sink_two_phase_commit(spark, tmp_path):
    """All task files are renamed at driver commit: no .inprogress files
    survive a successful save, and the rows round-trip exactly."""
    import os

    from ingestion_scripts_spark.sources.feed_datasource import register_sink

    register_sink(spark)
    out = str(tmp_path / "out")
    df = spark.range(100).selectExpr("id", "id % 3 AS grp")
    df.repartition(4).write.format("jsonl_sink").mode("append").option(
        "path", out
    ).save()
    files = os.listdir(out)
    assert files and not any(f.endswith(".inprogress") for f in files)
    assert all(f.endswith(".jsonl") for f in files)
    back = spark.read.schema("id bigint, grp bigint").json(out + "/*.jsonl")
    assert back.count() == 100
    assert {r.id for r in back.collect()} == set(range(100))


def test_jsonl_sink_abort_removes_temp_files(spark, tmp_path):
    """A failing task must leave no visible output: the driver abort hook
    deletes every reported temp file."""
    import os

    from ingestion_scripts_spark.sources.feed_datasource import register_sink

    register_sink(spark)
    out = str(tmp_path / "out_fail")
    df = spark.range(100).selectExpr(
        "id", "CASE WHEN id = 99 THEN raise_error('boom') ELSE 'ok' END AS s"
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        df.repartition(2).write.format("jsonl_sink").mode("append").option(
            "path", out
        ).save()
    leftover = os.listdir(out) if os.path.isdir(out) else []
    assert not [f for f in leftover if f.endswith(".jsonl")]
