"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API): a
partition-parallel deterministic feed source.

The reference's input stage is a poller that turns external RSS/Reddit/
Twitter feeds into typed records on a Kafka topic (``src/rss_consumer.py``
via feedparser; the engine's offline model of the HTTP fetch itself is the
pre-fetched-content join, SURVEY §2.1 S4). This module covers the *source
API* half of that story: how a user plugs a brand-new external system into
the engine as a first-class ``spark.read.format(...)`` source —
schema declaration, option handling, and partition planning included —
without touching JVM code.

Determinism: every generated row is a pure function of its global row
index, so the DuckDB oracle can reproduce the dataset exactly with
``generate_series`` — the source is differential-testable like every other
operator (rows are SQL-law-derived, NOT random).

Scale design: ``partitions()`` splits the row range into
``numPartitions`` independent ranges; each executor materializes only its
own slice (an iterator, never a driver-side list), exactly how a real
connector shards a feed list or a topic's partitions across a cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

#: fixed row law (index → row) — mirrored EXACTLY by sql_feed_rows()
N_FEEDS = 5


def _row(i: int) -> tuple:
    feed = f"feed_{i % N_FEEDS}"
    title = f"item {i} from {feed}"
    link = f"https://example.invalid/{feed}/item/{i}"
    # deterministic pseudo-score decoupled from the partition layout
    score = (i * 37) % 101
    return (feed, title, link, i, score)


FEED_SCHEMA = (
    "feed_source string, title string, link string, item_id bigint, score bigint"
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class FeedFixtureReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", "1000"))
        self.num_partitions = int(options.get("numPartitions", "4"))

    def partitions(self) -> list[InputPartition]:
        n, p = self.rows, max(1, self.num_partitions)
        step = (n + p - 1) // p if n else 1
        return [
            _RangePartition(lo, min(lo + step, n)) for lo in range(0, n, step)
        ] or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class FeedFixtureStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming read of the same row law — the Kafka-ish
    contract (monotone offsets, replayable ranges, commit) for a custom
    feed: each poll serves at most ``batchRows`` new items until ``rows``
    are exhausted. ``readBetweenOffsets`` replays any committed range
    bit-identically (rows are index-derived), which is exactly the
    at-least-once recovery contract checkpoint recovery needs."""

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", "1000"))
        self.batch_rows = int(options.get("batchRows", "250"))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["i"]
        hi = min(lo + self.batch_rows, self.rows)
        return iter([_row(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter([_row(i) for i in range(start["i"], end["i"])])

    def commit(self, end: dict) -> None:
        pass  # nothing to release: the row law is stateless


class FeedFixtureDataSource(DataSource):
    """``spark.read[Stream].format("feed_fixture").option("rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "feed_fixture"

    def schema(self) -> str:
        return FEED_SCHEMA

    def reader(self, schema) -> FeedFixtureReader:
        return FeedFixtureReader(self.options)

    def simpleStreamReader(self, schema) -> FeedFixtureStreamReader:
        return FeedFixtureStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom source with a session."""
    spark.dataSource.register(FeedFixtureDataSource)


def sql_feed_rows(rows: int) -> str:
    """DuckDB twin of the row law — a relation identical to
    ``spark.read.format("feed_fixture").option("rows", rows).load()``."""
    return f"""
SELECT 'feed_' || (i % {N_FEEDS}) AS feed_source,
       'item ' || i || ' from feed_' || (i % {N_FEEDS}) AS title,
       'https://example.invalid/feed_' || (i % {N_FEEDS}) || '/item/' || i
         AS link,
       i AS item_id,
       (i * 37) % 101 AS score
FROM (SELECT unnest(generate_series(0, {rows} - 1)) AS i)
"""


# ---------------------------------------------------------------------------
# writer half: the same custom-connector story for the SINK side
# ---------------------------------------------------------------------------


class _FileCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


class JsonlSinkWriter(DataSourceWriter):
    """Partition-parallel JSONL writer with a two-phase commit protocol:
    each task writes its partition to a ``.inprogress`` temp file and
    reports it in a commit message; only the DRIVER's ``commit`` renames
    the temp files into place (and ``abort`` deletes them) — so a failed
    or speculatively re-run task can never leave a half-visible file.
    This is the task-commit contract every real connector sink (Kafka
    transactional producer, object-store multipart upload) implements.
    """

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> _FileCommit:
        import json
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl.inprogress"
        )
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileCommit(tmp, n)

    def commit(self, messages) -> None:
        import os

        for m in messages:
            os.rename(m.tmp_path, m.tmp_path[: -len(".inprogress")])

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options)


def register_sink(spark) -> None:
    """Idempotent registration of the custom sink with a session."""
    spark.dataSource.register(JsonlSinkDataSource)
