"""Sources — S1/S2 of the reference surface, batch and streaming.

The reference subscribes to Kafka topics with typed JSON records
(``src/rss_consumer.py:33-37`` etc.). Engine restatement: explicit-schema
readers (never ``inferSchema`` — SURVEY.md §1.3). Kafka needs a broker, so the
streaming tests use file sources with the same ``from_json`` decode path; the
Kafka reader is the same function with a different format string.

Scale: JSON decode happens once at the edge; everything downstream is
columnar. For parquet scans, pass ``columns`` to prune at the reader so the
scan's ReadSchema only carries what the query needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


#: testdata columns stored as parquet INT64 TIMESTAMP(NANOS), which Spark's
#: vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL). Read them as
#: raw nanos longs (legacy.parquet.nanosAsLong) and rebuild the timestamp
#: with exact integer arithmetic — `div 1000` truncates ns→µs the same way
#: DuckDB's TIMESTAMP_NS→µs conversion does. Float division would lose
#: precision on 19-digit epoch-nanos.
NANOS_TS_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}

#: tables whose queries run per-row compute kernels (regex / minhash /
#: vector folds) heavy enough to be worth parallelizing at load — see the
#: spread note in load_table
_SPREAD_TABLES = frozenset({"documents", "embeddings"})

#: parquet schema per table path — populated on first read (see load_table)
_SCHEMA_CACHE: dict[str, T.StructType] = {}


def read_parquet(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def estimated_file_splits(spark: SparkSession, paths: list[str], stop_at: int) -> int:
    """Scan-split estimate from file metadata ONLY — no Spark job.

    ``df.rdd.getNumPartitions()`` under AQE materializes upstream query
    stages (a real scan+shuffle job) just to learn the partition count, so
    the spread gates must not touch ``.rdd``. Instead: splits ≈
    Σ max(1, ceil(len/maxPartitionBytes)) over the input files, via the
    Hadoop FileSystem client (driver-side metadata, any scheme). Early-out
    at ``stop_at``: a production corpus with thousands of files answers
    after one directory listing, not one RPC per file. Parquet row-group
    granularity means the TRUE split count can be lower for huge
    single-row-group files — acceptable: such files are a layout bug this
    estimate shouldn't reward, and testdata files are all sub-split-size
    (estimate exact)."""
    sc = spark.sparkContext
    jvm = sc._jvm
    max_bytes = jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    conf = sc._jsc.hadoopConfiguration()
    splits = 0
    for p in paths:
        jp = jvm.org.apache.hadoop.fs.Path(p)
        fs = jp.getFileSystem(conf)
        for st in fs.globStatus(jp) or []:
            if st.isDirectory():
                for sub in fs.listStatus(st.getPath()):
                    if not sub.isDirectory():
                        splits += max(1, -(-sub.getLen() // max_bytes))
                        if splits >= stop_at:
                            return splits
            else:
                splits += max(1, -(-st.getLen() // max_bytes))
        if splits >= stop_at:
            return splits
    return splits


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    spread: bool = True,
) -> DataFrame:
    """Read one testdata table, normalizing nanos-timestamp columns to
    proper ``TimestampType`` so every downstream operator sees real
    timestamps regardless of the writer's parquet flavor.

    Both confs below are already session defaults in
    ``session.build_session``; they are re-asserted here (idempotently)
    because the correctness driver runs these queries under ITS OWN
    SparkSession, which doesn't go through our factory — without UTC +
    nanosAsLong the events scan fails outright (PARQUET_TYPE_ILLEGAL) or
    drifts by the session timezone."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # parquet flavor varies by generator run: TIMESTAMP(NANOS) needs the
    # raw-longs escape hatch; TIMESTAMP(MICROS, isAdjustedToUTC=false) would
    # infer as TIMESTAMP_NTZ (no numeric casts) unless inference is off
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    ts_cols = NANOS_TS_COLUMNS.get(name, [])
    if ts_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # schema-inference fires a (tiny but real) footer-read job on EVERY
    # spark.read.parquet call; cache the inferred schema so only the first
    # read of a table pays it and every later query build is job-free.
    # Keyed per path: immutable testdata, and a changed file would be a
    # new sf_dir. (r4: this was ~600 pointless jobs per bench session.)
    key = f"{sf_dir}/{name}.parquet"
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(key)
        _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(key)
    for c in ts_cols:
        dtype = dict(df.dtypes).get(c)
        if dtype == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtype == "timestamp_ntz":
            # session tz is UTC, so this cast preserves the wall-clock value
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    # CPU-parallelism guard: single-row-group testdata parquet arrives as
    # ONE split (byte-range splits can't cut inside a row group), so every
    # narrow stage — regex/tokenize/explode/minhash chains — would
    # serialize behind one task (observed: whole text pipelines running
    # (0+1)/1 stages at sf0.1 on local[32]). Round-robin to core count
    # only when the scan under-splits; production-size tables exceed core
    # count in splits, making this a no-op — no exchange appears at
    # 100 TB. Row order is never load-bearing (every law is keyed or
    # hash-ordered), so this is placement-only.
    #
    # Only the compute-bound tables qualify: documents/embeddings feed
    # per-row regex/minhash/vector kernels that dominate their queries.
    # Relational tables (lineitem/orders/events) go straight into keyed
    # joins/aggregations that shuffle on their OWN keys — a round-robin
    # exchange before them is pure overhead (measured: +0.6-1.5 s per
    # TPC-H-shape query at sf0.1 with no compute to parallelize).
    # ``spread=False`` opts out for consumers that impose their OWN
    # partitioning immediately (e.g. a keyed repartition feeding a
    # partitionBy sink) — a round-robin exchange before theirs is pure
    # double-shuffle (measured: partitioned_sink 0.93 s → 0.41 s at sf0.1)
    if spread and name in _SPREAD_TABLES:
        target = spark.sparkContext.defaultParallelism
        # metadata-only estimate — .rdd.getNumPartitions() under AQE runs
        # a real job per call, charged to every query build (r4 fix)
        if estimated_file_splits(spark, [f"{sf_dir}/{name}.parquet"], target) < target:
            df = df.repartition(target)
    return df.select(*columns) if columns else df


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events.parquet`` as a file-source STREAM with ``ts`` normalized to
    ``TimestampType`` whichever parquet flavor the generator used (INT64
    nanos → exact integer ns→µs truncation; MICROS/NTZ → plain cast under
    the UTC session). Mirrors ``load_table``'s batch normalization so the
    streaming twins see byte-identical event times."""
    load_table(spark, sf_dir, "events")  # asserts session confs
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .parquet(sf_dir)
    )
    dtype = dict(stream.dtypes).get("ts")
    if dtype == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def read_json_records(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Batch analog of a typed Kafka topic: JSON-lines with a declared
    schema. Bad records become nulls (PERMISSIVE) and flow to the
    dead-letter split (K4) rather than killing the job."""
    return spark.read.schema(schema).json(path)


def decode_json_value(df: DataFrame, schema: T.StructType, value_col: str = "value") -> DataFrame:
    """Kafka-style decode: a binary/string ``value`` column → typed columns
    (``from_json(value, schema)``), the S1 mapping."""
    return df.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("rec")
    ).select("rec.*")


def read_kafka_stream(
    spark: SparkSession, brokers: str, topic: str, schema: T.StructType
) -> DataFrame:
    """S1 — Kafka topic → typed streaming DataFrame. Requires a broker and
    the spark-sql-kafka package at runtime; kept thin so the decode path is
    shared with the file-source tests."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .load()
    )
    return decode_json_value(raw, schema)


def read_json_stream(
    spark: SparkSession, path: str, schema: T.StructType, max_files: int = 10
) -> DataFrame:
    """File-source streaming twin of ``read_kafka_stream`` (used by tests —
    no broker in this environment)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .json(path)
    )
