"""Registry implementation, part 13 — r13 additions (VERDICT r12 next-
round items 2+3): the PERSISTED-band-table snapshot roll (the production
contract ``snapshot_band_delta`` documented — the band table round-trips
through parquet and only delta signatures are computed), the continuous-
crawl STREAMING snapshot roll (``foreachBatch`` batches carrying inserts
AND retirements, maintaining the band-table + doc-store state across
triggers), and the band-table skew audit run before a roll. Chained
after part12 in the established pattern."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ingestion_scripts_spark.registry import part12 as _prev  # noqa: F401
from ingestion_scripts_spark.registry.part12 import *  # noqa: F401,F403


# ---------------------------------------------------------------------------
# persisted-band-table snapshot roll (production maintained-state contract)
# ---------------------------------------------------------------------------

def q_snapshot_band_roll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair delta across a snapshot roll through the PERSISTED
    band table (operators/dedup.py::snapshot_band_roll): snapshot1's band
    table is WRITTEN TO PARQUET first (the state a prior roll would have
    left) and read back — the roll never re-signs the corpus, it
    minhashes the inserts only and point-looks-up candidate endpoints in
    the doc store. Splits: snapshot1 = doc_id % 4 != 0; the roll deletes
    its doc_id % 9 == 0 members and inserts the doc_id % 4 == 0 docs.
    The oracle recomputes both snapshots' verified pair sets in full and
    diffs them — same IVM law as ``snapshot_dedup_delta``, now certified
    through the maintained-state path."""
    from ingestion_scripts_spark.operators.dedup import (
        banded_buckets,
        snapshot_band_roll,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")  # noqa: F405
    base = docs.filter(F.col("doc_id") % 4 != 0)
    inserts = docs.filter(F.col("doc_id") % 4 == 0)
    delete_ids = base.filter(F.col("doc_id") % 9 == 0).select("doc_id")

    state = _scratch(prefix="bandroll_")  # noqa: F405
    banded_buckets(base, "doc_id", "text").write.mode("overwrite").parquet(
        f"{state}/bands_v1"
    )
    base_bands = spark.read.parquet(f"{state}/bands_v1")
    _, delta = snapshot_band_roll(
        base_bands, docs, inserts, delete_ids, "doc_id", "text", threshold=0.8
    )
    return delta.orderBy("status", "id1", "id2")


SQL_SNAPSHOT_BAND_ROLL = f"""
WITH sh AS (SELECT doc_id, {_SH} AS sh FROM documents),
sig AS (SELECT doc_id, sh, {_SIG} AS sig FROM sh WHERE len(sh) > 0),
banded AS (
  SELECT doc_id, b AS band,
         md5(array_to_string(list_transform(sig[b*4+1:b*4+4], x -> x::VARCHAR), ',')) AS bucket
  FROM sig, unnest([0,1,2,3]) AS u(b)),
p1 AS (
  SELECT DISTINCT least(a.doc_id, b.doc_id) AS id1,
                  greatest(a.doc_id, b.doc_id) AS id2
  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
    AND a.doc_id % 4 <> 0 AND b.doc_id % 4 <> 0),
p2 AS (
  SELECT DISTINCT least(a.doc_id, b.doc_id) AS id1,
                  greatest(a.doc_id, b.doc_id) AS id2
  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
    AND (a.doc_id % 4 = 0 OR a.doc_id % 9 <> 0)
    AND (b.doc_id % 4 = 0 OR b.doc_id % 9 <> 0)),
v1 AS (
  SELECT id1, id2,
         round(len(list_intersect(a.sh, b.sh))::DOUBLE /
               len(list_distinct(a.sh || b.sh)), 6) AS jaccard
  FROM p1 JOIN sh a ON p1.id1 = a.doc_id JOIN sh b ON p1.id2 = b.doc_id
  WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
              len(list_distinct(a.sh || b.sh)), 6) >= 0.8),
v2 AS (
  SELECT id1, id2,
         round(len(list_intersect(a.sh, b.sh))::DOUBLE /
               len(list_distinct(a.sh || b.sh)), 6) AS jaccard
  FROM p2 JOIN sh a ON p2.id1 = a.doc_id JOIN sh b ON p2.id2 = b.doc_id
  WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
              len(list_distinct(a.sh || b.sh)), 6) >= 0.8)
SELECT v2.id1, v2.id2, v2.jaccard, 'formed' AS status
FROM v2 LEFT JOIN v1 ON v2.id1 = v1.id1 AND v2.id2 = v1.id2
WHERE v1.id1 IS NULL
UNION ALL
SELECT v1.id1, v1.id2, v1.jaccard, 'dissolved' AS status
FROM v1 LEFT JOIN v2 ON v1.id1 = v2.id1 AND v1.id2 = v2.id2
WHERE v2.id1 IS NULL
ORDER BY status, id1, id2"""


# ---------------------------------------------------------------------------
# band-table skew audit (pre-roll maintenance check)
# ---------------------------------------------------------------------------

def q_band_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew/health audit of the documents corpus's LSH band table
    (operators/dedup.py::band_table_stats): per band — rows, distinct
    buckets, max bucket width, and pair_mass = Σ w·(w−1)/2, the exact
    in-bucket candidate-pair count a batch self-join over that band
    would generate. The check run against the PERSISTED index before a
    ``snapshot_band_roll``: hot buckets are where a roll's equi-join
    goes quadratic."""
    from ingestion_scripts_spark.operators.dedup import (
        band_table_stats,
        banded_buckets,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")  # noqa: F405
    return band_table_stats(banded_buckets(docs, "doc_id", "text"))


SQL_BAND_SKEW_AUDIT = f"""
WITH sh AS (SELECT doc_id, {_SH} AS sh FROM documents),
sig AS (SELECT doc_id, sh, {_SIG} AS sig FROM sh WHERE len(sh) > 0),
banded AS (
  SELECT doc_id, b AS band,
         md5(array_to_string(list_transform(sig[b*4+1:b*4+4], x -> x::VARCHAR), ',')) AS bucket
  FROM sig, unnest([0,1,2,3]) AS u(b)),
width AS (
  SELECT band, bucket, count(*)::BIGINT AS w
  FROM banded GROUP BY band, bucket)
SELECT band,
       CAST(sum(w) AS BIGINT) AS n_rows,
       count(*)::BIGINT AS n_buckets,
       CAST(max(w) AS BIGINT) AS max_width,
       CAST(sum(w * (w - 1) // 2) AS BIGINT) AS pair_mass
FROM width GROUP BY band ORDER BY band"""


# ---------------------------------------------------------------------------
# streaming snapshot roll (continuous crawl: inserts + retirements)
# ---------------------------------------------------------------------------

def _roll_trigger(
    spark: SparkSession,
    batch_df: DataFrame,
    state: str,
    sink: str,
    ver: dict,
) -> None:
    """One trigger of the streaming snapshot roll — module-level so the
    replay contract is unit-testable (tests/test_r14_advice.py invokes it
    twice with the same batch and asserts state AND sink are unchanged).

    Replay safety (ADVICE r13): every write this trigger performs is a
    VERSIONED OVERWRITE keyed by the content-derived step — bands_v{s},
    corpus_v{s}, and the per-batch delta at delta_v{s} (previously a
    non-idempotent append that a retried trigger would double-count).
    The step comes from the batch CONTENT (min(doc_id % 3) — this
    harness's schedule), not the arrival counter, so a Spark foreachBatch
    retry recomputes from the still-present v{s-1} state and overwrites
    v{s} byte-identically; the counter only asserts the schedule: a step
    that is neither the expected next nor a replay of the previous one
    fails loudly instead of emitting a wrong-but-plausible delta."""
    # ONE job decides emptiness AND the content step: min over an empty
    # batch is NULL (⇔ the old isEmpty() probe), so the separate
    # emptiness job per trigger is folded into the step aggregate
    # (optimization r14, guide §1.2: per-trigger wall here is
    # trigger-count × fixed job overhead)
    step = batch_df.select(
        F.min(F.col("doc_id") % 3).cast("int").alias("b")
    ).collect()[0].b
    if step is None:
        return
    assert step in (ver["n"], ver["n"] - 1), (
        f"batch arrival out of order: content step {step}, expected "
        f"{ver['n']} (or a replay of {ver['n'] - 1})"
    )
    if step == 0:
        prev_bands = spark.createDataFrame(
            [], "doc_id long, band int, bucket string"
        )
        prev_corpus = spark.createDataFrame([], "doc_id long, text string")
    else:
        prev_bands = spark.read.parquet(f"{state}/bands_v{step - 1}")
        prev_corpus = spark.read.parquet(f"{state}/corpus_v{step - 1}")
    retire = prev_corpus.filter(F.col("doc_id") % 7 == step).select("doc_id")
    texts = prev_corpus.unionByName(batch_df)
    # validate=False: the schedule is disjoint BY CONSTRUCTION (batch b
    # inserts doc_id % 3 == b, never previously a member; retirements
    # filter current members) — the eager guard is certified on the
    # batch path (snapshot_band_roll query + tests/test_r13_new_ops),
    # and two extra jobs per trigger would only inflate the fixed
    # per-trigger overhead this harness's latency model documents
    from ingestion_scripts_spark.operators.dedup import snapshot_band_roll

    new_bands, delta = snapshot_band_roll(
        prev_bands, texts, batch_df, retire, "doc_id", "text",
        threshold=0.8, validate=False,
    )
    new_bands.write.mode("overwrite").parquet(f"{state}/bands_v{step}")
    (
        prev_corpus.join(retire, "doc_id", "left_anti")
        .unionByName(batch_df)
        .write.mode("overwrite")
        .parquet(f"{state}/corpus_v{step}")
    )
    delta.withColumn("batch", F.lit(step).cast("int")).write.mode(
        "overwrite"
    ).parquet(f"{sink}/delta_v{step}")
    ver["n"] = step + 1


def q_stream_snapshot_roll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous-crawl shape (VERDICT r12 item 3): a REAL streaming
    job whose micro-batches carry inserts AND retirements, maintaining
    the kept band table + doc-store across triggers with
    ``snapshot_band_roll`` and emitting each batch's formed/dissolved
    verified pair delta. Three deterministic batches insert doc_id % 3
    == b; batch b additionally retires current members with doc_id % 7
    == b (batch 0 retires nothing — the corpus starts empty). State
    round-trips through versioned parquet (bands_v{b}, corpus_v{b}, and
    the delta sink itself as delta_v{b} overwrites — replay-safe,
    ADVICE r13, pinned by tests/test_r14_advice.py) —
    the ``stream_idempotent_sink`` replay pattern — so every trigger
    reads the PERSISTED band table a prior trigger wrote; the corpus is
    never re-signed.

    The oracle computes each snapshot's verified pair set from one
    full-corpus pair table restricted to the batch-b membership
    predicate and diffs consecutive snapshots — the unrolled-batch law
    (band buckets and texts are per-doc, so pairs(M_k) is the full pair
    set restricted to M_k).

    Latency model (~8-11 s at bench SF): wall is micro-batch count ×
    fixed per-trigger overhead (stream planning, two parquet state
    re-reads, three writes, checkpoint fsync). Delta-plane MinHash work
    at this SF is milliseconds; total scales with trigger count, not
    rows, and amortizes away at production batch sizes."""
    import glob
    import os
    import time

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")  # noqa: F405
    src = _scratch(prefix="roll_src_")  # noqa: F405
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b{i}")
    now = time.time()
    for i in range(3):
        for p in glob.glob(f"{src}/b{i}/*.parquet"):
            os.utime(p, (now - 300 + 50 * i, now - 300 + 50 * i))
    state = _scratch(prefix="roll_state_")  # noqa: F405
    sink = _scratch(prefix="roll_sink_") + "/out"  # noqa: F405
    ver = {"n": 0}

    def handle(batch_df: DataFrame, _bid: int) -> None:
        _roll_trigger(spark, batch_df, state, sink, ver)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    # per-trigger band-roll joins run over KB-sized deltas: shuffle
    # partitions sized to input bytes, not cores (optimization r15,
    # guide §2.2 — measured 18.8 s → 14.5 s; see stream_state_partitions)
    from ingestion_scripts_spark.streaming.streams import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, src)
    ):
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", _scratch(prefix="ckpt_"))  # noqa: F405
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        # the delta sink is versioned subdirs (delta_v{step}, replay-safe
        # overwrites — ADVICE r13); union on read
        spark.read.option("recursiveFileLookup", "true")
        .parquet(sink)
        .select("batch", "id1", "id2", "jaccard", "status")
        .orderBy("batch", "status", "id1", "id2")
    )


_M1 = "({a} % 3 = 0)"
_M2 = "(({a} % 3 = 0 AND {a} % 7 <> 1) OR {a} % 3 = 1)"
_M3 = f"((({_M2}) AND {{a}} % 7 <> 2) OR {{a}} % 3 = 2)"


def _roll_delta_sql(batch: int, m_prev: str, m_next: str) -> str:
    prev1, prev2 = m_prev.format(a="id1"), m_prev.format(a="id2")
    next1, next2 = m_next.format(a="id1"), m_next.format(a="id2")
    return f"""
SELECT {batch} AS batch, id1, id2, jaccard, 'formed' AS status
FROM pv WHERE ({next1} AND {next2}) AND NOT ({prev1} AND {prev2})
UNION ALL
SELECT {batch} AS batch, id1, id2, jaccard, 'dissolved' AS status
FROM pv WHERE ({prev1} AND {prev2}) AND NOT ({next1} AND {next2})"""


SQL_STREAM_SNAPSHOT_ROLL = f"""
WITH sh AS (SELECT doc_id, {_SH} AS sh FROM documents),
sig AS (SELECT doc_id, sh, {_SIG} AS sig FROM sh WHERE len(sh) > 0),
banded AS (
  SELECT doc_id, b AS band,
         md5(array_to_string(list_transform(sig[b*4+1:b*4+4], x -> x::VARCHAR), ',')) AS bucket
  FROM sig, unnest([0,1,2,3]) AS u(b)),
cand AS (
  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
pv AS (
  SELECT id1, id2,
         round(len(list_intersect(a.sh, b.sh))::DOUBLE /
               len(list_distinct(a.sh || b.sh)), 6) AS jaccard
  FROM cand JOIN sh a ON cand.id1 = a.doc_id JOIN sh b ON cand.id2 = b.doc_id
  WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
              len(list_distinct(a.sh || b.sh)), 6) >= 0.8)
{_roll_delta_sql(0, "(FALSE)", _M1)}
UNION ALL
{_roll_delta_sql(1, _M1, _M2)}
UNION ALL
{_roll_delta_sql(2, _M2, _M3)}
ORDER BY batch, status, id1, id2"""


# ---------------------------------------------------------------------------
# content-defined chunking dedup report (variable-length chunk store)
# ---------------------------------------------------------------------------

def q_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source storage-dedup report over content-defined chunks
    (operators/chunking.py::cdc_dedup_report): every document is split
    at token positions where the 4-token window hash ≡ 0 (mod 16) —
    boundaries follow CONTENT, so shared regions between documents with
    different prefixes produce identical chunk hashes (the LBFS/Rabin
    scheme, the variable-length complement to the fixed-k span family).
    A chunk occurrence is duplicate when its hash appeared earlier in
    global (doc_id, start_pos) order; dedup_ppm is the exact-integer
    token-mass savings a content-addressed chunk store would realize."""
    from ingestion_scripts_spark.operators.chunking import cdc_dedup_report

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")  # noqa: F405
    return cdc_dedup_report(docs, "doc_id", "text", "source")


_CDC_H = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"
_CDC_WIN = _CDC_H.format(x="array_to_string(t[i-3:i], ' ')")
_CDC_CHUNK = _CDC_H.format(x="array_to_string(p.t[c.start:c.endpos], ' ')")

SQL_CDC_CHUNK_DEDUP = f"""
WITH pos AS (
  SELECT doc_id, source,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents),
docs AS (SELECT doc_id, source, t, len(t) AS n FROM pos WHERE len(t) > 0),
cand AS (
  SELECT doc_id, u.i AS b
  FROM docs, unnest(generate_series(4, n)) AS u(i)
  WHERE n >= 4 AND ({_CDC_WIN}) % 16 = 0),
bnd AS (
  SELECT doc_id, b FROM cand
  UNION
  SELECT doc_id, n AS b FROM docs),
chunk AS (
  SELECT doc_id, b AS endpos,
         coalesce(lag(b) OVER (PARTITION BY doc_id ORDER BY b), 0) + 1
           AS start
  FROM bnd),
rows_ AS (
  SELECT c.doc_id, p.source, c.start,
         c.endpos - c.start + 1 AS clen,
         {_CDC_CHUNK} AS chash
  FROM chunk c JOIN docs p USING (doc_id)),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY chash ORDER BY doc_id, start)
    AS rn
  FROM rows_)
SELECT source,
       count(*)::BIGINT AS n_chunks,
       sum(CASE WHEN rn >= 2 THEN 1 ELSE 0 END)::BIGINT AS dup_chunks,
       CAST(sum(clen) AS BIGINT) AS total_tokens,
       CAST(coalesce(sum(CASE WHEN rn >= 2 THEN clen END), 0) AS BIGINT)
         AS dup_tokens,
       CAST((coalesce(sum(CASE WHEN rn >= 2 THEN clen END), 0) * 1000000)
            // sum(clen) AS BIGINT) AS dedup_ppm
FROM ranked GROUP BY source ORDER BY source"""


__all__ = list(_prev.__all__) + [  # noqa: PLE0605
    "q_snapshot_band_roll", "SQL_SNAPSHOT_BAND_ROLL",
    "q_band_skew_audit", "SQL_BAND_SKEW_AUDIT",
    "q_stream_snapshot_roll", "SQL_STREAM_SNAPSHOT_ROLL",
    "q_cdc_chunk_dedup", "SQL_CDC_CHUNK_DEDUP",
]
