"""Registry implementation, part 02 of 6 — a mechanical,
order-preserving split of the former monolithic ``__spark_entry__.py``
(r5 VERDICT item 7). Statements appear in their original order; parts
chain via ``import *`` with an explicit cumulative ``__all__`` (which
star-imports underscore-prefixed helpers that would otherwise be
skipped), so every call-time name resolves exactly as it did in the
single module. The stable front door (entry/queries/oracle_sql and the
driver-window registry order) remains in ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ingestion_scripts_spark import oracle as O
from ingestion_scripts_spark.caching import persist_tracked
from ingestion_scripts_spark.functions import sentiment as S
from ingestion_scripts_spark.functions import text as X
from ingestion_scripts_spark.functions import timefns as TF
from ingestion_scripts_spark.operators import dedup as D
from ingestion_scripts_spark.operators import keywords as K
from ingestion_scripts_spark.operators import similarity as SIM
from ingestion_scripts_spark.operators import text_analysis as TA

from ingestion_scripts_spark.registry.part01 import *  # noqa: F401,F403



# ---------------------------------------------------------------------------
# end-to-end LLM training-data curation (the composed §2.9 story)
# ---------------------------------------------------------------------------

def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a query (the lang-ID counterpart of
    ann_recall): confusion matrix of the heuristic language identifier
    against the labeled ``lang`` column — one narrow map + one keyed
    count. The harness matters more than this corpus's score: labeled
    eval tables are how production gates classifier upgrades."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("true_lang"),
            TA.lang_id(F.col("text")).alias("pred_lang"),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_lang", "pred_lang")
    )


def _sql_langid_confusion() -> str:
    return f"""
SELECT lang AS true_lang, {O.sql_lang_id('text')} AS pred_lang, count(*) AS n
FROM documents GROUP BY 1, 2 ORDER BY true_lang, pred_lang
"""


def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset DATASHEET in one query — corpus size, token volume,
    language/source diversity, rule-gate and classifier keep rates, exact
    duplicate rate, mean document length: the summary table a dataset
    card publishes. One scan computes every metric as sibling aggregates
    (no per-metric passes); the output is (metric, value) rows so new
    metrics append without schema changes."""
    docs = _t(spark, sf_dir, "documents")
    n_tok = TA.token_count_ws(F.col("text")).cast("double")
    agg = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum(n_tok).alias("total_ws_tokens"),
        F.countDistinct("lang").cast("double").alias("n_langs"),
        F.countDistinct("source").cast("double").alias("n_sources"),
        F.avg(TA.gopher_rules(F.col("text"))["keep"].cast("double")).alias(
            "__gopher"
        ),
        F.avg(TA.quality_classify(F.col("text"))["keep"].cast("double")).alias(
            "__qgate"
        ),
        F.countDistinct(X.hash64(F.col("text"))).cast("double").alias("__uniq"),
        F.avg(n_tok).alias("__mean_tok"),
    )
    m = agg.select(
        F.col("n_docs"),
        F.col("total_ws_tokens"),
        F.col("n_langs"),
        F.col("n_sources"),
        TA.r4(F.col("__gopher")).alias("gopher_keep_rate"),
        TA.r4(F.col("__qgate")).alias("qgate_keep_rate"),
        TA.r4(F.lit(1.0) - F.col("__uniq") / F.col("n_docs")).alias(
            "exact_dup_rate"
        ),
        TA.r4(F.col("__mean_tok")).alias("mean_doc_tokens"),
    )
    cols = m.columns
    long = m.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("metric"), F.col(c).alias("value"))
                    for c in cols
                ]
            )
        ).alias("kv")
    )
    return long.select("kv.metric", "kv.value").orderBy("metric")


def _sql_dataset_card() -> str:
    g = O.sql_gopher("text")["keep"]
    q = O.sql_quality_classify("text")["keep"]
    ntok = f"len({O.sql_tokenize_ws('text')})"
    return f"""
WITH a AS (
  SELECT count(*)::DOUBLE AS n_docs,
         sum({ntok})::DOUBLE AS total_ws_tokens,
         count(DISTINCT lang)::DOUBLE AS n_langs,
         count(DISTINCT source)::DOUBLE AS n_sources,
         {O.sql_r4(f'avg(({g})::DOUBLE)')} AS gopher_keep_rate,
         {O.sql_r4(f'avg(({q})::DOUBLE)')} AS qgate_keep_rate,
         {O.sql_r4(f"1.0 - count(DISTINCT {O.sql_hash64('text')})::DOUBLE / count(*)")}
           AS exact_dup_rate,
         {O.sql_r4(f'avg(({ntok})::DOUBLE)')} AS mean_doc_tokens
  FROM documents)
SELECT u.metric, u.value FROM (
  SELECT unnest(['n_docs','total_ws_tokens','n_langs','n_sources',
                 'gopher_keep_rate','qgate_keep_rate','exact_dup_rate',
                 'mean_doc_tokens']) AS metric,
         unnest([n_docs, total_ws_tokens, n_langs, n_sources,
                 gopher_keep_rate, qgate_keep_rate, exact_dup_rate,
                 mean_doc_tokens]) AS value
  FROM a) u
ORDER BY metric
"""


def q_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-water-mark incremental batch ingest (the scheduled-job cousin
    of streaming): the 'already loaded' ledger (all events with
    ts < 2024-01-25, a timestamp-cutoff snapshot of a prior run) yields a
    cursor = max(loaded ts); only rows strictly beyond it are processed
    this run. The cursor is a 1-row aggregate broadcast into the filter —
    no sort, no driver round-trip in the plan — and the output reports
    the per-type intake plus the NEW cursor that would be persisted."""
    ev = _t(spark, sf_dir, "events")
    loaded = ev.filter(F.col("ts") < F.lit("2024-01-25").cast("timestamp"))
    cursor = loaded.agg(F.max("ts").alias("__cursor"))
    fresh = ev.crossJoin(F.broadcast(cursor)).filter(F.col("ts") > F.col("__cursor"))
    return (
        fresh.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            _fmt_ts(F.max("ts"), with_micros=True).alias("new_cursor"),
        )
        .orderBy("event_type")
    )


SQL_INCREMENTAL_INGEST = f"""
SELECT event_type, count(*) AS n_new,
       {SQL_TS_US.format('max(ts)')} AS new_cursor
FROM events
WHERE ts > (SELECT max(ts) FROM events WHERE ts < TIMESTAMP '2024-01-25')
GROUP BY 1 ORDER BY event_type
"""


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnosis BEFORE the fix (the report you run before reaching
    for salting/AQE): the 20 hottest join/agg keys with their global row
    share — one keyed count with partials plus a TakeOrdered top-k; the
    share denominator is a 1-row broadcast. Pairs with salted_distinct /
    skew_join_revenue, which are the remediations."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "user_id", "n", TA.r4(F.col("n") / F.col("__t")).alias("share")
        )
        .orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(20)
    )


SQL_SKEW_REPORT = """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
t AS (SELECT sum(n) AS tt FROM c)
SELECT user_id, CAST(n AS BIGINT) AS n,
       floor((n / t.tt) * 10000.0 + 0.5) / 10000.0 AS share
FROM c, t ORDER BY n DESC, user_id ASC LIMIT 20
"""


def q_observed_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability (§K4's `observe` counters) through the REAL
    Observation API: an ingest-shaped scan registers row/null/dead-letter
    counters that piggyback on the ACTION (no second pass over the data —
    the production way to meter a 100 TB ingest), and the captured metrics
    themselves are the query result the oracle checks."""
    from pyspark.sql import Observation

    ev = _t(spark, sf_dir, "events")
    obs = Observation("ingest_metrics")
    bad = F.col("props").isNull() | ~F.col("props").rlike('^\\{.*\\}$')
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(bad.cast("bigint")).alias("n_bad"),
        F.sum(F.col("value").isNull().cast("bigint")).alias("n_null_value"),
        F.max("user_id").alias("max_user_id"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the metered action
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_bad"], m["n_null_value"], m["max_user_id"])],
        "n_rows bigint, n_bad bigint, n_null_value bigint, max_user_id bigint",
    )


SQL_OBSERVED_INGEST = """
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN props IS NULL OR NOT regexp_matches(props, '^\\{.*\\}$')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_value,
       max(user_id) AS max_user_id
FROM events
"""


_Z_BITS = 10  #: bits per dimension interleaved into the z-value


def _zval(x, y):
    """Bit-interleaved Morton code of two 10-bit ints — an unrolled
    shift/mask expression identical on both engines."""
    z = F.lit(0).cast("bigint")
    for b in range(_Z_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def _sql_zval(x: str, y: str) -> str:
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER data layout, with the skipping stats that justify it: events
    keyed by (user_id, value-bucket) are chunked into 64 z-ranges (top
    bits of the Morton code — deterministic width-based ranges, no sampled
    range partitioner) and, for contrast, into user-sorted ranges. Per
    chunk the query emits the 2-D min/max bounding box — exactly the
    file-footer stats a lakehouse reader prunes on. Z-range boxes stay
    tight in BOTH dimensions (pytest pins the aggregate value-span
    reduction), which is the entire point of multi-dimensional
    clustering at 100 TB."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % (1 << _Z_BITS)).cast("bigint").alias("u"),
        F.least(
            F.lit((1 << _Z_BITS) - 1), F.floor(F.col("value")).cast("bigint")
        ).alias("v"),
    )
    z = ev.withColumn("zv", _zval(F.col("u"), F.col("v")))
    zchunk = F.shiftright(F.col("zv"), 2 * _Z_BITS - 6)  # 64 z-ranges
    uchunk = F.shiftright(F.col("u"), _Z_BITS - 6)  # 64 user-sort ranges
    stats = lambda df, chunk, method: (  # noqa: E731
        df.groupBy(chunk.alias("chunk_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("u").alias("u_min"),
            F.max("u").alias("u_max"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
        )
        .withColumn("method", F.lit(method))
    )
    return (
        stats(z, zchunk, "zorder")
        .unionByName(stats(z, uchunk, "usort"))
        .select("method", "chunk_id", "n", "u_min", "u_max", "v_min", "v_max")
        .orderBy("method", "chunk_id")
    )


def _sql_zorder_layout() -> str:
    zv = _sql_zval("u", "v")
    return f"""
WITH base AS (
  SELECT event_id,
         CAST(user_id % {1 << _Z_BITS} AS BIGINT) AS u,
         CAST(least({(1 << _Z_BITS) - 1}, floor(value)) AS BIGINT) AS v
  FROM events),
z AS (SELECT *, {zv} AS zv FROM base),
zs AS (
  SELECT 'zorder' AS method, zv >> {2 * _Z_BITS - 6} AS chunk_id, count(*) AS n,
         min(u) AS u_min, max(u) AS u_max, min(v) AS v_min, max(v) AS v_max
  FROM z GROUP BY 2),
us AS (
  SELECT 'usort' AS method, u >> {_Z_BITS - 6} AS chunk_id, count(*) AS n,
         min(u) AS u_min, max(u) AS u_max, min(v) AS v_min, max(v) AS v_max
  FROM z GROUP BY 2)
SELECT method, CAST(chunk_id AS BIGINT) AS chunk_id, n,
       u_min, u_max, v_min, v_max
FROM (SELECT * FROM zs UNION ALL SELECT * FROM us)
ORDER BY method, chunk_id
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frame-sampling leg of the multimodal surface (video → sampled
    frames): posexplode plumbing with per-frame lineage (media_id,
    frame_no) — the extractor is the documented deterministic fake (fixed
    strides over the base64 payload; real deployments plug a decoder) but
    the exploded schema, ordering and lineage are the real contract, and
    the oracle recomputes the same strides byte-for-byte."""
    from ingestion_scripts_spark.operators.multimodal import (
        sample_frames,
        text_to_media,
    )

    docs = _t(spark, sf_dir, "documents")
    media = text_to_media(docs)
    return sample_frames(media).orderBy("media_id", "frame_no")


SQL_MULTIMODAL_FRAMES = """
WITH f AS (
  SELECT doc_id AS media_id,
         unnest(list_transform(range(0, 8),
                i -> struct_pack(fn := i,
                                 tok := substr(to_base64(encode(text)),
                                               CAST(i * 64 + 1 AS BIGINT), 16))))
           AS u
  FROM documents)
SELECT media_id, CAST(u.fn AS INTEGER) AS frame_no, u.tok AS frame_token
FROM f WHERE u.tok <> '' ORDER BY media_id, frame_no
"""


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation flow in ONE DataFrame program: quality gate →
    exact dedup (content hash, min-id survivor) → near-dup removal
    (MinHash-LSH pairs, drop the higher id) → per-doc token accounting.
    Every stage is an operator already verified in isolation; this query
    verifies their composition against one SQL program."""
    docs = _t(spark, sf_dir, "documents")
    q = TA.quality_score(F.col("text"))
    gated = docs.select(
        "doc_id", "text", "lang", q["quality"].alias("quality")
    ).filter(F.col("quality") >= 0.5)

    keyed = gated.withColumn("__h", X.hash64(F.col("text")))
    w = Window.partitionBy("__h").orderBy("doc_id")
    uniq = (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__h")
    )

    # uniq is consumed TWICE (minhash pair generation + the anti-join
    # below) and carries the quality+window-dedup lineage — persist the
    # materialized survivors once (MEMORY_AND_DISK, tracked: released by
    # caching.release_caches() after the consuming action)
    uniq = persist_tracked(uniq)
    near = D.minhash_dedup_pairs(uniq, "doc_id", "text", threshold=0.8)
    drop_ids = near.select(F.col("id_b").alias("doc_id")).dropDuplicates(["doc_id"])
    # no broadcast hint: the near-dup id set grows with the corpus — AQE
    # converts to broadcast at runtime iff the actual shuffle size is small
    kept = uniq.join(drop_ids, "doc_id", "left_anti")

    return kept.select(
        "doc_id",
        "lang",
        TA.token_count_ws(F.col("text")).cast("bigint").alias("n_tokens"),
        "quality",
    ).orderBy("doc_id")


_CUR_Q = O.sql_quality("text")["quality"]
_CUR_SH = O.sql_shingles("text", 3)
_CUR_SIG = O.sql_minhash_signature("sh", 16)
SQL_CURATION = f"""
WITH gated AS (
  SELECT doc_id, text, lang, {_CUR_Q} AS quality
  FROM documents WHERE {_CUR_Q} >= 0.5),
uniq AS (
  SELECT doc_id, text, lang, quality FROM (
    SELECT *, row_number() OVER (PARTITION BY {O.sql_hash64('text')}
                                 ORDER BY doc_id) AS rn
    FROM gated) WHERE rn = 1),
sh AS (SELECT doc_id, {_CUR_SH} AS sh FROM uniq),
sig AS (SELECT doc_id, sh, {_CUR_SIG} AS sig FROM sh WHERE len(sh) > 0),
banded AS (
  SELECT doc_id, b AS band,
         md5(array_to_string(list_transform(sig[b*4+1:b*4+4], x -> x::VARCHAR), ',')) AS bucket
  FROM sig, unnest([0,1,2,3]) AS u(b)),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
near AS (
  SELECT DISTINCT cand.id_b AS doc_id
  FROM cand JOIN sh a ON cand.id_a = a.doc_id JOIN sh b ON cand.id_b = b.doc_id
  WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
              len(list_distinct(a.sh || b.sh)), 6) >= 0.8)
SELECT u.doc_id, u.lang,
       CAST(len({O.sql_tokenize_ws('u.text')}) AS BIGINT) AS n_tokens,
       u.quality
FROM uniq u ANTI JOIN near n ON u.doc_id = n.doc_id
ORDER BY u.doc_id
"""


# ---------------------------------------------------------------------------
# extension: curation-gate text analytics (repetition, PII, contamination,
# sampling) — the quality/safety operators a 100 TB training-data pipeline
# runs between ingestion and dedup
# ---------------------------------------------------------------------------

def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: dup-token fraction (narrow) +
    top-bigram coverage (explode → partial-agg'd groupBy — shuffle-based so
    a 1 GB document cannot blow up a per-doc HOF)."""
    docs = _t(spark, sf_dir, "documents")
    return TA.repetition_signals(docs, "doc_id", "text").orderBy("doc_id")


SQL_REPETITION = f"""
WITH toks AS (SELECT doc_id, {O.sql_tokenize_ws('lower(text)')} AS t FROM documents),
base AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
    {O.sql_r4('1.0 - len(list_distinct(t))::DOUBLE / greatest(len(t), 1)')} AS dup_token_frac
  FROM toks),
big AS (SELECT doc_id, unnest({O.sql_ngrams('t', 2)}) AS bg FROM toks),
top AS (SELECT doc_id, max(cnt) AS top_cnt
        FROM (SELECT doc_id, bg, count(*) AS cnt FROM big GROUP BY doc_id, bg)
        GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens, b.dup_token_frac,
  {O.sql_r4('coalesce(top_cnt, 0) * 2.0 / greatest(b.n_tokens, 1)')} AS top_bigram_frac
FROM base b LEFT JOIN top USING (doc_id)
ORDER BY doc_id
"""


#: deterministic PII-bearing text (documents carry none): one email, one
#: phone, one URL appended per doc — identical synthesis on both engines
def _pii_text():
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.col("text"),
        F.lit(" contact u"), did,
        F.lit("@ex-"), F.col("source"), F.lit(".org or 010-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" via https://ex.org/d/"), did, F.lit(" ok"),
    )


_SQL_PII_TEXT = (
    "(text || ' contact u' || doc_id || '@ex-' || source || '.org or 010-555-'"
    " || lpad((doc_id % 10000)::VARCHAR, 4, '0')"
    " || ' via https://ex.org/d/' || doc_id || ' ok')"
)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    p = TA.scrub_pii(_pii_text())
    return docs.select(
        "doc_id",
        p["n_emails"].alias("n_emails"),
        p["n_phones"].alias("n_phones"),
        p["n_urls"].alias("n_urls"),
        p["scrubbed"].alias("scrubbed"),
    ).orderBy("doc_id")


_PII = O.sql_scrub_pii(_SQL_PII_TEXT)
SQL_PII_SCRUB = (
    "SELECT doc_id, "
    + ", ".join(f"{_PII[c]} AS {c}" for c in ["n_emails", "n_phones", "n_urls", "scrubbed"])
    + " FROM documents ORDER BY doc_id"
)


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: share of each doc's 3-gram shingles
    found in the eval set (docs with doc_id % 97 == 0 stand in for a
    benchmark suite; includes themselves at contam_frac = 1.0 as the
    positive control)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.explode(D.shingles(F.col("text"), 3)).alias("shingle")
    )
    return TA.ngram_contamination(docs, bench, "doc_id", "text", n=3).orderBy("doc_id")


SQL_CONTAMINATION = f"""
WITH sh AS (SELECT doc_id, {O.sql_shingles('text', 3)} AS sh FROM documents),
bench AS (SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE doc_id % 97 = 0),
hits AS (
  SELECT doc_id, count(*) AS n_cont
  FROM (SELECT doc_id, unnest(sh) AS shingle FROM sh) d
  JOIN bench USING (shingle)
  GROUP BY doc_id)
SELECT s.doc_id,
  CAST(len(s.sh) AS BIGINT) AS n_shingles,
  CAST(coalesce(n_cont, 0) AS BIGINT) AS n_contaminated,
  {O.sql_r4('coalesce(n_cont, 0)::DOUBLE / greatest(len(s.sh), 1)')} AS contam_frac
FROM sh s LEFT JOIN hits USING (doc_id)
ORDER BY doc_id
"""


#: per-language keep rates (percent): downsample the majority language,
#: keep scarce ones — the standard corpus-mixing move
_SAMPLE_RATES = {"en": 10, "zh": 80}
_SAMPLE_DEFAULT = 40


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return TA.stratified_sample(
        docs.select("doc_id", "lang"), "lang", "doc_id",
        _SAMPLE_RATES, _SAMPLE_DEFAULT,
    ).orderBy("doc_id")


_SAMPLE_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{s}' THEN {p}" for s, p in sorted(_SAMPLE_RATES.items()))
    + f" ELSE {_SAMPLE_DEFAULT} END"
)
SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang FROM documents
WHERE {O.sql_hash64("(lang || '|' || doc_id)")} % 100 < {_SAMPLE_CASE}
ORDER BY doc_id
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-aware keywords: per-doc top-3 TF-IDF terms (keywords.py);
    N comes from a broadcast 1-row aggregate, never a driver collect."""
    docs = _t(spark, sf_dir, "documents")
    return K.tfidf_top_terms(docs, "doc_id", "text", k=3).orderBy("doc_id", "rank")


SQL_TFIDF = f"""
WITH toks AS (SELECT doc_id, unnest({O.sql_tokenize_ws('lower(text)')}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS cnt FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(cnt) AS dl FROM tf GROUP BY 1),
dfreq AS (SELECT term, count(*) AS dfc FROM tf GROUP BY 1),
nd AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
scored AS (
  SELECT doc_id, term,
    floor((cnt::DOUBLE / dl) * (ln((nd + 1.0) / (dfc + 1.0)) + 1.0)
          * 1000000.0 + 0.5) / 1000000.0 AS tfidf
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN nd),
ranked AS (
  SELECT doc_id, term, tfidf,
    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored)
SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank
"""


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level dedup: MinHash near-dup pairs → connected components
    (iterative min-label propagation, operators/dedup.py) → every doc keyed
    to its duplicate-cluster id (= min doc id in the component; singletons
    are their own cluster). ``is_rep`` marks the canonical survivor —
    pair-level dedup would under-delete transitive A~B~C clusters."""
    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.8)
    comps = D.connected_components(pairs, "id_a", "id_b")
    return (
        docs.select("doc_id")
        .join(comps, docs.doc_id == comps.node, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("comp"), F.col("doc_id")).cast("bigint").alias("cluster_id"),
        )
        .withColumn(
            "is_rep",
            F.when(F.col("cluster_id") == F.col("doc_id"), 1).otherwise(0).cast("int"),
        )
        .orderBy("doc_id")
    )


SQL_DUP_CLUSTERS = f"""
WITH RECURSIVE sh AS (SELECT doc_id, {_SH} AS sh FROM documents),
sig AS (SELECT doc_id, sh, {_SIG} AS sig FROM sh WHERE len(sh) > 0),
banded AS (
  SELECT doc_id, b AS band,
         md5(array_to_string(list_transform(sig[b*4+1:b*4+4], x -> x::VARCHAR), ',')) AS bucket
  FROM sig, unnest([0,1,2,3]) AS u(b)),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
pairs AS (
  SELECT id_a, id_b
  FROM cand JOIN sh a ON cand.id_a = a.doc_id JOIN sh b ON cand.id_b = b.doc_id
  WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
              len(list_distinct(a.sh || b.sh)), 6) >= 0.8),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach AS (SELECT a, b FROM edges
          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
comp AS (SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a)
SELECT d.doc_id,
  CAST(coalesce(c.comp, d.doc_id) AS BIGINT) AS cluster_id,
  CAST(CASE WHEN coalesce(c.comp, d.doc_id) = d.doc_id THEN 1 ELSE 0 END AS INT) AS is_rep
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
ORDER BY doc_id
"""


def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog cardinality per event_type next to the
    exact count (operators/sketches.py) — the one-narrow-shuffle sketch
    that replaces exact COUNT(DISTINCT) at 100 TB; md5-derived registers
    make the estimate reproducible in the DuckDB oracle."""
    from ingestion_scripts_spark.operators.sketches import hll_count_distinct

    ev = _t(spark, sf_dir, "events")
    hll = hll_count_distinct(ev, ["event_type"], "user_id")
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    return (
        exact.join(hll, "event_type")
        .select("event_type", "n_exact", "n_hll")
        .orderBy("event_type")
    )


def _sql_hll() -> str:
    from ingestion_scripts_spark.operators.sketches import sql_hll_count_distinct

    inner = sql_hll_count_distinct("events", "event_type", "user_id::VARCHAR")
    return f"""
WITH hll AS ({inner}),
exact AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
          FROM events GROUP BY 1)
SELECT e.event_type, e.n_exact, h.n_hll
FROM exact e JOIN hll h USING (event_type)
ORDER BY event_type
"""


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distributed k-means over the embedding corpus
    (operators/clustering.py) — the clustering stage of cluster-balanced
    curation. Per iteration: literal-centroid assignment (narrow map, no
    join) + a k-row groupBy re-center (map-side partial agg), the MLlib
    loop shape restated on the DataFrame API. The oracle re-runs the whole
    algorithm from scratch in SQL — an independent differential test of
    init, assignment, and re-centering."""
    from ingestion_scripts_spark.operators.clustering import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    _, assigned = kmeans_fit(emb, "embedding", "vec_id", k=8, iters=3)
    return assigned.select(
        F.col("__id").alias("vec_id"),
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        "d2",
    ).orderBy("vec_id")


def _sql_kmeans_base() -> str:
    from ingestion_scripts_spark.operators.clustering import sql_kmeans

    return sql_kmeans("embeddings", "embedding", "vec_id", k=8, iters=3, dim=64)


def _sql_kmeans_clusters() -> str:
    return (
        f"SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster_id, d2 "
        f"FROM ({_sql_kmeans_base()}) base ORDER BY vec_id"
    )


def q_kmeans_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling: the 3 most-central vectors per k-means
    cluster (ties → lowest id) — the 'diversify' step after dedup in a
    curation pipeline: per-cluster quotas instead of global top-N, so no
    single mode of the corpus dominates the training mix."""
    from ingestion_scripts_spark.operators.clustering import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    _, assigned = kmeans_fit(emb, "embedding", "vec_id", k=8, iters=3)
    w = Window.partitionBy("cluster_id").orderBy(F.col("d2").asc(), F.col("__id").asc())
    return (
        assigned.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
            "rnk",
            F.col("__id").alias("vec_id"),
            "d2",
        )
        .orderBy("cluster_id", "rnk")
    )


def _sql_kmeans_sample() -> str:
    return f"""
WITH ranked AS (
  SELECT CAST(cluster_id AS BIGINT) AS cluster_id, vec_id, d2,
         CAST(row_number() OVER (PARTITION BY cluster_id
                                 ORDER BY d2 ASC, vec_id ASC) AS BIGINT) AS rnk
  FROM ({_sql_kmeans_base()}) base)
SELECT cluster_id, rnk, vec_id, d2 FROM ranked WHERE rnk <= 3
ORDER BY cluster_id, rnk
"""


_DSIR_B = 1024  #: hashed-feature buckets (Xie et al., DSIR: n-gram features
#: hashed to a fixed bucket space so the weight table is O(B), not O(vocab))


def q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights: per-document log-likelihood ratio of
    a hashed-unigram bag model between a target corpus (lang = 'en') and
    the raw corpus. Plan: tokenize (narrow) → bucket counts (two tiny
    keyed shuffles with map-side partials) → B-row weight table broadcast
    back → per-doc sum (one shuffle keyed by doc_id). The weight table is
    O(B) regardless of corpus size — the property that makes hashed DSIR
    run at 100 TB where an exact-vocab LM would not."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(X.tokenize_ws(F.lower(F.col("text")))).alias("t"),
    ).withColumn("b", X.hash64(F.col("t")) % _DSIR_B)
    raw = toks.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        toks.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    totals = toks.agg(
        F.count(F.lit(1)).alias("nr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("nt"),
    )
    w = (
        raw.join(tgt, "b", "left")
        .na.fill({"ct": 0})
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            # per-bucket log weight snapped to exact int micro-units so the
            # per-doc SUM is order-independent (the nation_profit float-sum
            # class — a token count large enough would eventually straddle
            # a 6-dp rounding boundary between the engines' sum orders)
            F.floor(
                (
                    F.log((F.col("ct") + 1) / (F.col("nt") + _DSIR_B))
                    - F.log((F.col("cr") + 1) / (F.col("nr") + _DSIR_B))
                )
                * F.lit(1_000_000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lw_u"),
        )
    )
    return (
        toks.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            (F.sum("lw_u").cast("double") / F.lit(1_000_000.0)).alias("weight"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


SQL_IMPORTANCE = f"""
WITH tb AS (
  SELECT doc_id, lang, {O.sql_hash64('t')} % {_DSIR_B} AS b
  FROM (SELECT doc_id, lang, unnest({O.sql_tokenize_ws('lower(text)')}) AS t
        FROM documents)),
raw AS (SELECT b, count(*) AS cr FROM tb GROUP BY b),
tgt AS (SELECT b, count(*) AS ct FROM tb WHERE lang = 'en' GROUP BY b),
tot AS (SELECT count(*) AS nr,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS nt FROM tb),
w AS (
  SELECT b, CAST(floor((ln((coalesce(ct, 0) + 1) / (nt + {_DSIR_B}))
            - ln((cr + 1) / (nr + {_DSIR_B}))) * 1000000.0 + 0.5) AS BIGINT)
            AS lw_u
  FROM raw LEFT JOIN tgt USING (b), tot)
SELECT doc_id, CAST(sum(lw_u) AS DOUBLE) / 1000000.0 AS weight,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM tb JOIN w USING (b) GROUP BY doc_id ORDER BY doc_id
"""


def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over adjacent token bigrams (min count
    5, top 100) — the collocation/term-association statistic used for
    phrase mining over a corpus. All counting is keyed groupBy with
    map-side partials; the ln ratio runs over the already-aggregated
    (and min-count-filtered) bigram table, so the final rank window sees
    the provably small side."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(X.tokenize_ws(F.lower(F.col("text"))).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        toks.select(F.explode(X.ngrams(F.col("t"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= 5)
    )
    totals = toks.select(
        F.sum(F.size("t")).alias("nu"),
        F.sum(F.greatest(F.size("t") - 1, F.lit(0))).alias("nb"),
    )
    scored = (
        bi.withColumn("a", F.split(F.col("bg"), " ").getItem(0))
        .withColumn("b2", F.split(F.col("bg"), " ").getItem(1))
        .join(F.broadcast(uni.select(F.col("w").alias("a"), F.col("c").alias("ca"))), "a")
        .join(F.broadcast(uni.select(F.col("w").alias("b2"), F.col("c").alias("cb"))), "b2")
        .crossJoin(F.broadcast(totals))
        .select(
            "bg",
            F.col("cab"),
            F.round(
                F.log(
                    (F.col("cab") / F.col("nb"))
                    / ((F.col("ca") / F.col("nu")) * (F.col("cb") / F.col("nu")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    # same top-k-then-rank staging as vocab_topn: the global rank window
    # only ever sees the 100 TakeOrdered survivors
    top = scored.orderBy(F.col("pmi").desc(), F.col("bg").asc()).limit(100)
    w = Window.orderBy(F.col("pmi").desc(), F.col("bg").asc())
    return top.withColumn("rnk", F.row_number().over(w).cast("bigint")).orderBy(
        "rnk"
    )


_SQL_TOKS_LOWER = O.sql_tokenize_ws("lower(text)")
SQL_PMI = f"""
WITH toks AS (SELECT {_SQL_TOKS_LOWER} AS t FROM documents),
uni AS (SELECT w, count(*) AS c
        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
bi AS (SELECT bg, count(*) AS cab
       FROM (SELECT unnest({O.sql_ngrams('t', 2)}) AS bg FROM toks)
       GROUP BY bg HAVING count(*) >= 5),
tot AS (SELECT sum(len(t)) AS nu,
               sum(greatest(len(t) - 1, 0)) AS nb FROM toks),
scored AS (
  SELECT bg, cab,
         round(ln((cab / nb) / ((ua.c / nu) * (ub.c / nu))), 6) AS pmi
  FROM bi
  JOIN uni ua ON ua.w = string_split(bg, ' ')[1]
  JOIN uni ub ON ub.w = string_split(bg, ' ')[2]
  CROSS JOIN tot),
ranked AS (
  SELECT bg, cab, pmi,
         CAST(row_number() OVER (ORDER BY pmi DESC, bg ASC) AS BIGINT) AS rnk
  FROM scored)
SELECT bg, cab, pmi, rnk FROM ranked WHERE rnk <= 100 ORDER BY rnk
"""


def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped multi-way join: revenue of PROMO parts by supplier
    nation × order year. Shape at scale: part (filtered) / supplier /
    nation broadcast onto the lineitem scan — the filter on part prunes
    BEFORE the join so the probe side never widens — then ONE big-big
    shuffle join (lineitem ⋈ orders on orderkey), then a keyed agg with
    map-side partials. Catalyst reorders the dimension joins; AQE picks
    broadcast automatically once the part filter collapses the build side."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            # exact decimal accumulation: the per-row product is a <=4-dp
            # decimal value, so summing DECIMAL(18,4) is order-independent
            # and engine-identical — a double sum differs in the last ulp
            # between partial-agg orders and can cross the 2-dp rounding
            # boundary once there are enough addends (seen at sf0.1)
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("profit"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("nation", "o_year")
    )


SQL_NATION_PROFIT = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)::DOUBLE AS profit,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_stream_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 (periodic state refresh) as a REAL streaming job: a stream-static
    join — the static customer dimension is re-read per micro-batch (the
    Structured Streaming contract), which IS the reference's periodic
    lookup-table refresh. The join itself is stateless (append mode);
    per-segment totals aggregate the sink table batch-side."""
    import tempfile
    import uuid

    from ingestion_scripts_spark.sources.readers import load_table, read_events_stream

    cust = load_table(spark, sf_dir, "customer")
    stream = read_events_stream(spark, sf_dir)
    enriched = stream.join(
        F.broadcast(cust), stream.user_id == cust.c_custkey
    ).select("event_id", "c_mktsegment", "value")
    name = "stream_enriched_" + uuid.uuid4().hex[:8]
    # state partitions sized to the stream's input bytes, not the core
    # count (optimization r15, guide §2.2 — see stream_state_partitions)
    from ingestion_scripts_spark.streaming.streams import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, f"{sf_dir}/events.parquet")
    ):
        q = (
            enriched.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", _scratch(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


SQL_STREAM_ENRICHED = """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
       round(sum(CAST(value AS DECIMAL(18,4))), 2)::DOUBLE AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1 ORDER BY 1
"""


def q_stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA-DROP semantics (§2.8), made oracle-checkable:
    the stream is split into three deterministic micro-batches — even
    event_ids, an EMPTY batch, then odd event_ids. Spark ≥3.4 filters late
    rows with the watermark from two batches back (SPARK-40925's
    late-events/eviction split), so the empty middle batch is what arms
    the filter: during the odd batch the late-events watermark stands at
    max(even ts) - 2h and every odd row whose 1-hour window closed under
    it MUST be dropped; append mode then emits only windows closed under
    the final watermark. The DuckDB oracle replays that watermark algebra
    in SQL — the one streaming behavior (dropping, not just windowing)
    that batch twins can't cover."""
    import glob
    import os
    import tempfile
    import time
    import uuid

    from ingestion_scripts_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    src = _scratch(prefix="late_src_")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b0")
    ev.filter(F.lit(False)).coalesce(1).write.mode("overwrite").parquet(
        f"{src}/b1"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b2")
    # the file source orders batches by modification time: pin it
    now = time.time()
    for i, d in enumerate(("b0", "b1", "b2")):
        for p in glob.glob(f"{src}/{d}/*.parquet"):
            os.utime(p, (now - 200 + 50 * i, now - 200 + 50 * i))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = "stream_late_" + uuid.uuid4().hex[:8]
    from ingestion_scripts_spark.streaming.streams import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, src)
    ):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", _scratch(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(name)
        .select(_fmt_ts(F.col("w.start")).alias("window_start"), "n")
        .orderBy("window_start")
    )


SQL_STREAM_LATE_DROP = f"""
WITH wm1 AS (SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 2 HOUR AS w
             FROM events WHERE event_id % 2 = 0),
kept AS (
  SELECT ts FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT ts FROM events, wm1
  WHERE event_id % 2 = 1 AND date_trunc('hour', ts) + INTERVAL 1 HOUR > wm1.w),
wm2 AS (SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 2 HOUR AS w
        FROM events),
agg AS (SELECT date_trunc('hour', ts) AS ws, count(*) AS n FROM kept GROUP BY 1)
SELECT {SQL_TS.format('ws')} AS window_start, n
FROM agg, wm2 WHERE ws + INTERVAL 1 HOUR <= wm2.w
ORDER BY window_start
"""


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-ball near-dup pairs via banded candidates (Manku et
    al., WWW'07) — the bitwise complement to the set-based MinHash-LSH
    path; candidates equi-join on bit-bands, never all-pairs."""
    docs = _t(spark, sf_dir, "documents")
    return D.simhash_near_dup_pairs(
        docs, "doc_id", "text", bits=60, bands=4, max_hamming=3
    ).orderBy("id_a", "id_b")


def _sql_simhash_pairs() -> str:
    inner = O.sql_simhash_near_dup_pairs(
        "documents", "doc_id", "text", bits=60, bands=4, max_hamming=3
    )
    return f"SELECT * FROM ({inner}) p ORDER BY id_a, id_b"


_PACK_SEQ_LEN = 2048


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: documents concatenate in deterministic
    (source, doc_id) order and split into fixed {_PACK_SEQ_LEN}-token
    sequences; each doc reports the sequence it starts in and its offset.
    The prefix-sum window partitions by source, so packing parallelizes
    across shards — the inherently sequential part is per-shard, which is
    how a 100 TB packing job is actually laid out (one writer per shard,
    never a global order)."""
    docs = _t(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = TA.token_count_ws(F.col("text")).cast("bigint")
    return (
        docs.select("doc_id", "source", n_tok.alias("n_tok"))
        .withColumn(
            "cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("bigint")
        )
        .select(
            "doc_id",
            "source",
            "n_tok",
            F.expr(f"cum_before div {_PACK_SEQ_LEN}").alias("seq_id"),
            (F.col("cum_before") % _PACK_SEQ_LEN).alias("offset"),
        )
        .orderBy("source", "doc_id")
    )


SQL_SEQUENCE_PACKING = f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len({O.sql_tokenize_ws('text')}) AS BIGINT) AS n_tok
  FROM documents),
cum AS (
  SELECT doc_id, source, n_tok,
         CAST(coalesce(sum(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM toks)
SELECT doc_id, source, n_tok,
       cum_before // {_PACK_SEQ_LEN} AS seq_id,
       cum_before % {_PACK_SEQ_LEN} AS offset
FROM cum ORDER BY source, doc_id
"""


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM inner join with an event-time range condition (§2.8's
    hardest join shape): purchases ⋈ clicks on user_id where the click
    falls in the hour before the purchase. Both sides carry watermarks and
    the range condition is what lets Spark bound each side's buffered
    state to (range + delay) — without it, stream-stream state grows
    unboundedly. Run under availableNow, the result must equal the batch
    range join exactly, which is the DuckDB oracle."""
    import tempfile
    import uuid

    from ingestion_scripts_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    src = _scratch(prefix="ssj_src_")
    ev.filter(F.col("event_type") == "purchase").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/purchases")
    ev.filter(F.col("event_type") == "click").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/clicks")
    schema = ev.schema

    def _stream(sub: str, prefix: str) -> DataFrame:
        s = spark.readStream.schema(schema).parquet(f"{src}/{sub}")
        return s.select(
            *[F.col(c).alias(f"{prefix}_{c}") for c in s.columns]
        ).withWatermark(f"{prefix}_ts", "2 hours")

    p, c = _stream("purchases", "p"), _stream("clicks", "c")
    joined = p.join(
        c,
        (F.col("p_user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select(
        F.col("p_event_id").alias("purchase_id"),
        F.col("c_event_id").alias("click_id"),
    )
    name = "ssj_" + uuid.uuid4().hex[:8]
    # state partitions sized to the stream's input bytes, not the core
    # count: a stream-stream join commits 4 state stores per partition per
    # trigger, so over-sharding KB-sized state cost seconds of pure
    # delta-file fsync (optimization r15, guide §2.2 — measured 10.4 s →
    # 2.3 s; see stream_state_partitions)
    from ingestion_scripts_spark.streaming.streams import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, src)
    ):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", _scratch(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).orderBy("purchase_id", "click_id")


SQL_STREAM_STREAM_JOIN = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id
FROM events p JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
ORDER BY purchase_id, click_id
"""


def q_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join (§2.8): like stream_stream_join but
    unmatched purchases must ALSO emit (click_id = -1) — which only
    happens when the watermark EVICTS their buffered state, never at query
    end. The replay therefore appends a far-future sentinel batch on each
    side (advancing the watermark past every real row) and then an EMPTY
    batch, because eviction runs with the PREVIOUS batch's watermark
    (same lagged-watermark algebra stream_late_drop encodes). The oracle
    is the plain batch LEFT JOIN — equality proves the null-side emission
    is exactly the unmatched set, with no duplicates from replay.

    Latency model (why this is the slowest bench entry at ~10-13 s): wall
    time here is micro-batch COUNT x per-trigger overhead — six file
    triggers (3 per side with maxFilesPerTrigger=1), each paying stream
    planning, state-store commit, and checkpoint-directory fsync, plus
    the sentinel/empty batches that exist only to advance the watermark
    and flush evicted state. Data-plane work at this SF is milliseconds;
    the number scales with trigger count, not rows, and stays flat as the
    corpus grows (a 100 TB run amortizes the same fixed trigger cost over
    arbitrarily large batches)."""
    import glob
    import os
    import tempfile
    import time
    import uuid

    from ingestion_scripts_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    src = _scratch(prefix="soj_src_")
    sentinel = ev.limit(1).select(
        F.lit(-1).cast("bigint").alias("event_id"),
        (F.lit(max_ts) + F.expr("INTERVAL 10 HOURS")).alias("ts"),
        F.lit(-1).cast("bigint").alias("user_id"),
        F.col("event_type"),
    )
    for side, flt in (("purchases", "purchase"), ("clicks", "click")):
        base = ev.filter(F.col("event_type") == flt)
        base.coalesce(1).write.mode("overwrite").parquet(f"{src}/{side}/b0")
        sentinel.withColumn("event_type", F.lit(flt)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/{side}/b1")
        base.filter(F.lit(False)).coalesce(1).write.mode("overwrite").parquet(
            f"{src}/{side}/b2"
        )
        now = time.time()
        for i, d in enumerate(("b0", "b1", "b2")):
            for p in glob.glob(f"{src}/{side}/{d}/*.parquet"):
                os.utime(p, (now - 200 + 50 * i, now - 200 + 50 * i))

    schema = ev.schema

    def _stream(sub: str, prefix: str) -> DataFrame:
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(f"{src}/{sub}")
        )
        return s.select(
            *[F.col(c).alias(f"{prefix}_{c}") for c in s.columns]
        ).withWatermark(f"{prefix}_ts", "2 hours")

    p, c = _stream("purchases", "p"), _stream("clicks", "c")
    joined = p.join(
        c,
        (F.col("p_user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    ).select(
        F.col("p_event_id").alias("purchase_id"),
        F.coalesce(F.col("c_event_id"), F.lit(-1)).alias("click_id"),
        "p_user_id",
    )
    name = "soj_" + uuid.uuid4().hex[:8]
    # state partitions sized to the stream's input bytes (optimization
    # r15, guide §2.2): 4 join state stores x 32 partitions meant ~350 s
    # of summed per-trigger commitTimeMs on near-empty triggers; measured
    # 16.1 s → 4.7 s with byte-identical results
    from ingestion_scripts_spark.streaming.streams import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, src)
    ):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", _scratch(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(name)
        .filter(F.col("p_user_id") >= 0)  # drop the sentinel's own row
        .select("purchase_id", "click_id")
        .orderBy("purchase_id", "click_id")
    )


SQL_STREAM_OUTER_JOIN = """
SELECT p.event_id AS purchase_id, coalesce(c.event_id, -1) AS click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
ORDER BY purchase_id, click_id
"""


def q_scd_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD merge (operators/sink.py::scd2_apply): apply an update
    batch (acctbal bumped for custkey % 7 == 0) to a versioned customer
    dimension — changed keys get their open version closed at the batch
    date and a version-2 row appended; unchanged keys pass through. The
    versioned-history generalization of the reference's keyed Mongo
    upsert (K3)."""
    from ingestion_scripts_spark.operators.sink import scd2_apply

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    cur = (
        cust.withColumn("version", F.lit(1).cast("bigint"))
        .withColumn("valid_from", F.lit("2024-01-01"))
        .withColumn("valid_to", F.lit(None).cast("string"))
    )
    upd = cust.withColumn(
        "c_acctbal",
        F.col("c_acctbal")
        + F.when(F.col("c_custkey") % 7 == 0, F.lit(100.0)).otherwise(F.lit(0.0)),
    )
    out = scd2_apply(
        cur, upd, "c_custkey", ["c_acctbal", "c_mktsegment"], "2024-06-01"
    )
    return out.select(
        "c_custkey",
        "c_acctbal",
        "c_mktsegment",
        F.col("version").cast("bigint").alias("version"),
        "valid_from",
        "valid_to",
    ).orderBy("c_custkey", "version")


SQL_SCD_UPSERT = """
WITH cur AS (
  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
upd AS (
  SELECT c_custkey,
         c_acctbal + CASE WHEN c_custkey % 7 = 0 THEN 100.0 ELSE 0.0 END
           AS c_acctbal,
         c_mktsegment
  FROM customer),
changed AS (
  SELECT u.c_custkey FROM upd u JOIN cur c USING (c_custkey)
  WHERE u.c_acctbal IS DISTINCT FROM c.c_acctbal
     OR u.c_mktsegment IS DISTINCT FROM c.c_mktsegment)
SELECT c_custkey, c_acctbal, c_mktsegment,
       CAST(1 AS BIGINT) AS version, '2024-01-01' AS valid_from,
       CASE WHEN c_custkey IN (SELECT c_custkey FROM changed)
            THEN '2024-06-01' END AS valid_to
FROM cur
UNION ALL
SELECT c_custkey, c_acctbal, c_mktsegment,
       CAST(2 AS BIGINT) AS version, '2024-06-01' AS valid_from,
       NULL AS valid_to
FROM upd WHERE c_custkey IN (SELECT c_custkey FROM changed)
ORDER BY c_custkey, version
"""


_DUPSPAN_N = 13  #: span width in tokens (Lee et al., "Deduplicating
#: Training Data Makes Language Models Better": 50 BPE tokens ≈ 13 words
#: scaled to this corpus's short docs)


def q_dup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-granularity duplication: per document, the fraction of its
    token {_DUPSPAN_N}-gram occurrences that also appear in ANOTHER
    document — the signal behind substring-level dedup (finer than
    whole-doc MinHash, coarser than suffix arrays, and the practical
    middle ground at corpus scale). Shape: explode spans (narrow) →
    span-key groupBy for cross-doc frequency (map-side partials) → join
    back on the 64-bit span hash (never the raw string — the shuffle
    carries 8 bytes per span) → per-doc ratio."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", X.tokenize_ws(F.lower(F.col("text"))).alias("t")
    )
    spans = toks.select(
        "doc_id",
        F.explode(X.ngrams(F.col("t"), _DUPSPAN_N)).alias("g"),
    ).select("doc_id", X.hash64(F.col("g")).alias("h"))
    # ONE pass over the expensive narrow stage (explode + md5 per span):
    # aggregate to (h, doc_id, cnt) first — a join back to raw spans would
    # recompute the explode on both shuffle sides (partial-agg plans defeat
    # exchange reuse) — then cross-doc frequency is a window over the
    # already-compact aggregate and the final ratio re-keys by doc
    per = spans.groupBy("h", "doc_id").agg(F.count(F.lit(1)).alias("cnt"))
    nd = F.count(F.lit(1)).over(Window.partitionBy("h"))
    return (
        per.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_spans"),
            F.round(
                F.sum(F.when(F.col("nd") > 1, F.col("cnt")).otherwise(0))
                / F.sum("cnt"),
                6,
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


SQL_DUP_SPAN = f"""
WITH spans AS (
  SELECT doc_id, {O.sql_hash64('g')} AS h
  FROM (SELECT doc_id,
               unnest({O.sql_ngrams(O.sql_tokenize_ws('lower(text)'), _DUPSPAN_N)})
                 AS g
        FROM documents)),
freq AS (SELECT h, count(DISTINCT doc_id) AS nd FROM spans GROUP BY h)
SELECT doc_id, count(*) AS n_spans,
       round(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) / count(*), 6) AS dup_frac
FROM spans JOIN freq USING (h)
GROUP BY doc_id ORDER BY doc_id
"""


def q_jsonl_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 end-to-end on a REAL JSON-lines source: the documents table is
    round-tripped through JSONL files and re-read with an explicit schema
    (never inference — at 100 TB schema inference is a full extra scan),
    then aggregated per (source, lang). The oracle aggregates the parquet
    directly, so the JSON encode/decode path must be lossless."""
    import tempfile

    docs = _t(spark, sf_dir, "documents")
    tmp = _scratch(prefix="jsonl_src_")
    docs.select("doc_id", "text", "lang", "source", "n_chars").coalesce(
        4
    ).write.mode("overwrite").json(tmp)
    schema = (
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    back = spark.read.schema(schema).json(tmp)
    return (
        back.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.length("text")).alias("total_text_len"),
        )
        .orderBy("source", "lang")
    )


SQL_JSONL_SOURCE = """
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(length(text)) AS BIGINT) AS total_text_len
FROM documents GROUP BY 1, 2 ORDER BY source, lang
"""


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly scores: each (event_type, hour) count
    z-scored against its own trailing 24 full hours — the monitoring
    workload over ingest streams. Two keyed shuffles (hourly agg, then a
    per-type ordered window over the ALREADY-AGGREGATED hourly table —
    thousands of rows per type regardless of raw volume)."""
    ev = _t(spark, sf_dir, "events")
    hc = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    scored = hc.select(
        "h",
        "event_type",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
        F.count("n").over(w).alias("cnt"),
    ).filter((F.col("cnt") == 24) & (F.col("sd") > 0))
    return scored.select(
        _fmt_ts(F.col("h")).alias("hour"),
        "event_type",
        "n",
        F.round((F.col("n") - F.col("mu")) / F.col("sd"), 4).alias("z"),
    ).orderBy("hour", "event_type")


SQL_ANOMALY = f"""
WITH hc AS (
  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
scored AS (
  SELECT h, event_type, n,
         avg(n) OVER w AS mu,
         stddev_samp(n) OVER w AS sd,
         count(n) OVER w AS cnt
  FROM hc
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
SELECT {SQL_TS.format('h')} AS hour, event_type, n,
       round((n - mu) / sd, 4) AS z
FROM scored WHERE cnt = 24 AND sd > 0
ORDER BY hour, event_type
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users bucketed by first-seen week, counted
    per (cohort, week offset) — the standard growth-analytics rollup.
    first-seen is a keyed min-agg (map-side partial), activity weeks a
    distinct projection; the join keys on user_id so cohort assignment
    broadcasts nothing and shuffles each fact row once."""
    ev = _t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    return (
        activity.join(first, "user_id")
        .groupBy("cohort", "wk")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            _fmt_ts(F.col("cohort")).alias("cohort_week"),
            F.expr("CAST(datediff(wk, cohort) div 7 AS BIGINT)").alias(
                "week_offset"
            ),
            "n_users",
        )
        .orderBy("cohort_week", "week_offset")
    )


SQL_RETENTION = f"""
WITH first AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
SELECT {SQL_TS.format('cohort')} AS cohort_week,
       date_diff('day', cohort, wk) // 7 AS week_offset,
       count(DISTINCT user_id) AS n_users
FROM activity JOIN first USING (user_id)
GROUP BY cohort, wk
ORDER BY cohort_week, week_offset
"""


_MIX_ALPHA = 0.5  #: sampling temperature (α<1 upsamples small sources —
#: the multilingual mixing rule from mBERT/XLM-R-style training)
_MIX_TARGET_FRAC = 0.5  #: corpus-level keep fraction


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source rebalancing: per-source keep rates follow
    share^α (α={_MIX_ALPHA} flattens the source distribution), scaled to a
    {_MIX_TARGET_FRAC} corpus-level budget, and membership is decided by a
    deterministic per-doc hash — reproducible sampling with NO RNG, the way
    a 100 TB mixing job must do it (any executor can recompute any doc's
    verdict independently; resumable, shardable). Shape: one tiny
    per-source agg joined back as a broadcast; the keep decision is a
    narrow map."""
    docs = _t(spark, sf_dir, "documents")
    shares = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    tot = shares.agg(
        F.sum("n_s").alias("n_tot"),
        F.sum(F.pow(F.col("n_s"), _MIX_ALPHA)).alias("w_tot"),
    )
    rates = (
        shares.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(_MIX_TARGET_FRAC)
                    * F.col("n_tot")
                    * F.pow(F.col("n_s"), _MIX_ALPHA)
                    / (F.col("w_tot") * F.col("n_s")),
                )
                * 1_000_000,
                0,
            )
            .cast("bigint")
            .alias("thresh"),
        )
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(
            X.hash64(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
            % 1_000_000
            < F.col("thresh")
        )
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


SQL_TEMPERATURE_MIX = f"""
WITH shares AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
tot AS (SELECT sum(n_s) AS n_tot, sum(pow(n_s, {_MIX_ALPHA})) AS w_tot
        FROM shares),
rates AS (
  SELECT source,
         CAST(round(least(1.0,
             {_MIX_TARGET_FRAC} * n_tot * pow(n_s, {_MIX_ALPHA})
             / (w_tot * n_s)) * 1000000, 0) AS BIGINT) AS thresh
  FROM shares, tot)
SELECT doc_id, source
FROM documents JOIN rates USING (source)
WHERE {O.sql_hash64("'mix:' || doc_id::VARCHAR")} % 1000000 < thresh
ORDER BY doc_id
"""


def q_curation_to_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE training-data path in one DataFrame program: quality
    gate → exact dedup → MinHash near-dup removal → temperature mix
    rebalancing → packed 2048-token sequences. Every stage is an operator
    verified in isolation; this query pins their composition — the actual
    deliverable of a curation engine (what you feed the trainer) — against
    one SQL program."""
    docs = _t(spark, sf_dir, "documents")
    q = TA.quality_score(F.col("text"))
    gated = docs.select(
        "doc_id", "text", "source", q["quality"].alias("quality")
    ).filter(F.col("quality") >= 0.5)

    keyed = gated.withColumn("__h", X.hash64(F.col("text")))
    w = Window.partitionBy("__h").orderBy("doc_id")
    # cache policy: `uniq` is consumed twice (MinHash candidate generation
    # AND the survivor anti-join) and `kept` twice (mix-share agg AND the
    # final join) — persist both so the gate/dedup stages run once instead
    # of once per downstream consumer. MEMORY_AND_DISK: the post-gate
    # corpus is a projection (id, text, source, quality), far smaller than
    # the input; spills degrade gracefully at 100 TB instead of OOMing.
    uniq = persist_tracked(
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__h")
    )
    near = D.minhash_dedup_pairs(uniq, "doc_id", "text", threshold=0.8)
    drop_ids = near.select(F.col("id_b").alias("doc_id")).dropDuplicates(["doc_id"])
    kept = persist_tracked(uniq.join(drop_ids, "doc_id", "left_anti"))

    shares = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    tot = shares.agg(
        F.sum("n_s").alias("n_tot"),
        F.sum(F.pow(F.col("n_s"), _MIX_ALPHA)).alias("w_tot"),
    )
    rates = shares.crossJoin(F.broadcast(tot)).select(
        "source",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(_MIX_TARGET_FRAC)
                * F.col("n_tot")
                * F.pow(F.col("n_s"), _MIX_ALPHA)
                / (F.col("w_tot") * F.col("n_s")),
            )
            * 1_000_000,
            0,
        )
        .cast("bigint")
        .alias("thresh"),
    )
    mixed = kept.join(F.broadcast(rates), "source").filter(
        X.hash64(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
        % 1_000_000
        < F.col("thresh")
    )

    wp = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = TA.token_count_ws(F.col("text")).cast("bigint")
    return (
        mixed.select("doc_id", "source", n_tok.alias("n_tok"))
        .withColumn(
            "cum_before", F.coalesce(F.sum("n_tok").over(wp), F.lit(0)).cast("bigint")
        )
        .select(
            "doc_id",
            "source",
            "n_tok",
            F.expr(f"cum_before div {_PACK_SEQ_LEN}").alias("seq_id"),
            (F.col("cum_before") % _PACK_SEQ_LEN).alias("offset"),
        )
        .orderBy("source", "doc_id")
    )


SQL_CURATION_SEQ = f"""
WITH gated AS (
  SELECT doc_id, text, source, {_CUR_Q} AS quality
  FROM documents WHERE {_CUR_Q} >= 0.5),
uniq AS (
  SELECT doc_id, text, source, quality FROM (
    SELECT *, row_number() OVER (PARTITION BY {O.sql_hash64('text')}
                                 ORDER BY doc_id) AS rn
    FROM gated) WHERE rn = 1),
sh AS (SELECT doc_id, {_CUR_SH} AS sh FROM uniq),
sig AS (SELECT doc_id, sh, {_CUR_SIG} AS sig FROM sh WHERE len(sh) > 0),
banded AS (
  SELECT doc_id, b AS band,
         md5(array_to_string(list_transform(sig[b*4+1:b*4+4], x -> x::VARCHAR), ',')) AS bucket
  FROM sig, unnest([0,1,2,3]) AS u(b)),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
near AS (
  SELECT DISTINCT cand.id_b AS doc_id
  FROM cand JOIN sh a ON cand.id_a = a.doc_id JOIN sh b ON cand.id_b = b.doc_id
  WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
              len(list_distinct(a.sh || b.sh)), 6) >= 0.8),
kept AS (
  SELECT u.doc_id, u.text, u.source
  FROM uniq u ANTI JOIN near n ON u.doc_id = n.doc_id),
shares AS (SELECT source, count(*) AS n_s FROM kept GROUP BY source),
tot AS (SELECT sum(n_s) AS n_tot, sum(pow(n_s, {_MIX_ALPHA})) AS w_tot
        FROM shares),
rates AS (
  SELECT source,
         CAST(round(least(1.0,
             {_MIX_TARGET_FRAC} * n_tot * pow(n_s, {_MIX_ALPHA})
             / (w_tot * n_s)) * 1000000, 0) AS BIGINT) AS thresh
  FROM shares, tot),
mixed AS (
  SELECT k.doc_id, k.source,
         CAST(len({O.sql_tokenize_ws('k.text')}) AS BIGINT) AS n_tok
  FROM kept k JOIN rates USING (source)
  WHERE {O.sql_hash64("'mix:' || k.doc_id::VARCHAR")} % 1000000 < thresh),
cum AS (
  SELECT doc_id, source, n_tok,
         CAST(coalesce(sum(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM mixed)
SELECT doc_id, source, n_tok,
       cum_before // {_PACK_SEQ_LEN} AS seq_id,
       cum_before % {_PACK_SEQ_LEN} AS offset
FROM cum ORDER BY source, doc_id
"""


def q_csv_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 on a CSV source: documents round-tripped through quoted CSV
    (free text with commas/quotes/newlines is exactly where naive CSV
    breaks) and re-read with an explicit schema + multiLine, then
    aggregated. The oracle reads the parquet directly — the encode/decode
    must be lossless through quoting."""
    import tempfile

    docs = _t(spark, sf_dir, "documents")
    tmp = _scratch(prefix="csv_src_")
    docs.select("doc_id", "text", "lang", "source", "n_chars").coalesce(
        4
    ).write.mode("overwrite").option("header", True).option("quoteAll", True).csv(
        tmp
    )
    schema = (
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    back = (
        spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", True)
        .csv(tmp)
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.length("text")).alias("total_text_len"),
        )
        .orderBy("lang")
    )


SQL_CSV_SOURCE = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(length(text)) AS BIGINT) AS total_text_len
FROM documents GROUP BY 1 ORDER BY lang
"""


def q_corrupt_record_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 at the SOURCE: a JSONL feed where every doc_id % 13 == 0 line is
    deliberately truncated mid-record; PERMISSIVE mode routes broken lines
    to ``_corrupt_record`` instead of failing the job — the reference's
    skip-on-error consumer loop restated as schema-level dead-lettering.
    Output: per-source good/corrupt counts. The oracle mirrors the
    corruption rule arithmetically (we constructed the corruption; what is
    under test is Spark's routing of it)."""
    import tempfile

    docs = _t(spark, sf_dir, "documents")
    tmp = _scratch(prefix="corrupt_src_")
    line = F.to_json(F.struct("doc_id", "text", "source"))
    corrupted = docs.select(
        F.when(
            F.col("doc_id") % 13 == 0, F.substring(line, 1, 20)
        )
        .otherwise(line)
        .alias("value")
    )
    corrupted.coalesce(2).write.mode("overwrite").text(tmp)
    back = (
        spark.read.schema(
            "doc_id bigint, text string, source string, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(tmp)
    )
    return (
        back.select(
            F.coalesce(
                "source",
                F.lit("__dead_letter__"),
            ).alias("route"),
            F.when(F.col("_corrupt_record").isNull(), 1).otherwise(0).alias("ok"),
        )
        .groupBy("route")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ok").cast("bigint").alias("n_good"),
        )
        .orderBy("route")
    )


SQL_CORRUPT_ROUTING = """
WITH routed AS (
  SELECT CASE WHEN doc_id % 13 = 0 THEN '__dead_letter__' ELSE source END
           AS route,
         CASE WHEN doc_id % 13 = 0 THEN 0 ELSE 1 END AS ok
  FROM documents)
SELECT route, count(*) AS n, CAST(sum(ok) AS BIGINT) AS n_good
FROM routed GROUP BY route ORDER BY route
"""


def q_hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY, the property that makes HLL a warehouse
    primitive: the global distinct-user estimate comes from element-wise
    max of the per-event-type registers — NO rescan of events — and must
    agree with the estimate computed directly over all events (identical
    registers by algebra). Output: per-type + '__total__' rows, each with
    the sketch estimate and the exact count beside it."""
    from ingestion_scripts_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    ev = _t(spark, sf_dir, "events")
    regs = hll_registers(ev, ["event_type"], "user_id")
    per = hll_estimate(regs, ["event_type"])
    merged = hll_merge(regs, []).withColumn("event_type", F.lit("__total__"))
    tot = hll_estimate(merged, ["event_type"])
    exact_per = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    exact_tot = ev.agg(F.countDistinct("user_id").alias("n_exact")).select(
        F.lit("__total__").alias("event_type"), "n_exact"
    )
    return (
        per.unionByName(tot)
        .join(exact_per.unionByName(exact_tot), "event_type")
        .select("event_type", "n_hll", "n_exact")
        .orderBy("event_type")
    )


def _sql_hll_merge_rollup() -> str:
    from ingestion_scripts_spark.operators.sketches import (
        sql_hll_estimate,
        sql_hll_registers,
    )

    regs = sql_hll_registers("events", "event_type", "user_id::VARCHAR")
    per = sql_hll_estimate("regs", "event_type")
    tot = sql_hll_estimate(
        "(SELECT '__total__' AS event_type, idx, max(mr) AS mr "
        "FROM regs GROUP BY 2)",
        "event_type",
    )
    return f"""
WITH regs AS ({regs}),
est AS ({per} UNION ALL {tot}),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact
  FROM events GROUP BY 1
  UNION ALL
  SELECT '__total__', count(DISTINCT user_id) FROM events)
SELECT e.event_type, e.n_hll, x.n_exact
FROM est e JOIN exact x USING (event_type)
ORDER BY event_type
"""


def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through the spark.sql() entry path (every other query
    uses the DataFrame API; the SQL surface is equally supported) — the
    multi-granularity aggregate with grouping_id disambiguating the
    all-rows from the null-key rows."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, '__all__') AS returnflag,
               coalesce(l_linestatus, '__all__') AS linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT)
                 AS gid,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
               count(*) AS n
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
        ORDER BY gid, returnflag, linestatus
        """
    )


SQL_GROUPING_SETS = """
SELECT coalesce(l_returnflag, '__all__') AS returnflag,
       coalesce(l_linestatus, '__all__') AS linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
         AS gid,
       round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)::DOUBLE AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_returnflag), (l_linestatus), ())
ORDER BY gid, returnflag, linestatus
"""


def q_window_dist_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist) over order
    values per priority — exact rationals k/n, so cross-engine equality is
    bit-level; ranks ordered by (value, key) for determinism."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .filter(F.col("o_orderkey") % 50 == 0)
        .orderBy("o_orderkey")
    )


SQL_WINDOW_DIST = """
SELECT o_orderkey, o_orderpriority, pr, cd FROM (
  SELECT o_orderkey, o_orderpriority,
         round(percent_rank() OVER w, 6) AS pr,
         round(cume_dist() OVER w, 6) AS cd
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice ASC, o_orderkey ASC))
WHERE o_orderkey % 50 = 0 ORDER BY o_orderkey
"""


def q_lang_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language histogram serialized as a deterministic
    'lang:count' string — the map-valued aggregate shape, flattened to a
    scalar the way every array/map result leaves this engine (driver
    canonicalizer contract)."""
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.groupBy("source")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("lang", "n"))),
                    lambda s: F.concat_ws(":", s["lang"], s["n"].cast("string")),
                ),
            ).alias("histogram")
        )
        .orderBy("source")
    )


SQL_LANG_HIST = """
SELECT source,
       array_to_string(list(lang || ':' || n ORDER BY lang), '|') AS histogram
FROM (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2)
GROUP BY source ORDER BY source
"""


def q_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (Pearson corr, sample covariance/stddev) per
    return flag — one pass, map-side partial moments; rounded before
    output so the engines' summation-order drift (~1e-12) can't leak."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "covar_qty_price"
            ),
            F.round(F.stddev_samp("l_discount"), 6).alias("sd_discount"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


SQL_STATS_CORR = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
       round(stddev_samp(l_discount), 6) AS sd_discount,
       count(*) AS n
FROM lineitem GROUP BY 1 ORDER BY l_returnflag
"""


__all__ = [
    '_SCRATCH_DIRS',
    '_scratch',
    'SF_SMOKE',
    '_t',
    '_fmt_ts',
    'SQL_TS',
    'SQL_TS_US',
    '_arr_str',
    'SQL_ARR_STR',
    '_doc_tokens',
    'q_flagship_doc_keywords',
    '_TOKS_SQL',
    'SQL_FLAGSHIP',
    'q_pricing_summary',
    'SQL_PRICING',
    'q_top_orders',
    'SQL_TOP_ORDERS',
    'q_region_revenue',
    'SQL_REGION_REVENUE',
    'CUTOFF',
    'q_antijoin_new_users',
    'SQL_ANTIJOIN',
    'q_dead_letter_routing',
    'SQL_DEAD_LETTER',
    'q_clean_text',
    'SQL_CLEAN',
    'q_hashtags',
    'SQL_HASHTAGS',
    'q_stopword_filter',
    'SQL_STOPWORD',
    'q_bigram_pairs',
    'SQL_BIGRAM_PAIRS',
    'q_parse_rfc822',
    'SQL_PARSE_RFC822',
    'q_parse_struct_time',
    'SQL_PARSE_STRUCT_TIME',
    'q_parse_simple',
    'SQL_PARSE_SIMPLE',
    'q_parse_zoned',
    'SQL_PARSE_ZONED',
    'q_semi_join_urgent',
    'SQL_SEMI_JOIN',
    'q_cust_order_dist',
    'SQL_CUST_ORDER_DIST',
    'q_rollup_revenue',
    'SQL_ROLLUP',
    'q_distinct_users',
    'SQL_DISTINCT_USERS',
    'q_asof_clicks',
    'SQL_ASOF',
    'q_purchase_error_funnel',
    'SQL_FUNNEL',
    'q_small_quantity_revenue',
    'SQL_SMALL_QTY',
    'q_in_subquery_parts',
    'SQL_IN_SUBQUERY',
    'q_value_percentiles',
    'SQL_PERCENTILES',
    'q_pivot_weekday',
    'SQL_PIVOT',
    'q_running_user_value',
    'SQL_RUNNING',
    'q_clicked_never_purchased',
    'SQL_EXCEPT',
    'q_late_ship_priority',
    'SQL_LATE_SHIP',
    'q_parts_never_discounted',
    'SQL_PARTS_NEVER_DISC',
    'q_user_value_quartiles',
    'SQL_USER_QUARTILES',
    'q_props_extract',
    'SQL_PROPS_EXTRACT',
    'q_exact_dedup',
    'SQL_EXACT_DEDUP',
    'q_segment_dedup',
    'SQL_SEGMENT_DEDUP',
    'q_minhash_near_dups',
    '_SH',
    '_SIG',
    'SQL_MINHASH',
    'q_cross_split_contamination',
    '_sql_cross_split_contamination',
    'q_ngram_jaccard',
    'SQL_NGRAM_JACCARD',
    'q_simhash',
    'SQL_SIMHASH',
    'q_fingerprint',
    'SQL_FINGERPRINT',
    'q_winnow_fingerprints',
    'SQL_WINNOW',
    'q_salted_distinct_users',
    'SQL_SALTED_DISTINCT',
    'q_skew_join_revenue',
    'SQL_SKEW_JOIN',
    'q_embedding_topk',
    '_SQL_NORM',
    'SQL_EMBEDDING_TOPK',
    'q_lsh_ann_topk',
    '_PLANES',
    '_sql_lsh_ann',
    'q_ivf_ann_topk',
    '_IVF_CENTS',
    '_sql_ivf_ann',
    'q_ann_recall',
    '_sql_ann_recall',
    'q_ivf_trained_topk',
    '_sql_ivf_trained',
    'q_ivf_ann_topk_mp',
    '_sql_ivf_ann_mp',
    'q_embedding_near_dup',
    'q_embedding_near_dup_fold',
    'SQL_EMBEDDING_NEAR_DUP',
    'q_lang_id',
    'SQL_LANG_ID',
    'q_quality',
    '_Q',
    'SQL_QUALITY',
    'q_vocab_topn',
    'SQL_VOCAB',
    'q_quality_gate',
    '_QG',
    'SQL_QUALITY_GATE',
    'q_token_counts',
    'SQL_TOKEN_COUNTS',
    'q_sentiment',
    '_SENT',
    'SQL_SENTIMENT',
    'q_hourly_windows',
    'SQL_HOURLY',
    'q_stream_sessionize',
    'SQL_STREAM_SESSIONIZE',
    'q_stream_hourly_windows',
    'SQL_STREAM_HOURLY',
    'q_stream_dedup_counts',
    'SQL_STREAM_DEDUP',
    'q_sessionize',
    'SQL_SESSIONIZE',
    '_EPOCH0',
    '_doc_ts',
    '_SQL_DOC_TS',
    'q_twitter_pipeline',
    '_TW_TEXT',
    '_TW_SENT',
    'SQL_TWITTER_PIPELINE',
    'q_reddit_pipeline',
    '_RD_TITLE_SENT',
    '_RD_COMMENT_SENT',
    'SQL_REDDIT_PIPELINE',
    'q_rss_pipeline',
    'SQL_RSS_PIPELINE',
    'q_multimodal_meta',
    'SQL_MULTIMODAL',
    'q_multimodal_features',
    'SQL_MULTIMODAL_FEATURES',
    'q_langid_confusion',
    '_sql_langid_confusion',
    'q_dataset_card',
    '_sql_dataset_card',
    'q_incremental_ingest',
    'SQL_INCREMENTAL_INGEST',
    'q_skew_report',
    'SQL_SKEW_REPORT',
    'q_observed_ingest',
    'SQL_OBSERVED_INGEST',
    '_Z_BITS',
    '_zval',
    '_sql_zval',
    'q_zorder_layout',
    '_sql_zorder_layout',
    'q_multimodal_frames',
    'SQL_MULTIMODAL_FRAMES',
    'q_curation_pipeline',
    '_CUR_Q',
    '_CUR_SH',
    '_CUR_SIG',
    'SQL_CURATION',
    'q_repetition_signals',
    'SQL_REPETITION',
    '_pii_text',
    '_SQL_PII_TEXT',
    'q_pii_scrub',
    '_PII',
    'SQL_PII_SCRUB',
    'q_contamination',
    'SQL_CONTAMINATION',
    '_SAMPLE_RATES',
    '_SAMPLE_DEFAULT',
    'q_stratified_sample',
    '_SAMPLE_CASE',
    'SQL_STRATIFIED_SAMPLE',
    'q_tfidf_top_terms',
    'SQL_TFIDF',
    'q_dup_clusters',
    'SQL_DUP_CLUSTERS',
    'q_hll_distinct_users',
    '_sql_hll',
    'q_kmeans_clusters',
    '_sql_kmeans_base',
    '_sql_kmeans_clusters',
    'q_kmeans_sample',
    '_sql_kmeans_sample',
    '_DSIR_B',
    'q_importance_weights',
    'SQL_IMPORTANCE',
    'q_pmi_bigrams',
    '_SQL_TOKS_LOWER',
    'SQL_PMI',
    'q_nation_profit',
    'SQL_NATION_PROFIT',
    'q_stream_enriched_counts',
    'SQL_STREAM_ENRICHED',
    'q_stream_late_drop',
    'SQL_STREAM_LATE_DROP',
    'q_simhash_near_dups',
    '_sql_simhash_pairs',
    '_PACK_SEQ_LEN',
    'q_sequence_packing',
    'SQL_SEQUENCE_PACKING',
    'q_stream_stream_join',
    'SQL_STREAM_STREAM_JOIN',
    'q_stream_outer_join',
    'SQL_STREAM_OUTER_JOIN',
    'q_scd_upsert',
    'SQL_SCD_UPSERT',
    '_DUPSPAN_N',
    'q_dup_span_fraction',
    'SQL_DUP_SPAN',
    'q_jsonl_source',
    'SQL_JSONL_SOURCE',
    'q_anomaly_zscore',
    'SQL_ANOMALY',
    'q_retention_cohorts',
    'SQL_RETENTION',
    '_MIX_ALPHA',
    '_MIX_TARGET_FRAC',
    'q_temperature_mix',
    'SQL_TEMPERATURE_MIX',
    'q_curation_to_sequences',
    'SQL_CURATION_SEQ',
    'q_csv_source',
    'SQL_CSV_SOURCE',
    'q_corrupt_record_routing',
    'SQL_CORRUPT_ROUTING',
    'q_hll_merge_rollup',
    '_sql_hll_merge_rollup',
    'q_grouping_sets_revenue',
    'SQL_GROUPING_SETS',
    'q_window_dist_funcs',
    'SQL_WINDOW_DIST',
    'q_lang_histograms',
    'SQL_LANG_HIST',
    'q_stats_corr',
    'SQL_STATS_CORR',
]
