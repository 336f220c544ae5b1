"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (documents → clean → stopword-filter →
bigram top-5 → structured keywords: the reference's richest pipeline shape,
``src/reddit_consumer.py:139-155``, over the documents table).

``queries()`` — one entry per implemented operator from SURVEY.md §2 (+ §2.9
extensions). ``oracle_sql()`` — DuckDB twins generated from the SAME frozen
constants (see ``ingestion_scripts_spark/oracle.py``).

Conventions for cross-engine hash-stability:
- every computed column aliased identically on both sides;
- floats rounded before output AND before any ranking;
- array sizes cast to bigint (DuckDB ``len`` is bigint);
- timestamps stringified (``yyyy-MM-dd HH:mm:ss[.SSSSSS]``) to dodge
  tz-encoding differences between engines.
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

SF_SMOKE = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ingestion_scripts_spark.sources.readers import load_table

    return load_table(spark, sf_dir, name)


def _fmt_ts(col, with_micros: bool = False):
    pat = "yyyy-MM-dd HH:mm:ss.SSSSSS" if with_micros else "yyyy-MM-dd HH:mm:ss"
    return F.date_format(col, pat)


SQL_TS = "strftime({0}, '%Y-%m-%d %H:%M:%S')"
SQL_TS_US = "strftime({0}, '%Y-%m-%d %H:%M:%S.%f')"


def _arr_str(col):
    """Array column → '|'-joined scalar (never NULL: concat_ws yields ''
    for a NULL array). The driver's canonicalizer hashes cell values and
    cannot hash Python lists, so every array-typed RESULT column is projected
    through this on the Spark side and through ``SQL_ARR_STR`` in the oracle
    (CORRECTNESS_r01: 8 queries erred on `unhashable type: 'list'`)."""
    return F.concat_ws("|", F.transform(col, lambda x: x.cast("string")))


#: DuckDB twin of ``_arr_str`` — element-wise VARCHAR cast then join;
#: coalesced to '' to match Spark concat_ws's never-NULL contract.
SQL_ARR_STR = (
    "coalesce(array_to_string(list_transform({0}, x -> x::VARCHAR), '|'), '')".format
)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def _doc_tokens(docs: DataFrame) -> DataFrame:
    """documents → stopword-filtered tokens of cleaned text (F1+F5)."""
    return docs.select(
        "doc_id",
        X.remove_stopwords(X.tokenize_ws(X.clean_text(F.col("text")))).alias("t"),
    )


def q_flagship_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2 over documents: per-doc top-5 canonical-bigram keywords."""
    docs = _t(spark, sf_dir, "documents")
    out = K.extract_keywords(_doc_tokens(docs), "doc_id", "t", k=5)
    return out.withColumn("keywords", _arr_str(F.col("keywords")))


_TOKS_SQL = O.sql_remove_stopwords(O.sql_tokenize_ws(O.sql_clean_text("text")))

SQL_FLAGSHIP = f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
big AS (SELECT doc_id, unnest({O.sql_bigrams('t')}) AS bigram FROM toks),
counted AS (SELECT doc_id, bigram, count(*) AS cnt FROM big GROUP BY doc_id, bigram),
ranked AS (SELECT doc_id, bigram,
           row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bigram ASC) AS rn
           FROM counted),
top AS (SELECT doc_id, list(bigram ORDER BY rn) AS bigs FROM ranked WHERE rn <= 5 GROUP BY doc_id),
flat AS (SELECT doc_id, flatten(list_transform(bigs, b -> string_split(b, ' '))) AS words FROM top)
SELECT doc_id,
  {SQL_ARR_STR("list_filter(words, (w, i) -> list_position(words, w) = i)")} AS keywords
FROM flat
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_flagship_doc_keywords(spark, SF_SMOKE)


# ---------------------------------------------------------------------------
# TPC-H-ish relational core (scan/filter/agg/join surface, SURVEY §2.1-2.5)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-01-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_base_price"),
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
  round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2)::DOUBLE AS sum_qty,
  round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2)::DOUBLE AS sum_base_price,
  round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)::DOUBLE AS sum_disc_price,
  round(avg(l_quantity), 4) AS avg_qty,
  round(avg(l_discount), 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-01-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shaped: revenue per BUILDING-segment order, deterministic top-10.

    The customer dim is broadcast — at 100 TB lineitem is the only big side.
    """
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )
    return rev


SQL_TOP_ORDERS = """
SELECT o_orderkey, round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped star join; all dims broadcast, lineitem streams through."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


SQL_REGION_REVENUE = """
SELECT r_name, n_name,
  round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)::DOUBLE AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# J1 anti-join dedup / K4 dead-letter / P3 routing
# ---------------------------------------------------------------------------

# early cutoff: all 150 users appear within the first day, so a later
# cutoff would make the anti-join vacuously empty
CUTOFF = "2024-01-01 06:00:00"


def q_antijoin_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — events after the cutoff whose user was never seen before it
    (``remove_old_articles``, src/rss_consumer.py:68-74, key=user_id)."""
    ev = _t(spark, sf_dir, "events")
    existing = ev.filter(F.col("ts") < F.lit(CUTOFF)).select("user_id")
    incoming = ev.filter(F.col("ts") >= F.lit(CUTOFF))
    out = D.anti_join_dedup(incoming, existing, "user_id")
    return out.select("event_id", "user_id", "event_type").orderBy("event_id")


SQL_ANTIJOIN = f"""
SELECT event_id, user_id, event_type
FROM events e
WHERE ts >= TIMESTAMP '{CUTOFF}'
  AND NOT EXISTS (SELECT 1 FROM events x
                  WHERE x.ts < TIMESTAMP '{CUTOFF}' AND x.user_id = e.user_id)
ORDER BY event_id
"""


def q_dead_letter_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 + P3 — parse ``props`` (regex, null on failure), route rows into
    good/dead channels, count per (event_type, channel)."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), '"k":\\s*(\\d+)', 1).cast("int")
    channel = F.when(k.isNotNull() & (k < 90), F.lit("good")).otherwise(F.lit("dead"))
    return (
        ev.select("event_type", channel.alias("channel"))
        .groupBy("event_type", "channel")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "channel")
    )


SQL_DEAD_LETTER = """
SELECT event_type,
  CASE WHEN TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) < 90
       THEN 'good' ELSE 'dead' END AS channel,
  count(*) AS n
FROM events
GROUP BY 1, 2
ORDER BY event_type, channel
"""


# ---------------------------------------------------------------------------
# F-series scalar functions over documents
# ---------------------------------------------------------------------------

def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", X.clean_text(F.col("text")).alias("clean"))


SQL_CLEAN = f"SELECT doc_id, {O.sql_clean_text('text')} AS clean FROM documents"


def q_hashtags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 over a synthesized hashtag-bearing column (documents carry none)."""
    docs = _t(spark, sf_dir, "documents")
    tagged = F.concat(F.lit("#"), F.col("source"), F.lit(" "), F.col("text"),
                      F.lit(" #"), F.col("lang"))
    return docs.select("doc_id", _arr_str(X.extract_hashtags(tagged)).alias("hashtags"))


SQL_HASHTAGS = (
    "SELECT doc_id, "
    + SQL_ARR_STR(O.sql_hashtags("('#' || source || ' ' || text || ' #' || lang)"))
    + " AS hashtags FROM documents"
)


def q_stopword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _doc_tokens(_t(spark, sf_dir, "documents")).select(
        "doc_id", _arr_str(F.col("t")).alias("tokens")
    )


SQL_STOPWORD = f"SELECT doc_id, {SQL_ARR_STR(_TOKS_SQL)} AS tokens FROM documents"


def q_bigram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _doc_tokens(_t(spark, sf_dir, "documents"))
    bigrams = F.transform(
        X.pairwise_bigrams(F.col("t")), lambda p: F.concat_ws(" ", p)
    )
    return toks.select("doc_id", _arr_str(bigrams).alias("bigrams"))


SQL_BIGRAM_PAIRS = (
    f"WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents) "
    f"SELECT doc_id, {SQL_ARR_STR(O.sql_bigrams('t'))} AS bigrams FROM toks"
)


# ---------------------------------------------------------------------------
# time functions (F7-F10) — format→parse round trips, oracle = identity
# ---------------------------------------------------------------------------

def q_parse_rfc822(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — RFC-822 strings (numeric offset for even keys, named zone for
    odd) parsed back with the reference's tz-branch logic."""
    orders = _t(spark, sf_dir, "orders")
    rfc = F.when(
        F.col("o_orderkey") % 2 == 0,
        F.date_format("o_orderdate", "EEE, dd MMM yyyy HH:mm:ss Z"),
    ).otherwise(F.date_format("o_orderdate", "EEE, dd MMM yyyy HH:mm:ss zzz"))
    return orders.select(
        "o_orderkey", _fmt_ts(TF.parse_rfc822(rfc)).alias("published")
    ).orderBy("o_orderkey")


SQL_PARSE_RFC822 = (
    "SELECT o_orderkey, " + SQL_TS.format("o_orderdate") + " AS published "
    "FROM orders ORDER BY o_orderkey"
)


def q_parse_struct_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — 9-int struct_time list → timestamp (datetime(*x[:-2]))."""
    ev = _t(spark, sf_dir, "events")
    st = F.array(
        F.year("ts"), F.month("ts"), F.dayofmonth("ts"),
        F.hour("ts"), F.minute("ts"), F.second("ts"),
        F.lit(0), F.lit(0), F.lit(0),
    )
    return ev.select(
        "event_id", _fmt_ts(TF.struct_time_to_timestamp(st)).alias("published")
    ).orderBy("event_id")


SQL_PARSE_STRUCT_TIME = (
    "SELECT event_id, " + SQL_TS.format("date_trunc('second', ts)") + " AS published "
    "FROM events ORDER BY event_id"
)


def q_parse_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 — '%Y-%m-%d %H:%M:%S' parse."""
    ev = _t(spark, sf_dir, "events")
    s = F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    return ev.select(
        "event_id", _fmt_ts(TF.parse_simple(s)).alias("created")
    ).orderBy("event_id")


SQL_PARSE_SIMPLE = (
    "SELECT event_id, " + SQL_TS.format("date_trunc('second', ts)") + " AS created "
    "FROM events ORDER BY event_id"
)


def q_parse_zoned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 — '%Y-%m-%d %H:%M:%S%z' parse."""
    ev = _t(spark, sf_dir, "events")
    s = F.concat(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), F.lit("+00:00"))
    return ev.select(
        "event_id", _fmt_ts(TF.parse_zoned(s)).alias("created_at")
    ).orderBy("event_id")


SQL_PARSE_ZONED = (
    "SELECT event_id, " + SQL_TS.format("date_trunc('second', ts)") + " AS created_at "
    "FROM events ORDER BY event_id"
)


# ---------------------------------------------------------------------------
# relational surface widening: semi/outer joins, rollup, distinct, as-of
# ---------------------------------------------------------------------------

def q_semi_join_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with >=1 urgent open order."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "O")
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O')
ORDER BY c_custkey
"""


def q_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped: left-outer join + two-level agg — how many customers
    placed k orders, INCLUDING the zero-order customers an inner join would
    drop."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_CUST_ORDER_DIST = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region, nation) revenue with grouping level — subtotals and a
    grand total in one pass (partial aggregation handles all levels)."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue"),
            F.grouping_id().alias("lvl"),
        )
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


SQL_ROLLUP = """
SELECT r_name, n_name, round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)::DOUBLE AS revenue,
       grouping(r_name) * 2 + grouping(n_name) AS lvl
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group (exact; the approx_count_distinct variant
    is engine-side only — sketches differ across engines)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


SQL_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_asof_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (union-window form, operators/joins.py): each purchase
    event gets the same user's latest click at or before it."""
    from ingestion_scripts_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = asof_join(purchases, clicks, on="user_id", right_values=[])
    return out.select(
        "event_id",
        "user_id",
        _fmt_ts(F.col("ts"), with_micros=True).alias("purchase_ts"),
        _fmt_ts(F.col("asof_ts"), with_micros=True).alias("last_click_ts"),
    ).orderBy("event_id")


SQL_ASOF = f"""
SELECT p.event_id, p.user_id,
  {SQL_TS_US.format('p.ts')} AS purchase_ts,
  {SQL_TS_US.format('''(SELECT max(c.ts) FROM events c
     WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts)''')}
    AS last_click_ts
FROM events p WHERE p.event_type = 'purchase'
ORDER BY p.event_id
"""


def q_purchase_error_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-banded range join (operators/joins.py::banded_interval_join —
    equi-join on (user, time bucket) + residual filter, never a per-key
    nested loop): errors within 1 hour after each purchase."""
    from ingestion_scripts_spark.operators.joins import banded_interval_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("ets")
    )
    joined = banded_interval_join(
        purchases, errors, on="user_id", left_ts="pts", right_ts="ets",
        window_seconds=3600,
    )
    return (
        joined.groupBy("purchase_id")
        .agg(F.count(F.lit(1)).alias("n_errors_1h"))
        .orderBy("purchase_id")
    )


SQL_FUNNEL = """
SELECT l.event_id AS purchase_id, count(*) AS n_errors_1h
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') r
  ON l.user_id = r.user_id AND r.ts > l.ts
 AND r.ts <= l.ts + INTERVAL 3600 SECOND
GROUP BY l.event_id
ORDER BY purchase_id
"""


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shaped correlated scalar subquery, decorrelated as a pre-agg +
    broadcast join: lineitems under 50% of their part's average quantity.
    At 100 TB the per-part averages are a small aggregate joined broadcast;
    the naive correlated subquery would rescan lineitem per row."""
    li = _t(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(part_avg), "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_SMALL_QTY = """
SELECT round(sum(CAST(l_extendedprice AS DECIMAL(18,4)))::DOUBLE / 7.0, 2) AS avg_yearly, count(*) AS n_items
FROM lineitem l
WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem x
                    WHERE x.l_partkey = l.l_partkey)
"""


def q_in_subquery_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (left-semi under the hood): parts that ship in
    return-flagged lineitems, counted by brand-ish prefix of name."""
    part = _t(spark, sf_dir, "part")
    returned = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        part.join(
            returned.select("l_partkey").dropDuplicates(["l_partkey"]),
            part.p_partkey == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("brand")
    )


SQL_IN_SUBQUERY = """
SELECT p_brand AS brand, count(*) AS n_parts
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
GROUP BY 1 ORDER BY brand
"""


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``). The approx_percentile sketch variant exists
    engine-side for the 100 TB path but is not oracle-comparable."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


SQL_PERCENTILES = """
SELECT event_type,
  round(quantile_cont(value, 0.5), 4) AS p50,
  round(quantile_cont(value, 0.9), 4) AS p90,
  round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_pivot_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: event counts per type x ISO weekday as columns (fixed pivot
    value list, so the plan is a single pass of conditional aggregates)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select("event_type", F.dayofweek("ts").alias("dow"))
        .groupBy("event_type")
        .pivot("dow", list(range(1, 8)))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "event_type",
            *[F.col(str(d)).cast("bigint").alias(f"d{d}") for d in range(1, 8)],
        )
        .orderBy("event_type")
    )


SQL_PIVOT = (
    "SELECT event_type, "
    + ", ".join(
        # DuckDB dayofweek: 0=Sunday; Spark dayofweek: 1=Sunday
        f"CAST(count(*) FILTER (dayofweek(ts) = {d - 1}) AS BIGINT) AS d{d}"
        for d in range(1, 8)
    )
    + " FROM events GROUP BY event_type ORDER BY event_type"
)


def q_running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function suite: running cumulative sum + centered-free 3-row
    moving average of value per user ordered by event time."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            4,
        )
        .cast("double")
        .alias("running_total"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)"))
            .over(w.rowsBetween(-2, 0))
            .cast("double")
            / F.count(F.lit(1)).over(w.rowsBetween(-2, 0)),
            4,
        ).alias("mavg3"),
        F.rank().over(w).alias("rk"),
    ).orderBy("user_id", "event_id")


SQL_RUNNING = """
SELECT user_id, event_id,
  round(sum(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING), 4)::DOUBLE AS running_total,
  round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg3,
  rank() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
FROM events WHERE user_id < 10
ORDER BY user_id, event_id
"""


def q_clicked_never_purchased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (EXCEPT): users who clicked but had not purchased in
    the first four days (every user eventually purchases, so the un-windowed
    variant is vacuous)."""
    ev = _t(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    buyers = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("ts") < F.lit("2024-01-05"))
    ).select("user_id")
    return clickers.subtract(buyers).orderBy("user_id")  # EXCEPT (distinct)


SQL_EXCEPT = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events
WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-05'
ORDER BY user_id
"""


def q_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape, adapted to this schema): orders
    with at least one lineitem shipped >60 days after the order date,
    counted per priority. Spark: LEFT SEMI join with a non-equi conjunct —
    the equi half (l_orderkey = o_orderkey) keeps it a shuffled hash join
    at any scale; the date predicate rides along as a join residual, so no
    cartesian blow-up and both sides stream through one shuffle."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("late_orders"))
        .orderBy("o_orderpriority")
    )


SQL_LATE_SHIP = """
SELECT o_orderpriority, count(*) AS late_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_parts_never_discounted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS (TPC-H Q21/Q22 shape): parts that never
    shipped with a deep discount (>0.09), with their item count and
    revenue. Spark: LEFT ANTI against the distinct offender-key set —
    the offender side is pre-aggregated to distinct keys before the join,
    so the anti side shuffles |distinct parts| not |lineitem| rows."""
    li = _t(spark, sf_dir, "lineitem")
    offenders = (
        li.filter(F.col("l_discount") > 0.09).select("l_partkey").distinct()
    )
    return (
        li.join(offenders, "l_partkey", "left_anti")
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("l_partkey")
    )


SQL_PARTS_NEVER_DISC = """
SELECT l_partkey, count(*) AS n_items, round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2)::DOUBLE AS revenue
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM lineitem d
                  WHERE d.l_partkey = l.l_partkey AND d.l_discount > 0.09)
GROUP BY l_partkey
ORDER BY l_partkey
"""


def q_user_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartiles per user over event value (deterministic tie-break
    on event_id), then per-(user, quartile) stats. The window is
    PARTITIONED BY user_id — each user's sort runs in its own task, so the
    op scales horizontally; a GLOBAL ntile would funnel every row through
    one task and is deliberately avoided (the scale path for global
    quantiles is `value_percentiles`' boundary-based bucketing)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value"), F.col("event_id"))
    return (
        ev.select("user_id", "event_id", "value", F.ntile(4).over(w).alias("quartile"))
        .groupBy("user_id", "quartile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
            TA.r4(F.avg("value")).alias("mean_value"),
        )
        .orderBy("user_id", "quartile")
    )


SQL_USER_QUARTILES = f"""
WITH t AS (
  SELECT user_id, event_id, value,
         ntile(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS quartile
  FROM events)
SELECT user_id, quartile, count(*) AS n,
       round(min(value), 4) AS lo, round(max(value), 4) AS hi,
       {O.sql_r4('avg(value)')} AS mean_value
FROM t GROUP BY user_id, quartile
ORDER BY user_id, quartile
"""


def q_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON payload decode (S1's decode step as a batch op):
    ``get_json_object`` pulls ``$.k`` out of the raw ``props`` JSON string,
    casts it, and aggregates per event type. JSON path evaluation is
    JVM-side (Jackson) inside codegen — no Python in the loop — and the
    narrow projection precedes the shuffle, so only (event_type, k) moves."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            TA.r4(F.avg("k")).alias("avg_k"),
        )
        .orderBy("event_type")
    )


SQL_PROPS_EXTRACT = f"""
SELECT event_type, count(*) AS n,
       CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
       {O.sql_r4("avg(json_extract(props, '$.k')::BIGINT)")} AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# extension: dedup family (SURVEY §2.9)
# ---------------------------------------------------------------------------

def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        D.exact_dedup(docs.select("doc_id", "lang", "source"), ["lang", "source"], ["doc_id"])
        .orderBy("doc_id")
    )


SQL_EXACT_DEDUP = """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
  FROM documents) WHERE rn = 1
ORDER BY doc_id
"""


def q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document segment-level exact dedup (the RefinedWeb/CCNet
    line-dedup step): drop every 8-word chunk that occurs verbatim in
    more than one document, reassemble survivors in order."""
    docs = _t(spark, sf_dir, "documents")
    return D.segment_dedup(docs, seg_words=8, max_docs=1).orderBy("doc_id")


SQL_SEGMENT_DEDUP = f"""
WITH toks AS (SELECT doc_id, {O.sql_tokenize_ws('text')} AS t FROM documents),
idx AS (SELECT doc_id, t,
               unnest(generate_series(0, (ceil(len(t)/8.0))::INT - 1)) AS i
        FROM toks),
seg AS (SELECT doc_id, i AS seg_idx,
               array_to_string(list_slice(t, i*8+1, i*8+8), ' ') AS seg
        FROM idx),
cnt AS (SELECT seg, count(DISTINCT doc_id) AS seg_df FROM seg GROUP BY seg),
kept AS (SELECT s.doc_id, s.seg_idx, s.seg
         FROM seg s JOIN cnt c USING (seg) WHERE c.seg_df <= 1),
agg AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS dedup_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, (ceil(len(t)/8.0))::BIGINT AS n_seg FROM toks)
SELECT t.doc_id, coalesce(a.dedup_text, '') AS dedup_text, t.n_seg,
       coalesce(a.n_kept, 0)::BIGINT AS n_kept
FROM tot t LEFT JOIN agg a USING (doc_id)
ORDER BY t.doc_id
"""


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return D.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.8).orderBy(
        "id_a", "id_b"
    )


_SH = O.sql_shingles("text", 3)
_SIG = O.sql_minhash_signature("sh", 16)
SQL_MINHASH = f"""
WITH sh AS (SELECT doc_id, {_SH} AS sh FROM documents),
sig AS (SELECT doc_id, sh, {_SIG} AS sig FROM sh WHERE len(sh) > 0),
banded AS (
  SELECT doc_id, b AS band,
         md5(array_to_string(list_transform(sig[b*4+1:b*4+4], x -> x::VARCHAR), ',')) AS bucket
  FROM sig, unnest([0,1,2,3]) AS u(b)),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id)
SELECT id_a, id_b,
  round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        len(list_distinct(a.sh || b.sh)), 6) AS jaccard
FROM cand JOIN sh a ON cand.id_a = a.doc_id JOIN sh b ON cand.id_b = b.doc_id
WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
            len(list_distinct(a.sh || b.sh)), 6) >= 0.8
ORDER BY id_a, id_b
"""


def q_cross_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate contamination ACROSS the train/eval boundary: the
    MinHash near-dup pipeline over the whole corpus, keeping only pairs
    whose members fall on OPPOSITE sides of the dataset_split hash rule —
    eval documents with a fuzzy twin in train leak benchmark signal that
    exact n-gram contamination checks miss. Same banded-LSH scaling law
    as minhash_near_dups; the split classification is a narrow map on the
    pair ids."""
    docs = _t(spark, sf_dir, "documents")
    near = D.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.8)

    def in_train(c):
        return (
            X.hash64(F.concat(F.lit("split:"), c.cast("string"))) % 100 < 80
        ).cast("int")

    out = (
        near.withColumn("a_train", in_train(F.col("id_a")))
        .withColumn("b_train", in_train(F.col("id_b")))
        .filter(F.col("a_train") != F.col("b_train"))
    )
    return out.select(
        F.when(F.col("a_train") == 0, F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias("eval_doc"),
        F.when(F.col("a_train") == 1, F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias("train_doc"),
        "jaccard",
    ).orderBy("eval_doc", "train_doc")


def _sql_cross_split_contamination() -> str:
    h = f"{O.sql_hash64(chr(39) + 'split:' + chr(39) + ' || {0}')} % 100 < 80".format
    return f"""
WITH near AS ({SQL_MINHASH}),
flagged AS (
  SELECT id_a, id_b, jaccard,
         CASE WHEN {h('id_a')} THEN 1 ELSE 0 END AS a_train,
         CASE WHEN {h('id_b')} THEN 1 ELSE 0 END AS b_train
  FROM near)
SELECT CASE WHEN a_train = 0 THEN id_a ELSE id_b END AS eval_doc,
       CASE WHEN a_train = 1 THEN id_a ELSE id_b END AS train_doc,
       jaccard
FROM flagged WHERE a_train <> b_train
ORDER BY eval_doc, train_doc
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.5).orderBy(
        "id_a", "id_b"
    )


SQL_NGRAM_JACCARD = f"""
WITH sh AS (SELECT doc_id, lang, {_SH} AS sh FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        len(list_distinct(a.sh || b.sh)), 6) AS jaccard
FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
            len(list_distinct(a.sh || b.sh)), 6) >= 0.5
ORDER BY id_a, id_b
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", D.simhash(F.col("text")).alias("fp")).orderBy("doc_id")


SQL_SIMHASH = (
    f"SELECT doc_id, {O.sql_simhash('text')} AS fp FROM documents ORDER BY doc_id"
)


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TA.fingerprint(F.col("text")).alias("fp")).orderBy(
        "doc_id"
    )


SQL_FINGERPRINT = (
    f"SELECT doc_id, {O.sql_hash64('text')} AS fp FROM documents ORDER BY doc_id"
)


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints (Schleimer et al. SIGMOD'03):
    min n-gram-hash per sliding window, deduped; sorted for canonical
    cross-engine order."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        _arr_str(F.array_sort(TA.winnow_fingerprints(F.col("text")))).alias("fps"),
    ).orderBy("doc_id")


SQL_WINNOW = (
    f"SELECT doc_id, {SQL_ARR_STR(O.sql_winnow('text'))} AS fps "
    "FROM documents ORDER BY doc_id"
)


def q_salted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted COUNT(DISTINCT): exact, skew-proof — per-salt
    distinct counts partition the value space and sum to the true count
    (operators/skew.py). Oracle is the plain COUNT(DISTINCT)."""
    from ingestion_scripts_spark.operators.skew import salted_count_distinct

    ev = _t(spark, sf_dir, "events")
    return salted_count_distinct(
        ev, ["event_type"], "user_id", n_salts=16, out_col="n_users"
    ).orderBy("event_type")


SQL_SALTED_DISTINCT = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_skew_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicated-salt skew join (operators/skew.py): orders fanned across
    salts, customer dim replicated; result provably equals the plain join —
    the oracle IS the plain join."""
    from ingestion_scripts_spark.operators.skew import replicated_skew_join

    orders = _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = replicated_skew_join(orders, cust, on="c_custkey", n_salts=8,
                                  salt_src="o_orderkey")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


SQL_SKEW_JOIN = """
SELECT c_mktsegment, round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)::DOUBLE AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# extension: similarity search
# ---------------------------------------------------------------------------

def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return SIM.cosine_topk(queries, emb, k=10).orderBy("query_id", "rank")


_SQL_NORM = "sqrt(list_sum(list_transform(range(1, len({0}) + 1), i -> {0}[i] * {0}[i])))".format

SQL_EMBEDDING_TOPK = f"""
WITH q0 AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
            FROM embeddings WHERE vec_id % 50 = 0),
q AS (SELECT query_id, list_transform(v, x -> x / {_SQL_NORM('v')}) AS qv FROM q0),
c0 AS (SELECT vec_id AS match_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT match_id, list_transform(v, x -> x / {_SQL_NORM('v')}) AS cv FROM c0),
scored AS (
  SELECT query_id, match_id, round({O.sql_dot('qv', 'cv', 'len(qv)')}, 6) AS sim
  FROM q, c WHERE query_id <> match_id),
ranked AS (
  SELECT query_id, match_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, match_id ASC) AS rank
  FROM scored)
SELECT query_id, match_id, sim, rank FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""


def q_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate NN (the scale path): exact cosine only
    within the query's sign-bit bucket. Deterministic md5-derived
    hyperplanes are embedded as literals on BOTH engines."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return SIM.lsh_ann_topk(queries, emb, dim=64, num_planes=6, k=5).orderBy(
        "query_id", "rank"
    )


_PLANES = SIM.hyperplanes(6, 64)


def _sql_lsh_ann() -> str:
    bq = O.sql_lsh_bucket("qv", _PLANES)
    bc = O.sql_lsh_bucket("cv", _PLANES)
    nrm = "sqrt(list_sum(list_transform(range(1, len({0}) + 1), i -> {0}[i] * {0}[i])))".format
    return f"""
WITH q0 AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
            FROM embeddings WHERE vec_id % 50 = 0),
q AS (SELECT query_id, qv, {bq} AS bucket FROM
      (SELECT query_id, list_transform(v, x -> x / {nrm('v')}) AS qv FROM q0)),
c0 AS (SELECT vec_id AS match_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT match_id, cv, {bc} AS bucket FROM
      (SELECT match_id, list_transform(v, x -> x / {nrm('v')}) AS cv FROM c0)),
scored AS (
  SELECT query_id, match_id, round({O.sql_dot('qv', 'cv', 'len(qv)')}, 6) AS sim
  FROM q JOIN c USING (bucket) WHERE query_id <> match_id),
ranked AS (
  SELECT query_id, match_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, match_id ASC) AS rank
  FROM scored)
SELECT query_id, match_id, sim, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (single-probe coarse cell, deterministic centroids) —
    the non-hashing scale path beside lsh_ann_topk."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return SIM.ivf_ann_topk(queries, emb, dim=64, n_cells=8, k=5).orderBy(
        "query_id", "rank"
    )


_IVF_CENTS = SIM.ivf_centroids(8, 64)


def _sql_ivf_ann() -> str:
    cq = O.sql_ivf_cell("qv", _IVF_CENTS)
    cc = O.sql_ivf_cell("cv", _IVF_CENTS)
    nrm = "sqrt(list_sum(list_transform(range(1, len({0}) + 1), i -> {0}[i] * {0}[i])))".format
    return f"""
WITH q0 AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
            FROM embeddings WHERE vec_id % 50 = 0),
q AS (SELECT query_id, qv, {cq} AS cell FROM
      (SELECT query_id, list_transform(v, x -> x / {nrm('v')}) AS qv FROM q0)),
c0 AS (SELECT vec_id AS match_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT match_id, cv, {cc} AS cell FROM
      (SELECT match_id, list_transform(v, x -> x / {nrm('v')}) AS cv FROM c0)),
scored AS (
  SELECT query_id, match_id, round({O.sql_dot('qv', 'cv', 'len(qv)')}, 6) AS sim
  FROM q JOIN c USING (cell) WHERE query_id <> match_id),
ranked AS (
  SELECT query_id, match_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, match_id ASC) AS rank
  FROM scored)
SELECT query_id, match_id, sim, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measure, don't guess: the ANN evaluation harness as a query. For
    each approximate index (LSH sign-bit buckets, IVF single-probe) the
    hit rate of its top-5 against the EXACT cosine top-10 — the
    recall/latency tradeoff quantified, per method, in one run. At scale
    this runs on a query sample; the joins are on (query, match) ids."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = SIM.cosine_topk(queries, emb, k=10).select("query_id", "match_id")
    # fully lazy: the query count is a broadcast 1-row aggregate joined into
    # each rate (mirrors the oracle's nq CTE) — no Spark job fires at
    # build time (VERDICT r3 item 2)
    nq = queries.agg(F.count(F.lit(1)).cast("bigint").alias("n_queries"))

    def rate(approx: DataFrame, method: str) -> DataFrame:
        hits = approx.select("query_id", "match_id").join(
            exact, ["query_id", "match_id"]
        )
        return (
            hits.agg(F.count(F.lit(1)).alias("__hits"))
            .crossJoin(F.broadcast(nq))
            .select(
                F.lit(method).alias("method"),
                F.col("n_queries"),
                TA.r4(
                    F.col("__hits") / (F.col("n_queries") * F.lit(5.0))
                ).alias("hit_rate"),
            )
        )

    lsh = SIM.lsh_ann_topk(queries, emb, dim=64, num_planes=6, k=5)
    ivf = SIM.ivf_ann_topk(queries, emb, dim=64, n_cells=8, k=5)
    return rate(lsh, "lsh").unionByName(rate(ivf, "ivf")).orderBy("method")


def _sql_ann_recall() -> str:
    return f"""
WITH exact AS ({SQL_EMBEDDING_TOPK}),
lsh AS ({_sql_lsh_ann()}),
ivf AS ({_sql_ivf_ann()}),
nq AS (SELECT count(*) AS n FROM embeddings WHERE vec_id % 50 = 0),
h AS (
  SELECT 'lsh' AS method, count(*) AS hits
  FROM lsh a JOIN exact e USING (query_id, match_id)
  UNION ALL
  SELECT 'ivf' AS method, count(*) AS hits
  FROM ivf a JOIN exact e USING (query_id, match_id))
SELECT h.method, CAST(nq.n AS BIGINT) AS n_queries,
       {O.sql_r4('hits / (nq.n * 5.0)')} AS hit_rate
FROM h, nq ORDER BY method
"""


def q_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer: k-means (2 Lloyd rounds,
    deterministic init) on the unit-normalized corpus replaces the fixed
    pseudo-random centroids of ivf_ann_topk — the production IVF build
    (train quantizer → assign cells → per-cell exact search). Same
    rounded-distance / lowest-id assignment as clustering.py on BOTH
    engines; the oracle re-trains the quantizer from scratch in SQL."""
    from ingestion_scripts_spark.operators.clustering import kmeans_fit

    # spread the scan FIRST: normalization, assignment and scoring are all
    # compute-bound, and a small parquet corpus arrives as one split — every
    # downstream pass inherits this layout (no-op at real corpus sizes)
    emb = SIM.spread(_t(spark, sf_dir, "embeddings"))
    nv = (
        emb.select("vec_id", SIM._as_double(F.col("embedding")).alias("__v"))
        .withColumn("__n", SIM.norm(F.col("__v")))
        .select(
            "vec_id",
            F.transform(F.col("__v"), lambda x: x / F.col("__n")).alias("nv"),
        )
    )
    # the returned assignment runs over kmeans_fit's local-checkpointed
    # working set (a LogicalRDD — no InMemoryRelation, so the historical
    # columnar-cache pruning bug (AIOOBE on differently-pruned self-join
    # sides) that once forced a fresh un-cached assignment cannot trigger)
    cents, assigned = kmeans_fit(nv, "nv", "vec_id", k=8, iters=2)
    assigned = assigned.select(F.col("__id").alias("vec_id"), "v", "cluster_id")
    # tiny query side broadcast — join parallelism tracks the corpus
    # partitioning (spread above), not the 8 cell keys
    corpus = assigned.select(
        F.col("vec_id").alias("match_id"), "cluster_id", F.col("v").alias("cv")
    )
    queries = assigned.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "cluster_id", F.col("v").alias("qv")
    )
    scored = (
        F.broadcast(queries).join(corpus, "cluster_id")
        .filter(F.col("query_id") != F.col("match_id"))
        .select(
            "query_id",
            "match_id",
            F.round(SIM.dot(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .orderBy("query_id", "rank")
    )


def _sql_ivf_trained() -> str:
    from ingestion_scripts_spark.operators.clustering import sql_kmeans

    nrm = (
        "sqrt(list_sum(list_transform(range(1, len({0}) + 1), i -> {0}[i] * {0}[i])))"
    ).format
    normed = (
        "(SELECT vec_id, list_transform(v, x -> x / " + nrm("v")
        + ") AS nv FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings))"
    )
    km = sql_kmeans(normed, "nv", "vec_id", k=8, iters=2, dim=64)
    return f"""
WITH assign AS (SELECT vec_id, cluster_id FROM ({km}) base),
nv AS (SELECT vec_id, nv FROM {normed} AS n),
j AS (SELECT a.vec_id, a.cluster_id, n.nv FROM assign a JOIN nv n USING (vec_id)),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         round({O.sql_dot('q.nv', 'c.nv', 'len(q.nv)')}, 6) AS sim
  FROM j q JOIN j c ON q.cluster_id = c.cluster_id AND q.vec_id <> c.vec_id
  WHERE q.vec_id % 50 = 0),
ranked AS (
  SELECT query_id, match_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, match_id ASC) AS BIGINT)
           AS rank
  FROM scored)
SELECT query_id, match_id, sim, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


def q_ivf_ann_topk_mp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN (probes=2): the query fans out to its two
    nearest coarse cells — recovering boundary-vector recall at 2x candidate
    cost. Corpus rows live in exactly one cell, so the probe union is
    dedup-free."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return SIM.ivf_ann_topk(queries, emb, dim=64, n_cells=8, k=5, probes=2).orderBy(
        "query_id", "rank"
    )


def _sql_ivf_ann_mp() -> str:
    cq = O.sql_ivf_probe_cells("qv", _IVF_CENTS, 2)
    cc = O.sql_ivf_cell("cv", _IVF_CENTS)
    nrm = "sqrt(list_sum(list_transform(range(1, len({0}) + 1), i -> {0}[i] * {0}[i])))".format
    return f"""
WITH q0 AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
            FROM embeddings WHERE vec_id % 50 = 0),
q AS (SELECT query_id, qv, unnest({cq}) AS cell FROM
      (SELECT query_id, list_transform(v, x -> x / {nrm('v')}) AS qv FROM q0)),
c0 AS (SELECT vec_id AS match_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT match_id, cv, {cc} AS cell FROM
      (SELECT match_id, list_transform(v, x -> x / {nrm('v')}) AS cv FROM c0)),
scored AS (
  SELECT query_id, match_id, round({O.sql_dot('qv', 'cv', 'len(qv)')}, 6) AS sim
  FROM q JOIN c USING (cell) WHERE query_id <> match_id),
ranked AS (
  SELECT query_id, match_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, match_id ASC) AS rank
  FROM scored)
SELECT query_id, match_id, sim, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label (IVF-cell stand-in).

    Engine default is the vectorized numpy kernel (one BLAS gram matrix per
    block via applyInPandas — ~6x the HOF fold's throughput at sf0.1, and
    10-50x less CPU per pair at cluster scale); the fold twin below checks
    the same oracle, so both kernels stay hash-verified."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.blocked_cosine_pairs_pandas(emb, "label", threshold=0.35).orderBy(
        "id_a", "id_b"
    )


def q_embedding_near_dup_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native-HOF fold twin of embedding_near_dup (zip_with + aggregate dot
    products — sequential left fold, bit-identical to the DuckDB oracle's
    list fold). Kept oracle-checked as the all-JVM shadow of the numpy
    kernel; pytest additionally pins exact pairwise equality of the two."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.blocked_cosine_pairs(emb, "label", threshold=0.35).orderBy(
        "id_a", "id_b"
    )


SQL_EMBEDDING_NEAR_DUP = f"""
WITH v0 AS (SELECT label, vec_id, embedding::DOUBLE[] AS r FROM embeddings),
v AS (SELECT label, vec_id,
             list_transform(r, x -> x / {_SQL_NORM('r')}) AS v FROM v0)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({O.sql_dot('a.v', 'b.v', 'len(a.v)')}, 6) AS cos
FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round({O.sql_dot('a.v', 'b.v', 'len(a.v)')}, 6) >= 0.35
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# extension: text analysis
# ---------------------------------------------------------------------------

def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TA.lang_id(F.col("text")).alias("lang_pred")).orderBy(
        "doc_id"
    )


SQL_LANG_ID = (
    f"SELECT doc_id, {O.sql_lang_id('text')} AS lang_pred FROM documents ORDER BY doc_id"
)


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    q = TA.quality_score(F.col("text"))
    return docs.select(
        "doc_id",
        q["n_chars"].cast("bigint").alias("n_chars"),
        q["n_tokens"].cast("bigint").alias("n_tokens"),
        q["mean_token_len"].alias("mean_token_len"),
        q["punct_ratio"].alias("punct_ratio"),
        q["digit_ratio"].alias("digit_ratio"),
        q["stop_ratio"].alias("stop_ratio"),
        q["quality"].alias("quality"),
    ).orderBy("doc_id")


_Q = O.sql_quality("text")
SQL_QUALITY = (
    "SELECT doc_id, "
    + ", ".join(f"{_Q[c]} AS {c}" for c in
                ["n_chars", "n_tokens", "mean_token_len", "punct_ratio",
                 "digit_ratio", "stop_ratio", "quality"])
    + " FROM documents ORDER BY doc_id"
)


def q_vocab_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary build — the tokenizer-training precursor: global
    term frequency + document frequency with a deterministic top-N
    (tf desc, term asc). The groupBy does map-side partial aggregation, so
    the shuffle carries one row per (partition, term), not per token; the
    final rank runs over the already-aggregated vocab table, which Heaps'
    law keeps sublinear in corpus size, so the single-task window is over
    the small side by construction."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(X.tokenize_ws(F.lower(F.col("text")))).alias("term"),
    )
    vocab = toks.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    # TakeOrdered the top-200 FIRST (distributed per-partition top-k), then
    # rank only the bounded 200-row result — the rank window never sees the
    # full vocab, so no single-partition pass over all distinct terms
    top = vocab.orderBy(F.col("tf").desc(), F.col("term")).limit(200)
    w = Window.orderBy(F.col("tf").desc(), F.col("term"))
    return top.withColumn("rnk", F.row_number().over(w).cast("bigint")).orderBy(
        "rnk"
    )


SQL_VOCAB = f"""
WITH toks AS (
  SELECT doc_id, unnest({O.sql_tokenize_ws('lower(text)')}) AS term FROM documents),
vocab AS (
  SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
  FROM toks GROUP BY term),
ranked AS (
  SELECT term, tf, df,
         row_number() OVER (ORDER BY tf DESC, term ASC) AS rnk
  FROM vocab)
SELECT term, tf, df, rnk FROM ranked WHERE rnk <= 200 ORDER BY rnk
"""


def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gate: frozen-weight linear classifier (hard
    sigmoid) over the quality features — the 'fasttext keep/drop' stage of
    an LLM curation pipeline. Pure narrow map, no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    qc = TA.quality_classify(F.col("text"))
    return docs.select(
        "doc_id",
        qc["gate_score"].alias("gate_score"),
        qc["keep"].alias("keep"),
    ).orderBy("doc_id")


_QG = O.sql_quality_classify("text")
SQL_QUALITY_GATE = (
    f"SELECT doc_id, {_QG['gate_score']} AS gate_score, {_QG['keep']} AS keep"
    " FROM documents ORDER BY doc_id"
)


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TA.token_count_ws(F.col("text")).cast("bigint").alias("n_ws"),
        TA.token_count_bpe(F.col("text")).cast("bigint").alias("n_bpe"),
    ).orderBy("doc_id")


SQL_TOKEN_COUNTS = (
    f"SELECT doc_id, CAST(len({O.sql_tokenize_ws('text')}) AS BIGINT) AS n_ws, "
    f"{O.sql_token_count_bpe('text')} AS n_bpe FROM documents ORDER BY doc_id"
)


def q_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1 — deterministic lexicon sentiment (vader-udf variant in tests)."""
    docs = _t(spark, sf_dir, "documents")
    s = S.sentiment_native(F.col("text"))
    return docs.select(
        "doc_id",
        s["negative"].alias("negative"),
        s["neutral"].alias("neutral"),
        s["positive"].alias("positive"),
        s["compound"].alias("compound"),
    ).orderBy("doc_id")


_SENT = O.sql_sentiment("text")
SQL_SENTIMENT = (
    "SELECT doc_id, "
    + ", ".join(f"{_SENT[c]} AS {c}" for c in ["negative", "neutral", "positive", "compound"])
    + " FROM documents ORDER BY doc_id"
)


# ---------------------------------------------------------------------------
# streaming-shaped batch analytics over events
# ---------------------------------------------------------------------------

def q_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (streaming §2.8 batch analog)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            _fmt_ts(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


SQL_HOURLY = (
    "SELECT " + SQL_TS.format("date_trunc('hour', ts)") + " AS window_start, "
    "event_type, count(*) AS n, round(sum(CAST(value AS DECIMAL(18,4))), 2)::DOUBLE AS total_value "
    "FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"
)


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-min gap) as a REAL streaming job, checked
    against the batch gaps-and-islands SQL: Spark's session_window merges
    events within the gap, so (user, session_start=min ts, session_end=
    max ts, n_events) must equal the island decomposition exactly."""
    import tempfile
    import uuid

    from ingestion_scripts_spark.sources.readers import read_events_stream

    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _fmt_ts(F.min("ts"), with_micros=True).alias("session_start"),
            _fmt_ts(F.max("ts"), with_micros=True).alias("session_end"),
        )
    )
    name = "stream_sess_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .select("user_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_start")
    )


SQL_STREAM_SESSIONIZE = f"""
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events),
sess AS (
  SELECT user_id, ts,
    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged)
SELECT user_id,
  {SQL_TS_US.format("min(ts)")} AS session_start,
  {SQL_TS_US.format("max(ts)")} AS session_end,
  count(*) AS n_events
FROM sess GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


def q_stream_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME hourly-window aggregation run as a REAL Structured Streaming
    job: parquet file source → readStream → window agg (complete mode) →
    memory sink, availableNow trigger. The oracle is the identical batch
    SQL — streaming and batch must agree exactly (§2.8)."""
    import tempfile
    import uuid

    from ingestion_scripts_spark.sources.readers import read_events_stream

    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    name = "stream_hourly_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .select(
            _fmt_ts(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


SQL_STREAM_HOURLY = SQL_HOURLY


def q_stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once under at-least-once replay, as a REAL streaming job:
    every event is emitted TWICE into the stream (simulated broker
    redelivery), streaming ``dropDuplicates`` state collapses the replays,
    and the per-type counts must equal the plain batch counts — the §2.8
    delivery-semantics guarantee made oracle-checkable. (Unbounded keyed
    state is fine under availableNow; the long-running variant is
    ``dropDuplicatesWithinWatermark``.)"""
    import tempfile
    import uuid

    from ingestion_scripts_spark.sources.readers import read_events_stream

    stream = read_events_stream(spark, sf_dir)
    doubled = stream.select(
        "event_id", "event_type",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("__replay"),
    )
    dedup = doubled.dropDuplicates(["event_id"]).select("event_id", "event_type")
    name = "stream_dedup_" + uuid.uuid4().hex[:8]
    q = (
        dedup.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


SQL_STREAM_DEDUP = """
SELECT event_type, count(*) AS n FROM events GROUP BY event_type
ORDER BY event_type
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization, 30-minute inactivity gap."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap test (unix_micros ↔ DuckDB epoch_us) — second
    # truncation would disagree with the oracle on sub-second boundaries
    gap = F.when(
        F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
        > 1_800_000_000,
        1,
    ).otherwise(0)
    flagged = ev.select("user_id", "ts", "event_id", gap.alias("new_s"))
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_s").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            _fmt_ts(F.min("ts"), with_micros=True).alias("session_start"),
            _fmt_ts(F.max("ts"), with_micros=True).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


SQL_SESSIONIZE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events),
sess AS (
  SELECT user_id, ts,
    -- DuckDB windowed sum(int) is HUGEINT → float64 in pandas; Spark emits
    -- int64 — cast so the driver's value hash agrees (r1 hash mismatch)
    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged)
SELECT user_id, session_id,
  {SQL_TS_US.format("min(ts)")} AS session_start,
  {SQL_TS_US.format("max(ts)")} AS session_end,
  count(*) AS n_events
FROM sess GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# the reference's three pipeline topologies (SURVEY §3), driven end-to-end
# over record-shaped inputs synthesized deterministically from documents
# ---------------------------------------------------------------------------

#: deterministic per-doc timestamp: 2024-03-01T08:30:00Z + doc_id * 3671 s
_EPOCH0 = 1709281800


def _doc_ts(spark_side: bool = True):
    return F.timestamp_seconds(F.lit(_EPOCH0) + F.col("doc_id") * 3671)


_SQL_DOC_TS = (
    "(TIMESTAMP '2024-03-01 08:30:00' + to_seconds(doc_id * 3671))"
)


def q_twitter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Twitter topology end-to-end (src/twitter_consumer.py): sentiment N1 →
    demojize F3 (identity: no emoji lib) → hashtags F2 → zoned parse F10."""
    from ingestion_scripts_spark.plans.pipelines import twitter_pipeline

    docs = _t(spark, sf_dir, "documents")
    tweets = docs.select(
        F.col("doc_id").alias("tweet_id"),
        F.concat(F.lit("#"), F.col("source"), F.lit(" "), F.col("text")).alias("text"),
        F.concat(
            F.date_format(_doc_ts(), "yyyy-MM-dd HH:mm:ss"), F.lit("+00:00")
        ).alias("created_at"),
        F.col("lang").alias("trend"),
    )
    out = twitter_pipeline(tweets)
    return out.select(
        "tweet_id",
        F.col("sentiment.compound").alias("compound"),
        _arr_str(F.col("hashtags")).alias("hashtags"),
        _fmt_ts(F.col("created_at_ts")).alias("created_ts"),
    ).orderBy("tweet_id")


_TW_TEXT = "('#' || source || ' ' || text)"
_TW_SENT = O.sql_sentiment(_TW_TEXT)
SQL_TWITTER_PIPELINE = (
    f"SELECT doc_id AS tweet_id, {_TW_SENT['compound']} AS compound, "
    f"{SQL_ARR_STR(O.sql_hashtags(_TW_TEXT))} AS hashtags, "
    + SQL_TS.format(_SQL_DOC_TS)
    + " AS created_ts FROM documents ORDER BY tweet_id"
)


def q_reddit_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reddit topology end-to-end (src/reddit_consumer.py): N1 title
    sentiment + N2 per-comment sentiment → F3/F1 demojize+clean → F5/F6/A1/A2
    keywords → F9 date parse."""
    from ingestion_scripts_spark.plans.pipelines import reddit_pipeline

    docs = _t(spark, sf_dir, "documents")
    posts = docs.select(
        F.col("doc_id").alias("id"),
        F.col("source").alias("title"),
        F.array(F.struct(F.col("text").alias("text"))).alias("comments"),
        F.date_format(_doc_ts(), "yyyy-MM-dd HH:mm:ss").alias("created"),
    )
    out = reddit_pipeline(posts)
    return out.select(
        "id",
        F.col("sentiment.compound").alias("title_compound"),
        F.element_at("comments", 1)["sentiment"]["compound"].alias("c0_compound"),
        _arr_str(F.col("keywords")).alias("keywords"),
        _fmt_ts(F.col("created_ts")).alias("created_ts"),
    ).orderBy("id")


_RD_TITLE_SENT = O.sql_sentiment("source")
_RD_COMMENT_SENT = O.sql_sentiment("text")
SQL_REDDIT_PIPELINE = f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
big AS (SELECT doc_id, unnest({O.sql_bigrams('t')}) AS bigram FROM toks),
counted AS (SELECT doc_id, bigram, count(*) AS cnt FROM big GROUP BY doc_id, bigram),
ranked AS (SELECT doc_id, bigram,
           row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bigram ASC) AS rn
           FROM counted),
top AS (SELECT doc_id, list(bigram ORDER BY rn) AS bigs FROM ranked WHERE rn <= 5 GROUP BY doc_id),
flat AS (SELECT doc_id, flatten(list_transform(bigs, b -> string_split(b, ' '))) AS words FROM top),
kw AS (SELECT doc_id, list_filter(words, (w, i) -> list_position(words, w) = i) AS keywords FROM flat)
SELECT d.doc_id AS id,
  {_RD_TITLE_SENT['compound']} AS title_compound,
  {_RD_COMMENT_SENT['compound']} AS c0_compound,
  {SQL_ARR_STR('kw.keywords')} AS keywords,
  {SQL_TS.format(_SQL_DOC_TS.replace("doc_id", "d.doc_id"))} AS created_ts
FROM documents d LEFT JOIN kw ON d.doc_id = kw.doc_id
ORDER BY id
"""


def q_rss_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS topology end-to-end (src/rss_consumer.py): J1 anti-join dedup →
    P3 html/text routing → N3 keywords+summary (native substitutes) → P4
    summary backfill → F7/F8 date-branch normalization."""
    from ingestion_scripts_spark.plans.pipelines import rss_pipeline

    docs = _t(spark, sf_dir, "documents")
    ts = _doc_ts()
    feeds = docs.select(
        F.col("doc_id"),
        F.concat(F.lit("L"), F.col("doc_id")).alias("link"),
        F.col("source").alias("title"),
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>"))
        ).otherwise(F.col("text")).alias("content"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("<b>"), F.col("source"), F.lit(" digest</b>")),
        ).alias("summary"),
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.date_format(ts, "EEE, dd MMM yyyy HH:mm:ss"), F.lit(" +0000")))
        .otherwise(F.concat(F.date_format(ts, "EEE, dd MMM yyyy HH:mm:ss"), F.lit(" UTC")))
        .alias("published"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.array(
                F.year(ts), F.month(ts), F.dayofmonth(ts),
                F.hour(ts), F.minute(ts), F.second(ts),
                F.lit(0), F.lit(0), F.lit(0),
            ),
        ).alias("published_parsed"),
    )
    existing = feeds.filter(F.col("doc_id") % 7 == 0).select("link")
    # S4 — the per-record HTTP fetch, modeled offline as a join against a
    # pre-fetched (link, content) table (SURVEY §2.1 S4): every 11th doc
    # has a fetched body that overrides the feed's own content
    fetched = docs.filter(F.col("doc_id") % 11 == 0).select(
        F.concat(F.lit("L"), F.col("doc_id")).alias("link"),
        F.concat(F.lit("fetched "), F.col("text")).alias("content"),
    )
    out = rss_pipeline(feeds.drop("doc_id"), existing, fetched_content=fetched)
    return out.select(
        "link",
        _arr_str(F.col("tags")).alias("tags"),
        "summary",
        _fmt_ts(F.col("published_ts")).alias("published"),
    ).orderBy("link")


# The oracle reproduces the ENGINE's routing predicate (P3: strip HTML iff
# the post-fetch content matches '<[^>]+>', plans/pipelines.py:66-75) rather
# than mirroring the synthetic doc_id%3/%11 input arithmetic — any raw text
# containing an HTML-like tag routes identically on both engines.
SQL_RSS_PIPELINE = f"""
WITH feed AS (
  SELECT doc_id, 'L' || doc_id AS link, source,
    CASE WHEN doc_id % 11 = 0 THEN 'fetched ' || text
         WHEN doc_id % 3 = 0 THEN '<p>' || text || '</p>'
         ELSE text END AS content
  FROM documents WHERE doc_id % 7 <> 0),
routed AS (
  SELECT doc_id, link, source,
    CASE WHEN content IS NOT NULL AND content <> ''
              AND NOT regexp_matches(content, '<[^>]+>')
         THEN content ELSE {O.sql_html_strip('content')} END AS content
  FROM feed)
SELECT link,
  {SQL_ARR_STR(O.sql_keywords_native('content'))} AS tags,
  CASE WHEN doc_id % 2 = 0
       THEN {O.sql_html_strip("('<b>' || source || ' digest</b>')")}
       ELSE {O.sql_summary('content')} END AS summary,
  {SQL_TS.format(_SQL_DOC_TS)} AS published
FROM routed ORDER BY link
"""


# ---------------------------------------------------------------------------
# extension: multimodal plumbing (binary columns; decode stubbed — see
# operators/multimodal.py tests)
# ---------------------------------------------------------------------------

def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(blob).cast("bigint").alias("n_bytes"),
        X.hash64(F.col("text")).alias("content_hash"),
    ).orderBy("doc_id")


SQL_MULTIMODAL = (
    "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
    f"{O.sql_hash64('text')} AS content_hash FROM documents ORDER BY doc_id"
)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL multimodal path — binary payload → Arrow-batched mapInPandas
    decode (operators/multimodal.py) — differential-tested against SQL: the
    deterministic fake decoder derives features from md5 bytes, which the
    oracle recomputes. Features are mapped back to their exact byte values
    (int) so float32 Arrow transport cannot introduce rounding flips."""
    from ingestion_scripts_spark.operators.multimodal import (
        extract_features,
        text_to_media,
    )

    docs = _t(spark, sf_dir, "documents")
    media = text_to_media(docs)
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        "digest",
        _arr_str(
            F.transform(F.col("feature"), lambda x: F.round(x * 255).cast("int"))
        ).alias("feature_bytes"),
    ).orderBy("media_id")


SQL_MULTIMODAL_FEATURES = f"""
SELECT doc_id AS media_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS digest,
  {SQL_ARR_STR(
      "list_transform(range(0, 8),"
      " i -> CAST(('0x' || substr(md5(text), i*2 + 1, 2)) AS INT))"
  )} AS feature_bytes
FROM documents ORDER BY media_id
"""


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
    q = (
        enriched.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
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
    src = tempfile.mkdtemp(prefix="late_src_")
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
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
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
    src = tempfile.mkdtemp(prefix="ssj_src_")
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
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
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
    is exactly the unmatched set, with no duplicates from replay."""
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
    src = tempfile.mkdtemp(prefix="soj_src_")
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
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
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
    tmp = tempfile.mkdtemp(prefix="jsonl_src_")
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
    tmp = tempfile.mkdtemp(prefix="csv_src_")
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
    tmp = tempfile.mkdtemp(prefix="corrupt_src_")
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


def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window operator (dynamic-gap session merge
    inside the engine) pinned against the classic gaps-and-islands SQL —
    proves the built-in path and the manual construction (q_sessionize)
    agree on semantics, including the boundary rule: a gap of exactly the
    timeout starts a NEW session (session end is exclusive)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            _fmt_ts(F.col("w.start"), with_micros=True).alias("session_start"),
            _fmt_ts(F.col("w.end"), with_micros=True).alias("session_end"),
            "n",
        )
        .orderBy("user_id", "session_start")
    )


SQL_SESSION_WINDOW = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events),
sess AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged)
SELECT user_id,
       {SQL_TS_US.format('min(ts)')} AS session_start,
       {SQL_TS_US.format("max(ts) + INTERVAL 30 MINUTE")} AS session_end,
       count(*) AS n
FROM sess GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def q_session_window_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window with a DYNAMIC per-event gap (purchases hold
    a session open 45 min, everything else 15): each event extends its
    session to ts+gap and overlapping extents merge — checked against the
    gaps-and-islands construction with a RUNNING-MAX horizon (an island
    breaks only when the next event starts after max over all previous
    (ts_i + gap_i), which a plain lag-based gap rule gets wrong when a
    long-gap event is followed by short-gap ones)."""
    ev = _t(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", "45 minutes").otherwise(
        "15 minutes"
    )
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            _fmt_ts(F.col("w.start"), with_micros=True).alias("session_start"),
            _fmt_ts(F.col("w.end"), with_micros=True).alias("session_end"),
            "n",
        )
        .orderBy("user_id", "session_start")
    )


SQL_SESSION_DYNAMIC = f"""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN event_type = 'purchase' THEN 2700000000 ELSE 900000000 END
           AS gap_us
  FROM events),
flagged AS (
  SELECT user_id, ts, gap_us,
         CASE WHEN max(epoch_us(ts) + gap_us) OVER
                   (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              THEN 1
              WHEN epoch_us(ts) >= max(epoch_us(ts) + gap_us) OVER
                   (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_s
  FROM g),
sess AS (
  SELECT user_id, ts, gap_us,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged)
SELECT user_id,
       {SQL_TS_US.format('min(ts)')} AS session_start,
       {SQL_TS_US.format('make_timestamp(max(epoch_us(ts) + gap_us))')}
         AS session_end,
       count(*) AS n
FROM sess GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


# ---------------------------------------------------------------------------
# round-3 extensions: semantic dedup, CMS heavy hitters, chunking, rule
# gates, weighted sampling, per-source caps, ORC source
# ---------------------------------------------------------------------------

def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means the embedding space, then
    exact cosine near-dup removal WITHIN each cluster — the cluster
    assignment is the blocking key, so the quadratic pair step is bounded
    by cluster size and global all-pairs never materializes. Survivor =
    lowest vec_id of each dup group (dup_of = -1 for kept vectors).

    Composition of two verified primitives: ``kmeans_fit`` (narrow
    assignment + tiny keyed re-center shuffle) and ``blocked_cosine_pairs``
    (fold-exact, oracle-identical). At 100 TB the same plan holds — the
    cluster count scales with corpus size and each cluster fits a task."""
    from ingestion_scripts_spark.operators.clustering import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    _, assigned = kmeans_fit(emb, "embedding", "vec_id", k=8, iters=3)
    assigned = assigned.select(
        F.col("__id").alias("vec_id"), F.col("cluster_id").cast("bigint").alias("cluster_id"), "v"
    )
    # numpy gram-matrix kernel (engine default for cosine blocks — one BLAS
    # matmul per cluster); the oracle recomputes with the exact fold, and
    # pytest pins kernel-equality of the pair sets, so the dup verdicts are
    # hash-identical while running ~6x faster than per-pair HOF folds
    pairs = SIM.blocked_cosine_pairs_pandas(
        assigned, "cluster_id", id_col="vec_id", vec_col="v", threshold=0.35
    )
    dup_of = pairs.groupBy("id_b").agg(F.min("id_a").alias("__dup"))
    return (
        assigned.join(dup_of, assigned.vec_id == dup_of.id_b, "left")
        .select(
            "vec_id",
            "cluster_id",
            F.coalesce(F.col("__dup"), F.lit(-1)).cast("bigint").alias("dup_of"),
            F.col("__dup").isNull().cast("int").alias("kept"),
        )
        .orderBy("vec_id")
    )


def _sql_semdedup() -> str:
    cos = f"round({O.sql_dot('av.v', 'bv.v', 'len(av.v)')}, 6)"
    return f"""
WITH assign AS (SELECT vec_id, cluster_id FROM ({_sql_kmeans_base()}) base),
v0 AS (SELECT vec_id, embedding::DOUBLE[] AS r FROM embeddings),
vv AS (SELECT vec_id, list_transform(r, x -> x / {_SQL_NORM('r')}) AS v FROM v0),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assign a JOIN assign b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  JOIN vv av ON av.vec_id = a.vec_id
  JOIN vv bv ON bv.vec_id = b.vec_id
  WHERE {cos} >= 0.35),
d AS (SELECT id_b, min(id_a) AS dup_of FROM pairs GROUP BY 1)
SELECT a.vec_id, CAST(a.cluster_id AS BIGINT) AS cluster_id,
       CAST(coalesce(d.dup_of, -1) AS BIGINT) AS dup_of,
       CAST(CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS INTEGER) AS kept
FROM assign a LEFT JOIN d ON d.id_b = a.vec_id
ORDER BY vec_id
"""


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch (d=4 salted hash rows × w=256
    cells): the sketch is ≤ d·w rows per task after map-side partials —
    the scalable substitute for exact per-key counts when the key space is
    huge — then point-estimates for the distinct keys, top-20 by estimate.
    Estimates over-count on collisions (never under): both engines compute
    the identical cells, so the driver hash check is exact."""
    from ingestion_scripts_spark.operators.sketches import cms_estimate, cms_sketch

    ev = _t(spark, sf_dir, "events")
    sk = cms_sketch(ev, "user_id")
    keys = ev.select("user_id").distinct()
    return (
        cms_estimate(sk, keys, "user_id", out_col="est_count")
        .orderBy(F.col("est_count").desc(), F.col("user_id").asc())
        .limit(20)
    )


def _sql_cms_heavy_hitters() -> str:
    from ingestion_scripts_spark.operators.sketches import sql_cms_estimate

    inner = sql_cms_estimate("events", "user_id", out_col="est_count")
    return f"""
SELECT CAST(__k AS BIGINT) AS user_id, est_count
FROM ({inner})
ORDER BY est_count DESC, user_id ASC LIMIT 20
"""


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token windows every 48 —
    RAG / long-document training prep): a narrow posexplode whose fanout
    is the chunk count; no shuffle anywhere."""
    docs = _t(spark, sf_dir, "documents")
    return TA.chunk_tokens(docs, "doc_id", "text", size=64, stride=48).orderBy(
        "doc_id", "chunk_id"
    )


_SQL_DOC_CHUNKS = """
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
w AS (SELECT doc_id, toks,
             CAST(1 + ceil(greatest(len(toks) - 64, 0) / 48.0) AS BIGINT) AS n_win
      FROM t),
c AS (SELECT doc_id, toks, unnest(range(n_win)) AS chunk_id FROM w)
SELECT doc_id, chunk_id,
       CAST(len(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS BIGINT)
         AS n_chunk_tokens,
       array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')
         AS chunk_text
FROM c ORDER BY doc_id, chunk_id
"""


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule gate (Rae et al. 2021 heuristics): token-count
    bounds, mean-word-length band, symbol ratio, alpha-token fraction,
    required-stopword hits → one keep verdict per document. Pure scan-side
    narrow map — the cheap filter that runs BEFORE dedup in a curation
    DAG, so 100 TB never reaches the expensive stages unfiltered."""
    docs = _t(spark, sf_dir, "documents")
    g = TA.gopher_rules(F.col("text"))
    return docs.select(
        "doc_id",
        g["n_tokens"].alias("n_tokens"),
        g["mean_token_len"].alias("mean_token_len"),
        g["symbol_ratio"].alias("symbol_ratio"),
        g["alpha_frac"].alias("alpha_frac"),
        g["stop_hits"].alias("stop_hits"),
        g["keep"].alias("keep"),
    ).orderBy("doc_id")


def _sql_gopher_rules() -> str:
    g = O.sql_gopher("text")
    cols = ",\n  ".join(f"{expr} AS {name}" for name, expr in g.items())
    return f"SELECT doc_id,\n  {cols}\nFROM documents ORDER BY doc_id"


def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis exponential keys, hash-derived uniforms — no RNG state):
    50 documents weighted by length. Identical selection across engines,
    runs, and repartitionings; the top-k is a per-partition TakeOrdered
    merge, never a global sort."""
    docs = _t(spark, sf_dir, "documents")
    return TA.priority_sample(
        docs, "doc_id", F.greatest(F.col("n_chars"), F.lit(1)).cast("double"), k=50
    ).orderBy("es_key", "doc_id")


def _sql_priority_sample() -> str:
    u = f"(({O.sql_hash64('doc_id::VARCHAR')}) + 1.0) / {float(1 << 60)!r}"
    key = f"round(-ln({u}) / greatest(n_chars, 1)::DOUBLE, 9)"
    return f"""
SELECT doc_id, greatest(n_chars, 1)::DOUBLE AS w, {key} AS es_key
FROM documents
ORDER BY es_key ASC, doc_id ASC LIMIT 50
"""


def q_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document caps (CCNet/Gopher-style dominance control):
    keep at most 15 documents per source, best quality first (ties →
    lowest doc_id). One window shuffle keyed by source; at skewed scale
    the same cap runs as the salted two-phase top-k."""
    docs = _t(spark, sf_dir, "documents")
    q = TA.quality_score(F.col("text"))["quality"]
    w = Window.partitionBy("source").orderBy(F.col("__q").desc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source", q.alias("__q"))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 15)
        .select("source", "rnk", "doc_id", F.col("__q").alias("quality"))
        .orderBy("source", "rnk")
    )


def _sql_domain_caps() -> str:
    qual = O.sql_quality("text")["quality"]
    return f"""
WITH scored AS (
  SELECT doc_id, source, {qual} AS q FROM documents),
ranked AS (
  SELECT source, doc_id, q,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY q DESC, doc_id ASC) AS BIGINT) AS rnk
  FROM scored)
SELECT source, rnk, doc_id, q AS quality
FROM ranked WHERE rnk <= 15 ORDER BY source, rnk
"""


def q_stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 CUSTOM KEYED STATE (``applyInPandasWithState``), oracle-checked:
    events replay as two deterministic micro-batches (even then odd
    event_ids); the per-user counter state must survive the batch boundary,
    so each user's final ``running_total`` — the max across its per-batch
    emissions — must equal the plain batch COUNT(*). n_batches counts how
    many triggers emitted the key (proves keys seen in both batches carried
    state, not recomputed). State is one bigint per key, partitioned by the
    key shuffle, checkpointed — the arbitrary-state template at scale."""
    import glob
    import os
    import tempfile
    import time
    import uuid

    from ingestion_scripts_spark.sources.readers import load_table
    from ingestion_scripts_spark.streaming.streams import stateful_user_counts

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    src = tempfile.mkdtemp(prefix="state_src_")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b0")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b1")
    now = time.time()
    for i, d in enumerate(("b0", "b1")):
        for p in glob.glob(f"{src}/{d}/*.parquet"):
            os.utime(p, (now - 200 + 50 * i, now - 200 + 50 * i))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    counted = stateful_user_counts(stream, "user_id")
    name = "stream_state_" + uuid.uuid4().hex[:8]
    q = (
        counted.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("running_total").alias("total_events"),
            F.count(F.lit(1)).alias("n_batches"),
        )
        .orderBy("user_id")
    )


SQL_STREAM_STATEFUL = """
SELECT user_id, count(*) AS total_events,
       CAST(count(DISTINCT event_id % 2) AS BIGINT) AS n_batches
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_stream_wm_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with BOUNDED state (``dropDuplicatesWithinWatermark``
    — the production form of stream_dedup_counts: plain dropDuplicates
    keeps every key forever; the watermarked variant evicts keys once the
    watermark passes them, so state is O(delay window), the only form that
    survives an unbounded stream). Every event replayed twice in the same
    batch window → per-type counts must equal plain batch counts."""
    import tempfile
    import uuid

    from ingestion_scripts_spark.sources.readers import read_events_stream

    stream = read_events_stream(spark, sf_dir)
    doubled = stream.select(
        "event_id", "event_type", "ts",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("__replay"),
    ).drop("__replay")
    dedup = doubled.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    name = "wm_dedup_" + uuid.uuid4().hex[:8]
    q = (
        dedup.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT (user, item) interaction pairs by day —
    COUNT(DISTINCT) over a running window is unsupported/unscalable, so
    the engine uses the first-seen rewrite: per-entity min(day) (one keyed
    agg), daily new-entity counts, then a cumulative sum over the tiny
    per-day table. The standard coverage growth curve, shuffle-bounded by
    |entities| + |days|."""
    ev = _t(spark, sf_dir, "events")
    pair = ev.select(
        F.concat_ws(
            ":",
            F.col("user_id"),
            # explicit NULL→'' so the key law matches the oracle even for
            # malformed props (concat_ws would silently SKIP a null segment;
            # the oracle's || would NULL the whole key — neither is wanted)
            F.coalesce(F.get_json_object("props", "$.k"), F.lit("")),
        ).alias("ent"),
        F.to_date("ts").alias("day"),
    )
    first_seen = pair.groupBy("ent").agg(F.min("day").alias("first_day"))
    daily = first_seen.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    wc = Window.orderBy("first_day").rowsBetween(Window.unboundedPreceding, 0)
    # cumulative window runs over the per-DAY table (bounded by calendar
    # days, not corpus size) — single partition is fine by construction
    return (
        daily.withColumn("cum_users", F.sum("new_users").over(wc))
        .select(
            F.date_format("first_day", "yyyy-MM-dd").alias("day"),
            "new_users",
            "cum_users",
        )
        .orderBy("day")
    )


SQL_CUMULATIVE_USERS = """
WITH fs AS (
  SELECT user_id || ':' || coalesce(json_extract_string(props, '$.k'), '') AS ent,
         min(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY 1),
daily AS (SELECT first_day, count(*) AS new_users FROM fs GROUP BY 1)
SELECT strftime(first_day, '%Y-%m-%d') AS day, new_users,
       CAST(sum(new_users) OVER (ORDER BY first_day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_users
FROM daily ORDER BY day
"""


def q_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session first-touch attribution: sessionize per user (30-min gaps,
    gaps-and-islands), then attribute every purchase to the FIRST click of
    its session (-1 if the session has no click). One window pass for the
    session ids + one min-over-(user, session) — the analytics twin of the
    asof join (nearest-click) with different, session-scoped semantics."""
    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(wu))
    new_s = F.when(gap > 1_800_000_000, 1).otherwise(0)
    sess = ev.withColumn(
        "sid",
        F.sum(F.when(F.lag("ts").over(wu).isNull(), 0).otherwise(new_s)).over(
            wu.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ws = Window.partitionBy("user_id", "sid")
    first_click = F.min(
        F.when(
            F.col("event_type") == "click",
            F.struct(F.col("ts"), F.col("event_id")),
        )
    ).over(ws)
    return (
        sess.withColumn("fc", first_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.coalesce(F.col("fc.event_id"), F.lit(-1)).alias("attributed_click_id"),
        )
        .orderBy("purchase_id")
    )


SQL_FIRST_TOUCH = """
WITH flagged AS (
  SELECT event_id, ts, user_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL THEN 0
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
              ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged),
fc AS (
  SELECT *, min(CASE WHEN event_type = 'click'
                     THEN struct_pack(ts := ts, event_id := event_id) END)
              OVER (PARTITION BY user_id, sid) AS first_click
  FROM sess)
SELECT event_id AS purchase_id,
       CAST(coalesce(first_click.event_id, -1) AS BIGINT)
         AS attributed_click_id
FROM fc WHERE event_type = 'purchase' ORDER BY purchase_id
"""


def q_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICTLY-ORDERED conversion funnel (view → click → purchase inside
    a 30-min session): each later step must occur AFTER the session's
    first qualifying earlier step, not merely co-occur — the product
    analytics query that naive type-count funnels get wrong. Three window
    passes over one (user, session) partitioning (the exchange is reused;
    stage N's conditional min references stage N-1's window result), then
    a per-user rollup."""
    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(wu))
    sess = ev.withColumn(
        "sid",
        F.sum(F.when(gap > 1_800_000_000, 1).otherwise(0)).over(
            wu.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ws = Window.partitionBy("user_id", "sid")
    s1 = sess.withColumn(
        "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(ws)
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(ws),
    )
    s3 = s2.withColumn(
        "t_purch",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(ws),
    )
    per_session = s3.groupBy("user_id", "sid").agg(
        F.max(F.col("t_view").isNotNull().cast("int")).alias("r1"),
        F.max(F.col("t_click").isNotNull().cast("int")).alias("r2"),
        F.max(F.col("t_purch").isNotNull().cast("int")).alias("r3"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("r1").cast("bigint").alias("n_viewed"),
            F.sum("r2").cast("bigint").alias("n_clicked_after_view"),
            F.sum("r3").cast("bigint").alias("n_converted"),
        )
        .orderBy("user_id")
    )


SQL_SESSION_FUNNEL = """
WITH flagged AS (
  SELECT event_id, ts, user_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000 THEN 1 ELSE 0 END AS new_s
  FROM events),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged),
s1 AS (
  SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
              OVER (PARTITION BY user_id, sid) AS t_view
  FROM sess),
s2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
              OVER (PARTITION BY user_id, sid) AS t_click
  FROM s1),
s3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
              OVER (PARTITION BY user_id, sid) AS t_purch
  FROM s2),
per_session AS (
  SELECT user_id, sid,
         max(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS r1,
         max(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS r2,
         max(CASE WHEN t_purch IS NOT NULL THEN 1 ELSE 0 END) AS r3
  FROM s3 GROUP BY 1, 2)
SELECT user_id, count(*) AS n_sessions,
       CAST(sum(r1) AS BIGINT) AS n_viewed,
       CAST(sum(r2) AS BIGINT) AS n_clicked_after_view,
       CAST(sum(r3) AS BIGINT) AS n_converted
FROM per_session GROUP BY 1 ORDER BY user_id
"""


def q_stream_idempotent_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 (keyed idempotent sink) END-TO-END under replay, oracle-checked:
    a two-batch stream where batch 1 = even event_ids and batch 2 = ALL
    events (simulated at-least-once redelivery of the whole first batch);
    the foreachBatch writer anti-joins each batch against the sink's
    existing keys before appending, so the sink must hold every event
    EXACTLY once — per-type counts equal the plain batch counts. This is
    the reference's Mongo-unique-index upgrade (at-least-once →
    effectively-once) as files + anti-join."""
    import glob
    import os
    import tempfile
    import time

    from ingestion_scripts_spark.operators.sink import make_foreach_batch_writer
    from ingestion_scripts_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    src = tempfile.mkdtemp(prefix="idem_src_")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b0")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{src}/b1")
    now = time.time()
    for i, d in enumerate(("b0", "b1")):
        for p in glob.glob(f"{src}/{d}/*.parquet"):
            os.utime(p, (now - 200 + 50 * i, now - 200 + 50 * i))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    sink = tempfile.mkdtemp(prefix="idem_sink_") + "/out"
    q = (
        stream.writeStream.foreachBatch(
            make_foreach_batch_writer(sink, ["event_id"], audit=False)
        )
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(sink)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


SQL_STREAM_IDEMPOTENT = """
SELECT event_type, count(*) AS n FROM events
GROUP BY 1 ORDER BY event_type
"""


def q_stream_fanout_sinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-sink fanout in ONE streaming pass (the bronze + quarantine
    split every production ingest runs): foreachBatch routes each
    micro-batch through the K4 dead-letter split and writes BOTH sinks —
    the batch is persisted inside the callback so the two writes share
    one computation of the routing predicate instead of re-reading the
    source per sink. Result = per-sink/type counts read back from the
    parquet, checked against the equivalent conditional aggregation."""
    import tempfile

    from ingestion_scripts_spark.operators.sink import dead_letter_split
    from ingestion_scripts_spark.sources.readers import read_events_stream

    stream = read_events_stream(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="fanout_")
    good_path, dead_path = f"{base}/bronze", f"{base}/quarantine"
    ok = F.col("value").isNotNull() & (F.col("value") >= 1.0)

    def route(batch_df, batch_id):
        batch_df = batch_df.persist()
        good, dead = dead_letter_split(batch_df, ok)
        good.write.mode("append").parquet(good_path)
        dead.select("event_id", "event_type", "value").write.mode(
            "append"
        ).parquet(dead_path)
        batch_df.unpersist()

    q = (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    g = (
        spark.read.parquet(good_path)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("sink", F.lit("bronze"))
    )
    d = (
        spark.read.parquet(dead_path)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("sink", F.lit("quarantine"))
    )
    return g.unionByName(d).select("sink", "event_type", "n").orderBy(
        "sink", "event_type"
    )


SQL_STREAM_FANOUT = """
SELECT CASE WHEN value IS NOT NULL AND value >= 1.0
            THEN 'bronze' ELSE 'quarantine' END AS sink,
       event_type, count(*) AS n
FROM events GROUP BY 1, 2 ORDER BY sink, event_type
"""


def q_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-gate for sink dedup (K3/J1 at scale): the
    already-ingested ledger (BUILDING-segment customers) is compressed to a
    ceil(4096/60)-row word table via bit_or partial aggregation and
    BROADCAST; each candidate user then gets a zero-shuffle maybe_in
    verdict. actual_in (exact semi-join) sits beside it, so the output
    exposes the false positives — which are IDENTICAL cross-engine because
    the oracle computes the same salted md5 bit positions. No false
    negatives by construction (pytest-pinned)."""
    from ingestion_scripts_spark.operators.dedup import (
        bloom_build,
        bloom_maybe_contains,
    )

    cust = _t(spark, sf_dir, "customer")
    ev = _t(spark, sf_dir, "events")
    ledger = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("key")
    ).distinct()
    bloom = bloom_build(ledger, "key")
    users = ev.select("user_id").distinct()
    gated = bloom_maybe_contains(users, bloom, "user_id")
    actual = users.join(
        ledger, users.user_id == ledger.key, "left"
    ).select("user_id", F.col("key").isNotNull().cast("int").alias("actual_in"))
    return gated.join(actual, "user_id").orderBy("user_id")


def _sql_bloom_gate() -> str:
    from ingestion_scripts_spark.operators.dedup import sql_bloom_gate

    inner = sql_bloom_gate(
        "SELECT DISTINCT c_custkey::VARCHAR AS __k FROM customer"
        " WHERE c_mktsegment = 'BUILDING'",
        "SELECT DISTINCT user_id::VARCHAR AS __k FROM events",
        "user_id",
    )
    return f"""
WITH g AS ({inner}),
l AS (SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT CAST(g.user_id AS BIGINT) AS user_id, g.maybe_in,
       CAST(CASE WHEN l.c_custkey IS NULL THEN 0 ELSE 1 END AS INTEGER) AS actual_in
FROM g LEFT JOIN l ON l.c_custkey = CAST(g.user_id AS BIGINT)
ORDER BY user_id
"""


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-promo audit): customers in a nation set
    whose balance beats the average positive balance of that set AND who
    have placed no order since 2000 — a scalar-aggregate subquery + NOT EXISTS in one
    query, both decorrelated by Catalyst (the scalar avg becomes a 1-row
    broadcast, the NOT EXISTS a left-anti join — no per-row subplan
    execution anywhere)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("cust_q22")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("ord_q22")
    return spark.sql(
        """
        SELECT c.c_nationkey AS nation, count(*) AS n_cust,
               CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS total_bal
        FROM cust_q22 c
        WHERE c.c_nationkey IN (0, 3, 7, 11, 19)
          AND c.c_acctbal > (
            SELECT avg(c2.c_acctbal) FROM cust_q22 c2
            WHERE c2.c_acctbal > 0.0
              AND c2.c_nationkey IN (0, 3, 7, 11, 19))
          AND NOT EXISTS (
            SELECT 1 FROM ord_q22 o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= DATE '2000-01-01')
        GROUP BY c.c_nationkey ORDER BY nation
        """
    )


SQL_IDLE_RICH = """
SELECT c.c_nationkey AS nation, count(*) AS n_cust,
       CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS total_bal
FROM customer c
WHERE c.c_nationkey IN (0, 3, 7, 11, 19)
  AND c.c_acctbal > (
    SELECT avg(c2.c_acctbal) FROM customer c2
    WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey IN (0, 3, 7, 11, 19))
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= DATE '2000-01-01')
GROUP BY c.c_nationkey ORDER BY nation
"""


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler (the data-quality monitor every ingest
    pipeline schedules): unpivot the numeric columns via ``stack`` into
    (column, value) rows, then a single keyed aggregate computes count /
    nulls / exact distinct / min / max / mean per column. ONE scan + one
    shuffle keyed by column name regardless of how many columns are
    profiled — per-column sequential jobs would rescan the table N times."""
    li = _t(spark, sf_dir, "lineitem").select(*_PROFILE_COLS)
    n = len(_PROFILE_COLS)
    pairs = ", ".join(f"'{c}', `{c}`" for c in _PROFILE_COLS)
    long = li.select(F.expr(f"stack({n}, {pairs}) AS (col, val)"))
    return (
        long.groupBy("col")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("val").isNull().cast("bigint")).alias("n_null"),
            F.countDistinct("val").alias("n_distinct"),
            F.round(F.min("val"), 6).alias("min_val"),
            F.round(F.max("val"), 6).alias("max_val"),
            TA.r4(F.avg("val")).alias("mean_val"),
        )
        .orderBy("col")
    )


def _sql_column_profile() -> str:
    arms = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col, {c} AS val FROM lineitem" for c in _PROFILE_COLS
    )
    return f"""
WITH long AS ({arms})
SELECT col, count(*) AS n_rows,
       CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
       round(min(val), 6) AS min_val, round(max(val), 6) AS max_val,
       {O.sql_r4('avg(val)')} AS mean_val
FROM long GROUP BY col ORDER BY col
"""


def q_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped CORRELATED SCALAR SUBQUERY (through spark.sql):
    for each part in a brand, the supplier rows achieving that part's
    minimum extended price. Catalyst decorrelates the subquery into an
    aggregate + join — pinned here because hand-rolled decorrelation is
    exactly what an engine must NOT require at 100 TB; the oracle runs the
    same correlated form through DuckDB's own decorrelator."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_q2")
    _t(spark, sf_dir, "part").createOrReplaceTempView("part_q2")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("supp_q2")
    return spark.sql(
        """
        SELECT p.p_partkey, s.s_name, round(l.l_extendedprice, 2) AS price
        FROM li_q2 l
        JOIN part_q2 p ON p.p_partkey = l.l_partkey
        JOIN supp_q2 s ON s.s_suppkey = l.l_suppkey
        WHERE p.p_brand = 'Brand#11'
          AND l.l_extendedprice = (
            SELECT min(l2.l_extendedprice) FROM li_q2 l2
            WHERE l2.l_partkey = l.l_partkey)
        ORDER BY p.p_partkey, s.s_name
        """
    )


SQL_MIN_PRICE_SUPPLIER = """
SELECT p.p_partkey, s.s_name, round(l.l_extendedprice, 2) AS price
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_brand = 'Brand#11'
  AND l.l_extendedprice = (
    SELECT min(l2.l_extendedprice) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)
ORDER BY p.p_partkey, s.s_name
"""


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the letter distribution per document — the
    classic gibberish/boilerplate detector (low entropy = repeated
    characters/template spam, high = random noise). explode → (doc, char)
    count → per-doc -Σ p·ln p: narrow map + one keyed shuffle of (doc,
    26)-bounded rows; flags docs outside the [2.0, 4.8] nat band."""
    docs = _t(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z])"), 1)).alias(
            "ch"
        ),
    )
    per = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = Window.partitionBy("doc_id")
    p = F.col("c") / F.sum("c").over(tot)
    return (
        per.withColumn("__plp", -p * F.log(p))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_letters"),
            TA.r4(F.sum("__plp")).alias("entropy"),
        )
        .withColumn(
            "flagged",
            ((F.col("entropy") < 2.0) | (F.col("entropy") > 4.8)).cast("int"),
        )
        .orderBy("doc_id")
    )


SQL_CHAR_ENTROPY = """
WITH chars AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '([a-z])', 1)) AS ch
  FROM documents),
per AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2),
withp AS (
  SELECT doc_id, c,
         -(c / sum(c) OVER (PARTITION BY doc_id))
           * ln(c / sum(c) OVER (PARTITION BY doc_id)) AS plp
  FROM per),
ent AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_letters,
         floor(sum(plp) * 10000.0 + 0.5) / 10000.0 AS entropy
  FROM withp GROUP BY 1)
SELECT doc_id, n_letters, entropy,
       CAST(CASE WHEN entropy < 2.0 OR entropy > 4.8 THEN 1 ELSE 0 END
            AS INTEGER) AS flagged
FROM ent ORDER BY doc_id
"""


_PPL_V = 1000  #: unigram LM vocab size (top-V by count, deterministic tiebreak)


def q_unigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality bucketing: train an add-one-smoothed unigram
    LM on the corpus itself (top-{V} vocab by frequency, everything else
    OOV), score each document by mean negative log-likelihood, then split
    into per-language NLL terciles (head/middle/tail) — the classic
    perplexity-bucket filter before LLM training.

    Scale shape: token counts are one keyed groupBy with partials; the
    vocab table is O(V) and broadcasts into the scoring join, so no token
    ever shuffles for the lookup; the tercile rank is a window PARTITIONED
    BY lang (never a single global window). Bucket = floor((rn-1)*3/cnt),
    identical arithmetic in the oracle (ntile remainder policies differ
    between engines, the floor form doesn't)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", X.tokenize_ws(X.clean_text(F.col("text"))).alias("t")
    )
    tok = toks.select("doc_id", "lang", F.explode("t").alias("w"))
    counts = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    # top-V as orderBy+limit = TakeOrdered (per-partition top-V, k-row
    # merge) — a global row_number window would drag every distinct token
    # through one partition
    vocab = counts.orderBy(F.col("c").desc(), F.col("w").asc()).limit(_PPL_V)
    # fully lazy: the corpus token count joins in as a broadcast 1-row
    # aggregate (the oracle's n CTE) — no job fires at query-build time.
    # bigint + int literals promote the divide to double, identical to the
    # oracle's (n_total + V + 1) denominator.
    n = tok.agg(F.count(F.lit(1)).alias("__n_total"))
    scored = (
        tok.join(F.broadcast(vocab), "w", "left")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "__lp",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                / (F.col("__n_total") + F.lit(_PPL_V + 1))
            ),
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            TA.r4(-F.sum("__lp") / F.count(F.lit(1))).alias("nll"),
        )
    )
    wl = Window.partitionBy("lang").orderBy(F.col("nll").asc(), F.col("doc_id").asc())
    cnt = Window.partitionBy("lang")
    return (
        scored.withColumn("__rn", F.row_number().over(wl))
        .withColumn(
            "bucket",
            (F.floor((F.col("__rn") - 1) * 3 / F.count(F.lit(1)).over(cnt)) + 1).cast(
                "int"
            ),
        )
        .select("doc_id", "lang", "n_toks", "nll", "bucket")
        .orderBy("doc_id")
    )


def _sql_unigram_ppl() -> str:
    toks = O.sql_tokenize_ws(O.sql_clean_text("text"))
    return f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({toks}) AS w FROM documents),
counts AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
vocab AS (
  SELECT w, c FROM (
    SELECT w, c, row_number() OVER (ORDER BY c DESC, w ASC) AS rnk FROM counts)
  WHERE rnk <= {_PPL_V}),
n AS (SELECT count(*) AS n_total FROM tok),
scored AS (
  SELECT t.doc_id, t.lang, count(*) AS n_toks,
         floor((-sum(ln((coalesce(v.c, 0) + 1.0) / (n.n_total + {_PPL_V} + 1)))
                / count(*)) * 10000.0 + 0.5) / 10000.0 AS nll
  FROM tok t LEFT JOIN vocab v USING (w), n
  GROUP BY 1, 2),
ranked AS (
  SELECT doc_id, lang, n_toks, nll,
         row_number() OVER (PARTITION BY lang ORDER BY nll ASC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY lang) AS cnt
  FROM scored)
SELECT doc_id, lang, n_toks,
       nll, CAST(floor((rn - 1) * 3 / cnt) + 1 AS INTEGER) AS bucket
FROM ranked ORDER BY doc_id
"""


_HQ_BINS = 64
_HQ_PS = (0.5, 0.9, 0.99)


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles WITHOUT a global sort: fixed-width 64-bin
    histogram per event_type (two cheap keyed aggregations — min/max/count,
    then bin counts), cumulative over the 64-row-per-group histogram, and
    the quantile estimate is the lower edge of the first bin whose
    cumulative count reaches ceil(p·n). This is the sketch-shaped quantile
    for 100 TB dashboards (exact `percentile` — see value_percentiles —
    sorts every group); error is bounded by one bin width. All arithmetic
    is shared-IEEE (sub/div/floor), so both engines pick identical bins."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(_HQ_BINS))
    b = F.when(
        F.col("mx") > F.col("mn"),
        F.least(F.lit(_HQ_BINS - 1), F.floor((F.col("value") - F.col("mn")) / width)),
    ).otherwise(F.lit(0)).cast("bigint")
    counts = (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_type", b.alias("b"))
        .groupBy("event_type", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.withColumn("cum", F.sum("c").over(wc))
    probes = cum.join(F.broadcast(stats), "event_type").select(
        "event_type", "b", "cum", "mn", "mx", "n",
        F.explode(F.array(*[F.lit(p) for p in _HQ_PS])).alias("p"),
    )
    hit = probes.filter(F.col("cum") >= F.ceil(F.col("p") * F.col("n")))
    return (
        hit.groupBy("event_type", "p", "mn", "mx", "n")
        .agg(F.min("b").alias("b"))
        .select(
            "event_type",
            "p",
            TA.r4(
                F.col("mn")
                + F.col("b") * ((F.col("mx") - F.col("mn")) / F.lit(float(_HQ_BINS)))
            ).alias("est"),
            "n",
        )
        .orderBy("event_type", "p")
    )


def _sql_hist_quantiles() -> str:
    ps = ", ".join(f"({p!r})" for p in _HQ_PS)
    return f"""
WITH stats AS (
  SELECT event_type, min(value) AS mn, max(value) AS mx, count(*) AS n
  FROM events GROUP BY 1),
binned AS (
  SELECT e.event_type,
         CAST(CASE WHEN s.mx > s.mn
              THEN least({_HQ_BINS - 1},
                         floor((e.value - s.mn) / ((s.mx - s.mn) / {float(_HQ_BINS)!r})))
              ELSE 0 END AS BIGINT) AS b
  FROM events e JOIN stats s USING (event_type)),
counts AS (SELECT event_type, b, count(*) AS c FROM binned GROUP BY 1, 2),
cum AS (
  SELECT event_type, b,
         sum(c) OVER (PARTITION BY event_type ORDER BY b
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM counts),
hit AS (
  SELECT c.event_type, p.p, s.mn, s.mx, s.n, min(c.b) AS b
  FROM cum c JOIN stats s USING (event_type),
       (VALUES {ps}) p(p)
  WHERE c.cum >= ceil(p.p * s.n)
  GROUP BY 1, 2, 3, 4, 5)
SELECT event_type, p,
       {O.sql_r4(f"mn + b * ((mx - mn) / {float(_HQ_BINS)!r})")} AS est, n
FROM hit ORDER BY event_type, p
"""


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) by salted doc-id hash
    — reproducible across runs/partitionings (df.randomSplit is neither),
    disjoint and exhaustive by construction. Output: per (lang, split)
    counts — the sanity table every dataset card ships."""
    docs = _t(spark, sf_dir, "documents")
    h = X.hash64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(h < 80, F.lit("train")).when(h < 90, F.lit("val")).otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "split")
    )


def _sql_dataset_split() -> str:
    h = f"{O.sql_hash64(chr(39) + 'split:' + chr(39) + ' || doc_id')} % 100"
    return f"""
SELECT lang,
       CASE WHEN {h} < 80 THEN 'train' WHEN {h} < 90 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs
FROM documents GROUP BY 1, 2 ORDER BY lang, split
"""


def q_rolling_7d_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-TIME rolling aggregate: per user, the sum/count of purchase
    value over the trailing 7 DAYS (RANGE frame over unix seconds, not a
    row count — irregular event spacing makes ROWS frames wrong). One
    keyed window shuffle; the range frame is evaluated with a sliding
    two-pointer inside each partition — linear, not quadratic, at scale."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-7 * 86400, 0)
    )
    return (
        ev.select(
            "user_id",
            _fmt_ts(F.col("ts"), with_micros=True).alias("ts"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")).over(w), 4)
            .cast("double")
            .alias("roll_value"),
            F.count(F.lit(1)).over(w).alias("roll_n"),
        )
        .orderBy("user_id", "ts")
    )


SQL_ROLLING_7D = f"""
SELECT user_id, {SQL_TS_US.format('ts')} AS ts,
       round(sum(CAST(value AS DECIMAL(18,4))) OVER w, 4)::DOUBLE AS roll_value,
       count(*) OVER w AS roll_n
FROM events WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts
"""


def q_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout round-trip: documents written
    ``partitionBy(lang)``, read back with a partition filter — the
    directory pruning that makes per-language jobs touch 1/N of a 100 TB
    corpus (pytest asserts the file-level pruning; here the oracle pins
    the content equality of one pruned partition).

    Write shape: keyed ``repartition(lang)`` INTO ``partitionBy(lang)`` —
    each writer task owns whole partition directories, so the file count
    stays one-per-partition instead of tasks×partitions small files at
    scale. The reader's round-robin spread is bypassed (spread=False): a
    placement exchange immediately before a keyed exchange is a pure
    double-shuffle (r3's 1.7× regression on this query; keyed-only
    measured 0.41 s vs 0.93 s at sf0.1)."""
    import tempfile

    from ingestion_scripts_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents", spread=False)
    tmp = tempfile.mkdtemp(prefix="part_sink_")
    docs.repartition("lang").write.mode("overwrite").partitionBy("lang").parquet(tmp)
    back = spark.read.parquet(tmp).filter(F.col("lang") == "en")
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("total_len"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


SQL_PARTITIONED_SINK = """
SELECT source, count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_len,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM documents WHERE lang = 'en' GROUP BY 1 ORDER BY source
"""


def q_bigram_backoff_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM with STUPID BACKOFF (Brants et al. 2007) scoring, the
    n-gram step past unigram_ppl: counts come from the TRAIN split only
    (the dataset_split hash rule), all documents are scored — held-out
    docs hit unseen bigrams, so the backoff path (alpha=0.4 times the
    add-one unigram) genuinely executes. score(w_i|w_{i-1}) =
    c(bi)/c(w_{i-1}) when the bigram was seen, else 0.4 * (c(w_i)+1) /
    (N+V+1); first token scores as unigram. Per-doc mean NLL, r4.

    Scale shape: two keyed count aggregations (partials), one shuffle
    join of doc bigrams to the bigram table on a 64-bit key, unigram
    table joins twice. No driver state at all."""
    docs = _t(spark, sf_dir, "documents")
    h = X.hash64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    toks = docs.select(
        "doc_id", (h < 80).alias("is_train"),
        X.tokenize_ws(X.clean_text(F.col("text"))).alias("t"),
    )
    tok = toks.select(
        "doc_id", "is_train", F.posexplode("t").alias("pos", "w")
    ).withColumn("w_prev", F.lag("w").over(
        Window.partitionBy("doc_id").orderBy("pos")
    ))
    train = tok.filter(F.col("is_train"))
    uni = train.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    bi = (
        train.filter(F.col("w_prev").isNotNull())
        .groupBy("w_prev", "w")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    # fully lazy: N and V join in as broadcast 1-row aggregates (the
    # oracle's n/v CTEs) — no job fires at query-build time. bigint + 1
    # promotes the divide to double, same value as the old Python-float
    # denominator (integer-exact inputs).
    nv = train.agg(F.count(F.lit(1)).alias("__n_total")).crossJoin(
        uni.agg(F.count(F.lit(1)).alias("__vv"))
    )
    scored = (
        tok.join(uni.withColumnRenamed("cu", "cu_w"), "w", "left")
        .join(
            uni.select(F.col("w").alias("w_prev"), F.col("cu").alias("cu_prev")),
            "w_prev",
            "left",
        )
        .join(bi, ["w_prev", "w"], "left")
        .crossJoin(F.broadcast(nv))
        .withColumn(
            "__lp",
            F.when(
                F.col("w_prev").isNotNull() & F.col("cb").isNotNull(),
                F.log(F.col("cb") / F.col("cu_prev")),
            ).otherwise(
                F.when(F.col("w_prev").isNotNull(), F.log(F.lit(0.4))).otherwise(
                    F.lit(0.0)
                )
                + F.log(
                    (F.coalesce(F.col("cu_w"), F.lit(0)) + 1.0)
                    / (F.col("__n_total") + F.col("__vv") + F.lit(1))
                )
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            TA.r4(-F.sum("__lp") / F.count(F.lit(1))).alias("nll"),
        )
    )
    return scored.orderBy("doc_id")


def _sql_bigram_backoff() -> str:
    toks = O.sql_tokenize_ws(O.sql_clean_text("text"))
    h = f"{O.sql_hash64(chr(39) + 'split:' + chr(39) + ' || doc_id')} % 100"
    return f"""
WITH base AS (SELECT doc_id, {toks} AS tk FROM documents),
ex AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk) + 1),
                i -> struct_pack(pos := i, w := tk[i]))) AS u
  FROM base),
tok AS (
  SELECT doc_id, ({h}) < 80 AS is_train, u.pos AS pos, u.w AS w,
         lag(u.w) OVER (PARTITION BY doc_id ORDER BY u.pos) AS w_prev
  FROM ex),
train AS (SELECT * FROM tok WHERE is_train),
uni AS (SELECT w, count(*) AS cu FROM train GROUP BY 1),
bi AS (SELECT w_prev, w, count(*) AS cb FROM train
       WHERE w_prev IS NOT NULL GROUP BY 1, 2),
n AS (SELECT count(*) AS n_total FROM train),
v AS (SELECT count(*) AS vv FROM uni),
scored AS (
  SELECT t.doc_id,
         CASE WHEN t.w_prev IS NOT NULL AND b.cb IS NOT NULL
              THEN ln(b.cb / up.cu)
              ELSE (CASE WHEN t.w_prev IS NOT NULL THEN ln(0.4) ELSE 0.0 END)
                   + ln((coalesce(uw.cu, 0) + 1.0) / (n.n_total + v.vv + 1))
         END AS lp
  FROM tok t
  LEFT JOIN uni uw ON uw.w = t.w
  LEFT JOIN uni up ON up.w = t.w_prev
  LEFT JOIN bi b ON b.w_prev = t.w_prev AND b.w = t.w, n, v)
SELECT doc_id, count(*) AS n_toks,
       floor((-sum(lp) / count(*)) * 10000.0 + 0.5) / 10000.0 AS nll
FROM scored GROUP BY 1 ORDER BY doc_id
"""


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (Sennrich et al. 2016) as a Spark driver
    loop: 8 merge rounds over the cached word-frequency vocab (never the
    corpus), each round = narrow pair-explode + tiny keyed count + 1-row
    argmax collect. The DuckDB oracle re-derives every round from scratch
    — the merge TABLE, the artifact a tokenizer ships, is what's
    differential-tested. See operators/bpe.py for the scale argument."""
    from ingestion_scripts_spark.operators.bpe import bpe_fit

    docs = _t(spark, sf_dir, "documents")
    return bpe_fit(spark, docs, "text", n_merges=8).orderBy("rank")


def _sql_bpe_merges() -> str:
    from ingestion_scripts_spark.operators.bpe import sql_bpe_merges

    return sql_bpe_merges(n_merges=8)


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE APPLY step: tokenize the corpus with the merges learned by
    bpe_merges — per document, word count and symbol count under the
    trained tokenizer (the token-accounting pass that prices a corpus for
    training). The word→symbol-count mapping is vocab-sized and joins
    back to the exploded corpus; the oracle re-derives the merges AND the
    mapping from scratch in SQL and must land on identical counts."""
    from ingestion_scripts_spark.operators.bpe import bpe_apply

    docs = _t(spark, sf_dir, "documents")
    return bpe_apply(spark, docs, "text", "doc_id", n_merges=8).orderBy("doc_id")


def _sql_bpe_tokenize() -> str:
    from ingestion_scripts_spark.operators.bpe import sql_bpe_apply

    return sql_bpe_apply(n_merges=8)


def q_orc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 on an ORC source: documents round-tripped through ORC (Spark's
    built-in columnar alternative to parquet) with an explicit schema on
    re-read, then aggregated per (lang, source). The oracle reads the
    parquet directly — the round-trip must be lossless."""
    import tempfile

    docs = _t(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="orc_src_")
    docs.select("doc_id", "text", "lang", "source", "n_chars").coalesce(
        4
    ).write.mode("overwrite").orc(tmp)
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    back = spark.read.schema(schema).orc(tmp)
    return (
        back.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.length("text")).alias("total_text_len"),
        )
        .orderBy("lang", "source")
    )


SQL_ORC_SOURCE = """
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(length(text)) AS BIGINT) AS total_text_len
FROM documents GROUP BY 1, 2 ORDER BY lang, source
"""


# ---------------------------------------------------------------------------
# r3 additions (registry position 51+ this round; enter the driver window in
# r4 per the ROADMAP bookkeeping rule)
# ---------------------------------------------------------------------------

def q_dedup_best_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-ranked exact dedup: among byte-identical documents keep the
    HIGHEST-quality copy (then lowest doc_id), not an arbitrary one — the
    survivor policy a web-curation pipeline actually wants when the same
    page was captured several times with different boilerplate. One keyed
    window over the text hash; no join, no all-pairs."""
    docs = _t(spark, sf_dir, "documents")
    q = TA.quality_score(F.col("text"))
    scored = docs.select(
        "doc_id",
        "lang",
        "source",
        X.hash64(F.col("text")).alias("__h"),
        q["quality"].alias("quality"),
    )
    return (
        D.survivor_dedup(scored, ["__h"], ["quality"], ["doc_id"])
        .select("doc_id", "lang", "source", "quality")
        .orderBy("doc_id")
    )


SQL_BEST_SURVIVOR = f"""
WITH scored AS (
  SELECT doc_id, lang, source, {{h}} AS __h, {{q}} AS quality FROM documents),
r AS (SELECT *, row_number() OVER (PARTITION BY __h
        ORDER BY quality DESC, doc_id) AS rn FROM scored)
SELECT doc_id, lang, source, quality FROM r WHERE rn = 1 ORDER BY doc_id
""".format(h=O.sql_hash64("text"), q=O.sql_quality("text")["quality"])


def q_boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate profiling (diagnostic twin of segment_dedup): per
    document, the fraction of its fixed 8-word segments that occur in >= 2
    distinct documents — the report a curation run consults to choose the
    line-dedup threshold BEFORE destructively rewriting a 100 TB corpus."""
    docs = _t(spark, sf_dir, "documents")
    return D.segment_df_stats(docs, seg_words=8, boiler_df=2).orderBy("doc_id")


SQL_BOILERPLATE = f"""
WITH toks AS (SELECT doc_id, {O.sql_tokenize_ws('text')} AS t FROM documents),
idx AS (SELECT doc_id, t,
               unnest(generate_series(0, (ceil(len(t)/8.0))::INT - 1)) AS i
        FROM toks),
seg AS (SELECT doc_id,
               array_to_string(list_slice(t, i*8+1, i*8+8), ' ') AS seg
        FROM idx),
cnt AS (SELECT seg, count(DISTINCT doc_id) AS seg_df FROM seg GROUP BY seg),
per AS (SELECT s.doc_id, count(*) AS n_seg,
               sum(CASE WHEN c.seg_df >= 2 THEN 1 ELSE 0 END) AS n_boiler
        FROM seg s JOIN cnt c USING (seg) GROUP BY s.doc_id)
SELECT d.doc_id, coalesce(p.n_seg, 0)::BIGINT AS n_seg,
       coalesce(p.n_boiler, 0)::BIGINT AS n_boiler,
       {O.sql_r4("CASE WHEN coalesce(p.n_seg, 0) > 0"
                 " THEN p.n_boiler::DOUBLE / p.n_seg ELSE 0.0 END")}
         AS boiler_frac
FROM documents d LEFT JOIN per p USING (doc_id)
ORDER BY d.doc_id
"""


def q_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification (gap fill): per-user daily event counts with
    explicit zero rows for silent days inside each user's activity span —
    ``sequence(min_day, max_day)`` + explode generates the calendar
    engine-side (narrow, one row per user-day), then a co-partitioned left
    join attaches observed counts. The time-series shape every retention /
    anomaly job needs; no driver-side calendar, no cross join against a
    global date dimension."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    spans = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    cal = spans.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    return (
        cal.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        )
        .orderBy("user_id", "day")
    )


SQL_DAILY_GAPFILL = """
WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events
               FROM events GROUP BY 1, 2),
spans AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0,
                 max(CAST(ts AS DATE)) AS d1
          FROM events GROUP BY 1),
cal AS (SELECT user_id,
               unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
                                      INTERVAL 1 DAY))::DATE AS day
        FROM spans)
SELECT c.user_id, strftime(c.day, '%Y-%m-%d') AS day,
       coalesce(d.n_events, 0)::BIGINT AS n_events
FROM cal c LEFT JOIN daily d ON d.user_id = c.user_id AND d.day = c.day
ORDER BY c.user_id, day
"""


def q_interval_join_hot_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine interval (range-only) join: derive the 5 busiest purchase
    hours, widen each to a [-30 min, +90 min) window, then join ALL events
    falling inside any window — overlapping intervals mean an event can
    match several, which no equi-key rewrite expresses. The interval side
    is aggregated and tiny, so the engine broadcasts it (BroadcastNestedLoop
    — the right physical strategy for small-interval × big-fact at 100 TB;
    the top-5 window runs over the per-hour aggregate, bounded by calendar
    hours, not event count)."""
    ev = _t(spark, sf_dir, "events").select("ts", "event_type")
    hot = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("h0"))
        .agg(F.count(F.lit(1)).alias("n_purch"))
    )
    w = Window.orderBy(F.desc("n_purch"), F.asc("h0"))
    top = hot.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    ivals = top.select(
        "h0",
        (F.col("h0") - F.expr("INTERVAL 30 MINUTES")).alias("lo"),
        (F.col("h0") + F.expr("INTERVAL 90 MINUTES")).alias("hi"),
    )
    joined = ev.join(
        F.broadcast(ivals),
        (F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi")),
    )
    return (
        joined.groupBy(_fmt_ts(F.col("h0")).alias("win_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("win_start", "event_type")
    )


SQL_INTERVAL_JOIN = """
WITH hot AS (SELECT date_trunc('hour', ts) AS h0, count(*) AS n_purch
             FROM events WHERE event_type = 'purchase' GROUP BY 1),
top AS (SELECT h0 FROM (SELECT h0, row_number() OVER
          (ORDER BY n_purch DESC, h0) AS rn FROM hot) WHERE rn <= 5),
iv AS (SELECT h0, h0 - INTERVAL 30 MINUTE AS lo,
              h0 + INTERVAL 90 MINUTE AS hi FROM top)
SELECT strftime(iv.h0, '%Y-%m-%d %H:%M:%S') AS win_start, e.event_type,
       count(*) AS n
FROM events e JOIN iv ON e.ts >= iv.lo AND e.ts < iv.hi
GROUP BY 1, 2 ORDER BY win_start, event_type
"""


def q_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join — THE shuffle-elimination story for a
    repeatedly-joined 100 TB fact pair: both sides written bucketed+sorted
    by the join key, so the join is a pure streaming merge of pre-sorted
    bucket files with NO Exchange (pinned by tests/test_bucketing.py).
    Here the write happens inline to keep the query self-contained; in
    production the bucketed layout is written once and amortized over
    every subsequent join."""
    import tempfile

    from ingestion_scripts_spark.operators.bucketing import write_bucketed

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice", "l_discount"
    )
    loc = tempfile.mkdtemp(prefix="bktq_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktq LOCATION '{loc}'")
    write_bucketed(orders, "bktq.bkt_orders", "o_orderkey", 8)
    write_bucketed(li, "bktq.bkt_lineitem", "o_orderkey", 8)
    j = spark.table("bktq.bkt_lineitem").join(
        spark.table("bktq.bkt_orders"), "o_orderkey"
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


SQL_BUCKETED_JOIN = """
SELECT o_orderpriority,
  round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)::DOUBLE
    AS revenue,
  count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_winsorized_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group statistics: winsorized mean of document length per
    language (clip at that language's p05/p95 before averaging) — the
    outlier-insensitive size profile used when a handful of giant docs
    would otherwise dominate corpus budgeting. Two passes over a narrow
    projection: exact per-group quantiles (tiny result, broadcast back),
    then one clipped aggregate."""
    docs = _t(spark, sf_dir, "documents").select("lang", "n_chars")
    qs = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.05)").alias("p05"),
        F.expr("percentile(n_chars, 0.95)").alias("p95"),
    )
    clipped = docs.join(F.broadcast(qs), "lang").select(
        "lang",
        F.col("n_chars").cast("double").alias("raw"),
        F.least(
            F.greatest(F.col("n_chars").cast("double"), F.col("p05")), F.col("p95")
        ).alias("clip"),
    )
    return (
        clipped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            TA.r4(F.avg("raw")).alias("mean_chars"),
            TA.r4(F.avg("clip")).alias("wins_mean_chars"),
        )
        .orderBy("lang")
    )


SQL_WINSORIZED = f"""
WITH q AS (SELECT lang, quantile_cont(n_chars, 0.05) AS p05,
                  quantile_cont(n_chars, 0.95) AS p95
           FROM documents GROUP BY lang)
SELECT d.lang, count(*) AS n_docs,
       {O.sql_r4('avg(n_chars::DOUBLE)')} AS mean_chars,
       {O.sql_r4('avg(least(greatest(n_chars::DOUBLE, p05), p95))')}
         AS wins_mean_chars
FROM documents d JOIN q ON d.lang = q.lang
GROUP BY d.lang ORDER BY d.lang
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot reconciliation: FULL OUTER join of two table snapshots
    (orders before/after a cutoff date here) classifying every key as
    added / removed / changed / unchanged — the diff report every
    incremental-ingest pipeline runs to validate a load. One co-partitioned
    full-outer join on the key; the classification is a narrow CASE."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    # two deterministic synthetic snapshots: the "new" load adds 1997
    # orders, drops every 13th key (upstream deletions) and corrects the
    # status of every 97th (upstream updates) — exercising all 4 classes
    old = orders.filter(F.col("o_orderdate") < F.lit("1997-01-01")).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("old_status"),
    )
    new = (
        orders.filter(F.col("o_orderdate") < F.lit("1998-01-01"))
        .filter(F.col("o_orderkey") % 13 != 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(F.col("o_orderkey") % 97 == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus"))
            .alias("new_status"),
        )
    )
    diff = old.join(new, "k", "full_outer").select(
        "k",
        F.when(F.col("old_status").isNull(), F.lit("added"))
        .when(F.col("new_status").isNull(), F.lit("removed"))
        .when(F.col("old_status") != F.col("new_status"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
    )
    return (
        diff.groupBy("change")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("change")
    )


SQL_SNAPSHOT_DIFF = """
WITH old AS (SELECT o_orderkey AS k, o_orderstatus AS old_status
             FROM orders WHERE o_orderdate < DATE '1997-01-01'),
new AS (SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 97 = 0 THEN 'X'
                    ELSE o_orderstatus END AS new_status
        FROM orders
        WHERE o_orderdate < DATE '1998-01-01' AND o_orderkey % 13 <> 0)
SELECT CASE WHEN old_status IS NULL THEN 'added'
            WHEN new_status IS NULL THEN 'removed'
            WHEN old_status <> new_status THEN 'changed'
            ELSE 'unchanged' END AS change,
       count(*) AS n
FROM old FULL OUTER JOIN new USING (k)
GROUP BY 1 ORDER BY change
"""


def q_weekly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth: weekly purchase value with lag() and percent
    change — the lag runs over the tiny per-week aggregate (bounded by
    calendar weeks, not event count), so the single-partition window is
    safe by construction at any corpus size."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    weekly = ev.groupBy(
        F.date_trunc("week", "ts").alias("wk")
    ).agg(TA.r4(F.sum("value")).alias("wk_value"))
    w = Window.orderBy("wk")
    prev = F.lag("wk_value").over(w)
    return (
        weekly.select(
            F.date_format("wk", "yyyy-MM-dd").alias("week"),
            "wk_value",
            TA.r4(
                F.when(prev > 0, (F.col("wk_value") - prev) / prev)
            ).alias("wow_change"),
        )
        .orderBy("week")
    )


SQL_WEEKLY_GROWTH = f"""
WITH weekly AS (
  SELECT date_trunc('week', ts) AS wk,
         {O.sql_r4('sum(value)')} AS wk_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1)
SELECT strftime(wk, '%Y-%m-%d') AS week, wk_value,
       {O.sql_r4('CASE WHEN lag(wk_value) OVER (ORDER BY wk) > 0 THEN '
                 '(wk_value - lag(wk_value) OVER (ORDER BY wk)) / '
                 'lag(wk_value) OVER (ORDER BY wk) END')} AS wow_change
FROM weekly ORDER BY week
"""


def q_top_customer_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max aggregation: per nation, the customer holding the maximum
    balance via ``max_by`` (DuckDB ``arg_max``) — the single-pass agg form
    of 'top-1 per group' that needs NO window and NO self-join; ties are
    broken deterministically by keying the comparison on (balance, -key)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    # scalar ranking key: balance in exact cents scaled past the key range,
    # minus the key — equal balances deterministically pick the LOWEST
    # custkey on both engines (round() not cast(): Spark truncates
    # double→bigint where DuckDB rounds — the ADVICE r2 bug class)
    best = cust.groupBy("c_nationkey").agg(
        F.expr(
            "max_by(c_custkey,"
            " CAST(round(c_acctbal * 100) AS BIGINT) * 10000000 - c_custkey)"
        ).alias("top_custkey"),
        F.max("c_acctbal").alias("top_acctbal"),
        F.count(F.lit(1)).alias("n_cust"),
    )
    return (
        best.join(F.broadcast(nation), best.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "top_custkey",
            F.col("top_acctbal").cast("double").alias("top_acctbal"),
            "n_cust",
        )
        .orderBy("n_name")
    )


SQL_TOP_CUSTOMER = """
SELECT n_name,
       arg_max(c_custkey,
               CAST(round(c_acctbal * 100) AS BIGINT) * 10000000 - c_custkey)
         AS top_custkey,
       max(c_acctbal)::DOUBLE AS top_acctbal,
       count(*) AS n_cust
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def q_custom_feed_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``): the
    engine's model for plugging a brand-new external feed system in as a
    first-class ``spark.read.format(...)`` source — declared schema,
    options, and RANGE-SHARDED partition planning (each executor
    materializes only its slice, the way a real connector shards a feed
    list). Rows are a pure function of the row index, so the DuckDB twin
    reproduces the dataset exactly — the source itself is
    differential-tested, not just the transforms over it."""
    from ingestion_scripts_spark.sources.feed_datasource import register

    register(spark)
    feeds = (
        spark.read.format("feed_fixture")
        .option("rows", "5000")
        .option("numPartitions", "8")
        .load()
    )
    return (
        feeds.groupBy("feed_source")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("score").alias("total_score"),
            F.max("item_id").alias("max_item"),
        )
        .orderBy("feed_source")
    )


def _sql_custom_feed() -> str:
    from ingestion_scripts_spark.sources.feed_datasource import sql_feed_rows

    return f"""
SELECT feed_source, count(*) AS n_items,
       CAST(sum(score) AS BIGINT) AS total_score,
       max(item_id) AS max_item
FROM ({sql_feed_rows(5000)})
GROUP BY feed_source ORDER BY feed_source
"""


def q_stream_custom_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python DataSource as a STREAM: offset-tracked micro-batch
    reads (Kafka-ish contract — monotone offsets, replayable ranges,
    commit) through ``simpleStreamReader``, drained to exhaustion into a
    memory sink. 2000 rows at 250 rows/poll = 8 real micro-batches; the
    aggregate over the drained table must equal the batch row law — the
    oracle can't see offsets, so equality proves the offset ranges tiled
    the stream exactly once (no drop, no double-serve at batch seams)."""
    import tempfile
    import uuid

    from ingestion_scripts_spark.sources.feed_datasource import register

    register(spark)
    stream = (
        spark.readStream.format("feed_fixture")
        .option("rows", "2000")
        .option("batchRows", "250")
        .load()
    )
    name = "stream_feed_" + uuid.uuid4().hex[:8]
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_feed_"))
        .start()
    )
    # availableNow would stop at the offset prefetched at query start (one
    # poll); processAllAvailable drains until the source is exhausted —
    # well-defined here because the feed caps itself at `rows`
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("feed_source")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("score").alias("total_score"),
            F.max("item_id").alias("max_item"),
        )
        .orderBy("feed_source")
    )


def _sql_stream_custom_feed() -> str:
    from ingestion_scripts_spark.sources.feed_datasource import sql_feed_rows

    return f"""
SELECT feed_source, count(*) AS n_items,
       CAST(sum(score) AS BIGINT) AS total_score,
       max(item_id) AS max_item
FROM ({sql_feed_rows(2000)})
GROUP BY feed_source ORDER BY feed_source
"""


# ---------------------------------------------------------------------------
# r3 batch 2: Spark-4 native surfaces (VARIANT, UDTF-with-TABLE, unpivot,
# try_cast) + the ingestion ops around them (DQ expectations, URL
# canonicalization, accent normalization, EWMA, Markov transitions)
# ---------------------------------------------------------------------------


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation gate: null / unique / range / FK checks,
    one aggregate pass per table, unioned into a small report (the
    declarative restatement of the reference's per-record faust.Record
    validation, ``src/records.py``). Each check is a map-side-combined
    aggregate; the FK check is one join against distinct parent keys."""
    from ingestion_scripts_spark.operators import dq

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    lineitem = _t(spark, sf_dir, "lineitem")
    events = _t(spark, sf_dir, "events")
    report = dq.dq_report(
        [
            dq.expect_not_null(orders, "o_orderdate"),
            dq.expect_unique(customer, "c_custkey"),
            dq.expect_range(lineitem, "l_quantity", 1, 50),
            dq.expect_fk(orders, "o_custkey", customer, "c_custkey"),
            dq.expect_range(events, "value", 0, 1e9),
        ]
    )
    return report.select(
        F.col("check").alias("check_name"), "n_bad", "n_total", "passed"
    ).orderBy("check_name")


SQL_DQ_CHECKS = """
SELECT * FROM (
  SELECT 'not_null:o_orderdate' AS check_name,
         CAST(count(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT) AS n_bad,
         CAST(count(*) AS BIGINT) AS n_total,
         count(*) FILTER (WHERE o_orderdate IS NULL) = 0 AS passed
  FROM orders
  UNION ALL
  SELECT 'unique:c_custkey',
         CAST(count(c_custkey) - count(DISTINCT c_custkey) AS BIGINT),
         CAST(count(*) AS BIGINT),
         count(c_custkey) - count(DISTINCT c_custkey) = 0
  FROM customer
  UNION ALL
  SELECT 'range:l_quantity',
         CAST(count(*) FILTER (WHERE l_quantity IS NOT NULL
                                 AND (l_quantity < 1 OR l_quantity > 50)) AS BIGINT),
         CAST(count(*) AS BIGINT),
         count(*) FILTER (WHERE l_quantity IS NOT NULL
                            AND (l_quantity < 1 OR l_quantity > 50)) = 0
  FROM lineitem
  UNION ALL
  SELECT 'fk:o_custkey',
         CAST(count(*) FILTER (WHERE o_custkey NOT IN
               (SELECT c_custkey FROM customer)) AS BIGINT),
         CAST(count(*) AS BIGINT),
         count(*) FILTER (WHERE o_custkey NOT IN
               (SELECT c_custkey FROM customer)) = 0
  FROM orders
  UNION ALL
  SELECT 'range:value',
         CAST(count(*) FILTER (WHERE value IS NOT NULL
                                 AND (value < 0 OR value > 1e9)) AS BIGINT),
         CAST(count(*) AS BIGINT),
         count(*) FILTER (WHERE value IS NOT NULL
                            AND (value < 0 OR value > 1e9)) = 0
  FROM events
) ORDER BY check_name
"""


def q_sessionize_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize via a Spark-4 Python UDTF with a TABLE argument
    (``PARTITION BY user_id ORDER BY ts``): the declarative twin of the
    reference's per-key agent loop (``src/*_consumer.py`` coroutines hold
    per-key running state). Same 30-min-gap law and output shape as
    ``q_sessionize`` — the two share one oracle. The window-cascade form
    stays the default at scale; this pins the imperative-state surface."""
    from ingestion_scripts_spark.functions.udtfs import SessionizeUDTF

    spark.udtf.register("sessionize_udtf", SessionizeUDTF)
    _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    ).createOrReplaceTempView("events_udtf_in")
    return spark.sql(
        """
        SELECT user_id, session_id, session_start, session_end, n_events
        FROM sessionize_udtf(
          TABLE(SELECT user_id, ts, event_id FROM events_udtf_in)
          PARTITION BY user_id ORDER BY (ts, event_id))
        """
    )


def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type
    (``parse_json`` → ``variant_get``) instead of per-access JSON
    re-parsing: at 100 TB the props column is parsed ONCE into a binary
    variant and every field access is a cheap typed extraction. Oracle is
    plain ``json_extract`` — the values must agree exactly."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "bigint")
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


SQL_VARIANT_PROPS = """
SELECT event_type, count(*) AS n,
       CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
       min(json_extract(props, '$.k')::BIGINT) AS min_k,
       max(json_extract(props, '$.k')::BIGINT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape with the native ``unpivot`` (melt) operator, then
    a per-(brand, metric) aggregate — the profiling shape that feeds any
    column-level stats dashboard. Narrow transform + one shuffled agg."""
    part = _t(spark, sf_dir, "part").withColumn(
        "p_size_d", F.col("p_size").cast("double")
    )
    long = part.unpivot(
        ids=["p_brand"],
        values=["p_retailprice", "p_size_d"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return (
        long.groupBy("p_brand", "metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            TA.r4(
                F.sum(F.col("val").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_val"),
        )
        .orderBy("p_brand", "metric")
    )


SQL_UNPIVOT_PART = f"""
WITH long AS (
  SELECT p_brand, 'p_retailprice' AS metric, p_retailprice AS val FROM part
  UNION ALL
  SELECT p_brand, 'p_size_d', p_size::DOUBLE FROM part
)
SELECT p_brand, metric, count(*) AS n,
       {O.sql_r4("sum(CAST(val AS DECIMAL(18,4)))::DOUBLE / count(*)")} AS avg_val
FROM long GROUP BY p_brand, metric ORDER BY p_brand, metric
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event stream
    (``lead`` within the per-user ordering) — the path-mining primitive
    behind funnel discovery. One shuffle on user_id for the window, one
    keyed agg on the (from, to) pair; both partition cleanly at scale."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    return (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("from_type", "to_type")
    )


SQL_EVENT_TRANSITIONS = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events)
SELECT from_type, to_type, count(*) AS n
FROM pairs WHERE to_type IS NOT NULL
GROUP BY from_type, to_type ORDER BY from_type, to_type
"""


def q_safe_cast_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant numeric ingestion with ``try_cast``: a deterministic
    dirty-string column (padded / suffixed / sentinel / empty variants of
    the props int) parsed with NULL-on-failure semantics instead of a job
    abort — the ANSI-mode-safe path a 100 TB load needs (one malformed row
    must not kill the job; it lands in the n_bad count)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    raw = (
        F.when(F.col("event_id") % 5 == 0, F.lit("N/A"))
        .when(F.col("event_id") % 5 == 1, F.lit(""))
        .when(
            F.col("event_id") % 5 == 2,
            F.concat(F.lit(" "), F.col("k").cast("string"), F.lit(" ")),
        )
        .when(F.col("event_id") % 5 == 3, F.concat(F.col("k").cast("string"), F.lit("x")))
        .otherwise(F.col("k").cast("string"))
    )
    parsed = ev.withColumn("parsed", raw.try_cast("bigint"))
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count("parsed").alias("n_parsed"),
            F.count_if(F.col("parsed").isNull()).cast("bigint").alias("n_bad"),
            F.sum("parsed").alias("sum_parsed"),
        )
        .orderBy("event_type")
    )


SQL_SAFE_CAST = """
WITH raw AS (
  SELECT event_type,
         CASE WHEN event_id % 5 = 0 THEN 'N/A'
              WHEN event_id % 5 = 1 THEN ''
              WHEN event_id % 5 = 2
                THEN ' ' || (json_extract(props,'$.k')::BIGINT)::VARCHAR || ' '
              WHEN event_id % 5 = 3
                THEN (json_extract(props,'$.k')::BIGINT)::VARCHAR || 'x'
              ELSE (json_extract(props,'$.k')::BIGINT)::VARCHAR END AS s
  FROM events)
SELECT event_type, count(*) AS n_total,
       count(try_cast(s AS BIGINT)) AS n_parsed,
       CAST(count(*) FILTER (WHERE try_cast(s AS BIGINT) IS NULL) AS BIGINT)
         AS n_bad,
       CAST(sum(try_cast(s AS BIGINT)) AS BIGINT) AS sum_parsed
FROM raw GROUP BY event_type ORDER BY event_type
"""


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization for web-corpus dedup: lowercase the host, strip
    the fragment, drop ``utm_*`` tracking params, trim the trailing slash —
    then count distinct canonical URLs per host. Built on the JVM-side
    ``parse_url`` (no Python in the hot path); the URL column is
    synthesized deterministically (messy case / params / fragments) so the
    DuckDB regexp oracle sees the same inputs."""
    doc = _t(spark, sf_dir, "documents").select("doc_id", "source")
    url = F.concat(
        F.lit("HTTPS://WWW.Example"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".COM/Path/"),
        F.col("source"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?id="),
        (F.col("doc_id") % 5).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("&utm_source=feed")).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 3 == 1, F.lit("&utm_campaign=x&ref=r")).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 2 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    u = doc.withColumn("url", url)
    host = F.lower(F.parse_url("url", F.lit("HOST")))
    path = F.regexp_replace(F.parse_url("url", F.lit("PATH")), "/$", "")
    q = F.coalesce(F.parse_url("url", F.lit("QUERY")), F.lit(""))
    keep = F.array_join(
        F.filter(F.split(q, "&"), lambda x: ~x.startswith("utm_")), "&"
    )
    canon = F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(keep != "", F.concat(F.lit("?"), keep)).otherwise(F.lit("")),
    )
    return (
        u.select(host.alias("host"), canon.alias("canon"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct(F.col("canon")).alias("n_canonical"),
            F.min("canon").alias("sample_canon"),
        )
        .orderBy("host")
    )


SQL_URL_CANON = """
WITH u AS (
  SELECT 'HTTPS://WWW.Example' || (doc_id % 7)::VARCHAR || '.COM/Path/'
         || source || '/' || doc_id::VARCHAR
         || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
         || '?id=' || (doc_id % 5)::VARCHAR
         || CASE WHEN doc_id % 3 = 0 THEN '&utm_source=feed' ELSE '' END
         || CASE WHEN doc_id % 3 = 1 THEN '&utm_campaign=x&ref=r' ELSE '' END
         || CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END AS url
  FROM documents),
parts AS (
  SELECT lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS host,
         regexp_replace(
           regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/$', '')
           AS path,
         regexp_extract(url, '\\?([^#]*)', 1) AS q
  FROM u),
canon AS (
  SELECT host,
         'https://' || host || path ||
         CASE WHEN array_to_string(
                list_filter(string_split(q, '&'),
                            x -> NOT starts_with(x, 'utm_')), '&') <> ''
              THEN '?' || array_to_string(
                list_filter(string_split(q, '&'),
                            x -> NOT starts_with(x, 'utm_')), '&')
              ELSE '' END AS c
  FROM parts)
SELECT host, count(*) AS n_urls, count(DISTINCT c) AS n_canonical,
       min(c) AS sample_canon
FROM canon GROUP BY host ORDER BY host
"""


def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (α=0.3) over the daily value series — the smoothed
    engagement signal behind churn scoring. Daily sums accumulate as
    DECIMAL(18,4) (order-independent across engines); the EWMA itself is a
    LEFT-TO-RIGHT fold over the day-sorted array (``F.aggregate`` here,
    ``list_reduce`` with a prepended init in the oracle) so both engines
    execute the identical IEEE op sequence. Per-user arrays are bounded by
    calendar days, not event count — safe at any corpus size."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"))
    per_user = daily.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("day", "v"))).alias("series")
    )
    ewma = F.aggregate(
        F.transform(F.col("series"), lambda s: s["v"]),
        F.lit(0.0),
        lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc,
    )
    return per_user.select(
        "user_id",
        F.size("series").cast("bigint").alias("n_days"),
        TA.r4(ewma).alias("ewma"),
    ).orderBy("user_id")


SQL_EWMA = f"""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         sum(CAST(value AS DECIMAL(18,4)))::DOUBLE AS v
  FROM events GROUP BY user_id, date_trunc('day', ts)),
series AS (
  SELECT user_id, list(v ORDER BY day) AS vs
  FROM daily GROUP BY user_id)
SELECT user_id, CAST(len(vs) AS BIGINT) AS n_days,
       {O.sql_r4("list_reduce(list_prepend(0.0, vs)::DOUBLE[], (acc, x) -> 0.3*x + 0.7*acc)")} AS ewma
FROM series ORDER BY user_id
"""


def q_strip_accents_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode accent normalization (NFD → drop combining marks) via an
    Arrow-batched pandas UDF — the pre-tokenization cleanup every
    multilingual corpus runs. Accents are synthesized deterministically
    (``translate`` a→á …) so the round trip is checkable: stripping must
    restore the original text exactly. Oracle uses DuckDB's native
    ``strip_accents``; agreement pins the UDF's law."""
    from ingestion_scripts_spark.functions.text import strip_accents_udf

    strip = strip_accents_udf()
    doc = _t(spark, sf_dir, "documents").select("doc_id", "text")
    accented = F.translate(F.col("text"), "aeiou", "áéíöü")
    d = doc.select(
        "doc_id",
        "text",
        accented.alias("accented"),
        strip(accented).alias("stripped"),
    )
    return d.select(
        "doc_id",
        (F.col("stripped") == F.col("text")).alias("restored"),
        (
            F.length("accented")
            - F.length(F.regexp_replace("accented", "[áéíöü]", ""))
        ).cast("bigint").alias("n_accents"),
    ).orderBy("doc_id")


SQL_STRIP_ACCENTS = """
WITH d AS (
  SELECT doc_id, text,
         translate(text, 'aeiou', 'áéíöü') AS accented
  FROM documents)
SELECT doc_id,
       strip_accents(accented) = text AS restored,
       CAST(length(accented)
            - length(regexp_replace(accented, '[áéíöü]', '', 'g')) AS BIGINT)
         AS n_accents
FROM d ORDER BY doc_id
"""


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between event value and the props int,
    per event type — the robust (monotonic, outlier-insensitive) companion
    to ``stats_corr``'s Pearson. Ranks come from ``rank()`` (min-rank ties,
    identical in both engines); the correlation is assembled from EXACT
    bigint rank sums, so the only float ops are the final division and
    sqrt — bit-identical across engines."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "value",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    rv = F.rank().over(Window.partitionBy("event_type").orderBy("value"))
    rk = F.rank().over(Window.partitionBy("event_type").orderBy("k"))
    ranked = ev.select("event_type", rv.alias("rx"), rk.alias("ry"))
    agg = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return agg.select(
        "event_type", "n", TA.r4(num / den).alias("spearman")
    ).orderBy("event_type")


SQL_SPEARMAN = f"""
WITH ranked AS (
  SELECT event_type,
         rank() OVER (PARTITION BY event_type ORDER BY value) AS rx,
         rank() OVER (PARTITION BY event_type
                      ORDER BY json_extract(props,'$.k')::BIGINT) AS ry
  FROM events WHERE value > 0),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
         CAST(sum(rx*ry) AS BIGINT) AS sxy,
         CAST(sum(rx*rx) AS BIGINT) AS sxx,
         CAST(sum(ry*ry) AS BIGINT) AS syy
  FROM ranked GROUP BY event_type)
SELECT event_type, n,
       {O.sql_r4("((n*sxy - sx*sy)::DOUBLE) / sqrt((n*sxx - sx*sx)::DOUBLE * (n*syy - sy*sy)::DOUBLE)")}
         AS spearman
FROM agg ORDER BY event_type
"""


def q_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection with median/MAD instead of mean/stddev
    (``anomaly_zscore``'s non-robust twin): a single extreme value cannot
    drag the threshold. Medians are EXACT lower-median order statistics
    (row_number, no interpolation — interpolation formulas differ across
    engines by ULPs); the outlier gate |x−med| > 4.4478·mad uses one
    multiply, bit-identical in both engines."""
    ev = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    n_w = Window.partitionBy("event_type")
    rn_v = Window.partitionBy("event_type").orderBy("value", "event_id")
    with_med = (
        ev.withColumn("rn", F.row_number().over(rn_v))
        .withColumn("n", F.count(F.lit(1)).over(n_w))
        .withColumn(
            "med",
            F.max(F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("value"))).over(
                n_w
            ),
        )
    )
    dev = with_med.select(
        "event_type",
        "event_id",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
    )
    rn_d = Window.partitionBy("event_type").orderBy("dev", "event_id")
    with_mad = (
        dev.withColumn("rn", F.row_number().over(rn_d))
        .withColumn("n", F.count(F.lit(1)).over(n_w))
        .withColumn(
            "mad",
            F.max(F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("dev"))).over(
                n_w
            ),
        )
    )
    return (
        with_mad.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            TA.r4(F.max("med")).alias("med"),
            TA.r4(F.max("mad")).alias("mad"),
            F.count_if(F.col("dev") > F.col("mad") * 4.4478)
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


SQL_ROBUST_ZSCORE = f"""
WITH v AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id)
           AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
med AS (
  SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS med
  FROM v GROUP BY event_type),
dev AS (
  SELECT v.event_type, v.event_id, abs(v.value - med.med) AS dev, med.med,
         row_number() OVER (PARTITION BY v.event_type
                            ORDER BY abs(v.value - med.med), v.event_id) AS rn,
         count(*) OVER (PARTITION BY v.event_type) AS n
  FROM v JOIN med ON v.event_type = med.event_type),
mad AS (
  SELECT event_type, max(med) AS med,
         max(CASE WHEN rn = (n + 1) // 2 THEN dev END) AS mad
  FROM dev GROUP BY event_type)
SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n,
       {O.sql_r4("max(mad.med)")} AS med,
       {O.sql_r4("max(mad.mad)")} AS mad,
       CAST(count(*) FILTER (WHERE dev.dev > mad.mad * 4.4478) AS BIGINT)
         AS n_outliers
FROM dev JOIN mad ON dev.event_type = mad.event_type
GROUP BY dev.event_type ORDER BY dev.event_type
"""


def q_hash_sample_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-key sampling: rank each group by md5(id) and
    keep the first 20 — the reproducible per-domain eval-subset draw (same
    rows on every run and every engine, unlike rand()-based sampling).
    One shuffle on the key; the md5 order is uniform pseudo-random."""
    doc = _t(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        doc.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("sample_rank") <= 20)
        .orderBy("source", "sample_rank")
    )


SQL_HASH_SAMPLE = """
SELECT doc_id, source, sample_rank FROM (
  SELECT doc_id, source,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY md5(doc_id::VARCHAR), doc_id)
              AS BIGINT) AS sample_rank
  FROM documents)
WHERE sample_rank <= 20 ORDER BY source, sample_rank
"""


def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (nation, order-year): all four grouping combinations in
    one pass (completes the grouping family next to ``rollup_revenue`` /
    ``grouping_sets_revenue``). Revenue accumulates as DECIMAL(18,4) —
    order-independent across engines; NULL grouping slots are labeled
    explicitly so the driver's hash can't confuse them with real NULLs."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("yr")
    )
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
        ).alias("rev"),
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.cube("n_name", "yr")
        .agg(
            TA.r4(F.sum("rev").cast("double")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("yr"), F.lit(-1)).cast("bigint").alias("yr"),
            "revenue",
            "n_items",
        )
        .orderBy("nation", "yr")
    )


SQL_CUBE_REVENUE = f"""
SELECT coalesce(n_name, 'ALL') AS nation,
       CAST(coalesce(year(o_orderdate), -1) AS BIGINT) AS yr,
       {O.sql_r4("sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1::DECIMAL(18,4) - CAST(l_discount AS DECIMAL(18,4))))::DOUBLE")}
         AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE (n_name, year(o_orderdate))
ORDER BY nation, yr
"""


def q_setsim_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-Jaccard near-dup pairs (threshold 0.7) via prefix filtering
    (PPJoin law, ``operators/setjoin.py``): candidates come from an
    equi-join on each doc's RAREST shingles only — the exact complement to
    the approximate MinHash-LSH path, over the SAME 3-gram shingle sets
    (unigram tokens are non-discriminative on a small shared vocabulary).
    Every threshold decision is integer arithmetic
    (``10·|a∩b| >= 7·|a∪b|``), so no float boundary can split the
    engines."""
    from ingestion_scripts_spark.operators.setjoin import jaccard_col, setsim_join

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", D.shingles(F.col("text"), 3).alias("tk")
    )
    pairs = setsim_join(docs, "doc_id", "tk", t_num=7, t_den=10)
    return pairs.select(
        "id_a",
        "id_b",
        F.col("n_inter").cast("bigint").alias("n_inter"),
        F.col("n_union").cast("bigint").alias("n_union"),
        TA.r4(jaccard_col(F.col("n_inter"), F.col("n_union"))).alias("jaccard"),
    ).orderBy("id_a", "id_b")


SQL_SETSIM_JOIN = f"""
WITH toks AS (
  SELECT doc_id, {O.sql_shingles("text", 3)} AS tk
  FROM documents),
ex AS (SELECT doc_id, len(tk) AS sz, unnest(tk) AS tok FROM toks),
dfq AS (SELECT tok, count(*) AS df FROM ex GROUP BY tok),
rnk AS (
  SELECT doc_id, sz, ex.tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY df, ex.tok) AS rn
  FROM ex JOIN dfq USING (tok)),
pre AS (SELECT * FROM rnk WHERE rn <= sz - (7*sz + 9) // 10 + 1),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pre a JOIN pre b
    ON a.tok = b.tok AND a.doc_id < b.doc_id
   AND 7 * greatest(a.sz, b.sz) <= 10 * least(a.sz, b.sz)),
ver AS (
  SELECT id_a, id_b,
         len(list_intersect(x.tk, y.tk)) AS n_inter,
         len(list_distinct(x.tk || y.tk)) AS n_union
  FROM cand JOIN toks x ON id_a = x.doc_id JOIN toks y ON id_b = y.doc_id)
SELECT id_a, id_b, CAST(n_inter AS BIGINT) AS n_inter,
       CAST(n_union AS BIGINT) AS n_union,
       {O.sql_r4("n_inter::DOUBLE / n_union::DOUBLE")} AS jaccard
FROM ver WHERE 10 * n_inter >= 7 * n_union
ORDER BY id_a, id_b
"""


def q_interval_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path for ``q_interval_join_hot_hours`` (same result, same
    oracle): instead of a broadcast nested-loop range join, each interval
    is exploded into the hour buckets it covers and events equi-join on
    their own hour bucket with an exact residual range filter. The BNLJ
    form is right when the interval side is tiny; this form survives an
    interval side too large to broadcast — the join becomes a plain
    hash/sort-merge equi-join on a uniform (hour) key, each interval
    duplicated only into the ≤3 buckets it touches."""
    ev = _t(spark, sf_dir, "events").select(
        "ts", "event_type", F.date_trunc("hour", "ts").alias("bkt")
    )
    hot = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("h0"))
        .agg(F.count(F.lit(1)).alias("n_purch"))
    )
    w = Window.orderBy(F.desc("n_purch"), F.asc("h0"))
    top = hot.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    ivals = top.select(
        "h0",
        (F.col("h0") - F.expr("INTERVAL 30 MINUTES")).alias("lo"),
        (F.col("h0") + F.expr("INTERVAL 90 MINUTES")).alias("hi"),
    ).withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "lo"),
                F.date_trunc("hour", F.col("hi") - F.expr("INTERVAL 1 MICROSECOND")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ),
    )
    joined = ev.join(ivals, "bkt").where(
        (F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi"))
    )
    return (
        joined.groupBy(_fmt_ts(F.col("h0")).alias("win_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("win_start", "event_type")
    )


def q_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine near-dup pairs over 3-gram shingles
    (``similarity.sparse_cosine_pairs``): the model-free sparse complement
    to the dense-embedding kernels — weights come from the corpus itself,
    candidates from an inverted index on discriminative shingles, and
    every sum (dot, norms) is exact int64 micro-unit arithmetic, so no
    float boundary can split the engines."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", D.shingles(F.col("text"), 3).alias("sh")
    )
    pairs = SIM.sparse_cosine_pairs(docs, "doc_id", "sh", min_cos_micro=500000)
    return pairs.orderBy("id_a", "id_b")


SQL_SPARSE_COSINE = f"""
WITH toks AS (SELECT doc_id, {O.sql_shingles("text", 3)} AS sh FROM documents),
tf AS (SELECT doc_id, unnest(sh) AS t FROM toks),
tfc AS (SELECT doc_id, t, count(*) AS cnt FROM tf GROUP BY doc_id, t),
dl AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS dl FROM tfc GROUP BY doc_id),
dfq AS (SELECT t, count(*) AS dfc FROM tfc GROUP BY t),
nd AS (SELECT count(DISTINCT doc_id) AS nd FROM toks),
w AS (
  SELECT doc_id, t,
         CAST(floor((cnt::DOUBLE / dl) * (ln((nd + 1.0) / (dfc + 1.0)) + 1.0)
                    * 1000000.0 + 0.5) AS BIGINT) AS wi
  FROM tfc JOIN dl USING (doc_id) JOIN dfq USING (t), nd),
norms AS (SELECT doc_id, CAST(sum(wi * wi) AS BIGINT) AS n2
          FROM w GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(sum(a.wi * b.wi) AS BIGINT) AS dot
  FROM w a JOIN w b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT id_a, id_b,
       {O.sql_r4("dot::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE))")}
         AS cos
FROM dots JOIN norms na ON id_a = na.doc_id JOIN norms nb ON id_b = nb.doc_id
WHERE {O.sql_r4("dot::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE))")}
      >= 0.5
ORDER BY id_a, id_b
"""


def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (2 h length, 1 h slide) with the native
    ``window()`` — each event lands in exactly 2 overlapping windows
    (completes the window family next to tumbling ``hourly_windows`` and
    the session windows). The oracle unions the two shifted hour-truncs
    every slide position implies."""
    ev = _t(spark, sf_dir, "events")
    win = ev.groupBy(
        F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        TA.r4(F.sum(F.col("value").cast("decimal(18,4)")).cast("double")).alias(
            "total"
        ),
    )
    return win.select(
        _fmt_ts(F.col("w.start")).alias("win_start"),
        "event_type",
        "n",
        "total",
    ).orderBy("win_start", "event_type")


SQL_SLIDING_WINDOWS = f"""
WITH placed AS (
  SELECT date_trunc('hour', ts) AS w0, event_type, value FROM events
  UNION ALL
  SELECT date_trunc('hour', ts - INTERVAL 1 HOUR) AS w0, event_type, value
  FROM events)
SELECT {SQL_TS.format("w0")} AS win_start, event_type,
       count(*) AS n,
       {O.sql_r4("sum(CAST(value AS DECIMAL(18,4)))::DOUBLE")} AS total
FROM placed GROUP BY w0, event_type ORDER BY win_start, event_type
"""


def q_xml_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 on an XML source (Spark 4 ships the XML reader built in):
    documents round-tripped through XML — free text with angle brackets /
    quotes is exactly where naive XML breaks — re-read with an explicit
    schema and aggregated. The oracle reads the parquet directly: the
    encode/decode must be lossless through entity escaping."""
    import tempfile

    docs = _t(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="xml_src_")
    docs.select("doc_id", "text", "lang", "source", "n_chars").coalesce(
        4
    ).write.mode("overwrite").format("xml").option("rootTag", "docs").option(
        "rowTag", "doc"
    ).save(tmp)
    back = (
        spark.read.format("xml")
        .schema(
            "doc_id bigint, text string, lang string, source string, n_chars bigint"
        )
        .option("rowTag", "doc")
        .load(tmp)
    )
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.length("text")).alias("total_text_len"),
        )
        .orderBy("source")
    )


SQL_XML_SOURCE = """
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(length(text)) AS BIGINT) AS total_text_len
FROM documents GROUP BY source ORDER BY source
"""


def q_supplier_wait_fault(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept waiting orders): for finished
    orders served by >=2 suppliers, find the ones where EXACTLY ONE
    supplier shipped late (> order date + 90 days) — that supplier is the
    sole fault. Spark exercises the semi-join decorrelation path (two
    LEFT SEMI joins against keyed aggregates); the oracle states the same
    law as plain aggregates — equal results through different plans is
    exactly what the differential is for. All joins key on orderkey
    (uniform); the supplier dim is broadcast."""
    orders_f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate").cast("date") > F.date_add("o_orderdate", 90)
            ).alias("late"),
        )
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") >= 2)
        .select("l_orderkey")
    )
    one_late = (
        li.filter("late")
        .groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("nl"))
        .filter(F.col("nl") == 1)
        .select("l_orderkey")
    )
    fault = (
        li.filter("late")
        .join(multi, "l_orderkey", "left_semi")
        .join(one_late, "l_orderkey", "left_semi")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        fault.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


SQL_SUPPLIER_WAIT = """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 90 AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS ns,
         count(DISTINCT l_suppkey) FILTER (WHERE late) AS nl
  FROM li GROUP BY l_orderkey),
fault AS (
  SELECT DISTINCT li.l_orderkey, li.l_suppkey
  FROM li JOIN per_order USING (l_orderkey)
  WHERE li.late AND per_order.ns >= 2 AND per_order.nl = 1)
SELECT s_name, count(*) AS numwait
FROM fault JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10
"""


def q_user_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user engagement trend: ordinary-least-squares slope of daily
    value over day index — the churn-signal regression every growth
    dashboard computes. Same exact-arithmetic pattern as spearman_corr:
    x = day ordinal (int), y = daily value in int64 micro-units, all five
    OLS sums exact bigints; the single float division happens once at the
    end. Users with one active day are excluded (slope undefined)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000000.0 + 0.5).cast("bigint")).alias(
            "y"
        )
    )
    d = daily.select(
        "user_id",
        F.datediff(F.col("day").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("x"),
        "y",
    )
    agg = d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return (
        agg.filter(F.col("n") >= 2)
        .select(
            "user_id",
            F.col("n").alias("n_days"),
            TA.r4(num / den / 1000000.0).alias("slope_per_day"),
        )
        .orderBy("user_id")
    )


SQL_TREND_SLOPE = f"""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS y
  FROM events GROUP BY user_id, date_trunc('day', ts)),
d AS (
  SELECT user_id,
         CAST(datediff('day', DATE '2024-01-01', CAST(day AS DATE)) AS BIGINT)
           AS x, y
  FROM daily),
agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx
  FROM d GROUP BY user_id)
SELECT user_id, n AS n_days,
       {O.sql_r4("((n*sxy - sx*sy)::DOUBLE) / ((n*sxx - sx*sx)::DOUBLE) / 1000000.0")}
         AS slope_per_day
FROM agg WHERE n >= 2 ORDER BY user_id
"""


def q_custom_feed_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITER half of the custom Python DataSource story
    (``sources/feed_datasource.py::JsonlSinkDataSource``): events flow
    through the partition-parallel JSONL sink with its two-phase task
    commit (temp file + driver rename — no half-visible files), then are
    re-read with an explicit schema and aggregated. The oracle reads the
    parquet directly: the custom sink must be a lossless pass-through."""
    import tempfile

    from ingestion_scripts_spark.sources.feed_datasource import register_sink

    register_sink(spark)
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", F.get_json_object("props", "$.k")
        .cast("bigint")
        .alias("k")
    )
    tmp = tempfile.mkdtemp(prefix="jsonl_sink_") + "/out"
    ev.repartition(4).write.format("jsonl_sink").mode("append").option(
        "path", tmp
    ).save()
    back = spark.read.schema("event_id bigint, event_type string, k bigint").json(
        tmp + "/*.jsonl"
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("event_id").alias("max_id"),
        )
        .orderBy("event_type")
    )


SQL_CUSTOM_FEED_SINK = """
SELECT event_type, count(*) AS n,
       CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
       max(event_id) AS max_id
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational set operations as audience algebra: clickers INTERSECT
    purchasers (converted), clickers EXCEPT purchasers (browsed only),
    purchasers EXCEPT clickers (direct buyers) — the native set operators
    (hash-dedup + co-partitioned set join under the hood), not a hand-rolled
    anti-join. One small report row per operation."""
    ev = _t(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()

    def _row(tag: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(tag).alias("op"), F.count(F.lit(1)).alias("n_users")
        )

    report = (
        _row("clickers", clickers)
        .unionByName(_row("purchasers", purch))
        .unionByName(_row("converted", clickers.intersect(purch)))
        .unionByName(_row("browsed_only", clickers.subtract(purch)))
        .unionByName(_row("direct_buyers", purch.subtract(clickers)))
    )
    return report.orderBy("op")


SQL_SET_OPS = """
WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
purch AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT * FROM (
  SELECT 'clickers' AS op, CAST(count(*) AS BIGINT) AS n_users FROM clickers
  UNION ALL
  SELECT 'purchasers', count(*) FROM purch
  UNION ALL
  SELECT 'converted', count(*) FROM (SELECT * FROM clickers INTERSECT SELECT * FROM purch)
  UNION ALL
  SELECT 'browsed_only', count(*) FROM (SELECT * FROM clickers EXCEPT SELECT * FROM purch)
  UNION ALL
  SELECT 'direct_buyers', count(*) FROM (SELECT * FROM purch EXCEPT SELECT * FROM clickers)
) ORDER BY op
"""


def q_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join: each high-balance customer paired with
    their 3 most expensive orders — the top-N-per-key shape written the
    way an analyst writes it (LATERAL subquery with ORDER BY/LIMIT), with
    Catalyst decorrelating it into a ranked window under the hood. The
    oracle runs DuckDB's own LATERAL."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_l")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_l")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM (SELECT c_custkey FROM customer_l WHERE c_acctbal > 9000) c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders_l o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 3
        ) t
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
        """
    )


SQL_LATERAL_TOP = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 3
) t
ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
"""


def q_scd_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (SCD2 validity-range) join — the third member of the
    temporal-join family next to as-of (`asof_clicks`) and interval
    (`interval_join_hot_hours`): each customer's order history defines
    priority regimes valid [order date, next order date); every lineitem
    is attributed to the regime active at its ship date. The join is
    key-equi on custkey with a range residual, then revenue per regime
    label. Per-key regime counts are bounded by order history, so the
    equi side stays uniform at scale."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    scd = orders.select(
        "o_custkey",
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_custkey",
            "l_shipdate",
            (
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (
                    F.lit(1).cast("decimal(18,4)")
                    - F.col("l_discount").cast("decimal(18,4)")
                )
            ).alias("rev"),
        )
    )
    pit = li.join(
        scd,
        (li.o_custkey == scd.o_custkey)
        & (F.col("l_shipdate") >= F.col("valid_from"))
        & (
            F.col("valid_to").isNull()
            | (F.col("l_shipdate") < F.col("valid_to"))
        ),
    )
    return (
        pit.groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            TA.r4(F.sum("rev").cast("double")).alias("revenue"),
        )
        .orderBy("prio")
    )


SQL_SCD_PIT = f"""
WITH scd AS (
  SELECT o_custkey, o_orderpriority AS prio, o_orderdate AS valid_from,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS valid_to
  FROM orders),
li AS (
  SELECT o.o_custkey, l.l_shipdate,
         CAST(l.l_extendedprice AS DECIMAL(18,4))
           * (1::DECIMAL(18,4) - CAST(l.l_discount AS DECIMAL(18,4))) AS rev
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT prio, count(*) AS n_items,
       {O.sql_r4("sum(rev)::DOUBLE")} AS revenue
FROM li JOIN scd
  ON li.o_custkey = scd.o_custkey
 AND li.l_shipdate >= scd.valid_from
 AND (scd.valid_to IS NULL OR li.l_shipdate < scd.valid_to)
GROUP BY prio ORDER BY prio
"""


def q_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish: the staging pattern every production load
    runs — write the batch to a STAGED location, run the DQ expectation
    gate (``operators/dq.py``) against the staged files, and only a fully
    green report publishes (atomic rename) the staged data. The returned
    report carries the audit rows plus a ``published`` verdict row; the
    oracle recomputes the same checks straight from the source table —
    staging must be a lossless pass-through."""
    import os
    import tempfile

    from ingestion_scripts_spark.operators import dq

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="wap_")
    staged, published = os.path.join(root, "staged"), os.path.join(root, "pub")
    ev.write.mode("overwrite").parquet(staged)
    back = spark.read.parquet(staged)
    report = dq.dq_report(
        [
            dq.expect_unique(back, "event_id"),
            dq.expect_not_null(back, "user_id"),
            dq.expect_range(back, "value", 0, 1e9),
        ]
    )
    # materialize the audit BEFORE publishing: the report plan reads the
    # staged files, which the publish rename moves out from under any
    # later re-execution (and a real WAP gate must decide on a frozen
    # audit anyway, not re-audit after publish)
    rows = [tuple(r) for r in report.collect()]
    ok = all(r[3] for r in rows)
    if ok:
        os.rename(staged, published)  # atomic publish of the audited batch
    n_pub = spark.read.parquet(published).count() if ok else 0
    rows.append(("published", 0, n_pub, ok))
    return (
        spark.createDataFrame(
            rows, "check string, n_bad bigint, n_total bigint, passed boolean"
        )
        .select(F.col("check").alias("check_name"), "n_bad", "n_total", "passed")
        .orderBy("check_name")
    )


SQL_WAP_PUBLISH = """
SELECT * FROM (
  SELECT 'unique:event_id' AS check_name,
         CAST(count(event_id) - count(DISTINCT event_id) AS BIGINT) AS n_bad,
         CAST(count(*) AS BIGINT) AS n_total,
         count(event_id) - count(DISTINCT event_id) = 0 AS passed
  FROM events
  UNION ALL
  SELECT 'not_null:user_id',
         CAST(count(*) FILTER (WHERE user_id IS NULL) AS BIGINT),
         CAST(count(*) AS BIGINT),
         count(*) FILTER (WHERE user_id IS NULL) = 0
  FROM events
  UNION ALL
  SELECT 'range:value',
         CAST(count(*) FILTER (WHERE value IS NOT NULL
                                 AND (value < 0 OR value > 1e9)) AS BIGINT),
         CAST(count(*) AS BIGINT),
         count(*) FILTER (WHERE value IS NOT NULL
                            AND (value < 0 OR value > 1e9)) = 0
  FROM events
  UNION ALL
  SELECT 'published', 0, CAST(count(*) AS BIGINT), true FROM events
) ORDER BY check_name
"""


def q_score_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source score calibration: each document's quality proxy
    (n_chars) mapped to its WITHIN-SOURCE percentile rank — the
    quantile-normalization step that makes scores comparable across
    heterogeneous sources before a global keep-threshold. Percentile =
    (rank-1)/(n-1) from exact integer window ranks; only the final
    division is float. Sources are independent window partitions —
    uniform parallelism at any corpus size."""
    doc = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    n_w = Window.partitionBy("source")
    ranked = doc.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(n_w)
    )
    return ranked.select(
        "doc_id",
        "source",
        TA.r4(
            (F.col("rk") - 1).cast("double") / (F.col("n") - 1).cast("double")
        ).alias("pct"),
    ).orderBy("doc_id")


SQL_QUANTILE_NORM = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
           AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents)
SELECT doc_id, source,
       {O.sql_r4("(rk - 1)::DOUBLE / (n - 1)::DOUBLE")} AS pct
FROM ranked ORDER BY doc_id
"""


def q_trigram_udtf_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 trigrams via the POLYMORPHIC n-gram UDTF
    (``functions/udtfs.py::make_ngrams_udtf`` — output schema derives from
    the ``n`` argument through ``analyze()``, the Spark-4 dynamic-schema
    table-function contract), laterally joined against the documents
    table. Oracle: the same trigram law as plain SQL list ops."""
    from ingestion_scripts_spark.functions.udtfs import make_ngrams_udtf

    spark.udtf.register("ngrams_udtf", make_ngrams_udtf())
    _t(spark, sf_dir, "documents").select(
        "doc_id", F.lower("text").alias("lt")
    ).createOrReplaceTempView("docs_ng_in")
    return spark.sql(
        """
        SELECT concat_ws(' ', g.w0, g.w1, g.w2) AS trigram,
               count(*) AS n
        FROM docs_ng_in d, LATERAL ngrams_udtf(d.lt, 3) g
        GROUP BY 1 ORDER BY n DESC, trigram LIMIT 20
        """
    )


SQL_TRIGRAM_UDTF = f"""
WITH toks AS (SELECT doc_id, {O.sql_tokenize_ws("lower(text)")} AS t
              FROM documents),
tri AS (
  SELECT unnest(list_transform(
           range(1, greatest(len(t) - 2, 0) + 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS trigram
  FROM toks)
SELECT trigram, count(*) AS n
FROM tri GROUP BY trigram ORDER BY n DESC, trigram LIMIT 20
"""


def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution under ``mergeSchema``: an early batch written
    WITHOUT a column, a later batch WITH it, read back as one table — the
    additive-column reality of every long-lived ingestion dataset. The
    missing column must surface as NULLs for old rows and exact values
    for new ones; the oracle reconstructs the same union from the source
    table directly."""
    import tempfile

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", F.get_json_object("props", "$.k")
        .cast("bigint")
        .alias("k")
    )
    tmp = tempfile.mkdtemp(prefix="schevo_")
    old = ev.filter(F.col("event_id") % 2 == 0).select("event_id", "event_type")
    new = ev.filter(F.col("event_id") % 2 == 1)
    old.write.mode("overwrite").parquet(tmp + "/b=0")
    new.write.mode("overwrite").parquet(tmp + "/b=1")
    back = spark.read.option("mergeSchema", True).parquet(tmp + "/b=0", tmp + "/b=1")
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


SQL_SCHEMA_EVOLUTION = """
WITH back AS (
  SELECT event_type, NULL::BIGINT AS k FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT event_type, json_extract(props, '$.k')::BIGINT FROM events
  WHERE event_id % 2 = 1)
SELECT event_type, count(*) AS n, count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k
FROM back GROUP BY event_type ORDER BY event_type
"""


def q_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit profiling — the numeric-forensics DQ check
    (synthetic or fabricated value columns drift from Benford's law).
    First significant digit comes from EXACT integer cents
    (floor(value·100 + 0.5) → string head), never from float log10, so
    the digit histogram is engine-exact; the expected share and chi²
    contribution are one float expression over exact counts."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value") > 0)
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    d = ev.select(F.substring(cents.cast("string"), 1, 1).alias("digit"))
    tot = d.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    by_digit = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    expected = F.log10(1.0 + 1.0 / F.col("digit").cast("double"))
    return (
        by_digit.join(F.broadcast(tot))
        .select(
            "digit",
            "n",
            TA.r4(F.col("n") / F.col("n_total")).alias("observed_share"),
            TA.r4(expected).alias("benford_share"),
            TA.r4(
                (F.col("n") / F.col("n_total") - expected)
                * (F.col("n") / F.col("n_total") - expected)
                / expected
            ).alias("chi2_part"),
        )
        .orderBy("digit")
    )


SQL_BENFORD = f"""
WITH d AS (
  SELECT substr(CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS VARCHAR),
                1, 1) AS digit
  FROM events WHERE value > 0),
tot AS (SELECT count(*) AS n_total FROM d),
by_digit AS (SELECT digit, count(*) AS n FROM d GROUP BY digit)
SELECT digit, n,
       {O.sql_r4("n::DOUBLE / n_total")} AS observed_share,
       {O.sql_r4("log10(1.0 + 1.0 / digit::DOUBLE)")} AS benford_share,
       {O.sql_r4("(n::DOUBLE / n_total - log10(1.0 + 1.0 / digit::DOUBLE)) * (n::DOUBLE / n_total - log10(1.0 + 1.0 / digit::DOUBLE)) / log10(1.0 + 1.0 / digit::DOUBLE)")}
         AS chi2_part
FROM by_digit, tot ORDER BY digit
"""


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (operators/retrieval.py): docs with
    doc_id % 101 == 0 act as queries (their first-8 distinct tokens are
    the query terms); top-5 documents per query by BM25 over the
    whitespace-token inverted index. The per-term contribution snaps to
    integer micro-units before the per-doc sum, so scores and ranks are
    engine-exact; the query-doc itself ranks (positive control)."""
    import ingestion_scripts_spark.operators.retrieval as R

    docs = _t(spark, sf_dir, "documents")
    qterms = (
        docs.filter(F.col("doc_id") % 101 == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(
                F.array_distinct(
                    F.slice(X.tokenize_ws(F.lower(F.col("text"))), 1, 8)
                )
            ).alias("term"),
        )
    )
    return R.bm25_topk(docs, qterms, "doc_id", "text", topk=5).orderBy(
        "query_id", "rnk"
    )


SQL_BM25_TOPK = f"""
WITH toks AS (
  SELECT doc_id, {O.sql_tokenize_ws('lower(text)')} AS toks FROM documents),
stats AS (
  SELECT count(*)::BIGINT AS n_docs, sum(len(toks))::BIGINT AS sum_dl FROM toks),
tf AS (
  SELECT doc_id, dl, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, len(toks)::BIGINT AS dl, unnest(toks) AS term FROM toks)
  GROUP BY doc_id, dl, term),
dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
q AS (
  SELECT doc_id AS query_id, unnest(list_distinct(toks[1:8])) AS term
  FROM toks WHERE doc_id % 101 = 0),
scored AS (
  SELECT q.query_id, tf.doc_id,
         CAST(floor(
           ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
           * (tf.tf * (1.2 + 1.0))
             / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * tf.dl
                               / (s.sum_dl::DOUBLE / s.n_docs::DOUBLE)))
           * 1000000.0 + 0.5) AS BIGINT) AS s_u
  FROM q JOIN tf USING (term) JOIN dft USING (term), stats s),
agg AS (
  SELECT query_id, doc_id, sum(s_u)::BIGINT AS score_u
  FROM scored GROUP BY query_id, doc_id),
rnk AS (
  SELECT query_id, doc_id, score_u,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score_u DESC, doc_id) AS INT) AS rnk
  FROM agg)
SELECT query_id, rnk, doc_id, score_u, score_u / 1000000.0 AS score
FROM rnk WHERE rnk <= 5 ORDER BY query_id, rnk
"""


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-inverted-index phrase search (operators/retrieval.py):
    the 2 most frequent corpus trigrams (count desc, trigram asc — the
    vocab_topn tiebreak) are the phrase set; every (phrase, doc)
    occurrence count comes from aligned-postings intersection
    (pos - offset grouping), never a per-phrase text rescan. The oracle
    enumerates token trigrams per doc — overlapping starts count in both
    formulations, so the laws agree exactly."""
    import ingestion_scripts_spark.operators.retrieval as R

    docs = _t(spark, sf_dir, "documents")
    tri = docs.select(
        F.explode(X.ngrams(X.tokenize_ws(F.lower(F.col("text"))), 3)).alias("g")
    )
    top = (
        tri.groupBy("g")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("g").asc())
        .limit(2)
    )
    phrases = top.select(
        F.col("g").alias("phrase"), F.split(F.col("g"), " ").alias("terms")
    )
    return R.phrase_hits(docs, phrases, "doc_id", "text").orderBy(
        "phrase", "doc_id"
    )


SQL_PHRASE_SEARCH = f"""
WITH toks AS (
  SELECT doc_id, {O.sql_tokenize_ws('lower(text)')} AS toks FROM documents),
grams AS (
  SELECT doc_id, unnest({O.sql_ngrams('toks', 3)}) AS g FROM toks),
top2 AS (
  SELECT g FROM grams GROUP BY g ORDER BY count(*) DESC, g LIMIT 2)
SELECT top2.g AS phrase, grams.doc_id, count(*)::BIGINT AS n_hits
FROM grams JOIN top2 USING (g)
GROUP BY phrase, grams.doc_id
ORDER BY phrase, grams.doc_id
"""


#: token-budget recipe (whitespace tokens per source; ~1/5 of each
#: source's sf0.01 token mass so the take is partial at every SF)
_TOKEN_BUDGETS = {"src0": 700, "src3": 150}
_TOKEN_BUDGET_DEFAULT = 300


def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing (operators/retrieval.py): walk each
    source's documents in deterministic hash64 order and take documents
    while the running token count before the doc is under the source's
    budget — the "N tokens of source X" recipe step, laid out as a
    per-shard prefix sum (no global order; packs independently at
    scale)."""
    import ingestion_scripts_spark.operators.retrieval as R

    docs = _t(spark, sf_dir, "documents")
    ntok = F.size(X.tokenize_ws(F.lower(F.col("text"))))
    return R.token_budget_take(
        docs, "source", "doc_id", ntok, _TOKEN_BUDGETS, _TOKEN_BUDGET_DEFAULT
    ).orderBy("source", "cum_before", "doc_id")


_TOKEN_BUDGET_CASE = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {b}" for s, b in sorted(_TOKEN_BUDGETS.items()))
    + f" ELSE {_TOKEN_BUDGET_DEFAULT} END"
)
SQL_TOKEN_BUDGET_MIX = f"""
WITH d AS (
  SELECT doc_id, source,
         len({O.sql_tokenize_ws('lower(text)')})::BIGINT AS ntok,
         {O.sql_hash64("(source || '|' || doc_id)")} AS h
  FROM documents),
c AS (
  SELECT doc_id, source, ntok,
         coalesce(sum(ntok) OVER (
           PARTITION BY source ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS cum_before
  FROM d)
SELECT doc_id, source, ntok, cum_before
FROM c WHERE cum_before < {_TOKEN_BUDGET_CASE}
ORDER BY source, cum_before, doc_id
"""


def q_pagerank_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (operators/graph.py) over the event-type Markov
    transition graph (same edge law as ``event_transitions``): 3 exact
    integer-unit rounds — each round is one keyed join + one keyed agg,
    the shape that runs a billion-node graph as 3 ordinary shuffles. The
    ranks are bit-identical across engines (pure BIGINT arithmetic), so
    the oracle unrolls the same 3 rounds as CTEs."""
    import ingestion_scripts_spark.operators.graph as G

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return G.pagerank_int(edges, "src", "dst", "w", iters=3).orderBy(
        F.col("pr_u").desc(), "node"
    )


def _pagerank_sql(iters: int = 3) -> str:
    its, prev = [], "r0"
    for i in range(1, iters + 1):
        its.append(
            f"""it{i} AS (
  SELECT n.node, CAST(150000 + (85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(sum((p.r * e.w) // e.wt) AS BIGINT) AS c
    FROM e JOIN {prev} p ON e.src = p.node
    GROUP BY e.dst) s ON n.node = s.node)"""
        )
        prev = f"it{i}"
    return f"""
WITH pairs AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst
  FROM events),
e0 AS (
  SELECT src, dst, count(*)::BIGINT AS w
  FROM pairs WHERE dst IS NOT NULL GROUP BY src, dst),
e AS (
  SELECT e0.src, e0.dst, e0.w, o.wt
  FROM e0 JOIN (SELECT src, sum(w)::BIGINT AS wt FROM e0 GROUP BY src) o
    ON e0.src = o.src),
nodes AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
{",".join(its)}
SELECT node, r AS pr_u, r / 1000000.0 AS pr
FROM {prev} ORDER BY pr_u DESC, node
"""


SQL_PAGERANK = _pagerank_sql(3)


def q_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold-sensitivity report: every LSH candidate pair's
    exact Jaccard, bucketed into tenths with the INTEGER law
    ``bucket = min((10·|∩|) div |∪|, 9)`` (no float rounding anywhere),
    plus the cumulative pairs-at-or-above curve — the artifact that
    answers "how many pairs does threshold t delete?" before committing
    a 100 TB dedup run. One banded-LSH candidate pass feeds all
    thresholds; the report itself is a 10-row aggregate."""
    docs = _t(spark, sf_dir, "documents")
    sh = docs.select("doc_id", D.shingles(F.col("text"), 3).alias("sh"))
    cand = D.minhash_lsh_candidates(docs, "doc_id", "text", 3, 16, 4)
    pairs = (
        cand.join(
            sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint").alias("inter"),
            F.size(F.array_distinct(F.concat("sh_a", "sh_b")))
            .cast("bigint")
            .alias("uni"),
        )
    )
    bk = pairs.select(
        "id_a",
        "id_b",
        F.least(F.expr("(10 * inter) div uni"), F.lit(9)).cast("int").alias("bucket"),
    )
    per = bk.groupBy("bucket").agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    ndocs = (
        bk.select("bucket", F.explode(F.array("id_a", "id_b")).alias("d"))
        .groupBy("bucket")
        .agg(F.countDistinct("d").cast("bigint").alias("n_docs"))
    )
    w = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per.join(ndocs, "bucket")
        .withColumn("threshold_lo", F.col("bucket") / F.lit(10.0))
        .withColumn("cum_pairs", F.sum("n_pairs").over(w).cast("bigint"))
        .select("bucket", "threshold_lo", "n_pairs", "n_docs", "cum_pairs")
        .orderBy("bucket")
    )


SQL_DEDUP_THRESHOLD_CURVE = f"""
WITH sh AS (SELECT doc_id, {_SH} AS sh FROM documents),
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
  SELECT cand.id_a, cand.id_b,
         len(list_intersect(a.sh, b.sh))::BIGINT AS inter,
         len(list_distinct(a.sh || b.sh))::BIGINT AS uni
  FROM cand JOIN sh a ON cand.id_a = a.doc_id JOIN sh b ON cand.id_b = b.doc_id),
bk AS (
  SELECT id_a, id_b, CAST(least((10 * inter) // uni, 9) AS INT) AS bucket
  FROM pairs),
per AS (SELECT bucket, count(*)::BIGINT AS n_pairs FROM bk GROUP BY bucket),
nd AS (
  SELECT bucket, count(DISTINCT d)::BIGINT AS n_docs
  FROM (SELECT bucket, unnest([id_a, id_b]) AS d FROM bk) GROUP BY bucket)
SELECT per.bucket, per.bucket / 10.0 AS threshold_lo, per.n_pairs, nd.n_docs,
       CAST(sum(per.n_pairs) OVER (ORDER BY per.bucket DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_pairs
FROM per JOIN nd ON per.bucket = nd.bucket
ORDER BY per.bucket
"""


def q_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup (operators/dedup.py): today's batch
    (doc_id % 10 == 0) against the existing corpus index (the rest) —
    band buckets of the two sides EQUI-join (new-side signatures only are
    computed per run; the index's (id, band, bucket) table persists), so
    daily ingest never re-pays the full-corpus self-join. Exact-Jaccard
    verification on candidates, threshold 0.8."""
    docs = _t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    index = docs.filter(F.col("doc_id") % 10 != 0)
    return D.minhash_incremental_pairs(
        index, new, "doc_id", "text", threshold=0.8
    ).orderBy("new_id", "index_id")


SQL_INCREMENTAL_NEAR_DUP = f"""
WITH sh AS (SELECT doc_id, {_SH} AS sh FROM documents),
sig AS (SELECT doc_id, sh, {_SIG} AS sig FROM sh WHERE len(sh) > 0),
banded AS (
  SELECT doc_id, b AS band,
         md5(array_to_string(list_transform(sig[b*4+1:b*4+4], x -> x::VARCHAR), ',')) AS bucket
  FROM sig, unnest([0,1,2,3]) AS u(b)),
cand AS (
  SELECT DISTINCT n.doc_id AS new_id, i.doc_id AS index_id
  FROM banded n JOIN banded i ON n.band = i.band AND n.bucket = i.bucket
  WHERE n.doc_id % 10 = 0 AND i.doc_id % 10 <> 0)
SELECT new_id, index_id,
  round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        len(list_distinct(a.sh || b.sh)), 6) AS jaccard
FROM cand JOIN sh a ON cand.new_id = a.doc_id JOIN sh b ON cand.index_id = b.doc_id
WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
            len(list_distinct(a.sh || b.sh)), 6) >= 0.8
ORDER BY new_id, index_id
"""


def q_embedding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-data QA profile per label: count, distinct dims (a ragged
    embedding column is corrupt), zero-norm count, min/max/avg L2 norm.
    Norms use the same per-row fold law as the similarity family; row-level
    norms snap to 1e-4 units so the cross-row aggregate is an exact integer
    sum (avg independent of aggregation order). One keyed agg — profiles
    a 100 TB vector table in a single pass."""
    emb = _t(spark, sf_dir, "embeddings")
    # cast BEFORE squaring: the column is float32, and a float32 square
    # rounds differently from the oracle's DOUBLE*DOUBLE whenever the norm
    # lands near a floor(x*1e4+0.5) snap boundary (ADVICE r3)
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    rows = emb.select(
        "label",
        F.size("embedding").alias("dim"),
        F.floor(norm * F.lit(10_000.0) + F.lit(0.5)).cast("bigint").alias("norm_u"),
    )
    return (
        rows.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.countDistinct("dim").cast("bigint").alias("n_dims"),
            F.sum(F.when(F.col("norm_u") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_zero"),
            (F.min("norm_u") / F.lit(10_000.0)).alias("min_norm"),
            (F.max("norm_u") / F.lit(10_000.0)).alias("max_norm"),
            TA.r4(F.sum("norm_u").cast("double") / F.count(F.lit(1)) / F.lit(10_000.0)).alias(
                "avg_norm"
            ),
        )
        .orderBy("label")
    )


SQL_EMBEDDING_PROFILE = f"""
WITH rows_ AS (
  SELECT label, len(embedding)::BIGINT AS dim,
         CAST(floor(sqrt(list_aggregate(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
              * 10000.0 + 0.5) AS BIGINT) AS norm_u
  FROM embeddings)
SELECT label,
       count(*)::BIGINT AS n_vecs,
       count(DISTINCT dim)::BIGINT AS n_dims,
       sum(CASE WHEN norm_u = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero,
       min(norm_u) / 10000.0 AS min_norm,
       max(norm_u) / 10000.0 AS max_norm,
       {O.sql_r4('sum(norm_u)::DOUBLE / count(*) / 10000.0')} AS avg_norm
FROM rows_ GROUP BY label ORDER BY label
"""


def q_dup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram (how much of the corpus sits in
    2-doc twins vs large boilerplate families): connected components over
    the MinHash near-dup graph → size per cluster → clusters per size.
    Singletons are their own cluster, so the histogram partitions the
    whole corpus; Σ size·n_clusters == corpus size."""
    assigned = q_dup_clusters(spark, sf_dir)
    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .orderBy("cluster_size")
    )


SQL_DUP_CLUSTER_STATS = f"""
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
comp AS (SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a),
assigned AS (
  SELECT d.doc_id, CAST(coalesce(c.comp, d.doc_id) AS BIGINT) AS cluster_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
sizes AS (
  SELECT cluster_id, count(*)::BIGINT AS cluster_size
  FROM assigned GROUP BY cluster_id)
SELECT cluster_size, count(*)::BIGINT AS n_clusters
FROM sizes GROUP BY cluster_size ORDER BY cluster_size
"""


def q_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-level MinHash similarity (operators/dedup.py): one
    signature per SOURCE over the union of its docs' shingles, pairwise
    agreement → near-mirror source detection without any doc-level
    comparison. The per-(source, seed) min aggregates with map-side
    partials; the pairwise stage sees only |sources|·num_hashes rows."""
    docs = _t(spark, sf_dir, "documents")
    return D.container_minhash_pairs(docs, "source", "text").orderBy(
        "src_a", "src_b"
    )


_CW_H1 = O.sql_hash64("s")
_CW_H2 = f"({O.sql_hash64(chr(40) + 's || ' + chr(39) + '#' + chr(39) + chr(41))} % {1 << 40})"
SQL_SOURCE_SIMILARITY = f"""
WITH sh AS (
  SELECT source AS c, unnest({O.sql_shingles('text', 3)}) AS s FROM documents),
hs AS (
  SELECT c, i AS seed, ({_CW_H1}) + i * {_CW_H2} AS h
  FROM sh, unnest(range(0, 16)) AS u(i)),
sig AS (SELECT c, seed, min(h) AS mh FROM hs GROUP BY c, seed),
pairs AS (
  SELECT a.c AS src_a, b.c AS src_b,
         sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END)::BIGINT AS n_agree
  FROM sig a JOIN sig b ON a.seed = b.seed AND a.c < b.c
  GROUP BY 1, 2)
SELECT src_a, src_b, n_agree, n_agree / 16.0 AS est_jaccard
FROM pairs ORDER BY src_a, src_b
"""


def q_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH quality harness (the dedup analog of ``ann_recall``): exact
    PPJoin pairs at Jaccard ≥ 0.7 are ground truth; the MinHash-LSH path
    at the same threshold is the candidate under test. Because LSH
    candidates are exact-verified, false positives are impossible —
    ``n_extra`` must be 0 — and the single number that matters is recall
    (pairs the banding missed). One-row report."""
    from ingestion_scripts_spark.operators.setjoin import setsim_join

    docs = _t(spark, sf_dir, "documents")
    exact = setsim_join(
        docs.select("doc_id", D.shingles(F.col("text"), 3).alias("tk")),
        "doc_id", "tk", 7, 10,
    ).select("id_a", "id_b")
    approx = D.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.7).select(
        "id_a", "id_b", F.lit(1).alias("__f")
    )
    j = exact.withColumn("__e", F.lit(1)).join(approx, ["id_a", "id_b"], "full")
    return j.agg(
        F.sum(F.coalesce(F.col("__e"), F.lit(0))).cast("bigint").alias("n_exact"),
        F.sum(
            F.when(F.col("__e").isNotNull() & F.col("__f").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_found"),
        F.sum(
            F.when(F.col("__e").isNotNull() & F.col("__f").isNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_missed"),
        F.sum(
            F.when(F.col("__e").isNull() & F.col("__f").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_extra"),
        TA.r4(
            F.sum(
                F.when(F.col("__e").isNotNull() & F.col("__f").isNotNull(), 1).otherwise(0)
            )
            / F.greatest(F.sum(F.coalesce(F.col("__e"), F.lit(0))), F.lit(1))
        ).alias("recall"),
    )


SQL_DEDUP_RECALL = f"""
WITH toks AS (
  SELECT doc_id, {O.sql_shingles("text", 3)} AS tk FROM documents),
ex0 AS (SELECT doc_id, len(tk) AS sz, unnest(tk) AS tok FROM toks),
dfq AS (SELECT tok, count(*) AS df FROM ex0 GROUP BY tok),
rnk AS (
  SELECT doc_id, sz, ex0.tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY df, ex0.tok) AS rn
  FROM ex0 JOIN dfq USING (tok)),
pre AS (SELECT * FROM rnk WHERE rn <= sz - (7*sz + 9) // 10 + 1),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pre a JOIN pre b
    ON a.tok = b.tok AND a.doc_id < b.doc_id
   AND 7 * greatest(a.sz, b.sz) <= 10 * least(a.sz, b.sz)),
exact AS (
  SELECT id_a, id_b
  FROM cand JOIN toks x ON id_a = x.doc_id JOIN toks y ON id_b = y.doc_id
  WHERE 10 * len(list_intersect(x.tk, y.tk)) >= 7 * len(list_distinct(x.tk || y.tk))),
sig AS (SELECT doc_id, tk AS sh, {O.sql_minhash_signature('tk', 16)} AS sig
        FROM toks WHERE len(tk) > 0),
banded AS (
  SELECT doc_id, b AS band,
         md5(array_to_string(list_transform(sig[b*4+1:b*4+4], x -> x::VARCHAR), ',')) AS bucket
  FROM sig, unnest([0,1,2,3]) AS u(b)),
lcand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
approx AS (
  SELECT id_a, id_b
  FROM lcand JOIN toks x ON id_a = x.doc_id JOIN toks y ON id_b = y.doc_id
  WHERE round(len(list_intersect(x.tk, y.tk))::DOUBLE /
              len(list_distinct(x.tk || y.tk)), 6) >= 0.7),
j AS (
  SELECT coalesce(e.id_a, a.id_a) AS id_a, coalesce(e.id_b, a.id_b) AS id_b,
         (e.id_a IS NOT NULL) AS in_e, (a.id_a IS NOT NULL) AS in_a
  FROM exact e FULL JOIN approx a ON e.id_a = a.id_a AND e.id_b = a.id_b)
SELECT sum(CASE WHEN in_e THEN 1 ELSE 0 END)::BIGINT AS n_exact,
       sum(CASE WHEN in_e AND in_a THEN 1 ELSE 0 END)::BIGINT AS n_found,
       sum(CASE WHEN in_e AND NOT in_a THEN 1 ELSE 0 END)::BIGINT AS n_missed,
       sum(CASE WHEN NOT in_e AND in_a THEN 1 ELSE 0 END)::BIGINT AS n_extra,
       {O.sql_r4('sum(CASE WHEN in_e AND in_a THEN 1 ELSE 0 END) / greatest(sum(CASE WHEN in_e THEN 1 ELSE 0 END), 1)')} AS recall
FROM j
"""


def q_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup as a REAL streaming job: three deterministic
    micro-batches (doc_id % 3); each ``foreachBatch`` first drops in-batch
    near-dups (id_b of any pair, the curation rule), then drops docs with
    a near-twin in the ACCUMULATED KEPT INDEX (the reference's S3
    periodic-state-refresh shape), and appends the survivors. Each index
    row carries its precomputed LSH band buckets, so an arriving batch
    MinHashes only ITSELF — candidate generation equi-joins the stored
    buckets (an O(index) narrow explode, ~free next to the md5/minhash
    chain it replaces) and verification recomputes shingles for candidate
    index docs only. LSH candidates are per-pair (signatures don't depend on
    the candidate set), so the final kept set equals the unrolled batch
    law the oracle computes from ONE full-corpus pair table."""
    import glob
    import os
    import tempfile
    import time

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    src = tempfile.mkdtemp(prefix="incdd_src_")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b{i}")
    now = time.time()
    for i in range(3):
        for p in glob.glob(f"{src}/b{i}/*.parquet"):
            os.utime(p, (now - 300 + 50 * i, now - 300 + 50 * i))
    sink = tempfile.mkdtemp(prefix="incdd_sink_") + "/out"

    def handle(batch_df: DataFrame, _bid: int) -> None:
        # Production shape: the batch's shingles and LSH band buckets are
        # computed ONCE and reused for both the in-batch pair pass and
        # the cross-vs-index pass; the index row carries its OWN (band,
        # bucket) list, so an arriving batch never re-hashes the
        # accumulated corpus — per-batch cost is O(batch) hashing plus an
        # O(index) explode of precomputed buckets (a narrow map, ~free
        # next to the md5/minhash chain it replaces). One write and one
        # read per batch.
        if batch_df.isEmpty():
            return
        enriched = batch_df.select(
            "doc_id",
            "text",
            D.shingles(F.col("text"), 3).alias("sh"),
        ).persist()
        bn = D.banded_buckets(batch_df, "doc_id", "text").persist()
        jacc = F.round(D.jaccard(F.col("sh_a"), F.col("sh_b")), 6)
        sh_only = enriched.select("doc_id", "sh")
        in_drops = (
            D.pairs_from_banded(bn, "doc_id")
            .join(sh_only.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
            .join(sh_only.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
            .filter(jacc >= 0.8)
            .select(F.col("id_b").alias("doc_id"))
            .dropDuplicates()
        )
        kept = enriched.join(in_drops, "doc_id", "left_anti")
        if glob.glob(f"{sink}/*.parquet"):
            index = spark.read.parquet(sink)
            idx_bands = index.select(
                F.col("doc_id").alias("index_id"), F.explode("bands").alias("bb")
            ).select("index_id", "bb.band", "bb.bucket")
            cand = (
                bn.select(F.col("doc_id").alias("new_id"), "band", "bucket")
                .join(kept.select(F.col("doc_id").alias("new_id")), "new_id")
                .join(idx_bands, ["band", "bucket"])
                .select("new_id", "index_id")
                .dropDuplicates()
            )
            # shingles for CANDIDATE index docs only — never the full index
            idx_sh = (
                cand.select(F.col("index_id").alias("doc_id"))
                .dropDuplicates()
                .join(index, "doc_id")
                .select(
                    F.col("doc_id").alias("index_id"),
                    D.shingles(F.col("text"), 3).alias("sh_b"),
                )
            )
            cross_drops = (
                cand.join(
                    sh_only.select(F.col("doc_id").alias("new_id"), F.col("sh").alias("sh_a")),
                    "new_id",
                )
                .join(idx_sh, "index_id")
                .filter(jacc >= 0.8)
                .select(F.col("new_id").alias("doc_id"))
                .dropDuplicates()
            )
            kept = kept.join(cross_drops, "doc_id", "left_anti")
        # the index row carries its bucket list; shingles are NOT stored
        # (they're corpus-sized — recomputed per candidate instead)
        (
            kept.drop("sh")
            .join(
                bn.groupBy("doc_id").agg(
                    F.collect_list(F.struct("band", "bucket")).alias("bands")
                ),
                "doc_id",
                "left",
            )
            .withColumn(
                "bands",
                F.coalesce(
                    F.col("bands"),
                    F.array().cast("array<struct<band:int,bucket:string>>"),
                ),
            )
            .write.mode("append")
            .parquet(sink)
        )
        enriched.unpersist()
        bn.unpersist()

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink).select("doc_id").orderBy("doc_id")


SQL_STREAM_INCREMENTAL_DEDUP = f"""
WITH sh AS (SELECT doc_id, {_SH} AS sh FROM documents),
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
e AS (SELECT id_a AS x, id_b AS y FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
kept0 AS (
  SELECT doc_id FROM documents WHERE doc_id % 3 = 0
    AND doc_id NOT IN (SELECT id_b FROM pairs
                       WHERE id_a % 3 = 0 AND id_b % 3 = 0)),
kept1 AS (
  SELECT doc_id FROM documents WHERE doc_id % 3 = 1
    AND doc_id NOT IN (SELECT id_b FROM pairs
                       WHERE id_a % 3 = 1 AND id_b % 3 = 1)
    AND doc_id NOT IN (SELECT e.x FROM e JOIN kept0 k ON e.y = k.doc_id)),
kept2 AS (
  SELECT doc_id FROM documents WHERE doc_id % 3 = 2
    AND doc_id NOT IN (SELECT id_b FROM pairs
                       WHERE id_a % 3 = 2 AND id_b % 3 = 2)
    AND doc_id NOT IN (
      SELECT e.x FROM e JOIN (SELECT doc_id FROM kept0
                              UNION ALL SELECT doc_id FROM kept1) k
        ON e.y = k.doc_id))
SELECT doc_id FROM kept0
UNION ALL SELECT doc_id FROM kept1
UNION ALL SELECT doc_id FROM kept2
ORDER BY doc_id
"""


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: chars-per-token and tokens-per-
    word under the BPE-ish tokenizer — THE metric for how well a
    tokenizer serves each language (high fertility = wasted context
    budget). All sums are exact BIGINTs; only the final ratios are
    float, computed from identical integers on both engines."""
    docs = _t(spark, sf_dir, "documents")
    rows = docs.select(
        "lang",
        F.length("text").cast("bigint").alias("n_chars"),
        TA.token_count_bpe(F.col("text")).cast("bigint").alias("n_bpe"),
        F.size(X.tokenize_ws(F.col("text"))).cast("bigint").alias("n_words"),
    )
    return (
        rows.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars"),
            F.sum("n_bpe").cast("bigint").alias("bpe_tokens"),
            F.sum("n_words").cast("bigint").alias("words"),
            TA.r4(F.sum("n_chars") / F.greatest(F.sum("n_bpe"), F.lit(1))).alias(
                "chars_per_token"
            ),
            TA.r4(F.sum("n_bpe") / F.greatest(F.sum("n_words"), F.lit(1))).alias(
                "fertility"
            ),
        )
        .orderBy("lang")
    )


SQL_TOKENIZER_FERTILITY = f"""
WITH rows_ AS (
  SELECT lang, length(text)::BIGINT AS n_chars,
         {O.sql_token_count_bpe('text')} AS n_bpe,
         len({O.sql_tokenize_ws('text')})::BIGINT AS n_words
  FROM documents)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS chars,
       sum(n_bpe)::BIGINT AS bpe_tokens,
       sum(n_words)::BIGINT AS words,
       {O.sql_r4('sum(n_chars)::DOUBLE / greatest(sum(n_bpe), 1)')} AS chars_per_token,
       {O.sql_r4('sum(n_bpe)::DOUBLE / greatest(sum(n_words), 1)')} AS fertility
FROM rows_ GROUP BY lang ORDER BY lang
"""


def q_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified holdout: within each lang, docs rank by hash64
    (deterministic shuffle) and every 5th ranked doc is eval — EXACTLY
    20% per stratum (hash-threshold splits like ``dataset_split`` only
    hit the rate in expectation, which matters when a stratum is small).
    One window shuffle keyed by lang."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        X.hash64(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        docs.select("doc_id", "lang")
        .withColumn("rnk", F.row_number().over(w))
        .select(
            "doc_id",
            "lang",
            F.when(F.col("rnk") % 5 == 0, F.lit("eval"))
            .otherwise(F.lit("train"))
            .alias("split"),
        )
        .orderBy("doc_id")
    )


SQL_STRATIFIED_SPLIT = f"""
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY
           {O.sql_hash64("('strat:' || doc_id)")}, doc_id) AS rnk
  FROM documents)
SELECT doc_id, lang,
       CASE WHEN rnk % 5 = 0 THEN 'eval' ELSE 'train' END AS split
FROM r ORDER BY doc_id
"""


def q_heavy_hitter_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality harness (completes the family with ``ann_recall``
    and ``dedup_recall``): exact top-20 users by event count vs the CMS
    top-20 — overlap, recall, and the worst overestimate among the CMS
    picks (CMS never undercounts, so overestimate ≥ 0 is an invariant).
    One-row report; the exact side is itself a keyed agg + bounded
    top-k."""
    from ingestion_scripts_spark.operators.sketches import cms_estimate, cms_sketch

    ev = _t(spark, sf_dir, "events")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ex20 = exact.orderBy(F.col("n").desc(), F.col("user_id").asc()).limit(20)
    cms20 = (
        cms_estimate(cms_sketch(ev, "user_id"), ev.select("user_id").distinct(),
                     "user_id", out_col="est_count")
        .orderBy(F.col("est_count").desc(), F.col("user_id").asc())
        .limit(20)
    )
    ov = ex20.join(cms20, "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap")
    )
    mo = cms20.join(exact, "user_id").agg(
        F.max(F.col("est_count") - F.col("n")).cast("bigint").alias("max_overestimate")
    )
    return ov.crossJoin(mo).select(
        "n_overlap",
        TA.r4(F.col("n_overlap") / F.lit(20.0)).alias("recall"),
        "max_overestimate",
    )


def _sql_heavy_hitter_recall() -> str:
    from ingestion_scripts_spark.operators.sketches import sql_cms_estimate

    inner = sql_cms_estimate("events", "user_id", out_col="est_count")
    return f"""
WITH exact AS (SELECT user_id, count(*)::BIGINT AS n FROM events GROUP BY user_id),
ex20 AS (SELECT user_id FROM exact ORDER BY n DESC, user_id LIMIT 20),
cms AS (SELECT CAST(__k AS BIGINT) AS user_id, est_count FROM ({inner})),
cms20 AS (SELECT user_id, est_count FROM cms
          ORDER BY est_count DESC, user_id LIMIT 20)
SELECT
  (SELECT count(*) FROM ex20 JOIN cms20 USING (user_id))::BIGINT AS n_overlap,
  {O.sql_r4('(SELECT count(*) FROM ex20 JOIN cms20 USING (user_id)) / 20.0')} AS recall,
  (SELECT max(est_count - n) FROM cms20 JOIN exact USING (user_id))::BIGINT
    AS max_overestimate
"""


def q_path_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step path-motif mining over each user's event stream (funnel
    discovery beyond the first-order ``event_transitions``): two leads in
    one per-user window pass, then a keyed count and a bounded top-10.
    Spark ``F.concat`` NULL-propagates exactly like the oracle's ``||``,
    so stream-tail windows (missing leads) drop identically on both
    engines."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    path = F.concat(
        F.col("event_type"),
        F.lit(">"),
        F.lead("event_type", 1).over(w),
        F.lit(">"),
        F.lead("event_type", 2).over(w),
    )
    return (
        ev.select(path.alias("path"))
        .where(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(10)
    )


SQL_PATH_MOTIFS = """
WITH p AS (
  SELECT event_type || '>' || lead(event_type, 1) OVER w
         || '>' || lead(event_type, 2) OVER w AS path
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT path, count(*)::BIGINT AS n
FROM p WHERE path IS NOT NULL
GROUP BY path ORDER BY n DESC, path LIMIT 10
"""


#: ONE literal ANSI string executed VERBATIM by both engines — the
#: spark.sql front door (catalog.register_testdata) and the DuckDB oracle
#: run the identical text, so this query certifies dialect-portability of
#: the whole path: catalog → parser → optimizer → execution.
SQL_PORTABLE = """
SELECT n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= DATE '1995-01-01'
  AND o.o_orderdate < DATE '1996-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""


def q_sql_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door end-to-end: testdata registered as temp views
    (``catalog.register_testdata``), then ``spark.sql`` runs the SAME
    literal string the DuckDB oracle runs — zero dialect translation.
    Catalyst plans it identically to the DataFrame form (broadcast dims,
    partial aggs), which PLANS.md documents for the star-join family."""
    from ingestion_scripts_spark.catalog import register_testdata

    register_testdata(spark, sf_dir)
    return spark.sql(SQL_PORTABLE)


def q_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series linear interpolation: per-user daily purchase value on
    the dense calendar grid, silent days interpolated between the
    surrounding observed days — the imputation step between gap-fill
    (zeros) and modeling. The carried values come from `ignorenulls`
    running windows (last-before / first-after), so one keyed window
    shuffle serves both directions; observed day sums accumulate as
    DECIMAL, and the interpolation weight is a ratio of exact day
    counts."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("v")
    )
    spans = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    cal = spans.select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    g = cal.join(daily, ["user_id", "day"], "left")
    wp = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        0, Window.unboundedFollowing
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    pv = F.last("v", ignorenulls=True).over(wp)
    pd_ = F.last(obs_day, ignorenulls=True).over(wp)
    nv = F.first("v", ignorenulls=True).over(wn)
    nd = F.first(obs_day, ignorenulls=True).over(wn)
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        pv + (nv - pv) * F.datediff(F.col("day"), pd_) / F.datediff(nd, pd_)
    )
    return (
        g.select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            TA.r4(interp).alias("value"),
            F.when(F.col("v").isNotNull(), 1).otherwise(0).cast("int").alias(
                "is_observed"
            ),
        )
        .orderBy("user_id", "day")
    )


SQL_LINEAR_INTERPOLATION = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS v
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
spans AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
cal AS (
  SELECT user_id,
         unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
                                INTERVAL 1 DAY))::DATE AS day
  FROM spans),
g AS (
  SELECT c.user_id, c.day, d.v
  FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day),
filled AS (
  SELECT user_id, day, v,
         last_value(v IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
           OVER wp AS pd,
         first_value(v IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
           OVER wn AS nd
  FROM g
  WINDOW wp AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       {O.sql_r4("CASE WHEN v IS NOT NULL THEN v ELSE pv + (nv - pv) * date_diff('day', pd, day) / date_diff('day', pd, nd) END")} AS value,
       CAST(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS INT) AS is_observed
FROM filled ORDER BY user_id, day
"""


def q_bloom_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned big-big join (operators/bloom.py): orders join a
    filtered customer segment, but the probe side is Bloom-filtered
    BEFORE its shuffle — the bitmap (≤ m/64 longs, 1-row broadcast)
    removes ~4/5 of the order rows pre-exchange; the exact join scrubs
    the bitmap's false positives, so the result is bit-identical to the
    plain join (which IS the oracle). The explicit form of Spark's
    runtime bloom-filter injection, as a composable operator."""
    from ingestion_scripts_spark.operators.bloom import bloom_pruned_join

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderpriority", "o_totalprice"
    )
    seg = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select("c_custkey")
    )
    return (
        bloom_pruned_join(orders, seg, "c_custkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


SQL_BLOOM_JOIN = """
SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
       round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)::DOUBLE AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'AUTOMOBILE'
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal RESIZE path (operators/multimodal.py::resize_images):
    binary payloads through Arrow-batched mapInPandas with the pluggable
    (here deterministic-fake, honestly labeled) resize kernel — 8×8
    output. The oracle recomputes the fake kernel's exact bytes
    (md5-digest cycle truncated to w·h) and compares the full hex, so the
    whole Arrow binary round-trip is value-checked, not just row counts."""
    from ingestion_scripts_spark.operators.multimodal import (
        resize_images,
        text_to_media,
    )

    docs = _t(spark, sf_dir, "documents")
    media = text_to_media(docs)
    resized = resize_images(media, width=8, height=8)
    return resized.select(
        "media_id",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.lower(F.hex("payload")).alias("payload_hex"),
        F.col("meta.width").cast("int").alias("width"),
        F.col("meta.height").cast("int").alias("height"),
    ).orderBy("media_id")


#: fake_resize emits (md5_digest_bytes cycled)[:w*h]; 8*8 = 64 = 4 whole
#: 16-byte digests, so the hex is exactly repeat(md5_hex, 4)
SQL_MULTIMODAL_RESIZE = """
SELECT doc_id AS media_id,
       CAST(64 AS BIGINT) AS n_bytes,
       repeat(md5(text), 4) AS payload_hex,
       CAST(8 AS INT) AS width, CAST(8 AS INT) AS height
FROM documents ORDER BY media_id
"""


def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session LAST-touch attribution (the completeness twin of
    ``first_touch_attribution``): every purchase credits the most recent
    click AT-OR-BEFORE it within its 30-min-gap session — a running
    ``last(..., ignorenulls)`` over the session-scoped ordered frame, so
    clicks after the purchase never attribute (unlike first-touch's
    whole-session scan, which is the deliberate difference)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(wu))
    new_s = F.when(gap > 1_800_000_000, 1).otherwise(0)
    sess = ev.withColumn(
        "sid",
        F.sum(F.when(F.lag("ts").over(wu).isNull(), 0).otherwise(new_s)).over(
            wu.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ws = (
        Window.partitionBy("user_id", "sid")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.col("event_id")), ignorenulls=True
    ).over(ws)
    return (
        sess.withColumn("lc", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.coalesce(F.col("lc"), F.lit(-1)).cast("bigint").alias(
                "attributed_click_id"
            ),
        )
        .orderBy("purchase_id")
    )


SQL_LAST_TOUCH = """
WITH flagged AS (
  SELECT event_id, ts, user_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL THEN 0
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
              ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged),
lc AS (
  SELECT *, last_value(CASE WHEN event_type = 'click' THEN event_id END
                       IGNORE NULLS)
            OVER (PARTITION BY user_id, sid ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lcid
  FROM sess)
SELECT event_id AS purchase_id,
       CAST(coalesce(lcid, -1) AS BIGINT) AS attributed_click_id
FROM lc WHERE event_type = 'purchase'
ORDER BY purchase_id
"""


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier detection (the OOD-filtering curation op):
    distance to the corpus centroid, top-20 farthest vectors. The
    centroid is EXACT — components snap to int64 micro-units, sum as
    integers, divide with integer ``div`` (the k-means re-centering law)
    — so every engine/partitioning computes the identical centroid; the
    squared distance then snaps to micro-units for an integer-exact
    ranking."""
    emb = _t(spark, sf_dir, "embeddings")
    snapped = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * F.lit(1_000_000.0) + F.lit(0.5)).cast(
                "bigint"
            ),
        ).alias("eu"),
    )
    # component-wise exact sums: explode (index, value), groupBy index
    comp = (
        snapped.select(F.posexplode("eu").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum("v").cast("bigint").alias("s"), F.count(F.lit(1)).cast("bigint").alias("n"))
        .select("i", F.expr("s div n").alias("c"))
    )
    cent = comp.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("i", "c"))).alias("ic")
    ).select(F.transform("ic", lambda s: s["c"]).alias("cent"))
    d2u = F.aggregate(
        F.zip_with(
            F.col("eu"), F.col("cent"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        snapped.crossJoin(F.broadcast(cent))
        .select("vec_id", d2u.alias("d2_u"))
        .orderBy(F.col("d2_u").desc(), F.col("vec_id").asc())
        .limit(20)
        .select(
            "vec_id",
            "d2_u",
            TA.r4(F.sqrt(F.col("d2_u") / F.lit(1e12))).alias("dist"),
        )
    )


SQL_EMBEDDING_OUTLIERS = f"""
WITH snapped AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
           AS eu
  FROM embeddings),
comp AS (
  SELECT i, CAST(sum(v) AS BIGINT) // CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(eu) AS v,
               unnest(range(1, len(eu) + 1)) AS i
        FROM snapped)
  GROUP BY i),
cent AS (SELECT list(c ORDER BY i) AS cent FROM comp),
scored AS (
  SELECT vec_id,
         CAST(list_aggregate(
           list_transform(range(1, len(eu) + 1),
             j -> (eu[j] - cent[j]) * (eu[j] - cent[j])), 'sum') AS BIGINT)
           AS d2_u
  FROM snapped, cent)
SELECT vec_id, d2_u, {O.sql_r4('sqrt(d2_u / 1000000000000.0)')} AS dist
FROM scored ORDER BY d2_u DESC, vec_id LIMIT 20
"""


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty curve: per document, the fraction of its 3-gram shingles
    FIRST seen in that document (ingest order = doc_id) — how much new
    material each document adds, the diversity-over-time diagnostic for
    dataset ordering and dedup tuning. First-seen is a per-shingle
    min(doc_id) aggregate joined back; both counts exact BIGINTs."""
    docs = _t(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(D.shingles(F.col("text"), 3)).alias("s")
    )
    first = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    per = (
        sh.join(first, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("bigint").alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
            TA.r4(
                F.coalesce("n_novel", F.lit(0))
                / F.greatest(F.coalesce("n_shingles", F.lit(0)), F.lit(1))
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


SQL_NGRAM_NOVELTY = f"""
WITH sh AS (
  SELECT doc_id, unnest({O.sql_shingles('text', 3)}) AS s FROM documents),
first_ AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s),
per AS (
  SELECT sh.doc_id,
         count(*)::BIGINT AS n_shingles,
         sum(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)::BIGINT
           AS n_novel
  FROM sh JOIN first_ USING (s) GROUP BY sh.doc_id)
SELECT d.doc_id,
       coalesce(per.n_shingles, 0)::BIGINT AS n_shingles,
       coalesce(per.n_novel, 0)::BIGINT AS n_novel,
       {O.sql_r4('coalesce(per.n_novel, 0) / greatest(coalesce(per.n_shingles, 0), 1)')}
         AS novelty
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id
"""


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation: per user, Recency (latest purchase ts),
    Frequency (purchase count) and Monetary (DECIMAL-exact value sum)
    each scored 1-5 by ``ntile(5)`` over a TOTAL order (metric + user_id
    tiebreak, so tile boundaries are engine-deterministic), composed into
    the classic 3-digit segment code. Three metrics from ONE keyed agg;
    the ntile windows run over the already-aggregated per-user table."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    per = ev.groupBy("user_id").agg(
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("monetary"),
    )
    r = F.ntile(5).over(Window.orderBy(F.col("last_us").asc(), F.col("user_id").asc()))
    f = F.ntile(5).over(Window.orderBy(F.col("freq").asc(), F.col("user_id").asc()))
    m = F.ntile(5).over(
        Window.orderBy(F.col("monetary").asc(), F.col("user_id").asc())
    )
    return (
        per.select(
            "user_id",
            "freq",
            "monetary",
            r.cast("int").alias("r_score"),
            f.cast("int").alias("f_score"),
            m.cast("int").alias("m_score"),
        )
        .withColumn(
            "segment",
            F.concat(
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ),
        )
        .orderBy("user_id")
    )


SQL_RFM_SEGMENTS = """
WITH per AS (
  SELECT user_id, max(epoch_us(ts)) AS last_us,
         count(*)::BIGINT AS freq,
         round(sum(CAST(value AS DECIMAL(18,4))), 2)::DOUBLE AS monetary
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
scored AS (
  SELECT user_id, freq, monetary,
         CAST(ntile(5) OVER (ORDER BY last_us, user_id) AS INT) AS r_score,
         CAST(ntile(5) OVER (ORDER BY freq, user_id) AS INT) AS f_score,
         CAST(ntile(5) OVER (ORDER BY monetary, user_id) AS INT) AS m_score
  FROM per)
SELECT user_id, freq, monetary, r_score, f_score, m_score,
       r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR AS segment
FROM scored ORDER BY user_id
"""


def q_textrank_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-scoring summarizer (VERDICT r3 item 8): the
    newspaper3k-fidelity twin of the first-k-sentences ``summary_native``
    (reference ``rss_consumer.py:112-116`` ``article.nlp()``). Sentence
    score = exact integer Σ of doc-level term frequencies over the
    sentence's stopword-filtered tokens; top-2 by (score DESC, position
    ASC) emitted in document order. The whole law is integer + fixed
    regexes → hash-exact across engines; the oracle re-derives every
    stage as CTEs."""
    from ingestion_scripts_spark.functions.nlp import frequency_rank_summary

    docs = _t(spark, sf_dir, "documents")
    out = frequency_rank_summary(docs, "doc_id", "text", k_sentences=2)
    return out.orderBy("doc_id")


def _sql_textrank_summary() -> str:
    from ingestion_scripts_spark.functions.nlp import SENTENCE_PATTERN

    toks = O.sql_remove_stopwords(
        O.sql_tokenize_ws(O.sql_clean_text("e.sent"))
    )
    return f"""
WITH base AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, {O.sq(SENTENCE_PATTERN)}),
                        s -> trim(s)) AS sents
  FROM documents),
ex AS (
  SELECT doc_id, u.pos AS pos, u.sent AS sent
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(sents) + 1),
                      i -> struct_pack(pos := i, sent := sents[i]))) AS u
        FROM base)),
tk AS (SELECT e.doc_id, e.pos, unnest({toks}) AS w FROM ex e),
tf AS (SELECT doc_id, w, count(*) AS c FROM tk GROUP BY 1, 2),
scored AS (
  SELECT t.doc_id, t.pos, sum(f.c) AS score
  FROM tk t JOIN tf f USING (doc_id, w) GROUP BY 1, 2),
ranked AS (
  SELECT e.doc_id, e.pos, e.sent,
         row_number() OVER (PARTITION BY e.doc_id
                            ORDER BY coalesce(s.score, 0) DESC, e.pos ASC) AS rn
  FROM ex e LEFT JOIN scored s ON e.doc_id = s.doc_id AND e.pos = s.pos),
sel AS (
  SELECT doc_id, string_agg(sent, ' ' ORDER BY pos) AS summary
  FROM ranked WHERE rn <= 2 GROUP BY doc_id)
SELECT d.doc_id, coalesce(sel.summary, '') AS summary
FROM documents d LEFT JOIN sel ON d.doc_id = sel.doc_id
ORDER BY d.doc_id
"""


#: literal SQL PIPE syntax (Spark 4 operator pipelines) executed verbatim
#: by spark.sql — the |> form of the portable star query
SQL_PIPE_LITERAL = """
FROM orders o
|> JOIN customer c ON o.o_custkey = c.c_custkey
|> WHERE o.o_orderdate >= DATE '1995-01-01'
   AND o.o_orderdate < DATE '1996-01-01'
|> AGGREGATE CAST(count(*) AS BIGINT) AS n_orders,
     CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
       AS revenue
   GROUP BY c.c_mktsegment AS segment
|> ORDER BY segment
"""

SQL_PIPE_FRONT_DOOR = """
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderdate >= DATE '1995-01-01'
  AND o.o_orderdate < DATE '1996-01-01'
GROUP BY c.c_mktsegment
ORDER BY segment
"""


def q_sql_pipe_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax end-to-end: the literal ``|>`` operator
    pipeline above runs verbatim through ``spark.sql`` against catalog temp
    views; the oracle runs the equivalent ANSI form. Catalyst lowers both
    to the same star-join plan (broadcast dims, partial aggs) — this
    certifies the pipe FRONT DOOR, the sql_front_door twin for the syntax
    Spark 4 positions for incremental query building."""
    from ingestion_scripts_spark.catalog import register_testdata

    register_testdata(spark, sf_dir)
    return spark.sql(SQL_PIPE_LITERAL)


def q_stream_state_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 state-store DATA SOURCE: after a keyed streaming aggregation
    checkpoints, ``spark.read.format("statestore")`` reads the operator's
    state back as a batch DataFrame — the ops/debugging surface for
    inspecting (and auditing) live streaming state without stopping the
    job. The law: the state rows of a completed per-type count over the
    events stream must equal the plain batch GROUP BY — state IS the
    aggregate. Scale: the state source reads the checkpoint's HDFS-backed
    store partition-parallel; no driver materialization."""
    import tempfile
    import uuid

    from ingestion_scripts_spark.sources.readers import read_events_stream

    stream = read_events_stream(spark, sf_dir)
    counts = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ckpt = tempfile.mkdtemp(prefix="ckpt_statereader_")
    name = "state_probe_" + uuid.uuid4().hex[:8]
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    st = spark.read.format("statestore").load(ckpt)
    return st.select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").cast("bigint").alias("n"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# r4 batch 2: string-similarity join, itemset mining, graph triangles,
# distribution drift
# ---------------------------------------------------------------------------


def q_edit_distance_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog name canonicalization: every DISTINCT part-name pair within
    Levenshtein distance 1, found by the positional q-gram count filter
    (operators/editdist.py — Ed-Join family, NO all-pairs comparison),
    each annotated with how many catalog rows carry each spelling. The
    pair space is over distinct names (the entity-resolution shape), and
    ids are xxhash64 of the name — no global row_number sort anywhere.
    Reference has no string-similarity join; §2.9 curation surface."""
    from ingestion_scripts_spark.operators import editdist as ED

    part = _t(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_rows"))
    ids = names.select(
        F.xxhash64("p_name").alias("nid"), "p_name", "n_rows"
    )
    pairs = ED.qgram_edit_join(ids, "nid", "p_name", k=1, q=2).select(
        F.least("s_a", "s_b").alias("name_a"),
        F.greatest("s_a", "s_b").alias("name_b"),
        "dist",
    )
    cnt = names.select(F.col("p_name"), F.col("n_rows"))
    return (
        pairs.join(
            F.broadcast(cnt.select(F.col("p_name").alias("name_a"),
                                   F.col("n_rows").alias("rows_a"))),
            "name_a",
        )
        .join(
            F.broadcast(cnt.select(F.col("p_name").alias("name_b"),
                                   F.col("n_rows").alias("rows_b"))),
            "name_b",
        )
        .select("name_a", "name_b", "dist", "rows_a", "rows_b")
        .orderBy("name_a", "name_b")
    )


SQL_EDIT_DISTANCE_NAMES = """
WITH n AS (SELECT p_name, count(*)::BIGINT AS n_rows FROM part GROUP BY 1)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name)::INTEGER AS dist,
       a.n_rows AS rows_a, b.n_rows AS rows_b
FROM n a JOIN n b
  ON a.p_name < b.p_name
 AND abs(length(a.p_name) - length(b.p_name)) <= 1
WHERE levenshtein(a.p_name, b.p_name) <= 1
ORDER BY name_a, name_b
"""


def q_basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining (operators/itemsets.py): part pairs
    co-ordered in >= 2 orders, with support counts and micro-unit lift.
    A-priori pruning (infrequent items never enter the pair join) and a
    basket-keyed equi-join — the 2-itemset core of association mining,
    shaped for billions of baskets. Lift = pair_n * n_baskets /
    (n_a * n_b) from exact BIGINT counts, one IEEE divide, snapped."""
    from ingestion_scripts_spark.operators import itemsets as IT

    li = _t(spark, sf_dir, "lineitem")
    return IT.pair_support(li, "l_orderkey", "l_partkey", min_support=2).orderBy(
        "item_a", "item_b"
    )


SQL_BASKET_PAIR_LIFT = """
WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
item_n AS (SELECT it, count(*)::BIGINT AS n_it FROM b GROUP BY 1),
freq AS (SELECT it FROM item_n WHERE n_it >= 2),
fb AS (SELECT b.bk, b.it FROM b JOIN freq USING (it)),
pairs AS (
  SELECT x.it AS item_a, y.it AS item_b, count(*)::BIGINT AS pair_n
  FROM fb x JOIN fb y ON x.bk = y.bk AND x.it < y.it
  GROUP BY 1, 2 HAVING count(*) >= 2),
nb AS (SELECT count(DISTINCT bk)::BIGINT AS n_baskets FROM b)
SELECT p.item_a, p.item_b, p.pair_n, na.n_it AS n_a, nbb.n_it AS n_b,
       nb.n_baskets,
       CAST(floor(1000000.0 * p.pair_n * nb.n_baskets
                  / (na.n_it * nbb.n_it) + 0.5) AS BIGINT) AS lift_micro
FROM pairs p
JOIN item_n na ON na.it = p.item_a
JOIN item_n nbb ON nbb.it = p.item_b
CROSS JOIN nb
ORDER BY item_a, item_b
"""


def q_triangle_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient over the part
    co-order graph (edge = two parts co-ordered in >= 2 orders). The
    Spark side orients edges low-degree -> high-degree before the wedge
    join (operators/graph.py::triangle_stats) so hub nodes cannot blow
    up the join — O(m^1.5) wedges on any graph; triangle identity is
    orientation-invariant, so the oracle's plain id-ordered enumeration
    counts the same exact BIGINTs."""
    from ingestion_scripts_spark.operators import graph as G

    li = _t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("it")
    ).distinct()
    x, y = b.alias("x"), b.alias("y")
    edges = (
        x.join(y, (F.col("x.bk") == F.col("y.bk")) & (F.col("x.it") < F.col("y.it")))
        .groupBy(F.col("x.it").alias("a"), F.col("y.it").alias("b"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("a", "b")
    )
    return G.triangle_stats(edges, "a", "b").orderBy("node")


SQL_TRIANGLE_COOCCURRENCE = """
WITH bsk AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
e AS (
  SELECT x.it AS a, y.it AS b
  FROM bsk x JOIN bsk y ON x.bk = y.bk AND x.it < y.it
  GROUP BY 1, 2 HAVING count(*) >= 2),
deg AS (
  SELECT node, count(*)::BIGINT AS degree FROM (
    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e) GROUP BY 1),
tri AS (
  SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
  FROM e e1 JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
per_node AS (
  SELECT node, count(*)::BIGINT AS triangles FROM (
    SELECT n1 AS node FROM tri UNION ALL SELECT n2 FROM tri
    UNION ALL SELECT n3 FROM tri) GROUP BY 1)
SELECT d.node, d.degree,
       coalesce(t.triangles, 0)::BIGINT AS triangles,
       CASE WHEN d.degree >= 2
            THEN (2000000 * coalesce(t.triangles, 0)) // (d.degree * (d.degree - 1))
            ELSE 0 END::BIGINT AS cc_micro
FROM deg d LEFT JOIN per_node t USING (node)
ORDER BY node
"""


def q_token_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution drift between two corpus slices (dataset-version
    monitoring): KL(P||Q) contribution per token, where P is the unigram
    distribution of slice A (even doc_id), Q the add-one-smoothed
    distribution of slice B (odd doc_id) over the union vocabulary. The
    log ratio is built from ONE divide of exact BIGINT products
    (cnt_a*(Nb+V)) / (Na*(cnt_b+1)), the contribution snaps to integer
    micro-units, and ordering uses the snapped integer — engine-exact
    ranks, the BM25 idiom."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id"),
        F.explode(X.tokenize_ws(F.lower(F.col("text")))).alias("token"),
    )
    a = toks.filter(F.col("doc_id") % 2 == 0)
    b = toks.filter(F.col("doc_id") % 2 == 1)
    cnt_a = a.groupBy("token").agg(F.count(F.lit(1)).alias("cnt_a"))
    cnt_b = b.groupBy("token").agg(F.count(F.lit(1)).alias("cnt_b"))
    na = a.groupBy().agg(F.count(F.lit(1)).alias("na"))
    nb = b.groupBy().agg(F.count(F.lit(1)).alias("nb"))
    vocab = (
        toks.select("token").distinct().groupBy().agg(F.count(F.lit(1)).alias("v"))
    )
    joined = (
        cnt_a.join(cnt_b, "token", "left")
        .withColumn("cnt_b", F.coalesce(F.col("cnt_b"), F.lit(0)).cast("bigint"))
        .join(F.broadcast(na))
        .join(F.broadcast(nb))
        .join(F.broadcast(vocab))
    )
    ratio = (F.col("cnt_a") * (F.col("nb") + F.col("v"))) / (
        F.col("na") * (F.col("cnt_b") + 1)
    )
    kl_micro = F.floor(
        F.lit(1000000.0) * (F.col("cnt_a") / F.col("na")) * F.log(ratio)
        + F.lit(0.5)
    ).cast("bigint")
    return (
        joined.select(
            "token",
            F.col("cnt_a").cast("bigint").alias("cnt_a"),
            "cnt_b",
            kl_micro.alias("kl_micro"),
        )
        .orderBy(F.desc("kl_micro"), "token")
    )


SQL_TOKEN_KL_DRIFT = f"""
WITH toks AS (
  SELECT doc_id, unnest({O.sql_tokenize_ws('lower(text)')}) AS token
  FROM documents),
a AS (SELECT token FROM toks WHERE doc_id % 2 = 0),
b AS (SELECT token FROM toks WHERE doc_id % 2 = 1),
ca AS (SELECT token, count(*)::BIGINT AS cnt_a FROM a GROUP BY 1),
cb AS (SELECT token, count(*)::BIGINT AS cnt_b FROM b GROUP BY 1),
na AS (SELECT count(*)::BIGINT AS na FROM a),
nb AS (SELECT count(*)::BIGINT AS nb FROM b),
voc AS (SELECT count(DISTINCT token)::BIGINT AS v FROM toks)
SELECT ca.token, ca.cnt_a, coalesce(cb.cnt_b, 0)::BIGINT AS cnt_b,
       CAST(floor(1000000.0 * (ca.cnt_a / na.na)
                  * ln((ca.cnt_a * (nb.nb + voc.v))
                       / (na.na * (coalesce(cb.cnt_b, 0) + 1)))
                  + 0.5) AS BIGINT) AS kl_micro
FROM ca LEFT JOIN cb USING (token)
CROSS JOIN na CROSS JOIN nb CROSS JOIN voc
ORDER BY kl_micro DESC, token
"""


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware train/val/test split: near-duplicate CLUSTERS (MinHash
    pairs → connected components) are the split unit, so no near-dup pair
    can straddle train/test — the leakage mode that plain per-doc hashing
    (q_dataset_split) cannot prevent. Split = salted hash of the cluster
    id, 80/10/10. The report carries the machine-checked proof: the count
    of near-dup pairs whose endpoints landed in different splits, joined
    in as a broadcast 1-row aggregate (0 by construction — computed, not
    assumed)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = persist_tracked(
        D.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.8)
    )
    comps = D.connected_components(pairs, "id_a", "id_b")
    labeled = (
        docs.select("doc_id", "n_chars")
        .join(comps, docs.doc_id == comps.node, "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce(F.col("comp"), F.col("doc_id")).cast("bigint").alias("cluster_id"),
        )
    )
    h = X.hash64(F.concat(F.lit("lsplit:"), F.col("cluster_id").cast("string"))) % 10
    split = (
        F.when(h < 8, F.lit("train")).when(h < 9, F.lit("val")).otherwise("test")
    )
    sp = labeled.select("doc_id", "n_chars", "cluster_id", split.alias("split"))
    leaks = (
        pairs.join(
            sp.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")),
            "id_a",
        )
        .join(
            sp.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")),
            "id_b",
        )
        .groupBy()
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("sa") != F.col("sb"), 1).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias("cross_split_pairs")
        )
    )
    return (
        sp.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        .join(F.broadcast(leaks))
        .orderBy("split")
    )


def _sql_leakage_safe_split() -> str:
    h = f"{O.sql_hash64(chr(39) + 'lsplit:' + chr(39) + ' || cluster_id')} % 10"
    return f"""
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
comp AS (SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a),
labeled AS (
  SELECT d.doc_id, d.n_chars,
         coalesce(c.comp, d.doc_id)::BIGINT AS cluster_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
sp AS (
  SELECT doc_id, n_chars, cluster_id,
         CASE WHEN {h} < 8 THEN 'train'
              WHEN {h} < 9 THEN 'val' ELSE 'test' END AS split
  FROM labeled),
leaks AS (
  SELECT coalesce(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END), 0)::BIGINT
           AS cross_split_pairs
  FROM pairs p JOIN sp sa ON p.id_a = sa.doc_id
               JOIN sp sb ON p.id_b = sb.doc_id)
SELECT split, count(*)::BIGINT AS n_docs,
       count(DISTINCT cluster_id)::BIGINT AS n_clusters,
       sum(n_chars)::BIGINT AS n_chars,
       leaks.cross_split_pairs
FROM sp CROSS JOIN leaks
GROUP BY split, leaks.cross_split_pairs
ORDER BY split
"""


def q_hybrid_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (RRF, the standard
    lexical+dense combiner in RAG stacks): for each query doc
    (doc_id % 101 == 0), fuse (a) a lexical ranking by distinct-token
    overlap and (b) the dense cosine ranking over the aligned embedding,
    via rrf_nano = Σ_list 1e9 div (60 + rank) — pure BIGINT, so fused
    ranks are engine-exact. Missing-from-one-list candidates contribute
    only the list they appear in (full outer fusion)."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    toks = docs.select(
        "doc_id", F.array_distinct(X.tokenize_ws(F.lower(F.col("text")))).alias("tk")
    )
    qt = toks.filter(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("query_id"), F.col("tk").alias("qtk")
    )
    lex = (
        F.broadcast(qt)
        .crossJoin(toks.select(F.col("doc_id").alias("match_id"), "tk"))
        .filter(F.col("query_id") != F.col("match_id"))
        .select(
            "query_id",
            "match_id",
            F.size(F.array_intersect("qtk", "tk")).cast("bigint").alias("overlap"),
        )
        .filter(F.col("overlap") > 0)
        .withColumn(
            "lex_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("overlap"), F.asc("match_id")
                )
            ),
        )
        .filter(F.col("lex_rank") <= 10)
        .select("query_id", "match_id", "lex_rank")
    )
    dense = (
        SIM.cosine_topk(emb.filter(F.col("vec_id") % 101 == 0), emb, k=10)
        .select("query_id", "match_id", F.col("rank").alias("dense_rank"))
    )
    fused = (
        lex.join(dense, ["query_id", "match_id"], "full_outer")
        .withColumn(
            "rrf_nano",
            F.expr(
                "coalesce(1000000000 div (60 + lex_rank), 0L)"
                " + coalesce(1000000000 div (60 + dense_rank), 0L)"
            ).cast("bigint"),
        )
        .withColumn(
            "fused_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("rrf_nano"), F.asc("match_id")
                )
            ),
        )
        .filter(F.col("fused_rank") <= 10)
        .select(
            "query_id", "match_id", "lex_rank", "dense_rank", "rrf_nano",
            "fused_rank",
        )
        .orderBy("query_id", "fused_rank")
    )
    return fused


def _sql_hybrid_rank_fusion() -> str:
    nrm = _SQL_NORM
    return f"""
WITH toks AS (
  SELECT doc_id, list_distinct({O.sql_tokenize_ws('lower(text)')}) AS tk
  FROM documents),
qt AS (SELECT doc_id AS query_id, tk AS qtk FROM toks WHERE doc_id % 101 = 0),
lex0 AS (
  SELECT q.query_id, t.doc_id AS match_id,
         len(list_intersect(q.qtk, t.tk))::BIGINT AS overlap
  FROM qt q, toks t WHERE q.query_id <> t.doc_id),
lex AS (
  SELECT query_id, match_id, lex_rank FROM (
    SELECT query_id, match_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY overlap DESC, match_id ASC) AS lex_rank
    FROM lex0 WHERE overlap > 0)
  WHERE lex_rank <= 10),
q0 AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
       FROM embeddings WHERE vec_id % 101 = 0),
q AS (SELECT query_id, list_transform(v, x -> x / {nrm('v')}) AS qv FROM q0),
c0 AS (SELECT vec_id AS match_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT match_id, list_transform(v, x -> x / {nrm('v')}) AS cv FROM c0),
scored AS (
  SELECT query_id, match_id, round({O.sql_dot('qv', 'cv', 'len(qv)')}, 6) AS sim
  FROM q, c WHERE query_id <> match_id),
dense AS (
  SELECT query_id, match_id, dense_rank FROM (
    SELECT query_id, match_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, match_id ASC) AS dense_rank
    FROM scored)
  WHERE dense_rank <= 10),
fused0 AS (
  SELECT coalesce(l.query_id, d.query_id) AS query_id,
         coalesce(l.match_id, d.match_id) AS match_id,
         l.lex_rank, d.dense_rank,
         (coalesce(1000000000 // (60 + l.lex_rank), 0)
          + coalesce(1000000000 // (60 + d.dense_rank), 0))::BIGINT AS rrf_nano
  FROM lex l FULL OUTER JOIN dense d
    ON l.query_id = d.query_id AND l.match_id = d.match_id)
SELECT query_id, match_id, lex_rank::INTEGER AS lex_rank,
       dense_rank::INTEGER AS dense_rank, rrf_nano, fused_rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_nano DESC, match_id ASC) AS fused_rank
  FROM fused0)
WHERE fused_rank <= 10
ORDER BY query_id, fused_rank
"""


def q_output_file_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink file-size planning: pack each source's documents (in doc_id
    order) into target-sized output files by cumulative size — the
    deterministic twin of what a size-aware writer does, as an auditable
    plan. file_no = (running_chars - n_chars) div target, i.e. a doc
    belongs to the file its first byte lands in; per (source, file_no)
    the plan reports doc count, char total, and the id range. Window
    cumulative sums are exact BIGINTs — identical on both engines."""
    target = 20_000
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    planned = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.sum("n_chars").over(w).cast("bigint").alias("cum_chars"),
    ).withColumn(
        "file_no",
        F.expr(f"(cum_chars - n_chars) div {target}").cast("bigint"),
    )
    return (
        planned.groupBy("source", "file_no")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "file_no")
    )


SQL_OUTPUT_FILE_PLAN = """
WITH planned AS (
  SELECT source, doc_id, n_chars,
         sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           ::BIGINT AS cum_chars
  FROM documents)
SELECT source, ((cum_chars - n_chars) // 20000)::BIGINT AS file_no,
       count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS chars,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM planned
GROUP BY 1, 2
ORDER BY source, file_no
"""


def q_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diverse retrieval via Maximal Marginal Relevance
    (operators/similarity.py::mmr_rerank): per query embedding
    (vec_id % 101 == 0), greedily select 3 of the top-8 cosine candidates
    balancing relevance against redundancy (lam = 0.7). The greedy loop is
    unrolled into the plan (no driver state); scores are BIGINT
    ``7*simu - 3*max_psimu`` with NO division, so picks are engine-exact
    even for negative inter-candidate cosines. The oracle unrolls the same
    3 rounds as CTEs."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 101 == 0)
    return SIM.mmr_rerank(q, emb, k_candidates=8, k_select=3).orderBy(
        "query_id", "sel_round"
    )


def _sql_mmr_diverse_topk() -> str:
    nrm = _SQL_NORM
    return f"""
WITH q0 AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
            FROM embeddings WHERE vec_id % 101 = 0),
q AS (SELECT query_id, list_transform(v, x -> x / {nrm('v')}) AS qv FROM q0),
c0 AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT cid, list_transform(v, x -> x / {nrm('v')}) AS cv FROM c0),
scored AS (
  SELECT query_id, cid AS match_id,
         round({O.sql_dot('qv', 'cv', 'len(qv)')}, 6) AS sim
  FROM q, c WHERE query_id <> cid),
cand AS (
  SELECT query_id, match_id, sim,
         CAST(round(sim * 1e6) AS BIGINT) AS simu
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, match_id ASC) AS rnk
        FROM scored)
  WHERE rnk <= 8),
pairs AS (
  SELECT a.query_id, a.match_id AS id_a, b.match_id AS id_b,
         CAST(round(round({O.sql_dot('ca.cv', 'cb.cv', 'len(ca.cv)')}, 6) * 1e6)
              AS BIGINT) AS psimu
  FROM cand a JOIN cand b
    ON a.query_id = b.query_id AND a.match_id <> b.match_id
  JOIN c ca ON ca.cid = a.match_id
  JOIN c cb ON cb.cid = b.match_id),
sel1 AS (
  SELECT query_id, match_id, 1 AS sel_round, sim,
         (7 * simu)::BIGINT AS mmr_score10
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY 7 * simu DESC, match_id ASC) AS rn
        FROM cand)
  WHERE rn = 1),
red2 AS (
  SELECT p.query_id, p.id_a, max(p.psimu) AS max_psimu
  FROM pairs p JOIN sel1 s
    ON p.query_id = s.query_id AND p.id_b = s.match_id
  GROUP BY 1, 2),
sc2 AS (
  SELECT cand.query_id, cand.match_id, cand.sim,
         (7 * cand.simu - 3 * r.max_psimu)::BIGINT AS score10
  FROM cand
  JOIN red2 r ON r.query_id = cand.query_id AND r.id_a = cand.match_id
  WHERE NOT EXISTS (SELECT 1 FROM sel1 s
                    WHERE s.query_id = cand.query_id
                      AND s.match_id = cand.match_id)),
sel2 AS (
  SELECT query_id, match_id, 2 AS sel_round, sim, score10 AS mmr_score10
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score10 DESC, match_id ASC) AS rn
        FROM sc2)
  WHERE rn = 1),
sel12 AS (SELECT query_id, match_id FROM sel1
          UNION ALL SELECT query_id, match_id FROM sel2),
red3 AS (
  SELECT p.query_id, p.id_a, max(p.psimu) AS max_psimu
  FROM pairs p JOIN sel12 s
    ON p.query_id = s.query_id AND p.id_b = s.match_id
  GROUP BY 1, 2),
sc3 AS (
  SELECT cand.query_id, cand.match_id, cand.sim,
         (7 * cand.simu - 3 * r.max_psimu)::BIGINT AS score10
  FROM cand
  JOIN red3 r ON r.query_id = cand.query_id AND r.id_a = cand.match_id
  WHERE NOT EXISTS (SELECT 1 FROM sel12 s
                    WHERE s.query_id = cand.query_id
                      AND s.match_id = cand.match_id)),
sel3 AS (
  SELECT query_id, match_id, 3 AS sel_round, sim, score10 AS mmr_score10
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score10 DESC, match_id ASC) AS rn
        FROM sc3)
  WHERE rn = 1)
SELECT query_id, match_id, sel_round::INTEGER AS sel_round, sim, mmr_score10
FROM (SELECT * FROM sel1 UNION ALL SELECT * FROM sel2
      UNION ALL SELECT * FROM sel3)
ORDER BY query_id, sel_round
"""


def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy DQ audit: k-anonymity over the quasi-identifier
    (event_type, event day) — equivalence classes whose distinct-user
    count falls below k = 5 are re-identification risks that a release
    gate must suppress or generalize. Single keyed aggregate; the report
    lists every class with its row count, user count, and violation flag
    (the suppression worklist, not just a yes/no)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.to_date("ts").cast("string").alias("day"),
            "user_id",
        )
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .withColumn(
            "violates_k5",
            F.when(F.col("n_users") < 5, 1).otherwise(0).cast("int"),
        )
        .orderBy("event_type", "day")
    )


SQL_K_ANONYMITY = """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
       count(*)::BIGINT AS n_rows,
       count(DISTINCT user_id)::BIGINT AS n_users,
       (CASE WHEN count(DISTINCT user_id) < 5 THEN 1 ELSE 0 END)::INTEGER
         AS violates_k5
FROM events
GROUP BY 1, 2
ORDER BY event_type, day
"""


_JL_PLANES = SIM.hyperplanes(16, 64)


def q_jl_projection_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection as an ANN scale path:
    embeddings are projected 64 -> 16 dims through deterministic
    md5-derived hyperplanes (the same literals on both engines), top-5
    cosine is computed in the REDUCED space, and per-query recall against
    the full-space top-5 quantifies the speed/quality trade — at 100 TB
    the reduced scan moves 4x fewer bytes through every shuffle and the
    recall harness is the evidence the shortcut is safe. Sims round to
    6 dp before ranking (repo similarity law)."""
    emb = _t(spark, sf_dir, "embeddings")

    def project(df):
        dots = ", ".join(
            "aggregate(zip_with(__v, array({lits}), (x, y) -> x * y), "
            "cast(0.0 as double), (acc, x) -> acc + x)".format(
                lits=", ".join(f"{x}D" for x in row)
            )
            for row in _JL_PLANES
        )
        return df.select(
            F.col("vec_id"),
            F.expr("transform(embedding, x -> cast(x as double))").alias("__v"),
        ).selectExpr("vec_id", f"array({dots}) AS rvec")

    red = project(emb)
    rq = red.filter(F.col("vec_id") % 101 == 0).select(
        "vec_id", F.col("rvec").alias("embedding")
    )
    rtop = SIM.cosine_topk(
        rq,
        red.select("vec_id", F.col("rvec").alias("embedding")),
        k=5,
    ).select("query_id", "match_id")
    fq = emb.filter(F.col("vec_id") % 101 == 0)
    ftop = SIM.cosine_topk(fq, emb, k=5).select(
        "query_id", F.col("match_id").alias("fmatch")
    )
    hits = (
        ftop.join(
            rtop.withColumnRenamed("match_id", "fmatch"),
            ["query_id", "fmatch"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        ftop.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            F.expr("CAST(coalesce(n_hits, 0L) * 1000000 div 5 AS BIGINT)").alias(
                "recall_micro"
            ),
        )
        .orderBy("query_id")
    )


def _sql_jl_projection_recall() -> str:
    nrm = _SQL_NORM
    dots = ", ".join(
        "list_sum(list_transform(range(1, 64 + 1), i -> v[i] * ([{lits}])[i]))".format(
            lits=", ".join(repr(x) for x in row)
        )
        for row in _JL_PLANES
    )
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
red AS (SELECT vec_id, [{dots}] AS rv FROM base),
rn AS (SELECT vec_id, list_transform(rv, x -> x / {nrm('rv')}) AS rvn FROM red),
rq AS (SELECT vec_id AS query_id, rvn AS qv FROM rn WHERE vec_id % 101 = 0),
rscored AS (
  SELECT q.query_id, c.vec_id AS match_id,
         round({O.sql_dot('q.qv', 'c.rvn', '16')}, 6) AS sim
  FROM rq q, rn c WHERE q.query_id <> c.vec_id),
rtop AS (
  SELECT query_id, match_id FROM (
    SELECT query_id, match_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, match_id ASC) AS rnk
    FROM rscored) WHERE rnk <= 5),
fn AS (SELECT vec_id, list_transform(v, x -> x / {nrm('v')}) AS fvn FROM base),
fq AS (SELECT vec_id AS query_id, fvn AS qv FROM fn WHERE vec_id % 101 = 0),
fscored AS (
  SELECT q.query_id, c.vec_id AS match_id,
         round({O.sql_dot('q.qv', 'c.fvn', '64')}, 6) AS sim
  FROM fq q, fn c WHERE q.query_id <> c.vec_id),
ftop AS (
  SELECT query_id, match_id FROM (
    SELECT query_id, match_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, match_id ASC) AS rnk
    FROM fscored) WHERE rnk <= 5),
hits AS (
  SELECT f.query_id, count(*)::BIGINT AS n_hits
  FROM ftop f JOIN rtop r
    ON f.query_id = r.query_id AND f.match_id = r.match_id
  GROUP BY 1)
SELECT q.query_id AS query_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       (coalesce(h.n_hits, 0) * 1000000 // 5)::BIGINT AS recall_micro
FROM (SELECT DISTINCT query_id FROM ftop) q
LEFT JOIN hits h ON h.query_id = q.query_id
ORDER BY q.query_id
"""


def q_holt_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing per user (level alpha=0.5, trend
    beta=0.3) over the daily value series, plus the h=3 linear forecast —
    the trend-aware upgrade of q_ewma_user_value. The recurrence is a
    LEFT fold whose accumulator is the [level, trend] pair; both engines
    fold the identical [x, 0] pair list left-to-right (Spark
    ``F.aggregate`` seeded with the first pair, DuckDB ``list_reduce``
    whose implicit seed IS the first element), so every IEEE operation
    happens in the same order — bit-identical, partitioning-independent
    (per-user arrays bounded by calendar days)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"))
    per_user = daily.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("day", "v"))).alias("series")
    )
    lvl_new = "(0.5D * x[0] + 0.5D * (acc[0] + acc[1]))"
    fold = F.expr(
        "aggregate("
        "  slice(pairs, 2, size(pairs) - 1),"
        "  pairs[0],"
        f"  (acc, x) -> array({lvl_new},"
        f"               0.3D * ({lvl_new} - acc[0]) + 0.7D * acc[1])"
        ")"
    )
    return (
        per_user.select(
            "user_id",
            F.size("series").cast("bigint").alias("n_days"),
            F.expr(
                "transform(series, s -> array(s.v, cast(0.0 as double)))"
            ).alias("pairs"),
        )
        .select("user_id", "n_days", fold.alias("lb"))
        .select(
            "user_id",
            "n_days",
            TA.r4(F.expr("lb[0]")).alias("level"),
            TA.r4(F.expr("lb[1]")).alias("trend"),
            TA.r4(F.expr("lb[0] + 3.0D * lb[1]")).alias("forecast_3"),
        )
        .orderBy("user_id")
    )


def _sql_holt_trend_forecast() -> str:
    lvl_new = "(0.5 * x[1] + 0.5 * (acc[1] + acc[2]))"
    return f"""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         sum(CAST(value AS DECIMAL(18,4)))::DOUBLE AS v
  FROM events GROUP BY user_id, date_trunc('day', ts)),
series AS (
  SELECT user_id, list([v, 0.0] ORDER BY day) AS pairs
  FROM daily GROUP BY user_id),
folded AS (
  SELECT user_id, len(pairs)::BIGINT AS n_days,
         list_reduce(pairs,
           (acc, x) -> [{lvl_new},
                        0.3 * ({lvl_new} - acc[1]) + 0.7 * acc[2]]) AS lb
  FROM series)
SELECT user_id, n_days,
       {O.sql_r4('lb[1]')} AS level,
       {O.sql_r4('lb[2]')} AS trend,
       {O.sql_r4('lb[1] + 3.0 * lb[2]')} AS forecast_3
FROM folded ORDER BY user_id
"""


_COV_METRICS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise covariance/correlation matrix over the lineitem metric
    columns in ONE aggregate pass: every Σx, Σx², Σxy accumulates as
    exact DECIMAL (order-independent across engines and partitionings —
    the nation_profit float-sum lesson), and only the final cov/corr
    arithmetic is float, rounded to 4 dp. The melt to (metric_a,
    metric_b) rows is a literal stack over the single aggregate row —
    no second scan."""
    li = _t(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n")]
    for m in _COV_METRICS:
        aggs.append(
            F.sum(F.col(m).cast("decimal(18,4)")).alias(f"s_{m}")
        )
    for i, a in enumerate(_COV_METRICS):
        for b in _COV_METRICS[i:]:
            aggs.append(
                F.sum(
                    (F.col(a).cast("decimal(18,4)")
                     * F.col(b).cast("decimal(18,4)")).cast("decimal(38,8)")
                ).alias(f"p_{a}_{b}")
            )
    g = li.groupBy().agg(*aggs)
    stack_rows = []
    for i, a in enumerate(_COV_METRICS):
        for b in _COV_METRICS[i:]:
            cov = (
                f"(CAST(p_{a}_{b} AS DOUBLE) - CAST(s_{a} AS DOUBLE) "
                f"* CAST(s_{b} AS DOUBLE) / n) / n"
            )
            var_a = (
                f"(CAST(p_{a}_{a} AS DOUBLE) - CAST(s_{a} AS DOUBLE) "
                f"* CAST(s_{a} AS DOUBLE) / n) / n"
            )
            var_b = (
                f"(CAST(p_{b}_{b} AS DOUBLE) - CAST(s_{b} AS DOUBLE) "
                f"* CAST(s_{b} AS DOUBLE) / n) / n"
            )
            stack_rows.append(
                f"struct('{a}' AS metric_a, '{b}' AS metric_b, "
                f"floor(({cov}) * 1e4 + 0.5) / 1e4 AS cov, "
                f"floor((({cov}) / sqrt(({var_a}) * ({var_b}))) * 1e4 + 0.5) "
                f"/ 1e4 AS corr)"
            )
    return (
        g.select(
            F.explode(F.expr("array(" + ", ".join(stack_rows) + ")")).alias("r")
        )
        .select("r.metric_a", "r.metric_b", "r.cov", "r.corr")
        .orderBy("metric_a", "metric_b")
    )


def _sql_covariance_matrix() -> str:
    sums = ["count(*)::BIGINT AS n"]
    for m in _COV_METRICS:
        sums.append(f"sum(CAST({m} AS DECIMAL(18,4))) AS s_{m}")
    for i, a in enumerate(_COV_METRICS):
        for b in _COV_METRICS[i:]:
            # DECIMAL(19,4) operands force DuckDB onto the int128 multiply
            # path (18-wide operands overflow the int64 fast path); the
            # PRODUCT VALUE is exact either way, so it hashes identically
            # to Spark's decimal(37,8) product after the double cast
            sums.append(
                f"sum(CAST(CAST({a} AS DECIMAL(19,4)) "
                f"* CAST({b} AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS p_{a}_{b}"
            )
    rows = []
    for i, a in enumerate(_COV_METRICS):
        for b in _COV_METRICS[i:]:
            cov = (
                f"(CAST(p_{a}_{b} AS DOUBLE) - CAST(s_{a} AS DOUBLE) "
                f"* CAST(s_{b} AS DOUBLE) / n) / n"
            )
            var_a = (
                f"(CAST(p_{a}_{a} AS DOUBLE) - CAST(s_{a} AS DOUBLE) "
                f"* CAST(s_{a} AS DOUBLE) / n) / n"
            )
            var_b = (
                f"(CAST(p_{b}_{b} AS DOUBLE) - CAST(s_{b} AS DOUBLE) "
                f"* CAST(s_{b} AS DOUBLE) / n) / n"
            )
            rows.append(
                f"SELECT '{a}' AS metric_a, '{b}' AS metric_b, "
                f"floor(({cov}) * 1e4 + 0.5) / 1e4 AS cov, "
                f"floor((({cov}) / sqrt(({var_a}) * ({var_b}))) * 1e4 + 0.5) "
                f"/ 1e4 AS corr FROM g"
            )
    return (
        "WITH g AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(rows)
        + "\nORDER BY metric_a, metric_b"
    )


def q_dup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level dedup resolved by the alternating large-star /
    small-star connected components (operators/dedup.py::
    connected_components_star, Kiveris et al. SoCC'14) — O(log diameter)
    rounds instead of O(diameter), the variant that survives
    adversarially long duplicate chains at cluster scale. Output contract
    and oracle are IDENTICAL to `dup_clusters` (components are
    algorithm-invariant), so the two implementations certify each other
    through the same SQL twin."""
    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.8)
    comps = D.connected_components_star(pairs, "id_a", "id_b")
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


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup (doc-in-doc / quote-subsumption): the
    directional law 10·|A∩B| >= 9·|A| over distinct 3-gram shingles —
    resemblance (Jaccard) misses a short doc fully embedded in a long
    one because the union is dominated by the long side; containment is
    the right test for boilerplate inclusion and quoting. Candidates come
    from the shingle posting-list equi-join (the sparse_cosine shape:
    keyed shuffles, candidate volume bounded by posting length), exact
    integer threshold at the end."""
    docs = _t(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", D.shingles(F.col("text")).alias("sh")
    ).filter(F.size("sh") > 0)
    sizes = sh.select("doc_id", F.size("sh").cast("bigint").alias("n"))
    post = sh.select("doc_id", F.explode("sh").alias("g"))
    inter = (
        post.alias("a")
        .join(
            post.alias("b"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_sub"),
            F.col("b.doc_id").alias("id_super"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("id_sub"), F.col("n").alias("n_sub")),
            "id_sub",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("id_super"), F.col("n").alias("n_super")
            ),
            "id_super",
        )
        .filter(10 * F.col("n_shared") >= 9 * F.col("n_sub"))
        .select("id_sub", "id_super", "n_shared", "n_sub", "n_super")
        .orderBy("id_sub", "id_super")
    )


SQL_CONTAINMENT_PAIRS = f"""
WITH sh AS (SELECT doc_id, {_SH} AS sh FROM documents),
s2 AS (SELECT doc_id, sh, len(sh)::BIGINT AS n FROM sh WHERE len(sh) > 0),
post AS (SELECT doc_id, unnest(sh) AS g FROM s2),
inter AS (
  SELECT a.doc_id AS id_sub, b.doc_id AS id_super,
         count(*)::BIGINT AS n_shared
  FROM post a JOIN post b ON a.g = b.g AND a.doc_id <> b.doc_id
  GROUP BY 1, 2)
SELECT i.id_sub, i.id_super, i.n_shared,
       sa.n AS n_sub, sb.n AS n_super
FROM inter i
JOIN s2 sa ON sa.doc_id = i.id_sub
JOIN s2 sb ON sb.doc_id = i.id_super
WHERE 10 * i.n_shared >= 9 * sa.n
ORDER BY id_sub, id_super
"""


def q_stream_scd_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC → SCD2 dimension maintenance: two micro-batches of
    absolute-state updates (acctbal +100 for custkey%7 at 2024-06-01,
    then additionally +50 for custkey%5 at 2024-09-01) applied IN ORDER
    by a foreachBatch MERGE — read the current versioned dimension,
    scd2_apply (operators/sink.py), write the next version directory
    (the open-format stand-in for MERGE INTO; per-batch output dirs keyed
    by batchId make replay idempotent). The final dimension must equal
    the two merges unrolled, which the oracle states in closed form:
    keys in both update sets reach version 3, each version's validity
    interval closed by the batch that superseded it."""
    import glob
    import os
    import tempfile
    import time

    from ingestion_scripts_spark.operators.sink import scd2_apply
    from ingestion_scripts_spark.sources.readers import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    root = tempfile.mkdtemp(prefix="scd_stream_")
    dim0 = f"{root}/dim_v0"
    (
        cust.withColumn("version", F.lit(1).cast("bigint"))
        .withColumn("valid_from", F.lit("2024-01-01"))
        .withColumn("valid_to", F.lit(None).cast("string"))
        .write.mode("overwrite")
        .parquet(dim0)
    )
    bump7 = F.when(F.col("c_custkey") % 7 == 0, F.lit(100.0)).otherwise(F.lit(0.0))
    bump5 = F.when(F.col("c_custkey") % 5 == 0, F.lit(50.0)).otherwise(F.lit(0.0))
    upd1 = cust.withColumn("c_acctbal", F.col("c_acctbal") + bump7).withColumn(
        "effective_date", F.lit("2024-06-01")
    )
    upd2 = cust.withColumn(
        "c_acctbal", F.col("c_acctbal") + bump7 + bump5
    ).withColumn("effective_date", F.lit("2024-09-01"))
    src = f"{root}/updates"
    upd1.coalesce(1).write.mode("overwrite").parquet(f"{src}/b0")
    upd2.coalesce(1).write.mode("overwrite").parquet(f"{src}/b1")
    now = time.time()
    for i, d in enumerate(("b0", "b1")):
        for p in glob.glob(f"{src}/{d}/*.parquet"):
            os.utime(p, (now - 200 + 50 * i, now - 200 + 50 * i))

    state = {"dir": dim0}

    def merge_batch(bdf, bid):
        eff = bdf.groupBy().agg(F.max("effective_date")).collect()[0][0]
        cur = bdf.sparkSession.read.parquet(state["dir"])
        out = scd2_apply(
            cur,
            bdf.drop("effective_date"),
            "c_custkey",
            ["c_acctbal", "c_mktsegment"],
            eff,
        )
        nxt = f"{root}/dim_v{bid + 1}"
        out.write.mode("overwrite").parquet(nxt)
        state["dir"] = nxt

    stream = (
        spark.readStream.schema(upd1.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_scd_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(state["dir"])
        .select(
            "c_custkey",
            "c_acctbal",
            "c_mktsegment",
            F.col("version").cast("bigint").alias("version"),
            "valid_from",
            "valid_to",
        )
        .orderBy("c_custkey", "version")
    )


SQL_STREAM_SCD_MERGE = """
SELECT c_custkey, c_acctbal, c_mktsegment,
       CAST(1 AS BIGINT) AS version, '2024-01-01' AS valid_from,
       CASE WHEN c_custkey % 7 = 0 THEN '2024-06-01'
            WHEN c_custkey % 5 = 0 THEN '2024-09-01' END AS valid_to
FROM customer
UNION ALL
SELECT c_custkey, c_acctbal + 100.0, c_mktsegment,
       CAST(2 AS BIGINT) AS version, '2024-06-01' AS valid_from,
       CASE WHEN c_custkey % 5 = 0 THEN '2024-09-01' END AS valid_to
FROM customer WHERE c_custkey % 7 = 0
UNION ALL
SELECT c_custkey,
       c_acctbal + (CASE WHEN c_custkey % 7 = 0 THEN 100.0 ELSE 0.0 END)
                 + 50.0,
       c_mktsegment,
       CAST(CASE WHEN c_custkey % 7 = 0 THEN 3 ELSE 2 END AS BIGINT)
         AS version,
       '2024-09-01' AS valid_from, NULL AS valid_to
FROM customer WHERE c_custkey % 5 = 0
ORDER BY c_custkey, version
"""


#: one literal recursive-SQL string, run VERBATIM by spark.sql AND DuckDB:
#: iterative ancestor-chasing (c_custkey // 10 each hop) until the leading
#: digit — the hierarchy-walk shape (org charts, category trees,
#: transitive closure) executable with zero dialect translation now that
#: Spark 4 ships WITH RECURSIVE. `CAST(floor(cur / 10) AS BIGINT)` is the
#: portable integer-div (Spark casts double→bigint by truncation, DuckDB
#: by rounding — floor() first makes both exact).
SQL_RECURSIVE_PORTABLE = """
WITH RECURSIVE anc AS (
  SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth FROM customer
  UNION ALL
  SELECT node, CAST(floor(cur / 10) AS BIGINT), depth + 1
  FROM anc WHERE cur >= 10
)
SELECT cur AS lead_digit, max(depth) AS max_depth,
       count(*) AS n_nodes
FROM anc WHERE cur < 10
GROUP BY cur ORDER BY lead_digit
"""


def q_recursive_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE front door: the SAME literal WITH RECURSIVE string
    runs on Spark 4 (spark.sql over registered testdata views) and on the
    DuckDB oracle — the iterative hierarchy-walk class (transitive
    closure, ancestor chains) as portable SQL, complementing
    `sql_front_door` (flat) and `sql_pipe_front_door` (pipe syntax)."""
    from ingestion_scripts_spark.catalog import register_testdata

    register_testdata(spark, sf_dir)
    return spark.sql(SQL_RECURSIVE_PORTABLE)


# ---------------------------------------------------------------------------
# r4 batch 9: duplicate spans (exact substring dedup), skyline, KS drift,
# categorical mutual information
# ---------------------------------------------------------------------------

_SPAN_TOKS_SQL = "list_filter(string_split(lower(text), ' '), t -> t <> '')"

#: shared oracle CTE prefix: (doc_id, pos, span) posting rows of 5-token
#: windows, mirroring operators/spans.py::token_spans.
_SPAN_OCC_SQL = f"""
WITH toks AS (SELECT doc_id, {_SPAN_TOKS_SQL} AS t FROM documents),
occ AS (
  SELECT doc_id, u.pos AS pos, u.span AS span
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(t) - 4, 0) + 1),
                      i -> struct_pack(pos := CAST(i AS BIGINT),
                                       span := array_to_string(t[i:i+4], ' ')))) AS u
        FROM toks))
"""


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-span detection (Lee et al. 2022 substring dedup,
    Spark-first): every 5-token window that occurs >= 2 times corpus-wide,
    with occurrence and document counts. Catches the repeated boilerplate
    (licence headers, templated intros) that whole-document MinHash
    resemblance misses. One narrow fanout + one keyed groupBy — no
    suffix array, no all-pairs (operators/spans.py)."""
    from ingestion_scripts_spark.operators import spans as SP

    docs = _t(spark, sf_dir, "documents")
    out = SP.duplicate_spans(docs, "doc_id", "text", k=5)
    return out.orderBy(F.desc("n_occ"), "span")


SQL_DUPLICATE_SPANS = f"""
{_SPAN_OCC_SQL}
SELECT span, CAST(count(*) AS BIGINT) AS n_occ,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM occ GROUP BY span HAVING count(*) >= 2
ORDER BY n_occ DESC, span
"""


def q_span_removal_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document removal budget for exact-substring dedup: keep the
    globally first occurrence of each duplicated 5-token span, mark every
    other occurrence's token positions removable, report distinct covered
    positions per doc and the exact integer ppm of the doc that is
    copy-paste (operators/spans.py::span_removal_plan). The actionable
    output of duplicate_spans: what to cut, from where, how much."""
    from ingestion_scripts_spark.operators import spans as SP

    docs = _t(spark, sf_dir, "documents")
    return SP.span_removal_plan(docs, "doc_id", "text", k=5).orderBy("doc_id")


SQL_SPAN_REMOVAL_PLAN = f"""
{_SPAN_OCC_SQL},
ranked AS (
  SELECT doc_id, pos, span,
         row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY span) AS n_occ
  FROM occ),
cov AS (
  SELECT DISTINCT doc_id, p
  FROM (SELECT doc_id, unnest(range(pos, pos + 5)) AS p
        FROM ranked WHERE n_occ >= 2 AND rn >= 2)),
perdoc AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id),
tot AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)
SELECT t.doc_id, t.n_tokens,
       CAST(coalesce(p.n_removed, 0) AS BIGINT) AS n_removed,
       CAST(CASE WHEN t.n_tokens = 0 THEN 0
                 ELSE (coalesce(p.n_removed, 0) * 1000000) // t.n_tokens
            END AS BIGINT) AS removed_ppm
FROM tot t LEFT JOIN perdoc p USING (doc_id)
ORDER BY doc_id
"""


def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2-D skyline of part (minimize retail price, maximize size):
    the multi-criteria filtering operator. NOT the O(n^2) dominance
    anti-join — the frontier is computed on the per-price aggregate
    (keyed shuffle), the running-max window sees only |distinct price|
    rows, and full rows come back via a broadcast join of the frontier
    points (operators/profiling.py::pareto_frontier_2d)."""
    from ingestion_scripts_spark.operators import profiling as PR

    part = _t(spark, sf_dir, "part")
    out = PR.pareto_frontier_2d(
        part,
        PR.snap_units(F.col("p_retailprice"), 100),
        F.col("p_size").cast("bigint"),
        ["p_partkey"],
    )
    return out.select(
        "p_partkey",
        F.col("__x").alias("price_cents"),
        F.col("__y").alias("p_size"),
    ).orderBy("price_cents", "p_partkey")


SQL_PARETO_FRONTIER = """
WITH p AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS pc
  FROM part),
per_x AS (SELECT pc, max(p_size) AS best FROM p GROUP BY pc),
fr AS (
  SELECT pc, best,
         max(best) OVER (ORDER BY pc
                         RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
  FROM per_x),
fp AS (SELECT pc, best FROM fr WHERE prev IS NULL OR best > prev)
SELECT p.p_partkey, p.pc AS price_cents, p.p_size
FROM p JOIN fp ON p.pc = fp.pc AND p.p_size = fp.best
ORDER BY price_cents, p_partkey
"""


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift per event_type between the
    even-event_id and odd-event_id halves (the continuous-distribution
    complement to token_kl_drift): D = max |F_A - F_B| computed as exact
    BIGINT cross-multiplied CDF numerators |ca*nb - cb*na|, one float
    divide at the end (operators/profiling.py::ks_statistic)."""
    from ingestion_scripts_spark.operators import profiling as PR

    ev = _t(spark, sf_dir, "events")
    out = PR.ks_statistic(
        ev,
        "event_type",
        PR.snap_units(F.col("value"), 1000000),
        F.col("event_id") % 2 == 0,
    )
    return out.orderBy("event_type")


SQL_KS_DRIFT = """
WITH base AS (
  SELECT event_type,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm,
         CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS a
  FROM events),
cum AS (
  SELECT event_type, vm, a,
         sum(a) OVER (PARTITION BY event_type ORDER BY vm
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         sum(1 - a) OVER (PARTITION BY event_type ORDER BY vm
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
  FROM base),
tot AS (
  SELECT event_type, CAST(sum(a) AS BIGINT) AS n_a,
         CAST(sum(1 - a) AS BIGINT) AS n_b
  FROM base GROUP BY event_type)
SELECT c.event_type, t.n_a, t.n_b,
       CAST(max(abs(c.ca * t.n_b - c.cb * t.n_a)) AS BIGINT) AS d_num,
       round(CAST(max(abs(c.ca * t.n_b - c.cb * t.n_a)) AS DOUBLE)
             / CAST(t.n_a * t.n_b AS DOUBLE), 6) AS ks
FROM cum c JOIN tot t USING (event_type)
GROUP BY c.event_type, t.n_a, t.n_b
ORDER BY event_type
"""


def q_column_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between customer nation and market segment —
    the dependence profile between two categorical columns (dataset-card
    material; near-zero cells expose sampling bias). Per-cell
    contributions (nxy/N)*ln(nxy*N/(nx*ny)) snap to exact nano-units so
    the corpus total is an order-independent integer SUM
    (operators/profiling.py::mutual_information)."""
    from ingestion_scripts_spark.operators import profiling as PR

    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = cust.join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
    out = PR.mutual_information(joined, "n_name", "c_mktsegment")
    return out.orderBy(F.desc("mi_nano"), "n_name", "c_mktsegment")


SQL_COLUMN_MUTUAL_INFO = """
WITH j AS (
  SELECT n.n_name, c.c_mktsegment
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
cells AS (SELECT n_name, c_mktsegment, count(*) AS nxy FROM j GROUP BY 1, 2),
mx AS (SELECT n_name, count(*) AS nx FROM j GROUP BY 1),
my AS (SELECT c_mktsegment, count(*) AS ny FROM j GROUP BY 1),
n AS (SELECT count(*) AS n_total FROM j),
contrib AS (
  SELECT c.n_name, c.c_mktsegment, CAST(c.nxy AS BIGINT) AS nxy,
         CAST(floor((CAST(c.nxy AS DOUBLE) / CAST(n.n_total AS DOUBLE))
                    * ln(CAST(c.nxy * n.n_total AS DOUBLE)
                         / CAST(mx.nx * my.ny AS DOUBLE))
                    * 1e9 + 0.5) AS BIGINT) AS mi_nano
  FROM cells c JOIN mx USING (n_name) JOIN my USING (c_mktsegment), n)
SELECT n_name, c_mktsegment, nxy, mi_nano,
       CAST(sum(mi_nano) OVER () AS BIGINT) AS total_mi_nano
FROM contrib
ORDER BY mi_nano DESC, n_name, c_mktsegment
"""


# ---------------------------------------------------------------------------
# r4 batch 10: incremental view maintenance, SNM blocking, CUSUM, HT sampling
# ---------------------------------------------------------------------------

def q_incremental_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance (operators/ivm.py): the
    per-customer (count, revenue) view is maintained as
    view (+) agg(inserts) (-) agg(deletes) — three keyed delta
    aggregations and one outer merge join; the base fact table is never
    rescanned. The ORACLE is a full recompute over base − deletes +
    inserts, so the driver's hash match IS the IVM law (incremental ==
    recompute, bit for bit). Base = orders before 2000-01-01; inserts =
    the rest; deletes = base rows with o_orderkey % 13 == 0."""
    from ingestion_scripts_spark.operators import ivm as IVM
    from ingestion_scripts_spark.operators import profiling as PR

    orders = _t(spark, sf_dir, "orders")
    split = F.lit("2000-01-01").cast("timestamp")
    rows = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        PR.snap_units(F.col("o_totalprice"), 100).alias("rc"),
    )
    base = rows.where(F.col("o_orderdate") < split)
    inserts = rows.where(F.col("o_orderdate") >= split)
    deletes = base.where(F.col("o_orderkey") % 13 == 0)

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("rc").alias("revenue_cents"),
        )

    view = IVM.incremental_merge(
        agg(base), agg(inserts), agg(deletes),
        ["o_custkey"], "n_orders", ["revenue_cents"],
    )
    return view.orderBy("o_custkey")


SQL_INCREMENTAL_AGG_VIEW = """
WITH eff AS (
  SELECT o_custkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS rc
  FROM orders
  WHERE NOT (o_orderdate < TIMESTAMP '2000-01-01' AND o_orderkey % 13 = 0))
SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(rc) AS BIGINT) AS revenue_cents
FROM eff GROUP BY o_custkey ORDER BY o_custkey
"""


def q_snm_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-Neighborhood blocking over canonicalized part names
    (operators/editdist.py::snm_candidate_pairs): sort by the
    sorted-token key, pair each record with its next 2 neighbors per
    band — candidate volume is exactly n*2 regardless of key skew, the
    linear-output complement to q-gram blocking. Levenshtein attached
    for downstream thresholding."""
    from ingestion_scripts_spark.operators import editdist as ED

    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.array_join(
            F.array_sort(X.tokenize_ws(F.lower(F.col("p_name")))), " "
        ).alias("key"),
    )
    out = ED.snm_candidate_pairs(part, "p_partkey", "key", window=2)
    return out.orderBy("band", "id_a", "id_b")


SQL_SNM_BLOCKING = """
WITH k AS (
  SELECT p_partkey,
         array_to_string(list_sort(list_filter(string_split(lower(p_name), ' '),
                                               t -> t <> '')), ' ') AS key
  FROM part),
b AS (SELECT p_partkey, key, substr(key, 1, 1) AS band FROM k),
r AS (SELECT band, p_partkey, key,
             row_number() OVER (PARTITION BY band ORDER BY key, p_partkey) AS rn
      FROM b)
SELECT a.band, a.p_partkey AS id_a, c.p_partkey AS id_b,
       CAST(levenshtein(a.key, c.key) AS BIGINT) AS dist
FROM r a JOIN r c ON a.band = c.band AND c.rn - a.rn IN (1, 2)
ORDER BY a.band, id_a, id_b
"""


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point per event_type over the time-ordered value
    stream (operators/profiling.py::cusum_changepoint): the k maximizing
    |n*prefix_k − k*total| — the division-free cross-multiplied form of
    cumulative deviation from the mean, exact BIGINT end to end. The
    regime-shift detector next to ks_drift (distribution) and
    token_kl_drift (vocabulary)."""
    from ingestion_scripts_spark.operators import profiling as PR

    ev = _t(spark, sf_dir, "events")
    out = PR.cusum_changepoint(
        ev, "event_type", ["ts", "event_id"], PR.snap_units(F.col("value"), 100)
    )
    return out.orderBy("event_type")


SQL_CUSUM_CHANGEPOINT = """
WITH base AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events),
cum AS (
  SELECT event_type,
         sum(v) OVER (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS k,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(v) OVER (PARTITION BY event_type) AS total
  FROM base),
s AS (SELECT event_type, n, k, abs(n * prefix - k * total) AS s_abs FROM cum),
r AS (SELECT event_type, n, k, s_abs,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY s_abs DESC, k ASC) AS rn
      FROM s)
SELECT event_type, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_at_max,
       CAST(s_abs AS BIGINT) AS s_abs_max
FROM r WHERE rn = 1 ORDER BY event_type
"""


def q_ht_sampling_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz-Thompson estimation-error harness: a deterministic 1-in-10
    hash sample of orders estimates total revenue as 10 * sample_sum
    (inclusion probability 1/10), and the harness COMPUTES the error
    against the exact total — measure, don't guess, for every
    sample-based shortcut in this repo. All integers until the final
    reported ppm (integer division)."""
    orders = _t(spark, sf_dir, "orders")
    from ingestion_scripts_spark.operators import profiling as PR

    h = X.hash64(F.concat(F.lit("ht:"), F.col("o_orderkey").cast("string"))) % 10
    rows = orders.select(
        PR.snap_units(F.col("o_totalprice"), 100).alias("rc"),
        (h == 0).cast("int").alias("in_sample"),
    )
    agg = rows.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("in_sample").cast("bigint").alias("n_sample"),
        F.sum("rc").alias("true_cents"),
        (F.sum(F.col("rc") * F.col("in_sample")) * 10).alias("est_cents"),
    )
    return agg.select(
        "n_total",
        "n_sample",
        F.col("true_cents").cast("bigint").alias("true_cents"),
        F.col("est_cents").cast("bigint").alias("est_cents"),
        F.expr(
            "CAST((abs(est_cents - true_cents) * 1000000) DIV true_cents AS BIGINT)"
        ).alias("err_ppm"),
    )


SQL_HT_SAMPLING_ERROR = f"""
WITH rows_ AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS rc,
         CASE WHEN ({O.sql_hash64("('ht:' || CAST(o_orderkey AS VARCHAR))")}) % 10 = 0
              THEN 1 ELSE 0 END AS in_sample
  FROM orders),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total,
         CAST(sum(in_sample) AS BIGINT) AS n_sample,
         CAST(sum(rc) AS BIGINT) AS true_cents,
         CAST(sum(rc * in_sample) * 10 AS BIGINT) AS est_cents
  FROM rows_)
SELECT n_total, n_sample, true_cents, est_cents,
       CAST((abs(est_cents - true_cents) * 1000000) // true_cents AS BIGINT) AS err_ppm
FROM agg
"""


# ---------------------------------------------------------------------------
# r4 batch 11: streaming quota admission
# ---------------------------------------------------------------------------

def q_stream_quota_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-source QUOTA admission (streams.py::quota_admit):
    each source may ingest at most 15 documents over the stream's
    lifetime — the streaming form of domain caps / rate limiting, as
    keyed state that must survive the batch boundary. Documents replay
    as two deterministic micro-batches (even then odd doc_ids); a
    source's budget spent in batch 0 must stay spent in batch 1, which
    is exactly what the closed-form oracle (admit_rank over batch
    parity then doc_id) checks."""
    import glob
    import os
    import tempfile
    import time
    import uuid

    from ingestion_scripts_spark.streaming.streams import quota_admit

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    src = tempfile.mkdtemp(prefix="quota_src_")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b0")
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b1")
    now = time.time()
    for i, d in enumerate(("b0", "b1")):
        for p in glob.glob(f"{src}/{d}/*.parquet"):
            os.utime(p, (now - 200 + 50 * i, now - 200 + 50 * i))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    admitted = quota_admit(stream, "source", "doc_id", quota=15)
    name = "stream_quota_" + uuid.uuid4().hex[:8]
    q = (
        admitted.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("source", "admit_rank")


SQL_STREAM_QUOTA = """
WITH ranked AS (
  SELECT source, doc_id,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY doc_id % 2, doc_id) AS BIGINT)
           AS admit_rank
  FROM documents)
SELECT source, doc_id, admit_rank FROM ranked
WHERE admit_rank <= 15 ORDER BY source, admit_rank
"""


# ---------------------------------------------------------------------------
# r4 batch 12: entity resolution end-to-end
# ---------------------------------------------------------------------------

def q_er_canonical_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution END-TO-END: SNM blocking over canonicalized part
    names (editdist.snm_candidate_pairs) → edit-distance threshold
    (dist <= 2) → exact-key contraction → star connected components →
    canonical entity id = min partkey per cluster, with member counts.
    The composition that turns the blocking + matching + clustering
    operators into a master-data table: every part mapped to exactly one
    entity, singletons included. The oracle replays the same pair set
    through a recursive transitive closure."""
    from ingestion_scripts_spark.operators import editdist as ED

    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.array_join(
            F.array_sort(X.tokenize_ws(F.lower(F.col("p_name")))), " "
        ).alias("key"),
    )
    part = persist_tracked(part)
    # CONTRACT identical keys before iterating: same-key rows are
    # consecutive in the SNM sort order, hence already connected by
    # dist-0 lead edges — collapsing each key group to its min-partkey
    # representative preserves components EXACTLY while shrinking the
    # iterative graph from |rows| to |distinct keys| and cutting chain
    # length by the duplication factor (33 s -> ~3 s at sf0.1).
    reps = part.groupBy("key").agg(F.min("p_partkey").alias("rep"))
    part_rep = part.join(reps, "key")
    edges = ED.snm_candidate_pairs(part, "p_partkey", "key", window=2).where(
        F.col("dist") <= 2
    )
    ra = part_rep.select(F.col("p_partkey").alias("id_a"), F.col("rep").alias("rep_a"))
    rb = part_rep.select(F.col("p_partkey").alias("id_b"), F.col("rep").alias("rep_b"))
    cedges = (
        edges.join(ra, "id_a")
        .join(rb, "id_b")
        .where(F.col("rep_a") != F.col("rep_b"))
        .select(F.col("rep_a").alias("id_a"), F.col("rep_b").alias("id_b"))
        .distinct()
    )
    comp = D.connected_components_star(cedges, "id_a", "id_b", max_iter=40)
    mapped = part_rep.join(
        comp, part_rep["rep"] == comp["node"], "left"
    ).select(
        "p_partkey",
        F.coalesce(F.col("comp"), F.col("rep")).cast("bigint").alias(
            "entity_id"
        ),
    )
    sizes = mapped.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return mapped.join(sizes, "entity_id").select(
        "p_partkey", "entity_id", "n_members"
    ).orderBy("p_partkey")


SQL_ER_CANONICAL = """
WITH RECURSIVE k AS (
  SELECT p_partkey,
         array_to_string(list_sort(list_filter(string_split(lower(p_name), ' '),
                                               t -> t <> '')), ' ') AS key
  FROM part),
b AS (SELECT p_partkey, key, substr(key, 1, 1) AS band FROM k),
r AS (SELECT band, p_partkey, key,
             row_number() OVER (PARTITION BY band ORDER BY key, p_partkey) AS rn
      FROM b),
pairs AS (
  SELECT a.p_partkey AS id_a, c.p_partkey AS id_b
  FROM r a JOIN r c ON a.band = c.band AND c.rn - a.rn IN (1, 2)
  WHERE levenshtein(a.key, c.key) <= 2),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach AS (SELECT a, b FROM edges
          UNION SELECT rr.a, e.b FROM reach rr JOIN edges e ON rr.b = e.a),
comp AS (SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a),
mapped AS (
  SELECT p.p_partkey,
         CAST(coalesce(c.comp, p.p_partkey) AS BIGINT) AS entity_id
  FROM part p LEFT JOIN comp c ON p.p_partkey = c.node),
sizes AS (SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members
          FROM mapped GROUP BY entity_id)
SELECT m.p_partkey, m.entity_id, s.n_members
FROM mapped m JOIN sizes s USING (entity_id)
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# r4 batch 13: graph traversal (bounded-hop BFS)
# ---------------------------------------------------------------------------

def q_bfs_hops_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop BFS over the part co-order graph from a deterministic
    seed set (partkey % 97 == 0): the traversal primitive
    (graph.py::bfs_hops) — minimal hop distance within 6 hops, frontier
    expanded exactly once per node. Completes the graph family: PageRank
    (importance), triangles (density), components (reachability), BFS
    (distance). Oracle: recursive CTE over distinct (node, hop) states
    — UNION, not UNION ALL, so paths collapse into states and the
    closure is O(nodes * hops)."""
    from ingestion_scripts_spark.operators import graph as G

    li = _t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("it")
    ).distinct()
    x, y = b.alias("x"), b.alias("y")
    edges = (
        x.join(y, (F.col("x.bk") == F.col("y.bk")) & (F.col("x.it") < F.col("y.it")))
        .groupBy(F.col("x.it").alias("a"), F.col("y.it").alias("b"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("a", "b")
    )
    nodes = edges.select(F.col("a").alias("node")).union(
        edges.select(F.col("b").alias("node"))
    ).distinct()
    seeds = nodes.where(F.col("node") % 97 == 0)
    return G.bfs_hops(edges, seeds, "a", "b", "node", max_hops=6).orderBy("node")


SQL_BFS_HOPS = """
WITH RECURSIVE bsk AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
e AS (
  SELECT x.it AS a, y.it AS b
  FROM bsk x JOIN bsk y ON x.bk = y.bk AND x.it < y.it
  GROUP BY 1, 2 HAVING count(*) >= 2),
esym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
nodes AS (SELECT DISTINCT a AS node FROM esym),
walk AS (
  SELECT node, 0 AS hop FROM nodes WHERE node % 97 = 0
  UNION
  SELECT es.b AS node, w.hop + 1 AS hop
  FROM walk w JOIN esym es ON w.node = es.a
  WHERE w.hop < 6)
SELECT node, CAST(min(hop) AS BIGINT) AS hops
FROM walk GROUP BY node ORDER BY node
"""


# ---------------------------------------------------------------------------
# r4 batch 14: PSI drift and chi-square independence
# ---------------------------------------------------------------------------

def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event_type between the even- and
    odd-event_id halves — the binned drift score ML monitoring actually
    alerts on (PSI > 0.2 = retrain), next to ks_drift (unbinned) and
    token_kl_drift (categorical). Fixed reference bins (10 x 50-unit
    value bands — the production form: bins are frozen with the model,
    not re-derived per scoring run), add-one smoothing so empty bins
    stay finite, per-bin contributions (pa−pb)·ln(pa/pb) snapped to
    micro-units, total an order-independent integer SUM."""
    ev = _t(spark, sf_dir, "events")
    from ingestion_scripts_spark.operators import profiling as PR

    base = ev.select(
        "event_type",
        F.least(
            F.floor(PR.snap_units(F.col("value"), 1000000) / 50000000), F.lit(9)
        ).cast("bigint").alias("bin"),
        F.when(F.col("event_id") % 2 == 0, 1).otherwise(0).alias("a"),
    )
    cells = base.groupBy("event_type", "bin").agg(
        F.sum("a").alias("ca_raw"), F.sum(1 - F.col("a")).alias("cb_raw")
    )
    # every (event_type, bin) cell exists, 0-filled: cross the observed
    # event types with the 10 reference bins
    types = base.select("event_type").distinct()
    bins = spark.range(10).select(F.col("id").cast("bigint").alias("bin"))
    grid = types.crossJoin(F.broadcast(bins))
    full = grid.join(cells, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce("ca_raw", F.lit(0)).cast("bigint").alias("ca"),
        F.coalesce("cb_raw", F.lit(0)).cast("bigint").alias("cb"),
    )
    tot = full.groupBy("event_type").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    pa = (F.col("ca") + 1).cast("double") / (F.col("na") + 10).cast("double")
    pb = (F.col("cb") + 1).cast("double") / (F.col("nb") + 10).cast("double")
    scored = full.join(tot, "event_type").withColumn(
        "psi_micro",
        F.floor((pa - pb) * F.log(pa / pb) * F.lit(1e6) + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    return scored.select(
        "event_type",
        "bin",
        "ca",
        "cb",
        "psi_micro",
        F.sum("psi_micro")
        .over(Window.partitionBy("event_type"))
        .alias("total_psi_micro"),
    ).orderBy("event_type", "bin")


SQL_PSI_DRIFT = """
WITH base AS (
  SELECT event_type,
         least(CAST(floor(CAST(floor(value * 1000000 + 0.5) AS BIGINT)
                          / 50000000) AS BIGINT), 9) AS bin,
         CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS a
  FROM events),
cells AS (
  SELECT event_type, bin, CAST(sum(a) AS BIGINT) AS ca_raw,
         CAST(sum(1 - a) AS BIGINT) AS cb_raw
  FROM base GROUP BY 1, 2),
grid AS (
  SELECT t.event_type, CAST(b.b AS BIGINT) AS bin
  FROM (SELECT DISTINCT event_type FROM base) t,
       (SELECT unnest(range(0, 10)) AS b) b),
full_ AS (
  SELECT g.event_type, g.bin,
         coalesce(c.ca_raw, 0) AS ca, coalesce(c.cb_raw, 0) AS cb
  FROM grid g LEFT JOIN cells c ON g.event_type = c.event_type AND g.bin = c.bin),
tot AS (SELECT event_type, CAST(sum(ca) AS BIGINT) AS na,
               CAST(sum(cb) AS BIGINT) AS nb
        FROM full_ GROUP BY 1),
scored AS (
  SELECT f.event_type, f.bin, f.ca, f.cb,
         CAST(floor(
           (CAST(f.ca + 1 AS DOUBLE) / CAST(t.na + 10 AS DOUBLE)
            - CAST(f.cb + 1 AS DOUBLE) / CAST(t.nb + 10 AS DOUBLE))
           * ln((CAST(f.ca + 1 AS DOUBLE) / CAST(t.na + 10 AS DOUBLE))
                / (CAST(f.cb + 1 AS DOUBLE) / CAST(t.nb + 10 AS DOUBLE)))
           * 1e6 + 0.5) AS BIGINT) AS psi_micro
  FROM full_ f JOIN tot t USING (event_type))
SELECT event_type, bin, ca, cb, psi_micro,
       CAST(sum(psi_micro) OVER (PARTITION BY event_type) AS BIGINT)
         AS total_psi_micro
FROM scored
ORDER BY event_type, bin
"""


def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence between event_type and a derived user
    cohort (user_id % 4) — the significance test behind every A/B table:
    per-cell contribution ((O·N − rt·ct)/N)²/E computed as ONE exact
    BIGINT difference (O·N − rt·ct; the float square happens on an
    integer-exact operand, so both engines square the same number),
    then two float ops. Complements column_mutual_info (effect size)
    with the test statistic."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type", (F.col("user_id") % 4).cast("bigint").alias("cohort")
    )
    cells = base.groupBy("event_type", "cohort").agg(
        F.count(F.lit(1)).alias("o")
    )
    from ingestion_scripts_spark.caching import persist_tracked

    cells = persist_tracked(cells)
    rt = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    ct = cells.groupBy("cohort").agg(F.sum("o").alias("ct"))
    n = cells.agg(F.sum("o").alias("n_total"))
    scored = (
        cells.join(rt, "event_type")
        .join(ct, "cohort")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "diff", (F.col("o") * F.col("n_total") - F.col("rt") * F.col("ct"))
        )
        .withColumn(
            "chi2_nano",
            F.floor(
                (F.col("diff").cast("double") * F.col("diff").cast("double"))
                / (
                    F.col("rt").cast("double")
                    * F.col("ct").cast("double")
                    * F.col("n_total").cast("double")
                )
                * F.lit(1e9)
                + F.lit(0.5)
            ).cast("bigint"),
        )
    )
    return scored.select(
        "event_type",
        "cohort",
        F.col("o").cast("bigint").alias("o"),
        "chi2_nano",
        F.sum("chi2_nano").over(Window.partitionBy(F.lit(1))).alias(
            "total_chi2_nano"
        ),
    ).orderBy("event_type", "cohort")


SQL_CHI2_INDEPENDENCE = """
WITH base AS (
  SELECT event_type, CAST(user_id % 4 AS BIGINT) AS cohort FROM events),
cells AS (SELECT event_type, cohort, count(*) AS o FROM base GROUP BY 1, 2),
rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
ct AS (SELECT cohort, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
n AS (SELECT CAST(sum(o) AS BIGINT) AS n_total FROM cells),
scored AS (
  SELECT c.event_type, c.cohort, CAST(c.o AS BIGINT) AS o,
         CAST(floor(
           (CAST(c.o * n.n_total - r.rt * t.ct AS DOUBLE)
            * CAST(c.o * n.n_total - r.rt * t.ct AS DOUBLE))
           / (CAST(r.rt AS DOUBLE) * CAST(t.ct AS DOUBLE)
              * CAST(n.n_total AS DOUBLE))
           * 1e9 + 0.5) AS BIGINT) AS chi2_nano
  FROM cells c JOIN rt r USING (event_type) JOIN ct t USING (cohort), n)
SELECT event_type, cohort, o, chi2_nano,
       CAST(sum(chi2_nano) OVER () AS BIGINT) AS total_chi2_nano
FROM scored
ORDER BY event_type, cohort
"""


# ---------------------------------------------------------------------------
# r4 batch 15: multimodal audio framing
# ---------------------------------------------------------------------------

def q_multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio FRAMING leg of the multimodal surface
    (multimodal.py::audio_energy_windows): binary payload → Arrow
    mapInPandas → per-window exact BIGINT energy (sum of squared
    samples) with (media_id, win_no) lineage — the shape VAD / silence
    trimming / loudness normalization consume. Sample decode is the
    documented deterministic stand-in (base64 bytes), so the oracle
    recomputes every sample with ascii() and the whole Arrow round-trip
    is value-checked."""
    from ingestion_scripts_spark.operators.multimodal import (
        audio_energy_windows,
        text_to_media,
    )

    docs = _t(spark, sf_dir, "documents")
    media = text_to_media(docs)
    return audio_energy_windows(media).orderBy("media_id", "win_no")


SQL_MULTIMODAL_AUDIO = """
WITH b AS (
  SELECT doc_id AS media_id, to_base64(encode(text)) AS s FROM documents),
w AS (
  SELECT media_id, CAST(t.i AS BIGINT) AS win_no,
         substr(s, CAST(t.i * 64 + 1 AS BIGINT), 64) AS chunk
  FROM b, unnest(range(0, CAST(ceil(length(s) / 64.0) AS BIGINT))) AS t(i))
SELECT media_id, win_no,
       CAST(length(chunk) AS BIGINT) AS n_samples,
       CAST(list_sum(list_transform(range(1, length(chunk) + 1),
                     j -> ascii(substr(chunk, j, 1)) * ascii(substr(chunk, j, 1))))
            AS BIGINT) AS energy
FROM w WHERE length(chunk) > 0
ORDER BY media_id, win_no
"""


# ---------------------------------------------------------------------------
# r4 batch 16: Bloom dedup audit (bounded-memory dedup, quantified FPs)
# ---------------------------------------------------------------------------

def q_bloom_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-memory Bloom dedup with its false-positive cost COMPUTED,
    not assumed: docs arrive in doc_id order through a 65536-bit / 2-hash
    Bloom filter; a doc is dropped iff both its bits were set by earlier
    docs. The closed-form law: dropped(d) <=> max(first_set(b1),
    first_set(b2)) < d, where first_set(bit) = min doc_id over docs
    carrying that bit — NON-recursive because a dropped doc's bits are by
    definition already set, so inserting dropped docs changes nothing
    and insert-all ≡ insert-admitted. The audit joins exact text dedup
    back in and counts false positives — the measured price of O(m bits)
    state instead of an O(n) exact key set (the streaming twin of
    operators/bloom.py's join pruning; portable md5 hashes so the oracle
    replays bit-for-bit)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    m = 65536
    b1 = X.hash64(F.concat(F.lit("b1:"), F.col("text"))) % m
    b2 = X.hash64(F.concat(F.lit("b2:"), F.col("text"))) % m
    base = docs.select("doc_id", b1.alias("b1"), b2.alias("b2"), "text")
    base = persist_tracked(base)
    bits = base.select("doc_id", F.explode(F.array("b1", "b2")).alias("bit"))
    first_set = bits.groupBy("bit").agg(F.min("doc_id").alias("fs"))
    fs1 = first_set.select(F.col("bit").alias("b1"), F.col("fs").alias("fs1"))
    fs2 = first_set.select(F.col("bit").alias("b2"), F.col("fs").alias("fs2"))
    first_text = base.groupBy("text").agg(F.min("doc_id").alias("ft"))
    scored = (
        base.join(fs1, "b1")
        .join(fs2, "b2")
        .join(first_text, "text")
        .select(
            "doc_id",
            (
                (F.col("fs1") < F.col("doc_id")) & (F.col("fs2") < F.col("doc_id"))
            ).cast("int").alias("dropped"),
            (F.col("ft") < F.col("doc_id")).cast("int").alias("is_dup"),
        )
        .withColumn(
            "false_positive",
            (F.col("dropped") == 1).cast("int") * (F.col("is_dup") == 0).cast("int"),
        )
    )
    w_all = Window.partitionBy(F.lit(1))
    return scored.select(
        "doc_id",
        "dropped",
        "is_dup",
        "false_positive",
        F.sum("dropped").over(w_all).cast("bigint").alias("n_dropped"),
        F.sum("false_positive").over(w_all).cast("bigint").alias("n_false_positives"),
    ).orderBy("doc_id")


SQL_BLOOM_DEDUP_AUDIT = f"""
WITH base AS (
  SELECT doc_id,
         ({O.sql_hash64("('b1:' || text)")}) % 65536 AS b1,
         ({O.sql_hash64("('b2:' || text)")}) % 65536 AS b2,
         text
  FROM documents),
bits AS (
  SELECT doc_id, b1 AS bit FROM base
  UNION ALL SELECT doc_id, b2 AS bit FROM base),
first_set AS (SELECT bit, min(doc_id) AS fs FROM bits GROUP BY bit),
first_text AS (SELECT text, min(doc_id) AS ft FROM base GROUP BY text),
scored AS (
  SELECT b.doc_id,
         CAST(CASE WHEN f1.fs < b.doc_id AND f2.fs < b.doc_id
              THEN 1 ELSE 0 END AS INT) AS dropped,
         CAST(CASE WHEN t.ft < b.doc_id THEN 1 ELSE 0 END AS INT) AS is_dup
  FROM base b
  JOIN first_set f1 ON b.b1 = f1.bit
  JOIN first_set f2 ON b.b2 = f2.bit
  JOIN first_text t ON b.text = t.text),
fp AS (
  SELECT doc_id, dropped, is_dup,
         CAST(CASE WHEN dropped = 1 AND is_dup = 0 THEN 1 ELSE 0 END AS INT)
           AS false_positive
  FROM scored)
SELECT doc_id, dropped, is_dup, false_positive,
       CAST(sum(dropped) OVER () AS BIGINT) AS n_dropped,
       CAST(sum(false_positive) OVER () AS BIGINT) AS n_false_positives
FROM fp ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# r4 batch 17: seeded label propagation, join-size estimation harness
# ---------------------------------------------------------------------------

def q_label_spread_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded label propagation (semi-supervised community assignment)
    over the part co-order graph: seeds (partkey % 97 == 0) carry their
    own id as label; two UNROLLED rounds assign every node the weighted
    majority label of its labeled neighbors (edge weight = co-order
    count; ties → smallest label); seeds stay clamped. Unlike BFS/CC the
    rounds are unrolled INTO the plan — zero driver actions at build,
    each round is one keyed join + one keyed argmax. The community
    complement to connected components: labels compete, they don't just
    flood."""
    li = _t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("it")
    ).distinct()
    x, y = b.alias("x"), b.alias("y")
    e = (
        x.join(y, (F.col("x.bk") == F.col("y.bk")) & (F.col("x.it") < F.col("y.it")))
        .groupBy(F.col("x.it").alias("a"), F.col("y.it").alias("b"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
    )
    esym = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    )
    esym = persist_tracked(esym)
    seeds = (
        esym.select(F.col("a").alias("node"))
        .distinct()
        .where(F.col("node") % 97 == 0)
        .select("node", F.col("node").alias("label"))
    )

    def spread(labels: DataFrame) -> DataFrame:
        votes = (
            esym.join(labels, esym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"), "label")
            .agg(F.sum("w").alias("votes"))
        )
        w_rank = Window.partitionBy("node").orderBy(
            F.desc("votes"), F.asc("label")
        )
        winner = (
            votes.withColumn("rn", F.row_number().over(w_rank))
            .where(F.col("rn") == 1)
            .select("node", "label")
        )
        # seeds stay clamped: seed label wins over any vote
        return winner.join(seeds.select("node"), "node", "left_anti").unionByName(
            seeds
        )
    labels = spread(spread(seeds))
    return labels.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("label").cast("bigint").alias("label"),
    ).orderBy("node")


SQL_LABEL_SPREAD = """
WITH bsk AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
e AS (
  SELECT x.it AS a, y.it AS b, count(*) AS w
  FROM bsk x JOIN bsk y ON x.bk = y.bk AND x.it < y.it
  GROUP BY 1, 2 HAVING count(*) >= 2),
esym AS (SELECT a, b, w FROM e UNION ALL SELECT b, a, w FROM e),
seeds AS (
  SELECT node, node AS label
  FROM (SELECT DISTINCT a AS node FROM esym) WHERE node % 97 = 0),
r1v AS (
  SELECT es.a AS node, s.label, CAST(sum(es.w) AS BIGINT) AS votes
  FROM esym es JOIN seeds s ON es.b = s.node GROUP BY 1, 2),
r1w AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY votes DESC, label ASC) AS rn
    FROM r1v) WHERE rn = 1),
r1 AS (
  SELECT node, label FROM r1w WHERE node NOT IN (SELECT node FROM seeds)
  UNION ALL SELECT node, label FROM seeds),
r2v AS (
  SELECT es.a AS node, l.label, CAST(sum(es.w) AS BIGINT) AS votes
  FROM esym es JOIN r1 l ON es.b = l.node GROUP BY 1, 2),
r2w AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY votes DESC, label ASC) AS rn
    FROM r2v) WHERE rn = 1),
r2 AS (
  SELECT node, label FROM r2w WHERE node NOT IN (SELECT node FROM seeds)
  UNION ALL SELECT node, label FROM seeds)
SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
FROM r2 ORDER BY node
"""


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation by KEY sampling — the shuffle-planning
    harness: hash-sample 1-in-20 of the join KEYS (key sampling keeps
    every matching pair of a sampled key, so the estimator is unbiased:
    E[20·|A_s ⋈ B_s|] = |A ⋈ B|), scale up, and COMPUTE the error
    against the exact join size (itself obtained without materializing
    the join: sum over keys of cnt_l·cnt_o). All integers; one row."""
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    od = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    cl = li.groupBy("k").agg(F.count(F.lit(1)).alias("cl"))
    co = od.groupBy("k").agg(F.count(F.lit(1)).alias("co"))
    joined = cl.join(co, "k").select(
        "k",
        (F.col("cl") * F.col("co")).alias("pairs"),
        (X.hash64(F.concat(F.lit("js:"), F.col("k").cast("string"))) % 20 == 0)
        .cast("int")
        .alias("in_sample"),
    )
    agg = joined.agg(
        F.sum("pairs").cast("bigint").alias("true_pairs"),
        (F.sum(F.col("pairs") * F.col("in_sample")) * 20)
        .cast("bigint")
        .alias("est_pairs"),
        F.sum("in_sample").cast("bigint").alias("n_sampled_keys"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    return agg.select(
        "n_keys",
        "n_sampled_keys",
        "true_pairs",
        "est_pairs",
        F.expr(
            "CAST((abs(est_pairs - true_pairs) * 1000000) DIV true_pairs AS BIGINT)"
        ).alias("err_ppm"),
    )


SQL_JOIN_SIZE_ESTIMATE = f"""
WITH cl AS (SELECT l_orderkey AS k, count(*) AS cl FROM lineitem GROUP BY 1),
co AS (SELECT o_orderkey AS k, count(*) AS co FROM orders GROUP BY 1),
j AS (
  SELECT cl.k, CAST(cl.cl * co.co AS BIGINT) AS pairs,
         CASE WHEN ({O.sql_hash64("('js:' || CAST(cl.k AS VARCHAR))")}) % 20 = 0
              THEN 1 ELSE 0 END AS in_sample
  FROM cl JOIN co ON cl.k = co.k),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(in_sample) AS BIGINT) AS n_sampled_keys,
         CAST(sum(pairs) AS BIGINT) AS true_pairs,
         CAST(sum(pairs * in_sample) * 20 AS BIGINT) AS est_pairs
  FROM j)
SELECT n_keys, n_sampled_keys, true_pairs, est_pairs,
       CAST((abs(est_pairs - true_pairs) * 1000000) // true_pairs AS BIGINT)
         AS err_ppm
FROM agg
"""


# ---------------------------------------------------------------------------
# r4 batch 18: pandas UDAF (grouped-agg) and applyInArrow surfaces
# ---------------------------------------------------------------------------

def q_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas GROUPED-AGG UDAF surface (Series -> scalar through
    Arrow), done order-independently: the JVM precomputes integer
    log-micro values (floor(ln(value)*1e6+0.5) — same libm call both
    engines), the UDAF is a plain integer sum (commutative, so Arrow
    batch order cannot flip it), and the geometric mean exponentiates
    the exact integer total. Covers the one Python-aggregation API the
    engine had not yet certified; everything stays Arrow-batched."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # NOTE: explicit GROUPED_AGG functionType — this module has
    # `from __future__ import annotations`, which turns signature
    # annotations into strings Spark's inference cannot resolve.
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def int_sum(s):
        return int(s.sum())

    ev = _t(spark, sf_dir, "events").where(F.col("value") > 0)  # gmean domain
    lm = F.floor(F.log(F.col("value")) * 1000000.0 + F.lit(0.5)).cast("bigint")
    base = ev.select("event_type", lm.alias("lm"))
    # a grouped-agg pandas UDF cannot mix with JVM aggregates in one
    # agg() — count rides through a second UDAF column instead
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def int_count(s):
        return int(len(s))

    agg = base.groupBy("event_type").agg(
        int_count("lm").alias("n"), int_sum("lm").alias("sum_lm")
    )
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        "sum_lm",
        F.floor(
            F.exp(F.col("sum_lm").cast("double") / (F.col("n") * 1000000.0))
            * 1000000.0
            + F.lit(0.5)
        ).cast("bigint").alias("gmean_micro"),
    ).orderBy("event_type")


SQL_GROUPED_AGG_UDAF = """
WITH base AS (
  SELECT event_type,
         CAST(floor(ln(value) * 1000000.0 + 0.5) AS BIGINT) AS lm
  FROM events WHERE value > 0),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(lm) AS BIGINT) AS sum_lm
  FROM base GROUP BY event_type)
SELECT event_type, n, sum_lm,
       CAST(floor(exp(CAST(sum_lm AS DOUBLE) / (n * 1000000.0))
                  * 1000000.0 + 0.5) AS BIGINT) AS gmean_micro
FROM agg ORDER BY event_type
"""


def q_arrow_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ``applyInArrow`` grouped-map surface: each source's
    documents arrive as a pyarrow Table (no pandas detour), per-group
    stats computed with pyarrow.compute on exact integers. The
    Arrow-native sibling of applyInPandas — zero serialization to
    pandas, the fastest Python crossing the engine offers."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(table: pa.Table) -> pa.Table:
        n = table.num_rows
        chars = pc.sum(pc.utf8_length(table.column("text"))).as_py() or 0
        max_id = pc.max(table.column("doc_id")).as_py()
        return pa.table(
            {
                "source": [table.column("source")[0].as_py()],
                "n_docs": pa.array([n], pa.int64()),
                "total_chars": pa.array([int(chars)], pa.int64()),
                "max_doc_id": pa.array([int(max_id)], pa.int64()),
            }
        )

    docs = _t(spark, sf_dir, "documents").select("source", "doc_id", "text")
    out = docs.groupBy("source").applyInArrow(
        stats, "source string, n_docs long, total_chars long, max_doc_id long"
    )
    return out.orderBy("source")


SQL_ARROW_GROUP_STATS = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(max(doc_id) AS BIGINT) AS max_doc_id
FROM documents GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# r4 batch 19: model-eval AUC, bot-traffic detection, index compaction
# ---------------------------------------------------------------------------

def q_roc_auc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ROC-AUC of document length as a predictor of
    lang == 'en' (the classifier-eval primitive every curation model —
    quality scorer, langid, toxicity — is graded with at corpus scale).
    Tie-correct Mann-Whitney ranks carried as exact BIGINTs, one float
    divide rounded to 6 places (operators/profiling.py::roc_auc)."""
    from ingestion_scripts_spark.operators import profiling as PR

    docs = _t(spark, sf_dir, "documents")
    out = PR.roc_auc(
        docs, "source", F.col("n_chars"), F.col("lang") == F.lit("en")
    )
    return out.orderBy("source")


SQL_ROC_AUC_QUALITY = """
WITH base AS (
  SELECT source AS g, CAST(n_chars AS BIGINT) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents),
ranked AS (
  SELECT g, s, y,
         rank() OVER (PARTITION BY g ORDER BY s) AS rmin,
         count(*) OVER (PARTITION BY g, s) AS ties
  FROM base),
agg AS (
  SELECT g, CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(1 - y) AS BIGINT) AS n_neg,
         CAST(sum(y * (2 * rmin + ties - 1)) AS BIGINT) AS s2
  FROM ranked GROUP BY g)
SELECT g AS source, n_pos, n_neg,
       CAST(s2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN round(CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
                       / CAST(2 * n_pos * n_neg AS DOUBLE), 6)
       END AS auc
FROM agg ORDER BY source
"""


def q_bot_burst_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Machine-traffic detection from inter-arrival regularity: per-user
    whole-second gaps (deterministic (ts, event_id) order), flagged when
    CV^2 < 1/20 over >= 30 gaps. The variance test is exact DECIMAL
    cross-multiplication — 20*n*sum(g^2) < 21*sum(g)^2 — with widths
    chosen so BOTH engines stay on the int128 decimal path (DuckDB
    silently falls back to DOUBLE when a product exceeds width 38)
    (operators/profiling.py::interarrival_stats)."""
    from ingestion_scripts_spark.operators import profiling as PR

    ev = _t(spark, sf_dir, "events")
    out = PR.interarrival_stats(
        ev, "user_id", "ts", "event_id", min_gaps=30, cv2_den=20
    )
    return out.orderBy("user_id")


SQL_BOT_BURST_USERS = """
WITH gaps AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS gap
  FROM events),
gg AS (
  SELECT user_id, CAST(gap AS DECIMAL(18,0)) AS g
  FROM gaps WHERE gap IS NOT NULL),
agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(g) AS DECIMAL(18,0)) AS sg,
         CAST(sum(g * g) AS DECIMAL(26,0)) AS sg2
  FROM gg GROUP BY user_id)
SELECT user_id, n_gaps, CAST(sg AS BIGINT) AS sum_gap_s,
       CASE WHEN n_gaps >= 30
             AND CAST(20 AS DECIMAL(2,0)) * CAST(n_gaps AS DECIMAL(8,0)) * sg2
                 < CAST(21 AS DECIMAL(2,0)) * sg * sg
            THEN 1 ELSE 0 END AS is_bot
FROM agg ORDER BY user_id
"""


def q_index_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSM-style dedup-index compaction: three index segments (initial
    build, a re-ingest of every 5th doc, and a segment of deletes for
    every 15th plus updates for every 7th) fold into one via
    latest-segment-wins + tombstone drop (operators/sink.py::
    compact_segments — ONE keyed row_number window, no join). The
    maintenance half of the incremental near-dup index
    (operators/dedup.py::minhash_incremental_pairs)."""
    from ingestion_scripts_spark.operators import sink as SK

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")

    def seg(df, seg_no, op):
        return df.select(
            "doc_id", F.lit(seg_no).alias("seg"), F.lit(op).alias("op")
        )

    segs = (
        seg(docs, 0, "upsert")
        .unionAll(seg(docs.where(did % 5 == 0), 1, "upsert"))
        .unionAll(seg(docs.where(did % 15 == 0), 2, "delete"))
        .unionAll(seg(docs.where((did % 7 == 0) & (did % 15 != 0)), 2, "upsert"))
    )
    segs = segs.withColumn(
        "sig",
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", did.cast("string"), F.col("seg").cast("string")
                )
            ),
            1,
            8,
        ),
    )
    out = SK.compact_segments(segs, ["doc_id"], "seg", "op")
    return out.select(
        "doc_id", F.col("seg").cast("int").alias("chosen_seg"), "sig"
    ).orderBy("doc_id")


SQL_INDEX_COMPACTION = """
WITH segs AS (
  SELECT doc_id, 0 AS seg, 'upsert' AS op FROM documents
  UNION ALL
  SELECT doc_id, 1, 'upsert' FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, 2, 'delete' FROM documents WHERE doc_id % 15 = 0
  UNION ALL
  SELECT doc_id, 2, 'upsert' FROM documents
  WHERE doc_id % 7 = 0 AND doc_id % 15 <> 0),
sig AS (
  SELECT doc_id, seg, op,
         substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(seg AS VARCHAR)),
                1, 8) AS sig
  FROM segs),
win AS (
  SELECT doc_id, seg, op, sig,
         row_number() OVER (
             PARTITION BY doc_id
             ORDER BY seg DESC,
                      CASE WHEN op = 'delete' THEN 0 ELSE 1 END, op) AS rn
  FROM sig)
SELECT doc_id, CAST(seg AS INT) AS chosen_seg, sig
FROM win WHERE rn = 1 AND op <> 'delete'
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# r5 batch 2: record linkage, agreement/calibration QA, HITS, Kneser-Ney,
# DP count release, token-bucket rate limiting (batch + streaming)
# ---------------------------------------------------------------------------

def q_fellegi_sunter_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record-linkage scoring
    (operators/linkage.py) over sorted-neighborhood candidates: customers
    blocked by nation, paired with their next 3 acctbal-order neighbors
    (candidate volume exactly 3n, skew-independent), then scored with
    log2 agreement weights on (mktsegment, acctbal-band). u-probabilities
    are ESTIMATED FROM THE DATA as exact integer ratios (Σ n_v(n_v-1) /
    N(N-1), one groupBy per field, broadcast 1-row joins); m-priors are
    fixed. The scoring layer the reference's unique-key dedup sink
    (K3) cannot express — graded match confidence instead of binary."""
    from ingestion_scripts_spark.operators import linkage as L

    cust = _t(spark, sf_dir, "customer")
    recs = cust.select(
        "c_custkey",
        F.col("c_nationkey").cast("bigint").alias("blk"),
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint").alias("bal_cents"),
    ).withColumn(
        "bal_band", F.floor(F.col("bal_cents") / F.lit(100000.0)).cast("bigint")
    )
    pairs = L.sorted_neighborhood_pairs(
        recs.select("c_custkey", "blk", "c_mktsegment", "bal_band", "bal_cents"),
        "c_custkey", "blk", ["bal_cents"], window=3,
    )
    u_seg = L.u_probability(recs, "c_mktsegment", "u_seg")
    u_band = L.u_probability(recs, "bal_band", "u_band")
    agree_seg = F.col("c_mktsegment_a") == F.col("c_mktsegment_b")
    agree_band = F.col("bal_band_a") == F.col("bal_band_b")
    return (
        pairs.crossJoin(F.broadcast(u_seg))
        .crossJoin(F.broadcast(u_band))
        .select(
            "id_a",
            "id_b",
            agree_seg.cast("int").alias("agree_seg"),
            agree_band.cast("int").alias("agree_band"),
            TA.r4(
                L.fs_field_weight(agree_seg, 0.9, F.col("u_seg"))
                + L.fs_field_weight(agree_band, 0.85, F.col("u_band"))
            ).alias("weight"),
        )
        .orderBy("id_a", "id_b")
    )


#: disagreement weights use (1.0 - m) as an EXPRESSION on both sides —
#: the IEEE double 1.0-0.9 is not the literal 0.1, and both engines must
#: evaluate the same subtraction.
SQL_FELLEGI_SUNTER = """
WITH recs AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS blk, c_mktsegment,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
         CAST(floor(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) / 100000.0)
              AS BIGINT) AS bal_band
  FROM customer),
r AS (
  SELECT *, row_number() OVER (PARTITION BY blk ORDER BY bal_cents, c_custkey)
         AS rn
  FROM recs),
u1 AS (
  SELECT sum(nv * (nv - 1)) / (sum(nv) * (sum(nv) - 1)) AS u_seg
  FROM (SELECT count(*)::BIGINT AS nv FROM recs GROUP BY c_mktsegment)),
u2 AS (
  SELECT sum(nv * (nv - 1)) / (sum(nv) * (sum(nv) - 1)) AS u_band
  FROM (SELECT count(*)::BIGINT AS nv FROM recs GROUP BY bal_band)),
p AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
         CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END AS agree_seg,
         CASE WHEN a.bal_band = b.bal_band THEN 1 ELSE 0 END AS agree_band
  FROM r a JOIN r b ON a.blk = b.blk AND b.rn - a.rn IN (1, 2, 3))
SELECT id_a, id_b, agree_seg, agree_band,
       floor((CASE WHEN agree_seg = 1 THEN ln(0.9 / u_seg) / ln(2)
                   ELSE ln((1.0 - 0.9) / (1.0 - u_seg)) / ln(2) END
            + CASE WHEN agree_band = 1 THEN ln(0.85 / u_band) / ln(2)
                   ELSE ln((1.0 - 0.85) / (1.0 - u_band)) / ln(2) END)
             * 10000.0 + 0.5) / 10000.0 AS weight
FROM p, u1, u2
ORDER BY id_a, id_b
"""


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-annotator agreement (operators/profiling.py::cohens_kappa)
    between two deterministic quality raters over documents — rater A:
    n_chars >= 250; rater B: >= 40 whitespace tokens of cleaned text.
    The QA statistic for any double-labeled curation pass; exact BIGINT
    contingency counts, kappa as one double expression, r4."""
    from ingestion_scripts_spark.operators import profiling as PR

    docs = _t(spark, sf_dir, "documents")
    wc = F.size(X.tokenize_ws(X.clean_text(F.col("text")))).cast("bigint")
    return PR.cohens_kappa(
        docs, F.col("n_chars") >= 250, wc >= 40
    )


def _sql_cohens_kappa() -> str:
    toks = O.sql_tokenize_ws(O.sql_clean_text("text"))
    return f"""
WITH flags AS (
  SELECT CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS a,
         CASE WHEN len({toks}) >= 40 THEN 1 ELSE 0 END AS b
  FROM documents),
agg AS (
  SELECT count(*)::BIGINT AS n, sum(a)::BIGINT AS n_a, sum(b)::BIGINT AS n_b,
         sum(CASE WHEN a = b THEN 1 ELSE 0 END)::BIGINT AS n_agree
  FROM flags)
SELECT n, n_a, n_b, n_agree,
       floor((n_agree / n) * 10000.0 + 0.5) / 10000.0 AS po,
       floor(((n_a * n_b + (n - n_a) * (n - n_b)) / (n * n)) * 10000.0 + 0.5)
         / 10000.0 AS pe,
       CASE WHEN (n_a * n_b + (n - n_a) * (n - n_b)) = (n * n) THEN NULL
            ELSE floor(((n_agree / n
                         - (n_a * n_b + (n - n_a) * (n - n_b)) / (n * n))
                        / (1.0 - (n_a * n_b + (n - n_a) * (n - n_b)) / (n * n)))
                       * 10000.0 + 0.5) / 10000.0
       END AS kappa
FROM agg
"""


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + ECE mass for a [0,1] quality score
    (operators/profiling.py::calibration_bins): score = min(1, wc/80)
    held in exact integer micro-units, label = n_chars >= 250, decile
    bins. Per-bin mean-predicted vs empirical positive rate and the
    bin's ECE numerator — ALL BIGINT (integer division), bit-identical
    across engines and partitionings. The calibration audit for every
    learned filter a curation pipeline gates on."""
    from ingestion_scripts_spark.operators import profiling as PR

    docs = _t(spark, sf_dir, "documents")
    wc = F.size(X.tokenize_ws(X.clean_text(F.col("text")))).cast("bigint")
    # score = min(1, wc/80) in micro-units = min(1e6, wc·12500): pure
    # integer arithmetic, no division on either engine
    score_u = F.least(
        F.lit(1_000_000).cast("bigint"), (wc * F.lit(12500)).cast("bigint")
    )
    base = docs.select(
        score_u.alias("__score_u"), (F.col("n_chars") >= 250).alias("__lab")
    )
    return PR.calibration_bins(
        base, F.col("__score_u"), F.col("__lab")
    ).orderBy("bin")


def _sql_calibration_bins() -> str:
    toks = O.sql_tokenize_ws(O.sql_clean_text("text"))
    return f"""
WITH base AS (
  SELECT least(1000000, len({toks}) * 12500)::BIGINT AS s,
         CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS y
  FROM documents),
binned AS (
  SELECT least((s * 10) // 1000000, 9)::BIGINT AS bin, s, y FROM base),
agg AS (
  SELECT bin, count(*)::BIGINT AS n, sum(s)::BIGINT AS ss, sum(y)::BIGINT AS sy
  FROM binned GROUP BY bin)
SELECT bin, n,
       (ss // n)::BIGINT AS mean_score_u,
       ((sy * 1000000) // n)::BIGINT AS pos_rate_u,
       abs(ss // n - (sy * 1000000) // n)::BIGINT AS gap_u,
       (n * abs(ss // n - (sy * 1000000) // n))::BIGINT AS ece_num
FROM agg ORDER BY bin
"""


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hub/authority (operators/graph.py::hits_int) over the
    event-type transition graph (consecutive events per user, weighted
    by count) — 4 exact-integer iterations, max-normalized per
    half-round via broadcast 1-row aggregates. Hub = 'leads into
    engaged activity', authority = 'is the destination of engaged
    activity'; the directed-importance companion to
    pagerank_transitions."""
    from ingestion_scripts_spark.operators import graph as G

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return G.hits_int(edges, "src", "dst", "w", iters=4).orderBy("node")


def _sql_hits_scores(iters: int = 4) -> str:
    """Unrolled-CTE DuckDB twin of hits_int: same BIGINT sums, same
    (x * 1e6) // max rescale per half-round."""
    # every CTE MATERIALIZED: DuckDB inlines plain CTEs at each reference,
    # and each normalization level references the previous one twice — the
    # unrolled chain would otherwise explode exponentially at PLAN time
    parts = ["""
WITH ed AS MATERIALIZED (
  SELECT prev AS src, event_type AS dst, count(*)::BIGINT AS w
  FROM (SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev
        FROM events)
  WHERE prev IS NOT NULL GROUP BY 1, 2),
nodes AS MATERIALIZED (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
h0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS h FROM nodes)"""]
    prev_h = "h0"
    for i in range(1, iters + 1):
        parts.append(f""",
a{i}raw AS MATERIALIZED (
  SELECT n.node, coalesce(sum(e.w * h.h), 0)::BIGINT AS ar
  FROM nodes n
  LEFT JOIN ed e ON e.dst = n.node
  LEFT JOIN {prev_h} h ON h.node = e.src
  GROUP BY 1),
a{i} AS MATERIALIZED (
  SELECT node,
         ((ar * 1000000) // (SELECT greatest(max(ar), 1) FROM a{i}raw))::BIGINT
           AS a
  FROM a{i}raw),
h{i}raw AS MATERIALIZED (
  SELECT n.node, coalesce(sum(e.w * a.a), 0)::BIGINT AS hr
  FROM nodes n
  LEFT JOIN ed e ON e.src = n.node
  LEFT JOIN a{i} a ON a.node = e.dst
  GROUP BY 1),
h{i} AS MATERIALIZED (
  SELECT node,
         ((hr * 1000000) // (SELECT greatest(max(hr), 1) FROM h{i}raw))::BIGINT
           AS h
  FROM h{i}raw)""")
        prev_h = f"h{i}"
    parts.append(f"""
SELECT h.node, h.h AS hub_u, a.a AS auth_u
FROM h{iters} h JOIN a{iters} a USING (node)
ORDER BY h.node""")
    return "".join(parts)


def q_kneser_ney_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (D = 0.75) self-scored per
    language — the modern-smoothing step past bigram_backoff_ppl's
    stupid backoff: P(w2|w1) = max(c12-D,0)/c1 + D·N1+(w1,·)/c1 ·
    Pcont(w2), Pcont(w2) = N1+(·,w2)/|bigram types|. Continuation
    counts come free from the SAME bigram-count aggregate (three keyed
    re-aggregations of one table, no extra pass over tokens); the
    per-language NLL sums over bigram TYPES weighted by count. r4 at
    the end absorbs summation-order float jitter."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", X.tokenize_ws(X.clean_text(F.col("text"))).alias("t")
    )
    tok = toks.select("doc_id", "lang", F.posexplode("t").alias("pos", "w"))
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.withColumn("w_prev", F.lag("w").over(wdoc))
        .filter(F.col("w_prev").isNotNull())
        .groupBy("lang", "w_prev", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    )
    big = persist_tracked(big)
    c1 = big.groupBy("lang", "w_prev").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n1plus"),
    )
    cont = big.groupBy("lang", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("cont_w2")
    )
    tt = big.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("t_types"))
    p = (
        big.join(c1, ["lang", "w_prev"])
        .join(cont, ["lang", "w"])
        .join(F.broadcast(tt), "lang")
        .withColumn(
            "__p",
            (
                F.greatest(F.col("c12") - F.lit(0.75), F.lit(0.0)) / F.col("c1")
                + (F.lit(0.75) * F.col("n1plus") / F.col("c1"))
                * (F.col("cont_w2") / F.col("t_types"))
            ),
        )
    )
    return (
        p.groupBy("lang")
        .agg(
            F.sum("c12").cast("bigint").alias("n_bigrams"),
            F.first("t_types").alias("t_types"),
            TA.r4(F.exp(-F.sum(F.col("c12") * F.log("__p")) / F.sum("c12"))).alias(
                "ppl"
            ),
        )
        .orderBy("lang")
    )


def _sql_kneser_ney_ppl() -> str:
    toks = O.sql_tokenize_ws(O.sql_clean_text("text"))
    return f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(ts) AS w, generate_subscripts(ts, 1) AS pos
  FROM (SELECT doc_id, lang, {toks} AS ts FROM documents)),
big AS (
  SELECT lang, w_prev, w, count(*)::BIGINT AS c12
  FROM (SELECT lang, w,
               lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w_prev
        FROM tok)
  WHERE w_prev IS NOT NULL GROUP BY 1, 2, 3),
c1 AS (SELECT lang, w_prev, sum(c12)::BIGINT AS c1, count(*)::BIGINT AS n1plus
       FROM big GROUP BY 1, 2),
cont AS (SELECT lang, w, count(*)::BIGINT AS cont_w2 FROM big GROUP BY 1, 2),
tt AS (SELECT lang, count(*)::BIGINT AS t_types FROM big GROUP BY 1),
p AS (
  SELECT b.lang, b.c12,
         tt.t_types,
         greatest(b.c12 - 0.75, 0.0) / c1.c1
           + (0.75 * c1.n1plus / c1.c1) * (cont.cont_w2 / (tt.t_types * 1.0))
           AS pr
  FROM big b
  JOIN c1 ON c1.lang = b.lang AND c1.w_prev = b.w_prev
  JOIN cont ON cont.lang = b.lang AND cont.w = b.w
  JOIN tt ON tt.lang = b.lang)
SELECT lang, sum(c12)::BIGINT AS n_bigrams,
       CAST(min(t_types) AS BIGINT) AS t_types,
       floor(exp(-sum(c12 * ln(pr)) / sum(c12)) * 10000.0 + 0.5) / 10000.0
         AS ppl
FROM p GROUP BY lang ORDER BY lang
"""


def q_dp_count_laplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy-STYLE noisy count release per language
    (operators/profiling.py::dp_laplace_noise_u): Laplace(1/ε), ε = 1,
    noise derived deterministically from the portable md5 hash of the
    group key via the inverse CDF — the privacy-budget shape of a real
    DP release with the RNG swapped for a seeded hash so the oracle is
    exact. Counts and noise in integer micro-units; one groupBy, one
    row-local expression."""
    from ingestion_scripts_spark.operators import profiling as PR

    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    noise = PR.dp_laplace_noise_u(F.col("lang"), 1.0, "dp:")
    return (
        counts.select(
            "lang",
            "n",
            noise.alias("noise_u"),
            (F.col("n") * 1_000_000 + noise).cast("bigint").alias("noisy_count_u"),
        )
        .orderBy("lang")
    )


def _sql_dp_count_laplace() -> str:
    h = O.sql_hash64("'dp:' || lang")
    return f"""
WITH counts AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY 1),
u AS (
  SELECT lang, n, (({h} % 999981) + 1) / 999983.0 AS uu FROM counts),
nz AS (
  SELECT lang, n,
         CAST(floor((CASE WHEN uu - 0.5 < 0 THEN -1.0 ELSE 1.0 END)
                    * (1.0 * -ln(1.0 - 2.0 * abs(uu - 0.5)))
                    * 1000000.0 + 0.5) AS BIGINT) AS noise_u
  FROM u)
SELECT lang, n, noise_u,
       (n * 1000000 + noise_u)::BIGINT AS noisy_count_u
FROM nz ORDER BY lang
"""


def q_rate_limit_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket rate limiting replayed per user over event time
    (operators/ratelimit.py): capacity 3 tokens, cost 1/event, refill
    1 token / 10 h — an exact integer milli-token recursion, inherently
    sequential PER KEY, run as one keyed applyInPandas (keys are
    independent: embarrassingly parallel at 100 TB). The oracle is a
    DuckDB recursive CTE of the same recursion. ~15% of events are
    denied at this refill rate, so the law genuinely bites."""
    from ingestion_scripts_spark.operators import ratelimit as RL

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("long").alias("es"),
        "event_id",
    )
    return RL.token_bucket_replay(
        ev, "user_id", "es", "event_id", per_s=36000
    ).orderBy("user_id")


def q_stream_token_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming token-bucket admission
    (streams.py::token_bucket_admit): the same integer milli-token law
    as q_rate_limit_replay, but as keyed state surviving a micro-batch
    boundary — events replay as two time-ordered batches (before/after
    Jan 16) and a bucket drained in batch 0 must still be drained when
    batch 1 arrives. Final per-key emission must equal the batch
    replay, which is exactly what the shared recursive-CTE oracle
    checks."""
    import glob
    import os
    import shutil
    import tempfile
    import time
    import uuid

    from ingestion_scripts_spark.streaming.streams import token_bucket_admit

    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("long").alias("es"), "event_id"
    )
    src = tempfile.mkdtemp(prefix="tb_src_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    try:
        cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp").cast("long")
        ev.filter(F.col("es") < cutoff).coalesce(1).write.mode("overwrite").parquet(
            f"{src}/b0"
        )
        ev.filter(F.col("es") >= cutoff).coalesce(1).write.mode("overwrite").parquet(
            f"{src}/b1"
        )
        # the file source orders same-trigger candidates by mtime; pinning
        # b0 older than b1 makes the two-batch replay deterministic
        now = time.time()
        for i, d in enumerate(("b0", "b1")):
            for pth in glob.glob(f"{src}/{d}/*.parquet"):
                os.utime(pth, (now - 200 + 50 * i, now - 200 + 50 * i))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        out = token_bucket_admit(stream, "user_id", "es", "event_id", per_s=36000)
        name = "stream_tb_" + uuid.uuid4().hex[:8]
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # final state per key = the emission with the highest n_events;
        # materialize BEFORE the finally-block deletes the source dirs
        tbl = spark.table(name)
        rows = (
            tbl.groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max_by("n_admitted", "n_events").alias("n_admitted"),
                F.max_by("tokens_end_mt", "n_events").alias("tokens_end_mt"),
            )
            .orderBy("user_id")
        )
        return spark.createDataFrame(rows.collect(), rows.schema)
    finally:
        # repeated full-registry sweeps must not leak tempdirs (r5 ADVICE)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


from ingestion_scripts_spark.operators.ratelimit import sql_token_bucket as _sql_tb  # noqa: E402

RL_SQL_TOKEN_BUCKET = _sql_tb(per_s=36000)


# ---------------------------------------------------------------------------
# r6 batch 2: k-core, k-center coreset, average precision, SQ8 recall
# ---------------------------------------------------------------------------


def q_kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the part co-order graph (graph.py::kcore_peel): the dense
    kernel the degree/triangle/component queries each miss — spam-farm
    and hub filtering on curation graphs. Same edge builder as
    bfs_hops_coorder; 6 synchronous peel rounds, fixed unroll matched by
    the oracle's identical CTE chain (exact pre-fixpoint equality; the
    law test pins that 6 rounds IS the fixpoint on this graph)."""
    from ingestion_scripts_spark.operators import graph as G

    li = _t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("it")
    ).distinct()
    x, y = b.alias("x"), b.alias("y")
    edges = (
        x.join(y, (F.col("x.bk") == F.col("y.bk")) & (F.col("x.it") < F.col("y.it")))
        .groupBy(F.col("x.it").alias("a"), F.col("y.it").alias("b"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("a", "b")
    )
    return G.kcore_peel(edges, "a", "b", k=3, rounds=6).orderBy("node")


def _sql_kcore_parts(k: int = 3, rounds: int = 6) -> str:
    """Unrolled synchronous-peeling twin; MATERIALIZED is load-bearing —
    alive{r} is referenced twice by deg{r+1}."""
    parts = [
        """
WITH bsk AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
e AS MATERIALIZED (
  SELECT x.it AS a, y.it AS b
  FROM bsk x JOIN bsk y ON x.bk = y.bk AND x.it < y.it
  GROUP BY 1, 2 HAVING count(*) >= 2),
esym AS MATERIALIZED (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
alive0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM esym)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
deg{r} AS MATERIALIZED (
  SELECT e.a AS node, CAST(count(*) AS BIGINT) AS core_deg
  FROM esym e
  JOIN alive{r - 1} x ON e.a = x.node
  JOIN alive{r - 1} y ON e.b = y.node
  GROUP BY 1),
alive{r} AS MATERIALIZED (SELECT node FROM deg{r} WHERE core_deg >= {k})"""
        )
    parts.append(
        f"""
SELECT node, core_deg FROM deg{rounds} WHERE core_deg >= {k} ORDER BY node"""
    )
    return "".join(parts)


def q_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over the embedding corpus
    (clustering.py::kcenter_greedy, k=8): farthest-point selection whose
    picked ids + coverage radii are exact integers — the diversify stage
    of dedup-then-diversify selection."""
    from ingestion_scripts_spark.operators.clustering import kcenter_greedy

    emb = _t(spark, sf_dir, "embeddings")
    return kcenter_greedy(emb, "embedding", "vec_id", k=8).orderBy("rank")


def _sql_kcenter_coreset(k: int = 8) -> str:
    """Unrolled Gonzalez greedy: c{r} = argmax over d{r-1}'s running
    min-distance, d{r} folds the new center in with least()."""
    d2 = (
        "(SELECT CAST(list_sum(list_transform(range(1, len(d.v) + 1),"
        " i -> (d.v[i] - c.v[i]) * (d.v[i] - c.v[i]))) AS BIGINT) FROM {src} c)"
    )
    parts = [
        """
WITH q AS MATERIALIZED (
  SELECT vec_id AS pid,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                                  AS BIGINT)) AS v
  FROM embeddings),
c1 AS MATERIALIZED (
  SELECT pid, v, CAST(0 AS BIGINT) AS dmin FROM q ORDER BY pid LIMIT 1),
d1 AS MATERIALIZED (
  SELECT d.pid, d.v, """
        + d2.format(src="c1")
        + """ AS dmin
  FROM q d)"""
    ]
    for r in range(2, k + 1):
        parts.append(
            f""",
c{r} AS MATERIALIZED (
  SELECT pid, v, dmin FROM d{r - 1} ORDER BY dmin DESC, pid ASC LIMIT 1),
d{r} AS MATERIALIZED (
  SELECT d.pid, d.v, least(d.dmin, {d2.format(src='c' + str(r))}) AS dmin
  FROM d{r - 1} d)"""
        )
    sel = [
        "SELECT CAST(1 AS BIGINT) AS rank, pid AS center_id,"
        " CAST(0 AS BIGINT) AS picked_dist_sq FROM c1"
    ]
    for r in range(2, k + 1):
        sel.append(
            f"SELECT CAST({r} AS BIGINT), pid, dmin FROM c{r}"
        )
    parts.append("\n" + "\nUNION ALL ".join(sel) + "\nORDER BY rank")
    return "".join(parts)


def q_avg_precision_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source average precision of document length predicting
    lang == 'en' (profiling.py::average_precision) — the PR-side
    companion to roc_auc_quality on the identical scored/labelled input,
    because curation gates live in the imbalanced-label regime where
    ROC-AUC saturates and AP does not."""
    from ingestion_scripts_spark.operators import profiling as PR

    docs = _t(spark, sf_dir, "documents")
    out = PR.average_precision(
        docs, "source", F.col("n_chars"), F.col("lang") == F.lit("en"), "doc_id"
    )
    return out.select(F.col("g").alias("source"), "n_pos", "n", "ap").orderBy(
        "source"
    )


SQL_AVG_PRECISION_QUALITY = """
WITH base AS (
  SELECT source AS g, CAST(n_chars AS BIGINT) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, doc_id AS id
  FROM documents),
ranked AS (
  SELECT g, y,
         CAST(row_number() OVER (PARTITION BY g ORDER BY s DESC, id ASC)
              AS BIGINT) AS i,
         CAST(sum(y) OVER (PARTITION BY g ORDER BY s DESC, id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_pos
  FROM base),
agg AS (
  SELECT g, CAST(sum(y) AS BIGINT) AS n_pos, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN y = 1 THEN (cum_pos * 1000000) // i ELSE 0 END)
              AS BIGINT) AS aps
  FROM ranked GROUP BY g)
SELECT g AS source, n_pos, n,
       CASE WHEN n_pos > 0 THEN floor(aps / n_pos + 0.5) / 1000000.0 END AS ap
FROM agg ORDER BY source
"""


def q_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of SQ8 scalar-quantized dot-product search vs the exact
    kernel, per query (similarity.py::sq8_quantize_recall) — measures
    what 4x index compression costs on the actual corpus."""
    from ingestion_scripts_spark.operators.similarity import sq8_quantize_recall

    emb = _t(spark, sf_dir, "embeddings")
    return sq8_quantize_recall(emb, "vec_id", "embedding", k=10, query_mod=50).orderBy(
        "query_id"
    )


SQL_SQ8_RECALL = """
WITH q AS MATERIALIZED (
  SELECT vec_id AS pid,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                                  AS BIGINT)) AS vm
  FROM embeddings),
ex AS MATERIALIZED (
  SELECT pid, i AS pos, vm[i] AS x
  FROM q, unnest(range(1, len(vm) + 1)) AS t(i)),
mm AS MATERIALIZED (
  SELECT pos, min(x) AS lo,
         CAST(greatest(max(x) - min(x), 1) AS BIGINT) AS rng
  FROM ex GROUP BY pos),
dq AS MATERIALIZED (
  SELECT e.pid, e.pos,
         mm.lo + ((((e.x - mm.lo) * 255) // mm.rng) * mm.rng) // 255 AS xq
  FROM ex e JOIN mm USING (pos)),
tdot AS MATERIALIZED (
  SELECT a.pid AS query_id, b.pid AS pid, CAST(sum(a.x * b.x) AS BIGINT) AS d
  FROM ex a JOIN ex b ON a.pos = b.pos AND b.pid <> a.pid
  WHERE a.pid % 50 = 0
  GROUP BY 1, 2),
truth AS MATERIALIZED (
  SELECT query_id, pid FROM (
    SELECT query_id, pid,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY d DESC, pid ASC) AS r
    FROM tdot) WHERE r <= 10),
qdot AS MATERIALIZED (
  SELECT a.pid AS query_id, b.pid AS pid,
         CAST(sum(a.xq * b.xq) AS BIGINT) AS d
  FROM dq a JOIN dq b ON a.pos = b.pos AND b.pid <> a.pid
  WHERE a.pid % 50 = 0
  GROUP BY 1, 2),
approx AS MATERIALIZED (
  SELECT query_id, pid FROM (
    SELECT query_id, pid,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY d DESC, pid ASC) AS r
    FROM qdot) WHERE r <= 10)
SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_truth,
       CAST(count(a.pid) AS BIGINT) AS n_hit,
       floor(count(a.pid) * 1000000.0 / count(*) + 0.5) / 1000000.0 AS recall
FROM truth t
LEFT JOIN approx a ON a.query_id = t.query_id AND a.pid = t.pid
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

_REGISTRY: list[tuple[str, Callable[[SparkSession, str], DataFrame], str | None]] = [
    # DECLARATION order (stable; roughly r5's layout). The driver-facing
    # order is produced by the _R6_WINDOW block shift after this list —
    # driver checks positions 1-50 of the SHIFTED order; ROADMAP.md has the
    # rotation schedule; the window is pinned by tests/test_entry_contract.py.
    ("textrank_summary", q_textrank_summary, _sql_textrank_summary()),
    ("sql_pipe_front_door", q_sql_pipe_front_door, SQL_PIPE_FRONT_DOOR),
    ("stream_state_reader", q_stream_state_reader, SQL_STREAM_DEDUP),
    ("edit_distance_names", q_edit_distance_names, SQL_EDIT_DISTANCE_NAMES),
    ("basket_pair_lift", q_basket_pair_lift, SQL_BASKET_PAIR_LIFT),
    ("triangle_cooccurrence", q_triangle_cooccurrence, SQL_TRIANGLE_COOCCURRENCE),
    ("token_kl_drift", q_token_kl_drift, SQL_TOKEN_KL_DRIFT),
    ("leakage_safe_split", q_leakage_safe_split, _sql_leakage_safe_split()),
    ("hybrid_rank_fusion", q_hybrid_rank_fusion, _sql_hybrid_rank_fusion()),
    ("output_file_plan", q_output_file_plan, SQL_OUTPUT_FILE_PLAN),
    ("mmr_diverse_topk", q_mmr_diverse_topk, _sql_mmr_diverse_topk()),
    ("k_anonymity_audit", q_k_anonymity_audit, SQL_K_ANONYMITY),
    ("jl_projection_recall", q_jl_projection_recall, _sql_jl_projection_recall()),
    ("holt_trend_forecast", q_holt_trend_forecast, _sql_holt_trend_forecast()),
    ("covariance_matrix", q_covariance_matrix, _sql_covariance_matrix()),
    ("dup_clusters_star", q_dup_clusters_star, SQL_DUP_CLUSTERS),
    ("containment_pairs", q_containment_pairs, SQL_CONTAINMENT_PAIRS),
    ("stream_scd_merge", q_stream_scd_merge, SQL_STREAM_SCD_MERGE),
    ("recursive_front_door", q_recursive_front_door, SQL_RECURSIVE_PORTABLE),
    ("duplicate_spans", q_duplicate_spans, SQL_DUPLICATE_SPANS),
    ("span_removal_plan", q_span_removal_plan, SQL_SPAN_REMOVAL_PLAN),
    ("pareto_frontier", q_pareto_frontier, SQL_PARETO_FRONTIER),
    ("ks_drift", q_ks_drift, SQL_KS_DRIFT),
    ("column_mutual_info", q_column_mutual_info, SQL_COLUMN_MUTUAL_INFO),
    ("incremental_agg_view", q_incremental_agg_view, SQL_INCREMENTAL_AGG_VIEW),
    ("snm_blocking", q_snm_blocking, SQL_SNM_BLOCKING),
    ("cusum_changepoint", q_cusum_changepoint, SQL_CUSUM_CHANGEPOINT),
    ("ht_sampling_error", q_ht_sampling_error, SQL_HT_SAMPLING_ERROR),
    ("stream_quota_admission", q_stream_quota_admission, SQL_STREAM_QUOTA),
    ("er_canonical_entities", q_er_canonical_entities, SQL_ER_CANONICAL),
    ("bfs_hops_coorder", q_bfs_hops_coorder, SQL_BFS_HOPS),
    ("psi_drift", q_psi_drift, SQL_PSI_DRIFT),
    ("chi2_independence", q_chi2_independence, SQL_CHI2_INDEPENDENCE),
    ("multimodal_audio_energy", q_multimodal_audio_energy, SQL_MULTIMODAL_AUDIO),
    ("bloom_dedup_audit", q_bloom_dedup_audit, SQL_BLOOM_DEDUP_AUDIT),
    ("label_spread_communities", q_label_spread_communities, SQL_LABEL_SPREAD),
    ("join_size_estimate", q_join_size_estimate, SQL_JOIN_SIZE_ESTIMATE),
    ("grouped_agg_udaf", q_grouped_agg_udaf, SQL_GROUPED_AGG_UDAF),
    ("arrow_group_stats", q_arrow_group_stats, SQL_ARROW_GROUP_STATS),
    ("roc_auc_quality", q_roc_auc_quality, SQL_ROC_AUC_QUALITY),
    ("bot_burst_users", q_bot_burst_users, SQL_BOT_BURST_USERS),
    ("index_compaction", q_index_compaction, SQL_INDEX_COMPACTION),
    ("temperature_mix", q_temperature_mix, SQL_TEMPERATURE_MIX),
    ("csv_source", q_csv_source, SQL_CSV_SOURCE),
    ("corrupt_record_routing", q_corrupt_record_routing, SQL_CORRUPT_ROUTING),
    ("hll_merge_rollup", q_hll_merge_rollup, _sql_hll_merge_rollup()),
    ("grouping_sets_revenue", q_grouping_sets_revenue, SQL_GROUPING_SETS),
    ("window_dist_funcs", q_window_dist_funcs, SQL_WINDOW_DIST),
    ("lang_histograms", q_lang_histograms, SQL_LANG_HIST),
    ("stats_corr", q_stats_corr, SQL_STATS_CORR),
    # --- queued for the r6 window: remaining never-driver-green (40) ---
    ("semdedup", q_semdedup, _sql_semdedup()),
    ("cms_heavy_hitters", q_cms_heavy_hitters, _sql_cms_heavy_hitters()),
    ("doc_chunks", q_doc_chunks, _SQL_DOC_CHUNKS.format(toks=O.sql_tokenize_ws("text"))),
    ("gopher_rules", q_gopher_rules, _sql_gopher_rules()),
    ("priority_sample", q_priority_sample, _sql_priority_sample()),
    ("domain_caps", q_domain_caps, _sql_domain_caps()),
    ("orc_source", q_orc_source, SQL_ORC_SOURCE),
    ("unigram_ppl", q_unigram_ppl, _sql_unigram_ppl()),
    ("bpe_merges", q_bpe_merges, _sql_bpe_merges()),
    ("bpe_tokenize", q_bpe_tokenize, _sql_bpe_tokenize()),
    ("ivf_trained_topk", q_ivf_trained_topk, _sql_ivf_trained()),
    ("hist_quantiles", q_hist_quantiles, _sql_hist_quantiles()),
    ("dataset_split", q_dataset_split, _sql_dataset_split()),
    ("char_entropy", q_char_entropy, SQL_CHAR_ENTROPY),
    ("min_price_supplier", q_min_price_supplier, SQL_MIN_PRICE_SUPPLIER),
    ("column_profile", q_column_profile, _sql_column_profile()),
    ("bigram_backoff_ppl", q_bigram_backoff_ppl, _sql_bigram_backoff()),
    ("ann_recall", q_ann_recall, _sql_ann_recall()),
    ("zorder_layout", q_zorder_layout, _sql_zorder_layout()),
    ("observed_ingest", q_observed_ingest, SQL_OBSERVED_INGEST),
    ("skew_report", q_skew_report, SQL_SKEW_REPORT),
    ("dataset_card", q_dataset_card, _sql_dataset_card()),
    ("session_funnel", q_session_funnel, SQL_SESSION_FUNNEL),
    ("langid_confusion", q_langid_confusion, _sql_langid_confusion()),
    ("cross_split_contamination", q_cross_split_contamination, _sql_cross_split_contamination()),
    ("first_touch_attribution", q_first_touch_attribution, SQL_FIRST_TOUCH),
    ("partitioned_sink", q_partitioned_sink, SQL_PARTITIONED_SINK),
    ("dedup_best_survivor", q_dedup_best_survivor, SQL_BEST_SURVIVOR),
    ("boilerplate_segments", q_boilerplate_segments, SQL_BOILERPLATE),
    ("daily_gapfill", q_daily_gapfill, SQL_DAILY_GAPFILL),
    ("interval_join_hot_hours", q_interval_join_hot_hours, SQL_INTERVAL_JOIN),
    ("bucketed_join_revenue", q_bucketed_join_revenue, SQL_BUCKETED_JOIN),
    ("winsorized_lengths", q_winsorized_lengths, SQL_WINSORIZED),
    ("snapshot_diff", q_snapshot_diff, SQL_SNAPSHOT_DIFF),
    ("weekly_growth", q_weekly_growth, SQL_WEEKLY_GROWTH),
    ("top_customer_by_nation", q_top_customer_by_nation, SQL_TOP_CUSTOMER),
    ("custom_feed_source", q_custom_feed_source, _sql_custom_feed()),
    ("stream_custom_source", q_stream_custom_source, _sql_stream_custom_feed()),
    ("dq_checks", q_dq_checks, SQL_DQ_CHECKS),
    ("sessionize_udtf", q_sessionize_udtf, SQL_SESSIONIZE),
    # --- added in r5 (never-green; window r6 per rotation rule) ---
    ("fellegi_sunter_scores", q_fellegi_sunter_scores, SQL_FELLEGI_SUNTER),
    ("cohens_kappa", q_cohens_kappa, _sql_cohens_kappa()),
    ("calibration_bins", q_calibration_bins, _sql_calibration_bins()),
    ("hits_scores", q_hits_scores, _sql_hits_scores()),
    ("kneser_ney_ppl", q_kneser_ney_ppl, _sql_kneser_ney_ppl()),
    ("dp_count_laplace", q_dp_count_laplace, _sql_dp_count_laplace()),
    ("rate_limit_replay", q_rate_limit_replay, RL_SQL_TOKEN_BUCKET),
    ("stream_token_bucket", q_stream_token_bucket, RL_SQL_TOKEN_BUCKET),
    # --- driver-green in r1-r4 (re-certified on the r6+ round-robin) ---
    ("variant_props", q_variant_props, SQL_VARIANT_PROPS),
    ("unpivot_part_metrics", q_unpivot_part_metrics, SQL_UNPIVOT_PART),
    ("event_transitions", q_event_transitions, SQL_EVENT_TRANSITIONS),
    ("safe_cast_ingest", q_safe_cast_ingest, SQL_SAFE_CAST),
    ("url_canonicalize", q_url_canonicalize, SQL_URL_CANON),
    ("ewma_user_value", q_ewma_user_value, SQL_EWMA),
    ("strip_accents_norm", q_strip_accents_norm, SQL_STRIP_ACCENTS),
    ("spearman_corr", q_spearman_corr, SQL_SPEARMAN),
    ("robust_zscore", q_robust_zscore, SQL_ROBUST_ZSCORE),
    ("hash_sample_per_key", q_hash_sample_per_key, SQL_HASH_SAMPLE),
    ("cube_revenue", q_cube_revenue, SQL_CUBE_REVENUE),
    ("setsim_join_pairs", q_setsim_join_pairs, SQL_SETSIM_JOIN),
    ("interval_join_bucketed", q_interval_join_bucketed, SQL_INTERVAL_JOIN),
    ("sparse_cosine_pairs", q_sparse_cosine_pairs, SQL_SPARSE_COSINE),
    ("sliding_windows", q_sliding_windows, SQL_SLIDING_WINDOWS),
    ("xml_source", q_xml_source, SQL_XML_SOURCE),
    ("supplier_wait_fault", q_supplier_wait_fault, SQL_SUPPLIER_WAIT),
    ("user_trend_slope", q_user_trend_slope, SQL_TREND_SLOPE),
    ("custom_feed_sink", q_custom_feed_sink, SQL_CUSTOM_FEED_SINK),
    ("set_ops_users", q_set_ops_users, SQL_SET_OPS),
    ("lateral_top_orders", q_lateral_top_orders, SQL_LATERAL_TOP),
    ("scd_point_in_time", q_scd_point_in_time, SQL_SCD_PIT),
    ("wap_publish", q_wap_publish, SQL_WAP_PUBLISH),
    ("score_quantile_norm", q_score_quantile_norm, SQL_QUANTILE_NORM),
    ("trigram_udtf_top", q_trigram_udtf_top, SQL_TRIGRAM_UDTF),
    ("schema_evolution", q_schema_evolution, SQL_SCHEMA_EVOLUTION),
    ("benford_profile", q_benford_profile, SQL_BENFORD),
    ("bm25_topk", q_bm25_topk, SQL_BM25_TOPK),
    ("phrase_search", q_phrase_search, SQL_PHRASE_SEARCH),
    ("token_budget_mix", q_token_budget_mix, SQL_TOKEN_BUDGET_MIX),
    ("pagerank_transitions", q_pagerank_transitions, SQL_PAGERANK),
    ("dedup_threshold_curve", q_dedup_threshold_curve, SQL_DEDUP_THRESHOLD_CURVE),
    ("incremental_near_dup", q_incremental_near_dup, SQL_INCREMENTAL_NEAR_DUP),
    ("embedding_profile", q_embedding_profile, SQL_EMBEDDING_PROFILE),
    ("dup_cluster_stats", q_dup_cluster_stats, SQL_DUP_CLUSTER_STATS),
    ("source_similarity", q_source_similarity, SQL_SOURCE_SIMILARITY),
    ("dedup_recall", q_dedup_recall, SQL_DEDUP_RECALL),
    ("stream_incremental_dedup", q_stream_incremental_dedup, SQL_STREAM_INCREMENTAL_DEDUP),
    ("tokenizer_fertility", q_tokenizer_fertility, SQL_TOKENIZER_FERTILITY),
    ("stratified_split", q_stratified_split, SQL_STRATIFIED_SPLIT),
    ("heavy_hitter_recall", q_heavy_hitter_recall, _sql_heavy_hitter_recall()),
    ("path_motifs", q_path_motifs, SQL_PATH_MOTIFS),
    ("sql_front_door", q_sql_front_door, SQL_PORTABLE),
    ("linear_interpolation", q_linear_interpolation, SQL_LINEAR_INTERPOLATION),
    ("bloom_join_revenue", q_bloom_join_revenue, SQL_BLOOM_JOIN),
    ("multimodal_resize", q_multimodal_resize, SQL_MULTIMODAL_RESIZE),
    ("last_touch_attribution", q_last_touch_attribution, SQL_LAST_TOUCH),
    ("embedding_outliers", q_embedding_outliers, SQL_EMBEDDING_OUTLIERS),
    ("ngram_novelty", q_ngram_novelty, SQL_NGRAM_NOVELTY),
    ("rfm_segments", q_rfm_segments, SQL_RFM_SEGMENTS),
    ("rss_pipeline", q_rss_pipeline, SQL_RSS_PIPELINE),
    ("reddit_pipeline", q_reddit_pipeline, SQL_REDDIT_PIPELINE),
    ("twitter_pipeline", q_twitter_pipeline, SQL_TWITTER_PIPELINE),
    ("sentiment", q_sentiment, SQL_SENTIMENT),
    ("sessionize", q_sessionize, SQL_SESSIONIZE),
    ("session_window_native", q_session_window_native, SQL_SESSION_WINDOW),
    ("session_window_dynamic", q_session_window_dynamic, SQL_SESSION_DYNAMIC),
    ("multimodal_meta", q_multimodal_meta, SQL_MULTIMODAL),
    ("multimodal_features", q_multimodal_features, SQL_MULTIMODAL_FEATURES),
    ("multimodal_frames", q_multimodal_frames, SQL_MULTIMODAL_FRAMES),
    ("stream_idempotent_sink", q_stream_idempotent_sink, SQL_STREAM_IDEMPOTENT),
    ("stream_stateful_counts", q_stream_stateful_counts, SQL_STREAM_STATEFUL),
    ("stream_dedup_counts", q_stream_dedup_counts, SQL_STREAM_DEDUP),
    ("stream_enriched_counts", q_stream_enriched_counts, SQL_STREAM_ENRICHED),
    ("stream_late_drop", q_stream_late_drop, SQL_STREAM_LATE_DROP),
    ("stream_stream_join", q_stream_stream_join, SQL_STREAM_STREAM_JOIN),
    ("stream_outer_join", q_stream_outer_join, SQL_STREAM_OUTER_JOIN),
    ("stream_wm_dedup", q_stream_wm_dedup, SQL_STREAM_IDEMPOTENT),
    ("stream_fanout_sinks", q_stream_fanout_sinks, SQL_STREAM_FANOUT),
    ("bloom_gate", q_bloom_gate, _sql_bloom_gate()),
    ("curation_pipeline", q_curation_pipeline, SQL_CURATION),
    ("curation_to_sequences", q_curation_to_sequences, SQL_CURATION_SEQ),
    ("props_extract", q_props_extract, SQL_PROPS_EXTRACT),
    ("idle_rich_customers", q_idle_rich_customers, SQL_IDLE_RICH),
    ("cumulative_users", q_cumulative_users, SQL_CUMULATIVE_USERS),
    ("rolling_7d_value", q_rolling_7d_value, SQL_ROLLING_7D),
    ("incremental_ingest", q_incremental_ingest, SQL_INCREMENTAL_INGEST),
    ("tfidf_top_terms", q_tfidf_top_terms, SQL_TFIDF),
    ("dup_clusters", q_dup_clusters, SQL_DUP_CLUSTERS),
    ("hll_distinct_users", q_hll_distinct_users, _sql_hll()),
    ("repetition_signals", q_repetition_signals, SQL_REPETITION),
    ("pii_scrub", q_pii_scrub, SQL_PII_SCRUB),
    ("contamination", q_contamination, SQL_CONTAMINATION),
    ("stratified_sample", q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    ("simhash_near_dups", q_simhash_near_dups, _sql_simhash_pairs()),
    ("sequence_packing", q_sequence_packing, SQL_SEQUENCE_PACKING),
    ("kmeans_clusters", q_kmeans_clusters, _sql_kmeans_clusters()),
    ("kmeans_sample", q_kmeans_sample, _sql_kmeans_sample()),
    ("importance_weights", q_importance_weights, SQL_IMPORTANCE),
    ("pmi_bigrams", q_pmi_bigrams, SQL_PMI),
    ("nation_profit", q_nation_profit, SQL_NATION_PROFIT),
    ("scd_upsert", q_scd_upsert, SQL_SCD_UPSERT),
    ("dup_span_fraction", q_dup_span_fraction, SQL_DUP_SPAN),
    ("jsonl_source", q_jsonl_source, SQL_JSONL_SOURCE),
    ("anomaly_zscore", q_anomaly_zscore, SQL_ANOMALY),
    ("retention_cohorts", q_retention_cohorts, SQL_RETENTION),
    ("flagship_doc_keywords", q_flagship_doc_keywords, SQL_FLAGSHIP),
    ("pricing_summary", q_pricing_summary, SQL_PRICING),
    ("minhash_near_dups", q_minhash_near_dups, SQL_MINHASH),
    ("embedding_near_dup", q_embedding_near_dup, SQL_EMBEDDING_NEAR_DUP),
    ("top_orders", q_top_orders, SQL_TOP_ORDERS),
    ("region_revenue", q_region_revenue, SQL_REGION_REVENUE),
    ("antijoin_new_users", q_antijoin_new_users, SQL_ANTIJOIN),
    ("dead_letter_routing", q_dead_letter_routing, SQL_DEAD_LETTER),
    ("semi_join_urgent", q_semi_join_urgent, SQL_SEMI_JOIN),
    ("cust_order_dist", q_cust_order_dist, SQL_CUST_ORDER_DIST),
    ("rollup_revenue", q_rollup_revenue, SQL_ROLLUP),
    ("distinct_users", q_distinct_users, SQL_DISTINCT_USERS),
    ("asof_clicks", q_asof_clicks, SQL_ASOF),
    ("purchase_error_funnel", q_purchase_error_funnel, SQL_FUNNEL),
    ("small_quantity_revenue", q_small_quantity_revenue, SQL_SMALL_QTY),
    ("in_subquery_parts", q_in_subquery_parts, SQL_IN_SUBQUERY),
    ("value_percentiles", q_value_percentiles, SQL_PERCENTILES),
    ("pivot_weekday", q_pivot_weekday, SQL_PIVOT),
    ("running_user_value", q_running_user_value, SQL_RUNNING),
    ("clicked_never_purchased", q_clicked_never_purchased, SQL_EXCEPT),
    ("late_ship_priority", q_late_ship_priority, SQL_LATE_SHIP),
    ("parts_never_discounted", q_parts_never_discounted, SQL_PARTS_NEVER_DISC),
    ("user_value_quartiles", q_user_value_quartiles, SQL_USER_QUARTILES),
    ("clean_text", q_clean_text, SQL_CLEAN),
    ("hashtags", q_hashtags, SQL_HASHTAGS),
    ("stopword_filter", q_stopword_filter, SQL_STOPWORD),
    ("bigram_pairs", q_bigram_pairs, SQL_BIGRAM_PAIRS),
    ("parse_rfc822", q_parse_rfc822, SQL_PARSE_RFC822),
    ("parse_struct_time", q_parse_struct_time, SQL_PARSE_STRUCT_TIME),
    ("parse_simple", q_parse_simple, SQL_PARSE_SIMPLE),
    ("parse_zoned", q_parse_zoned, SQL_PARSE_ZONED),
    ("exact_dedup", q_exact_dedup, SQL_EXACT_DEDUP),
    ("segment_dedup", q_segment_dedup, SQL_SEGMENT_DEDUP),
    ("ngram_jaccard", q_ngram_jaccard, SQL_NGRAM_JACCARD),
    ("simhash", q_simhash, SQL_SIMHASH),
    ("fingerprint", q_fingerprint, SQL_FINGERPRINT),
    ("winnow_fingerprints", q_winnow_fingerprints, SQL_WINNOW),
    ("salted_distinct_users", q_salted_distinct_users, SQL_SALTED_DISTINCT),
    ("skew_join_revenue", q_skew_join_revenue, SQL_SKEW_JOIN),
    ("embedding_topk", q_embedding_topk, SQL_EMBEDDING_TOPK),
    ("lsh_ann_topk", q_lsh_ann_topk, _sql_lsh_ann()),
    ("ivf_ann_topk", q_ivf_ann_topk, _sql_ivf_ann()),
    ("ivf_ann_topk_mp", q_ivf_ann_topk_mp, _sql_ivf_ann_mp()),
    ("embedding_near_dup_fold", q_embedding_near_dup_fold, SQL_EMBEDDING_NEAR_DUP),
    ("lang_id", q_lang_id, SQL_LANG_ID),
    ("quality_score", q_quality, SQL_QUALITY),
    ("quality_gate", q_quality_gate, SQL_QUALITY_GATE),
    ("vocab_topn", q_vocab_topn, SQL_VOCAB),
    ("token_counts", q_token_counts, SQL_TOKEN_COUNTS),
    ("hourly_windows", q_hourly_windows, SQL_HOURLY),
    ("stream_hourly_windows", q_stream_hourly_windows, SQL_STREAM_HOURLY),
    ("stream_sessionize", q_stream_sessionize, SQL_STREAM_SESSIONIZE),
    # --- r6 batch 2 additions ---
    ("kcore_parts", q_kcore_parts, _sql_kcore_parts()),
    ("kcenter_coreset", q_kcenter_coreset, _sql_kcenter_coreset()),
    ("avg_precision_quality", q_avg_precision_quality, SQL_AVG_PRECISION_QUALITY),
    ("sq8_recall", q_sq8_recall, SQL_SQ8_RECALL),
]

# --- r6 driver-window rotation (ROADMAP.md rotation table) -----------------
# The driver certifies positions 1-50 each round. r6 window = the FINAL 48
# never-driver-green queries (the 40 queued at r5 positions 51-90 plus the 8
# r5-session additions) + 2 oldest-certified r1 anchors, which starts the
# steady-state round-robin re-validation the ROADMAP plans for r7+. Expressed
# as an explicit block shift over the declaration order above so the
# declaration text stays stable; tests/test_entry_contract.py pins the
# resulting window verbatim.
_R6_WINDOW = [
    "semdedup", "cms_heavy_hitters", "doc_chunks", "gopher_rules",
    "priority_sample", "domain_caps", "orc_source", "unigram_ppl",
    "bpe_merges", "bpe_tokenize", "ivf_trained_topk", "hist_quantiles",
    "dataset_split", "char_entropy", "min_price_supplier", "column_profile",
    "bigram_backoff_ppl", "ann_recall", "zorder_layout", "observed_ingest",
    "skew_report", "dataset_card", "session_funnel", "langid_confusion",
    "cross_split_contamination", "first_touch_attribution",
    "partitioned_sink", "dedup_best_survivor", "boilerplate_segments",
    "daily_gapfill", "interval_join_hot_hours", "bucketed_join_revenue",
    "winsorized_lengths", "snapshot_diff", "weekly_growth",
    "top_customer_by_nation", "custom_feed_source", "stream_custom_source",
    "dq_checks", "sessionize_udtf", "fellegi_sunter_scores", "cohens_kappa",
    "calibration_bins", "hits_scores", "kneser_ney_ppl", "dp_count_laplace",
    "rate_limit_replay", "stream_token_bucket",
    # r6-session additions (never-green debt outranks re-certification
    # anchors while any exists — the rotation law in
    # tests/test_entry_contract.py): two in the window, two queued next
    "kcore_parts", "kcenter_coreset",
]
#: never-driver-green overflow, queued contiguously at positions 51-52 so
#: the r7 rotation is a pure block shift
_R6_QUEUE = ["avg_precision_quality", "sq8_recall"]
_BY_NAME = {t[0]: t for t in _REGISTRY}
_REGISTRY = (
    [_BY_NAME[n] for n in _R6_WINDOW]
    + [_BY_NAME[n] for n in _R6_QUEUE]
    + [t for t in _REGISTRY if t[0] not in set(_R6_WINDOW) | set(_R6_QUEUE)]
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, fn, _ in _REGISTRY}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, _, sql in _REGISTRY if sql is not None}
