"""Registry implementation, part 06 of 6 — a mechanical,
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

from ingestion_scripts_spark.registry.part05 import *  # noqa: F401,F403



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
    src = _scratch(prefix="quota_src_")
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
    # state partitions sized to the stream's input bytes, not the core
    # count (optimization r15, guide §2.2 — see stream_state_partitions).
    # This IS Python-stateful (applyInPandasWithState), but keyed by
    # SOURCE — a schema-bounded handful of groups at any corpus scale —
    # so per-trigger store commits dominate per-group Python work
    # (measured 4.2 s → 1.7 s; contrast the user-keyed token_bucket/
    # stateful_counts streams, which stay core-parallel)
    from ingestion_scripts_spark.streaming.streams import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, src)
    ):
        q = (
            admitted.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", _scratch(prefix="ckpt_"))
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
    # corpus totals via 1-row aggregate + broadcast, NOT a constant-key
    # window: partitionBy(lit(1)) folds to an unpartitioned window and
    # plans Exchange SinglePartition over every document — the
    # decile_lift scale-killer class, caught by the r9 plan-audit gate
    scored = persist_tracked(scored)  # consumed twice: totals + rows
    tot = scored.agg(
        F.sum("dropped").cast("bigint").alias("n_dropped"),
        F.sum("false_positive").cast("bigint").alias("n_false_positives"),
    )
    return (
        scored.select("doc_id", "dropped", "is_dup", "false_positive")
        .crossJoin(F.broadcast(tot))
        .orderBy("doc_id")
    )


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
    # seeds are consumed 3x per spread round (vote join, clamp anti-join,
    # clamp union) — persisted so the distinct-over-edges shuffle runs
    # once, and each spread round's vote-join + window-argmax lineage is
    # similarly pinned below instead of re-expanding at every reference
    # (r14, guide §1.2/§2.4)
    seeds = persist_tracked(
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
    labels = spread(persist_tracked(spread(seeds)))
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
    src = _scratch(prefix="tb_src_")
    ckpt = _scratch(prefix="ckpt_")
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
        # deliberately NOT byte-scoped (optimization r15): this stream is
        # applyInPandasWithState over ~|users| groups — per-group Python
        # overhead dominates, so parallelism must track CORES, not input
        # bytes (measured: partitions 32→1 took 5.2 s → 8.3 s while the
        # JVM-stateful streams all improved; guide §4 boundary cost)
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
    law test pins that 12 rounds IS the fixpoint at the oracle scales:
    measured peel depth is 8 at sf0.001 and 10 at sf0.01 — the toy-graph
    intuition "peel depth is small" survived contact with data, but the
    first guess of 6 rounds did NOT, which only the rounds-vs-rounds+2
    count comparison caught; both engines unroll the same 12)."""
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
    return G.kcore_peel(edges, "a", "b", k=3, rounds=12).orderBy("node")


def _sql_kcore_parts(k: int = 3, rounds: int = 12) -> str:
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
    'q_session_window_native',
    'SQL_SESSION_WINDOW',
    'q_session_window_dynamic',
    'SQL_SESSION_DYNAMIC',
    'q_semdedup',
    '_sql_semdedup',
    'q_cms_heavy_hitters',
    '_sql_cms_heavy_hitters',
    'q_doc_chunks',
    '_SQL_DOC_CHUNKS',
    'q_gopher_rules',
    '_sql_gopher_rules',
    'q_priority_sample',
    '_sql_priority_sample',
    'q_domain_caps',
    '_sql_domain_caps',
    'q_stream_stateful_counts',
    'SQL_STREAM_STATEFUL',
    'q_stream_wm_dedup',
    'q_cumulative_users',
    'SQL_CUMULATIVE_USERS',
    'q_first_touch_attribution',
    'SQL_FIRST_TOUCH',
    'q_session_funnel',
    'SQL_SESSION_FUNNEL',
    'q_stream_idempotent_sink',
    'SQL_STREAM_IDEMPOTENT',
    'q_stream_fanout_sinks',
    'SQL_STREAM_FANOUT',
    'q_bloom_gate',
    '_sql_bloom_gate',
    'q_idle_rich_customers',
    'SQL_IDLE_RICH',
    '_PROFILE_COLS',
    'q_column_profile',
    '_sql_column_profile',
    'q_min_price_supplier',
    'SQL_MIN_PRICE_SUPPLIER',
    'q_char_entropy',
    'SQL_CHAR_ENTROPY',
    '_PPL_V',
    'q_unigram_ppl',
    '_sql_unigram_ppl',
    '_HQ_BINS',
    '_HQ_PS',
    'q_hist_quantiles',
    '_sql_hist_quantiles',
    'q_dataset_split',
    '_sql_dataset_split',
    'q_rolling_7d_value',
    'SQL_ROLLING_7D',
    'q_partitioned_sink',
    'SQL_PARTITIONED_SINK',
    'q_bigram_backoff_ppl',
    '_sql_bigram_backoff',
    'q_bpe_merges',
    '_sql_bpe_merges',
    'q_bpe_tokenize',
    '_sql_bpe_tokenize',
    'q_orc_source',
    'SQL_ORC_SOURCE',
    'q_dedup_best_survivor',
    'SQL_BEST_SURVIVOR',
    'q_boilerplate_segments',
    'SQL_BOILERPLATE',
    'q_daily_gapfill',
    'SQL_DAILY_GAPFILL',
    'q_interval_join_hot_hours',
    'SQL_INTERVAL_JOIN',
    'q_bucketed_join_revenue',
    'SQL_BUCKETED_JOIN',
    'q_winsorized_lengths',
    'SQL_WINSORIZED',
    'q_snapshot_diff',
    'SQL_SNAPSHOT_DIFF',
    'q_weekly_growth',
    'SQL_WEEKLY_GROWTH',
    'q_top_customer_by_nation',
    'SQL_TOP_CUSTOMER',
    'q_custom_feed_source',
    '_sql_custom_feed',
    'q_stream_custom_source',
    '_sql_stream_custom_feed',
    'q_dq_checks',
    'SQL_DQ_CHECKS',
    'q_sessionize_udtf',
    'q_variant_props',
    'SQL_VARIANT_PROPS',
    'q_unpivot_part_metrics',
    'SQL_UNPIVOT_PART',
    'q_event_transitions',
    'SQL_EVENT_TRANSITIONS',
    'q_safe_cast_ingest',
    'SQL_SAFE_CAST',
    'q_url_canonicalize',
    'SQL_URL_CANON',
    'q_ewma_user_value',
    'SQL_EWMA',
    'q_strip_accents_norm',
    'SQL_STRIP_ACCENTS',
    'q_spearman_corr',
    'SQL_SPEARMAN',
    'q_robust_zscore',
    'SQL_ROBUST_ZSCORE',
    'q_hash_sample_per_key',
    'SQL_HASH_SAMPLE',
    'q_cube_revenue',
    'SQL_CUBE_REVENUE',
    'q_setsim_join_pairs',
    'SQL_SETSIM_JOIN',
    'q_interval_join_bucketed',
    'q_sparse_cosine_pairs',
    'SQL_SPARSE_COSINE',
    'q_sliding_windows',
    'SQL_SLIDING_WINDOWS',
    'q_xml_source',
    'SQL_XML_SOURCE',
    'q_supplier_wait_fault',
    'SQL_SUPPLIER_WAIT',
    'q_user_trend_slope',
    'SQL_TREND_SLOPE',
    'q_custom_feed_sink',
    'SQL_CUSTOM_FEED_SINK',
    'q_set_ops_users',
    'SQL_SET_OPS',
    'q_lateral_top_orders',
    'SQL_LATERAL_TOP',
    'q_scd_point_in_time',
    'SQL_SCD_PIT',
    'q_wap_publish',
    'SQL_WAP_PUBLISH',
    'q_score_quantile_norm',
    'SQL_QUANTILE_NORM',
    'q_trigram_udtf_top',
    'SQL_TRIGRAM_UDTF',
    'q_schema_evolution',
    'SQL_SCHEMA_EVOLUTION',
    'q_benford_profile',
    'SQL_BENFORD',
    'q_bm25_topk',
    'SQL_BM25_TOPK',
    'q_phrase_search',
    'SQL_PHRASE_SEARCH',
    '_TOKEN_BUDGETS',
    '_TOKEN_BUDGET_DEFAULT',
    'q_token_budget_mix',
    '_TOKEN_BUDGET_CASE',
    'SQL_TOKEN_BUDGET_MIX',
    'q_pagerank_transitions',
    '_pagerank_sql',
    'SQL_PAGERANK',
    'q_dedup_threshold_curve',
    'SQL_DEDUP_THRESHOLD_CURVE',
    'q_incremental_near_dup',
    'SQL_INCREMENTAL_NEAR_DUP',
    'q_embedding_profile',
    'SQL_EMBEDDING_PROFILE',
    'q_dup_cluster_stats',
    'SQL_DUP_CLUSTER_STATS',
    'q_source_similarity',
    '_CW_H1',
    '_CW_H2',
    'SQL_SOURCE_SIMILARITY',
    'q_dedup_recall',
    'SQL_DEDUP_RECALL',
    'q_stream_incremental_dedup',
    'SQL_STREAM_INCREMENTAL_DEDUP',
    'q_tokenizer_fertility',
    'SQL_TOKENIZER_FERTILITY',
    'q_stratified_split',
    'SQL_STRATIFIED_SPLIT',
    'q_heavy_hitter_recall',
    '_sql_heavy_hitter_recall',
    'q_path_motifs',
    'SQL_PATH_MOTIFS',
    'SQL_PORTABLE',
    'q_sql_front_door',
    'q_linear_interpolation',
    'SQL_LINEAR_INTERPOLATION',
    'q_bloom_join_revenue',
    'SQL_BLOOM_JOIN',
    'q_multimodal_resize',
    'SQL_MULTIMODAL_RESIZE',
    'q_last_touch_attribution',
    'SQL_LAST_TOUCH',
    'q_embedding_outliers',
    'SQL_EMBEDDING_OUTLIERS',
    'q_ngram_novelty',
    'SQL_NGRAM_NOVELTY',
    'q_rfm_segments',
    'SQL_RFM_SEGMENTS',
    'q_textrank_summary',
    '_sql_textrank_summary',
    'SQL_PIPE_LITERAL',
    'SQL_PIPE_FRONT_DOOR',
    'q_sql_pipe_front_door',
    'q_stream_state_reader',
    'q_edit_distance_names',
    'SQL_EDIT_DISTANCE_NAMES',
    'q_basket_pair_lift',
    'SQL_BASKET_PAIR_LIFT',
    'q_triangle_cooccurrence',
    'SQL_TRIANGLE_COOCCURRENCE',
    'q_token_kl_drift',
    'SQL_TOKEN_KL_DRIFT',
    'q_leakage_safe_split',
    '_sql_leakage_safe_split',
    'q_hybrid_rank_fusion',
    '_sql_hybrid_rank_fusion',
    'q_output_file_plan',
    'SQL_OUTPUT_FILE_PLAN',
    'q_mmr_diverse_topk',
    '_sql_mmr_diverse_topk',
    'q_k_anonymity_audit',
    'SQL_K_ANONYMITY',
    '_JL_PLANES',
    'q_jl_projection_recall',
    '_sql_jl_projection_recall',
    'q_holt_trend_forecast',
    '_sql_holt_trend_forecast',
    '_COV_METRICS',
    'q_covariance_matrix',
    '_sql_covariance_matrix',
    'q_dup_clusters_star',
    'q_containment_pairs',
    'SQL_CONTAINMENT_PAIRS',
    'q_stream_scd_merge',
    'SQL_STREAM_SCD_MERGE',
    'SQL_RECURSIVE_PORTABLE',
    'q_recursive_front_door',
    '_SPAN_TOKS_SQL',
    '_SPAN_OCC_SQL',
    'q_duplicate_spans',
    'SQL_DUPLICATE_SPANS',
    'q_span_removal_plan',
    'SQL_SPAN_REMOVAL_PLAN',
    'q_pareto_frontier',
    'SQL_PARETO_FRONTIER',
    'q_ks_drift',
    'SQL_KS_DRIFT',
    'q_column_mutual_info',
    'SQL_COLUMN_MUTUAL_INFO',
    'q_incremental_agg_view',
    'SQL_INCREMENTAL_AGG_VIEW',
    'q_snm_blocking',
    'SQL_SNM_BLOCKING',
    'q_cusum_changepoint',
    'SQL_CUSUM_CHANGEPOINT',
    'q_ht_sampling_error',
    'SQL_HT_SAMPLING_ERROR',
    'q_stream_quota_admission',
    'SQL_STREAM_QUOTA',
    'q_er_canonical_entities',
    'SQL_ER_CANONICAL',
    'q_bfs_hops_coorder',
    'SQL_BFS_HOPS',
    'q_psi_drift',
    'SQL_PSI_DRIFT',
    'q_chi2_independence',
    'SQL_CHI2_INDEPENDENCE',
    'q_multimodal_audio_energy',
    'SQL_MULTIMODAL_AUDIO',
    'q_bloom_dedup_audit',
    'SQL_BLOOM_DEDUP_AUDIT',
    'q_label_spread_communities',
    'SQL_LABEL_SPREAD',
    'q_join_size_estimate',
    'SQL_JOIN_SIZE_ESTIMATE',
    'q_grouped_agg_udaf',
    'SQL_GROUPED_AGG_UDAF',
    'q_arrow_group_stats',
    'SQL_ARROW_GROUP_STATS',
    'q_roc_auc_quality',
    'SQL_ROC_AUC_QUALITY',
    'q_bot_burst_users',
    'SQL_BOT_BURST_USERS',
    'q_index_compaction',
    'SQL_INDEX_COMPACTION',
    'q_fellegi_sunter_scores',
    'SQL_FELLEGI_SUNTER',
    'q_cohens_kappa',
    '_sql_cohens_kappa',
    'q_calibration_bins',
    '_sql_calibration_bins',
    'q_hits_scores',
    '_sql_hits_scores',
    'q_kneser_ney_ppl',
    '_sql_kneser_ney_ppl',
    'q_dp_count_laplace',
    '_sql_dp_count_laplace',
    'q_rate_limit_replay',
    'q_stream_token_bucket',
    '_sql_tb',
    'RL_SQL_TOKEN_BUCKET',
    'q_kcore_parts',
    '_sql_kcore_parts',
    'q_kcenter_coreset',
    '_sql_kcenter_coreset',
    'q_avg_precision_quality',
    'SQL_AVG_PRECISION_QUALITY',
    'q_sq8_recall',
    'SQL_SQ8_RECALL',
]
