"""Registry implementation, part 07 — r6 batch-4 additions (nDCG@k and
Zipf-slope corpus health), chained after the mechanical part01-06 split.
New parts extend the chain: explicit head imports, ``import *`` from the
previous part, and a cumulative ``__all__`` so the front door's single
``import *`` sees everything."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ingestion_scripts_spark import oracle as O
from ingestion_scripts_spark.functions import text as X
from ingestion_scripts_spark.operators import text_analysis as TA
from ingestion_scripts_spark.registry import part06 as _prev
from ingestion_scripts_spark.registry.part06 import *  # noqa: F401,F403


def q_ndcg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source nDCG@10 (profiling.py::ndcg_at_k) of document length
    ranking GRADED language relevance (en=3, de/fr=2, es=1, zh=0) — the
    graded, position-discounted leg of the ranking-eval family
    (roc_auc_quality: balanced binary; avg_precision_quality: imbalanced
    binary). Discounts are a frozen integer table so neither engine
    evaluates log2 at query time."""
    from ingestion_scripts_spark.operators import profiling as PR

    docs = _t(spark, sf_dir, "documents")
    rel = (
        F.when(F.col("lang") == "en", 3)
        .when(F.col("lang").isin("de", "fr"), 2)
        .when(F.col("lang") == "es", 1)
        .otherwise(0)
    )
    out = PR.ndcg_at_k(docs, "source", F.col("n_chars"), rel, "doc_id", k=10)
    return out.select(
        F.col("g").alias("source"), "dcg_micro", "idcg_micro", "ndcg"
    ).orderBy("source")


def _sql_ndcg_quality(k: int = 10) -> str:
    from ingestion_scripts_spark.operators.profiling import ndcg_discounts_micro

    disc = ndcg_discounts_micro(k)
    case = "CASE {rank} " + " ".join(
        f"WHEN {i + 1} THEN {d}" for i, d in enumerate(disc)
    ) + " ELSE 0 END"
    return f"""
WITH base AS (
  SELECT source AS g,
         CAST(n_chars AS BIGINT) AS s,
         CAST(CASE lang WHEN 'en' THEN 3 WHEN 'de' THEN 2 WHEN 'fr' THEN 2
                        WHEN 'es' THEN 1 ELSE 0 END AS BIGINT) AS rel,
         doc_id AS id
  FROM documents),
ranked AS (
  SELECT g, rel,
         row_number() OVER (PARTITION BY g ORDER BY s DESC, id ASC) AS ip,
         row_number() OVER (PARTITION BY g ORDER BY rel DESC, id ASC) AS ii
  FROM base),
agg AS (
  SELECT g,
         CAST(sum(CASE WHEN ip <= {k}
                       THEN rel * ({case.format(rank='ip')}) ELSE 0 END)
              AS BIGINT) AS dcg_micro,
         CAST(sum(CASE WHEN ii <= {k}
                       THEN rel * ({case.format(rank='ii')}) ELSE 0 END)
              AS BIGINT) AS idcg_micro
  FROM ranked GROUP BY g)
SELECT g AS source, dcg_micro, idcg_micro,
       CASE WHEN idcg_micro > 0
            THEN floor(dcg_micro * 1000000.0 / idcg_micro + 0.5) / 1000000.0
       END AS ndcg
FROM agg ORDER BY source
"""


def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf-law fit (text_analysis.py::zipf_slope): OLS slope
    of ln(freq) on ln(rank) over the top-200 RAW tokens (stopwords stay
    in — they ARE the Zipf head). Natural text sits near -1; template
    spam flattens toward 0; the log points are micro-snapped so the OLS
    sums are exact integers (partition-order independent)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source", X.tokenize_ws(X.clean_text(F.col("text"))).alias("t")
    )
    out = TA.zipf_slope(toks, "source", "t", top_n=200)
    return out.select(F.col("g").alias("source"), "n_points", "slope").orderBy(
        "source"
    )


def _sql_zipf_slope(top_n: int = 200) -> str:
    toks = O.sql_tokenize_ws(O.sql_clean_text("text"))
    return f"""
WITH toks AS (SELECT source AS g, unnest({toks}) AS t FROM documents),
tf AS (SELECT g, t, count(*) AS c FROM toks GROUP BY 1, 2),
pts AS (
  SELECT g,
         CAST(floor(ln(rnk::DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(c::DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS y
  FROM (SELECT g, c,
               row_number() OVER (PARTITION BY g ORDER BY c DESC, t ASC) AS rnk
        FROM tf)
  WHERE rnk <= {top_n}),
agg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM pts GROUP BY g)
SELECT g AS source, n AS n_points,
       CASE WHEN n >= 3 AND (n * sxx - sx * sx) <> 0
            THEN floor((n * sxy - sx * sy) / (n * sxx - sx * sx)
                       * 10000.0 + 0.5) / 10000.0
       END AS slope
FROM agg ORDER BY source
"""


__all__ = list(_prev.__all__) + [
    "q_ndcg_quality",
    "_sql_ndcg_quality",
    "q_zipf_slope",
    "_sql_zipf_slope",
]


def q_max_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy max-coverage selection of 5 documents by vocabulary gain
    (text_analysis.py::max_coverage_select) — the set-cover diversifier:
    submodular greedy, gains non-increasing, 1-1/e of optimal."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", X.tokenize_ws(X.clean_text(F.col("text"))).alias("t")
    )
    return TA.max_coverage_select(toks, "doc_id", "t", k=5).orderBy("rank")


def _sql_max_coverage(k: int = 5) -> str:
    toks = O.sql_tokenize_ws(O.sql_clean_text("text"))
    parts = [
        f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, list_distinct({toks}) AS t FROM documents),
c1 AS MATERIALIZED (
  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS gain
  FROM d ORDER BY len(t) DESC, doc_id ASC LIMIT 1),
cov1 AS MATERIALIZED (SELECT list_distinct(t) AS cov FROM c1)"""
    ]
    for r in range(2, k + 1):
        prev_ids = " UNION ALL ".join(
            f"SELECT doc_id FROM c{i}" for i in range(1, r)
        )
        parts.append(
            f""",
c{r} AS MATERIALIZED (
  SELECT d.doc_id, d.t,
         CAST(len(list_filter(d.t,
              x -> NOT list_contains(cov.cov, x))) AS BIGINT) AS gain
  FROM d, cov{r - 1} cov
  WHERE d.doc_id NOT IN ({prev_ids})
  ORDER BY gain DESC, d.doc_id ASC LIMIT 1),
cov{r} AS MATERIALIZED (
  SELECT list_distinct((SELECT cov FROM cov{r - 1}) || (SELECT t FROM c{r}))
    AS cov)"""
        )
    sel = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, doc_id, gain FROM c{r}"
        for r in range(1, k + 1)
    )
    parts.append(f"\n{sel}\nORDER BY rank")
    return "".join(parts)


def q_source_unique_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out vocabulary attribution per source
    (text_analysis.py::source_unique_vocab): the fraction of each
    source's vocabulary that exists nowhere else — the cheap
    data-valuation signal for source weighting."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source", X.tokenize_ws(X.clean_text(F.col("text"))).alias("t")
    )
    out = TA.source_unique_vocab(toks, "source", "t")
    return out.select(
        F.col("g").alias("source"), "vocab", "unique_vocab", "unique_ratio"
    ).orderBy("source")


def _sql_source_unique_vocab() -> str:
    toks = O.sql_tokenize_ws(O.sql_clean_text("text"))
    return f"""
WITH ts AS (
  SELECT DISTINCT g, t FROM (
    SELECT source AS g, unnest({toks}) AS t FROM documents)),
sc AS (SELECT t, count(*) AS ns FROM ts GROUP BY 1),
per AS (
  SELECT g, CAST(count(*) AS BIGINT) AS vocab,
         CAST(sum(CASE WHEN ns = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS unique_vocab
  FROM ts JOIN sc USING (t) GROUP BY g)
SELECT g AS source, vocab, unique_vocab,
       floor(unique_vocab * 10000.0 / vocab + 0.5) / 10000.0 AS unique_ratio
FROM per ORDER BY source
"""


__all__ = __all__ + [  # noqa: F405,PLE0605 — extend the chained list
    "q_max_coverage",
    "_sql_max_coverage",
    "q_source_unique_vocab",
    "_sql_source_unique_vocab",
]
