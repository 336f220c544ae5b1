"""Retrieval operators: BM25 ranked search over an inverted index,
positional-index phrase matching, and token-budget corpus take.

These are the query-side ops a training-data pipeline runs right next to
dedup/quality: ranked retrieval for eval-set mining and RAG corpus
assembly, phrase lookup for targeted contamination probes, and
token-budget mixing when a recipe is specified in tokens, not documents.

Scale design (100 TB):
- BM25 is three keyed aggregations (term-frequency, document-frequency,
  score-sum) plus one broadcast join against the query-term table — the
  inverted index is never materialized as a single object, it IS the
  (term → postings) shuffle. The corpus-level scalar (N, avgdl) moves as
  a 1-row broadcast, never a driver collect.
- Phrase match is the classic positional-index intersection: postings
  carry (doc, pos); a phrase of length L matches where L aligned
  (pos - offset) slots agree — one groupBy, no per-row Python, no
  string rescans of the corpus.
- Token-budget take is a per-source prefix sum (window over the shard,
  never a global order) — the same layout as sequence packing.

Cross-engine determinism: per-term BM25 contributions snap to integer
micro-units (floor(x*1e6+0.5), the k-means re-centering idiom) BEFORE the
per-document sum, so the score is an exact BIGINT sum — independent of
aggregation-tree shape on both engines — and ranking ties break on
(score_u desc, doc_id asc), all integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hash64, tokenize_ws

#: BM25 free parameters (Robertson/Sparck-Jones defaults).
BM25_K1 = 1.2
BM25_B = 0.75


def _micro(col: Column) -> Column:
    """Snap a double to exact integer micro-units: floor(x*1e6 + 0.5)."""
    return F.floor(col * F.lit(1_000_000.0) + F.lit(0.5)).cast("bigint")


def term_stats(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf, dl): whitespace-token term frequencies per document
    plus the document length — one explode + one keyed aggregation with
    map-side partial combine."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        tokenize_ws(F.lower(F.col(text_col))).alias("toks"),
    ).select("id", F.size("toks").cast("bigint").alias("dl"), F.explode("toks").alias("term"))
    return toks.groupBy("id", "dl", "term").agg(F.count("*").cast("bigint").alias("tf"))


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    topk: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k retrieval: ``queries`` is a (query_id, term) table (terms
    pre-deduplicated per query); returns (query_id, rnk, doc_id, score_u,
    score) — the ``topk`` best documents per query.

    idf(t)  = ln(1 + (N - df + 0.5)/(df + 0.5))       [integer inputs]
    tfp(t,d)= tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    score   = Σ_t micro(idf*tfp) / 1e6                  [exact int sum]

    avgdl is sum(dl)/N with an exact integer numerator, so every float in
    the formula derives from integers via a fixed expression tree —
    identical on any engine up to libm ULPs, which the micro-unit snap
    absorbs."""
    tf = term_stats(docs, id_col, text_col)
    df_t = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    # N/avgdl over ALL documents (a token-less doc has no tf row but still
    # counts toward the corpus size), straight off the base table
    stats = docs.select(
        F.size(tokenize_ws(F.lower(F.col(text_col)))).cast("bigint").alias("__dl")
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("__dl").cast("bigint").alias("sum_dl"),
    )
    # corpus scalars ride a 1-row broadcast — never a driver collect
    scored = (
        F.broadcast(queries).join(tf, "term")
        .join(df_t, "term")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tfp = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
    )
    per_doc = (
        scored.select("query_id", F.col("id").alias("doc_id"), _micro(idf * tfp).alias("s_u"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s_u").cast("bigint").alias("score_u"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score_u").desc(), F.col("doc_id").asc())
    return (
        per_doc.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= topk)
        .select(
            "query_id",
            "rnk",
            "doc_id",
            "score_u",
            (F.col("score_u") / F.lit(1_000_000.0)).alias("score"),
        )
    )


def phrase_hits(
    docs: DataFrame, phrases: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Positional-index phrase search. ``phrases`` is (phrase, terms:
    array<string>); returns (phrase, doc_id, n_hits) for every document
    where the phrase occurs as consecutive whitespace tokens.

    Postings (doc, pos, term) equi-join the exploded phrase terms
    (phrase, offset, term); a start position where ALL len(terms) aligned
    slots matched is an occurrence — `count == phrase_len` after grouping
    by (phrase, doc, pos - offset). This is intersection over the
    positional inverted index: no corpus text is rescanned per phrase."""
    postings = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize_ws(F.lower(F.col(text_col)))).alias("pos", "term"),
    )
    pterms = phrases.select(
        "phrase",
        F.size("terms").cast("bigint").alias("phrase_len"),
        F.posexplode("terms").alias("offset", "term"),
    )
    return (
        postings.join(F.broadcast(pterms), "term")
        .groupBy("phrase", "phrase_len", "doc_id", (F.col("pos") - F.col("offset")).alias("start"))
        .agg(F.count("*").alias("n_aligned"))
        .filter(F.col("n_aligned") == F.col("phrase_len"))
        .groupBy("phrase", "doc_id")
        .agg(F.count("*").cast("bigint").alias("n_hits"))
    )


def token_budget_take(
    docs: DataFrame,
    source_col: str,
    id_col: str,
    ntok_col: Column,
    budgets: dict[str, int],
    default_budget: int,
) -> DataFrame:
    """Token-budget mixing: within each source, walk documents in
    deterministic hash64 order and keep them while the running token
    count BEFORE the document is under the source's budget (the document
    that crosses the boundary is kept, then the take stops) — recipes are
    written in tokens, and this is how "2B tokens of web, 500M of code"
    actually materializes.

    Hash order (not doc_id order) so the take is an unbiased sample yet
    fully reproducible — no RNG, no partitioning sensitivity. The prefix
    sum is per-source, so shards pack independently at scale."""
    key = F.concat(
        F.col(source_col).cast("string"), F.lit("|"), F.col(id_col).cast("string")
    )
    chain = None
    for s, tokens in sorted(budgets.items()):
        chain = (chain.when if chain is not None else F.when)(
            F.col(source_col) == s, F.lit(tokens)
        )
    budget = (
        chain.otherwise(F.lit(default_budget)) if chain is not None else F.lit(default_budget)
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(source_col),
            ntok_col.cast("bigint").alias("ntok"),
            hash64(key).alias("__h"),
        )
        .withColumn("cum_before", F.coalesce(F.sum("ntok").over(w), F.lit(0)).cast("bigint"))
        .filter(F.col("cum_before") < budget)
        .drop("__h")
    )


def rbo_weights_pico(depth: int = 50, p: float = 0.9) -> list[int]:
    """Frozen RBO weight table: W_d = (1-p) * p^(d-1) scaled to 1e12
    (pico-units), computed ONCE driver-side and embedded as literals in
    both engines' plans — the ndcg_discounts_micro idiom: pow/exp live in
    libm, whose last-ulp behavior differs across engines, so neither
    engine evaluates a power at query time."""
    out = []
    x = 1.0 - p
    for _ in range(depth):
        out.append(int(x * 1e12 + 0.5))
        x *= p
    return out


def rbo_overlap(rank_a, rank_b, depth: int = 50, p: float = 0.9):
    """Rank-Biased Overlap (Webber et al. 2010) between two top-``depth``
    rankings — the top-weighted similarity of two lists that plain
    set-Jaccard flattens: disagreement at rank 2 matters more than at
    rank 48. The standard "did my vocabulary / retrieval ranking move?"
    eval between corpus snapshots or index builds.

    Inputs: DataFrames (key, rank) with rank 1..depth (deterministically
    tie-broken upstream). Exact integer law: overlap_d (agreement size at
    each depth) is an exact count; the RBO sum uses the frozen pico
    weight table with per-depth truncating division
    sum_d (W_d * overlap_d) div d — engine- and partition-exact. (The
    div-per-term truncation under-counts < 50e-12 per depth vs the real
    RBO; documented, deterministic.)

    Returns one row (depth, n_common, rbo_pico, rbo).
    """
    from pyspark.sql import functions as F

    a = rank_a.select(F.col("key"), F.col("rank").alias("ra"))
    b = rank_b.select(F.col("key"), F.col("rank").alias("rb"))
    both = a.join(b, "key").select(
        F.greatest("ra", "rb").cast("bigint").alias("maxr")
    )
    spark = rank_a.sparkSession
    w = rbo_weights_pico(depth, p)
    depths = spark.range(1, depth + 1).select(F.col("id").cast("bigint").alias("d"))
    overlap = (
        depths.join(both, both["maxr"] <= depths["d"], "left")
        .groupBy("d")
        .agg(F.count("maxr").cast("bigint").alias("overlap_d"))
    )
    w_sql = "array(" + ",".join(f"{int(x)}L" for x in w) + ")"
    terms = overlap.select(
        "d",
        "overlap_d",
        F.expr(f"(element_at({w_sql}, CAST(d AS INT)) * overlap_d) div d")
        .cast("bigint")
        .alias("term_pico"),
    )
    return terms.agg(
        F.lit(depth).cast("bigint").alias("depth"),
        F.max(F.when(F.col("d") == depth, F.col("overlap_d"))).cast("bigint").alias("n_common"),
        F.sum("term_pico").cast("bigint").alias("rbo_pico"),
        F.round(F.sum("term_pico").cast("double") / 1e12, 6).alias("rbo"),
    )
