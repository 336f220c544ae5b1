"""BPE merge training on Spark (extension op, SURVEY §2.9 — the tokenizer-
construction stage of an LLM data pipeline, Sennrich et al. 2016).

Spark-first shape: classic BPE trains on the WORD-FREQUENCY TABLE, not the
corpus — one corpus-wide tokenize+count pass (keyed groupBy with map-side
partials), then every merge iteration runs over the distinct-word vocab
(orders of magnitude smaller than the corpus, cached once). Per iteration:
a narrow pair-explode over the vocab, a tiny keyed count shuffle, and a
1-row argmax collect — the same driver-loop shape as k-means
(``operators/clustering.py``), with O(vocab) state and no corpus rescans.

Representation: each word is a symbol STRING ``(c1)(c2)...(ck)`` — every
symbol wrapped in parens, which cannot occur inside symbols because
``clean_text`` strips all punctuation first. A merge of pair (a, b) is then
a PLAIN string replace ``(a)(b)`` → ``(ab)``, which both engines apply
greedily left-to-right and non-overlapping — exactly BPE's merge rule
(verified: ``(a)(a)(a)(a)`` + merge (a,a) → ``(aa)(aa)``, not ``(aa)(a)(a)``).

Cross-engine determinism: the DuckDB oracle re-derives the argmax pair at
every unrolled iteration from scratch (ties → lexicographically smallest
pair; counts are exact integers), so the full merge TABLE — the actual
training artifact — is differential-tested end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import clean_text, tokenize_ws

#: symbol-extraction regex (shared literal with the oracle)
SYM_RE = r"\(([^)]*)\)"


def _pair_strings(toks: F.Column) -> F.Column:
    """Adjacent ORDERED pairs of a symbol array, re-wrapped as the literal
    replace target ``(a)(b)``. Empty/1-symbol sequences → empty array."""
    n = F.size(toks)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat(
            F.lit("("), F.element_at(toks, i), F.lit(")("),
            F.element_at(toks, i + 1), F.lit(")"),
        ),
    )


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, cnt): the single corpus-wide pass BPE needs."""
    return (
        docs.select(F.explode(tokenize_ws(clean_text(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_fit(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns a DataFrame
    (rank bigint, pair string, merged string) — the merge table a tokenizer
    ships. Driver state is one (pair, merged) string per iteration; the
    vocab stays distributed and cached."""
    vocab = word_freqs(docs, text_col)
    seqs = vocab.select(
        F.array_join(
            F.transform(
                F.regexp_extract_all(F.col("w"), F.lit("(.)"), 1),
                lambda c: F.concat(F.lit("("), c, F.lit(")")),
            ),
            "",
        ).alias("s"),
        "cnt",
    ).persist()
    seqs.count()  # materialize once; every iteration reuses the cache

    merges: list[tuple[int, str, str]] = []
    s = F.col("s")
    for rank in range(1, n_merges + 1):
        # the merge chain applies to the CACHED base — i string replaces per
        # row per iteration over the (tiny) vocab, instead of re-persisting
        # a new working set every round
        for _, pair, merged in merges:
            s = F.replace(s, F.lit(pair), F.lit(merged))
        toks = F.regexp_extract_all(s, F.lit(SYM_RE), 1)
        top = (
            seqs.select(F.explode(_pair_strings(toks)).alias("p"), "cnt")
            .groupBy("p")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair = top[0]["p"]
        merges.append((rank, pair, pair.replace(")(", "")))
        s = F.col("s")

    seqs.unpersist()
    return spark.createDataFrame(
        [(r, p, m.strip("()")) for r, p, m in merges],
        "rank bigint, pair string, merged string",
    )


def _bpe_ctes(n_merges: int, text_col: str, table: str) -> list[str]:
    """The unrolled merge-derivation CTE chain shared by the two oracle
    builders. ``seq{i}`` carries the WORD alongside its symbol string so
    the apply path can join the final mapping back to the corpus;
    MATERIALIZED is load-bearing — inlined CTEs are referenced twice per
    level and re-evaluate the whole chain exponentially."""
    from ..oracle import sql_clean_text, sql_tokenize_ws

    toks = sql_tokenize_ws(sql_clean_text(text_col))
    ctes = [
        (
            "seq0 AS MATERIALIZED (SELECT w, array_to_string(list_transform("
            "regexp_extract_all(w, '(.)', 1), c -> '(' || c || ')'), '') AS s, "
            f"count(*) AS cnt FROM (SELECT unnest({toks}) AS w FROM {table}) "
            "GROUP BY 1, 2)"
        )
    ]
    for i in range(1, n_merges + 1):
        prev = f"seq{i - 1}"
        ctes += [
            (
                f"t{i} AS MATERIALIZED (SELECT regexp_extract_all(s, '{SYM_RE}', 1) AS t, cnt "
                f"FROM {prev})"
            ),
            (
                f"p{i} AS (SELECT unnest(list_transform(range(1, len(t)), "
                "j -> '(' || t[j] || ')(' || t[j+1] || ')')) AS p, cnt "
                f"FROM t{i})"
            ),
            (
                f"m{i} AS (SELECT p, replace(p, ')(', '') AS merged "
                f"FROM (SELECT p, sum(cnt) AS n FROM p{i} GROUP BY 1) "
                "ORDER BY n DESC, p ASC LIMIT 1)"
            ),
            (
                f"seq{i} AS MATERIALIZED (SELECT w, replace(s, (SELECT p FROM m{i}), "
                f"(SELECT merged FROM m{i})) AS s, cnt FROM {prev})"
            ),
        ]
    return ctes


def sql_bpe_merges(n_merges: int = 8, text_col: str = "text",
                   table: str = "documents") -> str:
    """DuckDB twin of ``bpe_fit``: the merge loop unrolled as CTEs, each
    iteration re-deriving pair counts and the argmax from scratch."""
    ctes = _bpe_ctes(n_merges, text_col, table)
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, p AS pair, trim(merged, '()') AS merged FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT * FROM (\n{union}\n) ORDER BY rank"
    )


def bpe_apply(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
) -> DataFrame:
    """Tokenize the corpus with the LEARNED merges: per document, word
    count and BPE symbol count under the trained tokenizer (the
    pre-training token-accounting pass). The merge list collects to the
    driver (n_merges strings); the word -> symbol-count mapping is the
    vocab with the replace chain applied, joined back to the corpus's
    exploded words — one narrow pass + two keyed shuffles, vocab-sized
    state only."""
    merge_rows = bpe_fit(spark, docs, text_col, n_merges).collect()
    s = F.col("s")
    for r in merge_rows:
        s = F.replace(s, F.lit(r["pair"]), F.lit("(" + r["merged"] + ")"))
    vocab = word_freqs(docs, text_col).select(
        "w",
        F.array_join(
            F.transform(
                F.regexp_extract_all(F.col("w"), F.lit("(.)"), 1),
                lambda c: F.concat(F.lit("("), c, F.lit(")")),
            ),
            "",
        ).alias("s"),
    )
    mapping = vocab.select(
        "w", F.size(F.regexp_extract_all(s, F.lit(SYM_RE), 1)).alias("n_sym")
    )
    words = docs.select(
        F.col(id_col),
        F.explode(tokenize_ws(clean_text(F.col(text_col)))).alias("w"),
    )
    return (
        words.join(mapping, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
        )
    )


def sql_bpe_apply(n_merges: int = 8, text_col: str = "text",
                  table: str = "documents", id_col: str = "doc_id") -> str:
    """DuckDB twin of ``bpe_apply``: the final ``seq{n}`` CTE IS the
    word -> merged-symbols mapping; join it to the corpus's exploded
    words and count symbols."""
    from ..oracle import sql_clean_text, sql_tokenize_ws

    toks = sql_tokenize_ws(sql_clean_text(text_col))
    ctes = _bpe_ctes(n_merges, text_col, table)
    ctes.append(
        f"mapping AS (SELECT w, len(regexp_extract_all(s, '{SYM_RE}', 1)) AS n_sym "
        f"FROM seq{n_merges})"
    )
    ctes.append(
        f"words AS (SELECT {id_col}, unnest({toks}) AS w FROM {table})"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT w2.{id_col}, count(*) AS n_words,
       CAST(sum(m.n_sym) AS BIGINT) AS n_bpe_tokens
FROM words w2 JOIN mapping m USING (w)
GROUP BY 1 ORDER BY {id_col}"""
    )
