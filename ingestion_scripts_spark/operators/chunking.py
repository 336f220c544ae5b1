"""Content-defined chunking (CDC) — variable-length chunk dedup.

The storage-dedup classic (Muthitacharoen et al., LBFS SOSP'01; Rabin
fingerprint boundaries) applied at token granularity to a text corpus:
chunk boundaries are placed where a rolling window hash satisfies
``h mod divisor == 0``, so boundaries are determined by CONTENT, not
offset — inserting or deleting a token shifts every fixed-offset chunk
after the edit, but CDC boundaries re-synchronize at the next content
match, letting chunk-hash dedup find long shared regions between
documents whose prefixes differ (the long-document complement to the
fixed-k span postings in ``operators/spans.py``: spans excise exact
k-token duplicates; CDC measures and deduplicates VARIABLE-length
shared regions at storage granularity).

Reference pipeline parity: the reference has no chunk store; this is
part of the §2.9 LLM-curation extension surface (dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ingestion_scripts_spark.functions.text import tokenize_ws

#: rolling window width (tokens) and boundary divisor. Expected chunk
#: length ≈ divisor tokens; window w makes the boundary decision depend
#: on w consecutive tokens, so a single-token edit disturbs at most w
#: boundary decisions around it.
CDC_WINDOW = 4
CDC_DIVISOR = 16

#: the portable 60-bit hash as a SQL snippet over an expression — same
#: construction as functions.text.hash64, inlined because it must run
#: inside array HOF lambdas here
_H = "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)"


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = CDC_WINDOW,
    divisor: int = CDC_DIVISOR,
) -> DataFrame:
    """Chunk every document by content-defined boundaries; returns one
    row per chunk: (id, chunk_idx, start_pos, chunk_len, chunk_hash),
    1-based token positions, partition-complete (chunks concatenate
    back to the lowercased whitespace token stream — the ledgered law).

    Boundary rule: position i (window ≤ i ≤ n) ends a chunk when
    ``hash64(join(tokens[i-window+1 .. i])) mod divisor == 0``; the
    document end always ends the last chunk. Documents shorter than
    ``window`` tokens (or with no boundary hit) are a single chunk;
    empty documents produce no rows. This is the basic LBFS scheme
    (no min/max clamp), chosen so chunking is POSITION-PARALLEL — every
    boundary decision is independent, no sequential walk — and the
    DuckDB oracle is the same non-recursive expression. Production
    min/max clamps are a sequential per-doc ``aggregate`` walk over the
    same candidate array (same shape as span_removal_apply's gap walk).

    Scale shape: everything is per-document JVM HOFs over the token
    array — zero shuffles in this operator; the downstream dedup
    groupBy(chunk_hash) is the only exchange, keyed on a ~60-bit hash
    (no hot keys beyond genuinely duplicated content). Window hashing
    recomputes md5 per position (O(n·w) bytes hashed); at w=4 this is
    cheap and keeps the hash oracle-portable — a production gear/Rabin
    ROLLING hash (O(n)) would be an Arrow ``mapInPandas`` swap-in with
    the same output contract.
    """
    toks = docs.select(
        F.col(id_col).alias("__id"),
        tokenize_ws(F.lower(F.col(text_col))).alias("__t"),
    ).where(F.size("__t") > 0)
    win_join = (
        f"array_join(slice(__t, CAST(i - {window - 1} AS INT), {window}), ' ')"
    )
    cand = (
        f"CASE WHEN size(__t) >= {window} THEN "
        f"filter(transform(sequence(CAST({window} AS BIGINT), "
        f"CAST(size(__t) AS BIGINT)), i -> "
        f"IF(pmod({_H.format(x=win_join)}, {divisor}) = 0, i, "
        f"CAST(NULL AS BIGINT))), x -> x IS NOT NULL) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    bounded = toks.select(
        "__id",
        "__t",
        F.expr(
            f"array_distinct(concat({cand}, "
            f"array(CAST(size(__t) AS BIGINT))))"
        ).alias("__bnd"),
    )
    chunk_struct = (
        "transform(__bnd, (b, k) -> struct("
        "CAST(k + 1 AS BIGINT) AS chunk_idx, "
        "CASE WHEN k = 0 THEN CAST(1 AS BIGINT) ELSE __bnd[k - 1] + 1 END "
        "AS start_pos, "
        "b - (CASE WHEN k = 0 THEN CAST(1 AS BIGINT) "
        "ELSE __bnd[k - 1] + 1 END) + 1 AS chunk_len))"
    )
    chunk_text = "array_join(slice(__t, CAST(c.start_pos AS INT), CAST(c.chunk_len AS INT)), ' ')"
    out = (
        bounded.select("__id", "__t", F.explode(F.expr(chunk_struct)).alias("c"))
        .select(
            F.col("__id").alias(id_col),
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.start_pos").alias("start_pos"),
            F.col("c.chunk_len").alias("chunk_len"),
            F.expr(_H.format(x=chunk_text)).alias("chunk_hash"),
        )
    )
    return out


def cdc_dedup_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    window: int = CDC_WINDOW,
    divisor: int = CDC_DIVISOR,
) -> DataFrame:
    """Chunk-level storage-dedup report per ``group_col``: a chunk
    OCCURRENCE is a duplicate when the same chunk_hash appeared earlier
    in global (doc_id, start_pos) order (first copy is charged, every
    repeat is savings — the store-once accounting a content-addressed
    chunk store does). Returns (group, n_chunks, dup_chunks,
    total_tokens, dup_tokens, dedup_ppm) with dedup_ppm exact-integer
    micro-units, ordered by group.

    Scale shape: one (chunk_hash)-keyed window for the occurrence rank
    (corpus-wide only per duplicated hash value), one keyed aggregation
    on the group column; everything upstream is per-document HOFs.
    """
    from pyspark.sql import Window

    chunks = cdc_chunks(docs, id_col, text_col, window, divisor).join(
        docs.select(F.col(id_col), F.col(group_col)), id_col
    )
    w = Window.partitionBy("chunk_hash").orderBy(id_col, "start_pos")
    ranked = chunks.withColumn("__rn", F.row_number().over(w))
    dup = (F.col("__rn") >= 2).cast("int")
    return (
        ranked.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(dup).cast("bigint").alias("dup_chunks"),
            F.sum("chunk_len").cast("bigint").alias("total_tokens"),
            F.sum(dup * F.col("chunk_len")).cast("bigint").alias("dup_tokens"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_chunks",
            "dup_chunks",
            "total_tokens",
            "dup_tokens",
            F.expr("(dup_tokens * 1000000) div total_tokens")
            .cast("bigint")
            .alias("dedup_ppm"),
        )
        .orderBy(group_col)
    )
