"""Deduplication operators — reference J1/K3 plus LLM-pipeline extensions.

Reference surface:
- J1 anti-join dedup: drop incoming records whose key already exists at the
  sink (``src/rss_consumer.py:56-74`` — in-memory ``links`` set probe).
- K3 unique-index dedup-at-sink (``src/rss_consumer.py:53``) — see
  ``operators/sink.py``.

Extensions (driver mandate, SURVEY.md §2.9): exact dedup, MinHash-LSH
near-dup, SimHash fingerprints, n-gram Jaccard similarity join.

All hash-based ops use ``functions.text.hash64`` (md5-derived 60-bit) so the
DuckDB oracle can reproduce values exactly; at cluster scale md5 is ~100 MB/s
per core JVM-side — fine, these ops are shuffle-bound, not hash-bound.

Scale notes:
- ``anti_join_dedup`` broadcasts the key side when small (the reference held
  it in every worker's memory — same idea); for a large existing-key set it
  falls back to a shuffled left-anti join, which AQE may still convert.
- MinHash-LSH is the 100 TB near-dup path: candidate generation touches only
  (band, bucket) groups instead of all O(n^2) pairs; the only wide ops are
  the explode-groupBy for buckets and the pair self-join within buckets.
- SimHash gives a 64-bit fingerprint per doc; near-dup = fingerprints within
  Hamming distance d, found by banding the fingerprint (pigeonhole) rather
  than all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hash64, ngrams, tokenize_ws


def anti_join_dedup(
    incoming: DataFrame,
    existing_keys: DataFrame,
    key: str,
    broadcast_existing: bool = True,
) -> DataFrame:
    """J1 — stream/batch-static left-anti join on ``key``.

    Reference parity: ``remove_old_articles`` (``src/rss_consumer.py:68-74``)
    probes an in-memory list loaded at startup; the broken refresh timer
    (``src/rss_consumer.py:63-65``) is NOT replicated — re-reading the static
    side per batch is Spark's default (SURVEY.md §1.5).
    """
    keys = existing_keys.select(key).dropDuplicates([key])
    if broadcast_existing:
        keys = F.broadcast(keys)
    return incoming.join(keys, on=key, how="left_anti")


def exact_dedup(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """Exact dedup keeping one deterministic winner per key group.

    ``row_number() over (partition by keys order by order_by) = 1`` — the
    scalable form of ``dropDuplicates`` with a deterministic survivor.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.asc(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingles(text_col: Column, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct) of lowercased text."""
    return F.array_distinct(ngrams(tokenize_ws(F.lower(text_col)), n))


def minhash_signature(shingles_col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: sig[i] = min over shingles of hash64(i || '|' || s).

    Seeded by prefixing the seed index — identical in the DuckDB oracle.
    Empty shingle sets get NULL mins (handled by callers filtering empties).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                shingles_col,
                lambda s: hash64(F.concat(i.cast("string"), F.lit("|"), s)),
            )
        ),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.

    Returns distinct (id_a, id_b) with id_a < id_b. The self-join is per
    (band, bucket) group — the LSH pruning that makes near-dup feasible at
    scale; bucket keys are md5 over the band's signature slice.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col),
        minhash_signature(shingles(F.col(text_col), n_shingle), num_hashes).alias("sig"),
    ).filter(F.size(F.col("sig")) > 0)

    banded = sig.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")

    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array columns (as sets)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact-Jaccard verification.

    Returns (id_a, id_b, jaccard) for verified pairs ≥ threshold. Verification
    re-joins the shingle sets so LSH false positives are filtered; false
    negatives are the usual LSH tradeoff (prob. bounded by the band curve).
    """
    sh = df.select(
        F.col(id_col), shingles(F.col(text_col), n_shingle).alias("sh")
    )
    cand = minhash_lsh_candidates(df, id_col, text_col, n_shingle, num_hashes, bands)
    return (
        cand.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.3,
    n_shingle: int = 3,
) -> DataFrame:
    """Blocked exact n-gram Jaccard similarity join (no hashing).

    All pairs WITHIN a block (e.g. language) are compared — the exact
    baseline against which MinHash recall is judged. Blocking keeps the
    self-join from being O(n^2) globally; at scale choose a higher-cardinality
    block key or fall back to ``minhash_dedup_pairs``.
    """
    sh = df.select(
        F.col(id_col), F.col(block_col), shingles(F.col(text_col), n_shingle).alias("sh")
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(jaccard(F.col("a.sh"), F.col("b.sh")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(text_col: Column, bits: int = 32) -> Column:
    """SimHash fingerprint over distinct lowercased tokens (weight 1 each).

    bit j of the fingerprint is set iff sum over tokens of
    (+1 if hash64(token) has bit j else -1) > 0. Near-dup detection then
    compares Hamming distance on the fingerprints. Bit positions are Python
    literals (shift amounts must be constants), so the expression is a sum of
    ``bits`` windowless aggregates — all JVM-side.
    """
    toks = F.array_distinct(tokenize_ws(F.lower(text_col)))
    hashes = F.transform(toks, hash64)
    def _vote(mask: int):
        # note: HOF lambdas must take exactly the arity Spark expects, so the
        # mask is bound via closure, not a default arg
        return lambda s, h: s + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, F.lit(1)
        ).otherwise(F.lit(-1))

    fp = F.lit(0).cast("bigint")
    for j in range(bits):
        vote_j = F.aggregate(hashes, F.lit(0).cast("bigint"), _vote(1 << j))
        fp = fp + F.when(vote_j > 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return fp
