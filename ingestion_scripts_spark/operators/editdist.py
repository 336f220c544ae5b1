"""Edit-distance similarity join with positional q-gram pruning (Ed-Join /
Gravano count-filter family).

The string-similarity complement to the set-similarity PPJoin
(``operators/setjoin.py``): find all pairs of strings within Levenshtein
distance ``k`` WITHOUT an all-pairs comparison. This is the workhorse for
catalog/entity canonicalization in a curation pipeline — "which product
names / author strings / URLs are one typo apart?".

Candidate generation is the count filter (Gravano et al., VLDB'01): if
``ED(s, t) <= k`` then the multisets of overlapping q-grams share at least

    max(G_s, G_t) - q * k      where  G_x = len(x) - q + 1

grams. Multiset intersection is computed as an equi-join on
``(gram, occurrence_index)`` — occurrence-indexing each repeated gram makes
``count(matches) == sum_g min(c_s(g), c_t(g))`` exactly, with no HOF or UDF.
Candidates then pass a length filter (``|len(s) - len(t)| <= k``, a
necessary condition for ED <= k) and are verified with the JVM-native
``levenshtein`` — the only non-equi work, on the pruned pair set only.

Strings too short for the filter to prune (``G <= q * k``, where the
threshold is <= 0 and EVERY pair is a candidate) are handled in a separate
short bucket joined all-pairs within a length band. Correctness never
depends on pruning; pruning only removes pairs the verify step would
reject.

Scale shape: the gram inverted index is a keyed shuffle; candidate volume
is bounded by posting-list lengths (skewed grams can be capped upstream by
the caller dropping stopword-grams); the short bucket is bounded because
its members have < q*(k+1) + q - 1 characters. No cartesian join appears
in the plan at any scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def qgram_edit_join(
    strings: DataFrame,
    id_col: str,
    str_col: str,
    k: int = 1,
    q: int = 2,
) -> DataFrame:
    """All pairs ``(id_a, id_b, s_a, s_b, dist)`` with
    ``levenshtein(s_a, s_b) <= k`` and ``id_a < id_b``.

    ``strings`` must be unique per ``id_col`` (dedupe upstream: for
    near-duplicate NAME discovery, pass one row per distinct name and
    join cardinalities back afterwards — that keeps the pair space over
    distinct values, not rows)."""
    s = strings.select(
        F.col(id_col).cast("bigint").alias("sid"),
        F.col(str_col).alias("s"),
    ).withColumn("slen", F.length("s"))
    ngrams = F.lit(1) * (F.col("slen") - F.lit(q - 1))
    s = s.withColumn("g", ngrams)

    # --- long bucket: count-filter prunable (threshold >= 1) ---
    long_s = s.filter(F.col("g") > q * k)
    # grams via SQL substr (accepts a column start position)
    posting = long_s.selectExpr(
        "sid",
        "slen",
        "g",
        f"posexplode(transform(sequence(1, g), i -> substr(s, i, {q}))) AS (pos, gram)",
    )
    occ = posting.withColumn(
        "occ",
        F.row_number().over(
            Window.partitionBy("sid", "gram").orderBy("pos")
        ),
    ).select("sid", "slen", "g", "gram", "occ")

    a, b = occ.alias("a"), occ.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.occ") == F.col("b.occ"))
            & (F.col("a.sid") < F.col("b.sid"))
            & (
                F.abs(F.col("a.slen") - F.col("b.slen")) <= k
            ),
        )
        .groupBy(
            F.col("a.sid").alias("id_a"),
            F.col("b.sid").alias("id_b"),
            F.col("a.g").alias("ga"),
            F.col("b.g").alias("gb"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= F.greatest("ga", "gb") - F.lit(q * k))
        .select("id_a", "id_b")
    )

    # --- short bucket: threshold <= 0 → length-banded pairs. The length
    # band |len_a - len_b| <= k is made an EQUI-join by exploding one
    # side's length into the k+1 target lengths it can pair with
    # (len..len+k upward; the downward direction is covered by the
    # partner's upward explode) — no cartesian/BNLJ in the plan even
    # though the band itself is an inequality.
    short_s = s.filter(F.col("g") <= q * k).select("sid", "slen")
    sa_up = short_s.select(
        F.col("sid").alias("said"),
        F.col("slen").alias("salen"),
        F.explode(F.sequence(F.col("slen"), F.col("slen") + k)).alias("tlen"),
    )
    short_cand = (
        sa_up.join(
            short_s.select(F.col("sid").alias("sbid"),
                           F.col("slen").alias("tlen")),
            "tlen",
        )
        .filter(F.col("said") != F.col("sbid"))
        .select(
            F.least(F.col("said"), F.col("sbid")).alias("id_a"),
            F.greatest(F.col("said"), F.col("sbid")).alias("id_b"),
        )
    )
    # short x long pairs: a short string can be within k of a long one
    # only if the long one is also near-short (len <= short.len + k), so
    # the short side's +/-k length explode meets a long side banded down
    # to the boundary.
    boundary = q * k + q - 1 + k  # max len of a long string pairable w/ short
    sa_band = short_s.select(
        F.col("sid").alias("said"),
        F.explode(
            F.sequence(F.col("slen") - k, F.col("slen") + k)
        ).alias("tlen"),
    )
    sl_cand = sa_band.join(
        s.filter((F.col("g") > q * k) & (F.col("slen") <= boundary)).select(
            F.col("sid").alias("lid"), F.col("slen").alias("tlen")
        ),
        "tlen",
    ).select(
        F.least(F.col("said"), F.col("lid")).alias("id_a"),
        F.greatest(F.col("said"), F.col("lid")).alias("id_b"),
    )

    all_cand = cand.unionByName(short_cand).unionByName(sl_cand).distinct()

    names = s.select("sid", "s")
    verified = (
        all_cand.join(
            names.select(F.col("sid").alias("id_a"), F.col("s").alias("s_a")),
            "id_a",
        )
        .join(
            names.select(F.col("sid").alias("id_b"), F.col("s").alias("s_b")),
            "id_b",
        )
        .withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= k)
        .select("id_a", "id_b", "s_a", "s_b", "dist")
    )
    return verified


def snm_candidate_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 2,
    band_expr=None,
) -> DataFrame:
    """Sorted-Neighborhood Method blocking (Hernandez & Stolfo '95): sort
    records by a canonical key, emit each record paired with its next
    ``window`` neighbors in sort order — the linear-output complement to
    q-gram blocking (``qgram_edit_join``): candidate volume is exactly
    n*window regardless of key distribution.

    Scale shape: records are BANDED by ``band_expr`` (default: first
    character of the key) and the sort + lead() window runs PER BAND —
    a partitioned window, never a global single-partition sort. Pairs
    that straddle a band boundary are missed by one pass; production
    runs the standard multi-pass SNM (a second pass with a rotated key)
    — the law tests pin the per-band semantics.

    Returns (band, id_a, id_b, dist) with dist = levenshtein(key_a, key_b),
    id_a/id_b in sort order within the band.
    """
    band = band_expr if band_expr is not None else F.substring(F.col(key_col), 1, 1)
    base = df.select(
        band.alias("band"),
        F.col(id_col).alias("__id"),
        F.col(key_col).alias("__key"),
    )
    w = Window.partitionBy("band").orderBy("__key", "__id")
    pairs = []
    for off in range(1, window + 1):
        pairs.append(
            base.withColumn("__id2", F.lead("__id", off).over(w))
            .withColumn("__key2", F.lead("__key", off).over(w))
            .where(F.col("__id2").isNotNull())
        )
    out = reduce(lambda a, b: a.unionByName(b), pairs)
    return out.select(
        "band",
        F.col("__id").alias("id_a"),
        F.col("__id2").alias("id_b"),
        F.levenshtein("__key", "__key2").cast("bigint").alias("dist"),
    )
