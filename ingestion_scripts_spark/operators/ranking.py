"""Distributed global ranking — dense total-order row numbers WITHOUT a
single-partition sort.

The naive global rank (``row_number() over (order by ...)`` with no
partitioning) plans ``Exchange SinglePartition`` + one sorting task over
the entire input — the first pattern that dies at 100 TB (Spark itself
warns "Moving all data to a single partition"). This module provides the
scale-safe equivalent, used by ``operators/profiling.py::decile_lift``
and available to any future percentile / gains / top-fraction operator:

1. ``repartitionByRange(num_partitions, *order_cols)`` — one narrow
   shuffle; partition *i* holds a contiguous slice of the total order
   (boundaries come from Spark's reservoir sample, which affects only
   partition SIZES, never rank correctness).
2. ``sortWithinPartitions(*order_cols)`` + ``localCheckpoint`` — each
   slice is sorted independently (32–1000s of parallel sorts instead of
   one), and the layout is pinned so the two downstream passes see the
   identical partitioning (the lineage-stability rule that bit
   ``hits_scores``; see ROADMAP r6).
3. ``monotonically_increasing_id()`` — per Spark's documented contract
   the upper 31 bits are the partition id and the lower 33 bits the
   record position within the partition, so over the checkpointed sorted
   layout ``mid & MASK`` IS the 0-based local rank and ``mid >> 33`` the
   partition id — no window, no second shuffle.
4. Per-partition counts (a tiny aggregate, ≤ num_partitions rows) →
   cumulative offsets via a BOUNDED unpartitioned window → broadcast
   join back. global rank = offset + local rank + 1.

Exactness: identical to the single-partition ``row_number`` for any
total order — ``order_cols`` MUST include a unique tiebreaker (an id
column), otherwise ties straddling a range boundary would be ordered by
partition, not deterministically. The law test
(tests/test_global_rank.py) pins bit-equality against the naive window
on adversarial tie data.

Scale: one range shuffle of the projected columns + one ≤N-row
aggregate + one broadcast hash join; every stage is parallel at any
corpus size. Skewed keys are split by the unique tiebreaker (range
boundaries are on the FULL sort key), so a single hot score value
cannot produce a hot partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: lower 33 bits of monotonically_increasing_id = record number within
#: the partition (Spark's documented bit layout).
_MID_MASK = (1 << 33) - 1


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """All columns of ``df`` plus ``rank_col``: the exact 1-based global
    ``row_number`` under ``order_cols`` — distributed (no
    single-partition WindowExec).

    ``order_cols`` must define a TOTAL order (include a unique id as the
    final tiebreaker). Fires one Spark job at build time (the
    localCheckpoint that pins the range-partitioned layout) — the same
    build-time-materialization class as kmeans/bpe training loops,
    documented in tests/test_plan_hygiene.py::test_query_builders_are_lazy.
    """
    reserved = {"__mid", "__pid", "__off", rank_col}
    clash = reserved.intersection(df.columns)
    if clash:
        # ADVICE r9: silent alias collision would produce ambiguous-column
        # failures or wrong joins (the weighted_median_by_key hostile-name
        # lesson) — fail loudly at build time instead.
        raise ValueError(
            f"global_rank reserved column names present in input: {sorted(clash)}"
        )
    sc = df.sparkSession.sparkContext
    nparts = int(num_partitions or sc.defaultParallelism or 32)
    parts = (
        df.repartitionByRange(nparts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint()
    )
    base = parts.withColumn("__mid", F.monotonically_increasing_id())
    counts = base.groupBy(
        F.shiftright(F.col("__mid"), 33).cast("bigint").alias("__pid")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    # bounded unpartitioned window: ≤ num_partitions rows, post-aggregate
    ow = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(ow), F.lit(0))
        .cast("bigint")
        .alias("__off"),
    )
    out_cols = df.columns
    return (
        base.join(
            F.broadcast(offsets),
            F.shiftright(F.col("__mid"), 33).cast("bigint")
            == F.col("__pid"),
        )
        .select(
            *out_cols,
            (
                F.col("__off")
                + F.col("__mid").bitwiseAND(F.lit(_MID_MASK))
                + F.lit(1)
            )
            .cast("bigint")
            .alias(rank_col),
        )
    )


def order_statistics(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    quantiles: list[tuple[int, int]],
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT order statistics of a corpus-sized column — the
    ceil-rank (type-1) quantile value for each (q_num, q_den) — via
    :func:`global_rank`, never a single-partition sort and never an
    approximation (``approx_percentile`` trades exactness; this is the
    audit-grade path: "the P99 is THIS row's value").

    rank(q) = ceil(q·n) = (q_num·n + q_den − 1) div q_den, clamped to
    ≥ 1; the result row is the unique row at that global rank under
    (value asc, *tiebreak_cols asc). Returns one row per quantile:
    (q_num, q_den, r, value) — all exact integers given an exact
    integer ``value_col``.

    Scale: one range shuffle (the rank) + a broadcast join of the
    ≤ len(quantiles)-row rank table against the ranked corpus — the
    filter on rn is a broadcast semi-probe, not a second sort.
    """
    clash = {"rn", "r", "n", "q_num", "q_den", "value"}.intersection(
        [value_col, *tiebreak_cols]
    )
    if clash:
        raise ValueError(
            f"order_statistics reserved column names in input: {sorted(clash)}"
        )
    order_cols = [F.asc(value_col)] + [F.asc(c) for c in tiebreak_cols]
    ranked = global_rank(
        df.select(value_col, *tiebreak_cols),
        order_cols,
        "rn",
        num_partitions=num_partitions,
    )
    # n = max(rn): read the total off the rank's own checkpoint instead
    # of re-scanning the source (an extra corpus pass at 100 TB)
    n1 = ranked.agg(F.max("rn").cast("bigint").alias("n"))
    qlit = F.array(
        *[
            F.struct(
                F.lit(qn).cast("bigint").alias("q_num"),
                F.lit(qd).cast("bigint").alias("q_den"),
            )
            for qn, qd in quantiles
        ]
    )
    ranks = (
        n1.select(F.explode(qlit).alias("q"), "n")
        .select(
            F.col("q.q_num").alias("q_num"),
            F.col("q.q_den").alias("q_den"),
            F.greatest(
                F.lit(1).cast("bigint"),
                F.expr("(q.q_num * n + q.q_den - 1) div q.q_den"),
            ).alias("r"),
        )
    )
    return (
        ranked.join(F.broadcast(ranks), F.col("rn") == F.col("r"))
        .select("q_num", "q_den", "r", F.col(value_col).alias("value"))
        .orderBy("q_num", "q_den")
    )


def top_share_curve(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    fractions: list[tuple[int, int]],
    num_partitions: int | None = None,
) -> DataFrame:
    """Concentration curve at fixed population fractions — "the top 1%
    of rows by value carries X ppm of the total" — the corpus-level
    companion to decile_lift (which buckets ALL deciles) and the exact
    form of the Pareto-80/20 readout, via :func:`global_rank`: no
    single-partition sort, no approximation.

    For each (f_num, f_den): k = max(1, (f_num·n) div f_den) top rows
    under (value desc, *tiebreak asc); share_ppm = (Σ top-k value · 1e6)
    div (Σ all value) — exact integer arithmetic end to end (value_col
    must be an exact non-negative integer). Returns one row per
    fraction: (f_num, f_den, k, top_value, total_value, share_ppm).

    Scale: one range shuffle for the rank; the ≤len(fractions)-row
    threshold table broadcasts into an rn ≤ k nested-loop probe (3-row
    build side), then one partial-aggregable groupBy. The total is a
    1-row aggregate joined in by broadcast.
    """
    clash = {"rn", "n", "k", "f_num", "f_den", "total_value"}.intersection(
        [value_col, *tiebreak_cols]
    )
    if clash:
        raise ValueError(
            f"top_share_curve reserved column names in input: {sorted(clash)}"
        )
    ranked = global_rank(
        df.select(value_col, *tiebreak_cols),
        [F.desc(value_col)] + [F.asc(c) for c in tiebreak_cols],
        "rn",
        num_partitions=num_partitions,
    )
    # totals off the rank's checkpoint (n ≡ max rn) — no second source scan
    tot = ranked.agg(
        F.max("rn").cast("bigint").alias("n"),
        F.sum(value_col).cast("bigint").alias("total_value"),
    )
    flit = F.array(
        *[
            F.struct(
                F.lit(fn).cast("bigint").alias("f_num"),
                F.lit(fd).cast("bigint").alias("f_den"),
            )
            for fn, fd in fractions
        ]
    )
    ks = tot.select(
        F.explode(flit).alias("f"), "n", "total_value"
    ).select(
        F.col("f.f_num").alias("f_num"),
        F.col("f.f_den").alias("f_den"),
        F.greatest(
            F.lit(1).cast("bigint"), F.expr("(f.f_num * n) div f.f_den")
        ).alias("k"),
        "total_value",
    )
    return (
        ranked.join(F.broadcast(ks), F.col("rn") <= F.col("k"))
        .groupBy("f_num", "f_den", "k", "total_value")
        .agg(F.sum(value_col).cast("bigint").alias("top_value"))
        .select(
            "f_num",
            "f_den",
            "k",
            "top_value",
            "total_value",
            F.expr("(top_value * 1000000) div total_value")
            .cast("bigint")
            .alias("share_ppm"),
        )
        .orderBy("f_num", "f_den")
    )


def largest_remainder_apportionment(
    df: DataFrame,
    key_col: str,
    budget: int,
) -> DataFrame:
    """Hamilton / largest-remainder apportionment of an integer sample
    budget across groups proportional to their counts — the exact "give
    every domain its fair share of the 10k-example eval set" allocator
    (quota-respecting: each group gets floor or ceil of its exact
    proportional share, and Σ alloc == budget ALWAYS).

    base_g = (cnt_g · B) div N; the R = B − Σ base leftover slots go to
    the largest remainders (cnt_g·B mod N, desc; key asc tiebreak).
    Exactness: pure BIGINT; the remainder ranking runs on the
    POST-AGGREGATE per-group frame (bounded by group cardinality — the
    gate-legal unpartitioned-window class). Returns
    (key, cnt, base_alloc, extra, alloc).

    CONTRACT (VERDICT r9 item 4): ``key_col`` cardinality must be
    group-scale (domains, sources, languages — thousands, not billions).
    The remainder window is unpartitioned BY DESIGN because its input is
    one row per distinct key; a corpus-cardinality key (doc id, user id)
    makes that frame corpus-sized and re-creates the single-partition
    sort this module exists to kill. For such keys, rank the remainders
    with :func:`global_rank` on the ``scored`` frame instead —
    apportioning a budget over billions of singleton groups is almost
    always the wrong question (base_alloc is 0 for all of them), so this
    function does not silently absorb that cost.
    """
    per = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = per.agg(F.sum("cnt").cast("bigint").alias("n_total"))
    scored = per.crossJoin(F.broadcast(tot)).select(
        "k",
        "cnt",
        "n_total",
        F.expr(f"(cnt * {budget}) div n_total").cast("bigint").alias("base_alloc"),
        F.expr(f"(cnt * {budget}) % n_total").cast("bigint").alias("rem"),
    )
    leftover = scored.agg(
        (F.lit(budget) - F.sum("base_alloc")).cast("bigint").alias("r_left")
    )
    w = Window.orderBy(F.desc("rem"), F.asc("k"))  # bounded: per-group frame
    return (
        scored.withColumn("pos", F.row_number().over(w).cast("bigint"))
        .crossJoin(F.broadcast(leftover))
        .select(
            F.col("k").alias(key_col),
            "cnt",
            "base_alloc",
            F.when(F.col("pos") <= F.col("r_left"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("extra"),
        )
        .withColumn(
            "alloc", (F.col("base_alloc") + F.col("extra")).cast("bigint")
        )
        .orderBy(key_col)
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact Gini concentration index of a non-negative integer value
    over the whole corpus — the canonical inequality number ("how
    concentrated is revenue / token count / sample weight?"), computed
    distributed via :func:`global_rank`, never a single-partition sort.

    Formula (sorted ascending, rank i = 1..n):
    G = (2·Σ i·x_i − (n+1)·Σ x) / (n·Σ x) — tie-break-invariant because
    tied values contribute the same regardless of rank order within the
    tie. Exactness: products and sums accumulate in DECIMAL(38,0)
    (rank·value can exceed BIGINT at corpus scale: 1e11 rows × 1e7 cents
    ≈ 1e18 per ROW); gini_ppm is one terminal DECIMAL ``div`` (exact
    integral quotient, cross-checked against DuckDB HUGEINT ``//``).
    Returns one row: (n, total, gini_ppm).

    Scale: one range shuffle (the rank) + one partial-aggregable
    terminal aggregate over the rank's own checkpoint.

    Contract (degenerate input): requires a non-empty input. On an empty
    frame this side returns one row with n = NULL (global aggregate over
    zero rows) where a ``count(*)``-based SQL twin returns n = 0 — a
    documented cross-engine divergence, same rationale as
    :func:`trimmed_mean` (no eager build-time n check). Pinned by
    ``tests/test_r11_advice.py::test_gini_degenerate_contract``.
    """
    clash = {"rn", "n", "total"}.intersection([value_col, *tiebreak_cols])
    if clash:
        raise ValueError(
            f"gini_coefficient reserved column names in input: {sorted(clash)}"
        )
    ranked = global_rank(
        df.select(value_col, *tiebreak_cols),
        [F.asc(value_col)] + [F.asc(c) for c in tiebreak_cols],
        "rn",
        num_partitions=num_partitions,
    )
    d38 = "decimal(38,0)"
    return ranked.agg(
        F.max("rn").cast(d38).alias("__n"),
        F.sum(F.col(value_col).cast(d38)).cast(d38).alias("__t"),
        F.sum(F.col("rn").cast("decimal(19,0)") * F.col(value_col).cast("decimal(19,0)"))
        .cast(d38)
        .alias("__s"),
    ).select(
        F.col("__n").cast("bigint").alias("n"),
        F.col("__t").cast("bigint").alias("total"),
        F.expr(
            "((2 * __s - (__n + 1) * __t) * 1000000) div (__n * __t)"
        )
        .cast("bigint")
        .alias("gini_ppm"),
    )


def trimmed_mean(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    trim_num: int = 1,
    trim_den: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact two-sided trimmed AND winsorized mean of a corpus-sized
    integer column — the robust-mean pair every data-quality report
    wants next to the plain mean (outlier-insensitive central tendency;
    trim drops the tails, winsorize clamps them to the cut values).

    k = (n·trim_num) div trim_den rows are dropped from EACH tail (by
    exact global rank under (value, *tiebreaks)); the winsorized mean
    replaces them with the exact order statistics x_(k+1) / x_(n−k).
    All sums in DECIMAL(38,0); the two means are terminal exact ``div``s
    in micro units. Returns one row:
    (n, k_trim, lo_cut, hi_cut, trimmed_mean_micro, winsor_mean_micro).

    Scale: ONE global_rank (one range shuffle); cuts and sums all come
    off the rank's checkpoint — a 1-row broadcast n-table, a 2-row
    boundary probe, one partial-aggregable filtered aggregate. No second
    source scan, no single-partition stage.

    Contract (degenerate input): requires n > 2k — i.e. a non-empty
    input with at least one row surviving the two-sided trim. Outside
    that, the groupBy collapses and THIS side returns ZERO rows, while a
    scalar-aggregate SQL twin returns one row of NULLs — a deliberate,
    documented cross-engine shape divergence (same contract style as
    ``largest_remainder_apportionment``; checking n at build time would
    force an eager job, breaking the lazy-builder rule). Pinned by
    ``tests/test_r11_advice.py::test_trimmed_mean_degenerate_contract``.
    """
    clash = {"rn", "__k", "__n", "__lo", "__hi"}.intersection(
        [value_col, *tiebreak_cols]
    )
    if clash:
        raise ValueError(
            f"trimmed_mean reserved column names in input: {sorted(clash)}"
        )
    ranked = global_rank(
        df.select(value_col, *tiebreak_cols),
        [F.asc(value_col)] + [F.asc(c) for c in tiebreak_cols],
        "rn",
        num_partitions=num_partitions,
    )
    nk = ranked.agg(F.max("rn").cast("bigint").alias("__n")).select(
        "__n",
        F.expr(f"(__n * {int(trim_num)}) div {int(trim_den)}")
        .cast("bigint")
        .alias("__k"),
    )
    cuts = (
        ranked.join(
            F.broadcast(nk),
            (F.col("rn") == F.col("__k") + 1)
            | (F.col("rn") == F.col("__n") - F.col("__k")),
        )
        .groupBy("__n", "__k")
        .agg(
            F.min(value_col).cast("bigint").alias("__lo"),
            F.max(value_col).cast("bigint").alias("__hi"),
        )
    )
    d38 = "decimal(38,0)"
    body = (
        ranked.join(
            F.broadcast(cuts),
            (F.col("rn") > F.col("__k")) & (F.col("rn") <= F.col("__n") - F.col("__k")),
        )
        .groupBy("__n", "__k", "__lo", "__hi")
        .agg(F.sum(F.col(value_col).cast(d38)).cast(d38).alias("__body"))
    )
    return body.select(
        F.col("__n").alias("n"),
        F.col("__k").alias("k_trim"),
        F.col("__lo").alias("lo_cut"),
        F.col("__hi").alias("hi_cut"),
        F.expr("(__body * 1000000) div (__n - 2 * __k)")
        .cast("bigint")
        .alias("trimmed_mean_micro"),
        F.expr(
            "((__body + CAST(__k AS DECIMAL(38,0)) * (__lo + __hi)) * 1000000)"
            " div __n"
        )
        .cast("bigint")
        .alias("winsor_mean_micro"),
    )


def interleave_audit(
    df: DataFrame,
    source_col: str,
    order_cols: list[Column],
    num_partitions: int | None = None,
) -> DataFrame:
    """Shuffle-quality audit of a training-data ORDER: under the given
    total order (typically the pipeline's deterministic hash-shuffle
    key), how clumped is each source? A well-interleaved dataset has
    per-source run counts near its row count (mean run length → 1); a
    sorted-by-source dataset has ONE run per source — the failure mode
    that turns "shuffled" corpora into curriculum accidents.

    Per source: n_rows, n_runs (maximal same-source runs under the
    order), mean_run_micro = n_rows·1e6 div n_runs, adj_same = adjacent
    pairs staying within the source. The global lag is the distributed
    :func:`global_rank` + a self-equi-join on rn = prev rn + 1 — the
    one-shuffle alternative to the banned unpartitioned ``lag`` window.
    Max-run is deliberately NOT reported: it needs a corpus prefix-sum
    (run ids); run COUNT and mean length carry the QA signal without
    one.
    """
    clash = {"rn", "__prev", "n_rows", "n_runs"}.intersection(df.columns)
    if clash:
        raise ValueError(
            f"interleave_audit reserved column names in input: {sorted(clash)}"
        )
    # caller pre-projects df to (source_col + whatever order_cols read):
    # every retained column rides the range shuffle
    ranked = global_rank(df, order_cols, "rn", num_partitions=num_partitions)
    prev = ranked.select(
        (F.col("rn") + 1).alias("rn"), F.col(source_col).alias("__prev")
    )
    lagged = ranked.join(prev, "rn", "left")
    return (
        lagged.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(
                F.when(
                    F.col("__prev").isNull()
                    | (F.col("__prev") != F.col(source_col)),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_runs"),
            F.sum(
                F.when(F.col("__prev") == F.col(source_col), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("adj_same"),
        )
        .select(
            source_col,
            "n_rows",
            "n_runs",
            F.expr("(n_rows * 1000000) div n_runs")
            .cast("bigint")
            .alias("mean_run_micro"),
            "adj_same",
        )
        .orderBy(source_col)
    )


def global_median_mad(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    k_milli: int = 44478,
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT corpus-level median, MAD, and robust-outlier count — the
    global twin of the per-key ``profiling``-family robust z-score
    (whose unpartitioned form the plan gate bans at corpus scale).
    Demonstrates CHAINED global order statistics: the second rank runs
    on a column DERIVED from the first's result (dev = |x − median|).

    med = lower median (ceil-rank n/2) via :func:`order_statistics`;
    mad = lower median of |x − med| via a second order_statistics over
    the deviation frame; outliers = rows with
    10000·dev > k_milli·mad (default k_milli = 44478 ≈ 3·1.4826·1e4,
    the 3-sigma-equivalent MAD gate) — an exact integer comparison, no
    float boundary. Returns one row:
    (n, median, mad, n_outliers).

    Scale: two range shuffles (one per rank) + two broadcast probes +
    one partial-aggregable count — every stage parallel at any corpus
    size; the 1-row median/mad tables broadcast into the corpus scans.
    """
    clash = {"dev", "value", "q_num", "q_den", "r", "rn", "n"}.intersection(
        [value_col, *tiebreak_cols]
    )
    if clash:
        raise ValueError(
            f"global_median_mad reserved column names in input: {sorted(clash)}"
        )
    base = df.select(value_col, *tiebreak_cols)
    med = (
        order_statistics(base, value_col, tiebreak_cols, [(1, 2)],
                         num_partitions=num_partitions)
        .select(F.col("value").alias("__med"))
    )
    dev = base.crossJoin(F.broadcast(med)).select(
        F.abs(F.col(value_col) - F.col("__med")).cast("bigint").alias("dev"),
        *tiebreak_cols,
        "__med",
    )
    mad = (
        order_statistics(
            dev.drop("__med"), "dev", tiebreak_cols, [(1, 2)],
            num_partitions=num_partitions,
        )
        .select(F.col("value").alias("__mad"))
    )
    return (
        dev.crossJoin(F.broadcast(mad))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.max("__med").cast("bigint").alias("median"),
            F.max("__mad").cast("bigint").alias("mad"),
            F.sum(
                (
                    F.col("dev") * 10000 > F.col("__mad") * F.lit(int(k_milli))
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    sum_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """All columns of ``df`` plus ``out_col``: the exact INCLUSIVE
    running sum of ``sum_col`` under the total order ``order_cols`` —
    the prefix-sum sibling of :func:`global_rank`, and like it never an
    ``Exchange SinglePartition`` (the naive
    ``sum() over (order by ...)`` plans exactly that).

    Shape: one range shuffle pins a contiguous slice of the total order
    per partition (sorted + localCheckpoint, the layout-stability rule);
    the within-slice running sum is a window partitioned by the slice id
    (bounded per-partition state); slice TOTALS (≤ num_partitions rows)
    go through the bounded-window offsets pass and broadcast back, so
    cum = slice_offset + within_slice_running. Sums accumulate in
    DECIMAL(38,0) (``sum_col`` must be an exact integer column);
    ``out_col`` is returned as DECIMAL(38,0) — cast at the call site if
    BIGINT is known to suffice.

    ``order_cols`` must be a TOTAL order (unique tiebreaker), same
    contract as global_rank. Fires one job at build (the checkpoint).
    """
    reserved = {"__mid", "__pid", "__run", "__tot", "__off", out_col}
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"global_cumsum reserved column names present in input: {sorted(clash)}"
        )
    sc = df.sparkSession.sparkContext
    nparts = int(num_partitions or sc.defaultParallelism or 32)
    d38 = "decimal(38,0)"
    parts = (
        df.repartitionByRange(nparts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint()
    )
    base = parts.withColumn("__mid", F.monotonically_increasing_id()).withColumn(
        "__pid", F.shiftright(F.col("__mid"), 33).cast("bigint")
    )
    # within-slice inclusive running sum: partitioned window, state bounded
    # by the slice (never the corpus-global unpartitioned form)
    iw = (
        Window.partitionBy("__pid")
        .orderBy("__mid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = base.withColumn("__run", F.sum(F.col(sum_col).cast(d38)).over(iw))
    totals = base.groupBy("__pid").agg(
        F.sum(F.col(sum_col).cast(d38)).cast(d38).alias("__tot")
    )
    # bounded unpartitioned window: ≤ num_partitions rows, post-aggregate
    ow = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__tot").over(ow), F.lit(0).cast(d38))
        .cast(d38)
        .alias("__off"),
    )
    out_cols = df.columns
    return run.join(F.broadcast(offsets), "__pid").select(
        *out_cols,
        (F.col("__off") + F.col("__run")).cast(d38).alias(out_col),
    )
