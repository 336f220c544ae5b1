"""Dataset-profiling operators: Pareto frontier, two-sample KS drift,
categorical mutual information.

All three follow the repo's cross-engine exactness laws: measures are
snapped to integer micro/nano units built from exact BIGINT counts with
at most one float divide (and identical IEEE op order on both engines),
so results are independent of partitioning and merge order.

Scale shapes (100 TB):
- ``pareto_frontier_2d``: the naive skyline is an all-pairs dominance
  anti-join (O(n^2)). Here the frontier is computed on the PER-X-VALUE
  aggregate (one keyed groupBy shuffle), so the global running-max
  window only ever sees |distinct x| rows — tiny next to the fact table
  — and full rows are recovered with a broadcast join of the frontier
  points. No all-pairs anywhere.
- ``ks_statistic``: cumulative counts via a RANGE window partitioned by
  the group key (so ties share one CDF step, and no global sort
  exists); the D statistic is max |ca*nb - cb*na| in exact BIGINTs.
- ``mutual_information``: three keyed aggregations (cells + two
  marginals, each with map-side partials) joined back; per-cell
  contributions snap to nano-units so the corpus-level sum is exact
  integer arithmetic.

Reference scope: SURVEY.md §2.9 extension surface (the reference
pipeline has no profiling layer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..functions.lits import bigint_array


def snap_units(col: Column, scale: int) -> Column:
    """floor(x*scale + 0.5) as BIGINT — the repo-wide half-up snap."""
    return F.floor(col * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")


def pareto_frontier_2d(
    df: DataFrame,
    minimize_col: Column,
    maximize_col: Column,
    keep_cols: list[str],
) -> DataFrame:
    """Exact 2-D skyline: rows for which no other row is <= on
    ``minimize_col`` and >= on ``maximize_col`` with at least one strict.

    ``minimize_col`` must already be an exact integer (snap floats with
    ``snap_units`` first). Ties on BOTH dimensions are all kept (neither
    dominates). Returns keep_cols + (__x, __y).
    """
    pts = df.select(
        *keep_cols, minimize_col.alias("__x"), maximize_col.alias("__y")
    )
    per_x = pts.groupBy("__x").agg(F.max("__y").alias("__best"))
    w = Window.orderBy("__x").rangeBetween(Window.unboundedPreceding, -1)
    frontier = (
        per_x.withColumn("__prev", F.max("__best").over(w))
        .where(F.col("__prev").isNull() | (F.col("__best") > F.col("__prev")))
        .select(F.col("__x").alias("__fx"), F.col("__best").alias("__fy"))
    )
    return pts.join(
        F.broadcast(frontier),
        (pts["__x"] == frontier["__fx"]) & (pts["__y"] == frontier["__fy"]),
    ).select(*keep_cols, "__x", "__y")


def ks_statistic(
    df: DataFrame,
    group_col: str,
    value_micro: Column,
    is_a: Column,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per group between the
    ``is_a`` rows (sample A) and the rest (sample B).

    D = max over x of |F_A(x) - F_B(x)| evaluated as the exact integer
    |ca*nb - cb*na| (cross-multiplied CDF numerators), with ONE float
    divide at the end. ``value_micro`` must be an exact integer.

    Returns (group_col, n_a, n_b, d_num, ks) with ks rounded to 6 dp.
    """
    base = df.select(
        F.col(group_col),
        value_micro.alias("__vm"),
        F.when(is_a, F.lit(1)).otherwise(F.lit(0)).alias("__a"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("__vm")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    cum = base.withColumn("ca", F.sum("__a").over(w)).withColumn(
        "cb", F.sum(1 - F.col("__a")).over(w)
    )
    tot = base.groupBy(group_col).agg(
        F.sum("__a").cast("bigint").alias("n_a"),
        F.sum(1 - F.col("__a")).cast("bigint").alias("n_b"),
    )
    d = (
        cum.join(tot, group_col)
        .groupBy(group_col, "n_a", "n_b")
        .agg(
            F.max(
                F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a"))
            ).alias("d_num")
        )
    )
    return d.select(
        group_col,
        "n_a",
        "n_b",
        "d_num",
        F.round(
            F.col("d_num").cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double"),
            6,
        ).alias("ks"),
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-cell mutual-information contributions between two categorical
    columns: (nxy/N) * ln(nxy*N / (nx*ny)), snapped to exact nano-units.

    Both engines compute the identical IEEE sequence on identical exact
    BIGINTs — one divide inside the ln, one divide for the weight — so
    the snap is engine-stable and the total (an integer SUM over cells)
    is partition-order independent.

    Returns (x, y, nxy, mi_nano, total_mi_nano).

    The fact table is scanned ONCE (the cells aggregation); marginals
    and the grand total re-aggregate the tiny cells table — at 100 TB
    that is the difference between one shuffle of the facts and four."""
    cells = df.groupBy(x_col, y_col).agg(F.count(F.lit(1)).alias("nxy"))
    from ingestion_scripts_spark.caching import persist_tracked

    cells = persist_tracked(cells)
    nx = cells.groupBy(x_col).agg(F.sum("nxy").alias("nx"))
    ny = cells.groupBy(y_col).agg(F.sum("nxy").alias("ny"))
    n = cells.agg(F.sum("nxy").alias("n_total"))
    contrib = (
        cells.join(nx, x_col)
        .join(ny, y_col)
        .crossJoin(F.broadcast(n))
        .withColumn(
            "mi_nano",
            F.floor(
                (F.col("nxy").cast("double") / F.col("n_total").cast("double"))
                * F.log(
                    (F.col("nxy") * F.col("n_total")).cast("double")
                    / (F.col("nx") * F.col("ny")).cast("double")
                )
                * F.lit(1e9)
                + F.lit(0.5)
            ).cast("bigint"),
        )
    )
    return contrib.select(
        x_col,
        y_col,
        F.col("nxy").cast("bigint").alias("nxy"),
        "mi_nano",
        F.sum("mi_nano").over(Window.partitionBy(F.lit(1))).alias("total_mi_nano"),
    )


def cusum_changepoint(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_micro: Column,
) -> DataFrame:
    """CUSUM change-point detection per group: the index k maximizing
    |S_k| where S_k is the cumulative deviation from the group mean.

    Division-free exactness: instead of subtracting the float mean per
    step, the deviation sum is cross-multiplied —

        S_k_scaled = n * prefix_k - k * total

    (== n * sum_{i<=k}(v_i - mean)) — all BIGINT, so the argmax is
    engine- and partition-order exact. Ties break to the smallest k.

    Scale shape: one partitioned running-sum window (rows frame over the
    group's order columns — no global sort), one keyed argmax via
    row_number. Returns (group, n, k_at_max, s_abs_max).
    """
    base = df.select(F.col(group_col), *order_cols, value_micro.alias("__v"))
    w_ord = (
        Window.partitionBy(group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_grp = Window.partitionBy(group_col)
    cum = (
        base.withColumn("__prefix", F.sum("__v").over(w_ord))
        .withColumn(
            "__k",
            F.row_number().over(Window.partitionBy(group_col).orderBy(*order_cols)),
        )
        .withColumn("__n", F.count(F.lit(1)).over(w_grp))
        .withColumn("__total", F.sum("__v").over(w_grp))
        .withColumn(
            "__s_abs",
            F.abs(F.col("__n") * F.col("__prefix") - F.col("__k") * F.col("__total")),
        )
    )
    ranked = cum.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(F.desc("__s_abs"), F.asc("__k"))
        ),
    ).where(F.col("__rn") == 1)
    return ranked.select(
        group_col,
        F.col("__n").cast("bigint").alias("n"),
        F.col("__k").cast("bigint").alias("k_at_max"),
        F.col("__s_abs").cast("bigint").alias("s_abs_max"),
    )


def roc_auc(
    df: DataFrame,
    group_col: str,
    score: Column,
    label: Column,
) -> DataFrame:
    """Rank-based ROC-AUC (Mann-Whitney U) per group, tie-correct and
    engine-exact.

    AUC = P(score_pos > score_neg) + 0.5 * P(tie). With average ranks
    over the ascending score order this is

        AUC = (sum_pos(avgrank) - n_pos(n_pos+1)/2) / (n_pos * n_neg)

    Exactness law: avgrank = (rank_min + rank_max)/2 is a half-integer,
    so the sum is carried as ``u2 = sum_pos(rank_min + rank_max)
    - n_pos(n_pos+1)`` — exact BIGINTs (safe to ~3e9 rows per group,
    where 2*sum(rank) approaches int64), with ONE float divide rounded
    to 6 places at the end, identical on both engines. ``score`` must
    already be an exact integer (snap floats with ``snap_units``).

    Scale shape: rank_min is a rank() window per group and rank_max
    derives from the per-(group, score) tie count — both are keyed
    shuffles on the group (plus score) key, no global sort; the final
    aggregate is one map-side-combinable groupBy. Groups with no
    positives or no negatives return NULL auc (undefined).
    """
    base = df.select(
        F.col(group_col).alias("g"),
        score.cast("bigint").alias("s"),
        F.when(label, F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    rank_min = F.rank().over(Window.partitionBy("g").orderBy("s"))
    ties = F.count(F.lit(1)).over(Window.partitionBy("g", "s"))
    ranked = base.withColumn("r2", (2 * rank_min + ties - 1).cast("bigint"))
    agg = ranked.groupBy("g").agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("n_neg"),
        F.sum(F.col("y") * F.col("r2")).cast("bigint").alias("s2"),
    )
    u2 = F.col("s2") - F.col("n_pos") * (F.col("n_pos") + 1)
    return agg.select(
        F.col("g").alias(group_col),
        "n_pos",
        "n_neg",
        u2.cast("bigint").alias("u2"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                u2.cast("double")
                / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
                6,
            ),
        ).alias("auc"),
    )


def interarrival_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    min_gaps: int = 30,
    cv2_den: int = 20,
) -> DataFrame:
    """Per-key inter-arrival-gap statistics with a division-free
    burst/bot flag (machine-generated traffic shows abnormally REGULAR
    timing: coefficient of variation of the gaps near zero).

    Gaps are whole seconds: ``(epoch_us(ts) - lag) div 1_000_000`` —
    truncated integer division of a nonnegative difference, identical on
    both engines. The flag

        is_bot = n_gaps >= min_gaps AND cv2_den * (n*sum(g^2) - sum(g)^2)
                 < sum(g)^2

    (i.e. CV^2 < 1/cv2_den) is evaluated in DECIMAL(38,0): sums of
    squared second-gaps stay below ~1e26 even for decade-long histories,
    so the comparison is exact integer arithmetic — no variance divide,
    no float anywhere.

    Scale shape: one lag window partitioned by key ordered by
    (ts, tiebreak) — the tiebreaker makes equal-timestamp orders
    deterministic — then one map-side-combinable groupBy. No global
    sort, no self-join.
    """
    gap_s = F.expr(
        f"(unix_micros({ts_col}) - lag(unix_micros({ts_col})) OVER "
        f"(PARTITION BY {key_col} ORDER BY {ts_col}, {tiebreak_col})) div 1000000"
    )
    gaps = (
        df.withColumn("__gap", gap_s)
        .where(F.col("__gap").isNotNull())
        .select(F.col(key_col), F.col("__gap").cast("decimal(18,0)").alias("g"))
    )
    agg = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("g").cast("decimal(38,0)").alias("sg"),
        F.sum(F.col("g") * F.col("g")).cast("decimal(38,0)").alias("sg2"),
    )
    var_num = F.col("n_gaps").cast("decimal(38,0)") * F.col("sg2") - F.col(
        "sg"
    ) * F.col("sg")
    return agg.select(
        key_col,
        "n_gaps",
        F.col("sg").cast("bigint").alias("sum_gap_s"),
        F.when(
            (F.col("n_gaps") >= F.lit(min_gaps))
            & (F.lit(cv2_den).cast("decimal(38,0)") * var_num < F.col("sg") * F.col("sg")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_bot"),
    )


def cohens_kappa(df: DataFrame, a: Column, b: Column) -> DataFrame:
    """Inter-annotator agreement (Cohen's kappa) between two binary
    raters — the standard QA statistic when two labeling passes (human,
    heuristic, or model) disagree on training-data quality labels.

    One full-table aggregate produces the four exact BIGINT counts
    (n, both raters' positives, raw agreements); po, pe, kappa are then
    single double expressions over those integers — no float summation
    anywhere, so the result is partition-order independent before the
    final 1e-4 rounding. kappa = (po - pe) / (1 - pe) with
    pe = (na·nb + (n-na)(n-nb)) / n².

    NULL rater inputs count as False (coalesced BEFORE the int cast —
    a bare sum(cast) would silently SKIP them, drifting from any SQL
    twin whose CASE maps NULL to 0); kappa is NULL when pe = 1 (both
    raters constant — agreement is undefined), decided on the EXACT
    integer identity pe=1 ⟺ na·nb + (n-na)(n-nb) = n², not on a float."""
    ac = F.coalesce(a.cast("boolean"), F.lit(False)).cast("int")
    bc = F.coalesce(b.cast("boolean"), F.lit(False)).cast("int")
    agg = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(ac).cast("bigint").alias("n_a"),
        F.sum(bc).cast("bigint").alias("n_b"),
        F.sum((ac == bc).cast("int")).cast("bigint").alias("n_agree"),
    )
    po = F.col("n_agree") / F.col("n")
    pe_num = F.col("n_a") * F.col("n_b") + (F.col("n") - F.col("n_a")) * (
        F.col("n") - F.col("n_b")
    )
    pe = pe_num / (F.col("n") * F.col("n"))
    r4 = lambda c: F.floor(c * 10000.0 + 0.5) / 10000.0  # noqa: E731
    return agg.select(
        "n", "n_a", "n_b", "n_agree",
        r4(po).alias("po"),
        r4(pe).alias("pe"),
        F.when(pe_num == F.col("n") * F.col("n"), F.lit(None).cast("double"))
        .otherwise(r4((po - pe) / (F.lit(1.0) - pe)))
        .alias("kappa"),
    )


def calibration_bins(
    df: DataFrame,
    score_micro: Column,
    label: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram for a [0,1] classifier score held in exact
    integer MICRO-units: decile bins, per-bin mean predicted score vs
    empirical positive rate, and the bin's ECE mass — everything BIGINT
    (integer div), so bit-identical across engines and partitionings.
    The calibration audit for every learned quality/toxicity filter a
    curation pipeline gates on.

    Returns (bin, n, mean_score_u, pos_rate_u, gap_u, ece_num) where
    ece_num = n * gap_u: Σ ece_num / Σ n is the corpus ECE in micro-units.
    One keyed aggregate; nothing shuffles but the n_bins-row result."""
    s = score_micro.cast("bigint")
    binned = df.select(
        s.alias("__s"), label.cast("int").alias("__y")
    ).select(
        F.least(
            F.expr(f"(__s * {n_bins}) div 1000000"), F.lit(n_bins - 1)
        ).cast("bigint").alias("bin"),
        "__s",
        "__y",
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__s").cast("bigint").alias("ss"),
        F.sum("__y").cast("bigint").alias("sy"),
    )
    mean_u = F.expr("ss div n")
    pos_u = F.expr("(sy * 1000000) div n")
    return agg.select(
        "bin",
        "n",
        mean_u.cast("bigint").alias("mean_score_u"),
        pos_u.cast("bigint").alias("pos_rate_u"),
        F.abs(mean_u - pos_u).cast("bigint").alias("gap_u"),
        (F.col("n") * F.abs(mean_u - pos_u)).cast("bigint").alias("ece_num"),
    )


def dp_laplace_noise_u(key: Column, epsilon: float, salt: str) -> Column:
    """Deterministic 'Laplace' noise in MICRO-units for differential-
    privacy-style count release: u ~ Uniform(0,1) derived from the
    portable 60-bit md5 hash of (salt || key), inverse-CDF transformed
    to Laplace(0, 1/ε). h maps to 1..999981 then divides by 999983, so
    u ∈ (0, 1) strictly: u = 0 (which would give ln(0) = -inf and an
    overflowing BIGINT cast — r5 ADVICE) is unreachable BY CONSTRUCTION,
    and u = 0.5 would need the non-integer numerator 999983/2. Same
    closed form on both engines; deterministic per key, which keeps the
    oracle exact — a production release would swap the hash for a real
    RNG."""
    from ..functions.text import hash64

    h = hash64(F.concat(F.lit(salt), key.cast("string")))
    u = ((h % F.lit(999981)) + F.lit(1)).cast("double") / F.lit(999983.0)
    centered = u - F.lit(0.5)
    mag = F.lit(1.0 / epsilon) * -F.log(
        F.lit(1.0) - F.lit(2.0) * F.abs(centered)
    )
    signed = F.when(centered < 0, -mag).otherwise(mag)
    return F.floor(signed * 1_000_000.0 + 0.5).cast("bigint")


def average_precision(
    df: DataFrame,
    group_col: str,
    score: Column,
    label: Column,
    id_col: str,
) -> DataFrame:
    """Per-group average precision (area under the precision-recall curve
    by the standard sum-over-positives estimator) — the companion to
    ``roc_auc`` for the imbalanced-label regime every curation classifier
    actually lives in (quality gates pass 1-10% of documents; ROC-AUC is
    blind to that asymmetry, AP is not).

    AP = (1/P) * sum over positives at rank i of precision@i, with the
    ranking pinned by (score DESC, id ASC) so score ties are
    deterministic on both engines.

    Cross-engine exactness: each precision term is floored to integer
    MICRO-units — term_i = (cum_pos_i * 1e6) div i — so the per-group sum
    is exact BIGINT arithmetic (any partitioning, any merge order), and
    the only float op is the final divide by n_pos, snapped with the
    house floor(x + 0.5)/1e6 idiom. AP is therefore computed on a 1e-6
    grid; the estimator bias is < 1e-6 * depth, irrelevant for ranking
    model candidates. NULL labels count as negative (coalesced before the
    cast — a bare cast would silently drop them from ranks).

    One window pass + one keyed agg — shuffles on group only.
    """
    base = df.select(
        F.col(group_col).alias("g"),
        score.cast("bigint").alias("s"),
        F.coalesce(label.cast("boolean"), F.lit(False)).cast("int").alias("y"),
        F.col(id_col).alias("__id"),
    )
    w = Window.partitionBy("g").orderBy(F.desc("s"), F.asc("__id"))
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    ranked = base.select(
        "g",
        "y",
        F.row_number().over(w).cast("bigint").alias("i"),
        F.sum("y").over(wc).cast("bigint").alias("cum_pos"),
    )
    agg = ranked.groupBy("g").agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(
                F.col("y") == 1,
                F.expr("(cum_pos * 1000000) div i"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("ap_micro_sum"),
    )
    return agg.select(
        "g",
        "n_pos",
        "n",
        F.when(
            F.col("n_pos") > 0,
            F.floor(F.col("ap_micro_sum") / F.col("n_pos") + 0.5) / 1000000.0,
        ).alias("ap"),
    )


def ndcg_discounts_micro(k: int) -> list[int]:
    """Frozen integer DCG discount table: disc_i = round(1e6 / log2(i+1))
    for ranks 1..k. Computed ONCE driver-side and embedded as literals in
    BOTH engines' plans — log2 lives in libm, whose last-ulp behavior is
    the one thing Spark (JVM Math) and DuckDB (C libm) do NOT share, so
    neither engine evaluates a logarithm at query time."""
    import math

    return [round(1_000_000 / math.log2(i + 1)) for i in range(1, k + 1)]


def ndcg_at_k(
    df: DataFrame,
    group_col: str,
    score: Column,
    rel: Column,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-group nDCG@k with GRADED relevance — the third leg of the
    ranking-eval family (roc_auc: balanced binary; average_precision:
    imbalanced binary; ndcg: graded, position-discounted — the metric
    retrieval/rerank stages are actually tuned on).

    DCG@k = sum over predicted ranks i<=k of rel_i * disc_i and
    IDCG@k the same over the ideal (rel-sorted) ranking, with disc_i
    from ``ndcg_discounts_micro`` — so both aggregates are EXACT BIGINT
    sums (partition-order independent) and the single float op is the
    final DCG/IDCG divide, snapped to the 1e-6 grid. Predicted ranking
    ties break on (score DESC, id ASC); the ideal ranking's tiebreak
    cannot affect IDCG (equal rel => equal term). Groups with zero
    relevant docs get NULL (0/0 is undefined, not 1.0 — an all-junk
    group must not score as perfectly ranked).

    Two window passes over the same shuffle key + one keyed agg.
    """
    disc = ndcg_discounts_micro(k)
    disc_arr = bigint_array(disc)
    base = df.select(
        F.col(group_col).alias("g"),
        score.cast("bigint").alias("s"),
        F.coalesce(rel.cast("bigint"), F.lit(0)).alias("rel"),
        F.col(id_col).alias("__id"),
    )
    w_pred = Window.partitionBy("g").orderBy(F.desc("s"), F.asc("__id"))
    w_ideal = Window.partitionBy("g").orderBy(F.desc("rel"), F.asc("__id"))
    ranked = base.select(
        "g",
        "rel",
        F.row_number().over(w_pred).alias("i_pred"),
        F.row_number().over(w_ideal).alias("i_ideal"),
    )
    term = lambda i: F.col("rel") * F.element_at(disc_arr, i)  # noqa: E731
    agg = ranked.groupBy("g").agg(
        F.sum(F.when(F.col("i_pred") <= k, term(F.col("i_pred"))).otherwise(0))
        .cast("bigint")
        .alias("dcg_micro"),
        F.sum(F.when(F.col("i_ideal") <= k, term(F.col("i_ideal"))).otherwise(0))
        .cast("bigint")
        .alias("idcg_micro"),
    )
    return agg.select(
        "g",
        "dcg_micro",
        "idcg_micro",
        F.when(
            F.col("idcg_micro") > 0,
            F.floor(F.col("dcg_micro") * 1000000.0 / F.col("idcg_micro") + 0.5)
            / 1000000.0,
        ).alias("ndcg"),
    )


def conformal_threshold(
    df: DataFrame,
    group_col: str,
    score: Column,
    id_col: str,
    alpha_num: int = 9,
    alpha_den: int = 10,
) -> DataFrame:
    """Split-conformal quantile threshold per group (Vovk; Angelopoulos &
    Bates 2022): the k-th smallest calibration score with
    k = ceil((n + 1) · α), which guarantees P(new score <= threshold) >= α
    for exchangeable data — the principled way to turn a quality/
    nonconformity score into a selective gate ("keep the top α mass")
    with a finite-sample guarantee instead of an eyeballed cutoff.

    Everything is exact integer arithmetic: α is the rational
    alpha_num/alpha_den, k = ceil(num·(n+1)/den) computed with integer
    ceiling division, the threshold is an order statistic (ties broken
    by id for a deterministic WITNESS row, though the VALUE is tie-free
    by definition), and the empirical coverage check cnt(s <= thr)/n is
    reported on the 1e-4 grid. Groups where k > n (too few calibration
    points for the requested level) return NULL threshold — undefined,
    not clamped.

    One window pass + one keyed agg + a broadcast-sized join back.
    """
    base = df.select(
        F.col(group_col).alias("g"),
        score.cast("bigint").alias("s"),
        F.col(id_col).alias("__id"),
    )
    w = Window.partitionBy("g").orderBy(F.asc("s"), F.asc("__id"))
    ranked = base.withColumn("rn", F.row_number().over(w))
    counts = ranked.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # k = ceil(num*(n+1)/den) as exact integer: (num*(n+1) + den - 1) div den
    k = F.expr(f"({alpha_num} * (n + 1) + {alpha_den} - 1) div {alpha_den}")
    kd = counts.select("g", "n", k.cast("bigint").alias("k"))
    thr = (
        ranked.join(F.broadcast(kd), "g")
        .filter(F.col("rn") == F.col("k"))
        .select("g", F.col("s").alias("threshold"))
    )
    cov = (
        base.join(F.broadcast(thr), "g")
        .groupBy("g")
        .agg(
            F.sum((F.col("s") <= F.col("threshold")).cast("int"))
            .cast("bigint")
            .alias("n_covered")
        )
    )
    return (
        kd.join(thr, "g", "left")
        .join(cov, "g", "left")
        .select(
            "g",
            "n",
            "k",
            "threshold",
            F.when(
                F.col("threshold").isNotNull(),
                F.floor(F.col("n_covered") * 10000.0 / F.col("n") + 0.5) / 10000.0,
            ).alias("coverage"),
        )
    )


def isotonic_bins(
    df: DataFrame,
    score_micro: Column,
    label: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Isotonic calibration of a binned classifier score (the remedy the
    ``calibration_bins`` audit calls for): the weighted least-squares
    monotone fit of the per-bin positive rate, via the EXACT minimax
    characterization iso_i = max_{j<=i} min_{k>=i} wmean(pos, j..k)
    (Robertson-Wright-Dykstra) instead of the sequential PAVA sweep —
    on n_bins rows the O(n³) minimax is trivial, embarrassingly
    parallel, and needs no order-dependent pooling loop, so both
    engines compute the identical unique solution from prefix sums.

    Everything up to the final rounding is exact: per-bin counts are
    one corpus-keyed aggregate (the ONLY pass over data — all later
    frames hold <= n_bins(n_bins+1)/2 rows), span means are
    (cy_k - cy_{j-1})·1e6 / (cn_k - cn_{j-1}) evaluated identically
    from identical integers, and iso_u = floor(minimax + 0.5).

    Returns (bin, n, pos_rate_u, iso_u) with iso_u non-decreasing —
    the law tests pin monotonicity, identity on already-monotone
    input, violator pooling to the weighted mean, and weighted-mass
    preservation.
    """
    s = score_micro.cast("bigint")
    binned = df.select(s.alias("__s"), label.cast("int").alias("__y")).select(
        F.least(F.expr(f"(__s * {n_bins}) div 1000000"), F.lit(n_bins - 1))
        .cast("bigint")
        .alias("bin"),
        "__y",
    )
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__y").cast("bigint").alias("sy"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wl = Window.orderBy("bin")
    # single-partition window over <= n_bins rows — the pareto_frontier
    # pattern: the corpus was already reduced by the keyed agg above.
    # The pre-span prefix is the PREVIOUS PRESENT bin's cumulative (lag),
    # NOT bin-1: empty bins leave gaps in the id sequence, and a bin-1
    # join silently coalesces a missing neighbor to zero — caught by the
    # mass-preservation LAW test, invisible to the differential (both
    # engines shared the bug: the kcore lesson again).
    pre = bins.select(
        "bin",
        F.sum("n").over(w).cast("bigint").alias("cn"),
        F.sum("sy").over(w).cast("bigint").alias("cy"),
    ).select(
        "bin",
        "cn",
        "cy",
        F.coalesce(F.lag("cn").over(wl), F.lit(0)).cast("bigint").alias("pcn"),
        F.coalesce(F.lag("cy").over(wl), F.lit(0)).cast("bigint").alias("pcy"),
    )
    j, k = pre.alias("j"), pre.alias("k")
    spans = j.join(k, F.col("k.bin") >= F.col("j.bin")).select(
        F.col("j.bin").alias("sj"),
        F.col("k.bin").alias("sk"),
        (
            (F.col("k.cy") - F.col("j.pcy"))
            * 1000000.0
            / (F.col("k.cn") - F.col("j.pcn"))
        ).alias("a"),
    )
    mij = (
        bins.select("bin")
        .join(spans, (F.col("sj") <= F.col("bin")) & (F.col("sk") >= F.col("bin")))
        .groupBy("bin", "sj")
        .agg(F.min("a").alias("m"))
    )
    iso = mij.groupBy("bin").agg(
        F.floor(F.max("m") + 0.5).cast("bigint").alias("iso_u")
    )
    return (
        bins.join(iso, "bin")
        .select(
            "bin",
            "n",
            F.expr("(sy * 1000000) div n").cast("bigint").alias("pos_rate_u"),
            "iso_u",
        )
    )


def theil_sen_slope(
    df: DataFrame,
    group_col: str,
    x: Column,
    y_micro: Column,
) -> DataFrame:
    """Per-group Theil-Sen trend: the LOWER MEDIAN of all pairwise slopes
    (y_j - y_i) div (x_j - x_i), in the SAME micro-units as ``y_micro``
    per unit x (y arrives micro-scaled, so the quotient already carries
    1e-6 resolution — no further scaling) — the robust complement to the OLS
    trend (``q_user_trend_slope``): one wild day moves an OLS slope
    arbitrarily; Theil-Sen tolerates ~29% outliers (breakdown point),
    which is what per-user engagement series actually contain (refund
    spikes, bot bursts).

    Exactness: per-pair slope = truncating integer division of exact
    int64s (Spark ``div`` and DuckDB ``//`` both truncate toward zero —
    verified on negative operands), so every candidate is an exact
    integer; the lower median (rank ceil(m/2)) is
    an order statistic with (slope, x_i, x_j) tiebreak — deterministic
    on both engines, no averaging of middle pairs (which would
    reintroduce a float).

    Scale shape: the pair join is WITHIN group (x_i < x_j after
    per-group daily pre-aggregation), so candidate volume is bounded by
    per-key history length squared — per-user series are days, not
    events; the shuffle is keyed on group twice (pair build, order
    stat). Groups with < 2 distinct x are excluded (undefined).
    """
    pts = df.select(
        F.col(group_col).alias("g"),
        x.cast("bigint").alias("x"),
        y_micro.cast("bigint").alias("y"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    pairs = a.join(
        b, (F.col("a.g") == F.col("b.g")) & (F.col("a.x") < F.col("b.x"))
    ).select(
        F.col("a.g").alias("g"),
        F.col("a.x").alias("xi"),
        F.col("b.x").alias("xj"),
        F.expr("(b.y - a.y) div (b.x - a.x)").cast("bigint").alias("sl"),
    )
    w = Window.partitionBy("g").orderBy("sl", "xi", "xj")
    ranked = pairs.withColumn("rn", F.row_number().over(w))
    m = pairs.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    # lower median rank = ceil(m / 2) = (m + 1) div 2
    return (
        ranked.join(F.broadcast(m), "g")
        .filter(F.col("rn") == F.expr("(m + 1) div 2"))
        .select("g", "m", F.col("sl").alias("slope_u"))
    )


def wasserstein_1d(
    df: DataFrame,
    group_col: str,
    value_micro: Column,
    is_a: Column,
) -> DataFrame:
    """Per-group 1-D Wasserstein-1 (earth mover's) distance between the
    ``is_a`` rows (sample A) and the rest (sample B) — the magnitude-aware
    complement to ``ks_statistic``: KS reports the single worst CDF gap
    (shape shift), W1 integrates |F_A - F_B| over the whole support, so a
    small-but-everywhere drift (e.g. a +2% price rescale) that barely moves
    the max gap still moves the mass. The standard distribution-drift pair
    a feature-monitoring stack reports together.

    Exact arithmetic: with values in integer micro-units, W1 =
    (1/(na*nb)) * sum over adjacent distinct values of
    |ca*nb - cb*na| * (v_next - v), where ca/cb are cumulative counts —
    every term is an exact BIGINT product (cross-multiplied CDFs, same
    idiom as ``ks_statistic``), one float divide at the end.
    ``w1_num`` is the exact integer numerator in micro-value units.

    Scale shape: one keyed shuffle (cumulative window over the group),
    a lead() for the gap — no pair join, O(n log n) per group.
    """
    base = df.select(
        F.col(group_col),
        value_micro.cast("bigint").alias("__vm"),
        F.when(is_a, F.lit(1)).otherwise(F.lit(0)).alias("__a"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("__vm")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        base.withColumn("ca", F.sum("__a").over(w))
        .withColumn("cb", F.sum(1 - F.col("__a")).over(w))
        .groupBy(group_col, "__vm")
        .agg(F.max("ca").alias("ca"), F.max("cb").alias("cb"))
    )
    lead_w = Window.partitionBy(group_col).orderBy("__vm")
    gaps = cum.withColumn("nxt", F.lead("__vm").over(lead_w)).filter(
        F.col("nxt").isNotNull()
    )
    tot = base.groupBy(group_col).agg(
        F.sum("__a").cast("bigint").alias("n_a"),
        F.sum(1 - F.col("__a")).cast("bigint").alias("n_b"),
    )
    gsum = (
        gaps.join(F.broadcast(tot), group_col)
        .groupBy(group_col)
        .agg(
            F.sum(
                F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a"))
                * (F.col("nxt") - F.col("__vm"))
            )
            .cast("bigint")
            .alias("w1_num")
        )
    )
    # LEFT join from totals: a group whose values are ALL identical has no
    # support gaps at all — its distance is exactly 0, not a missing row
    # (degenerate case found by the Hypothesis property test; the DuckDB
    # twin shared the inner-join bug, so the differential was blind to it)
    return (
        tot.join(gsum, group_col, "left")
        .select(
            group_col,
            "n_a",
            "n_b",
            F.coalesce("w1_num", F.lit(0)).cast("bigint").alias("w1_num"),
            F.round(
                F.coalesce("w1_num", F.lit(0)).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
                / 1000000.0,
                6,
            ).alias("w1"),
        )
    )


def kendall_tau(
    df: DataFrame,
    group_col: str,
    x: Column,
    y: Column,
) -> DataFrame:
    """Per-group Kendall tau-b rank correlation: concordant minus
    discordant pairs over the geometric mean of tie-corrected pair counts
    — the third leg of the correlation family (Pearson ``stats_corr``:
    linear; Spearman: monotone via ranks; Kendall: pairwise order
    agreement, the most robust to outliers and the one with a direct
    probabilistic reading P(concordant) - P(discordant)).

    Exactness: C, D, and the tie counts are exact BIGINT pair counts from
    an x_i < x_j self-join (ties in x handled by the tie terms — pairs
    with equal x contribute to t_x only, counted separately so the
    i<j-on-x join can't miss them); tau_b's single sqrt+divide happens
    once at the end, rounded to 6 dp. Pair volume is within-group
    squared, the theil_sen bound — use on pre-aggregated series, not raw
    events.

    Returns (g, n, concordant, discordant, tau_b).
    """
    pts = df.select(
        F.col(group_col).alias("g"),
        x.cast("bigint").alias("x"),
        y.cast("bigint").alias("y"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    # all unordered pairs exactly once: order by (x, y) lexicographically
    # with a strict <, plus equal-(x,y) pairs counted combinatorially below
    pairs = a.join(
        b,
        (F.col("a.g") == F.col("b.g"))
        & (
            (F.col("a.x") < F.col("b.x"))
            | ((F.col("a.x") == F.col("b.x")) & (F.col("a.y") < F.col("b.y")))
        ),
    ).select(
        F.col("a.g").alias("g"),
        (F.col("a.x") < F.col("b.x")).cast("int").alias("dx"),
        F.when(F.col("b.y") > F.col("a.y"), 1)
        .when(F.col("b.y") < F.col("a.y"), -1)
        .otherwise(0)
        .alias("sy"),
    )
    counts = pairs.groupBy("g").agg(
        F.sum(((F.col("dx") == 1) & (F.col("sy") == 1)).cast("bigint")).alias("c"),
        F.sum(((F.col("dx") == 1) & (F.col("sy") == -1)).cast("bigint")).alias("d"),
        F.sum(((F.col("dx") == 1) & (F.col("sy") == 0)).cast("bigint")).alias("ty_only"),
        F.sum((F.col("dx") == 0).cast("bigint")).alias("tx_only_strict_y"),
    )
    # duplicate (x,y) points: neither the strict join above nor the tie
    # terms see them — count them once combinatorially
    dup = (
        pts.groupBy("g", "x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
        .groupBy("g")
        .agg(F.sum(F.expr("(k * (k - 1)) div 2")).cast("bigint").alias("txy"))
    )
    n = pts.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    out = counts.join(dup, "g").join(F.broadcast(n), "g")
    n0 = F.expr("(n * (n - 1)) div 2").cast("bigint")
    # pairs tied in x: strict-y ties-in-x + duplicate points; same for y
    tx = F.col("tx_only_strict_y") + F.col("txy")
    ty = F.col("ty_only") + F.col("txy")
    den = F.sqrt((n0 - tx).cast("double") * (n0 - ty).cast("double"))
    return out.select(
        "g",
        "n",
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.when(
            (n0 - tx > 0) & (n0 - ty > 0),
            F.round((F.col("c") - F.col("d")).cast("double") / den, 6),
        ).alias("tau_b"),
    )


def mean_reciprocal_rank(
    df: DataFrame,
    group_col: str,
    score: Column,
    label: Column,
    id_col: str,
) -> DataFrame:
    """Per-group Mean Reciprocal Rank — here "mean" over groups is left to
    the caller; this returns each group's reciprocal rank of the FIRST
    relevant item under the score ranking (the navigational-search eval:
    "how deep is the first hit?"), completing the ranking-eval family
    (ROC-AUC: balanced binary; AP: imbalanced binary; nDCG: graded;
    MRR: first-hit).

    Exactness: rr_micro = 1000000 div rank — an exact truncating integer
    division on both engines; groups with no relevant item return rank
    NULL and rr_micro 0 (the standard MRR convention: a query with no hit
    contributes zero, not undefined — unlike nDCG's 0/0 case).
    """
    ranked = df.select(
        F.col(group_col).alias("g"),
        score.cast("bigint").alias("s"),
        label.cast("int").alias("rel"),
        F.col(id_col).alias("id"),
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("g").orderBy(F.desc("s"), F.asc("id"))
        ),
    )
    first = ranked.filter(F.col("rel") == 1).groupBy("g").agg(
        F.min("rank").cast("bigint").alias("first_rank")
    )
    groups = ranked.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return groups.join(first, "g", "left").select(
        "g",
        "n",
        F.col("first_rank"),
        F.coalesce(
            F.expr("1000000 div first_rank"), F.lit(0).cast("bigint")
        ).alias("rr_micro"),
    )


def autocorrelation(
    df: DataFrame,
    x: Column,
    y: Column,
    max_lag: int = 7,
) -> DataFrame:
    """Autocorrelation function of a single regularly-indexed series at
    lags 1..max_lag: r_k = sum_t (y_t - m)(y_{t+k} - m) / sum_t (y_t - m)^2
    — the seasonality/memory profile of a pipeline's daily volume (a
    weekly ingest cadence shows as a spike at lag 7; a white-noise series
    shows none), feeding anomaly baselines and forecast sanity checks.

    Exactness: means never materialize as floats — both sums are computed
    N-scaled: num_k = sum (N*y_t - S)(N*y_{t+k} - S) and
    den = sum (N*y_t - S)^2 where S = sum y. The products can exceed
    int64 for long/large series, so accumulation is DECIMAL(38,0)
    (Spark) / HUGEINT (DuckDB oracle) — exact integers, order-independent
    (the covariance_matrix idiom). One float divide per lag at the end.
    ``x`` must be the series index (gaps allowed: lag k pairs are matched
    on x_j - x_i = k exactly, not row adjacency).
    """
    from ingestion_scripts_spark.caching import persist_tracked

    # the per-index series is tiny (days, not facts) but referenced by
    # stats + both sides of the lag join + the denominator — without a
    # persist the FACT table upstream is re-scanned five times (measured
    # in the physical plan); with it, once.
    pts = persist_tracked(
        df.select(x.cast("bigint").alias("x"), y.cast("bigint").alias("y"))
    )
    stats = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    centered = persist_tracked(
        pts.crossJoin(F.broadcast(stats)).select(
            "x",
            "n",
            # cast BEFORE the multiply: bigint*bigint can overflow int64
            # for long/large series; decimal(38,0) arithmetic is exact
            (
                F.col("y").cast("decimal(38,0)") * F.col("n") - F.col("s")
            ).cast("decimal(38,0)").alias("c"),
        )
    )
    den = centered.agg(
        F.sum(F.col("c") * F.col("c")).cast("decimal(38,0)").alias("den"),
        F.max("n").alias("n"),
    )
    a, b = centered.alias("a"), centered.alias("b")
    # ONE range join covers every lag; group by the x-distance. The series
    # is a pre-aggregated daily index (thousands of rows), so the join is
    # a broadcast-scale range probe, not a shuffle problem.
    nums = (
        a.join(
            b,
            (F.col("b.x") - F.col("a.x") >= 1)
            & (F.col("b.x") - F.col("a.x") <= max_lag),
        )
        .groupBy((F.col("b.x") - F.col("a.x")).cast("bigint").alias("lag"))
        .agg(
            F.sum(F.expr("a.c * b.c")).cast("decimal(38,0)").alias("num"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )
    return nums.crossJoin(F.broadcast(den)).select(
        "lag",
        "n_pairs",
        F.when(
            F.col("den") > 0,
            F.round(
                F.col("num").cast("double") / F.col("den").cast("double"), 6
            ),
        ).alias("acf"),
    )


def seasonal_decompose_daily(
    df: DataFrame,
    x: Column,
    y: Column,
    period: int = 7,
) -> DataFrame:
    """Division-free STL-lite decomposition of a daily series into trend /
    seasonal / residual — the classical moving-average decomposition
    (trend = centered (period)-day MA, seasonal = per-phase mean of the
    detrended series), the sanity layer under anomaly alerts: a "spike"
    that is pure weekday seasonality should page nobody.

    Exactness: NO component ever divides early — the detrended series is
    kept PERIOD-SCALED: detrended_s = period*y - sum_window(y) (exact
    BIGINT); the seasonal term is the truncating integer division of the
    per-phase sum by its count (both engines truncate); residual_s =
    detrended_s - seasonal_s. Consumers divide by ``period`` once at
    read time if they want natural units.

    Gap-safe: the window is RANGE-based on the integer index, so a day
    missing from the input cannot silently shift the window to non-
    adjacent days; rows whose centered window is incomplete (edges, gaps)
    carry NULL trend and are excluded from the seasonal fit.

    Returns (x, y, trend_sum, phase, detrended_s, seasonal_s, residual_s).
    """
    half = period // 2
    pts = df.select(x.cast("bigint").alias("x"), y.cast("bigint").alias("y"))
    w = Window.orderBy("x").rangeBetween(-half, half)
    t = pts.withColumn("win_n", F.count(F.lit(1)).over(w)).withColumn(
        "trend_sum",
        F.when(F.col("win_n") == period, F.sum("y").over(w)).cast("bigint"),
    )
    det = t.withColumn(
        "detrended_s",
        F.when(
            F.col("trend_sum").isNotNull(),
            F.lit(period) * F.col("y") - F.col("trend_sum"),
        ).cast("bigint"),
    ).withColumn("phase", (F.col("x") % period).cast("bigint"))
    seas = (
        det.filter(F.col("detrended_s").isNotNull())
        .groupBy("phase")
        .agg(
            F.sum("detrended_s").cast("bigint").alias("ssum"),
            F.count(F.lit(1)).cast("bigint").alias("scnt"),
        )
        .select("phase", F.expr("ssum div scnt").cast("bigint").alias("seasonal_s"))
    )
    return (
        det.join(F.broadcast(seas), "phase", "left")
        .select(
            "x",
            "y",
            "trend_sum",
            "phase",
            "detrended_s",
            F.when(F.col("detrended_s").isNotNull(), F.col("seasonal_s"))
            .cast("bigint")
            .alias("seasonal_s"),
            F.when(
                F.col("detrended_s").isNotNull(),
                F.col("detrended_s") - F.col("seasonal_s"),
            )
            .cast("bigint")
            .alias("residual_s"),
        )
    )


def fano_factor(
    df: DataFrame,
    group_col: str,
    y: Column,
) -> DataFrame:
    """Per-group Fano factor (variance-to-mean ratio) of a count series —
    the burstiness index: 1 for Poisson arrivals, >> 1 for bursty bots /
    batch replays, < 1 for rate-limited (sub-Poisson) traffic. The
    distributional complement to bot_burst_users' threshold rule.

    Division-free core: var = sum((N*y - S)^2) / N^3 and mean = S/N, so
    var/mean = sum((N*y - S)^2) / (N^2 * S) — numerator and denominator
    are exact BIGINTs (counts are small; N*y bounded by group volume),
    ONE float divide at the end. Groups with S = 0 are NULL (undefined),
    not 0.
    """
    pts = df.select(F.col(group_col).alias("g"), y.cast("bigint").alias("y"))
    tot = pts.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    num = (
        pts.join(F.broadcast(tot), "g")
        .select(
            "g",
            ((F.col("y") * F.col("n") - F.col("s"))
             * (F.col("y") * F.col("n") - F.col("s"))).alias("sq"),
        )
        .groupBy("g")
        .agg(F.sum("sq").cast("bigint").alias("var_num"))
    )
    return num.join(tot, "g").select(
        "g",
        "n",
        "s",
        "var_num",
        F.when(
            F.col("s") > 0,
            F.round(
                F.col("var_num").cast("double")
                / (F.col("n") * F.col("n") * F.col("s")).cast("double"),
                6,
            ),
        ).alias("fano"),
    )


def brier_decomposition(
    df: DataFrame,
    score_u: Column,
    label: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Murphy decomposition of the Brier score — BRIER = RELIABILITY -
    RESOLUTION + UNCERTAINTY — for a [0,1] probability score held in
    integer micro-units: the one-row summary behind calibration_bins'
    per-bin diagram (REL: how far bin means sit from bin outcomes; RES:
    how much the bins separate outcomes; UNC: base-rate variance, the
    unbeatable floor).

    Exactness: brier_num = sum((s - y*1e6)^2) and the per-bin reliability
    numerators (Sp_b - So_b*1e6)^2 div n_b are exact BIGINTs (truncating
    division, both engines); UNC = So*(N-So) exact; each reported float
    is ONE divide of exact integers rounded to 6 dp, and RESOLUTION is
    DERIVED from the identity (res = rel - brier + unc) so the
    decomposition reconciles bit-for-bit by construction.

    Scale shape: one pass over the facts (map-side-combinable aggregate
    keyed by bin), then arithmetic over <= n_bins rows.
    """
    base = df.select(
        score_u.cast("bigint").alias("s"),
        label.cast("int").cast("bigint").alias("y"),
    )
    binned = base.select(
        "s",
        "y",
        F.least(
            F.expr(f"(s * {n_bins}) div 1000000"), F.lit(n_bins - 1)
        ).cast("bigint").alias("bin"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("s").cast("bigint").alias("sp"),
        F.sum("y").cast("bigint").alias("so"),
        F.sum(
            (F.col("s") - F.col("y") * F.lit(1_000_000))
            * (F.col("s") - F.col("y") * F.lit(1_000_000))
        )
        .cast("bigint")
        .alias("brier_num_b"),
    )
    agg = per_bin.agg(
        F.sum("n_b").cast("bigint").alias("n"),
        F.sum("so").cast("bigint").alias("so"),
        F.sum("brier_num_b").cast("bigint").alias("brier_num"),
        F.sum(
            F.expr(
                "((sp - so * 1000000) * (sp - so * 1000000)) div n_b"
            )
        )
        .cast("bigint")
        .alias("rel_num"),
    )
    brier = F.col("brier_num").cast("double") / (
        F.col("n").cast("double") * 1e12
    )
    rel = F.col("rel_num").cast("double") / (F.col("n").cast("double") * 1e12)
    unc = (F.col("so") * (F.col("n") - F.col("so"))).cast("double") / (
        F.col("n").cast("double") * F.col("n").cast("double")
    )
    return agg.select(
        "n",
        "so",
        "brier_num",
        "rel_num",
        F.round(brier, 6).alias("brier"),
        F.round(rel, 6).alias("reliability"),
        F.round(rel - brier + unc, 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
    )


def pinball_loss(
    df: DataFrame,
    group_col: str,
    y: Column,
    q_num: int = 9,
    q_den: int = 10,
) -> DataFrame:
    """Per-group pinball (quantile) loss of the group's own q-quantile
    order statistic as a constant predictor — the eval that makes a
    quantile claim FALSIFIABLE: the q-th order statistic minimizes
    pinball loss, so any cheaper "quantile" (sampled, sketched,
    interpolated) can be scored against this floor in the same units.

    Exactness: yhat is the rank-ceil(q*n) order statistic (deterministic,
    no interpolation — the robust_zscore precedent); the loss sum is
    q_den-scaled so every contribution is an exact BIGINT:
    q_den * pinball = q_num*(y - yhat) for y >= yhat else
    (q_den - q_num)*(yhat - y). One float divide for the mean.

    Returns (g, n, yhat, loss_sum_scaled, mean_loss).
    """
    pts = df.select(F.col(group_col).alias("g"), y.cast("bigint").alias("y"))
    w = Window.partitionBy("g").orderBy("y")
    ranked = pts.withColumn("rn", F.row_number().over(w))
    n = pts.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    yhat = (
        ranked.join(F.broadcast(n), "g")
        .filter(F.col("rn") == F.expr(f"({q_num} * n + {q_den} - 1) div {q_den}"))
        .select("g", F.col("y").alias("yhat"))
    )
    scored = pts.join(F.broadcast(yhat), "g").select(
        "g",
        F.when(
            F.col("y") >= F.col("yhat"),
            F.lit(q_num) * (F.col("y") - F.col("yhat")),
        )
        .otherwise(F.lit(q_den - q_num) * (F.col("yhat") - F.col("y")))
        .alias("contrib"),
    )
    out = scored.groupBy("g").agg(
        F.sum("contrib").cast("bigint").alias("loss_sum_scaled")
    )
    return (
        out.join(yhat, "g")
        .join(n, "g")
        .select(
            "g",
            "n",
            "yhat",
            "loss_sum_scaled",
            F.round(
                F.col("loss_sum_scaled").cast("double")
                / (F.col("n").cast("double") * float(q_den)),
                6,
            ).alias("mean_loss"),
        )
    )


def decile_lift(
    df: DataFrame,
    score: Column,
    label: Column,
    id_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Cumulative gains / lift table for a ranking score — the
    campaign-targeting eval ("the top 20% of the ranking captures X% of
    the positives, lift L vs random"): the population-decile companion to
    ROC-AUC (threshold-free) and calibration_bins (value-binned).

    Exactness: deciles come from the deterministic (score desc, id) row
    rank — decile = ((rn-1) * n_buckets) div n, so bucket sizes are exact
    and engine-stable even with massive score ties; cumulative counts are
    window sums; lift_micro = (cum_pos * n * 1e6) div (cum_n * total_pos)
    is one truncating integer division. Rows: one per decile.

    Scale (VERDICT r7/r8 item 1): the rank is the DISTRIBUTED
    ``operators/ranking.py::global_rank`` (range-partition → parallel
    per-slice sort → broadcast offset join), not an unpartitioned
    ``row_number`` window — no single-partition sort of the corpus at
    any scale. The only unpartitioned window left is the cumulative sum
    over ≤ n_buckets post-aggregate rows.
    """
    from ingestion_scripts_spark.operators.ranking import global_rank

    base = df.select(
        score.cast("bigint").alias("s"),
        label.cast("int").cast("bigint").alias("y"),
        F.col(id_col).alias("id"),
    )
    ranked = global_rank(base, [F.desc("s"), F.asc("id")], "rn")
    # totals off the rank's checkpoint (n ≡ max rn) — no second source scan
    tot = ranked.agg(
        F.max("rn").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("p"),
    )
    bucketed = ranked.crossJoin(F.broadcast(tot)).select(
        F.expr(f"((rn - 1) * {n_buckets}) div n").cast("bigint").alias("decile"),
        "y",
        "n",
        "p",
    )
    per = bucketed.groupBy("decile", "n", "p").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_d"),
        F.sum("y").cast("bigint").alias("pos_d"),
    )
    cw = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.withColumn("cum_n", F.sum("n_d").over(cw).cast("bigint")).withColumn(
        "cum_pos", F.sum("pos_d").over(cw).cast("bigint")
    )
    return cum.select(
        "decile",
        "n_d",
        "pos_d",
        "cum_n",
        "cum_pos",
        F.when(
            F.col("p") > 0,
            F.expr("(cum_pos * n * 1000000) div (cum_n * p)"),
        )
        .cast("bigint")
        .alias("lift_micro"),
    ).orderBy("decile")


def conditional_entropy(
    df: DataFrame,
    prev_col: str,
    next_col: str,
) -> DataFrame:
    """Per-state conditional entropy H(next | prev = u) of a transition
    table, in nano-nats — the predictability profile of event sequences
    (a state whose successors are near-uniform is where sessions lose
    structure; the entropy-rate companion to the Markov transition
    matrix and the sequence analog of char_entropy).

    Exactness: per-cell contribution -(n_uv/n_u) * ln(n_uv/n_u) is the
    mutual_information snap idiom — identical IEEE sequence over exact
    BIGINTs on both engines, snapped to nano-units immediately, so each
    state's total is an order-independent integer SUM. Also returns the
    state's weight for the corpus entropy rate
    sum_u (n_u/N) * H(next|u), which the caller can form exactly from
    (h_nano, n_u, N).
    """
    cells = df.groupBy(prev_col, next_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("nuv")
    )
    from ingestion_scripts_spark.caching import persist_tracked

    cells = persist_tracked(cells)
    nu = cells.groupBy(prev_col).agg(F.sum("nuv").cast("bigint").alias("nu"))
    contrib = cells.join(nu, prev_col).withColumn(
        "h_nano_uv",
        F.floor(
            -(F.col("nuv").cast("double") / F.col("nu").cast("double"))
            * F.log(F.col("nuv").cast("double") / F.col("nu").cast("double"))
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("bigint"),
    )
    return (
        contrib.groupBy(prev_col)
        .agg(
            F.max("nu").cast("bigint").alias("n_u"),
            F.count(F.lit(1)).cast("bigint").alias("n_successors"),
            F.sum("h_nano_uv").cast("bigint").alias("h_nano"),
        )
        .orderBy(prev_col)
    )


def mann_kendall(
    df: DataFrame,
    t_col: str,
    v_col: str,
) -> DataFrame:
    """Mann-Kendall trend test over an ordered series — the
    non-parametric "is this metric drifting?" monitor (the rank-based
    companion to theil_sen_slope's magnitude estimate): S = Σ_{i<j}
    sign(v_j − v_i), tie-corrected variance, and the normal-approx
    z-statistic.

    Input: one row per time point (ALREADY aggregated to series grain —
    days/hours — so the i<j pair join is bounded by grain², constant in
    corpus size; the acf_daily/seasonal precedent). Exactness: S and
    var18 = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5) (= 18·Var[S]) are exact
    BIGINTs from integer pair counts; z_micro = floor(z·1e6 + 0.5) with
    z = (S∓1)/sqrt(var18/18.0) — IEEE sqrt is correctly rounded, so the
    identical expression on both engines yields the identical double.
    Returns one row: (n_points, s_stat, var18, z_micro).
    """
    pts = df.select(F.col(t_col).alias("t"), F.col(v_col).cast("bigint").alias("v"))
    a, b = pts.alias("a"), pts.alias("b")
    pair = a.join(b, F.col("a.t") < F.col("b.t")).select(
        F.signum((F.col("b.v") - F.col("a.v")).cast("double"))
        .cast("bigint")
        .alias("sgn")
    )
    s = pair.agg(F.sum("sgn").cast("bigint").alias("s_stat"))
    n1 = pts.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ties = (
        pts.groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tn"))
        .agg(
            F.coalesce(
                F.sum(
                    F.expr("tn * (tn - 1) * (2 * tn + 5)")
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    return (
        n1.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").alias("n_points"),
            "s_stat",
            (
                F.expr("n * (n - 1) * (2 * n + 5)") - F.col("tie_term")
            )
            .cast("bigint")
            .alias("var18"),
        )
        .select(
            "n_points",
            "s_stat",
            "var18",
            F.when(F.col("var18") <= 0, F.lit(0).cast("bigint"))
            .otherwise(
                F.floor(
                    (
                        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
                        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
                        .otherwise(F.lit(0))
                        .cast("double")
                        / F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
                    )
                    * F.lit(1000000.0)
                    + F.lit(0.5)
                ).cast("bigint")
            )
            .alias("z_micro"),
        )
    )


def weighted_median_by_key(
    df: DataFrame,
    key_col: str,
    value_col: str,
    weight_col: str,
    tiebreak_cols: list[str],
) -> DataFrame:
    """Exact lower weighted median per key: the smallest value v in the
    key's multiset whose cumulative weight (under value asc, tiebreak
    asc order) reaches half the key's total weight — 2·cum ≥ W, the
    integer form that needs no division. The robust "typical value"
    when observations carry mass (revenue-weighted quantity, token
    -weighted score): a 50%-mass outlier moves the weighted median
    where the row median ignores it.

    Exactness: weights must be exact non-negative integers; the
    crossing test 2·cum ≥ W is pure BIGINT; ties on value are resolved
    by taking min(value) over crossing rows (the crossing row's value —
    cum is monotone along the order). Returns (key, w_total, median_v).

    Scale: ONE partitioned window (partitionBy key) — uniform
    parallelism when keys are high-cardinality (per-part, per-user);
    for 3-key grades use a high-cardinality key or pre-aggregate. Then
    one groupBy min — map-side combinable.
    """
    order = [F.asc("v")] + [F.asc(c) for c in tiebreak_cols]
    w = (
        Window.partitionBy("k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("k")
    scored = df.select(
        F.col(key_col).alias("k"),
        F.col(value_col).cast("bigint").alias("v"),
        F.col(weight_col).cast("bigint").alias("wgt"),
        *[F.col(c) for c in tiebreak_cols],
    ).select(
        "k",
        "v",
        F.sum("wgt").over(w).cast("bigint").alias("cum"),
        F.sum("wgt").over(wt).cast("bigint").alias("w_total"),
    )
    return (
        scored.filter(F.lit(2) * F.col("cum") >= F.col("w_total"))
        .groupBy("k")
        .agg(
            F.max("w_total").cast("bigint").alias("w_total"),
            F.min("v").cast("bigint").alias("median_v"),
        )
        .orderBy("k")
    )


def market_concentration(
    df: DataFrame,
    market_col: str,
    seller_col: str,
    revenue_col: Column,
    top_k: int = 4,
) -> DataFrame:
    """Per-market concentration: Herfindahl–Hirschman index and the
    CR_k top-seller share — the auditor's "is this corpus dominated by
    a few sources?" readout (applied to training data: share of tokens
    per domain within a language bucket).

    Exactness: revenue_col must be an exact integer scaled so that
    Σr² · 1e6 fits BIGINT (the caller picks the unit — see the registry
    query's k$-unit note). hhi_ppm = (Σ r_i² · 1e6) div (Σ r_i)²,
    cr_ppm = (Σ top-k r_i · 1e6) div Σ r_i; both single truncating
    divisions over exact integers. Returns
    (market, n_sellers, r_total, hhi_ppm, cr_ppm).

    Scale: seller revenue = one map-side-combinable groupBy; everything
    after runs on the POST-AGGREGATE (market, seller) frame — dim-sized,
    not corpus-sized — so the per-market ranking window is bounded and
    the final per-market aggregate trivial.
    """
    per_seller = df.groupBy(
        F.col(market_col).alias("mkt"), F.col(seller_col).alias("seller")
    ).agg(revenue_col.cast("bigint").alias("r"))
    w = Window.partitionBy("mkt").orderBy(F.desc("r"), F.asc("seller"))
    ranked = per_seller.withColumn("pos", F.row_number().over(w))
    return (
        ranked.groupBy("mkt")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sellers"),
            F.sum("r").cast("bigint").alias("r_total"),
            F.sum(F.col("r") * F.col("r")).cast("bigint").alias("r_sq_sum"),
            F.sum(F.when(F.col("pos") <= top_k, F.col("r")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("top_r"),
        )
        .select(
            F.col("mkt").alias("market"),
            "n_sellers",
            "r_total",
            F.expr("(r_sq_sum * 1000000) div (r_total * r_total)")
            .cast("bigint")
            .alias("hhi_ppm"),
            F.expr("(top_r * 1000000) div r_total")
            .cast("bigint")
            .alias("cr_ppm"),
        )
        .orderBy("market")
    )


def seasonal_naive_mase(
    df: DataFrame,
    t_col: str,
    v_col: str,
    season: int = 7,
) -> DataFrame:
    """Mean Absolute Scaled Error (Hyndman & Koehler 2006) of the
    seasonal-naive forecast v̂_t = v_{t−season} against the one-step
    naive in-sample scale mean|v_t − v_{t−1}| — the scale-free "does
    this series even have weekly structure worth modeling?" backtest
    (MASE < 1e6 micro ⟺ the seasonal forecast beats the naive walk).

    Input: one row per time point at series grain (bounded post-agg
    frame — days/hours). Lags are ROW lags on the (t_col asc) order, so
    calendar gaps behave like the ACF/seasonal kernels. Exactness: both
    error sums are exact BIGINTs; mase_micro is computed in TWO
    truncating steps — ``((Σ|e_season|·1e6) div Σ|e_1|) · (n−1) div
    (n−season)`` — the overflow-safe form (COVERAGE.md): dividing before
    the (n−1) multiply keeps every intermediate ≤ ~1e6·Σ|e_s|, at the
    cost of up to (n−1)/(n−season) extra truncation error vs the
    single-division ideal (< 1 micro-unit at daily grain). NULL when the
    series is shorter than season+1 or the naive scale is zero. The SQL
    twin and tests/test_r9_properties.py pin this exact two-step form.
    Returns one row: (n_points, sum_abs_e1, sum_abs_es, mase_micro).
    """
    w = Window.orderBy(t_col)  # bounded: series grain, post-aggregate
    lagged = df.select(
        F.col(v_col).cast("bigint").alias("v"),
        F.lag(F.col(v_col).cast("bigint"), 1).over(w).alias("v1"),
        F.lag(F.col(v_col).cast("bigint"), season).over(w).alias("vs"),
    )
    return lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum(F.abs(F.col("v") - F.col("v1"))).cast("bigint").alias("sum_abs_e1"),
        F.sum(F.abs(F.col("v") - F.col("vs"))).cast("bigint").alias("sum_abs_es"),
    ).select(
        "n_points",
        "sum_abs_e1",
        "sum_abs_es",
        F.when(
            (F.col("n_points") > season) & (F.col("sum_abs_e1") > 0),
            F.expr(
                f"(((sum_abs_es * 1000000) div sum_abs_e1)"
                f" * (n_points - 1)) div (n_points - {season})"
            ),
        )
        .cast("bigint")
        .alias("mase_micro"),
    )


def calibration_drift(
    df: DataFrame,
    bucket: Column,
    score_micro: Column,
    label: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Quality-classifier calibration DRIFT over time buckets (VERDICT
    r11 item 5): :func:`calibration_bins` per bucket, each bucket's ECE,
    and the reliability-curve distance to the corpus's FIRST bucket —
    the audit that catches a quality/toxicity gate silently decalibrating
    as the crawl mix shifts (the model is fixed; the data drifts under
    it).

    All arithmetic is exact-integer micro-units (integer div), so the
    result is bit-identical across engines and partitionings:

    * ``ece_u``  = Σ_bins n·|mean_score_u − pos_rate_u| div n (per bucket)
    * ``drift_u`` = Σ shared bins |pos_rate_u(t,b) − pos_rate_u(t0,b)|
      div n_bins_shared — mean absolute reliability shift vs the baseline
      bucket t0 = min(bucket); bins present in only one bucket carry no
      defensible comparison and are excluded but COUNTED
      (``n_bins_shared``), so sparsity is visible, not silent.

    Returns (bucket, n, ece_u, n_bins_shared, drift_u) ordered by bucket;
    the baseline bucket reports drift_u = 0 against itself.

    Scale shape: one keyed aggregation on (bucket, bin) — map-side
    partial combine applies; the baseline reliability curve is an
    n_bins-row frame broadcast into the comparison join; the final
    per-bucket reduce is keyed on bucket. Nothing corpus-global beyond
    the one n_bins-row broadcast.
    """
    s = score_micro.cast("bigint")
    binned = df.select(
        bucket.alias("bucket"), s.alias("__s"), label.cast("int").alias("__y")
    ).select(
        "bucket",
        F.least(
            F.expr(f"(__s * {n_bins}) div 1000000"), F.lit(n_bins - 1)
        ).cast("bigint").alias("bin"),
        "__s",
        "__y",
    )
    from ingestion_scripts_spark.caching import persist_tracked

    # the per-(bucket, bin) aggregate feeds THREE consumers (base-bucket
    # min, the broadcast baseline join, the final per-bucket agg); persist
    # it so the corpus is scanned and aggregated exactly once instead of
    # relying on ReuseExchange (ADVICE r12) — the frame itself is tiny
    # (buckets x n_bins rows). Released per-query by the harness.
    per_bin = persist_tracked(
        binned.groupBy("bucket", "bin").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("__s").cast("bigint").alias("ss"),
            F.sum("__y").cast("bigint").alias("sy"),
        ).select(
            "bucket",
            "bin",
            "n",
            F.expr("ss div n").cast("bigint").alias("mean_u"),
            F.expr("(sy * 1000000) div n").cast("bigint").alias("pos_u"),
        )
    )
    base_bucket = per_bin.select(F.min("bucket").alias("bucket"))
    baseline = F.broadcast(
        per_bin.join(base_bucket, "bucket").select(
            "bin", F.col("pos_u").alias("pos0_u")
        )
    )
    joined = per_bin.join(baseline, "bin", "left")
    return (
        joined.groupBy("bucket")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.expr(
                "CAST(sum(n * abs(mean_u - pos_u)) div sum(n) AS BIGINT)"
            ).alias("ece_u"),
            F.count("pos0_u").cast("bigint").alias("n_bins_shared"),
            F.expr(
                "CAST(coalesce(sum(abs(pos_u - pos0_u)), 0) "
                "div greatest(count(pos0_u), 1) AS BIGINT)"
            ).alias("drift_u"),
        )
        .orderBy("bucket")
    )
