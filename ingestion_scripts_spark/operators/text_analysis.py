"""Text-analysis operators over document tables (extension ops, SURVEY §2.9).

Language-ID, quality scoring, token counting, fingerprinting — all native
Catalyst expressions (regexp + HOFs), deterministic, oracle-checkable, and
trivially data-parallel (no shuffle at all: every op here is a narrow map).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from ..functions.lits import string_array

from ..functions.text import PUNCT_CLASS, hash64, tokenize_ws

#: tiny per-language function-word lists for the n-gram/stopword-hit
#: heuristic language identifier. Frozen literals shared with the oracle.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "por", "con", "para"],
    "fr": ["le", "la", "les", "est", "une", "des", "dans", "pour", "que", "sur"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不", "人", "这"],
}

#: BPE-ish word/punct token pattern. Whitespace is an EXPLICIT class, not
#: ``\s``: Java's \s includes \x0B (vertical tab), RE2's does not — the
#: explicit class keeps Spark and the DuckDB oracle byte-identical.
TOKEN_PATTERN = "[a-zA-Z0-9_]+|[^a-zA-Z0-9_ \\t\\n\\x0B\\f\\r]"

#: PII patterns — syntax valid in BOTH Java regex and RE2 (no lookaround,
#: no backreferences) so the scrubber and its oracle agree byte-for-byte.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_URL = "https?://[^ ]+"


def r4(c: Column) -> Column:
    """Round-to-4 as floor(x*1e4+0.5)/1e4: pure IEEE double ops, so Spark
    and the DuckDB oracle are bit-identical even on .xxxx5 ties (engine
    ``round()`` half-handling differs across implementations)."""
    return F.floor(c * 10000.0 + 0.5) / 10000.0


def lang_scores(text_col: Column) -> dict[str, Column]:
    """Per-language marker-hit count over lowercased whitespace tokens."""
    toks = tokenize_ws(F.lower(text_col))

    def _hits(words: list[str]):
        marker = string_array(words)
        return lambda t: F.array_contains(marker, t)

    return {
        lang: F.size(F.filter(toks, _hits(words)))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text_col: Column) -> Column:
    """Heuristic language ID: argmax marker-hit count; ties break by language
    code ascending (first match in the sorted CASE chain); all-zero → 'und'.

    Expressed as a greatest + first-match CASE chain so the oracle SQL is the
    literal same expression shape.
    """
    scores = lang_scores(text_col)
    langs = sorted(LANG_MARKERS)
    m = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("und")
    chain = F.when(m == 0, F.lit("und"))
    for lang in langs:
        chain = chain.when(scores[lang] == m, F.lit(lang))
    return chain.otherwise(expr)


def token_count_ws(text_col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokenize_ws(text_col))


def token_count_bpe(text_col: Column) -> Column:
    """BPE-ish token count: word chunks + individual punctuation marks —
    the cheap proxy for LLM token budgeting at corpus scale."""
    return F.regexp_count(text_col, F.lit(TOKEN_PATTERN))


def quality_score(text_col: Column) -> Column:
    """Document quality struct: length, token stats, punct/digit ratios and a
    composite [0,1] score (heuristics in the C4/Gopher tradition — length,
    mean word length, symbol density)."""
    toks = tokenize_ws(text_col)
    n_chars = F.length(text_col)
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    n_punct = F.regexp_count(text_col, F.lit(PUNCT_CLASS))
    n_digit = F.regexp_count(text_col, F.lit("[0-9]"))
    # round-to-4 as floor(x*1e4 + 0.5)/1e4: pure IEEE double ops, so Spark
    # and the DuckDB oracle produce bit-identical results even on .xxxx5
    # ties (engine round() half-handling differs across implementations)
    r4 = lambda c: F.floor(c * 10000.0 + 0.5) / 10000.0  # noqa: E731
    mean_tok_len = r4(
        F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t)) / n_tokens
    )
    punct_ratio = r4(n_punct / F.greatest(n_chars, F.lit(1)))
    digit_ratio = r4(n_digit / F.greatest(n_chars, F.lit(1)))
    # stopword share of lowercased tokens: natural text sits in a mid band;
    # ~0 flags keyword-stuffed or non-linguistic content
    from ..functions.text import STOPWORDS

    sw = string_array(STOPWORDS)
    n_stop = F.size(
        F.filter(tokenize_ws(F.lower(text_col)), lambda t: F.array_contains(sw, t))
    )
    stop_ratio = r4(n_stop / n_tokens)
    # composite: reward 3..10-char mean tokens and low symbol density
    score = r4(
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                F.lit(1.0)
                - F.abs(mean_tok_len - 5.5) / 10.0
                - punct_ratio
                - digit_ratio,
            ),
        )
    )
    return F.struct(
        n_chars.alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality"),
    )


def scrub_pii(text_col: Column) -> dict[str, Column]:
    """PII redaction for training corpora: emails → ``<EMAIL>``, URLs →
    ``<URL>``, phone numbers → ``<PHONE>``, plus per-doc match counts
    (counted on the ORIGINAL text, before any replacement can shadow a
    later pattern). Narrow map — regexp only, JVM-side, zero shuffle."""
    scrubbed = F.regexp_replace(text_col, PII_EMAIL, "<EMAIL>")
    scrubbed = F.regexp_replace(scrubbed, PII_URL, "<URL>")
    scrubbed = F.regexp_replace(scrubbed, PII_PHONE, "<PHONE>")
    return {
        "scrubbed": scrubbed,
        "n_emails": F.regexp_count(text_col, F.lit(PII_EMAIL)),
        "n_phones": F.regexp_count(text_col, F.lit(PII_PHONE)),
        "n_urls": F.regexp_count(text_col, F.lit(PII_URL)),
    }


def repetition_signals(df, id_col: str, text_col: str):
    """Gopher-style repetition quality signals, shuffle-based (scales to any
    doc length — no per-doc O(n²) HOF):

    - ``dup_token_frac`` — 1 − |distinct tokens| / |tokens| (narrow map)
    - ``top_bigram_frac`` — tokens covered by the single most frequent
      adjacent bigram: 2·max_count / n_tokens, via explode → two-level
      partial-agg'd groupBy (the same plan shape at 100 TB; the key space
      is (doc, bigram) so skew is bounded by the longest document).

    High values flag boilerplate/generated text for the curation gate.
    """
    from ..functions.text import ngrams, tokenize_ws

    toks = df.select(
        F.col(id_col), tokenize_ws(F.lower(F.col(text_col))).alias("__t")
    )
    base = toks.select(
        id_col,
        F.size("__t").cast("bigint").alias("n_tokens"),
        r4(
            F.lit(1.0)
            - F.size(F.array_distinct(F.col("__t")))
            / F.greatest(F.size("__t"), F.lit(1))
        ).alias("dup_token_frac"),
    )
    top = (
        toks.select(F.col(id_col), F.explode(ngrams(F.col("__t"), 2)).alias("__bg"))
        .groupBy(id_col, "__bg")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .groupBy(id_col)
        .agg(F.max("__cnt").alias("__top"))
    )
    return base.join(top, id_col, "left").select(
        id_col,
        "n_tokens",
        "dup_token_frac",
        r4(
            F.coalesce(F.col("__top"), F.lit(0)) * 2.0
            / F.greatest(F.col("n_tokens"), F.lit(1))
        ).alias("top_bigram_frac"),
    )


def ngram_contamination(df, benchmark, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3):
    """Train/test contamination scan: fraction of each document's distinct
    word n-gram shingles that appear in a benchmark shingle set
    (``benchmark``: DataFrame with one ``shingle`` column).

    Plan: explode doc shingles → left-semi join against the (deduped)
    benchmark set → per-doc hit count. The benchmark side is a bounded
    eval-suite — small relative to the corpus — so Catalyst/AQE broadcast
    it from actual stats; no forced hint (it still grows with suite count).
    """
    from .dedup import shingles

    sh = df.select(F.col(id_col), shingles(F.col(text_col), n).alias("__sh"))
    base = sh.select(id_col, F.size("__sh").cast("bigint").alias("n_shingles"))
    hits = (
        sh.select(F.col(id_col), F.explode("__sh").alias("shingle"))
        .join(benchmark.dropDuplicates(["shingle"]), "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    return base.join(hits, id_col, "left").select(
        id_col,
        "n_shingles",
        F.coalesce(F.col("__hits"), F.lit(0)).cast("bigint").alias("n_contaminated"),
        r4(
            F.coalesce(F.col("__hits"), F.lit(0))
            / F.greatest(F.col("n_shingles"), F.lit(1))
        ).alias("contam_frac"),
    )


def stratified_sample(df, strata_col: str, id_col: str,
                      rates: dict[str, int], default_rate: int):
    """Deterministic hash-based stratified sampling: keep a row iff
    ``hash64(strata || '|' || id) % 100 < rate(strata)`` (rates in percent).

    No RNG state — reproducible across engines, runs, and partitionings
    (``df.sample`` is seed- AND partitioning-dependent, so re-partitioning
    the 100 TB input would silently change the sample). Narrow map."""
    key = F.concat(
        F.col(strata_col).cast("string"), F.lit("|"), F.col(id_col).cast("string")
    )
    chain = None
    for s, pct in sorted(rates.items()):
        chain = (chain.when if chain is not None else F.when)(
            F.col(strata_col) == s, F.lit(pct)
        )
    rate = chain.otherwise(F.lit(default_rate)) if chain is not None else F.lit(default_rate)
    return df.filter(hash64(key) % 100 < rate)


def fingerprint(text_col: Column) -> Column:
    """Whole-document fingerprint: 60-bit md5-derived hash of the text."""
    return hash64(text_col)


def winnow_fingerprints(text_col: Column, n: int = 4, window: int = 4) -> Column:
    """Winnowing-style fingerprint set: min shingle-hash per sliding window
    of ``window`` consecutive n-gram hashes (Schleimer et al., SIGMOD'03),
    deduped. Used for robust near-dup/overlap detection at corpus scale."""
    from ..functions.text import ngrams

    from ..functions.text import let_

    def body(hashes: Column) -> Column:
        m = F.size(hashes)
        idx = F.when(m >= window, F.sequence(F.lit(1), m - (window - 1))).otherwise(
            F.when(m > 0, F.array(F.lit(1))).otherwise(F.array().cast("array<int>"))
        )
        return F.array_distinct(
            F.transform(
                idx,
                lambda i: F.array_min(
                    F.slice(hashes, i, F.least(F.lit(window), m))
                ),
            )
        )

    return let_(F.transform(ngrams(tokenize_ws(F.lower(text_col)), n), hash64), body)


#: Frozen linear quality-gate weights — a fasttext-style quality classifier
#: distilled to a linear model over the quality_score features. The
#: activation is a HARD sigmoid (clip(0.25 z + 0.5, 0, 1)): exact IEEE
#: add/mul/clip on both engines, unlike exp() whose libm differs between
#: the JVM and DuckDB by ULPs that r4 could round apart.
QGATE_BIAS = -1.2
QGATE_W_LEN = 0.8     # bounded length: least(n_tokens, 100)/100
QGATE_W_MTL = -0.35   # |mean_token_len - 5.5|
QGATE_W_PUNCT = -4.0
QGATE_W_DIGIT = -3.0
QGATE_W_STOP = 1.5


def quality_classify(text_col: Column) -> Column:
    """Model-based quality gate (the 'quality classifier' stage of LLM data
    curation, e.g. fasttext keep/drop filters): frozen-weight linear model
    over the quality_score features, hard-sigmoid score in [0,1], keep
    decision from the raw margin sign (exact — no rounding at the decision
    boundary).

    Narrow, JVM-side, no shuffle: scales as a pure map over documents.
    """
    q = quality_score(text_col)
    len_feat = F.least(q["n_tokens"], F.lit(100)).cast("double") / 100.0
    z = (
        F.lit(QGATE_BIAS)
        + QGATE_W_LEN * len_feat
        + QGATE_W_MTL * F.abs(q["mean_token_len"] - 5.5)
        + QGATE_W_PUNCT * q["punct_ratio"]
        + QGATE_W_DIGIT * q["digit_ratio"]
        + QGATE_W_STOP * q["stop_ratio"]
    )
    score = r4(F.greatest(F.lit(0.0), F.least(F.lit(1.0), 0.25 * z + 0.5)))
    return F.struct(
        score.alias("gate_score"),
        (z >= 0).cast("int").alias("keep"),
    )


#: Gopher rule thresholds (Rae et al. 2021, §A1.1 heuristics restated over
#: whitespace tokens). Frozen literals shared with the oracle SQL.
GOPHER_MIN_TOKENS = 5
GOPHER_MAX_TOKENS = 100_000
GOPHER_MTL_MIN = 2.0
GOPHER_MTL_MAX = 12.0
GOPHER_MAX_SYMBOL_RATIO = 0.1   # '#' and '…' per token
GOPHER_MIN_ALPHA_FRAC = 0.6     # fraction of tokens containing a letter
GOPHER_MIN_STOP_HITS = 1        # distinct required-stopword hits


#: the Gopher "minimum stop words" list
GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(text_col: Column) -> Column:
    """Gopher-style rule filter: per-document signals + one boolean verdict.

    All signals are narrow regexp/HOF maps (no shuffle, whole-stage
    codegen); at 100 TB this runs as a pure scan-side filter, exactly how
    rule gates precede the expensive dedup stages in a curation DAG.
    """
    toks = tokenize_ws(text_col)
    n_tokens = F.size(toks)
    nt = F.greatest(n_tokens, F.lit(1))
    mean_tok_len = r4(
        F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t)) / nt
    )
    n_symbols = F.regexp_count(text_col, F.lit("[#…]"))
    symbol_ratio = r4(n_symbols / nt)
    n_alpha_toks = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_frac = r4(n_alpha_toks / nt)
    low = string_array(GOPHER_STOPS)
    stop_hits = F.size(
        F.array_intersect(tokenize_ws(F.lower(text_col)), low)
    )
    keep = (
        (n_tokens >= GOPHER_MIN_TOKENS)
        & (n_tokens <= GOPHER_MAX_TOKENS)
        & (mean_tok_len >= GOPHER_MTL_MIN)
        & (mean_tok_len <= GOPHER_MTL_MAX)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
        & (stop_hits >= GOPHER_MIN_STOP_HITS)
    )
    return F.struct(
        n_tokens.cast("bigint").alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.cast("bigint").alias("stop_hits"),
        keep.cast("int").alias("keep"),
    )


def chunk_tokens(df, id_col: str, text_col: str, size: int = 64, stride: int = 48):
    """Overlapping token-window chunking (RAG / long-doc training prep):
    whitespace tokens → windows of ``size`` starting every ``stride``
    (so ``size - stride`` tokens of overlap), last partial window kept.

    posexplode over a computed start-index ``sequence`` — a narrow map
    whose fanout is the chunk count; no shuffle. Returns one row per chunk
    with (id, chunk_id, n_chunk_tokens, chunk_text).
    """
    toks = tokenize_ws(F.col(text_col))
    n = F.size(toks)
    # number of windows: 1 + ceil(max(n - size, 0) / stride); head window
    # always exists (empty text → 1 empty chunk)
    extra = F.greatest(n - F.lit(size), F.lit(0))
    n_win = F.lit(1) + F.ceil(extra / F.lit(stride)).cast("int")
    starts = F.sequence(F.lit(0), (n_win - 1) * stride, F.lit(stride))
    out = (
        df.select(F.col(id_col), toks.alias("__t"), starts.alias("__s"))
        .select(F.col(id_col), "__t", F.posexplode("__s").alias("chunk_id", "__start"))
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.slice(F.col("__t"), F.col("__start") + 1, F.lit(size)).alias("__c"),
        )
    )
    return out.select(
        F.col(id_col),
        "chunk_id",
        F.size("__c").cast("bigint").alias("n_chunk_tokens"),
        F.concat_ws(" ", "__c").alias("chunk_text"),
    )


def priority_sample(df, id_col: str, weight_col: Column, k: int = 50):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): key = -ln(u) / w with u ∈ (0,1] derived from the
    60-bit md5 hash of the id — no RNG state, so the sample is identical
    across engines, runs, and repartitionings. Global top-k smallest keys.

    The k-smallest selection is a TakeOrdered (per-partition top-k then a
    k-row merge on one reducer) — no global sort materializes at scale.
    Keys are rounded to 9 dp before ranking with id tie-break, so the
    cross-engine selection is exact despite libm ln() ULP differences.
    """
    two60 = float(1 << 60)
    u = (hash64(F.col(id_col).cast("string")) + F.lit(1.0)) / F.lit(two60)
    key = F.round(-F.log(u) / weight_col, 9)
    return (
        df.select(F.col(id_col), weight_col.alias("w"), key.alias("es_key"))
        .orderBy(F.col("es_key").asc(), F.col(id_col).asc())
        .limit(k)
    )


def zipf_slope(
    df,
    group_col: str,
    tokens_col: str,
    top_n: int = 200,
):
    """Per-group OLS slope of ln(frequency) on ln(rank) over the top-N
    tokens — the Zipf-law fit every natural corpus tracks at slope ~ -1.
    Template spam and boilerplate flatten the curve (slope -> 0: a few
    tokens repeated uniformly), machine gibberish steepens it, so the
    slope is a per-source corpus-health signal the length/punct
    heuristics in ``quality_score`` cannot see.

    Determinism: ranks are pinned by (count DESC, token ASC); each
    ln(rank)/ln(count) point is snapped to an exact int64 MICRO-unit
    immediately (floor(ln·1e6 + 0.5)), so the OLS sums Σx, Σy, Σxy, Σx²
    are exact integer arithmetic — partition-order independent, and the
    closed-form slope touches floats only in the final divide, rounded
    to 4 dp. Magnitudes: x <= ln(200)·1e6 ~ 5.3e6, y <= ~4e7 for any
    realistic count, so Σx·Σy <= ~3e18 stays inside int64 (DuckDB errors
    loudly on overflow; the bound is the guarantee it never fires).
    Groups with < 3 distinct tokens return NULL (slope undefined).

    One explode + two keyed shuffles (token count, group agg).
    """
    from pyspark.sql import Window

    tf = (
        df.select(F.col(group_col).alias("g"), F.explode(tokens_col).alias("t"))
        .groupBy("g", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("g").orderBy(F.desc("c"), F.asc("t"))
    snap = lambda col: F.floor(F.log(col) * 1000000.0 + 0.5).cast("bigint")  # noqa: E731
    pts = (
        tf.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .select(
            "g",
            snap(F.col("rnk").cast("double")).alias("x"),
            snap(F.col("c").cast("double")).alias("y"),
        )
    )
    agg = pts.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.select(
        "g",
        F.col("n").alias("n_points"),
        F.when(
            (F.col("n") >= 3) & (den != 0),
            F.floor(num / den * 10000.0 + 0.5) / 10000.0,
        ).alias("slope"),
    )


def max_coverage_select(df, id_col: str, tokens_col: str, k: int = 5):
    """Greedy maximum-coverage selection (the Nemhauser-Wolsey-Fisher
    1-1/e submodular baseline): k rounds, each picking the document whose
    tokens cover the most NOT-yet-covered vocabulary — the set-cover
    complement to ``kcenter_greedy``'s metric diversification, and the
    standard "maximize vocabulary per token budget" selector for seed /
    eval corpora.

    Spark shape mirrors the k-center running-dmin loop: the working set
    carries RESIDUAL (not-yet-covered) tokens; each round picks the doc
    with the largest residual (one narrow map + top-1 TakeOrdered, no
    shuffle), then subtracts only the NEWEST pick's residual tokens from
    every row via a broadcast 1-row frame + ``array_except`` and
    localCheckpoints (the round frame is read twice — probe + update —
    the engine's lineage rule). Plan size is therefore CONSTANT in k and
    in the covered-vocabulary size: no ``~isin(picked_ids)`` literal
    list, no O(k·|covered|) embedded array (the retired form was a
    plan-size bomb at k=500); the newest pick's tokens travel as DATA,
    not literals. Driver state is one pick's residual per round, bounded
    by max-doc-tokens, never corpus-sized.

    Determinism: gains are exact integers; ties break to the smallest
    id; picked docs are excluded by an id filter folded into each
    round's checkpointed frame (after covering, their gain is 0 and the
    id-asc tiebreak could otherwise re-pick them). The DuckDB oracle
    unrolls the identical k rounds.

    Returns (rank, doc_id, gain) — gain = tokens newly covered at pick
    time, a non-increasing sequence (submodularity, pinned by the law
    test).

    Perf note (VERDICT r7/r8): the running-residual rewrite DOUBLED the
    measured sf0.1 wall (1.13 s → ~2.1 s) — each round now rewrites the
    residual arrays (array_except + localCheckpoint) instead of only
    re-probing them. That cost is deliberate: it buys a plan whose SIZE
    is constant in k and in covered-vocabulary size, where the retired
    form embedded an O(k·|covered|) literal array in the plan and
    stopped compiling near k=500. Constant plan + linear data work is
    the 100 TB trade; the ~2.1 s at sf0.1 is the expected steady state,
    not a regression.
    """
    from pyspark.sql import functions as F

    from .similarity import spread

    spark = df.sparkSession
    work = df.select(
        F.col(id_col).alias("pid"),
        F.array_distinct(F.col(tokens_col)).alias("t"),
    )
    work = spread(work).localCheckpoint()

    picked: list[tuple[int, int, int]] = []
    for rank in range(1, k + 1):
        top = (
            work.select("pid", "t", F.size("t").alias("gain"))
            .orderBy(F.desc("gain"), F.asc("pid"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        picked.append((rank, row["pid"], int(row["gain"])))
        if rank < k:
            # the pick's RESIDUAL tokens are exactly the newly covered
            # vocabulary (earlier picks' tokens are already subtracted),
            # so one array_except per round keeps every row's t equal to
            # tokens-minus-all-covered — same sets as re-subtracting the
            # full covered vocabulary each round
            cov = spark.createDataFrame([(list(row["t"]),)], "cov array<string>")
            new_work = (
                work.filter(F.col("pid") != F.lit(row["pid"]))
                .crossJoin(F.broadcast(cov))
                .select("pid", F.array_except("t", "cov").alias("t"))
                .localCheckpoint()
            )
            # prior round's residual checkpoint is dead once the new one
            # materialized (r10 scale-probe OOM class; caching.py)
            from ingestion_scripts_spark.caching import release_local_checkpoint

            release_local_checkpoint(work)
            work = new_work
    return spark.createDataFrame(picked, "rank bigint, doc_id bigint, gain bigint")


def source_unique_vocab(df, group_col: str, tokens_col: str):
    """Leave-one-out vocabulary attribution per source: of each source's
    distinct vocabulary, how much exists NOWHERE else in the corpus —
    the cheapest data-valuation signal (a source whose vocabulary is
    fully covered elsewhere adds no lexical diversity; one with a high
    unique fraction is irreplaceable). Exactly equivalent to
    |vocab(corpus)| - |vocab(corpus - source)| without re-scanning the
    corpus per source: a token counts toward its source iff its distinct-
    source count is 1.

    One explode + two keyed shuffles ((token, source) dedup, then token
    source-count), all map-side-combinable. Returns
    (source, vocab, unique_vocab, unique_ratio) with the ratio on the
    1e-4 grid.
    """
    from pyspark.sql import functions as F

    tok_src = (
        df.select(F.col(group_col).alias("g"), F.explode(tokens_col).alias("t"))
        .distinct()
    )
    src_count = tok_src.groupBy("t").agg(F.count(F.lit(1)).alias("ns"))
    per = (
        tok_src.join(src_count, "t")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.sum((F.col("ns") == 1).cast("int")).cast("bigint").alias("unique_vocab"),
        )
    )
    return per.select(
        "g",
        "vocab",
        "unique_vocab",
        (
            F.floor(F.col("unique_vocab") * 10000.0 / F.col("vocab") + 0.5) / 10000.0
        ).alias("unique_ratio"),
    )


def species_richness(df, tokens_col: str):
    """Good-Turing / Chao1 unseen-vocabulary estimation from the
    frequency-of-frequencies profile — "how much NEW vocabulary would
    more data of this kind add?" (the data-acquisition question for
    tokenizer and corpus planning). Chao1 (Chao 1984):
    V̂ = V + f1²/(2·f2) where f1/f2 = singleton/doubleton type counts;
    Good-Turing coverage = 1 − f1/N is the probability mass of SEEN
    types.

    Exactness: the whole pipeline is exact BIGINT — term counts →
    frequency-of-frequencies → one final row; chao1_extra =
    f1² div (2·f2) and coverage_ppm = 1e6 − (f1·1e6 div N) are
    truncating integer divisions (f2 = 0 ⟹ extra NULL, the standard
    bias-corrected fallback is the caller's choice). Laws: V̂ ≥ V
    always; an all-unique corpus has coverage 0.

    Scale: two cascaded map-side-combinable aggregates (term counts are
    Heaps-sublinear; freq-of-freqs is tiny) — the same shape as
    vocab_topn without the ranking window.
    """
    from pyspark.sql import functions as F

    terms = df.select(F.explode(F.col(tokens_col)).alias("term"))
    tf = terms.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    fof = tf.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("types"))
    return fof.agg(
        F.sum("types").cast("bigint").alias("v_obs"),
        F.sum(F.col("c") * F.col("types")).cast("bigint").alias("n_tokens"),
        F.coalesce(
            F.sum(F.when(F.col("c") == 1, F.col("types"))), F.lit(0)
        )
        .cast("bigint")
        .alias("f1"),
        F.coalesce(
            F.sum(F.when(F.col("c") == 2, F.col("types"))), F.lit(0)
        )
        .cast("bigint")
        .alias("f2"),
    ).select(
        "v_obs",
        "n_tokens",
        "f1",
        "f2",
        F.when(
            F.col("f2") > 0, F.expr("v_obs + (f1 * f1) div (2 * f2)")
        )
        .cast("bigint")
        .alias("chao1_est"),
        F.expr("1000000 - (f1 * 1000000) div n_tokens")
        .cast("bigint")
        .alias("coverage_ppm"),
    )
