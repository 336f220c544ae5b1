"""Text-analysis operators over document tables (extension ops, SURVEY §2.9).

Language-ID, quality scoring, token counting, fingerprinting — all native
Catalyst expressions (regexp + HOFs), deterministic, oracle-checkable, and
trivially data-parallel (no shuffle at all: every op here is a narrow map).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

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


def lang_scores(text_col: Column) -> dict[str, Column]:
    """Per-language marker-hit count over lowercased whitespace tokens."""
    toks = tokenize_ws(F.lower(text_col))

    def _hits(words: list[str]):
        marker = F.array(*[F.lit(w) for w in words])
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

    sw = F.array(*[F.lit(s) for s in STOPWORDS])
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
