"""Native text functions (Column -> Column) — the reference's scalar surface.

Every function here compiles to built-in Catalyst expressions (regexp, higher
order functions) — no Python UDFs — so they stay inside whole-stage codegen
and cost nothing extra at 100 TB. Reference parity notes cite
``/root/reference/src/*.py``.

The regex constants are written to be valid in BOTH Java regex (Spark) and
RE2 (DuckDB) so the same pattern string can be used by the engine and by the
DuckDB correctness oracle.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf deferred annotations
from pyspark.sql import Column
from pyspark.sql import functions as F
from .lits import string_array

#: ``string.punctuation`` as a char class valid in Java regex and RE2.
#: Parity: reference ``src/reddit_consumer.py:62`` strips
#: ``re.escape(string.punctuation)``.
PUNCT_CLASS = "[!\"#$%&'()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]"

#: reference ``src/reddit_consumer.py:61`` — text in square brackets
BRACKET_SPAN = "\\[.*?\\]"

#: reference ``src/reddit_consumer.py:63`` — words containing digits
DIGIT_WORD = "\\w*\\d\\w*"

#: reference ``src/twitter_consumer.py:101`` — hashtag extraction
HASHTAG = "#(\\w+)"

#: NLTK english stopword list (public, stable classic 179-word list) union the
#: reference's 10 custom slang tokens (``src/reddit_consumer.py:22-24``).
NLTK_ENGLISH_STOPWORDS = (
    "i me my myself we our ours ourselves you you're you've you'll you'd your "
    "yours yourself yourselves he him his himself she she's her hers herself "
    "it it's its itself they them their theirs themselves what which who whom "
    "this that that'll these those am is are was were be been being have has "
    "had having do does did doing a an the and but if or because as until "
    "while of at by for with about against between into through during before "
    "after above below to from up down in out on off over under again further "
    "then once here there when where why how all any both each few more most "
    "other some such no nor not only own same so than too very s t can will "
    "just don don't should should've now d ll m o re ve y ain aren aren't "
    "couldn couldn't didn didn't doesn doesn't hadn hadn't hasn hasn't haven "
    "haven't isn isn't ma mightn mightn't mustn mustn't needn needn't shan "
    "shan't shouldn shouldn't wasn wasn't weren weren't won won't wouldn "
    "wouldn't"
).split()

MORE_STOPWORDS = ["it's", "im", "lol", "i'm", "got", "yeah", "it’s", "i’m", "its", "i", "me"]

#: order-stable union (set semantics, deterministic order for array literals)
STOPWORDS = sorted(set(NLTK_ENGLISH_STOPWORDS) | set(MORE_STOPWORDS))


def let_(expr: Column, body) -> Column:
    """Expression-level ``let``: evaluate ``expr`` ONCE per row and bind it as
    a lambda variable inside ``body``.

    Catalyst evaluates a higher-order-function lambda's references to *outer*
    expressions once per array ELEMENT, so e.g. ``transform(idx, i ->
    element_at(tokens, i))`` re-computes the whole ``tokens`` expression for
    every element. ``transform(array(expr), x -> body(x))[1]`` makes the
    binding explicit and O(1) per row — the difference is >10× on nested
    text ops (tokenize→ngrams→minhash chains).
    """
    return F.element_at(F.transform(F.array(expr), body), 1)


def clean_text(col: Column) -> Column:
    """F1 — lowercase; strip ``[...]`` spans; strip punctuation; strip words
    containing digits. Regex-for-regex parity with the reference's
    ``clean_text`` (``src/reddit_consumer.py:58-64``), same order.
    """
    c = F.lower(col)
    c = F.regexp_replace(c, BRACKET_SPAN, "")
    c = F.regexp_replace(c, PUNCT_CLASS, "")
    c = F.regexp_replace(c, DIGIT_WORD, "")
    return c


def extract_hashtags(col: Column) -> Column:
    """F2 — ``re.findall(r"#(\\w+)", text)`` (``src/twitter_consumer.py:100-103``)."""
    return F.regexp_extract_all(col, F.lit(HASHTAG), 1)


def tokenize_ws(col: Column) -> Column:
    """Whitespace tokenization as the reference does (``comment.split(" ")``,
    ``src/reddit_consumer.py:146``), minus empty tokens.

    Divergence (documented): Python ``split(" ")`` keeps empty tokens from
    runs of spaces; we drop them — they are noise and Spark's ``split``
    already drops trailing empties, so dropping all of them gives stable
    cross-engine semantics.
    """
    return F.filter(F.split(col, " "), lambda t: t != F.lit(""))


def remove_stopwords(tokens: Column, stopwords: list[str] | None = None) -> Column:
    """F5 — drop stopword tokens, PRESERVING duplicates and order like the
    reference's listcomp (``src/reddit_consumer.py:146``).

    Implemented with the ``filter`` higher-order function, NOT
    ``array_except`` (which would also dedupe — SURVEY.md §2.6 F5 caveat).
    """
    sw = string_array(stopwords or STOPWORDS)
    return F.filter(tokens, lambda t: ~F.array_contains(sw, t))


def pairwise_bigrams(tokens: Column) -> Column:
    """F6 — adjacent token pairs, each pair sorted ascending (canonical), as
    the reference's ``pairwise`` generator (``src/reddit_consumer.py:67-71``:
    ``(a,b) if a<b else (b,a)``).

    Native: ``transform(sequence(1, n-1), i -> array_sort([t[i], t[i+1]]))``
    with 1-based ``element_at``. Empty/1-token input → empty array.
    """
    def body(t: Column) -> Column:
        n = F.size(t)
        idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx,
            lambda i: F.array_sort(
                F.array(F.element_at(t, i), F.element_at(t, i + 1))
            ),
        )

    return let_(tokens, body)


def html_strip_native(col: Column) -> Column:
    """F4 (native approximation) — drop ``<script>/<style>`` blocks then all
    tags. The reference uses BeautifulSoup ``get_text()``
    (``src/rss_consumer.py:106-111``); for the oracle-checkable engine path we
    use the crude-but-deterministic regex strip (SURVEY.md §2.6 F4). The
    bs4-backed pandas_udf lives in ``functions/sentiment.py``'s UDF registry.
    """
    c = F.regexp_replace(col, "(?s)<(script|style)[^>]*>.*?</(script|style)>", "")
    c = F.regexp_replace(c, "<[^>]+>", "")
    return c


def ngrams(tokens: Column, n: int, sep: str = " ") -> Column:
    """Word n-gram shingles joined by ``sep`` (extension op building block —
    dedup/fingerprinting, SURVEY.md §2.9). Native HOFs only."""
    def body(t: Column) -> Column:
        size = F.size(t)
        idx = F.when(size >= n, F.sequence(F.lit(1), size - (n - 1))).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                sep, *[F.element_at(t, i + j) for j in range(n)]
            ),
        )

    return let_(tokens, body)


def distinct_preserving_order(arr: Column) -> Column:
    """A2 building block — dedupe keeping FIRST occurrence, like
    ``list(dict.fromkeys(...))`` (``src/reddit_consumer.py:74-77``).
    Spark's ``array_distinct`` preserves first-occurrence order (pinned by
    unit test)."""
    return F.array_distinct(arr)


def hash64(col: Column) -> Column:
    """Portable 60-bit hash: first 15 hex digits of md5, as a bigint.

    Used by MinHash/SimHash/LSH so the DuckDB oracle can compute the SAME
    hash (``CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)``) — Spark's
    murmur ``hash()`` has no DuckDB equivalent. md5 is JVM-side here.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def strip_accents_udf():
    """Unicode accent stripping (NFD → drop combining marks), the text
    normalization every multilingual training corpus runs before
    tokenization. Arrow-batched pandas_udf — no JVM builtin covers
    unicode normalization, and per-row Python would be 10-100× slower.

    Law matches DuckDB ``strip_accents`` on Latin input (pinned by the
    ``strip_accents_norm`` oracle): NFD decomposition, drop Mn marks.
    Defined as a factory so importing this module never builds a UDF.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _strip(s: pd.Series) -> pd.Series:
        import unicodedata

        def strip_one(t):
            if t is None:
                return None
            return "".join(
                c
                for c in unicodedata.normalize("NFD", t)
                if not unicodedata.combining(c)
            )

        return s.map(strip_one)

    return _strip
