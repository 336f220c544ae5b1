"""Sentiment enrichment — N1 of the reference surface.

The reference runs VADER per record (``src/twitter_consumer.py:69-77``,
``src/reddit_consumer.py:80-88``), building a new analyzer per record/call
(an anti-optimization — SURVEY.md §4.1). Here:

- ``sentiment_native(col)`` — a DETERMINISTIC, oracle-checkable VADER-style
  lexicon scorer built from native HOFs (no Python): token hits against a
  small embedded valence lexicon, compound = s/sqrt(s^2+15) (VADER's
  published normalization), pos/neg/neu as token-share ratios. This is the
  engine's default path: JVM-side, codegen-friendly, 100 TB-safe.
- ``sentiment_vader_udf`` — an Arrow-batched pandas_udf wrapping
  ``vaderSentiment`` when installed (analyzer constructed ONCE per executor
  process, fixing the reference's per-record construction); falls back to
  the native scorer when the library is absent (it is not in this
  container).

Both return the reference's 4-field struct
``{negative, neutral, positive, compound}`` (``src/twitter_consumer.py:72-77``).
"""

from __future__ import annotations

# module-level so the factories' pandas_udf type hints ('pd.Series', string
# annotations under `from __future__ import annotations`) resolve against
# THIS module's globals — a local `import pandas as pd` inside the factory
# leaves the hint unresolvable and pandas_udf raises UNSUPPORTED_SIGNATURE
# (latent until the lib-gated branches first executed; tests/test_lib_udf_doubles.py)
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from .lits import string_array

from .text import tokenize_ws

#: tiny embedded valence lexicon (VADER-inspired scores, public-domain words).
#: Deliberately small and frozen so results are deterministic and the DuckDB
#: oracle can embed the same literal lists.
POSITIVE_WORDS: dict[str, float] = {
    "good": 1.9, "great": 3.1, "excellent": 2.7, "love": 3.2, "like": 1.5,
    "best": 3.2, "happy": 2.7, "awesome": 3.1, "nice": 1.8, "fast": 1.3,
    "win": 2.8, "cool": 1.3, "amazing": 2.8, "perfect": 2.7, "better": 1.9,
}
NEGATIVE_WORDS: dict[str, float] = {
    "bad": -2.5, "terrible": -2.1, "hate": -2.7, "worst": -3.1, "slow": -1.3,
    "awful": -2.0, "sad": -2.1, "broken": -1.8, "fail": -2.5, "bug": -1.5,
    "wrong": -2.1, "poor": -2.1, "worse": -2.1, "error": -1.7, "crash": -2.2,
}

COMPOUND_ALPHA = 15.0  # VADER's normalization constant (published)


def _score_expr(tokens: Column) -> Column:
    pos_arr = string_array(POSITIVE_WORDS)
    neg_arr = string_array(NEGATIVE_WORDS)
    score_map = F.create_map(
        *[
            x
            for w, s in {**POSITIVE_WORDS, **NEGATIVE_WORDS}.items()
            for x in (F.lit(w), F.lit(s))
        ]
    )
    total = F.aggregate(
        tokens,
        F.lit(0.0),
        lambda acc, t: acc + F.coalesce(score_map[t], F.lit(0.0)),
    )
    npos = F.size(F.filter(tokens, lambda t: F.array_contains(pos_arr, t)))
    nneg = F.size(F.filter(tokens, lambda t: F.array_contains(neg_arr, t)))
    ntok = F.greatest(F.size(tokens), F.lit(1))
    compound = F.round(total / F.sqrt(total * total + F.lit(COMPOUND_ALPHA)), 4)
    return F.struct(
        F.round(nneg / ntok, 4).alias("negative"),
        F.round((ntok - npos - nneg) / ntok, 4).alias("neutral"),
        F.round(npos / ntok, 4).alias("positive"),
        compound.alias("compound"),
    )


def sentiment_native(col: Column) -> Column:
    """Deterministic lexicon sentiment over lowercased whitespace tokens."""
    return _score_expr(tokenize_ws(F.lower(col)))


def make_sentiment_udf():
    """Arrow-batched pandas_udf using vaderSentiment when available.

    Returns None when the library is absent — callers then use
    ``sentiment_native`` (this container has no vaderSentiment).
    """
    try:
        from vaderSentiment.vaderSentiment import SentimentIntensityAnalyzer  # noqa: F401
    except ImportError:
        return None

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..schemas import SENTIMENT

    @pandas_udf(SENTIMENT)
    def vader(texts: pd.Series) -> pd.DataFrame:
        # constructed once per Arrow batch stream, not per record
        # (fixes reference src/twitter_consumer.py:69)
        analyzer = SentimentIntensityAnalyzer()
        rows = []
        for t in texts:
            s = analyzer.polarity_scores(t or "")
            rows.append((s["neg"], s["neu"], s["pos"], s["compound"]))
        return pd.DataFrame(rows, columns=["negative", "neutral", "positive", "compound"])

    return vader


def make_demojize_udf():
    """F3 — ``emoji.demojize(text, language="en")``
    (``src/twitter_consumer.py:89``). pandas_udf when the ``emoji`` lib is
    installed; None otherwise (callers fall back to identity — emoji
    replacement has no native equivalent and the lib is absent here)."""
    try:
        import emoji  # noqa: F401
    except ImportError:
        return None

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def demojize(texts: pd.Series) -> pd.Series:
        import emoji as _e

        return texts.map(lambda t: _e.demojize(t, language="en") if t is not None else None)

    return demojize


def make_html_strip_udf():
    """F4 — BeautifulSoup ``get_text()`` after removing script/style/a/img
    (``src/rss_consumer.py:106-111``). pandas_udf when bs4 is installed;
    None otherwise (callers use ``text.html_strip_native``)."""
    try:
        from bs4 import BeautifulSoup  # noqa: F401
    except ImportError:
        return None

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def strip_html(texts: pd.Series) -> pd.Series:
        from bs4 import BeautifulSoup as BS

        def one(t):
            if t is None:
                return None
            soup = BS(t, features="html.parser")
            for el in soup(["script", "style", "a", "img"]):
                el.extract()
            return soup.get_text()

        return texts.map(one)

    return strip_html
