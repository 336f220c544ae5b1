"""Pin F1/F2/F5/F6/A2 semantics regex-for-regex against the reference
(``src/reddit_consumer.py:58-77``, ``src/twitter_consumer.py:100-103``)."""

import re
import string

import pytest
from pyspark.sql import functions as F

from ingestion_scripts_spark.functions import text as X


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def ref_clean_text(text: str) -> str:
    # literal copy of the reference algorithm for differential testing
    text = text.lower()
    text = re.sub("\\[.*?\\]", "", text)
    text = re.sub("[%s]" % re.escape(string.punctuation), "", text)
    text = re.sub("\\w*\\d\\w*", "", text)
    return text


CASES = [
    "Hello, World! [remove me] abc123 end.",
    "UPPER lower MiXeD",
    "[all bracketed]",
    "digits 42 w0rd x9y plain",
    "a-b c_d e.f g!h",
    "no-op text",
    "",
    "punct only !!! ???",
]


@pytest.mark.parametrize("s", CASES)
def test_clean_text_matches_reference(spark, s):
    assert _one(spark, X.clean_text(F.lit(s))) == ref_clean_text(s)


def test_hashtags(spark):
    s = "see #spark and #Big_Data2 but not # alone or end#tag"
    assert _one(spark, X.extract_hashtags(F.lit(s))) == re.findall(r"#(\w+)", s)


def test_tokenize_drops_empties(spark):
    assert _one(spark, X.tokenize_ws(F.lit("a  b  c "))) == ["a", "b", "c"]


def test_remove_stopwords_keeps_duplicates_and_order(spark):
    toks = F.array(*[F.lit(t) for t in ["the", "spark", "is", "spark", "fast", "i'm"]])
    assert _one(spark, X.remove_stopwords(toks)) == ["spark", "spark", "fast"]


def test_pairwise_bigrams_canonical(spark):
    # reference: (a,b) if a<b else (b,a) over adjacent pairs
    toks = F.array(*[F.lit(t) for t in ["b", "a", "c"]])
    assert _one(spark, X.pairwise_bigrams(toks)) == [["a", "b"], ["a", "c"]]


def test_pairwise_bigrams_short_input(spark):
    assert _one(spark, X.pairwise_bigrams(F.array(F.lit("x")))) == []
    assert _one(spark, X.pairwise_bigrams(F.array().cast("array<string>"))) == []


def test_ngrams(spark):
    toks = F.array(*[F.lit(t) for t in ["a", "b", "c", "d"]])
    assert _one(spark, X.ngrams(toks, 3)) == ["a b c", "b c d"]
    assert _one(spark, X.ngrams(toks, 5)) == []


def test_array_distinct_preserves_first_occurrence(spark):
    # A2 relies on this (list(dict.fromkeys(...)) parity)
    arr = F.array(*[F.lit(x) for x in ["b", "a", "b", "c", "a"]])
    assert _one(spark, X.distinct_preserving_order(arr)) == ["b", "a", "c"]


def test_html_strip_native(spark):
    s = "<p>Hello <b>world</b></p><script>evil()</script> done"
    assert _one(spark, X.html_strip_native(F.lit(s))) == "Hello world done"
