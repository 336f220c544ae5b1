"""Property-based tests (SURVEY.md §5.2) — Hypothesis generates inputs, a
literal Python reimplementation of the reference's code is the test oracle.

Alphabet restricted to printable ASCII: the engine is Java-regex semantics
(ASCII ``\\w``) while Python's ``re`` defaults to unicode ``\\w`` — a known,
documented divergence, not a bug under test.
"""

import itertools
import re
import string

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ingestion_scripts_spark.functions.text import (
    STOPWORDS,
    clean_text,
    pairwise_bigrams,
    remove_stopwords,
    tokenize_ws,
)
from ingestion_scripts_spark.operators.text_analysis import quality_score

ASCII = st.text(alphabet=string.printable, max_size=120)
TOKENS = st.lists(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8), max_size=12
)


def ref_clean_text(s: str) -> str:
    """Literal restatement of src/reddit_consumer.py:58-64 (ASCII \\w)."""
    s = s.lower()
    s = re.sub(r"\[.*?\]", "", s)
    s = re.sub("[%s]" % re.escape(string.punctuation), "", s)
    s = re.sub(r"[a-zA-Z0-9_]*[0-9][a-zA-Z0-9_]*", "", s)
    return s


def _run_text(spark, rows, col):
    df = spark.createDataFrame([(r,) for r in rows], "s string")
    return [r[0] for r in df.select(col(F.col("s")).alias("o")).collect()]


@settings(max_examples=8, deadline=None)
@given(st.lists(ASCII, min_size=1, max_size=24))
def test_clean_text_matches_reference_regexes(spark, rows):
    got = _run_text(spark, rows, clean_text)
    assert got == [ref_clean_text(r) for r in rows]


@settings(max_examples=8, deadline=None)
@given(st.lists(TOKENS, min_size=1, max_size=24))
def test_pairwise_bigrams_matches_reference(spark, tok_lists):
    df = spark.createDataFrame([(t,) for t in tok_lists], "t array<string>")
    got = [
        [list(p) for p in r[0]]
        for r in df.select(pairwise_bigrams(F.col("t")).alias("o")).collect()
    ]
    for toks, out in zip(tok_lists, got):
        a, b = itertools.tee(toks)
        next(b, None)
        expect = [sorted([x, y]) for x, y in zip(a, b)]
        assert out == expect


@settings(max_examples=8, deadline=None)
@given(st.lists(TOKENS, min_size=1, max_size=24))
def test_remove_stopwords_preserves_dups_and_order(spark, tok_lists):
    df = spark.createDataFrame([(t,) for t in tok_lists], "t array<string>")
    got = [
        list(r[0])
        for r in df.select(remove_stopwords(F.col("t")).alias("o")).collect()
    ]
    sw = set(STOPWORDS)
    for toks, out in zip(tok_lists, got):
        assert out == [t for t in toks if t not in sw]  # listcomp semantics


@settings(max_examples=6, deadline=None)
@given(st.lists(ASCII, min_size=1, max_size=24))
def test_quality_score_bounded(spark, rows):
    df = spark.createDataFrame([(r,) for r in rows], "s string")
    q = quality_score(F.col("s"))
    out = df.select(q["quality"].alias("q"), q["punct_ratio"].alias("p")).collect()
    for r in out:
        assert 0.0 <= r.q <= 1.0
        assert 0.0 <= r.p <= 1.0


@settings(max_examples=6, deadline=None)
@given(st.lists(ASCII, min_size=1, max_size=24))
def test_tokenize_no_empty_tokens(spark, rows):
    got = _run_text(spark, rows, tokenize_ws)
    for toks in got:
        assert "" not in list(toks)


@settings(max_examples=8, deadline=None)
@given(
    n_tokens=st.integers(min_value=0, max_value=200),
    size=st.integers(min_value=2, max_value=20),
)
def test_chunk_tokens_reconstruct(spark, n_tokens, size):
    """Chunking invariants for any (token count, window size) with
    stride = size * 3 // 4: (1) the first chunk plus each subsequent
    chunk's tail past the overlap reconstructs the exact token stream;
    (2) every chunk except the last is full-size; (3) chunk_ids are
    dense from 0."""
    from ingestion_scripts_spark.operators.text_analysis import chunk_tokens

    stride = max(1, size * 3 // 4)
    toks = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id bigint, text string")
    rows = sorted(
        chunk_tokens(df, "doc_id", "text", size=size, stride=stride).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.chunk_id for r in rows] == list(range(len(rows)))
    rebuilt = []
    for r in rows:
        ctoks = r.chunk_text.split(" ") if r.chunk_text else []
        assert len(ctoks) == r.n_chunk_tokens
        start = r.chunk_id * stride
        rebuilt = rebuilt[:start] + ctoks
    assert rebuilt == toks
    for r in rows[:-1]:
        assert r.n_chunk_tokens == size
