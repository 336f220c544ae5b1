"""Differential test of A1/A2 against a literal reimplementation of the
reference's Counter/pairwise/structure_keywords chain
(``src/reddit_consumer.py:67-77,139-155``)."""

import collections
import itertools

from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.keywords import extract_keywords


def ref_pairwise(iterable):
    a, b = itertools.tee(iterable)
    next(b, None)
    return ((x, y) if x < y else (y, x) for x, y in zip(a, b))


def ref_keywords(words, k=5):
    # deterministic variant: ties break (count desc, bigram asc) — the
    # engine's documented tiebreak (SURVEY.md §2.5 A1)
    counts = collections.Counter(ref_pairwise(words))
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    flat = sum((kv[0] for kv in top), ())
    return list(dict.fromkeys(flat))


def test_extract_keywords_matches_reference(spark):
    rows = [
        (1, ["fast", "car", "fast", "car", "fast", "boat", "zz"]),
        (2, ["a", "b", "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l"]),
        (3, ["x"]),          # too short for bigrams → absent from output
        (4, []),             # empty → absent
    ]
    df = spark.createDataFrame(rows, "id int, toks array<string>")
    got = {
        r.id: list(r.keywords)
        for r in extract_keywords(df, "id", "toks", k=5).collect()
    }
    for rid, toks in rows:
        expect = ref_keywords(toks)
        if expect:
            assert got[rid] == expect, f"id={rid}"
        else:
            assert rid not in got


def test_tie_break_is_count_desc_then_bigram_asc(spark):
    # all bigrams count 1 → purely lexicographic: canonical pairs sorted
    # ascending, so top-2 = ("a","b"), ("a","z") → flatten-dedup [a, b, z]
    toks = ["d", "c", "b", "a", "z", "y", "x", "w", "v", "u", "t", "s"]
    df = spark.createDataFrame([(1, toks)], "id int, toks array<string>")
    out = extract_keywords(df, "id", "toks", k=2).collect()[0].keywords
    assert list(out) == ref_keywords(toks, k=2) == ["a", "b", "z"]


def test_tfidf_top_terms(spark):
    """A corpus-unique term must outrank terms shared across all docs."""
    from ingestion_scripts_spark.operators.keywords import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common unique unique"),
            (2, "common common other words"),
            (3, "common stuff more words"),
        ],
        "doc_id int, text string",
    )
    top1 = {
        r.doc_id: r.term
        for r in tfidf_top_terms(docs, "doc_id", "text", k=1).collect()
    }
    # 'unique': tf 2/3 · idf ln(4/2)+1 ≈ 1.13 beats 'common': tf 1/3 · idf 1
    assert top1[1] == "unique"
