"""lang-ID, quality, token counts, fingerprints, winnowing; sentiment
determinism; hypothesis property tests for clean_text."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ingestion_scripts_spark.functions import sentiment as S
from ingestion_scripts_spark.functions import text as X
from ingestion_scripts_spark.operators import text_analysis as TA


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_lang_id(spark):
    assert _one(spark, TA.lang_id(F.lit("the cat and the dog of it"))) == "en"
    assert _one(spark, TA.lang_id(F.lit("der hund und die katze ist"))) == "de"
    assert _one(spark, TA.lang_id(F.lit("zzz qqq www"))) == "und"
    # tie → alphabetically first language
    assert _one(spark, TA.lang_id(F.lit("the und"))) == "de"


def test_token_counts(spark):
    assert _one(spark, TA.token_count_ws(F.lit("a b  c"))) == 3
    assert _one(spark, TA.token_count_bpe(F.lit("hello, world! x2"))) == 5


def test_quality_score_fields(spark):
    q = _one(spark, TA.quality_score(F.lit("clean simple words here again")))
    assert q.n_tokens == 5
    assert q.punct_ratio == 0.0
    assert 0.0 <= q.quality <= 1.0


def test_fingerprint_stable(spark):
    a = _one(spark, TA.fingerprint(F.lit("abc")))
    assert a == 648541476951500027  # pinned md5-prefix value


def test_winnow_fingerprints(spark):
    v = _one(spark, TA.winnow_fingerprints(F.lit("a b c d e f g h i j k l")))
    assert len(v) >= 1
    w = _one(spark, TA.winnow_fingerprints(F.lit("short")))
    assert w == []


def test_sentiment_native_signs(spark):
    pos = _one(spark, S.sentiment_native(F.lit("this is good great awesome")))
    neg = _one(spark, S.sentiment_native(F.lit("bad terrible awful crash")))
    neu = _one(spark, S.sentiment_native(F.lit("table chair window")))
    assert pos.compound > 0 > neg.compound
    assert neu.compound == 0.0
    assert abs(pos.negative + pos.neutral + pos.positive - 1.0) < 1e-6


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=80))
def test_clean_text_property(spark, s):
    import re, string
    out = _one(spark, X.clean_text(F.lit(s)))
    ref = s.lower()
    ref = re.sub("\\[.*?\\]", "", ref)
    ref = re.sub("[%s]" % re.escape(string.punctuation), "", ref)
    ref = re.sub("\\w*\\d\\w*", "", ref)
    assert out == ref


def test_scrub_pii(spark):
    p = TA.scrub_pii(
        F.lit("mail a.b@x.org or 010-555-1234 see https://x.org/p now")
    )
    row = spark.range(1).select(
        p["scrubbed"].alias("s"), p["n_emails"].alias("e"),
        p["n_phones"].alias("p"), p["n_urls"].alias("u"),
    ).collect()[0]
    assert row.s == "mail <EMAIL> or <PHONE> see <URL> now"
    assert (row.e, row.p, row.u) == (1, 1, 1)


def test_repetition_signals(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "u v w x y z")], "doc_id int, text string"
    )
    got = {r.doc_id: r for r in TA.repetition_signals(df, "doc_id", "text").collect()}
    # doc 1: 6 tokens, 2 distinct → dup 0.6667; "a b" appears 3× of 5 bigrams
    assert got[1].n_tokens == 6
    assert got[1].dup_token_frac == 0.6667
    assert got[1].top_bigram_frac == 1.0  # 3*2/6
    assert got[2].dup_token_frac == 0.0
    assert got[2].top_bigram_frac == round(2 / 6, 4)


def test_ngram_contamination(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "v w x y z")], "doc_id int, text string"
    )
    bench = spark.createDataFrame([("a b c",), ("b c d",)], "shingle string")
    got = {r.doc_id: r for r in
           TA.ngram_contamination(docs, bench, "doc_id", "text").collect()}
    assert got[1].n_shingles == 3 and got[1].n_contaminated == 2
    assert got[1].contam_frac == 0.6667
    assert got[2].n_contaminated == 0 and got[2].contam_frac == 0.0


def test_stratified_sample_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(200)],
        "doc_id int, lang string",
    )
    a = sorted(r.doc_id for r in
               TA.stratified_sample(df, "lang", "doc_id", {"en": 10}, 50).collect())
    b = sorted(r.doc_id for r in
               TA.stratified_sample(df.repartition(7), "lang", "doc_id",
                                    {"en": 10}, 50).collect())
    assert a == b  # partitioning-independent (df.sample is not)
    en = sum(1 for i in a if i % 2 == 0)
    fr = len(a) - en
    assert en < fr  # 10% stratum really is downsampled vs 50%


def test_approx_sketches_within_tolerance(spark):
    """The 100 TB path uses sketches (HLL count-distinct, approx quantiles);
    they are engine-side only (not oracle-comparable across engines) but must
    track the exact answers within their error bounds."""
    from ingestion_scripts_spark.sources.readers import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("p50a"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= max(3, 0.05 * row.exact)
    assert abs(row.p50a - row.p50) <= max(0.01, 0.05 * abs(row.p50))


def test_chunk_tokens_windows_and_overlap(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100))), (2, "a b c"), (3, "")],
        "doc_id bigint, text string",
    )
    out = {
        (r.doc_id, r.chunk_id): r
        for r in TA.chunk_tokens(df, "doc_id", "text", size=64, stride=48).collect()
    }
    # doc 1: 100 tokens -> windows starting at 0 and 48
    assert {k for k in out if k[0] == 1} == {(1, 0), (1, 1)}
    assert out[(1, 0)].n_chunk_tokens == 64
    assert out[(1, 1)].n_chunk_tokens == 52
    assert out[(1, 0)].chunk_text.split(" ")[48:] == out[(1, 1)].chunk_text.split(" ")[:16]
    # short doc: one partial window; empty doc: one empty chunk
    assert out[(2, 0)].n_chunk_tokens == 3
    assert {k for k in out if k[0] == 2} == {(2, 0)}
    assert out[(3, 0)].n_chunk_tokens == 0 and out[(3, 0)].chunk_text == ""


def test_priority_sample_deterministic_and_weighted(spark):
    rows = [(i, 1.0 if i < 50 else 1000.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    pick = lambda d: sorted(
        r.doc_id
        for r in TA.priority_sample(d, "doc_id", F.col("w"), k=20).collect()
    )
    got = pick(df)
    # deterministic under repartitioning (no RNG state)
    assert got == pick(df.repartition(7))
    # heavy weights dominate the sample: ids >= 50 carry 1000x weight
    assert sum(1 for i in got if i >= 50) >= 18


def test_gopher_rules_verdicts(spark):
    good = "the quick brown fox jumps over the lazy dog and runs to town"
    g = _one(spark, TA.gopher_rules(F.lit(good)))
    assert g.keep == 1 and g.stop_hits >= 1
    # too short
    assert _one(spark, TA.gopher_rules(F.lit("hi there"))).keep == 0
    # symbol-heavy
    spam = "the of # # # # # # # # # # and # # # # # # # # to # # #"
    assert _one(spark, TA.gopher_rules(F.lit(spam))).keep == 0
    # no required stopwords
    assert _one(spark, TA.gopher_rules(F.lit("lorem ipsum dolor sit amet foo bar"))).keep == 0
