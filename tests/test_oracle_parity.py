"""Cross-engine property tests: for random ASCII inputs, each Spark operator
must produce EXACTLY what its oracle.py DuckDB twin produces — the same
differential the driver runs on real data, but on adversarial generated
inputs (quotes, brackets, punctuation runs, digit-words, empty strings)."""

import string

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ingestion_scripts_spark import oracle as O
from ingestion_scripts_spark.functions import sentiment as S
from ingestion_scripts_spark.functions import text as X
from ingestion_scripts_spark.functions.nlp import keywords_native, summary_native
from ingestion_scripts_spark.operators import dedup as D
from ingestion_scripts_spark.operators import text_analysis as TA

ASCII = st.text(alphabet=string.printable.replace("\r", ""), max_size=100)

CASES = [
    ("clean_text", lambda c: X.clean_text(c), O.sql_clean_text),
    ("tokens", lambda c: X.remove_stopwords(X.tokenize_ws(X.clean_text(c))),
     lambda x: O.sql_remove_stopwords(O.sql_tokenize_ws(O.sql_clean_text(x)))),
    ("hashtags", lambda c: X.extract_hashtags(c), O.sql_hashtags),
    ("summary", lambda c: summary_native(c), O.sql_summary),
    ("keywords", lambda c: keywords_native(c), O.sql_keywords_native),
    ("compound", lambda c: S.sentiment_native(c)["compound"],
     lambda x: O.sql_sentiment(x)["compound"]),
    ("sent_neg", lambda c: S.sentiment_native(c)["negative"],
     lambda x: O.sql_sentiment(x)["negative"]),
    ("sent_pos", lambda c: S.sentiment_native(c)["positive"],
     lambda x: O.sql_sentiment(x)["positive"]),
    ("sent_neu", lambda c: S.sentiment_native(c)["neutral"],
     lambda x: O.sql_sentiment(x)["neutral"]),
    ("stop_ratio", lambda c: TA.quality_score(c)["stop_ratio"],
     lambda x: O.sql_quality(x)["stop_ratio"]),
    ("lang", lambda c: TA.lang_id(c), O.sql_lang_id),
    ("hash64", lambda c: TA.fingerprint(c), O.sql_hash64),
    ("winnow", lambda c: F.array_sort(TA.winnow_fingerprints(c)), O.sql_winnow),
    ("simhash", lambda c: D.simhash(c), O.sql_simhash),
    ("bpe_count", lambda c: TA.token_count_bpe(c).cast("bigint"), O.sql_token_count_bpe),
    ("bigrams", lambda c: F.transform(
        X.pairwise_bigrams(X.tokenize_ws(c)), lambda p: F.concat_ws(" ", p)),
     lambda x: O.sql_bigrams(O.sql_tokenize_ws(x))),
    ("shingles", lambda c: F.array_sort(D.shingles(c, 3)),
     lambda x: f"list_sort({O.sql_shingles(x, 3)})"),
    # empty shingle sets: Spark yields [null x 16] (array_min of empty), the
    # pipeline filters them; compare only the non-empty case on both sides
    ("minhash_sig", lambda c: F.when(
        F.size(D.shingles(c, 3)) > 0, D.minhash_signature(D.shingles(c, 3))
    ).otherwise(F.array().cast("array<bigint>")),
     lambda x: f"CASE WHEN len({O.sql_shingles(x, 3)}) > 0 THEN "
               f"{O.sql_minhash_signature(O.sql_shingles(x, 3))} "
               f"ELSE CAST([] AS BIGINT[]) END"),
    ("quality", lambda c: TA.quality_score(c)["quality"],
     lambda x: O.sql_quality(x)["quality"]),
    ("gate_score", lambda c: TA.quality_classify(c)["gate_score"],
     lambda x: O.sql_quality_classify(x)["gate_score"]),
    ("gate_keep", lambda c: TA.quality_classify(c)["keep"],
     lambda x: O.sql_quality_classify(x)["keep"]),
    ("gopher_mtl", lambda c: TA.gopher_rules(c)["mean_token_len"],
     lambda x: O.sql_gopher(x)["mean_token_len"]),
    ("gopher_alpha", lambda c: TA.gopher_rules(c)["alpha_frac"],
     lambda x: O.sql_gopher(x)["alpha_frac"]),
    ("gopher_stop_hits", lambda c: TA.gopher_rules(c)["stop_hits"],
     lambda x: O.sql_gopher(x)["stop_hits"]),
    ("gopher_keep", lambda c: TA.gopher_rules(c)["keep"],
     lambda x: O.sql_gopher(x)["keep"]),
]


def _canon(v):
    if isinstance(v, (list, tuple)):
        return [_canon(x) for x in v]
    return v


@pytest.mark.parametrize("name,spark_fn,sql_fn", CASES, ids=[c[0] for c in CASES])
@settings(max_examples=5, deadline=None)
@given(rows=st.lists(ASCII, min_size=1, max_size=30))
def test_spark_matches_duckdb(spark, name, spark_fn, sql_fn, rows):
    sdf = spark.createDataFrame([(i, r) for i, r in enumerate(rows)], "i int, s string")
    got = {
        r.i: _canon(r.o)
        for r in sdf.select("i", spark_fn(F.col("s")).alias("o")).collect()
    }
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"i": range(len(rows)), "s": rows}))
    expect = {
        i: _canon(o)
        for i, o in con.execute(f"SELECT i, {sql_fn('s')} FROM t").fetchall()
    }
    assert got == expect
