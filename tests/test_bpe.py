"""BPE merge training: greedy left-to-right merge semantics, frequency
argmax with deterministic tiebreak, merge-table shape."""

from ingestion_scripts_spark.operators.bpe import bpe_fit


def test_bpe_learns_expected_merges(spark):
    # 'aaab' x3 and 'abab' x2 after clean_text stay as-is (lowercase alpha)
    docs = spark.createDataFrame(
        [(1, "aaab aaab aaab abab abab")], "doc_id bigint, text string"
    )
    got = [(r.rank, r.pair, r.merged) for r in bpe_fit(spark, docs, n_merges=3).collect()]
    # pair counts round 1 (word freqs: aaab x3, abab x2):
    #   (a)(a): 2*3=6   (a)(b): 3 + 2*2 = 7   (b)(a): 2  -> merge (a)(b)
    assert got[0] == (1, "(a)(b)", "ab")
    # round 2: aaab -> (a)(a)(ab) x3, abab -> (ab)(ab) x2:
    #   (a)(a): 3, (a)(ab): 3, (ab)(ab): 2 -> tie 3 vs 3, lexicographic:
    #   '(a)(a)' < '(a)(ab)'  -> merge (a)(a)
    assert got[1] == (2, "(a)(a)", "aa")
    # round 3: (aa)(ab) x3, (ab)(ab) x2 -> merge (aa)(ab)
    assert got[2] == (3, "(aa)(ab)", "aaab")


def test_bpe_greedy_nonoverlapping(spark):
    # [a a a a] must merge to [aa aa], not [aa a a]
    docs = spark.createDataFrame([(1, "aaaa")], "doc_id bigint, text string")
    got = [(r.pair, r.merged) for r in bpe_fit(spark, docs, n_merges=2).collect()]
    assert got[0] == ("(a)(a)", "aa")
    assert got[1] == ("(aa)(aa)", "aaaa")


def test_bpe_apply_counts(spark):
    from ingestion_scripts_spark.operators.bpe import bpe_apply

    docs = spark.createDataFrame(
        [(1, "aaab aaab abab"), (2, "xy xy")], "doc_id bigint, text string"
    )
    got = {r.doc_id: r for r in bpe_apply(spark, docs, n_merges=2).collect()}
    assert got[1].n_words == 3
    # merges learned on this corpus: (a)(b) then (a)(a) ->
    # aaab = (a)(aa... wait, chain order: ab first: (a)(a)(ab); then aa:
    # (aa)(ab) = 2 symbols; abab = (ab)(ab) = 2 symbols
    assert got[1].n_bpe_tokens == 2 + 2 + 2
    # 'xy' never merged at n_merges=2 on this corpus -> 2 chars each
    assert got[2].n_bpe_tokens == 4
