"""Container-level MinHash laws: identical containers agree on every
seed; disjoint vocabularies agree on none; estimator is n_agree/16."""

from ingestion_scripts_spark.operators.dedup import container_minhash_pairs


def test_identical_containers_fully_agree(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, "a", text), (2, "b", text), (3, "c", "one two three four five six")],
        "doc_id bigint, src string, text string",
    )
    got = {
        (r.src_a, r.src_b): (r.n_agree, r.est_jaccard)
        for r in container_minhash_pairs(df, "src", "text").collect()
    }
    assert got[("a", "b")] == (16, 1.0)  # same shingle set → same signature
    assert got[("a", "c")][0] == 0  # disjoint vocabulary
    assert got[("b", "c")][0] == 0


def test_union_of_docs_defines_the_signature(spark):
    # container 'a' split across two docs == container 'b' in one doc
    df = spark.createDataFrame(
        [
            (1, "a", "red green blue cyan magenta"),
            (2, "a", "yellow black white gray pink"),
            (3, "b", "red green blue cyan magenta yellow black white gray pink"),
        ],
        "doc_id bigint, src string, text string",
    )
    rows = container_minhash_pairs(df, "src", "text").collect()
    # NOT necessarily 16/16: shingles cross doc boundaries in 'b' only.
    # But the signature must be the min over each container's union, so
    # agreement must be high (>= half) and symmetric output shape holds.
    assert len(rows) == 1
    assert rows[0].n_agree >= 8
