"""Law tests for the r12 additions (ledgered in tests/law_ledger.py).

- snapshot_band_delta: the IVM law itself — the incremental pair delta
  (delta band buckets against the maintained table) must equal the diff
  of two INDEPENDENT full recomputes (``minhash_dedup_pairs`` per
  snapshot), on a corpus engineered with formed, dissolved, AND
  surviving near-dup pairs; plus the maintained-band-table identity
  B' = bands(snapshot2).
- span_removal_apply: the conservation law (len(tokenize(text_clean)) =
  n_tokens − n_removed, row for row), agreement with span_removal_plan,
  and first-occurrence semantics on a hand-built corpus.
- calibration_drift: composition law against calibration_bins (per-
  bucket ECE identical), baseline-drift-zero, and drift-zero when two
  buckets carry identical score/label distributions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestion_scripts_spark.functions.text import tokenize_ws
from ingestion_scripts_spark.operators.dedup import (
    banded_buckets,
    minhash_dedup_pairs,
    snapshot_band_delta,
)
from ingestion_scripts_spark.operators.profiling import (
    calibration_bins,
    calibration_drift,
)
from ingestion_scripts_spark.operators.spans import (
    span_removal_apply,
    span_removal_plan,
)


def _corpus(spark):
    """base: 1..6; inserts: 101, 102; deletes: 2, 5.

    Near-dup structure (texts long enough for stable shingles):
    - 1 ≈ 2  → dissolved (2 deleted)
    - 3 ≈ 4  → surviving (must appear in NEITHER delta)
    - 5 ≈ 6  → dissolved (5 deleted)
    - 101 ≈ 6, 101 ≈ 102 → formed (insert-survivor, insert-insert)
    """
    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t2 = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    t3 = "one two three four five six seven eight nine ten eleven"
    t4 = "one two three four five six seven eight nine ten twelve"
    t5 = "red orange yellow green blue indigo violet cyan magenta pink"
    t6 = "red orange yellow green blue indigo violet cyan magenta teal"
    t101 = "red orange yellow green blue indigo violet cyan magenta gray"
    t102 = "red orange yellow green blue indigo violet cyan magenta grey"
    base = spark.createDataFrame(
        [(1, t1), (2, t2), (3, t3), (4, t4), (5, t5), (6, t6)],
        "doc_id long, text string",
    )
    inserts = spark.createDataFrame(
        [(101, t101), (102, t102)], "doc_id long, text string"
    )
    deletes = spark.createDataFrame([(2,), (5,)], "doc_id long")
    return base, inserts, deletes


def test_snapshot_band_delta_equals_full_recompute_diff(spark):
    base, inserts, deletes = _corpus(spark)
    got = {
        (r.id1, r.id2, r.status)
        for r in snapshot_band_delta(
            base, inserts, deletes, threshold=0.5
        ).collect()
    }

    # independent full recompute per snapshot via the standalone batch op
    snap2 = base.join(deletes, "doc_id", "left_anti").unionByName(inserts)
    p1 = {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs(base, "doc_id", "text", 0.5).collect()
    }
    p2 = {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs(snap2, "doc_id", "text", 0.5).collect()
    }
    want = {(a, b, "formed") for (a, b) in p2 - p1} | {
        (a, b, "dissolved") for (a, b) in p1 - p2
    }
    assert got == want
    # the engineered structure actually exercised all three pair fates
    statuses = {s for (_, _, s) in got}
    assert statuses == {"formed", "dissolved"}
    assert (3, 4) in p1 and (3, 4) in p2  # surviving pair stayed out


def test_snapshot_maintained_band_table_identity(spark):
    base, inserts, deletes = _corpus(spark)
    snap2 = base.join(deletes, "doc_id", "left_anti").unionByName(inserts)
    bb_maint = (
        banded_buckets(base, "doc_id", "text")
        .join(deletes, "doc_id", "left_anti")
        .unionByName(banded_buckets(inserts, "doc_id", "text"))
    )
    want = {
        (r.doc_id, r.band, r.bucket)
        for r in banded_buckets(snap2, "doc_id", "text").collect()
    }
    got = {(r.doc_id, r.band, r.bucket) for r in bb_maint.collect()}
    assert got == want and len(got) > 0


def test_span_removal_apply_conservation_law(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "intro words the quick brown fox jumps and more text"),
            (3, "the quick brown fox jumps over the lazy dog today"),
            (4, "completely unrelated text with no duplicate runs at all"),
        ],
        "doc_id long, text string",
    )
    out = span_removal_apply(docs, k=5).collect()
    assert len(out) == 4
    for r in out:
        toks = [t for t in r.text_clean.split(" ") if t != ""]
        assert len(toks) == r.n_tokens - r.n_removed, r
    by_id = {r.doc_id: r for r in out}
    # doc 1 is the globally-first occurrence holder: nothing removed
    assert by_id[1].n_removed == 0
    assert by_id[1].text_clean == docs.collect()[0].text.lower()
    # doc 3 duplicates doc 1 entirely: fully excised
    assert by_id[3].n_removed == by_id[3].n_tokens
    assert by_id[3].text_clean == ""
    # doc 2 shares exactly 'the quick brown fox jumps' (one 5-span)
    assert by_id[2].n_removed == 5
    assert "quick" not in by_id[2].text_clean
    assert by_id[2].text_clean.startswith("intro words")
    # doc 4: untouched pass-through
    assert by_id[4].n_removed == 0


def test_span_removal_apply_agrees_with_plan(spark):
    docs = spark.createDataFrame(
        [
            (i, f"prefix {i % 3} shared run of tokens here tail {i}")
            for i in range(12)
        ],
        "doc_id long, text string",
    )
    plan = {
        (r.doc_id, r.n_tokens, r.n_removed)
        for r in span_removal_plan(docs, k=5).collect()
    }
    apply_ = {
        (r.doc_id, r.n_tokens, r.n_removed)
        for r in span_removal_apply(docs, k=5).collect()
    }
    assert plan == apply_


def test_calibration_drift_composes_calibration_bins(spark):
    rows = [
        (b, (i * 97) % 1000000, 1 if (i * 31) % 100 < 40 + 10 * b else 0)
        for b in range(3)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "b long, s long, y int")
    out = {
        r.bucket: (r.n, r.ece_u, r.n_bins_shared, r.drift_u)
        for r in calibration_drift(
            df, F.col("b"), F.col("s"), F.col("y")
        ).collect()
    }
    assert set(out) == {0, 1, 2}
    # per-bucket ECE must equal calibration_bins' Σece_num div Σn
    for b in range(3):
        sub = df.filter(F.col("b") == b)
        bins = calibration_bins(sub, F.col("s"), F.col("y")).agg(
            F.expr("CAST(sum(ece_num) div sum(n) AS BIGINT)").alias("ece"),
            F.sum("n").alias("n"),
        ).collect()[0]
        assert out[b][0] == bins.n
        assert out[b][1] == bins.ece
    # baseline bucket drifts zero against itself; later buckets move
    assert out[0][3] == 0
    assert out[1][3] > 0 and out[2][3] > 0


def test_calibration_drift_zero_for_identical_buckets(spark):
    rows = [
        (b, (i * 131) % 1000000, 1 if (i * 17) % 10 < 5 else 0)
        for b in range(2)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "b long, s long, y int")
    out = {
        r.bucket: r.drift_u
        for r in calibration_drift(
            df, F.col("b"), F.col("s"), F.col("y")
        ).collect()
    }
    assert out == {0: 0, 1: 0}
