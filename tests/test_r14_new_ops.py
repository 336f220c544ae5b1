"""Law tests for the r14 additions (ledgered in tests/law_ledger.py).

- capped_band_roll: cap ≥ widest bucket ≡ snapshot_band_roll exactly
  (delta AND next table AND all-zero skipped audit); the accounting law
  kept + skipped == band_table_stats pair_mass per (side, band); and the
  adversarial skew probe — one degenerate boilerplate bucket makes the
  uncapped roll pay w candidate pairs while the capped roll pays zero
  and ACCOUNTS the skipped mass exactly (the 100 TB story: the quadratic
  term is bounded, named, and observable, never silent).
- chunk_store_roll: parquet round-trip roll ≡ build_chunk_store of
  snapshot2 from scratch; rolls COMPOSE (two sequential rolls ≡ one
  build of the final snapshot — the unrolled-batch template of
  test_r13_new_ops.py::test_stream_snapshot_roll_equals_batch_composition);
  report reconstructs the from-scratch store diff; corpus/store desync
  fails loudly.
- cdc_chunks_clamped: clamp (1, ∞) ≡ the basic scheme row-for-row; every
  chunk length in [min, max] except the sanctioned doc tail (≤ max
  always); chunks still partition the token stream; pure-python
  sequential reference equality (including adversarial low-entropy runs,
  where the basic scheme degenerates and the clamps must bound chunk
  length by construction).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.chunking import (
    build_chunk_store,
    cdc_chunks,
    cdc_chunks_clamped,
    chunk_store_roll,
)
from ingestion_scripts_spark.operators.dedup import (
    band_table_stats,
    banded_buckets,
    capped_band_roll,
    snapshot_band_roll,
)


# --------------------------------------------------------------------------
# capped band roll laws
# --------------------------------------------------------------------------

def _roll_corpus(spark):
    """Same engineered formed/dissolved structure as the r13 roll tests."""
    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t2 = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    t3 = "one two three four five six seven eight nine ten eleven"
    t4 = "one two three four five six seven eight nine ten twelve"
    t5 = "red orange yellow green blue indigo violet cyan magenta pink"
    t6 = "red orange yellow green blue indigo violet cyan magenta teal"
    t101 = "red orange yellow green blue indigo violet cyan magenta gray"
    base = spark.createDataFrame(
        [(1, t1), (2, t2), (3, t3), (4, t4), (5, t5), (6, t6)],
        "doc_id long, text string",
    )
    inserts = spark.createDataFrame([(101, t101)], "doc_id long, text string")
    deletes = spark.createDataFrame([(2,), (5,)], "doc_id long")
    return base, inserts, deletes


def test_capped_roll_with_loose_cap_equals_uncapped(spark):
    base, inserts, deletes = _roll_corpus(spark)
    bb = banded_buckets(base, "doc_id", "text")
    texts = base.unionByName(inserts)
    nb0, d0 = snapshot_band_roll(bb, texts, inserts, deletes, threshold=0.5)
    nb1, d1, audit = capped_band_roll(
        bb, texts, inserts, deletes, threshold=0.5, max_bucket_width=10_000
    )
    want = {(r.id1, r.id2, r.jaccard, r.status) for r in d0.collect()}
    got = {(r.id1, r.id2, r.jaccard, r.status) for r in d1.collect()}
    assert got == want and len(got) > 0
    assert {(r.doc_id, r.band, r.bucket) for r in nb1.collect()} == {
        (r.doc_id, r.band, r.bucket) for r in nb0.collect()
    }
    rows = audit.collect()
    assert rows and all(r.n_hot_buckets == 0 for r in rows)
    assert all(r.skipped_pair_mass == 0 for r in rows)


def test_capped_roll_accounting_exact(spark):
    base, inserts, deletes = _roll_corpus(spark)
    bb = banded_buckets(base, "doc_id", "text")
    texts = base.unionByName(inserts)
    nb, _, audit = capped_band_roll(
        bb, texts, inserts, deletes, threshold=0.5, max_bucket_width=1
    )
    acc = {
        (r.side, r.band): (r.kept_pair_mass, r.skipped_pair_mass)
        for r in audit.collect()
    }
    for side, table in (("next", nb), ("base", bb)):
        for r in band_table_stats(table).collect():
            kept, skipped = acc[(side, r.band)]
            assert kept + skipped == r.pair_mass
    assert sum(s for _, s in acc.values()) > 0  # cap=1 binds here


def test_capped_roll_stops_degenerate_bucket_and_accounts_it(spark):
    """Adversarial skew probe (VERDICT r13 item 2): 40 boilerplate clones
    share every band bucket; inserting clone #41 makes the uncapped roll
    enumerate 40 candidate pairs through the hot bucket, while the capped
    roll generates NONE of them — and the audit charges the skipped mass
    exactly (4 bands × C(41,2) from the degenerate bucket)."""
    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    uniq = "completely different tokens about rivers mountains and valleys"
    base = spark.createDataFrame(
        [(i, boiler) for i in range(1, 41)] + [(90, uniq)],
        "doc_id long, text string",
    )
    inserts = spark.createDataFrame([(101, boiler)], "doc_id long, text string")
    deletes = spark.createDataFrame([], "doc_id long")
    bb = banded_buckets(base, "doc_id", "text")
    texts = base.unionByName(inserts)

    _, d0 = snapshot_band_roll(bb, texts, inserts, deletes, threshold=0.8)
    assert d0.count() == 40  # uncapped pays the hot bucket

    _, d1, audit = capped_band_roll(
        bb, texts, inserts, deletes, threshold=0.8, max_bucket_width=8
    )
    assert d1.count() == 0  # stop-bucket: zero candidates generated
    nxt = {r.band: r for r in audit.collect() if r.side == "next"}
    assert len(nxt) == 4
    for r in nxt.values():
        # the clone bucket holds all 41 boilerplate docs in every band
        assert r.n_hot_buckets >= 1
        assert r.skipped_pair_mass >= 41 * 40 // 2
    # nothing else in this corpus pairs up: kept mass is zero everywhere
    assert all(r.kept_pair_mass == 0 for r in nxt.values())


def test_capped_roll_validates_against_base_ids(spark):
    """ADVICE r13: a short (< n_shingle tokens) base doc has no band rows,
    so the band-table probe alone would miss an insert-id collision with
    it; the base_ids path must catch it."""
    base, inserts, deletes = _roll_corpus(spark)
    short = spark.createDataFrame([(7, "tiny doc")], "doc_id long, text string")
    base = base.unionByName(short)
    bb = banded_buckets(base, "doc_id", "text")  # id 7 absent: too short
    colliding = spark.createDataFrame(
        [(7, "tiny doc rewritten entirely")], "doc_id long, text string"
    )
    texts = base.unionByName(colliding)
    # band-table probe: collision passes silently (the documented gap)
    _ = snapshot_band_roll(bb, texts, colliding, deletes, threshold=0.5)
    # base_ids probe: fails loudly
    with pytest.raises(ValueError, match="already present in base"):
        capped_band_roll(
            bb, texts, colliding, deletes, threshold=0.5,
            max_bucket_width=8, base_ids=base.select("doc_id"),
        )
    with pytest.raises(ValueError, match="already present in base"):
        snapshot_band_roll(
            bb, texts, colliding, deletes, threshold=0.5,
            base_ids=base.select("doc_id"),
        )


# --------------------------------------------------------------------------
# chunk store roll laws
# --------------------------------------------------------------------------

def _store_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    base = docs.filter(F.col("doc_id") % 4 != 0)
    inserts = docs.filter(F.col("doc_id") % 4 == 0)
    deletes = base.filter(F.col("doc_id") % 9 == 0).select("doc_id")
    return base, inserts, deletes


def _store_set(df):
    return {(r.chunk_hash, r.chunk_len, r.refcount) for r in df.collect()}


def test_chunk_store_roll_parquet_roundtrip_matches_recompute(spark, tmp_path):
    base, inserts, deletes = _store_corpus(spark)
    build_chunk_store(base).write.parquet(str(tmp_path / "store_v1"))
    store1 = spark.read.parquet(str(tmp_path / "store_v1"))
    new_store, report = chunk_store_roll(store1, base, inserts, deletes)

    snap2 = base.join(deletes, "doc_id", "left_anti").unionByName(inserts)
    assert _store_set(new_store) == _store_set(build_chunk_store(snap2))

    # report reconstructs the from-scratch store diff exactly
    s1 = {r.chunk_hash: (r.chunk_len, r.refcount)
          for r in build_chunk_store(base).collect()}
    s2 = {r.chunk_hash: (r.chunk_len, r.refcount)
          for r in build_chunk_store(snap2).collect()}
    want = {}
    for status, hashes, snap in (
        ("added", set(s2) - set(s1), s2),
        ("removed", set(s1) - set(s2), s1),
        ("retained", set(s1) & set(s2), s2),
    ):
        if hashes:
            stored = sum(snap[h][0] for h in hashes)
            logical = sum(snap[h][0] * snap[h][1] for h in hashes)
            want[status] = (len(hashes), stored, logical, logical - stored)
    got = {
        r.status: (r.n_hashes, r.stored_tokens, r.logical_tokens, r.dup_tokens)
        for r in report.collect()
    }
    assert got == want and set(got) == {"added", "removed", "retained"}


def test_chunk_store_rolls_compose(spark):
    """Two sequential rolls ≡ one build of the final snapshot — the
    unrolled-batch law, so a continuous crawl can maintain the store
    forever without drift."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    m0 = docs.filter(F.col("doc_id") % 3 == 0)
    store = build_chunk_store(m0)
    corpus = m0
    for b in (1, 2):
        inserts = docs.filter(F.col("doc_id") % 3 == b)
        retire = corpus.filter(F.col("doc_id") % 7 == b).select("doc_id")
        store, _ = chunk_store_roll(store, corpus, inserts, retire)
        corpus = corpus.join(retire, "doc_id", "left_anti").unionByName(inserts)
    assert _store_set(store) == _store_set(build_chunk_store(corpus))


def test_chunk_store_roll_desync_fails_loudly(spark):
    """A retired doc carrying chunks the store never counted is corrupted
    STATE — ValueError, not a wrong-but-plausible store."""
    base = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff gg hh"), (2, "ii jj kk ll mm nn oo pp")],
        "doc_id long, text string",
    )
    store = build_chunk_store(base.filter(F.col("doc_id") == 1))  # missing doc 2
    deletes = spark.createDataFrame([(2,)], "doc_id long")
    inserts = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="desync"):
        chunk_store_roll(store, base, inserts, deletes)


def test_chunk_store_roll_disjointness_guard(spark):
    base, inserts, deletes = _store_corpus(spark)
    bad = inserts.unionByName(base.limit(1))
    store = build_chunk_store(base)
    with pytest.raises(ValueError, match="already present in base"):
        chunk_store_roll(store, base, bad, deletes)


# --------------------------------------------------------------------------
# clamped CDC laws
# --------------------------------------------------------------------------

def _py_cdc_clamped(text, window=4, divisor=16, mn=8, mx=24):
    """Independent sequential reference: forward scan, cut at the first
    candidate in [start+min, start+max], forced at start+max, tail at n."""
    toks = text.lower().split()
    if not toks:
        return []
    n = len(toks)
    cand = [
        i
        for i in range(window, n + 1)
        if int(
            hashlib.md5(" ".join(toks[i - window:i]).encode()).hexdigest()[:15],
            16,
        ) % divisor == 0
    ]
    bnds, s = [], 0
    for c in cand:
        while c - s > mx:
            s += mx
            bnds.append(s)
        if c - s >= mn:
            bnds.append(c)
            s = c
    while n - s > mx:
        s += mx
        bnds.append(s)
    if n > s:
        bnds.append(n)
    out, prev = [], 0
    for k, b in enumerate(bnds):
        out.append((k + 1, prev + 1, b - prev))
        prev = b
    return out


def test_clamp_identity_recovers_basic_scheme(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    a = cdc_chunks(docs).orderBy("doc_id", "chunk_idx").collect()
    b = (
        cdc_chunks_clamped(docs, min_len=1, max_len=1_000_000_000)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    assert a == b and len(a) > 0


def test_clamped_chunk_lengths_bounded(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    c = cdc_chunks_clamped(docs, min_len=8, max_len=24)
    w = Window.partitionBy("doc_id")
    chk = c.withColumn("__last", F.max("chunk_idx").over(w))
    assert chk.filter(F.col("chunk_len") > 24).count() == 0
    assert (
        chk.filter(
            (F.col("chunk_len") < 8) & (F.col("chunk_idx") != F.col("__last"))
        ).count()
        == 0
    )
    # chunks still partition the token stream
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("n"),
    ).filter(F.length(F.trim(F.col("text"))) > 0)
    sums = c.groupBy("doc_id").agg(F.sum("chunk_len").alias("s"))
    assert sums.join(toks, "doc_id").filter(F.col("s") != F.col("n")).count() == 0


def test_clamped_matches_python_reference(spark):
    rows = [
        (1, "lorem ipsum " * 30),           # low-entropy alternating run
        (2, "foo " * 100),                   # constant-token run (degenerate)
        (3, "a b c d e f g h i j " * 13),    # periodic
        (4, "short doc"),
        (5, " ".join(f"w{i * 7 % 101}" for i in range(180))),  # pseudo-random
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, list] = {r[0]: [] for r in rows}
    for r in (
        cdc_chunks_clamped(df, min_len=8, max_len=24)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    ):
        got[r.doc_id].append((r.chunk_idx, r.start_pos, r.chunk_len))
    for doc_id, text in rows:
        assert got[doc_id] == _py_cdc_clamped(text), f"doc {doc_id}"
    # the degenerate run is bounded by construction
    assert all(ln <= 24 for (_, _, ln) in got[2]) and len(got[2]) >= 4


def test_clamped_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_len"):
        cdc_chunks_clamped(df, min_len=0, max_len=4)
    with pytest.raises(ValueError, match="min_len"):
        cdc_chunks_clamped(df, min_len=9, max_len=4)
