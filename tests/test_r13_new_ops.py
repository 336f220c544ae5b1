"""Law tests for the r13 additions (ledgered in tests/law_ledger.py).

- snapshot_band_roll: the maintained-state contract end-to-end — the
  band table round-trips through PARQUET (the production shape), the
  roll's pair delta must equal the diff of two independent full
  recomputes (``minhash_dedup_pairs`` per snapshot), and the returned
  next band table must equal ``banded_buckets`` of snapshot2 recomputed
  from scratch; plus the disjointness guard through the band-table path.
- band_table_stats: exact hand-computed stats on a literal band table
  (pair_mass = Σ w·(w−1)/2 per band, max width, bucket counts).
- stream_snapshot_roll: the unrolled-batch law — the streaming job
  (state through versioned parquet, foreachBatch triggers) must emit
  exactly the deltas that sequential BATCH composition of
  snapshot_band_roll produces over the same insert/retire schedule.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.dedup import (
    band_table_stats,
    banded_buckets,
    minhash_dedup_pairs,
    snapshot_band_roll,
)


def _corpus(spark):
    """base: 1..6; inserts: 101, 102; deletes: 2, 5 — same engineered
    formed/dissolved/surviving structure as the r12 snapshot tests."""
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


def test_snapshot_band_roll_parquet_roundtrip_matches_recompute(
    spark, tmp_path
):
    base, inserts, deletes = _corpus(spark)
    # the production shape: B persisted by a prior roll, read back cold
    banded_buckets(base, "doc_id", "text").write.parquet(
        str(tmp_path / "bands_v1")
    )
    base_bands = spark.read.parquet(str(tmp_path / "bands_v1"))
    texts = base.unionByName(inserts)
    new_bands, delta = snapshot_band_roll(
        base_bands, texts, inserts, deletes, threshold=0.5
    )

    # 1. pair delta == diff of two independent full recomputes
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
    got = {(r.id1, r.id2, r.status) for r in delta.collect()}
    assert got == want
    assert {s for (_, _, s) in got} == {"formed", "dissolved"}

    # 2. returned next band table == banded_buckets(snapshot2) from scratch
    want_bands = {
        (r.doc_id, r.band, r.bucket)
        for r in banded_buckets(snap2, "doc_id", "text").collect()
    }
    got_bands = {(r.doc_id, r.band, r.bucket) for r in new_bands.collect()}
    assert got_bands == want_bands and len(got_bands) > 0


def test_snapshot_band_roll_guard_through_band_table(spark, tmp_path):
    base, inserts, deletes = _corpus(spark)
    banded_buckets(base, "doc_id", "text").write.parquet(
        str(tmp_path / "bands")
    )
    base_bands = spark.read.parquet(str(tmp_path / "bands"))
    bad_inserts = inserts.unionByName(
        base.limit(1).select("doc_id", "text")  # id 1 already in base
    )
    with pytest.raises(ValueError, match="already present in base"):
        snapshot_band_roll(
            base_bands, base.unionByName(inserts), bad_inserts, deletes
        )


def test_band_table_stats_hand_computed(spark):
    # band 0: buckets x(w=3), y(w=1) -> rows 4, max 3, mass 3
    # band 1: buckets x(w=2), z(w=2) -> rows 4, max 2, mass 1+1=2
    rows = [
        (1, 0, "x"), (2, 0, "x"), (3, 0, "x"), (4, 0, "y"),
        (1, 1, "x"), (2, 1, "x"), (3, 1, "z"), (4, 1, "z"),
    ]
    bt = spark.createDataFrame(rows, "doc_id long, band int, bucket string")
    got = {
        r.band: (r.n_rows, r.n_buckets, r.max_width, r.pair_mass)
        for r in band_table_stats(bt).collect()
    }
    assert got == {0: (4, 2, 3, 3), 1: (4, 2, 2, 2)}


def test_band_table_stats_pair_mass_identity(spark):
    # pair_mass summed over bands == total in-bucket candidate pairs the
    # batch self-join would generate BEFORE cross-band dedup — computed
    # independently from the collected table in pure python
    docs = spark.createDataFrame(
        [
            (i, f"red orange yellow green blue indigo violet w{i % 3}")
            for i in range(12)
        ],
        "doc_id long, text string",
    )
    bt = banded_buckets(docs, "doc_id", "text")
    rows = bt.collect()
    from collections import Counter

    width = Counter((r.band, r.bucket) for r in rows)
    want = sum(w * (w - 1) // 2 for w in width.values())
    got = sum(r.pair_mass for r in band_table_stats(bt).collect())
    assert got == want and got > 0


def test_stream_snapshot_roll_equals_batch_composition(spark):
    """Unrolled-batch law: the streaming job (versioned-parquet state,
    foreachBatch triggers, checkpoint) must emit exactly what sequential
    batch composition of snapshot_band_roll produces over the same
    insert/retire schedule — state round-tripping adds nothing and
    loses nothing."""
    import __spark_entry__ as E

    q_stream_snapshot_roll = E.queries()["stream_snapshot_roll"]
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    bands_schema = "doc_id long, band int, bucket string"
    corpus_schema = "doc_id long, text string"
    state_bands = spark.createDataFrame([], bands_schema)
    state_corpus = spark.createDataFrame([], corpus_schema)
    want = []
    for b in range(3):
        inserts = docs.filter(F.col("doc_id") % 3 == b)
        retire = state_corpus.filter(F.col("doc_id") % 7 == b).select("doc_id")
        texts = state_corpus.unionByName(inserts)
        new_bands, delta = snapshot_band_roll(
            state_bands, texts, inserts, retire, threshold=0.8
        )
        want += [
            (b, r.id1, r.id2, r.jaccard, r.status) for r in delta.collect()
        ]
        # materialize state between rounds (collect+recreate) so the law
        # side carries no growing lineage — mirrors the parquet round-trip
        state_bands = spark.createDataFrame(
            [(r.doc_id, r.band, r.bucket) for r in new_bands.collect()],
            bands_schema,
        )
        state_corpus = spark.createDataFrame(
            [
                (r.doc_id, r.text)
                for r in state_corpus.join(retire, "doc_id", "left_anti")
                .unionByName(inserts)
                .collect()
            ],
            corpus_schema,
        )

    got = [
        (r.batch, r.id1, r.id2, r.jaccard, r.status)
        for r in q_stream_snapshot_roll(spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(want)
    assert {s for (_, _, _, _, s) in got} >= {"formed", "dissolved"}


# --------------------------------------------------------------------------
# content-defined chunking laws
# --------------------------------------------------------------------------

def _py_cdc(text, window=4, divisor=16):
    """Independent pure-python reference of the chunking contract."""
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    t = [x for x in text.lower().split(" ") if x]
    n = len(t)
    if n == 0:
        return []
    bnd = [
        i
        for i in range(window, n + 1)
        if h(" ".join(t[i - window : i])) % divisor == 0
    ]
    if not bnd or bnd[-1] != n:
        bnd.append(n)
    out, start = [], 1
    for k, b in enumerate(bnd):
        out.append((k + 1, start, b - start + 1, h(" ".join(t[start - 1 : b]))))
        start = b + 1
    return out


def test_cdc_chunks_matches_python_reference(spark):
    from ingestion_scripts_spark.operators.chunking import cdc_chunks

    texts = {
        1: " ".join(f"w{i % 37}" for i in range(200)),
        2: "short doc",
        3: "",
        4: " ".join(f"t{i}" for i in range(100)),
        5: "exactly four token doc",  # n > window, maybe no boundary hit
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_idx, r.start_pos, r.chunk_len, r.chunk_hash)
        for r in cdc_chunks(docs).collect()
    }
    want = {
        (d, idx, st, ln, hh)
        for d, tx in texts.items()
        for (idx, st, ln, hh) in _py_cdc(tx)
    }
    assert got == want
    # partition law: per doc, chunks tile [1..n] exactly
    for d, tx in texts.items():
        ch = sorted(x for x in got if x[0] == d)
        n = len([x for x in tx.lower().split(" ") if x])
        if n == 0:
            assert not ch
            continue
        assert ch[0][2] == 1 and ch[-1][2] + ch[-1][3] - 1 == n
        for a, b in zip(ch, ch[1:]):
            assert b[2] == a[2] + a[3]


def test_cdc_boundaries_resync_after_prefix_edit(spark):
    """THE content-defined property: two documents sharing a long suffix
    but with different-length prefixes still produce mostly-identical
    chunk hashes — fixed-offset chunking would share none. (Checked
    against the python reference first: the shared 240-token suffix
    re-synchronizes after at most one window-influenced boundary.)"""
    from ingestion_scripts_spark.operators.chunking import cdc_chunks

    suffix = " ".join(f"s{i}" for i in range(240))
    a = "alpha beta " + suffix
    b = "one two three four five six seven " + suffix
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    rows = cdc_chunks(docs).collect()
    h1 = [r.chunk_hash for r in rows if r.doc_id == 1]
    h2 = [r.chunk_hash for r in rows if r.doc_id == 2]
    shared = set(h1) & set(h2)
    assert len(h1) >= 5 and len(h2) >= 5  # suffix long enough to chunk
    # all but the first (prefix-contaminated) chunks are shared
    assert len(shared) >= len(h1) - 2
    assert h1[-1] == h2[-1]  # identical tails chunk identically


def test_cdc_dedup_report_hand_corpus(spark):
    from ingestion_scripts_spark.operators.chunking import cdc_dedup_report

    body = " ".join(f"s{i}" for i in range(240))
    docs = spark.createDataFrame(
        [(1, body, "a"), (2, body, "b"), (3, "unique tiny text", "b")],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in cdc_dedup_report(docs).collect()}
    # doc 1 (source a) charged as first copy: zero dup mass
    assert got["a"].dup_chunks == 0 and got["a"].dup_tokens == 0
    # doc 2 repeats doc 1 chunk-for-chunk; doc 3 is unique
    assert got["b"].dup_tokens == 240
    assert got["b"].total_tokens == 240 + 3
    assert got["b"].dedup_ppm == (240 * 1000000) // 243
