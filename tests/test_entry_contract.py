"""Driver-contract guards that need no Spark session: every oracle SQL
string must at least plan in DuckDB against the real testdata views, and
the registry must be internally consistent."""

import duckdb

import __spark_entry__ as E

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _con(sf_dir="/root/testdata/sf0.001"):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_registry_consistency():
    qs, sqls = E.queries(), E.oracle_sql()
    assert set(sqls) <= set(qs)
    assert all(name.isidentifier() for name in qs)
    # every callable has the (spark, sf_dir) arity
    for fn in qs.values():
        assert fn.__code__.co_argcount == 2


def test_every_oracle_sql_plans_in_duckdb():
    con = _con()
    bad = []
    for name, sql in E.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:
            bad.append((name, str(e)[:200]))
    assert not bad, bad


def test_catalog_register_testdata(spark):
    from ingestion_scripts_spark.catalog import register_testdata

    register_testdata(spark, "/root/testdata/sf0.001", suffix="_cat")
    n = spark.sql(
        "SELECT count(*) AS n FROM documents_cat d "
        "JOIN embeddings_cat e ON d.doc_id = e.vec_id"
    ).collect()[0].n
    assert n > 0


#: the driver certifies registry positions 1-50 each round; this is the
#: deliberate r10 window (ROADMAP.md "r10 rotation plan"): the 6
#: r10-session additions (never-driver-green debt, window-start) + 44
#: re-certification anchors with the oldest driver evidence — the 6
#: anchors the r9 additions displaced, then the last-green-r3 block,
#: ordered by (max green round across CORRECTNESS_r01-r09, declaration
#: order). CORRECTNESS_r09 landed 50/50, so debt entering r10 was zero.
#: Queries added later in r10 displace the youngest anchors here (debt
#: outranks re-certification). r2's lesson:
#: silent registry drift displaced fixed queries past position 50, so their
#: fixes were never driver-certified — any change to this window must be a
#: conscious edit of BOTH the registry and this pin.
R10_WINDOW = [
    "gini_order_values", "trimmed_price_mean", "bootstrap_order_value_ci",
    "shuffle_mix_audit", "coorder_transitivity", "mad_order_values",
    "multimodal_meta", "multimodal_features", "multimodal_frames",
    "stream_idempotent_sink", "stream_stateful_counts", "stream_dedup_counts",
    "stream_enriched_counts", "stream_late_drop", "stream_stream_join",
    "stream_outer_join", "stream_wm_dedup", "stream_fanout_sinks",
    "bloom_gate", "curation_pipeline", "curation_to_sequences",
    "props_extract", "idle_rich_customers", "cumulative_users",
    "rolling_7d_value", "incremental_ingest", "tfidf_top_terms",
    "dup_clusters", "hll_distinct_users", "repetition_signals", "pii_scrub",
    "contamination", "stratified_sample", "simhash_near_dups",
    "sequence_packing", "kmeans_clusters", "kmeans_sample",
    "importance_weights", "pmi_bigrams", "nation_profit", "scd_upsert",
    "dup_span_fraction", "jsonl_source", "anomaly_zscore",
    "retention_cohorts", "flagship_doc_keywords", "pricing_summary",
    "minhash_near_dups", "embedding_near_dup", "variant_props",
]


def test_driver_window_is_pinned():
    names = list(E.queries().keys())
    assert names[:50] == R10_WINDOW


def test_rotation_retires_certification_debt():
    """Mechanized ROADMAP rotation rule (VERDICT r3 item 7, contract fixed
    per VERDICT r6 item 2): never-driver-green queries must be PACKED — at
    the start of the window while the round is in flight, or (once the
    driver's end-of-round CORRECTNESS_r{N}.json lands in the worktree and
    turns the whole window green) contiguously immediately AFTER the window,
    so the next rotation is a pure block shift. The repo exists in BOTH
    states — at the snapshot commit (no fresh CORRECTNESS file) and at the
    judged worktree (file present, window newly green) — and this test must
    be green in both; r4-r6 each went red at judge time because the old
    contract demanded a mid-round re-rotation the moment the window
    certified. Still fails on the real defects: debt parked deep in the
    tail, or window slots wasted on greens while uncertified debt exists
    mid-round."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        for name, rec in json.load(open(path)).items():
            if (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
            ):
                green.add(name)
    names = list(E.queries().keys())
    never = [n for n in names if n not in green]
    if not never:
        return  # zero certification debt: any window composition is legal
    window, tail = names[:50], names[50:]
    # queued debt (in both states) sits contiguously right after the window
    queued = [n for n in never if n in tail]
    assert tail[: len(queued)] == queued, (
        "never-driver-green queries must be queued directly after the "
        f"window; first mismatch near {tail[:len(queued)][:5]}"
    )
    window_debt = [n for n in window if n not in green]
    if not window_debt:
        # end-of-round state: this round's CORRECTNESS artifact landed after
        # the snapshot commit and certified the entire window; remaining
        # debt is packed immediately after it (asserted above), so the next
        # round's rotation is a pure block shift. Re-rotating now would
        # orphan the window pin mid-round — nothing further to assert.
        return
    # mid-round state: window slots go to debt first; green anchors may
    # occupy only the slots debt cannot fill
    wasted = [n for n in window if n in green]
    assert len(wasted) <= max(0, 50 - len(never)), (
        f"window holds already-green queries while {len(never)} queries "
        f"have no driver-green record: {wasted[:10]}"
    )
