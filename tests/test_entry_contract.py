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
#: deliberate r6 window (ROADMAP.md rotation table): the 48 queued
#: never-driver-green queries (40 from r5 positions 51-90 + the 8
#: r5-session additions) + 2 of the 4 r6-session additions (the other 2
#: queue contiguously at positions 51-52 — debt outranks re-certification
#: anchors while any exists). r2's lesson:
#: silent registry drift displaced fixed queries past position 50, so their
#: fixes were never driver-certified — any change to this window must be a
#: conscious edit of BOTH the registry and this pin.
R6_WINDOW = [
    "semdedup", "cms_heavy_hitters", "doc_chunks", "gopher_rules",
    "priority_sample", "domain_caps", "orc_source", "unigram_ppl",
    "bpe_merges", "bpe_tokenize", "ivf_trained_topk", "hist_quantiles",
    "dataset_split", "char_entropy", "min_price_supplier", "column_profile",
    "bigram_backoff_ppl", "ann_recall", "zorder_layout", "observed_ingest",
    "skew_report", "dataset_card", "session_funnel", "langid_confusion",
    "cross_split_contamination", "first_touch_attribution",
    "partitioned_sink", "dedup_best_survivor", "boilerplate_segments",
    "daily_gapfill", "interval_join_hot_hours", "bucketed_join_revenue",
    "winsorized_lengths", "snapshot_diff", "weekly_growth",
    "top_customer_by_nation", "custom_feed_source", "stream_custom_source",
    "dq_checks", "sessionize_udtf", "fellegi_sunter_scores", "cohens_kappa",
    "calibration_bins", "hits_scores", "kneser_ney_ppl", "dp_count_laplace",
    "rate_limit_replay", "stream_token_bucket",
    "kcore_parts", "kcenter_coreset",
]


def test_driver_window_is_pinned():
    names = list(E.queries().keys())
    assert names[:50] == R6_WINDOW


def test_rotation_retires_certification_debt():
    """Mechanized ROADMAP rotation rule (VERDICT r3 item 7): the 50-query
    driver window must be PACKED with never-driver-green queries while any
    exist, and the remaining never-green must be queued immediately after
    the window (so the next rotation is a pure block shift, not a hunt).
    Fails if a new query is parked deep in the tail or the window wastes
    slots on already-green anchors while debt remains."""
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
    window, tail = names[:50], names[50:]
    # window slots go to debt first; anchors only once debt < 50
    wasted = [n for n in window if n in green]
    assert len(wasted) <= max(0, 50 - len(never)), (
        f"window holds already-green queries while {len(never)} queries "
        f"have no driver-green record: {wasted[:10]}"
    )
    # queued debt sits contiguously right after the window
    queued = [n for n in never if n in tail]
    assert tail[: len(queued)] == queued, (
        "never-driver-green queries must be queued directly after the "
        f"window; first mismatch near {tail[:len(queued)][:5]}"
    )
