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
#: deliberate r5 window (ROADMAP.md rotation table): newest-first
#: never-driver-green — the 42 r4-session additions (judge mimic-verified
#: but never driver-certified) + 8 from the pre-r4 queue. r2's lesson:
#: silent registry drift displaced fixed queries past position 50, so their
#: fixes were never driver-certified — any change to this window must be a
#: conscious edit of BOTH the registry and this pin.
R5_WINDOW = [
    "textrank_summary", "sql_pipe_front_door", "stream_state_reader",
    "edit_distance_names", "basket_pair_lift", "triangle_cooccurrence",
    "token_kl_drift", "leakage_safe_split", "hybrid_rank_fusion",
    "output_file_plan", "mmr_diverse_topk", "k_anonymity_audit",
    "jl_projection_recall", "holt_trend_forecast", "covariance_matrix",
    "dup_clusters_star", "containment_pairs", "stream_scd_merge",
    "recursive_front_door", "duplicate_spans", "span_removal_plan",
    "pareto_frontier", "ks_drift", "column_mutual_info",
    "incremental_agg_view", "snm_blocking", "cusum_changepoint",
    "ht_sampling_error", "stream_quota_admission", "er_canonical_entities",
    "bfs_hops_coorder", "psi_drift", "chi2_independence",
    "multimodal_audio_energy", "bloom_dedup_audit",
    "label_spread_communities", "join_size_estimate", "grouped_agg_udaf",
    "arrow_group_stats", "roc_auc_quality", "bot_burst_users",
    "index_compaction", "temperature_mix", "csv_source",
    "corrupt_record_routing", "hll_merge_rollup", "grouping_sets_revenue",
    "window_dist_funcs", "lang_histograms", "stats_corr",
]


def test_driver_window_is_pinned():
    names = list(E.queries().keys())
    assert names[:50] == R5_WINDOW


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
