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
#: deliberate r3 window (ROADMAP.md rotation table). r2's lesson: silent
#: registry drift displaced fixed queries past position 50, so their fixes
#: were never driver-certified — any change to this window must be a
#: conscious edit of BOTH the registry and this pin.
R3_WINDOW = [
    "rss_pipeline", "reddit_pipeline", "twitter_pipeline", "sentiment",
    "sessionize", "session_window_native", "session_window_dynamic",
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
    "minhash_near_dups", "embedding_near_dup",
]


def test_driver_window_is_pinned():
    names = list(E.queries().keys())
    assert names[:50] == R3_WINDOW
