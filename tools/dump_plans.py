"""Regenerate PLANS.md: formatted physical plans of representative
registry queries with scan-detail evidence (PushedFilters / ReadSchema).

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E
from ingestion_scripts_spark.session import build_session

#: query -> one-paragraph commentary on why this plan is the one we want
COMMENT = {
    "pricing_summary": (
        "TPC-H Q1 shape. One scan, partial+final HashAggregate around a "
        "single exchange, whole-stage codegen end to end. PushedFilters "
        "carries the date predicate into the parquet reader; ReadSchema "
        "reads only the 7 touched columns."
    ),
    "region_revenue": (
        "Star join. region/nation/customer are BroadcastHashJoins (no "
        "shuffle of the fact side for dims); the only exchange is the "
        "final groupBy key."
    ),
    "top_orders": (
        "Join + agg + bounded top-k: TakeOrderedAndProject, never a "
        "global sort of the full aggregate."
    ),
    "minhash_near_dups": (
        "Banding chain: the signature pipeline (explode -> per-(doc,seed) "
        "min -> re-nest) runs ONCE; pair generation groups ids per "
        "(band,bucket) and explodes in-bucket combinations - no "
        "self-join, so no second run of the expensive lineage."
    ),
    "bm25_topk": (
        "Inverted index as a shuffle: tf and df are keyed aggregates with "
        "map-side partials; the 1-row corpus stats ride a "
        "BroadcastNestedLoop (scalar); query terms broadcast into the "
        "postings; per-query rank windows partition by query_id."
    ),
    "event_transitions": (
        "Per-user lead window then keyed count. ReadSchema proves column "
        "pruning: props/value never leave the scan."
    ),
    "edit_distance_names": (
        "Ed-Join: the (gram, occ) posting equi-join generates candidates, "
        "the count filter prunes before the levenshtein verify, and the "
        "short-string fallback is an exploded-length equi-join - no "
        "CartesianProduct anywhere in the tree."
    ),
    "triangle_cooccurrence": (
        "Degree-oriented wedge join: edge orientation keys every join; "
        "each stage is a keyed Exchange + SortMergeJoin/HashAggregate - "
        "the O(m^1.5) triangle plan, immune to hub skew."
    ),
    "basket_pair_lift": (
        "A-priori prune rides a BroadcastHashJoin (frequent items into "
        "the basket scan); the pair join is keyed on the basket id; item "
        "counts and the 1-row basket total broadcast back into the "
        "lift projection."
    ),
    "mmr_diverse_topk": (
        "Unrolled greedy selection: three bounded join+window rounds "
        "chained in ONE lazy plan - no driver-side loop state, no action "
        "at build time; candidate generation reuses the broadcast cosine "
        "kernel."
    ),
    "jl_projection_recall": (
        "The 64->16 projection is a single Project of 16 fold "
        "expressions over the scan (plane literals inlined, no join); "
        "both ANN arms then run the same broadcast top-k shape and meet "
        "in a left-semi hit join."
    ),
    "duplicate_spans": (
        "Substring dedup as span postings: Generate (explode) fans each "
        "doc into its 5-token windows with no shuffle, then ONE keyed "
        "HashAggregate pair (partial before the exchange, final after) "
        "groups on the span value. Linear fanout, single shuffle, no "
        "suffix array and no all-pairs."
    ),
    "pareto_frontier": (
        "Skyline without the O(n^2) dominance join: the per-price "
        "max(size) aggregate shuffles the facts ONCE; the running-max "
        "window then runs over |distinct price| rows (the WindowExec "
        "single-partition warning applies to that tiny aggregate, not "
        "the fact table), and frontier points come back as a "
        "BroadcastHashJoin against the full table."
    ),
    "incremental_agg_view": (
        "Incremental view maintenance: three HashAggregate pairs (base, "
        "insert, delete deltas — each with map-side partials) meet in "
        "SortMergeJoin full-outer merges keyed on the view key. In "
        "production only the delta aggs run per refresh; the base agg "
        "node is the stored view."
    ),
    "er_canonical_entities": (
        "Entity resolution: the SNM lead() windows are partitioned by "
        "band (no global sort), the star-CC rounds are keyed "
        "groupBy/join pairs with localCheckpoint truncating lineage "
        "per round, and the final size join is keyed on entity_id."
    ),
    "link_prediction": (
        "Wedge join through shared intermediaries: the co-order edge "
        "build is one equi-join + keyed aggregate; neighbor lists join "
        "the degree table (hub cap pushed as a plain filter), the wedge "
        "join is an equi-join on z (never a cartesian), and the "
        "existing-edge exclusion is a left-anti join. AQE reuses the "
        "identical neighbor-list exchanges on both wedge sides."
    ),
    "acf_daily": (
        "Exact autocorrelation: the fact table is scanned ONCE (the "
        "persisted per-day aggregate serves stats, both lag-join sides "
        "and the denominator); 1-row stats ride broadcast nested loops; "
        "ONE range join covers all 7 lags; DECIMAL(38,0) sums keep the "
        "N-scaled products exact."
    ),
    "decile_lift": (
        "The distributed global rank (r9): NO Exchange SinglePartition "
        "over the corpus — the scored rows range-repartition on "
        "(score desc, id), each slice sorts independently behind the "
        "checkpoint pin, local ranks come from monotonically_increasing_"
        "id bit-arithmetic, and the per-partition offsets (a ≤32-row "
        "aggregate) join back as a BroadcastHashJoin. The only remaining "
        "global window is the cumulative sum over ≤10 post-aggregate "
        "decile rows. Compare the retired shape: one Window node fed by "
        "Exchange SinglePartition sorting every scored document in one "
        "task."
    ),
    "exact_global_quantiles": (
        "Order statistics on the same rank primitive: the ≤6-row "
        "ceil-rank table (from a 1-row count) broadcasts against the "
        "ranked corpus — a BroadcastHashJoin probe on rn, never a "
        "second sort or a top-N heap over the full table."
    ),
    "snapshot_band_roll": (
        "Maintained-state snapshot roll (r13): snapshot1's band table "
        "enters as a PARQUET SCAN of (id, band, bucket) — no minhash/md5 "
        "chain on the base side anywhere in the tree; the signature "
        "pipeline (Generate + per-(doc,seed) aggregates) appears only "
        "above the insert-side filter. Candidates are (band, bucket) "
        "equi-joins; Jaccard verification's shingle build sits behind "
        "left-semi joins on candidate endpoints, so text bytes are "
        "point-lookups, never a corpus scan. Measured: ~3x faster than "
        "the re-signing path at every probed size (SCALING.md r13)."
    ),
    "hot_bucket_sweep": (
        "Offline hot-bucket recovery (r14): the width aggregation and "
        "the member pull are (band, bucket) equi-joins; the signature "
        "pipeline runs only behind the hot-member semi-join; ranking is "
        "a row_number window PARTITIONED BY (band, bucket) — a "
        "bucket-local sort, no global Exchange SinglePartition; the "
        "candidate join is an equi-join on (band, bucket, rank) built "
        "by exploding window offsets, so the plan carries no range "
        "join and no bucket self-cartesian. Measured: flat ~4-5 s "
        "while the all-pairs pass quadruples per doubling "
        "(SCALING.md r14 addendum)."
    ),
    "ivf_postings_roll": (
        "Maintained ANN index roll (r14): snapshot1's postings enter "
        "as a PARQUET SCAN of (id, cell) — the 8-cell x 64-dim "
        "quantizer fold appears only above the insert-side filter; "
        "index maintenance is one left-anti join + union; the audit is "
        "three cell-keyed partial-agg counts full-outer-joined on "
        "cell. Measured: flat ~1-2 s vs corpus-linear re-assignment "
        "(84 s at 6.4M vectors, SCALING.md r14 addendum)."
    ),
    "ivf_roll_serve": (
        "Serving from the maintained index (r14): the query side is "
        "BROADCAST (queries are few) and assigned to cells by the "
        "quantizer expression; the corpus side joins the postings "
        "table's cells by id — no corpus-side quantizer fold in the "
        "tree; with cell-partitioned postings parquet the probed-cell "
        "join prunes partitions. Top-k is a row_number window "
        "partitioned by query_id."
    ),
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(app_name="dump-plans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — formatted physical plans of representative queries",
        "",
        'Generated with `df.explain("formatted")` at sf0.001 (plan shapes are',
        "scale-invariant; AQE may further coalesce at runtime). Regenerate with",
        "`python tools/dump_plans.py`.",
        "",
    ]
    qs = E.queries()
    for name, note in COMMENT.items():
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        lines = buf.getvalue().splitlines()
        tree_end = next(
            (i for i, l in enumerate(lines) if l.strip() == "" and i > 3), len(lines)
        )
        tree = "\n".join(lines[:tree_end])
        detail = "\n".join(
            l for l in lines if "PushedFilters" in l or "ReadSchema" in l
        )
        out += [f"## {name}", "", note, "", "```", tree, "```", ""]
        if detail:
            out += ["Scan details:", "```", detail, "```", ""]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md: {len(COMMENT)} plans")


if __name__ == "__main__":
    main()
