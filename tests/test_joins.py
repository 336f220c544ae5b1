"""asof_join semantics: backward match, '<=' tie rule, null when unmatched —
differential against pandas merge_asof on the same frame."""

import pandas as pd

from ingestion_scripts_spark.operators.joins import asof_join


def test_asof_backward_matches_pandas(spark):
    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 12:00",
                 "2024-01-01 10:30", "2024-01-01 10:31", "2024-01-01 09:00"]
            ),
            "ev": ["a", "b", "c", "d", "e", "f"],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 2, 4],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 11:30",
                 "2024-01-01 10:31", "2024-01-01 00:00"]
            ),
            "val": [10, 20, 30, 40],
        }
    )
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            right_values=["val"],
        )
        .orderBy("k", "ts")
        .toPandas()
    )
    expect = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="k", direction="backward",
    ).sort_values(["k", "ts"]).reset_index(drop=True)
    assert list(got["ev"]) == list(expect["ev"])
    assert [None if pd.isna(v) else int(v) for v in got["asof_val"]] == [
        None if pd.isna(v) else int(v) for v in expect["val"]
    ]
    # ties: right row at exactly left ts counts ('<=')
    row = got[(got.k == 2) & (got.ev == "e")].iloc[0]
    assert row["asof_val"] == 30


def test_banded_interval_join_equals_naive_range_join(spark):
    from pyspark.sql import functions as F

    from ingestion_scripts_spark.operators.joins import banded_interval_join
    from ingestion_scripts_spark.sources.readers import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("eid"), "user_id", F.col("ts").alias("ets")
    )
    banded = banded_interval_join(
        purchases, errors, on="user_id", left_ts="pts", right_ts="ets",
        window_seconds=3600,
    )
    got = sorted((r.pid, r.eid) for r in banded.collect())
    naive = purchases.alias("l").join(
        errors.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ets") > F.col("l.pts"))
        & (F.col("r.ets").cast("double") <= F.col("l.pts").cast("double") + 3600),
    )
    expect = sorted((r.pid, r.eid) for r in naive.collect())
    assert got == expect and len(got) > 0
