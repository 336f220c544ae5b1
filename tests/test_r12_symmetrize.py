"""Property law for graph.symmetrize_distinct (r12 seed rewrite).

The deep-CC envelope fix (SCALING.md r12) replaced
``union(e, swap(e)).filter(a != b).distinct()`` — 2E rows through the
hash-distinct — with a canonical-pair distinct (least/greatest, E rows)
plus a disjoint orientation union. This file pins the EXACT set
equivalence of the two formulations on adversarial edge lists:
duplicates, both orientations of the same pair, self-loops, skewed
hubs, and empty input — the full input space the seed can see. A
hypothesis sweep over random multigraphs guards the general case.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.graph import symmetrize_distinct


def _old_form(e):
    return (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _as_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs] or [(0, 0)],
        "a long, b long",
    ) if pairs else spark.createDataFrame([], "a long, b long")


CASES = [
    [],                                  # empty
    [(1, 1)],                            # only self-loops → empty
    [(1, 2)],                            # single edge
    [(1, 2), (2, 1)],                    # both orientations collapse
    [(1, 2), (1, 2), (2, 1), (3, 3)],    # dups + swap + loop
    [(0, i) for i in range(1, 40)],      # star hub
    [(i, i + 1) for i in range(30)] + [(5, 3), (3, 5)],  # chain + back-edges
]


def test_symmetrize_distinct_equals_old_form_cases(spark):
    for pairs in CASES:
        e = _as_df(spark, pairs)
        new = {(r.a, r.b) for r in symmetrize_distinct(e).collect()}
        old = {(r.a, r.b) for r in _old_form(e).collect()}
        assert new == old, pairs
        # structural invariants: no self-loops, both orientations present
        assert all(a != b for a, b in new)
        assert {(b, a) for a, b in new} == new


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), max_size=60
    )
)
def test_symmetrize_distinct_random_multigraphs(spark, pairs):
    e = _as_df(spark, pairs)
    new = {(r.a, r.b) for r in symmetrize_distinct(e).collect()}
    old = {(r.a, r.b) for r in _old_form(e).collect()}
    assert new == old
