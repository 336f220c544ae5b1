"""Catalog helper — the SQL front door.

Most of the engine is the DataFrame operator library, but every capability
is equally reachable through ``spark.sql`` (Catalyst compiles both to the
same plans). ``register_testdata`` mounts the test tables as temp views in
one call so ad-hoc SQL (or the spark.sql-path queries in
``__spark_entry__``) can reference them by name; production deployments
would instead point the session at a real metastore/catalog.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def register_testdata(
    spark: SparkSession, sf_dir: str, suffix: str = ""
) -> None:
    """Register every testdata table as a temp view ``<name><suffix>``
    (suffix avoids collisions when two SFs are mounted side by side)."""
    from .sources.readers import load_table

    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"{name}{suffix}")
