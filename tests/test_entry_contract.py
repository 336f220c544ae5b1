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
