import pytest

from ingestion_scripts_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    yield s
    s.stop()
