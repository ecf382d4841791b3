import pytest

from wal_listener_spark.session import get_spark

FIELDS = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def trace_rows(spark):
    """Default trace at sf0.001 + its collected dict form (for the oracle)."""
    from wal_listener_spark.trace import generator

    trace = generator.build_trace(spark, SF_DIR, amplify=1)
    rows = [r.asDict(recursive=True) for r in trace.collect()]
    return trace, rows
