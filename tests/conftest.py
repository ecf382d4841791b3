import pytest
from hypothesis import settings as _hyp_settings

from wal_listener_spark.session import get_spark

# property-test effort: default keeps CI fast; run deeper sweeps with
#   pytest --hypothesis-profile=soak tests/test_property_merge.py
_hyp_settings.register_profile("default", max_examples=6)
_hyp_settings.register_profile("soak", max_examples=40)
_hyp_settings.register_profile("soak100", max_examples=100)
_hyp_settings.load_profile("default")

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
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # shuffle spill on tmpfs — /tmp is the sandbox's shared
            # physical disk (same rationale as bench.py)
            "spark.local.dir": "/dev/shm/walspark_test_spark",
        },
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
