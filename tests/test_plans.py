"""Physical-plan assertions — the scale properties the engine claims
(SURVEY.md §4) must be visible in the executed plan, not just asserted
in prose: filter pushdown to parquet, column pruning, single payload
exchange in the compaction, no exchange between compaction and merge."""

import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import FIELDS, SF_DIR
from wal_listener_spark.trace import generator
from wal_listener_spark.trace.generator import TRACE_SCHEMA


@pytest.fixture(scope="module")
def trace_dir(spark, tmp_path_factory):
    from wal_listener_spark.streaming.job import write_tx_aligned

    d = str(tmp_path_factory.mktemp("plans") / "trace")
    write_tx_aligned(generator.build_trace(spark, SF_DIR, amplify=1), d, 8)
    return d


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark, trace_dir):
    """An op/lsn filter must appear in PushedFilters of the parquet scan
    (predicate pushdown — the source-side filtering the reference gets
    from a filtered publication, README.md:118-123)."""
    df = (
        spark.read.schema(TRACE_SCHEMA)
        .parquet(trace_dir)
        .filter((F.col("op") == "R") & (F.col("lsn") > 100))
        .select("lsn", "rel_id")
    )
    plan = _plan(df)
    assert "PushedFilters" in plan
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan).group(1)
    assert "op" in pushed and "lsn" in pushed, pushed


def test_column_pruning_reaches_scan(spark, trace_dir):
    """A 2-column projection must not read the payload maps: ReadSchema
    carries only the selected columns."""
    df = spark.read.schema(TRACE_SCHEMA).parquet(trace_dir).select("lsn", "op")
    plan = _plan(df)
    rs = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert "lsn" in rs and "op" in rs
    assert "new_vals" not in rs and "old_vals" not in rs, rs


def test_compaction_single_exchange_no_sort_shuffle_blowup(spark, trace_dir):
    """The agg-based LWW compaction moves the payload through exactly ONE
    exchange (the bucket repartition) — the one-shuffle merge property."""
    from wal_listener_spark.operators import apply as apply_op
    from wal_listener_spark.operators.registry import RelationRegistry
    from wal_listener_spark.pipeline import stamp_table_names

    tr = spark.read.schema(TRACE_SCHEMA).parquet(trace_dir)
    reg = RelationRegistry().update_from_trace(tr)
    rel = stamp_table_names(
        tr.filter(F.col("op").isin("I", "U", "D", "T")), reg
    ).filter(F.col("rel_id") == 1)
    chg = apply_op.compact_agg(rel, reg.relations[1], num_buckets=8)
    plan = _plan(chg)
    assert plan.count("Exchange") == 1, plan


def test_merge_reuses_bucket_partitioning(spark, trace_dir, tmp_path):
    """End-to-end replay plan: the merge join + partitioned write add no
    exchange on the change side beyond the single bucket repartition
    (target side gets its own aligned exchange)."""
    from wal_listener_spark.config import PipelineConfig
    from wal_listener_spark.lake.table import LakeTable
    from wal_listener_spark.pipeline import replay_batch

    tb = LakeTable.create(
        spark, str(tmp_path / "t"), ["repo", "path"], FIELDS, num_buckets=8
    )
    tr = spark.read.schema(TRACE_SCHEMA).parquet(trace_dir)
    stats = replay_batch(tr, tb, PipelineConfig(num_buckets=8), "b0")
    assert not stats["noop"]
    # correctness of the one-shuffle path is covered by test_replay; here
    # we only require the merge to have applied through the prebucketed
    # branch (bucket column was carried by the change set)
    assert stats["tables"]["public_repos"]["buckets_rewritten"]


def test_window_path_job_count_matches_default(
    spark, trace_dir, tmp_path, monkeypatch
):
    """WAL_COMPACT=window (the A/B window-sort knob) must not pay any
    extra driver job per batch: its truncate barrier comes from the same
    fused census the default agg path uses (pipeline.compact_for_merge
    t_lsn passthrough), so the Spark job count per replay_batch is
    identical in both modes."""
    from wal_listener_spark.config import PipelineConfig
    from wal_listener_spark.lake.table import LakeTable
    from wal_listener_spark.pipeline import replay_batch

    sc = spark.sparkContext

    def _run(tag: str, window: bool) -> int:
        if window:
            monkeypatch.setenv("WAL_COMPACT", "window")
        else:
            monkeypatch.delenv("WAL_COMPACT", raising=False)
        tb = LakeTable.create(
            spark, str(tmp_path / tag), ["repo", "path"], FIELDS, num_buckets=8
        )
        tr = spark.read.schema(TRACE_SCHEMA).parquet(trace_dir)
        sc.setJobGroup(tag, tag)
        try:
            stats = replay_batch(tr, tb, PipelineConfig(num_buckets=8), "b0")
        finally:
            sc.setJobGroup(None, None)
        assert not stats["noop"]
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    n_default = _run("jobs_default", window=False)
    n_window = _run("jobs_window", window=True)
    assert n_window == n_default, (n_window, n_default)


def test_wide_mode_merge_single_pass(spark, trace_dir, tmp_path):
    """selective_buckets=False (full-replay mode): the change pipeline
    must run exactly once — no persist barrier (no InMemoryRelation in
    any later plan) — and still produce the same state + counters."""
    from wal_listener_spark.config import PipelineConfig
    from wal_listener_spark.lake.table import LakeTable
    from wal_listener_spark.pipeline import replay_batch

    roots = {}
    for mode in (True, False):
        root = str(tmp_path / f"t{mode}")
        tb = LakeTable.create(spark, root, ["repo", "path"], FIELDS, num_buckets=8)
        tr = spark.read.schema(TRACE_SCHEMA).parquet(trace_dir)
        stats = replay_batch(
            tr, tb,
            PipelineConfig(num_buckets=8, selective_buckets=mode),
            "b0",
        )
        m = stats["tables"]["public_repos"]
        roots[mode] = (root, m["upserts"], m["deletes"])
    (r_sel, up_sel, del_sel), (r_wide, up_wide, del_wide) = roots[True], roots[False]
    assert (up_sel, del_sel) == (up_wide, del_wide)
    sel = sorted(
        tuple(r) for r in LakeTable.load(spark, r_sel).read_public().collect()
    )
    wide = sorted(
        tuple(r) for r in LakeTable.load(spark, r_wide).read_public().collect()
    )
    assert sel == wide and len(sel) > 0
