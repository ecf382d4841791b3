"""Streaming replay: multi-epoch exactly-once, kill/restart resume from
checkpoint (the Spark upgrade of the reference's at-least-once contract,
README.md:57; FIXTURES.md §6.8)."""

import pytest

from tests.conftest import FIELDS, SF_DIR
from wal_listener_spark import oracle, pipeline
from wal_listener_spark.config import PipelineConfig
from wal_listener_spark.lake.table import LakeTable
from wal_listener_spark.streaming import job
from wal_listener_spark.trace import generator


@pytest.fixture(scope="module")
def trace_on_disk(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    trace = generator.build_trace(spark, SF_DIR, amplify=1)
    rows = [r.asDict(recursive=True) for r in trace.collect()]
    path = str(root / "trace")
    job.write_tx_aligned(trace, path, num_files=8)
    return path, oracle.apply_trace(rows)


def _mk_table(spark, root):
    return LakeTable.create(spark, root, ["repo", "path"], FIELDS, num_buckets=8)


def _final(spark, root):
    return {
        (r["repo"], r["path"]): r.asDict()
        for r in LakeTable.load(spark, root).read_public().collect()
    }


def test_multi_epoch_stream_matches_oracle(spark, trace_on_disk, tmp_path):
    trace_dir, expected = trace_on_disk
    table_root = str(tmp_path / "lake")
    _mk_table(spark, table_root)
    stats = job.run_replay_stream(
        spark,
        trace_dir,
        table_root,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
    )
    assert len(stats) >= 3  # actually split into multiple epochs
    got = _final(spark, table_root)
    assert set(got) == set(expected)
    assert all(got[k]["content"] == expected[k].get("content") for k in expected)


def test_kill_and_resume_exactly_once(spark, trace_on_disk, tmp_path):
    """Crash mid-replay after some epochs committed, restart from the
    same checkpoint: no loss, no duplicates."""
    trace_dir, expected = trace_on_disk
    table_root = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    _mk_table(spark, table_root)

    with pytest.raises(Exception, match="injected crash"):
        job.run_replay_stream(
            spark, trace_dir, table_root, ckpt,
            max_files_per_trigger=2, fail_at_batch=2,
        )
    partial = _final(spark, table_root)
    assert 0 < len(partial) < len(expected)  # some epochs landed

    stats = job.run_replay_stream(
        spark, trace_dir, table_root, ckpt, max_files_per_trigger=2
    )
    got = _final(spark, table_root)
    assert set(got) == set(expected)
    assert all(got[k]["content"] == expected[k].get("content") for k in expected)
    # lineage shows each epoch exactly once per table
    tb = LakeTable.load(spark, table_root)
    keys = [e["batch_key"] for e in tb.lineage()]
    assert len(keys) == len(set(keys))


def test_restart_after_success_is_noop(spark, trace_on_disk, tmp_path):
    trace_dir, expected = trace_on_disk
    table_root = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    _mk_table(spark, table_root)
    job.run_replay_stream(spark, trace_dir, table_root, ckpt)
    v1 = LakeTable.load(spark, table_root).manifest["version"]
    stats = job.run_replay_stream(spark, trace_dir, table_root, ckpt)
    assert stats == []  # checkpoint says everything is consumed
    assert LakeTable.load(spark, table_root).manifest["version"] == v1
