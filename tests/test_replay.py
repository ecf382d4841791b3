"""End-to-end replay vs the sequential oracle (FIXTURES.md §6 scenarios).

The oracle applies events one at a time in (lsn, tx_id, seq) order —
the reference's single-threaded semantics (listener.go:364-386) — and the
distributed pipeline must reach the identical final state."""

import hashlib

import pytest
from pyspark.sql import functions as F

from tests.conftest import FIELDS, SF_DIR
from wal_listener_spark import oracle, pipeline
from wal_listener_spark.config import PipelineConfig
from wal_listener_spark.lake.table import LakeTable
from wal_listener_spark.trace import generator, spec


def _fresh_table(spark, tmp_path, buckets=8):
    return LakeTable.create(
        spark, str(tmp_path / "lake"), ["repo", "path"], FIELDS, num_buckets=buckets
    )


def _state(spark, root):
    tb = LakeTable.load(spark, root)
    return {(r["repo"], r["path"]): r.asDict() for r in tb.read_public().collect()}


def _assert_matches(got, expected):
    assert set(got) == set(expected)
    for k, e in expected.items():
        g = got[k]
        assert g["content"] == e.get("content"), k
        assert g["commit"] == e.get("commit"), k
        # the per-row invariant from BASELINE.json input_hint
        assert (
            hashlib.sha256((g["content"] or "").encode()).hexdigest()
            == hashlib.sha256((e.get("content") or "").encode()).hexdigest()
        )
        exp_stars = e.get("stars")
        assert g.get("stars") == (int(exp_stars) if exp_stars is not None else None), k


def test_full_replay_matches_oracle(spark, trace_rows, tmp_path):
    trace, rows = trace_rows
    expected = oracle.apply_trace(rows)
    tb = _fresh_table(spark, tmp_path)
    stats = pipeline.replay_batch(trace, tb, PipelineConfig(num_buckets=8), "b0")
    assert not stats["noop"]
    got = _state(spark, str(tmp_path / "lake"))
    _assert_matches(got, expected)
    # schema evolution happened: 'stars' column exists, NULL for pre-evolution keys
    tb = LakeTable.load(spark, str(tmp_path / "lake"))
    assert "stars" in tb.field_names
    assert any(v.get("stars") is not None for v in got.values())
    assert any(v.get("stars") is None for v in got.values())


def test_truncate_mid_stream(spark, tmp_path):
    trace = generator.build_trace(spark, SF_DIR, amplify=1, k_tr=120)
    rows = [r.asDict(recursive=True) for r in trace.collect()]
    expected = oracle.apply_trace(rows)
    # truncate must actually have removed something
    full = oracle.apply_trace([r for r in rows if r["op"] != "T"])
    assert len(expected) < len(full)
    tb = _fresh_table(spark, tmp_path)
    pipeline.replay_batch(trace, tb, PipelineConfig(num_buckets=8), "b0")
    _assert_matches(_state(spark, str(tmp_path / "lake")), expected)


def test_split_replay_with_overlap_exactly_once(spark, trace_rows, tmp_path):
    """Duplicate LSN ranges across micro-batches must be absorbed
    (the exactly-once upgrade of the reference's at-least-once,
    README.md:57 + listener.go:426 LSN guard)."""
    trace, rows = trace_rows
    expected = oracle.apply_trace(rows)
    median = sorted(r["lsn"] for r in rows)[len(rows) // 2]
    split = (median // spec.SLOT) * spec.SLOT
    first = trace.filter(F.col("lsn") < split)
    second = trace.filter(F.col("lsn") >= split - 4 * spec.SLOT)  # 4-tx overlap
    root = str(tmp_path / "lake")
    tb = _fresh_table(spark, tmp_path)
    cfg = PipelineConfig(num_buckets=8)
    pipeline.replay_batch(first, tb, cfg, "b0")
    tb = LakeTable.load(spark, root)
    pipeline.replay_batch(second, tb, cfg, "b1")
    _assert_matches(_state(spark, root), expected)


def test_epoch_replay_is_noop(spark, trace_rows, tmp_path):
    trace, _ = trace_rows
    root = str(tmp_path / "lake")
    tb = _fresh_table(spark, tmp_path)
    cfg = PipelineConfig(num_buckets=8)
    pipeline.replay_batch(trace, tb, cfg, "b0")
    before = _state(spark, root)
    s = pipeline.replay_batch(trace, LakeTable.load(spark, root), cfg, "b0")
    assert s["noop"]
    assert _state(spark, root) == before


def test_filter_allowlist_drops_deletes(spark, trace_rows, tmp_path):
    trace, rows = trace_rows
    expected = oracle.apply_trace([r for r in rows if r["op"] != "D"])
    tb = _fresh_table(spark, tmp_path)
    cfg = PipelineConfig(
        num_buckets=8, filter_tables={"repos": ["insert", "update", "truncate"]}
    )
    pipeline.replay_batch(trace, tb, cfg, "b0")
    got = _state(spark, str(tmp_path / "lake"))
    assert set(got) == set(expected)


def test_filter_unknown_table_drops_everything(spark, trace_rows, tmp_path):
    """Tables absent from the filter map are dropped (wal.go:150-158),
    but the LSN watermark still advances (ack proceeds)."""
    trace, _ = trace_rows
    tb = _fresh_table(spark, tmp_path)
    pipeline.replay_batch(
        trace, tb, PipelineConfig(num_buckets=8, filter_tables={"other": ["insert"]}), "b0"
    )
    tb = LakeTable.load(spark, str(tmp_path / "lake"))
    assert tb.read_public().count() == 0
    assert tb.last_applied_lsn > 0


def test_hot_key_skew_present(spark, trace_rows):
    """The generator's skew knob: one repo carries >= 25% of keys
    (FIXTURES.md §6.7) — the workload salting/AQE is graded on."""
    _, rows = trace_rows
    final = oracle.apply_trace(rows)
    hot = sum(1 for (repo, _p) in final if repo == spec.HOT_REPO)
    assert hot / len(final) >= 0.25


def test_noise_ops_ignored(spark, trace_rows, tmp_path):
    """Origin 'O' / Type 'Y' messages are logged-and-ignored
    (parser.go:68-69,94-95)."""
    trace, rows = trace_rows
    assert any(r["op"] in ("O", "Y") for r in rows)
    expected = oracle.apply_trace([r for r in rows if r["op"] not in ("O", "Y")])
    assert expected == oracle.apply_trace(rows)


def test_hot_update_storm_replay(spark, tmp_path):
    """A single key receiving a consecutive-update storm (hot_updates
    knob) must converge to the storm's last version, identically on the
    default single-exchange compaction and the salted two-phase path
    (compact_pre_salt) — and the salted phase-1 plan must carry map-side
    partial aggregation BEFORE its exchange (the property that collapses
    the storm per map task at scale)."""
    import hashlib as _h

    n_hot = 400
    trace = generator.build_trace(
        spark, SF_DIR, amplify=1, hot_updates=n_hot
    )
    states = {}
    for salt in (None, 8):
        root = str(tmp_path / f"lake_s{salt}")
        tb = LakeTable.create(
            spark, root, ["repo", "path"], FIELDS, num_buckets=8
        )
        pipeline.replay_batch(
            trace, tb,
            PipelineConfig(num_buckets=8, compact_pre_salt=salt),
            "b0",
        )
        states[salt] = _state(spark, root)
    assert states[None] == states[8]
    # the storm key's final state is the last hot update
    hot_rows = [
        v for v in states[None].values()
        if v["content"] and f"#hv{n_hot - 1}" in v["content"]
    ]
    assert len(hot_rows) == 1
    expected_commit = _h.sha256(f"hot:{n_hot - 1}".encode()).hexdigest()[:40]
    assert hot_rows[0]["commit"] == expected_commit

    # plan shape: phase-1 aggregation has a partial aggregate before its
    # exchange (HashAggregate/SortAggregate appears on the map side)
    from wal_listener_spark.operators import apply as apply_op
    from wal_listener_spark.operators.registry import RelationRegistry

    reg = RelationRegistry().update_from_trace(trace)
    rel = pipeline.stamp_table_names(
        trace.filter(F.col("op").isin("I", "U", "D")), reg
    ).filter(F.col("rel_id") == 1)
    plan = (
        apply_op.compact_agg(rel, reg.relations[1], num_buckets=8, pre_salt=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the map-side PARTIAL aggregate must sit below the salt exchange —
    # i.e. after the LAST Exchange in the top-down plan string (the
    # deepest exchange is the salted phase-1 shuffle; an aggregate
    # printed after it executes before any shuffle, on the scan side).
    # Checking below the FIRST exchange would be vacuous: any aggregate
    # anywhere in the plan, including phase-2's final agg, satisfies it.
    # (anchor on the deepest HASH exchange: the scan side also carries
    # the generator's round-robin spread, which owns no aggregate)
    below_last_exchange = plan[plan.rindex("Exchange hashpartitioning"):]
    assert "Aggregate" in below_last_exchange, plan
    # ... and it runs in partial mode (Spark prints partial-mode agg
    # functions as partial_<fn>), proving map-side combine collapses a
    # hot key's storm before any row crosses the wire
    assert "partial_" in below_last_exchange, plan


def test_adaptive_storm_special_case_from_census(spark, tmp_path, monkeypatch):
    """replay_batch derives hot-key handling from the census's free
    per-tx statistics: a transaction above max(50k, 4x a reducer's fair
    share) is special-cased in compact_agg (storm_txs — its rows
    pre-aggregate separately and re-join the single-exchange plan as
    partial maxes); storm-free batches keep the plain plan; explicit
    compact_pre_salt config always wins over the derived handling.
    The replayed STATE must be identical on every path (the oracle
    drives that via test_hot_update_storm_replay; here the census
    decision itself is pinned)."""
    from wal_listener_spark.operators import apply as apply_op

    seen: list = []
    real = apply_op.compact_agg

    def spy(*a, **kw):
        seen.append((kw.get("pre_salt"), kw.get("storm_txs")))
        return real(*a, **kw)

    monkeypatch.setattr(apply_op, "compact_agg", spy)

    # storm-free batch: no special case derived
    trace = generator.build_trace(spark, SF_DIR, amplify=1)
    tb = LakeTable.create(
        spark, str(tmp_path / "uni"), ["repo", "path"], FIELDS, num_buckets=8
    )
    pipeline.replay_batch(trace, tb, PipelineConfig(num_buckets=8), "b0")
    assert seen == [(None, None)]

    # a storm transaction above both thresholds must be special-cased;
    # generating >50k real rows is CI budget, so drop the absolute floor
    # to the test's scale by monkeypatching the census constant is not
    # possible (it is an inline literal riding the census aggregate) —
    # instead replay a storm below the floor and assert the DEFAULT
    # path (documents the floor contract), then assert the explicit
    # config override.
    seen.clear()
    hot = generator.build_trace(spark, SF_DIR, amplify=1, hot_updates=600)
    tb2 = LakeTable.create(
        spark, str(tmp_path / "hot"), ["repo", "path"], FIELDS, num_buckets=8
    )
    pipeline.replay_batch(hot, tb2, PipelineConfig(num_buckets=8), "b0")
    assert seen == [(None, None)]  # 600 < 50k floor: no storm handling

    seen.clear()
    tb3 = LakeTable.create(
        spark, str(tmp_path / "cfg"), ["repo", "path"], FIELDS, num_buckets=8
    )
    pipeline.replay_batch(
        hot, tb3, PipelineConfig(num_buckets=8, compact_pre_salt=4), "b0"
    )
    assert seen == [(4, None)]


def test_storm_special_case_state_matches_default(spark, tmp_path):
    """compact_agg's storm_txs special case (storm rows pre-aggregated
    separately, re-joined as partial maxes) must produce the identical
    replayed state to the plain path and the salted path for the same
    storm trace — driven end-to-end through replay_batch."""
    n_hot = 500
    trace = generator.build_trace(spark, SF_DIR, amplify=1, hot_updates=n_hot)
    hot_tx = trace.filter(F.col("op") == "C").agg(
        F.max("tx_id")
    ).collect()[0][0]  # the storm tx has the highest tx id (nk + 10)

    from wal_listener_spark.operators import apply as apply_op

    states = {}
    for label, kw in (
        ("plain", {}),
        ("storm", {"storm_txs": [int(hot_tx)]}),
        ("salted", {"compact_pre_salt": 8}),
    ):
        root = str(tmp_path / f"lake_{label}")
        tb = LakeTable.create(
            spark, root, ["repo", "path"], FIELDS, num_buckets=8
        )
        if label == "storm":
            real = apply_op.compact_agg

            def forced(*a, **k):
                k.setdefault("storm_txs", [int(hot_tx)])
                return real(*a, **k)

            apply_op.compact_agg = forced
            try:
                pipeline.replay_batch(
                    trace, tb, PipelineConfig(num_buckets=8), "b0"
                )
            finally:
                apply_op.compact_agg = real
        else:
            cfg = PipelineConfig(num_buckets=8, **kw)
            pipeline.replay_batch(trace, tb, cfg, "b0")
        states[label] = _state(spark, root)
    assert states["plain"] == states["storm"] == states["salted"]
    assert any(
        v["content"] and f"#hv{n_hot - 1}" in v["content"]
        for v in states["storm"].values()
    )
