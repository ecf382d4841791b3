"""Byte-level decode parity — the Spark analog of the reference's
parser tests (``internal/listener/transaction/parser_test.go``): known
byte frames in, decoded structures out, including null/TOAST cells,
Update old-tuple variants, Truncate fan-out and unknown-type tolerance."""

import datetime

import pytest
from pyspark.sql import functions as F

from wal_listener_spark.operators import decode
from wal_listener_spark.operators.registry import RelationRegistry, RelationSchema
from wal_listener_spark.trace import framed, framing, generator
from wal_listener_spark.trace.framing import ts_to_pg_micros


def _decode_frames(spark, frames: list[tuple[int, bytes]]):
    df = spark.createDataFrame(frames, "lsn long, frame binary")
    return {r["lsn"]: r.asDict(recursive=True) for r in decode.decode_frames(df).collect()}


def test_begin_commit_roundtrip(spark):
    ts = datetime.datetime(2022, 8, 27, 17, 44, 1, tzinfo=datetime.timezone.utc)
    us = ts_to_pg_micros(ts.timestamp())
    out = _decode_frames(
        spark,
        [(1, framing.encode_begin(100, us, 7)), (2, framing.encode_commit(100, 105, us))],
    )
    b, c = out[1], out[2]
    assert b["op"] == "B" and b["xid"] == 7
    assert b["commit_ts"].replace(tzinfo=datetime.timezone.utc) == ts
    assert c["op"] == "C"
    assert c["commit_ts"].replace(tzinfo=datetime.timezone.utc) == ts


def test_insert_with_null_and_toast_cells(spark):
    # tuple cells: 't' text / 'n' null / 'u' toast (parser.go:325-344)
    f = framing.encode_insert(5, [("t", b"42"), ("n", None), ("u", None)])
    out = _decode_frames(spark, [(10, f)])[10]
    assert out["op"] == "I" and out["rel_id"] == 5
    assert out["new_cell_tags"] == ["t", "n", "u"]
    assert out["new_cell_vals"] == ["42", None, None]


def test_update_with_key_old_tuple(spark):
    f = framing.encode_update(
        7, [("t", b"new")], old_cells=[("t", b"old")], old_kind="K"
    )
    out = _decode_frames(spark, [(11, f)])[11]
    assert out["old_cell_tags"] == ["t"] and out["old_cell_vals"] == ["old"]
    assert out["new_cell_vals"] == ["new"]


def test_update_without_old_tuple(spark):
    f = framing.encode_update(7, [("t", b"new")])
    out = _decode_frames(spark, [(12, f)])[12]
    assert out["old_cell_tags"] is None and out["new_cell_vals"] == ["new"]


def test_delete_old_tuple(spark):
    f = framing.encode_delete(7, [("t", b"key")], old_kind="O")
    out = _decode_frames(spark, [(13, f)])[13]
    assert out["op"] == "D" and out["old_cell_vals"] == ["key"]


def test_relation_columns(spark):
    f = framing.encode_relation(
        3, "public", "users", [("id", 23, True), ("name", 1043, False)]
    )
    out = _decode_frames(spark, [(14, f)])[14]
    assert out["schema_name"] == "public" and out["table_name"] == "users"
    assert out["rel_columns"] == [
        {"name": "id", "type_oid": 23, "is_key": True, "typmod": -1},
        {"name": "name", "type_oid": 1043, "is_key": False, "typmod": -1},
    ]


def test_truncate_fanout_and_unknown_type_skipped(spark):
    # Truncate fans out per relation (parser.go:212-225); unknown message
    # types are skipped without error (parser.go:171-173)
    frames = [(20, framing.encode_truncate([1, 2], option=1)), (21, b"Zjunk")]
    df = decode.decode_frames(
        spark.createDataFrame(frames, "lsn long, frame binary")
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["truncate_rel_ids"] == [1, 2]
    reg = RelationRegistry()
    reg.relations[1] = RelationSchema(1, "public", "t1", [("k", 25, True)])
    reg.relations[2] = RelationSchema(2, "public", "t2", [("k", 25, True)])
    fanned = decode.resolve_names(df, reg).filter(F.col("op") == "T").collect()
    assert sorted(r["rel_id"] for r in fanned) == [1, 2]


def test_same_arity_rename_resolves_by_lsn(spark):
    """A mid-stream column RENAME (same arity) must resolve frames
    before the rename with the old names and after with the new —
    parity with the reference's wholesale RelationData replacement per
    R message (parser.go:71-93). resolve_names versions the registry
    lookup by the R message's LSN, not only (rel_id, arity)."""
    frames = [
        (100, framing.encode_relation(9, "public", "t", [("k", 25, True), ("v", 25, False)])),
        (110, framing.encode_insert(9, [("t", b"a"), ("t", b"old-style")])),
        (200, framing.encode_relation(9, "public", "t", [("k", 25, True), ("v2", 25, False)])),
        (210, framing.encode_insert(9, [("t", b"b"), ("t", b"new-style")])),
    ]
    decoded = decode.decode_frames(
        spark.createDataFrame(frames, "lsn long, frame binary")
    )
    reg = RelationRegistry().update_from_trace(
        decoded.filter("op = 'R'").select(
            "lsn", "rel_id", "schema_name", "table_name", "rel_columns"
        )
    )
    assert [
        [c[0] for c in s.columns] for s in reg.versions_of(9)
    ] == [["k", "v"], ["k", "v2"]]
    # history survives the manifest JSON round-trip
    reg2 = RelationRegistry.from_json(reg.to_json())
    assert [s.columns for s in reg2.versions_of(9)] == [
        s.columns for s in reg.versions_of(9)
    ]

    vals = {
        r["lsn"]: r["new_vals"]
        for r in decode.resolve_names(decoded, reg2)
        .filter(F.col("op") == "I")
        .collect()
    }
    assert vals[110] == {"k": "a", "v": "old-style"}
    assert vals[210] == {"k": "b", "v2": "new-style"}


def test_vectorized_matches_reference_decoder(spark):
    """Parity pin: the batch-numpy decoder and the per-frame struct
    golden decoder (`_decode_one`) must agree byte-for-byte on a full
    trace (all frame kinds: B/C/R/I/U/D/T + ignored O/Y + evolution +
    TOAST + explicit NULL cells)."""
    from tests.conftest import SF_DIR

    trace = generator.build_trace(spark, SF_DIR, amplify=1, k_tr=60)
    frames = framed.frames_from_columnar(trace)
    fast = {r["lsn"]: r for r in decode.decode_frames(frames).collect()}
    gold = {r["lsn"]: r for r in decode.decode_frames_reference(frames).collect()}
    assert set(fast) == set(gold)
    assert all(fast[k] == gold[k] for k in gold)


def test_assign_tx_across_range_boundaries(spark):
    """A transaction whose rows straddle a stripe boundary must still get
    its Begin's XID (per-range mode with the cross-stripe carry). Forcing
    num_ranges >> tx width makes every tx straddle several stripes."""
    us = ts_to_pg_micros(1700000000.0)
    frames = []
    for t, (xid, base) in enumerate([(101, 100), (202, 200), (303, 300)]):
        frames.append((base, framing.encode_begin(base, us, xid)))
        for j in range(5):
            frames.append(
                (base + 1 + j, framing.encode_insert(1, [("t", f"k{t}{j}".encode())]))
            )
        frames.append((base + 9, framing.encode_commit(base + 9, base + 9, us)))
    df = spark.createDataFrame(frames, "lsn long, frame binary")
    reg = RelationRegistry()
    reg.relations[1] = RelationSchema(1, "public", "t1", [("k", 25, True)])
    columnar = decode.resolve_names(decode.decode_frames(df), reg)

    strict = {
        r["lsn"]: (r["tx_id"], r["seq"])
        for r in decode.assign_tx(columnar, per_range=False).collect()
    }
    for n_ranges in (4, 50):  # 50 > lsn span/row count: every tx straddles
        ranged = {
            r["lsn"]: (r["tx_id"], r["seq"])
            for r in decode.assign_tx(
                columnar, per_range=True, num_ranges=n_ranges
            ).collect()
        }
        assert ranged == strict
    # row_number runs over the whole tx partition (B row counts first)
    assert strict[105] == (101, 6) and strict[304] == (303, 5)


def test_framed_roundtrip_matches_oracle(spark, tmp_path):
    """Full capability test: columnar -> byte frames -> vectorized decode
    -> registry name resolution -> tx assignment -> replay == oracle."""
    from tests.conftest import FIELDS, SF_DIR
    from wal_listener_spark import oracle, pipeline
    from wal_listener_spark.config import PipelineConfig
    from wal_listener_spark.lake.table import LakeTable

    trace = generator.build_trace(spark, SF_DIR, amplify=1, k_tr=100).persist()
    rows = [r.asDict(recursive=True) for r in trace.collect()]
    expected = oracle.apply_trace(rows)

    frames = framed.frames_from_columnar(trace)
    decoded = decode.decode_frames(frames)
    reg = RelationRegistry().update_from_trace(
        decoded.filter("op = 'R'").select(
            "lsn", "rel_id", "schema_name", "table_name", "rel_columns"
        )
    )
    # per_range=True: the deterministic-stripe scale path (carry map
    # handles transactions straddling stripe boundaries)
    columnar = decode.assign_tx(decode.resolve_names(decoded, reg), per_range=True)

    tb = LakeTable.create(
        spark, str(tmp_path / "t"), ["repo", "path"], FIELDS, num_buckets=8
    )
    pipeline.replay_batch(columnar, tb, PipelineConfig(num_buckets=8), "b0")
    got = {
        (r["repo"], r["path"]): r.asDict()
        for r in LakeTable.load(spark, str(tmp_path / "t")).read_public().collect()
    }
    assert set(got) == set(expected)
    assert all(got[k]["content"] == expected[k].get("content") for k in expected)
    assert all(
        got[k].get("stars") == (int(e["stars"]) if e.get("stars") is not None else None)
        for k, e in expected.items()
    )


def test_batch_decoder_edge_shapes_match_golden():
    """Offline (no Spark) parity on shapes the trace generator never
    emits: empty tuples, zero-length text cells, 'O' old-tuple kind,
    multi-relation truncate, negative XID, multibyte UTF-8."""
    import numpy as np
    import pandas as pd

    frames = [
        (1, framing.encode_insert(5, [])),
        (2, framing.encode_insert(5, [("t", b"")])),
        (3, framing.encode_update(5, [("t", b"x")],
                                  [("t", b""), ("u", None)], old_kind="O")),
        (4, framing.encode_delete(5, [("n", None)], old_kind="O")),
        (5, framing.encode_truncate([7, 8, 9], option=3)),
        (6, framing.encode_begin(99, 0, -5)),
        (7, framing.encode_insert(5, [("t", "héllo→".encode())])),
    ]
    pdf = pd.DataFrame({
        "lsn": np.array([f[0] for f in frames], dtype=np.int64),
        "frame": [f[1] for f in frames],
    })
    fast = decode._decode_batch(pdf).reset_index(drop=True)
    for i, (lsn, fr) in enumerate(frames):
        gold = decode._decode_one(lsn, fr)
        for k in decode._COLS:
            fv, gv = fast.iloc[i][k], gold[k]
            if k == "commit_ts":
                assert (pd.isna(fv) and gv is None) or fv == gv, (lsn, k)
            else:
                assert (fv is None and gv is None) or fv == gv, (lsn, k, fv, gv)
