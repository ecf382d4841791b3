"""Lake maintenance (tombstone GC, snapshot expiry) and the event-feed
sink (Kafka hash-partitioner analog, K1-K4)."""

import os

from pyspark.sql import functions as F

from tests.conftest import FIELDS


def _mk(spark, tmp_path):
    from wal_listener_spark.lake.table import LakeTable

    return LakeTable.create(
        spark, str(tmp_path / "t"), ["repo", "path"], FIELDS, num_buckets=4
    )


def _chg(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string,"
        " lsn long, op string",
    )


def test_compact_gc_tombstones_and_expire(spark, tmp_path):
    from wal_listener_spark.lake.table import DELETED_COL, LakeTable

    tb = _mk(spark, tmp_path)
    rows = [(f"r{i}", f"f{i}", "c", "py", f"v{i}", 10 + i, "I") for i in range(20)]
    tb.merge_batch(_chg(spark, rows), "b0", 100)
    dels = [(f"r{i}", f"f{i}", None, None, None, 200 + i, "D") for i in range(0, 20, 2)]
    tb.merge_batch(_chg(spark, dels), "b1", 300)

    assert tb.read().filter(F.col(DELETED_COL)).count() == 10  # tombstones kept
    assert tb.read_public().count() == 10

    stats = tb.compact()
    assert stats["compaction"]
    tb2 = LakeTable.load(spark, str(tmp_path / "t"))
    assert tb2.read().filter(F.coalesce(F.col(DELETED_COL), F.lit(False))).count() == 0
    assert tb2.read_public().count() == 10  # live rows intact

    # a late stale change below the watermark must still be a no-op even
    # though its tombstone is gone — the truncate/high watermark and the
    # epoch guard do not cover per-key regression, so compaction must only
    # run with a watermark no in-flight epoch can precede; simulate the
    # safe case: new change has a HIGHER lsn and applies normally
    tb2.merge_batch(_chg(spark, [("r1", "f1", "c2", "py", "new", 400, "U")]), "b2", 400)
    got = {r["path"]: r["content"] for r in tb2.read_public().collect()}
    assert got["f1"] == "new"

    exp = tb2.expire_snapshots(keep_last=1)
    assert exp["removed_manifests"] >= 1
    # table still reads fine after expiry
    tb3 = LakeTable.load(spark, str(tmp_path / "t"))
    assert tb3.read_public().count() == 10


def test_event_feed_sink_key_partitioning(spark, tmp_path):
    """kafka.go:110-153 semantics: same message key -> same partition,
    per-partition LSN order."""
    from wal_listener_spark.operators import events as events_op
    from wal_listener_spark.operators.sink import publish_events
    from wal_listener_spark.operators.assemble import assemble_transactions
    from wal_listener_spark.trace import generator

    trace = generator.build_trace(spark, "/root/testdata/sf0.001", amplify=1)
    committed, _ = assemble_transactions(trace)
    ev = events_op.to_events(committed, "public", "repos")
    out = str(tmp_path / "feed")
    publish_events(ev, out, num_partitions=4, message_key_from="repo")

    feed = spark.read.parquet(out)
    assert feed.count() == ev.count()
    # same key never appears in two partitions
    multi = (
        feed.groupBy("message_key")
        .agg(F.countDistinct("partition").alias("np"))
        .filter(F.col("np") > 1)
        .count()
    )
    assert multi == 0
    # events are valid JSON with the reference's field names (event.go:13-21)
    one = feed.select(
        F.from_json(
            "value",
            "id string, schema string, table string, action string,"
            " data map<string,string>, commitTime timestamp",
        ).alias("e")
    ).first()["e"]
    assert one["action"] in ("INSERT", "UPDATE", "DELETE")
    assert one["schema"] == "public"


def test_kafka_writer_builds_unstarted(spark):
    """The flag-guarded broker codepath (K1) must construct — the plan,
    key/topic expressions and options — without a broker; only .start()
    needs the connector jar + a cluster."""
    from pyspark.sql import functions as F

    from wal_listener_spark.operators.sink import kafka_writer

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .select(
            F.lit("e1").alias("id"),
            F.lit("public").alias("schema"),
            F.lit("repos").alias("table"),
            F.lit("INSERT").alias("action"),
            F.create_map(F.lit("repo"), F.lit("r1")).alias("data"),
            F.create_map().cast("map<string,string>").alias("data_old"),
            F.col("timestamp").alias("event_time"),
            F.lit("wal_listener.public_repos").alias("subject"),
        )
    )
    writer = kafka_writer(
        stream, "broker:9092", "/tmp/nope", message_key_from="repo"
    )
    assert writer is not None  # unstarted DataStreamWriter


def test_kafka_loopback_contract(spark, tmp_path):
    """Start the Kafka payload stream against a foreachBatch loopback
    (no broker needed) and assert the exact per-epoch (key, value,
    topic) rows the producer would publish (kafka.go:110-153): key =
    messageKeyFrom field falling back to table (kafka.go:120-128),
    topic = the routed subject incl. topicsMap override (event.go:24-36)."""
    import datetime
    import json

    from wal_listener_spark.operators import events as events_op
    from wal_listener_spark.operators.sink import kafka_payload
    from wal_listener_spark.trace.generator import TRACE_SCHEMA

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (17, 1, 0, "I", 1, None, None, None, None,
         {"repo": "r1", "path": "a.py"}, [], ts, None),
        (18, 1, 1, "D", 1, None, None, None, {"repo": "r1"}, None, [], ts, None),
    ]
    ev = events_op.to_events(
        spark.createDataFrame(rows, TRACE_SCHEMA),
        "public", "repos",
        topic="STREAM", topic_prefix="p_",
        topics_map={"public_repos": "custom"},
    )
    src = str(tmp_path / "events")
    ev.write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    payload = kafka_payload(stream, message_key_from="repo")
    got: list[tuple] = []

    def _collect(df, _bid):
        got.extend((r["key"], r["topic"], r["value"]) for r in df.collect())

    q = (
        payload.writeStream.foreachBatch(_collect)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(got) == 2
    by_action = {json.loads(v)["action"]: (k, t, json.loads(v)) for k, t, v in got}
    # INSERT: key from data[messageKeyFrom]
    k, t, v = by_action["INSERT"]
    assert k == "r1" and t == "STREAM.p_custom"
    assert v["data"] == {"repo": "r1", "path": "a.py"} and v["table"] == "repos"
    # DELETE: no data map -> key falls back to table
    k, t, v = by_action["DELETE"]
    assert k == "repos" and t == "STREAM.p_custom"
    assert v["data_old"] == {"repo": "r1"} and "commitTime" in v


def test_dedup_event_stream_within_watermark(spark, tmp_path):
    """At-least-once redelivery across epochs collapses to exactly one
    event per deterministic id, with dedup state bounded by the
    watermark window (dropDuplicatesWithinWatermark — never an
    unbounded distinct)."""
    import datetime

    from wal_listener_spark.operators import events as events_op
    from wal_listener_spark.operators.sink import dedup_event_stream
    from wal_listener_spark.trace.generator import TRACE_SCHEMA

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (17, 1, 0, "I", 1, None, None, None, None,
         {"repo": "r1", "path": "a.py"}, [], ts, None),
        (18, 1, 1, "U", 1, None, None, None, None,
         {"repo": "r1", "path": "a.py"}, [], ts, None),
    ]
    ev = events_op.to_events(
        spark.createDataFrame(rows, TRACE_SCHEMA), "public", "repos"
    )
    # epoch 1: both events; epoch 2: a redelivery of the first (the
    # publish-then-crash-before-ack scenario) plus one new event
    src = str(tmp_path / "feed")
    ev.write.parquet(os.path.join(src, "f1"))
    redelivered = ev.limit(1)
    fresh = events_op.to_events(
        spark.createDataFrame(
            [(19, 2, 0, "D", 1, None, None, None, {"repo": "r1"},
              None, [], ts, None)],
            TRACE_SCHEMA,
        ),
        "public", "repos",
    )
    redelivered.unionByName(fresh).write.parquet(os.path.join(src, "f2"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    seen: list = []

    def _collect(df, _bid):
        seen.extend(r["id"] for r in df.collect())

    q = (
        dedup_event_stream(stream)
        .writeStream.foreachBatch(_collect)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(seen) == 3, f"expected 3 unique events, saw {len(seen)}"
    assert len(set(seen)) == 3  # the redelivered id came through once
