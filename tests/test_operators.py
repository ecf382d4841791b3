"""Unit coverage for individual operators: events/routing, assembly
integrity, skew helpers."""

from pyspark.sql import functions as F

from wal_listener_spark.operators import events, skew
from wal_listener_spark.operators.assemble import (
    assemble_transactions,
    integrity_violations,
)


def test_subject_name_parity(spark):
    """Routing format parity with the reference's NATS test expectation
    ``STREAM.prefix_public_users`` (internal/publisher/nats_test.go:27-44,
    event.go:24-36)."""
    df = spark.createDataFrame([("public", "users")], "s string, t string")
    out = df.select(
        events.subject_name(F.col("s"), F.col("t"), "STREAM", "prefix_").alias("subj")
    ).collect()[0]["subj"]
    assert out == "STREAM.prefix_public_users"


def test_subject_topics_map_override(spark):
    df = spark.createDataFrame([("public", "users"), ("public", "other")], "s string, t string")
    out = {
        r["subj"]
        for r in df.select(
            events.subject_name(
                F.col("s"), F.col("t"), "STREAM", "", {"public_users": "custom"}
            ).alias("subj")
        ).collect()
    }
    assert out == {"STREAM.custom", "STREAM.public_other"}


def test_deterministic_event_id_stable_and_uuid_shaped(spark):
    df = spark.createDataFrame([(100, 1), (100, 1), (100, 2)], "lsn long, seq int")
    ids = [
        r["id"]
        for r in df.select(
            events.deterministic_event_id(F.col("lsn"), F.col("seq")).alias("id")
        ).collect()
    ]
    assert ids[0] == ids[1] != ids[2]
    parts = ids[0].split("-")
    assert [len(p) for p in parts] == [8, 4, 4, 4, 12]


def _trace(spark, rows):
    from wal_listener_spark.trace.generator import TRACE_SCHEMA

    return spark.createDataFrame(rows, TRACE_SCHEMA)


def test_assembly_stamps_commit_and_quarantines(spark):
    """Data rows get their tx's commit_ts; a tx with no Commit is the
    ErrMessageLost condition (parser.go:20-23) -> quarantined."""
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (16, 1, -1, "B", None, None, None, None, None, None, None, ts, None),
        (17, 1, 0, "I", 1, None, None, None, None, {"repo": "r"}, [], None, None),
        (23, 1, 999, "C", None, None, None, None, None, None, None, ts, None),
        (33, 2, 0, "I", 1, None, None, None, None, {"repo": "x"}, [], None, None),
        # tx 2 has no Commit
    ]
    committed, quarantined = assemble_transactions(_trace(spark, rows))
    c = committed.collect()
    assert len(c) == 1 and c[0]["commit_ts"] == ts and c[0]["commit_lsn"] == 23
    assert quarantined.count() == 1


def test_integrity_violations_frame(spark):
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (17, 1, 0, "I", 1, None, None, None, None, {"repo": "r"}, [], None, None),
        (23, 1, 999, "C", None, None, None, None, None, None, None, ts, None),
    ]
    v = integrity_violations(_trace(spark, rows)).collect()
    assert len(v) == 1 and v[0]["has_begin"] == 0


def test_allowlist_broadcast_above_threshold(spark):
    """A ≥100-table allow-list must plan as a broadcast join (constant
    plan size), not an O(tables) OR-chain — and produce identical rows
    and skip counters to the expression path."""
    from wal_listener_spark.operators import filters

    rows = [(op, f"t{i}") for i in range(120) for op in ("I", "U", "D")]
    df = spark.createDataFrame(rows, "op string, table_name string")
    # allow insert+update on even-numbered tables only
    cfg = {f"t{i}": ["insert", "update"] for i in range(0, 120, 2)}

    big, obs_big = filters.allowlist_filter(df, cfg)
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    got_big = sorted((r["op"], r["table_name"]) for r in big.collect())

    import unittest.mock as mock

    with mock.patch.object(filters, "FILTER_BROADCAST_THRESHOLD", 10_000):
        small, obs_small = filters.allowlist_filter(df, cfg)
        got_small = sorted((r["op"], r["table_name"]) for r in small.collect())
    assert got_big == got_small and len(got_big) == 120
    assert obs_big.get["filter_skipped_events"] == obs_small.get[
        "filter_skipped_events"
    ] == 360 - 120


def test_stamp_subjects_broadcast_above_threshold(spark):
    """A large topicsMap must stamp subjects via broadcast join, with
    overrides and fallback identical to the CASE-chain path."""
    df = spark.createDataFrame(
        [("public", "users"), ("public", "other")], "schema string, table string"
    )
    tmap = {f"public_x{i}": f"mapped{i}" for i in range(100)}
    tmap["public_users"] = "custom"
    out = events.stamp_subjects(df, "STREAM", "", tmap)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    got = {r["subject"] for r in out.collect()}
    assert got == {"STREAM.custom", "STREAM.public_other"}
    # small map: same API, expression path
    out2 = events.stamp_subjects(df, "STREAM", "", {"public_users": "custom"})
    assert {r["subject"] for r in out2.collect()} == got


def test_salted_agg_equals_plain_agg(spark):
    df = spark.range(10000).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("x")
    )
    plain = {
        r["g"]: (r["n"], r["s"])
        for r in df.groupBy("g").agg(F.count("x").alias("n"), F.sum("x").alias("s")).collect()
    }
    salted = {
        r["g"]: (r["n"], r["s"])
        for r in skew.salted_agg(
            df, ["g"], ["x"], {"n": ("count", "x"), "s": ("sum", "x")}, buckets=16
        ).collect()
    }
    assert plain == salted


def test_pii_redact_kinds_and_order(spark):
    """Each PII kind redacts to its token; emails go first (digit local
    parts must not be nibbled by the phone pattern) and dotted IPs
    survive the phone pass (dots are not in the phone class)."""
    from wal_listener_spark.functions import text as textfn

    rows = [
        (1, "mail a.b+c9@ex-a.co now"),
        (2, "call +1 (555) 010-0042 ok"),
        (3, "host 10.0.42.44 up"),
        (4, "x user123@example.com +44 20 7946 0958 at 192.168.0.1"),
        (5, "plain words only"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, t string")
    out = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            textfn.pii_redact(F.col("t")).alias("red"),
            *textfn.pii_counts(F.col("t")),
        ).collect()
    }
    assert out[1]["red"] == "mail <EMAIL> now" and out[1]["n_email"] == 1
    assert out[2]["red"] == "call <PHONE> ok" and out[2]["n_phone"] == 1
    assert out[3]["red"] == "host <IP> up" and out[3]["n_ip"] == 1
    assert out[4]["red"] == "x <EMAIL> <PHONE> at <IP>"
    assert (out[4]["n_email"], out[4]["n_phone"], out[4]["n_ip"]) == (1, 1, 1)
    assert out[5]["red"] == "plain words only"
    assert (out[5]["n_email"], out[5]["n_phone"], out[5]["n_ip"]) == (0, 0, 0)


def test_hyperplane_bucket_rejects_wrong_dim(spark):
    """The literal weight arrays are sized to dim; a mismatched vector
    must fail loudly instead of null-padding every plane sum and
    silently hashing ALL vectors to bucket 0 (which would collapse LSH
    pruning into an all-pairs join)."""
    import pytest

    from wal_listener_spark.functions.similarity import hyperplane_bucket

    ok = spark.createDataFrame(
        [(1, [float(i) for i in range(64)])], "id int, v array<double>"
    )
    assert ok.select(hyperplane_bucket(F.col("v"), 4).alias("b")).collect()

    bad = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "id int, v array<double>"
    )
    with pytest.raises(Exception, match="expected 64-dim vector, got 3"):
        bad.select(hyperplane_bucket(F.col("v"), 4).alias("b")).collect()


def test_filter_skip_count_parity_on_null_table(spark):
    """A NULL table_name row (unregistered rel_id) is dropped by the
    filter on BOTH the OR-chain and broadcast paths — and must COUNT as
    skipped on both, so the metric keeps one meaning as the allow-list
    grows across FILTER_BROADCAST_THRESHOLD."""
    from wal_listener_spark.operators.filters import allowlist_filter

    rows = [("repos", "I"), (None, "I"), ("other", "I")]
    df = spark.createDataFrame(rows, "table_name string, op string")

    few = {"repos": ["insert"]}
    many = {f"t{i}": ["insert"] for i in range(20)}
    many["repos"] = ["insert"]

    for cfg, kept_expected in ((few, 1), (many, 1)):
        out, obs = allowlist_filter(df, cfg)
        assert out.count() == kept_expected
        m = obs.get
        assert m["events_total"] == 3
        assert m["filter_skipped_events"] == 2, cfg.keys()


def test_multi_table_lsh_recall_is_superset(spark):
    """n_tables=2 must find every pair n_tables=1 finds (union of
    independent bucketings can only add recall), and drop duplicates
    for pairs colliding in both tables."""
    from wal_listener_spark.functions.dedup import embedding_near_dup_pairs

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    dup = emb.limit(30).selectExpr("vec_id + 100000 AS vec_id", "embedding")
    corpus = emb.unionByName(dup)
    one = {
        (r["a"], r["b"]) for r in
        embedding_near_dup_pairs(corpus, bits=6).collect()
    }
    two_rows = embedding_near_dup_pairs(corpus, bits=6, n_tables=2).collect()
    two = {(r["a"], r["b"]) for r in two_rows}
    assert one <= two
    assert len(two_rows) == len(two)  # distinct'd across tables
