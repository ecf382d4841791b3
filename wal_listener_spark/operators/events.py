"""Event projection + subject routing (reference T4/T7).

The reference turns each ActionData into a published Event
(``/root/reference/internal/listener/transaction/wal.go:128-148``):
fresh uuid, schema, table, action, Data / DataOld maps, EventTime =
CommitTime; the broker subject is
``topic + "." + prefix + (topicsMap[schema_table] or schema_table)``
(``internal/publisher/event.go:24-36``, expectation
``STREAM.prefix_public_users`` in ``internal/publisher/nats_test.go:27-44``).

Spark-first deviations, both deliberate:
 - event id is deterministic (`sha2(lsn:seq)` truncated to uuid shape)
   instead of ``uuid.New()`` so replays are idempotent — the
   exactly-once upgrade (north_rule) requires replay-stable identity.
 - "publish" is the MERGE into the lake table; this projection is the
   canonical change-event frame an alternative Kafka sink would write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .filters import action_col


def deterministic_event_id(lsn_col: Column, seq_col: Column) -> Column:
    h = F.sha2(F.concat(lsn_col.cast("string"), F.lit(":"), seq_col.cast("string")), 256)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


#: above this many topicsMap entries subject stamping switches from a
#: CASE chain to a broadcast join (same Catalyst-analysis blow-up and
#: fix as pipeline.stamp_table_names / filters.allowlist_filter)
TOPICS_BROADCAST_THRESHOLD = 16


def subject_name(
    schema_col: Column,
    table_col: Column,
    topic: str,
    topic_prefix: str = "",
    topics_map: dict[str, str] | None = None,
) -> Column:
    """event.go:24-36: topic '.' prefix + (map override or schema_table).
    Expression form — for small maps; use :func:`stamp_subjects` for a
    DataFrame-level variant that broadcast-joins large maps."""
    schema_table = F.concat(schema_col, F.lit("_"), table_col)
    mapped = schema_table
    for k, v in (topics_map or {}).items():
        mapped = F.when(schema_table == k, F.lit(v)).otherwise(mapped)
    return F.concat(F.lit(topic), F.lit("."), F.lit(topic_prefix), mapped)


def stamp_subjects(
    df: DataFrame,
    topic: str,
    topic_prefix: str = "",
    topics_map: dict[str, str] | None = None,
    schema_col: str = "schema",
    table_col: str = "table",
    out_col: str = "subject",
) -> DataFrame:
    """Append the broker subject column for a multi-relation event
    stream. Small maps fold into a CASE expression; above
    TOPICS_BROADCAST_THRESHOLD the override map becomes a broadcast
    left join on schema_table (constant-size plan, no payload shuffle)."""
    topics_map = topics_map or {}
    if len(topics_map) <= TOPICS_BROADCAST_THRESHOLD:
        return df.withColumn(
            out_col,
            subject_name(
                F.col(schema_col), F.col(table_col), topic, topic_prefix, topics_map
            ),
        )
    m = df.sparkSession.createDataFrame(
        sorted(topics_map.items()), "__schema_table string, __mapped string"
    )
    df = df.withColumn(
        "__schema_table", F.concat(F.col(schema_col), F.lit("_"), F.col(table_col))
    )
    return (
        df.join(F.broadcast(m), "__schema_table", "left")
        .withColumn(
            out_col,
            F.concat(
                F.lit(topic),
                F.lit("."),
                F.lit(topic_prefix),
                F.coalesce(F.col("__mapped"), F.col("__schema_table")),
            ),
        )
        .drop("__schema_table", "__mapped")
    )


def to_events(
    changes: DataFrame,
    schema_name: str,
    table_name: str,
    topic: str = "wal_listener",
    topic_prefix: str = "",
    topics_map: dict[str, str] | None = None,
) -> DataFrame:
    """Raw trace rows (with text maps) -> canonical event frame.

    schema/table are per-call literals here, so the topicsMap override
    resolves driver-side (a dict get) — no CASE chain, no join,
    regardless of map size."""
    schema_table = f"{schema_name}_{table_name}"
    mapped = (topics_map or {}).get(schema_table, schema_table)
    subject = f"{topic}.{topic_prefix}{mapped}"
    return changes.filter(F.col("op").isin("I", "U", "D", "T")).select(
        deterministic_event_id(F.col("lsn"), F.col("seq")).alias("id"),
        F.lit(schema_name).alias("schema"),
        F.lit(table_name).alias("table"),
        F.upper(action_col()).alias("action"),
        F.col("new_vals").alias("data"),
        F.col("old_vals").alias("data_old"),
        F.col("commit_ts").alias("event_time"),
        F.lit(subject).alias("subject"),
        F.col("lsn"),
        F.col("seq"),
    )
