"""Table/action allow-list filter (reference T3).

Mirrors ``WAL.CreateEventsWithFilter``'s allow-list
(``/root/reference/internal/listener/transaction/wal.go:116-172``): config
maps table -> allowed actions (insert/update/delete/truncate —
``README.md:59-77``), matching is case-insensitive (``wal.go:174-183``),
tables absent from the map are dropped, and skipped events are metered
(``IncFilterSkippedEvents`` — ``internal/config/metrics.go``).

Spark-first: one Catalyst ``filter`` (pushed below projections
automatically) plus ``observe()`` counters instead of Prometheus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

OP_TO_ACTION = {"I": "insert", "U": "update", "D": "delete", "T": "truncate"}

#: above this many configured tables the allow-list switches from an
#: OR-chain predicate to a broadcast semi-join — a chain of hundreds of
#: branches costs O(tables) Catalyst analysis per query (same blow-up
#: pipeline.stamp_table_names hit), while the join is a constant-size
#: plan with a tiny broadcast relation and no payload shuffle
FILTER_BROADCAST_THRESHOLD = 16


def action_col(op_col="op"):
    c = F.col(op_col)
    expr = F.lit("unknown")
    for op, action in OP_TO_ACTION.items():
        expr = F.when(c == op, F.lit(action)).otherwise(expr)
    return expr


def allowlist_filter(
    df: DataFrame,
    table_actions: dict[str, list[str]] | None,
    table_col: str = "table_name",
    observe: bool = True,
) -> tuple[DataFrame, Observation | None]:
    """Keep rows whose (table, action) is allow-listed.

    ``table_actions=None`` disables filtering (reference behavior with no
    filter config). An empty action list for a table drops everything for
    it — same as the reference's ``inArray`` over an empty list.
    """
    if table_actions is None:
        return df, None

    normalized = {t: [a.lower() for a in acts] for t, acts in table_actions.items()}
    df = df.withColumn("__action", action_col())

    if len(normalized) > FILTER_BROADCAST_THRESHOLD:
        # broadcast the (table, action) allow pairs and keep rows that
        # match — the marker column doubles as the skip predicate for
        # the observe() counters, so semantics match the OR-chain path
        pairs = sorted(
            {(t, a) for t, acts in normalized.items() for a in acts}
        )
        allow = df.sparkSession.createDataFrame(
            pairs, f"{table_col} string, __action string"
        ).withColumn("__allowed", F.lit(True))
        df = df.join(F.broadcast(allow), [table_col, "__action"], "left")
        cond = F.col("__allowed").isNotNull()
        drop_cols = ["__action", "__allowed"]
    else:
        cond = F.lit(False)
        for table, actions in normalized.items():
            cond = cond | (
                (F.col(table_col) == table) & F.col("__action").isin(actions)
            )
        drop_cols = ["__action"]

    obs = None
    if observe:
        obs = Observation("filter_metrics")
        # skipped = NOT kept, via when(cond, 0).otherwise(1): a NULL
        # predicate (NULL table_name from an unregistered rel_id) drops
        # the row, so it must COUNT as skipped — `when(~cond, 1)` would
        # fall through to 0 on NULL and the OR-chain vs broadcast paths
        # would report different totals for identical input
        df = df.observe(
            obs,
            F.count(F.lit(1)).alias("events_total"),
            F.sum(F.when(cond, 0).otherwise(1)).alias("filter_skipped_events"),
        )
    return df.filter(cond).drop(*drop_cols), obs
