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
    cond = F.lit(False)
    for table, actions in normalized.items():
        cond = cond | (
            (F.col(table_col) == table) & F.col("__action").isin(actions)
        )

    obs = None
    if observe:
        obs = Observation("filter_metrics")
        df = df.observe(
            obs,
            F.count(F.lit(1)).alias("events_total"),
            F.sum(F.when(~cond, 1).otherwise(0)).alias("filter_skipped_events"),
        )
    return df.filter(cond).drop("__action"), obs
