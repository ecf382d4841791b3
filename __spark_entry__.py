"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC replay (full engine path: trace ->
assembly -> registry -> filter -> LWW apply -> lake MERGE -> snapshot
read) at sf0.001. ``queries()`` exposes one entry per implemented
operator from SURVEY.md §2 plus the training-data ops; ``oracle_sql()``
gives the DuckDB twin for each — every query is fully oracle-gated
(round 2 added the ann_lsh_topk oracle via inlined deterministic
hyperplane constants).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wal_listener_spark import queries as cdc_q
from wal_listener_spark import queries_data as data_q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return cdc_q.q_cdc_replay_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    out.update(cdc_q.CDC_QUERIES)
    out.update(data_q.DATA_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(cdc_q._oracle_cdc())
    out.update(data_q.data_oracle_sql())
    return out
