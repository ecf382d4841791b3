"""Last-write-wins apply: per-key compaction with TOAST carry-forward,
delete and truncate semantics.

The reference never needs this operator — single-threaded consumption
gives it total order for free (``listener.go:364-386``). Once the stream
is a partitioned DataFrame, ordering matters only *within* a key
(cross-key order is unobservable in final state — same argument the
reference relies on for per-table topics, SURVEY.md §2.6). So:

 - per (repo, path) window ordered by (lsn, seq): TOAST 'u' columns take
   the last explicitly-sent value (carry-forward), the winning row is
   row_number()==1 descending — one shuffle on the full key, uniform
   under hot-*repo* skew because the hash includes path.
 - final DELETE drops the key (wal.go kind delete).
 - TRUNCATE is an LSN barrier: keys whose last change precedes the
   truncate are dropped (parser.go:212-225 fans truncate out per
   relation; valid WAL never interleaves a key across the barrier).

The struct-wrapping trick below distinguishes "TOAST-unchanged" (skip in
carry-forward) from an explicit SQL NULL (real value that must overwrite):
explicit NULL is a non-null struct with a null field, TOAST is a null
struct, and ``last(ignorenulls=True)`` skips only the latter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def last_write_wins(
    changes: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    toastable_cols: list[str] | None = None,
    lsn_col: str = "lsn",
    seq_col: str = "seq",
) -> DataFrame:
    """Compact a change set to one final row per key.

    Input rows: op in (I,U,D) with typed columns + ``toast_cols`` array.
    Output: surviving rows (op != D at the end), one per key, with
    ``lsn``/``seq``/``commit_ts`` of the winning change.
    """
    toastable = toastable_cols if toastable_cols is not None else value_cols
    w_fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(lsn_col).asc(), F.col(seq_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = changes
    has_toast_info = "toast_cols" in df.columns
    for c in value_cols:
        if c in toastable and has_toast_info:
            wrapped = F.when(
                F.array_contains(F.col("toast_cols"), c) | (F.col("op") == "D"),
                F.lit(None),
            ).otherwise(F.struct(F.col(c).alias("v")))
            df = df.withColumn(
                c, F.last(wrapped, ignorenulls=True).over(w_fwd).getField("v")
            )
        else:
            wrapped = F.when(F.col("op") == "D", F.lit(None)).otherwise(
                F.struct(F.col(c).alias("v"))
            )
            df = df.withColumn(
                c, F.last(wrapped, ignorenulls=True).over(w_fwd).getField("v")
            )

    w_last = Window.partitionBy(*key_cols).orderBy(
        F.col(lsn_col).desc(), F.col(seq_col).desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w_last))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def truncate_barrier_lsn(changes: DataFrame) -> int | None:
    """Highest TRUNCATE lsn in the change set (None if no truncate)."""
    row = changes.filter(F.col("op") == "T").agg(F.max("lsn").alias("l")).collect()[0]
    return row["l"]


def final_state(
    changes: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    toastable_cols: list[str] | None = None,
) -> DataFrame:
    """Full batch-local apply: truncate barrier -> LWW -> drop deletes."""
    t_lsn = truncate_barrier_lsn(changes)
    data = changes.filter(F.col("op").isin("I", "U", "D"))
    compacted = last_write_wins(data, key_cols, value_cols, toastable_cols)
    out = compacted.filter(F.col("op") != "D")
    if t_lsn is not None:
        out = out.filter(F.col("lsn") > F.lit(t_lsn))
    return out.drop("toast_cols", "op", "tx_id")
