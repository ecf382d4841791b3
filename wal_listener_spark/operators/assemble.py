"""Transaction assembly — the tx barrier and integrity check.

The reference accumulates Begin -> changes -> Commit into a mutable WAL
struct and only flushes once CommitTime is set
(``/root/reference/internal/listener/transaction/wal.go:21-30``, flush at
``listener.go:401-424``); a Commit whose LSN disagrees with Begin raises
``ErrMessageLost`` and fail-stops the stream (``parser.go:54-67,20-23``).

Spark-first: a transaction is the group of rows sharing ``tx_id``. We
stamp every data row with its transaction's commit_ts by joining data
rows with 'C' rows on tx_id (AQE picks broadcast when commits are small,
sort-merge otherwise — on a cluster the trace is written tx-aligned so
this join never crosses files). Rows whose transaction lacks a Commit are
*uncommitted* — the reference would still be buffering them; in bounded
replay they are integrity violations, routed to quarantine and metered
rather than fail-stopping a 10^10-event job (SURVEY.md §4 fail-stop row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_flagged(trace: DataFrame) -> DataFrame:
    """Single-output variant: every data row, stamped with commit info
    when its tx committed, plus an ``__uncommitted`` flag. Lets callers
    count quarantined rows with a free ``observe()`` instead of a second
    full pass (the extra job dominated replay cost at bench scale)."""
    data = trace.filter(F.col("op").isin("I", "U", "D"))
    commits = (
        trace.filter(F.col("op") == "C")
        .select(
            F.col("tx_id").alias("c_tx_id"),
            F.col("commit_ts").alias("c_commit_ts"),
            F.col("lsn").alias("commit_lsn"),
        )
        .dropDuplicates(["c_tx_id"])
    )
    joined = data.join(commits, data["tx_id"] == commits["c_tx_id"], "left")
    flagged = (
        joined.withColumn("__uncommitted", F.col("c_tx_id").isNull())
        .withColumn("commit_ts", F.col("c_commit_ts"))
        .drop("c_tx_id", "c_commit_ts")
    )
    truncs = trace.filter(F.col("op") == "T").withColumn(
        "commit_lsn", F.col("lsn")
    ).withColumn("__uncommitted", F.lit(False))
    return flagged.unionByName(truncs, allowMissingColumns=True)


def assemble_transactions(trace: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Returns (committed, quarantined).

    committed: I/U/D/T rows stamped with commit_ts + commit_lsn of their
    transaction, ordered-key columns intact. T rows (their own barrier
    transaction in real WAL) carry their own lsn as commit_lsn.
    quarantined: data rows whose tx has no Commit in the input
    (ErrMessageLost analog — parser.go:20-23).
    """
    data = trace.filter(F.col("op").isin("I", "U", "D"))
    commits = (
        trace.filter(F.col("op") == "C")
        .select(
            F.col("tx_id").alias("c_tx_id"),
            F.col("commit_ts").alias("c_commit_ts"),
            F.col("lsn").alias("commit_lsn"),
        )
        .dropDuplicates(["c_tx_id"])
    )
    joined = data.join(commits, data["tx_id"] == commits["c_tx_id"], "left")

    committed = (
        joined.filter(F.col("c_tx_id").isNotNull())
        .withColumn("commit_ts", F.col("c_commit_ts"))
        .drop("c_tx_id", "c_commit_ts")
    )
    quarantined = joined.filter(F.col("c_tx_id").isNull()).drop(
        "c_tx_id", "c_commit_ts", "commit_lsn"
    )

    # TRUNCATE arrives framed by its own Begin/Commit in real WAL
    # (parser.go:150-170); the columnar trace carries it standalone with
    # its own commit semantics — stamp commit_lsn = its lsn.
    truncs = trace.filter(F.col("op") == "T").withColumn(
        "commit_lsn", F.col("lsn")
    )
    committed = committed.unionByName(truncs, allowMissingColumns=True)
    return committed, quarantined


def integrity_violations(trace: DataFrame) -> DataFrame:
    """Transactions violating Begin/Commit pairing — the ErrMessageLost
    condition (parser.go:54-67): data rows with no Begin, or Commit with
    no Begin. Returned as a small diagnostics frame for the metrics sink.
    """
    per_tx = (
        trace.filter(F.col("op").isin("B", "C", "I", "U", "D"))
        .groupBy("tx_id")
        .agg(
            F.max(F.when(F.col("op") == "B", 1).otherwise(0)).alias("has_begin"),
            F.max(F.when(F.col("op") == "C", 1).otherwise(0)).alias("has_commit"),
            F.sum(F.when(F.col("op").isin("I", "U", "D"), 1).otherwise(0)).alias(
                "n_changes"
            ),
        )
    )
    return per_tx.filter(
        ((F.col("n_changes") > 0) & ((F.col("has_begin") == 0) | (F.col("has_commit") == 0)))
        | ((F.col("has_commit") == 1) & (F.col("has_begin") == 0))
    )
