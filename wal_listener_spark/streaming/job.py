"""Structured Streaming replay job — the Process/Stream loop re-expressed.

Reference orchestration (``/root/reference/internal/listener/listener.go``):
``Process`` creates the publication, resumes the slot LSN, guards against
duplicate consumers, then ``Stream`` tails the socket and acks via standby
status. Spark mapping (SURVEY.md §2.1/§2.5):

 - slot resume          -> streaming checkpoint offsets (S3)
 - duplicate-consumer   -> checkpoint dir lock, one query per checkpoint (S4)
 - poll loop            -> micro-batch trigger: availableNow for bounded
                           replay, processingTime for tailing (S6)
 - publish-then-ack     -> foreachBatch: lake MERGE commit, then Spark
                           commits the epoch to the checkpoint (W2);
                           re-delivered epochs no-op (exactly-once)
 - heartbeat/probes     -> StreamingQueryListener progress events (W3/W6)

Transactions never straddle micro-batches in replay mode because
``write_trace``/``write_tx_aligned`` range-partition files on the
transaction's LSN slot; ``applyInPandasWithState`` is the documented
escalation for true unbounded tailing where a tx may cross a trigger
(SURVEY.md §7 hard part (b)).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..pipeline import replay_batch
from ..trace import spec
from ..trace.generator import TRACE_SCHEMA


def write_tx_aligned(trace_df, path: str, num_files: int) -> None:
    """Persist the trace range-partitioned on the tx LSN slot so every
    transaction lands in exactly one file (commit-aligned batches)."""
    tx_base = (F.col("lsn") - F.col("lsn") % spec.SLOT).alias("__tx_base")
    (
        trace_df.repartitionByRange(num_files, tx_base)
        .sortWithinPartitions("lsn")
        .write.mode("overwrite")
        .parquet(path)
    )


def run_replay_stream(
    spark: SparkSession,
    trace_dir: str,
    table_root: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    max_files_per_trigger: int | None = None,
    fail_at_batch: int | None = None,
    timeout_sec: int | None = None,
    metrics: "MetricsLog | None" = None,
) -> list[dict]:
    """Replay the trace directory into the lake table, exactly-once.

    ``max_files_per_trigger`` splits the replay into multiple epochs
    (default: one availableNow epoch). ``fail_at_batch`` injects a crash
    before that epoch's checkpoint commit — the kill/resume test hook.
    Returns per-epoch stats.

    ``metrics``: optional MetricsLog. Per-epoch counters are recorded on
    success; failures are metered as problematic_events_total by kind
    (listener.go:397-428 parity): ``ack`` when the snapshot commit threw
    (AckCommitError), ``publish`` for any other merge-path failure —
    then re-raised so the epoch is retried from the checkpoint.
    """
    cfg = cfg or PipelineConfig()
    stats: list[dict] = []

    # Seed the relation registry before streaming: pgoutput guarantees a
    # Relation message precedes first use *in stream order*, but a file
    # source lists epochs in no particular LSN order, so an early epoch
    # could otherwise see data rows for a not-yet-registered relation.
    # One pushed-down `op = 'R'` scan (R rows are a vanishing fraction of
    # the trace) restores the invariant — the analog of the reference
    # resuming a slot against an already-created publication
    # (listener.go:205-226).
    from ..lake.catalog import load_target
    from ..operators.registry import RelationRegistry

    table = load_target(spark, table_root)

    before = table.properties.get("registry") or []
    registry = RelationRegistry.from_json(before)
    rel_rows = (
        spark.read.schema(TRACE_SCHEMA).parquet(trace_dir).filter(F.col("op") == "R")
    )
    registry.update_from_trace(rel_rows)
    if registry.relations and registry.to_json() != before:
        table.properties["registry"] = registry.to_json()
        table.save_properties()

    def _apply(batch_df, batch_id: int) -> None:
        from ..lake.table import AckCommitError

        if fail_at_batch is not None and batch_id >= fail_at_batch:
            raise RuntimeError(f"injected crash at epoch {batch_id}")
        # use the micro-batch's cloned session so frames joined with
        # batch_df share one QueryExecutionListener bus (outer-session
        # frames deadlock Observation.get in the wide-mode merge)
        table = load_target(batch_df.sparkSession, table_root)
        key = f"epoch-{batch_id}"
        try:
            s = replay_batch(batch_df, table, cfg, batch_key=key)
        except AckCommitError as e:
            if metrics is not None:
                metrics.record_problem("ack", batch_key=key, error=str(e))
            raise
        except Exception as e:
            if metrics is not None:
                metrics.record_problem("publish", batch_key=key, error=str(e))
            raise
        stats.append(s)
        if metrics is not None:
            metrics.record_batch(s)

    reader = spark.readStream.schema(TRACE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(trace_dir)

    query = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(timeout_sec) if timeout_sec else query.awaitTermination()
    finally:
        if query.isActive:
            query.stop()
    return stats
