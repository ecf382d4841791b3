"""End-to-end replay pipeline: trace micro-batch -> lake MERGE.

One function per SURVEY.md §3.2 stage, and ``replay_batch`` composing
them — used identically by bounded batch replay, the Structured
Streaming ``foreachBatch`` sink, and the driver-facing queries.

Stage order mirrors the reference hot path ``processMessage``
(``/root/reference/internal/listener/listener.go:388-436``):
parse -> tx flush on commit -> filter -> event assembly -> publish ->
ack. Our publish is the lake MERGE; our ack is the snapshot commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import PipelineConfig
from .lake.table import LakeTable
from .operators import apply as apply_op
from .operators.assemble import assemble_transactions
from .operators.filters import allowlist_filter
from .operators.registry import RelationRegistry, RelationSchema, typed_changes


def stamp_table_names(df: DataFrame, registry: RelationRegistry) -> DataFrame:
    """Data rows carry only rel_id; resolve schema/table from the
    registry (broadcast-sized driver map folded into a CASE expression —
    the T1 registry lookup, wal.go:70-76)."""
    sch = F.lit(None).cast("string")
    tbl = F.lit(None).cast("string")
    for rel_id, s in registry.relations.items():
        sch = F.when(F.col("rel_id") == rel_id, F.lit(s.schema_name)).otherwise(sch)
        tbl = F.when(F.col("rel_id") == rel_id, F.lit(s.table_name)).otherwise(tbl)
    return df.withColumn("schema_name", sch).withColumn("table_name", tbl)


def compact_for_merge(
    typed: DataFrame, schema: RelationSchema
) -> tuple[DataFrame, int | None]:
    """Batch-local LWW compaction keeping delete markers (the merge
    needs them to delete target rows), plus the truncate barrier."""
    t_lsn = apply_op.truncate_barrier_lsn(typed)
    data = typed.filter(F.col("op").isin("I", "U", "D"))
    compacted = apply_op.last_write_wins(
        data,
        key_cols=schema.key_columns,
        value_cols=schema.value_columns,
        toastable_cols=schema.value_columns,
    )
    if t_lsn is not None:
        # keys fully before the barrier are wiped by the merge's
        # truncate handling; their change rows must not resurrect them
        compacted = compacted.filter(
            (F.col("lsn") > F.lit(t_lsn)) | (F.col("op") == "D")
        )
    return compacted, t_lsn


def replay_batch(
    trace: DataFrame,
    table: LakeTable,
    cfg: PipelineConfig,
    batch_key: str,
) -> dict:
    """Apply one micro-batch of trace rows to the lake table.

    Exactly-once: (1) replayed epochs no-op on batch_key (the reference's
    LSN-ack analog, listener.go:426); (2) the merge's per-key
    lsn-monotonic guard (tombstoned deletes, truncate watermark) absorbs
    overlapping or out-of-order LSN ranges — micro-batches may arrive in
    any order (file listing makes no ordering promise) and the state
    still converges to the sequential result.
    """
    # P4: fold Relation rows into the registry; evolve the lake schema
    registry = RelationRegistry.from_json(table.properties.get("registry"))
    registry.update_from_trace(trace)
    if not registry.relations:
        return {"batch_key": batch_key, "noop": True, "reason": "no_relations"}

    high_row = trace.agg(F.max("lsn").alias("h")).collect()[0]
    if high_row["h"] is None:
        # registry-only batch: persist what we learned, no data to merge
        table.properties["registry"] = registry.to_json()
        table.save_properties()
        return {"batch_key": batch_key, "noop": True, "reason": "no_rows"}
    high_lsn = high_row["h"]

    # P1/P2/T5: transaction assembly (commit stamping + quarantine)
    committed, quarantined = assemble_transactions(trace)
    n_quarantined = quarantined.count() if cfg.quarantine_uncommitted else 0

    committed = stamp_table_names(committed, registry)

    # T3: allow-list filter
    filtered, obs = allowlist_filter(committed, cfg.filter_tables)

    stats: dict = {
        "batch_key": batch_key,
        "noop": False,
        "quarantined": n_quarantined,
        "tables": {},
    }

    # one merge per relation (T7 multi-table routing)
    for rel_id, schema in sorted(registry.relations.items()):
        table.ensure_columns(schema.spark_fields())
        rel_rows = filtered.filter(F.col("rel_id") == rel_id)
        typed = typed_changes(rel_rows, schema)
        compacted, t_lsn = compact_for_merge(typed, schema)
        merge_input = compacted.select(
            *schema.key_columns, *schema.value_columns, "lsn", "op"
        )
        mstats = table.merge_batch(
            merge_input,
            batch_key=f"{batch_key}:{schema.qualified_name}",
            high_lsn=high_lsn,
            truncate_lsn=t_lsn,
            coalesce_cols=schema.value_columns,
            registry_json=registry.to_json(),
        )
        stats["tables"][schema.qualified_name] = mstats

    if stats["tables"] and all(m.get("noop") for m in stats["tables"].values()):
        stats["noop"] = True

    if obs is not None:
        try:
            stats["filter_metrics"] = obs.get
        except Exception:
            pass
    return stats
