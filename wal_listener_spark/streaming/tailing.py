"""True-tailing mode: cross-batch transaction assembly with
``applyInPandasWithState``.

Bounded replay aligns micro-batches to commits (tx-aligned files). A
live tail cannot: a transaction's Begin may arrive in one trigger and
its Commit several triggers later. This module re-creates the
reference's WAL-accumulator semantics (buffer until CommitTime is set —
``/root/reference/internal/listener/transaction/wal.go:21-30,48-52``,
flush at ``listener.go:401-424``) as a keyed stateful operator:

    readStream -> groupBy(tx_id).applyInPandasWithState(buffer-or-release)
               -> foreachBatch(replay_batch)

State per tx_id: the JSON-serialized buffered rows. When the Commit
arrives, the whole transaction (Begin + changes + Commit) is released
downstream atomically, so ``replay_batch``'s integrity accounting and
merge see only complete transactions. Relation/Origin/Type/Truncate
rows (tx-less control messages in our columnar form) pass through
immediately.

State size is bounded by open transactions only (the reference holds
the same buffer in memory); Spark checkpoints the state store, so a
crash mid-transaction resumes with the buffer intact.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from ..config import PipelineConfig
from ..pipeline import replay_batch
from ..trace.generator import TRACE_SCHEMA

STATE_SCHEMA = T.StructType(
    [
        T.StructField("buffered", T.StringType(), True),
        T.StructField("committed", T.BooleanType(), True),
        T.StructField("commit_row", T.StringType(), True),
    ]
)

_JSON_COLS = [f.name for f in TRACE_SCHEMA.fields]


def _row_to_jsonable(row) -> dict:
    d = {}
    for c in _JSON_COLS:
        v = getattr(row, c)
        if c == "commit_ts" and v is not None and not pd.isna(v):
            v = v.isoformat()
        elif c == "commit_ts":
            v = None
        if isinstance(v, float) and pd.isna(v):
            v = None
        d[c] = v
    return d


def _assemble(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Buffer a transaction's rows until its Commit arrives, then release
    the complete transaction (the WAL.Clear() lifecycle).

    Robust to out-of-LSN-order delivery (a file source makes no ordering
    promise): once a tx commits, the state remembers it, and any
    late-arriving rows of that tx release immediately together with a
    copy of the Commit row (so downstream integrity accounting still
    sees a complete transaction in every batch)."""
    buffered: list[dict] = []
    committed = False
    commit_row: dict | None = None
    if state.exists:
        raw, committed, craw = state.get
        buffered = json.loads(raw) if raw else []
        committed = bool(committed)
        commit_row = json.loads(craw) if craw else None

    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            d = _row_to_jsonable(row)
            # map/array cells come back as numpy/dict types; normalize
            if d["new_vals"] is not None:
                d["new_vals"] = dict(d["new_vals"])
            if d["old_vals"] is not None:
                d["old_vals"] = dict(d["old_vals"])
            if d["toast_cols"] is not None:
                d["toast_cols"] = list(d["toast_cols"])
            if d["rel_columns"] is not None:
                d["rel_columns"] = [dict(c) for c in d["rel_columns"]]
            buffered.append(d)
            if d["op"] == "C":
                committed = True
                commit_row = d

    tx_less = key[0] is not None and key[0] < 0
    if committed or tx_less:
        release = list(buffered)
        # late release after an earlier commit: attach the Commit copy so
        # this batch still carries a complete transaction
        if commit_row is not None and not any(r["op"] == "C" for r in release):
            release.append(commit_row)
        out = pd.DataFrame(release, columns=_JSON_COLS)
        if not out.empty:
            out["commit_ts"] = pd.to_datetime(out["commit_ts"])
        if tx_less:
            state.remove()
        else:
            # keep the committed marker (empty buffer) for stragglers
            state.update((json.dumps([]), True, json.dumps(commit_row)))
        yield out
    else:
        state.update((json.dumps(buffered), False, None))
        yield pd.DataFrame(columns=_JSON_COLS)


def assemble_stream(trace_stream: DataFrame) -> DataFrame:
    """Stateful cross-batch tx assembly: only complete transactions (and
    tx-less control rows) flow downstream."""
    return trace_stream.groupBy("tx_id").applyInPandasWithState(
        _assemble,
        outputStructType=TRACE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def seed_registry(spark: SparkSession, trace_dir: str, table_root: str) -> None:
    """Pre-seed the relation registry (same rationale as
    run_replay_stream: file epochs arrive in no particular LSN order, so
    a data epoch may precede the Relation epoch; one pushed-down op='R'
    scan restores the pgoutput relation-before-first-use invariant)."""
    from ..lake.catalog import load_target
    from ..operators.registry import RelationRegistry

    table = load_target(spark, table_root)
    before = table.properties.get("registry") or []
    registry = RelationRegistry.from_json(before)
    registry.update_from_trace(
        spark.read.schema(TRACE_SCHEMA).parquet(trace_dir).filter(F.col("op") == "R")
    )
    if registry.relations and registry.to_json() != before:
        table.properties["registry"] = registry.to_json()
        table.save_properties()


def run_tailing_stream(
    spark: SparkSession,
    trace_dir: str,
    table_root: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    max_files_per_trigger: int | None = 1,
) -> list[dict]:
    """Tail a NON-tx-aligned trace directory: stateful assembly releases
    complete transactions into the same exactly-once merge."""
    cfg = cfg or PipelineConfig()
    stats: list[dict] = []

    seed_registry(spark, trace_dir, table_root)

    def _apply(batch_df, batch_id: int) -> None:
        from ..lake.catalog import load_target

        table = load_target(spark, table_root)
        s = replay_batch(batch_df, table, cfg, batch_key=f"tail-{batch_id}")
        stats.append(s)

    reader = spark.readStream.schema(TRACE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(trace_dir)
    released = assemble_stream(stream)
    query = (
        released.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        if query.isActive:
            query.stop()
    return stats
