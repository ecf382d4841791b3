"""Observability: the reference's Prometheus surface re-expressed.

wal-listener exports ``published_events_total{subject,table}``,
``filter_skipped_events_total{table}`` and
``problematic_events_total{kind}`` (``internal/config/metrics.go:21-59``)
plus /healthz & /ready probes (``listener.go:107-190``).

Spark-first mapping:
 - per-batch counters come from ``observe()`` metrics and merge stats
   (zero extra jobs) and are appended to a metrics log (JSONL — cheap,
   append-only, greppable; a parquet metrics table would be the
   cluster-scale variant);
 - liveness/progress comes from a ``StreamingQueryListener`` which also
   records per-epoch offsets — the per-partition lineage the north_rule
   requires lives in the lake manifest (``lineage`` entries with
   per-bucket rewrites) and here at epoch grain.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class MetricsLog:
    """Append-only JSONL metrics sink (one line per batch/table)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def record(self, kind: str, payload: dict[str, Any]) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps({"kind": kind, **payload}) + "\n")

    def record_problem(
        self,
        kind: str,
        batch_key: str | None = None,
        n: int = 1,
        error: str | None = None,
        reason: str | None = None,
    ) -> None:
        """problematic_events_total{kind} parity (metrics.go:21-59).
        Kinds mirror the reference's listener loop (listener.go:397-428):
        ``parse`` (undecodable/integrity-violating input), ``publish``
        (the merge — our publish — failed), ``ack`` (the snapshot commit
        — our standby-status ack — failed). The metric name rides the
        envelope ``kind``; the label lives under ``problem_kind``."""
        payload: dict[str, Any] = {"problem_kind": kind, "n": n}
        if batch_key is not None:
            payload["batch_key"] = batch_key
        if error is not None:
            payload["error"] = error[:500]
        if reason is not None:
            payload["reason"] = reason
        self.record("problematic_events_total", payload)

    def problem_counts(self) -> dict[str, int]:
        """Aggregated problematic_events_total by problem kind."""
        out: dict[str, int] = {}
        for e in self.read_all():
            if e.get("kind") != "problematic_events_total":
                continue
            k = e.get("problem_kind", "unknown")
            out[k] = out.get(k, 0) + int(e.get("n", 1))
        return out

    def record_batch(self, stats: dict) -> None:
        """Flatten replay_batch stats into counter entries mirroring the
        reference metric names."""
        base = {"batch_key": stats.get("batch_key")}
        if stats.get("quarantined"):
            self.record_problem(
                "parse",
                batch_key=stats.get("batch_key"),
                n=stats["quarantined"],
                reason="uncommitted_tx",
            )
        fm = stats.get("filter_metrics") or {}
        if fm.get("filter_skipped_events"):
            self.record(
                "filter_skipped_events_total",
                {**base, "n": fm["filter_skipped_events"]},
            )
        for table, m in (stats.get("tables") or {}).items():
            if m.get("noop"):
                continue
            self.record(
                "published_events_total",
                {
                    **base,
                    "table": table,
                    "upserts": m.get("upserts"),
                    "deletes": m.get("deletes"),
                    "high_lsn": m.get("high_lsn"),
                    "snapshot_version": m.get("snapshot_version"),
                    "buckets_rewritten": len(m.get("buckets_rewritten") or []),
                },
            )

    def read_all(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


class ProgressListener(StreamingQueryListener):
    """W3/W6 analog: heartbeat + readiness via query-progress events."""

    def __init__(self, log: MetricsLog):
        self.log = log
        self.alive = False

    def onQueryStarted(self, event) -> None:
        self.alive = True
        self.log.record("query_started", {"id": str(event.id)})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.log.record(
            "query_progress",
            {
                "id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
            },
        )

    def onQueryTerminated(self, event) -> None:
        self.alive = False
        self.log.record(
            "query_terminated",
            {"id": str(event.id), "exception": str(event.exception)},
        )

    def onQueryIdle(self, event) -> None:
        pass
