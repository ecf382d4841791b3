"""Pipeline configuration — the Spark analog of the reference's YAML
config (``/root/reference/internal/config/config.go:20-80``,
``config_example.yml``): listener filter (table -> actions), publisher
topic/prefix/topicsMap, plus Spark-side knobs (buckets, salt) the Go
daemon never needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PipelineConfig:
    #: table -> allowed actions (insert/update/delete/truncate);
    #: None = no filtering (config.go:74-77, README.md:59-77)
    filter_tables: dict[str, list[str]] | None = None
    #: routing (event.go:24-36)
    topic: str = "wal_listener"
    topic_prefix: str = ""
    topics_map: dict[str, str] = field(default_factory=dict)
    #: lake layout
    num_buckets: int = 32
    #: skew salt for per-repo aggregations
    salt_buckets: int = 32
    #: True (incremental epochs): stats pre-pass + touched-bucket-only
    #: merge. False (wide batches: full replay/backfill): single-job
    #: merge over all buckets, counters via observe — lower fixed
    #: latency per epoch (lake/table.py merge_batch docstring)
    selective_buckets: bool = True
    #: quarantine instead of fail-stop on integrity violations
    quarantine_uncommitted: bool = True

    def validate(self) -> None:
        """config.Validate() analog (config.go:82-93)."""
        if self.num_buckets <= 0:
            raise ValueError("num_buckets must be positive")
        valid = {"insert", "update", "delete", "truncate"}
        for t, acts in (self.filter_tables or {}).items():
            bad = {a.lower() for a in acts} - valid
            if bad:
                raise ValueError(f"invalid actions for table {t}: {sorted(bad)}")
