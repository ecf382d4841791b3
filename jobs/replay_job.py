#!/usr/bin/env python
"""spark-submit entrypoint: CDC trace replay into the lake table.

Cluster usage (north_rule: ``spark-submit --py-files`` on a
multi-executor cluster)::

    zip -r engine.zip wal_listener_spark
    spark-submit --py-files engine.zip jobs/replay_job.py \
        --trace-dir s3://bucket/wal_trace \
        --table-root s3://bucket/lake/repos \
        --checkpoint s3://bucket/ckpt/repos \
        --num-buckets 4096 --max-files-per-trigger 64

Local smoke::

    python jobs/replay_job.py --trace-dir /tmp/trace \
        --table-root /tmp/lake --checkpoint /tmp/ckpt

The job is the ``main()`` analog of the reference daemon
(``cmd/wal-listener/main.go:19-100``): parse config -> bootstrap sink
(CREATE IF NOT EXISTS) -> start the stream -> metrics/probes.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trace-dir", required=True)
    p.add_argument("--table-root", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--num-buckets", type=int, default=32)
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--master", default=None)
    p.add_argument("--metrics-log", default=None)
    p.add_argument(
        "--multi-table",
        action="store_true",
        help="bootstrap a LakeCatalog (one table per relation) instead of "
        "the single flagship repos table",
    )
    p.add_argument(
        "--filter",
        default=None,
        help='JSON table->actions allow-list, e.g. \'{"repos": ["insert","update"]}\'',
    )
    p.add_argument(
        "--config",
        default=None,
        help="YAML config (reference config_example.yml layout) loaded "
        "with WAL_ env overrides; CLI flags take precedence",
    )
    return p.parse_args(argv)


def main(argv=None, stop_session: bool = True) -> int:
    """``stop_session=False`` when embedding into an existing session
    (getOrCreate reuses it; stopping would kill the caller's context)."""
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from wal_listener_spark.config import PipelineConfig
    from wal_listener_spark.lake.table import LakeTable
    from wal_listener_spark.metrics import MetricsLog
    from wal_listener_spark.session import get_spark
    from wal_listener_spark.streaming.job import run_replay_stream

    spark = get_spark(args.master, app_name="wal_listener_replay")
    if args.config:
        from wal_listener_spark.config import load_config

        cfg = load_config(args.config)
        if args.filter:
            cfg.filter_tables = json.loads(args.filter)
        if "--num-buckets" in (argv or sys.argv[1:]):
            cfg.num_buckets = args.num_buckets
    else:
        cfg = PipelineConfig(
            filter_tables=json.loads(args.filter) if args.filter else None,
            num_buckets=args.num_buckets,
        )
    cfg.validate()

    # S2 analog: idempotent sink bootstrap (repository.go:36-42); the
    # schema evolves from Relation messages once the stream runs
    if args.multi_table:
        from wal_listener_spark.lake.catalog import LakeCatalog

        LakeCatalog.create(spark, args.table_root, num_buckets=args.num_buckets)
    else:
        LakeTable.create(
            spark,
            args.table_root,
            key_cols=["repo", "path"],
            fields=[
                ("repo", "string"), ("path", "string"), ("commit", "string"),
                ("lang", "string"), ("content", "string"),
            ],
            num_buckets=args.num_buckets,
        )

    stats = run_replay_stream(
        spark,
        args.trace_dir,
        args.table_root,
        checkpoint_dir=args.checkpoint,
        cfg=cfg,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    if args.metrics_log:
        log = MetricsLog(args.metrics_log)
        for s in stats:
            log.record_batch(s)
    print(json.dumps({"epochs": len(stats), "noops": sum(1 for s in stats if s.get("noop"))}))
    if stop_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
