#!/usr/bin/env python
"""In-process A/B harness for replay-path variants (round-6 opts).

One warm session, interleaved variant reps, min/median per variant —
steady-state engine-work comparisons that survive host weather better
than cold-JVM walls. Usage:

  python plans/r06/ab_replay.py <trace_kind> <reps> <variant> [<variant>...]

Variants: base | snappy | zstd | window | salt16 | autosalt
(combine with '+', e.g. 'snappy+salt16').
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import bench  # noqa: E402
import bench_extra  # noqa: E402


def main() -> None:
    kind, reps = sys.argv[1], int(sys.argv[2])
    variants = sys.argv[3:]
    trace_dir = bench_extra.gen_path(kind) or kind

    from pyspark.sql import functions as F

    from wal_listener_spark.config import PipelineConfig
    from wal_listener_spark.lake.table import LakeTable
    from wal_listener_spark.pipeline import replay_batch
    from wal_listener_spark.trace.generator import TRACE_SCHEMA

    spark = bench_extra._spark()
    buckets = max(bench.CPUS * 2, 32)
    trace = spark.read.schema(TRACE_SCHEMA).parquet(trace_dir)
    work = tempfile.mkdtemp(prefix="ab_replay_", dir="/dev/shm")

    def run(variant: str, i: int) -> float:
        opts = set(variant.split("+"))
        env_compact = os.environ.pop("WAL_COMPACT", None)
        if "window" in opts:
            os.environ["WAL_COMPACT"] = "window"
        codec = None
        if "snappy" in opts:
            codec = "snappy"
        elif "zstd" in opts:
            codec = "zstd"
        prev_codec = spark.conf.get("spark.sql.parquet.compression.codec")
        if codec:
            spark.conf.set("spark.sql.parquet.compression.codec", codec)
        pre_salt = 16 if "salt16" in opts else None
        import shutil

        root = os.path.join(work, f"{variant.replace('+','_')}_{i}")
        shutil.rmtree(root, ignore_errors=True)
        table = LakeTable.create(
            spark, root, ["repo", "path"], bench.FIELDS, num_buckets=buckets
        )
        spark.sparkContext.setJobDescription(f"ab {variant} rep{i}")
        t0 = time.time()
        replay_batch(
            trace, table,
            PipelineConfig(
                num_buckets=buckets, selective_buckets=False,
                compact_pre_salt=pre_salt,
            ),
            f"ab-{variant}-{i}",
        )
        dt = time.time() - t0
        shutil.rmtree(root, ignore_errors=True)
        if codec:
            spark.conf.set("spark.sql.parquet.compression.codec", prev_codec)
        if env_compact is not None:
            os.environ["WAL_COMPACT"] = env_compact
        else:
            os.environ.pop("WAL_COMPACT", None)
        return round(dt, 3)

    # warmup: one run of the first variant (untimed)
    run(variants[0], -1)
    walls: dict[str, list[float]] = {v: [] for v in variants}
    for i in range(reps):
        for v in variants:
            walls[v].append(run(v, i))
    out = {
        v: {"runs": w, "min": min(w), "med": sorted(w)[len(w) // 2]}
        for v, w in walls.items()
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
