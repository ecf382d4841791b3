#!/usr/bin/env python
"""Dump .explain('formatted') for the round-6 optimization targets.

Usage: python plans/r06/dump_plans.py <suffix> [what ...]
Writes plans/r06/<what>_<suffix>.txt for each target. Plan capture is
weather-independent (no execution beyond tiny control actions), so this
runs any time; the bench numbers come from bench_extra.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import bench_extra  # noqa: E402
import bench  # noqa: E402

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix = sys.argv[1]
    what = set(sys.argv[2:])
    from pyspark.sql import functions as F

    from wal_listener_spark.operators import apply as apply_op
    from wal_listener_spark.operators.registry import RelationRegistry
    from wal_listener_spark.pipeline import stamp_table_names
    from wal_listener_spark.queries import _apply_pipeline
    from wal_listener_spark.queries_data import (
        q_ann_cosine_topk,
        q_dedup_minhash_lsh,
    )
    from wal_listener_spark.trace.generator import TRACE_SCHEMA

    spark = bench_extra._spark()
    trace_dir = bench_extra.gen_path("headline")
    tr = spark.read.schema(TRACE_SCHEMA).parquet(trace_dir)

    targets = {}

    def _add(name, fn):
        if not what or name in what:
            targets[name] = fn

    _add("lww_compaction", lambda: _apply_pipeline(tr))

    def _compact(pre_salt=None):
        reg = RelationRegistry().update_from_trace(tr)
        rel = stamp_table_names(
            tr.filter(F.col("op").isin("I", "U", "D", "T")), reg
        ).filter(F.col("rel_id") == 1)
        return apply_op.compact_agg(
            rel, reg.relations[1], num_buckets=max(bench.CPUS * 2, 32),
            pre_salt=pre_salt,
        )

    _add("compact_default", _compact)
    _add("compact_salted", lambda: _compact(pre_salt=16))
    _add("dedup_minhash_lsh", lambda: q_dedup_minhash_lsh(spark, bench.SF_DIR))
    _add("ann_cosine_topk", lambda: q_ann_cosine_topk(spark, bench.SF_DIR))

    if not what or "merge_write" in what:
        # full replay merge plan: captured via the executed write inside
        # replay_batch is awkward; instead capture the merge input join
        import tempfile

        from wal_listener_spark.config import PipelineConfig  # noqa: F401
        from wal_listener_spark.lake.table import LakeTable, _bucket_expr, BUCKET_COL, _merge_out_cols

        work = tempfile.mkdtemp(prefix="plandump_", dir="/dev/shm")
        tb = LakeTable.create(
            spark, os.path.join(work, "t"), ["repo", "path"],
            bench.FIELDS, num_buckets=max(bench.CPUS * 2, 32),
        )
        reg = RelationRegistry().update_from_trace(tr)
        rel = stamp_table_names(
            tr.filter(F.col("op").isin("I", "U", "D", "T")), reg
        ).filter(F.col("rel_id") == 1)
        chg = apply_op.compact_agg(
            rel, reg.relations[1], num_buckets=tb.num_buckets
        )
        target = tb.read([]).withColumn(
            BUCKET_COL, _bucket_expr(tb.key_cols, tb.num_buckets)
        ).repartition(tb.num_buckets, F.col(BUCKET_COL))
        t, c = target.alias("t"), chg.alias("c")
        cond = [F.col(f"t.{BUCKET_COL}") == F.col(f"c.{BUCKET_COL}")] + [
            F.col(f"t.{k}") == F.col(f"c.{k}") for k in tb.key_cols
        ]
        value_cols = [f for f in tb.field_names if f not in ("repo", "path")]
        targets["merge_write"] = lambda: t.join(c, cond, "full_outer").select(
            *_merge_out_cols(
                tb.key_cols, value_cols, set(chg.columns), value_cols
            )
        )

    for name, fn in targets.items():
        p = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(p, "w") as f:
            f.write(_fmt(fn()))
        print(f"wrote {p}")
    spark.stop()


if __name__ == "__main__":
    main()
