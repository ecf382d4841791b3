#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py is FROZEN for the
driver; this file holds the noop-sink isolation runs, phase timings and
plan dumps cited in OPTIMIZATION_r06.md — guide §1.4/§1.5).

Subcommands:
  gen <kind>            build+cache a trace via bench.py's content-
                        addressed cache (kinds: headline, hot, multi,
                        scale, tail) — shares the cache the real bench
                        will hit, so fixture time is paid once.
  replay <kind> <cpus> [reps] [pre_salt] [mode]
                        cold-JVM replay reps through bench.py's own
                        --replay subcommand; prints its JSON line.
  lww [reps]            time queries._apply_pipeline over the headline
                        trace to a noop sink (the lww_compaction shape
                        without the parquet write).
  explain <what> <out>  dump .explain formatted plans (compact, lww,
                        merge) to a file.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (reuse the frozen harness's cache + spark)

KINDS = {
    # kind -> (cache key kind, build params)
    "headline": dict(amplify=bench.AMPLIFY, files=max(bench.CPUS * 2, 16)),
    "scale": dict(amplify=bench.SCALE_AMPLIFY, files=max(bench.CPUS * 3, 24)),
}


def _spark(cpus=None):
    return bench._mk_spark(cpus or bench.CPUS, "bench_extra")


def gen(kind: str) -> str:
    from pyspark.sql import functions as F

    from wal_listener_spark.streaming.job import write_tx_aligned
    from wal_listener_spark.trace import generator

    spark = _spark()
    if kind in ("headline", "scale"):
        p = KINDS[kind]

        def _build(sp, d):
            tr = generator.build_trace(sp, bench.SF_DIR, amplify=p["amplify"])
            write_tx_aligned(tr, d, num_files=p["files"])

        d = bench._cached_trace(spark, kind, _build, **p)
    elif kind == "hot":
        half_amp = max(bench.AMPLIFY // 2, 1)
        # total must match what bench passes: out.get("events") from the
        # headline section — reproduce it by counting the headline trace
        head = gen_path("headline")
        total = None
        if head:
            total = (
                spark.read.parquet(head)
                .filter(F.col("op").isin("I", "U", "D", "T"))
                .count()
            )

        def _build_hot(sp, d):
            half = generator.build_trace(sp, bench.SF_DIR, amplify=half_amp)
            n_half = half.filter(
                F.col("op").isin("I", "U", "D", "T")
            ).count()
            hot_updates = max((total or n_half * 2) - n_half, 1)
            hot_trace = generator.build_trace(
                sp, bench.SF_DIR, amplify=half_amp, hot_updates=hot_updates
            )
            write_tx_aligned(hot_trace, d, num_files=max(bench.CPUS * 2, 16))

        d = bench._cached_trace(spark, "hot", _build_hot, half_amp=half_amp,
                                total=total)
    elif kind == "multi":
        n_rel = 16

        def _build_multi(sp, d):
            nk = generator.num_keys(sp, bench.SF_DIR, bench.AMPLIFY)
            tr = generator.build_trace(
                sp, bench.SF_DIR, amplify=bench.AMPLIFY, k_evo=nk
            )
            write_tx_aligned(
                generator.reshard_relations(tr, n_rel), d,
                num_files=max(bench.CPUS * 2, 16),
            )

        d = bench._cached_trace(spark, "multi", _build_multi,
                                amplify=bench.AMPLIFY, n_rel=n_rel,
                                evo="none")
    elif kind == "tail":
        def _build_tail(sp, d):
            tr = generator.build_trace(
                sp, bench.SF_DIR, amplify=bench.DECODE_AMPLIFY * 2
            )
            generator.write_trace(tr, d, num_files=8)

        d = bench._cached_trace(spark, "tail", _build_tail,
                                amplify=bench.DECODE_AMPLIFY * 2, files=8)
    else:
        raise SystemExit(f"unknown kind {kind}")
    print(d)
    spark.stop()
    return d


def gen_path(kind: str) -> str | None:
    """Cache path for an already-generated kind (None if absent)."""
    if kind == "hot":
        # sig depends on a counted total — find the cached dir by prefix
        import glob

        for d in sorted(glob.glob(os.path.join(bench.TRACE_CACHE, "hot-*"))):
            if os.path.exists(os.path.join(d, "_COMPLETE")):
                return d
        return None
    if kind in ("headline", "scale"):
        sig = bench._gen_sig(kind, **KINDS[kind])
    elif kind == "multi":
        sig = bench._gen_sig("multi", amplify=bench.AMPLIFY, n_rel=16,
                             evo="none")
    elif kind == "tail":
        sig = bench._gen_sig("tail", amplify=bench.DECODE_AMPLIFY * 2,
                             files=8)
    else:
        return None
    d = os.path.join(bench.TRACE_CACHE, f"{kind}-{sig}")
    return d if os.path.exists(os.path.join(d, "_COMPLETE")) else None


def replay(kind_or_dir: str, cpus: int, reps: int = 2, pre_salt: int = 0,
           mode: str = "table") -> None:
    trace_dir = (
        kind_or_dir if os.path.isdir(kind_or_dir) else gen_path(kind_or_dir)
    )
    if trace_dir is None:
        raise SystemExit(f"trace {kind_or_dir} not generated — run gen first")
    env = dict(os.environ)
    env.setdefault("BENCH_DEADLINE", str(time.time() + 3600))
    env["BENCH_REPS"] = str(reps)
    env.setdefault("BENCH_QUIET_WAIT", "10")
    env.setdefault("BENCH_POLLUTED_EXTRA", "0")
    buckets = max(bench.CPUS * 2, 32)
    out = subprocess.run(
        [sys.executable, os.path.abspath(bench.__file__), "--replay",
         trace_dir, str(cpus), str(buckets), str(pre_salt), mode],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    sys.stderr.write(out.stderr[-4000:])
    print(out.stdout.strip().splitlines()[-1] if out.stdout.strip() else
          json.dumps({"rc": out.returncode}))


def lww(reps: int = 2) -> None:
    from wal_listener_spark.queries import _apply_pipeline

    trace_dir = gen_path("headline")
    spark = _spark()
    walls = []
    for _ in range(reps):
        t0 = time.time()
        spark.sparkContext.setJobDescription("lww_compaction noop")
        _apply_pipeline(spark.read.parquet(trace_dir)).write.format(
            "noop"
        ).mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
    print(json.dumps({"lww_noop_walls": walls}))
    spark.stop()


def encode_profile(reps: int = 2) -> None:
    """Isolate the framed_encode_write section's pieces: trace gen
    (materialize to noop), the mapInPandas encode (noop), and the full
    bench shape (encode + repartition + parquet write)."""
    import tempfile

    from wal_listener_spark.trace import framed, generator

    spark = _spark()
    work = tempfile.mkdtemp(prefix="encprof_", dir="/dev/shm")
    small = generator.build_trace(spark, SF_DIR_ENV(), amplify=bench.DECODE_AMPLIFY)
    out = {}

    def t(label, fn):
        walls = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 2))
        out[label] = walls

    t("gen_noop", lambda: small.write.format("noop").mode("overwrite").save())
    t("encode_noop", lambda: framed.frames_from_columnar(small)
      .write.format("noop").mode("overwrite").save())
    t("bench_shape", lambda: framed.frames_from_columnar(small)
      .repartition(bench.CPUS * 2).write.mode("overwrite")
      .parquet(os.path.join(work, "frames")))
    print(json.dumps(out))
    spark.stop()


def SF_DIR_ENV() -> str:
    return bench.SF_DIR


def main() -> None:
    cmd = sys.argv[1]
    if cmd == "gen":
        gen(sys.argv[2])
    elif cmd == "encode":
        encode_profile(int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    elif cmd == "replay":
        replay(sys.argv[2], int(sys.argv[3]),
               int(sys.argv[4]) if len(sys.argv) > 4 else 2,
               int(sys.argv[5]) if len(sys.argv) > 5 else 0,
               sys.argv[6] if len(sys.argv) > 6 else "table")
    elif cmd == "lww":
        lww(int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    else:
        raise SystemExit(f"unknown subcommand {cmd}")


if __name__ == "__main__":
    main()
