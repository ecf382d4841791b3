"""Skew handling: salted repartition / two-phase aggregation.

The trace has a deliberately hot repo (``org0/hot`` receives ~1/3 of all
keys — FIXTURES.md §6.7). Shuffles keyed on the *full* key (repo, path)
stay uniform, but anything grouped by repo alone (per-repo lineage,
per-repo metrics, per-repo routing) would send the hot repo to one task.
North_rule requires explicit salted repartitioning for these.

Pattern: salt = pmod(xxhash64(fine-grained col), S); first aggregate on
(group, salt) — map-side combines do most of the work — then re-aggregate
on (group). AQE's skew-join handling covers the join side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, entropy_cols: list[str], buckets: int = 32,
              salt_col: str = "__salt") -> DataFrame:
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in entropy_cols]), F.lit(buckets))
    )


def salted_repartition(
    df: DataFrame, group_cols: list[str], entropy_cols: list[str],
    buckets: int = 32, num_partitions: int | None = None,
) -> DataFrame:
    """Repartition on (group_cols + salt) so a hot group spreads over
    ``buckets`` tasks. Callers must re-combine per group afterwards."""
    df = with_salt(df, entropy_cols, buckets)
    cols = [F.col(c) for c in group_cols] + [F.col("__salt")]
    if num_partitions:
        return df.repartition(num_partitions, *cols)
    return df.repartition(*cols)


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    entropy_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs``: out_name -> (fn, col) with fn in {count, sum, min, max}.
    Phase 1 aggregates on (group, salt); phase 2 combines partials
    (count re-combines with sum). Result == plain groupBy().agg() but a
    hot group fans across ``buckets`` reducers first.
    """
    recombine = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    df = with_salt(df, entropy_cols, buckets)
    p1 = df.groupBy(*group_cols, "__salt").agg(
        *[getattr(F, fn)(c).alias(name) for name, (fn, c) in aggs.items()]
    )
    p2 = p1.groupBy(*group_cols).agg(
        *[
            getattr(F, recombine[fn])(name).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )
    return p2
