"""Last-write-wins apply: per-key compaction with TOAST carry-forward,
delete and truncate semantics.

The reference never needs this operator — single-threaded consumption
gives it total order for free (``listener.go:364-386``). Once the stream
is a partitioned DataFrame, ordering matters only *within* a key
(cross-key order is unobservable in final state — same argument the
reference relies on for per-table topics, SURVEY.md §2.6). So:

 - per (repo, path) window ordered by (lsn, seq): TOAST 'u' columns take
   the last explicitly-sent value (carry-forward), the winning row is
   row_number()==1 descending — one shuffle on the full key, uniform
   under hot-*repo* skew because the hash includes path.
 - final DELETE drops the key (wal.go kind delete).
 - TRUNCATE is an LSN barrier: keys whose last change precedes the
   truncate are dropped (parser.go:212-225 fans truncate out per
   relation; valid WAL never interleaves a key across the barrier).

The struct-wrapping trick below distinguishes "TOAST-unchanged" (skip in
carry-forward) from an explicit SQL NULL (real value that must overwrite):
explicit NULL is a non-null struct with a null field, TOAST is a null
struct, and ``last(ignorenulls=True)`` skips only the latter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def last_write_wins(
    changes: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    toastable_cols: list[str] | None = None,
    lsn_col: str = "lsn",
    seq_col: str = "seq",
    emit_set_markers: bool = False,
    extra_partition_cols: list[str] | None = None,
) -> DataFrame:
    """Compact a change set to one final row per key.

    Input rows: op in (I,U,D) with typed columns + ``toast_cols`` array.
    Output: surviving rows (op != D at the end), one per key, with
    ``lsn``/``seq``/``commit_ts`` of the winning change.

    ``emit_set_markers``: additionally emit ``__set_<col>`` booleans —
    True iff some row in the batch *explicitly set* the column (a 't' or
    'n' cell; TOAST 'u' does not set). The cross-epoch MERGE needs the
    marker to tell an explicit UPDATE-to-NULL apart from TOAST-unchanged
    (both surface as NULL in the compacted value).
    """
    toastable = toastable_cols if toastable_cols is not None else value_cols
    # extra_partition_cols: functionally key-dependent columns (e.g. the
    # lake bucket) prepended to the window partitioning — groups are
    # identical, but an input already hash-partitioned on the extra
    # column alone then satisfies the window's clustered distribution
    # (subset rule), so the window runs without its own exchange
    part_cols = list(extra_partition_cols or []) + list(key_cols)
    w_fwd = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(lsn_col).asc(), F.col(seq_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = changes
    has_toast_info = "toast_cols" in df.columns
    for c in value_cols:
        cell = F.struct(F.col(lsn_col).alias("l"), F.col(c).alias("v"))
        if c in toastable and has_toast_info:
            wrapped = F.when(
                F.array_contains(F.col("toast_cols"), c) | (F.col("op") == "D"),
                F.lit(None),
            ).otherwise(cell)
        else:
            wrapped = F.when(F.col("op") == "D", F.lit(None)).otherwise(cell)
        carried = F.last(wrapped, ignorenulls=True).over(w_fwd)
        if emit_set_markers:
            # markers first: the value overwrite below must not shadow
            # the original column the wrapped expression reads
            df = df.withColumn(f"__set_{c}", carried.isNotNull())
            df = df.withColumn(f"__setlsn_{c}", carried.getField("l"))
        df = df.withColumn(c, carried.getField("v"))

    w_last = Window.partitionBy(*part_cols).orderBy(
        F.col(lsn_col).desc(), F.col(seq_col).desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w_last))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _part_spec(extra: list, num_buckets: int, num_partitions: int | None):
    """Arguments for the single payload-shuffle ``repartition``: bucket
    alone for the single-relation path, (extra..., bucket) at the
    caller's width for the multi-relation fan-in."""
    from ..lake.table import BUCKET_COL

    cols = [F.col(c) for c in extra] + [F.col(BUCKET_COL)]
    return (num_partitions or num_buckets, *cols)


def compact_agg(
    raw: DataFrame,
    schema,
    num_buckets: int | None = None,
    pre_salt: int | None = None,
    extra_group_cols: list[str] | None = None,
    num_partitions: int | None = None,
    storm_txs: list[int] | None = None,
) -> DataFrame:
    """Aggregation-based LWW compaction — the scale path.

    Equivalent to ``last_write_wins`` + typed projection, but built on
    hash aggregation instead of a window sort:

    ONE groupBy (repo, path) with map-side partial aggregation picks, per
    key, the winning (lsn, seq, op) AND, per column, the payload of the
    last row that *explicitly set* it: ``max(when(set, struct(lsn, seq,
    value)))`` — the struct max orders by (lsn, seq) and carries the
    value along, so TOAST carry-forward needs neither a sort nor a
    fetch join (TOAST 'u' cells and deletes don't "set"; max needs no
    ordering guarantee because lsn is per-key monotone).

    On a 10^10-event replay the partial agg collapses each key's version
    chain inside the map task, so the shuffle carries ~one row per key,
    not one per version. Output: typed key+value columns, lsn, op —
    identical contract to the window path (verified by the oracle tests).

    With ``num_buckets`` set, the frame is repartitioned ONCE on the lake
    bucket (pmod(xxhash64(keys), B)) and every downstream step — the
    winner aggregation, the payload fetch join, and the lake MERGE join —
    runs inside those same partitions (grouping/join keys include
    ``__bucket``, and hash-partitioning on the bucket satisfies their
    clustered distribution). One payload shuffle for the entire apply:
    the storage-partitioned-join layout Iceberg bucketed tables use.

    ``extra_group_cols``: additional grouping columns carried from the
    input and emitted first in the output — the multi-relation fan-in
    path compacts EVERY same-schema relation in one pass by grouping on
    ``(rel_id, bucket, keys)``, so a 100-table catalog pays one payload
    shuffle total instead of one full input scan + shuffle per table.
    With extra cols the single exchange partitions on ``(extra, bucket)``
    at ``num_partitions`` width (callers pass ~tables x buckets): a
    16-table catalog with 16-bucket tables would otherwise run its whole
    shared compaction/merge/write at 16-way parallelism — per-TABLE
    granularity — leaving half a 32-core stage idle and quadrupling the
    per-task sort footprint.
    """
    from ..functions import casts
    from ..lake.table import BUCKET_COL, _bucket_expr

    data = raw.filter(F.col("op").isin("I", "U", "D"))
    key_cols = schema.key_columns
    value_cols = schema.value_columns

    aggs = [
        F.max(F.struct(F.col("lsn"), F.col("seq"), F.col("op"))).alias("win")
    ]
    for c in value_cols:
        aggs.append(
            F.max(
                F.when(
                    F.col(f"__s_{c}"),
                    F.struct(
                        F.col("lsn"),
                        F.col("seq"),
                        F.col(f"__v_{c}").alias("v"),
                    ),
                )
            ).alias(f"__last_{c}")
        )

    # key OID casts happen BEFORE the bucket hash: the merge recomputes
    # target buckets from the *typed* stored columns, so hashing the raw
    # text here would desync the prebucketed join for non-text key OIDs
    # (int keys, case-normalized uuid) and silently duplicate keys.
    keys = [
        casts.cast_text_value(
            F.coalesce(F.col("new_vals").getItem(k), F.col("old_vals").getItem(k)),
            schema.oid_of(k),
        ).alias(k)
        for k in key_cols
    ]
    # project the per-column cell BEFORE the exchange (guide §2.3): the
    # raw map duplicates the key columns and repeats every column NAME
    # per row, so shuffling it ships ~100 B/row the aggregation never
    # needs. One flat value + one set-flag per column is the narrowest
    # exact representation. A column is SET when the tuple carried a
    # cell for it — explicit NULL ('n') is present in the map with a
    # null value, TOAST ('u') is absent + listed in toast_cols
    # (parser.go:325-344 semantics); the boolean keeps explicit NULL
    # distinguishable.
    cell_cols = []
    for c in value_cols:
        is_set = (
            F.col("op").isin("I", "U")
            & F.map_contains_key(F.col("new_vals"), c)
            & ~F.array_contains(
                F.coalesce(F.col("toast_cols"), F.array().cast("array<string>")), c
            )
        )
        cell_cols.append(F.coalesce(is_set, F.lit(False)).alias(f"__s_{c}"))
        cell_cols.append(F.col("new_vals").getItem(c).alias(f"__v_{c}"))
    extra = list(extra_group_cols or [])
    base = data.select(
        *[F.col(c) for c in extra],
        *keys, F.col("lsn"), F.col("seq"), F.col("op"),
        *cell_cols,
        *([F.col("tx_id")] if storm_txs else []),
    )
    group_cols = extra + list(key_cols)
    if num_buckets is not None:
        base = base.withColumn(BUCKET_COL, _bucket_expr(key_cols, num_buckets))
        group_cols = extra + [BUCKET_COL, *key_cols]

    if storm_txs:
        # Named update-storm transactions (census-detected, guide §2.5
        # "special-case the hot keys"): pre-aggregate ONLY the storm
        # rows with their own groupBy — the map-side partial agg
        # collapses each storm key to ~one row per scan task, so that
        # exchange carries a handful of rows — then project every other
        # row into the same partial shape (win + per-column candidate
        # structs, a pure projection) and re-aggregate the union inside
        # the bucket repartition. Exactly one full-size exchange, like
        # the storm-free plan, where the salted two-phase alternative
        # (pre_salt) pays TWO full-size exchanges and two sorts for the
        # uniform rows riding along (measured on the 4.2M-event hot
        # trace: 14-15.5 s salted vs ~6 s for this shape). Re-maxing
        # partial maxes is exact (struct max is associative).
        is_storm = F.col("tx_id").isin([int(t) for t in storm_txs])
        hot_partial = (
            base.filter(is_storm).groupBy(*group_cols).agg(*aggs)
        )
        rest_partial = base.filter(~is_storm).select(
            *[F.col(c) for c in group_cols],
            F.struct(F.col("lsn"), F.col("seq"), F.col("op")).alias("win"),
            *[
                F.when(
                    F.col(f"__s_{c}"),
                    F.struct(
                        F.col("lsn"), F.col("seq"),
                        F.col(f"__v_{c}").alias("v"),
                    ),
                ).alias(f"__last_{c}")
                for c in value_cols
            ],
        )
        p = rest_partial.unionByName(hot_partial)
        reagg = [F.max("win").alias("win")] + [
            F.max(f"__last_{c}").alias(f"__last_{c}") for c in value_cols
        ]
        if num_buckets is not None:
            p = p.repartition(*_part_spec(extra, num_buckets, num_partitions))
        agged = p.groupBy(*group_cols).agg(*reagg)
    elif pre_salt:
        # Hot-(repo,path) update-storm guard. The default single-exchange
        # plan repartitions on the bucket BEFORE aggregating, so a key
        # with a 10^6-version chain sends every version to ONE reducer
        # (AQE skew handling covers joins, not aggregates). Two-phase
        # instead: phase 1 groups on (keys, salt(lsn)) — the groupBy's
        # own exchange gets map-side partial aggregation, and the salt
        # spreads any one key across pre_salt reducers; phase 2 re-maxes
        # the per-salt winners inside the bucket repartition. Every agg
        # here is a struct max, so re-aggregation is exact. The extra
        # exchange carries <= pre_salt rows per key (compacted), which is
        # why this is a knob and not the default: on storm-free batches
        # it duplicates exchange volume for no benefit.
        salted = base.withColumn(
            "__salt", F.pmod(F.hash(F.col("lsn")), F.lit(pre_salt))
        )
        p1 = salted.groupBy(*group_cols, "__salt").agg(*aggs).drop("__salt")
        reagg = [F.max("win").alias("win")] + [
            F.max(f"__last_{c}").alias(f"__last_{c}") for c in value_cols
        ]
        if num_buckets is not None:
            p1 = p1.repartition(*_part_spec(extra, num_buckets, num_partitions))
        agged = p1.groupBy(*group_cols).agg(*reagg)
    else:
        if num_buckets is not None:
            base = base.repartition(*_part_spec(extra, num_buckets, num_partitions))
        agged = base.groupBy(*group_cols).agg(*aggs)

    out_cols = [F.col(c) for c in extra]
    if num_buckets is not None:
        out_cols.append(F.col(BUCKET_COL))
    for k in key_cols:
        out_cols.append(F.col(k))
    for c in value_cols:
        out_cols.append(
            casts.cast_text_value(
                F.col(f"__last_{c}").getField("v"), schema.oid_of(c)
            ).alias(c)
        )
    for c in value_cols:
        # per-column 'was explicitly set' marker + the LSN of the setting
        # row: the merge gates its TOAST coalesce on the marker (so an
        # explicit UPDATE-to-NULL is not resurrected from the target) and
        # uses the set-LSN for column-level LWW across out-of-order
        # epochs (a TOASTed column in a newer row must not discard an
        # older epoch's explicit value that arrives later)
        out_cols.append(F.col(f"__last_{c}").isNotNull().alias(f"__set_{c}"))
        out_cols.append(
            F.col(f"__last_{c}").getField("lsn").alias(f"__setlsn_{c}")
        )
    out_cols.append(F.col("win.lsn").alias("lsn"))
    out_cols.append(F.col("win.seq").alias("seq"))
    out_cols.append(F.col("win.op").alias("op"))
    return agged.select(*out_cols)


def truncate_barrier_lsn(changes: DataFrame) -> int | None:
    """Highest TRUNCATE lsn in the change set (None if no truncate)."""
    row = changes.filter(F.col("op") == "T").agg(F.max("lsn").alias("l")).collect()[0]
    return row["l"]


def final_state(
    changes: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    toastable_cols: list[str] | None = None,
) -> DataFrame:
    """Full batch-local apply: truncate barrier -> LWW -> drop deletes.

    Aggregation-based since round 6: the window form (two sorts + six
    window passes per batch) cost 27 s on the 4.2M-event bench where the
    equivalent single-pass aggregation costs ~5 s (guide §1.2: fix the
    distributed algorithm first). Semantics are byte-identical to
    ``last_write_wins`` + drops (oracle-gated by cdc_lww_compaction /
    cdc_truncate / cdc_filter_allowlist / cdc_replay_overlap_dedup):

    - winner = max (lsn, seq) row; its op decides survival, its
      non-value columns ride the same struct max;
    - per value column, the last row that *set* it (TOAST 'u' and
      deletes don't set; explicit NULL does) supplies the value —
      ``max(when(set, struct(lsn, seq, v)))`` is exactly the window
      path's ``last(wrapped, ignorenulls)`` at the winning row, because
      row order and (lsn, seq) order coincide.
    """
    t_lsn = truncate_barrier_lsn(changes)
    data = changes.filter(F.col("op").isin("I", "U", "D"))
    toastable = set(toastable_cols if toastable_cols is not None else value_cols)
    has_toast = "toast_cols" in data.columns
    in_cols = list(data.columns)
    drop = {"toast_cols", "op", "tx_id"}
    # non-key, non-value columns (lsn, seq, commit_ts, ...) come from
    # the winning row, exactly as the window path's surviving row does
    carry = [
        c for c in in_cols
        if c not in key_cols and c not in value_cols and c not in drop
    ]
    aggs = [
        F.max(
            F.struct(
                F.col("lsn"), F.col("seq"), F.col("op"),
                *[F.col(c) for c in carry if c not in ("lsn", "seq")],
            )
        ).alias("__win")
    ]
    for c in value_cols:
        if c in toastable and has_toast:
            unset = F.array_contains(F.col("toast_cols"), c) | (F.col("op") == "D")
        else:
            unset = F.col("op") == "D"
        aggs.append(
            F.max(
                F.when(
                    ~F.coalesce(unset, F.lit(False)),
                    F.struct(F.col("lsn"), F.col("seq"), F.col(c).alias("v")),
                )
            ).alias(f"__last_{c}")
        )
    agged = data.groupBy(*key_cols).agg(*aggs)
    out = agged.filter(F.col("__win.op") != "D")
    if t_lsn is not None:
        out = out.filter(F.col("__win.lsn") > F.lit(t_lsn))
    proj = []
    for c in in_cols:
        if c in drop:
            continue
        if c in key_cols:
            proj.append(F.col(c))
        elif c in value_cols:
            proj.append(F.col(f"__last_{c}.v").alias(c))
        else:
            proj.append(F.col(f"__win.{c}").alias(c))
    return out.select(*proj)
