"""Spark-native deterministic WAL-trace generator.

Builds the columnar change-event stream (FIXTURES.md §2) from the
driver-provided ``documents`` parquet — pure Catalyst expressions, zero
per-row Python, so generation itself scales to 10^10 events by raising
``amplify`` (each amplification step is an ``explode(sequence(...))``
that fans out JVM-side).

Message kinds follow the pgoutput protocol the reference decodes
(``/root/reference/internal/listener/transaction/protocol.go:7-46``):
``B`` begin, ``C`` commit, ``R`` relation (schema registry), ``I/U/D``
row changes, ``T`` truncate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import spec

TRACE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("tx_id", T.LongType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("rel_id", T.IntegerType(), True),
        T.StructField("schema_name", T.StringType(), True),
        T.StructField("table_name", T.StringType(), True),
        T.StructField(
            "rel_columns",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType(), False),
                        T.StructField("type_oid", T.IntegerType(), False),
                        T.StructField("is_key", T.BooleanType(), False),
                        T.StructField("typmod", T.IntegerType(), False),
                    ]
                )
            ),
            True,
        ),
        T.StructField("old_vals", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("new_vals", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("toast_cols", T.ArrayType(T.StringType()), True),
        T.StructField("commit_ts", T.TimestampType(), True),
        T.StructField("truncate_opts", T.IntegerType(), True),
    ]
)


def _keys_df(spark: SparkSession, sf_dir: str, amplify: int) -> DataFrame:
    """One row per logical key k, with repo/path/lang/text attributes.

    The docs scan is spread across the session's cores BEFORE the
    amplification explode: the driver-provided ``documents.parquet`` is
    a single file (one scan task), and every downstream branch fans that
    scan out thousands-fold with per-row sha2/map work — without the
    repartition the whole generation stage runs on ONE task (measured:
    52s -> 9s for a 4.2M-event trace at local[32])."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    df = docs.repartition(spark.sparkContext.defaultParallelism)
    if amplify > 1:
        df = df.withColumn("a", F.explode(F.sequence(F.lit(0), F.lit(amplify - 1))))
    else:
        df = df.withColumn("a", F.lit(0))
    k = F.col("doc_id") * amplify + F.col("a")
    return df.select(
        k.cast("long").alias("k"),
        F.when(k % spec.HOT_MOD == 0, F.lit(spec.HOT_REPO))
        .otherwise(
            F.concat(
                F.lit("org"),
                (k % spec.REPO_MOD).cast("string"),
                F.lit("/proj"),
                (k % spec.PROJ_MOD).cast("string"),
            )
        )
        .alias("repo"),
        F.concat(
            F.lit("src/m"),
            F.floor(k / 100).cast("string"),
            F.lit("/f"),
            k.cast("string"),
            F.lit("."),
            F.col("lang"),
        ).alias("path"),
        F.col("lang"),
        F.col("text"),
        (F.lit(1) + (k % spec.NVER_MOD)).cast("int").alias("n_ver"),
        F.to_timestamp(F.lit(spec.EPOCH)).alias("epoch_ts"),
    )


def num_keys(spark: SparkSession, sf_dir: str, amplify: int) -> int:
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    return n_docs * amplify


#: key receiving the hot-update storm (1: never the delete key 0, and
#: below any realistic k_evo so the storm stays pre-evolution-arity)
HOT_KEY = 1


def build_trace(
    spark: SparkSession,
    sf_dir: str,
    amplify: int = 1,
    k_evo: int | None = None,
    k_tr: int | None = None,
    include_noise_ops: bool = True,
    hot_updates: int = 0,
) -> DataFrame:
    """Full columnar trace: B/C/R/I/U/D (+T when ``k_tr``) rows.

    ``k_evo``: first key whose events carry the evolved column ``stars``
    (Relation v2 arrives just before it). Default: half the key space.
    ``k_tr``: emit a TRUNCATE barrier just before key ``k_tr``'s tx.
    ``include_noise_ops``: emit Origin 'O' / Type 'Y' rows that the
    pipeline must ignore (reference: parser.go:68-69, 94-95).
    ``hot_updates``: append one giant transaction issuing this many
    consecutive UPDATEs to the single key ``HOT_KEY`` — the
    hot-(repo,path) update-storm skew shape (the analog of the
    reference's hash-partitioner hot-key hazard, kafka.go:120-128).
    Final state for HOT_KEY becomes content ``#hv{n-1}`` /
    commit ``sha256('hot:{n-1}')[:40]``.
    """
    nk = num_keys(spark, sf_dir, amplify)
    if k_evo is None:
        k_evo = nk // 2

    keys = _keys_df(spark, sf_dir, amplify)
    k = F.col("k")
    base = (k + 1) * spec.SLOT
    commit_ts = F.col("epoch_ts") + F.make_interval(secs=k.cast("double"))
    has_stars = k >= F.lit(k_evo)

    # --- data rows: INSERT (v=0) / UPDATE (v>0) --------------------------
    versioned = keys.withColumn(
        "v", F.explode(F.sequence(F.lit(0), F.col("n_ver") - 1))
    )
    v = F.col("v")
    toast = (v > 0) & (((k + v) % spec.TOAST_MOD) == 0)
    content = F.concat(F.col("text"), F.lit("#v"), v.cast("string"))
    commit_hex = F.substring(
        F.sha2(F.concat(k.cast("string"), F.lit(":"), v.cast("string")), 256), 1, 40
    )
    base_map = F.create_map(
        F.lit("repo"), F.col("repo"),
        F.lit("path"), F.col("path"),
        F.lit("commit"), commit_hex,
        F.lit("lang"), F.col("lang"),
    )
    content_map = F.when(toast, F.create_map().cast("map<string,string>")).otherwise(
        F.create_map(F.lit("content"), content)
    )
    stars_map = F.when(
        has_stars,
        F.create_map(F.lit("stars"), (k % spec.STARS_MOD).cast("string")),
    ).otherwise(F.create_map().cast("map<string,string>"))
    new_vals = F.map_concat(base_map, content_map, stars_map)
    key_map = F.create_map(
        F.lit("repo"), F.col("repo"), F.lit("path"), F.col("path")
    )

    data_rows = versioned.select(
        (base + 1 + v).cast("long").alias("lsn"),
        k.alias("tx_id"),
        v.cast("int").alias("seq"),
        F.when(v == 0, F.lit("I")).otherwise(F.lit("U")).alias("op"),
        F.lit(spec.REL_ID).alias("rel_id"),
        F.lit(None).cast("string").alias("schema_name"),
        F.lit(None).cast("string").alias("table_name"),
        F.lit(None).cast(TRACE_SCHEMA["rel_columns"].dataType).alias("rel_columns"),
        F.when(v > 0, key_map).alias("old_vals"),
        new_vals.alias("new_vals"),
        F.when(toast, F.array(F.lit("content")))
        .otherwise(F.array().cast("array<string>"))
        .alias("toast_cols"),
        F.lit(None).cast("timestamp").alias("commit_ts"),
        F.lit(None).cast("int").alias("truncate_opts"),
    )

    # --- trailing DELETE for k % DELETE_MOD == 0 -------------------------
    del_rows = keys.filter(k % spec.DELETE_MOD == 0).select(
        (base + 5).cast("long").alias("lsn"),
        k.alias("tx_id"),
        F.col("n_ver").alias("seq"),
        F.lit("D").alias("op"),
        F.lit(spec.REL_ID).alias("rel_id"),
        F.lit(None).cast("string").alias("schema_name"),
        F.lit(None).cast("string").alias("table_name"),
        F.lit(None).cast(TRACE_SCHEMA["rel_columns"].dataType).alias("rel_columns"),
        key_map.alias("old_vals"),
        F.lit(None).cast("map<string,string>").alias("new_vals"),
        F.array().cast("array<string>").alias("toast_cols"),
        F.lit(None).cast("timestamp").alias("commit_ts"),
        F.lit(None).cast("int").alias("truncate_opts"),
    )

    # --- Begin / Commit framing rows (protocol.go:54-73) -----------------
    def _bc(op: str, lsn_col, seq: int) -> DataFrame:
        return keys.select(
            lsn_col.cast("long").alias("lsn"),
            k.alias("tx_id"),
            F.lit(seq).alias("seq"),
            F.lit(op).alias("op"),
            F.lit(None).cast("int").alias("rel_id"),
            F.lit(None).cast("string").alias("schema_name"),
            F.lit(None).cast("string").alias("table_name"),
            F.lit(None)
            .cast(TRACE_SCHEMA["rel_columns"].dataType)
            .alias("rel_columns"),
            F.lit(None).cast("map<string,string>").alias("old_vals"),
            F.lit(None).cast("map<string,string>").alias("new_vals"),
            F.lit(None).cast("array<string>").alias("toast_cols"),
            commit_ts.alias("commit_ts"),
            F.lit(None).cast("int").alias("truncate_opts"),
        )

    begin_rows = _bc("B", base, -1)
    commit_rows = _bc("C", base + 7, 999)

    # --- Relation rows (protocol.go:84-99, 157-167) -----------------------
    def _rel_row(lsn: int, cols: list[tuple[str, int, bool]]):
        return (
            lsn,
            -1,
            0,
            "R",
            spec.REL_ID,
            spec.SCHEMA_NAME,
            spec.TABLE_NAME,
            [(name, oid, key_, -1) for name, oid, key_ in cols],
            None,
            None,
            None,
            None,
            None,
        )

    rel_data = [_rel_row(1, spec.BASE_COLUMNS)]
    if k_evo < nk:
        rel_data.append(_rel_row(spec.relation_v2_lsn(k_evo), spec.EVOLVED_COLUMNS))
    extra = spark.createDataFrame(rel_data, TRACE_SCHEMA)

    parts = [begin_rows, data_rows, del_rows, commit_rows, extra]

    if k_tr is not None:
        trunc = spark.createDataFrame(
            [
                (
                    spec.truncate_lsn(k_tr),
                    -2,
                    0,
                    "T",
                    spec.REL_ID,
                    None,
                    None,
                    None,
                    None,
                    None,
                    None,
                    None,
                    0,
                )
            ],
            TRACE_SCHEMA,
        )
        parts.append(trunc)

    if hot_updates:
        # one transaction, LSN region after every key's slot: B at H0,
        # updates at H0+1+i, C at H0+hot_updates+2 (globally unique,
        # per-key monotone — the storm postdates HOT_KEY's base versions)
        hot = keys.filter(k == HOT_KEY)
        h0 = F.lit((nk + 10) * spec.SLOT).cast("long")
        hot_tx = F.lit(nk + 10).cast("long")
        hot_ts = F.col("epoch_ts") + F.make_interval(secs=F.lit(float(nk + 10)))
        i_col = F.col("i")
        hot_data = hot.withColumn(
            "i", F.explode(F.sequence(F.lit(0), F.lit(hot_updates - 1)))
        ).select(
            (h0 + 1 + i_col).cast("long").alias("lsn"),
            hot_tx.alias("tx_id"),
            i_col.cast("int").alias("seq"),
            F.lit("U").alias("op"),
            F.lit(spec.REL_ID).alias("rel_id"),
            F.lit(None).cast("string").alias("schema_name"),
            F.lit(None).cast("string").alias("table_name"),
            F.lit(None).cast(TRACE_SCHEMA["rel_columns"].dataType).alias(
                "rel_columns"
            ),
            key_map.alias("old_vals"),
            # per-update commit hash ('hot:' namespace) so LWW evidence
            # does not degenerate to identical winning rows
            F.create_map(
                F.lit("repo"), F.col("repo"),
                F.lit("path"), F.col("path"),
                F.lit("commit"),
                F.substring(
                    F.sha2(
                        F.concat(F.lit("hot:"), i_col.cast("string")), 256
                    ),
                    1,
                    40,
                ),
                F.lit("lang"), F.col("lang"),
                F.lit("content"),
                F.concat(F.col("text"), F.lit("#hv"), i_col.cast("string")),
            ).alias("new_vals"),
            F.array().cast("array<string>").alias("toast_cols"),
            F.lit(None).cast("timestamp").alias("commit_ts"),
            F.lit(None).cast("int").alias("truncate_opts"),
        )

        def _hot_bc(op: str, lsn_col, seq: int) -> DataFrame:
            return hot.select(
                lsn_col.cast("long").alias("lsn"),
                hot_tx.alias("tx_id"),
                F.lit(seq).alias("seq"),
                F.lit(op).alias("op"),
                F.lit(None).cast("int").alias("rel_id"),
                F.lit(None).cast("string").alias("schema_name"),
                F.lit(None).cast("string").alias("table_name"),
                F.lit(None)
                .cast(TRACE_SCHEMA["rel_columns"].dataType)
                .alias("rel_columns"),
                F.lit(None).cast("map<string,string>").alias("old_vals"),
                F.lit(None).cast("map<string,string>").alias("new_vals"),
                F.lit(None).cast("array<string>").alias("toast_cols"),
                hot_ts.alias("commit_ts"),
                F.lit(None).cast("int").alias("truncate_opts"),
            )

        parts.append(_hot_bc("B", h0, -1))
        parts.append(hot_data)
        parts.append(_hot_bc("C", h0 + hot_updates + 2, 999))

    if include_noise_ops:
        noise = spark.createDataFrame(
            [
                (2, -1, 0, "O", None, None, None, None, None, None, None, None, None),
                (3, -1, 0, "Y", None, None, None, None, None, None, None, None, None),
            ],
            TRACE_SCHEMA,
        )
        parts.append(noise)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def reshard_relations(
    trace: DataFrame, n_relations: int, base_rel_id: int = 1000
) -> DataFrame:
    """Re-key a single-relation trace across ``n_relations`` relations —
    the multi-table catalog shape (one topic per table, event.go:24-36)
    at generator volume.

    Data rows (I/U/D) move to relation ``base_rel_id + (tx_id %
    n_relations)``; since the generator's tx_id == key k, each
    relation owns a disjoint key slice and no TRUNCATE/evolution can
    cross relations. The single Relation row is replaced by one per
    relation (all base-arity — build the input with ``k_evo=nk`` so no
    evolved arity appears). B/C/O/Y control rows pass through
    unchanged (tx-less / rel-less)."""
    spark = trace.sparkSession
    data_ops = F.col("op").isin("I", "U", "D")
    resharded = trace.filter(F.col("op") != "R").withColumn(
        "rel_id",
        F.when(
            data_ops,
            (F.lit(base_rel_id) + F.pmod(F.col("tx_id"), F.lit(n_relations)))
            .cast("int"),
        ).otherwise(F.col("rel_id")),
    )
    rel_rows = spark.createDataFrame(
        [
            (
                1, -1, 0, "R", base_rel_id + i, spec.SCHEMA_NAME,
                f"{spec.TABLE_NAME}_{i}",
                [(n, oid, key_, -1) for n, oid, key_ in spec.BASE_COLUMNS],
                None, None, None, None, None,
            )
            for i in range(n_relations)
        ],
        TRACE_SCHEMA,
    )
    return resharded.unionByName(rel_rows)


def write_trace(
    df: DataFrame, path: str, num_files: int | None = None
) -> None:
    """Persist the trace as the partitioned 'WAL' the streaming job tails.

    Files are range-split on lsn so each file holds whole transactions
    (micro-batch boundaries then align to commits — SURVEY.md §7 hard
    part (b)). ``repartitionByRange`` keeps lsn-ordered clustering so
    parquet min/max stats let the LSN-guard (`lsn > last_applied`) prune
    whole files on resume.
    """
    if num_files:
        df = df.repartitionByRange(num_files, "lsn")
    df.write.mode("overwrite").parquet(path)
