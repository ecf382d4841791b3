"""Vectorized pgoutput frame decoder (P0-P10) + declarative name resolution.

The reference parses frames one at a time on a single thread
(``/root/reference/internal/listener/transaction/parser.go:34-176``
dispatch; primitive readers ``parser.go:253-344``). Spark-first split:

 1. ``decode_frames`` — mapInPandas over the ``(lsn, frame binary)``
    stream: Arrow-batched structural decode producing *positional* cells
    (pgoutput tuples carry no column names — names live in the Relation
    registry). Unknown message types are skipped, not errors
    (``parser.go:171-173``). The only Python in the engine, amortized
    per Arrow batch; everything downstream is Catalyst.
 2. ``resolve_names`` — the T1 "schema join" (``wal.go:63-114``) as a
    broadcast join on (rel_id, tuple arity) + ``arrays_zip``: cells are
    zipped with the relation's ordinal column list declaratively.
    Arity keys the relation *version* (additive evolution changes the
    column count), so mid-stream schema evolution resolves correctly
    without order-dependent state.
 3. ``assign_tx`` — propagate the Begin XID (``protocol.go:54-61``) to
    the DML frames that follow it. Ordering state is per-LSN-range: on
    the bounded replay path trace files are tx-aligned, so the window
    runs inside each range partition; the global-window fallback is the
    single-consumer semantic the reference uses.

TRUNCATE fans out one action per relation id (``parser.go:212-225``).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..trace.framing import PG_EPOCH_UNIX_S
from .registry import RelationRegistry

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("xid", T.IntegerType(), True),
        T.StructField("rel_id", T.IntegerType(), True),
        T.StructField("commit_ts", T.TimestampType(), True),
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
        T.StructField(
            "old_cells",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("tag", T.StringType(), False),
                        T.StructField("value", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField(
            "new_cells",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("tag", T.StringType(), False),
                        T.StructField("value", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("truncate_rel_ids", T.ArrayType(T.IntegerType()), True),
        T.StructField("truncate_opts", T.IntegerType(), True),
    ]
)


def _read_cstr(buf: memoryview, pos: int) -> tuple[str, int]:
    end = pos
    while buf[end] != 0:
        end += 1
    return bytes(buf[pos:end]).decode(), end + 1


def _read_tuple(buf: memoryview, pos: int) -> tuple[list[tuple[str, str | None]], int]:
    (n,) = struct.unpack_from(">h", buf, pos)
    pos += 2
    cells: list[tuple[str, str | None]] = []
    for _ in range(n):
        tag = chr(buf[pos])
        pos += 1
        if tag == "t":
            (ln,) = struct.unpack_from(">i", buf, pos)
            pos += 4
            cells.append(("t", bytes(buf[pos : pos + ln]).decode()))
            pos += ln
        elif tag == "n":
            cells.append(("n", None))
        elif tag == "u":
            cells.append(("u", None))
        else:  # corrupt cell: permissive skip (reference logs + continues)
            cells.append(("?", None))
    return cells, pos


def _pg_ts(us: int) -> datetime:
    return datetime.fromtimestamp(us / 1_000_000 + PG_EPOCH_UNIX_S, tz=timezone.utc)


def _decode_one(lsn: int, frame: bytes) -> dict | None:
    buf = memoryview(frame)
    op = chr(buf[0])
    pos = 1
    row = {
        "lsn": lsn, "op": op, "xid": None, "rel_id": None, "commit_ts": None,
        "schema_name": None, "table_name": None, "rel_columns": None,
        "old_cells": None, "new_cells": None,
        "truncate_rel_ids": None, "truncate_opts": None,
    }
    if op == "B":  # parser.go:178-184
        # payload LSN (tx begin LSN) is kept implicitly: the envelope
        # WalStart is the stream position and orders the stream; the
        # reference's Begin/Commit LSN-equality integrity check lives in
        # assemble.integrity_violations
        _b_lsn, ts_us, xid = struct.unpack_from(">qqi", buf, pos)
        row.update(xid=xid, commit_ts=_pg_ts(ts_us))
    elif op == "C":  # parser.go:186-193
        _flags, _c_lsn, _tx_end, ts_us = struct.unpack_from(">bqqq", buf, pos)
        row.update(commit_ts=_pg_ts(ts_us))
    elif op == "R":  # parser.go:243-251, 309-323
        (rel_id,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        ns, pos = _read_cstr(buf, pos)
        name, pos = _read_cstr(buf, pos)
        _replica, ncols = struct.unpack_from(">bh", buf, pos)
        pos += 3
        cols = []
        for _ in range(ncols):
            is_key = buf[pos] != 0
            pos += 1
            cname, pos = _read_cstr(buf, pos)
            oid, typmod = struct.unpack_from(">ii", buf, pos)
            pos += 8
            cols.append((cname, oid, is_key, typmod))
        row.update(rel_id=rel_id, schema_name=ns, table_name=name, rel_columns=cols)
    elif op == "I":  # parser.go:195-201
        (rel_id,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        pos += 1  # 'N' marker
        cells, pos = _read_tuple(buf, pos)
        row.update(rel_id=rel_id, new_cells=cells)
    elif op == "U":  # parser.go:227-241
        (rel_id,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        row["rel_id"] = rel_id
        if chr(buf[pos]) in ("K", "O"):
            pos += 1
            old, pos = _read_tuple(buf, pos)
            row["old_cells"] = old
        pos += 1  # 'N'
        cells, pos = _read_tuple(buf, pos)
        row["new_cells"] = cells
    elif op == "D":  # parser.go:203-210
        (rel_id,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        pos += 1  # 'K' or 'O'
        old, pos = _read_tuple(buf, pos)
        row.update(rel_id=rel_id, old_cells=old)
    elif op == "T":  # parser.go:212-225
        nrels, opt = struct.unpack_from(">ib", buf, pos)
        pos += 5
        ids = list(struct.unpack_from(f">{nrels}i", buf, pos))
        row.update(truncate_rel_ids=ids, truncate_opts=int(opt))
    elif op in ("O", "Y"):  # logged + ignored (parser.go:68-69,94-95)
        pass
    else:  # unknown type: warn + skip (parser.go:171-173)
        return None
    return row


def decode_frames(frames: DataFrame) -> DataFrame:
    """(lsn long, frame binary) -> DECODED_SCHEMA rows, Arrow-batched."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in DECODED_SCHEMA.fields]
        for pdf in batches:
            out = []
            for lsn, frame in zip(pdf["lsn"].values, pdf["frame"].values):
                row = _decode_one(int(lsn), bytes(frame))
                if row is not None:
                    out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return frames.select("lsn", "frame").mapInPandas(_decode, DECODED_SCHEMA)


def _cells_to_map(zipped_col, names_field: str, cells_field: str):
    entries = F.transform(
        F.filter(zipped_col, lambda x: x[cells_field]["tag"].isin("t", "n")),
        lambda x: F.struct(
            x[names_field].alias("key"), x[cells_field]["value"].alias("value")
        ),
    )
    return F.map_from_entries(entries)


def resolve_names(decoded: DataFrame, registry: RelationRegistry) -> DataFrame:
    """Positional cells -> named text maps via broadcast registry zip.

    Produces the columnar trace form (generator.TRACE_SCHEMA layout) so
    the framed path feeds the exact same downstream pipeline. Rows whose
    (rel_id, arity) has no registry entry get NULL maps — the
    errRelationNotFound quarantine case (wal.go:32).
    """
    spark = decoded.sparkSession
    versions = []
    for s in registry.relations.values():
        names = [c[0] for c in s.columns]
        versions.append((s.rel_id, len(names), names))
        # additive-evolution prefixes also resolve (older frames have
        # fewer cells than the latest relation version)
        for arity in range(1, len(names)):
            versions.append((s.rel_id, arity, names[:arity]))
    vdf = spark.createDataFrame(
        versions, "v_rel_id int, arity int, col_names array<string>"
    ).dropDuplicates(["v_rel_id", "arity"])

    d = decoded.withColumn(
        "arity",
        F.coalesce(F.size("new_cells"), F.size("old_cells")).cast("int"),
    )
    joined = d.join(
        F.broadcast(vdf),
        (d["rel_id"] == vdf["v_rel_id"]) & (d["arity"] == vdf["arity"]),
        "left",
    )

    new_zip = F.arrays_zip(F.col("col_names"), F.col("new_cells"))
    old_zip = F.arrays_zip(F.col("col_names"), F.col("old_cells"))
    new_vals = F.when(
        F.col("new_cells").isNotNull() & F.col("col_names").isNotNull(),
        _cells_to_map(new_zip, "col_names", "new_cells"),
    )
    old_vals = F.when(
        F.col("old_cells").isNotNull() & F.col("col_names").isNotNull(),
        _cells_to_map(old_zip, "col_names", "old_cells"),
    )
    toast_cols = F.when(
        F.col("new_cells").isNotNull() & F.col("col_names").isNotNull(),
        F.transform(
            F.filter(new_zip, lambda x: x["new_cells"]["tag"] == "u"),
            lambda x: x["col_names"],
        ),
    )

    base = joined.select(
        F.col("lsn"),
        F.coalesce(F.col("xid"), F.lit(-1)).cast("long").alias("tx_id"),
        F.lit(0).alias("seq"),
        F.col("op"),
        F.col("rel_id"),
        F.col("schema_name"),
        F.col("table_name"),
        F.col("rel_columns"),
        old_vals.alias("old_vals"),
        new_vals.alias("new_vals"),
        toast_cols.alias("toast_cols"),
        F.col("commit_ts"),
        F.col("truncate_opts"),
        F.col("truncate_rel_ids"),
    )

    # TRUNCATE fan-out: one action row per relation (parser.go:212-225)
    non_trunc = base.filter(F.col("op") != "T").drop("truncate_rel_ids")
    trunc = (
        base.filter(F.col("op") == "T")
        .withColumn("rel_id", F.explode("truncate_rel_ids"))
        .drop("truncate_rel_ids")
    )
    return non_trunc.unionByName(trunc)


def assign_tx(
    columnar: DataFrame, per_range: bool = True, num_ranges: int | None = None
) -> DataFrame:
    """Stamp each DML row with the XID of the preceding Begin, and a
    per-tx seq from LSN order.

    ``per_range=True`` is the scale path: rows are hashed into
    *deterministic* LSN ranges (fixed-width stripes of the observed
    [min, max] LSN span — NOT ``repartitionByRange``, whose sampled
    boundaries are nondeterministic and can split a transaction so its
    head rows precede any Begin in their partition). The per-range
    window finds the preceding Begin inside each stripe; rows before
    their stripe's first Begin (a transaction straddling a stripe
    boundary) take the carried XID of the last Begin in any earlier
    stripe — an O(num_ranges) driver-side scan-line, broadcast back as
    a literal map. ``per_range=False`` is the strict single-consumer
    fallback (global window), correct for any input but serial —
    exactly what the reference's one-thread loop does.
    """
    if per_range:
        spark = columnar.sparkSession
        if num_ranges is None:
            num_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        bounds = columnar.agg(
            F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
        ).collect()[0]
        if bounds["lo"] is None:
            return columnar  # empty batch
        lo, hi = int(bounds["lo"]), int(bounds["hi"])
        width = max((hi - lo) // num_ranges + 1, 1)
        rid = F.floor((F.col("lsn") - F.lit(lo)) / F.lit(width)).cast("int")
        df = columnar.withColumn("__rid", rid).repartition(
            num_ranges, F.col("__rid")
        )
        w = Window.partitionBy("__rid").orderBy("lsn")
        # carry map: for each stripe, the XID of the last Begin in any
        # strictly-earlier stripe (tiny pushed-down agg over B rows only)
        lastb = (
            columnar.filter(F.col("op") == "B")
            .groupBy(F.floor((F.col("lsn") - F.lit(lo)) / F.lit(width)).cast("int").alias("__rid"))
            .agg(F.max(F.struct(F.col("lsn"), F.col("tx_id"))).alias("lb"))
            .collect()
        )
        last_by_rid = {r["__rid"]: r["lb"]["tx_id"] for r in lastb}
        carry_pairs: list[tuple[int, int]] = []
        carried: int | None = None
        for r in range(num_ranges + 1):
            if carried is not None:
                carry_pairs.append((r, carried))
            if r in last_by_rid:
                carried = last_by_rid[r]
        carry_expr = F.lit(None).cast("long")
        if carry_pairs:
            carry_map = F.create_map(
                *[F.lit(v) for pair in carry_pairs for v in pair]
            )
            carry_expr = carry_map.getItem(F.col("__rid")).cast("long")
    else:
        df = columnar
        w = Window.orderBy("lsn")
        carry_expr = F.lit(None).cast("long")
    cur_xid = F.coalesce(
        F.last(
            F.when(F.col("op") == "B", F.col("tx_id")), ignorenulls=True
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        carry_expr,
    )
    # Commit frames carry no XID in pgoutput v1 — they close the tx the
    # preceding Begin opened, so C inherits cur_xid too.
    df = df.withColumn(
        "tx_id",
        F.when(F.col("op").isin("I", "U", "D", "C"), cur_xid).otherwise(
            F.col("tx_id")
        ),
    )
    if per_range:
        df = df.drop("__rid")
    w_seq = Window.partitionBy("tx_id").orderBy("lsn")
    return df.withColumn(
        "seq",
        F.when(
            F.col("op").isin("I", "U", "D"), F.row_number().over(w_seq)
        ).otherwise(F.col("seq")),
    )
