"""Columnar trace -> framed binary form (``wal_trace_framed``,
FIXTURES.md §3): one ``(lsn, frame: binary)`` row per pgoutput message,
byte-compatible with the reference parser. Arrow-batched mapInPandas —
fixture/bench generation, off the query hot path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from . import framing, spec

FRAMED_DDL = "lsn long, frame binary"


def _cells_for(
    names: list[str],
    new_vals: dict | None,
    toast_cols: list | None,
) -> list[tuple[str, bytes | None]]:
    toast = set(toast_cols or [])
    cells: list[tuple[str, bytes | None]] = []
    for n in names:
        if n in toast:
            cells.append(("u", None))
        elif new_vals is not None and n in new_vals:
            v = new_vals[n]
            cells.append(("n", None) if v is None else ("t", str(v).encode()))
        else:
            cells.append(("n", None))
    return cells


def frames_from_columnar(trace: DataFrame) -> DataFrame:
    """Encode every columnar trace row as its pgoutput frame.

    Column order is the Relation's ordinal order (tuples are positional
    — parser.go:325-344). Rows carrying the evolved column use the
    evolved arity; pre-evolution rows use the base arity, exactly as a
    real stream would after a Relation v2 message.
    """
    base_names = [c[0] for c in spec.BASE_COLUMNS]
    evo_names = [c[0] for c in spec.EVOLVED_COLUMNS]
    key_names = {c[0] for c in spec.BASE_COLUMNS if c[2]}

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lsns, frames = [], []
            for r in pdf.itertuples(index=False):
                op = r.op
                if op == "B":
                    ts_us = framing.ts_to_pg_micros(r.commit_ts.timestamp())
                    f = framing.encode_begin(r.lsn, ts_us, int(r.tx_id))
                elif op == "C":
                    ts_us = framing.ts_to_pg_micros(r.commit_ts.timestamp())
                    f = framing.encode_commit(r.lsn, r.lsn, ts_us)
                elif op == "R":
                    cols = [(c["name"], c["type_oid"], c["is_key"]) for c in r.rel_columns]
                    f = framing.encode_relation(
                        int(r.rel_id), r.schema_name, r.table_name, cols
                    )
                elif op == "I":
                    names = evo_names if "stars" in (r.new_vals or {}) else base_names
                    f = framing.encode_insert(
                        int(r.rel_id), _cells_for(names, r.new_vals, r.toast_cols)
                    )
                elif op == "U":
                    names = evo_names if "stars" in (r.new_vals or {}) else base_names
                    # key-only old tuple ('K') is still positionally full:
                    # non-key positions are 'n' cells (parser.go:227-241)
                    old_cells = None
                    if r.old_vals is not None:
                        old_cells = [
                            ("t", str(r.old_vals[n]).encode())
                            if n in r.old_vals
                            else ("n", None)
                            for n in names
                        ]
                    f = framing.encode_update(
                        int(r.rel_id),
                        _cells_for(names, r.new_vals, r.toast_cols),
                        old_cells,
                        old_kind="K",
                    )
                elif op == "D":
                    names = evo_names if len(r.old_vals or {}) > len(base_names) else base_names
                    old_cells = [
                        ("t", str(r.old_vals[n]).encode())
                        if r.old_vals and n in r.old_vals
                        else ("n", None)
                        for n in names
                    ]
                    f = framing.encode_delete(int(r.rel_id), old_cells, old_kind="K")
                elif op == "T":
                    f = framing.encode_truncate(
                        [int(r.rel_id)], int(r.truncate_opts or 0)
                    )
                elif op == "O":
                    f = framing.encode_origin(r.lsn, "origin")
                elif op == "Y":
                    f = framing.encode_type(1, "public", "sometype")
                else:
                    continue
                lsns.append(r.lsn)
                frames.append(f)
            yield pd.DataFrame({"lsn": lsns, "frame": frames})

    return trace.mapInPandas(_encode, FRAMED_DDL)
