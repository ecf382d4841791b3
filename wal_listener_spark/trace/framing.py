"""pgoutput-compatible binary framing: encoder (fixture/bench side) and
frame-level byte layouts.

Byte-compatible with the reference's BinaryParser
(``/root/reference/internal/listener/transaction/parser.go:178-344``,
big-endian per ``cmd/wal-listener/main.go:83``):

  Begin  'B': int64 LSN, int64 ts(µs since 2000-01-01 UTC), int32 XID
  Commit 'C': int8 flags, int64 LSN, int64 txEndLSN, int64 ts
  Relation 'R': int32 relID, cstring namespace, cstring name,
                int8 replica, int16 ncols,
                ncols x (int8 keyFlag, cstring name, int32 oid, int32 typmod)
  Insert 'I': int32 relID, byte 'N', TupleData
  Update 'U': int32 relID, optional 'K'|'O' + old TupleData,
              byte 'N', new TupleData
  Delete 'D': int32 relID, 'K'|'O', old TupleData
  Truncate 'T': int32 nrels, int8 option, nrels x int32 relID
  TupleData: int16 ncols, ncols x cell; cell = 't' int32 len + bytes
             | 'n' (SQL NULL) | 'u' (TOAST unchanged)

The *decoder* lives in ``operators/decode.py`` (vectorized mapInPandas);
this module is plain-Python struct packing used to synthesize byte-exact
fixtures and bench inputs (one-time, off the hot path).
"""

from __future__ import annotations

import struct

PG_EPOCH_UNIX_S = 946684800  # 2000-01-01 UTC in unix seconds


def ts_to_pg_micros(unix_ts: float) -> int:
    return int(round((unix_ts - PG_EPOCH_UNIX_S) * 1_000_000))


def pg_micros_to_unix(us: int) -> float:
    return us / 1_000_000 + PG_EPOCH_UNIX_S


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def encode_tuple(cells: list[tuple[str, bytes | None]]) -> bytes:
    """cells: (tag, value) with tag in 't'/'n'/'u' (parser.go:325-344)."""
    out = [struct.pack(">h", len(cells))]
    for tag, value in cells:
        out.append(tag.encode())
        if tag == "t":
            v = value or b""
            out.append(struct.pack(">i", len(v)))
            out.append(v)
    return b"".join(out)


def encode_begin(lsn: int, ts_us: int, xid: int) -> bytes:
    return b"B" + struct.pack(">qqi", lsn, ts_us, xid)


def encode_commit(lsn: int, tx_end_lsn: int, ts_us: int, flags: int = 0) -> bytes:
    return b"C" + struct.pack(">bqqq", flags, lsn, tx_end_lsn, ts_us)


def encode_relation(
    rel_id: int,
    namespace: str,
    name: str,
    columns: list[tuple[str, int, bool]],
    replica: int = 0,
    typmod: int = -1,
) -> bytes:
    out = [b"R", struct.pack(">i", rel_id), _cstr(namespace), _cstr(name)]
    out.append(struct.pack(">bh", replica, len(columns)))
    for cname, oid, is_key in columns:
        out.append(struct.pack(">b", 1 if is_key else 0))
        out.append(_cstr(cname))
        out.append(struct.pack(">ii", oid, typmod))
    return b"".join(out)


def encode_insert(rel_id: int, cells: list[tuple[str, bytes | None]]) -> bytes:
    return b"I" + struct.pack(">i", rel_id) + b"N" + encode_tuple(cells)


def encode_update(
    rel_id: int,
    new_cells: list[tuple[str, bytes | None]],
    old_cells: list[tuple[str, bytes | None]] | None = None,
    old_kind: str = "K",
) -> bytes:
    out = [b"U", struct.pack(">i", rel_id)]
    if old_cells is not None:
        out.append(old_kind.encode())
        out.append(encode_tuple(old_cells))
    out.append(b"N")
    out.append(encode_tuple(new_cells))
    return b"".join(out)


def encode_delete(
    rel_id: int, old_cells: list[tuple[str, bytes | None]], old_kind: str = "K"
) -> bytes:
    return b"D" + struct.pack(">i", rel_id) + old_kind.encode() + encode_tuple(old_cells)


def encode_truncate(rel_ids: list[int], option: int = 0) -> bytes:
    out = [b"T", struct.pack(">ib", len(rel_ids), option)]
    for r in rel_ids:
        out.append(struct.pack(">i", r))
    return b"".join(out)


def encode_origin(lsn: int, name: str) -> bytes:
    return b"O" + struct.pack(">q", lsn) + _cstr(name)


def encode_type(type_id: int, namespace: str, name: str) -> bytes:
    return b"Y" + struct.pack(">i", type_id) + _cstr(namespace) + _cstr(name)
