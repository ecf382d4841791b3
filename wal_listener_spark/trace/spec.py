"""Deterministic WAL-trace specification — shared constants.

The synthetic trace models the pgoutput message stream the reference
consumes (message kinds ``B C R I U D T`` —
``/root/reference/internal/listener/transaction/protocol.go:7-46``) over a
source-code-repos table ``(repo, path, commit, lang, content)`` keyed on
``(repo, path)`` (key flag: ``protocol.go:158-160``).

Everything is a pure function of the driver-provided ``documents`` table
(seeded, wall-clock-free), so the Spark generator, the pure-Python oracle,
and the DuckDB oracle SQL all agree without sharing code.

Layout per logical key ``k`` (k = doc_id * amplify + a):

=====================  =======================================================
quantity               definition
=====================  =======================================================
n_ver(k)               1 + k % 3                  (1..3 versions)
repo(k)                'org0/hot' if k % 3 == 0   (hot-key skew knob,
                       else 'org{k%23}/proj{k%7}'  FIXTURES.md §6.7)
path(k)                'src/m{k//100}/f{k}.{lang}'
commit(k, v)           substr(sha256('{k}:{v}'), 1, 40)
content(k, v)          text || '#v' || v
toast(k, v)            v > 0 and (k + v) % 5 == 0 (content sent as TOAST
                       'u' — unchanged; parser.go:335-336)
delete(k)              k % 11 == 0                (trailing DELETE)
stars(k)               k % 50, only emitted for k >= k_evo (schema
                       evolution: Relation v2 adds the column)
commit_ts(k)           2024-01-01T00:00:00Z + k seconds
=====================  =======================================================

LSN layout: each key owns a SLOT=16-wide LSN range, base(k) = (k+1)*16.
  B at base, INSERT/UPDATE v at base+1+v, DELETE at base+5, C at base+7.
Relation v1 at lsn=1; Relation v2 at base(k_evo)-4; optional TRUNCATE at
base(k_tr)-4 (strictly between two transactions, as in real WAL).
LSNs are globally unique and per-key monotone — the property the apply
stage's (lsn, seq) ordering relies on (reference relies on socket order,
``listener.go:364-386``).
"""

from __future__ import annotations

SLOT = 16
REL_ID = 1
SCHEMA_NAME = "public"
TABLE_NAME = "repos"
HOT_REPO = "org0/hot"
HOT_MOD = 3
REPO_MOD = 23
PROJ_MOD = 7
NVER_MOD = 3
TOAST_MOD = 5
DELETE_MOD = 11
STARS_MOD = 50
EPOCH = "2024-01-01 00:00:00"

# pgoutput type OIDs (reference: internal/listener/transaction/pg_type.go:5-21)
TEXT_OID = 25
INT4_OID = 23

BASE_COLUMNS = [
    # (name, type_oid, is_key)  — Relation v1
    ("repo", TEXT_OID, True),
    ("path", TEXT_OID, True),
    ("commit", TEXT_OID, False),
    ("lang", TEXT_OID, False),
    ("content", TEXT_OID, False),
]
EVOLVED_COLUMNS = BASE_COLUMNS + [("stars", INT4_OID, False)]


def base_lsn(k: int) -> int:
    return (k + 1) * SLOT


def n_ver(k: int) -> int:
    return 1 + k % NVER_MOD


def is_toast(k: int, v: int) -> bool:
    return v > 0 and (k + v) % TOAST_MOD == 0


def is_delete(k: int) -> bool:
    return k % DELETE_MOD == 0


def relation_v2_lsn(k_evo: int) -> int:
    return base_lsn(k_evo) - 4


def truncate_lsn(k_tr: int) -> int:
    return base_lsn(k_tr) - 4
