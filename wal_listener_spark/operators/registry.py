"""Relation registry — the schema cache driven by pgoutput 'R' messages.

The reference keeps a ``RelationStore: map[int32]RelationData`` that is
populated by Relation messages and survives transaction clears
(``/root/reference/internal/listener/transaction/wal.go:27,48-52``,
populated at ``parser.go:71-93``). Data tuples are zipped with the
relation's column list *by ordinal* and typed-cast per OID
(``wal.go:63-114`` CreateActionData; unknown relation =>
errRelationNotFound ``wal.go:32``).

Spark-first re-expression: Relation rows are a tiny control stream —
collect them on the driver, keep a broadcast-sized registry dict, and
drive (a) the typed projection of the value maps and (b) lake-table
schema evolution (later Relation versions adding columns => ALTER/add
column). The data-plane "join" of events x registry is a constant-folded
projection, not a shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import casts


@dataclass
class RelationSchema:
    rel_id: int
    schema_name: str
    table_name: str
    #: ordered (name, type_oid, is_key); order = pgoutput ordinal order
    columns: list[tuple[str, int, bool]]
    #: lsn of the Relation message that produced this version
    lsn: int = 0

    @property
    def key_columns(self) -> list[str]:
        return [c[0] for c in self.columns if c[2]]

    @property
    def value_columns(self) -> list[str]:
        return [c[0] for c in self.columns if not c[2]]

    @property
    def qualified_name(self) -> str:
        return f"{self.schema_name}_{self.table_name}"

    def oid_of(self, name: str) -> int:
        for c in self.columns:
            if c[0] == name:
                return c[1]
        raise KeyError(name)

    def spark_fields(self) -> list[tuple[str, str]]:
        return [(n, casts.spark_type_for_oid(oid)) for n, oid, _ in self.columns]

    def to_json_dict(self) -> dict:
        return {
            "rel_id": self.rel_id,
            "schema_name": self.schema_name,
            "table_name": self.table_name,
            "columns": [list(c) for c in self.columns],
            "lsn": self.lsn,
        }

    @staticmethod
    def from_json_dict(d: dict) -> "RelationSchema":
        return RelationSchema(
            rel_id=d["rel_id"],
            schema_name=d["schema_name"],
            table_name=d["table_name"],
            columns=[tuple(c) for c in d["columns"]],
            lsn=d.get("lsn", 0),
        )


@dataclass
class RelationRegistry:
    """rel_id -> latest RelationSchema; persists across micro-batches
    (the RelationStore survives ``WAL.Clear()`` — wal.go:48-52).

    ``history`` additionally keeps every distinct schema VERSION per
    relation (ordered by the R message's LSN). The reference replaces
    the whole RelationData on every R message (parser.go:71-93), so a
    same-arity column RENAME resolves correctly there; keeping the
    version history lets resolve_names pick the version in force at
    each frame's LSN and match that behavior — not just additive
    evolution. History grows only when the schema actually changes
    (identical re-sent R messages fold into the current version)."""

    relations: dict[int, RelationSchema] = field(default_factory=dict)
    history: dict[int, list[RelationSchema]] = field(default_factory=dict)

    def versions_of(self, rel_id: int) -> list[RelationSchema]:
        """All known schema versions for a relation, oldest first.
        Registries seeded directly via ``relations`` (tests, manual
        bootstrap) fall back to their single latest version."""
        hist = self.history.get(rel_id)
        if hist:
            return hist
        s = self.relations.get(rel_id)
        return [s] if s is not None else []

    def update_from_trace(self, trace: DataFrame) -> "RelationRegistry":
        """Fold this batch's 'R' rows (tiny control stream) into the
        registry. Later versions replace earlier; a version that only
        *adds* columns is schema evolution (SURVEY.md §2.2 P4)."""
        rel_rows = (
            trace.filter(F.col("op") == "R")
            .select("lsn", "rel_id", "schema_name", "table_name", "rel_columns")
            .orderBy("lsn")
            .collect()
        )
        return self.update_from_rows(rel_rows)

    def update_from_rows(self, rel_rows) -> "RelationRegistry":
        """Same fold from already-collected rows (driver-side), used when
        the R rows ride a combined control-plane aggregate."""
        rel_rows = sorted(rel_rows, key=lambda r: r["lsn"])
        for r in rel_rows:
            cols = [(c["name"], c["type_oid"], c["is_key"]) for c in r["rel_columns"]]
            cur = self.relations.get(r["rel_id"])
            if cur is not None and cur.lsn >= r["lsn"]:
                continue
            s = RelationSchema(
                rel_id=r["rel_id"],
                schema_name=r["schema_name"],
                table_name=r["table_name"],
                columns=cols,
                lsn=r["lsn"],
            )
            hist = self.history.setdefault(r["rel_id"], [cur] if cur else [])
            # identical re-sent R (session start re-announces relations):
            # the existing version continues — keep its ORIGINAL lsn,
            # which anchors the version's validity-range start
            if not (hist and hist[-1].columns == s.columns):
                hist.append(s)
            self.relations[r["rel_id"]] = s
        return self

    def to_json(self) -> list[dict]:
        """Every version, oldest-first per relation (bounded: versions
        append only on actual schema change). Older manifests carrying
        one entry per relation load unchanged through from_json."""
        out: list[dict] = []
        for rel_id in self.relations:
            out.extend(s.to_json_dict() for s in self.versions_of(rel_id))
        return out

    @staticmethod
    def from_json(items: list[dict]) -> "RelationRegistry":
        reg = RelationRegistry()
        for d in sorted(items or [], key=lambda d: d.get("lsn", 0)):
            s = RelationSchema.from_json_dict(d)
            reg.relations[s.rel_id] = s
            hist = reg.history.setdefault(s.rel_id, [])
            if not (hist and hist[-1].columns == s.columns):
                hist.append(s)
        return reg


def typed_changes(trace: DataFrame, schema: RelationSchema) -> DataFrame:
    """Project one relation's I/U/D/T rows from text maps to typed columns.

    The Spark analog of CreateActionData (wal.go:63-114): the registry
    lookup is driver-side (broadcast-sized), the per-column extraction +
    OID cast is pure Catalyst — codegen'd, zero Python. Unknown-relation
    rows are the caller's quarantine concern (see pipeline.quarantine).

    Output: lsn, tx_id, seq, op, plus one typed column per relation
    column (key columns resolved from old_vals for U/D when present —
    parser.go:227-241 K/O old-tuple handling), plus toast_cols.
    """
    df = trace.filter(
        (F.col("op").isin("I", "U", "D", "T")) & (F.col("rel_id") == schema.rel_id)
    )
    proj = [
        F.col("lsn"),
        F.col("tx_id"),
        F.col("seq"),
        F.col("op"),
        F.col("commit_ts"),
        F.coalesce(F.col("toast_cols"), F.array().cast("array<string>")).alias(
            "toast_cols"
        ),
    ]
    for name, oid, is_key in schema.columns:
        new_v = F.col("new_vals").getItem(name)
        old_v = F.col("old_vals").getItem(name)
        raw = F.coalesce(new_v, old_v) if is_key else new_v
        proj.append(casts.cast_text_value(raw, oid).alias(name))
    return df.select(*proj)
