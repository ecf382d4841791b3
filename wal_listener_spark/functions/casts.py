"""pgoutput OID -> typed-value cast matrix, as Catalyst expressions.

Mirrors the reference's ``Column.AssertValue`` dispatch
(``/root/reference/internal/listener/transaction/data.go:59-125``, OIDs in
``pg_type.go:5-21``). pgoutput delivers every cell as text (`t` tuples,
``parser.go:325-344``); this module turns a text column into its typed
Spark column. All casts are built-in Catalyst try_cast expressions
(ANSI-safe: malformed input yields NULL, mirroring the reference's
log-and-continue permissive decode) — whole-stage
codegen'd, no Python in the hot path.

Parity decisions (SURVEY.md §1.2):
 - date (1082) / time (1083) stay strings, as the reference keeps them
   (``data.go:90-91``).
 - uuid (2950) normalizes to lower-case canonical text.
 - jsonb (3802) NORMALIZES: ``to_json(try_parse_json(x))`` — parse to
   the VARIANT type, re-serialize minified with object keys sorted.
   That is byte-for-byte what the reference does (``data.go:94-104``
   unmarshals into Go maps and later re-marshals; Go map JSON encoding
   sorts keys). Malformed JSON -> NULL (the reference logs the
   unmarshal error and keeps the zero value). Caveat vs the wire text:
   number formatting follows the parser (e.g. ``1.50`` -> ``1.5``), as
   it does in Go.
 - unknown OIDs fall through to string (``data.go:105-113``).
 - parse failures yield NULL (Spark cast semantics) rather than aborting
   the stream; the reference logs and keeps a zero value
   (``data.go:115-124``) — both are "permissive decode", and our
   problematic rows are countable via ``isnull`` metrics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BOOL_OID = 16
INT8_OID = 20
INT2_OID = 21
INT4_OID = 23
TEXT_OID = 25
VARCHAR_OID = 1043
DATE_OID = 1082
TIME_OID = 1083
TIMESTAMP_OID = 1114
TIMESTAMPTZ_OID = 1184
UUID_OID = 2950
JSONB_OID = 3802

#: OID -> Spark SQL type name the cast produces (used for lake schemas)
OID_SPARK_TYPE: dict[int, str] = {
    BOOL_OID: "boolean",
    INT2_OID: "smallint",
    INT4_OID: "int",
    INT8_OID: "bigint",
    TEXT_OID: "string",
    VARCHAR_OID: "string",
    DATE_OID: "string",
    TIME_OID: "string",
    TIMESTAMP_OID: "timestamp_ntz",
    TIMESTAMPTZ_OID: "timestamp",
    UUID_OID: "string",
    JSONB_OID: "string",
}


def spark_type_for_oid(oid: int) -> str:
    return OID_SPARK_TYPE.get(oid, "string")


def cast_text_value(col: Column, oid: int) -> Column:
    """Typed cast of a pgoutput text cell, per the reference matrix."""
    if oid == BOOL_OID:
        # strconv.ParseBool accepts 1/t/T/TRUE/true/True and the f-forms
        # (data.go:78-79); Spark's boolean cast accepts the same set.
        return col.try_cast("boolean")
    if oid == INT2_OID:
        return col.try_cast("smallint")
    if oid == INT4_OID:
        return col.try_cast("int")
    if oid == INT8_OID:
        return col.try_cast("bigint")
    if oid == TIMESTAMP_OID:
        # layout '2006-01-02 15:04:05[.ffffff]' (data.go:73,86-87)
        return col.try_cast("timestamp_ntz")
    if oid == TIMESTAMPTZ_OID:
        # layout with offset, parsed into UTC (data.go:74,88-89)
        return col.try_cast("timestamp")
    if oid == UUID_OID:
        # uuid.Parse canonicalizes case (data.go:92-93)
        return F.lower(col)
    if oid == JSONB_OID:
        # unmarshal/remarshal normalization (data.go:94-104): minified,
        # object keys sorted — Go-map-marshal parity (module docstring)
        return F.to_json(F.try_parse_json(col))
    # text/varchar/date/time/unknown -> string passthrough
    return col
