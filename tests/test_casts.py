"""OID cast-matrix parity — mirrors the reference's AssertValue table tests
(``/root/reference/internal/listener/transaction/wal_test.go:160-429``):
same (oid, text-in) vectors, typed values out."""

import datetime

import pytest
from pyspark.sql import functions as F

from wal_listener_spark.functions import casts


def _cast_one(spark, text, oid):
    df = spark.createDataFrame([(text,)], "v string")
    return df.select(casts.cast_text_value(F.col("v"), oid).alias("out")).collect()[0][
        "out"
    ]


@pytest.mark.parametrize(
    "oid,text,expected",
    [
        (casts.BOOL_OID, "t", True),       # data.go:78-79 strconv.ParseBool
        (casts.BOOL_OID, "f", False),
        (casts.BOOL_OID, "true", True),
        (casts.INT2_OID, "12", 12),        # data.go:80-81
        (casts.INT4_OID, "-7", -7),
        (casts.INT8_OID, "9223372036854775807", 9223372036854775807),  # data.go:82-83
        (casts.TEXT_OID, "hello", "hello"),  # data.go:84-85 identity
        (casts.VARCHAR_OID, "varchar", "varchar"),
        (casts.DATE_OID, "2022-08-27", "2022-08-27"),  # stays string, data.go:90-91
        (casts.TIME_OID, "17:44:58", "17:44:58"),
        (
            casts.UUID_OID,
            "600F37ED-1D88-4262-8BE4-C3360E833F50",
            "600f37ed-1d88-4262-8be4-c3360e833f50",  # data.go:92-93 canonical
        ),
        # unmarshal/remarshal normalization: minified, keys sorted
        # (Go-map-marshal parity, data.go:94-104)
        (casts.JSONB_OID, '{"b": 1, "a": [true, null]}', '{"a":[true,null],"b":1}'),
        (casts.JSONB_OID, '["a", "b"]', '["a","b"]'),
        (casts.JSONB_OID, "not json{", None),  # permissive decode -> NULL
        (9999, "unknown-oid-value", "unknown-oid-value"),  # data.go:105-113
    ],
)
def test_cast_matrix(spark, oid, text, expected):
    assert _cast_one(spark, text, oid) == expected


def test_timestamp_cast(spark):
    # layout '2006-01-02 15:04:05' (data.go:73,86-87), no zone
    out = _cast_one(spark, "2022-08-27 17:44:01", casts.TIMESTAMP_OID)
    assert out == datetime.datetime(2022, 8, 27, 17, 44, 1)


def test_timestamptz_cast_utc(spark):
    # '...-07' style offset parsed into UTC (data.go:74,88-89)
    out = _cast_one(spark, "2022-08-27 17:44:58.083316+00", casts.TIMESTAMPTZ_OID)
    assert out.replace(tzinfo=None) == datetime.datetime(2022, 8, 27, 17, 44, 58, 83316)
    out2 = _cast_one(spark, "2022-08-27 17:44:58+02", casts.TIMESTAMPTZ_OID)
    assert out2.replace(tzinfo=None) == datetime.datetime(2022, 8, 27, 15, 44, 58)


def test_null_and_parse_error(spark):
    # null tuple cell -> SQL NULL (parser.go:333-334); parse error ->
    # permissive NULL (reference logs + keeps zero value, data.go:115-124)
    assert _cast_one(spark, None, casts.INT4_OID) is None
    assert _cast_one(spark, "not-a-number", casts.INT4_OID) is None
