"""local_relation must be value-identical to createDataFrame(rows, schema).

The Arrow-batch construction path must never diverge from the row path:
the lakehouse file maps carry partition literals of every primitive
type, and a silent coercion difference (int→float, NaN→0, bytes→str)
would corrupt partition reattachment or DV offsets. repr-compare, the
same standard the oracle checker applies.
"""

import datetime
import decimal

from pyspark.sql import types as T

from spark_etl_framework_spark.localrel import local_relation

SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType()),
        T.StructField("i", T.LongType()),
        T.StructField("d", T.DateType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("dec", T.DecimalType(10, 2)),
        T.StructField("b", T.BinaryType()),
        T.StructField("arr", T.ArrayType(T.StringType())),
    ]
)

ROWS = [
    (
        "a",
        1,
        datetime.date(2020, 1, 1),
        datetime.datetime(2020, 1, 1, 12, 0, 0),
        decimal.Decimal("1.25"),
        b"\x00\x01",
        ["x", "y"],
    ),
    (None, None, None, None, None, None, []),
    (
        "c",
        9007199254740993,  # > 2^53: would corrupt through a float path
        datetime.date(1970, 1, 1),
        datetime.datetime(1999, 12, 31, 23, 59, 59, 123456),
        decimal.Decimal("-7.50"),
        b"",
        None,
    ),
]


def test_matches_row_path_exactly(spark):
    ref = sorted(map(repr, spark.createDataFrame(ROWS, SCHEMA).collect()))
    got = sorted(map(repr, local_relation(spark, ROWS, SCHEMA).collect()))
    assert ref == got


def test_ddl_string_schema(spark):
    ddl = "a string, b long"
    rows = [("x", 1), (None, None)]
    ref = sorted(map(repr, spark.createDataFrame(rows, ddl).collect()))
    got = sorted(map(repr, local_relation(spark, rows, ddl).collect()))
    assert ref == got


def test_empty_rows(spark):
    df = local_relation(spark, [], SCHEMA)
    assert df.count() == 0
    assert df.schema == SCHEMA


def test_works_without_arrow_conf(spark):
    # the driver's vanilla session has no Arrow conf: the pandas path
    # falls back to row conversion — must stay exact
    old = spark.conf.get("spark.sql.execution.arrow.pyspark.enabled")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    try:
        ref = sorted(map(repr, spark.createDataFrame(ROWS, SCHEMA).collect()))
        got = sorted(
            map(repr, local_relation(spark, ROWS, SCHEMA).collect())
        )
        assert ref == got
    finally:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", old)
