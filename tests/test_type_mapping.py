"""ClickHouse type-system mapping (SURVEY §1.3): the Spark types chosen
for each CH type must round-trip through parquet and interop with
DuckDB reading the same files — decimals stay exact, nested arrays and
tuples (structs) survive, nullables keep their nulls, UInt64 maps to
Decimal(20,0) without overflow."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def typed_df(spark):
    schema = T.StructType(
        [
            T.StructField("i8", T.ByteType()),            # Int8
            T.StructField("i64", T.LongType()),           # Int64
            T.StructField("u64", T.DecimalType(20, 0)),   # UInt64 (> int64 max)
            T.StructField("f64", T.DoubleType()),         # Float64
            T.StructField("s", T.StringType()),           # String
            T.StructField("d", T.DateType()),             # Date
            T.StructField("ts", T.TimestampType()),       # DateTime
            T.StructField("dec", T.DecimalType(38, 10)),  # Decimal128
            T.StructField("nul", T.StringType(), True),   # Nullable(String)
            T.StructField("arr", T.ArrayType(T.ArrayType(T.LongType()))),  # Array(Array(Int64))
            T.StructField(
                "tup",
                T.StructType(
                    [
                        T.StructField("a", T.LongType()),
                        T.StructField("b", T.StringType()),
                    ]
                ),
            ),                                            # Tuple(Int64, String)
            T.StructField("ip6", T.BinaryType()),         # IPv6 (16 bytes)
        ]
    )
    import datetime

    rows = [
        (
            -128,
            2**62,
            Decimal(2**64 - 1),             # max UInt64 — overflows int64
            3.5,
            "héllo",
            datetime.date(2024, 1, 5),
            datetime.datetime(2024, 1, 5, 12, 30, 45, 123456),
            Decimal("12345678901234567890.1234567890"),
            None,
            [[1, 2], [3]],
            (7, "x"),
            bytes(range(16)),
        ),
    ]
    return spark.createDataFrame(rows, schema)


def test_roundtrip_parquet(spark, typed_df, tmp_path):
    path = str(tmp_path / "typed")
    typed_df.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert back.schema == typed_df.schema
    a, b = typed_df.first(), back.first()
    assert a == b
    assert b.u64 == Decimal(2**64 - 1)          # no overflow
    assert b.dec == Decimal("12345678901234567890.1234567890")
    assert b.arr == [[1, 2], [3]]
    assert b.tup.a == 7 and b.tup.b == "x"
    assert bytes(b.ip6) == bytes(range(16))
    assert b.nul is None


def test_duckdb_interop(spark, typed_df, tmp_path):
    import duckdb

    path = str(tmp_path / "typed_interop")
    typed_df.write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    r = con.execute(
        f"SELECT u64, dec, arr, tup.a, tup.b, nul IS NULL "
        f"FROM read_parquet('{path}/*.parquet')"
    ).fetchone()
    assert r[0] == Decimal(2**64 - 1)
    assert r[1] == Decimal("12345678901234567890.1234567890")
    assert r[2] == [[1, 2], [3]]
    assert (r[3], r[4], r[5]) == (7, "x", True)


def test_decimal_arithmetic_exact(spark, typed_df):
    # within precision bounds decimal arithmetic is exact; at the
    # decimal(38,10)+decimal(38,10) ceiling Spark promotes to (38,9)
    # (precision is capped at 38, scale gives way) — CH Decimal128
    # overflows there instead, a documented divergence.
    out = typed_df.select(
        (
            F.lit(Decimal("12345.1234567890")).cast("decimal(20,10)")
            + F.lit(Decimal("0.0000000001")).cast("decimal(20,10)")
        ).alias("x"),
        (F.col("dec") + F.col("dec")).alias("capped"),
    ).first()
    assert out.x == Decimal("12345.1234567891")
    assert out.capped == Decimal("24691357802469135780.246913578")  # scale 9
