"""Table profiling: per-column statistics in ONE pass — the data-
quality observability primitive a 100 TB ingest pipeline runs before
and after every transformation batch.

Output is long-form ``(column, stat, value: double)`` so the profile
of any table has one fixed schema (monitoring systems diff profiles
across runs; a wide per-table schema would break on every new column).

Shape: a single ``agg`` computes every (column × stat) cell — one scan,
one partial+final aggregate, no shuffle beyond the 1-row combine — and
the wide 1-row result is unpivoted driver-side into the long frame
(cells = columns × stats, a few dozen values; the stack() happens on a
1-row DataFrame, so the "reshape" is free).

Stats: nulls, distinct (exact — swap in approx_count_distinct at
scale), min/max/mean for numerics, min/max/avg length for strings.
All exact-arithmetic so a SQL oracle matches bit-for-bit.

Reference parity: the closest artifact is the driver's profile-info
packet (rows/bytes/blocks, vendor/.../clickhouse_profile_info.go:3) —
a per-query counter, not a data profile; this operator is part of the
training-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _cells(df: DataFrame) -> list[tuple[str, str, Column]]:
    """Cell expressions against POSITIONAL column refs (_p0, _p1, ...):
    the caller renames the frame first, so exotic source column names
    (quotes, backticks) never reach a column parser — they appear only
    as escaped string labels in the output."""
    cells: list[tuple[str, str, Column]] = []
    for i, field in enumerate(df.schema.fields):
        c = F.col(f"_p{i}")
        cells.append((field.name, "n_null", F.count_if(c.isNull()).cast("double")))
        cells.append(
            (field.name, "n_distinct", F.count_distinct(c).cast("double"))
        )
        if isinstance(field.dataType, NUMERIC_TYPES):
            cells.append((field.name, "min", F.min(c).cast("double")))
            cells.append((field.name, "max", F.max(c).cast("double")))
            cells.append((field.name, "mean", F.avg(c).cast("double")))
        elif isinstance(field.dataType, T.StringType):
            cells.append((field.name, "min_len", F.min(F.length(c)).cast("double")))
            cells.append((field.name, "max_len", F.max(F.length(c)).cast("double")))
            cells.append((field.name, "avg_len", F.avg(F.length(c)).cast("double")))
        elif isinstance(
            field.dataType, (T.DateType, T.TimestampType, T.TimestampNTZType)
        ):
            cells.append(
                (field.name, "min_epoch",
                 F.unix_timestamp(F.min(c).cast("timestamp")).cast("double"))
            )
            cells.append(
                (field.name, "max_epoch",
                 F.unix_timestamp(F.max(c).cast("timestamp")).cast("double"))
            )
    return cells


def profile_table(df: DataFrame, round_to: int = 6) -> DataFrame:
    """One-pass profile: ``(column, stat, value)`` rows, values rounded
    to ``round_to`` decimals (means are the only non-exact cell)."""
    cells = _cells(df)
    df = df.toDF(*[f"_p{i}" for i in range(len(df.columns))])
    wide = df.agg(
        *[
            F.round(expr, round_to).alias(f"{i}")
            for i, (_, _, expr) in enumerate(cells)
        ]
    )

    def _q(s: str) -> str:
        # column names land in the stack() SQL as string literals —
        # escape quote/backslash so exotic names (quotes, backticks)
        # can't break or shift the labels
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack_args = ", ".join(
        f"{_q(col)}, {_q(stat)}, `{i}`" for i, (col, stat, _) in enumerate(cells)
    )
    return wide.select(
        F.expr(
            f"stack({len(cells)}, {stack_args}) AS (column, stat, value)"
        )
    )
