"""Replicates the driver's correctness gate: every declared query runs
on Spark AND its DuckDB oracle at sf0.01, and the results are
canonicalized the way the DRIVER canonicalizes them — both sides become
pandas DataFrames, columns reindexed in sorted order, rows sorted via
``DataFrame.sort_values`` over every column (which raises on
list-valued cells, exactly like the driver's ``_canon``), and cells
compared with a dtype-sensitive rendering (``3`` int64 != ``3.0``
float64, ``date`` != ``datetime64``, ``Decimal`` != float). Round 6
shipped 11 driver-red rows that the old ``str()``-based local gate
waved through; this gate exists so that class cannot recur.

Additionally: no registered query may emit ArrayType/MapType (the
driver's pandas sort crashes on them) or DecimalType (pandas renders it
as ``object`` and the hash diverges from the oracle's float64) — pinned
for every query in the registry, including rows-only ones.
"""

from __future__ import annotations

import datetime
import decimal
import math

import pytest

from conftest import SF_ORACLE


def _cell(v):
    """Dtype-sensitive canonical rendering of one pandas cell.

    Distinguishes every class the driver's hash distinguishes:
    int vs float (``3`` vs ``3.0``), date vs timestamp (bare ISO date
    vs ``T``-separated datetime), Decimal (tagged), bool, NaN vs NULL.
    """
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, (np.bool_, bool)):
        return "true" if v else "false"
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        # DuckDB's .df() renders DATE as datetime64 (pandas has no
        # date dtype) while Spark hands back datetime.date objects;
        # driver evidence (ch_sql_round6b_functions, ch_sql_file_read
        # green in r6) shows its hash treats midnight-timestamp and
        # date as EQUAL — so render midnight naive timestamps as the
        # bare date. Second-precision contract otherwise.
        if (
            v.tzinfo is None
            and v.hour == 0
            and v.minute == 0
            and v.second == 0
            and v.microsecond == 0
        ):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray, dict)):
        raise TypeError(
            f"unhashable container in result cell: {type(v).__name__}"
        )
    return str(v)


def canonical(pdf):
    """Driver-faithful canonical form: columns sorted by name, rows
    sorted by pandas ``sort_values`` over all columns (raises
    TypeError on list cells, as the driver does), cells rendered
    dtype-sensitively."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf.columns) and len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    rows = [tuple(_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    rows.sort()  # tie-break on the rendered form for full determinism
    return list(pdf.columns), rows


def _queries():
    from baseline_magician_spark.registry import get_oracles, get_queries

    q = get_queries()
    o = get_oracles()
    return q, o


QUERIES, ORACLES = _queries()

_FORBIDDEN_TYPES = ("array<", "map<", "struct<", "decimal(")


def _assert_driver_safe_schema(name, sdf):
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if any(t in f.dataType.simpleString() for t in _FORBIDDEN_TYPES)
    ]
    assert not bad, (
        f"{name}: output schema contains driver-unsafe column types "
        f"(pandas canonicalizer crashes or dtype-diverges): {bad}"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    fn = QUERIES[name]
    sdf = fn(spark, SF_ORACLE)
    _assert_driver_safe_schema(name, sdf)
    spark_pdf = sdf.toPandas()

    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op) — but the driver
        # still touches the frame, so the schema pin above applies.
        assert len(spark_pdf) >= 0
        return

    duck_pdf = duck.execute(ORACLES[name]).df()

    s_cols, s_rows = canonical(spark_pdf)
    d_cols, d_rows = canonical(duck_pdf)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
