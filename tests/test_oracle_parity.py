"""Replicates the driver's correctness gate: every declared query runs
on Spark AND its DuckDB oracle at sf0.01; row counts, column names, and
values must match exactly (order-insensitive, columns sorted by name).
"""

from __future__ import annotations

import math

import pytest

from conftest import SF_ORACLE


def canonical(rows, columns):
    """Order-insensitive canonical form: columns sorted by name, rows
    sorted by string key, values normalized (floats via repr, ns->µs
    safe timestamps via isoformat)."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        if isinstance(v, bool):
            return "true" if v else "false"
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    out.sort()
    return sorted(c for c in columns), out


def _queries():
    from baseline_magician_spark.registry import get_oracles, get_queries

    q = get_queries()
    o = get_oracles()
    return q, o


QUERIES, ORACLES = _queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    fn = QUERIES[name]
    sdf = fn(spark, SF_ORACLE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert len(spark_rows) >= 0
        return

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]

    s_cols, s_rows = canonical(spark_rows, spark_cols)
    d_cols, d_rows = canonical(duck_rows, duck_cols)

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
