"""CH-dialect INSERT (plans/ch_insert.py): the reference driver's
isInsert routing (ch/helpers.go:115-120), VALUES block semantics with
per-row placeholder binding (ch/stmt.go:53-68), and INSERT SELECT as a
server-side query."""

from __future__ import annotations

import tempfile

import pytest


@pytest.fixture()
def tabs(spark):
    t = spark.createDataFrame(
        [(1, "a", 1.5)], "id long, name string, v double"
    )
    s = spark.createDataFrame(
        [(7, "x"), (8, "y")], "id long, name string"
    )
    return {"t": t, "s": s}


def test_is_insert_matches_reference_rule():
    from baseline_magician_spark.plans.ch_insert import is_insert_values

    assert is_insert_values("INSERT INTO t VALUES (1)")
    assert is_insert_values("insert into db.t (a, b) values (1, 2)")
    assert not is_insert_values("INSERT INTO t SELECT * FROM s")
    assert not is_insert_values("SELECT 1")
    assert not is_insert_values("INSERT INTO")  # <= 2 fields
    # the reference's regex quirk: a literal containing " SELECT "
    # routes to the query path (documented bit-parity)
    assert not is_insert_values("INSERT INTO t VALUES (' SELECT ')")


def test_values_literals_cast_to_target_schema(spark, tabs):
    from baseline_magician_spark.plans.ch_insert import run_ch_insert

    out = run_ch_insert(
        "INSERT INTO t VALUES (2, 'b', -3.5), (3, 'c''s', 4)", tabs
    )
    assert out.schema == tabs["t"].schema
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [(2, "b", -3.5), (3, "c's", 4.0)]


def test_values_placeholder_rows_exec_loop(spark, tabs):
    from baseline_magician_spark.plans.ch_insert import run_ch_insert

    out = run_ch_insert(
        "INSERT INTO t (id, name) VALUES (?, ?)",
        tabs,
        rows=[(10, "p"), (11, "q")],
    )
    assert sorted(tuple(r) for r in out.collect()) == [
        (10, "p"),
        (11, "q"),
    ]
    with pytest.raises(ValueError, match="pass rows="):
        run_ch_insert("INSERT INTO t (id) VALUES (?)", tabs)
    with pytest.raises(ValueError, match="arity"):
        run_ch_insert(
            "INSERT INTO t (id, name) VALUES (?, ?)", tabs, rows=[(1,)]
        )


def test_insert_select_maps_positionally(spark, tabs):
    from baseline_magician_spark.plans.ch_insert import run_ch_insert

    out = run_ch_insert(
        "INSERT INTO t (id, name, v) "
        "SELECT id + ?, name, id * 1.0 FROM s",
        tabs,
        args=(100,),
    )
    assert out.columns == ["id", "name", "v"]
    assert sorted(tuple(r) for r in out.collect()) == [
        (107, "x", 7.0),
        (108, "y", 8.0),
    ]


def test_parquet_sink_write_and_readback(spark, tabs):
    from baseline_magician_spark.plans.ch_insert import run_ch_insert

    d = tempfile.mkdtemp()
    run_ch_insert(
        "INSERT INTO t SELECT id, name, id * 2.0 FROM s",
        tabs,
        path=d,
        mode="overwrite",
    )
    run_ch_insert(
        "INSERT INTO t VALUES (99, 'z', 0.5)", tabs, path=d, mode="append"
    )
    back = spark.read.parquet(d)
    assert back.schema == tabs["t"].schema
    assert sorted(tuple(r) for r in back.collect()) == [
        (7, "x", 14.0),
        (8, "y", 16.0),
        (99, "z", 0.5),
    ]


def test_values_literal_containing_select_still_executes(spark, tabs):
    """The isInsert regex routes a VALUES statement whose string
    literal contains " SELECT " to the query path (reference quirk) —
    but the reference SERVER still executes the INSERT, so the
    statement must succeed here too via the VALUES fallback."""
    from baseline_magician_spark.plans.ch_insert import (
        is_insert_values,
        run_ch_insert,
    )

    sql = "INSERT INTO t VALUES (42, ' SELECT ', 1.0)"
    assert not is_insert_values(sql)  # routing parity: query path
    out = run_ch_insert(sql, tabs)
    assert sorted(tuple(r) for r in out.collect()) == [
        (42, " SELECT ", 1.0)
    ]


def test_bad_statements_rejected(spark, tabs):
    from baseline_magician_spark.plans.ch_insert import run_ch_insert

    with pytest.raises(ValueError, match="unknown table"):
        run_ch_insert("INSERT INTO nope VALUES (1)", tabs)
    with pytest.raises(ValueError, match="unknown column"):
        run_ch_insert("INSERT INTO t (bogus) VALUES (1)", tabs)
    with pytest.raises(ValueError, match="VALUES arity"):
        run_ch_insert("INSERT INTO t VALUES (1, 'a')", tabs)
    with pytest.raises(ValueError, match="tail must be"):
        run_ch_insert("INSERT INTO t SET x = 1 SELECT ", tabs)


def test_run_ch_statement_dispatch(spark, tabs):
    from baseline_magician_spark.plans.ch_insert import run_ch_statement

    out = run_ch_statement(
        "SELECT count(*) AS n FROM t WHERE id = 1", tabs
    )
    assert out.first()["n"] == 1
    out = run_ch_statement(
        "insert into t (id, name) values (5, 'e')", tabs
    )
    assert sorted(tuple(r) for r in out.collect()) == [(5, "e")]
    with pytest.raises(ValueError, match="INSERT or DDL statements only"):
        run_ch_statement("SELECT 1 AS x", tabs, path="/tmp/x")
