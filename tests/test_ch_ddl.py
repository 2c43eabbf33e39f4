"""CH-dialect DDL (plans/ch_ddl.py): CREATE [TEMPORARY] TABLE /
CREATE VIEW / DROP against the statement-level table env, including
parquet persistence through the sink path."""

from __future__ import annotations

import shutil
import tempfile

import pytest


@pytest.fixture()
def tabs(spark):
    t = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "id long, grp string, v double",
    )
    return {"t": t}


def test_create_table_as_select_registers_and_queries(spark, tabs):
    from baseline_magician_spark.plans.ch_insert import run_ch_statement

    made = run_ch_statement(
        "CREATE TEMPORARY TABLE agg AS "
        "SELECT grp, count(*) AS n, sum(v) AS s FROM t GROUP BY grp",
        tabs,
    )
    assert "agg" in tabs  # env mutated in place (CH session scoping)
    rows = run_ch_statement(
        "SELECT grp, n, s FROM agg ORDER BY grp", tabs
    ).collect()
    assert [tuple(r) for r in rows] == [("a", 2, 40.0), ("b", 1, 20.0)]
    assert made.columns == ["grp", "n", "s"]


def test_create_view_and_engine_clause(spark, tabs):
    from baseline_magician_spark.plans.ch_insert import run_ch_statement

    run_ch_statement(
        "CREATE VIEW big AS SELECT id FROM t WHERE v >= 20", tabs
    )
    assert [r["id"] for r in tabs["big"].orderBy("id").collect()] == [2, 3]
    # ENGINE clauses parse and are ignored (storage is a sink concern)
    run_ch_statement(
        "CREATE TABLE eng ENGINE = MergeTree() AS SELECT id FROM t",
        tabs,
    )
    assert tabs["eng"].count() == 3


def test_create_conflicts_and_modifiers(spark, tabs):
    from baseline_magician_spark.plans.ch_insert import run_ch_statement

    run_ch_statement("CREATE TABLE x AS SELECT id FROM t", tabs)
    with pytest.raises(ValueError, match="already exists"):
        run_ch_statement("CREATE TABLE x AS SELECT id FROM t", tabs)
    # IF NOT EXISTS: keeps the existing relation, does not re-plan
    before = tabs["x"]
    run_ch_statement(
        "CREATE TABLE IF NOT EXISTS x AS SELECT grp FROM t", tabs
    )
    assert tabs["x"] is before
    # OR REPLACE swaps it
    run_ch_statement(
        "CREATE OR REPLACE VIEW x AS SELECT grp FROM t", tabs
    )
    assert tabs["x"].columns == ["grp"]


def test_drop_table_and_if_exists(spark, tabs):
    from baseline_magician_spark.plans.ch_insert import run_ch_statement

    run_ch_statement("CREATE TABLE x AS SELECT id FROM t", tabs)
    out = run_ch_statement("DROP TABLE x", tabs)
    assert "x" not in tabs
    assert out.count() == 0 and out.columns == ["id"]
    with pytest.raises(ValueError, match="unknown table"):
        run_ch_statement("DROP TABLE x", tabs)
    assert run_ch_statement("DROP TABLE IF EXISTS x", tabs).count() == 0


def test_create_table_with_parquet_persistence(spark, tabs):
    from baseline_magician_spark.plans.ch_insert import run_ch_statement

    d = tempfile.mkdtemp()
    try:
        run_ch_statement(
            "CREATE TABLE persisted AS SELECT grp, sum(v) AS s "
            "FROM t GROUP BY grp",
            tabs,
            path=d,
        )
        # the env entry is the parquet READ-BACK, not the lazy plan
        back = spark.read.parquet(d)
        assert sorted(tuple(r) for r in back.collect()) == sorted(
            tuple(r) for r in tabs["persisted"].collect()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ddl_bind_params_and_bad_statements(spark, tabs):
    from baseline_magician_spark.plans.ch_insert import run_ch_statement

    run_ch_statement(
        "CREATE TABLE filt AS SELECT id FROM t WHERE v > ?",
        tabs,
        args=(15.0,),
    )
    assert tabs["filt"].count() == 2
    with pytest.raises(ValueError, match="cannot parse DDL"):
        run_ch_statement("CREATE DATABASE nope", tabs)
    with pytest.raises(ValueError, match="rows= applies"):
        run_ch_statement(
            "CREATE TABLE y AS SELECT id FROM t", tabs, rows=[(1,)]
        )


def test_alter_delete_and_update_mutations(spark, tabs):
    """ALTER TABLE DELETE/UPDATE — CH lightweight mutations as lazy
    env-entry rewrites (filter / conditional projection; nothing
    materializes until a query runs)."""
    from baseline_magician_spark.plans.ch_insert import run_ch_statement

    run_ch_statement("ALTER TABLE t DELETE WHERE v >= 30", tabs)
    rows = run_ch_statement("SELECT id FROM t ORDER BY id", tabs).collect()
    assert [r["id"] for r in rows] == [1, 2]

    run_ch_statement(
        "ALTER TABLE t UPDATE v = v * 10, grp = upper(grp) "
        "WHERE grp = 'a'",
        tabs,
    )
    rows = run_ch_statement(
        "SELECT id, grp, v FROM t ORDER BY id", tabs
    ).collect()
    assert [tuple(r) for r in rows] == [(1, "A", 100.0), (2, "b", 20.0)]
    # assigned expression casts to the column's type (CH semantics)
    run_ch_statement("ALTER TABLE t UPDATE id = v WHERE id = 2", tabs)
    assert dict(tabs["t"].dtypes)["id"] == "bigint"
    rows = run_ch_statement("SELECT id FROM t ORDER BY grp", tabs).collect()
    assert [r["id"] for r in rows] == [1, 20]


def test_alter_null_where_and_errors(spark, tabs):
    from baseline_magician_spark.plans.ch_insert import run_ch_statement

    t2 = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, g string"
    )
    tabs["t2"] = t2
    # NULL predicate rows survive DELETE (three-valued WHERE) and are
    # untouched by UPDATE
    run_ch_statement("ALTER TABLE t2 DELETE WHERE g = 'a'", tabs)
    rows = run_ch_statement("SELECT id FROM t2 ORDER BY id", tabs).collect()
    assert [r["id"] for r in rows] == [2, 3]
    run_ch_statement("ALTER TABLE t2 UPDATE g = 'x' WHERE g != 'b'", tabs)
    rows = run_ch_statement("SELECT id, g FROM t2 ORDER BY id", tabs).collect()
    assert [tuple(r) for r in rows] == [(2, None), (3, "b")]
    with pytest.raises(ValueError, match="unknown table"):
        run_ch_statement("ALTER TABLE nope DELETE WHERE 1 = 1", tabs)
    with pytest.raises(ValueError, match="unknown column"):
        run_ch_statement("ALTER TABLE t2 UPDATE zz = 1 WHERE id = 1", tabs)
    with pytest.raises(ValueError, match="cannot parse DDL"):
        run_ch_statement("ALTER TABLE t2 DELETE", tabs)  # WHERE mandatory


def test_truncate_rename_exchange_show(spark, tabs):
    from baseline_magician_spark.plans.ch_insert import run_ch_statement

    run_ch_statement(
        "CREATE TABLE u AS SELECT id, v FROM t WHERE v > 15", tabs
    )
    rows = run_ch_statement("SHOW TABLES", tabs).collect()
    assert [r["name"] for r in rows] == ["t", "u"]

    run_ch_statement("EXCHANGE TABLES t AND u", tabs)
    assert tabs["t"].columns == ["id", "v"] and tabs["u"].columns == [
        "id", "grp", "v"
    ]
    run_ch_statement("RENAME TABLE u TO orig", tabs)
    assert "u" not in tabs and "orig" in tabs
    with pytest.raises(ValueError, match="already exists"):
        run_ch_statement("RENAME TABLE t TO orig", tabs)

    run_ch_statement("TRUNCATE TABLE t", tabs)
    assert tabs["t"].count() == 0
    assert tabs["t"].columns == ["id", "v"]  # schema survives
    # IF EXISTS on a missing name succeeds; plain form raises
    run_ch_statement("TRUNCATE TABLE IF EXISTS ghost", tabs)
    with pytest.raises(ValueError, match="unknown table"):
        run_ch_statement("TRUNCATE TABLE ghost", tabs)


def test_describe_and_optimize_compaction(spark, tabs):
    import glob
    import shutil
    import tempfile

    from baseline_magician_spark.plans.ch_insert import run_ch_statement

    rows = run_ch_statement("DESCRIBE TABLE t", tabs).collect()
    assert [(r["name"], r["type"]) for r in rows] == [
        ("id", "Int64"), ("grp", "String"), ("v", "Float64")
    ]
    # OPTIMIZE without a path: pure no-op, relation untouched
    before = tabs["t"]
    out = run_ch_statement("OPTIMIZE TABLE t FINAL", tabs)
    assert tabs["t"] is before and out.count() == 0

    # with a path: many small files compact into few
    d = tempfile.mkdtemp(prefix="ch_opt_")
    try:
        src = f"{d}/src"
        spark.range(400).repartition(8).write.parquet(src)
        tabs["frag"] = spark.read.parquet(src)
        assert len(glob.glob(f"{src}/*.parquet")) == 8
        run_ch_statement(
            "OPTIMIZE TABLE frag FINAL", tabs, path=f"{d}/opt"
        )
        assert len(glob.glob(f"{d}/opt/*.parquet")) < 8
        assert tabs["frag"].count() == 400  # compacted read-back swapped in
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --- round-6m: schema-first CREATE, MATERIALIZED VIEW, ALTER COLUMN ------


def test_create_table_schema_first(spark, tabs):
    from baseline_magician_spark.plans.ch_ddl import run_ch_ddl

    df = run_ch_ddl(
        "CREATE TABLE metrics (host String, ts DateTime,"
        " v Decimal(10, 2) DEFAULT 0, tags Array(String))"
        " ENGINE = MergeTree() ORDER BY (host, ts)",
        tabs,
    )
    assert df.count() == 0
    assert dict(df.dtypes) == {
        "host": "string", "ts": "timestamp",
        "v": "decimal(10,2)", "tags": "array<string>",
    }
    assert "metrics" in tabs


def test_create_materialized_view_is_snapshot(spark, tabs):
    from baseline_magician_spark.plans.ch_ddl import run_ch_ddl

    run_ch_ddl(
        "CREATE MATERIALIZED VIEW mv AS"
        " SELECT grp, count() AS c FROM t GROUP BY grp",
        tabs,
    )
    before = sorted(tuple(r) for r in tabs["mv"].collect())
    assert before == [("a", 2), ("b", 1)]
    # mutating the source must NOT change the materialized snapshot
    tabs["t"] = tabs["t"].limit(1)
    after = sorted(tuple(r) for r in tabs["mv"].collect())
    assert after == before


def test_alter_add_drop_rename_column(spark, tabs):
    from baseline_magician_spark.plans.ch_ddl import run_ch_ddl

    out = run_ch_ddl(
        "ALTER TABLE t ADD COLUMN flag UInt8 DEFAULT id * 10", tabs
    )
    assert [r.flag for r in out.orderBy("id").collect()] == [10, 20, 30]
    out = run_ch_ddl("ALTER TABLE t ADD COLUMN note String", tabs)
    assert [r.note for r in out.collect()] == ["", "", ""]
    out = run_ch_ddl("ALTER TABLE t RENAME COLUMN note TO memo", tabs)
    assert "memo" in out.columns and "note" not in out.columns
    out = run_ch_ddl("ALTER TABLE t DROP COLUMN memo", tabs)
    assert "memo" not in out.columns
    # IF EXISTS tolerates the missing column
    out = run_ch_ddl(
        "ALTER TABLE t DROP COLUMN IF EXISTS nothere", tabs
    )
    assert set(out.columns) == {"id", "grp", "v", "flag"}
    with pytest.raises(ValueError, match="unknown column"):
        run_ch_ddl("ALTER TABLE t DROP COLUMN nothere", tabs)


def test_count_zero_arg(spark, tabs):
    from baseline_magician_spark.plans.ch_sql import run_ch_query

    assert (
        run_ch_query("SELECT count() AS c FROM t", tabs).collect()[0].c
        == 3
    )


def test_create_schema_quoted_paren_in_default(spark, tabs):
    from baseline_magician_spark.plans.ch_ddl import run_ch_ddl

    df = run_ch_ddl(
        "CREATE TABLE q (s String DEFAULT ')', n Int64)", tabs
    )
    assert dict(df.dtypes) == {"s": "string", "n": "bigint"}


def test_session_protocol_statements(spark, tabs):
    from baseline_magician_spark.plans.ch_ddl import run_ch_ddl

    dbs = [r.name for r in run_ch_ddl("SHOW DATABASES", tabs).collect()]
    assert "default" in dbs and "system" in dbs
    assert run_ch_ddl("USE default", tabs).count() == 0
    assert run_ch_ddl("EXISTS TABLE t", tabs).collect()[0].result == 1
    assert run_ch_ddl("EXISTS nope", tabs).collect()[0].result == 0


def test_set_statement_and_statement_routing(spark):
    from baseline_magician_spark.plans.ch_ddl import SESSION_SETTINGS
    from baseline_magician_spark.plans.ch_insert import run_ch_statement

    tabs = {"t": spark.createDataFrame([(1,)], "i long")}
    # SET records (C5-classified) and acknowledges with zero rows
    out = run_ch_statement(
        "SET max_threads = 4, max_memory_usage = 10000000000", tabs
    )
    assert out.count() == 0
    assert SESSION_SETTINGS["max_threads"] == "4"
    assert SESSION_SETTINGS["max_memory_usage"] == "10000000000"
    # the statement router reaches the session-protocol handlers
    # (USE/EXISTS previously only worked via run_ch_ddl directly)
    assert run_ch_statement("USE default", tabs).count() == 0
    assert (
        run_ch_statement("EXISTS TABLE t", tabs).collect()[0].result
        == 1
    )
    # malformed pair raises
    import pytest as _pytest

    with _pytest.raises(ValueError, match="name = value"):
        run_ch_statement("SET garbage", tabs)
    # regression (r8 ADVICE): a quoted value containing a comma must
    # not be split mid-string
    out = run_ch_statement(
        "SET format_csv_delimiter = 'a,b', max_threads = 8", tabs
    )
    assert out.count() == 0
    assert SESSION_SETTINGS["format_csv_delimiter"] == "a,b"
    assert SESSION_SETTINGS["max_threads"] == "8"
