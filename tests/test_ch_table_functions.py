"""file()/url()/s3() table functions + lagInFrame/leadInFrame +
-Distinct combinator (round 6).

CH reads external data in place via table functions
(sql-reference/table-functions/file). The Spark mapping is the
DataFrameReader — the scan stays distributed and the same code path
serves s3:// locations on a real cluster.
"""

from __future__ import annotations

import pytest

from baseline_magician_spark.plans.ch_sql import run_ch_query


@pytest.fixture(scope="module")
def data_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("chfile")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "id int, k string, v double",
    )
    df.coalesce(1).write.parquet(str(d / "t.parquet"))
    df.coalesce(1).write.csv(str(d / "t.csv"), header=True)
    df.coalesce(1).write.csv(str(d / "t.tsv"), header=True, sep="\t")
    df.coalesce(1).write.json(str(d / "t.json"))
    return d


def test_file_parquet(data_dir):
    rows = run_ch_query(
        f"SELECT k, count(*) AS n, sum(id) AS s "
        f"FROM file('{data_dir}/t.parquet', 'Parquet') "
        f"GROUP BY k ORDER BY k",
        {},
    ).collect()
    assert [(r.k, r.n, r.s) for r in rows] == [("a", 2, 4), ("b", 1, 2)]


def test_file_csv_with_names(data_dir):
    rows = run_ch_query(
        f"SELECT count(*) AS n, max(id) AS m "
        f"FROM file('{data_dir}/t.csv', 'CSVWithNames')",
        {},
    ).collect()
    assert rows[0].n == 3 and rows[0].m == 3


def test_file_tsv_and_alias_join(data_dir):
    rows = run_ch_query(
        f"SELECT f.k AS k, count(*) AS n "
        f"FROM file('{data_dir}/t.tsv', 'TSVWithNames') AS f "
        f"WHERE f.id > 1 GROUP BY f.k ORDER BY k",
        {},
    ).collect()
    assert [(r.k, r.n) for r in rows] == [("a", 1), ("b", 1)]


def test_file_json_each_row(data_dir):
    rows = run_ch_query(
        f"SELECT k, sum(id) AS s "
        f"FROM file('{data_dir}/t.json', 'JSONEachRow') "
        f"GROUP BY k ORDER BY k",
        {},
    ).collect()
    assert [(r.k, r.s) for r in rows] == [("a", 4), ("b", 2)]


def test_file_unknown_format_raises(data_dir):
    with pytest.raises(Exception, match="unsupported format"):
        run_ch_query(
            f"SELECT 1 FROM file('{data_dir}/t.parquet', 'Native')", {}
        )


def test_lag_in_frame(spark):
    tdf = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "i int, v int"
    )
    rows = run_ch_query(
        "SELECT i, lagInFrame(v, 1) OVER (ORDER BY i) AS pv, "
        "leadInFrame(v, 1, 0 - 1) OVER (ORDER BY i) AS nv "
        "FROM t ORDER BY i",
        {"t": tdf},
    ).collect()
    assert [(r.pv, r.nv) for r in rows] == [(None, 20), (10, 30), (20, -1)]


def test_distinct_combinator_suffix(spark):
    tdf = spark.createDataFrame(
        [(1, 5), (1, 5), (1, 7), (2, 5)], "g int, x int"
    )
    rows = run_ch_query(
        "SELECT g, sumDistinct(x) AS sd, countDistinct(x) AS cd, "
        "avgDistinct(x) AS ad, sumDistinctIf(x, x < 6) AS sdi "
        "FROM t GROUP BY g ORDER BY g",
        {"t": tdf},
    ).collect()
    assert (rows[0].sd, rows[0].cd, rows[0].ad) == (12, 2, 6.0)
    assert rows[0].sdi == 5
    assert (rows[1].sd, rows[1].cd) == (5, 1)


def test_insert_into_function_file_roundtrip(spark, tmp_path):
    from baseline_magician_spark.plans.ch_insert import run_ch_insert

    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "id int, k string, v double",
    )
    dest = str(tmp_path / "out.parquet")
    out = run_ch_insert(
        f"INSERT INTO FUNCTION file('{dest}', 'Parquet') "
        "SELECT k, sum(v) AS sv FROM src GROUP BY k",
        {"src": src},
    )
    assert sorted(out.columns) == ["k", "sv"]
    back = run_ch_query(
        f"SELECT k, sv FROM file('{dest}', 'Parquet') ORDER BY k", {}
    ).collect()
    assert [(r.k, r.sv) for r in back] == [("a", 40.0), ("b", 20.0)]


def test_insert_into_function_csv(spark, tmp_path):
    from baseline_magician_spark.plans.ch_insert import run_ch_insert

    src = spark.createDataFrame([(1, "x"), (2, "y")], "id int, s string")
    dest = str(tmp_path / "out.csv")
    run_ch_insert(
        f"INSERT INTO FUNCTION file('{dest}', 'CSVWithNames') "
        "SELECT id, s FROM src",
        {"src": src},
    )
    back = run_ch_query(
        f"SELECT count(*) AS n, max(id) AS m "
        f"FROM file('{dest}', 'CSVWithNames')",
        {},
    ).collect()[0]
    assert back.n == 2 and back.m == 2


def test_insert_into_function_values_rejected(spark):
    from baseline_magician_spark.plans.ch_insert import run_ch_insert

    with pytest.raises(Exception, match="SELECT tail"):
        run_ch_insert(
            "INSERT INTO FUNCTION file('/tmp/x', 'Parquet') VALUES (1)",
            {},
        )


def test_system_tables_and_one(spark):
    tdf = spark.createDataFrame([(1, "a")], "id int, k string")
    rows = run_ch_query(
        "SELECT name, engine FROM system.tables ORDER BY name",
        {"zeta": tdf, "alpha": tdf},
    ).collect()
    assert [r.name for r in rows] == ["alpha", "zeta"]
    assert rows[0].engine == "MergeTree"
    cols = run_ch_query(
        "SELECT table, name, type FROM system.columns "
        "WHERE table = 'alpha' ORDER BY name",
        {"alpha": tdf},
    ).collect()
    assert [(r.name, r.type) for r in cols] == [
        ("id", "Int32"), ("k", "String")
    ]
    one = run_ch_query("SELECT dummy FROM system.one", {}).collect()
    assert len(one) == 1 and one[0].dummy == 0


def test_show_create_table_and_kill(spark):
    from baseline_magician_spark.plans.ch_ddl import run_ch_ddl

    tdf = spark.createDataFrame([(1, "a", [1.5])],
                                "id int, k string, v array<double>")
    tables = {"t": tdf}
    stmt = run_ch_ddl("SHOW CREATE TABLE t", tables).collect()[0].statement
    assert "CREATE TABLE t" in stmt
    assert "`id` Int32" in stmt and "`v` Array(Float64)" in stmt
    assert "ORDER BY id" in stmt
    killed = run_ch_ddl(
        "KILL QUERY WHERE query_id = 'no-such-query'", tables
    ).collect()
    assert killed[0].kill_status == "finished"


def test_generate_series_inclusive_stop(spark):
    from baseline_magician_spark.plans.ch_sql import run_ch_query

    t = spark.createDataFrame([(1,)], "i long")
    r = run_ch_query(
        "SELECT sum(generate_series) AS s, count(*) AS n "
        "FROM generate_series(0, 9)",
        {"t": t},
    ).collect()[0]
    assert (r.s, r.n) == (45, 10)  # stop is INCLUSIVE, unlike numbers
    r = run_ch_query(
        "SELECT sum(generate_series) AS s, count(*) AS n "
        "FROM generate_series(0, 7, 3)",
        {"t": t},
    ).collect()[0]
    assert (r.s, r.n) == (9, 3)  # 0, 3, 6
    r = run_ch_query(
        "SELECT count(*) AS n FROM generateSeries(5, 3)", {"t": t}
    ).collect()[0]
    assert r.n == 0  # start past stop: empty
