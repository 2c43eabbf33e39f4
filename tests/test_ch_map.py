"""Map(K, V) type + map function family in the CH front end (round 6).

North-star surface beyond the reference driver: its column codec
(reference `ch/lib/column/column.go:22-187`, v1.5.4) predates CH Map
and LowCardinality, but modern CH tables use both pervasively — map
literals, m['key'] subscripts, mapKeys/mapValues/mapContains,
CAST(x AS Map(K, V)), and LowCardinality(T)/Nullable(T) as transparent
unwraps in the cast-type parser.
"""

from __future__ import annotations

import pytest

from baseline_magician_spark.plans.ch_sql import run_ch_query


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10, ["x", "y"], [1, 2]),
            (2, "b", 20, ["x"], [5]),
            (3, "a", 30, [], []),
        ],
        "id int, k string, v int, ks array<string>, vs array<int>",
    )


def test_map_literal_and_subscript(tdf):
    rows = run_ch_query(
        "SELECT id, map('k', k, 'z', 'fixed') AS m, "
        "map('k', k)['k'] AS got, map('k', k)['missing'] AS miss "
        "FROM t ORDER BY id",
        {"t": tdf},
    ).collect()
    assert rows[0].m == {"k": "a", "z": "fixed"}
    assert rows[0].got == "a" and rows[0].miss is None
    assert rows[1].got == "b"


def test_numeric_subscript_stays_array_indexing(tdf):
    rows = run_ch_query(
        "SELECT id, ks[1] AS first, ks[-1] AS last FROM t ORDER BY id",
        {"t": tdf},
    ).collect()
    assert rows[0].first == "x" and rows[0].last == "y"
    assert rows[2].first is None  # empty array -> NULL divergence


def test_map_keys_values_contains(tdf):
    row = run_ch_query(
        "SELECT mapKeys(m) AS mk, mapValues(m) AS mv, "
        "mapContains(m, 'a') AS has_a, mapContains(m, 'q') AS has_q "
        "FROM (SELECT mapFromArrays(['a', 'b'], [1, 2]) AS m)",
        {"t": tdf},
    ).collect()[0]
    assert row.mk == ["a", "b"] and row.mv == [1, 2]
    assert row.has_a is True and row.has_q is False


def test_map_from_row_arrays(tdf):
    rows = run_ch_query(
        "SELECT id, mapFromArrays(ks, vs) AS m, "
        "mapElement(mapFromArrays(ks, vs), 'y') AS y "
        "FROM t ORDER BY id",
        {"t": tdf},
    ).collect()
    assert rows[0].m == {"x": 1, "y": 2} and rows[0].y == 2
    assert rows[1].m == {"x": 5} and rows[1].y is None
    assert rows[2].m == {}


def test_map_update_right_wins(tdf):
    row = run_ch_query(
        "SELECT mapUpdate(mapFromArrays(['a', 'b'], [1, 2]), "
        "mapFromArrays(['b', 'c'], [20, 30])) AS m",
        {"t": tdf},
    ).collect()[0]
    assert row.m == {"a": 1, "b": 20, "c": 30}


def test_cast_to_map_and_wrapper_unwrap(tdf):
    rows = run_ch_query(
        "SELECT id, CAST(mapFromArrays(ks, vs) AS Map(String, Int64)) AS m, "
        "CAST(v AS Nullable(Int64)) AS nv, "
        "CAST(k AS LowCardinality(String)) AS lk, "
        "CAST(vs AS Array(Float64)) AS fv, "
        "v::LowCardinality(Nullable(Int32)) AS deep "
        "FROM t ORDER BY id",
        {"t": tdf},
    )
    dt = dict(rows.dtypes)
    assert dt["m"] == "map<string,bigint>"
    assert dt["nv"] == "bigint" and dt["lk"] == "string"
    assert dt["fv"] == "array<double>" and dt["deep"] == "int"
    assert rows.collect()[0].fv == [1.0, 2.0]


def test_map_higher_order_lambdas(tdf):
    row = run_ch_query(
        "SELECT mapFilter((k, v) -> v > 1, m) AS big, "
        "mapExists((k, v) -> k = 'a', m) AS has_a, "
        "mapAll((k, v) -> v > 0, m) AS all_pos, "
        "mapAll((k, v) -> v > 1, m) AS all_big "
        "FROM (SELECT mapFromArrays(['a', 'b'], [1, 2]) AS m)",
        {"t": tdf},
    ).collect()[0]
    assert row.big == {"b": 2}
    assert row.has_a is True and row.all_pos is True and row.all_big is False


def test_map_in_group_by_pipeline(tdf):
    # the analyst shape: build a per-group map, look keys back up
    rows = run_ch_query(
        "SELECT k, mapElement(mapFromArrays(groupArray(toString(id)), "
        "groupArray(v)), '1') AS v1, sum(v) AS sv "
        "FROM t GROUP BY k ORDER BY k",
        {"t": tdf},
    ).collect()
    assert rows[0].v1 == 10 and rows[0].sv == 40
    assert rows[1].v1 is None and rows[1].sv == 20


def test_describe_prints_map_type(spark, tdf):
    from baseline_magician_spark.plans.ch_ddl import run_ch_ddl as run_ch_statement

    tables = {"t": tdf}
    run_ch_statement(
        "CREATE TABLE mt AS SELECT mapFromArrays(ks, vs) AS m, id FROM t",
        tables,
    )
    desc = {
        r.name: r.type
        for r in run_ch_statement("DESCRIBE TABLE mt", tables).collect()
    }
    assert desc["m"] == "Map(String, Int32)"


def test_grouping_indicator_functions(spark):
    tdf = spark.createDataFrame(
        [(1, "a", "x", 5), (2, "b", "y", 6), (3, "a", "x", 7)],
        "id int, k string, j string, v int",
    )
    rows = run_ch_query(
        "SELECT k, j, grouping(k) AS gk, grouping(j) AS gj, "
        "grouping_id() AS gid, sum(v) AS s "
        "FROM t GROUP BY CUBE(k, j) ORDER BY gid, k, j",
        {"t": tdf},
    ).collect()
    # detail rows first (gid 0), then j-rollups (1), k-rollups (2),
    # grand total (3); first grouping key owns the high bit
    assert [(r.gk, r.gj, r.gid) for r in rows[:2]] == [(0, 0, 0)] * 2
    assert rows[-1].gid == 3 and rows[-1].s == 18
    assert {(r.gk, r.gj) for r in rows} == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_grouping_requires_super_aggregate(spark):
    tdf = spark.createDataFrame([(1, "a")], "id int, k string")
    import pytest as _pt

    with _pt.raises(Exception, match="ROLLUP, CUBE"):
        run_ch_query(
            "SELECT k, grouping(k) AS g FROM t GROUP BY k", {"t": tdf}
        )


def test_left_semi_anti_join_spellings(spark):
    a = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, k string"
    )
    b = spark.createDataFrame([(1,), (3,)], "id int")
    semi = run_ch_query(
        "SELECT k FROM a LEFT SEMI JOIN b ON a.id = b.id ORDER BY k",
        {"a": a, "b": b},
    ).collect()
    anti = run_ch_query(
        "SELECT k FROM a LEFT ANTI JOIN b USING (id) ORDER BY k",
        {"a": a, "b": b},
    ).collect()
    assert [r.k for r in semi] == ["a", "c"]
    assert [r.k for r in anti] == ["b"]
    import pytest as _pt

    with _pt.raises(Exception, match="swap the sides"):
        run_ch_query(
            "SELECT k FROM a RIGHT SEMI JOIN b ON a.id = b.id",
            {"a": a, "b": b},
        )
