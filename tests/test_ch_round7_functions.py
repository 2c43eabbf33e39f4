"""Round-7 tranche: map ordering, LpNorm, fingerprint spellings,
minimum-sample-size closed forms — plus the degenerate-input guards
for kolmogorovSmirnovTest / simpleLinearRegression / boundingRatio
(Spark 4 ANSI raises on double /0, so degenerate groups must return
NULL, never crash the query)."""

from __future__ import annotations

import math

from baseline_magician_spark.plans.ch_sql import run_ch_query


def _one(spark, sql, **tables):
    df = tables.pop("t", None)
    if df is None:
        df = spark.createDataFrame([(1,)], "i long")
    return run_ch_query(sql, {"t": df}).collect()[0].r


def test_map_sort(spark):
    assert _one(
        spark,
        "SELECT arrayStringConcat(mapKeys(mapSort("
        "map('c', 1, 'a', 3, 'b', 2))), ',') AS r FROM t",
    ) == "a,b,c"
    assert _one(
        spark,
        "SELECT arrayStringConcat(mapKeys(mapReverseSort("
        "map('c', 1, 'a', 3, 'b', 2))), ',') AS r FROM t",
    ) == "c,b,a"


def test_lp_norm(spark):
    assert _one(
        spark, "SELECT LpNorm([3.0, 4.0], 2) AS r FROM t"
    ) == 5.0
    got = _one(spark, "SELECT LpNorm([1.0, -2.0, 2.0], 3) AS r FROM t")
    assert abs(got - (1 + 8 + 8) ** (1 / 3)) < 1e-12


def test_detect_language(spark):
    d = run_ch_query(
        "SELECT detectLanguage(s) AS r FROM t",
        {
            "t": _df(
                spark,
                [
                    ("the cat and the dog is here",),
                    ("el que la de los",),
                    ("xyzzy plugh",),
                ],
            )
        },
    ).collect()
    assert [r.r for r in d] == ["en", "es", "und"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "s string")


def test_fingerprint_spellings_deterministic(spark):
    d = run_ch_query(
        "SELECT ngramSimHash(s) AS a, wordShingleSimHash(s, 2) AS b,"
        " tupleElement(ngramMinHash(s), 1) AS lo,"
        " tupleElement(ngramMinHash(s), 2) AS hi FROM t",
        {"t": _df(spark, [("the cat and the dog",)] * 2)},
    ).collect()
    assert d[0] == d[1]
    assert d[0].a >= 0 and d[0].lo >= 0 and d[0].hi >= 0


def test_min_sample_size_closed_forms(spark):
    from baseline_magician_spark.functions.stats_tests import _norm_ppf

    z = _norm_ppf(1 - 0.05 / 2) + _norm_ppf(0.8)
    conv = _one(
        spark,
        "SELECT tupleElement(minSampleSizeConversion("
        "0.25, 0.05, 0.8, 0.05), 1) AS r FROM t",
    )
    want = z * z * (0.25 * 0.75 + 0.30 * 0.70) / 0.0025
    assert math.isclose(conv, want, rel_tol=1e-12)
    cont = _one(
        spark,
        "SELECT tupleElement(minSampleSizeContinous("
        "100.0, 10.0, 0.05, 0.8, 0.05), 1) AS r FROM t",
    )
    assert math.isclose(cont, 2 * z * z * 100 / 25.0, rel_tol=1e-12)


def test_degenerate_groups_return_null_not_crash(spark):
    df1 = spark.createDataFrame([(1, 2.0)], "i long, d double")
    got = run_ch_query(
        "SELECT kolmogorovSmirnovTest(d, i % 2) AS ks,"
        " simpleLinearRegression(i, d) AS slr,"
        " boundingRatio(i, d) AS br FROM t",
        {"t": df1},
    ).collect()[0]
    assert got.ks.d_statistic is None and got.ks.p_value is None
    assert got.slr.k is None and got.slr.b is None
    assert got.br is None

    # all-NULL values: empty tape must not descend sequence(1, 0)
    dfn = spark.createDataFrame([(None, 0), (None, 1)], "d double, g int")
    got = run_ch_query(
        "SELECT kolmogorovSmirnovTest(d, g) AS ks FROM t", {"t": dfn}
    ).collect()[0]
    assert got.ks.d_statistic is None


def test_nondegenerate_still_computed(spark):
    df = spark.createDataFrame(
        [(float(i), i % 2) for i in range(40)], "d double, g int"
    )
    got = run_ch_query(
        "SELECT kolmogorovSmirnovTest(d, g) AS ks,"
        " simpleLinearRegression(g, d) AS slr,"
        " boundingRatio(g, d) AS br FROM t",
        {"t": df},
    ).collect()[0]
    assert got.ks.d_statistic is not None and got.ks.p_value > 0.9
    assert math.isclose(got.slr.k, 1.0) and math.isclose(got.slr.b, 19.0)
    assert got.br == 39.0


def test_geohash_static_path_matches_fold_on_boundaries(spark):
    """The literal-precision static encoder and the Column-precision
    fold must agree bit-for-bit — including the clamped poles/antimeridian
    and odd precisions (nlon != nlat)."""
    import pyspark.sql.functions as F

    from baseline_magician_spark.functions.geo import geohash_encode

    rows = [
        (-180.0, -90.0), (180.0, 90.0), (179.999, 89.999),
        (0.0, 0.0), (-179.5, 84.5), (11.5, 48.1),
    ]
    df = spark.createDataFrame(rows, "lon double, lat double")
    for p in (1, 5, 12):
        got = df.select(
            geohash_encode(F.col("lon"), F.col("lat"), p).alias("s"),
            geohash_encode(F.col("lon"), F.col("lat"), F.lit(p)).alias(
                "f"
            ),
        ).collect()
        assert all(r.s == r.f for r in got), (p, got)


def test_lttb_oracle_small_group_passthrough(spark, duck, tmp_path):
    """Groups at or under the point budget return every point; the
    oracle's n <= k branch must replay that (the sf0.01 parity sweep
    only exercises the greedy branch)."""
    import duckdb as _duckdb

    from baseline_magician_spark.registry import get_oracles, get_queries

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    d = str(tmp_path / "tiny")
    ev.limit(40).coalesce(1).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    sdf = get_queries()["ch_sql_lttb_downsample"](spark, d)
    srows = sorted(
        tuple(str(x) for x in r)
        for r in sdf.select(*sorted(sdf.columns)).collect()
    )
    con = _duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    res = con.execute(get_oracles()["ch_sql_lttb_downsample"])
    cols = [c[0] for c in res.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    drows = sorted(
        tuple(str(r[i]) for i in idx) for r in res.fetchall()
    )
    assert srows == drows


def test_categorical_information_value(spark):
    rows = [("a", 1), ("a", 1), ("a", 0), ("b", 0), ("b", 0), ("b", 1),
            ("c", 1), ("c", 0)]
    df = spark.createDataFrame(rows, "c string, t int")
    got = run_ch_query(
        "SELECT categoricalInformationValue(c, t) AS iv FROM t",
        {"t": df},
    ).collect()[0].iv
    # n1 = n0 = 4; a: (2/4-1/4)·ln 2, b: (1/4-2/4)·ln 1/2, c: 0
    want = 0.25 * math.log(2.0) - 0.25 * math.log(0.5)
    assert abs(got[0] - want) < 1e-12
    # one-sided categories contribute the finite part (0), never
    # a NULL-poisoned ln(0)
    df2 = spark.createDataFrame([("a", 1), ("a", 1), ("b", 0)],
                                "c string, t int")
    got2 = run_ch_query(
        "SELECT categoricalInformationValue(c, t) AS iv FROM t",
        {"t": df2},
    ).collect()[0].iv
    assert got2[0] == 0.0
    # a group with only one tag class is undefined -> NULL element
    df3 = spark.createDataFrame([("a", 1), ("b", 1)], "c string, t int")
    got3 = run_ch_query(
        "SELECT categoricalInformationValue(c, t) AS iv FROM t",
        {"t": df3},
    ).collect()[0].iv
    assert got3[0] is None
    # multi-column spelling: one IV per category column
    df4 = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 0), ("b", "x", 0), ("b", "y", 1)],
        "c1 string, c2 string, t int",
    )
    got4 = run_ch_query(
        "SELECT categoricalInformationValue(c1, c2, t) AS iv FROM t",
        {"t": df4},
    ).collect()[0].iv
    assert len(got4) == 2


def test_url_hierarchy_family(spark):
    rows = [
        ("https://example.com/browse/CONV-6788",
         "https://example.com/|https://example.com/browse/"
         "|https://example.com/browse/CONV-6788",
         "/browse/|/browse/CONV-6788"),
        ("https://example.com/browse/",
         "https://example.com/|https://example.com/browse/",
         "/browse/"),
        ("https://example.com", "https://example.com", ""),
        # consecutive separators cut once, after the run
        ("https://e.com/a//b?q=1#f",
         "https://e.com/|https://e.com/a//|https://e.com/a//b?"
         "|https://e.com/a//b?q=1#|https://e.com/a//b?q=1#f",
         "/|/a//|/a//b?|/a//b?q=1#|/a//b?q=1#f"),
    ]
    df = spark.createDataFrame(
        [(u,) for u, _, _ in rows], "u string"
    )
    got = run_ch_query(
        "SELECT u, arrayStringConcat(URLHierarchy(u), '|') AS h,"
        " arrayStringConcat(URLPathHierarchy(u), '|') AS p FROM t",
        {"t": df},
    ).collect()
    want = {u: (h, p) for u, h, p in rows}
    for r in got:
        wh, wp = want[r.u]
        assert r.h == wh, (r.u, r.h)
        # the bare root '/' is excluded from the PATH hierarchy only
        # when it is the root alone; runs like '/a//' keep their text
        assert r.p == wp.replace("/|", "", 1) if wp.startswith("/|") else r.p == wp, (r.u, r.p)


def test_url_hash_level_form(spark):
    df = spark.createDataFrame([(1,)], "i long")
    r = run_ch_query(
        "SELECT URLHash('https://example.com/top/news.html', 2) AS h2,"
        " URLHash('https://example.com/top') AS hfull,"
        " URLHash('https://example.com/top/') AS htrail,"
        " URLHash('https://example.com/top/news.html', 99) AS hoor"
        " FROM t",
        {"t": df},
    ).collect()[0]
    # level 2 == the trimmed '/top' prefix, whichever spelling
    assert r.h2 == r.hfull == r.htrail
    assert r.hoor is None  # out-of-range level -> NULL, never a crash
