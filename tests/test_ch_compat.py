"""ClickHouse-compat shim behavior: each shim must reproduce the CH
function's documented semantics (clickhouse.com/docs/sql-reference) on
representative inputs."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from baseline_magician_spark.functions.ch_compat import CH_FUNCTIONS, ch_fn


@pytest.fixture(scope="module")
def row(spark):
    """Evaluate a dict of Columns against a one-row frame."""

    def run(**cols):
        df = spark.range(1).select(
            *[c.alias(k) for k, c in cols.items()]
        )
        return df.collect()[0].asDict()

    return run


def test_conditionals(row):
    got = row(
        if_=ch_fn("if")(F.lit(True), F.lit(1), F.lit(2)),
        multi=ch_fn("multiIf")(
            F.lit(False), F.lit("a"), F.lit(True), F.lit("b"), F.lit("z")
        ),
        ifnull=ch_fn("ifNull")(F.lit(None).cast("int"), F.lit(7)),
        nullif=ch_fn("nullIf")(F.lit(3), F.lit(3)),
    )
    assert got == {"if_": 1, "multi": "b", "ifnull": 7, "nullif": None}


def test_multi_if_rejects_even_arity():
    with pytest.raises(ValueError):
        ch_fn("multiIf")(F.lit(True), F.lit(1))


def test_int_div_truncates_toward_zero_like_ch(row):
    got = row(
        pos=ch_fn("intDiv")(F.lit(7), F.lit(2)),
        neg=ch_fn("intDiv")(F.lit(-7), F.lit(2)),
    )
    assert got == {"pos": 3, "neg": -3}


def test_date_functions(row):
    ts = F.lit("2024-03-15 13:45:11").cast("timestamp")
    got = row(
        yyyymm=ch_fn("toYYYYMM")(ts),
        yyyymmdd=ch_fn("toYYYYMMDD")(ts),
        hour_start=ch_fn("toStartOfHour")(ts),
        ddiff=ch_fn("dateDiff")(
            "'day'", F.lit("2024-03-01").cast("timestamp"), ts
        ),
        unix=ch_fn("toUnixTimestamp")(F.lit("1970-01-01 00:01:40").cast("timestamp")),
    )
    assert got["yyyymm"] == 202403
    assert got["yyyymmdd"] == 20240315
    assert got["hour_start"] == datetime.datetime(2024, 3, 15, 13, 0)
    assert got["ddiff"] == 14
    assert got["unix"] == 100


def test_string_functions(row):
    got = row(
        pos=ch_fn("position")(F.lit("Hello"), F.lit("ll")),
        starts=ch_fn("startsWith")(F.lit("Hello"), F.lit("He")),
        extract_group=ch_fn("extract")(F.lit("v=42;"), r"v=(\d+)"),
        extract_whole=ch_fn("extract")(F.lit("abc123"), r"\d+"),
        repl=ch_fn("replaceRegexpAll")(F.lit("a1b2"), F.lit(r"\d"), F.lit("_")),
        split=ch_fn("splitByChar")(".", F.lit("1.2.3")),
        empty=ch_fn("empty")(F.lit("")),
    )
    assert got["pos"] == 3  # CH position is 1-based
    assert got["starts"] is True
    assert got["extract_group"] == "42"
    assert got["extract_whole"] == "123"
    assert got["repl"] == "a_b_"
    assert got["split"] == ["1", "2", "3"]
    assert got["empty"] is True


def test_conditional_aggregates(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)], ["k", "v"]
    )
    got = df.agg(
        ch_fn("countIf")(F.col("k") % 2 == 0).alias("c"),
        ch_fn("sumIf")(F.col("v"), F.col("k") > 2).alias("s"),
        ch_fn("avgIf")(F.col("v"), F.col("k") <= 2).alias("a"),
        ch_fn("argMax")(F.col("k"), F.col("v")).alias("am"),
        ch_fn("quantileExact")(F.col("v"), 0.5).alias("q"),
    ).collect()[0]
    assert got["c"] == 2
    assert got["s"] == 70.0
    assert got["a"] == 15.0
    assert got["am"] == 4
    assert got["q"] == 25.0


def test_hashes_are_portable(row):
    got = row(
        md5=ch_fn("MD5")(F.lit("abc")),
        half=ch_fn("halfMD5")(F.lit("abc")),
    )
    assert got["md5"] == "900150983cd24fb0d6963f7d28e17f72"
    # genuine CH halfMD5 (round-7d): first 8 digest bytes big-endian
    # == int.from_bytes(hashlib.md5(b'abc').digest()[:8], 'big')
    assert int(got["half"]) == 10376663631224000432


def test_unknown_function_raises_with_known_list():
    with pytest.raises(KeyError, match="no ClickHouse-compat shim"):
        ch_fn("noSuchFunctionZZZ")


def test_registry_entries_are_callable():
    assert all(callable(f) for f in CH_FUNCTIONS.values())


def test_add_days_preserves_time_of_day(row):
    ts = F.lit("2024-03-15 13:45:11").cast("timestamp")
    got = row(
        plus=ch_fn("addDays")(ts, 3),
        minus=ch_fn("subtractDays")(ts, 20),
    )
    assert got["plus"] == datetime.datetime(2024, 3, 18, 13, 45, 11)
    assert got["minus"] == datetime.datetime(2024, 2, 24, 13, 45, 11)


def test_int_div_exact_beyond_double_precision(row):
    big = 4611686018427387904  # 2^62: double division would round
    got = row(q=ch_fn("intDiv")(F.lit(big), F.lit(3)))
    assert got["q"] == 1537228672809129301


def test_array_vocabulary(row):
    arr = F.array(F.lit(3), F.lit(1), F.lit(2), F.lit(1))
    got = row(
        has=ch_fn("has")(arr, F.lit(2)),
        idx=ch_fn("indexOf")(arr, F.lit(1)),
        dist=ch_fn("arrayDistinct")(arr),
        uniq=ch_fn("arrayUniq")(arr),
        srt=ch_fn("arraySort")(arr),
        rev=ch_fn("arrayReverse")(arr),
        cat=ch_fn("arrayStringConcat")(
            F.array(F.lit("a"), F.lit("b")), "-"
        ),
        summ=ch_fn("arraySum")(arr),
        avg=ch_fn("arrayAvg")(arr),
        mn=ch_fn("arrayMin")(arr),
        mx=ch_fn("arrayMax")(arr),
        sl=ch_fn("arraySlice")(arr, F.lit(2), F.lit(2)),
        pb=ch_fn("arrayPushBack")(F.array(F.lit(1)), F.lit(9)),
        popb=ch_fn("arrayPopBack")(arr),
        enum=ch_fn("arrayEnumerate")(arr),
        el=ch_fn("arrayElement")(arr, F.lit(-1)),
    )
    assert got["has"] is True
    assert got["idx"] == 2          # 1-based, first occurrence
    assert got["dist"] == [3, 1, 2]
    assert got["uniq"] == 3
    assert got["srt"] == [1, 1, 2, 3]
    assert got["rev"] == [1, 2, 1, 3]
    assert got["cat"] == "a-b"
    assert got["summ"] == 7.0 and got["avg"] == 1.75
    assert got["mn"] == 1 and got["mx"] == 3
    assert got["sl"] == [1, 2]
    assert got["pb"] == [1, 9]
    assert got["popb"] == [3, 1, 2]
    assert got["enum"] == [1, 2, 3, 4]
    assert got["el"] == 1


def test_array_avg_empty_is_nan_not_error(row):
    """ANSI mode (Spark 4 default) raises DIVIDE_BY_ZERO on an
    unguarded sum/size; the guard returns NaN for the empty array."""
    import math

    empty = F.array().cast("array<double>")
    got = row(avg=ch_fn("arrayAvg")(empty))
    assert math.isnan(got["avg"])


def test_range_semantics(row):
    got = row(
        one=ch_fn("range")(F.lit(4)),
        two=ch_fn("range")(F.lit(2), F.lit(5)),
        empty=ch_fn("range")(F.lit(0)),
        inverted=ch_fn("range")(F.lit(5), F.lit(2)),
    )
    assert got["one"] == [0, 1, 2, 3]
    assert got["two"] == [2, 3, 4]
    assert got["empty"] == []       # CH: end-exclusive, never descending
    assert got["inverted"] == []


def test_array_join_explodes(spark):
    from baseline_magician_spark.plans.ch_sql import run_ch_query

    t = spark.createDataFrame([(1, "a b"), (2, "c")], "id long, s string")
    rows = run_ch_query(
        "SELECT id, arrayJoin(splitByChar(' ', s)) AS tok FROM t ORDER BY id, tok",
        {"t": t},
    ).collect()
    assert [(r["id"], r["tok"]) for r in rows] == [(1, "a"), (1, "b"), (2, "c")]


def test_math_and_date_additions(row):
    ts = F.lit("2024-03-15 10:30:00").cast("timestamp")
    got = row(
        q=ch_fn("toQuarter")(ts),
        dow=ch_fn("toDayOfWeek")(ts),
        addm=ch_fn("addMonths")(ts, F.lit(2)),
        subh=ch_fn("subtractHours")(ts, F.lit(3)),
        tr=ch_fn("trunc")(F.lit(3.14159), F.lit(2)),
        trn=ch_fn("trunc")(F.lit(-3.14159), F.lit(2)),
        sgn=ch_fn("sign")(F.lit(-5.0)),
        idz=ch_fn("intDivOrZero")(F.lit(7), F.lit(0)),
        mdz=ch_fn("moduloOrZero")(F.lit(7), F.lit(0)),
        fin=ch_fn("isFinite")(F.lit(1.5)),
    )
    assert got["q"] == 1
    assert got["dow"] == 5          # CH numbering: 1=Monday; 2024-03-15 is Friday
    assert str(got["addm"]).startswith("2024-05-15 10:30")
    assert str(got["subh"]).startswith("2024-03-15 07:30")
    assert got["tr"] == 3.14 and got["trn"] == -3.14
    assert got["sgn"] == -1.0
    assert got["idz"] == 0 and got["mdz"] == 0
    assert got["fin"] is True


def test_week_functions_ch_semantics(row):
    got = row(
        # Friday -> CH 5; Sunday -> CH 7; Monday -> CH 1
        fri=ch_fn("toDayOfWeek")(F.lit("2024-03-15").cast("date")),
        sun=ch_fn("toDayOfWeek")(F.lit("2024-03-17").cast("date")),
        mon=ch_fn("toDayOfWeek")(F.lit("2024-03-18").cast("date")),
        # toStartOfWeek mode 0: round down to the nearest SUNDAY
        sow_sun=ch_fn("toStartOfWeek")(F.lit("2024-03-17").cast("date")),
        sow_fri=ch_fn("toStartOfWeek")(F.lit("2024-03-15").cast("date")),
    )
    assert got["fri"] == 5 and got["sun"] == 7 and got["mon"] == 1
    assert str(got["sow_sun"]) == "2024-03-17"
    assert str(got["sow_fri"]) == "2024-03-10"


def test_element_and_slice_edge_semantics(row):
    arr = F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4))
    got = row(
        oob=ch_fn("arrayElement")(arr, F.lit(9)),
        zero=ch_fn("arrayElement")(arr, F.lit(0)),
        neg=ch_fn("arrayElement")(arr, F.lit(-2)),
        negd=ch_fn("arraySlice")(arr, F.lit(2), F.lit(-1)),
        negoff=ch_fn("arraySlice")(arr, F.lit(-3), F.lit(2)),
        over=ch_fn("arraySlice")(arr, F.lit(2), F.lit(-9)),
    )
    assert got["oob"] is None and got["zero"] is None
    assert got["neg"] == 3
    assert got["negd"] == [2, 3]    # from 2 through end-minus-1
    assert got["negoff"] == [2, 3]
    assert got["over"] == []


def test_int_div_float_semantics(row):
    got = row(
        f1=ch_fn("intDiv")(F.lit(7.9), F.lit(2)),
        f2=ch_fn("intDiv")(F.lit(7), F.lit(0.5)),
        z=ch_fn("intDivOrZero")(F.lit(7), F.lit(0.5)),
        big=ch_fn("intDiv")(
            F.lit(4611686018427387904), F.lit(3)
        ),  # 2^62: exact past double precision
    )
    assert got["f1"] == 3
    assert got["f2"] == 14
    assert got["z"] == 14
    assert got["big"] == 1537228672809129301


def test_array_avg_null_empty_and_values(spark):
    """NULL array -> NULL (CH Nullable passthrough); [] -> NaN; else
    the mean."""
    import math

    from baseline_magician_spark.functions.ch_compat import CH_FUNCTIONS
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [2.0, 4.0]), (2, []), (3, None)],
        "id long, arr array<double>",
    )
    rows = {
        r["id"]: r["avg"]
        for r in df.select(
            "id", CH_FUNCTIONS["arrayAvg"](F.col("arr")).alias("avg")
        ).collect()
    }
    assert rows[1] == 3.0
    assert math.isnan(rows[2])
    assert rows[3] is None


def test_if_combinator_family(spark):
    from baseline_magician_spark.plans.ch_sql import run_ch_query

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b"), (3, "a")], "x long, y string"
    )
    row = run_ch_query(
        "select uniqExactIf(x, y = 'b') as u, "
        "uniqIf(x, y = 'a') as ua, "
        "anyIf(x, y = 'z') as missing from t",
        {"t": df},
    ).collect()[0]
    assert row.u == 1        # only x=2 matches y='b'
    assert row.ua == 2       # x in {1, 3}
    assert row.missing is None  # no match -> NULL, like CH


def test_date_trunc_and_fixed_windows(row):
    ts = F.lit("2024-03-15 13:47:29").cast("timestamp")
    got = row(
        trunc_h=ch_fn("dateTrunc")("hour", ts),
        trunc_m=ch_fn("date_trunc")("'month'", ts),
        five=ch_fn("toStartOfFiveMinutes")(ts),
        ten=ch_fn("toStartOfTenMinutes")(ts),
        fifteen=ch_fn("toStartOfFifteenMinutes")(ts),
    )
    assert str(got["trunc_h"]) == "2024-03-15 13:00:00"
    assert str(got["trunc_m"]) == "2024-03-01 00:00:00"
    assert str(got["five"]) == "2024-03-15 13:45:00"
    assert str(got["ten"]) == "2024-03-15 13:40:00"
    assert str(got["fifteen"]) == "2024-03-15 13:45:00"


def test_format_datetime(row):
    ts = F.lit("2024-03-05 09:07:02").cast("timestamp")
    got = row(
        iso=ch_fn("formatDateTime")(ts, "%F %T"),
        custom=ch_fn("formatDateTime")(ts, "%Y/%m/%d %H:%i:%S"),
        pct=ch_fn("formatDateTime")(ts, "%d%%"),
    )
    assert got["iso"] == "2024-03-05 09:07:02"
    assert got["custom"] == "2024/03/05 09:07:02"
    assert got["pct"] == "05%"
    with pytest.raises(ValueError, match="unsupported formatDateTime"):
        ch_fn("formatDateTime")(ts, "%Q")


def test_url_functions(row):
    u = F.lit("https://user@sub.example.com:8443/a/b?x=1&y=2#frag")
    got = row(
        proto=ch_fn("protocol")(u),
        dom=ch_fn("domain")(u),
        tld=ch_fn("topLevelDomain")(u),
        path=ch_fn("path")(u),
        qs=ch_fn("queryString")(u),
        cut=ch_fn("cutQueryString")(u),
        param=ch_fn("extractURLParameter")(u, "y"),
    )
    assert got == {
        "proto": "https",
        "dom": "sub.example.com",
        "tld": "com",
        "path": "/a/b",
        "qs": "x=1&y=2",
        "cut": "https://user@sub.example.com:8443/a/b#frag",
        "param": "2",
    }
    got2 = row(
        dom=ch_fn("domain")(F.lit("example.org/x")),
        tld_ip=ch_fn("topLevelDomain")(F.lit("http://1.2.3.4/x")),
        path2=ch_fn("path")(F.lit("example.org/x/y?q=1")),
    )
    assert got2 == {"dom": "example.org", "tld_ip": "", "path2": "/x/y"}


def test_extract_all_and_multisearch(row):
    got = row(
        all_nums=ch_fn("extractAll")(F.lit("a1 b22 c333"), r"\d+"),
        grouped=ch_fn("extractAll")(F.lit("k=1;k=2"), r"k=(\d)"),
        pos_ci=ch_fn("positionCaseInsensitive")(
            F.lit("Hello World"), F.lit("world")
        ),
        any_hit=ch_fn("multiSearchAny")(
            F.lit("error: disk full"),
            F.array(F.lit("timeout"), F.lit("disk")),
        ),
        any_miss=ch_fn("multiSearchAny")(
            F.lit("all good"),
            F.array(F.lit("timeout"), F.lit("disk")),
        ),
    )
    assert list(got["all_nums"]) == ["1", "22", "333"]
    assert list(got["grouped"]) == ["1", "2"]
    assert got["pos_ci"] == 7
    assert got["any_hit"] is True and got["any_miss"] is False


def test_new_functions_from_sql_text(spark):
    """The dialect resolves the new shims with driver-literal args at
    the registered positions."""
    from baseline_magician_spark.plans.ch_sql import run_ch_query

    t = spark.createDataFrame(
        [("https://a.io/p?k=7", "2024-03-15 13:47:29")],
        "url string, ts string",
    )
    r = run_ch_query(
        "SELECT domain(url) AS d, extractURLParameter(url, 'k') AS k, "
        "formatDateTime(toDateTime(ts), '%F') AS day, "
        "dateTrunc('hour', toDateTime(ts)) AS h, "
        "extractAll(url, '[a-z]+') AS toks "
        "FROM t",
        {"t": t},
    ).first()
    assert r["d"] == "a.io" and r["k"] == "7"
    assert r["day"] == "2024-03-15"
    assert str(r["h"]) == "2024-03-15 13:00:00"
    assert list(r["toks"]) == ["https", "a", "io", "p", "k"]


def test_uniq_state_merge_sketches(spark):
    """uniqState emits a MERGEABLE binary HLL sketch; uniqMerge unions
    and estimates. The two-level result must estimate the true global
    distinct within HLL error even though level two never sees raw
    rows."""
    from pyspark.sql.types import BinaryType

    df = spark.range(0, 5000).select(
        (F.col("id") % 10).alias("g"), (F.col("id") % 700).alias("u")
    )
    daily = df.groupBy("g").agg(
        ch_fn("uniqState")(F.col("u")).alias("sk")
    )
    assert isinstance(daily.schema["sk"].dataType, BinaryType)
    est = daily.agg(ch_fn("uniqMerge")(F.col("sk")).alias("n")).first()["n"]
    assert abs(est - 700) <= 0.05 * 700


def test_date_interval_shims(spark):
    """addYears/Quarters/Weeks + generic dateAdd/dateSub (quoted AND
    bare unit spellings) + toStartOfInterval grids (sub-day grids
    return timestamps, day+ grids return dates, weeks anchor on
    Monday)."""
    from baseline_magician_spark.plans.ch_sql import run_ch_query

    t = spark.createDataFrame(
        [("2024-05-17 10:37:05",)], "d string"
    ).withColumn("ts", F.col("d").cast("timestamp"))
    r = run_ch_query(
        "SELECT addYears(ts, 1) AS y, addQuarters(ts, 1) AS q,"
        " addWeeks(ts, 2) AS w, dateAdd('hour', 3, ts) AS hq,"
        " dateAdd(hour, 3, ts) AS hb, dateSub(day, 1, ts) AS ds"
        " FROM t",
        {"t": t},
    ).first()
    assert str(r["y"]) == "2025-05-17 10:37:05"
    assert str(r["q"]) == "2024-08-17 10:37:05"
    assert str(r["w"]) == "2024-05-31 10:37:05"
    assert str(r["hq"]) == str(r["hb"]) == "2024-05-17 13:37:05"
    assert str(r["ds"]) == "2024-05-16 10:37:05"
    r = run_ch_query(
        "SELECT toStartOfInterval(ts, INTERVAL 15 minute) AS m15,"
        " toStartOfInterval(ts, INTERVAL 2 day) AS d2,"
        " toStartOfInterval(ts, INTERVAL 1 week) AS w1,"
        " toStartOfInterval(ts, INTERVAL 3 month) AS q1 FROM t",
        {"t": t},
    ).first()
    assert str(r["m15"]) == "2024-05-17 10:30:00"
    assert str(r["d2"]) == "2024-05-17"
    assert str(r["w1"]) == "2024-05-13"  # the Monday
    assert str(r["q1"]) == "2024-04-01"


def test_array_vocabulary_extensions(spark):
    """arrayIntersect (sorted, variadic), hasAll/hasAny, countEqual,
    arrayCompact (consecutive dedup), arrayDifference (leading 0),
    arrayCumSum (running sum, type-preserving)."""
    from baseline_magician_spark.plans.ch_sql import run_ch_query

    t = spark.createDataFrame(
        [(1, [3, 1, 2, 2, 5], [1, 2, 3, 4]), (2, [7], [2, 4])],
        "k long, xs array<bigint>, ys array<bigint>",
    )
    r = run_ch_query(
        "SELECT k, arrayIntersect(xs, ys) AS i, hasAll(xs, ys) AS ha,"
        " hasAny(xs, ys) AS hy, countEqual(xs, 2) AS ce,"
        " arrayCompact(xs) AS ac, arrayDifference(xs) AS ad,"
        " arrayCumSum(xs) AS cs FROM t ORDER BY k",
        {"t": t},
    ).collect()
    assert tuple(r[0])[1:] == (
        [1, 2, 3], False, True, 2, [3, 1, 2, 5],
        [0, -2, 1, 0, 3], [3, 4, 6, 8, 13],
    )
    assert tuple(r[1])[1:] == ([], False, False, 0, [7], [0], [7])


def test_string_codec_and_math_shims(spark):
    """left/right, base64/hex round-trips, bitCount, exp2/exp10,
    degrees, cot — and the statistics aggregate family."""
    from baseline_magician_spark.plans.ch_sql import run_ch_query

    t = spark.createDataFrame(
        [(1, "abcdef"), (2, "XYZ"), (3, "mn")], "k long, s string"
    )
    env = {"t": t}
    r = run_ch_query(
        "SELECT left(s, 2) AS l, right(s, 2) AS r,"
        " base64Decode(base64Encode(s)) AS b, unhex(hex(s)) AS h,"
        " bitCount(k) AS bc FROM t ORDER BY k",
        env,
    ).collect()
    assert [(x["l"], x["r"]) for x in r] == [
        ("ab", "ef"), ("XY", "YZ"), ("mn", "mn")
    ]
    assert all(x["b"] == x["h"] for x in r)
    assert [x["bc"] for x in r] == [1, 1, 2]
    row = run_ch_query(
        "SELECT exp2(3.0) AS e2, exp10(2.0) AS e10,"
        " degrees(pi()) AS dg, cot(1.0) AS ct FROM t LIMIT 1",
        env,
    ).first()
    assert row["e2"] == 8.0 and row["e10"] == 100.0
    assert abs(row["dg"] - 180.0) < 1e-9
    assert abs(row["ct"] - 0.6420926159343306) < 1e-12
    row = run_ch_query(
        "SELECT stddevPop(k) AS sp, stddevSamp(k) AS ss,"
        " varPop(k) AS vp, varSamp(k) AS vs, corr(k, k) AS c,"
        " median(k) AS md, avgWeighted(k, k) AS aw FROM t",
        env,
    ).first()
    assert abs(row["vp"] - 2.0 / 3.0) < 1e-12 and row["vs"] == 1.0
    assert row["c"] == 1.0 and row["md"] == 2.0
    assert abs(row["aw"] - 14.0 / 6.0) < 1e-12
