"""Round-7b tranche: the toRelative*Num bucket family (DateLUT
closed forms), fromModifiedJulianDay, clamp/toDecimalString, the
128/256-bit cast shims, byte/bit slicing, arrayShingles, ngramSearch,
and ULID/UUIDv7 timestamp extraction."""

from __future__ import annotations

import datetime

from baseline_magician_spark.plans.ch_sql import run_ch_query


def _one(spark, sql):
    t = spark.createDataFrame([(1,)], "i long")
    return run_ch_query(sql, {"t": t}).collect()[0].r


def test_relative_nums(spark):
    # toRelativeMonthNum('2002-05-07') = 2002*12 + 5 (CH DateLUT
    # keeps the +month asymmetry); quarter uses (month-1)/3
    assert _one(
        spark, "SELECT toRelativeMonthNum(toDate('2002-05-07')) AS r FROM t"
    ) == 24029
    assert _one(
        spark,
        "SELECT toRelativeQuarterNum(toDate('2002-05-07')) AS r FROM t",
    ) == 8009
    assert _one(
        spark, "SELECT toRelativeYearNum(toDate('2002-05-07')) AS r FROM t"
    ) == 2002


def test_relative_week_rolls_on_monday(spark):
    # 1970-01-01 was a Thursday: week 0 runs through Sunday 01-04,
    # week 1 begins Monday 01-05
    for d, want in [
        ("1970-01-01", 0),
        ("1970-01-04", 0),
        ("1970-01-05", 1),
        ("1970-01-11", 1),
        ("1970-01-12", 2),
    ]:
        got = _one(
            spark,
            f"SELECT toRelativeWeekNum(toDate('{d}')) AS r FROM t",
        )
        assert got == want, (d, got, want)


def test_relative_sub_day_nums(spark):
    assert _one(
        spark,
        "SELECT toRelativeHourNum("
        "toDateTime('1970-01-02 03:59:59')) AS r FROM t",
    ) == 27
    assert _one(
        spark,
        "SELECT toRelativeMinuteNum("
        "toDateTime('1970-01-01 00:02:30')) AS r FROM t",
    ) == 2
    assert _one(
        spark,
        "SELECT toRelativeSecondNum("
        "toDateTime('1970-01-01 00:00:42')) AS r FROM t",
    ) == 42


def test_from_modified_julian_day(spark):
    # inverse of the existing toModifiedJulianDay: MJD 58849 is
    # 2020-01-01; the OrNull form survives garbage
    assert _one(
        spark, "SELECT fromModifiedJulianDay(58849) AS r FROM t"
    ) == datetime.date(2020, 1, 1)
    assert _one(
        spark,
        "SELECT toModifiedJulianDay(fromModifiedJulianDay(0)) AS r FROM t",
    ) == 0
    assert _one(
        spark,
        "SELECT fromModifiedJulianDayOrNull(concat(toString(i), 'x')) "
        "AS r FROM t",
    ) is None


def test_clamp_and_decimal_string(spark):
    assert _one(spark, "SELECT clamp(7, 1, 5) AS r FROM t") == 5
    assert _one(spark, "SELECT clamp(-3, 1, 5) AS r FROM t") == 1
    assert _one(spark, "SELECT clamp(3, 1, 5) AS r FROM t") == 3
    assert _one(
        spark, "SELECT toDecimalString(2.5, 4) AS r FROM t"
    ) == "2.5000"
    assert _one(
        spark, "SELECT toDecimalString(64.32, 5) AS r FROM t"
    ) == "64.32000"


def test_int128_casts(spark):
    v = "-170141183460469231731687303715884105"
    assert _one(
        spark, f"SELECT toString(toInt128('{v}')) AS r FROM t"
    ) == v
    assert _one(
        spark,
        "SELECT toString(toUInt128('18446744073709551616')) AS r FROM t",
    ) == "18446744073709551616"  # 2^64: past UInt64, fine in 128


def test_byte_slice(spark):
    assert _one(
        spark, "SELECT byteSlice('hello world', 7, 5) AS r FROM t"
    ) == "world"
    assert _one(
        spark, "SELECT byteSlice('hello', -3, 2) AS r FROM t"
    ) == "ll"
    assert _one(
        spark, "SELECT byteSlice('hello world', 7) AS r FROM t"
    ) == "world"


def test_bit_slice(spark):
    # 'A' = 0x41 = 0100 0001 -> first 4 bits, right-padded: 0x40
    cases = [
        ("bitSlice('A', 1, 4)", "40"),
        # 'AB' = 0x41 0x42; bits 5..12 cross the byte boundary
        ("bitSlice('AB', 5, 8)", "14"),
        ("bitSlice('AB', 1)", "4142"),
        ("bitSlice('AB', -8)", "42"),  # negative offset: from end
        ("bitSlice('AB', 5, -4)", "14"),  # negative length: leave 4
        ("bitSlice('AB', 9, 0)", ""),  # empty slice
        ("bitSlice('AB', 1, 99)", "4142"),  # clamped to the string
        # regression (r8 ADVICE): negative offset beyond the string
        # (start <= 0) must read nothing, not substring-from-the-end
        ("bitSlice('AB', -99)", ""),
        ("bitSlice('AB', -17)", ""),
        ("bitSlice('AB', -16)", "4142"),
    ]
    for expr, want in cases:
        got = _one(spark, f"SELECT hex({expr}) AS r FROM t")
        assert got == want, (expr, got, want)


def test_array_shingles(spark):
    assert _one(
        spark,
        "SELECT toString(arrayShingles([1,2,3,4], 3)) AS r FROM t",
    ) == "[[1, 2, 3], [2, 3, 4]]"
    assert _one(
        spark,
        "SELECT toString(arrayShingles([1,2], 3)) AS r FROM t",
    ) == "[]"
    assert _one(
        spark,
        "SELECT toString(arrayShingles(['a','b'], 1)) AS r FROM t",
    ) == "[[a], [b]]"


def test_ngram_search(spark):
    # every 4-gram of the needle is inside the haystack -> 1.0
    assert _one(
        spark,
        "SELECT ngramSearch('clickhouse engine', 'house') AS r FROM t",
    ) == 1.0
    assert _one(
        spark,
        "SELECT ngramSearch('abcdef', 'xyzw') AS r FROM t",
    ) == 0.0
    assert _one(
        spark,
        "SELECT ngramSearchCaseInsensitive('CLICKHOUSE', 'house') "
        "AS r FROM t",
    ) == 1.0
    # asymmetry vs the Dice-style distance: needle in haystack
    # scores full even when the haystack is much larger
    assert _one(
        spark,
        "SELECT ngramDistance('clickhouse engine', 'house') AS r FROM t",
    ) > 0.0


def test_ulid_uuid7_timestamps(spark):
    # decoded against an independent Crockford-base32 reference
    got = _one(
        spark,
        "SELECT toUnixTimestamp64Milli(ULIDStringToDateTime("
        "'01ARZ3NDEKTSV4RRFFQ69G5FAV')) AS r FROM t",
    )
    assert got == 1469922850259
    assert _one(
        spark,
        "SELECT ULIDStringToDateTime('not-a-ulid!') AS r FROM t",
    ) is None
    # UUIDv7: first 48 bits are unix-ms; version nibble gated
    got = _one(
        spark,
        "SELECT toUnixTimestamp64Milli(UUIDv7ToDateTime("
        "'018f05af-f7a9-778a-8f9b-123456789abc')) AS r FROM t",
    )
    assert got == 0x018F05AFF7A9
    assert _one(
        spark,
        "SELECT UUIDv7ToDateTime("
        "'018f05af-f7a9-478a-8f9b-123456789abc') AS r FROM t",
    ) is None  # version 4, not 7


def test_generate_ulid_shape(spark):
    rows = run_ch_query(
        "SELECT generateULID() AS u FROM t",
        {
            "t": spark.createDataFrame(
                [(i,) for i in range(8)], "i long"
            )
        },
    ).collect()
    alpha = set("0123456789ABCDEFGHJKMNPQRSTVWXYZ")
    seen = set()
    for r in rows:
        assert len(r.u) == 26
        assert set(r.u) <= alpha
        seen.add(r.u)
    assert len(seen) > 1  # random tail varies per row


def _b58_ref(data: bytes) -> str:
    """Independent reference encoder (classic big-int algorithm)."""
    alpha = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
    n = int.from_bytes(data, "big")
    out = ""
    while n:
        n, r = divmod(n, 58)
        out = alpha[r] + out
    return "1" * (len(data) - len(data.lstrip(b"\x00"))) + out


def test_base58_known_vectors(spark):
    cases = [
        ("Hello World!", "2NEpo7TZRRrLZSi2U"),
        ("The quick brown fox jumps over the lazy dog.",
         "USm3fpXnKG5EUBx2ndxBDMPVciP5hGey2Jh4NDv6gmeo1LkMeiKrLJUUBk6Z"),
        ("", ""),
    ]
    for raw, want in cases:
        assert _b58_ref(raw.encode()) == want  # reference sanity
        got = _one(spark, f"SELECT base58Encode('{raw}') AS r FROM t")
        assert got == want, (raw, got)


def test_base58_leading_zero_bytes(spark):
    # 0x0000287fb4cd -> '11233QC4' (the canonical leading-zeros vector)
    got = _one(
        spark,
        "SELECT base58Encode(unhex('0000287FB4CD')) AS r FROM t",
    )
    assert got == "11233QC4"
    got = _one(
        spark,
        "SELECT hex(base58Decode('11233QC4')) AS r FROM t",
    )
    assert got == "0000287FB4CD"


def test_base58_all_zero_bytes(spark):
    # regression (r8 ADVICE): array_position returns 0 (not NULL) on
    # not-found, so an ALL-zero input miscounted leading zeros as -1
    # and encoded to '' instead of '1' * len
    assert _one(
        spark, "SELECT base58Encode(unhex('00')) AS r FROM t"
    ) == "1"
    assert _one(
        spark, "SELECT base58Encode(unhex('0000')) AS r FROM t"
    ) == "11"
    assert _one(
        spark, "SELECT hex(base58Decode('11')) AS r FROM t"
    ) == "0000"
    assert _one(
        spark, "SELECT hex(base58Decode('1111')) AS r FROM t"
    ) == "00000000"


def test_base58_roundtrip_and_reference(spark):
    strs = [
        "a", "ab", "abc", "src7:12345", "x" * 24,
        "The quick brown fox", "0", "1", "zz9",
    ]
    sel = ", ".join(
        f"base58Encode('{s}') AS e{i}, "
        f"base58Decode(base58Encode('{s}')) AS d{i}"
        for i, s in enumerate(strs)
    )
    row = run_ch_query(
        f"SELECT {sel} FROM t",
        {"t": _spark_one(spark)},
    ).collect()[0]
    for i, s in enumerate(strs):
        assert row[f"e{i}"] == _b58_ref(s.encode()), s
        assert row[f"d{i}"] == s, s


def test_base58_decode_invalid_is_null(spark):
    for bad in ["0OIl", "abc!", "a b"]:
        assert _one(
            spark, f"SELECT tryBase58Decode('{bad}') AS r FROM t"
        ) is None


def _spark_one(spark):
    return spark.createDataFrame([(1,)], "i long")


def test_series_period_detect_fft(spark):
    # CH's documented example: [1,4,6] repeated -> period 3
    assert _one(
        spark,
        "SELECT seriesPeriodDetectFFT([1,4,6,1,4,6,1,4,6,1,4,6,"
        "1,4,6,1,4,6,1,4,6]) AS r FROM t",
    ) == 3.0
    # sawtooth of period 5 over 60 points
    assert _one(
        spark,
        "SELECT seriesPeriodDetectFFT(arrayMap(i -> toFloat64(i % 5),"
        " range(60))) AS r FROM t",
    ) == 5.0
    # guards: < 4 points, constant series
    assert _one(
        spark,
        "SELECT seriesPeriodDetectFFT([1.0, 2.0, 3.0]) AS r FROM t",
    ) is None
    assert _one(
        spark,
        "SELECT seriesPeriodDetectFFT(arrayWithConstant(8, 2.0)) "
        "AS r FROM t",
    ) is None
    # regression (r8 ADVICE): the constant-series guard is relative
    # to series energy — a periodic series of tiny amplitude (~1e-6)
    # must still report its period, not NULL out on an absolute cutoff
    assert _one(
        spark,
        "SELECT seriesPeriodDetectFFT(arrayMap(i -> "
        "toFloat64(i % 5) * 1e-6, range(60))) AS r FROM t",
    ) == 5.0


def test_sigmoid(spark):
    assert _one(spark, "SELECT sigmoid(0) AS r FROM t") == 0.5
    got = _one(spark, "SELECT round(sigmoid(2.0), 6) AS r FROM t")
    assert abs(got - 0.880797) < 1e-6
    # symmetry: sigmoid(-x) = 1 - sigmoid(x)
    got = _one(
        spark,
        "SELECT round(sigmoid(-1.5) + sigmoid(1.5), 10) AS r FROM t",
    )
    assert got == 1.0


def test_map_arithmetic(spark):
    assert _one(
        spark,
        "SELECT toString(mapAdd(map('a', 1, 'b', 2), "
        "map('b', 10, 'c', 3))) AS r FROM t",
    ) == "{a -> 1, b -> 12, c -> 3}"
    assert _one(
        spark,
        "SELECT toString(mapSubtract(map('a', 5, 'b', 2), "
        "map('b', 10))) AS r FROM t",
    ) == "{a -> 5, b -> -8}"


def test_map_populate_series(spark):
    assert _one(
        spark,
        "SELECT toString(mapPopulateSeries("
        "mapFromArrays([1, 4], [11, 44]))) AS r FROM t",
    ) == "{1 -> 11, 2 -> 0, 3 -> 0, 4 -> 44}"
    assert _one(
        spark,
        "SELECT toString(mapPopulateSeries("
        "mapFromArrays([1, 2], [1, 1]), 5)) AS r FROM t",
    ) == "{1 -> 1, 2 -> 1, 3 -> 0, 4 -> 0, 5 -> 0}"


def test_group_array_sample(spark):
    rows = spark.createDataFrame(
        [(i,) for i in range(10)], "i long"
    )
    df = run_ch_query(
        "SELECT groupArraySample(3)(i) AS s, "
        "groupArraySample(3, 7)(i) AS s7, "
        "groupArraySample(99)(i) AS all_of FROM t",
        {"t": rows},
    ).collect()[0]
    assert len(df.s) == 3 and set(df.s) <= set(range(10))
    assert len(df.s7) == 3 and set(df.s7) <= set(range(10))
    assert df.s != df.s7  # seed changes the ranking
    assert sorted(df.all_of) == list(range(10))  # n >= group: all
    # deterministic: same seed -> same pick
    again = run_ch_query(
        "SELECT groupArraySample(3)(i) AS s FROM t", {"t": rows}
    ).collect()[0]
    assert again.s == df.s


def test_quantile_interpolated_weighted(spark):
    rows = spark.createDataFrame(
        [(i, float(i), 1 + i % 3) for i in range(10)],
        "i long, v double, w long",
    )

    def _py_ref(vals, wts, lv):
        pairs = sorted(zip(vals, wts))
        total = sum(w for _, w in pairs)
        tgt = lv * total
        cum, prev_c, prev_v = 0.0, None, None
        for v, w in pairs:
            c = cum + w - w / 2.0
            if tgt <= c:
                if prev_c is None:
                    return v
                return prev_v + (v - prev_v) * (tgt - prev_c) / (
                    c - prev_c
                )
            cum, prev_c, prev_v = cum + w, c, v
        return pairs[-1][0]

    vals = list(range(10))
    wts = [1 + i % 3 for i in range(10)]
    for lv in (0.01, 0.25, 0.5, 0.75, 0.99):
        got = run_ch_query(
            f"SELECT quantileInterpolatedWeighted({lv})(v, w) AS r "
            "FROM t",
            {"t": rows},
        ).collect()[0].r
        want = _py_ref([float(v) for v in vals], wts, lv)
        assert abs(got - want) < 1e-9, (lv, got, want)


def test_array_set_ops(spark):
    assert _one(
        spark,
        "SELECT toString(arrayUnion([1,2], [2,3], [4])) AS r FROM t",
    ) == "[1, 2, 3, 4]"
    assert _one(
        spark,
        "SELECT toString(arraySymmetricDifference([1,2,3], [2,3,4]))"
        " AS r FROM t",
    ) == "[1, 4]"


def test_map_like_helpers(spark):
    assert _one(
        spark,
        "SELECT toString(mapExtractKeyLike(map('ka', 1, 'xb', 2),"
        " 'k%')) AS r FROM t",
    ) == "{ka -> 1}"
    assert _one(
        spark,
        "SELECT mapContainsValueLike(map('a', 'hello'), 'he%') "
        "AS r FROM t",
    ) is True
    assert _one(
        spark,
        "SELECT mapContainsValueLike(map('a', 'hello'), 'zz%') "
        "AS r FROM t",
    ) is False


def test_week_boundary_modes(spark):
    # 2024-05-15 is a Wednesday: Sunday-start week is May 12..18,
    # Monday-start (mode 1) begins May 13
    assert str(_one(
        spark,
        "SELECT toStartOfWeek(toDate('2024-05-15')) AS r FROM t",
    )) == "2024-05-12"
    assert str(_one(
        spark,
        "SELECT toStartOfWeek(toDate('2024-05-15'), 1) AS r FROM t",
    )) == "2024-05-13"
    assert str(_one(
        spark,
        "SELECT toLastDayOfWeek(toDate('2024-05-15')) AS r FROM t",
    )) == "2024-05-18"
    # Sunday input stays put in mode 0
    assert str(_one(
        spark,
        "SELECT toStartOfWeek(toDate('2024-05-12')) AS r FROM t",
    )) == "2024-05-12"


def test_url_parameter_tail(spark):
    assert _one(
        spark,
        "SELECT cutWWW('https://www.example.com/a') AS r FROM t",
    ) == "https://example.com/a"
    assert _one(
        spark,
        "SELECT queryStringAndFragment('http://e.com/p?x=1#f') "
        "AS r FROM t",
    ) == "?x=1#f"
    assert _one(
        spark,
        "SELECT toString(extractURLParameters("
        "'http://e.com/p?x=1&y=2#f')) AS r FROM t",
    ) == "[x=1, y=2]"
    assert _one(
        spark,
        "SELECT toString(extractURLParameterNames("
        "'http://e.com/p?x=1&y=2')) AS r FROM t",
    ) == "[x, y]"


def test_json_probes(spark):
    assert _one(
        spark, "SELECT isValidJSON('{\"k\": 1}') AS r FROM t"
    ) is True
    assert _one(
        spark, "SELECT isValidJSON('{bad') AS r FROM t"
    ) is False
    assert _one(
        spark, "SELECT JSONArrayLength('[1,2,3]') AS r FROM t"
    ) == 3
    assert _one(
        spark, "SELECT toJSONString([1, 2, 3]) AS r FROM t"
    ) == "[1,2,3]"
    # regression (r8 ADVICE): scalars must serialize too — bare
    # to_json raises AnalysisException on non-complex input
    assert _one(
        spark, "SELECT toJSONString(42) AS r FROM t"
    ) == "42"
    assert _one(
        spark, "SELECT toJSONString('a\"b') AS r FROM t"
    ) == '"a\\"b"'
    assert _one(
        spark, "SELECT toJSONString(NULL) AS r FROM t"
    ) == "null"
    assert _one(
        spark, "SELECT toJSONString(map('k', 1)) AS r FROM t"
    ) == '{"k":1}'


def test_half_md5_byte_compatible(spark):
    import hashlib

    for s in ("abc", "", "ClickHouse", "src7:123"):
        want = int.from_bytes(
            hashlib.md5(s.encode()).digest()[:8], "big"
        )
        got = _one(
            spark, f"SELECT toString(halfMD5('{s}')) AS r FROM t"
        )
        assert got == str(want), s


def test_parse_readable_size(spark):
    cases = [
        ("1.5 KiB", 1536),
        ("2 MB", 2_000_000),
        ("1 GiB", 1024 ** 3),
        ("7b", 7),
    ]
    for raw, want in cases:
        got = _one(
            spark, f"SELECT parseReadableSize('{raw}') AS r FROM t"
        )
        assert got == want, (raw, got)
    assert _one(
        spark, "SELECT parseReadableSize('junk') AS r FROM t"
    ) is None
    assert _one(
        spark, "SELECT parseReadableSizeOrZero('junk') AS r FROM t"
    ) == 0


def test_parse_time_delta(spark):
    cases = [
        ("1h 30m", 5400.0),
        ("2.5 seconds", 2.5),
        ("1 day", 86400.0),
        ("1w2d", 604800.0 + 2 * 86400.0),
    ]
    for raw, want in cases:
        got = _one(
            spark,
            f"SELECT round(parseTimeDelta('{raw}'), 6) AS r FROM t",
        )
        assert got == want, (raw, got)
    assert _one(
        spark, "SELECT parseTimeDelta('5 parsecs') AS r FROM t"
    ) is None


def test_array_normalized_gini(spark):
    # against an independent NumPy-free reference of the same
    # construction (labels by prediction desc vs labels desc)
    def ref(pred, label):
        n = len(label)
        by_pred = [l for _, l in
                   sorted(zip(pred, label), reverse=True)]
        ideal = sorted(label, reverse=True)

        def gini(seq):
            cum = acc = 0.0
            for x in seq:
                cum += x
                acc += cum
            return (acc / cum - (n + 1) / 2.0) / n

        gm, gi = gini(by_pred), gini(ideal)
        return gm, gi, gm / gi

    pred = [0.9, 0.3, 0.8, 0.7]
    label = [6.0, 1.0, 0.0, 2.0]
    gm, gi, nz = ref(pred, label)
    row = run_ch_query(
        "SELECT round(tupleElement(arrayNormalizedGini("
        "[0.9, 0.3, 0.8, 0.7], [6.0, 1.0, 0.0, 2.0]), 'gini'), 9)"
        " AS gm, "
        "round(tupleElement(arrayNormalizedGini("
        "[0.9, 0.3, 0.8, 0.7], [6.0, 1.0, 0.0, 2.0]),"
        " 'gini_ideal'), 9) AS gi, "
        "round(tupleElement(arrayNormalizedGini("
        "[0.9, 0.3, 0.8, 0.7], [6.0, 1.0, 0.0, 2.0]),"
        " 'normalized'), 9) AS nz FROM t",
        {"t": _spark_one(spark)},
    ).collect()[0]
    assert abs(row.gm - gm) < 1e-9
    assert abs(row.gi - gi) < 1e-9
    assert abs(row.nz - nz) < 1e-9


def test_murmur_family_mutually_independent(spark):
    # canonical since round 9 (was the stand-in determinism probe);
    # byte-exactness is pinned in tests/test_murmur.py and
    # tests/test_murmur3_128.py — this keeps the cross-family
    # independence and 128-bit shape assertions
    row = run_ch_query(
        "SELECT murmurHash2_64('x') AS a, murmurHash3_64('x') AS b, "
        "murmurHash2_32('x') AS c, murmurHash3_32('x') AS d, "
        "murmurHash3_128('x') AS e, randConstant() AS rc FROM t",
        {"t": _spark_one(spark)},
    ).collect()[0]
    assert row.a != row.b  # families stay mutually independent
    assert row.c != row.d
    assert len(row.e) == 32
    assert 0.0 <= row.rc < 1.0


def test_group_bitmap_set_aggregates(spark):
    rows = spark.createDataFrame(
        [(i,) for i in range(10)], "k long"
    )
    r = run_ch_query(
        "SELECT groupBitmapAnd(bitmapBuild([k % 4, 1, 2])) AS ba, "
        "groupBitmapOr(bitmapBuild([k % 4])) AS bo, "
        "groupBitmapXor(bitmapBuild([k])) AS bx FROM t",
        {"t": rows},
    ).collect()[0]
    assert r.ba == 2  # only {1, 2} survive every row's set
    assert r.bo == 4  # union = {0, 1, 2, 3}
    assert r.bx == 10  # each k appears exactly once -> all odd


def test_if_combinator_on_two_arg_bases(spark):
    rows = spark.createDataFrame(
        [(1.0, 2.0, 1), (2.0, 4.0, 1), (3.0, 6.0, 1),
         (100.0, 1.0, 0)],
        "x double, y double, g int",
    )
    r = run_ch_query(
        "SELECT round(corrIf(x, y, g = 1), 6) AS c, "
        "round(avgWeightedIf(x, y, g = 1), 6) AS aw, "
        "covarSampIf(x, y, g = 1) AS cv, "
        "sumKahanIf(x, g = 1) AS sk, "
        "round(entropyIf(x, g = 1), 6) AS e FROM t",
        {"t": rows},
    ).collect()[0]
    assert r.c == 1.0
    assert r.aw == round(28 / 12, 6)
    assert r.cv == 2.0
    assert r.sk == 6.0
    assert r.e == round(__import__("math").log2(3), 6)


def test_avg_weighted_skips_null_pairs(spark):
    # the weight of a NULL-value row must not leak into the
    # denominator (and vice versa)
    rows = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (None, 9.0),
         (4.0, None)],
        "x double, y double",
    )
    got = run_ch_query(
        "SELECT round(avgWeighted(x, y), 6) AS r FROM t",
        {"t": rows},
    ).collect()[0].r
    assert got == round(28 / 12, 6)


def test_entropy_skips_nulls(spark):
    rows = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,), (None,)], "x double"
    )
    got = run_ch_query(
        "SELECT round(entropy(x), 6) AS r FROM t", {"t": rows}
    ).collect()[0].r
    assert got == round(__import__("math").log2(3), 6)


def test_weighted_timing_quantile_aliases(spark):
    rows = spark.createDataFrame(
        [(float(i), 1 + i % 3) for i in range(10)],
        "v double, w int",
    )
    a = run_ch_query(
        "SELECT quantileTimingWeighted(0.5)(v, w) AS r FROM t",
        {"t": rows},
    ).collect()[0].r
    b = run_ch_query(
        "SELECT quantileExactWeighted(0.5)(v, w) AS r FROM t",
        {"t": rows},
    ).collect()[0].r
    assert a == b


def test_utf8_spelling_aliases(spark):
    assert _one(
        spark,
        "SELECT ngramSearchUTF8('clickhouse', 'house') AS r FROM t",
    ) == 1.0
    assert _one(
        spark,
        "SELECT ngramDistanceUTF8('abc', 'abc') AS r FROM t",
    ) == 0.0
    assert _one(
        spark, "SELECT isValidUTF8('ok') AS r FROM t"
    ) is True


def test_excel_quantile_conventions(spark):
    # PERCENTILE.INC / PERCENTILE.EXC reference values for 1..10
    import statistics

    rows = spark.createDataFrame(
        [(float(i),) for i in range(1, 11)], "v double"
    )
    for lv in (0.25, 0.5, 0.9):
        inc = run_ch_query(
            f"SELECT quantileExactInclusive({lv})(v) AS r FROM t",
            {"t": rows},
        ).collect()[0].r
        exc = run_ch_query(
            f"SELECT quantileExactExclusive({lv})(v) AS r FROM t",
            {"t": rows},
        ).collect()[0].r
        want_inc = statistics.quantiles(
            range(1, 11), n=100, method="inclusive"
        )[int(lv * 100) - 1]
        want_exc = statistics.quantiles(
            range(1, 11), n=100, method="exclusive"
        )[int(lv * 100) - 1]
        assert abs(inc - want_inc) < 1e-9, (lv, inc, want_inc)
        assert abs(exc - want_exc) < 1e-9, (lv, exc, want_exc)
    # plural form returns the digest-ready array
    both = run_ch_query(
        "SELECT arrayStringConcat(arrayMap(x -> toString("
        "round(x, 6)), quantilesExactInclusive(0.25, 0.75)(v)), ',')"
        " AS r FROM t",
        {"t": rows},
    ).collect()[0].r
    assert both == "3.25,7.75"


def test_array_aucpr_matches_reference(spark):
    def ap_ref(scores, labels):
        pairs = sorted(
            zip(scores, labels), key=lambda p: (-p[0], -p[1])
        )
        npos = sum(l for _, l in pairs)
        tp = fp = 0
        auc = 0.0
        for _, l in pairs:
            if l:
                tp += 1
                auc += (tp / (tp + fp)) / npos
            else:
                fp += 1
        return auc

    scores = [0.9, 0.8, 0.7, 0.6, 0.5, 0.4]
    labels = [1, 0, 1, 1, 0, 0]
    want = ap_ref(scores, labels)
    got = _one(
        spark,
        "SELECT arrayAUCPR([0.9, 0.8, 0.7, 0.6, 0.5, 0.4],"
        " [1, 0, 1, 1, 0, 0]) AS r FROM t",
    )
    assert abs(got - want) < 1e-9
    # no positives -> NULL
    assert _one(
        spark,
        "SELECT arrayAUCPR([0.9, 0.1], [0, 0]) AS r FROM t",
    ) is None


def test_parametric_if_composition(spark):
    rows = spark.createDataFrame(
        [(i, float(i % 7), i % 3, 1 + i % 2) for i in range(12)],
        "k long, v double, g long, w long",
    )

    def one(sql):
        return run_ch_query(sql, {"t": rows}).collect()[0].r

    # quantileExactIf == quantileExact over the condition-filtered set
    filt = spark.createDataFrame(
        [(float(i % 7),) for i in range(12) if i % 3 == 0],
        "v double",
    )
    want = run_ch_query(
        "SELECT quantileExact(0.5)(v) AS r FROM t", {"t": filt}
    ).collect()[0].r
    got = one("SELECT quantileExactIf(0.5)(v, g = 0) AS r FROM t")
    assert got == want
    # parameterless spelling defaults the level
    assert one("SELECT quantileIf(v, g = 0) AS r FROM t") == one(
        "SELECT quantileIf(0.5)(v, g = 0) AS r FROM t"
    )
    # two-inner-column family
    got = one(
        "SELECT quantileExactWeightedIf(0.5)(v, w, g = 0) AS r FROM t"
    )
    assert got is not None
    # topK with the mask
    got = one("SELECT toString(topKIf(2)(k % 4, g = 1)) AS r FROM t")
    assert got == "[0, 1]"


def test_map_aggregate_overloads_and_if(spark):
    rows = spark.createDataFrame(
        [(i, i % 3, f"k{i % 2}") for i in range(8)],
        "k long, g long, name string",
    )

    def one(sql):
        return run_ch_query(sql, {"t": rows}).collect()[0].r

    # single-Map overload equals the two-array spelling
    assert one(
        "SELECT toString(sumMap(map(name, k))) AS r FROM t"
    ) == one("SELECT toString(sumMap([name], [k])) AS r FROM t")
    # -If masks whole rows out of the map fold
    assert one(
        "SELECT toString(sumMapIf(map(name, k), g = 1)) AS r FROM t"
    ) == "{[k0, k1], [4, 8]}"
    assert one(
        "SELECT toString(minMapIf([name], [k], g < 2)) AS r FROM t"
    ) == "{[k0, k1], [0, 1]}"
