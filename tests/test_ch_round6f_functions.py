"""Round-6f tranche: rankCorr, meanZTest, exponentialTimeDecayed
family, corrMatrix/covarSampMatrix aggregates plus the map/bit/hash
scalar tail — each pinned against an independent Python reference."""

from __future__ import annotations

import math

import pytest

from baseline_magician_spark.plans.ch_sql import run_ch_query


def _one(spark, sql, df=None, name="t"):
    if df is None:
        df = spark.createDataFrame([(1,)], "id int")
    return run_ch_query(sql, {name: df}).collect()[0][0]


DATA = [(i, i % 2, float((i * i) % 17), float(i * 3 % 11)) for i in range(1, 25)]


def _df(spark):
    return spark.createDataFrame(DATA, "id int, grp int, v double, t double")


# --- rankCorr --------------------------------------------------------------


def _avg_ranks(vals):
    return [
        (sum(1 for o in vals if o < v) + sum(1 for o in vals if o <= v) + 1)
        / 2.0
        for v in vals
    ]


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    return (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )


def test_rank_corr_matches_spearman(spark):
    got = _one(spark, "SELECT rankCorr(v, t) FROM t", _df(spark))
    xs = [r[2] for r in DATA]
    ys = [r[3] for r in DATA]
    want = _pearson(_avg_ranks(xs), _avg_ranks(ys))
    assert got == pytest.approx(want, abs=1e-12)


def test_rank_corr_perfect_monotone(spark):
    df = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(1, 11)], "v double, t double"
    )
    assert _one(spark, "SELECT rankCorr(v, t) FROM t", df) == pytest.approx(
        1.0
    )
    assert _one(spark, "SELECT rankCorr(v, -t) FROM t", df) == pytest.approx(
        -1.0
    )


def test_rank_corr_constant_column_is_null(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (1.0, 3.0), (1.0, 4.0)], "v double, t double"
    )
    assert _one(spark, "SELECT rankCorr(v, t) FROM t", df) is None


# --- meanZTest -------------------------------------------------------------


def test_mean_z_test_closed_form(spark):
    got = run_ch_query(
        "SELECT meanZTest(4.0, 9.0, 0.90)(v, grp) AS r FROM t",
        {"t": _df(spark)},
    ).collect()[0].r
    g0 = [r[2] for r in DATA if r[1] == 0]
    g1 = [r[2] for r in DATA if r[1] != 0]
    m0, m1 = sum(g0) / len(g0), sum(g1) / len(g1)
    se = math.sqrt(4.0 / len(g0) + 9.0 / len(g1))
    z = (m0 - m1) / se
    assert got.z_statistic == pytest.approx(z, abs=1e-12)
    p = 2 * (1 - 0.5 * (1 + math.erf(abs(z) / math.sqrt(2))))
    assert got.p_value == pytest.approx(p, abs=1e-6)
    # 90% two-sided quantile = Phi^-1(0.95) = 1.6448536...
    zq = 1.6448536269514722
    assert got.confidence_interval_low == pytest.approx(
        (m0 - m1) - zq * se, abs=1e-8
    )
    assert got.confidence_interval_high == pytest.approx(
        (m0 - m1) + zq * se, abs=1e-8
    )


# --- exponentialTimeDecayed family ----------------------------------------


def _decayed(kind, pairs, x):
    tmax = max(t for t, _ in pairs)
    ws = [(v * math.exp((t - tmax) / x)) for t, v in pairs]
    ds = [math.exp((t - tmax) / x) for t, _ in pairs]
    if kind == "Sum":
        return sum(ws)
    if kind == "Count":
        return sum(ds)
    if kind == "Max":
        return max(ws)
    return sum(ws) / sum(ds)


@pytest.mark.parametrize("kind", ["Sum", "Count", "Max", "Avg"])
def test_exponential_time_decayed(spark, kind):
    got = _one(
        spark,
        f"SELECT exponentialTimeDecayed{kind}(7.0)(v, t) FROM t",
        _df(spark),
    )
    pairs = [(r[3], r[2]) for r in DATA]
    assert got == pytest.approx(_decayed(kind, pairs, 7.0), rel=1e-9)


def test_exponential_time_decayed_max_negative_values(spark):
    # every value negative: the multiplicative decay of the stored max
    # must still track max_i v_i * e^((t_i - t_max)/x)
    df = spark.createDataFrame(
        [(-5.0, 1.0), (-1.0, 2.0), (-3.0, 3.0)], "v double, t double"
    )
    got = _one(spark, "SELECT exponentialTimeDecayedMax(2.0)(v, t) FROM t", df)
    want = _decayed("Max", [(1.0, -5.0), (2.0, -1.0), (3.0, -3.0)], 2.0)
    assert got == pytest.approx(want, rel=1e-12)


# --- matrices --------------------------------------------------------------


def test_corr_matrix_shape_and_values(spark):
    got = _one(spark, "SELECT corrMatrix(v, t, id) FROM t", _df(spark))
    assert len(got) == 3 and all(len(r) == 3 for r in got)
    for i in range(3):
        assert got[i][i] == pytest.approx(1.0)
    cols = [[float(r[2]) for r in DATA], [float(r[3]) for r in DATA],
            [float(r[0]) for r in DATA]]

    def corr(a, b):
        n = len(a)
        ma, mb = sum(a) / n, sum(b) / n
        num = sum((x - ma) * (y - mb) for x, y in zip(a, b))
        den = math.sqrt(
            sum((x - ma) ** 2 for x in a) * sum((y - mb) ** 2 for y in b)
        )
        return num / den

    assert got[0][1] == pytest.approx(corr(cols[0], cols[1]), abs=1e-10)
    assert got[1][2] == pytest.approx(corr(cols[1], cols[2]), abs=1e-10)
    # corr(a,b) and corr(b,a) may differ in the last ulp (summation
    # order inside Spark's Corr moments)
    assert got[0][1] == pytest.approx(got[1][0], abs=1e-12)


def test_covar_samp_matrix(spark):
    got = _one(spark, "SELECT covarSampMatrix(v, t) FROM t", _df(spark))
    a = [float(r[2]) for r in DATA]
    b = [float(r[3]) for r in DATA]
    n = len(a)
    ma, mb = sum(a) / n, sum(b) / n
    cov = sum((x - ma) * (y - mb) for x, y in zip(a, b)) / (n - 1)
    var_a = sum((x - ma) ** 2 for x in a) / (n - 1)
    assert got[0][0] == pytest.approx(var_a, abs=1e-9)
    assert got[0][1] == pytest.approx(cov, abs=1e-9)
    assert got[0][1] == pytest.approx(got[1][0], abs=1e-12)


# --- scalar tail -----------------------------------------------------------


def test_java_hash_known_values(spark):
    # java.lang.String#hashCode reference values
    for s, want in [("hello", 99162322), ("", 0), ("a", 97),
                    ("Zz", 2912), ("polygenelubricants", -2147483648)]:
        got = _one(spark, f"SELECT javaHash('{s}')")
        assert got == want, s


def test_hive_hash_zeroes_sign_bit(spark):
    assert _one(spark, "SELECT hiveHash('polygenelubricants')") == 0
    assert _one(spark, "SELECT hiveHash('hello')") == 99162322


def test_bitmask_to_array(spark):
    assert _one(spark, "SELECT bitmaskToArray(50)") == [2, 16, 32]
    assert _one(spark, "SELECT bitmaskToArray(0)") == []
    assert _one(spark, "SELECT bitmaskToArray(1)") == [1]
    # bit 63 surfaces as the signed carrier; parts still sum to x
    # long.min spelled as an expression: the bare literal would
    # overflow before unary minus applies
    got = _one(spark, "SELECT bitmaskToArray(-9223372036854775807 - 1)")
    assert got == [-9223372036854775808]
    got = _one(spark, "SELECT bitmaskToArray(-1)")
    assert sum(got) == -1 and len(got) == 64


def test_map_concat_first_wins(spark):
    got = _one(
        spark,
        "SELECT mapConcat(map('a', 1, 'b', 2), map('b', 9, 'c', 3),"
        " map('a', 7, 'd', 4))",
    )
    assert got == {"a": 1, "b": 2, "c": 3, "d": 4}


def test_array_with_constant(spark):
    assert _one(spark, "SELECT arrayWithConstant(3, 'x')") == ["x"] * 3
    assert _one(spark, "SELECT arrayWithConstant(0, 1)") == []


def test_multi_search_first_position(spark):
    assert _one(
        spark,
        "SELECT multiSearchFirstPosition('hello world',"
        " ['xx', 'wor', 'ell'])",
    ) == 2
    assert _one(
        spark,
        "SELECT multiSearchFirstPosition('hello', ['zz', 'yy'])",
    ) == 0


def test_regexp_quote_meta_roundtrip(spark):
    # the escaped form must match the original literally
    for s in ["a.b*c", "x[1]+(2)?", "^$|{}:\\-"]:
        esc = _one(spark, f"SELECT regexpQuoteMeta('{s}')".replace("\\", "\\\\"))
        assert __import__("re").fullmatch(esc, s), (s, esc)
