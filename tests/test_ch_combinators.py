"""General aggregate-combinator grammar (round 6).

CH composes aggregates by SUFFIX — sumIf, avgArray, countOrNull,
maxForEach, chains like sumArrayIf — rather than enumerating names
(clickhouse docs: sql-reference/aggregate-functions/combinators). The
reference's surface stops at the named spellings its generator emits;
the grammar itself is the extension-tier dialect feature.
"""

from __future__ import annotations

import pytest

from baseline_magician_spark.functions.ch_compat import (
    is_combinator_agg,
    resolve_agg_combinator,
    split_combinators,
)
from baseline_magician_spark.plans.ch_sql import run_ch_query


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(
        [
            (1, 5, [1, 2, 3], True),
            (1, 7, [4, 5], False),
            (2, 9, [], True),
            (2, None, [10], True),
        ],
        "g int, x int, arr array<int>, flag boolean",
    )


def test_split_combinators_parses_suffix_chains():
    assert split_combinators("sumArrayIf") == ("sum", ["array", "if"])
    assert split_combinators("avgForEach") == ("avg", ["foreach"])
    assert split_combinators("countOrNull") == ("count", ["ornull"])
    assert split_combinators("SUMIF") == ("sum", ["if"])


def test_split_combinators_rejects_non_aggregates():
    # bases themselves are not combinator spellings
    assert split_combinators("groupArray") is None
    assert split_combinators("sum") is None
    # cast-function OrNull spellings must NOT resolve as aggregates
    assert split_combinators("toInt64OrNull") is None
    assert split_combinators("lower") is None
    assert not is_combinator_agg("notify")


def test_resolve_rejects_unsupported_array_base():
    # median has no element-wise variant — resolver declines, the
    # front end then reports an unknown function instead of mis-running
    assert resolve_agg_combinator("medianArray") is None
    assert resolve_agg_combinator("sumArray") is not None


def test_array_combinators_aggregate_elements(tdf):
    out = {
        r["g"]: r
        for r in run_ch_query(
            "SELECT g, sumArray(arr) AS sa, avgArray(arr) AS aa, "
            "countArray(arr) AS ca, minArray(arr) AS mna, "
            "maxArray(arr) AS mxa, uniqExactArray(arr) AS uea, "
            "groupArrayArray(arr) AS gaa "
            "FROM t GROUP BY g",
            {"t": tdf},
        ).collect()
    }
    assert out[1].sa == 15 and out[1].ca == 5 and out[1].aa == 3.0
    assert out[1].mna == 1 and out[1].mxa == 5 and out[1].uea == 5
    assert sorted(out[1].gaa) == [1, 2, 3, 4, 5]
    # empty array contributes no elements; count skips it
    assert out[2].sa == 10 and out[2].ca == 1 and out[2].mna == 10


def test_foreach_is_elementwise_and_ragged_safe(tdf):
    out = {
        r["g"]: r
        for r in run_ch_query(
            "SELECT g, sumForEach(arr) AS s, avgForEach(arr) AS a, "
            "countForEach(arr) AS c, minForEach(arr) AS mn "
            "FROM t GROUP BY g",
            {"t": tdf},
        ).collect()
    }
    # g=1: [1,2,3] + [4,5] -> positions (1+4, 2+5, 3)
    assert out[1].s == [5, 7, 3]
    assert out[1].a == [2.5, 3.5, 3.0]
    assert out[1].c == [2, 2, 1]
    assert out[1].mn == [1, 2, 3]
    # g=2: [] contributes nothing, [10] fills position 1
    assert out[2].s == [10]


def test_if_and_ornull_wrappers(tdf):
    row = run_ch_query(
        "SELECT sumIf(x, flag) AS sif, maxArrayIf(arr, flag) AS mai, "
        "countOrNull(x) AS con, sumOrNull(x) AS son, "
        "anyLastIf(x, flag) AS ali "
        "FROM t WHERE g = 1",
        {"t": tdf},
    ).collect()[0]
    assert row.sif == 5 and row.mai == 3
    assert row.con == 2 and row.son == 12 and row.ali == 5


def test_ornull_returns_null_on_empty_aggregation(tdf):
    row = run_ch_query(
        "SELECT countOrNull(x) AS con, sumOrNull(x) AS son, "
        "count(x) AS c FROM t WHERE g = 99",
        {"t": tdf},
    ).collect()[0]
    assert row.c == 0
    assert row.con is None and row.son is None


def test_array_reduce_per_row(tdf):
    rows = run_ch_query(
        "SELECT g, arrayReduce('sum', arr) AS s, "
        "arrayReduce('avg', arr) AS a, arrayReduce('count', arr) AS c, "
        "arrayReduce('uniqExact', arr) AS u, "
        "arrayReduce('any', arr) AS first_el "
        "FROM t ORDER BY g, c",
        {"t": tdf},
    ).collect()
    by = [(r.s, r.a, r.c, r.u, r.first_el) for r in rows]
    assert (6, 2.0, 3, 3, 1) in by          # [1,2,3]
    assert (9, 4.5, 2, 2, 4) in by          # [4,5]
    assert (None, None, 0, 0, None) in by   # []
    assert (10, 10.0, 1, 1, 10) in by       # [10]


def test_array_reduce_unknown_agg_raises(tdf):
    with pytest.raises(Exception, match="arrayReduce"):
        run_ch_query(
            "SELECT arrayReduce('corr', arr) AS x FROM t", {"t": tdf}
        ).collect()


def test_named_shims_take_precedence(tdf):
    # sumIf has a tuned named shim; the general path must not shadow it
    # (identical semantics — this just pins the resolution order)
    from baseline_magician_spark.functions.ch_compat import CH_FUNCTIONS

    assert "sumIf" in CH_FUNCTIONS
    row = run_ch_query(
        "SELECT sumIf(x, g = 2) AS s FROM t", {"t": tdf}
    ).collect()[0]
    assert row.s == 9


def test_combinator_in_having_and_group_detection(tdf):
    rows = run_ch_query(
        "SELECT g FROM t GROUP BY g HAVING sumArray(arr) > 10 ORDER BY g",
        {"t": tdf},
    ).collect()
    assert [r.g for r in rows] == [1]


# ---- property tests: the suffix grammar round-trips and never
# misparses a base or a cast-style OrNull name ----

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _BASES = ["sum", "min", "max", "avg", "count", "any", "uniq",
              "argMax", "stddevPop", "groupArray"]
    _SUFFIXES = ["If", "OrNull", "Array", "ForEach", "Distinct"]

    @given(
        base=st.sampled_from(_BASES),
        sufs=st.lists(st.sampled_from(_SUFFIXES), min_size=1, max_size=3),
    )
    @settings(max_examples=200, deadline=None)
    def test_property_suffix_chains_parse_to_their_base(base, sufs):
        name = base + "".join(sufs)
        parsed = split_combinators(name)
        assert parsed is not None
        got_base, got_sufs = parsed
        assert got_base == base.lower()
        assert got_sufs == [s.lower() for s in sufs]

    @given(base=st.sampled_from(_BASES))
    @settings(max_examples=50, deadline=None)
    def test_property_bare_bases_never_parse_as_combinators(base):
        assert split_combinators(base) is None

    @given(
        t=st.sampled_from(["toInt64", "toFloat64", "toDate", "toUUID"]),
        suf=st.sampled_from(["OrNull", "OrZero"]),
    )
    @settings(max_examples=20, deadline=None)
    def test_property_cast_or_null_names_stay_functions(t, suf):
        # toInt64OrNull etc. are CAST shims, never aggregates
        assert split_combinators(t + suf) is None

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


# --- review regressions: -OrNull guards and -ForEach empty arrays ---------


def test_count_if_or_null_empty_match_is_null(spark):
    df = spark.createDataFrame([(1,), (2,)], "x int")
    got = run_ch_query(
        "SELECT countIfOrNull(x > 10) AS a, countIfOrNull(x > 0) AS b,"
        " sumIfOrNull(x, x > 10) AS c FROM t",
        {"t": df},
    ).collect()[0]
    assert got.a is None   # CH: NULL, not 0, when nothing aggregated
    assert got.b == 2
    assert got.c is None


def test_count_or_null_zero_args(spark):
    df = spark.createDataFrame([(1,)], "x int")
    got = run_ch_query(
        "SELECT countOrNull() AS c FROM t", {"t": df}
    ).collect()[0].c
    assert got == 1


def test_sum_array_or_null_empty_arrays(spark):
    df = spark.createDataFrame(
        [([],), ([],)], "arr array<int>"
    )
    got = run_ch_query(
        "SELECT sumArrayOrNull(arr) AS s FROM t", {"t": df}
    ).collect()[0].s
    assert got is None


def test_foreach_all_empty_arrays(spark):
    df = spark.createDataFrame([([],), ([],)], "arr array<int>")
    got = run_ch_query(
        "SELECT sumForEach(arr) AS s, countForEach(arr) AS c FROM t",
        {"t": df},
    ).collect()[0]
    assert list(got.s) == []
    assert list(got.c) == []
