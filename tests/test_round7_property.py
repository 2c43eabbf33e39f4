"""Property tests for the round-7b/7c/7d surfaces: random inputs
against independent Python references — base58 round-trips over
arbitrary bytes (incl. leading zeros), bitSlice vs a bit-string
model, parseTimeDelta compositionality, interpolated weighted
quantiles vs a pure-Python fold, and normalized Gini. Few examples
(each runs a Spark job) but unconstrained shapes."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from baseline_magician_spark.plans.ch_sql import run_ch_query

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_B58_ALPHA = (
    "123456789ABCDEFGHJKLMNPQRSTUVWXYZ"
    "abcdefghijkmnopqrstuvwxyz"
)


def _b58_ref(data: bytes) -> str:
    n = int.from_bytes(data, "big")
    out = ""
    while n:
        n, r = divmod(n, 58)
        out = _B58_ALPHA[r] + out
    pad = len(data) - len(data.lstrip(b"\x00"))
    return "1" * pad + out


def _one(spark, sql):
    t = spark.createDataFrame([(1,)], "i long")
    return run_ch_query(sql, {"t": t}).collect()[0].r


@_slow
@given(data=st.binary(min_size=0, max_size=40))
def test_base58_roundtrip_arbitrary_bytes(spark, data):
    hx = data.hex().upper()
    want = _b58_ref(data)
    got = _one(
        spark,
        f"SELECT base58Encode(unhex('{hx}')) AS r FROM t",
    )
    assert got == want, (hx, got, want)
    back = _one(
        spark,
        f"SELECT hex(base58Decode('{want}')) AS r FROM t",
    )
    assert back == hx, (want, back, hx)


def _bit_slice_ref(data: bytes, off: int, ln: int | None) -> bytes:
    bits = "".join(f"{b:08b}" for b in data)
    n = len(bits)
    start = off if off >= 0 else n + off + 1
    if ln is None:
        want = n - start + 1
    elif ln >= 0:
        want = ln
    else:
        want = n - start + 1 + ln
    eff = max(min(want, n - start + 1), 0)
    if start < 1 or eff <= 0:
        piece = ""
    else:
        piece = bits[start - 1 : start - 1 + eff]
    piece += "0" * (-len(piece) % 8)
    return bytes(
        int(piece[i : i + 8], 2) for i in range(0, len(piece), 8)
    )


@_slow
@given(
    data=st.binary(min_size=1, max_size=6),
    off=st.integers(min_value=-40, max_value=40),
    ln=st.one_of(
        st.none(), st.integers(min_value=-20, max_value=48)
    ),
)
def test_bit_slice_matches_bitstring_model(spark, data, off, ln):
    hx = data.hex().upper()
    args = f"unhex('{hx}'), {off}" + (
        "" if ln is None else f", {ln}"
    )
    got = _one(spark, f"SELECT hex(bitSlice({args})) AS r FROM t")
    want = _bit_slice_ref(data, off, ln).hex().upper()
    assert got == want, (hx, off, ln, got, want)


@_slow
@given(
    h=st.integers(min_value=0, max_value=30),
    m=st.integers(min_value=0, max_value=120),
    s=st.integers(min_value=0, max_value=99),
)
def test_parse_time_delta_composes(spark, h, m, s):
    got = _one(
        spark,
        f"SELECT round(parseTimeDelta('{h}h {m}min {s}sec'), 6) "
        "AS r FROM t",
    )
    assert got == float(h * 3600 + m * 60 + s)


def _qiw_ref(pairs, lv):
    pairs = sorted(pairs)
    total = sum(w for _, w in pairs)
    tgt = lv * total
    cum, pc, pv = 0.0, None, None
    for v, w in pairs:
        c = cum + w - w / 2.0
        if tgt <= c:
            if pc is None:
                return v
            return pv + (v - pv) * (tgt - pc) / (c - pc)
        cum, pc, pv = cum + w, c, v
    return pairs[-1][0]


@_slow
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-30, max_value=30),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=16,
    ),
    lv=st.sampled_from([0.05, 0.25, 0.5, 0.75, 0.95]),
)
def test_quantile_interpolated_weighted_matches_reference(
    spark, vals, lv
):
    df = spark.createDataFrame(
        [(float(v), w) for v, w in vals], "v double, w int"
    )
    got = run_ch_query(
        f"SELECT quantileInterpolatedWeighted({lv})(v, w) AS r FROM t",
        {"t": df},
    ).collect()[0].r
    want = _qiw_ref([(float(v), w) for v, w in vals], lv)
    assert got == pytest.approx(want, abs=1e-9), (vals, lv)


def _gini_ref(pred, label):
    n = len(label)
    by_pred = [l for _, l in sorted(zip(pred, label), reverse=True)]
    ideal = sorted(label, reverse=True)

    def gini(seq):
        cum = acc = 0.0
        for x in seq:
            cum += x
            acc += cum
        return (acc / cum - (n + 1) / 2.0) / n

    gm, gi = gini(by_pred), gini(ideal)
    return gm, gi


@_slow
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=5),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_array_normalized_gini_matches_reference(spark, rows):
    if sum(l for _, l in rows) == 0:
        return  # all-zero labels: total weight 0, NaN domain
    pred = [float(p) for p, _ in rows]
    label = [float(l) for _, l in rows]
    # distinct (pred, label) sort keys on both sides: Spark sorts
    # struct(p, l), the reference sorts tuples — same order
    parr = "[" + ", ".join(str(p) for p in pred) + "]"
    larr = "[" + ", ".join(str(l) for l in label) + "]"
    row = run_ch_query(
        f"SELECT tupleElement(arrayNormalizedGini({parr}, {larr}),"
        " 'gini') AS gm, "
        f"tupleElement(arrayNormalizedGini({parr}, {larr}),"
        " 'gini_ideal') AS gi FROM t",
        {"t": spark.createDataFrame([(1,)], "i long")},
    ).collect()[0]
    gm, gi = _gini_ref(pred, label)
    assert row.gm == pytest.approx(gm, abs=1e-9)
    assert row.gi == pytest.approx(gi, abs=1e-9)
