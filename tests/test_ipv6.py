"""Round-6g network tranche: IPv6 parse/format and MAC functions
pinned against Python's stdlib ``ipaddress`` module — an independent
implementation of the same RFC rules glibc inet_ntop follows."""

from __future__ import annotations

import ipaddress
import random

import pytest

from pyspark.sql import functions as F

from baseline_magician_spark.functions.ipv6 import (
    ipv6_num_to_string,
    ipv6_string_to_num,
    is_ipv4_string,
    is_ipv6_string,
    mac_num_to_string,
    mac_string_to_num,
)


def _rand_v6(rng: random.Random) -> str:
    kind = rng.random()
    if kind < 0.3:
        # sparse: many zero groups to exercise compression
        groups = [0] * 8
        for _ in range(rng.randint(1, 3)):
            groups[rng.randrange(8)] = rng.randrange(0x10000)
    elif kind < 0.4:
        # v4-mapped / v4-compatible tails
        tail = rng.randrange(1 << 32)
        prefix = rng.choice([0, 0xFFFF])
        return str(ipaddress.IPv6Address((prefix << 32) | tail))
    else:
        groups = [rng.randrange(0x10000) for _ in range(8)]
    return str(
        ipaddress.IPv6Address(
            b"".join(g.to_bytes(2, "big") for g in groups)
        )
    )


CASES = [_rand_v6(random.Random(4100 + i)) for i in range(120)] + [
    "::", "::1", "1::", "2001:db8::ff00:42:8329",
    "::ffff:255.255.255.255", "::ffff:0.0.0.1", "::0.0.0.2",
    "fe80::1:2:3:4", "1:0:0:2:0:0:0:3", "0:0:1::", "::2:0:0:0",
]


def _glibc_str(a: ipaddress.IPv6Address) -> str:
    """Expected text under glibc inet_ntop rules: Python's str()
    follows RFC 5952 compression (identical) but never prints the
    v4-dotted tail special cases glibc and CH do."""
    groups = [
        int.from_bytes(a.packed[i * 2 : (i + 1) * 2], "big")
        for i in range(8)
    ]
    lead = 0
    for g in groups:
        if g != 0:
            break
        lead += 1
    mapped = lead == 5 and groups[5] == 0xFFFF
    if lead == 6 or (lead == 7 and groups[7] != 1) or mapped:
        v4 = ".".join(str(b) for b in a.packed[12:])
        return "::" + ("ffff:" if mapped else "") + v4
    return str(a)


def test_roundtrip_matches_stdlib(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "addr string")
    got = df.select(
        "addr",
        ipv6_num_to_string(ipv6_string_to_num(F.col("addr"))).alias(
            "canon"
        ),
        F.hex(ipv6_string_to_num(F.col("addr"))).alias("hx"),
    ).collect()
    for r in got:
        want = ipaddress.IPv6Address(r.addr)
        assert r.hx.lower() == want.packed.hex(), r.addr
        assert r.canon == _glibc_str(want), r.addr


def test_exploded_forms_parse(spark):
    # fully-expanded spellings parse to the same bytes
    exploded = [ipaddress.IPv6Address(s).exploded for s in CASES[:40]]
    df = spark.createDataFrame([(s,) for s in exploded], "addr string")
    got = df.select(
        "addr",
        F.hex(ipv6_string_to_num(F.col("addr"))).alias("hx"),
    ).collect()
    for r in got:
        assert r.hx.lower() == ipaddress.IPv6Address(r.addr).packed.hex()


@pytest.mark.parametrize(
    "bad",
    ["", ":", ":::", "1:2:3", "1:2:3:4:5:6:7:8:9", "::1::2",
     "g::1", "12345::", "1.2.3.4.5", ":1:2:3:4:5:6:7:8",
     "1:2:3:4:5:6:7:", "::ffff:999.1.1.1"],
)
def test_invalid_yields_null(spark, bad):
    df = spark.createDataFrame([(bad,)], "addr string")
    row = df.select(
        ipv6_string_to_num(F.col("addr")).alias("b"),
        is_ipv6_string(F.col("addr")).alias("ok"),
    ).collect()[0]
    assert row.b is None and row.ok is False, bad


def test_is_ipv4_string(spark):
    df = spark.createDataFrame([(1,)], "id int")
    cases = {
        "0.0.0.0": True, "255.255.255.255": True, "1.2.3.4": True,
        "256.1.1.1": False, "1.2.3": False, "01.2.3.4": False,
        "a.b.c.d": False, "1.2.3.4.5": False,
    }
    cols = [
        is_ipv4_string(F.lit(s)).alias(f"c{i}")
        for i, s in enumerate(cases)
    ]
    row = df.select(*cols).collect()[0]
    for i, (s, want) in enumerate(cases.items()):
        assert row[i] == want, s


def test_mac_roundtrip(spark):
    rng = random.Random(77)
    macs = [
        ":".join(f"{rng.randrange(256):02X}" for _ in range(6))
        for _ in range(50)
    ]
    df = spark.createDataFrame([(m,) for m in macs], "mac string")
    got = df.select(
        "mac",
        mac_string_to_num(F.col("mac")).alias("n"),
        mac_num_to_string(mac_string_to_num(F.col("mac"))).alias("rt"),
    ).collect()
    for r in got:
        want = int(r.mac.replace(":", ""), 16)
        assert r.n == want and r.rt == r.mac, r.mac


def test_mac_invalid_is_zero(spark):
    df = spark.createDataFrame(
        [
            ("nope",),
            ("01:23:45:67:89",),
            ("01:23:45:67:89:ZZ",),
            # CH rejects separator-less and misplaced-colon shapes too:
            # the full AA:BB:CC:DD:EE:FF form is validated BEFORE the
            # colons are stripped
            ("aabbccddeeff",),
            ("aa:bbcc:dd:ee:ff:",),
            ("aa:bb:cc:dd:ee:ff:",),
        ],
        "mac string",
    )
    got = df.select(mac_string_to_num(F.col("mac")).alias("n")).collect()
    assert [r.n for r in got] == [0, 0, 0, 0, 0, 0]


def test_or_default_returns_zero_address(spark):
    from baseline_magician_spark.plans.ch_sql import run_ch_query

    df = spark.createDataFrame([(1,)], "id int")
    got = run_ch_query(
        "SELECT IPv6NumToString(IPv6StringToNumOrDefault('nope')) AS r"
        " FROM t",
        {"t": df},
    ).collect()[0].r
    assert got == "::"
