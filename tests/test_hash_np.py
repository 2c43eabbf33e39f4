"""The vectorized numeric-hash kernels (functions/hash_np.py) must be
bit-exact against the pure-Python byte models — the same ground truth
the Column/text expression renderings are pinned against — and the
pandas-UDF rendering in ch_compat must agree with the expression
rendering end-to-end, including NULL propagation and the string-
argument fallback."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from baseline_magician_spark.functions import hash_np as H
from baseline_magician_spark.functions.cityhash import _hl16_py
from baseline_magician_spark.functions.hashing import int_hash64_py
from baseline_magician_spark.functions.murmur import (
    GCC_SEED,
    KAFKA_SEED,
    murmur2_32_py,
    murmur2_64_py,
)
from baseline_magician_spark.functions.murmur3_128 import murmur3_64_py
from baseline_magician_spark.functions.siphash import sip_hash64_py
from baseline_magician_spark.functions.xxhash import xxh64_py

rng = random.Random(411)
VALS = [0, 1, 2**63, 2**64 - 1, 2**63 - 1, 0xDEADBEEF] + [
    rng.randrange(0, 2**64) for _ in range(300)
]
V = np.array(VALS, dtype=np.uint64)


def _le(v: int, w: int) -> bytes:
    return int(v & ((1 << (8 * w)) - 1)).to_bytes(w, "little")


@pytest.mark.parametrize("w", [1, 2, 4, 8])
def test_single_arg_kernels_match_models(w):
    Vw = V & np.uint64((1 << (8 * w)) - 1)
    cases = {
        "sip": (H.sip64_np(Vw, w), [sip_hash64_py(_le(v, w)) for v in VALS]),
        "xx": (H.xxh64_np(Vw, w), [xxh64_py(_le(v, w)) for v in VALS]),
        "m2_64": (
            H.murmur2_64_np(Vw, w),
            [murmur2_64_py(_le(v, w)) for v in VALS],
        ),
        "m2_64_gcc": (
            H.murmur2_64_np(Vw, w, GCC_SEED),
            [murmur2_64_py(_le(v, w), GCC_SEED) for v in VALS],
        ),
        "m3_64": (
            H.murmur3_64_np(Vw, w),
            [murmur3_64_py(_le(v, w)) for v in VALS],
        ),
        "m2_32_kafka": (
            H.murmur2_32_np(Vw, w, KAFKA_SEED),
            [murmur2_32_py(_le(v, w), KAFKA_SEED) for v in VALS],
        ),
    }
    for name, (got, want) in cases.items():
        assert (got == np.array(want, dtype=np.uint64)).all(), (name, w)


def test_pair_and_scalar_kernels_match_models():
    A, B = V, V[::-1].copy()
    pairs = list(zip(VALS, VALS[::-1]))
    assert (
        H.sip64_pair_np(A, B)
        == np.array(
            [sip_hash64_py(_le(a, 8) + _le(b, 8)) for a, b in pairs],
            dtype=np.uint64,
        )
    ).all()
    assert (
        H.murmur2_64_pair_np(A, B)
        == np.array(
            [murmur2_64_py(_le(a, 8) + _le(b, 8)) for a, b in pairs],
            dtype=np.uint64,
        )
    ).all()
    assert (
        H.murmur3_64_pair_np(A, B)
        == np.array(
            [murmur3_64_py(_le(a, 8) + _le(b, 8)) for a, b in pairs],
            dtype=np.uint64,
        )
    ).all()
    a32, b32 = A & np.uint64(0xFFFFFFFF), B & np.uint64(0xFFFFFFFF)
    assert (
        H.murmur2_32_pair_np(a32, b32, KAFKA_SEED)
        == np.array(
            [
                murmur2_32_py(
                    _le(a & 0xFFFFFFFF, 4) + _le(b & 0xFFFFFFFF, 4),
                    KAFKA_SEED,
                )
                for a, b in pairs
            ],
            dtype=np.uint64,
        )
    ).all()
    assert (
        H.int_hash64_np(A)
        == np.array([int_hash64_py(v) for v in VALS], dtype=np.uint64)
    ).all()
    assert (
        H.hl16_np(A, B)
        == np.array([_hl16_py(a, b) for a, b in pairs], dtype=np.uint64)
    ).all()


_HASH_SQL = (
    "SELECT i, cityHash64(a, b) AS cc, sipHash64(a, b) AS sc, "
    "xxHash64(a, b) AS xc, murmurHash3_64(a, b) AS mc, "
    "kafkaMurmurHash(a, b) AS kc, murmurHash2_64(a, b) AS m2, "
    "gccMurmurHash(a, b) AS gc FROM t"
)


def _run(spark, df, disable_np):
    from baseline_magician_spark.functions import ch_compat
    from baseline_magician_spark.plans.ch_sql import run_ch_query

    if disable_np:
        orig = ch_compat._np_hash_multi
        ch_compat._np_hash_multi = lambda *a, **k: None
        try:
            out = run_ch_query(_HASH_SQL, {"t": df}).collect()
        finally:
            ch_compat._np_hash_multi = orig
        return sorted(map(tuple, out))
    return sorted(map(tuple, run_ch_query(_HASH_SQL, {"t": df}).collect()))


def test_udf_rendering_equals_expression_rendering(spark):
    rows = [
        (i, rng.randrange(-(2**63), 2**63), rng.randrange(-(2**63), 2**63))
        for i in range(200)
    ]
    rows += [(1000, None, 5), (1001, 7, None), (1002, None, None)]
    df = spark.createDataFrame(rows, "i long, a long, b long")
    got = _run(spark, df, disable_np=False)
    want = _run(spark, df, disable_np=True)
    assert got == want
    assert len(got) == len(rows)


def test_string_arguments_keep_expression_path(spark):
    # string args have no fixed numeric layout: _np_hash_multi must
    # decline and the expression rendering must still answer
    from baseline_magician_spark.plans.ch_sql import run_ch_query

    df = spark.createDataFrame([(1, "abc")], "i long, s string")
    out = run_ch_query(
        "SELECT sipHash64(s) AS h FROM t", {"t": df}
    ).collect()
    assert out[0].h == np.int64(
        np.uint64(sip_hash64_py(b"abc"))
    )


def test_mixed_width_arguments(spark):
    # int (4-byte layout) combined with bigint (8-byte layout)
    from baseline_magician_spark.plans.ch_sql import run_ch_query

    df = spark.createDataFrame(
        [(7, -3), (0, 0), (2**31 - 1, -(2**62))], "a int, b long"
    )
    for fn in ("sipHash64", "xxHash64", "murmurHash3_64"):
        got = _run2 = sorted(
            r.h
            for r in run_ch_query(
                f"SELECT {fn}(a, b) AS h FROM t", {"t": df}
            ).collect()
        )
        from baseline_magician_spark.functions import ch_compat

        orig = ch_compat._np_hash_multi
        ch_compat._np_hash_multi = lambda *a, **k: None
        try:
            want = sorted(
                r.h
                for r in run_ch_query(
                    f"SELECT {fn}(a, b) AS h FROM t", {"t": df}
                ).collect()
            )
        finally:
            ch_compat._np_hash_multi = orig
        assert got == want, fn
