"""Property track for the byte-exact hash family: arbitrary BYTES
(via unhex -> binary, so high-bit and NUL bytes are in play)
through the CH SQL surface against the pure-Python models. Each
example batches the whole family into ONE Spark job, so the track
stays cheap while sweeping unconstrained lengths across every
stripe/chunk/block/tail shape. Round 9 adds the canonical
murmurHash3_64/128, murmurHash2_32, kafkaMurmurHash and
gccMurmurHash. Seed-rotatable like the differential tracks
(hypothesis derandomizes per-function by default)."""

from __future__ import annotations

import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from baseline_magician_spark.functions.cityhash import (
    _sl,
    city_hash64_py,
)
from baseline_magician_spark.functions.murmur import (
    GCC_SEED,
    KAFKA_SEED,
    murmur2_32_py,
    murmur2_64_py,
    murmur3_32_py,
)
from baseline_magician_spark.functions.murmur3_128 import (
    murmur3_64_py,
    murmur3_128_py,
)
from baseline_magician_spark.functions.siphash import sip_hash64_py
from baseline_magician_spark.functions.xxhash import xxh32_py, xxh64_py
from baseline_magician_spark.plans.ch_sql import run_ch_query

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_slow
@given(data=st.binary(min_size=0, max_size=200))
def test_hash_family_matches_models_on_arbitrary_bytes(spark, data):
    hx = data.hex().upper()
    arg = f"unhex('{hx}')" if data else "''"
    t = spark.createDataFrame([(1,)], "i long")
    row = run_ch_query(
        f"SELECT cityHash64({arg}) AS city, sipHash64({arg}) AS sip, "
        f"murmurHash2_64({arg}) AS m2, murmurHash3_32({arg}) AS m3, "
        f"xxHash64({arg}) AS x64, xxHash32({arg}) AS x32, "
        f"murmurHash3_64({arg}) AS m364, murmurHash3_128({arg}) AS m3128, "
        f"murmurHash2_32({arg}) AS m232, kafkaMurmurHash({arg}) AS kf, "
        f"gccMurmurHash({arg}) AS gcc FROM t",
        {"t": t},
    ).collect()[0]
    assert row.city == _sl(city_hash64_py(data)), ("city", hx)
    assert row.sip == _sl(sip_hash64_py(data)), ("sip", hx)
    assert row.m2 == _sl(murmur2_64_py(data)), ("m2", hx)
    assert row.m3 == murmur3_32_py(data), ("m3", hx)
    assert row.x64 == _sl(xxh64_py(data)), ("x64", hx)
    assert row.x32 == xxh32_py(data), ("x32", hx)
    assert row.m364 == _sl(murmur3_64_py(data)), ("m364", hx)
    h1, h2 = murmur3_128_py(data)
    want128 = (
        struct.pack("<Q", h1) + struct.pack("<Q", h2)
    ).hex().upper()
    assert row.m3128 == want128, ("m3128", hx)
    assert row.m232 == murmur2_32_py(data), ("m232", hx)
    assert row.kf == (
        murmur2_32_py(data, KAFKA_SEED) & 0x7FFFFFFF
    ), ("kafka", hx)
    assert row.gcc == _sl(murmur2_64_py(data, GCC_SEED)), ("gcc", hx)
