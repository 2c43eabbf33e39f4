"""Bloom-filter membership — the broadcast-probe primitive for
large-scale decontamination / vocabulary screening.

A Bloom filter is a bitset of size ``m`` with ``k`` hash functions;
querying gives "definitely absent" or "probably present" (false
positives only, never false negatives). The canonical 100 TB use:
build the filter from a SMALL reference set (eval benchmarks, a
blocklist, a trusted vocabulary), broadcast the bits, and screen the
full corpus MAP-SIDE — no shuffle of corpus rows against the
reference, which is exactly how production dedup/decontamination
pipelines ship their filters to every executor.

Determinism / oracle parity: hashes derive from the cross-engine
polynomial hash (functions/hashing.py) composed with ``k`` affine
rehashes ``(h * A_i + B_i) % MOD % m`` — integer math that DuckDB
reproduces bit-for-bit, so tests assert exact membership vectors and
measured false-positive counts, not statistics.

The filter itself is built distributedly (explode keys into bit
positions, ``collect_set`` the ≤ m distinct bits into ONE row) and
joined to the probe side as a broadcast 1-row crossJoin — the engine's
standard shape for tiny-side joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import POLY_MOD, poly_hash, poly_hash_duckdb

# affine rehash constants (odd multipliers, distinct offsets)
BLOOM_PARAMS: tuple[tuple[int, int], ...] = ((769, 12), (389, 97), (631, 251))
DEFAULT_M = 4096


def bloom_positions(key_hash: Column, m: int = DEFAULT_M) -> list[Column]:
    """The k bit positions of a (already poly-hashed) key."""
    return [
        ((key_hash * a + b) % POLY_MOD % m).cast("int")
        for a, b in BLOOM_PARAMS
    ]


def bloom_positions_duckdb(hash_expr: str, m: int = DEFAULT_M) -> list[str]:
    """DuckDB rendering of :func:`bloom_positions` (oracle parity)."""
    return [
        f"CAST((({hash_expr}) * {a} + {b}) % {POLY_MOD} % {m} AS INT)"
        for a, b in BLOOM_PARAMS
    ]


def _bit_value(p: Column) -> Column:
    """2^p as a long for a RUNTIME in-word position p in [0, 63]:
    pow(2.0, p) is exact for p <= 62 (one mantissa bit), bit 63 is the
    signed-long min literal. shiftleft() takes only a literal count,
    hence this spelling (shared rationale with binary_quantize)."""
    return F.when(p == 63, F.lit(-(1 << 63)).cast("long")).otherwise(
        F.pow(F.lit(2.0), p.cast("double")).cast("long")
    )


def build_bloom(
    keys: DataFrame,
    key_col: str,
    m: int = DEFAULT_M,
    hash_col: str | None = None,
) -> DataFrame:
    """1-row DataFrame ``(bloom_words: array<long>)`` — the filter as
    m/64 PACKED WORDS, ready to broadcast. Round 12: the previous
    rendering was a sorted array of set bit positions probed with
    ``array_contains`` — an O(set_bits) linear scan per probe per
    hash that dominated the screen query once measured (a ~5k-entry
    scan x 3 hashes x every probe term). The packed form probes in
    O(1): one element_at + one bitwiseAND — the same word-addressed
    layout every real Bloom implementation uses. Membership is
    bit-for-bit equivalent (bit set in word <=> position in set), so
    the DuckDB oracle's list_contains replay still decides
    identically.

    ``key_col`` must be a string column; hashing happens here so
    build and probe cannot disagree — UNLESS ``hash_col`` names a
    column already carrying ``poly_hash(key)`` (e.g. from the
    vectorized shingle_term_relation kernel, value-identical by
    construction), in which case the interpreted char fold is
    skipped."""
    if m % 64:
        raise ValueError(f"m={m} must be a multiple of 64")
    hashed = keys.select(
        (
            F.col(hash_col) if hash_col else poly_hash(F.col(key_col))
        ).alias("_h")
    )
    bits = hashed.select(
        F.explode(
            F.array(*bloom_positions(F.col("_h"), m))
        ).alias("bit")
    )
    words = bits.select(
        (F.col("bit") / 64).cast("int").alias("_w"),
        _bit_value(F.col("bit") % 64).alias("_v"),
    ).groupBy("_w").agg(F.bit_or("_v").alias("_v"))
    packed = F.transform(
        F.sequence(F.lit(0), F.lit(m // 64 - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i), F.lit(0).cast("long")
        ),
    )
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_w"), F.col("_v")))
        ).alias("_m")
    ).select(packed.alias("bloom_words"))


def bloom_probe(
    probe: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m: int = DEFAULT_M,
    hash_col: str | None = None,
) -> DataFrame:
    """Append ``bloom_pass`` (boolean: all k bits set) to ``probe``.
    One broadcast crossJoin of the 1-row filter; the membership test
    is k O(1) word lookups (element_at + bitwiseAND) — map-side at
    any scale. The key hashes ONCE into a hidden column (see
    build_bloom), or reuses ``hash_col`` when the caller already
    carries the poly hash."""
    out = probe.withColumn(
        "_bloom_h",
        F.col(hash_col) if hash_col else poly_hash(F.col(key_col)),
    ).crossJoin(F.broadcast(bloom))
    passed = F.lit(True)
    for pos in bloom_positions(F.col("_bloom_h"), m):
        word = F.element_at(
            F.col("bloom_words"), (pos / 64).cast("int") + 1
        )
        passed = passed & (
            word.bitwiseAND(_bit_value(pos % 64)) != 0
        )
    return out.withColumn("bloom_pass", passed).drop(
        "bloom_words", "_bloom_h"
    )
