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


def build_bloom(keys: DataFrame, key_col: str, m: int = DEFAULT_M) -> DataFrame:
    """1-row DataFrame ``(bloom_bits: array<int>)`` — the filter,
    ready to broadcast. ``key_col`` must be a string column; hashing
    happens here so build and probe cannot disagree.

    The base hash lands in its own projection FIRST and the k affine
    rehashes reference that column — inlining ``poly_hash`` into each
    position would re-run the char-level aggregate k times per row
    (Catalyst does not CSE aggregate-lambda subtrees)."""
    hashed = keys.select(poly_hash(F.col(key_col)).alias("_h"))
    bits = hashed.select(
        F.explode(
            F.array(*bloom_positions(F.col("_h"), m))
        ).alias("bit")
    )
    return bits.agg(F.sort_array(F.collect_set("bit")).alias("bloom_bits"))


def bloom_probe(
    probe: DataFrame, key_col: str, bloom: DataFrame, m: int = DEFAULT_M
) -> DataFrame:
    """Append ``bloom_pass`` (boolean: all k bits set) to ``probe``.
    One broadcast crossJoin of the 1-row filter; the membership test is
    a codegen'd array_contains conjunction — map-side at any scale.
    The key hashes ONCE into a hidden column (see build_bloom)."""
    out = probe.withColumn(
        "_bloom_h", poly_hash(F.col(key_col))
    ).crossJoin(F.broadcast(bloom))
    passed = F.lit(True)
    for pos in bloom_positions(F.col("_bloom_h"), m):
        passed = passed & F.array_contains(F.col("bloom_bits"), pos)
    return out.withColumn("bloom_pass", passed).drop(
        "bloom_bits", "_bloom_h"
    )
