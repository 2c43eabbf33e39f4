"""Cross-engine deterministic hashing for dedup / fingerprint operators.

Engine-native hash functions differ between Spark (xxhash64, murmur3)
and DuckDB (its own `hash`), so oracle-checked dedup operators use a
simple polynomial rolling hash over unicode codepoints:

    h = seed; for ch in s: h = (h * 31 + codepoint(ch)) % MOD

expressed with built-in higher-order functions on BOTH engines
(`aggregate`/`transform` in Spark, `list_reduce`/`list_transform` in
DuckDB) — identical math, identical results, all JVM-side in Spark (no
Python UDF). MOD < 2^31 keeps every intermediate within int64
(acc*31 + x < ~6.6e10).

At 100 TB these columns are computed map-side in one projection pass —
no shuffle — and downstream dedup joins group on the hash, which
distributes uniformly by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

POLY_MOD = 1_000_000_007
POLY_BASE = 31
POLY_SEED = 7


def _codes(c: Column) -> Column:
    """String column -> array<long> of unicode codepoints."""
    chars = F.filter(F.split(c, ""), lambda ch: ch != F.lit(""))
    return F.transform(chars, lambda ch: F.ascii(ch).cast("long"))


def poly_hash(col: Column | str, seed: int = POLY_SEED, mod: int = POLY_MOD) -> Column:
    """Polynomial rolling hash of a string column (deterministic, cross-engine)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        _codes(c),
        F.lit(seed).cast("long"),
        lambda acc, x: (acc * POLY_BASE + x) % mod,
    )


def poly_hash_duckdb(expr: str, seed: int = POLY_SEED, mod: int = POLY_MOD) -> str:
    """The exact same hash as `poly_hash`, as DuckDB SQL text (for oracles)."""
    return (
        f"list_reduce(list_prepend(CAST({seed} AS BIGINT), "
        f"list_transform(list_filter(string_split({expr}, ''), c -> c <> ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), "
        f"(a, b) -> (a * {POLY_BASE} + b) % {mod})"
    )


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (array<string>), empty tokens dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != F.lit(""))


def token_shingles(col: Column | str, n: int = 3) -> Column:
    """Sliding n-gram token shingles joined by single spaces.

    Documents with fewer than n tokens produce an empty array (they
    have no shingles and drop out of MinHash/Jaccard candidate sets).
    """
    t = tokens(col)
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - n + 1),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_hashes(col: Column | str, n: int = 3) -> Column:
    """Distinct poly-hashes of the n-gram shingle set (array<long>).

    Numerically identical to hashing each space-joined shingle string
    char-by-char (what the DuckDB oracle does), but computed from
    per-token prefix hashes via the polynomial concat identity

        h(a ++ b, seed) = (h(a, seed) * BASE^len(b) + h(b, 0)) mod MOD

    so every character is hashed exactly ONCE per document instead of n
    times, and no shingle strings are materialized. The per-token
    (hash, BASE^len) structs are let-bound as the lambda variable of a
    single-element ``aggregate`` — Catalyst does not CSE under lambda
    functions, so referencing a subexpression from several lambda bodies
    would recompute it per element; binding it as the fold input
    evaluates it once per row.
    """
    c = F.col(col) if isinstance(col, str) else col
    space = ord(" ")
    # per-token struct: h = poly hash (seed 0), pw = BASE^len % MOD
    parts = F.transform(
        tokens(c),
        lambda tok: F.aggregate(
            _codes(tok),
            F.struct(
                F.lit(0).cast("long").alias("h"),
                F.lit(1).cast("long").alias("pw"),
            ),
            lambda a, x: F.struct(
                ((a["h"] * POLY_BASE + x) % POLY_MOD).alias("h"),
                ((a["pw"] * POLY_BASE) % POLY_MOD).alias("pw"),
            ),
        ),
    )

    def shingles(_acc: Column, p: Column) -> Column:
        def sh(i: Column) -> Column:
            h = F.lit(POLY_SEED).cast("long")
            for j in range(n):
                if j:
                    h = (h * POLY_BASE + space) % POLY_MOD
                t = F.element_at(p, i + j)
                h = (h * t["pw"] + t["h"]) % POLY_MOD
            return h

        return F.when(
            F.size(p) >= n,
            F.transform(F.sequence(F.lit(1), F.size(p) - (n - 1)), sh),
        ).otherwise(F.array().cast("array<long>"))

    return F.array_distinct(
        F.aggregate(
            F.array(parts), F.array().cast("array<long>"), shingles
        )
    )


def tokens_duckdb(expr: str) -> str:
    """DuckDB SQL for `tokens` — the ONE cross-engine tokenization
    fragment; every oracle builds on this so a tokenizer change cannot
    desynchronize them."""
    return f"list_filter(regexp_split_to_array(trim({expr}), '\\s+'), x -> x <> '')"


def token_shingles_duckdb(expr: str, n: int = 3) -> str:
    """DuckDB SQL for `token_shingles` (1-indexed inclusive list slices)."""
    t = tokens_duckdb(expr)
    return (
        f"CASE WHEN len({t}) >= {n} THEN "
        f"list_transform(range(1, len({t}) - {n} + 2), "
        f"i -> array_to_string({t}[i : i + {n - 1}], ' ')) "
        f"ELSE [] END"
    )


def shingle_hashes_duckdb(expr: str, n: int = 3) -> str:
    """DuckDB SQL for `shingle_hashes`."""
    inner = poly_hash_duckdb("s")
    return (
        f"list_distinct(list_transform({token_shingles_duckdb(expr, n)}, "
        f"s -> {inner}))"
    )


# MinHash permutation parameters: h_i(x) = (a_i * x + b_i) % MOD.
# Fixed literals so Spark and the SQL oracle share them verbatim.
def minhash_params(k: int) -> list[tuple[int, int]]:
    return [(2 * i + 3, i * i + 12345 + i) for i in range(k)]


# ------------------------------------------------------- CH int hashes
#
# CH's SAMPLE BY keys: intHash64 (fmix64 of x ^ seed;
# src/Functions/FunctionsHashing.h IntHash64Impl) and intHash32
# (Thomas Wang's 64->32 mix with CH's salt;
# src/Common/HashTable/Hash.h intHash32<0x75D9543DE018BF45>). Both
# need wrap-around mod-2^64 arithmetic, which ANSI long math refuses
# (multiply/add overflow RAISES), so the wrapping ops run in
# wrap-around mod-2^64 arithmetic in PURE long math (16-bit limb
# convolution for multiply, 32-bit halves for add — every
# intermediate < 2^35, ANSI-safe). The first cut ran the multiplies
# in decimal(38,0); exact, but each BigDecimal pmod costs like
# dozens of primitive-long ops and the sampling-key projection is
# per-row hot (3.7 s -> 1.0 s at sf0.1 after this rewrite). Bitwise
# xor/shift/or stay plain long (bit-pattern ops never overflow).


def _let1(value: Column, body) -> Column:
    """Bind once as a lambda variable (single-element transform)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def _mul_mod64(x: Column, c: int) -> Column:
    """x * c mod 2^64 over signed-long bit patterns, in PURE long
    arithmetic: 16-bit limb convolution with threaded carries. Every
    partial product is < 2^32 and every carry-extended limb sum is
    < 2^35, so nothing can trip ANSI long overflow — and the whole
    chain stays in whole-stage codegen's primitive-long fast path
    (the earlier decimal(38,0) spelling was exact too, but each
    BigDecimal pmod cost ~like dozens of long ops; the sampling-hash
    projection is per-row hot). Shifts/AND/OR are bit-pattern ops,
    never overflow-checked. x limbs and carry sums are LET-bound —
    the carry chain would otherwise re-expand the tree 2x per
    level."""
    cl = [(c >> (16 * j)) & 0xFFFF for j in range(4)]

    def build(xb: Column) -> Column:
        xl = [
            F.shiftrightunsigned(xb, 16 * i).bitwiseAND(
                F.lit(0xFFFF)
            )
            for i in range(4)
        ]

        def conv(k: int, carry: Column) -> Column:
            t = carry
            for i in range(k + 1):
                j = k - i
                if cl[j]:
                    t = t + xl[i] * F.lit(cl[j])
            return t

        return _let1(
            conv(0, F.lit(0).cast("long")),
            lambda t0: _let1(
                conv(1, F.shiftrightunsigned(t0, 16)),
                lambda t1: _let1(
                    conv(2, F.shiftrightunsigned(t1, 16)),
                    lambda t2: _let1(
                        conv(3, F.shiftrightunsigned(t2, 16)),
                        lambda t3: t0.bitwiseAND(F.lit(0xFFFF))
                        .bitwiseOR(
                            F.shiftleft(
                                t1.bitwiseAND(F.lit(0xFFFF)), 16
                            )
                        )
                        .bitwiseOR(
                            F.shiftleft(
                                t2.bitwiseAND(F.lit(0xFFFF)), 32
                            )
                        )
                        .bitwiseOR(
                            F.shiftleft(
                                t3.bitwiseAND(F.lit(0xFFFF)), 48
                            )
                        ),
                    ),
                ),
            ),
        )

    return _let1(x, build)


def _add_mod64(x: Column, y: Column) -> Column:
    """x + y mod 2^64 over signed-long bit patterns, in pure long
    arithmetic: 32-bit halves with an explicit carry (sums < 2^34 —
    ANSI-safe)."""

    def build2(xb: Column, yb: Column) -> Column:
        lo = xb.bitwiseAND(F.lit(0xFFFFFFFF)) + yb.bitwiseAND(
            F.lit(0xFFFFFFFF)
        )
        return _let1(
            lo,
            lambda lov: F.shiftleft(
                F.shiftrightunsigned(xb, 32)
                + F.shiftrightunsigned(yb, 32)
                + F.shiftrightunsigned(lov, 32),
                32,
            ).bitwiseOR(lov.bitwiseAND(F.lit(0xFFFFFFFF))),
        )

    return _let1(x, lambda xb: _let1(y, lambda yb: build2(xb, yb)))


def _ushr(x: Column, n: int) -> Column:
    return F.shiftrightunsigned(x, n)


def _let_chain(seed: Column, steps) -> Column:
    """Thread ``seed`` through ``steps`` with each intermediate bound
    ONCE as a lambda variable (transform over a 1-element array).
    Without the binds, every step that references its input k times
    multiplies the expression tree k-fold — the 8-step Wang mix grows
    to a ~100 MiB task binary. Bound lambda variables are O(1) slots,
    so the tree stays linear in the step count."""
    if not steps:
        return seed
    head, *rest = steps
    return F.element_at(
        F.transform(
            F.array(seed), lambda h: _let_chain(head(h), rest)
        ),
        1,
    )


def int_hash64(x: Column) -> Column:
    """CH intHash64(UInt64) — fmix64(x ^ 0x4CF2D2BAAE6DA887), returned
    as the signed-long BIT PATTERN of CH's UInt64 (the engine-wide
    UInt64 convention)."""
    seed = x.cast("long").bitwiseXOR(F.lit(0x4CF2D2BAAE6DA887))
    return _let_chain(
        seed,
        [
            lambda h: h.bitwiseXOR(_ushr(h, 33)),
            lambda h: _mul_mod64(h, 0xFF51AFD7ED558CCD),
            lambda h: h.bitwiseXOR(_ushr(h, 33)),
            lambda h: _mul_mod64(h, 0xC4CEB9FE1A85EC53),
            lambda h: h.bitwiseXOR(_ushr(h, 33)),
        ],
    )


def int_hash32(x: Column) -> Column:
    """CH intHash32(UInt64) -> UInt32: Wang's 64->32 mix over
    x ^ 0x75D9543DE018BF45, truncated to the low 32 bits (returned as
    a non-negative long, CH UInt32 widened)."""
    seed = x.cast("long").bitwiseXOR(F.lit(0x75D9543DE018BF45))
    return _let_chain(
        seed,
        [
            lambda k: _add_mod64(F.bitwise_not(k), F.shiftleft(k, 18)),
            lambda k: k.bitwiseXOR(
                _ushr(k, 31).bitwiseOR(F.shiftleft(k, 33))
            ),
            lambda k: _mul_mod64(k, 21),
            lambda k: k.bitwiseXOR(_ushr(k, 11)),
            lambda k: _add_mod64(k, F.shiftleft(k, 6)),
            lambda k: k.bitwiseXOR(_ushr(k, 22)),
            lambda k: k.bitwiseAND(F.lit(0xFFFFFFFF)),
        ],
    )


