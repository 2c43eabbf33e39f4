"""Property-based backend agreement: random expression trees evaluated
by the scalar interpreter and the Column compiler must agree row-wise.

Tree generation follows the grammar's legal shapes (numeric/boolean/
string contexts tracked so generated expressions are well-typed — the
reference grammar validates token transitions the same way).
"""

from __future__ import annotations

import math
import random

import pytest

from baseline_magician_spark.expr import compile_column, evaluate
from baseline_magician_spark.expr.compiler import types_from_schema

NUM_VARS = ["value", "x"]
STR_VARS = ["s"]
BOOL_VARS = ["flag"]


def gen_numeric(rng: random.Random, depth: int) -> str:
    if depth <= 0:
        return rng.choice(
            NUM_VARS + [str(rng.randint(0, 100)), f"{rng.uniform(0, 50):.2f}"]
        )
    kind = rng.randrange(6)
    if kind == 0:
        op = rng.choice(["+", "-", "*"])
        return f"({gen_numeric(rng, depth - 1)} {op} {gen_numeric(rng, depth - 1)})"
    if kind == 1:  # division guarded against 0 literal
        return f"({gen_numeric(rng, depth - 1)} / {rng.randint(1, 9)})"
    if kind == 2:
        return f"(-{gen_numeric(rng, depth - 1)})"
    if kind == 3:
        op = rng.choice(["&", "|", "^"])
        return f"({gen_numeric(rng, depth - 1)} {op} {rng.randint(0, 15)})"
    if kind == 4:
        return f"({gen_bool(rng, depth - 1)} ? {gen_numeric(rng, depth - 1)} : {gen_numeric(rng, depth - 1)})"
    return f"({gen_numeric(rng, depth - 1)} % {rng.randint(1, 7)})"


def gen_bool(rng: random.Random, depth: int) -> str:
    if depth <= 0:
        return rng.choice(BOOL_VARS + ["true", "false"])
    kind = rng.randrange(5)
    if kind == 0:
        op = rng.choice(["&&", "||"])
        return f"({gen_bool(rng, depth - 1)} {op} {gen_bool(rng, depth - 1)})"
    if kind == 1:
        return f"(!{gen_bool(rng, depth - 1)})"
    if kind == 2:
        op = rng.choice([">", "<", ">=", "<="])
        return f"({gen_numeric(rng, depth - 1)} {op} {gen_numeric(rng, depth - 1)})"
    if kind == 3:
        return f"({rng.choice(STR_VARS)} == '{rng.choice(['abc', 'zzz'])}')"
    return f"({gen_numeric(rng, depth - 1)} in ({rng.randint(0,5)}, {rng.randint(6,20)}))"


ROWS = [
    (25.0, 7, "abc", True),
    (3.5, -2, "zzz", False),
    (0.0, 100, "abc", False),
    (99.9, 1, "q", True),
]


@pytest.mark.parametrize("seed", range(8))
def test_random_trees_agree(spark, seed):
    rng = random.Random(1000 + seed)
    exprs = [gen_numeric(rng, 3) for _ in range(6)] + [
        gen_bool(rng, 3) for _ in range(6)
    ]
    df = spark.createDataFrame(ROWS, "value double, x int, s string, flag boolean")
    types = types_from_schema(df)
    cols = [compile_column(e, types=types).alias(f"e{i}") for i, e in enumerate(exprs)]
    out = df.select(*cols).collect()
    for row_in, row_out in zip(ROWS, out):
        params = dict(zip(("value", "x", "s", "flag"), row_in))
        for i, e in enumerate(exprs):
            expected = evaluate(e, params)
            actual = row_out[i]
            if isinstance(expected, float):
                assert actual == pytest.approx(expected, nan_ok=True), (e, params)
            else:
                assert actual == expected, (e, params)


_ = math


# --- uint64 shift semantics (gov/evaluationStage.go:207-212) ---------
# float64(uint64(l) << uint64(r)) with the amd64 conversion lowering;
# goldens hand-computed from the Go semantics, straddling 2^63.

P63 = 2.0**63
P64 = 2.0**64

SHIFT_GOLDEN = [
    # (left, right, op, expected)
    (1.0, 63.0, "<<", 9223372036854775808.0),      # 1<<63 = 2^63
    (P63, 1.0, "<<", 0.0),                         # wraps mod 2^64
    (P64 - 2048.0, 1.0, ">>", 9223372036854774784.0),
    (-1.0, 0.0, "<<", 18446744073709551616.0),     # u64(-1)=2^64-1 -> 2^64
    (-2.0, 1.0, ">>", 9223372036854775808.0),      # (2^64-2)>>1=2^63-1 -> 2^63
    (1.0, 64.0, "<<", 0.0),                        # Go: count>=64 -> 0
    (1.0, 64.5, "<<", 0.0),                        # count truncates to 64
    (5.0, -1.0, "<<", 0.0),                        # u64(-1) huge count
    (3.7, 1.0, "<<", 6.0),                         # trunc(3.7)=3
    (P63 + 4096.0, 4.0, ">>", 576460752303423744.0),  # 2^59 + 256
    (-(P63) - 1e6, 3.0, "<<", 0.0),                # indefinite 2^63 << 3 wraps
    (P64, 2.0, "<<", 0.0),                         # >=2^64 -> 0
]


def test_shift_golden_interpreter():
    for left, right, op, expected in SHIFT_GOLDEN:
        got = evaluate(f"a {op} b", {"a": left, "b": right})
        assert got == expected, (left, right, op, got, expected)


def test_shift_golden_compiled(spark):
    df = spark.createDataFrame(
        [(left, right) for left, right, _, _ in SHIFT_GOLDEN],
        "a double, b double",
    )
    types = types_from_schema(df)
    out = df.select(
        compile_column("a << b", types=types).alias("shl"),
        compile_column("a >> b", types=types).alias("shr"),
    ).collect()
    for (left, right, op, expected), row in zip(SHIFT_GOLDEN, out):
        got = row["shl"] if op == "<<" else row["shr"]
        assert got == expected, (left, right, op, got, expected)


def test_shift_backends_agree_across_ranges(spark):
    rng = random.Random(2024)
    vals = [
        0.0, 1.0, -1.0, 63.0, 64.0, 65.0, 0.5, -0.5,
        P63, P63 - 1024.0, P63 + 1024.0, P64 - 2048.0, P64, -P63, -P64,
    ]
    vals += [rng.uniform(-P64 * 1.5, P64 * 1.5) for _ in range(40)]
    vals += [float(rng.randint(0, 2**64)) for _ in range(40)]
    pairs = [(rng.choice(vals), rng.choice(vals)) for _ in range(120)]
    df = spark.createDataFrame(pairs, "a double, b double")
    types = types_from_schema(df)
    out = df.select(
        compile_column("a << b", types=types).alias("shl"),
        compile_column("a >> b", types=types).alias("shr"),
        compile_column("a & b", types=types).alias("band"),
        compile_column("a | b", types=types).alias("bor"),
        compile_column("a ^ b", types=types).alias("bxor"),
        compile_column("~a", types=types).alias("bnot"),
    ).collect()
    for (a, b), row in zip(pairs, out):
        p = {"a": a, "b": b}
        for col, e in (
            ("shl", "a << b"), ("shr", "a >> b"), ("band", "a & b"),
            ("bor", "a | b"), ("bxor", "a ^ b"), ("bnot", "~a"),
        ):
            expected = evaluate(e, p)
            assert row[col] == expected, (e, p, row[col], expected)
