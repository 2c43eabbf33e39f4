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
