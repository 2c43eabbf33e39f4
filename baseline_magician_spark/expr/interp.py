"""Driver-side scalar interpreter — the reference's actual usage mode
(thresholds evaluated on already-aggregated scalars, main.go:358-370).

Implements the govaluate runtime type model: float64/bool/str/list,
integer parameters coerced to float on access, `+` concatenating when
either side is a string (Go %v formatting: integral floats print
without a decimal part), short-circuit logical/ternary/coalesce,
int64 round-trip bitwise ops, uint64 round-trip shifts, regex match
via `re.search` (RE2-compatible subset).
"""

from __future__ import annotations

import math
import re
from collections.abc import Callable, Mapping

from .ast import ArrayExpr, Binary, Call, Literal, Node, Regex, Ternary, Unary, Var
from .errors import ExpressionError
from .parser import parse

_UINT64_MASK = (1 << 64) - 1


def go_str(v: object) -> str:
    """Go fmt %v formatting for the + concat overload."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isinf(v) or math.isnan(v):
            return {True: "NaN"}.get(math.isnan(v), "+Inf" if v > 0 else "-Inf")
        if v.is_integer() and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if v is None:
        return "<nil>"
    if isinstance(v, list):
        # Go %v slice form: space-separated, no commas
        return "[" + " ".join(go_str(x) for x in v) + "]"
    return str(v)


def _num(v: object, op: str) -> float:
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise ExpressionError(f"operator {op!r} requires numeric operand, got {v!r}")
    return float(v)


def _bool(v: object, op: str) -> bool:
    if not isinstance(v, bool):
        raise ExpressionError(f"operator {op!r} requires boolean operand, got {v!r}")
    return v


def _i64(v: float) -> int:
    """Go amd64 int64(float64): truncation toward zero; out-of-range
    and NaN inputs produce the cvttsd2si 'integer indefinite'
    0x8000000000000000 (= -2^63)."""
    if math.isnan(v) or v <= -(2.0**63) or v >= 2.0**63:
        return -(1 << 63)
    return int(v)


def _u64(v: float) -> int:
    """Go amd64 float64->uint64 (gov/evaluationStage.go:207-212 input
    conversion). The compiler lowers ``uint64(f)`` as
    ``f < 2^63 ? cvttsd2si(f) : cvttsd2si(f - 2^63) + 2^63`` — so:
    truncation toward zero in [0, 2^64); negatives wrap two's-
    complement; <= -2^63 hits the indefinite (2^63); NaN and >= 2^64
    land on 0."""
    if math.isnan(v):
        return 0  # else-branch: indefinite + 2^63 ≡ 0 (mod 2^64)
    if v >= 2.0**63:
        if v >= 2.0**64:
            return 0
        return (int(v - 2.0**63) + (1 << 63)) & _UINT64_MASK
    if v <= -(2.0**63):
        return 1 << 63
    return int(v) & _UINT64_MASK


def evaluate(
    expr: str | Node,
    params: Mapping[str, object] | None = None,
    functions: Mapping[str, Callable[..., object]] | None = None,
) -> object:
    functions = functions or {}
    node = parse(expr, frozenset(functions)) if isinstance(expr, str) else expr
    return _eval(node, params or {}, functions)


def _eval(n: Node, params: Mapping[str, object], fns: Mapping[str, Callable]) -> object:
    if isinstance(n, Literal):
        return n.value
    if isinstance(n, Regex):
        return n.pattern
    if isinstance(n, Var):
        if n.name not in params:
            raise ExpressionError(f"missing parameter {n.name!r}")
        v = params[n.name]
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return v
        return float(v)  # integer widths coerce to float64 on access
    if isinstance(n, ArrayExpr):
        return [_eval(x, params, fns) for x in n.items]
    if isinstance(n, Call):
        args = [_eval(x, params, fns) for x in n.args]
        out = fns[n.name](*args)
        if isinstance(out, bool) or not isinstance(out, (int, float)):
            return out
        return float(out)
    if isinstance(n, Unary):
        v = _eval(n.operand, params, fns)
        if n.op == "-":
            return -_num(v, "-")
        if n.op == "!":
            return not _bool(v, "!")
        if n.op == "~":
            return float(~_i64(_num(v, "~")))
        raise ExpressionError(f"unknown unary {n.op}")
    if isinstance(n, Ternary):
        cond = _eval(n.cond, params, fns)
        if _bool(cond, "?:"):
            return _eval(n.then, params, fns)
        return None if n.otherwise is None else _eval(n.otherwise, params, fns)
    if isinstance(n, Binary):
        return _binary(n, params, fns)
    raise ExpressionError(f"unknown node {n!r}")


def _binary(n: Binary, params, fns) -> object:
    op = n.op
    # short-circuit forms first
    if op == "&&":
        left = _eval(n.left, params, fns)
        if not _bool(left, op):
            return False
        return _bool(_eval(n.right, params, fns), op)
    if op == "||":
        left = _eval(n.left, params, fns)
        if _bool(left, op):
            return True
        return _bool(_eval(n.right, params, fns), op)
    if op == "??":
        left = _eval(n.left, params, fns)
        return left if left is not None else _eval(n.right, params, fns)

    left = _eval(n.left, params, fns)
    right = _eval(n.right, params, fns)

    if op == "+":
        if isinstance(left, str) or isinstance(right, str):
            return go_str(left) + go_str(right)
        return _num(left, op) + _num(right, op)
    if op == "-":
        return _num(left, op) - _num(right, op)
    if op == "*":
        return _num(left, op) * _num(right, op)
    if op == "/":
        # Go float64 division: x/0 -> ±Inf (sign of x·sign of the
        # zero), 0/0 -> NaN — Python raises instead, so special-case
        ln, rn = _num(left, op), _num(right, op)
        if rn == 0.0:
            if ln == 0.0 or math.isnan(ln):
                return math.nan
            return math.copysign(math.inf, ln) * math.copysign(1.0, rn)
        return ln / rn
    if op == "%":
        # math.Mod(x, 0) is NaN in Go; Python's fmod raises
        ln, rn = _num(left, op), _num(right, op)
        if rn == 0.0:
            return math.nan
        return math.fmod(ln, rn)
    if op == "**":
        # math.Pow(neg, frac) is NaN in Go; Python's pow raises
        try:
            return math.pow(_num(left, op), _num(right, op))
        except ValueError:
            return math.nan
    if op in (">", "<", ">=", "<="):
        if isinstance(left, str) and isinstance(right, str):
            pass  # lexicographic
        else:
            left, right = _num(left, op), _num(right, op)
        return {
            ">": left > right,
            "<": left < right,
            ">=": left >= right,
            "<=": left <= right,
        }[op]
    if op == "==":
        return _deep_eq(left, right)
    if op == "!=":
        return not _deep_eq(left, right)
    if op in ("=~", "!~"):
        if not isinstance(left, str) or not isinstance(right, str):
            raise ExpressionError(f"{op} requires string operands")
        matched = re.search(right, left) is not None
        return matched if op == "=~" else not matched
    if op in ("&", "|", "^"):
        li, ri = _i64(_num(left, op)), _i64(_num(right, op))
        return float({"&": li & ri, "|": li | ri, "^": li ^ ri}[op])
    if op in ("<<", ">>"):
        # govaluate uint64 round-trip (gov/evaluationStage.go:207-212):
        # float64(uint64(l) << uint64(r)). Go shifts by >= the width
        # yield 0 (no Java-style count masking).
        lu = _u64(_num(left, op))
        cu = _u64(_num(right, op))
        if cu >= 64:
            out = 0
        elif op == "<<":
            out = (lu << cu) & _UINT64_MASK
        else:
            out = lu >> cu
        return float(out)  # float64(uint64): round-half-even, like Go
    if op == "in":
        if not isinstance(right, list):
            raise ExpressionError("right side of 'in' must be an array")
        return any(_deep_eq(left, x) for x in right)
    raise ExpressionError(f"unknown operator {op}")


def _deep_eq(a: object, b: object) -> bool:
    """Go reflect.DeepEqual semantics: values of different dynamic
    types are never equal — notably bool vs number, where Python's own
    ``==`` would say ``1.0 == True`` (bool is an int subclass)."""
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(
            _deep_eq(x, y) for x, y in zip(a, b)
        )
    if isinstance(a, list) != isinstance(b, list):
        return False
    return a == b
