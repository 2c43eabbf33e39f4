"""SQL-text renderer for parsed expressions — SURVEY §2.3 E24.

Mirrors govaluate's ``ToSQLQuery()`` conventions
(gov/EvaluableExpression_sql.go:21-167): ``==`` -> ``=``, ``!=`` ->
``<>``, ``=~``/``!~`` -> ``RLIKE``/``NOT RLIKE``, ``??`` ->
``COALESCE(..)``, ``**`` -> ``POW(..)``, ``%`` -> ``MOD(..)``, bools
-> ``1``/``0``, ``&&``/``||`` -> ``AND``/``OR``, ``[bracketed]``
variables -> bare column references, ``IN`` -> ``IN (...)``. The
ternary operator has no SQL rendering there and raises here too.

The output is ANSI-ish SQL usable for debugging or pushing an
expression down to an external SQL engine; the executable Spark form
remains the Column tree from :func:`..compiler.compile_column`.
"""

from __future__ import annotations

from .ast import ArrayExpr, Binary, Call, Literal, Node, Regex, Ternary, Unary, Var
from .errors import ExpressionError

_BIN = {
    "+": "+", "-": "-", "*": "*", "/": "/",
    ">": ">", "<": "<", ">=": ">=", "<=": "<=",
    "&": "&", "|": "|", "^": "#",  # xor: Postgres-style '#'
    "<<": "<<", ">>": ">>",
    "&&": "AND", "||": "OR",
}


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"  # gov/EvaluableExpression_sql.go:95-101
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def to_sql(node: Node) -> str:
    """Render a parsed expression AST as SQL text."""
    if isinstance(node, Literal):
        return _lit(node.value)
    if isinstance(node, Regex):
        return _lit(node.pattern)
    if isinstance(node, Var):
        return node.name
    if isinstance(node, Unary):
        inner = to_sql(node.operand)
        if node.op == "-":
            return f"(-{inner})"
        if node.op == "!":
            return f"(NOT {inner})"
        raise ExpressionError(f"operator {node.op!r} has no SQL rendering")
    if isinstance(node, Binary):
        left, right = to_sql(node.left), to_sql(node.right)
        if node.op == "==":
            return f"({left} = {right})"
        if node.op == "!=":
            return f"({left} <> {right})"
        if node.op == "=~":
            return f"({left} RLIKE {right})"
        if node.op == "!~":
            return f"({left} NOT RLIKE {right})"
        if node.op == "??":
            return f"COALESCE({left}, {right})"
        if node.op == "**":
            return f"POW({left}, {right})"
        if node.op == "%":
            return f"MOD({left}, {right})"
        if node.op == "in":
            return f"({left} IN {right})"
        sql_op = _BIN.get(node.op)
        if sql_op is None:
            raise ExpressionError(f"operator {node.op!r} has no SQL rendering")
        return f"({left} {sql_op} {right})"
    if isinstance(node, Ternary):
        # gov/EvaluableExpression_sql.go: ternary unsupported
        raise ExpressionError("ternary operator has no SQL rendering")
    if isinstance(node, Call):
        args = ", ".join(to_sql(a) for a in node.args)
        return f"{node.name}({args})"
    if isinstance(node, ArrayExpr):
        return "(" + ", ".join(to_sql(i) for i in node.items) + ")"
    raise ExpressionError(f"unknown AST node {node!r}")
