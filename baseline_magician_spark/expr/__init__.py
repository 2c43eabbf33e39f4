"""The user-facing scalar expression language.

A govaluate-compatible mini-language (the reference's user-supplied
threshold expressions, e.g. ``value * 2`` — reference main.go:352-435,
vendored spec at vendor/github.com/Knetic/govaluate/MANUAL.md) with two
backends over one AST:

- :func:`compile_column` — emits a ``pyspark.sql.Column`` tree, so
  Catalyst constant-folds and codegens the expression (columnar mode);
- :func:`evaluate` — a driver-side scalar interpreter (the reference's
  actual usage: thresholds over already-aggregated values).

Semantics follow the govaluate type model (MANUAL.md:7-15): all
numbers are float64; ``+`` concatenates when either side is a string;
comparisons are numeric or lexicographic; ``==`` is deep equality;
``&&``/``||``/``?:``/``??`` short-circuit; bitwise ops round-trip
through int64, shifts through uint64; quoted date literals become unix
seconds at parse time. This is a fresh implementation (AST +
precedence-climbing parser), not a port of the reference's token-stage
machinery.
"""

from .parser import parse
from .errors import ExpressionError
from .compiler import compile_column
from .interp import evaluate
from .sqlgen import to_sql

__all__ = ["parse", "compile_column", "evaluate", "to_sql", "ExpressionError"]
