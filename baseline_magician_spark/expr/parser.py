"""Precedence-climbing parser producing the expression AST.

Precedence ladder (loosest to tightest), matching the govaluate
grammar: separator ``,`` < ``||`` < ``&&`` < ternary ``? : ??`` <
comparators (`> < >= <= == != =~ !~ in`) < bitwise ``& | ^`` <
shifts ``<< >>`` < additive ``+ -`` < multiplicative ``* / %`` <
exponent ``**`` (right-assoc) < prefix ``- ! ~`` < function call.
"""

from __future__ import annotations

from .ast import ArrayExpr, Binary, Call, Literal, Node, Regex, Ternary, Unary, Var
from .errors import ExpressionError
from .lexer import Token, tokenize

_COMPARATORS = {">", "<", ">=", "<=", "==", "!=", "=~", "!~"}


class _Parser:
    def __init__(self, tokens: list[Token], functions: frozenset[str]):
        self.toks = tokens
        self.pos = 0
        self.functions = functions

    def peek(self, kind: str | None = None, value: object = None) -> Token | None:
        if self.pos >= len(self.toks):
            return None
        t = self.toks[self.pos]
        if kind is not None and t.kind != kind:
            return None
        if value is not None and t.value != value:
            return None
        return t

    def next(self) -> Token:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, kind: str, value: object = None) -> Token:
        t = self.peek(kind, value)
        if t is None:
            got = self.toks[self.pos] if self.pos < len(self.toks) else "<eof>"
            raise ExpressionError(f"expected {value or kind}, got {got}")
        return self.next()

    # ladder, loosest first ------------------------------------------------

    def parse_separator(self) -> Node:
        first = self.parse_or()
        if not self.peek("COMMA"):
            return first
        items = [first]
        while self.peek("COMMA"):
            self.next()
            items.append(self.parse_or())
        return ArrayExpr(tuple(items))

    def _binary_chain(self, sub, ops: set[str]) -> Node:
        left = sub()
        while True:
            t = self.peek("OP")
            if t is None or t.value not in ops:
                return left
            op = self.next().value
            left = Binary(op, left, sub())

    def parse_or(self) -> Node:
        return self._binary_chain(self.parse_and, {"||"})

    def parse_and(self) -> Node:
        return self._binary_chain(self.parse_ternary, {"&&"})

    def parse_ternary(self, in_then: bool = False) -> Node:
        cond = self.parse_comparator()
        if self.peek("OP", "?"):
            self.next()
            # inside the then-branch a bare ':' belongs to THIS '?'
            then = self.parse_ternary(in_then=True)
            otherwise = None
            if self.peek("OP", ":"):
                self.next()
                otherwise = self.parse_ternary(in_then=in_then)
            return Ternary(cond, then, otherwise)
        if self.peek("OP", "??"):
            self.next()
            return Binary("??", cond, self.parse_ternary(in_then=in_then))
        if not in_then and self.peek("OP", ":"):
            # govaluate's standalone ternary-else (E13,
            # gov/evaluationStage.go:163-168): 'x : b' yields x unless
            # x is nil — the same coalesce the '??' stage implements
            self.next()
            return Binary("??", cond, self.parse_ternary())
        return cond

    def parse_comparator(self) -> Node:
        left = self.parse_bitwise()
        while True:
            if self.peek("IN"):
                self.next()
                left = Binary("in", left, self.parse_bitwise())
                continue
            t = self.peek("OP")
            if t is None or t.value not in _COMPARATORS:
                return left
            op = self.next().value
            right = self.parse_bitwise()
            if op in ("=~", "!~") and isinstance(right, Literal) and isinstance(
                right.value, str
            ):
                right = Regex(right.value)  # precompiled pattern literal
            left = Binary(op, left, right)

    def parse_bitwise(self) -> Node:
        return self._binary_chain(self.parse_shift, {"&", "|", "^"})

    def parse_shift(self) -> Node:
        return self._binary_chain(self.parse_additive, {"<<", ">>"})

    def parse_additive(self) -> Node:
        return self._binary_chain(self.parse_multiplicative, {"+", "-"})

    def parse_multiplicative(self) -> Node:
        return self._binary_chain(self.parse_exponent, {"*", "/", "%"})

    def parse_exponent(self) -> Node:
        left = self.parse_prefix()
        if self.peek("OP", "**"):
            self.next()
            return Binary("**", left, self.parse_exponent())  # right-assoc
        return left

    def parse_prefix(self) -> Node:
        t = self.peek("OP")
        if t is not None and t.value in ("-", "!", "~"):
            self.next()
            return Unary(t.value, self.parse_prefix())
        return self.parse_primary()

    def parse_primary(self) -> Node:
        t = self.peek()
        if t is None:
            raise ExpressionError("unexpected end of expression")
        if t.kind == "NUMBER" or t.kind == "STRING":
            self.next()
            return Literal(t.value)
        if t.kind == "BOOL":
            self.next()
            return Literal(t.value)
        if t.kind == "VAR":
            self.next()
            if self.peek("LPAREN"):
                name = str(t.value)
                if name not in self.functions:
                    raise ExpressionError(f"undefined function {name!r}")
                self.next()
                args: list[Node] = []
                if not self.peek("RPAREN"):
                    node = self.parse_separator()
                    if isinstance(node, ArrayExpr):
                        args = list(node.items)
                    else:
                        args = [node]
                self.expect("RPAREN")
                return Call(name, tuple(args))
            return Var(str(t.value))
        if t.kind == "LPAREN":
            self.next()
            inner = self.parse_separator()
            self.expect("RPAREN")
            return inner
        raise ExpressionError(f"unexpected token {t}")


def parse(src: str, functions: frozenset[str] | set[str] = frozenset()) -> Node:
    tokens = tokenize(src)
    if not tokens:
        raise ExpressionError("empty expression")
    p = _Parser(tokens, frozenset(functions))
    node = p.parse_separator()
    if p.pos != len(p.toks):
        raise ExpressionError(f"trailing tokens from {p.toks[p.pos]}")
    return node
