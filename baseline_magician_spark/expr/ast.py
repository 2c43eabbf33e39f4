"""Expression AST nodes (shared by the Column compiler and interpreter)."""

from __future__ import annotations

from dataclasses import dataclass


class Node:
    __slots__ = ()


@dataclass(frozen=True)
class Literal(Node):
    value: float | str | bool | None


@dataclass(frozen=True)
class Regex(Node):
    """A string literal in regex position (precompiled at plan time)."""

    pattern: str


@dataclass(frozen=True)
class Var(Node):
    name: str


@dataclass(frozen=True)
class Unary(Node):
    op: str  # '-', '!', '~'
    operand: Node


@dataclass(frozen=True)
class Binary(Node):
    op: str
    left: Node
    right: Node


@dataclass(frozen=True)
class Ternary(Node):
    cond: Node
    then: Node
    otherwise: Node | None  # None -> nil when cond is false


@dataclass(frozen=True)
class Call(Node):
    name: str
    args: tuple[Node, ...]


@dataclass(frozen=True)
class ArrayExpr(Node):
    items: tuple[Node, ...]
