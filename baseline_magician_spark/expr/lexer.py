"""Lexer for the expression language.

Token inventory per the govaluate grammar (MANUAL.md): float64 numbers,
single/double-quoted strings (quoted strings matching a known date
format become unix-seconds numbers at lex time), booleans, variables
(bare identifiers or ``[bracketed names with spaces]``), operators,
parens, and the comma separator.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

from .errors import ExpressionError

# Multi-char operators first (longest match wins).
_OPERATORS = [
    "**", "<<", ">>", ">=", "<=", "==", "!=", "=~", "!~", "&&", "||", "??",
    "+", "-", "*", "/", "%", "^", "&", "|", "~", "!", ">", "<", "?", ":",
]

# Date layouts accepted for quoted literals (pragmatic subset of the 14
# Go layouts govaluate recognizes; all interpreted as UTC).
_DATE_FORMATS = (
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M",
    "%Y-%m-%d",
    "%m/%d/%Y %H:%M:%S",
    "%m/%d/%Y",
    "%Y-%m-%dT%H:%M:%S%z",
    "%d %b %Y %H:%M",
    "%d %b %Y",
)


@dataclass(frozen=True)
class Token:
    kind: str  # NUMBER STRING BOOL VAR OP LPAREN RPAREN COMMA IN
    value: object


def _try_date(text: str) -> float | None:
    for fmt in _DATE_FORMATS:
        try:
            dt = datetime.strptime(text, fmt)
        except ValueError:
            continue
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.timestamp()
    return None


def tokenize(src: str) -> list[Token]:
    out: list[Token] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c.isspace():
            i += 1
            continue
        # numbers (floats; also 0x hex like govaluate)
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            if src.startswith("0x", i) or src.startswith("0X", i):
                j = i + 2
                while j < n and src[j] in "0123456789abcdefABCDEF":
                    j += 1
                out.append(Token("NUMBER", float(int(src[i:j], 16))))
            else:
                j = i
                while j < n and (src[j].isdigit() or src[j] in ".eE" or (
                    src[j] in "+-" and src[j - 1] in "eE"
                )):
                    j += 1
                try:
                    out.append(Token("NUMBER", float(src[i:j])))
                except ValueError:
                    raise ExpressionError(f"bad number at {i}: {src[i:j]!r}")
            i = j
            continue
        # strings (single or double quoted; escapes via backslash)
        if c in "'\"":
            quote, j, buf = c, i + 1, []
            while j < n and src[j] != quote:
                if src[j] == "\\" and j + 1 < n:
                    buf.append(src[j + 1])
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise ExpressionError(f"unterminated string at {i}")
            text = "".join(buf)
            ts = _try_date(text)
            if ts is not None:
                out.append(Token("NUMBER", ts))
            else:
                out.append(Token("STRING", text))
            i = j + 1
            continue
        # bracketed variable names: [response time]
        if c == "[":
            j = src.find("]", i)
            if j < 0:
                raise ExpressionError(f"unclosed '[' at {i}")
            out.append(Token("VAR", src[i + 1 : j]))
            i = j + 1
            continue
        if c == "(":
            out.append(Token("LPAREN", "("))
            i += 1
            continue
        if c == ")":
            out.append(Token("RPAREN", ")"))
            i += 1
            continue
        if c == ",":
            out.append(Token("COMMA", ","))
            i += 1
            continue
        # identifiers: variables, booleans, IN keyword, function names
        if c.isalpha() or c == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_."):
                j += 1
            word = src[i:j]
            low = word.lower()
            if low == "true":
                out.append(Token("BOOL", True))
            elif low == "false":
                out.append(Token("BOOL", False))
            elif low == "in":
                out.append(Token("IN", "in"))
            else:
                out.append(Token("VAR", word))
            i = j
            continue
        # operators (longest match)
        for op in _OPERATORS:
            if src.startswith(op, i):
                out.append(Token("OP", op))
                i += len(op)
                break
        else:
            raise ExpressionError(f"unexpected character {c!r} at {i}")
    return out
