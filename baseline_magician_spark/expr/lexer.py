"""Lexer for the expression language.

Token inventory per the govaluate grammar (MANUAL.md): float64 numbers,
single/double-quoted strings (quoted strings matching a known date
format become unix-seconds numbers at lex time), booleans, variables
(bare identifiers or ``[bracketed names with spaces]``), operators,
parens, and the comma separator.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timezone

from .errors import ExpressionError

# Multi-char operators first (longest match wins).
_OPERATORS = [
    "**", "<<", ">>", ">=", "<=", "==", "!=", "=~", "!~", "&&", "||", "??",
    "+", "-", "*", "/", "%", "^", "&", "|", "~", "!", ">", "<", "?", ":",
]

# The exact 14 Go layouts govaluate tries (gov/parsing.go:406-437), in
# strptime form. Matching the list EXACTLY matters in both directions:
# a format we'd over-accept (e.g. '1/2/2014') must stay a plain string
# (comparing it to a number is then a type error, as in govaluate), and
# every gov-accepted literal must become unix-seconds at lex time.
# Zone-less layouts are interpreted as UTC (time.Parse semantics).
_DATE_FORMATS = (
    "%a %b %d %H:%M:%S %Y",      # time.ANSIC (strptime tolerates _2)
    "%a %b %d %H:%M:%S %Z %Y",   # time.UnixDate (%Z limited to UTC/GMT)
    "%a %b %d %H:%M:%S %z %Y",   # time.RubyDate
    "%Y-%m-%dT%H:%M:%S%z",       # time.RFC3339
    "%Y-%m-%dT%H:%M:%S.%f%z",    # time.RFC3339Nano (ns trimmed to µs)
    "%Y-%m-%d",                  # RFC3339-date
    "%Y-%m-%d %H:%M",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d %H:%M:%S%z",
    "%Y-%m-%dT%H%z",             # ISO8601 hour
    "%Y-%m-%dT%H:%M%z",          # ISO8601 minutes
)
_KITCHEN = "%I:%M%p"  # time.Kitchen; Go's zero year (0000) special-cased
_GO_ZERO_UNIX = -62167219200  # unix seconds of 0000-01-01T00:00:00Z


@dataclass(frozen=True)
class Token:
    kind: str  # NUMBER STRING BOOL VAR OP LPAREN RPAREN COMMA IN
    value: object


def _try_date(text: str) -> float | None:
    # Go's _2 layouts space-pad single-digit days; strptime wants one
    # separator. Nano fractions (9 digits) trim to strptime's 6.
    candidate = re.sub(r"\s+", " ", text)
    candidate = re.sub(r"(\.\d{6})\d+", r"\1", candidate)
    for fmt in _DATE_FORMATS:
        try:
            dt = datetime.strptime(candidate, fmt)
        except ValueError:
            continue
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.timestamp()
    try:
        dt = datetime.strptime(candidate, _KITCHEN)
    except ValueError:
        return None
    # time.Kitchen has no date: Go lands on 0000-01-01, below Python's
    # datetime range — compute the unix seconds directly
    return float(_GO_ZERO_UNIX + dt.hour * 3600 + dt.minute * 60)


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
