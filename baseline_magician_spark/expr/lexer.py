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
# Each entry carries a full-match GUARD regex because strptime is
# looser than Go's time.Parse (case-insensitive %a/%b/%p, %z accepting
# both ±hhmm and ±hh:mm) — the guard enforces the Go layout's exact
# shape (Z07:00 = 'Z' or ±hh:mm; Z0700 = 'Z' or ±hhmm; no -07:00 layout
# accepts 'Z'). Zone-less layouts are interpreted as UTC.
_D = r"\d"
_WD = r"[A-Z][a-z]{2}"  # Mon / Jan — capitalized, as Go emits/parses
_DATE_FORMATS = (
    # time.ANSIC "Mon Jan _2 15:04:05 2006" (_2 = space-padded day: Go
    # parses both 'Jan  2' and 'Jan 2' — an optional extra space before
    # a 1-2 digit day; any OTHER doubled/odd whitespace stays a string)
    ("%a %b %d %H:%M:%S %Y",
     rf"{_WD} {_WD}  ?{_D}{{1,2}} {_D}{{2}}:{_D}{{2}}:{_D}{{2}} {_D}{{4}}"),
    # time.UnixDate "Mon Jan _2 15:04:05 MST 2006" (%Z limited to names
    # strptime knows — UTC/GMT)
    ("%a %b %d %H:%M:%S %Z %Y",
     rf"{_WD} {_WD}  ?{_D}{{1,2}} {_D}{{2}}:{_D}{{2}}:{_D}{{2}} [A-Z]{{3,4}} {_D}{{4}}"),
    # time.RubyDate "Mon Jan 02 15:04:05 -0700 2006"
    ("%a %b %d %H:%M:%S %z %Y",
     rf"{_WD} {_WD} {_D}{{2}} {_D}{{2}}:{_D}{{2}}:{_D}{{2}} [+-]{_D}{{4}} {_D}{{4}}"),
    # time.RFC3339 "2006-01-02T15:04:05Z07:00"
    ("%Y-%m-%dT%H:%M:%S%z",
     rf"{_D}{{4}}-{_D}{{2}}-{_D}{{2}}T{_D}{{2}}:{_D}{{2}}:{_D}{{2}}(Z|[+-]{_D}{{2}}:{_D}{{2}})"),
    # time.RFC3339Nano (1-9 fraction digits)
    ("%Y-%m-%dT%H:%M:%S.%f%z",
     rf"{_D}{{4}}-{_D}{{2}}-{_D}{{2}}T{_D}{{2}}:{_D}{{2}}:{_D}{{2}}\.{_D}{{1,9}}(Z|[+-]{_D}{{2}}:{_D}{{2}})"),
    # "2006-01-02"
    ("%Y-%m-%d", rf"{_D}{{4}}-{_D}{{2}}-{_D}{{2}}"),
    # "2006-01-02 15:04"
    ("%Y-%m-%d %H:%M", rf"{_D}{{4}}-{_D}{{2}}-{_D}{{2}} {_D}{{2}}:{_D}{{2}}"),
    # "2006-01-02 15:04:05"
    ("%Y-%m-%d %H:%M:%S",
     rf"{_D}{{4}}-{_D}{{2}}-{_D}{{2}} {_D}{{2}}:{_D}{{2}}:{_D}{{2}}"),
    # "2006-01-02 15:04:05-07:00" (offset REQUIRED, no 'Z' in layout)
    ("%Y-%m-%d %H:%M:%S%z",
     rf"{_D}{{4}}-{_D}{{2}}-{_D}{{2}} {_D}{{2}}:{_D}{{2}}:{_D}{{2}}[+-]{_D}{{2}}:{_D}{{2}}"),
    # "2006-01-02T15Z0700"
    ("%Y-%m-%dT%H%z", rf"{_D}{{4}}-{_D}{{2}}-{_D}{{2}}T{_D}{{2}}(Z|[+-]{_D}{{4}})"),
    # "2006-01-02T15:04Z0700"
    ("%Y-%m-%dT%H:%M%z",
     rf"{_D}{{4}}-{_D}{{2}}-{_D}{{2}}T{_D}{{2}}:{_D}{{2}}(Z|[+-]{_D}{{4}})"),
    # "2006-01-02T15:04:05Z0700" (no-colon sibling of RFC3339)
    ("%Y-%m-%dT%H:%M:%S%z",
     rf"{_D}{{4}}-{_D}{{2}}-{_D}{{2}}T{_D}{{2}}:{_D}{{2}}:{_D}{{2}}(Z|[+-]{_D}{{4}})"),
    # "...15:04:05.999999999Z0700"
    ("%Y-%m-%dT%H:%M:%S.%f%z",
     rf"{_D}{{4}}-{_D}{{2}}-{_D}{{2}}T{_D}{{2}}:{_D}{{2}}:{_D}{{2}}\.{_D}{{1,9}}(Z|[+-]{_D}{{4}})"),
)
_DATE_GUARDS = tuple((fmt, re.compile(rx)) for fmt, rx in _DATE_FORMATS)
# time.Kitchen "3:04PM": hour unpadded 1-12, minutes 00-59, uppercase
# AM/PM only; Go's zero year (0000) is below datetime.min,
# special-cased
_KITCHEN_RE = re.compile(r"(1[0-2]|[1-9]):([0-5]\d)(AM|PM)")
_GO_ZERO_UNIX = -62167219200  # unix seconds of 0000-01-01T00:00:00Z


@dataclass(frozen=True)
class Token:
    kind: str  # NUMBER STRING BOOL VAR OP LPAREN RPAREN COMMA IN
    value: object


def _try_date(text: str) -> float | None:
    # No whitespace normalization before guarding: Go's layouts are
    # exact (a tab or doubled space anywhere except the _2 day slot —
    # which the %a guards model explicitly — makes the string a plain
    # string literal, not a date)
    candidate = text
    for fmt, guard in _DATE_GUARDS:
        if not guard.fullmatch(candidate):
            continue
        # strptime needs single separators (collapse the _2 pad) and
        # stops %f at 6 digits (trim ns exactly as timestamp() would)
        parseable = re.sub(r" {2}", " ", candidate)
        parseable = re.sub(r"(\.\d{6})\d{1,3}", r"\1", parseable)
        try:
            dt = datetime.strptime(parseable, fmt)
        except ValueError:
            continue
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.timestamp()
    m = _KITCHEN_RE.fullmatch(candidate)
    if m is None:
        return None
    # time.Kitchen has no date: Go lands on 0000-01-01, below Python's
    # datetime range — compute the unix seconds directly
    hour = int(m.group(1)) % 12 + (12 if m.group(3) == "PM" else 0)
    return float(_GO_ZERO_UNIX + hour * 3600 + int(m.group(2)) * 60)


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
                if j == i + 2:  # bare '0x' — no hex digits follow
                    raise ExpressionError(f"bad number at {i}: {src[i:j]!r}")
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
            # exact-case keywords, like govaluate (gov/parsing.go):
            # 'true'/'false' lowercase only, the membership operator
            # 'in'/'IN' — anything else ('True', 'In') is a variable
            if word == "true":
                out.append(Token("BOOL", True))
            elif word == "false":
                out.append(Token("BOOL", False))
            elif word in ("in", "IN"):
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
