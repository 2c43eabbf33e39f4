"""Parameter binding for the CH-dialect front end (SURVEY §2.2 P7).

Replicates the reference driver's placeholder substitution
(vendor/github.com/ClickHouse/clickhouse-go/stmt.go:116-204):

- ``?`` placeholders substitute the next positional argument, but ONLY
  when the scanner is in "keyword" state — i.e. the ``?`` follows a
  binding operator (``= < > ( , + - * / [``) or one of the binding
  keywords (LIMIT, OFFSET, LIKE, IN, FROM, JOIN, SELECT, or the AND of
  a pending BETWEEN), with only whitespace in between. A ``?``
  anywhere else is literal text (helpers.go:56-87 mirrors the rule for
  counting).
- ``@name`` placeholders substitute the named argument wherever they
  appear (stmt.go:139-151 — the reference's bind pass does NOT track
  quote state; we keep that exact behavior).
- Values are SQL-escaped by ``quote_value``, the Python twin of
  helpers.go:122-144: strings quoted with ``\\``/``'`` escapes, lists
  joined comma-style (for IN lists), datetimes rendered as
  ``toDateTime('...', 'tz')``, None as ``null``.
- An ``ExternalTable`` argument substitutes its NAME into the SQL and
  is returned for the executor to register (stmt.go:139-163,
  clickhouse_send_external_data.go:5-35) — the S6 external-table
  surface feeding ``IN ext_table``.

The word matchers intentionally reproduce word_matcher.go:10-31,
including its lack of word-boundary checks (the matcher is a plain
rune automaton, so e.g. the trailing "in" of "min" arms the keyword
state exactly like the Go driver).
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Mapping, Sequence
from dataclasses import dataclass
from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

_BIND_CHARS = frozenset("=<>(,+-*/[")
_BIND_WORDS = ("limit", "offset", "like", "in", "from", "join", "select")


@dataclass
class ExternalTable:
    """A client-shipped temporary table bound into the query (S6).

    ``name`` is what the SQL text references; ``df`` is the in-memory
    relation (small by construction — the reference ships it as
    in-band protocol blocks, i.e. client RAM).
    """

    name: str
    df: "DataFrame"


class _WordMatcher:
    """Case-insensitive single-word automaton (word_matcher.go:10-31)."""

    def __init__(self, word: str):
        self.word = word.upper()
        self.position = 0

    def match(self, ch: str) -> bool:
        if self.word[self.position] == ch.upper():
            if self.position == len(self.word) - 1:
                self.position = 0
                return True
            self.position += 1
        else:
            self.position = 0
        return False


def quote_value(v: Any) -> str:
    """SQL-literal rendering, matching helpers.go:122-144 (quote)."""
    if isinstance(v, ExternalTable):
        raise TypeError("external tables substitute names, not literals")
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, bool):
        return "true" if v else "false"  # Go fmt.Sprint(bool)
    if isinstance(v, _dt.datetime):
        tz = v.tzname() or "UTC"
        return f"toDateTime('{v.strftime('%Y-%m-%d %H:%M:%S')}', '{tz}')"
    if isinstance(v, _dt.date):
        return f"toDate('{v.isoformat()}')"
    if v is None:
        return "null"
    if isinstance(v, (list, tuple)):
        return ", ".join(quote_value(x) for x in v)
    return str(v)


def _param_name(sql: str, i: int) -> tuple[str, int]:
    """Parse the identifier after '@' (helpers.go:96-111)."""
    j = i
    while j < len(sql) and (sql[j] == "_" or sql[j].isalnum()):
        j += 1
    return sql[i:j], j


def bind_params(
    sql: str,
    args: Sequence[Any] = (),
    named: Mapping[str, Any] | None = None,
) -> tuple[str, list[ExternalTable]]:
    """Substitute ``?`` / ``@name`` placeholders (stmt.go:116-204).

    Returns the bound SQL plus any ExternalTable arguments encountered
    (to be registered with the executor before running).
    """
    named = named or {}
    out: list[str] = []
    index = 0
    keyword = False
    in_between = False
    matchers = [_WordMatcher(w) for w in _BIND_WORDS]
    between = _WordMatcher("between")
    and_m = _WordMatcher("and")
    externals: list[ExternalTable] = []

    i = 0
    while i < len(sql):
        ch = sql[i]
        if ch == "@":
            name, j = _param_name(sql, i + 1)
            if name:
                # the reference consumes the parsed name whether or not
                # a matching arg exists (stmt.go:139-151 writes nothing
                # for an unbound @name — the placeholder just vanishes)
                if name in named:
                    v = named[name]
                    if isinstance(v, ExternalTable):
                        out.append(v.name)
                        externals.append(v)
                    else:
                        out.append(quote_value(v))
                i = j
                continue
            out.append(ch)
            i += 1
            continue
        if ch == "?":
            if keyword and index < len(args):
                v = args[index]
                if isinstance(v, ExternalTable):
                    out.append(v.name)
                    externals.append(v)
                else:
                    out.append(quote_value(v))
                index += 1
            else:
                out.append(ch)
            i += 1
            continue
        if ch in _BIND_CHARS:
            keyword = True
        else:
            # faithfully short-circuited like the Go || / else-if
            # chain: once a matcher completes a word on this rune, the
            # remaining automata do not see it (stmt.go:183-193)
            word_hit = False
            for m in matchers:
                if m.match(ch):
                    word_hit = True
                    break
            if word_hit:
                keyword = True
            elif between.match(ch):
                keyword = True
                in_between = True
            elif in_between and and_m.match(ch):
                keyword = True
                in_between = False
            else:
                keyword = keyword and ch.isspace()
        out.append(ch)
        i += 1
    return "".join(out), externals
