"""ClickHouse behavioral-analytics aggregates: ``windowFunnel``,
``retention``, ``sequenceMatch``, ``sequenceCount``.

Part of the §2.12 extension surface (the reference's CH server
evaluates these server-side; the client never spells them, so the
semantics here follow the public ClickHouse documentation for the
DEFAULT modes — no ``strict_*`` variants, no ``(?t op n)`` time
constraints).

Spark-first design — every builder returns an ordinary aggregate
``Column`` for ``groupBy(entity).agg(...)``:

- ONE shuffle on the (uniform) entity key; per-group state is the
  entity's own event list, collected as an array of narrow structs
  (events matching no condition are dropped BEFORE collect_list via
  the null-skipping ``when`` trick, so state is bounded by the
  entity's RELEVANT event count, not its raw row count).
- The funnel DP runs as an ``F.aggregate`` fold over the sorted
  array — a Catalyst higher-order function, JVM-side inside
  whole-stage codegen. No Python touches data.
- ``sequenceMatch``/``sequenceCount`` condense each entity's relevant
  events into a string of bitmap characters (one char per event,
  encoding WHICH conditions it matched) and translate the CH pattern
  into a Java regex over those characters; matching rides Spark's
  codegen'd ``RLIKE`` / ``regexp_count``.

windowFunnel semantics (default mode, per public CH docs/source
``AggregateFunctionWindowFunnel``): scan events in timestamp order;
a condition-1 event (re)opens a chain whose start is that event's
timestamp (later condition-1 events OVERWRITE the start — the widest
window forward); a condition-k event extends a level-(k-1) chain iff
its timestamp is within ``window`` seconds of the CHAIN START, and
propagates the start. An event matching several conditions advances
them in condition order within the same scan step. The result is the
deepest level reached. For the default mode this greedy DP is
equivalent to "the longest prefix chain e1 <= e2 <= ... <= ek with
t_k <= t_1 + window" — which is what the DuckDB oracle spells as
EXISTS chains.

Timestamps compare at MICROSECOND precision (``unix_micros``) so the
fold is exact and engine-order-independent wherever (entity, ts) is
unique; ``window`` is in seconds, CH's unit for DateTime arguments.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Condition-set bitmap alphabet: an event that matched conditions
# {i...} (1-based) is encoded as _ALPHABET[bitmap - 1]. 5 conditions
# max -> 31 distinct non-empty bitmaps, all plain letters (regex-safe
# without escaping).
MAX_CONDS = 5
_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcde"


def _bool(c: Column) -> Column:
    return F.coalesce(c.cast("boolean"), F.lit(False))


def _check_conds(conds: tuple) -> None:
    if not conds:
        raise ValueError("at least one condition is required")
    if len(conds) > MAX_CONDS:
        raise ValueError(
            f"at most {MAX_CONDS} conditions supported "
            f"(bitmap-character encoding)"
        )


def window_funnel(window: int, ts: Column, *conds: Column) -> Column:
    """``windowFunnel(window)(ts, cond1, ..., condK)`` -> max level.

    Aggregate Column: deepest funnel level (0..K) reached by ordered
    chains whose every event lies within ``window`` SECONDS of the
    chain-starting cond1 event.
    """
    _check_conds(conds)
    k = len(conds)
    win_us = int(window) * 1_000_000
    any_cond = _bool(conds[0])
    fields = [F.unix_micros(ts.cast("timestamp")).alias("t")]
    for i, c in enumerate(conds):
        b = _bool(c)
        fields.append(b.alias(f"c{i}"))
        if i:
            any_cond = any_cond | b
    # collect_list skips nulls -> only condition-relevant events make
    # it into per-group state; sort_array orders by t (first field).
    ev = F.sort_array(
        F.collect_list(F.when(any_cond, F.struct(*fields)))
    )

    # Fold accumulator: per level, the chain-START timestamp that has
    # reached this level (-1 = unreached). Within one event, levels
    # advance in condition order against the JUST-UPDATED lower level
    # (CH processes one (ts, cond_idx) entry per matched condition,
    # ascending cond_idx at equal ts).
    init = F.array(*[F.lit(-1).cast("long") for _ in range(k)])

    def step(acc: Column, e: Column) -> Column:
        news = [F.when(e["c0"], e["t"]).otherwise(acc[0])]
        for i in range(1, k):
            prev = news[i - 1]
            news.append(
                F.when(
                    e[f"c{i}"] & (prev >= 0) & (e["t"] - prev <= win_us),
                    prev,
                ).otherwise(acc[i])
            )
        return F.array(*news)

    folded = F.aggregate(ev, init, step)
    # Reached levels are contiguous from 0 (a chain at level i set
    # level i-1 first), so the count of set slots IS the max level.
    return F.size(F.filter(folded, lambda x: x >= 0))


def retention(*conds: Column) -> Column:
    """``retention(cond1, ..., condK)`` -> array<int> of 0/1 flags.

    r[0] = cond1 ever met; r[i] = cond1 AND cond_{i+1} both ever met
    (no ordering between them — CH semantics). Pure conditional-max
    aggregates: map-side partials, one shuffle, no per-group state.
    """
    _check_conds(conds)
    base = F.max(_bool(conds[0]).cast("int"))
    out = [base]
    for c in conds[1:]:
        out.append(F.least(base, F.max(_bool(c).cast("int"))))
    return F.array(*out)


_PATTERN_TOKEN = re.compile(r"\(\?(\d+)\)|\.\*|\.|\(\?t[^)]*\)")


def translate_pattern(pattern: str, k: int) -> str:
    """CH sequence pattern -> Java regex over bitmap characters.

    Supports ``(?N)`` condition atoms, ``.`` (any CONSIDERED event —
    events matching no condition are never in the string, matching
    CH, which ignores them), and ``.*`` (translated to the LAZY
    ``.*?`` so successive non-overlapping search counts chains the
    way CH's matcher does — advance past the first completed chain).
    ``(?t...)`` time constraints are not supported and raise.
    """
    out: list[str] = []
    pos = 0
    for m in _PATTERN_TOKEN.finditer(pattern):
        if m.start() != pos:
            raise ValueError(
                f"unsupported pattern syntax at {pattern[pos:]!r}"
            )
        tok = m.group(0)
        if tok == ".*":
            out.append(".*?")
        elif tok == ".":
            out.append(".")
        elif tok.startswith("(?t"):
            raise ValueError(
                "sequenceMatch time constraints (?t...) are not "
                "supported"
            )
        else:
            n = int(m.group(1))
            if not 1 <= n <= k:
                raise ValueError(
                    f"pattern references condition {n} but only "
                    f"{k} conditions were given"
                )
            chars = "".join(
                _ALPHABET[b - 1]
                for b in range(1, 1 << k)
                if b >> (n - 1) & 1
            )
            out.append(f"[{chars}]")
        pos = m.end()
    if pos != len(pattern):
        raise ValueError(
            f"unsupported pattern syntax at {pattern[pos:]!r}"
        )
    return "".join(out)


def _event_string(ts: Column, conds: tuple) -> Column:
    """Aggregate Column: the entity's relevant events, ts-ascending,
    one bitmap character each."""
    _check_conds(conds)
    bitmap = None
    for i, c in enumerate(conds):
        b = _bool(c).cast("int") * (1 << i)
        bitmap = b if bitmap is None else bitmap + b
    ev = F.sort_array(
        F.collect_list(
            F.when(
                bitmap > 0,
                F.struct(
                    F.unix_micros(ts.cast("timestamp")).alias("t"),
                    bitmap.alias("b"),
                ),
            )
        )
    )
    chars = F.array(*[F.lit(ch) for ch in _ALPHABET])
    return F.array_join(
        F.transform(ev, lambda e: F.element_at(chars, e["b"])), ""
    )


def sequence_match(pattern: str, ts: Column, *conds: Column) -> Column:
    """``sequenceMatch('(?1).*(?2)')(ts, cond1, ...)`` -> boolean.

    True iff the entity's event sequence contains a chain matching
    the pattern (unanchored search, like CH).
    """
    rx = translate_pattern(pattern, len(conds))
    return _event_string(ts, conds).rlike(rx)


def sequence_count(pattern: str, ts: Column, *conds: Column) -> Column:
    """``sequenceCount('(?1).*(?2)')(ts, cond1, ...)`` -> long count
    of successive NON-OVERLAPPING chains (leftmost-shortest, matching
    CH's advance-past-each-completed-chain search)."""
    rx = translate_pattern(pattern, len(conds))
    return F.regexp_count(_event_string(ts, conds), F.lit(rx))


def sequence_next_node(
    direction: str, base: str, ts: Column, val: Column,
    base_cond: Column, *conds: Column
) -> Column:
    """``sequenceNextNode(direction, base)(ts, event_column,
    base_condition, event1, ..., eventN)`` -> the event_column value
    of the event immediately AFTER the matched chain, else NULL.

    CH (experimental, allow_experimental_funnel_functions) semantics:
    events scan in timestamp order (reversed for 'backward'); the
    anchor is the scan's first event ('head'/'tail'), or the
    first/last position where event1 matches ('first_match' /
    'last_match'); the anchor must also satisfy base_condition; the
    chain event1..eventN covers N consecutive events starting AT the
    anchor, and the value of the following event returns. ALL events
    enter the tape (the "next" event need match no condition) — the
    same bounded per-group state every tape fold here carries.
    """
    _check_conds(conds)
    dirn = str(direction).strip("'\"").lower()
    basem = str(base).strip("'\"").lower()
    if dirn not in ("forward", "backward"):
        raise ValueError(f"sequenceNextNode direction {direction!r}")
    if basem not in ("head", "tail", "first_match", "last_match"):
        raise ValueError(f"sequenceNextNode base {base!r}")
    # CH pairs forward with head and backward with tail; both names
    # mean "first event of the scan order" here, so either is
    # accepted with either direction.
    n = len(conds)
    fields = [
        F.unix_micros(ts.cast("timestamp")).alias("t"),
        val.cast("string").alias("v"),
        _bool(base_cond).alias("b"),
    ]
    for i, c in enumerate(conds):
        fields.append(_bool(c).alias(f"c{i}"))
    tape_expr = F.sort_array(F.collect_list(F.struct(*fields)))
    if dirn == "backward":
        tape_expr = F.reverse(tape_expr)

    def build(tape: Column) -> Column:
        m = F.size(tape)

        def chain_at(j: Column) -> Column:
            ok = F.lit(True)
            for i in range(n):
                ok = ok & F.coalesce(
                    F.try_element_at(tape, j + i)[f"c{i}"],
                    F.lit(False),
                )
            return ok

        if basem in ("head", "tail"):
            anchor = F.when(
                F.coalesce(
                    F.try_element_at(tape, F.lit(1))["b"],
                    F.lit(False),
                ),
                F.lit(1),
            )
        else:
            # CH anchors ONCE at the first/last event1 match (that
            # also satisfies base_condition) and checks the chain
            # THERE — a failed chain does not re-anchor elsewhere
            hits = F.filter(
                F.sequence(F.lit(1), m),
                lambda j: F.coalesce(
                    F.try_element_at(tape, j)["b"]
                    & F.try_element_at(tape, j)["c0"],
                    F.lit(False),
                ),
            )
            pick = (
                F.array_min if basem == "first_match" else F.array_max
            )
            anchor = F.when(F.size(hits) > 0, pick(hits))
        return _let_f(
            anchor,
            lambda a: F.when(
                a.isNotNull() & chain_at(a),
                F.try_element_at(tape, a + n)["v"],
            ),
        )

    return _let_f(tape_expr, build)


from .stats_tests import _let as _let_f  # noqa: E402  (one binder)
