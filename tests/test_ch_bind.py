"""P7 parameter binding: the ?/@name recognition + quoting rules of
ch/stmt.go:116-204 and ch/helpers.go:13-144, case by case."""

from __future__ import annotations

import datetime as dt

from baseline_magician_spark.plans.ch_bind import (
    ExternalTable,
    bind_params,
    quote_value,
)


def b(sql, args=(), named=None):
    out, _ = bind_params(sql, args, named)
    return out


class TestPositional:
    def test_after_comparison(self):
        assert b("SELECT * FROM t WHERE x = ?", (5,)) == (
            "SELECT * FROM t WHERE x = 5"
        )
        assert b("WHERE x > ? AND y <= ?", (1, 2)) == "WHERE x > 1 AND y <= 2"

    def test_after_arith_operators(self):
        assert b("WHERE x = a + ?", (1,)) == "WHERE x = a + 1"
        assert b("WHERE x = a * ?", (2,)) == "WHERE x = a * 2"

    def test_in_list_positions(self):
        # '(' and ',' both arm the keyword state
        assert b("WHERE x IN (?, ?, ?)", ("a", "b", "c")) == (
            "WHERE x IN ('a', 'b', 'c')"
        )

    def test_after_limit_offset(self):
        assert b("SELECT x FROM t LIMIT ? OFFSET ?", (10, 5)) == (
            "SELECT x FROM t LIMIT 10 OFFSET 5"
        )

    def test_after_like(self):
        assert b("WHERE name LIKE ?", ("%x%",)) == "WHERE name LIKE '%x%'"

    def test_between_and(self):
        # BETWEEN arms; its AND re-arms exactly once (inBetween flag)
        assert b("WHERE x BETWEEN ? AND ?", (1, 9)) == (
            "WHERE x BETWEEN 1 AND 9"
        )

    def test_plain_and_does_not_arm(self):
        # AND outside a BETWEEN is not a binding keyword
        assert b("WHERE a AND ?", (1,)) == "WHERE a AND ?"

    def test_not_recognized_mid_text(self):
        # '?' not preceded by a binding keyword/operator stays literal
        assert b("SELECT a ? b FROM t", (1,)) == "SELECT a ? b FROM t"

    def test_keyword_state_survives_whitespace_only(self):
        assert b("WHERE x =   ?", (7,)) == "WHERE x =   7"
        # an intervening identifier clears the armed state
        assert b("WHERE x = y z ?", (7,)) == "WHERE x = y z ?"

    def test_no_word_boundary_quirk(self):
        # word_matcher.go has no boundary check: the trailing "in" of
        # any identifier arms the keyword state, exactly like the Go
        # driver
        assert b("WHERE margin ?", (3,)) == "WHERE margin 3"


class TestNamed:
    def test_basic(self):
        assert b("WHERE x = @lo AND y = @hi", named={"lo": 1, "hi": 2}) == (
            "WHERE x = 1 AND y = 2"
        )

    def test_repeated_name(self):
        assert b("WHERE x = @v OR y = @v", named={"v": 3}) == (
            "WHERE x = 3 OR y = 3"
        )

    def test_unknown_name_consumed_and_dropped(self):
        # stmt.go:139-151 writes NOTHING for an unbound @name — the
        # placeholder just vanishes from the bound SQL
        assert b("WHERE x = @nope", named={"v": 3}) == "WHERE x = "
        assert b("WHERE x = @nope AND y = ?", (5,), {"v": 3}) == (
            "WHERE x =  AND y = 5"
        )

    def test_scientific_notation_floats_bind(self):
        # Go fmt.Sprint renders small floats in scientific notation
        assert b("WHERE v < ?", (1e-05,)) == "WHERE v < 1e-05"

    def test_anywhere_no_keyword_needed(self):
        # stmt.go's bind substitutes @name in any position
        assert b("SELECT @v", named={"v": 1}) == "SELECT 1"


class TestQuoting:
    def test_string_escapes(self):
        assert quote_value("o'brien") == r"'o\'brien'"
        assert quote_value("a\\b") == r"'a\\b'"

    def test_numbers_and_null_and_bool(self):
        assert quote_value(5) == "5"
        assert quote_value(2.5) == "2.5"
        assert quote_value(None) == "null"
        assert quote_value(True) == "true"

    def test_list_joins(self):
        assert quote_value(["a", "b"]) == "'a', 'b'"
        assert quote_value([1, 2]) == "1, 2"

    def test_datetime_todatetime(self):
        v = dt.datetime(2024, 3, 1, 12, 30, 5)
        assert quote_value(v) == "toDateTime('2024-03-01 12:30:05', 'UTC')"

    def test_date_todate(self):
        assert quote_value(dt.date(2024, 3, 1)) == "toDate('2024-03-01')"


class TestQuoteStateQuirks:
    """stmt.go's bind pass does NOT track quote state (stmt.go:139-151)
    — placeholders and binding operators inside string literals behave
    exactly as if the quotes were not there. Pin that, it is the
    sharpest divergence from a 'sane' binder."""

    def test_named_substitutes_inside_string_literal(self):
        assert b("WHERE s = 'x @v y'", named={"v": 1}) == "WHERE s = 'x 1 y'"

    def test_binding_char_inside_string_arms_keyword(self):
        # the '(' INSIDE the literal arms the scanner; the '?' inside
        # the same literal then binds
        assert b("SELECT '( ?'", (1,)) == "SELECT '( 1'"

    def test_quote_char_clears_keyword_state(self):
        # '=' arms, but the opening quote is a non-space rune, so the
        # '?' directly inside the literal is NOT armed
        assert b("WHERE s = '?'", (5,)) == "WHERE s = '?'"


class TestWordMatcherAutomaton:
    """word_matcher.go:10-31 is a naive rune automaton: no word
    boundaries, and on mismatch it resets WITHOUT retrying the current
    rune — so overlapping prefixes make it miss real occurrences."""

    def test_overlapping_prefix_misses_word(self):
        # "frfrom": the second 'f' mismatches 'o' at position 2 and the
        # automaton restarts on the NEXT rune, so "from" never matches
        assert b("WHERE frfrom ?", (3,)) == "WHERE frfrom ?"
        assert b("WHERE xfrom ?", (3,)) == "WHERE xfrom 3"

    def test_between_and_rearms_exactly_once(self):
        assert b("WHERE x BETWEEN ? AND ? AND ?", (1, 9, 7)) == (
            "WHERE x BETWEEN 1 AND 9 AND ?"
        )


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False


if _HAS_HYPOTHESIS:
    _ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
    _plain = st.text(
        alphabet="abcxyz_ 0123456789", min_size=0, max_size=20
    )

    class TestBindProperties:
        @given(_plain)
        @settings(max_examples=200, deadline=None)
        def test_identity_without_placeholders(self, sql):
            # no '?'/'@' -> byte-identical output, args untouched
            assert b(sql, (1, 2, 3), {"v": 9}) == sql

        @given(st.sampled_from(sorted("=<>(,+-*/[")), st.integers(0, 4))
        @settings(max_examples=100, deadline=None)
        def test_binding_char_plus_whitespace_always_arms(self, op, nsp):
            sql = f"WHERE x {op}{' ' * nsp}?"
            assert b(sql, (7,)) == f"WHERE x {op}{' ' * nsp}7"

        # prefix alphabet avoids every letter of every binding word
        # (incl. BETWEEN/AND): such a prefix provably leaves all
        # automata at position 0, so the keyword then matches from the
        # start. Prefixes sharing letters can interfere via the no-
        # retry reset — "ffrom"/"frfrom" never match "from"; that
        # overlap quirk is pinned case-wise above.
        @given(
            st.from_regex(r"[ghpquvxyz][ghpquvxyz0-9_]{0,7}", fullmatch=True),
            st.sampled_from(
                ["limit", "offset", "like", "in", "from", "join", "select"]
            ),
        )
        @settings(max_examples=200, deadline=None)
        def test_identifier_ending_in_keyword_arms(self, prefix, kw):
            # the no-word-boundary quirk, generalized: an identifier
            # whose spelling ends with a binding keyword arms the state
            sql = f"WHERE {prefix}{kw} ?"
            assert b(sql, (3,)) == f"WHERE {prefix}{kw} 3"

        def test_overlapping_prefix_interferes(self):
            # the complementary quirk: a prefix that partially matches
            # makes the automaton MISS the embedded keyword entirely
            assert b("WHERE ffrom ?", (3,)) == "WHERE ffrom ?"

        @given(_ident)
        @settings(max_examples=200, deadline=None)
        def test_named_substitutes_in_any_position(self, name):
            out = b(f"tail @{name} head", named={name: 42})
            assert out == "tail 42 head"

        @given(st.lists(_ident, min_size=1, max_size=4, unique=True))
        @settings(max_examples=100, deadline=None)
        def test_externals_returned_in_scan_order(self, names):
            exts = [ExternalTable(n, None) for n in names]
            sql = " ".join(f"IN @{n}" for n in names)
            out, got = bind_params(sql, named={n: e for n, e in zip(names, exts)})
            assert got == exts
            assert out == " ".join(f"IN {n}" for n in names)


class TestExternalTable:
    def test_substitutes_name_and_returns_table(self):
        ext = ExternalTable("allowed", None)
        out, tables = bind_params(
            "SELECT x FROM t WHERE x IN @allowed", named={"allowed": ext}
        )
        assert out == "SELECT x FROM t WHERE x IN allowed"
        assert tables == [ext]

    def test_positional_external(self):
        ext = ExternalTable("ext1", None)
        out, tables = bind_params("WHERE x IN ?", (ext,))
        assert out == "WHERE x IN ext1"
        assert tables == [ext]
