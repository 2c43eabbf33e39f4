"""Differential fuzz for the CH SQL front end: seeded-random queries in
the ANSI-common subset (both engines accept the SAME text) run through
``run_ch_query`` AND DuckDB over the events table; results must match
exactly (order-insensitive).

The generator stays inside constructs with identical cross-engine
semantics: count/sum/min/max over INTEGER columns (no float summation
order), integer arithmetic and modulo, comparisons, AND/OR, GROUP BY,
HAVING on aggregates — so any mismatch is a front-end compilation bug,
never a numeric-tolerance artifact.
"""

from __future__ import annotations

import random

import pytest

from conftest import SF_ORACLE

import os

# fixed default seed base keeps CI reproducible; set
# SPARK_GRAFT_FUZZ_SEED to explore a different region of the grammar
_SEED_BASE = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "13"))
N_CASES = 90
_INT_COLS = ("event_id", "user_id")
_STR_VALS = ("click", "view", "purchase", "error")


def _key(rng: random.Random) -> str:
    return rng.choice(
        [
            "event_type",
            f"user_id % {rng.randint(2, 7)}",
            f"(event_id * {rng.randint(2, 5)} + user_id) % {rng.randint(3, 9)}",
            (
                f"CASE WHEN user_id % {rng.randint(2, 4)} = 0 "
                f"THEN 'a' ELSE 'b' END"
            ),
        ]
    )


def _where(rng: random.Random) -> str:
    preds = []
    for _ in range(rng.randint(0, 2)):
        col = rng.choice(_INT_COLS)
        kind = rng.random()
        if kind < 0.2:
            lo = rng.randint(0, 40000)
            preds.append(f"{col} BETWEEN {lo} AND {lo + rng.randint(1, 20000)}")
        elif kind < 0.3:
            # ILIKE is native in both engines (round-6b)
            preds.append(
                f"event_type "
                f"{rng.choice(['LIKE', 'NOT LIKE', 'ILIKE', 'NOT ILIKE'])} "
                f"'{rng.choice(['c%', '%ck', '%e%', '_iew', 'C%', '%ICK'])}'"
            )
        elif kind < 0.4:
            preds.append(
                f"event_type IS {rng.choice(['NOT NULL', 'NULL'])}"
            )
        else:
            op = rng.choice([">", "<", ">=", "<=", "!="])
            preds.append(f"{col} {op} {rng.randint(0, 50000)}")
    if rng.random() < 0.4:
        vals = rng.sample(_STR_VALS, rng.randint(1, 3))
        neg = "NOT " if rng.random() < 0.3 else ""
        preds.append(
            f"event_type {neg}IN ({', '.join(repr(v) for v in vals)})"
        )
    elif rng.random() < 0.25:
        # tuple/row-value IN over literal pairs — both engines parse
        # the same text (the SUBQUERY-set form is CH-only spelling:
        # DuckDB wants a single struct column there, covered by the
        # paired-text track below)
        m = rng.randint(2, 4)
        pairs = ", ".join(
            f"({rng.randint(0, m - 1)}, '{rng.choice(_STR_VALS)}')"
            for _ in range(rng.randint(1, 3))
        )
        preds.append(f"(user_id % {m}, event_type) IN ({pairs})")
    elif rng.random() < 0.5:
        preds.append(f"event_type = '{rng.choice(_STR_VALS)}'")
    if not preds:
        return ""
    glue = " AND " if rng.random() < 0.7 else " OR "
    return " WHERE " + glue.join(preds)


def _gen_positional_query(rng: random.Random) -> str:
    # positional GROUP BY / ORDER BY — identical text in both engines
    k = _key(rng)
    return (
        f"SELECT {k} AS k, count(*) AS n, max(event_id) AS m "
        f"FROM events{_where(rng)} GROUP BY 1 "
        f"ORDER BY 2 DESC, 3, 1 LIMIT {rng.randint(2, 6)}"
    )


def _gen_agg_query(rng: random.Random) -> str:
    key = rng.choice([_key(rng), None])
    aggs = ["count(*) AS n"]
    for i in range(rng.randint(1, 3)):
        fn = rng.choice(["sum", "min", "max"])
        col = rng.choice(_INT_COLS)
        # ANSI DISTINCT-qualified aggregates — same text both engines
        if rng.random() < 0.25:
            aggs.append(
                f"{rng.choice(['count', 'sum'])}"
                f"(DISTINCT {col} % {rng.randint(3, 50)}) AS a{i}"
            )
        else:
            aggs.append(f"{fn}({col}) AS a{i}")
    sel = ", ".join(([key + " AS k"] if key else []) + aggs)
    group = f" GROUP BY {key}" if key else ""
    having = ""
    if key and rng.random() < 0.4:
        having = f" HAVING count(*) > {rng.randint(0, 100)}"
    return f"SELECT {sel} FROM events{_where(rng)}{group}{having}"


def _gen_distinct_query(rng: random.Random) -> str:
    k1, k2 = _key(rng), _key(rng)
    return (
        f"SELECT DISTINCT {k1} AS k1, {k2} AS k2 FROM events{_where(rng)}"
    )


def _gen_order_limit_query(rng: random.Random) -> str:
    # deterministic: ORDER BY every output column
    k = _key(rng)
    return (
        f"SELECT {k} AS k, count(*) AS n, max(event_id) AS m "
        f"FROM events{_where(rng)} GROUP BY {k} "
        f"ORDER BY n DESC, m, k LIMIT {rng.randint(1, 5)}"
    )


def _gen_setop_query(rng: random.Random) -> str:
    # explicit ALL/DISTINCT so DuckDB and CH semantics coincide; no
    # ORDER BY (DuckDB scopes a trailing ORDER BY to the whole union,
    # CH to the last branch — deliberately out of the common subset)
    op = rng.choice(["UNION ALL", "UNION DISTINCT", "INTERSECT DISTINCT",
                     "EXCEPT DISTINCT"])
    a = f"SELECT DISTINCT event_type AS t FROM events{_where(rng)}"
    b = f"SELECT DISTINCT event_type AS t FROM events{_where(rng)}"
    if rng.random() < 0.35:
        # nested form: the chain lives inside a derived table
        return (
            f"SELECT t, count(*) AS n FROM ({a} {op} {b}) "
            "GROUP BY t"
        )
    return f"{a} {op} {b}"


def _gen_frame_query(rng: random.Random) -> str:
    # explicit ROWS frames over a fully-deterministic order (event_id
    # is unique) — sums of INTEGER columns so no float-order effects
    lo, hi = rng.choice([
        ("2 PRECEDING", "CURRENT ROW"),
        ("1 PRECEDING", "1 FOLLOWING"),
        ("UNBOUNDED PRECEDING", "CURRENT ROW"),
        ("CURRENT ROW", "UNBOUNDED FOLLOWING"),
        ("3 PRECEDING", "1 PRECEDING"),
    ])
    return (
        "SELECT event_id, sum(user_id) OVER ("
        "PARTITION BY event_type ORDER BY event_id "
        f"ROWS BETWEEN {lo} AND {hi}) AS s "
        f"FROM events{_where(rng)}"
    )


def _gen_window_query(rng: random.Random) -> str:
    # per-key top-n via row_number in a derived table — deterministic
    # ordering (value ties broken by event_id); CAST matches DuckDB's
    # BIGINT row_number vs Spark's INT
    n = rng.randint(1, 3)
    return (
        "SELECT event_type, event_id, CAST(rn AS BIGINT) AS rn FROM ("
        "SELECT event_type, event_id, row_number() OVER ("
        "PARTITION BY event_type ORDER BY value DESC, event_id) AS rn "
        f"FROM events{_where(rng)}) WHERE rn <= {n}"
    )


def _gen_rollup_query(rng: random.Random) -> str:
    # ANSI GROUP BY ROLLUP/CUBE (...) — the shared spelling both
    # engines parse (CH also accepts its postfix WITH ROLLUP form,
    # covered by the oracle-paired queries)
    mod = rng.choice(["ROLLUP", "CUBE"])
    k2 = f"user_id % {rng.randint(2, 4)}"
    # grouping()/grouping_id() share their spelling with DuckDB
    ind = rng.choice([
        "",
        ", grouping(event_type) AS g1",
        f", grouping(event_type) AS g1, grouping({k2}) AS g2",
        f", grouping_id(event_type, {k2}) AS gid",
    ])
    return (
        f"SELECT event_type AS k1, {k2} AS k2, count(*) AS n, "
        f"sum(event_id) AS s{ind} FROM events{_where(rng)} "
        f"GROUP BY {mod} (event_type, {k2})"
    )


def _gen_grouping_sets_query(rng: random.Random) -> str:
    # explicit GROUPING SETS incl. bare-expr sets and the () total;
    # identical text in both engines
    k2 = f"user_id % {rng.randint(2, 4)}"
    if rng.random() < 0.6:
        sets = rng.choice([
            f"((event_type, {k2}), (event_type), ())",
            f"(event_type, ({k2}))",
            f"((event_type, {k2}), ())",
        ])
        sel = f"event_type AS k1, {k2} AS k2, count(*) AS n"
    else:
        # select list restricted to the set union (both engines reject
        # non-grouped bare columns)
        sets = rng.choice(["((event_type), ())", "(event_type)"])
        sel = "event_type AS k1, count(*) AS n"
    return (
        f"SELECT {sel} FROM events{_where(rng)} "
        f"GROUP BY GROUPING SETS {sets}"
    )


def _gen_using_query(rng: random.Random) -> str:
    # JOIN ... USING over derived tables sharing the key name; the
    # deduped key is selected bare (identical output shape in both)
    m = rng.randint(3, 6)
    how = rng.choice(["JOIN", "LEFT JOIN"])
    return (
        f"SELECT k, an, bm FROM "
        f"(SELECT user_id % {m} AS k, count(*) AS an FROM events"
        f"{_where(rng)} GROUP BY user_id % {m}) a "
        f"{how} (SELECT user_id % {m} AS k, max(event_id) AS bm "
        f"FROM events WHERE event_type = '{rng.choice(_STR_VALS)}' "
        f"GROUP BY user_id % {m}) b USING (k)"
    )


def _gen_asof_query(rng: random.Random) -> str:
    # ASOF JOIN — DuckDB executes the same text natively. The right
    # side is pre-deduped to one row per (user_id, ts) so the asof
    # winner is deterministic in both engines; all four inequality
    # directions are in DuckDB's accepted set.
    op = rng.choice([">=", ">", "<=", "<"])
    k = rng.randint(2, 5)
    how = rng.choice(["ASOF JOIN", "ASOF LEFT JOIN"])
    return (
        f"SELECT p.event_id AS pid, c.rid AS rid FROM "
        f"(SELECT event_id, ts, user_id FROM events "
        f"WHERE event_type = 'purchase' AND event_id % {k} = 0) p "
        f"{how} (SELECT user_id, ts, max(event_id) AS rid FROM events "
        f"WHERE event_type = 'click' GROUP BY user_id, ts) c "
        f"ON p.user_id = c.user_id AND p.ts {op} c.ts"
    )


def _gen_group_all_query(rng: random.Random) -> str:
    # GROUP BY ALL / ORDER BY ALL — both engines accept the same text
    k1, k2 = _key(rng), f"user_id % {rng.randint(2, 5)}"
    return (
        f"SELECT {k1} AS k1, {k2} AS k2, count(*) AS n, "
        f"sum(event_id) AS s FROM events{_where(rng)} "
        "GROUP BY ALL ORDER BY ALL"
    )


def _gen_qualify_query(rng: random.Random) -> str:
    # QUALIFY — subquery-free window filtering; identical text in both
    # engines (deterministic tie-broken order). row_number is INT in
    # Spark vs BIGINT in DuckDB, so it is only FILTERED on, never
    # selected.
    k = rng.choice(["event_type", f"user_id % {rng.randint(2, 5)}"])
    n = rng.randint(1, 3)
    if rng.random() < 0.5:
        return (
            f"SELECT {k} AS k, count(*) AS n, max(event_id) AS m "
            f"FROM events{_where(rng)} GROUP BY {k} "
            f"QUALIFY row_number() OVER (ORDER BY n DESC, m, k) <= {n}"
        )
    return (
        f"SELECT event_id, event_type, user_id FROM events{_where(rng)} "
        "QUALIFY row_number() OVER (PARTITION BY event_type "
        f"ORDER BY event_id) <= {n}"
    )


def _gen_correlated_query(rng: random.Random) -> str:
    # correlated EXISTS / [NOT] IN at WHERE-conjunct level — ANSI text
    # both engines accept; DuckDB decorrelates natively, this engine
    # rewrites to semi/anti joins (round 4). Bare-name correlation
    # (o_orderkey inside the lineitem subquery) and alias-qualified
    # correlation both generated.
    kind = rng.random()
    if kind < 0.35:
        neg = "NOT " if rng.random() < 0.4 else ""
        qty = rng.randint(10, 45)
        return (
            "SELECT o_orderpriority AS k, count(*) AS n FROM orders "
            f"WHERE {neg}EXISTS (SELECT * FROM lineitem "
            f"WHERE l_orderkey = o_orderkey AND l_quantity > {qty}) "
            "GROUP BY o_orderpriority"
        )
    if kind < 0.7:
        neg = "NOT " if rng.random() < 0.4 else ""
        price = rng.randint(50, 350) * 1000
        return (
            "SELECT c.c_mktsegment AS k, count(*) AS n FROM customer c "
            f"WHERE c.c_custkey {neg}IN (SELECT o_custkey FROM orders o "
            "WHERE o.o_custkey = c.c_custkey "
            f"AND o.o_totalprice > {price}) GROUP BY c.c_mktsegment"
        )
    if kind < 0.8:
        # SELECT-list correlated scalar: per-row decorrelated count/
        # min/max over the correlated orders slice (integers only)
        agg = rng.choice(
            ["count(*)", "min(o.o_orderkey)", "max(o.o_orderkey)"]
        )
        price = rng.randint(50, 300) * 1000
        return (
            "SELECT c.c_custkey AS k, "
            f"(SELECT {agg} FROM orders o WHERE o.o_custkey = "
            f"c.c_custkey AND o.o_totalprice < {price}) AS v "
            "FROM customer c"
        )
    if kind < 0.9:
        # self-correlation with qualified refs on both sides
        t1, t2 = rng.sample(list(_STR_VALS), 2)
        return (
            "SELECT e.event_type AS k, count(*) AS n FROM events e "
            f"WHERE e.event_type = '{t1}' AND EXISTS ("
            "SELECT * FROM events x WHERE x.user_id = e.user_id "
            f"AND x.event_type = '{t2}') GROUP BY e.event_type"
        )
    # correlated SCALAR subquery (q17 family): grouped-derived-table
    # decorrelation; order-independent aggregates only (min/max/count)
    # so no float-summation-order effects
    op = rng.choice(["<", ">", "<=", ">="])
    agg = rng.choice(
        ["max(o.o_totalprice)", "min(o.o_totalprice)", "count(*) * 50000"]
    )
    return (
        "SELECT c.c_mktsegment AS k, count(*) AS n FROM customer c "
        f"WHERE c.c_acctbal {op} ("
        f"SELECT {agg} FROM orders o "
        "WHERE o.o_custkey = c.c_custkey) GROUP BY c.c_mktsegment"
    )


def _gen_named_window_query(rng: random.Random) -> str:
    # ANSI named WINDOW clause — shared text (DuckDB supports it too);
    # two references to one definition, resolved in select + ORDER BY
    m = rng.randint(2, 6)
    return (
        f"SELECT user_id % {m} AS k, event_id, "
        "sum(event_id) OVER w AS s, row_number() OVER w AS rn "
        f"FROM events{_where(rng)} "
        f"WINDOW w AS (PARTITION BY user_id % {m} ORDER BY event_id) "
        f"ORDER BY k, event_id LIMIT {rng.randint(5, 40)}"
    )


def _gen_recursive_cte_query(rng: random.Random) -> str:
    # WITH RECURSIVE — shared text (both engines iterate to fixpoint).
    # Integer-only arithmetic; sequence bounded well under any depth cap.
    start = rng.randint(0, 2)
    step = rng.randint(1, 3)
    lim = rng.randint(5, 30)
    cols = "(n)" if rng.random() < 0.5 else ""
    seq = (
        f"WITH RECURSIVE seq {cols} AS (SELECT {start} AS n UNION ALL "
        f"SELECT n + {step} FROM seq WHERE n < {lim}) "
    )
    if rng.random() < 0.5:
        return (
            seq + "SELECT count(*) AS c, min(n) AS lo, max(n) AS hi, "
            "sum(n) AS s FROM seq"
        )
    m = rng.randint(3, 8)
    return (
        seq + f"SELECT n, count(*) AS cnt FROM events JOIN seq "
        f"ON user_id % {m} = n{_where(rng)} "
        "GROUP BY n ORDER BY n"
    )


def _gen_interval_query(rng: random.Random) -> str:
    # DATE '...' +/- INTERVAL n UNIT in WHERE — shared text (DuckDB
    # accepts the unquoted-quantity spelling); date comparisons only,
    # so engine differences in date-vs-timestamp promotion never play
    unit = rng.choice(["DAY", "MONTH", "YEAR"])
    n = {"DAY": rng.randint(1, 400), "MONTH": rng.randint(1, 24),
         "YEAR": rng.randint(1, 3)}[unit]
    op = rng.choice(["+", "-"])
    base = rng.choice(["1994-06-01", "1995-01-01", "1996-03-15"])
    cmp_op = rng.choice(["<", ">=", "<=", ">"])
    return (
        "SELECT o_orderpriority AS k, count(*) AS n FROM orders "
        f"WHERE o_orderdate {cmp_op} DATE '{base}' {op} INTERVAL {n} {unit} "
        "GROUP BY o_orderpriority ORDER BY k"
    )


def _gen_distinct_on_query(rng: random.Random) -> str:
    # DISTINCT ON (key) — shared text; both engines take the first
    # row per key in ORDER BY order (o_orderkey is unique, so the
    # result is fully deterministic)
    desc = rng.choice(["", " DESC"])
    return (
        "SELECT DISTINCT ON (o_orderpriority) o_orderpriority AS k, "
        "o_orderkey AS v FROM orders "
        f"ORDER BY o_orderpriority, o_orderkey{desc}"
    )


def _gen_nested_with_query(rng: random.Random) -> str:
    # WITH inside a derived table — shared text (both engines scope
    # the CTE to the subquery)
    m = rng.randint(2, 6)
    w = _where(rng)
    return (
        f"SELECT k, n FROM (WITH b AS (SELECT user_id % {m} AS k, "
        f"event_id FROM events{w}) "
        "SELECT k, count(*) AS n FROM b GROUP BY k) ORDER BY k"
    )


def _gen_string_ansi_query(rng: random.Random) -> str:
    # ANSI spellings that share keywords with CH builtins: substring
    # FROM/FOR, position(x IN y), TRIM(spec 'chars' FROM x),
    # EXTRACT(unit FROM ts) — identical text accepted by both engines
    p, n = rng.randint(1, 3), rng.randint(1, 4)
    spec = rng.choice(["BOTH", "LEADING", "TRAILING"])
    ch = rng.choice(["c", "e", "r"])
    unit = rng.choice(["year", "month", "day", "hour", "minute"])
    expr = rng.choice(
        [
            f"substring(event_type FROM {p} FOR {n})",
            f"substring(event_type, {p})",
            f"position('{ch}' IN event_type)",
            f"trim({spec} '{ch}' FROM event_type)",
            f"EXTRACT({unit} FROM ts)",
        ]
    )
    return (
        f"SELECT {expr} AS k, count(*) AS n, min(event_id) AS mn "
        f"FROM events{_where(rng)} GROUP BY k ORDER BY k"
    )


def _gen_array_literal_query(rng: random.Random) -> str:
    # [e1, e2, ...][i] — identical literal syntax and 1-based
    # indexing in CH and DuckDB; indices stay in range (out-of-range
    # is NULL in both, but keep the shared track unambiguous)
    n = rng.randint(2, 4)
    elems = ", ".join(
        f"{rng.choice(_INT_COLS)} % {rng.randint(2, 9)}" for _ in range(n)
    )
    idx = rng.randint(1, n)
    return (
        f"SELECT [{elems}][{idx}] AS k, count(*) AS n, "
        f"min(event_id) AS mn, max(user_id) AS mx "
        f"FROM events{_where(rng)} GROUP BY k ORDER BY k"
    )


def _gen_intmath_query(rng: random.Random) -> str:
    # gcd/lcm spell identically in CH and DuckDB (round-6b); integer-
    # exact so the shared track compares raw strings
    g = rng.randint(2, 30)
    fn = rng.choice(["gcd", "lcm"])
    return (
        f"SELECT user_id % {rng.randint(2, 5)} AS k, "
        f"sum({fn}(event_id % 1000, {g})) AS s, "
        f"max({fn}(user_id % 360, {g})) AS mx, count(*) AS n "
        f"FROM events{_where(rng)} GROUP BY k ORDER BY k"
    )


def _gen_values_query(rng: random.Random) -> str:
    # (VALUES ...) inline tables spell identically in both engines
    # when the alias column list is explicit; integer literals only
    # (literal arithmetic coerces differently)
    n = rng.randint(2, 4)
    rows = ", ".join(
        f"({rng.randint(0, 5)}, '{rng.choice(_STR_VALS)}')"
        for _ in range(n)
    )
    w = _where(rng)
    return (
        f"SELECT v.s AS s, count(*) AS n, sum(user_id % 7) AS u "
        f"FROM events JOIN (VALUES {rows}) AS v(m, s) "
        f"ON events.user_id % 6 = v.m{w} "
        f"GROUP BY v.s ORDER BY s"
    )


def _gen_query(rng: random.Random) -> str:
    return rng.choice(
        [_gen_agg_query, _gen_agg_query, _gen_distinct_query,
         _gen_order_limit_query, _gen_setop_query, _gen_window_query,
         _gen_rollup_query, _gen_using_query, _gen_asof_query,
         _gen_grouping_sets_query, _gen_frame_query,
         _gen_group_all_query, _gen_correlated_query,
         _gen_qualify_query, _gen_positional_query,
         _gen_named_window_query, _gen_recursive_cte_query,
         _gen_nested_with_query, _gen_interval_query,
         _gen_distinct_on_query, _gen_string_ansi_query,
         _gen_array_literal_query, _gen_intmath_query,
         _gen_values_query]
    )(rng)


CASES = [
    _gen_query(random.Random(97 * i + _SEED_BASE)) for i in range(N_CASES)
]


@pytest.mark.parametrize("sql", CASES)
def test_random_query_matches_duckdb(spark, duck, sql):
    from baseline_magician_spark.catalog import load_table
    from baseline_magician_spark.plans.ch_sql import run_ch_query

    tabs = {
        n: load_table(spark, SF_ORACLE, n)
        for n in ("events", "orders", "lineitem", "customer")
    }
    sdf = run_ch_query(sql, tabs)
    s_cols = sdf.columns
    s_rows = sorted(
        tuple(str(x) for x in r)
        for r in sdf.select(*sorted(s_cols)).collect()
    )
    res = duck.execute(sql)
    d_cols = [d[0] for d in res.description]
    idx = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    d_rows = sorted(
        tuple(str(r[i]) for i in idx) for r in res.fetchall()
    )
    assert sorted(s_cols) == sorted(d_cols), sql
    assert s_rows == d_rows, f"{sql}\nspark={s_rows[:3]}\nduck={d_rows[:3]}"


# ------------------------------------------------------------------ #
# paired-text differential: CH-only spellings vs their DuckDB        #
# equivalents (round-3 grammar: scalar WITH, * EXCEPT/REPLACE/APPLY, #
# arr[i] indexing, WITH FILL / INTERPOLATE). The generator returns   #
# (ch_sql, duck_sql) pairs with identical semantics; any mismatch is #
# a front-end compilation bug.                                       #
# ------------------------------------------------------------------ #


def _gen_scalar_with_pair(rng: random.Random) -> tuple[str, str]:
    m = rng.randint(2, 7)
    body = (
        "SELECT user_id % {m} AS k, count(*) AS n, sum(event_id) AS s "
        "FROM events{w} GROUP BY user_id % {m} ORDER BY k"
    )
    w = _where(rng)
    return (
        f"WITH {m} AS md " + body.format(m="md", w=w),
        body.format(m=m, w=w),
    )


def _gen_star_except_pair(rng: random.Random) -> tuple[str, str]:
    # ts excluded on both sides (timestamp str formatting differs)
    drop = rng.choice(["props, ts", "ts, props, value", "ts, props, user_id"])
    w = _where(rng)
    return (
        f"SELECT * EXCEPT ({drop}) FROM events{w}",
        f"SELECT * EXCLUDE ({drop}) FROM events{w}",
    )


def _gen_star_replace_pair(rng: random.Random) -> tuple[str, str]:
    # DuckDB shares the * REPLACE spelling; combine with the EXCEPT/
    # EXCLUDE divergence so both modifiers chain
    mul = rng.randint(2, 5)
    w = _where(rng)
    return (
        f"SELECT * EXCEPT (ts, props, value) "
        f"REPLACE (user_id * {mul} AS user_id) FROM events{w}",
        f"SELECT * EXCLUDE (ts, props, value) "
        f"REPLACE (user_id * {mul} AS user_id) FROM events{w}",
    )


def _gen_star_apply_pair(rng: random.Random) -> tuple[str, str]:
    # * APPLY is CH-only — the DuckDB side spells the projection out,
    # aliased to the engine's derived names (fn_col)
    w = _where(rng)
    return (
        f"SELECT * EXCEPT (ts, props, event_type, value) "
        f"APPLY (toInt64) FROM events{w}",
        f"SELECT CAST(event_id AS BIGINT) AS toInt64_event_id, "
        f"CAST(user_id AS BIGINT) AS toInt64_user_id FROM events{w}",
    )


def _gen_array_index_pair(rng: random.Random) -> tuple[str, str]:
    # arr[i] — 1-based in both engines; CH splitByChar vs DuckDB
    # string_split over the same separator
    sep = rng.choice(["e", "c", "r", "i"])
    i = rng.randint(1, 2)
    w = _where(rng)
    return (
        f"SELECT event_id, splitByChar('{sep}', event_type)[{i}] AS p "
        f"FROM events{w}",
        f"SELECT event_id, string_split(event_type, '{sep}')[{i}] AS p "
        f"FROM events{w}",
    )


def _gen_with_fill_pair(rng: random.Random) -> tuple[str, str]:
    m = rng.randint(3, 6)
    hi = m + rng.randint(1, 3)  # TO is exclusive; spine 0..hi-1 ⊇ data
    w = _where(rng)
    interp = rng.random() < 0.5
    ch = (
        f"SELECT user_id % {m} AS k, count(*) AS n FROM events{w} "
        f"GROUP BY user_id % {m} ORDER BY k WITH FILL FROM 0 TO {hi}"
    )
    if interp:
        ch += " INTERPOLATE (n AS 0)"
        n_expr = "COALESCE(d.n, 0)"
    else:
        n_expr = "d.n"
    duck = (
        f"WITH d AS (SELECT user_id % {m} AS k, count(*) AS n "
        f"FROM events{w} GROUP BY user_id % {m}) "
        f"SELECT COALESCE(d.k, g.v) AS k, {n_expr} AS n FROM d "
        f"FULL JOIN generate_series(0, {hi - 1}) AS g(v) ON d.k = g.v "
        "ORDER BY k"
    )
    return ch, duck


def _gen_limit_ties_pair(rng: random.Random) -> tuple[str, str]:
    # LIMIT n WITH TIES is CH/ANSI-only — the DuckDB side spells the
    # rank() threshold out. Final output re-sorted client-side by the
    # harness, so branch ordering differences are moot.
    m = rng.randint(1, 3)
    k = rng.choice(["event_type", f"user_id % {rng.randint(2, 5)}"])
    w = _where(rng)
    return (
        f"SELECT {k} AS k, count(*) AS n FROM events{w} "
        f"GROUP BY {k} ORDER BY n DESC LIMIT {m} WITH TIES",
        f"SELECT k, n FROM (SELECT {k} AS k, count(*) AS n, "
        "rank() OVER (ORDER BY count(*) DESC) AS _r "
        f"FROM events{w} GROUP BY {k}) WHERE _r <= {m}",
    )


def _gen_tuple_in_subquery_pair(rng: random.Random) -> tuple[str, str]:
    # CH: (a, b) IN (SELECT x, y ...) — multi-column row set;
    # DuckDB wants the subquery to produce ONE struct column
    m = rng.randint(2, 4)
    neg = "NOT " if rng.random() < 0.4 else ""
    lim = rng.randint(100, 2000)
    w = _where(rng)
    return (
        f"SELECT user_id % 3 AS k, count(*) AS n FROM events{w} "
        f"{'AND' if w else 'WHERE'} (user_id % {m}, event_type) {neg}IN "
        f"(SELECT DISTINCT user_id % {m}, event_type FROM events "
        f"WHERE event_id < {lim}) GROUP BY user_id % 3 ORDER BY k",
        f"SELECT user_id % 3 AS k, count(*) AS n FROM events{w} "
        f"{'AND' if w else 'WHERE'} (user_id % {m}, event_type) {neg}IN "
        f"(SELECT DISTINCT (user_id % {m}, event_type) FROM events "
        f"WHERE event_id < {lim}) GROUP BY user_id % 3 ORDER BY k",
    )


def _gen_combinator_pair(rng: random.Random) -> tuple[str, str]:
    # round-6 suffix-combinator grammar: -If / -OrNull / -Array /
    # -ForEach on arbitrary bases vs the ANSI CASE/FILTER spellings.
    # Integer-valued quantities only (exact cross-engine sums).
    m = rng.randint(2, 7)
    et = rng.choice(_STR_VALS)
    w = _where(rng)
    form = rng.randrange(5)
    if form == 0:
        base = rng.choice(["sum", "min", "max"])
        ch = (
            f"SELECT user_id % {m} AS k, "
            f"{base}If(event_id % 97, event_type = '{et}') AS v, "
            f"countIf(event_type != '{et}') AS n "
            f"FROM events{w} GROUP BY k ORDER BY k"
        )
        duck = (
            f"SELECT user_id % {m} AS k, "
            f"{base}(CASE WHEN event_type = '{et}' "
            f"THEN event_id % 97 END) AS v, "
            f"count(*) FILTER (WHERE event_type != '{et}') AS n "
            f"FROM events{w} GROUP BY k ORDER BY k"
        )
    elif form == 1:
        # OrNull over a possibly-empty filtered group
        lim = rng.randint(0, 200)
        ch = (
            f"SELECT user_id % {m} AS k, sumOrNull(event_id) AS s, "
            f"countOrNull(event_id) AS c FROM events "
            f"WHERE event_id < {lim} GROUP BY k ORDER BY k"
        )
        duck = (
            f"SELECT user_id % {m} AS k, "
            f"CASE WHEN count(event_id) > 0 THEN sum(event_id) END AS s, "
            f"CASE WHEN count(event_id) > 0 THEN count(event_id) END AS c "
            f"FROM events WHERE event_id < {lim} GROUP BY k ORDER BY k"
        )
    elif form == 2:
        # Array variants over a 2-element constructed array
        a = f"event_id % {rng.randint(3, 9)}"
        b = f"user_id % {rng.randint(2, 5)}"
        ch = (
            f"SELECT sumArray([{a}, {b}]) AS s, "
            f"countArray([{a}, {b}]) AS c, "
            f"minArray([{a}, {b}]) AS mn, maxArray([{a}, {b}]) AS mx "
            f"FROM events{w}"
        )
        duck = (
            f"SELECT sum(({a}) + ({b})) AS s, 2 * count(*) AS c, "
            f"min(least({a}, {b})) AS mn, max(greatest({a}, {b})) AS mx "
            f"FROM events{w}"
        )
    else:
        # sumForEach: element-wise positions of a fixed-width array
        a = f"event_id % {rng.randint(3, 9)}"
        b = f"user_id % {rng.randint(2, 5)}"
        ch = (
            f"SELECT sumForEach([{a}, {b}]) AS se, "
            f"arrayReduce('sum', [min({a}), max({b})]) AS rr "
            f"FROM events{w}"
        )
        duck = (
            # ForEach over zero rows is the EMPTY array (CH's result
            # for an empty element set — pinned by the all-empty
            # regression in test_ch_combinators)
            f"SELECT CASE WHEN count(*) > 0 "
            f"THEN [sum({a}), sum({b})] "
            f"ELSE CAST([] AS BIGINT[]) END AS se, "
            f"min({a}) + max({b}) AS rr FROM events{w}"
        )
    if form == 4:
        # round-7e: -If over two-argument NULL-skipping bases
        p1, p2 = rng.randint(5, 13), rng.randint(3, 7)
        ch = (
            f"SELECT user_id % {m} AS k, "
            f"round(corrIf(toFloat64(event_id % {p1}), "
            f"toFloat64(user_id % {p2}), event_type = '{et}'), 6)"
            f" AS c, "
            f"round(avgWeightedIf(toFloat64(event_id % 9), "
            f"toFloat64(1 + user_id % 4), event_type != '{et}'), 6)"
            f" AS aw, "
            f"sumKahanIf(toFloat64(event_id % 5), event_type = '{et}')"
            f" AS sk "
            f"FROM events{w} GROUP BY k ORDER BY k"
        )
        duck = (
            f"SELECT user_id % {m} AS k, "
            f"round(corr(CAST(event_id % {p1} AS DOUBLE), "
            f"CAST(user_id % {p2} AS DOUBLE)) "
            f"FILTER (event_type = '{et}'), 6) AS c, "
            f"round(sum(CASE WHEN event_type != '{et}' THEN "
            f"(event_id % 9) * (1 + user_id % 4) END) "
            f"/ sum(CASE WHEN event_type != '{et}' THEN "
            f"1.0 * (1 + user_id % 4) END), 6) AS aw, "
            f"sum(CAST(event_id % 5 AS DOUBLE)) "
            f"FILTER (event_type = '{et}') AS sk "
            f"FROM events{w} GROUP BY k ORDER BY k"
        )
    return ch, duck


def _gen_map_pair(rng: random.Random) -> tuple[str, str]:
    # Map(K, V) family: literal maps, subscript lookups, mapContains —
    # vs the scalar CASE spellings (DuckDB 1.0 MAP subscript returns a
    # LIST, so its side avoids the map detour entirely)
    m = rng.randint(2, 7)
    et = rng.choice(_STR_VALS)
    w = _where(rng)
    if rng.random() < 0.5:
        ch = (
            f"SELECT map('a', user_id % {m}, 'b', 0)['a'] AS k, "
            f"count(*) AS n FROM events{w} GROUP BY k ORDER BY k"
        )
        duck = (
            f"SELECT user_id % {m} AS k, count(*) AS n "
            f"FROM events{w} GROUP BY k ORDER BY k"
        )
    else:
        ch = (
            f"SELECT mapElement(mapFromArrays([event_type], "
            f"[user_id % {m}]), '{et}') AS k, "
            f"countIf(mapContains(map('{et}', 1), event_type)) AS n "
            f"FROM events{w} GROUP BY k ORDER BY k"
        )
        duck = (
            f"SELECT CASE WHEN event_type = '{et}' "
            f"THEN user_id % {m} END AS k, "
            f"count(*) FILTER (WHERE event_type = '{et}') AS n "
            f"FROM events{w} GROUP BY k ORDER BY k"
        )
    return ch, duck


def _gen_retention_pair(rng: random.Random) -> tuple[str, str]:
    # retention(cond1, cond2): r[i] = cond1-and-condi seen for the
    # user; the DuckDB side replays per-user bool maxes
    t1, t2 = rng.sample(_STR_VALS, 2)
    ch = (
        f"SELECT sum(r[1]) AS a, sum(r[2]) AS b "
        f"FROM (SELECT user_id, retention(event_type = '{t1}', "
        f"event_type = '{t2}') AS r FROM events GROUP BY user_id)"
    )
    duck = (
        f"SELECT sum(s)::BIGINT AS a, "
        f"sum(CASE WHEN s = 1 AND c = 1 THEN 1 ELSE 0 END)::BIGINT AS b "
        f"FROM (SELECT user_id, "
        f"max(CASE WHEN event_type = '{t1}' THEN 1 ELSE 0 END) AS s, "
        f"max(CASE WHEN event_type = '{t2}' THEN 1 ELSE 0 END) AS c "
        f"FROM events GROUP BY user_id)"
    )
    return ch, duck


def _gen_funnel_pair(rng: random.Random) -> tuple[str, str]:
    # two-level windowFunnel with a random window; the DuckDB side is
    # the EXISTS-chain spelling of "t1 then t2 within W seconds"
    t1, t2 = rng.sample(_STR_VALS, 2)
    w_sec = rng.choice([3600, 14400, 86400])
    ch = (
        f"SELECT lvl, count(*) AS users FROM (SELECT user_id, "
        f"windowFunnel({w_sec})(ts, event_type = '{t1}', "
        f"event_type = '{t2}') AS lvl FROM events GROUP BY user_id) "
        f"GROUP BY lvl ORDER BY lvl"
    )
    duck = (
        f"WITH u AS (SELECT DISTINCT user_id FROM events), "
        f"lv AS (SELECT u.user_id, (CASE WHEN EXISTS ("
        f"SELECT 1 FROM events e1 JOIN events e2 "
        f"ON e2.user_id = e1.user_id WHERE e1.user_id = u.user_id "
        f"AND e1.event_type = '{t1}' AND e2.event_type = '{t2}' "
        f"AND e1.ts <= e2.ts "
        f"AND e2.ts <= e1.ts + INTERVAL {w_sec} SECOND) THEN 2 "
        f"WHEN EXISTS (SELECT 1 FROM events e1 "
        f"WHERE e1.user_id = u.user_id AND e1.event_type = '{t1}') "
        f"THEN 1 ELSE 0 END)::BIGINT AS lvl FROM u) "
        f"SELECT lvl, count(*) AS users FROM lv "
        f"GROUP BY lvl ORDER BY lvl"
    )
    return ch, duck


def _gen_vector_pair(rng: random.Random) -> tuple[str, str]:
    # vector-math family over integer-valued constructed arrays:
    # every arithmetic step is exact, sqrt is correctly-rounded IEEE
    # in both engines, so text-level equality holds without rounding
    a = f"event_id % {rng.randint(3, 9)}"
    b = f"user_id % {rng.randint(2, 5)}"
    c, d = rng.randint(1, 6), rng.randint(1, 6)
    w = _where(rng)
    if rng.random() < 0.5:
        ch = (
            f"SELECT dotProduct([{a}, {b}], [{c}, {d}]) AS k, "
            f"count(*) AS n FROM events{w} GROUP BY k ORDER BY k"
        )
        duck = (
            f"SELECT CAST(({a}) * {c} + ({b}) * {d} AS DOUBLE) AS k, "
            f"count(*) AS n FROM events{w} GROUP BY k ORDER BY k"
        )
    else:
        ch = (
            f"SELECT L2Distance([{a}, {b}], [{c}, {d}]) AS k, "
            f"max(L1Norm([{a}, {b}])) AS m "
            f"FROM events{w} GROUP BY k ORDER BY k"
        )
        duck = (
            f"SELECT sqrt(CAST((({a}) - {c}) * (({a}) - {c}) "
            f"+ (({b}) - {d}) * (({b}) - {d}) AS DOUBLE)) AS k, "
            f"max(CAST(abs({a}) + abs({b}) AS DOUBLE)) AS m "
            f"FROM events{w} GROUP BY k ORDER BY k"
        )
    return ch, duck


def _gen_semi_join_pair(rng: random.Random) -> tuple[str, str]:
    # explicit LEFT SEMI / LEFT ANTI JOIN (CH spelling; this DuckDB
    # lacks it — the oracle spells the same filter as [NOT] IN)
    m = rng.randint(2, 5)
    lim = rng.randint(100, 5000)
    anti = rng.random() < 0.4
    kind = "ANTI" if anti else "SEMI"
    neg = "NOT " if anti else ""
    return (
        f"SELECT user_id % {m} AS k, count(*) AS n FROM events "
        f"LEFT {kind} JOIN (SELECT DISTINCT event_type FROM events "
        f"WHERE event_id < {lim}) AS s "
        f"ON events.event_type = s.event_type "
        f"GROUP BY k ORDER BY k",
        f"SELECT user_id % {m} AS k, count(*) AS n FROM events "
        f"WHERE event_type {neg}IN (SELECT event_type FROM events "
        f"WHERE event_id < {lim}) GROUP BY k ORDER BY k",
    )


def _gen_string_search_pair(rng: random.Random) -> tuple[str, str]:
    # round-6b string search: countSubstrings vs the length-delta
    # identity, hasToken vs the boundary regex, and calendar shims
    needle = rng.choice(["ck", "ic", "vi", "e"])
    tok = rng.choice(["click", "view", "purchase", "error"])
    w = _where(rng)
    form = rng.randrange(3)
    if form == 0:
        return (
            f"SELECT sum(countSubstrings(event_type, '{needle}')) AS s, "
            f"count(*) AS n FROM events{w}",
            f"SELECT CAST(sum((length(event_type) - "
            f"length(replace(event_type, '{needle}', ''))) "
            f"/ {len(needle)}) AS BIGINT) AS s, "
            f"count(*) AS n FROM events{w}",
        )
    if form == 1:
        return (
            f"SELECT user_id % 3 AS k, "
            f"countIf(hasToken(event_type, '{tok}')) AS h "
            f"FROM events{w} GROUP BY k ORDER BY k",
            f"SELECT user_id % 3 AS k, "
            f"count(*) FILTER (WHERE regexp_matches(event_type, "
            f"'(^|[^A-Za-z0-9_]){tok}($|[^A-Za-z0-9_])')) AS h "
            f"FROM events{w} GROUP BY k ORDER BY k",
        )
    return (
        f"SELECT toMonday(toDate(ts)) AS wk, "
        f"max(toDayOfYear(toDate(ts))) AS doy, count(*) AS n "
        f"FROM events{w} GROUP BY wk ORDER BY wk",
        f"SELECT CAST(date_trunc('week', ts) AS DATE) AS wk, "
        f"max(dayofyear(ts)) AS doy, count(*) AS n "
        f"FROM events{w} GROUP BY wk ORDER BY wk",
    )


def _gen_stats_agg_pair(rng: random.Random) -> tuple[str, str]:
    # statistical/interval aggregates vs first-principles DuckDB
    # rebuilds — integer-valued inputs keep every form float-exact
    # except entropy (few-term float sum), which rounds to 6
    w = _where(rng)
    form = rng.randrange(4)
    if form == 0:
        # no WHERE: a filter that matches nothing would compare the
        # engine's empty-group 0.0 against DuckDB's NULL sum
        w = ""
        p = rng.choice([50, 97, 193])
        ch = (
            f"SELECT round(tupleElement(mannWhitneyUTest("
            f"toFloat64(event_id % {p}), user_id % 2), "
            f"'u_statistic'), 1) AS u FROM events{w}"
        )
        duck = (
            f"WITH base AS (SELECT CAST(event_id % {p} AS DOUBLE) AS v, "
            f"user_id % 2 AS idx FROM events{w}), "
            "r AS (SELECT idx, v, row_number() OVER (ORDER BY v) AS rn "
            "FROM base), "
            "a AS (SELECT idx, avg(rn) OVER (PARTITION BY v) AS ar "
            "FROM r) "
            "SELECT round(sum(ar) FILTER (WHERE idx = 0) "
            "- (SELECT count(*) FROM base WHERE idx = 0) "
            "* ((SELECT count(*) FROM base WHERE idx = 0) + 1) / 2.0, 1) "
            "AS u FROM a"
        )
        return ch, duck
    if form == 1:
        w = ""  # same empty-input guard as form 0
        m, kk = rng.randint(5, 20), rng.randint(3, 30)
        ch = (
            f"SELECT intervalLengthSum(toFloat64(user_id % {m}), "
            f"toFloat64(user_id % {m}) + event_id % {kk} + 1) AS ils, "
            f"maxIntersections(toFloat64(user_id % {m}), "
            f"toFloat64(user_id % {m}) + event_id % {kk} + 1) AS mi "
            f"FROM events{w}"
        )
        duck = (
            f"WITH iv AS (SELECT CAST(user_id % {m} AS DOUBLE) AS s, "
            f"CAST(user_id % {m} AS DOUBLE) + event_id % {kk} + 1 AS e "
            f"FROM events{w}), "
            "flag AS (SELECT s, e, CASE WHEN s > max(e) OVER "
            "(ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING) OR max(e) OVER (ORDER BY s, e ROWS BETWEEN "
            "UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL "
            "THEN 1 ELSE 0 END AS ni FROM iv), "
            "isl AS (SELECT s, e, sum(ni) OVER (ORDER BY s, e) AS g "
            "FROM flag), "
            "ev AS (SELECT s AS t, 1 AS d FROM iv "
            "UNION ALL SELECT e AS t, -1 AS d FROM iv) "
            "SELECT (SELECT sum(mx - mn) FROM (SELECT g, min(s) AS mn, "
            "max(e) AS mx FROM isl GROUP BY g)) AS ils, "
            "(SELECT CAST(max(cur) AS BIGINT) FROM (SELECT sum(d) OVER "
            "(ORDER BY t, d ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "CURRENT ROW) AS cur FROM ev)) AS mi"
        )
        return ch, duck
    if form == 2:
        p = rng.choice([20, 50, 100])
        ch = (
            f"SELECT user_id % 2 AS k, "
            f"deltaSumTimestamp(toFloat64(event_id % {p}), event_id) "
            f"AS d FROM events{w} GROUP BY k ORDER BY k"
        )
        duck = (
            f"SELECT k, sum(CASE WHEN v > pv THEN v - pv ELSE 0 END) "
            "AS d FROM (SELECT user_id % 2 AS k, "
            f"CAST(event_id % {p} AS DOUBLE) AS v, "
            f"lag(CAST(event_id % {p} AS DOUBLE)) OVER "
            "(PARTITION BY user_id % 2 ORDER BY event_id) AS pv "
            f"FROM events{w}) GROUP BY k ORDER BY k"
        )
        return ch, duck
    m = rng.randint(2, 6)
    ch = (
        f"SELECT event_type AS k, "
        f"boundingRatio(toFloat64(event_id), toFloat64(user_id % {m})) "
        f"AS br, round(entropy(user_id % {m}), 6) AS e "
        f"FROM events{w} GROUP BY k ORDER BY k"
    )
    duck = (
        f"SELECT event_type AS k, "
        f"(max(CAST(user_id % {m} AS DOUBLE)) "
        f"- min(CAST(user_id % {m} AS DOUBLE))) "
        "/ (max(CAST(event_id AS DOUBLE)) "
        "- min(CAST(event_id AS DOUBLE))) AS br, "
        f"round(entropy(user_id % {m}), 6) AS e "
        f"FROM events{w} GROUP BY k ORDER BY k"
    )
    return ch, duck


def _gen_geo_pair(rng: random.Random) -> tuple[str, str]:
    # greatCircleDistance over pseudo-coordinates derived from keys;
    # DuckDB re-spells the haversine trig (round-6c geo family)
    m = rng.randint(50, 300)
    k = rng.randint(30, 80)
    w = _where(rng)
    coords = (
        f"(event_id % {m}) - {m // 2} AS lon1, "
        f"(user_id % {k}) - {k // 2} AS lat1, "
        f"(user_id % {m}) - {m // 2} AS lon2, "
        f"(event_id % {k}) - {k // 2} AS lat2"
    )
    ch = (
        f"SELECT k, round(avg(greatCircleDistance("
        f"lon1, lat1, lon2, lat2)), 2) AS gcd "
        f"FROM (SELECT event_type AS k, {coords} FROM events{w}) "
        f"GROUP BY k ORDER BY k"
    )
    duck = (
        f"WITH c AS (SELECT event_type AS k, {coords} FROM events{w}) "
        "SELECT k, round(avg(2*asin(least(1.0, sqrt("
        "pow(sin(radians(lat2-lat1)/2), 2)"
        " + cos(radians(lat1))*cos(radians(lat2))"
        "*pow(sin(radians(lon2-lon1)/2), 2)))) * 6371000.0), 2) AS gcd "
        "FROM c GROUP BY k ORDER BY k"
    )
    return ch, duck


def _gen_strsim_pair(rng: random.Random) -> tuple[str, str]:
    # editDistance / stringJaccardIndex / byteHammingDistance vs
    # DuckDB levenshtein / jaccard / mismatches (round-6c family)
    ln = rng.randint(2, 5)
    w = _where(rng)
    a = f"substring(event_type, 1, {ln})"
    b = "reverse(event_type)"
    ch = (
        f"SELECT event_type AS k, "
        f"round(avg(editDistance({a}, {b})), 4) AS ed, "
        f"round(avg(stringJaccardIndex({a}, {b})), 6) AS jac, "
        f"round(avg(byteHammingDistance(rightPad({a}, 8, 'x'), "
        f"rightPad({b}, 8, 'x'))), 4) AS ham "
        f"FROM events{w} GROUP BY k ORDER BY k"
    )
    duck = (
        f"SELECT event_type AS k, "
        f"round(avg(levenshtein({a}, {b})), 4) AS ed, "
        f"round(avg(jaccard({a}, {b})), 6) AS jac, "
        f"round(avg(CAST(mismatches(rpad({a}, 8, 'x'), "
        f"rpad({b}, 8, 'x')) AS DOUBLE)), 4) AS ham "
        f"FROM events{w} GROUP BY k ORDER BY k"
    )
    return ch, duck


def _gen_assoc_pair(rng: random.Random) -> tuple[str, str]:
    # cramersV / contingency vs chi-squared rebuilt from cell counts
    m = rng.randint(2, 5)
    k2 = rng.randint(2, 4)
    w = _where(rng)
    ch = (
        f"SELECT round(cramersV(user_id % {m}, event_id % {k2}), 6)"
        f" AS v, "
        f"round(contingency(user_id % {m}, event_id % {k2}), 6) AS cg "
        f"FROM events{w}"
    )
    duck = (
        f"WITH cells AS (SELECT user_id % {m} AS x, "
        f"event_id % {k2} AS y, CAST(count(*) AS DOUBLE) AS c "
        f"FROM events{w} GROUP BY x, y), "
        "rows_ AS (SELECT x, sum(c) AS rc FROM cells GROUP BY x), "
        "cols_ AS (SELECT y, sum(c) AS cc FROM cells GROUP BY y), "
        "tot AS (SELECT sum(c) AS n, "
        "CAST(count(DISTINCT x) AS DOUBLE) AS r, "
        "CAST(count(DISTINCT y) AS DOUBLE) AS cd FROM cells), "
        "chi AS (SELECT sum(pow(c.c - r.rc*co.cc/t.n, 2)"
        "/(r.rc*co.cc/t.n)) AS chi2 "
        "FROM cells c JOIN rows_ r ON c.x = r.x "
        "JOIN cols_ co ON c.y = co.y CROSS JOIN tot t) "
        "SELECT round(sqrt(chi.chi2/t.n/least(t.r-1, t.cd-1)), 6)"
        " AS v, "
        "round(sqrt(chi.chi2/(chi.chi2 + t.n)), 6) AS cg "
        "FROM chi CROSS JOIN tot t"
    )
    return ch, duck


def _gen_jaro_pair(rng: random.Random) -> tuple[str, str]:
    # jaro folds are ~100 ms/row: keep the differential on a tiny
    # inline VALUES table, exactly like the dedicated oracle row
    alphabet = "abcdez"
    rows = ", ".join(
        "('{}', '{}')".format(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7))),
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7))),
        )
        for _ in range(4)
    )
    body = f"FROM (VALUES {rows}) AS v(a, b) ORDER BY a, b"
    ch = (
        "SELECT a, b, round(jaroSimilarity(a, b), 6) AS j, "
        f"round(jaroWinklerSimilarity(a, b), 6) AS jw {body}"
    )
    duck = (
        "SELECT a, b, round(jaro_similarity(a, b), 6) AS j, "
        f"round(jaro_winkler_similarity(a, b), 6) AS jw {body}"
    )
    return ch, duck


def _gen_rank_decay_pair(rng: random.Random) -> tuple[str, str]:
    # round-6f: rankCorr vs window-rank corr; exponentialTimeDecayed
    # family vs its permutation-invariant closed form. Group keys stay
    # >= 20 buckets so the O(n²) rank filters see bounded groups.
    m = rng.randint(20, 40)
    x = rng.choice(["3600.0", "43200.0", "86400.0"])
    w = _where(rng)
    ch = (
        f"SELECT user_id % {m} AS g, "
        f"round(rankCorr(value, event_id % 89), 6) AS rc, "
        f"round(exponentialTimeDecayedSum({x})("
        f"value, toUnixTimestamp(ts)), 4) AS es, "
        f"round(exponentialTimeDecayedCount({x})("
        f"value, toUnixTimestamp(ts)), 6) AS ec "
        f"FROM events{w} GROUP BY g ORDER BY g"
    )
    duck = (
        f"WITH base AS (SELECT user_id % {m} AS g, value AS v, "
        f"event_id % 89 AS k, floor(epoch(ts)) AS tt "
        f"FROM events{w}), "
        "r AS (SELECT *, "
        "RANK() OVER (PARTITION BY g ORDER BY v) "
        "+ (COUNT(*) OVER (PARTITION BY g, v) - 1) / 2.0 AS rv, "
        "RANK() OVER (PARTITION BY g ORDER BY k) "
        "+ (COUNT(*) OVER (PARTITION BY g, k) - 1) / 2.0 AS rk, "
        "MAX(tt) OVER (PARTITION BY g) AS mt FROM base) "
        f"SELECT g, round(corr(rv, rk), 6) AS rc, "
        f"round(sum(v * exp((tt - mt) / {x})), 4) AS es, "
        f"round(sum(exp((tt - mt) / {x})), 6) AS ec "
        "FROM r GROUP BY g ORDER BY g"
    )
    return ch, duck


def _gen_weighted_quantile_pair(rng: random.Random) -> tuple[str, str]:
    # round-6h: quantileExactWeighted vs a cumulative-weight window
    # replay; ANOVA F statistic vs its closed form over group sums.
    lv = rng.choice(["0.25", "0.5", "0.75", "0.9"])
    wm = rng.randint(3, 9)
    gm = rng.randint(2, 5)
    w = _where(rng)
    ch = (
        f"SELECT event_type AS et, "
        f"round(quantileExactWeighted({lv})("
        f"value, 1 + event_id % {wm}), 6) AS qw, "
        f"round(tupleElement(analysisOfVariance("
        f"value, user_id % {gm}), 'f_statistic'), 6) AS af "
        f"FROM events{w} GROUP BY et ORDER BY et"
    )
    duck = (
        f"WITH base AS (SELECT event_type AS et, value AS v, "
        f"1 + event_id % {wm} AS w, user_id % {gm} AS g, "
        f"row_number() OVER () AS rid FROM events{w}), "
        "cum AS (SELECT *, "
        "sum(w) OVER (PARTITION BY et ORDER BY v, rid) AS cw, "
        "sum(w) OVER (PARTITION BY et) AS tw FROM base), "
        "gstats AS (SELECT et, g, count(*) AS ng, sum(v) AS sg "
        "FROM base GROUP BY et, g), "
        "tstats AS (SELECT et, sum(sg * sg / ng) AS t, "
        "count(*)::DOUBLE AS k FROM gstats GROUP BY et), "
        "tot AS (SELECT et, count(*)::DOUBLE AS n, sum(v) AS s, "
        "sum(v * v) AS q FROM base GROUP BY et) "
        f"SELECT c.et, "
        f"round(min(CASE WHEN c.cw >= {lv} * c.tw THEN c.v END), 6)"
        f" AS qw, "
        "round(any_value(CASE WHEN t.k > 1 AND tot.n > t.k THEN "
        "((t.t - tot.s * tot.s / tot.n) / (t.k - 1)) "
        "/ ((tot.q - t.t) / (tot.n - t.k)) END), 6) AS af "
        "FROM cum c JOIN tstats t ON c.et = t.et "
        "JOIN tot ON tot.et = c.et "
        "GROUP BY c.et ORDER BY c.et"
    )
    return ch, duck


def _gen_resample_pair(rng: random.Random) -> tuple[str, str]:
    # -Resample combinator vs an array of conditional aggregates
    step = rng.choice([5, 10, 25])
    end = step * rng.randint(2, 4)
    w = _where(rng)
    key = f"user_id % {end + rng.randint(0, 10)}"
    buckets = list(range(0, end, step))
    duck_cells_s = ", ".join(
        f"coalesce(sum(CASE WHEN {key} >= {lo} AND {key} < {lo + step}"
        f" THEN value END), 0)" for lo in buckets
    )
    duck_cells_c = ", ".join(
        f"count(CASE WHEN {key} >= {lo} AND {key} < {lo + step}"
        f" THEN 1 END)" for lo in buckets
    )
    ch = (
        f"SELECT event_type AS et, "
        f"arrayMap(x -> round(x, 4), "
        f"sumResample(0, {end}, {step})(value, {key})) AS s, "
        f"countResample(0, {end}, {step})(value, {key}) AS c "
        f"FROM events{w} GROUP BY et ORDER BY et"
    )
    duck = (
        f"SELECT event_type AS et, "
        f"[{duck_cells_s}].list_transform(x -> round(x, 4)) AS s, "
        f"[{duck_cells_c}] AS c "
        f"FROM events{w} GROUP BY et ORDER BY et"
    )
    return ch, duck


def _gen_bitmap_pair(rng: random.Random) -> tuple[str, str]:
    # bitmap set algebra vs DuckDB list functions over the same
    # constructed per-group arrays
    m1, m2 = rng.randint(3, 8), rng.randint(3, 8)
    w = _where(rng)
    ch = (
        f"SELECT event_type AS et, "
        f"bitmapCardinality(bitmapAnd("
        f"bitmapBuild(groupArray(event_id % {m1})), "
        f"bitmapBuild(groupArray(user_id % {m2})))) AS ac, "
        f"bitmapToArray(bitmapXor("
        f"bitmapBuild(groupArray(event_id % {m1})), "
        f"bitmapBuild(groupArray(user_id % {m2})))) AS xr "
        f"FROM events{w} GROUP BY et ORDER BY et"
    )
    duck = (
        f"SELECT event_type AS et, "
        f"len(list_intersect(list_distinct(list(event_id % {m1})), "
        f"list_distinct(list(user_id % {m2}))))::BIGINT AS ac, "
        f"list_sort(list_concat("
        f"list_filter(list_distinct(list(event_id % {m1})), "
        f"x -> NOT list_contains(list_distinct(list(user_id % {m2})), x)), "
        f"list_filter(list_distinct(list(user_id % {m2})), "
        f"x -> NOT list_contains(list_distinct(list(event_id % {m1})), x))"
        f")) AS xr "
        f"FROM events{w} GROUP BY et ORDER BY et"
    )
    return ch, duck


def _gen_ipv6_pair(rng: random.Random) -> tuple[str, str]:
    # IPv6 canonicalization round-trips over synthesized addresses:
    # the oracle re-derives the canonical text from the same
    # construction (nonzero groups keep the built text canonical)
    g1 = rng.randint(1, 60000)  # +999 stays under 0x10000
    w = _where(rng)
    ch = (
        f"SELECT event_id AS id, "
        f"IPv6NumToString(IPv6StringToNum(concat('2001:db8:', "
        f"lower(hex({g1} + event_id % 1000)), '::', "
        f"lower(hex(1 + user_id % 65535))))) AS canon, "
        f"isIPv6String(concat('2001:db8:', "
        f"lower(hex({g1} + event_id % 1000)), '::1')) AS ok "
        f"FROM events{w} ORDER BY id LIMIT 200"
    )
    duck = (
        f"SELECT event_id AS id, "
        f"'2001:db8:' || lower(to_hex({g1} + event_id % 1000)) || '::' "
        f"|| lower(to_hex(1 + user_id % 65535)) AS canon, "
        f"true AS ok "
        f"FROM events{w} ORDER BY id LIMIT 200"
    )
    return ch, duck


def _gen_nonneg_derivative_pair(rng: random.Random) -> tuple[str, str]:
    # nonNegativeDerivative window function vs the clamped
    # finite-difference spelling
    m = rng.randint(3, 10)
    w = _where(rng)
    ch = (
        f"SELECT event_id AS id, "
        f"round(nonNegativeDerivative(value, ts) OVER ("
        f"PARTITION BY user_id % {m} ORDER BY ts, event_id), 6) AS d "
        f"FROM events{w} ORDER BY id LIMIT 300"
    )
    duck = (
        f"SELECT id, round(greatest(coalesce("
        f"CASE WHEN dt <> 0 THEN dv / dt END, 0), 0), 6) AS d "
        f"FROM (SELECT event_id AS id, "
        f"value - lag(value) OVER w AS dv, "
        f"epoch(ts) - lag(epoch(ts)) OVER w AS dt "
        f"FROM events{w} "
        f"WINDOW w AS (PARTITION BY user_id % {m} "
        f"ORDER BY ts, event_id)) "
        f"ORDER BY id LIMIT 300"
    )
    return ch, duck


def _gen_geohash_pair(rng: random.Random) -> tuple[str, str]:
    # geohashEncode at a RANDOM literal precision 1..12 — odd p
    # exercises the nlon != nlat leg of the round-7 static unrolled
    # encoder; the DuckDB side is the closed-form bit formula (bit g
    # of the hash = binary digit g//2 of the clamped fraction), same
    # as the ch_sql_geo_functions oracle but parameterized over p.
    p = rng.randint(1, 12)
    m = rng.randint(3, 9)
    w = _where(rng)
    coords = (
        "(event_id % 360) - 179.5 AS lon, "
        "(user_id % 170) - 84.5 AS lat"
    )
    bitsum = []
    for j in range(p):
        terms = []
        for b in range(5):
            g = 5 * j + b
            if g % 2 == 0:
                frac, k = "((lon+180)/360)", g // 2
            else:
                frac, k = "((lat+90)/180)", (g - 1) // 2
            terms.append(
                f"(CAST(floor({frac} * {float(2 ** (k + 1))}) AS BIGINT)"
                f" % 2) * {1 << (4 - b)}"
            )
        bitsum.append(
            "substring('0123456789bcdefghjkmnpqrstuvwxyz', "
            f"1 + CAST({' + '.join(terms)} AS INT), 1)"
        )
    gh_duck = " || ".join(bitsum)
    ch = (
        f"SELECT user_id % {m} AS k, "
        f"min(geohashEncode(lon, lat, {p})) AS glo, "
        f"max(geohashEncode(lon, lat, {p})) AS ghi "
        f"FROM (SELECT {coords}, user_id FROM events{w}) "
        f"GROUP BY k ORDER BY k"
    )
    duck = (
        f"WITH c AS (SELECT {coords}, user_id FROM events{w}) "
        f"SELECT user_id % {m} AS k, min({gh_duck}) AS glo, "
        f"max({gh_duck}) AS ghi FROM c GROUP BY k ORDER BY k"
    )
    return ch, duck


def _gen_int_hash_pair(rng: random.Random) -> tuple[str, str]:
    # intHash32/intHash64 over a random input modulus; the DuckDB side
    # replays the spec's wrap-around steps in HUGEINT through staged
    # CTE columns (the ch_sql_sampling_hashes decomposition, fuzzed)
    mod = rng.choice([97, 1009, 65536, 10**9])
    m = rng.randint(3, 7)
    w = _where(rng)
    h64 = str(2**64)
    h63 = str(2**63)
    h32 = str(2**32)
    m1l, m1h = 0xFF51AFD7ED558CCD & 0xFFFFFFFF, 0xFF51AFD7ED558CCD >> 32
    m2l, m2h = 0xC4CEB9FE1A85EC53 & 0xFFFFFFFF, 0xC4CEB9FE1A85EC53 >> 32
    ch = (
        f"SELECT user_id % {m} AS k, "
        f"sum(intHash32(user_id % {mod})) AS s32, "
        f"min(intHash64(event_id % {mod})) AS h64 "
        f"FROM events{w} GROUP BY k ORDER BY k"
    )
    duck = f"""
    WITH b0 AS (
      SELECT user_id % {m} AS k,
             CAST(user_id % {mod} AS HUGEINT) AS xu,
             CAST(event_id % {mod} AS HUGEINT) AS eu
      FROM events{w}),
    s0 AS (SELECT *, xor(eu, CAST({0x4CF2D2BAAE6DA887} AS HUGEINT)) AS a1,
                  xor(xu, CAST({0x75D9543DE018BF45} AS HUGEINT)) AS c0 FROM b0),
    s1 AS (SELECT *, xor(a1, a1 // 8589934592) AS a2,
      (({h64} - 1 - c0) + (c0 * 262144) % {h64}) % {h64} AS c1 FROM s0),
    s2 AS (SELECT *, ((a2 * {m1l}) + ((a2 * {m1h}) % {h32}) * {h32})
        % {h64} AS a3,
      xor(c1, (c1 // 2147483648) + (c1 * 8589934592) % {h64}) AS c2
      FROM s1),
    s3 AS (SELECT *, xor(a3, a3 // 8589934592) AS a4,
      (c2 * 21) % {h64} AS c3 FROM s2),
    s4 AS (SELECT *, ((a4 * {m2l}) + ((a4 * {m2h}) % {h32}) * {h32})
        % {h64} AS a5,
      xor(c3, c3 // 2048) AS c4 FROM s3),
    s5 AS (SELECT *, xor(a5, a5 // 8589934592) AS a6,
      (c4 + (c4 * 64) % {h64}) % {h64} AS c5 FROM s4),
    s6 AS (SELECT *, xor(c5, c5 // 4194304) AS c6 FROM s5)
    SELECT k, CAST(sum(c6 % {h32}) AS BIGINT) AS s32,
           CAST(min(CASE WHEN a6 >= {h63} THEN a6 - {h64} ELSE a6 END)
                AS BIGINT) AS h64
    FROM s6 GROUP BY k ORDER BY k
    """
    return ch, duck


def _gen_lpnorm_pair(rng: random.Random) -> tuple[str, str]:
    # LpNorm at a random exponent + the A/B sizing closed forms; the
    # group digests are exact picks (min/max), never fold-order floats
    from baseline_magician_spark.functions.stats_tests import _norm_ppf

    p = rng.randint(1, 4)
    c1 = rng.randint(1, 9)
    m = rng.randint(3, 7)
    base = round(rng.uniform(0.1, 0.4), 2)
    mde = round(rng.uniform(0.01, 0.1), 2)
    w = _where(rng)
    z = _norm_ppf(1.0 - 0.05 / 2.0) + _norm_ppf(0.8)
    p2 = base + mde
    n_conv = z * z * (base * (1 - base) + p2 * (1 - p2)) / (mde * mde)
    ch = (
        f"SELECT user_id % {m} AS k, "
        f"round(min(LpNorm([value, value + {c1}.0, {c1}.0], {p})), 6)"
        f" AS lo, "
        f"round(max(LpNorm([value, value + {c1}.0, {c1}.0], {p})), 6)"
        f" AS hi, "
        f"round(tupleElement(minSampleSizeConversion({base}, {mde},"
        f" 0.8, 0.05), 1), 4) AS mss "
        f"FROM events{w} GROUP BY k ORDER BY k"
    )
    body = (
        f"pow(pow(abs(value), {float(p)}) + pow(abs(value + {c1}.0),"
        f" {float(p)}) + pow({float(c1)}, {float(p)}),"
        f" {1.0 / p!r})"
    )
    duck = (
        f"SELECT user_id % {m} AS k, "
        f"round(min({body}), 6) AS lo, round(max({body}), 6) AS hi, "
        # CAST first: DuckDB constant-folds round(literal, 4) to
        # DECIMAL(…,4), which renders trailing zeros (430.4620)
        # while the Spark side is a DOUBLE (430.462)
        f"round(CAST({n_conv!r} AS DOUBLE), 4) AS mss "
        f"FROM events{w} GROUP BY k ORDER BY k"
    )
    return ch, duck


def _gen_round7b_pair(rng: random.Random) -> tuple[str, str]:
    # round-7b tranche: a random toRelative*Num unit, clamp, byte- and
    # bit-addressed slicing at random offsets (the DuckDB side replays
    # the per-output-byte shift arithmetic with driver-computed
    # constants), and the asymmetric ngramSearch
    m = rng.randint(3, 7)
    w = _where(rng)
    unit, ch_rel, duck_rel = rng.choice(
        [
            (
                "month",
                "toRelativeMonthNum(ts)",
                "year(CAST(ts AS DATE)) * 12 + month(CAST(ts AS DATE))",
            ),
            (
                "quarter",
                "toRelativeQuarterNum(ts)",
                "year(CAST(ts AS DATE)) * 4 "
                "+ (month(CAST(ts AS DATE)) - 1) // 3",
            ),
            (
                "week",
                "toRelativeWeekNum(ts)",
                "(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))"
                " + 8 - isodow(CAST(ts AS DATE))) // 7",
            ),
            (
                "hour",
                "toRelativeHourNum(ts)",
                "epoch_ms(ts) // 3600000",
            ),
        ]
    )
    lo = rng.randint(0, 4)
    hi = lo + rng.randint(1, 5)
    so = rng.randint(1, 3)
    sl = rng.randint(1, 4)
    boff = rng.randint(1, 9)
    blen = rng.randint(1, 16)

    def duck_byte(k: int) -> str:
        return (
            f"CASE WHEN length(event_type) >= {k} "
            f"THEN ascii(substring(event_type, {k}, 1)) ELSE 0 END"
        )

    eff = (
        f"greatest(least({blen}, length(event_type) * 8 - {boff} + 1),"
        f" 0)"
    )
    parts = []
    for j in (1, 2):
        bitpos = boff + (j - 1) * 8
        k = (bitpos - 1) // 8 + 1
        sh = (bitpos - 1) % 8
        merged = (
            f"({duck_byte(k)} * {1 << sh} "
            f"+ {duck_byte(k + 1)} // {1 << (8 - sh)}) % 256"
            if sh
            else f"{duck_byte(k)}"
        )
        keep = f"least(greatest({eff} - {8 * (j - 1)}, 0), 8)"
        masked = (
            f"CASE WHEN {keep} >= 8 THEN {merged} "
            f"ELSE ({merged}) & (256 - (1 << CAST(8 - {keep} AS INT)))"
            f" END"
        )
        parts.append(
            f"CASE WHEN CAST(ceil({eff} / 8.0) AS INT) >= {j} "
            f"THEN lpad(to_hex({masked}), 2, '0') ELSE '' END"
        )
    duck_bsl = f"upper({' || '.join(parts)})"
    ch = (
        f"SELECT user_id % {m} AS k, "
        f"min({ch_rel}) AS rlo, max({ch_rel}) AS rhi, "
        f"sum(toInt64(clamp(value, {lo}.0, {hi}.0) * 100)) AS cs, "
        f"min(byteSlice(event_type, {so}, {sl})) AS bs, "
        f"max(hex(bitSlice(event_type, {boff}, {blen}))) AS bsl, "
        f"round(max(ngramSearch(props, "
        f"concat('k\": ', toString(event_id % 10)))), 6) AS ns "
        f"FROM events{w} GROUP BY k ORDER BY k"
    )
    gram = (
        "list_distinct(CASE WHEN length({s}) >= 4 THEN "
        "list_transform(range(1, length({s}) - 2), "
        "i -> substring({s}, i, 4)) ELSE [{s}] END)"
    )
    gh = gram.format(s="props")
    gn = gram.format(s="('k\": ' || CAST(event_id % 10 AS VARCHAR))")
    duck = (
        f"SELECT user_id % {m} AS k, "
        f"CAST(min({duck_rel}) AS BIGINT) AS rlo, "
        f"CAST(max({duck_rel}) AS BIGINT) AS rhi, "
        f"CAST(sum(CAST(trunc(least(greatest(value, {lo}.0), {hi}.0)"
        f" * 100) AS BIGINT)) AS BIGINT) AS cs, "
        f"min(substring(event_type, {so}, {sl})) AS bs, "
        f"max({duck_bsl}) AS bsl, "
        f"round(max(CAST(len(list_filter({gn}, "
        f"g -> list_contains({gh}, g))) AS DOUBLE) / len({gn})), 6)"
        f" AS ns "
        f"FROM events{w} GROUP BY k ORDER BY k"
    )
    return ch, duck


def _gen_round7c_pair(rng: random.Random) -> tuple[str, str]:
    # round-7c tranche: quantileInterpolatedWeighted at a random level
    # (DuckDB replays the midpoint convention with windowed cumulative
    # weights + FILTERed brackets), sigmoid under an exact pick, and a
    # mapAdd digest over group-key-built maps
    m = rng.randint(3, 7)
    wmod = rng.randint(2, 5)
    lv = rng.choice([0.1, 0.25, 0.5, 0.75, 0.9])
    w = _where(rng)
    ch = (
        f"SELECT g, "
        f"arrayStringConcat(arrayMap(k -> concat(k, ':', toString("
        f"mapElement(mapAdd(map('a', g, 'b', 2), map('b', g)), k))), "
        f"mapKeys(mapAdd(map('a', g, 'b', 2), map('b', g)))), ',') "
        f"AS ma, qiw, sg FROM ("
        f"SELECT user_id % {m} AS g, "
        f"round(quantileInterpolatedWeighted({lv})("
        f"value, 1 + event_id % {wmod}), 6) AS qiw, "
        f"round(min(sigmoid(value - 5.0)), 6) AS sg "
        f"FROM events{w} GROUP BY g) ORDER BY g"
    )
    duck = f"""
    WITH base AS (
      SELECT user_id % {m} AS g, value AS v,
             1 + event_id % {wmod} AS wt
      FROM events{w}
    ),
    pts AS (
      SELECT g, v, wt,
             sum(wt) OVER (PARTITION BY g ORDER BY v, wt
                           ROWS UNBOUNDED PRECEDING) - wt / 2.0 AS c
      FROM base
    ),
    tg AS (SELECT g, {lv} * sum(wt) AS t FROM base GROUP BY g),
    qs AS (
      SELECT p.g,
             max(CASE WHEN p.c < t.t THEN p.c END) AS c0,
             arg_max(p.v, p.c) FILTER (p.c < t.t) AS v0,
             min(CASE WHEN p.c >= t.t THEN p.c END) AS c1,
             arg_min(p.v, p.c) FILTER (p.c >= t.t) AS v1,
             arg_max(p.v, p.c) AS vlast
      FROM pts p JOIN tg t USING (g) GROUP BY p.g
    ),
    agg AS (
      SELECT g, round(min(1.0 / (1.0 + exp(-(v - 5.0)))), 6) AS sg
      FROM base GROUP BY g
    )
    SELECT q.g, printf('a:%d,b:%d', q.g, 2 + q.g) AS ma,
           round(CASE WHEN q.c1 IS NULL THEN q.vlast
                      WHEN q.c0 IS NULL THEN q.v1
                      ELSE q.v0 + (q.v1 - q.v0) * (t.t - q.c0)
                           / (q.c1 - q.c0) END, 6) AS qiw,
           a.sg AS sg
    FROM qs q JOIN tg t USING (g) JOIN agg a ON a.g = q.g
    ORDER BY q.g
    """
    return ch, duck


def _gen_round7d_pair(rng: random.Random) -> tuple[str, str]:
    # round-7d tranche: GENUINE halfMD5 (DuckDB folds the same
    # first-8-MD5-bytes hex into HUGEINT), parseTimeDelta over random
    # unit spellings, and the Sunday/Monday week boundaries
    m = rng.randint(3, 7)
    w = _where(rng)
    h, mi = rng.randint(0, 9), rng.randint(0, 59)
    hu = rng.choice(["h", "hr", "hour", "hours"])
    mu = rng.choice(["m", "min", "minute", "minutes"])
    mode = rng.choice([0, 1])
    dow_off = "isodow(CAST(ts AS DATE)) % 7" if mode == 0 else (
        "isodow(CAST(ts AS DATE)) - 1"
    )
    ch = (
        f"SELECT user_id % {m} AS k, "
        f"min(toString(halfMD5(concat(event_type, ':', "
        f"toString(event_id % 50))))) AS hm, "
        f"round(max(parseTimeDelta(concat(toString(event_id % {h + 1}),"
        f" '{hu} ', toString(event_id % {mi + 1}), '{mu}'))), 6)"
        f" AS td, "
        f"max(toString(toStartOfWeek(ts, {mode}))) AS sw "
        f"FROM events{w} GROUP BY k ORDER BY k"
    )
    fold = (
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), "
        "list_transform(range(1, 17), "
        "i -> CAST(strpos('0123456789abcdef', substring(md5("
        "event_type || ':' || CAST(event_id % 50 AS VARCHAR)"
        "), CAST(i AS INT), 1)) - 1 AS HUGEINT))), "
        "(a, d) -> a * 16 + d)"
    )
    duck = (
        f"SELECT user_id % {m} AS k, "
        f"min(CAST({fold} AS VARCHAR)) AS hm, "
        f"round(max((event_id % {h + 1}) * 3600.0 "
        f"+ (event_id % {mi + 1}) * 60.0), 6) AS td, "
        f"max(CAST(CAST(ts AS DATE) "
        f"- CAST({dow_off} AS INTEGER) AS VARCHAR)) AS sw "
        f"FROM events{w} GROUP BY k ORDER BY k"
    )
    return ch, duck


def _gen_wrap_hash_pair(rng: random.Random) -> tuple[str, str]:
    """Round-8 byte-exact string hashes, fuzzed: a random-length
    ASCII probe through cityHash64 / sipHash64 / murmurHash2_64 /
    murmurHash3_32 on the CH side, the corresponding straight-line
    HUGEINT emitter replay on the DuckDB side. City is capped at the
    <=64-byte classes here (the chunk-loop chains make the DuckDB
    plan heavy; the loop is driver-checked by ch_sql_cityhash64)."""
    from baseline_magician_spark.functions.cityhash import (
        CityEmitter,
        staged_ctes,
    )
    from baseline_magician_spark.functions.murmur import MurmurEmitter
    from baseline_magician_spark.functions.siphash import SipEmitter
    from baseline_magician_spark.functions.xxhash import XxEmitter

    kind = rng.choice(["city", "sip", "m2", "m3", "x64", "x32"])
    max_len = {"city": 64, "sip": 23, "m2": 31, "m3": 31,
               "x64": 71, "x32": 47}[kind]
    mod = rng.randint(4, max_len) + 1
    m = rng.randint(3, 7)
    pad = "=+~" * 22
    w = _where(rng)
    fn = {
        "city": "cityHash64",
        "sip": "sipHash64",
        "m2": "murmurHash2_64",
        "m3": "murmurHash3_32",
        "x64": "xxHash64",
        "x32": "xxHash32",
    }[kind]
    ch = (
        f"SELECT user_id % {m} AS g, "
        f"min({fn}(substring(concat(event_type, toString(user_id), "
        f"'{pad}'), 1, toInt32(event_id % {mod})))) AS hmin, "
        f"count(DISTINCT {fn}(substring(concat(event_type, "
        f"toString(user_id), '{pad}'), 1, toInt32(event_id % {mod})))) "
        f"AS hu FROM events{w} GROUP BY g ORDER BY g"
    )
    if kind == "city":
        em = CityEmitter("fz")
        h = em.full_dispatch("e", "ne", mod)
        hs = em.signed(h)
    elif kind == "sip":
        em = SipEmitter("fz")
        h = em.dispatch("e", "ne", mod - 1)
        hs = em.signed(h)
    elif kind == "m2":
        em = MurmurEmitter("fz")
        h = em.m2_dispatch("e", "ne", mod - 1)
        hs = em.signed64(h)
    elif kind == "m3":
        em = MurmurEmitter("fz")
        h = em.m3_dispatch("e", "ne", mod - 1)
        hs = em.emit(f"CAST({h} AS BIGINT)")
    elif kind == "x64":
        em = XxEmitter("fz")
        h = em.xxh64_dispatch("e", "ne", mod - 1)
        hs = em.signed64(h)
    else:
        em = XxEmitter("fz")
        h = em.xxh32_dispatch("e", "ne", mod - 1)
        hs = em.emit(f"CAST({h} AS BIGINT)")
    ctes, last = staged_ctes(em, "fb1")
    duck = f"""
    WITH fb0 AS (
      SELECT user_id % {m} AS g,
             substr(event_type || CAST(user_id AS VARCHAR) || '{pad}',
                    1, CAST(event_id % {mod} AS INTEGER)) AS e
      FROM events{w}
    ),
    fb1 AS (SELECT *, length(e) AS ne FROM fb0),
    {ctes}
    SELECT g, min({hs}) AS hmin, count(DISTINCT {h}) AS hu
    FROM {last} GROUP BY g ORDER BY g
    """
    return ch, duck


N_PAIRED = 138


def _gen_pair(rng: random.Random) -> tuple[str, str]:
    return rng.choice(
        [_gen_scalar_with_pair, _gen_star_except_pair,
         _gen_star_replace_pair, _gen_star_apply_pair,
         _gen_array_index_pair, _gen_with_fill_pair,
         _gen_tuple_in_subquery_pair, _gen_limit_ties_pair,
         _gen_combinator_pair, _gen_combinator_pair,
         _gen_map_pair, _gen_retention_pair, _gen_funnel_pair,
         _gen_vector_pair, _gen_semi_join_pair,
         _gen_string_search_pair, _gen_stats_agg_pair,
         _gen_geo_pair, _gen_strsim_pair, _gen_assoc_pair,
         _gen_jaro_pair, _gen_rank_decay_pair,
         _gen_weighted_quantile_pair, _gen_resample_pair,
         _gen_bitmap_pair, _gen_ipv6_pair,
         _gen_nonneg_derivative_pair,
         _gen_geohash_pair, _gen_int_hash_pair, _gen_lpnorm_pair,
         _gen_round7b_pair, _gen_round7c_pair, _gen_round7d_pair,
         _gen_wrap_hash_pair]
    )(rng)


PAIRED_CASES = [
    _gen_pair(random.Random(89 * i + _SEED_BASE + 7))
    for i in range(N_PAIRED)
]


@pytest.mark.parametrize("ch_sql,duck_sql", PAIRED_CASES)
def test_paired_query_matches_duckdb(spark, duck, ch_sql, duck_sql):
    from baseline_magician_spark.catalog import load_table
    from baseline_magician_spark.plans.ch_sql import run_ch_query

    ev = load_table(spark, SF_ORACLE, "events")
    sdf = run_ch_query(ch_sql, {"events": ev})
    s_cols = sdf.columns
    s_rows = sorted(
        tuple(str(x) for x in r)
        for r in sdf.select(*sorted(s_cols)).collect()
    )
    res = duck.execute(duck_sql)
    d_cols = [d[0] for d in res.description]
    idx = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    d_rows = sorted(
        tuple(str(r[i]) for i in idx) for r in res.fetchall()
    )
    assert sorted(s_cols) == sorted(d_cols), f"{ch_sql}\n{duck_sql}"
    assert s_rows == d_rows, (
        f"{ch_sql}\n{duck_sql}\nspark={s_rows[:3]}\nduck={d_rows[:3]}"
    )


# ------------------------------------------------------------------ #
# INSERT differential (round 5): random VALUES rows (typed literals  #
# + ?-placeholder exec loops) and INSERT SELECT tails run through    #
# run_ch_insert -> parquet -> read-back, against DuckDB executing    #
# the same statement into a real table. Any mismatch is an INSERT    #
# path bug (parsing, casting, positional mapping, block write).      #
# ------------------------------------------------------------------ #

_SINK_SPARK = "id bigint, name string, v double, d date"
_SINK_DUCK = "id BIGINT, name VARCHAR, v DOUBLE, d DATE"
# exact-in-binary doubles and strings that stress quoting + the
# isInsert routing quirk (' SELECT ' inside a literal)
_INS_STRS = ["alpha", "a''b", " SELECT ", "x,y", "", "beta"]


def _ins_date(rng: random.Random) -> str:
    return f"2024-0{rng.randint(1, 9)}-1{rng.randint(0, 9)}"


def _gen_insert_values_case(rng: random.Random):
    if rng.random() < 0.4:
        # ?-placeholder template + per-exec rows (the driver's
        # prepared-statement block loop)
        n = rng.randint(1, 5)
        rows = [
            (
                rng.randint(-100, 10**6),
                _INS_STRS[rng.randrange(len(_INS_STRS))].replace("''", "'"),
                rng.randint(-8, 8) / 4,
                _ins_date(rng),
            )
            for _ in range(n)
        ]
        return ("values_params", "INSERT INTO sink VALUES (?, ?, ?, ?)", rows)
    n = rng.randint(1, 4)
    lits = []
    for _ in range(n):
        iv = rng.randint(-100, 10**6)
        sv = rng.choice(_INS_STRS)
        vv = rng.randint(-8, 8) / 4
        parts = [
            "NULL" if rng.random() < 0.1 else str(iv),
            "NULL" if rng.random() < 0.1 else f"'{sv}'",
            "NULL" if rng.random() < 0.1 else str(vv),
            "NULL" if rng.random() < 0.1 else f"'{_ins_date(rng)}'",
        ]
        lits.append("(" + ", ".join(parts) + ")")
    return ("values", f"INSERT INTO sink VALUES {', '.join(lits)}", None)


def _gen_insert_select_case(rng: random.Random):
    m = rng.randint(2, 9)
    q = rng.randint(1, 16)
    w = _where(rng)
    sql = (
        f"INSERT INTO sink3 SELECT user_id % {m}, event_type, "
        f"CAST(event_id % {q} AS DOUBLE) / 4 FROM events{w}"
    )
    return ("insert_select", sql, None)


N_INSERT = 18
INSERT_CASES = [
    (_gen_insert_values_case if i % 2 else _gen_insert_select_case)(
        random.Random(71 * i + _SEED_BASE + 29)
    )
    for i in range(N_INSERT)
]


@pytest.mark.parametrize("kind,sql,rows", INSERT_CASES)
def test_insert_roundtrip_matches_duckdb(
    spark, duck, kind, sql, rows, tmp_path
):
    from baseline_magician_spark.catalog import load_table
    from baseline_magician_spark.plans.ch_insert import run_ch_insert

    if kind == "insert_select":
        duck_schema = "id BIGINT, name VARCHAR, v DOUBLE"
        spark_schema = "id bigint, name string, v double"
        tname = "sink3"
    else:
        duck_schema, spark_schema, tname = _SINK_DUCK, _SINK_SPARK, "sink"
    duck.execute(f"CREATE OR REPLACE TABLE {tname}({duck_schema})")
    try:
        if kind == "values_params":
            duck.executemany(sql, rows)
        else:
            duck.execute(sql)
        d_rows = sorted(
            tuple(str(x) for x in r)
            for r in duck.execute(f"SELECT * FROM {tname}").fetchall()
        )
        tabs = {
            tname: spark.createDataFrame([], spark_schema),
            "events": load_table(spark, SF_ORACLE, "events"),
        }
        path = str(tmp_path / "sink")
        run_ch_insert(
            sql, tabs, rows=rows, path=path, mode="overwrite"
        )
        back = spark.read.parquet(path)
        s_rows = sorted(
            tuple(str(x) for x in r) for r in back.collect()
        )
        assert [f.name for f in back.schema.fields] == [
            c.split()[0] for c in spark_schema.split(", ")
        ], sql
        assert s_rows == d_rows, (
            f"{sql}\nspark={s_rows[:3]}\nduck={d_rows[:3]}"
        )
    finally:
        duck.execute(f"DROP TABLE IF EXISTS {tname}")


# ------------------------------------------------------------------ #
# Mutation differential (round 5): random ALTER TABLE DELETE/UPDATE  #
# chains through run_ch_statement's lazy env rewrites, against       #
# DuckDB executing the real DELETE/UPDATE on a materialized copy of  #
# the same rows — then one shared aggregate SELECT over the mutated  #
# table. Any mismatch is a mutation-path bug (predicate three-valued #
# logic, assignment casting, statement ordering).                    #
# ------------------------------------------------------------------ #


def _mut_cond(rng: random.Random) -> str:
    return rng.choice(
        [
            f"user_id % {rng.randint(2, 6)} = {rng.randint(0, 1)}",
            f"event_id > {rng.randint(10000, 50000)}",
            f"event_type = '{rng.choice(_STR_VALS)}'",
            f"event_type != '{rng.choice(_STR_VALS)}'",
            (
                f"user_id BETWEEN {rng.randint(0, 3000)} "
                f"AND {rng.randint(3000, 9000)}"
            ),
        ]
    )


def _gen_mutation_case(rng: random.Random):
    stmts = []
    for _ in range(rng.randint(1, 3)):
        if rng.random() < 0.45:
            stmts.append(("delete", _mut_cond(rng), None, None))
        else:
            col = rng.choice(["user_id", "event_id"])
            expr = rng.choice(
                [f"{col} * 2", f"{col} % 97", f"{col} + 13", "0",
                 "user_id + event_id"]
            )
            stmts.append(("update", _mut_cond(rng), col, expr))
    return stmts


N_MUT = 12
MUT_CASES = [
    _gen_mutation_case(random.Random(53 * i + _SEED_BASE + 47))
    for i in range(N_MUT)
]

_MUT_SELECT = (
    "SELECT event_type AS k, count(*) AS n, "
    "CAST(sum(user_id) AS BIGINT) AS su, "
    "CAST(sum(event_id) AS BIGINT) AS se, "
    "CAST(min(user_id) AS BIGINT) AS lo, "
    "CAST(max(event_id) AS BIGINT) AS hi "
    "FROM mut GROUP BY event_type ORDER BY k"
)


@pytest.mark.parametrize("stmts", MUT_CASES)
def test_mutation_chain_matches_duckdb(spark, duck, stmts):
    from baseline_magician_spark.catalog import load_table
    from baseline_magician_spark.plans.ch_insert import run_ch_statement
    from baseline_magician_spark.plans.ch_sql import run_ch_query

    duck.execute(
        "CREATE OR REPLACE TABLE mut AS "
        "SELECT user_id, event_id, event_type FROM events"
    )
    try:
        tabs = {
            "mut": load_table(spark, SF_ORACLE, "events").select(
                "user_id", "event_id", "event_type"
            )
        }
        for verb, cond, col, expr in stmts:
            if verb == "delete":
                duck.execute(f"DELETE FROM mut WHERE {cond}")
                run_ch_statement(
                    f"ALTER TABLE mut DELETE WHERE {cond}", tabs
                )
            else:
                duck.execute(f"UPDATE mut SET {col} = {expr} WHERE {cond}")
                run_ch_statement(
                    f"ALTER TABLE mut UPDATE {col} = {expr} WHERE {cond}",
                    tabs,
                )
        d_rows = sorted(
            tuple(str(x) for x in r)
            for r in duck.execute(_MUT_SELECT).fetchall()
        )
        s_rows = sorted(
            tuple(str(x) for x in r)
            for r in run_ch_query(_MUT_SELECT, tabs).collect()
        )
        assert s_rows == d_rows, f"{stmts}\n{s_rows[:3]}\n{d_rows[:3]}"
    finally:
        duck.execute("DROP TABLE IF EXISTS mut")
