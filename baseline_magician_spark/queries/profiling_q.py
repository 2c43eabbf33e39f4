"""Table-profiling query: one-pass per-column stats on the orders
table (operators/profiling.py), oracle-checked cell by cell."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import query

# (column, kind) mirror of the orders schema the Spark side profiles;
# the oracle is generated from the same spec so the cell set cannot
# drift from operators.profiling._cells' kind dispatch.
_ORDERS_SPEC = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _profile_oracle(spec=_ORDERS_SPEC, table="orders") -> str:
    parts = []
    for col, kind in spec:
        base = [
            ("n_null", f"count(CASE WHEN {col} IS NULL THEN 1 END)"),
            ("n_distinct", f"count(DISTINCT {col})"),
        ]
        if kind == "num":
            base += [
                ("min", f"min({col})"),
                ("max", f"max({col})"),
                ("mean", f"avg({col})"),
            ]
        elif kind == "str":
            base += [
                ("min_len", f"min(length({col}))"),
                ("max_len", f"max(length({col}))"),
                ("avg_len", f"avg(length({col}))"),
            ]
        else:  # ts
            base += [
                ("min_epoch", f"floor(epoch(min({col})))"),
                ("max_epoch", f"floor(epoch(max({col})))"),
            ]
        for stat, expr in base:
            parts.append(
                f"SELECT '{col}' AS \"column\", '{stat}' AS stat, "
                f"round(CAST({expr} AS DOUBLE), 6) AS value FROM {table}"
            )
    return "\nUNION ALL\n".join(parts)


@query("profile_orders_table", _profile_oracle())
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of orders: nulls/distincts plus per-kind
    stats for every column, computed in a single scan + single 1-row
    aggregate (the oracle's 26-subquery UNION ALL is what that costs
    when an engine lacks the one-pass form)."""
    from ..operators.profiling import profile_table

    return profile_table(load_table(spark, sf_dir, "orders"))


# the documents twin: same one-pass profiler over the text corpus
# table (the other table a pipeline operator reads most).
_DOCS_SPEC = [
    ("doc_id", "num"),
    ("text", "str"),
    ("lang", "str"),
    ("source", "str"),
    ("n_chars", "num"),
]


@query(
    "profile_documents_table",
    _profile_oracle(_DOCS_SPEC, "documents"),
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of documents — same single-scan one-row
    aggregate as profile_orders_table, over the corpus table."""
    from ..operators.profiling import profile_table

    return profile_table(load_table(spark, sf_dir, "documents"))


# -- declarative constraint suite (round 10) ---------------------------
# The Deequ-style per-batch quality gate: every constraint's metric
# rides ONE aggregate row (one scan for the whole suite); the oracle
# computes the same metrics in a single-row CTE and unions the
# constraint rows. Thresholds are plan literals shared by both sides.
def _constraints_oracle() -> str:
    m = """
    WITH m AS (
      SELECT CAST(count(*) AS DOUBLE) AS c_rows,
             CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*)
               AS c_uniq,
             avg(CASE WHEN o_custkey IS NOT NULL THEN 1.0
                      ELSE 0.0 END) AS c_comp,
             avg(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 1.0
                      ELSE 0.0 END) AS c_status,
             CAST(min(o_totalprice) AS DOUBLE) AS c_minprice,
             avg(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                      THEN 1.0 ELSE 0.0 END) AS c_prio
      FROM orders
    )
    """
    rows = [
        ("row_count_min_100", "c_rows", "c_rows >= 100"),
        ("orderkey_unique", "c_uniq", "c_uniq >= 1.0"),
        ("custkey_complete", "c_comp", "c_comp >= 0.999"),
        ("status_in_accepted_set", "c_status", "c_status >= 1.0"),
        ("totalprice_nonnegative", "c_minprice", "c_minprice >= 0.0"),
        ("priority_format", "c_prio", "c_prio >= 1.0"),
    ]
    # Predicates evaluate on the ROUNDED metric, matching the Spark
    # side (check_constraints rounds before applying the predicate):
    # a metric within 5e-7 of its threshold must flip the same way in
    # both engines (ADVICE r10).
    sel = "\nUNION ALL\n".join(
        f"SELECT '{n}' AS \"constraint\", round({c}, 6) AS metric, "
        f"{p.replace(c, f'round({c}, 6)')} AS passed FROM m"
        for n, c, p in rows
    )

    # referential-integrity rows (round 10): FK coverage as
    # constraints — metric = match rate over non-null child keys,
    # passed iff zero orphans (operators/profiling.py::fk_coverage)
    def fk(name, ck, child, pk, parent):
        return f"""
    SELECT '{name}' AS "constraint",
           round(CAST(count(p._pk) AS DOUBLE) / count(c._ck), 6)
             AS metric,
           (count(c._ck) - count(p._pk)) = 0 AS passed
    FROM (SELECT {ck} AS _ck FROM {child}) c
    LEFT JOIN (SELECT DISTINCT {pk} AS _pk FROM {parent}) p
      ON c._ck = p._pk"""

    fks = "\nUNION ALL\n".join(
        [
            fk("fk_lineitem_orderkey", "l_orderkey", "lineitem",
               "o_orderkey", "orders"),
            fk("fk_orders_custkey", "o_custkey", "orders",
               "c_custkey", "customer"),
            fk("fk_customer_nationkey", "c_nationkey", "customer",
               "n_nationkey", "nation"),
        ]
    )
    return m + sel + "\nUNION ALL\n" + fks


@query("profile_constraint_checks", _constraints_oracle())
def profile_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate: row volume, key uniqueness,
    completeness, accepted-value and format compliance, and a bounds
    check over orders — ALL in one scan + one aggregate row
    (operators/profiling.py::check_constraints) — plus the schema's
    three load-bearing FOREIGN-KEY coverage rows (fk_coverage: one
    left join against each parent's DISTINCT key set, no fanout,
    AQE broadcasts small parents), all in the same
    (constraint, metric, passed) shape."""
    from pyspark.sql import functions as F

    from ..operators.profiling import check_constraints

    orders = load_table(spark, sf_dir, "orders")
    one = F.lit(1.0)
    zero = F.lit(0.0)
    checks = [
        (
            "row_count_min_100",
            F.count(F.lit(1)),
            lambda v: v >= 100,
        ),
        (
            "orderkey_unique",
            F.count_distinct(F.col("o_orderkey")).cast("double")
            / F.count(F.lit(1)),
            lambda v: v >= 1.0,
        ),
        (
            "custkey_complete",
            F.avg(F.when(F.col("o_custkey").isNotNull(), one).otherwise(zero)),
            lambda v: v >= 0.999,
        ),
        (
            "status_in_accepted_set",
            F.avg(
                F.when(
                    F.col("o_orderstatus").isin("O", "F", "P"), one
                ).otherwise(zero)
            ),
            lambda v: v >= 1.0,
        ),
        (
            "totalprice_nonnegative",
            F.min(F.col("o_totalprice")),
            lambda v: v >= 0.0,
        ),
        (
            "priority_format",
            F.avg(
                F.when(
                    F.col("o_orderpriority").rlike("^[1-5]-"), one
                ).otherwise(zero)
            ),
            lambda v: v >= 1.0,
        ),
    ]
    suite = check_constraints(orders, checks)

    # FK coverage rows (round 10) — same (constraint, metric, passed)
    # schema, each one left join against the parent's DISTINCT keys
    from ..operators.profiling import fk_coverage

    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    fks = [
        fk_coverage(li, orders, "l_orderkey", "o_orderkey",
                    "fk_lineitem_orderkey"),
        fk_coverage(orders, cust, "o_custkey", "c_custkey",
                    "fk_orders_custkey"),
        fk_coverage(cust, nation, "c_nationkey", "n_nationkey",
                    "fk_customer_nationkey"),
    ]
    out = suite
    for p in fks:
        out = out.unionAll(
            p.select(
                F.col("relationship").alias("constraint"),
                F.col("match_rate").alias("metric"),
                "passed",
            )
        )
    return out


# -- shuffle-key skew diagnostics (round 10) ---------------------------
def _key_skew_oracle() -> str:
    return """
    WITH counts AS (
      SELECT user_id AS k, count(*) AS n FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n, k) AS i FROM counts
    )
    SELECT count(*) AS n_keys,
           CAST(sum(n) AS BIGINT) AS n_rows,
           round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top1_share,
           round(CAST(max(n) AS DOUBLE)
                 / (CAST(sum(n) AS DOUBLE) / count(*)), 6)
             AS max_mean_ratio,
           round(2.0 * sum(i * n) / (count(*) * sum(n))
                 - CAST(count(*) + 1 AS DOUBLE) / count(*), 6)
             AS gini
    FROM ranked
    """


@query("profile_key_skew", _key_skew_oracle())
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnostics for events.user_id — the measurement that
    decides salting / AQE skew-join BEFORE the 100 TB groupBy: top-1
    key share, max/mean ratio, Gini of the per-key count
    distribution. The stats run over the per-key count frame, orders
    of magnitude smaller than the data."""
    from ..operators.profiling import key_skew_profile

    return key_skew_profile(
        load_table(spark, sf_dir, "events"), "user_id"
    )


# -- snapshot diff (round 10) ------------------------------------------
def _snapshot_diff_oracle() -> str:
    return """
    WITH old AS (
      SELECT o_orderkey AS k, o_totalprice AS p, o_orderstatus AS s
      FROM orders
    ),
    neww AS (
      SELECT k, CASE WHEN k % 7 = 0 THEN p + 1.0 ELSE p END AS p, s
      FROM old WHERE k % 13 <> 0
      UNION ALL
      SELECT k + 100000000, p, s FROM old WHERE k % 11 = 0
    ),
    j AS (
      SELECT o.k AS ko, n.k AS kn, o.p AS po, n.p AS pn,
             o.s AS so, n.s AS sn
      FROM old o FULL OUTER JOIN neww n ON o.k = n.k
    ),
    d AS (
      SELECT CASE WHEN ko IS NULL THEN 'added'
                  WHEN kn IS NULL THEN 'removed'
                  WHEN (po IS DISTINCT FROM pn)
                    OR (so IS DISTINCT FROM sn) THEN 'changed'
                  ELSE 'unchanged' END AS status,
             (CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
                        AND po IS DISTINCT FROM pn
                   THEN 1 ELSE 0 END
              + CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
                          AND so IS DISTINCT FROM sn
                     THEN 1 ELSE 0 END) AS nch
      FROM j
    )
    SELECT status, count(*) AS n_rows,
           CAST(sum(nch) AS BIGINT) AS cols_changed
    FROM d GROUP BY status
    """


@query("pipeline_snapshot_diff", _snapshot_diff_oracle())
def pipeline_snapshot_diff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Snapshot diff — the lakehouse regression check after a
    rewrite/backfill: a deterministic 'new' snapshot of orders
    (every 13th row deleted, every 7th survivor's price bumped,
    every 11th row re-added under a shifted key) is diffed against
    the original via ONE full-outer key join
    (operators/profiling.py::snapshot_diff), rolled up to per-status
    row counts + changed-column volume."""
    from pyspark.sql import functions as F

    from ..operators.profiling import snapshot_diff

    orders = load_table(spark, sf_dir, "orders")
    old = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    key = F.col("o_orderkey")
    newer = old.where(key % 13 != 0).withColumn(
        "o_totalprice",
        F.when(key % 7 == 0, F.col("o_totalprice") + 1.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    added = old.where(key % 11 == 0).select(
        (key + 100000000).alias("o_orderkey"),
        "o_totalprice",
        "o_orderstatus",
    )
    new = newer.unionAll(added)
    diff = snapshot_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.size("changed_cols")).alias("cols_changed"),
    )

