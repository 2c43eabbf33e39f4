"""Oracle-checked queries exercising the CH-dialect front end's round-2
surface: P7 parameter binding (ch/stmt.go:116-204), JOINs (the binder's
join-aware keyword set, ch/helpers.go:30-31), and S6 external-table
membership (ch/clickhouse_send_external_data.go:5-35) — all through
``run_ch_query`` on the shared test tables, hash-matched against plain
DuckDB SQL with the same literals substituted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..plans.ch_bind import ExternalTable
from ..plans.ch_sql import run_ch_query
from ..registry import query


def _tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


# ?/@ placeholders in every binding position the reference recognizes:
# after a comparison operator, inside an IN list (after '(' and ','),
# and after LIMIT. toInt64(avg()) truncates toward zero like the
# reference's scan path (main.go:272).
_BIND_SQL = """
SELECT event_type, count(*) AS n_events, toInt64(avg(value)) AS avg_value
FROM fastnetmon.events
WHERE value >= ? AND value < @hi AND event_type IN (?, ?, ?)
GROUP BY event_type
ORDER BY event_type
"""


@query(
    "ch_sql_param_binding",
    """
    SELECT event_type, count(*) AS n_events,
           CAST(trunc(avg(value)) AS BIGINT) AS avg_value
    FROM events
    WHERE value >= 10.0 AND value < 95.0
      AND event_type IN ('click', 'purchase', 'view')
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ch_sql_param_binding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_ch_query(
        _BIND_SQL,
        _tables(spark, sf_dir, "events"),
        args=(10.0, "click", "purchase", "view"),
        named={"hi": 95.0},
    )


# three-table dimension join; the right sides broadcast (ClickHouse's
# join physical model holds the right relation in RAM on every node —
# the max_rows_in_join guards, ch/query_settings.go:108-109, bound that
# build side; F.broadcast is the faithful Spark mapping).
_JOIN_SQL = """
SELECT r.r_name AS region, count(*) AS n_customers,
       toInt64(max(c.c_acctbal) - min(c.c_acctbal)) AS bal_spread
FROM fastnetmon.customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_mktsegment != 'MACHINERY'
GROUP BY r.r_name
ORDER BY r.r_name
"""


@query(
    "ch_sql_join_dims",
    """
    SELECT r.r_name AS region, count(*) AS n_customers,
           CAST(trunc(max(c.c_acctbal) - min(c.c_acctbal)) AS BIGINT)
             AS bal_spread
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE c.c_mktsegment != 'MACHINERY'
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
)
def ch_sql_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_ch_query(
        _JOIN_SQL, _tables(spark, sf_dir, "customer", "nation", "region")
    )


# S6 + P7 combined: the external table arrives as a NAMED parameter
# whose bind substitutes the table name into the SQL text, and the
# membership compiles against the shipped in-memory relation.
_EXT_SQL = """
SELECT event_type, count(*) AS n_events, uniqExact(user_id) AS n_users
FROM fastnetmon.events
WHERE event_type IN @allowed
GROUP BY event_type
ORDER BY event_type
"""


@query(
    "ch_sql_in_external_table",
    """
    SELECT event_type, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM events
    WHERE event_type IN ('click', 'error')
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ch_sql_in_external(spark: SparkSession, sf_dir: str) -> DataFrame:
    ext = ExternalTable(
        "allowed_types",
        spark.createDataFrame([("click",), ("error",)], ["event_type"]),
    )
    return run_ch_query(
        _EXT_SQL,
        _tables(spark, sf_dir, "events"),
        named={"allowed": ext},
    )
