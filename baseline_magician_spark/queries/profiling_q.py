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
