"""User-defined AGGREGATE functions (SURVEY §2.10).

The reference's UDF surface is scalar-only (govaluate
ExpressionFunction, gov/expressionFunctions.go:1-9); UDAFs are ABSENT
there. This module supplies the Spark-idiomatic extension: grouped-agg
pandas UDFs (Arrow-batched Series -> scalar), registered into the same
CH-dialect function registry the SQL front end resolves, so a user can
call them from query text exactly like built-in aggregates.

Construction is lazy and UNCACHED: the ``pandas_udf`` wrapper needs an
active SparkSession to parse its return-type DDL, and a cached wrapper
would pin a stale JVM handle across a session restart. Building the
wrapper is registration metadata only — negligible per query build.
pandas itself is imported inside the builders, so this module (and the
registry that imports it) stays importable on pandas-less installs.

Scale note: a grouped-agg pandas UDF executes AFTER the shuffle on the
group key, one Arrow batch per group — partial aggregation cannot be
pushed map-side the way built-in aggregates are. That is the inherent
UDAF cost on any engine; keep them for semantics built-ins can't
express (here: a weighted mean whose weight is a second column).
"""

# NO `from __future__ import annotations` here: pandas_udf resolves the
# inner functions' type hints at definition time, and stringified hints
# would need `pd` in MODULE globals — defeating the lazy pandas import.
from pyspark.sql import Column


def _weighted_avg_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_avg(v: pd.Series, w: pd.Series) -> float:
        den = w.sum()
        if den == 0:
            return float("nan")
        return float((v * w).sum() / den)

    return weighted_avg


def _geometric_mean_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geometric_mean(v: pd.Series) -> float:
        import numpy as np

        arr = v.to_numpy(dtype="float64")
        arr = arr[arr > 0]
        if arr.size == 0:
            return float("nan")
        return float(np.exp(np.log(arr).mean()))

    return geometric_mean


def weighted_avg(v, w) -> Column:
    """sum(v*w)/sum(w) over the group — Arrow-batched, vectorized."""
    return _weighted_avg_udf()(v, w)


def geometric_mean(v) -> Column:
    """exp(mean(ln v)) over the group (positive values only)."""
    return _geometric_mean_udf()(v)


UDAF_FUNCTIONS = {
    "weightedAvg": weighted_avg,
    "geometricMean": geometric_mean,
}
