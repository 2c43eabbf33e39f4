"""User-defined AGGREGATE functions (SURVEY §2.10).

The reference's UDF surface is scalar-only (govaluate
ExpressionFunction, gov/expressionFunctions.go:1-9); UDAFs are ABSENT
there. This module supplies the Spark-idiomatic extension: grouped-agg
pandas UDFs (Arrow-batched Series -> scalar), registered into the same
CH-dialect function registry the SQL front end resolves, so a user can
call them from query text exactly like built-in aggregates.

The ``pandas_udf`` wrapper needs an active SparkSession to parse its
return-type DDL, so creation is lazy (first call) — the public names
are plain callables that build and cache the UDF on demand.

Scale note: a grouped-agg pandas UDF executes AFTER the shuffle on the
group key, one Arrow batch per group — partial aggregation cannot be
pushed map-side the way built-in aggregates are. That is the inherent
UDAF cost on any engine; keep them for semantics built-ins can't
express (here: a weighted mean whose weight is a second column).
"""

from __future__ import annotations

import functools

import pandas as pd
from pyspark.sql import Column


@functools.lru_cache(maxsize=None)
def _weighted_avg_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_avg(v: pd.Series, w: pd.Series) -> float:
        den = w.sum()
        if den == 0:
            return float("nan")
        return float((v * w).sum() / den)

    return weighted_avg


@functools.lru_cache(maxsize=None)
def _geometric_mean_udf():
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
