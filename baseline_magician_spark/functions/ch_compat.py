"""ClickHouse-compatible function shims.

The reference's query generator emits ClickHouse SQL functions
(main.go:238-279); the driver's quoting layer emits toDateTime
(vendor clickhouse-go helpers.go:142-144). Each shim is a Column
builder over Spark built-ins — registered here so a CH-dialect query
front end (or the expression compiler) can resolve them by name.

No Catalyst extension needed: all of these fold into whole-stage
codegen as ordinary expressions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from .ip import ip4_to_long, long_to_ip4


def _to_int(width: str) -> Callable[[Column], Column]:
    return lambda c: c.cast(width)


CH_FUNCTIONS: dict[str, Callable[..., Column]] = {
    # emitted by the reference's generated SQL (main.go:238-279)
    "IPv4StringToNum": ip4_to_long,
    "IPv4NumToString": long_to_ip4,
    "toInt64": _to_int("long"),
    "toInt32": _to_int("int"),
    "toInt16": _to_int("short"),
    "toInt8": _to_int("byte"),
    "toUInt64": _to_int("decimal(20,0)"),  # UInt64 range exceeds long
    "toUInt32": _to_int("long"),
    "toUInt16": _to_int("int"),
    "toUInt8": _to_int("short"),
    "toFloat64": _to_int("double"),
    "toFloat32": _to_int("float"),
    "toString": _to_int("string"),
    "toDate": F.to_date,
    "toDateTime": lambda c, tz=None: F.to_timestamp(c),
    "now": F.current_timestamp,
    "today": F.current_date,
    # common CH aggregate spellings -> Spark equivalents
    "count": F.count,
    "avg": F.avg,
    "max": F.max,
    "min": F.min,
    "sum": F.sum,
    "any": F.first,
    "uniq": F.approx_count_distinct,
    "uniqExact": F.countDistinct,
    "quantile": lambda c, q=0.5: F.percentile_approx(c, q),
}


def ch_fn(name: str) -> Callable[..., Column]:
    """Resolve a ClickHouse function name to its Column builder."""
    try:
        return CH_FUNCTIONS[name]
    except KeyError:
        raise KeyError(
            f"no ClickHouse-compat shim for {name!r}; "
            f"known: {sorted(CH_FUNCTIONS)}"
        ) from None
