"""IPv6 / MAC address functions (CH network family).

IPv6 values carry as 16-byte ``binary`` columns (CH's FixedString(16)
wire shape); parsing and formatting are pure Column string algebra
over the 32-char hex transliteration — bounded 8-group folds, no
Python in the data path.

Reference scope note: the reference's IP surface is IPv4-only
(cidr/cidr.go; SURVEY §2.8 X1–X6) — the IPv6/MAC family is
§2.12 extension-tier surface its network-monitoring users expect of a
drop-in engine.

Documented divergences from ClickHouse:
- invalid text yields NULL (CH throws; the OrNull/OrZero variants
  match CH exactly);
- formatting follows glibc inet_ntop like CH: longest zero run
  (first on tie, runs of >= 2 groups) compresses to ``::``, and the
  v4-tail special cases (``::a.b.c.d``, ``::ffff:a.b.c.d``, the
  odd ``::0.0.0.x`` for 7 leading zero groups unless the value is
  ``::1``) print dotted.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .ip import ip4_to_long, long_to_ip4


from .stats_tests import _let  # noqa: E402  (the one binder)


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


_V4_RE = (
    r"^(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
    r"(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}$"
)
_HEXG = r"^[0-9a-f]{1,4}$"


def _empty_str_arr() -> Column:
    # built lazily: a module-level F.array() would demand an active
    # SparkContext at import time
    return F.array().cast("array<string>")


def is_ipv4_string(s) -> Column:
    """CH isIPv4String(): strict dotted-quad with 0-255 octets."""
    return F.coalesce(_c(s).rlike(_V4_RE), F.lit(False))


def _ipv6_hex(s) -> Column:
    """Parse IPv6 text -> 32-char lowercase hex, NULL when invalid.
    Handles ``::`` compression and an embedded dotted-IPv4 tail."""
    t0 = F.lower(F.trim(_c(s)))

    def with_text(t: Column) -> Column:
        v4 = F.regexp_extract(t, r"(?:^|:)((\d{1,3}\.){3}\d{1,3})$", 1)

        def with_v4(v4c: Column) -> Column:
            v4_ok = v4c.rlike(_V4_RE)
            v4hex = F.lpad(
                F.lower(F.hex(ip4_to_long(v4c))), 8, "0"
            )
            rewritten = F.concat(
                F.substring(t, F.lit(1), F.length(t) - F.length(v4c)),
                F.substring(v4hex, 1, 4),
                F.lit(":"),
                F.substring(v4hex, 5, 4),
            )
            t2 = F.when(v4c == "", t).when(v4_ok, rewritten)
            return _let(t2, _hex_from_groups_text)

        return _let(v4, with_v4)

    return _let(t0, with_text)


def _hex_from_groups_text(t2: Column) -> Column:
    """Colon-group text (no dotted tail) -> 32-char hex or NULL."""
    bad_dot = t2.contains(".")
    parts = F.split(t2, "::")

    def with_parts(p: Column) -> Column:
        dc = F.size(p) - 1
        p0 = F.try_element_at(p, F.lit(1))
        p1 = F.try_element_at(p, F.lit(2))
        full = F.split(t2, ":")
        l_arr = F.when(p0 == "", _empty_str_arr()).otherwise(
            F.split(p0, ":")
        )
        r_arr = F.when(
            F.coalesce(p1, F.lit("")) == "", _empty_str_arr()
        ).otherwise(F.split(F.coalesce(p1, F.lit("")), ":"))

        def with_lr(lr: Column) -> Column:
            l_, r_ = lr["l"], lr["r"]
            ok1 = (
                F.forall(l_, lambda g: g.rlike(_HEXG))
                & F.forall(r_, lambda g: g.rlike(_HEXG))
                & ((F.size(l_) + F.size(r_)) <= 7)
            )
            groups1 = F.concat(
                l_,
                F.array_repeat(
                    F.lit("0"), 8 - F.size(l_) - F.size(r_)
                ),
                r_,
            )
            ok0 = (F.size(full) == 8) & F.forall(
                full, lambda g: g.rlike(_HEXG)
            )
            groups = (
                F.when(bad_dot | (dc > 1), F.lit(None))
                .when(dc == 1, F.when(ok1, groups1))
                .otherwise(F.when(ok0, full))
            )
            return _let(
                groups,
                lambda g: F.when(
                    g.isNotNull(),
                    F.aggregate(
                        g,
                        F.lit(""),
                        lambda acc, e: F.concat(
                            acc, F.lpad(e, 4, "0")
                        ),
                    ),
                ),
            )

        return _let(
            F.struct(l_arr.alias("l"), r_arr.alias("r")), with_lr
        )

    return _let(parts, with_parts)


def is_ipv6_string(s) -> Column:
    """CH isIPv6String(): parseable as IPv6 text."""
    return _ipv6_hex(s).isNotNull()


def ipv6_string_to_num(s) -> Column:
    """CH IPv6StringToNum(): text -> 16 bytes. Also accepts a bare
    IPv4 string (maps to ::ffff:a.b.c.d, as CH does). NULL when
    invalid (CH throws — documented divergence; the OrNull spelling
    is exact)."""
    sc = _c(s)
    v4_mapped = F.concat(
        F.lit("00000000000000000000ffff"),
        F.lpad(F.lower(F.hex(ip4_to_long(sc))), 8, "0"),
    )
    return F.unhex(
        F.when(is_ipv4_string(sc), v4_mapped).otherwise(_ipv6_hex(sc))
    )


def ipv4_to_ipv6(n) -> Column:
    """CH IPv4ToIPv6(num): the ::ffff:a.b.c.d mapped 16 bytes."""
    return F.unhex(
        F.concat(
            F.lit("00000000000000000000ffff"),
            F.lpad(F.lower(F.hex(_c(n).cast("long"))), 8, "0"),
        )
    )


def _v4_tail_dotted(h: Column) -> Column:
    """Dotted text of the last 4 bytes of the 32-char hex."""
    return F.concat_ws(
        ".",
        F.conv(F.substring(h, 25, 2), 16, 10),
        F.conv(F.substring(h, 27, 2), 16, 10),
        F.conv(F.substring(h, 29, 2), 16, 10),
        F.conv(F.substring(h, 31, 2), 16, 10),
    )


def ipv6_num_to_string(b) -> Column:
    """CH IPv6NumToString(): 16 bytes -> canonical compressed text
    (glibc inet_ntop rules; see module docstring)."""
    h0 = F.lower(F.hex(_c(b)))

    def with_hex(h: Column) -> Column:
        gvals = F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: F.conv(
                F.substring(h, i * 4 + 1, 4), 16, 10
            ).cast("int"),
        )

        def with_gvals(gv: Column) -> Column:
            lead = F.aggregate(
                gv,
                F.struct(
                    F.lit(0).alias("n"), F.lit(False).alias("stop")
                ),
                lambda acc, v: F.struct(
                    F.when(acc["stop"] | (v != 0), acc["n"])
                    .otherwise(acc["n"] + 1)
                    .alias("n"),
                    (acc["stop"] | (v != 0)).alias("stop"),
                ),
            )["n"]

            def with_lead(ld: Column) -> Column:
                g6 = F.element_at(gv, 6)
                g8 = F.element_at(gv, 8)
                mapped = (ld == 5) & (g6 == 0xFFFF)
                v4tail = (
                    (ld == 6)
                    | ((ld == 7) & (g8 != 1))
                    | mapped
                )
                v4out = F.concat(
                    F.lit("::"),
                    F.when(mapped, F.lit("ffff:")).otherwise(
                        F.lit("")
                    ),
                    _v4_tail_dotted(h),
                )
                trimmed = F.transform(
                    gv, lambda v: F.lower(F.hex(v))
                )
                return F.when(v4tail, v4out).otherwise(
                    _let(trimmed, lambda tg: _compress(tg, gv))
                )

            return _let(lead, with_lead)

        return _let(gvals, with_gvals)

    return F.when(F.length(h0) == 32, _let(h0, with_hex))


def _compress(tg: Column, gv: Column) -> Column:
    """Join 8 trimmed groups with the longest zero run (first on
    tie, length >= 2) compressed to ``::``."""
    best = F.aggregate(
        F.sequence(F.lit(1), F.lit(8)),
        F.struct(
            F.lit(0).alias("cs"), F.lit(0).alias("cl"),
            F.lit(0).alias("bs"), F.lit(0).alias("bl"),
        ),
        lambda acc, i: _let(
            F.when(
                F.element_at(gv, i) == 0,
                F.struct(
                    F.when(acc["cl"] == 0, i)
                    .otherwise(acc["cs"])
                    .alias("cs"),
                    (acc["cl"] + 1).alias("cl"),
                ),
            ).otherwise(
                F.struct(F.lit(0).alias("cs"), F.lit(0).alias("cl"))
            ),
            lambda cur: F.struct(
                cur["cs"].alias("cs"),
                cur["cl"].alias("cl"),
                F.when(cur["cl"] > acc["bl"], cur["cs"])
                .otherwise(acc["bs"])
                .alias("bs"),
                F.greatest(cur["cl"], acc["bl"]).alias("bl"),
            ),
        ),
    )

    def with_best(b: Column) -> Column:
        bs, bl = b["bs"], b["bl"]
        left = F.array_join(F.slice(tg, 1, bs - 1), ":")
        right = F.array_join(
            F.slice(
                tg, bs + bl, F.lit(8) - (bs + bl) + 1
            ),
            ":",
        )
        return F.when(
            bl >= 2, F.concat(left, F.lit("::"), right)
        ).otherwise(F.array_join(tg, ":"))

    return _let(best, with_best)


def cut_ipv6(b, bytes_v6, bytes_v4) -> Column:
    """CH cutIPv6(x, bytesToCutForIPv6, bytesToCutForIPv4): zero the
    trailing N bytes (N chosen by whether the value is an
    IPv4-mapped address) and format."""
    h0 = F.lower(F.hex(_c(b)))
    b6 = _c(int(bytes_v6) if not isinstance(bytes_v6, Column) else bytes_v6)
    b4 = _c(int(bytes_v4) if not isinstance(bytes_v4, Column) else bytes_v4)

    def with_hex(h: Column) -> Column:
        mapped = h.startswith("00000000000000000000ffff")
        k = F.when(mapped, b4).otherwise(b6).cast("int")
        return _let(
            k,
            lambda kc: ipv6_num_to_string(
                F.unhex(
                    F.rpad(
                        F.substring(
                            h, F.lit(1), F.lit(32) - kc * 2
                        ),
                        32,
                        "0",
                    )
                )
            ),
        )

    return F.when(F.length(h0) == 32, _let(h0, with_hex))


# ------------------------------------------------------------------ MAC


# the FULL six-group shape, validated before separators are stripped:
# CH rejects colon-less or misplaced-colon inputs ('aabbccddeeff',
# 'aa:bbcc:dd:ee:ff:') with 0, so the strip-then-check spelling was
# accepting strings CH refuses
_MAC_RE = r"^[0-9a-f]{2}(:[0-9a-f]{2}){5}$"


def mac_string_to_num(s) -> Column:
    """CH MACStringToNum('AA:BB:CC:DD:EE:FF') -> UInt64; 0 when the
    format is invalid (CH's own contract)."""
    lowered = F.lower(_c(s))
    return _let(
        lowered,
        lambda c: F.when(
            c.rlike(_MAC_RE),
            F.conv(F.regexp_replace(c, ":", ""), 16, 10).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def mac_num_to_string(n) -> Column:
    """CH MACNumToString(num) -> 'AA:BB:CC:DD:EE:FF' (uppercase)."""
    h = F.lpad(F.upper(F.hex(_c(n).cast("long"))), 12, "0")
    return F.regexp_replace(h, "(..)(?!$)", "$1:")


def mac_string_to_oui(s) -> Column:
    """CH MACStringToOUI(): the first three octets as a number; 0 on
    invalid input."""
    lowered = F.lower(_c(s))
    return _let(
        lowered,
        lambda c: F.when(
            c.rlike(_MAC_RE),
            F.conv(
                F.regexp_replace(F.substring(c, 1, 8), ":", ""), 16, 10
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


# ------------------------------------------------- toIPv4 / toIPv6


def to_ipv4(s) -> Column:
    """CH toIPv4(): numeric IPv4 carrier (the engine's IPv4 shape is
    the IPv4StringToNum int64); NULL when invalid (CH throws)."""
    sc = _c(s)
    return F.when(is_ipv4_string(sc), ip4_to_long(sc))


def to_ipv4_or_zero(s) -> Column:
    return F.coalesce(to_ipv4(s), F.lit(0).cast("long"))


def to_ipv6(s) -> Column:
    """CH toIPv6(): 16-byte carrier; IPv4 text maps to ::ffff:x."""
    return ipv6_string_to_num(s)


def to_ipv6_or_zero(s) -> Column:
    return F.coalesce(
        to_ipv6(s), F.unhex(F.lit("0" * 32))
    )


CH_IPV6_FUNCTIONS = {
    "isIPv4String": is_ipv4_string,
    "isIPv6String": is_ipv6_string,
    "IPv6StringToNum": ipv6_string_to_num,
    "IPv6StringToNumOrNull": ipv6_string_to_num,
    # OrDefault: CH falls back to the type default (the :: zero
    # address), not NULL
    "IPv6StringToNumOrDefault": lambda s, *d: F.coalesce(
        ipv6_string_to_num(s),
        _c(d[0]) if d else F.unhex(F.lit("0" * 32)),
    ),
    "IPv6NumToString": ipv6_num_to_string,
    "INET6_ATON": ipv6_string_to_num,
    "INET6_NTOA": ipv6_num_to_string,
    "IPv4ToIPv6": ipv4_to_ipv6,
    "cutIPv6": cut_ipv6,
    "toIPv4": to_ipv4,
    "toIPv4OrNull": to_ipv4,
    "toIPv4OrZero": to_ipv4_or_zero,
    "toIPv6": to_ipv6,
    "toIPv6OrNull": to_ipv6,
    "toIPv6OrZero": to_ipv6_or_zero,
    "MACStringToNum": mac_string_to_num,
    "MACNumToString": mac_num_to_string,
    "MACStringToOUI": mac_string_to_oui,
    # full-16-byte dotted helper CH pairs with the v4 family
    "IPv4NumToStringClassC": lambda n: F.concat(
        F.regexp_replace(long_to_ip4(_c(n)), r"\.\d+$", ""),
        F.lit(".xxx"),
    ),
}
