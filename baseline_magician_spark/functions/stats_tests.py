"""Statistical-test and interval aggregates (CH behavioral family).

simpleLinearRegression, boundingRatio, entropy, deltaSum[Timestamp],
exponentialMovingAverage, intervalLengthSum, maxIntersections,
studentTTest / welchTTest / mannWhitneyUTest / kolmogorovSmirnovTest,
histogram, sparkbar, groupBitmap.

Design notes (the 100 TB contract):

- The t-tests, simpleLinearRegression and boundingRatio are FLAT
  aggregate expressions — conditional sums/moments that partial-
  aggregate map-side and merge associatively; no per-group state.
- The order-dependent family (deltaSumTimestamp, EMA,
  intervalLengthSum, maxIntersections) and the rank-based tests
  (mannWhitneyUTest, kolmogorovSmirnovTest) collect the group's
  events into a sorted array and fold it with ONE JVM ``F.aggregate``
  expression — the same bounded-per-group-state shape as
  windowFunnel (functions/funnel.py); per-group memory is O(group
  size), exactly the state CH's own implementations carry.
- p-values use the large-sample normal / Kolmogorov asymptotic
  approximations (documented per function) — CH uses the same
  asymptotics; tiny-sample exact tables are out of scope. The normal
  CDF is the Abramowitz–Stegun 7.1.26 polynomial, a pure Column
  expression.
- ``histogram`` is a DETERMINISTIC equal-width n-bin histogram; CH's
  is an adaptive streaming sketch whose bin edges depend on input
  order (non-deterministic under shuffle) — divergence documented.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(c) -> Column:
    c = c if isinstance(c, Column) else F.lit(c)
    return c.cast("double")


def _norm_cdf(z: Column) -> Column:
    """Φ(z) via Abramowitz–Stegun 7.1.26 (|ε| < 7.5e-8)."""
    t = 1.0 / (1.0 + 0.2316419 * F.abs(z))
    poly = t * (
        0.319381530
        + t
        * (
            -0.356563782
            + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))
        )
    )
    pdf = F.exp(-z * z / 2) / 2.5066282746310002  # sqrt(2*pi)
    upper = pdf * poly  # 1 - Φ(|z|)
    return F.when(z >= 0, 1 - upper).otherwise(upper)


def _two_sided_p(z: Column) -> Column:
    return 2.0 * (1.0 - _norm_cdf(F.abs(z)))


# --------------------------------------------------------- flat aggregates


def simple_linear_regression(x, y) -> Column:
    """CH simpleLinearRegression(x, y) -> (k, b) least-squares line.
    Closed form over five plain sums — fully map-side partialable.
    Degenerate groups (n < 2 or constant x) return NULL fields: ANSI
    double division RAISES on /0 in Spark 4, and NULL is what the
    DuckDB regr_* twins produce for the same inputs."""
    x, y = _d(x), _d(y)
    n = F.count(x).cast("double")
    sx, sy = F.sum(x), F.sum(y)
    sxx, sxy = F.sum(x * x), F.sum(x * y)
    den = n * sxx - sx * sx
    k_expr = (n * sxy - sx * sy) / den
    k = F.when(den != 0.0, k_expr)
    b = F.when(den != 0.0, (sy - k_expr * sx) / n)
    return F.struct(k.alias("k"), b.alias("b"))


def bounding_ratio(x, y) -> Column:
    """CH boundingRatio: slope of the bounding box, (max y - min y) /
    (max x - min x); NULL when the x span is zero (ANSI-safe — CH's
    float path yields inf/nan there, but Spark 4 RAISES on /0)."""
    x, y = _d(x), _d(y)
    span = F.max(x) - F.min(x)
    return F.when(span != 0.0, (F.max(y) - F.min(y)) / span)


def entropy_agg(x) -> Column:
    """CH entropy(x): Shannon entropy (bits) of the value
    distribution. Group values collect into one array, distinct
    values count against it — O(n·d) per group, bounded by the
    group's size like every CH per-group aggregate state. NULL rows
    are skipped (CH skips NULL aggregate arguments — and the -If
    combinator's NULL mask relies on it)."""
    arr = F.collect_list(_col_str(x))
    n = F.size(arr).cast("double")
    return F.aggregate(
        F.array_distinct(arr),
        F.lit(0.0),
        lambda acc, v: acc
        - (
            F.size(F.filter(arr, lambda e: e == v)).cast("double") / n
        )
        * F.log2(
            F.size(F.filter(arr, lambda e: e == v)).cast("double") / n
        ),
    )


def _col_str(x) -> Column:
    c = x if isinstance(x, Column) else F.lit(x)
    return c.cast("string")


def group_bitmap(x) -> Column:
    """CH groupBitmap: cardinality of the integer set = exact distinct
    count (CH materializes a roaring bitmap; the answer is the same)."""
    return F.count_distinct(x if isinstance(x, Column) else F.lit(x))


def student_t_test(v, idx, conf=None) -> Column:
    """CH studentTTest([confidence])(value, sample_index) ->
    (t_statistic, p_value). Pooled-variance two-sample t; the p-value
    is the large-sample normal approximation of the t distribution
    (documented; CH evaluates the exact t CDF). Flat conditional
    moments — no per-group state."""
    v = _d(v)
    i1 = (idx if isinstance(idx, Column) else F.lit(idx)).cast("int") != 0
    # count only rows with a non-NULL value: NULL rows are excluded
    # from the sums by F.sum already, and counting them would bias
    # the means (CH skips NULL aggregate arguments entirely)
    n0 = F.sum(
        F.when(~i1 & v.isNotNull(), 1).otherwise(0)
    ).cast("double")
    n1 = F.sum(
        F.when(i1 & v.isNotNull(), 1).otherwise(0)
    ).cast("double")
    s0 = F.sum(F.when(~i1, v))
    s1 = F.sum(F.when(i1, v))
    q0 = F.sum(F.when(~i1, v * v))
    q1 = F.sum(F.when(i1, v * v))
    m0, m1 = s0 / n0, s1 / n1
    var0 = (q0 - s0 * s0 / n0) / (n0 - 1)
    var1 = (q1 - s1 * s1 / n1) / (n1 - 1)
    sp2 = ((n0 - 1) * var0 + (n1 - 1) * var1) / (n0 + n1 - 2)
    t = (m0 - m1) / F.sqrt(sp2 * (1 / n0 + 1 / n1))
    return F.struct(
        t.alias("t_statistic"), _two_sided_p(t).alias("p_value")
    )


def welch_t_test(v, idx, conf=None) -> Column:
    """CH welchTTest([confidence])(value, sample_index) ->
    (t_statistic, p_value); unequal-variance form, same normal-
    approximation caveat as studentTTest."""
    v = _d(v)
    i1 = (idx if isinstance(idx, Column) else F.lit(idx)).cast("int") != 0
    # count only rows with a non-NULL value: NULL rows are excluded
    # from the sums by F.sum already, and counting them would bias
    # the means (CH skips NULL aggregate arguments entirely)
    n0 = F.sum(
        F.when(~i1 & v.isNotNull(), 1).otherwise(0)
    ).cast("double")
    n1 = F.sum(
        F.when(i1 & v.isNotNull(), 1).otherwise(0)
    ).cast("double")
    s0 = F.sum(F.when(~i1, v))
    s1 = F.sum(F.when(i1, v))
    q0 = F.sum(F.when(~i1, v * v))
    q1 = F.sum(F.when(i1, v * v))
    m0, m1 = s0 / n0, s1 / n1
    var0 = (q0 - s0 * s0 / n0) / (n0 - 1)
    var1 = (q1 - s1 * s1 / n1) / (n1 - 1)
    t = (m0 - m1) / F.sqrt(var0 / n0 + var1 / n1)
    return F.struct(
        t.alias("t_statistic"), _two_sided_p(t).alias("p_value")
    )


# ------------------------------------------------- sorted-array folds


def _sorted_pairs(a: Column, b: Column) -> Column:
    """collect_list of (a, b) structs, lexicographically sorted —
    the per-group event tape every fold below walks. NULL pairs are
    skipped (CH aggregates ignore NULL arguments; an unfiltered
    struct would smuggle the NULL through collect_list and poison
    the fold)."""
    return F.sort_array(
        F.collect_list(
            F.when(
                a.isNotNull() & b.isNotNull(),
                F.struct(a.alias("a"), b.alias("b")),
            )
        )
    )


def delta_sum_timestamp(v, ts) -> Column:
    """CH deltaSumTimestamp(value, ts): sum of positive deltas between
    consecutive values in ts order — deterministic (the ts sort fixes
    the walk)."""
    tape = _sorted_pairs(
        (ts if isinstance(ts, Column) else F.lit(ts)), _d(v)
    )
    out = F.aggregate(
        tape,
        F.struct(
            F.lit(0.0).alias("total"),
            F.lit(None).cast("double").alias("prev"),
        ),
        lambda acc, e: F.struct(
            (
                acc["total"]
                + F.when(
                    acc["prev"].isNotNull() & (e["b"] > acc["prev"]),
                    e["b"] - acc["prev"],
                ).otherwise(F.lit(0.0))
            ).alias("total"),
            e["b"].alias("prev"),
        ),
    )
    return out["total"]


def delta_sum(v) -> Column:
    """CH deltaSum(value): sum of positive deltas in INPUT order.
    Exactly CH's caveat applies — the walk order is the collected
    block order, deterministic only when the group arrives sorted in
    one partition. Prefer deltaSumTimestamp."""
    arr = F.collect_list(_d(v))
    out = F.aggregate(
        arr,
        F.struct(
            F.lit(0.0).alias("total"),
            F.lit(None).cast("double").alias("prev"),
        ),
        lambda acc, e: F.struct(
            (
                acc["total"]
                + F.when(
                    acc["prev"].isNotNull() & (e > acc["prev"]),
                    e - acc["prev"],
                ).otherwise(F.lit(0.0))
            ).alias("total"),
            e.alias("prev"),
        ),
    )
    return out["total"]


def exponential_moving_average(v, t, halflife=1.0) -> Column:
    """CH exponentialMovingAverage(halflife)(value, time): the
    exponentially smoothed weighted average — walk the ts-sorted tape
    decaying both the value sum and the weight sum by
    2^(-Δt/halflife) at every step (CH's own streaming recurrence);
    the result is Σ v·2^(-(t_max - t_i)/h) / Σ 2^(-(t_max - t_i)/h)."""
    h = float(str(halflife)) if not isinstance(halflife, Column) else None
    if h is None or h <= 0:
        raise ValueError(
            "exponentialMovingAverage needs a positive literal halflife"
        )
    tape = _sorted_pairs(
        (t if isinstance(t, Column) else F.lit(t)).cast("double"), _d(v)
    )
    out = F.aggregate(
        tape,
        F.struct(
            F.lit(0.0).alias("num"),
            F.lit(0.0).alias("den"),
            F.lit(None).cast("double").alias("prev_t"),
        ),
        lambda acc, e: F.struct(
            (
                acc["num"]
                * F.coalesce(
                    F.pow(
                        F.lit(2.0), -(e["a"] - acc["prev_t"]) / F.lit(h)
                    ),
                    F.lit(1.0),
                )
                + e["b"]
            ).alias("num"),
            (
                acc["den"]
                * F.coalesce(
                    F.pow(
                        F.lit(2.0), -(e["a"] - acc["prev_t"]) / F.lit(h)
                    ),
                    F.lit(1.0),
                )
                + 1.0
            ).alias("den"),
            e["a"].alias("prev_t"),
        ),
    )
    return out["num"] / out["den"]


def interval_length_sum(s, e) -> Column:
    """CH intervalLengthSum(start, end): total length of the UNION of
    the group's [start, end] intervals — sorted sweep, overlap
    merged."""
    tape = _sorted_pairs(_d(s), _d(e))
    out = F.aggregate(
        tape,
        F.struct(
            F.lit(0.0).alias("total"),
            F.lit(None).cast("double").alias("cov"),
        ),
        lambda acc, iv: F.struct(
            (
                acc["total"]
                + F.when(
                    acc["cov"].isNull() | (iv["a"] > acc["cov"]),
                    iv["b"] - iv["a"],
                )
                .when(iv["b"] > acc["cov"], iv["b"] - acc["cov"])
                .otherwise(F.lit(0.0))
            ).alias("total"),
            F.greatest(
                F.coalesce(acc["cov"], iv["b"]), iv["b"]
            ).alias("cov"),
        ),
    )
    return out["total"]


def max_intersections(s, e) -> Column:
    """CH maxIntersections(start, end): the maximum number of
    simultaneously open [start, end) intervals — +1/-1 event sweep;
    ends sort before starts at equal time (half-open semantics)."""
    ev = F.flatten(
        F.collect_list(
            F.array(
                F.struct(_d(s).alias("a"), F.lit(1).alias("b")),
                F.struct(_d(e).alias("a"), F.lit(-1).alias("b")),
            )
        )
    )
    out = F.aggregate(
        F.sort_array(ev),
        F.struct(F.lit(0).alias("cur"), F.lit(0).alias("best")),
        lambda acc, p: F.struct(
            (acc["cur"] + p["b"]).alias("cur"),
            F.greatest(acc["best"], acc["cur"] + p["b"]).alias("best"),
        ),
    )
    return out["best"].cast("long")


def _run_end(arr: Column, i: Column, n: Column) -> Column:
    """True when element i closes a run of equal sort-key 'a'.
    try_element_at: reading past the end at i+1 must yield NULL, not
    the ANSI out-of-bounds error."""
    nxt = F.try_element_at(arr, i + 1)
    return (i == n) | (F.element_at(arr, i)["a"] != nxt["a"])


def mann_whitney_u_test(v, idx, alternative="two-sided", *extra) -> Column:
    """CH mannWhitneyUTest([alternative[, continuity]])(value,
    sample_index) -> (u_statistic, p_value). U of sample 0 from
    average-tie ranks; p is the tie-corrected normal approximation
    (CH's own large-sample path). The rank walk folds the value-
    sorted tape once, flushing at run (tie-group) boundaries. The
    tape and the fold result are LET-bound: referencing the
    sort_array tree inside the per-position step would re-sort the
    group per element — O(n² log n)."""
    tape_expr = _sorted_pairs(
        _d(v),
        (idx if isinstance(idx, Column) else F.lit(idx)).cast("int"),
    )
    idx_c = (idx if isinstance(idx, Column) else F.lit(idx)).cast("int")
    # the sample sizes must mirror the tape's NULL-pair skipping
    vnn = _d(v).isNotNull()
    n0 = F.sum(
        F.when((idx_c == 0) & vnn, 1).otherwise(0)
    ).cast("double")
    n1 = F.sum(
        F.when((idx_c != 0) & vnn, 1).otherwise(0)
    ).cast("double")
    alt = str(alternative).strip("'\"").lower()
    if alt not in ("two-sided", "two_sided", "greater", "less"):
        raise ValueError(f"unknown alternative {alternative!r}")

    def build(tape: Column) -> Column:
        n = F.size(tape)
        acc0 = F.struct(
            F.lit(0.0).alias("r0"),     # rank-sum of sample 0
            F.lit(0.0).alias("ties"),   # Σ (t^3 - t) over tie groups
            F.lit(0).alias("rlen"),     # current run length
            F.lit(0).alias("rc0"),      # sample-0 members in the run
        )

        def step(acc: Column, i: Column) -> Column:
            e = F.element_at(tape, i)
            rlen = acc["rlen"] + 1
            rc0 = acc["rc0"] + F.when(e["b"] == 0, 1).otherwise(0)
            closes = _run_end(tape, i, n)
            # run spans [i - rlen + 1, i]; average rank is the
            # midpoint of that 1-based range
            avg_rank = (
                (i - rlen + 1).cast("double") + i.cast("double")
            ) / 2.0
            return F.struct(
                F.when(
                    closes, acc["r0"] + rc0.cast("double") * avg_rank
                )
                .otherwise(acc["r0"])
                .alias("r0"),
                F.when(
                    closes,
                    acc["ties"]
                    + rlen.cast("double") * rlen * rlen
                    - rlen.cast("double"),
                )
                .otherwise(acc["ties"])
                .alias("ties"),
                F.when(closes, F.lit(0)).otherwise(rlen).alias("rlen"),
                F.when(closes, F.lit(0)).otherwise(rc0).alias("rc0"),
            )

        def from_fold(folded: Column) -> Column:
            nn = n0 + n1
            u0 = folded["r0"] - n0 * (n0 + 1) / 2
            mean_u = n0 * n1 / 2
            var_u = (
                n0 * n1 / 12.0
                * ((nn + 1) - folded["ties"] / (nn * (nn - 1)))
            )
            # var = 0 (every value tied) leaves z undefined: NULL —
            # and guards the ANSI divide-by-zero that _let exposes
            # (the LET body always evaluates; the old inline spelling
            # only survived because Catalyst pruned unused p_value)
            return _let(
                F.when(
                    var_u > 0, (u0 - mean_u) / F.sqrt(var_u)
                ),
                lambda z: F.struct(
                    u0.alias("u_statistic"),
                    (
                        _two_sided_p(z)
                        if alt in ("two-sided", "two_sided")
                        else (1.0 - _norm_cdf(z))
                        if alt == "greater"
                        else _norm_cdf(z)
                    ).alias("p_value"),
                ),
            )

        return _let(
            F.aggregate(F.sequence(F.lit(1), n), acc0, step), from_fold
        )

    return _let(tape_expr, build)


def kolmogorov_smirnov_test(v, idx, *params) -> Column:
    """CH kolmogorovSmirnovTest(['two-sided'[, 'asymptotic']])(value,
    sample_index) -> (d_statistic, p_value). D = max ECDF gap over the
    merged sorted tape, evaluated at tie-group boundaries; p is the
    Kolmogorov asymptotic series with the Stephens small-sample
    correction. Tape, D, and λ are LET-bound (same O(n² log n)
    re-sort hazard as mannWhitneyUTest)."""
    tape_expr = _sorted_pairs(
        _d(v),
        (idx if isinstance(idx, Column) else F.lit(idx)).cast("int"),
    )
    idx_c = (idx if isinstance(idx, Column) else F.lit(idx)).cast("int")
    # the sample sizes must mirror the tape's NULL-pair skipping
    vnn = _d(v).isNotNull()
    n0 = F.sum(
        F.when((idx_c == 0) & vnn, 1).otherwise(0)
    ).cast("double")
    n1 = F.sum(
        F.when((idx_c != 0) & vnn, 1).otherwise(0)
    ).cast("double")

    def build(tape: Column) -> Column:
        n = F.size(tape)
        acc0 = F.struct(
            F.lit(0.0).alias("c0"),
            F.lit(0.0).alias("c1"),
            F.lit(0.0).alias("d"),
        )

        def step(acc: Column, i: Column) -> Column:
            e = F.element_at(tape, i)
            c0 = acc["c0"] + F.when(e["b"] == 0, 1.0).otherwise(0.0)
            c1 = acc["c1"] + F.when(e["b"] != 0, 1.0).otherwise(0.0)
            gap = F.abs(c0 / n0 - c1 / n1)
            return F.struct(
                c0.alias("c0"),
                c1.alias("c1"),
                F.when(
                    _run_end(tape, i, n) & (gap > acc["d"]), gap
                )
                .otherwise(acc["d"])
                .alias("d"),
            )

        def from_d(d: Column) -> Column:
            ne = n0 * n1 / (n0 + n1)
            lam_expr = (F.sqrt(ne) + 0.12 + 0.11 / F.sqrt(ne)) * d

            def from_lam(lam: Column) -> Column:
                # 2 Σ (-1)^(k-1) e^(-2 k² λ²), 25 terms
                p = F.aggregate(
                    F.sequence(F.lit(1), F.lit(25)),
                    F.lit(0.0),
                    lambda acc, k: acc
                    + 2.0
                    * F.pow(F.lit(-1.0), (k - 1).cast("double"))
                    * F.exp(
                        -2.0
                        * k.cast("double")
                        * k.cast("double")
                        * lam
                        * lam
                    ),
                )
                p = F.greatest(F.lit(0.0), F.least(F.lit(1.0), p))
                return F.struct(
                    d.alias("d_statistic"), p.alias("p_value")
                )

            return _let(lam_expr, from_lam)

        # one empty sample (or an all-NULL tape) leaves the test
        # undefined: NULL struct, not an ANSI /0 or a sequence(1, 0)
        # descent — the When keeps the fold out of the evaluated
        # branch for those groups
        return F.when(
            (n0 > 0) & (n1 > 0),
            _let(
                F.aggregate(F.sequence(F.lit(1), n), acc0, step)["d"],
                from_d,
            ),
        ).otherwise(
            F.struct(
                F.lit(None).cast("double").alias("d_statistic"),
                F.lit(None).cast("double").alias("p_value"),
            )
        )

    return _let(tape_expr, build)


def histogram_agg(x, nbins=10) -> Column:
    """histogram(n)(x) -> array<(lo, hi, cnt)> over n EQUAL-WIDTH
    bins. Divergence: CH's histogram is an adaptive streaming sketch
    whose bin edges depend on arrival order (non-deterministic under
    shuffle); the equal-width form is deterministic and mergeable —
    the property a distributed engine actually wants. (lo, width)
    are LET-bound: referencing array_min/array_max inside the
    per-element bucket test would rescan the group per element."""
    nb = int(float(str(nbins)))
    if nb <= 0:
        raise ValueError("histogram needs a positive bin count")
    arr_expr = F.collect_list(_d(x))

    def build(arr: Column) -> Column:
        lo_expr = F.array_min(arr)
        hi_expr = F.array_max(arr)
        bounds = F.struct(
            lo_expr.alias("lo"),
            F.when(
                hi_expr > lo_expr, (hi_expr - lo_expr) / nb
            )
            .otherwise(F.lit(1.0))
            .alias("width"),
        )

        def with_bounds(b_: Column) -> Column:
            lo, width = b_["lo"], b_["width"]

            def bucket(v: Column) -> Column:
                return F.least(
                    F.floor((v - lo) / width).cast("int"),
                    F.lit(nb - 1),
                )

            return F.transform(
                F.sequence(F.lit(0), F.lit(nb - 1)),
                lambda b: F.struct(
                    (lo + b.cast("double") * width).alias("lo"),
                    (lo + (b + 1).cast("double") * width).alias("hi"),
                    F.size(
                        F.filter(arr, lambda v: bucket(v) == b)
                    ).cast("long").alias("cnt"),
                ),
            )

        return _let(bounds, with_bounds)

    return _let(arr_expr, build)


# ------------------------------------- categorical association family
#
# cramersV / cramersVBiasCorrected / theilsU / contingency — CH's
# association aggregates over two (categorical) columns. Shape: the
# group's (x, y) pairs collect into ONE sorted tape (Spark dedups the
# identical collect_list buffer across the four expressions), the
# contingency cells derive from it in O(n) via a run-length fold, and
# every statistic is a fold over the SMALL cells array.
#
# The LET discipline matters for performance, not just style: Spark
# evaluates higher-order-function lambdas interpreted and re-evaluates
# a captured argument expression on EVERY lambda invocation — naively
# referencing `cells` inside a per-cell lookup re-derives the whole
# cells array per element (observed: minutes per group at a few
# thousand rows). `_let` binds each derived value once as a lambda
# variable (a runtime VALUE), restoring the intended O(n + cells·r)
# cost.


def _let(value: Column, body) -> Column:
    """Poor man's LET for Column expressions: bind ``value`` once —
    transform over a single-element array makes it a lambda variable,
    so the body sees a runtime value, never a re-evaluated tree."""
    return F.element_at(F.transform(F.array(value), body), 1)


def _assoc_tape(x, y) -> Column:
    """Sorted per-group (x, y) tape; NULL categories carry a sentinel
    so they count as their own key (the oracle's GROUP BY NULL
    behavior)."""
    xs = F.coalesce(_col_str(x), F.lit("∅null"))
    ys = F.coalesce(_col_str(y), F.lit("∅null"))
    return F.sort_array(
        F.collect_list(F.struct(xs.alias("x"), ys.alias("y")))
    )


def _rle_cells(t: Column) -> Column:
    """Contingency cells array<struct<x,y,cnt>> from the SORTED tape:
    one O(n) run-length fold (equal pairs are adjacent)."""
    n = F.size(t)
    init = F.struct(
        F.array().cast(
            "array<struct<x:string,y:string,cnt:double>>"
        ).alias("cells"),
        F.lit(0).alias("run"),
    )

    def step(acc: Column, i: Column) -> Column:
        e = F.element_at(t, i)
        run = acc["run"] + 1
        closes = (i == n) | (F.try_element_at(t, i + 1) != e)
        return F.struct(
            F.when(
                closes,
                F.concat(
                    acc["cells"],
                    F.array(
                        F.struct(
                            e["x"].alias("x"),
                            e["y"].alias("y"),
                            run.cast("double").alias("cnt"),
                        )
                    ),
                ),
            )
            .otherwise(acc["cells"])
            .alias("cells"),
            F.when(closes, F.lit(0)).otherwise(run).alias("run"),
        )

    seq = F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.aggregate(seq, init, step)["cells"]


def _marginal(cells: Column, field: str) -> Column:
    """array<struct<k,cnt>> marginal sums over the cells VALUE —
    O(keys · cells), both small."""
    keys = F.array_distinct(F.transform(cells, lambda e: e[field]))
    return F.transform(
        keys,
        lambda kv: F.struct(
            kv.alias("k"),
            F.aggregate(
                cells,
                F.lit(0.0),
                lambda a, cc: a
                + F.when(cc[field] == kv, cc["cnt"]).otherwise(0.0),
            ).alias("cnt"),
        ),
    )


def _marg_lookup(marg: Column, k: Column) -> Column:
    return F.element_at(F.filter(marg, lambda m: m["k"] == k), 1)["cnt"]


def _chi_squared(cells, rowcnts, colcnts, n) -> Column:
    """Pearson χ² = Σ_cells (o - e)²/e with e = rowsum·colsum/n."""

    def term(cc: Column) -> Column:
        e = (
            _marg_lookup(rowcnts, cc["x"])
            * _marg_lookup(colcnts, cc["y"])
            / n
        )
        return ((cc["cnt"] - e) ** 2) / e

    return F.aggregate(
        cells, F.lit(0.0), lambda a, cc: a + term(cc)
    )


def _assoc_stat(x, y, builder) -> Column:
    """Common scaffold: tape -> cells -> marginals, each LET-bound
    once; ``builder(n, cells, rowcnts, colcnts)`` emits the
    statistic."""
    return _let(
        _assoc_tape(x, y),
        lambda t: _let(
            _rle_cells(t),
            lambda cells: _let(
                _marginal(cells, "x"),
                lambda rowc: _let(
                    _marginal(cells, "y"),
                    lambda colc: builder(
                        F.size(t).cast("double"), cells, rowc, colc
                    ),
                ),
            ),
        ),
    )


def cramers_v(x, y) -> Column:
    """CH cramersV(x, y) = sqrt(χ²/n / min(r-1, c-1)); NULL when
    either column is constant (min(r-1, c-1) = 0)."""

    def build(n, cells, rowc, colc):
        chi2 = _chi_squared(cells, rowc, colc, n)
        r = F.size(rowc).cast("double")
        c = F.size(colc).cast("double")
        den = F.least(r - 1, c - 1)
        return F.when(den > 0, F.sqrt(chi2 / n / den))

    return _assoc_stat(x, y, build)


def cramers_v_bias_corrected(x, y) -> Column:
    """CH cramersVBiasCorrected(x, y): the Bergsma-Wicher corrected
    V — φ²_corr = max(0, χ²/n - (r-1)(c-1)/(n-1)), with the r/c
    denominators shrunk the same way."""

    def build(n, cells, rowc, colc):
        chi2 = _chi_squared(cells, rowc, colc, n)
        r = F.size(rowc).cast("double")
        c = F.size(colc).cast("double")
        phi2c = F.greatest(
            F.lit(0.0), chi2 / n - (r - 1) * (c - 1) / (n - 1)
        )
        rc = r - (r - 1) ** 2 / (n - 1)
        cc = c - (c - 1) ** 2 / (n - 1)
        den = F.least(rc - 1, cc - 1)
        return F.when(den > 0, F.sqrt(phi2c / den))

    return _assoc_stat(x, y, build)


def theils_u(x, y) -> Column:
    """theilsU(x, y) = (H(x) - H(x|y)) / H(x) — the uncertainty
    coefficient U(x|y) in natural log (the base cancels in the
    ratio); NULL when H(x) = 0 (x constant). CH's doc leaves the
    conditioning direction implicit; this is the standard
    'information about x provided by y' form."""

    def build(n, cells, rowc, colc):
        hx = -F.aggregate(
            rowc,
            F.lit(0.0),
            lambda a, m: a + (m["cnt"] / n) * F.log(m["cnt"] / n),
        )
        hxy = -F.aggregate(
            cells,
            F.lit(0.0),
            lambda a, cc: a
            + (cc["cnt"] / n)
            * F.log(cc["cnt"] / _marg_lookup(colc, cc["y"])),
        )
        return F.when(hx > 0, (hx - hxy) / hx)

    return _assoc_stat(x, y, build)


def contingency_coefficient(x, y) -> Column:
    """CH contingency(x, y) = sqrt(χ² / (χ² + n)) — Pearson's
    contingency coefficient; NULL on an empty group (0/0 would
    otherwise surface as NaN, diverging from SQL aggregate NULLs)."""

    def build(n, cells, rowc, colc):
        chi2 = _chi_squared(cells, rowc, colc, n)
        return F.when(n > 0, F.sqrt(chi2 / (chi2 + n)))

    return _assoc_stat(x, y, build)


_SPARKBAR_LEVELS = " ▁▂▃▄▅▆▇█"


def sparkbar_agg(x, *rest) -> Column:
    """sparkbar(width)(x[, y]) -> unicode bar string: the x range
    splits into ``width`` equal buckets, each rendered as one of nine
    block glyphs scaled to the bucket's Σy (Σ1 when y is omitted).
    ``rest`` disambiguates the optional y column (a Column) from the
    trailing width literal (a plain number)."""
    y, nbins = None, 8
    for r in rest:
        if isinstance(r, Column):
            y = r
        else:
            nbins = r
    nb = int(float(str(nbins)))
    if nb <= 0:
        raise ValueError("sparkbar needs a positive width")
    yv = _d(y) if y is not None else F.lit(1.0)
    arr_expr = F.collect_list(F.struct(_d(x).alias("a"), yv.alias("b")))

    # (lo, width), the bucket sums, and their max are LET-bound: the
    # naive spelling rescans the collected group per element (the
    # histogram_agg hazard) and re-buckets per glyph
    def build(arr: Column) -> Column:
        lo_expr = F.array_min(F.transform(arr, lambda e: e["a"]))
        hi_expr = F.array_max(F.transform(arr, lambda e: e["a"]))
        bounds = F.struct(
            lo_expr.alias("lo"),
            F.when(hi_expr > lo_expr, (hi_expr - lo_expr) / nb)
            .otherwise(F.lit(1.0))
            .alias("width"),
        )

        def with_bounds(b_: Column) -> Column:
            lo, width = b_["lo"], b_["width"]
            sums_expr = F.transform(
                F.sequence(F.lit(0), F.lit(nb - 1)),
                lambda b: F.aggregate(
                    F.filter(
                        arr,
                        lambda e: F.least(
                            F.floor((e["a"] - lo) / width).cast("int"),
                            F.lit(nb - 1),
                        )
                        == b,
                    ),
                    F.lit(0.0),
                    lambda acc, e: acc + e["b"],
                ),
            )

            def with_sums(sums: Column) -> Column:
                def glyph_row(mx: Column) -> Column:
                    glyphs = F.array(
                        *[F.lit(ch) for ch in _SPARKBAR_LEVELS]
                    )
                    return F.array_join(
                        F.transform(
                            sums,
                            lambda s: F.element_at(
                                glyphs,
                                F.when(
                                    (mx <= 0) | (s <= 0), F.lit(1)
                                ).otherwise(
                                    F.least(
                                        F.ceil(s / mx * 8).cast("int")
                                        + 1,
                                        F.lit(9),
                                    )
                                ),
                            ),
                        ),
                        "",
                    )

                return _let(F.array_max(sums), glyph_row)

            return _let(sums_expr, with_sums)

        return _let(bounds, with_bounds)

    return _let(arr_expr, build)


# ------------------------------------------------- round-6f additions


def _norm_ppf(p: float) -> float:
    """Inverse normal CDF (Acklam's rational approximation, |rel ε| <
    1.15e-9) for the PLAN-LITERAL confidence level — evaluated in
    Python at compile time, never per row."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"confidence quantile {p!r} outside (0, 1)")
    a = (-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00)
    import math as _m
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = _m.sqrt(-2 * _m.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
                * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if p > phigh:
        q = _m.sqrt(-2 * _m.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
                 * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4])
            * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)


def mean_z_test(v, idx, var0=1.0, var1=1.0, conf=0.95) -> Column:
    """CH meanZTest(population_variance_x, population_variance_y,
    confidence_level)(sample_data, sample_index) ->
    (z_statistic, p_value, confidence_interval_low,
    confidence_interval_high). Known-variance two-sample z; flat
    conditional moments (map-side partialable), the CI half-width is
    a plan literal via the Acklam inverse-Φ."""
    v = _d(v)
    i1 = (idx if isinstance(idx, Column) else F.lit(idx)).cast("int") != 0
    v0, v1 = float(str(var0)), float(str(var1))
    cl = float(str(conf))
    # NULL-valued rows are excluded from the counts too (CH skips
    # NULL aggregate arguments; counting them biases the means)
    n0 = F.sum(
        F.when(~i1 & v.isNotNull(), 1).otherwise(0)
    ).cast("double")
    n1 = F.sum(
        F.when(i1 & v.isNotNull(), 1).otherwise(0)
    ).cast("double")

    def guarded(both: Column) -> Column:
        m0 = F.sum(F.when(~i1, v)) / n0
        m1 = F.sum(F.when(i1, v)) / n1
        se = F.sqrt(F.lit(v0) / n0 + F.lit(v1) / n1)
        z = (m0 - m1) / se
        zq = _norm_ppf((1.0 + cl) / 2.0)
        return F.struct(
            F.when(both, z).alias("z_statistic"),
            F.when(both, _two_sided_p(z)).alias("p_value"),
            F.when(both, m0 - m1 - zq * se).alias(
                "confidence_interval_low"
            ),
            F.when(both, m0 - m1 + zq * se).alias(
                "confidence_interval_high"
            ),
        )

    # an empty sample on either side leaves the test undefined: NULL
    # fields, not an ANSI divide-by-zero (the When keeps the division
    # out of the evaluated branch)
    return guarded((n0 > 0) & (n1 > 0))


def rank_corr(x, y) -> Column:
    """CH rankCorr(x, y): Spearman rank correlation = Pearson over
    average-tie ranks. NULL pairs are skipped entirely (CH ignores
    NULL aggregate arguments — a NULL must not enter the tape with a
    fabricated rank).

    O(n log n) per group: average-tie ranks come from TWO natural
    array_sort passes with opposing index tie-breaks — within a tie
    run the reversed tie-break mirrors the run, so the mean of an
    element's two positional indexes is exactly the run's average
    rank ((run_start + run_end) / 2). Every sort is over plain
    structs (native lexicographic ordering, no comparator lambda);
    the interpreted-HOF work is a constant number of O(n) transforms,
    so a single hot group no longer needs the bounded-group re-key
    the O(n²) filter-rank version required."""
    xc, yc = _d(x), _d(y)
    pairs_expr = F.collect_list(
        F.when(
            xc.isNotNull() & yc.isNotNull(),
            F.struct(xc.alias("a"), yc.alias("b")),
        )
    )

    def ranks(p: Column, field: str) -> Column:
        """Average-tie ranks of p[*][field], aligned to p's order."""
        # (value, position) — position makes every struct distinct so
        # both sorts are total orders over the same multiset
        keyed = F.transform(
            p,
            lambda e, i: F.struct(
                e[field].alias("v"), (i + 1).alias("idx")
            ),
        )
        fwd = F.array_sort(keyed)  # (v asc, idx asc) — native
        rev = F.array_sort(
            F.transform(
                keyed,
                lambda e: F.struct(
                    e["v"].alias("v"), (-e["idx"]).alias("nidx")
                ),
            )
        )  # (v asc, idx desc)
        # invert each permutation: element at sorted position i+1 maps
        # its original idx to that position; sorting by idx re-aligns
        by_idx_fwd = F.array_sort(
            F.transform(
                fwd,
                lambda e, i: F.struct(
                    e["idx"].alias("idx"), (i + 1).alias("pos")
                ),
            )
        )
        by_idx_rev = F.array_sort(
            F.transform(
                rev,
                lambda e, i: F.struct(
                    (-e["nidx"]).alias("idx"), (i + 1).alias("pos")
                ),
            )
        )
        return F.zip_with(
            by_idx_fwd,
            by_idx_rev,
            lambda u, w: (u["pos"] + w["pos"]).cast("double") / 2.0,
        )

    def build(p: Column) -> Column:
        n = F.size(p).cast("double")

        def with_rx(rx: Column) -> Column:
            def with_ry(ry: Column) -> Column:
                add = lambda acc, e: acc + e  # noqa: E731
                # Σrank is (n(n+1)/2) by construction (tie-averaging
                # preserves the sum) — folds kept only where needed
                sx = n * (n + 1.0) / 2.0
                sy = sx
                sxx = F.aggregate(
                    rx, F.lit(0.0), lambda a, e: a + e * e
                )
                syy = F.aggregate(
                    ry, F.lit(0.0), lambda a, e: a + e * e
                )
                sxy = F.aggregate(
                    F.zip_with(rx, ry, lambda a, b: a * b),
                    F.lit(0.0),
                    add,
                )
                den = F.sqrt(
                    (n * sxx - sx * sx) * (n * syy - sy * sy)
                )
                return F.when(den > 0, (n * sxy - sx * sy) / den)

            return _let(ranks(p, "b"), with_ry)

        return _let(ranks(p, "a"), with_rx)

    return _let(pairs_expr, build)


def _exp_time_decayed(kind: str):
    """CH exponentialTimeDecayed{Sum,Count,Max,Avg}(x)(value, time):
    contributions decay by e^(-Δt/x) to the tape's LAST time point.
    One ts-sorted fold per group (EMA's recurrence); the stored
    running max decays multiplicatively, which is exact for any sign
    because every previous candidate shares the same positive step
    factor."""

    def agg(*args) -> Column:
        # CH's Count form takes ONLY the time column:
        # exponentialTimeDecayedCount(x)(t). The parser appends the
        # parameter after the inner columns, so a single inner column
        # arrives as (t_col, x_literal) — detect by the literal's
        # non-Column type. Sum/Max/Avg take (v, t[, x]).
        if kind == "Count" and args and (
            len(args) == 1
            or (len(args) == 2 and not isinstance(args[1], Column))
        ):
            t = args[0]
            x = args[1] if len(args) == 2 else 1.0
            v = F.lit(1.0)
        else:
            if len(args) < 2:
                raise ValueError(
                    f"exponentialTimeDecayed{kind} takes (value, time)"
                )
            v, t = args[0], args[1]
            x = args[2] if len(args) > 2 else 1.0
        xf = float(str(x))
        if xf <= 0:
            raise ValueError(
                f"exponentialTimeDecayed{kind} needs a positive "
                f"literal decay length, got {x!r}"
            )
        tape = _sorted_pairs(
            (t if isinstance(t, Column) else F.lit(t)).cast("double"),
            _d(v),
        )
        out = F.aggregate(
            tape,
            F.struct(
                F.lit(0.0).alias("s"),
                F.lit(0.0).alias("c"),
                F.lit(None).cast("double").alias("m"),
                F.lit(None).cast("double").alias("prev_t"),
            ),
            lambda acc, e: _let(
                F.coalesce(
                    F.exp(-(e["a"] - acc["prev_t"]) / F.lit(xf)),
                    F.lit(1.0),
                ),
                lambda dk: F.struct(
                    (acc["s"] * dk + e["b"]).alias("s"),
                    (acc["c"] * dk + 1.0).alias("c"),
                    F.greatest(acc["m"] * dk, e["b"]).alias("m"),
                    e["a"].alias("prev_t"),
                ),
            ),
        )
        if kind == "Sum":
            return out["s"]
        if kind == "Count":
            return out["c"]
        if kind == "Max":
            return out["m"]
        return out["s"] / out["c"]

    return agg


exponential_time_decayed_sum = _exp_time_decayed("Sum")
exponential_time_decayed_count = _exp_time_decayed("Count")
exponential_time_decayed_max = _exp_time_decayed("Max")
exponential_time_decayed_avg = _exp_time_decayed("Avg")


def _pair_corr(a: Column, b: Column) -> Column:
    """Pearson r from guarded raw moments over non-null PAIRS.
    Spark's built-in Corr raises an ANSI DIVIDE_BY_ZERO on
    single-row / constant groups; this spelling returns NULL there
    (DuckDB's corr() semantics, which the oracles compare against)."""
    both = a.isNotNull() & b.isNotNull()
    va, vb = F.when(both, a), F.when(both, b)
    n = F.sum(F.when(both, 1).otherwise(0)).cast("double")
    sa, sb = F.sum(va), F.sum(vb)
    saa, sbb = F.sum(va * va), F.sum(vb * vb)
    sab = F.sum(va * vb)
    den2 = (n * saa - sa * sa) * (n * sbb - sb * sb)
    return F.when(den2 > 0, (n * sab - sa * sb) / F.sqrt(den2))


def _pair_covar_samp(a: Column, b: Column) -> Column:
    both = a.isNotNull() & b.isNotNull()
    va, vb = F.when(both, a), F.when(both, b)
    n = F.sum(F.when(both, 1).otherwise(0)).cast("double")
    return F.when(
        n > 1, (F.sum(va * vb) - F.sum(va) * F.sum(vb) / n) / (n - 1)
    )


def corr_matrix(*cols) -> Column:
    """CH corrMatrix(c1, ..., cn) -> Array(Array(Float64)): full
    symmetric n×n Pearson matrix — a plain expression over n² flat
    moment aggregates, so it partial-aggregates map-side (n is the
    column count, a plan constant). Degenerate cells (single pair,
    zero variance) read NULL instead of the ANSI divide-by-zero the
    built-in Corr raises."""
    cs = [_d(c) for c in cols]
    return F.array(
        *[F.array(*[_pair_corr(a, b) for b in cs]) for a in cs]
    )


def covar_samp_matrix(*cols) -> Column:
    """CH covarSampMatrix(c1, ..., cn) -> Array(Array(Float64)) of
    sample covariances; same guarded-moment shape as corrMatrix."""
    cs = [_d(c) for c in cols]
    return F.array(
        *[F.array(*[_pair_covar_samp(a, b) for b in cs]) for a in cs]
    )


def categorical_iv(*args) -> Column:
    """CH categoricalInformationValue(cat1, ..., catN, tag) ->
    Array(Float64): the credit-scoring information value of each
    category column against the binary tag,
    IV = Σ_v (n_v1/n1 - n_v0/n0) · ln((n_v1/n1) / (n_v0/n0)).

    Divergence (documented): categories observed in only one class
    contribute 0 instead of CH's ±inf/nan term — Spark's ln(0) is
    NULL, which would otherwise poison the whole sum; the finite-part
    IV is the spelling every scoring pipeline uses anyway.

    One NULL-skipped (cat, tag) tape per category column; distinct
    categories enumerate from the tape (O(n·d) per group, d = distinct
    categories — the same bounded-tape contract as the contingency
    family)."""
    if len(args) < 2:
        raise ValueError(
            "categoricalInformationValue takes (cat..., tag)"
        )
    *cats, tag = args
    tagc = _d(tag)

    def iv(cat) -> Column:
        catc = F.coalesce(
            (cat if isinstance(cat, Column) else F.col(cat)).cast(
                "string"
            ),
            F.lit("∅null"),
        )
        tape_expr = _sorted_pairs(catc, tagc)

        def build(tape: Column) -> Column:
            n1 = F.size(F.filter(tape, lambda e: e["b"] != 0)).cast(
                "double"
            )
            n0 = F.size(F.filter(tape, lambda e: e["b"] == 0)).cast(
                "double"
            )

            def term(c1: Column, c0: Column) -> Column:
                t = (c1 / n1 - c0 / n0) * F.log(
                    (c1 / n1) / (c0 / n0)
                )
                return F.when((c1 > 0) & (c0 > 0), t).otherwise(
                    F.lit(0.0)
                )

            # ONE pass over the sorted tape (round 12): the tape is
            # sorted by (cat, tag), so each category is a contiguous
            # run — a run-length fold accumulates (c1, c0) per run
            # and flushes the category's IV term at each boundary,
            # in ascending-category order: the EXACT addition order
            # (and the exact per-category counts, hence bit-identical
            # doubles) of the former array_distinct + per-category
            # re-filter formulation, which rescanned the whole tape
            # ~8x per distinct category (O(n·d) interpreted work; the
            # profiled hot spot of ch_sql_categorical_iv).
            init = F.struct(
                F.lit(0.0).alias("acc"),
                F.lit(None).cast("string").alias("cur"),
                F.lit(0.0).alias("c1"),
                F.lit(0.0).alias("c0"),
            )

            def step(st: Column, e: Column) -> Column:
                new_run = st["cur"].isNull() | (st["cur"] != e["a"])
                flushed = F.when(
                    st["cur"].isNotNull() & (st["cur"] != e["a"]),
                    st["acc"] + term(st["c1"], st["c0"]),
                ).otherwise(st["acc"])
                base1 = F.when(new_run, F.lit(0.0)).otherwise(st["c1"])
                base0 = F.when(new_run, F.lit(0.0)).otherwise(st["c0"])
                return F.struct(
                    flushed.alias("acc"),
                    e["a"].alias("cur"),
                    (
                        base1
                        + F.when(e["b"] != 0, F.lit(1.0)).otherwise(
                            F.lit(0.0)
                        )
                    ).alias("c1"),
                    (
                        base0
                        + F.when(e["b"] == 0, F.lit(1.0)).otherwise(
                            F.lit(0.0)
                        )
                    ).alias("c0"),
                )

            total = F.aggregate(
                tape,
                init,
                step,
                lambda st: F.when(
                    st["cur"].isNotNull(),
                    st["acc"] + term(st["c1"], st["c0"]),
                ).otherwise(st["acc"]),
            )
            # no rows in either class -> the statistic is undefined
            return F.when((n1 > 0) & (n0 > 0), total)

        return _let(tape_expr, build)

    return F.array(*[iv(c) for c in cats])
