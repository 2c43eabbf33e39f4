"""String-similarity function family (CH §string-search-functions
surface): editDistance, damerauLevenshtein, stringJaccardIndex,
byteHammingDistance, ngramDistance, soundex difference.

Everything is a pure Column expression. editDistance rides Spark's
built-in levenshtein; damerauLevenshtein evaluates the OSA (optimal
string alignment) dynamic program as a JVM fold — the row-by-row DP
table lives in array state inside one ``F.aggregate``, O(n·m) work
per row pair, the same cost CH pays, with zero Python in the loop.

Divergences (documented):
- ngramDistance uses DISTINCT 4-gram sets and the Dice-style
  1 − 2·|A∩B|/(|A|+|B|) form; CH hashes 4-gram multisets. Both are
  0 (equal) .. 1 (disjoint) and rank near-duplicates identically.
- stringJaccardIndex treats both-empty as 0.0 (CH raises no error
  either; the set union is empty so no similarity is defined).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c) -> Column:
    return c if isinstance(c, Column) else F.lit(c)


def _chars(s) -> Column:
    """Array of single characters — split('') emits a trailing empty
    element that must drop."""
    return F.filter(F.split(_as_col(s), ""), lambda c: c != "")


def edit_distance(a, b) -> Column:
    """CH editDistance(a, b) == levenshtein — Spark's built-in."""
    return F.levenshtein(_as_col(a), _as_col(b))


def damerau_levenshtein(a, b) -> Column:
    """CH damerauLevenshtein(a, b): the OSA variant (each substring
    may be edited once; adjacent transposition costs 1). The DP table
    folds row-by-row: outer aggregate walks rows (chars of a), state
    carries (prev_prev_row, prev_row); the inner aggregate builds the
    current row left-to-right, reading left from its own tail, up /
    diag from prev_row, and the transposition cell from
    prev_prev_row. The char arrays are LET-bound: referencing the
    split() tree per DP cell re-splits the strings O(n·m) times."""
    return _let(
        F.struct(_chars(a).alias("ca"), _chars(b).alias("cb")),
        lambda cs: _damerau_from_chars(cs["ca"], cs["cb"]),
    )


def _damerau_from_chars(ca: Column, cb: Column) -> Column:
    n, m = F.size(ca), F.size(cb)
    big = F.lit(1 << 30)
    # row 0 = [0, 1, ..., m]
    row0 = F.sequence(F.lit(0), m)
    init = F.struct(
        F.array().cast("array<int>").alias("pp"),
        row0.cast("array<int>").alias("prev"),
    )

    def outer(acc: Column, i: Column) -> Column:
        prev, pp = acc["prev"], acc["pp"]

        def inner(row: Column, j: Column) -> Column:
            sub_cost = F.when(
                F.element_at(ca, i) == F.element_at(cb, j), 0
            ).otherwise(1)
            best = F.least(
                F.element_at(row, -1) + 1,          # insert (left)
                F.element_at(prev, j + 1) + 1,      # delete (up)
                F.element_at(prev, j) + sub_cost,   # substitute (diag)
                F.when(
                    (i > 1)
                    & (j > 1)
                    & (F.element_at(ca, i) == F.element_at(cb, j - 1))
                    & (F.element_at(ca, i - 1) == F.element_at(cb, j)),
                    F.element_at(pp, j - 1) + 1,    # transpose
                ).otherwise(big),
            )
            return F.concat(row, F.array(best))

        cur = F.aggregate(
            # sequence(1, 0) would DESCEND — clamp; the m == 0 case is
            # guarded out below
            F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
            F.array(i.cast("int")),
            inner,
        )
        return F.struct(prev.alias("pp"), cur.alias("prev"))

    folded = F.aggregate(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))), init, outer
    )
    return (
        F.when(n == 0, m)
        .when(m == 0, n)
        .otherwise(F.element_at(folded["prev"], m + 1))
        .cast("long")
    )


def string_jaccard_index(a, b) -> Column:
    """CH stringJaccardIndex(a, b): |chars(a) ∩ chars(b)| /
    |chars(a) ∪ chars(b)| over character sets; 0.0 when both empty."""
    sa = F.array_distinct(_chars(a))
    sb = F.array_distinct(_chars(b))
    union = F.size(F.array_union(sa, sb))
    inter = F.size(F.array_intersect(sa, sb))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


def byte_hamming_distance(a, b) -> Column:
    """CH byteHammingDistance(a, b): mismatched positions over the
    shorter length plus the length difference (CH counts the
    overhang as distance)."""
    ca, cb = _chars(a), _chars(b)
    mism = F.aggregate(
        F.zip_with(
            ca,
            cb,
            lambda x, y: F.when(
                x.isNull() | y.isNull() | (x != y), 1
            ).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return mism.cast("long")


def _ngrams4(s) -> Column:
    """Distinct 4-grams; strings shorter than 4 contribute themselves
    (so tiny strings still compare)."""
    c = _as_col(s)
    return F.when(
        F.length(c) < 4, F.array(c)
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(c) - 3),
                lambda i: F.substring(c, i, F.lit(4)),
            )
        )
    )


def ngram_distance(a, b) -> Column:
    """CH ngramDistance(a, b) -> 0 (equal) .. 1 (disjoint); Dice-style
    over distinct 4-gram sets (divergence from CH's multiset hashing
    documented in the module docstring)."""
    ga, gb = _ngrams4(a), _ngrams4(b)
    inter = F.size(F.array_intersect(ga, gb)).cast("double")
    total = (F.size(ga) + F.size(gb)).cast("double")
    return F.when(total == 0, F.lit(0.0)).otherwise(
        1.0 - 2.0 * inter / total
    )


def ngram_search(haystack, needle) -> Column:
    """CH ngramSearch(haystack, needle) -> 0 (nothing shared) .. 1
    (needle fully covered): the asymmetric variant of ngramDistance —
    the fraction of the NEEDLE's distinct 4-grams present in the
    haystack (CH hashes multisets; same documented distinct-set
    divergence as ngramDistance)."""
    gh, gn = _ngrams4(haystack), _ngrams4(needle)
    inter = F.size(F.array_intersect(gh, gn)).cast("double")
    denom = F.size(gn).cast("double")
    return F.when(denom == 0, F.lit(0.0)).otherwise(inter / denom)


def soundex_difference(a, b) -> Column:
    """SQL-Server-style difference(a, b): how many of the four
    soundex code positions match (0..4)."""
    sa, sb = F.soundex(_as_col(a)), F.soundex(_as_col(b))
    return F.aggregate(
        F.zip_with(
            _chars(sa),
            _chars(sb),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("long")


def _guarded_seq(lo: Column, hi: Column) -> Column:
    """sequence(lo, hi) that yields [] when hi < lo (Spark's sequence
    DESCENDS on inverted bounds)."""
    return F.when(hi >= lo, F.sequence(lo, hi)).otherwise(
        F.array().cast("array<int>")
    )


def _let(value: Column, body) -> Column:
    """Bind ``value`` once as a lambda variable (transform over a
    single-element array). Two reasons: interpreted HOF lambdas
    re-evaluate captured argument expressions per invocation, and
    repeated references DUPLICATE the whole subtree in the plan —
    the un-let Jaro/Winkler expression embeds its two-pass fold ~24
    times and OOMs the driver during analysis."""
    return F.element_at(F.transform(F.array(value), body), 1)


def _jaro_fold(ca: Column, cb: Column):
    """The greedy matching fold of the classic Jaro algorithm over
    BOUND char-array values: pass 1 folds the chars of a, greedily
    claiming the first unclaimed equal char of b inside the match
    window; the transposition count compares the two matched-char
    tapes in their native orders."""
    n, m = F.size(ca), F.size(cb)
    w = F.greatest(
        (F.greatest(n, m) / 2).cast("int") - 1, F.lit(0)
    )
    init = F.struct(
        F.array_repeat(F.lit(0), m).alias("used"),
        F.array().cast("array<string>").alias("ma"),
    )

    def step(acc: Column, i: Column) -> Column:
        lo = F.greatest(i - w, F.lit(1)).cast("int")
        hi = F.least(i + w, m).cast("int")
        cand = F.filter(
            _guarded_seq(lo, hi),
            lambda j: (F.element_at(cb, j) == F.element_at(ca, i))
            & (F.element_at(acc["used"], j) == 0),
        )
        j = F.try_element_at(cand, F.lit(1))
        return F.struct(
            F.when(j.isNull(), acc["used"])
            .otherwise(
                F.transform(
                    acc["used"],
                    lambda u, idx0: F.when(idx0 + 1 == j, 1).otherwise(u),
                )
            )
            .alias("used"),
            F.when(j.isNull(), acc["ma"])
            .otherwise(
                F.concat(acc["ma"], F.array(F.element_at(ca, i)))
            )
            .alias("ma"),
        )

    return F.aggregate(
        _guarded_seq(F.lit(1), n.cast("int")), init, step
    )


def jaro_similarity(a, b) -> Column:
    """CH jaroSimilarity(a, b) -> 0..1; 0 when either string is empty
    (the DuckDB/CH convention — NOT 1 for two empties). The char
    arrays, fold state, matched tapes, and match count are all
    LET-bound so the plan holds exactly ONE copy of the two-pass
    fold and never re-splits the strings per step."""
    return _let(
        F.struct(_chars(a).alias("ca"), _chars(b).alias("cb")),
        lambda cs: _jaro_from_chars(cs["ca"], cs["cb"]),
    )


def _jaro_from_chars(ca: Column, cb: Column) -> Column:
    n, m = F.size(ca), F.size(cb)

    def from_fold(fd: Column) -> Column:
        mb_expr = F.transform(
            F.filter(
                F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
                lambda j: F.try_element_at(fd["used"], j) == 1,
            ),
            lambda j: F.element_at(cb, j),
        )

        def with_mb(mb: Column) -> Column:
            # transpositions = floor(mismatched tape positions / 2) —
            # the floor matters when the count is odd (DuckDB/CH)
            half_t = F.floor(
                F.aggregate(
                    F.zip_with(
                        fd["ma"],
                        mb,
                        lambda x, y: F.when(x != y, 1).otherwise(0),
                    ),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / 2
            ).cast("double")
            mc = F.size(fd["ma"]).cast("double")
            nn, mm = n.cast("double"), m.cast("double")
            return (
                F.when((n == 0) | (m == 0), F.lit(0.0))
                .when(mc == 0, F.lit(0.0))
                .otherwise(
                    (mc / nn + mc / mm + (mc - half_t) / mc) / 3.0
                )
            )

        return _let(mb_expr, with_mb)

    return _let(_jaro_fold(ca, cb), from_fold)


def jaro_winkler_similarity(a, b) -> Column:
    """CH jaroWinklerSimilarity: Jaro boosted by the common prefix
    (cap 4, scale 0.1) when the base similarity clears 0.7. The char
    arrays and base similarity are LET-bound — referencing the
    similarity four times would otherwise embed four copies of the
    Jaro fold."""

    def build(cs: Column) -> Column:
        ca, cb = cs["ca"], cs["cb"]
        cap = F.least(F.lit(4), F.size(ca), F.size(cb))
        prefix = F.aggregate(
            _guarded_seq(F.lit(1), cap),
            F.lit(0),
            lambda acc, i: F.when(
                (acc == i - 1)
                & (F.element_at(ca, i) == F.element_at(cb, i)),
                acc + 1,
            ).otherwise(acc),
        ).cast("double")
        return _let(
            _jaro_from_chars(ca, cb),
            lambda sim: F.when(
                sim > 0.7, sim + prefix * 0.1 * (1.0 - sim)
            ).otherwise(sim),
        )

    return _let(
        F.struct(_chars(a).alias("ca"), _chars(b).alias("cb")), build
    )


def array_levenshtein(a, b) -> Column:
    """CH arrayLevenshteinDistance(a, b): plain Levenshtein over
    array ELEMENTS (null-safe equality). Same row-by-row DP fold as
    damerauLevenshtein minus the transposition lane; O(n·m) per row
    pair with both arrays LET-bound."""
    return _let(
        F.struct(_as_col(a).alias("ca"), _as_col(b).alias("cb")),
        lambda cs: _lev_from_arrays(cs["ca"], cs["cb"]),
    )


def _lev_from_arrays(ca: Column, cb: Column) -> Column:
    n, m = F.size(ca), F.size(cb)
    row0 = F.sequence(F.lit(0), m)
    final = F.aggregate(
        F.sequence(F.lit(1), n),
        row0,
        lambda prev, i: F.aggregate(
            F.sequence(F.lit(1), m),
            F.array(i),
            lambda cur, j: F.concat(
                cur,
                F.array(
                    F.least(
                        F.element_at(cur, -1) + 1,
                        F.element_at(prev, j + 1) + 1,
                        F.element_at(prev, j)
                        + F.when(
                            F.element_at(ca, i).eqNullSafe(
                                F.element_at(cb, j)
                            ),
                            0,
                        ).otherwise(1),
                    )
                ),
            ),
        ),
    )
    return F.when(n == 0, m.cast("long")).when(
        m == 0, n.cast("long")
    ).otherwise(F.element_at(final, -1).cast("long"))
