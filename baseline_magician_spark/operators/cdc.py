"""Content-defined chunking (Gear rolling hash) for sub-document
dedup.

Large-corpus pipelines dedup below document granularity: near-
identical pages share long runs that fixed-size blocks miss because
a one-byte insertion shifts every later block. Content-DEFINED
boundaries (Rabin/Gear family — the FastCDC lineage) cut where a
rolling hash of the trailing window hits a mask, so shared content
re-aligns on the same cut points regardless of offset.

This implementation is the PURE variant: a position ends a chunk iff
gear(window) % 2^mask_bits == 0, with no min/max clamps. That choice
is deliberate at 100 TB: the boundary decision is a function of the
trailing ``window`` characters ONLY, so it is embarrassingly
parallel per position, stable under repartitioning, replayable by a
SQL oracle, and shift-invariant (the dedup property). Min/max
clamps make boundary selection a sequential scan per document —
cheap in a byte loop, hostile to a declarative replay — and are the
FastCDC speed trick, not the dedup semantics.

Arithmetic is ANSI-safe by construction (no wrap-mode analysis
needed): state lives in [0, 2^61), the fold step ``acc*2 + g`` peaks
below 2^63, and the gear table value ``((code % 256) + 1) * GOLD``
peaks at 256 * 2^31.5 — every intermediate fits a signed long, in
Spark and in the DuckDB BIGINT oracle replay
(queries/dedup_q.py:_cdc_*_oracle).

Scale shape: one map-side pass, no shuffle until the caller
aggregates chunk fingerprints. Per-row cost is O(window * len)
interpreted-HOF work (window is a constant 32). For a throughput-
critical deployment the same closed form vectorizes as a numpy
sliding-window dot in ``mapInPandas`` — the JVM rendering here is
the correctness carrier the oracle can replay.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import _codes, poly_hash

GOLD = 0x9E3779B9  # golden-ratio odd constant; gear table generator
MOD = 1 << 61
WINDOW = 32
MASK_BITS = 6  # boundary iff h % 64 == 0 -> ~64-char expected chunks


def _gear_table(codes: Column) -> Column:
    """array<long> of gear values: G(b) = ((b % 256) + 1) * GOLD
    mod 2^61 — deterministic, no stored random table, replayable."""
    return F.transform(
        codes,
        lambda b: ((b % F.lit(256)) + 1) * F.lit(GOLD) % F.lit(MOD),
    )


def _rolling_states(g: Column, window: int) -> Column:
    """h_i = fold(acc*2 + g_j) over the trailing ``window`` gear
    values ending at i (1-based) — the closed form of the gear
    recurrence mod 2^61, where taps older than 61 shifts vanish and
    ``window`` truncates earlier for cost."""

    def state(_x: Column, i: Column) -> Column:
        start = F.greatest(F.lit(1), i + 2 - F.lit(window))
        return F.aggregate(
            F.slice(g, start, i + 1 - start + 1),
            F.lit(0).cast("long"),
            lambda acc, v: (acc * 2 + v) % F.lit(MOD),
        )

    return F.transform(g, state)


def _chunk_doc_py(
    text: str, mask_bits: int, window: int
) -> list[tuple[int, int, int, int]]:
    """(chunk_ord, start, len, fp) spans of one document — the
    SLIDING recurrence h_i = 2*h_{i-1} + g_i - g_{i-window}*2^window
    (mod 2^61), value-identical to the JVM slice fold (same
    constants, same codepoint stream: Python str iteration and
    Spark's split('') both walk codepoints). Python ints make the
    expired-tap multiply exact; the per-char loop is what the
    O(window x len) JVM expression pays per POSITION, collapsed to
    O(1)."""
    n = len(text)
    if n == 0:
        return []
    mask = (1 << mask_bits) - 1
    pow_w = pow(2, window, MOD)
    g = [((ord(c) % 256) + 1) * GOLD % MOD for c in text]
    h = 0
    ends: list[int] = []
    for i, gi in enumerate(g):
        h = (2 * h + gi) % MOD
        if i >= window:
            h = (h - g[i - window] * pow_w) % MOD
        if h & mask == 0:
            ends.append(i + 1)
    aug = [0] + [e for e in ends if e < n] + [n]
    out = []
    from ..functions.hashing import POLY_BASE, POLY_MOD, POLY_SEED

    for k in range(1, len(aug)):
        s, e = aug[k - 1], aug[k]
        fp = POLY_SEED
        for c in text[s:e]:
            fp = (fp * POLY_BASE + ord(c)) % POLY_MOD
        out.append((k, s + 1, e - s, fp))
    return out


def cdc_chunks_pandas(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_bits: int = MASK_BITS,
    window: int = WINDOW,
) -> DataFrame:
    """The throughput rendering of :func:`cdc_chunks`: one
    ``mapInPandas`` pass with the O(1)-per-position sliding
    recurrence instead of the JVM expression's O(window) slice fold
    per position — value-identical output (same constants, same
    codepoint stream; tests/test_cdc.py pins equality against the
    JVM path), ~20x measured at sf0.1. Narrow, no shuffle; Arrow
    batches in, chunk rows out."""
    from ..pyship import ensure_shipped

    ensure_shipped(docs.sparkSession)
    src = docs.where(F.length(F.col(text_col)) > 0).select(
        F.col(id_col), F.col(text_col).alias("_t")
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids: list = []
            ords: list[int] = []
            starts: list[int] = []
            lens: list[int] = []
            fps: list[int] = []
            for did, text in zip(pdf[id_col], pdf["_t"]):
                for k, s, ln, fp in _chunk_doc_py(
                    text, mask_bits, window
                ):
                    ids.append(did)
                    ords.append(k)
                    starts.append(s)
                    lens.append(ln)
                    fps.append(fp)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "chunk_ord": ords,
                    "chunk_start": starts,
                    "chunk_len": lens,
                    "chunk_fp": fps,
                }
            )

    return src.mapInPandas(
        gen,
        schema=(
            f"{id_col} long, chunk_ord long, chunk_start long, "
            "chunk_len long, chunk_fp long"
        ),
    )


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_bits: int = MASK_BITS,
    window: int = WINDOW,
) -> DataFrame:
    """(id, chunk_ord, chunk_start, chunk_len, chunk_fp) — one row
    per content-defined chunk; chunk_fp is the engine's cross-engine
    polynomial hash of the chunk text. Empty documents produce no
    rows (no characters, no chunks). This is the pure-JVM rendering
    (the correctness carrier the DuckDB oracle replays verbatim);
    :func:`cdc_chunks_pandas` is the value-identical throughput
    path."""
    text = F.col(text_col)
    codes = _codes(text)
    g = _gear_table(codes)
    h = _rolling_states(g, window)
    n = F.size(codes).cast("long")
    mask = F.lit(1 << mask_bits)
    ends = F.filter(
        F.transform(
            h,
            lambda x, i: F.when(
                x % mask == 0, (i + 1).cast("long")
            ).otherwise(F.lit(-1).cast("long")),
        ),
        lambda e: e >= 0,
    )
    # interior boundaries only, then the document end — this dedups
    # a boundary landing exactly on the last character
    aug = F.concat(
        F.array(F.lit(0).cast("long")),
        F.filter(ends, lambda e: e < n),
        F.array(n),
    )
    spans = F.zip_with(
        F.slice(aug, 1, F.size(aug) - 1),
        F.slice(aug, 2, F.size(aug) - 1),
        lambda a, b: F.struct(
            (a + 1).alias("start"), (b - a).alias("len")
        ),
    )
    out = (
        docs.where(F.length(text) > 0)
        .select(
            F.col(id_col),
            text.alias("_t"),
            F.posexplode(spans).alias("_ord0", "_span"),
        )
        .select(
            F.col(id_col),
            (F.col("_ord0") + 1).cast("long").alias("chunk_ord"),
            F.col("_span.start").alias("chunk_start"),
            F.col("_span.len").alias("chunk_len"),
            poly_hash(
                F.substring(
                    F.col("_t"),
                    F.col("_span.start").cast("int"),
                    F.col("_span.len").cast("int"),
                )
            ).alias("chunk_fp"),
        )
    )
    return out


def cdc_shared_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    min_len: int = 8,
    mask_bits: int = MASK_BITS,
    window: int = WINDOW,
    impl: str = "pandas",
) -> DataFrame:
    """Chunk fingerprints appearing in >= min_docs distinct
    documents (the cross-document duplicate-content relation):
    (chunk_fp, n_docs, n_occurrences, max_len). ``min_len`` drops
    trivial slivers the 2^mask_bits boundary density makes common.
    Shuffle inventory: ONE groupBy on chunk_fp — fingerprints are
    uniform (polynomial hash), so no hot keys; at corpus scale this
    is the same band-key shape as MinHash LSH. ``impl`` picks the
    chunker rendering: "pandas" (default — the sliding-recurrence
    throughput path) or "jvm" (the oracle-replayable expression;
    value-identical)."""
    builder = cdc_chunks if impl == "jvm" else cdc_chunks_pandas
    chunks = builder(
        docs, text_col, id_col, mask_bits=mask_bits, window=window
    )
    return (
        chunks.where(F.col("chunk_len") >= min_len)
        .groupBy("chunk_fp")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("chunk_len").alias("max_len"),
        )
        .where(F.col("n_docs") >= min_docs)
    )
