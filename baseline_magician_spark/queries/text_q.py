"""Text-analysis queries over `documents`, with DuckDB oracles built
from the same constants (stopword lists, patterns, thresholds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.hashing import poly_hash_duckdb
from ..operators.text import (
    BPE_PATTERN,
    LANG_MARKERS,
    PUNCT_PATTERN,
    STOPWORDS,
    bpe_token_count,
    lang_scores,
    n_tokens,
    normalized_fingerprint,
    predicted_lang,
    quality_stats,
    winnow_min_shingle,
)
from ..registry import query

_TOK = "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"


def _quality_oracle() -> str:
    sw = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    WITH t AS (
      SELECT doc_id, text, {_TOK} AS toks FROM documents
    )
    SELECT doc_id,
      length(text) AS n_chars,
      len(toks) AS n_tokens,
      round(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(toks, x -> CAST(length(x) AS BIGINT))),
              (a, b) -> a + b) / len(toks), 6) AS avg_token_len,
      round(len(regexp_extract_all(text, '{PUNCT_PATTERN}')) / length(text), 6)
        AS punct_ratio,
      round(len(list_filter(toks, x -> list_contains([{sw}], lower(x)))) / len(toks), 6)
        AS stopword_ratio,
      (len(toks) >= 10
       AND round(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(toks, x -> CAST(length(x) AS BIGINT))),
              (a, b) -> a + b) / len(toks), 6) BETWEEN 2.0 AND 12.0)
        AS is_quality
    FROM t
    """


@query("text_quality_scores", _quality_oracle())
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", *quality_stats("text"))


def _lang_oracle() -> str:
    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        mk = ", ".join(f"'{m}'" for m in markers)
        score_cols.append(
            f"len(list_filter({_TOK}, x -> list_contains([{mk}], lower(x)))) AS score_{lang}"
        )
    langs = list(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{la}" for la in langs) + ")"
    case = "'und'"
    for la in reversed(langs):
        case = f"CASE WHEN score_{la} = {best} THEN '{la}' ELSE {case} END"
    return f"""
    WITH s AS (
      SELECT doc_id, lang, {', '.join(score_cols)} FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
      {', '.join(f'score_{la}' for la in langs)},
      CASE WHEN {best} <= 0 THEN 'und' ELSE {case} END AS predicted_lang
    FROM s
    """


@query("text_language_id", _lang_oracle())
def text_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *lang_scores("text"),
    ).withColumn("predicted_lang", predicted_lang())


@query(
    "text_token_counts",
    f"""
    SELECT doc_id,
      len({_TOK}) AS ws_tokens,
      len(regexp_extract_all(text, '{BPE_PATTERN}')) AS bpe_tokens,
      round(length(text) / len(regexp_extract_all(text, '{BPE_PATTERN}')), 6)
        AS chars_per_token
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bpe = bpe_token_count("text")
    return docs.select(
        "doc_id",
        n_tokens("text").alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.round(F.length("text") / bpe, 6).alias("chars_per_token"),
    )


def _fingerprint_oracle() -> str:
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    from ..functions.hashing import shingle_hashes_duckdb

    return f"""
    SELECT doc_id,
      {poly_hash_duckdb(norm)} AS fingerprint,
      list_min({shingle_hashes_duckdb('text', 3)}) AS min_shingle_hash
    FROM documents
    """


@query("text_fingerprints", _fingerprint_oracle())
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        normalized_fingerprint("text").alias("fingerprint"),
        winnow_min_shingle("text", 3).alias("min_shingle_hash"),
    )


def _frequent_ngrams_oracle() -> str:
    from ..functions.hashing import token_shingles_duckdb

    sh = token_shingles_duckdb("text", 2)
    return f"""
    SELECT shingle, count(*) AS doc_freq FROM (
      SELECT doc_id, unnest(list_distinct({sh})) AS shingle FROM documents
    )
    GROUP BY shingle
    ORDER BY doc_freq DESC, shingle
    LIMIT 50
    """


@query("text_frequent_ngrams_topk", _frequent_ngrams_oracle())
def frequent_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: top-50 bigrams by document frequency. Exact
    two-phase: per-doc distinct shingles map-side (array_distinct),
    partial counts combine before the shuffle, global top-k after —
    the exact-counting shape; a sketch (count-min) would slot in at
    the same seam when exactness can be traded."""
    from ..functions.hashing import token_shingles

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.array_distinct(token_shingles("text", 2))).alias("shingle")
        )
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("shingle"))
        .limit(50)
    )
