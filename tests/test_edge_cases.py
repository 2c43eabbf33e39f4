"""Edge-case behavior of text/dedup/similarity operators: empty and
sub-shingle documents, single tokens, unicode — the rows that break
naive HOF expressions (empty-array folds, ANSI element_at, etc.)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def edge_docs(spark):
    rows = [
        (0, ""),                      # empty
        (1, "   "),                   # whitespace only
        (2, "one"),                   # single token (< shingle n)
        (3, "two tokens"),            # still < n=3
        (4, "exactly three tokens here no wait five"),
        (5, "ünïcodé tökens with ümlauts and émojis 🎉 ok"),
        (6, "a a a a a a a a"),       # degenerate repeats
        (7, "exactly three tokens here no wait five"),  # dup of 4
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_shingle_hashes_empty_and_short(spark, edge_docs):
    from baseline_magician_spark.functions.hashing import shingle_hashes

    got = {
        r.doc_id: r.n
        for r in edge_docs.select(
            "doc_id", F.size(shingle_hashes("text", 3)).alias("n")
        ).collect()
    }
    assert got[0] == 0 and got[1] == 0  # no tokens -> no shingles
    assert got[2] == 0 and got[3] == 0  # < n tokens -> no shingles
    assert got[4] == 5  # 7 tokens -> 5 shingles
    assert got[6] == 1  # repeats collapse to one distinct shingle


def test_minhash_skips_shingleless_docs(spark, edge_docs):
    from baseline_magician_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(edge_docs, "text", "doc_id").collect()
    # only the duplicate pair (4, 7) can collide on all bands
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(4, 7)}
    assert all(r.n_shared_bands == 4 for r in pairs)


def test_simhash_defined_for_empty(spark, edge_docs):
    from baseline_magician_spark.operators.dedup import simhash

    got = {
        r.doc_id: r.s
        for r in edge_docs.select("doc_id", simhash("text").alias("s")).collect()
    }
    # empty docs: zero votes -> every bit >= 0 -> all bits set
    assert got[0] == (1 << 30) - 1
    # identical docs -> identical fingerprints
    assert got[4] == got[7]


def test_unicode_tokens_and_quality(spark, edge_docs):
    from baseline_magician_spark.operators.text import quality_stats

    row = (
        edge_docs.where("doc_id = 5")
        .select(*quality_stats("text"))
        .first()
    )
    assert row.n_tokens == 8
    assert row.n_chars > 0


def test_exact_dedup_groups_on_duplicates(spark, edge_docs):
    from baseline_magician_spark.operators.dedup import exact_dedup_groups

    groups = exact_dedup_groups(edge_docs, "text", "doc_id").collect()
    by_count = [g for g in groups if g.n_copies == 2]
    assert len(by_count) == 1 and by_count[0].keep_id == 4


def test_connected_components_handles_chains(spark):
    from baseline_magician_spark.operators.graph import connected_components

    # chain 1-2-3-4 + triangle 10-11-12 + isolated edge 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src long, dst long",
    )
    cc = {r.node: r.cluster_id for r in connected_components(edges).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_ngrams_udtf_matches_builtin_shingles(spark):
    """The Python UDTF lateral path and the Catalyst HOF path must
    agree (same n-grams, order by position)."""
    from pyspark.sql import functions as F

    from baseline_magician_spark.catalog import load_table
    from baseline_magician_spark.functions.hashing import token_shingles
    from baseline_magician_spark.operators.text import register_ngrams_udtf

    from conftest import SF_SMOKE

    register_ngrams_udtf(spark, "ngrams_udtf_t", n=2)
    docs = load_table(spark, SF_SMOKE, "documents").where(F.col("doc_id") < 30)
    docs.createOrReplaceTempView("_udtf_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, g.ngram, g.pos "
        "FROM _udtf_docs d, LATERAL ngrams_udtf_t(d.text) g"
    ).collect()
    via_hof = docs.select(
        "doc_id",
        F.posexplode(token_shingles("text", 2)).alias("pos", "ngram"),
    ).collect()
    canon = lambda rows: sorted((r["doc_id"], r["ngram"], r["pos"]) for r in rows)
    assert canon(via_udtf) == canon(via_hof)
