"""The numpy ANN kernels must be row-identical to the JVM expression
renderings (the oracle-replayable paths): same left-to-right fold
order, same Double.compare tie/NaN ordering for every argmax/argmin/
sort, same rounding (rounding stays JVM-side in all callers)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from baseline_magician_spark.operators.similarity import (
    brute_force_topk,
    ivf_cell_report,
    ivf_topk,
    ivf_train_step_flat,
    ivfpq_topk,
    pq_adc_topk,
    pq_codebooks_from_seeds,
    pq_encode,
    semantic_keep_best,
)

DIM = 8


def _mkvec(seed: int) -> list[float]:
    # deterministic, sign-mixed, includes exact ties across rows
    return [
        math.sin(seed * 31 + j) if seed % 7 else 0.25 * (j % 3 - 1)
        for j in range(DIM)
    ]


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, _mkvec(i)) for i in range(64)]
    # exact duplicates (cosine ties) and a negated duplicate (cosine
    # -1 ties). NO zero vector: the jvm expression path itself throws
    # ANSI DIVIDE_BY_ZERO on a zero-norm row (double division by zero
    # is an error under ANSI mode), so zero vectors are out of
    # contract for the cosine operators on BOTH impls.
    rows.append((64, rows[10][1]))
    rows.append((66, [-x for x in rows[12][1]]))
    df = spark.createDataFrame(rows, "vec_id long, v array<float>")
    return df.select("vec_id", F.col("v").alias("embedding"))


@pytest.fixture(scope="module")
def cents(emb):
    return sorted(
        (int(r[0]), list(r[1]))
        for r in emb.where(F.col("vec_id") < 6)
        .select("vec_id", "embedding")
        .collect()
    )


@pytest.fixture(scope="module")
def books(cents):
    return pq_codebooks_from_seeds(cents, m=2)


def _rows(df):
    return sorted(
        tuple(
            tuple(x) if isinstance(x, list) else x
            for x in r
        )
        for r in df.collect()
    )


def _pin(pandas_df, jvm_df):
    got, want = _rows(pandas_df), _rows(jvm_df)
    assert got == want
    assert len(want) > 0


def test_brute_force_topk(emb):
    q = emb.where(F.col("vec_id") < 4)
    _pin(
        brute_force_topk(emb, q, k=5, impl="pandas"),
        brute_force_topk(emb, q, k=5, impl="jvm"),
    )


def test_ivf_topk(emb, cents):
    _pin(
        ivf_topk(emb, k=5, n_query_vecs=3, n_probe=2, centroids=cents,
                 impl="pandas"),
        ivf_topk(emb, k=5, n_query_vecs=3, n_probe=2, centroids=cents,
                 impl="jvm"),
    )


def test_ivf_train_step_flat(emb, cents):
    _pin(
        ivf_train_step_flat(emb, centroids=cents, impl="pandas"),
        ivf_train_step_flat(emb, centroids=cents, impl="jvm"),
    )


def test_pq_encode(emb, books):
    _pin(
        pq_encode(emb, books, impl="pandas"),
        pq_encode(emb, books, impl="jvm"),
    )


def test_pq_adc_topk(emb, books):
    _pin(
        pq_adc_topk(emb, k=5, n_query_vecs=3, codebooks=books,
                    impl="pandas"),
        pq_adc_topk(emb, k=5, n_query_vecs=3, codebooks=books,
                    impl="jvm"),
    )


def test_ivfpq_topk(emb, cents, books):
    _pin(
        ivfpq_topk(emb, cents, books, k=5, n_query_vecs=3, n_probe=2,
                   impl="pandas"),
        ivfpq_topk(emb, cents, books, k=5, n_query_vecs=3, n_probe=2,
                   impl="jvm"),
    )


def test_semantic_keep_best(emb, cents):
    _pin(
        semantic_keep_best(emb, cents, impl="pandas"),
        semantic_keep_best(emb, cents, impl="jvm"),
    )


def test_ivf_cell_report(emb, cents):
    _pin(
        ivf_cell_report(emb, cents, impl="pandas"),
        ivf_cell_report(emb, cents, impl="jvm"),
    )


def test_cell_report_single_centroid_null_c2(emb, cents):
    # K = 1: the runner-up cosine is NULL on both paths
    _pin(
        ivf_cell_report(emb, cents[:1], impl="pandas"),
        ivf_cell_report(emb, cents[:1], impl="jvm"),
    )


def test_on_real_embeddings(spark):
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cents = sorted(
        (int(r[0]), list(r[1]))
        for r in emb.where(F.col("vec_id") < 16)
        .select("vec_id", "embedding")
        .collect()
    )
    books = pq_codebooks_from_seeds(cents, m=4)
    _pin(
        ivfpq_topk(emb, cents, books, impl="pandas"),
        ivfpq_topk(emb, cents, books, impl="jvm"),
    )
    _pin(
        ivf_cell_report(emb, cents, impl="pandas"),
        ivf_cell_report(emb, cents, impl="jvm"),
    )


def test_dkeys_total_order():
    import numpy as np

    from baseline_magician_spark.operators.similarity import _np_dkeys

    vals = np.array(
        [float("nan"), float("inf"), 1.5, 1.5000000000000002, 0.0,
         -0.0, -1.5, float("-inf"), 5e-324, -5e-324]
    )
    keys = _np_dkeys(vals)
    order = [vals[i] for i in np.argsort(keys, kind="stable")]
    # java.lang.Double.compare order: -inf < -1.5 < -min < -0.0 < 0.0
    # < +min < 1.5 < next(1.5) < inf < NaN
    want = [float("-inf"), -1.5, -5e-324, -0.0, 0.0, 5e-324, 1.5,
            1.5000000000000002, float("inf"), float("nan")]
    assert [str(x) for x in order] == [str(x) for x in want]
    # -0.0 sorts strictly below 0.0
    import struct
    assert struct.pack(">d", order[3]) == struct.pack(">d", -0.0)


def test_lsh_bucket_relation_equals_expression(emb):
    from baseline_magician_spark.operators.similarity import (
        _lsh_bucket_relation,
        lsh_bucket,
        norm,
    )

    for center in (False, True):
        got = _rows(
            _lsh_bucket_relation(
                emb,
                keep=("vec_id",),
                vec_col="embedding",
                n_planes=8,
                center=center,
                with_norm=True,
            )
        )
        want = _rows(
            emb.select(
                "vec_id",
                norm(F.col("embedding")).alias("_n"),
                lsh_bucket(
                    F.col("embedding"), 8, center=center
                ).alias("_bucket"),
            )
        )
        assert got == want
        assert len(want) > 0


def test_lsh_bucketed_pairs_pandas_equals_jvm(spark):
    from tests.conftest import SF_SMOKE

    from baseline_magician_spark.operators.similarity import (
        lsh_bucketed_pairs,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = _rows(
        lsh_bucketed_pairs(emb, threshold=0.3, impl="pandas")
    )
    want = _rows(lsh_bucketed_pairs(emb, threshold=0.3, impl="jvm"))
    assert got == want
