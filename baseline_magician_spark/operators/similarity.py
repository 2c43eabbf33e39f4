"""Similarity search over embedding columns (array<float>).

- **Brute-force top-k cosine** (the exact baseline): query set ×
  corpus cross join with the dot product computed by built-in
  higher-order functions (zip_with + aggregate) — JVM-side, no Python.
  Correct at any scale but O(Q x N); use for small query sets or as
  the verifier for approximate paths.

- **Random-hyperplane LSH buckets** (the scale path): P deterministic
  pseudo-random hyperplanes (components derived from index arithmetic,
  no RNG state) give each vector a P-bit sign bucket computed map-side.
  Candidates = same-bucket pairs -> the cross join shrinks by ~2^P.
  At 100 TB the bucket id is the shuffle key (uniform by construction)
  and each bucket's candidate set is verified with the exact cosine.

- **Embedding near-dup pairs**: same-bucket exact-cosine >= threshold,
  the embedding analogue of MinHash dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Hyperplane component for (plane p, dim d): pseudo-random signed value
# from pure integer arithmetic — identical in Spark and any SQL oracle.
_HP_MOD = 1_000_003
_HP_A = 1_315_423_911
_HP_B = 2_654_435_761


def dot(a: Column, b: Column) -> Column:
    """Exact dot product of two array<numeric> columns (fold, JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _hyperplane_component(p: int, d: Column) -> Column:
    """Deterministic signed pseudo-random component in [-501001, 499001].

    int64 arithmetic throughout (the a*p product overflows int32).
    """
    return (
        F.lit(_HP_A).cast("long") * p + F.lit(_HP_B).cast("long") * d.cast("long")
    ) % F.lit(_HP_MOD) - F.lit((_HP_MOD - 1) // 2)


def lsh_bucket(vec: Column, n_planes: int = 8) -> Column:
    """P-bit sign bucket from deterministic random hyperplanes (map-side)."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, d: x.cast("double") * _hyperplane_component(p, d),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine_sim, rank), rank 1..k,
    ties broken by neighbor id. The queries side is broadcast — the
    corpus is scanned ONCE regardless of |Q|.
    """
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    )
    sim = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6).alias("cosine_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def lsh_bucketed_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    threshold: float = 0.9,
) -> DataFrame:
    """Near-duplicate vector pairs: same LSH bucket AND exact cosine >=
    threshold. Output: (vec_a, vec_b, cosine_sim)."""
    with_bucket = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        lsh_bucket(F.col(vec_col), n_planes).alias("_bucket"),
    )
    # shuffle_hash: forces both sides through the SAME shuffle of the
    # same map-side subplan, so AQE reuses the stage and the bucket
    # computation runs once (broadcast would recompute it per side) —
    # and skips the sort a merge join would add. At scale, raise
    # n_planes so bucket cardinality (2^n_planes) keeps the shuffle
    # parallel and per-bucket candidate sets small.
    l = with_bucket.alias("l").hint("shuffle_hash")
    r = with_bucket.alias("r").hint("shuffle_hash")
    return (
        l.join(
            r,
            (F.col("l._bucket") == F.col("r._bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("vec_a"),
            F.col("r._id").alias("vec_b"),
            F.round(cosine(F.col("l._v"), F.col("r._v")), 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
