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


def _dot_lit(vec: Column, values: list[float]) -> Column:
    """Dot product of an array column with a driver-known literal vector
    (same fold order as :func:`dot`)."""
    lit_arr = F.array(*[F.lit(float(v)).alias("x") for v in values])
    return F.aggregate(
        F.zip_with(vec, lit_arr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cosine_lit(vec: Column, values: list[float]) -> Column:
    import math

    cnorm = math.sqrt(sum(float(v) * float(v) for v in values))
    return _dot_lit(vec, values) / (norm(vec) * F.lit(cnorm))


def ivf_assign_cell(
    vec: Column, centroids: list[tuple[int, list[float]]]
) -> Column:
    """Map-side IVF cell assignment: argmax centroid cosine, ties to the
    lowest centroid id.

    Centroids are driver-known (post-training, K x dim floats — tiny),
    so assignment is ONE projection with no join and no shuffle: the
    array-of-structs max trick gives argmax without re-evaluating any
    cosine (struct fields (cos, -cid); array_max is lexicographic).
    This is the property that makes IVF work at 100 TB — the corpus
    gains its partition key map-side.
    """
    cells = F.array(
        *[
            F.struct(
                _cosine_lit(vec, cvec).alias("c"),
                F.lit(-cid).cast("long").alias("n"),
            )
            for cid, cvec in centroids
        ]
    )
    return -F.array_max(cells)["n"]


def ivf_probe_cells(
    vec: Column, centroids: list[tuple[int, list[float]]], n_probe: int
) -> Column:
    """The n_probe nearest centroid ids for a query vector (cos DESC,
    cid ASC), as an array — computed map-side like the assignment."""
    scored = F.array(
        *[
            F.struct(
                (-_cosine_lit(vec, cvec)).alias("nc"),
                F.lit(cid).cast("long").alias("cid"),
            )
            for cid, cvec in centroids
        ]
    )
    return F.transform(
        F.slice(F.array_sort(scored), 1, n_probe), lambda s: s["cid"]
    )


def ivf_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_query_vecs: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: assign corpus vectors to centroid cells
    map-side, probe each query's n_probe nearest cells, exact-rescore
    only the candidates.

    "Training" here seeds centroids from the first ``n_centroids``
    vectors (deterministic, oracle-reproducible); production would
    k-means them — every other step (collect centroids to driver,
    map-side assign, probe, cell-join, rescore) is the real IVF
    dataflow. Plan shape: zero shuffles until the final per-query
    top-k, because the cell key is computed in the scan projection and
    the probe set is broadcast.
    """
    from pyspark.sql import Window as W

    centroids = [
        (int(r[0]), list(r[1]))
        for r in embeddings.where(F.col(id_col) < n_centroids)
        .select(id_col, vec_col)
        .collect()
    ]
    centroids.sort()

    assigned = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        ivf_assign_cell(F.col(vec_col), centroids).alias("cell"),
    )
    probes = (
        embeddings.where(F.col(id_col) < n_query_vecs)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qvec"),
            F.explode(
                ivf_probe_cells(F.col(vec_col), centroids, n_probe)
            ).alias("cell"),
        )
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6).alias("cosine_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


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
