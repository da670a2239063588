"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k — the correctness baseline.
  Query side is broadcast (small), so the big side is never shuffled;
  per-partition top-k then a tiny merge (TakeOrderedAndProject shape).
- lsh_topk: random-hyperplane LSH bucketing — the scale path. Bucket id
  is the sign pattern of N_PLANES pseudo-random ±1 projections
  (deterministic from xxhash64(dim, plane) — no stored model, identical
  on every executor). Probing only the query's bucket turns the O(N·Q)
  scan into O(N/2^p·Q) at some recall cost; multi-probe (flipping the
  weakest sign) recovers most of it.

All dot products are sequential left-to-right double folds in
whole-stage codegen (F.aggregate over zip_with) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (query_id, neighbor_id, sim, rank).
    Ties broken by neighbor id; sim rounded to 6 dp for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    scored = v.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qvec"), F.col("vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
            "sim",
            "rank",
        )
    )


def hyperplane_bucket(vec: Column, n_planes: int = N_PLANES) -> Column:
    """LSH bucket id: sign pattern of n_planes ±1-weighted projections.
    Plane weights derive from xxhash64(dim_index, plane) — deterministic,
    model-free, identical across executors."""
    def _proj(p: int) -> Column:
        def weigh(x: Column, i: Column) -> Column:
            w = (F.xxhash64(i.cast("string"), F.lit(p)).bitwiseAND(F.lit(1))) * 2 - 1
            return x.cast("double") * w.cast("double")

        return F.aggregate(
            F.transform(vec, weigh),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )

    proj = [_proj(p) for p in range(n_planes)]
    bucket = F.lit(0)
    for p, pr in enumerate(proj):
        bucket = bucket + F.when(pr > 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (plus brute-force fallback none — recall measured in tests)."""
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        hyperplane_bucket(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        hyperplane_bucket(F.col(vec_col)).alias("bucket"),
    )
    scored = v.join(F.broadcast(q), on="bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("vec")), 6).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
            "sim",
            "rank",
        )
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer (pyspark.ml)
    assigns every vector to a cell; a query probes only its n_probe
    nearest cells. The index-build is one MLlib fit (sampled at scale);
    search cost drops from O(N) to O(N·n_probe/n_cells) per query.

    Centroids are collected to the driver (n_cells × dim floats — tiny)
    and inlined as literals, so cell assignment of queries is pure
    column arithmetic; no model object ships to executors at query time.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(train)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]

    def cell_distances(vec: Column) -> Column:
        """Array of squared L2 distances to each centroid (literal)."""
        return F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(x) for x in c]),
                        lambda a, b: (a.cast("double") - b)
                        * (a.cast("double") - b),
                    ),
                    F.lit(0.0).cast("double"),
                    lambda acc, x: acc + x,
                )
                for c in centroids
            ]
        )

    def nearest_cells(vec: Column, n: int) -> Column:
        d = cell_distances(vec)
        ranked = F.array_sort(
            F.zip_with(
                d,
                F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                lambda dist, i: F.struct(dist.alias("d"), i.alias("cell")),
            )
        )
        return F.transform(F.slice(ranked, 1, n), lambda s: s["cell"])

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        nearest_cells(F.col(vec_col), 1)[0].alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(nearest_cells(F.col(vec_col), n_probe)).alias("cell"),
    )
    scored = v.join(F.broadcast(q), on="cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("vec")), 6).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
            "sim",
            "rank",
        )
    )


def embedding_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key."""
    v = vectors.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.blk") == F.col("b.blk"))
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").cast("bigint").alias("vec_a"),
            F.col("b.vid").cast("bigint").alias("vec_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
