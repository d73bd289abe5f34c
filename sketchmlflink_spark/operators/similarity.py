"""Similarity search over the `embeddings` table (array<float> column).

Baseline: brute-force cosine top-k — exact, hash-checked against DuckDB.
Scale path: random-hyperplane LSH bucketing so the candidate set per
query is a bucket, not the full corpus (the brute-force cross join is
O(n·q); at 100 TB the LSH variant is the one you run).

All dot products are Catalyst higher-order functions (aggregate/zip_with)
— sequential-order double math that DuckDB's list_dot_product reproduces
bit-for-bit, so cosine values hash-match without tolerance games.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sketchmlflink_spark.functions.vector import as_double_array, cosine, dot, norm2
from sketchmlflink_spark.operators.relational import t
from sketchmlflink_spark.registry import register

KNN_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
LSH_PLANES = 6
EMBED_DIM = 64

_rng = random.Random(1234)
LSH_HYPERPLANES = [[_rng.gauss(0.0, 1.0) for _ in range(EMBED_DIM)] for _ in range(LSH_PLANES)]


# --------------------------------------------------------------------------
# s01 — brute-force cosine top-k (correctness baseline).
# --------------------------------------------------------------------------
@register(
    "s01_knn_cosine_brute",
    oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS (
    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
           list_dot_product(q.v, c.v)
             / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
    FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND c.vec_id != q.vec_id
)
SELECT q_id, n_id, CAST(rnk AS INT) AS rank, round(cos, 6) AS cosine
FROM (
    SELECT q_id, n_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
    FROM pairs
)
WHERE rnk <= {KNN_K}
""",
    tags=("similarity", "knn"),
)
def s01_knn_cosine_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast the (small) query set against the corpus; top-k per
    query via row_number with a deterministic tiebreak."""
    emb = t(spark, sf_dir, "embeddings").select("vec_id", as_double_array("embedding").alias("v"))
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("n_id"), F.col("v").alias("cv"))
    pairs = (
        F.broadcast(q)
        .join(c, F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= KNN_K)
        .select("q_id", "n_id", F.col("rnk").cast("int").alias("rank"), F.round("cos", 6).alias("cosine"))
    )


# --------------------------------------------------------------------------
# s02 — global top-20 most-similar pairs (embedding-cosine near-dup).
# --------------------------------------------------------------------------
@register(
    "s02_top_similar_pairs",
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
ORDER BY list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) DESC,
         a.vec_id, b.vec_id
LIMIT 20
""",
    tags=("similarity", "neardup"),
)
def s02_top_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs top-20 — the embedding-cosine near-dup check.
    O(n²): correctness anchor at test scale; d04/s03 are the scale
    paths (LSH candidates instead of the cross product)."""
    emb = t(spark, sf_dir, "embeddings").select("vec_id", as_double_array("embedding").alias("v"))
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    cos = cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc("id_a"), F.asc("id_b"))
        .limit(20)
        .select("id_a", "id_b", F.round("cos", 6).alias("cosine"))
    )


# --------------------------------------------------------------------------
# s03 — LSH-bucketed approximate NN (the scale path).
# --------------------------------------------------------------------------
def hyperplane_bucket(v_col) -> F.Column:
    """Sign pattern against LSH_PLANES fixed random hyperplanes → int bucket."""
    bucket = F.lit(0)
    for i, plane in enumerate(LSH_HYPERPLANES):
        p = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(v_col, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(emb: DataFrame, n_queries: int = N_QUERIES, k: int = 3) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's hyperplane
    bucket. One shuffle on the bucket id; never a cross join."""
    withb = emb.select("vec_id", "v", hyperplane_bucket(F.col("v")).alias("bucket"))
    q = withb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "bucket"
    )
    c = withb.select(F.col("vec_id").alias("n_id"), F.col("v").alias("cv"), "bucket")
    pairs = q.join(c, ["bucket"]).where(F.col("n_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        pairs.select("q_id", "n_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "n_id", F.col("rnk").cast("int").alias("rank"), F.round("cos", 6).alias("cosine"))
    )


@register(
    "s03_ann_lsh_cosine",
    oracle=None,  # LSH bucketing not oracle-expressible; recall vs s01 is pytest-checked
    tags=("similarity", "ann", "lsh"),
)
def s03_ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select("vec_id", as_double_array("embedding").alias("v"))
    return ann_lsh_topk(emb)


# --------------------------------------------------------------------------
# s04 — embedding norm stats per label (sanity surface for the vector math).
# --------------------------------------------------------------------------
@register(
    "s04_embedding_norms",
    oracle="""
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[])))), 4) AS avg_norm
FROM embeddings
GROUP BY label
""",
    tags=("similarity", "agg"),
)
def s04_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    v = as_double_array("embedding")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg(norm2(v)), 4).alias("avg_norm"),
    )


# --------------------------------------------------------------------------
# s05 — IVF (inverted-file) approximate NN: k-means coarse quantizer,
# probe the nprobe nearest inverted lists, exact cosine within them.
# --------------------------------------------------------------------------
IVF_K = 8
IVF_NPROBE = 2
IVF_ITERS = 3


def _centroid_dist2(v_col, centroid: list[float]) -> F.Column:
    """Squared L2 distance to a fixed centroid, minus the ||v||² term
    (constant per row, irrelevant for argmin): ||c||² − 2·v·c."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    c2 = float(sum(x * x for x in centroid))
    return F.lit(c2) - 2.0 * dot(v_col, c)


def _nearest_clusters(v_col, centroids: list[list[float]], n: int) -> F.Column:
    """array<int> of the n nearest centroid ids (deterministic tiebreak
    on centroid id via struct ordering)."""
    ranked = F.sort_array(
        F.array(
            *[
                F.struct(_centroid_dist2(v_col, c).alias("d"), F.lit(i).alias("cid"))
                for i, c in enumerate(centroids)
            ]
        )
    )
    return F.slice(ranked, 1, n).getField("cid")


def ivf_train_centroids(
    emb: DataFrame, k: int = IVF_K, iters: int = IVF_ITERS
) -> list[list[float]]:
    """Distributed Lloyd's k-means over the embedding column.

    Seeded/deterministic: init = k rows picked by xxhash64 order (a
    deterministic pseudo-random sample). Each iteration is one
    broadcast-assignment map (centroids are literals inside codegen —
    no shuffle) + one posexplode/groupBy mean (shuffles k·dim tiny
    rows). Centroids live on the driver (k·dim doubles), exactly like
    the reference broadcasts its weight vector each epoch
    (SketchGradientDescent.scala:195)."""
    init = (
        emb.select("vec_id", "v")
        .orderBy(F.xxhash64(F.col("vec_id")))
        .limit(k)
        .collect()
    )
    centroids = [list(r.v) for r in init]
    for _ in range(iters):
        assigned = emb.select(
            _nearest_clusters(F.col("v"), centroids, 1)[0].alias("cluster"), "v"
        )
        means = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(F.sort_array(F.collect_list(F.struct("pos", "m"))).alias("ps"))
            .collect()
        )
        new = {r.cluster: [p.m for p in r.ps] for r in means}
        centroids = [new.get(i, centroids[i]) for i in range(k)]
    return centroids


def ivf_ann_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = 3,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF search: corpus partitioned into inverted lists by nearest
    centroid; each query probes its nprobe nearest lists and scans only
    those. The join key is the (tiny-cardinality) cluster id, so the
    candidate set per query is ~nprobe/k of the corpus — the 100 TB
    path, vs the brute-force cross join in s01."""
    centroids = ivf_train_centroids(emb)
    corpus = emb.select(
        F.col("vec_id").alias("n_id"),
        F.col("v").alias("cv"),
        _nearest_clusters(F.col("v"), centroids, 1)[0].alias("cluster"),
    )
    q = (
        emb.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.explode(_nearest_clusters(F.col("v"), centroids, nprobe)).alias("cluster"),
        )
    )
    pairs = F.broadcast(q).join(corpus, ["cluster"]).where(F.col("n_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        pairs.select("q_id", "n_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "n_id", F.col("rnk").cast("int").alias("rank"), F.round("cos", 6).alias("cosine"))
    )


@register(
    "s05_ivf_ann_cosine",
    oracle=None,  # k-means partitioning isn't oracle-expressible; recall vs s01 is pytest-checked
    tags=("similarity", "ann", "ivf"),
)
def s05_ivf_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select("vec_id", as_double_array("embedding").alias("v"))
    return ivf_ann_topk(emb)
