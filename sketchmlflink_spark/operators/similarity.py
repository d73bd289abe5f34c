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

from sketchmlflink_spark.functions import zround
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
S01_ORACLE = f"""
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
"""


@register(
    "s01_knn_cosine_brute",
    oracle=S01_ORACLE,
    tags=("similarity", "knn"),
    scale_guard_sf=1.0,  # labeled quadratic correctness anchor
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
ORDER BY round(list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) DESC,
         a.vec_id, b.vec_id
LIMIT 20
""",
    tags=("similarity", "neardup"),
    scale_guard_sf=1.0,  # labeled quadratic correctness anchor
)
def s02_top_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs top-20 — the embedding-cosine near-dup check.
    Exact all-pairs is inherently O(n²) FLOPs, but since round 3 the
    pairs come from d06's distributed block-pair dgemm kernel
    (`exact_cosine_pairs` at threshold −1 = every pair) instead of a
    Catalyst cross-join: task memory is bounded by two blocks, the
    FLOPs run in numpy dgemm, and the global top-20 is a
    TakeOrderedAndProject over the kernel's output (20 rows per
    partition cross the shuffle, not the n²/2 pair stream). Ordering
    is on the 6dp-ROUNDED cosine + ids in both engines, so boundary
    ties are deterministic. d04/s03 remain the sub-quadratic scale
    paths (LSH candidates instead of all pairs).

    Since round 12 the kernel emits only each block-pair group's top-20
    under the same total order (``per_group_top`` — see
    exact_cosine_pairs for the containment proof): the global top-20 is
    unchanged, but 20 rows per group cross the Python→JVM boundary
    instead of the full n²/2 pair stream (2M Arrow rows from one task at
    sf0.1 — measured 3.3 s isolated, ~0.5 s after; guide §2.3/§8)."""
    from sketchmlflink_spark.operators.dedup import exact_cosine_pairs

    emb = t(spark, sf_dir, "embeddings").select("vec_id", as_double_array("embedding").alias("v"))
    pairs = exact_cosine_pairs(emb, threshold=-1.01, per_group_top=20)
    return (
        pairs.orderBy(F.desc("cosine"), F.asc("id_a"), F.asc("id_b"))
        .limit(20)
        .select("id_a", "id_b", "cosine")
    )


# --------------------------------------------------------------------------
# s03 — LSH-bucketed approximate NN (the scale path).
# --------------------------------------------------------------------------
def hyperplane_bucket(v_col) -> F.Column:
    """Sign pattern against LSH_PLANES fixed random hyperplanes → int bucket.

    The Catalyst-expression form (kept as the semantic reference and for
    tests): 6 interpreted ``aggregate(zip_with(...))`` dot folds per row.
    The corpus-scale scan uses _hyperplane_buckets (the numpy kernel,
    bit-exact — same IEEE op sequence) since round 12."""
    bucket = F.lit(0)
    for i, plane in enumerate(LSH_HYPERPLANES):
        p = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(v_col, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def _hyperplane_buckets(emb: DataFrame) -> DataFrame:
    """(vec_id, v) → (vec_id, v, bucket): the s03 signing scan as a numpy
    partition kernel (optimization guide §4.2; the d07/_d07_exploded
    recipe, dedup.py:973). The Catalyst form ran LSH_PLANES interpreted
    ``aggregate(zip_with(...))`` higher-order dot folds per row — at sf1
    that is 120k interpreted 64-dim folds for what is ~7.7M flops.

    BIT-EXACT with the expression form (and with DuckDB's sequential
    list_dot_product, which the s03/s14 oracles replay from the same
    hyperplane literals): the kernel accumulates over dimensions in
    ascending index order, one rounded multiply + one rounded add per
    step from a 0.0 start — the identical IEEE op sequence per
    (row, plane), vectorized across rows. Signs (and therefore buckets)
    can never differ; pinned by
    tests/test_kernel_parity.py::test_hyperplane_bucket_kernel_matches_expression."""
    import numpy as np
    import pandas as pd

    from sketchmlflink_spark.session import ensure_workers_can_import

    ensure_workers_can_import(emb.sparkSession)
    P = np.asarray(LSH_HYPERPLANES, dtype=np.float64)  # (LSH_PLANES, 64)
    weights = (1 << np.arange(LSH_PLANES)).astype(np.int64)

    def sign_buckets(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            vcol = pdf["v"].to_numpy()
            V = np.stack(vcol)
            acc = np.zeros((n, LSH_PLANES))
            for d in range(min(V.shape[1], P.shape[1])):
                acc = acc + V[:, d : d + 1] * P[:, d]
            bucket = ((acc >= 0) @ weights).astype(np.int32)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "v": vcol, "bucket": bucket}
            )

    return emb.mapInPandas(sign_buckets, "vec_id long, v array<double>, bucket int")


def ann_lsh_topk(emb: DataFrame, n_queries: int = N_QUERIES, k: int = 3) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's hyperplane
    bucket. One shuffle on the bucket id; never a cross join. The signing
    scan is the numpy kernel (_hyperplane_buckets); the candidate verify
    stays Catalyst — at sf1 it touches only ~3.8k candidate pairs
    (profiled r12) vs the 120k corpus-scale plane-dots the kernel
    absorbs."""
    withb = _hyperplane_buckets(emb)
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


def _duck_plane(plane: list[float]) -> str:
    """Render a hyperplane as a DuckDB DOUBLE[] literal. repr() is the
    shortest round-trip form, so DuckDB parses back the bit-identical
    double and its sequential list_dot_product fold reproduces Spark's
    ``dot`` exactly — signs (and therefore buckets) can never differ."""
    return "[" + ", ".join(repr(x) for x in plane) + "]"


def _s03_body() -> str:
    """CTE chain ending in ``lsh_arm`` (q_id, n_id, rnk, cos) — the LSH
    arm's top-3, replayed from the literal hyperplanes."""
    bucket = "\n         + ".join(
        f"(CASE WHEN list_dot_product(v, {_duck_plane(p)}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(LSH_HYPERPLANES)
    )
    return f"""
lshb AS MATERIALIZED (
    SELECT vec_id, v,
           {bucket} AS bucket
    FROM e
),
lsh_arm AS (
    SELECT q_id, n_id, rnk, cos
    FROM (
        SELECT q_id, n_id, cos,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
        FROM (
            SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                   list_dot_product(q.v, c.v)
                     / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
            FROM lshb q JOIN lshb c ON q.bucket = c.bucket
            WHERE q.vec_id < {N_QUERIES} AND c.vec_id != q.vec_id
        )
    )
    WHERE rnk <= 3
)"""


def _s03_oracle() -> str:
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
{_s03_body()}
SELECT q_id, n_id, CAST(rnk AS INT) AS rank, round(cos, 6) AS cosine
FROM lsh_arm
"""


@register(
    "s03_ann_lsh_cosine",
    oracle=_s03_oracle(),
    tags=("similarity", "ann", "lsh"),
)
def s03_ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-oracled since round 8: the hyperplanes are fixed literal
    constants and ``dot`` is a sequential fold, so the whole pipeline —
    sign pattern → bucket equi-join → per-query top-k — is replayed by
    DuckDB byte-for-byte (the d14 pattern: an engine-portable hash
    family makes an "approximate" index exactly auditable)."""
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
       round(CAST(sum(CAST(round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                       CAST(embedding AS DOUBLE[]))), 12)
                           AS DECIMAL(25,12))) AS DOUBLE) / count(*), 4) AS avg_norm
FROM embeddings
GROUP BY label
""",
    tags=("similarity", "agg"),
)
def s04_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector norm fixed as 12-dp DECIMAL so the per-label mean is
    an exact order-free sum divided once (t12/t15 recipe, round 8)."""
    emb = t(spark, sf_dir, "embeddings")
    v = as_double_array("embedding")
    norm_dec = F.round(norm2(v), 12).cast("decimal(25,12)")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.sum(norm_dec).cast("double") / F.count(F.lit(1)), 4).alias("avg_norm"),
    )


# --------------------------------------------------------------------------
# s05 — IVF (inverted-file) approximate NN: k-means coarse quantizer,
# probe the nprobe nearest inverted lists, exact cosine within them.
# --------------------------------------------------------------------------
IVF_K = 8
IVF_NPROBE = 2
IVF_ITERS = 3


IVF_TRAIN_CAP = 4096

# Index-build arithmetic lives on a fixed-point grid: every coordinate
# is quantized to 1e-6 (QSCALE grid units) and all Lloyd distances,
# assignments, probe selections, and ADC scores are EXACT int64 —
# order-free and engine-portable. This is what makes the IVF/PQ index
# BUILD bitwise reproducible run-to-run (and replayable by the DuckDB
# oracle): the float version's BLAS accumulation order made centroid
# means — and therefore list assignments — probabilistically stable,
# the same latent-nondeterminism class as the round-7 q05 money-sum
# flip, just hiding in an index instead of an aggregate. Quantizing an
# index build is standard practice (scalar-quantized faiss indexes);
# 1e-6 is far below any embedding's noise floor, and the SEARCH-side
# similarity values stay exact float cosines on the raw vectors.
QSCALE = 1_000_000.0


def q_quantize(X):
    """float (n, d) → int64 grid units: floor(x·1e6 + 0.5) — exact
    half-up, one multiply + one add + one floor, reproduced verbatim by
    the oracle (DuckDB round() is half-away, numpy round() half-even;
    floor(+0.5) sidesteps both)."""
    import numpy as np

    return np.floor(X * QSCALE + 0.5).astype(np.int64)


def q_normalize_int(Q):
    """L2-normalize int64 grid vectors back onto the grid. The norm is
    sqrt of an EXACT integer (Σq² < 2⁵³ at dim 64), so the per-element
    (q / s) · 1e6 + 0.5 floor chain is deterministic IEEE on
    deterministic inputs — bit-identical in numpy and DuckDB."""
    import numpy as np

    n2 = (Q * Q).sum(1)
    s = np.sqrt(n2.astype(np.float64))
    return np.floor((Q / s[:, None]) * QSCALE + 0.5).astype(np.int64)


def int_d2(Xq, Cq):
    """(n, d) × (k, d) int64 → (n, k) EXACT squared distances. int64
    arithmetic is associative — no accumulation-order dependence; at
    QSCALE=1e6 and dim 64 the sums stay < 2⁶³ for |x| up to ~40."""
    return ((Xq[:, None, :] - Cq[None, :, :]) ** 2).sum(-1)


def int_mean_halfup(s, n):
    """Per-dimension half-up (away-from-zero) integer mean, staying on
    the grid: sign(s)·((2|s| + n) // (2n)). Positive-only inside the
    floor-division, so DuckDB's truncating `//` and Python's flooring
    `//` agree."""
    import numpy as np

    return np.sign(s) * ((2 * np.abs(s) + n) // (2 * n))


def lloyd_int(Xq, k: int, iters: int):
    """Lloyd's k-means entirely in exact int64 grid arithmetic:
    assignment by exact integer d², ties to the lowest cluster index
    (numpy argmin = first occurrence), centroid update rounded half-up
    back onto the grid, empty clusters keep their previous centroid.
    Every step is order-free ⇒ the trained quantizer is a pure function
    of (sample order, k, iters) — replayable as unrolled SQL CTEs."""
    import numpy as np

    C = Xq[:k].copy()
    for _ in range(iters):
        cl = int_d2(Xq, C).argmin(1)
        for j in range(k):
            m = cl == j
            if m.any():
                C[j] = int_mean_halfup(Xq[m].sum(0), int(m.sum()))
    return C


def sample_by_md5(emb: DataFrame, cap: int):
    """The bounded training sample, ordered by md5(vec_id) — an
    engine-portable shuffle both Spark and DuckDB compute byte-for-byte
    (the d14 lesson: xxhash64 order was Spark-only, which alone made
    the index build non-replayable)."""
    return (
        emb.select("vec_id", "v")
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(int(cap))
        .collect()
    )


def ivf_train_centroids(
    emb: DataFrame, k: int = IVF_K, iters: int = IVF_ITERS, sample_cap: int | None = IVF_TRAIN_CAP
):
    """k-means coarse quantizer → numpy (k, dim) int64 centroid matrix
    in QSCALE grid units.

    Default path (``sample_cap`` set) is the faiss/IVF-standard design:
    train on a BOUNDED deterministic sample (first ``sample_cap`` rows
    by md5(vec_id) order) with Lloyd iterations running driver-side in
    numpy. Centroid quality depends on sample size per centroid, not
    corpus size, so at 100 TB the sample (cap·dim ints, ~2 MB here)
    is all that ever leaves the executors and training costs ONE Spark
    job regardless of ``iters``. ``sample_cap=None`` switches to
    full-corpus distributed Lloyd (one map-side-combine job per
    iteration) for when the quantizer must see every row; both arms do
    the identical exact-int update, so their parity is exact equality,
    not a tolerance (pytest asserts this)."""
    import numpy as np

    if sample_cap is not None:
        rows = sample_by_md5(emb, sample_cap)
        X = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
        return lloyd_int(q_quantize(X), k, iters)
    return _ivf_train_centroids_distributed(emb, k, iters)


def _ivf_train_centroids_distributed(emb: DataFrame, k: int, iters: int):
    """Full-corpus distributed Lloyd: each iteration is ONE job — every
    partition assigns its block to the broadcast centroids with an
    exact-int numpy argmin and emits k partial (sum, count) rows, merged
    by a tiny hash aggregate (classic map-side-combine k-means).
    Partials are int64, so the merge is EXACT regardless of partition
    count or merge order — the distributed arm equals the sampled arm
    bit-for-bit whenever the sample covers the corpus. Centroids stay
    numpy on the driver (k·dim ints), like the reference broadcasts its
    weight vector each epoch (SGD:195). An earlier Catalyst-expression
    variant embedded centroid literals in codegen, recompiling ~1 s of
    generated Java per iteration — numpy + broadcast avoids
    recompilation entirely."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    init = (
        emb.select("vec_id", "v")
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(k)
        .collect()
    )
    C = q_quantize(np.stack([np.asarray(r["v"], dtype=np.float64) for r in init]))
    dim = C.shape[1]
    sum_cols = ", ".join(f"s{i} long" for i in range(dim))
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(C)

        def partials(batches):
            cents = bc.value
            kk, dd = cents.shape
            sums = np.zeros((kk, dd), dtype=np.int64)
            cnt = np.zeros(kk, dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                Xq = q_quantize(np.stack(pdf["v"].to_numpy()))
                cl = int_d2(Xq, cents).argmin(axis=1)
                np.add.at(sums, cl, Xq)
                cnt += np.bincount(cl, minlength=kk)
            out = {"cluster": np.arange(kk), "n": cnt}
            for i in range(dd):
                out[f"s{i}"] = sums[:, i]
            yield pd.DataFrame(out)

        rows = (
            emb.select("v")
            .mapInPandas(partials, f"cluster long, n long, {sum_cols}")
            .groupBy("cluster")
            .agg(F.sum("n").alias("n"), *[F.sum(f"s{i}").alias(f"s{i}") for i in range(dim)])
            .collect()
        )
        bc.destroy()
        for r in rows:
            if r["n"] > 0:
                s = np.array([r[f"s{i}"] for i in range(dim)], dtype=np.int64)
                C[r["cluster"]] = int_mean_halfup(s, int(r["n"]))
    return C


def ivf_ann_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = 3,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF search: the corpus is partitioned into inverted lists by
    nearest centroid; each query probes its nprobe nearest lists and
    scans only those — ~nprobe/IVF_K of the corpus instead of the s01
    cross join. One pass over the corpus: each partition block assigns
    itself to lists (exact-int numpy argmin vs broadcast int centroids,
    so the partitioning of the INDEX is bitwise deterministic), computes
    exact cosine against the (tiny, broadcast) query set for matching
    lists, and only (q_id, n_id, cos) candidate rows shuffle into the
    per-query top-k window."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    C = ivf_train_centroids(emb)
    qrows = emb.where(F.col("vec_id") < n_queries).collect()
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r["v"], dtype=np.float64) for r in qrows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qd2 = int_d2(q_quantize(Q), C)
    probe_sets = np.argsort(qd2, axis=1, kind="stable")[:, :nprobe]
    bc = spark.sparkContext.broadcast((q_ids, Qn, probe_sets, C))

    def block_search(batches):
        q_ids_, Qn_, probes_, cents = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            X = np.stack(pdf["v"].to_numpy())
            cl = int_d2(q_quantize(X), cents).argmin(axis=1)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            cos_all = Xn @ Qn_.T  # block × queries
            out_q, out_n, out_c = [], [], []
            for qi in range(len(q_ids_)):
                mask = np.isin(cl, probes_[qi]) & (ids != q_ids_[qi])
                out_q.append(np.full(mask.sum(), q_ids_[qi], dtype=np.int64))
                out_n.append(ids[mask])
                out_c.append(cos_all[mask, qi])
            yield pd.DataFrame(
                {
                    "q_id": np.concatenate(out_q),
                    "n_id": np.concatenate(out_n),
                    "cos": np.concatenate(out_c),
                }
            )

    pairs = emb.mapInPandas(block_search, "q_id long, n_id long, cos double")
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "n_id", F.col("rnk").cast("int").alias("rank"), F.round("cos", 6).alias("cosine"))
    )


# --- DuckDB replay of the int-grid index build (s05/s06/s14 oracles) ---
# The quantized trainer (q_quantize / lloyd_int / int_mean_halfup) is a
# pure function of the md5-ordered sample, so the whole index build
# unrolls into SQL CTEs whose integer arithmetic matches numpy's
# bit-for-bit — the d14 "engine-portable hash family" idea applied to a
# vector index instead of a MinHash signature.

def _duck_d2(qcol: str, ccol: str, dim: int) -> str:
    """Exact integer squared distance between two BIGINT lists."""
    return (
        f"list_sum(list_transform(range({dim}), "
        f"j -> ({qcol}[j+1]-{ccol}[j+1])*({qcol}[j+1]-{ccol}[j+1])))"
    )


def _duck_idot(qcol: str, ccol: str, dim: int) -> str:
    """Exact integer dot product between two BIGINT lists."""
    return f"list_sum(list_transform(range({dim}), j -> {qcol}[j+1]*{ccol}[j+1]))"


_DUCK_QE = """
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qe AS MATERIALIZED (SELECT vec_id, v,
              list_transform(v, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS qv
       FROM e)"""


def _duck_sample(src: str, cap: int, name: str = "samp") -> str:
    return f"""
{name} AS MATERIALIZED (SELECT vec_id, qv,
                row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS rk
         FROM {src} QUALIFY rk <= {cap})"""


def _duck_lloyd(prefix: str, pts: str, k: int, iters: int, dim: int, group: str = "") -> str:
    """Unrolled exact-int Lloyd CTE chain. ``pts`` must expose (rk, qv
    [, {group}]); emits ``{prefix}{iters}`` with (cluster, cv [, group]).
    Init = first k rows in sample order (per group); assignment ties go
    to the lowest cluster; the half-up integer mean stays on the grid;
    empty clusters keep the previous centroid (LEFT JOIN + coalesce)."""
    g_sel = f"{group}, " if group else ""
    g_part = f"{group}, " if group else ""
    g_join = f" AND c.{group} = s.{group}" if group else ""
    g_using = f"({group}, cluster)" if group else "(cluster)"
    out = [
        f"""
{prefix}0 AS MATERIALIZED (SELECT {g_sel}rk - 1 AS cluster, qv AS cv FROM {pts} WHERE rk <= {k})"""
    ]
    for i in range(1, iters + 1):
        p = f"{prefix}{i - 1}"
        out.append(f"""
{prefix}a{i} AS MATERIALIZED (
    SELECT {g_sel}vec_rk, qv, cluster,
           row_number() OVER (PARTITION BY {g_part}vec_rk ORDER BY d2, cluster) AS rn
    FROM (SELECT {('s.' + group + ', ') if group else ''}s.rk AS vec_rk, s.qv, c.cluster,
                 {_duck_d2('s.qv', 'c.cv', dim)} AS d2
          FROM {pts} s JOIN {p} c ON TRUE{g_join})
),
{prefix}m{i} AS MATERIALIZED (
    SELECT {g_sel}cluster, d, sum(x) AS sx, count(*) AS n
    FROM (SELECT {g_sel}cluster, unnest(qv) AS x, unnest(range({dim})) AS d
          FROM {prefix}a{i} WHERE rn = 1)
    GROUP BY {g_sel}cluster, d
),
{prefix}{i} AS MATERIALIZED (
    SELECT {('p.' + group + ' AS ' + group + ', ') if group else ''}p.cluster, coalesce(u.cv, p.cv) AS cv
    FROM {p} p LEFT JOIN (
        SELECT {g_sel}cluster,
               list(CAST(CAST(sign(sx) AS BIGINT) * ((2*abs(sx) + n) // (2*n)) AS BIGINT)
                    ORDER BY d) AS cv
        FROM {prefix}m{i} GROUP BY {g_sel}cluster) u USING {g_using}
)""")
    return ",".join(out)


def _duck_assign(name: str, pts: str, cents: str, dim: int, id_col: str = "vec_id") -> str:
    """Nearest-centroid assignment of ``pts`` (exposing id_col, qv) to
    ``cents`` (cluster, cv), ties to the lowest cluster."""
    return f"""
{name} AS MATERIALIZED (
    SELECT {id_col}, cluster
    FROM (SELECT p.{id_col}, c.cluster,
                 row_number() OVER (PARTITION BY p.{id_col} ORDER BY
                     {_duck_d2('p.qv', 'c.cv', dim)}, c.cluster) AS rn
          FROM {pts} p CROSS JOIN {cents} c)
    WHERE rn = 1
)"""


def _s05_body(dim: int = EMBED_DIM) -> str:
    """CTE chain ending in ``ivf_arm`` (q_id, n_id, rnk, cos) — the IVF
    arm's top-3, replayed from the int-grid index build."""
    return f"""{_duck_sample('qe', IVF_TRAIN_CAP)},
{_duck_lloyd('c', 'samp', IVF_K, IVF_ITERS, dim)},
{_duck_assign('assign', 'qe', f'c{IVF_ITERS}', dim)},
probes AS (
    SELECT q_id, cluster
    FROM (SELECT p.vec_id AS q_id, c.cluster,
                 row_number() OVER (PARTITION BY p.vec_id ORDER BY
                     {_duck_d2('p.qv', 'c.cv', dim)}, c.cluster) AS rn
          FROM qe p CROSS JOIN c{IVF_ITERS} c
          WHERE p.vec_id < {N_QUERIES})
    WHERE rn <= {IVF_NPROBE}
),
ivf_arm AS (
    SELECT q_id, n_id, rnk, cos
    FROM (
        SELECT q_id, n_id, cos,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
        FROM (
            SELECT q.vec_id AS q_id, n.vec_id AS n_id,
                   list_dot_product(q.v, n.v)
                     / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))) AS cos
            FROM qe q
            JOIN probes p ON p.q_id = q.vec_id
            JOIN assign a ON a.cluster = p.cluster
            JOIN qe n ON n.vec_id = a.vec_id AND n.vec_id != q.vec_id
            WHERE q.vec_id < {N_QUERIES}
        )
    )
    WHERE rnk <= 3
)"""


def _s05_oracle() -> str:
    return f"""
WITH {_DUCK_QE},
{_s05_body()}
SELECT q_id, n_id, CAST(rnk AS INT) AS rank, round(cos, 6) AS cosine
FROM ivf_arm
"""


@register(
    "s05_ivf_ann_cosine",
    oracle=_s05_oracle(),
    tags=("similarity", "ann", "ivf"),
)
def s05_ivf_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-oracled since round 8: the coarse quantizer trains on the
    exact int64 grid from an md5-ordered sample, so DuckDB replays the
    ENTIRE index build — sample, three Lloyd iterations, corpus
    assignment, probe selection — as unrolled CTEs, then the candidate
    cosines and top-k exactly as s01. An ANN index whose BUILD is
    bitwise replayable by a second engine is the strongest audit story
    this surface has."""
    emb = t(spark, sf_dir, "embeddings").select("vec_id", as_double_array("embedding").alias("v"))
    return ivf_ann_topk(emb)


# --------------------------------------------------------------------------
# s06 — IVF-PQ: product-quantized codes + ADC scan + exact re-rank.
#
# The memory-scale path beyond s05: the corpus is stored as PQ codes
# (PQ_M uint8 codes per vector = 8 bytes vs 256 bytes of floats, 32×),
# so at 100 TB of raw embeddings the scanned representation is ~3 TB and
# fits the cluster's page cache. Search is faiss-IVFPQ-shaped:
#   1. coarse k-means quantizer (bounded-sample training, one collect);
#   2. per-subspace codebooks trained on COARSE RESIDUALS (x − C[list]),
#      the faiss default — residuals are smaller-variance than raw
#      vectors, so 4-bit codebooks spend their 16 cells where the data
#      actually is;
#   3. encode: one corpus pass → (vec_id, list_id, codes) — the stored
#      compressed index;
#   4. ADC scan: per (query, probed list) look-up tables of
#      q·(C[l] + codeword); each code block scores as PQ_M table
#      lookups, emits only its block-local top-PQ_CAND per query;
#   5. exact re-rank: the ≤ n_queries·PQ_CAND candidate ids join back
#      to the raw vectors (broadcast — candidates are tiny) for true
#      cosine, then the per-query top-k window.
# Shuffle: candidates only — never vectors, never the code table.
# --------------------------------------------------------------------------
PQ_M = 8  # subspaces (64 dims → 8 dims each)
PQ_KSUB = 16  # centroids per subspace (4-bit codes)
PQ_ITERS = 5
PQ_CAND = 32  # ADC candidates per query fed to exact re-rank


def pq_train(Xq, Cq, m: int = PQ_M, ksub: int = PQ_KSUB, iters: int = PQ_ITERS):
    """Per-subspace Lloyd on coarse residuals → (m, ksub, dsub) int64
    codebooks in grid units.

    Trains on the same bounded sample as the coarse quantizer (one
    driver-side numpy pass; cost is sample-size-bound, corpus-size-free).
    Deterministic init: first ksub rows of each subspace in sample
    order. Residuals of grid ints are grid ints, so the whole training
    is the same exact-int Lloyd as the coarse quantizer — order-free,
    bitwise reproducible, oracle-replayable."""
    import numpy as np

    n, dim = Xq.shape
    dsub = dim // m
    R = Xq - Cq[int_d2(Xq, Cq).argmin(axis=1)]
    books = np.empty((m, ksub, dsub), dtype=np.int64)
    for mi in range(m):
        books[mi] = lloyd_int(R[:, mi * dsub : (mi + 1) * dsub], ksub, iters)
    return books


def ivf_pq_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = 3,
    nprobe: int = IVF_NPROBE,
    cand: int = PQ_CAND,
) -> DataFrame:
    """IVF-PQ ANN (see module-level block comment). All vectors are
    L2-normalized before encoding so PQ-approximated inner product ≈
    cosine; the final answer is EXACT cosine on re-ranked candidates, so
    PQ error only costs recall, never wrong similarity values. Since
    round 8 the whole index side — normalization, coarse + PQ training,
    encoding, ADC scores — runs on the exact int64 grid (see QSCALE), so
    the code table and the ADC candidate cut are bitwise deterministic
    under any partitioning and replayable by the DuckDB oracle."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    # --- train (single bounded-sample collect feeds both quantizers) ---
    rows = sample_by_md5(emb, IVF_TRAIN_CAP)
    X = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    Xn = q_normalize_int(q_quantize(X))
    C = lloyd_int(Xn, IVF_K, IVF_ITERS)
    books = pq_train(Xn, C)
    dsub = Xn.shape[1] // PQ_M

    # --- queries: normalize, pick probe lists, build per-(query, list)
    # ADC tables of q·(C[l] + codeword) decomposed as q·C[l] + q·codeword
    qrows = emb.where(F.col("vec_id") < n_queries).collect()
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r["v"], dtype=np.float64) for r in qrows])
    Qn = q_normalize_int(q_quantize(Q))
    qc = Qn @ C.T  # (nq, IVF_K): q · C[l] — exact int64
    probe_sets = np.argsort(-qc, axis=1, kind="stable")[:, :nprobe]
    # luts[qi, mi, code] = q_sub · codeword (list-independent part) — exact int64
    luts = np.einsum("qmd,mkd->qmk", Qn.reshape(len(Qn), PQ_M, dsub), books)
    bc = spark.sparkContext.broadcast((q_ids, qc, probe_sets, luts, C, books))

    # --- encode: corpus pass → compressed code table ---
    def encode(batches):
        _, _, _, _, cents, bks = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            Vn = q_normalize_int(q_quantize(np.stack(pdf["v"].to_numpy())))
            lst = int_d2(Vn, cents).argmin(axis=1)
            R = Vn - cents[lst]
            codes = np.empty((len(Vn), PQ_M), dtype=np.int64)
            for mi in range(PQ_M):
                codes[:, mi] = int_d2(R[:, mi * dsub : (mi + 1) * dsub], bks[mi]).argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": ids, "list_id": lst, "codes": list(codes)}
            )

    code_table = emb.select("vec_id", "v").mapInPandas(
        encode, "vec_id long, list_id long, codes array<long>"
    )

    # --- ADC scan over codes: block-local top-cand per query ---
    def adc_scan(batches):
        q_ids_, qc_, probes_, luts_, _, _ = bc.value
        nq = len(q_ids_)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            lst = pdf["list_id"].to_numpy(dtype=np.int64)
            codes = np.stack(pdf["codes"].to_numpy())  # (n, PQ_M)
            # q·codeword summed over subspaces, for every row at once —
            # exact int64, so block-local and global cuts can never
            # disagree on a tie
            sub_scores = np.zeros((len(ids), nq), dtype=np.int64)
            for mi in range(PQ_M):
                sub_scores += luts_[:, mi, codes[:, mi]].T  # (n, nq)
            out_q, out_n, out_s = [], [], []
            for qi in range(nq):
                mask = np.isin(lst, probes_[qi]) & (ids != q_ids_[qi])
                if not mask.any():
                    continue
                score = qc_[qi, lst[mask]] + sub_scores[mask, qi]
                # (score desc, n_id asc) — identical to the global
                # window's ordering, so the block-local cut is lossless
                idx = np.lexsort((ids[mask], -score))[:cand]
                out_q.append(np.full(len(idx), q_ids_[qi], dtype=np.int64))
                out_n.append(ids[mask][idx])
                out_s.append(score[idx])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "q_id": np.concatenate(out_q),
                    "n_id": np.concatenate(out_n),
                    "adc": np.concatenate(out_s),
                }
            )

    adc = code_table.mapInPandas(adc_scan, "q_id long, n_id long, adc long")
    wq = Window.partitionBy("q_id").orderBy(F.desc("adc"), F.asc("n_id"))
    cand_ids = (
        adc.withColumn("r", F.row_number().over(wq)).where(F.col("r") <= cand).select("q_id", "n_id")
    )

    # --- exact re-rank: candidates (tiny) broadcast back onto vectors ---
    qdf = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    rerank = (
        F.broadcast(cand_ids)
        .join(emb.select(F.col("vec_id").alias("n_id"), F.col("v").alias("cv")), "n_id")
        .join(F.broadcast(qdf), "q_id")
        .select("q_id", "n_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        rerank.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "n_id", F.col("rnk").cast("int").alias("rank"), F.round("cos", 6).alias("cosine"))
    )


_DUCK_QN = """
qn AS MATERIALIZED (SELECT vec_id, v,
              list_transform(qv, x -> CAST(floor((x / sqrt(CAST(n2 AS DOUBLE))) * 1000000.0 + 0.5) AS BIGINT)) AS qv
       FROM (SELECT vec_id, v, qv,
                    list_sum(list_transform(qv, x -> x*x)) AS n2
             FROM qe))"""


def _s06_body(dim: int = EMBED_DIM) -> str:
    """The shared CTE chain replaying s06's index build + ADC search
    (everything up to the candidate set). Used by the s06 and s14
    oracles."""
    dsub = dim // PQ_M
    f = IVF_ITERS  # final coarse CTE suffix
    bf = PQ_ITERS  # final codebook CTE suffix
    return f"""{_DUCK_QN},
{_duck_sample('qn', IVF_TRAIN_CAP, name='nsamp')},
{_duck_lloyd('cn', 'nsamp', IVF_K, IVF_ITERS, dim)},
mis AS (SELECT unnest(range({PQ_M})) AS mi),
{_duck_assign('sassign', 'nsamp', f'cn{f}', dim, id_col='rk')},
sres AS MATERIALIZED (
    SELECT s.rk, list_transform(range({dim}), j -> s.qv[j+1] - c.cv[j+1]) AS rv
    FROM nsamp s JOIN sassign a USING (rk) JOIN cn{f} c ON c.cluster = a.cluster
),
rsub AS (SELECT rk, mi, rv[mi*{dsub}+1 : mi*{dsub}+{dsub}] AS qv FROM sres CROSS JOIN mis),
{_duck_lloyd('b', 'rsub', PQ_KSUB, PQ_ITERS, dsub, group='mi')},
{_duck_assign('cassign', 'qn', f'cn{f}', dim)},
cres AS MATERIALIZED (
    SELECT n.vec_id, a.cluster, list_transform(range({dim}), j -> n.qv[j+1] - c.cv[j+1]) AS rv
    FROM qn n JOIN cassign a USING (vec_id) JOIN cn{f} c ON c.cluster = a.cluster
),
csub AS (SELECT vec_id, cluster, mi, rv[mi*{dsub}+1 : mi*{dsub}+{dsub}] AS sv FROM cres CROSS JOIN mis),
codes AS MATERIALIZED (
    SELECT vec_id, cluster, mi, code
    FROM (SELECT s.vec_id, s.cluster, s.mi, b.cluster AS code,
                 row_number() OVER (PARTITION BY s.vec_id, s.mi ORDER BY
                     {_duck_d2('s.sv', 'b.cv', dsub)}, b.cluster) AS rn
          FROM csub s JOIN b{bf} b ON b.mi = s.mi)
    WHERE rn = 1
),
qq AS (SELECT vec_id AS q_id, qv FROM qn WHERE vec_id < {N_QUERIES}),
pq_probes AS (
    SELECT q_id, cluster, qcdot
    FROM (SELECT q.q_id, c.cluster, {_duck_idot('q.qv', 'c.cv', dim)} AS qcdot,
                 row_number() OVER (PARTITION BY q.q_id ORDER BY
                     {_duck_idot('q.qv', 'c.cv', dim)} DESC, c.cluster) AS rn
          FROM qq q CROSS JOIN cn{f} c)
    WHERE rn <= {IVF_NPROBE}
),
qsub AS (SELECT q_id, mi, qv[mi*{dsub}+1 : mi*{dsub}+{dsub}] AS sv FROM qq CROSS JOIN mis),
luts AS (
    SELECT s.q_id, b.mi, b.cluster AS code, {_duck_idot('s.sv', 'b.cv', dsub)} AS lut
    FROM qsub s JOIN b{bf} b ON b.mi = s.mi
),
adc AS (
    SELECT p.q_id, k.vec_id AS n_id, max(p.qcdot) + sum(l.lut) AS score
    FROM pq_probes p
    JOIN codes k ON k.cluster = p.cluster
    JOIN luts l ON l.q_id = p.q_id AND l.mi = k.mi AND l.code = k.code
    WHERE k.vec_id != p.q_id
    GROUP BY p.q_id, k.vec_id
),
pq_cand AS (
    SELECT q_id, n_id
    FROM (SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rn
          FROM adc)
    WHERE rn <= {PQ_CAND}
),
pq_arm AS (
    SELECT q_id, n_id, rnk, cos
    FROM (
        SELECT c.q_id, c.n_id,
               list_dot_product(q.v, n.v)
                 / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))) AS cos,
               row_number() OVER (PARTITION BY c.q_id ORDER BY
                   list_dot_product(q.v, n.v)
                     / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))) DESC,
                   c.n_id) AS rnk
        FROM pq_cand c
        JOIN e q ON q.vec_id = c.q_id
        JOIN e n ON n.vec_id = c.n_id
    )
    WHERE rnk <= 3
)"""


def _s06_oracle() -> str:
    return f"""
WITH {_DUCK_QE},
{_s06_body()}
SELECT q_id, n_id, CAST(rnk AS INT) AS rank, round(cos, 6) AS cosine
FROM pq_arm
"""


@register(
    "s06_ivfpq_ann_cosine",
    oracle=_s06_oracle(),
    tags=("similarity", "ann", "ivf", "pq"),
)
def s06_ivfpq_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-oracled since round 8: coarse quantizer, residual PQ
    codebooks, code table, ADC candidate cut — every stage of the
    compressed index runs on the exact int64 grid, so DuckDB replays
    the full build + search as unrolled CTEs and the exact re-rank
    matches s01's cosine arithmetic byte-for-byte."""
    emb = t(spark, sf_dir, "embeddings").select("vec_id", as_double_array("embedding").alias("v"))
    return ivf_pq_topk(emb)


# --------------------------------------------------------------------------
# s07 — per-dimension embedding statistics (drift / normalization audit).
# --------------------------------------------------------------------------
@register(
    "s07_embedding_dim_stats",
    oracle="""
SELECT label,
       CAST(dim - 1 AS INT)            AS dim_idx,
       -- + 0.0: signed-zero normalization — dim means of roughly
       -- centered embeddings sit near 0, so a −1e-7 pre-round value
       -- would hash-split the engines (functions.zround's oracle twin)
       round(CAST(sum(CAST(round(x, 12) AS DECIMAL(25,12))) AS DOUBLE)
             / count(*), 6) + 0.0      AS dim_mean,
       round(min(x), 6) + 0.0          AS dim_min,
       round(max(x), 6) + 0.0          AS dim_max
FROM (
    SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
           generate_subscripts(embedding, 1) AS dim
    FROM embeddings
)
GROUP BY label, dim
""",
    tags=("similarity", "embedding", "stats"),
)
def s07_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(label, dimension) mean/min/max over the embedding column —
    the drift/normalization audit a feature store runs before ANN
    indexing. posexplode is a row-explosion, not a Python UDF: the
    64× row blowup stays JVM-side and collapses in the same stage's
    partial aggregate, so the shuffle carries only (label·dim) partial
    rows, never the exploded data. The mean's per-element value is
    fixed as 12-dp DECIMAL so the sum is exact and order-free (the
    t12/t15 recipe — a plain avg(double) sums in engine order, the q05
    latent class; converted round 8), divided once, rounded once."""
    emb = t(spark, sf_dir, "embeddings").select("label", as_double_array("embedding").alias("v"))
    ex = emb.select("label", F.posexplode("v").alias("dim_idx", "x"))
    x_dec = F.round(F.col("x"), 12).cast("decimal(25,12)")
    return ex.groupBy("label", "dim_idx").agg(
        zround(F.sum(x_dec).cast("double") / F.count(F.lit(1)), 6).alias("dim_mean"),
        zround(F.min("x"), 6).alias("dim_min"),
        zround(F.max("x"), 6).alias("dim_max"),
    )


def _query_cosine_scan(
    emb: DataFrame,
    query_rows: list,
    threshold: float | None = None,
    per_batch_top: int | None = None,
    carry_v: bool = False,
) -> DataFrame:
    """One embarrassingly-parallel corpus pass against a resident query
    block, as a numpy partition kernel (guide §4.2): (vec_id, v) ×
    [(q_id, qv), ...] → (q_id, n_id, cos) with self-pairs dropped.

    The Catalyst form evaluated ``cosine()`` — THREE interpreted
    ``aggregate(zip_with(...))`` 64-dim folds — per (query, row) pair:
    200k interpreted folds at sf1 for s08 (profiled r12). The kernel is
    BIT-EXACT with that expression (and with DuckDB's sequential
    list_dot_product, which the s08/s13 oracles replay): each dot
    accumulates over dimensions in ascending index order, one rounded
    multiply + one rounded add per step from 0.0 (the d07 kernel
    precedent, dedup.py:973), and the cosine is dot/(norm_q · norm_c)
    with the same operand order. Threshold compare (>=) and the
    (cos DESC, n_id ASC) per-batch truncation are order-free.

    ``per_batch_top``: emit only each batch's top-N rows PER QUERY under
    (cos DESC, n_id ASC) — batches partition the corpus, so any row in
    the global top-N ranks ≤ N inside its own batch and a downstream
    orderBy/limit (or row_number ≤ N) returns exactly the rows the full
    stream would (the s02 per-group-top containment argument).

    ``carry_v``: also emit the corpus row's vector (s13's pool carries
    its vectors into the bounded pairwise stage)."""
    import numpy as np
    import pandas as pd

    from sketchmlflink_spark.session import ensure_workers_can_import

    ensure_workers_can_import(emb.sparkSession)
    q_ids = np.asarray([r[0] for r in query_rows], dtype=np.int64)
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in query_rows])
    nq, dim = Q.shape
    # query self-dots: the same ascending-dim one-mul-one-add sequence
    qacc = np.zeros(nq)
    for d in range(dim):
        qacc = qacc + Q[:, d] * Q[:, d]
    q_norm = np.sqrt(qacc)

    def scan(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            V = np.stack(pdf["v"].to_numpy())
            acc = np.zeros((n, nq))
            cacc = np.zeros(n)
            for d in range(min(V.shape[1], dim)):
                acc = acc + V[:, d : d + 1] * Q[:, d]
                cacc = cacc + V[:, d] * V[:, d]
            cos = acc / (q_norm[None, :] * np.sqrt(cacc)[:, None])
            n_ids = pdf["vec_id"].to_numpy()
            valid = n_ids[:, None] != q_ids[None, :]
            if threshold is not None:
                valid &= cos >= threshold
            if per_batch_top is not None and valid.any():
                # rank within (batch, query) under (cos DESC, n_id ASC);
                # ranks > per_batch_top can never reach the global top-N
                neg = np.where(valid, -cos, np.inf)
                order = np.lexsort((n_ids[:, None].repeat(nq, 1), neg), axis=0)
                rank = np.empty_like(order)
                np.put_along_axis(rank, order, np.arange(n)[:, None], axis=0)
                valid &= rank < per_batch_top
            ii, jj = np.nonzero(valid)
            out = {"q_id": q_ids[jj], "n_id": n_ids[ii], "cos": cos[ii, jj]}
            if carry_v:
                out["v"] = pdf["v"].to_numpy()[ii]
            yield pd.DataFrame(out)

    schema = "q_id long, n_id long, cos double" + (
        ", v array<double>" if carry_v else ""
    )
    return emb.mapInPandas(scan, schema)



# --------------------------------------------------------------------------
# s08 — exact cosine range search (threshold all-neighbors).
# --------------------------------------------------------------------------
RANGE_TAU = 0.3  # report every corpus vector with cosine >= tau to a query


@register(
    "s08_range_search_cosine",
    oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       round(list_dot_product(q.v, c.v)
             / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND c.vec_id != q.vec_id
WHERE list_dot_product(q.v, c.v)
      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))
      >= {RANGE_TAU}
""",
    tags=("similarity", "range-search"),
)
def s08_range_search_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (threshold) search: every corpus vector with cosine >=
    RANGE_TAU to any of the N_QUERIES query vectors — the "find all
    neighbors within a radius" dual of s01's top-k.

    Plan shape: the query block is resident in every scan task, so the
    corpus is read ONCE with zero shuffle and only matches are emitted
    — one embarrassingly-parallel pass (at 100 TB; for large query sets
    swap in the s03/s05 bucketed candidate paths). Since round 12 the
    pass is the _query_cosine_scan numpy kernel (bit-exact, see there):
    the broadcast-NL-join form paid 200k interpreted cosine() HOF folds
    at sf1. The 6dp display rounding stays in Catalyst."""
    emb = t(spark, sf_dir, "embeddings").select("vec_id", as_double_array("embedding").alias("v"))
    qrows = [
        (r["vec_id"], r["v"])
        for r in emb.where(F.col("vec_id") < N_QUERIES).collect()
    ]
    matches = _query_cosine_scan(emb, qrows, threshold=RANGE_TAU)
    return matches.select("q_id", "n_id", F.round("cos", 6).alias("cosine"))


# --------------------------------------------------------------------------
# s09 — exact kNN, scale shape: block-local top-k + tiny global merge.
# Same answer (and same oracle) as s01; different physical plan.
# --------------------------------------------------------------------------
@register(
    "s09_knn_blocked_exact",
    oracle=S01_ORACLE,  # bit-identical semantics to s01 — only the plan differs
    tags=("similarity", "knn", "blocked"),
)
def s09_knn_blocked_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k with the plan that survives 100 TB: each scan
    partition computes its LOCAL top-k per query against the broadcast
    query block (numpy dgemm + lexicographic (cos desc, n_id asc)
    selection, Arrow-batched), and only those B·q·k candidate rows — not
    the n·q pair set s01's ranking window shuffles — reach the global
    top-k merge. The local selection uses the same deterministic
    tie-break as the final window, so dropping non-candidates can never
    change the answer; the result (and the DuckDB oracle) is s01's,
    row for row.
    """
    import numpy as np
    import pandas as pd

    from sketchmlflink_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    emb = t(spark, sf_dir, "embeddings").select("vec_id", as_double_array("embedding").alias("v"))
    qrows = emb.where(F.col("vec_id") < N_QUERIES).collect()  # bounded: N_QUERIES rows
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r["v"], dtype=np.float64) for r in qrows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, Qn))

    def block_topk(batches):
        ids_q, Qb = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            X = np.stack(pdf["v"].to_numpy())
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            cos = Qb @ Xn.T  # (nq, nb)
            out_q, out_n, out_c = [], [], []
            for qi in range(len(ids_q)):
                mask = n_ids != ids_q[qi]
                cand_n, cand_c = n_ids[mask], cos[qi][mask]
                # deterministic (cos desc, n_id asc) — identical to the
                # global merge window, so local pruning is lossless
                order = np.lexsort((cand_n, -cand_c))[:KNN_K]
                out_q.extend([ids_q[qi]] * len(order))
                out_n.extend(cand_n[order])
                out_c.extend(cand_c[order])
            yield pd.DataFrame({"q_id": out_q, "n_id": out_n, "cos": out_c})

    cand = emb.mapInPandas(block_topk, "q_id long, n_id long, cos double")
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= KNN_K)
        .select("q_id", "n_id", F.col("rnk").cast("int").alias("rank"), F.round("cos", 6).alias("cosine"))
    )


# --------------------------------------------------------------------------
# s10 — retrieval join: top-k neighbors resolved to document metadata.
# --------------------------------------------------------------------------
@register(
    "s10_retrieval_topk_docs",
    oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS (
    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
           list_dot_product(q.v, c.v)
             / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
    FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND c.vec_id != q.vec_id
),
topk AS (
    SELECT q_id, n_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
    FROM pairs
)
SELECT t.q_id, t.n_id AS doc_id, CAST(t.rnk AS INT) AS rank,
       round(t.cos, 6) AS cosine, d.lang, d.source,
       CAST(d.n_chars AS BIGINT) AS n_chars
FROM topk t JOIN documents d ON t.n_id = d.doc_id
WHERE t.rnk <= {KNN_K}
""",
    tags=("similarity", "retrieval", "knn", "join"),
)
def s10_retrieval_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval join — the RAG-shaped plan: embedding top-k (s01's
    exact kernel) resolved to document metadata (vec_id aligns with
    doc_id in the corpus contract).

    Plan shape for 100 TB: the top-k result is q·k rows (tiny by
    construction), so IT is the broadcast side of the metadata join —
    the documents table is scanned once with its filter/pruning intact
    and never shuffles; no text column is read (metadata projection
    only). Swap the exact kernel for s05/s06's ANN candidates at scale;
    the join shape is unchanged.
    """
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
    topk = (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= KNN_K)
        .select("q_id", "n_id", F.col("rnk").cast("int").alias("rank"), F.round("cos", 6).alias("cosine"))
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    return (
        F.broadcast(topk)
        .join(docs, topk["n_id"] == docs["doc_id"])
        .select(
            "q_id",
            "doc_id",
            "rank",
            "cosine",
            "lang",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
        )
    )


# --------------------------------------------------------------------------
# s11 — scalar-quantized (int8) ANN: the memory-bandwidth scale trick.
# The corpus is scanned as 1-byte-per-dim codes (8× fewer bytes than the
# float64 math s01 streams), candidates re-ranked exactly.
# --------------------------------------------------------------------------
S11_CANDIDATES = 50  # per-query candidate pool before exact re-rank


@register(
    "s11_sq8_ann_cosine",
    # The SQ8 path is exact integer arithmetic end-to-end (VERDICT r6
    # item 6): per-dim absmax scales are max-aggregates (no summation
    # ordering), the int8 codes come from one round() both engines tie-
    # break identically (half away from zero), code dot products are
    # exact int64 (|sum| <= 64 * 127^2), and acos = dot/sqrt(qq*cc) is
    # a single IEEE op chain on exactly-representable integers — so the
    # candidate RANKING is bit-reproducible in DuckDB and the oracle
    # replays the full train -> encode -> candidate -> exact-re-rank
    # pipeline. Expression shapes mirror the Spark side exactly:
    # sqrt(qq*cc) in the approximate score, sqrt(qq)*sqrt(cc) in the
    # exact re-rank (same grouping => same doubles).
    oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ux AS (
    SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e
),
dims AS (
    SELECT pos, greatest(max(abs(x)), 1e-12) AS s FROM ux GROUP BY pos
),
coded AS (
    SELECT vec_id,
           list(CAST(round(x / s * 127.0) AS BIGINT) ORDER BY pos) AS code
    FROM ux JOIN dims USING (pos)
    GROUP BY vec_id
),
approx AS (
    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
           list_dot_product(q.code, c.code)
             / sqrt(list_dot_product(q.code, q.code)
                    * list_dot_product(c.code, c.code)) AS acos_
    FROM coded q JOIN coded c
      ON q.vec_id < {N_QUERIES} AND c.vec_id != q.vec_id
),
cands AS (
    SELECT q_id, n_id FROM (
        SELECT q_id, n_id,
               row_number() OVER (PARTITION BY q_id ORDER BY acos_ DESC, n_id) AS crk
        FROM approx
    ) WHERE crk <= {S11_CANDIDATES}
),
exact AS (
    SELECT cands.q_id, cands.n_id,
           list_dot_product(qe.v, ce.v)
             / (sqrt(list_dot_product(qe.v, qe.v))
                * sqrt(list_dot_product(ce.v, ce.v))) AS cos_
    FROM cands
    JOIN e qe ON qe.vec_id = cands.q_id
    JOIN e ce ON ce.vec_id = cands.n_id
)
SELECT q_id, n_id, CAST(rnk AS INT) AS rank, round(cos_, 6) AS cosine
FROM (
    SELECT q_id, n_id, cos_,
           row_number() OVER (PARTITION BY q_id ORDER BY cos_ DESC, n_id) AS rnk
    FROM exact
) WHERE rnk <= {KNN_K}
""",
    tags=("similarity", "ann", "scalar-quantization"),
)
def s11_sq8_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN via symmetric int8 scalar quantization: per-dimension absmax
    scales (one bounded agg, collected — 64 doubles, the SQ 'codebook'),
    corpus encoded as tinyint codes, approximate cosine computed on the
    codes, top-C candidates per query re-ranked with EXACT double
    cosine, top-k emitted.

    Scale shape: the hot scan reads 1 byte/dim instead of 8 (at 100 TB
    of vectors that is the difference between bandwidth-bound and
    compute-trivial); the exact math touches only C×Q candidate rows
    fetched by a semi-join. Same output schema as s01; recall ≥ 0.95 at
    C=50 is pytest-pinned, exact re-rank means emitted cosines are true
    cosines (not estimates)."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    # --- train: per-dim absmax (posexplode → 64-row agg → driver) ---
    scales_rows = (
        emb.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.max(F.abs(F.col("x"))).alias("s"))
        .collect()
    )
    scales = [max(r["s"], 1e-12) for r in sorted(scales_rows, key=lambda r: r["pos"])]
    sc = F.array(*[F.lit(float(s)) for s in scales])

    def encode(vcol):
        return F.zip_with(
            vcol, sc, lambda x, s: F.round(x / s * 127.0).cast("int")
        )

    coded = emb.select("vec_id", encode(F.col("v")).alias("code"))
    # --- approximate scan: integer code dots against the resident query
    # codes, as a numpy partition kernel (guide §4.2). The broadcast-NL
    # form paid 3 interpreted ``aggregate(zip_with(...))`` integer folds
    # per (query, row) — 600k folds at sf1 (profiled r12). Integer
    # arithmetic is associative, so the kernel's matmul is EXACT (not
    # merely bit-compatible): dots ≤ 64·127² and qq·cc ≤ ~1.1e12 both
    # fit int64, and acos = dot/sqrt(qq·cc) is one double division of
    # exactly-represented integers — identical by VALUE to the Catalyst
    # expression regardless of op order. Per-batch top-C truncation
    # under (acos DESC, n_id ASC) bounds what crosses the boundary; the
    # downstream row_number ≤ C over the truncated stream returns the
    # identical candidate set (per-batch containment, the s02 proof).
    import numpy as np
    import pandas as pd

    from sketchmlflink_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    q_rows = coded.where(F.col("vec_id") < N_QUERIES).collect()
    q_ids = np.asarray([r["vec_id"] for r in q_rows], dtype=np.int64)
    Qc = np.stack([np.asarray(r["code"], dtype=np.int64) for r in q_rows])
    qq = (Qc * Qc).sum(axis=1)  # exact int64 self-dots

    def idot_scan(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            C = np.stack(pdf["code"].to_numpy()).astype(np.int64)
            dots = C @ Qc.T                      # (n, nq) exact int64
            cc = (C * C).sum(axis=1)             # (n,) exact int64
            acos = dots / np.sqrt(qq[None, :] * cc[:, None])
            n_ids = pdf["vec_id"].to_numpy()
            valid = n_ids[:, None] != q_ids[None, :]
            neg = np.where(valid, -acos, np.inf)
            order = np.lexsort((np.broadcast_to(n_ids[:, None], neg.shape), neg), axis=0)
            rank = np.empty_like(order)
            np.put_along_axis(rank, order, np.arange(n)[:, None], axis=0)
            valid &= rank < S11_CANDIDATES
            ii, jj = np.nonzero(valid)
            yield pd.DataFrame(
                {"q_id": q_ids[jj], "n_id": n_ids[ii], "acos": acos[ii, jj]}
            )

    approx = coded.mapInPandas(idot_scan, "q_id long, n_id long, acos double")
    wq = Window.partitionBy("q_id").orderBy(F.desc("acos"), F.asc("n_id"))
    cands = approx.withColumn("crk", F.row_number().over(wq)).where(
        F.col("crk") <= S11_CANDIDATES
    ).select("q_id", "n_id")
    # --- exact re-rank on the C×Q candidate rows only ---
    qv = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    cv = emb.select(F.col("vec_id").alias("n_id"), F.col("v").alias("cv"))
    exact = (
        cands.join(F.broadcast(qv), "q_id")
        .join(cv, "n_id")
        .select("q_id", "n_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        exact.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= KNN_K)
        .select(
            "q_id", "n_id", F.col("rnk").cast("int").alias("rank"),
            F.round("cos", 6).alias("cosine"),
        )
    )


# --------------------------------------------------------------------------
# s12 — hybrid retrieval: dense cosine + BM25 fused with reciprocal-rank
# fusion (the standard hybrid-search recipe: Cormack et al., RRF).
# --------------------------------------------------------------------------
S12_QVEC = 0     # the dense query = embedding of vec_id 0 (doc_id 0)
S12_POOL = 10    # per-arm candidate pool (== BM25_TOPN)
S12_RRF_K = 60   # canonical RRF constant
S12_TOPN = 10


def _s12_oracle() -> str:
    from sketchmlflink_spark.operators.textops import _bm25_duck

    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT v FROM e WHERE vec_id = {S12_QVEC}),
dense AS (
    SELECT c.vec_id AS doc_id,
           list_dot_product(q.v, c.v)
             / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
    FROM e c CROSS JOIN q
    WHERE c.vec_id != {S12_QVEC}
),
dpool AS (
    SELECT doc_id, CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS INT) AS dense_rank
    FROM dense ORDER BY cos DESC, doc_id LIMIT {S12_POOL}
),
bpool AS (
    SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS bm25_rank
    FROM ({_bm25_duck()})
)
SELECT doc_id,
       round(coalesce(1.0 / ({S12_RRF_K} + dense_rank), 0.0)
             + coalesce(1.0 / ({S12_RRF_K} + bm25_rank), 0.0), 6) AS rrf,
       dense_rank, bm25_rank
FROM dpool FULL OUTER JOIN bpool USING (doc_id)
ORDER BY rrf DESC, doc_id
LIMIT {S12_TOPN}
"""


@register(
    "s12_hybrid_rrf_retrieval",
    oracle=_s12_oracle(),
    tags=("similarity", "retrieval", "hybrid", "rrf", "bm25"),
)
def s12_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: the dense arm ranks documents by cosine to a query
    embedding, the lexical arm by BM25 (t07's scan-side kernel), and the
    two ranked pools are fused with reciprocal-rank fusion
    ``score = Σ 1/(k + rank)`` (k=60) — the production hybrid-retrieval
    recipe for RAG corpora, where neither arm alone is recall-complete.

    Plan shape for 100 TB: each arm ends in a TakeOrderedAndProject
    down to a CONSTANT pool (S12_POOL), so the single-partition
    row_number windows and the full-outer fuse join run on ≤10-row
    frames regardless of corpus size — the only wide work is the two
    arms' own scans, each independently scale-audited (s01's broadcast
    1-row nested loop; t07's no-explode tf). Dense cosine is
    Catalyst-only sequential-order double math, so values hash-match
    DuckDB's list_dot_product bit-for-bit."""
    from sketchmlflink_spark.operators.textops import t07_bm25_keyword_search

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    q = e.where(F.col("vec_id") == S12_QVEC).select(F.col("v").alias("qv"))
    dense = (
        e.where(F.col("vec_id") != S12_QVEC)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(S12_POOL)
    )
    wd = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    dpool = dense.select(
        "doc_id", F.row_number().over(wd).cast("int").alias("dense_rank")
    )
    bm = t07_bm25_keyword_search(spark, sf_dir)  # (doc_id, bm25) pool
    wb = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    bpool = bm.select(
        "doc_id", F.row_number().over(wb).cast("int").alias("bm25_rank")
    )
    rrf = (
        F.coalesce(F.lit(1.0) / (F.lit(S12_RRF_K) + F.col("dense_rank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(S12_RRF_K) + F.col("bm25_rank")), F.lit(0.0))
    )
    return (
        dpool.join(bpool, "doc_id", "full_outer")
        .select("doc_id", F.round(rrf, 6).alias("rrf"), "dense_rank", "bm25_rank")
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(S12_TOPN)
    )


# --------------------------------------------------------------------------
# s13 — MMR-diversified retrieval: greedy maximal-marginal-relevance
# re-rank of a bounded candidate pool (Carbonell & Goldstein '98) —
# the de-dup-at-serving-time counterpart to d06's de-dup-at-rest.
# --------------------------------------------------------------------------
S13_QVEC = 0
S13_POOL = 20
S13_K = 5
S13_LAMBDA = 0.7


def _s13_oracle() -> str:
    """Greedy MMR unrolled into K chained CTE stages — each stage picks
    argmax(λ·rel − (1−λ)·max_sim_to_selected) over the remaining pool,
    so the iterative algorithm stays fully SQL-expressible (and
    hash-checkable) at a fixed K."""
    head = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT v FROM e WHERE vec_id = {S13_QVEC}),
pool AS (
    SELECT c.vec_id AS id, c.v,
           list_dot_product(q.v, c.v)
             / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS rel
    FROM e c CROSS JOIN q
    WHERE c.vec_id != {S13_QVEC}
    ORDER BY rel DESC, id LIMIT {S13_POOL}
),
pairs AS (
    SELECT a.id AS a, b.id AS b,
           list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
    FROM pool a JOIN pool b ON a.id != b.id
),
s1 AS (
    SELECT id, rel, {S13_LAMBDA} * rel AS mmr, 1 AS step
    FROM pool ORDER BY rel DESC, id LIMIT 1
)"""
    stages, prev_union = [], "SELECT id FROM s1"
    for k in range(2, S13_K + 1):
        stages.append(f""",
c{k} AS (
    SELECT p.id, p.rel,
           {S13_LAMBDA} * p.rel - (1 - {S13_LAMBDA}) * max(pr.sim) AS mmr
    FROM pool p JOIN pairs pr ON pr.a = p.id AND pr.b IN ({prev_union})
    WHERE p.id NOT IN ({prev_union})
    GROUP BY p.id, p.rel
),
s{k} AS (SELECT id, rel, mmr, {k} AS step FROM c{k} ORDER BY mmr DESC, id LIMIT 1)""")
        prev_union += f" UNION ALL SELECT id FROM s{k}"
    union_all = " UNION ALL ".join(f"SELECT * FROM s{k}" for k in range(1, S13_K + 1))
    return (
        head + "".join(stages)
        + f"""
SELECT id AS doc_id, CAST(step AS INT) AS step,
       round(rel, 6) + 0.0 AS rel, round(mmr, 6) + 0.0 AS mmr
FROM ({union_all})
"""
    )


@register(
    "s13_mmr_diversified_topk",
    oracle=_s13_oracle(),
    tags=("similarity", "retrieval", "mmr", "diversity"),
)
def s13_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified top-K: greedily select K results maximizing
    ``λ·relevance − (1−λ)·max-similarity-to-already-selected`` over a
    bounded candidate pool — redundant near-duplicate hits are traded
    for coverage at serving time.

    Plan shape for 100 TB: ALL corpus-size work is the candidate pool
    (TakeOrderedAndProject top-{S13_POOL} by cosine — s01's broadcast
    1-row scan); the pool self-join ({S13_POOL}² pairs) and the greedy
    K-step loop run on CONSTANT-size frames, so the driver-side
    selection loop is O(K·pool), independent of corpus size. Cosines —
    both query-relevance and pool-pairwise — are computed in Catalyst
    (sequential-order doubles) and only the bounded pool is collected,
    so greedy arithmetic on the driver reproduces DuckDB's unrolled-CTE
    evaluation bit-for-bit."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    # pool select = one corpus pass against the single resident query —
    # the _query_cosine_scan numpy kernel (bit-exact; see there) with
    # per-batch top-POOL truncation replaces the broadcast crossJoin's
    # 20k interpreted cosine() HOF folds at sf1 (profiled r12); the
    # global (rel DESC, vec_id ASC) limit over the truncated stream is
    # provably the same POOL rows (per-batch containment).
    qrow = e.where(F.col("vec_id") == S13_QVEC).collect()[0]
    pool = (
        _query_cosine_scan(
            e, [(qrow["vec_id"], qrow["v"])], per_batch_top=S13_POOL, carry_v=True
        )
        .select(F.col("n_id").alias("vec_id"), "v", F.col("cos").alias("rel"))
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(S13_POOL)
    )
    pool = pool.localCheckpoint(eager=True)  # reused thrice below
    a, b = pool.alias("a"), pool.alias("b")
    pairs = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("pa"), F.col("b.vec_id").alias("pb"),
            cosine(F.col("a.v"), F.col("b.v")).alias("sim"),
        )
    )
    rels = {r["vec_id"]: r["rel"] for r in pool.select("vec_id", "rel").collect()}
    sims = {(r["pa"], r["pb"]): r["sim"] for r in pairs.collect()}
    selected: list[tuple[int, int, float, float]] = []  # (id, step, rel, mmr)
    chosen: list[int] = []
    for step in range(1, S13_K + 1):
        best = None
        for cid, rel in rels.items():
            if cid in chosen:
                continue
            if chosen:
                mmr = S13_LAMBDA * rel - (1 - S13_LAMBDA) * max(
                    sims[(cid, s)] for s in chosen
                )
            else:
                mmr = S13_LAMBDA * rel
            key = (-mmr, cid)
            if best is None or key < best[0]:
                best = (key, cid, rel, mmr)
        _, cid, rel, mmr = best
        chosen.append(cid)
        # + 0.0 = signed-zero normalization (an mmr of ≈ −1e-7 rounds
        # to −0.0 under Python round too; functions.zround's policy)
        selected.append((cid, step, round(rel, 6) + 0.0, round(mmr, 6) + 0.0))
    return spark.createDataFrame(
        selected, "doc_id long, step int, rel double, mmr double"
    )


# --------------------------------------------------------------------------
# s14 — ANN recall audit: the "measure, don't guess" report for the
# approximate retrieval paths, as a first-class catalog query (d14 is
# the same idea for MinHash estimates). An index you can't audit in the
# same engine that built it is an index you can't trust at 100 TB.
# --------------------------------------------------------------------------
def _s14_recall_block(arm: str, label: str) -> str:
    """Recall@k CTEs for one arm: dynamic k (the arm's max per-query row
    count, exactly the engine's rule), hits = |arm ∩ exact-top-k|, per-
    query rows for every ground-truth query plus the '__mean__' row from
    exact integer sums (Σhits/(n·k) — never an avg of rounded doubles)."""
    return f"""
{arm}_k AS (SELECT coalesce(max(cnt), 0) AS k
            FROM (SELECT count(*) AS cnt FROM {arm} GROUP BY q_id)),
{arm}_hits AS (
    SELECT t.q_id, count(*) AS hits
    FROM truth t JOIN {arm} a ON a.q_id = t.q_id AND a.n_id = t.n_id
    WHERE t.rnk <= (SELECT greatest(k, 1) FROM {arm}_k)
    GROUP BY t.q_id
),
{arm}_perq AS (
    SELECT '{label}' AS method, CAST(b.q_id AS VARCHAR) AS query,
           CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
           (SELECT CAST(k AS INT) FROM {arm}_k) AS k,
           round(coalesce(h.hits, 0) / (SELECT greatest(k, 1) FROM {arm}_k), 4) AS recall
    FROM base b LEFT JOIN {arm}_hits h ON h.q_id = b.q_id
),
{arm}_all AS (
    SELECT * FROM {arm}_perq
    UNION ALL
    SELECT '{label}', '__mean__', CAST(sum(hits) AS BIGINT),
           (SELECT CAST(k AS INT) FROM {arm}_k),
           round(CAST(sum(hits) AS DOUBLE)
                 / (count(*) * (SELECT greatest(k, 1) FROM {arm}_k)), 4)
    FROM {arm}_perq
)"""


def _s14_oracle() -> str:
    return f"""
WITH {_DUCK_QE},
{_s03_body()},
{_s05_body()},
{_s06_body()},
truth AS MATERIALIZED (
    SELECT q_id, n_id, rnk
    FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   list_dot_product(q.v, c.v)
                     / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) DESC,
                   c.vec_id) AS rnk
        FROM e q JOIN e c ON c.vec_id != q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    )
    WHERE rnk <= {KNN_K}
),
base AS (SELECT DISTINCT q_id FROM truth),
{_s14_recall_block('lsh_arm', 'lsh')},
{_s14_recall_block('ivf_arm', 'ivf')},
{_s14_recall_block('pq_arm', 'ivfpq')}
SELECT method, query, hits, k, recall
FROM (SELECT * FROM lsh_arm_all
      UNION ALL SELECT * FROM ivf_arm_all
      UNION ALL SELECT * FROM pq_arm_all)
ORDER BY method, query
"""


@register(
    "s14_ann_recall_report",
    oracle=_s14_oracle(),
    tags=("similarity", "ann", "recall", "audit"),
)
def s14_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-method recall@k of every approximate ANN path (LSH s03, IVF
    s05, IVF-PQ s06) against the exact blocked kNN (s09), per query and
    overall: method, q_id, hits, k, recall — plus one '__mean__' row per
    method. The ground-truth arm runs ONCE and is reused against all
    three candidate frames.

    Hash-oracled since round 8 (VERDICT r7 item 3): all three arms are
    exactly replayable — LSH from its literal hyperplanes, IVF and
    IVF-PQ from the int-grid index build — so the oracle recomputes the
    ENTIRE report (arms + exact ground truth + recall joins) in one
    DuckDB query. The '__mean__' rows use Σhits/(n·k) in exact integer
    arithmetic, never an engine-order average of rounded doubles.

    100-TB plan shape: each arm's heavy work is its own already-audited
    plan (block-local top-k, banded LSH, IVF probes, ADC scan); this
    audit only left-joins their tiny (n_queries·k)-row outputs — the
    joins are broadcast by size, nothing corpus-scale moves. Recall@k
    is the id-set intersection of the arm's top-k with the EXACT top-k
    at the same k (ground truth truncated to each arm's k), the
    standard ANN recall@k definition.

    Reading the numbers: IVF/IVF-PQ recall ≈ 0.4-0.5 at nprobe=2 on the
    synthetic table; single-table 6-bit LSH recall is NEAR ZERO here —
    correctly. The query vectors' true neighbors on this table are only
    weakly similar (random gaussians, top cosine ≈ 0.4), and sign-LSH
    collision probability decays as (1-θ/π)^bits, so one 6-bit table
    almost never co-buckets them. The same scheme recalls ≥ 0.95 on
    genuinely near pairs (cos ≈ 0.99, the near-dup regime it exists
    for — pinned in tests/test_dedup.py::test_ann_lsh_recall_vs_brute).
    THAT threshold-dependence is what this report is for: it tells an
    operator which index is safe at their similarity operating point,
    from inside the engine, before committing a 100-TB build."""
    # Build the four independent arms CONCURRENTLY (optimization guide
    # §2.6 — overlap independent jobs): each arm's builder runs its own
    # bounded driver actions (md5 sample, query collect, index training
    # probes), and serially those actions' tails left the cluster idle —
    # measured r12 at sf1: arm-build wall 2.4–3.2 s serial → 1.1–1.4 s
    # threaded, identical arm outputs asserted across 6 probe rounds.
    # ensure_workers_can_import is called ONCE before the pool (its
    # addPyFile guard is not thread-safe); the arm builders themselves
    # set no session confs and share no mutable state.
    from concurrent.futures import ThreadPoolExecutor

    from sketchmlflink_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    with ThreadPoolExecutor(max_workers=4) as pool:
        f_exact = pool.submit(s09_knn_blocked_exact, spark, sf_dir)
        futs = {
            "lsh": pool.submit(s03_ann_lsh_cosine, spark, sf_dir),
            "ivf": pool.submit(s05_ivf_ann_cosine, spark, sf_dir),
            "ivfpq": pool.submit(s06_ivfpq_ann_cosine, spark, sf_dir),
        }
        exact = f_exact.result().select("q_id", "n_id", "rank")
        arms = {name: f.result() for name, f in futs.items()}
    per_method = []
    base = exact.select("q_id").distinct()
    for method, df in arms.items():
        approx = df.select("q_id", "n_id")
        # per-arm k can differ (s06 reranks to k=3); recall@k scores the
        # arm against ground truth AT ITS OWN k — the exact arm is
        # truncated to rank <= arm_k before the semi-join, otherwise an
        # arm returning only exact ranks 3-5 would score a spurious 1.0
        # (ADVICE r4). An arm returning zero rows (plausible for
        # single-table LSH in the weak-similarity regime) gets an
        # all-zero grid instead of crashing on a NULL max.
        # arm_k is a 1-row BROADCAST FRAME, not a driver first() — the
        # old per-arm action executed the arm's whole pipeline a second
        # time just to read its k (optimization guide §1.2/§5: three
        # extra arm builds per report); inside the single plan the arm
        # subtree is shared between the k-derivation and the hits join.
        armk = F.broadcast(
            approx.groupBy("q_id")
            .count()
            .agg(
                F.coalesce(F.max("count"), F.lit(0).cast("long"))
                .cast("int")
                .alias("raw_k"),
                F.greatest(F.coalesce(F.max("count"), F.lit(0).cast("long")), F.lit(1).cast("long"))
                .cast("int")
                .alias("eff_k"),
            )
        )
        truth = (
            exact.crossJoin(armk)
            .where(F.col("rank") <= F.col("eff_k"))
            .select("q_id", "n_id")
        )
        hits = (
            truth.join(approx, ["q_id", "n_id"], "left_semi")
            .groupBy("q_id")
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        per_q_full = (
            base.join(hits, "q_id", "left")
            .crossJoin(armk)
            .select(
                F.lit(method).alias("method"),
                F.col("q_id").cast("string").alias("query"),
                F.coalesce("hits", F.lit(0)).alias("hits"),
                F.col("raw_k").alias("k"),
                F.round(F.coalesce("hits", F.lit(0)) / F.col("eff_k"), 4).alias(
                    "recall"
                ),
                F.col("eff_k").alias("eff_k"),
            )
        )
        per_q = per_q_full.drop("eff_k")
        mean_row = per_q_full.agg(
            F.lit(method).alias("method"),
            F.lit("__mean__").alias("query"),
            F.sum("hits").alias("hits"),
            F.max("k").alias("k"),
            # exact integer arithmetic, then ONE division + ONE round:
            # avg(rounded per-q recalls) would sum doubles in engine
            # order (the q05 class, round 7) — Σhits/(n·k) is order-free
            F.round(
                F.sum("hits") / (F.count(F.lit(1)) * F.max("eff_k")), 4
            ).alias("recall"),
        )
        per_method.append(per_q.unionByName(mean_row))
    out = per_method[0]
    for p in per_method[1:]:
        out = out.unionByName(p)
    return out.orderBy("method", "query")


# --------------------------------------------------------------------------
# s15 — maximum-inner-product top-k + the norm-augmentation reduction
# (MIPS -> cosine; Neyshabur & Srebro '15 / Shrivastava & Li '14).
# --------------------------------------------------------------------------
S15_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
m AS (SELECT max(sqrt(list_dot_product(v, v))) AS mx FROM e),
pairs AS (
    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
           list_dot_product(q.v, c.v) AS ip,
           (list_dot_product(q.v, c.v) / m.mx)
             / sqrt(list_dot_product(q.v, q.v)) AS aug_cos
    FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND c.vec_id != q.vec_id
    CROSS JOIN m
)
SELECT q_id, n_id, CAST(rnk AS INT) AS rank,
       round(ip, 6) + 0.0 AS inner_product,
       round(aug_cos, 6) + 0.0 AS aug_cosine
FROM (
    SELECT q_id, n_id, ip, aug_cos,
           row_number() OVER (PARTITION BY q_id ORDER BY ip DESC, n_id) AS rnk
    FROM pairs
)
WHERE rnk <= {KNN_K}
"""


@register(
    "s15_mips_topk",
    oracle=S15_ORACLE,
    tags=("similarity", "mips", "inner-product"),
    scale_guard_sf=1.0,  # brute MIPS anchor (broadcast q × corpus, linear,
    # but its ORACLE is a quadratic cross join — guarded with its siblings)
)
def s15_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product top-k (the retrieval scoring most
    embedding models are actually trained for — cosine's unnormalized
    sibling), plus the norm-augmentation reduction that makes it
    SERVABLE by any cosine index: append sqrt(M² − ‖c‖²)/M as an extra
    corpus coordinate (M = max corpus norm) and the augmented corpus
    vectors become unit-length with cos(q̂, ĉ) = (q·c / M)/‖q‖ —
    MONOTONE in the inner product per query, so s03/s05/s06's cosine
    buckets serve MIPS unchanged. The emitted aug_cosine column is that
    reduction's score (hash-checked against the oracle's closed form);
    rank-by-ip == rank-by-aug_cosine is pinned engine-side in pytest
    (cross-engine ranking stays on the raw inner product, where both
    engines evaluate the identical dot expression — ranking on the
    divided form instead could let a 1-ulp quotient collapse distinct
    dots into a tiebreak disagreement).

    Scale notes: identical physics to s01 (the labeled quadratic
    correctness anchor): broadcast the bounded query set, one corpus
    scan, per-query top-k via window over q_id. M is a 1-row aggregate
    broadcast back; the production path at 100 TB is the reduction +
    an ANN index, exactly as documented above."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    # norm2 IS the norm (sqrt applied) — functions/vector.py:31
    m = emb.agg(F.max(norm2(F.col("v"))).alias("mx"))
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("n_id"), F.col("v").alias("cv"))
    ip = dot(F.col("qv"), F.col("cv"))
    pairs = (
        F.broadcast(q)
        .join(c, F.col("n_id") != F.col("q_id"))
        .crossJoin(F.broadcast(m))
        .select(
            "q_id",
            "n_id",
            ip.alias("ip"),
            ((ip / F.col("mx")) / norm2(F.col("qv"))).alias("aug_cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("ip"), F.asc("n_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= KNN_K)
        .select(
            "q_id",
            "n_id",
            F.col("rnk").cast("int").alias("rank"),
            zround(F.col("ip"), 6).alias("inner_product"),
            zround(F.col("aug_cos"), 6).alias("aug_cosine"),
        )
    )
