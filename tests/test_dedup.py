"""Dedup + similarity behavior on constructed fixtures — the driver
corpus contains no near-duplicates, so these prove detection works."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sketchmlflink_spark.operators.dedup import (
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from sketchmlflink_spark.operators.similarity import ann_lsh_topk
from sketchmlflink_spark.functions.vector import as_double_array

WORDS = "the quick brown fox jumps over lazy dog spark flink sketch gradient vector table".split()


def _doc(rng, n=60):
    return " ".join(rng.choice(WORDS) for _ in range(n))


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    rng = random.Random(42)
    base = [_doc(rng) for _ in range(30)]
    rows = []
    for i, text in enumerate(base):
        rows.append((i, text))
    # near-dups: copy doc 0 with a 3-word tweak, copy doc 1 verbatim
    toks = base[0].split()
    toks[5], toks[20], toks[40] = "xx", "yy", "zz"
    rows.append((100, " ".join(toks)))
    rows.append((101, base[1]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_finds_planted_neardups(docs_with_dups):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_near_duplicates(docs_with_dups, threshold=0.3).collect()
    }
    assert (0, 100) in pairs, f"planted near-dup missed: {pairs}"
    assert (1, 101) in pairs
    assert pairs[(1, 101)] == 1.0  # verbatim copy
    # unrelated random docs don't appear (3-gram shingles are selective)
    assert all(a in (0, 1) for a, b in pairs)


def test_d21_tiled_pairs_match_d04(spark, docs_with_dups):
    """d21's tiled candidate generation must reproduce d04's verified
    pair set EXACTLY at every tile geometry: tile=1 (every bucket member
    its own tile — maximal tiling), a ragged tile=3, and a degenerate
    huge tile (one tile per bucket — the d04 shape). A clump of verbatim
    copies forces multi-member buckets that span tiles."""
    from sketchmlflink_spark.operators.dedup import (
        lsh_candidate_pairs_tiled,
    )

    base_rows = docs_with_dups.collect()
    clump_src = next(r["text"] for r in base_rows if r["doc_id"] == 2)
    extra = [(200 + i, clump_src + f" u{i}") for i in range(12)]
    docs = docs_with_dups.unionByName(
        spark.createDataFrame(extra, "doc_id long, text string")
    )
    want = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_near_duplicates(docs, threshold=0.3).collect()
    }
    # the clump must actually create multi-member buckets
    assert sum(1 for a, b, j in want if a >= 2) >= 66  # C(13,2) clump pairs
    for tile in (1, 3, 10**9):
        got = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in minhash_near_duplicates(
                docs,
                threshold=0.3,
                cand_fn=lambda s, tl=tile: lsh_candidate_pairs_tiled(s, tile=tl),
            ).collect()
        }
        assert got == want, f"tile={tile}: {sorted(want ^ got)[:5]}"


def test_d21_raw_emission_matches_d04_multiset(spark, docs_with_dups):
    """Pre-distinct parity, per band: the tiled expansion must emit each
    colliding bucket pair exactly once per band — the same MULTISET the
    plain per-band join produces, so no pair is double-emitted (same
    tile + cross tile) or lost at a tile boundary."""
    from collections import Counter

    from pyspark import StorageLevel

    from sketchmlflink_spark.functions import text as T
    from sketchmlflink_spark.operators.dedup import (
        SHINGLE_SIZE,
        lsh_candidate_pairs,
        lsh_candidate_pairs_tiled,
        minhash_signatures,
        shingles,
    )

    tok = docs_with_dups.select("doc_id", T.tokens("text").alias("tk")).where(
        F.size("tk") >= SHINGLE_SIZE
    )
    sh = tok.select("doc_id", shingles(F.col("tk")).alias("sh")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = minhash_signatures(sh).localCheckpoint()
    want = Counter(
        (r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs, distinct=False).collect()
    )
    for tile in (1, 2):
        got = Counter(
            (r["id_a"], r["id_b"])
            for r in lsh_candidate_pairs_tiled(sigs, tile=tile, distinct=False).collect()
        )
        assert got == want, f"tile={tile}"
    sh.unpersist()


def test_adaptive_tile_geometry(spark):
    """The adaptive per-bucket tile rule (VERDICT r10 item 6) pinned on
    exact values: a bucket smaller than 8×min splits to one tile, a
    bucket equal to the production tile splits into D21_TILE_SPLIT
    tiles (the fix — it used to be ONE), a huge bucket keeps the
    output-cap ceiling, and a test-shrunk tile below the floor keeps
    its exact fixed geometry."""
    from sketchmlflink_spark.operators.dedup import (
        D21_TILE,
        D21_TILE_MIN,
        D21_TILE_SPLIT,
        _adaptive_tile,
    )

    def m_for(size, tile):
        df = spark.range(1).select(
            F.ceil(F.lit(size) / _adaptive_tile(F.lit(size), tile)).alias("m")
        )
        return df.first()["m"]

    assert D21_TILE_SPLIT == 8 and D21_TILE_MIN == 256  # doc constants
    # production tile
    assert m_for(10, D21_TILE) == 1          # tiny bucket: one tile
    assert m_for(D21_TILE_MIN, D21_TILE) == 1
    assert m_for(2048, D21_TILE) == 8        # == tile: split (was 1)
    assert m_for(1434, D21_TILE) == 6        # the r10 clump fixture size
    assert m_for(20000, D21_TILE) == 10      # ceiling: ceil(20000/2048)
    # shrunk test tile keeps the old fixed geometry exactly
    assert m_for(10, 4) == 3                 # ceil(10/4)
    assert m_for(2048, 4) == 512             # ceil(2048/4)


def test_simhash_finds_planted_neardups(docs_with_dups):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_near_duplicates(docs_with_dups, max_hamming=6).collect()}
    assert (1, 101) in pairs and pairs[(1, 101)] == 0  # identical → hamming 0


def test_simhash_md5_twin_finds_planted_neardups(docs_with_dups):
    """d20's 60-bit md5 arm runs the same vote/banding math as d05 —
    the planted verbatim copy must band together at hamming 0 under the
    portable hash family too."""
    from pyspark.sql import functions as F

    hash_col = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_duplicates(
            docs_with_dups, max_hamming=6, hash_col=hash_col, n_bits=60, n_chunks=4
        ).collect()
    }
    assert (1, 101) in pairs and pairs[(1, 101)] == 0


def test_ann_lsh_recall_vs_brute(spark):
    """LSH ANN must recover a decent fraction of true top-1 neighbors
    (same-bucket probability for similar vectors is high by design)."""
    import numpy as np

    rng = np.random.default_rng(0)
    base = rng.standard_normal((100, 64))
    # plant an exact near-neighbor for each query vector
    vecs = []
    for i in range(10):
        vecs.append((i, base[i].tolist()))
        vecs.append((1000 + i, (base[i] + rng.normal(0, 0.05, 64)).tolist()))
    for j in range(20, 100):
        vecs.append((j, base[j].tolist()))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    res = ann_lsh_topk(emb, n_queries=10, k=1).collect()
    hits = sum(1 for r in res if r["n_id"] == 1000 + r["q_id"])
    assert hits >= 6, f"ANN recall too low: {hits}/10"


def test_ivf_ann_recall_vs_brute(spark):
    """IVF with nprobe=2/k=8 must recover planted exact near-neighbors:
    a vector and its small perturbation land in the same (or a probed)
    inverted list essentially always."""
    import numpy as np

    from sketchmlflink_spark.operators.similarity import ivf_ann_topk

    rng = np.random.default_rng(0)
    base = rng.standard_normal((100, 64))
    vecs = []
    for i in range(10):
        vecs.append((i, base[i].tolist()))
        vecs.append((1000 + i, (base[i] + rng.normal(0, 0.05, 64)).tolist()))
    for j in range(20, 100):
        vecs.append((j, base[j].tolist()))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    res = ivf_ann_topk(emb, n_queries=10, k=1).collect()
    hits = sum(1 for r in res if r["n_id"] == 1000 + r["q_id"])
    assert hits >= 8, f"IVF recall too low: {hits}/10"


def test_ivfpq_recall_vs_brute(spark):
    """IVF-PQ (4-bit residual codes + ADC + exact re-rank) must recover
    planted exact near-neighbors: a vector and its small perturbation
    share a coarse list and near-identical PQ codes, so the neighbor
    survives the ADC cut and exact re-rank ranks it first."""
    import numpy as np

    from sketchmlflink_spark.operators.similarity import ivf_pq_topk

    rng = np.random.default_rng(0)
    base = rng.standard_normal((100, 64))
    vecs = []
    for i in range(10):
        vecs.append((i, base[i].tolist()))
        vecs.append((1000 + i, (base[i] + rng.normal(0, 0.05, 64)).tolist()))
    for j in range(20, 100):
        vecs.append((j, base[j].tolist()))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    res = ivf_pq_topk(emb, n_queries=10, k=1).collect()
    hits = sum(1 for r in res if r["n_id"] == 1000 + r["q_id"])
    assert hits >= 8, f"IVF-PQ recall too low: {hits}/10"


def test_pq_codebooks_shape_and_reconstruction(spark):
    """pq_train returns (M, KSUB, dsub) codebooks whose nearest-codeword
    reconstruction error on the training residuals is far below the
    residual norm — the quantizer must actually compress, not memorize
    or degenerate."""
    import numpy as np

    from sketchmlflink_spark.operators.similarity import (
        IVF_ITERS,
        IVF_K,
        PQ_KSUB,
        PQ_M,
        pq_train,
    )

    from sketchmlflink_spark.operators.similarity import (
        int_d2,
        lloyd_int,
        q_normalize_int,
        q_quantize,
    )

    rng = np.random.default_rng(7)
    X = rng.standard_normal((512, 64))
    Xn = q_normalize_int(q_quantize(X))
    C = lloyd_int(Xn, IVF_K, IVF_ITERS)
    books = pq_train(Xn, C)
    assert books.shape == (PQ_M, PQ_KSUB, 64 // PQ_M)
    R = Xn - C[int_d2(Xn, C).argmin(axis=1)]
    dsub = 64 // PQ_M
    err = 0.0
    base = float((R**2).sum())
    for mi in range(PQ_M):
        S = R[:, mi * dsub : (mi + 1) * dsub]
        B = books[mi]
        err += float(((S - B[int_d2(S, B).argmin(axis=1)]) ** 2).sum())
    assert err < 0.75 * base, f"PQ reconstruction barely better than zero codebook: {err}/{base}"


def test_ivf_sampled_and_distributed_training_agree(spark):
    """When the training sample covers the whole corpus, the driver-side
    sampled Lloyd and the distributed map-side-combine Lloyd must
    produce BIT-IDENTICAL centroids (same md5-ordered init, same exact
    int-grid update rule; int64 partials make the distributed merge
    order-free) — cross-validating both implementations with exact
    equality, not a tolerance."""
    import numpy as np

    from sketchmlflink_spark.operators.similarity import ivf_train_centroids

    rng = np.random.default_rng(3)
    vecs = [(i, rng.standard_normal(16).tolist()) for i in range(200)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    sampled = ivf_train_centroids(emb, k=4, iters=3, sample_cap=10_000)
    dist = ivf_train_centroids(emb, k=4, iters=3, sample_cap=None)
    np.testing.assert_array_equal(sampled, dist)


def test_d06_block_pairs_match_bruteforce(spark, monkeypatch):
    """Distributed block-pair all-pairs (d06) against driver-side numpy
    brute force, with the block size forced small so the sf0.001 corpus
    spans multiple blocks (exercising triangle AND rectangle groups)."""
    import numpy as np

    from sketchmlflink_spark.operators import dedup as D

    monkeypatch.setattr(D, "D06_BLOCK_ROWS", 120)  # 500 rows -> 5 blocks
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in D.d06_embed_cosine_neardup(spark, "/root/testdata/sf0.001").collect()
    }

    import duckdb

    rows = duckdb.sql(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    M = np.stack([np.asarray(r[1]) for r in rows])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    cos = Mn @ Mn.T
    ii, jj = np.nonzero(np.triu(cos >= D.COSINE_DUP_THRESHOLD, k=1))
    expect = {(int(ids[i]), int(ids[j])): round(float(cos[i, j]), 6) for i, j in zip(ii, jj)}

    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == pytest.approx(expect[k], abs=1e-6)


def test_s02_per_group_top_matches_full_pair_stream(spark, monkeypatch):
    """s02's per-group top-20 truncation (exact_cosine_pairs
    per_group_top) must return EXACTLY the rows the full n²/2 pair
    stream returns after the same global orderBy+limit — with the block
    size forced small so the top-20 provably merges across triangle AND
    rectangle groups, and with the 6dp rounding ties the order is
    defined over."""
    from pyspark.sql import functions as F

    from sketchmlflink_spark.functions.vector import as_double_array
    from sketchmlflink_spark.operators import dedup as D
    from sketchmlflink_spark.operators.relational import t

    monkeypatch.setattr(D, "D06_BLOCK_ROWS", 120)  # 500 rows -> 5 blocks
    emb = t(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )

    def top20(df):
        return [
            (r["id_a"], r["id_b"], r["cosine"])
            for r in df.orderBy(
                F.desc("cosine"), F.asc("id_a"), F.asc("id_b")
            ).limit(20).collect()
        ]

    full = top20(D.exact_cosine_pairs(emb, threshold=-1.01))
    truncated = top20(D.exact_cosine_pairs(emb, threshold=-1.01, per_group_top=20))
    assert truncated == full
    # the truncated stream really is bounded: ≤ 20 rows per block-pair group
    n_groups = 5 * 6 // 2  # 5 blocks -> B(B+1)/2 = 15 groups
    assert (
        D.exact_cosine_pairs(emb, threshold=-1.01, per_group_top=20).count()
        <= 20 * n_groups
    )


def test_d07_candidate_verify_recall_vs_exact(spark):
    """d07 (LSH candidates + exact verify) against d06's exact answer:
    perfect precision by construction (candidates are exact-verified)
    and recall at the measured band-collision rate (≈0.94 at the 0.4
    threshold; 8 bands × 2 bits)."""
    from sketchmlflink_spark.operators import dedup as D

    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in D.d07_embed_lsh_candidate_verify(spark, "/root/testdata/sf0.001").collect()
    }

    import duckdb
    import numpy as np

    rows = duckdb.sql(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    M = np.stack([np.asarray(r[1]) for r in rows])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    cos = Mn @ Mn.T
    ii, jj = np.nonzero(np.triu(cos >= D.COSINE_DUP_THRESHOLD, k=1))
    exact = {(int(ids[i]), int(ids[j])): round(float(cos[i, j]), 6) for i, j in zip(ii, jj)}

    assert set(got) <= set(exact), "candidate-verify must have perfect precision"
    for k, v in got.items():
        assert v == pytest.approx(exact[k], abs=1e-6)
    recall = len(got) / len(exact)
    assert recall >= 0.85, f"recall {recall} ({len(got)}/{len(exact)})"


def test_d07_finds_planted_high_sim_pairs(spark):
    """At real near-dup similarity (cos ≈ 0.99) the banded scheme
    recalls everything — the operating point a dedup pipeline runs at."""
    import numpy as np

    from sketchmlflink_spark.operators import dedup as D

    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 64))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v.tolist()))
        rows.append((1000 + i, (v + 0.05 * rng.standard_normal(64)).tolist()))  # near-dup
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    import sketchmlflink_spark.operators.relational as R

    orig_t = R.t
    try:
        # route the builder's table load to the fixture
        D.t = lambda _s, _d, _n: df
        got = {(r["id_a"], r["id_b"]) for r in
               D.d07_embed_lsh_candidate_verify(spark, "unused").collect()}
    finally:
        D.t = orig_t
    for i in range(40):
        assert (i, 1000 + i) in got, f"planted near-dup pair {i} missed"


def test_d08_incremental_dedup_semantics(spark):
    """Crafted duplicates must exercise both rejection paths (the
    synthetic table is duplicate-free, so the registered query alone
    never takes them): a batch doc whose hash exists in the corpus is
    rejected; within-batch copies admit only the lowest doc_id."""
    import sketchmlflink_spark.operators.dedup as D
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [
        # corpus (doc_id % 10 < 8)
        (1, "alpha beta gamma"),
        (2, "unique corpus text"),
        # incoming (doc_id % 10 >= 8)
        (8, "ALPHA   beta gamma"),   # dup of corpus doc 1 after normalize
        (9, "fresh new document"),   # genuinely new
        (18, "fresh new document"),  # within-batch copy of 9 -> rejected
        (19, "another new one"),     # genuinely new
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # same plan as d08, on the crafted frame
    from sketchmlflink_spark.functions import text as T

    h = docs.select(
        "doc_id",
        F.md5(T.normalized_text("text")).alias("norm_hash"),
        (F.col("doc_id") % D.INC_MOD >= D.INC_CUT).alias("is_inc"),
    )
    corpus_hashes = h.where(~F.col("is_inc")).select("norm_hash").distinct()
    w = Window.partitionBy("norm_hash").orderBy("doc_id")
    inc = h.where(F.col("is_inc")).withColumn("rn", F.row_number().over(w))
    out = {
        r["doc_id"]: r["is_new"]
        for r in inc.join(
            corpus_hashes.withColumn("in_corpus", F.lit(True)), "norm_hash", "left"
        )
        .select("doc_id", (F.col("in_corpus").isNull() & (F.col("rn") == 1)).alias("is_new"))
        .collect()
    }
    assert out == {8: False, 9: True, 18: False, 19: True}


def test_d09_bloom_equals_d08_exact(spark):
    """The Bloom-accelerated path must return exactly the join-based
    d08 answer (false positives die in verify; negatives are provably
    absent) — same rows, same flags."""
    from sketchmlflink_spark.registry import all_queries
    from tests.conftest import SF_SMALL

    qs = all_queries()
    a = {(r["doc_id"], r["is_new"]) for r in qs["d08_incremental_dedup"].build(spark, SF_SMALL).collect()}
    b = {(r["doc_id"], r["is_new"]) for r in qs["d09_bloom_incremental_dedup"].build(spark, SF_SMALL).collect()}
    assert a == b and len(a) > 0


def test_d10_span_dedup_first_occurrence(spark):
    """Planted repeated span: the earliest (doc_id, chunk_idx) occurrence
    survives, every later copy is removed, and reassembly preserves
    chunk order."""
    from sketchmlflink_spark.operators import dedup as D

    rows = [
        (0, "a b c x y z a b c"),   # chunk0="a b c" kept, chunk2="a b c" dropped (later idx)
        (1, "a b c q r s"),          # chunk0 dropped (doc 0 owns it)
        (2, "q r s q r s"),          # chunk0 dropped (doc 1 owns "q r s"), chunk1 dropped too
        (3, "t u"),                  # < 3 words → no chunks → absent from output
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import sketchmlflink_spark.operators.relational as R

    orig_t = R.t
    try:
        R.t = lambda s, d, name: docs  # route the registered builder at our fixture
        D.t = R.t
        out = {
            r["doc_id"]: r
            for r in D.d10_span_exact_dedup(spark, "unused").collect()
        }
    finally:
        R.t = orig_t
        D.t = orig_t
    assert set(out) == {0, 1, 2}
    assert out[0]["n_chunks"] == 3 and out[0]["n_kept"] == 2
    assert out[0]["dedup_text"] == "a b c x y z"
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["dedup_text"] == "q r s"
    assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 0
    assert out[2]["dedup_text"] == ""


def test_d11_semantic_dedup_properties(spark):
    """SemDeDup invariants on the real sf0.001 corpus, under the exact
    int-grid near-dup rule the round-10 oracle pins (qd>0 AND
    den²·qd² >= num²·|a|²·|b|² on the 1e-3 grid): kept rows in a
    cluster are pairwise NOT near-dups; every drop names the FIRST kept
    lower-id row it duplicates; the partition covers the corpus exactly
    once."""
    import numpy as np

    from sketchmlflink_spark.operators.dedup import D19_NUM, D19_DEN, D19_QSCALE
    from sketchmlflink_spark.registry import all_queries
    from tests.conftest import SF_SMALL

    num2, den2 = D19_NUM**2, D19_DEN**2
    qs = all_queries()
    out = qs["d11_semantic_cluster_dedup"].build(spark, SF_SMALL).collect()
    grid = {}
    for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        grid[r["vec_id"]] = np.floor(v * D19_QSCALE + 0.5).astype(np.int64)

    def neardup(a, b):
        qd = int(grid[a] @ grid[b])
        n2a, n2b = int(grid[a] @ grid[a]), int(grid[b] @ grid[b])
        return qd > 0 and den2 * qd * qd >= num2 * n2a * n2b

    assert {r["vec_id"] for r in out} == set(grid)  # exact cover
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    n_dropped = 0
    for rows in by_cluster.values():
        kept_ids = sorted(r["vec_id"] for r in rows if r["is_kept"])
        for i, a in enumerate(kept_ids):
            for b in kept_ids[i + 1 :]:
                assert not neardup(a, b)
        for r in rows:
            if not r["is_kept"]:
                n_dropped += 1
                assert r["dup_of"] is not None and r["dup_of"] < r["vec_id"]
                assert r["dup_of"] in kept_ids
                assert neardup(r["vec_id"], r["dup_of"])
                # FIRST kept duplicate, not just any
                earlier = [k for k in kept_ids if k < r["vec_id"] and neardup(r["vec_id"], k)]
                assert earlier and earlier[0] == r["dup_of"]
    assert n_dropped > 0  # the corpus does contain near-dup embeddings


def test_span_chunks_roundtrip(spark):
    """Concatenating a doc's spans reproduces its first 3*floor(n/3)
    words, in order — the chunking loses only the trailing partial."""
    from pyspark.sql import functions as F

    from sketchmlflink_spark.operators.dedup import SPAN_CHUNK_WORDS, span_chunks

    rng = random.Random(7)
    rows = [(i, _doc(rng, n=rng.randrange(0, 12))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        "text",
        F.concat_ws(" ", span_chunks("text")).alias("rejoined"),
    ).collect()
    for r in out:
        words = r["text"].split(" ")
        keep = (len(words) // SPAN_CHUNK_WORDS) * SPAN_CHUNK_WORDS
        assert r["rejoined"] == " ".join(words[:keep])


def test_d12_decontamination_planted(spark):
    """A train doc sharing a span with an eval doc is flagged; disjoint
    docs are not."""
    from sketchmlflink_spark.operators import dedup as D
    import sketchmlflink_spark.operators.relational as R

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),   # eval doc: spans "alpha beta gamma", "delta epsilon zeta"
        (21, "alpha beta gamma one two three"),        # contaminated (shares span 1)
        (22, "one two three four five six"),           # clean
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    orig_t = R.t
    try:
        R.t = lambda s, d, name: docs
        D.t = R.t
        out = {r["doc_id"]: r for r in D.d12_decontaminate_eval_overlap(spark, "x").collect()}
    finally:
        R.t = orig_t
        D.t = orig_t
    assert set(out) == {21, 22}
    assert out[21]["is_contaminated"] and out[21]["n_overlap"] == 1
    assert not out[22]["is_contaminated"] and out[22]["n_overlap"] == 0


def test_d06_replication_is_exactly_nblocks_times_n(spark):
    """The block-pair shuffle's row count is the whole scale story of
    the exact anchor: pin shuffle rows == n_blocks * n (VERDICT r3
    "what's wrong" #3 — replication must be measured, not assumed)."""
    from sketchmlflink_spark.operators.dedup import _replicate_blocks
    from sketchmlflink_spark.functions.vector import as_double_array

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", as_double_array("embedding").alias("v"))
    )
    n = emb.count()
    for n_blocks in (1, 3, 5):
        assert _replicate_blocks(emb, n_blocks).count() == n_blocks * n


def test_d06_replication_budget_raises_loudly(spark):
    """Past D06_MAX_BLOCKS the exact kernel must refuse (pointing at
    d07) instead of silently exploding shuffle volume."""
    import pytest as _pytest

    from sketchmlflink_spark.operators.dedup import exact_cosine_pairs
    from sketchmlflink_spark.functions.vector import as_double_array

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", as_double_array("embedding").alias("v"))
    )
    with _pytest.raises(ValueError, match="replication budget"):
        exact_cosine_pairs(emb, block_rows=2)  # 500 rows -> 250 blocks


def test_s11_sq8_recall_vs_brute(spark):
    """int8 scalar-quantized ANN: candidate pool + exact re-rank must
    recover (nearly) the exact top-k, and the emitted cosines are TRUE
    cosines — identical to s01's values on the overlapping pairs."""
    from sketchmlflink_spark.registry import all_queries

    qs = all_queries()
    SF = "/root/testdata/sf0.001"
    s01 = {
        (r["q_id"], r["n_id"]): r["cosine"]
        for r in qs["s01_knn_cosine_brute"].build(spark, SF).collect()
    }
    s11 = {
        (r["q_id"], r["n_id"]): r["cosine"]
        for r in qs["s11_sq8_ann_cosine"].build(spark, SF).collect()
    }
    overlap = set(s01) & set(s11)
    assert len(overlap) / len(s01) >= 0.95, f"recall {len(overlap)}/{len(s01)}"
    for k in overlap:
        assert s01[k] == s11[k], f"re-ranked cosine differs at {k}"


def test_s11_codes_are_int8_range(spark):
    """The quantizer's whole point: every code fits a signed byte."""
    from pyspark.sql import functions as F

    from sketchmlflink_spark.operators.similarity import N_QUERIES  # noqa: F401
    from sketchmlflink_spark.operators.relational import t as t_
    from sketchmlflink_spark.functions.vector import as_double_array as ada

    emb = t_(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", ada("embedding").alias("v")
    )
    scales_rows = (
        emb.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos").agg(F.max(F.abs(F.col("x"))).alias("s")).collect()
    )
    sc = F.array(*[F.lit(float(max(r["s"], 1e-12))) for r in sorted(scales_rows, key=lambda r: r["pos"])])
    coded = emb.select(
        F.zip_with("v", sc, lambda x, s: F.round(x / s * 127.0).cast("int")).alias("code")
    )
    mm = coded.select(
        F.min(F.array_min("code")).alias("lo"), F.max(F.array_max("code")).alias("hi")
    ).first()
    assert -127 <= mm["lo"] and mm["hi"] <= 127


def test_s12_rrf_fusion_invariants(spark):
    """RRF fusion must be consistent with its two arms: every fused doc
    comes from one of the pools, its rrf equals 1/(60+rank) summed over
    the arms it appears in, and any doc ranked by BOTH arms outscores a
    doc holding the same single-arm rank."""
    from sketchmlflink_spark.operators.similarity import (
        S12_RRF_K,
        s12_hybrid_rrf_retrieval,
    )

    rows = s12_hybrid_rrf_retrieval(spark, "/root/testdata/sf0.001").collect()
    assert 1 <= len(rows) <= 10
    for r in rows:
        assert r["dense_rank"] is not None or r["bm25_rank"] is not None
        expect = sum(
            1.0 / (S12_RRF_K + rk)
            for rk in (r["dense_rank"], r["bm25_rank"])
            if rk is not None
        )
        assert abs(r["rrf"] - round(expect, 6)) < 1e-9, r
    # result ordered by rrf desc (doc_id asc tiebreak)
    key = [(-r["rrf"], r["doc_id"]) for r in rows]
    assert key == sorted(key)


def test_s13_mmr_diversifies_vs_plain_topk(spark):
    """MMR's selected set must (a) start with the raw-relevance argmax
    and (b) be no MORE self-similar than the plain top-K prefix of the
    same pool — the whole point of the re-rank."""
    from sketchmlflink_spark.functions.vector import as_double_array, cosine
    from sketchmlflink_spark.operators.relational import t as t_
    from sketchmlflink_spark.operators.similarity import (
        S13_K,
        S13_QVEC,
        s13_mmr_diversified_topk,
    )

    sf = "/root/testdata/sf0.001"
    rows = s13_mmr_diversified_topk(spark, sf).orderBy("step").collect()
    assert [r["step"] for r in rows] == list(range(1, S13_K + 1))
    # (a) step 1 is the pure-relevance winner
    assert rows[0]["rel"] == max(r["rel"] for r in rows)

    def max_pairwise(ids):
        e = t_(spark, sf, "embeddings").select(
            "vec_id", as_double_array("embedding").alias("v")
        ).where(F.col("vec_id").isin(ids))
        a, b = e.alias("a"), e.alias("b")
        return (
            a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .select(cosine(F.col("a.v"), F.col("b.v")).alias("s"))
            .agg(F.max("s")).first()[0]
        )

    e = t_(spark, sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    qv = e.where(F.col("vec_id") == S13_QVEC).select(F.col("v").alias("qv"))
    plain = [
        r["vec_id"]
        for r in e.where(F.col("vec_id") != S13_QVEC)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", cosine(F.col("qv"), F.col("v")).alias("rel"))
        .orderBy(F.desc("rel"), F.asc("vec_id")).limit(S13_K).collect()
    ]
    mmr_ids = [r["doc_id"] for r in rows]
    if set(mmr_ids) != set(plain):
        # (b) diversity: only a meaningful check when the sets differ
        assert max_pairwise(mmr_ids) <= max_pairwise(plain) + 1e-12


def test_s14_recall_report_bounds(spark):
    """The ANN recall audit must cover all three approximate arms with a
    full per-query grid plus a mean row each, and the means must sit in
    each arm's known band on the synthetic table: IVF/IVF-PQ well above
    chance, single-table LSH near zero at this (weak-similarity)
    operating point — the threshold-dependence the report exists to
    surface."""
    from sketchmlflink_spark.operators.similarity import (
        N_QUERIES,
        s14_ann_recall_report,
    )

    rows = s14_ann_recall_report(spark, "/root/testdata/sf0.001").collect()
    by_method: dict[str, list] = {}
    for r in rows:
        by_method.setdefault(r["method"], []).append(r)
    assert sorted(by_method) == ["ivf", "ivfpq", "lsh"]
    for method, mrows in by_method.items():
        assert len(mrows) == N_QUERIES + 1, f"{method}: {len(mrows)} rows"
        mean = [r for r in mrows if r["query"] == "__mean__"]
        assert len(mean) == 1
        assert 0.0 <= mean[0]["recall"] <= 1.0
    means = {m: [r for r in v if r["query"] == "__mean__"][0]["recall"] for m, v in by_method.items()}
    # bounds re-pinned after the ADVICE r4 k-fix (ground truth truncated
    # to each arm's k) — the corrected metric is stricter, so the bands
    # sit lower than the pre-fix inflated ones
    assert means["ivf"] >= 0.4, means
    assert means["ivfpq"] >= 0.35, means
    assert means["lsh"] <= 0.3, means  # honest low recall at weak similarity


def test_d07_emits_each_pair_exactly_once(spark):
    """The first-matching-band rule must make the raw output
    duplicate-free WITHOUT a distinct (round-5 rework: the old
    emit-everywhere + distinct paid ~7x shuffle volume at scale)."""
    from sketchmlflink_spark.operators import dedup as D

    df = D.d07_embed_lsh_candidate_verify(spark, "/root/testdata/sf0.001")
    assert "Deduplicate" not in df._jdf.queryExecution().optimizedPlan().toString()
    rows = [(r["id_a"], r["id_b"]) for r in df.collect()]
    assert len(rows) == len(set(rows)), "pair emitted from more than one band"


def test_d07_blocked_verify_matches_unblocked(spark):
    """The tiled verify kernel (round-6: the sf10 probe crashed Python
    workers materializing a full bucket² cosine matrix — ~5 GB/task at
    sf10's ~25k-row buckets) must emit exactly the same pair set as a
    single-block run. verify_block=7 forces many ragged tiles, crossing
    diagonal and off-diagonal block boundaries on the sf0.001 fixture."""
    from sketchmlflink_spark.operators import dedup as D

    def pairs(block):
        df = D.d07_embed_lsh_candidate_verify(
            spark, "/root/testdata/sf0.001", verify_block=block
        )
        return {(r["id_a"], r["id_b"], r["cosine"]) for r in df.collect()}

    assert pairs(7) == pairs(10**9)


def test_d17_short_doc_arm_and_wildcard_safety(spark, tmp_path):
    """The broadcast arm for sub-band-width docs must fire (the fixture
    corpus never exercises it), texts containing SQL wildcards must not
    create false pairs, and equal texts must NOT pair (strict prefix)."""
    import os
    from sketchmlflink_spark.operators.dedup import d17_prefix_containment

    rows = [
        (1, "short doc", "en", "s", 9),                      # < 32 chars
        (2, "short doc plus a much longer continuation here", "en", "s", 46),
        (3, "short doc%different continuation entirely okay", "en", "s", 46),
        (4, "a completely unrelated document body over here", "en", "s", 47),
        (5, "a completely unrelated document body over here", "en", "s", 47),  # equal to 4
        (6, "short doc plus a much longer continuation here and then more", "en", "s", 61),
        # a LIKE-based verify would false-match 7 against 8 (the `_`
        # wildcard matches the X); exact substr must not
        (7, "short_doc", "en", "s", 9),
        (8, "shortXdoc plus enough text to be comfortably long", "en", "s", 49),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    pairs = {(r["prefix_id"], r["full_id"]) for r in d17_prefix_containment(spark, d).collect()}
    # 1 is a strict prefix of 2, 3, and 6 (broadcast short arm);
    # 2 is a prefix of 6 (band arm). 4=5 equal text: strict length
    # excludes the pair. 7-vs-8 only matches under LIKE `_` semantics.
    assert pairs == {(1, 2), (1, 3), (1, 6), (2, 6)}, pairs


def test_s15_reduction_preserves_mips_ranking(spark):
    """The norm-augmentation reduction must preserve the inner-product
    ranking: re-ranking the full pair set by aug_cos (same tiebreak)
    yields exactly the top-k the inner product yields, and within each
    emitted query the aug_cosine column is non-increasing."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from sketchmlflink_spark.functions.vector import as_double_array, dot, norm2
    from sketchmlflink_spark.operators.relational import t as load
    from sketchmlflink_spark.operators.similarity import (
        KNN_K, N_QUERIES, s15_mips_topk,
    )
    from tests.conftest import SF_SMALL

    out = s15_mips_topk(spark, SF_SMALL).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        augs = [r["aug_cosine"] for r in rows]
        assert augs == sorted(augs, reverse=True), (q, augs)

    emb = load(spark, SF_SMALL, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    mx = emb.agg(F.max(norm2(F.col("v"))).alias("mx"))
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("n_id"), F.col("v").alias("cv"))
    aug = (dot(F.col("qv"), F.col("cv")) / F.col("mx")) / norm2(F.col("qv"))
    w = Window.partitionBy("q_id").orderBy(F.desc("aug"), F.asc("n_id"))
    via_aug = (
        F.broadcast(q).join(c, F.col("n_id") != F.col("q_id"))
        .crossJoin(F.broadcast(mx))
        .select("q_id", "n_id", aug.alias("aug"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= KNN_K)
    )
    got = {(r["q_id"], r["rnk"]): r["n_id"] for r in via_aug.collect()}
    want = {(r["q_id"], r["rank"]): r["n_id"] for r in out}
    assert got == want


def test_d17_prefix_relation_is_transitive_and_consistent(spark):
    """The emitted prefix relation must be transitive (a<b and b<c =>
    a<c in the output) and length-consistent (prefix_len < full_len,
    lengths match the docs table) on the fixture corpus."""
    from sketchmlflink_spark.operators.dedup import d17_prefix_containment
    from sketchmlflink_spark.operators.relational import t as load

    from tests.conftest import SF_MID

    sf = SF_MID
    pairs = d17_prefix_containment(spark, sf).collect()
    rel = {(r["prefix_id"], r["full_id"]) for r in pairs}
    assert rel, "fixture corpus must contain prefix pairs"
    for a, b in rel:
        for c, d in rel:
            if b == c:
                assert (a, d) in rel, f"transitivity broken: {a}<{b}<{d}"
    lens = dict(
        load(spark, sf, "documents")
        .select("doc_id", F.length(F.trim(F.col("text"))).alias("n"))
        .collect()
    )
    for r in pairs:
        assert r["prefix_len"] < r["full_len"]
        assert lens[r["prefix_id"]] == r["prefix_len"]
        assert lens[r["full_id"]] == r["full_len"]


def test_d18_tiled_pairs_match_d07(spark):
    """d18 (cluster-parallel tile self-join verify) must emit EXACTLY
    d07's pair set — same ids, cosines equal to the same 6-dp rounding.
    tile=7 forces many ragged tiles per bucket on the sf0.001 fixture so
    same-tile triangles, cross-tile blocks, and the first-match band
    rule across tile boundaries are all exercised; tile=10**9 collapses
    d18 to one tile per bucket (the d07 shape) as a degenerate check."""
    from sketchmlflink_spark.operators import dedup as D

    want = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in D.d07_embed_lsh_candidate_verify(spark, "/root/testdata/sf0.001").collect()
    }
    for tile in (7, 10**9):
        got = {
            (r["id_a"], r["id_b"], r["cosine"])
            for r in D.d18_embed_lsh_tiled_pairs(
                spark, "/root/testdata/sf0.001", tile=tile
            ).collect()
        }
        assert got == want, f"tile={tile}: {len(got ^ want)} differing pairs"


def test_d18_emits_each_pair_exactly_once(spark):
    """Tile partitioning must preserve d07's no-distinct invariant: one
    band (sig rule) x one tile pair (vec_id lives in one tile) per pair."""
    from sketchmlflink_spark.operators import dedup as D

    df = D.d18_embed_lsh_tiled_pairs(spark, "/root/testdata/sf0.001", tile=11)
    rows = [(r["id_a"], r["id_b"]) for r in df.collect()]
    assert len(rows) == len(set(rows)), "pair emitted more than once"


def test_d19_output_invariant_under_tile_size(spark):
    """d19's qualifying pair set — and each pair's emitting (band,
    bucket) plus exact integer dot — must not depend on the tile knob;
    only the (ta, tb) task-assignment columns may move. tile=7 forces
    ragged multi-tile buckets, tile=10**9 collapses to one tile."""
    from sketchmlflink_spark.operators import dedup as D

    def core(tile):
        return {
            (r["band"], r["bucket"], r["id_a"], r["id_b"], r["qdot"], r["cosine"])
            for r in D.d19_embed_lsh_tiled_audit(
                spark, "/root/testdata/sf0.001", tile=tile
            ).collect()
        }

    a, b = core(7), core(10**9)
    assert a == b and len(a) > 0


def test_d19_pairs_track_d07_up_to_grid_boundary(spark):
    """The audit twin may only disagree with production d07 on pairs
    whose cosine sits within the 1e-3 quantization grid of the 0.4
    threshold — anywhere else the int-grid predicate and the float
    threshold must agree (same bands, same first-match rule)."""
    from sketchmlflink_spark.operators import dedup as D

    d07 = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in D.d07_embed_lsh_candidate_verify(spark, "/root/testdata/sf0.001").collect()
    }
    d19 = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in D.d19_embed_lsh_tiled_audit(spark, "/root/testdata/sf0.001").collect()
    }
    assert d07 and d19
    for pair in set(d07) ^ set(d19):
        cos = d07.get(pair, d19.get(pair))
        assert abs(cos - D.COSINE_DUP_THRESHOLD) < 2e-3, (pair, cos)
    # agreeing pairs: quantized cosine within one grid step of the float one
    for pair in set(d07) & set(d19):
        assert abs(d07[pair] - d19[pair]) < 2e-3, (pair, d07[pair], d19[pair])
