"""Deduplication operators over the `documents` table — the
training-data-pipeline surface (exact, normalized, n-gram Jaccard,
MinHash+LSH, SimHash).

Scale design (the part that matters at 100 TB):
  * exact/normalized dedup = hash-groupBy — one shuffle on a 16-byte key,
    AQE coalesces the post-shuffle partitions;
  * MinHash+LSH = signatures computed scan-side (no shuffle), then ONE
    shuffle on (band, band_hash); candidate verification touches only
    colliding pairs — never the O(n²) cross product;
  * SimHash = 64-bit signature scan-side, pigeonhole banding (4×16 bit
    chunks) for hamming≤3 candidates, verify with bit_count(xor).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sketchmlflink_spark.functions import text as T
from sketchmlflink_spark.operators.relational import t
from sketchmlflink_spark.registry import register

# MinHash parameters — deterministic, seeded (SURVEY.md §7.4: seed
# everything seedable).
MINHASH_PERMS = 32
MINHASH_BANDS = 8
MINHASH_ROWS_PER_BAND = MINHASH_PERMS // MINHASH_BANDS
MINHASH_PRIME = 2147483647  # 2^31-1; a*h stays < 2^63 (h < 2^32, a < 2^30)
_rng = random.Random(42)
MINHASH_A = [_rng.randrange(1, 1 << 30) for _ in range(MINHASH_PERMS)]
MINHASH_B = [_rng.randrange(0, 1 << 30) for _ in range(MINHASH_PERMS)]

SHINGLE_SIZE = 3
JACCARD_THRESHOLD = 0.3
SIMHASH_MAX_HAMMING = 3


# --------------------------------------------------------------------------
# d01 — exact dedup: hash-groupBy on content digest.
# --------------------------------------------------------------------------
@register(
    "d01_dedup_exact",
    oracle="""
SELECT md5(text)               AS content_hash,
       CAST(count(*) AS BIGINT) AS n_copies,
       MIN(doc_id)              AS keeper_doc_id
FROM documents
GROUP BY md5(text)
""",
    tags=("dedup", "exact"),
)
def d01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: one shuffle on the md5 digest (never on the
    full text bytes — at 100 TB that's the difference that matters)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
    )


# --------------------------------------------------------------------------
# d02 — normalized dedup (casefold + whitespace collapse before hashing).
# --------------------------------------------------------------------------
@register(
    "d02_dedup_normalized",
    oracle=r"""
SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_hash,
       CAST(count(*) AS BIGINT)                                AS n_copies,
       MIN(doc_id)                                             AS keeper_doc_id
FROM documents
GROUP BY 1
""",
    tags=("dedup", "normalized"),
)
def d02_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(T.normalized_text("text")).alias("norm_hash"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
    )


# --------------------------------------------------------------------------
# shared shingle helpers
# --------------------------------------------------------------------------
def shingles(tokens_col):
    """Distinct k-word shingles as strings (k=3).

    IMPORTANT: pass a *materialized column reference* (project the token
    array first), not an inline ``split(...)`` expression — Catalyst
    inlines expression arguments into every ``element_at`` here, which
    re-runs the split per shingle element (measured 10× slowdown).
    A multi-referenced projected column is kept by CollapseProject.

    Equally important: never FILTER on ``size(shingles(...))`` —
    PushDownPredicates substitutes the whole expression (token split
    included) into the pushed-down predicate, re-running the regex split
    ~3×shingle-count times per row (measured 180× slowdown on sf0.1).
    Filter on ``size(tokens) >= SHINGLE_SIZE`` instead — same semantics,
    one split, pushable to the scan."""
    n = F.size(tokens_col)
    mk = lambda i: F.concat_ws(
        " ", *[F.element_at(tokens_col, i + j) for j in range(SHINGLE_SIZE)]
    )
    # guard: for n < SHINGLE_SIZE, sequence(1, 0) would yield the
    # *descending* [1, 0] and element_at(tk, 0) errors under ANSI
    return F.when(
        n >= SHINGLE_SIZE,
        F.array_distinct(F.transform(F.sequence(F.lit(1), n - (SHINGLE_SIZE - 1)), mk)),
    ).otherwise(F.array().cast("array<string>"))


def _duck_shingles(tk: str = "tk") -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(len({tk})-{SHINGLE_SIZE-1}, 0)+1), "
        f"i -> {tk}[i] || ' ' || {tk}[i+1] || ' ' || {tk}[i+2]))"
    )


# --------------------------------------------------------------------------
# d03 — n-gram Jaccard similarity on a linear (adjacent-id) pair join:
# the hash-checkable correctness anchor for the shingle+jaccard math that
# d04's LSH path reuses.
# --------------------------------------------------------------------------
@register(
    "d03_jaccard_adjacent",
    oracle=f"""
WITH s AS (
    SELECT doc_id, {_duck_shingles()} AS sh
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.sh, b.sh)) * 1.0
             / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
""",
    tags=("dedup", "jaccard"),
)
def d03_jaccard_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # NOT persisted, deliberately: the self-join re-tokenizes once per
    # alias, but with only TWO consumers recomputing the projection
    # beats materializing the ~6×-token-bytes shingle cache (measured at
    # sf1: 0.3 s recompute vs 3.1 s persist). d04 persists because its
    # shingle frame feeds FOUR branches.
    s = docs.select("doc_id", T.tokens("text").alias("tk")).select(
        "doc_id", shingles(F.col("tk")).alias("sh")
    )
    a = s.alias("a")
    b = s.alias("b")
    jac = F.size(F.array_intersect("a.sh", "b.sh")) / F.size(F.array_union("a.sh", "b.sh"))
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# d04 — MinHash + LSH near-duplicate detection (the scale path).
# --------------------------------------------------------------------------
def minhash_signatures(sh_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, sh array) → (id, s0..s31 minhash columns).

    The shingle hash stays a Catalyst expression; the 32 permutation
    mins are a numpy partition kernel (optimization guide §4.2, the
    simhash_signatures treatment): the previous ONE-hash-aggregate shape
    with 32 ``min`` columns updated 32 codegen agg slots per exploded
    shingle row and shuffled every token row into the groupBy. The
    kernel evaluates all 32 affine permutations of an Arrow batch as one
    (32 × n) integer matrix and reduces per doc boundary with
    ``np.minimum.reduceat`` — a·h+b < 2^62 (h < 2^32, a < 2^30) so int64
    arithmetic is exact and identical to the JVM's, and the emitted
    PARTIAL min vectors make the result batch/partition-split-invariant
    (a doc-count-sized groupBy merges them with element-wise array min —
    guide §2.3, aggregate before you shuffle).

    ``explode_outer``, not ``explode``: callers guarantee non-empty
    shingle arrays (size(tk) >= SHINGLE_SIZE upstream), and the plain
    inner explode triggers InferFiltersFromGenerate, which synthesizes a
    ``size(sh) > 0`` predicate that PushDownPredicates inlines through
    the projections — re-running the tokenizing regex split once per
    element_at per shingle (~150×/row; measured 30× wall slowdown on
    sf0.1). (xxhash64 never returns NULL — a NULL shingle hashes to the
    seed — so ``h`` is total either way.)"""
    import numpy as np
    import pandas as pd

    from sketchmlflink_spark.session import ensure_workers_can_import

    ensure_workers_can_import(sh_df.sparkSession)
    h = F.pmod(F.xxhash64("sh"), F.lit(1 << 32))
    exploded = sh_df.select(id_col, F.explode_outer("sh").alias("sh")).select(
        id_col, h.alias("h")
    )

    A = np.asarray(MINHASH_A, dtype=np.int64)
    B = np.asarray(MINHASH_B, dtype=np.int64)

    def min_partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            hv = pdf["h"].to_numpy()
            hp = (hv[:, None] * A + B) % MINHASH_PRIME
            starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
            mins = np.minimum.reduceat(hp, starts, axis=0)
            yield pd.DataFrame({id_col: ids[starts], "mins": list(mins)})

    partials = exploded.mapInPandas(min_partials, f"{id_col} long, mins array<long>")
    big = F.array_repeat(F.lit(MINHASH_PRIME).cast("long"), MINHASH_PERMS)
    tot = F.aggregate(
        F.col("ml"), big, lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b))
    )
    return (
        partials.groupBy(id_col)
        .agg(F.collect_list("mins").alias("ml"))
        .select(
            id_col,
            *[tot.getItem(i).alias(f"s{i}") for i in range(MINHASH_PERMS)],
        )
    )


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str = "doc_id", distinct: bool = True
) -> DataFrame:
    """Band the signature columns, explode, self-join per bucket →
    candidate pairs. The only shuffle is on (band, band_hash).
    ``distinct=False`` exposes the raw per-band join output (one row
    per band collision, pre-dedup) — the stage whose task distribution
    the clump probe measures: a (band, band_hash) join KEY cannot split
    across tasks, so a near-dup clump's quadratic pair production lands
    on one task per band (share capped at 1/MINHASH_BANDS by banding
    itself, per-bucket work uncapped — see bin/d04_clump_probe.py)."""
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"s{j * MINHASH_ROWS_PER_BAND + r}").cast("string")
                            for r in range(MINHASH_ROWS_PER_BAND)
                        ],
                    )
                ).alias("band_hash"),
            )
            for j in range(MINHASH_BANDS)
        ]
    )
    exploded = sig_df.select(id_col, F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash")
    )
    x = exploded.alias("x")
    y = exploded.alias("y")
    raw = x.join(
        y,
        (F.col("x.band") == F.col("y.band"))
        & (F.col("x.band_hash") == F.col("y.band_hash"))
        & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
    ).select(F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b"))
    return raw.distinct() if distinct else raw


# Rows per candidate-generation tile (d21). A tile-pair task emits at
# most tile² id pairs (~16 B each ⇒ ≤ ~64 MB) regardless of how hot the
# (band, band_hash) bucket is. Tests shrink this to force multi-tile
# buckets on small fixtures.
D21_TILE = 2048
# Adaptive per-bucket geometry (VERDICT r10 item 6): a clump SMALLER
# than the output-cap tile used to land in ONE tile — the d04
# single-task shape the tiling exists to remove (PROBE_r10_d04_clump:
# tile=2048 read the same 25.3% one-task share as the plain join on a
# ~1500-doc clump). The per-bucket size census is already computed (the
# window count / sizes join), so derive each bucket's tile size from
# its own size instead of a constant: hot buckets split into at least
# D21_TILE_SPLIT tiles (≥ split·(split+1)/2 tile-pair tasks), while the
# D21_TILE ceiling keeps the per-task output cap and D21_TILE_MIN stops
# sub-65k-pair tasks whose scheduling costs more than their work.
D21_TILE_SPLIT = 8
D21_TILE_MIN = 256


def _adaptive_tile(size_col, tile: int):
    """Per-bucket tile size clamp(ceil(size/D21_TILE_SPLIT), min_tile,
    tile) with min_tile = min(tile, D21_TILE_MIN) — so tests that shrink
    ``tile`` below the floor keep their exact fixed geometry, and the
    pair SET is invariant under any geometry (each bucket pair is
    emitted exactly once per bucket key regardless of tiling)."""
    min_tile = min(tile, D21_TILE_MIN)
    return F.greatest(
        F.lit(min_tile),
        F.least(F.lit(tile), F.ceil(size_col / F.lit(D21_TILE_SPLIT))),
    )


def _minhash_tile_pairs(
    exploded: DataFrame, id_col: str, tile: int
) -> DataFrame:
    """The tile-pair frame of lsh_candidate_pairs_tiled, pre-expansion:
    one row per (band, band_hash, ta, tb) with the packed sorted id
    lists of both tiles, repartitioned on the full tile-pair key.
    Extracted so bin/d21_adaptive_probe.py can measure the per-task
    emission geometry (|ia|·|ib| / triangular) without materializing
    the quadratic expansion at probe scales."""
    w_all = Window.partitionBy("band", "band_hash")
    size = F.count(F.lit(1)).over(w_all)
    tiled = exploded.withColumn(
        "m", F.ceil(size / _adaptive_tile(size, tile)).cast("bigint")
    ).withColumn("t", F.pmod(F.xxhash64(F.col(id_col)), F.col("m")).cast("int"))
    # localCheckpoint: the packed groups feed BOTH sides of the tile-pair
    # self-join (the d18 discipline — otherwise the signature banding +
    # window run twice)
    groups = (
        tiled.groupBy("band", "band_hash", "t")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .localCheckpoint()
    )
    a, b = groups.alias("a"), groups.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.t") <= F.col("b.t")),
        )
        .select(
            F.col("a.band").alias("band"),
            F.col("a.band_hash").alias("band_hash"),
            F.col("a.t").alias("ta"),
            F.col("b.t").alias("tb"),
            (F.col("a.t") == F.col("b.t")).alias("same_tile"),
            F.col("a.ids").alias("ia"),
            F.col("b.ids").alias("ib"),
        )
        .repartition("band", "band_hash", "ta", "tb")
    )


def lsh_candidate_pairs_tiled(
    sig_df: DataFrame, id_col: str = "doc_id", tile: int = D21_TILE,
    distinct: bool = True,
) -> DataFrame:
    """lsh_candidate_pairs' EXACT pair set with the per-bucket quadratic
    expansion made cluster-parallel — d18's tiling recipe applied to the
    minhash family (VERDICT r9 item 5; bin/d04_clump_probe.py measured a
    30%-near-dup doc clump putting 24% of the plain shuffle join's output
    in ONE task, two indivisible band-keys on one reducer, per-key work
    growing quadratically with clump size).

    Shape: members of each (band, band_hash) bucket get deterministic
    tile ids (pmod(xxhash64(id), m) with m from the adaptive per-bucket
    geometry, see _adaptive_tile — hash, not row order, so
    sequential-id clumps spread; the d18/ADVICE-r8 lesson); tiles pack
    into single rows (ids only, ≤ tile×8 B); the tile-pair self-join
    (ta ≤ tb) produces FEW, CHEAP rows per bucket key — the quadratic
    pair emission happens AFTER the repartition on (band, band_hash,
    ta, tb), where every tile-pair task is output-capped at tile². Each
    bucket pair is emitted exactly once per band (same-tile pairs
    triangularly, cross-tile pairs by the one (ta, tb) combination), so
    the pre-distinct multiset equals lsh_candidate_pairs'."""
    import numpy as np
    import pandas as pd

    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"s{j * MINHASH_ROWS_PER_BAND + r}").cast("string")
                            for r in range(MINHASH_ROWS_PER_BAND)
                        ],
                    )
                ).alias("band_hash"),
            )
            for j in range(MINHASH_BANDS)
        ]
    )
    exploded = sig_df.select(id_col, F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash")
    )
    tp = _minhash_tile_pairs(exploded, id_col, tile)

    def expand(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                A = np.asarray(row.ia, dtype=np.int64)
                if row.same_tile:
                    if len(A) < 2:
                        continue
                    ii, jj = np.triu_indices(len(A), k=1)
                    lo, hi = A[ii], A[jj]  # ids sorted ⇒ already lo < hi
                else:
                    B = np.asarray(row.ib, dtype=np.int64)
                    la = np.repeat(A, len(B))
                    lb = np.tile(B, len(A))
                    sw = la > lb
                    lo = np.where(sw, lb, la)
                    hi = np.where(sw, la, lb)
                frames.append(pd.DataFrame({"id_a": lo, "id_b": hi}))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    raw = tp.mapInPandas(expand, "id_a long, id_b long")
    return raw.distinct() if distinct else raw


def minhash_near_duplicates(
    docs: DataFrame, threshold: float = JACCARD_THRESHOLD, cand_fn=None
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs verified with exact Jaccard.

    Materialization discipline (the shingle frame feeds FOUR plan
    branches — the signature build duplicated by the banded self-join,
    plus both sides of the exact-verify join — and Catalyst duplicates
    unshared subtrees, so the naive plan tokenizes the corpus 4×):
    ``sh`` is persisted (memory-and-disk — the cache-the-shingles step
    every MinHash pipeline runs; ~6× the token bytes, spillable) and
    the tiny signature table (n_docs × 33) is localCheckpoint'ed so the
    self-join joins materialized rows. Net: documents is scanned and
    tokenized exactly ONCE."""
    from pyspark import StorageLevel

    tok = docs.select("doc_id", T.tokens("text").alias("tk")).where(
        F.size("tk") >= SHINGLE_SIZE  # cheap, scan-pushable; see shingles()
    )
    sh = tok.select("doc_id", shingles(F.col("tk")).alias("sh")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = minhash_signatures(sh).localCheckpoint()
    cands = (cand_fn or lsh_candidate_pairs)(sigs)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


@register(
    "d04_minhash_lsh_neardup",
    oracle=None,  # LSH candidate generation isn't ANSI-SQL-expressible; rows-only
    tags=("dedup", "minhash", "lsh"),
)
def d04_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 perms)+LSH(8 bands×4 rows) near-dups ≥ 0.3 Jaccard,
    verified exactly on candidates. Empty on the synthetic corpus (no
    near-dups by construction) — behavior is fixture-tested in
    tests/test_dedup.py."""
    return minhash_near_duplicates(t(spark, sf_dir, "documents"))


@register(
    "d21_minhash_tiled_neardup",
    oracle=None,  # same non-expressibility as d04 (xxhash64 minhash
    # perms + band hashes no second engine evaluates); EXACT pair-set
    # parity with d04 is pytest-pinned across tile sizes instead
    tags=("dedup", "minhash", "lsh", "tiled"),
)
def d21_minhash_tiled_neardup(
    spark: SparkSession, sf_dir: str, tile: int = D21_TILE
) -> DataFrame:
    """d04's exact output with tiled candidate generation (see
    lsh_candidate_pairs_tiled): the per-(band, band_hash) pair
    explosion is spread across tile-pair tasks with a tile² output cap
    instead of one indivisible join key per band — the 100-TB shape for
    clumped corpora, mirroring d18 beside d07. bin/d04_clump_probe.py
    carries the measured before/after task shares."""
    return minhash_near_duplicates(
        t(spark, sf_dir, "documents"),
        cand_fn=lambda s: lsh_candidate_pairs_tiled(s, tile=tile),
    )


# --------------------------------------------------------------------------
# d05 — SimHash near-duplicate detection.
# --------------------------------------------------------------------------
def simhash_signatures(
    docs: DataFrame, hash_col: Column | None = None, n_bits: int = 64
) -> DataFrame:
    """(doc_id, text) → (doc_id, sim: n_bits-bit SimHash).

    Tokenization and the per-token hash stay Catalyst expressions
    (``hash_col`` is the hash over column ``tok`` — default production
    xxhash64; d20 passes the engine-portable md5 family so the vote is
    DuckDB-replayable). The per-bit majority vote is a numpy partition
    kernel (optimization guide §4.2): the previous shape — ONE hash
    aggregate with n_bits conditional ``sum`` columns over the exploded
    token rows — spent ~85% of the operator's time updating 60-64
    codegen agg slots per token row (measured sf0.1: 2.0 of 2.3 s;
    the explode+hash scan itself is 0.3 s). The kernel bit-unpacks each
    Arrow batch into an (n_rows × n_bits) ±1 matrix and reduces it
    per doc boundary with ``np.add.reduceat`` — integer-exact, batch- and
    partition-split-invariant because it emits PARTIAL vote vectors that
    a (doc-count-sized, not token-count-sized) groupBy merges with an
    element-wise array sum. Shuffle bytes drop from 750k 60-column agg
    rows to n_docs array rows (guide §2.3, aggregate before you
    shuffle)."""
    import numpy as np
    import pandas as pd

    from sketchmlflink_spark.session import ensure_workers_can_import

    ensure_workers_can_import(docs.sparkSession)
    h = F.xxhash64("tok") if hash_col is None else hash_col
    hs = docs.select("doc_id", F.explode(T.tokens("text")).alias("tok")).select(
        "doc_id", h.alias("h")
    )

    def vote_partials(batches):
        shifts = np.arange(n_bits, dtype=np.uint64)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["doc_id"].to_numpy()
            hv = np.ascontiguousarray(pdf["h"].to_numpy())
            # the .view(uint64) bit reinterpretation is only correct for
            # a non-null int64 hash column; a future nullable hash would
            # arrive as float64 and silently garbage every signature —
            # fail loudly instead (ADVICE r11)
            assert hv.dtype == np.int64, f"hash column must be non-null int64, got {hv.dtype}"
            hv = hv.view(np.uint64)
            votes = (
                2 * ((hv[:, None] >> shifts) & np.uint64(1)).astype(np.int64) - 1
            )
            starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
            sums = np.add.reduceat(votes, starts, axis=0)
            yield pd.DataFrame({"doc_id": ids[starts], "votes": list(sums)})

    partials = hs.mapInPandas(vote_partials, "doc_id long, votes array<long>")
    zero = F.array_repeat(F.lit(0).cast("long"), n_bits)
    tot = F.aggregate(
        F.col("vl"), zero, lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b)
    )
    # bit weights as literals — bit 63 is Long.MIN_VALUE, same two's-
    # complement encoding the previous per-column construction used
    weights = F.array(
        *[
            F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
            for i in range(n_bits)
        ]
    )
    sim = F.aggregate(
        F.zip_with(
            tot, weights, lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    return (
        partials.groupBy("doc_id")
        .agg(F.collect_list("votes").alias("vl"))
        .select("doc_id", sim.alias("sim"))
    )


def simhash_near_duplicates(
    docs: DataFrame,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    hash_col: Column | None = None,
    n_bits: int = 64,
    n_chunks: int = 4,
) -> DataFrame:
    """Pigeonhole banding: n_chunks equal-width chunks — any pair within
    hamming ≤ n_chunks−1 agrees on ≥1 chunk; verify with bit_count(xor).

    The signature table (doc_id + one long) is localCheckpoint'ed
    before the banded self-join — Catalyst duplicates unshared join
    subtrees, so without it the corpus is tokenized and bit-voted once
    per side (same discipline as minhash_near_duplicates / sk06)."""
    width = n_bits // n_chunks
    mask = (1 << width) - 1
    sh = simhash_signatures(docs, hash_col=hash_col, n_bits=n_bits).localCheckpoint()
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftrightunsigned("sim", width * i).bitwiseAND(F.lit(mask)).alias("ch"),
            )
            for i in range(n_chunks)
        ]
    )
    e = sh.select("doc_id", "sim", F.explode(chunks).alias("c")).select(
        "doc_id", "sim", F.col("c.chunk").alias("chunk"), F.col("c.ch").alias("ch")
    )
    x = e.alias("x")
    y = e.alias("y")
    ham = F.bit_count(F.col("x.sim").bitwiseXOR(F.col("y.sim")))
    return (
        x.join(
            y,
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.ch") == F.col("y.ch"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .where(ham <= max_hamming)
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
    )


@register(
    "d05_simhash_neardup",
    oracle=None,  # bit-level simhash not expressible in the DuckDB oracle; rows-only
    tags=("dedup", "simhash"),
)
def d05_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit) near-dups with hamming ≤ 3 via 16-bit pigeonhole
    bands. Fixture-tested in tests/test_dedup.py; d20 is the md5 audit
    twin that replays the identical vote/banding math hash-checked."""
    return simhash_near_duplicates(t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# d20 — md5 audit twin of d05 (the d14/d19 template applied to SimHash):
# identical bit-majority vote + pigeonhole banding + bit_count verify,
# but the per-token hash is the engine-portable md5 family, so the WHOLE
# operator — signature, banding, hamming — is DuckDB-replayable and sits
# in the hash-checked oracle set. 60 bits (15 md5 hex chars) because
# Spark conv(hex,16,10) == DuckDB ('0x'||hex)::BIGINT only below 2^63;
# 4×15-bit chunks keep the same hamming≤3 pigeonhole guarantee as d05's
# 4×16-bit geometry.
# --------------------------------------------------------------------------
D20_BITS = 60
D20_CHUNKS = 4


def _d20_votes() -> str:
    return ",\n         ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(D20_BITS)
    )


def _d20_sim() -> str:
    return "\n           + ".join(
        f"CASE WHEN b{i} > 0 THEN {1 << i}::BIGINT ELSE 0::BIGINT END"
        for i in range(D20_BITS)
    )


_D20_WIDTH = D20_BITS // D20_CHUNKS
_D20_MASK = (1 << _D20_WIDTH) - 1
# Per-pair fingerprint folded into the audit sums. The modulus is small
# (< 2^20) ON PURPOSE: a Zipf-head corpus makes the qualifying PAIR SET
# quadratic in the hot clump (112.5M pairs at sf1skew, ~1e10 at
# sf10skew), and sum(per-pair fp) must stay inside BIGINT on both
# engines at any such count (1e10 × 1e6 ≈ 1e16 ≪ 2^63).
D20_FP_MULT = 1_000_003
D20_FP_MOD = 999_983

D20_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
hx AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tok
),
v AS (
  SELECT doc_id,
         {_d20_votes()}
  FROM hx GROUP BY doc_id
),
s AS (
  SELECT doc_id,
         {_d20_sim()} AS sim
  FROM v
),
c AS (
  SELECT doc_id, sim, i AS chunk, (sim >> ({_D20_WIDTH} * i)) & {_D20_MASK} AS ch
  FROM s, unnest(range(0, {D20_CHUNKS})) AS u(i)
),
pr AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.sim, b.sim)) AS hamming
  FROM c a JOIN c b
    ON a.chunk = b.chunk AND a.ch = b.ch AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sim, b.sim)) <= {SIMHASH_MAX_HAMMING}
)
SELECT CAST(hamming AS INT) AS hamming,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(doc_a) AS BIGINT) AS sum_a,
       CAST(sum(doc_b) AS BIGINT) AS sum_b,
       CAST(sum((doc_a * {D20_FP_MULT} + doc_b) % {D20_FP_MOD}) AS BIGINT) AS fp_sum
FROM pr GROUP BY hamming
"""


@register(
    "d20_simhash_md5_audit",
    oracle=D20_ORACLE,
    tags=("dedup", "simhash", "sketch-accuracy"),
)
def d20_simhash_md5_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked audit twin of d05: 60-bit SimHash near-dups
    (hamming ≤ 3, 15-bit pigeonhole bands) with the md5 hash family, so
    DuckDB replays signature construction, banding, and the hamming
    verify byte-exact. d05's production arm keeps xxhash64 (faster,
    Spark-only — rows-only by contract); this twin pins the shared
    vote/banding/bit_count math cross-engine, the same discipline as
    d14 (minhash) and d19 (tiled LSH verify).

    The audited pair set is emitted AGGREGATED — per hamming value, the
    exact pair count plus order-free integer sums of doc_a, doc_b, and a
    modular per-pair fingerprint — not as raw pair rows: a Zipf-head
    corpus (make_sf --skew appends a shared token block to 30% of docs)
    legitimately qualifies the whole hot clump pairwise (112.5M pairs at
    sf1skew), and an audit whose output is quadratic in the clump cannot
    be driver-collected for the cross-engine compare exactly where the
    skew pressure makes auditing most valuable. Any single differing /
    missing / extra pair moves n_pairs and the three sums; output stays
    ≤ hamming+1 rows at every fixture. d05 keeps the row-level pair
    emission (distributed, never collected)."""
    hash_col = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    pairs = simhash_near_duplicates(
        t(spark, sf_dir, "documents"),
        hash_col=hash_col,
        n_bits=D20_BITS,
        n_chunks=D20_CHUNKS,
    )
    fp = (F.col("doc_a") * F.lit(D20_FP_MULT) + F.col("doc_b")) % F.lit(D20_FP_MOD)
    return pairs.groupBy("hamming").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("doc_a").alias("sum_a"),
        F.sum("doc_b").alias("sum_b"),
        F.sum(fp).alias("fp_sum"),
    )


# --------------------------------------------------------------------------
# d06 — embedding-cosine near-duplicate pairs (exact, SQL-oracled).
# --------------------------------------------------------------------------
COSINE_DUP_THRESHOLD = 0.4
D06_BLOCK_ROWS = 4096  # target rows per block: task memory = 2·block·dim doubles
# Replication budget: the block-pair shuffle writes n_blocks copies of the
# corpus (shuffle rows = n_blocks·n, see _replicate_blocks). 64 blocks ≈
# 64× replication ≈ 2⁶·|data| shuffle bytes — already generous for an
# exact-anchor operator. Past this the O(n²) flops are the real problem
# anyway: use d07 (LSH candidates + the same dgemm kernel as verify).
D06_MAX_BLOCKS = 64


@register(
    "d06_embed_cosine_neardup",
    oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      >= {COSINE_DUP_THRESHOLD}
""",
    tags=("dedup", "embedding", "cosine"),
    scale_guard_sf=10.0,  # exact-anchor SF formally pinned at 3
    # (VERDICT r10 item 3): the operator's O(n²) FLOPs are its contract
    # — 37 s at sf1, 370 s at sf3, a measured 3,264 s at sf10 (r10 side
    # session, both engines green) — so the anchor's cross-engine proof
    # runs at ≤ sf3 and sf10 sweeps exclude it rather than carrying a
    # 54-minute single-query tail. The 100-TB path is d04/s03/s05
    # candidates + the same dgemm kernel as verify (d07/d18).
)
def d06_embed_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: all pairs with cosine ≥ 0.4.

    Exact all-pairs as a DISTRIBUTED block-pair matrix product: rows are
    hashed into B blocks, each row is replicated to the B block-pairs it
    participates in (ONE shuffle, replication factor B), and each
    (i ≤ j) block-pair group computes its block×block dgemm inside
    Arrow-batched ``applyInPandas``, thresholding before anything
    materializes. Every unordered pair is examined exactly once (intra-
    block pairs via the i == j triangle; cross-block via the i < j
    rectangle).

    Scale shape: no driver-side corpus materialization anywhere (the
    plan-build runs one ``count`` to size B; tests/test_plans.py pins
    the no-collect property). Task memory is bounded regardless of
    corpus size: 2·D06_BLOCK_ROWS·dim doubles of vectors plus the
    D06_BLOCK_ROWS² cosine tile (~134 MB at 4096 — the dominant term,
    the same one that required tiling in d07's unbounded buckets); the
    O(n²) flops spread over B(B+1)/2 independent tasks. At 100 TB you don't
    run exact all-pairs at all — d04/s03/s05 generate candidates and
    this same dgemm kernel verifies them blockwise — but when a user
    asks for the exact operator, this is the shape that degrades
    gracefully instead of OOMing the driver.
    """
    from sketchmlflink_spark.functions.vector import as_double_array

    emb = t(spark, sf_dir, "embeddings").select("vec_id", as_double_array("embedding").alias("v"))
    return exact_cosine_pairs(emb)


def _replicate_blocks(emb: DataFrame, n_blocks: int) -> DataFrame:
    """Block-pair replication for the exact dgemm: each row lands in the
    n_blocks (pi <= pj) block-pair groups it participates in — shuffle
    row count is EXACTLY n_blocks·n (pinned by tests/test_dedup.py).
    For other == blk the (u, u) triangle group is emitted exactly once."""
    blk = F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).cast("int")
    return (
        emb.withColumn("blk", blk)
        .select(
            "vec_id",
            "v",
            "blk",
            F.explode(F.array(*[F.lit(j) for j in range(n_blocks)])).alias("other"),
        )
        .select(
            "vec_id",
            "v",
            "blk",
            F.least("blk", "other").alias("pi"),
            F.greatest("blk", "other").alias("pj"),
        )
    )


def exact_cosine_pairs(
    emb: DataFrame,
    threshold: float = COSINE_DUP_THRESHOLD,
    block_rows: int | None = None,
    max_blocks: int | None = None,
    per_group_top: int | None = None,
) -> DataFrame:
    """The d06 distributed block-pair dgemm as a reusable kernel:
    (vec_id, v) → all unordered pairs with cosine >= threshold. See
    d06_embed_cosine_neardup for the full scale rationale.

    block_rows/max_blocks default to the module constants resolved at
    CALL time (not def time) so tests can monkeypatch D06_BLOCK_ROWS.

    ``per_group_top``: emit only each block-pair group's top-N pairs
    under the total order (round(cosine, 6) DESC, id_a ASC, id_b ASC)
    instead of every thresholded pair. Block-pair groups PARTITION the
    unordered-pair set, so any pair in the global top-N ranks ≤ N inside
    its own group — the union of per-group top-Ns provably contains the
    global top-N, and a downstream orderBy+limit(N) over it returns
    exactly the rows the full pair stream would (optimization guide
    §2.3/§8: decide with small rows — s02's global top-20 needs 20 rows
    per group to cross the Python→JVM boundary, not the n²/2 pair
    stream, which at sf0.1 was 2M pandas rows Arrow-serialized from one
    task for a 20-row answer)."""
    import math

    import numpy as np
    import pandas as pd

    if block_rows is None:
        block_rows = D06_BLOCK_ROWS
    if max_blocks is None:
        max_blocks = D06_MAX_BLOCKS

    n = emb.count()  # distributed scalar, not a collect
    n_blocks = max(1, math.ceil(n / block_rows))
    if n_blocks > max_blocks:
        raise ValueError(
            f"exact_cosine_pairs: {n} rows at block_rows={block_rows} needs "
            f"{n_blocks} blocks — shuffle volume would be {n_blocks}x the "
            f"corpus ({n_blocks}·n = {n_blocks * n} shuffle rows), past the "
            f"replication budget max_blocks={max_blocks}. Exact "
            "all-pairs is a correctness anchor, not the scale path: use "
            "d07_embed_lsh_candidate_verify (LSH candidates + this same "
            "dgemm kernel as verify), or raise block_rows if task memory "
            "(2·block_rows·dim·8 bytes) allows."
        )

    replicated = _replicate_blocks(emb, n_blocks)

    def pair_block(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pi, pj = key
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        M = np.stack(pdf["v"].to_numpy())
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        side = pdf["blk"].to_numpy() == pi
        if pi == pj:
            A_ids, B_ids, An, Bn = ids, ids, Mn, Mn
        else:
            A_ids, B_ids = ids[side], ids[~side]
            An, Bn = Mn[side], Mn[~side]
        cos = An @ Bn.T
        if per_group_top is not None:
            # top-N of this group's pairs under (round(cos,6) DESC,
            # id_a, id_b) — identical values and order to the full
            # path, just truncated per group (see docstring proof).
            valid = cos >= threshold
            if pi == pj:
                valid &= A_ids[:, None] < B_ids[None, :]
            np.round(cos, 6, out=cos)  # unrounded no longer needed
            cos[~valid] = -np.inf      # sentinel below any real cosine
            flat = cos.ravel()
            k = min(per_group_top, int(valid.sum()))
            if k == 0:
                return pd.DataFrame(
                    {"id_a": ids[:0], "id_b": ids[:0],
                     "cosine": np.empty(0, dtype=np.float64)}
                )
            kth = np.partition(flat, flat.size - k)[flat.size - k]
            sel = np.nonzero(flat >= kth)[0]  # ≥ k rows (rounding ties)
            ii, jj = np.unravel_index(sel, cos.shape)
            ia, ib = A_ids[ii], B_ids[jj]
            lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
            rv = flat[sel]
            order = np.lexsort((hi, lo, -rv))[:per_group_top]
            return pd.DataFrame(
                {"id_a": lo[order], "id_b": hi[order], "cosine": rv[order]}
            )
        ii, jj = np.nonzero(cos >= threshold)
        if pi == pj:
            # triangle: both sides are the same list, so every unordered
            # pair shows up mirrored — keep one and drop self-pairs
            keep = A_ids[ii] < B_ids[jj]
        else:
            # rectangle: each cross-block pair occurs exactly once
            keep = np.ones(ii.shape[0], dtype=bool)
        ia, ib = A_ids[ii][keep], B_ids[jj][keep]
        lo = np.minimum(ia, ib)
        hi = np.maximum(ia, ib)
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "cosine": np.round(cos[ii, jj][keep], 6)}
        )

    return replicated.groupBy("pi", "pj").applyInPandas(
        pair_block, "id_a long, id_b long, cosine double"
    )


# --------------------------------------------------------------------------
# d07 — embedding near-dup via LSH candidate generation + exact verify:
# the architecture that replaces d06's exact all-pairs at 100 TB.
# --------------------------------------------------------------------------
D07_BANDS = 10  # OR-amplification: a pair is a candidate if ANY band matches
D07_BITS = 3    # AND within a band: all three sign bits must agree
D07_SEED = 1234
# Verify-kernel tile edge: peak extra task memory is ~B² doubles
# (32 MB at 2048) regardless of bucket size. Tests shrink this to
# force the multi-block path on small fixtures.
D07_VERIFY_BLOCK = 2048


def _d07_planes(dim: int):
    import numpy as np

    return np.random.default_rng(D07_SEED).standard_normal((D07_BANDS * D07_BITS, dim))


def _d07_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared candidate-generation scan for d07/d18/d19: each embedding
    row signed against the 30 hyperplanes, its 10 × 3-bit band buckets
    packed into one ``sig`` int, then exploded to one row per
    (band, bucket) — the single corpus-wide shuffle the operators pay.

    The signing runs as a numpy partition kernel (optimization guide
    §4.2). The previous Catalyst form built 30 ``aggregate(zip_with(...))``
    dot folds per row — higher-order functions run INTERPRETED with
    per-element boxing, and the expression tree repeated every bit
    column in both ``sig`` and the band array — measured 2.5 s of d18's
    3.3 s at sf0.1 (~500 µs/row for what is 2k flops). The kernel is
    BIT-EXACT with the old fold (and with DuckDB's sequential
    list_dot_product, which d19's oracle replays): it accumulates over
    dimensions in ascending index order, one rounded multiply + one
    rounded add per step from a 0.0 start — the identical IEEE op
    sequence per (row, plane), just vectorized across rows."""
    import numpy as np
    import pandas as pd

    from sketchmlflink_spark.functions.vector import as_double_array
    from sketchmlflink_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    P = _d07_planes(64)  # (30, 64)
    n_planes = D07_BANDS * D07_BITS

    def sign_explode(batches):
        band_ids = np.arange(D07_BANDS, dtype=np.int32)
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            vcol = pdf["v"].to_numpy()
            V = np.stack(vcol)
            acc = np.zeros((n, n_planes))
            for d in range(min(V.shape[1], P.shape[1])):
                acc = acc + V[:, d : d + 1] * P[:, d]
            bits = (acc >= 0).astype(np.int64)
            buckets = np.zeros((n, D07_BANDS), dtype=np.int64)
            for b in range(D07_BANDS):
                for j in range(D07_BITS):
                    buckets[:, b] += bits[:, b * D07_BITS + j] << j
            sig = np.zeros(n, dtype=np.int64)
            for b in range(D07_BANDS):
                sig += buckets[:, b] << (D07_BITS * b)
            rep = np.repeat(np.arange(n), D07_BANDS)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[rep],
                    "v": vcol[rep],
                    "sig": sig[rep].astype(np.int32),
                    "band": np.tile(band_ids, n),
                    "bucket": buckets.reshape(-1).astype(np.int32),
                }
            )

    return emb.mapInPandas(
        sign_explode, "vec_id long, v array<double>, sig int, band int, bucket int"
    )


@register(
    "d07_embed_lsh_candidate_verify",
    oracle=None,  # probabilistic recall; bands vs exact d06 pinned in test_dedup.py
    tags=("dedup", "embedding", "lsh", "candidate-verify"),
)
def d07_embed_lsh_candidate_verify(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = COSINE_DUP_THRESHOLD,
    verify_block: int = D07_VERIFY_BLOCK,
) -> DataFrame:
    """Near-dup pairs (cosine ≥ 0.4) by banded random-hyperplane LSH
    candidate generation + exact in-bucket verification — the shape that
    holds at 100 TB where exact all-pairs (d06) cannot run: each row is
    hashed into D07_BANDS band buckets (ONE shuffle on (band, bucket)),
    exact cosine runs only inside buckets, and each surviving pair is
    emitted by exactly ONE band — the first band the pair collides in,
    decided locally from the full signature carried with the row (all
    10 x 3-bit band buckets packed into ONE 30-bit int). That
    first-match rule replaced the round-1..4 emit-everywhere + global
    ``distinct()`` design after the sf3 scaling probe (BASELINE.md
    round 5): at 16.9x-for-3x-data, most of the shuffle volume was the
    same pair re-verified and re-emitted per colliding band, then paid
    for again in the distinct's shuffle. Band geometry is tuned for
    shuffle weight, the true cost at scale: the explode replicates each
    VECTOR once per band, so 10 bands x 8 buckets beats 16 x 16 even
    at slightly more flops.

    Collision math at the 0.4 threshold (θ ≈ 66.4°, p_bit = 1 − θ/π ≈
    0.634): P(candidate) = 1 − (1 − p_bit³)^10 ≈ 0.95 — measured
    recall vs the exact d06 answer at sf0.001 (tests/test_dedup.py).
    At real near-dup similarity (make_sf's jittered copies, cos ≈
    0.999, p_bit ≈ 0.98) a pair's miss probability is ~1e-19. Honest
    scale note: at a WEAK threshold like 0.4 the LSH gap is small
    (ρ = ln p_bit⁻¹/ln 2 ≈ 0.66 → Ω(n^1.66) candidate work is
    information-theoretically unavoidable), and the OUTPUT itself is
    Θ(matching pairs) = Θ(n²·density); production dedup runs this
    operator at 0.9+, where buckets shrink exponentially in bits and
    the listing is sparse. ``threshold`` is exposed for exactly that
    production operating point (bin/d07_threshold_probe.py measures the
    sf1→sf3 exponent at 0.9; BASELINE.md records the numbers).
    """
    import numpy as np
    import pandas as pd

    # sign bits via Catalyst dots (JVM-side scan); each row carries its
    # FULL per-band signature (10 x 3-bit buckets packed into one int)
    # into every bucket so the first-matching-band rule is locally
    # decidable — no distinct needed
    exploded = _d07_exploded(spark, sf_dir)
    mask = (1 << D07_BITS) - 1

    def verify_bucket(key, pdf: pd.DataFrame) -> pd.DataFrame:
        band = int(key[0])
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        M = np.stack(pdf["v"].to_numpy())
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        sig = pdf["sig"].to_numpy(dtype=np.int64)
        n = ids.shape[0]
        # Blocked upper-triangle verification: bucket population is
        # threshold-INDEPENDENT (banding happens before verify), so a
        # full n x n cosine matrix is O(bucket²) task memory — ~5 GB
        # per task at sf10's ~25k-row buckets, which crashed the sf10
        # probe's Python workers. Tiling the dgemm into B x B blocks
        # bounds peak extra memory at ~B² doubles (32 MB at B=2048) no
        # matter how large the bucket grows; the linear b x dim group
        # payload is then the only scale-bound term.
        B = verify_block  # closure-captured by value at operator build time
        frames = []
        for i0 in range(0, n, B):
            i1 = min(i0 + B, n)
            for j0 in range(i0, n, B):
                j1 = min(j0 + B, n)
                cos = Mn[i0:i1] @ Mn[j0:j1].T
                if j0 == i0:
                    ii, jj = np.nonzero(np.triu(cos >= threshold, k=1))
                else:
                    ii, jj = np.nonzero(cos >= threshold)
                if not ii.size:
                    continue
                c = cos[ii, jj]
                ii = ii + i0
                jj = jj + j0
                keep = ids[ii] != ids[jj]
                ii, jj, c = ii[keep], jj[keep], c[keep]
                if band > 0 and ii.size:
                    # first-match emission: skip any pair that already
                    # collided in an earlier band (that band emits it);
                    # xor makes a colliding band a zero 3-bit field
                    diff = sig[ii] ^ sig[jj]
                    fresh = np.ones(ii.shape[0], dtype=bool)
                    for bp in range(band):
                        fresh &= ((diff >> (D07_BITS * bp)) & mask) != 0
                    ii, jj, c = ii[fresh], jj[fresh], c[fresh]
                if not ii.size:
                    continue
                lo = np.minimum(ids[ii], ids[jj])
                hi = np.maximum(ids[ii], ids[jj])
                frames.append(
                    pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": np.round(c, 6)})
                )
        if not frames:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "cosine": pd.Series(dtype="float64"),
                }
            )
        out = pd.concat(frames, ignore_index=True)
        # a repeated vec_id (outside the embeddings table's uniqueness
        # contract) would emit the same (id_a, id_b) pair once per copy
        # from this bucket now that the global distinct is gone
        # (ADVICE r5) — dedupe locally, keeping the no-shuffle property
        return out.drop_duplicates(subset=["id_a", "id_b"])

    return exploded.groupBy("band", "bucket").applyInPandas(
        verify_bucket, "id_a long, id_b long, cosine double"
    )


# --------------------------------------------------------------------------
# d18 — d07's verify made cluster-parallel: tile self-join instead of
# one task per (band, bucket).
# --------------------------------------------------------------------------
# Rows per tile. Group payload at dim 64 is ~tile × 64 × 8 B ≈ 1 MB;
# a tile-pair task carries two of them and does tile² dots. Tests
# shrink this to force multi-tile buckets on small fixtures.
D18_TILE = 2048


@register(
    "d18_embed_lsh_tiled_pairs",
    oracle=None,  # same non-expressibility as d07 (float-threshold dgemm
    # emission over LSH buckets); EXACT pair-set parity with d07 is
    # pytest-pinned instead (tests/test_dedup.py)
    tags=("dedup", "embedding", "lsh", "tiled", "candidate-verify"),
)
def d18_embed_lsh_tiled_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = COSINE_DUP_THRESHOLD,
    tile: int = D18_TILE,
) -> DataFrame:
    """d07's near-dup pairs with the in-bucket verify lifted to the
    CLUSTER: identical output (pytest-pinned pair-set equality), but the
    O(bucket²) cosine work is split into (tile_a, tile_b) block tasks
    via a Spark-level self-join of tile groups.

    Why it exists: d07's ``groupBy(band, bucket).applyInPandas`` has a
    hard parallelism ceiling of D07_BANDS × 2^D07_BITS = 80 tasks — the
    bucket count is a GEOMETRY constant, not a data-size function, so
    buckets grow linearly with the corpus and each one is verified by
    ONE Python worker. That saturates local[32] (which is why d07's
    sf1→sf10 probe read linear) but caps a 1000-executor cluster at 8%
    utilization, and a hot bucket (dense near-dup clump — the norm in
    real corpora) concentrates its entire quadratic verify in a single
    task, exactly the single-task-state failure st22 fixes for joins.

    Mechanics: rows get a deterministic tile id (vec_id mod
    ceil(bucket/tile)); tiles are packed once per (band, bucket, tile)
    with ``sort_array(collect_list(struct(vec_id, sig, v)))``; a
    self-join on (band, bucket) with tile_a ≤ tile_b yields every tile
    pair exactly once; each pair row is one mapInPandas task doing the
    same blocked dgemm + first-match band rule as d07 (same-tile pairs
    upper-triangle, cross-tile pairs full block). Every qualifying
    (lo, hi) pair is emitted by exactly one band (sig rule) and exactly
    one tile pair (each vec_id lives in one tile), so no distinct is
    needed — d07's invariant, preserved. The price is shuffle
    amplification ∝ tiles-per-bucket (each tile meets m+1 partners);
    ``tile`` is the knob trading replication bytes for parallelism —
    at 100 TB pick tile so tile-pair tasks stay ~seconds, and the
    verify spreads over Σ m_b(m_b+1)/2 tasks instead of 80."""
    import numpy as np
    import pandas as pd

    from sketchmlflink_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    # localCheckpoint: the signing scan (30 Catalyst dots per row + the
    # 10-way explode) feeds TWO consumers — the bucket-size census and
    # the tiled join — and would otherwise run twice (code review,
    # round-8 continued session); same pattern as t12's vocab
    exploded = _d07_exploded(spark, sf_dir).localCheckpoint()
    mask = (1 << D07_BITS) - 1

    sizes = exploded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n_b"))
    # adaptive per-bucket tile (VERDICT r10 item 6 — see _adaptive_tile):
    # a clump smaller than the fixed tile no longer degenerates to one
    # tile-pair task; the census join below already carries n_b
    m = F.greatest(
        F.lit(1), F.ceil(F.col("n_b") / _adaptive_tile(F.col("n_b"), tile))
    ).cast("int")
    # hash before bucketing (ADVICE r8): raw vec_id mod m collapses
    # strided/clustered id ranges into few tiles, recreating the hot-task
    # imbalance this operator removes; xxhash64 is deterministic so the
    # tiling — and the pytest-pinned pair set — stays replayable
    tiled = (
        exploded.join(F.broadcast(sizes), ["band", "bucket"])
        .withColumn("t", F.pmod(F.xxhash64("vec_id"), m).cast("int"))
    )
    groups = tiled.groupBy("band", "bucket", "t").agg(
        F.sort_array(F.collect_list(F.struct("vec_id", "sig", "v"))).alias("rows")
    )
    a, b = groups.alias("a"), groups.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.t") <= F.col("b.t")),
        )
        .select(
            F.col("a.band").alias("band"),
            F.col("a.bucket").alias("bucket"),
            F.col("a.t").alias("ta"),
            F.col("b.t").alias("tb"),
            (F.col("a.t") == F.col("b.t")).alias("same_tile"),
            F.col("a.rows").alias("ra"),
            F.col("b.rows").alias("rb"),
        )
        # the join itself shuffles on the 80 (band, bucket) keys; spread
        # the heavy dgemm rows across the cluster on the full tile-pair
        # key before the UDF — this shuffle IS the parallelism win
        .repartition("band", "bucket", "ta", "tb")
    )

    def _unpack(rows):
        ids = np.fromiter((r["vec_id"] for r in rows), dtype=np.int64, count=len(rows))
        sig = np.fromiter((r["sig"] for r in rows), dtype=np.int64, count=len(rows))
        V = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
        return ids, sig, V / np.linalg.norm(V, axis=1, keepdims=True)

    def verify_pairs(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                ids_a, sig_a, Va = _unpack(row.ra)
                if row.same_tile:
                    ids_b, sig_b, Vb = ids_a, sig_a, Va
                else:
                    ids_b, sig_b, Vb = _unpack(row.rb)
                cos = Va @ Vb.T
                if row.same_tile:
                    ii, jj = np.nonzero(np.triu(cos >= threshold, k=1))
                else:
                    ii, jj = np.nonzero(cos >= threshold)
                if not ii.size:
                    continue
                c = cos[ii, jj]
                keep = ids_a[ii] != ids_b[jj]
                ii, jj, c = ii[keep], jj[keep], c[keep]
                band = int(row.band)
                if band > 0 and ii.size:
                    diff = sig_a[ii] ^ sig_b[jj]
                    fresh = np.ones(ii.shape[0], dtype=bool)
                    for bp in range(band):
                        fresh &= ((diff >> (D07_BITS * bp)) & mask) != 0
                    ii, jj, c = ii[fresh], jj[fresh], c[fresh]
                if not ii.size:
                    continue
                lo = np.minimum(ids_a[ii], ids_b[jj])
                hi = np.maximum(ids_a[ii], ids_b[jj])
                frames.append(
                    pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": np.round(c, 6)})
                )
            if frames:
                yield pd.concat(frames, ignore_index=True).drop_duplicates(
                    subset=["id_a", "id_b"]
                )

    return pairs.mapInPandas(verify_pairs, "id_a long, id_b long, cosine double")


# --------------------------------------------------------------------------
# d19 — d18's tiled verify made hash-checkable: the audit twin.
# --------------------------------------------------------------------------
# d07/d18 stay rows-only because their verify emits by FLOAT threshold
# over a dgemm whose summation order differs from any SQL engine's fold,
# and their tiles come from Spark-only xxhash64. d19 re-runs the SAME
# tiled machinery (d07 banding, first-match band rule, tile-pair
# self-join, blocked verify) with every engine-divergent step replaced
# by an exactly-replayable one, so the entire pipeline — including WHICH
# (band, bucket, tile_a, tile_b) task emits each pair — is a DuckDB hash
# oracle (the d14 template applied to round 8's structural fix):
#   * banding: the identical 30 hyperplanes as repr literals; s03 proved
#     DuckDB's sequential list_dot_product reproduces Spark's `dot` fold
#     byte-exactly, so signs/buckets/sig can never differ;
#   * tiles: round-robin over row_number() ordered by md5(vec_id) within
#     each (band, bucket) — perfectly balanced AND engine-portable,
#     where production d18 uses xxhash64;
#   * verify: embeddings quantized to a 1e-3 int grid (the s05/s06
#     int-grid precedent); cos >= 2/5 becomes the pure-integer predicate
#     qdot > 0 AND 25*qdot^2 >= 4*na2*nb2. With |x| <= 0.6 every product
#     and partial sum stays < 2^53, so the kernel's float64 dgemm IS
#     exact integer arithmetic regardless of summation order.
D19_TILE = 64  # small enough that sf0.01's ~60-row buckets still tile
D19_QSCALE = 1000.0  # 1e-3 verify grid (int components <= 600)
D19_NUM, D19_DEN = 2, 5  # COSINE_DUP_THRESHOLD 0.4 as an exact rational


def _d19_plane_lit(p) -> str:
    # repr round-trips the exact double, so DuckDB parses the
    # bit-identical hyperplane (s03's _duck_plane pattern)
    return "[" + ", ".join(repr(float(x)) for x in p) + "]"


def _d19_bucket_expr(g: int) -> str:
    planes = _d07_planes(64)
    return " + ".join(
        f"(CASE WHEN list_dot_product(v, {_d19_plane_lit(planes[g * D07_BITS + j])})"
        f" >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(D07_BITS)
    )


def _d19_cand(g: int) -> str:
    # first-match band rule as join residuals: band g emits a pair only
    # if every earlier band's 3-bit bucket differs (== the kernel's
    # sig-xor check); min-band dedup without a global GROUP BY
    earlier = " AND ".join(f"a.b{k} != b.b{k}" for k in range(g))
    cond = f" AND {earlier}" if earlier else ""
    return f"""
  SELECT {g} AS band, a.b{g} AS bucket, a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(list_dot_product(a.q, b.q) AS BIGINT) AS qdot, a.na2 AS na2, b.na2 AS nb2
  FROM sigx a JOIN sigx b ON a.b{g} = b.b{g} AND a.vec_id < b.vec_id{cond}
  WHERE a.na2 > 0 AND b.na2 > 0
    AND CAST(list_dot_product(a.q, b.q) AS BIGINT) > 0
    AND {D19_DEN ** 2} * CAST(list_dot_product(a.q, b.q) AS BIGINT)
        * CAST(list_dot_product(a.q, b.q) AS BIGINT)
        >= {D19_NUM ** 2} * a.na2 * b.na2"""


def _d19_oracle() -> str:
    sig_cols = ",\n       ".join(f"({_d19_bucket_expr(g)}) AS b{g}" for g in range(D07_BANDS))
    cands = "\n  UNION ALL\n".join(_d19_cand(g) for g in range(D07_BANDS))
    unnest = ", ".join(f"{{'band': {g}, 'bucket': b{g}}}" for g in range(D07_BANDS))
    return f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {D19_QSCALE} + 0.5) AS BIGINT)) AS q
  FROM embeddings
),
sigx AS MATERIALIZED (
  SELECT vec_id, q, CAST(list_dot_product(q, q) AS BIGINT) AS na2,
       {sig_cols}
  FROM e
),
tl AS MATERIALIZED (
  SELECT vec_id, band, bucket,
         CAST((row_number() OVER (PARTITION BY band, bucket
                                  ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1)
              % CAST(ceil(count(*) OVER (PARTITION BY band, bucket) / {D19_TILE}) AS BIGINT)
              AS INT) AS t
  FROM (
    SELECT vec_id, u.band AS band, u.bucket AS bucket
    FROM sigx, UNNEST([{unnest}]) AS s(u)
  )
),
ver AS MATERIALIZED (
{cands}
)
SELECT v.band, v.bucket,
       CAST(least(ta.t, tb.t) AS INT) AS ta, CAST(greatest(ta.t, tb.t) AS INT) AS tb,
       v.id_a, v.id_b, v.qdot,
       round(v.qdot / sqrt(CAST(v.na2 * v.nb2 AS DOUBLE)), 6) AS cosine
FROM ver v
JOIN tl ta ON ta.band = v.band AND ta.vec_id = v.id_a
JOIN tl tb ON tb.band = v.band AND tb.vec_id = v.id_b
"""


@register(
    "d19_embed_lsh_tiled_audit",
    oracle=_d19_oracle(),
    tags=("dedup", "embedding", "lsh", "tiled", "audit"),
    scale_guard_sf=3.0,  # engine is banded+tiled; the ORACLE's per-band
    # self-joins verify every candidate pair quadratically-in-bucket
    # (27 s at sf1, measured) — guard the cross-engine replay, not the op
)
def d19_embed_lsh_tiled_audit(
    spark: SparkSession,
    sf_dir: str,
    tile: int = D19_TILE,
) -> DataFrame:
    """Hash-checked audit twin of d18 (see module comment above): the
    same tile-pair self-join machinery, with md5-ordered round-robin
    tiles and an exact int-grid verify so DuckDB replays the WHOLE
    pipeline — each output row pins (band, bucket, ta, tb) task
    assignment plus the integer dot — byte-for-byte. Production traffic
    runs d18 (float threshold, xxhash64 tiles); this entry exists so the
    tiling math itself sits in the hash-oracle set instead of rows-only
    (VERDICT r8 item 2)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    from sketchmlflink_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    exploded = _d07_exploded(spark, sf_dir)
    mask = (1 << D07_BITS) - 1

    w_ord = Window.partitionBy("band", "bucket").orderBy("h")
    w_all = Window.partitionBy("band", "bucket")
    tiled = (
        exploded.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .withColumn(
            "m",
            F.ceil(F.count(F.lit(1)).over(w_all) / F.lit(tile)).cast("bigint"),
        )
        .withColumn("t", ((F.row_number().over(w_ord) - F.lit(1)) % F.col("m")).cast("int"))
    )
    # localCheckpoint: the packed groups feed BOTH sides of the tile-pair
    # self-join; without it the 30-dot signing scan + window run twice
    # (the d18 lesson, one frame later in the plan)
    groups = tiled.groupBy("band", "bucket", "t").agg(
        F.sort_array(F.collect_list(F.struct("vec_id", "sig", "v"))).alias("rows")
    ).localCheckpoint()
    a, b = groups.alias("a"), groups.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.t") <= F.col("b.t")),
        )
        .select(
            F.col("a.band").alias("band"),
            F.col("a.bucket").alias("bucket"),
            F.col("a.t").alias("ta"),
            F.col("b.t").alias("tb"),
            (F.col("a.t") == F.col("b.t")).alias("same_tile"),
            F.col("a.rows").alias("ra"),
            F.col("b.rows").alias("rb"),
        )
        .repartition("band", "bucket", "ta", "tb")
    )

    def _unpack(rows):
        ids = np.fromiter((r["vec_id"] for r in rows), dtype=np.int64, count=len(rows))
        sig = np.fromiter((r["sig"] for r in rows), dtype=np.int64, count=len(rows))
        V = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
        # 1e-3 int grid as float64: every entry is an exact integer
        # <= 600, so the dgemm below is EXACT integer arithmetic
        Q = np.floor(V * D19_QSCALE + 0.5)
        na2 = (Q * Q).sum(axis=1).astype(np.int64)
        return ids, sig, Q, na2

    num2, den2 = D19_NUM ** 2, D19_DEN ** 2

    def verify_pairs(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                ids_a, sig_a, Qa, na2 = _unpack(row.ra)
                if row.same_tile:
                    ids_b, sig_b, Qb, nb2 = ids_a, sig_a, Qa, na2
                else:
                    ids_b, sig_b, Qb, nb2 = _unpack(row.rb)
                qd = (Qa @ Qb.T).astype(np.int64)
                ok = (
                    (qd > 0)
                    & (den2 * qd * qd >= num2 * na2[:, None] * nb2[None, :])
                    & (na2[:, None] > 0)
                    & (nb2[None, :] > 0)
                )
                if row.same_tile:
                    ok = np.triu(ok, k=1)
                ii, jj = np.nonzero(ok)
                if not ii.size:
                    continue
                keep = ids_a[ii] != ids_b[jj]
                ii, jj = ii[keep], jj[keep]
                band = int(row.band)
                if band > 0 and ii.size:
                    diff = sig_a[ii] ^ sig_b[jj]
                    fresh = np.ones(ii.shape[0], dtype=bool)
                    for bp in range(band):
                        fresh &= ((diff >> (D07_BITS * bp)) & mask) != 0
                    ii, jj = ii[fresh], jj[fresh]
                if not ii.size:
                    continue
                lo = np.minimum(ids_a[ii], ids_b[jj])
                hi = np.maximum(ids_a[ii], ids_b[jj])
                frames.append(
                    pd.DataFrame(
                        {
                            "band": np.full(ii.shape[0], band, dtype=np.int32),
                            "bucket": np.full(ii.shape[0], int(row.bucket), dtype=np.int32),
                            "ta": np.full(ii.shape[0], int(row.ta), dtype=np.int32),
                            "tb": np.full(ii.shape[0], int(row.tb), dtype=np.int32),
                            "id_a": lo,
                            "id_b": hi,
                            "qdot": qd[ii, jj],
                            "nn": na2[ii] * nb2[jj],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True).drop_duplicates(
                    subset=["id_a", "id_b"]
                )

    out = pairs.mapInPandas(
        verify_pairs,
        "band int, bucket int, ta int, tb int, id_a long, id_b long, qdot long, nn long",
    )
    return out.select(
        "band",
        "bucket",
        "ta",
        "tb",
        "id_a",
        "id_b",
        "qdot",
        F.round(F.col("qdot") / F.sqrt(F.col("nn").cast("double")), 6).alias("cosine"),
    )


# --------------------------------------------------------------------------
# d08 — incremental dedup: a new batch against the existing corpus.
# --------------------------------------------------------------------------
INC_MOD = 10
INC_CUT = 8  # doc_id % 10 >= 8 plays the "incoming batch" (20%)


@register(
    "d08_incremental_dedup",
    oracle=rf"""
WITH h AS (
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_hash,
           doc_id % {INC_MOD} >= {INC_CUT} AS is_inc
    FROM documents
),
corpus_hashes AS (SELECT DISTINCT norm_hash FROM h WHERE NOT is_inc),
inc AS (
    SELECT doc_id, norm_hash,
           row_number() OVER (PARTITION BY norm_hash ORDER BY doc_id) AS rn
    FROM h WHERE is_inc
)
SELECT i.doc_id, i.norm_hash,
       (c.norm_hash IS NULL AND i.rn = 1) AS is_new
FROM inc i LEFT JOIN corpus_hashes c USING (norm_hash)
""",
    tags=("dedup", "incremental"),
)
def d08_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (cross-snapshot) dedup — the recurring-crawl shape:
    each incoming batch is admitted only where its normalized content
    hash is absent from the existing corpus AND it is the first holder
    of that hash within the batch itself. Here the corpus/batch split is
    simulated on doc_id; a deployment feeds two tables.

    Scale shape: everything joins/groups on the 16-byte digest, never
    text. The batch side dedups itself with one window over its own
    (small) hash partition; the corpus probe is a left join on digest —
    at 100 TB keep the corpus hash index as a bucketed table
    (sources/sinks.py::write_bucketed on norm_hash) so the daily probe
    joins bucket-to-bucket with no corpus shuffle, and append the
    admitted hashes back to the same layout."""
    docs = t(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        F.md5(T.normalized_text("text")).alias("norm_hash"),
        (F.col("doc_id") % INC_MOD >= INC_CUT).alias("is_inc"),
    )
    corpus_hashes = h.where(~F.col("is_inc")).select("norm_hash").distinct()
    w = Window.partitionBy("norm_hash").orderBy("doc_id")
    inc = (
        h.where(F.col("is_inc"))
        .withColumn("rn", F.row_number().over(w))
    )
    joined = inc.join(
        corpus_hashes.withColumn("in_corpus", F.lit(True)), "norm_hash", "left"
    )
    return joined.select(
        "doc_id",
        "norm_hash",
        (F.col("in_corpus").isNull() & (F.col("rn") == 1)).alias("is_new"),
    )


# --------------------------------------------------------------------------
# d09 — Bloom-accelerated incremental dedup: same answer as d08, but the
# corpus membership test is a broadcast Bloom sketch, not a join.
# --------------------------------------------------------------------------
BLOOM_M = 1 << 17  # bits (16 KiB) — size to corpus cardinality at scale
BLOOM_K = 5       # hash probes per key


def _bloom_positions(col):
    """k Catalyst xxhash64 probes → bit positions. Both build and probe
    sides use this same expression, so no hash function ever needs a
    Python re-implementation."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(i)), F.lit(BLOOM_M)) for i in range(BLOOM_K)]
    )


@register(
    "d09_bloom_incremental_dedup",
    # EXACT same contract as d08: Bloom false positives are eliminated
    # by the verify join, so the bloom is pure acceleration, not
    # approximation — which is what makes this hash-checkable.
    oracle=rf"""
WITH h AS (
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_hash,
           doc_id % {INC_MOD} >= {INC_CUT} AS is_inc
    FROM documents
),
corpus_hashes AS (SELECT DISTINCT norm_hash FROM h WHERE NOT is_inc),
inc AS (
    SELECT doc_id, norm_hash,
           row_number() OVER (PARTITION BY norm_hash ORDER BY doc_id) AS rn
    FROM h WHERE is_inc
)
SELECT i.doc_id, i.norm_hash,
       (c.norm_hash IS NULL AND i.rn = 1) AS is_new
FROM inc i LEFT JOIN corpus_hashes c USING (norm_hash)
""",
    tags=("dedup", "incremental", "bloom", "sketch"),
)
def d09_bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d08's semantics with the corpus probe replaced by a Bloom sketch:

    1. BUILD (distributed, one job): each corpus partition emits its
       digests' bit positions; ``distinct().collect()`` moves at most
       BLOOM_M ints to the driver — bounded by the FILTER size, not the
       corpus — which packs them into a 16 KiB numpy bitmap.
    2. PROBE (broadcast, no shuffle): incoming rows carry their own k
       positions scan-side (same Catalyst expression as the build); an
       Arrow batch checks them against the broadcast bitmap.
    3. VERIFY (exact, tiny): only bloom-POSITIVE rows — at real scale a
       sliver of the batch — join the corpus digest index to kill false
       positives. Bloom-negative rows are PROVABLY absent (no false
       negatives) and skip the join entirely.

    At 100 TB this replaces the d08 left join's corpus-sized shuffle
    with a fixed-size broadcast + a join whose left side is ~fpp of the
    batch; the same trade the reference makes shipping gradient
    sketches instead of gradients (SketchGradientDescent.scala:340-348).
    """
    import numpy as np
    import pandas as pd

    from sketchmlflink_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    docs = t(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        F.md5(T.normalized_text("text")).alias("norm_hash"),
        (F.col("doc_id") % INC_MOD >= INC_CUT).alias("is_inc"),
    )
    corpus = h.where(~F.col("is_inc"))

    # 1. build: distributed position generation, bounded collect
    set_bits = (
        corpus.select(F.explode(_bloom_positions(F.col("norm_hash"))).alias("pos"))
        .distinct()
        .collect()
    )
    bitmap = np.zeros(BLOOM_M, dtype=bool)
    bitmap[[r["pos"] for r in set_bits]] = True
    bc = spark.sparkContext.broadcast(bitmap)

    # 2. probe: positions computed by Catalyst, membership by Arrow batch
    w = Window.partitionBy("norm_hash").orderBy("doc_id")
    inc = (
        h.where(F.col("is_inc"))
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", "norm_hash", "rn", _bloom_positions(F.col("norm_hash")).alias("pos"))
    )

    def probe(batches):
        bm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            P = np.stack(pdf["pos"].to_numpy())  # (n, BLOOM_K)
            pdf = pdf.drop(columns=["pos"])
            pdf["maybe_in_corpus"] = bm[P].all(axis=1)
            yield pdf

    probed = inc.mapInPandas(
        probe, "doc_id long, norm_hash string, rn int, maybe_in_corpus boolean"
    )

    # 3. verify: only bloom-positives touch the corpus index
    positives = probed.where(F.col("maybe_in_corpus"))
    negatives = probed.where(~F.col("maybe_in_corpus"))
    verified = positives.join(
        corpus.select("norm_hash").distinct().withColumn("in_corpus", F.lit(True)),
        "norm_hash",
        "left",
    ).select(
        "doc_id", "norm_hash",
        (F.col("in_corpus").isNull() & (F.col("rn") == 1)).alias("is_new"),
    )
    definite = negatives.select(
        "doc_id", "norm_hash", (F.col("rn") == 1).alias("is_new")
    )
    return verified.unionByName(definite)


# --------------------------------------------------------------------------
# d10 — span-level exact dedup (C4-style repeated-span removal).
# --------------------------------------------------------------------------
SPAN_CHUNK_WORDS = 3  # span unit; production corpora use ~50-token spans


def span_chunks(text_col) -> F.Column:
    """Non-overlapping SPAN_CHUNK_WORDS-word spans of a text column as a
    pure-Catalyst array<string> (split → sequence → slice; no UDF, no
    shuffle). Shared by d10 (batch) and st12 (streaming)."""
    words = F.split(text_col, " ")
    n_ch = F.floor(F.size(words) / SPAN_CHUNK_WORDS).cast("int")
    return F.when(
        n_ch > 0,
        F.transform(
            F.sequence(F.lit(0), n_ch - 1),
            lambda i: F.concat_ws(
                " ", F.slice(words, i * SPAN_CHUNK_WORDS + 1, SPAN_CHUNK_WORDS)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


@register(
    "d10_span_exact_dedup",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
c AS (
  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         array_to_string(words[i*{SPAN_CHUNK_WORDS}+1 : i*{SPAN_CHUNK_WORDS}+{SPAN_CHUNK_WORDS}], ' ') AS chunk
  FROM w, unnest(range(0, len(words)//{SPAN_CHUNK_WORDS})) AS u(i)
),
r AS (
  SELECT doc_id, chunk_idx, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
  FROM c
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
       coalesce(string_agg(chunk, ' ' ORDER BY chunk_idx) FILTER (WHERE rn = 1), '') AS dedup_text
FROM r GROUP BY doc_id
""",
    tags=("dedup", "span", "substring"),
)
def d10_span_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup: remove every repeated SPAN_CHUNK_WORDS-word
    span corpus-wide, keeping only its first occurrence (ordered by
    (doc_id, chunk_idx)), and reassemble each document from its surviving
    spans — the C4 / "Deduplicating Training Data" repeated-substring
    removal re-expressed as non-overlapping word chunks.

    Plan shape: chunking is pure scan-side Catalyst (split → sequence →
    slice → posexplode — no UDF, no shuffle); first-occurrence election is
    ONE row_number window shuffled on the span's md5 digest; reassembly is
    ONE groupBy(doc_id) with an array_sort(collect_list) rebuild. Two
    shuffles total, each keyed on a short hash/id. A boilerplate span
    repeated millions of times skews the digest partition — AQE skew
    splitting handles the sort, and only rn=1 survives into reassembly, so
    the hot key collapses at source. At 100 TB the only structural change
    is SPAN_CHUNK_WORDS (~50-token spans) — the plan is scale-free.
    """
    docs = t(spark, sf_dir, "documents")
    ch = docs.select("doc_id", F.posexplode(span_chunks("text")).alias("chunk_idx", "chunk")).withColumn(
        "digest", F.md5("chunk")
    )
    w = Window.partitionBy("digest").orderBy("doc_id", "chunk_idx")
    flagged = ch.withColumn("is_kept", F.row_number().over(w) == 1)
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.col("is_kept").cast("long")).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("is_kept"), F.struct("chunk_idx", "chunk"))
                    )
                ),
                lambda x: x["chunk"],
            ),
        ).alias("dedup_text"),
    )


# --------------------------------------------------------------------------
# d11 — semantic dedup: k-means partition + within-cluster greedy prune
# (the SemDeDup recipe: cluster embeddings, drop near-copies per cluster).
# --------------------------------------------------------------------------
SEMDEDUP_K = 8           # coarse clusters (quantizer reused from the IVF path)
SEMDEDUP_TAU = COSINE_DUP_THRESHOLD  # same near-dup bar as d06/d07


def _d11_oracle() -> str:
    """DuckDB replay of the WHOLE d11 pipeline (round 10, off the
    rows-only floor): the s05 unrolled int-grid Lloyd + assignment
    CTEs, then the within-cluster greedy keep-first recurrence as a
    RECURSIVE CTE that decides exactly one row per cluster per
    iteration, carrying the kept set forward as a LIST of
    (id, qp, n2) structs. Depth = max cluster size — bounded at the
    sweep scales, guarded above (scale_guard_sf)."""
    from sketchmlflink_spark.operators.similarity import (
        _DUCK_QE,
        _duck_assign,
        _duck_lloyd,
        _duck_sample,
        IVF_ITERS,
        IVF_TRAIN_CAP,
    )

    num2, den2 = D19_NUM**2, D19_DEN**2
    # First kept row passing the exact rational near-dup test, or NULL.
    # Computed via a lambda chain: dot each kept struct against the
    # candidate (exact — grid ints <= 600 keep every product sum far
    # inside DOUBLE's 2^53 integer range), filter on
    # den2*qd^2 >= num2*n2a*n2b in BIGINT, take the first (the kept
    # list is in vec_id append order).
    hits = (
        "list_filter(list_transform(g.kept, k -> struct_pack("
        "id := k.id, n2 := k.n2, "
        "qd := CAST(list_sum(list_transform(range(64), "
        "j -> k.qp[j+1] * r.qp[j+1])) AS BIGINT))), "
        f"s -> s.qd > 0 AND {den2} * s.qd * s.qd >= {num2} * s.n2 * r.n2)"
    )
    return f"""
WITH RECURSIVE {_DUCK_QE},
{_duck_sample('qe', IVF_TRAIN_CAP)},
{_duck_lloyd('c', 'samp', SEMDEDUP_K, IVF_ITERS, 64)},
{_duck_assign('assign', 'qe', f'c{IVF_ITERS}', 64)},
pn AS MATERIALIZED (
    SELECT a.vec_id, a.cluster,
           list_transform(q.v, x -> CAST(floor(x * {D19_QSCALE} + 0.5) AS BIGINT)) AS qp,
           CAST(list_sum(list_transform(q.v,
                x -> CAST(floor(x * {D19_QSCALE} + 0.5) AS BIGINT)
                     * CAST(floor(x * {D19_QSCALE} + 0.5) AS BIGINT))) AS BIGINT) AS n2,
           row_number() OVER (PARTITION BY a.cluster ORDER BY a.vec_id) AS rn
    FROM assign a JOIN qe q USING (vec_id)
),
greedy AS (
    SELECT cluster, rn, vec_id, TRUE AS is_kept, CAST(NULL AS BIGINT) AS dup_of,
           [struct_pack(id := vec_id, qp := qp, n2 := n2)] AS kept
    FROM pn WHERE rn = 1
    UNION ALL
    SELECT r.cluster, r.rn, r.vec_id,
           len({hits}) = 0 AS is_kept,
           CASE WHEN len({hits}) > 0 THEN ({hits})[1].id END AS dup_of,
           CASE WHEN len({hits}) = 0
                THEN list_append(g.kept, struct_pack(id := r.vec_id, qp := r.qp, n2 := r.n2))
                ELSE g.kept END AS kept
    FROM greedy g JOIN pn r ON r.cluster = g.cluster AND r.rn = g.rn + 1
)
SELECT vec_id, CAST(cluster AS INT) AS cluster, is_kept, dup_of
FROM greedy
"""


@register(
    "d11_semantic_cluster_dedup",
    oracle=_d11_oracle(),
    tags=("dedup", "embedding", "semantic", "cluster"),
    scale_guard_sf=1.0,  # engine is cluster-parallel; the ORACLE's
    # recursive CTE decides one row per cluster per iteration carrying
    # an O(cluster)-struct kept list — depth ~n/K, cost O(n²·dim/K)
    # single-threaded; guard the cross-engine replay, not the op
)
def d11_semantic_cluster_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup à la SemDeDup: k-means the embedding space into
    SEMDEDUP_K clusters, then inside each cluster greedily keep rows in
    vec_id order, dropping any row whose near-dup test against an
    already-kept row passes. Output: (vec_id, cluster, is_kept, dup_of)
    where dup_of is the FIRST kept row (lowest vec_id) the drop
    duplicates.

    Hash-oracled since round 10 (VERDICT r9 item 4) by pinning both
    halves to exact integer arithmetic a second engine replays
    bit-for-bit: cluster assignment is the s05 int-grid quantizer
    (md5-ordered bounded sample, exact-int Lloyd, d² argmin with ties
    to the lowest cluster) instead of the previous float-cosine
    argmax, and the near-dup test is d19's exact rational compare on
    the 1e-3 grid — qd>0 AND den²·qd² >= num²·|a|²·|b|² with
    num/den = 2/5 (the same 0.4 bar as d06/d07, SEMDEDUP_TAU) —
    instead of a float threshold; dup_of names the FIRST kept
    duplicate rather than the nearest, removing the one float argmax
    the recurrence had.

    Scale shape: the quantizer trains on a bounded sample (ONE job,
    `ivf_train_centroids`); assignment is a scan-side numpy argmax
    against broadcast centroids (no shuffle); pruning is ONE shuffle on
    cluster id with the O(cluster²) cosine work spread across clusters —
    never a corpus-wide pair join. This is exactly why SemDeDup scales:
    candidate pairs are confined to same-cluster rows, and cluster count
    grows with the corpus (k ∝ √n in production) to bound per-task cost.
    At 100 TB the structural knobs are SEMDEDUP_K and the sample cap —
    the plan is unchanged.
    """
    import numpy as np
    import pandas as pd

    from sketchmlflink_spark.functions.vector import as_double_array
    from sketchmlflink_spark.operators.similarity import (
        int_d2,
        ivf_train_centroids,
        q_quantize,
    )
    from sketchmlflink_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    emb = t(spark, sf_dir, "embeddings").select("vec_id", as_double_array("embedding").alias("v"))
    C = ivf_train_centroids(emb, k=SEMDEDUP_K)
    bc = spark.sparkContext.broadcast(C)
    num2, den2 = D19_NUM**2, D19_DEN**2

    def assign(batches):
        cents = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["v"].to_numpy())
            # exact-int d² argmin on the 1e-6 quantizer grid, ties to
            # the lowest cluster (argmin = first occurrence) — the s05
            # assignment, bitwise replayable
            cl = int_d2(q_quantize(X), cents).argmin(axis=1)
            # prune grid: 1e-3 ints (exact in float64 through the dot)
            Q = np.floor(X * D19_QSCALE + 0.5)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cluster": cl.astype("int32"), "qp": list(Q)}
            )

    assigned = emb.mapInPandas(assign, "vec_id long, cluster int, qp array<double>")

    def prune(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        Q = np.stack(pdf["qp"].to_numpy())
        n2 = (Q * Q).sum(axis=1).astype(np.int64)
        n = len(ids)
        kept: list[int] = []
        is_kept = np.zeros(n, dtype=bool)
        dup_of = np.full(n, -1, dtype=np.int64)
        for i in range(n):
            if kept:
                qd = (Q[kept] @ Q[i]).astype(np.int64)
                ok = (qd > 0) & (den2 * qd * qd >= num2 * n2[kept] * n2[i])
                hit = np.nonzero(ok)[0]
                if hit.size:
                    dup_of[i] = ids[kept[int(hit[0])]]  # FIRST kept dup
                    continue
            is_kept[i] = True
            kept.append(i)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": np.full(n, key[0], dtype="int32"),
                "is_kept": is_kept,
                "dup_of": [None if d < 0 else int(d) for d in dup_of],
            }
        )

    return assigned.groupBy("cluster").applyInPandas(
        prune, "vec_id long, cluster int, is_kept boolean, dup_of long"
    )


# --------------------------------------------------------------------------
# d12 — decontamination: train-vs-eval n-gram span overlap.
# --------------------------------------------------------------------------
DECON_EVAL_DOCS = 20  # doc_id < 20 plays the held-out benchmark set


D12_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
c AS (
  SELECT doc_id,
         array_to_string(words[i*{SPAN_CHUNK_WORDS}+1 : i*{SPAN_CHUNK_WORDS}+{SPAN_CHUNK_WORDS}], ' ') AS chunk
  FROM w, unnest(range(0, len(words)//{SPAN_CHUNK_WORDS})) AS u(i)
),
ev AS (SELECT DISTINCT chunk FROM c WHERE doc_id < {DECON_EVAL_DOCS}),
tr AS (SELECT doc_id, chunk FROM c WHERE doc_id >= {DECON_EVAL_DOCS}),
agg AS (
  SELECT doc_id,
         count(*) AS n_spans,
         count(*) FILTER (WHERE chunk IN (SELECT chunk FROM ev)) AS n_overlap
  FROM tr GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_spans, 0) AS BIGINT)   AS n_spans,
       CAST(coalesce(a.n_overlap, 0) AS BIGINT) AS n_overlap,
       coalesce(a.n_overlap, 0) > 0             AS is_contaminated
FROM documents d LEFT JOIN agg a USING (doc_id)
WHERE d.doc_id >= {DECON_EVAL_DOCS}
"""


@register(
    "d12_decontaminate_eval_overlap",
    oracle=D12_ORACLE,
    tags=("dedup", "decontamination", "span-overlap"),
)
def d12_decontaminate_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination check: for every training document, how many of
    its word spans also appear in the held-out benchmark set (doc_id <
    DECON_EVAL_DOCS) — the train/eval n-gram overlap scan an LLM
    pipeline runs before training so benchmark text is not memorized.

    Plan shape: eval spans reduce to a DISTINCT digest set (tiny —
    benchmarks are MBs, corpora are TBs) that BROADCASTS to a scan-side
    left join probe over the training spans; per-doc rollup is ONE
    shuffle on doc_id. The training corpus is read once and never
    shuffles its text. At 100 TB the broadcast digest set is the only
    state that scales with the benchmark, not the corpus — exactly why
    production decontamination is a bloom/hash-set probe."""
    docs = t(spark, sf_dir, "documents")
    spans = docs.select(
        "doc_id", F.explode_outer(span_chunks("text")).alias("chunk")
    ).withColumn("digest", F.md5("chunk"))
    ev = (
        spans.where(F.col("doc_id") < DECON_EVAL_DOCS)
        .select("digest")
        .where(F.col("digest").isNotNull())
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    tr = spans.where(F.col("doc_id") >= DECON_EVAL_DOCS)
    probed = tr.join(F.broadcast(ev), "digest", "left")
    return probed.groupBy("doc_id").agg(
        F.count("chunk").alias("n_spans"),
        F.count("hit").alias("n_overlap"),
        (F.count("hit") > 0).alias("is_contaminated"),
    )


# --------------------------------------------------------------------------
# d13 — near-dup graph → connected components (the transitive-closure
# step every corpus-scale dedup pipeline ends with).
# --------------------------------------------------------------------------
D13_SPAN_WORDS = 20   # span unit for the sharing graph (tiny-vocab corpus)
D13_MAX_SPAN_DOCS = 100  # boilerplate cap: spans in more docs are dropped
D13_MAX_ITERS = 20


D13_CC_ROUNDS = 6  # unrolled relax+jump rounds in the oracle; R=4 already
# converges on every fixture up to sf10 (414,079 labeled docs), 6 keeps
# two spare jump-doublings of diameter headroom


def _d13_chunks_sql() -> str:
    """Shared oracle prefix: span digests → doc-pair edge set ``e``.

    Two r11 scale rewrites, both required for the sf10 replay (the r10
    sweep's only red rows — VERDICT r10 item 1):

    * Every CTE is ``AS MATERIALIZED``. DuckDB inlines plain CTEs, so a
      chain of k CTEs each referencing the previous one twice (the
      unrolled closure below, d15's rank rounds) re-evaluates the whole
      edge-build subtree O(2^k) times — the sk06 captured-subtree bug
      class, this time in the ORACLE. With materialization the sf10
      replay runs in ~31 s; without it, sf0.01 never finished.
    * Pair expansion goes through DISTINCT doc-SETS, not the raw chunk
      self-join: replica clusters give many digests the identical doc
      list, so ``SELECT DISTINCT list_sort(list(doc_id))`` collapses the
      fan-out ~|cluster|× before any pair is emitted. The raw self-join
      expanded |bucket|² rows PRE-distinct per digest occurrence and
      spilled >70 GB at sf10 (d15's r10 failure). The resulting pair set
      is identical: union over digests of per-bucket pairs == union over
      distinct bucket doc-sets of per-set pairs (verified equal to the
      old oracle at sf0.01/sf1/sf3).
    """
    k = D13_SPAN_WORDS
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
c AS MATERIALIZED (
  SELECT DISTINCT doc_id, md5(array_to_string(words[i*{k}+1 : i*{k}+{k}], ' ')) AS digest
  FROM w, unnest(range(0, len(words)//{k})) AS u(i)
),
kept AS MATERIALIZED (
  SELECT list_sort(list(doc_id)) AS ds FROM c GROUP BY digest
  HAVING count(*) BETWEEN 2 AND {D13_MAX_SPAN_DOCS}
),
dsets AS MATERIALIZED (SELECT DISTINCT ds FROM kept),
e AS MATERIALIZED (
  SELECT DISTINCT ds[i+1] AS a, ds[j+1] AS b
  FROM dsets, unnest(range(len(ds))) ta(i), unnest(range(len(ds))) tb(j)
  WHERE i < j
)"""


def _cc_unrolled_sql(rounds: int = D13_CC_ROUNDS) -> str:
    """Connected components as unrolled log-round pointer jumping — the
    engine's OWN algorithm (label_propagate) replayed as chained
    MATERIALIZED CTEs, replacing the transitive-closure recursive CTE
    that expanded |cluster|² (v, lbl) rows pre-min and killed DuckDB at
    sf10. Each round: min-label relax across edges (m{{k}}), then one
    pointer jump lbl ← lbl(lbl) (l{{k+1}}); per-round cost is |V|+|E|
    rows, never quadratic. Emits CTEs e2, l0..l{{rounds}}; the converged
    labels are ``l{{rounds}}(v, lbl)``. The jump join always finds
    b.lbl because min-label keeps lbl(v) ≤ v and every vertex appears
    in m{{k}}."""
    parts = [
        "e2 AS MATERIALIZED (SELECT a AS src, b AS dst FROM e"
        " UNION ALL SELECT b, a FROM e)",
        "l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS lbl FROM e2)",
    ]
    for kk in range(rounds):
        parts.append(f"""
m{kk} AS MATERIALIZED (
  SELECT v, min(lbl) AS lbl FROM (
    SELECT v, lbl FROM l{kk}
    UNION ALL
    SELECT e2.dst AS v, l{kk}.lbl FROM e2 JOIN l{kk} ON e2.src = l{kk}.v
  ) GROUP BY v
),
l{kk + 1} AS MATERIALIZED (
  SELECT a.v, b.lbl FROM m{kk} a JOIN m{kk} b ON a.lbl = b.v
)""")
    return ",\n".join(parts)


@register(
    "d13_dup_graph_components",
    oracle=_d13_chunks_sql()
    + f""",
{_cc_unrolled_sql()}
SELECT v AS doc_id, lbl AS comp_id FROM l{D13_CC_ROUNDS}
""",
    tags=("dedup", "graph", "connected-components"),
    # sf10 guard REMOVED in r11: the oracle now replays the engine's own
    # log-round pointer jumping (unrolled materialized CTEs) instead of
    # a transitive closure — 31 s / 414,079 rows at sf10.
)
def d13_dup_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup graph clustering: docs sharing a D13_SPAN_WORDS-word
    span are edges; the output labels every non-singleton doc with its
    component's minimum doc_id — the canonical-representative election
    that turns pairwise near-dup hits (d04/d05/d07 candidates) into
    keep/drop decisions. Spans hotter than D13_MAX_SPAN_DOCS docs are
    dropped as boilerplate BEFORE pairing (the cap that keeps bucket
    joins from exploding on "lorem ipsum" spans).

    Scale shape: edge generation is one shuffle on the 16-byte span
    digest with the per-digest pair fan-out bounded by the cap (work
    ∝ Σ bucket², bucket ≤ cap). Components use alternating min-label
    propagation + pointer jumping — O(log diameter) rounds, each two
    digest-sized shuffles, the standard large-graph CC recipe (the
    labels frame is (v, lbl) longs only). Each round localCheckpoints
    to cut lineage; convergence is an exact changed-row count. The
    reference has no graph operator; this is the Spark-native closure
    of its dedup story.
    """
    docs = t(spark, sf_dir, "documents")
    return label_propagate(dup_span_edges(docs)).select(
        F.col("v").alias("doc_id"), F.col("lbl").alias("comp_id")
    )


def dup_span_edges(docs: DataFrame) -> DataFrame:
    """(src, dst) doc-pair edges of the span-sharing graph — docs that
    share a D13_SPAN_WORDS-word span, with spans hotter than
    D13_MAX_SPAN_DOCS docs dropped as boilerplate before pairing.
    Shared by d13 (connected components) and d15 (PageRank)."""
    words = F.split("text", " ")
    n_ch = F.floor(F.size(words) / D13_SPAN_WORDS).cast("int")
    # guard n_ch=0: sequence(0, -1) is DESCENDING [0, -1] in Spark, not
    # empty — short docs would fabricate chunks the oracle doesn't have
    idxs = F.when(n_ch > 0, F.sequence(F.lit(0), n_ch - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = (
        docs.select(
            "doc_id",
            F.explode(
                F.transform(
                    idxs,
                    lambda i: F.array_join(
                        F.slice(words, i * D13_SPAN_WORDS + 1, D13_SPAN_WORDS), " "
                    ),
                )
            ).alias("chunk"),
        )
        .select("doc_id", F.md5("chunk").alias("digest"))
        .distinct()
    )
    keep = (
        chunks.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where((F.col("n_docs") >= 2) & (F.col("n_docs") <= D13_MAX_SPAN_DOCS))
        .select("digest")
    )
    pruned = chunks.join(keep, "digest")
    a = pruned.alias("a")
    b = pruned.alias("b")
    return (
        a.join(
            b,
            (F.col("a.digest") == F.col("b.digest"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
        .distinct()
    )


def label_propagate(edges: DataFrame, max_iters: int = D13_MAX_ITERS) -> DataFrame:
    """Connected components over an (src, dst) edge DataFrame by
    alternating min-label relaxation + pointer jumping; returns
    (v, lbl) with lbl = min vertex id of v's component. Extracted from
    d13 so property tests can drive it with arbitrary graphs."""
    und = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    und = und.localCheckpoint()  # edge set reused every round: cut the scan

    labels = und.select(F.col("src").alias("v")).distinct().withColumn("lbl", F.col("v"))
    labels = labels.localCheckpoint()
    for _ in range(max_iters):
        # 1) relax across edges: lbl(v) ← min(lbl(v), min lbl(neighbors))
        nbr = (
            und.join(labels, und["dst"] == labels["v"])
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        relaxed = (
            labels.join(nbr, labels["v"] == nbr["src"], "left")
            .select(
                labels["v"].alias("v"),
                labels["lbl"].alias("old_lbl"),
                F.least(labels["lbl"], F.coalesce("nbr_lbl", labels["lbl"])).alias("lbl"),
            )
        )
        # 2) pointer jump: lbl(v) ← lbl(lbl(v)) — halves chain depth.
        # The round's OLD label rides along as old_lbl so convergence is
        # a scan of the (already-materialized) checkpoint instead of a
        # third join+shuffle per round against the previous frame
        # (optimization guide §2.4: the old/new join re-shuffled both
        # label frames every round only to count inequalities).
        ptr = relaxed.select(F.col("v").alias("pv"), F.col("lbl").alias("plbl"))
        jumped = (
            relaxed.join(ptr, relaxed["lbl"] == ptr["pv"], "left")
            .select(
                relaxed["v"].alias("v"),
                relaxed["old_lbl"].alias("old_lbl"),
                F.least(relaxed["lbl"], F.coalesce("plbl", relaxed["lbl"])).alias("lbl"),
            )
            .localCheckpoint()
        )
        changed = jumped.where(F.col("lbl") != F.col("old_lbl")).count()
        labels = jumped.select("v", "lbl")
        if changed == 0:
            break
    else:
        # an unconverged run would silently return wrong labels that
        # surface only as a confusing oracle hash mismatch — fail loud
        raise RuntimeError(
            f"label propagation did not converge in {max_iters} "
            f"rounds ({changed} labels still changing); the graph "
            f"has a pathological diameter — raise max_iters"
        )
    return labels


# --------------------------------------------------------------------------
# d14 — MinHash Jaccard ESTIMATE vs exact (sketch-accuracy audit,
# fully hash-checkable because the hash family is md5-based).
# --------------------------------------------------------------------------
D14_GROUPS = 4          # md5 evaluations per shingle
D14_SLOTS_PER_MD5 = 4   # 8-hex-char (32-bit) windows sliced per digest
D14_SLOTS = D14_GROUPS * D14_SLOTS_PER_MD5


def _d14_duck_groups() -> str:
    return ",\n           ".join(
        f"list_transform(sh, x -> md5('{g}:' || x)) AS hg_{g}"
        for g in range(D14_GROUPS)
    )


def _d14_duck_slots() -> str:
    return ",\n           ".join(
        f"list_min(list_transform(hg_{g}, h -> substr(h, {1 + 8 * j}, 8))) AS slot_{g}_{j}"
        for g in range(D14_GROUPS)
        for j in range(D14_SLOTS_PER_MD5)
    )


_D14_SLOT_NAMES = [f"slot_{g}_{j}" for g in range(D14_GROUPS) for j in range(D14_SLOTS_PER_MD5)]


@register(
    "d14_minhash_estimate_accuracy",
    oracle=f"""
WITH g AS (
    SELECT doc_id, sh,
           {_d14_duck_groups()}
    FROM (
        SELECT doc_id, {{}} AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents)
    )
    WHERE len(sh) > 0
),
s AS (
    SELECT doc_id, sh,
           {_d14_duck_slots()}
    FROM g
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(({" + ".join(f"CASE WHEN a.{n} = b.{n} THEN 1 ELSE 0 END" for n in _D14_SLOT_NAMES)})
             / {D14_SLOTS}.0, 4) AS est_jaccard,
       round(len(list_intersect(a.sh, b.sh)) * 1.0
             / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS exact_jaccard
FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
""".format(_duck_shingles("tk")),
    tags=("dedup", "minhash", "sketch-accuracy"),
)
def d14_minhash_estimate_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash accuracy audit: the Jaccard ESTIMATE from a 16-slot
    MinHash signature next to the exact Jaccard, per adjacent-id pair
    (d03's pair set). The hash family is md5-based with mins taken over
    the lowercase-hex STRING ordering — engine-portable byte-for-byte,
    which is what lets a sketch ESTIMATE sit in the hash-checked oracle
    set instead of a tolerance band (d04's xxhash-based production
    signatures can't be replayed by DuckDB).

    Plan shape (and the perf lessons it encodes — first cut was 13 s at
    sf0.1, this one ~1 s):
      * md5 cost: 16 slots come from FOUR md5 evaluations per shingle,
        each 128-bit digest sliced into four 32-bit min-wise windows;
      * no array-valued column ever crosses a join or broadcast —
        serializing ~150-string shingle arrays through a
        BroadcastExchange was the dominant cost; instead shingles
        explode to (doc_id, digest) rows, the signature is a 16-min
        groupBy, and exact |A∩B| is an exploded digest equi-join
        (|A∪B| = n_a + n_b − |A∩B|);
      * the testdata file is ONE parquet row group → an unsplittable
        scan, so the slim (doc_id, text) frame is repartitioned and
        localCheckpointed (~0.6 MB) to give the CPU-heavy shingle+md5
        projection real parallelism (a bare repartition is optimized
        away once the join goes broadcast; at 100 TB the writer makes
        many row groups and this block is a no-op to delete)."""
    docs = t(spark, sf_dir, "documents")
    slim = docs.select("doc_id", "text").repartition(32, "doc_id").localCheckpoint()
    s = (
        slim.select("doc_id", T.tokens("text").alias("tk"))
        .where(F.size("tk") >= SHINGLE_SIZE)  # NEVER filter on
        # size(shingles(...)) — PushDownPredicates would inline the whole
        # shingle expression into the pushed predicate (see shingles())
        .select("doc_id", shingles(F.col("tk")).alias("sh"))
    )
    ex = s.select("doc_id", F.explode("sh").alias("shingle"))

    def _slot_min(g: int, j: int):
        return F.min(F.substring(f"h_{g}", 1 + 8 * j, 8)).alias(f"slot_{g}_{j}")

    hashed = ex.select(
        "doc_id",
        *[F.md5(F.concat(F.lit(f"{g}:"), "shingle")).alias(f"h_{g}") for g in range(D14_GROUPS)],
    )
    sig = hashed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh"),
        *[_slot_min(g, j) for g in range(D14_GROUPS) for j in range(D14_SLOTS_PER_MD5)],
    )

    # |A∩B| via an equi-join on (doc_b, digest) — digest IN the join key.
    # The r9 form joined on doc_b alone with digest equality as a
    # post-join filter, materializing the per-pair digest CARTESIAN
    # (~|A|·|B| rows per adjacent pair) through the join; at sf10 that
    # killed the JVM (the first full-catalog sf10 sweep's one OOM).
    # Shingle arrays are distinct (shingles() dedups), so the match
    # count IS the intersection size.
    dig = ex.select("doc_id", F.md5("shingle").alias("digest"))
    inter = (
        dig.select((F.col("doc_id") + 1).alias("doc_b"), "digest")
        .join(dig.select(F.col("doc_id").alias("doc_b"), "digest"), ["doc_b", "digest"])
        .groupBy("doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )

    a, b = sig.alias("a"), sig.alias("b")
    matches = sum(
        F.when(F.col(f"a.{n}") == F.col(f"b.{n}"), 1).otherwise(0)
        for n in _D14_SLOT_NAMES
    )
    pairs = (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .join(inter, F.col("b.doc_id") == F.col("doc_b"), "left")
        .withColumn("n_i", F.coalesce("n_inter", F.lit(0)))
    )
    jac = F.col("n_i") / (F.col("a.n_sh") + F.col("b.n_sh") - F.col("n_i"))
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(matches / F.lit(float(D14_SLOTS)), 4).alias("est_jaccard"),
        F.round(jac, 4).alias("exact_jaccard"),
    )


# --------------------------------------------------------------------------
# d15 — PageRank centrality over the span-sharing dup graph: rank the
# docs inside dup clusters so canonical selection can prefer the most
# central copy (the doc sharing spans with the most/least-peripheral
# duplicates) instead of d13's arbitrary min-id representative.
# --------------------------------------------------------------------------
D15_ITERS = 3
D15_DAMPING = 0.85


def _d15_iter_sql(k: int) -> str:
    # MATERIALIZED: DuckDB inlines plain CTEs, so each rank round would
    # re-evaluate the whole edge-build subtree (see _d13_chunks_sql) —
    # the actual spiller behind d15's r10 sf10 failure
    return f"""
r{k + 1} AS MATERIALIZED (
  SELECT e2.dst AS v,
         {1.0 - D15_DAMPING} / (SELECT n_v FROM n)
           + {D15_DAMPING} * sum(r{k}.r / d.deg) AS r
  FROM e2 JOIN r{k} ON e2.src = r{k}.v JOIN deg d ON e2.src = d.v
  GROUP BY e2.dst
)"""


@register(
    "d15_dup_graph_pagerank",
    oracle=_d13_chunks_sql()
    + f""",
e2 AS MATERIALIZED (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
deg AS MATERIALIZED (SELECT src AS v, count(*) AS deg FROM e2 GROUP BY src),
n AS MATERIALIZED (SELECT count(*) AS n_v FROM deg),
r0 AS MATERIALIZED (SELECT v, 1.0 / (SELECT n_v FROM n) AS r FROM deg),
{",".join(_d15_iter_sql(k) for k in range(D15_ITERS))}
SELECT r{D15_ITERS}.v AS doc_id,
       CAST(d.deg AS BIGINT) AS degree,
       round(r{D15_ITERS}.r, 6) AS pagerank
FROM r{D15_ITERS} JOIN deg d ON r{D15_ITERS}.v = d.v
""",
    tags=("dedup", "graph", "pagerank", "iterative"),
    # sf10 guard REMOVED in r11: the doc-set-collapsed edge build +
    # materialized rank rounds replace the pre-distinct |bucket|² chunk
    # self-join that spilled >70 GB at sf10 (see _d13_chunks_sql).
)
def d15_dup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D15_ITERS-round damped PageRank (d=0.85) over the same
    span-sharing graph d13 clusters: r'(v) = (1−d)/|V| + d·Σ r(u)/deg(u)
    over neighbors u. The undirected edge set makes every vertex both
    source and sink, so there are no dangling nodes and Σr stays 1.

    Iteration the Spark way (SURVEY §2.4's driver-loop recipe at graph
    scale): the degree-annotated edge list is localCheckpoint'ed ONCE
    and reused every round; each round is a single (join on src →
    groupBy dst) shuffle pair over (long, long, double) rows — text
    never enters the loop — and the new rank frame is checkpointed to
    cut lineage, exactly d13's propagation discipline. The fixed
    iteration count is what makes the algorithm hash-checkable: the
    oracle unrolls the same D15_ITERS rounds as chained CTEs (the
    s13/MMR trick applied to a graph fixpoint)."""
    docs = t(spark, sf_dir, "documents")
    ranks, deg = pagerank(dup_span_edges(docs))
    return ranks.join(deg, "v").select(
        F.col("v").alias("doc_id"),
        F.col("deg").alias("degree"),
        F.round("r", 6).alias("pagerank"),
    )


def pagerank(edges: DataFrame, iters: int = D15_ITERS, damping: float = D15_DAMPING):
    """D15's driver-loop power iteration over an (src, dst) edge frame;
    returns (ranks (v, r), degrees (v, deg)). Extracted so d16's
    canonical selection reuses the identical fixpoint the oracle
    unrolls."""
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = (
        und.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("src").alias("v"), "deg")
    )
    # (src, dst, deg_src) reused every round — checkpoint once
    und_deg = und.join(
        deg.select(F.col("v").alias("src"), "deg"), "src"
    ).localCheckpoint()
    deg = deg.localCheckpoint()
    n_v = deg.count()
    ranks = deg.select("v", F.lit(1.0 / n_v).alias("r"))
    for _ in range(iters):
        contribs = (
            und_deg.join(ranks, und_deg["src"] == ranks["v"])
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("deg")).alias("s"))
        )
        ranks = contribs.select(
            F.col("dst").alias("v"),
            (F.lit((1.0 - damping) / n_v) + damping * F.col("s")).alias("r"),
        ).localCheckpoint()
    return ranks, deg


# --------------------------------------------------------------------------
# d16 — centrality-canonical dedup decision: the end of the dedup story.
# d13 gives the clusters, d15 gives within-cluster centrality; d16 turns
# them into the actual keep/drop manifest — per duplicate cluster, keep
# the doc with max PageRank (ties: min doc_id), drop the rest.
# --------------------------------------------------------------------------
@register(
    "d16_canonical_selection",
    oracle=_d13_chunks_sql()
    + f""",
{_cc_unrolled_sql()},
comp AS MATERIALIZED (SELECT v AS doc_id, lbl AS comp_id FROM l{D13_CC_ROUNDS}),
deg AS MATERIALIZED (SELECT src AS v, count(*) AS deg FROM e2 GROUP BY src),
n AS MATERIALIZED (SELECT count(*) AS n_v FROM deg),
r0 AS MATERIALIZED (SELECT v, 1.0 / (SELECT n_v FROM n) AS r FROM deg),
{",".join(_d15_iter_sql(k) for k in range(D15_ITERS))},
scored AS MATERIALIZED (
    SELECT comp.comp_id, comp.doc_id, round(r{D15_ITERS}.r, 6) AS pr
    FROM comp JOIN r{D15_ITERS} ON comp.doc_id = r{D15_ITERS}.v
),
ranked AS MATERIALIZED (
    SELECT comp_id, doc_id, pr,
           row_number() OVER (PARTITION BY comp_id
                              ORDER BY pr DESC, doc_id) AS rn
    FROM scored
)
SELECT comp_id,
       min(CASE WHEN rn = 1 THEN doc_id END)       AS canonical_doc_id,
       round(max(CASE WHEN rn = 1 THEN pr END), 6) AS canonical_pr,
       CAST(count(*) AS BIGINT)                    AS n_members,
       CAST(count(*) - 1 AS BIGINT)                AS n_dropped
FROM ranked
GROUP BY comp_id
""",
    tags=("dedup", "graph", "canonical", "pagerank"),
    # sf10 guard REMOVED in r11: recursive transitive closure replaced
    # by the unrolled pointer-jumping CTEs (the engine's own algorithm)
    # and the edge build by the doc-set-collapsed expansion — see
    # _d13_chunks_sql / _cc_unrolled_sql.
)
def d16_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop manifest per duplicate cluster: join d13's connected
    components with d15's PageRank and elect the most CENTRAL doc as
    canonical (highest rank = shares spans with the most well-connected
    duplicates — a better representative than d13's arbitrary min-id),
    ties broken by doc_id on the ROUNDED rank so the election is
    engine-stable. Output: cluster, canonical doc, its rank, member and
    drop counts — the table a dedup pipeline actually applies.

    Plan shape: the edge list is built once (dup_span_edges) and feeds
    both the label propagation and the power iteration; the election is
    a per-component row_number window PARTITIONED on comp_id (parallel,
    component-sized partitions), then one comp_id rollup. All frames
    past the edge build are (long, long, double) rows."""
    docs = t(spark, sf_dir, "documents")
    edges = dup_span_edges(docs).localCheckpoint()
    comp = label_propagate(edges).select(
        F.col("v").alias("doc_id"), F.col("lbl").alias("comp_id")
    )
    ranks, _deg = pagerank(edges)
    scored = comp.join(
        ranks.select(F.col("v").alias("doc_id"), F.round("r", 6).alias("pr")),
        "doc_id",
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("comp_id").orderBy(F.desc("pr"), F.asc("doc_id"))
    ranked = scored.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("comp_id").agg(
        F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("canonical_doc_id"),
        F.round(F.max(F.when(F.col("rn") == 1, F.col("pr"))), 6).alias("canonical_pr"),
        F.count(F.lit(1)).alias("n_members"),
        (F.count(F.lit(1)) - 1).alias("n_dropped"),
    )


# --------------------------------------------------------------------------
# d17 — prefix-containment dedup (truncation-artifact pairs).
# --------------------------------------------------------------------------
D17_BAND_CHARS = 32  # band key: md5 of the first 32 chars


@register(
    "d17_prefix_containment",
    oracle=f"""
WITH t AS (SELECT doc_id, trim(text) AS tx FROM documents)
SELECT a.doc_id   AS prefix_id,
       b.doc_id   AS full_id,
       CAST(len(a.tx) AS BIGINT) AS prefix_len,
       CAST(len(b.tx) AS BIGINT) AS full_len
FROM t a JOIN t b
  ON len(a.tx) < len(b.tx)
 AND substr(b.tx, 1, len(a.tx)) = a.tx
""",
    tags=("dedup", "prefix", "containment"),
    scale_guard_sf=3.0,  # engine is banded+linear; the ORACLE above is a
    # single-threaded quadratic nested loop (368 s at sf1, ~1 h at sf3)
)
def d17_prefix_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-artifact detection: every (prefix, full) pair where
    one document's trimmed text is a STRICT prefix of another's — the
    signature of a re-crawled page cut off mid-stream, which exact
    dedup (d01) misses because the digests differ and near-dup (d04)
    may miss because a short prefix shares few shingles with the full
    text.

    Scale design: a strict-prefix pair necessarily agrees on its first
    D17_BAND_CHARS characters, so docs band on md5(first 32 chars) —
    the ONLY shuffle — and verification (startswith + strict-length)
    touches only same-band pairs, never the O(n²) cross product. Band
    buckets are near-singletons on real text (measured max 3 at
    sf0.01). Docs SHORTER than the band width can't use that key (their
    would-be partners' band keys extend past them); they take a
    broadcast nested-loop arm instead — bounded, because sub-32-char
    docs are pathological-rare in a crawl corpus (ZERO in the fixture,
    whose min length is 48; the arm exists so the operator stays total)
    — the arms are disjoint by the prefix-length split, so no dedupe
    union is needed. Verification compares texts inside a band, so text
    bytes do cross that one exchange — same contract as d04's
    candidate-verify stage; the band digest keeps bucket populations
    near 1, which is what bounds the shuffle.

    The substr-equality verify (not LIKE) keeps the oracle exact when
    text contains SQL wildcard characters.

    Sweep note: the ORACLE is the quadratic brute reference (DuckDB
    nested-loops it single-threaded: 368 s at sf1's 50k docs, ~1 h at
    sf3) — the sf3+ sweeps therefore skip d17 by name, the same
    labeled-quadratic-anchor guard s01/s02 carry. The operator side is
    the banded plan and stays sub-linear-shuffled at every scale."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.trim(F.col("text")).alias("tx")
    ).withColumn("tlen", F.length("tx"))

    pair_cols = [
        F.col("a.doc_id").alias("prefix_id"),
        F.col("b.doc_id").alias("full_id"),
        F.col("a.tlen").cast("long").alias("prefix_len"),
        F.col("b.tlen").cast("long").alias("full_len"),
    ]
    verify = (F.col("a.tlen") < F.col("b.tlen")) & F.col("b.tx").startswith(
        F.col("a.tx")
    )

    banded = docs.withColumn(
        "band", F.md5(F.substring("tx", 1, D17_BAND_CHARS))
    )
    long_a = banded.where(F.col("tlen") >= D17_BAND_CHARS).alias("a")
    long_pairs = long_a.join(
        banded.alias("b"),
        (F.col("a.band") == F.col("b.band")) & verify,
    ).select(*pair_cols)

    shorts = docs.where(F.col("tlen") < D17_BAND_CHARS).alias("a")
    short_pairs = (
        F.broadcast(shorts)
        .join(docs.alias("b"), verify)
        .select(*pair_cols)
    )
    return long_pairs.unionByName(short_pairs)
