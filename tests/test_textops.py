"""Semantic checks for the text-analysis operators beyond the oracle
hash-match (which test_correctness_harness covers): the quality filter's
rules must each be live — a gate where no rule ever fires tests nothing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sketchmlflink_spark.operators import textops
from tests.conftest import SF_SMALL


def test_quality_filter_rules_fire(spark):
    df = textops.t06_quality_filter(spark, SF_SMALL).cache()
    total = df.count()
    kept = df.where("keep").count()
    dropped = total - kept
    # the gate must actually split the corpus, not rubber-stamp it
    assert 0 < kept < total, f"kept {kept}/{total}"
    # every emitted reason is one of the documented labels
    reasons = (
        df.where(~F.col("keep"))
        .select(F.explode(F.split("drop_reasons", ",")).alias("r"))
        .distinct()
    )
    labels = {r["r"] for r in reasons.collect()}
    assert labels <= {"too_short", "repetitive", "low_stopword", "token_len"}
    # keep <=> empty reasons, on every row
    bad = df.where(
        (F.col("keep") & (F.col("drop_reasons") != "")) | (~F.col("keep") & (F.col("drop_reasons") == ""))
    ).count()
    assert bad == 0
    # at least two distinct rules fire at this scale (thresholds were
    # calibrated against the corpus deciles, see textops.py QF_*)
    assert len(labels) >= 2, labels
    assert dropped > 0
    df.unpersist()


# --------------------------------------------------------------------------
# t09 — PII scrub on documents that actually contain PII
# --------------------------------------------------------------------------
def test_t09_scrub_masks_real_pii(spark):
    from pyspark.sql import functions as F

    from sketchmlflink_spark.operators.textops import T09_PATTERNS, scrub_text

    docs = spark.createDataFrame(
        [
            ("d1", "contact john.doe%x@sub.example.com or admin@a.io now"),
            ("d2", "server 10.0.0.1 and 192.168.255.12 reachable"),
            ("d3", "ssn 123-45-6789 for customer record"),
            ("d4", "clean text with no sensitive content at all"),
        ],
        "doc_id string, text string",
    )
    hit = docs.select(
        "doc_id",
        scrub_text(F.col("text")).alias("scrubbed"),
        *[
            F.size(F.regexp_extract_all("text", F.lit(p), F.lit(0))).alias(f"n_{k}")
            for k, p in T09_PATTERNS.items()
        ],
    )
    rows = {r["doc_id"]: r for r in hit.collect()}
    assert (rows["d1"]["n_email"], rows["d2"]["n_ipv4"], rows["d3"]["n_ssn"]) == (2, 2, 1)
    assert rows["d3"]["n_deny"] == 1
    assert sum(rows["d4"][f"n_{k}"] for k in T09_PATTERNS) == 0
    # nothing sensitive survives the scrub, and clean text is untouched
    for k, p in T09_PATTERNS.items():
        leftover = hit.select(
            F.sum(F.size(F.regexp_extract_all("scrubbed", F.lit(p), F.lit(0)))).alias("n")
        ).first()["n"]
        assert leftover == 0, f"pattern {k} survived scrubbing"
    assert rows["d4"]["scrubbed"] == "clean text with no sensitive content at all"
    assert "<PII>" in rows["d1"]["scrubbed"] and "<PII>" in rows["d3"]["scrubbed"]


def test_t10_xent_bounds_and_token_conservation(spark):
    """The unigram cross-entropy score must respect the LM's hard
    bounds — every token the model scores exists in its own training
    corpus, so c >= 1 and 0 < nll <= -ln(2/(N+V)) — and the per-doc
    token counts must conserve the corpus total (the token→vocab join
    drops nothing)."""
    import math

    df = textops.t10_unigram_xent(spark, SF_SMALL).cache()
    toks = (
        textops.t(spark, SF_SMALL, "documents")
        .select(F.explode(textops.T.tokens("text")).alias("tok"))
    )
    n_total = toks.count()
    v_size = toks.distinct().count()
    hi = -math.log(2.0 / (n_total + v_size))  # c==1 worst case
    lo = -math.log((toks.groupBy("tok").count().agg(F.max("count")).first()[0] + 1.0)
                   / (n_total + v_size))      # most-common-token best case
    bad = df.where((F.col("xent_nats") < lo - 1e-6) | (F.col("xent_nats") > hi + 1e-6))
    assert bad.count() == 0
    assert df.agg(F.sum("n_tokens")).first()[0] == n_total
    # the score separates the corpus: not all docs identical
    assert df.select("xent_nats").distinct().count() > 1
    df.unpersist()


def test_p15_resample_is_importance_weighted(spark):
    """Gumbel-top-k with w = t12's weight must (a) emit a dense rank
    1..K with a non-increasing key, and (b) actually tilt the sample:
    the mean importance weight of the selected docs must exceed the
    corpus mean by a clear margin (the whole point of resampling), which
    a uniform sample (p14) does not do."""
    from sketchmlflink_spark.operators.pipeline import P15_K, p15_dsir_resample
    from sketchmlflink_spark.operators.textops import t12_dsir_importance

    sf = "/root/testdata/sf0.001"
    rows = p15_dsir_resample(spark, sf).collect()
    assert [r["sample_rank"] for r in rows] == list(range(1, min(P15_K, len(rows)) + 1))
    keys = [r["gumbel_key"] for r in rows]
    assert all(a >= b for a, b in zip(keys, keys[1:]))
    corpus = t12_dsir_importance(spark, sf).collect()
    corpus_mean = sum(r["imp_logratio"] for r in corpus) / len(corpus)
    sample_mean = sum(r["imp_logratio"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_p16_chunk_rule_boundaries(spark):
    """The chunk-count rule at its integer boundaries: a doc of exactly
    CHUNK tokens -> 1 chunk; CHUNK+1 -> 2 chunks with the second ending
    at the last token; coverage is total and in-order with STRIDE
    starts; no chunk is fully contained in its predecessor."""
    import tempfile, os
    from sketchmlflink_spark.operators.pipeline import (
        P16_CHUNK, P16_STRIDE, p16_overlap_chunking,
    )

    rows = []
    for doc_id, n in [(1, 1), (2, P16_CHUNK), (3, P16_CHUNK + 1),
                      (4, P16_CHUNK + P16_STRIDE), (5, 3 * P16_STRIDE + 7)]:
        rows.append((doc_id, " ".join(f"w{i}" for i in range(n)), "en", "src", n))
    d = tempfile.mkdtemp(prefix="p16_fixture_")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    out = p16_overlap_chunking(spark, d).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, n in [(1, 1), (2, P16_CHUNK), (3, P16_CHUNK + 1),
                      (4, P16_CHUNK + P16_STRIDE), (5, 3 * P16_STRIDE + 7)]:
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        expect = 1 if n <= P16_CHUNK else 1 + (n - P16_CHUNK + P16_STRIDE - 1) // P16_STRIDE
        assert len(chunks) == expect, (doc_id, n, len(chunks))
        for i, c in enumerate(chunks):
            assert c["chunk_idx"] == i
            assert c["tok_start"] == i * P16_STRIDE
            assert c["n_tok"] == min(P16_CHUNK, n - i * P16_STRIDE)
            assert c["n_tok"] >= 1
        # last chunk ends exactly at the final token
        last = chunks[-1]
        assert last["tok_start"] + last["n_tok"] == n


def test_t15_bigram_xent_orders_fluency(spark, tmp_path):
    """The bigram LM must score broken word order above repeated
    fluent structure: a corpus where 'the quick fox' repeats makes a
    word-salad doc the xent outlier (t10's unigram score cannot see
    this — all docs share the same token multiset). Docs with < 2
    tokens drop out."""
    import os
    from sketchmlflink_spark.operators.textops import t15_bigram_xent

    fluent = "the quick fox " * 8
    salad = "fox the the quick fox fox quick the quick fox the quick"
    rows = [
        (1, fluent.strip(), "en", "s", len(fluent)),
        (2, fluent.strip(), "en", "s", len(fluent)),
        (3, salad, "en", "s", len(salad)),
        (4, "solo", "en", "s", 4),  # 1 token -> no bigrams -> absent
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    out = {r["doc_id"]: r for r in t15_bigram_xent(spark, d).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["xent_nats"] == out[2]["xent_nats"]  # identical docs tie
    assert out[3]["xent_nats"] > out[1]["xent_nats"]   # salad is the outlier
    assert out[3]["n_bigrams"] == 11


def test_p16_chunks_cover_every_token_with_exact_overlap(spark):
    """Corpus-wide coverage law at sf0.001: within each doc the chunks
    tile [0, n) completely, consecutive chunks overlap by exactly
    CHUNK-STRIDE tokens (except a shorter final chunk), and total
    chunk tokens equal n + overlap_count."""
    from sketchmlflink_spark.operators.pipeline import (
        P16_CHUNK, P16_STRIDE, p16_overlap_chunking,
    )
    from tests.conftest import SF_SMALL

    rows = p16_overlap_chunking(spark, SF_SMALL).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        n = chunks[-1]["tok_start"] + chunks[-1]["n_tok"]  # last ends at n
        covered_to = 0
        for i, c in enumerate(chunks):
            assert c["tok_start"] <= covered_to, (doc_id, i)  # no gap
            covered_to = max(covered_to, c["tok_start"] + c["n_tok"])
            if i > 0:
                prev = chunks[i - 1]
                overlap = prev["tok_start"] + prev["n_tok"] - c["tok_start"]
                if i < len(chunks) - 1:
                    assert overlap == P16_CHUNK - P16_STRIDE, (doc_id, i, overlap)
                else:
                    assert overlap >= P16_CHUNK - P16_STRIDE or c["n_tok"] < P16_CHUNK
        assert covered_to == n
