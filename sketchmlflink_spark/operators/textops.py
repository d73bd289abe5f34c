"""Text-analysis operators over the `documents` table (SURVEY.md §7.1 M6;
training-data-pipeline surface: language ID, quality scoring, token
counting, fingerprinting).

All of these are Catalyst higher-order functions over split tokens —
JVM-side, whole-stage-codegen'd, no Python UDFs — so they scale linearly
with document bytes and shuffle nothing except the final aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sketchmlflink_spark.functions import text as T
from sketchmlflink_spark.functions import zround
from sketchmlflink_spark.registry import register
from sketchmlflink_spark.operators.relational import t


def _duck_tokens(col: str = "text") -> str:
    return f"regexp_split_to_array(trim({col}), '\\s+')"


# --------------------------------------------------------------------------
# token counting
# --------------------------------------------------------------------------
@register(
    "t01_token_stats_by_lang",
    oracle=f"""
SELECT lang,
       CAST(count(*) AS BIGINT)                                   AS n_docs,
       CAST(sum(len({_duck_tokens()})) AS BIGINT)                 AS total_tokens,
       round(CAST(sum(len({_duck_tokens()})) AS DOUBLE) / count(*), 4) AS avg_tokens,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4)          AS avg_chars
FROM documents
GROUP BY lang
""",
    tags=("text", "tokens"),
)
def t01_token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts per language bucket. Averages divide the
    exact integer sums once and round once — order-free (engine `avg`
    internals over integral types differ; explicit sum/count is
    provably identical cross-engine)."""
    docs = t(spark, sf_dir, "documents")
    # project once: token_count inlined into 3 aggregates would re-split
    with_n = docs.select("lang", "n_chars", T.token_count("text").alias("n_tok"))
    cnt = F.count(F.lit(1))
    return with_n.groupBy("lang").agg(
        cnt.alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.sum("n_tok").cast("double") / cnt, 4).alias("avg_tokens"),
        F.round(F.sum("n_chars").cast("double") / cnt, 4).alias("avg_chars"),
    )


# --------------------------------------------------------------------------
# quality scoring
# --------------------------------------------------------------------------
@register(
    "t02_quality_scores",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, {_duck_tokens()} AS tk FROM documents
)
SELECT doc_id,
       CAST(len(tk) AS BIGINT)                                          AS n_tokens,
       round(len(list_distinct(tk)) * 1.0 / len(tk), 4)                 AS distinct_ratio,
       round(len(list_filter(tk, x -> x IN {T.EN_STOPWORDS!r})) * 1.0
             / len(tk), 4)                                              AS stopword_ratio,
       round(list_sum(list_transform(tk, x -> length(x))) * 1.0
             / len(tk), 4)                                              AS avg_token_len
FROM toks
WHERE len(tk) > 0
""",
    tags=("text", "quality"),
)
def t02_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token count, type/token ratio,
    stopword ratio, mean token length — the standard cheap pre-filters
    in a training-data pipeline."""
    docs = t(spark, sf_dir, "documents")
    tk = T.tokens("text")
    out = docs.select("doc_id", tk.alias("tk")).where(F.size("tk") > 0)
    return out.select(
        "doc_id",
        F.size("tk").cast("long").alias("n_tokens"),
        F.round(T.distinct_token_ratio(F.col("tk")), 4).alias("distinct_ratio"),
        F.round(T.marker_hits(F.col("tk"), T.EN_STOPWORDS) / F.size("tk"), 4).alias("stopword_ratio"),
        F.round(T.avg_token_len(F.col("tk")), 4).alias("avg_token_len"),
    )


# --------------------------------------------------------------------------
# language identification (marker-word heuristic)
# --------------------------------------------------------------------------
def _duck_lang_scores() -> str:
    parts = []
    for lang, words in T.LANG_MARKERS.items():
        parts.append(f"len(list_filter(tk, x -> x IN {words!r})) AS s_{lang}")
    return ",\n           ".join(parts)


@register(
    "t03_lang_id",
    oracle=f"""
WITH scored AS (
    SELECT doc_id, lang,
           {_duck_lang_scores()}
    FROM (SELECT doc_id, lang, {_duck_tokens()} AS tk FROM documents)
)
SELECT doc_id, lang AS labeled_lang,
       CASE
         WHEN s_en >= greatest(s_fr, s_de, s_es) THEN 'en'
         WHEN s_fr >= greatest(s_de, s_es)       THEN 'fr'
         WHEN s_de >= s_es                       THEN 'de'
         ELSE 'es'
       END AS predicted_lang
FROM scored
""",
    tags=("text", "langid"),
)
def t03_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/marker-word language ID heuristic. Deterministic tiebreak
    order en > fr > de > es, mirrored exactly in the oracle."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.col("lang").alias("labeled_lang"), T.tokens("text").alias("tk"))
    scored = tok.select(
        "doc_id",
        "labeled_lang",
        *[
            T.marker_hits(F.col("tk"), words).alias(f"s_{lang}")
            for lang, words in T.LANG_MARKERS.items()
        ],
    )
    pred = (
        F.when(F.col("s_en") >= F.greatest("s_fr", "s_de", "s_es"), "en")
        .when(F.col("s_fr") >= F.greatest("s_de", "s_es"), "fr")
        .when(F.col("s_de") >= F.col("s_es"), "de")
        .otherwise("es")
    )
    return scored.select("doc_id", "labeled_lang", pred.alias("predicted_lang"))


# --------------------------------------------------------------------------
# document fingerprinting (rolling hash)
# --------------------------------------------------------------------------
@register(
    "t04_fingerprints",
    oracle=f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform({_duck_tokens()},
                                     x -> CAST(length(x) * 131 + ord(x[1:1]) AS BIGINT))),
         (acc, x) -> (acc * {T.FINGERPRINT_BASE} + x) % {T.FINGERPRINT_MOD}
       ) AS fingerprint
FROM documents
""",
    tags=("text", "fingerprint"),
)
def t04_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint per document (mod 1e9+7 so
    Spark and DuckDB agree without 64-bit overflow divergence)."""
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", T.rolling_fingerprint(T.tokens("text")).alias("fingerprint"))


# --------------------------------------------------------------------------
# composite quality filter (Gopher/C4-style keep/drop rules)
# --------------------------------------------------------------------------
# Thresholds picked against the synthetic corpus distribution so each
# rule actually fires on a real slice (sf0.01 deciles: stopword_ratio
# p10=0.013, distinct_ratio p10=0.32, n_tokens p10=21): a filter where
# every rule passes 100% of rows tests nothing.
QF_MIN_TOKENS = 25
QF_MIN_DISTINCT = 0.35
QF_MIN_STOPWORD = 0.02
QF_TOKEN_LEN_LO = 3.0
QF_TOKEN_LEN_HI = 8.0


@register(
    "t06_quality_filter",
    oracle=f"""
WITH sig AS (
    SELECT doc_id,
           len(tk)                                                   AS n_tokens,
           len(list_distinct(tk)) * 1.0 / len(tk)                    AS dr,
           len(list_filter(tk, x -> x IN {T.EN_STOPWORDS!r})) * 1.0
             / len(tk)                                               AS sr,
           list_sum(list_transform(tk, x -> length(x))) * 1.0
             / len(tk)                                               AS atl
    FROM (SELECT doc_id, {_duck_tokens()} AS tk FROM documents)
    WHERE len(tk) > 0
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       concat_ws(',',
         CASE WHEN n_tokens < {QF_MIN_TOKENS} THEN 'too_short' END,
         CASE WHEN dr < {QF_MIN_DISTINCT} THEN 'repetitive' END,
         CASE WHEN sr < {QF_MIN_STOPWORD} THEN 'low_stopword' END,
         CASE WHEN atl < {QF_TOKEN_LEN_LO} OR atl > {QF_TOKEN_LEN_HI}
              THEN 'token_len' END) AS drop_reasons,
       (n_tokens >= {QF_MIN_TOKENS} AND dr >= {QF_MIN_DISTINCT}
        AND sr >= {QF_MIN_STOPWORD}
        AND atl BETWEEN {QF_TOKEN_LEN_LO} AND {QF_TOKEN_LEN_HI}) AS keep
FROM sig
""",
    tags=("text", "quality", "filter"),
)
def t06_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite keep/drop quality gate over the t02 signals — the
    C4/Gopher-style rule stack (length, repetition, stopword density,
    token-length band) an LLM-data pipeline applies before dedup. Emits
    per-document verdict + comma-joined reasons so downstream can audit
    drop rates per rule. One scan, pure Catalyst, no shuffle at all
    (per-row projection); at 100 TB this is the cheapest stage in the
    pipeline and the reasons column aggregates into the drop-rate
    dashboard with a single groupBy."""
    docs = t(spark, sf_dir, "documents")
    sig = (
        docs.select("doc_id", T.tokens("text").alias("tk"))
        .where(F.size("tk") > 0)
        .select(
            "doc_id",
            F.size("tk").alias("n_tokens"),
            T.distinct_token_ratio(F.col("tk")).alias("dr"),
            (T.marker_hits(F.col("tk"), T.EN_STOPWORDS) / F.size("tk")).alias("sr"),
            T.avg_token_len(F.col("tk")).alias("atl"),
        )
    )
    reasons = F.concat_ws(
        ",",
        F.when(F.col("n_tokens") < QF_MIN_TOKENS, "too_short"),
        F.when(F.col("dr") < QF_MIN_DISTINCT, "repetitive"),
        F.when(F.col("sr") < QF_MIN_STOPWORD, "low_stopword"),
        F.when(
            (F.col("atl") < QF_TOKEN_LEN_LO) | (F.col("atl") > QF_TOKEN_LEN_HI),
            "token_len",
        ),
    )
    keep = (
        (F.col("n_tokens") >= QF_MIN_TOKENS)
        & (F.col("dr") >= QF_MIN_DISTINCT)
        & (F.col("sr") >= QF_MIN_STOPWORD)
        & F.col("atl").between(QF_TOKEN_LEN_LO, QF_TOKEN_LEN_HI)
    )
    return sig.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        reasons.alias("drop_reasons"),
        keep.alias("keep"),
    )


# --------------------------------------------------------------------------
# BPE-ish token counting (subword budget estimation)
# --------------------------------------------------------------------------
_BPE_SQL_PAT = T.BPE_PATTERN.replace("'", "''")


@register(
    "t05_bpe_token_counts",
    oracle=f"""
SELECT doc_id,
       CAST(len({_duck_tokens()}) AS BIGINT)                          AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_SQL_PAT}')) AS BIGINT) AS n_bpe_tokens,
       round(len(regexp_extract_all(text, '{_BPE_SQL_PAT}')) * 1.0
             / len({_duck_tokens()}), 4)                               AS bpe_per_word
FROM documents
WHERE len({_duck_tokens()}) > 0
""",
    tags=("text", "tokens", "bpe"),
)
def t05_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-pre-tokenizer token counts per document — the
    token-budget estimate an LLM-data pipeline needs scan-side. The
    regex stays inside the Java∩RE2 subset so the DuckDB oracle extracts
    the identical token stream (functions/text.py BPE_PATTERN)."""
    docs = t(spark, sf_dir, "documents")
    ws = T.token_count("text")
    bpe = T.bpe_token_count("text")
    return (
        docs.select("doc_id", ws.alias("n_ws_tokens"), bpe.alias("n_bpe_tokens"))
        .where(F.col("n_ws_tokens") > 0)
        .withColumn("bpe_per_word", F.round(F.col("n_bpe_tokens") / F.col("n_ws_tokens"), 4))
    )


# --------------------------------------------------------------------------
# t07 — BM25 keyword search (lexical retrieval; s10's hybrid partner).
# --------------------------------------------------------------------------
BM25_TERMS = ("spark", "vector", "join")  # the keyword query
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPN = 10


def _bm25_duck() -> str:
    terms_sql = ", ".join(f"'{t_}'" for t_ in BM25_TERMS)
    tf_cols = ", ".join(
        f"len(list_filter(tk, x -> x = '{t_}')) AS tf_{i}" for i, t_ in enumerate(BM25_TERMS)
    )
    unpivot = " UNION ALL ".join(
        f"SELECT doc_id, dl, '{t_}' AS term, tf_{i} AS tf FROM sig WHERE tf_{i} > 0"
        for i, t_ in enumerate(BM25_TERMS)
    )
    return f"""
WITH sig AS (
    SELECT doc_id, len(tk) AS dl, {tf_cols}
    FROM (SELECT doc_id, {_duck_tokens()} AS tk FROM documents)
    WHERE len(tk) > 0
),
tf AS ({unpivot}),
corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM sig),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
    SELECT tf.doc_id,
           sum(CAST(round(
             ln((corpus.n - df.df + 0.5) / (df.df + 0.5) + 1)
             * tf.tf * ({BM25_K1} + 1)
             / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * tf.dl / corpus.avgdl))
           , 12) AS DECIMAL(25,12))) AS score
    FROM tf JOIN df ON tf.term = df.term CROSS JOIN corpus
    WHERE tf.term IN ({terms_sql})
    GROUP BY tf.doc_id
)
SELECT doc_id, CAST(round(score, 6) AS DOUBLE) AS bm25
FROM scored
ORDER BY round(score, 6) DESC, doc_id
LIMIT {BM25_TOPN}
"""


@register(
    "t07_bm25_keyword_search",
    oracle=_bm25_duck(),
    tags=("text", "retrieval", "bm25"),
)
def t07_bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search (k1=1.2, b=0.75, Lucene-style idf) for a
    fixed term query — lexical retrieval beside s10's embedding
    retrieval; together they are the hybrid-search pair.

    Plan shape for 100 TB: per-term tf is computed SCAN-SIDE as
    ``size(filter(tokens, = term))`` columns and unpivoted with
    ``stack`` — the corpus is never exploded and never shuffled on
    tokens. What leaves the scan is one (doc, term, tf, dl) row per
    MATCHED term (zero rows for the overwhelming majority of docs that
    match nothing). Corpus stats (N, avgdl) and per-term df are tiny
    aggregates broadcast back; the only wide op is the final global
    top-N (TakeOrderedAndProject). For open vocabularies swap the fixed
    columns for an inverted-index explode bucketed by term.
    """
    docs = t(spark, sf_dir, "documents")
    tk = T.tokens("text")
    sig = docs.select("doc_id", tk.alias("tk")).where(F.size("tk") > 0)
    def _tf_col(term: str, i: int):
        # one-arg lambda: a two-arg lambda would be read by F.filter as
        # the (element, index) signature and receive the index instead
        return F.size(F.filter("tk", lambda x: x == F.lit(term))).alias(f"tf_{i}")

    tf_cols = [_tf_col(t_, i) for i, t_ in enumerate(BM25_TERMS)]
    per_doc = sig.select("doc_id", F.size("tk").alias("dl"), *tf_cols)
    stack_expr = "stack({n}, {args}) as (term, tf)".format(
        n=len(BM25_TERMS),
        args=", ".join(f"'{t_}', tf_{i}" for i, t_ in enumerate(BM25_TERMS)),
    )
    tf = per_doc.selectExpr("doc_id", "dl", stack_expr).where(F.col("tf") > 0)

    corpus = per_doc.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            (
                F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
                * F.col("tf") * (BM25_K1 + 1)
                / (F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")))
            ).alias("s"),
        )
        .groupBy("doc_id")
        # per-term score fixed as 12-dp DECIMAL → exact order-free
        # per-doc sum (t12/t15 recipe, round 8)
        .agg(F.sum(F.round(F.col("s"), 12).cast("decimal(25,12)")).alias("score"))
    )
    return (
        scored.select("doc_id", F.round("score", 6).cast("double").alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_TOPN)
    )


# --------------------------------------------------------------------------
# t08 — repetition stats (Gopher-style repeated-n-gram filter signals).
# --------------------------------------------------------------------------
T08_TOP_FRAC = 0.08  # docs whose top bigram exceeds this fraction are flagged


@register(
    "t08_repetition_stats",
    oracle=f"""
WITH bg AS (
    SELECT doc_id,
           list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) AS bgs
    FROM (SELECT doc_id, {_duck_tokens()} AS tk FROM documents)
    WHERE len(tk) >= 2
),
cnt AS (
    SELECT doc_id, b AS bigram, count(*) AS n
    FROM bg, unnest(bgs) AS u(b)
    GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(n) AS BIGINT)       AS n_bigrams,
       CAST(count(*) AS BIGINT)     AS n_distinct_bigrams,
       round(max(n) * 1.0 / sum(n), 6) AS top_bigram_frac,
       (max(n) * 1.0 / sum(n)) > {T08_TOP_FRAC} AS flagged
FROM cnt
GROUP BY doc_id
""",
    tags=("text", "quality", "repetition"),
)
def t08_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-n-gram signals (the Gopher repetition filters): per doc,
    total/distinct bigram counts and the fraction of the most frequent
    bigram; docs above T08_TOP_FRAC are flagged as loop/boilerplate
    suspects. Complements t06's unigram repetition rule (dr) with
    phrase-level structure.

    Scale shape: bigrams are built scan-side with zip_with over two
    array slices (no Python, no pre-shuffle explosion materialized);
    the explode feeds a (doc_id, bigram) partial count that collapses
    map-side before ONE shuffle, and the second doc_id aggregation
    rides the same hash clustering (doc_id is a prefix of the first
    key). State per doc is three longs — nothing scales with doc
    length past the scan."""
    docs = t(spark, sf_dir, "documents")
    tk = T.tokens("text")
    sig = docs.select("doc_id", tk.alias("tk")).where(F.size("tk") >= 2)
    bigrams = F.zip_with(
        F.slice("tk", 1, F.size("tk") - 1),
        F.slice("tk", 2, F.size("tk") - 1),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    cnt = (
        sig.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cnt.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_bigrams"),
        F.round(F.max("n") / F.sum("n"), 6).alias("top_bigram_frac"),
        ((F.max("n") / F.sum("n")) > T08_TOP_FRAC).alias("flagged"),
    )


# --------------------------------------------------------------------------
# t09 — PII / deny-list scrubbing: the redaction pass every
# training-data pipeline runs before a corpus ships. Pure Catalyst
# regexp_extract_all / regexp_replace (JVM regex, codegen'd — no Python
# in the path), with per-source audit aggregates as the output.
# --------------------------------------------------------------------------
# Patterns are written in the RE2 ∩ java.util.regex common dialect
# (\b, \d, (?:...) — no lookbehind) so the SAME strings run in Spark
# and in the DuckDB oracle.
T09_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # deny-list term (entity names, internal codewords, ... — here a
    # term that actually occurs in the synthetic corpus so the replace
    # path is exercised end-to-end, not vacuously)
    "deny": r"\bcustomer\b",
}
T09_MASK = "<PII>"


def scrub_text(col):
    """text → scrubbed text: every pattern class replaced by the mask.
    Composable (used by t09's audit and by pipeline sinks)."""
    out = col
    for pat in T09_PATTERNS.values():
        out = F.regexp_replace(out, pat, T09_MASK)
    return out


@register(
    "t09_pii_scrub_audit",
    oracle=f"""
WITH hits AS (
    SELECT source,
           length(text) AS n_chars,
           len(regexp_extract_all(text, '{T09_PATTERNS["email"]}')) AS n_email,
           len(regexp_extract_all(text, '{T09_PATTERNS["ipv4"]}'))  AS n_ipv4,
           len(regexp_extract_all(text, '{T09_PATTERNS["ssn"]}'))   AS n_ssn,
           len(regexp_extract_all(text, '{T09_PATTERNS["deny"]}'))  AS n_deny,
           length(
               regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(text,
                               '{T09_PATTERNS["email"]}', '{T09_MASK}', 'g'),
                           '{T09_PATTERNS["ipv4"]}', '{T09_MASK}', 'g'),
                       '{T09_PATTERNS["ssn"]}', '{T09_MASK}', 'g'),
                   '{T09_PATTERNS["deny"]}', '{T09_MASK}', 'g')
           ) AS n_chars_scrubbed
    FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(CASE WHEN n_email + n_ipv4 + n_ssn + n_deny > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS docs_flagged,
       CAST(sum(n_email) AS BIGINT) AS emails,
       CAST(sum(n_ipv4) AS BIGINT)  AS ipv4s,
       CAST(sum(n_ssn) AS BIGINT)   AS ssns,
       CAST(sum(n_deny) AS BIGINT)  AS deny_hits,
       CAST(sum(n_chars - n_chars_scrubbed) AS BIGINT) AS chars_removed
FROM hits
GROUP BY source
""",
    tags=("text", "pii", "scrub", "redaction"),
)
def t09_pii_scrub_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect-and-mask audit per source: match counts for each PII
    class (email / IPv4 / SSN / deny-term) plus the exact character
    delta the scrub produced. Single scan, scan-side projection, one
    hash-agg on source — at 100 TB this is bandwidth-bound parquet
    streaming with a 20-row result. The scrubbed corpus itself is the
    same `scrub_text` expression written through a partitioned sink
    (p04's path); pytest covers real PII strings round-trip
    (tests/test_textops.py)."""
    docs = t(spark, sf_dir, "documents")
    hit = docs.select(
        "source",
        F.length("text").alias("n_chars"),
        *[
            F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0))).alias(f"n_{k}")
            for k, pat in T09_PATTERNS.items()
        ],
        F.length(scrub_text(F.col("text"))).alias("n_chars_scrubbed"),
    )
    flagged = (
        (F.col("n_email") + F.col("n_ipv4") + F.col("n_ssn") + F.col("n_deny")) > 0
    ).cast("long")
    return hit.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(flagged).alias("docs_flagged"),
        F.sum("n_email").alias("emails"),
        F.sum("n_ipv4").alias("ipv4s"),
        F.sum("n_ssn").alias("ssns"),
        F.sum("n_deny").alias("deny_hits"),
        F.sum(F.col("n_chars") - F.col("n_chars_scrubbed")).alias("chars_removed"),
    )


# --------------------------------------------------------------------------
# t10 — corpus-trained unigram LM cross-entropy (the CCNet/RedPajama-style
# "perplexity" quality signal, self-trained so it needs no external model).
# --------------------------------------------------------------------------
@register(
    "t10_unigram_xent",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, unnest({_duck_tokens()}) AS tok FROM documents
),
vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
stats AS (SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS v_size FROM vocab)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(CAST(sum(CAST(round(-ln((c + 1.0) / (n_total + v_size)), 12)
                           AS DECIMAL(25,12))) AS DOUBLE) / count(*), 4) AS xent_nats
FROM toks JOIN vocab USING (tok) CROSS JOIN stats
GROUP BY doc_id
""",
    tags=("text", "quality", "lm", "perplexity"),
)
def t10_unigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under an add-one-smoothed unigram LM
    trained on the corpus itself: xent = avg(-ln((c_tok+1)/(N+V))).
    High-xent documents are token-level outliers — the same signal the
    CCNet wiki-LM perplexity filter thresholds on, but self-contained
    (no external model artifact).

    Plan shape for 100 TB: one explode → two aggregations, both with
    map-side partial aggregation (token counts, then per-doc avg). The
    token→count join is a shuffle join on the token key; Zipf skew on
    hot tokens is exactly what AQE skew-join splitting handles (and at
    small SF AQE turns the vocab side into a broadcast automatically).
    N and V are a 1-row aggregate broadcast back. In a production run
    the vocab frame would be truncated to top-V with an OOV bucket,
    making the join side bounded regardless of corpus size."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(T.tokens("text")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    stats = vocab.agg(
        F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("v_size")
    )
    # per-token nll fixed as 12-dp DECIMAL so the per-doc reduction is
    # an exact order-free sum (the t12/t15 recipe; a plain avg(double)
    # sums in engine order — the q05 latent class)
    nll = -F.log((F.col("c") + F.lit(1.0)) / (F.col("n_total") + F.col("v_size")))
    nll_dec = F.round(nll, 12).cast("decimal(25,12)")
    return (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum(nll_dec).cast("double") / F.count(F.lit(1)), 4).alias("xent_nats"),
        )
    )


# --------------------------------------------------------------------------
# t11 — TF-IDF top terms per document (keyword tagging for corpus
# curation: cluster labeling, topic mixing, search-index boosting).
# --------------------------------------------------------------------------
T11_TOPK = 3


@register(
    "t11_tfidf_top_terms",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, unnest({_duck_tokens()}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
scored AS (
    SELECT tf.doc_id, tf.term,
           tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) AS score
    FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, CAST(rnk AS INT) AS rank, round(score, 6) AS tfidf
FROM (
    SELECT doc_id, term, score,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, term) AS rnk
    FROM scored
)
WHERE rnk <= {T11_TOPK}
""",
    tags=("text", "tfidf", "keywords"),
)
def t11_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} characteristic terms per document by smoothed TF-IDF
    (sklearn's ``ln((N+1)/(df+1)) + 1`` idf) — the workhorse signal for
    cluster labeling and topic-mix manifests over a curation corpus.

    Plan shape for 100 TB: explode → (doc, term) count with map-side
    partial aggregation, df as a second agg on the same exploded frame,
    then a per-doc row_number window PARTITIONED on doc_id (parallel,
    never single-partition). The df join is keyed on term — Zipf-skewed,
    handled by AQE skew splitting; at small SF AQE broadcasts the df
    side. N is a 1-row broadcast."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(T.tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = toks.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term",
            (F.col("tf") * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0)
             ).alias("score"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= T11_TOPK)
        .select(
            "doc_id", "term", F.col("rnk").cast("int").alias("rank"),
            F.round("score", 6).alias("tfidf"),
        )
    )


# --------------------------------------------------------------------------
# t12 — DSIR-style importance weights for domain matching (Xie et al.,
# "Data Selection for Language Models via Importance Resampling",
# NeurIPS'23): score every raw document by how much more likely its
# tokens are under a target-domain unigram LM than under the raw-corpus
# LM. Positive = looks like the target domain.
# --------------------------------------------------------------------------
# Shared with p15's resampler oracle (which nests this whole SELECT as
# a CTE), so the two stay bit-identical by construction.
T12_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, lang, unnest({_duck_tokens()}) AS tok FROM documents
),
vocab AS (
    SELECT tok,
           count(*) AS c_raw,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_tgt
    FROM toks GROUP BY tok
),
stats AS (
    SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt, count(*) AS v_size
    FROM vocab
),
scored AS (
    -- per-token score fixed at the vocab level: rounded to 12 dp and
    -- held as DECIMAL so the per-doc sum below is EXACT (order-free)
    SELECT tok,
           CAST(round(ln((c_tgt + 1.0) / (n_tgt + v_size))
                      - ln((c_raw + 1.0) / (n_raw + v_size)), 12)
                AS DECIMAL(25,12)) AS tok_score
    FROM vocab CROSS JOIN stats
)
SELECT doc_id,
       any_value(lang)          AS lang,
       CAST(count(*) AS BIGINT) AS n_tokens,
       -- + 0.0 normalizes signed zero (−0.0 → +0.0): DuckDB's round
       -- preserves −0.0 where Spark's does not, which flipped the
       -- driver's value hash on doc 327 (≈ −1e-7 → −0.0) two rounds
       -- running. See functions.zround — this is its oracle twin.
       round(CAST(sum(tok_score) AS DOUBLE) / count(*), 4) + 0.0 AS imp_logratio
FROM toks JOIN scored USING (tok)
GROUP BY doc_id
"""


@register(
    "t12_dsir_importance",
    oracle=T12_ORACLE,
    tags=("text", "dsir", "importance", "curation"),
)
def t12_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance weight: avg over tokens of
    ln p_target(tok) − ln p_raw(tok), both add-one-smoothed unigram LMs
    over the SHARED vocabulary (target = lang='en' docs, raw = whole
    corpus). Resampling raw data ∝ exp(weight) shifts its token
    distribution toward the target domain — the hashed-n-gram variant
    of this exact score is how DSIR selected The Pile subsets.

    Plan shape for 100 TB: BOTH LMs come out of ONE hash-agg over the
    exploded corpus (c_raw and the conditional c_tgt are two aggregates
    of one groupBy — no separate scan of a target corpus), and that
    vocab table is localCheckpoint'ed so its two consumers (the 1-row
    totals and the score join) never re-derive the explode+agg chain:
    the corpus is scanned exactly twice, both times pruned to
    (doc_id, lang, text). The score join is keyed on token (Zipf skew →
    AQE skew split / small-SF broadcast, same as t10). In production
    the vocab is truncated to top-V + OOV bucket, bounding both the
    checkpoint and the join side regardless of corpus size.

    Hash determinism (round-4 driver red): a plain ``round(avg(double))``
    per doc is order-dependent — partition/config changes can flip the
    4th decimal of a boundary value. The per-token score is therefore
    fixed ONCE at the vocab level (rounded to 12 dp, held as
    DECIMAL(25,12)); the per-doc reduction is then an EXACT decimal sum
    (associative/commutative, order-free) followed by a single double
    division and the final 4 dp round — the same recipe that root-fixed
    q19's avg(double) flip at sf1 (BASELINE.md round-4 record).

    Signed zero (round-5 driver red, root cause): a pre-round value of
    ≈ −1e-7 rounds to −0.0 in DuckDB but +0.0 in Spark — bit-different
    under a canonical value hash, equal under every isclose gate. Both
    sides therefore normalize after the final round (``zround`` here,
    ``round(...) + 0.0`` in the oracle)."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(T.tokens("text")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("c_tgt"),
    ).localCheckpoint()
    stats = vocab.agg(
        F.sum("c_raw").alias("n_raw"),
        F.sum("c_tgt").alias("n_tgt"),
        F.count(F.lit(1)).alias("v_size"),
    )
    logratio = F.log(
        (F.col("c_tgt") + F.lit(1.0)) / (F.col("n_tgt") + F.col("v_size"))
    ) - F.log((F.col("c_raw") + F.lit(1.0)) / (F.col("n_raw") + F.col("v_size")))
    scored = vocab.crossJoin(F.broadcast(stats)).select(
        "tok", F.round(logratio, 12).cast("decimal(25,12)").alias("tok_score")
    )
    return (
        toks.join(scored, "tok")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_tokens"),
            zround(
                F.sum("tok_score").cast("double") / F.count(F.lit(1)), 4
            ).alias("imp_logratio"),
        )
    )


# --------------------------------------------------------------------------
# t13 — BPE merge induction (distributed tokenizer training): learn the
# top-K byte-pair merges from corpus word counts — the Sennrich et al.
# (ACL'16) subword algorithm every modern LLM tokenizer descends from.
# --------------------------------------------------------------------------
T13_MERGES = 3
_S = "\x01"  # symbol separator; cannot occur in whitespace-split tokens


def _t13_duck() -> str:
    c = "chr(1)"
    parts = [f"""
WITH toks AS (
    SELECT unnest({_duck_tokens()}) AS w FROM documents
),
w0 AS (
    SELECT {c} || regexp_replace(w, '(.)', '\\1' || {c}, 'g') AS state,
           count(*) AS n
    FROM toks GROUP BY w
)"""]
    for k in range(T13_MERGES):
        parts.append(f""",
p{k} AS (
    SELECT toks[i] AS lf, toks[i + 1] AS rt, sum(n) AS cnt
    FROM (SELECT list_filter(string_split(state, {c}), x -> x <> '') AS toks, n
          FROM w{k}),
         unnest(range(1, len(toks))) AS u(i)
    GROUP BY 1, 2
),
b{k} AS (SELECT lf, rt, cnt FROM p{k} ORDER BY cnt DESC, lf, rt LIMIT 1),
w{k + 1} AS (
    SELECT replace(state, {c}||lf||{c}||rt||{c}, {c}||lf||rt||{c}) AS state, n
    FROM w{k} CROSS JOIN b{k}
)""")
    finals = "\nUNION ALL ".join(
        f"SELECT {k + 1} AS round, lf, rt, lf || rt AS merged, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM b{k}"
        for k in range(T13_MERGES)
    )
    return "".join(parts) + "\n" + finals


@register(
    "t13_bpe_merge_learn",
    oracle=_t13_duck(),
    tags=("text", "bpe", "tokenizer", "iterative"),
)
def t13_bpe_merge_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first T13_MERGES BPE merges from the corpus: per round,
    count adjacent symbol pairs across word TYPES weighted by word
    frequency, take the argmax (ties: count desc, then pair asc), and
    merge that pair everywhere — returning the learned merge table
    (round, pair, merged symbol, pair count), i.e. the artifact a
    tokenizer trainer ships.

    The classic BPE-training trick makes this corpus-scale-free after
    one pass: pair statistics come from the VOCAB frame (word type →
    count), which is aggregated once from the corpus, checkpointed, and
    is bounded (top-V in production) — each merge round is then a
    vocab-sized explode→sum plus a scan-side string replace, never a
    corpus re-scan. Words are encoded as \\x01-separated symbol strings
    so the merge is a plain left-to-right non-overlapping replace() —
    IDENTICAL semantics in Spark and DuckDB, which is what lets an
    iterative learned-vocabulary algorithm hash-check: the oracle
    unrolls the same rounds as chained CTEs (the s13/d15 trick). The
    per-round argmax is a 1-row TakeOrdered collect — the learned merge
    itself, not data."""
    docs = t(spark, sf_dir, "documents")
    state_df = (
        docs.select(F.explode(T.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.concat(F.lit(_S), F.regexp_replace("w", "(.)", "$1" + _S)).alias(
                "state"
            ),
            "n",
        )
        .localCheckpoint()
    )
    learned = []
    for k in range(T13_MERGES):
        toks = F.filter(F.split("state", _S), lambda x: x != "")
        n1 = F.size(toks) - 1
        pairs = F.zip_with(
            F.slice(toks, 1, n1),
            F.slice(toks, 2, n1),
            lambda x, y: F.struct(x.alias("lf"), y.alias("rt")),
        )
        top = (
            state_df.select(F.explode(pairs).alias("p"), "n")
            .select(F.col("p.lf").alias("lf"), F.col("p.rt").alias("rt"), "n")
            .groupBy("lf", "rt")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("lf"), F.asc("rt"))
            .limit(1)
            .collect()[0]
        )
        lf, rt, cnt = top["lf"], top["rt"], int(top["cnt"])
        learned.append((k + 1, lf, rt, lf + rt, cnt))
        state_df = state_df.select(
            F.replace(
                "state", F.lit(_S + lf + _S + rt + _S), F.lit(_S + lf + rt + _S)
            ).alias("state"),
            "n",
        ).localCheckpoint()
    return spark.createDataFrame(
        learned, "round int, lf string, rt string, merged string, pair_count long"
    )


# --------------------------------------------------------------------------
# t14 — Zipf rank-frequency audit: corpus-level token frequency law fit.
# A standard corpus-health diagnostic (natural text follows freq ∝
# rank^-s with s ≈ 1; template/boilerplate-heavy corpora bend the tail).
# --------------------------------------------------------------------------
T14_TOP = 1000


@register(
    "t14_zipf_rank_freq",
    oracle=f"""
WITH tf AS (
  SELECT t AS token, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest({_duck_tokens('lower(text)')}) AS t FROM documents)
  GROUP BY t
),
top AS (
  SELECT token, freq,
         row_number() OVER (ORDER BY freq DESC, token) AS rank
  FROM tf ORDER BY freq DESC, token LIMIT {T14_TOP}
)
SELECT CAST(count(*) AS BIGINT)                       AS n_terms,
       CAST(sum(freq) AS BIGINT)                      AS mass_topk,
       round(regr_slope(ln(freq), ln(rank)), 4)       AS zipf_slope,
       round(regr_intercept(ln(freq), ln(rank)), 4)   AS zipf_intercept
FROM top
""",
    tags=("text", "zipf", "regression", "topk"),
)
def t14_zipf_rank_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit the Zipf log-log slope over the corpus's top-1000 token
    frequencies: explode lowercased tokens → ONE hash-agg with map-side
    partials → exact top-1000 via TakeOrderedAndProject (total order:
    freq DESC, token) → rank + least-squares fit on the tiny remainder.

    100-TB plan shape: the only corpus-sized stage is the token
    frequency agg (the partial combine collapses each task's explode
    output to its local vocabulary before the shuffle — shuffle rows are
    O(vocab), not O(tokens)). Everything after the top-k is 1000 rows,
    so the single-partition rank window is a deliberate no-op, not a
    bottleneck. regr_slope/regr_intercept are built-in in BOTH engines
    (Spark 3.4+/DuckDB), keeping the fit inside whole-stage codegen."""
    docs = t(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(T.tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = tf.orderBy(F.desc("freq"), "token").limit(T14_TOP)
    w = Window.orderBy(F.desc("freq"), "token")
    ranked = top.withColumn("rank", F.row_number().over(w))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("freq").alias("mass_topk"),
        F.round(F.regr_slope(F.ln("freq"), F.ln("rank")), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(F.ln("freq"), F.ln("rank")), 4).alias(
            "zipf_intercept"
        ),
    )


# --------------------------------------------------------------------------
# t15 — corpus-trained BIGRAM LM cross-entropy (t10's conditional-
# probability upgrade: the fluency signal, not just token rarity).
# --------------------------------------------------------------------------
@register(
    "t15_bigram_xent",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, {_duck_tokens()} AS tk FROM documents
),
bg AS (
    -- parallel unnest zips positionally: (tk[i], tk[i+1])
    SELECT doc_id,
           unnest(tk[1:len(tk)-1]) AS prev,
           unnest(tk[2:len(tk)])   AS cur
    FROM toks WHERE len(tk) >= 2
),
bgc AS (SELECT prev, cur, count(*) AS c_bg FROM bg GROUP BY prev, cur),
ctx AS (SELECT prev, sum(c_bg) AS c_prev FROM bgc GROUP BY prev),
vocab AS (
    SELECT count(DISTINCT tok) AS v_size
    FROM (SELECT unnest(tk) AS tok FROM toks)
),
scored AS (
    -- per-bigram score fixed once: rounded to 12 dp, held as DECIMAL
    -- so the per-doc sum is EXACT (order-free) — t12's recipe
    SELECT prev, cur,
           CAST(round(-ln((c_bg + 1.0) / (c_prev + v_size)), 12)
                AS DECIMAL(25,12)) AS nll
    FROM bgc JOIN ctx USING (prev) CROSS JOIN vocab
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(CAST(sum(nll) AS DOUBLE) / count(*), 4) + 0.0 AS xent_nats
FROM bg JOIN scored USING (prev, cur)
GROUP BY doc_id
""",
    tags=("text", "quality", "lm", "bigram", "perplexity"),
)
def t15_bigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under an add-one-smoothed BIGRAM LM
    trained on the corpus itself: xent = avg over positions 2..n of
    -ln((c(prev,cur)+1) / (c(prev)+V)). Where t10's unigram score only
    sees token RARITY, the bigram score sees broken word ORDER — the
    shuffled/boilerplate/template-spam signal CCNet-style quality
    filters threshold on. Docs with fewer than two tokens have no
    bigrams and drop out on both engines.

    Plan shape for 100 TB: bigrams are built scan-side (zip_with over
    two slices — no positional explode+self-join), then ONE hash-agg
    gives the bigram counts; the context counts are a second agg over
    that (already tiny) count table, never over the corpus; V is a
    1-row broadcast. The score join is keyed on (prev, cur) — Zipf
    skew on hot bigrams is AQE skew-split territory, same as t10/t12.
    The scored table is localCheckpoint'ed so its consumers never
    re-derive the explode+agg chain. In production the bigram table is
    truncated to top-K with an OOV backoff, bounding the join side
    regardless of corpus size.

    Hash determinism: per-bigram nll fixed once at the count level
    (12 dp DECIMAL), per-doc reduction is an exact decimal sum, one
    double division, one final round, signed zero normalized (zround) —
    t12's recipe end to end."""
    docs = t(spark, sf_dir, "documents")
    tk = docs.select("doc_id", T.tokens("text").alias("tk")).where(F.size("tk") >= 2)
    bigrams = F.zip_with(
        F.slice("tk", 1, F.size("tk") - 1),
        F.slice("tk", 2, F.size("tk") - 1),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    bg = tk.select("doc_id", F.explode(bigrams).alias("b")).select(
        "doc_id", F.col("b.prev").alias("prev"), F.col("b.cur").alias("cur")
    )
    bgc = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c_bg")).localCheckpoint()
    ctx = bgc.groupBy("prev").agg(F.sum("c_bg").alias("c_prev"))
    vocab = (
        docs.select(F.explode(T.tokens("text")).alias("tok"))
        .agg(F.count_distinct("tok").alias("v_size"))
    )
    nll = -F.log((F.col("c_bg") + F.lit(1.0)) / (F.col("c_prev") + F.col("v_size")))
    scored = (
        bgc.join(ctx, "prev")
        .crossJoin(F.broadcast(vocab))
        .select("prev", "cur", F.round(nll, 12).cast("decimal(25,12)").alias("nll"))
    )
    return (
        bg.join(scored, ["prev", "cur"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            zround(F.sum("nll").cast("double") / F.count(F.lit(1)), 4).alias("xent_nats"),
        )
    )
