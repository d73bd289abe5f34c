"""JSONL (newline-delimited JSON) document ingestion — the interchange
format LLM-corpus pipelines actually ship (one JSON object per line;
WebText/C4/RedPajama-style dumps).

Design for 100 TB:

- **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a full extra pass over every byte just to guess types;
  with the schema passed the scan is single-pass and the reader prunes
  unreferenced fields during parse (Jackson skips their tokens).
- **Line-splittable.** Plain JSONL splits on newlines, so a 1 GB file
  becomes ~8 input splits at the default 128 MB ``maxPartitionBytes``
  with zero coordination; gzipped dumps do NOT split (one task per
  file) — repack to zstd-framed or uncompressed before ingest at scale.
- **PERMISSIVE + quarantine, never fail/drop.** A multi-TB crawl dump
  always has torn lines. Malformed rows land in a corrupt-record column
  and are split into a quarantine DataFrame for audit; the clean side
  keeps its schema. DROPMALFORMED would silently shrink the corpus,
  FAILFAST would kill a 10-hour job at byte 97 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"

# the `documents` table contract (TESTDATA.md): doc_id, text, lang,
# source, n_chars
DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENT_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL path (file, dir, or glob) → ``(clean, quarantine)``.

    ``clean`` carries exactly ``schema``; ``quarantine`` is one string
    column ``raw`` holding each malformed line verbatim for audit/replay.
    A line that parses but lacks a field yields nulls in ``clean`` (JSON
    is schema-on-read; missing ≠ malformed).
    """
    # text scan + from_json rather than spark.read.json: the raw-scan
    # form forbids plans that reference only the corrupt column
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — exactly what the quarantine
    # side is — and the docs' workaround (cache the whole parse) is a
    # non-starter at corpus scale. The text scan stays line-splittable
    # and from_json parses each line once with the same PERMISSIVE +
    # corrupt-record semantics.
    read_schema = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)])
    parsed = spark.read.text(path).select(
        "value",
        F.from_json(
            "value",
            read_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("j"),
    )
    clean = parsed.where(F.col(f"j.{CORRUPT_COL}").isNull()).select(
        *[F.col(f"j.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.where(F.col(f"j.{CORRUPT_COL}").isNotNull()).select(
        F.col("value").alias("raw")
    )
    return clean, quarantine


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write a DataFrame as JSONL. ``compression=None`` keeps the output
    line-splittable for re-ingest (see module docstring); pass 'gzip'
    only for archival exports that won't be scanned again."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
