"""CSV ingestion with quarantine — the remaining interchange format
after parquet / JSONL / LibSVM / plain text (sources/__init__), same
design contract as the JSONL reader (sources/jsonl.py):

- **Explicit schema, never inference** (no extra type-guessing pass).
- **Line-splittable**: raw text scan + ``from_csv`` keeps a 1 GB file
  ~8 input splits; gzipped CSVs don't split — repack before ingest.
- **PERMISSIVE + quarantine, never fail/drop**: malformed lines land in
  a corrupt-record column and are split into a quarantine frame
  verbatim for audit/replay; DROPMALFORMED silently shrinks a corpus,
  FAILFAST kills the 10-hour job at byte 97 TB.

Scope notes (documented, not hidden): the text-scan form handles plain
one-record-per-line CSV (quoted fields yes, embedded newlines no —
multiline CSV isn't line-splittable in the first place and belongs in
parquet long before 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from sketchmlflink_spark.sources.jsonl import CORRUPT_COL, DOCUMENT_SCHEMA


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENT_SCHEMA,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read a headerless CSV path (file, dir, or glob) →
    ``(clean, quarantine)``. ``clean`` carries exactly ``schema``;
    ``quarantine`` is one string column ``raw`` with each malformed
    line verbatim. Same raw-scan + from_csv shape as read_jsonl — and
    for the same reason: the built-in csv reader forbids plans that
    touch only the corrupt column, which is exactly the quarantine
    side."""
    read_schema = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    parsed = spark.read.text(path).select(
        "value",
        F.from_csv(
            "value",
            ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in read_schema.fields
            ),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL, "sep": sep},
        ).alias("c"),
    )
    clean = parsed.where(F.col(f"c.{CORRUPT_COL}").isNull()).select(
        *[F.col(f"c.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.where(F.col(f"c.{CORRUPT_COL}").isNotNull()).select(
        F.col("value").alias("raw")
    )
    return clean, quarantine
