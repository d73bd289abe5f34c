"""JSONL ingestion: schema enforcement, corrupt-line quarantine, and
round-trip through the writer (the LLM-corpus interchange path)."""

from __future__ import annotations

import os

import pytest

from sketchmlflink_spark.sources.jsonl import DOCUMENT_SCHEMA, read_jsonl, write_jsonl
from sketchmlflink_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


@pytest.fixture()
def jsonl_file(tmp_path):
    lines = [
        '{"doc_id": 1, "text": "the quick brown fox", "lang": "en", "source": "web", "n_chars": 19}',
        '{"doc_id": 2, "text": "le chat noir", "lang": "fr", "source": "web", "n_chars": 12}',
        # missing fields parse clean with nulls (schema-on-read)
        '{"doc_id": 3, "text": "no lang field"}',
        # torn/malformed lines must quarantine, not fail or vanish
        '{"doc_id": 4, "text": "truncated',
        "not json at all",
        '{"doc_id": "not-a-number", "text": "type clash"}',
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_jsonl_splits_clean_and_quarantine(spark, jsonl_file):
    clean, quarantine = read_jsonl(spark, jsonl_file)
    assert [f.name for f in clean.schema.fields] == [f.name for f in DOCUMENT_SCHEMA.fields]
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[3]["lang"] is None  # missing != malformed
    bad = [r["raw"] for r in quarantine.collect()]
    assert len(bad) == 3
    assert "not json at all" in bad  # verbatim, replayable
    assert any("not-a-number" in b for b in bad)  # type clash quarantines too


def test_jsonl_roundtrip_documents_table(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    out = os.path.join(str(tmp_path), "docs_jsonl")
    write_jsonl(docs, out)
    clean, quarantine = read_jsonl(spark, out)
    assert quarantine.count() == 0
    n = docs.count()
    assert clean.count() == n
    # value-level round trip, not just counts
    orig = {r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"]) for r in docs.collect()}
    back = {r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"]) for r in clean.collect()}
    assert orig == back


def test_read_jsonl_uses_explicit_schema_no_inference_scan(spark, jsonl_file):
    """The reader must carry the passed schema into the scan (no
    sampling/inference pass): the parsed schema equals the contract
    schema exactly, including types."""
    clean, _ = read_jsonl(spark, jsonl_file)
    assert clean.schema == DOCUMENT_SCHEMA
