"""CSV source contract (sources/csvfile.py): schema-on-read with
PERMISSIVE quarantine — the batch CSV twin of the JSONL reader's
contract (test_jsonl.py)."""

from __future__ import annotations

import os

from sketchmlflink_spark.sources.csvfile import read_csv_quarantine


def _write(tmp_path, name, lines):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return p


def test_clean_rows_roundtrip(spark, tmp_path):
    p = _write(
        tmp_path,
        "ok.csv",
        ["1,hello world,en,web,11", "2,bonjour le monde,fr,books,16"],
    )
    clean, quar = read_csv_quarantine(spark, p)
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["text"] == "hello world" and rows[1]["n_chars"] == 11
    assert rows[2]["lang"] == "fr" and rows[2]["source"] == "books"
    assert quar.count() == 0


def test_malformation_classes_quarantined_verbatim(spark, tmp_path):
    bad = ["xx,bad id,en,web,6", "3,too,few", "4,extra,en,web,5,surplus"]
    p = _write(tmp_path, "mixed.csv", ["1,fine,en,web,4"] + bad)
    clean, quar = read_csv_quarantine(spark, p)
    assert [r["doc_id"] for r in clean.collect()] == [1]
    assert sorted(r["raw"] for r in quar.collect()) == sorted(bad)


def test_quoted_fields_with_embedded_separator(spark, tmp_path):
    p = _write(tmp_path, "quoted.csv", ['7,"a, quoted, text",en,web,15'])
    clean, quar = read_csv_quarantine(spark, p)
    assert quar.count() == 0
    row = clean.collect()[0]
    assert row["text"] == "a, quoted, text" and row["doc_id"] == 7


def test_empty_and_null_fields_are_clean_nulls(spark, tmp_path):
    # missing VALUES inside a well-formed row are nulls, not corruption
    p = _write(tmp_path, "nulls.csv", ["8,,en,web,0"])
    clean, quar = read_csv_quarantine(spark, p)
    assert quar.count() == 0
    assert clean.collect()[0]["text"] is None


def test_directory_scan_merges_files(spark, tmp_path):
    _write(tmp_path, "a.csv", ["1,x,en,web,1"])
    _write(tmp_path, "b.csv", ["2,y,fr,web,1", "zz,bad,fr,web,1"])
    clean, quar = read_csv_quarantine(spark, str(tmp_path))
    assert clean.count() == 2 and quar.count() == 1
