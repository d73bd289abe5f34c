"""LibSVM reader edge cases (FIXTURES.md §1 / Test.scala:126-176)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from sketchmlflink_spark.sources.libsvm import read_libsvm, to_dense_features

FIXTURE = """\
# full-line comment
1.5 1:0.5 3:2.0
2.0 2:1.0   # trailing comment

-0.5 1:1.0 5:9.0
3.0 6:4.0
"""


@pytest.fixture(scope="module")
def libsvm_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("libsvm") / "points.txt"
    p.write_text(FIXTURE)
    return str(p)


def test_parse_semantics(spark, libsvm_path):
    data = read_libsvm(spark, libsvm_path)
    rows = {r["label"]: (r["indices"], r["values"]) for r in data.df.collect()}
    # comment/blank lines skipped; 4 data rows survive
    assert len(rows) == 4
    # 1-based on disk → 0-based
    assert rows[1.5] == ([0, 2], [0.5, 2.0])
    assert rows[2.0] == ([1], [1.0])  # trailing comment stripped
    assert rows[-0.5] == ([0, 4], [1.0, 9.0])
    # dimension inference: max idx 6 (1-based) → dim 6
    assert data.dim == 6


def test_max_dim_truncation_drops_empty_rows(spark, libsvm_path):
    data = read_libsvm(spark, libsvm_path, max_dim=3)
    rows = {r["label"]: r["indices"] for r in data.df.collect()}
    # the 3.0 row (only feature idx 5) is dropped entirely (Test:151-152)
    assert set(rows) == {1.5, 2.0, -0.5}
    assert rows[-0.5] == [0]  # idx 4 truncated away
    assert data.dim == 3


def test_malformed_pair_raises(spark, tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("1.0 1:2.0:3.0\n")
    data = read_libsvm.__wrapped__ if hasattr(read_libsvm, "__wrapped__") else None
    from sketchmlflink_spark.sources.libsvm import parse_libsvm_lines

    parsed = parse_libsvm_lines(spark.read.text(str(p)))
    with pytest.raises(Exception, match="(?i)malformed|USER_RAISED"):
        parsed.collect()


def test_malformed_tolerated_when_not_strict(spark, tmp_path):
    p = tmp_path / "bad2.txt"
    p.write_text("1.0 1:2.0\n2.0 3:4.0\n")
    data = read_libsvm(spark, str(p), strict=False)
    assert data.df.count() == 2


def test_densify(spark, libsvm_path):
    data = read_libsvm(spark, libsvm_path)
    dense = {r["label"]: r["features"] for r in to_dense_features(data).collect()}
    np.testing.assert_allclose(dense[1.5], [0.5, 0, 2.0, 0, 0, 0])
    np.testing.assert_allclose(dense[3.0], [0, 0, 0, 0, 0, 4.0])
