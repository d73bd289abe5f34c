"""Property-based codec tests (hypothesis): the invariants that must
hold for EVERY gradient, not just the fixture vectors — this is how the
codec earns trust as a distributed aggregation payload, where a single
violated invariant corrupts the whole treeReduce (SURVEY.md §2.6
observable contract; SketchGradientDescent.scala:220-282 call sites).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

import sketchmlflink_spark.ml.sketch as SK
from sketchmlflink_spark.config import SketchConfig

CFG = SketchConfig()
IDENTITY = SketchConfig(compression_type="None")

# gradients: modest dims (codec behavior doesn't depend on dim beyond
# key coding, which gets its own test), mixed scales, many exact zeros
grad = hnp.arrays(
    np.float64,
    st.integers(1, 400),
    elements=st.floats(-1e6, 1e6, allow_nan=False, width=64),
).map(lambda a: np.where(np.abs(a) < 0.5, 0.0, a))

SETTLE = settings(max_examples=60, deadline=None)


def _group_error_bound(g: np.ndarray, cfg: SketchConfig) -> float:
    """A decompressed value is the midpoint of some bucket in its
    GROUP, so the worst error is the widest group's value range."""
    nz = g[np.abs(g) > SK.EPS]
    edges = np.quantile(nz, np.linspace(0.0, 1.0, cfg.group_num + 1))
    return float(np.diff(edges).max() + 1e-9 * max(1.0, np.abs(nz).max()))


@given(grad)
@SETTLE
def test_roundtrip_keys_exact_and_error_bounded(g):
    sg = SK.compress(g, CFG)
    nz = np.nonzero(np.abs(g) > SK.EPS)[0]
    if nz.size == 0:
        assert sg is None  # ZeroGradient elision
        return
    ghat = SK.decompress(sg, g.shape[0])
    # keys are delta-coded, never sketched: the support is exact
    assert set(np.nonzero(ghat)[0]) <= set(nz)
    assert set(nz) <= set(np.nonzero(np.abs(ghat) > 0)[0]) | {i for i in nz if abs(g[i]) <= SK.EPS}
    assert np.max(np.abs(ghat - g)) <= _group_error_bound(g, CFG)


@given(grad)
@SETTLE
def test_identity_codec_is_lossless(g):
    sg = SK.compress(g, IDENTITY)
    ghat = SK.decompress(sg, g.shape[0])
    np.testing.assert_array_equal(ghat, np.where(np.abs(g) > SK.EPS, g, 0.0))


@given(grad, grad)
@SETTLE
def test_merge_commutes(a, b):
    dim = max(a.shape[0], b.shape[0])
    a = np.pad(a, (0, dim - a.shape[0]))
    b = np.pad(b, (0, dim - b.shape[0]))
    sa, sb = SK.compress(a, CFG), SK.compress(b, CFG)
    ab = SK.decompress(SK.merge(sa, sb, CFG, dim), dim)
    ba = SK.decompress(SK.merge(sb, sa, CFG, dim), dim)
    # quantile splits of the SAME decompress-sum are order-independent
    np.testing.assert_allclose(ab, ba, rtol=1e-12, atol=1e-12)


@given(grad)
@SETTLE
def test_merge_with_zero_is_identity(g):
    sg = SK.compress(g, CFG)
    assert SK.merge(sg, None, CFG, g.shape[0]) is sg
    assert SK.merge(None, sg, CFG, g.shape[0]) is sg


@given(grad)
@SETTLE
def test_wire_roundtrip_preserves_decompression(g):
    sg = SK.compress(g, CFG)
    back = SK.from_bytes(SK.to_bytes(sg))
    if sg is None:
        assert back is None
        return
    np.testing.assert_array_equal(
        SK.decompress(back, g.shape[0]), SK.decompress(sg, g.shape[0])
    )


@given(
    st.sets(st.integers(0, 2_000_000), min_size=1, max_size=300).map(
        lambda s: np.array(sorted(s), dtype=np.int64)
    )
)
@SETTLE
def test_key_coding_roundtrip_any_gaps(keys):
    """Delta coding with the 4-byte escape must survive arbitrary gaps
    (feature indices at 100 TB are sparse and highly irregular)."""
    np.testing.assert_array_equal(SK.decode_keys(SK.encode_keys(keys)), keys)
