"""Registry-ordering locks: the driver's per-round correctness check
covers a PREFIX of queries() (round 2 checked exactly the first 50), so
the composition of that window is load-bearing — a silent priority-name
drift would drop §2-core ML entries out of the external check again."""

from __future__ import annotations

import re


def test_priority_names_all_registered():
    from sketchmlflink_spark.registry import _PRIORITY, all_queries

    names = set(all_queries())
    missing = [p for p in _PRIORITY if p not in names]
    assert not missing, (
        f"_PRIORITY entries not in the registry (renamed/removed?): {missing} "
        f"— the driver check window silently shrinks until this is fixed"
    )


def test_first_50_covers_ml_core_and_every_family():
    from sketchmlflink_spark.registry import all_queries

    window = list(all_queries())[:50]
    for m in [f"m0{i}" for i in range(1, 8)]:
        assert any(n.startswith(m) for n in window), f"{m} missing from window"
    for fam in ("q", "d", "s", "sk", "p", "st", "t", "mm"):
        pat = rf"^{fam}\d"
        assert any(re.match(pat, n) for n in window), f"family {fam} missing"


def test_no_duplicate_registrations():
    from sketchmlflink_spark.registry import _PRIORITY, all_queries

    qs = all_queries()
    assert len(qs) == len(set(qs))
    assert len(_PRIORITY) == len(set(_PRIORITY))
