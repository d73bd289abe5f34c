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
