"""Structured Streaming surface (SURVEY.md §7.1 M5).

The reference is batch-only (SURVEY.md §1.4) — this package is the
north-star "stream-processor" extension: watermarked windowed
aggregation, streaming dedup, session windows, a custom stateful
operator (applyInPandasWithState), and foreachBatch incremental model
training reusing the ml/sgd epoch step.
"""
