"""sketchmlflink_spark — a PySpark-native analytics engine with the
capabilities of Kashif-Rabbani/SketchMLFlink.

The reference (read-only at /root/reference) is a Flink DataSet program:
SketchML-compressed distributed gradient descent for multiple linear
regression (see SURVEY.md). This package re-expresses that surface —
LibSVM ingest, exact + sketch-compressed SGD, prediction/evaluation,
A/B metrics — in idiomatic PySpark (DataFrame/SQL + Arrow-batched
pandas UDFs + a driver-side training loop), and adds the relational and
LLM-data-pipeline operator surface the driver harness checks
(dedup, similarity search, text analysis, streaming sketches).

Design rules (enforced throughout):
  * DataFrame-first: Catalyst plans everything relational; custom code is
    confined to the sketch codec + the SGD loop (SURVEY.md §7.3).
  * Config is explicit and immutable — the reference's global-mutable
    ``SketchConfig`` (SketchConfig.scala:12-18) is deliberately NOT
    replicated (SURVEY.md §7.4).
  * Every operator exposed to the driver harness lives in the query
    registry (`sketchmlflink_spark.registry`) with a DuckDB oracle where
    SQL-expressible.
"""

__version__ = "0.1.0"
