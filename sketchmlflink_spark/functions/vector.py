"""Vector math as Catalyst column expressions.

The reference does its vector math in Breeze/BLAS on the JVM
(SketchMultipleLinearRegression.scala:166-171 predict = x.w + b;
FlinkGradientDescent.scala:230 axpy). For the relational/SQL-facing
surface we keep dot products inside whole-stage codegen with
``aggregate``/``zip_with`` higher-order functions — no Python UDF in the
hot path. The SGD hot loop itself uses numpy inside Arrow-batched
mapPartitions (see ml/sgd.py), which is the faster path for wide
vectors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    """Cast array<float>/array<int> to array<double> (exact widening, so
    Spark and DuckDB see bit-identical element values)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product — deterministic and engine-portable."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm2(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))
