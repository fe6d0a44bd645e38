"""Vector math over ArrayType(FloatType) embedding columns.

Pure built-in higher-order functions (zip_with / aggregate) — JVM-side,
no Python in the hot path.  Math is done in double precision so results
match the DuckDB oracle's double-precision list functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dsum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot_expr(a: Column, b: Column) -> Column:
    return _dsum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def l2_norm_expr(a: Column) -> Column:
    return F.sqrt(_dsum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine_similarity_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (l2_norm_expr(a) * l2_norm_expr(b))
