"""Vector math over ArrayType(FloatType) embedding columns.

Pure built-in higher-order functions (zip_with / aggregate) — JVM-side,
no Python in the hot path.  Math is done in double precision so results
match the DuckDB oracle's double-precision list functions.
"""

from __future__ import annotations

import math

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


def lit_double_array(vals) -> Column:
    """A literal array<double> Column built in ONE parser call.

    ``F.lit(list)`` marshals the list element-by-element over the py4j
    gateway — measured ~0.6 ms/element, so a 1024-double PQ codebook
    literal costs ~0.65 s of DRIVER time per call site (the whole
    BENCH r12->r13 pq_adc_topk "+16%": the shipped form built the
    codebook literal twice per query where r12 built it once —
    scratch/pq_adc_ab.py isolated it to plan-construction, not
    execution).  Formatting ``repr(float)`` and parsing one
    ``array(<v>D, ...)`` expression is ~0.003 s at 1024 elements and
    BIT-EXACT: repr emits the shortest decimal that round-trips the
    IEEE-754 double, and the SQL parser's correctly-rounded
    Double.parseDouble returns the identical bits (equality collected
    in the A/B).  Non-finite values (inf/nan) have no SQL double
    literal — fall back to F.lit for those rare frames.
    """
    vals = [float(x) for x in vals]
    if not vals:
        # `array()` parses as array<string> — cast so an empty frame
        # still yields the typed column every caller expects (ADVICE
        # r16).
        return F.expr("cast(array() as array<double>)")
    if not all(math.isfinite(x) for x in vals):
        return F.lit(vals)
    return F.expr("array(" + ",".join(repr(x) + "D" for x in vals) + ")")


def lit_long_array(vals) -> Column:
    """The integer analog of :func:`lit_double_array`: a literal
    array<bigint> built in ONE parser call instead of F.lit(list)'s
    per-element py4j marshalling (~0.6 ms/element of driver time —
    SCALE.md "r14 literal tax").  Integers are exact in both paths,
    so this is a pure driver-time fix with no value-fidelity caveat.
    """
    vals = [int(x) for x in vals]
    if not vals:
        return F.expr("cast(array() as array<bigint>)")
    return F.expr("array(" + ",".join(str(x) + "L" for x in vals) + ")")
