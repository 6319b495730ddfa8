"""Vector math over ``array<float>`` embedding columns.

All helpers are higher-order Catalyst expressions (``zip_with`` /
``aggregate`` / ``transform``) — they run JVM-side inside codegen, so
similarity search needs no Python in the hot path.  Floats are cast to
double before arithmetic (SURVEY.md §8.1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (left-to-right summation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        to_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
