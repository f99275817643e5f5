"""Vector (embedding) column expressions over ``array<float>`` columns.

Dot products / norms / cosine as JVM-side higher-order functions
(zip_with + aggregate): Arrow-free, codegen-friendly, and linear in the
embedding width. Elements are cast to double BEFORE arithmetic and the
fold is sequential left-to-right, so results are bit-reproducible across
partitionings and match a sequential oracle computation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either side has zero norm."""
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))
