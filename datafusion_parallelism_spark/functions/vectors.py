"""Vector column functions over ``array<float>`` embeddings.

JVM-side (zip_with / aggregate higher-order functions — no UDF, no Python
round-trip): at 100 TB the dot products run inside whole-stage codegen next
to the scan.  Elements are cast to double BEFORE accumulation and summed in
index order, which makes the result bit-identical to the oracle's
equivalent (DuckDB ``list_dot_product`` over double lists).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, accumulated in index order in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
