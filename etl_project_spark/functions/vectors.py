"""Vector functions over array<float|double> embedding columns.

All built-in higher-order functions (JVM-evaluated, codegen'd) — chosen
over Pandas UDFs for the hot path because they avoid the Arrow hop; the
batched-numpy variants for LSH/IVF live in operators/similarity.py where
Python is genuinely needed.

Accumulation is sequential left-to-right (F.aggregate), matching DuckDB's
list_dot_product fold order so differential tests agree bit-for-bit in
the common case.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i via zip_with + aggregate (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; 0 for zero-norm inputs."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_dist(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
