"""Vector math over ``array<float>`` columns with built-in higher-order
functions — JVM-side, codegen'd, no UDFs.

Determinism note: every fold is an explicit left-to-right ``aggregate`` in
double precision, so results are bit-identical across engines that fold the
same way (DuckDB ``list_reduce`` mirrors it) and across Spark runs — there is
no cross-row float accumulation anywhere in these expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: str, b: str) -> Column:
    """Dot product of two array<float> columns, folded left-to-right in
    double."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0 as double), (acc, x) -> acc + x)"
    )


def norm(a: str) -> Column:
    """L2 norm of an array<float> column."""
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), "
            f"cast(0 as double), (acc, x) -> acc + x)"
        )
    )


def cosine(a: str, b: str) -> Column:
    """Cosine similarity of two array<float> columns."""
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: str, b: str) -> Column:
    """Euclidean distance of two array<float> columns."""
    return F.sqrt(
        F.expr(
            f"aggregate(zip_with({a}, {b}, (x, y) -> "
            f"(cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), "
            f"cast(0 as double), (acc, x) -> acc + x)"
        )
    )
