"""Column profiling — the data-quality audit pass a corpus pipeline runs
before/after every transformation: per-column null rates, distinct counts,
numeric ranges and exact quantiles, string length stats.

Shape: ONE aggregation job for the whole profile (every column's stats are
aggregate expressions in the same ``agg``, map-side partials throughout) —
not a per-column loop of jobs. Exact distinct counts and exact percentiles
shuffle once; at 100 TB swap ``approx_count_distinct`` /
``percentile_approx`` in via ``approx=True`` for one sketch-sized
aggregation with no exactness shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def profile_columns(df: DataFrame, columns: list[str] | None = None,
                    approx: bool = False) -> DataFrame:
    """One row per profiled column: ``column, n_rows, n_null, n_distinct,
    min_str, max_str, mean, p50`` (numeric-only metrics null for
    non-numeric columns; min/max rendered as strings so one schema fits
    every column type).

    ``approx=True`` switches distinct counts to HLL sketches and the
    median to ``percentile_approx`` — the 100 TB profile is then a single
    pass with bounded aggregation state."""
    cols = columns or [f.name for f in df.schema.fields]
    total = F.count(F.lit(1))
    aggs: list = [total.alias("__n_rows")]
    for c in cols:
        field = df.schema[c]
        col = F.col(c)
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0))
                    .alias(f"__null__{c}"))
        if approx:
            aggs.append(F.approx_count_distinct(col)
                        .alias(f"__distinct__{c}"))
        else:
            aggs.append(F.count_distinct(col).alias(f"__distinct__{c}"))
        aggs.append(F.min(col).cast("string").alias(f"__min__{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__max__{c}"))
        if isinstance(field.dataType, T.NumericType):
            aggs.append(F.avg(col.cast("double")).alias(f"__mean__{c}"))
            if approx:
                aggs.append(F.percentile_approx(col.cast("double"), 0.5)
                            .cast("double").alias(f"__p50__{c}"))
            else:
                aggs.append(F.expr(f"percentile(CAST(`{c}` AS DOUBLE), 0.5)")
                            .alias(f"__p50__{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__mean__{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__p50__{c}"))
    wide = df.agg(*aggs)
    # unpivot the single wide row into one row per column — |cols| rows,
    # driver-free (stack expression)
    def q(name: str) -> str:
        # backtick-quote generated identifiers so non-bare column names
        # ("my col", "n-chars") survive the SQL round-trip
        return "`" + name.replace("`", "``") + "`"

    def lab(name: str) -> str:
        # the column LABEL rides in a SQL string literal — escape the
        # literal metacharacters (backslash, quote) so a name like
        # "it's" can't break out of (or inject into) the stack() expr
        return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stacked = wide.select(
        F.col("__n_rows").alias("n_rows"),
        F.expr(
            "stack({n}, {args}) AS (column, n_null, n_distinct, "
            "min_str, max_str, mean, p50)".format(
                n=len(cols),
                args=", ".join(
                    f"{lab(c)}, {q('__null__' + c)}, {q('__distinct__' + c)}, "
                    f"{q('__min__' + c)}, {q('__max__' + c)}, "
                    f"{q('__mean__' + c)}, {q('__p50__' + c)}"
                    for c in cols
                ),
            )
        ),
    )
    return stacked.select(
        "column", "n_rows",
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_str", "max_str", "mean", "p50",
    )
