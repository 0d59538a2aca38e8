"""Join operators Spark lacks natively: as-of join and range join.

As-of join (the time-series "most recent right row at or before the left
row's time") is implemented with the union + running-last-value technique:

1. tag right rows 0 and left rows 1, union on (key, time, tag);
2. one window pass per key ordered by (time, tag) carrying the last
   non-null right payload forward;
3. keep left rows with the carried payload.

This is the scalable shape: ONE shuffle on the key, then a linear in-order
scan per partition — no range cross-join, no per-group pandas. Skewed keys
are handled by AQE; memory is O(1) per row beyond the sort.

A per-group ``pd.merge_asof`` via applyInPandas would express the same
semantics but ships every row through Python — kept out of the hot path
deliberately (UDFs are the slow path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_payload: list[str],
    direction: str = "backward",
    suffix: str = "_right",
    tolerance: float | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    right_time <= left_time (direction='backward'; 'forward' gives the
    earliest right row with right_time >= left_time). Ties at equal time
    admit the right row (inclusive), matching DuckDB/pandas ASOF semantics.

    ``tolerance`` (pandas ``merge_asof`` parity): a match further than this
    from the left time is discarded (payload nulls). Units: the time
    column's numeric value, or SECONDS for timestamp columns (both sides
    compare as doubles).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    l_tag, r_tag = 1, 0
    left_cols = [c for c in left.columns]
    payload_out = [f"{c}{suffix}" for c in right_payload]

    # the right row's time and payload travel as ONE struct, so the
    # running last() can never pair one row's payload with another row's
    # timestamp (null payloads with a newer time would otherwise split)
    rt_type = dict(right.dtypes)[right_time]
    payload_struct_type = "struct<__rt:{},{}>".format(
        rt_type,
        ",".join(f"{p}:{dict(right.dtypes)[c]}"
                 for c, p in zip(right_payload, payload_out)),
    )
    l_part = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(l_tag).alias("__tag"),
        F.struct(*left_cols).alias("__left"),
        F.lit(None).cast(payload_struct_type).alias("__p"),
    )
    r_part = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(r_tag).alias("__tag"),
        F.lit(None).cast(
            l_part.schema["__left"].dataType.simpleString()
        ).alias("__left"),
        F.struct(
            F.col(right_time).alias("__rt"),
            *[F.col(c).alias(p) for c, p in zip(right_payload, payload_out)],
        ).alias("__p"),
    )
    unioned = l_part.unionByName(r_part)

    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.asc("__t"), F.asc("__tag"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.desc("__t"), F.asc("__tag"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    carried = unioned.select(
        "*",
        F.last("__p", ignorenulls=True).over(w).alias("__c"),
    )
    rows = carried.filter(F.col("__tag") == l_tag)
    keep = F.lit(True)
    if tolerance is not None:
        keep = (
            F.abs(F.col("__t").cast("double")
                  - F.col("__c.__rt").cast("double")) <= F.lit(tolerance)
        )
    out = rows.select(
        F.col("__left.*"),
        *[F.when(keep, F.col(f"__c.{p}")).otherwise(F.lit(None)).alias(p)
          for p in payload_out],
    )
    return out


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Point-in-interval range join via bucketization: explode each right
    interval into the buckets it overlaps, equi-join on bucket (+ optional
    keys), then exact range filter. Turns an O(n*m) theta join into an
    equi-join whose fan-out is interval_width / bucket_width."""
    extra_on = extra_on or []
    lb = left.withColumn(
        "__bucket", F.floor(F.col(left_point) / F.lit(bucket_width))
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(bucket_width)),
                F.floor(F.col(right_hi) / F.lit(bucket_width)),
            )
        ),
    )
    joined = lb.join(rb, ["__bucket", *extra_on])
    return joined.filter(
        (F.col(left_point) >= F.col(right_lo))
        & (F.col(left_point) <= F.col(right_hi))
    ).drop("__bucket")
