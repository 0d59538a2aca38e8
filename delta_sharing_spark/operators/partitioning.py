"""Partitioning & shuffle toolkit: bucketed co-located joins, salted skew
joins, and deterministic random-hyperplane LSH bucketing for embeddings.

These are the levers the 100 TB deployment turns (SURVEY.md "Optimize for
scale"): a shuffle avoided via bucketing is a shuffle avoided on every
downstream join on that key; a salted join turns one straggler partition
into ``salts`` even ones.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def spread_to_parallelism(df: DataFrame) -> DataFrame:
    """Row-multiplying or per-row-expensive stages inherit the SCAN's
    partitioning, and a small input file scans as ONE partition — the
    whole map phase then runs on one core. Repartition up to the
    cluster's default parallelism when (and only when) the input has
    fewer partitions: at real scale the scan already has more partitions
    than cores and this is a no-op (no shuffle added). Shared by the
    dedup shingle explodes and the media decode workloads."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def write_bucketed(df: DataFrame, table_name: str, num_buckets: int,
                   bucket_cols: list[str],
                   sort_cols: list[str] | None = None) -> None:
    """Persist as a bucketed (and optionally sorted) table. Two tables
    bucketed the same way equi-join on the bucket columns WITHOUT a shuffle
    (SortMergeJoin reads co-located buckets directly)."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a stale managed-table location can survive a previous session whose
    # in-memory catalog is gone; clear it so saveAsTable can recreate
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table_name.lower()}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def salted_join(left: DataFrame, right: DataFrame, on: str,
                salts: int = 8, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join: spread each hot left key over ``salts``
    sub-partitions and replicate the right side once per salt, so one hot
    key's work lands on ``salts`` tasks instead of one straggler.

    Semantically identical to ``left.join(right, on, how)`` for inner/left
    joins on an equi key. Cost: right side is duplicated ``salts`` times —
    use for dimension-sized right sides or pre-filtered hot keys.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left equi-joins")
    salted_left = left.withColumn(
        "__salt", (F.xxhash64(F.monotonically_increasing_id()) % salts
                   + salts) % salts
    )
    salted_right = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<bigint>")),
    )
    out = salted_left.join(salted_right, [on, "__salt"], how)
    return out.drop("__salt")


def hyperplanes(seed: str, num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is +1/-1
    from a bit of md5(seed:p:d) — reproducible across runs and engines, no
    RNG state to ship to executors."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            digest = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()
            row.append(1.0 if digest[0] & 1 else -1.0)
        planes.append(row)
    return planes


def rp_lsh_buckets(df: DataFrame, vec_col: str, num_planes: int = 8,
                   dim: int = 64, seed: str = "rp") -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) LSH: bucket = the sign bits
    of the vector's dot products with ``num_planes`` fixed hyperplanes.
    Cosine-similar vectors land in the same bucket with probability
    (1 - theta/pi)^num_planes — the standard scale path for embedding
    near-dup and ANN candidate generation.

    The planes are literal arrays inside the expression (no broadcast
    variable, no Python in the row path).
    """
    planes = hyperplanes(seed, num_planes, dim)
    bits = []
    for p, row in enumerate(planes):
        arr = "array(" + ",".join(
            f"cast({v} as double)" for v in row) + ")"
        dot = (
            f"aggregate(zip_with({vec_col}, {arr}, "
            f"(x, y) -> cast(x as double) * y), cast(0 as double), "
            f"(acc, x) -> acc + x)"
        )
        bits.append(f"CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END")
    bucket = F.expr("concat(" + ",".join(bits) + ")")
    return df.withColumn("rp_bucket", bucket)


def rp_lsh_near_dup(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding", threshold: float = 0.9,
                    num_planes: int = 8, dim: int = 64) -> DataFrame:
    """Near-dup pairs via RP-LSH candidates + exact cosine verification.
    Only vectors sharing a bucket are compared — the candidate join is an
    equi-join on the bucket string, not a cross product."""
    from delta_sharing_spark.functions.vectors import cosine

    bucketed = rp_lsh_buckets(df, vec_col, num_planes, dim)
    a = bucketed.select(F.col(id_col).alias("id_a"),
                        F.col(vec_col).alias("va"), "rp_bucket")
    b = bucketed.select(F.col(id_col).alias("id_b"),
                        F.col(vec_col).alias("vb"), "rp_bucket")
    return (
        a.join(b, ["rp_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine("va", "vb"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def assert_no_shuffle_join(spark: SparkSession, table_a: str, table_b: str,
                           on: list[str]) -> tuple[bool, str]:
    """Diagnostic: join two saved (bucketed) tables and report whether the
    physical plan is free of shuffle exchanges. Broadcast is temporarily
    disabled so the planner must pick SortMergeJoin — with matching bucket
    counts the buckets are co-located and no ``Exchange hashpartitioning``
    appears."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.table(table_a).join(spark.table(table_b), on)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return ("Exchange hashpartitioning" not in plan, plan)
