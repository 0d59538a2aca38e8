"""Similarity search over embedding columns: brute-force top-k (the exact
baseline) and IVF-style partition-pruned search (the scale path).

Shapes at 100 TB:

- ``brute_force_topk``: broadcast the Q query vectors against the N
  candidates (one map-side pass computing Q*N similarities), then a single
  shuffle on query_id for the global top-k. Never materializes the full
  similarity matrix beyond the per-task stream.
- ``ivf_topk``: restrict the scan to candidates in the nprobe closest coarse
  cells (centroid assignment = the inverted file). Cell assignment is an
  equi-join on cell id — candidates outside probed cells are never read
  when the table is partitioned by cell, which is the point: partition
  pruning does the ANN work.
- ``near_dup_pairs``: exact threshold self-join; at scale the same call is
  fed LSH/IVF candidates instead of the raw cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from delta_sharing_spark.functions.vectors import cosine


def brute_force_topk(queries: DataFrame, candidates: DataFrame,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     k: int = 5) -> DataFrame:
    """Exact cosine top-k: for each query row, the k most similar candidate
    rows (self-matches excluded), ties broken by candidate id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def ivf_centroids(candidates: DataFrame, cell_col: str,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  dim: int = 64) -> DataFrame:
    """Per-cell centroids with a deterministic ordered fold (sorted by id,
    left-to-right double accumulation) — reproducible across engines and
    runs, unlike a naive float ``avg`` whose partial-aggregation order
    varies."""
    sum_expr = f"""
        aggregate(
          transform(array_sort(collect_list(struct({id_col}, {vec_col}))),
                    s -> s.{vec_col}),
          array_repeat(cast(0 as double), {dim}),
          (acc, v) -> zip_with(acc, v, (x, y) -> x + cast(y as double))
        )
    """
    return (
        candidates.groupBy(cell_col)
        .agg(
            F.expr(sum_expr).alias("vec_sum"),
            F.count("*").alias("n"),
        )
        .select(
            cell_col,
            F.expr("transform(vec_sum, x -> x / n)").alias("centroid"),
            "n",
        )
    )


def ivf_topk(queries: DataFrame, candidates: DataFrame, cell_col: str,
             id_col: str = "vec_id", vec_col: str = "embedding",
             k: int = 5, nprobe: int = 2, dim: int = 64) -> DataFrame:
    """IVF search: score query x centroid (tiny), keep ``nprobe`` cells per
    query, then brute-force only within probed cells (equi-join on cell).

    With the table partitioned/bucketed by cell, the probe join prunes the
    scan to nprobe/num_cells of the data — that ratio is the speedup and it
    is independent of total data size.
    """
    cents = ivf_centroids(candidates, cell_col, id_col, vec_col, dim)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("cell_cos"), F.asc(cell_col)
    )
    probed = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cell_cos", cosine("q_vec", "centroid"))
        .withColumn("cell_rank", F.row_number().over(probe_w))
        .filter(F.col("cell_rank") <= nprobe)
        .select("query_id", "q_vec", cell_col)
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(cell_col),
    )
    scored = (
        c.join(F.broadcast(probed), on=cell_col)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def near_dup_pairs(df: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b) above a threshold."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine("va", "vb"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
