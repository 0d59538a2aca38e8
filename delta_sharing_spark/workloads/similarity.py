"""Similarity-search workloads over ``embeddings`` (64-dim float vectors,
10 labeled clusters). Oracles recompute the identical left-to-right double
folds in DuckDB — verified bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_sharing_spark.io import read_table
from delta_sharing_spark.operators.similarity import (
    brute_force_topk,
    ivf_centroids,
    near_dup_pairs,
)
from delta_sharing_spark.workloads import workload

# DuckDB fragments: cosine over FLOAT[] in explicit double, left-to-right
_DOT = ("list_reduce(list_transform(generate_series(1, 64), "
        "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)")
_NORM = ("sqrt(list_reduce(list_transform(generate_series(1, 64), "
         "i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE), (x, y) -> x + y))")
_COS = (f"({_DOT} / ({_NORM.replace('{a}', '{a}')} * "
        f"{_NORM.replace('{a}', '{b}')}))")


def _cos_sql(a: str, b: str) -> str:
    return _COS.replace("{a}", a).replace("{b}", b)


@workload(
    "q_ann_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             {_cos_sql('q.qv', 'c.embedding')} AS cos
      FROM q JOIN embeddings c ON c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
    FROM ranked WHERE rank <= 5
    """,
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: brute-force cosine top-5 for 8 query vectors.
    Broadcast queries -> one pass over candidates -> one shuffle on
    query_id; the scale path (IVF) is q_ann_ivf_topk."""
    emb = read_table(spark, sf_dir, "embeddings")
    return brute_force_topk(
        emb.filter(F.col("vec_id") < 8), emb, k=5
    ).withColumn("rank", F.col("rank").cast("int"))


@workload(
    "q_embedding_near_dup",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_cos_sql('a.embedding', 'b.embedding')} AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.42
    """,
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold tuned to the data's
    similarity mass). At scale the same verifier runs on LSH/IVF candidates
    instead of the cross product."""
    emb = read_table(spark, sf_dir, "embeddings")
    return near_dup_pairs(emb, threshold=0.42)


@workload(
    "q_embedding_centroids",
    oracle="""
    WITH ex AS (
      SELECT label, CAST(u.i - 1 AS INT) AS dim, embedding[u.i] AS x
      FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) u
    )
    SELECT label, dim,
           CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1e12) AS DECIMAL(38,0)))
                AS DOUBLE) / 1e12 / COUNT(*) AS value,
           COUNT(*) AS n
    FROM ex GROUP BY label, dim
    """,
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse structure: per-cluster centroids via exact fixed-point
    per-(cell, dim) sums — deterministic across engines/partial-agg orders
    and scale-safe (no whole-cell collect_list row)."""
    emb = read_table(spark, sf_dir, "embeddings")
    cents = ivf_centroids(emb, "label", dim=64)
    return cents.select(
        "label",
        F.posexplode("centroid").alias("dim", "value"),
        "n",
    ).select("label", "dim", "value", "n")


_UNIT_DOT = """
    round(list_reduce(list_transform(generate_series(1, 64),
        i -> (a.embedding[i]::DOUBLE / a.nrm) * (b.embedding[i]::DOUBLE / b.nrm)),
        (x, y) -> x + y), 9)
"""


@workload(
    "q_embedding_near_dup_blocked",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_reduce(list_transform(generate_series(1, 64),
                 i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE),
                 (x, y) -> x + y)) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_UNIT_DOT} AS cos
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {_UNIT_DOT} >= 0.42
    """,
)
def q_embedding_near_dup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path near-dup: block-nested-loop + vectorized numpy GEMM over
    Arrow batches (one float64 matmul per block pair, no per-pair Python).
    Similarities rounded to 9 decimals on both sides so GEMM accumulation
    order and the oracle's sequential fold agree exactly."""
    from delta_sharing_spark.operators.similarity import near_dup_pairs_blocked

    emb = read_table(spark, sf_dir, "embeddings")
    return near_dup_pairs_blocked(emb, threshold=0.42, block_size=512)


@workload(
    "q_ann_ivf_topk",
    oracle=f"""
    WITH ex AS (
      SELECT label, u.i AS i, embedding[u.i] AS x
      FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) u
    ),
    sums AS (
      SELECT label, i,
             CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1e12) AS DECIMAL(38,0)))
                  AS DOUBLE) / 1e12 / COUNT(*) AS v
      FROM ex GROUP BY label, i
    ),
    cents AS (
      SELECT label, list(v ORDER BY i) AS centroid
      FROM sums GROUP BY label
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
          WHERE vec_id < 6),
    cell_scores AS (
      SELECT q.query_id, q.qv, c.label,
             list_reduce(list_transform(generate_series(1, 64),
                 i -> q.qv[i]::DOUBLE * c.centroid[i]), (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(generate_series(1, 64),
                   i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE), (x, y) -> x + y))
              * sqrt(list_reduce(list_transform(generate_series(1, 64),
                   i -> c.centroid[i] * c.centroid[i]), (x, y) -> x + y)))
               AS cell_cos
      FROM q CROSS JOIN cents c
    ),
    probed AS (
      SELECT query_id, qv, label FROM (
        SELECT query_id, qv, label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cell_cos DESC, label) AS cr
        FROM cell_scores
      ) WHERE cr <= 2
    ),
    scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             {{COS}} AS cos
      FROM probed p JOIN embeddings c ON c.label = p.label
                                     AND c.vec_id <> p.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
    FROM ranked WHERE rank <= 5
    """.replace("{COS}", _cos_sql("p.qv", "c.embedding")),
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN search end-to-end with a full-fidelity oracle: deterministic
    fixed-point centroids, nprobe=2 coarse probe, exact re-ranking within
    probed cells — the oracle replays the identical probe in SQL, so even
    the approximation is value-checked."""
    from delta_sharing_spark.operators.similarity import ivf_topk

    emb = read_table(spark, sf_dir, "embeddings")
    out = ivf_topk(emb.filter(F.col("vec_id") < 6), emb, "label",
                   k=5, nprobe=2, dim=64)
    return out.withColumn("rank", F.col("rank").cast("int"))
