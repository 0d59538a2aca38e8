"""Model-based document scoring: a linear text classifier (the shape of
fastText / CCNet-style quality filters) evaluated as pure DataFrame ops.

A trained linear model over a bag-of-tokens is just ``score =
(bias + sum_i w[token_i]) / n_tokens`` — a broadcast-or-shuffle equi-join
of the exploded token stream against a (token, weight) table plus one
aggregation. No UDF, no model server: the "inference" is a join, which is
exactly what makes it run at 100 TB (the model table is a few million rows
at most; Spark broadcasts it or AQE picks a shuffle join).

Weights are integer micro-units (1e-6) so the accumulation is an exact
BIGINT sum — reproducible across engines and partitionings; the float
division happens once at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEIGHT_UNIT = 1_000_000


def score_text_linear(df: DataFrame, weights: DataFrame, id_col: str,
                      text_col: str, *, token_col: str = "token",
                      weight_col: str = "weight_u",
                      bias_u: int = 0) -> DataFrame:
    """Score each document with a linear bag-of-tokens model.

    ``weights``: (token, weight_u) with weight_u in integer micro-units —
    a real trained model's weights quantized to 1e-6, or any derived
    lexicon. Unknown tokens weigh 0 (the fastText OOV convention for a
    plain linear layer).

    Returns ``(id, n_toks, score_u, score)`` where ``score_u = bias_u +
    sum(weight_u)`` (exact BIGINT) and ``score = score_u / (n_toks *
    1e-6 unit)`` — the mean token weight. Thresholding should compare
    ``score_u`` against ``threshold * n_toks * UNIT`` in integers to stay
    engine-exact.

    Plan: explode (map-side) → one equi-join on the token → one aggregate
    on the doc id. Token-frequency skew (stopwords) is bounded by the
    model size and AQE skew-join.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("__tok"),
    )
    w = weights.select(F.col(token_col).alias("__tok"),
                       F.col(weight_col).alias("__w"))
    per_doc = (
        toks.join(w, "__tok", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_toks"),
            (F.lit(bias_u)
             + F.sum(F.coalesce("__w", F.lit(0)))).alias("score_u"),
        )
    )
    return per_doc.select(
        id_col, "n_toks", "score_u",
        (F.col("score_u").cast("double")
         / (F.col("n_toks") * F.lit(WEIGHT_UNIT))).alias("score"),
    )


def pseudo_weights(df: DataFrame, text_col: str,
                   salt: str = "qw") -> DataFrame:
    """Deterministic stand-in model: one weight per distinct corpus token,
    derived from md5 — uniform in [-1e6, 1e6] micro-units. Replayable in
    any engine (the oracle derives the identical table in SQL); swap in a
    real model's quantized weights for production use."""
    vocab = (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), " "))
                  .alias("token"))
        .distinct()
    )
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col("token"))),
                           1, 8), 16, 10).cast("bigint")
    return vocab.select(
        "token",
        (h % F.lit(2 * WEIGHT_UNIT + 1) - F.lit(WEIGHT_UNIT))
        .alias("weight_u"),
    )
