"""Training-pipeline sampling workloads: deterministic train/val/test
splits, stratified subsampling, and epoch shuffling over the ``documents``
corpus — every operator hash-deterministic (seeded md5) so DuckDB replays
the exact assignment and the driver gets full value-level oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_sharing_spark.io import read_table
from delta_sharing_spark.operators.sampling import (
    shuffle_shards,
    split_assign,
    stratified_sample,
)
from delta_sharing_spark.workloads import workload


@workload(
    "q_split_train_val_test",
    oracle="""
    WITH b AS (
        SELECT doc_id, n_chars,
               ('0x' || substr(md5('split' || doc_id), 1, 8))::BIGINT
                   % 1000000 AS bucket
        FROM documents
    ),
    s AS (
        SELECT n_chars,
               CASE WHEN bucket < 800000 THEN 'train'
                    WHEN bucket < 900000 THEN 'val'
                    ELSE 'test' END AS split
        FROM b
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM s GROUP BY split
    """,
)
def q_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test carve: a pure projection (zero shuffles
    before the final 3-group agg); a document keeps its split forever —
    re-running on a grown corpus never moves old rows across splits."""
    docs = read_table(spark, sf_dir, "documents")
    out = split_assign(docs, "doc_id",
                       [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    return out.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


@workload(
    "q_stratified_sample_lang",
    oracle="""
    WITH b AS (
        SELECT doc_id, lang, n_chars,
               ('0x' || substr(md5('sample' || doc_id), 1, 8))::BIGINT
                   % 1000000 AS bucket
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM b
    WHERE bucket < CASE lang WHEN 'en' THEN 250000
                             WHEN 'de' THEN 500000
                             ELSE 1000000 END
    GROUP BY lang
    """,
)
def q_stratified_sample_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing subsample (downsample dominant languages, keep
    the tail whole): a pure deterministic filter — no shuffle, no sampling
    state, bit-identical on any cluster."""
    docs = read_table(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs, "lang", "doc_id",
        fractions={"en": 0.25, "de": 0.5},
        default_fraction=1.0,
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


@workload(
    "q_shuffle_shards",
    oracle="""
    WITH h AS (
        SELECT doc_id, md5('shuffle' || doc_id) AS hh FROM documents
    ),
    sh AS (
        SELECT doc_id,
               ('0x' || substr(hh, 1, 8))::BIGINT % 16 AS shard,
               ROW_NUMBER() OVER (
                   PARTITION BY ('0x' || substr(hh, 1, 8))::BIGINT % 16
                   ORDER BY hh, doc_id) - 1 AS pos
        FROM h
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(pos) AS BIGINT) AS max_pos,
           CAST(SUM(pos * doc_id) AS BIGINT) AS perm_checksum
    FROM sh GROUP BY shard
    """,
)
def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle into 16 shards: one hash shuffle + a
    per-shard window (no global sort). ``perm_checksum`` (sum of
    pos*doc_id per shard) pins the exact permutation, not just the shard
    sizes — DuckDB replays it identically."""
    docs = read_table(spark, sf_dir, "documents")
    out = shuffle_shards(docs, "doc_id", num_shards=16)
    return out.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.max("pos").alias("max_pos"),
        F.sum(F.col("pos") * F.col("doc_id")).alias("perm_checksum"),
    )

@workload(
    "q_pack_sequences",
    oracle="""
    WITH h AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tok,
               md5('pack' || doc_id) AS hh
        FROM documents
    ),
    sh AS (
        SELECT doc_id, n_tok, hh,
               ('0x' || substr(hh, 1, 8))::BIGINT % 8 AS shard
        FROM h
    ),
    c AS (
        SELECT shard, n_tok,
               COALESCE(SUM(n_tok) OVER (
                   PARTITION BY shard ORDER BY hh, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum
        FROM sh
    )
    SELECT shard,
           CAST(cum // 1024 AS BIGINT) AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
    FROM c GROUP BY shard, seq_id
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous packing of documents into 1024-token training
    sequences across 8 shards: one hash shuffle + per-shard running-sum
    window (no global sort). The oracle replays the exact packing and
    checks every sequence's document count and token load."""
    from delta_sharing_spark.operators.sampling import pack_sequences

    docs = read_table(spark, sf_dir, "documents") \
        .withColumn("n_tok", F.size(F.split("text", " ")))
    packed = pack_sequences(docs, "doc_id", "n_tok",
                            max_tokens=1024, num_shards=8)
    return packed.groupBy("shard", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("sum_tokens"),
    )


@workload(
    "q_domain_mix",
    oracle="""
    WITH c AS (
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    m AS (SELECT MIN(n) AS n_min FROM c),
    t AS (
        SELECT lang, n, (n_min * 1000000) // n AS thr FROM c, m
    ),
    k AS (
        SELECT d.lang, d.n_chars
        FROM documents d JOIN t USING (lang)
        WHERE ('0x' || substr(md5('mix' || d.doc_id), 1, 8))::BIGINT
              % 1000000 < t.thr
    )
    SELECT t.lang,
           CAST(t.n AS BIGINT) AS n_orig,
           CAST(COUNT(k.lang) AS BIGINT) AS n_kept,
           CAST(SUM(k.n_chars) AS BIGINT) AS sum_chars
    FROM t LEFT JOIN k ON t.lang = k.lang
    GROUP BY t.lang, t.n
    """,
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture balancing: every language downsampled to ≈ the smallest
    language's share via an exact integer acceptance threshold — the
    domain-mix step of corpus prep. The corpus is never shuffled (count agg
    broadcast back + pure hash filter); the oracle replays the acceptance
    decision for every document."""
    from delta_sharing_spark.operators.sampling import balance_strata

    docs = read_table(spark, sf_dir, "documents")
    orig = docs.groupBy("lang").agg(F.count("*").alias("n_orig"))
    kept = balance_strata(docs, "lang", "doc_id", salt="mix") \
        .groupBy("lang").agg(F.count("*").alias("n_kept"),
                             F.sum("n_chars").alias("sum_chars"))
    return (
        orig.join(kept, "lang", "left")
        .select("lang", "n_orig",
                F.coalesce("n_kept", F.lit(0)).alias("n_kept"), "sum_chars")
    )


@workload(
    "q_temperature_resample",
    oracle="""
    WITH c AS (
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    m AS (SELECT MIN(n) AS n_min FROM c),
    t AS (
        SELECT lang, n,
               FLOOR(1000000 * sqrt(n_min::DOUBLE / n::DOUBLE)) AS thr
        FROM c, m
    ),
    k AS (
        SELECT d.lang, d.n_chars
        FROM documents d JOIN t USING (lang)
        WHERE ('0x' || substr(md5('temp' || d.doc_id), 1, 8))::BIGINT
              % 1000000 < t.thr
    )
    SELECT t.lang,
           CAST(t.n AS BIGINT) AS n_orig,
           CAST(COUNT(k.lang) AS BIGINT) AS n_kept,
           CAST(SUM(k.n_chars) AS BIGINT) AS sum_chars
    FROM t LEFT JOIN k ON t.lang = k.lang
    GROUP BY t.lang, t.n
    """,
)
def q_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha=0.5) mixture rebalancing: keep rate per language
    = sqrt(n_min/n) — between natural and flat mixing. sqrt is correctly
    rounded everywhere, so the oracle replays every per-document
    acceptance decision exactly."""
    from delta_sharing_spark.operators.sampling import temperature_resample

    docs = read_table(spark, sf_dir, "documents")
    orig = docs.groupBy("lang").agg(F.count("*").alias("n_orig"))
    kept = temperature_resample(docs, "lang", "doc_id", salt="temp") \
        .groupBy("lang").agg(F.count("*").alias("n_kept"),
                             F.sum("n_chars").alias("sum_chars"))
    return (
        orig.join(kept, "lang", "left")
        .select("lang", "n_orig",
                F.coalesce("n_kept", F.lit(0)).alias("n_kept"), "sum_chars")
    )


@workload(
    "q_unimax_budget",
    oracle="""
    WITH caps AS (
      SELECT lang,
             CAST(SUM(len(string_split(text, ' '))) * 2 AS BIGINT)
               AS capacity
      FROM documents GROUP BY lang
    ),
    ranked AS (
      SELECT lang, capacity,
             ROW_NUMBER() OVER (ORDER BY capacity, lang) AS i,
             SUM(capacity) OVER (ORDER BY capacity, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
             COUNT(*) OVER () AS n
      FROM caps
    ),
    sat AS (
      SELECT *,
             (capacity * (n - i + 1) + p - capacity)
               <= CAST(40000 AS DOUBLE) AS saturated
      FROM ranked
    ),
    xo AS (
      SELECT *,
             COALESCE(MAX(CASE WHEN saturated THEN p END) OVER (),
                      0) AS sat_p,
             COALESCE(MAX(CASE WHEN saturated THEN i END) OVER (),
                      0) AS sat_k
      FROM sat
    )
    SELECT lang, capacity,
           CASE WHEN saturated THEN CAST(capacity AS DOUBLE)
                ELSE (CAST(40000 AS DOUBLE) - sat_p) / (n - sat_k)
           END AS allocation,
           saturated
    FROM xo
    """,
)
def q_unimax_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language-budget allocation: spread a 40k-token budget as
    uniformly as possible across languages with a 2-epoch per-language
    cap — low-resource languages saturate at their full capacity, the
    rest split the remainder evenly. Closed-form water-filling over
    window functions (no iteration); the oracle replays the identical
    prefix-sum crossover math, double-exact."""
    from delta_sharing_spark.operators.sampling import unimax_allocation

    docs = read_table(spark, sf_dir, "documents") \
        .withColumn("n_tok", F.size(F.split("text", " ")))
    return unimax_allocation(docs, "lang", "n_tok",
                             total_budget=40_000, epochs=2)


@workload(
    "q_unimax_mixture",
    oracle="""
    WITH caps AS (
      SELECT lang,
             CAST(SUM(len(string_split(text, ' '))) * 2 AS BIGINT)
               AS capacity
      FROM documents GROUP BY lang
    ),
    ranked AS (
      SELECT lang, capacity,
             ROW_NUMBER() OVER (ORDER BY capacity, lang) AS i,
             SUM(capacity) OVER (ORDER BY capacity, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
             COUNT(*) OVER () AS n
      FROM caps
    ),
    sat AS (
      SELECT *,
             (capacity * (n - i + 1) + p - capacity)
               <= CAST(40000 AS DOUBLE) AS saturated
      FROM ranked
    ),
    xo AS (
      SELECT *,
             COALESCE(MAX(CASE WHEN saturated THEN p END) OVER (),
                      0) AS sat_p,
             COALESCE(MAX(CASE WHEN saturated THEN i END) OVER (),
                      0) AS sat_k
      FROM sat
    ),
    alloc AS (
      SELECT lang,
             CAST(FLOOR(CASE WHEN saturated THEN CAST(capacity AS DOUBLE)
                  ELSE (CAST(40000 AS DOUBLE) - sat_p) / (n - sat_k)
             END) AS BIGINT) AS budget
      FROM xo
    ),
    d AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok,
             md5('unimax' || doc_id) AS h
      FROM documents
    ),
    c AS (
      SELECT d.*, alloc.budget,
             COALESCE(SUM(n_tok) OVER (
                 PARTITION BY d.lang ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS before_row
      FROM d JOIN alloc USING (lang)
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS mix_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM c
    WHERE before_row < budget
    GROUP BY lang
    """,
)
def q_unimax_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed UniMax pipeline: water-fill the 40k budget into
    per-language caps, FLOOR the allocations into integer budgets, and
    fill them with documents via the two-phase bucketed mixture prefix —
    allocator hand-off to sampler end to end, the whole composition
    replayed in SQL (id_checksum pins the exact selected set). The
    allocator result collects driver-side by design: one row per
    language, bounded by #strata."""
    import math

    from delta_sharing_spark.operators.sampling import (
        build_mixture,
        unimax_allocation,
    )

    docs = read_table(spark, sf_dir, "documents") \
        .withColumn("n_tok", F.size(F.split("text", " ")))
    alloc = unimax_allocation(docs, "lang", "n_tok",
                              total_budget=40_000, epochs=2).collect()
    budgets = {r.lang: int(math.floor(r.allocation)) for r in alloc}
    mix = build_mixture(docs, "lang", "n_tok", "doc_id",
                        budgets=budgets, salt="unimax")
    return mix.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("mix_tokens"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
    )


@workload(
    "q_mixture_budget",
    oracle="""
    WITH d AS (
        SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok,
               md5('mixture' || doc_id) AS h
        FROM documents
    ),
    w(lang, budget) AS (
        VALUES ('en', 8000), ('zh', 4000), ('es', 4000),
               ('fr', 2000), ('de', 2000)
    ),
    c AS (
        SELECT d.*, w.budget,
               COALESCE(SUM(n_tok) OVER (
                   PARTITION BY d.lang ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS before_row
        FROM d JOIN w USING (lang)
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS mix_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM c
    WHERE before_row < budget
    GROUP BY lang
    """,
)
def q_mixture_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture construction: fill explicit per-language token
    budgets (40/20/20/10/10% of 20k tokens) with documents in seeded-hash
    order. The engine runs the two-phase bucketed prefix (only the ONE
    boundary bucket per language pays a sort — the 100 TB shape); the
    oracle replays the equivalent single global window cumsum, proving the
    two-phase decomposition is exact. ``id_checksum`` pins the exact
    selected document set, not just its size."""
    from delta_sharing_spark.operators.sampling import build_mixture

    docs = read_table(spark, sf_dir, "documents") \
        .withColumn("n_tok", F.size(F.split("text", " ")))
    weights = {"en": 0.4, "zh": 0.2, "es": 0.2, "fr": 0.1, "de": 0.1}
    mix = build_mixture(docs, "lang", "n_tok", "doc_id",
                        weights, total_tokens=20_000, salt="mixture")
    return mix.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("mix_tokens"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
    )


@workload(
    "q_dsir_resample",
    oracle="""
    WITH sp AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id, lang,
             unnest(list_transform(
               generate_series(1, greatest(len(w) - 1, 1)),
               i -> array_to_string(list_slice(w, i::INT, i::INT + 1), ' ')
             )) AS g
      FROM sp
    ),
    counts AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('dsir:' || g), 1, 8))::BIGINT % 8192
               AS bucket,
             COUNT(*) AS c
      FROM grams GROUP BY 1, 2, 3
    ),
    p AS (SELECT bucket, SUM(c) AS p_k FROM counts WHERE lang = 'en'
          GROUP BY 1),
    q AS (SELECT bucket, SUM(c) AS q_k FROM counts GROUP BY 1),
    tot AS (SELECT (SELECT SUM(p_k) FROM p) AS tp,
                   (SELECT SUM(q_k) FROM q) AS tq),
    model AS (
      SELECT bucket,
             CAST(round((ln((COALESCE(p_k, 0) + 1)::DOUBLE
                             / (tp + 8192)::DOUBLE)
                       - ln((COALESCE(q_k, 0) + 1)::DOUBLE
                             / (tq + 8192)::DOUBLE)) * 1000000) AS BIGINT)
               AS llr_u
      FROM p FULL JOIN q USING (bucket) CROSS JOIN tot
    ),
    w AS (
      SELECT doc_id, SUM(c * llr_u) AS logw_u, SUM(c) AS n_grams
      FROM counts JOIN model USING (bucket)
      GROUP BY 1
    )
    SELECT doc_id, CAST(logw_u AS BIGINT) AS logw_u,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(logw_u + CAST(round(-ln(-ln(
             ((('0x' || substr(md5('gumbel' || doc_id), 1, 8))::BIGINT + 1)
              ::DOUBLE / 4294967297.0))) * 1000000) AS BIGINT) AS BIGINT)
             AS key_u
    FROM w
    ORDER BY key_u DESC, doc_id
    LIMIT 100
    """,
)
def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): hashed-bigram importance
    weights of every document against the English subset as the target
    distribution, Gumbel top-k resampling of the 100 most target-like
    docs. Fit = two bucket aggregations + a broadcast-sized full-outer
    join; scoring = one broadcast equi-join + per-doc agg; selection =
    distributed partial top-k. All accumulation in exact integer
    micro-units (per-bucket/per-doc log terms quantized at the point of
    computation), so DuckDB replays the whole pipeline bit-exactly."""
    from delta_sharing_spark.operators.scoring import (
        dsir_fit,
        dsir_importance,
        dsir_resample,
        hashed_ngram_counts,
    )

    docs = read_table(spark, sf_dir, "documents")
    raw_counts = hashed_ngram_counts(docs, "doc_id", "text",
                                     n=2, buckets=8192)
    tgt_counts = hashed_ngram_counts(docs.filter("lang = 'en'"),
                                     "doc_id", "text", n=2, buckets=8192)
    model = dsir_fit(tgt_counts, raw_counts, buckets=8192)
    weights = dsir_importance(raw_counts, model, "doc_id")
    return dsir_resample(weights, "doc_id", 100)


def _doremi_oracle(steps: int, eta_u: int = 2, smooth_num: int = 1,
                   smooth_den: int = 5) -> str:
    """Unrolled-CTE DuckDB replay of the DoReMi multiplicative-weights
    loop (the same iterative-fit-in-SQL pattern as the kmeans and BPE
    oracles): per step one weighted-average CTE, one update CTE, one
    renormalize+smooth CTE — all integer floor-division, so the replay is
    bit-exact against the driver-side Python-int trajectory. The chained
    CTEs are MATERIALIZED: each step references its predecessor twice
    (update + normalizer sum), so plain inlining would re-expand the whole
    LM pipeline 2^steps times (observed as a fd-exhaustion blow-up)."""
    head = """
    WITH ref AS (SELECT text FROM documents WHERE doc_id % 10 < 3),
    ref_bg AS (
      SELECT CASE WHEN t.i = 1 THEN '<s>'
                  ELSE string_split(text, ' ')[t.i - 1] END AS ctx,
             string_split(text, ' ')[t.i] AS tok
      FROM ref, LATERAL (
        SELECT UNNEST(generate_series(1, len(string_split(text, ' '))))
        AS i) t
    ),
    pairs AS (
      SELECT ctx, tok, COUNT(*) AS pair_n FROM ref_bg GROUP BY 1, 2
    ),
    ctxs AS (
      SELECT ctx, SUM(pair_n) AS ctx_n FROM pairs GROUP BY ctx
    ),
    v AS (SELECT COUNT(DISTINCT tok) AS vocab FROM pairs),
    doc_bg AS (
      SELECT doc_id,
             CASE WHEN t.i = 1 THEN '<s>'
                  ELSE string_split(text, ' ')[t.i - 1] END AS ctx,
             string_split(text, ' ')[t.i] AS tok
      FROM documents, LATERAL (
        SELECT UNNEST(generate_series(1, len(string_split(text, ' '))))
        AS i) t
    ),
    lk AS (
      SELECT d.doc_id,
             CAST((COALESCE(p.pair_n, 0) + 1) * 1000000 AS BIGINT)
                  // CAST(COALESCE(c.ctx_n, 0) + v.vocab AS BIGINT)
                  AS lk_u
      FROM doc_bg d
      LEFT JOIN pairs p ON p.ctx = d.ctx AND p.tok = d.tok
      LEFT JOIN ctxs c ON c.ctx = d.ctx
      CROSS JOIN v
    ),
    per_doc AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS n_bg, SUM(lk_u) AS sum_lk
      FROM lk GROUP BY doc_id
    ),
    L AS MATERIALIZED (
      SELECT doc.lang,
             CAST(1000000 - (CAST(SUM(p.sum_lk) AS BIGINT)
                             // CAST(SUM(p.n_bg) AS BIGINT)) AS BIGINT)
               AS loss_u
      FROM per_doc p JOIN documents doc USING (doc_id)
      GROUP BY doc.lang
    ),
    nd AS (SELECT COUNT(*) AS n FROM L),
    w0 AS MATERIALIZED (
      SELECT lang, loss_u, CAST(1000000 // n AS BIGINT) AS w
      FROM L CROSS JOIN nd
    )"""
    step_sql = ""
    for i in range(steps):
        step_sql += f""",
    a{i} AS (
      SELECT CAST(SUM(w * loss_u) // SUM(w) AS BIGINT) AS avg FROM w{i}
    ),
    r{i} AS MATERIALIZED (
      SELECT lang, loss_u,
             CAST((w * GREATEST(1000000 + {eta_u} * (loss_u - avg), 1))
                  // 1000000 AS BIGINT) AS wr
      FROM w{i} CROSS JOIN a{i}
    ),
    s{i} AS (SELECT SUM(wr) AS sw FROM r{i}),
    w{i + 1} AS MATERIALIZED (
      SELECT lang, loss_u,
             CAST(({smooth_num} * 1000000) // ({smooth_den} * n)
                  + ({smooth_den - smooth_num} * ((wr * 1000000) // sw))
                    // {smooth_den} AS BIGINT) AS w
      FROM r{i} CROSS JOIN s{i} CROSS JOIN nd
    )"""
    return (head + step_sql
            + f"\n    SELECT lang, loss_u, w AS weight_u FROM w{steps}\n")


@workload("q_doremi_weights", oracle=_doremi_oracle(6))
def q_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi domain reweighting (Xie et al. 2023): learn per-language
    sampling weights by Group-DRO multiplicative-weights over per-domain
    bigram-LM excess loss. The distributed work is one LM scoring pass
    (equi-join + per-doc agg over the corpus) and one per-domain
    aggregation; the 6-step weight iteration runs on the domain-cardinality
    mixture itself in exact integer micro-units, so the oracle replays the
    ENTIRE pipeline — LM fit, scoring, domain losses, every weight step —
    bit-exactly in SQL."""
    from delta_sharing_spark.operators.scoring import (
        domain_losses,
        doremi_weights,
        ngram_lm_score,
        ngram_lm_train,
    )

    docs = read_table(spark, sf_dir, "documents")
    lm = ngram_lm_train(docs.filter("doc_id % 10 < 3"), "text")
    scores = ngram_lm_score(docs, lm, "doc_id", "text")
    scored = scores.join(docs.select("doc_id", "lang"), "doc_id")
    losses = domain_losses(scored, "lang")
    return doremi_weights(losses, "lang", steps=6, eta_u=2)
