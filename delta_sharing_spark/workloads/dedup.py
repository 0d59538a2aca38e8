"""Deduplication workloads over ``documents``: exact, n-gram Jaccard,
MinHash-LSH, SimHash — each bound to a DuckDB oracle that mirrors the exact
same md5-based math, so results hash-match across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_sharing_spark.io import read_table
from delta_sharing_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    decontaminate,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from delta_sharing_spark.workloads import workload

# shared oracle fragments -------------------------------------------------

_DUCK_SHINGLES = """
    list_distinct(list_transform(
      generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
      i -> array_to_string(list_slice(string_split(text, ' '), i::INT, i::INT + 2), ' ')
    ))
"""


@workload(
    "q_dedup_exact",
    oracle="""
    SELECT md5(regexp_replace(trim(text), ' +', ' ', 'g')) AS content_md5,
           MIN(doc_id) AS survivor_id,
           COUNT(*)    AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5-of-normalized-content group-by (one shuffle)."""
    return exact_dedup(read_table(spark, sf_dir, "documents"), "doc_id", "text")


@workload(
    "q_dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents
    ),
    toks AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS common
      FROM toks a JOIN toks b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, common,
           CAST(common AS DOUBLE) / (n_a + n_b - common) AS jaccard
    FROM pairs
    WHERE CAST(common AS DOUBLE) / (n_a + n_b - common) >= 0.5
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact word-3-gram Jaccard >= 0.5 via the
    inverted-index self-join (the scalable candidate generator)."""
    docs = read_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", shingle_k=3,
                               threshold=0.5)


# sig_i = min over shingles of the (i % 4)-th 32-bit slice of md5 seeded by
# i // 4 — mirrors operators.dedup.minhash_signatures' 2-md5 layout exactly
_DUCK_MINHASH_SIGS = ",\n".join(
    f"""list_min(list_transform({{sh}},
        s -> substr(md5('{i // 4}:' || s), {(i % 4) * 8 + 1}, 8)))
        AS sig_{i}"""
    for i in range(8)
).replace("{sh}", "shingles")


@workload(
    "q_dedup_jaccard_capped",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents
    ),
    exploded AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
    ),
    rare AS (
      SELECT s FROM exploded GROUP BY s HAVING COUNT(*) <= 10
    ),
    kept AS (
      SELECT doc_id, s FROM exploded JOIN rare USING (s)
    ),
    sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id
    ),
    toks AS (
      SELECT k.doc_id, k.s, z.n_sh FROM kept k JOIN sizes z USING (doc_id)
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS common
      FROM toks a JOIN toks b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, common,
           CAST(common AS DOUBLE) / (n_a + n_b - common) AS jaccard
    FROM pairs
    WHERE CAST(common AS DOUBLE) / (n_a + n_b - common) >= 0.5
    """,
)
def q_dedup_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard near-dup with a hot-shingle frequency cap (doc-freq <= 10):
    boilerplate shingles are dropped from candidate generation, bounding
    any shingle's join fan-out — the inverted-index skew fix for web-scale
    corpora. Jaccard is exact over the rare-shingle sets."""
    docs = read_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", shingle_k=3,
                               threshold=0.5, max_doc_freq=10)


@workload(
    "q_dedup_minhash_lsh",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents
    ),
    sigs AS (
      SELECT doc_id, {_DUCK_MINHASH_SIGS} FROM sh
    ),
    bands AS (
      SELECT doc_id, 0 AS band_idx, md5(sig_0 || '|' || sig_1) AS h FROM sigs
      UNION ALL
      SELECT doc_id, 1, md5(sig_2 || '|' || sig_3) FROM sigs
      UNION ALL
      SELECT doc_id, 2, md5(sig_4 || '|' || sig_5) FROM sigs
      UNION ALL
      SELECT doc_id, 3, md5(sig_6 || '|' || sig_7) FROM sigs
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.h = b.h AND a.doc_id < b.doc_id
    """,
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (8 seeded-md5 minima) banded 4x2 into LSH buckets; candidate
    pairs = docs sharing any band bucket. Shuffle cost: B keys per doc, no
    quadratic comparison."""
    docs = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=8, shingle_k=3)
    return minhash_lsh_candidates(sigs, "doc_id", num_hashes=8, bands=4)


@workload(
    "q_dedup_minhash_lsh_capped",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents
    ),
    sigs AS (
      SELECT doc_id, {_DUCK_MINHASH_SIGS} FROM sh
    ),
    bands AS (
      SELECT doc_id, 0 AS band_idx, md5(sig_0 || '|' || sig_1) AS h FROM sigs
      UNION ALL
      SELECT doc_id, 1, md5(sig_2 || '|' || sig_3) FROM sigs
      UNION ALL
      SELECT doc_id, 2, md5(sig_4 || '|' || sig_5) FROM sigs
      UNION ALL
      SELECT doc_id, 3, md5(sig_6 || '|' || sig_7) FROM sigs
    ),
    cold AS (
      SELECT band_idx, h FROM bands GROUP BY 1, 2 HAVING COUNT(*) <= 3
    ),
    kept AS (
      SELECT b.doc_id, b.band_idx, b.h FROM bands b JOIN cold USING (band_idx, h)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM kept a JOIN kept b
      ON a.band_idx = b.band_idx AND a.h = b.h AND a.doc_id < b.doc_id
    """,
)
def q_dedup_minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates with the hot-bucket skew cap (max_bucket=3):
    a bucket of k docs emits k*(k-1)/2 pairs, so on a web corpus one
    boilerplate bucket is quadratic — buckets above the cap are dropped
    before the self-join, bounding any bucket's contribution to 3 pairs."""
    docs = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=8, shingle_k=3)
    return minhash_lsh_candidates(sigs, "doc_id", num_hashes=8, bands=4,
                                  max_bucket=3)


@workload(
    "q_dedup_simhash",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (
      SELECT doc_id, md5(tok) AS h FROM toks
    ),
    bits AS (
      SELECT doc_id, h, unnest(generate_series(0, 63)) AS pos FROM hashed
    ),
    weighted AS (
      SELECT doc_id, pos,
             CASE WHEN (
               (strpos('0123456789abcdef', substr(h, (pos // 4)::INT + 1, 1)) - 1)
               // CASE pos % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END
             ) % 2 = 1 THEN 1 ELSE -1 END AS w
      FROM bits
    ),
    sums AS (
      SELECT doc_id, pos, SUM(w) AS s FROM weighted GROUP BY 1, 2
    ),
    fps AS (
      SELECT doc_id,
             string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY pos)
               AS simhash
      FROM sums GROUP BY doc_id
    ),
    buckets AS (
      SELECT doc_id, simhash, b.band_idx,
             substr(simhash, b.band_idx * 16 + 1, 16) AS h
      FROM fps, (SELECT unnest(generate_series(0, 3)) AS band_idx) b
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sh_a, b.simhash AS sh_b
      FROM buckets a JOIN buckets b
        ON a.band_idx = b.band_idx AND a.h = b.h AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           len(list_filter(generate_series(1, 64),
               i -> substr(sh_a, i::INT, 1) <> substr(sh_b, i::INT, 1)))
             AS hamming
    FROM cand
    WHERE len(list_filter(generate_series(1, 64),
              i -> substr(sh_a, i::INT, 1) <> substr(sh_b, i::INT, 1))) <= 8
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 64-bit md5-derived fingerprints, 4-band LSH,
    exact hamming <= 8 verification on candidates only."""
    docs = read_table(spark, sf_dir, "documents")
    fps = simhash_fingerprints(docs, "doc_id", "text", bits=64)
    return simhash_near_pairs(fps, "doc_id", bits=64, bands=4, max_hamming=8)


@workload(
    "q_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents
    ),
    toks AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM toks a JOIN toks b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, a.n_sh, b.n_sh
      HAVING CAST(COUNT(*) AS DOUBLE) / (a.n_sh + b.n_sh - COUNT(*)) >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT d.doc_id,
           LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS component
    FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
    GROUP BY d.doc_id
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: Jaccard >= 0.5 pairs -> connected components via
    min-label propagation (component id = min doc id; singletons map to
    themselves). The oracle computes the same components with a recursive
    transitive-closure CTE."""
    from delta_sharing_spark.operators.dedup import dedup_clusters

    docs = read_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", shingle_k=3,
                                threshold=0.5)
    return dedup_clusters(docs.select("doc_id"), pairs)


@workload(
    "q_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents
    ),
    toks AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM toks a JOIN toks b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, a.n_sh, b.n_sh
      HAVING CAST(COUNT(*) AS DOUBLE) / (a.n_sh + b.n_sh - COUNT(*)) >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comps AS (
      SELECT d.doc_id,
             LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS component
      FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
      GROUP BY d.doc_id
    )
    SELECT c.doc_id, c.component,
           CAST(CASE WHEN ROW_NUMBER() OVER (
                  PARTITION BY c.component
                  ORDER BY d.n_chars DESC, c.doc_id) = 1
                THEN 1 ELSE 0 END AS INT) AS keep
    FROM comps c JOIN documents d ON c.doc_id = d.doc_id
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked survivorship: near-dup clusters (Jaccard >= 0.5 ->
    connected components) keep their LONGEST member (n_chars, doc_id
    tiebreak) instead of the min-id one — the decision real pipelines
    want when duplicate copies differ in completeness. One window over
    the component key on top of the clustering plan."""
    from delta_sharing_spark.operators.dedup import (
        dedup_clusters, dedup_keep_best)

    docs = read_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", shingle_k=3,
                                threshold=0.5)
    comps = dedup_clusters(docs.select("doc_id"), pairs)
    return dedup_keep_best(
        comps, docs.select("doc_id", F.col("n_chars").alias("score")))


@workload(
    "q_pipeline_corpus_prep",
    oracle=f"""
    WITH RECURSIVE quality AS (
      SELECT doc_id, text, string_split(text, ' ') AS tokens FROM documents
    ),
    kept AS (
      SELECT doc_id, text FROM quality
      WHERE len(tokens) >= 20
        AND CAST(len(list_distinct(tokens)) AS DOUBLE) / len(tokens) > 0.3
    ),
    sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM kept
    ),
    toks AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM toks a JOIN toks b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, a.n_sh, b.n_sh
      HAVING CAST(COUNT(*) AS DOUBLE) / (a.n_sh + b.n_sh - COUNT(*)) >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comps AS (
      SELECT k.doc_id,
             LEAST(k.doc_id, COALESCE(MIN(r.dst), k.doc_id)) AS component
      FROM kept k LEFT JOIN reach r ON r.src = k.doc_id
      GROUP BY k.doc_id
    ),
    reps AS (
      SELECT component FROM comps WHERE doc_id = component
    )
    SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_input,
           CAST((SELECT COUNT(*) FROM kept) AS BIGINT)      AS n_quality,
           CAST((SELECT COUNT(*) FROM reps) AS BIGINT)      AS n_final,
           CAST((SELECT SUM(len(string_split(k.text, ' '))) FROM kept k
                 JOIN comps c ON k.doc_id = c.doc_id
                 WHERE k.doc_id = c.component) AS BIGINT)   AS final_tokens
    """,
)
def q_pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus preparation: quality gate (length +
    type-token ratio) -> near-dup clustering -> keep one representative per
    cluster -> corpus summary. Composes the quality, Jaccard, and
    connected-components operators in one lazy plan; the oracle recomputes
    the whole pipeline in SQL."""
    from pyspark.sql import functions as F

    from delta_sharing_spark.operators.dedup import dedup_clusters

    docs = read_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    kept = docs.filter(
        (F.size(tokens) >= 20)
        & (F.size(F.array_distinct(tokens)).cast("double") / F.size(tokens)
           > 0.3)
    ).select("doc_id", "text")
    pairs = ngram_jaccard_pairs(kept, "doc_id", "text", shingle_k=3,
                                threshold=0.5)
    comps = dedup_clusters(kept.select("doc_id"), pairs)
    reps = comps.filter(F.col("doc_id") == F.col("component"))
    final = kept.join(reps.select("doc_id"), "doc_id")
    # one distributed job: single-row aggregates cross-joined, no driver
    # count() round-trips
    return (
        docs.agg(F.count("*").cast("long").alias("n_input"))
        .crossJoin(kept.agg(F.count("*").cast("long").alias("n_quality")))
        .crossJoin(final.agg(
            F.count("*").cast("long").alias("n_final"),
            F.sum(F.size(F.split(F.col("text"), " "))).cast("long")
            .alias("final_tokens"),
        ))
    )


@workload(
    "q_decontaminate",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 12, 1)),
               i -> array_to_string(
                 list_slice(string_split(text, ' '), i::INT, i::INT + 12), ' ')
             ))) AS s
      FROM documents
    ),
    bench_ids AS (
      SELECT doc_id FROM documents
      WHERE ('0x' || substr(md5('bench' || doc_id), 1, 8))::BIGINT
              % 1000000 < 20000
    ),
    b_sh AS (
      SELECT DISTINCT s FROM sh JOIN bench_ids USING (doc_id)
    )
    SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
    FROM sh JOIN b_sh USING (s)
    GROUP BY sh.doc_id
    HAVING COUNT(*) >= 1
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any distinct word
    13-gram with a (hash-selected 2%) benchmark subset. The benchmark
    shingle set broadcasts; the corpus streams through the join — one pass
    over the training text at any scale."""
    from delta_sharing_spark.operators.sampling import hash_bucket

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(hash_bucket("doc_id", salt="bench") < 20_000)
    return decontaminate(docs, bench, "doc_id", "text", shingle_k=13)


@workload(
    "q_decontaminate_ratio",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 7, 1)),
               i -> array_to_string(
                 list_slice(string_split(text, ' '), i::INT, i::INT + 7), ' ')
             ))) AS s
      FROM documents
    ),
    bench_ids AS (
      SELECT doc_id FROM documents
      WHERE ('0x' || substr(md5('bench' || doc_id), 1, 8))::BIGINT
              % 1000000 < 20000
    ),
    b_sh AS (
      SELECT DISTINCT s FROM sh JOIN bench_ids USING (doc_id)
    ),
    train_sh AS (
      SELECT sh.doc_id, sh.s FROM sh
      WHERE sh.doc_id NOT IN (SELECT doc_id FROM bench_ids)
    ),
    agg AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hit
      FROM train_sh t LEFT JOIN b_sh b USING (s)
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_shingles, n_hit,
           n_hit::DOUBLE / n_shingles::DOUBLE AS contamination,
           CASE WHEN n_hit::DOUBLE / n_shingles::DOUBLE >= 0.5
                THEN 0 ELSE 1 END AS keep
    FROM agg
    """,
)
def q_decontaminate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded decontamination (the GPT-3/PaLM/Llama 8-gram collision-RATIO
    rule): for every non-benchmark document, the fraction of its distinct
    word 8-grams occurring in the (hash-selected 2%) benchmark subset;
    docs at ≥50% are dropped. Exact/near duplicates of benchmark docs
    score ~1.0, paraphrases score in between, clean docs 0 — one row per
    training doc either way. The ratio is an integer/integer division in
    double (bit-identical in SQL), so the keep decision replays exactly."""
    from delta_sharing_spark.operators.dedup import decontaminate_ratio
    from delta_sharing_spark.operators.sampling import hash_bucket

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(hash_bucket("doc_id", salt="bench") < 20_000)
    train = docs.filter(hash_bucket("doc_id", salt="bench") >= 20_000)
    return decontaminate_ratio(train, bench, "doc_id", "text",
                               shingle_k=8, max_ratio=0.5)


_BLOOM_M = 1 << 14  # small enough that false positives actually occur


def _duck_bloom_pos(col: str, i: int) -> str:
    return (f"(('0x' || substr(md5({col} || '#b{i}'), 1, 12))::BIGINT"
            f" % {_BLOOM_M})")


@workload(
    "q_decontaminate_bloom",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 12, 1)),
               i -> array_to_string(
                 list_slice(string_split(text, ' '), i::INT, i::INT + 12), ' ')
             ))) AS s
      FROM documents
    ),
    bench_ids AS (
      SELECT doc_id FROM documents
      WHERE ('0x' || substr(md5('bench' || doc_id), 1, 8))::BIGINT
              % 1000000 < 20000
    ),
    b_sh AS (
      SELECT DISTINCT s FROM sh JOIN bench_ids USING (doc_id)
    ),
    bitmap AS (
      SELECT p // 32 AS w,
             bit_or(1::BIGINT << (p % 32)::INT) AS bits
      FROM (
        SELECT DISTINCT unnest([{_duck_bloom_pos('s', 0)},
                                {_duck_bloom_pos('s', 1)},
                                {_duck_bloom_pos('s', 2)},
                                {_duck_bloom_pos('s', 3)}]) AS p
        FROM b_sh
      ) GROUP BY 1
    ),
    probes AS (
      SELECT doc_id, s,
             unnest([{_duck_bloom_pos('s', 0)},
                     {_duck_bloom_pos('s', 1)},
                     {_duck_bloom_pos('s', 2)},
                     {_duck_bloom_pos('s', 3)}]) AS p
      FROM sh
    ),
    cand AS (
      SELECT doc_id, s
      FROM probes LEFT JOIN bitmap ON bitmap.w = probes.p // 32
      GROUP BY doc_id, s
      HAVING SUM(CASE WHEN bitmap.bits IS NOT NULL AND
                 (bitmap.bits & (1::BIGINT << (p % 32)::INT)) <> 0
                 THEN 1 ELSE 0 END) = 4
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overlap
    FROM cand c LEFT JOIN b_sh b USING (s)
    GROUP BY c.doc_id
    """,
)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination: the bench shingles fold into a
    FIXED-SIZE bitmap (16384 bits packed 32-per-long — deliberately small
    so false positives occur and the exact verify stage is visibly load-
    bearing); the corpus probes it with 4 md5 positions and only
    candidates pay the string verify. The oracle replays the ENTIRE
    bitmap (bit_or words, shifts, containment) plus the verify in SQL —
    the bitmaps are bit-identical across engines."""
    from delta_sharing_spark.operators.dedup import bloom_decontaminate
    from delta_sharing_spark.operators.sampling import hash_bucket

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(hash_bucket("doc_id", salt="bench") < 20_000)
    return bloom_decontaminate(docs, bench, "doc_id", "text",
                               shingle_k=13, m_bits=_BLOOM_M, num_hashes=4)


@workload(
    "q_dedup_incremental",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents
    ),
    sigs AS (
      SELECT doc_id, {_DUCK_MINHASH_SIGS} FROM sh
    ),
    bands AS (
      SELECT doc_id, 0 AS band_idx, md5(sig_0 || '|' || sig_1) AS h FROM sigs
      UNION ALL
      SELECT doc_id, 1, md5(sig_2 || '|' || sig_3) FROM sigs
      UNION ALL
      SELECT doc_id, 2, md5(sig_4 || '|' || sig_5) FROM sigs
      UNION ALL
      SELECT doc_id, 3, md5(sig_6 || '|' || sig_7) FROM sigs
    )
    SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
    FROM bands n JOIN bands c
      ON n.band_idx = c.band_idx AND n.h = c.h
    WHERE n.doc_id % 7 = 0 AND c.doc_id % 7 <> 0
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: the corpus (doc_id % 7 != 0) is represented ONLY
    by its stored MinHash band index; the new batch (doc_id % 7 = 0)
    computes signatures for itself alone and joins its bands against the
    index — no corpus text rescans, the O(new batch) shape a continuously
    ingesting 100 TB corpus needs."""
    from delta_sharing_spark.operators.dedup import (
        incremental_dedup_candidates,
        minhash_band_index,
    )

    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 7 != 0")
    new = docs.filter("doc_id % 7 = 0")
    index = minhash_band_index(
        minhash_signatures(corpus, "doc_id", "text", num_hashes=8,
                           shingle_k=3),
        "doc_id", num_hashes=8, bands=4)
    return incremental_dedup_candidates(new, index, "doc_id", "text",
                                        num_hashes=8, bands=4, shingle_k=3)


_DUCK_CDC_BOUNDS = """
    CASE WHEN length(t) >= 8 THEN
      list_filter(
        list_transform(generate_series(8, length(t)),
          i -> CASE WHEN ('0x' || substr(md5(substr(t, i::INT - 7, 8)),
                          1, 8))::BIGINT % 256 = 0 THEN i ELSE -1 END),
        x -> x > 0)
    ELSE [] END
"""


@workload(
    "q_chunk_dedup",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, text AS t FROM documents),
    c AS (
      SELECT doc_id, source,
        unnest(list_filter(
          list_transform(
            generate_series(1, len(list_concat([0], {_DUCK_CDC_BOUNDS}))),
            k -> {{'idx': k,
                  'text': substr(t,
                    (list_concat([0], {_DUCK_CDC_BOUNDS}))[k::INT] + 1,
                    (list_concat({_DUCK_CDC_BOUNDS},
                                 [length(t)]))[k::INT]
                      - (list_concat([0], {_DUCK_CDC_BOUNDS}))[k::INT])}}),
          c -> length(c.text) > 0)) AS ch
      FROM d
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT md5(ch.text)) AS BIGINT) AS n_distinct,
           CAST(SUM(length(ch.text)) AS BIGINT) AS sum_len,
           CAST(MAX(length(ch.text)) AS BIGINT) AS max_len
    FROM c GROUP BY source
    """,
)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + sub-document dedup: documents split at
    rolling md5-window boundaries (boundaries move with content), chunks
    deduplicated by hash across the corpus — the granularity at which
    shared boilerplate dedups even when full documents differ."""
    from delta_sharing_spark.operators.dedup import content_defined_chunks

    docs = read_table(spark, sf_dir, "documents")
    chunks = content_defined_chunks(
        docs.select("doc_id", "source", "text"), "doc_id", "text",
        window=8, avg_size=256)
    src = docs.select("doc_id", "source")
    return (
        chunks.join(F.broadcast(src), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.countDistinct("chunk_md5").cast("long").alias("n_distinct"),
            F.sum(F.length("chunk_text")).cast("long").alias("sum_len"),
            F.max(F.length("chunk_text")).cast("long").alias("max_len"),
        )
    )


@workload(
    "q_pipeline_corpus_prep_v2",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, text, n_chars,
             string_split(text, ' ') AS t FROM documents
    ),
    quality AS (
      -- Gopher-style gate: word count, mean word length, alpha ratio
      SELECT doc_id, lang, text, n_chars FROM toks
      WHERE len(t) BETWEEN 50 AND 100000
        AND CAST(list_aggregate(list_transform(t, x -> length(x)),
                 'sum') AS DOUBLE) / len(t) BETWEEN 3 AND 10
        AND CAST(len(list_filter(t,
                 x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
            / len(t) > 0.8
    ),
    dedup AS (
      -- exact dedup: min-doc_id survivor per normalized content hash
      SELECT MIN(doc_id) AS doc_id FROM quality
      GROUP BY md5(regexp_replace(trim(text), ' +', ' ', 'g'))
    ),
    d AS (
      SELECT q.doc_id, q.lang, q.n_chars
      FROM quality q JOIN dedup USING (doc_id)
    ),
    c AS (SELECT lang, COUNT(*) AS n FROM d GROUP BY lang),
    m AS (SELECT MIN(n) AS n_min FROM c),
    thr AS (
      SELECT lang, FLOOR(1000000 * sqrt(n_min::DOUBLE / n::DOUBLE)) AS thr
      FROM c, m
    ),
    resampled AS (
      SELECT d.doc_id, d.lang, d.n_chars
      FROM d JOIN thr USING (lang)
      WHERE ('0x' || substr(md5('temp' || d.doc_id), 1, 8))::BIGINT
            % 1000000 < thr.thr
    ),
    s AS (
      SELECT lang, n_chars,
             CASE WHEN ('0x' || substr(md5('split' || doc_id), 1, 8))::BIGINT
                       % 1000000 < 900000
                  THEN 'train' ELSE 'val' END AS split
      FROM resampled
    )
    SELECT lang, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM s GROUP BY lang, split
    """,
)
def q_pipeline_corpus_prep_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus prep v2 — the round-3 operators composed end to end:
    Gopher-style quality gate -> exact dedup (min-id survivors) ->
    temperature (alpha=0.5) language rebalancing -> deterministic 90/10
    split -> per-(lang, split) accounting. Every stage is replayed by the
    oracle at per-document granularity, so the whole pipeline — not just
    its pieces — is value-verified."""
    from delta_sharing_spark.operators.dedup import exact_dedup
    from delta_sharing_spark.operators.sampling import (
        split_assign,
        temperature_resample,
    )

    docs = read_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    mean_len = (
        F.expr("CAST(aggregate(transform(split(text, ' '), "
               "t -> length(t)), 0, (a, x) -> a + x) AS DOUBLE)") / n
    )
    alpha_ratio = (
        F.expr("CAST(size(filter(split(text, ' '), "
               "t -> t rlike '[A-Za-z]')) AS DOUBLE)") / n
    )
    quality = docs.filter(
        n.between(50, 100_000) & mean_len.between(3, 10)
        & (alpha_ratio > 0.8))
    survivors = exact_dedup(quality, "doc_id", "text") \
        .select(F.col("survivor_id").alias("doc_id"))
    deduped = quality.join(survivors, "doc_id")
    resampled = temperature_resample(deduped, "lang", "doc_id", salt="temp")
    split = split_assign(resampled, "doc_id",
                         [("train", 0.9), ("val", 0.1)], salt="split")
    return split.groupBy("lang", "split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


@workload(
    "q_dedup_lines",
    oracle="""
    WITH segs AS (
        SELECT doc_id, u.seg, u.ord
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
             LATERAL (SELECT UNNEST(l) AS seg,
                             UNNEST(generate_series(1, len(l))) AS ord) u
    ),
    freq AS (SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY seg),
    tot AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
    dropped AS (
        SELECT seg FROM freq, tot WHERE df > GREATEST(2.0, 0.5 * n)
    ),
    kept AS (
        SELECT s.doc_id, s.seg, s.ord
        FROM segs s ANTI JOIN dropped d USING (seg)
    ),
    re AS (
        SELECT doc_id, string_agg(seg, ' ' ORDER BY ord) AS cleaned_text,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(re.cleaned_text, '') AS cleaned_text,
           CAST(COALESCE(re.n_kept, 0) AS BIGINT) AS n_kept,
           len(string_split(d.text, ' '))
             - CAST(COALESCE(re.n_kept, 0) AS BIGINT) AS n_dropped
    FROM documents d LEFT JOIN re USING (doc_id)
    """,
)
def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level corpus dedup (the CCNet/RefinedWeb line-dedup stage,
    exercised at word granularity — the testdata has no newlines): segments
    occurring in more than half the corpus are boilerplate and are cut,
    documents reassembled in order. The oracle replays the document-
    frequency threshold, the anti-join, and the ordered reassembly."""
    from delta_sharing_spark.operators.dedup import dedup_segments

    docs = read_table(spark, sf_dir, "documents")
    return dedup_segments(docs, "doc_id", "text", delim=" ",
                          max_doc_frac=0.5, min_docs=2)


@workload(
    "q_dedup_substrings",
    oracle="""
    WITH grams AS (
        SELECT doc_id, t.i AS pos, substring(text, t.i::INT + 1, 20) AS gram
        FROM documents,
             LATERAL (SELECT UNNEST(generate_series(0, length(text) - 20))
                      AS i) t
        WHERE length(text) >= 20
    ),
    dup AS (
        SELECT gram FROM grams GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
    flagged AS (
        SELECT doc_id, pos,
               CASE WHEN MAX(pos + 20) OVER (
                          PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         IS NULL
                      OR pos > MAX(pos + 20) OVER (
                          PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_i
        FROM hits
    ),
    numbered AS (
        SELECT doc_id, pos,
               SUM(new_i) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM flagged
    ),
    spans AS (
        SELECT doc_id, island, MAX(pos) + 20 - MIN(pos) AS span_len
        FROM numbered GROUP BY doc_id, island
    )
    SELECT doc_id, COUNT(*) AS n_dup_spans,
           CAST(SUM(span_len) AS BIGINT) AS dup_chars
    FROM spans GROUP BY doc_id
    """,
)
def q_dedup_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate spans (k-gram inverted-index adaptation
    of suffix-array training-data dedup): 20-char grams shared by ≥2
    documents, merged per document into maximal islands. The oracle
    replays the gram index, the island numbering, and the span math
    window-for-window."""
    from delta_sharing_spark.operators.dedup import duplicate_spans

    docs = read_table(spark, sf_dir, "documents")
    return duplicate_spans(docs, "doc_id", "text", k=20, min_docs=2)


@workload(
    "q_dedup_substrings_suffix",
    oracle="""
    WITH grams AS (
        SELECT doc_id, t.i AS pos, substring(text, t.i::INT + 1, 25) AS gram
        FROM documents,
             LATERAL (SELECT UNNEST(generate_series(0, length(text) - 25))
                      AS i) t
        WHERE length(text) >= 25
    ),
    dup AS (
        SELECT gram FROM grams GROUP BY gram
        HAVING MIN(doc_id) <> MAX(doc_id)
    ),
    hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
    flagged AS (
        SELECT doc_id, pos,
               CASE WHEN MAX(pos + 25) OVER (
                          PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         IS NULL
                      OR pos > MAX(pos + 25) OVER (
                          PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_i
        FROM hits
    ),
    numbered AS (
        SELECT doc_id, pos,
               SUM(new_i) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM flagged
    ),
    spans AS (
        SELECT doc_id, island, MAX(pos) + 25 - MIN(pos) AS span_len
        FROM numbered GROUP BY doc_id, island
    )
    SELECT doc_id, COUNT(*) AS n_dup_spans,
           CAST(SUM(span_len) AS BIGINT) AS dup_chars
    FROM spans GROUP BY doc_id
    """,
)
def q_dedup_substrings_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-automaton exact duplicate spans (winnowing-complete candidate
    pairs + per-pair matching statistics, operators/dedup.py
    duplicate_spans_exact): stride=1 fidelity at winnowed shuffle cost.
    The oracle replays the EQUIVALENT stride-1 25-gram island formulation —
    a common substring of length L >= 25 covers the same chars as its
    L-24 shared 25-grams, so counts and span chars match exactly."""
    from delta_sharing_spark.operators.dedup import duplicate_spans_exact

    docs = read_table(spark, sf_dir, "documents")
    return duplicate_spans_exact(docs, "doc_id", "text", min_len=25)


@workload(
    "q_dedup_cut",
    oracle="""
    WITH grams AS (
        SELECT doc_id, t.i AS pos, substring(text, t.i::INT + 1, 20) AS gram
        FROM documents,
             LATERAL (SELECT UNNEST(generate_series(0, length(text) - 20))
                      AS i) t
        WHERE length(text) >= 20
    ),
    dup AS (
        SELECT gram FROM grams GROUP BY gram
        HAVING MIN(doc_id) <> MAX(doc_id)
    ),
    hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
    flagged AS (
        SELECT doc_id, pos,
               CASE WHEN MAX(pos + 20) OVER (
                          PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         IS NULL
                      OR pos > MAX(pos + 20) OVER (
                          PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_i
        FROM hits
    ),
    numbered AS (
        SELECT doc_id, pos,
               SUM(new_i) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM flagged
    ),
    islands AS (
        SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 20 AS e
        FROM numbered GROUP BY doc_id, island
    ),
    segs AS (
        SELECT doc_id, s, e,
               lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY s) AS prev_e
        FROM islands
    ),
    pieces AS (
        SELECT g.doc_id, g.s AS ord,
               substring(d.text, g.prev_e + 1, g.s - g.prev_e) AS piece
        FROM segs g JOIN documents d USING (doc_id)
        UNION ALL
        SELECT m.doc_id, 2147483647, substring(d.text, m.max_e + 1)
        FROM (SELECT doc_id, MAX(e) AS max_e FROM islands
              GROUP BY doc_id) m
        JOIN documents d USING (doc_id)
    ),
    cleaned AS (
        SELECT doc_id, string_agg(piece, '' ORDER BY ord) AS clean_text
        FROM pieces GROUP BY doc_id
    ),
    acc AS (
        SELECT doc_id, COUNT(*) AS n_cut, SUM(e - s) AS removed_chars
        FROM islands GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(c.clean_text, d.text) AS clean_text,
           CAST(COALESCE(a.n_cut, 0) AS BIGINT) AS n_cut,
           CAST(COALESCE(a.removed_chars, 0) AS BIGINT) AS removed_chars
    FROM documents d
    LEFT JOIN cleaned c USING (doc_id)
    LEFT JOIN acc a USING (doc_id)
    """,
)
def q_dedup_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUT step of exact-substring dedup: every duplicated 20-gram
    island removed from each document's text (Lee et al. 2021 semantics),
    untouched documents pass through. The oracle replays the island
    computation AND the string surgery (gap segments + tail, ordered
    string_agg) value-for-value — the cleaned TEXT itself is hash-checked,
    not just the accounting."""
    from delta_sharing_spark.operators.dedup import remove_duplicate_spans

    docs = read_table(spark, sf_dir, "documents")
    return remove_duplicate_spans(docs, "doc_id", "text", k=20, min_docs=2)
