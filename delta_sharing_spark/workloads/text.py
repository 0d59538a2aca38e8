"""Text-analysis workloads over the ``documents`` table: token statistics,
quality scoring, language identification, fingerprinting.

These are the training-data-pipeline operators (BASELINE.json north_star)
layered on DataFrame primitives. Implementation style: higher-order array
functions (``transform``/``filter``/``aggregate`` over ``split``) — all
JVM-side with whole-stage codegen, no Python UDFs, no explode shuffle for
per-document metrics. At 100 TB each of these is a single map-side pass
followed by one small aggregation shuffle.

DuckDB oracles use the mirror lambdas (``list_transform``/``list_filter``);
ratios are integer/integer divisions in double, bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_sharing_spark.io import read_table
from delta_sharing_spark.workloads import workload

# small stopword lexicons for the language-ID heuristic (public-knowledge
# function words; the heuristic is hit-count argmax with deterministic ties)
LEXICONS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "en": ["the", "a", "of", "and", "is", "to"],
    "es": ["el", "la", "de", "y", "es", "un"],
    "fr": ["le", "la", "de", "et", "est", "un"],
    "zh": ["de", "shi", "he", "zai", "le", "you"],
}

STOPWORDS = ["a", "the", "of", "and", "is", "to", "in", "it"]


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _spark_array(words: list[str]) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


# ------------------------------------------------------------- token stats

@workload(
    "q_text_token_stats",
    oracle="""
    WITH toks AS (
      SELECT source, string_split(text, ' ') AS tokens FROM documents
    )
    SELECT source,
           COUNT(*)                                    AS n_docs,
           CAST(SUM(len(tokens)) AS BIGINT)            AS total_tokens,
           CAST(SUM(len(list_distinct(tokens))) AS BIGINT) AS total_distinct_tokens,
           CAST(SUM(list_aggregate(list_transform(tokens, t -> length(t)),
                                   'sum')) AS BIGINT)  AS total_token_chars,
           MAX(len(tokens))                            AS max_doc_tokens
    FROM toks
    GROUP BY source
    """,
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + per-source token statistics, entirely via
    higher-order functions (one scan, one tiny shuffle)."""
    docs = read_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    token_chars = F.expr(
        "aggregate(transform(split(text, ' '), t -> length(t)), 0L, (acc, x) -> acc + x)"
    )
    return (
        docs.select(
            "source",
            F.size(tokens).alias("n_tok"),
            F.size(F.array_distinct(tokens)).alias("n_dist"),
            token_chars.alias("n_chars_tok"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("n_dist").alias("total_distinct_tokens"),
            F.sum("n_chars_tok").alias("total_token_chars"),
            F.max("n_tok").alias("max_doc_tokens"),
        )
    )


# ----------------------------------------------------------- quality score

@workload(
    "q_text_quality",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             string_split(text, ' ') AS tokens,
             length(text)            AS n_chars
      FROM documents
    )
    SELECT doc_id,
           len(tokens) AS n_tokens,
           CAST(len(list_distinct(tokens)) AS DOUBLE) / len(tokens) AS ttr,
           CAST(len(list_filter(tokens,
                t -> list_contains({_sql_list(STOPWORDS)}, t))) AS DOUBLE)
               / len(tokens)                                        AS stopword_ratio,
           CAST(n_chars AS DOUBLE) / len(tokens)                    AS avg_token_span,
           CASE WHEN len(tokens) >= 20
                 AND CAST(len(list_distinct(tokens)) AS DOUBLE) / len(tokens) > 0.3
                THEN 1 ELSE 0 END                                   AS keep
    FROM m
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals (length, type-token ratio, stopword
    ratio) + a keep/drop gate — the standard pretraining-corpus filter shape
    (Gopher/C4-style heuristics on public record). Pure map-side at scale."""
    docs = read_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    n_tok = F.size(tokens)
    ttr = F.size(F.array_distinct(tokens)).cast("double") / n_tok
    stop_hits = F.expr(
        f"size(filter(split(text, ' '), t -> array_contains({_spark_array(STOPWORDS)}, t)))"
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        ttr.alias("ttr"),
        (stop_hits.cast("double") / n_tok).alias("stopword_ratio"),
        (F.length("text").cast("double") / n_tok).alias("avg_token_span"),
        F.when((n_tok >= 20) & (ttr > 0.3), 1).otherwise(0).alias("keep"),
    )


# -------------------------------------------------------------- language id

_LANG_HIT_SQL_DUCK = ",\n".join(
    f"len(list_filter(tokens, t -> list_contains({_sql_list(words)}, t))) AS hits_{lang}"
    for lang, words in LEXICONS.items()
)
_LANG_HIT_SPARK = {
    lang: f"size(filter(split(text, ' '), t -> array_contains({_spark_array(words)}, t)))"
    for lang, words in LEXICONS.items()
}


@workload(
    "q_text_langid",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    ),
    hits AS (
      SELECT doc_id, {_LANG_HIT_SQL_DUCK}
      FROM toks
    ),
    unp AS (
      SELECT doc_id, lang, hits FROM hits
      UNPIVOT (hits FOR lang IN (hits_de AS 'de', hits_en AS 'en',
                                 hits_es AS 'es', hits_fr AS 'fr',
                                 hits_zh AS 'zh'))
    ),
    ranked AS (
      SELECT doc_id, lang, hits,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY hits DESC, lang) AS rn
      FROM unp
    )
    SELECT doc_id,
           CASE WHEN hits = 0 THEN 'und' ELSE lang END AS pred_lang,
           CAST(hits AS BIGINT) AS hits
    FROM ranked WHERE rn = 1
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic: hit-count argmax over five
    small lexicons with a deterministic (hits desc, lang asc) tiebreak.
    The lexicons travel inside the expression (broadcast-free literal
    arrays); the whole operator is map-side."""
    docs = read_table(spark, sf_dir, "documents")
    hit_cols = [
        F.expr(expr).cast("long").alias(f"hits_{lang}")
        for lang, expr in _LANG_HIT_SPARK.items()
    ]
    with_hits = docs.select("doc_id", *hit_cols)
    # argmax via greatest + chained CASE with asc-lang tiebreak
    langs = sorted(LEXICONS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = None
    for lang in langs:  # first lang (asc) reaching the max wins
        cond = F.col(f"hits_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return with_hits.select(
        "doc_id",
        F.when(best == 0, "und").otherwise(pred).alias("pred_lang"),
        best.alias("hits"),
    )


# ------------------------------------------------------------ fingerprints

# Winnowing parameters (Schleimer/Wilkerson/Aiken, MOSS): K-char shingles
# hashed with a polynomial rolling hash mod a Mersenne prime, window minima
# over W consecutive positions form the fingerprint. Any shared substring
# of length >= W + K - 1 between two documents guarantees a shared
# fingerprint entry — the robustness property a global-min shingle lacks.
WINNOW_K, WINNOW_W = 16, 8
WINNOW_B, WINNOW_M = 257, 2147483647
_WINNOW_POW = [pow(WINNOW_B, WINNOW_K - 1 - j, WINNOW_M)
               for j in range(WINNOW_K)]


def winnow_minima(t: str) -> list[int]:
    """Sorted distinct winnowing minima for one document — the fingerprint
    set before digesting. Shared substrings >= WINNOW_W + WINNOW_K - 1
    chars between two documents guarantee a shared entry."""
    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view

    cp = np.concatenate([
        np.frombuffer(t.encode("utf-32-le"),
                      dtype=np.uint32).astype(np.int64),
        np.zeros(WINNOW_K, dtype=np.int64),
    ])
    n = max(len(t) - (WINNOW_K - 1), 1)
    h = (sliding_window_view(cp, WINNOW_K)[:n]
         * np.array(_WINNOW_POW, dtype=np.int64)
         % WINNOW_M).sum(axis=1) % WINNOW_M
    if n >= WINNOW_W:
        minima = sliding_window_view(h, WINNOW_W).min(axis=1)
    else:
        minima = h.min(keepdims=True)
    return sorted(set(minima.tolist()))


def _winnow_fingerprint_batches(batches):
    """numpy winnowing over Arrow batches, vectorized ACROSS the batch:
    all documents' codepoints concatenate into one array (each doc
    followed by K zero codepoints — exactly the per-doc zero padding of
    ``winnow_minima``, so per-position hashes are identical by
    construction), then ONE sliding_window_view matmul mod M computes
    every document's shingle hashes and ONE global sliding-window min
    yields all window minima; only the final sorted-distinct digest + md5
    stays per-document. r13: the previous per-document loop paid ~20
    small-array numpy calls per ~300-char doc — batch-level vectorization
    measured 3.2x on the map function (0.82 -> 0.26 s for 5000
    corpus-like docs, warm) with bit-identical outputs
    (tests/test_opt_r13.py::TestWinnowBatchVectorization pins equality
    against ``winnow_minima`` incl. short/empty docs).

    Measured at sf0.1 (5000 docs, avg 297 chars): the pure-expression
    variants are interpreted-lambda-bound — md5-per-shingle 2.06 s, of
    which only ~0.4 s is md5 (substr+lambda floor is 1.64 s), and adding
    window minima as expressions costs 3.2 s. This Arrow path computes the
    strictly stronger winnowing fingerprint in ~0.3 s (pre-r13 loop).
    Scale shape: one MapInPandas over the scan — map-only, no shuffle,
    parallelism = partition count."""
    import hashlib

    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    K, W, M = WINNOW_K, WINNOW_W, WINNOW_M
    pows = np.array(_WINNOW_POW, dtype=np.int64)
    for pdf in batches:
        ids, md5s, fps = [], [], []
        vals = pdf["t"].values
        texts = [t for t in vals if t is not None]
        if texts:
            # doc0 + K zeros + doc1 + K zeros + ... ("\0" == codepoint 0)
            big = ("\0" * K).join(texts) + "\0" * K
            cp = np.frombuffer(big.encode("utf-32-le"),
                               dtype=np.uint32).astype(np.int64)
            # cp*pow < 2^52 and the K-term sum < 2^56: exact in int64, and
            # (sum of products) % M == (sum of products % M) % M — the
            # per-term mod of the reference is algebraically redundant.
            # Chunked matmul bounds the strided-view buffer to ~32 MB
            # regardless of Arrow batch size.
            sw = sliding_window_view(cp, K)
            h_all = np.empty(len(sw), dtype=np.int64)
            step = 1 << 18
            for a in range(0, len(sw), step):
                h_all[a:a + step] = (sw[a:a + step] @ pows) % M
            if len(h_all) >= W:
                mins_all = sliding_window_view(h_all, W).min(axis=1)
            else:  # single short doc in the batch
                mins_all = h_all
        start = 0  # char offset of the current doc inside `big`
        for id_, t in zip(pdf["doc_id"].values, vals):
            ids.append(id_)
            if t is None:
                md5s.append(None)
                fps.append(None)
                continue
            md5s.append(hashlib.md5(t.encode("utf-8")).hexdigest())
            n = max(len(t) - (K - 1), 1)
            if n >= W:
                minima = mins_all[start:start + n - W + 1]
            else:
                minima = h_all[start:start + n].min(keepdims=True)
            digest = ",".join(str(v) for v in sorted(set(minima.tolist())))
            fps.append(hashlib.md5(digest.encode()).hexdigest())
            start += len(t) + K
        yield pd.DataFrame(
            {"doc_id": ids, "content_md5": md5s, "winnow_fp": fps})


@workload(
    "q_text_fingerprint",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, regexp_replace(trim(text), ' +', ' ', 'g') AS t
      FROM documents
    ), codes AS (
      SELECT doc_id, t,
             list_concat(
               list_transform(string_split(t, ''), c -> ascii(c)::BIGINT),
               [{", ".join(["0::BIGINT"] * WINNOW_K)}]) AS cp
      FROM norm
    ), hashes AS (
      SELECT doc_id, t,
             list_transform(
               generate_series(1, greatest(length(t) - {WINNOW_K - 1}, 1)),
               i -> list_aggregate(
                      list_transform(generate_series(0, {WINNOW_K - 1}),
                        j -> (cp[i + j] *
                              ([{", ".join(f"{p}::BIGINT" for p in _WINNOW_POW)}])[j + 1])
                             % {WINNOW_M}),
                      'sum') % {WINNOW_M}) AS h
      FROM codes
    )
    SELECT doc_id,
           md5(t) AS content_md5,
           md5(array_to_string(list_sort(list_distinct(
             list_transform(
               generate_series(1, greatest(len(h) - {WINNOW_W - 1}, 1)),
               w -> list_min(h[w:w + {WINNOW_W - 1}])))), ','))
             AS winnow_fp
    FROM hashes
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact content hash (md5 of normalized text)
    plus a winnowing-proper robust fingerprint — polynomial rolling hash
    over 16-char shingles, minima over 8-wide windows, md5 digest of the
    sorted distinct minima. Guarantees shared fingerprint entries for any
    shared substring >= 23 chars (W + K - 1). The per-document hashing is
    vectorized numpy over Arrow batches (see ``_winnow_fingerprint_batches``
    for the measured expression-vs-numpy tradeoff); the DuckDB oracle
    replays the identical hash with list lambdas."""
    docs = read_table(spark, sf_dir, "documents")
    normed = docs.select(
        "doc_id",
        F.regexp_replace(F.trim(F.col("text")), " +", " ").alias("t"),
    )
    return normed.mapInPandas(
        _winnow_fingerprint_batches,
        schema="doc_id long, content_md5 string, winnow_fp string",
    )


# ------------------------------------------------------- token counting

@workload(
    "q_text_token_count",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS tokens FROM documents
    )
    SELECT lang,
           CAST(SUM(len(tokens)) AS BIGINT) AS whitespace_tokens,
           CAST(SUM(list_aggregate(list_transform(tokens,
                    t -> (length(t) + 3) // 4), 'sum')) AS BIGINT)
                                            AS bpe_ish_tokens,
           COUNT(*)                         AS n_docs
    FROM toks GROUP BY lang
    """,
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish estimate
    (ceil(len/4) subword units per token — the classic ~4-chars-per-token
    rule). Sum per language partition."""
    docs = read_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    bpe = F.expr(
        "aggregate(transform(split(text, ' '), t -> (length(t) + 3) div 4), 0L, (acc, x) -> acc + x)"
    )
    return (
        docs.select("lang", F.size(tokens).alias("n_tok"), bpe.alias("n_bpe"))
        .groupBy("lang")
        .agg(
            F.sum("n_tok").alias("whitespace_tokens"),
            F.sum("n_bpe").alias("bpe_ish_tokens"),
            F.count("*").alias("n_docs"),
        )
    )


@workload(
    "q_text_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id < 20
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents) GROUP BY 1
    ),
    n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT tf.doc_id, tf.token, CAST(tf.tf AS BIGINT) AS tf,
           CAST(df.df AS BIGINT) AS df,
           round(tf.tf * ln(n.n::DOUBLE / df.df::DOUBLE), 6) AS tfidf
    FROM tf JOIN df USING (token) CROSS JOIN n
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF term weighting: corpus-wide document frequency joined onto
    per-document term frequency — two aggregations and one broadcast join
    (df table is vocabulary-sized). tfidf rounded to 6 decimals because
    ln() differs by ~1 ulp between the JVM and libm."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    tf = (toks.filter(F.col("doc_id") < 20)
          .groupBy("doc_id", "token").agg(F.count("*").alias("tf")))
    df_tbl = toks.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df"))
    # corpus size as a broadcast single-row aggregate (scalar-subquery
    # shape) — one distributed job, no driver count() round-trip
    n_df = docs.agg(F.count("*").cast("double").alias("__n"))
    return (
        tf.join(F.broadcast(df_tbl), "token")
        .crossJoin(F.broadcast(n_df))
        .select(
            "doc_id", "token", F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round(
                F.col("tf") * F.log(F.col("__n") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )


@workload(
    "q_text_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_transform(range(1, len(tk)),
                            i -> tk[i] || ' ' || tk[i+1]) AS g2,
             list_transform(range(1, len(tk) - 1),
                            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                 AS g3
      FROM t
    ),
    e AS (SELECT doc_id, unnest(g2) AS gg FROM g),
    c AS (SELECT doc_id, gg, COUNT(*) AS n FROM e GROUP BY doc_id, gg),
    tp AS (
      SELECT doc_id, MAX(n) AS top2, SUM(n) AS tot2 FROM c GROUP BY doc_id
    )
    SELECT g.doc_id,
           CAST(tp.top2 AS DOUBLE) / tp.tot2 AS top2_frac,
           CASE WHEN len(g3) = 0 THEN NULL
                ELSE CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)
                     / len(g3) END AS dup3_frac
    FROM g LEFT JOIN tp USING (doc_id)
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition metrics per document — the Gopher repetition-rule family
    adapted to single-line docs: ``top2_frac`` (share of bigrams taken by
    the single most frequent bigram) and ``dup3_frac`` (share of trigrams
    that are repeats). ``dup3_frac`` is a pure per-doc array expression (no
    shuffle); ``top2_frac`` needs the one (doc, bigram) count aggregation a
    per-doc mode fundamentally requires — both map-side-combining hash
    aggs, no window, no driver state. Fractions are int/int divisions in
    double: bit-identical across engines."""
    docs = read_table(spark, sf_dir, "documents") \
        .withColumn("tk", F.split("text", " "))
    d = docs.withColumn(
        "g2",
        F.expr("CASE WHEN size(tk) >= 2 THEN transform("
               "sequence(1, size(tk)-1), "
               "i -> concat(element_at(tk, i), ' ', element_at(tk, i+1))) "
               "ELSE cast(array() as array<string>) END"),
    ).withColumn(
        "g3",
        F.expr("CASE WHEN size(tk) >= 3 THEN transform("
               "sequence(1, size(tk)-2), "
               "i -> concat(element_at(tk, i), ' ', element_at(tk, i+1), "
               "' ', element_at(tk, i+2))) "
               "ELSE cast(array() as array<string>) END"),
    )
    tp = (
        d.select("doc_id", F.explode("g2").alias("gg"))
        .groupBy("doc_id", "gg").agg(F.count("*").alias("n"))
        .groupBy("doc_id").agg(F.max("n").alias("top2"),
                               F.sum("n").alias("tot2"))
    )
    return (
        d.select(
            "doc_id",
            F.when(F.size("g3") == 0, F.lit(None).cast("double"))
            .otherwise((F.size("g3") - F.size(F.array_distinct("g3")))
                       .cast("double") / F.size("g3")).alias("dup3_frac"),
        )
        .join(tp, "doc_id", "left")
        .select("doc_id",
                (F.col("top2").cast("double") / F.col("tot2"))
                .alias("top2_frac"),
                "dup3_frac")
    )


# ------------------------------------------------------------------- PII

# Deterministic PII augmentation used by the PII workloads: the synthetic
# documents contain no natural PII, so the query plants per-doc emails /
# urls / ips / ssn-shaped ids derivable from doc_id — the SAME expression
# in Spark SQL and the DuckDB oracle — making detection counts non-zero
# and redaction exactly verifiable.
_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS {s}) || "
    "'@mail.example.com see http://site' || CAST(doc_id % 7 AS {s}) || "
    "'.example.org/p/' || CAST(doc_id AS {s}) || "
    "' ip 10.' || CAST(doc_id % 200 AS {s}) || "
    "'.0.1 ssn 123-45-' || lpad(CAST(doc_id % 10000 AS {s}), 4, '0')"
)
_AUG_SPARK = _AUG_SQL.format(s="STRING")
_AUG_DUCK = _AUG_SQL.format(s="VARCHAR")

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_URL = r"https?://[A-Za-z0-9./_-]+"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_SSN = r"\b\d{3}-\d{2}-\d{4}\b"


@workload(
    "q_pii_detect",
    oracle=f"""
    WITH aug AS (
      SELECT source, {_AUG_DUCK} AS t FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(t, '{_PII_EMAIL}'))) AS BIGINT)
               AS emails,
           CAST(SUM(len(regexp_extract_all(t, '{_PII_URL}'))) AS BIGINT)
               AS urls,
           CAST(SUM(len(regexp_extract_all(t, '{_PII_IP}'))) AS BIGINT)
               AS ips,
           CAST(SUM(len(regexp_extract_all(t, '{_PII_SSN}'))) AS BIGINT)
               AS ssns,
           CAST(SUM(CASE WHEN len(regexp_extract_all(t, '{_PII_EMAIL}'))
                        + len(regexp_extract_all(t, '{_PII_URL}'))
                        + len(regexp_extract_all(t, '{_PII_IP}'))
                        + len(regexp_extract_all(t, '{_PII_SSN}')) > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii
    FROM aug
    GROUP BY source
    """,
)
def q_pii_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection (operators/pii.py): per-category regex match counts as
    a pure map-side projection — regexp_count inside whole-stage codegen,
    one aggregation shuffle on source. Patterns live in the Java∩RE2
    subset so the DuckDB oracle is bit-identical."""
    from delta_sharing_spark.operators.pii import detect_pii

    docs = read_table(spark, sf_dir, "documents")
    aug = docs.select("source", F.expr(_AUG_SPARK).alias("t"))
    det = detect_pii(aug, "t")
    return det.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("email_count").cast("long").alias("emails"),
        F.sum("url_count").cast("long").alias("urls"),
        F.sum("ipv4_count").cast("long").alias("ips"),
        F.sum("ssn_count").cast("long").alias("ssns"),
        F.sum(F.when(F.col("has_pii"), 1).otherwise(0)).cast("long")
        .alias("docs_with_pii"),
    )


@workload(
    "q_pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT source, {_AUG_DUCK} AS t FROM documents
    ), red AS (
      SELECT source,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                 t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_URL}', '<URL>', 'g'),
                 '{_PII_IP}', '<IP>', 'g'),
                 '{_PII_SSN}', '<SSN>', 'g') AS r
      FROM aug
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(r)) AS BIGINT) AS total_chars,
           CAST(SUM(len(regexp_extract_all(r, '{_PII_EMAIL}'))
                  + len(regexp_extract_all(r, '{_PII_URL}'))
                  + len(regexp_extract_all(r, '{_PII_IP}'))
                  + len(regexp_extract_all(r, '{_PII_SSN}'))) AS BIGINT)
               AS remaining_pii
    FROM red
    GROUP BY source
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: chained regexp_replace in fixed pattern order (one
    codegen'd projection, no shuffle) — verified by re-running detection on
    the redacted text (must find nothing) plus exact redacted lengths."""
    from delta_sharing_spark.operators.pii import pii_counts, redact_pii

    docs = read_table(spark, sf_dir, "documents")
    aug = docs.select("source", F.expr(_AUG_SPARK).alias("t"))
    red = redact_pii(aug, "t", out_col="r").select(
        "source", "r", *pii_counts(F.col("r")))
    return red.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("r")).cast("long").alias("total_chars"),
        F.sum(F.col("email_count") + F.col("url_count")
              + F.col("ipv4_count") + F.col("ssn_count")).cast("long")
        .alias("remaining_pii"),
    )


# -------------------------------------------------------------- profiling

@workload(
    "q_profile_documents",
    oracle="""
    SELECT 'doc_id' AS column,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           CAST(MIN(doc_id) AS VARCHAR) AS min_str,
           CAST(MAX(doc_id) AS VARCHAR) AS max_str,
           AVG(doc_id::DOUBLE) AS mean,
           quantile_cont(doc_id::DOUBLE, 0.5) AS p50
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT n_chars) AS BIGINT),
           CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR),
           AVG(n_chars::DOUBLE), quantile_cont(n_chars::DOUBLE, 0.5)
    FROM documents
    UNION ALL
    SELECT 'lang', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT lang) AS BIGINT),
           MIN(lang), MAX(lang), NULL::DOUBLE, NULL::DOUBLE
    FROM documents
    UNION ALL
    SELECT 'source', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT source) AS BIGINT),
           MIN(source), MAX(source), NULL::DOUBLE, NULL::DOUBLE
    FROM documents
    """,
)
def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (operators/profiling.py): null rates, exact
    distinct counts, ranges, mean and exact median for every profiled
    column out of ONE aggregation job (stack-unpivoted) — the audit pass a
    corpus pipeline runs around each transformation. Integer-valued means
    keep double sums exact, so the oracle matches bit-for-bit."""
    from delta_sharing_spark.operators.profiling import profile_columns

    docs = read_table(spark, sf_dir, "documents")
    return profile_columns(docs, ["doc_id", "n_chars", "lang", "source"])


# ------------------------------------------------------ Gopher-style rules

@workload(
    "q_text_gopher_rules",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, source,
             string_split(text, ' ') AS toks
      FROM documents
    ),
    r AS (
      SELECT doc_id, source, len(toks) AS n_words,
        CASE WHEN len(toks) BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
            AS ok_word_count,
        CASE WHEN len(toks) > 0 AND
             CAST(list_aggregate(list_transform(toks, t -> length(t)),
                                 'sum') AS DOUBLE) / len(toks)
             BETWEEN 3 AND 10 THEN 1 ELSE 0 END AS ok_mean_word_len,
        CASE WHEN len(toks) > 0 AND
             CAST(len(list_filter(toks,
                  t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
             / len(toks) > 0.8 THEN 1 ELSE 0 END AS ok_alpha_ratio,
        CASE WHEN len(list_filter(list_distinct(toks),
                  t -> list_contains({_sql_list(STOPWORDS)}, t))) >= 2
             THEN 1 ELSE 0 END AS ok_stopwords,
        CASE WHEN len(toks) > 0 AND
             CAST(len(list_filter(toks, t -> t = '#' OR t = '...'))
                  AS DOUBLE) / len(toks) < 0.1
             THEN 1 ELSE 0 END AS ok_symbol_ratio
      FROM m
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ok_word_count) AS BIGINT) AS pass_word_count,
           CAST(SUM(ok_mean_word_len) AS BIGINT) AS pass_mean_word_len,
           CAST(SUM(ok_alpha_ratio) AS BIGINT) AS pass_alpha_ratio,
           CAST(SUM(ok_stopwords) AS BIGINT) AS pass_stopwords,
           CAST(SUM(ok_symbol_ratio) AS BIGINT) AS pass_symbol_ratio,
           CAST(SUM(ok_word_count * ok_mean_word_len * ok_alpha_ratio
                    * ok_stopwords * ok_symbol_ratio) AS BIGINT)
               AS pass_all
    FROM r GROUP BY source
    """,
)
def q_text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style (MassiveText, Rae et al. 2021 — public thresholds)
    document quality rules: word count in [50, 100k], mean word length in
    [3, 10], >80% words containing an alphabetic char, ≥2 distinct
    stop-words, <10% symbol tokens. All higher-order array expressions in
    ONE map-side pass + one small aggregation — the per-rule pass counts
    per source, with the conjunction as the keep decision."""
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
    stop_arr = _spark_array(STOPWORDS)
    n_stop = F.expr(
        f"size(filter(array_distinct(split(text, ' ')), "
        f"t -> array_contains({stop_arr}, t)))")
    sym_ratio = (
        F.expr("CAST(size(filter(split(text, ' '), "
               "t -> t = '#' OR t = '...')) AS DOUBLE)") / n
    )
    flag = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    r = docs.select(
        "source",
        flag(n.between(50, 100_000)).alias("ok_wc"),
        flag((n > 0) & mean_len.between(3, 10)).alias("ok_mwl"),
        flag((n > 0) & (alpha_ratio > 0.8)).alias("ok_ar"),
        flag(n_stop >= 2).alias("ok_sw"),
        flag((n > 0) & (sym_ratio < 0.1)).alias("ok_sym"),
    )
    return r.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("ok_wc").cast("long").alias("pass_word_count"),
        F.sum("ok_mwl").cast("long").alias("pass_mean_word_len"),
        F.sum("ok_ar").cast("long").alias("pass_alpha_ratio"),
        F.sum("ok_sw").cast("long").alias("pass_stopwords"),
        F.sum("ok_sym").cast("long").alias("pass_symbol_ratio"),
        F.sum(F.col("ok_wc") * F.col("ok_mwl") * F.col("ok_ar")
              * F.col("ok_sw") * F.col("ok_sym")).cast("long")
        .alias("pass_all"),
    )


@workload(
    "q_quality_classifier",
    oracle="""
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    w AS (
        SELECT tok AS token,
               (('0x' || substr(md5('qw' || tok), 1, 8))::BIGINT % 2000001)
                 - 1000000 AS weight_u
        FROM (SELECT DISTINCT tok FROM toks)
    ),
    s AS (
        SELECT t.doc_id, COUNT(*) AS n_toks,
               CAST(SUM(COALESCE(w.weight_u, 0)) AS BIGINT) AS score_u
        FROM toks t LEFT JOIN w ON t.tok = w.token
        GROUP BY t.doc_id
    )
    SELECT doc_id, n_toks, score_u,
           CAST(score_u AS DOUBLE) / (n_toks * 1000000) AS score,
           score_u * 10 > CAST(n_toks AS BIGINT) * 1000000 AS keep
    FROM s
    """,
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the fastText/CCNet linear-classifier
    stage): inference as ONE token-table equi-join + one aggregate — no
    UDF, no model server. Here the model is a deterministic md5-derived
    lexicon so the oracle replays the exact weights; a real model's
    quantized weights drop in as the same (token, weight_u) table. The
    keep decision (mean weight > 0.1) compares exact integers."""
    from delta_sharing_spark.operators.scoring import (
        WEIGHT_UNIT,
        pseudo_weights,
        score_text_linear,
    )

    docs = read_table(spark, sf_dir, "documents")
    weights = pseudo_weights(docs, "text", salt="qw")
    scored = score_text_linear(docs, weights, "doc_id", "text")
    return scored.withColumn(
        "keep",
        F.col("score_u") * 10
        > F.col("n_toks").cast("bigint") * WEIGHT_UNIT,
    )


@workload(
    "q_lm_filter",
    oracle=f"""
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
      WHERE doc_id % 10 >= 3
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
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(lk_u) AS BIGINT) AS sum_likelihood_u,
           CAST(SUM(lk_u) AS DOUBLE) / COUNT(*) AS avg_likelihood_u
    FROM lk GROUP BY doc_id
    """,
)
def q_lm_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-shape LM quality filtering: train a bigram model on the
    trusted slice (doc_id %% 10 < 3) in one aggregation, score the rest
    via one (ctx, tok) equi-join + per-doc aggregation. The per-bigram
    quantity is the integer-exact add-one-smoothed likelihood (a float
    log-prob is not identically rounded across engines); a real KenLM
    table drops into the same join unchanged. Oracle replays train AND
    inference end to end."""
    from delta_sharing_spark.operators.scoring import (
        ngram_lm_score,
        ngram_lm_train,
    )

    docs = read_table(spark, sf_dir, "documents")
    lm = ngram_lm_train(docs.filter("doc_id % 10 < 3"), "text")
    return ngram_lm_score(docs.filter("doc_id % 10 >= 3"), lm,
                          "doc_id", "text")


def chunk_documents(df: DataFrame, id_col: str, text_col: str, *,
                    size: int, overlap: int = 0) -> DataFrame:
    """RAG-style token-window chunking: split on whitespace and emit one
    row per window of ``size`` tokens, strided by ``size - overlap``.
    The trailing partial window is kept, but a window that would add NO
    new tokens (start >= n_tokens - overlap: its content is entirely the
    previous window's tail) is not emitted. Pure JVM expressions
    (split / sequence / slice / explode), zero Python and zero shuffle:
    chunking a 100 TB corpus is exactly one map-side pass that
    partition-prunes and pushes down like any projection."""
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if not 0 <= overlap < size:
        raise ValueError(
            f"overlap must be in [0, size), got {overlap} for size {size}")
    step = size - overlap
    return df.select(
        F.col(id_col),
        # split() bound once as a lambda variable (operators/scoring._bigrams):
        # inline slice(split(text), …) re-splits the document per window
        F.expr(f"""
        explode(element_at(transform(array(split({text_col}, ' ')), __w ->
          transform(
            sequence(0, greatest(size(__w) - {overlap} - 1, 0), {step}),
            s -> struct(
              CAST(s DIV {step} AS LONG) AS chunk_id,
              array_join(slice(__w, s + 1, {size}), ' ') AS chunk_text,
              size(slice(__w, s + 1, {size})) AS n_tokens))), 1))
        """).alias("c"),
    ).select(id_col, "c.chunk_id", "c.chunk_text",
             F.col("c.n_tokens").cast("long").alias("n_tokens"))


@workload(
    "q_chunk_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    w AS (
      SELECT doc_id,
             CAST(s.s // 16 AS BIGINT) AS chunk_id,
             array_to_string(list_slice(toks, s.s + 1, s.s + 24), ' ')
               AS chunk_text,
             len(list_slice(toks, s.s + 1, s.s + 24)) AS n_tokens
      FROM t, LATERAL (
        SELECT UNNEST(generate_series(
          0, GREATEST(len(toks) - 8 - 1, 0), 16)) AS s) s
    )
    SELECT doc_id, chunk_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           md5(chunk_text) AS chunk_md5
    FROM w
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-window chunking (24-token windows, 8-token
    overlap — sized so the synthetic docs, 10-99 tokens, emit several
    windows each): every chunk's id, token
    count and content digest replay exactly in SQL. The chunk text
    crosses the gate as its md5 so the value check covers the BYTES of
    every window without hashing megabytes of duplicated text through
    pandas."""
    docs = read_table(spark, sf_dir, "documents")
    ch = chunk_documents(docs, "doc_id", "text", size=24, overlap=8)
    return ch.select("doc_id", "chunk_id", "n_tokens",
                     F.md5("chunk_text").alias("chunk_md5"))


@workload(
    "q_pipeline_rag_prep",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    w AS (
      SELECT doc_id,
             CAST(s.s // 16 AS BIGINT) AS chunk_id,
             array_to_string(list_slice(toks, s.s + 1, s.s + 24), ' ')
               AS chunk_text,
             len(list_slice(toks, s.s + 1, s.s + 24)) AS n_tokens
      FROM t, LATERAL (
        SELECT UNNEST(generate_series(
          0, GREATEST(len(toks) - 8 - 1, 0), 16)) AS s) s
    ),
    q AS (SELECT * FROM w WHERE n_tokens >= 8),
    d AS (
      SELECT doc_id, chunk_id, n_tokens, md5(chunk_text) AS chunk_md5,
             ROW_NUMBER() OVER (PARTITION BY md5(chunk_text)
                                ORDER BY doc_id, chunk_id) AS rn,
             COUNT(*) OVER (PARTITION BY md5(chunk_text)) AS n_copies
      FROM q
    )
    SELECT doc_id, chunk_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_copies AS BIGINT) AS n_copies, chunk_md5
    FROM d WHERE rn = 1
    """,
)
def q_pipeline_rag_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed retrieval-corpus prep: token-window chunking (24/8) ->
    tiny-tail quality filter -> exact chunk dedup keeping the first
    (doc_id, chunk_id) occurrence, with each survivor carrying its copy
    count. The dedup window partitions on the chunk's CONTENT HASH, not
    the text — the shuffle key stays 32 bytes however long chunks get,
    and every partition is a duplicate-set (bounded), so the window
    never sees an unpartitioned global sort. Replays end-to-end in
    SQL."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    ch = chunk_documents(docs, "doc_id", "text", size=24, overlap=8) \
        .filter(F.col("n_tokens") >= 8) \
        .withColumn("chunk_md5", F.md5("chunk_text"))
    w = Window.partitionBy("chunk_md5").orderBy("doc_id", "chunk_id")
    wc = Window.partitionBy("chunk_md5")
    return (ch
            .withColumn("rn", F.row_number().over(w))
            .withColumn("n_copies", F.count("*").over(wc))
            .filter(F.col("rn") == 1)
            .select("doc_id", "chunk_id", "n_tokens",
                    F.col("n_copies").cast("long").alias("n_copies"),
                    "chunk_md5"))


@workload(
    "q_lm_filter_kn",
    oracle="""
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
      SELECT ctx, SUM(pair_n) AS ctx_n, COUNT(*) AS n1_ctx
      FROM pairs GROUP BY ctx
    ),
    toks AS (SELECT tok, COUNT(*) AS n1_tok FROM pairs GROUP BY tok),
    np AS (SELECT COUNT(*) AS n_pairs FROM pairs),
    doc_bg AS (
      SELECT doc_id,
             CASE WHEN t.i = 1 THEN '<s>'
                  ELSE string_split(text, ' ')[t.i - 1] END AS ctx,
             string_split(text, ' ')[t.i] AS tok
      FROM documents, LATERAL (
        SELECT UNNEST(generate_series(1, len(string_split(text, ' '))))
        AS i) t
      WHERE doc_id % 10 >= 3
    ),
    lk AS (
      SELECT d.doc_id,
             GREATEST(CASE WHEN c.ctx_n IS NOT NULL THEN
               CAST(GREATEST(4 * COALESCE(p.pair_n, 0) - 3, 0) * 1000000
                    AS BIGINT) // CAST(4 * c.ctx_n AS BIGINT)
               + CAST(3 * c.n1_ctx * COALESCE(t.n1_tok, 0) * 1000000
                      AS BIGINT) // CAST(4 * c.ctx_n * np.n_pairs AS BIGINT)
             ELSE CAST(COALESCE(t.n1_tok, 0) * 1000000 AS BIGINT)
                  // CAST(np.n_pairs AS BIGINT)
             END, 1) AS kn_u
      FROM doc_bg d
      LEFT JOIN pairs p ON p.ctx = d.ctx AND p.tok = d.tok
      LEFT JOIN ctxs c ON c.ctx = d.ctx
      LEFT JOIN toks t ON t.tok = d.tok
      CROSS JOIN np
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(kn_u) AS BIGINT) AS sum_kn_u,
           CAST(SUM(kn_u) AS DOUBLE) / COUNT(*) AS avg_kn_u
    FROM lk GROUP BY doc_id
    """,
)
def q_lm_filter_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney-smoothed LM filtering (the actual KenLM smoothing CCNet
    ships, vs q_lm_filter's add-one baseline): continuation counts
    N1+(v.)/N1+(.w)/N1+(..) fit in three aggregations, and every
    document's likelihood is an exact-integer replay — discount D = 3/4
    kept rational so the discounted + backoff terms are two BIGINT
    divisions per bigram (operators/scoring.py:kn_lm_train/kn_lm_score).
    Oracle replays the full fit AND inference."""
    from delta_sharing_spark.operators.scoring import (
        kn_lm_score,
        kn_lm_train,
    )

    docs = read_table(spark, sf_dir, "documents")
    lm = kn_lm_train(docs.filter("doc_id % 10 < 3"), "text")
    return kn_lm_score(docs.filter("doc_id % 10 >= 3"), lm,
                       "doc_id", "text")


@workload(
    "q_lm_filter_kn3",
    oracle="""
    WITH ref AS (SELECT text FROM documents WHERE doc_id % 10 < 3),
    ref_tg AS (
      SELECT CASE WHEN t.i <= 2 THEN '<s>'
                  ELSE string_split(text, ' ')[t.i - 2] END AS u,
             CASE WHEN t.i = 1 THEN '<s>'
                  ELSE string_split(text, ' ')[t.i - 1] END AS v,
             string_split(text, ' ')[t.i] AS w
      FROM ref, LATERAL (
        SELECT UNNEST(generate_series(1, len(string_split(text, ' '))))
        AS i) t
    ),
    c3 AS (
      SELECT u, v, w, COUNT(*) AS pair_n FROM ref_tg GROUP BY 1, 2, 3
    ),
    ctx2 AS (
      SELECT u, v, SUM(pair_n) AS c2ctx, COUNT(*) AS n1p3
      FROM c3 GROUP BY 1, 2
    ),
    n1bt AS (SELECT v, w, COUNT(*) AS n1b FROM c3 GROUP BY 1, 2),
    mid AS (
      SELECT v, SUM(n1b) AS n1mid, COUNT(*) AS n1p2 FROM n1bt GROUP BY v
    ),
    uni AS (SELECT w, COUNT(*) AS n1uni FROM n1bt GROUP BY w),
    nt AS (SELECT COUNT(*) AS ntot FROM n1bt),
    doc_tg AS (
      SELECT doc_id,
             CASE WHEN t.i <= 2 THEN '<s>'
                  ELSE string_split(text, ' ')[t.i - 2] END AS u,
             CASE WHEN t.i = 1 THEN '<s>'
                  ELSE string_split(text, ' ')[t.i - 1] END AS v,
             string_split(text, ' ')[t.i] AS w
      FROM documents, LATERAL (
        SELECT UNNEST(generate_series(1, len(string_split(text, ' '))))
        AS i) t
      WHERE doc_id % 10 >= 3
    ),
    lk AS (
      SELECT d.doc_id,
             GREATEST(CASE
               WHEN x.c2ctx IS NOT NULL THEN
                 CAST(GREATEST(4 * COALESCE(p.pair_n, 0) - 3, 0) * 1000000
                      AS BIGINT) // CAST(4 * x.c2ctx AS BIGINT)
                 + CAST(3 * x.n1p3
                        * GREATEST(4 * COALESCE(b.n1b, 0) - 3, 0)
                        * 1000000 AS BIGINT)
                     // CAST(16 * x.c2ctx * m.n1mid AS BIGINT)
                 + CAST(9 * x.n1p3 * m.n1p2
                        * (CAST(COALESCE(un.n1uni, 0) * 1000000 AS BIGINT)
                           // CAST(nt.ntot AS BIGINT)) AS BIGINT)
                     // CAST(16 * x.c2ctx * m.n1mid AS BIGINT)
               WHEN m.n1mid IS NOT NULL THEN
                 CAST(GREATEST(4 * COALESCE(b.n1b, 0) - 3, 0) * 1000000
                      AS BIGINT) // CAST(4 * m.n1mid AS BIGINT)
                 + CAST(3 * m.n1p2
                        * (CAST(COALESCE(un.n1uni, 0) * 1000000 AS BIGINT)
                           // CAST(nt.ntot AS BIGINT)) AS BIGINT)
                     // CAST(4 * m.n1mid AS BIGINT)
               ELSE CAST(COALESCE(un.n1uni, 0) * 1000000 AS BIGINT)
                    // CAST(nt.ntot AS BIGINT)
             END, 1) AS kn_u
      FROM doc_tg d
      LEFT JOIN c3 p ON p.u = d.u AND p.v = d.v AND p.w = d.w
      LEFT JOIN ctx2 x ON x.u = d.u AND x.v = d.v
      LEFT JOIN n1bt b ON b.v = d.v AND b.w = d.w
      LEFT JOIN mid m ON m.v = d.v
      LEFT JOIN uni un ON un.w = d.w
      CROSS JOIN nt
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(kn_u) AS BIGINT) AS sum_kn_u,
           CAST(SUM(kn_u) AS DOUBLE) / COUNT(*) AS avg_kn_u
    FROM lk GROUP BY doc_id
    """,
)
def q_lm_filter_kn3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERPOLATED TRIGRAM Kneser-Ney filtering — the KenLM recursion
    at order 3 (the CCNet production shape, one order down): trigram
    discounting backs off into a continuation-bigram model which backs
    off into the continuation-unigram distribution, every count a
    TYPE count (Kneser-Ney's types-not-tokens), every probability two
    nested BIGINT divisions with D = 3/4 rational
    (operators/scoring.py:kn3_lm_train/kn3_lm_score). The full
    three-level fit AND inference replay in one SQL statement."""
    from delta_sharing_spark.operators.scoring import (
        kn3_lm_score,
        kn3_lm_train,
    )

    docs = read_table(spark, sf_dir, "documents")
    lm = kn3_lm_train(docs.filter("doc_id % 10 < 3"), "text")
    return kn3_lm_score(docs.filter("doc_id % 10 >= 3"), lm,
                        "doc_id", "text")


def _bpe_oracle(num_merges: int) -> str:
    """Chained-CTE DuckDB replay of the BPE training loop: per iteration
    one pair-count CTE, one deterministic-argmax CTE, one merge-apply CTE
    (the same iterative-fit-in-SQL pattern as the kmeans oracle)."""
    def pairs(i: int) -> str:
        return f"""
    p{i} AS (
      SELECT l, r, SUM(n) AS pair_n FROM (
        SELECT unnest(a[1:len(a)-1]) AS l, unnest(a[2:len(a)]) AS r, n
        FROM (SELECT string_split(sym, ' ') AS a, n FROM m{i})
        WHERE len(a) >= 2
      ) GROUP BY l, r
    ),
    b{i} AS (SELECT l, r, pair_n FROM p{i}
             ORDER BY pair_n DESC, l, r LIMIT 1)"""

    def apply(i: int) -> str:
        return f"""
    m{i + 1} AS (
      SELECT trim(replace(' ' || sym || ' ',
                          ' ' || b{i}.l || ' ' || b{i}.r || ' ',
                          ' ' || b{i}.l || b{i}.r || ' ')) AS sym, n
      FROM m{i} CROSS JOIN b{i})"""

    ctes = ["""
    m0 AS (
      SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS sym, n FROM (
        SELECT w, COUNT(*) AS n FROM (
          SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
        ) WHERE w <> '' GROUP BY w
      )
    )"""]
    for i in range(num_merges):
        ctes.append(pairs(i))
        if i + 1 < num_merges:
            ctes.append(apply(i))
    selects = [
        f"""SELECT {i} AS rank, l AS "left", r AS "right", l || r AS merged,
            CAST(pair_n AS BIGINT) AS pair_n FROM b{i}"""
        for i in range(num_merges)
    ]
    return ("WITH" + ",".join(ctes) + "\n"
            + "\nUNION ALL\n".join(selects))


def _bpe_encode_oracle(num_merges: int) -> str:
    """Train CTEs (as in ``_bpe_oracle``) + a per-doc encode chain: the
    whole corpus is symbolized and folded through the learned merges in
    rank order, exactly the expression ``bpe_encode`` builds."""
    def pairs(i: int) -> str:
        return f"""
    p{i} AS (
      SELECT l, r, SUM(n) AS pair_n FROM (
        SELECT unnest(a[1:len(a)-1]) AS l, unnest(a[2:len(a)]) AS r, n
        FROM (SELECT string_split(sym, ' ') AS a, n FROM m{i})
        WHERE len(a) >= 2
      ) GROUP BY l, r
    ),
    b{i} AS (SELECT l, r, pair_n FROM p{i}
             ORDER BY pair_n DESC, l, r LIMIT 1)"""

    def apply(i: int) -> str:
        return f"""
    m{i + 1} AS (
      SELECT trim(replace(' ' || sym || ' ',
                          ' ' || b{i}.l || ' ' || b{i}.r || ' ',
                          ' ' || b{i}.l || b{i}.r || ' ')) AS sym, n
      FROM m{i} CROSS JOIN b{i})"""

    ctes = ["""
    m0 AS (
      SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS sym, n FROM (
        SELECT w, COUNT(*) AS n FROM (
          SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
        ) WHERE w <> '' GROUP BY w
      )
    )"""]
    for i in range(num_merges):
        ctes.append(pairs(i))
        ctes.append(apply(i))
    ctes.append("""
    e0 AS (
      SELECT doc_id,
             ' ' || trim(regexp_replace(lower(text), '(.)', '\\1 ', 'g'))
             || ' ' AS s
      FROM documents
    )""")
    for i in range(num_merges):
        ctes.append(f"""
    e{i + 1} AS (
      SELECT doc_id,
             replace(s, ' ' || b{i}.l || ' ' || b{i}.r || ' ',
                        ' ' || b{i}.l || b{i}.r || ' ') AS s
      FROM e{i} CROSS JOIN b{i})""")
    return ("WITH" + ",".join(ctes) + f"""
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           array_to_string(toks, '|') AS tok_str
    FROM (SELECT doc_id,
                 list_filter(string_split(trim(s), ' '), x -> x <> '')
                 AS toks
          FROM e{num_merges})""")


@workload("q_bpe_encode", oracle=_bpe_encode_oracle(6))
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer INFERENCE over the corpus: fold every document
    through the 6 learned merges in rank order and emit its exact token
    sequence (pipe-joined) + count — the full train+encode pipeline
    replayed in SQL. The encode pass is map-only pure-JVM string
    expressions (one chained replace per merge, no shuffle, no UDF); a
    production-size vocab swaps the chain for a rank-dict pandas UDF but
    keeps this map-only shape."""
    from delta_sharing_spark.operators.tokenizer import bpe_encode, bpe_train

    docs = read_table(spark, sf_dir, "documents")
    merges = [tuple(r) for r in
              bpe_train(docs, "text", num_merges=6).collect()]
    enc = bpe_encode(docs, "text", merges)
    return enc.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.array_join("tokens", "|").alias("tok_str"),
    )


@workload("q_bpe_train", oracle=_bpe_oracle(6))
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (Sennrich et al. 2016) over the corpus: the
    first 6 learned merges, value-checked against a chained-CTE SQL
    replay of the whole loop. One corpus-scale aggregation (the word
    frequency table), then every merge iteration is vocabulary-sized —
    the property that makes subword-vocab construction tractable at
    100 TB."""
    from delta_sharing_spark.operators.tokenizer import bpe_train

    docs = read_table(spark, sf_dir, "documents")
    return bpe_train(docs, "text", num_merges=6)


@workload(
    "q_ccnet_buckets",
    oracle="""
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
      SELECT doc_id,
             CAST(1000000 - SUM(lk_u) // COUNT(*) AS BIGINT) AS ppl_u
      FROM lk GROUP BY doc_id
    ),
    ranked AS (
      SELECT d.lang, p.doc_id, p.ppl_u,
             ROW_NUMBER() OVER (PARTITION BY d.lang
                                ORDER BY p.ppl_u, p.doc_id) - 1 AS r,
             COUNT(*) OVER (PARTITION BY d.lang) AS n
      FROM per_doc p JOIN documents d USING (doc_id)
    )
    SELECT lang, doc_id, ppl_u,
           CASE WHEN r >= (2 * n) // 3 THEN 'tail'
                WHEN r >= n // 3 THEN 'middle'
                ELSE 'head' END AS bucket
    FROM ranked
    """,
)
def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2019,
    the stage after LM scoring): per language, documents ordered by
    integer perplexity proxy (LM_UNIT - mean per-bigram likelihood) split
    at exact count tertiles. The Spark plan is the two-phase coarse-range
    rank (no per-language global sort — only the <=2 boundary ranges per
    language pay a window scoped to ~1/256 of the stratum); the oracle
    replays the SAME exact ranks with a plain ROW_NUMBER, proving the
    scale-safe plan computes the textbook semantics."""
    from delta_sharing_spark.operators.sampling import quantile_buckets
    from delta_sharing_spark.operators.scoring import (
        LM_UNIT,
        ngram_lm_score,
        ngram_lm_train,
    )

    docs = read_table(spark, sf_dir, "documents")
    lm = ngram_lm_train(docs.filter("doc_id % 10 < 3"), "text")
    scores = ngram_lm_score(docs, lm, "doc_id", "text")
    ppl = scores.select(
        "doc_id",
        (F.lit(LM_UNIT)
         - F.expr("sum_likelihood_u DIV n_bigrams")).alias("ppl_u"))
    scored = ppl.join(docs.select("doc_id", "lang"), "doc_id")
    # materialize the narrow (doc_id, ppl_u, lang) projection ONCE: the
    # rank machinery makes several passes over its input (range agg,
    # bucket counts, the two labeled outputs), and each would otherwise
    # re-run the whole LM scoring pipeline (measured 7.5 s -> ~3.6 s at
    # sf0.1). At 100 TB this is the same call: checkpoint the 3-column
    # scores, never the corpus text.
    scored = scored.localCheckpoint(eager=True)
    out = quantile_buckets(scored, "lang", "ppl_u", "doc_id")
    return out.select("lang", "doc_id", "ppl_u", "bucket")


@workload(
    "q_text_zipf",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    counts AS (
      SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
    ),
    topk AS (
      SELECT tok, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rnk
      FROM counts
      ORDER BY n DESC, tok LIMIT 100
    ),
    pts AS (
      SELECT rnk,
             CAST(round(ln(rnk) * 1000000) AS BIGINT) AS x_u,
             CAST(round(ln(n) * 1000000) AS BIGINT) AS y_u
      FROM topk
    ),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(x_u) AS BIGINT) AS sx,
             CAST(SUM(y_u) AS BIGINT) AS sy,
             CAST(SUM(x_u * y_u) AS BIGINT) AS sxy,
             CAST(SUM(x_u * x_u) AS BIGINT) AS sxx
      FROM pts
    ),
    corpus AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total_tokens,
             CAST(COUNT(*) AS BIGINT) AS vocab
      FROM counts
    )
    SELECT c.total_tokens, c.vocab, f.k AS k_ranks,
           CAST((f.k * f.sxy - f.sx * f.sy) AS DOUBLE)
             / CAST((f.k * f.sxx - f.sx * f.sx) AS DOUBLE) AS zipf_slope
    FROM fit f CROSS JOIN corpus c
    """,
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency diagnostic: least-squares slope of
    (ln rank, ln count) over the top-100 tokens — natural corpora sit
    near -1; a far-off slope flags template spam or tokenizer damage.
    Plan: one count aggregation, a distributed partial top-k
    (TakeOrderedAndProject — no global sort), a windowless 100-row rank
    (sort_array + posexplode in one JVM expression), and
    an exact-integer regression (each ln term quantized to micro-units at
    the point of computation, all sums BIGINT — partition-order
    independent, so the slope replays bit-exactly modulo the repo-wide
    accepted caveat that JVM and libm ln() agree to the micro-unit
    rounding boundary; same risk class as the DSIR/tfidf quantizations)."""
    docs = read_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    )
    topk = counts.orderBy(F.desc("n"), "tok").limit(100)
    # rank the ≤100-row top-k WITHOUT a window (a windowed rank over the
    # whole result plans as an empty-partition-spec WindowExec whose WARN
    # buries real skew warnings): one collect_list aggregation sorts the
    # 100 structs JVM-side, posexplode's position IS the rank
    ranked = (
        topk.agg(F.sort_array(F.collect_list(
            F.struct((-F.col("n")).alias("negn"), F.col("tok"),
                     F.col("n")))).alias("arr"))
        .select(F.posexplode("arr").alias("pos", "s"))
    )
    pts = ranked.select(
        F.round(F.log((F.col("pos") + 1).cast("double")) * 1_000_000)
        .cast("long").alias("x_u"),
        F.round(F.log(F.col("s.n").cast("double")) * 1_000_000)
        .cast("long").alias("y_u"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x_u").alias("sx"),
        F.sum("y_u").alias("sy"),
        F.sum(F.col("x_u") * F.col("y_u")).alias("sxy"),
        F.sum(F.col("x_u") * F.col("x_u")).alias("sxx"),
    )
    corpus = counts.agg(
        F.sum("n").alias("total_tokens"),
        F.count(F.lit(1)).alias("vocab"),
    )
    return (
        fit.crossJoin(F.broadcast(corpus))
        .select(
            "total_tokens", "vocab", F.col("k").alias("k_ranks"),
            ((F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
             .cast("double")
             / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"))
             .cast("double")).alias("zipf_slope"),
        )
    )


@workload(
    "q_text_heaps",
    oracle="""
    WITH mx AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
    toks AS (
      SELECT d.doc_id, unnest(string_split(d.text, ' ')) AS tok
      FROM documents d
    ),
    firsts AS (
      SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok
    ),
    vocab_by_decile AS (
      SELECT CAST(LEAST((first_doc * 10) // n, 9) AS BIGINT) AS decile,
             COUNT(*) AS new_vocab
      FROM firsts CROSS JOIN mx GROUP BY 1
    ),
    tokens_by_decile AS (
      SELECT CAST(LEAST((doc_id * 10) // n, 9) AS BIGINT) AS decile,
             COUNT(*) AS n_tokens
      FROM toks CROSS JOIN mx GROUP BY 1
    ),
    deciles AS (SELECT UNNEST(generate_series(0, 9)) AS decile)
    SELECT d.decile,
           CAST(SUM(COALESCE(t.n_tokens, 0)) OVER w AS BIGINT)
             AS corpus_tokens,
           CAST(SUM(COALESCE(v.new_vocab, 0)) OVER w AS BIGINT) AS vocab
    FROM deciles d
    LEFT JOIN tokens_by_decile t USING (decile)
    LEFT JOIN vocab_by_decile v USING (decile)
    WINDOW w AS (ORDER BY d.decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_text_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: cumulative distinct-token count
    vs cumulative token count over ten growing corpus prefixes (doc_id
    order). ONE pass: each token's FIRST-occurrence document decides which
    prefix first contains it, so ten vocab sizes come from one
    min-aggregation + a 10-row cumsum — never ten distinct-count rescans
    (the naive formulation is 10 corpus passes; this is the 100 TB
    difference). Sub-linear growth (vocab ~ K * tokens^beta, beta < 1) is
    the expected natural-corpus shape; a near-linear curve flags
    boilerplate-free random text, a flat one template spam."""
    docs = read_table(spark, sf_dir, "documents")
    n = docs.agg((F.max("doc_id") + 1).alias("n"))
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok"))
    firsts = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    decile = lambda c: F.least(  # noqa: E731
        F.expr(f"({c} * 10) DIV __n"), F.lit(9)).cast("long")
    vocab_by = (firsts.crossJoin(F.broadcast(n).withColumnRenamed(
        "n", "__n"))
        .groupBy(decile("first_doc").alias("decile"))
        .agg(F.count(F.lit(1)).alias("new_vocab")))
    tokens_by = (toks.crossJoin(F.broadcast(n).withColumnRenamed(
        "n", "__n"))
        .groupBy(decile("doc_id").alias("decile"))
        .agg(F.count(F.lit(1)).alias("n_tokens")))
    deciles = spark.range(0, 10).select(F.col("id").alias("decile"))
    base = (
        deciles.join(tokens_by, "decile", "left")
        .join(vocab_by, "decile", "left")
        .select("decile",
                F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                F.coalesce("new_vocab", F.lit(0)).alias("new_vocab"))
    )
    # 10-row cumulative sum as a broadcast triangle self-join (decile_b <=
    # decile_a), not a window: a whole-result window plans as an
    # empty-partition-spec WindowExec whose WARN buries real skew warnings
    lower = base.select(F.col("decile").alias("decile_b"),
                        F.col("n_tokens").alias("nt_b"),
                        F.col("new_vocab").alias("nv_b"))
    return (
        base.join(F.broadcast(lower),
                  F.col("decile_b") <= F.col("decile"))
        .groupBy("decile")
        .agg(F.sum("nt_b").alias("corpus_tokens"),
             F.sum("nv_b").alias("vocab"))
    )


# BM25 constants kept RATIONAL so the tf normalization reduces to exact
# integer arithmetic: k1 = 6/5, b = 3/4 (the classic 1.2 / 0.75). With
# T = corpus token count and N = doc count (avgdl = T/N), the per-term
# normalized tf becomes
#   tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl)
#   = 22*T*tf / (10*T*tf + 3*T + 9*dl*N)
# — numerator and denominator both exact BIGINTs well inside 2^53, so the
# one double division is IEEE-correctly-rounded and engine-portable.
BM25_QUERY = ["join", "window", "hash", "stream"]


@workload(
    "q_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
      FROM toks GROUP BY doc_id
    ),
    corpus AS (
      SELECT CAST(SUM(dl) AS BIGINT) AS t_tot,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM dl
    ),
    q AS (SELECT UNNEST({_sql_list(BM25_QUERY)}) AS tok),
    tf AS (
      SELECT toks.doc_id, toks.tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks JOIN q USING (tok)
      GROUP BY toks.doc_id, toks.tok
    ),
    idf AS (
      SELECT tok,
             CAST(round(ln((n_docs - COUNT(DISTINCT doc_id) + 0.5)
                           / (COUNT(DISTINCT doc_id) + 0.5) + 1.0)
                        * 1000000) AS BIGINT) AS idf_u
      FROM tf CROSS JOIN corpus
      GROUP BY tok, n_docs
    ),
    scored AS (
      SELECT tf.doc_id,
             CAST(round(idf.idf_u
                        * (CAST(22 * t_tot * tf AS DOUBLE)
                           / CAST(10 * t_tot * tf + 3 * t_tot
                                  + 9 * dl.dl * n_docs AS DOUBLE)))
                  AS BIGINT) AS term_score_u
      FROM tf
      JOIN idf USING (tok)
      JOIN dl USING (doc_id)
      CROSS JOIN corpus
    )
    SELECT doc_id, CAST(SUM(term_score_u) AS BIGINT) AS score_u
    FROM scored
    GROUP BY doc_id
    ORDER BY score_u DESC, doc_id
    LIMIT 20
    """,
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval over the corpus (Robertson/Sparck-Jones with
    the Lucene idf; k1=1.2, b=0.75): the lexical-retrieval scorer every
    RAG corpus pipeline needs next to the ANN path.

    Plan shape at 100 TB: the query-term filter lands BEFORE the tf
    aggregation (only matching tokens shuffle — the token stream shrinks
    to O(query hits) immediately), document lengths are one map-side
    aggregation, idf is a query-terms-sized table broadcast back in, and
    the top-k is a distributed partial TakeOrderedAndProject — no global
    sort, no window. Scores are micro-unit BIGINTs (per-term rounding of
    an exact-integer-ratio double), so the cross-engine gate is exact and
    the final sum is partition-order independent."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id",
                       F.explode(F.split("text", " ")).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(F.sum("dl").alias("t_tot"),
                    F.count(F.lit(1)).alias("n_docs"))
    # filter FIRST: only query-term tokens ever reach a shuffle
    tf = (toks.filter(F.col("tok").isin(BM25_QUERY))
          .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")))
    idf = (
        tf.groupBy("tok")
        .agg(F.countDistinct("doc_id").alias("df"))
        .crossJoin(F.broadcast(corpus))
        .select(
            "tok",
            F.round(F.log((F.col("n_docs") - F.col("df") + 0.5)
                          / (F.col("df") + 0.5) + 1.0) * 1_000_000)
            .cast("long").alias("idf_u"))
    )
    scored = (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.round(
                F.col("idf_u")
                * ((22 * F.col("t_tot") * F.col("tf")).cast("double")
                   / (10 * F.col("t_tot") * F.col("tf")
                      + 3 * F.col("t_tot")
                      + 9 * F.col("dl") * F.col("n_docs")).cast("double"))
            ).cast("long").alias("term_score_u"))
    )
    return (scored.groupBy("doc_id")
            .agg(F.sum("term_score_u").alias("score_u"))
            .orderBy(F.desc("score_u"), "doc_id").limit(20))


@workload(
    "q_split_stratified",
    oracle="""
    WITH assigned AS (
      SELECT lang, doc_id,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                  THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                  THEN 'val' ELSE 'test' END AS split
      FROM documents
    )
    SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM assigned
    GROUP BY lang, split
    """,
)
def q_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/val/test split (~80/10/10): the
    assignment is a pure function of the stable document id — md5's first
    byte compared against 0xcd (205/256) and 0xe6 (230/256) — so the
    split is reproducible across runs, engines and cluster sizes, never
    sampled state. Map-only until the per-(lang, split) audit aggregation;
    at 100 TB the split column costs one md5 per row and no shuffle (the
    audit counts here are the value gate, not part of the assignment)."""
    docs = read_table(spark, sf_dir, "documents")
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    assigned = docs.select(
        "lang", "doc_id",
        F.when(b < "cd", "train").when(b < "e6", "val")
        .otherwise("test").alias("split"))
    return (assigned.groupBy("lang", "split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("doc_id").alias("sum_ids")))
