"""Advanced operator workloads: as-of join, pivot, multimodal plumbing —
each oracle-checked in DuckDB (ASOF JOIN, FILTER aggregation, md5 math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_sharing_spark.io import read_table
from delta_sharing_spark.operators.partitioning import (
    spread_to_parallelism as _spread,
)
from delta_sharing_spark.operators.joins import asof_join
from delta_sharing_spark.operators.multimodal import (
    fake_decode_media,
    sample_frames,
    with_media_column,
)
from delta_sharing_spark.workloads import workload

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@workload(
    "q_asof_click_purchase",
    oracle="""
    SELECT c.event_id,
           p.event_id AS purchase_event_id,
           CAST(p.value AS DOUBLE) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)
def q_asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the user's most recent purchase at or
    before it. Union + running-last-value: one shuffle on user_id, linear
    per-partition scan (see operators/joins.py; DuckDB's native ASOF JOIN
    is the oracle)."""
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof_join(
        clicks, purchases, on="user_id", left_time="ts", right_time="ts",
        right_payload=["event_id", "value"],
    )
    return out.select(
        "event_id",
        F.col("event_id_right").alias("purchase_event_id"),
        F.col("value_right").cast("double").alias("purchase_value"),
    )


@workload(
    "q_events_pivot",
    oracle=f"""
    SELECT user_id % 10 AS user_bucket,
           {", ".join(
               f"CAST(SUM(CAST(value AS DECIMAL(12,2))) "
               f"FILTER (event_type = '{t}') AS DOUBLE) AS {t}"
               for t in EVENT_TYPES)}
    FROM events
    GROUP BY 1
    """,
)
def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: event-type columns per user bucket (conditional aggregation
    under the hood — one shuffle, no per-value scans)."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.sum(F.expr("CAST(value AS DECIMAL(12,2))")).cast("double"))
    )


_HEXVAL = "(strpos('0123456789abcdef', substr(d, {i}, 1)) - 1)"


def _hex_byte(i: int) -> str:
    return f"({_HEXVAL.format(i=i)} * 16 + {_HEXVAL.format(i=i + 1)})"


@workload(
    "q_multimodal_decode",
    oracle=f"""
    WITH h AS (SELECT doc_id, length(text) AS n_bytes, md5(text) AS d
               FROM documents)
    SELECT doc_id, CAST(n_bytes AS INT) AS n_bytes,
           CAST(1 + {_hex_byte(1)} AS INT)                AS width,
           CAST(1 + {_hex_byte(3)} AS INT)                AS height,
           CAST(1 + {_HEXVAL.format(i=5)} % 4 AS INT)     AS channels,
           'fake/' || substr(d, 6, 1)                     AS format
    FROM h
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: pack text into the opaque binary
    media struct, run the Arrow-batched mapInPandas decoder (deterministic
    md5-derived fake — the real codec is a drop-in), verify every metadata
    field against the oracle recomputing the same math in SQL."""
    docs = read_table(spark, sf_dir, "documents")
    media = with_media_column(docs, "text")
    return fake_decode_media(media, "media", "doc_id")


@workload(
    "q_multimodal_frames",
    oracle="""
    WITH idx AS (
      SELECT doc_id, text,
             unnest(generate_series(
               1, least(ceil(length(text) / 64.0), 8)::BIGINT)) AS i
      FROM documents
    )
    SELECT doc_id,
           CAST(i - 1 AS INT) AS frame_idx,
           md5(substr(text, ((i - 1) * 64 + 1)::INT, 64)) AS frame_md5
    FROM idx
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: fixed-size chunking of the opaque payload
    with frame indices, all JVM-side."""
    docs = read_table(spark, sf_dir, "documents")
    media = with_media_column(docs, "text")
    frames = sample_frames(media, "media", "doc_id", frame_bytes=64,
                           max_frames=8)
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.md5("frame_bytes").alias("frame_md5"),
    )


@workload(
    "q_multimodal_jpeg",
    oracle="""
    WITH g AS (
      SELECT doc_id, 1 + doc_id % 3 AS wb, 1 + doc_id % 2 AS hb
      FROM documents
    ), b AS (
      SELECT doc_id, wb, hb,
             (i % wb) AS bx, (i // wb) AS by,
             (doc_id * 31 + (i % wb) * 7 + (i // wb) * 13) % 256 AS v
      FROM g, LATERAL UNNEST(generate_series(0, wb * hb - 1)) AS t(i)
    )
    SELECT doc_id,
           CAST(8 * wb AS INT) AS width,
           CAST(8 * hb AS INT) AS height,
           CAST(1 AS INT) AS channels,
           CAST(64 * wb * hb AS BIGINT) AS n_pixels,
           CAST(64 * SUM(v) AS BIGINT) AS sum_px,
           CAST(64 * SUM(v * v) AS BIGINT) AS sum_sq,
           CAST(SUM(v * (64 + 8 * (64 * bx + 28)
                         + 64 * wb * (64 * by + 28))) AS BIGINT) AS wsum
    FROM b GROUP BY doc_id, wb, hb
    """,
)
def q_multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode in the distributed path: synthesize
    baseline-JPEG bytes per doc (per-block-constant grayscale + all-ones
    quant tables make the transform round trip bit-exact), entropy-decode
    + IDCT them back through the vendored pure-python codec
    (operators/jpeg.py) inside Arrow-batched mapInPandas, and emit
    integer-exact pixel aggregates (sum, sum of squares, position-weighted
    sum) that the oracle replays from the block math in SQL — the image
    twin of q_audio_features. Map-only: no shuffle between synthesis and
    features."""
    from delta_sharing_spark.operators.jpeg import (
        jpeg_features,
        synth_jpeg_column,
    )

    docs = _spread(
        read_table(spark, sf_dir, "documents").select("doc_id"))
    imgs = synth_jpeg_column(docs, "doc_id")
    return (jpeg_features(imgs, "image", "doc_id")
            .filter(F.col("error").isNull()).drop("error"))


@workload(
    "q_image_near_dup",
    oracle="""
    WITH b AS (
      SELECT doc_id, i,
             CASE WHEN i = ((doc_id % 8) * 2 + doc_id // 8) % 16
                  THEN ((doc_id // 8) * 37 + i * 7
                        + ((doc_id // 8) % 16) * i * i
                        + (doc_id % 5) * 40) % 256
                  ELSE ((doc_id // 8) * 37 + i * 7
                        + ((doc_id // 8) % 16) * i * i) % 256
             END AS v
      FROM documents, LATERAL UNNEST(generate_series(0, 15)) AS t(i)
    ), tot AS (
      SELECT doc_id, SUM(v) AS tv FROM b GROUP BY doc_id
    ), h AS (
      SELECT b.doc_id,
             CAST(SUM(CASE WHEN 16 * b.v > t.tv
                           THEN CAST(1 AS BIGINT) << b.i
                           ELSE 0 END) AS BIGINT) AS ahash
      FROM b JOIN tot t USING (doc_id) GROUP BY b.doc_id
    )
    SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           CAST(bit_count(xor(a.ahash, c.ahash)) AS INT) AS hamming
    FROM h a JOIN h c ON a.doc_id < c.doc_id
    WHERE bit_count(xor(a.ahash, c.ahash)) <= 3
    """,
)
def q_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-duplicate detection end-to-end: a
    deterministic near-dup JPEG corpus (flat-block synthesis keeps the
    transform round trip bit-exact), REAL entropy decode + IDCT per image,
    integer-exact aHash over the decoded pixels, then banded hamming LSH
    (4 bit-slices; a pair within hamming 3 shares a slice by pigeonhole)
    with exact bit_count(xor) verification on candidates only — the image
    twin of SimHash text dedup, and the same plan shape at 100 TB: the
    hash is map-only per image, candidates come from a slice equi-join,
    never an all-pairs scan. The oracle replays synthesis, hash and
    EXHAUSTIVE pair math in SQL, so the LSH path's completeness at this
    threshold is verified, not assumed."""
    from delta_sharing_spark.operators.dedup import hamming_near_pairs
    from delta_sharing_spark.operators.jpeg import synth_jpeg_corpus
    from delta_sharing_spark.operators.multimodal import image_ahash

    docs = _spread(
        read_table(spark, sf_dir, "documents").select("doc_id"))
    imgs = synth_jpeg_corpus(docs, "doc_id")
    # persist the (tiny) hash table: the LSH self-join reads it twice and
    # the decode+hash stage is the expensive Python part — without this
    # every image is entropy-decoded twice. Not explicitly unpersisted:
    # Spark's ContextCleaner reclaims the cached blocks once the plan's
    # references are GC'd (the bench forces gc between queries)
    hashes = image_ahash(imgs, "image", "doc_id") \
        .filter(F.col("error").isNull()).drop("error").persist()
    pairs = hamming_near_pairs(hashes, "doc_id", "ahash",
                               bits=16, bands=4, max_hamming=3)
    return pairs.select("id_a", "id_b",
                        F.col("hamming").cast("int").alias("hamming"))


@workload(
    "q_audio_flac",
    oracle="""
    WITH idx AS (
      SELECT doc_id,
             unnest(generate_series(0, (n_chars % 256 + 15)::BIGINT)) AS k
      FROM documents
    ), v AS (
      SELECT doc_id, k,
             ((doc_id * 31 + k * 17) % 65536) - 32768 AS s
      FROM idx
    ), w AS (
      SELECT doc_id, s,
             LAG(s) OVER (PARTITION BY doc_id ORDER BY k) AS p
      FROM v
    )
    SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
           CAST(SUM(s * s) AS BIGINT) AS sum_sq,
           CAST(SUM(CASE WHEN p IS NOT NULL AND p * s < 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
    FROM w GROUP BY doc_id
    """,
)
def q_audio_flac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-audio decode in the distributed path: the SAME
    deterministic PCM math as q_audio_features, but containered as
    Rice-coded FLAC frames by the vendored lossless codec
    (operators/flac.py — CRC-8/CRC-16/MD5 verified on decode) and decoded
    back through the magic-sniffing decode_audio dispatcher inside
    Arrow-batched mapInPandas. FLAC is lossless, so the identical SQL
    oracle verifies the compressed path bit-for-bit — the audio half of
    the JPEG/FLAC compressed-codec pair. Map-only, no shuffle."""
    from delta_sharing_spark.operators.audio import (
        audio_features,
        synth_flac_column,
    )

    # the per-clip pure-python FLAC encode/decode is the expensive part;
    # a one-partition documents scan would serialize it on one core
    docs = _spread(
        read_table(spark, sf_dir, "documents").select("doc_id", "n_chars"))
    clips = synth_flac_column(docs, "doc_id", "n_chars")
    return (audio_features(clips, "audio", "doc_id")
            .filter(F.col("error").isNull()).drop("error"))


@workload(
    "q_audio_features",
    oracle="""
    WITH idx AS (
      SELECT doc_id,
             unnest(generate_series(0, (n_chars % 256 + 15)::BIGINT)) AS k
      FROM documents
    ), v AS (
      SELECT doc_id, k,
             ((doc_id * 31 + k * 17) % 65536) - 32768 AS s
      FROM idx
    ), w AS (
      SELECT doc_id, s,
             LAG(s) OVER (PARTITION BY doc_id ORDER BY k) AS p
      FROM v
    )
    SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
           CAST(SUM(s * s) AS BIGINT) AS sum_sq,
           CAST(SUM(CASE WHEN p IS NOT NULL AND p * s < 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
    FROM w GROUP BY doc_id
    """,
)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode in the distributed path: synthesize 16-bit PCM
    WAV bytes per doc (integer sample math a SQL oracle replays), decode
    them back through the stdlib RIFF reader inside Arrow-batched
    mapInPandas, and emit integer-exact features (sum |s|, sum s²,
    zero crossings) — the audio twin of the vendored-PNG image path.
    Map-only: no shuffle anywhere between synthesis and features."""
    from delta_sharing_spark.operators.audio import (
        audio_features,
        synth_wav_column,
    )

    docs = _spread(
        read_table(spark, sf_dir, "documents").select("doc_id", "n_chars"))
    clips = synth_wav_column(docs, "doc_id", "n_chars")
    return (audio_features(clips, "audio", "doc_id")
            .filter(F.col("error").isNull()).drop("error"))


@workload(
    "q_audio_windows",
    oracle="""
    WITH idx AS (
      SELECT doc_id,
             unnest(generate_series(0, (n_chars % 256 + 15)::BIGINT)) AS k
      FROM documents
    ), r AS (
      -- decimation resample by 3: keep samples at indices 0,3,6,...
      SELECT doc_id, k // 3 AS j,
             ((doc_id * 31 + k * 17) % 65536) - 32768 AS s
      FROM idx WHERE k % 3 = 0
    ), w AS (
      SELECT doc_id, j, j // 32 AS win, s,
             LAG(s) OVER (PARTITION BY doc_id, j // 32 ORDER BY j) AS p
      FROM r
    )
    SELECT doc_id,
           CAST(win AS BIGINT) AS win,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
           CAST(SUM(s * s) AS BIGINT) AS sum_sq,
           CAST(SUM(CASE WHEN p IS NOT NULL AND p * s < 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
           CAST(MAX(ABS(s)) AS BIGINT) AS peak,
           SQRT(CAST(SUM(s * s) AS DOUBLE) / COUNT(*)) AS rms
    FROM w GROUP BY doc_id, win
    """,
)
def q_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio features over a RESAMPLED clip: synthesize WAV
    bytes, decimate by 3 (integer-exact index selection,
    operators/audio.py:audio_resample), then frame into 32-sample
    windows and emit integer-exact per-frame features + RMS
    (operators/audio.py:audio_windows). Every stage replays in SQL —
    including the boundary rule (a zero-crossing pair spanning two
    frames counts in neither) and the kept partial trailing frame.
    Plan shape: two Arrow-batched map-only passes, no shuffle before
    the final frame rows."""
    from delta_sharing_spark.operators.audio import (
        audio_resample,
        audio_windows,
        synth_wav_column,
    )

    docs = _spread(
        read_table(spark, sf_dir, "documents").select("doc_id", "n_chars"))
    clips = synth_wav_column(docs, "doc_id", "n_chars")
    resampled = audio_resample(clips, "audio", factor=3)
    frames = audio_windows(resampled, "audio", "doc_id", window=32)
    return frames.filter(F.col("error").isNull()).drop("error").withColumn(
        "rms", F.sqrt(F.col("sum_sq") / F.col("n_samples")))


@workload(
    "q_asof_tolerance",
    oracle="""
    WITH j AS (
      SELECT c.event_id, c.ts AS cts, p.ts AS pts,
             p.event_id AS p_eid, CAST(p.value AS DOUBLE) AS p_val
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND p.ts <= c.ts
    )
    SELECT event_id,
           CASE WHEN pts IS NOT NULL
                 AND epoch(cts) - epoch(pts) <= 86400
                THEN p_eid END AS purchase_event_id,
           CASE WHEN pts IS NOT NULL
                 AND epoch(cts) - epoch(pts) <= 86400
                THEN p_val END AS purchase_value
    FROM j
    """,
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance bound (pandas merge_asof parity): a
    purchase more than 24h before the click does not attribute. The oracle
    replays DuckDB ASOF then voids matches past the bound."""
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof_join(
        clicks, purchases, on="user_id", left_time="ts", right_time="ts",
        right_payload=["event_id", "value"], tolerance=86_400,
    )
    return out.select(
        "event_id",
        F.col("event_id_right").alias("purchase_event_id"),
        F.col("value_right").cast("double").alias("purchase_value"),
    )


@workload(
    "q_audio_near_dup",
    oracle="""
    WITH s AS (
      SELECT doc_id, k,
             ((doc_id // 8) * 2654435761 + k * (17 + (doc_id // 8) % 23)
              + (k * k) * (1 + (doc_id // 8) % 13)) % 4096 - 2048
             + CASE WHEN k // 16 = ((doc_id % 8) * 2 + doc_id // 8) % 33
                    THEN (doc_id % 5) * 40 ELSE 0 END AS v
      FROM documents, LATERAL UNNEST(generate_series(0, 527)) AS t(k)
    ), e AS (
      SELECT doc_id, k // 16 AS f, SUM(v * v) AS en
      FROM s GROUP BY doc_id, k // 16
    ), fp AS (
      SELECT a.doc_id,
             CAST(SUM(CASE WHEN b.en > a.en
                           THEN CAST(1 AS BIGINT) << a.f
                           ELSE 0 END) AS BIGINT) AS fh
      FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.f = a.f + 1
      GROUP BY a.doc_id
    )
    SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           CAST(bit_count(xor(a.fh, c.fh)) AS INT) AS hamming
    FROM fp a JOIN fp c ON a.doc_id < c.doc_id
    WHERE bit_count(xor(a.fh, c.fh)) <= 3
    """,
)
def q_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acoustic-fingerprint audio near-duplicate detection end-to-end:
    a deterministic near-dup clip corpus (fixed-size clusters, one
    perturbed frame per member) containered as REAL Rice-coded FLAC,
    decoded by the vendored lossless codec per clip, energy-contour
    32-bit fingerprints (Haitsma-Kalker shape: bit i = energy rises from
    frame i to i+1), then the SAME banded hamming LSH as SimHash text
    dedup and image aHash near-dup (4 bit-slices; a pair within hamming
    3 shares a slice by pigeonhole) with exact bit_count(xor) verification
    on candidates only — one fingerprint family, three modalities, and
    the 100 TB plan shape throughout: map-only decode+hash, slice
    equi-join candidates, never an all-pairs scan. The oracle replays
    synthesis, energies, fingerprint and the EXHAUSTIVE pair join in
    SQL, so LSH completeness at this threshold is verified, not
    assumed (lossless codec => decoded energies equal synthesized ones
    bit-for-bit)."""
    from delta_sharing_spark.operators.audio import (
        audio_energy_fingerprint,
        synth_flac_corpus,
    )
    from delta_sharing_spark.operators.dedup import hamming_near_pairs

    docs = _spread(
        read_table(spark, sf_dir, "documents").select("doc_id"))
    clips = synth_flac_corpus(docs, "doc_id")
    # persist the tiny fingerprint table: the LSH self-join reads it
    # twice and FLAC decode is the expensive Python stage (same
    # rationale as q_image_near_dup)
    fps = audio_energy_fingerprint(clips, "audio", "doc_id") \
        .filter(F.col("error").isNull()).drop("error").persist()
    pairs = hamming_near_pairs(fps, "doc_id", "fingerprint",
                               bits=32, bands=4, max_hamming=3)
    return pairs.select("id_a", "id_b",
                        F.col("hamming").cast("int").alias("hamming"))


_VIDEO_FRAMES_CTE = """
    WITH fr AS (
      SELECT doc_id, f
      FROM documents,
           LATERAL UNNEST(generate_series(0, 1 + doc_id % 3)) AS t(f)
    ), b AS (
      SELECT doc_id, f, i,
             (doc_id * 37 + f * 101 + i * 7 + (doc_id % 16) * i * i
              + (f % 2) * (doc_id % 7) * 20) % 256 AS v
      FROM fr, LATERAL UNNEST(generate_series(0, 3)) AS u(i)
    ), s AS (
      SELECT doc_id, f, 64 * SUM(v) AS sum_px, 64 * SUM(v * v) AS sum_sq
      FROM b GROUP BY doc_id, f
    )
"""


@workload(
    "q_video_frames",
    oracle=_VIDEO_FRAMES_CTE + """
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
           CAST(256 AS BIGINT) AS n_pixels,
           CAST(sum_px AS BIGINT) AS sum_px,
           CAST(sum_sq AS BIGINT) AS sum_sq
    FROM s
    """,
)
def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode in the distributed path: a deterministic
    MJPEG-in-AVI clip per doc (2-4 flat-block frames), the RIFF
    container parsed by the vendored AVI reader and every frame
    entropy-decoded + IDCT'd by the vendored JPEG codec inside
    Arrow-batched mapInPandas, emitting integer-exact per-frame pixel
    aggregates the oracle replays from the block math in SQL — the
    video member of the image/audio/video decode triple
    (q_multimodal_jpeg / q_audio_flac / this). Map-only, one output row
    per frame."""
    from delta_sharing_spark.operators.video import (
        synth_mjpeg_corpus,
        video_frame_features,
    )

    docs = _spread(
        read_table(spark, sf_dir, "documents").select("doc_id"))
    clips = synth_mjpeg_corpus(docs, "doc_id")
    # error IS NULL excludes failed clips entirely (an error row carries a
    # null frame_idx that .drop alone would leak into the result)
    return (video_frame_features(clips, "video", "doc_id")
            .filter(F.col("error").isNull()).drop("error"))


@workload(
    "q_video_scene_cuts",
    oracle=_VIDEO_FRAMES_CTE + """
    , lagd AS (
      SELECT doc_id, f, sum_px,
             LAG(sum_px) OVER (PARTITION BY doc_id ORDER BY f) AS prev
      FROM s
    )
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           CAST((sum_px - prev) / 256.0 AS DOUBLE) AS mean_jump
    FROM lagd
    WHERE prev IS NOT NULL AND ABS(sum_px - prev) > 40 * 256
    """,
)
def q_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal video analysis over REAL decoded frames: scene-cut
    detection as a per-clip windowed jump test on frame means (integer
    sums scaled by pixel count — no float drift), the synth corpus's
    alternating-frame term guaranteeing real cuts to find. The window
    partitions by clip, so a billion-clip corpus scales by clip count;
    the oracle replays decode-exact frame sums and the same LAG test in
    SQL."""
    from delta_sharing_spark.operators.video import (
        scene_cuts,
        synth_mjpeg_corpus,
        video_frame_features,
    )

    docs = _spread(
        read_table(spark, sf_dir, "documents").select("doc_id"))
    clips = synth_mjpeg_corpus(docs, "doc_id")
    frames = video_frame_features(clips, "video", "doc_id")
    return scene_cuts(frames, "doc_id", threshold=40)
