"""Audio columns: real WAV (RIFF PCM) decode + feature extraction.

The multimodal contract (operators/multimodal.py) treats media as opaque
``binary`` columns decoded by Arrow-batched ``mapInPandas`` workers. For
audio the container needs no external codec at all: 16-bit PCM WAV is
stdlib-decodable (``wave``), so — like the vendored PNG decoder
(operators/png.py) — the distributed decode path runs for REAL in CI,
and a codec for compressed formats (mp3/flac via soundfile/librosa) is a
drop-in replacement for :func:`decode_wav` behind the same signature.

Feature math is integer-exact (sum of |sample|, sum of squares, zero
crossings) so a SQL oracle can replay it bit-for-bit; float features
(RMS, dBFS) derive from those integers at the end.

Reference scope note: delta-io/delta-sharing carries no media handling —
this extends the engine toward the training-data pipelines the repo
targets (SURVEY.md pipeline operators section).
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Iterator

# module-level: pandas_udf resolves stringified type hints (PEP 563 via
# the __future__ import above) against module globals
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def encode_wav(samples: "list[int]", sample_rate: int = 8000,
               channels: int = 1) -> bytes:
    """16-bit PCM WAV bytes from int samples (interleaved if multi-channel).
    Values are clamped to int16 — encode is for fixtures/tests; real
    corpora already store encoded bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        clamped = [max(-32768, min(32767, int(s))) for s in samples]
        w.writeframes(struct.pack(f"<{len(clamped)}h", *clamped))
    return buf.getvalue()


def decode_wav(content: bytes) -> "tuple[int, int, list[int]]":
    """(sample_rate, channels, samples) from 16-bit PCM WAV bytes.
    Raises ``ValueError`` on non-PCM/non-16-bit payloads — the same
    explicit-failure contract as the PNG decoder."""
    try:
        with wave.open(io.BytesIO(content), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError(
                    f"only 16-bit PCM WAV supported, got "
                    f"{8 * w.getsampwidth()}-bit")
            n = w.getnframes()
            raw = w.readframes(n)
            samples = list(struct.unpack(f"<{n * w.getnchannels()}h", raw))
            return w.getframerate(), w.getnchannels(), samples
    except (wave.Error, EOFError, struct.error) as e:
        # wave raises EOFError (not wave.Error) on truncated headers, and
        # a header that over-claims frames leaves struct.unpack short —
        # all surface under the documented ValueError contract
        raise ValueError(f"not a PCM WAV payload: {e}") from e


def decode_audio(content: bytes) -> "tuple[int, int, list[int]]":
    """Magic-sniffing decode: FLAC (the vendored lossless codec,
    operators/flac.py) or 16-bit PCM WAV — one signature, so every
    feature operator below handles compressed and raw payloads alike.
    FLAC errors surface under the same ValueError contract."""
    if content[:4] == b"fLaC":
        from delta_sharing_spark.operators.flac import (
            FlacError,
            decode_flac,
        )

        try:
            return decode_flac(content)
        except FlacError as e:
            raise ValueError(f"bad FLAC payload: {e}") from e
    return decode_wav(content)


_AUDIO_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("sum_abs", T.LongType()),
    T.StructField("sum_sq", T.LongType()),
    T.StructField("zero_crossings", T.LongType()),
    T.StructField("error", T.StringType()),
])


def audio_features(df: DataFrame, media_col: str, id_col: str) -> DataFrame:
    """Decode a WAV binary column and emit integer-exact per-clip
    features: sample count, sum(|s|), sum(s²) and zero crossings
    (sign-product < 0 between adjacent samples).

    Spark-first shape: one Arrow-batched ``mapInPandas`` pass — map-only,
    no shuffle; the decode parallelizes per input partition exactly like
    the image path (operators/multimodal.py:decode_media). Undecodable
    payloads surface in the ``error`` column instead of failing the job
    (per-row capture, same contract as resize_media)."""
    import numpy as np

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            # zip over raw numpy object arrays — iterrows() materializes a
            # Series per row (multimodal.decode_media idiom)
            for rid, raw in zip(pdf[id_col].values, pdf[media_col].values):
                try:
                    if raw is None:
                        raise ValueError("null media value")
                    rate, ch, samples = decode_audio(bytes(raw))
                    a = np.asarray(samples, dtype=np.int64)
                    prod = a[:-1] * a[1:] if len(a) > 1 else np.array([])
                    rows.append((int(rid), rate, ch, len(a),
                                 int(np.abs(a).sum()), int((a * a).sum()),
                                 int((prod < 0).sum()), None))
                except (ValueError, struct.error) as e:
                    rows.append((int(rid), None, None, None,
                                 None, None, None, str(e)))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              _AUDIO_SCHEMA.fields])

    return df.mapInPandas(run, schema=_AUDIO_SCHEMA) \
        .withColumnRenamed("id", id_col)


_WINDOW_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("win", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("sum_abs", T.LongType()),
    T.StructField("sum_sq", T.LongType()),
    T.StructField("zero_crossings", T.LongType()),
    T.StructField("peak", T.LongType()),
    T.StructField("error", T.StringType()),
])


def audio_windows(df: DataFrame, media_col: str, id_col: str,
                  window: int = 64) -> DataFrame:
    """Windowed (framed) features: decode a WAV binary column and emit
    one row per non-overlapping ``window``-sample frame — integer-exact
    sum(|s|), sum(s²), peak |s| and within-frame zero crossings (a pair
    spanning a frame boundary counts in neither frame), so a SQL oracle
    replays every value bit-for-bit; RMS/dBFS derive from the integers
    afterwards (JVM-side ``sqrt``). The trailing partial frame is kept
    with its true ``n_samples``.

    Same Spark-first shape as :func:`audio_features`: one Arrow-batched
    ``mapInPandas`` pass, map-only, no shuffle; the per-clip frame
    fan-out happens inside the worker (numpy reshape, not an explode)."""
    import numpy as np

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in _WINDOW_SCHEMA.fields]
        for pdf in batches:
            rows = []
            # zip over raw numpy object arrays — iterrows() materializes a
            # Series per row (multimodal.decode_media idiom)
            for rid, raw in zip(pdf[id_col].values, pdf[media_col].values):
                rid = int(rid)
                try:
                    if raw is None:
                        raise ValueError("null media value")
                    _rate, _ch, samples = decode_audio(bytes(raw))
                    a = np.asarray(samples, dtype=np.int64)
                    if len(a) == 0:
                        # one-row-per-clip floor (audio_features parity):
                        # a decodable empty clip surfaces as frame 0 with
                        # zero samples, never vanishes silently
                        rows.append((rid, 0, 0, 0, 0, 0, 0, None))
                    for w0 in range(0, len(a), window):
                        f = a[w0:w0 + window]
                        prod = (f[:-1] * f[1:] if len(f) > 1
                                else np.array([]))
                        rows.append((rid, w0 // window, len(f),
                                     int(np.abs(f).sum()),
                                     int((f * f).sum()),
                                     int((prod < 0).sum()),
                                     int(np.abs(f).max()), None))
                except (ValueError, struct.error) as e:
                    rows.append((rid, None, None, None, None, None,
                                 None, str(e)))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=_WINDOW_SCHEMA) \
        .withColumnRenamed("id", id_col)


def audio_resample(df: DataFrame, media_col: str, factor: int,
                   out_col: str | None = None) -> DataFrame:
    """Integer-factor decimation resample: keep every ``factor``-th
    sample (a pure index selection — exactly replayable in SQL, unlike
    interpolating resamplers) and re-encode at ``rate // factor``.
    Anti-alias filtering is a drop-in upstream of the decimation when a
    DSP stack is available; the selection contract stays the oracle.
    Undecodable payloads map to NULL (downstream feature passes surface
    them on their ``error`` column)."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")

    @F.pandas_udf(T.BinaryType())
    def resample(payloads: pd.Series) -> pd.Series:
        out = []
        for raw in payloads:
            try:
                if raw is None:
                    raise ValueError("null media value")
                rate, ch, samples = decode_audio(bytes(raw))
                if ch != 1:
                    raise ValueError(
                        "decimation resample expects mono clips")
                out.append(encode_wav(samples[::factor],
                                      sample_rate=max(rate // factor, 1)))
            except (ValueError, struct.error):
                out.append(None)
        return pd.Series(out, dtype=object)

    return df.withColumn(out_col or media_col, resample(F.col(media_col)))


def synth_flac_column(df: DataFrame, id_col: str, n_col: str,
                      sample_rate: int = 8000,
                      out_col: str = "audio") -> DataFrame:
    """FLAC twin of :func:`synth_wav_column`: the SAME deterministic PCM
    math, containered as real Rice-coded FLAC frames by the vendored
    lossless codec — so the same SQL oracle verifies the compressed
    decode path bit-for-bit."""
    from delta_sharing_spark.operators.flac import encode_flac

    @F.pandas_udf(T.BinaryType())
    def synth(ids: pd.Series, ns: pd.Series) -> pd.Series:
        out = []
        for i, n in zip(ids, ns):
            count = int(n) % 256 + 16
            samples = [((int(i) * 31 + k * 17) % 65536) - 32768
                       for k in range(count)]
            out.append(encode_flac(samples, sample_rate=sample_rate))
        return pd.Series(out)

    return df.withColumn(out_col, synth(F.col(id_col), F.col(n_col)))


def synth_wav_column(df: DataFrame, id_col: str, n_col: str,
                     sample_rate: int = 8000,
                     out_col: str = "audio") -> DataFrame:
    """Deterministic WAV synthesis for fixtures: clip i gets
    ``(n % 256) + 16`` samples with ``s_k = ((id*31 + k*17) % 65536) -
    32768`` — pure integer math an oracle replays in SQL, encoded to real
    RIFF bytes by an Arrow-batched pandas UDF."""
    @F.pandas_udf(T.BinaryType())
    def synth(ids: pd.Series, ns: pd.Series) -> pd.Series:
        out = []
        for i, n in zip(ids, ns):
            count = int(n) % 256 + 16
            samples = [((int(i) * 31 + k * 17) % 65536) - 32768
                       for k in range(count)]
            out.append(encode_wav(samples, sample_rate=sample_rate))
        return pd.Series(out)

    return df.withColumn(out_col, synth(F.col(id_col), F.col(n_col)))


def synth_flac_corpus(df: DataFrame, id_col: str,
                      sample_rate: int = 8000,
                      out_col: str = "audio") -> DataFrame:
    """Attach a deterministic NEAR-DUPLICATE audio corpus: every row gets
    a 528-sample clip (33 frames x 16 samples) whose base signal comes
    from the row's FIXED-SIZE cluster (``id // 8`` — 8 members per
    cluster at every corpus size, so the true near-dup pair set grows
    LINEARLY with the corpus, like the image twin
    ``synth_jpeg_corpus``), with ONE frame perturbed per row (frame
    ``(id%8 * 2 + id//8) % 33`` shifted by ``(id % 5) * 40`` per sample —
    the same perturbation convention as the image corpus). The base
    signal's wrap rate and quadratic coefficient are cluster-dependent
    (Knuth multiplier + per-cluster k coefficients), so energy contours
    DECORRELATE across clusters: measured on 500 docs, every hamming<=3
    pair is within-cluster — the pair set stays linear in corpus size
    instead of collapsing into a few contour shapes. Pure integer math a
    SQL oracle replays sample-for-sample, containered as REAL Rice-coded
    FLAC frames by the vendored lossless codec — lossless means decoded
    energies equal the synthesized ones exactly. Arrow-batched,
    map-only."""
    from delta_sharing_spark.operators.flac import encode_flac

    @F.pandas_udf(T.BinaryType())
    def synth(ids: pd.Series) -> pd.Series:
        out = []
        for raw in ids:
            doc_id = int(raw)
            cluster, member = doc_id // 8, doc_id % 8
            pert = (member * 2 + cluster) % 33
            samples = []
            for k in range(528):
                v = ((cluster * 2654435761 + k * (17 + cluster % 23)
                      + (k * k) * (1 + cluster % 13)) % 4096) - 2048
                if k // 16 == pert:
                    v += (doc_id % 5) * 40
                samples.append(v)
            out.append(encode_flac(samples, sample_rate=sample_rate))
        return pd.Series(out)

    return df.withColumn(out_col, synth(F.col(id_col)))


_FP_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("fingerprint", T.LongType()),
    T.StructField("error", T.StringType()),
])


def audio_energy_fingerprint(df: DataFrame, media_col: str, id_col: str,
                             frame: int = 16,
                             bits: int = 32) -> DataFrame:
    """Energy-contour acoustic fingerprint (the Haitsma-Kalker shape with
    frame energy as the single band): decode the clip, split into
    ``bits + 1`` frames of ``frame`` samples, and set bit ``i`` iff the
    energy of frame ``i+1`` exceeds frame ``i`` — a compact hash that is
    stable under small localized edits (a perturbed frame flips at most
    its two adjacent bits) and integer-exact, so a SQL oracle replays it
    from the synthesis math. Near-duplicate candidates then come from
    the SAME banded hamming LSH as SimHash text dedup and image aHash
    (operators/dedup.py:hamming_near_pairs) — one fingerprint family,
    three modalities. Map-only Arrow-batched decode, no shuffle."""
    import numpy as np

    need = (bits + 1) * frame

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            # zip over raw numpy object arrays — iterrows() materializes a
            # Series per row (multimodal.decode_media idiom)
            for rid, raw in zip(pdf[id_col].values, pdf[media_col].values):
                try:
                    if raw is None:
                        raise ValueError("null media value")
                    _rate, _ch, samples = decode_audio(bytes(raw))
                    if len(samples) < need:
                        raise ValueError(
                            f"clip too short for fingerprint: "
                            f"{len(samples)} < {need} samples")
                    a = np.asarray(samples[:need], dtype=np.int64)
                    en = (a * a).reshape(bits + 1, frame).sum(axis=1)
                    fp = 0
                    for i in range(bits):
                        if en[i + 1] > en[i]:
                            fp |= 1 << i
                    rows.append((int(rid), fp, None))
                except (ValueError, struct.error) as e:
                    rows.append((int(rid), None, str(e)))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              _FP_SCHEMA.fields])

    return df.mapInPandas(run, schema=_FP_SCHEMA) \
        .withColumnRenamed("id", id_col)
