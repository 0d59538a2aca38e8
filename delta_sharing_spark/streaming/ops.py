"""Streaming operators over a shared-table stream — Spark-first shapes.

The reference's streaming surface stops at the SOURCE (admission control,
offsets, CDF streaming — sources/datasource.py); what a training-data
pipeline runs ON that stream are these operators, built from Structured
Streaming's native stateful primitives rather than hand-rolled state:

- ``stream_dedup``: exactly-once first-seen filtering via
  ``dropDuplicates`` — Spark's built-in dedup state store, bounded by a
  watermark (late duplicates beyond the horizon age out of state).
- ``stream_sessionize``: per-key session aggregation via
  ``session_window`` (built-in since Spark 3.2) — gap-based windows that
  merge as events arrive; the watermark closes sessions and evicts state.
- ``stream_hourly_counts``: tumbling event-time windows + watermark — the
  canonical late-data-tolerant rollup.

At 100 TB/day these all scale the same way batch aggregations do (state is
partitioned by key across executors, RocksDB-backed state stores in
production), with the watermark bounding state size — the thing a naive
"keep a dict per key" custom operator gets wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _no_protobuf() -> bool:
    """transformWithState's Python runtime needs protobuf; find_spec on
    'google.protobuf' raises when even the 'google' namespace is absent."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is None
    except ModuleNotFoundError:
        return True


def stream_dedup(stream: DataFrame, content_cols: list[str],
                 event_time_col: str | None = None,
                 watermark: str = "1 hour") -> DataFrame:
    """First-seen streaming dedup on a content key (md5 of the given
    columns): duplicates arriving later — in the same or any subsequent
    micro-batch inside the watermark horizon — are dropped by Spark's
    dedup state store. With an event-time column,
    ``dropDuplicatesWithinWatermark`` dedups on the content key alone and
    EVICTS key state once the horizon passes (bounded state); without
    one, state grows with distinct keys (exact global dedup)."""
    # to_json(struct(...)) keys are unambiguous: values are quoted and
    # field-delimited, so ("12","3x") can never collide with ("1","23x"),
    # and nulls stay distinct from empty strings
    keyed = stream.withColumn(
        "__content_md5",
        F.md5(F.to_json(F.struct(*[F.col(c) for c in content_cols]))
              .cast("binary")),
    )
    if event_time_col is not None:
        return (
            keyed.withWatermark(event_time_col, watermark)
            .dropDuplicatesWithinWatermark(["__content_md5"])
            .drop("__content_md5")
        )
    return keyed.dropDuplicates(["__content_md5"]).drop("__content_md5")


def stream_sessionize(stream: DataFrame, key_col: str, ts_col: str,
                      gap: str = "30 minutes",
                      watermark: str = "1 hour") -> DataFrame:
    """Gap-based sessionization with the BUILT-IN ``session_window``
    aggregation: windows of the same key closer than ``gap`` merge; a
    session closes (and its state evicts) when the watermark passes its
    end. Emits one row per closed session in append mode."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"),
                 F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("first_event"),
            F.max(ts_col).alias("last_event"),
        )
        .select(
            key_col,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events", "first_event", "last_event",
        )
    )


def stream_hourly_counts(stream: DataFrame, ts_col: str,
                         group_col: str | None = None,
                         watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time windows with late-data tolerance — the
    watermark admits stragglers up to the horizon, then finalizes the
    window and evicts its state."""
    keys = [F.window(F.col(ts_col), "1 hour").alias("w")]
    if group_col is not None:
        keys.append(F.col(group_col))
    out = stream.withWatermark(ts_col, watermark).groupBy(*keys).agg(
        F.count("*").alias("n"))
    cols = [F.col("w.start").alias("hour_start"), "n"]
    if group_col is not None:
        cols.insert(1, F.col(group_col))
    return out.select(*cols)


def stream_minhash_bands(stream: DataFrame, id_col: str, text_col: str,
                         num_hashes: int = 8, bands: int = 4,
                         shingle_k: int = 3) -> DataFrame:
    """Per-row MinHash band keys for a STREAM: the batch operator's
    explode+groupBy shape is a stateful aggregation on a stream, so here
    the whole signature computes inside one Arrow-batched pandas UDF per
    document (identical md5 math to operators.dedup.minhash_signatures —
    seeded md5, 8-hex-char slices, min over shingles), then bands hash
    exactly like minhash_band_index. Pure projection: stream-safe,
    composable with downstream stateful operators."""
    import hashlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rows_per_band = num_hashes // bands

    @pandas_udf("array<string>")  # no hints: postponed-annotations module
    def band_hashes(texts):
        out = []
        for text in texts:
            words = (text or "").split(" ")
            n = max(len(words) - (shingle_k - 1), 1)
            shingles = {" ".join(words[i:i + shingle_k]) for i in range(n)}
            sigs = []
            for i in range(num_hashes):
                j, off = i // 4, (i % 4) * 8
                sigs.append(min(
                    hashlib.md5(f"{j}:{s}".encode()).hexdigest()[off:off + 8]
                    for s in shingles))
            bh = []
            for b in range(bands):
                parts = sigs[b * rows_per_band:(b + 1) * rows_per_band]
                bh.append(hashlib.md5("|".join(parts).encode()).hexdigest())
            out.append(bh)
        return pd.Series(out)

    return (
        stream.select(F.col(id_col), band_hashes(F.col(text_col)).alias("bh"))
        .select(id_col, F.posexplode("bh").alias("band_idx", "h"))
    )


def stream_lsh_dedup_candidates(stream: DataFrame, id_col: str,
                                text_col: str, num_hashes: int = 8,
                                bands: int = 4, shingle_k: int = 3,
                                max_bucket: int = 64) -> DataFrame:
    """Streaming near-dup candidate detection via ``applyInPandasWithState``
    — the custom-stateful-operator path for semantics built-ins can't
    express (dropDuplicates keeps ONE row per key; this must emit PAIRS
    against everything previously seen in the bucket).

    Keyed by (band_idx, band_hash); state = doc ids already seen in the
    bucket (capped at ``max_bucket`` — a hot boilerplate bucket otherwise
    emits quadratically, the same skew guard as the batch operator's
    ``max_doc_freq``). Each arriving doc emits one candidate row per
    previously seen bucket member. State is per-key and partitioned across
    executors like any streaming aggregation."""
    import pandas as pd

    id_type = dict(stream.dtypes).get(id_col, "")
    if id_type not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise ValueError(
            f"stream_lsh_dedup_candidates requires an integral id column; "
            f"{id_col!r} is {id_type!r} (hash string ids to bigint first, "
            "e.g. xxhash64)")
    bands_df = stream_minhash_bands(stream, id_col, text_col,
                                    num_hashes, bands, shingle_k)

    def dedup(key, pdfs, state) -> "pd.DataFrame":
        seen = list(state.get[0]) if state.exists else []
        out_new, out_seen = [], []
        for pdf in pdfs:
            for doc in pdf[id_col]:
                doc = int(doc)
                if doc in seen:
                    continue
                for prev in seen:
                    out_new.append(doc)
                    out_seen.append(prev)
                if len(seen) < max_bucket:
                    seen.append(doc)
        state.update((seen,))
        yield pd.DataFrame({"new_id": out_new, "seen_id": out_seen,
                            "band_idx": [key[0]] * len(out_new)})

    return bands_df.groupBy("band_idx", "h").applyInPandasWithState(
        dedup,
        outputStructType="new_id long, seen_id long, band_idx int",
        stateStructType="seen array<long>",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def stream_lsh_dedup_candidates_tws(stream: DataFrame, id_col: str,
                                    text_col: str, num_hashes: int = 8,
                                    bands: int = 4, shingle_k: int = 3,
                                    max_bucket: int = 64) -> DataFrame:
    """``transformWithStateInPandas`` port of
    :func:`stream_lsh_dedup_candidates` (same semantics, same skew cap;
    identical candidate sets by construction — asserted by the
    streaming-equals-batch test over both variants).

    Why the port: transformWithState is Spark's successor API for custom
    stateful operators — typed state variables (List/Map/Value) map to
    native state-store column families, so a bucket append is an O(1)
    RocksDB put instead of rewriting the whole bucket array, and TTL /
    timers come for free when needed. Prefer this variant on Spark 4.x
    clusters with the RocksDB state store; the applyInPandasWithState one
    remains for 3.4/3.5 compatibility."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    if _no_protobuf():
        # the transformWithState Python runtime speaks protobuf to the JVM
        # state server; without it the streaming query crashes opaquely at
        # start — fail fast at construction instead
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(its state-server protocol); it is not installed in this "
            "environment — use stream_lsh_dedup_candidates "
            "(applyInPandasWithState) instead")
    id_type = dict(stream.dtypes).get(id_col, "")
    if id_type not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise ValueError(
            f"stream_lsh_dedup_candidates_tws requires an integral id "
            f"column; {id_col!r} is {id_type!r} (hash string ids to bigint "
            "first, e.g. xxhash64)")
    bands_df = stream_minhash_bands(stream, id_col, text_col,
                                    num_hashes, bands, shingle_k)

    class Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getListState("seen", "id long")

        def handleInputRows(self, key, rows, timerValues):
            seen = [t[0] for t in self._seen.get()]
            added = []
            out_new, out_seen = [], []
            for pdf in rows:
                for doc in pdf[id_col]:
                    doc = int(doc)
                    if doc in seen:
                        continue
                    for prev in seen:
                        out_new.append(doc)
                        out_seen.append(prev)
                    if len(seen) < max_bucket:
                        seen.append(doc)
                        added.append((doc,))
            if added:
                self._seen.appendList(added)
            yield pd.DataFrame({"new_id": out_new, "seen_id": out_seen,
                                "band_idx": [key[0]] * len(out_new)})

        def close(self) -> None:
            pass

    return bands_df.groupBy("band_idx", "h").transformWithStateInPandas(
        Processor(),
        outputStructType="new_id long, seen_id long, band_idx int",
        outputMode="append",
        timeMode="None",
    )
