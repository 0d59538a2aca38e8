"""Delta response format (``responseformat=delta``) — PROTOCOL.md:4014-4137.

When a client sets ``delta-sharing-capabilities: responseformat=delta``, the
server wraps each action as a *delta* action instead of the parquet-profile
shape: ``{"protocol": {"deltaProtocol": {...}}}``,
``{"metaData": {"deltaMetadata": {...}, "version", "size", "numFiles"}}``,
and ``{"file": {"id", "version", "timestamp", "deltaSingleAction":
{"add"|"remove"|"cdc": {...}}}}`` — lines a recipient can drop into a local
delta log and read with a delta library (reference client reconstruction:
python/delta_sharing/reader.py:303-336; wire shape
PROTOCOL.md:4014-4137).

Two pure functions: :func:`actions_to_delta_format` converts the engine's
parquet-profile action stream, and :func:`delta_lines_to_spark` is the
client-side reconstruction back to a DataFrame (the in-engine twin of the
reference's delta-log rebuild).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def actions_to_delta_format(lines: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Rewrap a parquet-profile action stream as delta-format lines.

    Wrapper contract (PROTOCOL.md:4021-4035): each line carries exactly one
    of protocol/metaData/file; sharing-level fields (id, version, timestamp)
    stay on the wrapper, the delta action itself goes verbatim under
    deltaProtocol/deltaMetadata/deltaSingleAction. endStreamAction lines
    pass through unchanged (pagination is format-independent)."""
    out: list[dict[str, Any]] = []
    for line in lines:
        if "protocol" in line:
            p = line["protocol"]
            wrapper = {"deltaProtocol": {
                "minReaderVersion": p.get("minReaderVersion", 1),
                "minWriterVersion": p.get("minWriterVersion", 2),
            }}
            if p.get("version") is not None:
                # historical protocol actions in version-range responses
                # carry their commit version (PROTOCOL.md:2152)
                wrapper["version"] = p["version"]
            out.append({"protocol": wrapper})
        elif "metaData" in line:
            m = dict(line["metaData"])
            wrapper: dict[str, Any] = {}
            for k in ("version", "size", "numFiles"):
                if m.get(k) is not None:
                    wrapper[k] = m.pop(k)
            m.setdefault("format", {"provider": "parquet"})
            wrapper["deltaMetadata"] = m
            out.append({"metaData": wrapper})
        elif "file" in line:
            f = line["file"]
            add = {
                "path": f.get("url", f.get("id")),
                "partitionValues": f.get("partitionValues", {}),
                "size": f.get("size"),
                "modificationTime": f.get("timestamp"),
                "dataChange": True,
            }
            if f.get("stats") is not None:
                add["stats"] = f["stats"]
            if f.get("deletionVector") is not None:
                add["deletionVector"] = f["deletionVector"]
            for k in ("baseRowId", "defaultRowCommitVersion"):
                # row-tracking AddFile fields (Delta protocol "Row
                # Tracking") pass through verbatim like any delta action
                if f.get(k) is not None:
                    add[k] = f[k]
            wrapper = {"id": f["id"], "deltaSingleAction": {"add": add}}
            for k in ("version", "timestamp", "expirationTimestamp"):
                if f.get(k) is not None:
                    wrapper[k] = f[k]
            out.append({"file": wrapper})
        elif "add" in line or "cdf" in line or "remove" in line:
            # CDF parquet-profile lines (cdf.table_changes_actions shape)
            kind = "add" if "add" in line else (
                "cdc" if "cdf" in line else "remove")
            src = line["add"] if "add" in line else (
                line["cdf"] if "cdf" in line else line["remove"])
            action: dict[str, Any] = {
                "path": src.get("url", src.get("id")),
                "partitionValues": src.get("partitionValues", {}),
                "size": src.get("size"),
            }
            if kind == "add":
                action["dataChange"] = True
                if src.get("stats") is not None:
                    action["stats"] = src["stats"]
                for k in ("baseRowId", "defaultRowCommitVersion",
                          "deletionVector"):
                    # row-tracking fields + the DV descriptor (a DV-mode
                    # DELETE's add must rebuild as survivors only)
                    if src.get(k) is not None:
                        action[k] = src[k]
            if kind == "remove":
                action["dataChange"] = True
            wrapper = {"id": src["id"],
                       "deltaSingleAction": {kind: action}}
            for k in ("version", "timestamp"):
                if src.get(k) is not None:
                    wrapper[k] = src[k]
            out.append({"file": wrapper})
        elif "txn" in line:
            # SetTransaction (idempotent-writer epoch) rides as a delta
            # single action so a recipient's rebuilt local log preserves
            # exactly-once sink state (raw Delta actions wrapped per
            # PROTOCOL.md:4014-4137; id stable across requests like any
            # file wrapper)
            t = line["txn"]
            out.append({"file": {
                "id": f"txn:{t['appId']}",
                "deltaSingleAction": {"txn": {
                    "appId": t["appId"], "version": t["version"]}}}})
        else:
            out.append(line)  # endStreamAction etc.
    return out


def delta_lines_txns(lines: list[dict[str, Any]]) -> dict[str, int]:
    """SetTransaction state from a delta-format response: appId -> last
    committed epoch. The client-side half of the txn round-trip — a
    recipient resuming an idempotent writer checks its appId here before
    re-submitting a batch (Delta's txnVersion lookup)."""
    out: dict[str, int] = {}
    for line in lines:
        single = (line.get("file") or {}).get("deltaSingleAction") or {}
        if "txn" in single:
            t = single["txn"]
            out[t["appId"]] = int(t["version"])
    return out


def _row_tracking_cols(configuration: dict[str, Any] | None
                       ) -> tuple[str, str]:
    """Materialized row-id/commit-version column names from table config
    (Delta's declared materialized names; plans/log.py constants)."""
    from delta_sharing_spark.plans.log import (
        MAT_ROW_ID_DEFAULT,
        MAT_ROW_ID_KEY,
        MAT_ROW_VER_DEFAULT,
        MAT_ROW_VER_KEY,
    )

    cfg = configuration or {}
    return (cfg.get(MAT_ROW_ID_KEY, MAT_ROW_ID_DEFAULT),
            cfg.get(MAT_ROW_VER_KEY, MAT_ROW_VER_DEFAULT))


def _check_base_row_ids(entries) -> None:
    """row_ids=True requires every wire action to carry baseRowId;
    ``entries`` is (label, baseRowId) per action."""
    missing = [k for k, b in entries if b is None]
    if missing:
        raise ValueError(
            "row_ids=True: response actions lack baseRowId (table "
            f"not row-tracked, or pre-enablement files): {missing[:3]}")


def _rt_read_schema(names_types, mat_id: str, mat_ver: str):
    """Explicit scan schema for row-id reconstruction: the data columns
    plus the materialized override columns — only maintenance-written
    files carry the latter (the rest null-fill and fall back to
    baseRowId + row index); footer inference would be sample-dependent."""
    from pyspark.sql import types as T

    return T.StructType(
        [T.StructField(n, dt, True) for n, dt in names_types]
        + [T.StructField(mat_id, T.LongType(), True),
           T.StructField(mat_ver, T.LongType(), True)])


def _attach_row_ids(df, mat_id: str, mat_ver: str, base, ver):
    """_row_id = materialized override else base + row index;
    _row_commit_version = materialized override else the file default —
    the one reconstruction both response formats share."""
    from pyspark.sql import functions as F

    return (df.withColumn("_row_id", F.coalesce(
                F.col(mat_id), base + F.col("__rt_ri")))
            .withColumn("_row_commit_version",
                        F.coalesce(F.col(mat_ver), ver))
            .drop("__rt_ri", mat_id, mat_ver))


def delta_lines_to_spark(spark: SparkSession,
                         lines: list[dict[str, Any]],
                         row_ids: bool = False) -> DataFrame:
    """Client-side reconstruction: delta-format query response → DataFrame.

    Reads every deltaSingleAction.add parquet path and attaches typed
    partition-value columns per the shared schema — the in-engine twin of
    the reference client's local-delta-log rebuild
    (python/delta_sharing/reader.py:303-336).

    ``row_ids=True`` additionally reconstructs the Delta row-tracking
    columns ``_row_id`` / ``_row_commit_version`` from the wire actions'
    ``baseRowId``/``defaultRowCommitVersion`` + parquet row index, with
    materialized-column overrides — the remote twin of
    ``SharedTable.to_df(row_ids=True)``."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema: T.StructType | None = None
    cm = False
    config: dict[str, Any] = {}
    adds: list[tuple[dict[str, Any], str | None]] = []
    for line in lines:
        if "metaData" in line:
            meta = line["metaData"]["deltaMetadata"]
            schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
            config = meta.get("configuration") or {}
            cm = config.get("delta.columnMapping.mode") == "name"
        elif "file" in line:
            single = line["file"]["deltaSingleAction"]
            if "add" in single:
                adds.append((single["add"], line["file"].get("id")))
    if schema is None:
        raise ValueError("delta-format response lacks a metaData line")
    rt_extras = ["_row_id", "_row_commit_version"] if row_ids else []
    if row_ids:
        _check_base_row_ids([(a.get("path"), a.get("baseRowId"))
                             for a, _i in adds])
    if not adds:
        out_schema = T.StructType(
            list(schema.fields)
            + [T.StructField(c, T.LongType(), True) for c in rt_extras])
        return spark.createDataFrame([], out_schema)
    # column mapping (readerFeature columnMapping, delta protocol): files
    # and partitionValues are keyed by the immutable PHYSICAL names stamped
    # in each field's metadata; a delta reader resolves them back to the
    # logical names — this is why such tables are delta-format-only
    phys_of = {
        f.name: ((f.metadata or {}).get("delta.columnMapping.physicalName",
                                        f.name) if cm else f.name)
        for f in schema.fields
    }
    type_of = {phys_of[f.name]: f.dataType for f in schema.fields}
    mat_id, mat_ver = _row_tracking_cols(config)
    from delta_sharing_spark.table import SharedTable

    if row_ids:
        read_schema = _rt_read_schema(
            [(phys_of[f.name], SharedTable._cast_type(f.dataType))
             for f in schema.fields],
            mat_id, mat_ver)
    else:
        # ALWAYS scan under the declared (physical-name, wide) schema:
        # footer inference on a type-widened table is file-order
        # dependent — a narrow footer would read wide files wrongly;
        # the explicit schema upcasts narrow files natively instead
        # (the in-process read's contract, SharedTable._normalize)
        read_schema = T.StructType([
            T.StructField(phys_of[f.name],
                          SharedTable._cast_type(f.dataType), True)
            for f in schema.fields])

    def finish(df: DataFrame) -> DataFrame:
        # cast to the DECLARED types (nullability-relaxed targets): a
        # type-widened table's old files carry the narrow types, and an
        # inferred-schema scan would otherwise serve them as-is —
        # diverging from the in-process read (SharedTable._normalize)
        from delta_sharing_spark.table import SharedTable

        return df.select(
            *[F.col(phys_of[f.name])
              .cast(SharedTable._cast_type(f.dataType)).alias(f.name)
              for f in schema.fields],
            *rt_extras)

    scan_path = F.url_decode(F.regexp_replace(
        F.regexp_replace(F.input_file_name(), "^file:(//)?", ""),
        r"\+", "%2B"))
    parts: list[DataFrame] = []
    # clean adds in ONE grouped scan (plan size O(1) in file count),
    # physical-keyed partition values via a broadcast path join
    clean = [(a, i) for a, i in adds if not a.get("deletionVector")]
    if clean:
        pv_keys = sorted({k for a, _i in clean
                          for k in (a.get("partitionValues") or {})})
        reader = spark.read
        if read_schema is not None:
            reader = reader.schema(read_schema)
        df = reader.parquet(*[a["path"] for a, _i in clean])
        if row_ids:
            df = df.select("*",
                           F.col("_metadata.row_index").alias("__rt_ri"))
        if pv_keys or row_ids:
            from pyspark.sql import types as T2

            meta = spark.createDataFrame(
                [(a["path"],
                  *[(a.get("partitionValues") or {}).get(k) or None
                    for k in pv_keys],
                  *([a.get("baseRowId"),
                     a.get("defaultRowCommitVersion")] if row_ids else []))
                 for a, _i in clean],
                T2.StructType(
                    [T2.StructField("__path", T2.StringType())]
                    + [T2.StructField(f"__pv_{k}", T2.StringType())
                       for k in pv_keys]
                    + ([T2.StructField("__rt_base", T2.LongType()),
                        T2.StructField("__rt_ver", T2.LongType())]
                       if row_ids else [])))
            df = (df.withColumn("__path", scan_path)
                  .join(F.broadcast(meta), "__path").drop("__path"))
            for k in pv_keys:
                df = df.withColumn(
                    k, F.col(f"__pv_{k}").cast(type_of[k])
                ).drop(f"__pv_{k}")
            if row_ids:
                df = _attach_row_ids(df, mat_id, mat_ver,
                                     F.col("__rt_base"),
                                     F.col("__rt_ver")) \
                    .drop("__rt_base", "__rt_ver")
        parts.append(finish(df))
    for add, file_id in adds:
        dv = add.get("deletionVector")
        if not dv:
            continue
        # apply the deletion vector client-side: each add is a single
        # file, so _metadata.row_index alone keys the anti-join
        reader = spark.read
        if read_schema is not None:
            reader = reader.schema(read_schema)
        df = reader.parquet(add["path"]) \
            .select("*", F.col("_metadata.row_index").alias("__ri"))
        if dv.get("storageType") == "i":
            from delta_sharing_spark.plans.dvcodec import (
                decode_inline_dv)

            dv_rows = spark.createDataFrame(
                [(ri,) for ri in
                 decode_inline_dv(dv["pathOrInlineDv"],
                                  dv.get("sizeInBytes"))],
                "__ri long")
        else:
            dv_rows = (
                spark.read.parquet(dv["pathOrInlineDv"])
                .filter(F.col("path") == file_id)
                .select(F.col("row_index").alias("__ri"))
            )
        df = df.join(F.broadcast(dv_rows), "__ri", "left_anti")
        if row_ids:
            # deleted rows keep their positions: row_index is the
            # pre-deletion physical index, so surviving ids stay stable
            df = _attach_row_ids(
                df.withColumnRenamed("__ri", "__rt_ri"), mat_id, mat_ver,
                F.lit(add["baseRowId"]),
                F.lit(add.get("defaultRowCommitVersion")).cast("long"))
        else:
            df = df.drop("__ri")
        for name, value in (add.get("partitionValues") or {}).items():
            col = (F.lit(None) if value == "" or value is None
                   else F.lit(value))
            df = df.withColumn(name, col.cast(type_of[name]))
        parts.append(finish(df))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def profile_lines_to_spark(spark: SparkSession,
                           lines: list[dict[str, Any]],
                           row_ids: bool = False) -> DataFrame:
    """Parquet-profile query response → DataFrame: the HTTP twin of the
    in-engine read path (reference client's table assembly,
    python/delta_sharing/reader.py:630-674 converters + null-fill).

    Reads every ``file`` line's parquet url, applies inline/path deletion
    vectors client-side, attaches typed partition values from
    partitionValues, and normalizes to the shared schemaString (cast +
    null-fill + column order). ``row_ids=True`` reconstructs
    ``_row_id``/``_row_commit_version`` from the file lines'
    ``baseRowId``/``defaultRowCommitVersion`` (this engine's parquet
    profile includes them as optional extras) — the remote twin of
    ``SharedTable.to_df(row_ids=True)``."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema: T.StructType | None = None
    config: dict[str, Any] = {}
    files: list[dict[str, Any]] = []
    for line in lines:
        if "metaData" in line and "schemaString" in line["metaData"]:
            schema = T.StructType.fromJson(
                json.loads(line["metaData"]["schemaString"]))
            config = line["metaData"].get("configuration") or {}
        elif "file" in line:
            files.append(line["file"])
    if schema is None:
        raise ValueError("response lacks a metaData line with schemaString")
    rt_extras = ["_row_id", "_row_commit_version"] if row_ids else []
    if row_ids:
        _check_base_row_ids([(f.get("id"), f.get("baseRowId"))
                             for f in files])
    if not files:
        out_schema = T.StructType(
            list(schema.fields)
            + [T.StructField(c, T.LongType(), True) for c in rt_extras])
        return spark.createDataFrame([], out_schema)
    type_of = {f.name: f.dataType for f in schema.fields}
    mat_id, mat_ver = _row_tracking_cols(config)
    from delta_sharing_spark.table import SharedTable

    if row_ids:
        read_schema = _rt_read_schema(
            [(f.name, SharedTable._cast_type(f.dataType))
             for f in schema.fields],
            mat_id, mat_ver)
    else:
        # explicit declared schema, nullability-relaxed: footer inference
        # on a type-widened table is file-order dependent (see
        # delta_lines_to_spark); partition columns null-fill here and the
        # typed partitionValues overwrite below
        read_schema = T.StructType([
            T.StructField(f.name, SharedTable._cast_type(f.dataType), True)
            for f in schema.fields])

    def normalize(df: DataFrame) -> DataFrame:
        lower = {c.lower(): c for c in df.columns}
        return df.select(*([
            (F.col(lower[fld.name.lower()])
             .cast(SharedTable._cast_type(fld.dataType))
             if fld.name.lower() in lower
             else F.lit(None).cast(SharedTable._cast_type(fld.dataType)))
            .alias(fld.name)
            for fld in schema.fields
        ] + [F.col(c) for c in rt_extras]))

    scan_path = F.url_decode(F.regexp_replace(
        F.regexp_replace(F.input_file_name(), "^file:(//)?", ""),
        r"\+", "%2B"))
    parts: list[DataFrame] = []
    # clean files read in ONE grouped scan — plan size stays O(1) in file
    # count, partition values attach via a broadcast path join (per-file
    # plan nodes at 10k+ files are a driver-side planning blow-up)
    clean = [f for f in files if not f.get("deletionVector")]
    if clean:
        pv_keys = sorted({k for f in clean
                          for k in (f.get("partitionValues") or {})})
        reader = spark.read
        if read_schema is not None:
            reader = reader.schema(read_schema)
        df = reader.parquet(*[f["url"] for f in clean])
        if row_ids:
            df = df.select("*",
                           F.col("_metadata.row_index").alias("__rt_ri"))
        if pv_keys or row_ids:
            meta = spark.createDataFrame(
                [(f["url"],
                  *[(f.get("partitionValues") or {}).get(k) or None
                    for k in pv_keys],
                  *([f.get("baseRowId"),
                     f.get("defaultRowCommitVersion")] if row_ids else []))
                 for f in clean],
                T.StructType(
                    [T.StructField("__path", T.StringType())]
                    + [T.StructField(f"__pv_{k}", T.StringType())
                       for k in pv_keys]
                    + ([T.StructField("__rt_base", T.LongType()),
                        T.StructField("__rt_ver", T.LongType())]
                       if row_ids else [])))
            df = (df.withColumn("__path", scan_path)
                  .join(F.broadcast(meta), "__path").drop("__path"))
            for k in pv_keys:
                df = df.withColumn(
                    k, F.col(f"__pv_{k}").cast(type_of.get(k, "string"))
                ).drop(f"__pv_{k}")
            if row_ids:
                df = _attach_row_ids(df, mat_id, mat_ver,
                                     F.col("__rt_base"),
                                     F.col("__rt_ver")) \
                    .drop("__rt_base", "__rt_ver")
        parts.append(normalize(df))
    for f in files:
        dv = f.get("deletionVector")
        if not dv:
            continue
        reader = spark.read
        if read_schema is not None:
            reader = reader.schema(read_schema)
        df = reader.parquet(f["url"]) \
            .select("*", F.col("_metadata.row_index").alias("__ri"))
        if dv.get("storageType") == "i":
            from delta_sharing_spark.plans.dvcodec import decode_inline_dv

            dv_rows = spark.createDataFrame(
                [(ri,) for ri in
                 decode_inline_dv(dv["pathOrInlineDv"],
                                  dv.get("sizeInBytes"))],
                "__ri long")
        else:
            dv_rows = (
                spark.read.parquet(dv["pathOrInlineDv"])
                .filter(F.col("path") == f.get("id"))
                .select(F.col("row_index").alias("__ri"))
            )
        df = df.join(F.broadcast(dv_rows), "__ri", "left_anti")
        if row_ids:
            # surviving rows keep their pre-deletion physical index, so
            # reconstructed ids are stable across the DV delete
            df = _attach_row_ids(
                df.withColumnRenamed("__ri", "__rt_ri"), mat_id, mat_ver,
                F.lit(f["baseRowId"]),
                F.lit(f.get("defaultRowCommitVersion")).cast("long"))
        else:
            df = df.drop("__ri")
        for name, value in (f.get("partitionValues") or {}).items():
            col = (F.lit(None) if value == "" or value is None
                   else F.lit(value))
            df = df.withColumn(name, col.cast(type_of.get(name, "string")))
        parts.append(normalize(df))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
