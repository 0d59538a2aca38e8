"""Schema read-compatibility for streaming reads.

Mirrors the reference's gate as *executed* at the streaming call sites
(client/.../spark/DeltaSharingSource.scala:641,998 →
``SchemaUtils.isReadCompatible(schemaToCheck = newly-observed metadata
schema, readSchema = planned schema)``, SchemaUtils.scala:37-94). A
metadata (schema) change observed mid-stream is readable iff

- every column of the NEW schema still exists in the planned schema with a
  case-exact name (columns added or renamed mid-stream stop the stream —
  the reader would otherwise silently drop shared data);
- for columns present in both, the data type matches recursively, where
  nested element/value nullability may only tighten relative to the plan
  (SchemaUtils.scala:43-59);
- a column may NOT go nullable when the plan has it non-nullable (a reader
  planned on a non-null slot would observe nulls); going non-nullable
  (tightening) is fine (SchemaUtils.scala:86);
- columns dropped from the new schema are read-compatible — the planned
  reader simply sees nulls for them (SchemaUtils.scala:80-82, "new fields
  are fine, they just won't be returned").

Note the reference's doc comment (SchemaUtils.scala:32-35) describes the
*opposite* argument order used by RemoteDeltaLog.scala:254 for batch
snapshot refresh; we implement the code's behavior at the streaming call
site, which is the gate this module serves.

A violation stops the stream with a clear error instead of silently
mis-reading files written under the old schema.
"""

from __future__ import annotations

from pyspark.sql import types as T


class SchemaCompatError(Exception):
    pass


class RetryableSchemaEvolution(SchemaCompatError):
    """The stream stopped at a schema-change boundary AFTER persisting the
    new schema to the schema tracking location: restarting the query picks
    the evolved schema up and continues from the same checkpoint (the
    stepwise evolve-on-restart protocol of Delta's
    ``schemaTrackingLocation``; each non-additive change costs exactly one
    restart because the executor plan schema is fixed for the lifetime of
    a query)."""


class SchemaTrackingLog:
    """Persisted stream read-schema, one JSON entry per evolution
    (``<location>/_schema_log/<seq 20d>.json``), modeled on Delta's
    DeltaSourceMetadataTrackingLog. Entry: ``{"version": v,
    "schemaString": s}`` — plan the stream on schema ``s`` from commit
    ``v`` onward; compat gates apply only at versions >= v (earlier
    history is served through the physical-name projection, which is what
    makes replay across the boundary well-defined)."""

    def __init__(self, location: str):
        import os

        self.dir = os.path.join(location, "_schema_log")

    def _entries(self) -> list[str]:
        import os

        if not os.path.isdir(self.dir):
            return []
        return sorted(f for f in os.listdir(self.dir)
                      if f.endswith(".json"))

    def latest(self) -> dict | None:
        import json
        import os

        names = self._entries()
        if not names:
            return None
        with open(os.path.join(self.dir, names[-1])) as fh:
            return json.load(fh)

    def evolve(self, version: int, schema_string: str) -> None:
        """Append the evolved entry (atomic tempfile+rename; idempotent if
        the latest entry already records this boundary)."""
        import json
        import os
        import tempfile

        cur = self.latest()
        if cur is not None and cur["version"] == version \
                and cur["schemaString"] == schema_string:
            return
        os.makedirs(self.dir, exist_ok=True)
        seq = len(self._entries())
        payload = json.dumps(
            {"version": version, "schemaString": schema_string})
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)
        os.rename(tmp, os.path.join(self.dir, f"{seq:020d}.json"))


def _field_map(schema: T.StructType) -> dict[str, T.StructField]:
    return {f.name.lower(): f for f in schema.fields}


def _datatype_read_compatible(new_type: T.DataType,
                              planned_type: T.DataType) -> bool:
    """Recursive type check, ref SchemaUtils.scala:43-59: nested
    element/value nullability in the new data must not loosen past the
    planned type."""
    if isinstance(new_type, T.StructType) and \
            isinstance(planned_type, T.StructType):
        return is_read_compatible(planned_type, new_type)
    if isinstance(new_type, T.ArrayType) and \
            isinstance(planned_type, T.ArrayType):
        if new_type.containsNull and not planned_type.containsNull:
            return False
        return _datatype_read_compatible(new_type.elementType,
                                         planned_type.elementType)
    if isinstance(new_type, T.MapType) and isinstance(planned_type, T.MapType):
        if new_type.valueContainsNull and not planned_type.valueContainsNull:
            return False
        return (_datatype_read_compatible(new_type.keyType,
                                          planned_type.keyType)
                and _datatype_read_compatible(new_type.valueType,
                                              planned_type.valueType))
    return new_type == planned_type


def is_read_compatible(existing: T.StructType, new: T.StructType) -> bool:
    """Can a reader planned on ``existing`` consume data under ``new``?"""
    existing_map = _field_map(existing)
    new_map = _field_map(new)
    for name, new_field in new_map.items():
        old_field = existing_map.get(name)
        if old_field is None:
            return False  # column added/renamed mid-stream
        if old_field.name != new_field.name:
            return False  # case change == rename (SchemaUtils.scala:84)
        if not _datatype_read_compatible(new_field.dataType,
                                         old_field.dataType):
            return False
        if new_field.nullable and not old_field.nullable:
            return False  # planned non-null slot could now observe nulls
    # planned columns absent from `new` are fine: read as nulls
    return True


def check_read_compatible(existing: T.StructType, new: T.StructType,
                          version: int | None = None) -> None:
    if not is_read_compatible(existing, new):
        where = f" at version {version}" if version is not None else ""
        raise SchemaCompatError(
            f"incompatible schema change detected{where}: existing="
            f"{existing.simpleString()} new={new.simpleString()}; restart the "
            f"stream to pick up the new schema")


_CM_PHYSICAL_KEY = "delta.columnMapping.physicalName"
_INT_CHAIN = ["byte", "short", "integer", "long"]


def _widenable(src: T.DataType, dst: T.DataType) -> bool:
    """Lossless type widenings (Delta's typeWidening feature set that this
    engine supports end-to-end: Spark 4's parquet reader upcasts each of
    these natively when scanning old narrow files under the new schema)."""
    if src == dst:
        return True
    s, d = src.typeName(), dst.typeName()
    if s in _INT_CHAIN and d in _INT_CHAIN:
        return _INT_CHAIN.index(s) < _INT_CHAIN.index(d)
    if s == "float" and d == "double":
        return True
    if s == "date" and d == "timestamp_ntz":
        return True  # midnight-exact, lossless (Delta date -> timestampNtz)
    if isinstance(src, T.DecimalType) and isinstance(dst, T.DecimalType):
        return (dst.scale >= src.scale
                and dst.precision - dst.scale >= src.precision - src.scale)
    return False


def _widenable_deep(src: T.DataType, dst: T.DataType) -> bool:
    """:func:`_widenable` extended through nested types: a narrow file
    schema is readable under a planned schema whose struct members /
    array elements / map sides are each equal-or-widened (matched by
    name for struct members; no members may appear or vanish and
    nullability may not loosen). This is what lets a stream restarted
    after a NESTED ``widen_column_type`` drain its pre-widen backlog —
    the executor projection casts each nested position losslessly."""
    if _widenable(src, dst):
        return True
    if isinstance(src, T.StructType) and isinstance(dst, T.StructType):
        if [f.name for f in src.fields] != [f.name for f in dst.fields]:
            return False
        return all(
            _widenable_deep(s.dataType, d.dataType)
            and not (s.nullable and not d.nullable)
            for s, d in zip(src.fields, dst.fields))
    if isinstance(src, T.ArrayType) and isinstance(dst, T.ArrayType):
        if src.containsNull and not dst.containsNull:
            return False
        return _widenable_deep(src.elementType, dst.elementType)
    if isinstance(src, T.MapType) and isinstance(dst, T.MapType):
        if src.valueContainsNull and not dst.valueContainsNull:
            return False
        return (_widenable_deep(src.keyType, dst.keyType)
                and _widenable_deep(src.valueType, dst.valueType))
    return False


def is_read_compatible_physical(planned: T.StructType,
                                new: T.StructType) -> bool:
    """The gate for a reader that resolves columns by PHYSICAL name and
    casts on read (this engine's executor projection,
    sources/datasource.py:_read_file_batches): a schema observed in the
    log is admissible iff every column of it maps (by physical name) onto
    a planned column whose type is equal-or-wider with no nullability
    loosening.

    Strictly more permissive than :func:`is_read_compatible` ONLY where
    the physical-name projection makes the reference's hazard impossible:
    a RENAME keeps the physical name (the reader keeps serving the
    planned logical name over the same bytes), and a WIDEN casts
    losslessly — so a stream RESTARTED after rename/widen can drain its
    backlog instead of erroring on the historical metadata commits (the
    restriction Delta's schemaTrackingLocation exists to lift). Everything
    the reference stops on for real data-loss reasons — columns the plan
    cannot represent, narrowing, nullability loosening into a non-null
    slot — still stops the stream."""
    planned_by_phys = {
        (f.metadata or {}).get(_CM_PHYSICAL_KEY, f.name).lower(): f
        for f in planned.fields
    }
    for nf in new.fields:
        phys = (nf.metadata or {}).get(_CM_PHYSICAL_KEY, nf.name).lower()
        pf = planned_by_phys.get(phys)
        if pf is None:
            return False  # data the plan cannot represent -> loss
        if not (_widenable_deep(nf.dataType, pf.dataType)
                or _datatype_read_compatible(nf.dataType, pf.dataType)):
            return False
        if nf.nullable and not pf.nullable:
            return False
    return True


def is_tracking_boundary(planned: T.StructType, new: T.StructType) -> bool:
    """With ``schemaTrackingLocation`` set, a metadata commit is an
    evolution boundary iff the plan should CHANGE to follow it (Delta's
    tracked-schema semantics): the lenient physical gate fails
    (added column / narrowing / nullability loosening / mid-stream widen),
    a planned column was dropped, or a shared physical column's logical
    name changed (rename under column mapping). Equal schemas and
    no-op metadata rewrites (e.g. enabling column mapping, which stamps
    physicalName == current name) are NOT boundaries."""
    if not is_read_compatible_physical(planned, new):
        return True

    def phys(f: T.StructField) -> str:
        return (f.metadata or {}).get(_CM_PHYSICAL_KEY, f.name).lower()

    new_by_phys = {phys(f): f for f in new.fields}
    for pf in planned.fields:
        nf = new_by_phys.get(phys(pf))
        if nf is None or nf.name != pf.name:
            return True  # dropped or renamed: evolve the plan to follow
    return False


def check_read_compatible_physical(planned: T.StructType,
                                   new: T.StructType,
                                   version: int | None = None) -> None:
    if not is_read_compatible_physical(planned, new):
        where = f" at version {version}" if version is not None else ""
        raise SchemaCompatError(
            f"incompatible schema change detected{where}: planned="
            f"{planned.simpleString()} new={new.simpleString()}; restart "
            f"the stream to pick up the new schema")
