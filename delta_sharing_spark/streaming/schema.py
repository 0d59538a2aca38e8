"""Schema read-compatibility for streaming reads.

Mirrors the reference's gate (client/.../spark/util/SchemaUtils.scala:37-90
``isReadCompatible``): a metadata (schema) change observed mid-stream is
readable iff

- every existing column still exists with an equal data type;
- nullability may only relax (non-null -> nullable), never tighten;
- columns added to the new schema must be nullable.

A violation stops the stream with a clear error instead of silently
mis-reading files written under the old schema.
"""

from __future__ import annotations

from pyspark.sql import types as T


class SchemaCompatError(Exception):
    pass


def _field_map(schema: T.StructType) -> dict[str, T.StructField]:
    return {f.name.lower(): f for f in schema.fields}


def is_read_compatible(existing: T.StructType, new: T.StructType) -> bool:
    """Can a reader planned on ``existing`` consume data under ``new``?"""
    existing_map = _field_map(existing)
    new_map = _field_map(new)
    for name, old_field in existing_map.items():
        new_field = new_map.get(name)
        if new_field is None:
            return False
        if new_field.dataType != old_field.dataType:
            return False
        if old_field.nullable and not new_field.nullable:
            return False  # nullability tightened
    for name, new_field in new_map.items():
        if name not in existing_map and not new_field.nullable:
            return False  # new non-nullable column
    return True


def check_read_compatible(existing: T.StructType, new: T.StructType,
                          version: int | None = None) -> None:
    if not is_read_compatible(existing, new):
        where = f" at version {version}" if version is not None else ""
        raise SchemaCompatError(
            f"incompatible schema change detected{where}: existing="
            f"{existing.simpleString()} new={new.simpleString()}; restart the "
            f"stream to pick up the new schema")
