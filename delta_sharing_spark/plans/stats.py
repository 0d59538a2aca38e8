"""Per-file statistics from Parquet footers.

The reference ships per-file ``stats`` JSON (numRecords / minValues /
maxValues / nullCount, PROTOCOL.md:3908-4013) that powers V2 stats-based file
skipping (server/.../JsonPredicateEvaluatorV2.scala). We derive the same
stats from Parquet footer metadata — no second data scan, which is the only
approach that holds at 100 TB: footers are O(KB) per file regardless of file
size, and collection parallelizes per file.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
from typing import Any

import pyarrow.parquet as pq


def _to_jsonable(value: Any) -> Any:
    """Serialize a stats value the way the reference serializes partition
    values / stats: ISO strings for dates and timestamps (PROTOCOL.md:3896-3906)."""
    if isinstance(value, _dt.datetime):
        return value.isoformat(sep=" ")
    if isinstance(value, _dt.date):
        return value.isoformat()
    if isinstance(value, bytes):
        try:
            return value.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(value, float) and (math.isnan(value) or math.isinf(value)):
        return None
    return value


def _struct_leaf_paths(schema) -> set[str]:
    """Dotted paths of every leaf reachable through STRUCT nesting only —
    list/map element paths (``arr.list.element`` etc.) are excluded, and a
    top-level field whose own name contains a literal dot never appears
    (it would be ambiguous with a nested path; such columns stay
    statless, as before)."""
    import pyarrow as pa

    out: set[str] = set()

    def walk(field, prefix: tuple) -> None:
        if pa.types.is_struct(field.type):
            if "." in field.name:
                return
            for i in range(field.type.num_fields):
                walk(field.type.field(i), prefix + (field.name,))
        elif prefix and "." not in field.name:
            out.add(".".join(prefix + (field.name,)))

    for f in schema:
        walk(f, ())
    return out


def _nest(flat: dict) -> dict:
    """Dotted-key flat dict -> the protocol's nested stats object shape
    (PROTOCOL.md:3908-4013: minValues/maxValues/nullCount mirror the data
    schema's nesting)."""
    out: dict = {}
    for k, v in flat.items():
        if "." not in k:
            out[k] = v
            continue
        parts = k.split(".")
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out


def collect_file_stats(file_path: str) -> tuple[int, str]:
    """Return ``(size_hint_rows, stats_json)`` for one parquet file.

    min/max are aggregated across row groups; columns whose footer lacks
    statistics simply do not appear in minValues/maxValues — the pruning layer
    treats missing stats as Unknown and never skips on them
    (ref JsonPredicateEvaluatorV2.scala:20-52 three-valued logic).

    Struct-nested leaves (r11) emit as NESTED stats objects mirroring the
    schema, the reference's shape (PROTOCOL.md:3908-4013) — so struct-field
    predicates prune on min/max like any top-level column. List/map
    element stats stay out (no row-level predicate maps onto them).
    """
    pf = pq.ParquetFile(file_path)
    meta = pf.metadata
    struct_leaves = _struct_leaf_paths(pf.schema_arrow)
    num_records = meta.num_rows
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    nulls: dict[str, int] = {}
    failed: set[str] = set()
    ncols = meta.num_columns
    for rg_idx in range(meta.num_row_groups):
        rg = meta.row_group(rg_idx)
        for c_idx in range(ncols):
            col = rg.column(c_idx)
            name = col.path_in_schema
            if "." in name and name not in struct_leaves:
                continue  # list/map elements or ambiguous literal-dot names
            st = col.statistics
            if st is None:
                continue
            if st.null_count is not None:
                nulls[name] = nulls.get(name, 0) + st.null_count
            if st.has_min_max:
                try:
                    mn, mx = _to_jsonable(st.min), _to_jsonable(st.max)
                except Exception:
                    # pyarrow cannot decode every footer stat encoding
                    # (e.g. INT32-backed decimals raise
                    # ArrowNotImplementedError). The WHOLE column must
                    # then go statless: keeping other row groups' min/max
                    # would under-cover the file and stats pruning would
                    # silently skip matching rows — no min/max means the
                    # pruning layer treats it as Unknown (never skips)
                    failed.add(name)
                    continue
                if mn is not None:
                    mins[name] = mn if name not in mins else min(mins[name], mn)
                if mx is not None:
                    maxs[name] = mx if name not in maxs else max(maxs[name], mx)
    for name in failed:
        mins.pop(name, None)
        maxs.pop(name, None)
    stats = {
        "numRecords": num_records,
        "minValues": _nest(mins),
        "maxValues": _nest(maxs),
        "nullCount": _nest(nulls),
    }
    return num_records, json.dumps(stats, separators=(",", ":"), default=str)
