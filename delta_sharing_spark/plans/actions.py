"""Log action model.

Mirrors the reference wire model (PROTOCOL.md:3537-3734 — ``protocol`` /
``metaData`` / ``file``(add) / ``cdf`` / ``remove`` single-key wrapper lines;
Scala twin server/src/main/scala/io/delta/sharing/server/model.scala:1-303,
Python twin python/delta_sharing/protocol.py:194-376) but is a fresh design:
actions live in newline-delimited JSON commit files, one file per table
version, and carry repo-relative paths instead of pre-signed URLs (no expiring
URLs inside one engine — SURVEY.md §2.3 "URL signing: N/A").
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from typing import Any

PROTOCOL_READER_VERSION = 1


@dataclass
class Protocol:
    """Reader-version gate (PROTOCOL.md:3549-3568). ``minWriterVersion``
    appears on protocol-upgrade commit actions written by delta writers;
    kept optional so replaying such logs round-trips."""

    minReaderVersion: int = PROTOCOL_READER_VERSION
    minWriterVersion: int | None = None

    def wrap(self) -> dict[str, Any]:
        return {"protocol": {k: v for k, v in asdict(self).items()
                             if v is not None}}


@dataclass
class Metadata:
    """Table metadata (PROTOCOL.md:3569-3613).

    ``schemaString`` is a serialized Spark SQL JSON StructType — the protocol
    explicitly defers to Catalyst's format (PROTOCOL.md:3741-3744), so on the
    Spark side it round-trips through ``StructType.fromJson`` with zero
    translation.
    """

    id: str
    name: str | None = None
    description: str | None = None
    format: dict[str, str] = field(default_factory=lambda: {"provider": "parquet"})
    schemaString: str = ""
    partitionColumns: list[str] = field(default_factory=list)
    configuration: dict[str, str] = field(default_factory=dict)
    createdTime: int | None = None

    def wrap(self) -> dict[str, Any]:
        return {"metaData": asdict(self)}

    @property
    def cdf_enabled(self) -> bool:
        """ref: delta.enableChangeDataFeed check,
        server/.../DeltaSharingCDCReader.scala:327-329. Both Delta's
        ``delta.``-prefixed property and the bare spelling enable it."""
        cfg = self.configuration
        return (cfg.get("delta.enableChangeDataFeed",
                        cfg.get("enableChangeDataFeed", ""))
                .lower() == "true")


@dataclass
class AddFile:
    """A data file added at some version (PROTOCOL.md:3614-3676).

    ``partitionValues`` keeps the reference's string serialization (empty
    string = null, PROTOCOL.md:3896-3906) even though files also live under
    Hive-style partition directories — the map is what predicate pruning
    evaluates against, exactly like the reference evaluates
    ``Cast(partitionValues[name], dt)`` (client/.../RemoteDeltaFileIndex.scala:96-101).

    ``stats`` is a JSON string with numRecords / minValues / maxValues /
    nullCount mirroring the data schema (PROTOCOL.md:3908-4013).

    ``baseRowId`` is the Delta row-tracking base (Delta protocol "Row
    Tracking"): the fresh row id of this file's first physical row; row
    ``i`` of the file has id ``baseRowId + i`` unless a materialized
    row-id column overrides it. ``None`` on tables without the feature
    (and omitted from the wire form, so plain logs are byte-stable).
    """

    path: str
    partitionValues: dict[str, str] = field(default_factory=dict)
    size: int = 0
    stats: str | None = None
    dataChange: bool = True
    version: int | None = None
    timestamp: int | None = None
    baseRowId: int | None = None
    # Delta row tracking: the commit version whose write produced this
    # file's rows — COPIED on same-path re-adds (DV attach, restore), so a
    # row's _row_commit_version survives metadata-level rewrites of its
    # file. Stamped to the commit version at replay when absent.
    defaultRowCommitVersion: int | None = None
    # Deletion-vector descriptor (Delta protocol shape, adapted): the DV is
    # a parquet file of (path, row_index) rows under ``_dv/`` naming the
    # physical positions logically deleted from this data file. Packing
    # several files' DVs into one parquet mirrors Delta's multi-DV files
    # (offset-based there; keyed by the ``path`` column here).
    # {"storageType": "u", "pathOrInlineDv": <rel path>, "cardinality": N,
    #  "sizeInBytes": n}
    deletionVector: dict[str, Any] | None = None

    def wrap(self) -> dict[str, Any]:
        # hand-built in dataclass field order (same bytes as the former
        # asdict form): wrap() runs once per add in checkpoint/sidecar
        # builds — dataclasses.asdict's recursive deep copy was ~half the
        # per-row serialization cost at 10M files
        d: dict[str, Any] = {
            "path": self.path,
            "partitionValues": dict(self.partitionValues),
            "size": self.size,
            "stats": self.stats,
            "dataChange": self.dataChange,
            "version": self.version,
            "timestamp": self.timestamp,
        }
        if self.baseRowId is not None:
            d["baseRowId"] = self.baseRowId
        if self.defaultRowCommitVersion is not None:
            d["defaultRowCommitVersion"] = self.defaultRowCommitVersion
        if self.deletionVector is not None:
            d["deletionVector"] = dict(self.deletionVector)
        return {"add": d}

    def stats_dict(self) -> dict[str, Any]:
        if not self.stats:
            return {}
        try:
            return json.loads(self.stats)
        except (ValueError, TypeError):
            return {}

    @property
    def num_records(self) -> int | None:
        n = self.stats_dict().get("numRecords")
        return int(n) if n is not None else None

    @property
    def dv_cardinality(self) -> int:
        if not self.deletionVector:
            return 0
        return int(self.deletionVector.get("cardinality", 0))

    @property
    def logical_records(self) -> int | None:
        """Physical numRecords minus deletion-vector cardinality — what
        limitHint accounting must use (the reference kernel subtracts DV
        cardinality the same way, DeltaSharedTableKernel.scala:446-449)."""
        n = self.num_records
        return None if n is None else max(0, n - self.dv_cardinality)


@dataclass
class RemoveFile:
    """A data file removed at some version (PROTOCOL.md:3706-3734)."""

    path: str
    partitionValues: dict[str, str] = field(default_factory=dict)
    size: int = 0
    dataChange: bool = True
    version: int | None = None
    timestamp: int | None = None

    def wrap(self) -> dict[str, Any]:
        return {"remove": asdict(self)}


@dataclass
class AddCDCFile:
    """A change-data file (PROTOCOL.md:3677-3705) — rows carry their own
    ``_change_type`` column including update_preimage/update_postimage."""

    path: str
    partitionValues: dict[str, str] = field(default_factory=dict)
    size: int = 0
    version: int | None = None
    timestamp: int | None = None

    def wrap(self) -> dict[str, Any]:
        return {"cdc": asdict(self)}


@dataclass
class DomainMetadata:
    """Delta ``domainMetadata`` action (Delta protocol "Domain Metadata"):
    a named metadata domain whose ``configuration`` (a JSON string) is
    replayed into the snapshot with last-writer-wins semantics;
    ``removed=true`` tombstones the domain. Persisted in checkpoints like
    metadata. Row tracking stores its ``rowIdHighWaterMark`` under the
    ``delta.rowTracking`` domain, exactly as Delta does — and two commits
    writing the same domain conflict (Delta's ConflictChecker domain rule),
    which is what makes concurrent row-id allocation safe."""

    domain: str
    configuration: str = ""
    removed: bool = False

    def wrap(self) -> dict[str, Any]:
        return {"domainMetadata": asdict(self)}

    def config_dict(self) -> dict[str, Any]:
        try:
            return json.loads(self.configuration) if self.configuration \
                else {}
        except ValueError:
            return {}


@dataclass
class CommitInfo:
    """Operation provenance per version (used for timestamp->version maps,
    ref server/.../DeltaSharingHistoryManager.scala:47-115)."""

    version: int
    timestamp: int
    operation: str
    operationParameters: dict[str, str] = field(default_factory=dict)
    operationMetrics: dict[str, str] = field(default_factory=dict)
    # delta.enableInCommitTimestamps (Delta inCommitTimestamp writer
    # feature): the authoritative commit time stored IN the commit payload,
    # immune to log-file mtime skew across storage systems
    inCommitTimestamp: int | None = None

    def wrap(self) -> dict[str, Any]:
        d = asdict(self)
        if d.get("inCommitTimestamp") is None:
            d.pop("inCommitTimestamp", None)  # wire-stable for plain tables
        return {"commitInfo": d}


_ACTION_TYPES = {
    "protocol": Protocol,
    "metaData": Metadata,
    "add": AddFile,
    "remove": RemoveFile,
    "cdc": AddCDCFile,
    "commitInfo": CommitInfo,
    "domainMetadata": DomainMetadata,
}

Action = (Protocol | Metadata | AddFile | RemoveFile | AddCDCFile
          | CommitInfo | DomainMetadata)


def parse_action(line: str) -> Action | None:
    """Parse one NDJSON action line (single-key wrapper, PROTOCOL.md:3537-3548)."""
    obj = json.loads(line)
    for key, cls in _ACTION_TYPES.items():
        if key in obj:
            return cls(**obj[key])
    return None


def dumps_action(action: Action) -> str:
    return json.dumps(action.wrap(), separators=(",", ":"), default=str)
