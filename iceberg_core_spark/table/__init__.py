"""Native Iceberg-style table layer on Parquet + JSON manifests.

Reproduces the reference's storage semantics (SURVEY.md §1.5, §2.A) —
identity partitioning, key clustering, per-file min/max pruning, content
hashing — with true min/max (the reference's `updateInt64KeyRange` bug,
reference block.go:41-43, is deliberately NOT replicated).
"""

from iceberg_core_spark.table.catalog import IceCatalog
from iceberg_core_spark.table.ice_table import IceTable, MaintenancePolicy
from iceberg_core_spark.table.manifest import (
    CommitConflictError,
    Manifest,
    ManifestFile,
    Snapshot,
)
from iceberg_core_spark.table.rollup import MaterializedRollup, OhlcRollup

__all__ = ["CommitConflictError", "IceCatalog", "IceTable",
           "MaintenancePolicy", "Manifest", "ManifestFile",
           "MaterializedRollup", "OhlcRollup", "Snapshot"]
