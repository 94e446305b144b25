"""IceCatalog — a warehouse directory of named IceTables.

Minimal catalog semantics (the reference has none — each adapter is
constructed ad hoc, SURVEY.md §2.C): tables live under
``<warehouse>/<name>``; the catalog lists/creates/loads/drops them and
registers them as SQL views in one call. At scale the listing is a
cheap directory scan of manifest markers; a real deployment would back
this with a metastore service — the API is the stable part."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from iceberg_core_spark.table.ice_table import IceTable


class IceCatalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def _root(self, name: str) -> str:
        # empty name would resolve to the warehouse root itself —
        # drop_table("") would then rmtree the entire warehouse
        if not name or not name.strip() or "/" in name or name.startswith("."):
            raise ValueError(f"invalid table name {name!r}")
        return os.path.join(self.warehouse, name)

    def create_table(self, name: str, df: DataFrame, **kwargs) -> IceTable:
        return IceTable.create(self.spark, self._root(name), df, **kwargs)

    def load_table(self, name: str) -> IceTable:
        root = self._root(name)
        t = IceTable(self.spark, root)
        if t.manifest.current_snapshot_id() is None:
            raise FileNotFoundError(f"no table {name!r} in {self.warehouse}")
        return t

    def table_exists(self, name: str) -> bool:
        try:
            self.load_table(name)
            return True
        except FileNotFoundError:
            return False

    def list_tables(self) -> list[str]:
        out = []
        for entry in sorted(os.listdir(self.warehouse)):
            full = os.path.join(self.warehouse, entry)
            if os.path.isdir(full) and IceTable(
                self.spark, full
            ).manifest.current_snapshot_id() is not None:
                out.append(entry)
        return out

    def drop_table(self, name: str) -> None:
        root = self._root(name)
        if not self.table_exists(name):
            raise FileNotFoundError(f"no table {name!r} in {self.warehouse}")
        shutil.rmtree(root)

    def register_views(self) -> list[str]:
        """Register every table as a temp view (SQL over the warehouse)."""
        names = self.list_tables()
        for n in names:
            self.load_table(n).to_view(n)
        return names
