"""IceCatalog + table stats."""

import pytest

from iceberg_core_spark.table import IceCatalog
from tests.fixtures import KEY_COL, PARTITION_COL, location_df, location_row


@pytest.fixture()
def catalog(spark, tmp_path):
    return IceCatalog(spark, str(tmp_path / "warehouse"))


def _rows(users=("u1", "u2"), ts=(1, 2)):
    return [location_row(timestamp=t, user_id=u) for u in users for t in ts]


def test_create_list_load_drop(spark, catalog):
    catalog.create_table("locations", location_df(spark, _rows()),
                         partition_col=PARTITION_COL, key_col=KEY_COL)
    catalog.create_table("locations2", location_df(spark, _rows()))
    assert catalog.list_tables() == ["locations", "locations2"]
    t = catalog.load_table("locations")
    assert t.scan().count() == 4
    catalog.drop_table("locations2")
    assert catalog.list_tables() == ["locations"]
    with pytest.raises(FileNotFoundError):
        catalog.load_table("locations2")


def test_register_views_sql(spark, catalog):
    catalog.create_table("locs", location_df(spark, _rows()),
                         partition_col=PARTITION_COL, key_col=KEY_COL)
    assert catalog.register_views() == ["locs"]
    assert spark.sql("SELECT count(*) n FROM locs").first().n == 4


def test_invalid_table_names(spark, catalog):
    with pytest.raises(ValueError):
        catalog._root("../escape")
    with pytest.raises(ValueError):
        catalog._root(".hidden")


def test_stats_metadata_only(spark, catalog):
    t = catalog.create_table("locs", location_df(spark, _rows()),
                             partition_col=PARTITION_COL, key_col=KEY_COL)
    t.delete_where("timestamp = 999", mode="mor")
    s = t.stats()
    assert s["rows"] == 4 and s["files"] >= 2
    assert s["pending_mor_deletes"] == 1
    assert set(s["partitions"]) == {"u1", "u2"}
    assert s["partitions"]["u1"]["rows"] == 2
