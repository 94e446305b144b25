"""Canonical test fixture — the reference's "Location" record translated
to Spark (reference fixtures.go:10-32 schema, :41-46 canonical row).

Partition column = user_id, key column = timestamp (epoch ms as long,
reference fixtures.go:29 convention)."""

from pyspark.sql import Row
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LOCATION_SCHEMA = StructType([
    StructField("accuracy", DoubleType(), True),
    StructField("altitude", DoubleType(), True),
    StructField("altitudeAccuracy", DoubleType(), True),
    StructField("course", DoubleType(), True),
    StructField("features", ArrayType(StringType()), False),
    StructField("latitude", DoubleType(), False),
    StructField("longitude", DoubleType(), False),
    StructField("speed", DoubleType(), True),
    StructField("source", StringType(), False),
    StructField("timestamp", LongType(), False),
    StructField("user_id", StringType(), False),
])

PARTITION_COL = "user_id"
KEY_COL = "timestamp"


def location_row(timestamp=100000, user_id="userid1", latitude=37.0,
                 longitude=-121.0, **overrides):
    """The canonical row (reference fixtures.go:41-46) with overrides."""
    base = dict(
        accuracy=None, altitude=None, altitudeAccuracy=None, course=None,
        features=["osm-2332"], latitude=latitude, longitude=longitude,
        speed=None, source="device", timestamp=timestamp, user_id=user_id,
    )
    base.update(overrides)
    return Row(**base)


def location_df(spark, rows):
    return spark.createDataFrame(rows, LOCATION_SCHEMA)
