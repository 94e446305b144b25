from iceberg_core_spark.sources.avro_ocf import (
    read_avro_ocf,
    write_avro_ocf,
)

__all__ = ["read_avro_ocf", "write_avro_ocf"]
