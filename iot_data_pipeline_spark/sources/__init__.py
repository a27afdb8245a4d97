"""Sources and sinks: schema-enforced CSV scan, parquet table catalog, sinks."""

from iot_data_pipeline_spark.sources.readers import (  # noqa: F401
    IOT_SCHEMA,
    load_table,
    load_tables,
    read_iot_csv,
)
from iot_data_pipeline_spark.sources.sinks import (  # noqa: F401
    write_jdbc,
    write_parquet,
)
