"""Custom IoT sensor connector via Spark 4's Python DataSource API.

The north star names "Structured Streaming + IoT connectors"; the reference
ingests static IoT-23 CSV dumps and names no live broker (`README.md:82-91`),
so the engine ships a broker-independent connector skeleton: a DataSource
that yields deterministic simulated sensor readings, registered under the
format name ``iot_sensors`` and usable both batch and streaming::

    spark.dataSource.register(IoTSensorDataSource)
    df = spark.read.format("iot_sensors").option("devices", 10).load()
    s  = spark.readStream.format("iot_sensors").option("rows_per_batch", 100).load()

Readings are pure integer-arithmetic functions of (device_id, seq), so the
batch output is reproducible anywhere — including in SQL — which is what
makes the connector oracle-checkable. A real MQTT/Kafka connector swaps the
formula for a client poll inside ``read``; the partition planning, offset
bookkeeping, and schema contract stay exactly as here.

Scale: batch reads are split one InputPartition per device (embarrassingly
parallel); the stream reader tracks a single monotonically increasing
sequence offset per partition batch, the same bookkeeping a partitioned
broker consumer needs.
"""

from __future__ import annotations

import datetime as dt
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SCHEMA = (
    "device_id INT, seq BIGINT, ts TIMESTAMP, temperature DOUBLE,"
    " humidity DOUBLE, status STRING"
)

_BASE = dt.datetime(2024, 1, 1, 0, 0, 0)
_INTERVAL_S = 60


def reading(device_id: int, seq: int) -> tuple:
    """Deterministic sensor reading: integer arithmetic only, so any engine
    (incl. the DuckDB oracle) reproduces it bit-for-bit."""
    temp_centi = 1500 + (device_id * 31 + seq * 7919) % 2000  # 15.00–34.99 °C
    hum_centi = 3000 + (device_id * 17 + seq * 104729) % 5000
    status = "alert" if temp_centi >= 3400 else "ok"
    return (
        device_id,
        seq,
        _BASE + dt.timedelta(seconds=seq * _INTERVAL_S),
        temp_centi / 100.0,
        hum_centi / 100.0,
        status,
    )


class _DevicePartition(InputPartition):
    def __init__(self, device_id: int, n_rows: int):
        self.device_id = device_id
        self.n_rows = n_rows


class IoTSensorBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.devices = int(options.get("devices", 4))
        self.rows_per_device = int(options.get("rows_per_device", 100))

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _DevicePartition(d, self.rows_per_device) for d in range(self.devices)
        ]

    def read(self, partition: _DevicePartition) -> Iterator[tuple]:
        for seq in range(partition.n_rows):
            yield reading(partition.device_id, seq)


class IoTSensorStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader: the offset is the global sequence number; each
    batch advances it by ``rows_per_batch`` readings per device."""

    def __init__(self, options: dict):
        self.devices = int(options.get("devices", 4))
        self.rows_per_batch = int(options.get("rows_per_batch", 50))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict):
        lo = start["seq"]
        hi = lo + self.rows_per_batch
        rows = [
            reading(d, seq)
            for d in range(self.devices)
            for seq in range(lo, hi)
        ]
        return iter(rows), {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            reading(d, seq)
            for d in range(self.devices)
            for seq in range(start["seq"], end["seq"])
        )


class _WriterCommit(WriterCommitMessage):
    """Per-task commit message: the file a task produced + its row count
    (picklable; travels executor → driver)."""

    def __init__(self, path: str, count: int):
        self.path = path
        self.count = count


class IoTSensorWriter(DataSourceWriter):
    """Batch write path of the connector (gateway-push / external-store
    stand-in): each task streams its partition to one JSON-lines file and
    returns a commit message; the DRIVER-side ``commit`` publishes a
    manifest only after every task succeeded — the same two-phase contract
    a real external sink (broker ack, object-store multipart, JDBC txn)
    needs for exactly-once batch output. ``abort`` removes any files the
    failed attempt left behind."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        self.overwrite = overwrite

    def write(self, rows) -> _WriterCommit:
        import json
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fn = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fn, "w") as f:
            for r in rows:
                d = r.asDict()
                d["ts"] = d["ts"].isoformat()
                f.write(json.dumps(d) + "\n")
                n += 1
        return _WriterCommit(fn, n)

    def commit(self, messages) -> None:
        import json

        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(
                {
                    "files": sorted(m.path for m in messages),
                    "rows": sum(m.count for m in messages),
                },
                f,
            )

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(m.path)
                except OSError:
                    pass


class IoTSensorDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iot_sensors"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> IoTSensorBatchReader:
        return IoTSensorBatchReader(self.options)

    def simpleStreamReader(self, schema) -> IoTSensorStreamReader:
        return IoTSensorStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> IoTSensorWriter:
        return IoTSensorWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotently register the connector with a session."""
    spark.dataSource.register(IoTSensorDataSource)


def source_iot_sim(spark, sf_dir: str):
    """Batch read through the custom connector (4 devices × 100 readings).
    The oracle reproduces the reading formula in pure SQL — the connector's
    output is verifiable like any table."""
    register(spark)
    return (
        spark.read.format("iot_sensors")
        .option("devices", 4)
        .option("rows_per_device", 100)
        .load()
    )


def sink_iot_writer(spark, sf_dir: str):
    """Round trip through the connector's WRITE path: batch-read the
    simulator, write via the custom DataSourceWriter (per-task JSON-lines
    files + driver-side manifest commit), read back with the declared
    schema. Values survive exactly (doubles serialize via repr, timestamps
    via isoformat), so the same formula oracle verifies the writer."""
    import tempfile

    register(spark)
    src = (
        spark.read.format("iot_sensors")
        .option("devices", 4)
        .option("rows_per_device", 100)
        .load()
    )
    out = tempfile.mkdtemp(prefix="iot_writer_") + "/sink"
    src.write.format("iot_sensors").mode("append").save(out)
    return spark.read.schema(SCHEMA).json(out)


QUERIES = {
    "source_iot_sim": source_iot_sim,
    "sink_iot_writer": sink_iot_writer,
}

_SIM_ORACLE = (
        "SELECT CAST(d.range AS INTEGER) AS device_id, s.range AS seq,"
        " TIMESTAMP '2024-01-01' + to_seconds(s.range * 60) AS ts,"
        " (1500 + (d.range * 31 + s.range * 7919) % 2000) / 100.0"
        "   AS temperature,"
        " (3000 + (d.range * 17 + s.range * 104729) % 5000) / 100.0"
        "   AS humidity,"
        " CASE WHEN (1500 + (d.range * 31 + s.range * 7919) % 2000) >= 3400"
        "   THEN 'alert' ELSE 'ok' END AS status"
        " FROM range(4) d, range(100) s"
)

ORACLES = {
    "source_iot_sim": _SIM_ORACLE,
    # the writer round trip must reproduce the simulator exactly
    "sink_iot_writer": _SIM_ORACLE,
}
