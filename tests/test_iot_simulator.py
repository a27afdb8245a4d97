"""Custom Python DataSource connector: batch determinism + micro-batch
stream offset bookkeeping."""

from __future__ import annotations

import time

from iot_data_pipeline_spark.sources import iot_simulator


def test_batch_read_matches_formula(spark):
    iot_simulator.register(spark)
    df = (
        spark.read.format("iot_sensors")
        .option("devices", 2)
        .option("rows_per_device", 5)
        .load()
    )
    got = {(r["device_id"], r["seq"]): r for r in df.collect()}
    assert len(got) == 10
    for (d, s), row in got.items():
        want = iot_simulator.reading(d, s)
        assert row["ts"] == want[2]
        assert row["temperature"] == want[3]
        assert row["status"] == want[5]


def test_stream_reader_advances_offsets(spark):
    iot_simulator.register(spark)
    stream = (
        spark.readStream.format("iot_sensors")
        .option("devices", 3)
        .option("rows_per_batch", 10)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("iot_sim_stream")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.table("iot_sim_stream").count()
            if n >= 60:  # ≥ 2 micro-batches of 3 devices × 10 readings
                break
            time.sleep(0.5)
        rows = spark.table("iot_sim_stream").collect()
    finally:
        q.stop()
    assert len(rows) >= 60
    seen = {(r["device_id"], r["seq"]) for r in rows}
    assert len(seen) == len(rows)  # offsets never re-deliver
    # each delivered row obeys the deterministic formula
    for r in rows[:30]:
        want = iot_simulator.reading(r["device_id"], r["seq"])
        assert (r["temperature"], r["humidity"], r["status"]) == (
            want[3],
            want[4],
            want[5],
        )
    # batches cover contiguous seq prefixes per device
    max_seq = max(s for _, s in seen)
    for d in range(3):
        seqs = sorted(s for dd, s in seen if dd == d)
        assert seqs[0] == 0 and seqs == list(range(len(seqs)))
    assert (max_seq + 1) % 10 == 0


def test_writer_manifest_accounts_all_rows(spark):
    import glob
    import json
    import tempfile

    from iot_data_pipeline_spark.sources import iot_simulator as sim

    sim.register(spark)
    src = (
        spark.read.format("iot_sensors")
        .option("devices", 3)
        .option("rows_per_device", 7)
        .load()
    )
    out = tempfile.mkdtemp(prefix="iot_writer_test_") + "/sink"
    src.write.format("iot_sensors").mode("append").save(out)
    manifest = json.load(open(out + "/_MANIFEST.json"))
    assert manifest["rows"] == 21
    # manifest lists exactly the data files on disk
    assert sorted(manifest["files"]) == sorted(glob.glob(out + "/part-*.jsonl"))
    # read-back (manifest file ignored as _-prefixed) matches the source
    back = spark.read.schema(sim.SCHEMA).json(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
