"""Reader/sink contract tests: CSV scan options, parquet round trip,
sorted-write path, multimodal stubs."""

from __future__ import annotations

import os

import pytest

from iot_data_pipeline_spark.functions.scalar_suites import _write_csv_fixture
from iot_data_pipeline_spark.operators import multimodal
from iot_data_pipeline_spark.operators._util import table
from iot_data_pipeline_spark.sources.readers import IOT_SCHEMA, read_iot_csv
from iot_data_pipeline_spark.sources.sinks import write_parquet


def test_csv_contract(spark):
    root = _write_csv_fixture()
    df = read_iot_csv(spark, root)
    rows = {r["uid"]: r for r in df.collect()}
    assert len(rows) == 4  # recursive lookup found the nested file
    assert df.schema == IOT_SCHEMA  # enforced, not inferred
    # '-' sentinel → NULL (both string and long columns)
    assert rows["u4"]["duration"] is None
    assert rows["u2"]["orig_bytes"] is None
    assert rows["u4"][21] is None  # detailed-label


def test_parquet_roundtrip_sorted(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_sorted")
    write_parquet(src, out, sort_within_partitions=["n_nationkey"])
    back = spark.read.parquet(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_csv_malformed_row_modes(spark, tmp_path):
    """Reader robustness: PERMISSIVE (default) nulls out unparsable fields;
    FAILFAST raises — the two ingestion postures for dirty IoT dumps."""
    bad = tmp_path / "bad"
    bad.mkdir()
    header = ",".join(f.name for f in IOT_SCHEMA.fields)
    # id.orig_p should be int — 'notaport' is malformed
    (bad / "rows.csv").write_text(
        header
        + "\nu1,10.0.0.1,notaport,10.0.0.2,443,tcp,http,-,"
        + ",".join(["-"] * 14)
        + "\n"
    )
    permissive = read_iot_csv(spark, str(bad)).collect()
    assert len(permissive) == 1 and permissive[0]["id.orig_p"] is None

    with pytest.raises(Exception, match="(?i)malformed"):
        read_iot_csv(spark, str(bad), mode="FAILFAST").collect()


def test_jdbc_writer_contract(spark, sf_dir, monkeypatch):
    """The JDBC sink (reference S3) must forward the batched-write contract
    (batchsize, socket timeout, driver, credentials) — asserted against a
    stubbed writer since no JDBC endpoint exists in CI."""
    from iot_data_pipeline_spark.sources.sinks import write_jdbc

    captured = {}

    class FakeWriter:
        def jdbc(self, url, table, mode, properties):
            captured.update(url=url, table=table, mode=mode, **properties)

    df = table(spark, sf_dir, "nation")
    monkeypatch.setattr(type(df), "write", property(lambda self: FakeWriter()))
    write_jdbc(df, "jdbc:clickhouse://ch:8123/default", "iot_data", "u", "pw")
    assert captured["batchsize"] == "100000"
    assert captured["socket_timeout"] == "300000"
    assert captured["mode"] == "append" and captured["table"] == "iot_data"
    assert captured["driver"].endswith("ClickHouseDriver")


def test_jdbc_roundtrip_embedded_derby(spark, sf_dir):
    """REAL JDBC integration (reference S3 shape): batched df.write.jdbc →
    spark.read.jdbc against embedded Derby (ships in Spark's jars/), no
    external endpoint needed. Covers table creation, append batching, type
    mapping, and filter pushdown into the JDBC scan."""
    from iot_data_pipeline_spark.sources.sinks import write_jdbc

    url = "jdbc:derby:memory:roundtrip;create=true"
    derby = "org.apache.derby.jdbc.EmbeddedDriver"
    src = table(spark, sf_dir, "nation")
    write_jdbc(
        df=src, url=url, table="nation_rt", user="app", password="app",
        driver=derby, mode="overwrite", batchsize=7,
    )
    props = {"driver": derby}
    back = spark.read.jdbc(url, "nation_rt", properties=props)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    # appending doubles the row count (the reference's load step is append)
    write_jdbc(
        df=src, url=url, table="nation_rt", user="app", password="app",
        driver=derby, mode="append",
    )
    assert spark.read.jdbc(url, "nation_rt", properties=props).count() == 2 * src.count()
    # predicate pushdown reaches the JDBC scan
    filtered = spark.read.jdbc(url, "nation_rt", properties=props).filter(
        "n_regionkey = 0"
    )
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(n_regionkey,0)" in plan


def test_parquet_schema_evolution(spark, tmp_path):
    """Data-lake schema evolution: files written before a column existed
    merge cleanly (mergeSchema), old rows reading NULL for the new column."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id LONG, v1 STRING").write.parquet(
        out + "/batch=0"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id LONG, v1 STRING, v2 DOUBLE"
    ).write.parquet(out + "/batch=1")
    merged = spark.read.option("mergeSchema", True).parquet(out)
    rows = {r["id"]: r for r in merged.collect()}
    assert set(merged.columns) == {"id", "v1", "v2", "batch"}
    assert rows[1]["v2"] is None and rows[2]["v2"] == 9.5


def test_decode_media_unknown_format_raises():
    """Formats needing external codec libs stay honestly unimplemented
    (MP4 — the permanent seam; PNG and baseline JPEG graduated to real
    decoders)."""
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x00\x00\x00\x18ftypmp42", "video/mp4")


def test_decode_media_jpeg_dc_roundtrip():
    """synth_jpeg → decode_media is pixel-exact: DC-only blocks under the
    all-ones quant table invert to the closed pixel formula, while the DC
    Huffman delta chain (variable categories, negative diffs) is real."""
    import numpy as np

    for mid, wb, hb in [(0, 1, 1), (7, 3, 2), (123, 4, 4), (255, 2, 5)]:
        blob = multimodal.synth_jpeg(mid, wb, hb)
        arr, meta = multimodal.decode_media(blob, "image/jpeg")
        assert meta == {"width": wb * 8, "height": hb * 8, "n_components": 1}
        exp = np.zeros((hb * 8, wb * 8), np.uint8)
        for r in range(hb):
            for c in range(wb):
                exp[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = (
                    mid * 7 + r * 31 + c * 13
                ) % 256
        assert (arr == exp).all()


def test_decode_media_jpeg_ac_paths():
    """Dense/sparse AC coefficients drive every entropy construct — EOB,
    ZRL (>16-zero runs), negative EXTEND — and must decode to exactly the
    reference IDCT of the encoded coefficients (same float path)."""
    import numpy as np

    rng = np.random.RandomState(42)
    blocks = np.zeros((2, 3, 8, 8), np.int64)
    for r in range(2):
        for c in range(3):
            b = rng.randint(-30, 31, (8, 8))
            b[rng.rand(8, 8) < 0.7] = 0
            b[0, 0] = rng.randint(-200, 201)
            blocks[r, c] = b
    blocks[0, 0] = 0
    blocks[0, 0][0, 0] = 50
    blocks[0, 0][7, 7] = -3  # 62-zero run → 3×ZRL + coefficient
    blob = multimodal._encode_jpeg([blocks], 24, 16)
    arr, _ = multimodal.decode_media(blob, "image/jpeg")
    exp = np.zeros((16, 24))
    for r in range(2):
        for c in range(3):
            exp[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = multimodal._jpg_idct(
                blocks[r, c]
            )
    assert (arr == np.clip(np.round(exp + 128), 0, 255).astype(np.uint8)).all()


def test_decode_media_jpeg_color_420():
    """3-component 4:2:0: interleaved MCU order (4 luma + 2 chroma blocks),
    replicate chroma upsample, JFIF YCbCr→RGB — checked against the
    conversion formula computed independently."""
    import numpy as np

    y = np.zeros((2, 2, 8, 8), np.int64)
    y[:, :, 0, 0] = [[8 * 10, 8 * 60], [8 * -40, 8 * 100]]
    cb = np.zeros((1, 1, 8, 8), np.int64)
    cb[0, 0, 0, 0] = 8 * 30
    cr = np.zeros((1, 1, 8, 8), np.int64)
    cr[0, 0, 0, 0] = 8 * -20
    blob = multimodal._encode_jpeg(
        [y, cb, cr], 16, 16, sampling=[(2, 2), (1, 1), (1, 1)]
    )
    arr, meta = multimodal.decode_media(blob, "image/jpeg")
    assert meta["n_components"] == 3 and arr.shape == (16, 16, 3)
    Y = np.zeros((16, 16))
    for r in range(2):
        for c in range(2):
            Y[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = y[r, c, 0, 0] / 8 + 128
    exp = np.stack(
        [
            Y + 1.402 * -20.0,
            Y - 0.344136 * 30.0 - 0.714136 * -20.0,
            Y + 1.772 * 30.0,
        ],
        axis=-1,
    )
    assert (arr == np.clip(np.round(exp), 0, 255).astype(np.uint8)).all()


def test_decode_media_jpeg_restart_markers():
    """DRI/RSTn: predictors reset and byte alignment recovers across every
    restart boundary (interval 2 over 12 MCUs → 5 markers)."""
    import numpy as np

    rng = np.random.RandomState(7)
    blocks = (
        rng.randint(-20, 21, (3, 4, 8, 8)) * (rng.rand(3, 4, 8, 8) < 0.5)
    ).astype(np.int64)
    blob = multimodal._encode_jpeg([blocks], 32, 24, restart_interval=2)
    assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))
    arr, _ = multimodal.decode_media(blob, "image/jpeg")
    exp = np.zeros((24, 32))
    for r in range(3):
        for c in range(4):
            exp[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = multimodal._jpg_idct(
                blocks[r, c]
            )
    assert (arr == np.clip(np.round(exp + 128), 0, 255).astype(np.uint8)).all()


def test_decode_media_jpeg_progressive_raises():
    """Non-baseline frames (SOF2 progressive) raise at the seam with the
    frame type named, not a silent wrong decode."""
    import struct

    sof2 = (
        b"\xff\xd8"
        + struct.pack(">BBH", 0xFF, 0xC2, 11)
        + struct.pack(">BHHB", 8, 8, 8, 1)
        + b"\x01\x11\x00\xff\xd9"
    )
    with pytest.raises(NotImplementedError, match="SOF2"):
        multimodal.decode_media(sof2, "image/jpeg")


def test_decode_media_wav_roundtrip():
    """synth_wav → decode_media is lossless: every sample and all metadata
    come back exactly."""
    blob = multimodal.synth_wav(7, 100, sample_rate=8000)
    arr, meta = multimodal.decode_media(blob, "audio/wav")
    assert meta == {"n_channels": 1, "sample_rate": 8000, "n_samples": 100}
    assert len(blob) == 44 + 2 * 100  # RIFF header + PCM16 payload
    expected = [((7 * 131 + i * 7919) % 65536) - 32768 for i in range(100)]
    assert arr.tolist() == expected


def test_decode_media_ppm():
    """Binary P6 parsing: header with comment, pixel array shape/values."""
    import numpy as np

    pixels = bytes(range(2 * 3 * 3))  # 3 wide, 2 high, RGB
    blob = b"P6\n# test comment\n3 2\n255\n" + pixels
    arr, meta = multimodal.decode_media(blob, "image/ppm")
    assert meta == {"width": 3, "height": 2, "maxval": 255}
    assert arr.shape == (2, 3, 3)
    assert arr.dtype == np.uint8
    assert arr.flatten().tolist() == list(pixels)


def test_feature_extract_known_payload(spark, tmp_path):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(doc_id=1, text="abc", lang="en", source="s", n_chars=3)]
    )
    tdir = str(tmp_path / "mm")
    os.makedirs(tdir, exist_ok=True)
    df.write.mode("overwrite").parquet(tdir + "/documents.parquet")
    r = multimodal.mm_feature_extract(spark, tdir).first()
    # bytes of "abc" = 97,98,99
    assert r["feat_dim"] == 4
    assert r["f_len"] == 3.0
    assert r["f_mean"] == 98.0
    assert r["f_min"] == 97.0 and r["f_max"] == 99.0


def _write_events_fixture(tmp_path, unit: str) -> str:
    """Write a 3-row events.parquet with ts in the given parquet unit.

    ``unit='us'`` mirrors the current testdata generation (TIMESTAMP(MICROS),
    isAdjustedToUTC=false → Spark resolves TIMESTAMP_NTZ); ``unit='ns'``
    mirrors the legacy TIMESTAMP(NANOS) generation that Spark can only read
    via the nanosAsLong conf."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = [1_700_000_000_000_000, 1_700_000_123_456_789, 1_700_009_999_000_001]
    ts = pa.array(micros, pa.timestamp("us"))
    if unit == "ns":
        ts = pa.array([m * 1000 for m in micros], pa.timestamp("ns"))
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts,
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(['{"k":1}', "{}", "{}"]),
        }
    )
    d = str(tmp_path / f"sf_{unit}")
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_table_events_ts_generations(spark, tmp_path, unit):
    """Both testdata generations resolve to session-TZ TimestampType with
    identical µs instants (nanos truncate toward µs, DuckDB-compatible)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    from iot_data_pipeline_spark.sources.readers import load_table

    d = _write_events_fixture(tmp_path, unit)
    df = load_table(spark, d, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = [
        r[0]
        for r in df.orderBy("event_id").select(F.unix_micros("ts")).collect()
    ]
    assert got == [
        1_700_000_000_000_000,
        1_700_000_123_456_789,
        1_700_009_999_000_001,
    ]
    # conf did not leak
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") != "true"


def test_load_table_events_real_testdata(spark, sf_dir):
    """The driver's actual parquet loads and unix_micros works downstream."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    from iot_data_pipeline_spark.sources.readers import load_table

    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    assert df.select(F.unix_micros("ts")).first()[0] is not None


def test_load_table_events_ts_filter_pushes_down(spark, sf_dir):
    """Time-range predicates must reach the parquet scan. The µs generation
    is read as TimestampType AT THE SCAN (inferTimestampNTZ off) — a cast
    layer on top of an NTZ column would block pushdown and full-scan the
    table at 100 TB."""
    from pyspark.sql import functions as F

    from iot_data_pipeline_spark.plans import pushed_filters
    from iot_data_pipeline_spark.sources.readers import load_table

    df = load_table(spark, sf_dir, "events")
    flt = df.filter(F.col("ts") >= F.lit("2024-01-02 00:00:00"))
    assert "GreaterThanOrEqual(ts" in pushed_filters(flt)


def test_decode_media_png_roundtrip_all_filters():
    """synth_png encodes row r with filter r%5, so a ≥5-row image drives
    every unfilter path; decoded pixels must equal the closed formula."""
    import numpy as np

    from iot_data_pipeline_spark.operators.multimodal import (
        decode_media,
        synth_png,
    )

    mid, w, h = 42, 7, 6  # 6 rows -> filters 0,1,2,3,4,0
    blob = synth_png(mid, w, h)
    arr, meta = decode_media(blob, "image/png")
    assert meta == {"width": w, "height": h, "color_type": 2, "bit_depth": 8}
    assert arr.shape == (h, w, 3)
    k = np.arange(w * h * 3, dtype=np.int64)
    row, col, ch = (k // 3) // w, (k // 3) % w, k % 3
    want = ((mid * 7 + row * 31 + col * 13 + ch * 5) % 256).astype(np.uint8)
    assert np.array_equal(arr.reshape(-1), want)


def test_decode_media_png_gray_and_rgba():
    """Hand-built single-filter images cover the non-RGB color types."""
    import struct
    import zlib

    import numpy as np

    from iot_data_pipeline_spark.operators.multimodal import _PNG_SIG, decode_media

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    def build(w, h, color_type, channels, payload_rows):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        raw = b"".join(b"\x00" + bytes(r) for r in payload_rows)
        return (
            _PNG_SIG
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    gray = build(3, 2, 0, 1, [[10, 20, 30], [40, 50, 60]])
    arr, meta = decode_media(gray, "image/png")
    assert meta["color_type"] == 0 and arr.shape == (2, 3)
    assert arr.tolist() == [[10, 20, 30], [40, 50, 60]]

    rgba = build(2, 1, 6, 4, [[1, 2, 3, 4, 5, 6, 7, 8]])
    arr, meta = decode_media(rgba, "image/png")
    assert meta["color_type"] == 6 and arr.shape == (1, 2, 4)
    assert arr.reshape(-1).tolist() == [1, 2, 3, 4, 5, 6, 7, 8]


def test_decode_media_png_rejects_unsupported_and_corrupt():
    import pytest as _pytest

    from iot_data_pipeline_spark.operators.multimodal import decode_media, synth_png

    with _pytest.raises(ValueError, match="not a PNG"):
        decode_media(b"JFIF....", "image/png")
    blob = bytearray(synth_png(1, 4, 4))
    blob[-20] ^= 0xFF  # corrupt inside the IDAT body -> CRC must catch it
    with _pytest.raises(ValueError, match="CRC"):
        decode_media(bytes(blob), "image/png")


def test_jpeg_codec_property_roundtrip():
    """Property test: ANY quantized coefficient field (arbitrary sparsity,
    magnitudes up to DC ±1000 / AC ±200, any grid up to 3×3 blocks) must
    decode to exactly the reference IDCT of what was encoded — the
    entropy coder can't lose or shift a single coefficient."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.data())
    def check(data):
        hb = data.draw(st.integers(1, 3), label="h_blocks")
        wb = data.draw(st.integers(1, 3), label="w_blocks")
        seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
        density = data.draw(st.floats(0.0, 1.0), label="density")
        rng = np.random.RandomState(seed)
        blocks = rng.randint(-200, 201, (hb, wb, 8, 8))
        blocks[rng.rand(hb, wb, 8, 8) > density] = 0
        blocks[:, :, 0, 0] = rng.randint(-1000, 1001, (hb, wb))
        blocks = blocks.astype(np.int64)
        blob = multimodal._encode_jpeg([blocks], wb * 8, hb * 8)
        arr, meta = multimodal._decode_jpeg(blob)
        assert (meta["width"], meta["height"]) == (wb * 8, hb * 8)
        exp = np.zeros((hb * 8, wb * 8))
        for r in range(hb):
            for c in range(wb):
                exp[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = (
                    multimodal._jpg_idct(blocks[r, c])
                )
        exp = np.clip(np.round(exp + 128), 0, 255).astype(np.uint8)
        assert (arr == exp).all()

    check()


def test_png_codec_property_roundtrip():
    """Property test: random RGB images of any small size survive
    synth-style encode (cycling all five filters) → decode bit-exactly."""
    import struct
    import zlib

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.data())
    def check(data):
        w = data.draw(st.integers(1, 12), label="width")
        h = data.draw(st.integers(1, 12), label="height")
        seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        flat = img.reshape(h, w * 3)
        scan = bytearray()
        for r in range(h):
            ftype = r % 5
            cur = flat[r].astype(np.int16)
            prev = flat[r - 1].astype(np.int16) if r else np.zeros(w * 3, np.int16)
            a = np.concatenate([np.zeros(3, np.int16), cur[:-3]])
            c = np.concatenate([np.zeros(3, np.int16), prev[:-3]])
            if ftype == 0:
                filt = cur
            elif ftype == 1:
                filt = cur - a
            elif ftype == 2:
                filt = cur - prev
            elif ftype == 3:
                filt = cur - ((a + prev) >> 1)
            else:
                pred = np.array(
                    [
                        multimodal._paeth(int(a[i]), int(prev[i]), int(c[i]))
                        for i in range(w * 3)
                    ],
                    np.int16,
                )
                filt = cur - pred
            scan.append(ftype)
            scan.extend((filt % 256).astype(np.uint8).tobytes())

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body))
                + ctype
                + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        blob = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(scan)))
            + chunk(b"IEND", b"")
        )
        arr, meta = multimodal.decode_media(blob, "image/png")
        assert (arr == img).all()

    check()


def test_decode_media_jpeg_sampled_grayscale_non_interleaved():
    """T.81 §A.2.2: a 1-component scan is non-interleaved — one data unit
    per MCU even when SOF declares 2x2 sampling (round-3 ADVICE: the
    interleaved path would mis-decode real-world sampled grayscale)."""
    import numpy as np

    rng = np.random.RandomState(11)
    blocks = (
        rng.randint(-25, 26, (2, 3, 8, 8)) * (rng.rand(2, 3, 8, 8) < 0.4)
    ).astype(np.int64)
    blob = multimodal._encode_jpeg([blocks], 24, 16, sampling=[(2, 2)])
    # SOF must still carry the declared 2x2 factors for the test to bite.
    sof_at = blob.index(b"\xff\xc0")
    # FFC0 len(2) prec(1) h(2) w(2) ncomp(1) cid(1) -> hv byte at +11
    assert blob[sof_at + 11] == 0x22
    arr, meta = multimodal.decode_media(blob, "image/jpeg")
    assert meta["n_components"] == 1 and arr.shape == (16, 24)
    exp = np.zeros((16, 24))
    for r in range(2):
        for c in range(3):
            exp[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = multimodal._jpg_idct(
                blocks[r, c]
            )
    assert (arr == np.clip(np.round(exp + 128), 0, 255).astype(np.uint8)).all()


def test_decode_media_truncated_blobs_raise_valueerror():
    """Truncated blobs surface the decoders' documented ValueError (never
    IndexError/struct.error) so mapInPandas failure rows stay diagnosable."""
    import numpy as np

    from iot_data_pipeline_spark.operators.multimodal import (
        decode_media,
        synth_png,
    )

    png = synth_png(3, 6, 6)
    # cut inside a chunk body and inside a chunk header
    for cut in (len(png) - 5, 10):
        with pytest.raises(ValueError, match="PNG"):
            decode_media(png[:cut], "image/png")

    rng = np.random.RandomState(5)
    blocks = (
        rng.randint(-20, 21, (2, 2, 8, 8)) * (rng.rand(2, 2, 8, 8) < 0.5)
    ).astype(np.int64)
    jpg = multimodal._encode_jpeg([blocks], 16, 16, restart_interval=1)
    # cut mid-entropy-data (before the trailing EOI) -> truncated scan
    for cut in (len(jpg) - 4, len(jpg) - 10):
        with pytest.raises(ValueError, match="JPEG"):
            decode_media(jpg[:cut], "image/jpeg")


def test_mm_bilinear_and_spectrum_invariants(spark, sf_dir):
    """Structural cross-checks beyond oracle parity: (a) bilinear in
    quarter-pixel units must equal 4× the source pixel wherever the
    align-corners grid lands on an integer coordinate — top-left is always
    such a point, so top_left4 == 4 * P(0,0,0); (b) the k=0
    Walsh-Hadamard coefficient is the plain sum of the first 64 decoded
    samples (all basis signs +1)."""
    bil = {
        r["media_id"]: r
        for r in multimodal.mm_resize_bilinear(spark, sf_dir).collect()
    }
    assert bil
    for mid, r in bil.items():
        p000 = (mid * 7) % 256
        assert r["top_left4"] == 4 * p000, mid
        # weights always total 4: px4_sum is bounded by 4*255 per output px
        assert 0 <= r["px4_sum"] <= 27 * 4 * 255

    spec = multimodal.mm_audio_spectrum(spark, sf_dir).collect()
    k0 = {r["media_id"]: r["coeff"] for r in spec if r["k"] == 0}
    assert k0
    for mid, coeff in list(k0.items())[:25]:
        want = sum(
            (mid * 131 + i * 7919) % 65536 - 32768 for i in range(64)
        )
        assert coeff == want, mid


def test_mm_codec_queries_match_oracles(spark, sf_dir):
    """Codec registry twins (mm_decode_png/jpeg, mm_audio_frames,
    mm_resize — registered in round 5 after the unfreeze) must match
    their DuckDB oracles value-for-value."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_dir}/documents.parquet')"
    )
    for qname in sorted(multimodal._CODEC_ORACLES):
        sdf = multimodal.QUERIES[qname](spark, sf_dir)
        rel = con.sql(multimodal.ORACLES[qname])
        # same no-HUGEINT discipline the verify gate enforces
        assert not any(
            "HUGEINT" in t.upper()
            for t in [r[1] for r in con.sql(
                f"DESCRIBE {multimodal.ORACLES[qname]}"
            ).fetchall()]
        ), qname
        scols = sdf.columns
        dcols = list(rel.columns)
        assert sorted(scols) == sorted(dcols), qname
        order = sorted(range(len(scols)), key=lambda i: scols[i])
        got = sorted(
            tuple(str(r[i]) for i in order) for r in sdf.collect()
        )
        dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
        want = sorted(
            tuple(str(r[i]) for i in dorder) for r in rel.fetchall()
        )
        assert got == want, qname


def test_image_ahash_invariants(spark, sf_dir):
    """aHash structural invariants plus a cross-operator check: the luma
    total must equal the weighted channel sums the PPM decode reports
    (299·R + 587·G + 114·B), the popcount of the hash must equal the
    above-mean count, and strictly-above-mean can never cover all pixels."""
    from iot_data_pipeline_spark.operators import multimodal

    hashes = {
        r["media_id"]: r
        for r in multimodal.QUERIES["mm_image_ahash"](spark, sf_dir).collect()
    }
    decoded = {
        r["media_id"]: r
        for r in multimodal.QUERIES["mm_decode_ppm"](spark, sf_dir).collect()
    }
    assert set(hashes) == set(decoded)
    for mid, r in hashes.items():
        d = decoded[mid]
        assert r["n_px"] == d["width"] * d["height"]
        assert (
            r["gray_sum"]
            == 299 * d["r_sum"] + 587 * d["g_sum"] + 114 * d["b_sum"]
        )
        assert 0 <= r["ahash"] < (1 << r["n_px"])
        assert bin(r["ahash"]).count("1") == r["n_above"]
        assert r["n_above"] < r["n_px"]


def test_mm_corpus_stats_matches_per_image_rollup(spark, sf_dir):
    """The capstone's corpus rollup must equal aggregating the per-image
    fingerprint operator's output in Python — counts, distinct hashes,
    and the truncated mean luma."""
    import math

    from iot_data_pipeline_spark.operators import multimodal

    per_img = multimodal.QUERIES["mm_image_ahash"](spark, sf_dir).collect()
    (stats,) = multimodal.QUERIES["mm_corpus_stats"](spark, sf_dir).collect()
    assert stats["n_images"] == len(per_img)
    assert stats["total_px"] == sum(r["n_px"] for r in per_img)
    assert stats["n_distinct_hash"] == len({r["ahash"] for r in per_img})
    assert stats["max_hash"] == max(r["ahash"] for r in per_img)
    want_mean = (
        math.floor(
            sum(r["gray_sum"] for r in per_img)
            / sum(r["n_px"] for r in per_img)
            * 1_000_000
        )
        / 1_000_000
    )
    assert stats["mean_luma"] == want_mean


def test_binaryfile_scan_lists_filters_and_scales_partitions(spark, sf_dir):
    """The binaryFile media-ingest source: pathGlobFilter must exclude the
    staged non-media decoy at listing time, every supplier's file must
    appear exactly once with a parsed key, and the scan's partition count
    must scale with the number of listed files (one shard subdir lists
    fewer files -> no more partitions than the full recursive listing)."""
    base = multimodal._stage_media_dir(spark, sf_dir)

    def scan(path):
        return (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.ppm")
            .option("recursiveFileLookup", "true")
            .load(path)
        )

    full = scan(base)
    n_suppliers = table(spark, sf_dir, "supplier").count()
    assert full.count() == n_suppliers  # decoy README.txt never listed
    ids = [r[0] for r in multimodal.scan_binary_files(spark, sf_dir)
           .select("media_id").collect()]
    assert sorted(ids) == list(range(n_suppliers))  # every file, parsed key
    p_full = full.rdd.getNumPartitions()
    p_shard = scan(os.path.join(base, "shard=0")).rdd.getNumPartitions()
    assert p_shard <= p_full
    assert p_full > 1  # many small files do not collapse into one task


def test_binaryfile_partitioned_scan_prunes_shards(spark, sf_dir):
    """Round-7 stretch pin: read as a hive-partitioned table, the shard=1
    predicate must prune the OTHER shard directories at plan time (a
    non-empty PartitionFilters on shard, not a post-scan row filter), and
    the result must carry the directory-derived partition value — every
    key ≡ 1 (mod 4), each exactly once."""
    import re

    from iot_data_pipeline_spark.plans import executed_plan

    df = multimodal.scan_binary_partitioned(spark, sf_dir)
    plan = executed_plan(df)
    m = re.search(r"PartitionFilters: \[[^\]]*shard[^\]]*\]", plan)
    assert m is not None, plan
    rows = df.collect()
    n_suppliers = table(spark, sf_dir, "supplier").count()
    want = [k for k in range(n_suppliers) if k % 4 == 1]
    assert sorted(r["media_id"] for r in rows) == want
    assert all(r["shard"] == 1 for r in rows)


def test_binaryfile_staging_reconciles_orphans(spark, sf_dir):
    """Review fix pin: a stale media_*.ppm whose key is no longer in the
    supplier table (regenerated testdata / basename collision) must be
    deleted on re-stage, so the listing never decodes orphan files."""
    base = multimodal._stage_media_dir(spark, sf_dir)
    orphan = os.path.join(base, "shard=0", "media_99999999.ppm")
    with open(orphan, "wb") as fh:
        fh.write(multimodal.synth_ppm(99999999 % 997, 4, 3))
    assert os.path.exists(orphan)
    multimodal._stage_media_dir(spark, sf_dir)
    assert not os.path.exists(orphan)
    n_suppliers = table(spark, sf_dir, "supplier").count()
    assert multimodal.scan_binary_files(spark, sf_dir).count() == n_suppliers
