"""Native-format (hadrolog) DataSource tests: framing, tombstone skip,
multi-segment partitioning, torn-tail tolerance — including a read of the
reference's own shipped (empty) ``.tweets`` collection."""

from __future__ import annotations

import os

import pytest

from hadrodb_spark.sources import hadrolog as H


@pytest.fixture()
def native_dir(tmp_path):
    d = tmp_path / "native"
    d.mkdir()
    with open(d / "00000000.data", "wb") as f:
        f.write(H.encode_record(b"row-one"))
        f.write(H.encode_record(b"row-dead", deleted=True))
        f.write(H.encode_record(b"row-two"))
    with open(d / "00000001.data", "wb") as f:
        f.write(H.encode_record(b"row-three"))
        f.write(b"\x00\x00\x00\x00")  # torn tail (incomplete header)
    return str(d)


def test_iter_records_framing_and_tombstones(native_dir):
    seg0 = os.path.join(native_dir, "00000000.data")
    recs = list(H.iter_records(seg0))
    assert [(r[1], r[2]) for r in recs] == [(0, b"row-one"), (0, b"row-two")]
    assert recs[0][0] == 0 and recs[1][0] == 5 + 7 + 5 + 8
    full = list(H.iter_records(seg0, include_deleted=True))
    assert [r[2] for r in full] == [b"row-one", b"row-dead", b"row-two"]
    assert full[1][1] & H.DELETED_FLAG


def test_datasource_scan(spark, native_dir):
    H.register(spark)
    df = spark.read.format("hadrolog").option("path", native_dir).load()
    rows = sorted(
        (r["segment"], r["offset"], bytes(r["payload"])) for r in df.collect()
    )
    assert rows == [
        ("00000000.data", 0, b"row-one"),
        ("00000000.data", 25, b"row-two"),
        ("00000001.data", 0, b"row-three"),
    ]
    # one input partition per segment file
    assert df.rdd.getNumPartitions() == 2


def test_reads_reference_shipped_collection(spark):
    ref = "/root/reference/.tweets"
    if not os.path.isdir(ref):
        pytest.skip("reference collection not present")
    H.register(spark)
    df = spark.read.format("hadrolog").option("path", ref).load()
    assert df.count() == 0  # shipped collection is empty — but readable


def test_decode_payload_stubbed():
    with pytest.raises(NotImplementedError):
        H.decode_payload(b"\x93\x01\x02\x03")
