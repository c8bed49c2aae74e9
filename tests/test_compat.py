"""Compat-surface tests: the reference's OWN test flows, run against our
``HadroDB``. Mirrors ``/root/reference/tests/test_interface.py`` (the active
interface test) and the disabled CaskDB tests' API expectations."""

from __future__ import annotations

import time

import pytest

from hadrodb_spark.compat import HadroDB
from hadrodb_spark.sources.collection import HadroError


def test_reference_interface_flow(spark, tmp_path):
    # test_interface.py:22-44 — append docs keyed by id, mirror-dict compare
    collection = HadroDB(str(tmp_path / "test_collection"), spark=spark)
    comparison: dict[str, dict] = {}
    for _ in range(3):
        doc_id = str(time.monotonic_ns())
        doc = {"document": doc_id}
        collection[doc_id] = doc
        comparison[doc_id] = doc
    # the comparisons the reference test declares (commented out there,
    # :46-81) — here they pass
    assert len(collection) == len(comparison)
    for doc_id, doc in comparison.items():
        assert doc_id in collection
        assert collection[doc_id] == doc
    assert sorted(collection.keys()) == sorted(comparison)
    collection.close()


def test_caskdb_kv_flow(spark, tmp_path):
    # #test_disk_store_original.py get/set/add/contains/delete intents
    db = HadroDB(str(tmp_path / "books"), spark=spark)
    db["othello"] = {"title": "Othello", "author": "shakespeare"}
    db["lear"] = {"title": "King Lear", "author": "shakespeare"}
    assert db["othello"]["author"] == "shakespeare"
    k = db.add({"title": "Anon", "author": "unknown"})
    assert db[k]["title"] == "Anon"
    del db["lear"]
    assert "lear" not in db and len(db) == 2
    # persistence across reopen (:79-98 intent)
    db.close()
    db2 = HadroDB(str(tmp_path / "books"), spark=spark)
    assert db2["othello"]["title"] == "Othello"
    # schema is now enforced — a mistyped record is rejected, unlike the
    # reference's silent positional coercion
    with pytest.raises(HadroError):
        db2["bad"] = {"title": "x", "pages": 3, "extra": None}


def test_schema_inference_types(spark, tmp_path):
    db = HadroDB(str(tmp_path / "typed"), spark=spark)
    db["r1"] = {"name": "a", "n": 3, "score": 1.5, "ok": True, "blob": b"\x01"}
    got = db["r1"]
    assert got == {"name": "a", "n": 3, "score": 1.5, "ok": True, "blob": b"\x01"}
    # inferred types survive reopen
    db.close()
    db2 = HadroDB(str(tmp_path / "typed"), spark=spark)
    assert [f.dataType.simpleString() for f in db2._coll.schema.fields] == [
        "string", "bigint", "double", "boolean", "binary",
    ]


def test_unbound_reads_raise(spark, tmp_path):
    db = HadroDB(str(tmp_path / "empty"), spark=spark)
    assert len(db) == 0 and db.keys() == [] and "x" not in db
    with pytest.raises(HadroError):
        db.get("x")
