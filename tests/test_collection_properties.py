"""Property-based storage semantics: random op sequences (set/delete/flush/
compact) against a Python-dict reference model — the LWW/tombstone contract
must hold for EVERY interleaving, not just the hand-picked unit cases."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from hadrodb_spark import HadroCollection

SCHEMA = T.StructType(
    [
        T.StructField("v", T.LongType(), False),
    ]
)

KEYS = ["a", "b", "c", "d"]

ops = st.lists(
    st.one_of(
        st.tuples(st.just("set"), st.sampled_from(KEYS), st.integers(0, 1000)),
        st.tuples(st.just("del"), st.sampled_from(KEYS), st.none()),
        st.tuples(st.just("flush"), st.none(), st.none()),
        st.tuples(st.just("compact"), st.none(), st.none()),
        # incremental compaction at a random horizon — must be a no-op for
        # every observable read regardless of where the horizon falls
        st.tuples(st.just("compact_upto"), st.none(), st.integers(0, 12)),
    ),
    min_size=1,
    max_size=12,
)


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sequence=ops)
def test_kv_model_equivalence(spark, tmp_path_factory, sequence):
    path = str(tmp_path_factory.mktemp("prop") / "c")
    coll = HadroCollection(spark, path, SCHEMA)
    model: dict[str, int] = {}
    for op, key, val in sequence:
        if op == "set":
            coll.set(key, {"v": val})
            model[key] = val
        elif op == "del":
            coll.delete(key)
            model.pop(key, None)
        elif op == "flush":
            coll.flush()
        elif op == "compact":
            coll.flush()
            coll.compact()
        elif op == "compact_upto":
            coll.compact(upto=val)
    coll.flush()
    got = {r["_key"]: r["v"] for r in coll.scan().collect()}
    assert got == model
    assert len(coll) == len(model)
    assert sorted(coll.ids()) == sorted(model)
