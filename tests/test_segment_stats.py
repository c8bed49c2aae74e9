"""Manifest segment statistics: per-commit row counts + key bounds recorded
at write time (via ``df.observe`` — no second scan), serving point-get
commit pruning, a driver-only ``len()`` fast path, and the post-compaction
``clean`` flag that lets reads skip the LWW merge entirely.

This is the metadata layer the reference's planned KeyDir/b+tree indexes
(``/root/reference/INTERFACE.md:32-38``) were reaching for, rebuilt as
Iceberg/Delta-style manifest pruning over the ``segments/_seq=N/`` layout.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hadrodb_spark import HadroCollection
from hadrodb_spark.sources.collection import HadroError

DOCS = T.StructType(
    [
        T.StructField("title", T.StringType(), False),
        T.StructField("n", T.IntegerType(), True),
    ]
)


@pytest.fixture()
def coll(spark, tmp_path):
    return HadroCollection(spark, str(tmp_path / "c"), DOCS)


def test_stats_recorded_per_commit(coll):
    coll.set("a", {"title": "A", "n": 1})
    coll.set("c", {"title": "C", "n": 2})
    coll.flush()
    coll.set("m", {"title": "M", "n": 3})
    coll.flush()
    stats = coll.segment_stats()
    assert len(stats) == 2
    first, second = (stats[k] for k in sorted(stats))
    bloom = first.pop("key_bloom")
    assert isinstance(bloom, str) and int(bloom, 16) > 0
    assert first == {
        "rows": 2,
        "tombstones": 0,
        "min_key": "a",
        "max_key": "c",
        "unique_keys": True,
    }
    assert second["rows"] == 1 and second["min_key"] == "m"


def test_seq_partitioned_layout(coll):
    coll.set("a", {"title": "A", "n": 1})
    coll.flush()
    coll.set("b", {"title": "B", "n": 2})
    coll.flush()
    dirs = sorted(
        d for d in os.listdir(os.path.join(coll.path, "segments")) if d.startswith("_seq=")
    )
    assert len(dirs) == 2
    assert coll._seq_dirs() == sorted(coll.segment_stats())


def test_append_df_stats_via_observe(spark, coll):
    df = spark.range(10).select(
        F.concat(F.lit("k"), F.format_string("%03d", F.col("id"))).alias("key"),
        F.concat(F.lit("t"), F.col("id")).alias("title"),
        F.col("id").cast("int").alias("n"),
    )
    coll.append_df(df, key_col="key")
    (s,) = coll.segment_stats().values()
    assert s["rows"] == 10
    assert s["min_key"] == "k000" and s["max_key"] == "k009"
    assert s["unique_keys"] is None  # caller-supplied keys: unproven
    # generated-uuid path is known-unique
    coll.append_df(df.select("title", "n"))
    latest = coll.segment_stats()[max(coll.segment_stats())]
    assert latest["unique_keys"] is True


def test_len_fast_path_disjoint_ranges(coll):
    # monotone, disjoint per-commit key ranges — the time-keyed log case
    for batch in (["a1", "a2"], ["b1", "b2", "b3"], ["c1"]):
        for k in batch:
            coll.set(k, {"title": k.upper(), "n": None})
        coll.flush()
    assert coll._len_fast() == 6
    assert len(coll) == 6


def test_len_fast_declines_on_overlap_and_tombstone(coll):
    coll.set("a", {"title": "A", "n": 1})
    coll.set("z", {"title": "Z", "n": 2})
    coll.flush()
    coll.set("m", {"title": "M", "n": 3})  # inside [a, z] — overlap
    coll.flush()
    assert coll._len_fast() is None
    assert len(coll) == 3  # distributed fallback still right
    coll.delete("m")
    coll.flush()
    assert coll._len_fast() is None
    assert len(coll) == 2


def test_point_get_commit_pruning(coll):
    for batch in (["a1", "a2"], ["b1", "b2"], ["c1", "c2"]):
        for k in batch:
            coll.set(k, {"title": k.upper(), "n": None})
        coll.flush()
    cands = coll._candidate_seqs(["b2"])
    assert cands is not None and len(cands) == 1
    assert coll.get("b2")["title"] == "B2"
    # plan-level check: the pruned read carries a partition filter on _seq
    plan = coll._pruned_lww(["b2"])._jdf.queryExecution().executedPlan().toString()
    assert "_seq" in plan
    # provably-absent key: answered on the driver, KeyError without a job
    assert coll._candidate_seqs(["zz"]) == []
    with pytest.raises(KeyError):
        coll.get("zz")
    assert "zz" not in coll
    assert "c1" in coll


def test_bloom_prunes_commits_with_overlapping_bounds(coll):
    """Interleaved key ranges defeat min/max pruning (every commit's bounds
    cover every probe); the per-commit key bloom still prunes to exactly the
    commits that wrote the key — the uuid-keyed KV case at scale."""
    for batch in (["a", "z1"], ["b", "z2"], ["ab", "z3"]):
        for k in batch:
            coll.set(k, {"title": k.upper(), "n": None})
        coll.flush()
    stats = coll.segment_stats()
    # bounds alone would keep all three commits for any of the probes below
    assert all(s["min_key"] <= "b" <= s["max_key"] for s in stats.values())
    assert coll._candidate_seqs(["b"]) == [1]
    assert coll.get("b")["title"] == "B"
    # in-bounds but never-written key: bloom-definite miss, no Spark job
    assert coll._candidate_seqs(["d"]) == []
    with pytest.raises(KeyError):
        coll.get("d")
    assert "d" not in coll
    # multi-get unions the per-key candidates
    assert sorted(coll._candidate_seqs(["a", "ab"])) == [0, 2]
    assert [r["title"] for r in coll.get("a", "ab")] == ["A", "AB"]


def test_bloom_covers_tombstones_and_caps_out(coll):
    # tombstones are staged keys too — the delete commit stays a candidate,
    # so a pruned get still sees the tombstone and misses correctly
    coll.set("k", {"title": "V", "n": 1})
    coll.flush()
    coll.delete("k")
    coll.flush()
    assert sorted(coll._candidate_seqs(["k"])) == [0, 1]
    with pytest.raises(KeyError):
        coll.get("k")
    # oversized batches decline the bloom (saturation) → bounds-only entry
    from hadrodb_spark.sources.collection import _BLOOM_CAP, _bloom_build

    assert _bloom_build([f"k{i}" for i in range(_BLOOM_CAP + 1)]) is None
    assert _bloom_build([]) is None


def test_pruning_preserves_lww_and_tombstones(coll):
    coll.set("k", {"title": "v1", "n": 1})
    coll.flush()
    coll.set("k", {"title": "v2", "n": 2})
    coll.flush()
    assert coll.get("k")["title"] == "v2"  # both commits are candidates
    coll.delete("k")
    coll.flush()
    with pytest.raises(KeyError):
        coll.get("k")
    assert "k" not in coll


def test_compact_resets_stats_and_marks_clean(coll):
    coll.set("a", {"title": "A1", "n": 1})
    coll.flush()
    coll.set("a", {"title": "A2", "n": 2})
    coll.set("b", {"title": "B", "n": 3})
    coll.flush()
    coll.delete("b")
    coll.flush()
    coll.compact()
    stats = coll.segment_stats()
    (only,) = stats.values()
    assert only == {
        "rows": 1,
        "tombstones": 0,
        "min_key": "a",
        "max_key": "a",
        "unique_keys": True,
    }
    assert coll._read_manifest()["clean"] is True
    assert coll._len_fast() == 1
    assert coll.get("a")["title"] == "A2"
    # clean read path: no window exchange in the plan
    plan = coll.scan()._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # a new write dirties the log again
    coll.set("c", {"title": "C", "n": 4})
    coll.flush()
    assert coll._read_manifest()["clean"] is False
    assert len(coll) == 2


def test_optimize_clusters_and_stays_correct(coll):
    for i in range(20):
        coll.set(f"k{i:02d}", {"title": f"T{i}", "n": i})
    coll.flush()
    coll.optimize(["n"])
    assert coll._read_manifest()["clean"] is True
    assert len(coll) == 20
    assert coll.get("k07")["n"] == 7
    assert sorted(coll.ids()) == [f"k{i:02d}" for i in range(20)]


def test_optimize_zorder_clusters_both_dimensions(spark, tmp_path):
    """Z-order clustering: after optimize(zorder=True) every parquet file's
    min/max span on EACH dimension is a fraction of the global span — so
    predicates on either column prune files, not just the leading sort key.
    A lexicographic sort would leave the second column's per-file span at
    ~100% of global."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("x", T.LongType(), False),
            T.StructField("y", T.LongType(), False),
        ]
    )
    coll = HadroCollection(spark, str(tmp_path / "z"), schema)
    n = 1 << 14
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 128).alias("x"),
            (F.col("id") / 128).cast("long").alias("y"),
        )
        .repartition(8)
    )
    coll.append_df(df)
    coll.optimize(["x", "y"], zorder=True, target_files=8)

    def spans(col_idx: int) -> list[float]:
        out = []
        for path in glob.glob(str(tmp_path / "z" / "segments" / "**" / "*.parquet"), recursive=True):
            f = pq.ParquetFile(path)
            mn, mx = None, None
            for rg in range(f.metadata.num_row_groups):
                st = f.metadata.row_group(rg).column(col_idx).statistics
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            out.append((mx - mn) / 127.0)
        return out

    # storage column order: _key, _sub, _deleted, x, y  (SEQ is the hive dir)
    x_spans, y_spans = spans(3), spans(4)
    assert len(x_spans) == 8, "deterministic bucketing must emit target_files files"
    # File placement is now DETERMINISTIC (exact z-histogram boundaries, no
    # range-exchange sampling — the r4 flake), and on this uniform grid the
    # equi-depth cuts land on dyadic z-block edges: every file spans exactly
    # half the x range and a quarter of the y range (0.496 / 0.244 measured).
    # Bounds carry honest margin but far below the old sampled wobble (~0.60).
    assert sum(x_spans) / len(x_spans) < 0.55, x_spans
    assert sum(y_spans) / len(y_spans) < 0.30, y_spans
    # correctness preserved
    assert len(coll) == n
    assert coll.scan(predicate="x = 5 AND y = 7").count() == 1


def test_incremental_compact_preserves_semantics(coll):
    """compact(upto=h) merges only the cold tail: scan results identical,
    newer commits untouched, tombstones preserved (not purged), stats and
    dirs consistent."""
    # commits 0..3: overwrites + a delete in the cold range, fresh writes after
    coll.set("a", {"title": "A1", "n": 1})
    coll.set("b", {"title": "B1", "n": 2})
    coll.flush()                                   # commit 0
    coll.set("a", {"title": "A2", "n": 3})
    coll.delete("b")
    coll.flush()                                   # commit 1
    coll.set("c", {"title": "C1", "n": 4})
    coll.flush()                                   # commit 2
    coll.set("a", {"title": "A3", "n": 5})
    coll.flush()                                   # commit 3 (hot)
    before = sorted(tuple(r) for r in coll.scan().collect())

    coll.compact(upto=1)

    after = sorted(tuple(r) for r in coll.scan().collect())
    assert before == after
    assert coll._seq_dirs() == [1, 2, 3]           # 0 merged into 1
    assert sorted(coll.segment_stats()) == [1, 2, 3]
    # tombstone for b survives in the merged segment (purge needs full compact)
    merged = coll._log().filter("_seq = 1")
    assert merged.filter("_key = 'b' AND _deleted").count() == 1
    # newer version of a still wins
    assert coll.get("a")["title"] == "A3"
    with pytest.raises(KeyError):
        coll.get("b")
    # stats entry for the merged segment is accurate
    s = coll.segment_stats()[1]
    # merged range (commits 0-1) holds a=A2 and b's tombstone; c is commit 2
    assert s["rows"] == 2 and s["tombstones"] == 1 and s["unique_keys"] is True
    assert s["min_key"] == "a" and s["max_key"] == "b"
    # full compact afterwards purges the tombstone and marks clean
    coll.compact()
    assert coll._log().filter("_deleted").count() == 0
    assert coll._read_manifest()["clean"] is True
    assert sorted(tuple(r) for r in coll.scan().collect()) == before


def test_incremental_compact_noop_on_single_commit(coll):
    coll.set("a", {"title": "A", "n": 1})
    coll.flush()
    coll.compact(upto=99)                          # only one commit — no-op
    assert coll._seq_dirs() == [0]
    assert coll.get("a")["title"] == "A"


def test_incremental_compact_key_deleted_then_rewritten(coll):
    """A key deleted in the cold range and re-created in the hot range must
    read back the hot value after the merge."""
    coll.set("k", {"title": "old", "n": 1})
    coll.flush()
    coll.delete("k")
    coll.flush()
    coll.set("k", {"title": "new", "n": 2})
    coll.flush()
    coll.compact(upto=1)
    assert coll.get("k")["title"] == "new"
    assert len(coll) == 1


def test_optimize_zorder_preserves_null_rows(spark, tmp_path):
    """optimize(zorder=True) must be row-preserving even when a z-order
    column holds NULLs: width_bucket(NULL) is NULL, and before the r5 fix
    the NULL z dropped out of the placement histogram and the inner
    placement join — the rewrite then PERMANENTLY DELETED those rows.
    NULLs now bucket to the low corner and survive."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("x", T.LongType(), True),
            T.StructField("y", T.LongType(), True),
        ]
    )
    coll = HadroCollection(spark, str(tmp_path / "zn"), schema)
    rows = [
        (str(i), i if i % 5 else None, None if i % 7 == 0 else i * 2)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "k string, x long, y long"
    )
    coll.append_df(df, key_col="k")
    assert len(coll) == 200

    coll.optimize(["x", "y"], zorder=True, target_files=4)
    assert len(coll) == 200  # nothing vanished
    got = {
        (r["x"], r["y"])
        for r in coll.scan(columns=["x", "y"]).collect()
    }
    assert (None, 2 * 5) not in got or True  # shape check below is exact
    want = {(x, y) for _, x, y in rows}
    assert got == want
    # NULL-x rows specifically all survived
    assert coll.where("x IS NULL").count() == sum(1 for _, x, _ in rows if x is None)


def test_optimize_zorder_rejects_17_columns(spark, tmp_path):
    """More columns than z-domain bits would break the 2^16 histogram cap
    (driver-collectability invariant) — refused loudly, not silently
    exceeded."""
    import pytest as _pytest

    from pyspark.sql import types as T

    cols = [T.StructField(f"c{i}", T.LongType(), True) for i in range(17)]
    coll = HadroCollection(
        spark, str(tmp_path / "zw"), T.StructType(cols)
    )
    coll.append_df(
        spark.range(10).selectExpr(
            "CAST(id AS STRING) AS k", *[f"id AS c{i}" for i in range(17)]
        ),
        key_col="k",
    )
    with _pytest.raises(Exception, match="at most 16"):
        coll.optimize([f"c{i}" for i in range(17)], zorder=True)


def test_range_compact_leaves_base_untouched(coll):
    """compact(upto=h, since=lo) merges ONLY lo..h: the base segment's
    files are bit-identical afterwards (the size-tiered claim is that the
    base is never rewritten), newer commits untouched, scan identical,
    in-range tombstones preserved and still shadowing base keys."""
    coll.set("a", {"title": "A0", "n": 1})
    coll.set("b", {"title": "B0", "n": 2})
    coll.set("d", {"title": "D0", "n": 3})
    coll.flush()                                   # commit 0: the base
    coll.set("a", {"title": "A1", "n": 4})
    coll.delete("b")
    coll.flush()                                   # commit 1 (range)
    coll.set("c", {"title": "C1", "n": 5})
    coll.flush()                                   # commit 2 (range)
    coll.set("a", {"title": "A3", "n": 6})
    coll.flush()                                   # commit 3 (hot)
    before = sorted(tuple(r) for r in coll.scan().collect())
    base_dir = os.path.join(coll._data_path, "_seq=0")
    base_files = {
        f: os.stat(os.path.join(base_dir, f)).st_mtime_ns
        for f in os.listdir(base_dir)
    }

    coll.compact(upto=2, since=1)

    assert sorted(tuple(r) for r in coll.scan().collect()) == before
    assert coll._seq_dirs() == [0, 2, 3]           # 1 merged into 2; 0 intact
    # base segment never rewritten: same files, same mtimes
    assert {
        f: os.stat(os.path.join(base_dir, f)).st_mtime_ns
        for f in os.listdir(base_dir)
    } == base_files
    # the in-range tombstone still shadows base's b
    merged = coll._log().filter("_seq = 2")
    assert merged.filter("_key = 'b' AND _deleted").count() == 1
    with pytest.raises(KeyError):
        coll.get("b")
    # base-only key readable; hot version still wins; in-range-only key live
    assert coll.get("d")["title"] == "D0"
    assert coll.get("a")["title"] == "A3"
    assert coll.get("c")["title"] == "C1"
    # manifest: entries 1 popped, 2 rewritten with range stats, 0 untouched
    s = coll.segment_stats()
    assert sorted(s) == [0, 2, 3]
    assert s[2]["rows"] == 3 and s[2]["tombstones"] == 1  # a=A1, b(tomb), c
    assert s[2]["unique_keys"] is True


def test_range_compact_key_only_in_base_and_hot(coll):
    """A key written in the base and again above the range must be
    invisible to the range merge entirely."""
    coll.set("k", {"title": "base", "n": 1})
    coll.flush()                                   # 0
    coll.set("x", {"title": "r1", "n": 2})
    coll.flush()                                   # 1
    coll.set("x", {"title": "r2", "n": 3})
    coll.flush()                                   # 2
    coll.set("k", {"title": "hot", "n": 4})
    coll.flush()                                   # 3
    coll.compact(upto=2, since=1)
    assert coll.get("k")["title"] == "hot"
    assert coll.get("x")["title"] == "r2"
    assert len(coll) == 2
    # the merged segment holds only the range's keys (x), nothing of k
    assert coll._log().filter("_seq = 2 AND _key = 'k'").count() == 0


def test_full_compact_with_since_raises(coll):
    coll.set("a", {"title": "A", "n": 1})
    coll.flush()
    with pytest.raises(HadroError):
        coll.compact(since=1)


def test_compact_range_equivalence_query_actually_merges(spark, tmp_path, monkeypatch):
    """The compact_range_equivalence registry row must exercise the RANGE
    path for real: ``compact(upto=2, since=1)`` silently no-ops when the
    covered range holds < 2 segments, and a no-op would still be
    read-equivalent — so a fixture drift could hollow the certification
    out without any red row.  Pin that the query's copied collection ends
    with exactly [0, 2] segment dirs (range folded, base untouched)."""
    from hadrodb_spark.operators import kv as kvmod

    seen = []
    orig = HadroCollection.compact

    def spy(self, upto=None, since=0):
        seen.append((self.path, upto, since))
        return orig(self, upto=upto, since=since)

    monkeypatch.setattr(HadroCollection, "compact", spy)
    out = kvmod.compact_range_equivalence(spark, "/root/testdata/sf0.001")
    assert out.count() > 0
    (path, upto, since) = seen[-1]
    assert (upto, since) == (2, 1)
    merged = HadroCollection(spark, path)
    assert merged._seq_dirs() == [0, 2], merged._seq_dirs()


def test_inflight_marker_lifecycle(coll):
    """_next_commit marks the seq in-flight; _record_segment_stats clears
    it — the manifest-level handshake range compaction keys off."""
    coll.set("a", {"title": "A", "n": 1})
    coll.flush()
    assert coll.inflight_commits() == []          # recorded ⇒ cleared
    seq = coll._next_commit()                      # allocate, don't write
    assert coll.inflight_commits() == [seq]
    coll._record_segment_stats(
        seq, rows=0, tombstones=0, min_key=None, max_key=None,
        unique_keys=True,
    )
    assert coll.inflight_commits() == []


def test_range_compact_truncates_below_inflight_commit(coll):
    """A concurrent writer's in-flight commit must bound the merge: folding
    across it would either read a partial segment or hoist an older
    version above the in-flight seq, shadowing that writer's final rows.
    The merge truncates strictly below it; clear_inflight unblocks."""
    for i, k in enumerate(("a", "b", "c", "d")):
        coll.set(k, {"title": k.upper(), "n": i})
        coll.flush()                               # commits 0..3
    stalled = coll._next_commit()                  # writer B mid-commit: 4
    assert stalled == 4
    coll.set("a", {"title": "A5", "n": 5})
    coll.flush()                                   # writer A continues: 5
    coll.set("e", {"title": "E6", "n": 6})
    coll.flush()                                   # 6
    before = sorted(tuple(r) for r in coll.scan().collect())

    coll.compact(upto=6, since=1)
    # truncated at 3: commits 1-3 folded, 5/6 (above the in-flight 4)
    # untouched, nothing at 4 created or deleted
    assert coll._seq_dirs() == [0, 3, 5, 6]
    assert sorted(tuple(r) for r in coll.scan().collect()) == before
    assert coll.inflight_commits() == [4]

    # writer B is known dead: clear the marker and the full range folds
    coll.clear_inflight(4)
    coll.compact(upto=6, since=1)
    assert coll._seq_dirs() == [0, 6]
    assert sorted(tuple(r) for r in coll.scan().collect()) == before


def test_range_compact_blocks_on_unrecorded_disk_dir(coll):
    """An on-disk _seq dir with neither a stats entry nor an in-flight
    marker (pre-protocol crash remnant) must BLOCK the merge at its seq:
    its completeness is unknowable, and folding commits on both sides of
    it would hoist older versions above it (review finding)."""
    import hadrodb_spark.sources.collection as C

    for i, k in enumerate(("a", "b", "c", "d")):
        coll.set(k, {"title": k.upper(), "n": i})
        coll.flush()                               # commits 0..3
    # simulate the pre-r12 crash: commit 2's dir exists, but strip both
    # its stats entry and (vacuously) any in-flight marker
    C._cas_update_manifest(
        coll.path, lambda m: m["segments"].pop("2", None)
    )
    before_dirs = coll._seq_dirs()
    coll.compact(upto=3, since=1)
    assert coll._seq_dirs() == before_dirs         # blocked: nothing merged
    # clearing the ambiguity (re-recording the stats) unblocks it
    coll._record_segment_stats(
        2, rows=1, tombstones=0, min_key="c", max_key="c", unique_keys=True
    )
    coll.compact(upto=3, since=1)
    assert coll._seq_dirs() == [0, 3]


def test_rename_exchange_helper_swaps_or_declines(tmp_path):
    """_rename_exchange atomically swaps two dirs where supported; on
    success both paths still exist with exchanged contents."""
    import hadrodb_spark.sources.collection as C

    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    (a / "fa").write_text("A")
    (b / "fb").write_text("B")
    if C._rename_exchange(str(a), str(b)):
        assert (a / "fb").exists() and (b / "fa").exists()
        assert not (a / "fa").exists() and not (b / "fb").exists()
    else:  # unsupported here — the compact path falls back to two renames
        assert (a / "fa").exists() and (b / "fb").exists()


def test_merge_df_noop_combination_allocates_nothing(spark, coll):
    """merge_df(when_matched='ignore', insert_unmatched=False) has nothing
    to write: it must return BEFORE allocating a commit — the allocation
    would strand an in-flight marker that blocks range compaction at
    that seq forever (review finding)."""
    coll.set("a", {"title": "A", "n": 1})
    coll.flush()
    before = coll._read_manifest()["commits"]
    src = spark.createDataFrame([("a", "A2", 2)], "key string, title string, n int")
    coll.merge_df(src, key_col="key", when_matched="ignore", insert_unmatched=False)
    m = coll._read_manifest()
    assert m["commits"] == before
    assert coll.inflight_commits() == []


def test_failed_segment_write_cleans_marker_and_partial_dir(spark, coll, monkeypatch):
    """A transient Spark write failure in a SURVIVING process must not
    strand the in-flight marker or a partial segment dir (review
    finding): the guard drops both and re-raises, so the retry starts
    clean and range compaction stays unblocked."""
    from pyspark.sql.readwriter import DataFrameWriter

    coll.set("a", {"title": "A", "n": 1})
    coll.flush()
    real = DataFrameWriter.parquet

    def boom(self, path, **kw):
        raise RuntimeError("injected transient write failure")

    monkeypatch.setattr(DataFrameWriter, "parquet", boom)
    coll.set("b", {"title": "B", "n": 2})
    with pytest.raises(RuntimeError, match="injected"):
        coll.flush()
    monkeypatch.setattr(DataFrameWriter, "parquet", real)
    assert coll.inflight_commits() == []          # marker cleaned
    assert coll._seq_dirs() == [0]                # no partial dir
    coll.flush()                                  # staged rows retry cleanly
    assert coll.get("b")["title"] == "B"
    # compaction over the gap still folds (burned seq blocks nothing)
    coll.set("c", {"title": "C", "n": 3})
    coll.flush()
    coll.compact(upto=max(coll._seq_dirs()), since=1)
    assert len(coll) == 3


def test_full_rewrite_clears_all_stranded_markers(coll):
    """Full compact runs quiesced by contract — any in-flight marker it
    finds is stranded by definition and must be self-healed, not left to
    block every future range merge (review finding)."""
    coll.set("a", {"title": "A", "n": 1})
    coll.flush()
    coll._next_commit()                            # stranded crash marker
    assert coll.inflight_commits()
    coll.compact()
    assert coll.inflight_commits() == []


def test_range_merge_publishes_manifest_before_swap(coll, monkeypatch):
    """Crash-window pin for the pre-swap manifest publish (review
    finding): if the process dies after the manifest update but before
    any directory moves, the covered dirs are intact but UNRECORDED — so
    every pruned/fast path disables itself (_stats_if_complete None) and
    the scan still returns the exact LWW state.  Publishing after the
    swap instead left pruned point-gets reading the NEW h dir with the
    OLD h bounds/bloom."""
    import hadrodb_spark.sources.collection as C

    for i, k in enumerate(("a", "b", "c", "d")):
        coll.set(k, {"title": k.upper(), "n": i})
        coll.flush()                               # commits 0..3
    before = sorted(tuple(r) for r in coll.scan().collect())

    def die(a, b):
        raise RuntimeError("crash before any dir move")

    monkeypatch.setattr(C, "_rename_exchange", die)
    with pytest.raises(RuntimeError, match="crash before"):
        coll.compact(upto=3, since=1)
    assert coll._seq_dirs() == [0, 1, 2, 3]        # no dir was touched
    assert coll._stats_if_complete() is None       # pruning disabled
    assert coll._len_fast() is None
    assert sorted(tuple(r) for r in coll.scan().collect()) == before
    assert coll.get("b")["title"] == "B"           # unpruned get correct
    # documented recovery: quiesced full compact restores everything
    coll.compact()
    assert coll._stats_if_complete() is not None
    assert sorted(tuple(r) for r in coll.scan().collect()) == before
