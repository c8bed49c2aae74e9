"""Mirror of the driver's correctness gate: run every ``queries()`` entry on
Spark AND its ``oracle_sql()`` twin on DuckDB over the same parquet tables,
then compare row count, column names, and order-insensitive values.

Comparison is EXACT (string-normalized cell values) — stricter than any
plausible hash, so passing here should imply passing the driver's check.

Changed-since mode (round-9 verdict task #7): at 300 queries a full run
costs ~20 minutes, so set ``SPARK_GRAFT_PARITY_CACHE=/path/cache.json``
to skip pairs whose certification fingerprint is unchanged since their
last recorded PASS.  The fingerprint covers the oracle SQL text, the
query's defining module source, and every hadrodb_spark module that
module directly imports (one level) — so editing a query, its oracle,
its module, or a directly-imported helper re-certifies it, while a
no-change run skips it with an auditable reason (pytest ``-rs`` lists
the skips; the cache file records name → fingerprint).  LIMITATION,
by design: an edit to a helper imported INDIRECTLY (two+ hops) does not
invalidate — use the cache for iteration, and run one full uncached
sweep before freezing a round.  Unset the env var (the default) for the
always-full behavior.
"""

from __future__ import annotations

import atexit
import hashlib
import inspect
import json
import math
import os
import re
import sys

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)  # full precision — bit-exactness required
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

# --- changed-since cache (opt-in; see module docstring) --------------------
_CACHE_PATH = os.environ.get("SPARK_GRAFT_PARITY_CACHE", "")
_cache: dict[str, str] = {}
if _CACHE_PATH and os.path.exists(_CACHE_PATH):
    with open(_CACHE_PATH) as _f:
        _cache = json.load(_f)
_cache_dirty = False

_IMPORT_RE = re.compile(
    r"^\s*(?:from\s+(hadrodb_spark[.\w]*)\s+import|import\s+(hadrodb_spark[.\w]*))",
    re.MULTILINE,
)
_mod_digest_memo: dict[str, str] = {}


def _module_digest(mod_name: str) -> str:
    """sha256 of the module source plus the sources of every
    hadrodb_spark module it DIRECTLY imports (one level, memoized)."""
    if mod_name in _mod_digest_memo:
        return _mod_digest_memo[mod_name]
    _mod_digest_memo[mod_name] = ""  # cycle guard
    try:
        src = inspect.getsource(sys.modules[mod_name])
    except (KeyError, OSError, TypeError):
        _mod_digest_memo[mod_name] = "<unreadable>"
        return _mod_digest_memo[mod_name]
    h = hashlib.sha256(src.encode())
    for m in _IMPORT_RE.finditer(src):
        dep = m.group(1) or m.group(2)
        if dep != mod_name and dep in sys.modules:
            try:
                h.update(inspect.getsource(sys.modules[dep]).encode())
            except (OSError, TypeError):
                h.update(b"<unreadable>")
    _mod_digest_memo[mod_name] = h.hexdigest()
    return _mod_digest_memo[mod_name]


def _fingerprint(name: str, sf_dir: str) -> str:
    h = hashlib.sha256()
    h.update(sf_dir.encode())
    h.update(ORACLES.get(name, "<no-oracle>").encode())
    h.update(_module_digest(QUERIES[name].__module__).encode())
    return h.hexdigest()


def _record_pass(name: str, sf_dir: str) -> None:
    global _cache_dirty
    if not _CACHE_PATH:
        return
    _cache[name] = _fingerprint(name, sf_dir)
    _cache_dirty = True


@atexit.register
def _flush_cache() -> None:
    if _CACHE_PATH and _cache_dirty:
        tmp = _CACHE_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(_cache, f, indent=1, sort_keys=True)
        os.replace(tmp, _CACHE_PATH)


def _skip_if_certified(name: str, sf_dir: str) -> None:
    if _CACHE_PATH and _cache.get(name) == _fingerprint(name, sf_dir):
        pytest.skip(f"certified unchanged (fingerprint match in {_CACHE_PATH})")


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    _skip_if_certified(name, sf_dir)
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns differ: spark={spark_cols} duckdb={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    s, d = _canon(spark_cols, spark_rows), _canon(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
    _record_pass(name, sf_dir)


def test_no_hugeint_oracle_outputs(sf_dir):
    """No oracle may emit HUGEINT/UHUGEINT (r3/r4 ``sessionize`` red row:
    DuckDB types an un-cast window SUM over INTEGER as int128, Spark emits
    bigint, and the driver's value hash is type-encoding-sensitive — values
    can be identical and still mismatch).  Plan-only: LIMIT 0, no Spark.
    """
    con = _duck(sf_dir)
    bad = []
    for name, sql in ORACLES.items():
        rel = con.sql(f"SELECT * FROM ({sql}) __q LIMIT 0")
        for col, typ in zip(rel.columns, rel.types):
            if str(typ) in ("HUGEINT", "UHUGEINT"):
                bad.append(f"{name}.{col}: {typ}")
    con.close()
    assert not bad, f"un-cast int128 oracle outputs (CAST ... AS BIGINT): {bad}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_smoke(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert len(df.collect()) >= 0 and df.columns


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns[0] == "l_returnflag"
