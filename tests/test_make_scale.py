"""Invariants of the synthesized-scale builder (tools/make_scale.py).

The sf1/sf10 rehearsal datasets are built by this tool; if its key
remapping or text salting drifts, every envelope number silently changes
meaning.  These tests pin the salt's contract (r10 VERDICT task #4) and
the key-space remap shape on a miniature source, end to end through the
real DuckDB rewrite.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

import duckdb
import pytest

_TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
)


@pytest.fixture(scope="module")
def mk():
    spec = importlib.util.spec_from_file_location(
        "make_scale", os.path.join(_TOOLS, "make_scale.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_salt_is_unique_bijective_and_length_preserving(mk):
    """One salted text per replica for r < 143; replica 0 verbatim; byte
    length preserved; mapping bijective (round-trippable via a second
    translate with swapped args)."""
    con = duckdb.connect()
    expr = mk.salted_text_sql("t")
    base = "the quick brown fox jumps over lazy dogs"
    seen = {}
    for r in range(143):
        (out,) = con.execute(
            f"SELECT {expr.replace('r.r', str(r))}"
            f" FROM (SELECT '{base}' AS t)"
        ).fetchone()
        assert len(out) == len(base), r
        assert out not in seen, (r, seen[out])
        seen[out] = r
    assert seen[base] == 0  # replica 0 untouched
    # bijectivity: per-replica token frequency shape == the source's
    # (a bijection on letters maps equal tokens to equal tokens)
    for r in (1, 37, 142):
        (out,) = con.execute(
            f"SELECT {expr.replace('r.r', str(r))}"
            f" FROM (SELECT 'aa bb aa cc aa bb' AS t)"
        ).fetchone()
        toks = out.split(" ")
        assert len(toks) == 6 and toks[0] == toks[2] == toks[4]
        assert toks[1] == toks[5] and len(set(toks)) == 3


def test_salt_char_sets_disjoint(mk):
    assert not set(mk._SALT_A) & set(mk._SALT_B)
    # coprime lengths => unique rotation pairs for len(A)*len(B) replicas
    import math

    assert math.gcd(len(mk._SALT_A), len(mk._SALT_B)) == 1
    assert len(mk._SALT_A) * len(mk._SALT_B) >= 143


def test_end_to_end_replication_salts_text_and_remaps_keys(tmp_path, mk):
    """Run the real tool on a 3-doc source: per-replica distinct texts,
    verbatim replica 0, doc_id remapped by r*(max+1), row count scaled."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    os.makedirs(src)
    con = duckdb.connect()
    # minimal inputs: every table make_scale touches must exist
    con.execute(
        f"COPY (SELECT * FROM (VALUES (0, 'alpha beta gamma'),"
        f" (1, 'delta epsilon zeta'), (2, 'eta theta iota'))"
        f" AS v(doc_id, text)) TO '{src}/documents.parquet' (FORMAT PARQUET)"
    )
    for t, n_rows in [
        ("customer", "0 AS c_custkey"),
        ("orders", "0 AS o_orderkey, 0 AS o_custkey"),
        ("lineitem", "0 AS l_orderkey, 0 AS l_partkey, 0 AS l_suppkey"),
        ("supplier", "0 AS s_suppkey"),
        ("part", "0 AS p_partkey"),
        ("events", "0 AS event_id, 0 AS user_id"),
        ("embeddings", "0 AS vec_id"),
        ("region", "0 AS r_regionkey"),
        ("nation", "0 AS n_nationkey"),
    ]:
        con.execute(
            f"COPY (SELECT {n_rows}) TO '{src}/{t}.parquet' (FORMAT PARQUET)"
        )
    proc = subprocess.run(
        [sys.executable, os.path.join(_TOOLS, "make_scale.py"), src, dst, "4"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{dst}/documents.parquet')"
        f" ORDER BY doc_id"
    ).fetchall()
    assert len(rows) == 12  # 3 docs x 4 replicas
    by_base = {}
    for doc_id, text in rows:
        by_base.setdefault(doc_id % 3, []).append((doc_id // 3, text))
    for base, reps in by_base.items():
        texts = [t for _, t in sorted(reps)]
        assert len(set(texts)) == 4, base       # all replicas distinct
    # replica 0 rows (doc_id < 3) carry the verbatim source text
    verbatim = dict(
        con.execute(
            f"SELECT doc_id, text FROM read_parquet('{src}/documents.parquet')"
        ).fetchall()
    )
    for doc_id, text in rows:
        if doc_id < 3:
            assert text == verbatim[doc_id]
