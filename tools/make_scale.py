"""Synthesize a larger scale factor from an existing one for PERFORMANCE
REHEARSAL (r7 VERDICT task #3) — never for correctness oracles.

``python tools/make_scale.py <src_sf_dir> <dst_dir> <replicas>`` writes
``<dst_dir>/*.parquet`` holding ``replicas`` copies of every fact table
with primary/foreign keys remapped consistently per replica (new_key =
key + r·(max_key+1)), so join fan-outs, group cardinalities, and skew
shapes scale the way a genuinely larger corpus would instead of every
key's row count inflating 10×.  Dimension tables (region, nation) keep
their fixed catalog cardinality.  The embeddings query vector
(vec_id = 0) exists only in replica 0, so top-k queries stay
single-query-vector.

DuckDB does the rewrite (vectorized, zero Spark involvement); events'
TIMESTAMP(NANOS) column becomes TIMESTAMP(MICROS), which
``relational.load`` already normalizes.
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> {column: key-space it belongs to}; every key space is offset by
# r * (max over its OWNING table's primary key + 1) in replica r.
KEY_SPACES = {
    "customer": ("customer", "c_custkey"),
    "orders": ("orders", "o_orderkey"),
    "lineitem": ("lineitem", None),  # no own key space
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "documents": ("documents", "doc_id"),
    "events": ("events", "event_id"),
    # no "embeddings" space: vec_id lives in the DOCUMENTS key space —
    # embedding_quality_join / knn-style queries join vec_id = doc_id, so
    # remapping it independently would pair replica-r vectors with
    # replica-0 documents (review finding, round 8)
    "users": ("events", "user_id"),
}

REMAP = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "documents"},
    # user_id remaps too: without it every user gets replicas-fold MORE
    # events (deeper per-user partitions) instead of the corpus getting
    # replicas-fold more USERS — the opposite of how a larger corpus
    # actually scales user-keyed windows/sessionization
    "events": {"event_id": "events", "user_id": "users"},
}

DIMS = ("region", "nation")

# Per-replica TEXT SALT (r10 VERDICT task #4): replica 0 keeps the source
# text verbatim; replica r > 0 applies a bijective letter substitution —
# two independent rotations over disjoint character sets of coprime sizes
# (11 and 15), so the combined mapping is unique for r < 165 replicas.
# Why a translation and not injected salt tokens: it preserves byte
# length, token count, and the per-replica word-frequency shape exactly
# (scan volume and Zipf skew unchanged), while making the VOCABULARY grow
# with replicas the way a genuinely larger corpus's does — so shingle /
# n-gram / MinHash queries measure their plan instead of verbatim
# duplication (without it, contamination_ngram-class match pairs grew
# ~replicas² because every replica shared every gram).
_SALT_A = "etaoinshrdl"    # 11 most frequent letters
_SALT_B = "cumwfgypbvkjxqz"  # the other 15; disjoint from _SALT_A
# Residual shared vocabulary (r11 ADVICE, documented): all 26 lowercase
# letters now rotate, but UPPERCASE letters and DIGITS map to themselves
# in every replica — tokens composed solely of them (numbers, shouty
# acronyms) stay verbatim-shared across replicas.  Accepted: the corpus
# is lowercase-dominated prose, and salting case via a lower() round-trip
# would destroy the case structure the text-quality queries measure.


def salted_text_sql(col: str) -> str:
    """SQL expression salting ``col`` by replica number ``r.r``."""
    a2, b2 = _SALT_A * 2, _SALT_B * 2
    return (
        f"CASE WHEN r.r = 0 THEN {col} ELSE translate(translate({col}, "
        f"'{_SALT_A}', substr('{a2}', 1 + (r.r % {len(_SALT_A)}), {len(_SALT_A)})), "
        f"'{_SALT_B}', substr('{b2}', 1 + ((r.r // {len(_SALT_A)}) % {len(_SALT_B)}), {len(_SALT_B)})) "
        f"END AS {col}"
    )


# table -> columns whose free text must be salted per replica
SALT_TEXT = {"documents": ("text",)}


def main() -> int:
    src, dst, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    offsets = {}
    for space, (tbl, key) in KEY_SPACES.items():
        if key is None:
            continue
        (mx,) = con.execute(
            f"SELECT MAX({key}) FROM read_parquet('{src}/{tbl}.parquet')"
        ).fetchone()
        offsets[space] = int(mx) + 1

    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, remap in REMAP.items():
        cols = con.execute(
            f"SELECT * FROM read_parquet('{src}/{t}.parquet') LIMIT 0"
        ).description
        salted = SALT_TEXT.get(t, ())
        sel = ", ".join(
            f"{name} + r.r * {offsets[remap[name]]} AS {name}"
            if name in remap
            else salted_text_sql(name)
            if name in salted
            else name
            for name, *_ in cols
        )
        con.execute(
            f"""COPY (
              SELECT {sel}
              FROM read_parquet('{src}/{t}.parquet'),
                   (SELECT UNNEST(generate_series(0, {reps - 1})) AS r) r
            ) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"""
        )
        (n,) = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()
        print(f"{t}: {n} rows ({reps}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
