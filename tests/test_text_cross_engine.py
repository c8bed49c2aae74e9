"""Cross-engine property fuzz of the text-function contract: for random
printable-ASCII documents (the fixtures' domain), Spark's tokens/shingles/
fingerprint/minhash must EXACTLY equal their DuckDB SQL twins — the
foundation every dedup/text oracle rests on."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hadrodb_spark.functions import text as X

texts = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0,
        max_size=200,
    ),
    min_size=1,
    max_size=25,
)


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=texts)
def test_token_shingle_fingerprint_minhash_parity(spark, docs):
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "i INT, text STRING")
    mh = X.minhash(F.col("sh"), 4)
    out = (
        sdf.withColumn("toks", X.tokens(F.col("text")))
        .withColumn("sh", X.shingles(F.col("toks"), 3))
        .select(
            "i",
            "toks",
            "sh",
            X.fingerprint(F.col("text")).alias("fp"),
            *[mh[j].alias(f"mh{j}") for j in range(4)],
        )
    )
    got = {r["i"]: (r["toks"], sorted(r["sh"]), r["fp"], [r[f"mh{j}"] for j in range(4)])
           for r in out.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE d (i INT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", [(i, t) for i, t in enumerate(docs)])
    toks, sh = X.sql_tokens("text"), X.sql_shingles(X.sql_tokens("text"), 3)
    mh_sql = ", ".join(f"{X.sql_minhash(sh, j)} AS mh{j}" for j in range(4))
    rows = con.execute(
        f"SELECT i, {toks} AS toks, {sh} AS sh, {X.sql_fingerprint('text')} AS fp, {mh_sql} FROM d"
    ).fetchall()
    con.close()
    for i, dtoks, dsh, dfp, m0, m1, m2, m3 in rows:
        stoks, ssh, sfp, smh = got[i]
        assert stoks == dtoks, f"tokens diverge for {docs[i]!r}"
        assert sorted(dsh) == ssh, f"shingles diverge for {docs[i]!r}"
        assert sfp == dfp, f"fingerprint diverges for {docs[i]!r}"
        assert smh == [m0, m1, m2, m3], f"minhash diverges for {docs[i]!r}"


def test_minhash_array_matches_per_seed_minhash(spark):
    """minhash_array (one concat'd md5 pass per shingle) must be
    value-identical to the per-seed minhash columns it replaces in the dedup
    signature pipeline — including across the salt boundary (seeds 4-7)."""
    docs = [
        "the quick brown fox jumps over the lazy dog",
        "a b c d e f g h i j k",
        "one two three",
        "x y",  # < 3 tokens → empty shingles → null mins
        "repeat repeat repeat repeat repeat",
    ]
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "i INT, text STRING"
    )
    base = sdf.withColumn("toks", X.tokens(F.col("text"))).withColumn(
        "sh", X.shingles(F.col("toks"), 3)
    )
    mh = X.minhash(F.col("sh"), 8)
    old = base.select("i", *[mh[j].alias(f"m{j}") for j in range(8)])
    arr = X.minhash_array(F.col("sh"), 8)
    new = base.select(
        "i", *[F.element_at(arr, j + 1).alias(f"m{j}") for j in range(8)]
    )
    got_old = {r["i"]: [r[f"m{j}"] for j in range(8)] for r in old.collect()}
    got_new = {r["i"]: [r[f"m{j}"] for j in range(8)] for r in new.collect()}
    assert got_old == got_new
