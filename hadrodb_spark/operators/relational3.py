"""Third relational batch: remaining set-op/array/null-semantics/cartesian
coverage. Same determinism contract as the other operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadrodb_spark.operators.relational import dec, load


def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics — duplicates preserved), the counterpart of
    the distinct union already covered."""
    top = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150_000)
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").like("1%")
    )
    return top.unionAll(urgent).select("o_orderkey", "o_totalprice", "o_orderpriority")


def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics: min of per-side multiplicities) —
    Spark compiles it to an aggregate + join, never a distinct."""
    big = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 40).select(
        "l_partkey", "l_returnflag"
    )
    cheap = load(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05).select(
        "l_partkey", "l_returnflag"
    )
    return big.intersectAll(cheap)


def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference: multiplicities subtract, floor 0)."""
    big = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 40).select(
        "l_partkey", "l_returnflag"
    )
    cheap = load(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05).select(
        "l_partkey", "l_returnflag"
    )
    return big.exceptAll(cheap)


_SESSION_GAP_MIN = 30


def session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in ``session_window`` in BATCH mode: per-user activity
    sessions split at >30-minute gaps. The oracle computes the same
    sessions with the independent lag/cumsum islands algorithm — the two
    formulations verifying each other.

    Scale: one hash shuffle on user_id; session assembly is a merging
    aggregation inside the partition (built-in, codegen'd) — the same
    operator the streaming path uses, so batch backfill and live
    sessionization share semantics by construction."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{_SESSION_GAP_MIN} minutes").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other — the semantics an ordinary equi-join silently drops.
    Keys are NULLIF-manufactured so the null group is non-empty."""
    o = load(spark, sf_dir, "orders").withColumn(
        "k", F.nullif(F.col("o_orderstatus"), F.lit("P"))
    )
    left = o.filter(F.col("o_orderkey") < 2000).select("o_orderkey", "k")
    grp = o.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("grp_n"))
    return (
        left.join(grp, left["k"].eqNullSafe(grp["k"]))
        .select("o_orderkey", left["k"].alias("k"), "grp_n")
    )


def dedup_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dropDuplicates(subset)`` — keep one row per (status, priority) pair;
    made deterministic by reducing to the pure key pairs (Spark's keeper row
    for non-key columns is arbitrary, so only keys are exposed)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .dropDuplicates(["o_orderstatus", "o_orderpriority"])
    )


def scalar_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function coverage: sort, distinct, contains, slice, element
    access over the tokenized text array."""
    toks = F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != ""
    )
    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .withColumn("toks", toks)
        .select(
            "doc_id",
            F.size("toks").cast("bigint").alias("n"),
            F.array_contains("toks", "spark").alias("mentions_spark"),
            F.element_at(F.array_sort(F.array_distinct("toks")), 1).alias("first_alpha"),
            F.concat_ws("-", F.slice(F.col("toks"), 1, 3)).alias("first3"),
        )
    )


def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null propagation coverage: NULLIF-manufactured nulls through
    aggregation (COUNT skips nulls, COUNT(*) doesn't), null-safe equality,
    and coalesce fallback."""
    o = load(spark, sf_dir, "orders").withColumn(
        "maybe_price", F.nullif(F.col("o_orderstatus"), F.lit("P"))
    )
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("maybe_price").alias("n_nonnull"),
            F.sum(F.col("maybe_price").isNull().cast("long")).alias("n_null"),
            F.coalesce(F.first("maybe_price"), F.lit("<none>")).alias("sample"),
        )
    )


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product of two tiny dims (region × region) — the
    only join shape where crossJoin is legitimate; both sides broadcastable."""
    a = load(spark, sf_dir, "region").select(F.col("r_regionkey").alias("a_key"))
    b = load(spark, sf_dir, "region").select(F.col("r_regionkey").alias("b_key"))
    return a.crossJoin(b).filter(F.col("a_key") != F.col("b_key"))


def events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling windows in BATCH mode (same F.window the streaming path
    uses) — hourly event rollup, window bounds as strings."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def window_analytic_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic rank family: ntile / percent_rank / cume_dist. The ORDER BY
    key is made unique (acctbal, custkey) so every function — ntile
    especially, which splits ties arbitrarily — is deterministic."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


def fuzzy_pairs_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 name pairs via SymSpell-style deletion-neighborhood
    blocking: each name expands to its |name|+1 single-deletion variants
    (identity included), candidates are pairs sharing ANY variant — a
    complete cover of edit distance ≤ 1 — and exact ``levenshtein`` verifies
    candidates only.

    Scale: candidate generation is a map-only ×(L+1) explode and one hash
    join on the variant key — linear in corpus size, never the quadratic
    all-pairs cross join; the same generate-candidates→exact-verify shape
    as the MinHash path in ``dedup.dedup_near``."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 100)
        .select("c_custkey", "c_name")
    )
    v = c.select(
        "c_custkey",
        "c_name",
        F.explode(
            F.expr(
                "transform(sequence(0, length(c_name)), i -> "
                "CASE WHEN i = 0 THEN c_name "
                "ELSE concat(substring(c_name, 1, i-1), "
                "substring(c_name, i+1, length(c_name))) END)"
            )
        ).alias("variant"),
    ).dropDuplicates(["c_custkey", "variant"])
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.variant") == F.col("b.variant"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_custkey").alias("id_b"),
            F.col("b.c_name").alias("name_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.levenshtein("name_a", "name_b") <= 1)
        .select(
            "id_a",
            "id_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
        )
    )


ORACLE: dict[str, str] = {
    "events_hourly_windows": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    """,
    "join_null_safe": """
        WITH o AS (
          SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS k FROM orders
        ),
        grp AS (
          SELECT k, CAST(COUNT(*) AS BIGINT) AS grp_n FROM o GROUP BY k
        )
        SELECT l.o_orderkey, l.k, g.grp_n
        FROM o l JOIN grp g ON l.k IS NOT DISTINCT FROM g.k
        WHERE l.o_orderkey < 2000
    """,
    "setop_intersect_all": """
        SELECT l_partkey, l_returnflag
        FROM lineitem WHERE l_quantity > 40
        INTERSECT ALL
        SELECT l_partkey, l_returnflag
        FROM lineitem WHERE l_discount > 0.05
    """,
    "setop_except_all": """
        SELECT l_partkey, l_returnflag
        FROM lineitem WHERE l_quantity > 40
        EXCEPT ALL
        SELECT l_partkey, l_returnflag
        FROM lineitem WHERE l_discount > 0.05
    """,
    "session_window_batch": """
        WITH e AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN ts - LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                      ) >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
          FROM events
        ),
        g AS (
          SELECT user_id, ts,
                 SUM(brk) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS sid
          FROM e
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM g GROUP BY user_id, sid
    """,
    "setop_union_all": """
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_totalprice > 150000
        UNION ALL
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderpriority LIKE '1%'
    """,
    "dedup_drop_duplicates": """
        SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
    "scalar_array2": """
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n,
               list_contains(toks, 'spark') AS mentions_spark,
               (list_sort(list_distinct(toks)))[1] AS first_alpha,
               array_to_string(toks[1:3], '-') AS first3
        FROM (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents WHERE doc_id < 200
        )
    """,
    "null_semantics": """
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(maybe_price) AS BIGINT) AS n_nonnull,
               CAST(COUNT(*) FILTER (WHERE maybe_price IS NULL) AS BIGINT) AS n_null,
               COALESCE(MIN(maybe_price), '<none>') AS sample
        FROM (SELECT o_orderstatus, NULLIF(o_orderstatus, 'P') AS maybe_price
              FROM orders)
        GROUP BY o_orderstatus
    """,
    "join_cross": """
        SELECT a.r_regionkey AS a_key, b.r_regionkey AS b_key
        FROM region a CROSS JOIN region b
        WHERE a.r_regionkey <> b.r_regionkey
    """,
    "window_analytic_ranks": """
        SELECT c_custkey, c_mktsegment,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cdist
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    "fuzzy_pairs_levenshtein": """
        WITH c AS (
          SELECT c_custkey, c_name FROM customer WHERE c_custkey < 100
        ),
        v AS (
          SELECT DISTINCT c_custkey, c_name,
                 CASE WHEN i = 0 THEN c_name
                      ELSE concat(substr(c_name, 1, i - 1), substr(c_name, i + 1))
                 END AS variant
          FROM (
            SELECT c_custkey, c_name,
                   unnest(range(0, length(c_name) + 1)) AS i
            FROM c
          )
        ),
        cand AS (
          SELECT DISTINCT a.c_custkey AS id_a, a.c_name AS name_a,
                          b.c_custkey AS id_b, b.c_name AS name_b
          FROM v a JOIN v b
            ON a.variant = b.variant AND a.c_custkey < b.c_custkey
        )
        SELECT id_a, id_b,
               CAST(levenshtein(name_a, name_b) AS INTEGER) AS dist
        FROM cand WHERE levenshtein(name_a, name_b) <= 1
    """,
}
