"""Round-7-queue pipeline operators, batch 5: referential-integrity
auditing and cohort lifetime-value curves.

Reference parity: the reference (mabel-dev/hadrodb, ``hadro/engine.py``)
stores records and defers analytics upstream; these extend the SURVEY.md
§2.3 dataset-ops tier with the two reports every warehouse runs before
trusting a refresh: "do the foreign keys actually join?" and "how does
cohort revenue accumulate with age?".

Exact-arithmetic discipline throughout: integer counts, ppm fixed-point
via integer DIV over non-negative operands, calendar months as
``year*12 + month`` integers (no months_between float semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadrodb_spark.operators.relational import load

# --- fk_integrity_audit ------------------------------------------------------
# (edge label, child table, child key, parent table, parent key).  NULL
# child keys are NOT violations (SQL FK semantics) — they are excluded
# from both the child count and the orphan count.
_FK_EDGES = (
    ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
)


def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the star schema's five FK edges:
    per relationship, how many child rows point at a parent that does
    not exist?  The first data-quality gate after any ingest — a nonzero
    orphan count means joins silently drop revenue downstream.

    Exactness: every figure is an exact bigint from one left join +
    aggregate per edge; the orphan rate is integer ppm.

    Scale shape: each edge is ONE equi left-join of the child's key
    column (projected, pushed down) against the parent's DISTINCT key
    relation, immediately reduced to a 1-row aggregate — Spark
    broadcasts the small parents (nation/supplier/part at fixture SFs)
    and shuffle-joins the large ones; either way nothing wider than a
    key column moves.  The five 1-row reports union into one output.
    """
    out = None
    for label, child_t, ck, parent_t, pk in _FK_EDGES:
        child = load(spark, sf_dir, child_t).select(
            F.col(ck).alias("ckey")
        ).filter(F.col("ckey").isNotNull())
        parent = (
            load(spark, sf_dir, parent_t)
            .select(F.col(pk).alias("pkey"))
            .distinct()
        )
        row = (
            child.join(parent, child.ckey == parent.pkey, "left")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_child_rows"),
                F.count(F.when(F.col("pkey").isNull(), 1))
                .cast("bigint")
                .alias("n_orphans"),
            )
            .select(
                F.lit(label).alias("relationship"),
                "n_child_rows",
                "n_orphans",
                F.expr(
                    "CAST((1000000 * n_orphans) DIV n_child_rows AS BIGINT)"
                ).alias("orphan_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("relationship")


# --- cohort_ltv_curve --------------------------------------------------------
# Calendar months as year*12+month integers: exact, and the age subtraction
# is plain bigint arithmetic (months_between interpolates fractional months
# over days — float semantics neither engine needs here).
_YM = "(CAST(year({ts}) AS BIGINT) * 12 + CAST(month({ts}) AS BIGINT))"


def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers grouped by FIRST-order
    month, revenue accumulated by months-since-first-order — the
    retention economics view next to ``retention_cohorts``'s activity
    view (that one counts who came back; this one sums what they spent).

    Exactness: cohort/age are exact year*12+month integers; revenue is
    exact cents; the running LTV is a cumulative window over the
    bounded (cohort, age) relation; per-customer LTV is an integer-cents
    floor division.

    Scale shape: one groupBy(custkey) computes first-order months (the
    only row-scale shuffle); the cohort tag joins back on custkey (AQE
    picks shuffle vs broadcast by side size); the (cohort, age)
    aggregate is map-side combined and bounded by |months|²/2; the
    cumulative window and cohort-size join run on that tiny relation.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(_YM.format(ts="o_orderdate")).alias("ym"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    first = orders.groupBy("o_custkey").agg(F.min("ym").alias("cohort_ym"))
    sizes = first.groupBy("cohort_ym").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    tagged = orders.join(first, "o_custkey").select(
        "cohort_ym",
        (F.col("ym") - F.col("cohort_ym")).alias("age_months"),
        "cents",
    )
    curve = tagged.groupBy("cohort_ym", "age_months").agg(
        F.sum("cents").alias("rev_cents")
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("cohort_ym")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        curve.join(F.broadcast(sizes), "cohort_ym")
        .select(
            F.expr(
                "format_string('%04d-%02d', CAST((cohort_ym - 1) DIV 12 AS INT),"
                " CAST((cohort_ym - 1) % 12 + 1 AS INT))"
            ).alias("cohort_month"),
            "age_months",
            F.col("n_customers").cast("bigint").alias("n_customers"),
            F.col("rev_cents").cast("bigint").alias("rev_cents"),
            F.sum("rev_cents").over(w).cast("bigint").alias("cum_rev_cents"),
        )
        .select(
            "*",
            F.expr(
                "CAST(cum_rev_cents DIV n_customers AS BIGINT)"
            ).alias("ltv_per_customer_cents"),
        )
        .orderBy("cohort_month", "age_months")
    )


ORACLE: dict[str, str] = {
    "fk_integrity_audit": "\nUNION ALL\n".join(
        f"""
        SELECT '{label}' AS relationship,
               CAST(COUNT(*) AS BIGINT) AS n_child_rows,
               CAST(COUNT(CASE WHEN p.pkey IS NULL THEN 1 END) AS BIGINT)
                 AS n_orphans,
               CAST((1000000 * COUNT(CASE WHEN p.pkey IS NULL THEN 1 END))
                    // COUNT(*) AS BIGINT) AS orphan_ppm
        FROM (SELECT {ck} AS ckey FROM {child_t} WHERE {ck} IS NOT NULL) c
        LEFT JOIN (SELECT DISTINCT {pk} AS pkey FROM {parent_t}) p
          ON c.ckey = p.pkey
        """
        for label, child_t, ck, parent_t, pk in _FK_EDGES
    )
    + "\nORDER BY relationship",
    "cohort_ltv_curve": f"""
        WITH o AS (
          SELECT o_custkey,
                 {_YM.format(ts="o_orderdate")} AS ym,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        ),
        first AS (
          SELECT o_custkey, MIN(ym) AS cohort_ym FROM o GROUP BY o_custkey
        ),
        sizes AS (
          SELECT cohort_ym, COUNT(*) AS n_customers FROM first
          GROUP BY cohort_ym
        ),
        curve AS (
          SELECT f.cohort_ym, o.ym - f.cohort_ym AS age_months,
                 SUM(o.cents) AS rev_cents
          FROM o JOIN first f USING (o_custkey)
          GROUP BY 1, 2
        ),
        cum AS (
          SELECT cohort_ym, age_months,
                 CAST(rev_cents AS BIGINT) AS rev_cents,
                 CAST(SUM(rev_cents) OVER (
                   PARTITION BY cohort_ym ORDER BY age_months
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS cum_rev_cents
          FROM curve
        )
        SELECT printf('%04d-%02d', CAST((cohort_ym - 1) // 12 AS INT),
                      CAST((cohort_ym - 1) % 12 + 1 AS INT)) AS cohort_month,
               age_months,
               CAST(n_customers AS BIGINT) AS n_customers,
               rev_cents,
               cum_rev_cents,
               CAST(cum_rev_cents // n_customers AS BIGINT)
                 AS ltv_per_customer_cents
        FROM cum JOIN sizes USING (cohort_ym)
        ORDER BY cohort_month, age_months
    """,
}


# --- source_vocab_overlap ------------------------------------------------------


def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the distributional
    cousin of ``cross_source_duplicate_matrix`` (that one finds shared
    DOCUMENTS; this one measures shared VOCABULARY, the signal that two
    sources cover the same domain even when no document is duplicated).

    Exactness: vocabulary sets are exact distinct (term, source) pairs
    from one aggregate; intersections are exact counts from an equi
    self-join on term; Jaccard is integer ppm.  EVERY source pair is
    emitted — disjoint vocabularies appear with n_shared = 0 (the pair
    grid comes from the tiny sizes relation, so "jaccard 0" is never
    confusable with "pair not evaluated").

    Scale shape: the (term, source) relation is built in ONE distinct
    aggregate and PERSISTED via the shared registry (three plan
    subtrees — sizes and both self-join sides — would otherwise each
    re-run the corpus tokenize pass); the intersection self-join is
    equi on term with fan-out ≤ |sources|² per term; the full pair grid
    and vocab sizes are |sources|-bounded broadcasts.
    """
    from hadrodb_spark.functions import text as X
    from hadrodb_spark.operators.shared import shared_persist

    ts = shared_persist(
        ("vocab_ts", spark.sparkContext.applicationId, sf_dir),
        lambda: load(spark, sf_dir, "documents")
        .select(
            F.explode(X.tokens(F.col("text"))).alias("term"), "source"
        )
        .distinct(),
    )
    sizes = ts.groupBy("source").agg(F.count(F.lit(1)).alias("vocab"))
    a, b = ts.alias("a"), ts.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("vocab").alias("vocab_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("vocab").alias("vocab_b"))
    grid = sa.crossJoin(F.broadcast(sb)).filter(F.col("src_a") < F.col("src_b"))
    return (
        grid.join(F.broadcast(inter), ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            F.col("vocab_a").cast("bigint").alias("vocab_a"),
            F.col("vocab_b").cast("bigint").alias("vocab_b"),
            F.coalesce(F.col("n_shared"), F.lit(0))
            .cast("bigint")
            .alias("n_shared"),
            F.expr(
                "CAST((1000000 * COALESCE(n_shared, 0))"
                " DIV (vocab_a + vocab_b - COALESCE(n_shared, 0)) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("src_a", "src_b")
    )


from hadrodb_spark.functions import text as _X  # noqa: E402

ORACLE["source_vocab_overlap"] = f"""
    WITH ts AS (
      SELECT DISTINCT term, source FROM (
        SELECT unnest({_X.sql_tokens("text")}) AS term, source
        FROM documents
      )
    ),
    sizes AS (SELECT source, COUNT(*) AS vocab FROM ts GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
      FROM ts a JOIN ts b ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT sa.source AS src_a, sa.vocab AS vocab_a,
             sb.source AS src_b, sb.vocab AS vocab_b
      FROM sizes sa CROSS JOIN sizes sb
      WHERE sa.source < sb.source
    )
    SELECT src_a, src_b,
           CAST(vocab_a AS BIGINT) AS vocab_a,
           CAST(vocab_b AS BIGINT) AS vocab_b,
           CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
           CAST((1000000 * COALESCE(n_shared, 0))
                // (vocab_a + vocab_b - COALESCE(n_shared, 0)) AS BIGINT)
             AS jaccard_ppm
    FROM grid
    LEFT JOIN inter USING (src_a, src_b)
    ORDER BY src_a, src_b
"""


# --- user_entropy_histogram ----------------------------------------------------
# Per-user Shannon entropy over event types.  The per-(user, type) term is
# ONE shared float text — two divisions and one LN in a fixed order —
# rounded at 6 and summed as exact DECIMAL per user; the per-user entropy
# is then an EXACT integer (×1e6), so the histogram bucket boundary is
# integer arithmetic, never a float comparison.
_ENT_TERM = (
    "CAST(ROUND((CAST(c AS DOUBLE) / n) * LN(CAST(n AS DOUBLE) / c), 6)"
    " AS DECIMAL(18,6))"
)
_ENT_BUCKET_E6 = 250_000  # 0.25-nat histogram buckets


def user_entropy_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity audit: Shannon entropy of each user's
    event-type distribution, reported as a bounded entropy histogram —
    bots and single-purpose scripts sit in the low buckets, organic
    users spread high; the per-ENTITY counterpart of the per-SOURCE
    distribution audits (JS/KS/PSI).

    Exactness: per-(user, type) counts are exact; each entropy term is
    the shared fixed-op-order float text rounded at 6 and DECIMAL-summed
    per user, so the ×1e6 entropy is an exact integer and the histogram
    bucket is integer DIV — no float ever reaches a bucket boundary.

    Scale shape: ONE map-side-combined (user, type) aggregate bounds
    everything downstream by |users|·|types|; the per-user total is a
    window over that aggregated relation partitioned by user (the
    event_transition_matrix discipline); the final histogram is ≤ a few
    dozen rows.
    """
    ev = load(spark, sf_dir, "events")
    ut = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "user_id",
            "c",
            F.expr("SUM(c) OVER (PARTITION BY user_id)").alias("n"),
        )
    )
    per_user = ut.groupBy("user_id").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.expr(f"CAST(SUM({_ENT_TERM}) * 1000000 AS BIGINT)").alias(
            "entropy_e6"
        ),
    )
    return (
        per_user.select(
            F.expr(f"entropy_e6 DIV {_ENT_BUCKET_E6}").alias("bucket"),
            "n_events",
            "entropy_e6",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.min("entropy_e6").cast("bigint").alias("min_entropy_e6"),
            F.max("entropy_e6").cast("bigint").alias("max_entropy_e6"),
        )
        .orderBy("bucket")
    )


ORACLE["user_entropy_histogram"] = f"""
    WITH ut AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    norm AS (
      SELECT user_id, c, SUM(c) OVER (PARTITION BY user_id) AS n FROM ut
    ),
    per_user AS (
      SELECT user_id,
             CAST(MAX(n) AS BIGINT) AS n_events,
             CAST(SUM({_ENT_TERM}) * 1000000 AS BIGINT) AS entropy_e6
      FROM norm GROUP BY user_id
    )
    SELECT entropy_e6 // {_ENT_BUCKET_E6} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(MIN(entropy_e6) AS BIGINT) AS min_entropy_e6,
           CAST(MAX(entropy_e6) AS BIGINT) AS max_entropy_e6
    FROM per_user
    GROUP BY bucket
    ORDER BY bucket
"""


# --- dau_wau_mau -----------------------------------------------------------
# Sliding-window EXACT distinct at scale: per-(day, bucket) roaring-style
# bitmaps (the bitmap_daily_distinct discipline — 32768-wide buckets, so
# nothing is lost at the bucket boundary) are expanded map-side over the
# 28 target days each day contributes to, then OR-merged per target day.
# The expansion runs on the BOUNDED (day, bucket) bitmap relation — never
# on raw events — which is what makes exact 28-day rolling distinct
# feasible where a per-day COUNT DISTINCT over a range join is not.
_MAU_DAYS = 28
_WAU_DAYS = 7


def dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The product-analytics staple: daily / weekly / monthly active
    users per day with the DAU/MAU stickiness ratio — EXACT, via
    re-aggregatable bitmaps (``rolling_7d_active_users`` proves the
    map-side-expansion idiom on raw rows; this is the form that
    survives 100 TB: expansion over the day-bucket bitmap state).

    Exactness: bitmap cardinalities are exact; stickiness is integer
    ppm over non-negative operands.  Only observed-activity days are
    emitted (a day inside another day's 28-day tail but with no events
    of its own has no DAU and is not a reporting day).

    Scale shape: ONE (day, bucket) bitmap aggregate bounds everything;
    the 28× explode and OR-merge run on that relation (|days|·|buckets|
    rows); the observed-days semi-join is a broadcast.  No range join,
    no raw-row window.
    """
    ev = load(spark, sf_dir, "events").select(
        F.expr(
            "CAST(FLOOR((unix_micros(ts) DIV 1000000) / 86400) AS BIGINT)"
        ).alias("day"),
        F.col("user_id").alias("v"),
    )
    db = ev.groupBy(
        "day", F.expr("bitmap_bucket_number(v)").alias("bkt")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(v))").alias("bm"))
    exp = db.select(
        "bkt",
        "bm",
        F.explode(F.expr(f"sequence(0, {_MAU_DAYS - 1})")).alias("off"),
        F.col("day"),
    ).select(
        (F.col("day") + F.col("off")).alias("tday"), "bkt", "bm", "off"
    )
    merged = exp.groupBy("tday", "bkt").agg(
        F.expr("bitmap_or_agg(CASE WHEN off = 0 THEN bm END)").alias("dau_bm"),
        F.expr(
            f"bitmap_or_agg(CASE WHEN off < {_WAU_DAYS} THEN bm END)"
        ).alias("wau_bm"),
        F.expr("bitmap_or_agg(bm)").alias("mau_bm"),
    )
    counts = merged.groupBy("tday").agg(
        F.sum(F.expr("bitmap_count(dau_bm)")).cast("bigint").alias("dau"),
        F.sum(F.expr("bitmap_count(wau_bm)")).cast("bigint").alias("wau"),
        F.sum(F.expr("bitmap_count(mau_bm)")).cast("bigint").alias("mau"),
    )
    # observed-days gate: a tday with NO same-day activity has every
    # dau_bm NULL and bitmap_count(NULL) = 0, so its dau sum is 0 — and an
    # observed day always has dau >= 1, so the filter IS the semi-join (a
    # second scan of events just to build a days relation would contradict
    # the one-aggregate scale contract).
    return (
        counts.filter(F.col("dau") > 0)
        .select(
            F.col("tday").alias("day"),
            "dau",
            "wau",
            "mau",
            F.expr("CAST((1000000 * dau) DIV mau AS BIGINT)").alias(
                "stickiness_ppm"
            ),
        )
        .orderBy("day")
    )


ORACLE["dau_wau_mau"] = f"""
    WITH du AS (
      SELECT DISTINCT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
                      user_id
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    agg AS (
      SELECT d.day,
             COUNT(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END)
               AS dau,
             COUNT(DISTINCT CASE WHEN u.day >= d.day - {_WAU_DAYS - 1}
                            THEN u.user_id END) AS wau,
             COUNT(DISTINCT u.user_id) AS mau
      FROM days d
      JOIN du u ON u.day BETWEEN d.day - {_MAU_DAYS - 1} AND d.day
      GROUP BY d.day
    )
    SELECT day,
           CAST(dau AS BIGINT) AS dau,
           CAST(wau AS BIGINT) AS wau,
           CAST(mau AS BIGINT) AS mau,
           CAST((1000000 * dau) // mau AS BIGINT) AS stickiness_ppm
    FROM agg
    ORDER BY day
"""
