"""Second relational batch (SURVEY.md §2.2 continued): outer joins,
subqueries, grouping sets, pivot, exact median, extended window frames,
string/math function coverage, and the UDF surface (row-Python and
Arrow-vectorized pandas UDFs — both oracle-checked, proving the slow path
computes exactly what the declarative twin would).

Same determinism contract as :mod:`hadrodb_spark.operators.relational`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import broadcast, pandas_udf
from pyspark.sql.window import Window

from hadrodb_spark.operators.relational import dec, load, one


# --------------------------------------------------------------- outer joins
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (kept-side nulls on the left)."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 180_000)
    customer = load(spark, sf_dir, "customer")
    return orders.join(customer, orders.o_custkey == customer.c_custkey, "right").select(
        "c_custkey",
        "c_name",
        F.col("o_orderkey"),
        F.col("o_totalprice"),
    )


def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregated key sets."""
    buyers = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("custkey") <= 500)
    )
    rich = (
        load(spark, sf_dir, "customer")
        .filter((F.col("c_acctbal") > 8000) & (F.col("c_custkey") <= 500))
        .select(F.col("c_custkey").alias("custkey"), "c_acctbal")
    )
    return buyers.join(rich, "custkey", "full").select(
        "custkey", "n_orders", "c_acctbal"
    )


# ---------------------------------------------------------------- subqueries
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders above the global mean price.
    The scalar aggregates once and broadcasts — no per-row re-evaluation."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_o")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM v_o
        WHERE o_totalprice > (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM v_o)
        """
    )


def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery: each customer's orders above THEIR mean —
    Catalyst decorrelates to a join + aggregate (no nested-loop re-execution)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_o2")
    return spark.sql(
        """
        SELECT a.o_orderkey, a.o_custkey, a.o_totalprice
        FROM v_o2 a
        WHERE a.o_totalprice > (
          SELECT CAST(SUM(CAST(b.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM v_o2 b WHERE b.o_custkey = a.o_custkey)
        """
    )


def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS pair as one query via CASE flags."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_c")
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_o3")
    return spark.sql(
        """
        SELECT c_custkey,
               EXISTS (SELECT 1 FROM v_o3 WHERE o_custkey = c_custkey) AS has_orders
        FROM v_c
        """
    )


# ------------------------------------------------------- grouping sets / pivot
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer than rollup/cube)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_o4")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        FROM v_o4
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns per priority (Spark ``.pivot``; the
    oracle uses the equivalent conditional aggregation)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).cast("bigint").alias("n_f"),
            F.coalesce("O", F.lit(0)).cast("bigint").alias("n_o"),
            F.coalesce("P", F.lit(0)).cast("bigint").alias("n_p"),
        )
    )


# ----------------------------------------------------------------- percentiles
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per group via explicit mid-rank selection + exact decimal
    averaging — deterministic across engines (built-in percentile
    interpolation formulas differ in final-ulp behavior)."""
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    ranked = load(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("o_orderstatus")).alias("n"),
    )
    mids = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.ceil((F.col("n") + 1) / 2))
    )
    return (
        mids.groupBy("o_orderstatus")
        .agg(
            (F.sum(dec("o_totalprice")) / F.count(F.lit(1)))
            .cast("double")
            .alias("median_price")
        )
    )


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL, rsd=0.02). Sketch internals differ across
    engines, so the oracle checks the *bound*, not the estimate: the exact
    distinct count is cross-checked value-for-value, and ``within_bound``
    asserts |approx − exact| ≤ 5·rsd·exact. HLL is deterministic for a given
    input, so the boolean is stable; the oracle emits literal TRUE — a hash
    match means the estimate verifiably honours its published error."""
    agg = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").cast("bigint").alias("exact_parts"),
        )
    )
    err = F.abs(F.col("approx_parts") - F.col("exact_parts"))
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (err <= 5 * 0.02 * F.col("exact_parts")).alias("within_bound"),
    )


# ------------------------------------------------------------------- windows 2
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value over explicit row frames + ntile/percent_rank."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderkey"))
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(full).alias("first_order"),
        F.last("o_orderkey").over(full).alias("last_order"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering: count of a customer's orders
    within ±5 orderkeys."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderkey"))
        .rangeBetween(-5, 5)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("nearby_orders"),
    )


def distinct_on_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON-style: each customer's single latest/priciest order (the
    LWW idiom from the storage layer, §2.1 S9, applied relationally)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# ------------------------------------------------------------ scalar funcs 2
def scalar_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lpad/replace/regexp_extract/reverse/repeat/position coverage."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.lpad(F.col("p_brand"), 12, "*").alias("brand_pad"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.regexp_extract(F.col("p_brand"), "Brand#(\\d+)", 1).alias("brand_num"),
        F.reverse(F.col("p_name")).alias("name_rev"),
        F.instr(F.col("p_type"), "BRASS").cast("bigint").alias("brass_pos"),
    )


def scalar_math2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """log/exp/pow/mod/sign with rounding for transcendental stability."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.log(F.col("p_retailprice")), 6).alias("ln_price"),
        F.round(F.pow(F.col("p_size"), 2), 1).alias("size_sq"),
        (F.col("p_partkey") % 7).cast("bigint").alias("key_mod7"),
        F.signum(F.col("p_retailprice") - 1000).cast("bigint").alias("over_1k"),
    )


def date_agg_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar aggregation over the event stream: month bucket via
    date_format (string-stable), decimal-exact sums."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(
            F.date_format("ts", "yyyy-MM").alias("month"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )


def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination with deterministic full ordering."""
    return (
        load(spark, sf_dir, "customer")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .offset(10)
        .limit(10)
        .select("c_custkey", "c_name", "c_acctbal")
    )


# ---------------------------------------------------------------- UDF surface
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide part columns -> long (metric, value) rows."""
    return (
        load(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").alias("retailprice"),
        )
        .melt(
            ids=["p_partkey"],
            values=["size", "retailprice"],
            variableColumnName="metric",
            valueColumnName="value",
        )
    )


def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): top-balance customer names per
    segment, sorted then joined — deterministic across engines because the
    sort happens before concatenation."""
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("names"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (width_bucket-style): exact
    integer bucket edges so binning is engine-stable."""
    width = 25_000
    bucket = F.floor(F.col("o_totalprice") / width).cast("bigint")
    return (
        load(spark, sf_dir, "orders")
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bucket",
            (F.col("bucket") * width).cast("bigint").alias("bucket_lo"),
            "n_orders",
        )
    )


def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval derivation: each order
    becomes a validity interval [this order date, next order date) per
    customer — the lead-window idiom used to snapshot mutable dims."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("o_orderdate", 1).over(w), "yyyy-MM-dd"),
            F.lit("9999-12-31"),
        ).alias("valid_to"),
        (F.lead("o_orderdate", 1).over(w).isNull()).alias("is_current"),
    )


def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of orders in ONE scan: per-column null counts
    and distinct cardinalities (exact), long-format output."""
    o = load(spark, sf_dir, "orders")
    agg = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
            for c in ["o_custkey", "o_orderstatus", "o_totalprice"]
        ],
        F.countDistinct("o_custkey").alias("dist_o_custkey"),
        F.countDistinct("o_orderstatus").alias("dist_o_orderstatus"),
        F.countDistinct("o_totalprice").alias("dist_o_totalprice"),
    )
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"nulls_{c}").alias("n_nulls"),
            F.col(f"dist_{c}").alias("n_distinct"),
            F.col("n_rows").alias("n_rows"),
        )
        for c in ["o_custkey", "o_orderstatus", "o_totalprice"]
    ]
    return agg.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the deliberately-slow path, §2.2 UDF row) —
    oracle-checked against the pure-SQL twin of the same logic."""

    @F.udf(returnType=T.StringType())
    def norm_name(s: str) -> str:
        return s.strip().lower().replace(" ", "-") if s is not None else None

    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 300)
        .select("c_custkey", norm_name(F.col("c_name")).alias("slug"))
    )


def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF (the fast Python path): tax banding."""

    @pandas_udf(T.StringType())
    def band(bal: pd.Series) -> pd.Series:
        return pd.cut(
            bal,
            bins=[float("-inf"), 0, 5000, float("inf")],
            labels=["overdrawn", "normal", "premium"],
            right=False,
        ).astype(str)

    return load(spark, sf_dir, "customer").select(
        "c_custkey", band(F.col("c_acctbal")).alias("tier")
    )


def grouped_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the UDAF-like per-group transform): z-score
    account balances within each market segment. Arrow-batched per group;
    oracle reproduces it with window aggregates.

    Scale: one shuffle on the group key; each group streams through a Python
    worker as Arrow batches — groups must fit in worker memory, which is the
    documented applyInPandas contract (use mapInPandas otherwise)."""
    out_schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), False),
            T.StructField("c_mktsegment", T.StringType(), True),
            T.StructField("z_acctbal", T.DoubleType(), True),
        ]
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        # exact-integer-cents two-pass formula: numpy's pairwise float
        # summation differs from DuckDB's at the last ulp, so mean/std are
        # derived from exact int64 sums with the same float64 op order as
        # the oracle SQL (balances carry exactly 2 decimals)
        cents = (pdf["c_acctbal"] * 100).round().astype("int64")
        n = len(cents)
        s = int(cents.sum())
        q = int((cents * cents).sum())
        mean = float(s) / n
        var = (float(q) - (float(s) * float(s)) / n) / (n - 1)
        sd = var**0.5
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "z_acctbal": ((cents - mean) / sd).round(6),
            }
        )

    return (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(normalize, schema=out_schema)
    )


ROWS_ONLY: tuple[str, ...] = ()

ORACLE: dict[str, str] = {
    "agg_approx_distinct": """
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               TRUE AS within_bound
        FROM lineitem GROUP BY l_returnflag
    """,
    "join_right": """
        SELECT c_custkey, c_name, o_orderkey, o_totalprice
        FROM (SELECT * FROM orders WHERE o_totalprice > 180000) o
        RIGHT JOIN customer ON o.o_custkey = c_custkey
    """,
    "join_full": """
        SELECT COALESCE(b.custkey, r.custkey) AS custkey, b.n_orders, r.c_acctbal
        FROM (SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
              FROM orders GROUP BY o_custkey HAVING o_custkey <= 500) b
        FULL JOIN (SELECT c_custkey AS custkey, c_acctbal FROM customer
                   WHERE c_acctbal > 8000 AND c_custkey <= 500) r
          ON b.custkey = r.custkey
    """,
    "subquery_scalar": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM orders)
    """,
    "subquery_correlated": """
        SELECT a.o_orderkey, a.o_custkey, a.o_totalprice
        FROM orders a
        WHERE a.o_totalprice > (
          SELECT CAST(SUM(CAST(b.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM orders b WHERE b.o_custkey = a.o_custkey)
    """,
    "subquery_exists": """
        SELECT c_custkey,
               EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_orders
        FROM customer
    """,
    "agg_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "pivot_status": """
        SELECT o_orderpriority,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
        FROM orders GROUP BY o_orderpriority
    """,
    "agg_median": """
        WITH ranked AS (
          SELECT o_orderstatus, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                    ORDER BY o_totalprice, o_orderkey) AS rn,
                 COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
          FROM orders
        )
        SELECT o_orderstatus,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / COUNT(*) AS DOUBLE)
                 AS median_price
        FROM ranked
        WHERE rn = FLOOR((n + 1) / 2) OR rn = CEIL((n + 1) / 2)
        GROUP BY o_orderstatus
    """,
    "window_frames": """
        SELECT o_custkey, o_orderkey,
               FIRST_VALUE(o_orderkey) OVER wfull AS first_order,
               LAST_VALUE(o_orderkey) OVER wfull AS last_order,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
               wfull AS (PARTITION BY o_custkey ORDER BY o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "window_range_frame": """
        SELECT o_custkey, o_orderkey,
               CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                    RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS BIGINT)
                 AS nearby_orders
        FROM orders
    """,
    "distinct_on_latest": """
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders
        ) WHERE rn = 1
    """,
    "scalar_string2": """
        SELECT p_partkey,
               lpad(p_brand, 12, '*') AS brand_pad,
               replace(p_type, ' ', '_') AS type_snake,
               regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
               reverse(p_name) AS name_rev,
               CAST(strpos(p_type, 'BRASS') AS BIGINT) AS brass_pos
        FROM part
    """,
    "scalar_math2": """
        SELECT p_partkey,
               ROUND(LN(p_retailprice), 6) AS ln_price,
               ROUND(POW(p_size, 2), 1) AS size_sq,
               CAST(p_partkey % 7 AS BIGINT) AS key_mod7,
               CAST(SIGN(p_retailprice - 1000) AS BIGINT) AS over_1k
        FROM part
    """,
    "date_agg_monthly": """
        SELECT strftime(ts, '%Y-%m') AS month, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    """,
    "limit_offset": """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10 OFFSET 10
    """,
    "grouped_normalize": """
        SELECT c_custkey, c_mktsegment,
               ROUND((cents - CAST(s AS DOUBLE) / n)
                     / SQRT((CAST(q AS DOUBLE) - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / n)
                            / (n - 1)), 6) AS z_acctbal
        FROM (
          SELECT c_custkey, c_mktsegment,
                 CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents,
                 COUNT(*) OVER w AS n,
                 SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) OVER w AS s,
                 SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
                     * CAST(ROUND(c_acctbal * 100) AS BIGINT)) OVER w AS q
          FROM customer
          WINDOW w AS (PARTITION BY c_mktsegment)
        )
    """,
    "unpivot_measures": """
        SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        UNION ALL
        SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
    """,
    "agg_string_concat": """
        SELECT c_mktsegment,
               string_agg(c_name, ',' ORDER BY c_name) AS names,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM customer WHERE c_acctbal > 9900
        GROUP BY c_mktsegment
    """,
    "histogram_prices": """
        SELECT CAST(FLOOR(o_totalprice / 25000) AS BIGINT) AS bucket,
               CAST(FLOOR(o_totalprice / 25000) * 25000 AS BIGINT) AS bucket_lo,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY 1, 2
    """,
    "scd2_intervals": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
               COALESCE(strftime(LEAD(o_orderdate, 1) OVER w, '%Y-%m-%d'),
                        '9999-12-31') AS valid_to,
               (LEAD(o_orderdate, 1) OVER w IS NULL) AS is_current
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "profile_columns": """
        WITH a AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS nulls_custkey,
                 CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NULL) AS BIGINT) AS nulls_status,
                 CAST(COUNT(*) FILTER (WHERE o_totalprice IS NULL) AS BIGINT) AS nulls_price,
                 CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS dist_custkey,
                 CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS dist_status,
                 CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS dist_price
          FROM orders
        )
        SELECT 'o_custkey' AS column, nulls_custkey AS n_nulls,
               dist_custkey AS n_distinct, n_rows FROM a
        UNION ALL
        SELECT 'o_orderstatus', nulls_status, dist_status, n_rows FROM a
        UNION ALL
        SELECT 'o_totalprice', nulls_price, dist_price, n_rows FROM a
    """,
    "udf_scalar": """
        SELECT c_custkey, replace(lower(trim(c_name)), ' ', '-') AS slug
        FROM customer WHERE c_custkey <= 300
    """,
    "udf_pandas": """
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                    WHEN c_acctbal < 5000 THEN 'normal'
                    ELSE 'premium' END AS tier
        FROM customer
    """,
}
