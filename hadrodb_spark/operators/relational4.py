"""Fourth relational tier: correlated LATERAL joins, map-typed aggregation,
calendar/interval arithmetic, regex extraction, and boolean/bitwise
aggregates — the long tail of the reference's host-engine SQL surface
(delegated wholesale to Opteryx, ``/root/reference/README.md:5``) that
rounds out SURVEY.md §2.2's scalar/aggregate/join families.

Scale notes:
- lateral_topk: Catalyst decorrelates the LATERAL LIMIT subquery into a
  rank-window over the correlated key — one shuffle on c_nationkey, never a
  per-row re-execution. The per-group-top-k plan you'd write by hand.
- agg_map_counts: two hash aggs (status counts, then per-priority map
  assembly); the map value is built executor-side from the grouped rows.
- date_arithmetic: map-only projection — every function is a JVM intrinsic.
- regexp_extract_events: map-only; the event_id filter is pushed to the
  parquet scan.
- agg_boolean_bitwise: single hash agg with map-side partials; bit/bool
  aggregates combine associatively so partial aggregation is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadrodb_spark.operators import shared
from hadrodb_spark.operators.relational import load

_LATERAL_K = 2
_REGEX_MAX_ID = 2000


def lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: the 2 highest-balance customers per
    nation, written as ``FROM nation, LATERAL (... ORDER BY ... LIMIT 2)``
    — the SQL shape for per-group top-k; Catalyst decorrelates it to a
    rank window rather than re-running the subquery per outer row."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(f"""
        SELECT n_name, c_custkey, c_name, acctbal
        FROM v_nation,
             LATERAL (
               SELECT c_custkey, c_name,
                      CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
               FROM v_customer
               WHERE c_nationkey = n_nationkey
               ORDER BY c_acctbal DESC, c_custkey
               LIMIT {_LATERAL_K}
             )
    """)


def agg_map_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed aggregation: per order priority, a status→count map built
    with ``map_from_entries`` + ``collect_list``, consumed back through
    ``map_keys`` / ``element_at`` / ``map_entries`` and rendered as a
    deterministic sorted string (cross-engine comparable)."""
    orders = load(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = per.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderstatus", "cnt")))
        ).alias("m")
    )
    render = F.concat_ws(
        ",",
        F.transform(
            F.map_entries("m"),
            lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
        ),
    )
    return m.select(
        "o_orderpriority",
        F.size(F.map_keys("m")).cast("bigint").alias("n_statuses"),
        F.coalesce(F.element_at(F.col("m"), F.lit("F")), F.lit(0))
        .cast("bigint")
        .alias("n_finished"),
        render.alias("status_counts"),
    )


def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic over order dates: day differences, day and month
    offsets, month boundaries, quarter, and day-of-week — every expression
    a JVM intrinsic (dayofweek aligned to Sunday=1 in both engines)."""
    orders = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.datediff(d, F.lit("1996-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epochish"),
        F.date_add(d, 30).cast("string").alias("plus_30d"),
        F.add_months(d, 2).cast("string").alias("plus_2m"),
        F.last_day(d).cast("string").alias("month_end"),
        F.quarter(d).cast("int").alias("qtr"),
        F.dayofweek(d).cast("int").alias("dow"),
    )


def regexp_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction over the JSON props payload: first number, ALL
    numbers (``regexp_extract_all`` joined to a deterministic string), and
    the match count — the scrape-and-clean text primitive."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < _REGEX_MAX_ID)
    nums = F.regexp_extract_all(F.col("props"), F.lit("[0-9]+"), 0)
    return ev.select(
        "event_id",
        F.regexp_extract(F.col("props"), "[0-9]+", 0).alias("first_num"),
        F.concat_ws(",", nums).alias("all_nums"),
        F.size(nums).cast("bigint").alias("n_nums"),
    )


def agg_boolean_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean and bitwise aggregates per return flag: ``bool_and`` /
    ``bool_or`` over predicates, ``bit_and`` / ``bit_or`` / ``bit_xor``
    over line numbers — all associative, so map-side partials are exact."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_qty_pos"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.bit_and(F.col("l_linenumber").cast("bigint")).alias("ln_and"),
        F.bit_or(F.col("l_linenumber").cast("bigint")).alias("ln_or"),
        F.bit_xor(F.col("l_linenumber").cast("bigint")).alias("ln_xor"),
    )


_COGROUP_MAX_KEY = 300


def udf_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-grouped ``applyInPandas`` — the one Pandas-UDF entry point the
    UDF tier didn't yet exercise: orders and events cogrouped per customer
    key, merged in one Arrow-batched Python call per key. Money sums in
    integer cents so the result is exact (no float accumulation).

    Scale: cogroup shuffles both sides once on the key — the same cost as
    the equivalent join-of-aggregates — and streams each key's two frames
    through Python. The oracle is that declarative twin (full-outer join
    of two grouped aggs)."""
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= _COGROUP_MAX_KEY)
        .select(F.col("o_custkey").alias("key"), "o_totalprice")
    )
    events = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") <= _COGROUP_MAX_KEY)
        .select(F.col("user_id").alias("key"), "value")
    )

    # closure must stay stdlib+pandas-only (executor workers may not have
    # hadrodb_spark importable — see hadrolog.register)
    def merge(key, odf, edf):
        import pandas as _pd

        cents = (
            int((odf["o_totalprice"] * 100).round().astype("int64").sum())
            if len(odf)
            else 0
        )
        return _pd.DataFrame(
            {
                "key": [key[0]],
                "n_orders": [len(odf)],
                "n_events": [len(edf)],
                "spend_cents": [cents],
            }
        )

    return (
        orders.groupBy("key")
        .cogroup(events.groupBy("key"))
        .applyInPandas(
            merge, schema="key long, n_orders long, n_events long, spend_cents long"
        )
    )


def json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing: ``from_json`` with an explicit schema (struct
    field access + null propagation on absent keys) — the schema-ful
    counterpart of ``get_json_object`` string extraction."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < _REGEX_MAX_ID)
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return ev.select(
        "event_id",
        parsed["k"].alias("k_typed"),
        parsed["k"].isNotNull().alias("has_k"),
    )


def gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: merge each user's event days into maximal runs of
    consecutive days (islands). The classic grouping key — day minus dense
    rank — is pure window arithmetic: one shuffle on user_id shared by the
    rank and the rollup.

    Scale: |user × distinct-day| rows through one hash Exchange; no self
    join, no iteration — the idiom survives any history length."""
    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    runs = ev.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    return (
        runs.groupBy("user_id", "grp")
        .agg(
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("run_start"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("run_end"),
            F.count(F.lit(1)).cast("int").alias("run_days"),
        )
        .drop("grp")
    )


_LIFT_SCALE = 10**6  # support/lift reported as exact 1e6 fixed-point


def basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: for co-purchased part pairs (a < b, same
    order), support(a,b), and lift computed in exact fixed-point —
    lift = n_ab * n_orders * 1e6 DIV (n_a * n_b) — so the driver hash
    pins every digit. Top-15 pairs by lift (min pair support 3).

    Scale: a-priori pruning makes the quadratic step safe — per-basket
    pair fan-out is quadratic in basket size, so baskets are first
    filtered to FREQUENT items (n_item >= 3). The prune provably cannot
    change the answer: any pair with n_ab >= 3 has both members in >= 3
    baskets. TPC-H baskets are short (<= 7 items); for long-basket data
    (carts, sessions) the prune is what bounds the explode. Item counts
    and the order total broadcast back; the pair groupBy is the one
    post-prune shuffle."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # ONE shuffle builds the basket relation; order total, item counts,
    # pruned baskets, and pair counts all derive from it (persisted via the
    # shared registry across its 3 consumers — Catalyst would otherwise
    # recompute the agg per consumer)
    key = ("basket_lift_baskets", spark.sparkContext.applicationId, sf_dir)
    baskets = shared.shared_persist(
        key,
        lambda: li.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("parts")
        ),
    )
    tot = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    # item counts are consumed 3× (frequent-item filter + both broadcast
    # sides) — share the persisted relation or Catalyst re-aggregates the
    # basket explode per consumer
    item = shared.shared_persist(
        ("basket_lift_items", spark.sparkContext.applicationId, sf_dir),
        lambda: baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_item")),
    )
    # a-priori prune BEFORE pair expansion: keep only frequent items, then
    # rebuild each basket's sorted array
    frequent = item.filter(F.col("n_item") >= 3).select("l_partkey")
    pruned = (
        baskets.select("l_orderkey", F.explode("parts").alias("l_partkey"))
        .join(frequent, "l_partkey", "left_semi")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    # map-side pair expansion: sorted parts array → (x, y) with x < y by
    # index order, no self-join shuffle at all
    pairs = (
        pruned.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts)), "
                    "y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("pr")
        )
        .select("pr.part_a", "pr.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    # plain equi-joins for the item counts: |distinct items| ≈ 20M rows at
    # TPC-H sf100 — past safe broadcast size, and pairs is post-prune tiny,
    # so a shuffle join is the scale-safe side; only the 1-row total stays
    # a broadcast
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    out = (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.expr(
                f"CAST(n_ab * n_orders * {_LIFT_SCALE}L DIV (n_a * n_b) AS BIGINT)"
            ).alias("lift_fp"),
        )
        .orderBy(F.desc("lift_fp"), "part_a", "part_b")
        .limit(15)
    )
    return out


def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis per line status from EXACT integer
    power sums (Σx, Σx², Σx³, Σx⁴ over integral quantities) — the builtin
    skewness/kurtosis disagree across engines on bias correction AND
    accumulate floats in partition order; central moments derived from
    exact sums in one fixed double-op sequence are bit-identical."""
    qty = F.col("l_quantity").cast("long")
    agg = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(qty).alias("s1"),
            F.sum(qty * qty).alias("s2"),
            F.sum(qty * qty * qty).alias("s3"),
            F.sum(qty * qty * qty * qty).alias("s4"),
        )
    )
    # identical textual formula on both sides — one fixed op sequence
    exprs = _MOMENT_EXPRS
    return agg.selectExpr(
        "l_linestatus",
        "CAST(n AS BIGINT) AS n",
        f"ROUND({exprs['skew']}, 6) AS skew",
        f"ROUND({exprs['kurt']}, 6) AS excess_kurtosis",
    )


# shared double-op sequence: mean/central moments from exact integer sums
_M = {
    "mean": "(CAST(s1 AS DOUBLE) / n)",
}
_M["m2"] = f"(CAST(s2 AS DOUBLE) / n - {_M['mean']} * {_M['mean']})"
_M["m3"] = (
    f"(CAST(s3 AS DOUBLE) / n - 3 * {_M['mean']} * CAST(s2 AS DOUBLE) / n"
    f" + 2 * {_M['mean']} * {_M['mean']} * {_M['mean']})"
)
_M["m4"] = (
    f"(CAST(s4 AS DOUBLE) / n - 4 * {_M['mean']} * CAST(s3 AS DOUBLE) / n"
    f" + 6 * {_M['mean']} * {_M['mean']} * CAST(s2 AS DOUBLE) / n"
    f" - 3 * {_M['mean']} * {_M['mean']} * {_M['mean']} * {_M['mean']})"
)
_MOMENT_EXPRS = {
    "skew": f"{_M['m3']} / POW({_M['m2']}, 1.5)",
    "kurt": f"{_M['m4']} / ({_M['m2']} * {_M['m2']}) - 3",
}


def weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: cumulative-weight
    window over a TOTAL order (price, orderkey, linenumber), answer = the
    smallest price whose running weight reaches half the group total.
    Exact integer weights make the threshold comparison engine-proof.

    Scale: one hash Exchange on the group key shared by both windows; no
    sort beyond the within-partition window sort."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        F.col("l_quantity").cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    wspec = (
        Window.partitionBy("l_returnflag")
        .orderBy("price", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tspec = Window.partitionBy("l_returnflag")
    cum = li.withColumn("cumw", F.sum("w").over(wspec)).withColumn(
        "totw", F.sum("w").over(tspec)
    )
    return (
        cum.filter(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("l_returnflag")
        .agg(F.min("price").cast("double").alias("weighted_median"))
    )


def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value functions — first_value / last_value / nth_value over
    an explicit full-partition frame and a deterministic total order
    (orderdate, orderkey): per customer, the first, latest, and 2nd order
    values. last_value needs the UNBOUNDED FOLLOWING frame or it reads the
    default frame's current row — the classic trap, pinned here."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 300)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    price = F.col("o_totalprice").cast("decimal(18,2)")
    out = o.select(
        "o_custkey",
        "o_orderkey",
        F.first_value(price).over(w).cast("double").alias("first_spend"),
        F.last_value(price).over(w).cast("double").alias("last_spend"),
        F.nth_value(price, 2).over(w).cast("double").alias("second_spend"),
    )
    return out


def window_first_last_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS value functions — the cross-engine window subtlety the
    plain value functions don't exercise: per customer (deterministic total
    order: orderdate, orderkey), the first / latest / 2nd NON-NULL spend
    where fulfilled orders ('F') are treated as the only priced ones.
    Same one-shuffle window plan as ``window_value_functions``; the null
    skipping happens inside the running frame, no extra pass."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 300)
    priced = F.when(
        F.col("o_orderstatus") == "F", F.col("o_totalprice").cast("decimal(18,2)")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first(priced, ignorenulls=True).over(w).cast("double").alias(
            "first_fulfilled"
        ),
        F.last(priced, ignorenulls=True).over(w).cast("double").alias(
            "last_fulfilled"
        ),
        F.nth_value(priced, 2, ignoreNulls=True).over(w).cast("double").alias(
            "second_fulfilled"
        ),
    )


def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median over a bounded 7-row frame (6 preceding +
    current) per user, ordered by (epoch second, event_id). Spark has no
    median window function, so the frame is collected (bounded — 7
    elements, not a whole partition), sorted, and the midpoint taken with
    integer-cents arithmetic: odd count → middle element, even → mean of
    the two middle elements, one double division at the end. The 7×
    row amplification is constant-bounded, so the plan stays one shuffle
    on user_id; an unbounded-frame median would instead need
    approx_percentile or a two-pass exact path."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("ets"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ets", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    frame = F.array_sort(F.collect_list("cents").over(w))
    n = F.size(frame)
    med = F.when(
        n % 2 == 1,
        F.element_at(frame, ((n + 1) / 2).cast("int")).cast("double"),
    ).otherwise(
        (
            F.element_at(frame, (n / 2).cast("int"))
            + F.element_at(frame, (n / 2).cast("int") + 1)
        )
        / F.lit(2.0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "cents",
        med.alias("rolling_median_cents"),
    )


def regression_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares line per event type (value ~ hour-of-day) from EXACT
    integer/decimal power sums — the regr_slope/regr_intercept family
    computed engine-proof: slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) with
    every Σ exact, one double division at the end, rounded to 6."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("long").alias("x"),
        F.col("value").cast("decimal(18,2)").alias("y"),
    )
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("x")).alias("sxy"),
    )
    num = "(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    den = "(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    return agg.selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n",
        f"ROUND({num} / {den}, 6) AS slope",
        f"ROUND((CAST(sy AS DOUBLE) - {num} / {den} * CAST(sx AS DOUBLE)) / n, 6)"
        " AS intercept",
    )


def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX_BY / MIN_BY (argmax/argmin) per nation — made deterministic by
    maximizing over a UNIQUE integer key (balance in cents ×10¹⁰ +
    custkey) so ties can't exist; native max_by's tie behavior is
    unspecified in both engines. The 10¹⁰ multiplier exceeds any custkey
    domain (TPC-H SF ≤ 6×10⁴ customers per SF unit ⇒ custkey < 10¹⁰ even
    at SF 100k), so the key stays monotonic in balance — a ×10⁶
    multiplier would let large custkeys bleed into the cents component
    and mis-rank; fits in int64: |cents| ≤ ~10⁶ ⇒ |ukey| < 10¹⁷."""
    c = load(spark, sf_dir, "customer").withColumn(
        "ukey",
        (F.round(F.col("c_acctbal") * 100).cast("long") * 10_000_000_000
         + F.col("c_custkey")),
    )
    return c.groupBy("c_nationkey").agg(
        F.expr("max_by(c_name, ukey)").alias("richest"),
        F.expr("min_by(c_name, ukey)").alias("poorest"),
        F.max(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("max_bal"),
    )


def window_rolling_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling sample stddev over a 5-row frame from EXACT integer power
    sums (quantity in integral units): sqrt((Q − S²/n)/(n−1)) — one fixed
    double sequence per row, engine-proof, where native stddev-over-window
    would accumulate floats in engine-specific order."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 2000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("long").alias("q"),
        )
    )
    w = (
        Window.orderBy("l_orderkey", "l_linenumber")
        .rowsBetween(-4, Window.currentRow)
    )
    rolled = li.select(
        "l_orderkey",
        "l_linenumber",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("q").over(w).alias("s"),
        F.sum(F.col("q") * F.col("q")).over(w).alias("qq"),
    ).filter(F.col("n") >= 2)
    return rolled.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "CAST(n AS BIGINT) AS n",
        "ROUND(sqrt((CAST(qq AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)), 6)"
        " AS roll_std",
    )


def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join via bucket banding — the range-join
    family member beyond as-of (reference exposes no join surface,
    ``hadro/engine.py:139-177``; [A]-tier capability).

    Each distinct (supplier, ship-date, ship-date + ⌊qty⌋ days) triple is
    an activity interval; the query reports, per supplier, how many of
    its interval pairs overlap and their total overlap days.

    Scale shape: the naive formulation is a non-equi self-join —
    O(n²/|suppliers|) comparisons and a broadcast-nested-loop plan. The
    banded shape used here: each interval explodes to the MONTH buckets
    it touches (≤ 3 rows at ≤ 50-day spans), candidates come from an
    EQUI-join on (supplier, bucket) — hash-partitionable, AQE/skew-join
    eligible — and the exact predicate then filters candidates. Each
    overlapping pair survives EXACTLY once: only in the bucket containing
    greatest(start_a, start_b) (for an overlapping pair that month
    provably lies in both intervals' bucket ranges, and each interval
    emits each of its buckets once). Candidate volume is Σ_buckets
    density² — bounded by the banding width, no broadcast, no BNLJ.
    Pair identity is lexicographic on (start, end), which is unique
    within a supplier after the DISTINCT (the synthetic data duplicates
    (orderkey, linenumber), so no row id is assumed unique)."""
    iv = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_suppkey",
            F.to_date("l_shipdate").alias("s"),
            F.date_add(
                F.to_date("l_shipdate"),
                F.floor("l_quantity").cast("int"),
            ).alias("e"),
        )
        .distinct()
    )
    bucketed = iv.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.trunc("s", "month"),
                F.trunc("e", "month"),
                F.expr("interval 1 month"),
            )
        ),
    )
    a = bucketed.select(
        F.col("l_suppkey").alias("supp"),
        F.col("s").alias("s_a"),
        F.col("e").alias("e_a"),
        F.col("bkt").alias("bkt_a"),
    )
    b = bucketed.select(
        F.col("l_suppkey").alias("supp_b"),
        F.col("s").alias("s_b"),
        F.col("e").alias("e_b"),
        F.col("bkt").alias("bkt_b"),
    )
    pairs = (
        a.join(
            b,
            (F.col("supp") == F.col("supp_b"))
            & (F.col("bkt_a") == F.col("bkt_b"))
            & (
                (F.col("s_a") < F.col("s_b"))
                | ((F.col("s_a") == F.col("s_b")) & (F.col("e_a") < F.col("e_b")))
            ),
        )
        .filter((F.col("s_a") <= F.col("e_b")) & (F.col("s_b") <= F.col("e_a")))
        # exactly-once: count the pair only in greatest(start)'s month
        .filter(
            F.trunc(F.greatest("s_a", "s_b"), "month") == F.col("bkt_a")
        )
    )
    return (
        pairs.groupBy(F.col("supp").alias("l_suppkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(
                F.datediff(F.least("e_a", "e_b"), F.greatest("s_a", "s_b")) + 1
            )
            .cast("bigint")
            .alias("overlap_days"),
        )
        .orderBy(F.desc("n_pairs"), "l_suppkey")
        .limit(20)
    )


# ------------------------------------------------------------------ oracles
ORACLE: dict[str, str] = {
    "join_interval_overlap": """
        WITH iv AS (
          SELECT DISTINCT l_suppkey,
                 CAST(l_shipdate AS DATE) AS s,
                 CAST(l_shipdate AS DATE)
                   + CAST(FLOOR(l_quantity) AS INTEGER) AS e
          FROM lineitem
        )
        SELECT a.l_suppkey AS l_suppkey,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(date_diff('day', GREATEST(a.s, b.s),
                                  LEAST(a.e, b.e)) + 1) AS BIGINT)
                 AS overlap_days
        FROM iv a
        JOIN iv b
          ON a.l_suppkey = b.l_suppkey
         AND (a.s < b.s OR (a.s = b.s AND a.e < b.e))
         AND a.s <= b.e AND b.s <= a.e
        GROUP BY a.l_suppkey
        ORDER BY n_pairs DESC, l_suppkey
        LIMIT 20
    """,
    "agg_higher_moments": None,  # built below (shared formula text)
    "agg_argmax": """
        WITH c AS (
          SELECT c_nationkey, c_name, c_acctbal,
                 CAST(ROUND(c_acctbal * 100) AS BIGINT) * 10000000000 + c_custkey
                     AS ukey
          FROM customer
        )
        SELECT c_nationkey,
               max_by(c_name, ukey) AS richest,
               min_by(c_name, ukey) AS poorest,
               CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_bal
        FROM c GROUP BY c_nationkey
    """,
    "window_rolling_stddev": """
        WITH rolled AS (
          SELECT l_orderkey, l_linenumber,
                 COUNT(*) OVER w AS n,
                 SUM(CAST(l_quantity AS BIGINT)) OVER w AS s,
                 SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                     OVER w AS qq
          FROM lineitem
          WHERE l_orderkey <= 2000
          WINDOW w AS (
              ORDER BY l_orderkey, l_linenumber
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
          )
        )
        SELECT l_orderkey, l_linenumber,
               CAST(n AS BIGINT) AS n,
               ROUND(sqrt((CAST(qq AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                          / (n - 1)), 6) AS roll_std
        FROM rolled WHERE n >= 2
    """,
    "window_value_functions": """
        SELECT o_custkey, o_orderkey,
               CAST(FIRST_VALUE(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                    AS DOUBLE) AS first_spend,
               CAST(LAST_VALUE(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                    AS DOUBLE) AS last_spend,
               CAST(NTH_VALUE(CAST(o_totalprice AS DECIMAL(18,2)), 2) OVER w
                    AS DOUBLE) AS second_spend
        FROM orders
        WHERE o_custkey <= 300
        WINDOW w AS (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    """,
    "window_rolling_median": """
        SELECT user_id, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CAST(MEDIAN(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS rolling_median_cents
        FROM events
    """,
    "window_first_last_ignore_nulls": """
        SELECT o_custkey, o_orderkey,
               CAST(FIRST_VALUE(priced IGNORE NULLS) OVER w AS DOUBLE)
                 AS first_fulfilled,
               CAST(LAST_VALUE(priced IGNORE NULLS) OVER w AS DOUBLE)
                 AS last_fulfilled,
               CAST(NTH_VALUE(priced, 2 IGNORE NULLS) OVER w AS DOUBLE)
                 AS second_fulfilled
        FROM (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 CASE WHEN o_orderstatus = 'F'
                      THEN CAST(o_totalprice AS DECIMAL(18,2)) END AS priced
          FROM orders WHERE o_custkey <= 300
        )
        WINDOW w AS (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    """,
    "regression_line": """
        WITH agg AS (
          SELECT event_type,
                 COUNT(*) AS n,
                 SUM(CAST(hour(ts) AS BIGINT)) AS sx,
                 SUM(CAST(hour(ts) AS BIGINT) * CAST(hour(ts) AS BIGINT)) AS sxx,
                 SUM(CAST(value AS DECIMAL(18,2))) AS sy,
                 SUM(CAST(value AS DECIMAL(18,2)) * CAST(hour(ts) AS BIGINT)) AS sxy
          FROM events GROUP BY event_type
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n,
               ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                     6) AS slope,
               ROUND((CAST(sy AS DOUBLE)
                      - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * CAST(sx AS DOUBLE)) / n, 6) AS intercept
        FROM agg
    """,
    "weighted_median": """
        WITH cum AS (
          SELECT l_returnflag,
                 CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
                 CAST(l_quantity AS BIGINT) AS w,
                 SUM(CAST(l_quantity AS BIGINT)) OVER (
                     PARTITION BY l_returnflag
                     ORDER BY CAST(l_extendedprice AS DECIMAL(18,2)),
                              l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS cumw,
                 SUM(CAST(l_quantity AS BIGINT)) OVER (
                     PARTITION BY l_returnflag
                 ) AS totw
          FROM lineitem
        )
        SELECT l_returnflag,
               CAST(MIN(price) AS DOUBLE) AS weighted_median
        FROM cum WHERE 2 * cumw >= totw
        GROUP BY l_returnflag
    """,
    "gaps_islands": """
        WITH ev AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ),
        runs AS (
          SELECT user_id, d,
                 d - CAST(ROW_NUMBER() OVER (
                     PARTITION BY user_id ORDER BY d
                 ) AS INT) AS grp
          FROM ev
        )
        SELECT user_id,
               strftime(MIN(d), '%Y-%m-%d') AS run_start,
               strftime(MAX(d), '%Y-%m-%d') AS run_end,
               CAST(COUNT(*) AS INT) AS run_days
        FROM runs GROUP BY user_id, grp
    """,
    "basket_lift": f"""
        WITH li AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
        item AS (
          SELECT l_partkey, COUNT(*) AS n_item FROM li GROUP BY l_partkey
        ),
        pairs AS (
          SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                 COUNT(*) AS n_ab
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 3
        )
        SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab,
               CAST(n_ab * n_orders * {_LIFT_SCALE} // (ia.n_item * ib.n_item)
                    AS BIGINT) AS lift_fp
        FROM pairs
        CROSS JOIN tot
        JOIN item ia ON ia.l_partkey = part_a
        JOIN item ib ON ib.l_partkey = part_b
        ORDER BY lift_fp DESC, part_a, part_b
        LIMIT 15
    """,
    "lateral_topk": f"""
        SELECT n_name, c_custkey, c_name, acctbal
        FROM nation,
             LATERAL (
               SELECT c_custkey, c_name,
                      CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
               FROM customer
               WHERE c_nationkey = n_nationkey
               ORDER BY c_acctbal DESC, c_custkey
               LIMIT {_LATERAL_K}
             )
    """,
    "agg_map_counts": """
        WITH per AS (
          SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
          FROM orders GROUP BY o_orderpriority, o_orderstatus
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_statuses,
               CAST(COALESCE(MAX(CASE WHEN o_orderstatus = 'F' THEN cnt END), 0)
                    AS BIGINT) AS n_finished,
               string_agg(o_orderstatus || ':' || cnt, ','
                          ORDER BY o_orderstatus) AS status_counts
        FROM per GROUP BY o_orderpriority
    """,
    "date_arithmetic": """
        SELECT o_orderkey,
               CAST(datediff('day', DATE '1996-01-01',
                             CAST(o_orderdate AS DATE)) AS BIGINT)
                 AS days_since_epochish,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)::VARCHAR
                 AS plus_30d,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)::VARCHAR
                 AS plus_2m,
               last_day(CAST(o_orderdate AS DATE))::VARCHAR AS month_end,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
        FROM orders
    """,
    "regexp_extract_events": f"""
        SELECT event_id,
               COALESCE(regexp_extract(props, '[0-9]+'), '') AS first_num,
               array_to_string(regexp_extract_all(props, '[0-9]+'), ',')
                 AS all_nums,
               CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_nums
        FROM events WHERE event_id < {_REGEX_MAX_ID}
    """,
    "agg_boolean_bitwise": """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               bool_and(l_quantity > 0) AS all_qty_pos,
               bool_or(l_discount > 0.09) AS any_deep_discount,
               bit_and(CAST(l_linenumber AS BIGINT)) AS ln_and,
               bit_or(CAST(l_linenumber AS BIGINT)) AS ln_or,
               bit_xor(CAST(l_linenumber AS BIGINT)) AS ln_xor
        FROM lineitem GROUP BY l_returnflag
    """,
    "udf_cogrouped": f"""
        WITH o AS (
          SELECT o_custkey AS key, COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS spend_cents
          FROM orders WHERE o_custkey <= {_COGROUP_MAX_KEY} GROUP BY o_custkey
        ), e AS (
          SELECT user_id AS key, COUNT(*) AS n_events
          FROM events WHERE user_id <= {_COGROUP_MAX_KEY} GROUP BY user_id
        )
        SELECT COALESCE(o.key, e.key) AS key,
               CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events,
               CAST(COALESCE(o.spend_cents, 0) AS BIGINT) AS spend_cents
        FROM o FULL OUTER JOIN e ON o.key = e.key
    """,
    "json_typed": f"""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
               json_extract(props, '$.k') IS NOT NULL AS has_k
        FROM events WHERE event_id < {_REGEX_MAX_ID}
    """,
}

ORACLE["agg_higher_moments"] = f"""
    WITH agg AS (
      SELECT l_linestatus,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS BIGINT)) AS s1,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s2,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) AS s3,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s4
      FROM lineitem GROUP BY l_linestatus
    )
    SELECT l_linestatus,
           CAST(n AS BIGINT) AS n,
           ROUND({_MOMENT_EXPRS["skew"]}, 6) AS skew,
           ROUND({_MOMENT_EXPRS["kurt"]}, 6) AS excess_kurtosis
    FROM agg
"""
