"""Round-8-session-2 statistical-audit tier: the classic hypothesis-test /
monitoring statistics a data-pipeline ops team runs on every refresh that
the existing drift family (PSI / KS / JS / ANOVA) doesn't cover —
chi-square independence, Mann-Whitney rank shift, CUSUM changepoint
location, and a Benford first-digit integrity audit.

Reference parity: the reference (mabel-dev/hadrodb, ``hadro/engine.py``)
is a record store that defers analytics upstream; SURVEY.md §2.3 scopes
these dataset-health audits on top of it.

Exactness discipline (the repo invariant): counts and rank sums stay
exact integers (cent / ppm fixed point); every division or transcendental
runs ONCE per row under a SHARED op-order text, rounded at 6 before any
(exact DECIMAL) sum; every ORDER BY/LIMIT ranks on exact integers or the
rounded value with a unique tiebreak.

Scale design (each query's docstring has the per-query story):
- every statistic reduces to a bounded-cardinality aggregate BEFORE any
  window or cross join — source×lang grid (|sources|·|langs|), cent-
  quantized rank grid (≤ 100·max_value rows by construction, the
  source_ks_shift censoring pattern), daily revenue (|days|), digit
  grid (9).  The only full-data shuffles are map-side-combined counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadrodb_spark.functions import text as X
from hadrodb_spark.operators import shared
from hadrodb_spark.operators.pipeline8 import _sdiv
from hadrodb_spark.operators.relational import load

ROWS_ONLY: tuple[str, ...] = ()

# --- chisq_independence -------------------------------------------------
# Per-cell Pearson contribution via the cross-multiplied form
#   (O − r·c/N)² / (r·c/N)  ==  (N·O − r·c)² / (N·r·c)
# so the numerator stays EXACT (DECIMAL(38,0) products of bigint counts)
# and the one division is a single shared-text double op rounded at 6.
_CHI_NUM = (
    "(CAST(n_tot AS DECIMAL(38,0)) * obs"
    " - CAST(r_tot AS DECIMAL(38,0)) * c_tot)"
)
_CHI_CONTRIB = (
    f"ROUND((CAST({_CHI_NUM} AS DOUBLE) * CAST({_CHI_NUM} AS DOUBLE))"
    " / (CAST(n_tot AS DOUBLE) * CAST(r_tot AS DOUBLE) * c_tot), 6)"
)


def chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence for source × lang over the
    documents table — "is language mix independent of crawl source?", the
    categorical sibling of the numeric drift monitors (PSI/KS/JS).  Zero
    cells matter (several source/lang combinations are genuinely absent),
    so the statistic runs over the FULL marginal grid, not just observed
    cells.

    Exactness: observed counts, marginals, and the numerator (N·O − r·c)
    are exact integers/DECIMAL(38,0); each cell's contribution is ONE
    shared-text double division rounded at 6 and summed as DECIMAL;
    expected counts surface as exact integer ppm via positive-operand DIV.

    Scale: one map-side-combined (source, lang) count is the only
    full-data shuffle; marginals derive from it (≤ |sources| + |langs|
    rows), the grid is their broadcast cross join (|sources|·|langs|
    rows), and the window total runs over that bounded grid.
    """
    docs = load(spark, sf_dir, "documents").select("source", "lang")
    # persisted: three marginal relations + the grid join all derive from
    # this bounded aggregate — without the persist Catalyst re-runs the
    # full documents scan once per consumer (4 scans measured).
    cells = shared.shared_persist(
        ("chisq_cells", spark.sparkContext.applicationId, sf_dir),
        lambda: docs.groupBy("source", "lang").agg(
            F.count(F.lit(1)).alias("obs")
        ),
    )
    rows = cells.groupBy("source").agg(F.sum("obs").alias("r_tot"))
    cols = cells.groupBy("lang").agg(F.sum("obs").alias("c_tot"))
    tot = cells.groupBy().agg(
        F.sum("obs").alias("n_tot"),
        F.count_distinct("source").alias("n_r"),
        F.count_distinct("lang").alias("n_c"),
    )
    grid = (
        rows.crossJoin(F.broadcast(cols))
        .join(cells, ["source", "lang"], "left")
        .withColumn("obs", F.coalesce(F.col("obs"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    scored = grid.select(
        "source",
        "lang",
        F.col("obs").cast("bigint").alias("obs"),
        # r_tot·c_tot·10⁶ exceeds BIGINT once N reaches ~3M rows with
        # concentrated marginals (r9 ADVICE) — route the numerator through
        # DECIMAL(38,0) like the cusum/rake/spearman fixes; operands are
        # non-negative so DIV == floor on both engines.
        F.expr(
            "(CAST(r_tot AS DECIMAL(38,0)) * c_tot * 1000000) DIV n_tot"
        )
        .cast("bigint")
        .alias("exp_ppm"),
        F.expr(_CHI_CONTRIB).cast("decimal(18,6)").alias("contrib"),
        ((F.col("n_r") - 1) * (F.col("n_c") - 1)).cast("bigint").alias("dof"),
    )
    w = Window.partitionBy()
    return (
        scored.withColumn(
            "chi2", F.sum("contrib").over(w).cast("double")
        )
        .withColumn("contrib", F.col("contrib").cast("double"))
        # column order matches the oracle text positionally (..., chi2,
        # dof) — the repo-wide twin-alignment convention, even though the
        # compare itself is name-keyed.
        .select("source", "lang", "obs", "exp_ppm", "contrib", "chi2", "dof")
        .orderBy(F.col("contrib").desc(), "source", "lang")
        .limit(15)
    )


# --- mannwhitney_shift ---------------------------------------------------
# Rank arithmetic on CENT-quantized values keeps every midrank an exact
# integer when doubled: for a tied block, 2·midrank = 2·lt + eq + 1.


def mannwhitney_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank test of the `value` distribution: 'purchase'
    events against EACH other event type — the nonparametric location-
    shift monitor (KS sees any distribution change; MW answers "did the
    typical purchase value move vs clicks/views?").  NULL values are
    excluded up front (a rank test has no ordering for missing data, and
    the engines' default NULL sort position differs).  Values quantize to
    exact integer cents, ties get standard midranks, and the doubled U
    statistic plus the rank-biserial effect size (ppm fixed point) are
    exact integers end-to-end — no variance approximation, no float rank.

    Exactness: 2·R₁ = Σ c_p·(2·lt + eq + 1) over the per-cent counts
    grid; 2·U₁ = 2·R₁ − n₁(n₁+1); rank-biserial ppm = DIV(2·U₁·10⁶,
    n₁·n₂) − 10⁶ (non-negative numerator, so floor == trunc on both
    engines).  All bigint.

    Scale: the only full-data shuffle is the map-side-combined
    (event_type, cents) count; the rank grid is ≤ |types| ×
    |distinct cents| rows — bounded by the cent-quantized value domain
    BY CONSTRUCTION (the source_ks_shift censoring argument), so the
    per-pair cumulative window runs over a bounded relation.
    """
    # NULL values are excluded BEFORE the count grid: a NULL cents group
    # would sort NULLS FIRST in Spark but NULLS LAST in DuckDB, shifting
    # every lt prefix sum (r9 ADVICE).  A rank test has no ordering for
    # missing values anyway — the exclusion is the statistic's contract.
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    # persisted: the purchase/other splits and the type list all read this
    # bounded grid — unpersisted it cost three full events scans.
    counts = shared.shared_persist(
        ("mw_counts", spark.sparkContext.applicationId, sf_dir),
        lambda: ev.groupBy("event_type", "cents").agg(
            F.count(F.lit(1)).alias("c")
        ),
    )
    pc = (
        counts.filter(F.col("event_type") == "purchase")
        .select("cents", F.col("c").alias("cp"))
    )
    oc = counts.filter(F.col("event_type") != "purchase").select(
        F.col("event_type").alias("other_type"),
        "cents",
        F.col("c").alias("co"),
    )
    types = oc.select("other_type").distinct()
    merged = (
        pc.crossJoin(F.broadcast(types))
        .select("other_type", "cents", "cp", F.lit(0).alias("co"))
        .unionByName(
            oc.select("other_type", "cents", F.lit(0).alias("cp"), "co")
        )
        .groupBy("other_type", "cents")
        .agg(F.sum("cp").alias("cp"), F.sum("co").alias("co"))
    )
    w = (
        Window.partitionBy("other_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = merged.withColumn(
        "lt", F.coalesce(F.sum(F.col("cp") + F.col("co")).over(w), F.lit(0))
    )
    # two_r1 ~ 2N² wraps a BIGINT sum near 2e9 events (r9 ADVICE) —
    # accumulate as DECIMAL(38,0); the doubled-U output stays BIGINT
    # because u₁×2 ≤ 2·n₁·n₂ is bounded by the group-product domain.
    stats = ranked.groupBy("other_type").agg(
        F.sum("cp").cast("bigint").alias("n_purchase"),
        F.sum("co").cast("bigint").alias("n_other"),
        F.sum(
            F.col("cp").cast("decimal(38,0)")
            * (2 * F.col("lt") + F.col("cp") + F.col("co") + 1)
        ).alias("two_r1"),
    )
    return (
        stats.select(
            "other_type",
            "n_purchase",
            "n_other",
            (
                F.col("two_r1")
                - F.col("n_purchase") * (F.col("n_purchase") + 1)
            )
            .cast("bigint")
            .alias("u_purchase_x2"),
        )
        .withColumn(
            "rank_biserial_ppm",
            # u₁×2 · 10⁶ wraps BIGINT once n₁·n₂ passes ~4.6e12 (r9
            # ADVICE) — DECIMAL(38,0) numerator; non-negative, so
            # DIV == floor on both engines.
            F.expr(
                "CASE WHEN n_purchase = 0 OR n_other = 0 THEN NULL"
                " ELSE (CAST(u_purchase_x2 AS DECIMAL(38,0)) * 1000000)"
                " DIV (n_purchase * n_other) - 1000000 END"
            ).cast("bigint"),
        )
        .orderBy("other_type")
    )


# --- cusum_changepoint ---------------------------------------------------


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint locator over the daily order-revenue series: the
    cumulative deviation Sₜ = Σ_{i≤t}(x_i − x̄) peaks at the most likely
    level-shift day.  Computed EXACTLY by cross-multiplying the mean away
    — S'ₜ = n·prefixₜ − t·total — and dividing back by n only at output.
    The top-5 |S| days are the changepoint candidates an ops dashboard
    flags.

    Exactness: revenue is exact integer cents; prefix sums, n·prefix and
    t·total are DECIMAL(38,0) products of bigints (never overflow);
    ordering is on the EXACT decimal |S'| with day tiebreak; the emitted
    ``s_cents`` = sign-factored trunc(S'/n) is bounded by total_cents
    (≈ 3·10¹⁶ even at 100 TB — the r8-session-2 review caught that the
    undivided S' itself would overflow BIGINT at sf1000).

    Scale: one map-side-combined daily aggregate is the only full-data
    shuffle; the prefix window runs over the |days|-row series (the
    seasonal_decompose_daily discipline — bounded by the calendar, not
    the data).
    """
    daily = (
        load(spark, sf_dir, "orders")
        .select(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias(
                "cents"
            ),
        )
        .groupBy("day")
        .agg(F.sum("cents").cast("bigint").alias("rev_cents"))
    )
    wseq = Window.partitionBy().orderBy("day")
    wall = Window.partitionBy()
    cur = (
        daily.withColumn("t", F.row_number().over(wseq))
        .withColumn(
            "prefix",
            F.sum(F.col("rev_cents").cast("decimal(38,0)")).over(
                wseq.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("n_days", F.count(F.lit(1)).over(wall))
        .withColumn(
            "total",
            F.sum(F.col("rev_cents").cast("decimal(38,0)")).over(wall),
        )
    )
    cur = cur.withColumn(
        "s_dec",
        F.col("n_days").cast("decimal(38,0)") * F.col("prefix")
        - F.col("t").cast("decimal(38,0)") * F.col("total"),
    )
    return (
        cur.select(
            "day",
            F.col("t").cast("bigint").alias("t"),
            "rev_cents",
            F.expr(_sdiv("s_dec", "n_days", "DIV")).cast("bigint").alias(
                "s_cents"
            ),
            F.col("s_dec").alias("_ord"),
        )
        .orderBy(F.abs(F.col("_ord")).desc(), "day")
        .limit(5)
        .drop("_ord")
    )


# --- benford_first_digit --------------------------------------------------
# Benford expected ppm: round(log10(1 + 1/d) * 1e6).  The nine literals
# sum to exactly 1,000,000 and are interpolated into BOTH engine texts
# from this one table, so the expectation can never drift between them.
_BENFORD_PPM: tuple[tuple[int, int], ...] = (
    (1, 301030),
    (2, 176091),
    (3, 124939),
    (4, 96910),
    (5, 79181),
    (6, 66947),
    (7, 57992),
    (8, 51153),
    (9, 45757),
)
_BENFORD_VALUES = ", ".join(f"({d}, {p})" for d, p in _BENFORD_PPM)
# (10⁶·O − N·p)² / (10⁶·N·p): exact DECIMAL numerator, one shared-text
# double division rounded at 6.
_BEN_NUM = (
    "(CAST(1000000 AS DECIMAL(38,0)) * obs"
    " - CAST(n_tot AS DECIMAL(38,0)) * exp_ppm)"
)
_BEN_CONTRIB = (
    f"ROUND((CAST({_BEN_NUM} AS DOUBLE) * CAST({_BEN_NUM} AS DOUBLE))"
    " / (1e6 * CAST(n_tot AS DOUBLE) * exp_ppm), 6)"
)


def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the standard
    fabricated-data / ingestion-bug screen for financial columns: the
    first significant digit of genuine transaction amounts follows
    log10(1 + 1/d), and a chi-square distance from that curve flags
    synthetic or truncated feeds.  (TPC-H-style uniform prices flunk it
    loudly — which is exactly what the audit should report.)

    Exactness: digit counts are exact integers off the cent-integer's
    leading character; expected frequencies are the 9 shared ppm literals
    (summing to exactly 10⁶); each digit's contribution is ONE shared-
    text double division with an exact-DECIMAL numerator, rounded at 6,
    summed as DECIMAL over the 9-row grid.  Benford applies to positive
    magnitudes: amounts run through ABS and zero rows are excluded
    BEFORE digit extraction (a refund or zero row would otherwise hand
    '-'/'0' to the digit cast — engine-divergent — and inflate n_tot
    against the 9-digit grid; r8-session-2 review finding).

    Scale: one map-side-combined digit count (9 groups) is the only
    shuffle; the literal digit table broadcasts.
    """
    cents = (
        load(spark, sf_dir, "orders")
        .select(
            F.expr("ABS(CAST(ROUND(o_totalprice * 100) AS BIGINT))").alias(
                "cents"
            )
        )
        .filter(F.col("cents") > 0)
        .select(
            F.expr(
                "CAST(SUBSTRING(CAST(cents AS STRING), 1, 1) AS BIGINT)"
            ).alias("digit")
        )
    )
    # persisted: the 9-row digit histogram feeds both the grid join and
    # the n_tot scalar — one orders scan instead of two.
    obs = shared.shared_persist(
        ("benford_obs", spark.sparkContext.applicationId, sf_dir),
        lambda: cents.groupBy("digit").agg(F.count(F.lit(1)).alias("obs")),
    )
    expected = spark.sql(
        f"SELECT digit, exp_ppm FROM VALUES {_BENFORD_VALUES}"
        " AS t(digit, exp_ppm)"
    )
    tot = obs.groupBy().agg(F.sum("obs").alias("n_tot"))
    grid = (
        expected.join(obs, "digit", "left")
        .withColumn("obs", F.coalesce(F.col("obs"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    scored = grid.select(
        F.col("digit").cast("bigint").alias("digit"),
        F.col("obs").cast("bigint").alias("obs"),
        F.col("exp_ppm").cast("bigint").alias("exp_ppm"),
        F.expr(_BEN_CONTRIB).cast("decimal(18,6)").alias("contrib"),
    )
    w = Window.partitionBy()
    return (
        scored.withColumn("chi2", F.sum("contrib").over(w).cast("double"))
        .withColumn("contrib", F.col("contrib").cast("double"))
        .orderBy("digit")
    )


# --- survival_km_daily -----------------------------------------------------
_KM_TERM = (
    "ROUND(LN(CAST(n_risk - n_event AS DOUBLE)"
    " / CAST(n_risk AS DOUBLE)), 6)"
)


def survival_km_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-first-purchase curve at day granularity: per
    user, duration = days from first event to first purchase (event) or
    to last event (right-censored, no purchase).  The KM estimator
    Ŝ(t) = Π_{dᵢ ≤ t} (1 − dᵢ/nᵢ) surfaces in LOG space: ln Ŝ is the
    cumulative DECIMAL sum of per-step rounded LN terms — exact,
    order-independent, and free of any cross-engine EXP dependency.
    Same-day-censored users stay at risk through that day's events
    (standard convention).  If a terminal step has nᵢ = dᵢ the survival
    is exactly zero: that step emits ln_survival NULL with s_zero = 1.

    Exactness: durations are nonneg integer epoch-second diffs DIV 86400
    (floor == trunc on both engines); risk counts are exact integers via
    one cumulative window; each event step contributes ONE shared-text
    LN rounded at 6, summed as DECIMAL(18,6).

    Scale: per-user reduction is one map-side-combined aggregate; the
    step relation is grouped by duration-DAY, so the single-partition
    window runs over ≤ horizon-days rows BY CONSTRUCTION (the KS
    grid-bound pattern), not per-user cardinality.
    """
    per_user = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.unix_timestamp("ts").alias("ets"),
            (F.col("event_type") == "purchase").alias("is_p"),
        )
        .groupBy("user_id")
        .agg(
            F.min("ets").alias("t0"),
            F.min(F.when(F.col("is_p"), F.col("ets"))).alias("tp"),
            F.max("ets").alias("tlast"),
        )
        .select(
            F.expr(
                "(COALESCE(tp, tlast) - t0) DIV 86400"
            ).alias("dur_days"),
            F.col("tp").isNotNull().alias("converted"),
        )
    )
    steps = per_user.groupBy("dur_days").agg(
        F.sum(F.when(F.col("converted"), 1).otherwise(0)).alias("n_event"),
        F.sum(F.when(~F.col("converted"), 1).otherwise(0)).alias("n_censor"),
    )
    wseq = Window.partitionBy().orderBy("dur_days")
    wall = Window.partitionBy()
    cur = (
        steps.withColumn(
            "removed_before",
            F.coalesce(
                F.sum(F.col("n_event") + F.col("n_censor")).over(
                    wseq.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "n_total",
            F.sum(F.col("n_event") + F.col("n_censor")).over(wall),
        )
        .withColumn("n_risk", F.col("n_total") - F.col("removed_before"))
        .filter(F.col("n_event") > 0)
        .withColumn(
            "term",
            F.when(
                F.col("n_risk") > F.col("n_event"),
                F.expr(_KM_TERM).cast("decimal(18,6)"),
            ),
        )
        .withColumn(
            "s_zero",
            F.max(
                F.when(F.col("n_risk") == F.col("n_event"), 1).otherwise(0)
            ).over(wseq.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "lnsum",
            F.sum("term").over(
                wseq.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        cur.select(
            F.col("dur_days").cast("bigint").alias("dur_days"),
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("n_event").cast("bigint").alias("n_event"),
            F.col("s_zero").cast("bigint").alias("s_zero"),
            F.when(F.col("s_zero") == 0, F.col("lnsum").cast("double"))
            .alias("ln_survival"),
        )
        .orderBy("dur_days")
        .limit(30)
    )


ORACLE: dict[str, str] = {
    "chisq_independence": f"""
        WITH cells AS (
          SELECT source, lang, COUNT(*) AS obs
          FROM documents GROUP BY source, lang
        ),
        r AS (SELECT source, SUM(obs) AS r_tot FROM cells GROUP BY source),
        c AS (SELECT lang, SUM(obs) AS c_tot FROM cells GROUP BY lang),
        tot AS (
          SELECT SUM(obs) AS n_tot,
                 COUNT(DISTINCT source) AS n_r,
                 COUNT(DISTINCT lang) AS n_c
          FROM cells
        ),
        grid AS (
          SELECT r.source, c.lang, r.r_tot, c.c_tot,
                 COALESCE(cells.obs, 0) AS obs
          FROM r CROSS JOIN c
          LEFT JOIN cells ON cells.source = r.source AND cells.lang = c.lang
        ),
        scored AS (
          SELECT source, lang,
                 CAST(obs AS BIGINT) AS obs,
                 CAST((CAST(r_tot AS HUGEINT) * c_tot * 1000000) // n_tot
                      AS BIGINT) AS exp_ppm,
                 CAST({_CHI_CONTRIB} AS DECIMAL(18,6)) AS contrib,
                 CAST((n_r - 1) * (n_c - 1) AS BIGINT) AS dof
          FROM grid CROSS JOIN tot
        )
        SELECT source, lang, obs, exp_ppm,
               CAST(contrib AS DOUBLE) AS contrib,
               CAST(SUM(contrib) OVER () AS DOUBLE) AS chi2,
               dof
        FROM scored
        ORDER BY CAST(contrib AS DOUBLE) DESC, source, lang
        LIMIT 15
    """,
    "mannwhitney_shift": """
        WITH counts AS (
          SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents,
                 COUNT(*) AS c
          FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        ),
        pc AS (
          SELECT cents, c AS cp FROM counts WHERE event_type = 'purchase'
        ),
        oc AS (
          SELECT event_type AS other_type, cents, c AS co
          FROM counts WHERE event_type <> 'purchase'
        ),
        merged AS (
          SELECT other_type, cents, SUM(cp) AS cp, SUM(co) AS co
          FROM (
            SELECT t.other_type, pc.cents, pc.cp, 0 AS co
            FROM pc CROSS JOIN (SELECT DISTINCT other_type FROM oc) t
            UNION ALL
            SELECT other_type, cents, 0 AS cp, co FROM oc
          )
          GROUP BY other_type, cents
        ),
        ranked AS (
          SELECT other_type, cp, co,
                 COALESCE(SUM(cp + co) OVER (
                   PARTITION BY other_type ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS lt
          FROM merged
        ),
        stats AS (
          SELECT other_type,
                 CAST(SUM(cp) AS BIGINT) AS n_purchase,
                 CAST(SUM(co) AS BIGINT) AS n_other,
                 SUM(CAST(cp AS HUGEINT) * (2 * lt + cp + co + 1)) AS two_r1
          FROM ranked GROUP BY other_type
        )
        SELECT other_type, n_purchase, n_other,
               CAST(two_r1 - n_purchase * (n_purchase + 1) AS BIGINT)
                 AS u_purchase_x2,
               CAST(CASE WHEN n_purchase = 0 OR n_other = 0 THEN NULL
                    ELSE (CAST(u_purchase_x2 AS HUGEINT) * 1000000)
                         // (n_purchase * n_other) - 1000000 END AS BIGINT)
                 AS rank_biserial_ppm
        FROM stats
        ORDER BY other_type
    """,
    "cusum_changepoint": f"""
        WITH daily AS (
          SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS rev_cents
          FROM orders GROUP BY 1
        ),
        cur AS (
          SELECT day, rev_cents,
                 ROW_NUMBER() OVER (ORDER BY day) AS t,
                 SUM(CAST(rev_cents AS DECIMAL(38,0)))
                   OVER (ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prefix,
                 COUNT(*) OVER () AS n_days,
                 SUM(CAST(rev_cents AS DECIMAL(38,0))) OVER () AS total
          FROM daily
        ),
        scored AS (
          SELECT day, t, rev_cents, n_days,
                 CAST(n_days AS DECIMAL(38,0)) * prefix
                   - CAST(t AS DECIMAL(38,0)) * total AS s_dec
          FROM cur
        )
        SELECT day, CAST(t AS BIGINT) AS t, rev_cents,
               CAST({_sdiv("CAST(s_dec AS HUGEINT)", "n_days", "//")}
                    AS BIGINT) AS s_cents
        FROM scored
        ORDER BY ABS(s_dec) DESC, day
        LIMIT 5
    """,
    "benford_first_digit": f"""
        WITH cents AS (
          SELECT ABS(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
          FROM orders
        ),
        obs AS (
          SELECT CAST(SUBSTRING(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                   AS digit,
                 COUNT(*) AS obs
          FROM cents WHERE cents > 0 GROUP BY 1
        ),
        expected AS (
          SELECT digit, exp_ppm
          FROM (VALUES {_BENFORD_VALUES}) AS t(digit, exp_ppm)
        ),
        tot AS (SELECT SUM(obs) AS n_tot FROM obs),
        grid AS (
          SELECT e.digit, e.exp_ppm, COALESCE(o.obs, 0) AS obs
          FROM expected e LEFT JOIN obs o ON o.digit = e.digit
        ),
        scored AS (
          SELECT CAST(digit AS BIGINT) AS digit,
                 CAST(obs AS BIGINT) AS obs,
                 CAST(exp_ppm AS BIGINT) AS exp_ppm,
                 CAST({_BEN_CONTRIB} AS DECIMAL(18,6)) AS contrib
          FROM grid CROSS JOIN tot
        )
        SELECT digit, obs, exp_ppm,
               CAST(contrib AS DOUBLE) AS contrib,
               CAST(SUM(contrib) OVER () AS DOUBLE) AS chi2
        FROM scored
        ORDER BY digit
    """,
    "survival_km_daily": f"""
        WITH per_user AS (
          SELECT (COALESCE(tp, tlast) - t0) // 86400 AS dur_days,
                 tp IS NOT NULL AS converted
          FROM (
            SELECT user_id,
                   MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS t0,
                   MIN(CASE WHEN event_type = 'purchase'
                       THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END) AS tp,
                   MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS tlast
            FROM events GROUP BY user_id
          )
        ),
        steps AS (
          SELECT dur_days,
                 SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS n_event,
                 SUM(CASE WHEN NOT converted THEN 1 ELSE 0 END) AS n_censor
          FROM per_user GROUP BY dur_days
        ),
        cur AS (
          SELECT dur_days, n_event,
                 SUM(n_event + n_censor) OVER () -
                 COALESCE(SUM(n_event + n_censor) OVER (
                   ORDER BY dur_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS n_risk
          FROM steps
        ),
        ev AS (
          SELECT dur_days, n_risk, n_event,
                 CASE WHEN n_risk > n_event
                      THEN CAST({_KM_TERM} AS DECIMAL(18,6)) END AS term,
                 MAX(CASE WHEN n_risk = n_event THEN 1 ELSE 0 END) OVER (
                   ORDER BY dur_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS s_zero,
                 SUM(CASE WHEN n_risk > n_event
                      THEN CAST({_KM_TERM} AS DECIMAL(18,6)) END) OVER (
                   ORDER BY dur_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS lnsum
          FROM cur WHERE n_event > 0
        )
        SELECT CAST(dur_days AS BIGINT) AS dur_days,
               CAST(n_risk AS BIGINT) AS n_risk,
               CAST(n_event AS BIGINT) AS n_event,
               CAST(s_zero AS BIGINT) AS s_zero,
               CASE WHEN s_zero = 0 THEN CAST(lnsum AS DOUBLE) END
                 AS ln_survival
        FROM ev
        ORDER BY dur_days
        LIMIT 30
    """,
}


# --- theil_sen_slope --------------------------------------------------------
_TS_WINDOW_DAYS = 128  # trailing-window cap: pairs ≤ 128·127/2 = 8128


def daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE exact daily order-revenue relation (xd = epoch day, rev =
    integer cents), persisted once per (session, sf_dir) and shared by
    :func:`theil_sen_slope` and pipeline16's calendar-grid family
    (mann_kendall / runs test / binseg / hurst) — one orders scan per
    session instead of one per consumer.  Calendar-day index via
    DATEDIFF, not unix_timestamp: instant conversion of a wall-clock
    timestamp is session-TZ-sensitive (date_agg_monthly discipline)."""
    return shared.shared_persist(
        ("theil_sen_daily", spark.sparkContext.applicationId, sf_dir),
        lambda: (
            load(spark, sf_dir, "orders")
            .select(
                F.expr(
                    "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"
                ).cast("bigint").alias("xd"),
                F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias(
                    "cents"
                ),
            )
            .groupBy("xd")
            .agg(F.sum("cents").cast("bigint").alias("rev"))
        ),
    )


def theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimate of daily order revenue over the
    TRAILING `_TS_WINDOW_DAYS`-day window: the median (and quartiles) of
    all pairwise day-to-day slopes — the outlier-proof alternative to
    ``regression_line``'s OLS (one anomalous day moves OLS; it barely
    moves the pairwise-slope median).

    Exactness: slopes are integer ppm-cents-per-day via sign-factored
    truncating division (pipeline8's ``_sdiv`` contract — floor == trunc
    only on non-negative operands, so the sign is factored out first);
    the quartiles are data-valued ``percentile_disc`` order statistics
    (convention-identical cross-engine, the length_gate_disc precedent).

    Scale: the trailing-window cap makes the pair relation ≤ 8128 rows
    BY CONSTRUCTION (the KS grid-cap pattern) — an UNBOUNDED all-history
    Theil-Sen would buffer |days|²/2 slopes inside percentile_disc's
    order-statistic state, which OOMs at a few thousand days (measured:
    2 400 days ⇒ 2.9M buffered slopes took out a 1 GiB executor).  The
    one full-data shuffle is the map-side-combined daily aggregate; the
    window bound derives from its 1-row MAX, broadcast back.
    """
    # persisted: the max-day scalar and both pair sides read this |days|-
    # row aggregate — unpersisted it cost four full orders scans.
    daily = daily_revenue(spark, sf_dir)
    last = daily.groupBy().agg(F.max("xd").alias("xmax"))
    recent = (
        daily.crossJoin(F.broadcast(last))
        .filter(F.col("xd") > F.col("xmax") - _TS_WINDOW_DAYS)
        .select("xd", "rev")
    )
    a = recent.select(
        F.col("xd").alias("x1"), F.col("rev").alias("r1")
    )
    b = recent.select(
        F.col("xd").alias("x2"), F.col("rev").alias("r2")
    )
    pairs = a.join(b, F.col("x2") > F.col("x1")).select(
        F.expr(
            _sdiv("((r2 - r1) * CAST(1000000 AS BIGINT))", "(x2 - x1)", "DIV")
        ).alias("slope_ppm")
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.expr(
            "CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY slope_ppm)"
            " AS BIGINT)"
        ).alias("slope_p25_ppm"),
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY slope_ppm)"
            " AS BIGINT)"
        ).alias("slope_med_ppm"),
        F.expr(
            "CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY slope_ppm)"
            " AS BIGINT)"
        ).alias("slope_p75_ppm"),
    )


# --- cohens_d_by_type -------------------------------------------------------
# ONE shared fixed-op-order text: means from exact DECIMAL sums, pooled
# variance from the exact nᵢ·qᵢ − sᵢ² decimal numerators, a single
# IEEE-correctly-rounded SQRT (the corr_matrix precedent), rounded at 6.
_COHEN_D = (
    "ROUND((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    " / SQRT((CAST(n1 * q1 - s1 * s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " + CAST(n2 * q2 - s2 * s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    " / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2e0)), 6)"
)


def cohens_d_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d standardized effect size of event value, 'purchase'
    against each other event type — the parametric twin of
    ``mannwhitney_shift`` (MW says the distributions shifted; d says by
    how many pooled standard deviations).  The anova_value_by_type moment
    discipline: per-type n/Σc/Σc² as exact DECIMAL(38,0), every division
    and the one SQRT inside a single shared-text expression rounded at 6.
    Degenerate pairs (n₁+n₂ ≤ 2, or zero pooled variance) emit NULL
    identically on both engines instead of IEEE-Infinity divergence.

    Scale: ONE map-side-combined groupBy(type) reduces the corpus to
    |types| rows; the purchase row broadcasts onto the rest.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("c"),
    )
    # persisted: purchase and other splits read this |types|-row moment
    # relation — one events scan instead of two.
    per_type = shared.shared_persist(
        ("cohens_moments", spark.sparkContext.applicationId, sf_dir),
        lambda: ev.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
            F.sum(
                F.col("c").cast("decimal(38,0)")
                * F.col("c").cast("decimal(38,0)")
            ).alias("q"),
        ),
    )
    p = per_type.filter(F.col("event_type") == "purchase").select(
        F.col("n").alias("n1"), F.col("s").alias("s1"), F.col("q").alias("q1")
    )
    o = per_type.filter(F.col("event_type") != "purchase").select(
        F.col("event_type").alias("other_type"),
        F.col("n").alias("n2"),
        F.col("s").alias("s2"),
        F.col("q").alias("q2"),
    )
    return (
        o.crossJoin(F.broadcast(p))
        .select(
            "other_type",
            F.col("n1").cast("bigint").alias("n_purchase"),
            F.col("n2").cast("bigint").alias("n_other"),
            F.expr(
                "CASE WHEN CAST(n1 AS BIGINT) + CAST(n2 AS BIGINT) - 2 <= 0"
                " OR (n1 * q1 - s1 * s1 = 0 AND n2 * q2 - s2 * s2 = 0)"
                f" THEN NULL ELSE {_COHEN_D} END"
            ).alias("cohens_d"),
        )
        .orderBy("other_type")
    )


ORACLE["theil_sen_slope"] = f"""
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                  AS BIGINT) AS xd,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    last AS (SELECT MAX(xd) AS xmax FROM daily),
    recent AS (
      SELECT xd, rev FROM daily CROSS JOIN last
      WHERE xd > xmax - {_TS_WINDOW_DAYS}
    ),
    pairs AS (
      SELECT {_sdiv("((b.rev - a.rev) * CAST(1000000 AS BIGINT))", "(b.xd - a.xd)", "//")} AS slope_ppm
      FROM recent a JOIN recent b ON b.xd > a.xd
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY slope_ppm)
                AS BIGINT) AS slope_p25_ppm,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY slope_ppm)
                AS BIGINT) AS slope_med_ppm,
           CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY slope_ppm)
                AS BIGINT) AS slope_p75_ppm
    FROM pairs
"""

ORACLE["cohens_d_by_type"] = f"""
    WITH per_type AS (
      SELECT event_type,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             SUM(CAST(CAST(ROUND(value * 100) AS BIGINT)
                 AS DECIMAL(38,0))) AS s,
             SUM(CAST(CAST(ROUND(value * 100) AS BIGINT) AS DECIMAL(38,0))
                 * CAST(CAST(ROUND(value * 100) AS BIGINT)
                 AS DECIMAL(38,0))) AS q
      FROM events GROUP BY event_type
    ),
    p AS (
      SELECT n AS n1, s AS s1, q AS q1 FROM per_type
      WHERE event_type = 'purchase'
    ),
    o AS (
      SELECT event_type AS other_type, n AS n2, s AS s2, q AS q2
      FROM per_type WHERE event_type <> 'purchase'
    )
    SELECT other_type,
           CAST(n1 AS BIGINT) AS n_purchase,
           CAST(n2 AS BIGINT) AS n_other,
           CASE WHEN CAST(n1 AS BIGINT) + CAST(n2 AS BIGINT) - 2 <= 0
                OR (n1 * q1 - s1 * s1 = 0 AND n2 * q2 - s2 * s2 = 0)
                THEN NULL ELSE {_COHEN_D} END AS cohens_d
    FROM o CROSS JOIN p
    ORDER BY other_type
"""


# --- permutation_test_diff --------------------------------------------------
_PERM_R = 64
# ONE shared text for a group-mean difference over exact decimal sums.
_PERM_DIFF = (
    "ROUND(CAST({s1} AS DOUBLE) / CAST({n1} AS DOUBLE)"
    " - CAST({s0} AS DOUBLE) / CAST({n0} AS DOUBLE), 6)"
)
# Deterministic per-(row, replicate) coin: the md5 idiom (engine-identical
# hex parse), parity of the first nibble.
_PERM_COIN = (
    "CAST(conv(substring(md5(CONCAT(CAST(event_id AS STRING), ':',"
    " CAST(r AS STRING))), 1, 1), 16, 10) AS BIGINT) % 2"
)
_PERM_COIN_DUCK = (
    "CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR) || ':' ||"
    " CAST(r AS VARCHAR)), 1, 1)) AS BIGINT) % 2"
)


def permutation_test_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test (approximate-randomization flavor) for the
    purchase-vs-click mean-value difference — the significance companion
    to ``poisson_bootstrap_ci``'s interval and ``cohens_d_by_type``'s
    effect size: under H₀ (labels exchangeable) the observed |Δmean|
    should not be extreme among label-rerandomized replicates.  Each of
    `_PERM_R` replicates reassigns every row by a deterministic md5 coin
    (true randomization re-draws labels; group sizes vary binomially —
    the documented approximate-randomization variant, which keeps the
    pass fully deterministic and engine-identical).  p = fraction of
    valid replicates with |Δ_r| ≥ |Δ_obs|, as exact integer ppm.

    Exactness: sums are DECIMAL(38,0) cents; each Δ is the ONE shared
    `_PERM_DIFF` text rounded at 6; the ≥ comparison runs on those exact
    decimals; p_ppm is positive-operand DIV.  Replicates where the coin
    empties a side emit NULL Δ and drop from both counts.

    Scale: the 64× explode feeds ONE map-side-combined 64-group
    aggregate (the poisson_bootstrap shape — partials reduce to ≤ 64
    rows per partition before the exchange; no expanded-row shuffle).
    """
    # persisted: the observed aggregate AND the 64x replicate explode both
    # read this filtered projection — one events scan instead of two.
    base = shared.shared_persist(
        ("perm_base", spark.sparkContext.applicationId, sf_dir),
        lambda: load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "event_id",
            (F.col("event_type") == "purchase").alias("is_p"),
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
        ),
    )
    obs = base.groupBy().agg(
        F.sum(F.when(F.col("is_p"), 1).otherwise(0)).alias("n_p"),
        F.sum(
            F.when(F.col("is_p"), F.col("cents")).otherwise(0).cast(
                "decimal(38,0)"
            )
        ).alias("s_p"),
        F.sum(F.when(~F.col("is_p"), 1).otherwise(0)).alias("n_c"),
        F.sum(
            F.when(~F.col("is_p"), F.col("cents")).otherwise(0).cast(
                "decimal(38,0)"
            )
        ).alias("s_c"),
    ).withColumn(
        "diff_obs",
        F.expr(
            "CASE WHEN n_p = 0 OR n_c = 0 THEN NULL ELSE "
            + _PERM_DIFF.format(s1="s_p", n1="n_p", s0="s_c", n0="n_c")
            + " END"
        ).cast("decimal(18,6)"),
    )
    reps = (
        base.select(
            "event_id",
            "cents",
            F.explode(F.expr(f"sequence(0, {_PERM_R - 1})")).alias("r"),
        )
        .withColumn("coin", F.expr(_PERM_COIN))
        .groupBy("r")
        .agg(
            F.sum(F.when(F.col("coin") == 1, 1).otherwise(0)).alias("n1"),
            F.sum(
                F.when(F.col("coin") == 1, F.col("cents")).otherwise(0).cast(
                    "decimal(38,0)"
                )
            ).alias("s1"),
            F.sum(F.when(F.col("coin") == 0, 1).otherwise(0)).alias("n0"),
            F.sum(
                F.when(F.col("coin") == 0, F.col("cents")).otherwise(0).cast(
                    "decimal(38,0)"
                )
            ).alias("s0"),
        )
        .withColumn(
            "diff_r",
            F.expr(
                "CASE WHEN n1 = 0 OR n0 = 0 THEN NULL ELSE "
                + _PERM_DIFF.format(s1="s1", n1="n1", s0="s0", n0="n0")
                + " END"
            ).cast("decimal(18,6)"),
        )
    )
    return (
        reps.crossJoin(F.broadcast(obs))
        .groupBy()
        .agg(
            F.max("n_p").cast("bigint").alias("n_purchase"),
            F.max("n_c").cast("bigint").alias("n_click"),
            F.max("diff_obs").cast("double").alias("diff_obs"),
            F.sum(
                F.when(
                    F.col("diff_r").isNotNull() & F.col("diff_obs").isNotNull(),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_valid"),
            F.sum(
                F.when(
                    F.abs(F.col("diff_r")) >= F.abs(F.col("diff_obs")), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_extreme"),
        )
        .withColumn(
            "p_ppm",
            F.expr(
                "CASE WHEN n_valid = 0 THEN NULL"
                " ELSE (n_extreme * CAST(1000000 AS BIGINT)) DIV n_valid END"
            ).cast("bigint"),
        )
    )


ORACLE["permutation_test_diff"] = f"""
    WITH base AS (
      SELECT event_id, event_type = 'purchase' AS is_p,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    obs AS (
      SELECT SUM(CASE WHEN is_p THEN 1 ELSE 0 END) AS n_p,
             SUM(CAST(CASE WHEN is_p THEN cents ELSE 0 END
                 AS DECIMAL(38,0))) AS s_p,
             SUM(CASE WHEN NOT is_p THEN 1 ELSE 0 END) AS n_c,
             SUM(CAST(CASE WHEN NOT is_p THEN cents ELSE 0 END
                 AS DECIMAL(38,0))) AS s_c
      FROM base
    ),
    obs2 AS (
      SELECT n_p, n_c,
             CAST(CASE WHEN n_p = 0 OR n_c = 0 THEN NULL ELSE
               {_PERM_DIFF.format(s1="s_p", n1="n_p", s0="s_c", n0="n_c")}
             END AS DECIMAL(18,6)) AS diff_obs
      FROM obs
    ),
    reps AS (
      SELECT r,
             SUM(CASE WHEN coin = 1 THEN 1 ELSE 0 END) AS n1,
             SUM(CAST(CASE WHEN coin = 1 THEN cents ELSE 0 END
                 AS DECIMAL(38,0))) AS s1,
             SUM(CASE WHEN coin = 0 THEN 1 ELSE 0 END) AS n0,
             SUM(CAST(CASE WHEN coin = 0 THEN cents ELSE 0 END
                 AS DECIMAL(38,0))) AS s0
      FROM (
        SELECT event_id, cents, r, {_PERM_COIN_DUCK} AS coin
        FROM base CROSS JOIN (
          SELECT UNNEST(generate_series(0, {_PERM_R - 1})) AS r
        ) grid
      )
      GROUP BY r
    ),
    reps2 AS (
      SELECT r,
             CAST(CASE WHEN n1 = 0 OR n0 = 0 THEN NULL ELSE
               {_PERM_DIFF.format(s1="s1", n1="n1", s0="s0", n0="n0")}
             END AS DECIMAL(18,6)) AS diff_r
      FROM reps
    )
    SELECT CAST(MAX(n_p) AS BIGINT) AS n_purchase,
           CAST(MAX(n_c) AS BIGINT) AS n_click,
           CAST(MAX(diff_obs) AS DOUBLE) AS diff_obs,
           CAST(SUM(CASE WHEN diff_r IS NOT NULL AND diff_obs IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(SUM(CASE WHEN ABS(diff_r) >= ABS(diff_obs)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           CAST(CASE WHEN SUM(CASE WHEN diff_r IS NOT NULL
                              AND diff_obs IS NOT NULL
                              THEN 1 ELSE 0 END) = 0 THEN NULL
                ELSE (SUM(CASE WHEN ABS(diff_r) >= ABS(diff_obs)
                          THEN 1 ELSE 0 END) * CAST(1000000 AS BIGINT))
                     // SUM(CASE WHEN diff_r IS NOT NULL
                            AND diff_obs IS NOT NULL THEN 1 ELSE 0 END)
                END AS BIGINT) AS p_ppm
    FROM reps2 CROSS JOIN obs2
"""


# --- mcnemar_gate_disagreement ----------------------------------------------
# Continuity-corrected McNemar statistic over exact integer cells: the one
# shared float text is (|b−c|−1)²/(b+c), rounded at 6.
_MCNEMAR = (
    "ROUND(((ABS(CAST(b AS DOUBLE) - c) - 1e0)"
    " * (ABS(CAST(b AS DOUBLE) - c) - 1e0)) / (CAST(b AS DOUBLE) + c), 6)"
)


def mcnemar_gate_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test between two curation gates on the SAME
    documents — "do the length gate and the lexical-diversity gate
    disagree symmetrically, or does one systematically pass what the
    other rejects?"  (chisq_independence compares unpaired marginals;
    McNemar is the correct test when both classifiers score the same
    items; ``classifier_agreement_kappa`` measures agreement magnitude,
    this tests disagreement DIRECTION.)  Gate 1: n_chars ≥ 200.
    Gate 2: 2·|distinct tokens| ≥ |tokens| (≥ 50% type-token ratio, the
    repetition screen) — an exact integer comparison, no float ratio.

    Exactness: the 2×2 cells are exact integer counts from ONE map-side
    aggregate; the continuity-corrected statistic is one shared float
    text rounded at 6, NULL when b + c = 0 (both engines would
    otherwise hit 0/0); the b:(b+c) disagreement share is integer ppm.

    Scale: map-only gate evaluation into a single global aggregate.
    """
    docs = load(spark, sf_dir, "documents").select(
        (F.col("n_chars") >= 200).alias("g1"),
        (
            2 * X.distinct_token_count(F.col("text"))
            >= X.token_count(F.col("text"))
        ).alias("g2"),
    )
    cells = docs.groupBy().agg(
        F.sum(F.when(F.col("g1") & F.col("g2"), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(F.col("g1") & ~F.col("g2"), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when(~F.col("g1") & F.col("g2"), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when(~F.col("g1") & ~F.col("g2"), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.expr(
            f"CASE WHEN b + c = 0 THEN NULL ELSE {_MCNEMAR} END"
        ).alias("mcnemar_x2"),
        F.expr(
            "CASE WHEN b + c = 0 THEN NULL"
            " ELSE (b * CAST(1000000 AS BIGINT)) DIV (b + c) END"
        )
        .cast("bigint")
        .alias("b_share_ppm"),
    )


# --- spearman_rank_corr -------------------------------------------------
# Pearson over DOUBLED midranks (2·midrank = 2·lt + eq + 1 stays an exact
# integer under ties; the doubling cancels in the correlation).  The
# autocorr_daily/_AC shared-text shape: every aggregate casts to DOUBLE
# BEFORE the n·s products — a native DECIMAL(38,0) multiply here reaches
# ~4·n⁴ and hard-crashes BOTH engines past ~2·10⁹ docs (r8-s2 review;
# the cusum overflow class, verified empirically on both).
_SP_NUM = (
    "(CAST(nd AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
)
_SP_DEN = (
    "(SQRT(CAST(nd AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * SQRT(CAST(nd AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
)


def spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between document LENGTH (n_chars) and
    TOKEN COUNT — the monotone-association audit (``corr_matrix`` gives
    Pearson on raw values; Spearman is outlier-proof and catches any
    monotone relation).  Ranks come from the VALUE-LEVEL count grids
    (bounded by the distinct-length / distinct-token-count domains, the
    Mann-Whitney construction — never a raw-row rank window); doubled
    midranks keep every rank an exact integer under ties.

    Exactness: both rank maps derive from exact integer counts via
    bounded cumulative windows; per-doc doubled ranks join back through
    those maps; all five moments are exact DECIMAL(38,0) sums; rho is
    ONE shared two-SQRT text rounded at 6, NULL when either variable is
    constant (zero variance ⇒ 0/0 on both engines otherwise).

    Scale: one map-side-combined count per variable (grids bounded by
    the value domains), two broadcast-joinable rank maps, one global
    moment aggregate.  No raw-row window anywhere.
    """
    # NULL x/y rows are excluded up front: they'd drop from the moment
    # join anyway (NULL never equi-joins), but their count-grid groups
    # would shift every other value's rank prefix sum under the engines'
    # opposite default NULL sort positions (r9 ADVICE).
    base = shared.shared_persist(
        ("spearman_base", spark.sparkContext.applicationId, sf_dir),
        lambda: load(spark, sf_dir, "documents")
        .select(
            F.col("n_chars").alias("x"),
            X.token_count(F.col("text")).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull()),
    )

    def rank_map(col: str):
        counts = base.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        w = (
            Window.orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return counts.select(
            col,
            (
                2 * F.coalesce(F.sum("c").over(w), F.lit(0))
                + F.col("c")
                + 1
            ).alias(f"r2{col}"),
        )

    joined = (
        base.join(F.broadcast(rank_map("x")), "x")
        .join(F.broadcast(rank_map("y")), "y")
        .select(
            F.col("r2x").cast("decimal(38,0)").alias("rx"),
            F.col("r2y").cast("decimal(38,0)").alias("ry"),
        )
    )
    m = joined.groupBy().agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("nd"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    return m.select(
        F.col("nd").cast("bigint").alias("n_docs"),
        F.expr(
            f"CASE WHEN {_SP_DEN} = 0 THEN NULL"
            f" ELSE ROUND({_SP_NUM} / {_SP_DEN}, 6) END"
        ).alias("spearman_rho"),
    )


ORACLE["mcnemar_gate_disagreement"] = f"""
    WITH docs AS (
      SELECT n_chars >= 200 AS g1,
             2 * len(list_distinct({{toks}})) >= len({{toks}}) AS g2
      FROM documents
    ),
    cells AS (
      SELECT CAST(SUM(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN g1 AND NOT g2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN NOT g1 AND g2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(SUM(CASE WHEN NOT g1 AND NOT g2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM docs
    )
    SELECT a, b, c, d,
           CASE WHEN b + c = 0 THEN NULL ELSE {_MCNEMAR} END AS mcnemar_x2,
           CAST(CASE WHEN b + c = 0 THEN NULL
                ELSE (b * CAST(1000000 AS BIGINT)) // (b + c) END
                AS BIGINT) AS b_share_ppm
    FROM cells
"""

ORACLE["spearman_rank_corr"] = f"""
    WITH base AS (
      SELECT n_chars AS x, CAST(len({{toks}}) AS BIGINT) AS y
      FROM documents
      WHERE n_chars IS NOT NULL AND CAST(len({{toks}}) AS BIGINT) IS NOT NULL
    ),
    xr AS (
      SELECT x,
             2 * COALESCE(SUM(c) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c + 1 AS r2x
      FROM (SELECT x, COUNT(*) AS c FROM base GROUP BY x)
    ),
    yr AS (
      SELECT y,
             2 * COALESCE(SUM(c) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c + 1 AS r2y
      FROM (SELECT y, COUNT(*) AS c FROM base GROUP BY y)
    ),
    joined AS (
      SELECT CAST(r2x AS DECIMAL(38,0)) AS rx,
             CAST(r2y AS DECIMAL(38,0)) AS ry
      FROM base JOIN xr USING (x) JOIN yr USING (y)
    ),
    m AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS nd,
             SUM(rx) AS sx, SUM(ry) AS sy,
             SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy,
             SUM(rx * ry) AS sxy
      FROM joined
    )
    SELECT CAST(nd AS BIGINT) AS n_docs,
           CASE WHEN {_SP_DEN} = 0 THEN NULL
                ELSE ROUND({_SP_NUM} / {_SP_DEN}, 6) END AS spearman_rho
    FROM m
"""

# substitute the shared DuckDB tokens expression into the gate/rank oracles
ORACLE["mcnemar_gate_disagreement"] = ORACLE[
    "mcnemar_gate_disagreement"
].format(toks=X.sql_tokens("text"))
ORACLE["spearman_rank_corr"] = ORACLE["spearman_rank_corr"].format(
    toks=X.sql_tokens("text")
)
