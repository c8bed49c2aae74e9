"""Round-9 session-3 statistical-audit tier 3: the sequence / association
statistics that close out the hypothesis-test family — Bowker symmetry
(is the user journey's transition matrix symmetric, the k×k McNemar),
Markov entropy rate (how predictable is the next event), Mann-Kendall
trend + the Wald-Wolfowitz runs test (the nonparametric monotone-trend /
randomness pair every time-series monitor runs before fitting anything),
Cramér's V (effect size for categorical association — chi-square says
"dependent", V says "how much"), and Welch's t (the unequal-variance mean
comparison that completes cohens_d/permutation_test/mannwhitney).

Reference parity: the reference (mabel-dev/hadrodb, ``hadro/engine.py``)
is a record store that defers analytics upstream; SURVEY.md §2.3 scopes
dataset-health audits on top of it.

Exactness discipline (the repo invariant): counts, cent totals, and pair
counts stay exact integers (DECIMAL(38,0) Spark-side / HUGEINT
DuckDB-side for anything that can pass ~1e18 — the r8/r9 overflow
class); every division or transcendental runs ONCE under a SHARED
op-order text, rounded at 6; every integer DIV keeps non-negative
operands (trunc == floor on both engines); NULL inputs are excluded
BEFORE any grid (the engines' default NULL sort positions differ).

Scale design (per-query stories in the docstrings): every statistic
reduces to a bounded-cardinality relation before any window, self-join,
or grid — the |types|² transition matrix, the calendar-day revenue
series, the |priorities|×|statuses| marginal grid, 2-group moment rows.
The only full-data shuffles are map-side-combined counts/sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadrodb_spark.operators import shared
from hadrodb_spark.operators.relational import load

ROWS_ONLY: tuple[str, ...] = ()

ORACLE: dict[str, str] = {}


# ---------------------------------------------------------------- helpers
def _trans_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The certified transition-count relation — pipeline8's single
    shared derivation (and its persisted cache), consumed here by
    bowker / entropy rate / the absorbing funnel."""
    from hadrodb_spark.operators.pipeline8 import transition_counts

    return transition_counts(spark, sf_dir)


from hadrodb_spark.operators.pipeline8 import TRANS_SQL as _TRANS_SQL  # noqa: E402


def _daily_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact daily-revenue relation — pipeline14's single shared
    derivation (and its persisted cache, also feeding theil_sen_slope),
    renamed to this module's (d, total) convention."""
    from hadrodb_spark.operators.pipeline14 import daily_revenue

    return daily_revenue(spark, sf_dir).select(
        F.col("xd").alias("d"), F.col("rev").alias("total")
    )


_DAILY_SQL = """
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total
      FROM orders
      GROUP BY 1
"""


# --- bowker_symmetry ---------------------------------------------------------
# Bowker's test of matrix symmetry: B = Σ_{i<j} (n_ij − n_ji)² / (n_ij + n_ji)
# over unordered type pairs with at least one observed transition.  Each
# term is an exact integer ppm (numerator routed DECIMAL/HUGEINT — the
# (n_ij − n_ji)²·10⁶ product wraps BIGINT once a direction passes ~1e6
# transitions); operands are non-negative, so DIV == floor on both engines.
_BOWKER_TERM_SPARK = (
    "(CAST(n_up - n_dn AS DECIMAL(38,0)) * (n_up - n_dn) * 1000000)"
    " DIV (n_up + n_dn)"
)
_BOWKER_TERM_DUCK = (
    "(CAST(n_up - n_dn AS HUGEINT) * (n_up - n_dn) * 1000000)"
    " // (n_up + n_dn)"
)


def bowker_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowker's symmetry test over the event transition matrix — the k×k
    generalization of ``mcnemar_gate_disagreement``: "do users flow
    A→B as often as B→A?"  A symmetric matrix means the journey has no
    directional drift; a large B localizes funnel direction into the
    off-diagonal imbalance.  Self-transitions carry no direction and are
    excluded (standard Bowker).

    Exactness: transition counts are exact bigints from the certified
    ``event_transition_matrix`` derivation; each pair's term is an exact
    integer ppm with the numerator routed DECIMAL(38,0)/HUGEINT (the
    r8/r9 overflow class); df = the number of unordered pairs with any
    observed transition.

    Scale: ONE user-window shuffle on the raw stream (shared with the
    entropy-rate query via shared_persist), then everything runs on the
    ≤|types|² matrix — bounded by the type catalog, not the corpus.
    """
    trans = _trans_counts(spark, sf_dir)
    pairs = (
        trans.filter(F.col("from_type") != F.col("to_type"))
        .select(
            F.least("from_type", "to_type").alias("i"),
            F.greatest("from_type", "to_type").alias("j"),
            F.when(F.col("from_type") < F.col("to_type"), F.col("n"))
            .otherwise(F.lit(0))
            .alias("up"),
            F.when(F.col("from_type") > F.col("to_type"), F.col("n"))
            .otherwise(F.lit(0))
            .alias("dn"),
        )
        .groupBy("i", "j")
        .agg(
            F.sum("up").cast("bigint").alias("n_up"),
            F.sum("dn").cast("bigint").alias("n_dn"),
        )
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.col("n_up") + F.col("n_dn")).cast("bigint")
        .alias("n_transitions"),
        F.sum(F.expr(_BOWKER_TERM_SPARK)).cast("bigint").alias("b_ppm"),
    )


ORACLE["bowker_symmetry"] = f"""
    WITH trans AS ({_TRANS_SQL}),
    pairs AS (
      SELECT LEAST(from_type, to_type) AS i,
             GREATEST(from_type, to_type) AS j,
             CAST(SUM(CASE WHEN from_type < to_type THEN n ELSE 0 END)
                  AS BIGINT) AS n_up,
             CAST(SUM(CASE WHEN from_type > to_type THEN n ELSE 0 END)
                  AS BIGINT) AS n_dn
      FROM trans
      WHERE from_type <> to_type
      GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(n_up + n_dn) AS BIGINT) AS n_transitions,
           CAST(SUM({_BOWKER_TERM_DUCK}) AS BIGINT) AS b_ppm
    FROM pairs
"""


# --- markov_entropy_rate -----------------------------------------------------
# Per-cell Shannon term p·log2(1/p) with p = n/row_total, ONE shared float
# text rounded at 6; per-row entropies are exact DECIMAL sums of those
# terms; the rate divides the exact count-weighted sum once.
_ENT_TERM = (
    "ROUND(CAST(n AS DOUBLE) / CAST(row_total AS DOUBLE)"
    " * LOG2(CAST(row_total AS DOUBLE) / CAST(n AS DOUBLE)), 6)"
)
_ENT_RATE = "ROUND(CAST(wsum AS DOUBLE) / CAST(n_tot AS DOUBLE), 6)"


def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional entropy of the next event type given the current one —
    the predictability audit of ``event_transition_matrix``: H(row) per
    current type in bits, and the empirical entropy rate (transition-
    count-weighted mean of the row entropies).  A rate near 0 means the
    journey is deterministic (a bot signature); near log2(k) means types
    are shuffled noise.

    Exactness: counts and row totals are exact bigints; each cell's
    p·log2(1/p) is ONE shared float text rounded at 6; row entropies are
    exact DECIMAL(18,6) sums; the weighting n_row·h multiplies bounded
    decimals (≤ 10⁶-scaled bits — never near the 38-digit cap) and the
    rate divides once under a shared text.  Self-loops keep their mass
    (log2(1) = 0 exactly in both engines when n = row_total).

    Scale: the one user-window shuffle is shared with ``bowker_symmetry``
    via shared_persist; the entropy algebra runs on the ≤|types|² matrix
    and the |types|-row summary — catalog-bounded.
    """
    trans = _trans_counts(spark, sf_dir)
    wrow = Window.partitionBy("from_type")
    cells = trans.select(
        "from_type",
        "n",
        F.sum("n").over(wrow).cast("bigint").alias("row_total"),
    )
    rows_ = cells.groupBy("from_type").agg(
        F.max("row_total").cast("bigint").alias("n_row"),
        F.sum(F.expr(_ENT_TERM).cast("decimal(18,6)")).alias("h"),
    )
    wall = Window.partitionBy()
    return (
        rows_.select(
            "from_type",
            "n_row",
            F.col("h").cast("decimal(18,6)").alias("h6"),
            F.sum(
                F.col("n_row").cast("decimal(19,0)")
                * F.col("h").cast("decimal(18,6)")
            )
            .over(wall)
            .alias("wsum"),
            F.sum("n_row").over(wall).cast("bigint").alias("n_tot"),
        )
        .select(
            "from_type",
            "n_row",
            F.col("h6").cast("double").alias("h_bits"),
            F.expr(_ENT_RATE).alias("entropy_rate_bits"),
        )
        .orderBy("from_type")
    )


ORACLE["markov_entropy_rate"] = f"""
    WITH trans AS ({_TRANS_SQL}),
    cells AS (
      SELECT from_type, n,
             CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
               AS row_total
      FROM trans
    ),
    rows_ AS (
      SELECT from_type,
             CAST(MAX(row_total) AS BIGINT) AS n_row,
             SUM(CAST({_ENT_TERM} AS DECIMAL(18,6))) AS h
      FROM cells GROUP BY from_type
    ),
    tot AS (
      SELECT from_type, n_row, h,
             SUM(CAST(n_row AS DECIMAL(19,0)) * CAST(h AS DECIMAL(18,6)))
               OVER () AS wsum,
             CAST(SUM(n_row) OVER () AS BIGINT) AS n_tot
      FROM rows_
    )
    SELECT from_type, n_row,
           CAST(CAST(h AS DECIMAL(18,6)) AS DOUBLE) AS h_bits,
           {_ENT_RATE} AS entropy_rate_bits
    FROM tot
    ORDER BY from_type
"""


# --- mann_kendall_trend ------------------------------------------------------
# S = Σ_{i<j} sign(x_j − x_i) over the day-ordered series;
# Var(S)·18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) (tie groups t), kept as the
# exact integer var18; z applies the standard ±1 continuity correction.
_MK_Z = (
    "CASE WHEN var18 <= 0 THEN NULL"
    " WHEN s_stat > 0 THEN ROUND((CAST(s_stat AS DOUBLE) - 1.0)"
    " / SQRT(CAST(var18 AS DOUBLE) / 18.0), 6)"
    " WHEN s_stat < 0 THEN ROUND((CAST(s_stat AS DOUBLE) + 1.0)"
    " / SQRT(CAST(var18 AS DOUBLE) / 18.0), 6)"
    " ELSE 0.0 END"
)


def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on daily order revenue — the
    nonparametric "is revenue drifting?" monitor that pairs with
    ``theil_sen_slope`` (MK decides IF there is a trend, Theil-Sen says
    how steep) and needs no distributional assumptions, unlike
    ``regression_line``.

    Exactness: daily totals are exact integer cents on epoch days;
    concordant/discordant/tied pair counts are exact bigints from the
    ordered day-pair grid; var18 keeps the ×18-scaled variance integer
    (n ≤ 36 500 days for a century ⇒ n³ < 5·10¹³, well inside BIGINT);
    z is one shared float text with the ±1 continuity correction.

    Scale: the series aggregates to ONE row per calendar day before the
    pair grid, so the self-join is days² — bounded by the calendar span,
    not the corpus (2 400 days here ⇒ 2.9M pairs; a century ⇒ 6.7·10⁸,
    still executor-trivial; past that the O(n log n) prefix-rank
    inversion count replaces the grid — same outputs).
    """
    daily = _daily_rev(spark, sf_dir)
    a = daily.select(F.col("d").alias("da"), F.col("total").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("total").alias("xb"))
    pair_stats = (
        a.join(F.broadcast(b), F.col("da") < F.col("db"))
        .agg(
            # COALESCE: a single-day series has an EMPTY pair grid — zero
            # pairs, not NULL pairs (SUM over no rows is NULL in both
            # engines).
            F.coalesce(
                F.sum(F.when(F.col("xb") > F.col("xa"), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_concordant"),
            F.coalesce(
                F.sum(F.when(F.col("xb") < F.col("xa"), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_discordant"),
            F.coalesce(
                F.sum(F.when(F.col("xb") == F.col("xa"), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_tied_pairs"),
        )
    )
    base = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    ties = (
        daily.groupBy("total")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    return (
        base.crossJoin(F.broadcast(pair_stats))
        .crossJoin(F.broadcast(ties))
        .selectExpr(
            "n_days",
            "n_concordant",
            "n_discordant",
            "n_tied_pairs",
            "CAST(n_concordant - n_discordant AS BIGINT) AS s_stat",
            "CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term"
            " AS BIGINT) AS var18",
        )
        .selectExpr(
            "n_days",
            "n_concordant",
            "n_discordant",
            "n_tied_pairs",
            "s_stat",
            "var18",
            f"{_MK_Z} AS z",
        )
    )


ORACLE["mann_kendall_trend"] = f"""
    WITH daily AS ({_DAILY_SQL}),
    pair_stats AS (
      SELECT
        CAST(COALESCE(SUM(CASE WHEN b.total > a.total THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS n_concordant,
        CAST(COALESCE(SUM(CASE WHEN b.total < a.total THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS n_discordant,
        CAST(COALESCE(SUM(CASE WHEN b.total = a.total THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS n_tied_pairs
      FROM daily a JOIN daily b ON a.d < b.d
    ),
    base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
    ties AS (
      SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT COUNT(*) AS t FROM daily GROUP BY total)
    ),
    s AS (
      SELECT n_days, n_concordant, n_discordant, n_tied_pairs,
             CAST(n_concordant - n_discordant AS BIGINT) AS s_stat,
             CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
                  AS BIGINT) AS var18
      FROM base, pair_stats, ties
    )
    SELECT n_days, n_concordant, n_discordant, n_tied_pairs, s_stat, var18,
           {_MK_Z} AS z
    FROM s
"""


# --- runs_test_updown --------------------------------------------------------
# Wald-Wolfowitz runs test on the up/down sign sequence of daily revenue
# deltas (zero deltas carry no direction and are excluded, the standard
# treatment).  E[R] and Var[R] are the two-category moments; the guard
# 2·n_up·n_dn ≤ n keeps the degenerate variance (= 0) out of the division.
_RT_E = (
    "CASE WHEN n_up = 0 OR n_dn = 0 THEN NULL"
    " ELSE ROUND(2.0 * CAST(n_up AS DOUBLE) * n_dn"
    " / (CAST(n_up AS DOUBLE) + n_dn) + 1.0, 6) END"
)
_RT_Z = (
    "CASE WHEN n_up = 0 OR n_dn = 0"
    " OR 2 * n_up * n_dn <= n_up + n_dn THEN NULL"
    " ELSE ROUND((CAST(n_runs AS DOUBLE)"
    " - (2.0 * CAST(n_up AS DOUBLE) * n_dn"
    "    / (CAST(n_up AS DOUBLE) + n_dn) + 1.0))"
    " / SQRT(2.0 * CAST(n_up AS DOUBLE) * n_dn"
    "        * (2.0 * CAST(n_up AS DOUBLE) * n_dn - n_up - n_dn)"
    "        / ((CAST(n_up AS DOUBLE) + n_dn)"
    "           * (CAST(n_up AS DOUBLE) + n_dn)"
    "           * (CAST(n_up AS DOUBLE) + n_dn - 1.0))), 6) END"
)


def runs_test_updown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of daily revenue movement —
    the pre-flight check for every sequential monitor in the registry
    (``cusum_changepoint`` / ``autocorr_lag_grid`` assume the null is an
    exchangeable series; too FEW runs means momentum/trend, too MANY
    means oscillation/overcorrection).  Signs come from day-over-day
    deltas on the calendar grid; zero deltas are excluded (no direction).

    Exactness: the sign sequence derives from exact cent deltas under
    the total day order; run boundaries are exact lag comparisons; n_up /
    n_dn / n_runs are exact bigints; E[R] and z are each ONE shared
    float text with integer-compared degenerate guards.

    Scale: both lag windows run over the one-row-per-day relation
    (calendar-bounded, shared with ``mann_kendall_trend`` via
    shared_persist) under a single unpartitioned sort — ≤ 36 500 rows
    for a century, a driver-trivial window after the map-side-combined
    daily aggregate.
    """
    daily = _daily_rev(spark, sf_dir)
    wd = Window.orderBy("d")
    signs = (
        daily.select(
            "d",
            (F.col("total") - F.lag("total").over(wd)).alias("delta"),
        )
        .filter(F.col("delta").isNotNull() & (F.col("delta") != 0))
        .select(
            "d",
            F.when(F.col("delta") > 0, F.lit(1)).otherwise(F.lit(-1))
            .alias("sgn"),
        )
    )
    ws = Window.orderBy("d")
    marked = signs.select(
        "sgn",
        F.when(
            F.lag("sgn").over(ws).isNull()
            | (F.lag("sgn").over(ws) == F.col("sgn")),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("boundary"),
    )
    agg = marked.agg(
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_up"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dn"),
        F.expr(
            "CASE WHEN COUNT(*) = 0 THEN 0"
            " ELSE 1 + SUM(boundary) END"
        )
        .cast("bigint")
        .alias("n_runs"),
    )
    return agg.selectExpr(
        "CAST(n_up + n_dn AS BIGINT) AS n_signs",
        "n_up",
        "n_dn",
        "n_runs",
        f"{_RT_E} AS e_runs",
        f"{_RT_Z} AS z",
    )


ORACLE["runs_test_updown"] = f"""
    WITH daily AS ({_DAILY_SQL}),
    signs AS (
      SELECT d, CASE WHEN delta > 0 THEN 1 ELSE -1 END AS sgn
      FROM (
        SELECT d, total - LAG(total) OVER (ORDER BY d) AS delta FROM daily
      )
      WHERE delta IS NOT NULL AND delta <> 0
    ),
    marked AS (
      SELECT sgn,
             CASE WHEN LAG(sgn) OVER (ORDER BY d) IS NULL
                    OR LAG(sgn) OVER (ORDER BY d) = sgn THEN 0
                  ELSE 1 END AS boundary
      FROM signs
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_up,
             CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dn,
             CAST(CASE WHEN COUNT(*) = 0 THEN 0
                       ELSE 1 + SUM(boundary) END AS BIGINT) AS n_runs
      FROM marked
    )
    SELECT CAST(n_up + n_dn AS BIGINT) AS n_signs, n_up, n_dn, n_runs,
           {_RT_E} AS e_runs,
           {_RT_Z} AS z
    FROM agg
"""


# --- cramers_v_priority_status -----------------------------------------------
# Same cross-multiplied Pearson cell text as chisq_independence (imported,
# so the certified op order is shared), then V = sqrt(χ² / (N · min(r,c)−1)).
_CRAMER_V = (
    "CASE WHEN n_tot = 0 OR mindim <= 0 THEN NULL"
    " ELSE ROUND(SQRT(CAST(chi2 AS DOUBLE)"
    " / (CAST(n_tot AS DOUBLE) * mindim)), 6) END"
)


def cramers_v_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for order priority × order status — the EFFECT SIZE the
    ``chisq_independence`` p-value hides: at 100 TB every chi-square is
    "significant"; V ∈ [0,1] is scale-free and says whether the
    association is operationally real (fulfillment status should NOT
    depend on priority — a nonzero V is an SLA violation signal).

    Exactness: observed counts and marginals are exact bigints over the
    FULL priority×status grid (zero cells included); each cell reuses
    ``pipeline14._CHI_CONTRIB`` — the already-certified cross-multiplied
    shared float text with its DECIMAL(38,0) numerator; χ² is the exact
    DECIMAL sum of 6dp cell terms; V is one shared SQRT text with
    degenerate guards (single-row or single-column grid ⇒ NULL).

    Scale: one map-side-combined (priority, status) count is the only
    full-data shuffle; marginals, the broadcast cross-join grid, and the
    window total all run on ≤ |priorities|·|statuses| rows.
    """
    from hadrodb_spark.operators.pipeline14 import _CHI_CONTRIB

    cells = shared.shared_persist(
        ("p16_ps_cells", spark.sparkContext.applicationId, sf_dir),
        lambda: load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).cast("bigint").alias("obs")),
    )
    rmarg = cells.groupBy("o_orderpriority").agg(
        F.sum("obs").cast("bigint").alias("r_tot")
    )
    cmarg = cells.groupBy("o_orderstatus").agg(
        F.sum("obs").cast("bigint").alias("c_tot")
    )
    grid = (
        rmarg.crossJoin(F.broadcast(cmarg))
        .join(cells, ["o_orderpriority", "o_orderstatus"], "left")
        .select(
            "r_tot",
            "c_tot",
            F.coalesce(F.col("obs"), F.lit(0)).cast("bigint").alias("obs"),
        )
    )
    wall = Window.partitionBy()
    terms = grid.select(
        "r_tot",
        "c_tot",
        "obs",
        F.sum("obs").over(wall).cast("bigint").alias("n_tot"),
    ).select(
        "n_tot",
        F.expr(_CHI_CONTRIB).cast("decimal(18,6)").alias("contrib"),
    )
    agg = terms.groupBy("n_tot").agg(F.sum("contrib").alias("chi2sum"))
    dims = (
        rmarg.agg(F.count(F.lit(1)).cast("bigint").alias("n_priorities"))
        .crossJoin(
            F.broadcast(
                cmarg.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_statuses")
                )
            )
        )
    )
    return (
        agg.crossJoin(F.broadcast(dims))
        .selectExpr(
            "CAST(n_tot AS BIGINT) AS n_total",
            "n_priorities",
            "n_statuses",
            "CAST(chi2sum AS DOUBLE) AS chi2",
            "CAST(LEAST(n_priorities - 1, n_statuses - 1) AS BIGINT)"
            " AS mindim",
            "n_tot",
        )
        .selectExpr(
            "n_total",
            "n_priorities",
            "n_statuses",
            "chi2",
            f"{_CRAMER_V} AS cramers_v",
        )
    )


def _cramer_oracle() -> str:
    from hadrodb_spark.operators.pipeline14 import _CHI_CONTRIB

    return f"""
    WITH cells AS (
      SELECT o_orderpriority, o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM orders GROUP BY 1, 2
    ),
    rmarg AS (
      SELECT o_orderpriority, CAST(SUM(obs) AS BIGINT) AS r_tot
      FROM cells GROUP BY 1
    ),
    cmarg AS (
      SELECT o_orderstatus, CAST(SUM(obs) AS BIGINT) AS c_tot
      FROM cells GROUP BY 1
    ),
    grid AS (
      SELECT r.r_tot, c.c_tot,
             CAST(COALESCE(x.obs, 0) AS BIGINT) AS obs
      FROM rmarg r CROSS JOIN cmarg c
      LEFT JOIN cells x
        ON x.o_orderpriority = r.o_orderpriority
       AND x.o_orderstatus = c.o_orderstatus
    ),
    terms AS (
      SELECT n_tot, CAST({_CHI_CONTRIB} AS DECIMAL(18,6)) AS contrib
      FROM (
        SELECT r_tot, c_tot, obs,
               CAST(SUM(obs) OVER () AS BIGINT) AS n_tot
        FROM grid
      )
    ),
    agg AS (SELECT n_tot, SUM(contrib) AS chi2sum FROM terms GROUP BY n_tot),
    dims AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rmarg) AS n_priorities,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM cmarg) AS n_statuses
    ),
    fin AS (
      SELECT CAST(n_tot AS BIGINT) AS n_total, n_priorities, n_statuses,
             CAST(chi2sum AS DOUBLE) AS chi2,
             CAST(LEAST(n_priorities - 1, n_statuses - 1) AS BIGINT)
               AS mindim,
             n_tot
      FROM agg, dims
    )
    SELECT n_total, n_priorities, n_statuses, chi2,
           {_CRAMER_V} AS cramers_v
    FROM fin
    """


# --- welch_t_value -----------------------------------------------------------
# Unequal-variance two-sample t on exact DECIMAL/HUGEINT moments:
# ssqᵢ = nᵢ·Σx² − (Σx)² (exact), uᵢ = varᵢ/nᵢ = ssqᵢ/(nᵢ²(nᵢ−1)) as ONE
# rounded float text each; t and the Welch–Satterthwaite df then combine
# the ROUNDED u's, so both engines see bit-identical inputs.
_WELCH_U = "ROUND(CAST(ssq{g} AS DOUBLE) / (CAST(n{g} AS DOUBLE) * n{g} * (n{g} - 1.0)), 6)"
_WELCH_MD = "ROUND(CAST(sx1 AS DOUBLE) / n1 - CAST(sx2 AS DOUBLE) / n2, 6)"
_WELCH_T = (
    "CASE WHEN u1 + u2 <= 0 THEN NULL"
    " ELSE ROUND((CAST(sx1 AS DOUBLE) / n1 - CAST(sx2 AS DOUBLE) / n2)"
    " / SQRT(u1 + u2), 6) END"
)
_WELCH_DF = (
    "CASE WHEN u1 + u2 <= 0 THEN NULL"
    " ELSE ROUND((u1 + u2) * (u1 + u2)"
    " / (u1 * u1 / (n1 - 1.0) + u2 * u2 / (n2 - 1.0)), 6) END"
)


def welch_t_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t between purchase and click event values —
    the parametric completion of the two-sample family:
    ``mannwhitney_shift`` is distribution-free, ``cohens_d_by_type``
    standardizes the gap, ``permutation_test_diff`` simulates the null;
    Welch gives the analytic t WITHOUT the equal-variance assumption the
    pooled test (and Cohen's pooled SD) silently makes — the right
    default when purchase values are heavy-tailed and clicks are not.

    Exactness: cents, counts, Σx and Σx² accumulate exactly
    (DECIMAL(38,0) Spark-side, HUGEINT DuckDB-side for the n·Σx² − (Σx)²
    products — the r8/r9 overflow class); u₁/u₂ (= varᵢ/nᵢ) are each ONE
    shared float text rounded at 6, and t/df combine only those rounded
    columns, so op order is pinned end-to-end.  Either group with n < 2
    ⇒ NULL t/df; zero combined variance guarded.

    Scale: ONE map-side-combined conditional aggregate over the filtered
    stream (two groups ⇒ a 1-row moment relation); everything after is
    1-row arithmetic.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("purchase", "click")
        )
        .select(
            F.col("event_type"),
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    m = ev.agg(
        # COALESCE: a fully-NULL/absent pair of groups leaves an EMPTY
        # filtered relation, where SUM returns NULL but the group sizes
        # are semantically 0 (both engines agree on NULL, so only the
        # semantics — not the parity — needed the fix).
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n1"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("cents"))
            .otherwise(0)
            .cast("decimal(38,0)")
        ).alias("sx1"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("cents").cast("decimal(38,0)") * F.col("cents"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("sxx1"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n2"),
        F.sum(
            F.when(F.col("event_type") == "click", F.col("cents"))
            .otherwise(0)
            .cast("decimal(38,0)")
        ).alias("sx2"),
        F.sum(
            F.when(
                F.col("event_type") == "click",
                F.col("cents").cast("decimal(38,0)") * F.col("cents"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("sxx2"),
    )
    withssq = m.selectExpr(
        "n1",
        "sx1",
        "n2",
        "sx2",
        "CAST(n1 AS DECIMAL(38,0)) * sxx1 - sx1 * sx1 AS ssq1",
        "CAST(n2 AS DECIMAL(38,0)) * sxx2 - sx2 * sx2 AS ssq2",
    )
    withu = withssq.selectExpr(
        "n1",
        "sx1",
        "n2",
        "sx2",
        f"CASE WHEN n1 < 2 THEN NULL ELSE {_WELCH_U.format(g=1)} END AS u1",
        f"CASE WHEN n2 < 2 THEN NULL ELSE {_WELCH_U.format(g=2)} END AS u2",
    )
    return withu.selectExpr(
        "n1 AS n_purchase",
        "n2 AS n_click",
        f"CASE WHEN n1 = 0 OR n2 = 0 THEN NULL"
        f" ELSE {_WELCH_MD} END AS mean_diff_cents",
        f"{_WELCH_T} AS t_welch",
        f"{_WELCH_DF} AS df_welch",
    )


ORACLE["welch_t_value"] = f"""
    WITH ev AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
    ),
    m AS (
      SELECT
        CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                          END), 0) AS BIGINT) AS n1,
        SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(cents AS HUGEINT) ELSE 0 END) AS sx1,
        SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(cents AS HUGEINT) * cents ELSE 0 END) AS sxx1,
        CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                          END), 0) AS BIGINT) AS n2,
        SUM(CASE WHEN event_type = 'click'
                 THEN CAST(cents AS HUGEINT) ELSE 0 END) AS sx2,
        SUM(CASE WHEN event_type = 'click'
                 THEN CAST(cents AS HUGEINT) * cents ELSE 0 END) AS sxx2
      FROM ev
    ),
    withssq AS (
      SELECT n1, sx1, n2, sx2,
             CAST(n1 AS HUGEINT) * sxx1 - sx1 * sx1 AS ssq1,
             CAST(n2 AS HUGEINT) * sxx2 - sx2 * sx2 AS ssq2
      FROM m
    ),
    withu AS (
      SELECT n1, sx1, n2, sx2,
             CASE WHEN n1 < 2 THEN NULL
                  ELSE {_WELCH_U.format(g=1)} END AS u1,
             CASE WHEN n2 < 2 THEN NULL
                  ELSE {_WELCH_U.format(g=2)} END AS u2
      FROM withssq
    )
    SELECT n1 AS n_purchase, n2 AS n_click,
           CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                ELSE {_WELCH_MD} END AS mean_diff_cents,
           {_WELCH_T} AS t_welch,
           {_WELCH_DF} AS df_welch
    FROM withu
"""

ORACLE["cramers_v_priority_status"] = _cramer_oracle()


# --- quantile_profile_sources --------------------------------------------------
# Exact ceil-rank quantiles (k = ⌈q·n/100⌉, the conformal_coverage_audit
# rank shape) over the per-source cap-censored length distribution — the
# engine-independent quantile definition (percentile_disc index rounding
# differs between engines).
_QP_CAP = 65536  # cap-censored lengths ⇒ the count grid is ≤ |sources|×65537
_QP_STEP = 5


def quantile_profile_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full 5th–95th quantile profile of document length per source,
    plus the cross-source spread at each quantile — the QQ-style drift
    audit that localizes WHERE two crawls' length distributions diverge
    (``source_ks_shift`` gives one max-gap scalar; the profile says
    "the tails differ, the median doesn't", which decides whether a
    truncation gate or a re-weighting fixes it).

    Exactness: lengths are cap-censored integers (LEAST(n_chars, 65536),
    the source_ks_shift bound — censoring is visible and documented);
    quantiles are exact min-value-at-ceil-rank over per-source cumulative
    counts (k = ⌈q·n/100⌉ via positive-operand integer arithmetic — no
    engine percentile function, whose index rounding differs); spread is
    an exact max−min window over the bounded profile.  NULL lengths are
    excluded up front.

    Scale: ONE map-side-combined (source, length) count is the only
    full-data shuffle; the cumulative window and the ×19 quantile grid
    run on the ≤|sources|×65537 count relation — bounded BY CONSTRUCTION
    (the KS-grid argument), not by data volume.
    """
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars").isNotNull())
        .select(
            "source",
            F.expr(f"LEAST(n_chars, {_QP_CAP})").cast("bigint").alias("len"),
        )
    )
    counts = shared.shared_persist(
        ("p16_qp_counts", spark.sparkContext.applicationId, sf_dir),
        lambda: docs.groupBy("source", "len").agg(
            F.count(F.lit(1)).alias("c")
        ),
    )
    totals = counts.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_docs")
    )
    wc = (
        Window.partitionBy("source")
        .orderBy("len")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.withColumn("cum", F.sum("c").over(wc))
    qs = spark.range(1, 100 // _QP_STEP).select(
        (F.col("id") * _QP_STEP).cast("bigint").alias("q_pct")
    )
    qv = (
        cum.join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(qs))
        .filter(F.col("cum") >= F.expr("(q_pct * n_docs + 99) DIV 100"))
        .groupBy("source", "q_pct")
        .agg(F.min("len").cast("bigint").alias("q_chars"))
    )
    wq = Window.partitionBy("q_pct")
    return qv.select(
        "q_pct",
        "source",
        "q_chars",
        (F.max("q_chars").over(wq) - F.min("q_chars").over(wq))
        .cast("bigint")
        .alias("spread"),
    ).orderBy("q_pct", "source")


ORACLE["quantile_profile_sources"] = f"""
    WITH docs AS (
      SELECT source, CAST(LEAST(n_chars, {_QP_CAP}) AS BIGINT) AS len
      FROM documents WHERE n_chars IS NOT NULL
    ),
    counts AS (
      SELECT source, len, COUNT(*) AS c FROM docs GROUP BY 1, 2
    ),
    totals AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs
      FROM counts GROUP BY 1
    ),
    cum AS (
      SELECT source, len,
             SUM(c) OVER (PARTITION BY source ORDER BY len
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM counts
    ),
    qs AS (
      SELECT CAST(q_pct AS BIGINT) AS q_pct
      FROM (SELECT UNNEST(generate_series({_QP_STEP}, 95, {_QP_STEP}))
              AS q_pct)
    ),
    qv AS (
      SELECT cum.source, qs.q_pct,
             CAST(MIN(cum.len) AS BIGINT) AS q_chars
      FROM cum
      JOIN totals ON cum.source = totals.source
      CROSS JOIN qs
      WHERE cum.cum >= (qs.q_pct * totals.n_docs + 99) // 100
      GROUP BY 1, 2
    )
    SELECT q_pct, source, q_chars,
           CAST(MAX(q_chars) OVER (PARTITION BY q_pct)
                - MIN(q_chars) OVER (PARTITION BY q_pct) AS BIGINT)
             AS spread
    FROM qv
    ORDER BY q_pct, source
"""


# --- token_budget_pack ---------------------------------------------------------
_PACK_BUDGET = 5000  # tokens per source


def token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-source token-budget packing — the selection step a
    training-data pipeline runs AFTER ``mixture_weights`` decides each
    source's token budget: rank documents (longest first, the greedy
    bin-fill order; doc_id breaks ties) and keep the prefix whose
    cumulative token count fits the budget.  Reports kept/total docs and
    tokens plus the exact budget-fill ppm per source.

    Exactness: token counts are the certified ``token_count`` tokenizer
    (exact integers); the prefix is decided by a cumulative window under
    the TOTAL (n_chars DESC, doc_id) order; fill ppm is a non-negative
    integer DIV by the constant budget (tokens_kept ≤ budget ⇒ ppm ≤
    10⁶).  NULL text / NULL n_chars rows are excluded up front (engine
    NULL sort positions differ).

    Scale: ONE shuffle — the per-source window sort (the sessionize
    class); the aggregate after it is map-side-combinable.  At 100 TB
    the window runs per source partition; a skewed mega-source salts the
    sort by range-partitioning on (n_chars bucket) exactly like the
    documented LWW skew path.
    """
    from hadrodb_spark.functions import text as X

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("n_chars").isNotNull())
        .select(
            "source",
            "doc_id",
            "n_chars",
            X.token_count(F.col("text")).alias("tok"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = docs.withColumn("cum_tok", F.sum("tok").over(w))
    return (
        cum.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_total"),
            F.sum("tok").cast("bigint").alias("tokens_total"),
            F.sum(
                F.when(F.col("cum_tok") <= _PACK_BUDGET, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_docs_kept"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("cum_tok") <= _PACK_BUDGET, F.col("tok")
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tokens_kept"),
        )
        .selectExpr(
            "source",
            "n_docs_total",
            "n_docs_kept",
            "tokens_total",
            "tokens_kept",
            f"CAST((tokens_kept * 1000000) DIV {_PACK_BUDGET} AS BIGINT)"
            " AS budget_fill_ppm",
        )
        .orderBy("source")
    )


def _pack_oracle() -> str:
    from hadrodb_spark.functions import text as X

    toks = X.sql_tokens("text")
    return f"""
    WITH docs AS (
      SELECT source, doc_id, n_chars,
             CAST(len({toks}) AS BIGINT) AS tok
      FROM documents
      WHERE text IS NOT NULL AND n_chars IS NOT NULL
    ),
    cum AS (
      SELECT source, tok,
             SUM(tok) OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum_tok
      FROM docs
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_total,
           CAST(SUM(CASE WHEN cum_tok <= {_PACK_BUDGET} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_kept,
           CAST(SUM(tok) AS BIGINT) AS tokens_total,
           CAST(COALESCE(SUM(CASE WHEN cum_tok <= {_PACK_BUDGET}
                                  THEN tok ELSE 0 END), 0) AS BIGINT)
             AS tokens_kept,
           CAST((COALESCE(SUM(CASE WHEN cum_tok <= {_PACK_BUDGET}
                                   THEN tok ELSE 0 END), 0) * 1000000)
                // {_PACK_BUDGET} AS BIGINT) AS budget_fill_ppm
    FROM cum
    GROUP BY source
    ORDER BY source
"""


ORACLE["token_budget_pack"] = _pack_oracle()


# --- seasonal_strength_weekly --------------------------------------------------
# STL-style strength of seasonality/trend: F_s = max(0, 1 − Var(R)/Var(S+R)),
# F_t = max(0, 1 − Var(R)/Var(T+R)).  Variances share n, so the ratio uses
# the exact scaled sums of squares ssq(x) = n·Σx² − (Σx)² directly.
_STRENGTH = (
    "CASE WHEN ssq_{d} = 0 THEN NULL"
    " ELSE GREATEST(0.0, ROUND(1.0 - CAST(ssq_r AS DOUBLE)"
    " / CAST(ssq_{d} AS DOUBLE), 6)) END"
)


def seasonal_strength_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strength-of-seasonality / strength-of-trend summary (the STL
    F-statistics, Hyndman & Athanasopoulos FPP3 §4.3 form) over the
    certified ``seasonal_decompose_daily`` components — the ONE-ROW
    answer to "is the weekly cycle real or is the decomposition fitting
    noise?" that decides whether ``seasonal_dow_index`` corrections are
    worth applying.

    Exactness: the components are the decompose query's exact integer
    cents (this query CALLS it, and the oracle WRAPS its certified
    oracle text as a CTE — the hybrid_rrf_fusion pattern, so the
    strength can't drift from the certified decomposition); each scaled
    sum-of-squares n·Σx² − (Σx)² is exact DECIMAL/HUGEINT; each F is one
    shared float text clamped at 0.

    Scale: inherits the decompose's bounded shape (one map-side daily
    aggregate, calendar-bounded windows), then ONE 1-row moment
    aggregate over the |days| relation.
    """
    from hadrodb_spark.operators.pipeline10 import seasonal_decompose_daily

    comp = seasonal_decompose_daily(spark, sf_dir).select(
        F.col("residual_cents").alias("r"),
        (F.col("rev_cents") - F.col("trend_cents")).alias("sr"),
        (F.col("rev_cents") - F.col("seasonal_cents")).alias("tr"),
    )
    m = comp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        *[
            x
            for c in ("r", "sr", "tr")
            for x in (
                F.sum(F.col(c).cast("decimal(38,0)")).alias(f"s_{c}"),
                F.sum(
                    F.col(c).cast("decimal(38,0)") * F.col(c)
                ).alias(f"ss_{c}"),
            )
        ],
    )
    ssq = m.selectExpr(
        "n_days",
        "CAST(n_days AS DECIMAL(38,0)) * ss_r - s_r * s_r AS ssq_r",
        "CAST(n_days AS DECIMAL(38,0)) * ss_sr - s_sr * s_sr AS ssq_sr",
        "CAST(n_days AS DECIMAL(38,0)) * ss_tr - s_tr * s_tr AS ssq_tr",
    )
    return ssq.selectExpr(
        "n_days",
        f"{_STRENGTH.format(d='sr')} AS f_seasonal",
        f"{_STRENGTH.format(d='tr')} AS f_trend",
    )


def _strength_oracle() -> str:
    from hadrodb_spark.operators.pipeline10 import ORACLE as P10_ORACLE

    return f"""
    WITH decomp AS ({P10_ORACLE["seasonal_decompose_daily"]}),
    comp AS (
      SELECT residual_cents AS r,
             rev_cents - trend_cents AS sr,
             rev_cents - seasonal_cents AS tr
      FROM decomp
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(CAST(r AS HUGEINT)) AS s_r,
             SUM(CAST(r AS HUGEINT) * r) AS ss_r,
             SUM(CAST(sr AS HUGEINT)) AS s_sr,
             SUM(CAST(sr AS HUGEINT) * sr) AS ss_sr,
             SUM(CAST(tr AS HUGEINT)) AS s_tr,
             SUM(CAST(tr AS HUGEINT) * tr) AS ss_tr
      FROM comp
    ),
    ssq AS (
      SELECT n_days,
             CAST(n_days AS HUGEINT) * ss_r - s_r * s_r AS ssq_r,
             CAST(n_days AS HUGEINT) * ss_sr - s_sr * s_sr AS ssq_sr,
             CAST(n_days AS HUGEINT) * ss_tr - s_tr * s_tr AS ssq_tr
      FROM m
    )
    SELECT n_days,
           {_STRENGTH.format(d='sr')} AS f_seasonal,
           {_STRENGTH.format(d='tr')} AS f_trend
    FROM ssq
"""


ORACLE["seasonal_strength_weekly"] = _strength_oracle()


# --- hill_tail_alpha -----------------------------------------------------------
# Hill estimator over the k largest order values with the (k+1)-th as the
# threshold: α̂ = k / Σᵢ ln(xᵢ/x_ref).  Selection is a TOTAL order
# (cents DESC, o_orderkey), so the top-(k+1) set is deterministic.
_HILL_K = 100
_HILL_TERM = "ROUND(LN(CAST(cents AS DOUBLE) / x_ref), 6)"
_HILL_ALPHA = (
    "CASE WHEN ln_sum <= 0 THEN NULL"
    " ELSE ROUND(CAST(n_top AS DOUBLE) / CAST(ln_sum AS DOUBLE), 6) END"
)


def hill_tail_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimate for order values — "how heavy is the
    revenue tail?": α ≈ 1 means an 80/20-style Pareto concentration
    (``revenue_pareto_curve`` shows the curve; Hill gives the exponent),
    α large means thin tails where mean-based planning is safe.  The
    textbook k-largest-order-statistics estimator with the (k+1)-th
    value as threshold.

    Exactness: the top-(k+1) selection ranks on exact (cents DESC,
    o_orderkey) — a total order, so the set is deterministic; each
    ln(xᵢ/x_ref) is ONE shared float text rounded at 6 and DECIMAL-
    summed; α is one shared division with the all-tied (ln_sum ≤ 0)
    guard.  Zero/negative/NULL totals are excluded before ranking.

    Scale: TakeOrdered(k+1) on the scan — no shuffle, no window over raw
    rows; everything after is a (k)-row relation.
    """
    orders = (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
            .alias("cents"),
        )
        .filter(F.col("cents").isNotNull() & (F.col("cents") > 0))
    )
    top = orders.orderBy(F.desc("cents"), "o_orderkey").limit(_HILL_K + 1)
    wall = Window.partitionBy()
    ranked = top.select(
        "cents",
        F.row_number()
        .over(Window.orderBy(F.desc("cents"), "o_orderkey"))
        .alias("rk"),
        F.count(F.lit(1)).over(wall).alias("m"),
        F.min("cents").over(wall).alias("x_ref"),
    ).filter((F.col("rk") < F.col("m")) & (F.col("m") >= 2))
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_top"),
        F.min("x_ref").cast("bigint").alias("x_ref_cents"),
        F.sum(F.expr(_HILL_TERM).cast("decimal(18,6)")).alias("lnsum"),
    )
    return agg.selectExpr(
        "n_top",
        "x_ref_cents",
        "CAST(lnsum AS DOUBLE) AS ln_sum",
        f"CASE WHEN lnsum IS NULL THEN NULL ELSE {_HILL_ALPHA.replace('ln_sum', 'CAST(lnsum AS DOUBLE)')} END AS alpha",
    )


ORACLE["hill_tail_alpha"] = f"""
    WITH orders_pos AS (
      SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      WHERE o_totalprice IS NOT NULL
        AND CAST(ROUND(o_totalprice * 100) AS BIGINT) > 0
    ),
    top AS (
      SELECT o_orderkey, cents FROM orders_pos
      ORDER BY cents DESC, o_orderkey LIMIT {_HILL_K + 1}
    ),
    ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents DESC, o_orderkey) AS rk,
             COUNT(*) OVER () AS m,
             MIN(cents) OVER () AS x_ref
      FROM top
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_top,
             CAST(MIN(x_ref) AS BIGINT) AS x_ref_cents,
             SUM(CAST({_HILL_TERM} AS DECIMAL(18,6))) AS lnsum
      FROM ranked
      WHERE rk < m AND m >= 2
    )
    SELECT n_top, x_ref_cents,
           CAST(lnsum AS DOUBLE) AS ln_sum,
           CASE WHEN lnsum IS NULL THEN NULL
                ELSE {_HILL_ALPHA.replace('ln_sum', 'CAST(lnsum AS DOUBLE)')}
           END AS alpha
    FROM agg
"""


# --- hurst_rescaled_range --------------------------------------------------------
# Classic R/S analysis on the observed daily-revenue sequence: for block
# size k, split the index-ordered series into complete k-blocks; within a
# block, R·k = max−min of the k-scaled demeaned prefix (k·prefix_j −
# j·sum), S·k = sqrt(k·Σx² − (Σx)²), so R/S = rk/sqrt(den) with EXACT
# integer numerators.  H is the log-log slope of mean ln(R/S) vs ln(k).
_HURST_KS = (16, 32, 64, 128)
_RS_TEXT = "ROUND(CAST(rk AS DOUBLE) / SQRT(CAST(den AS DOUBLE)), 6)"
_LNRS_TEXT = f"ROUND(LN({_RS_TEXT}), 6)"
_MEAN_LNRS = "ROUND(CAST(ln_sum AS DOUBLE) / CAST(n_blocks AS DOUBLE), 6)"
# The slope combines the EXACT decimal sums under ONE float text: computing
# m·sxy − sx·sy as decimals diverged the engines (Spark's allowPrecisionLoss
# rounds the scale-12 cross products back to 6 dp where DuckDB keeps
# DECIMAL(38,12) — review-caught with a live 1-in-25-fixtures repro), so
# every operand casts to DOUBLE first and the op order is pinned.
_HURST_SLOPE = (
    "CASE WHEN CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0 THEN NULL"
    " ELSE ROUND((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) END"
)


def hurst_rescaled_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily order revenue via rescaled-range (R/S)
    analysis — the long-memory audit that separates trending (H > 0.5),
    mean-reverting (H < 0.5), and random-walk (H ≈ 0.5) revenue, i.e.
    whether ``autocorr_lag_grid``'s short-lag picture persists across
    scales.  Blocks are index-based on the observed sequence (standard
    R/S; calendar gaps don't stretch blocks).

    Exactness: per block, both R/S ingredients are exact DECIMAL
    integers (k-scaled demeaned prefix range; k·Σx² − (Σx)², the r8/r9
    overflow routing — cents² sums pass 1e18 well before 100 TB); R/S,
    ln(R/S), the per-k mean, and the log-log slope are each ONE shared
    float text; degenerate blocks (constant series ⇒ den = 0 or rk = 0)
    are excluded with the exclusion visible in n_blocks.

    Scale: the corpus reduces to one row per day; the ×|ks| explode,
    block windows, and the 4-point regression all run on the
    calendar-bounded relation (the mann_kendall argument).
    """
    daily = _daily_rev(spark, sf_dir)
    wi = Window.orderBy("d")
    idx = daily.select(
        "total", F.row_number().over(wi).alias("i")
    )
    ks = spark.range(0, len(_HURST_KS)).select(
        F.element_at(
            F.array(*[F.lit(k) for k in _HURST_KS]), F.col("id").cast("int") + 1
        )
        .cast("bigint")
        .alias("k")
    )
    rows = idx.crossJoin(F.broadcast(ks)).select(
        "k",
        "total",
        "i",
        ((F.col("i") - 1) / F.col("k")).cast("bigint").alias("blk"),
    )
    wb = Window.partitionBy("k", "blk").orderBy("i")
    wtot = Window.partitionBy("k", "blk")
    staged = rows.select(
        "k",
        "blk",
        "total",
        F.sum("total").over(wb.rowsBetween(Window.unboundedPreceding, 0))
        .alias("prefix"),
        F.row_number().over(wb).alias("j"),
        F.sum("total").over(wtot).alias("blk_sum"),
        F.count(F.lit(1)).over(wtot).alias("blk_n"),
    ).filter(F.col("blk_n") == F.col("k"))
    kd = staged.select(
        "k",
        "blk",
        "total",
        (
            F.col("k").cast("decimal(38,0)") * F.col("prefix")
            - F.col("j").cast("decimal(38,0)") * F.col("blk_sum")
        ).alias("kd"),
    )
    blocks = kd.groupBy("k", "blk").agg(
        (F.max("kd") - F.min("kd")).alias("rk"),
        (
            F.first(F.col("k")).cast("decimal(38,0)")
            * F.sum(F.col("total").cast("decimal(38,0)") * F.col("total"))
            - F.sum(F.col("total").cast("decimal(38,0)"))
            * F.sum(F.col("total").cast("decimal(38,0)"))
        ).alias("den"),
    ).filter((F.col("den") > 0) & (F.col("rk") > 0))
    per_k = blocks.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum(F.expr(_LNRS_TEXT).cast("decimal(18,6)")).alias("ln_sum"),
    )
    pts = per_k.select(
        "k",
        "n_blocks",
        F.expr(_MEAN_LNRS).cast("decimal(18,6)").alias("y"),
        F.expr("CAST(ROUND(LN(CAST(k AS DOUBLE)), 6) AS DECIMAL(18,6))")
        .alias("x"),
    )
    wall = Window.partitionBy()
    reg = pts.select(
        "k",
        "n_blocks",
        F.col("y").cast("double").alias("ln_rs_mean"),
        F.count(F.lit(1)).over(wall).cast("decimal(19,0)").alias("m"),
        F.sum("x").over(wall).alias("sx"),
        F.sum("y").over(wall).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(wall).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(wall).alias("sxx"),
    )
    return reg.selectExpr(
        "k",
        "n_blocks",
        "ln_rs_mean",
        f"{_HURST_SLOPE} AS hurst_h",
    ).orderBy("k")


ORACLE["hurst_rescaled_range"] = f"""
    WITH daily AS ({_DAILY_SQL}),
    idx AS (
      SELECT total, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
    ),
    ks AS (
      SELECT CAST(k AS BIGINT) AS k
      FROM (SELECT UNNEST([{", ".join(str(k) for k in _HURST_KS)}]) AS k)
    ),
    rows_ AS (
      SELECT k, total, i, (i - 1) // k AS blk FROM idx CROSS JOIN ks
    ),
    staged AS (
      SELECT k, blk, total,
             SUM(total) OVER (PARTITION BY k, blk ORDER BY i
                              ROWS UNBOUNDED PRECEDING) AS prefix,
             ROW_NUMBER() OVER (PARTITION BY k, blk ORDER BY i) AS j,
             SUM(total) OVER (PARTITION BY k, blk) AS blk_sum,
             COUNT(*) OVER (PARTITION BY k, blk) AS blk_n
      FROM rows_
    ),
    kd AS (
      SELECT k, blk, total,
             CAST(k AS HUGEINT) * prefix
               - CAST(j AS HUGEINT) * blk_sum AS kd
      FROM staged WHERE blk_n = k
    ),
    blocks AS (
      SELECT k, blk,
             MAX(kd) - MIN(kd) AS rk,
             CAST(MIN(k) AS HUGEINT)
               * SUM(CAST(total AS HUGEINT) * total)
               - SUM(CAST(total AS HUGEINT)) * SUM(CAST(total AS HUGEINT))
               AS den
      FROM kd GROUP BY k, blk
    ),
    per_k AS (
      SELECT k,
             CAST(COUNT(*) AS BIGINT) AS n_blocks,
             SUM(CAST({_LNRS_TEXT} AS DECIMAL(18,6))) AS ln_sum
      FROM blocks WHERE den > 0 AND rk > 0
      GROUP BY k
    ),
    pts AS (
      SELECT k, n_blocks,
             CAST({_MEAN_LNRS} AS DECIMAL(18,6)) AS y,
             CAST(ROUND(LN(CAST(k AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x
      FROM per_k
    ),
    reg AS (
      SELECT k, n_blocks,
             CAST(y AS DOUBLE) AS ln_rs_mean,
             CAST(COUNT(*) OVER () AS DECIMAL(19,0)) AS m,
             SUM(x) OVER () AS sx,
             SUM(y) OVER () AS sy,
             SUM(x * y) OVER () AS sxy,
             SUM(x * x) OVER () AS sxx
      FROM pts
    )
    SELECT k, n_blocks, ln_rs_mean,
           {_HURST_SLOPE} AS hurst_h
    FROM reg
    ORDER BY k
"""


# --- changepoint_binseg ----------------------------------------------------------
# Two-level binary segmentation with the cusum_changepoint statistic:
# within a segment of m index-ordered days, S'(i) = m·prefix_i − i·total
# (exact DECIMAL); the split maximizes |S'| with the earliest-day
# tiebreak; the two children are then split once more by the same rule.
# Unrolled one level (the bpe_train_merges / graph_kcore pattern) —
# deeper trees repeat the same child step.
_BS_SEG_CENTS = "CAST(abs_s DIV m AS BIGINT)"


def changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical changepoint detection on daily order revenue — binary
    segmentation, the standard multi-changepoint extension of
    ``cusum_changepoint``: CUSUM finds ONE break; binseg recursively
    splits each side, localizing up to three breaks here (root + one per
    child), which is what a release-impact dashboard actually wants
    ("did the metric move, and did it move again after the fix?").

    Exactness: daily totals are exact cents; every split statistic
    m·prefix − i·total is an exact DECIMAL(38,0)/HUGEINT product
    (the cusum overflow routing); split selection is ORDER BY
    (|S'| DESC, day) LIMIT 1 — a total order; the emitted magnitude is
    the sign-safe trunc(|S'|max/m), bounded by segment total cents.
    Segments too short to split (m < 2) emit NULL split columns; an
    unsplittable root emits just the root row.

    Scale: the corpus reduces to one row per day (shared with
    mann_kendall/runs via shared_persist); both levels run windows over
    that calendar-bounded relation with the 1-row split broadcast —
    the recursion depth is the only repeated cost, exactly the
    localCheckpoint-per-round shape components.py documents for deeper
    trees.
    """
    daily = _daily_rev(spark, sf_dir)
    wi = Window.orderBy("d")
    wall = Window.partitionBy()
    base = daily.select(
        "d",
        "total",
        F.row_number().over(wi).alias("i"),
        F.sum("total")
        .over(wi.rowsBetween(Window.unboundedPreceding, 0))
        .alias("prefix"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("total").over(wall).alias("tot"),
    )
    stats = base.filter(F.col("i") < F.col("n")).select(
        "d",
        "i",
        "n",
        F.abs(
            F.col("n").cast("decimal(38,0)") * F.col("prefix")
            - F.col("i").cast("decimal(38,0)") * F.col("tot")
        ).alias("abs_s"),
    )
    root_split = stats.orderBy(F.desc("abs_s"), "d").limit(1).select(
        F.col("i").alias("si"),
        F.col("d").alias("root_split_d"),
        F.col("abs_s").alias("root_abs"),
    )
    # left join: an unsplittable root (n < 2 ⇒ empty root_split) still
    # emits the root row, with NULL split columns.
    root_row = (
        base.agg(
            F.count(F.lit(1)).cast("bigint").alias("m"),
            F.min("d").cast("bigint").alias("start_day"),
            F.max("d").cast("bigint").alias("end_day"),
        )
        .join(F.broadcast(root_split), F.lit(True), "left")
        .selectExpr(
            "'root' AS segment",
            "m AS n_days",
            "start_day",
            "end_day",
            "CAST(root_split_d AS BIGINT) AS split_day",
            "CAST(root_abs DIV m AS BIGINT) AS s_abs_cents",
        )
    )
    seg = base.crossJoin(F.broadcast(root_split.select("si"))).select(
        F.when(F.col("i") <= F.col("si"), F.lit("left"))
        .otherwise(F.lit("right"))
        .alias("segment"),
        "d",
        "total",
    )
    ws = Window.partitionBy("segment").orderBy("d")
    wst = Window.partitionBy("segment")
    base2 = seg.select(
        "segment",
        "d",
        F.row_number().over(ws).alias("i2"),
        F.sum("total")
        .over(ws.rowsBetween(Window.unboundedPreceding, 0))
        .alias("prefix2"),
        F.count(F.lit(1)).over(wst).alias("m"),
        F.sum("total").over(wst).alias("tot2"),
        F.min("d").over(wst).alias("start_day"),
        F.max("d").over(wst).alias("end_day"),
    )
    stats2 = base2.filter(F.col("i2") < F.col("m")).select(
        "segment",
        "d",
        "m",
        "start_day",
        "end_day",
        F.abs(
            F.col("m").cast("decimal(38,0)") * F.col("prefix2")
            - F.col("i2").cast("decimal(38,0)") * F.col("tot2")
        ).alias("abs_s"),
        F.row_number()
        .over(
            Window.partitionBy("segment").orderBy(
                F.desc(
                    F.abs(
                        F.col("m").cast("decimal(38,0)") * F.col("prefix2")
                        - F.col("i2").cast("decimal(38,0)") * F.col("tot2")
                    )
                ),
                "d",
            )
        )
        .alias("pick"),
    )
    child_splits = stats2.filter(F.col("pick") == 1).select(
        "segment",
        F.col("d").alias("split_day"),
        F.col("abs_s"),
        F.col("m").alias("m_split"),
    )
    child_rows = (
        base2.groupBy("segment")
        .agg(
            F.max("m").cast("bigint").alias("n_days"),
            F.min("start_day").cast("bigint").alias("start_day"),
            F.max("end_day").cast("bigint").alias("end_day"),
        )
        .join(F.broadcast(child_splits), "segment", "left")
        .selectExpr(
            "segment",
            "n_days",
            "start_day",
            "end_day",
            "CAST(split_day AS BIGINT) AS split_day",
            "CAST(abs_s DIV m_split AS BIGINT) AS s_abs_cents",
        )
    )
    return root_row.unionByName(child_rows).orderBy("segment")


ORACLE["changepoint_binseg"] = f"""
    WITH daily AS ({_DAILY_SQL}),
    base AS (
      SELECT d, total,
             ROW_NUMBER() OVER (ORDER BY d) AS i,
             SUM(total) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
               AS prefix,
             COUNT(*) OVER () AS n,
             SUM(total) OVER () AS tot
      FROM daily
    ),
    stats AS (
      SELECT d, i, n,
             ABS(CAST(n AS HUGEINT) * prefix
                 - CAST(i AS HUGEINT) * tot) AS abs_s
      FROM base WHERE i < n
    ),
    root_split AS (
      SELECT i AS si, d AS root_split_d, abs_s AS root_abs
      FROM stats ORDER BY abs_s DESC, d LIMIT 1
    ),
    root_row AS (
      SELECT 'root' AS segment,
             CAST(a.m AS BIGINT) AS n_days,
             CAST(a.start_day AS BIGINT) AS start_day,
             CAST(a.end_day AS BIGINT) AS end_day,
             CAST(r.root_split_d AS BIGINT) AS split_day,
             CAST(r.root_abs // a.m AS BIGINT) AS s_abs_cents
      FROM (SELECT COUNT(*) AS m, MIN(d) AS start_day, MAX(d) AS end_day
            FROM base) a
      LEFT JOIN root_split r ON TRUE
    ),
    seg AS (
      SELECT CASE WHEN b.i <= r.si THEN 'left' ELSE 'right' END AS segment,
             b.d, b.total
      FROM base b CROSS JOIN root_split r
    ),
    base2 AS (
      SELECT segment, d,
             ROW_NUMBER() OVER (PARTITION BY segment ORDER BY d) AS i2,
             SUM(total) OVER (PARTITION BY segment ORDER BY d
                              ROWS UNBOUNDED PRECEDING) AS prefix2,
             COUNT(*) OVER (PARTITION BY segment) AS m,
             SUM(total) OVER (PARTITION BY segment) AS tot2,
             MIN(d) OVER (PARTITION BY segment) AS start_day,
             MAX(d) OVER (PARTITION BY segment) AS end_day
      FROM seg
    ),
    stats2 AS (
      SELECT segment, d, m, start_day, end_day,
             ABS(CAST(m AS HUGEINT) * prefix2
                 - CAST(i2 AS HUGEINT) * tot2) AS abs_s,
             ROW_NUMBER() OVER (
               PARTITION BY segment
               ORDER BY ABS(CAST(m AS HUGEINT) * prefix2
                            - CAST(i2 AS HUGEINT) * tot2) DESC, d
             ) AS pick
      FROM base2 WHERE i2 < m
    ),
    child_splits AS (
      SELECT segment, d AS split_day, abs_s, m AS m_split
      FROM stats2 WHERE pick = 1
    ),
    child_rows AS (
      SELECT g.segment,
             CAST(g.n_days AS BIGINT) AS n_days,
             CAST(g.start_day AS BIGINT) AS start_day,
             CAST(g.end_day AS BIGINT) AS end_day,
             CAST(c.split_day AS BIGINT) AS split_day,
             CAST(c.abs_s // c.m_split AS BIGINT) AS s_abs_cents
      FROM (
        SELECT segment, MAX(m) AS n_days, MIN(start_day) AS start_day,
               MAX(end_day) AS end_day
        FROM base2 GROUP BY segment
      ) g
      LEFT JOIN child_splits c ON g.segment = c.segment
    )
    SELECT * FROM root_row
    UNION ALL BY NAME
    SELECT * FROM child_rows
    ORDER BY segment
"""


# --- cochran_armitage_trend ------------------------------------------------------
# CA trend on proportions across ordered buckets with integer scores
# w = 0..3:  Z = T·√N / (√(R(N−R)) · √(N·Σw²n − (Σwn)²)) where
# T = N·Σwr − R·Σwn.  Both radicands are exact (DECIMAL/HUGEINT) and kept
# as SEPARATE SQRT factors so neither product can pass the 38-digit cap.
_CA_Z = (
    "CASE WHEN rr <= 0 OR sw <= 0 THEN NULL"
    " ELSE ROUND(CAST(t_num AS DOUBLE) * SQRT(CAST(n_tot AS DOUBLE))"
    " / (SQRT(CAST(rr AS DOUBLE)) * SQRT(CAST(sw AS DOUBLE))), 6) END"
)
_CA_TOKMIN = 40


def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: does the token-count gate's pass rate
    rise MONOTONICALLY with document length bucket?  chisq answers "are
    gate and bucket associated at all"; CA spends its single degree of
    freedom on the ordered alternative — the right test when the buckets
    have a natural order (length quartiles here), and the standard audit
    for "is this gate just a length proxy?".

    Exactness: buckets are integer scores w = LEAST(n_chars DIV 1024, 3);
    per-bucket trial/success counts are exact; T = N·Σwr − R·Σwn and both
    variance radicands are exact DECIMAL(38,0)/HUGEINT products; Z is ONE
    shared float text with the two SQRT factors split so no exact product
    needs more than 38 digits (R(N−R) alone reaches 10²⁴ at 100 TB).
    NULL text/length rows are excluded up front.

    Scale: ONE map-side-combined 4-row bucket aggregate is the only
    full-data shuffle; per-bucket rates and the trend arithmetic run on
    that 4-row relation (the z column repeats per row, the entropy-rate
    output convention).
    """
    from hadrodb_spark.functions import text as X

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("n_chars").isNotNull())
        .select(
            F.expr("LEAST(n_chars DIV 1024, 3)").cast("bigint").alias("w"),
            F.when(X.token_count(F.col("text")) >= _CA_TOKMIN, 1)
            .otherwise(0)
            .alias("passed"),
        )
    )
    buckets = docs.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("passed").cast("bigint").alias("r"),
    )
    wall = Window.partitionBy()
    staged = buckets.select(
        "w",
        "n",
        "r",
        F.sum("n").over(wall).cast("bigint").alias("n_tot"),
        F.sum("r").over(wall).cast("bigint").alias("r_tot"),
        F.sum(F.col("w").cast("decimal(38,0)") * F.col("n"))
        .over(wall)
        .alias("swn"),
        F.sum(F.col("w").cast("decimal(38,0)") * F.col("r"))
        .over(wall)
        .alias("swr"),
        F.sum(
            (F.col("w") * F.col("w")).cast("decimal(38,0)") * F.col("n")
        )
        .over(wall)
        .alias("swwn"),
    )
    return (
        staged.selectExpr(
            "w AS bucket",
            "n AS n_docs",
            "r AS n_passed",
            "CAST((r * 1000000) DIV n AS BIGINT) AS pass_ppm",
            "n_tot",
            "CAST(n_tot AS DECIMAL(38,0)) * swr"
            " - CAST(r_tot AS DECIMAL(38,0)) * swn AS t_num",
            "CAST(r_tot AS DECIMAL(38,0)) * (n_tot - r_tot) AS rr",
            "CAST(n_tot AS DECIMAL(38,0)) * swwn - swn * swn AS sw",
        )
        .selectExpr(
            "bucket",
            "n_docs",
            "n_passed",
            "pass_ppm",
            f"{_CA_Z} AS trend_z",
        )
        .orderBy("bucket")
    )


def _ca_oracle() -> str:
    from hadrodb_spark.functions import text as X

    toks = X.sql_tokens("text")
    return f"""
    WITH docs AS (
      SELECT CAST(LEAST(n_chars // 1024, 3) AS BIGINT) AS w,
             CASE WHEN len({toks}) >= {_CA_TOKMIN} THEN 1 ELSE 0 END
               AS passed
      FROM documents
      WHERE text IS NOT NULL AND n_chars IS NOT NULL
    ),
    buckets AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(passed) AS BIGINT) AS r
      FROM docs GROUP BY w
    ),
    staged AS (
      SELECT w, n, r,
             CAST(SUM(n) OVER () AS BIGINT) AS n_tot,
             CAST(SUM(r) OVER () AS BIGINT) AS r_tot,
             SUM(CAST(w AS HUGEINT) * n) OVER () AS swn,
             SUM(CAST(w AS HUGEINT) * r) OVER () AS swr,
             SUM(CAST(w * w AS HUGEINT) * n) OVER () AS swwn
      FROM buckets
    ),
    fin AS (
      SELECT w AS bucket, n AS n_docs, r AS n_passed,
             CAST((r * 1000000) // n AS BIGINT) AS pass_ppm,
             n_tot,
             CAST(n_tot AS HUGEINT) * swr
               - CAST(r_tot AS HUGEINT) * swn AS t_num,
             CAST(r_tot AS HUGEINT) * (n_tot - r_tot) AS rr,
             CAST(n_tot AS HUGEINT) * swwn - swn * swn AS sw
      FROM staged
    )
    SELECT bucket, n_docs, n_passed, pass_ppm,
           {_CA_Z} AS trend_z
    FROM fin
    ORDER BY bucket
"""


ORACLE["cochran_armitage_trend"] = _ca_oracle()


# --- markov_absorbing_funnel -------------------------------------------------------
# Fixed-point ppm iteration of h_{t+1}(s) = 1e6 if s = target else
# Σ_s' P(s,s')·h_t(s') DIV 1e6 — integer arithmetic is exact under any
# partitioning, which is what makes an iterative algorithm
# oracle-matchable (the graph_pagerank argument).  3 unrolled steps.
_FUNNEL_TARGET = "purchase"
_FUNNEL_STEPS = 3


def markov_absorbing_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability of reaching the purchase state within 1, 2, and 3
    transitions from each event type, under the empirical first-order
    Markov model — ``funnel_conversion`` counts observed journeys; this
    answers the counterfactual "from a SIGNUP, how likely is a purchase
    within k clicks if behavior stays as measured?", the standard
    absorbing-chain read of ``event_transition_matrix``.

    Exactness: transition probabilities are the certified integer-ppm
    matrix (shared via shared_persist with bowker/entropy); each step is
    exact integer Σ p_ppm·h_ppm DIV 10⁶ with non-negative operands; the
    target row pins to exactly 10⁶ every step; types with no observed
    outflow absorb at 0 (documented: no outflow ⇒ no modeled path).

    Scale: all three unrolled steps join |types|-row vectors against the
    ≤|types|² matrix — catalog-bounded; deeper horizons are the same
    loop with localCheckpoint per step (components.py pattern).
    """
    trans = _trans_counts(spark, sf_dir)
    wrow = Window.partitionBy("from_type")
    pm = trans.select(
        "from_type",
        "to_type",
        # n·10⁶ wraps BIGINT past ~9.2e12 transitions per pair —
        # DECIMAL(38,0)/HUGEINT routing, matching event_transition_matrix
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * 1000000)"
            " DIV (SUM(n) OVER (PARTITION BY from_type)) AS BIGINT)"
        ).alias("p_ppm"),
    )
    types = (
        trans.select(F.col("from_type").alias("t"))
        .unionByName(trans.select(F.col("to_type").alias("t")))
        .distinct()
    )
    h = types.select(
        "t",
        F.when(F.col("t") == _FUNNEL_TARGET, F.lit(1000000))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("h"),
    )
    steps = []
    for _ in range(_FUNNEL_STEPS):
        flow = (
            pm.join(
                h.select(F.col("t").alias("to_type"), F.col("h").alias("hp")),
                "to_type",
            )
            .groupBy("from_type")
            .agg(F.sum(F.expr("p_ppm * hp")).alias("flow"))
        )
        h = types.join(
            flow.select(F.col("from_type").alias("t"), "flow"), "t", "left"
        ).select(
            "t",
            F.when(F.col("t") == _FUNNEL_TARGET, F.lit(1000000))
            .otherwise(F.expr("COALESCE(flow, 0) DIV 1000000"))
            .cast("bigint")
            .alias("h"),
        )
        steps.append(h)
    out = steps[0].select(F.col("t").alias("event_type"), F.col("h").alias("p_hit1_ppm"))
    for i, hs in enumerate(steps[1:], start=2):
        out = out.join(
            hs.select(
                F.col("t").alias("event_type"),
                F.col("h").alias(f"p_hit{i}_ppm"),
            ),
            "event_type",
        )
    return out.orderBy("event_type")


def _funnel_oracle() -> str:
    target = _FUNNEL_TARGET
    ctes = [
        f"""trans AS ({_TRANS_SQL})""",
        """pm AS (
          SELECT from_type, to_type,
                 CAST((CAST(n AS HUGEINT) * 1000000)
                      // (SUM(n) OVER (PARTITION BY from_type)) AS BIGINT)
                   AS p_ppm
          FROM trans
        )""",
        """types AS (
          SELECT from_type AS t FROM trans
          UNION SELECT to_type FROM trans
        )""",
        f"""h0 AS (
          SELECT t, CAST(CASE WHEN t = '{target}' THEN 1000000 ELSE 0 END
                         AS BIGINT) AS h
          FROM types
        )""",
    ]
    for i in range(1, _FUNNEL_STEPS + 1):
        ctes.append(
            f"""h{i} AS (
          SELECT types.t,
                 CAST(CASE WHEN types.t = '{target}' THEN 1000000
                      ELSE COALESCE(f.flow, 0) // 1000000 END AS BIGINT) AS h
          FROM types LEFT JOIN (
            SELECT pm.from_type AS t, SUM(pm.p_ppm * h{i - 1}.h) AS flow
            FROM pm JOIN h{i - 1} ON h{i - 1}.t = pm.to_type
            GROUP BY pm.from_type
          ) f ON f.t = types.t
        )"""
        )
    cols = ", ".join(
        f"h{i}.h AS p_hit{i}_ppm" for i in range(1, _FUNNEL_STEPS + 1)
    )
    joins = " ".join(
        f"JOIN h{i} ON h{i}.t = h1.t" for i in range(2, _FUNNEL_STEPS + 1)
    )
    return f"""
    WITH {", ".join(ctes)}
    SELECT h1.t AS event_type, {cols}
    FROM h1 {joins}
    ORDER BY h1.t
"""


ORACLE["markov_absorbing_funnel"] = _funnel_oracle()


# --- privacy tier: l-diversity / t-closeness ----------------------------------
# Shared base: QI groups (c_mktsegment, c_nationkey) × sensitive attribute
# o_orderpriority — ONE key-only join + map-side-combined count, persisted
# (both audits and all their marginals read it).
def _qi_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        orders = load(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderpriority"
        )
        cust = load(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment", "c_nationkey"
        )
        return (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment", "c_nationkey", "o_orderpriority")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )

    return shared.shared_persist(
        ("p16_qi_counts", spark.sparkContext.applicationId, sf_dir), build
    )


_QI_SQL = """
      SELECT c_mktsegment, c_nationkey, o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2, 3
"""

# Shannon entropy term over the group's sensitive distribution — the
# markov_entropy_rate text shape (ONE shared float text, rounded at 6)
_LDIV_TERM = (
    "ROUND(CAST(c AS DOUBLE) / CAST(n_grp AS DOUBLE)"
    " * LOG2(CAST(n_grp AS DOUBLE) / CAST(c AS DOUBLE)), 6)"
)
_LDIV_MIN_L = 3


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit of order priority within customer quasi-identifier
    groups — the governance check ``k_anonymity_audit`` is NOT: a group
    can be large (k-anonymous) yet have every member sharing one
    sensitive value, so membership alone discloses it.  Reports both
    distinct l-diversity (worst distinct count, groups below l=3, the
    share of orders living in those groups) and entropy l-diversity
    (the worst group entropy in bits — Machanavajjhala et al.'s
    stronger form).

    Exactness: group/sensitive counts are exact bigints from ONE
    persisted join-aggregate; each entropy term is the shared
    markov_entropy_rate float text rounded at 6, DECIMAL-summed per
    group, so MIN over groups is a total order; the exposed-rows share
    is non-negative integer ppm.

    Scale: the only row-scale work is one key-only orders⋈customer join
    feeding a map-side-combined count bounded by |segments|·|nations|·
    |priorities|; every audit statistic reduces over that grid.
    """
    counts = _qi_priority_counts(spark, sf_dir)
    wg = Window.partitionBy("c_mktsegment", "c_nationkey")
    grp = (
        counts.select(
            "c_mktsegment",
            "c_nationkey",
            "c",
            F.sum("c").over(wg).cast("bigint").alias("n_grp"),
        )
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.max("n_grp").cast("bigint").alias("n_grp"),
            F.count(F.lit(1)).cast("bigint").alias("distinct_l"),
            F.sum(F.expr(_LDIV_TERM).cast("decimal(18,6)")).alias("h"),
        )
    )
    return grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("n_grp").cast("bigint").alias("n_orders"),
        F.min("distinct_l").cast("bigint").alias("min_distinct_l"),
        F.sum(F.when(F.col("distinct_l") < _LDIV_MIN_L, 1).otherwise(0))
        .cast("bigint")
        .alias("n_groups_below_l"),
        F.min("h").cast("double").alias("min_entropy_bits"),
        # exposed-rows·10⁶ wraps BIGINT past ~9.2e12 rows — the same
        # DECIMAL(38,0)/HUGEINT routing as every other ppm in the module
        F.expr(
            "CAST((CAST(SUM(CASE WHEN distinct_l <"
            f" {_LDIV_MIN_L} THEN n_grp ELSE 0 END) AS DECIMAL(38,0))"
            " * 1000000) DIV SUM(n_grp) AS BIGINT)"
        ).alias("exposed_rows_ppm"),
    )


ORACLE["l_diversity_audit"] = f"""
    WITH counts AS ({_QI_SQL}),
    grp AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(MAX(n_grp) AS BIGINT) AS n_grp,
             CAST(COUNT(*) AS BIGINT) AS distinct_l,
             SUM(CAST({_LDIV_TERM} AS DECIMAL(18,6))) AS h
      FROM (
        SELECT *, CAST(SUM(c) OVER (PARTITION BY c_mktsegment, c_nationkey)
                       AS BIGINT) AS n_grp
        FROM counts
      )
      GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(n_grp) AS BIGINT) AS n_orders,
           CAST(MIN(distinct_l) AS BIGINT) AS min_distinct_l,
           CAST(SUM(CASE WHEN distinct_l < {_LDIV_MIN_L} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_groups_below_l,
           CAST(MIN(h) AS DOUBLE) AS min_entropy_bits,
           CAST((CAST(SUM(CASE WHEN distinct_l < {_LDIV_MIN_L} THEN n_grp
                          ELSE 0 END) AS HUGEINT) * 1000000)
                // SUM(n_grp) AS BIGINT) AS exposed_rows_ppm
    FROM grp
"""


def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian): per customer
    quasi-identifier group, the earth-mover's distance between the
    group's order-priority distribution and the GLOBAL one over the
    ordinal priority domain — the refinement of ``l_diversity_audit``
    for skew attacks (a group can be diverse yet still reveal "these
    customers order urgently far more than the population").

    Exactness: the ordinal EMD cross-multiplies the mean away —
    t·(k−1)·n·N = Σᵢ |N·Cᵢ − n·Gᵢ| over cumulative counts on the FULL
    priority grid (zero cells included), so every tᵢ is an exact
    DECIMAL(38,0)/HUGEINT integer and t surfaces as exact non-negative
    ppm.  Groups see the whole domain via a broadcast cross join with
    the global marginal; single-priority domains (k = 1) emit NULL.

    Scale: reuses the persisted QI×priority count grid; the full grid is
    |segments|·|nations|·|priorities| rows; cumulative windows run per
    group over ≤|priorities| rows.
    """
    counts = _qi_priority_counts(spark, sf_dir)
    glob = counts.groupBy("o_orderpriority").agg(
        F.sum("c").cast("bigint").alias("g")
    )
    wall = Window.partitionBy()
    glob = glob.select(
        "o_orderpriority",
        "g",
        F.sum("g").over(wall).cast("bigint").alias("n_tot"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("k_dom"),
    )
    qi = counts.select("c_mktsegment", "c_nationkey").distinct()
    grid = (
        qi.crossJoin(F.broadcast(glob))
        .join(
            counts,
            ["c_mktsegment", "c_nationkey", "o_orderpriority"],
            "left",
        )
        .select(
            "c_mktsegment",
            "c_nationkey",
            "o_orderpriority",
            "g",
            "n_tot",
            "k_dom",
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("c"),
        )
    )
    wcum = (
        Window.partitionBy("c_mktsegment", "c_nationkey")
        .orderBy("o_orderpriority")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "c_mktsegment",
        "c_nationkey",
        "n_tot",
        "k_dom",
        F.sum("c").over(wcum).cast("bigint").alias("ci"),
        F.sum("g").over(wcum).cast("bigint").alias("gi"),
        F.sum("c")
        .over(Window.partitionBy("c_mktsegment", "c_nationkey"))
        .cast("bigint")
        .alias("n_grp"),
    )
    per_grp = cum.groupBy(
        "c_mktsegment", "c_nationkey", "n_grp", "n_tot", "k_dom"
    ).agg(
        F.sum(
            F.abs(
                F.col("n_tot").cast("decimal(38,0)") * F.col("ci")
                - F.col("n_grp").cast("decimal(38,0)") * F.col("gi")
            )
        ).alias("t_num")
    )
    return per_grp.selectExpr(
        "c_mktsegment",
        "c_nationkey",
        "n_grp AS n_orders",
        "CASE WHEN k_dom < 2 OR n_grp = 0 THEN NULL"
        " ELSE CAST((t_num * 1000000)"
        " DIV ((k_dom - 1) * CAST(n_grp AS DECIMAL(38,0)) * n_tot)"
        " AS BIGINT) END AS t_ppm",
    ).orderBy("c_mktsegment", "c_nationkey")


ORACLE["t_closeness_audit"] = f"""
    WITH counts AS ({_QI_SQL}),
    gdist AS (
      SELECT o_orderpriority, CAST(SUM(c) AS BIGINT) AS g,
             CAST(SUM(SUM(c)) OVER () AS BIGINT) AS n_tot,
             CAST(COUNT(*) OVER () AS BIGINT) AS k_dom
      FROM counts GROUP BY o_orderpriority
    ),
    qi AS (SELECT DISTINCT c_mktsegment, c_nationkey FROM counts),
    grid AS (
      SELECT qi.c_mktsegment, qi.c_nationkey, gdist.o_orderpriority,
             gdist.g, gdist.n_tot, gdist.k_dom,
             CAST(COALESCE(x.c, 0) AS BIGINT) AS c
      FROM qi CROSS JOIN gdist
      LEFT JOIN counts x
        ON x.c_mktsegment = qi.c_mktsegment
       AND x.c_nationkey = qi.c_nationkey
       AND x.o_orderpriority = gdist.o_orderpriority
    ),
    cum AS (
      SELECT c_mktsegment, c_nationkey, n_tot, k_dom,
             CAST(SUM(c) OVER (PARTITION BY c_mktsegment, c_nationkey
                               ORDER BY o_orderpriority
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ci,
             CAST(SUM(g) OVER (PARTITION BY c_mktsegment, c_nationkey
                               ORDER BY o_orderpriority
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS gi,
             CAST(SUM(c) OVER (PARTITION BY c_mktsegment, c_nationkey)
                  AS BIGINT) AS n_grp
      FROM grid
    ),
    per_grp AS (
      SELECT c_mktsegment, c_nationkey, n_grp, n_tot, k_dom,
             SUM(ABS(CAST(n_tot AS HUGEINT) * ci
                     - CAST(n_grp AS HUGEINT) * gi)) AS t_num
      FROM cum
      GROUP BY 1, 2, 3, 4, 5
    )
    SELECT c_mktsegment, c_nationkey,
           n_grp AS n_orders,
           CASE WHEN k_dom < 2 OR n_grp = 0 THEN NULL
                ELSE CAST((t_num * 1000000)
                     // ((k_dom - 1) * CAST(n_grp AS HUGEINT) * n_tot)
                     AS BIGINT) END AS t_ppm
    FROM per_grp
    ORDER BY c_mktsegment, c_nationkey
"""
