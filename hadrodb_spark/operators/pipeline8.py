"""Round-7-queue pipeline operators, batch 1: PSI drift monitoring,
k-anonymity audit, and leakage-safe temporal splitting.

Reference parity: the reference (mabel-dev/hadrodb, ``hadro/engine.py``)
stores records and defers analytics upstream; these are the dataset-health
/ governance audits SURVEY.md §2.3 scopes on top of that store — the
checks a training-data pipeline runs before every refresh: "did this
month's data drift from the reference window?", "do the quasi-identifier
combinations expose individuals?", "is the time-based split free of
entity leakage?".

All three follow the exact-arithmetic discipline: integer counts
throughout, any transcendental evaluated once per row under ONE shared
op-order text and rounded before the (exact DECIMAL) sum, fixed-point
ppm ratios via integer DIV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadrodb_spark.operators.relational import load

# --- drift_psi_monthly -------------------------------------------------
# Fixed, data-independent bin edges; bucket 13 is the overflow bin.  The
# bucket expression is ONE shared text (DuckDB has no width_bucket) — the
# subtraction/division/multiply/floor chain runs identically on both
# engines.  Laplace-smoothed Population Stability Index term over exact
# integer counts — ONE shared text so the two divisions, the subtraction,
# and the single LN run in the identical op order on both engines,
# rounded at 6 before the exact DECIMAL sum.
_PSI_BINS = 12
_PSI_LO = 0.0
_PSI_HI = 600000.0
_PSI_BIN = (
    f"CASE WHEN o_totalprice < {_PSI_LO} THEN 0"
    f" WHEN o_totalprice >= {_PSI_HI} THEN {_PSI_BINS + 1}"
    f" ELSE CAST(FLOOR((o_totalprice - {_PSI_LO})"
    f" / ({_PSI_HI} - {_PSI_LO}) * {_PSI_BINS}) AS BIGINT) + 1 END"
)
_PSI_P = "((cm + 1.0) / (nm + nb))"
_PSI_Q = "((cq + 1.0) / (nq + nb))"
_PSI_TERM = (
    f"CAST(ROUND(({_PSI_P} - {_PSI_Q}) * LN({_PSI_P} / {_PSI_Q}), 6)"
    " AS DECIMAL(18,6))"
)


def drift_psi_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-value distribution, per
    month, against the FIRST month as the reference window — the
    industry-standard "did my feature drift?" monitor (PSI < 0.1 stable,
    0.1-0.25 moderate, > 0.25 major shift).  Complements the KS
    (``source_ks_shift``) and JS (``source_js_divergence``) families:
    PSI is the binned, smoothed variant ops teams alert on.

    Exactness: bin counts are exact integers from ONE map-side-combined
    (month, bin) aggregate; Laplace smoothing ((c+1)/(n+B)) keeps every
    ratio well-defined on empty bins; each bin's term is the shared
    fixed-op-order float text rounded at 6, summed as exact DECIMAL.
    The smoothing grid is the CONSTANT 14-bucket grid (0..13, B = 14,
    data-independent) — deriving B from the observed bins would let one
    new order in a previously-empty bucket silently shift EVERY
    historical month's PSI (a drift monitor whose history moves is a
    false-alarm machine).

    Scale shape: the corpus is scanned once into a (month, bin) count
    relation — bounded by |months| × 14 rows at ANY corpus size; the
    reference-month distribution is a tiny broadcast and the bin grid a
    14-literal constant; everything downstream of the first aggregate
    runs on catalog-sized relations.  No windows, no self-joins.
    """
    orders = load(spark, sf_dir, "orders")
    counts = (
        orders.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.expr(_PSI_BIN).alias("bin"),
        )
        .groupBy("month", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    months = counts.groupBy("month").agg(F.sum("c").alias("nm"))
    bins = spark.range(1).select(
        F.explode(F.expr(f"sequence(0, {_PSI_BINS + 1})")).alias("bin")
    )
    ref_month = months.agg(F.min("month").alias("ref_month"))
    ref = (
        counts.join(F.broadcast(ref_month), counts.month == F.col("ref_month"))
        .select(F.col("bin").alias("qbin"), F.col("c").alias("cq_raw"))
    )
    ref_total = ref.agg(F.sum("cq_raw").cast("double").alias("nq"))
    grid = (
        months.crossJoin(F.broadcast(bins))
        .join(counts, ["month", "bin"], "left")
        .join(F.broadcast(ref), F.col("bin") == F.col("qbin"), "left")
        .crossJoin(F.broadcast(ref_total))
        .select(
            "month",
            F.col("nm").cast("double").alias("nm"),
            F.coalesce(F.col("c"), F.lit(0)).cast("double").alias("cm"),
            F.coalesce(F.col("cq_raw"), F.lit(0)).cast("double").alias("cq"),
            F.lit(float(_PSI_BINS + 2)).alias("nb"),
            "nq",
        )
    )
    return (
        grid.groupBy("month")
        .agg(
            F.first("nm").cast("bigint").alias("n_orders"),
            F.sum(F.expr(_PSI_TERM)).alias("psi_sum"),
        )
        .select(
            "month",
            "n_orders",
            F.expr("ROUND(CAST(psi_sum AS DOUBLE), 6)").alias("psi"),
        )
        .orderBy("month")
    )


# --- k_anonymity_audit -------------------------------------------------
_KS = (2, 5, 10)


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifier combination
    (market segment, nation, account-balance bucket) — the governance
    check run before releasing a dataset: how many equivalence classes
    (and how many individuals) fall below k ∈ {2, 5, 10}?  A group of
    size 1 is a unique, re-identifiable individual.

    Exactness: group sizes are exact integers from one map-side-combined
    aggregate; the three k-threshold rows are emitted from ONE reduced
    lineage via ``inline(array(...))`` (the ``curation_funnel_v2``
    pattern — a 3-way union would re-run the pipeline per row); risk
    ratios are integer fixed-point ppm.

    Scale shape: one shuffle to the equivalence-class relation (bounded
    by the QID-combination cardinality, not row count), one global
    reduce over it.  At 100 TB nothing changes: the class relation is
    |segments| × |nations| × |balance buckets|.
    """
    cust = load(spark, sf_dir, "customer")
    sizes = (
        cust.select(
            "c_mktsegment",
            "c_nationkey",
            F.expr("CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)").alias("bal_bucket"),
        )
        .groupBy("c_mktsegment", "c_nationkey", "bal_bucket")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    agg = sizes.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("sz").alias("n_rows"),
        F.min("sz").alias("min_group_size"),
        *[
            F.count(F.when(F.col("sz") < k, 1)).alias(f"g{k}")
            for k in _KS
        ],
        *[
            F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0)).alias(f"r{k}")
            for k in _KS
        ],
    )
    rows = ", ".join(
        f"struct(CAST({k} AS BIGINT), CAST(g{k} AS BIGINT), CAST(r{k} AS BIGINT))"
        for k in _KS
    )
    return agg.select(
        F.expr(
            f"inline(array({rows}))"
        ).alias("k", "groups_below_k", "rows_at_risk"),
        F.col("n_groups").cast("bigint").alias("n_groups"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("min_group_size").cast("bigint").alias("min_group_size"),
    ).select(
        "k",
        "groups_below_k",
        "rows_at_risk",
        F.expr("CAST((1000000 * rows_at_risk) DIV n_rows AS BIGINT)").alias(
            "risk_ppm"
        ),
        "n_groups",
        "n_rows",
        "min_group_size",
    ).orderBy("k")


# --- temporal_split_embargo --------------------------------------------
_EMBARGO_S = 3 * 86400  # 3-day embargo between train cutoff and test start


def temporal_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-ordered train/test split with an embargo gap — the
    leakage-safe protocol for temporally-correlated data (as used in
    financial backtesting: rows inside ``cutoff + embargo`` are DROPPED
    so near-boundary correlation can't leak labels).  Cutoff = the
    discrete 80th percentile of event time, truncated to seconds so the
    order-statistic aggregate buffers a bounded domain.  Also reports
    entity-level leakage: users appearing on BOTH sides of the split
    (the signal that a per-user split is needed instead).

    Exactness: the cutoff is a data-valued discrete percentile (exact on
    both engines); every count is an exact bigint from one per-user
    aggregate + one global reduce; the overlap rate is integer ppm.

    Scale shape: the cutoff aggregate buffers per-second counts (bounded
    by the time range, not row count) map-side; the 1-row cutoff
    broadcasts; the per-user conditional counts are ONE map-side-combined
    shuffle on user_id; the final reduce sees |users| rows.  No windows,
    no joins on the big side.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        # exact FLOOR division (matches DuckDB's //): Spark DIV truncates,
        # which is one too high for negative micros with a remainder —
        # latent for the post-1970 fixtures, wrong for pre-epoch data
        F.expr(
            "unix_micros(ts) DIV 1000000"
            " - CASE WHEN unix_micros(ts) % 1000000 < 0 THEN 1 ELSE 0 END"
        ).alias("s"),
    )
    cut = ev.agg(
        F.expr("percentile_disc(0.8) WITHIN GROUP (ORDER BY s)").alias("cut_s")
    )
    per_user = (
        ev.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.count(F.when(F.col("s") <= F.col("cut_s"), 1)).alias("n_tr"),
            F.count(
                F.when(
                    (F.col("s") > F.col("cut_s"))
                    & (F.col("s") <= F.col("cut_s") + _EMBARGO_S),
                    1,
                )
            ).alias("n_em"),
            F.count(
                F.when(F.col("s") > F.col("cut_s") + _EMBARGO_S, 1)
            ).alias("n_te"),
        )
    )
    return per_user.agg(
        F.sum("n_tr").cast("bigint").alias("n_train"),
        F.sum("n_em").cast("bigint").alias("n_embargoed"),
        F.sum("n_te").cast("bigint").alias("n_test"),
        F.count(F.when(F.col("n_tr") > 0, 1)).cast("bigint").alias("users_train"),
        F.count(F.when(F.col("n_te") > 0, 1)).cast("bigint").alias("users_test"),
        F.count(F.when((F.col("n_tr") > 0) & (F.col("n_te") > 0), 1))
        .cast("bigint")
        .alias("users_overlap"),
    ).select(
        "*",
        F.expr(
            "CASE WHEN users_test = 0 THEN NULL"
            " ELSE CAST((1000000 * users_overlap) DIV users_test AS BIGINT) END"
        ).alias("overlap_ppm"),
    )


# --- embedding_pca_top -------------------------------------------------
# Fixed-point power iteration (the graph_pagerank discipline): covariance
# entries scale to 1e9 integers, eigenvector components to 1e6, and every
# iteration is exact bigint arithmetic — no float accumulates across a
# shuffle, so the result is bit-reproducible on any engine.  The signed
# truncating division factors the sign out because Spark's DIV truncates
# while DuckDB's // floors (they agree only on non-negatives).
_PCA_CSCALE = 1_000_000_000
_PCA_XSCALE = 1_000_000
_PCA_ITERS = 3
_PCA_TOP = 8
# Seed with md5-derived ±1 signs per dimension (ONE shared text), not the
# all-ones vector: exact fixed-point iteration re-injects NO rounding
# noise, so a seed orthogonal to the top eigenvector (e.g. all-ones vs a
# contrast direction like dim2 ≈ −dim1) would stay orthogonal through
# every iteration and silently certify the SECOND component on both
# engines.  A natural data direction is essentially never aligned with an
# md5 sign pattern.
_PCA_SEED = (
    "(CASE WHEN substring(md5(CAST(dim AS STRING)), 1, 1) < '8'"
    f" THEN 1 ELSE -1 END) * {_PCA_XSCALE}"
)
_PCA_COV = (
    "(CAST(s AS DOUBLE) / n"
    " - (CAST(s1a AS DOUBLE) / n) * (CAST(s1b AS DOUBLE) / n))"
)


def _sdiv(a: str, b: str, div: str) -> str:
    """sign(a) * (|a| div b) — truncating signed integer division spelled
    so both engines' positive-operand division (where floor == trunc)
    does the work."""
    return f"((CASE WHEN {a} < 0 THEN -1 ELSE 1 END) * (ABS({a}) {div} {b}))"


def _pca_norm(ys: str, m: str, div: str) -> str:
    """Max-norm renormalization to _PCA_XSCALE, zero-safe."""
    scaled = f"(ABS({ys}) * {_PCA_XSCALE}) {div} {m}"
    return (
        f"CASE WHEN {m} = 0 THEN CAST(0 AS BIGINT)"
        f" ELSE (CASE WHEN {ys} < 0 THEN -1 ELSE 1 END) * ({scaled}) END"
    )


def embedding_pca_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud via fixed-point
    power iteration — the PCA audit behind ``embedding_dim_covariance``:
    instead of reporting co-varying dimension pairs, actually compute the
    direction that carries the most variance (its eigenvalue = how much
    redundancy one rotation could remove, its loadings = which dims).

    Algorithm: exact DECIMAL covariance moments → 1e9-scaled integer
    covariance matrix (d² = 4096 tiny rows) → 3 power-iteration steps
    x ← C·x with exact bigint mat-vec products and max-norm fixed-point
    renormalization → Rayleigh quotient from DECIMAL sums.  Every
    intermediate is an integer; the one float division happens once at
    output under a shared text.

    Scale shape: ONE corpus scan feeds the d²/2 map-side pair explode
    (aggregation partials bounded at 2080 cells per task); everything
    after the moments aggregate runs on catalog-sized relations (4096-row
    matrix, 64-row vectors, broadcast joins).  Iteration count is fixed,
    not data-dependent.  At d ≫ 64 the swap is a blocked/sampled
    covariance — documented at ``embedding_dim_covariance``.
    """
    emb = load(spark, sf_dir, "embeddings")
    nrow = emb.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ex = emb.select("vec_id", "embedding", F.posexplode("embedding").alias("i", "vi"))
    pairs = (
        ex.select("vec_id", "i", "vi", F.posexplode("embedding").alias("j", "vj"))
        .filter(F.col("i") <= F.col("j"))
        .select(
            (F.col("i") + 1).alias("dim_a"),
            (F.col("j") + 1).alias("dim_b"),
            (F.col("vi").cast("double") * F.col("vj").cast("double")).alias("p"),
        )
    )
    prods = pairs.groupBy("dim_a", "dim_b").agg(
        F.sum(F.col("p").cast("decimal(38,18)")).alias("s")
    )
    means = (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy((F.col("pos") + 1).alias("dim"))
        .agg(F.sum(F.col("v").cast("double").cast("decimal(28,10)")).alias("s1"))
    )
    half = (
        prods.join(
            F.broadcast(means.select(F.col("dim").alias("dim_a"), F.col("s1").alias("s1a"))),
            "dim_a",
        )
        .join(
            F.broadcast(means.select(F.col("dim").alias("dim_b"), F.col("s1").alias("s1b"))),
            "dim_b",
        )
        .crossJoin(F.broadcast(nrow))
        .select(
            "dim_a",
            "dim_b",
            F.expr(
                f"CAST(ROUND({_PCA_COV} * {_PCA_CSCALE}) AS BIGINT)"
            ).alias("c"),
        )
    )
    full = half.select(
        F.col("dim_a").alias("i"), F.col("dim_b").alias("j"), "c"
    ).unionAll(
        half.filter(F.col("dim_a") < F.col("dim_b")).select(
            F.col("dim_b").alias("i"), F.col("dim_a").alias("j"), "c"
        )
    )
    x = means.select(
        F.col("dim").alias("j"),
        F.expr(f"CAST({_PCA_SEED} AS BIGINT)").alias("x"),
    )

    def matvec(xv: DataFrame) -> DataFrame:
        return (
            full.join(F.broadcast(xv), "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("x")).alias("y"))
        )

    for _ in range(_PCA_ITERS):
        ys = matvec(x).select(
            "i", F.expr(_sdiv("y", str(_PCA_XSCALE), "DIV")).alias("ys")
        )
        m = ys.agg(F.max(F.abs(F.col("ys"))).alias("m"))
        x = ys.crossJoin(F.broadcast(m)).select(
            F.col("i").alias("j"),
            F.expr(_pca_norm("ys", "m", "DIV")).alias("x"),
        )
    y4 = matvec(x)
    ray = (
        x.join(y4, x.j == y4.i)
        .agg(
            F.sum(
                F.col("x").cast("decimal(38,0)") * F.col("y").cast("decimal(38,0)")
            ).alias("sxy"),
            F.sum(
                F.col("x").cast("decimal(38,0)") * F.col("x").cast("decimal(38,0)")
            ).alias("sxx"),
        )
    )
    from pyspark.sql.window import Window

    ranked = x.crossJoin(F.broadcast(ray)).select(
        F.row_number()
        .over(Window.orderBy(F.abs(F.col("x")).desc(), F.col("j").asc()))
        .cast("bigint")
        .alias("rank"),
        F.col("j").cast("bigint").alias("dim"),
        F.col("x").cast("bigint").alias("loading_fp"),
        F.expr(
            "CASE WHEN sxx = 0 THEN NULL ELSE"
            f" ROUND(CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE) / {_PCA_CSCALE}.0, 6)"
            " END"
        ).alias("eigenvalue"),
    )
    return ranked.filter(F.col("rank") <= _PCA_TOP).orderBy("rank")


def _pca_oracle() -> str:
    """Unrolled power-iteration CTE chain (the vector_topk_pq oracle
    discipline applied to linear algebra)."""
    div = "//"
    ctes = [
        "nrow AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings)",
        """ex AS (
          SELECT vec_id, UNNEST(embedding) AS v,
                 UNNEST(generate_series(1, len(embedding))) AS pos
          FROM embeddings
        )""",
        """pr AS (
          SELECT a.pos AS dim_a, b.pos AS dim_b,
                 SUM(CAST(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)
                     AS DECIMAL(38,18))) AS s
          FROM ex a JOIN ex b
            ON a.vec_id = b.vec_id AND a.pos <= b.pos
          GROUP BY 1, 2
        )""",
        """means AS (
          SELECT pos AS dim, SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,10))) AS s1
          FROM ex GROUP BY pos
        )""",
        f"""half AS (
          SELECT dim_a, dim_b,
                 CAST(ROUND({_PCA_COV} * {_PCA_CSCALE}) AS BIGINT) AS c
          FROM (
            SELECT dim_a, dim_b, s, ma.s1 AS s1a, mb.s1 AS s1b, n
            FROM pr
            JOIN means ma ON ma.dim = pr.dim_a
            JOIN means mb ON mb.dim = pr.dim_b
            CROSS JOIN nrow
          )
        )""",
        """fullm AS (
          SELECT dim_a AS i, dim_b AS j, c FROM half
          UNION ALL
          SELECT dim_b AS i, dim_a AS j, c FROM half WHERE dim_a < dim_b
        )""",
        f"x0 AS (SELECT dim AS j, CAST({_PCA_SEED} AS BIGINT) AS x FROM means)",
    ]
    prev = "x0"
    for it in range(1, _PCA_ITERS + 1):
        ctes.append(
            f"""y{it} AS (
          SELECT i, SUM(c * x) AS y FROM fullm JOIN {prev} USING (j) GROUP BY i
        )"""
        )
        ctes.append(
            f"""ys{it} AS (
          SELECT i, {_sdiv('y', str(_PCA_XSCALE), div)} AS ys FROM y{it}
        )"""
        )
        ctes.append(f"m{it} AS (SELECT MAX(ABS(ys)) AS m FROM ys{it})")
        ctes.append(
            f"""x{it} AS (
          SELECT i AS j, {_pca_norm('ys', 'm', div)} AS x FROM ys{it}, m{it}
        )"""
        )
        prev = f"x{it}"
    last = _PCA_ITERS
    ctes.append(
        f"""yf AS (
          SELECT i, SUM(c * x) AS y FROM fullm JOIN x{last} USING (j) GROUP BY i
        )"""
    )
    ctes.append(
        f"""ray AS (
          SELECT SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sxy,
                 SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS sxx
          FROM x{last} JOIN yf ON x{last}.j = yf.i
        )"""
    )
    return f"""
        WITH {', '.join(ctes)}
        SELECT rank, dim, loading_fp,
               CASE WHEN sxx = 0 THEN NULL ELSE
                 ROUND(CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE)
                       / {_PCA_CSCALE}.0, 6) END AS eigenvalue
        FROM (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY ABS(x) DESC, j ASC)
                      AS BIGINT) AS rank,
                 CAST(j AS BIGINT) AS dim,
                 CAST(x AS BIGINT) AS loading_fp
          FROM x{last}
        ), ray
        WHERE rank <= {_PCA_TOP}
        ORDER BY rank
    """


# --- event_transition_matrix -------------------------------------------


def transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE first-order transition-count relation (from_type, to_type, n)
    over each user's (ts, event_id)-ordered stream — the single certified
    derivation, persisted and shared by :func:`event_transition_matrix`
    and pipeline16's bowker / entropy-rate / absorbing-funnel queries
    (one user-window shuffle per session instead of one per consumer)."""
    from hadrodb_spark.operators import shared

    def build() -> DataFrame:
        from pyspark.sql.window import Window

        ev = load(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "event_type"
        )
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return (
            ev.select(
                F.col("event_type").alias("from_type"),
                F.lead("event_type").over(w).alias("to_type"),
            )
            .filter(F.col("to_type").isNotNull())
            .groupBy("from_type", "to_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )

    return shared.shared_persist(
        ("transition_counts", spark.sparkContext.applicationId, sf_dir),
        build,
    )


# the oracle twin of transition_counts — interpolated into every consumer's
# oracle (pipeline8 + pipeline16) so the certified text exists ONCE
TRANS_SQL = """
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
      )
      WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's time-ordered
    event stream — the behavioral fingerprint behind ``event_paths``'s
    top journeys: P(next event type | current event type), with exact
    bigram counts and ppm probabilities.  Watching this matrix drift
    between releases is the classic product-analytics regression check.

    Exactness: the successor comes from a lag window under the total
    (ts, event_id) order; counts are exact bigints; row probabilities are
    integer fixed-point ppm.  Scale shape: one user_id window shuffle on
    the raw stream, then a map-side-combined |types|² aggregate; the row
    totals come from a window over the tiny matrix itself."""
    from pyspark.sql.window import Window

    trans = transition_counts(spark, sf_dir)
    wrow = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n",
        F.sum("n").over(wrow).cast("bigint").alias("row_total"),
        # n·10⁶ wraps BIGINT once a transition pair passes ~9.2e12 —
        # DECIMAL(38,0)/HUGEINT routing (the r8/r9 overflow class);
        # operands are non-negative so DIV == floor on both engines.
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * 1000000)"
            " DIV (SUM(n) OVER (PARTITION BY from_type)) AS BIGINT)"
        ).alias("p_ppm"),
    ).orderBy("from_type", "to_type")


ORACLE: dict[str, str] = {
    "embedding_pca_top": _pca_oracle(),
    "event_transition_matrix": f"""
        WITH trans AS ({TRANS_SQL})
        SELECT from_type, to_type,
               CAST(n AS BIGINT) AS n,
               CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total,
               CAST((CAST(n AS HUGEINT) * 1000000)
                    // (SUM(n) OVER (PARTITION BY from_type))
                    AS BIGINT) AS p_ppm
        FROM trans
        ORDER BY from_type, to_type
    """,
    "drift_psi_monthly": f"""
        WITH counts AS (
          SELECT strftime(o_orderdate, '%Y-%m') AS month,
                 {_PSI_BIN} AS bin,
                 COUNT(*) AS c
          FROM orders GROUP BY 1, 2
        ),
        months AS (SELECT month, SUM(c) AS nm FROM counts GROUP BY month),
        bins AS (SELECT unnest(generate_series(0, {_PSI_BINS + 1})) AS bin),
        nbv AS (SELECT CAST({_PSI_BINS + 2} AS DOUBLE) AS nb),
        refm AS (SELECT MIN(month) AS ref_month FROM months),
        ref AS (
          SELECT bin AS qbin, c AS cq_raw FROM counts, refm
          WHERE month = ref_month
        ),
        reft AS (SELECT CAST(SUM(cq_raw) AS DOUBLE) AS nq FROM ref),
        grid AS (
          SELECT m.month,
                 CAST(m.nm AS DOUBLE) AS nm,
                 CAST(COALESCE(c.c, 0) AS DOUBLE) AS cm,
                 CAST(COALESCE(r.cq_raw, 0) AS DOUBLE) AS cq,
                 nb, nq
          FROM months m
          CROSS JOIN bins b
          LEFT JOIN counts c ON c.month = m.month AND c.bin = b.bin
          LEFT JOIN ref r ON r.qbin = b.bin
          CROSS JOIN nbv CROSS JOIN reft
        )
        SELECT month,
               CAST(MIN(nm) AS BIGINT) AS n_orders,
               ROUND(CAST(SUM({_PSI_TERM}) AS DOUBLE), 6) AS psi
        FROM grid GROUP BY month ORDER BY month
    """,
    "k_anonymity_audit": f"""
        WITH sizes AS (
          SELECT c_mktsegment, c_nationkey,
                 CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
                 COUNT(*) AS sz
          FROM customer GROUP BY 1, 2, 3
        ),
        agg AS (
          SELECT COUNT(*) AS n_groups, SUM(sz) AS n_rows,
                 MIN(sz) AS min_group_size,
                 {", ".join(f"COUNT(CASE WHEN sz < {k} THEN 1 END) AS g{k}" for k in _KS)},
                 {", ".join(f"SUM(CASE WHEN sz < {k} THEN sz ELSE 0 END) AS r{k}" for k in _KS)}
          FROM sizes
        ),
        ks AS (
          {" UNION ALL ".join(f"SELECT CAST({k} AS BIGINT) AS k, CAST(g{k} AS BIGINT) AS groups_below_k, CAST(r{k} AS BIGINT) AS rows_at_risk FROM agg" for k in _KS)}
        )
        SELECT k, groups_below_k, rows_at_risk,
               CAST((1000000 * rows_at_risk) // (SELECT n_rows FROM agg)
                    AS BIGINT) AS risk_ppm,
               (SELECT CAST(n_groups AS BIGINT) FROM agg) AS n_groups,
               (SELECT CAST(n_rows AS BIGINT) FROM agg) AS n_rows,
               (SELECT CAST(min_group_size AS BIGINT) FROM agg)
                 AS min_group_size
        FROM ks ORDER BY k
    """,
    "temporal_split_embargo": f"""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) // 1000000 AS s FROM events
        ),
        cut AS (
          SELECT percentile_disc(0.8) WITHIN GROUP (ORDER BY s) AS cut_s
          FROM ev
        ),
        per_user AS (
          SELECT user_id,
                 COUNT(CASE WHEN s <= cut_s THEN 1 END) AS n_tr,
                 COUNT(CASE WHEN s > cut_s AND s <= cut_s + {_EMBARGO_S}
                       THEN 1 END) AS n_em,
                 COUNT(CASE WHEN s > cut_s + {_EMBARGO_S} THEN 1 END) AS n_te
          FROM ev, cut GROUP BY user_id
        ),
        agg AS (
          SELECT CAST(SUM(n_tr) AS BIGINT) AS n_train,
                 CAST(SUM(n_em) AS BIGINT) AS n_embargoed,
                 CAST(SUM(n_te) AS BIGINT) AS n_test,
                 CAST(COUNT(CASE WHEN n_tr > 0 THEN 1 END) AS BIGINT)
                   AS users_train,
                 CAST(COUNT(CASE WHEN n_te > 0 THEN 1 END) AS BIGINT)
                   AS users_test,
                 CAST(COUNT(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 END)
                      AS BIGINT) AS users_overlap
          FROM per_user
        )
        SELECT *,
               CASE WHEN users_test = 0 THEN NULL
                    ELSE CAST((1000000 * users_overlap) // users_test AS BIGINT)
                    END AS overlap_ppm
        FROM agg
    """,
}
