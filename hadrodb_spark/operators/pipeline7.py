"""Round-6-queue LLM-pipeline operators, batch 1: split-leakage audit,
exact Kolmogorov–Smirnov distribution shift, and embedding dimension
statistics.

Reference parity: the reference (mabel-dev/hadrodb, ``hadro/engine.py``)
stores documents and defers analytics upstream; these are the
training-data quality audits SURVEY.md §2.3 scopes on top of that store.
All three are exact-arithmetic designs (bigint cross-multiplication or
DECIMAL power sums) so the DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadrodb_spark.functions import text as X
from hadrodb_spark.operators.dedup import _EXACT_MOD, _EXACT_OFFSET, _with_exact_copies
from hadrodb_spark.operators.pipeline4 import _TRAIN_HEX, _VAL_HEX
from hadrodb_spark.operators.relational import load


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test contamination audit — the hygiene check run after
    every split: does any held-out document share a canonical fingerprint
    with a training document?  Uses the SAME md5-prefix split as
    ``train_val_split`` and the SAME planted exact copies as the dedup
    family, so leaked pairs exist by construction (a planted copy and its
    original hash to different splits whenever their doc_ids do).

    Scale shape: fingerprint + split are map-only columns; ONE shuffle
    groups by fingerprint with map-side-combinable per-split counts; the
    per-fingerprint relation (≤ |distinct docs| rows, 4 small ints each)
    feeds a single partially-aggregated global reduce.  No joins, no
    windows — this survives any corpus size.  Every output is an exact
    bigint; the leak rates are integer fixed-point (ppm via DIV).
    """
    base = _with_exact_copies(spark, sf_dir).select("doc_id", "text")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < F.expr(_TRAIN_HEX), "train")
        .when(h2 < F.expr(_VAL_HEX), "val")
        .otherwise("test")
    )
    per_fp = (
        base.select(X.fingerprint(F.col("text")).alias("fp"), split.alias("split"))
        .groupBy("fp")
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("n_train"),
            F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("n_val"),
            F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("n_test"),
        )
    )
    agg = per_fp.agg(
        F.sum("n_train").cast("bigint").alias("n_train_docs"),
        F.sum("n_val").cast("bigint").alias("n_val_docs"),
        F.sum("n_test").cast("bigint").alias("n_test_docs"),
        F.count(F.when((F.col("n_train") > 0) & (F.col("n_val") > 0), 1))
        .cast("bigint")
        .alias("shared_fp_train_val"),
        F.count(F.when((F.col("n_train") > 0) & (F.col("n_test") > 0), 1))
        .cast("bigint")
        .alias("shared_fp_train_test"),
        F.count(F.when((F.col("n_val") > 0) & (F.col("n_test") > 0), 1))
        .cast("bigint")
        .alias("shared_fp_val_test"),
        F.sum(F.when(F.col("n_train") > 0, F.col("n_val")).otherwise(0))
        .cast("bigint")
        .alias("leaked_val_docs"),
        F.sum(
            F.when((F.col("n_train") > 0) | (F.col("n_val") > 0), F.col("n_test")).otherwise(0)
        )
        .cast("bigint")
        .alias("leaked_test_docs"),
    )
    return agg.select(
        "*",
        F.expr("CAST((1000000 * leaked_val_docs) DIV n_val_docs AS BIGINT)").alias(
            "leak_val_ppm"
        ),
        F.expr("CAST((1000000 * leaked_test_docs) DIV n_test_docs AS BIGINT)").alias(
            "leak_test_ppm"
        ),
    )


# Grid-cardinality cap for source_ks_shift: lengths clamp to this value
# before the ECDF grid is built, so the grid is ≤ |sources| × (_KS_CAP+1)
# rows by construction.  Single-sourced into the Spark query, the DuckDB
# oracle, and the plan/property tests.
_KS_CAP = 16384


def source_ks_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution shift as the EXACT two-sample
    Kolmogorov–Smirnov statistic of document length (``n_chars``) against
    the whole corpus — the order-statistic complement to
    ``source_js_divergence``'s binned divergence: KS needs no binning
    choice and is sensitive to location shifts JS smooths away.

    Exactness: sup|ECDF_s − ECDF_all| over the merged support is attained
    at corpus-distinct values, and with c_s/c_all the cumulative counts,
    D = max|c_s·N − c_all·n_s| / (n_s·N) — all-integer until one final
    fixed-point DIV (ppm).  No float ever enters the comparison.

    Scale shape: the corpus is scanned ONCE — the per-(source, value)
    counts aggregate (one map-side-combinable shuffle) is persisted via
    the shared registry and every other relation (per-source totals,
    distinct values, the global CDF) derives from it, so the raw table
    never feeds the grid directly.  The evaluation grid is PROVABLY
    bounded at |sources| × (_KS_CAP + 1): lengths clamp to
    ``LEAST(n_chars, _KS_CAP)`` before counting, so an adversarial corpus
    of all-distinct multi-megabyte documents still yields ≤ 16 385 grid
    values per source (r7 VERDICT task #4 — previously the bound was an
    argument about typical length distributions, not a structural one).
    Everything ≥ the cap collapses to one ECDF point: the statistic is
    the exact KS of the cap-censored length distribution, which keeps
    full resolution over the (0, 16384] range where real document-length
    shift lives and loses only tail resolution.  The cross join and the
    per-source cumulative windows therefore run over a relation ~10⁴
    rows at ANY corpus scale; the single-partition global-CDF window is
    over ≤ 16 385 rows.  bigint headroom: 10⁶·n_s·N overflows int64 only
    past ~10⁹ total docs per 10⁹-doc source — switch the final DIV to
    DECIMAL(38,0) arithmetic if a corpus ever gets there.
    """
    from hadrodb_spark.operators import shared

    docs = load(spark, sf_dir, "documents").select(
        "source", F.least(F.col("n_chars"), F.lit(_KS_CAP)).alias("n_chars")
    )
    counts = shared.shared_persist(
        ("source_ks_counts", spark.sparkContext.applicationId, sf_dir),
        lambda: docs.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("c")),
    )
    totals = counts.groupBy("source").agg(F.sum("c").alias("n_s"))
    values = counts.select("n_chars").distinct()
    gcum = (
        counts.groupBy("n_chars")
        .agg(F.sum("c").alias("c_all"))
        .select(
            "n_chars",
            F.sum("c_all").over(Window.orderBy("n_chars")).alias("cum_all"),
            F.sum("c_all").over(
                Window.orderBy("n_chars").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("n_total"),
        )
    )
    grid = (
        totals.crossJoin(values)
        .join(counts, ["source", "n_chars"], "left")
        .select(
            "source",
            "n_chars",
            "n_s",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
        .select(
            "source",
            "n_chars",
            "n_s",
            F.sum("c").over(Window.partitionBy("source").orderBy("n_chars")).alias("cum_s"),
        )
        .join(gcum, "n_chars")
    )
    return (
        grid.groupBy("source")
        .agg(
            F.first("n_s").cast("bigint").alias("n_docs"),
            F.max(
                F.abs(F.col("cum_s") * F.col("n_total") - F.col("cum_all") * F.col("n_s"))
            ).alias("d_num"),
            F.first("n_total").alias("n_total"),
        )
        .select(
            "source",
            "n_docs",
            F.col("d_num").cast("bigint").alias("ks_num"),
            F.expr("CAST((1000000 * d_num) DIV (n_docs * n_total) AS BIGINT)").alias(
                "ks_ppm"
            ),
        )
        .orderBy("source")
    )


# Variance from DECIMAL power sums — ONE shared text so the three double
# divisions/multiplies run in the identical op order on both engines.
_DIM_MEAN = "(CAST(s1 AS DOUBLE) / n)"
_DIM_VAR = f"(CAST(s2 AS DOUBLE) / n - {_DIM_MEAN} * {_DIM_MEAN})"


def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics (count, mean, population
    variance) — the dead/degenerate-dimension audit run before trusting a
    vector column for ANN or semantic dedup (a near-zero-variance
    dimension carries no signal and wastes index bits).

    Exactness: each float value casts to double (exact) and accumulates
    as DECIMAL(28,10); its square is one double multiply then
    DECIMAL(38,18) — both sums order-independent.  mean/variance are the
    shared fixed-op-order expression over (s1, s2, n), rounded at output.
    One shuffle on the dimension id (64 groups, map-side combined); the
    explode is map-only.  At 100 TB the per-dim partials are 64 rows per
    task — nothing about this plan changes with corpus size.
    """
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("pos", "v")).select(
        (F.col("pos") + 1).alias("dim"), F.col("v").cast("double").alias("vd")
    )
    agg = ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("vd").cast("decimal(28,10)")).alias("s1"),
        F.sum((F.col("vd") * F.col("vd")).cast("decimal(38,18)")).alias("s2"),
    )
    return agg.select(
        F.col("dim").cast("bigint").alias("dim"),
        F.col("n").cast("bigint").alias("n"),
        F.expr(f"ROUND({_DIM_MEAN}, 6)").alias("mean"),
        F.expr(f"ROUND({_DIM_VAR}, 6)").alias("variance"),
    ).orderBy("dim")


# Lag-1 Pearson autocorrelation from exact DECIMAL moments — ONE shared
# text over (n, sx, sy, sxx, syy, sxy) so the float tail runs in the
# identical op order on both engines.
_AC_NUM = "(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
_AC_DEN = (
    "(SQRT(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * SQRT(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
)


def autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of daily revenue per event type — the
    time-series health signal (strong positive r = momentum/trend, near
    zero = memoryless noise, negative = oscillation) that decides whether
    yesterday's volume predicts today's in capacity planning.

    Exactness: daily totals are exact integer cents; (prev, cur) pairs
    come from a lag window with a total day order; all five moments
    accumulate as exact DECIMAL sums, and the Pearson tail is the shared
    fixed-op-order expression, NULL when a series is constant (zero
    variance) instead of an ANSI divide-by-zero.  Scale shape: one keyed
    aggregate to |types|×|days| rows; the lag window and moment
    aggregation run on that tiny relation."""
    daily = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("total"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    pairs = daily.select(
        "event_type",
        F.lag("total").over(w).alias("x"),
        F.col("total").alias("y"),
    ).filter(F.col("x").isNotNull())
    agg = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
    )
    return agg.selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n_pairs",
        f"CASE WHEN {_AC_DEN} = 0 THEN NULL"
        f" ELSE ROUND({_AC_NUM} / {_AC_DEN}, 6) END AS r",
    ).orderBy("event_type")


def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand skyline (Pareto-optimal set): parts not dominated on
    (minimize price, maximize size) — the multi-objective shortlist query
    (catalog curation, plan selection) that no single ORDER BY expresses.

    Spark side is the ONE-PASS windowed formulation — the shape that
    survives any group size, unlike the naive quadratic self-join: a part
    is dominated iff a strictly cheaper part has size ≥ its size
    (``max(size) RANGE UNBOUNDED PRECEDING TO 1 PRECEDING`` over cents)
    or an equal-priced part has strictly larger size (``max(size)`` over
    the (brand, cents) frame).  The ORACLE deliberately uses the NOT
    EXISTS dominance *specification* instead — value equality across the
    two algebras proves the window derivation, not just the arithmetic.
    Prices compare as exact integer cents."""
    p = load(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        F.expr("CAST(ROUND(p_retailprice * 100) AS BIGINT)").alias("cents"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    cheaper = (
        Window.partitionBy("p_brand")
        .orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    same_price = Window.partitionBy("p_brand", "cents")
    flagged = p.select(
        "*",
        F.max("size").over(cheaper).alias("m1"),
        F.max("size").over(same_price).alias("m2"),
    )
    return (
        flagged.filter(
            (F.col("m1").isNull() | (F.col("m1") < F.col("size")))
            & (F.col("m2") == F.col("size"))
        )
        .select("p_brand", "p_partkey", "cents", "size")
        .orderBy("p_brand", "p_partkey")
    )


_HEAPS_NUM = "(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
_HEAPS_DEN = "(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"


def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit: vocabulary growth V(n) ≈ K·n^β measured at 10
    corpus-prefix checkpoints (doc_id order) and fit by log-log OLS — the
    corpus-health twin of ``zipf_slope``: natural text grows vocabulary
    sub-linearly (β ≈ 0.4-0.6); templated corpora flatten β toward 0 and
    synthetic noise pushes it toward 1.

    Exactness: a term's checkpoint is its FIRST document (min doc_id —
    exact); cumulative token/vocab counts are bigint window sums over a
    10-row relation; both logs are rounded per-row to 6 decimals and
    accumulated as DECIMAL power sums (the zipf_slope/regression_line
    engine-proof algebra), one double division at the end.  Scale shape:
    one term-keyed map-side-combined shuffle for first-occurrences, one
    doc-bucket aggregate for token mass; everything after is a 10-row
    relation."""
    docs = load(spark, sf_dir, "documents")
    maxd = docs.agg(F.max("doc_id").alias("mx"))
    terms = (
        docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("fd"))
    )
    vocab_b = (
        terms.crossJoin(F.broadcast(maxd))
        .select(F.expr("LEAST((fd * 10) DIV (mx + 1), 9)").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("new_terms"))
    )
    tokens_b = (
        docs.select("doc_id", X.token_count(F.col("text")).alias("nt"))
        .crossJoin(F.broadcast(maxd))
        .select(F.expr("LEAST((doc_id * 10) DIV (mx + 1), 9)").alias("bucket"), "nt")
        .groupBy("bucket")
        .agg(F.sum("nt").alias("toks"))
    )
    w = Window.orderBy("bucket")
    pts = (
        tokens_b.join(vocab_b, "bucket", "left")
        .select(
            "bucket",
            F.sum("toks").over(w).alias("cum_tokens"),
            F.sum(F.coalesce("new_terms", F.lit(0))).over(w).alias("cum_vocab"),
        )
        .select(
            F.expr("CAST(ROUND(LN(cum_tokens), 6) AS DECIMAL(18,6))").alias("x"),
            F.expr("CAST(ROUND(LN(cum_vocab), 6) AS DECIMAL(18,6))").alias("y"),
            "cum_tokens",
            "cum_vocab",
        )
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.max("cum_tokens").alias("total_tokens"),
        F.max("cum_vocab").alias("total_vocab"),
    )
    return agg.selectExpr(
        "CAST(n AS BIGINT) AS n_points",
        "CAST(total_tokens AS BIGINT) AS total_tokens",
        "CAST(total_vocab AS BIGINT) AS total_vocab",
        f"CASE WHEN {_HEAPS_DEN} = 0 THEN NULL"
        f" ELSE ROUND({_HEAPS_NUM} / {_HEAPS_DEN}, 6) END AS beta",
        f"CASE WHEN {_HEAPS_DEN} = 0 THEN NULL"
        f" ELSE ROUND((CAST(sy AS DOUBLE) - {_HEAPS_NUM} / {_HEAPS_DEN}"
        f" * CAST(sx AS DOUBLE)) / n, 6) END AS log_k",
    )


# Covariance from DECIMAL power sums — ONE shared text (cols: s, n, s1a, s1b)
_DIM_COV = (
    "(CAST(s AS DOUBLE) / n"
    " - (CAST(s1a AS DOUBLE) / n) * (CAST(s1b AS DOUBLE) / n))"
)


def embedding_dim_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redundant-dimension audit: the top-20 most-correlated embedding
    dimension pairs by |covariance| — two dimensions that co-vary carry
    duplicated signal, the complement of ``embedding_dim_stats``'s
    dead-dimension check (PCA would rotate these away; this reports them).

    Exactness: pair products are one double multiply then DECIMAL(38,18)
    sums (order-independent); per-dim means come from DECIMAL(28,10)
    sums; the covariance is a shared fixed-op-order expression rounded at
    output, and the top-20 ranks on the ROUNDED value with (dim_a, dim_b)
    tiebreak.  Scale shape: the d²/2 pair explode is map-only and the
    aggregation partials are ≤ d²/2 = 2016 cells per task regardless of
    corpus size; the means relation is 64 rows broadcast twice.  At
    d ≫ 64 the swap is sampling dims or a block-wise pass — documented,
    not needed at this width."""
    emb = load(spark, sf_dir, "embeddings")
    pairs = (
        emb.select("vec_id", "embedding", F.posexplode("embedding").alias("i", "vi"))
        .select(
            "vec_id", "i", "vi", F.posexplode("embedding").alias("j", "vj")
        )
        .filter(F.col("i") < F.col("j"))
        .select(
            (F.col("i") + 1).alias("dim_a"),
            (F.col("j") + 1).alias("dim_b"),
            (F.col("vi").cast("double") * F.col("vj").cast("double")).alias("p"),
        )
    )
    prods = pairs.groupBy("dim_a", "dim_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("p").cast("decimal(38,18)")).alias("s"),
    )
    means = (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy((F.col("pos") + 1).alias("dim"))
        .agg(F.sum(F.col("v").cast("double").cast("decimal(28,10)")).alias("s1"))
    )
    joined = (
        prods.join(
            F.broadcast(means.select(F.col("dim").alias("dim_a"), F.col("s1").alias("s1a"))),
            "dim_a",
        )
        .join(
            F.broadcast(means.select(F.col("dim").alias("dim_b"), F.col("s1").alias("s1b"))),
            "dim_b",
        )
    )
    out = joined.select(
        F.col("dim_a").cast("bigint").alias("dim_a"),
        F.col("dim_b").cast("bigint").alias("dim_b"),
        F.col("n").cast("bigint").alias("n"),
        F.expr(f"ROUND({_DIM_COV}, 6)").alias("cov"),
    )
    return out.orderBy(F.abs(F.col("cov")).desc(), "dim_a", "dim_b").limit(20)


_FRAG_A = 400000   # first-fragment doc_id offset (planted continuation pairs)
_FRAG_B = 500000   # second-fragment offset; pair identity: b_id = a_id + 100000


def fragment_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-fragment stitching: find document pairs where one document's
    TAIL equals another's HEAD (16-token boundary windows) — the signal
    that a source split one page into consecutive crawl records, the
    complement of dedup (the two halves share almost nothing globally, so
    MinHash never pairs them).  Fragment pairs are PLANTED by splitting
    every ``doc_id % 61 == 0`` document (≥ 40 tokens) into two halves
    overlapping by 16 tokens, so the join is non-vacuous and recall is
    checkable (``planted`` column).

    Scale shape: head/tail fingerprints are map-only md5s of fixed
    16-token windows; the candidate join is equi on the fingerprint —
    collision-bounded, never all-pairs.  The fingerprint relation feeds
    both sides of the self-join, so it is persisted once via the shared
    registry; join keys are renamed per side (the ambiguous-self-join
    discipline)."""
    from hadrodb_spark.operators import shared

    def build_fps():
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        elig = docs.select(
            "doc_id", X.tokens(F.col("text")).alias("t")
        ).withColumn("n", F.size("t")).filter(F.col("n") >= 48)
        frag_a = elig.filter(F.col("doc_id") % 61 == 0).select(
            (F.col("doc_id") + _FRAG_A).alias("doc_id"),
            F.expr("concat_ws(' ', slice(t, 1, CAST(n DIV 2 AS INT) + 8))").alias("text"),
        )
        frag_b = elig.filter(F.col("doc_id") % 61 == 0).select(
            (F.col("doc_id") + _FRAG_B).alias("doc_id"),
            F.expr(
                "concat_ws(' ', slice(t, CAST(n DIV 2 AS INT) - 7,"
                " n - CAST(n DIV 2 AS INT) + 8))"
            ).alias("text"),
        )
        corpus = docs.unionByName(frag_a).unionByName(frag_b)
        tk = corpus.select("doc_id", X.tokens(F.col("text")).alias("tk")).filter(
            F.size("tk") >= 32
        )
        return tk.select(
            "doc_id",
            F.md5(F.concat_ws(" ", F.slice("tk", 1, 16))).alias("head_fp"),
            F.expr("md5(concat_ws(' ', slice(tk, size(tk) - 15, 16)))").alias("tail_fp"),
        )

    fps = shared.shared_persist(
        ("fragment_stitch_fps", spark.sparkContext.applicationId, sf_dir),
        build_fps,
    )
    a = fps.select(
        F.col("doc_id").alias("a_id"), F.col("tail_fp").alias("a_tail")
    )
    b = fps.select(
        F.col("doc_id").alias("b_id"), F.col("head_fp").alias("b_head")
    )
    return (
        a.join(b, (F.col("a_tail") == F.col("b_head")) & (F.col("a_id") != F.col("b_id")))
        .select(
            "a_id",
            "b_id",
            (F.col("b_id") == F.col("a_id") + (_FRAG_B - _FRAG_A)).alias("planted"),
        )
        .orderBy("a_id", "b_id")
    )


_SAMPLE_K = 20


def group_uniform_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group uniform sample: keep the K=20 docs per
    source with the smallest md5(doc_id) — the reproducible
    inspection/eval sample every curation run exports (the per-group twin
    of the global weighted ``weighted_sample_ares``).  md5 order is
    uniform and engine-stable; doc_id tiebreak makes the total order
    unique.  One shuffle on source; the rank window never sees more than
    one group per partition."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _SAMPLE_K)
        .select("source", "doc_id", F.col("rk").cast("bigint").alias("rk"))
        .orderBy("source", "rk")
    )


def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing window functions (percent_rank / cume_dist /
    ntile) over per-customer order values — completes the window-function
    family next to rank/row_number/ntile-by-metric.  The ORDER BY carries
    a unique tiebreak (price, orderkey) so every rank-derived value is
    deterministic; percent_rank and cume_dist are exact rationals from
    identical formulas in both engines.  Partitioned window — scales with
    the partition count."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 500)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


_T = X.sql_tokens("text")


def cross_source_duplicate_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mirroring matrix: for every pair of sources, how many
    duplicate clusters span BOTH — the audit that finds mirror sites and
    syndication networks so crawl budget isn't spent re-fetching the same
    content under different hosts (dedup_rate_by_source scores sources
    in isolation; this is the pairwise structure).  Copies are planted
    under a synthetic ``mirror`` source (same planted scheme as the dedup
    family, different source label) so every planted cluster is
    cross-source by construction; organic cross-source clusters add to it
    at larger SFs.

    Scale shape: one map-side-combined shuffle groups by fingerprint
    collecting the DISTINCT source set (bounded by |sources|, a catalog);
    pair expansion is a map-only double-explode of those tiny arrays
    (≤ |sources|² per cluster, in practice 2-3); the final (a,b) rollup
    is over ≤ |sources|² cells.  Exact integers throughout."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    planted = (
        docs.filter(F.col("doc_id") % _EXACT_MOD == 0)
        .select(
            (F.col("doc_id") + _EXACT_OFFSET).alias("doc_id"),
            F.lit("mirror").alias("source"),
            "text",
        )
    )
    base = docs.unionByName(planted)
    clusters = (
        base.select(X.fingerprint(F.col("text")).alias("fp"), "source")
        .groupBy("fp")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
    )
    pairs = (
        clusters.select(F.explode("srcs").alias("src_a"), "srcs")
        .select("src_a", F.explode("srcs").alias("src_b"))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    return (
        pairs.groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_fps"))
        .orderBy("src_a", "src_b")
    )


_FUZZY_OFFSET = 600000   # planted typo-variant doc_id offset
_FUZZY_MOD = 41          # doc_id % _FUZZY_MOD == 0 gets a typo variant


def fuzzy_title_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching (edit distance with blocking) over document
    titles — the entity-resolution primitive none of the hash-based dedup
    family can express (a one-character typo changes every hash).  The
    second of the repo's two blocking strategies: relational3's
    ``fuzzy_pairs_levenshtein`` uses SymSpell deletion neighborhoods
    (COMPLETE recall, but only for distance ≤ 1 and ×(L+1) candidate
    blow-up); this one trades recall (prefix edits missed) for distance
    ≤ 2 at constant per-row cost.  Title =
    first 5 tokens; variants with an appended character are PLANTED
    (``doc_id % 41``) so distance-1 pairs exist by construction; pairs are
    emitted when Levenshtein ≤ 2 within a block.

    Blocking contract (the standard entity-resolution trade, stated
    honestly): candidates share their FIRST-4-TOKEN prefix, so edits
    inside the prefix are not recalled — recall is guaranteed only for
    edits in the tail (where the variants are planted).  In exchange the
    join is equi on the prefix: block sizes are bounded by
    duplicate-family sizes, never corpus size, so the within-block
    quadratic never materializes.  Levenshtein runs only on candidate
    pairs (classic DP, engine-identical); outputs are exact integers."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", X.tokens(F.col("text")).alias("t"))
        .filter(F.size("t") >= 5)
    )
    titles = docs.select(
        "doc_id",
        F.concat_ws(" ", F.slice("t", 1, 5)).alias("title"),
        F.concat_ws(" ", F.slice("t", 1, 4)).alias("blk"),
    )
    variants = titles.filter(F.col("doc_id") % _FUZZY_MOD == 0).select(
        (F.col("doc_id") + _FUZZY_OFFSET).alias("doc_id"),
        F.concat(F.col("title"), F.lit("x")).alias("title"),
        "blk",
    )
    pool = titles.unionByName(variants)
    a = pool.select(
        F.col("doc_id").alias("a_id"), F.col("title").alias("a_title"), "blk"
    )
    b = pool.select(
        F.col("doc_id").alias("b_id"), F.col("title").alias("b_title"),
        F.col("blk").alias("b_blk"),
    )
    return (
        a.join(b, (F.col("blk") == F.col("b_blk")) & (F.col("a_id") < F.col("b_id")))
        .select(
            "a_id",
            "b_id",
            F.levenshtein("a_title", "b_title").cast("bigint").alias("dist"),
            (F.col("b_id") == F.col("a_id") + _FUZZY_OFFSET).alias("planted"),
        )
        .filter(F.col("dist") <= 2)
        .orderBy("a_id", "b_id")
    )


def embedding_quality_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal curation audit: join the text-quality gate to the
    embedding-norm outlier flag for every document that HAS an embedding
    (``embeddings.vec_id`` is the doc id of the embedded subset) and
    report the 2×2 contingency — the check that text filters and vector
    filters agree before a pipeline trusts either alone.  The only query
    in the registry joining the two LLM tables.

    Exactness: the quality gate is an integer token-count decision; the
    norm² is an order-independent DECIMAL sum of per-element double
    squares; the outlier threshold is the DISCRETE p90 of those exact
    decimals (pure order statistic, engine-identical); counts and ppm
    shares are bigint.  Scale shape: norm² is one map-side-combined
    64-per-row explode agg, persisted via the shared registry because
    BOTH the threshold aggregate and the flag projection consume it
    (Catalyst shares no common subplans — unpersisted, the explode runs
    twice); the threshold is a 1-row broadcast; the doc⋈vec join is an
    equi hash join AQE can broadcast (the embedded subset is the small
    side by construction)."""
    from hadrodb_spark.operators import shared

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", (X.token_count(F.col("text")) >= 40).alias("good")
    )
    norm2 = shared.shared_persist(
        ("embedding_norm2", spark.sparkContext.applicationId, sf_dir),
        lambda: (
            load(spark, sf_dir, "embeddings")
            .select("vec_id", F.posexplode("embedding").alias("pos", "v"))
            .select("vec_id", F.col("v").cast("double").alias("vd"))
            .groupBy("vec_id")
            .agg(
                F.sum((F.col("vd") * F.col("vd")).cast("decimal(38,18)")).alias("norm2")
            )
        ),
    )
    th = norm2.agg(
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY norm2)").alias("p90")
    )
    flags = norm2.crossJoin(F.broadcast(th)).select(
        "vec_id", (F.col("norm2") > F.col("p90")).alias("outlier")
    )
    cells = (
        docs.join(flags, docs.doc_id == flags.vec_id)
        .groupBy("good", "outlier")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy("good")
    return cells.select(
        "good",
        "outlier",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_docs").over(w).cast("bigint").alias("good_total"),
        F.expr(
            "CAST((1000000 * n_docs) DIV (SUM(n_docs) OVER (PARTITION BY good))"
            " AS BIGINT)"
        ).alias("share_ppm"),
    ).orderBy("good", "outlier")


ORACLE: dict[str, str] = {
    "split_leakage_audit": f"""
        WITH base AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + {_EXACT_OFFSET} AS doc_id, text
          FROM documents WHERE doc_id % {_EXACT_MOD} = 0
        ),
        tagged AS (
          SELECT {X.sql_fingerprint('text')} AS fp,
                 CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < {_TRAIN_HEX}
                      THEN 'train'
                      WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < {_VAL_HEX}
                      THEN 'val' ELSE 'test' END AS split
          FROM base
        ),
        per_fp AS (
          SELECT fp,
                 SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train,
                 SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS n_val,
                 SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS n_test
          FROM tagged GROUP BY fp
        ),
        agg AS (
          SELECT CAST(SUM(n_train) AS BIGINT) AS n_train_docs,
                 CAST(SUM(n_val) AS BIGINT) AS n_val_docs,
                 CAST(SUM(n_test) AS BIGINT) AS n_test_docs,
                 CAST(COUNT(CASE WHEN n_train > 0 AND n_val > 0 THEN 1 END)
                      AS BIGINT) AS shared_fp_train_val,
                 CAST(COUNT(CASE WHEN n_train > 0 AND n_test > 0 THEN 1 END)
                      AS BIGINT) AS shared_fp_train_test,
                 CAST(COUNT(CASE WHEN n_val > 0 AND n_test > 0 THEN 1 END)
                      AS BIGINT) AS shared_fp_val_test,
                 CAST(SUM(CASE WHEN n_train > 0 THEN n_val ELSE 0 END)
                      AS BIGINT) AS leaked_val_docs,
                 CAST(SUM(CASE WHEN n_train > 0 OR n_val > 0 THEN n_test ELSE 0 END)
                      AS BIGINT) AS leaked_test_docs
          FROM per_fp
        )
        SELECT *,
               CAST((1000000 * leaked_val_docs) // n_val_docs AS BIGINT)
                 AS leak_val_ppm,
               CAST((1000000 * leaked_test_docs) // n_test_docs AS BIGINT)
                 AS leak_test_ppm
        FROM agg
    """,
    "source_ks_shift": f"""
        WITH docs AS (
          SELECT source, LEAST(n_chars, {_KS_CAP}) AS n_chars FROM documents
        ),
        counts AS (
          SELECT source, n_chars, COUNT(*) AS c
          FROM docs GROUP BY source, n_chars
        ),
        totals AS (
          SELECT source, COUNT(*) AS n_s FROM docs GROUP BY source
        ),
        vals AS (SELECT DISTINCT n_chars FROM docs),
        gcum AS (
          SELECT n_chars,
                 SUM(c_all) OVER (ORDER BY n_chars) AS cum_all,
                 SUM(c_all) OVER () AS n_total
          FROM (SELECT n_chars, COUNT(*) AS c_all FROM docs GROUP BY n_chars)
        ),
        grid AS (
          SELECT t.source, v.n_chars, t.n_s,
                 SUM(COALESCE(c.c, 0)) OVER (
                   PARTITION BY t.source ORDER BY v.n_chars
                 ) AS cum_s
          FROM totals t CROSS JOIN vals v
          LEFT JOIN counts c ON c.source = t.source AND c.n_chars = v.n_chars
        )
        SELECT source,
               CAST(MIN(n_s) AS BIGINT) AS n_docs,
               CAST(MAX(ABS(cum_s * n_total - cum_all * n_s)) AS BIGINT) AS ks_num,
               CAST((1000000 * MAX(ABS(cum_s * n_total - cum_all * n_s)))
                    // (MIN(n_s) * MIN(n_total)) AS BIGINT) AS ks_ppm
        FROM grid g JOIN gcum USING (n_chars)
        GROUP BY source
        ORDER BY source
    """,
    "autocorr_daily": f"""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 SUM(CAST(ROUND(value * 100) AS BIGINT)) AS total
          FROM events GROUP BY 1, 2
        ),
        pairs AS (
          SELECT event_type,
                 LAG(total) OVER (PARTITION BY event_type ORDER BY day) AS x,
                 total AS y
          FROM daily
        ),
        agg AS (
          SELECT event_type, COUNT(*) AS n,
                 SUM(CAST(x AS DECIMAL(38,0))) AS sx,
                 SUM(CAST(y AS DECIMAL(38,0))) AS sy,
                 SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
                 SUM(CAST(y * y AS DECIMAL(38,0))) AS syy,
                 SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy
          FROM pairs WHERE x IS NOT NULL
          GROUP BY event_type
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_pairs,
               CASE WHEN {_AC_DEN} = 0 THEN NULL
                    ELSE ROUND({_AC_NUM} / {_AC_DEN}, 6) END AS r
        FROM agg
        ORDER BY event_type
    """,
    "skyline_parts": """
        WITH p AS (
          SELECT p_brand, p_partkey,
                 CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents,
                 CAST(p_size AS BIGINT) AS size
          FROM part
        )
        SELECT a.p_brand, a.p_partkey, a.cents, a.size
        FROM p a
        WHERE NOT EXISTS (
          SELECT 1 FROM p b
          WHERE b.p_brand = a.p_brand
            AND b.cents <= a.cents AND b.size >= a.size
            AND (b.cents < a.cents OR b.size > a.size)
        )
        ORDER BY a.p_brand, a.p_partkey
    """,
    "heaps_law_fit": f"""
        WITH maxd AS (SELECT MAX(doc_id) AS mx FROM documents),
        terms AS (
          SELECT term, MIN(doc_id) AS fd
          FROM (SELECT doc_id, UNNEST({_T}) AS term FROM documents)
          GROUP BY term
        ),
        vocab_b AS (
          SELECT LEAST((fd * 10) // (mx + 1), 9) AS bucket,
                 COUNT(*) AS new_terms
          FROM terms, maxd GROUP BY 1
        ),
        tokens_b AS (
          SELECT LEAST((doc_id * 10) // (mx + 1), 9) AS bucket,
                 SUM(len({_T})) AS toks
          FROM documents, maxd GROUP BY 1
        ),
        pts AS (
          SELECT CAST(ROUND(LN(cum_tokens), 6) AS DECIMAL(18,6)) AS x,
                 CAST(ROUND(LN(cum_vocab), 6) AS DECIMAL(18,6)) AS y,
                 cum_tokens, cum_vocab
          FROM (
            SELECT t.bucket,
                   SUM(t.toks) OVER (ORDER BY t.bucket) AS cum_tokens,
                   SUM(COALESCE(v.new_terms, 0)) OVER (ORDER BY t.bucket)
                     AS cum_vocab
            FROM tokens_b t LEFT JOIN vocab_b v ON t.bucket = v.bucket
          )
        ),
        agg AS (
          SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * x) AS sxx, SUM(x * y) AS sxy,
                 MAX(cum_tokens) AS total_tokens,
                 MAX(cum_vocab) AS total_vocab
          FROM pts
        )
        SELECT CAST(n AS BIGINT) AS n_points,
               CAST(total_tokens AS BIGINT) AS total_tokens,
               CAST(total_vocab AS BIGINT) AS total_vocab,
               CASE WHEN {_HEAPS_DEN} = 0 THEN NULL
                    ELSE ROUND({_HEAPS_NUM} / {_HEAPS_DEN}, 6) END AS beta,
               CASE WHEN {_HEAPS_DEN} = 0 THEN NULL
                    ELSE ROUND((CAST(sy AS DOUBLE) - {_HEAPS_NUM} / {_HEAPS_DEN}
                         * CAST(sx AS DOUBLE)) / n, 6) END AS log_k
        FROM agg
    """,
    "embedding_dim_covariance": f"""
        WITH ex AS (
          SELECT i, j,
                 CAST(embedding[i] AS DOUBLE) AS vi,
                 CAST(embedding[j] AS DOUBLE) AS vj
          FROM (SELECT embedding, len(embedding) AS L FROM embeddings) e,
               LATERAL (SELECT UNNEST(generate_series(1, e.L)) AS i) t1,
               LATERAL (SELECT UNNEST(generate_series(1, e.L)) AS j) t2
          WHERE i < j
        ),
        prods AS (
          SELECT i AS dim_a, j AS dim_b, COUNT(*) AS n,
                 SUM(CAST(vi * vj AS DECIMAL(38,18))) AS s
          FROM ex GROUP BY i, j
        ),
        means AS (
          SELECT dim, SUM(CAST(vd AS DECIMAL(28,10))) AS s1
          FROM (
            SELECT UNNEST(generate_series(1, len(embedding))) AS dim,
                   UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS vd
            FROM embeddings
          )
          GROUP BY dim
        )
        SELECT CAST(dim_a AS BIGINT) AS dim_a,
               CAST(dim_b AS BIGINT) AS dim_b,
               CAST(n AS BIGINT) AS n,
               ROUND({_DIM_COV}, 6) AS cov
        FROM (
          SELECT p.dim_a, p.dim_b, p.n, p.s,
                 a.s1 AS s1a, b.s1 AS s1b
          FROM prods p
          JOIN means a ON a.dim = p.dim_a
          JOIN means b ON b.dim = p.dim_b
        )
        ORDER BY ABS(ROUND({_DIM_COV}, 6)) DESC, dim_a, dim_b
        LIMIT 20
    """,
    "fuzzy_title_match": f"""
        WITH titles AS (
          SELECT doc_id,
                 array_to_string(list_slice(tk, 1, 5), ' ') AS title,
                 array_to_string(list_slice(tk, 1, 4), ' ') AS blk
          FROM (SELECT doc_id, {X.sql_tokens('text')} AS tk FROM documents)
          WHERE len(tk) >= 5
        ),
        pool AS (
          SELECT doc_id, title, blk FROM titles
          UNION ALL
          SELECT doc_id + {_FUZZY_OFFSET} AS doc_id, title || 'x' AS title, blk
          FROM titles WHERE doc_id % {_FUZZY_MOD} = 0
        )
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist,
               (b.doc_id = a.doc_id + {_FUZZY_OFFSET}) AS planted
        FROM pool a JOIN pool b
          ON a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE levenshtein(a.title, b.title) <= 2
        ORDER BY a_id, b_id
    """,
    "cross_source_duplicate_matrix": f"""
        WITH base AS (
          SELECT doc_id, source, text FROM documents
          UNION ALL
          SELECT doc_id + {_EXACT_OFFSET} AS doc_id, 'mirror' AS source, text
          FROM documents WHERE doc_id % {_EXACT_MOD} = 0
        ),
        clusters AS (
          SELECT {X.sql_fingerprint('text')} AS fp,
                 list_sort(list(DISTINCT source)) AS srcs
          FROM base GROUP BY 1
          HAVING len(list(DISTINCT source)) >= 2
        ),
        pairs AS (
          SELECT a.src_a, b.src_b
          FROM (SELECT UNNEST(srcs) AS src_a, fp FROM clusters) a
          JOIN (SELECT UNNEST(srcs) AS src_b, fp FROM clusters) b USING (fp)
          WHERE a.src_a < b.src_b
        )
        SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_shared_fps
        FROM pairs GROUP BY src_a, src_b
        ORDER BY src_a, src_b
    """,
    "embedding_quality_join": f"""
        WITH docs AS (
          SELECT doc_id, CAST(len({X.sql_tokens('text')}) AS BIGINT) >= 40 AS good
          FROM documents
        ),
        norm2 AS (
          SELECT vec_id, SUM(CAST(vd * vd AS DECIMAL(38,18))) AS norm2
          FROM (
            SELECT vec_id,
                   UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS vd
            FROM embeddings
          )
          GROUP BY vec_id
        ),
        th AS (SELECT quantile_disc(norm2, 0.9) AS p90 FROM norm2),
        flags AS (
          SELECT vec_id, norm2 > p90 AS outlier FROM norm2, th
        ),
        cells AS (
          SELECT good, outlier, COUNT(*) AS n_docs
          FROM docs JOIN flags ON docs.doc_id = flags.vec_id
          GROUP BY good, outlier
        )
        SELECT good, outlier,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(SUM(n_docs) OVER (PARTITION BY good) AS BIGINT) AS good_total,
               CAST((1000000 * n_docs) // (SUM(n_docs) OVER (PARTITION BY good))
                    AS BIGINT) AS share_ppm
        FROM cells
        ORDER BY good, outlier
    """,
    "fragment_stitch": f"""
        WITH elig AS (
          SELECT doc_id, {_T} AS t, len({_T}) AS n
          FROM documents
        ),
        frags AS (
          SELECT doc_id + {_FRAG_A} AS doc_id,
                 array_to_string(list_slice(t, 1, (n // 2) + 8), ' ') AS text
          FROM elig WHERE n >= 48 AND doc_id % 61 = 0
          UNION ALL
          SELECT doc_id + {_FRAG_B} AS doc_id,
                 array_to_string(list_slice(t, (n // 2) - 7, n), ' ') AS text
          FROM elig WHERE n >= 48 AND doc_id % 61 = 0
        ),
        corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id, text FROM frags
        ),
        fps AS (
          SELECT doc_id,
                 md5(array_to_string(list_slice(tk, 1, 16), ' ')) AS head_fp,
                 md5(array_to_string(list_slice(tk, len(tk) - 15, len(tk)), ' '))
                   AS tail_fp
          FROM (SELECT doc_id, {X.sql_tokens('text')} AS tk FROM corpus)
          WHERE len(tk) >= 32
        )
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               (b.doc_id = a.doc_id + {_FRAG_B - _FRAG_A}) AS planted
        FROM fps a JOIN fps b
          ON a.tail_fp = b.head_fp AND a.doc_id <> b.doc_id
        ORDER BY a_id, b_id
    """,
    "group_uniform_sample": f"""
        SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
        FROM (
          SELECT source, doc_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ) AS rk
          FROM documents
        )
        WHERE rk <= {_SAMPLE_K}
        ORDER BY source, rk
    """,
    "window_percent_rank": """
        SELECT o_custkey, o_orderkey,
               PERCENT_RANK() OVER w AS pr,
               CUME_DIST() OVER w AS cd,
               CAST(NTILE(4) OVER w AS BIGINT) AS quartile
        FROM orders
        WHERE o_custkey < 500
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    "embedding_dim_stats": f"""
        WITH ex AS (
          SELECT UNNEST(generate_series(1, len(embedding))) AS dim,
                 UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS vd
          FROM embeddings
        ),
        agg AS (
          SELECT dim, COUNT(*) AS n,
                 SUM(CAST(vd AS DECIMAL(28,10))) AS s1,
                 SUM(CAST(vd * vd AS DECIMAL(38,18))) AS s2
          FROM ex GROUP BY dim
        )
        SELECT CAST(dim AS BIGINT) AS dim,
               CAST(n AS BIGINT) AS n,
               ROUND({_DIM_MEAN}, 6) AS mean,
               ROUND({_DIM_VAR}, 6) AS variance
        FROM agg
        ORDER BY dim
    """,
}
