"""Round-7-queue pipeline operators, batch 2: seasonality indexing,
winsorized robust statistics, corpus-concentration auditing, gate
dependence (mutual information), and mixture upsampling.

Reference parity: the reference (mabel-dev/hadrodb, ``hadro/engine.py``)
stores records and defers analytics upstream; these are dataset-health /
mixture-engineering operators SURVEY.md §2.3 scopes on top of that store
— the questions a training-data team asks between refreshes: "is traffic
seasonal?", "what's the robust center once outliers are clamped?",
"is the corpus dominated by one source?", "are my two quality gates
redundant?", "materialize the rebalanced epochs".

All five follow the repo's exact-arithmetic discipline: integer counts
and fixed-point ppm ratios via integer DIV (non-negative operands only —
Spark DIV truncates, DuckDB ``//`` floors; they agree only on
non-negatives), data-valued discrete percentiles, any transcendental
evaluated once per row under ONE shared op-order text and rounded at 6
before an exact DECIMAL sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadrodb_spark.functions import text as X
from hadrodb_spark.operators.relational import load

# --- seasonal_dow_index -------------------------------------------------
# Day-of-week derived from epoch-day arithmetic, NOT the engines' dayofweek
# functions (Spark: 1=Sunday..7; DuckDB: 0=Sunday..6 — a silent off-by-one
# trap).  Epoch day 0 (1970-01-01) was a Thursday, so (epoch_day + 3) % 7
# yields 0=Monday..6=Sunday identically on both engines; epoch seconds are
# non-negative for every fixture date, so truncating vs flooring division
# never diverges.
_DOW = "((CAST(FLOOR({epoch} / 86400) AS BIGINT) + 3) % 7)"


def seasonal_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index per event type — the classic traffic
    seasonality profile (index 1e6 = that weekday carries exactly its
    uniform 1/7 share; > 1e6 = over-indexed).  The multiplicative
    counterpart of ``autocorr_daily``'s additive lag view.

    Exactness: per-(type, dow) counts are exact integers from ONE
    map-side-combined aggregate; the index is fixed-point ppm
    ``(7e6 * n) DIV total`` over non-negative bigints.

    Scale shape: one scan into a (type, dow) count relation — bounded by
    |types| × 7 at ANY corpus size; the per-type total is a window over
    that tiny relation, never over raw rows.  Map-only otherwise.
    """
    ev = load(spark, sf_dir, "events")
    counts = (
        ev.select(
            "event_type",
            F.expr(_DOW.format(epoch="unix_micros(ts) DIV 1000000")).alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    totals = counts.groupBy("event_type").agg(F.sum("n_events").alias("total"))
    return (
        counts.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "dow",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.expr("CAST((7000000 * n_events) DIV total AS BIGINT)").alias(
                "index_ppm"
            ),
        )
        .orderBy("event_type", "dow")
    )


# --- winsorized_stats ----------------------------------------------------


def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clamped) order-value statistics per order priority —
    the robust-center report: clamp each value into the group's
    [p05, p95] DISCRETE percentiles, then average.  The standard defence
    against heavy-tailed spend distributions skewing per-segment KPIs;
    complements ``anomaly_mad`` (which flags the outliers this clamps).

    Exactness: values are exact integer cents; p05/p95 are data-valued
    discrete percentiles (order statistics — engine-exact, same
    convention ``length_gate_disc`` verified); the winsorized mean is an
    exact integer-cents floor division of non-negative operands.

    Scale shape: one keyed aggregate computes the per-group percentiles
    (order-statistic buffer bounded by the distinct-cents domain per
    group); the tiny |priorities|-row threshold relation broadcasts back
    onto a second scan for the clamp + sum.  Two scans, zero windows
    over raw rows, no sort of the corpus.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    th = orders.groupBy("o_orderpriority").agg(
        F.expr(
            "CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY cents) AS BIGINT)"
        ).alias("lo_cents"),
        F.expr(
            "CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY cents) AS BIGINT)"
        ).alias("hi_cents"),
    )
    return (
        orders.join(F.broadcast(th), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.first("lo_cents").alias("lo_cents"),
            F.first("hi_cents").alias("hi_cents"),
            F.sum(
                F.expr("GREATEST(lo_cents, LEAST(hi_cents, cents))")
            ).alias("wsum"),
            F.sum(
                F.when(F.col("cents") < F.col("lo_cents"), 1)
                .when(F.col("cents") > F.col("hi_cents"), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_clamped"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            "lo_cents",
            "hi_cents",
            "n_clamped",
            F.expr("CAST(wsum DIV n_orders AS BIGINT)").alias(
                "winsorized_mean_cents"
            ),
        )
        .orderBy("o_orderpriority")
    )


# --- source_concentration ------------------------------------------------
# Gini over the SORTED per-source counts: with c_1 ≤ … ≤ c_n and N = Σc,
# gini = (2·Σ i·c_i − (n+1)·N) / (n·N) ∈ [0, 1−1/n].  Every operand is a
# non-negative bigint; the numerator is ≥ 0 exactly when sorted ascending,
# so ppm fixed-point via DIV is engine-exact.  Bound: the scaled numerator
# (≤ (n−1)·N·1e6) must fit bigint — fine through n·N < 9.2e12, i.e. a
# trillion-document corpus with thousands of sources; beyond that, swap
# the two sums to DECIMAL(38,0) (documented, not needed at any test SF).
_HHI_SCALE = 1_000_000


def source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus concentration audit across sources: Gini coefficient, HHI
    (Herfindahl–Hirschman index), and the top source's share — the
    one-row report that tells a mixture engineer whether the corpus is
    effectively one source wearing a hat (HHI > 0.25 ≈ antitrust
    "highly concentrated").  Pairs with ``mixture_weights`` (which
    *fixes* the imbalance this measures).

    Exactness: per-source counts are exact; Gini uses the sorted-rank
    identity over integer sums (see header note — zero floats anywhere);
    HHI is the sum of squared fixed-point ppm shares, floor-divided back
    to ppm, a shared op order on both engines.

    Scale shape: ONE map-side-combined groupBy(source) reduces the corpus
    to |sources| rows; the rank window, both sums, and the final
    arithmetic all run on that catalog-sized relation.  A global
    ``Window.orderBy`` appears ONLY over the aggregated |sources|-row
    relation — never over raw rows (the ``score_auc_dup`` discipline).
    """
    docs = load(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql.window import Window

    ranked = per_src.select(
        "source",
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").asc(), F.col("source").asc()))
        .alias("i"),
        F.expr(
            f"CAST(({_HHI_SCALE} * c) DIV (SUM(c) OVER ()) AS BIGINT)"
        ).alias("share_ppm"),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.sum("c").cast("bigint").alias("n_docs"),
        F.max("share_ppm").cast("bigint").alias("top_share_ppm"),
        F.sum(F.expr("i * c")).alias("s_ic"),
        F.sum(F.expr("share_ppm * share_ppm")).alias("s_sq"),
    ).select(
        "n_sources",
        "n_docs",
        "top_share_ppm",
        F.expr(
            "CAST((1000000 * (2 * s_ic - (n_sources + 1) * n_docs))"
            " DIV (n_sources * n_docs) AS BIGINT)"
        ).alias("gini_ppm"),
        F.expr(f"CAST(s_sq DIV {_HHI_SCALE} AS BIGINT)").alias("hhi_ppm"),
    )


# --- gate_mutual_information ---------------------------------------------
# Integer-threshold gates (no float-threshold margin concerns): A = long
# document (n_chars ≥ 500), B = token-rich (≥ 80 tokens under the repo's
# verified cross-engine tokenizer, functions/text.py).  The MI term is ONE
# shared float text — two divisions, one LN, one multiply in a fixed order
# — rounded at 6 and summed as exact DECIMAL over the contingency cells.
_MI_CHARS = 500
_MI_TOKENS = 80
_MI_TERM = (
    "CAST(ROUND((CAST(n AS DOUBLE) / total)"
    " * LN((CAST(n AS DOUBLE) * total)"
    " / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))), 6) AS DECIMAL(18,6))"
)


def gate_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between two curation gates — the
    redundancy check ``classifier_agreement_kappa`` asks in agreement
    terms, re-asked information-theoretically: if MI ≈ H(gate), one gate
    is the other wearing a hat and can be dropped from the funnel.

    Exactness: both gates compare exact integers against integer
    thresholds (no float-threshold adjacency risk); the 2×2 contingency
    is ONE map-side-combined aggregate; each cell's MI term is the shared
    fixed-op-order float text rounded at 6, summed as exact DECIMAL.
    Unobserved cells are simply absent from the contingency relation (a
    zero contribution on both engines); the CASE guard only covers a
    hypothetical zero-count row.

    Scale shape: one corpus scan into a ≤ 4-row contingency relation;
    marginals are windows over those 4 rows.  Map-only before the
    aggregate; no joins, no windows over raw rows.
    """
    docs = load(spark, sf_dir, "documents")
    cells = (
        docs.select(
            F.expr(f"CAST(n_chars >= {_MI_CHARS} AS INT)").alias("a"),
            (X.token_count(F.col("text")) >= _MI_TOKENS)
            .cast("int")
            .alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    enriched = cells.select(
        "a",
        "b",
        "n",
        F.expr("SUM(n) OVER ()").alias("total"),
        F.expr("SUM(n) OVER (PARTITION BY a)").alias("na"),
        F.expr("SUM(n) OVER (PARTITION BY b)").alias("nb"),
    )
    return enriched.agg(
        F.max("total").cast("bigint").alias("n_docs"),
        F.sum(F.expr("CASE WHEN a = 1 AND b = 1 THEN n ELSE 0 END"))
        .cast("bigint")
        .alias("n_11"),
        F.sum(F.expr("CASE WHEN a = 1 AND b = 0 THEN n ELSE 0 END"))
        .cast("bigint")
        .alias("n_10"),
        F.sum(F.expr("CASE WHEN a = 0 AND b = 1 THEN n ELSE 0 END"))
        .cast("bigint")
        .alias("n_01"),
        F.sum(F.expr("CASE WHEN a = 0 AND b = 0 THEN n ELSE 0 END"))
        .cast("bigint")
        .alias("n_00"),
        F.sum(F.expr(f"CASE WHEN n = 0 THEN CAST(0 AS DECIMAL(18,6)) ELSE {_MI_TERM} END"))
        .alias("mi_sum"),
    ).select(
        "n_docs",
        "n_11",
        "n_10",
        "n_01",
        "n_00",
        F.expr("ROUND(CAST(mi_sum AS DOUBLE), 6)").alias("mi_nats"),
    )


# --- upsample_epochs -------------------------------------------------------
# Balanced-mixture epoch factor: k_s = clamp(N DIV (|sources| · c_s), 1, 4)
# — an under-represented source (share < 1/|sources|) is repeated toward
# uniform, capped at 4 epochs (the "don't repeat data more than ~4×" rule
# of thumb from public LLM data-curation practice).  All operands
# non-negative bigints.
_EPOCH_CAP = 4


def upsample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the rebalanced training mixture: each document is
    repeated ``k(source)`` times (balanced-mixture factor above), and the
    per-source report proves the expansion really happened — the
    fingerprint sums ``doc_id · epoch`` over the EXPANDED rows, so a
    plan that shortcuts the explode cannot fake it.

    The deterministic-materialization counterpart of ``mixture_apply``
    (which reweights by rank); this one emits actual repeated rows, the
    form a training-shard writer consumes.

    Exactness: k is integer arithmetic on exact counts; the fingerprint
    and row counts are exact bigint sums.

    Scale shape: the per-source count relation is tiny and broadcasts
    back; the expansion is a map-side ``explode(sequence(1, k))`` — no
    shuffle grows with the expansion factor, and the final report is one
    map-side-combined aggregate over the expanded stream.  At 100 TB the
    expanded stream never materializes to disk: it flows straight into
    the consuming aggregate (or sink).
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    total = per_src.agg(
        F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("n_src")
    )
    k = per_src.crossJoin(F.broadcast(total)).select(
        "source",
        F.expr(
            f"CAST(LEAST({_EPOCH_CAP}, GREATEST(1,"
            " n_total DIV (n_src * c))) AS INT)"
        ).alias("k"),
    )
    expanded = docs.join(F.broadcast(k), "source").select(
        "source",
        "doc_id",
        F.explode(F.expr("sequence(1, k)")).alias("epoch"),
        "k",
    )
    return (
        expanded.groupBy("source")
        .agg(
            F.first("k").cast("bigint").alias("k_epochs"),
            F.countDistinct("doc_id").cast("bigint").alias("n_before"),
            F.count(F.lit(1)).cast("bigint").alias("n_after"),
            F.sum(F.expr("doc_id * epoch")).cast("bigint").alias("fingerprint"),
        )
        .orderBy("source")
    )


ORACLE: dict[str, str] = {
    "seasonal_dow_index": f"""
        WITH counts AS (
          SELECT event_type,
                 {_DOW.format(epoch="epoch(ts)")} AS dow,
                 COUNT(*) AS n_events
          FROM events GROUP BY 1, 2
        )
        SELECT event_type, dow,
               CAST(n_events AS BIGINT) AS n_events,
               CAST((7000000 * n_events)
                    // (SUM(n_events) OVER (PARTITION BY event_type))
                    AS BIGINT) AS index_ppm
        FROM counts
        ORDER BY event_type, dow
    """,
    "winsorized_stats": """
        WITH o AS (
          SELECT o_orderpriority,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        ),
        th AS (
          SELECT o_orderpriority,
                 CAST(quantile_disc(cents, 0.05) AS BIGINT) AS lo_cents,
                 CAST(quantile_disc(cents, 0.95) AS BIGINT) AS hi_cents
          FROM o GROUP BY o_orderpriority
        )
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MIN(lo_cents) AS BIGINT) AS lo_cents,
               CAST(MIN(hi_cents) AS BIGINT) AS hi_cents,
               CAST(SUM(CASE WHEN cents < lo_cents OR cents > hi_cents
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
               CAST(SUM(GREATEST(lo_cents, LEAST(hi_cents, cents)))
                    // COUNT(*) AS BIGINT) AS winsorized_mean_cents
        FROM o JOIN th USING (o_orderpriority)
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    "source_concentration": f"""
        WITH per_src AS (
          SELECT source, COUNT(*) AS c FROM documents GROUP BY source
        ),
        ranked AS (
          SELECT c,
                 ROW_NUMBER() OVER (ORDER BY c ASC, source ASC) AS i,
                 CAST(({_HHI_SCALE} * c) // (SUM(c) OVER ()) AS BIGINT)
                   AS share_ppm
          FROM per_src
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
               CAST(SUM(c) AS BIGINT) AS n_docs,
               CAST(MAX(share_ppm) AS BIGINT) AS top_share_ppm,
               CAST((1000000 * (2 * SUM(i * c) - (COUNT(*) + 1) * SUM(c)))
                    // (COUNT(*) * SUM(c)) AS BIGINT) AS gini_ppm,
               CAST(SUM(share_ppm * share_ppm) // {_HHI_SCALE} AS BIGINT)
                 AS hhi_ppm
        FROM ranked
    """,
    "gate_mutual_information": f"""
        WITH cells AS (
          SELECT CAST(n_chars >= {_MI_CHARS} AS INT) AS a,
                 CAST(CAST(len({X.sql_tokens("text")}) AS BIGINT)
                      >= {_MI_TOKENS} AS INT) AS b,
                 COUNT(*) AS n
          FROM documents GROUP BY 1, 2
        ),
        enriched AS (
          SELECT a, b, n,
                 SUM(n) OVER () AS total,
                 SUM(n) OVER (PARTITION BY a) AS na,
                 SUM(n) OVER (PARTITION BY b) AS nb
          FROM cells
        )
        SELECT CAST(MAX(total) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN n ELSE 0 END)
                    AS BIGINT) AS n_11,
               CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN n ELSE 0 END)
                    AS BIGINT) AS n_10,
               CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN n ELSE 0 END)
                    AS BIGINT) AS n_01,
               CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN n ELSE 0 END)
                    AS BIGINT) AS n_00,
               ROUND(CAST(SUM(CASE WHEN n = 0 THEN CAST(0 AS DECIMAL(18,6))
                                   ELSE {_MI_TERM} END) AS DOUBLE), 6)
                 AS mi_nats
        FROM enriched
    """,
    "upsample_epochs": f"""
        WITH per_src AS (
          SELECT source, COUNT(*) AS c FROM documents GROUP BY source
        ),
        tot AS (
          SELECT SUM(c) AS n_total, COUNT(*) AS n_src FROM per_src
        ),
        k AS (
          SELECT source,
                 CAST(LEAST({_EPOCH_CAP},
                            GREATEST(1, n_total // (n_src * c))) AS INT) AS k
          FROM per_src, tot
        ),
        expanded AS (
          SELECT d.source, d.doc_id, k.k,
                 unnest(generate_series(1, k.k)) AS epoch
          FROM documents d JOIN k USING (source)
        )
        SELECT source,
               CAST(MIN(k) AS BIGINT) AS k_epochs,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_before,
               CAST(COUNT(*) AS BIGINT) AS n_after,
               CAST(SUM(doc_id * epoch) AS BIGINT) AS fingerprint
        FROM expanded
        GROUP BY source
        ORDER BY source
    """,
}
