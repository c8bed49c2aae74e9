"""Graph analytics over a derived co-purchase graph — the iterative /
self-join workload family (the reference delegates all query processing to
its host engine, ``/root/reference/README.md:5``; this rounds out the
repo's coverage of algorithms Spark expresses as DataFrame plans rather
than bespoke engines).

Graph: parts are nodes; an undirected edge connects two parts that appear
in the same order (capped to ``l_partkey < _PART_CAP`` so the sf0.01
fixture stays small — the PLAN shape is what scales, not the cap).

Scale design:
- Edge derivation: one self-join of lineitem on l_orderkey with the
  ``a < b`` ordering (each undirected edge materializes once), then
  distinct — two hash shuffles, both on bounded key sets.
- Triangles: the ordered-edge-list algorithm — join e1(a,b)⋈e2(b,c) then
  close with e3(a,c). Because edges are stored with a<b, every triangle is
  counted exactly once, and the join fan-out is bounded by the forward
  degree (at scale you'd order endpoints by degree, cutting the fan-out to
  O(m^1.5) — the id-ordering here is the same plan with a weaker bound).
- Reachability: native ``WITH RECURSIVE`` BFS (Spark 4.1's recursive-CTE
  support; UNION ALL dialect — Spark rejects UNION DISTINCT in recursion,
  so the frontier carries duplicate paths and the final GROUP BY dedups.
  The depth guard bounds the blow-up: path count ≤ Σ_d deg^d — depth 2,
  because on this dense fixture graph deg³ already trips Spark's
  recursion row limit. At 100 TB the
  same query runs with per-level DISTINCT materialization — the iterative
  DataFrame loop in operators/components.py is that plan; this entry
  exercises the SQL-native surface.)
- PageRank: FIXED-POINT integer arithmetic (PR scaled by 1e12, integer
  division by out-degree, integer 85% damping) — sums of integers are
  exact under any partitioning/accumulation order, which is what makes an
  iterative float algorithm oracle-matchable bit-for-bit. Three unrolled
  iterations; each is contributions-groupBy (one shuffle on dst) + a join
  back to the degree relation. At 100 TB the degree relation partitioning
  is reused across iterations and the loop runs to convergence with
  localCheckpoint per iter (see operators/components.py for the pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadrodb_spark.operators.relational import load

_PART_CAP = 400
_PR_SCALE = 10**12          # fixed-point scale
_PR_ITERS = 3
_PR_TOPK = 20


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected co-purchase edges, stored once with a < b."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") < _PART_CAP)
        .select("l_orderkey", "l_partkey")
    )
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("b"))
    return (
        a.join(b, "o")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count via the ordered edge list: e1(a,b) ⋈ e2(b,c) closed
    by e3(a,c); a<b<c means each triangle appears exactly once."""
    e = _edges(spark, sf_dir)
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    nodes = e.select(F.col("a").alias("n")).unionByName(
        e.select(F.col("b").alias("n"))
    ).distinct()
    return (
        tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
        .crossJoin(e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges")))
        .crossJoin(nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes")))
        .select("n_nodes", "n_edges", "n_triangles")
    )


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (damping 0.85, 3 unrolled iterations) over the
    undirected co-purchase graph; exact integer arithmetic end-to-end."""
    e = _edges(spark, sf_dir)
    # directed both ways for an undirected graph
    edges = e.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    pr = deg.select("src", F.lit(_PR_SCALE).cast("long").alias("pr"))
    base = int(0.15 * _PR_SCALE)
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(pr, "src")
            .join(deg, "src")
            .select("dst", F.expr("pr DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        pr = (
            deg.join(contrib, deg.src == contrib.dst, "left")
            .select(
                deg.src.alias("src"),
                (
                    F.lit(base)
                    + F.expr("COALESCE(inflow, 0) * 85 DIV 100")
                ).cast("long").alias("pr"),
            )
        )
    return (
        pr.orderBy(F.desc("pr"), "src")
        .limit(_PR_TOPK)
        .select(F.col("src").alias("part"), F.col("pr").alias("rank_fp"))
    )


_REACH_SEEDS = "1, 2"
_REACH_DEPTH = 2

# One SQL body shared verbatim between the Spark query (over v_ views) and
# the DuckDB oracle — the parity check covers the recursive text itself.
_REACH_SQL = f"""
    WITH RECURSIVE
    edges AS (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM {{p}}lineitem a JOIN {{p}}lineitem b
          ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey
          AND a.l_partkey < {_PART_CAP} AND b.l_partkey < {_PART_CAP}
    ),
    dir AS (
        SELECT a AS src, b AS dst FROM edges
        UNION ALL SELECT b, a FROM edges
    ),
    reach(node, depth) AS (
        SELECT DISTINCT src AS node, 0 AS depth
        FROM dir WHERE src IN ({_REACH_SEEDS})
        UNION ALL
        SELECT d.dst, r.depth + 1
        FROM reach r JOIN dir d ON d.src = r.node
        WHERE r.depth < {_REACH_DEPTH}
    )
    SELECT node,
           CAST(MIN(depth) AS INT) AS hops,
           CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM reach
    GROUP BY node
    ORDER BY hops, node
"""


def graph_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS reachability from a seed set via a native recursive CTE: per
    reached node, the hop distance (MIN over duplicate paths) and the
    ≤{depth}-hop path count — both deterministic under UNION ALL.

    Depth is 2 because UNION ALL recursion carries the full path multiset
    (Spark rejects UNION DISTINCT in recursion): on a dense co-purchase
    graph the depth-d frontier is O(deg^d) rows; the _PART_CAP edge bound
    plus depth 2 keep the frontier far below Spark's recursion row limit,
    so the default limit suffices — a caller pushing depth/cap higher
    raises ``spark.sql.cteRecursionRowLimit`` in their own session.
    Production BFS at 100 TB dedups the frontier per level — that is the
    iterative DataFrame loop in operators/components.py.

    No recursion-limit override here: Spark reads
    ``spark.sql.cteRecursionRowLimit`` at EXECUTION (when the caller
    collects this lazy DataFrame), so a set-here/restore-in-finally pair
    would be a no-op by then — and a lingering session-wide override would
    silently change every later recursive query's safety limit.  The sizing
    argument above keeps the frontier under the default limit; callers
    pushing depth/cap beyond it must raise the conf in their own session
    for the query's lifetime."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(_REACH_SQL.format(p="v_"))


_EDGE_CTE = f"""
      edges AS (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey
          AND a.l_partkey < {_PART_CAP} AND b.l_partkey < {_PART_CAP}
      )
"""

ORACLE: dict[str, str] = {
    "graph_reachability": _REACH_SQL.format(p=""),
    "graph_triangles": f"""
        WITH {_EDGE_CTE},
        tri AS (
          SELECT COUNT(*) AS n_triangles
          FROM edges e1
          JOIN edges e2 ON e1.b = e2.a
          JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        nodes AS (
          SELECT COUNT(*) AS n_nodes FROM (
            SELECT a AS n FROM edges UNION SELECT b FROM edges
          )
        )
        SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
               CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
               CAST(n_triangles AS BIGINT) AS n_triangles
        FROM tri, nodes
    """,
    "graph_pagerank": f"""
        WITH {_EDGE_CTE},
        dir AS (
          SELECT a AS src, b AS dst FROM edges
          UNION ALL SELECT b, a FROM edges
        ),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM dir GROUP BY src),
        pr0 AS (SELECT src, CAST({_PR_SCALE} AS BIGINT) AS pr FROM deg),
        it1 AS (
          SELECT d.src,
                 CAST({int(0.15 * _PR_SCALE)}
                      + COALESCE(f.inflow, 0) * 85 // 100 AS BIGINT) AS pr
          FROM deg d LEFT JOIN (
            SELECT dir.dst, SUM(pr0.pr // deg.outdeg) AS inflow
            FROM dir JOIN pr0 ON dir.src = pr0.src
                     JOIN deg ON dir.src = deg.src
            GROUP BY dir.dst
          ) f ON d.src = f.dst
        ),
        it2 AS (
          SELECT d.src,
                 CAST({int(0.15 * _PR_SCALE)}
                      + COALESCE(f.inflow, 0) * 85 // 100 AS BIGINT) AS pr
          FROM deg d LEFT JOIN (
            SELECT dir.dst, SUM(it1.pr // deg.outdeg) AS inflow
            FROM dir JOIN it1 ON dir.src = it1.src
                     JOIN deg ON dir.src = deg.src
            GROUP BY dir.dst
          ) f ON d.src = f.dst
        ),
        it3 AS (
          SELECT d.src,
                 CAST({int(0.15 * _PR_SCALE)}
                      + COALESCE(f.inflow, 0) * 85 // 100 AS BIGINT) AS pr
          FROM deg d LEFT JOIN (
            SELECT dir.dst, SUM(it2.pr // deg.outdeg) AS inflow
            FROM dir JOIN it2 ON dir.src = it2.src
                     JOIN deg ON dir.src = deg.src
            GROUP BY dir.dst
          ) f ON d.src = f.dst
        )
        SELECT src AS part, pr AS rank_fp
        FROM it3 ORDER BY pr DESC, src LIMIT {_PR_TOPK}
    """,
}
