"""Composite TPC-H-like SQL queries over registered collection views — the
multi-join analytical workload the reference delegates wholesale to its host
engine (Opteryx, ``/root/reference/README.md:5``). Each runs through
``spark.sql`` over temp views (the ANSI-SQL entry point), sharing one SQL
body with the DuckDB oracle so the parity check covers the text itself.

Scale notes per query:

- Q3 shape: the two selective filters (mktsegment, date) reach the scans;
  the filtered customer side broadcasts; the orders⋈lineitem join is the
  only real shuffle; TopK is TakeOrderedAndProject, never a full sort.
- Q5 shape: a 6-relation chain — region→nation→supplier are tiny dims that
  broadcast in sequence, so the single shuffle is customer⋈orders⋈lineitem
  on the fact keys; AQE reuses the exchange.
- Q18 shape: the HAVING subquery is a semi-join against an aggregated
  lineitem — partial aggregation map-side, one hash shuffle on l_orderkey,
  then the probe side reuses the same partitioning.
- Q7 shape: the nation dimension joins twice under different roles
  (supplier's vs customer's) — both broadcast; the selective nation IN
  filters prune before the fact shuffle.
- Q10 shape: returned-items top-k — the l_returnflag filter is pushed to
  the lineitem scan, customer/nation broadcast, TopK is TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadrodb_spark.operators.relational import load

_TABLES = ("customer", "orders", "lineitem", "supplier", "nation", "region")

_DEC = "CAST({c} AS DECIMAL(18,2))"
_REV = (
    f"SUM({_DEC.format(c='l_extendedprice')} * "
    f"(CAST(1 AS DECIMAL(18,2)) - {_DEC.format(c='l_discount')}))"
)

_Q3 = """
    SELECT l_orderkey,
           CAST(o_orderdate AS STRING) AS orderdate,
           CAST({rev} AS DOUBLE) AS revenue
    FROM {p}customer
    JOIN {p}orders ON c_custkey = o_custkey
    JOIN {p}lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""

_Q5 = """
    SELECT n_name,
           CAST({rev} AS DOUBLE) AS revenue
    FROM {p}customer
    JOIN {p}orders ON c_custkey = o_custkey
    JOIN {p}lineitem ON l_orderkey = o_orderkey
    JOIN {p}supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN {p}nation ON s_nationkey = n_nationkey
    JOIN {p}region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""

_Q18 = """
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS STRING) AS orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM {p}customer
    JOIN {p}orders ON c_custkey = o_custkey
    JOIN {p}lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM {p}lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
"""


def _run(spark: SparkSession, sf_dir: str, body: str) -> DataFrame:
    # timestamp→string rendering follows the session TZ; pin UTC so it
    # matches DuckDB's naive reading under any host TZ (same contract as
    # relational.load's events path)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for t in _TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(body.format(p="v_", rev=_REV))


def sql_tpch_q3_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping-priority top-k): 3-way join, two pushed
    filters, grouped revenue, deterministic top-10."""
    return _run(spark, sf_dir, _Q3)


def sql_tpch_q5_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local-supplier volume): 6-relation join with the
    customer-nation = supplier-nation colocation condition."""
    return _run(spark, sf_dir, _Q5)


def sql_tpch_q18_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): aggregated-subquery
    semi-join, re-aggregation on the probe side, deterministic top-100."""
    return _run(spark, sf_dir, _Q18)


ORACLE: dict[str, str] = {
    "sql_tpch_q3_like": _Q3.format(p="", rev=_REV),
    "sql_tpch_q5_like": _Q5.format(p="", rev=_REV),
    "sql_tpch_q18_like": _Q18.format(p="", rev=_REV),
}
