package graft.rel

import graft.QueryRegistry
import graft.io.Tables

/** SQL-parity surface: each query here is ONE ANSI text executed
  * verbatim by both `spark.sql` (over the registered temp views) and the
  * DuckDB oracle — the engine's SQL front end comes free via Catalyst
  * (SURVEY §7.3: "SQL comes free via createTempView + spark.sql").
  * Exercises the constructs the DataFrame registry doesn't: EXISTS / IN
  * / scalar subqueries and GROUPING SETS.
  */
object SqlQueries extends QueryRegistry {

  /** Register a query whose Spark plan IS the oracle text. */
  private def sqlQ(name: String, text: String): Unit = {
    val cleaned = text.stripMargin.trim
    q(name, cleaned) { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(cleaned)
    }
  }

  // TPC-H Q4 shape: EXISTS subquery → semi join.
  sqlQ("sql_q4_exists",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority""")

  // TPC-H Q10 shape: returned-items revenue per customer, top 20.
  sqlQ("sql_q10_returned",
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""")

  // TPC-H Q14 shape: conditional share inside a join-agg.
  sqlQ("sql_q14_promo_share",
    """SELECT round(100.0 *
      |         sum(CASE WHEN p_type = 'PROMO'
      |             THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
      |         sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1995-09-01'
      |  AND l_shipdate < TIMESTAMP '1995-10-01'""")

  // TPC-H Q18 shape: HAVING over a join-agg.
  sqlQ("sql_q18_large_orders",
    """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
      |       round(sum(l_quantity), 2) AS total_qty
      |FROM lineitem GROUP BY l_orderkey
      |HAVING sum(l_quantity) > 250""")

  // Scalar subquery in a predicate.
  sqlQ("sql_scalar_subquery",
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_acctbal
      |FROM customer
      |WHERE c_acctbal > 1.8 * (SELECT avg(c_acctbal) FROM customer)""")

  // IN subquery over a dimension chain.
  sqlQ("sql_in_subquery",
    """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name
      |FROM supplier
      |WHERE s_nationkey IN
      |  (SELECT n_nationkey FROM nation JOIN region
      |   ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE')""")

  // Explicit GROUPING SETS (beyond rollup/cube).
  sqlQ("sql_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")

  // TPC-H Q2 shape: correlated equality against a per-group extreme.
  sqlQ("sql_q2_corr_max",
    """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, s_acctbal
      |FROM supplier s1
      |WHERE s_acctbal = (SELECT max(s_acctbal) FROM supplier s2
      |                   WHERE s2.s_nationkey = s1.s_nationkey)""")

  // TPC-H Q7 shape: bi-nation volume by year.
  sqlQ("sql_q7_nation_volume",
    """SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
      |       CAST(year(l_shipdate) AS INT) AS yr,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      |  AND n2.n_name IN ('NATION_1', 'NATION_2')
      |  AND n1.n_name <> n2.n_name
      |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)""")

  // Correlated NOT EXISTS (anti join through SQL).
  sqlQ("sql_not_exists",
    """SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_brand
      |FROM part p
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_partkey = p_partkey)""")
}
