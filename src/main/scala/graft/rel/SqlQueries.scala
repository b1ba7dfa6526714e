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
  // Revenue in exact 1e-4-dollar units (prices are integral cents,
  // discounts integral percent — the sql_q9 rewrite): the sum is an
  // integer, so the value AND the top-20 cutoff order are independent
  // of engine and summation order.
  sqlQ("sql_q10_returned",
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |                (100 - CAST(round(l_discount * 100) AS BIGINT)))
      |            AS BIGINT) AS revenue_u
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue_u DESC, c_custkey LIMIT 20""")

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

  // TPC-H Q8 shape: national market share within a region by year —
  // the widest join tree in the suite (8 tables, nation twice).
  sqlQ("sql_q8_mkt_share",
    """SELECT CAST(year(o_orderdate) AS INT) AS yr,
      |       round(sum(CASE WHEN n2.n_name = 'NATION_3'
      |                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
      |             sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
      |FROM lineitem
      |JOIN orders    ON l_orderkey = o_orderkey
      |JOIN customer  ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region    ON n1.n_regionkey = r_regionkey
      |JOIN supplier  ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |JOIN part      ON l_partkey = p_partkey
      |WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
      |GROUP BY year(o_orderdate)""")

  // TPC-H Q9 shape: product-line profit by supplier nation and year
  // (no partsupp in the testdata star — cost proxied from retail price).
  // Output is an EXACT scaled integer (7·10⁴ × profit with cost =
  // retail·qty/7): prices/discounts/quantities are integral in
  // cents/percent/units, so every term is an exact int64 and the sum is
  // independent of summation order — a float sum here landed within
  // 1 ulp of a half-cent and the engines rounded opposite ways (twice).
  sqlQ("sql_q9_profit",
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS yr,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |                (100 - CAST(round(l_discount * 100) AS BIGINT)) * 7 -
      |                CAST(round(p_retailprice * 100) AS BIGINT) *
      |                CAST(l_quantity AS BIGINT) * 100) AS BIGINT) AS profit_u
      |FROM lineitem
      |JOIN part     ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN orders   ON l_orderkey = o_orderkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY n_name, year(o_orderdate)""")

  // TPC-H Q12 shape: late-shipment counts split by order priority
  // (interval arithmetic in the predicate).
  sqlQ("sql_q12_late_lines",
    """SELECT l_linestatus,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY l_linestatus""")

  // TPC-H Q15 shape: top-revenue supplier via a CTE referenced twice
  // (once joined, once under a scalar-subquery max). Revenue in exact
  // 1e-4-dollar units (sql_q9 pattern) — the max-equality predicate is
  // an integer compare, immune to cross-engine float-sum drift.
  sqlQ("sql_q15_top_supplier",
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |                  (100 - CAST(round(l_discount * 100) AS BIGINT)))
      |              AS BIGINT) AS total_revenue_u
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_revenue_u
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue_u = (SELECT max(total_revenue_u) FROM revenue)""")

  // TPC-H Q16 shape: distinct-supplier counts per part attribute combo,
  // with a NOT IN exclusion subquery (lineitem stands in for partsupp).
  sqlQ("sql_q16_supplier_cnt",
    """SELECT p_brand, p_type, p_size,
      |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17)
      |  AND l_suppkey NOT IN
      |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size""")

  // TPC-H Q19 shape: disjunctive OR-of-ANDs across both join sides —
  // exercises CNF conversion / partial predicate pushdown.
  sqlQ("sql_q19_disjunctive",
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)""")

  // TPC-H Q21 shape: suppliers who solely kept finished orders waiting —
  // EXISTS + correlated NOT EXISTS with a non-equi outer reference.
  sqlQ("sql_q21_waiting",
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 20""")

  // TPC-H Q11 shape: parts whose shipped value concentration exceeds a
  // global-share scalar subquery (lineitem stands in for partsupp).
  // Exact integer cents both sides -> identical comparison everywhere.
  sqlQ("sql_q11_value_parts",
    """SELECT CAST(l_partkey AS BIGINT) AS p_key,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |            AS BIGINT) AS value_cents
      |FROM lineitem
      |GROUP BY l_partkey
      |HAVING sum(CAST(round(l_extendedprice * 100) AS BIGINT)) >
      |  (SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)) * 0.0005
      |   FROM lineitem)""")

  // TPC-H Q13 shape: customer order-count distribution including
  // zero-order customers (left join with an ON-clause filter feeding a
  // two-level aggregation).
  sqlQ("sql_q13_custdist",
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |      FROM customer LEFT JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count""")

  // TPC-H Q17 shape: revenue from small-quantity lines vs a correlated
  // per-part average-quantity subquery. Quantities are integral, so the
  // correlated avg is an exact double on both engines; revenue reported
  // in exact integer cents.
  sqlQ("sql_q17_small_qty",
    """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |            AS BIGINT) AS revenue_cents
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#23'
      |  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = p_partkey)""")

  // TPC-H Q20 shape: suppliers who shipped enough of a part line —
  // IN over a grouped HAVING subquery.
  sqlQ("sql_q20_part_suppliers",
    """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'red%'
      |  GROUP BY l_suppkey HAVING sum(l_quantity) > 400)""")

  // TPC-H Q22 shape: above-average-balance customers gone idle (no
  // recent orders) — scalar subquery + correlated anti join with an
  // extra predicate, per market segment. (The pure "no orders at all"
  // variant is empty in this synthetic star: every customer orders.)
  sqlQ("sql_q22_idle_balance",
    """SELECT c_mktsegment AS segment,
      |       CAST(count(*) AS BIGINT) AS numcust,
      |       round(sum(c_acctbal), 2) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
      |                   WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY c_mktsegment""")
}
