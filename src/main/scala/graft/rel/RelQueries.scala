package graft.rel

import graft.QueryRegistry
import graft.io.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The declared relational surface (SURVEY.md §2.1–2.6, §2.8): every
  * operator the reference exercises plus the harness-declared built-in
  * suite (joins, set ops, rollup/cube, ranking windows), each as an
  * idiomatic DataFrame combinator with a DuckDB oracle.
  *
  * Reference citations per operator are in SURVEY.md §2; the headline
  * analogs: temporal filter = `calculations/polytrend.py:458`, bbox
  * filter = `calculations/dbest.py:497`, tumbling mean composite =
  * `calculations/polytrend.py:375-399` / `calculations/dbest.py:34-62`,
  * quality gate = `calculations/polytrend.py:284`, categorical stats =
  * `calculations/utils.py:37-64`, cumsum = `calculations/polytrend.py:79-80`.
  */
object RelQueries extends QueryRegistry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------- scans

  q("s1_scan_count",
    "SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem") { (s, d) =>
    t(s, d, "lineitem").agg(count(lit(1)).as("n_rows"))
  }

  q("s6_probe_first",
    """SELECT CAST(min(l_orderkey) AS BIGINT) AS first_key,
      |       CAST(count(*) AS BIGINT) AS n FROM lineitem""") { (s, d) =>
    t(s, d, "lineitem").agg(
      min("l_orderkey").as("first_key"), count(lit(1)).as("n"))
  }

  // --------------------------------------------------------------- filters

  // F1: temporal range filter (partition-prunable at scale).
  q("f1_time_range",
    """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
      |       CAST(o_orderdate AS DATE) AS od, o_totalprice
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o_orderdate <  TIMESTAMP '1996-01-01'""") { (s, d) =>
    t(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp_ntz"))
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"),
        col("o_totalprice"))
  }

  // F2: 2-D range (bbox analog: lon/lat between → two numeric betweens).
  q("f2_range_2d",
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_acctbal,
      |       CAST(c_nationkey AS INT) AS c_nationkey
      |FROM customer
      |WHERE c_acctbal BETWEEN 1000 AND 5000
      |  AND c_nationkey BETWEEN 5 AND 15""") { (s, d) =>
    t(s, d, "customer")
      .filter(col("c_acctbal").between(1000, 5000) &&
        col("c_nationkey").between(5, 15))
      .select("c_custkey", "c_acctbal", "c_nationkey")
  }

  // F3: band projection (column pruning reaches the scan).
  q("f3_projection",
    """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
      |       CAST(l_linenumber AS INT) AS l_linenumber, l_quantity
      |FROM lineitem WHERE l_orderkey < 1000""") { (s, d) =>
    t(s, d, "lineitem").filter(col("l_orderkey") < 1000)
      .select("l_orderkey", "l_linenumber", "l_quantity")
  }

  // F4 + A7: group-quality gate — drop a whole series if ANY value ≤ θ,
  // expressed as min-over-group (the water-mask semantics).
  q("f4_quality_gate",
    """SELECT CAST(user_id AS BIGINT) AS user_id,
      |       CAST(count(*) AS BIGINT) AS n, min(value) AS mn
      |FROM events GROUP BY user_id HAVING min(value) > 1.0""") { (s, d) =>
    t(s, d, "events").groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("value").as("mn"))
      .filter(col("mn") > 1.0)
  }

  // F5: equality selection.
  q("f5_equality",
    """SELECT CAST(event_id AS BIGINT) AS event_id,
      |       CAST(user_id AS BIGINT) AS user_id, value
      |FROM events WHERE event_type = 'purchase'""") { (s, d) =>
    t(s, d, "events").filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value")
  }

  // F6: column rename.
  q("f6_rename",
    """SELECT CAST(p_partkey AS BIGINT) AS pk, p_name AS pname,
      |       CAST(p_size AS INT) AS psize
      |FROM part WHERE p_size = 10""") { (s, d) =>
    t(s, d, "part").filter(col("p_size") === 10)
      .withColumnRenamed("p_partkey", "pk")
      .withColumnRenamed("p_name", "pname")
      .withColumnRenamed("p_size", "psize")
      .select("pk", "pname", "psize")
  }

  // F7 + A6 + W1-normalizer: computed column with window total
  // (pie-wedge angle = share * 2π, `calculations/polytrend.py:64-65`).
  q("f7_computed_angle",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       round(count(*) * 2 * pi() /
      |             (SELECT count(*) FROM events), 6) AS angle
      |FROM events GROUP BY event_type""") { (s, d) =>
    // share-of-total via a 1-row broadcast total, not an unpartitioned
    // window: same values, no single-partition window stage — so the
    // bench log's WindowExec warning channel stays clean for real
    // regressions (and this is the shape that scales anyway).
    val ev = t(s, d, "events")
    val total = ev.agg(count(lit(1)).as("total"))
    ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .withColumn("angle",
        round(col("n") * lit(2) * lit(math.Pi) / col("total"), 6))
      .drop("total")
  }

  // ----------------------------------------------------------------- joins

  q("j_inner",
    """SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust,
      |       round(sum(c_acctbal), 2) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""") { (s, d) =>
    t(s, d, "customer")
      .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("total_bal"))
  }

  q("j_left",
    """SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
      |       CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
      |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY c.c_custkey""") { (s, d) =>
    t(s, d, "customer").join(t(s, d, "orders"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n_orders"))
  }

  q("j_right",
    """SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
      |       round(coalesce(sum(o.o_totalprice), 0), 2) AS spend
      |FROM orders o RIGHT JOIN customer c ON c.c_custkey = o.o_custkey
      |GROUP BY c.c_custkey""") { (s, d) =>
    t(s, d, "orders").join(t(s, d, "customer"),
        col("c_custkey") === col("o_custkey"), "right")
      .groupBy("c_custkey")
      .agg(round(coalesce(sum("o_totalprice"), lit(0)), 2).as("spend"))
  }

  q("j_full",
    """WITH hc AS (SELECT c_nationkey AS k, count(*) AS n_cust
      |            FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
      |     hs AS (SELECT s_nationkey AS k, count(*) AS n_supp
      |            FROM supplier WHERE s_acctbal > 8000 GROUP BY 1)
      |SELECT CAST(coalesce(hc.k, hs.k) AS INT) AS nationkey,
      |       CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
      |       CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp
      |FROM hc FULL OUTER JOIN hs ON hc.k = hs.k""") { (s, d) =>
    val hc = t(s, d, "customer").filter(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey").as("ck")).agg(count(lit(1)).as("n_cust"))
    val hs = t(s, d, "supplier").filter(col("s_acctbal") > 8000)
      .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("n_supp"))
    hc.join(hs, col("ck") === col("sk"), "full")
      .select(coalesce(col("ck"), col("sk")).cast("int").as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }

  q("j_semi",
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 300000)""") { (s, d) =>
    val bigOrders = t(s, d, "orders").filter(col("o_totalprice") > 300000)
    t(s, d, "customer").join(bigOrders,
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
  }

  q("j_anti",
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_acctbal
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_totalprice > 300000)""") { (s, d) =>
    t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_acctbal")
  }

  q("j_cross",
    """SELECT r_name, s AS status FROM region
      |CROSS JOIN (SELECT DISTINCT o_orderstatus AS s FROM orders)""") { (s, d) =>
    t(s, d, "region").select("r_name")
      .crossJoin(t(s, d, "orders").select(col("o_orderstatus").as("status")).distinct())
  }

  // Broadcast join: dimension ships to every executor — no shuffle of the
  // fact side at 100 TB.
  q("j_broadcast",
    """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""") { (s, d) =>
    t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
  }

  // Theta join: equi key + inequality residual.
  q("j_theta",
    """SELECT CAST(s_nationkey AS INT) AS nationkey,
      |       CAST(count(*) AS BIGINT) AS n_pairs
      |FROM supplier JOIN customer
      |  ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
      |GROUP BY s_nationkey""") { (s, d) =>
    t(s, d, "supplier").join(t(s, d, "customer"),
        col("s_nationkey") === col("c_nationkey") &&
          col("s_acctbal") < col("c_acctbal"))
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Blocked fuzzy join (record linkage): near-matching part names
    * within a blocking key, scored by exact Levenshtein edit distance
    * (Spark `levenshtein` ≡ DuckDB `levenshtein` — integer, no float).
    * The block key (the name's noun token) turns the quadratic
    * all-pairs comparison into per-block candidate sets — the standard
    * linkage shape at scale: candidates = Σ block² ≪ n², and each
    * block's pair generation is one equi join. Canonical a<b ordering
    * needs no distinct.
    */
  q("j_fuzzy_leven",
    """WITH names AS (
      |  SELECT DISTINCT p_name, split_part(p_name, ' ', 2) AS blk
      |  FROM part)
      |SELECT a.blk, a.p_name AS name_a, b.p_name AS name_b,
      |       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
      |FROM names a JOIN names b
      |  ON a.blk = b.blk AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 4""") { (s, d) =>
    val names = t(s, d, "part")
      .select(col("p_name"), element_at(split(col("p_name"), " "), 2).as("blk"))
      .distinct()
    val a = names.select(col("blk"), col("p_name").as("name_a"))
    val b = names.select(col("blk"), col("p_name").as("name_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b") &&
        levenshtein(col("name_a"), col("name_b")) <= 4)
      .select(col("blk"), col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("int").as("dist"))
  }

  /** The fuzzy join again through the NATIVE banded-Levenshtein
    * expression ([[graft.functions.BoundedLevenshtein]] — codegen'd
    * O(k·len) band with early exit, vs the built-in's full O(len²)
    * table): `bounded_levenshtein(a,b,4) <= 4` selects exactly the
    * `levenshtein(a,b) <= 4` rows and returns the exact distance on
    * them, so the ORACLE IS THE SAME SQL as `j_fuzzy_leven` — two
    * implementations, one truth.
    */
  q("j_fuzzy_native",
    """WITH names AS (
      |  SELECT DISTINCT p_name, split_part(p_name, ' ', 2) AS blk
      |  FROM part)
      |SELECT a.blk, a.p_name AS name_a, b.p_name AS name_b,
      |       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
      |FROM names a JOIN names b
      |  ON a.blk = b.blk AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 4""") { (s, d) =>
    import graft.functions.BoundedLevenshtein.bounded_levenshtein
    val names = t(s, d, "part")
      .select(col("p_name"), element_at(split(col("p_name"), " "), 2).as("blk"))
      .distinct()
    val a = names.select(col("blk"), col("p_name").as("name_a"))
    val b = names.select(col("blk"), col("p_name").as("name_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b") &&
        bounded_levenshtein(col("name_a"), col("name_b"), 4) <= 4)
      .select(col("blk"), col("name_a"), col("name_b"),
        bounded_levenshtein(col("name_a"), col("name_b"), 4).cast("int")
          .as("dist"))
  }

  /** Record-linkage scoring over the blocked fuzzy join: same
    * block + `levenshtein ≤ 4` candidate set as `j_fuzzy_leven` (the
    * row set stays pinned by EXACT integer predicates — no float
    * threshold can disagree between engines), each surviving pair
    * scored with the native [[graft.functions.JaroWinkler]] codegen
    * expression, oracled against DuckDB's `jaro_winkler_similarity`
    * (semantics fuzz-pinned over 50k pairs; see JaroWinkler.scala).
    * round(…, 6) on both sides makes the doubles hash-comparable.
    */
  q("j_fuzzy_jaro",
    """WITH names AS (
      |  SELECT DISTINCT p_name, split_part(p_name, ' ', 2) AS blk
      |  FROM part)
      |SELECT a.blk, a.p_name AS name_a, b.p_name AS name_b,
      |       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
      |       round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
      |FROM names a JOIN names b
      |  ON a.blk = b.blk AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 4""") { (s, d) =>
    import graft.functions.BoundedLevenshtein.bounded_levenshtein
    import graft.functions.JaroWinkler.jaro_winkler
    val names = t(s, d, "part")
      .select(col("p_name"), element_at(split(col("p_name"), " "), 2).as("blk"))
      .distinct()
    val a = names.select(col("blk"), col("p_name").as("name_a"))
    val b = names.select(col("blk"), col("p_name").as("name_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b") &&
        bounded_levenshtein(col("name_a"), col("name_b"), 4) <= 4)
      .select(col("blk"), col("name_a"), col("name_b"),
        bounded_levenshtein(col("name_a"), col("name_b"), 4).cast("int")
          .as("dist"),
        round(jaro_winkler(col("name_a"), col("name_b")), 6).as("jw"))
  }

  /** Referential-integrity audit (the DQ companion to the semi/anti
    * join family): orphan counts across the three fact→dim edges —
    * each one anti-join + count, shuffled on 8-byte keys only. All
    * zeros on healthy data; the point is the plumbing that would catch
    * a broken ingest at 100 TB.
    */
  q("dq_referential",
    """SELECT 'lineitem_orders' AS edge, CAST((
      |  SELECT count(*) FROM lineitem l
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                    WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
      |  AS n_orphans
      |UNION ALL
      |SELECT 'lineitem_part', CAST((
      |  SELECT count(*) FROM lineitem l
      |  WHERE NOT EXISTS (SELECT 1 FROM part p
      |                    WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
      |UNION ALL
      |SELECT 'orders_customer', CAST((
      |  SELECT count(*) FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                    WHERE c.c_custkey = o.o_custkey)) AS BIGINT)""") {
    (s, d) =>
      def orphans(edge: String, fact: DataFrame, dim: DataFrame,
          fk: String, pk: String): DataFrame =
        fact.select(col(fk)).join(dim.select(col(pk)),
            col(fk) === col(pk), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
          .select(lit(edge).as("edge"), col("n_orphans"))
      orphans("lineitem_orders", t(s, d, "lineitem"), t(s, d, "orders"),
        "l_orderkey", "o_orderkey")
        .union(orphans("lineitem_part", t(s, d, "lineitem"),
          t(s, d, "part"), "l_partkey", "p_partkey"))
        .union(orphans("orders_customer", t(s, d, "orders"),
          t(s, d, "customer"), "o_custkey", "c_custkey"))
  }

  // ---------------------------------------------------- skew-join demo

  /** Deliberately hot join key: ~90% of lineitem collapses onto key 0,
    * joined to the matching collapsed part-key dimension, with an
    * md5-fingerprint aggregation over the joined rows (real per-row
    * work, riding the partial agg in the SAME task as the join probe —
    * so the hot reducer does 90% of all post-shuffle work). Both
    * variants force a SHUFFLE hash join — the regime where key skew
    * hurts (a broadcastable dim is the non-demo answer; AQE's skew
    * split only kicks in above its 256 MB partition threshold, far
    * beyond sf0.1, exactly like a merely-hot — not yet monstrous —
    * key at cluster scale). Salting is a pure plan rewrite, so one
    * oracle SQL checks both.
    */
  private val skewSql =
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |            AS BIGINT) AS cents,
      |       CAST(sum(CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),
      |            1, 8)) AS UBIGINT) % 1000) AS BIGINT) AS h
      |FROM (SELECT CASE WHEN l_partkey % 100 < 90 THEN 0
      |                  ELSE l_partkey END AS k,
      |             l_extendedprice, l_orderkey
      |      FROM lineitem) b
      |JOIN (SELECT DISTINCT CASE WHEN p_partkey % 100 < 90 THEN 0
      |                           ELSE p_partkey END AS k
      |      FROM part) s USING (k)"""

  private def skewBig(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").select(
      when(col("l_partkey") % 100 < 90, lit(0L))
        .otherwise(col("l_partkey")).as("k"),
      col("l_extendedprice"), col("l_orderkey"))

  private def skewSmall(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").select(
      when(col("p_partkey") % 100 < 90, lit(0L))
        .otherwise(col("p_partkey")).as("k")).distinct()

  private def skewAgg(joined: DataFrame): DataFrame =
    joined.agg(count(lit(1)).as("n"),
      sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"),
      sum(conv(substring(md5(col("l_orderkey").cast("string")), 1, 8),
        16, 10).cast("long") % 1000).as("h"))

  // Naive shuffle join: the hot key's ~540k rows (and their md5 agg
  // work) land in ONE reducer while the other 31 sit idle — the shape
  // that falls over first at 100×.
  q("skew_join_naive", skewSql) { (s, d) =>
    skewAgg(skewBig(s, d).join(skewSmall(s, d).hint("shuffle_hash"),
      Seq("k")))
  }

  // Salted rewrite ([[Skew.saltedInnerJoin]]): key becomes (k, salt)
  // with the small side replicated, spreading the hot key over 32
  // reducers. Same result, balanced shuffle.
  q("skew_join_salted", skewSql) { (s, d) =>
    skewAgg(Skew.saltedInnerJoin(skewBig(s, d),
      skewSmall(s, d).hint("shuffle_hash"), "k", "k", salt = 32)
      .select(col("l_extendedprice"), col("l_orderkey")))
  }

  // ------------------------------------------------------------ aggregates

  // A1 (monthly): the DBEST tumbling mean composite
  // (`calculations/dbest.py:34-62`) keyed by series id + month bucket.
  q("a1_monthly_composite",
    """SELECT CAST(user_id AS BIGINT) AS user_id,
      |       CAST(date_trunc('month', ts) AS DATE) AS month,
      |       round(avg(value), 6) AS avg_value,
      |       CAST(count(*) AS BIGINT) AS n_obs
      |FROM events GROUP BY 1, 2""") { (s, d) =>
    t(s, d, "events")
      .groupBy(col("user_id"),
        date_trunc("month", col("ts")).cast("date").as("month"))
      .agg(round(avg("value"), 6).as("avg_value"), count(lit(1)).as("n_obs"))
  }

  // A1 (annual): the PolyTrend annual composite
  // (`calculations/polytrend.py:375-399`).
  q("a1_annual_composite",
    """SELECT CAST(year(l_shipdate) AS INT) AS yr,
      |       round(avg(l_quantity), 6) AS avg_qty,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY 1""") { (s, d) =>
    t(s, d, "lineitem")
      .groupBy(year(col("l_shipdate")).as("yr"))
      .agg(round(avg("l_quantity"), 6).as("avg_qty"), count(lit(1)).as("n"))
  }

  // A1 via the declared `window()` primitive (tumbling event-time
  // window in batch — the same operator Structured Streaming uses).
  q("a1_window_fn",
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(avg(value), 6) AS avg_value
      |FROM events GROUP BY 1""") { (s, d) =>
    t(s, d, "events")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n"), round(avg("value"), 6).as("avg_value"))
      .select(col("w.start").cast("date").as("day"), col("n"),
        col("avg_value"))
  }

  // A3: exact distinct count (the reference's manual id-dedup loop,
  // `calculations/polytrend.py:271-277`).
  q("a3_distinct_count",
    """SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
      |FROM lineitem GROUP BY 1""") { (s, d) =>
    t(s, d, "lineitem").groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n_parts"),
        countDistinct("l_suppkey").as("n_supps"))
  }

  // A3 approximate variant (HLL): scale path. The sketch estimate
  // cannot hash-match an exact engine, but its error bound CAN: the
  // entry emits the exact count plus a within-5% flag for the HLL
  // estimate (rsd 0.01, so 5% is a wide deterministic margin — HLL is
  // a pure function of the input set, no RNG), and the oracle pins
  // both. A broken sketch flips the flag and the hash mismatches.
  q("a3_approx_distinct",
    """SELECT l_returnflag,
      |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |       CAST(1 AS INT) AS hll_within_5pct
      |FROM lineitem GROUP BY 1""") { (s, d) =>
    t(s, d, "lineitem").groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("exact_parts"),
        approx_count_distinct(col("l_partkey"), rsd = 0.01).as("approx"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx") - col("exact_parts")) <=
          col("exact_parts") * lit(0.05)).cast("int").as("hll_within_5pct"))
  }

  // A4: categorical counts via one-pass conditional aggregation
  // (`calculations/utils.py:39-54`).
  q("a4_conditional_counts",
    """SELECT CAST(count(*) AS BIGINT) AS n_total,
      |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
      |FROM events""") { (s, d) =>
    def cnt(tp: String) =
      sum(when(col("event_type") === tp, 1).otherwise(0)).as(s"n_$tp")
    t(s, d, "events").agg(count(lit(1)).as("n_total"),
      cnt("click"), cnt("view"), cnt("error"), cnt("signup"), cnt("purchase"))
  }

  // A5: share-of-total percentages (`calculations/utils.py:56-63`).
  q("a5_share_pct",
    """SELECT event_type,
      |       round(count(*) * 100.0 / (SELECT count(*) FROM events), 1) AS pct
      |FROM events GROUP BY 1""") { (s, d) =>
    // 1-row broadcast total instead of an unpartitioned window — see
    // f7_computed_angle.
    val ev = t(s, d, "events")
    val total = ev.agg(count(lit(1)).as("total"))
    ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .withColumn("pct", round(col("n") * 100.0 / col("total"), 1))
      .select("event_type", "pct")
  }

  // Rollup over the region→nation hierarchy.
  q("agg_rollup",
    """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_supp
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""") { (s, d) =>
    t(s, d, "supplier")
      .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name")
      // Column-based rollup: the String overload trips Spark 4.1's
      // ambiguous-self-join detection on post-join lineage.
      .rollup(col("r_name"), col("n_name")).agg(count(lit(1)).as("n_supp"))
  }

  q("agg_cube",
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""") { (s, d) =>
    t(s, d, "orders").cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
  }

  // --------------------------------------------------------------- windows

  // W1: cumulative sum (pie cumsum, `calculations/polytrend.py:79-80`),
  // over a deterministic pre-aggregated monthly series.
  q("w1_cumsum",
    """WITH m AS (SELECT event_type,
      |                  CAST(ts AS DATE) AS day,
      |                  sum(value) AS s
      |           FROM events GROUP BY 1, 2)
      |SELECT event_type, day, round(s, 4) AS daily,
      |       round(sum(s) OVER (PARTITION BY event_type ORDER BY day
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum
      |FROM m""") { (s, d) =>
    val m = t(s, d, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum("value").as("s"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    m.select(col("event_type"), col("day"), round(col("s"), 4).as("daily"),
      round(sum("s").over(w), 4).as("cum"))
  }

  // W2: keyed row_number replaces the reference's positional stride
  // segmentation (`calculations/polytrend.py:282-283`).
  q("w2_row_number",
    """SELECT CAST(event_id AS BIGINT) AS event_id,
      |       CAST(user_id AS BIGINT) AS user_id,
      |       CAST(row_number() OVER (PARTITION BY user_id
      |            ORDER BY ts, event_id) AS INT) AS rn
      |FROM events""") { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(s, d, "events")
      .select(col("event_id"), col("user_id"), row_number().over(w).as("rn"))
  }

  // Ranking windows (declared built-ins, SURVEY §2.5).
  q("w4_rank",
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
      |       CAST(c_nationkey AS INT) AS c_nationkey,
      |       CAST(rank() OVER (PARTITION BY c_nationkey
      |            ORDER BY c_acctbal DESC) AS INT) AS rnk,
      |       CAST(dense_rank() OVER (PARTITION BY c_nationkey
      |            ORDER BY c_acctbal DESC) AS INT) AS drnk
      |FROM customer""") { (s, d) =>
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc)
    t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"),
      rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
  }

  // lag/lead delta over the monthly composite (needed by DBEST level-shift
  // detection internally — SURVEY §2.5).
  q("w5_lag_delta",
    """WITH m AS (SELECT event_type,
      |                  CAST(ts AS DATE) AS day,
      |                  avg(value) AS a
      |           FROM events GROUP BY 1, 2)
      |SELECT event_type, day, round(a, 6) AS avg_value,
      |       round(a - lag(a) OVER (PARTITION BY event_type ORDER BY day), 6) AS delta,
      |       round(lead(a) OVER (PARTITION BY event_type ORDER BY day) - a, 6) AS next_delta
      |FROM m""") { (s, d) =>
    val m = t(s, d, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(avg("value").as("a"))
    val w = Window.partitionBy("event_type").orderBy("day")
    m.select(col("event_type"), col("day"), round(col("a"), 6).as("avg_value"),
      round(col("a") - lag("a", 1).over(w), 6).as("delta"),
      round(lead("a", 1).over(w) - col("a"), 6).as("next_delta"))
  }

  // Sliding frame: 3-month moving average.
  q("w6_moving_avg",
    """WITH m AS (SELECT event_type,
      |                  CAST(ts AS DATE) AS day,
      |                  avg(value) AS a
      |           FROM events GROUP BY 1, 2)
      |SELECT event_type, day,
      |       round(avg(a) OVER (PARTITION BY event_type ORDER BY day
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3
      |FROM m""") { (s, d) =>
    val m = t(s, d, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(avg("value").as("a"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-2, Window.currentRow)
    m.select(col("event_type"), col("day"),
      round(avg("a").over(w), 6).as("ma3"))
  }

  /** Distribution-rank window family (ntile/percent_rank/cume_dist)
    * over per-user value totals — completes the ranking-window surface
    * (w2/w4 cover row_number/rank). The window runs over PER-USER
    * aggregates (state bounded by users per type, not events), the
    * (tot DESC, user_id) order is total so every rank function is
    * deterministic, and the two ratio outputs use the standard SQL
    * definitions both engines share bit for bit.
    */
  q("w7_ntile_dist",
    """WITH u AS (SELECT event_type, user_id,
      |             CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |                  AS BIGINT) AS tot
      |           FROM events GROUP BY 1, 2)
      |SELECT event_type, CAST(user_id AS BIGINT) AS user_id, tot,
      |       CAST(ntile(4) OVER w AS INT) AS quartile,
      |       round(percent_rank() OVER w, 6) AS pct_rank,
      |       round(cume_dist() OVER w, 6) AS cume
      |FROM u WINDOW w AS (PARTITION BY event_type
      |                    ORDER BY tot DESC, user_id)""") { (s, d) =>
    val u = t(s, d, "events")
      .groupBy("event_type", "user_id")
      .agg(expr("sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))").as("tot"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("tot").desc, col("user_id"))
    u.select(col("event_type"), col("user_id"), col("tot"),
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"))
  }

  // ------------------------------------------- sorts / limits / set ops

  q("o1_topk",
    """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""") { (s, d) =>
    t(s, d, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_totalprice").limit(10)
  }

  q("set_union",
    """SELECT CAST(c_nationkey AS INT) AS k FROM customer
      |UNION
      |SELECT CAST(s_nationkey AS INT) AS k FROM supplier""") { (s, d) =>
    t(s, d, "customer").select(col("c_nationkey").as("k"))
      .union(t(s, d, "supplier").select(col("s_nationkey").as("k")))
      .distinct()
  }

  q("set_intersect",
    """SELECT CAST(c_nationkey AS INT) AS k FROM customer WHERE c_acctbal > 9000
      |INTERSECT
      |SELECT CAST(s_nationkey AS INT) AS k FROM supplier WHERE s_acctbal > 5000""") { (s, d) =>
    t(s, d, "customer").filter(col("c_acctbal") > 9000)
      .select(col("c_nationkey").as("k"))
      .intersect(t(s, d, "supplier").filter(col("s_acctbal") > 5000)
        .select(col("s_nationkey").as("k")))
  }

  q("set_except",
    """SELECT CAST(n_nationkey AS INT) AS k FROM nation
      |EXCEPT
      |SELECT CAST(s_nationkey AS INT) AS k FROM supplier WHERE s_acctbal > 8000""") { (s, d) =>
    t(s, d, "nation").select(col("n_nationkey").as("k"))
      .except(t(s, d, "supplier").filter(col("s_acctbal") > 8000)
        .select(col("s_nationkey").as("k")))
  }

  q("d1_distinct",
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem""") { (s, d) =>
    t(s, d, "lineitem").select("l_returnflag", "l_linestatus").dropDuplicates()
  }

  // ------------------------------------------------------ scalar functions

  // X2/X3/X4/date part extraction + date arithmetic.
  q("x_datetime",
    """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
      |       CAST(year(o_orderdate) AS INT) AS yr,
      |       CAST(month(o_orderdate) AS INT) AS mon,
      |       CAST(day(o_orderdate) AS INT) AS dom,
      |       CAST(make_date(CAST(year(o_orderdate) AS INT), 1, 1) AS DATE) AS y0,
      |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month,
      |       CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since
      |FROM orders WHERE o_orderkey < 500""") { (s, d) =>
    val od = col("o_orderdate")
    t(s, d, "orders").filter(col("o_orderkey") < 500).select(
      col("o_orderkey"),
      year(od).as("yr"), month(od).as("mon"), dayofmonth(od).as("dom"),
      make_date(year(od), lit(1), lit(1)).as("y0"),
      add_months(od.cast("date"), 1).as("next_month"),
      datediff(od.cast("date"), lit("1992-01-01").cast("date")).as("days_since"))
  }

  // X5: integer sequence generation.
  q("x_sequence",
    "SELECT CAST(unnest(generate_series(1, 12)) AS INT) AS m") { (s, _) =>
    s.range(1, 13).select(col("id").cast("int").as("m"))
  }

  // X6/X7/X8: string build/strip/split+cast.
  q("x_strings",
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
      |       regexp_replace(c_name, '[^0-9]', '', 'g') AS digits,
      |       concat(c_mktsegment, '-', CAST(CAST(c_nationkey AS INT) AS VARCHAR)) AS seg_nation
      |FROM customer WHERE c_custkey <= 100""") { (s, d) =>
    t(s, d, "customer").filter(col("c_custkey") <= 100).select(
      col("c_custkey"),
      regexp_replace(col("c_name"), "[^0-9]", "").as("digits"),
      concat(col("c_mktsegment"), lit("-"),
        col("c_nationkey").cast("string")).as("seg_nation"))
  }

  // X17: JSON field extraction over events.props.
  q("x17_json",
    """SELECT CAST(event_id AS BIGINT) AS event_id,
      |       CAST(json_extract_string(props, '$.k') AS INT) AS k
      |FROM events WHERE event_id < 1000""") { (s, d) =>
    t(s, d, "events").filter(col("event_id") < 1000).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))
  }

  // X12-X15: array ops over tokenized documents (split, element_at ±,
  // distinct, transform, flatten, size).
  q("x_array_ops",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |       string_split(text, ' ')[1] AS first_tok,
      |       string_split(text, ' ')[-1] AS last_tok,
      |       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq,
      |       CAST(len(flatten([string_split(text, ' '), string_split(text, ' ')])) AS INT) AS n_doubled,
      |       list_transform(string_split(text, ' '), x -> upper(x))[1] AS first_upper
      |FROM documents""") { (s, d) =>
    val toks = split(col("text"), " ")
    t(s, d, "documents").select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      element_at(toks, 1).as("first_tok"),
      element_at(toks, -1).as("last_tok"),
      size(array_distinct(toks)).as("n_uniq"),
      size(flatten(array(toks, toks))).as("n_doubled"),
      element_at(transform(toks, x => upper(x)), 1).as("first_upper"))
  }

  // X10: code→label decode via a map literal (the reference's
  // trend/direction dicts, `calculations/polytrend.py:204-211`).
  q("x10_decode",
    """SELECT CAST(event_id AS BIGINT) AS event_id,
      |       CASE event_type WHEN 'click' THEN 'interaction'
      |            WHEN 'view' THEN 'impression'
      |            WHEN 'purchase' THEN 'conversion'
      |            WHEN 'signup' THEN 'conversion'
      |            ELSE 'other' END AS label
      |FROM events WHERE event_id < 3000""") { (s, d) =>
    val decode = map(
      lit("click"), lit("interaction"),
      lit("view"), lit("impression"),
      lit("purchase"), lit("conversion"),
      lit("signup"), lit("conversion"))
    t(s, d, "events").filter(col("event_id") < 3000).select(
      col("event_id"),
      coalesce(element_at(decode, col("event_type")), lit("other"))
        .as("label"))
  }

  // X16: geometry helpers (Euclidean distance, buffer envelope —
  // `calculations/polytrend.py:129-135` pixel-cell construction).
  q("x16_geometry",
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
      |       round(sqrt(c_acctbal * c_acctbal +
      |             c_nationkey * c_nationkey * 10000.0), 4) AS dist,
      |       round(c_acctbal - 50.0, 2) AS buf_lo,
      |       round(c_acctbal + 50.0, 2) AS buf_hi
      |FROM customer WHERE c_custkey <= 200""") { (s, d) =>
    t(s, d, "customer").filter(col("c_custkey") <= 200).select(
      col("c_custkey"),
      round(sqrt(col("c_acctbal") * col("c_acctbal") +
        col("c_nationkey") * col("c_nationkey") * 10000.0), 4).as("dist"),
      round(col("c_acctbal") - 50.0, 2).as("buf_lo"),
      round(col("c_acctbal") + 50.0, 2).as("buf_hi"))
  }

  // Correlation / covariance aggregates.
  q("x_corr",
    """SELECT event_type,
      |       round(corr(value, CAST(floor(epoch(ts)) AS BIGINT)), 6) AS c,
      |       round(covar_samp(value, CAST(floor(epoch(ts)) AS BIGINT)), 4) AS cov
      |FROM events GROUP BY event_type""") { (s, d) =>
    t(s, d, "events").groupBy("event_type").agg(
      round(corr(col("value"), unix_timestamp(col("ts"))), 6).as("c"),
      round(covar_samp(col("value"), unix_timestamp(col("ts"))), 4).as("cov"))
  }

  // Additional string functions (pad/trim/slice/repeat/reverse).
  q("x_strings2",
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
      |       lpad(CAST(CAST(c_custkey AS BIGINT) AS VARCHAR), 8, '0') AS padded,
      |       upper(c_mktsegment) AS seg_up, lower(c_name) AS name_lo,
      |       replace(c_name, '_', '-') AS name_dash,
      |       reverse(c_mktsegment) AS seg_rev,
      |       repeat(left(c_mktsegment, 1), 3) AS tri,
      |       trim('  x  ') AS trimmed
      |FROM customer WHERE c_custkey <= 150""") { (s, d) =>
    t(s, d, "customer").filter(col("c_custkey") <= 150).select(
      col("c_custkey"),
      lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
      upper(col("c_mktsegment")).as("seg_up"),
      lower(col("c_name")).as("name_lo"),
      regexp_replace(col("c_name"), "_", "-").as("name_dash"),
      reverse(col("c_mktsegment")).as("seg_rev"),
      repeat(substring(col("c_mktsegment"), 1, 1), 3).as("tri"),
      trim(lit("  x  ")).as("trimmed"))
  }

  // Bitwise operators.
  q("x_bitwise",
    """SELECT CAST(event_id AS BIGINT) AS event_id,
      |       CAST(event_id & 255 AS BIGINT) AS lo_byte,
      |       CAST(event_id | 4096 AS BIGINT) AS with_flag,
      |       CAST(xor(event_id, user_id) AS BIGINT) AS mixed,
      |       CAST(event_id << 2 AS BIGINT) AS shifted
      |FROM events WHERE event_id < 2000""") { (s, d) =>
    t(s, d, "events").filter(col("event_id") < 2000).select(
      col("event_id"),
      col("event_id").bitwiseAND(255).as("lo_byte"),
      col("event_id").bitwiseOR(4096).as("with_flag"),
      col("event_id").bitwiseXOR(col("user_id")).as("mixed"),
      expr("shiftleft(event_id, 2)").as("shifted"))
  }

  // Conditional scalar functions.
  q("x_conditional",
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
      |       coalesce(nullif(c_mktsegment, 'BUILDING'), 'REDACTED') AS seg,
      |       greatest(c_acctbal, 0.0) AS bal_pos,
      |       least(c_acctbal, 5000.0) AS bal_cap,
      |       CAST(CASE WHEN c_acctbal < 0 THEN -1
      |            WHEN c_acctbal = 0 THEN 0 ELSE 1 END AS INT) AS bal_sign
      |FROM customer""") { (s, d) =>
    t(s, d, "customer").select(
      col("c_custkey"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
        lit("REDACTED")).as("seg"),
      greatest(col("c_acctbal"), lit(0.0)).as("bal_pos"),
      least(col("c_acctbal"), lit(5000.0)).as("bal_cap"),
      when(col("c_acctbal") < 0, -1).when(col("c_acctbal") === 0, 0)
        .otherwise(1).as("bal_sign"))
  }

  /** Argmax/argmin aggregates: the representative row per group without
    * a window pass — one aggregation instead of window+filter.
    * Tie-break: per key the (price, orderkey) pair is unique, so both
    * engines pick the same row.
    */
  q("x_maxby",
    """SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
      |       CAST(max_by(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS BIGINT) AS biggest_order,
      |       CAST(min_by(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS BIGINT) AS smallest_order
      |FROM orders GROUP BY o_custkey""") { (s, d) =>
    t(s, d, "orders").groupBy(col("o_custkey"))
      .agg(
        max_by(col("o_orderkey"),
          col("o_totalprice") + col("o_orderkey") * 1e-9)
          .as("biggest_order"),
        min_by(col("o_orderkey"),
          col("o_totalprice") + col("o_orderkey") * 1e-9)
          .as("smallest_order"))
  }

  /** Histogram binning (width_bucket semantics, written as the explicit
    * formula on BOTH engines — operation order matters at bin
    * boundaries, and DuckDB 1.0 lacks the builtin).
    */
  q("x_histogram",
    """SELECT CAST(CASE WHEN c_acctbal < -1000.0 THEN 0
      |            WHEN c_acctbal >= 10000.0 THEN 12
      |            ELSE floor((c_acctbal - -1000.0) / (10000.0 - -1000.0) * 11) + 1
      |            END AS BIGINT) AS bucket,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM customer GROUP BY 1""") { (s, d) =>
    val bucket = when(col("c_acctbal") < -1000.0, 0)
      .when(col("c_acctbal") >= 10000.0, 12)
      .otherwise(floor((col("c_acctbal") - lit(-1000.0)) /
        (lit(10000.0) - lit(-1000.0)) * 11) + 1)
      .cast("long")
    t(s, d, "customer")
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Ordered string aggregation: deterministic (sorted) concatenation —
    * Spark sorts the collected array, DuckDB orders inside string_agg.
    */
  q("x_stringagg",
    """SELECT CAST(n_regionkey AS INT) AS n_regionkey,
      |       string_agg(n_name, ',' ORDER BY n_name) AS nations
      |FROM nation GROUP BY n_regionkey""") { (s, d) =>
    t(s, d, "nation").groupBy(col("n_regionkey"))
      .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
        .as("nations"))
  }

  // ------------------------------------------------------- TPC-H classics

  q("q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |       round(avg(l_quantity), 4) AS avg_qty,
      |       round(avg(l_extendedprice), 4) AS avg_price,
      |       round(avg(l_discount), 4) AS avg_disc,
      |       CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""") { (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  q("q3_shipping_priority",
    """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       CAST(o_orderdate AS DATE) AS od
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1996-03-15'
      |  AND l_shipdate > TIMESTAMP '1996-03-15'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""") { (s, d) =>
    t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1996-03-15").cast("timestamp_ntz"))
      .join(t(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp_ntz"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("od"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .select("l_orderkey", "revenue", "od")
      .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
  }

  q("q5_local_supplier",
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""") { (s, d) =>
    // The region predicate reaches BOTH fact-side inputs before any
    // big join: nation⋈region(ASIA) is ≤5 rows, broadcast as a
    // semi-join filter onto customer and as the name-carrying dim onto
    // supplier. Catalyst cannot derive this rewrite itself (the filter
    // chains through s_nationkey = c_nationkey), and at scale it cuts
    // the customer⋈orders⋈lineitem pipeline to the ASIA fraction
    // (~1/5) instead of filtering after the full fact join.
    val asia = t(s, d, "nation")
      .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = t(s, d, "customer")
      .join(broadcast(asia.select(col("n_nationkey").as("__nk"))),
        col("c_nationkey") === col("__nk"), "left_semi")
    val supp = t(s, d, "supplier")
      .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
    cust
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
      .join(t(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
  }

  q("q6_forecast_revenue",
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""") { (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
  }

  // K1 projection oracle: per-series linear slope/intercept, cross-checked
  // against DuckDB's regr_* (SURVEY §5.3).
  q("k1_regr_slope",
    """SELECT CAST(user_id AS BIGINT) AS user_id,
      |       round(regr_slope(value, date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))), 6) AS slope,
      |       round(regr_intercept(value, date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))), 6) AS icept
      |FROM events GROUP BY user_id""") { (s, d) =>
    val x = datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
    t(s, d, "events").groupBy("user_id")
      .agg(round(regr_slope(col("value"), x), 6).as("slope"),
        round(regr_intercept(col("value"), x), 6).as("icept"))
  }
}
