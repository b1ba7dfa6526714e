package graft.graph

import graft.QueryRegistry
import graft.io.Tables
import org.apache.spark.sql.functions.{col, floor, lit}

/** Driver-contract entries for the graph-analytics family over the
  * part co-purchase graph (parts linked when they appear in the same
  * order). Every query is exact-integer end to end, so the DuckDB
  * oracle hash-matches bit for bit; the oracle enumerates triangles
  * with the simple a<b<c canonical join (count-identical to the
  * engine's degree-ordered orientation, which exists for skew safety,
  * not for a different answer).
  */
object GraphQueries extends QueryRegistry {

  private def li(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "lineitem")

  /** Shared oracle prelude: the canonical undirected edge set. */
  private val edgeCte =
    """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      |      FROM lp x JOIN lp y ON x.l_orderkey = y.l_orderkey
      |                         AND x.l_partkey < y.l_partkey)""".stripMargin

  q("g_degree",
    s"""$edgeCte,
      |d AS (SELECT a AS node FROM e UNION ALL SELECT b FROM e),
      |deg AS (SELECT node, count(*) AS dg FROM d GROUP BY 1)
      |SELECT CAST(dg AS BIGINT) AS degree, CAST(count(*) AS BIGINT) AS n_nodes
      |FROM deg GROUP BY 1""") { (s, d) =>
    GraphOps.degreeHistogramFromLineitem(li(s, d))
  }

  /** Whole-graph triangle summary oracle — shared by the standalone
    * entry and the suite arm (one val, so they cannot drift).
    */
  private val triSql =
    s"""$edgeCte,
      |d AS (SELECT a AS node FROM e UNION ALL SELECT b FROM e),
      |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS dg FROM d GROUP BY 1),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
      |              CAST(sum((dg * (dg - 1)) // 2) AS BIGINT) AS n_wedges
      |       FROM deg),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
      |      FROM e e1 JOIN e e2 ON e1.b = e2.a
      |                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
      |SELECT n_nodes, n_edges, n_wedges, n_triangles,
      |       CAST((n_triangles * 30000) // n_wedges AS BIGINT) AS clustering_u
      |FROM nn, m, t""".stripMargin

  q("g_triangles", triSql) { (s, d) =>
    GraphOps.triangleSummaryFromLineitem(li(s, d))
  }

  q("g_jaccard",
    s"""$edgeCte,
      |d AS (SELECT a AS node FROM e UNION ALL SELECT b FROM e),
      |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS dg FROM d GROUP BY 1),
      |tri AS (SELECT e1.a AS x, e1.b AS v, e2.b AS w
      |        FROM e e1 JOIN e e2 ON e1.b = e2.a
      |                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      |pairs AS (SELECT x AS a, v AS b FROM tri
      |          UNION ALL SELECT x, w FROM tri
      |          UNION ALL SELECT v, w FROM tri),
      |cm AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_common
      |       FROM pairs GROUP BY 1, 2)
      |SELECT cm.a, cm.b, cm.n_common,
      |       CAST((cm.n_common * 10000) // (da.dg + db.dg - cm.n_common)
      |            AS BIGINT) AS jaccard_u
      |FROM cm JOIN deg da ON cm.a = da.node JOIN deg db ON cm.b = db.node
      |ORDER BY jaccard_u DESC, cm.a, cm.b LIMIT 100""") { (s, d) =>
    GraphOps.edgeJaccardFromLineitem(li(s, d), 100)
  }

  q("g_pagerank", pageRankSql(5)) { (s, d) =>
    GraphOps.pageRankFromLineitem(li(s, d), 5)
  }

  /** Local clustering coefficient decile histogram — see
    * [[GraphOps.localClustering]]; the oracle enumerates triangles
    * with the a<b<c canonical join and replays the ×10⁴ floor
    * arithmetic bit for bit.
    */
  private val lccSql =
    s"""$edgeCte,
      |d AS (SELECT a AS node FROM e UNION ALL SELECT b FROM e),
      |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS dg FROM d GROUP BY 1),
      |tri AS (SELECT e1.a AS x, e1.b AS v, e2.b AS w
      |        FROM e e1 JOIN e e2 ON e1.b = e2.a
      |                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      |crn AS (SELECT x AS node FROM tri UNION ALL SELECT v FROM tri
      |        UNION ALL SELECT w FROM tri),
      |tc AS (SELECT node, CAST(count(*) AS BIGINT) AS t FROM crn GROUP BY 1),
      |l AS (SELECT deg.node, deg.dg, COALESCE(tc.t, 0) AS t,
      |             CAST((COALESCE(tc.t, 0) * 20000) //
      |                  (deg.dg * (deg.dg - 1)) AS BIGINT) AS lcc_u
      |      FROM deg LEFT JOIN tc ON deg.node = tc.node
      |      WHERE deg.dg >= 2)
      |SELECT CAST(lcc_u // 1000 AS BIGINT) AS bucket,
      |       CAST(count(*) AS BIGINT) AS n_nodes,
      |       CAST(sum(t) AS BIGINT) AS sum_t
      |FROM l GROUP BY 1""".stripMargin

  q("g_local_clustering", lccSql) { (s, d) =>
    GraphOps.localClusteringFromLineitem(li(s, d))
  }

  /** Capped 3-round 3-core peeling — see [[GraphOps.kCore]]; the
    * oracle chains one (degree-filter + edge-restrict) CTE pair per
    * round, the fixed-k g_khop pattern.
    */
  q("g_kcore", kCoreSql(3, 3)) { (s, d) =>
    GraphOps.kCoreFromLineitem(li(s, d), 3, 3)
  }

  /** Degree assortativity — see [[GraphOps.degreeAssortativity]]; the
    * oracle replays the exact HUGEINT sums and the one shared float
    * division.
    */
  private val assortSql =
    s"""$edgeCte,
      |d AS (SELECT a AS node FROM e UNION ALL SELECT b FROM e),
      |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS dg FROM d GROUP BY 1),
      |dd AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
      |ed AS (SELECT x.dg AS dx, y.dg AS dy
      |       FROM dd JOIN deg x ON dd.src = x.node
      |               JOIN deg y ON dd.dst = y.node),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS m,
      |             sum(CAST(dx AS HUGEINT)) AS sx,
      |             sum(CAST(dx AS HUGEINT) * dx) AS sxx,
      |             sum(CAST(dx AS HUGEINT) * dy) AS sxy
      |      FROM ed)
      |SELECT m,
      |       CASE WHEN CAST(m AS HUGEINT) * sxx - sx * sx = 0 THEN NULL
      |            ELSE round(
      |              CAST(CAST(m AS HUGEINT) * sxy - sx * sx AS DOUBLE) /
      |              CAST(CAST(m AS HUGEINT) * sxx - sx * sx AS DOUBLE), 6)
      |       END AS assortativity
      |FROM s""".stripMargin

  q("g_assortativity", assortSql) { (s, d) =>
    GraphOps.degreeAssortativityFromLineitem(li(s, d))
  }

  /** The structural suite on ONE shared prebuilt edge view (r9 verdict
    * #6): g_kcore / g_local_clustering / g_modularity /
    * g_assortativity each pay the copurchase self-join + distinct as
    * their dominant per-call cost when run standalone; a long-lived
    * engine builds that edge set ONCE (eager localCheckpoint — the
    * [[GraphOps.edgeView]] posture) and runs the whole suite against
    * it. Results are the four ops' outputs mapped to one uniform
    * (op, a, b, c) BIGINT schema; every value is the exact integer the
    * standalone entries verify (assortativity enters as
    * floor(r·10⁶) of the same token-identical rounded double). The
    * oracle replays all four chains UNION ALL'd — each arm is the
    * SAME SQL text as the standalone oracle (shared vals/builders, so
    * they cannot drift).
    */
  q("g_suite_on_view",
    s"""SELECT 'kcore' AS op, CAST(round AS BIGINT) AS a,
       |       n_nodes AS b, n_edges AS c
       |FROM (${kCoreSql(3, 3)})
       |UNION ALL
       |SELECT 'lcc' AS op, bucket AS a, n_nodes AS b, sum_t AS c
       |FROM ($lccSql)
       |UNION ALL
       |SELECT 'modularity' AS op, n_communities AS a, e_in AS b,
       |       q_ppm AS c
       |FROM (${modularitySql(2)})
       |UNION ALL
       |SELECT 'assort' AS op, m AS a,
       |       CAST(floor(assortativity * 1000000) AS BIGINT) AS b,
       |       CAST(0 AS BIGINT) AS c
       |FROM ($assortSql)
       |UNION ALL
       |SELECT 'tri' AS op, n_triangles AS a, n_wedges AS b,
       |       clustering_u AS c
       |FROM ($triSql)""".stripMargin) { (s, d) =>
    // ONE shared materialization chain for the whole suite — since r11
    // ALL FIVE consumers run OnView against dd (r10 verdict #4), and
    // since the r15 optimization round the hash(src)-partitioned,
    // sorted, PERSISTED view builds STRAIGHT from lineitem
    // (GraphOps.copurchaseView: basket aggregate + map-local pair
    // expansion + one repartition — two exchanges, replacing the
    // copurchase self-join + checkpoint + union + repartition chain).
    // PERSIST, not localCheckpoint: only the InMemoryTableScan
    // boundary carries the layout into downstream planning (a
    // checkpoint's LogicalRDD drops it — measured, see
    // GraphOps.partitionedView), so the persist form is what lets each
    // src-keyed consumer skip its edge-side exchange. Released after
    // the arms materialize (each arm is eagerly checkpointed below, so
    // nothing re-reads dd afterwards).
    val dd = GraphOps.copurchaseView(li(s, d))
    // ONE persisted node-sized degree table for the whole suite (r15
    // opt, guide §2.4): kcore round 1, the corner pass's orientation,
    // lcc's degree join, modularity's d_c join + LPA node init,
    // assortativity's dx/dy joins and the tri arm's wedge/edge counts
    // all read it — six independent full edge-view aggregations
    // collapse to one (each was exchange-free over the cached view,
    // but still a full E-row scan + hash agg per arm).
    val deg = GraphOps.viewDegrees(dd)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val degOpt = Some(deg)
    // Each op's result is a HANDFUL of rows (peel rounds / 10 buckets /
    // 1-row summaries) — materialize them eagerly IN SEQUENCE so peak
    // executor state is one structural op at a time, not all five
    // DAGs co-scheduled inside the final union's single action (the
    // lazy-union form OOM'd the 8 GiB bench JVM at sf1 once triangles
    // joined the suite: five ops' shuffle state on a 10× graph is a
    // sum, the sequential form is a max — and sequencing is the honest
    // long-lived-engine shape anyway; the shared view is the saving,
    // not job fusion).
    val kcore = GraphOps.kCoreOnView(dd, 3, 3, degOpt)
      .select(lit("kcore").as("op"), col("round").cast("long").as("a"),
        col("n_nodes").as("b"), col("n_edges").as("c"))
      .localCheckpoint(true)
    // r11: the corner enumeration — orientation joins + neighbor
    // arrays + per-edge intersection, the dominant triangle cost — is
    // built ONCE and read by BOTH the lcc and tri arms; the pre-r11
    // suite ran it twice, which is what made the 5-op suite slower
    // than the standalone sum at sf1. The shared intermediate is the
    // NODE-sized per-node corner-count table (streamed aggregation —
    // nothing triangle-sized is stored; two consumers of one frozen
    // checkpoint, so the two-action range rule doesn't apply)
    val tc = GraphOps.cornerCountsOnView(dd, degOpt)
    val lcc = GraphOps.localClusteringFromCornerCounts(dd, tc, degOpt)
      .select(lit("lcc").as("op"), col("bucket").as("a"),
        col("n_nodes").as("b"), col("sum_t").as("c"))
      .localCheckpoint(true)
    val mod = GraphOps.lpaModularityOnView(dd, 2, degOpt)
      .select(lit("modularity").as("op"), col("n_communities").as("a"),
        col("e_in").as("b"), col("q_ppm").as("c"))
      .localCheckpoint(true)
    val ast = GraphOps.degreeAssortativityOnView(dd, degOpt)
      .select(lit("assort").as("op"), col("m").as("a"),
        floor(col("assortativity") * 1000000).cast("long").as("b"),
        lit(0L).as("c"))
      .localCheckpoint(true)
    val tri = GraphOps.triangleSummaryFromCornerCounts(dd, tc, degOpt)
      .select(lit("tri").as("op"), col("n_triangles").as("a"),
        col("n_wedges").as("b"), col("clustering_u").as("c"))
      .localCheckpoint(true)
    val out = kcore.unionAll(lcc).unionAll(mod).unionAll(ast).unionAll(tri)
    deg.unpersist(false)
    dd.unpersist(false)
    out
  }

  /** Market-basket association rules: ppm-integer support/confidence/
    * lift per co-purchased pair, top-50 by lift (total order). All
    * integer `div` — the oracle replays the arithmetic bit for bit.
    */
  q("g_lift",
    """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pc AS (SELECT x.l_partkey AS a, y.l_partkey AS b,
      |              CAST(count(*) AS BIGINT) AS n_ab
      |       FROM lp x JOIN lp y ON x.l_orderkey = y.l_orderkey
      |                          AND x.l_partkey < y.l_partkey
      |       GROUP BY 1, 2 HAVING count(*) >= 2),
      |ic AS (SELECT l_partkey AS p, CAST(count(*) AS BIGINT) AS n_p
      |       FROM lp GROUP BY 1),
      |tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT)
      |               AS n_baskets FROM lp)
      |SELECT pc.a, pc.b, pc.n_ab, ia.n_p AS n_a, ib.n_p AS n_b,
      |       CAST(pc.n_ab * 1000000 // n_baskets AS BIGINT) AS support_ppm,
      |       CAST(pc.n_ab * 1000000 // ia.n_p AS BIGINT) AS conf_ppm,
      |       CAST((pc.n_ab * n_baskets * 1000000) // (ia.n_p * ib.n_p)
      |            AS BIGINT) AS lift_ppm
      |FROM pc JOIN ic ia ON pc.a = ia.p JOIN ic ib ON pc.b = ib.p, tot
      |ORDER BY lift_ppm DESC, pc.a, pc.b LIMIT 50""") { (s, d) =>
    GraphOps.basketLift(li(s, d), minSupport = 2L, k = 50)
  }

  /** HITS over the customer→part purchase bipartite graph: hubs are
    * buyers whose baskets concentrate on high-authority parts,
    * authorities are parts bought by strong hubs — the influence
    * decomposition PageRank's single score can't give on a bipartite
    * graph. 2 iterations, exact integer max-norm arithmetic
    * (see [[GraphOps.hits]]); the oracle chains one CTE pair per
    * half-iteration with the same floor division.
    */
  /** BFS k-hop reachability from the seed set (parts divisible by
    * 100): cumulative reached count + graph share per hop. Exact
    * integers end to end; the oracle chains one DISTINCT-union CTE
    * per hop (fixed k — no recursive CTE needed, and the chain
    * replays the engine's frontier expansion bit for bit).
    */
  q("g_khop", kHopSql(3, 100)) { (s, d) =>
    GraphOps.kHopReachFromLineitem(li(s, d), 100L, 3)
  }

  /** Deterministic synchronous label propagation, 2 rounds: per-node
    * community label (most frequent neighbor label, ties to the
    * smallest). The oracle chains one count+top-1 CTE pair per round.
    */
  q("g_lpa", lpaSql(2)) { (s, d) =>
    GraphOps.labelPropagationFromLineitem(li(s, d), 2)
  }

  /** Modularity of the 2-round LPA partition — see
    * [[GraphOps.lpaModularity]]; the oracle replays the LPA rounds
    * (same chain as g_lpa, generated from one builder so the two
    * cannot drift) then the exact integer Q arithmetic.
    */
  q("g_modularity", modularitySql(2)) { (s, d) =>
    GraphOps.lpaModularityFromLineitem(li(s, d), 2)
  }

  q("g_hits", hitsSql(2)) { (s, d) =>
    val orders = Tables.load(s, d, "orders")
    val e = orders.select(org.apache.spark.sql.functions.col("o_orderkey"),
        org.apache.spark.sql.functions.col("o_custkey").as("c"))
      .join(li(s, d).select(
        org.apache.spark.sql.functions.col("l_orderkey").as("o_orderkey"),
        org.apache.spark.sql.functions.col("l_partkey").as("p")),
        "o_orderkey")
      .select("c", "p").distinct()
    GraphOps.hits(e, 2)
  }

  /** Chained-CTE oracle for deterministic label propagation: one
    * neighbor-label count + row_number top-1 pair per round, ties
    * broken (count desc, label asc) exactly like the engine's window.
    */
  private def lpaSql(iters: Int): String = {
    val sb = new StringBuilder(edgeCte)
    sb.append(""",
      |dd AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
      |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM dd)""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(s""",
        |c$i AS (SELECT dd.dst AS node, l.lbl, count(*) AS c
        |        FROM dd JOIN l${i - 1} l ON dd.src = l.node
        |        GROUP BY 1, 2),
        |l$i AS (SELECT node, lbl FROM (
        |          SELECT node, lbl,
        |                 row_number() OVER (PARTITION BY node
        |                   ORDER BY c DESC, lbl) AS rn
        |          FROM c$i) t WHERE rn = 1)""".stripMargin)
    }
    sb.append(s"""
      |SELECT CAST(node AS BIGINT) AS node, CAST(lbl AS BIGINT) AS community
      |FROM l$iters""".stripMargin)
    sb.toString
  }

  /** Chained-CTE oracle for k-hop reachability: r_i = distinct union
    * of r_{i-1} and its out-neighbors; one count row per hop.
    */
  /** Oracle for LPA modularity: the [[lpaSql]] CTE chain (string
    * surgery keeps one source of truth) plus the exact integer Q.
    */
  private def modularitySql(iters: Int): String = {
    val base = lpaSql(iters)
    val cut = base.indexOf("SELECT CAST(node AS BIGINT)")
    // guarded splice (r9 advisory): anchor drift must fail with a
    // pointed message, not a StringIndexOutOfBounds at class-init that
    // takes down the whole query registry
    require(cut >= 0, "modularitySql splice anchor " +
      "\"SELECT CAST(node AS BIGINT)\" not found in lpaSql — the lpaSql " +
      "final SELECT was reworded; update the anchor here to match")
    val ctes = base.substring(0, cut).trim
    s"""$ctes,
       |lbl AS (SELECT node, lbl AS community FROM l$iters),
       |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS dg
       |        FROM dd GROUP BY 1),
       |dc AS (SELECT community, CAST(sum(dg) AS BIGINT) AS d_c
       |       FROM deg JOIN lbl USING (node) GROUP BY 1),
       |s AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
       |             CAST(sum(d_c) AS BIGINT) AS m2,
       |             sum(CAST(d_c AS HUGEINT) * d_c) AS sdc2
       |      FROM dc),
       |ei AS (SELECT CAST(count(*) AS BIGINT) AS e_in
       |       FROM dd JOIN lbl x ON dd.src = x.node
       |               JOIN lbl y ON dd.dst = y.node
       |       WHERE x.community = y.community)
       |SELECT n_communities, m2, e_in,
       |       CAST(((CAST(e_in AS HUGEINT) * m2 - sdc2) * 1000000)
       |            // (CAST(m2 AS HUGEINT) * m2) AS BIGINT) AS q_ppm
       |FROM s, ei""".stripMargin
  }

  /** Chained-CTE oracle for capped k-core peeling: per round, a
    * degree-filtered keep set then both-endpoints edge restriction.
    */
  private def kCoreSql(k: Int, rounds: Int): String = {
    val sb = new StringBuilder(edgeCte)
    sb.append(
      ",\nd0 AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e)")
    for (i <- 1 to rounds) {
      sb.append(s""",
        |k$i AS (SELECT src AS node FROM (
        |  SELECT src, count(*) AS c FROM d${i - 1} GROUP BY 1) t
        |  WHERE c >= $k),
        |d$i AS (SELECT d.src, d.dst FROM d${i - 1} d
        |        JOIN k$i x ON d.src = x.node
        |        JOIN k$i y ON d.dst = y.node)""".stripMargin)
    }
    val rows = (1 to rounds).map(i =>
      s"""SELECT CAST($i AS INT) AS round,
         |  CAST((SELECT count(DISTINCT src) FROM d$i) AS BIGINT) AS n_nodes,
         |  CAST((SELECT count(*) FROM d$i) // 2 AS BIGINT) AS n_edges"""
        .stripMargin).mkString("\nUNION ALL\n")
    sb.append(s"\n$rows")
    sb.toString
  }

  private def kHopSql(k: Int, seedMod: Long): String = {
    val sb = new StringBuilder(edgeCte)
    sb.append(s""",
      |dd AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
      |nn AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS n_nodes FROM dd),
      |r0 AS (SELECT DISTINCT src AS node FROM dd WHERE src % $seedMod = 0)""".stripMargin)
    for (i <- 1 to k) {
      sb.append(s""",
        |r$i AS (SELECT DISTINCT node FROM (
        |  SELECT node FROM r${i - 1}
        |  UNION ALL
        |  SELECT dd.dst FROM dd JOIN r${i - 1} p ON dd.src = p.node) t)""".stripMargin)
    }
    val rows = (0 to k).map(i =>
      s"""SELECT CAST($i AS INT) AS hop,
         |       CAST((SELECT count(*) FROM r$i) AS BIGINT) AS n_reached""".stripMargin)
      .mkString("\nUNION ALL\n")
    sb.append(s"""
      |SELECT hop, n_reached,
      |       CAST(n_reached * 1000000 // n_nodes AS BIGINT) AS reach_ppm
      |FROM ($rows) h, nn""".stripMargin)
    sb.toString
  }

  /** Chained-CTE oracle for the integer max-norm HITS — one CTE pair
    * per half-iteration, `//` on positive BIGINTs == Spark `div`.
    */
  private def hitsSql(iters: Int): String = {
    val sb = new StringBuilder(
      """WITH e AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |h0 AS (SELECT c, CAST(1000000 AS BIGINT) AS h
        |       FROM (SELECT DISTINCT c FROM e))""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(s""",
        |a${i}r AS (SELECT p, CAST(sum(h) AS BIGINT) AS a
        |        FROM e JOIN h${i - 1} USING (c) GROUP BY 1),
        |a${i}m AS (SELECT max(a) AS m FROM a${i}r),
        |a$i AS (SELECT p, CAST(a * 1000000 // m AS BIGINT) AS a
        |        FROM a${i}r, a${i}m),
        |h${i}r AS (SELECT c, CAST(sum(a) AS BIGINT) AS h
        |        FROM e JOIN a$i USING (p) GROUP BY 1),
        |h${i}m AS (SELECT max(h) AS m FROM h${i}r),
        |h$i AS (SELECT c, CAST(h * 1000000 // m AS BIGINT) AS h
        |        FROM h${i}r, h${i}m)""".stripMargin)
    }
    sb.append(s"""
      |SELECT 'hub' AS kind, CAST(c AS BIGINT) AS node, h AS score_u
      |FROM h$iters
      |UNION ALL
      |SELECT 'auth' AS kind, CAST(p AS BIGINT) AS node, a AS score_u
      |FROM a$iters""".stripMargin)
    sb.toString
  }

  /** Chained-CTE oracle for the integer PageRank — one CTE per
    * iteration, same floor arithmetic as the engine (`//` on positive
    * BIGINTs == Spark's `div`).
    */
  private def pageRankSql(iters: Int): String = {
    val sb = new StringBuilder(edgeCte)
    sb.append(""",
      |dd AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
      |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
      |        FROM dd GROUP BY 1),
      |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM deg)""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(s""",
        |r$i AS (SELECT n.node,
        |             CAST(150000000 + coalesce(
        |               sum((r.r * 17) // (20 * g.deg)), 0) AS BIGINT) AS r
        |      FROM deg n
        |      LEFT JOIN dd ON dd.dst = n.node
        |      LEFT JOIN r${i - 1} r ON dd.src = r.node
        |      LEFT JOIN deg g ON dd.src = g.node
        |      GROUP BY 1)""".stripMargin)
    }
    sb.append(s"\nSELECT node, r AS rank_u FROM r$iters")
    sb.toString
  }
}
