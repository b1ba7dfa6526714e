package graft.graph

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graph operators: degree-ordered triangle enumeration vs brute
  * force, integer PageRank invariants, Jaccard bounds.
  */
class GraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Random undirected simple graph as a canonical a<b edge DF. */
  private def randomEdges(n: Int, m: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    Iterator.continually {
      val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
      if (a < b) (a, b) else (b, a)
    }.filter { case (a, b) => a != b }.take(m).toSeq.distinct.toDF("a", "b")
  }

  test("triangles match brute-force enumeration on a random graph") {
    val edges = randomEdges(40, 220, 7)
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = (for {
      i <- nodes; j <- nodes if i < j && es((i, j))
      k <- nodes if j < k && es((j, k)) && es((i, k))
    } yield Set(i, j, k)).toSet
    val got = GraphOps.triangles(edges).collect()
      .map(r => Set(r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    assert(brute.nonEmpty) // non-vacuous at this density
    // each triangle emitted exactly once
    assert(GraphOps.triangles(edges).count() == brute.size)
  }

  test("triangle summary: wedge count and clustering bounds") {
    val edges = randomEdges(30, 140, 11)
    val row = GraphOps.triangleSummary(edges).collect().head
    val (nodes, nEdges, wedges, tris, clu) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4))
    assert(nEdges == edges.count())
    // sum of C(deg,2) recomputed locally
    val degs = GraphOps.degrees(edges).collect()
      .map(r => r.getLong(1))
    assert(nodes == degs.length)
    assert(wedges == degs.map(d => d * (d - 1) / 2).sum)
    // 3*tris <= wedges  =>  clustering_u in [0, 10000]
    assert(clu >= 0 && clu <= 10000)
    assert(3 * tris <= wedges)
  }

  test("integer pagerank: deterministic, teleport floor, mass bound") {
    val edges = randomEdges(50, 200, 13)
    val r1 = GraphOps.pageRank(edges, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val r2 = GraphOps.pageRank(edges, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(r1.sameElements(r2)) // exact integer arithmetic => bitwise stable
    val n = r1.length.toLong
    assert(r1.forall(_._2 >= 150000000L)) // teleport floor
    // floor division only loses mass: total <= n * 1e9
    assert(r1.map(_._2).sum <= n * 1000000000L)
  }

  test("edge jaccard: bounded, common <= min degree, ordered cut") {
    val edges = randomEdges(40, 220, 17)
    val deg = GraphOps.degrees(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val rows = GraphOps.edgeJaccard(edges, 50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, c, j) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(c >= 1 && c <= math.min(deg(a), deg(b)))
      assert(j >= 0 && j <= 10000)
    }
    // returned in (jaccard_u desc, a, b) order — a total order
    val key = rows.map(r => (-r.getLong(3), r.getLong(0), r.getLong(1)))
    assert(key.sameElements(key.sorted))
  }

  test("copurchase edges are canonical and deduped") {
    import spark.implicits._
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 10L), // dup line in one order
      (2L, 20L), (2L, 10L),            // reverse order pair
      (3L, 30L)                        // singleton order: no pairs
    ).toDF("l_orderkey", "l_partkey")
    val e = GraphOps.copurchaseEdges(li).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(e.toSeq == Seq((10L, 20L)))
  }

  test("intersection triangle count equals the enumeration count") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = (1 to 400).map { _ =>
      val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct.toDF("a", "b")
    val enumerated = GraphOps.triangles(edges).count()
    val counted = GraphOps.triangleCount(edges)
      .collect().head.getLong(0)
    assert(counted == enumerated && counted > 0)
  }

  test("hits: hand-computed max-norm scores on a 2x2 bipartite graph") {
    import spark.implicits._
    // edges c1->{p1,p2}, c2->{p1}
    // a1: p1=1e6, p2=5e5; h1: c1=1e6, c2=666666
    // a2: p1=1e6, p2=1e12 div 1666666 = 600000; h2: c1=1e6, c2=625000
    val e = Seq((1L, 1L), (1L, 2L), (2L, 1L)).toDF("c", "p")
    val m = GraphOps.hits(e, 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m(("hub", 1L)) == 1000000L && m(("hub", 2L)) == 625000L)
    assert(m(("auth", 1L)) == 1000000L && m(("auth", 2L)) == 600000L)
  }

  test("hits: max score is exactly 1e6 on both sides at every size") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val e = Iterator.continually(
        (rnd.nextInt(20).toLong, rnd.nextInt(30).toLong))
      .take(150).toSeq.distinct.toDF("c", "p")
    val rows = GraphOps.hits(e, 3).collect()
    val hubs = rows.filter(_.getString(0) == "hub").map(_.getLong(2))
    val auths = rows.filter(_.getString(0) == "auth").map(_.getLong(2))
    assert(hubs.max == 1000000L && auths.max == 1000000L)
    assert(hubs.forall(s => s >= 0 && s <= 1000000L))
    assert(auths.forall(s => s >= 0 && s <= 1000000L))
  }

  test("basket lift: hand-computed support/confidence/lift in ppm") {
    import spark.implicits._
    // baskets: {a,b,c}, {a,b}, {a,d} -> n_a=3, n_b=2, n_ab=2, N=3
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 4L)).toDF("l_orderkey", "l_partkey")
    val rows = GraphOps.basketLift(li, minSupport = 2L, k = 10).collect()
    // only (a=1, b=2) clears min support 2
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 2L, 2L)))
    assert(r.getLong(5) == 666666L) // support 2/3
    assert(r.getLong(6) == 666666L) // confidence 2/3
    assert(r.getLong(7) == 1000000L) // lift 2*3/(3*2) = 1 exactly
    // positively-associated pair scores above 1e6
    val li2 = Seq((1L, 7L), (1L, 8L), (2L, 7L), (2L, 8L), (3L, 9L))
      .toDF("l_orderkey", "l_partkey")
    val r2 = GraphOps.basketLift(li2, 2L, 10).collect().head
    assert(r2.getLong(7) == 1500000L) // 2*3/(2*2)
  }

  test("labelPropagation: two cliques bridged by one edge keep " +
      "separate min-labels") {
    import spark.implicits._
    // clique {1,2,3}, clique {10,11,12}, bridge 3-10
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("a", "b")
    val m = GraphOps.labelPropagation(edges, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand trace. round 1 (labels = ids): 1->2, 2->1, 3->1 (min of
    // {1,2,10}), 10->3 (min of {3,11,12}), 11->10, 12->10.
    // round 2: clique A settles on 1; 11/12 see {3, 10} tied -> 3;
    // 10 sees {1, 10, 10} -> 10.
    assert(m(1L) == 1L && m(2L) == 1L && m(3L) == 1L)
    assert(m(10L) == 10L && m(11L) == 3L && m(12L) == 3L)
    assert(m.size == 6)
  }

  test("kHopReach: frontier counts on a path graph with an island") {
    import spark.implicits._
    // path 100-1-2-3-4 plus disconnected edge 7-8; seeds (mod 100): 100
    val edges = Seq((1L, 100L), (1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L))
      .toDF("a", "b")
    val rows = GraphOps.kHopReach(edges, 100L, 3).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 7 nodes total; hop 0: {100}, hop 1: +{1}, hop 2: +{2}, hop 3: +{3}
    assert(rows(0) == ((1L, 142857L)))
    assert(rows(1) == ((2L, 285714L)))
    assert(rows(2) == ((3L, 428571L)))
    assert(rows(3) == ((4L, 571428L)))
  }

  test("kHopReach: saturated reach holds steady once the frontier " +
      "goes empty") {
    import spark.implicits._
    // star around the seed: everything reached at hop 1, so hop 2's
    // expansion anti-joins away entirely (its frontier {1,2} yields an
    // empty newFrontier) and hop 3 runs the frontier-BFS loop (r13
    // rewrite) from a genuinely EMPTY frontier — counts must hold at
    // full reach through both shapes, not drop or duplicate
    val edges = Seq((100L, 1L), (100L, 2L)).toDF("a", "b")
    val rows = GraphOps.kHopReach(edges, 100L, 3).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(0) == ((1L, 333333L)))
    assert(rows(1) == ((3L, 1000000L)))
    assert(rows(2) == ((3L, 1000000L)))
    assert(rows(3) == ((3L, 1000000L)))
  }

  test("localClustering: triangle + pendant gives buckets 10 and 3") {
    import spark.implicits._
    // triangle {1,2,3} + pendant edge 3-4: lcc(1)=lcc(2)=1 (bucket 10),
    // lcc(3)=2*1/(3*2)=3333u (bucket 3); node 4 has deg 1, excluded
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val rows = GraphOps.localClustering(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows == Map(10L -> ((2L, 2L)), 3L -> ((1L, 1L))))
  }

  test("OnView twins reproduce triangles/LCC/summary from the " +
      "bidirectional view") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // K4 + pendant + a disjoint triangle — degree ties exercise the
    // (degree, id) orientation tie-break on both paths
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (7L, 8L), (7L, 9L), (8L, 9L)).toDF("a", "b")
    val dd = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
    def cornerSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    assert(cornerSet(GraphOps.trianglesOnView(dd)) ==
      cornerSet(GraphOps.triangles(edges)))
    assert(GraphOps.localClusteringOnView(dd).collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap ==
      GraphOps.localClustering(edges).collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap)
    assert(GraphOps.triangleSummaryOnView(dd).collect().head.toSeq ==
      GraphOps.triangleSummary(edges).collect().head.toSeq)
    // the suite's shared corner-count path (r11): both consumers of
    // ONE prebuilt node-sized count table reproduce their standalone
    // twins exactly (n_triangles = sum(t) div 3)
    val tc = GraphOps.cornerCountsOnView(dd)
    assert(GraphOps.triangleSummaryFromCornerCounts(dd, tc)
        .collect().head.toSeq ==
      GraphOps.triangleSummary(edges).collect().head.toSeq)
    assert(GraphOps.localClusteringFromCornerCounts(dd, tc).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap ==
      GraphOps.localClustering(edges).collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap)
  }

  test("kCore: K4 survives 3-core peeling, its tail does not") {
    import spark.implicits._
    // complete K4 on {1,2,3,4} plus tail 4-5-6: round 1 drops 5 and 6,
    // K4 (all degrees 3) is the stable 3-core
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val rows = GraphOps.kCore(edges, 3, 3).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows == Map(1 -> ((4L, 6L)), 2 -> ((4L, 6L)), 3 -> ((4L, 6L))))
  }

  test("lpaModularity: two disjoint triangles resolve to two " +
      "communities with Q exactly 0.5") {
    import spark.implicits._
    // LPA converges to one label per triangle; e_in = 2m = 12,
    // d_c = 6 each -> Q = ((12*12 - 72) * 1e6) div 144 = 500000
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    val r = GraphOps.lpaModularity(edges, 2).collect().head
    assert(r.getAs[Long]("n_communities") == 2L)
    assert(r.getAs[Long]("m2") == 12L)
    assert(r.getAs[Long]("e_in") == 12L)
    assert(r.getAs[Long]("q_ppm") == 500000L)
  }

  test("degreeAssortativity: a perfect star is exactly -1; a cycle " +
      "(regular, zero degree variance) is NULL") {
    import spark.implicits._
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val r1 = GraphOps.degreeAssortativity(star).collect().head
    assert(r1.getAs[Long]("m") == 6L)
    assert(r1.getAs[Double]("assortativity") == -1.0)
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val r2 = GraphOps.degreeAssortativity(cycle).collect().head
    assert(r2.isNullAt(r2.fieldIndex("assortativity")))
  }

  test("kCore: a path fully dissolves under 2-core cascading peels") {
    import spark.implicits._
    // path 1-2-3-4-5: round 1 drops the endpoints, round 2 the rest
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val rows = GraphOps.kCore(edges, 2, 3).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows == Map(1 -> ((3L, 2L)), 2 -> ((0L, 0L)), 3 -> ((0L, 0L))))
  }
}
