package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the integer EWMA, time-weighted average,
  * key-skew profiler, and corpus-novelty entries — driven through the
  * REAL registered queries over per-test fixture dirs.
  */
class SmoothNoveltySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = 1704067200L * 1000000000L // 2024-01-01T00:00Z ns
  private val day = 86400L * 1000000000L

  private def eventsDir(
      rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("sn_ev").toString
    rows.map { case (id, ns, u, t, v) => (id, ns, u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  private def run(name: String, dir: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, dir)

  test("ts_ewma: s1 = x1, st = (3s + x) div 4, exact integers") {
    // one event per day: 4.0, 0.0, 8.0 -> xu 40000, 0, 80000
    // s: 40000, (120000+0)/4 = 30000, (90000+80000)/4 = 42500
    val dir = eventsDir(Seq(
      (0L, base, 1L, "click", 4.0),
      (1L, base + day, 1L, "click", 0.0),
      (2L, base + 2 * day, 1L, "click", 8.0)))
    val got = run("ts_ewma", dir).orderBy("st")
      .select("xu", "ewma_u").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((40000L, 40000L), (0L, 30000L), (80000L, 42500L)))
  }

  test("ts_holt: level/trend fold exact incl. negative-trend truncation") {
    // daily xu: 40000, 0, 80000, 3000
    // d1: l=40000 b=0;            d2: l=30000 b=-10000 div 4 = -2500
    // d3: l=162500 div 4 = 40625, b=(10625-7500) div 4 = 781 (781.25 truncates)
    // d4: l=127218 div 4 = 31804 (31804.5), b=(-8821+2343) div 4 = -1619
    //     (-1619.5 truncates toward zero — the semantics DuckDB // shares)
    val dir = eventsDir(Seq(
      (0L, base, 1L, "click", 4.0),
      (1L, base + day, 1L, "click", 0.0),
      (2L, base + 2 * day, 1L, "click", 8.0),
      (3L, base + 3 * day, 1L, "click", 0.3)))
    val got = run("ts_holt", dir).orderBy("st")
      .select("xu", "level_u", "trend_u", "forecast_u").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (40000L, 40000L, 0L, 40000L),
      (0L, 30000L, -2500L, 27500L),
      (80000L, 40625L, 781L, 41406L),
      (3000L, 31804L, -1619L, 30185L)))
  }

  test("ts_holt_winters: fixed dow indices + Holt fold on the " +
      "de-seasonalized series") {
    // days 0,1,7,8 -> two dows; xu: 40000, 0, 20000, 20000
    // m = 20000; su(dow0) = 10000, su(dow1) = -10000
    // xd: 30000, 10000, 10000, 30000; Holt fold:
    // l: 30000, 25000, 20312, 21152; b: 0, -1250, -2109, -1371
    val dir = eventsDir(Seq(
      (0L, base, 1L, "click", 4.0),
      (1L, base + day, 1L, "click", 0.0),
      (2L, base + 7 * day, 1L, "click", 2.0),
      (3L, base + 8 * day, 1L, "click", 2.0)))
    val got = run("ts_holt_winters", dir).orderBy("st")
      .select("xu", "season_u", "level_u", "trend_u", "refit_u").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (40000L, 10000L, 30000L, 0L, 40000L),
      (0L, -10000L, 25000L, -1250L, 15000L),
      (20000L, 10000L, 20312L, -2109L, 30312L),
      (20000L, -10000L, 21152L, -1371L, 11152L)))
  }

  test("la_gini: hand concentration values, uniform scores zero") {
    // u1: 1 event, u2: 3 events -> x=[1,3], G = 0.25 exactly
    val skew = eventsDir(Seq(
      (0L, base, 1L, "click", 1.0),
      (1L, base, 2L, "click", 1.0),
      (2L, base + day, 2L, "click", 1.0),
      (3L, base + 2 * day, 2L, "click", 1.0)))
    val g1 = run("la_gini", skew).collect()(0)
    assert(g1.getAs[Long]("n_users") == 2L)
    assert(g1.getAs[Long]("total_events") == 4L)
    assert(g1.getAs[Long]("gini_ppm") == 250000L)
    // perfectly uniform activity -> 0
    val flat = eventsDir(Seq(
      (0L, base, 1L, "click", 1.0), (1L, base + day, 1L, "click", 1.0),
      (2L, base, 2L, "click", 1.0), (3L, base + day, 2L, "click", 1.0)))
    assert(run("la_gini", flat).collect()(0).getAs[Long]("gini_ppm") == 0L)
  }

  test("dd_impact_report: cross-source dup charges the non-keeper source") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("sn_docs").toString
    Seq((1L, "a b c", "en", "src1", 5L), (2L, "d d", "en", "src1", 3L),
        (3L, "a b c", "en", "src2", 5L), (4L, "x", "en", "src2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = run("dd_impact_report", d).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_removed"),
          r.getAs[Long]("tokens_total"), r.getAs[Long]("tokens_removed"),
          r.getAs[Long]("removed_ppm")))).toMap
    assert(got("src1") == ((2L, 0L, 5L, 0L, 0L)))
    assert(got("src2") == ((2L, 1L, 4L, 3L, 500000L)))
  }

  test("ts_twa: trapezoid mean exact; zero-span and single users drop") {
    val dir = eventsDir(Seq(
      // u1: values 1,2,3 at 0/10/20s -> twa exactly 2.0 (20000u)
      (0L, base, 1L, "click", 1.0),
      (1L, base + 10L * 1000000000L, 1L, "click", 2.0),
      (2L, base + 20L * 1000000000L, 1L, "click", 3.0),
      // u2: single event -> no span
      (3L, base, 2L, "view", 9.0),
      // u3: two events in the same second -> span 0
      (4L, base, 3L, "view", 1.0),
      (5L, base + 500L, 3L, "view", 2.0)))
    val rows = run("ts_twa", dir).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1L && rows.head.getLong(1) == 20L &&
      rows.head.getLong(2) == 20000L)
  }

  test("la_key_skew: profile row matches hand counts") {
    val dir = eventsDir(Seq(
      (0L, base, 1L, "a", 0.0), (1L, base + 1L, 1L, "a", 0.0),
      (2L, base + 2L, 1L, "a", 0.0),
      (3L, base, 2L, "a", 0.0),
      (4L, base, 3L, "a", 0.0), (5L, base + 1L, 3L, "a", 0.0)))
    val r = run("la_key_skew", dir).collect().head
    // counts per key: [3, 1, 2]
    assert(r.getLong(0) == 3L && r.getLong(1) == 6L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 2.0)            // p50 of [1,2,3]
    assert(math.abs(r.getDouble(4) - 2.98) < 1e-9) // p99 interpolated
    assert(r.getLong(5) == 500000L)          // 3/6 in ppm
  }

  test("ts_pop: DoD/WoW lags and ppm change, nulls before history exists") {
    // one event per day, xu = 10000*(d+1) for d = 0..7
    val dir = eventsDir((0 to 7).map(dd =>
      (dd.toLong, base + dd * day, 1L, "click", (dd + 1).toDouble)))
    val rows = run("ts_pop", dir).orderBy("st").collect()
    assert(rows.length == 8)
    assert(rows.head.isNullAt(3) && rows.head.isNullAt(4) &&
      rows.head.isNullAt(5))
    // every later day: dod exactly +10000
    rows.tail.foreach(r => assert(r.getLong(3) == 10000L))
    // day 7: wow vs day 0 -> 80000-10000, ppm 7e6
    val d7 = rows.last
    assert(d7.getLong(4) == 70000L && d7.getLong(5) == 7000000L)
    // days 1..6 have no 7-day lag yet
    rows.slice(1, 7).foreach(r => assert(r.isNullAt(4) && r.isNullAt(5)))
  }

  private def docsDir(rows: Seq[(Long, String, String, Long)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("sn_doc").toString
    rows.map { case (id, t, src, nc) => (id, t, "en", src, nc) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("t_rbo: identical rankings score 1 - 2^-10; disjoint score 0") {
    // distinct-token count i and n_chars 10*i rank identically
    val same = docsDir((1 to 12).map(i =>
      (i.toLong, (1 to i).map(k => s"t$k").mkString(" "), "web", 10L * i)))
    val r1 = run("t_rbo", same).collect().head
    assert(r1.getDouble(0) == 0.999023 && r1.getLong(1) == 10L)
    // vocabulary order and length order anti-correlated -> empty overlap
    val disj = docsDir((1 to 20).map { i =>
      val nu = if (i <= 10) 20 + i else i // 0-9 rich vocab...
      (i.toLong, (1 to nu).map(k => s"t$k").mkString(" "), "web",
        if (i <= 10) 10L else 1000L + i) // ...but short
    })
    val r2 = run("t_rbo", disj).collect().head
    assert(r2.getDouble(0) == 0.0 && r2.getLong(1) == 0L)
  }

  test("t_negative_pairs: 3 in-range non-self partners per doc") {
    val dir = docsDir((0 until 7).map(i =>
      (i.toLong, s"doc $i", if (i % 2 == 0) "web" else "book", 100L + i)))
    val rows = run("t_negative_pairs", dir).collect()
    assert(rows.length == 21) // 3 per doc, every partner resolves
    rows.foreach { r =>
      val (id, neg) = (r.getLong(0), r.getLong(2))
      assert(neg >= 0 && neg < 7 && neg != id)
      // same_source consistent with the parity-assigned sources
      assert(r.getInt(3) == (if (id % 2 == neg % 2) 1 else 0))
    }
    // deterministic: a rerun yields the identical pair set
    val again = run("t_negative_pairs", dir).collect()
    assert(rows.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted))
  }

  // shared fixture for the share/uniques/entry-exit/histogram family:
  // u1 [click, view] then a >30-min gap to [error]; u2 [view, view]
  private lazy val funnelDir: String = eventsDir(Seq(
    (0L, base, 1L, "click", 0.0),
    (1L, base + 5L * 1000000000L, 1L, "view", 0.0),
    (2L, base + 2005L * 1000000000L, 1L, "error", 0.0),
    (3L, base, 2L, "view", 0.0),
    (4L, base + 1L * 1000000000L, 2L, "view", 0.0)))

  test("la_share_parent: ppm shares of day and corpus") {
    val got = run("la_share_parent", funnelDir).collect()
      .map(r => r.getString(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(got("click") == ((200000L, 1000000L)))
    assert(got("view") == ((600000L, 1000000L)))
    assert(got("error") == ((200000L, 1000000L)))
  }

  test("la_cum_uniques: first-sight counting per type") {
    val got = run("la_cum_uniques", funnelDir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got("click") == ((1L, 1L)) && got("error") == ((1L, 1L)))
    assert(got("view") == ((2L, 2L))) // u1 and u2 both first-sighted
  }

  test("la_entry_exit: session first/last types, singletons reflexive") {
    val got = run("la_entry_exit", funnelDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("click", "view", 1L), ("error", "error", 1L),
      ("view", "view", 1L)))
  }

  test("la_interarrival_hist: log2 buckets with exact bounds") {
    val got = run("la_interarrival_hist", funnelDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // gaps: 1s (bucket 1 = [0,1]), 5s (bucket 3 = [4,7]),
    // 2000s (bucket 11 = [1024, 2047])
    assert(got == Set((1, 0L, 1L, 1L), (3, 4L, 7L, 1L),
      (11, 1024L, 2047L, 1L)))
  }

  test("ts_cusum: accumulates drift above the mean, clamps at zero") {
    // xu = 10000*[1,1,1,5,5], mu = 26000
    // S = [0, 0, 0, 24000, 48000]
    val dir = eventsDir((0 until 5).map(dd =>
      (dd.toLong, base + dd * day, 1L, "click",
        if (dd < 3) 1.0 else 5.0)))
    val got = run("ts_cusum", dir).orderBy("st")
      .select("cusum_u").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 0L, 0L, 24000L, 48000L))
  }

  test("la_convert_latency: only forward conversions count") {
    val dir = eventsDir(Seq(
      (0L, base, 1L, "signup", 0.0),
      (1L, base + 100L * 1000000000L, 1L, "purchase", 0.0),
      (2L, base, 2L, "signup", 0.0),
      (3L, base + 50L * 1000000000L, 2L, "purchase", 0.0),
      (4L, base + 100L * 1000000000L, 3L, "signup", 0.0),
      (5L, base, 3L, "purchase", 0.0))) // purchase precedes signup
    val r = run("la_convert_latency", dir).collect().head
    assert(r.getLong(0) == 2L)           // u1, u2 convert; u3 doesn't
    assert(r.getLong(1) == 50L && r.getLong(5) == 100L)
    assert(r.getDouble(3) == 75.0)       // median of {50, 100}
  }

  test("t_qnorm: per-source rank normalization spans [0, 1e6]") {
    // source A: three docs with strictly decreasing quality;
    // source B: a single doc (norm defined as 0)
    val dir = docsDir(Seq(
      (0L, "the of and to in is that it", "A", 0L), // all stopwords
      (1L, "the cat sat on mat quickly", "A", 0L),
      (2L, "zzzz qqqq xxxx wwww", "A", 0L),         // no stopwords
      (3L, "the dog", "B", 0L)))
    val rows = run("t_qnorm", dir).collect()
    val a = rows.filter(_.getString(1) == "A")
      .sortBy(_.getInt(3)).map(r => (r.getLong(2), r.getLong(4)))
    assert(a.map(_._2).toSeq == Seq(0L, 500000L, 1000000L))
    // rank order follows the integer score order (desc)
    assert(a.map(_._1).toSeq == a.map(_._1).sortBy(-_).toSeq)
    val b = rows.filter(_.getString(1) == "B")
    assert(b.length == 1 && b.head.getLong(4) == 0L)
  }

  test("dq_constraints: dirty rows fire the right rules") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("dq_ev").toString
    Seq(
      (0L, base, 1L, "click", 1.0, "{}"),
      (0L, base + 1L, 1L, "view", 2.0, "{}"),              // dup id
      (2L, base + 2L, 1L, "teleport", 3.0, "{}"),          // bad type
      (3L, base + 3L, 1L, "click", -4.0, "{}"),            // bad value
      (4L, base - 86400L * 1000000000L, 1L, "view", 5.0, "{}")) // 2023
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = run("dq_constraints", d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("id_not_null" -> 0L, "id_unique" -> 1L,
      "value_range" -> 1L, "ts_window" -> 1L, "type_domain" -> 1L))
  }

  test("dq_completeness: a silent day gap is counted") {
    // days 0, 1, 3 present -> span 4, observed 3, missing 1
    val dir = eventsDir(Seq(
      (0L, base, 1L, "click", 0.0),
      (1L, base + day, 1L, "click", 0.0),
      (2L, base + 3 * day, 1L, "click", 0.0)))
    val r = run("dq_completeness", dir).collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L &&
      r.getLong(3) == 4L && r.getLong(4) == 1L)
  }

  test("dq_referential: orphan fact rows are counted per edge") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("dq_ref").toString
    Seq((1L, 10L), (2L, 10L), (9L, 99L)) // order 9 and part 99 unknown
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    Seq((1L, 100L), (2L, 101L), (3L, 999L)) // customer 999 unknown
      .toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    Seq(Tuple1(10L)).toDF("p_partkey")
      .coalesce(1).write.parquet(s"$d/part.parquet")
    Seq(Tuple1(100L), Tuple1(101L)).toDF("c_custkey")
      .coalesce(1).write.parquet(s"$d/customer.parquet")
    val got = RelQueries.queries("dq_referential")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("lineitem_orders" -> 1L, "lineitem_part" -> 1L,
      "orders_customer" -> 1L))
  }

  test("la_top_paths: deterministic path strings, count-ordered cut") {
    val dir = eventsDir(Seq(
      (0L, base, 1L, "view", 0.0),
      (1L, base + 1000000000L, 1L, "click", 0.0),
      (2L, base, 2L, "view", 0.0),
      (3L, base + 1000000000L, 2L, "click", 0.0),
      (4L, base, 3L, "click", 0.0)))
    val got = run("la_top_paths", dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("view>click", 2L), ("click", 1L)))
  }

  test("la_attribution: window edges and the three models") {
    val dir = eventsDir(Seq(
      (0L, base, 1L, "click", 0.0),                       // first touch
      (1L, base + 10L * 1000000000L, 1L, "click", 0.0),   // last touch
      (2L, base + 100L * 1000000000L, 1L, "purchase", 0.0),
      // u2: click exactly AT the purchase second -> excluded (cs < ps)
      (3L, base + 50L * 1000000000L, 2L, "click", 0.0),
      (4L, base + 50L * 1000000000L, 2L, "purchase", 0.0),
      // u3: click 8 days before -> outside the 7-day window
      (5L, base, 3L, "click", 0.0),
      (6L, base + 8L * 86400L * 1000000000L, 3L, "purchase", 0.0)))
    val rows = run("la_attribution", dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L &&
      r.getLong(2) == 1L && r.getLong(3) == 2L && r.getLong(4) == 500000L)
  }

  test("dd_novelty: first occurrence scores 1e6 ppm, copies score 0") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("sn_doc").toString
    Seq(
      (0L, "a b c d"),     // both grams first here -> ppm 1e6
      (1L, "a b c d"),     // exact copy -> ppm 0
      (2L, "b c d e f"),   // 1 of 3 grams seen -> 2 novel, ppm 666666
      (3L, "x y"))         // under 3 tokens -> absent
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = run("dd_novelty", d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 1000000L),
      (1L, 2L, 0L, 0L),
      (2L, 3L, 2L, 666666L)))
  }
}
