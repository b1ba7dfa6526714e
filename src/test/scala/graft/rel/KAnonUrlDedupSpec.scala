package graft.rel

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{DedupQueries, TextQueries}

/** Invariants of the r11 privacy/crawl additions, driven through the
  * REAL registered queries over a tiny fixture dir (not a copy of
  * their logic): the k-anonymity audit's class accounting and the
  * URL-level dedup's keeper selection.
  */
class KAnonUrlDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Fixture tables shaped like the driver testdata (events.ts as
    * epoch NANOS — the Tables.load contract).
    */
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("kanon_url").toString
    val base = 1704067200L * 1000000000L // 2024-01-01T00:00Z ns
    // "view": 5 rows in ONE quasi-identifier class (hour 0, value
    // bucket 0) -> k_min = 5, anonymous. "click": 2 rows in two
    // DIFFERENT value kilobuckets -> two singleton classes, all rows
    // at risk.
    val ev = Seq(
      (0L, base, 1L, "view", 10.0, "{}"),
      (1L, base + 1L, 2L, "view", 20.0, "{}"),
      (2L, base + 2L, 3L, "view", 30.0, "{}"),
      (3L, base + 3L, 4L, "view", 40.0, "{}"),
      (4L, base + 4L, 5L, "view", 50.0, "{}"),
      (5L, base + 5L, 6L, "click", 10.0, "{}"),
      (6L, base + 6L, 7L, "click", 1500.0, "{}"))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    // URL synth: path = doc_id % 7, TLD = .org iff doc_id % 3 == 0.
    // ids 0 and 21 agree on BOTH -> one canonical class; 7 shares the
    // path but lands on .com -> distinct; 1 is a plain singleton.
    val docs = Seq(0L, 21L, 7L, 1L)
      .map(id => (id, s"doc $id body", "en", "web", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("dq_k_anon: class accounting, risk ppm, and the k>=5 flag") {
    val out = LogAnalytics.queries("dq_k_anon")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_classes"),
          r.getAs[Long]("k_min"), r.getAs[Long]("n_rows_at_risk"),
          r.getAs[Long]("risk_ppm"), r.getAs[Int]("k5_anonymous")))
      .toMap
    assert(out("view") == ((5L, 1L, 5L, 0L, 0L, 1)))
    assert(out("click") == ((2L, 2L, 1L, 2L, 1000000L, 0)))
  }

  test("dd_url_dedup: canonical-URL classes keep exactly min doc_id") {
    val rows = DedupQueries.queries("dd_url_dedup")(spark, dir)
      .collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("keeper_id"), r.getAs[Long]("class_size"),
        r.getAs[Int]("is_url_dup"))).toMap
    assert(byId(0L) == ((0L, 2L, 0)))   // keeper of the {0, 21} class
    assert(byId(21L) == ((0L, 2L, 1)))  // flagged as the URL-dup
    assert(byId(7L) == ((7L, 1L, 0)))   // same path, other TLD
    assert(byId(1L) == ((1L, 1L, 0)))
    // exactly one keeper per class, and the keeper is never flagged
    val classes = rows.groupBy(_.getAs[String]("url_canon"))
    classes.foreach { case (_, rs) =>
      assert(rs.count(_.getAs[Int]("is_url_dup") == 0) == 1)
    }
  }

  test("st_k_anon: streaming replay hash-equals the batch audit") {
    val batch = LogAnalytics.queries("dq_k_anon")(spark, dir)
      .collect().map(_.toSeq).toSet
    val stream = graft.streaming.StreamQueries.queries("st_k_anon")(
      spark, dir).collect().map(_.toSeq).toSet
    assert(stream == batch)
  }

  test("t_fim_split: cuts replay splitmix halves; middle_md5 is the " +
      "real extracted span") {
    val out = TextQueries.queries("t_fim_split")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    Seq(0L, 21L, 7L, 1L).foreach { id =>
      val toks = s"doc $id body".split(' ')
      val n = toks.length.toLong
      val x = graft.functions.SplitMix64.mix(id)
      val lo = x & 0xffffffffL
      val hi = x >>> 32
      val a = math.min(lo % (n + 1), hi % (n + 1))
      val b = math.max(lo % (n + 1), hi % (n + 1))
      val mid = toks.slice(a.toInt, b.toInt).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(mid.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val r = out(id)
      assert(r.getAs[Long]("cut_a") == a && r.getAs[Long]("cut_b") == b)
      assert(r.getAs[Long]("len_middle") == b - a)
      assert(r.getAs[String]("middle_md5") == md)
    }
  }

  test("unimaxMix: water-filling caps small sources, levels large ones") {
    import spark.implicits._
    // caps (16/5): A=320 B=640 C=3200; budget (29/10 of 1300) = 3770.
    // A and B run their full cap; C is leveled at w = 3770-960 = 2810.
    val per = Seq(("A", 100L), ("B", 200L), ("C", 1000L))
      .toDF("source", "toks")
    val out = graft.pipeline.Sampling
      .unimaxMix(per, 16L, 5L, 29L, 10L).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("allocation"), r.getAs[Int]("capped"),
          r.getAs[Long]("epochs_ppm"))).toMap
    assert(out("A") == ((320L, 1, 3200000L)))
    assert(out("B") == ((640L, 1, 3200000L)))
    assert(out("C") == ((2810L, 0, 2810000L)))
    // allocations exhaust the budget exactly when the boundary divides
    assert(out.values.map(_._1).sum == 3770L)
    // all-capped degenerate case: budget above the cap sum -> every
    // source runs its cap, no division by the empty uncapped set
    val all = graft.pipeline.Sampling
      .unimaxMix(per, 1L, 1L, 5L, 1L).collect()
      .map(r => (r.getAs[Int]("capped"),
        r.getAs[Long]("allocation") == r.getAs[Long]("cap_tokens")))
    assert(all.forall(_ == ((1, true))))
  }
}
