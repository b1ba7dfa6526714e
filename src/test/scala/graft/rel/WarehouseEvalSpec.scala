package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-7 warehouse/eval additions, driven through
  * the REAL registered queries over a tiny fixture dir (not a copy of
  * their logic): SCD2 interval assembly, winsorized robust stats, the
  * blocked Levenshtein fuzzy join, langid classifier metrics, and the
  * compaction planner.
  */
class WarehouseEvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Fixture tables under one temp dir, shaped like the driver testdata
    * (events.ts as epoch NANOS — the Tables.load contract).
    */
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("wh_eval").toString
    val base = 1704067200L * 1000000000L // 2024-01-01T00:00Z ns
    // user 1: view,view,click,view  user 2: click  (runs: v×2, c, v | c)
    val ev = Seq(
      (0L, base + 0L, 1L, "view", 1.0, "{}"),
      (1L, base + 60L * 1000000000L, 1L, "view", 2.0, "{}"),
      (2L, base + 120L * 1000000000L, 1L, "click", 3.0, "{}"),
      (3L, base + 180L * 1000000000L, 1L, "view", 100.0, "{}"),
      (4L, base + 0L, 2L, "click", 5.0, "{}"))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val docs = Seq(
      (0L, "the cat sat on the mat and it is that", "en"),
      (1L, "der hund und die katze mit dem ist den", "de"),
      (2L, "le chat et les chiens est une dans le parc", "fr"),
      (3L, "the dog is in the house and it is big", "en"),
      (4L, "zzz qqq xxx", "en")) // no markers -> predicted und
      .map { case (id, t, l) => (id, t, l, "web", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    Seq("red bolt", "hot bolt", "red gear", "blue bolt", "small gear")
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("p_partkey", "p_name")
      .coalesce(1).write.parquet(s"$d/part.parquet")
    d
  }

  private def run(name: String): DataFrame = {
    val all = graft.SparkEntry.queries
    all(name)(spark, dir)
  }

  test("la_scd2: versions tile each user's timeline with no same-type neighbors") {
    val rows = run("la_scd2")
      .orderBy("user_id", "version").collect()
    // user 1 collapses to 3 runs (view, click, view), user 2 to 1
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 1), (1L, 2), (1L, 3), (2L, 1)))
    val u1 = rows.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(2)).toSeq == Seq("view", "click", "view"))
    // adjacency: valid_to(v) == valid_from(v+1); open tail is null
    u1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) == b.getLong(3))
    }
    assert(u1.last.isNullAt(4) && rows.last.isNullAt(4))
    // masses: run row counts sum to the event count
    assert(rows.map(_.getLong(5)).sum == 5L)
  }

  test("la_winsorized: cut points bound the mean and clips are counted") {
    val r = run("la_winsorized")
      .filter(col("event_type") === "view").collect().head
    val (lo, hi, nLo, nHi, mean) =
      (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))
    assert(lo <= hi)
    assert(mean >= lo && mean <= hi)
    // 3 values (1,2,100): p05/p95 interpolate inside, clipping both ends
    assert(nLo == 1 && nHi == 1)
    // the winsorized mean must sit strictly below the raw mean (34.33)
    assert(mean < 34.0)
  }

  test("j_fuzzy_leven: pairs stay inside blocks, canonical, within distance") {
    val rows = run("j_fuzzy_leven").collect()
    // "red bolt"/"hot bolt" (dist 3) and "red bolt"/"blue bolt" (dist 4,
    // a<b gives blue<red) match in block "bolt"; gear pair "red"/"small"
    // is dist 5 -> excluded
    val pairs = rows.map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    assert(pairs == Set(
      ("bolt", "hot bolt", "red bolt", 3),
      ("bolt", "blue bolt", "hot bolt", 4),
      ("bolt", "blue bolt", "red bolt", 4)))
    rows.foreach { r =>
      assert(r.getString(1) < r.getString(2) && r.getInt(3) <= 4)
      assert(r.getString(1).endsWith(r.getString(0)) &&
        r.getString(2).endsWith(r.getString(0)))
    }
  }

  test("t_langid_metrics: confusion masses reconcile per class") {
    val rows = run("t_langid_metrics").collect()
    val byCls = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toMap
    // en: docs 0,3 predicted en (tp=2), doc 4 declared en predicted und
    val (tp, fp, fn, prec, rec, f1) = byCls("en")
    assert(tp == 2 && fp == 0 && fn == 1)
    assert(prec == 1000000L && rec == 666666L)
    // F1 = harmonic mean in ppm, never above the arithmetic mean
    assert(f1 <= (prec + rec) / 2 && f1 > 0)
    // und: predicted-only class -> tp=0, fp=1, all ratios 0
    assert(byCls("und") == ((0L, 1L, 0L, 0L, 0L, 0L)))
    // masses: tp+fn sums to the declared corpus size
    assert(rows.map(r => r.getLong(1) + r.getLong(3)).sum == 5L)
  }

  test("t_compaction_plan: files tile the corpus in order, sizes near target") {
    val rows = run("t_compaction_plan").collect()
    assert(rows.map(_.getLong(2)).sum == 5L) // every doc planned once
    val totalChars = run("t_compaction_plan")
      .agg(sum("total_chars")).collect().head.getLong(0)
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .agg(sum("n_chars")).collect().head.getLong(0)
    assert(totalChars == corpus)
    // within a bucket, file_seq order == doc-id order (greedy is
    // sequential) and every file starts before the target boundary
    rows.groupBy(_.getLong(0)).foreach { case (_, fs) =>
      val ordered = fs.sortBy(_.getInt(1))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) < b.getLong(4))
        case _ =>
      }
    }
  }
}
