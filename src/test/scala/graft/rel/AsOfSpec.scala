package graft.rel

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics on hand-checkable data + the extensions-based
  * SQL function registration.
  */
class AsOfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("as-of join picks the latest state at or before each probe time") {
    import spark.implicits._
    val probe = Seq(
      ("a", 5L, 1), ("a", 10L, 2), ("a", 15L, 3),
      ("b", 7L, 4), ("b", 100L, 5), ("c", 3L, 6))
      .toDF("k", "t", "probe_id")
    val state = Seq(
      ("a", 5L, "s@5"), ("a", 12L, "s@12"),
      ("b", 1L, "s@1"), ("b", 50L, "s@50"))
      .toDF("k", "st", "v")
    val out = AsOf.join(probe, state, keys = Seq("k"),
        leftTime = "t", rightTime = "st", stateCols = Seq("v"))
      .collect().map(r => r.getAs[Int]("probe_id") -> r.getAs[String]("v"))
      .toMap
    assert(out(1) == "s@5")   // equal time matches (inclusive)
    assert(out(2) == "s@5")   // before s@12
    assert(out(3) == "s@12")
    assert(out(4) == "s@1")
    assert(out(5) == "s@50")
    assert(out(6) == null)    // no state for key c
  }

  test("GraftExtensions injects SQL functions via withExtensions") {
    val prev = spark // materialize the shared session first
    // getOrCreate returns the active session and would skip extensions:
    // clear it so a fresh session (same SparkContext) is built with them
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.api.GraftExtensions)
        .getOrCreate()
      val h = s2.sql("SELECT rolling_hash('ab') AS h, " +
        "poly_eval(array(1.0d, 2.0d), 3.0d) AS p").collect()(0)
      assert(h.getLong(0) == 97L * 1000003L + 98L)
      assert(h.getDouble(1) == 7.0) // 1 + 2*3
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
