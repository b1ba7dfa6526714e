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

  test("native as-of operator matches the composed variant") {
    import spark.implicits._
    val probe = Seq(
      ("a", 5L, 1), ("a", 10L, 2), ("a", 15L, 3),
      ("b", 7L, 4), ("b", 100L, 5), ("c", 3L, 6))
      .toDF("k", "t", "probe_id")
    val state = Seq(
      ("a", 5L, "s@5"), ("a", 12L, "s@12"),
      ("b", 1L, "s@1"), ("b", 50L, "s@50"))
      .toDF("k", "st", "v")
    val out = AsOf.joinNative(probe, state, keys = Seq("k"),
        leftTime = "t", rightTime = "st", stateCols = Seq("v"))
      .collect().map(r => r.getAs[Int]("probe_id") -> r.getAs[String]("v"))
      .toMap
    assert(out == Map(1 -> "s@5", 2 -> "s@5", 3 -> "s@12",
      4 -> "s@1", 5 -> "s@50", 6 -> null))
    // physical plan actually uses the custom operator
    val plan = AsOf.joinNative(probe, state, Seq("k"), "t", "st", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
  }

  test("native as-of: larger randomized parity vs composed variant") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val probe = (1 to 2000).map(i =>
      (s"k${rnd.nextInt(20)}", rnd.nextInt(1000).toLong, i))
      .toDF("k", "t", "probe_id")
    val state = (1 to 500).map(i =>
      (s"k${rnd.nextInt(25)}", rnd.nextInt(1000).toLong, s"v$i"))
      .toDF("k", "st", "v")
    // dedupe state on (k, st): at equal times "latest" is ambiguous and
    // the two implementations may tie-break differently
    val st1 = state.groupBy("k", "st")
      .agg(org.apache.spark.sql.functions.max("v").as("v"))
    val composed = AsOf.join(probe, st1, Seq("k"), "t", "st", Seq("v"))
      .collect().map(r => (r.getInt(2), r.getAs[String]("v"))).sortBy(_._1)
    val native = AsOf.joinNative(probe, st1, Seq("k"), "t", "st", Seq("v"))
      .collect().map(r => (r.getInt(2), r.getAs[String]("v"))).sortBy(_._1)
    assert(native.toSeq == composed.toSeq)
  }

  test("native as-of: null keys and null times never match") {
    import spark.implicits._
    val probe = Seq(
      (Some("a"), Some(10L), 1), (None, Some(10L), 2),
      (Some("a"), None, 3))
      .toDF("k", "t", "probe_id")
    val state = Seq(
      (Some("a"), Some(5L), "ok"), (Some("a"), None, "null-time"),
      (None, Some(1L), "null-key"))
      .toDF("k", "st", "v")
    val out = AsOf.joinNative(probe, state, keys = Seq("k"),
        leftTime = "t", rightTime = "st", stateCols = Seq("v"))
      .collect().map(r => r.getAs[Int]("probe_id") -> r.getAs[String]("v"))
      .toMap
    assert(out == Map(1 -> "ok", 2 -> null, 3 -> null))
  }

  test("native as-of: non-nullable state cols are NULL on unmatched rows") {
    import spark.implicits._
    // Seq-of-tuples makes "amt" a non-nullable bigint: without the
    // nullability widening in the output projection, the bound reference
    // skips the null check and reads 0 (primitives) or NPEs (strings)
    // off the null-filled row instead of returning NULL.
    val probe = Seq(("a", 10L, 1), ("zzz", 10L, 2)).toDF("k", "t", "probe_id")
    val state = Seq(("a", 5L, 77L, "s")).toDF("k", "st", "amt", "label")
    val df = AsOf.joinNative(probe, state, keys = Seq("k"),
      leftTime = "t", rightTime = "st", stateCols = Seq("amt", "label"))
    assert(!state.schema("amt").nullable) // precondition of the regression
    val rows = df.collect().map(r => (r.getAs[Int]("probe_id"),
      if (r.isNullAt(r.fieldIndex("amt"))) null else r.getAs[Long]("amt"),
      r.getAs[String]("label"))).toSet
    assert(rows == Set((1, 77L, "s"), (2, null, null)))
    // declared output schema is nullable for state columns
    assert(df.schema("amt").nullable && df.schema("label").nullable)
  }

  test("as-of rejects state columns that collide with left columns") {
    import spark.implicits._
    val probe = Seq(("a", 10L, "x")).toDF("k", "t", "v")
    val state = Seq(("a", 5L, "s")).toDF("k", "st", "v")
    intercept[IllegalArgumentException] {
      AsOf.join(probe, state, Seq("k"), "t", "st", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      AsOf.joinNative(probe, state, Seq("k"), "t", "st", Seq("v"))
    }
  }

  test("left-only filters push below the native as-of join") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val probe = (1 to 100).map(i => (s"k${i % 5}", i.toLong, i))
      .toDF("k", "t", "probe_id")
    val state = (1 to 20).map(i => (s"k${i % 5}", i.toLong * 3, s"v$i"))
      .toDF("k", "st", "v")
    val joined = AsOf.joinNative(probe, state, Seq("k"), "t", "st", Seq("v"))
    val filtered = joined.filter(col("probe_id") > 90) // left-only predicate
    val optimized = filtered.queryExecution.optimizedPlan.toString
    // the Filter must appear BELOW AsOfJoinPlan (inside its left child)
    val idxJoin = optimized.indexOf("AsOfJoinPlan")
    val idxFilter = optimized.indexOf("Filter")
    assert(idxJoin >= 0 && idxFilter > idxJoin,
      s"filter not pushed below the join:\n$optimized")
    // results are unchanged by the pushdown
    val rows = filtered.collect().map(r => r.getAs[Int]("probe_id")).sorted
    assert(rows.toSeq == (91 to 100))
    // state-column predicates must NOT push (null semantics)
    val keepAbove = joined.filter(col("v").isNull)
    val opt2 = keepAbove.queryExecution.optimizedPlan.toString
    val j2 = opt2.indexOf("AsOfJoinPlan")
    val f2 = opt2.indexOf("Filter")
    assert(f2 >= 0 && (j2 < 0 || f2 < j2),
      s"state filter wrongly pushed:\n$opt2")
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
        "poly_eval(array(1.0d, 2.0d), 3.0d) AS p, " +
        "cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
        .collect()(0)
      assert(h.getLong(0) == 97L * 1000003L + 98L)
      assert(h.getDouble(1) == 7.0) // 1 + 2*3
      assert(h.getDouble(2) == 1.0)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
