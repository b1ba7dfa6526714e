package graft.rel

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed range join: exact parity with the naive inequality join,
  * planned as an equi join (no BroadcastNestedLoopJoin).
  */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bucketed range join matches naive inequality join") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val points = (1 to 2000)
      .map(i => (i.toLong, rnd.nextInt(100000).toLong))
      .toDF("pid", "t")
    val intervals = (1 to 300).map { i =>
      val s = rnd.nextInt(100000).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(5000)) // spans cross many buckets
    }.toDF("iid", "cs", "ce")

    val bucketed = RangeJoin.pointInInterval(points, intervals,
        "t", "cs", "ce", bucketWidth = 1000L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val naive = points.join(intervals,
        col("t") >= col("cs") && col("t") < col("ce"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(bucketed == naive)
    assert(naive.nonEmpty)
  }

  test("bucketed range join plans as an equi join, not BNLJ") {
    import spark.implicits._
    val points = (1 to 50).map(i => (i.toLong, i.toLong * 10)).toDF("pid", "t")
    val intervals = (1 to 5).map(i => (i.toLong, i * 100L, i * 100L + 50))
      .toDF("iid", "cs", "ce")
    val plan = RangeJoin.pointInInterval(points, intervals,
      "t", "cs", "ce", 100L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val naivePlan = points.join(intervals,
        col("t") >= col("cs") && col("t") < col("ce"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"), naivePlan)
  }

  test("bucket ids are exact beyond 2^53 and for negative times") {
    import spark.implicits._
    // 2^53 + k is where double arithmetic starts rounding: with the old
    // floor(col/width) double division, point and interval could land in
    // different buckets and the match was silently dropped.
    val base = 9007199254740993L // 2^53 + 1
    val points = Seq(
      (1L, base),           // inside [base-1, base+2)
      (2L, base + 999L),    // inside [base+500, base+1500)
      (3L, -base))          // negative side floor semantics
      .toDF("pid", "t")
    val intervals = Seq(
      (1L, base - 1L, base + 2L),
      (2L, base + 500L, base + 1500L),
      (3L, -base - 1L, -base + 1L))
      .toDF("iid", "cs", "ce")
    val got = RangeJoin.pointInInterval(points, intervals,
        "t", "cs", "ce", bucketWidth = 1000L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val naive = points.join(intervals,
        col("t") >= col("cs") && col("t") < col("ce"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == naive)
    assert(got == Set((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("empty and single-bucket intervals behave") {
    import spark.implicits._
    val points = Seq((1L, 10L), (2L, 25L)).toDF("pid", "t")
    val intervals = Seq(
      (1L, 10L, 10L), // empty: matches nothing
      (2L, 20L, 30L)) // single bucket
      .toDF("iid", "cs", "ce")
    val out = RangeJoin.pointInInterval(points, intervals,
        "t", "cs", "ce", 1000L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((2L, 2L)))
  }

  test("interval overlap join matches naive; multi-bucket pairs emit once") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 800).map { i =>
      val s = rnd.nextInt(50000).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(4000)) // many spans >> bucket
    }.toDF("lid", "ls", "le")
    val right = (1 to 200).map { i =>
      val s = rnd.nextInt(50000).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(4000))
    }.toDF("rid", "rs", "re")
    val bucketed = RangeJoin.intervalOverlapJoin(left, right,
        "ls", "le", "rs", "re", bucketWidth = 1000L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = left.join(right,
        col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // exact MULTISET equality: duplicates from shared buckets would
    // fail this even when the distinct pair sets agree
    assert(bucketed.sorted.toSeq == naive.sorted.toSeq)
    assert(naive.nonEmpty)
  }

  test("interval overlap: half-open boundaries, empty intervals dropped") {
    import spark.implicits._
    val left = Seq((1L, 10L, 20L), (2L, 30L, 30L)).toDF("lid", "ls", "le")
    val right = Seq(
      (1L, 20L, 25L), // touches l1's end: half-open -> NO overlap
      (2L, 19L, 22L), // overlaps l1 by one unit
      (3L, 5L, 10L)) // ends exactly at l1's start -> NO overlap
      .toDF("rid", "rs", "re")
    val out = RangeJoin.intervalOverlapJoin(left, right,
        "ls", "le", "rs", "re", 7L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("2-D point-in-box matches the naive join, multiset-exact, no BNLJ") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (1 to 1500)
      .map(i => (i.toLong, rnd.nextInt(1000).toLong,
        rnd.nextInt(1000).toLong))
      .toDF("pid", "px", "py")
    // overlapping boxes spanning several cells on both axes
    val boxes = (1 to 80).map { i =>
      val x1 = rnd.nextInt(900).toLong
      val y1 = rnd.nextInt(900).toLong
      (i.toLong, x1, y1, x1 + 1 + rnd.nextInt(200),
        y1 + 1 + rnd.nextInt(200))
    }.toDF("bid", "x1", "y1", "x2", "y2")
    val bucketed = RangeJoin.pointInBox(points, boxes, "px", "py",
        "x1", "y1", "x2", "y2", cellW = 64L, cellH = 64L)
      .select("pid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = points.join(boxes,
        col("px") >= col("x1") && col("px") < col("x2") &&
          col("py") >= col("y1") && col("py") < col("y2"))
      .select("pid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // multiset equality: a (point, box) pair can meet in only the
    // point's single cell, so NO duplicates may exist
    assert(bucketed.sorted.toSeq == naive.sorted.toSeq)
    assert(naive.length > 100)
    val plan = RangeJoin.pointInBox(points, boxes, "px", "py",
      "x1", "y1", "x2", "y2", 64L, 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("2-D boxes are half-open and degenerate boxes drop") {
    import spark.implicits._
    val points = Seq((1L, 10L, 10L)).toDF("pid", "px", "py")
    val boxes = Seq(
      (1L, 10L, 10L, 11L, 11L), // contains (10, 10)
      (2L, 5L, 5L, 10L, 20L),   // x2 = 10 exclusive -> no match
      (3L, 10L, 10L, 10L, 20L)) // degenerate x-extent -> dropped
      .toDF("bid", "x1", "y1", "x2", "y2")
    val out = RangeJoin.pointInBox(points, boxes, "px", "py",
        "x1", "y1", "x2", "y2", 4L, 4L)
      .select("bid").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L))
  }
}
