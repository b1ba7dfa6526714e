package graft.rel

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Normal-equation OLS: exact recovery of a planted linear model. */
class OlsFitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("fit2 recovers an exactly-linear relation with r2 = 1") {
    import spark.implicits._
    // y = 3 + 2*x1 + 5*x2, integer-exact, x1/x2 not collinear
    val rows = for (x1 <- 1 to 20; x2 <- 1 to 7)
      yield (x1.toLong, x2.toLong, 3L + 2 * x1 + 5 * x2)
    val df = rows.toDF("x1", "x2", "y")
    val r = OlsFit.fit2(df, col("y"), col("x1"), col("x2")).collect()(0)
    assert(r.getLong(0) == 140L)
    assert(r.getDouble(1) == 3.0 && r.getDouble(2) == 2.0 &&
      r.getDouble(3) == 5.0)
    assert(r.getDouble(4) == 1.0)
  }

  test("fit2 matches a hand-computed noisy fit") {
    import spark.implicits._
    // small perturbed data; compare against an independently solved
    // normal-equation system (computed offline with exact arithmetic)
    val df = Seq(
      (1L, 1L, 11L), (2L, 1L, 12L), (3L, 2L, 18L),
      (4L, 2L, 19L), (5L, 3L, 26L), (6L, 3L, 25L))
      .toDF("x1", "x2", "y")
    val r = OlsFit.fit2(df, col("y"), col("x1"), col("x2")).collect()(0)
    // brute-force solve of the same 3x3 system in test code
    val xs = df.collect().map(q => (q.getLong(0), q.getLong(1), q.getLong(2)))
    val n = xs.length.toDouble
    val s1 = xs.map(_._1).sum.toDouble; val s2 = xs.map(_._2).sum.toDouble
    val sy = xs.map(_._3).sum.toDouble
    val s11 = xs.map(t => t._1 * t._1).sum.toDouble
    val s12 = xs.map(t => t._1 * t._2).sum.toDouble
    val s22 = xs.map(t => t._2 * t._2).sum.toDouble
    val s1y = xs.map(t => t._1 * t._3).sum.toDouble
    val s2y = xs.map(t => t._2 * t._3).sum.toDouble
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val b0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)) / det
    val b1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)) / det
    val b2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)) / det
    assert(math.abs(r.getDouble(1) - b0) < 1e-6)
    assert(math.abs(r.getDouble(2) - b1) < 1e-6)
    assert(math.abs(r.getDouble(3) - b2) < 1e-6)
    assert(r.getDouble(4) > 0.99 && r.getDouble(4) <= 1.0)
  }
}
