package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native splitmix64 expression: parity with the reference mixer,
  * known vectors, and codegen/interpreted agreement.
  */
class SplitMix64Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("column expression matches the scala mixer on a range of keys") {
    import spark.implicits._
    val keys = (Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue) ++
      (1 to 100).map(i => i * 1234567891L)).toDF("k")
    val got = keys.select(col("k"),
      SplitMix64.splitmix64(col("k")).as("h")).collect()
    got.foreach { r =>
      assert(r.getLong(1) == SplitMix64.mix(r.getLong(0)))
    }
  }

  test("mixer matches JDK SplittableRandom's published finalizer") {
    // splitmix64(0) with the golden-gamma increment is a fixed,
    // published vector (Vigna's splitmix64.c reference output)
    assert(SplitMix64.mix(0L) == 0xe220a8397b1dcdafL)
    assert(SplitMix64.mix(1L) == 0x910a2dec89025cc1L)
  }

  test("top-48-bit draws are uniform enough for the threshold cascade") {
    import spark.implicits._
    val n = 100000
    val draws = (1 to n).map(_.toLong).toDF("k")
      .select(shiftrightunsigned(
        SplitMix64.splitmix64(col("k")), 16).as("u48"))
    // mean of u48/2^48 should be ~0.5 within 1%
    val mean = draws.agg(avg(col("u48"))).collect()(0).getDouble(0) /
      (1L << 48).toDouble
    assert(math.abs(mean - 0.5) < 0.01, s"mean $mean")
    // Poisson(1) head probability: share below the first CDF threshold
    // ~ 1/e within 1%
    val p0 = draws.filter(col("u48") < 103548857136060L).count().toDouble / n
    assert(math.abs(p0 - math.exp(-1)) < 0.01, s"p0 $p0")
  }
}
