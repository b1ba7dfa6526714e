package graft.ts

import graft.api.GraftEngine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PolyTrendMomentsAgg (constant-size sufficient statistics) must agree
  * with the collect-the-series PolyTrendAgg — same classification, same
  * slope to float tolerance — including under large time offsets
  * (epoch-scale buckets) and multi-partition merges.
  */
class MomentsAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (key, t, v) rows for a set of noisy synthetic series at a large t
    * offset, mimicking epoch-hour buckets. Seeded noise keeps the
    * t-tests deterministic.
    */
  private def fixtures: Seq[(Long, Double, Double)] = {
    val rnd = new scala.util.Random(11)
    val offset = 473000.0
    def series(key: Long, n: Int)(f: Int => Double) =
      (0 until n).map(i => (key, offset + i, f(i) + rnd.nextGaussian() * 0.3))
    series(1L, 40)(i => 2.0 * i + 5) ++ // linear up
      series(2L, 40)(i => -1.5 * i + 10) ++ // linear down
      series(3L, 40)(i => 0.05 * (i - 20) * (i - 20)) ++ // quadratic
      series(4L, 40)(i => 0.002 * math.pow(i - 20, 3)) ++ // odd cubic
      series(5L, 40)(_ => 3.0) ++ // flat noise
      series(6L, 200)(i => 0.5 * i) ++ // longer series
      (0 until 5).map(i => (7L, 473000.0 + i, i * 1.0)) // too short -> null
  }

  private def run(useMoments: Boolean) = {
    import spark.implicits._
    val df = fixtures.toDF("k", "t", "v").repartition(4)
    val pt = udaf(new PolyTrendAgg(alpha = 0.05))
    val agg = if (useMoments)
      GraftEngine.polytrendMoments(col("t"), col("v")).as("pt")
    else pt(col("t"), col("v")).as("pt")
    df.groupBy("k").agg(agg)
      .select(col("k"), col("pt.trend_type"), col("pt.slope"),
        col("pt.direction"), col("pt.significance"), col("pt.degree"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some((r.getInt(1), r.getDouble(2), r.getInt(3), r.getInt(4),
          r.getInt(5)))))
      .toMap
  }

  test("moments aggregate matches the collect-based aggregate") {
    val buffered = run(useMoments = false)
    val moments = run(useMoments = true)
    assert(buffered.keySet == moments.keySet)
    for (k <- buffered.keySet) {
      (buffered(k), moments(k)) match {
        case (None, None) => // both drop the short series
        case (Some((tt1, s1, d1, sig1, deg1)), Some((tt2, s2, d2, sig2, deg2))) =>
          assert(tt1 == tt2, s"trend_type for key $k")
          assert(d1 == d2 && sig1 == sig2 && deg1 == deg2, s"flags for key $k")
          assert(math.abs(s1 - s2) <= 1e-8 * math.max(1.0, math.abs(s1)),
            s"slope for key $k: $s1 vs $s2")
        case other => fail(s"key $k: one side null, one not: $other")
      }
    }
    // sanity: expected classifications actually exercised
    assert(moments(1L).get._1 == 1 && moments(1L).get._3 == 1)
    assert(moments(2L).get._3 == -1)
    assert(moments(5L).get._1 == 0)
    assert(moments(7L).isEmpty)
  }

  test("moments aggregate works through SQL registration") {
    GraftEngine.registerFunctions(spark)
    import spark.implicits._
    fixtures.toDF("k", "t", "v").createOrReplaceTempView("mser")
    val out = spark.sql(
      """SELECT k, polytrend_moments(t, v) AS pt FROM mser GROUP BY k""")
      .filter(col("pt").isNotNull).collect()
    assert(out.length == 6)
  }
}
