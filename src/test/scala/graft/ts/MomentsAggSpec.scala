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

  test("classifyMoments agrees with classify on 500 random dense series") {
    val rnd = new scala.util.Random(23)
    var checked = 0
    for (trial <- 1 to 500) {
      val n = 8 + rnd.nextInt(120)
      val kind = trial % 5
      val y = Array.tabulate(n) { i =>
        val base = kind match {
          case 0 => 0.8 * i
          case 1 => -0.3 * i + 0.004 * i * i
          case 2 => 1e-4 * (i - n / 2.0) * (i - n / 2.0) * (i - n / 2.0)
          case 3 => 5.0
          case _ => math.sin(i * 0.7) * 3
        }
        base + rnd.nextGaussian() * 0.5
      }
      // build the centered-basis sufficient statistics directly
      val c = (n + 1) / 2.0
      val sx = new Array[Double](7)
      val sxy = new Array[Double](4)
      var sy2 = 0.0
      for (i <- 0 until n) {
        val x = (i + 1) - c
        var p = 1.0
        for (k <- 0 to 6) { sx(k) += p; p *= x }
        p = 1.0
        for (k <- 0 to 3) { sxy(k) += p * y(i); p *= x }
        sy2 += y(i) * y(i)
      }
      val a = PolyTrend.classify(y, 0.05).get
      val b = PolyTrend.classifyMoments(sx, sxy, sy2, 0.05).get
      // p-values within float noise of each other away from the alpha
      // boundary must give identical decisions; skip razor-edge cases
      // at ANY ladder rung (the two SSE computations differ in last
      // ulps, which only matters exactly at the threshold)
      val edge = Seq(1, 2, 3).exists(d =>
        math.abs(Ols.fit(y, d).leadingP - 0.05) < 1e-6)
      if (!edge) {
        assert(a.trendType == b.trendType && a.degree == b.degree &&
          a.direction == b.direction && a.significance == b.significance,
          s"trial $trial (kind $kind, n=$n): $a vs $b")
        assert(math.abs(a.slope - b.slope) <=
          1e-8 * math.max(1.0, math.abs(a.slope)))
        checked += 1
      }
    }
    assert(checked > 450, s"only $checked non-boundary trials")
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
