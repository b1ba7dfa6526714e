package graft.api

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The facade's SQL surface: custom kernels callable from spark.sql. */
class GraftEngineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("rolling_hash is callable from SQL after registration") {
    GraftEngine.registerFunctions(spark)
    val got = spark.sql("SELECT rolling_hash('ab') AS h").collect()(0).getLong(0)
    // 'a'*1000003 + 'b' = 97*1000003 + 98
    assert(got == 97L * 1000003L + 98L)
  }

  test("polytrend UDAF is callable from SQL over a grouped series") {
    // alpha 0.001: the highest-coefficient t-test has an inherent ~5%
    // false-positive rate per fit at alpha 0.05 (see KernelSpec note)
    GraftEngine.registerFunctions(spark, alpha = 0.001)
    import spark.implicits._
    val rnd = new scala.util.Random(4)
    val rows = for {
      key <- Seq("up", "flat")
      i <- 1 to 24
    } yield (key, i.toDouble,
      (if (key == "up") 2.0 * i else 5.0) + rnd.nextGaussian() * 0.05)
    rows.toDF("k", "t", "v").createOrReplaceTempView("series")
    val out = spark.sql(
      """SELECT k, polytrend(t, v).trend_type AS tt,
        |       polytrend(t, v).direction AS dir
        |FROM series GROUP BY k""".stripMargin)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out("up")._1 == 1 && out("up")._2 == 1)
    assert(out("flat")._1 == 0)
  }

  test("typed Dataset API: observations + polyTrendTyped round-trip") {
    import spark.implicits._
    import java.sql.Timestamp
    val rows = for {
      lon <- Seq(0.0, 1.0); yr <- 2000 to 2019
    } yield graft.model.Observation(s"i$yr", lon, 0.0,
      Timestamp.valueOf(s"$yr-06-15 00:00:00"),
      if (lon == 0.0) 0.2 + 0.02 * (yr - 1999) else 0.5)
    val ds = GraftEngine.observations(spark, rows.toDF())
    // typed lambda + typed column access both compile and run
    assert(ds.filter(_.longitude == 0.0).count() == 20)
    val pt = GraftEngine.polyTrendTyped(spark, ds,
      graft.pipeline.TrendPipeline.PolyTrendParams(
        startDate = "2000-01-01", endDate = "2020-01-01", threshold = 0.1))
      .collect().map(r => r.longitude -> r).toMap
    assert(pt(0.0).trend_type == 1 && pt(0.0).direction == 1)
    assert(pt(1.0).trend_type == 0)
  }

  test("open registers the testdata views for spark.sql") {
    GraftEngine.open(spark, "/root/testdata/sf0.001")
    assert(spark.sql("SELECT count(*) FROM region").collect()(0).getLong(0) == 5)
    assert(spark.sql("SELECT count(*) FROM events").collect()(0).getLong(0) > 0)
  }
}
