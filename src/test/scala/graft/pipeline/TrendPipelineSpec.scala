package graft.pipeline

import graft.model.Observation
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** End-to-end PolyTrend/DBEST lifecycle over synthetic observations
  * (FIXTURES.md A1): scan → filter → composite → kernel → stats → sink.
  */
class TrendPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** P pixels × 20 annual observations, 2 images per year (to exercise
    * the mean composite): pixel (0,0) linear rising, (1,0) flat,
    * (2,0) has one below-threshold value → dropped whole (F4).
    */
  private def fixtureObs() = {
    import spark.implicits._
    val rows = for {
      (lon, kind) <- Seq((0.0, "linear"), (1.0, "flat"), (2.0, "masked"))
      yr <- 2000 to 2019
      sub <- Seq(0, 1) // two images per year
    } yield {
      val i = yr - 2000 + 1
      val base = kind match {
        case "linear" => 0.2 + 0.02 * i
        case "flat" => 0.5
        case "masked" => if (yr == 2010) 0.05 else 0.5 // one bad value
      }
      // sub-annual offset cancels in the annual mean
      val v = base + (if (sub == 0) 0.01 else -0.01)
      Observation(s"img_${yr}_$sub", lon, 0.0,
        Timestamp.valueOf(s"$yr-0${1 + sub * 5}-15 00:00:00"), v)
    }
    rows.toDF()
  }

  test("PolyTrend pipeline classifies pixels and applies the quality gate") {
    val params = TrendPipeline.PolyTrendParams(
      startDate = "2000-01-01", endDate = "2020-01-01",
      bbox = Some((-10.0, 10.0, -10.0, 10.0)),
      alpha = 0.05, threshold = 0.1)
    val out = TrendPipeline.polyTrend(spark, fixtureObs(), params)
      .collect().map(r => (r.getDouble(0), r.getInt(2), r.getInt(4)))
      .sortBy(_._1)
    // masked pixel (lon=2) dropped by F4
    assert(out.map(_._1).toSeq == Seq(0.0, 1.0))
    val byLon = out.map(t => t._1 -> t).toMap
    assert(byLon(0.0)._2 == 1, s"linear pixel: $out") // linear trend
    assert(byLon(0.0)._3 == 1) // positive direction
    assert(byLon(1.0)._2 == 0, s"flat pixel: $out") // no trend
  }

  test("polyTrendPoint carries the composited series ts with the classification") {
    val params = TrendPipeline.PolyTrendParams(
      startDate = "2000-01-01", endDate = "2020-01-01",
      alpha = 0.05, threshold = 0.1)
    val out = TrendPipeline.polyTrendPoint(spark, fixtureObs(), params)
      .collect().map(r => (r.getDouble(0), r.getSeq[Double](2),
        r.getInt(3))).sortBy(_._1)
    // same F4 gate as the region path: masked pixel dropped
    assert(out.map(_._1).toSeq == Seq(0.0, 1.0))
    val byLon = out.map(t => t._1 -> t).toMap
    // 20 years × 2 monthly buckets (Jan + Jun) = 40 composite points
    assert(byLon(0.0)._2.length == 40, s"ts len ${byLon(0.0)._2.length}")
    // series is bucket-ordered: Jan 2000 (+0.01 image) first
    assert(math.abs(byLon(0.0)._2.head - (0.2 + 0.02 * 1 + 0.01)) < 1e-9)
    assert(math.abs(byLon(0.0)._2.last - (0.2 + 0.02 * 20 - 0.01)) < 1e-9)
    assert(byLon(1.0)._2.forall(v => math.abs(v - 0.5) < 0.011))
    assert(byLon(0.0)._3 == 1, "linear pixel classifies linear") // trend_type
  }

  test("ptStatistics counts sum to total and percentages are consistent") {
    val params = TrendPipeline.PolyTrendParams(
      startDate = "2000-01-01", endDate = "2020-01-01",
      alpha = 0.05, threshold = 0.1)
    val results = TrendPipeline.polyTrend(spark, fixtureObs(), params)
    val s = TrendPipeline.ptStatistics(results).collect()(0)
    val total = s.getAs[Long]("n_total")
    val parts = Seq("n_linear", "n_quadratic", "n_cubic", "n_concealed",
      "n_no_trend").map(s.getAs[Long](_)).sum
    assert(total == 2 && parts == total)
    assert(s.getAs[Long]("n_positive") + s.getAs[Long]("n_negative") == total)
  }

  test("temporal filter restricts the composite range") {
    val params = TrendPipeline.PolyTrendParams(
      startDate = "2005-01-01", endDate = "2015-01-01",
      alpha = 0.05, threshold = 0.1)
    val annual = TrendPipeline.annualComposite(fixtureObs()
      .filter(org.apache.spark.sql.functions.col("time") >=
        org.apache.spark.sql.functions.lit("2005-01-01").cast("timestamp")))
    assert(annual.agg(org.apache.spark.sql.functions.min("yr"))
      .collect()(0).getInt(0) >= 2005)
  }

  test("CSV sink round-trips the result schema (S3/S4)") {
    val dir = java.nio.file.Files.createTempDirectory("ptcsv").toString
    val params = TrendPipeline.PolyTrendParams(
      startDate = "2000-01-01", endDate = "2020-01-01",
      alpha = 0.05, threshold = 0.1)
    val results = TrendPipeline.polyTrend(spark, fixtureObs(), params)
    TrendPipeline.writeCsv(results, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 2)
    assert(back.columns.toSet.contains("trend_type"))
  }

  test("DBEST pipeline detects the step pixel") {
    import spark.implicits._
    // one pixel, 10 years monthly, sine(12) + step at month 60
    val rows = for (m <- 0 until 120) yield {
      val yr = 2000 + m / 12
      val mo = m % 12 + 1
      val v = 10.0 + (if (m >= 60) 5.0 else 0.0) +
        2.0 * math.sin(2 * math.Pi * m / 12)
      Observation(s"img_$m", 0.0, 0.0,
        Timestamp.valueOf(f"$yr-$mo%02d-15 00:00:00"), v)
    }
    val params = TrendPipeline.DbestPipelineParams(
      startDate = "2000-01-01", endDate = "2010-01-01",
      threshold = -100.0,
      kernel = graft.ts.Dbest.Params(seasonality = 12, duration = 12,
        firstLevelShift = 0.3, secondLevelShift = 1.0))
    val out = TrendPipeline.dbestChange(spark, rows.toDF(), params).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Int]("change_type") == 1, s"expected abrupt: $r")
    assert(math.abs(r.getAs[Double]("change")) > 3.0)

    // multi-change decode: rank 1 reproduces the dbestChange row, ranks
    // are 1..k with duration = end - start, and the full point payload
    // carries component arrays of the composite length
    val all = TrendPipeline.dbestChangesAll(spark, rows.toDF(), params)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(all.nonEmpty)
    assert(all.map(_.getAs[Int]("rank")).toSeq == (1 to all.length))
    val top = all.head
    assert(top.getAs[Double]("change") == r.getAs[Double]("change"))
    assert(top.getAs[Int]("start") == r.getAs[Int]("start"))
    all.foreach(c => assert(c.getAs[Int]("duration") ==
      c.getAs[Int]("end") - c.getAs[Int]("start")))
    val pd = TrendPipeline.dbestPointDecode(spark, rows.toDF(), params)
      .collect()
    assert(pd.length == 1)
    val row = pd(0)
    assert(row.getSeq[Double](row.fieldIndex("change")).length == all.length)
    assert(row.getSeq[Double](row.fieldIndex("trend")).length == 120)
    assert(row.getSeq[Double](row.fieldIndex("fit")).length == 120)

    // region-level stats over the change map (the pipeline_dbest
    // reduce): one pixel with an abrupt significant change; the mean
    // |change| micro-units recompute from the same row
    val st = TrendPipeline.dbestStatistics(
      TrendPipeline.dbestChange(spark, rows.toDF(), params)).collect()
    assert(st.length == 1)
    val s0 = st(0)
    assert(s0.getAs[Long]("n_pixels") == 1L)
    assert(s0.getAs[Long]("n_with_change") == 1L)
    assert(s0.getAs[Long]("n_abrupt") == 1L)
    assert(s0.getAs[Long]("n_nonabrupt") == 0L)
    assert(s0.getAs[Long]("mean_abs_change_u") ==
      math.floor(math.abs(r.getAs[Double]("change")) * 10000 + 0.5).toLong)
  }

  test("kernel identity flags are non-vacuous: corrupted payloads flip to 0") {
    import graft.ts.KernelIdentities
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a valid payload: trend with a vertex at 2, fit the exact
    // piecewise-linear interpolation through (0, 2, 4), f_local its
    // first difference
    val trend = Seq(0.0, 2.0, 4.0, 3.0, 2.0)
    val fit = trend // already piecewise linear through the vertices
    val fLocal = Seq(0.0, 2.0, 2.0, -1.0, -1.0)
    def payload(fitV: Seq[Double], fl: Seq[Double],
        s: Seq[Int] = Seq(0, 2), e: Seq[Int] = Seq(2, 4)) =
      Seq((s, e, fitV, trend, fl))
        .toDF("start", "end", "fit", "trend", "f_local")
    def flags(df: org.apache.spark.sql.DataFrame): (Int, Int, Int, Int) = {
      val r = df.select(
        KernelIdentities.plZeroCurvature,
        KernelIdentities.fitEqTrendAtVertices,
        KernelIdentities.flocalIsFitDelta,
        KernelIdentities.flocalZeroAnchor).head()
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
    }
    assert(flags(payload(fit, fLocal)) == ((1, 1, 1, 1)))
    // bend the fit inside segment [0,2] → curvature flag drops
    assert(flags(payload(Seq(0.0, 2.5, 4.0, 3.0, 2.0), fLocal))._1 == 0)
    // move a vertex off the trend → endpoint flag drops
    assert(flags(payload(Seq(0.0, 2.0, 4.5, 3.0, 2.0), fLocal))._2 == 0)
    // the r3 bug class: f_local as a COPY of fit → delta flag drops
    assert(flags(payload(fit, fit))._3 == 0)
    // non-zero anchor → anchor flag drops
    assert(flags(payload(fit, Seq(1.0, 2.0, 2.0, -1.0, -1.0)))._4 == 0)
    // seasonal-identity twin (k5): an aperiodic seasonal breaks the
    // bit-exact phase repetition the entry asserts
    // k4 fit-identity triple: rmse/mad recompute from (fit, data) and
    // the curvature-break count respects segment_no
    def genPayload(rmseV: Double, madV: Double, segNo: Int,
        fitV: Seq[Double] = Seq(0.0, 1.0, 2.0, 1.0)) =
      Seq((fitV, Seq(0.0, 1.0, 2.0, 2.0), rmseV, madV, segNo))
        .toDF("fit", "data", "rmse", "mad", "segment_no")
    def genFlags(df: org.apache.spark.sql.DataFrame): (Int, Int, Int) = {
      val r = df.select(
        KernelIdentities.rmseRecomputes,
        KernelIdentities.madRecomputes,
        KernelIdentities.curvatureBreaksBounded).head()
      (r.getInt(0), r.getInt(1), r.getInt(2))
    }
    // residuals (0,0,0,-1): rmse = sqrt(1/4) = 0.5, mad = 0 (even
    // median of sorted [0,0,0,1] middles (0+0)/2); one curvature break
    // at i=2 needs segment_no >= 2
    assert(genFlags(genPayload(0.5, 0.0, 2)) == ((1, 1, 1)))
    assert(genFlags(genPayload(0.6, 0.0, 2))._1 == 0) // wrong rmse
    assert(genFlags(genPayload(0.5, 0.1, 2))._2 == 0) // wrong mad
    // claim one segment: the break at i=2 exceeds the 0 allowed
    assert(genFlags(genPayload(0.5, 0.0, 1))._3 == 0)
    val per = Seq(1.0, -1.0, 1.0, -1.0, 1.0, -1.0)
    val aper = Seq(1.0, -1.0, 1.0, -1.0, 1.0, -0.5)
    def periodic(s: Seq[Double]): Boolean = {
      val df = s.zipWithIndex.map { case (v, i) => (i, i % 2, v) }
        .toDF("idx", "phase", "seasonal")
      val base = df.filter(col("idx") < 2)
        .select(col("phase"), col("seasonal").as("s0"))
      df.join(base, Seq("phase"))
        .agg(max(abs(col("seasonal") - col("s0"))))
        .head().getDouble(0) == 0.0
    }
    assert(periodic(per) && !periodic(aper))
  }
}
