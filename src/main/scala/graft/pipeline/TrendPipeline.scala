package graft.pipeline

import graft.ts.{Dbest, PolyTrendAgg, Stl}
import graft.model.TV
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's two query lifecycles (SURVEY.md §3) as Spark-native
  * pipelines: scan → temporal/spatial filter → tumbling mean composite →
  * per-key kernel aggregation → summary stats → optional CSV sink, all
  * one lazy Catalyst plan (boundaries #5/#7 of §3.1 dissolved).
  */
object TrendPipeline {

  /** Engine-side argument validation (F8 — the reference's client-side
    * checks, `static/utils.js:43-82`, done once at the API boundary).
    */
  final case class PolyTrendParams(
      startDate: String, // ISO yyyy-MM-dd inclusive
      endDate: String, // exclusive
      bbox: Option[(Double, Double, Double, Double)] = None, // x1,x2,y1,y2
      alpha: Double = 0.05,
      threshold: Double = 0.1) {
    require(startDate <= endDate, s"start $startDate after end $endDate")
    require(alpha > 0 && alpha < 1, s"alpha out of (0,1): $alpha")
  }

  final case class DbestPipelineParams(
      startDate: String,
      endDate: String,
      bbox: Option[(Double, Double, Double, Double)] = None,
      threshold: Double = 0.1,
      kernel: Dbest.Params = Dbest.Params()) {
    require(startDate <= endDate, s"start $startDate after end $endDate")
  }

  private def applyFilters(
      obs: DataFrame, start: String, end: String,
      bbox: Option[(Double, Double, Double, Double)]): DataFrame = {
    // F1 + F2 (`calculations/polytrend.py:458`): pushed to the parquet
    // scan; at scale the observation store is date-partitioned so F1
    // prunes files (SURVEY §4 O2).
    val timeFiltered = obs.filter(
      col("time") >= lit(start).cast("timestamp") &&
        col("time") < lit(end).cast("timestamp"))
    bbox match {
      case Some((x1, x2, y1, y2)) =>
        timeFiltered.filter(col("longitude").between(x1, x2) &&
          col("latitude").between(y1, y2))
      case None => timeFiltered
    }
  }

  /** Annual mean composite (A1, `calculations/polytrend.py:375-399`):
    * one row per (pixel, year). Partial aggregation happens map-side;
    * the single shuffle is keyed by pixel+year.
    */
  def annualComposite(obs: DataFrame): DataFrame =
    obs.groupBy(col("longitude"), col("latitude"),
        year(col("time")).as("yr"))
      .agg(avg(col("value")).as("value"))

  /** Monthly mean composite (A1, `calculations/dbest.py:34-62`). */
  def monthlyComposite(obs: DataFrame): DataFrame =
    obs.groupBy(col("longitude"), col("latitude"),
        (year(col("time")) * 12 + month(col("time"))).as("bucket"))
      .agg(avg(col("value")).as("value"))

  /** Hourly mean composite — finer tumbling window for high-frequency
    * sources (the harness `events` table); same A1 semantics.
    */
  def hourlyComposite(obs: DataFrame): DataFrame =
    timeBucketComposite(obs, 3600)

  /** Tumbling mean composite with an arbitrary bucket width in seconds. */
  def timeBucketComposite(obs: DataFrame, seconds: Long): DataFrame =
    obs.groupBy(col("longitude"), col("latitude"),
        floor(unix_timestamp(col("time")) / seconds).as("bucket"))
      .agg(avg(col("value")).as("value"))

  /** PolyTrend-for-region (§3.1 stages 3-8): returns the per-pixel
    * classification table
    * (schema `calculations/polytrend.py:291-297`). The composite is
    * pluggable ([[annualComposite]] default — the reference's shape;
    * [[hourlyComposite]]/[[timeBucketComposite]] for high-frequency
    * sources); its time column is resolved positionally (column 3 of
    * the `(longitude, latitude, <time>, value)` contract), so both
    * the `yr` and `bucket` namings work unchanged.
    */
  def polyTrend(spark: SparkSession, obs: DataFrame,
      params: PolyTrendParams,
      composite: DataFrame => DataFrame = annualComposite): DataFrame = {
    import spark.implicits._
    val comp = composite(
      applyFilters(obs, params.startDate, params.endDate, params.bbox))
    val timeCol = comp.columns(2)
    val pt = udaf(new PolyTrendAgg(params.alpha))
    comp
      .groupBy(col("longitude"), col("latitude"))
      // F4 quality gate (min > θ ≡ all > θ, `calculations/polytrend.py:284`)
      // rides the same shuffle as the kernel — one aggregation, two outputs.
      .agg(min(col("value")).as("mn"),
        pt(col(timeCol).cast("double"), col("value")).as("pt"))
      .filter(col("mn") > params.threshold && col("pt.trend_type").isNotNull)
      .select(col("longitude"), col("latitude"), col("pt.trend_type"),
        col("pt.slope"), col("pt.direction"), col("pt.significance"),
        col("pt.degree"))
  }

  /** PolyTrend POINT decode (`calculations/polytrend.py:330-354`): the
    * single-pixel response carries the composited series `ts` alongside
    * the classification — schema `[geometry, ts, trend_type, slope,
    * direction, significance, degree]` (`PT_result_header`,
    * `calculations/polytrend.py:346-354`). Array-typed here; driver
    * entries serialize `ts` for the relational compare. The composite
    * must emit `(longitude, latitude, bucket, value)` —
    * [[monthlyComposite]] / [[timeBucketComposite]] shapes.
    */
  def polyTrendPoint(spark: SparkSession, obs: DataFrame,
      params: PolyTrendParams,
      composite: DataFrame => DataFrame = monthlyComposite): DataFrame = {
    val pt = udaf(new PolyTrendAgg(params.alpha))
    composite(applyFilters(obs, params.startDate, params.endDate, params.bbox))
      .groupBy(col("longitude"), col("latitude"))
      .agg(min(col("value")).as("mn"),
        transform(
          sort_array(collect_list(struct(col("bucket"), col("value")))),
          s => s.getField("value")).as("ts"),
        pt(col("bucket").cast("double"), col("value")).as("pt"))
      .filter(col("mn") > params.threshold && col("pt.trend_type").isNotNull)
      .select(col("longitude"), col("latitude"), col("ts"),
        col("pt.trend_type"), col("pt.slope"), col("pt.direction"),
        col("pt.significance"), col("pt.degree"))
  }

  /** Group-count statistics over PolyTrend results
    * (`calculations/utils.py:37-64`): counts and percentages per
    * trend_type and direction, one pass.
    */
  def ptStatistics(results: DataFrame): DataFrame = {
    def cnt(c: Column, v: Int, as: String) =
      sum(when(c === v, 1).otherwise(0)).as(as)
    def pct(c: Column) = round(c * 100.0 / col("n_total"), 1)
    results.agg(
      count(lit(1)).as("n_total"),
      cnt(col("trend_type"), 1, "n_linear"),
      cnt(col("trend_type"), 2, "n_quadratic"),
      cnt(col("trend_type"), 3, "n_cubic"),
      cnt(col("trend_type"), -1, "n_concealed"),
      cnt(col("trend_type"), 0, "n_no_trend"),
      cnt(col("direction"), 1, "n_positive"),
      cnt(col("direction"), -1, "n_negative"))
      .withColumn("pct_linear", pct(col("n_linear")))
      .withColumn("pct_quadratic", pct(col("n_quadratic")))
      .withColumn("pct_cubic", pct(col("n_cubic")))
      .withColumn("pct_concealed", pct(col("n_concealed")))
      .withColumn("pct_no_trend", pct(col("n_no_trend")))
  }

  /** Summary statistics over a [[dbestChange]] change map — the
    * region-level readout the reference's DBEST journey ends on (the
    * aggregate counterpart of `dbest_visualize_polygon`,
    * `calculations/dbest.py:571-573`): how many pixels were analyzed,
    * how many carry a detected change, the abrupt/non-abrupt and
    * significance splits, and the mean |change| magnitude. One
    * map-combined aggregate to a single row; counts are exact longs,
    * the magnitude is a rounded mean (ratio of two exact sums on the
    * ×10⁴ grid).
    */
  def dbestStatistics(changes: DataFrame): DataFrame =
    changes.agg(
      count(lit(1)).as("n_pixels"),
      sum(when(col("start") >= 0, 1L).otherwise(0L)).as("n_with_change"),
      sum(when(col("change_type") === 1, 1L).otherwise(0L)).as("n_abrupt"),
      sum(when(col("start") >= 0 && col("change_type") === 0, 1L)
        .otherwise(0L)).as("n_nonabrupt"),
      sum(when(col("significance") === 1, 1L).otherwise(0L))
        .as("n_significant"),
      sum(col("breakpoint_no").cast("long")).as("n_breakpoints_total"),
      round(sum(when(col("start") >= 0,
          floor(abs(col("change")) * 10000 + lit(0.5))).otherwise(0.0)) /
        greatest(sum(when(col("start") >= 0, 1L).otherwise(0L)), lit(1L)),
        0).cast("long").as("mean_abs_change_u"))

  /** DBEST-for-region: monthly composite → per-pixel STL + breakpoint
    * detection. Returns one row per pixel with the first (largest)
    * change, matching the reference's polygon decode
    * (`calculations/dbest.py:133-143`).
    */
  def dbestChange(spark: SparkSession, obs: DataFrame,
      params: DbestPipelineParams,
      composite: DataFrame => DataFrame = monthlyComposite): DataFrame = {
    val kp = params.kernel
    val monthly = composite(
      applyFilters(obs, params.startDate, params.endDate, params.bbox))
    val detect = udf { (values: Seq[Double]) =>
      if (values == null || values.length < 6) None
      else {
        val r = Dbest.changeDetection(values.toArray, kp)
        val first = r.changes.headOption
        Some((r.breakpointNo, r.segmentNo,
          first.map(_.start).getOrElse(-1),
          first.map(c => c.end - c.start).getOrElse(0),
          first.map(_.end).getOrElse(-1),
          first.map(_.change).getOrElse(0.0),
          first.map(_.changeType).getOrElse(0),
          first.map(_.significance).getOrElse(-1)))
      }
    }
    seriesByPixel(monthly)
      .filter(col("mn") > params.threshold)
      .withColumn("r", detect(col("series")))
      .filter(col("r").isNotNull)
      .select(col("longitude"), col("latitude"),
        col("r._1").as("breakpoint_no"), col("r._2").as("segment_no"),
        col("r._3").as("start"), col("r._4").as("duration"),
        col("r._5").as("end"), col("r._6").as("change"),
        col("r._7").as("change_type"), col("r._8").as("significance"))
  }

  /** DBEST point decode, multi-change form (`calculations/dbest.py:
    * 311-331`): ALL top-N ranked changes per pixel as EXPLODED rows —
    * rank is the position in the |change|-ranked array the reference
    * returns, so rank 1 is the row [[dbestChange]] reports. Relational
    * shape for the per-change fields; the plotting arrays live on
    * [[dbestPointDecode]].
    */
  def dbestChangesAll(spark: SparkSession, obs: DataFrame,
      params: DbestPipelineParams,
      composite: DataFrame => DataFrame = monthlyComposite): DataFrame = {
    val kp = params.kernel
    val monthly = composite(
      applyFilters(obs, params.startDate, params.endDate, params.bbox))
    val detect = udf { (values: Seq[Double]) =>
      if (values == null || values.length < 6) None
      else {
        val r = Dbest.changeDetection(values.toArray, kp)
        Some((r.breakpointNo, r.segmentNo,
          r.changes.iterator.zipWithIndex.map { case (c, i) =>
            (i + 1, c.start, c.end - c.start, c.end, c.change,
              c.changeType, c.significance)
          }.toSeq))
      }
    }
    seriesByPixel(monthly)
      .filter(col("mn") > params.threshold)
      .withColumn("r", detect(col("series")))
      .filter(col("r").isNotNull)
      .select(col("longitude"), col("latitude"),
        col("r._1").as("breakpoint_no"), col("r._2").as("segment_no"),
        explode(col("r._3")).as("c"))
      .select(col("longitude"), col("latitude"), col("breakpoint_no"),
        col("segment_no"), col("c._1").as("rank"), col("c._2").as("start"),
        col("c._3").as("duration"), col("c._4").as("end"),
        col("c._5").as("change"), col("c._6").as("change_type"),
        col("c._7").as("significance"))
  }

  /** DBEST point decode, full payload (`calculations/dbest.py:311-331`):
    * one row per pixel carrying the change arrays PLUS the fit / data /
    * trend / seasonal / remainder series the reference ships to its
    * plots — the complete point-query response, array-typed.
    */
  def dbestPointDecode(spark: SparkSession, obs: DataFrame,
      params: DbestPipelineParams,
      composite: DataFrame => DataFrame = monthlyComposite): DataFrame = {
    val kp = params.kernel
    val monthly = composite(
      applyFilters(obs, params.startDate, params.endDate, params.bbox))
    val detect = udf { (values: Seq[Double]) =>
      if (values == null || values.length < 6) None
      else {
        val r = Dbest.changeDetection(values.toArray, kp)
        Some((r.breakpointNo, r.segmentNo,
          r.changes.map(_.start).toSeq,
          r.changes.map(c => c.end - c.start).toSeq,
          r.changes.map(_.end).toSeq,
          r.changes.map(_.change).toSeq,
          r.changes.map(_.changeType).toSeq,
          r.changes.map(_.significance).toSeq,
          r.fit.toSeq, r.data.toSeq, r.trend.toSeq,
          r.seasonal.toSeq, r.remainder.toSeq))
      }
    }
    seriesByPixel(monthly)
      .filter(col("mn") > params.threshold)
      .withColumn("r", detect(col("series")))
      .filter(col("r").isNotNull)
      .select(col("longitude"), col("latitude"),
        col("r._1").as("breakpoint_no"), col("r._2").as("segment_no"),
        col("r._3").as("start"), col("r._4").as("duration"),
        col("r._5").as("end"), col("r._6").as("change"),
        col("r._7").as("change_type"), col("r._8").as("significance"),
        col("r._9").as("fit"), col("r._10").as("data"),
        col("r._11").as("trend"), col("r._12").as("seasonal"),
        col("r._13").as("remainder"))
  }

  /** DBEST generalization per pixel (decode
    * `calculations/dbest.py:385-394`): summary stats plus the three
    * series the reference plots — generalized `fit`, raw `data`, and
    * `f_local` (slot 8, "Trend local change" — the fit's per-step
    * delta, NOT a copy of the fit).
    */
  def dbestGeneralization(spark: SparkSession, obs: DataFrame,
      params: DbestPipelineParams,
      composite: DataFrame => DataFrame = monthlyComposite): DataFrame = {
    val kp = params.kernel
    val monthly = composite(
      applyFilters(obs, params.startDate, params.endDate, params.bbox))
    val gen = udf { (values: Seq[Double]) =>
      if (values == null || values.length < 6) None
      else {
        val r = Dbest.generalization(values.toArray, kp)
        Some((r.segmentNo, r.rmse, r.mad,
          r.fit.toSeq, r.data.toSeq, r.fLocal.toSeq))
      }
    }
    seriesByPixel(monthly)
      .filter(col("mn") > params.threshold)
      .withColumn("r", gen(col("series")))
      .filter(col("r").isNotNull)
      .select(col("longitude"), col("latitude"),
        col("r._1").as("segment_no"), col("r._2").as("rmse"),
        col("r._3").as("mad"), col("r._4").as("fit"),
        col("r._5").as("data"), col("r._6").as("f_local"))
  }

  /** STL components per pixel (K5 exposed standalone; consumed by the
    * reference at `calculations/dbest.py:325-331`). Explodes one row per
    * (pixel, bucket) with trend/seasonal/remainder — the UDTF analog.
    */
  def stlComponents(spark: SparkSession, obs: DataFrame, period: Int,
      composite: DataFrame => DataFrame = monthlyComposite): DataFrame = {
    val stl = udf { (values: Seq[Double]) =>
      if (values == null || values.length < 2 * period) None
      else {
        val d = Stl.decompose(values.toArray, period)
        Some(d.trend.indices.map(i =>
          (i, d.trend(i), d.seasonal(i), d.remainder(i))))
      }
    }
    seriesByPixel(composite(obs))
      .withColumn("comp", explode(stl(col("series"))))
      .select(col("longitude"), col("latitude"),
        col("comp._1").as("idx"), col("comp._2").as("trend"),
        col("comp._3").as("seasonal"), col("comp._4").as("remainder"))
  }

  /** W3 series assembly: per-pixel time-ordered value vector + min for
    * the quality gate, in one aggregation.
    */
  private def seriesByPixel(composite: DataFrame): DataFrame =
    composite.groupBy(col("longitude"), col("latitude"))
      .agg(min(col("value")).as("mn"),
        transform(
          sort_array(collect_list(struct(col("bucket"), col("value")))),
          s => s.getField("value")).as("series"))

  /** S3/S4 CSV sink (`calculations/polytrend.py:483,491`). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Adapt the harness `events` table to the canonical observation shape
    * (TESTDATA.md role mapping: user_id plays pixel, hourly buckets play
    * the composite's time axis).
    */
  def eventsAsObservations(spark: SparkSession, dir: String): DataFrame =
    graft.io.Tables.load(spark, dir, "events").select(
      col("event_id").cast("string").as("id"),
      col("user_id").cast("double").as("longitude"),
      lit(0.0).as("latitude"),
      col("ts").as("time"),
      col("value"))
}
