package graft.rel

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Funnel ordering semantics and the integer z-score anomaly test. */
class FunnelAnomalySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def funnelSteps(events: org.apache.spark.sql.DataFrame) = {
    val s1 = events.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = events.join(s1, Seq("user_id"))
      .filter(col("event_type") === "click" && col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 7 DAYS"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    (s1.count(), s2.count())
  }

  test("funnel: clicks before signup or outside the window don't count") {
    import spark.implicits._
    val ev = Seq(
      // user 1: click BEFORE signup only -> does not reach step 2
      (1L, "signup", "2024-01-10 00:00:00"),
      (1L, "click", "2024-01-09 00:00:00"),
      // user 2: click 8 days after signup -> outside the 7-day window
      (2L, "signup", "2024-01-01 00:00:00"),
      (2L, "click", "2024-01-09 00:00:01"),
      // user 3: ordered within window -> converts
      (3L, "signup", "2024-01-01 00:00:00"),
      (3L, "click", "2024-01-02 00:00:00"))
      .toDF("user_id", "event_type", "ts_s")
      .select(col("user_id"), col("event_type"),
        col("ts_s").cast("timestamp").as("ts"))
    val (n1, n2) = funnelSteps(ev)
    assert(n1 == 3 && n2 == 1)
  }

  test("integer z-score flags a spike and spares flat history") {
    import spark.implicits._
    // 7 flat days then a 10x spike; baseline excludes the current day
    val daily = ((1 to 7).map(d => (f"2024-01-$d%02d", 100L)) :+
      ("2024-01-08", 1000L))
      .toDF("day_s", "x")
      .select(col("day_s").cast("date").as("day"), col("x"),
        lit("click").as("event_type"))
    val pw = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-7, -1)
    val out = daily
      .withColumn("n_prev", count(col("x")).over(pw))
      .withColumn("s_prev", coalesce(sum(col("x")).over(pw), lit(0L)))
      .withColumn("ss_prev",
        coalesce(sum(col("x") * col("x")).over(pw), lit(0L)))
      .select(col("day"),
        (col("n_prev") >= 4 &&
          (col("n_prev") * col("x") - col("s_prev")) *
            (col("n_prev") * col("x") - col("s_prev")) >
            lit(9L) * (col("n_prev") * col("ss_prev") -
              col("s_prev") * col("s_prev"))).cast("int").as("f"))
      .collect().map(r => r.getDate(0).toString -> r.getInt(1)).toMap
    assert(out("2024-01-08") == 1) // the spike fires
    assert(out.filterKeys(_ != "2024-01-08").values.forall(_ == 0))
    // zero-variance flat history with n>=4: any deviation fires, but
    // an identical value must NOT (strict > keeps equality quiet)
    assert(out("2024-01-07") == 0)
  }
}
