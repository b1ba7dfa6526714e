package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the round-9 robust/nonparametric statistics
  * entries: Theil–Sen slope, Ljung–Box Q, Kruskal–Wallis/Dunn rank
  * z-scores, and the HHI concentration audit — driven through the REAL
  * registered queries over per-test fixture dirs.
  */
class RobustStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = 1704067200L * 1000000000L // 2024-01-01T00:00Z ns
  private val day = 86400L * 1000000000L

  private def eventsDir(
      rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("rs_ev").toString
    rows.map { case (id, ns, u, t, v) => (id, ns, u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  private def run(name: String, dir: String): DataFrame =
    LogAnalytics.queries(name)(spark, dir)

  test("ts_theil_sen: median pairwise slope shrugs off a single " +
      "corrupted day that would wreck OLS") {
    // days 0..4 at 1,2,3,4 then a wild 100.0 outlier on day 4:
    // 6 of the 10 pairwise slopes are exactly 10000 xu/day, so the
    // lower median (rank 5 of 10) is the clean slope.
    val dir = eventsDir(Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex.map {
      case (v, i) => (i.toLong, base + i * day, 1L, "a", v)
    })
    val r = run("ts_theil_sen", dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_pairs") == 10L)
    assert(r.head.getAs[Double]("sen_slope") == 10000.0)
  }

  test("ts_ljung_box: a perfectly alternating series gives Q = 20 " +
      "at n = 6 (r_k = -5/6, 2/3, -1/2, 1/3, -1/6)") {
    val dir = eventsDir(Seq(1.0, 2.0, 1.0, 2.0, 1.0, 2.0).zipWithIndex
      .map { case (v, i) => (i.toLong, base + i * day, 1L, "a", v) })
    val r = run("ts_ljung_box", dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_days") == 6L)
    assert(math.abs(r.head.getAs[Double]("q_lb") - 20.0) < 1e-4)
  }

  test("la_kruskal_dunn: disjoint value ranges give mean ranks 2/5 " +
      "and the textbook z = ±1.963961 at n=6, no ties") {
    val dir = eventsDir(Seq(
      (0L, base, 1L, "a", 1.0), (1L, base, 2L, "a", 2.0),
      (2L, base, 3L, "a", 3.0), (3L, base, 4L, "b", 4.0),
      (4L, base, 5L, "b", 5.0), (5L, base, 6L, "b", 6.0)))
    val r = run("la_kruskal_dunn", dir).collect()
      .map(x => x.getAs[String]("event_type") ->
        (x.getAs[Double]("mean_rank"), x.getAs[Double]("z"))).toMap
    assert(r("a")._1 == 2.0 && r("b")._1 == 5.0)
    // z = (2 - 3.5) / sqrt(7 * 3 / (12 * 3)) = -1.5 / 0.7637626
    assert(math.abs(r("a")._2 + 1.963961) < 1e-5)
    assert(math.abs(r("b")._2 - 1.963961) < 1e-5)
  }

  test("la_kruskal_dunn: all-tied values give z = 0 (tie correction " +
      "keeps the denominator finite, mean rank = (N+1)/2 exactly)") {
    val dir = eventsDir((0L until 8L).map { i =>
      (i, base, i, if (i % 2 == 0) "a" else "b", 7.5)
    })
    // every value identical: one grid row, tv = 8, tie3 = 504,
    // C = 1 - 504/504 = 0 -> denominator 0 -> z NULL; mean_rank 4.5
    val r = run("la_kruskal_dunn", dir).collect()
    assert(r.forall(_.getAs[Double]("mean_rank") == 4.5))
    assert(r.forall(x => x.isNullAt(x.fieldIndex("z")) ||
      x.getAs[Double]("z").isNaN))
  }

  test("ts_pacf: alternating series matches the hand Durbin-Levinson " +
      "values; constant series is all-NULL") {
    val alt = eventsDir((0 until 8).map { i =>
      (i.toLong, base + i * day, 1L, "a",
        if (i % 2 == 0) 1.0 else 2.0)
    })
    val r = run("ts_pacf", alt).collect()
      .map(x => x.getAs[Int]("lag") -> x.getAs[Double]("pacf")).toMap
    // r1 = -7/8; f22 = (3/4 - 49/64)/(1 - 49/64); f33 from the
    // recursion on r = (-7/8, 3/4, -5/8)
    assert(r(1) == -0.875)
    assert(math.abs(r(2) + 0.066667) < 1e-5)
    assert(math.abs(r(3) - 0.071429) < 1e-5)
    val const = eventsDir((0 until 8).map { i =>
      (i.toLong, base + i * day, 1L, "a", 3.0)
    })
    val rows = run("ts_pacf", const).collect()
    assert(rows.length == 3)
    assert(rows.forall(x => x.isNullAt(x.fieldIndex("pacf"))))
  }

  test("ts_chow_test: a planted regime change yields a huge F; a " +
      "perfect single line is NULL (zero residuals both ways)") {
    // within-half noise keeps RSS1+RSS2 > 0 (perfect half-fits hit
    // the zero-denominator NULL guard, tested below via the line)
    val h1 = Seq(1.0, 2.0, 3.5, 4.0, 5.0)
    val h2 = Seq(100.0, 99.0, 97.5, 97.0, 96.0)
    val break_ = eventsDir((h1 ++ h2).zipWithIndex.map { case (v, i) =>
      (i.toLong, base + i * day, 1L, "a", v)
    })
    val r1 = run("ts_chow_test", break_).collect().head
    assert(r1.getAs[Long]("n1") == 5L && r1.getAs[Long]("n2") == 5L)
    assert(r1.getAs[Double]("f_chow") > 1000.0)
    val line = eventsDir((0 until 10).map { i =>
      (i.toLong, base + i * day, 1L, "a", (i + 1).toDouble)
    })
    val r2 = run("ts_chow_test", line).collect().head
    assert(r2.isNullAt(r2.fieldIndex("f_chow")))
  }

  test("la_power_mde: zero-variance arm A and known arm-B variance " +
      "give the closed-form MDE exactly") {
    val dir = eventsDir(Seq(
      (0L, base, 2L, "a", 1.0), (1L, base, 4L, "a", 1.0),   // arm A
      (2L, base, 1L, "a", 1.0), (3L, base, 3L, "a", 3.0)))  // arm B
    val r = run("la_power_mde", dir).collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    // vb = (2*(1e8+9e8) - 1.6e9)/2 = 2e8 -> mde = 2.801585 * 1e4
    assert(r.getAs[Double]("mde_u") == 28015.85)
    assert(math.abs(r.getAs[Double]("mde_rel") - 1.867723) < 1e-6)
  }

  test("la_cuped: post = 2*pre exactly gives theta 2, full variance " +
      "reduction") {
    val dir = eventsDir(Seq(
      (0L, base, 1L, "a", 1.0), (1L, base + 9 * day, 1L, "a", 2.0),
      (2L, base, 2L, "a", 2.0), (3L, base + 9 * day, 2L, "a", 4.0),
      (4L, base, 3L, "a", 3.0), (5L, base + 9 * day, 3L, "a", 6.0)))
    val r = run("la_cuped", dir).collect().head
    assert(r.getAs[Long]("n_users") == 3L)
    assert(r.getAs[Double]("theta") == 2.0)
    assert(r.getAs[Double]("var_reduction") == 1.0)
  }

  test("ts_dtw_pairs: a phase-shifted copy warps to distance 0; a " +
      "constant mismatch accumulates |delta| per aligned cell") {
    // a = [1,2,3]; b = [1,1,2,3] -> DTW aligns the doubled 1 for free
    val shifted = eventsDir(
      Seq(1.0, 2.0, 3.0).zipWithIndex.map { case (v, i) =>
        (i.toLong, base + i * day, 1L, "a", v) } ++
      Seq(1.0, 1.0, 2.0, 3.0).zipWithIndex.map { case (v, i) =>
        (10L + i, base + i * day, 1L, "b", v) })
    val r1 = run("ts_dtw_pairs", shifted).collect().head
    assert(r1.getAs[Long]("n_a") == 3L && r1.getAs[Long]("n_b") == 4L)
    assert(r1.getAs[Long]("dtw_u") == 0L)
    // a = [1,1]; b = [5]: both cells align to the single 5
    val const = eventsDir(Seq(
      (0L, base, 1L, "a", 1.0), (1L, base + day, 1L, "a", 1.0),
      (2L, base, 1L, "b", 5.0)))
    val r2 = run("ts_dtw_pairs", const).collect().head
    assert(r2.getAs[Long]("dtw_u") == 80000L)
    assert(r2.getAs[Long]("dtw_per_step_u") == 26666L)
  }

  test("la_srm: a biased split is flagged on distinct users, balance " +
      "is not, and a heavy user cannot fake a mismatch") {
    // type a: 12 even-user ids vs 2 odd -> chi2 = 100/14 = 7.142857
    val biased = (0 until 12).map(i =>
      (i.toLong, base, i * 2L, "a", 1.0)) ++
      Seq((20L, base, 1L, "a", 1.0), (21L, base, 3L, "a", 1.0)) ++
      // type b: 3 users per arm, but one user fires 50 events
      (0 until 50).map(i => (30L + i, base, 2L, "b", 1.0)) ++
      Seq((90L, base, 4L, "b", 1.0), (91L, base, 6L, "b", 1.0),
        (92L, base, 1L, "b", 1.0), (93L, base, 3L, "b", 1.0),
        (94L, base, 5L, "b", 1.0))
    val r = run("la_srm", eventsDir(biased)).collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("n_a"), x.getAs[Long]("n_b"),
          x.getAs[Double]("chi2"), x.getAs[Int]("srm_flag")))).toMap
    assert(r("a") == ((12L, 2L, 7.142857, 1)))
    assert(r("b") == ((3L, 3L, 0.0, 0)))
  }

  test("la_bh_fdr: a planted massive effect is rejected at rank 1, " +
      "the null metric survives") {
    val dir = eventsDir(Seq(
      // type a: arms differ hugely (1.0/1.1 vs 5.0/5.1)
      (0L, base, 2L, "a", 1.0), (1L, base, 4L, "a", 1.1),
      (2L, base, 1L, "a", 5.0), (3L, base, 3L, "a", 5.1),
      // type b: identical arms -> z = 0, p ~ 1
      (4L, base, 2L, "b", 1.0), (5L, base, 4L, "b", 1.1),
      (6L, base, 1L, "b", 1.0), (7L, base, 3L, "b", 1.1)))
    val r = run("la_bh_fdr", dir).collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Int]("rk"), x.getAs[Int]("rejected"),
          x.getAs[Double]("p")))).toMap
    assert(r("a")._1 == 1 && r("a")._2 == 1 && r("a")._3 < 1e-4)
    assert(r("b")._2 == 0 && r("b")._3 > 0.99)
  }

  test("dq_freshness: a stale stream shows its exact staleness and " +
      "empty arrival windows") {
    val dir = eventsDir(Seq(
      (0L, base, 1L, "a", 1.0), (1L, base + 2 * day, 1L, "a", 1.0),
      (2L, base, 2L, "b", 1.0), (3L, base + 9 * day, 2L, "b", 1.0)))
    val r = run("dq_freshness", dir).collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("staleness_s"), x.getAs[Long]("n_last_day"),
          x.getAs[Long]("n_last_week")))).toMap
    // global max = base+9d; stream a last seen base+2d -> 7 days stale,
    // its boundary event counts in the >= 7d window but not the 1d one
    assert(r("a") == ((604800L, 0L, 1L)))
    assert(r("b") == ((0L, 1L, 1L)))
  }

  test("la_hhi: two users at 1:3 value share give HHI = 625000 ppm, " +
      "1.6 effective users") {
    val dir = eventsDir(Seq(
      (0L, base, 1L, "a", 1.0), (1L, base, 2L, "a", 3.0)))
    val r = run("la_hhi", dir).collect().head
    assert(r.getAs[Long]("n_users") == 2L)
    // ss = 1e8 + 9e8, st^2 = 1.6e9 -> 625000 ppm; 1e12 // 625000
    assert(r.getAs[Long]("hhi_ppm") == 625000L)
    assert(r.getAs[Long]("eff_users_ppm") == 1600000L)
  }

  test("ts_seasonal_strength: an exact weekly pattern explains all " +
      "variance (10^6 ppm); a constant series is NULL") {
    // 14 days, value 10.0 on the first two weekdays of each week and
    // 2.0 otherwise: zero within-dow variance -> eta2 = SSB/SST = 1
    val weekly = eventsDir((0 until 14).map { i =>
      (i.toLong, base + i * day, 1L, "a", if (i % 7 < 2) 10.0 else 2.0)
    })
    val r1 = run("ts_seasonal_strength", weekly).collect().head
    assert(r1.getAs[Long]("n_days") == 14L)
    assert(r1.getAs[Long]("eta2_ppm") == 1000000L)
    val const = eventsDir((0 until 14).map { i =>
      (i.toLong, base + i * day, 1L, "a", 3.0)
    })
    val r2 = run("ts_seasonal_strength", const).collect().head
    assert(r2.isNullAt(r2.fieldIndex("eta2_ppm")))
  }

  test("la_hhi: a monopolist user is 10^6 ppm, one effective user") {
    val dir = eventsDir(Seq((0L, base, 9L, "a", 2.0)))
    val r = run("la_hhi", dir).collect().head
    assert(r.getAs[Long]("hhi_ppm") == 1000000L)
    assert(r.getAs[Long]("eff_users_ppm") == 1000000L)
  }

  test("dq_benford: integer-string first digits, zeros excluded, " +
      "divergence replayed for an all-ones type") {
    // type a: every value leads with digit 1 (0.0001 -> vu=1,
    // 1.5 -> 15000, 19999 stays digit 1); zero excluded. type b:
    // digits 2 and 9.
    val dir = eventsDir(Seq(
      (0L, base, 1L, "a", 0.0001), (1L, base + 1, 1L, "a", 1.5),
      (2L, base + 2, 1L, "a", 19999.0), (3L, base + 3, 1L, "a", 0.0),
      (4L, base + 4, 1L, "b", 0.0025), (5L, base + 5, 1L, "b", 900.0)))
    val out = run("dq_benford", dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("d")) ->
        ((r.getAs[Long]("n_obs"), r.getAs[Long]("obs_ppm"),
          r.getAs[Long]("benford_div_u")))).toMap
    assert(out.size == 18) // 2 types x 9 digits, zero row dropped
    val exp = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L,
      8 -> 51153L, 9 -> 45757L)
    assert(out(("a", 1))._1 == 3L && out(("a", 1))._2 == 1000000L)
    assert(out(("a", 2))._1 == 0L)
    assert(out(("b", 2))._1 == 1L && out(("b", 2))._2 == 500000L)
    assert(out(("b", 9))._1 == 1L)
    // all-mass-on-1 divergence: (1e6-e1)^2 div e1 + sum of the rest
    val expectedDiv = (1000000L - exp(1)) * (1000000L - exp(1)) / exp(1) +
      (2 to 9).map(exp(_)).sum
    assert(out(("a", 1))._3 == expectedDiv)
  }

  test("st_benford: streaming replay equals the batch audit row for row") {
    val dir = eventsDir(Seq(
      (0L, base, 1L, "a", 0.0001), (1L, base + 1, 1L, "a", 1.5),
      (2L, base + 2, 1L, "a", 19999.0), (3L, base + 3, 1L, "a", 0.0),
      (4L, base + 4, 1L, "b", 0.0025), (5L, base + 5, 1L, "b", 900.0)))
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getInt(1)) -> r.toSeq.drop(2)).toMap
    val st = asMap(graft.streaming.StreamQueries
      .queries("st_benford")(spark, dir).collect())
    val batch = asMap(run("dq_benford", dir).collect())
    assert(st == batch && st.size == 18)
  }

  test("la_mad_outliers: lower median/MAD on the grid, Hampel gate; " +
      "the >50%-constant degeneracy flags every deviation") {
    // type a: {1,1,1,1,100} -> med=1, MAD=0 (degenerate): only the
    // 100 deviates -> 1 outlier. type b: {1..9} -> med=5, MAD=2
    // (lower median of {0,1,1,2,2,3,3,4,4}); max deviation 4 <
    // 4.4478*2 -> none flagged.
    val rows = Seq.fill(4)(1.0) ++ Seq(100.0)
    val dir = eventsDir(
      rows.zipWithIndex.map { case (v, i) =>
        (i.toLong, base + i * day, 1L, "a", v) } ++
      (1 to 9).map(i => (10L + i, base + i * day, 1L, "b", i.toDouble)))
    val out = run("la_mad_outliers", dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("med_u"),
          r.getAs[Long]("mad_u"), r.getAs[Long]("n_outliers")))).toMap
    assert(out("a") == ((5L, 10000L, 0L, 1L)))
    assert(out("b") == ((9L, 50000L, 20000L, 0L)))
  }
}
