package graft.rel

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Banded-vs-full DTW parity and binding behavior (r9 verdict #8),
  * driven through the REAL registered queries over tiny fixture dirs:
  *  - parity: with series shorter than the band, band_eff covers every
  *    |i−j|, so the banded DP must equal the full DP exactly;
  *  - binding: a 20-day phase shift between two slow ramps is
  *    alignable by the full DP (warp 20 ≤ n) but NOT inside the
  *    14-day band — banded must come out strictly larger, and never
  *    smaller anywhere (restricting the path set can only raise the
  *    minimum).
  */
class DtwBandSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dayNs = 86400L * 1000000000L
  private val baseNs = 1704067200L * 1000000000L // 2024-01-01T00:00Z

  /** Write an events.parquet with one event per (type, day). */
  private def fixture(series: Map[String, Seq[Double]]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("dtw_band").toString
    val rows = for {
      (tpe, ys) <- series.toSeq
      (v, i) <- ys.zipWithIndex
    } yield (i.toLong, baseNs + i * dayNs, 1L, tpe, v, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  private def dtw(dir: String, name: String): Map[(String, String), Long] = {
    val valueCol = if (name.endsWith("banded")) "dtw_band_u" else "dtw_u"
    LogAnalytics.queries(name)(spark, dir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        r.getAs[Long](valueCol)).toMap
  }

  test("banded equals full when the band covers the whole series") {
    val ys1 = Seq.tabulate(10)(i => math.sin(i * 0.9) * 3 + 5)
    val ys2 = Seq.tabulate(10)(i => math.cos(i * 1.3) * 2 + 4)
    val dir = fixture(Map("a" -> ys1, "b" -> ys2))
    val full = dtw(dir, "ts_dtw_pairs")
    val band = dtw(dir, "ts_dtw_pairs_banded")
    assert(full.keySet == band.keySet && full.nonEmpty)
    assert(full == band)
  }

  test("a 20-day phase shift binds the 14-day band: banded > full, never <") {
    val n = 60
    val ramp = Seq.tabulate(n)(i => i * 0.01)
    val shifted = Seq.tabulate(n)(i => math.max(0, i - 20) * 0.01)
    val dir = fixture(Map("a" -> ramp, "b" -> shifted))
    val full = dtw(dir, "ts_dtw_pairs")
    val band = dtw(dir, "ts_dtw_pairs_banded")
    val key = ("a", "b")
    assert(band(key) > full(key),
      s"band should bind: banded=${band(key)} full=${full(key)}")
    for (k <- full.keySet)
      assert(band(k) >= full(k), s"banded below full at $k")
  }
}
