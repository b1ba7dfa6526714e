package graft.rel

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantitative bound for the A3 approximate-distinct path: HLL at
  * rsd = 0.01 must land within 5% of the exact count (the same bound
  * the `a3_approx_distinct` oracle entry pins against DuckDB).
  */
class ApproxDistinctSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("wh").toString)
    .getOrCreate()

  test("approx_count_distinct(rsd=0.01) within 5% of exact across cardinalities") {
    import spark.implicits._
    // 3 groups with very different true cardinalities (sparse + dense HLL)
    val rows =
      (1 to 100).map(i => ("small", i.toLong)) ++
        (1 to 20000).map(i => ("large", i.toLong)) ++
        (1 to 5000).flatMap(i => Seq(("dups", i.toLong), ("dups", i.toLong)))
    val out = rows.toDF("g", "k")
      .groupBy("g")
      .agg(countDistinct($"k").as("exact"),
        approx_count_distinct($"k", rsd = 0.01).as("approx"))
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.05, s"group ${r.getString(0)}: relErr $relErr")
    }
  }
}
