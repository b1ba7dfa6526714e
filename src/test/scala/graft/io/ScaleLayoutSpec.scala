package graft.io

import graft.model.Observation
import graft.rel.Skew
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Physical-layout behaviors that carry the 100 TB posture: partition
  * pruning on the date-partitioned store, shuffle-free bucketed joins,
  * and salted-join correctness.
  */
class ScaleLayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("wh").toString)
    .getOrCreate()

  private def obs(n: Int) = {
    import spark.implicits._
    (1 to n).map { d =>
      Observation(s"img$d", d % 3, 0.0,
        Timestamp.valueOf(f"2024-01-${d % 28 + 1}%02d 12:00:00"), d * 0.1)
    }.toDF()
  }

  test("z-order key interleaves bits exactly and keeps tiles contiguous") {
    import spark.implicits._
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((acc, b) =>
        acc | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1)))
    val rnd = new scala.util.Random(7)
    val pts = Seq.tabulate(200)(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .withColumn("z", ZOrder.zorderKey(col("x"), col("y"), 16))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) => assert(got((x, y)) == ref(x, y, 16)) }
    // locality: an ALIGNED 4x4 tile occupies one contiguous zkey range
    // — the reason a 2-D box predicate prunes to O(perimeter) ranges
    val tile = for { x <- 8L to 11L; y <- 4L to 7L } yield ref(x, y, 16)
    assert(tile.toSet.size == 16 && tile.max - tile.min == 15)
  }

  test("date-partitioned store prunes partitions for temporal filters") {
    val dir = java.nio.file.Files.createTempDirectory("obs_part").toString
    ObservationStore.writePartitioned(obs(56), dir)
    val read = ObservationStore.readPartitioned(spark, dir,
      "2024-01-05", "2024-01-08")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("obs_date"), s"no partition pruning in:\n$plan")
    // only 3 of 28 day-partitions qualify
    val days = read.select(to_date(col("time")).as("d")).distinct().count()
    assert(days == 3)
    // round-trips the canonical schema
    assert(read.columns.toSeq ==
      Seq("id", "longitude", "latitude", "time", "value"))
  }

  test("bucketed tables join without an exchange (co-located join)") {
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 50, s"f$i", i * 1.0))
      .toDF("key", "tag", "amount")
    val dims = (0L until 50L).map(i => (i, s"dim$i")).toDF("key", "name")
    // external tables on fresh temp paths: immune to which suite's
    // SparkSession (and hence warehouse dir) won the shared-JVM race
    val whf = java.nio.file.Files.createTempDirectory("fb").toString
    val whd = java.nio.file.Files.createTempDirectory("db").toString
    spark.sql("DROP TABLE IF EXISTS facts_bucketed")
    spark.sql("DROP TABLE IF EXISTS dims_bucketed")
    facts.write.mode("overwrite").option("path", s"$whf/t")
      .bucketBy(8, "key").sortBy("key").saveAsTable("facts_bucketed")
    dims.write.mode("overwrite").option("path", s"$whd/t")
      .bucketBy(8, "key").sortBy("key").saveAsTable("dims_bucketed")
    // merge hint on the INPUT (a hint on the join result is too late and
    // the planner broadcasts — which has no Exchange either and would
    // make this assertion pass without exercising the bucket layout)
    val joined = spark.table("facts_bucketed").hint("merge")
      .join(spark.table("dims_bucketed"), "key")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"not a merge join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == 1000)
  }

  test("bucketed observation store: pixel join AND agg plan no Exchange") {
    val dir = java.nio.file.Files.createTempDirectory("obs_bkt").toString
    ObservationStore.writeBucketed(obs(56), "obs_bucketed", buckets = 4,
      path = Some(dir))
    // a per-pixel results table bucketed the same way (pixel_id key)
    val results = obs(56)
      .withColumn("pixel_id",
        ObservationStore.pixelId(col("longitude"), col("latitude")))
      .groupBy("pixel_id").agg(avg("value").as("mean_v"))
    val whr = java.nio.file.Files.createTempDirectory("rb").toString
    spark.sql("DROP TABLE IF EXISTS res_bucketed")
    results.write.mode("overwrite").format("parquet")
      .option("path", s"$whr/t")
      .bucketBy(4, "pixel_id").sortBy("pixel_id")
      .saveAsTable("res_bucketed")

    val store = ObservationStore.readBucketed(spark, "obs_bucketed")
    // observations ⋈ per-pixel results on the bucket key, merge-hinted
    // on the INPUT so broadcast can't mask the layout: the plan must be
    // a sort-merge join with no Exchange on either side
    val joined = store.hint("merge").join(spark.table("res_bucketed"),
      Seq("pixel_id"))
    val jPlan = joined.queryExecution.executedPlan.toString
    assert(jPlan.contains("SortMergeJoin"), s"not a merge join:\n$jPlan")
    assert(!jPlan.contains("Exchange hashpartitioning"),
      s"bucketed pixel join still shuffles:\n$jPlan")
    assert(joined.count() == 56)

    // the composite aggregation keyed by the bucket column also skips
    // its Exchange — the per-query shuffle became a one-time layout cost
    val agg = store.groupBy(col("pixel_id"))
      .agg(avg("value").as("v"), first("longitude").as("longitude"),
        first("latitude").as("latitude"))
    val aPlan = agg.queryExecution.executedPlan.toString
    assert(!aPlan.contains("Exchange hashpartitioning"),
      s"bucketed agg still shuffles:\n$aPlan")
    assert(agg.count() == 3)

    // round-trips the canonical schema (+ the derived key) and rows
    assert(store.columns.toSeq ==
      Seq("id", "longitude", "latitude", "time", "value", "pixel_id"))
    assert(store.count() == 56)
  }

  test("salted inner join equals the plain join result") {
    import spark.implicits._
    // heavily skewed: 90% of rows share key 1
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i))
      .toDF("k", "payload")
    val small = (0L until 7L).map(i => (i, s"v$i")).toDF("k2", "name")
    val plain = big.join(small, big("k") === small("k2"))
      .select("k", "payload", "name")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedInnerJoin(big, small, "k", "k2", salt = 8)
      .select("k", "payload", "name")
      .collect().map(_.toString).sorted
    assert(plain.length == salted.length)
    assert(plain.sameElements(salted))
  }

  test("CSV observation source reads the fixed schema (S3 round-trip)") {
    val dir = java.nio.file.Files.createTempDirectory("obs_csv").toString
    graft.pipeline.TrendPipeline.writeCsv(obs(10), dir)
    val back = ObservationStore.readCsv(spark, dir)
    assert(back.schema == ObservationStore.schema)
    assert(back.count() == 10)
  }

  test("JSONL round-trip preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("obs_jsonl").toString
    val o = obs(12)
    ObservationStore.writeJsonl(o, dir)
    val back = ObservationStore.readJsonl(spark, dir)
    assert(back.schema == ObservationStore.schema)
    assert(back.count() == 12)
    // values survive the text round-trip exactly
    val a = o.orderBy("id").collect().map(_.toSeq)
    val b = back.orderBy("id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
