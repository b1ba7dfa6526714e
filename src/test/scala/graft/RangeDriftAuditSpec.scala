package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.SortOrder
import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-action range-partitioning rule as a SPEC, not a convention
  * (r10 verdict #7; SCALE.md "drift rule"): RangePartitioner's
  * reservoir-sample seed depends on the RDD id, so two actions over
  * one UNPERSISTED `repartitionByRange` lineage can derive DIFFERENT
  * range boundaries — job-1 offsets applied to job-2's partitioning
  * are silently wrong once partitions outgrow the sample size. The
  * audit walks EVERY registered query: a builder that (a) already ran
  * Spark jobs while constructing its plan (a job-counting listener
  * detects this) and (b) returns a plan still containing a
  * range-`RepartitionByExpression` subtree is exposed — the returned
  * plan's ranged exchange would re-execute at materialization time
  * with a fresh RDD id while the build-time action read a different
  * tiling. The fix pattern is an eager localCheckpoint of the ranged
  * frame (budgetSelect/tokenizeToIds since r10), which replaces the
  * subtree with a LogicalRDD barrier; builders that run NO build-time
  * action may return lazy ranged plans freely (single-action reads
  * are safe).
  *
  * The negative control replays the PRE-r10 budgetSelect shape (ranged
  * window, offsets collect, ranged frame returned un-checkpointed) and
  * asserts the detector fires on it.
  */
class RangeDriftAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.io.Tables.configure(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def rangedSubtrees(df: DataFrame): Seq[RepartitionByExpression] =
    df.queryExecution.analyzed.collect {
      case r: RepartitionByExpression
          if r.partitionExpressions.exists(_.isInstanceOf[SortOrder]) => r
    }

  test("no registered query pairs build-time actions with a lazy ranged plan") {
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
        .flatMap { case (name, fn) =>
          val before = jobs.get()
          val built = scala.util.Try(fn(spark, sfDir))
          built.toOption.flatMap { df =>
            if (rangedSubtrees(df).isEmpty) None
            else {
              // listener events post asynchronously; build-time
              // actions themselves block, so a short settle suffices
              Thread.sleep(500)
              val n = jobs.get() - before
              if (n > 0)
                Some(s"$name: $n build-time job(s) AND a lazy " +
                  "range-repartition subtree in the returned plan")
              else None
            }
          }
        }
      assert(offenders.isEmpty,
        "two-action range-drift hazard (checkpoint the ranged frame):\n" +
          offenders.mkString("\n"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("negative control: the pre-r10 budgetSelect shape is detected") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val before = jobs.get()
      val df = (1 to 1000).map(i => (i.toLong, i % 97, 10L))
        .toDF("doc_id", "score", "n_tokens")
      // the OLD (drift-prone) shape: ranged window, offsets collect,
      // ranged frame returned WITHOUT a checkpoint barrier
      val ranged = df.repartitionByRange(4, col("score").desc,
          col("doc_id"))
        .withColumn("pid", spark_partition_id())
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("pid").orderBy(col("score").desc, col("doc_id"))
      val local = ranged.withColumn("local_cum",
        sum(col("n_tokens")).over(w))
      val offsets = local.groupBy("pid")
        .agg(max(col("local_cum")).as("tot")).collect() // build action
      assert(offsets.nonEmpty)
      val out = local.filter(col("local_cum") <= 5000L)
      Thread.sleep(500)
      val n = jobs.get() - before
      assert(n > 0, "control must run a build-time job")
      assert(rangedSubtrees(out).nonEmpty,
        "control must expose the lazy ranged subtree")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
