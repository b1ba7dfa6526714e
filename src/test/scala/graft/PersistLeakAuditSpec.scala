package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The session-lifetime persist leak as a SPEC, not a forensic
  * exercise (r11 verdict #8 stretch; the RangeDriftAuditSpec listener
  * pattern applied to caching): a builder that calls `.persist()`/
  * `.cache()` and never unpersists leaves an entry in the session's
  * CacheManager. The entry is invisible to correctness — but
  * CacheManager plan-dedup silently substitutes it into every LATER
  * plan whose canonicalized subtree matches, so a repeated run (the
  * bench's min-of-3, or any production session issuing the query
  * twice) times a warm cache no first call sees. That is exactly the
  * class of bug that flattered `g_triangles` and `mm_frame_overlap`
  * for two rounds (r9→r11: 2.6s cached vs 6.6s honest at sf0.1) and
  * took a fresh-JVM attribution protocol to unmask (ATTRIBUTION_r11).
  *
  * The audit walks EVERY registered query: build it once (builders
  * with internal actions materialize — and would register — any
  * persisted frame right here), then build it a SECOND time and
  * inspect the second plan's `withCachedData`: any `InMemoryRelation`
  * in it was injected by CacheManager from a first-build leak, because
  * the audit clears the cache before each query's first build. Eager
  * `localCheckpoint(true)` barriers — the repo's sanctioned two-action
  * tool — do NOT register in CacheManager and pass freely (their
  * blocks are freed by the ContextCleaner once the frame is GC'd, and
  * between bench queries by the explicit hygiene sweep).
  *
  * The negative control replays the pre-r10 `triangleSummary` shape
  * (persist during build, materialize, return without unpersist) and
  * asserts the detector fires on it.
  */
class PersistLeakAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.io.Tables.configure(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def cachedSubtrees(
      df: org.apache.spark.sql.DataFrame): Seq[InMemoryRelation] =
    df.queryExecution.withCachedData.collect {
      case im: InMemoryRelation => im
    }

  test("no registered query leaks a CacheManager entry a rerun would reuse") {
    spark.sparkContext.setLogLevel("WARN")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        spark.sharedState.cacheManager.clearCache()
        val first = scala.util.Try(fn(spark, sfDir))
        val hit = first.toOption.flatMap { _ =>
          scala.util.Try(fn(spark, sfDir)).toOption.flatMap { df2 =>
            val ims = cachedSubtrees(df2)
            if (ims.isEmpty) None
            else Some(s"$name: rerun plan contains ${ims.size} " +
              "InMemoryRelation(s) from a persist the first build " +
              "leaked — unpersist it before returning")
          }
        }
        hit
      }
    spark.sharedState.cacheManager.clearCache()
    assert(offenders.isEmpty,
      "session-lifetime persist leak (the bench would time a warm " +
        "cache no first call sees):\n" + offenders.mkString("\n"))
  }

  test("negative control: the pre-r10 triangleSummary shape is detected") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    spark.sharedState.cacheManager.clearCache()
    def build() = {
      val edges = (1 to 500).map(i => (i.toLong, (i * 7 % 500).toLong))
        .toDF("src", "dst")
      // the OLD (leak-prone) shape: persist + materialize during
      // build, frame returned with the cache entry still registered
      val oriented = edges.filter(col("src") < col("dst")).persist()
      oriented.count() // build-time materialization
      oriented.groupBy("src").agg(count(lit(1)).as("deg"))
    }
    try {
      build()
      val rerun = build()
      assert(cachedSubtrees(rerun).nonEmpty,
        "control rerun must surface the leaked InMemoryRelation")
    } finally spark.sharedState.cacheManager.clearCache()
  }
}
