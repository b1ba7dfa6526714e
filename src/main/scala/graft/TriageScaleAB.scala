package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-payload explode-vs-aggregate A/B for the byte triage pair
  * (r12 verdict #4 — "prove the cost at a long-payload fixture"): the
  * bench headline times both forms on the REAL corpus (~300-char
  * payloads, where the explode's ≤256-row/doc partial combine hides
  * the per-byte row cost); this run repeats each payload ×`reps` so
  * payloads hit the tens-of-KB regime media metadata actually lives
  * in, and times one full materialization of each form on the SAME
  * frozen input. Run once per revisit (not in the bench sweep):
  *
  *   sbt "runMain graft.TriageScaleAB"            # sf0.1, reps=100
  *   sbt "runMain graft.TriageScaleAB <dir> <reps>"
  *
  * Expected shape: the explode form's cost grows with TOTAL BYTES
  * (one Generate row each), the aggregate's with payload COUNT (one
  * buffer fold each — the fold is a tight per-char array increment).
  * Results committed in SCALE.md (r13 block).
  */
object TriageScaleAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = graft.io.Tables.configure(SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val media = graft.io.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        repeat(col("text"), reps).cast("binary").as("payload"))
      .localCheckpoint(true)
    val stats = media.agg(count(lit(1)), avg(octet_length(col("payload"))))
      .head()
    val (nDocs, avgBytes) = (stats.getLong(0), stats.getDouble(1))

    val protectedIds = spark.sparkContext.getPersistentRDDs.keySet
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => protectedIds.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
      dt
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // cold then warm for each form; report warm (the bench convention)
    timed(noop(Multimodal.byteTriage(media)))
    val explodeWarm = timed(noop(Multimodal.byteTriage(media)))
    timed(noop(Multimodal.byteTriageAgg(media)))
    val aggWarm = timed(noop(Multimodal.byteTriageAgg(media)))

    val json = f"""{"docs":$nDocs,"avg_payload_bytes":${avgBytes.toLong},""" +
      f""""explode_warm_sec":$explodeWarm%.2f,"agg_warm_sec":$aggWarm%.2f,""" +
      f""""speedup":${explodeWarm / aggWarm}%.2f,"sf":"$sfDir","reps":$reps}"""
    println(json)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("target/triage_scale_ab.json"),
      json.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
