package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r15 optimization round): stage-level timing probes for the
  * heavy operators the bench can only time end-to-end — WHERE inside
  * dbscan / the streaming joins the seconds go, so optimization effort
  * lands on the measured stage instead of a guess (guide §1).
  *
  * Usage: sbt "runMain graft.OptProfile <probe> [sfDir]"
  *   probe = dbscan | stream
  * Prints labeled wall-clock lines; never touches bench artifacts.
  */
object OptProfile {
  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val probe = args.headOption.getOrElse("dbscan")
    val dir = if (args.length >= 2) args(1) else "/root/repo/target/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.io.Tables.configure(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    probe match {
      case "dbscan" => dbscanProfile(spark, dir)
      case "stream" => streamProfile(spark, dir)
      case other => sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }

  /** The sim_dbscan body re-run stage by stage (same params as the
    * declared query: √n cells, p=4 probes, the registered minCosine /
    * minPts), each stage materialized through the noop sink so the
    * timings partition the end-to-end cost.
    */
  private def dbscanProfile(spark: SparkSession, dir: String): Unit = {
    import graft.sim.Similarity
    val emb = graft.io.Tables.load(spark, dir, "embeddings")
    val n = emb.count()
    val nlist = math.ceil(math.sqrt(n.toDouble)).toInt
    val quant = time("quantizer (hash-sampled centers)") {
      Similarity.hashSampledQuantizer(emb, nlist)
    }
    val probeUdf = udf { (v: Seq[Double]) => quant.nearestCells(v, 4) }
    val assigned = time("multi-probe assignment checkpoint") {
      emb.select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("e"))
        .withColumn("cell", explode(probeUdf(col("e"))))
        .localCheckpoint(true)
    }
    val a = assigned.select(col("cell"), col("vec_id").as("s"),
      col("e").as("ea"))
    val b = assigned.select(col("cell").as("cb"), col("vec_id").as("t"),
      col("e").as("eb"))
    val joined = a.join(b,
      col("cell") === col("cb") && col("s") =!= col("t"))
    time("eps self-join pair count (no cosine)") {
      joined.select(count(lit(1))).write.format("noop")
        .mode("overwrite").save()
    }
    time("eps self-join + cosine filter (noop)") {
      joined.filter(graft.dedup.Dedup.cosineCol(col("ea"), col("eb"))
          >= 0.4)
        .select("s", "t").write.format("noop").mode("overwrite").save()
    }
    val edges = time("edges distinct + checkpoint") {
      joined.filter(graft.dedup.Dedup.cosineCol(col("ea"), col("eb"))
          >= 0.4)
        .select("s", "t").distinct().localCheckpoint(true)
    }
    println(s"[profile] edge rows: ${edges.count()}")
    val core = time("core degree filter (noop)") {
      val c = edges.groupBy("s").agg(count(lit(1)).as("nn"))
        .filter(col("nn") >= 4).select(col("s").as("vec_id"))
        .localCheckpoint(true)
      println(s"[profile] core rows: ${c.count()}")
      c
    }
    val ce = time("core-core edge restrict (checkpoint)") {
      edges.join(core.select(col("vec_id").as("s")), Seq("s"))
        .join(core.select(col("vec_id").as("t")), Seq("t"))
        .select(col("s").as("doc_a"), col("t").as("doc_b"))
        .localCheckpoint(true)
    }
    val clab = time("connected components (core subgraph)") {
      graft.dedup.Dedup.connectedComponents(core, ce, idCol = "vec_id")
        .localCheckpoint(true)
    }
    println(s"[profile] core labels: ${clab.count()}")
    time("full dbscan (declared shape)") {
      Similarity.dbscan(quant, emb, minCosine = 0.4, minPts = 4,
          probes = 4)
        .write.format("noop").mode("overwrite").save()
    }
  }

  /** Streaming probes: run the heavy stream-stream rows once and print
    * the per-batch duration breakdown Spark reports (addBatch /
    * getBatch / stateOperators), so state-store cost separates from
    * source/compute cost.
    */
  private def streamProfile(spark: SparkSession, dir: String): Unit = {
    import graft.streaming.StreamQueries
    import org.apache.spark.sql.streaming.Trigger
    def runOne(label: String, df: org.apache.spark.sql.DataFrame,
        mode: String): Unit = {
      val name = s"opt_profile_${label.replaceAll("[^a-z_]", "")}"
      val t0 = System.nanoTime()
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      println(f"[profile] $label%-30s total ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      q.recentProgress.foreach { p =>
        val dur = p.durationMs
        println(s"[profile]   batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${dur}")
        p.stateOperators.foreach { so =>
          println(s"[profile]   state op=${so.operatorName} " +
            s"rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
            s"commitTimeMs=${so.allUpdatesTimeMs}/${so.commitTimeMs}")
        }
      }
    }
    runOne("st_outer_join", StreamQueries.outerIntervalJoin(
      StreamQueries.eventStream(spark, dir)), "append")
  }
}
