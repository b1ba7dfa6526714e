package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Evidence run for the r15 hash(src) standing-view layout: times one
  * LPA-style round (edge⋈label join + map-combined (node,label) count)
  * against the SAME bidirectional copurchase edge set materialized
  * four ways — the pre-r15 shape (plain union, eager localCheckpoint),
  * the repartitioned CHECKPOINT (the tempting wrong form), the
  * repartitioned PERSIST, and the repartitioned SORTED persist
  * (`GraphOps.partitionedView`'s shape, which also skips the SMJ's
  * edge-side sort via the cached ordering) — under
  * a FORCED shuffle-join regime (autoBroadcastJoinThreshold=-1: the
  * billion-node regime where the node-sized side no longer fits a
  * broadcast). Two claims are pinned MECHANICALLY, not just timed:
  *   1. the persist form plans ZERO src-keyed exchanges above its
  *      cache (the InMemoryTableScan layout satisfies the join) —
  *      asserted on the plan text;
  *   2. the checkpointed-repartition form still plans its edge-side
  *      exchange (LogicalRDD drops outputPartitioning), i.e. a
  *      repartition in front of a checkpoint is dead cost — asserted.
  * Rows-identical across all three arms is asserted; arms alternate
  * in one JVM after a throwaway warm-up. Writes
  * target/graph_view_ab.json.
  *
  * Run: `sbt "runMain graft.GraphViewAB [sfDir]"`.
  */
object GraphViewAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("gvab_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    val li = graft.io.Tables.load(spark, dir, "lineitem")
    val edges = graft.graph.GraphOps.copurchaseEdges(li)
    def bidir = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
    val ddPlain = bidir.localCheckpoint(true)
    val ddRepCkpt = bidir.repartition(col("src")).localCheckpoint(true)
    val ddRepPersist = bidir.repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // fourth arm: also sorted within partitions — the cached ordering
    // propagates like the partitioning, so a sort-merge join can skip
    // the edge-side SORT as well as its exchange
    val ddRepSortPersist = bidir.repartition(col("src"))
      .sortWithinPartitions("src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = ddRepPersist.count()

    val lbl = ddPlain.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .localCheckpoint(true)

    def round(dd: DataFrame): DataFrame =
      dd.join(lbl, dd("src") === lbl("node"))
        .select(col("dst").as("n2"), col("lbl").as("l2"))
        .groupBy("n2", "l2").agg(count(lit(1)).as("c"))

    // the mechanism, pinned on plan text: EnsureRequirements decides
    // the dd-side exchange statically from the source's declared
    // partitioning, so the initial physical plan is the evidence.
    // Only ENSURE_REQUIREMENTS exchanges count — the user repartition
    // itself prints as REPARTITION_BY_COL inside the cache/checkpoint
    // build lineage and is the layout, not a planner-added shuffle.
    def srcExchanges(dd: DataFrame): Int =
      round(dd).queryExecution.executedPlan.toString.linesIterator
        .count(_.matches(
          """.*Exchange hashpartitioning\(src#\d+.*ENSURE_REQUIREMENTS.*"""))
    val exPersist = srcExchanges(ddRepPersist)
    val exCkpt = srcExchanges(ddRepCkpt)
    val exPlain = srcExchanges(ddPlain)
    require(exPersist == 0,
      s"persist form planned $exPersist src exchanges — layout reuse broken")
    require(exCkpt >= 1 && exPlain >= 1,
      s"expected the non-persist forms to plan a src exchange " +
        s"(ckpt=$exCkpt plain=$exPlain) — update the evidence story")

    // identical output all four ways — layout is physical, not logical
    val armRows =
      Seq(ddPlain, ddRepCkpt, ddRepPersist, ddRepSortPersist).map(round)
    for (other <- armRows.tail) {
      val diff = armRows.head.exceptAll(other).count() +
        other.exceptAll(armRows.head).count()
      require(diff == 0, s"arms disagree: $diff differing rows")
    }

    def time(dd: DataFrame): Double = {
      val t0 = System.nanoTime()
      round(dd).agg(count(lit(1))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    time(ddPlain) // throwaway JVM warm-up
    val reps = 3
    val ts = (1 to reps).map { _ =>
      (time(ddPlain), time(ddRepCkpt), time(ddRepPersist),
        time(ddRepSortPersist))
    }
    val (p, ck, pe, ps) = (ts.map(_._1).min, ts.map(_._2).min,
      ts.map(_._3).min, ts.map(_._4).min)
    val json =
      f"""{"sf_dir":"$dir","n_edges":$nEdges,"regime":"forced-shuffle-join",""" +
      f""""round_plain_ckpt_sec":$p%.3f,"round_repart_ckpt_sec":$ck%.3f,""" +
      f""""round_repart_persist_sec":$pe%.3f,""" +
      f""""round_repart_sorted_persist_sec":$ps%.3f,""" +
      f""""speedup_vs_plain":${p / pe}%.2f,""" +
      f""""speedup_sorted_vs_plain":${p / ps}%.2f,""" +
      f""""src_exchanges":{"plain_ckpt":$exPlain,"repart_ckpt":$exCkpt,""" +
      f""""repart_persist":$exPersist},"reps":$reps,"rows_identical":true}"""
    println(json)
    Files.write(Paths.get("target/graph_view_ab.json"),
      (json + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    spark.stop()
  }
}
