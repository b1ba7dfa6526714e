package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Paths}

/** Dev tool (r15 optimization round): dumps `explain("formatted")` for a
  * comma-separated list of declared queries into per-query text files —
  * the before/after plan evidence under plans/r15/.
  *
  * Usage:
  *   sbt "runMain graft.PlanDump <out-dir> <suffix> <name1,name2,...> [sfDir]"
  * writes <out-dir>/<name>_<suffix>.txt for each query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <out-dir> <suffix> <name1,name2,...> [sfDir]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length >= 4) args(3) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    // Internal frames whose plans the declared queries hide behind
    // eager checkpoints (iterative graph ops return checkpointed
    // results, so their declared plan is a Scan ExistingRDD): these
    // pseudo-names dump the structural stage the optimization claims
    // are about. All lazy — nothing executes.
    def internal(name: String): Option[org.apache.spark.sql.DataFrame] = {
      def li = graft.io.Tables.load(spark, dir, "lineitem")
      name match {
        case "_copurchase_edges" =>
          Some(graft.graph.GraphOps.copurchaseEdges(li))
        case "_lpa_round" =>
          // one synchronous LPA round over the standing view — the
          // stage g_lpa/g_modularity's checkpointed results hide
          Some(graft.graph.GraphOps.lpaRoundPlan(
            graft.graph.GraphOps.copurchaseView(li)))
        case _ => None
      }
    }
    names.foreach { name =>
      val df = internal(name).getOrElse(
        SparkEntry.queries(name)(spark, dir))
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"wrote ${outDir.resolve(s"${name}_$suffix.txt")}")
      // between-query hygiene: drop leftover persisted blocks so one
      // query's standing view cannot skew the next plan's statistics
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
