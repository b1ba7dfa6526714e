package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Registration plumbing shared by the per-category query modules.
  *
  * Each declared query is a named `(SparkSession, sfDir) => DataFrame`
  * with an optional DuckDB-dialect oracle SQL computing the identical
  * result over the same parquet tables (the driver's `t2` contract —
  * SURVEY.md §5.3). Queries without an oracle get the driver's weaker
  * rows-only check (kernels and hash-seeded ops that ANSI SQL can't
  * reproduce).
  */
trait QueryRegistry {
  type Q = (SparkSession, String) => DataFrame

  private val reg = mutable.LinkedHashMap.empty[String, (Q, Option[String])]

  /** Declare an oracle-checked query. */
  protected def q(name: String, sql: String)(fn: Q): Unit = {
    // a second registration under one key would silently replace the
    // first in the driver contract (this bit la_funnel in round 7 —
    // the step funnel shadowed the r6 conversion table unnoticed)
    require(!reg.contains(name), s"duplicate query registration: $name")
    reg(name) = (fn, Some(sql.stripMargin.trim))
  }

  /** Declare a rows-only query (no SQL-expressible oracle). */
  protected def qNoOracle(name: String)(fn: Q): Unit = {
    require(!reg.contains(name), s"duplicate query registration: $name")
    reg(name) = (fn, None)
  }

  private val anchors = mutable.LinkedHashMap.empty[String, String]

  /** Declare a rows-only query whose payload is formally ANCHORED by a
    * named golden twin (r14 verdict #7): the live-data row itself
    * cannot be SQL-oracled (ANSI SQL cannot run the kernel on live
    * data), but every projection it ships is replayed verbatim by
    * `twin` — an oracle-checked query that runs the SAME production
    * code over a committed golden fixture with independently computed
    * expected rows. The declaration is validated at aggregation time
    * ([[SparkEntry.goldenAnchored]]): the twin must exist and be
    * oracle-checked, the live row must not be. The driver still
    * records the live row as rows-only; the anchor makes the
    * "documented-necessity" claim executable instead of prose.
    */
  protected def qGoldenAnchored(name: String, twin: String)(fn: Q): Unit = {
    require(!reg.contains(name), s"duplicate query registration: $name")
    reg(name) = (fn, None)
    anchors(name) = twin
  }

  def queries: Map[String, Q] = reg.map { case (k, (f, _)) => k -> f }.toMap

  def oracleSql: Map[String, String] =
    reg.collect { case (k, (_, Some(s))) => k -> s }.toMap

  def goldenAnchors: Map[String, String] = anchors.toMap
}
