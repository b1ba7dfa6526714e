package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the CDC audit between two versions of a
  * dataset (nightly crawl vs yesterday's): which ids appeared,
  * vanished, or changed content. Content comparison is by md5 digest
  * so the exchange carries ids + 16-byte hashes, never two copies of
  * the text; the join is a single full-outer hash join on the id.
  * Unchanged rows (the overwhelming majority at scale) are dropped
  * before the result leaves the engine.
  */
object Snapshot {

  def diff(prev: DataFrame, cur: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val p = prev.select(col(idCol).cast("long").as("doc_id"),
      md5(col(textCol)).as("p_h"))
    val c = cur.select(col(idCol).cast("long").as("doc_id"),
      md5(col(textCol)).as("c_h"))
    p.join(c, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("p_h").isNull, "added")
          .when(col("c_h").isNull, "removed")
          .when(col("p_h") =!= col("c_h"), "changed"))
      .filter(col("status").isNotNull)
      .select("doc_id", "status")
  }
}
