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
    // presence is its own flag: md5(null) is null, so testing the
    // DIGEST for null would misread a null-text row present in one
    // snapshot as absent ("added"/"removed"). The digest compare is
    // null-safe for the same reason — two null texts are the same
    // content (unchanged), null vs text is a change.
    val p = prev.select(col(idCol).cast("long").as("doc_id"),
      md5(col(textCol)).as("p_h"), lit(1).as("p_present"))
    val c = cur.select(col(idCol).cast("long").as("doc_id"),
      md5(col(textCol)).as("c_h"), lit(1).as("c_present"))
    p.join(c, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("p_present").isNull, "added")
          .when(col("c_present").isNull, "removed")
          .when(!(col("p_h") <=> col("c_h")), "changed"))
      .filter(col("status").isNotNull)
      .select("doc_id", "status")
  }
}
