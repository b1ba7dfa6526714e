package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized corpus digest table — the state an INCREMENTAL dedup
  * pipeline keeps between ingests ([[graft.dedup.Dedup.incrementalDedup]]'s
  * Scaladoc names this posture; this is the concrete store).
  *
  * At 100 TB re-hashing the standing corpus per ingest is the dominant
  * cost — the text scan, not the join. Writing the 8-byte digest table
  * once (bucketed on the digest so the ingest join can co-locate
  * against it without an exchange on the store side) turns every
  * subsequent ingest into: hash the BATCH only, join against a
  * digest-bucketed scan, append the survivors' digests. The parquet
  * digest table for a 100 TB corpus is ~8 GB per 10⁹ docs — three
  * orders of magnitude smaller than the text.
  */
object DigestStore {

  /** Distinct xxhash64 digests of a corpus' text column. */
  def digests(corpus: DataFrame, textCol: String = "text"): DataFrame =
    corpus.select(xxhash64(col(textCol)).as("text_hash")).distinct()

  /** Materialize the digest table, bucketed on the digest. Bucketing
    * uses `saveAsTable` (bucket metadata lives in the catalog;
    * plain-path parquet cannot carry it — the same constraint
    * ObservationStore.writeBucketed documents).
    */
  def write(corpus: DataFrame, table: String, buckets: Int = 32,
      textCol: String = "text"): Unit =
    digests(corpus, textCol).write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, "text_hash").sortBy("text_hash")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Incremental exact dedup of `incoming` against a MATERIALIZED
    * digest table — same verdict semantics as
    * [[graft.dedup.Dedup.incrementalDedup]] (`new` / `dup_corpus` /
    * `dup_batch`, null-safe) but the corpus side is a digest scan, not
    * a re-hash of the corpus text.
    */
  def incrementalDedup(storedDigests: DataFrame, incoming: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val h = xxhash64(col(textCol))
    val corpusDigests = storedDigests
      .select(col("text_hash").as("ch")).distinct()
      .withColumn("in_corpus", lit(1))
    val inc = incoming.select(col(idCol), h.as("th"))
    val batchKeep = inc.groupBy(col("th").as("bh"))
      .agg(min(col(idCol)).as("batch_keep"))
    inc
      .join(corpusDigests, col("th") <=> col("ch"), "left")
      .join(batchKeep, col("th") <=> col("bh"))
      .select(col(idCol),
        when(col("in_corpus") === 1, "dup_corpus")
          .when(col(idCol) =!= col("batch_keep"), "dup_batch")
          .otherwise("new").as("status"))
  }

  /** Digests to append to the store after an ingest: the accepted
    * (`new`) docs' hashes — so the next ingest sees them as corpus.
    */
  def acceptedDigests(incoming: DataFrame, verdicts: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    incoming.join(verdicts.filter(col("status") === "new")
        .select(idCol), idCol)
      .select(xxhash64(col(textCol)).as("text_hash")).distinct()
}
