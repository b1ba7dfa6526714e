package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic 10× scale-up of the sf0.1 `documents`/`embeddings`/
  * `lineitem`/`events` tables for the sf1 stretch bench (the SCALE.md
  * extrapolations get a measured data point instead of an argument).
  * BENCH INPUT ONLY — every correctness entry reads the
  * driver-generated /root/testdata tables untouched.
  *
  * Replica 0 is the original row. Replicas 1..9 keep each document's
  * exact token multiset but deterministically ROTATE token order by a
  * (doc_id, replica)-keyed offset: unigram/Zipf statistics, document
  * lengths, and total token volume all scale exactly linearly (the
  * gram pass, shuffles and bounded-state aggregates see 10× the same
  * work), while long shared spans across replicas are broken so the
  * span-dedup duplicate RATE stays near its natural sf0.1 level
  * instead of degenerating to 90% exact duplication. Embedding
  * replicas add a ±1e-3 per-dimension perturbation keyed on
  * (vec_id, replica, dim): vectors are distinct but the cluster
  * geometry (and so IVF bucket occupancy) is preserved.
  *
  * No wall-clock or RNG state anywhere — the output is a pure function
  * of the input tables, so regenerating after `sbt clean` yields
  * byte-identical timings inputs.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.drop(1).headOption.getOrElse("/root/repo/target/sf1")
    val factor = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.io.Tables.configure(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val replicas = spark.range(factor).select(col("id").cast("int").as("rep"))

    val docs = graft.io.Tables.load(spark, srcDir, "documents")
      .crossJoin(replicas)
      .select(
        (col("doc_id") * factor + col("rep")).as("doc_id"),
        expr(s"""CASE WHEN rep = 0 THEN text ELSE
            array_join(concat(
              slice(split(text, ' '),
                CAST(pmod(xxhash64(doc_id, rep), size(split(text, ' '))) + 1 AS INT),
                size(split(text, ' ')) -
                  CAST(pmod(xxhash64(doc_id, rep), size(split(text, ' '))) AS INT)),
              slice(split(text, ' '), 1,
                CAST(pmod(xxhash64(doc_id, rep), size(split(text, ' '))) AS INT))),
            ' ') END""").as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val embs = graft.io.Tables.load(spark, srcDir, "embeddings")
      .crossJoin(replicas)
      .select(
        (col("vec_id") * factor + col("rep")).as("vec_id"),
        expr("""CASE WHEN rep = 0 THEN embedding ELSE
            transform(embedding, (v, i) -> CAST(v +
              (pmod(xxhash64(vec_id, rep, i), 2001) - 1000) / 1e6
              AS FLOAT)) END""").as("embedding"),
        col("label"))
    embs.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // lineitem: each replica remaps BOTH keys (order and part), so the
    // co-purchase graph becomes `factor` DISJOINT copies of the sf0.1
    // graph — nodes, edges, wedges, triangles and per-iteration
    // PageRank work all scale exactly linearly, the envelope the graph
    // sf1 bench rows are read against. Non-key columns pass through.
    val li = graft.io.Tables.load(spark, srcDir, "lineitem")
    val liCols = li.columns.map {
      case "l_orderkey" => (col("l_orderkey") * factor + col("rep"))
        .as("l_orderkey")
      case "l_partkey" => (col("l_partkey") * factor + col("rep"))
        .as("l_partkey")
      case c => col(c)
    }
    li.crossJoin(replicas).select(liCols: _*)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    // events: each replica remaps user_id (the series/pixel key) and
    // event_id, keeping timestamps and values — `factor`× the series
    // count at identical per-series length, so kernel pipelines
    // (composite → PolyTrend/DBEST) see exactly factor× the work.
    // Written through the normalized (µs timestamp) view; the catalog
    // reader dispatches on the observed type either way.
    val ev = graft.io.Tables.load(spark, srcDir, "events")
      .crossJoin(replicas)
      .select(
        (col("event_id") * factor + col("rep")).as("event_id"),
        col("ts"),
        (col("user_id") * factor + col("rep")).as("user_id"),
        col("event_type"), col("value"), col("props"))
    ev.write.mode("overwrite").parquet(s"$outDir/events.parquet")

    println(s"""{"gen":"sf${factor / 10}","docs":${docs.count()},"vecs":${embs.count()},"lines":${li.count() * factor},"events":${ev.count()},"out":"$outDir"}""")
    spark.stop()
  }
}
