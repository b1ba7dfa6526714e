package graft.sim

import graft.dedup.Dedup.cosineCol
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §7.5): brute-force cosine top-k as the correctness baseline,
  * and a random-hyperplane LSH-bucketed variant as the scale path (probe
  * only vectors sharing a signature prefix bucket instead of all n).
  */
object Similarity {

  /** Brute-force cosine top-k: every query vector against the full
    * corpus. The corpus side is broadcast when small; at scale the
    * queries×corpus product is the bottleneck — use [[lshTopK]].
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("eq"))
    val c = corpus.select(col("vec_id").as("cand_id"),
      transform(col("embedding"), _.cast("double")).as("ec"))
    val scored = q.join(broadcast(c), col("query_id") =!= col("cand_id"))
      .withColumn("cosine", cosineCol(col("eq"), col("ec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (seed, plane,
    * dim) — splitmix64 mapped to ±1.
    */
  private def planeSign(seed: Long, plane: Int, dim: Int): Double = {
    var x = seed + plane.toLong * 1315423911L + dim.toLong * 2654435761L +
      0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x = x ^ (x >>> 31)
    if ((x & 1L) == 0L) 1.0 else -1.0
  }

  /** The deterministic ±1 sign grid for a table's hyperplanes —
    * sign(plane)(dim) exactly as [[hyperplaneSig]] derives it. Public so
    * the DuckDB oracle embeds the identical constants.
    */
  def planeSignTable(planes: Int, dims: Int, seed: Long): Seq[Seq[Int]] =
    Seq.tabulate(planes, dims)((p, d) => planeSign(seed, p, d).toInt)

  /** Random-hyperplane signature: `planes` sign bits packed in a Long. */
  private[sim] def hyperplaneSig(vec: Seq[Double], planes: Int, seed: Long): Long = {
    var sig = 0L
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var d = 0
      while (d < vec.length) {
        acc += vec(d) * planeSign(seed, p, d)
        d += 1
      }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** IVF-style approximate top-k: a k-means coarse quantizer (MLlib,
    * seeded) assigns every vector to one of `nlist` cells; each query
    * probes its `nprobe` nearest cells and exact cosine re-ranks only
    * those candidates. At scale the inverted lists are the partition
    * layout — a query touches nprobe/nlist of the corpus instead of
    * all of it.
    */
  def ivfTopK(embeddings: DataFrame, k: Int, nlist: Int = 16,
      nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    val base = embeddings.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))
      .withColumn("features", array_to_vector(col("e")))
    // quantizer: random init + few iterations — in production the
    // coarse quantizer is fitted once offline and reused; this inline
    // fit keeps the query self-contained
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setInitMode("random").setMaxIter(8)
      .setFeaturesCol("features").setPredictionCol("cell")
    val fitted = model.fit(base)
    val assigned = fitted.transform(base)
      .select(col("vec_id"), col("e"), col("cell"))
    val centers: Array[Array[Double]] = fitted.clusterCenters.map(_.toArray)
    val probeUdf = udf { (e: Seq[Double]) =>
      centers.zipWithIndex.map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < e.length) { val t = e(j) - c(j); d += t * t; j += 1 }
        (d, i)
      }.sortBy(_._1).take(nprobe).map(_._2)
    }
    val queries = assigned
      .select(col("vec_id").as("query_id"), col("e").as("eq"),
        explode(probeUdf(col("e"))).as("cell"))
    val cands = queries.join(
        assigned.select(col("vec_id").as("cand_id"), col("e").as("ec"),
          col("cell")),
        Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .dropDuplicates("query_id", "cand_id")
      .withColumn("cosine", cosineCol(col("eq"), col("ec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** LSH-bucketed approximate top-k: vectors sharing any of the `tables`
    * signature buckets are candidates; exact cosine re-ranks. Recall is
    * tunable via planes/tables; each table is one shuffle key, so cost
    * scales with bucket occupancy instead of n².
    */
  def lshTopK(embeddings: DataFrame, k: Int, planes: Int = 12,
      tables: Int = 4, seed: Long = 42L): DataFrame = {
    val sigUdf = udf { (vec: Seq[Double], table: Int) =>
      hyperplaneSig(vec, planes, seed + table * 0x51ab61c3L)
    }
    val base = embeddings.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))
    val tablesDf = base
      .withColumn("tbl", explode(sequence(lit(0), lit(tables - 1))))
      .withColumn("bucket", sigUdf(col("e"), col("tbl")))
    val a = tablesDf.select(col("tbl"), col("bucket"),
      col("vec_id").as("query_id"), col("e").as("eq"))
    val b = tablesDf.select(col("tbl").as("tbl_b"), col("bucket").as("bucket_b"),
      col("vec_id").as("cand_id"), col("e").as("ec"))
    val cands = a.join(b,
        col("tbl") === col("tbl_b") && col("bucket") === col("bucket_b") &&
          col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id", "eq", "ec")
      .dropDuplicates("query_id", "cand_id")
      .withColumn("cosine", cosineCol(col("eq"), col("ec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Per-label centroids in long format (label, dim, centroid, n_vecs):
    * posexplode → per-(label, dim) mean — one shuffle keyed on
    * (label, dim), partial aggregation map-side, no vector assembly on
    * the driver. The building block for IVF coarse quantizers and
    * class-prototype analysis; long format keeps it relational (and
    * DuckDB-oracle checkable) instead of opaque arrays.
    */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(round(avg(col("v").cast("double")), 6).as("centroid"),
        count(lit(1)).as("n_vecs"))
}
