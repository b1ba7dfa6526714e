package graft.pipeline

import graft.text.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drift-immunity proof for the two-phase global-rank operators
  * (r9 verdict #1). RangePartitioner draws reservoir samples with a
  * seed derived from the RDD id, so once partitions outgrow the
  * sample size, each execution of an UNPERSISTED repartitionByRange
  * lineage may derive different range boundaries — and offsets
  * collected from execution 1 applied to execution 2's partitioning
  * silently corrupt the global rank/cumsum. budgetSelect and
  * tokenizeToIds now eagerly localCheckpoint the ranged frame so both
  * the offsets collect and the downstream plan read ONE materialized
  * partitioning.
  *
  * These specs make the hazard LIVE at test scale by forcing
  * non-exhaustive reservoir sampling
  * (spark.sql.execution.rangeExchange.sampleSizePerPartition=1, vs
  * the 100-row default that makes small tests exhaustively sampled
  * and accidentally drift-free), then assert the distributed result
  * still equals the naive single-partition global computation.
  */
class SamplingDriftSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Run `f` with the range-exchange reservoir shrunk to 1 sample per
    * partition — every range boundary becomes a function of the
    * sampler seed, so any two-action boundary drift WILL misalign
    * offsets. Restores the previous value afterwards (the conf is
    * session-shared across suites).
    */
  private def withTinySampler[A](f: => A): A = {
    val key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "1")
    try f
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("budgetSelect equals the naive global cumsum cut under non-exhaustive range sampling") {
    import spark.implicits._
    val n = 5000
    // Deterministic scores with heavy ties so the (score desc, id)
    // boundaries land mid-tie — the worst case for range tiling.
    val rows = (1 to n).map { i =>
      (i.toLong, ((i * 2654435761L) % 97L).toInt, 10L + i % 7)
    }
    val df = rows.toDF("id", "score", "n_tokens").repartition(8)
    val budget = 9000L
    withTinySampler {
      val got = Sampling
        .budgetSelect(df, "id", "score", "n_tokens", budget)
        .select("id").as[Long].collect().sorted.toSeq
      val w = Window.orderBy(col("score").desc, col("id"))
      val want = df
        .withColumn("cum", sum(col("n_tokens").cast("long")).over(w))
        .filter(col("cum") <= budget)
        .select("id").as[Long].collect().sorted.toSeq
      assert(want.nonEmpty && want.length < n, "cut must be a strict prefix")
      assert(got == want)
      // Determinism across invocations (each builds a fresh lineage,
      // i.e. a fresh sampler seed): same cut both times.
      val again = Sampling
        .budgetSelect(df, "id", "score", "n_tokens", budget)
        .select("id").as[Long].collect().sorted.toSeq
      assert(again == want)
    }
  }

  test("tokenizeToIds ids equal the naive global row_number under non-exhaustive range sampling") {
    import spark.implicits._
    // 600 distinct tokens over 120 docs — far beyond 1-sample-per-
    // partition exhaustiveness, with count ties across most tokens.
    val docs = (0 until 120).map { d =>
      val toks = (0 until 40).map(j => s"t${(d * 40 + j * 7) % 600}")
      (d.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text").repartition(8)
    withTinySampler {
      val got = TextAnalysis.tokenizeToIds(docs)
        .select("doc_id", "ids").as[(Long, String)].collect()
        .sortBy(_._1).toSeq
      val naiveVocab = TextAnalysis.unigramCounts(docs)
        .withColumn("id",
          row_number().over(Window.orderBy(col("c").desc, col("tok"))))
      val want = docs
        .select(col("doc_id"), posexplode(TextAnalysis.tokens(col("text"))))
        .select(col("doc_id"), col("pos"), col("col").as("tok"))
        .join(naiveVocab, Seq("tok"))
        .groupBy("doc_id")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("id")))),
          x => x.getField("id")), ",").as("ids"))
        .select("doc_id", "ids").as[(Long, String)].collect()
        .sortBy(_._1).toSeq
      assert(got.size == 120)
      assert(got == want)
    }
  }
}
