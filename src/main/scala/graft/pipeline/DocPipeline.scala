package graft.pipeline

import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end document curation (the training-data analog of the §3
  * trend lifecycles): quality gate → language ID → exact dedup →
  * near-dup removal → reproducible split — composed from the operator
  * modules, one lazy plan per stage, no driver-side loops.
  */
object DocPipeline {

  final case class CurationParams(
      minTokens: Int = 10,
      minQualityScore: Double = 0.2,
      nearDupJaccard: Double = 0.8,
      trainPct: Int = 80,
      // phrase-repetition gate (Gopher top-2-gram rule): drop docs whose
      // most frequent bigram covers more than this many permille of
      // tokens (integer-compared — no float knife-edge). 0 = off.
      // The dup-word rule stays in TextAnalysis.repetitionStats for
      // corpora where it is calibrated.
      maxTopBigramPermille: Int = 0,
      // benchmark decontamination: doc_id % 100 < benchmarkPct marks
      // the held-out eval slice; those docs AND any doc sharing a
      // `decontamNGram`-gram with them are excluded. 0 = off.
      benchmarkPct: Int = 0,
      decontamNGram: Int = 8)

  /** Returns the curated corpus with per-doc columns:
    * (doc_id, text, lang, lang_pred, n_tokens, quality_score, bucket,
    * split). Near-duplicate clusters keep their lowest doc_id.
    */
  def curate(spark: SparkSession, docs: DataFrame,
      params: CurationParams): DataFrame = {
    // 1. quality features + gate
    val quality = TextAnalysis.qualityProjection(docs)
      .filter(col("n_tokens") >= params.minTokens &&
        col("quality_score") >= params.minQualityScore)
      .select("doc_id", "n_tokens", "quality_score")
    val gated0 = docs.join(quality, "doc_id")

    // 1b. phrase-repetition gate (top-bigram coverage, integer compare)
    val gated =
      if (params.maxTopBigramPermille <= 0) gated0
      else {
        val repOk = TextAnalysis.repetitionStats(gated0)
          .filter(col("top_bigram_cnt") * 2 * 1000 <=
            col("n_tokens") * params.maxTopBigramPermille)
          .select("doc_id")
        gated0.join(repOk, "doc_id")
      }

    // 2. language ID
    val withLang = TextAnalysis.withLangId(gated)

    // 3. exact dedup: keep the min doc_id per text hash
    val keepExact = Dedup.exactDedup(withLang)
      .select(col("keep_id").as("doc_id"))
    val exactDeduped = withLang.join(keepExact, "doc_id")

    // 4. near-dup removal: MinHash-LSH candidates (recall-oriented low
    //    estimate cut) re-verified with EXACT n-gram Jaccard before any
    //    doc is destroyed — the 32-hash estimate alone has σ≈0.07 at
    //    J=0.8, enough to delete non-duplicates. Every verified victim
    //    (higher doc_id of a pair) drops.
    val candidates = Dedup.minhashCandidates(exactDeduped,
      minEstJaccard = math.max(0.0, params.nearDupJaccard - 0.25))
    val victims = Dedup.verifyCandidatesNgram(exactDeduped, candidates,
        minJaccard = params.nearDupJaccard)
      .select(col("doc_b").as("doc_id")).distinct()
    val nearDeduped = exactDeduped.join(victims, Seq("doc_id"), "left_anti")

    // 4b. benchmark decontamination: the eval slice comes out of the
    //     ORIGINAL corpus (eval sets are external to curation), its
    //     docs leave the train set, and so does any doc sharing an
    //     n-gram with them.
    val decontaminated =
      if (params.benchmarkPct <= 0) nearDeduped
      else {
        val isBench = col("doc_id") % 100 < params.benchmarkPct
        val contaminated = Dedup.decontaminate(docs, isBench,
            params.decontamNGram)
          .filter(col("contaminated") === 1).select("doc_id")
        nearDeduped
          .filter(!(col("doc_id") % 100 < params.benchmarkPct))
          .join(contaminated, Seq("doc_id"), "left_anti")
      }

    // 5. reproducible split
    Sampling.hashSplit(decontaminated, "doc_id", params.trainPct)
      .select("doc_id", "text", "lang", "lang_pred", "n_tokens",
        "quality_score", "bucket", "split")
  }

  /** Corpus-level summary of a curated set. Averages are reported as
    * exact scaled-integer ratios (sum·10⁴ div n): token counts are ints
    * and quality_score is a 4-decimal value whose ×10⁴ form rounds to
    * an exact integer per row, so the outputs are independent of
    * summation order and engine — oracle-safe where round(avg(..))
    * is not.
    */
  def stats(curated: DataFrame): DataFrame =
    curated.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(CAST(n_tokens AS BIGINT) * 10000) div count(1)")
          .as("avg_tokens_u"),
        expr("sum(CAST(round(quality_score * 10000) AS BIGINT)) div count(1)")
          .as("avg_quality_u"),
        countDistinct("lang_pred").as("n_langs"))
}
