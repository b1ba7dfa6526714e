package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline (SURVEY §7.5):
  * tokenization, quality scoring, language ID, fingerprinting. All
  * column-expression based (codegen'd) except the language heuristic,
  * which is a small Scala UDF over the token array.
  */
object TextAnalysis {

  /** Whitespace tokens; the `documents` corpus is single-space joined. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword count: word-piece regex splits on word boundaries
    * and digit/letter transitions — an upper bound proxy for tokenizer
    * load without shipping a vocab.
    */
  def bpeishTokenCount(text: Column): Column =
    size(filter(
      split(text, "(?<=[a-z])(?=[A-Z0-9])|(?<=[0-9])(?=[a-zA-Z])|\\s+|(?=[^\\w\\s])"),
      t => length(t) > 0))

  private val stopwords = Seq(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by")

  /** Stopword hits among tokens (array intersection, no UDF). */
  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isInCollection(stopwords)))

  /** Quality features + composite score in one projection:
    * length/stopword/alpha ratios à la C4/Gopher filters.
    */
  def qualityProjection(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      length(col("text")).as("n_chars_measured"),
      stopwordCount(toks).as("n_stop"))
      // score computed from the raw ratios (not the rounded display
      // columns): combining pre-rounded values lands exactly on decimal
      // half-boundaries where Java's shortest-repr rounding and C-style
      // rounding of the true binary value disagree.
      .withColumn("quality_score",
        round(least(col("n_stop") / col("n_tokens") * 2.5, lit(1.0)) * 0.5 +
          least((col("n_chars_measured") - (col("n_tokens") - 1)) /
            col("n_tokens") / 8.0, lit(1.0)) * 0.5, 4))
      .withColumn("stop_ratio",
        round(col("n_stop") / col("n_tokens"), 4))
      .withColumn("mean_tok_len",
        round((col("n_chars_measured") - (col("n_tokens") - 1)) /
          col("n_tokens"), 4))
  }

  /** Language-marker sets for the n-gram/stopword language heuristic.
    * Deterministic argmax with fixed tie-break order.
    */
  private val langMarkers: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "of", "and", "to", "in", "is", "that", "it"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "los", "del"),
    "de" -> Set("der", "die", "und", "das", "von", "mit", "ist", "den"),
    "fr" -> Set("le", "la", "les", "et", "des", "est", "une", "dans"),
    "it" -> Set("il", "di", "che", "la", "per", "con", "del", "una"),
    "pt" -> Set("o", "de", "que", "em", "do", "da", "um", "para"),
    "nl" -> Set("de", "het", "een", "van", "en", "dat", "is", "op"),
    "zh" -> Set.empty, "ja" -> Set.empty, "ko" -> Set.empty,
    "ru" -> Set.empty, "ar" -> Set.empty)

  /** Heuristic language ID: stopword-marker voting over tokens, with a
    * CJK/Cyrillic/Arabic script check for the non-Latin entries;
    * "und" (undetermined) when nothing scores.
    */
  val langIdUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (toks: Seq[String]) =>
      if (toks == null || toks.isEmpty) "und"
      else {
        val joined = toks.mkString
        def scriptShare(pred: Int => Boolean): Double =
          if (joined.isEmpty) 0.0
          else joined.count(ch => pred(ch.toInt)).toDouble / joined.length
        val cjk = scriptShare(cp => (cp >= 0x4e00 && cp <= 0x9fff))
        val cyr = scriptShare(cp => (cp >= 0x0400 && cp <= 0x04ff))
        val ara = scriptShare(cp => (cp >= 0x0600 && cp <= 0x06ff))
        if (cjk > 0.3) "zh"
        else if (cyr > 0.3) "ru"
        else if (ara > 0.3) "ar"
        else {
          val lower = toks.map(_.toLowerCase)
          val scores = langMarkers.collect {
            case (lang, markers) if markers.nonEmpty =>
              lang -> lower.count(markers.contains)
          }
          val (bestLang, bestScore) = scores.maxBy(_._2)
          if (bestScore == 0) "und" else bestLang
        }
      }
    }

  def withLangId(docs: DataFrame): DataFrame =
    docs.withColumn("lang_pred", langIdUdf(tokens(col("text"))))
}
