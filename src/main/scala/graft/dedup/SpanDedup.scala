package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Span-level exact-substring deduplication (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better"): find
  * every maximal token span that appears verbatim in `minDocs`+
  * distinct documents, at k-gram granularity. Doc-level dedup
  * ([[Dedup.exactDedup]]) misses boilerplate shared across otherwise
  * distinct pages (headers, licenses, templates); this operator is the
  * suffix-array pass of the paper re-expressed as three relational
  * stages, each a narrow-key shuffle:
  *
  *  1. gram stream — map-local: per doc, every k-token window is
  *     hashed to a 60-bit md5-prefix key. Only (doc_id, pos, 8-byte
  *     key) rows enter the exchange, never text.
  *  2. duplicated grams — one groupBy on the key with map-side
  *     partial counts; `count(DISTINCT doc_id) >= minDocs` keeps
  *     cross-document repeats only (intra-doc repetition is the
  *     repetition filter's job, not dedup's).
  *  3. span assembly — hits join back on the key (AQE may broadcast
  *     the dup-key set; it is vastly smaller than the gram stream),
  *     then a per-doc gaps-and-islands window merges overlapping
  *     windows into maximal spans: consecutive hit positions whose
  *     gap is <= k overlap or touch, a gap > k starts a new island.
  *
  * At 100 TB the gram stream is ~tokens x 16 bytes; stage 2's
  * reduction is the only wide shuffle and combines map-side (distinct
  * grams per partition bound the exchange, not the token stream).
  * Stage 3's window partitions by doc_id — per-doc state is bounded
  * by the doc's own token count, so no skew beyond document length.
  *
  * Skew trade-off, stated honestly: the default (minDocs = 2) path
  * detects duplicates with a gkey-partitioned window, which buffers
  * one gram-key group per task — a pathological gram repeated across
  * millions of docs lands on one reducer (rows are 16 bytes and
  * WindowExec spills, so it degrades, not breaks). The minDocs > 2
  * path is the skew-immune alternative (map-combined groupBy), at the
  * price of re-running the text pass on the join branch; at extreme
  * scale, materialize [[gramTable]] once (the ingest-once posture of
  * `io.ObservationStore`) and feed both branches from parquet.
  */
object SpanDedup {

  /** (doc_id, pos, gkey) gram stream — one pass over the text. Public
    * so extreme-scale callers can materialize it once (parquet/persist)
    * and run the duplicate analysis off the 16-byte-row table instead
    * of re-tokenizing, as the class doc's skew note describes.
    */
  def gramTable(docs: DataFrame, k: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    gramStream(docs, k, textCol, idCol)

  private def gramStream(docs: DataFrame, k: Int, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextAnalysis.ngramsCol(
          TextAnalysis.tokens(col(textCol)), k)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        conv(substring(md5(col("col")), 1, 15), 16, 10)
          .cast("long").as("gkey"))

  /** Gram stream annotated per-key with the keeper (min doc_id) and a
    * cross-document-duplicate flag, via ONE gkey-partitioned window —
    * no groupBy + self-join, which would re-run the whole tokenize ->
    * ngram -> md5 pass on the second branch (measured 2x the runtime
    * of this shape). minDocs > 2 needs a true distinct count, so that
    * (non-default) case takes the two-pass aggregate instead.
    */
  private def annotated(docs: DataFrame, k: Int, minDocs: Int,
      textCol: String, idCol: String): DataFrame = {
    val grams = gramStream(docs, k, textCol, idCol)
    if (minDocs == 2) {
      val byKey = Window.partitionBy("gkey")
      grams
        .withColumn("keep_doc", min("doc_id").over(byKey))
        .withColumn("is_dup",
          min("doc_id").over(byKey) =!= max("doc_id").over(byKey))
    } else {
      val agg = grams.groupBy("gkey")
        .agg(min(col("doc_id")).as("keep_doc"),
          count_distinct(col("doc_id")).as("nd"))
      grams.join(agg, "gkey")
        .withColumn("is_dup", col("nd") >= minDocs).drop("nd")
    }
  }

  /** Gaps-and-islands merge of hit positions into maximal spans. */
  private def islands(hits: DataFrame, k: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    hits
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(byDoc) > k, lit(1))
          .otherwise(lit(0)))
      .withColumn("island", sum("brk").over(byDoc))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"),
        count(lit(1)).as("n_dup_grams"))
  }

  /** Maximal duplicated spans: (doc_id, span_start, span_end,
    * span_len, n_dup_grams), positions 1-based token indices.
    */
  def duplicateSpans(docs: DataFrame, k: Int = 8, minDocs: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val hits = annotated(docs, k, minDocs, textCol, idCol)
      .filter(col("is_dup")).select("doc_id", "pos")
    islands(hits, k)
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"),
        col("n_dup_grams"))
  }

  /** Per-document duplicated-token coverage — the filterable signal
    * (drop or trim docs whose text is mostly boilerplate). Every doc
    * appears, zero-span docs with dup_tokens = 0.
    */
  def spanDupShare(docs: DataFrame, k: Int = 8, minDocs: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val perDoc = duplicateSpans(docs, k, minDocs, textCol, idCol)
      .groupBy("doc_id")
      .agg(sum(col("span_len")).as("dup_tokens"))
    docs.select(col(idCol).cast("long").as("doc_id"),
        size(TextAnalysis.tokens(col(textCol))).as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)) / col("n_tokens"), 4)
          .as("dup_share"))
  }

  /** Corpus cleaning (the actionable form): remove every token covered
    * by a duplicated span, EXCEPT in the keeper document — per gram,
    * the smallest doc_id containing it — so exactly one copy of each
    * duplicated passage survives corpus-wide (Lee et al.'s dedup
    * policy). Reassembly is distributed: tokens are position-tagged,
    * covered positions flagged by a per-doc span join (islands are
    * disjoint, so the join never fans out), and the survivors
    * re-joined with a sorted collect inside the doc_id aggregation —
    * no driver-side assembly, state bounded by document length.
    */
  def spanDedupClean(docs: DataFrame, k: Int = 8, minDocs: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val removable = annotated(docs, k, minDocs, textCol, idCol)
      .filter(col("is_dup") && col("doc_id") =!= col("keep_doc"))
      .select("doc_id", "pos")
    val spans = islands(removable, k)
      .select(col("doc_id"), col("span_start").as("rm_start"),
        col("span_end").as("rm_end"))
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol))))
      .select(col("doc_id"), (col("pos") + 1).as("p"),
        col("col").as("tok"))
    toks.join(spans,
        toks("doc_id") === spans("doc_id") &&
          col("p") >= col("rm_start") && col("p") <= col("rm_end"),
        "left")
      .select(toks("doc_id"), col("p"), col("tok"),
        col("rm_start").isNotNull.as("covered"))
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(when(!col("covered"),
            struct(col("p"), col("tok"))))),
          x => x.getField("tok")), " ").as("clean_text"),
        sum(when(col("covered"), 1L).otherwise(0L)).as("n_removed"),
        sum(when(!col("covered"), 1L).otherwise(0L)).as("n_kept"))
  }

  /** DuckDB oracle for [[spanDedupClean]]. */
  def spanDedupCleanOracleSql(k: Int = 8, minDocs: Int = 2): String =
    s"""${spanCtes(k, minDocs)},
       |keeper AS (
       |  SELECT gkey, min(doc_id) AS keep_doc FROM g2
       |  GROUP BY gkey HAVING count(DISTINCT doc_id) >= $minDocs),
       |rem AS (
       |  SELECT g.doc_id, g.pos FROM g2 g JOIN keeper USING (gkey)
       |  WHERE g.doc_id <> keep_doc),
       |risl AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
       |                                        ORDER BY pos) > $k
       |              THEN 1 ELSE 0 END AS brk
       |  FROM rem),
       |rspans AS (
       |  SELECT doc_id, min(pos) AS rm_start,
       |         max(pos) + ${k - 1} AS rm_end
       |  FROM (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
       |                                           ORDER BY pos) AS island
       |        FROM risl)
       |  GROUP BY doc_id, island),
       |tokpos AS (
       |  SELECT doc_id,
       |         CAST(unnest(generate_series(1, len(t))) AS INT) AS p,
       |         unnest(t) AS tok
       |  FROM toks),
       |marked AS (
       |  SELECT tp.doc_id, tp.p, tp.tok,
       |         (s.rm_start IS NOT NULL) AS covered
       |  FROM tokpos tp LEFT JOIN rspans s
       |    ON tp.doc_id = s.doc_id
       |   AND tp.p BETWEEN s.rm_start AND s.rm_end)
       |SELECT doc_id,
       |       coalesce(string_agg(CASE WHEN covered THEN NULL ELSE tok END,
       |                           ' ' ORDER BY p), '') AS clean_text,
       |       CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_removed,
       |       CAST(sum(CASE WHEN covered THEN 0 ELSE 1 END) AS BIGINT)
       |         AS n_kept
       |FROM marked GROUP BY doc_id""".stripMargin

  /** DuckDB oracle for [[duplicateSpans]], generated from the same
    * (k, minDocs) so the two expression trees cannot drift.
    */
  def duplicateSpansOracleSql(k: Int = 8, minDocs: Int = 2): String =
    s"""${spanCtes(k, minDocs)}
       |SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
       |       CAST(max(pos) + ${k - 1} AS INT) AS span_end,
       |       CAST(max(pos) + ${k - 1} - min(pos) + 1 AS INT) AS span_len,
       |       count(*) AS n_dup_grams
       |FROM isl2 GROUP BY doc_id, island""".stripMargin

  /** DuckDB oracle for [[spanDupShare]]. */
  def spanDupShareOracleSql(k: Int = 8, minDocs: Int = 2): String =
    s"""${spanCtes(k, minDocs)},
       |per_doc AS (
       |  SELECT doc_id, sum(span_len) AS dup_tokens FROM (
       |    SELECT doc_id, max(pos) + ${k - 1} - min(pos) + 1 AS span_len
       |    FROM isl2 GROUP BY doc_id, island) GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(t.t) AS INT) AS n_tokens,
       |       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |       round(coalesce(p.dup_tokens, 0) / len(t.t), 4) AS dup_share
       |FROM toks t LEFT JOIN per_doc p USING (doc_id)""".stripMargin

  /** Shared CTE chain: token grams -> 60-bit keys -> cross-doc dup
    * keys -> hit positions -> gaps-and-islands ids.
    */
  private def spanCtes(k: Int, minDocs: Int): String =
    s"""WITH toks AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |         string_split(text, ' ') AS t
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |         CAST(unnest(generate_series(1, len(t) - ${k - 1})) AS INT)
       |           AS pos,
       |         unnest(list_transform(generate_series(1, len(t) - ${k - 1}),
       |           i -> array_to_string(
       |                  t[CAST(i AS INT):CAST(i + ${k - 1} AS INT)], ' ')))
       |           AS gram
       |  FROM toks),
       |g2 AS (
       |  SELECT doc_id, pos,
       |         CAST(CAST(('0x' || substr(md5(gram), 1, 15)) AS UBIGINT)
       |              AS BIGINT) AS gkey
       |  FROM grams),
       |dup AS (SELECT gkey FROM g2
       |        GROUP BY gkey HAVING count(DISTINCT doc_id) >= $minDocs),
       |hits AS (SELECT doc_id, pos FROM g2
       |         WHERE gkey IN (SELECT gkey FROM dup)),
       |isl AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
       |                                        ORDER BY pos) > $k
       |              THEN 1 ELSE 0 END AS brk
       |  FROM hits),
       |isl2 AS (
       |  SELECT doc_id, pos,
       |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM isl)""".stripMargin
}
