package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a token stream, expressed relationally.
  *
  * The classical formulation keeps a d x w counter matrix per worker
  * and vector-adds them; here the matrix IS the aggregation result:
  * grouping the (row, bucket) stream counts with map-side partial
  * aggregation is exactly "build a partial sketch per partition, then
  * merge" — the shuffle carries at most d*w rows per map partition
  * (d=4, w=256 -> 1024 counters), NEVER the token stream. Estimates
  * then come from a probe join: est(t) = min over rows r of
  * sketch[r][h_r(t)], which upper-bounds the true count by
  * construction (Cormode & Muthukrishnan 2005).
  *
  * Bucket hashing is an md5 prefix (deterministic, engine-neutral),
  * so a SQL oracle can rebuild the identical sketch by brute force.
  * Complements [[MisraGries]]: MG gives guaranteed heavy hitters with
  * O(k) state; CMS answers point frequency queries for ANY token with
  * one-sided error eps = e/w at confidence 1 - e^-d.
  */
object CountMin {

  /** h_r(tok): 32-bit md5 prefix of "r:tok" mod w. */
  def bucketCol(r: Int, tok: Column, w: Int): Column =
    conv(substring(md5(concat_ws(":", lit(r), tok)), 1, 8), 16, 10)
      .cast("long") % w

  /** The d x w sketch as a (r, bucket, c) table. */
  def sketch(docs: DataFrame, d: Int = 4, w: Int = 256,
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(
      explode(graft.text.TextAnalysis.tokens(col(textCol))).as("tok"))
    toks.select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucketCol(r, col("tok"), w).as("bucket"))
      ): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** CMS point estimates vs exact counts for every distinct token —
    * the overcount column audits the eps * N error bound. At corpus
    * scale you would probe a fixed token list instead of the whole
    * vocabulary; the estimate path (probe x d join against the 1024-
    * row sketch, broadcast) is the same either way.
    */
  def estimates(docs: DataFrame, d: Int = 4, w: Int = 256,
      textCol: String = "text"): DataFrame = {
    // everything derives from ONE vocab aggregate: the sketch counter
    // for (r, b) is the sum of exact counts of tokens hashing there,
    // so building it from vocab instead of the raw stream is exact —
    // and because both branches share the identical vocab exchange,
    // Spark reuses it (ReusedExchange) and the token stream is
    // scanned/hashed once, not three times.
    val vocab = docs.select(
        explode(graft.text.TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
    val rb = vocab.select(col("tok"), col("exact_cnt"),
        explode(array((0 until d).map(r =>
          struct(lit(r).as("r"), bucketCol(r, col("tok"), w).as("bucket"))
        ): _*)).as("rb"))
      .select(col("tok"), col("exact_cnt"),
        col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    val sk = rb.groupBy("r", "bucket").agg(sum(col("exact_cnt")).as("c"))
    rb.join(broadcast(sk), Seq("r", "bucket"))
      .groupBy("tok", "exact_cnt").agg(min(col("c")).as("est_count"))
      .select(col("tok"), col("est_count"), col("exact_cnt"),
        (col("est_count") - col("exact_cnt")).as("overcount"))
  }

  /** DuckDB oracle for [[estimates]], generated from (d, w). */
  def estimatesOracleSql(d: Int = 4, w: Int = 256): String = {
    val rows = (0 until d).mkString("[", ", ", "]")
    // h_r(t), DuckDB dialect; concat() not || so no line ever starts
    // with a pipe stripMargin would eat
    def h(t: String) =
      s"""CAST(CAST(('0x' || substr(md5(concat(CAST(r AS VARCHAR), ':',
         |      $t)), 1, 8)) AS UBIGINT) % $w AS BIGINT)""".stripMargin
    s"""WITH tok AS (
       |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |exact AS (SELECT tok, count(*) AS exact_cnt FROM tok GROUP BY tok),
       |rb AS (
       |  SELECT tok, r, ${h("tok")} AS bucket
       |  FROM tok, unnest($rows) AS u(r)),
       |sketch AS (SELECT r, bucket, count(*) AS c
       |           FROM rb GROUP BY r, bucket),
       |pb AS (
       |  SELECT e.tok, r, ${h("e.tok")} AS bucket
       |  FROM exact e, unnest($rows) AS u(r)),
       |est AS (
       |  SELECT tok, min(c) AS est_count
       |  FROM pb JOIN sketch USING (r, bucket) GROUP BY tok)
       |SELECT e.tok, CAST(est_count AS BIGINT) AS est_count,
       |       CAST(exact_cnt AS BIGINT) AS exact_cnt,
       |       CAST(est_count - exact_cnt AS BIGINT) AS overcount
       |FROM exact e JOIN est USING (tok)""".stripMargin
  }

  /** DuckDB oracle for [[sketch]] itself — the (r, bucket, c) counter
    * table rebuilt brute-force from the token stream with the same md5
    * bucketing. Used by the STREAMING twin (`st_countmin_sketch`),
    * whose output is the sketch, not the estimates: the probe join is
    * a second aggregation and doesn't stream, the sketch build does.
    */
  def sketchOracleSql(d: Int = 4, w: Int = 256): String = {
    val rows = (0 until d).mkString("[", ", ", "]")
    s"""WITH tok AS (
       |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |rb AS (
       |  SELECT r, CAST(CAST(('0x' || substr(md5(concat(CAST(r AS VARCHAR),
       |      ':', tok)), 1, 8)) AS UBIGINT) % $w AS BIGINT) AS bucket
       |  FROM tok, unnest($rows) AS u(r))
       |SELECT CAST(r AS INT) AS r, bucket,
       |       CAST(count(*) AS BIGINT) AS c
       |FROM rb GROUP BY 1, 2""".stripMargin
  }
}
