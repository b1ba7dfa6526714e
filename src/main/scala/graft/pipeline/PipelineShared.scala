package graft.pipeline

import graft.io.Tables
import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Helpers shared by more than one pipeline query family after the
  * PipelineQueries split (r14 verdict #6): table loaders and the
  * cluster/URL-canon scaffolding used by both a dd_ and a t_ entry.
  * private[pipeline] — reachable from the family registries, never
  * part of the public surface.
  */
private[pipeline] object PipelineShared {

  private[pipeline] def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "documents")

  private[pipeline] def embs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "embeddings")

  /** Duplicate-cluster resolution: the verified n-gram pairs (the
    * dd_ngram_jaccard CTE chain) fed through connected components, so
    * transitive chains (A~B, B~C) collapse to one canonical keeper even
    * when A~C was never emitted. The Spark side runs min-label
    * propagation with pointer jumping (O(log diameter) rounds); the
    * oracle replays the closure as a recursive CTE — min reachable id
    * per vertex, singletons included via the base case.
    */
  private[pipeline] val clusterCtes: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |grams AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
      |          FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
      |cnt AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |pairs AS (SELECT doc_a, doc_b FROM inter
      |          JOIN cnt ca ON ca.doc_id = doc_a
      |          JOIN cnt cb ON cb.doc_id = doc_b
      |          WHERE round(n_inter / (ca.n_grams + cb.n_grams - n_inter), 4) >= 0.8),
      |edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs
      |          UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach(v, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT reach.v, e.t FROM reach JOIN edges e ON e.s = reach.r)"""

  // URL canonicalization + domain blocklist gate (the source-level
  // curation step every crawl pipeline runs before text dedup). The
  // corpus has no URL column, so one is synthesized deterministically
  // from (source, doc_id) — mixed case, two TLDs, query strings and
  // trailing slashes all exercised — with the SAME expression in the
  // oracle. Canonicalization is the fixed regex cascade in
  // TextAnalysis.canonicalUrl; everything is map-only. The synth +
  // canon pair is shared (one Scala builder, one SQL fragment) with
  // dd_url_dedup so the two URL entries cannot drift.
  private[pipeline] val urlSynthCanonSql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |         'https://www.' || upper(source) ||
      |         CASE WHEN doc_id % 3 = 0 THEN '.org' ELSE '.com' END ||
      |         '/p/' || CAST(doc_id % 7 AS VARCHAR) ||
      |         CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x&ref=1'
      |              WHEN doc_id % 5 = 0 THEN '/' ELSE '' END AS url
      |  FROM documents),
      |c AS (SELECT doc_id,
      |             regexp_replace(regexp_replace(regexp_replace(
      |               regexp_replace(lower(url), '^https?://', ''),
      |               '^www\.', ''), '\?.*$', ''), '/$', '') AS url_canon
      |      FROM u)""".stripMargin

  private[pipeline] def urlCanonFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val url = concat(lit("https://www."), upper(col("source")),
      when(col("doc_id") % 3 === 0, ".org").otherwise(".com"),
      lit("/p/"), (col("doc_id") % 7).cast("string"),
      when(col("doc_id") % 2 === 0, "?utm_source=x&ref=1")
        .when(col("doc_id") % 5 === 0, "/").otherwise(""))
    docs(s, d).select(col("doc_id"),
      TextAnalysis.canonicalUrl(url).as("url_canon"))
  }
}
