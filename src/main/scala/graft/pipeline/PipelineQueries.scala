package graft.pipeline

import graft.QueryRegistry
import graft.dedup.{Dedup, SpanDedup}
import graft.functions.RollingHash.rolling_hash
import graft.io.Tables
import graft.multimodal.Multimodal
import graft.sim.Similarity
import graft.text.{Search, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-contract entries for the training-data pipeline operators
  * (SURVEY §7.5): text analysis, dedup family, similarity search, and
  * multimodal plumbing over the `documents`/`embeddings` tables.
  */
object PipelineQueries extends QueryRegistry {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "documents")
  private def embs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "embeddings")

  // ------------------------------------------------------ text analysis

  q("t_tokens",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq,
      |       CAST(length(text) AS INT) AS n_chars_measured
      |FROM documents""") { (s, d) =>
    val toks = TextAnalysis.tokens(col("text"))
    docs(s, d).select(col("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_uniq"),
      length(col("text")).as("n_chars_measured"))
  }

  q("t_quality",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |       CAST(length(text) AS INT) AS n_chars_measured,
      |       CAST(len(list_filter(string_split(text, ' '), x -> x IN
      |         ('the','a','an','of','and','or','to','in','is','it',
      |          'for','on','with','as','at','by'))) AS INT) AS n_stop,
      |       round(len(list_filter(string_split(text, ' '), x -> x IN
      |         ('the','a','an','of','and','or','to','in','is','it',
      |          'for','on','with','as','at','by'))) /
      |         len(string_split(text, ' ')), 4) AS stop_ratio,
      |       round((length(text) - (len(string_split(text, ' ')) - 1)) /
      |         len(string_split(text, ' ')), 4) AS mean_tok_len,
      |       round(least(len(list_filter(string_split(text, ' '), x -> x IN
      |         ('the','a','an','of','and','or','to','in','is','it',
      |          'for','on','with','as','at','by'))) /
      |         len(string_split(text, ' ')) * 2.5, 1.0) * 0.5 +
      |         least((length(text) - (len(string_split(text, ' ')) - 1)) /
      |         len(string_split(text, ' ')) / 8.0, 1.0) * 0.5, 4) AS quality_score
      |FROM documents""") { (s, d) =>
    TextAnalysis.qualityProjection(docs(s, d))
  }

  /** Per-source quantile normalization of the quality score (score
    * calibration before cross-source mixing): each doc's rank within
    * its source mapped to [0, 10⁶] ppm — rank 1 (best) → 0, last →
    * 10⁶ — so thresholds mean the same thing in every source
    * regardless of its score distribution. The rank window is keyed
    * by source over the ×10⁴ integer score with doc_id tiebreak (a
    * total order); source sizes join back AQE-sized. A catalog-scale
    * hub source would switch to the two-phase range-partitioned rank
    * (the tokenize-to-ids machinery).
    */
  q("t_qnorm",
    """WITH q AS (
      |  SELECT doc_id, source,
      |         CAST(floor(round(least(len(list_filter(string_split(text, ' '),
      |           x -> x IN ('the','a','an','of','and','or','to','in','is',
      |                      'it','for','on','with','as','at','by'))) /
      |           len(string_split(text, ' ')) * 2.5, 1.0) * 0.5 +
      |           least((length(text) - (len(string_split(text, ' ')) - 1)) /
      |           len(string_split(text, ' ')) / 8.0, 1.0) * 0.5, 4)
      |           * 10000 + 0.5) AS BIGINT) AS score_u
      |  FROM documents),
      |n AS (SELECT source, CAST(count(*) AS BIGINT) AS ns FROM q
      |      GROUP BY 1),
      |r AS (SELECT doc_id, source, score_u,
      |             row_number() OVER (PARTITION BY source
      |               ORDER BY score_u DESC, doc_id) AS rk
      |      FROM q)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, source, score_u,
      |       CAST(rk AS INT) AS rk,
      |       CASE WHEN ns > 1
      |            THEN CAST((rk - 1) * 1000000 // (ns - 1) AS BIGINT)
      |            ELSE CAST(0 AS BIGINT) END AS norm_ppm
      |FROM r JOIN n USING (source)""") { (s, d) =>
    val w = Window.partitionBy("source")
      .orderBy(col("score_u").desc, col("doc_id"))
    val q = TextAnalysis.qualityProjection(docs(s, d))
      .select(col("doc_id"),
        expr("CAST(floor(quality_score * 10000 + 0.5) AS BIGINT)")
          .as("score_u"))
      .join(docs(s, d).select(col("doc_id"), col("source")), "doc_id")
    val n = q.groupBy("source").agg(count(lit(1)).as("ns"))
    q.withColumn("rk", row_number().over(w))
      .join(n, "source")
      .select(col("doc_id"), col("source"), col("score_u"),
        col("rk").cast("int").as("rk"),
        when(col("ns") > 1,
          expr("(rk - 1) * 1000000L div (ns - 1)"))
          .otherwise(0L).as("norm_ppm"))
  }

  // Deflate compression ratio (Gopher repetition/noise gate): zlib is
  // deterministic for a fixed level but no SQL engine exposes it, so
  // this is a DECLARED rows-only entry — the semantics are pinned by
  // PipelineOpsSpec (repetitive text compresses below the band, random
  // hex stays inside it, ordering invariants).
  qNoOracle("t_compress_ratio") { (s, d) =>
    TextAnalysis.compressionProjection(docs(s, d))
  }

  // Decile quality binning: 9 percentile cut points from one tiny
  // agg, broadcast, then map-local threshold comparison — the
  // scale-correct alternative to a global ntile() sort.
  q("t_quality_bins",
    """WITH q AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
      |         round(least(len(list_filter(string_split(text, ' '), x -> x IN
      |           ('the','a','an','of','and','or','to','in','is','it',
      |            'for','on','with','as','at','by'))) /
      |           len(string_split(text, ' ')) * 2.5, 1.0) * 0.5 +
      |           least((length(text) - (len(string_split(text, ' ')) - 1)) /
      |           len(string_split(text, ' ')) / 8.0, 1.0) * 0.5, 4) AS qs
      |  FROM documents),
      |t AS (SELECT quantile_cont(qs, [0.1, 0.2, 0.3, 0.4, 0.5,
      |                                0.6, 0.7, 0.8, 0.9]) AS ts FROM q)
      |SELECT CAST(bin AS INT) AS bin, count(*) AS n_docs,
      |       min(qs) AS min_q, max(qs) AS max_q,
      |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
      |FROM (SELECT q.*, 1 + len(list_filter(ts, x -> qs > x)) AS bin
      |      FROM q, t)
      |GROUP BY bin""") { (s, d) =>
    TextAnalysis.qualityDeciles(docs(s, d))
  }

  /** Token-budget selection ("the best 1000 tokens"): rank by
    * (quality_score desc, doc_id), keep the prefix whose running token
    * total fits the budget. The oracle's single cumsum window IS the
    * semantics; the Spark side computes the identical prefix sum with
    * the distributed two-phase machinery ([[Sampling.budgetSelect]] —
    * range exchange + per-partition window + collected offsets), so
    * the entry doubles as an oracle proof that the two-phase
    * formulation equals the naive global window.
    */
  q("t_budget_select",
    """WITH q AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
      |         round(least(len(list_filter(string_split(text, ' '), x -> x IN
      |           ('the','a','an','of','and','or','to','in','is','it',
      |            'for','on','with','as','at','by'))) /
      |           len(string_split(text, ' ')) * 2.5, 1.0) * 0.5 +
      |           least((length(text) - (len(string_split(text, ' ')) - 1)) /
      |           len(string_split(text, ' ')) / 8.0, 1.0) * 0.5, 4)
      |           AS quality_score
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, quality_score, n_tokens,
      |         sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
      |                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
      |  FROM q)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, quality_score,
      |       CAST(n_tokens AS INT) AS n_tokens,
      |       CAST(cum_tokens AS BIGINT) AS cum_tokens
      |FROM r WHERE cum_tokens <= 1000""") { (s, d) =>
    val scored = TextAnalysis.qualityProjection(docs(s, d))
      .select(col("doc_id"), col("quality_score"), col("n_tokens"))
    Sampling.budgetSelect(scored, "doc_id", "quality_score",
        "n_tokens", budget = 1000L)
      .select(col("doc_id"), col("quality_score"), col("n_tokens"),
        col("cum_tokens"))
  }

  /** DuckDB text for the language heuristic, generated from the SAME
    * marker lists / script ranges as the Spark expression
    * (TextAnalysis.langMarkers / scriptRanges) so the two can't drift.
    */
  private val langIdOracleSql: String = {
    val shares = TextAnalysis.scriptRanges.map { case (lang, pat) =>
      s"""CASE WHEN length(joined) > 0 THEN (length(joined) -
         |  length(regexp_replace(joined, '$pat', '', 'g'))) * 1.0 /
         |  length(joined) ELSE 0 END AS share_$lang""".stripMargin
    }.mkString(",\n")
    val scores = TextAnalysis.langMarkers.map { case (lang, ms) =>
      val lst = ms.map(m => s"'$m'").mkString("[", ", ", "]")
      s"len(list_filter(string_split(lower(text), ' '), " +
        s"t -> list_contains($lst, t))) AS s_$lang"
    }.mkString(",\n")
    val gArgs = TextAnalysis.langMarkers.map("s_" + _._1).mkString(", ")
    val scriptWhens = TextAnalysis.scriptRanges.map { case (lang, _) =>
      s"WHEN share_$lang > 0.3 THEN '$lang'"
    }.mkString("\n")
    val markerWhens = TextAnalysis.langMarkers.map { case (lang, _) =>
      s"WHEN s_$lang = best THEN '$lang'"
    }.mkString("\n")
    s"""WITH f AS (
       |  SELECT doc_id, lang, text, replace(text, ' ', '') AS joined
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, lang,
       |$shares,
       |$scores
       |  FROM f),
       |g AS (SELECT *, greatest($gArgs) AS best FROM s)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang AS lang_declared,
       |       CASE
       |$scriptWhens
       |WHEN best = 0 THEN 'und'
       |$markerWhens
       |ELSE 'und' END AS lang_pred
       |FROM g""".stripMargin
  }

  // Language heuristic — pure column expression (codegen'd), so the
  // whole decision tree is oracle-checkable against DuckDB.
  q("t_langid", langIdOracleSql) { (s, d) =>
    TextAnalysis.withLangId(docs(s, d))
      .select(col("doc_id"), col("lang").as("lang_declared"),
        col("lang_pred"))
  }

  /** Classifier evaluation (the eval-harness op): per-class confusion
    * counts and fixed-point precision/recall/F1 of the language
    * heuristic against the declared `lang` column. The confusion
    * matrix is one groupBy on (declared, predicted) — its cardinality
    * is bounded by classes², a constant, so everything after the first
    * aggregation is trivial regardless of corpus size. Ratios are ppm
    * integers ((tp·10⁶) div (tp+fp)) so no float ever enters the
    * hash. Classes = union of declared and predicted labels (a
    * predicted-only class scores tp=0).
    */
  q("t_langid_metrics",
    s"""WITH pred AS ($langIdOracleSql),
       |conf AS (
       |  SELECT lang_declared AS d, lang_pred AS p,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM pred GROUP BY 1, 2),
       |classes AS (
       |  SELECT d AS cls FROM conf UNION SELECT p FROM conf),
       |tp AS (SELECT d AS cls, n AS tp FROM conf WHERE d = p),
       |fp AS (SELECT p AS cls, CAST(sum(n) AS BIGINT) AS fp
       |       FROM conf WHERE d <> p GROUP BY 1),
       |fn AS (SELECT d AS cls, CAST(sum(n) AS BIGINT) AS fn
       |       FROM conf WHERE d <> p GROUP BY 1),
       |m AS (
       |  SELECT cls, coalesce(tp, 0) AS tp, coalesce(fp, 0) AS fp,
       |         coalesce(fn, 0) AS fn
       |  FROM classes LEFT JOIN tp USING (cls)
       |       LEFT JOIN fp USING (cls) LEFT JOIN fn USING (cls)),
       |r AS (
       |  SELECT cls, tp, fp, fn,
       |         CASE WHEN tp + fp = 0 THEN CAST(0 AS BIGINT)
       |              ELSE (tp * 1000000) // (tp + fp) END AS prec_ppm,
       |         CASE WHEN tp + fn = 0 THEN CAST(0 AS BIGINT)
       |              ELSE (tp * 1000000) // (tp + fn) END AS rec_ppm
       |  FROM m)
       |SELECT cls, tp, fp, fn, prec_ppm, rec_ppm,
       |       CASE WHEN prec_ppm + rec_ppm = 0 THEN CAST(0 AS BIGINT)
       |            ELSE (2 * prec_ppm * rec_ppm) // (prec_ppm + rec_ppm)
       |       END AS f1_ppm
       |FROM r""") { (s, d) =>
    val conf = TextAnalysis.withLangId(docs(s, d))
      .groupBy(col("lang").as("d"), col("lang_pred").as("p"))
      .agg(count(lit(1)).as("n"))
    val classes = conf.select(col("d").as("cls"))
      .union(conf.select(col("p"))).distinct()
    val tp = conf.filter(col("d") === col("p"))
      .select(col("d").as("cls"), col("n").as("tp"))
    val fp = conf.filter(col("d") =!= col("p"))
      .groupBy(col("p").as("cls")).agg(sum("n").as("fp"))
    val fn = conf.filter(col("d") =!= col("p"))
      .groupBy(col("d").as("cls")).agg(sum("n").as("fn"))
    classes.join(tp, Seq("cls"), "left").join(fp, Seq("cls"), "left")
      .join(fn, Seq("cls"), "left")
      .select(col("cls"), coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("fp"), lit(0L)).as("fp"),
        coalesce(col("fn"), lit(0L)).as("fn"))
      .withColumn("prec_ppm", when(col("tp") + col("fp") === 0, 0L)
        .otherwise(expr("(tp * 1000000) div (tp + fp)")))
      .withColumn("rec_ppm", when(col("tp") + col("fn") === 0, 0L)
        .otherwise(expr("(tp * 1000000) div (tp + fn)")))
      .withColumn("f1_ppm", when(col("prec_ppm") + col("rec_ppm") === 0, 0L)
        .otherwise(
          expr("(2 * prec_ppm * rec_ppm) div (prec_ppm + rec_ppm)")))
  }

  /** Output-file compaction planner (the small-files op): assign
    * documents to target-size output files by greedy sequential
    * packing inside hash buckets — running cumulative size, file seq =
    * start-offset div target. The window is keyed by the bucket, so no
    * global sort exists and bucket count scales with the cluster; the
    * report is one row per planned file. This is the planning half of
    * a 100 TB compaction job (the writer would `repartition(bucket,
    * file_seq)` on the plan's keys).
    */
  q("t_compaction_plan",
    """WITH d AS (
      |  SELECT doc_id, doc_id % 16 AS bucket, n_chars
      |  FROM documents),
      |o AS (
      |  SELECT doc_id, bucket, n_chars,
      |         coalesce(sum(n_chars) OVER (PARTITION BY bucket
      |           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      |           AND 1 PRECEDING), 0) AS start_off
      |  FROM d)
      |SELECT bucket, CAST(start_off // 2048 AS INT) AS file_seq,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       CAST(min(doc_id) AS BIGINT) AS first_doc,
      |       CAST(max(doc_id) AS BIGINT) AS last_doc
      |FROM o GROUP BY bucket, file_seq""") { (s, d) =>
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs(s, d)
      .select(col("doc_id"), (col("doc_id") % 16).as("bucket"),
        col("n_chars"))
      .withColumn("start_off", coalesce(sum("n_chars").over(w), lit(0L)))
      .groupBy(col("bucket"),
        expr("CAST(start_off div 2048 AS INT)").as("file_seq"))
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
  }

  /** Rank-biased overlap (RBO@10, p=½) between two deterministic
    * document rankings — vocabulary richness (distinct tokens) vs raw
    * length — the rank-agreement metric for comparing retrieval or
    * quality signals. Everything is exact until the final weighted
    * sum: overlap depths X_d are integers, and the fold carries the
    * weight by repeated halving (w·0.5 is exact), evaluated in
    * IDENTICAL operation order on both engines — Spark's `aggregate`
    * higher-order function over the depth-sorted array vs DuckDB's
    * RECURSIVE CTE — so the double agrees bit for bit. The top-10
    * windows run over ≤10-row frames (bounded by construction, the
    * hybrid_search pattern).
    */
  q("t_rbo",
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, len(list_distinct(string_split(text, ' '))) AS nu,
      |         n_chars
      |  FROM documents),
      |ra AS (SELECT doc_id, row_number() OVER (ORDER BY nu DESC, doc_id)
      |              AS r FROM toks QUALIFY r <= 10),
      |rb AS (SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC,
      |              doc_id) AS r FROM toks QUALIFY r <= 10),
      |md AS (SELECT greatest(ra.r, rb.r) AS m
      |       FROM ra JOIN rb USING (doc_id)),
      |x AS (SELECT d, CAST((SELECT count(*) FROM md WHERE m <= d)
      |             AS BIGINT) AS xd
      |      FROM (SELECT unnest(generate_series(1, 10)) AS d)),
      |r AS (
      |  SELECT 1 AS d, 0.5 * xd / 1 AS acc, CAST(0.5 AS DOUBLE) AS w
      |  FROM x WHERE d = 1
      |  UNION ALL
      |  SELECT x.d, r.acc + r.w * 0.5 * x.xd / x.d, r.w * 0.5
      |  FROM r JOIN x ON x.d = r.d + 1)
      |SELECT round(acc, 6) AS rbo,
      |       (SELECT xd FROM x WHERE d = 10) AS overlap_at_10
      |FROM r WHERE d = 10""") { (s, d) =>
    val toks = docs(s, d).select(col("doc_id"),
      size(array_distinct(TextAnalysis.tokens(col("text")))).as("nu"),
      col("n_chars"))
    // top-10 ranks via TakeOrderedAndProject + a sorted-collect of the
    // 10 survivors — no unpartitioned window anywhere (house rule: a
    // WindowExec warning in the bench log must mean a regression)
    def top10(key: org.apache.spark.sql.Column,
        rName: String): org.apache.spark.sql.DataFrame =
      toks.orderBy(key.desc, col("doc_id")).limit(10)
        .select(struct((-key).as("nk"), col("doc_id")).as("s"))
        .agg(sort_array(collect_list(col("s"))).as("xs"))
        .select(posexplode(col("xs")).as(Seq("pos", "e")))
        .select(col("e.doc_id").as("doc_id"),
          (col("pos") + 1).cast("int").as(rName))
    val ra = top10(col("nu"), "r")
    val rb = top10(col("n_chars"), "rb")
    // collect the (≤10) joint-membership depths so zero-overlap
    // rankings still yield all ten X_d rows (with X_d = 0)
    val marr = ra.join(rb, "doc_id")
      .select(greatest(col("r"), col("rb")).as("m"))
      .agg(collect_list(col("m")).as("ms"))
    val xd = marr.crossJoin(
        s.range(1, 11).select(col("id").cast("int").as("d")))
      .select(col("d"),
        size(filter(col("ms"), m => m <= col("d"))).cast("long").as("xd"))
    xd.agg(sort_array(collect_list(struct(col("d"), col("xd"))))
        .as("xs"))
      .select(
        round(expr(
          """aggregate(xs, named_struct('acc', CAST(0.0 AS DOUBLE),
            |                           'w', CAST(1.0 AS DOUBLE)),
            |  (a, e) -> named_struct(
            |    'acc', a.acc + a.w * 0.5 * e.xd / e.d,
            |    'w', a.w * 0.5)).acc""".stripMargin), 6).as("rbo"),
        expr("filter(xs, e -> e.d = 10)[0].xd").as("overlap_at_10"))
  }

  /** Contrastive negative-pair mining (training-pair generation):
    * k=3 deterministic pseudo-random partners per document via a
    * Knuth-constant modular jump over the contiguous id space — no
    * shuffle fan-out, no RNG; the partner fetch is one equi join.
    * `same_source` marks in-domain (harder) negatives. At 100 TB the
    * id space is the dense row_number the curation pipeline already
    * assigns.
    */
  q("t_negative_pairs",
    """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents),
      |cand AS (
      |  SELECT d.doc_id, j,
      |         (d.doc_id + j * 2654435761) % nn AS neg_id,
      |         d.source AS src
      |  FROM documents d, n,
      |       (SELECT unnest(generate_series(1, 3)) AS j))
      |SELECT c.doc_id, CAST(c.j AS INT) AS j, c.neg_id,
      |       CAST(c.src = p.source AS INT) AS same_source,
      |       abs(d2.n_chars - p.n_chars) AS len_gap
      |FROM cand c JOIN documents p ON p.doc_id = c.neg_id
      |            JOIN documents d2 ON d2.doc_id = c.doc_id""") { (s, d) =>
    val dd = docs(s, d)
    val n = dd.agg(count(lit(1)).as("nn"))
    val cand = dd.select(col("doc_id"), col("source").as("src"),
        col("n_chars").as("len_a"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("src"), col("len_a"),
        explode(sequence(lit(1), lit(3))).as("j"), col("nn"))
      .select(col("doc_id"), col("j").cast("int").as("j"), col("src"),
        col("len_a"),
        ((col("doc_id") + col("j") * 2654435761L) % col("nn"))
          .as("neg_id"))
    cand.join(dd.select(col("doc_id").as("neg_id"),
        col("source").as("psrc"), col("n_chars").as("len_b")), "neg_id")
      .select(col("doc_id"), col("j"), col("neg_id"),
        (col("src") === col("psrc")).cast("int").as("same_source"),
        abs(col("len_a") - col("len_b")).as("len_gap"))
  }

  // BPE-ish token count: the piece regex avoids lookarounds so the SAME
  // pattern runs under Java regex and RE2 with identical leftmost-first
  // alternation semantics.
  q("t_bpeish_tokens",
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |       CAST(len(regexp_extract_all(text,
       |         '${TextAnalysis.bpeishPattern}')) AS INT) AS n_bpeish
       |FROM documents""") { (s, d) =>
    docs(s, d).select(col("doc_id"),
      TextAnalysis.bpeishTokenCount(col("text")).as("n_bpeish"))
  }

  q("t_fingerprint_md5",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, md5(text) AS fp
      |FROM documents""") { (s, d) =>
    docs(s, d).select(col("doc_id"), md5(col("text")).as("fp"))
  }

  // Tokenizer fertility per language: pieces-per-word in exact ppm
  // (the BPE-ish piece regex over the whitespace word count) — the
  // per-language cost readout a tokenizer eval reads before allocating
  // vocabulary (high-fertility languages pay more sequence length per
  // word). ONE map-combined aggregate; both counts come from the same
  // shared expressions as t_bpeish_tokens / t_tokens so the three
  // entries cannot drift.
  q("t_fertility",
    s"""WITH f AS (SELECT lang,
       |             len(regexp_extract_all(text,
       |               '${TextAnalysis.bpeishPattern}')) AS nb,
       |             len(string_split(text, ' ')) AS nw
       |           FROM documents)
       |SELECT lang, CAST(sum(nw) AS BIGINT) AS n_words,
       |       CAST(sum(nb) AS BIGINT) AS n_pieces,
       |       CAST(sum(nb) * 1000000 // sum(nw) AS BIGINT)
       |         AS fertility_ppm
       |FROM f GROUP BY lang""") { (s, d) =>
    docs(s, d).select(col("lang"),
        TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("nb"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("nw"))
      .groupBy("lang")
      .agg(sum("nw").as("n_words"), sum("nb").as("n_pieces"))
      .select(col("lang"), col("n_words"), col("n_pieces"),
        expr("n_pieces * 1000000L div n_words").as("fertility_ppm"))
  }

  // Rolling-hash fingerprint via the native Catalyst expression.
  // The native RollingHash expression (h = h·1000003 + byte, Long wrap)
  // reproduced as a mod-2^64 HUGEINT fold over ord() (ASCII corpus:
  // ord == byte) — the codegen'd expression checked against an engine
  // with no JVM in it.
  q("t_fingerprint_rolling",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
      |                 THEN u - CAST('18446744073709551616' AS HUGEINT)
      |                 ELSE u END AS BIGINT) AS fp64
      |FROM (
      |  SELECT doc_id,
      |    list_reduce(
      |      list_prepend(CAST(0 AS HUGEINT),
      |        list_transform(range(1, length(text) + 1),
      |          i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS HUGEINT))),
      |      (acc, ch) -> (acc * 1000003 + ch)
      |                   % CAST('18446744073709551616' AS HUGEINT)) AS u
      |  FROM documents)""") { (s, d) =>
    docs(s, d).select(col("doc_id"), rolling_hash(col("text")).as("fp64"))
  }

  // Winnowing fingerprints (Schleimer et al. 2003 / MOSS): rightmost-
  // minimal k-gram hash per w-window — every shared run of ≥ w+k−1
  // tokens yields a common fingerprint. Pure integer selection; the
  // oracle replays windows, mins, and the rightmost pick relationally.
  q("t_winnow",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents WHERE text IS NOT NULL),
      |base AS (SELECT doc_id, t, CAST(len(t) - 2 AS BIGINT) AS ng
      |         FROM toks WHERE len(t) >= 3),
      |g AS (SELECT doc_id, i AS p,
      |        CAST(CAST(('0x' || substr(md5(
      |          array_to_string(t[i:i+2], ' ')), 1, 12)) AS UBIGINT)
      |          AS BIGINT) AS h
      |      FROM base CROSS JOIN
      |        unnest(generate_series(1, CAST(ng AS INT))) AS u(i)),
      |win AS (SELECT doc_id,
      |          unnest(generate_series(1,
      |            CAST(greatest(ng - 3, 1) AS INT))) AS s
      |        FROM base),
      |j AS (SELECT w.doc_id, w.s, g.p, g.h
      |      FROM win w JOIN g ON g.doc_id = w.doc_id
      |      WHERE g.p >= w.s AND g.p <= w.s + 3),
      |m AS (SELECT doc_id, s, min(h) AS mh FROM j GROUP BY 1, 2),
      |pick AS (SELECT j.doc_id, j.s, m.mh, max(j.p) AS p
      |         FROM j JOIN m ON m.doc_id = j.doc_id AND m.s = j.s
      |                      AND j.h = m.mh
      |         GROUP BY j.doc_id, j.s, m.mh),
      |sel AS (SELECT DISTINCT doc_id, p, mh AS h FROM pick)
      |SELECT base.doc_id, base.ng AS n_grams,
      |       CAST(count(*) AS BIGINT) AS n_sel,
      |       CAST(sum(h) AS BIGINT) AS sel_sum,
      |       CAST(min(h) AS BIGINT) AS sel_min,
      |       CAST(max(h) AS BIGINT) AS sel_max
      |FROM sel JOIN base ON base.doc_id = sel.doc_id
      |GROUP BY base.doc_id, base.ng""") { (s, d) =>
    TextAnalysis.winnow(docs(s, d), k = 3, w = 4)
  }

  // Winnowing pair search (the MOSS detection step): pairs sharing >= 2
  // selected fingerprints, boilerplate fingerprints df-capped before
  // the self-join, scored shared/min(|fp|) in exact ppm. The oracle
  // replays the full selection chain plus the posting-list self-join.
  q("dd_winnow_pairs",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents WHERE text IS NOT NULL),
      |base AS (SELECT doc_id, t, CAST(len(t) - 2 AS BIGINT) AS ng
      |         FROM toks WHERE len(t) >= 3),
      |g AS (SELECT doc_id, i AS p,
      |        CAST(CAST(('0x' || substr(md5(
      |          array_to_string(t[i:i+2], ' ')), 1, 12)) AS UBIGINT)
      |          AS BIGINT) AS h
      |      FROM base CROSS JOIN
      |        unnest(generate_series(1, CAST(ng AS INT))) AS u(i)),
      |win AS (SELECT doc_id,
      |          unnest(generate_series(1,
      |            CAST(greatest(ng - 3, 1) AS INT))) AS s
      |        FROM base),
      |j AS (SELECT w.doc_id, w.s, g.p, g.h
      |      FROM win w JOIN g ON g.doc_id = w.doc_id
      |      WHERE g.p >= w.s AND g.p <= w.s + 3),
      |m AS (SELECT doc_id, s, min(h) AS mh FROM j GROUP BY 1, 2),
      |pick AS (SELECT j.doc_id, j.s, m.mh, max(j.p) AS p
      |         FROM j JOIN m ON m.doc_id = j.doc_id AND m.s = j.s
      |                      AND j.h = m.mh
      |         GROUP BY j.doc_id, j.s, m.mh),
      |ph AS (SELECT DISTINCT doc_id, mh AS h FROM pick),
      |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nf
      |        FROM ph GROUP BY doc_id),
      |ok AS (SELECT h FROM ph GROUP BY h HAVING count(*) <= 64),
      |okph AS (SELECT ph.doc_id, ph.h FROM ph JOIN ok USING (h)),
      |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         CAST(count(*) AS BIGINT) AS n_shared
      |       FROM okph a JOIN okph b ON a.h = b.h AND a.doc_id < b.doc_id
      |       GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT doc_a, doc_b, n_shared, ca.nf AS nf_a, cb.nf AS nf_b,
      |       CAST(n_shared * 1000000 // least(ca.nf, cb.nf) AS BIGINT)
      |         AS score_ppm
      |FROM pr JOIN cnt ca ON ca.doc_id = pr.doc_a
      |        JOIN cnt cb ON cb.doc_id = pr.doc_b""") { (s, d) =>
    graft.dedup.Dedup.winnowPairs(docs(s, d), k = 3, w = 4,
      minShared = 2, maxDocFreq = 64)
  }

  /** Content-defined chunking (r9): boundary before token p whenever
    * the 4-token window ending at p−1 rolling-hashes to low-4-bits
    * zero (expected chunk 16 tokens). The oracle replays the window
    * hash with the same mod-2^64 HUGEINT fold as
    * `t_fingerprint_rolling` (low 4 bits of the unsigned value ==
    * Java's `h & 15` on the signed value — two's complement), the
    * cumsum chunk ids, and the per-chunk md5 over the ORDER BY p
    * string_agg.
    */
  q("t_cdc_chunks",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |pos AS (
      |  SELECT doc_id, i AS p, l[i] AS tok,
      |         CASE WHEN i > 4 AND
      |           list_reduce(
      |             list_prepend(CAST(0 AS HUGEINT),
      |               list_transform(range(1,
      |                   length(array_to_string(l[i-4:i-1], ' ')) + 1),
      |                 j -> CAST(ord(substr(array_to_string(l[i-4:i-1], ' '),
      |                        CAST(j AS INT), 1)) AS HUGEINT))),
      |             (acc, ch) -> (acc * 1000003 + ch)
      |               % CAST('18446744073709551616' AS HUGEINT)) % 16 = 0
      |           THEN 1 ELSE 0 END AS flag
      |  FROM toks, unnest(generate_series(1, len(l))) AS t(i)),
      |ch AS (
      |  SELECT doc_id, p, tok,
      |         sum(flag) OVER (PARTITION BY doc_id ORDER BY p) AS cid
      |  FROM pos)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(cid AS INT) AS chunk_idx,
      |       CAST(count(*) AS BIGINT) AS n_tokens,
      |       md5(string_agg(tok, ' ' ORDER BY p)) AS fp
      |FROM ch GROUP BY doc_id, cid""") { (s, d) =>
    TextAnalysis.cdcChunks(docs(s, d), window = 4, maskBits = 4)
  }

  /** Chunk-level dedup audit over the CDC chunks (r9): fingerprints
    * shared by ≥ 2 documents, with occurrence and doc counts — the
    * "how much storage/compute does chunk-dedup save" number, and the
    * shift-resistance demonstration (shared passages fingerprint
    * identically regardless of position). Chunk strings never shuffle
    * twice: the dedup groupBy carries the 16-byte md5 only.
    */
  q("t_cdc_shared",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |pos AS (
      |  SELECT doc_id, i AS p, l[i] AS tok,
      |         CASE WHEN i > 4 AND
      |           list_reduce(
      |             list_prepend(CAST(0 AS HUGEINT),
      |               list_transform(range(1,
      |                   length(array_to_string(l[i-4:i-1], ' ')) + 1),
      |                 j -> CAST(ord(substr(array_to_string(l[i-4:i-1], ' '),
      |                        CAST(j AS INT), 1)) AS HUGEINT))),
      |             (acc, ch) -> (acc * 1000003 + ch)
      |               % CAST('18446744073709551616' AS HUGEINT)) % 16 = 0
      |           THEN 1 ELSE 0 END AS flag
      |  FROM toks, unnest(generate_series(1, len(l))) AS t(i)),
      |ch AS (
      |  SELECT doc_id, p, tok,
      |         sum(flag) OVER (PARTITION BY doc_id ORDER BY p) AS cid
      |  FROM pos),
      |chunks AS (
      |  SELECT doc_id, cid, count(*) AS n_tokens,
      |         md5(string_agg(tok, ' ' ORDER BY p)) AS fp
      |  FROM ch GROUP BY doc_id, cid)
      |SELECT fp, CAST(count(*) AS BIGINT) AS n_occurrences,
      |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |       CAST(min(n_tokens) AS BIGINT) AS n_tokens
      |FROM chunks GROUP BY fp HAVING count(DISTINCT doc_id) >= 2""") {
    (s, d) =>
    TextAnalysis.cdcChunks(docs(s, d), window = 4, maskBits = 4)
      .groupBy("fp")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("n_tokens")).as("n_tokens"))
      .filter(col("n_docs") >= 2)
  }

  // ------------------------------------------------------------- dedup

  q("dd_exact",
    """SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
      |       CAST(count(*) AS BIGINT) AS n_copies
      |FROM documents GROUP BY text""") { (s, d) =>
    Dedup.exactDedup(docs(s, d)).select("keep_id", "n_copies")
  }

  // Incremental ingest dedup: the incoming slice (doc_id % 10 >= 8)
  // deduped against the existing corpus's digest table and within
  // itself — the steady-state mode (the full re-scan above is the
  // bootstrap). Text never shuffles: the corpus side is 8-byte digests.
  q("dd_incremental",
    """WITH inc AS (SELECT doc_id, text FROM documents
      |             WHERE doc_id % 10 >= 8),
      |corp AS (SELECT DISTINCT text FROM documents WHERE doc_id % 10 < 8),
      |bk AS (SELECT text, min(doc_id) AS batch_keep FROM inc GROUP BY 1)
      |SELECT CAST(i.doc_id AS BIGINT) AS doc_id,
      |       CASE WHEN c.text IS NOT NULL THEN 'dup_corpus'
      |            WHEN i.doc_id <> bk.batch_keep THEN 'dup_batch'
      |            ELSE 'new' END AS status
      |FROM inc i
      |LEFT JOIN corp c ON i.text = c.text
      |JOIN bk ON i.text = bk.text""") { (s, d) =>
    val all = docs(s, d)
    Dedup.incrementalDedup(
      all.filter(col("doc_id") % 10 < 8),
      all.filter(col("doc_id") % 10 >= 8))
  }

  /** Steady-state INGEST composite — the r7 ops chained in the order a
    * production crawl ingest runs them, verified as ONE DuckDB query
    * (the doc_pipeline pattern): URL canonicalize + domain blocklist →
    * incremental exact dedup against the standing corpus's digest
    * table (survivors = status `new`) → token-length gate → TF-IDF
    * top-1 keyword tag over the surviving batch. Stage order is load-
    * bearing and the oracle mirrors it: the blocklist runs BEFORE
    * dedup so a blocked doc can never claim batch-keeper status.
    */
  q("ingest_pipeline",
    """WITH inc0 AS (
      |  SELECT doc_id, text,
      |         regexp_replace(regexp_replace(regexp_replace(
      |           regexp_replace(lower(
      |             'https://www.' || upper(source) ||
      |             CASE WHEN doc_id % 3 = 0 THEN '.org' ELSE '.com' END ||
      |             '/p/' || CAST(doc_id % 7 AS VARCHAR) ||
      |             CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x&ref=1'
      |                  WHEN doc_id % 5 = 0 THEN '/' ELSE '' END),
      |           '^https?://', ''), '^www\.', ''), '\?.*$', ''),
      |           '/$', '') AS url_canon
      |  FROM documents WHERE doc_id % 10 >= 8),
      |inc AS (
      |  SELECT doc_id, text, split_part(url_canon, '/', 1) AS domain
      |  FROM inc0
      |  WHERE split_part(url_canon, '/', 1) NOT IN
      |    ('src1.com', 'src3.org', 'src4.com')),
      |corp AS (SELECT DISTINCT text FROM documents WHERE doc_id % 10 < 8),
      |bk AS (SELECT text, min(doc_id) AS batch_keep FROM inc GROUP BY 1),
      |fresh AS (
      |  SELECT i.doc_id, i.text, i.domain
      |  FROM inc i JOIN bk ON i.text = bk.text
      |  LEFT JOIN corp c ON i.text = c.text
      |  WHERE c.text IS NULL AND i.doc_id = bk.batch_keep),
      |sized AS (
      |  SELECT doc_id, text, domain,
      |         len(string_split(text, ' ')) AS n_tokens
      |  FROM fresh WHERE len(string_split(text, ' ')) >= 10),
      |tf AS (SELECT doc_id, tok AS term, count(*) AS tf
      |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |             FROM sized) GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |             row_number() OVER (
      |               PARTITION BY tf.doc_id
      |               ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.term)
      |               AS rank
      |      FROM tf JOIN df USING (term))
      |SELECT CAST(s.doc_id AS BIGINT) AS doc_id, s.domain,
      |       CAST(s.n_tokens AS INT) AS n_tokens, r.term,
      |       CAST(r.tf AS BIGINT) AS tf, CAST(r.df AS BIGINT) AS df
      |FROM sized s JOIN r ON s.doc_id = r.doc_id AND r.rank = 1""") {
    (s, d) =>
    val all = docs(s, d)
    val url = concat(lit("https://www."), upper(col("source")),
      when(col("doc_id") % 3 === 0, ".org").otherwise(".com"),
      lit("/p/"), (col("doc_id") % 7).cast("string"),
      when(col("doc_id") % 2 === 0, "?utm_source=x&ref=1")
        .when(col("doc_id") % 5 === 0, "/").otherwise(""))
    val inc = all.filter(col("doc_id") % 10 >= 8)
      .withColumn("domain",
        TextAnalysis.domainOf(TextAnalysis.canonicalUrl(url)))
      .filter(!col("domain").isin("src1.com", "src3.org", "src4.com"))
    val fresh = Dedup.incrementalDedup(
        all.filter(col("doc_id") % 10 < 8), inc)
      .filter(col("status") === "new").select("doc_id")
    val sized = inc.join(fresh, "doc_id")
      .withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))))
      .filter(col("n_tokens") >= 10)
    val kw = TextAnalysis.tfIdfTopK(sized.select("doc_id", "text"), k = 1)
      .drop("rank")
    sized.select("doc_id", "domain", "n_tokens").join(kw, "doc_id")
      .select("doc_id", "domain", "n_tokens", "term", "tf", "df")
  }

  /** The full MinHash-LSH pipeline reproduced in DuckDB: shingle FNV-1a
    * via mod-2^64 HUGEINT folds, the 32 universal hashes with an
    * overflow-safe 32-bit-split modmul and JAVA SIGNED min semantics,
    * FNV band hashes (XOR done on 32-bit halves), bucket caps, and the
    * signature-agreement estimate. The (a_f, b_f) constants are
    * generated from Dedup.minhashParams — the same splitmix derivation
    * the JVM uses — so the two cannot drift. est = k/32 is dyadic, so
    * round(.,4) is engine-independent.
    */
  private val minhashOracleSql: String = {
    val M = "CAST('18446744073709551616' AS HUGEINT)"
    val H = "CAST('9223372036854775808' AS HUGEINT)"
    val P = "CAST('1099511628211' AS HUGEINT)"
    val B = "CAST('14695981039346656037' AS HUGEINT)"
    val ps = Dedup.minhashParams(32, 42L)
    val aL = ps.map(p => s"CAST('${p._1}' AS HUGEINT)")
      .mkString("[", ", ", "]")
    val bL = ps.map(p => s"CAST('${p._2}' AS HUGEINT)")
      .mkString("[", ", ", "]")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |sh AS (
       |  SELECT doc_id, array_to_string(l[i:i+2], ' ') AS s
       |  FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
       |shh AS (
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend($B,
       |        list_transform(range(1, length(s) + 1),
       |          i -> CAST(ord(substr(s, CAST(i AS INT), 1)) AS HUGEINT))),
       |      (acc, ch) -> ((acc - (acc % 256) +
       |          CAST(xor(CAST(acc % 256 AS BIGINT), CAST(ch AS BIGINT)) AS HUGEINT))
       |          * $P) % $M) AS x
       |  FROM sh),
       |uh AS (
       |  SELECT doc_id, f,
       |         ((((${aL}[f + 1] * (x // 4294967296)) % 4294967296) * 4294967296
       |            + ${aL}[f + 1] * (x % 4294967296))
       |           + ${bL}[f + 1]) % $M AS u
       |  FROM shh, unnest(generate_series(0, 31)) AS g(f)),
       |sig AS (
       |  SELECT doc_id, f,
       |         min(CAST(CASE WHEN u >= $H THEN u - $M ELSE u END AS BIGINT)) AS mh
       |  FROM uh GROUP BY doc_id, f),
       |sigl AS (SELECT doc_id, list(mh ORDER BY f) AS sig FROM sig GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, sig, band,
       |    list_reduce(
       |      list_prepend($B,
       |        list_transform(sig[band * 4 + 1 : band * 4 + 4],
       |          s -> (CASE WHEN s < 0 THEN CAST(s AS HUGEINT) + $M
       |                ELSE CAST(s AS HUGEINT) END))),
       |      (acc, v) -> (((
       |          CAST(xor(CAST(acc // 4294967296 AS BIGINT), CAST(v // 4294967296 AS BIGINT)) AS HUGEINT) * 4294967296
       |          + CAST(xor(CAST(acc % 4294967296 AS BIGINT), CAST(v % 4294967296 AS BIGINT)) AS HUGEINT))
       |        * $P) % $M)) AS bucket
       |  FROM sigl, unnest(generate_series(0, 7)) AS g(band)),
       |ok_buckets AS (
       |  SELECT band, bucket FROM banded GROUP BY band, bucket
       |  HAVING count(*) BETWEEN 2 AND 64),
       |pairs AS (
       |  SELECT DISTINCT p.doc_id AS doc_a, q.doc_id AS doc_b, p.sig AS sa, q.sig AS sb
       |  FROM banded p
       |  JOIN banded q ON p.band = q.band AND p.bucket = q.bucket AND p.doc_id < q.doc_id
       |  JOIN ok_buckets ob ON ob.band = p.band AND ob.bucket = p.bucket)
       |SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       |       round(len(list_filter(range(1, 33),
       |             i -> sa[CAST(i AS INT)] = sb[CAST(i AS INT)])) / 32.0, 4) AS est_jaccard
       |FROM pairs
       |WHERE len(list_filter(range(1, 33),
       |      i -> sa[CAST(i AS INT)] = sb[CAST(i AS INT)])) / 32.0 >= 0.5""".stripMargin
  }

  q("dd_minhash_lsh", minhashOracleSql) { (s, d) =>
    Dedup.minhashCandidates(docs(s, d), minEstJaccard = 0.5)
      .select(col("doc_a"), col("doc_b"),
        round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** The star-mode oracle (r13): the SAME HUGEINT minhash/banding CTEs
    * spliced up to the pair stage, then hot buckets (> 64) contribute
    * hub→member star edges (hub = bucket-min doc_id) unioned with the
    * capped full-pair set — the viral-family answer measured in
    * SCALE.md: connectivity for the CC keeper pass at k−1 rows per
    * hot bucket instead of exclusion (recall hole) or k²/2 (trap).
    */
  private val minhashStarOracleSql: String = {
    val cut = minhashOracleSql.indexOf("pairs AS (")
    require(cut >= 0, "minhashStarOracleSql splice anchor " +
      "\"pairs AS (\" not found in minhashOracleSql — the pair CTE was " +
      "reworded; update the anchor here to match")
    val tail = minhashOracleSql.indexOf("SELECT CAST(doc_a AS BIGINT)")
    require(tail >= 0, "minhashStarOracleSql final-SELECT anchor missing")
    val ctes = minhashOracleSql.substring(0, cut).trim
    val finalSel = minhashOracleSql.substring(tail)
    s"""$ctes pairs0 AS (
       |  SELECT p.doc_id AS doc_a, q.doc_id AS doc_b, p.sig AS sa, q.sig AS sb
       |  FROM banded p
       |  JOIN banded q ON p.band = q.band AND p.bucket = q.bucket AND p.doc_id < q.doc_id
       |  JOIN ok_buckets ob ON ob.band = p.band AND ob.bucket = p.bucket),
       |hot AS (
       |  SELECT band, bucket, min(doc_id) AS hub FROM banded
       |  GROUP BY band, bucket HAVING count(*) > 64),
       |star AS (
       |  SELECT h.hub AS doc_a, b.doc_id AS doc_b, hb.sig AS sa, b.sig AS sb
       |  FROM banded b
       |  JOIN hot h ON h.band = b.band AND h.bucket = b.bucket AND b.doc_id > h.hub
       |  JOIN banded hb ON hb.band = h.band AND hb.bucket = h.bucket AND hb.doc_id = h.hub),
       |pairs AS (
       |  SELECT DISTINCT doc_a, doc_b, sa, sb FROM
       |    (SELECT * FROM pairs0 UNION ALL SELECT * FROM star))
       |$finalSel""".stripMargin
  }

  // Star-mode MinHash-LSH (r13): identical to dd_minhash_lsh on this
  // corpus unless a bucket exceeds the cap — the testdata has none, so
  // the entry pins "star mode changes NOTHING in the benign regime"
  // (the adversarial regime is measured in graft.AdversarialDedup /
  // SCALE.md, and DedupSpec plants a hot family to prove connectivity).
  q("dd_minhash_lsh_star", minhashStarOracleSql) { (s, d) =>
    Dedup.minhashCandidates(docs(s, d), minEstJaccard = 0.5,
        hotBucketStar = true)
      .select(col("doc_a"), col("doc_b"),
        round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** Recall/precision audit of the MinHash-LSH candidate pairs
    * against the EXACT 3-gram Jaccard ground truth at the same 0.5
    * threshold — the honest sketch-quality metric that belongs next
    * to dd_minhash_lsh's speed (the sim_ivf_recall posture, applied
    * to dedup): a banding/bucket-cap/signature regression moves
    * n_hit and fails the integer hash. One full-outer join of the two
    * bounded pair sets; counts and ppm ratios are exact integers.
    * The oracle re-derives BOTH sides (the complete HUGEINT minhash
    * chain — generated from the same `Dedup.minhashParams`, so the
    * two cannot drift — plus the exact posting-list intersection).
    */
  private val minhashRecallOracleSql: String = {
    val cut = minhashOracleSql.indexOf("SELECT CAST(doc_a AS BIGINT)")
    // guarded splice (r9 advisory): anchor drift must fail with a
    // pointed message, not a StringIndexOutOfBounds at class-init that
    // takes down the whole query registry
    require(cut >= 0, "minhashRecallOracleSql splice anchor " +
      "\"SELECT CAST(doc_a AS BIGINT)\" not found in minhashOracleSql — " +
      "the final SELECT was reworded; update the anchor here to match")
    val ctes = minhashOracleSql.substring(0, cut).trim
    s"""$ctes,
       |found AS (
       |  SELECT doc_a, doc_b FROM pairs
       |  WHERE len(list_filter(range(1, 33),
       |        i -> sa[CAST(i AS INT)] = sb[CAST(i AS INT)])) / 32.0 >= 0.5),
       |grams2 AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
       |           FROM toks,
       |           unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
       |cnt2 AS (SELECT doc_id, count(*) AS n_grams FROM grams2
       |         GROUP BY doc_id),
       |inter2 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |                  count(*) AS n_inter
       |           FROM grams2 a
       |           JOIN grams2 b ON a.g = b.g AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2),
       |truth AS (SELECT doc_a, doc_b
       |          FROM inter2 JOIN cnt2 ca ON ca.doc_id = doc_a
       |                      JOIN cnt2 cb ON cb.doc_id = doc_b
       |          WHERE round(n_inter / (ca.n_grams + cb.n_grams - n_inter),
       |                      4) >= 0.5),
       |hit AS (SELECT t.doc_a FROM truth t JOIN found f
       |        ON t.doc_a = f.doc_a AND t.doc_b = f.doc_b),
       |c AS (SELECT
       |  CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
       |  CAST((SELECT count(*) FROM found) AS BIGINT) AS n_cand,
       |  CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit)
       |SELECT n_truth, n_cand, n_hit,
       |  CAST(CASE WHEN n_truth = 0 THEN NULL
       |       ELSE n_hit * 1000000 // n_truth END AS BIGINT) AS recall_ppm,
       |  CAST(CASE WHEN n_cand = 0 THEN NULL
       |       ELSE n_hit * 1000000 // n_cand END AS BIGINT) AS precision_ppm
       |FROM c""".stripMargin
  }

  q("dd_minhash_recall", minhashRecallOracleSql) { (s, d) =>
    val dc = docs(s, d)
    val truth = Dedup.ngramJaccardPairs(dc, n = 3, minJaccard = 0.5)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("t"))
    val found = Dedup.minhashCandidates(dc, minEstJaccard = 0.5)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("f"))
    truth.join(found, Seq("doc_a", "doc_b"), "full_outer")
      .agg(sum(coalesce(col("t"), lit(0L))).as("n_truth"),
        sum(coalesce(col("f"), lit(0L))).as("n_cand"),
        sum(coalesce(col("t"), lit(0L)) * coalesce(col("f"), lit(0L)))
          .as("n_hit"))
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
        when(col("n_truth") === 0, lit(null).cast("long"))
          .otherwise(expr("n_hit * 1000000L div n_truth"))
          .as("recall_ppm"),
        when(col("n_cand") === 0, lit(null).cast("long"))
          .otherwise(expr("n_hit * 1000000L div n_cand"))
          .as("precision_ppm"))
  }

  /** The MinHash-LSH recall/precision audit on the deterministic
    * md5-threshold sample (r12 — the [[graft.pipeline.Sampling
    * .hashSample]] lever from `sim_dbscan_sampled_recall`, applied to
    * the DEDUP family's audit so the pattern is a standing tool, not a
    * one-off): both the exact 3-gram Jaccard truth and the LSH
    * candidate generation run on the SAME pct=50 sample, so the
    * truth side's pair stage prices a quarter of the pair volume and
    * the audit has an executable path at any scale (pct=50 rather
    * than the embeddings audits' 25 because duplicate FAMILIES are
    * rarer than loose-τ cosine neighbors — 25% keeps 0 of the sf0.01
    * corpus's 25 truth pairs, 50% keeps 9; pick pct per signal
    * density, the row reports the sampled counts so vacuity is
    * visible). Unbiased for pair recall AND precision: a pair enters
    * either side iff both endpoints survive the sample (uniform over
    * pairs), and its signatures/band keys/gram sets — the detection
    * indicators — are pure functions of the two docs. The oracle is
    * the UNSAMPLED twin's full HUGEINT chain with every corpus read
    * routed through the identical md5 filter (one textual
    * substitution point, so the twins cannot drift); sums coalesce to
    * 0 so an empty sample degrades to zeros, not NULLs.
    */
  q("dd_minhash_recall_sampled",
    minhashRecallOracleSql.replace("FROM documents",
      "FROM (SELECT * FROM documents WHERE CAST(('0x' || " +
        "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) " +
        "% 100 < 50)")) { (s, d) =>
    val dc = graft.pipeline.Sampling.hashSample(docs(s, d), "doc_id", 50)
    val truth = Dedup.ngramJaccardPairs(dc, n = 3, minJaccard = 0.5)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("t"))
    val found = Dedup.minhashCandidates(dc, minEstJaccard = 0.5)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("f"))
    truth.join(found, Seq("doc_a", "doc_b"), "full_outer")
      .agg(coalesce(sum(coalesce(col("t"), lit(0L))), lit(0L))
          .as("n_truth"),
        coalesce(sum(coalesce(col("f"), lit(0L))), lit(0L)).as("n_cand"),
        coalesce(sum(coalesce(col("t"), lit(0L)) *
          coalesce(col("f"), lit(0L))), lit(0L)).as("n_hit"))
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
        when(col("n_truth") === 0, lit(null).cast("long"))
          .otherwise(expr("n_hit * 1000000L div n_truth"))
          .as("recall_ppm"),
        when(col("n_cand") === 0, lit(null).cast("long"))
          .otherwise(expr("n_hit * 1000000L div n_cand"))
          .as("precision_ppm"))
  }

  /** Incremental NEAR-dup ingest oracle (r9): the full minhash
    * machinery (same HUGEINT folds and constants as
    * [[minhashOracleSql]] — generated from the same
    * `Dedup.minhashParams`, so the two cannot drift), then the
    * steady-state split: corpus = doc_id%10 < 8 contributes band keys
    * from its STANDING signatures, the incoming slice joins them with
    * per-side bucket caps, and each incoming doc resolves to
    * near_dup_corpus (precedence) / near_dup_batch (smaller-id
    * keeper) / new with its best match by (est desc, id asc).
    */
  private val incNearDupOracleSql: String = {
    val M = "CAST('18446744073709551616' AS HUGEINT)"
    val H = "CAST('9223372036854775808' AS HUGEINT)"
    val P = "CAST('1099511628211' AS HUGEINT)"
    val B = "CAST('14695981039346656037' AS HUGEINT)"
    val ps = Dedup.minhashParams(32, 42L)
    val aL = ps.map(p => s"CAST('${p._1}' AS HUGEINT)")
      .mkString("[", ", ", "]")
    val bL = ps.map(p => s"CAST('${p._2}' AS HUGEINT)")
      .mkString("[", ", ", "]")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |sh AS (
       |  SELECT doc_id, array_to_string(l[i:i+2], ' ') AS s
       |  FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
       |shh AS (
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend($B,
       |        list_transform(range(1, length(s) + 1),
       |          i -> CAST(ord(substr(s, CAST(i AS INT), 1)) AS HUGEINT))),
       |      (acc, ch) -> ((acc - (acc % 256) +
       |          CAST(xor(CAST(acc % 256 AS BIGINT), CAST(ch AS BIGINT)) AS HUGEINT))
       |          * $P) % $M) AS x
       |  FROM sh),
       |uh AS (
       |  SELECT doc_id, f,
       |         ((((${aL}[f + 1] * (x // 4294967296)) % 4294967296) * 4294967296
       |            + ${aL}[f + 1] * (x % 4294967296))
       |           + ${bL}[f + 1]) % $M AS u
       |  FROM shh, unnest(generate_series(0, 31)) AS g(f)),
       |sig AS (
       |  SELECT doc_id, f,
       |         min(CAST(CASE WHEN u >= $H THEN u - $M ELSE u END AS BIGINT)) AS mh
       |  FROM uh GROUP BY doc_id, f),
       |sigl AS (SELECT doc_id, list(mh ORDER BY f) AS sig FROM sig GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, band,
       |    list_reduce(
       |      list_prepend($B,
       |        list_transform(sig[band * 4 + 1 : band * 4 + 4],
       |          s -> (CASE WHEN s < 0 THEN CAST(s AS HUGEINT) + $M
       |                ELSE CAST(s AS HUGEINT) END))),
       |      (acc, v) -> (((
       |          CAST(xor(CAST(acc // 4294967296 AS BIGINT), CAST(v // 4294967296 AS BIGINT)) AS HUGEINT) * 4294967296
       |          + CAST(xor(CAST(acc % 4294967296 AS BIGINT), CAST(v % 4294967296 AS BIGINT)) AS HUGEINT))
       |        * $P) % $M)) AS bucket
       |  FROM sigl, unnest(generate_series(0, 7)) AS g(band)),
       |cband AS (SELECT * FROM banded WHERE doc_id % 10 < 8),
       |iband AS (SELECT * FROM banded WHERE doc_id % 10 >= 8),
       |okc AS (SELECT band, bucket FROM cband GROUP BY 1, 2
       |        HAVING count(*) <= 64),
       |oki AS (SELECT band, bucket FROM iband GROUP BY 1, 2
       |        HAVING count(*) <= 64),
       |candc AS (
       |  SELECT DISTINCT i.doc_id, c.doc_id AS match_id
       |  FROM iband i
       |  JOIN oki ON oki.band = i.band AND oki.bucket = i.bucket
       |  JOIN okc ON okc.band = i.band AND okc.bucket = i.bucket
       |  JOIN cband c ON c.band = i.band AND c.bucket = i.bucket),
       |candb AS (
       |  SELECT DISTINCT a.doc_id, b.doc_id AS match_id
       |  FROM iband a
       |  JOIN oki ON oki.band = a.band AND oki.bucket = a.bucket
       |  JOIN iband b ON b.band = a.band AND b.bucket = a.bucket
       |   AND a.doc_id > b.doc_id),
       |estc AS (
       |  SELECT cc.doc_id, cc.match_id,
       |         len(list_filter(range(1, 33),
       |           f -> si.sig[CAST(f AS INT)] = sm.sig[CAST(f AS INT)]))
       |           / 32.0 AS est
       |  FROM candc cc
       |  JOIN sigl si ON si.doc_id = cc.doc_id
       |  JOIN sigl sm ON sm.doc_id = cc.match_id),
       |estb AS (
       |  SELECT cc.doc_id, cc.match_id,
       |         len(list_filter(range(1, 33),
       |           f -> si.sig[CAST(f AS INT)] = sm.sig[CAST(f AS INT)]))
       |           / 32.0 AS est
       |  FROM candb cc
       |  JOIN sigl si ON si.doc_id = cc.doc_id
       |  JOIN sigl sm ON sm.doc_id = cc.match_id),
       |bestc AS (
       |  SELECT doc_id, match_id, est FROM (
       |    SELECT doc_id, match_id, est,
       |           row_number() OVER (PARTITION BY doc_id
       |                              ORDER BY est DESC, match_id) AS rn
       |    FROM estc WHERE est >= 0.5) WHERE rn = 1),
       |bestb AS (
       |  SELECT doc_id, match_id, est FROM (
       |    SELECT doc_id, match_id, est,
       |           row_number() OVER (PARTITION BY doc_id
       |                              ORDER BY est DESC, match_id) AS rn
       |    FROM estb WHERE est >= 0.5) WHERE rn = 1)
       |SELECT CAST(i.doc_id AS BIGINT) AS doc_id,
       |       CASE WHEN bc.doc_id IS NOT NULL THEN 'near_dup_corpus'
       |            WHEN bb.doc_id IS NOT NULL THEN 'near_dup_batch'
       |            ELSE 'new' END AS status,
       |       CAST(coalesce(bc.match_id, bb.match_id) AS BIGINT) AS match_id,
       |       round(coalesce(bc.est, bb.est), 4) AS est_jaccard
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 >= 8) i
       |LEFT JOIN bestc bc ON bc.doc_id = i.doc_id
       |LEFT JOIN bestb bb ON bb.doc_id = i.doc_id""".stripMargin
  }

  q("dd_incremental_neardup", incNearDupOracleSql) { (s, d) =>
    val all = docs(s, d)
    Dedup.incrementalNearDup(
      Dedup.signatures(all.filter(col("doc_id") % 10 < 8)),
      all.filter(col("doc_id") % 10 >= 8))
  }

  /** Duplicate-cluster SIZE distribution (r9): the histogram behind
    * every dedup dashboard — how many exact-dup clusters of each size
    * exist, and how many docs they absorb. Two digest-keyed
    * aggregations (16-byte md5 keys, text never shuffles); output is
    * ≤ max-cluster-size rows.
    */
  q("dd_cluster_sizes",
    """WITH c AS (SELECT text, CAST(count(*) AS BIGINT) AS n_copies
      |           FROM documents GROUP BY text)
      |SELECT n_copies AS cluster_size,
      |       CAST(count(*) AS BIGINT) AS n_clusters,
      |       CAST(count(*) * (n_copies - 1) AS BIGINT) AS n_removable
      |FROM c GROUP BY n_copies""") { (s, d) =>
    docs(s, d)
      .groupBy(md5(col("text").cast("binary")).as("th"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("n_clusters") * (col("cluster_size") - 1)).as("n_removable"))
  }

  // SimHash candidates fully reproduced in SQL: per-token FNV-1a with
  // mod-2^64 HUGEINT folds (XOR only touches the low byte for ASCII, so
  // it runs on BIGINT), 64 bit-position votes, 16-bit banding from the
  // unsigned form, bucket caps, and popcount Hamming verification —
  // every stage of the JVM pipeline independently confirmed.
  q("dd_simhash",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |th AS (
      |  SELECT doc_id,
      |    list_reduce(
      |      list_prepend(CAST('14695981039346656037' AS HUGEINT),
      |        list_transform(range(1, length(t) + 1),
      |          i -> CAST(ord(substr(t, CAST(i AS INT), 1)) AS HUGEINT))),
      |      (a, ch) -> ((a - (a % 256) +
      |          CAST(xor(CAST(a % 256 AS BIGINT), CAST(ch AS BIGINT)) AS HUGEINT))
      |          * CAST('1099511628211' AS HUGEINT))
      |          % CAST('18446744073709551616' AS HUGEINT)) AS h
      |  FROM tok),
      |bits AS (
      |  SELECT doc_id, b,
      |         sum(CASE WHEN (h // (CAST(1 AS HUGEINT) << CAST(b AS INT))) % 2 = 1
      |                  THEN 1 ELSE -1 END) AS vote
      |  FROM th, unnest(generate_series(0, 63)) AS g(b)
      |  GROUP BY doc_id, b),
      |sh AS (
      |  SELECT doc_id,
      |         sum(CASE WHEN vote > 0
      |                  THEN CAST(1 AS HUGEINT) << CAST(b AS INT)
      |                  ELSE CAST(0 AS HUGEINT) END) AS u
      |  FROM bits GROUP BY doc_id),
      |sh2 AS (
      |  SELECT doc_id, u,
      |         CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
      |                   THEN u - CAST('18446744073709551616' AS HUGEINT)
      |                   ELSE u END AS BIGINT) AS simhash
      |  FROM sh),
      |banded AS (
      |  SELECT doc_id, simhash, b AS band,
      |         CAST((u // (CAST(1 AS HUGEINT) << CAST(b * 16 AS INT))) % 65536 AS BIGINT) AS bucket
      |  FROM sh2, unnest(generate_series(0, 3)) AS g(b)),
      |ok_buckets AS (
      |  SELECT band, bucket FROM banded GROUP BY band, bucket
      |  HAVING count(*) BETWEEN 2 AND 64),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
      |                  a.simhash AS sa, b2.simhash AS sb
      |  FROM banded a
      |  JOIN banded b2 ON a.band = b2.band AND a.bucket = b2.bucket
      |                AND a.doc_id < b2.doc_id
      |  JOIN ok_buckets ob ON ob.band = a.band AND ob.bucket = a.bucket)
      |SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
      |       CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
      |FROM pairs WHERE bit_count(xor(sa, sb)) <= 8""") { (s, d) =>
    Dedup.simhashCandidates(docs(s, d), maxHamming = 8)
  }

  q("dd_ngram_jaccard",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |grams AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
      |          FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
      |cnt AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
      |       round(n_inter / (ca.n_grams + cb.n_grams - n_inter), 4) AS jaccard
      |FROM inter
      |JOIN cnt ca ON ca.doc_id = doc_a
      |JOIN cnt cb ON cb.doc_id = doc_b
      |WHERE round(n_inter / (ca.n_grams + cb.n_grams - n_inter), 4) >= 0.8""") { (s, d) =>
    Dedup.ngramJaccardPairs(docs(s, d), n = 3, minJaccard = 0.8)
  }

  // Threshold-sensitivity curve for the Jaccard dedup threshold:
  // exact-decile histogram + top-down cumulative over pairs with
  // J >= 0.5 — see Dedup.jaccardThresholdCurve. Integer buckets
  // ((n_inter*10) div union), no float knife-edge.
  q("dd_threshold_curve",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |grams AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
      |          FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
      |cnt AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |sel AS (SELECT n_inter,
      |               ca.n_grams + cb.n_grams - n_inter AS un
      |        FROM inter
      |        JOIN cnt ca ON ca.doc_id = doc_a
      |        JOIN cnt cb ON cb.doc_id = doc_b
      |        WHERE n_inter * 2 >= ca.n_grams + cb.n_grams - n_inter),
      |h AS (SELECT CAST((n_inter * 10) // un AS BIGINT) AS bucket,
      |             CAST(count(*) AS BIGINT) AS n_pairs
      |      FROM sel GROUP BY 1)
      |SELECT bucket, n_pairs,
      |       CAST(sum(n_pairs) OVER (ORDER BY bucket DESC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |            AS BIGINT) AS cum_pairs
      |FROM h""") { (s, d) =>
    Dedup.jaccardThresholdCurve(docs(s, d), n = 3, minJaccard = 0.5)
  }

  // Capped threshold-curve twin: the production df knob for the
  // low-threshold AllPairs prefix join (56x cost at 10x data
  // uncapped — the prefix at t=0.5 is half of every doc, so common
  // shingles pay Σ prefix-df² in the self-join). The oracle is the
  // same uncapped-exact SQL: the entry asserts the bounded-recall
  // trade loses NO pair at test scale, while the bench rows time
  // capped vs uncapped at sf0.1/sf1 — the containment_capped pattern.
  // DATA-DEPENDENT assumption (r9 advisory): capped ≡ uncapped only
  // while no prefix gram's df exceeds 16 at verify scale — true of
  // the committed testdata and PINNED by PipelineOpsSpec via
  // Dedup.maxPrefixDocFreq on sf0.001/sf0.01, so a testdata regen
  // with hotter grams fails there with a pointed message (re-tune the
  // cap or accept the documented recall trade), not as an opaque
  // oracle-hash red here.
  q("dd_threshold_curve_capped",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |grams AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
      |          FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
      |cnt AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |sel AS (SELECT n_inter,
      |               ca.n_grams + cb.n_grams - n_inter AS un
      |        FROM inter
      |        JOIN cnt ca ON ca.doc_id = doc_a
      |        JOIN cnt cb ON cb.doc_id = doc_b
      |        WHERE n_inter * 2 >= ca.n_grams + cb.n_grams - n_inter),
      |h AS (SELECT CAST((n_inter * 10) // un AS BIGINT) AS bucket,
      |             CAST(count(*) AS BIGINT) AS n_pairs
      |      FROM sel GROUP BY 1)
      |SELECT bucket, n_pairs,
      |       CAST(sum(n_pairs) OVER (ORDER BY bucket DESC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |            AS BIGINT) AS cum_pairs
      |FROM h""") { (s, d) =>
    Dedup.jaccardThresholdCurve(docs(s, d), n = 3, minJaccard = 0.5,
      maxDocFreq = Some(16))
  }

  // MinHash-LSH (bands, rows) parameter planner — see Dedup.lshPlan:
  // every r·b = 128 split of the signature budget, the banding S-curve
  // P(s) = 1-(1-s^r)^b integrated against the MEASURED pair-similarity
  // histogram (percent buckets over the exact AllPairs set at
  // J >= 0.3), expected false-candidate and missed-pair masses around
  // the t = 0.5 target in µ-pairs, chosen = argmin(fp+fn). The S-curve
  // is fixed-point (denominator 1e12, square-and-floor powers) so the
  // oracle replays the identical integer recurrence — no pow(), no
  // doubles anywhere.
  private val lshPlanSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |grams AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
      |          FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
      |cnt AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |sel AS (SELECT n_inter,
      |               ca.n_grams + cb.n_grams - n_inter AS un
      |        FROM inter
      |        JOIN cnt ca ON ca.doc_id = doc_a
      |        JOIN cnt cb ON cb.doc_id = doc_b
      |        WHERE n_inter * 10 >= (ca.n_grams + cb.n_grams - n_inter) * 3),
      |h AS (SELECT CAST((n_inter * 100) // un AS BIGINT) AS s_pct,
      |             CAST(count(*) AS BIGINT) AS n_pairs
      |      FROM sel GROUP BY 1),
      |cfg AS (SELECT CAST(unnest([1, 2, 4, 8, 16, 32]) AS INT) AS r),
      |cfg2 AS (SELECT r, CAST(128 // r AS INT) AS b FROM cfg),
      |g0 AS (SELECT h.*, cfg2.*, s_pct * 10000000000 AS p1
      |       FROM h CROSS JOIN cfg2),
      |g1 AS (SELECT *, (p1::HUGEINT * p1) // 1000000000000 AS p2 FROM g0),
      |g2 AS (SELECT *, (p2::HUGEINT * p2) // 1000000000000 AS p4 FROM g1),
      |g3 AS (SELECT *, (p4::HUGEINT * p4) // 1000000000000 AS p8 FROM g2),
      |g4 AS (SELECT *, (p8::HUGEINT * p8) // 1000000000000 AS p16 FROM g3),
      |g5 AS (SELECT *, (p16::HUGEINT * p16) // 1000000000000 AS p32 FROM g4),
      |ga AS (SELECT *, 1000000000000 - (CASE r WHEN 1 THEN p1
      |         WHEN 2 THEN p2 WHEN 4 THEN p4 WHEN 8 THEN p8
      |         WHEN 16 THEN p16 ELSE p32 END) AS q1 FROM g5),
      |gb AS (SELECT *, (q1::HUGEINT * q1) // 1000000000000 AS q2 FROM ga),
      |gc AS (SELECT *, (q2::HUGEINT * q2) // 1000000000000 AS q4 FROM gb),
      |gd AS (SELECT *, (q4::HUGEINT * q4) // 1000000000000 AS q8 FROM gc),
      |ge AS (SELECT *, (q8::HUGEINT * q8) // 1000000000000 AS q16 FROM gd),
      |gf AS (SELECT *, (q16::HUGEINT * q16) // 1000000000000 AS q32 FROM ge),
      |gg AS (SELECT *, (q32::HUGEINT * q32) // 1000000000000 AS q64 FROM gf),
      |gh AS (SELECT *, (q64::HUGEINT * q64) // 1000000000000 AS q128 FROM gg),
      |gp AS (SELECT *, 1000000000000 - (CASE b WHEN 4 THEN q4
      |         WHEN 8 THEN q8 WHEN 16 THEN q16 WHEN 32 THEN q32
      |         WHEN 64 THEN q64 ELSE q128 END) AS pc FROM gh),
      |a AS (SELECT r, b, CAST(sum(n_pairs) AS BIGINT) AS n_pairs_obs,
      |        CAST(sum(CASE WHEN s_pct < 50
      |               THEN n_pairs::HUGEINT * pc ELSE 0 END) // 1000000
      |          AS BIGINT) AS fp_lo_upairs,
      |        CAST(sum(CASE WHEN s_pct >= 50
      |               THEN n_pairs::HUGEINT * (1000000000000 - pc)
      |               ELSE 0 END) // 1000000 AS BIGINT) AS fn_hi_upairs,
      |        CAST(sum(CASE WHEN s_pct >= 50
      |               THEN n_pairs::HUGEINT * pc ELSE 0 END) // 1000000
      |          AS BIGINT) AS caught_hi_upairs
      |      FROM gp GROUP BY 1, 2)
      |SELECT r, b, n_pairs_obs, fp_lo_upairs, fn_hi_upairs,
      |       caught_hi_upairs,
      |       CAST(fp_lo_upairs + fn_hi_upairs AS BIGINT) AS err_upairs,
      |       CAST(CASE WHEN fp_lo_upairs + fn_hi_upairs =
      |              min(fp_lo_upairs + fn_hi_upairs) OVER ()
      |            THEN 1 ELSE 0 END AS INT) AS chosen
      |FROM a""".stripMargin

  q("dd_lsh_plan", lshPlanSql) { (s, d) =>
    Dedup.lshPlan(docs(s, d), n = 3, minJaccard = 0.3)
  }

  // Capped planner twin — the production df knob for the t=0.3 prefix
  // join (the planner's floor threshold makes the prefix 70% of every
  // doc's grams, so the uncapped pair stage measured 112 s isolated at
  // sf1 — the dd_threshold_curve quadratic trap at a lower threshold).
  // The oracle is the SAME uncapped-exact SQL (one val, cannot
  // diverge): the entry asserts the cap loses NO pair at verify scale
  // — PINNED by the PipelineOpsSpec testdata-assumption test at
  // t=0.3 — while the bench rows time capped vs uncapped. At corpus
  // scale the capped form runs on a hash-sample besides — the planner
  // is a design-time readout.
  q("dd_lsh_plan_capped", lshPlanSql) { (s, d) =>
    Dedup.lshPlan(docs(s, d), n = 3, minJaccard = 0.3,
      maxDocFreq = Some(16))
  }

  // Per-source dedup impact report: docs/tokens that exact dedup would
  // remove, ppm rate — the post-dedup curation dashboard. Keeper is
  // global min doc_id per text, so cross-source dups charge the
  // non-keeper source. Digest keys only; report is sources-sized.
  q("dd_impact_report",
    """WITH h AS (SELECT doc_id, source, text,
      |                  len(string_split(text, ' ')) AS ntok
      |           FROM documents),
      |k AS (SELECT text, min(doc_id) AS keeper FROM h GROUP BY text)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_removed,
      |  CAST(sum(ntok) AS BIGINT) AS tokens_total,
      |  CAST(sum(CASE WHEN doc_id <> keeper THEN ntok ELSE 0 END) AS BIGINT)
      |    AS tokens_removed,
      |  CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) * 1000000
      |    // count(*) AS BIGINT) AS removed_ppm
      |FROM h JOIN k USING (text)
      |GROUP BY source""") { (s, d) =>
    Dedup.dedupImpactReport(docs(s, d))
  }

  // Asymmetric n-gram containment (|sub ∩ super| / |sub| ≥ 0.9): the
  // quote-inclusion / partial-plagiarism relation symmetric Jaccard
  // misses. Sub-side prefix filter only (no length-ratio cap — the
  // super side legitimately dwarfs the sub); exact verification.
  q("dd_ngram_containment",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |grams AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
      |          FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
      |cnt AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_sub, b.doc_id AS doc_super,
      |                 count(*) AS n_inter
      |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id <> b.doc_id
      |          GROUP BY 1, 2)
      |SELECT CAST(doc_sub AS BIGINT) AS doc_sub,
      |       CAST(doc_super AS BIGINT) AS doc_super,
      |       round(n_inter / c.n_grams, 4) AS containment
      |FROM inter JOIN cnt c ON c.doc_id = doc_sub
      |WHERE round(n_inter / c.n_grams, 4) >= 0.9""") { (s, d) =>
    Dedup.ngramContainmentPairs(docs(s, d), n = 3, minContainment = 0.9)
  }

  // Capped containment twin: the production doc-frequency knob
  // (maxDocFreq=4 — AGGRESSIVE at this corpus size, where gram df tops
  // out at 7, so the filter genuinely drops ~1% of distinct grams from
  // candidate generation). The oracle is the same uncapped-exact SQL:
  // the entry asserts the bounded-recall trade loses NO true pair here
  // (a true pair is only lost when its entire sub-side prefix is hot —
  // near-clones always share rarer shingles too), while the bench rows
  // time capped vs uncapped side by side at sf0.1/sf1 — the
  // skew_join_naive/salted pattern.
  q("dd_ngram_containment_capped",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |grams AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
      |          FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
      |cnt AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_sub, b.doc_id AS doc_super,
      |                 count(*) AS n_inter
      |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id <> b.doc_id
      |          GROUP BY 1, 2)
      |SELECT CAST(doc_sub AS BIGINT) AS doc_sub,
      |       CAST(doc_super AS BIGINT) AS doc_super,
      |       round(n_inter / c.n_grams, 4) AS containment
      |FROM inter JOIN cnt c ON c.doc_id = doc_sub
      |WHERE round(n_inter / c.n_grams, 4) >= 0.9""") { (s, d) =>
    Dedup.ngramContainmentPairs(docs(s, d), n = 3, minContainment = 0.9,
      maxDocFreq = Some(4))
  }

  /** Duplicate-cluster resolution: the verified n-gram pairs (the
    * dd_ngram_jaccard CTE chain) fed through connected components, so
    * transitive chains (A~B, B~C) collapse to one canonical keeper even
    * when A~C was never emitted. The Spark side runs min-label
    * propagation with pointer jumping (O(log diameter) rounds); the
    * oracle replays the closure as a recursive CTE — min reachable id
    * per vertex, singletons included via the base case.
    */
  private val clusterCtes: String =
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

  private val clusterOracleSql: String =
    s"""WITH RECURSIVE
      |$clusterCtes
      |SELECT CAST(v AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id,
      |       CAST(CASE WHEN min(r) = v THEN 1 ELSE 0 END AS INT) AS is_keep
      |FROM reach GROUP BY v"""

  q("dd_cluster_components", clusterOracleSql) { (s, d) =>
    val dd = docs(s, d)
    Dedup.clusterDedup(dd, Dedup.ngramJaccardPairs(dd, n = 3, minJaccard = 0.8))
  }

  /** Leakage-free train/test split (r10): hash-split on the DUPLICATE
    * CLUSTER id instead of the doc id, so near-duplicate documents can
    * never straddle the boundary — the structural fix for what
    * `t_split_leakage` measures (a per-doc split puts one copy of a
    * near-dup pair in train and its twin in test; the model then
    * memorizes the "held-out" answer). Split membership stays a pure
    * function of content (md5 of the min-reachable cluster id), so it
    * is reproducible across engines, runs and cluster layouts like
    * every split here. Output is per-split totals plus
    * `n_straddling_clusters` — 0 BY CONSTRUCTION, a regression trap:
    * any change that splits below cluster granularity flips it. The
    * oracle re-derives the clusters as the exact recursive closure and
    * replays the md5 bucket arithmetic.
    */
  q("t_cluster_split",
    s"""WITH RECURSIVE
      |$clusterCtes,
      |clab AS (SELECT v AS doc_id, min(r) AS cluster_id
      |         FROM reach GROUP BY v),
      |sp AS (SELECT c.doc_id, c.cluster_id,
      |         CASE WHEN CAST(('0x' ||
      |             substr(md5(CAST(c.cluster_id AS VARCHAR)), 1, 8))
      |             AS UBIGINT) % 100 < 80 THEN 'train' ELSE 'test' END
      |           AS split,
      |         len(string_split(d.text, ' ')) AS ntok
      |       FROM clab c JOIN documents d ON d.doc_id = c.doc_id),
      |strad AS (SELECT CAST(count(*) AS BIGINT) AS n_straddling_clusters
      |          FROM (SELECT cluster_id FROM sp
      |                GROUP BY 1 HAVING count(DISTINCT split) > 1))
      |SELECT sp.split, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(count(DISTINCT sp.cluster_id) AS BIGINT) AS n_clusters,
      |       CAST(sum(sp.ntok) AS BIGINT) AS n_tokens,
      |       s.n_straddling_clusters
      |FROM sp, strad s
      |GROUP BY sp.split, s.n_straddling_clusters""".stripMargin) { (s, d) =>
    val dd = docs(s, d)
    val clusters = Dedup.clusterDedup(dd,
        Dedup.ngramJaccardPairs(dd, n = 3, minJaccard = 0.8))
      .select(col("doc_id"), col("cluster_id"))
    val sp = clusters
      .withColumn("split",
        when(Sampling.hashBucket("cluster_id") < 80, "train")
          .otherwise("test"))
      .join(dd.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ntok")), Seq("doc_id"))
    val strad = sp.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1)
      .agg(count(lit(1)).as("n_straddling_clusters"))
    sp.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"),
        sum(col("ntok")).as("n_tokens"))
      .crossJoin(broadcast(strad))
  }

  /** Quality-aware keeper policy over the same duplicate clusters:
    * keeper = highest quality_score in the cluster (ties to the lower
    * id) instead of the min-id rule — the same CTE chain as
    * dd_cluster_components plus the t_quality score and one
    * cluster-keyed rank window on both engines.
    */
  private val keeperQualityOracleSql: String =
    s"""WITH RECURSIVE
      |$clusterCtes,
      |comp AS (SELECT v AS doc_id, min(r) AS cluster_id
      |         FROM reach GROUP BY v),
      |q AS (
      |  SELECT doc_id,
      |         round(least(len(list_filter(string_split(text, ' '), x -> x IN
      |           ('the','a','an','of','and','or','to','in','is','it',
      |            'for','on','with','as','at','by'))) /
      |           len(string_split(text, ' ')) * 2.5, 1.0) * 0.5 +
      |           least((length(text) - (len(string_split(text, ' ')) - 1)) /
      |           len(string_split(text, ' ')) / 8.0, 1.0) * 0.5, 4)
      |           AS quality_score
      |  FROM documents),
      |r AS (
      |  SELECT c.doc_id, c.cluster_id, q.quality_score,
      |         row_number() OVER (PARTITION BY c.cluster_id
      |                            ORDER BY q.quality_score DESC, c.doc_id)
      |           AS rn
      |  FROM comp c JOIN q ON q.doc_id = c.doc_id)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(cluster_id AS BIGINT) AS cluster_id, quality_score,
      |       CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INT) AS is_keep
      |FROM r"""

  q("dd_keeper_quality", keeperQualityOracleSql) { (s, d) =>
    val dd = docs(s, d)
    Dedup.keeperByQuality(
      Dedup.clusterDedup(dd, Dedup.ngramJaccardPairs(dd, n = 3,
        minJaccard = 0.8)),
      TextAnalysis.qualityProjection(dd))
  }

  /** Cross-source contamination matrix — see
    * [[graft.dedup.Dedup.sourceOverlap]]. The oracle groups on the
    * raw n-gram STRING where Spark shuffles its xxhash64 (the
    * dd_ngram_jaccard convention: identical distinct-counts barring
    * 2⁻⁶⁴ collisions); trigram construction replays the same
    * clamped-slice rule (`l[i:i+2]`, i ≤ max(len−2, 1)) as the Scala
    * transform. On the committed testdata the planted near-dup
    * clusters surface as the high-overlap pairs (e.g. sources sharing
    * a duplicated doc run 2-3× the ~5% background trigram overlap).
    */
  q("dd_source_overlap",
    """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS l
      |             FROM documents),
      |grams AS (
      |  SELECT DISTINCT source,
      |    array_to_string(l[CAST(i AS BIGINT):CAST(i + 2 AS BIGINT)],
      |                    ' ') AS g
      |  FROM toks,
      |       unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
      |per_src AS (SELECT source, count(*) AS n_grams FROM grams
      |            GROUP BY 1),
      |shared AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |         count(*) AS n_shared
      |  FROM grams a JOIN grams b
      |    ON a.g = b.g AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT s.source_a, s.source_b,
      |       CAST(s.n_shared AS BIGINT) AS n_shared,
      |       CAST(pa.n_grams AS BIGINT) AS n_a,
      |       CAST(pb.n_grams AS BIGINT) AS n_b,
      |       CAST(s.n_shared * 1000000 // least(pa.n_grams, pb.n_grams)
      |            AS BIGINT) AS overlap_ppm
      |FROM shared s JOIN per_src pa ON pa.source = s.source_a
      |              JOIN per_src pb ON pb.source = s.source_b""") {
    (s, d) => Dedup.sourceOverlap(docs(s, d), n = 3)
  }

  /** Intra-doc repeated-window cleanup (k=4): a gram is dup when the
    * identical gram started earlier in the same doc; covered tokens
    * drop, first occurrences survive, text reassembles in order. Same
    * relational chain on both engines — min-over-(doc,gram) window,
    * covered-position expansion, anti join, ordered string_agg.
    */
  q("dd_intradoc_clean",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l
      |             FROM documents),
      |tok AS (SELECT doc_id, i AS pos, l[i] AS w
      |        FROM toks, unnest(generate_series(1, len(l))) AS t(i)),
      |grams AS (SELECT doc_id, i AS p, array_to_string(l[i:i+3], ' ') AS g
      |          FROM toks,
      |               unnest(generate_series(1, greatest(len(l) - 3, 0)))
      |                 AS t(i)),
      |dups AS (SELECT doc_id, p FROM (
      |           SELECT doc_id, p,
      |                  min(p) OVER (PARTITION BY doc_id, g) AS fp
      |           FROM grams) s WHERE p > fp),
      |cov AS (SELECT DISTINCT doc_id, p + o AS pos
      |        FROM dups, unnest(generate_series(0, 3)) AS t(o)),
      |kept AS (SELECT t.doc_id, t.pos, t.w
      |         FROM tok t LEFT JOIN cov c
      |           ON c.doc_id = t.doc_id AND c.pos = t.pos
      |         WHERE c.doc_id IS NULL),
      |re AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |              string_agg(w, ' ' ORDER BY pos) AS text_clean
      |       FROM kept GROUP BY doc_id)
      |SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
      |       CAST(len(b.l) AS INT) AS n_tokens,
      |       CAST(len(b.l) - r.n_kept AS BIGINT) AS n_dropped,
      |       r.text_clean
      |FROM toks b JOIN re r ON r.doc_id = b.doc_id""") { (s, d) =>
    Dedup.intraDocClean(docs(s, d), k = 4)
  }

  /** Corpus n-gram novelty (dataset-freshness scoring): the share of a
    * document's distinct 3-grams whose FIRST corpus occurrence (by
    * doc_id) is this document — near-zero novelty marks near-copies of
    * earlier material even when no single span crosses the span-dedup
    * bar. Two gram-keyed exchanges (min-doc first-occurrence, then the
    * membership join), both map-side combinable; per-doc distinct
    * grams bound the explode; ppm integers keep float out of the hash.
    */
  q("dd_novelty",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l
      |             FROM documents),
      |g AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS gram
      |      FROM toks,
      |           unnest(generate_series(1, greatest(len(l) - 2, 0)))
      |             AS t(i)),
      |fo AS (SELECT gram, min(doc_id) AS fd FROM g GROUP BY gram)
      |SELECT CAST(g.doc_id AS BIGINT) AS doc_id,
      |       CAST(count(*) AS BIGINT) AS n_grams,
      |       CAST(sum(CASE WHEN fd = g.doc_id THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_novel,
      |       CAST(sum(CASE WHEN fd = g.doc_id THEN 1 ELSE 0 END)
      |            * 1000000 // count(*) AS BIGINT) AS novelty_ppm
      |FROM g JOIN fo USING (gram)
      |GROUP BY g.doc_id""") { (s, d) =>
    val g = docs(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("w")) - 2),
          i => concat_ws(" ", slice(col("w"), i, lit(3)))))).as("gram"))
    val fo = g.groupBy("gram").agg(min("doc_id").as("fd"))
    g.join(fo, Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        expr("n_novel * 1000000 div n_grams").as("novelty_ppm"))
  }

  /** Corpus-slice overlap via KMV bottom-k sketches, fully reproduced
    * in DuckDB: the same FNV-1a shingle fold the MinHash oracle uses
    * (HUGEINT mod-2^64 arithmetic), unsigned→signed conversion so the
    * bottom-k ranking agrees with the JVM's signed-long ordering, per
    * source the k smallest DISTINCT hashes, then the Beyer et al.
    * estimator on each pair via O(k) list algebra. All outputs are exact
    * integers — nothing in the estimate depends on float formatting.
    */
  private val kmvOracleSql: String = {
    val M = "CAST('18446744073709551616' AS HUGEINT)"
    val H = "CAST('9223372036854775808' AS HUGEINT)"
    val k = 128
    s"""WITH toks AS (
       |  SELECT source, string_split(text, ' ') AS l FROM documents),
       |sh AS (
       |  SELECT source, array_to_string(l[i:i+2], ' ') AS s
       |  FROM toks,
       |       unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
       |shh AS (
       |  SELECT DISTINCT source,
       |    list_reduce(
       |      list_prepend(CAST('14695981039346656037' AS HUGEINT),
       |        list_transform(range(1, length(s) + 1),
       |          i -> CAST(ord(substr(s, CAST(i AS INT), 1)) AS HUGEINT))),
       |      (acc, ch) -> ((acc - (acc % 256) +
       |          CAST(xor(CAST(acc % 256 AS BIGINT), CAST(ch AS BIGINT))
       |               AS HUGEINT))
       |          * CAST('1099511628211' AS HUGEINT)) % $M) AS x
       |  FROM sh),
       |sg AS (
       |  SELECT source,
       |         CAST(CASE WHEN x >= $H THEN x - $M ELSE x END AS BIGINT) AS h
       |  FROM shh),
       |rk AS (
       |  SELECT source, h,
       |         row_number() OVER (PARTITION BY source ORDER BY h) AS r
       |  FROM sg),
       |sk AS (
       |  SELECT source, list(h ORDER BY h) AS kmv
       |  FROM rk WHERE r <= $k GROUP BY source),
       |pairs AS (
       |  SELECT a.source AS slice_a, b.source AS slice_b,
       |         list_sort(list_distinct(a.kmv || b.kmv))[1:$k] AS ku,
       |         a.kmv AS ka, b.kmv AS kb
       |  FROM sk a JOIN sk b ON a.source < b.source),
       |est AS (
       |  SELECT slice_a, slice_b, CAST(len(ku) AS INT) AS k_used,
       |         CAST(len(list_intersect(list_intersect(ku, ka), kb))
       |              AS BIGINT) AS n_common
       |  FROM pairs)
       |SELECT slice_a, slice_b, k_used, n_common,
       |       CAST(n_common * 1000000 // k_used AS BIGINT) AS jaccard_ppm
       |FROM est""".stripMargin
  }

  q("dd_kmv_overlap", kmvOracleSql) { (s, d) =>
    Dedup.kmvOverlap(docs(s, d), sliceCol = "source", k = 128)
  }

  q("dd_cosine_neardup",
    """SELECT CAST(a.vec_id AS BIGINT) AS vec_a,
      |       CAST(b.vec_id AS BIGINT) AS vec_b,
      |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |             CAST(b.embedding AS DOUBLE[])), 6) AS cosine
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |      CAST(b.embedding AS DOUBLE[])), 6) >= 0.4""") { (s, d) =>
    Dedup.cosineNearDup(embs(s, d), minCosine = 0.4)
  }

  /** SemDeDup reproduced in DuckDB: cell assignment re-derived exactly
    * as the sim_ivf_topk oracle does (hash-sampled centers, sequential
    * squared-L2 fold, ties to the smaller cell), then the single-pass
    * keep rule — drop any vector with a smaller-id within-cell
    * neighbor at raw cosine ≥ τ. The threshold compares UNROUNDED
    * cosines: the sequential fold is bit-equal cross-engine, so the
    * boundary cannot move on one side only.
    */
  private val semDedupOracleSql: String = {
    val (nlist, dims, tau) = (16, 64, 0.4)
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |            FROM embeddings),
       |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
       |         FROM emb ORDER BY h LIMIT $nlist),
       |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
       |        FROM ctr0),
       |dst AS (
       |  SELECT v.vec_id, c.cell,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, ${dims + 1}), i ->
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
       |           (a, x) -> a + x) AS d2
       |  FROM emb v CROSS JOIN ctr c),
       |asg AS (
       |  SELECT vec_id, cell
       |  FROM (SELECT vec_id, cell,
       |          row_number() OVER (PARTITION BY vec_id
       |                             ORDER BY d2, cell) AS pr
       |        FROM dst) WHERE pr = 1),
       |drops AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN emb ea ON ea.vec_id = a.vec_id
       |  JOIN emb eb ON eb.vec_id = b.vec_id
       |  WHERE list_cosine_similarity(ea.e, eb.e) >= $tau)
       |SELECT CAST(v.vec_id AS BIGINT) AS vec_id, CAST(v.cell AS INT) AS cell
       |FROM asg v WHERE v.vec_id NOT IN (SELECT vec_id FROM drops)""".stripMargin
  }

  q("dd_semdedup", semDedupOracleSql) { (s, d) =>
    val e = embs(s, d)
    Dedup.semDedup(Similarity.hashSampledQuantizer(e, nlist = 16), e,
      minCosine = 0.4)
  }

  /** DBSCAN over the cell-bucketed eps-graph — see
    * [[graft.sim.Similarity.dbscan]]. The oracle re-derives the same
    * hash-sampled cells, builds the in-cell eps-graph with bit-equal
    * cosines, takes the EXACT reachability closure of the core
    * subgraph as a recursive CTE (min reachable core id — the
    * dd_cluster_components pattern, so the Spark side's capped
    * pointer-jumped CC is checked against true transitive closure),
    * and replays border attachment and the noise remainder.
    */
  private def dbscanOracleSql(probes: Int,
      nlistSql: String = "16"): String = {
    val (dims, tau, minPts) = (64, 0.3, 2)
    s"""WITH RECURSIVE
       |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |        FROM embeddings),
       |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
       |         FROM emb ORDER BY h LIMIT $nlistSql),
       |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
       |        FROM ctr0),
       |dst AS (
       |  SELECT v.vec_id, c.cell,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, ${dims + 1}), i ->
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
       |           (a, x) -> a + x) AS d2
       |  FROM emb v CROSS JOIN ctr c),
       |asg AS (
       |  SELECT vec_id, cell
       |  FROM (SELECT vec_id, cell,
       |          row_number() OVER (PARTITION BY vec_id
       |                             ORDER BY d2, cell) AS pr
       |        FROM dst) WHERE pr <= $probes),
       |edges AS (
       |  SELECT DISTINCT a.vec_id AS s, b.vec_id AS t
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id <> b.vec_id
       |  JOIN emb ea ON ea.vec_id = a.vec_id
       |  JOIN emb eb ON eb.vec_id = b.vec_id
       |  WHERE list_cosine_similarity(ea.e, eb.e) >= $tau),
       |core AS (SELECT s AS vec_id FROM edges GROUP BY 1
       |         HAVING count(*) >= $minPts),
       |ce AS (SELECT e.s, e.t FROM edges e
       |       JOIN core x ON x.vec_id = e.s
       |       JOIN core y ON y.vec_id = e.t),
       |reach(v, r) AS (
       |  SELECT vec_id, vec_id FROM core
       |  UNION
       |  SELECT reach.v, ce.t FROM reach JOIN ce ON ce.s = reach.r),
       |clab AS (SELECT v AS vec_id, min(r) AS cluster FROM reach GROUP BY v),
       |border AS (
       |  SELECT e.s AS vec_id, min(c.cluster) AS cluster
       |  FROM edges e JOIN clab c ON c.vec_id = e.t
       |  WHERE e.s NOT IN (SELECT vec_id FROM core)
       |  GROUP BY 1)
       |SELECT CAST(vec_id AS BIGINT) AS vec_id, 'core' AS role,
       |       CAST(cluster AS BIGINT) AS cluster
       |FROM clab
       |UNION ALL
       |SELECT CAST(vec_id AS BIGINT), 'border', CAST(cluster AS BIGINT)
       |FROM border
       |UNION ALL
       |SELECT CAST(v.vec_id AS BIGINT), 'noise', CAST(-1 AS BIGINT)
       |FROM emb v
       |WHERE v.vec_id NOT IN (SELECT vec_id FROM clab)
       |  AND v.vec_id NOT IN (SELECT vec_id FROM border)""".stripMargin
  }

  // The HEADLINE entry runs at the CURVE-PICKED probe count (r10
  // verdict #2: `Similarity.curvePick` over the measured
  // sim_dbscan_recall_curve lands on p=4; `sim_dbscan_auto` below
  // exercises + oracle-checks that pick live) AND at the
  // CORPUS-SIZED quantizer, nlist = ⌈√n⌉ derived from count(*) on
  // BOTH engines (the oracle computes the identical LIMIT from a
  // scalar subquery over the same table). Both knobs follow the same
  // principle — the default must not be the configuration a real
  // user trips on at their scale: p=1 silently missed 80% of
  // eps-edges (the r10 default), and a PINNED nlist at p=4 is
  // Σ|cell|² ≈ n² by construction (measured: 95.8 s at sf1 vs
  // 15.9 s for √n cells — `sim_dbscan_pinned16` below keeps that
  // evidence row). √n cells keep the pair term ≈ p²·n^1.5; the
  // measured edge recall AT THIS operating point is published by
  // `sim_dbscan_scaled_recall`, and p=1/p=2 (pinned-16) remain the
  // cost-curve baselines consistent with sim_dbscan_recall_curve.
  q("sim_dbscan", dbscanOracleSql(probes = 4,
    nlistSql =
      "(SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM emb)")) {
    (s, d) =>
      val e = embs(s, d)
      val nlist = math.ceil(math.sqrt(e.count().toDouble)).toInt
      Similarity.dbscan(Similarity.hashSampledQuantizer(e, nlist), e,
        minCosine = 0.3, minPts = 2, probes = 4)
  }

  // Cost baselines for the probe knob (same oracle builder at p=1 /
  // p=2 over the pinned-16 quantizer, so candidate generation, roles
  // and the CC replay exactly — the operating points
  // sim_dbscan_recall_curve measures): the bench times them next to
  // the p=4 rows — the capped-vs-uncapped containment pattern for
  // the recall/pair-volume trade.
  q("sim_dbscan_p1", dbscanOracleSql(probes = 1)) { (s, d) =>
    val e = embs(s, d)
    Similarity.dbscan(Similarity.hashSampledQuantizer(e, nlist = 16), e,
      minCosine = 0.3, minPts = 2)
  }
  q("sim_dbscan_p2", dbscanOracleSql(probes = 2)) { (s, d) =>
    val e = embs(s, d)
    Similarity.dbscan(Similarity.hashSampledQuantizer(e, nlist = 16), e,
      minCosine = 0.3, minPts = 2, probes = 2)
  }

  // The QUADRATIC-TRAP evidence row (r11; headline until the swap in
  // this round): nlist pinned at 16 makes the multi-probe eps-graph
  // effectively quadratic — at p=4 of 16 cells every cell holds ~n/4
  // vectors, so Σ|cell|² ≈ n² (measured: 5.6 s at sf0.1 → 95.8 s at
  // sf1, 17.5× for 10× data, vs 15.9 s for the √n-cell default —
  // 401M vs 46M in-cell pairs). Kept as a NAMED entry so the bench
  // keeps timing the pinned-vs-scaled pair at sf0.1 AND sf1: it is
  // the measured case for sizing the quantizer with the corpus
  // (Similarity.buildIndex's nlist ≈ √n guidance) instead of pinning
  // a constant that silently goes quadratic at 10×. Recall at a
  // given p shifts as cells shrink (smaller cells = tighter
  // neighborhoods); sim_dbscan_scaled_recall measures the default's
  // point, sim_dbscan_recall_curve this row's quantizer.
  q("sim_dbscan_pinned16", dbscanOracleSql(probes = 4)) { (s, d) =>
    val e = embs(s, d)
    Similarity.dbscan(Similarity.hashSampledQuantizer(e, nlist = 16), e,
      minCosine = 0.3, minPts = 2, probes = 4)
  }

  /** The probe pick EXERCISED live (r10 verdict #2 + #8): compute the
    * measured recall curve (probes 1/2/4 against the Guards-gated
    * exact eps-pair baseline — audit-sized corpora; sample at scale),
    * feed it to [[graft.sim.Similarity.autoProbes]] (=
    * `curvePick`, the same audited knee rule as `sim_auto_nprobe`),
    * and report the chosen probe count. The oracle re-derives the
    * identical curve arms in SQL and applies the same
    * min-over-slack filter, so an off-by-one in the knee rule on
    * either side hash-fails. With the committed testdata the pick is
    * p=4 — the value `sim_dbscan` pins statically.
    */
  q("sim_dbscan_auto", {
    val arms = Seq(1, 2, 4).map { p =>
      s"""SELECT $p AS probes,
         |  CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
         |  CAST((SELECT count(*) FROM (
         |     SELECT DISTINCT e.va, e.vb
         |     FROM exact e
         |     JOIN asg x ON x.vec_id = e.va AND x.pr <= $p
         |     JOIN asg y ON y.vec_id = e.vb AND y.pr <= $p
         |     WHERE x.cell = y.cell)) AS BIGINT) AS n_found""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |            FROM embeddings),
       |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
       |         FROM emb ORDER BY h LIMIT 16),
       |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
       |        FROM ctr0),
       |dst AS (
       |  SELECT v.vec_id, c.cell,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, 65), i ->
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
       |           (a, x) -> a + x) AS d2
       |  FROM emb v CROSS JOIN ctr c),
       |asg AS (
       |  SELECT vec_id, cell, pr
       |  FROM (SELECT vec_id, cell,
       |          row_number() OVER (PARTITION BY vec_id
       |                             ORDER BY d2, cell) AS pr
       |        FROM dst)),
       |exact AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(a.e, b.e) >= 0.3),
       |curve AS (
       |  SELECT CAST(probes AS INT) AS probes,
       |         CAST(n_found * 1000000 // greatest(n_exact, 1) AS BIGINT)
       |           AS recall_ppm
       |  FROM ($arms))
       |SELECT CAST(c.probes AS INT) AS chosen_probes,
       |       c.recall_ppm AS chosen_recall_ppm,
       |       b.best_recall_ppm
       |FROM curve c,
       |     (SELECT max(recall_ppm) AS best_recall_ppm FROM curve) b
       |WHERE c.recall_ppm >= b.best_recall_ppm - 20000
       |ORDER BY c.probes LIMIT 1""".stripMargin
  }) { (s, d) =>
    import s.implicits._
    val e = embs(s, d)
    require(graft.Guards.atMost(e, 100000L),
      "sim_dbscan_auto's exact side is O(n²); pick from a sample at scale")
    val quant = Similarity.hashSampledQuantizer(e, nlist = 16)
    val ee = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))
    val exact = ee.as("a").join(ee.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .filter(Dedup.cosineCol(col("a.e"), col("b.e")) >= 0.3)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .localCheckpoint(true)
    val curve: Seq[(Int, Long)] = Seq(1, 2, 4).map { p =>
      val probeUdf = udf { (v: Seq[Double]) => quant.nearestCells(v, p) }
      val asg = ee.select(col("vec_id"),
        explode(probeUdf(col("e"))).as("cell"))
      val found = exact
        .join(asg.select(col("vec_id").as("va"), col("cell").as("ca")),
          "va")
        .join(asg.select(col("vec_id").as("vb"), col("cell").as("cb")),
          "vb")
        .filter(col("ca") === col("cb"))
        .select("va", "vb").distinct()
      val r = exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(broadcast(found.agg(count(lit(1)).as("n_found"))))
        .select(expr("n_found * 1000000L div greatest(n_exact, 1L)"))
        .collect()(0).getLong(0)
      p -> r
    }
    val chosen = Similarity.autoProbes(curve)
    val best = curve.map(_._2).max
    Seq((chosen, curve.toMap.apply(chosen), best))
      .toDF("chosen_probes", "chosen_recall_ppm", "best_recall_ppm")
  }

  /** Honest recall of the cell-bounded eps-graph (the dd_minhash_recall
    * pattern for DBSCAN, at the pinned-16 single-probe point —
    * `sim_dbscan_p1`'s operating point): what fraction of the EXACT
    * eps-pairs (cosine ≥ τ over all pairs — the guarded brute
    * baseline) survive the within-cell restriction. Cross-cell
    * neighbors are the documented recall trade, and this row measures
    * it instead of asserting it; the headline default's number is
    * `sim_dbscan_scaled_recall`. Exact integers (pair counts + ppm).
    */
  q("sim_dbscan_recall",
    """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |            FROM embeddings),
      |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
      |         FROM emb ORDER BY h LIMIT 16),
      |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
      |        FROM ctr0),
      |dst AS (
      |  SELECT v.vec_id, c.cell,
      |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(1, 65), i ->
      |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
      |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
      |           (a, x) -> a + x) AS d2
      |  FROM emb v CROSS JOIN ctr c),
      |asg AS (
      |  SELECT vec_id, cell
      |  FROM (SELECT vec_id, cell,
      |          row_number() OVER (PARTITION BY vec_id
      |                             ORDER BY d2, cell) AS pr
      |        FROM dst) WHERE pr = 1),
      |exact AS (
      |  SELECT a.vec_id AS va, b.vec_id AS vb
      |  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(a.e, b.e) >= 0.3),
      |incell AS (
      |  SELECT e.va, e.vb
      |  FROM exact e JOIN asg x ON x.vec_id = e.va
      |               JOIN asg y ON y.vec_id = e.vb
      |  WHERE x.cell = y.cell)
      |SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
      |       CAST((SELECT count(*) FROM incell) AS BIGINT) AS n_found,
      |       CAST((SELECT count(*) FROM incell) * 1000000 //
      |            greatest((SELECT count(*) FROM exact), 1) AS BIGINT)
      |         AS recall_ppm""") { (s, d) =>
    val e = embs(s, d)
    require(graft.Guards.atMost(e, 100000L),
      "sim_dbscan_recall's exact side is O(n²); audit on a sample at scale")
    val quant = Similarity.hashSampledQuantizer(e, nlist = 16)
    val asg = quant.assign(e).select("vec_id", "cell")
    val ee = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))
    val exact = ee.as("a").join(ee.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .filter(Dedup.cosineCol(col("a.e"), col("b.e")) >= 0.3)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .localCheckpoint(true)
    val found = exact
      .join(asg.select(col("vec_id").as("va"), col("cell").as("ca")), "va")
      .join(asg.select(col("vec_id").as("vb"), col("cell").as("cb")), "vb")
      .filter(col("ca") === col("cb"))
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(found.agg(count(lit(1)).as("n_found"))))
      .select(col("n_exact"), col("n_found"),
        expr("n_found * 1000000L div greatest(n_exact, 1L)")
          .as("recall_ppm"))
  }

  /** Recall at the DEFAULT operating point (r11): the headline
    * `sim_dbscan` trades pinned-16 cells for nlist = ⌈√n⌉, which
    * shrinks cells and therefore shifts edge recall at a given probe
    * budget — this entry MEASURES the shifted number instead of
    * leaving the headline docstring caveat as prose (the
    * sim_dbscan_recall pattern at the √n quantizer). Same exact
    * brute-force baseline (Guards-gated, audit-only), same ppm
    * integers; DISTINCT on the in-cell pairs because multi-probe
    * assignment can find a pair in several shared cells.
    */
  q("sim_dbscan_scaled_recall",
    """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |            FROM embeddings),
      |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
      |         FROM emb ORDER BY h
      |         LIMIT (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT)
      |                FROM emb)),
      |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
      |        FROM ctr0),
      |dst AS (
      |  SELECT v.vec_id, c.cell,
      |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(1, 65), i ->
      |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
      |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
      |           (a, x) -> a + x) AS d2
      |  FROM emb v CROSS JOIN ctr c),
      |asg AS (
      |  SELECT vec_id, cell
      |  FROM (SELECT vec_id, cell,
      |          row_number() OVER (PARTITION BY vec_id
      |                             ORDER BY d2, cell) AS pr
      |        FROM dst) WHERE pr <= 4),
      |exact AS (
      |  SELECT a.vec_id AS va, b.vec_id AS vb
      |  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(a.e, b.e) >= 0.3),
      |incell AS (
      |  SELECT DISTINCT e.va, e.vb
      |  FROM exact e JOIN asg x ON x.vec_id = e.va
      |               JOIN asg y ON y.vec_id = e.vb
      |  WHERE x.cell = y.cell)
      |SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
      |       CAST((SELECT count(*) FROM incell) AS BIGINT) AS n_found,
      |       CAST((SELECT count(*) FROM incell) * 1000000 //
      |            greatest((SELECT count(*) FROM exact), 1) AS BIGINT)
      |         AS recall_ppm""") { (s, d) =>
    val e = embs(s, d)
    require(graft.Guards.atMost(e, 100000L),
      "sim_dbscan_scaled_recall's exact side is O(n²); audit on a " +
        "sample at scale")
    val nlist = math.ceil(math.sqrt(e.count().toDouble)).toInt
    val quant = Similarity.hashSampledQuantizer(e, nlist)
    val probeUdf = udf { (v: Seq[Double]) => quant.nearestCells(v, 4) }
    val ee = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))
    val asg = ee.select(col("vec_id"),
      explode(probeUdf(col("e"))).as("cell"))
    val exact = ee.as("a").join(ee.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .filter(Dedup.cosineCol(col("a.e"), col("b.e")) >= 0.3)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .localCheckpoint(true)
    val found = exact
      .join(asg.select(col("vec_id").as("va"), col("cell").as("ca")), "va")
      .join(asg.select(col("vec_id").as("vb"), col("cell").as("cb")), "vb")
      .filter(col("ca") === col("cb"))
      .select("va", "vb").distinct()
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(found.agg(count(lit(1)).as("n_found"))))
      .select(col("n_exact"), col("n_found"),
        expr("n_found * 1000000L div greatest(n_exact, 1L)")
          .as("recall_ppm"))
  }

  /** The recall audit WITH AN EXECUTABLE PATH AT ANY SCALE (r11
    * verdict #4): every other measured-recall entry Guards-gates its
    * O(n²) exact baseline to ≤100k rows, so the curve-driven-defaults
    * discipline — this repo's standing contract — had no path at
    * production scale. This twin measures the SAME number
    * (eps-graph edge recall of the default √n-cell, p=4 DBSCAN
    * operating point) on a deterministic md5-threshold sample
    * ([[graft.pipeline.Sampling.hashSample]], pct=25): the exact side
    * prices (n/4)² pairs instead of n², a pure map-side filter both
    * engines replay from the same hex digest. The quantizer still fits
    * on the FULL corpus (centers = √n lowest-md5 vectors — the
    * production assignment under audit; fitting on the sample would
    * audit a different operating point), only the audited pair
    * population is sampled. Unbiased: a pair survives iff both
    * endpoints do (uniform over pairs) and its detection indicator —
    * do its own two assignments share a cell — is untouched by the
    * sampling. The Guards gate applies to the SAMPLE, so the entry
    * runs green at sf1 (the bench row is the evidence) and the pct
    * knob extends the audit to any corpus. n_sample is reported so
    * the binomial confidence of recall_ppm is readable from the row
    * (stderr ≈ √(r(1−r)/n_exact); SCALE.md).
    */
  q("sim_dbscan_sampled_recall",
    """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |            FROM embeddings),
      |samp AS (SELECT vec_id, e FROM emb
      |         WHERE CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
      |                 1, 8)) AS UBIGINT) % 100 < 25),
      |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
      |         FROM emb ORDER BY h
      |         LIMIT (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT)
      |                FROM emb)),
      |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
      |        FROM ctr0),
      |dst AS (
      |  SELECT v.vec_id, c.cell,
      |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(1, 65), i ->
      |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
      |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
      |           (a, x) -> a + x) AS d2
      |  FROM samp v CROSS JOIN ctr c),
      |asg AS (
      |  SELECT vec_id, cell
      |  FROM (SELECT vec_id, cell,
      |          row_number() OVER (PARTITION BY vec_id
      |                             ORDER BY d2, cell) AS pr
      |        FROM dst) WHERE pr <= 4),
      |exact AS (
      |  SELECT a.vec_id AS va, b.vec_id AS vb
      |  FROM samp a JOIN samp b ON a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(a.e, b.e) >= 0.3),
      |incell AS (
      |  SELECT DISTINCT e.va, e.vb
      |  FROM exact e JOIN asg x ON x.vec_id = e.va
      |               JOIN asg y ON y.vec_id = e.vb
      |  WHERE x.cell = y.cell)
      |SELECT CAST((SELECT count(*) FROM samp) AS BIGINT) AS n_sample,
      |       CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
      |       CAST((SELECT count(*) FROM incell) AS BIGINT) AS n_found,
      |       CAST((SELECT count(*) FROM incell) * 1000000 //
      |            greatest((SELECT count(*) FROM exact), 1) AS BIGINT)
      |         AS recall_ppm""") { (s, d) =>
    val e = embs(s, d)
    val nlist = math.ceil(math.sqrt(e.count().toDouble)).toInt
    val quant = Similarity.hashSampledQuantizer(e, nlist)
    val samp = graft.pipeline.Sampling.hashSample(e, "vec_id", 25)
    require(graft.Guards.atMost(samp, 100000L),
      "sim_dbscan_sampled_recall's exact side is O(sample²); lower " +
        "the sample pct at this scale")
    val probeUdf = udf { (v: Seq[Double]) => quant.nearestCells(v, 4) }
    val ee = samp.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))
    val asg = ee.select(col("vec_id"),
      explode(probeUdf(col("e"))).as("cell"))
    val exact = ee.as("a").join(ee.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .filter(Dedup.cosineCol(col("a.e"), col("b.e")) >= 0.3)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .localCheckpoint(true)
    val found = exact
      .join(asg.select(col("vec_id").as("va"), col("cell").as("ca")), "va")
      .join(asg.select(col("vec_id").as("vb"), col("cell").as("cb")), "vb")
      .filter(col("ca") === col("cb"))
      .select("va", "vb").distinct()
    samp.agg(count(lit(1)).as("n_sample"))
      .crossJoin(broadcast(exact.agg(count(lit(1)).as("n_exact"))))
      .crossJoin(broadcast(found.agg(count(lit(1)).as("n_found"))))
      .select(col("n_sample"), col("n_exact"), col("n_found"),
        expr("n_found * 1000000L div greatest(n_exact, 1L)")
          .as("recall_ppm"))
  }

  // Embedding-level cross-split contamination (r12): the semantic leg
  // of the decontamination family — eval-half vectors with a
  // train-half near-duplicate at cosine >= 0.4, candidates from the
  // cell-bucketed assignment (the dbscan machinery), per flagged eval
  // its best train neighbor + candidate count. The oracle replays the
  // md5-parity split, the √n/p=4 assignment, the cell join and the
  // per-eval rank exactly.
  q("sim_split_leakage",
    """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |            FROM embeddings),
      |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
      |         FROM emb ORDER BY h
      |         LIMIT (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT)
      |                FROM emb)),
      |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
      |        FROM ctr0),
      |dst AS (
      |  SELECT v.vec_id, c.cell,
      |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(1, 65), i ->
      |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
      |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
      |           (a, x) -> a + x) AS d2
      |  FROM emb v CROSS JOIN ctr c),
      |asg AS (
      |  SELECT vec_id, cell
      |  FROM (SELECT vec_id, cell,
      |          row_number() OVER (PARTITION BY vec_id
      |                             ORDER BY d2, cell) AS pr
      |        FROM dst) WHERE pr <= 4),
      |sd AS (SELECT vec_id, e,
      |         (CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
      |            1, 8)) AS UBIGINT) % 100) % 2 AS side
      |       FROM emb),
      |cand AS (SELECT DISTINCT t.vec_id AS train_id, v.vec_id AS eval_id
      |         FROM asg a JOIN asg b ON a.cell = b.cell
      |         JOIN sd t ON t.vec_id = a.vec_id AND t.side = 0
      |         JOIN sd v ON v.vec_id = b.vec_id AND v.side = 1),
      |sc AS (SELECT c.eval_id, c.train_id,
      |         list_cosine_similarity(t.e, v.e) AS cos
      |       FROM cand c JOIN sd t ON t.vec_id = c.train_id
      |                   JOIN sd v ON v.vec_id = c.eval_id
      |       WHERE list_cosine_similarity(t.e, v.e) >= 0.4),
      |rk AS (SELECT eval_id, train_id, cos,
      |         row_number() OVER (PARTITION BY eval_id
      |                            ORDER BY cos DESC, train_id) AS rn,
      |         count(*) OVER (PARTITION BY eval_id) AS n_cands
      |       FROM sc)
      |SELECT CAST(eval_id AS BIGINT) AS eval_id,
      |       CAST(train_id AS BIGINT) AS train_id,
      |       round(cos, 6) AS cos, CAST(n_cands AS BIGINT) AS n_cands
      |FROM rk WHERE rn = 1""") { (s, d) =>
    Similarity.crossSplitLeakage(embs(s, d), minCos = 0.4, nprobe = 4)
  }

  /** The probe curve AT THE DEFAULT QUANTIZER (r11): the headline
    * `sim_dbscan` pins p=4, a pick `curvePick` made over
    * `sim_dbscan_recall_curve` — which measures the PINNED-16
    * quantizer. Since the default's quantizer is now nlist = ⌈√n⌉,
    * the justification must be re-measured where the default actually
    * operates: this entry re-runs the same three arms at the √n cells
    * (testdata: 21.8%→45.4%→83.3% at p=1/2/4 — `curvePick` still
    * lands on p=4; SimilaritySpec asserts that pick over this curve).
    * Same Guards-gated exact baseline, DISTINCT in-cell pairs
    * (multi-probe can find a pair in several shared cells), exact ppm
    * integers.
    */
  q("sim_dbscan_scaled_curve", {
    val arms = Seq(1, 2, 4).map { p =>
      s"""SELECT $p AS probes,
         |  CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
         |  CAST((SELECT count(*) FROM (
         |     SELECT DISTINCT e.va, e.vb
         |     FROM exact e
         |     JOIN asg x ON x.vec_id = e.va AND x.pr <= $p
         |     JOIN asg y ON y.vec_id = e.vb AND y.pr <= $p
         |     WHERE x.cell = y.cell)) AS BIGINT) AS n_found""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |            FROM embeddings),
       |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
       |         FROM emb ORDER BY h
       |         LIMIT (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT)
       |                FROM emb)),
       |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
       |        FROM ctr0),
       |dst AS (
       |  SELECT v.vec_id, c.cell,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, 65), i ->
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
       |           (a, x) -> a + x) AS d2
       |  FROM emb v CROSS JOIN ctr c),
       |asg AS (
       |  SELECT vec_id, cell, pr
       |  FROM (SELECT vec_id, cell,
       |          row_number() OVER (PARTITION BY vec_id
       |                             ORDER BY d2, cell) AS pr
       |        FROM dst) WHERE pr <= 4),
       |exact AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(a.e, b.e) >= 0.3)
       |SELECT CAST(probes AS INT) AS probes, n_exact, n_found,
       |       CAST(n_found * 1000000 // greatest(n_exact, 1) AS BIGINT)
       |         AS recall_ppm
       |FROM ($arms)""".stripMargin
  }) { (s, d) =>
    val e = embs(s, d)
    require(graft.Guards.atMost(e, 100000L),
      "sim_dbscan_scaled_curve's exact side is O(n²); sample at scale")
    val nlist = math.ceil(math.sqrt(e.count().toDouble)).toInt
    val quant = Similarity.hashSampledQuantizer(e, nlist)
    val ee = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))
    val exact = ee.as("a").join(ee.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .filter(Dedup.cosineCol(col("a.e"), col("b.e")) >= 0.3)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .localCheckpoint(true)
    val arms = Seq(1, 2, 4).map { p =>
      val probeUdf = udf { (v: Seq[Double]) => quant.nearestCells(v, p) }
      val asg = ee.select(col("vec_id"),
        explode(probeUdf(col("e"))).as("cell"))
      val found = exact
        .join(asg.select(col("vec_id").as("va"), col("cell").as("ca")),
          "va")
        .join(asg.select(col("vec_id").as("vb"), col("cell").as("cb")),
          "vb")
        .filter(col("ca") === col("cb"))
        .select("va", "vb").distinct()
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(broadcast(found.agg(count(lit(1)).as("n_found"))))
        .select(lit(p).as("probes"), col("n_exact"), col("n_found"))
    }
    arms.reduce(_.unionAll(_))
      .select(col("probes"), col("n_exact"), col("n_found"),
        expr("n_found * 1000000L div greatest(n_exact, 1L)")
          .as("recall_ppm"))
      .localCheckpoint(true)
  }

  /** Embedding-distribution drift monitor: split the corpus into two
    * deterministic md5 halves (stand-ins for reference vs candidate
    * batches — e.g. last week's embedding snapshot vs today's, or two
    * encoder versions) and compare their per-dimension centroids — the
    * DQ gate that catches a silently retrained/renormalized encoder
    * before cosine thresholds tuned on the old distribution corrupt
    * every downstream dedup/retrieval decision. Outputs the centroid
    * cosine, the worst per-dim mean shift, and the count of dims
    * shifted beyond 0.05.
    *
    * Exactness: per-dim sums are exact integer µ-units
    * (floor(v·10⁶+0.5) — float32→double is exact, so the floor grid is
    * engine-identical and the sums are order-free); the per-dim mean
    * difference is the exact cross-multiplied integer
    * |sa·n_b − sb·n_a| div (n_a·n_b); only the final centroid cosine
    * touches doubles, computed token-identically from the SAME exact
    * integer sums on both engines. Shape: one (half, dim) map-combined
    * aggregate — post-shuffle state is 2·dims rows, never the corpus.
    */
  /** Shared oracle text for the batch entry and its streaming twin
    * `st_embed_drift` (one builder, so the two cannot drift).
    */
  private[graft] val embedDriftSql: String =
    """WITH ex AS (
      |  SELECT CASE WHEN CAST(('0x' ||
      |           substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS UBIGINT)
      |           % 2 = 0 THEN 'a' ELSE 'b' END AS half,
      |         vec_id, generate_subscripts(embedding, 1) AS dim,
      |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000
      |              + 0.5) AS BIGINT) AS vu
      |  FROM embeddings),
      |sums AS (
      |  SELECT half, dim, CAST(sum(vu) AS BIGINT) AS s
      |  FROM ex GROUP BY 1, 2),
      |cnt AS (
      |  SELECT half, CAST(count(DISTINCT vec_id) AS BIGINT) AS n
      |  FROM ex GROUP BY 1),
      |wide AS (
      |  SELECT a.dim, a.s AS sa, b.s AS sb, ca.n AS n_a, cb.n AS n_b
      |  FROM sums a JOIN sums b ON a.dim = b.dim
      |  JOIN cnt ca ON ca.half = 'a' JOIN cnt cb ON cb.half = 'b'
      |  WHERE a.half = 'a' AND b.half = 'b'),
      |dm AS (
      |  SELECT dim, n_a, n_b,
      |         abs(sa * n_b - sb * n_a) // (n_a * n_b) AS dmean_u,
      |         CAST(sa AS HUGEINT) * sb AS dot_t,
      |         CAST(sa AS HUGEINT) * sa AS aa_t,
      |         CAST(sb AS HUGEINT) * sb AS bb_t
      |  FROM wide)
      |SELECT max(n_a) AS n_a, max(n_b) AS n_b,
      |       round(CAST(sum(dot_t) AS DOUBLE) /
      |             (sqrt(CAST(sum(aa_t) AS DOUBLE)) *
      |              sqrt(CAST(sum(bb_t) AS DOUBLE))), 6) AS centroid_cos,
      |       CAST(max(dmean_u) AS BIGINT) AS max_dmean_u,
      |       CAST(sum(CASE WHEN dmean_u > 50000 THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_drifted_dims
      |FROM dm""".stripMargin

  q("sim_embed_drift", embedDriftSql) { (s, d) =>
    val dec = "decimal(38,0)"
    val ex = embs(s, d)
      .withColumn("half",
        when(Sampling.hashBucket("vec_id") % 2 === 0, "a").otherwise("b"))
      .select(col("half"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("dim0", "v")))
      .select(col("half"), col("vec_id"), (col("dim0") + 1).as("dim"),
        floor(col("v").cast("double") * 1000000 + lit(0.5))
          .cast("long").as("vu"))
    val sums = ex.groupBy("half", "dim").agg(sum(col("vu")).as("s"))
    val cnt = ex.groupBy("half")
      .agg(countDistinct(col("vec_id")).as("n"))
    val wide = sums.filter(col("half") === "a")
      .select(col("dim"), col("s").as("sa"))
      .join(sums.filter(col("half") === "b")
        .select(col("dim"), col("s").as("sb")), Seq("dim"))
      .crossJoin(broadcast(cnt.filter(col("half") === "a")
        .select(col("n").as("n_a"))))
      .crossJoin(broadcast(cnt.filter(col("half") === "b")
        .select(col("n").as("n_b"))))
    wide
      .select(col("dim"), col("n_a"), col("n_b"),
        expr("abs(sa * n_b - sb * n_a) div (n_a * n_b)").as("dmean_u"),
        (col("sa").cast(dec) * col("sb")).as("dot_t"),
        (col("sa").cast(dec) * col("sa")).as("aa_t"),
        (col("sb").cast(dec) * col("sb")).as("bb_t"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        round(sum(col("dot_t")).cast("double") /
          (sqrt(sum(col("aa_t")).cast("double")) *
            sqrt(sum(col("bb_t")).cast("double"))), 6).as("centroid_cos"),
        max(col("dmean_u")).cast("long").as("max_dmean_u"),
        sum(when(col("dmean_u") > 50000, 1L).otherwise(0L))
          .as("n_drifted_dims"))
  }

  /** Multi-probe recall curve for the cell-bounded eps-graph: recall
    * vs the ASSIGNMENT-probe budget p (each vector joins its p nearest
    * cells; an eps-pair is found when the two share ANY cell) — the
    * measured knob behind the dbscan docstring's "multi-assign for
    * recall" remedy, in the sim_ivf_probe_curve mold. The p=1 row IS
    * sim_dbscan_recall's number; the curve shows what each doubling of
    * the probe budget buys (pair volume grows ~p², the
    * recall/cost trade to pick deliberately). Exact integers.
    */
  q("sim_dbscan_recall_curve", {
    val arms = Seq(1, 2, 4).map { p =>
      s"""SELECT $p AS probes,
         |  CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
         |  CAST((SELECT count(*) FROM (
         |     SELECT DISTINCT e.va, e.vb
         |     FROM exact e
         |     JOIN asg x ON x.vec_id = e.va AND x.pr <= $p
         |     JOIN asg y ON y.vec_id = e.vb AND y.pr <= $p
         |     WHERE x.cell = y.cell)) AS BIGINT) AS n_found""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |            FROM embeddings),
       |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
       |         FROM emb ORDER BY h LIMIT 16),
       |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
       |        FROM ctr0),
       |dst AS (
       |  SELECT v.vec_id, c.cell,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, 65), i ->
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
       |           (a, x) -> a + x) AS d2
       |  FROM emb v CROSS JOIN ctr c),
       |asg AS (
       |  SELECT vec_id, cell, pr
       |  FROM (SELECT vec_id, cell,
       |          row_number() OVER (PARTITION BY vec_id
       |                             ORDER BY d2, cell) AS pr
       |        FROM dst)),
       |exact AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(a.e, b.e) >= 0.3)
       |SELECT CAST(probes AS INT) AS probes, n_exact, n_found,
       |       CAST(n_found * 1000000 // greatest(n_exact, 1) AS BIGINT)
       |         AS recall_ppm
       |FROM ($arms)""".stripMargin
  }) { (s, d) =>
    val e = embs(s, d)
    require(graft.Guards.atMost(e, 100000L),
      "sim_dbscan_recall_curve's exact side is O(n²); sample at scale")
    val quant = Similarity.hashSampledQuantizer(e, nlist = 16)
    val ee = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))
    val exact = ee.as("a").join(ee.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .filter(Dedup.cosineCol(col("a.e"), col("b.e")) >= 0.3)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .localCheckpoint(true)
    val arms = Seq(1, 2, 4).map { p =>
      val probeUdf = udf { (v: Seq[Double]) => quant.nearestCells(v, p) }
      val asg = ee.select(col("vec_id"),
        explode(probeUdf(col("e"))).as("cell"))
      val found = exact
        .join(asg.select(col("vec_id").as("va"), col("cell").as("ca")),
          "va")
        .join(asg.select(col("vec_id").as("vb"), col("cell").as("cb")),
          "vb")
        .filter(col("ca") === col("cb"))
        .select("va", "vb").distinct()
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(broadcast(found.agg(count(lit(1)).as("n_found"))))
        .select(lit(p).as("probes"), col("n_exact"), col("n_found"))
    }
    val out = arms.reduce(_.unionAll(_))
      .select(col("probes"), col("n_exact"), col("n_found"),
        expr("n_found * 1000000L div greatest(n_exact, 1L)")
          .as("recall_ppm"))
      .localCheckpoint(true)
    out
  }

  /** Cluster-label purity audit: per quantizer cell, how concentrated
    * are the ground-truth labels — the labeled-data QA readout that
    * pairs with sim_kmeans/sim_dbscan ("do my embedding clusters agree
    * with my labels, and which cells are mixed?"). majority label per
    * cell (ties to the smaller label — total order), exact ppm purity.
    * Shape: one cell-keyed count aggregate (state = cells × labels,
    * both bounded) + a cells-sized top-1 window; the corpus appears
    * only in the assignment scan.
    */
  q("sim_cluster_purity",
    """WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      |            FROM embeddings),
      |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
      |         FROM emb ORDER BY h LIMIT 16),
      |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
      |        FROM ctr0),
      |dst AS (
      |  SELECT v.vec_id, v.label, c.cell,
      |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(1, 65), i ->
      |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
      |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
      |           (a, x) -> a + x) AS d2
      |  FROM emb v CROSS JOIN ctr c),
      |asg AS (
      |  SELECT vec_id, label, cell
      |  FROM (SELECT vec_id, label, cell,
      |          row_number() OVER (PARTITION BY vec_id
      |                             ORDER BY d2, cell) AS pr
      |        FROM dst) WHERE pr = 1),
      |lc AS (SELECT cell, label, CAST(count(*) AS BIGINT) AS n
      |       FROM asg GROUP BY 1, 2),
      |tot AS (SELECT cell, CAST(sum(n) AS BIGINT) AS n_members,
      |               CAST(count(*) AS BIGINT) AS n_labels
      |        FROM lc GROUP BY 1),
      |top AS (SELECT cell, label AS top_label, n AS n_top
      |        FROM (SELECT *, row_number() OVER (PARTITION BY cell
      |                ORDER BY n DESC, label) AS rk FROM lc) t
      |        WHERE rk = 1)
      |SELECT CAST(t.cell AS INT) AS cell, o.n_members, o.n_labels,
      |       CAST(t.top_label AS INT) AS top_label, t.n_top,
      |       CAST(t.n_top * 1000000 // o.n_members AS BIGINT)
      |         AS purity_ppm
      |FROM top t JOIN tot o ON o.cell = t.cell""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = embs(s, d)
    val quant = Similarity.hashSampledQuantizer(e, nlist = 16)
    val asg = quant.assign(e)
      .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
    val lc = asg.groupBy("cell", "label").agg(count(lit(1)).as("n"))
    val tot = lc.groupBy("cell")
      .agg(sum("n").as("n_members"), count(lit(1)).as("n_labels"))
    val w = Window.partitionBy("cell").orderBy(col("n").desc, col("label"))
    lc.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("cell"), col("label").as("top_label"),
        col("n").as("n_top"))
      .join(tot, Seq("cell"))
      .select(col("cell").cast("int"), col("n_members"), col("n_labels"),
        col("top_label").cast("int"), col("n_top"),
        expr("n_top * 1000000L div n_members").as("purity_ppm"))
  }

  /** Hard-negative mining oracle: same hash-sampled cell re-derivation
    * as the semDedup oracle; within-cell pairwise cosine, per-anchor
    * best same-/different-label similarity and the ×10⁴ margin.
    */
  private val pairMarginOracleSql: String = {
    val (nlist, dims) = (16, 64)
    s"""WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
       |            FROM embeddings),
       |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
       |         FROM emb ORDER BY h LIMIT $nlist),
       |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
       |        FROM ctr0),
       |dst AS (
       |  SELECT v.vec_id, c.cell,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, ${dims + 1}), i ->
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
       |           (a, x) -> a + x) AS d2
       |  FROM emb v CROSS JOIN ctr c),
       |asg AS (
       |  SELECT vec_id, cell
       |  FROM (SELECT vec_id, cell,
       |          row_number() OVER (PARTITION BY vec_id
       |                             ORDER BY d2, cell) AS pr
       |        FROM dst) WHERE pr = 1),
       |pairs AS (
       |  SELECT a.vec_id AS anchor_id, a.cell, ea.label AS la,
       |         eb.label AS lb, list_cosine_similarity(ea.e, eb.e) AS cos
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id <> b.vec_id
       |  JOIN emb ea ON ea.vec_id = a.vec_id
       |  JOIN emb eb ON eb.vec_id = b.vec_id)
       |SELECT CAST(anchor_id AS BIGINT) AS anchor_id,
       |       CAST(cell AS INT) AS cell, la AS label,
       |       CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_pos,
       |       CAST(sum(CASE WHEN la <> lb THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_neg,
       |       CAST(floor((max(CASE WHEN la = lb THEN cos END) -
       |                   max(CASE WHEN la <> lb THEN cos END)) * 10000
       |                  + 0.5) AS BIGINT) AS margin_u
       |FROM pairs GROUP BY anchor_id, cell, la
       |HAVING max(CASE WHEN la = lb THEN cos END) IS NOT NULL
       |   AND max(CASE WHEN la <> lb THEN cos END) IS NOT NULL""".stripMargin
  }

  q("sim_pair_margin", pairMarginOracleSql) { (s, d) =>
    val e = embs(s, d)
    Similarity.pairMargin(Similarity.hashSampledQuantizer(e, nlist = 16), e)
  }

  /** Shared-index composite (r9): ONE built IVF index — one cell
    * assignment pass, eagerly materialized — serves BOTH consumers of
    * a real embedding pipeline in the same plan: hard-negative margin
    * mining and nearest-neighbor retrieval (top-1). Standalone, each
    * op re-assigns the corpus; shared, assignment happens once — one
    * less full pass over the embeddings per added consumer. The oracle
    * replays the whole composite from the SAME asg CTE, mirroring the
    * sharing.
    */
  private val indexPipelineOracleSql: String = {
    val (nlist, nprobe, dims) = (16, 4, 64)
    s"""WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
       |            FROM embeddings),
       |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
       |         FROM emb ORDER BY h LIMIT $nlist),
       |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
       |        FROM ctr0),
       |dst AS (
       |  SELECT v.vec_id, v.e, c.cell,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, ${dims + 1}), i ->
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
       |           (a, x) -> a + x) AS d2
       |  FROM emb v CROSS JOIN ctr c),
       |rankd AS (
       |  SELECT vec_id, e, cell,
       |         row_number() OVER (PARTITION BY vec_id
       |                            ORDER BY d2, cell) AS pr
       |  FROM dst),
       |asg AS (SELECT vec_id, cell FROM rankd WHERE pr = 1),
       |pairs AS (
       |  SELECT a.vec_id AS anchor_id, a.cell, ea.label AS la,
       |         eb.label AS lb, list_cosine_similarity(ea.e, eb.e) AS cos
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id <> b.vec_id
       |  JOIN emb ea ON ea.vec_id = a.vec_id
       |  JOIN emb eb ON eb.vec_id = b.vec_id),
       |marg AS (
       |  SELECT anchor_id, cell, la AS label,
       |         CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_pos,
       |         CAST(sum(CASE WHEN la <> lb THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_neg,
       |         CAST(floor((max(CASE WHEN la = lb THEN cos END) -
       |                     max(CASE WHEN la <> lb THEN cos END)) * 10000
       |                    + 0.5) AS BIGINT) AS margin_u
       |  FROM pairs GROUP BY anchor_id, cell, la
       |  HAVING max(CASE WHEN la = lb THEN cos END) IS NOT NULL
       |     AND max(CASE WHEN la <> lb THEN cos END) IS NOT NULL),
       |cands AS (
       |  SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS cand_id
       |  FROM (SELECT vec_id, cell FROM rankd WHERE pr <= $nprobe) q
       |  JOIN asg a ON a.cell = q.cell AND a.vec_id <> q.vec_id),
       |scored AS (
       |  SELECT c.query_id, c.cand_id,
       |         list_cosine_similarity(ea.e, eb.e) AS cos_raw
       |  FROM cands c
       |  JOIN emb ea ON ea.vec_id = c.query_id
       |  JOIN emb eb ON eb.vec_id = c.cand_id),
       |top1 AS (
       |  SELECT query_id, cand_id, cos_raw FROM (
       |    SELECT query_id, cand_id, cos_raw,
       |           row_number() OVER (PARTITION BY query_id
       |                              ORDER BY cos_raw DESC, cand_id) AS rank
       |    FROM scored) WHERE rank = 1)
       |SELECT CAST(m.anchor_id AS BIGINT) AS anchor_id,
       |       CAST(m.cell AS INT) AS cell, m.label, m.n_pos, m.n_neg,
       |       m.margin_u, CAST(t.cand_id AS BIGINT) AS nn_id,
       |       round(t.cos_raw, 6) AS nn_cosine
       |FROM marg m JOIN top1 t ON t.query_id = m.anchor_id""".stripMargin
  }

  q("sim_index_pipeline", indexPipelineOracleSql) { (s, d) =>
    val e = embs(s, d)
    val idx = Similarity.buildIndex(
      Similarity.hashSampledQuantizer(e, nlist = 16), e)
    val top1 = Similarity.ivfTopK(idx, k = 1, nprobe = 4)
      .select(col("query_id").as("anchor_id"), col("cand_id").as("nn_id"),
        col("cosine").as("nn_cosine"))
    Similarity.pairMargin(idx).join(top1, "anchor_id")
  }

  // Span-level exact-substring dedup (Lee et al. 2021): maximal token
  // spans appearing verbatim in >= 2 distinct docs, at 8-gram grain.
  // Both oracles are generated from the same (k, minDocs) constants.
  q("dd_span_dedup", SpanDedup.duplicateSpansOracleSql(k = 8)) { (s, d) =>
    SpanDedup.duplicateSpans(docs(s, d), k = 8)
  }

  q("dd_span_share", SpanDedup.spanDupShareOracleSql(k = 8)) { (s, d) =>
    SpanDedup.spanDupShare(docs(s, d), k = 8)
  }

  // The actionable form: cleaned corpus with one surviving copy of
  // each duplicated passage (keeper = min doc_id per gram).
  q("dd_span_clean", SpanDedup.spanDedupCleanOracleSql(k = 8)) { (s, d) =>
    SpanDedup.spanDedupClean(docs(s, d), k = 8)
  }

  /** Embedding decontamination oracle: same cell re-derivation as the
    * semDedup oracle, but drops are corpus-vs-EVAL within-cell pairs
    * (eval slice = vec_id % 50 == 0). Unrounded cosine threshold — the
    * sequential fold is bit-equal cross-engine.
    */
  private val embedDecontamOracleSql: String = {
    val (nlist, dims, tau) = (16, 64, 0.25)
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |            FROM embeddings),
       |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
       |         FROM emb ORDER BY h LIMIT $nlist),
       |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
       |        FROM ctr0),
       |dst AS (
       |  SELECT v.vec_id, c.cell,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, ${dims + 1}), i ->
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
       |           (a, x) -> a + x) AS d2
       |  FROM emb v CROSS JOIN ctr c),
       |asg AS (
       |  SELECT vec_id, cell
       |  FROM (SELECT vec_id, cell,
       |          row_number() OVER (PARTITION BY vec_id
       |                             ORDER BY d2, cell) AS pr
       |        FROM dst) WHERE pr = 1),
       |drops AS (
       |  SELECT DISTINCT a.vec_id
       |  FROM asg a JOIN asg b ON a.cell = b.cell
       |  JOIN emb ea ON ea.vec_id = a.vec_id
       |  JOIN emb eb ON eb.vec_id = b.vec_id
       |  WHERE a.vec_id % 50 <> 0 AND b.vec_id % 50 = 0
       |    AND list_cosine_similarity(ea.e, eb.e) >= $tau)
       |SELECT CAST(v.vec_id AS BIGINT) AS vec_id, CAST(v.cell AS INT) AS cell
       |FROM asg v WHERE v.vec_id % 50 <> 0
       |  AND v.vec_id NOT IN (SELECT vec_id FROM drops)""".stripMargin
  }

  q("dd_embed_decontam", embedDecontamOracleSql) { (s, d) =>
    val e = embs(s, d)
    val evalSlice = e.filter(col("vec_id") % 50 === 0)
    val corpus = e.filter(col("vec_id") % 50 =!= 0)
    Dedup.embedDecontaminate(
      Similarity.hashSampledQuantizer(e, nlist = 16),
      corpus, evalSlice, minCosine = 0.25)
  }

  // -------------------------------------------------------- similarity

  q("sim_cosine_topk",
    """WITH scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                CAST(c.embedding AS DOUBLE[])) AS cos_raw
      |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      |  WHERE q.vec_id < 20),
      |ranked AS (
      |  SELECT query_id, cand_id, cos_raw,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos_raw DESC, cand_id) AS rank
      |  FROM scored)
      |SELECT CAST(query_id AS BIGINT) AS query_id,
      |       CAST(cand_id AS BIGINT) AS cand_id,
      |       round(cos_raw, 6) AS cosine, CAST(rank AS INT) AS rank
      |FROM ranked WHERE rank <= 5""") { (s, d) =>
    val all = embs(s, d)
    Similarity.bruteForceTopK(all.filter(col("vec_id") < 20), all, k = 5)
  }

  /** Shared CTE: sign-bit codes as two 32-bit halves (see
    * Similarity.signBitCodes — bit 63 would overflow DuckDB's checked
    * BIGINT shift, so dims 1–32 / 33–64 pack separately).
    */
  private val binaryCodesSql =
    """codes AS (
      |  SELECT vec_id,
      |    CAST(sum(CASE WHEN CAST(embedding[i] AS DOUBLE) > 0
      |          THEN CAST(1 AS BIGINT) << (i - 1) ELSE 0 END) AS BIGINT)
      |      AS lo,
      |    CAST(sum(CASE WHEN CAST(embedding[i + 32] AS DOUBLE) > 0
      |          THEN CAST(1 AS BIGINT) << (i - 1) ELSE 0 END) AS BIGINT)
      |      AS hi
      |  FROM embeddings, unnest(generate_series(1, 32)) AS t(i)
      |  GROUP BY 1)""".stripMargin

  // Binary-quantized (sign-bit) Hamming top-k — the 256x-compressed
  // retrieval tier below int8/PQ: codes are map-only bit packing, the
  // distance is popcount(xor) per 32-bit half. Same query set and
  // rank convention as sim_cosine_topk.
  q("sim_binary_topk",
    s"""WITH $binaryCodesSql,
      |s AS (SELECT q.vec_id AS query_id, cd.vec_id AS cand_id,
      |        bit_count(xor(q.lo, cd.lo)) + bit_count(xor(q.hi, cd.hi))
      |          AS hamming
      |      FROM codes q JOIN codes cd ON q.vec_id <> cd.vec_id
      |      WHERE q.vec_id < 20),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |        ORDER BY hamming, cand_id) AS rank FROM s)
      |SELECT CAST(query_id AS BIGINT) AS query_id,
      |       CAST(cand_id AS BIGINT) AS cand_id,
      |       CAST(hamming AS INT) AS hamming, CAST(rank AS INT) AS rank
      |FROM r WHERE rank <= 5""") { (s, d) =>
    val all = embs(s, d)
    Similarity.hammingTopK(all.filter(col("vec_id") < 20), all, k = 5)
  }

  // Recall of the binary tier against exact cosine top-5 — the honest
  // "what does 256x compression cost" row next to the storage win
  // (the dd_minhash_recall pattern for the binary codes).
  q("sim_binary_recall",
    s"""WITH $binaryCodesSql,
      |s AS (SELECT q.vec_id AS query_id, cd.vec_id AS cand_id,
      |        bit_count(xor(q.lo, cd.lo)) + bit_count(xor(q.hi, cd.hi))
      |          AS hamming
      |      FROM codes q JOIN codes cd ON q.vec_id <> cd.vec_id
      |      WHERE q.vec_id < 20),
      |h AS (SELECT query_id, cand_id FROM (
      |        SELECT *, row_number() OVER (PARTITION BY query_id
      |          ORDER BY hamming, cand_id) AS rank FROM s) t
      |      WHERE rank <= 5),
      |cs AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                CAST(c.embedding AS DOUBLE[]))
      |           AS cos_raw
      |       FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      |       WHERE q.vec_id < 20),
      |cx AS (SELECT query_id, cand_id FROM (
      |         SELECT *, row_number() OVER (PARTITION BY query_id
      |           ORDER BY cos_raw DESC, cand_id) AS rank FROM cs) t
      |       WHERE rank <= 5),
      |o AS (SELECT h.query_id, CAST(count(*) AS BIGINT) AS ov
      |      FROM h JOIN cx ON cx.query_id = h.query_id
      |                    AND cx.cand_id = h.cand_id
      |      GROUP BY 1),
      |qq AS (SELECT DISTINCT query_id FROM h)
      |SELECT CAST(count(*) AS BIGINT) AS n_queries,
      |       CAST(sum(coalesce(ov, 0)) AS BIGINT) AS n_overlap,
      |       CAST(sum(coalesce(ov, 0)) * 1000000 // (count(*) * 5)
      |         AS BIGINT) AS recall_ppm
      |FROM qq LEFT JOIN o ON o.query_id = qq.query_id""") { (s, d) =>
    val all = embs(s, d)
    val qs = all.filter(col("vec_id") < 20)
    val ham = Similarity.hammingTopK(qs, all, k = 5)
      .select(col("query_id"), col("cand_id"))
    val cos = Similarity.bruteForceTopK(qs, all, k = 5)
      .select(col("query_id"), col("cand_id"))
    val o = ham.join(cos, Seq("query_id", "cand_id"))
      .groupBy("query_id").agg(count(lit(1)).as("ov"))
    ham.select("query_id").distinct()
      .join(o, Seq("query_id"), "left")
      .na.fill(0L, Seq("ov"))
      .agg(count(lit(1)).as("n_queries"), sum("ov").as("n_overlap"))
      .select(col("n_queries"), col("n_overlap"),
        expr("n_overlap * 1000000 div (n_queries * 5)").as("recall_ppm"))
  }

  // Per-label centroid vectors in long format — the IVF coarse-quantizer
  // building block, relational so DuckDB reproduces it element-wise.
  q("sim_label_centroids",
    """SELECT label, CAST(i - 1 AS INT) AS dim,
      |       round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS centroid,
      |       CAST(count(*) AS BIGINT) AS n_vecs
      |FROM embeddings,
      |     unnest(generate_series(1, len(embedding))) AS t(i)
      |GROUP BY label, i""") { (s, d) =>
    Similarity.labelCentroids(embs(s, d))
  }

  // Inter-slice semantic affinity: pairwise cosine between label
  // centroids — the slice-overlap audit matrix. The corpus reduces to
  // the labels×dims centroid table first, so the pair join is bounded
  // at labels² at any corpus size; folds run over ROUNDED centroids in
  // identical left-to-right order on both engines.
  q("sim_centroid_affinity",
    """WITH cent AS (
      |  SELECT label, i AS dim, round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS c
      |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
      |  GROUP BY label, i),
      |vecs AS (SELECT label, list(c ORDER BY dim) AS v FROM cent GROUP BY label)
      |SELECT a.label AS label_a, b.label AS label_b,
      |  round(
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(range(1, len(a.v) + 1), i ->
      |        a.v[CAST(i AS INT)] * b.v[CAST(i AS INT)])), (x, y) -> x + y)
      |    / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |         list_transform(range(1, len(a.v) + 1), i ->
      |           a.v[CAST(i AS INT)] * a.v[CAST(i AS INT)])), (x, y) -> x + y))
      |     * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |         list_transform(range(1, len(b.v) + 1), i ->
      |           b.v[CAST(i AS INT)] * b.v[CAST(i AS INT)])), (x, y) -> x + y))),
      |    6) AS cosine
      |FROM vecs a JOIN vecs b ON a.label < b.label""") { (s, d) =>
    Similarity.centroidAffinity(embs(s, d))
  }

  // Embedding norm audit: integer-grid L2 norms + outlier flags vs
  // 1.5×/0.5× the corpus median — broken-encoder detection before
  // indexing. Flag comparisons are pure integer arithmetic (no float
  // knife-edge); the median's state is bounded by the norm grid.
  q("sim_norm_audit",
    """WITH n AS (
      |  SELECT vec_id, label,
      |    CAST(floor(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))),
      |      (a, x) -> a + x)) * 10000 + 0.5) AS BIGINT) AS norm_u
      |  FROM embeddings),
      |m AS (SELECT CAST(2 * median(norm_u) AS BIGINT) AS med2 FROM n)
      |SELECT CAST(vec_id AS BIGINT) AS vec_id, label, norm_u,
      |       CAST(norm_u * 4 > med2 * 3 AS INT) AS outlier_hi,
      |       CAST(norm_u * 4 < med2 AS INT) AS outlier_lo
      |FROM n, m""") { (s, d) =>
    Similarity.normAudit(embs(s, d))
  }

  /** Lloyd's k-means replayed in DuckDB: hash-sampled init (identical
    * to the IVF oracle), then each unrolled iteration = argmin
    * assignment (sequential squared-L2 fold, ties to the lower cell) +
    * per-(cell, dim) mean refit rounded to 1e-6 — the rounding grid
    * that makes the engine-dependent FP summation order of avg
    * invisible. Empty cells COALESCE back to the previous iteration's
    * centers, matching [[Similarity.kmeansAssign]]'s inheritance.
    */
  private val kmeansOracleSql: String = {
    val (k, dims) = (8, 64)
    def dst(ctr: String): String =
      s"""SELECT v.vec_id, v.e, c.cell,
         |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |         list_transform(range(1, ${dims + 1}), i ->
         |           (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
         |           (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
         |         (a, x) -> a + x) AS d2
         |FROM emb v CROSS JOIN $ctr c""".stripMargin
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |            FROM embeddings),
       |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
       |         FROM emb ORDER BY h LIMIT $k),
       |c0 AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
       |       FROM ctr0),
       |c0l AS (SELECT cell, i AS dim, c[CAST(i AS INT)] AS v
       |        FROM c0, unnest(generate_series(1, $dims)) AS t(i)),
       |dd0 AS (${dst("c0")}),
       |a0 AS (SELECT vec_id, e, cell FROM (
       |         SELECT vec_id, e, cell,
       |                row_number() OVER (PARTITION BY vec_id
       |                                   ORDER BY d2, cell) AS pr
       |         FROM dd0) s WHERE pr = 1),
       |r1 AS (SELECT cell, i AS dim, round(avg(e[CAST(i AS INT)]), 6) AS v
       |       FROM a0, unnest(generate_series(1, $dims)) AS t(i)
       |       GROUP BY cell, i),
       |c1l AS (SELECT c0l.cell, c0l.dim, coalesce(r1.v, c0l.v) AS v
       |        FROM c0l LEFT JOIN r1
       |          ON r1.cell = c0l.cell AND r1.dim = c0l.dim),
       |c1 AS (SELECT cell, list(v ORDER BY dim) AS c FROM c1l
       |       GROUP BY cell),
       |dd1 AS (${dst("c1")}),
       |a1 AS (SELECT vec_id, e, cell FROM (
       |         SELECT vec_id, e, cell,
       |                row_number() OVER (PARTITION BY vec_id
       |                                   ORDER BY d2, cell) AS pr
       |         FROM dd1) s WHERE pr = 1),
       |r2 AS (SELECT cell, i AS dim, round(avg(e[CAST(i AS INT)]), 6) AS v
       |       FROM a1, unnest(generate_series(1, $dims)) AS t(i)
       |       GROUP BY cell, i),
       |c2l AS (SELECT c1l.cell, c1l.dim, coalesce(r2.v, c1l.v) AS v
       |        FROM c1l LEFT JOIN r2
       |          ON r2.cell = c1l.cell AND r2.dim = c1l.dim),
       |c2 AS (SELECT cell, list(v ORDER BY dim) AS c FROM c2l
       |       GROUP BY cell),
       |dd2 AS (${dst("c2")})""".stripMargin
  }

  q("sim_kmeans", kmeansOracleSql + """
      |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cell AS INT) AS cell,
      |       round(d2, 6) AS d2
      |FROM (SELECT vec_id, cell, d2,
      |             row_number() OVER (PARTITION BY vec_id
      |                                ORDER BY d2, cell) AS pr
      |      FROM dd2) s WHERE pr = 1""".stripMargin) { (s, d) =>
    Similarity.kmeansAssign(embs(s, d), k = 8, iters = 2)
  }

  // Simplified silhouette per cell over the SAME replayed fit: a/b
  // from the pr=1/pr=2 distance ranks, s rounded to ppm per vector
  // before the per-cell mean (order-free integer sums).
  q("sim_silhouette", kmeansOracleSql + """
      |, pr AS (SELECT vec_id, cell, d2,
      |               row_number() OVER (PARTITION BY vec_id
      |                                  ORDER BY d2, cell) AS pr
      |        FROM dd2),
      |ab AS (SELECT p1.vec_id, p1.cell, p1.d2 AS a, p2.d2 AS b
      |       FROM pr p1 JOIN pr p2 ON p1.vec_id = p2.vec_id
      |       WHERE p1.pr = 1 AND p2.pr = 2),
      |sc AS (SELECT cell,
      |              CASE WHEN greatest(a, b) = 0 THEN 0
      |                   ELSE CAST(round((b - a) / greatest(a, b) * 1000000)
      |                             AS BIGINT) END AS s_ppm
      |       FROM ab)
      |SELECT CAST(cell AS INT) AS cell, CAST(count(*) AS BIGINT) AS n_vecs,
      |       CAST(sum(s_ppm) // count(*) AS BIGINT) AS mean_s_ppm,
      |       CAST(min(s_ppm) AS BIGINT) AS min_s_ppm,
      |       CAST(max(s_ppm) AS BIGINT) AS max_s_ppm
      |FROM sc GROUP BY cell""".stripMargin) { (s, d) =>
    Similarity.kmeansSilhouette(embs(s, d), k = 8, iters = 2)
  }

  /** Greedy k-center replayed in DuckDB: a running min-distance table
    * (md updates by `least` with the distance to each newly-picked
    * center — mathematically the min over all selected, computed from
    * identical IEEE folds) and a top-1 pick per step (max md, ties to
    * the lower vec_id) — the [[graft.sim.Similarity.kCenterSelect]]
    * greedy unrolled as chained CTEs, the kmeans-oracle pattern.
    */
  private def kcenterOracleSqlFrom(embSrc: String): String = {
    val (k, dims) = (8, 64)
    def dist(m: String, c: String): String =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |  list_transform(range(1, ${dims + 1}), i ->
         |    ($m.e[CAST(i AS INT)] - $c.e[CAST(i AS INT)]) *
         |    ($m.e[CAST(i AS INT)] - $c.e[CAST(i AS INT)]))),
         |  (a, x) -> a + x)""".stripMargin
    val steps = (2 to k).map { i =>
      val (prev, dcur, pcur) =
        (if (i == 2) "s1" else s"p$i".dropRight(1) + (i - 1), s"d${i - 1}",
          s"p$i")
      val src = if (i == 2) "emb" else s"d${i - 2}"
      val md =
        if (i == 2) dist("m", "c")
        else s"least(m.md, ${dist("m", "c")})"
      // md > 0 mirrors kCenterSelect's exhaustion stop (r12 ADVICE):
      // when the greedy max min-d² hits 0 (pool smaller than k, or
      // all-duplicate remainder) the Spark side stops emitting — here
      // the filter empties p$i, and the chained CROSS JOINs propagate
      // the emptiness to every later step, so both sides report the
      // same honest coreset size
      s"""$dcur AS (SELECT m.vec_id, m.e, $md AS md
         |          FROM $src m CROSS JOIN $prev c),
         |$pcur AS (SELECT * FROM $dcur WHERE md > 0
         |          ORDER BY md DESC, vec_id LIMIT 1)"""
        .stripMargin
    }.mkString(",\n")
    val sel = (2 to k).map(i =>
      s"UNION ALL SELECT $i, vec_id, round(md, 6) FROM p$i").mkString("\n")
    s"""WITH emb AS ($embSrc),
       |s1 AS (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT 1),
       |$steps
       |SELECT CAST(step AS INT) AS step, CAST(vec_id AS BIGINT) AS vec_id,
       |       CAST(d2_at_selection AS DOUBLE) AS d2_at_selection
       |FROM (SELECT 1 AS step, vec_id, 0.0 AS d2_at_selection FROM s1
       |$sel)""".stripMargin
  }

  private val kcenterOracleSql: String = kcenterOracleSqlFrom(
    """SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |             FROM embeddings""".stripMargin)

  // Greedy k-center coreset selection (Gonzalez 1985; Sener & Savarese
  // 2018) — the coverage leg of the selection suite (MMR = diverse
  // relevance, protoPrune = redundancy, k-center = space coverage).
  q("sim_kcenter", kcenterOracleSql) { (s, d) =>
    Similarity.kCenterSelect(embs(s, d), k = 8)
  }

  /** K-center over a PRESELECTED pool (r11 verdict #5): the
    * [[graft.sim.Similarity.kCenterSelect]] docstring promises
    * "selection runs after an IVF/sample preselection — the standard
    * coreset arrangement", and this entry exercises that arrangement
    * instead of leaving it documented-but-dormant (the state MMR was
    * in at r10). The pool is the deterministic md5-threshold sample
    * ([[graft.pipeline.Sampling.hashSample]], pct=25 — the same
    * preselection the sampled recall audit uses, replayed by the
    * oracle from the same hex digest); the k−1 greedy scans then
    * price the POOL, not the corpus — at 100 TB the corpus appears
    * only in the one map-side filter stage (PLANS.md). The oracle
    * replays preselection + greedy: the unrolled-CTE greedy over the
    * identically-filtered emb source.
    */
  q("sim_kcenter_sampled", kcenterOracleSqlFrom(
    """SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |             FROM embeddings
      |             WHERE CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
      |                     1, 8)) AS UBIGINT) % 100 < 25""".stripMargin)) {
    (s, d) =>
    Similarity.kCenterSelect(
      graft.pipeline.Sampling.hashSample(embs(s, d), "vec_id", 25), k = 8)
  }

  // Prototypicality pruning (Sorscher et al. 2022) over the SAME
  // replayed k-means fit: per cell, prune the <=30% of vectors
  // STRICTLY below the cell's distance cutoff (smallest d2_u whose
  // cumulative count covers the fraction; ties at the cutoff kept).
  // The cutoff derives from a (cell, d2_u) value-grid histogram +
  // grid-sized cumulative window — never a per-vector rank sort.
  q("sim_proto_prune", kmeansOracleSql + """
      |, asg AS (SELECT vec_id, cell,
      |                 CAST(round(round(d2, 6) * 1000000) AS BIGINT)
      |                   AS d2_u
      |          FROM (SELECT vec_id, cell, d2,
      |                       row_number() OVER (PARTITION BY vec_id
      |                                          ORDER BY d2, cell) AS pr
      |                FROM dd2) s WHERE pr = 1),
      |g AS (SELECT cell, d2_u, CAST(count(*) AS BIGINT) AS c
      |      FROM asg GROUP BY 1, 2),
      |cm AS (SELECT cell, d2_u,
      |              sum(c) OVER (PARTITION BY cell ORDER BY d2_u
      |                ROWS UNBOUNDED PRECEDING) AS cum,
      |              sum(c) OVER (PARTITION BY cell) AS n
      |       FROM g),
      |cut AS (SELECT cell, min(d2_u) AS cutoff FROM cm
      |        WHERE cum * 10 >= n * 3 GROUP BY cell)
      |SELECT CAST(vec_id AS BIGINT) AS vec_id,
      |       CAST(asg.cell AS INT) AS cell, d2_u,
      |       CAST(CASE WHEN d2_u < cutoff THEN 1 ELSE 0 END AS INT)
      |         AS pruned
      |FROM asg JOIN cut ON cut.cell = asg.cell""".stripMargin) { (s, d) =>
    Similarity.protoPrune(embs(s, d), k = 8, iters = 2)
  }

  // Symmetric int8 embedding quantization (ANN storage compression):
  // floor(x*127/amax) codes, CSV-serialized for the relational compare.
  q("sim_int8_quant",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |           FROM embeddings),
      |m AS (SELECT vec_id, v,
      |             list_max(list_transform(v, x -> abs(x))) AS amax
      |      FROM e)
      |SELECT CAST(vec_id AS BIGINT) AS vec_id, round(amax, 6) AS amax,
      |       CASE WHEN amax = 0 THEN
      |         array_to_string(list_transform(v, x -> 0), ',')
      |       ELSE
      |         array_to_string(list_transform(v,
      |           x -> CAST(floor(x * 127.0 / amax) AS INT)), ',')
      |       END AS q_codes
      |FROM m""") { (s, d) =>
    Similarity.int8Quantize(embs(s, d))
  }

  /** Hyperplane-LSH top-k reproduced in DuckDB: the ±1 plane grid is
    * generated into the SQL from Similarity.planeSignTable (same
    * splitmix derivation), dot products are sequential folds (bit-equal
    * to the JVM loop), bucket join + exact cosine re-rank identical.
    */
  private val lshOracleSql: String = {
    val (planes, tables, dims, seed) = (12, 4, 64, 42L)
    val maxBucket = 1024 // mirrors lshTopK's default degenerate-bucket cap
    val sigSelects = (0 until tables).map { t =>
      val tblSigns = Similarity.planeSignTable(planes, dims,
        seed + t * 0x51ab61c3L)
      val bits = (0 until planes).map { p =>
        val lst = tblSigns(p).mkString("[", ",", "]")
        s"""(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |  list_transform(range(1, ${dims + 1}), d -> CAST(embedding[CAST(d AS INT)] AS DOUBLE) * $lst[CAST(d AS INT)])),
           |  (a, x) -> a + x) >= 0 THEN ${1 << p} ELSE 0 END)""".stripMargin
      }.mkString(" + ")
      s"SELECT vec_id, embedding, $t AS tbl, ($bits) AS bucket FROM emb"
    }.mkString("\nUNION ALL\n")
    s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
       |sigs AS (
       |$sigSelects),
       |okb AS (
       |  SELECT tbl, bucket FROM sigs GROUP BY tbl, bucket
       |  HAVING count(*) BETWEEN 2 AND $maxBucket),
       |cands AS (
       |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS cand_id
       |  FROM sigs a JOIN sigs b ON a.tbl = b.tbl AND a.bucket = b.bucket
       |   AND a.vec_id <> b.vec_id
       |  JOIN okb ob ON ob.tbl = a.tbl AND ob.bucket = a.bucket),
       |scored AS (
       |  SELECT c.query_id, c.cand_id,
       |         list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                CAST(eb.embedding AS DOUBLE[])) AS cos_raw
       |  FROM cands c
       |  JOIN emb ea ON ea.vec_id = c.query_id
       |  JOIN emb eb ON eb.vec_id = c.cand_id),
       |ranked AS (
       |  SELECT query_id, cand_id, cos_raw,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_raw DESC, cand_id) AS rank
       |  FROM scored)
       |SELECT CAST(query_id AS BIGINT) AS query_id,
       |       CAST(cand_id AS BIGINT) AS cand_id,
       |       round(cos_raw, 6) AS cosine, CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= 5""".stripMargin
  }

  q("sim_lsh_topk", lshOracleSql) { (s, d) =>
    Similarity.lshTopK(embs(s, d), k = 5)
  }

  // Sign (JL) random projection to 16 integer components: exact long
  // arithmetic on the x1e4 element grid with the sign matrix derived
  // from the native splitmix64 sign bit — the oracle rebuilds the same
  // matrix in mod-2^64 HUGEINT SQL and hash-matches every component.
  q("sim_random_projection", {
    import graft.functions.SplitMix64Sql.mixAliases
    """WITH m AS (
      |  SELECT i AS id, CAST(i AS HUGEINT) AS x0,
      |""".stripMargin +
      mixAliases.linesIterator.map("    " + _).mkString("\n") + ",\n" +
      """    CASE WHEN x4 >= CAST('9223372036854775808' AS HUGEINT)
        |         THEN -1 ELSE 1 END AS sgn,
        |    i // 16 + 1 AS j, i % 16 AS k
        |  FROM unnest(generate_series(0, 1023)) AS t(i)),
        |el AS (
        |  SELECT vec_id, i AS j,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000 + 0.5)
        |              AS BIGINT) AS q
        |  FROM embeddings,
        |       unnest(generate_series(1, len(embedding))) AS t(i))
        |SELECT CAST(e.vec_id AS BIGINT) AS vec_id, CAST(m.k AS BIGINT) AS k,
        |       CAST(sum(m.sgn * e.q) AS BIGINT) AS proj_u
        |FROM el e JOIN m ON m.j = e.j
        |GROUP BY 1, 2""".stripMargin
  }) { (s, d) =>
    Similarity.signRandomProjection(embs(s, d), outDims = 16)
  }

  /** Shared WITH-body for the integer power-iteration oracles:
    * grid elements → exact centered covariance (`raw`/`cv`) → chained
    * (w, max, v) CTE trio per round ending at `v<iters>`.
    */
  private def pcaOracleCtes(iters: Int): String = {
    val sb = new StringBuilder(
      """WITH el AS (
        |  SELECT vec_id, i AS j,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000 + 0.5)
        |              AS BIGINT) AS q
        |  FROM embeddings,
        |       unnest(generate_series(1, len(embedding))) AS t(i)),
        |up AS (
        |  SELECT a.j AS i, b.j AS j, CAST(sum(a.q * b.q) AS HUGEINT) AS sqq
        |  FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.j <= b.j
        |  GROUP BY 1, 2),
        |fullm AS (
        |  SELECT i, j, sqq FROM up
        |  UNION ALL
        |  SELECT j, i, sqq FROM up WHERE i <> j),
        |sums AS (SELECT j, CAST(sum(q) AS HUGEINT) AS sq FROM el GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
        |raw AS (
        |  SELECT f.i, f.j, n * sqq - si.sq * sj.sq AS s
        |  FROM fullm f JOIN sums si ON si.j = f.i
        |              JOIN sums sj ON sj.j = f.j, nn),
        |mx AS (SELECT max(abs(s)) AS m FROM raw),
        |cv AS (
        |  SELECT i, j,
        |         CASE WHEN s < 0
        |              THEN -CAST(abs(s * 1000000) // m AS BIGINT)
        |              ELSE CAST(abs(s * 1000000) // m AS BIGINT) END AS c
        |  FROM raw, mx),
        |v0 AS (SELECT DISTINCT i AS j, CAST(1000000 AS BIGINT) AS v
        |       FROM cv)""".stripMargin)
    for (t <- 1 to iters) {
      sb.append(s""",
        |w$t AS (SELECT cv.i, CAST(sum(c * v) AS BIGINT) AS w
        |        FROM cv JOIN v${t - 1} vv ON cv.j = vv.j GROUP BY 1),
        |m$t AS (SELECT max(abs(w)) AS mw FROM w$t),
        |v$t AS (SELECT i AS j,
        |              CASE WHEN w < 0
        |                   THEN -CAST(abs(CAST(w AS HUGEINT) * 1000000)
        |                              // CAST(mw AS HUGEINT) AS BIGINT)
        |                   ELSE CAST(abs(CAST(w AS HUGEINT) * 1000000)
        |                             // CAST(mw AS HUGEINT) AS BIGINT)
        |              END AS v
        |        FROM w$t, m$t)""".stripMargin)
    }
    sb.toString
  }

  // Top principal component by exact integer power iteration (3
  // rounds): ×1e4 grid elements, DECIMAL/HUGEINT-exact centered
  // covariance, ±1e6 truncating rescale with the sign split so
  // Spark `div` and DuckDB `//` agree on negatives, HITS-style
  // max-norm per round. The oracle chains one (w, max, v) CTE trio
  // per iteration over the same 64×64 integer matrix.
  q("sim_pca_top1",
    pcaOracleCtes(3) + s"""
      |SELECT CAST(j AS BIGINT) AS dim, v AS v_u FROM v3""".stripMargin
  ) { (s, d) =>
    Similarity.pcaTop1(embs(s, d), iters = 3, dims = 64)
  }

  // Variance-explained share of that top component: the anisotropy
  // audit (Ethayarajh 2019 — "is one axis eating the space"). Exact
  // two-step floor division keeps every product inside DECIMAL(38,0)/
  // HUGEINT: lambda1_est = vᵀSv div |v|² (the Rayleigh numerator per
  // unit v), share_ppm = lambda1_est·10⁶ div tr(S). All inputs are
  // the checkpointed 64×64 covariance and the 64-row eigenvector.
  q("sim_anisotropy",
    pcaOracleCtes(3) + s"""
      |, vsv AS (
      |  SELECT CAST(sum(CAST(va.v AS HUGEINT) * r.s * vb.v) AS HUGEINT)
      |           AS num
      |  FROM raw r JOIN v3 va ON va.j = r.i JOIN v3 vb ON vb.j = r.j),
      |nrm AS (SELECT CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS n2
      |        FROM v3),
      |tr AS (SELECT CAST(sum(s) AS HUGEINT) AS trace FROM raw WHERE i = j),
      |l1 AS (SELECT CASE WHEN num < 0 THEN -(abs(num) // n2)
      |                   ELSE num // n2 END AS lam FROM vsv, nrm)
      |SELECT CAST(lam AS BIGINT) AS lambda1_est,
      |       CAST(trace AS BIGINT) AS trace_s,
      |       CAST(CASE WHEN lam < 0 THEN -(abs(lam * 1000000) // trace)
      |                 ELSE lam * 1000000 // trace END AS BIGINT)
      |         AS share_ppm
      |FROM l1, tr""".stripMargin
  ) { (s, d) =>
    Similarity.anisotropy(embs(s, d), iters = 3, dims = 64)
  }

  /** IVF top-k reproduced in DuckDB: the deterministic hash-sampled
    * coarse quantizer ([[Similarity.hashSampledQuantizer]] — centers =
    * the 16 vectors with smallest md5(vec_id), cell id = md5 rank) lets
    * the oracle re-derive the centers FROM THE TABLE ITSELF, then replay
    * assignment (sequential squared-L2 fold, tie-break by cell id),
    * nprobe probing, and the exact cosine re-rank. The k-means
    * quantizer path ([[Similarity.fitQuantizer]]) keeps its recall spec.
    */
  private val ivfOracleSql: String = {
    val (nlist, nprobe, k, dims) = (16, 4, 5, 64)
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |            FROM embeddings),
       |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
       |         FROM emb ORDER BY h LIMIT $nlist),
       |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
       |        FROM ctr0),
       |dst AS (
       |  SELECT v.vec_id, v.e, c.cell,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, ${dims + 1}), i ->
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
       |           (a, x) -> a + x) AS d2
       |  FROM emb v CROSS JOIN ctr c),
       |rankd AS (
       |  SELECT vec_id, e, cell,
       |         row_number() OVER (PARTITION BY vec_id
       |                            ORDER BY d2, cell) AS pr
       |  FROM dst),
       |cands AS (
       |  SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS cand_id
       |  FROM (SELECT vec_id, cell FROM rankd WHERE pr <= $nprobe) q
       |  JOIN (SELECT vec_id, cell FROM rankd WHERE pr = 1) a
       |    ON a.cell = q.cell AND a.vec_id <> q.vec_id),
       |scored AS (
       |  SELECT c.query_id, c.cand_id,
       |         list_cosine_similarity(ea.e, eb.e) AS cos_raw
       |  FROM cands c
       |  JOIN emb ea ON ea.vec_id = c.query_id
       |  JOIN emb eb ON eb.vec_id = c.cand_id),
       |ranked AS (
       |  SELECT query_id, cand_id, cos_raw,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_raw DESC, cand_id) AS rank
       |  FROM scored)
       |SELECT CAST(query_id AS BIGINT) AS query_id,
       |       CAST(cand_id AS BIGINT) AS cand_id,
       |       round(cos_raw, 6) AS cosine, CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= $k""".stripMargin
  }

  q("sim_ivf_topk", ivfOracleSql) { (s, d) =>
    val e = embs(s, d)
    Similarity.ivfTopK(Similarity.hashSampledQuantizer(e, nlist = 16),
      e, k = 5, nprobe = 4)
  }

  /** Recall@5 audit of the IVF path against the exact brute-force
    * answer, over the same guarded query subset the brute entry uses —
    * the honest ANN quality metric that belongs next to the speed
    * numbers. Output is the OVERLAP HISTOGRAM (n_hits 0..5 →
    * n_queries), all integers; the oracle recomputes both sides (full
    * IVF replay + exact top-5) and must land on the identical
    * histogram, so a recall regression in probing, assignment or
    * tie-breaking shifts a bucket and fails the hash.
    */
  /** The full IVF-vs-brute overlap CTE chain (through `ov`: one row
    * per query with its brute∩IVF hit count) for a given nprobe —
    * shared by the recall histogram and the nprobe tuning curve.
    */
  private def ivfOverlapCtes(nprobe: Int): String = {
    val (nlist, k, dims, nq) = (16, 5, 64, 20)
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |            FROM embeddings),
       |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
       |         FROM emb ORDER BY h LIMIT $nlist),
       |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
       |        FROM ctr0),
       |dst AS (
       |  SELECT v.vec_id, v.e, c.cell,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, ${dims + 1}), i ->
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
       |           (a, x) -> a + x) AS d2
       |  FROM emb v CROSS JOIN ctr c),
       |rankd AS (
       |  SELECT vec_id, e, cell,
       |         row_number() OVER (PARTITION BY vec_id
       |                            ORDER BY d2, cell) AS pr
       |  FROM dst),
       |cands AS (
       |  SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS cand_id
       |  FROM (SELECT vec_id, cell FROM rankd
       |        WHERE pr <= $nprobe AND vec_id < $nq) q
       |  JOIN (SELECT vec_id, cell FROM rankd WHERE pr = 1) a
       |    ON a.cell = q.cell AND a.vec_id <> q.vec_id),
       |iscored AS (
       |  SELECT c.query_id, c.cand_id,
       |         list_cosine_similarity(ea.e, eb.e) AS cos_raw
       |  FROM cands c
       |  JOIN emb ea ON ea.vec_id = c.query_id
       |  JOIN emb eb ON eb.vec_id = c.cand_id),
       |ivf AS (
       |  SELECT query_id, cand_id
       |  FROM (SELECT query_id, cand_id,
       |          row_number() OVER (PARTITION BY query_id
       |                             ORDER BY cos_raw DESC, cand_id) AS rank
       |        FROM iscored)
       |  WHERE rank <= $k),
       |bscored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |         list_cosine_similarity(q2.e, c2.e) AS cos_raw
       |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |  JOIN emb q2 ON q2.vec_id = q.vec_id
       |  JOIN emb c2 ON c2.vec_id = c.vec_id
       |  WHERE q.vec_id < $nq),
       |brute AS (
       |  SELECT query_id, cand_id
       |  FROM (SELECT query_id, cand_id,
       |          row_number() OVER (PARTITION BY query_id
       |                             ORDER BY cos_raw DESC, cand_id) AS rank
       |        FROM bscored)
       |  WHERE rank <= $k),
       |ov AS (
       |  SELECT b.query_id, count(i.cand_id) AS n_hits
       |  FROM brute b
       |  LEFT JOIN ivf i ON i.query_id = b.query_id
       |                 AND i.cand_id = b.cand_id
       |  GROUP BY b.query_id)""".stripMargin
  }

  private val ivfRecallOracleSql: String =
    s"""${ivfOverlapCtes(4)}
       |SELECT CAST(n_hits AS INT) AS n_hits,
       |       CAST(count(*) AS BIGINT) AS n_queries
       |FROM ov GROUP BY 1""".stripMargin

  q("sim_ivf_recall", ivfRecallOracleSql) { (s, d) =>
    val e = embs(s, d)
    val ivf = Similarity.ivfTopK(
        Similarity.hashSampledQuantizer(e, nlist = 16), e, k = 5, nprobe = 4)
      .filter(col("query_id") < 20)
      .select(col("query_id"), col("cand_id"), lit(1).as("hit"))
    val brute = Similarity.bruteForceTopK(e.filter(col("vec_id") < 20),
        e, k = 5)
      .select("query_id", "cand_id")
    brute.join(ivf, Seq("query_id", "cand_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0))).cast("int").as("n_hits"))
      .groupBy("n_hits").agg(count(lit(1)).as("n_queries"))
  }

  /** Matryoshka truncation audit: overlap histogram between exact
    * top-5 on full 64-dim vectors and on the first-16-dim prefix —
    * see Similarity.truncationRecall. The oracle replays both brute
    * sides with list_cosine_similarity over the full and sliced
    * lists and must land on the identical integer histogram.
    */
  q("sim_trunc_recall", {
    val (pfx, k, nq) = (16, 5, 20)
    def side(src: String, name: String) =
      s"""${name}sc AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |         list_cosine_similarity(q.e, c.e) AS cos_raw
         |  FROM $src q JOIN $src c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < $nq),
         |$name AS (
         |  SELECT query_id, cand_id
         |  FROM (SELECT query_id, cand_id,
         |          row_number() OVER (PARTITION BY query_id
         |                             ORDER BY cos_raw DESC, cand_id) AS rank
         |        FROM ${name}sc)
         |  WHERE rank <= $k)""".stripMargin
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |            FROM embeddings),
       |trc AS (SELECT vec_id, list_slice(e, 1, $pfx) AS e FROM emb),
       |${side("emb", "fl")},
       |${side("trc", "tr")},
       |ov AS (
       |  SELECT f.query_id, count(t.cand_id) AS n_hits
       |  FROM fl f
       |  LEFT JOIN tr t ON t.query_id = f.query_id
       |                AND t.cand_id = f.cand_id
       |  GROUP BY 1)
       |SELECT CAST(n_hits AS INT) AS n_hits,
       |       CAST(count(*) AS BIGINT) AS n_queries
       |FROM ov GROUP BY 1""".stripMargin
  }) { (s, d) =>
    Similarity.truncationRecall(embs(s, d), prefixDims = 16, k = 5,
      nQueries = 20)
  }

  /** IVF nprobe tuning curve: exact recall@5 vs the probe budget
    * (nprobe ∈ {1, 2, 4, 8}) against the brute-force ground truth —
    * the measurement that picks the recall/latency operating point
    * BEFORE the index ships (every real ANN deployment tunes this;
    * publishing the curve next to the speed numbers is the honest
    * form). The brute side computes ONCE (persisted) and each arm is
    * the existing bounded ivfTopK probe; the oracle replays all four
    * arms as UNION ALL'd subquery chains generated from ONE builder
    * (the per-arm `ov` chain shared with sim_ivf_recall, so the two
    * cannot drift). Integer recall_ppm = Σhits·10⁶ div (queries·k).
    */
  q("sim_ivf_probe_curve", {
    val arms = Seq(1, 2, 4, 8).map { p =>
      s"""SELECT * FROM (
         |${ivfOverlapCtes(p)}
         |SELECT $p AS nprobe, CAST(count(*) AS BIGINT) AS n_queries,
         |       CAST(sum(n_hits) AS BIGINT) AS sum_hits
         |FROM ov)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT CAST(nprobe AS INT) AS nprobe, n_queries, sum_hits,
       |       CAST(sum_hits * 1000000 // (n_queries * 5) AS BIGINT)
       |         AS recall_ppm
       |FROM ($arms)""".stripMargin
  }) { (s, d) =>
    val e = embs(s, d)
    val quant = Similarity.hashSampledQuantizer(e, nlist = 16)
    val brute = Similarity.bruteForceTopK(e.filter(col("vec_id") < 20),
        e, k = 5)
      .select("query_id", "cand_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val arms = Seq(1, 2, 4, 8).map { p =>
      val ivf = Similarity.ivfTopK(quant, e, k = 5, nprobe = p)
        .filter(col("query_id") < 20)
        .select(col("query_id"), col("cand_id"), lit(1L).as("hit"))
      brute.join(ivf, Seq("query_id", "cand_id"), "left")
        .groupBy("query_id")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .agg(count(lit(1)).as("n_queries"), sum("n_hits").as("sum_hits"))
        .select(lit(p).as("nprobe"), col("n_queries"), col("sum_hits"))
    }
    // 4-row result checkpointed eagerly, brute cache released — a lazy
    // return would leak the persist for the session (r9 advisory)
    val out = arms.reduce(_.unionAll(_))
      .select(col("nprobe"), col("n_queries"), col("sum_hits"),
        expr("sum_hits * 1000000L div (n_queries * 5)").as("recall_ppm"))
      .localCheckpoint(true)
    brute.unpersist(false)
    out
  }

  /** Auto-nprobe knee pick (r9 verdict #8 stretch): turn the measured
    * probe curve into the DEFAULT operating point —
    * [[graft.sim.Similarity.autoNprobe]] picks the smallest nprobe
    * within 20 000 ppm (2%) recall of the best measured arm. The curve
    * collect is 4 rows (model-sized); the pick itself is the exercised
    * library API, and the oracle re-derives the identical choice from
    * the same UNION ALL'd arm chains with a SQL min-over-slack filter
    * — so an off-by-one in the knee rule on either side hash-fails.
    * Trade documented in SCALE.md (IVF cost is linear in nprobe,
    * recall saturates past the knee).
    */
  q("sim_auto_nprobe", {
    val arms = Seq(1, 2, 4, 8).map { p =>
      s"""SELECT * FROM (
         |${ivfOverlapCtes(p)}
         |SELECT $p AS nprobe, CAST(count(*) AS BIGINT) AS n_queries,
         |       CAST(sum(n_hits) AS BIGINT) AS sum_hits
         |FROM ov)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH curve AS (
       |  SELECT CAST(nprobe AS INT) AS nprobe,
       |         CAST(sum_hits * 1000000 // (n_queries * 5) AS BIGINT)
       |           AS recall_ppm
       |  FROM ($arms))
       |SELECT CAST(c.nprobe AS INT) AS chosen_nprobe,
       |       c.recall_ppm AS chosen_recall_ppm,
       |       b.best_recall_ppm
       |FROM curve c,
       |     (SELECT max(recall_ppm) AS best_recall_ppm FROM curve) b
       |WHERE c.recall_ppm >= b.best_recall_ppm - 20000
       |ORDER BY c.nprobe LIMIT 1""".stripMargin
  }) { (s, d) =>
    import s.implicits._
    val e = embs(s, d)
    val quant = Similarity.hashSampledQuantizer(e, nlist = 16)
    val brute = Similarity.bruteForceTopK(e.filter(col("vec_id") < 20),
        e, k = 5)
      .select("query_id", "cand_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val curve: Seq[(Int, Long)] = Seq(1, 2, 4, 8).map { p =>
      val ivf = Similarity.ivfTopK(quant, e, k = 5, nprobe = p)
        .filter(col("query_id") < 20)
        .select(col("query_id"), col("cand_id"), lit(1L).as("hit"))
      val r = brute.join(ivf, Seq("query_id", "cand_id"), "left")
        .groupBy("query_id")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .agg(count(lit(1)).as("n_queries"), sum("n_hits").as("sum_hits"))
        .select(expr("sum_hits * 1000000L div (n_queries * 5)"))
        .collect()(0).getLong(0)
      p -> r
    }
    brute.unpersist(false)
    val chosen = Similarity.autoNprobe(curve)
    val best = curve.map(_._2).max
    Seq((chosen, curve.toMap.apply(chosen), best))
      .toDF("chosen_nprobe", "chosen_recall_ppm", "best_recall_ppm")
  }

  /** MMR diversified top-3 over the 8-candidate pool — see
    * [[graft.sim.Similarity.mmrTopK]]. The oracle replays the FULL
    * greedy: pool by exact cosine rank, then two chained
    * select-score-argmax CTE steps (λ=0.5, ties by cand_id) with the
    * candidate-candidate cosines recomputed by list_cosine_similarity
    * — bit-equal to the fused native expression, so a greedy-order or
    * tie-break regression on either side hash-fails.
    */
  /** The chained greedy-MMR CTE replay (two select-score-argmax steps
    * after the rel-top seed; λ=0.5, ties by cand_id) over ANY `pool`
    * CTE with columns (query_id, cand_id, rel, ec) — ONE builder
    * shared by the brute-pool (`sim_mmr_topk`) and IVF-pool
    * (`sim_mmr_ivf`) oracles, so the greedy replay cannot drift
    * between them. `poolCtes` must open the WITH clause and define
    * `pool` as its last CTE.
    */
  private def mmrGreedySql(poolCtes: String): String =
    s"""$poolCtes,
      |s1 AS (SELECT query_id, cand_id, rel, ec FROM (
      |         SELECT *, row_number() OVER (PARTITION BY query_id
      |                     ORDER BY rel DESC, cand_id) AS rk FROM pool) t
      |       WHERE rk = 1),
      |r2 AS (SELECT p.* FROM pool p
      |       WHERE NOT EXISTS (SELECT 1 FROM s1
      |                         WHERE s1.query_id = p.query_id
      |                           AND s1.cand_id = p.cand_id)),
      |ms2 AS (SELECT r.query_id, r.cand_id,
      |               max(list_cosine_similarity(r.ec, s.ec)) AS maxsim
      |        FROM r2 r JOIN s1 s ON s.query_id = r.query_id
      |        GROUP BY 1, 2),
      |s2 AS (SELECT query_id, cand_id, rel, ec FROM (
      |         SELECT p.query_id, p.cand_id, p.rel, p.ec,
      |                row_number() OVER (PARTITION BY p.query_id
      |                  ORDER BY 0.5 * p.rel - 0.5 * m.maxsim DESC,
      |                           p.cand_id) AS rk
      |         FROM pool p JOIN ms2 m ON m.query_id = p.query_id
      |                                AND m.cand_id = p.cand_id) t
      |       WHERE rk = 1),
      |sel2 AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2),
      |r3 AS (SELECT p.* FROM pool p
      |       WHERE NOT EXISTS (SELECT 1 FROM sel2
      |                         WHERE sel2.query_id = p.query_id
      |                           AND sel2.cand_id = p.cand_id)),
      |ms3 AS (SELECT r.query_id, r.cand_id,
      |               max(list_cosine_similarity(r.ec, s.ec)) AS maxsim
      |        FROM r3 r JOIN sel2 s ON s.query_id = r.query_id
      |        GROUP BY 1, 2),
      |s3 AS (SELECT query_id, cand_id, rel, ec FROM (
      |         SELECT p.query_id, p.cand_id, p.rel, p.ec,
      |                row_number() OVER (PARTITION BY p.query_id
      |                  ORDER BY 0.5 * p.rel - 0.5 * m.maxsim DESC,
      |                           p.cand_id) AS rk
      |         FROM pool p JOIN ms3 m ON m.query_id = p.query_id
      |                                AND m.cand_id = p.cand_id) t
      |       WHERE rk = 1)
      |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(1 AS INT) AS rank,
      |       CAST(cand_id AS BIGINT) AS cand_id, round(rel, 6) AS rel
      |FROM s1
      |UNION ALL
      |SELECT CAST(query_id AS BIGINT), CAST(2 AS INT),
      |       CAST(cand_id AS BIGINT), round(rel, 6) FROM s2
      |UNION ALL
      |SELECT CAST(query_id AS BIGINT), CAST(3 AS INT),
      |       CAST(cand_id AS BIGINT), round(rel, 6) FROM s3""".stripMargin

  q("sim_mmr_topk", mmrGreedySql(
    """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |            FROM embeddings),
      |q AS (SELECT vec_id AS query_id, e AS eq FROM emb WHERE vec_id < 10),
      |pool0 AS (
      |  SELECT q.query_id, c.vec_id AS cand_id,
      |         list_cosine_similarity(q.eq, c.e) AS rel, c.e AS ec,
      |         row_number() OVER (PARTITION BY q.query_id
      |           ORDER BY list_cosine_similarity(q.eq, c.e) DESC,
      |                    c.vec_id) AS rk
      |  FROM q JOIN emb c ON c.vec_id <> q.query_id),
      |pool AS (SELECT query_id, cand_id, rel, ec FROM pool0 WHERE rk <= 8)"""
      .stripMargin)) { (s, d) =>
    Similarity.mmrTopK(embs(s, d), k = 3, poolSize = 8, nQueries = 10)
  }

  /** MMR over the IVF-FED pool (r10 verdict #3 — the at-scale path
    * exercised, not just documented): candidate generation replays
    * [[graft.sim.Similarity.ivfTopK]] exactly (hash-sampled centers,
    * sequential squared-L2 assignment, nprobe=4 probing, raw-cosine
    * top-`poolSize` per query — the sim_ivf_topk CTE chain), then the
    * SAME chained greedy CTEs as `sim_mmr_topk` run over that pool —
    * one shared [[mmrGreedySql]] builder, so the two entries' greedy
    * replays cannot diverge. The corpus-sized stage on the Spark side
    * is the bucketed inverted-list join; the greedy is
    * poolSize-bounded (PLANS.md evidence).
    */
  q("sim_mmr_ivf", mmrGreedySql(
    """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |            FROM embeddings),
      |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
      |         FROM emb ORDER BY h LIMIT 16),
      |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
      |        FROM ctr0),
      |dst AS (
      |  SELECT v.vec_id, v.e, c.cell,
      |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(1, 65), i ->
      |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
      |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
      |           (a, x) -> a + x) AS d2
      |  FROM emb v CROSS JOIN ctr c),
      |rankd AS (
      |  SELECT vec_id, e, cell,
      |         row_number() OVER (PARTITION BY vec_id
      |                            ORDER BY d2, cell) AS pr
      |  FROM dst),
      |cands AS (
      |  SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS cand_id
      |  FROM (SELECT vec_id, cell FROM rankd WHERE pr <= 4) q
      |  JOIN (SELECT vec_id, cell FROM rankd WHERE pr = 1) a
      |    ON a.cell = q.cell AND a.vec_id <> q.vec_id),
      |scored AS (
      |  SELECT c.query_id, c.cand_id,
      |         list_cosine_similarity(ea.e, eb.e) AS rel, eb.e AS ec
      |  FROM cands c
      |  JOIN emb ea ON ea.vec_id = c.query_id
      |  JOIN emb eb ON eb.vec_id = c.cand_id
      |  WHERE c.query_id < 10),
      |ranked AS (
      |  SELECT query_id, cand_id, rel, ec,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY rel DESC, cand_id) AS rk
      |  FROM scored),
      |pool AS (SELECT query_id, cand_id, rel, ec FROM ranked WHERE rk <= 8)"""
      .stripMargin)) { (s, d) =>
    val e = embs(s, d)
    Similarity.mmrTopKIvf(Similarity.hashSampledQuantizer(e, nlist = 16),
      e, k = 3, poolSize = 8, nQueries = 10, nprobe = 4)
  }

  /** PQ/ADC top-k reproduced in DuckDB: codebook centroids re-derived
    * from the table (sub-slices of the ksub smallest-md5 vectors — the
    * same hash-sampling as the IVF oracle), per-subspace nearest-code
    * assignment (sequential squared-L2 fold, ties to the smaller code),
    * then the asymmetric distance as the identical two-level fold:
    * dims ascending within a subspace, subspaces ascending across.
    */
  private val pqOracleSql: String = {
    val (m, ksub, dsub, k) = (8, 16, 8, 5)
    def subD2(vec: String, s: String) =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(1, ${dsub + 1}), i ->
         |        ($vec.e[CAST($s * $dsub + i AS INT)] - c.ce[CAST($s * $dsub + i AS INT)]) *
         |        ($vec.e[CAST($s * $dsub + i AS INT)] - c.ce[CAST($s * $dsub + i AS INT)]))),
         |      (a, x) -> a + x)""".stripMargin
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |            FROM embeddings),
       |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
       |         FROM emb ORDER BY h LIMIT $ksub),
       |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS c, e AS ce
       |        FROM ctr0),
       |asg AS (
       |  SELECT v.vec_id, s.s, c.c,
       |    ${subD2("v", "s.s")} AS d2
       |  FROM emb v
       |  CROSS JOIN unnest(generate_series(0, ${m - 1})) AS s(s)
       |  CROSS JOIN ctr c),
       |codes AS (
       |  SELECT vec_id, s, c AS code
       |  FROM (SELECT vec_id, s, c,
       |          row_number() OVER (PARTITION BY vec_id, s
       |                             ORDER BY d2, c) AS r
       |        FROM asg) WHERE r = 1),
       |terms AS (
       |  SELECT q.vec_id AS query_id, cd.vec_id AS cand_id, cd.s,
       |    ${subD2("q", "cd.s")} AS d2
       |  FROM (SELECT * FROM emb WHERE vec_id < 20) q
       |  JOIN codes cd ON cd.vec_id <> q.vec_id
       |  JOIN ctr c ON c.c = cd.code),
       |adc AS (
       |  SELECT query_id, cand_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(d2 ORDER BY s)),
       |      (a, x) -> a + x) AS dist
       |  FROM terms GROUP BY query_id, cand_id),
       |ranked AS (
       |  SELECT query_id, cand_id, dist,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY dist, cand_id) AS rank
       |  FROM adc)
       |SELECT CAST(query_id AS BIGINT) AS query_id,
       |       CAST(cand_id AS BIGINT) AS cand_id,
       |       round(dist, 6) AS adc_dist, CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= $k""".stripMargin
  }

  q("sim_pq_adc", pqOracleSql) { (s, d) =>
    val e = embs(s, d)
    val cb = Similarity.hashSampledPqCodebook(e, m = 8, ksub = 16)
    Similarity.pqAdcTopK(cb, e.filter(col("vec_id") < 20), e, k = 5)
  }

  // PQ distortion audit over the SAME replayed codebook: per subspace,
  // mean/max squared error to the assigned codeword — the under-fitted-
  // subspace readout (Jégou et al. 2011). The oracle reuses the
  // assignment CTEs and keeps the r=1 row's d2.
  q("sim_pq_distortion",
    """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |            FROM embeddings),
      |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
      |         FROM emb ORDER BY h LIMIT 16),
      |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS c, e AS ce
      |        FROM ctr0),
      |asg AS (
      |  SELECT v.vec_id, s.s, c.c,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(1, 9), i ->
      |        (v.e[CAST(s.s * 8 + i AS INT)] - c.ce[CAST(s.s * 8 + i AS INT)]) *
      |        (v.e[CAST(s.s * 8 + i AS INT)] - c.ce[CAST(s.s * 8 + i AS INT)]))),
      |      (a, x) -> a + x) AS d2
      |  FROM emb v
      |  CROSS JOIN unnest(generate_series(0, 7)) AS s(s)
      |  CROSS JOIN ctr c),
      |best AS (SELECT vec_id, s, d2 FROM (
      |    SELECT vec_id, s, d2,
      |           row_number() OVER (PARTITION BY vec_id, s
      |                              ORDER BY d2, c) AS r
      |    FROM asg) t WHERE r = 1)
      |SELECT CAST(s AS INT) AS s, CAST(count(*) AS BIGINT) AS n_vecs,
      |       round(avg(d2), 6) AS mean_d2, round(max(d2), 6) AS max_d2
      |FROM best GROUP BY s""") { (s, d) =>
    val e = embs(s, d)
    Similarity.pqDistortion(
      Similarity.hashSampledPqCodebook(e, m = 8, ksub = 16), e)
  }

  /** IVF-PQ top-k reproduced in DuckDB: both quantizers re-derived from
    * the table (the 16 smallest-md5 vectors serve as IVF centers AND,
    * sub-sliced, as the PQ codebook — the same hash-sampling the
    * sim_ivf_topk / sim_pq_adc oracles replay), then cell assignment,
    * nprobe probing, per-subspace code assignment, and the ADC
    * distance as the identical two-level sequential fold.
    */
  private val ivfpqOracleSql: String = {
    val (nlist, nprobe, m, dsub, k, dims) = (16, 4, 8, 8, 5, 64)
    def subD2(vec: String, s: String) =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(1, ${dsub + 1}), i ->
         |        ($vec.e[CAST($s * $dsub + i AS INT)] - c.ce[CAST($s * $dsub + i AS INT)]) *
         |        ($vec.e[CAST($s * $dsub + i AS INT)] - c.ce[CAST($s * $dsub + i AS INT)]))),
         |      (a, x) -> a + x)""".stripMargin
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |            FROM embeddings),
       |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
       |         FROM emb ORDER BY h LIMIT $nlist),
       |ivfc AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS cc
       |         FROM ctr0),
       |pqc AS (SELECT row_number() OVER (ORDER BY h) - 1 AS c, e AS ce
       |        FROM ctr0),
       |dst AS (
       |  SELECT v.vec_id, v.e, c.cell,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, ${dims + 1}), i ->
       |             (v.e[CAST(i AS INT)] - c.cc[CAST(i AS INT)]) *
       |             (v.e[CAST(i AS INT)] - c.cc[CAST(i AS INT)]))),
       |           (a, x) -> a + x) AS d2
       |  FROM emb v CROSS JOIN ivfc c),
       |rankd AS (
       |  SELECT vec_id, cell,
       |         row_number() OVER (PARTITION BY vec_id
       |                            ORDER BY d2, cell) AS pr
       |  FROM dst),
       |asg AS (
       |  SELECT v.vec_id, s.s, c.c,
       |    ${subD2("v", "s.s")} AS d2
       |  FROM emb v
       |  CROSS JOIN unnest(generate_series(0, ${m - 1})) AS s(s)
       |  CROSS JOIN pqc c),
       |codes AS (
       |  SELECT vec_id, s, c AS code
       |  FROM (SELECT vec_id, s, c,
       |          row_number() OVER (PARTITION BY vec_id, s
       |                             ORDER BY d2, c) AS r
       |        FROM asg) WHERE r = 1),
       |cands AS (
       |  SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS cand_id
       |  FROM (SELECT vec_id, cell FROM rankd
       |        WHERE pr <= $nprobe AND vec_id < 20) q
       |  JOIN (SELECT vec_id, cell FROM rankd WHERE pr = 1) a
       |    ON a.cell = q.cell AND a.vec_id <> q.vec_id),
       |terms AS (
       |  SELECT cn.query_id, cn.cand_id, cd.s,
       |    ${subD2("q", "cd.s")} AS d2
       |  FROM cands cn
       |  JOIN emb q ON q.vec_id = cn.query_id
       |  JOIN codes cd ON cd.vec_id = cn.cand_id
       |  JOIN pqc c ON c.c = cd.code),
       |adc AS (
       |  SELECT query_id, cand_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(d2 ORDER BY s)),
       |      (a, x) -> a + x) AS dist
       |  FROM terms GROUP BY query_id, cand_id),
       |ranked AS (
       |  SELECT query_id, cand_id, dist,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY dist, cand_id) AS rank
       |  FROM adc)
       |SELECT CAST(query_id AS BIGINT) AS query_id,
       |       CAST(cand_id AS BIGINT) AS cand_id,
       |       round(dist, 6) AS adc_dist, CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= $k""".stripMargin
  }

  q("sim_ivfpq_topk", ivfpqOracleSql) { (s, d) =>
    val e = embs(s, d)
    val quant = Similarity.hashSampledQuantizer(e, nlist = 16)
    val cb = Similarity.hashSampledPqCodebook(e, m = 8, ksub = 16)
    Similarity.ivfPqTopK(quant, cb, e.filter(col("vec_id") < 20), e,
      k = 5, nprobe = 4)
  }

  // Reproducible hash split: identical buckets on both engines from the
  // same md5 digest — training-data splits must not depend on engine or
  // partitioning.
  q("t_hash_split",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |            AS UBIGINT) % 100 AS INT) AS bucket,
      |       CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |            AS UBIGINT) % 100 < 80 THEN 'train' ELSE 'test' END AS split
      |FROM documents""") { (s, d) =>
    Sampling.hashSplit(docs(s, d), "doc_id", trainPct = 80)
      .select("doc_id", "bucket", "split")
  }

  // Split-leakage audit: the md5 train/test split screened for shared
  // 8-grams ACROSS the split boundary — the "did my test set leak into
  // training?" gate every supervised pipeline should run after
  // splitting. Composes the hash split (bench := test slice) with the
  // decontamination machinery; one summary row, all integers.
  q("t_split_leakage",
    """WITH w AS (SELECT doc_id,
      |             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |               AS UBIGINT) % 100 >= 80 AS is_test,
      |             string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id, is_test,
      |             md5(array_to_string(ws[i:i+7], ' ')) AS h
      |      FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(i)
      |      WHERE len(ws) >= 8),
      |th AS (SELECT DISTINCT h FROM g WHERE is_test),
      |leaky AS (SELECT DISTINCT g.doc_id
      |          FROM g JOIN th USING (h) WHERE NOT is_test)
      |SELECT CAST(sum(CASE WHEN is_test THEN 0 ELSE 1 END) AS BIGINT)
      |         AS n_train,
      |       CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_test,
      |       CAST((SELECT count(*) FROM leaky) AS BIGINT) AS n_leaky_train,
      |       CAST((SELECT count(*) FROM leaky) * 1000000 //
      |         sum(CASE WHEN is_test THEN 0 ELSE 1 END) AS BIGINT)
      |         AS leak_ppm
      |FROM w""") { (s, d) =>
    val isTest = Sampling.hashBucket("doc_id") >= lit(80)
    val per = Dedup.decontaminate(docs(s, d), isTest, n = 8)
    val leaks = per.agg(
      sum(col("contaminated").cast("long")).as("n_leaky_train"))
    docs(s, d).select(isTest.as("is_test"))
      .agg(sum(when(!col("is_test"), 1L).otherwise(0L)).as("n_train"),
        sum(when(col("is_test"), 1L).otherwise(0L)).as("n_test"))
      .crossJoin(broadcast(leaks))
      .select(col("n_train"), col("n_test"), col("n_leaky_train"),
        expr("n_leaky_train * 1000000 div n_train").as("leak_ppm"))
  }

  // Snapshot diff (CDC audit): two simulated corpus versions — prev is
  // missing doc_id % 11 == 3 (-> added), cur is missing % 13 == 5
  // (-> removed), and % 17 == 0 rows had different text (-> changed).
  // ids + md5 digests shuffle, never two copies of the text.
  q("t_snapshot_diff",
    """WITH prev AS (
      |  SELECT doc_id, CASE WHEN doc_id % 17 = 0 THEN reverse(text)
      |                      ELSE text END AS text
      |  FROM documents WHERE doc_id % 11 <> 3),
      |cur AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 <> 5),
      |j AS (SELECT coalesce(p.doc_id, c.doc_id) AS doc_id,
      |             md5(p.text) AS p_h, md5(c.text) AS c_h
      |      FROM prev p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CASE WHEN p_h IS NULL THEN 'added'
      |            WHEN c_h IS NULL THEN 'removed'
      |            WHEN p_h <> c_h THEN 'changed' END AS status
      |FROM j
      |WHERE p_h IS NULL OR c_h IS NULL OR p_h <> c_h""") { (s, d) =>
    val base = docs(s, d)
    val prev = base.filter(col("doc_id") % 11 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 17 === 0, reverse(col("text")))
          .otherwise(col("text")).as("text"))
    val cur = base.filter(col("doc_id") % 13 =!= 5)
    Snapshot.diff(prev, cur)
  }

  // Tokenize-to-ids: frequency-ranked vocab (deterministic tie-break)
  // broadcast onto the token stream; id sequences reassembled per doc.
  q("t_token_ids",
    """WITH vocab AS (
      |  SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS id
      |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  GROUP BY tok),
      |tp AS (
      |  SELECT doc_id,
      |         CAST(unnest(generate_series(1, len(string_split(text, ' '))))
      |           AS INT) AS p,
      |         unnest(string_split(text, ' ')) AS tok
      |  FROM documents)
      |SELECT CAST(tp.doc_id AS BIGINT) AS doc_id,
      |       string_agg(v.id, ',' ORDER BY tp.p) AS ids,
      |       count(*) AS n_tokens
      |FROM tp JOIN vocab v USING (tok)
      |GROUP BY tp.doc_id""") { (s, d) =>
    TextAnalysis.tokenizeToIds(docs(s, d))
  }

  // Weighted sampling without replacement (Efraimidis-Spirakis keys
  // from the doc_id md5, weight = n_chars): pure function of the ids,
  // reproduced verbatim by the oracle.
  q("t_weighted_sample",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
      |       CAST(n_chars AS BIGINT) AS n_chars
      |FROM (SELECT doc_id, source, n_chars,
      |        pow(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
      |              AS UBIGINT) / 281474976710656.0, 1.0 / n_chars) AS key
      |      FROM documents)
      |ORDER BY key DESC, doc_id LIMIT 60""") { (s, d) =>
    Sampling.weightedSample(docs(s, d), "doc_id", "n_chars", k = 60)
      .select("doc_id", "source", "n_chars")
  }

  // Gopher-style repetition filters: duplicate-word fraction + top
  // 2-gram coverage + integer-compared pass gate (word-level Rae et
  // al. 2021 §A1.1 rules).
  q("t_repetition",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
      |       FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)),
      |cnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      |top AS (SELECT doc_id, max(c) AS topc, sum(c) AS nbg
      |        FROM cnt GROUP BY 1),
      |tok AS (SELECT doc_id, len(ws) AS ntok, len(list_distinct(ws)) AS nu
      |        FROM w)
      |SELECT CAST(tok.doc_id AS BIGINT) AS doc_id,
      |       CAST(ntok AS INT) AS n_tokens, CAST(nu AS INT) AS n_uniq,
      |       CAST(coalesce(nbg, 0) AS BIGINT) AS n_bigrams,
      |       CAST(coalesce(topc, 0) AS BIGINT) AS top_bigram_cnt,
      |       round(CAST(ntok - nu AS DOUBLE) / ntok, 4) AS dup_word_frac,
      |       round(coalesce(topc, 0) * 2.0 / ntok, 4) AS top_bigram_frac,
      |       CAST(CASE WHEN (ntok - nu) * 10 <= ntok * 3
      |                  AND coalesce(topc, 0) * 20 <= ntok * 2
      |            THEN 1 ELSE 0 END AS INT) AS gopher_pass
      |FROM tok LEFT JOIN top ON top.doc_id = tok.doc_id""") { (s, d) =>
    TextAnalysis.repetitionStats(docs(s, d))
  }

  // Global top-k 3-grams with collection + document frequency — the
  // vocabulary-audit / contamination-screen primitive. Tie-break on
  // the gram string keeps the k-boundary deterministic cross-engine.
  q("t_topk_ngrams",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws
      |              FROM documents),
      |grams AS (
      |  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
      |  FROM toks, unnest(generate_series(1, len(ws) - 2)) AS t(i)
      |  WHERE len(ws) >= 3)
      |SELECT gram, CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
      |FROM grams GROUP BY gram
      |ORDER BY cnt DESC, gram LIMIT 50""") { (s, d) =>
    TextAnalysis.topKNgrams(docs(s, d), n = 3, k = 50)
  }

  // Per-doc rarity stats vs the corpus unigram table — rare-word
  // quality signal as exact integers (no float knife-edges): total /
  // minimum global token frequency and the hapax count per document.
  q("t_unigram_rarity",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |              FROM documents),
      |vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok)
      |SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
      |       CAST(count(*) AS BIGINT) AS n_tokens,
      |       CAST(sum(v.c) AS BIGINT) AS sum_tok_freq,
      |       CAST(min(v.c) AS BIGINT) AS min_tok_freq,
      |       CAST(sum(CASE WHEN v.c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      |FROM toks t JOIN vocab v USING (tok)
      |GROUP BY t.doc_id""") { (s, d) =>
    TextAnalysis.rarityProjection(docs(s, d))
  }

  // Bigram-LM predictability: corpus-trained conditional-probability
  // model, integer-scaled so long sums commute and the oracle
  // hash-matches exactly — the order-sensitive LM quality signal the
  // float unigramLogProb can't oracle-check (ln's 1-ulp divergence).
  q("t_bigram_lm",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents
      |              WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2),
      |big AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      |        FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(i)),
      |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      |        FROM big GROUP BY 1, 2),
      |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM big GROUP BY 1),
      |scored AS (SELECT b.doc_id, (c12.c12 * 1000000) // c1.c1 AS s
      |           FROM big b JOIN c12 USING (w1, w2) JOIN c1 USING (w1))
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |       CAST(sum(s) // count(*) AS BIGINT) AS lm_u
      |FROM scored GROUP BY 1""") { (s, d) =>
    TextAnalysis.bigramLm(docs(s, d))
  }

  // HELD-OUT LM filter (CCNet arrangement, Wenzek et al. 2020): the
  // bigram model is trained on the deterministic md5-even half and
  // scores ONLY the odd half, with add-1 smoothing so unseen
  // transitions keep mass — the self-trained t_bigram_lm scores a
  // junk cluster as predictable because the junk trained the model;
  // this one can't. Same exact-integer arithmetic (no ln); the split
  // is the same '0x'||md5-prefix bucket the cluster-split entry
  // replays.
  q("t_lm_heldout",
    """WITH toks AS (SELECT doc_id,
      |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |           AS UBIGINT) % 100 % 2 = 0 AS is_ref,
      |         string_split(text, ' ') AS t
      |       FROM documents
      |       WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2),
      |big AS (SELECT doc_id, is_ref, t[i] AS w1, t[i + 1] AS w2
      |        FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(i)),
      |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      |        FROM big WHERE is_ref GROUP BY 1, 2),
      |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
      |       FROM big WHERE is_ref GROUP BY 1),
      |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) + 1 AS v
      |      FROM big WHERE is_ref),
      |scored AS (SELECT b.doc_id,
      |    ((coalesce(c12.c12, 0) + 1) * 1000000) //
      |      (coalesce(c1.c1, 0) + v.v) AS s
      |  FROM big b LEFT JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
      |             LEFT JOIN c1 ON b.w1 = c1.w1
      |             CROSS JOIN v
      |  WHERE NOT b.is_ref)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |       CAST(sum(s) // count(*) AS BIGINT) AS lm_u
      |FROM scored GROUP BY 1""") { (s, d) =>
    TextAnalysis.heldoutBigramLm(docs(s, d),
      Sampling.hashBucket("doc_id") % 2 === 0)
  }

  /** CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.3): the
    * scored half partitions into terciles of the held-out LM score —
    * head = most reference-like (highest µ-predictability), tail =
    * least; the standard "train on head+middle, inspect tail"
    * quality split. Cutoffs are LOWER-tercile rules on the exact
    * integer score grid (smallest lm_u whose cumulative count covers
    * n/3 resp. 2n/3 — the la_mad_outliers convention, no interpolated
    * percentile, no ulp knife edge); bucket = head iff lm_u ≥ c2,
    * middle iff ≥ c1, else tail.
    *
    * Scale shape: the parent LM pass builds per-doc scores ONCE
    * (eagerly checkpointed — the grid and the bucket join both read
    * it); the cutoffs derive from the (lm_u) VALUE GRID (cum window
    * state = distinct scores, never docs) and broadcast back; output
    * is ≤3 rows at any corpus size.
    */
  q("t_ccnet_buckets",
    """WITH toks AS (SELECT doc_id,
      |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |           AS UBIGINT) % 100 % 2 = 0 AS is_ref,
      |         string_split(text, ' ') AS t
      |       FROM documents
      |       WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2),
      |big AS (SELECT doc_id, is_ref, t[i] AS w1, t[i + 1] AS w2
      |        FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(i)),
      |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      |        FROM big WHERE is_ref GROUP BY 1, 2),
      |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
      |       FROM big WHERE is_ref GROUP BY 1),
      |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) + 1 AS v
      |      FROM big WHERE is_ref),
      |sc AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |         CAST(sum(((coalesce(c12.c12, 0) + 1) * 1000000) //
      |                  (coalesce(c1.c1, 0) + v.v)) // count(*)
      |           AS BIGINT) AS lm_u
      |       FROM big b LEFT JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
      |                  LEFT JOIN c1 ON b.w1 = c1.w1
      |                  CROSS JOIN v
      |       WHERE NOT b.is_ref GROUP BY 1),
      |g AS (SELECT lm_u, CAST(count(*) AS BIGINT) AS c FROM sc GROUP BY 1),
      |cm AS (SELECT lm_u, c,
      |              sum(c) OVER (ORDER BY lm_u ROWS UNBOUNDED PRECEDING)
      |                AS cum,
      |              sum(c) OVER () AS n
      |       FROM g),
      |cuts AS (SELECT min(CASE WHEN cum * 3 >= n THEN lm_u END) AS cut1,
      |                min(CASE WHEN cum * 3 >= n * 2 THEN lm_u END) AS cut2
      |         FROM cm),
      |bk AS (SELECT CASE WHEN lm_u >= cut2 THEN 'head'
      |                   WHEN lm_u >= cut1 THEN 'middle'
      |                   ELSE 'tail' END AS bucket,
      |              n_bigrams, lm_u
      |       FROM sc CROSS JOIN cuts)
      |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
      |       CAST(min(lm_u) AS BIGINT) AS min_lm_u,
      |       CAST(max(lm_u) AS BIGINT) AS max_lm_u
      |FROM bk GROUP BY 1""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val sc = TextAnalysis.heldoutBigramLm(docs(s, d),
        Sampling.hashBucket("doc_id") % 2 === 0)
      .localCheckpoint(true)
    val cm = sc.groupBy("lm_u").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(Window.orderBy("lm_u")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("c").over(Window.partitionBy()))
    val cuts = cm.agg(
      min(when(col("cum") * 3 >= col("n"), col("lm_u"))).as("cut1"),
      min(when(col("cum") * 3 >= col("n") * 2, col("lm_u"))).as("cut2"))
    sc.crossJoin(broadcast(cuts))
      .select(when(col("lm_u") >= col("cut2"), "head")
        .when(col("lm_u") >= col("cut1"), "middle")
        .otherwise("tail").as("bucket"),
        col("n_bigrams"), col("lm_u"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_bigrams").as("n_bigrams"),
        min("lm_u").as("min_lm_u"), max("lm_u").as("max_lm_u"))
  }

  /** LM memorization-gap audit: per scored doc, the difference between
    * its SELF-trained predictability (`t_bigram_lm`'s model — trained
    * on the whole corpus, the doc included) and its HELD-OUT
    * predictability (`t_lm_heldout`'s reference model — trained on the
    * md5-even half only, add-1 smoothed). A large positive gap means
    * the doc is predictable only because the model saw it — the
    * duplicated/templated mass an excess-loss-style selection
    * (Mindermann et al. 2022 motivate the holdout-vs-train loss gap;
    * Wenzek et al. 2020 the reference-LM arrangement) downweights
    * first; gap ≈ 0 means the regularity is real. Both scores are the
    * EXISTING entries' exact-integer µ-scores (one definition each —
    * this entry only joins and subtracts, so it cannot drift from its
    * parents).
    *
    * Scale shape: two tokenize passes (one per parent model) + the
    * parents' model-sized count tables; the gap join is doc-keyed.
    */
  q("t_lm_memgap",
    """WITH toks AS (SELECT doc_id,
      |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |           AS UBIGINT) % 100 % 2 = 0 AS is_ref,
      |         string_split(text, ' ') AS t
      |       FROM documents
      |       WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2),
      |big AS (SELECT doc_id, is_ref, t[i] AS w1, t[i + 1] AS w2
      |        FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(i)),
      |sc12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      |         FROM big GROUP BY 1, 2),
      |sc1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
      |        FROM big GROUP BY 1),
      |self AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |           CAST(sum((sc12.c12 * 1000000) // sc1.c1) // count(*)
      |             AS BIGINT) AS self_u
      |         FROM big b JOIN sc12 ON b.w1 = sc12.w1 AND b.w2 = sc12.w2
      |                    JOIN sc1 ON b.w1 = sc1.w1
      |         WHERE NOT b.is_ref GROUP BY 1),
      |hc12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      |         FROM big WHERE is_ref GROUP BY 1, 2),
      |hc1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
      |        FROM big WHERE is_ref GROUP BY 1),
      |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) + 1 AS v
      |      FROM big WHERE is_ref),
      |ref AS (SELECT b.doc_id,
      |          CAST(sum(((coalesce(hc12.c12, 0) + 1) * 1000000) //
      |                   (coalesce(hc1.c1, 0) + v.v)) // count(*)
      |            AS BIGINT) AS ref_u
      |        FROM big b LEFT JOIN hc12 ON b.w1 = hc12.w1 AND b.w2 = hc12.w2
      |                   LEFT JOIN hc1 ON b.w1 = hc1.w1
      |                   CROSS JOIN v
      |        WHERE NOT b.is_ref GROUP BY 1)
      |SELECT self.doc_id, n_bigrams, self_u, ref_u,
      |       CAST(self_u - ref_u AS BIGINT) AS gap_u
      |FROM self JOIN ref ON ref.doc_id = self.doc_id""") { (s, d) =>
    val self = TextAnalysis.bigramLm(docs(s, d))
      .select(col("doc_id"), col("n_bigrams"), col("lm_u").as("self_u"))
    val ref = TextAnalysis.heldoutBigramLm(docs(s, d),
        Sampling.hashBucket("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lm_u").as("ref_u"))
    self.join(ref, "doc_id")
      .select(col("doc_id"), col("n_bigrams"), col("self_u"),
        col("ref_u"), (col("self_u") - col("ref_u")).as("gap_u"))
  }

  /** The curation funnel — the survivor accounting every training-data
    * pipeline publishes: input → language filter → quality gate
    * (≥5 tokens, distinct-token ratio ≥ 0.3) → exact-dedup keepers,
    * with doc/token counts and ppm retention per stage. Stages are
    * CHAINED FILTERS over one persisted base projection (doc_id, lang,
    * token stats — text itself only feeds the dedup window), so the
    * corpus is scanned once, not once per stage; the dedup window keys
    * on md5(text) (16-byte shuffle rows, the dedupImpactReport trade —
    * collision bound ~10⁻²⁰ at 10⁹ docs) while the oracle groups on
    * the full text. Output is 4 rows at any corpus size.
    */
  q("t_curation_funnel",
    """WITH d0 AS (
      |  SELECT doc_id, text, lang,
      |         len(list_filter(string_split(text, ' '), x -> x <> ''))
      |           AS nt,
      |         len(list_distinct(list_filter(string_split(text, ' '),
      |             x -> x <> ''))) AS ndt
      |  FROM documents WHERE text IS NOT NULL),
      |d1 AS (SELECT * FROM d0 WHERE lang = 'en'),
      |d2 AS (SELECT * FROM d1 WHERE nt >= 5 AND ndt * 10 >= nt * 3),
      |d3 AS (SELECT * FROM (
      |         SELECT *, min(doc_id) OVER (PARTITION BY text) AS keep
      |         FROM d2) k WHERE doc_id = keep),
      |st AS (
      |  SELECT 0 AS stage, 'input' AS stage_name,
      |         CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(coalesce(sum(nt), 0) AS BIGINT) AS n_tokens FROM d0
      |  UNION ALL
      |  SELECT 1, 'language', CAST(count(*) AS BIGINT),
      |         CAST(coalesce(sum(nt), 0) AS BIGINT) FROM d1
      |  UNION ALL
      |  SELECT 2, 'quality', CAST(count(*) AS BIGINT),
      |         CAST(coalesce(sum(nt), 0) AS BIGINT) FROM d2
      |  UNION ALL
      |  SELECT 3, 'dedup', CAST(count(*) AS BIGINT),
      |         CAST(coalesce(sum(nt), 0) AS BIGINT) FROM d3),
      |base AS (SELECT n_docs AS nd0 FROM st WHERE stage = 0)
      |SELECT stage, stage_name, n_docs, n_tokens,
      |       CAST(n_docs * 1000000 // nd0 AS BIGINT) AS retained_ppm
      |FROM st, base""") { (s, d) =>
    val toks = filter(split(col("text"), " "), x => x =!= "")
    val d0 = docs(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), col("lang"),
        size(toks).cast("long").as("nt"),
        size(array_distinct(toks)).cast("long").as("ndt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val d1 = d0.filter(col("lang") === "en")
    val d2 = d1.filter(col("nt") >= 5 && col("ndt") * 10 >= col("nt") * 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text")))
    val d3 = d2.withColumn("keep", min("doc_id").over(w))
      .filter(col("doc_id") === col("keep"))
    def stat(df: org.apache.spark.sql.DataFrame, i: Int, nm: String) =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum("nt"), lit(0L)).as("n_tokens"))
        .select(lit(i).as("stage"), lit(nm).as("stage_name"),
          col("n_docs"), col("n_tokens"))
    val st = stat(d0, 0, "input")
      .unionAll(stat(d1, 1, "language"))
      .unionAll(stat(d2, 2, "quality"))
      .unionAll(stat(d3, 3, "dedup"))
    val base = stat(d0, 0, "input").select(col("n_docs").as("nd0"))
    val out = st.crossJoin(broadcast(base))
      .select(col("stage"), col("stage_name"), col("n_docs"),
        col("n_tokens"), expr("n_docs * 1000000L div nd0").as("retained_ppm"))
      .localCheckpoint(true)
    d0.unpersist(false)
    out
  }

  /** Shared CTE prelude for the BPE merge-learning oracle: the
    * double-space document representation plus `rounds` chained
    * (pair-count → argmax → rewrite) steps, each the exact replay of
    * one [[TextAnalysis.bpeChain]] round (same total-order tie-break,
    * same plain left-to-right `replace` on the fenced representation).
    */
  private def bpeCtes(rounds: Int): String = {
    val sb = new StringBuilder(
      """WITH d0 AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(string_split(text, ' '),
        |              x -> x <> '')) AS BIGINT) AS n_before,
        |         ' ' || array_to_string(list_filter(string_split(text, ' '),
        |              x -> x <> ''), '  ') || ' ' AS s
        |  FROM documents WHERE text IS NOT NULL)""".stripMargin)
    for (r <- 1 to rounds) {
      sb.append(s""",
        |p$r AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT list_filter(string_split(trim(s), '  '),
        |               x -> x <> '') AS t
        |        FROM d${r - 1}) tt
        |  CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(i)
        |  WHERE len(t) >= 2
        |  GROUP BY 1, 2),
        |t$r AS (SELECT w1, w2, c FROM p$r ORDER BY c DESC, w1, w2 LIMIT 1),
        |d$r AS (SELECT doc_id, n_before,
        |          replace(s, ' ' || t.w1 || '  ' || t.w2 || ' ',
        |                     ' ' || t.w1 || '@@' || t.w2 || ' ') AS s
        |        FROM d${r - 1}, t$r t)""".stripMargin)
    }
    sb.toString
  }

  // Distributed BPE merge learning (word-level): the top adjacent-pair
  // merge per round, each round one map-combined pair-count exchange +
  // a 1-row argmax + a map-only rewrite. The oracle chains the same
  // rounds as CTEs — counts, tie-break, and the double-space-fenced
  // replace are all exact, so the learned table hash-matches.
  q("t_bpe_learn", {
    val rounds = 3
    bpeCtes(rounds) + "\n" + (1 to rounds).map(r =>
      s"SELECT $r AS round, w1, w2, c AS n_pairs FROM t$r")
      .mkString("\nUNION ALL\n")
  }) { (s, d) =>
    TextAnalysis.bpeLearn(docs(s, d), rounds = 3)
  }

  // Apply the 3 learned merges and report per-doc compression —
  // n_merged counts exactly the merge operations each doc received.
  q("t_bpe_apply",
    bpeCtes(3) +
      """
        |SELECT doc_id, n_before,
        |       CAST(len(list_filter(string_split(trim(s), '  '),
        |            x -> x <> '')) AS BIGINT) AS n_after,
        |       n_before - CAST(len(list_filter(string_split(trim(s), '  '),
        |            x -> x <> '')) AS BIGINT) AS n_merged
        |FROM d3""".stripMargin) { (s, d) =>
    TextAnalysis.bpeApply(docs(s, d), rounds = 3)
  }

  // Vocabulary-growth (Heaps'-law) curve: cumulative distinct types vs
  // cumulative tokens at 20 doc_id-order checkpoints — the corpus-size
  // planning curve. The oracle's window cumsum is replayed engine-side
  // as the bounded fold over the ≤20-row bucket table (no unpartitioned
  // window); "first appearance" is a map-combined min(bucket) per token.
  q("t_vocab_growth",
    """WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
      |tb AS (SELECT CAST((doc_id * 20) // m AS INT) AS bucket,
      |              unnest(string_split(text, ' ')) AS tok
      |       FROM documents, mx),
      |cnt AS (SELECT bucket, count(*) AS n_tokens FROM tb GROUP BY bucket),
      |firsts AS (SELECT tok, min(bucket) AS bucket FROM tb GROUP BY tok),
      |newb AS (SELECT bucket, count(*) AS new_types FROM firsts GROUP BY bucket)
      |SELECT cnt.bucket,
      |       CAST(sum(cnt.n_tokens) OVER (ORDER BY cnt.bucket) AS BIGINT)
      |         AS cum_tokens,
      |       CAST(sum(coalesce(newb.new_types, 0)) OVER (ORDER BY cnt.bucket)
      |         AS BIGINT) AS cum_vocab
      |FROM cnt LEFT JOIN newb ON newb.bucket = cnt.bucket""") { (s, d) =>
    TextAnalysis.vocabGrowth(docs(s, d), buckets = 20)
  }

  // Zipf rank–frequency fit over the top-100 vocabulary: one-row corpus
  // health stat (natural text slopes ≈ −1; templated corpora bend it).
  // regr_* on ln() doubles is oracle-safe at round(.,6): k=100 points
  // with counts ≥ 1, so the fit sits ~9 orders above 1-ulp ln drift.
  q("t_zipf_slope",
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
      |              FROM documents),
      |vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
      |top AS (SELECT tok, c FROM vocab ORDER BY c DESC, tok LIMIT 100),
      |ranked AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rank
      |           FROM top)
      |SELECT round(regr_slope(ln(c), ln(rank)), 6) AS zipf_slope,
      |       round(regr_intercept(ln(c), ln(rank)), 6) AS zipf_icept,
      |       CAST(count(*) AS BIGINT) AS n_ranks
      |FROM ranked""") { (s, d) =>
    TextAnalysis.zipfSlope(docs(s, d), k = 100)
  }

  // Epoch-aware dataset mixing: each source's documents replicate to a
  // target epoch count (src%4 → 0.4/1.0/1.7/2.5 epochs), the fractional
  // remainder resolved per doc by integer-exact md5 thresholding — the
  // pre-training mix step after quality binning. Map-only, no shuffle.
  q("t_mix_epochs",
    """WITH w AS (SELECT doc_id, source,
      |  CASE CAST(substr(source, 4) AS INT) % 4
      |    WHEN 0 THEN 4 WHEN 1 THEN 10 WHEN 2 THEN 17 ELSE 25 END AS wt,
      |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
      |    AS UBIGINT) AS u48
      |  FROM documents),
      |c AS (SELECT doc_id, source,
      |  wt // 10 + CASE WHEN CAST(u48 AS HUGEINT) * 10 <
      |    CAST(wt % 10 AS HUGEINT) * 281474976710656 THEN 1 ELSE 0 END
      |    AS n_copies
      |  FROM w)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
      |       CAST(n_copies AS INT) AS n_copies,
      |       CAST(unnest(generate_series(1, n_copies)) AS INT) AS copy
      |FROM c WHERE n_copies >= 1""") { (s, d) =>
    Sampling.epochMix(docs(s, d), "doc_id",
      "CASE CAST(substring(source, 4) AS INT) % 4 " +
        "WHEN 0 THEN 4 WHEN 1 THEN 10 WHEN 2 THEN 17 ELSE 25 END")
      .select(col("doc_id"), col("source"), col("n_copies"), col("copy"))
  }

  // UniMax capped-mixture allocation (Chung et al. 2023): given a
  // total token budget B (2.9 epochs of the corpus, ×10-scaled
  // integers) and a per-source repeat cap (3.2 epochs), assign each
  // source min(cap_s, waterline) tokens where the waterline w makes
  // the allocations sum to B — small sources run their full cap,
  // large ones are leveled at w. The classic water-filling closed
  // form, fully integer: sort sources ascending by cap, prefix-sum;
  // source i is capped iff cap_i·(n−i) ≤ B−P_i (the test is monotone
  // along the sort, so the capped set is a prefix and max(i) is the
  // boundary); uncapped sources get (B−P_k) div (n−k). The corpus
  // appears only in the per-source token count (one map-combined
  // aggregate); everything after runs on the |sources|-row table, so
  // the unpartitioned rank window is model-sized by construction —
  // at 100 TB the source list is still a few thousand rows.
  // epochs_ppm = allocation·10⁶ div tokens is the "how many epochs
  // does this source actually run" readout the mixture review reads.
  q("t_unimax_mix",
    """WITH t AS (SELECT source,
      |             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS T
      |           FROM documents GROUP BY 1),
      |c AS (SELECT source, T, T * 16 // 5 AS cap_tokens FROM t),
      |b AS (SELECT sum(T) * 29 // 10 AS B, count(*) AS n FROM c),
      |o AS (SELECT source, T, cap_tokens,
      |        row_number() OVER (ORDER BY cap_tokens, source) AS i,
      |        sum(cap_tokens) OVER (ORDER BY cap_tokens, source
      |          ROWS UNBOUNDED PRECEDING) AS P
      |      FROM c),
      |f AS (SELECT o.*, B, n,
      |        CASE WHEN cap_tokens * (n - i) <= B - P THEN 1 ELSE 0 END
      |          AS capped
      |      FROM o, b),
      |k AS (SELECT coalesce(max(CASE WHEN capped = 1 THEN i END), 0) AS nk,
      |             coalesce(max(CASE WHEN capped = 1 THEN P END), 0) AS pk
      |      FROM f),
      |a AS (SELECT source, T, cap_tokens, capped,
      |        CASE WHEN capped = 1 THEN cap_tokens
      |             ELSE (B - pk) // greatest(n - nk, 1) END AS allocation
      |      FROM f, k)
      |SELECT source, T AS n_tokens,
      |       CAST(cap_tokens AS BIGINT) AS cap_tokens,
      |       CAST(allocation AS BIGINT) AS allocation,
      |       CAST(capped AS INT) AS capped,
      |       CAST(allocation * 1000000 // T AS BIGINT) AS epochs_ppm
      |FROM a""") { (s, d) =>
    Sampling.unimaxMix(
      docs(s, d).select(col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("toks")),
      capNum = 16L, capDen = 5L, budgetNum = 29L, budgetDen = 10L)
  }

  /** Excess-loss domain reweighting (the DoReMi update, Xie et al.
    * 2023, linearized to one exponentiated-gradient step with η=1 so
    * the arithmetic stays exactly replayable): each domain's excess
    * per-token loss under the corpus-level unigram reference model vs
    * its own in-domain model is exactly KL(domain ‖ corpus) — domains
    * the shared model fits worst get their mixture weight pushed UP.
    * w_d ∝ share_d · (1 + KL_d), normalized to ppm. A domain
    * distributed like the corpus keeps its token share; a divergent
    * one is boosted in proportion to its µ-nat excess.
    *
    * Determinism: the per-feature terms c_dw·ln((c_dw·T)/(c_w·T_d))
    * are IEEE doubles over exact integer casts (both engines perform
    * the identical mul/div/ln — the [[TextAnalysis.dsirWeights]]
    * argument), and the µ-nat rounding happens at SLICE level (one
    * value per domain, magnitude ≫ the engines' 1-ulp ln divergence —
    * the `t_entropy` argument). KL(d‖corpus) ≥ 0 exactly because both
    * distributions are empirical, so the update factor stays ≥ 10⁶.
    *
    * Scale shape: the corpus appears ONLY in the (lang, token)
    * map-combined count; everything downstream runs on the
    * vocab×|domains| model table (the per-token and per-domain totals
    * derive from IT, not from a second corpus pass), and the final
    * update arithmetic is |domains| rows. One token-keyed exchange
    * at any scale.
    */
  /** Shared oracle builder for the two domain-reweight entries:
    * `tokCte` supplies the (lang, w) feature rows — raw tokens for the
    * batch entry, md5-u48 hash buckets for the streaming twin — and
    * everything downstream (counts, KL, EG update) is this ONE
    * definition, so the twins cannot drift.
    */
  def domainReweightSql(tokCte: String): String =
    s"""WITH tok AS ($tokCte),
      |tc AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c_dw
      |       FROM tok GROUP BY 1, 2),
      |wt AS (SELECT w, CAST(sum(c_dw) AS BIGINT) AS c_w FROM tc GROUP BY 1),
      |dt AS (SELECT lang, CAST(sum(c_dw) AS BIGINT) AS t_d
      |       FROM tc GROUP BY 1),
      |tt AS (SELECT CAST(sum(t_d) AS BIGINT) AS t_all FROM dt),
      |kl AS (SELECT tc.lang,
      |         sum(CAST(c_dw AS DOUBLE) *
      |             ln((CAST(c_dw AS DOUBLE) * CAST(t_all AS DOUBLE)) /
      |                (CAST(c_w AS DOUBLE) * CAST(t_d AS DOUBLE)))) AS s
      |       FROM tc JOIN wt USING (w) JOIN dt USING (lang) CROSS JOIN tt
      |       GROUP BY 1),
      |r AS (SELECT dt.lang, t_d AS n_tokens,
      |        CAST(t_d * 1000000 // t_all AS BIGINT) AS share_ppm,
      |        CAST(round(s / t_d * 1000000) AS BIGINT) AS kl_unat
      |      FROM dt JOIN kl USING (lang) CROSS JOIN tt),
      |n AS (SELECT lang, n_tokens, share_ppm, kl_unat,
      |        share_ppm * (1000000 + kl_unat) AS num FROM r)
      |SELECT lang, n_tokens, share_ppm, kl_unat,
      |       CAST(num * 1000000 // (SELECT sum(num) FROM n) AS BIGINT)
      |         AS reweight_ppm
      |FROM n""".stripMargin

  /** The model-table→weights math shared by `t_domain_reweight` and
    * `st_domain_reweight`: takes the (lang, w, c_dw) feature-count
    * table (vocab×domains — model-sized) and produces the per-domain
    * KL + EG-update weights. ONE definition for both twins.
    */
  def domainReweightFromCounts(tc: DataFrame): DataFrame = {
    val wTot = tc.groupBy("w").agg(sum("c_dw").as("c_w"))
    val dTot = tc.groupBy("lang").agg(sum("c_dw").as("t_d"))
    val tot = dTot.agg(sum("t_d").as("t_all"))
    val r = tc.join(wTot, "w").join(broadcast(dTot), "lang")
      .crossJoin(broadcast(tot))
      .groupBy("lang")
      .agg(max("t_d").as("t_d"), max("t_all").as("t_all"),
        sum(col("c_dw").cast("double") *
          log((col("c_dw").cast("double") * col("t_all").cast("double")) /
            (col("c_w").cast("double") * col("t_d").cast("double"))))
          .as("s"))
      .select(col("lang"), col("t_d").as("n_tokens"),
        expr("t_d * 1000000 div t_all").as("share_ppm"),
        expr("cast(round(s / t_d * 1000000) as bigint)").as("kl_unat"))
      .withColumn("num",
        expr("share_ppm * (1000000 + kl_unat)"))
    // normalizer via an unpartitioned window over the |domains|-row
    // AGGREGATED frame (model-sized by construction) — a broadcast
    // self-join would re-run the feature pass a second time
    r.withColumn("den", sum("num").over(Window.partitionBy()))
      .select(col("lang"), col("n_tokens"), col("share_ppm"),
        col("kl_unat"),
        expr("num * 1000000 div den").as("reweight_ppm"))
  }

  q("t_domain_reweight", domainReweightSql(
    "SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents")) {
    (s, d) =>
    domainReweightFromCounts(docs(s, d)
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("c_dw")))
  }

  // Per-source unigram Shannon entropy (token-distribution diversity —
  // low entropy flags templated/boilerplate sources before they enter a
  // training mix). H = ln(N) - Σc·ln(c)/N so every addend is map-side
  // combinable; the ln-based doubles are safe to oracle here because
  // the output is SLICE-level (20 rows, H ≈ a few nats) — unlike the
  // per-doc unigramLogProb above, round(.,6) sits ~9 orders above the
  // engines' 1-ulp ln divergence. Scale: one token-keyed exchange
  // (map-combined counts), then a 20-row rollup.
  q("t_entropy",
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t
      |             FROM documents),
      |tc AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
      |       FROM tok GROUP BY 1, 2),
      |ag AS (SELECT source, sum(c) AS n, count(*) AS nd,
      |              sum(c * ln(c)) AS s
      |       FROM tc GROUP BY 1)
      |SELECT source, CAST(n AS BIGINT) AS n_tokens,
      |       CAST(nd AS BIGINT) AS n_distinct,
      |       round(ln(n) - s / n, 6) AS entropy_nats,
      |       CASE WHEN nd > 1 THEN round((ln(n) - s / n) / ln(nd), 6)
      |            ELSE CAST(0 AS DOUBLE) END AS entropy_norm
      |FROM ag""") { (s, d) =>
    val tc = docs(s, d)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("c"))
    tc.groupBy("source")
      .agg(sum("c").as("n"), count(lit(1)).as("nd"),
        sum(col("c") * log(col("c"))).as("s"))
      .select(col("source"), col("n").as("n_tokens"),
        col("nd").as("n_distinct"),
        round(log(col("n")) - col("s") / col("n"), 6).as("entropy_nats"),
        when(col("nd") > 1,
            round((log(col("n")) - col("s") / col("n")) / log(col("nd")), 6))
          .otherwise(lit(0.0)).as("entropy_norm"))
  }

  // Jensen-Shannon divergence between the token distributions of two
  // corpus halves (distribution-drift / domain-shift detection when
  // refreshing a training mix). One token-keyed exchange carries BOTH
  // halves' counts (conditional sums, map-combined); totals arrive as
  // a one-row broadcast; the JS sum is a scalar aggregate. Output is a
  // single row, so the ln-based doubles oracle safely at round(.,6).
  q("t_js_divergence",
    """WITH tok AS (SELECT doc_id % 2 = 0 AS a,
      |                    unnest(string_split(text, ' ')) AS t
      |             FROM documents),
      |tc AS (SELECT t,
      |              CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |              CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |       FROM tok GROUP BY t),
      |tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM tc),
      |terms AS (
      |  SELECT CASE WHEN ca > 0 THEN (ca / na) *
      |           ln((ca / na) / ((ca / na + cb / nb) / 2)) ELSE 0 END AS ta,
      |         CASE WHEN cb > 0 THEN (cb / nb) *
      |           ln((cb / nb) / ((ca / na + cb / nb) / 2)) ELSE 0 END AS tb,
      |         ca, cb
      |  FROM tc CROSS JOIN tot)
      |SELECT CAST(sum(ca) AS BIGINT) AS n_tokens_a,
      |       CAST(sum(cb) AS BIGINT) AS n_tokens_b,
      |       CAST(count(*) AS BIGINT) AS nd_union,
      |       round(sum(ta + tb) / 2, 6) AS js_nats,
      |       round(sum(ta + tb) / 2 / ln(2), 6) AS js_bits
      |FROM terms""") { (s, d) =>
    val tc = docs(s, d)
      .select((col("doc_id") % 2 === 0).as("a"),
        explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("t")
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("a"), 0L).otherwise(1L)).as("cb"))
    val tot = tc.agg(sum("ca").as("na"), sum("cb").as("nb"))
    val p = col("ca") / col("na")
    val qq = col("cb") / col("nb")
    val m = (p + qq) / 2
    tc.crossJoin(broadcast(tot))
      .select(col("ca"), col("cb"),
        when(col("ca") > 0, p * log(p / m)).otherwise(lit(0.0)).as("ta"),
        when(col("cb") > 0, qq * log(qq / m)).otherwise(lit(0.0)).as("tb"))
      .agg(sum("ca").as("n_tokens_a"), sum("cb").as("n_tokens_b"),
        count(lit(1)).as("nd_union"),
        round(sum(col("ta") + col("tb")) / 2, 6).as("js_nats"),
        round(sum(col("ta") + col("tb")) / 2 / log(lit(2.0)), 6).as("js_bits"))
  }

  // DSIR importance resampling (Xie et al. 2023): every document scored
  // by the hashed-unigram log-likelihood ratio of a target-domain model
  // (sources src0–src3) vs the raw remainder — the up-sample-what-looks-
  // curated selection step of a pre-training mix. Per-feature µ-nat
  // scores round ONCE on the bucket-bounded feature table, so per-doc
  // sums are exact commuting BIGINTs; 1024 md5-u48 buckets exercise the
  // production path that bounds feature state at any corpus size.
  q("t_dsir_weights",
    """WITH tok AS (SELECT doc_id, source,
      |    CAST(('0x' || substr(md5(t.tok), 1, 12)) AS UBIGINT) % 1024 AS feat
      |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
      |        FROM documents WHERE text IS NOT NULL) t),
      |fc AS (SELECT feat,
      |    CAST(sum(CASE WHEN source IN ('src0','src1','src2','src3')
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS ct,
      |    CAST(sum(CASE WHEN source IN ('src0','src1','src2','src3')
      |                  THEN 0 ELSE 1 END) AS BIGINT) AS cr
      |  FROM tok GROUP BY feat),
      |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
      |               CAST(sum(cr) AS BIGINT) AS nr,
      |               CAST(count(*) AS BIGINT) AS v FROM fc),
      |llr AS (SELECT feat,
      |    CAST(round(ln((CAST(ct + 1 AS DOUBLE) * CAST(nr + v AS DOUBLE)) /
      |      (CAST(cr + 1 AS DOUBLE) * CAST(nt + v AS DOUBLE))) * 1000000)
      |      AS BIGINT) AS llr_u
      |  FROM fc CROSS JOIN tot)
      |SELECT doc_id, min(source) AS source,
      |       CAST(count(*) AS BIGINT) AS n_tokens,
      |       CAST(sum(llr_u) AS BIGINT) AS logw_u,
      |       CAST(CASE WHEN sum(llr_u) >= 0 THEN 1 ELSE 0 END AS INT) AS keep
      |FROM tok JOIN llr USING (feat)
      |GROUP BY doc_id""") { (s, d) =>
    TextAnalysis.dsirWeights(docs(s, d),
      targetSources = Seq("src0", "src1", "src2", "src3"),
      hashBuckets = Some(1024))
  }

  // Corpus-scale linear-model fit: n_chars ~ 1 + n_tokens + n_types by
  // normal equations — ten map-combined BIGINT sums, closed-form 3×3
  // Cramer solve as column expressions (graft.rel.OlsFit). The
  // "train a quality regressor in one pass" primitive; doubles start
  // from identical exact integers on both engines, so coefficients
  // match bit-for-bit before round(.,6).
  q("t_quality_ols",
    """WITH f AS (SELECT CAST(n_chars AS BIGINT) AS y,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS x2
      |  FROM documents WHERE text IS NOT NULL),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
      |    CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x1 * x1) AS BIGINT) AS s11,
      |    CAST(sum(x1 * x2) AS BIGINT) AS s12,
      |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
      |    CAST(sum(x1 * y) AS BIGINT) AS s1y,
      |    CAST(sum(x2 * y) AS BIGINT) AS s2y,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM f),
      |c AS (SELECT n AS n_out, CAST(n AS DOUBLE) AS nd,
      |    CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
      |    CAST(sy AS DOUBLE) AS sy, CAST(s11 AS DOUBLE) AS s11,
      |    CAST(s12 AS DOUBLE) AS s12, CAST(s22 AS DOUBLE) AS s22,
      |    CAST(s1y AS DOUBLE) AS s1y, CAST(s2y AS DOUBLE) AS s2y,
      |    CAST(syy AS DOUBLE) AS syy FROM s),
      |x AS (SELECT n_out, nd, s1, s2, sy, s11, s12, s22, s1y, s2y, syy,
      |    nd * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      |      s2 * (s1 * s12 - s11 * s2) AS det,
      |    sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      |      s2 * (s1y * s12 - s11 * s2y) AS det0,
      |    nd * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      |      s2 * (s1 * s2y - s1y * s2) AS det1,
      |    nd * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      |      sy * (s1 * s12 - s11 * s2) AS det2
      |  FROM c),
      |b AS (SELECT n_out, nd, s1, s2, sy, s11, s12, s22, s1y, s2y, syy,
      |    det0 / det AS b0, det1 / det AS b1, det2 / det AS b2 FROM x)
      |SELECT n_out AS n, round(b0, 6) AS b0, round(b1, 6) AS b1,
      |  round(b2, 6) AS b2,
      |  round(1 - (syy - 2 * (b0 * sy + b1 * s1y + b2 * s2y) +
      |    (nd * b0 * b0 + s11 * b1 * b1 + s22 * b2 * b2 +
      |      2 * (b0 * b1 * s1 + b0 * b2 * s2 + b1 * b2 * s12))) /
      |    (syy - sy * sy / nd), 6) AS r2
      |FROM b""") { (s, d) =>
    val src = docs(s, d).filter(col("text").isNotNull)
    graft.rel.OlsFit.fit2(src, col("n_chars"),
      size(TextAnalysis.tokens(col("text"))),
      size(array_distinct(TextAnalysis.tokens(col("text")))))
  }

  // Per-source residual audit of the t_quality_ols model — the
  // evaluate half of train→evaluate: signed bias exposes sources the
  // global model systematically mis-scores, MAE their spread. Residuals
  // round ONCE per row to µ-units from the rounded coefficients +
  // integer features (both engines derive the identical long), so all
  // aggregates are exact sums; `div` ≡ `//` truncation on negatives
  // (the ts_holt contract).
  q("t_ols_residuals",
    """WITH f AS (SELECT source, CAST(n_chars AS BIGINT) AS y,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS x2
      |  FROM documents WHERE text IS NOT NULL),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
      |    CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x1 * x1) AS BIGINT) AS s11,
      |    CAST(sum(x1 * x2) AS BIGINT) AS s12,
      |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
      |    CAST(sum(x1 * y) AS BIGINT) AS s1y,
      |    CAST(sum(x2 * y) AS BIGINT) AS s2y
      |  FROM f),
      |c AS (SELECT CAST(n AS DOUBLE) AS nd,
      |    CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
      |    CAST(sy AS DOUBLE) AS sy, CAST(s11 AS DOUBLE) AS s11,
      |    CAST(s12 AS DOUBLE) AS s12, CAST(s22 AS DOUBLE) AS s22,
      |    CAST(s1y AS DOUBLE) AS s1y, CAST(s2y AS DOUBLE) AS s2y FROM s),
      |x AS (SELECT nd, s1, s2, sy, s11, s12, s22, s1y, s2y,
      |    nd * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      |      s2 * (s1 * s12 - s11 * s2) AS det,
      |    sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      |      s2 * (s1y * s12 - s11 * s2y) AS det0,
      |    nd * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      |      s2 * (s1 * s2y - s1y * s2) AS det1,
      |    nd * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      |      sy * (s1 * s12 - s11 * s2) AS det2
      |  FROM c),
      |bb AS (SELECT round(det0 / det, 6) AS b0, round(det1 / det, 6) AS b1,
      |    round(det2 / det, 6) AS b2 FROM x),
      |r AS (SELECT f.source AS grp,
      |    CAST(round((CAST(y AS DOUBLE) - (b0 + b1 * CAST(x1 AS DOUBLE) +
      |      b2 * CAST(x2 AS DOUBLE))) * 1000000) AS BIGINT) AS res_u
      |  FROM f CROSS JOIN bb)
      |SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(res_u) // count(*) AS BIGINT) AS bias_u,
      |       CAST(sum(abs(res_u)) // count(*) AS BIGINT) AS mae_u
      |FROM r GROUP BY grp""") { (s, d) =>
    val src = docs(s, d).filter(col("text").isNotNull)
    graft.rel.OlsFit.residualsByGroup(src, col("source"), col("n_chars"),
      size(TextAnalysis.tokens(col("text"))),
      size(array_distinct(TextAnalysis.tokens(col("text")))))
  }

  // Population Stability Index between the first and second half of the
  // source roster over fixed-width n_chars bins — the standard "did the
  // incoming refresh drift from the serving corpus" monitor (PSI < 0.1
  // stable, > 0.25 action). Integer bin counts; per-bin µ-unit terms
  // round once from identical exact integers, so the windowed total is
  // an exact BIGINT sum. One map-combined 10-bin aggregate — constant
  // state at any corpus size.
  q("t_psi_drift",
    """WITH b AS (SELECT least(CAST(n_chars // 100 AS INT), 9) AS bucket,
      |    CAST(substr(source, 4) AS INT) < 10 AS grp_a
      |  FROM documents),
      |c AS (SELECT bucket,
      |    CAST(sum(CASE WHEN grp_a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
      |    CAST(sum(CASE WHEN grp_a THEN 0 ELSE 1 END) AS BIGINT) AS c_b
      |  FROM b GROUP BY bucket),
      |tot AS (SELECT CAST(sum(c_a) AS BIGINT) AS na,
      |               CAST(sum(c_b) AS BIGINT) AS nb,
      |               CAST(count(*) AS BIGINT) AS k FROM c),
      |t AS (SELECT bucket, c_a, c_b,
      |    CAST(round((CAST(c_a + 1 AS DOUBLE) / CAST(na + k AS DOUBLE) -
      |        CAST(c_b + 1 AS DOUBLE) / CAST(nb + k AS DOUBLE)) *
      |      ln((CAST(c_a + 1 AS DOUBLE) / CAST(na + k AS DOUBLE)) /
      |        (CAST(c_b + 1 AS DOUBLE) / CAST(nb + k AS DOUBLE))) * 1000000)
      |      AS BIGINT) AS psi_term_u
      |  FROM c CROSS JOIN tot)
      |SELECT bucket, c_a, c_b, psi_term_u,
      |       CAST(sum(psi_term_u) OVER () AS BIGINT) AS psi_total_u
      |FROM t""") { (s, d) =>
    val b = docs(s, d).select(
      least(expr("CAST(n_chars div 100 AS INT)"), lit(9)).as("bucket"),
      (substring(col("source"), 4, 10).cast("int") < 10).as("grp_a"))
    val c = b.groupBy("bucket")
      .agg(sum(when(col("grp_a"), 1L).otherwise(0L)).as("c_a"),
        sum(when(col("grp_a"), 0L).otherwise(1L)).as("c_b"))
    val tot = c.agg(sum("c_a").as("na"), sum("c_b").as("nb"),
      count(lit(1)).as("k"))
    val pa = (col("c_a") + 1).cast("double") /
      (col("na") + col("k")).cast("double")
    val pb = (col("c_b") + 1).cast("double") /
      (col("nb") + col("k")).cast("double")
    val t = c.crossJoin(broadcast(tot))
      .select(col("bucket"), col("c_a"), col("c_b"),
        round((pa - pb) * log(pa / pb) * 1e6).cast("long").as("psi_term_u"))
    // unpartitioned window is safe here: input is the ≤10-row bin table
    t.withColumn("psi_total_u",
      sum(col("psi_term_u")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
  }

  // BM25 keyword search: rational RSJ idf (no logs — see Search's float
  // determinism contract), tf as codegen'd array filters, corpus stats
  // one broadcast row, top-k via TakeOrderedAndProject. The 'dup' term
  // is the rare discriminator in the synthetic vocabulary.
  private val bm25Terms = Seq("dup", "spark", "merge", "scan")

  q("t_bm25_topk", Search.bm25OracleSql(bm25Terms, k = 25)) { (s, d) =>
    Search.bm25TopK(docs(s, d), bm25Terms, k = 25)
  }

  // Same query, index-backed shape (postings explode + pivot): one
  // oracle, two independent implementations that must agree with it.
  q("t_bm25_indexed", Search.bm25OracleSql(bm25Terms, k = 25)) { (s, d) =>
    Search.bm25TopKIndexed(docs(s, d), bm25Terms, k = 25)
  }

  // Retrieval-quality eval of that same ranking: nDCG@{5,10,20}
  // against the capped term-occurrence relevance label. Integer
  // µ-unit gains (order-free sums), exact ppm division.
  q("t_ndcg", Search.ndcgOracleSql(bm25Terms)) { (s, d) =>
    Search.ndcgAtK(docs(s, d), bm25Terms)
  }

  /** Hybrid lexical + vector retrieval with reciprocal-rank fusion:
    * BM25 top-50 candidates, embedding re-rank against the label-0
    * centroid query vector, fused by RRF (k=60) — the standard
    * two-tower retrieval shape. Only INTEGER ranks are emitted; the
    * RRF sum orders the output but never leaves the engine, and ties
    * (symmetric rank pairs) break on doc_id. The rank windows span
    * only the k-bounded candidate set, so the unpartitioned
    * row_number is O(k), not O(corpus).
    */
  private val hybridOracleSql: String =
    s"""WITH cand AS (
       |  SELECT doc_id,
       |         row_number() OVER (ORDER BY score DESC, doc_id)
       |           AS rank_bm25
       |  FROM (${Search.bm25OracleSql(bm25Terms, k = 50)
             .linesIterator.mkString(" ")})),
       |cent AS (
       |  SELECT list(c ORDER BY dim) AS cvec FROM (
       |    SELECT dim, round(avg(v), 6) AS c
       |    FROM (SELECT unnest(CAST(embedding AS DOUBLE[])) AS v,
       |                 unnest(generate_series(1, len(embedding))) AS dim
       |          FROM embeddings WHERE label = 0)
       |    GROUP BY dim)),
       |scored AS (
       |  SELECT cand.doc_id, rank_bm25,
       |         list_cosine_similarity(cvec,
       |           CAST(e.embedding AS DOUBLE[])) AS cos
       |  FROM cand JOIN embeddings e ON e.vec_id = cand.doc_id
       |  CROSS JOIN cent),
       |r2 AS (SELECT doc_id, rank_bm25,
       |              row_number() OVER (ORDER BY cos DESC, doc_id)
       |                AS rank_cos
       |       FROM scored)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |       CAST(rank_bm25 AS INT) AS rank_bm25,
       |       CAST(rank_cos AS INT) AS rank_cos
       |FROM r2
       |ORDER BY 1.0 / (60 + rank_bm25) + 1.0 / (60 + rank_cos) DESC,
       |         doc_id
       |LIMIT 10""".stripMargin

  // Both rank frames are the O(k=50) candidate slice, so the global
  // rank is a 1-row sorted-collect (state bounded by k) followed by a
  // posexplode — rank = position + 1. No unpartitioned window: the
  // WindowExec warning channel stays clean for real regressions.
  private def rankByDesc(df: org.apache.spark.sql.DataFrame,
      scoreCol: String, rankName: String,
      carry: Seq[String]): org.apache.spark.sql.DataFrame = {
    val packed = struct(
      (negate(col(scoreCol)).as("ns") +: col("doc_id").as("doc_id") +:
        carry.map(col)): _*)
    df.agg(sort_array(collect_list(packed)).as("a"))
      .select(posexplode(col("a")))
      .select((col("pos") + 1).cast("int").as(rankName) +:
        col("col.doc_id").as("doc_id") +:
        carry.map(c => col(s"col.$c").as(c)): _*)
  }

  q("hybrid_search", hybridOracleSql) { (s, d) =>
    val cand = rankByDesc(
      Search.bm25TopK(docs(s, d), bm25Terms, k = 50)
        .select(col("doc_id"), col("score")),
      "score", "rank_bm25", carry = Seq.empty)
    val cent = embs(s, d).filter(col("label") === 0)
      .select(posexplode(col("embedding").cast("array<double>"))
        .as(Seq("dim", "v")))
      .groupBy("dim").agg(round(avg(col("v")), 6).as("c"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x.getField("c")).as("cvec"))
    val reranked = rankByDesc(cand
      .join(embs(s, d).select(col("vec_id").as("doc_id"),
        col("embedding")), Seq("doc_id"))
      .crossJoin(broadcast(cent))
      .withColumn("cos", Dedup.cosineCol(col("cvec"),
        col("embedding").cast("array<double>"))),
      "cos", "rank_cos", carry = Seq("rank_bm25"))
    reranked
      .withColumn("rrf", lit(1.0) / (lit(60) + col("rank_bm25")) +
        lit(1.0) / (lit(60) + col("rank_cos")))
      .orderBy(col("rrf").desc, col("doc_id")).limit(10)
      .select("doc_id", "rank_bm25", "rank_cos")
  }

  /** End-to-end SEARCH pipeline: length gate → exact dedup (md5 keeper)
    * → BM25 query over the curated survivors. The whole composite is
    * ONE DuckDB query: curation CTEs prepended to the same generated
    * BM25 oracle — corpus statistics (N, Σdl, df) are recomputed over
    * the curated slice on both engines, so nothing about the
    * composition can drift.
    */
  private val searchPipelineOracleSql: String = Search.bm25OracleSql(
    bm25Terms, k = 15, from = "curated", preludeCtes =
      """gated AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE len(string_split(text, ' ')) >= 20),
        |curated AS (
        |  SELECT doc_id, text
        |  FROM (SELECT doc_id, text,
        |          row_number() OVER (PARTITION BY md5(text)
        |                             ORDER BY doc_id) AS rn
        |        FROM gated) WHERE rn = 1),
        |""".stripMargin)

  q("search_pipeline", searchPipelineOracleSql) { (s, d) =>
    val gated = docs(s, d)
      .filter(size(TextAnalysis.tokens(col("text"))) >= 20)
      .select(col("doc_id"), col("text"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy("doc_id")
    val curated = gated.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    Search.bm25TopK(curated, bm25Terms, k = 15)
  }

  // Keyword-in-context spans (corpus audit): every 'dup' occurrence
  // with +-3 words of context; map-local, output ∝ term frequency.
  q("t_kwic",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
      |           FROM documents)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(i AS INT) AS pos,
      |       array_to_string(ws[greatest(i - 3, 1):least(i + 3, len(ws))],
      |                       ' ') AS snippet
      |FROM t, unnest(generate_series(1, len(ws))) AS u(i)
      |WHERE ws[i] = 'dup'""") { (s, d) =>
    Search.keywordInContext(docs(s, d), term = "dup", window = 3)
  }

  // Inverted index build: token -> (df, cf, capped sorted postings).
  // Postings serialized to CSV so the relational compare stays sortable.
  q("t_inverted_index",
    """SELECT tok,
      |       CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
      |       CAST(count(*) AS BIGINT) AS coll_freq,
      |       array_to_string(list_sort(list(DISTINCT doc_id))[1:32], ',')
      |         AS postings
      |FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |             unnest(string_split(text, ' ')) AS tok
      |      FROM documents)
      |GROUP BY tok HAVING count(DISTINCT doc_id) >= 2""") { (s, d) =>
    Search.invertedIndex(docs(s, d), maxPostings = 32, minDf = 2L)
  }

  // Temperature-scaled source mixing (mC4/XLM-R alpha-sampling, alpha =
  // 0.5): integer-sqrt weights -> pure integer quota split -> md5-rank
  // membership. Quotas and membership are exact cross-engine.
  q("t_temp_mix",
    """WITH counts AS (SELECT source, count(*) AS n_s
      |                FROM documents GROUP BY source),
      |wts AS (SELECT source, n_s,
      |               CAST(floor(sqrt(CAST(n_s AS DOUBLE))) AS BIGINT) AS w
      |        FROM counts),
      |quotas AS (SELECT source, n_s, (200 * w) // (SELECT sum(w) FROM wts)
      |                  AS quota
      |           FROM wts),
      |ranked AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
      |                  row_number() OVER (PARTITION BY source
      |                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
      |                    AS rk
      |           FROM documents)
      |SELECT r.doc_id, r.source, CAST(r.rk AS BIGINT) AS rk,
      |       CAST(q.quota AS BIGINT) AS quota,
      |       CAST(q.n_s AS BIGINT) AS n_s
      |FROM ranked r JOIN quotas q USING (source)
      |WHERE r.rk <= q.quota""") { (s, d) =>
    Sampling.temperatureMix(docs(s, d), "source", "doc_id", budget = 200L)
      .select(col("doc_id"), col("source"), col("rk"), col("quota"),
        col("n_s"))
  }

  // Guaranteed heavy hitters: Misra-Gries bounded-state candidate pass
  // + exact recount of candidates only. Output provably equals the
  // exact HAVING answer (require() pins k+1 > fracDen/fracNum), which
  // is exactly what the oracle computes. The SQL is shared with the
  // streaming candidate build (`st_heavy_hitters`) — one truth, two
  // consumers, because the recount makes the answer independent of
  // WHERE the MG summary was built.
  private[graft] val heavyHittersOracleSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws
      |              FROM documents),
      |grams AS (
      |  SELECT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
      |  FROM toks, unnest(generate_series(1, len(ws) - 2)) AS t(i)
      |  WHERE len(ws) >= 3),
      |tot AS (SELECT count(*) AS n FROM grams)
      |SELECT gram, CAST(count(*) AS BIGINT) AS cnt
      |FROM grams, tot GROUP BY gram, n
      |HAVING count(*) * 59582 >= 3 * n""".stripMargin

  q("t_heavy_hitters", heavyHittersOracleSql) { (s, d) =>
    TextAnalysis.guaranteedHeavyHitters(docs(s, d), n = 3,
      fracNum = 3L, fracDen = 59582L, k = 20000)
  }

  // Count-min sketch point-frequency estimates audited against exact
  // counts: the (row, bucket) groupBy IS the distributed sketch merge
  // (shuffle bounded by d*w counters per map partition, never the
  // token stream); the oracle rebuilds the identical sketch brute-
  // force from the same md5 bucketing.
  q("t_countmin", graft.functions.CountMin.estimatesOracleSql(d = 4,
    w = 256)) { (s, d) =>
    graft.functions.CountMin.estimates(docs(s, d), d = 4, w = 256)
  }

  // Sliding-window chunking (64-token windows every 48 tokens): one
  // map-local Generate, no shuffle. DuckDB replays the window starts
  // with generate_series and inclusive list slicing.
  q("t_chunk_overlap",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
      |           FROM documents)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST((s - 1) // 48 AS INT) AS chunk_id,
      |       array_to_string(ws[s:s+63], ' ') AS chunk,
      |       CAST(len(ws[s:s+63]) AS INT) AS n_chunk_tokens
      |FROM t, unnest(generate_series(1, len(ws), 48)) AS u(s)""") { (s, d) =>
    TextAnalysis.chunkOverlap(docs(s, d), width = 64, stride = 48)
  }

  /** PII redaction: counts + scrubbed text, over documents enriched
    * with deterministic synthetic PII (email/IP/phone derived from
    * doc_id — the corpus itself is synthetic prose, so the planted
    * matches make the redaction path non-trivial on every row). The
    * oracle SQL is GENERATED from TextAnalysis.piiPatterns — same
    * patterns, same replacement order — and the patterns are
    * lookaround-free so Java regex and RE2 agree match-for-match.
    */
  private val piiOracleSql: String = {
    val enrich =
      """text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |'@mail.example.com ip 10.' || CAST(doc_id % 200 AS VARCHAR) ||
        |'.0.7 tel ' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-555-' ||
        |CAST(doc_id % 9000 + 1000 AS VARCHAR)""".stripMargin
    val counts = TextAnalysis.piiPatterns.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all(t, '$pat')) AS INT) AS n_${name}s"
    }.mkString(",\n")
    val redacted = TextAnalysis.piiPatterns.foldLeft("t") {
      case (acc, (_, pat, repl)) =>
        s"regexp_replace($acc, '$pat', '$repl', 'g')"
    }
    s"""WITH e AS (SELECT doc_id, $enrich AS t FROM documents)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |$counts,
       |$redacted AS redacted
       |FROM e""".stripMargin
  }

  q("t_pii_redact", piiOracleSql) { (s, d) =>
    val enriched = docs(s, d).select(col("doc_id"), concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com ip 10."),
      (col("doc_id") % 200).cast("string"), lit(".0.7 tel "),
      (col("doc_id") % 900 + 100).cast("string"), lit("-555-"),
      (col("doc_id") % 9000 + 1000).cast("string")).as("text"))
    TextAnalysis.piiProjection(enriched)
  }

  // Per-doc top-3 distinctive terms by tf/df — TF-IDF keywords with an
  // exact cross-engine ordering (ln is monotone, so the raw ratio
  // ranks identically to tf·idf; one IEEE division, integer outputs).
  q("t_tfidf_topk",
    """WITH tf AS (
      |  SELECT doc_id, tok AS term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |             row_number() OVER (
      |               PARTITION BY tf.doc_id
      |               ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.term)
      |               AS rank
      |      FROM tf JOIN df USING (term))
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, term,
      |       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
      |       CAST(rank AS INT) AS rank
      |FROM r WHERE rank <= 3""") { (s, d) =>
    TextAnalysis.tfIdfTopK(docs(s, d), k = 3)
  }

  // URL canonicalization + domain blocklist gate (the source-level
  // curation step every crawl pipeline runs before text dedup). The
  // corpus has no URL column, so one is synthesized deterministically
  // from (source, doc_id) — mixed case, two TLDs, query strings and
  // trailing slashes all exercised — with the SAME expression in the
  // oracle. Canonicalization is the fixed regex cascade in
  // TextAnalysis.canonicalUrl; everything is map-only. The synth +
  // canon pair is shared (one Scala builder, one SQL fragment) with
  // dd_url_dedup so the two URL entries cannot drift.
  private val urlSynthCanonSql: String =
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

  private def urlCanonFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val url = concat(lit("https://www."), upper(col("source")),
      when(col("doc_id") % 3 === 0, ".org").otherwise(".com"),
      lit("/p/"), (col("doc_id") % 7).cast("string"),
      when(col("doc_id") % 2 === 0, "?utm_source=x&ref=1")
        .when(col("doc_id") % 5 === 0, "/").otherwise(""))
    docs(s, d).select(col("doc_id"),
      TextAnalysis.canonicalUrl(url).as("url_canon"))
  }

  q("t_url_canon",
    urlSynthCanonSql +
    """
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, url_canon,
      |       split_part(url_canon, '/', 1) AS domain,
      |       CAST(split_part(url_canon, '/', 1) IN
      |         ('src1.com', 'src3.org', 'src4.com') AS INT) AS blocked
      |FROM c""".stripMargin) { (s, d) =>
    urlCanonFrame(s, d)
      .withColumn("domain", TextAnalysis.domainOf(col("url_canon")))
      .withColumn("blocked",
        col("domain").isin("src1.com", "src3.org", "src4.com").cast("int"))
  }

  // URL-level dedup (the crawl-frontier step BEFORE any text is
  // fetched, so it must run on the URL alone): canonical-URL
  // equivalence classes, keeper = min doc_id (a total order → the
  // pick is deterministic on both engines), everything else in the
  // class flagged as a URL-dup. One shuffle on the canonical URL;
  // the class table shrinks to distinct URLs and joins back
  // AQE-sized. At crawl scale the same plan holds — classes are
  // host-path-bounded, and a pathological single-URL hotspot is a
  // count, not a fan-out (the join back is class→members, never
  // members×members).
  q("dd_url_dedup",
    urlSynthCanonSql +
    """,
      |g AS (SELECT url_canon, min(doc_id) AS keeper_id,
      |             count(*) AS class_size
      |      FROM c GROUP BY 1)
      |SELECT CAST(c.doc_id AS BIGINT) AS doc_id, c.url_canon,
      |       CAST(g.keeper_id AS BIGINT) AS keeper_id,
      |       CAST(g.class_size AS BIGINT) AS class_size,
      |       CAST(CASE WHEN c.doc_id <> g.keeper_id THEN 1 ELSE 0 END
      |            AS INT) AS is_url_dup
      |FROM c JOIN g USING (url_canon)""".stripMargin) { (s, d) =>
    val c = urlCanonFrame(s, d)
    val g = c.groupBy("url_canon")
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("class_size"))
    c.join(g, "url_canon")
      .select(col("doc_id"), col("url_canon"), col("keeper_id"),
        col("class_size"),
        (col("doc_id") =!= col("keeper_id")).cast("int").as("is_url_dup"))
  }

  // Benchmark decontamination: flag corpus docs sharing any 8-gram
  // with the held-out eval slice (doc_id % 100 < 2) — train-set
  // hygiene as one exploded pass + gram-hash join.
  q("dd_decontaminate",
    """WITH w AS (SELECT doc_id, doc_id % 100 < 2 AS is_bench,
      |                  string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id, is_bench,
      |             md5(array_to_string(ws[i:i+7], ' ')) AS h
      |      FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(i)
      |      WHERE len(ws) >= 8),
      |bh AS (SELECT DISTINCT h FROM g WHERE is_bench),
      |hits AS (SELECT doc_id, count(DISTINCT h) AS n_shared
      |         FROM g JOIN bh USING (h) WHERE NOT is_bench GROUP BY 1)
      |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
      |       CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
      |       CAST(CASE WHEN coalesce(n_shared, 0) > 0 THEN 1 ELSE 0 END
      |            AS INT) AS contaminated
      |FROM (SELECT doc_id FROM documents WHERE NOT (doc_id % 100 < 2)) d
      |LEFT JOIN hits ON hits.doc_id = d.doc_id""") { (s, d) =>
    Dedup.decontaminate(docs(s, d), col("doc_id") % 100 < 2, n = 8)
  }

  // Bloom-filter decontamination: at 100 TB you broadcast the m-bit
  // bitmap of the eval set, not a join side. Relational form — the
  // DISTINCT bit-position set (<= m rows) broadcasts; docs with all
  // 3 bits present are flagged; `exact` accounts false positives.
  // m scales with the eval count (5 bits/key, floor 64) so the FP
  // rate stays ~9% at every sf — small ON PURPOSE so the FP path is
  // non-empty and oracle-checked (production bitsPerKey ~10-20).
  q("dd_bloom_decontam",
    """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
      |                  doc_id % 100 < 10 AS is_eval FROM documents),
      |n AS (SELECT greatest(64, 5 * count(*)) AS m FROM t WHERE is_eval),
      |b AS (SELECT doc_id, is_eval, md5(text) AS th,
      |             CAST(CAST(('0x' || substr(md5(concat(CAST(i AS VARCHAR),
      |                  ':', text)), 1, 8)) AS UBIGINT) % m AS BIGINT)
      |               AS bit
      |      FROM t, n, unnest([0, 1, 2]) AS u(i)),
      |bloom AS (SELECT DISTINCT bit FROM b WHERE is_eval),
      |ev AS (SELECT DISTINCT md5(text) AS th FROM t WHERE is_eval),
      |hits AS (SELECT doc_id, th, count(*) AS n_bits_hit
      |         FROM b JOIN bloom USING (bit) WHERE NOT is_eval
      |         GROUP BY doc_id, th HAVING count(*) = 3)
      |SELECT h.doc_id, CAST(n_bits_hit AS BIGINT) AS n_bits_hit,
      |       CAST(CASE WHEN e.th IS NOT NULL THEN 1 ELSE 0 END AS INT)
      |         AS exact
      |FROM hits h LEFT JOIN ev e USING (th)""") { (s, d) =>
    Dedup.bloomDecontaminate(docs(s, d), col("doc_id") % 100 < 10,
      bitsPerKey = 5, j = 3)
  }

  // Sequence packing (concat-then-chunk at 512 tokens, per source
  // shard in doc_id order): pure integer window arithmetic, exactly
  // replayable in SQL.
  q("t_seq_pack",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
      |       CAST(n AS BIGINT) AS n_tokens,
      |       CAST(s AS BIGINT) AS start_offset,
      |       CAST(s // 512 AS BIGINT) AS pack_id,
      |       CAST(s % 512 AS BIGINT) AS offset_in_pack
      |FROM (SELECT doc_id, source, n,
      |             sum(n) OVER (PARTITION BY source ORDER BY doc_id
      |                          ROWS UNBOUNDED PRECEDING) - n AS s
      |      FROM (SELECT doc_id, source,
      |                   len(string_split(text, ' ')) AS n
      |            FROM documents))""") { (s, d) =>
    Sampling.sequencePack(
      docs(s, d).select(col("doc_id"), col("source"), col("text")),
      shardCol = "source", orderCol = "doc_id",
      nTokens = size(TextAnalysis.tokens(col("text"))), capacity = 512)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("start_offset"), col("pack_id"), col("offset_in_pack"))
  }

  /** Fill-in-the-middle split prep (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle"): each
    * document gets two deterministic cut points over its token array
    * — prefix `[0,a)`, middle `[a,b)`, suffix `[b,n)` — the PSM
    * rearrangement step a code/LM pretraining pipeline applies to a
    * configured fraction of documents. The two draws come from the
    * LOW and HIGH 32-bit halves of ONE splitmix64(doc_id) mix
    * (independent enough for span placement, and exactly replayable:
    * the oracle reruns the same three mixer rounds in HUGEINT mod-2⁶⁴
    * arithmetic via SplitMix64Sql.mixAliases), each reduced mod n+1,
    * sorted. `middle_md5` fingerprints the actual extracted span —
    * the entry verifies the slice, not just the cut arithmetic.
    * Map-only, zero exchanges; at 100 TB this is a pure projection
    * pass fused into whatever scan precedes it.
    */
  q("t_fim_split",
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
      |            FROM documents),
      |h AS (SELECT doc_id, ws, len(ws) AS n,
      |             CAST(doc_id AS HUGEINT) AS x0
      |      FROM w),
      |m AS (SELECT doc_id, ws, n, ${graft.functions.SplitMix64Sql.mixAliases}
      |      FROM h),
      |cuts AS (SELECT doc_id, ws, n,
      |           CAST(least(x4 % 4294967296 % (n + 1),
      |                      x4 // 4294967296 % (n + 1)) AS BIGINT) AS a,
      |           CAST(greatest(x4 % 4294967296 % (n + 1),
      |                         x4 // 4294967296 % (n + 1)) AS BIGINT) AS b
      |         FROM m)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(n AS BIGINT) AS n_tokens,
      |       CAST(a AS BIGINT) AS cut_a, CAST(b AS BIGINT) AS cut_b,
      |       CAST(b - a AS BIGINT) AS len_middle,
      |       md5(coalesce(array_to_string(ws[a + 1:b], ' '), ''))
      |         AS middle_md5
      |FROM cuts""") { (s, d) =>
    val lo = expr("x & 4294967295L")
    val hi = shiftrightunsigned(col("x"), 32)
    docs(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
      .withColumn("n", size(col("ws")).cast("long"))
      .withColumn("x",
        graft.functions.SplitMix64.splitmix64(col("doc_id")))
      .withColumn("a", least(lo % (col("n") + 1), hi % (col("n") + 1)))
      .withColumn("b", greatest(lo % (col("n") + 1), hi % (col("n") + 1)))
      .select(col("doc_id"), col("n").as("n_tokens"),
        col("a").as("cut_a"), col("b").as("cut_b"),
        (col("b") - col("a")).as("len_middle"),
        md5(concat_ws(" ",
          slice(col("ws"), (col("a") + 1).cast("int"),
            (col("b") - col("a")).cast("int")))).as("middle_md5"))
  }

  // Packing-efficiency audit for the concat-then-chunk layout: per
  // shard, packs needed at capacity 512, padding in the final partial
  // pack, fill rate and docs-per-pack in ppm — the "how much of my
  // training batch is padding?" number. ONE map-combined aggregate.
  q("t_pack_efficiency",
    """WITH t AS (SELECT source,
      |             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total,
      |             CAST(count(*) AS BIGINT) AS n_docs
      |           FROM documents GROUP BY source)
      |SELECT source, total AS total_tokens, n_docs,
      |       CAST((total + 511) // 512 AS BIGINT) AS n_packs,
      |       CAST((total + 511) // 512 * 512 - total AS BIGINT) AS pad_tokens,
      |       CAST(total * 1000000 // ((total + 511) // 512 * 512) AS BIGINT)
      |         AS fill_ppm,
      |       CAST(n_docs * 1000000 // ((total + 511) // 512) AS BIGINT)
      |         AS docs_per_pack_ppm
      |FROM t""") { (s, d) =>
    docs(s, d)
      .groupBy("source")
      .agg(sum(size(TextAnalysis.tokens(col("text"))).cast("long"))
        .as("total_tokens"), count(lit(1)).as("n_docs"))
      .select(col("source"), col("total_tokens"), col("n_docs"),
        expr("(total_tokens + 511) div 512").as("n_packs"),
        expr("(total_tokens + 511) div 512 * 512 - total_tokens")
          .as("pad_tokens"),
        expr("total_tokens * 1000000 div ((total_tokens + 511) div 512 * 512)")
          .as("fill_ppm"),
        expr("n_docs * 1000000 div ((total_tokens + 511) div 512)")
          .as("docs_per_pack_ppm"))
  }

  /** Sequence-length planning curve: for each candidate max_seq_len
    * (64/128/256/512/1024), the two costs a context-length decision
    * trades off — hard-truncation loss (docs clipped, tokens thrown
    * away, kept share in ppm) vs the chunk-then-pad layout's padding
    * overhead (each doc split into ceil(n/L) sequences, final chunk
    * padded; utilization in ppm). The curve is what you read before
    * fixing max_seq_len: the L where trunc_lost_ppm stops falling
    * faster than chunk_util_ppm degrades. All integer arithmetic.
    *
    * Scale shape: per-doc token count is ONE map-local projection; the
    * 5-row candidate table is broadcast, so the "cross join" is a
    * map-side ×5 amplification of a single LONG column (never text),
    * then one map-combined aggregate to |L| rows. Zero corpus-keyed
    * shuffles at any scale.
    */
  /** Shared oracle for `t_seqlen_curve` and its streaming twin
    * `st_seqlen_curve` — one definition, the twins cannot drift.
    */
  val seqlenCurveSql: String =
    """WITH n AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |           FROM documents),
      |c AS (SELECT n.n, l.max_len
      |      FROM n CROSS JOIN (SELECT CAST(unnest([64, 128, 256, 512,
      |                                1024]) AS BIGINT) AS max_len) l),
      |a AS (SELECT max_len,
      |             CAST(count(*) AS BIGINT) AS n_docs,
      |             CAST(sum(n) AS BIGINT) AS total_tokens,
      |             CAST(sum(CASE WHEN n > max_len THEN 1 ELSE 0 END)
      |               AS BIGINT) AS docs_truncated,
      |             CAST(sum(least(n, max_len)) AS BIGINT) AS kept_trunc,
      |             CAST(sum(greatest(n - max_len, 0)) AS BIGINT)
      |               AS lost_trunc,
      |             CAST(sum((n + max_len - 1) // max_len * max_len - n)
      |               AS BIGINT) AS chunk_pad_tokens,
      |             CAST(sum((n + max_len - 1) // max_len) AS BIGINT)
      |               AS n_chunks
      |      FROM c GROUP BY max_len)
      |SELECT max_len, n_docs, total_tokens, docs_truncated, kept_trunc,
      |       lost_trunc,
      |       CAST(kept_trunc * 1000000 // total_tokens AS BIGINT)
      |         AS kept_trunc_ppm,
      |       chunk_pad_tokens, n_chunks,
      |       CAST(total_tokens * 1000000 //
      |            (total_tokens + chunk_pad_tokens) AS BIGINT)
      |         AS chunk_util_ppm
      |FROM a""".stripMargin

  /** The per-candidate accounting shared by `t_seqlen_curve` and its
    * streaming twin: takes any (batch OR streaming) docs-shaped frame,
    * amplifies the per-doc token count ×|L| against the broadcast
    * candidate table, and reduces map-combined to |L| rows of raw
    * sums. The ppm derivations live in [[seqlenDerive]] so the
    * streaming twin can run them as a post-pass (a streaming agg
    * cannot chain a second projection-with-division safely inside
    * complete mode restarts — and needn't: the sink IS the raw sums).
    */
  def seqlenSums(docsDf: DataFrame): DataFrame = {
    val lens = docsDf.sparkSession.range(0, 1).select(
      explode(array(Seq(64L, 128L, 256L, 512L, 1024L).map(lit): _*))
        .as("max_len"))
    docsDf
      .select(size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .crossJoin(broadcast(lens))
      .groupBy("max_len")
      .agg(count(lit(1)).as("n_docs"),
        sum("n").as("total_tokens"),
        sum(when(col("n") > col("max_len"), 1L).otherwise(0L))
          .as("docs_truncated"),
        sum(least(col("n"), col("max_len"))).as("kept_trunc"),
        sum(greatest(col("n") - col("max_len"), lit(0L))).as("lost_trunc"),
        sum(expr("(n + max_len - 1) div max_len * max_len - n"))
          .as("chunk_pad_tokens"),
        sum(expr("(n + max_len - 1) div max_len")).as("n_chunks"))
  }

  /** ppm derivations over [[seqlenSums]]' |L|-row output. */
  def seqlenDerive(sums: DataFrame): DataFrame =
    sums.select(col("max_len"), col("n_docs"), col("total_tokens"),
      col("docs_truncated"), col("kept_trunc"), col("lost_trunc"),
      expr("kept_trunc * 1000000 div total_tokens").as("kept_trunc_ppm"),
      col("chunk_pad_tokens"), col("n_chunks"),
      expr("total_tokens * 1000000 div (total_tokens + chunk_pad_tokens)")
        .as("chunk_util_ppm"))

  q("t_seqlen_curve", seqlenCurveSql) { (s, d) =>
    seqlenDerive(seqlenSums(docs(s, d)))
  }

  // Seeded stratified sampling (Spark-side reproducible only).
  // Deterministic stratified sample: membership = pure function of the
  // id hash, so DuckDB reproduces the exact row set from the same md5.
  q("t_stratified_det",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
      |FROM documents
      |WHERE CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |           AS UBIGINT) % 100 AS INT) <
      |      CASE lang WHEN 'en' THEN 10 WHEN 'fr' THEN 50 WHEN 'es' THEN 30
      |                WHEN 'de' THEN 20 WHEN 'zh' THEN 100 ELSE -1 END""") { (s, d) =>
    Sampling.deterministicStratifiedSample(docs(s, d), "lang", "doc_id",
        Map("en" -> 0.1, "fr" -> 0.5, "es" -> 0.3, "de" -> 0.2, "zh" -> 1.0))
      .select(col("doc_id"), col("lang"))
  }

  qNoOracle("t_stratified_sample") { (s, d) =>
    val base = docs(s, d)
    val langs = Seq("en", "es", "de", "fr", "zh", "ja", "ru", "ar",
      "it", "pt", "nl", "ko")
    Sampling.stratifiedSample(base, "lang",
        langs.map(_ -> 0.5).toMap, seed = 42L)
      .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
  }

  // End-to-end curation pipeline: quality gate -> langid -> exact +
  // near dedup -> reproducible split, then corpus stats.
  /** The ENTIRE curation pipeline (quality gate → language ID → exact
    * dedup → MinHash-LSH candidates → exact n-gram verification →
    * victim removal → hash split → stats) reproduced as one DuckDB
    * query, assembled from the same fragment generators as the
    * per-operator oracles (marker lists, minhash params) so nothing can
    * drift. Stats are exact scaled-integer ratios — engine- and
    * order-independent.
    */
  private val docPipelineOracleSql: String = {
    val M = "CAST('18446744073709551616' AS HUGEINT)"
    val H = "CAST('9223372036854775808' AS HUGEINT)"
    val P = "CAST('1099511628211' AS HUGEINT)"
    val B = "CAST('14695981039346656037' AS HUGEINT)"
    val ps = Dedup.minhashParams(32, 42L)
    val aL = ps.map(p => s"CAST('${p._1}' AS HUGEINT)")
      .mkString("[", ", ", "]")
    val bL = ps.map(p => s"CAST('${p._2}' AS HUGEINT)")
      .mkString("[", ", ", "]")
    val stopList = Seq("the", "a", "an", "of", "and", "or", "to", "in",
      "is", "it", "for", "on", "with", "as", "at", "by")
      .map(w => s"'$w'").mkString("(", ",", ")")
    val scores = TextAnalysis.langMarkers.map { case (lang, ms) =>
      val lst = ms.map(m => s"'$m'").mkString("[", ", ", "]")
      s"len(list_filter(string_split(lower(text), ' '), " +
        s"t -> list_contains($lst, t))) AS s_$lang"
    }.mkString(",\n")
    val gArgs = TextAnalysis.langMarkers.map("s_" + _._1).mkString(", ")
    val markerWhens = TextAnalysis.langMarkers.map { case (lang, _) =>
      s"WHEN s_$lang = best THEN '$lang'"
    }.mkString("\n")
    val shares = TextAnalysis.scriptRanges.map { case (lang, pat) =>
      s"CASE WHEN length(joined) > 0 THEN (length(joined) - " +
        s"length(regexp_replace(joined, '$pat', '', 'g'))) * 1.0 / " +
        s"length(joined) ELSE 0 END AS share_$lang"
    }.mkString(",\n")
    val scriptWhens = TextAnalysis.scriptRanges.map { case (lang, _) =>
      s"WHEN share_$lang > 0.3 THEN '$lang'"
    }.mkString("\n")
    s"""WITH q AS (
       |  SELECT doc_id, text, lang,
       |         len(string_split(text, ' ')) AS n_tokens,
       |         len(list_filter(string_split(text, ' '), x -> x IN $stopList)) AS n_stop,
       |         length(text) AS n_chars
       |  FROM documents),
       |q2 AS (
       |  SELECT *, round(least(n_stop / n_tokens * 2.5, 1.0) * 0.5 +
       |             least((n_chars - (n_tokens - 1)) / n_tokens / 8.0, 1.0) * 0.5, 4) AS quality_score
       |  FROM q),
       |gated AS (SELECT * FROM q2 WHERE n_tokens >= 10 AND quality_score >= 0.2),
       |bgR AS (
       |  SELECT doc_id, n_tokens, ws[i] || ' ' || ws[i+1] AS g
       |  FROM (SELECT doc_id, n_tokens, string_split(text, ' ') AS ws
       |        FROM gated) gw,
       |       unnest(generate_series(1, len(ws) - 1)) AS t(i)),
       |topR AS (
       |  SELECT doc_id, max(n_tokens) AS ntok, max(c) AS topc
       |  FROM (SELECT doc_id, n_tokens, g, count(*) AS c
       |        FROM bgR GROUP BY 1, 2, 3)
       |  GROUP BY doc_id),
       |gated2 AS (
       |  SELECT g.* FROM gated g JOIN topR r ON r.doc_id = g.doc_id
       |  WHERE r.topc * 2 * 1000 <= r.ntok * 200),
       |lidf AS (SELECT *, replace(text, ' ', '') AS joined FROM gated2),
       |lid1 AS (
       |  SELECT *,
       |$shares,
       |$scores
       |  FROM lidf),
       |lid2 AS (SELECT *, greatest($gArgs) AS best FROM lid1),
       |langed AS (
       |  SELECT doc_id, text, lang, n_tokens, quality_score,
       |         CASE
       |$scriptWhens
       |WHEN best = 0 THEN 'und'
       |$markerWhens
       |ELSE 'und' END AS lang_pred
       |  FROM lid2),
       |keep AS (SELECT min(doc_id) AS doc_id FROM langed GROUP BY text),
       |dedup2 AS (SELECT l.* FROM langed l JOIN keep k ON l.doc_id = k.doc_id),
       |toksM AS (SELECT doc_id, string_split(text, ' ') AS l FROM dedup2),
       |shM AS (
       |  SELECT doc_id, array_to_string(l[i:i+2], ' ') AS s
       |  FROM toksM, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
       |shhM AS (
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend($B,
       |        list_transform(range(1, length(s) + 1),
       |          i -> CAST(ord(substr(s, CAST(i AS INT), 1)) AS HUGEINT))),
       |      (acc, ch) -> ((acc - (acc % 256) +
       |          CAST(xor(CAST(acc % 256 AS BIGINT), CAST(ch AS BIGINT)) AS HUGEINT))
       |          * $P) % $M) AS x
       |  FROM shM),
       |uhM AS (
       |  SELECT doc_id, f,
       |         (((($aL[f + 1] * (x // 4294967296)) % 4294967296) * 4294967296
       |            + $aL[f + 1] * (x % 4294967296)) + $bL[f + 1]) % $M AS u
       |  FROM shhM, unnest(generate_series(0, 31)) AS g(f)),
       |sigM AS (
       |  SELECT doc_id, f,
       |         min(CAST(CASE WHEN u >= $H THEN u - $M ELSE u END AS BIGINT)) AS mh
       |  FROM uhM GROUP BY doc_id, f),
       |siglM AS (SELECT doc_id, list(mh ORDER BY f) AS sig FROM sigM GROUP BY doc_id),
       |bandedM AS (
       |  SELECT doc_id, sig, band,
       |    list_reduce(
       |      list_prepend($B,
       |        list_transform(sig[band * 4 + 1 : band * 4 + 4],
       |          s -> (CASE WHEN s < 0 THEN CAST(s AS HUGEINT) + $M ELSE CAST(s AS HUGEINT) END))),
       |      (acc, v) -> (((
       |          CAST(xor(CAST(acc // 4294967296 AS BIGINT), CAST(v // 4294967296 AS BIGINT)) AS HUGEINT) * 4294967296
       |          + CAST(xor(CAST(acc % 4294967296 AS BIGINT), CAST(v % 4294967296 AS BIGINT)) AS HUGEINT))
       |        * $P) % $M)) AS bucket
       |  FROM siglM, unnest(generate_series(0, 7)) AS g(band)),
       |okb AS (
       |  SELECT band, bucket FROM bandedM GROUP BY band, bucket
       |  HAVING count(*) BETWEEN 2 AND 64),
       |cands AS (
       |  SELECT DISTINCT p.doc_id AS doc_a, q.doc_id AS doc_b, p.sig AS sa, q.sig AS sb
       |  FROM bandedM p
       |  JOIN bandedM q ON p.band = q.band AND p.bucket = q.bucket AND p.doc_id < q.doc_id
       |  JOIN okb ob ON ob.band = p.band AND ob.bucket = p.bucket),
       |cand2 AS (
       |  SELECT doc_a, doc_b FROM cands
       |  WHERE len(list_filter(range(1, 33), i -> sa[CAST(i AS INT)] = sb[CAST(i AS INT)])) / 32.0 >= 0.55),
       |gramsV AS (
       |  SELECT DISTINCT t.doc_id, array_to_string(t.l[i:i+2], ' ') AS gm
       |  FROM toksM t, unnest(generate_series(1, greatest(len(t.l) - 2, 1))) AS u(i)),
       |cntV AS (SELECT doc_id, count(*) AS n_grams FROM gramsV GROUP BY doc_id),
       |interV AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
       |  FROM cand2 c
       |  JOIN gramsV ga ON ga.doc_id = c.doc_a
       |  JOIN gramsV gb ON gb.doc_id = c.doc_b AND gb.gm = ga.gm
       |  GROUP BY c.doc_a, c.doc_b),
       |victims AS (
       |  SELECT DISTINCT i.doc_b AS doc_id
       |  FROM interV i
       |  JOIN cntV ca ON ca.doc_id = i.doc_a
       |  JOIN cntV cb ON cb.doc_id = i.doc_b
       |  WHERE round(n_inter / (ca.n_grams + cb.n_grams - n_inter), 4) >= 0.8),
       |final AS (
       |  SELECT d.* FROM dedup2 d
       |  WHERE d.doc_id NOT IN (SELECT doc_id FROM victims)),
       |wAll AS (SELECT doc_id, doc_id % 100 < 2 AS is_bench,
       |                string_split(text, ' ') AS ws FROM documents),
       |gD AS (SELECT doc_id, is_bench,
       |              md5(array_to_string(ws[i:i+7], ' ')) AS h
       |       FROM wAll, unnest(generate_series(1, len(ws) - 7)) AS t(i)
       |       WHERE len(ws) >= 8),
       |bhD AS (SELECT DISTINCT h FROM gD WHERE is_bench),
       |contD AS (SELECT DISTINCT doc_id FROM gD JOIN bhD USING (h)
       |          WHERE NOT is_bench),
       |final2 AS (
       |  SELECT f.* FROM final f
       |  WHERE NOT (f.doc_id % 100 < 2)
       |    AND f.doc_id NOT IN (SELECT doc_id FROM contD)),
       |sp AS (
       |  SELECT *,
       |    CASE WHEN CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS INT) < 80
       |         THEN 'train' ELSE 'test' END AS split
       |  FROM final2)
       |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CAST(n_tokens AS BIGINT) * 10000) // count(*) AS BIGINT) AS avg_tokens_u,
       |       CAST(sum(CAST(round(quality_score * 10000) AS BIGINT)) // count(*) AS BIGINT) AS avg_quality_u,
       |       CAST(count(DISTINCT lang_pred) AS BIGINT) AS n_langs
       |FROM sp GROUP BY split""".stripMargin
  }

  q("doc_pipeline", docPipelineOracleSql) { (s, d) =>
    DocPipeline.stats(DocPipeline.curate(s, docs(s, d),
      DocPipeline.CurationParams(maxTopBigramPermille = 200,
        benchmarkPct = 2)))
  }

  // ------------------------------------------------------- data layout

  /** Z-order key as exact integer arithmetic on both engines: the bit
    * interleave is a sum of `(x DIV 2^b) % 2 * 2^(2b)` terms in DuckDB
    * and shift/and/or in Spark — integers, no float anywhere.
    */
  private val zorderOracleSql: String = {
    val terms = (0 until 16).map { b =>
      s"((zx // ${1L << b}) % 2) * ${1L << (2 * b)} + " +
        s"((zy // ${1L << b}) % 2) * ${1L << (2 * b + 1)}"
    }.mkString(" + ")
    s"""SELECT CAST(event_id AS BIGINT) AS event_id,
       |       CAST(zx AS BIGINT) AS zx, CAST(zy AS BIGINT) AS zy,
       |       CAST($terms AS BIGINT) AS zkey
       |FROM (SELECT event_id, user_id % 65536 AS zx,
       |             event_id % 65536 AS zy
       |      FROM events)""".stripMargin
  }

  q("s_zorder_key", zorderOracleSql) { (s, d) =>
    graft.io.Tables.load(s, d, "events")
      .select(col("event_id"), (col("user_id") % 65536).as("zx"),
        (col("event_id") % 65536).as("zy"))
      .withColumn("zkey",
        graft.io.ZOrder.zorderKey(col("zx"), col("zy"), 16))
  }

  // --------------------------------------------------------- CSV sinks

  /** S3/S4 (`calculations/polytrend.py:483,491`): the reference writes
    * the assembled series and the analysis results to CSV. The sink is
    * oracle-checked as a ROUND-TRIP: write → read back with an explicit
    * schema → hash against the DuckDB query computing the same table
    * directly. A pass proves the sink is lossless — shortest-repr
    * doubles, dates, and NULLs all survive the text encoding.
    */
  /** One fixed scratch dir per (JVM, sink name): repeated
    * correctness/bench invocations overwrite in place instead of
    * leaking a fresh temp directory per run; the JVM removes the tree
    * on exit.
    */
  private val scratchDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def scratchDir(name: String): String =
    scratchDirs.computeIfAbsent(name, { n =>
      val p = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), s"graft_sink_$n")
      sys.addShutdownHook { // one hook per name for the whole JVM
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.exists(p))
          java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
            .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
      p.toString
    })

  private def csvRoundTrip(s: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame, name: String,
      schema: String): org.apache.spark.sql.DataFrame = {
    val dir = scratchDir(s"csv_$name")
    TrendPipeline.writeCsv(df, dir)
    s.read.option("header", "true").schema(schema).csv(dir)
  }

  // S3: the per-pixel SERIES table (monthly composite over the
  // events-as-observations mapping) through the CSV sink.
  q("s3_csv_roundtrip",
    """SELECT CAST(user_id AS DOUBLE) AS longitude,
      |       CAST(0.0 AS DOUBLE) AS latitude,
      |       CAST(year(ts) * 12 + month(ts) AS INT) AS bucket,
      |       round(avg(value), 6) AS value
      |FROM events GROUP BY 1, 2, 3""") { (s, d) =>
    val series = TrendPipeline.monthlyComposite(
        TrendPipeline.eventsAsObservations(s, d))
      .withColumn("value", round(col("value"), 6))
    csvRoundTrip(s, series, "s3",
      "longitude DOUBLE, latitude DOUBLE, bucket INT, value DOUBLE")
  }

  // S4: the per-key RESULTS table (K1 linear fit surface) through the
  // CSV sink — same fit the oracle cross-checks via regr_*.
  q("s4_csv_roundtrip",
    """SELECT CAST(user_id AS BIGINT) AS user_id,
      |       round(regr_slope(value, date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))), 6) AS slope,
      |       round(regr_intercept(value, date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))), 6) AS icept
      |FROM events GROUP BY user_id""") { (s, d) =>
    val x = datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
    val results = Tables.load(s, d, "events").groupBy("user_id")
      .agg(round(regr_slope(col("value"), x), 6).as("slope"),
        round(regr_intercept(col("value"), x), 6).as("icept"))
    csvRoundTrip(s, results, "s4",
      "user_id BIGINT, slope DOUBLE, icept DOUBLE")
  }

  // S5: JSONL sink + source round trip — the interchange format every
  // training-data pipeline speaks. Write the curated quality
  // projection as newline-delimited JSON, read it back with an
  // explicit schema (schema inference would re-scan at scale), and
  // hash-compare against the oracle computing the same projection
  // directly. Exercises string escaping, nested-free flat records,
  // and the read path's column pruning.
  q("s5_jsonl_roundtrip",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source,
      |       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
      |FROM documents""") { (s, d) =>
    val df = docs(s, d).select(col("doc_id"), col("lang"), col("source"),
      size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
    val dir = scratchDir("jsonl_s5")
    df.write.mode("overwrite").json(dir)
    s.read.schema("doc_id BIGINT, lang STRING, source STRING, n_tokens INT")
      .json(dir)
  }

  // -------------------------------------------------------- multimodal

  q("mm_media_meta",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(length(text) AS INT) AS n_bytes,
      |       sha256(text) AS digest
      |FROM documents""") { (s, d) =>
    Multimodal.payloads(s, d).select(col("doc_id"),
      col("n_bytes"), sha2(col("payload"), 256).as("digest"))
  }

  /** The DSv2 source's synthetic content replayed in DuckDB: the value
    * is season (sin — verified bit-equal between Java's and DuckDB's
    * libm on every generated day) + linear trend + splitmix64 noise.
    * The splitmix rounds run in HUGEINT mod-2^64 arithmetic (XOR via
    * 32-bit halves, multiply via 32-bit split — the same toolkit the
    * SimHash/rolling-hash oracles use), so an engine sharing no JVM
    * code reproduces every observation bit-for-bit.
    */
  private val srcOracleSql: String = {
    val startDay = java.time.LocalDate.parse("2020-01-01").toEpochDay
    val endDay = java.time.LocalDate.parse("2021-01-01").toEpochDay
    val minDay = java.time.LocalDate.parse("2020-03-01").toEpochDay
    val (cadence, pixels, seed) = (16, 4, 42L)
    val M64 = "18446744073709551616" // 2^64
    def u(x: Long) = java.lang.Long.toUnsignedString(x)
    // XOR of two HUGEINTs in [0, 2^64): 32-bit halves through BIGINT xor
    def xor64(a: String, b: String): String =
      s"(CAST(xor(CAST(($a) // 4294967296 AS BIGINT), " +
        s"CAST(($b) // 4294967296 AS BIGINT)) AS HUGEINT) * 4294967296 + " +
        s"CAST(xor(CAST(($a) % 4294967296 AS BIGINT), " +
        s"CAST(($b) % 4294967296 AS BIGINT)) AS HUGEINT))"
    // (x * m) mod 2^64 with m a u64 constant: 32-bit split product
    def mulmod(x: String, m: Long): String = {
      val mhi = (m >>> 32) & 0xffffffffL
      val mlo = m & 0xffffffffL
      s"(((($x) % 4294967296) * $mlo + " +
        s"(((($x) % 4294967296) * $mhi + (($x) // 4294967296) * $mlo) " +
        s"% 4294967296) * 4294967296) % $M64)"
    }
    s"""SELECT CAST(px AS DOUBLE) AS longitude, CAST(py AS DOUBLE) AS latitude,
       |       CAST(count(*) AS BIGINT) AS n_obs,
       |       round(avg(v), 6) AS mean_v
       |FROM (
       |  SELECT px, py, day,
       |    CAST(xor(xor(xor(CAST($seed AS BIGINT),
       |         CAST(px AS BIGINT) * 1099511627776),
       |         CAST(py AS BIGINT) * 1048576), CAST(day AS BIGINT))
       |         AS HUGEINT) AS x0,
       |    (x0 + ${u(0x9e3779b97f4a7c15L)}) % $M64 AS x1,
       |    ${mulmod(xor64("x1", "x1 // 1073741824"), 0xbf58476d1ce4e5b9L)} AS x2,
       |    ${mulmod(xor64("x2", "x2 // 134217728"), 0x94d049bb133111ebL)} AS x3,
       |    ${xor64("x3", "x3 // 2147483648")} AS x4,
       |    CAST(x4 // 2048 AS DOUBLE) / 9007199254740992.0 - 5e-1 AS noise,
       |    5e-1 + 3e-1 * sin(2 * pi() * (day % 365) / 365.0)
       |      + 1e-4 * day * ((px + py) % 3 - 1) + 5e-2 * noise AS v
       |  FROM unnest(generate_series(0, ${pixels - 1})) AS gx(px),
       |       unnest(generate_series(0, ${pixels - 1})) AS gy(py),
       |       unnest(generate_series($startDay, ${endDay - 1}, $cadence))
       |         AS gd(day)
       |  WHERE day >= $minDay)
       |GROUP BY px, py""".stripMargin
  }

  // DSv2 collection source (graft.sources.ObservationCollection): the
  // reference's parametric image-collection scan as a planned, pruned,
  // pushed-down Spark source — now ORACLE-CHECKED: the deterministic
  // content is replayed in DuckDB (srcOracleSql), so the source's
  // partition planning, pushdown-pruning, and generator all verify
  // against an external engine.
  q("src_collection_scan", srcOracleSql) { (s, _) =>
    s.read.format("observation-collection")
      .option("pixels", "4").option("start", "2020-01-01")
      .option("end", "2021-01-01").option("cadence_days", "16")
      .load()
      .filter(col("time") >= lit("2020-03-01").cast("timestamp"))
      .groupBy(col("longitude"), col("latitude"))
      .agg(count(lit(1)).as("n_obs"), round(avg("value"), 6).as("mean_v"))
  }

  // Feature extraction over the mapPartitions decode path, yet fully
  // oracle-checked: the stub's Java-31 byte checksum is reproduced in
  // DuckDB with mod-2^64 HUGEINT folds (list_reduce over ord()), the
  // arithmetic >> 8 via exact floor division, and the mean as a
  // truncated integer ratio — every column independently confirmed by
  // an engine that shares no code with the JVM loop. (Corpus is ASCII,
  // so ord == byte.)
  q("mm_media_features",
    """WITH b AS (
      |  SELECT doc_id,
      |         list_transform(range(1, length(text) + 1),
      |             i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS HUGEINT)) AS bytes
      |  FROM documents),
      |cc AS (
      |  SELECT doc_id, len(bytes) AS n_bytes,
      |         list_reduce(bytes,
      |             (a, x) -> (a * 31 + x) % CAST('18446744073709551616' AS HUGEINT)) AS u,
      |         list_aggregate(bytes, 'sum') AS bsum
      |  FROM b),
      |s AS (
      |  SELECT doc_id, n_bytes, bsum,
      |         CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
      |                   THEN u - CAST('18446744073709551616' AS HUGEINT)
      |                   ELSE u END AS BIGINT) AS checksum
      |  FROM cc)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_bytes AS INT) AS n_bytes,
      |       checksum,
      |       CAST(16 + abs(checksum) % 48 AS INT) AS width,
      |       CAST(16 + abs((checksum - ((checksum % 256 + 256) % 256)) // 256) % 48 AS INT) AS height,
      |       CAST(bsum * 10000 // n_bytes AS BIGINT) AS mean_u
      |FROM s""") { (s, d) =>
    Multimodal.extractFeatures(s, Multimodal.payloads(s, d)).toDF()
      .select(col("doc_id"), col("n_bytes"), col("checksum"),
        col("width"), col("height"),
        expr("sum_bytes * 10000 div n_bytes").as("mean_u"))
  }

  // Frame sampling over the payload (every 2nd 32-byte frame), each
  // frame fingerprinted by the native RollingHash expression — DuckDB
  // replays the slicing and the mod-2^64 polynomial fold per frame.
  q("mm_frame_sample",
    """WITH f AS (
      |  SELECT doc_id, length(text) // 32 AS n_frames, i AS frame_idx,
      |         substr(text, CAST(i * 32 + 1 AS INT), 32) AS frame
      |  FROM documents,
      |       unnest(generate_series(0, length(text) // 32 - 1)) AS t(i)
      |  WHERE length(text) // 32 > 0 AND i % 2 = 0),
      |h AS (
      |  SELECT doc_id, n_frames, frame_idx,
      |         list_reduce(
      |           list_prepend(CAST(0 AS HUGEINT),
      |             list_transform(range(1, length(frame) + 1),
      |               j -> CAST(ord(substr(frame, CAST(j AS INT), 1)) AS HUGEINT))),
      |           (acc, ch) -> (acc * 1000003 + ch)
      |                        % CAST('18446744073709551616' AS HUGEINT)) AS u
      |  FROM f)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(n_frames AS INT) AS n_frames,
      |       CAST(frame_idx AS INT) AS frame_idx,
      |       CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
      |                 THEN u - CAST('18446744073709551616' AS HUGEINT)
      |                 ELSE u END AS BIGINT) AS frame_fp
      |FROM h""") { (s, d) =>
    Multimodal.frameSample(Multimodal.payloads(s, d), frameBytes = 32,
      everyK = 2)
  }

  // Near-dup media by shared frame fingerprints — see
  // Multimodal.frameOverlapPairs; the oracle replays the frame slice +
  // HUGEINT rolling-hash fold, then the same posting self-join and
  // integer overlap arithmetic.
  q("mm_frame_overlap",
    """WITH f AS (
      |  SELECT doc_id, i AS frame_idx,
      |         substr(text, CAST(i * 32 + 1 AS INT), 32) AS frame
      |  FROM documents,
      |       unnest(generate_series(0, length(text) // 32 - 1)) AS t(i)
      |  WHERE length(text) // 32 > 0 AND i % 2 = 0),
      |h AS (
      |  SELECT DISTINCT doc_id,
      |         list_reduce(
      |           list_prepend(CAST(0 AS HUGEINT),
      |             list_transform(range(1, length(frame) + 1),
      |               j -> CAST(ord(substr(frame, CAST(j AS INT), 1))
      |                         AS HUGEINT))),
      |           (acc, ch) -> (acc * 1000003 + ch)
      |                        % CAST('18446744073709551616' AS HUGEINT))
      |           AS fp
      |  FROM f),
      |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp
      |        FROM h GROUP BY 1),
      |pr AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |              CAST(count(*) AS BIGINT) AS n_shared
      |       FROM h x JOIN h y ON x.fp = y.fp AND x.doc_id < y.doc_id
      |       GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT CAST(doc_a AS BIGINT) AS doc_a,
      |       CAST(doc_b AS BIGINT) AS doc_b, n_shared,
      |       ca.n_fp AS fp_a, cb.n_fp AS fp_b,
      |       CAST(n_shared * 1000000 // least(ca.n_fp, cb.n_fp)
      |            AS BIGINT) AS overlap_ppm
      |FROM pr JOIN cnt ca ON ca.doc_id = doc_a
      |        JOIN cnt cb ON cb.doc_id = doc_b""") { (s, d) =>
    Multimodal.frameOverlapPairs(Multimodal.payloads(s, d),
      frameBytes = 32, everyK = 2, minShared = 2)
  }

  // Resize plumbing: stub-decoded dims -> target dims + exact scale
  // factors (one int/int division each — identical IEEE on both
  // engines, then round 6).
  q("mm_resize",
    """WITH b AS (
      |  SELECT doc_id,
      |         list_transform(range(1, length(text) + 1),
      |             i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS HUGEINT)) AS bytes
      |  FROM documents),
      |cc AS (
      |  SELECT doc_id,
      |         list_reduce(bytes,
      |             (a, x) -> (a * 31 + x) % CAST('18446744073709551616' AS HUGEINT)) AS u
      |  FROM b),
      |s AS (
      |  SELECT doc_id,
      |         CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
      |                   THEN u - CAST('18446744073709551616' AS HUGEINT)
      |                   ELSE u END AS BIGINT) AS checksum
      |  FROM cc),
      |dims AS (
      |  SELECT doc_id,
      |         CAST(16 + abs(checksum) % 48 AS INT) AS width,
      |         CAST(16 + abs((checksum - ((checksum % 256 + 256) % 256)) // 256) % 48 AS INT) AS height
      |  FROM s)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, width, height,
      |       CAST(64 AS INT) AS target_w, CAST(64 AS INT) AS target_h,
      |       round(CAST(64 AS DOUBLE) / width, 6) AS scale_x,
      |       round(CAST(64 AS DOUBLE) / height, 6) AS scale_y
      |FROM dims""") { (s, d) =>
    Multimodal.resizePlan(
      Multimodal.extractFeatures(s, Multimodal.payloads(s, d)), 64, 64)
  }

  /** Shared DuckDB replay of the byte-histogram triage: the
    * ord()-explode histogram + the same struct-max tiebreak,
    * relationally — ONE oracle text for both the explode form and its
    * bounded-aggregate twin, so the two Spark implementations are
    * pinned to the same external truth (and to each other).
    */
  private[graft] val byteTriageOracleSql: String =
    """WITH b AS (
      |  SELECT doc_id, ord(substr(text, CAST(i AS INT), 1)) AS byte
      |  FROM documents,
      |       unnest(generate_series(1, length(text))) AS u(i)),
      |h AS (SELECT doc_id, byte, CAST(count(*) AS BIGINT) AS c
      |      FROM b GROUP BY 1, 2),
      |top AS (SELECT doc_id, byte AS top_byte, c AS top_count
      |        FROM (SELECT doc_id, byte, c,
      |                row_number() OVER (PARTITION BY doc_id
      |                                   ORDER BY c DESC, byte) AS rn
      |              FROM h) WHERE rn = 1),
      |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bytes,
      |               CAST(count(*) AS BIGINT) AS n_distinct_bytes,
      |               CAST(sum(c * c) AS BIGINT) AS simpson_u,
      |               CAST(sum(CASE WHEN byte BETWEEN 32 AND 126
      |                             THEN c ELSE 0 END) AS BIGINT) AS pr
      |        FROM h GROUP BY doc_id)
      |SELECT CAST(a.doc_id AS BIGINT) AS doc_id, a.n_bytes,
      |       a.n_distinct_bytes,
      |       CAST(t.top_byte AS INT) AS top_byte, t.top_count,
      |       CAST(a.pr * 1000000 // a.n_bytes AS BIGINT)
      |         AS printable_ppm,
      |       a.simpson_u,
      |       CASE WHEN a.pr * 1000000 // a.n_bytes >= 950000
      |            THEN 'text' ELSE 'binary' END AS verdict
      |FROM agg a JOIN top t ON t.doc_id = a.doc_id""".stripMargin

  // Byte-level payload triage (r12): the pre-decode gate of the media
  // family — histogram summary stats (distinct bytes, dominant byte
  // with lower-value tiebreak, printable share, Σc² Simpson collision
  // mass) flag corrupt/degenerate/mislabeled payloads with exact
  // integers only.
  q("mm_byte_triage", byteTriageOracleSql) { (s, d) =>
    Multimodal.byteTriage(Multimodal.payloads(s, d))
  }

  // The bounded-state twin (r13, r12 verdict #4): the SAME summary via
  // graft.functions.ByteTriageAgg — one row per payload through the
  // plan instead of one per byte (10⁶/doc at MB-scale media), 256-slot
  // aggregate state. Shares the explode form's oracle VERBATIM, so the
  // two implementations are pinned to one truth; the bench A/B
  // (mm_byte_triage vs mm_byte_triage_agg) prices explode-vs-aggregate.
  q("mm_byte_triage_agg", byteTriageOracleSql) { (s, d) =>
    Multimodal.byteTriageAgg(Multimodal.payloads(s, d))
  }

  // Magic-byte format sniffing (r13, r12 verdict #5 — the production
  // extension byteTriage's docstring promised, realized): broadcast
  // (first-4-BYTES prefix -> format) table joined on each payload's
  // hex-encoded prefix, triage verdict as the fallback. BYTE-level on
  // purpose (r13 self-review): a char-level compare would UTF-8-mangle
  // every magic byte above 0x7F, so PNG/JPEG could never match a real
  // binary payload. The oracle replays the SAME magic table as a hex
  // CASE chain generated from the one Scala source of truth
  // (Multimodal.magicHexTable), so table drift between engine and
  // oracle is impossible. The corpus is prose, so every corpus row
  // exercises the miss->fallback path at scale; the raw-byte hit path
  // is spec-pinned on planted PNG/PDF/HTML payloads (PipelineOpsSpec).
  q("mm_format_sniff", {
    val chain = Multimodal.magicHexTable.map { case (hexp, fmt) =>
      s"WHEN prefix_hex = '$hexp' THEN '$fmt'"
    }.mkString("\n      |             ")
    s"""WITH b AS (
      |  SELECT doc_id, ord(substr(text, CAST(i AS INT), 1)) AS byte
      |  FROM documents,
      |       unnest(generate_series(1, length(text))) AS u(i)),
      |h AS (SELECT doc_id, byte, CAST(count(*) AS BIGINT) AS c
      |      FROM b GROUP BY 1, 2),
      |v AS (SELECT doc_id,
      |             CASE WHEN sum(CASE WHEN byte BETWEEN 32 AND 126
      |                                THEN c ELSE 0 END) * 1000000
      |                       // sum(c) >= 950000
      |                  THEN 'text' ELSE 'binary' END AS verdict
      |      FROM h GROUP BY doc_id),
      |p AS (SELECT doc_id, prefix_hex,
      |             CASE $chain
      |             END AS sf
      |      FROM (SELECT doc_id,
      |              substring(hex(encode(text)), 1, 8) AS prefix_hex
      |            FROM documents))
      |SELECT CAST(v.doc_id AS BIGINT) AS doc_id, p.prefix_hex,
      |       coalesce(p.sf, 'none') AS sniffed, v.verdict,
      |       coalesce(p.sf, v.verdict) AS format
      |FROM v JOIN p ON p.doc_id = v.doc_id""".stripMargin
  }) { (s, d) =>
    Multimodal.formatSniff(Multimodal.payloads(s, d))
  }

  // The magic-byte HIT path, oracle-checked on GENUINE binary headers
  // (r13 verdict #7): the corpus entry above is green but prose-only —
  // every corpus row takes the miss -> fallback branch, so the
  // broadcast-join verdict path on >0x7F prefixes (the bytes a string
  // cast UTF-8-mangles) was pinned only by a unit spec. The committed
  // fixture (tools/gen_media_magic.py) plants real JPEG/PNG/GIF/PDF/
  // ZIP/RAR/OGG/FLAC/RIFF/HTML/XML headers plus both fallback
  // verdicts and an exactly-4-byte payload; Spark runs the RAW-BINARY
  // sniff (byte-exact histogram — Multimodal.formatSniffBytes), and
  // DuckDB replays it from hex(payload) with strpos-decoded byte
  // values and the SAME generated magic CASE chain, so neither the
  // table nor the decode convention can drift between engines.
  q("mm_format_sniff_magic", {
    val chain = Multimodal.magicHexTable.map { case (hexp, fmt) =>
      s"WHEN prefix_hex = '$hexp' THEN '$fmt'"
    }.mkString("\n      |             ")
    val path = new java.io.File(
      "fixtures/media_magic.parquet").getAbsolutePath
    s"""WITH src AS (SELECT doc_id, hex(payload) AS hx
      |             FROM read_parquet('$path')),
      |b AS (
      |  SELECT doc_id,
      |         (strpos('0123456789ABCDEF',
      |                 substr(hx, CAST(2*i-1 AS INT), 1)) - 1) * 16 +
      |         (strpos('0123456789ABCDEF',
      |                 substr(hx, CAST(2*i AS INT), 1)) - 1) AS byte
      |  FROM src, unnest(generate_series(1, length(hx) // 2)) AS u(i)),
      |v AS (SELECT doc_id,
      |             CASE WHEN sum(CASE WHEN byte BETWEEN 32 AND 126
      |                                THEN 1 ELSE 0 END) * 1000000
      |                       // count(*) >= 950000
      |                  THEN 'text' ELSE 'binary' END AS verdict
      |      FROM b GROUP BY doc_id),
      |p AS (SELECT doc_id, prefix_hex,
      |             CASE $chain
      |             END AS sf
      |      FROM (SELECT doc_id, substring(hx, 1, 8) AS prefix_hex
      |            FROM src))
      |SELECT CAST(v.doc_id AS BIGINT) AS doc_id, p.prefix_hex,
      |       coalesce(p.sf, 'none') AS sniffed, v.verdict,
      |       coalesce(p.sf, v.verdict) AS format
      |FROM v JOIN p ON p.doc_id = v.doc_id""".stripMargin
  }) { (s, d) =>
    val media = s.read.parquet(new java.io.File(
        "fixtures/media_magic.parquet").getAbsolutePath)
      .select(col("doc_id"), col("payload"),
        lit("media/fixture").as("media_type"),
        expr("octet_length(payload)").as("n_bytes"))
    Multimodal.formatSniffBytes(media)
  }

  // Per-source data card: the one-stop corpus report a curator
  // publishes with a release — volume, token mass, mean length,
  // language mix (count + deterministic top language + its share),
  // exact-dup rate (md5 digests — text never shuffles), and mean
  // quality, all exact integers. One text pass projects the per-doc
  // metrics; everything downstream is source-keyed aggregation.
  q("t_datacard",
    """WITH m AS (
      |  SELECT source, lang, md5(text) AS dg,
      |         len(string_split(text, ' ')) AS n_toks,
      |         CAST(floor(round(least(len(list_filter(string_split(text, ' '),
      |           x -> x IN ('the','a','an','of','and','or','to','in','is',
      |                      'it','for','on','with','as','at','by'))) /
      |           len(string_split(text, ' ')) * 2.5, 1.0) * 0.5 +
      |           least((length(text) - (len(string_split(text, ' ')) - 1)) /
      |           len(string_split(text, ' ')) / 8.0, 1.0) * 0.5, 4)
      |           * 10000 + 0.5) AS BIGINT) AS score_u
      |  FROM documents),
      |agg AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(n_toks) AS BIGINT) AS n_tokens,
      |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |         CAST(count(DISTINCT dg) AS BIGINT) AS n_uniq,
      |         CAST(sum(score_u) AS BIGINT) AS sum_q
      |  FROM m GROUP BY 1),
      |lc AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      |       FROM m GROUP BY 1, 2),
      |top AS (
      |  SELECT source, lang AS top_lang, c AS top_c FROM (
      |    SELECT source, lang, c,
      |           row_number() OVER (PARTITION BY source
      |             ORDER BY c DESC, lang) AS rn
      |    FROM lc) t WHERE rn = 1)
      |SELECT a.source, n_docs, n_tokens,
      |       CAST(n_tokens * 100 // n_docs AS BIGINT) AS mean_tokens_x100,
      |       n_langs, top_lang,
      |       CAST(top_c * 1000000 // n_docs AS BIGINT) AS top_lang_ppm,
      |       CAST((n_docs - n_uniq) * 1000000 // n_docs AS BIGINT) AS dup_ppm,
      |       CAST(sum_q // n_docs AS BIGINT) AS mean_quality_u
      |FROM agg a JOIN top t ON t.source = a.source""") { (s, d) =>
    val toks = TextAnalysis.tokens(col("text"))
    val m = docs(s, d).select(col("doc_id"), col("source"), col("lang"),
        md5(col("text").cast("binary")).as("dg"),
        size(toks).cast("long").as("n_toks"))
      .join(TextAnalysis.qualityProjection(docs(s, d))
        .select(col("doc_id"),
          expr("CAST(floor(quality_score * 10000 + 0.5) AS BIGINT)")
            .as("score_u")), "doc_id")
    val agg = m.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"),
        countDistinct("lang").as("n_langs"),
        countDistinct("dg").as("n_uniq"),
        sum("score_u").as("sum_q"))
    val top = m.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("c").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"),
        col("c").as("top_c"))
    agg.join(top, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("n_tokens * 100L div n_docs").as("mean_tokens_x100"),
        col("n_langs"), col("top_lang"),
        expr("top_c * 1000000L div n_docs").as("top_lang_ppm"),
        expr("(n_docs - n_uniq) * 1000000L div n_docs").as("dup_ppm"),
        expr("sum_q div n_docs").as("mean_quality_u"))
  }

  // Top PMI token pairs (document-level co-occurrence): the
  // collocation/phrase-mining audit over the vocabulary. Pairs
  // generate MAP-LOCALLY from each doc's distinct-token array (never
  // a doc-keyed self-join); the pair aggregate map-combines before
  // its single vocab²-bounded shuffle. Ranking uses the EXACT
  // integer lift (c_ab·N·10⁶ div c_a·c_b, DECIMAL-safe) so the
  // top-50 cut has a total order — the float ln(PMI) is display-only
  // (round 6, shared expression).
  q("t_pmi_pairs",
    """WITH dt AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      |  FROM documents),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      |cu AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM dt GROUP BY 1),
      |pairs AS (
      |  SELECT a.tok AS tok_a, b.tok AS tok_b,
      |         CAST(count(*) AS BIGINT) AS c_ab
      |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
      |  GROUP BY 1, 2 HAVING count(*) >= 5)
      |SELECT tok_a, tok_b, c_ab, ca.c AS c_a, cb.c AS c_b, n_docs,
      |       CAST(CAST(c_ab AS HUGEINT) * n_docs * 1000000
      |            // (CAST(ca.c AS HUGEINT) * cb.c) AS BIGINT) AS lift_ppm,
      |       round(ln((CAST(c_ab AS DOUBLE) * n_docs) /
      |                (CAST(ca.c AS DOUBLE) * cb.c)), 6) AS pmi
      |FROM pairs JOIN cu ca ON ca.tok = tok_a
      |           JOIN cu cb ON cb.tok = tok_b, n
      |ORDER BY lift_ppm DESC, tok_a, tok_b LIMIT 50""") { (s, d) =>
    val dec = "decimal(38,0)"
    val dt = docs(s, d).select(col("doc_id"),
      explode(array_distinct(TextAnalysis.tokens(col("text")))).as("tok"))
    val n = docs(s, d).agg(count(lit(1)).as("n_docs"))
    val cu = dt.groupBy("tok").agg(count(lit(1)).as("c"))
    // map-local pair generation from the distinct-token array: the
    // a<b nested transform never shuffles the doc twice
    val pairs = docs(s, d).select(explode(expr(
      """flatten(transform(array_sort(array_distinct(split(text, ' '))), (a, i) ->
        |  transform(slice(array_sort(array_distinct(split(text, ' '))), i + 2,
        |                  size(array_distinct(split(text, ' ')))), b ->
        |    named_struct('tok_a', a, 'tok_b', b))))""".stripMargin)).as("p"))
      .select(col("p.tok_a"), col("p.tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
    pairs
      .join(cu.select(col("tok").as("tok_a"), col("c").as("c_a")), "tok_a")
      .join(cu.select(col("tok").as("tok_b"), col("c").as("c_b")), "tok_b")
      .crossJoin(broadcast(n))
      .select(col("tok_a"), col("tok_b"), col("c_ab"), col("c_a"),
        col("c_b"), col("n_docs"),
        expr(s"CAST(c_ab AS $dec) * n_docs * 1000000 div " +
          s"(CAST(c_a AS $dec) * c_b)").as("lift_ppm"),
        round(log((col("c_ab").cast("double") * col("n_docs")) /
          (col("c_a").cast("double") * col("c_b"))), 6).as("pmi"))
      .orderBy(col("lift_ppm").desc, col("tok_a"), col("tok_b"))
      .limit(50)
  }

  // Gopher-style rule-flag gate: five boolean quality rules per doc
  // (all exact integer cross-multiplied comparisons), rolled up to
  // per-source survivor counts and per-rule failure attribution — the
  // report that tells a curator WHICH threshold to move, where
  // t_quality's scalar score only says "low".
  q("t_gopher_rules",
    """WITH t AS (SELECT source, string_split(text, ' ') AS ws,
      |                  length(text) AS chars
      |           FROM documents),
      |f AS (SELECT source, len(ws) AS n, chars - (len(ws) - 1) AS letters,
      |             len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
      |               AS n_alpha,
      |             len(list_filter(ws, x -> x IN
      |               ('the','a','an','of','and','or','to','in','is','it',
      |                'for','on','with','as','at','by'))) AS n_stop,
      |             len(list_distinct(ws)) AS n_uniq
      |      FROM t),
      |g AS (SELECT source,
      |             CASE WHEN n BETWEEN 10 AND 1000 THEN 1 ELSE 0 END AS r_len,
      |             CASE WHEN letters >= n * 3 AND letters <= n * 10
      |                  THEN 1 ELSE 0 END AS r_wordlen,
      |             CASE WHEN n_alpha * 5 >= n * 4 THEN 1 ELSE 0 END AS r_alpha,
      |             CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stop,
      |             CASE WHEN n_uniq * 5 >= n THEN 1 ELSE 0 END AS r_rep
      |      FROM f)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(r_len * r_wordlen * r_alpha * r_stop * r_rep)
      |            AS BIGINT) AS n_pass,
      |       CAST(sum(1 - r_len) AS BIGINT) AS fail_len,
      |       CAST(sum(1 - r_wordlen) AS BIGINT) AS fail_wordlen,
      |       CAST(sum(1 - r_alpha) AS BIGINT) AS fail_alpha,
      |       CAST(sum(1 - r_stop) AS BIGINT) AS fail_stop,
      |       CAST(sum(1 - r_rep) AS BIGINT) AS fail_rep,
      |       CAST(sum(r_len * r_wordlen * r_alpha * r_stop * r_rep)
      |            * 1000000 // count(*) AS BIGINT) AS pass_ppm
      |FROM g GROUP BY source""") { (s, d) =>
    TextAnalysis.gopherRules(docs(s, d))
  }

  // Cohen's kappa between the Gopher rule gate and the quality-score
  // threshold gate (su >= 5000), per source — "do the two filters
  // agree beyond chance" before swapping one for the other. See
  // TextAnalysis.gateKappa; exact ppm floor arithmetic replayed by
  // the oracle.
  private[graft] val gateKappaSql: String =
    """WITH t AS (SELECT source, string_split(text, ' ') AS ws,
      |                  length(text) AS chars
      |           FROM documents),
      |f AS (SELECT source, len(ws) AS n, chars,
      |             chars - (len(ws) - 1) AS letters,
      |             len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
      |               AS n_alpha,
      |             len(list_filter(ws, x -> x IN
      |               ('the','a','an','of','and','or','to','in','is','it',
      |                'for','on','with','as','at','by'))) AS n_stop,
      |             len(list_distinct(ws)) AS n_uniq
      |      FROM t),
      |g AS (SELECT source,
      |             CASE WHEN n BETWEEN 10 AND 1000
      |                  AND letters >= n * 3 AND letters <= n * 10
      |                  AND n_alpha * 5 >= n * 4 AND n_stop >= 2
      |                  AND n_uniq * 5 >= n THEN 1 ELSE 0 END AS ga,
      |             CASE WHEN CAST(floor(round(
      |                    least(n_stop / n * 2.5, 1.0) * 0.5 +
      |                    least((chars - (n - 1)) / n / 8.0, 1.0) * 0.5, 4)
      |                    * 10000 + 0.5) AS BIGINT) >= 5000
      |                  THEN 1 ELSE 0 END AS gb
      |      FROM f),
      |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |             CAST(sum(ga) AS BIGINT) AS a1,
      |             CAST(sum(gb) AS BIGINT) AS b1,
      |             CAST(sum(ga * gb + (1 - ga) * (1 - gb)) AS BIGINT)
      |               AS n_agree
      |      FROM g GROUP BY 1),
      |k AS (SELECT source, n_docs, a1, b1, n_agree,
      |             CAST(a1 AS HUGEINT) * b1 +
      |               CAST(n_docs - a1 AS HUGEINT) * (n_docs - b1) AS pe
      |      FROM c)
      |SELECT source, n_docs, a1 AS n_pass_gopher, b1 AS n_pass_score,
      |       n_agree,
      |       CAST(n_agree * 1000000 // n_docs AS BIGINT) AS agree_ppm,
      |       CAST(CASE WHEN CAST(n_docs AS HUGEINT) * n_docs = pe THEN NULL
      |            ELSE ((CAST(n_agree AS HUGEINT) * n_docs - pe) * 1000000)
      |                 // (CAST(n_docs AS HUGEINT) * n_docs - pe) END
      |            AS BIGINT) AS kappa_ppm
      |FROM k"""

  q("t_gate_kappa", gateKappaSql) { (s, d) =>
    TextAnalysis.gateKappa(docs(s, d))
  }

  // ROC AUC of the quality score as a classifier for lang='en', per
  // source — the standard eval a curator runs before trusting a score
  // as a filter. AUC = U/(n⁺·n⁻) via the tie-aware rank-sum on the
  // BOUNDED ×10⁴ score grid (the la_mannwhitney machinery: 2·rank
  // stays integral, DECIMAL(38,0) exact at any corpus size; state
  // after the first shuffle is the score domain, not the corpus).
  q("t_quality_auc",
    """WITH q AS (
      |  SELECT source, lang = 'en' AS pos,
      |         CAST(floor(round(least(len(list_filter(string_split(text, ' '),
      |           x -> x IN ('the','a','an','of','and','or','to','in','is',
      |                      'it','for','on','with','as','at','by'))) /
      |           len(string_split(text, ' ')) * 2.5, 1.0) * 0.5 +
      |           least((length(text) - (len(string_split(text, ' ')) - 1)) /
      |           len(string_split(text, ' ')) / 8.0, 1.0) * 0.5, 4)
      |           * 10000 + 0.5) AS BIGINT) AS su
      |  FROM documents),
      |vals AS (
      |  SELECT source, su,
      |         CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cp,
      |         CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cn
      |  FROM q GROUP BY 1, 2),
      |cum AS (
      |  SELECT source, cp, cn,
      |         CAST(sum(cp) OVER w AS BIGINT) AS ccp,
      |         CAST(sum(cn) OVER w AS BIGINT) AS ccn
      |  FROM vals
      |  WINDOW w AS (PARTITION BY source ORDER BY su
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |st AS (
      |  SELECT source,
      |         CAST(sum(cp) AS BIGINT) AS npos, CAST(sum(cn) AS BIGINT) AS nneg,
      |         sum(CAST(cp AS DECIMAL(38,0)) *
      |             (2 * ((ccp - cp) + (ccn - cn)) + (cp + cn) + 1)) AS two_rp
      |  FROM cum GROUP BY 1)
      |SELECT source, npos, nneg,
      |       round(CAST(two_rp - CAST(npos AS DECIMAL(38,0)) * (npos + 1)
      |                  AS DOUBLE) /
      |             (2 * CAST(npos AS DOUBLE) * nneg), 6) AS auc
      |FROM st""") { (s, d) =>
    val dec = "decimal(38,0)"
    val q = TextAnalysis.qualityProjection(docs(s, d))
      .select(col("doc_id"),
        expr("CAST(floor(quality_score * 10000 + 0.5) AS BIGINT)").as("su"))
      .join(docs(s, d).select(col("doc_id"), col("source"),
        (col("lang") === "en").as("pos")), "doc_id")
    val vals = q.groupBy("source", "su")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("cn"))
    val w = Window.partitionBy("source").orderBy("su")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vals
      .withColumn("ccp", sum("cp").over(w))
      .withColumn("ccn", sum("cn").over(w))
    cum.groupBy("source")
      .agg(sum("cp").as("npos"), sum("cn").as("nneg"),
        sum(col("cp").cast(dec) *
          (lit(2) * ((col("ccp") - col("cp")) + (col("ccn") - col("cn"))) +
            (col("cp") + col("cn")) + 1)).as("two_rp"))
      .select(col("source"), col("npos"), col("nneg"),
        round((col("two_rp") - col("npos").cast(dec) * (col("npos") + 1))
          .cast("double") /
          (lit(2) * col("npos").cast("double") * col("nneg")), 6)
          .as("auc"))
  }

  // Reliability diagram + Brier score of the quality score against
  // the lang='en' proxy label, per source — the CALIBRATION
  // complement to t_quality_auc's ranking AUC (a score can rank
  // perfectly yet be wildly miscalibrated as a probability; the bins
  // say where). Bins are the score's ×10⁴ grid div 1000 (≤ 11 rows
  // per source); per-bin observed positive rate and mean score are
  // ppm/grid floor integers, and brier_e8 = Σ(su − y·10⁴)² div n is
  // the exact integer Brier on the 10⁻⁸ scale — everything one
  // map-combined (source, bin) aggregate, nothing data-sized after
  // the first exchange, replayed bit for bit by the oracle.
  q("t_quality_calibration",
    """WITH q AS (
      |  SELECT source, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
      |         CAST(floor(round(least(len(list_filter(string_split(text, ' '),
      |           x -> x IN ('the','a','an','of','and','or','to','in','is',
      |                      'it','for','on','with','as','at','by'))) /
      |           len(string_split(text, ' ')) * 2.5, 1.0) * 0.5 +
      |           least((length(text) - (len(string_split(text, ' ')) - 1)) /
      |           len(string_split(text, ' ')) / 8.0, 1.0) * 0.5, 4)
      |           * 10000 + 0.5) AS BIGINT) AS su
      |  FROM documents),
      |b AS (
      |  SELECT source, su // 1000 AS bin,
      |         CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(y) AS BIGINT) AS n_pos,
      |         CAST(sum(su) AS BIGINT) AS ssu,
      |         sum(CAST(su - y * 10000 AS HUGEINT) * (su - y * 10000))
      |           AS sd2
      |  FROM q GROUP BY 1, 2),
      |s AS (
      |  SELECT source, CAST(sum(sd2) // sum(n_docs) AS BIGINT) AS brier_e8
      |  FROM b GROUP BY 1)
      |SELECT b.source, CAST(bin AS INT) AS bin, n_docs, n_pos,
      |       CAST(n_pos * 1000000 // n_docs AS BIGINT) AS pos_ppm,
      |       CAST(ssu // n_docs AS BIGINT) AS bin_score_u,
      |       s.brier_e8
      |FROM b JOIN s USING (source)""") { (s, d) =>
    val dec = "decimal(38,0)"
    val q = TextAnalysis.qualityProjection(docs(s, d))
      .select(col("doc_id"),
        expr("CAST(floor(quality_score * 10000 + 0.5) AS BIGINT)").as("su"))
      .join(docs(s, d).select(col("doc_id"), col("source"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y")), "doc_id")
    val b = q.groupBy(col("source"), expr("su div 1000").as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum("y").as("n_pos"),
        sum("su").as("ssu"),
        sum((col("su") - col("y") * 10000).cast(dec) *
          (col("su") - col("y") * 10000)).as("sd2"))
    val sb = b.groupBy("source")
      .agg(expr("CAST(sum(sd2) div sum(n_docs) AS BIGINT)").as("brier_e8"))
    b.join(sb, "source")
      .select(col("source"), col("bin").cast("int").as("bin"),
        col("n_docs"), col("n_pos"),
        expr("n_pos * 1000000L div n_docs").as("pos_ppm"),
        expr("ssu div n_docs").as("bin_score_u"),
        col("brier_e8"))
  }

  // Per-source 3-gram diversity (type-token + hapax shares in exact
  // ppm) — the mode-collapse screen for templated/generated sources.
  q("t_ngram_diversity",
    """WITH toks AS (SELECT source, string_split(text, ' ') AS ws
      |              FROM documents),
      |grams AS (
      |  SELECT source, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
      |  FROM toks, unnest(generate_series(1, len(ws) - 2)) AS t(i)
      |  WHERE len(ws) >= 3),
      |gc AS (SELECT source, gram, CAST(count(*) AS BIGINT) AS cnt
      |       FROM grams GROUP BY 1, 2)
      |SELECT source, CAST(sum(cnt) AS BIGINT) AS n_grams,
      |       CAST(count(*) AS BIGINT) AS n_types,
      |       CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_hapax,
      |       CAST(count(*) * 1000000 // sum(cnt) AS BIGINT) AS ttr_ppm,
      |       CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) * 1000000
      |            // count(*) AS BIGINT) AS hapax_ppm
      |FROM gc GROUP BY source""") { (s, d) =>
    TextAnalysis.ngramDiversity(docs(s, d), n = 3)
  }
}
