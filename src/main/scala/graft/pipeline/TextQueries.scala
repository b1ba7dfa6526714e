package graft.pipeline

import graft.QueryRegistry
import graft.dedup.Dedup
import graft.functions.RollingHash.rolling_hash
import graft.text.{Search, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import PipelineShared._

/** Driver-contract entries: text analysis, quality scoring, search,
  * tokenization, sampling/mixing and the end-to-end text journeys
  * (t_*, ingest/search/hybrid/doc pipelines). Split from the
  * PipelineQueries monolith (r14 verdict #6) so bench ownership is
  * file-grained: a new entry here no longer disables code-unchanged
  * absolution for dd_/sim_/mm_ suspects.
  */
object TextQueries extends QueryRegistry {

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
