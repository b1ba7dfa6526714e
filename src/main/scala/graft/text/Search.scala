package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus search primitives for the training-data pipeline (SURVEY
  * §7.5 additive scope): BM25 keyword ranking and inverted-index
  * construction. Both are the retrieval half of data curation — find
  * the documents about X, audit what the corpus says about Y — and
  * both are designed to hash-match a DuckDB oracle bit-for-bit.
  *
  * Float determinism contract (BM25): the score uses ONLY IEEE-754
  * +, −, ×, ÷ over exactly-representable inputs (integer counts and
  * decimal literals), combined in a fixed left-to-right association
  * that the oracle SQL mirrors token-for-token. Correctly-rounded
  * arithmetic is engine-independent, so no `round()` blurring is
  * needed — unlike `ln`-based idf, whose 1-ulp libm/JVM divergence
  * would break cross-engine hashing. The idf weight is therefore the
  * RAW Robertson–Sparck-Jones odds `(N − df + 0.5) / (df + 0.5)`
  * rather than its logarithm; ranking is still monotone in df/tf for
  * single-term queries and the blend is a documented engine semantic.
  */
object Search {

  /** BM25 length-normalization constants (Robertson et al., TREC-3).
    * Declared as decimal strings so Spark and the generated oracle SQL
    * parse the IDENTICAL double (never compute 1.2 + 1 in Scala — that
    * sum is a round-to-even knife edge away from the literal 2.2).
    */
  val K1 = "1.2"
  val K1PlusOne = "2.2"
  val B = "0.75"
  val OneMinusB = "0.25"

  /** Per-term BM25 contribution for one document.
    * w_t · (tf·(k1+1)) / (tf + k1·((1−b) + (b·dl)/avgdl))
    * with w_t = ((N − df) + 0.5) / (df + 0.5). Parenthesization is the
    * contract — [[bm25OracleSql]] emits the same tree.
    */
  private def termScore(tf: Column, df: Column, dl: Column,
      nDocs: Column, totalDl: Column): Column = {
    val avgdl = totalDl.cast("double") / nDocs.cast("double")
    val norm = lit(K1).cast("double") *
      (lit(OneMinusB).cast("double") +
        (lit(B).cast("double") * dl.cast("double")) / avgdl)
    val w = ((nDocs.cast("double") - df.cast("double")) + lit(0.5)) /
      (df.cast("double") + lit(0.5))
    w * ((tf.cast("double") * lit(K1PlusOne).cast("double")) /
      (tf.cast("double") + norm))
  }

  /** Top-k documents for a bag-of-words query under BM25 ranking.
    *
    * Shape for scale: term frequencies are per-row column expressions
    * over the token array (`size(filter(...))` — whole-stage codegen,
    * no explode, no shuffle); corpus statistics (N, Σdl, per-term df)
    * are ONE global aggregate broadcast back over the scored scan; the
    * top-k is order-by + limit, which Spark executes as
    * TakeOrderedAndProject — per-partition heaps, no global sort. Two
    * passes over the corpus total, zero wide shuffles; at 100 TB the
    * stats pass is a map-reduce to a single row and the scoring pass is
    * embarrassingly parallel.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 25)
      : DataFrame = {
    require(terms.nonEmpty && terms.size <= 16,
      s"1..16 query terms, got ${terms.size}")
    require(k > 0, s"k must be positive: $k")
    val toks = TextAnalysis.tokens(col("text"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === t)).as(s"tf_$i")
    }
    val base = docs.select(col("doc_id") +: size(toks).as("dl") +: tfCols: _*)
    val statAggs = count(lit(1)).as("n_docs") +:
      sum(col("dl")).as("total_dl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val score = terms.indices
      .map(i => termScore(col(s"tf_$i"), col(s"df_$i"), col("dl"),
        col("n_docs"), col("total_dl")))
      .reduceLeft(_ + _)
    base.crossJoin(broadcast(stats))
      .select(col("doc_id") +: col("dl") +:
        terms.indices.map(i => col(s"tf_$i")) :+ score.as("score"): _*)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** BM25 top-k via the POSTINGS shape: explode tokens, keep only
    * query-term matches (a tiny broadcast `isin`), aggregate per-doc
    * term frequencies as rows, pivot to columns, score identically to
    * [[bm25TopK]]. Returns the SAME result (docs with score 0 never
    * match any posting) — the driver checks both against one oracle.
    *
    * Why both exist: [[bm25TopK]] evaluates `terms.size` array filters
    * over EVERY document — right when queries are broad or the corpus
    * pass is already happening. This shape is the index-backed plan:
    * after the match filter, all downstream work is proportional to
    * MATCHING postings, not corpus size — with the (doc_id, tok, tf)
    * projection stored as a token-bucketed table (the
    * [[invertedIndex]] build amortized across queries), the per-query
    * cost at 100 TB is a pruned index scan, not a corpus scan. The
    * corpus-stats row (N, Σdl, df) is precomputed once with the index
    * in that regime; here it is derived inline from the same scan.
    *
    * Determinism: per-term tf columns come from a pivot (exactly one
    * row per (doc, term)), so the score is the same fixed-order sum of
    * exact values as [[bm25TopK]] — no float-summation order
    * sensitivity.
    */
  def bm25TopKIndexed(docs: DataFrame, terms: Seq[String], k: Int = 25)
      : DataFrame = {
    require(terms.nonEmpty && terms.size <= 16,
      s"1..16 query terms, got ${terms.size}")
    require(k > 0, s"k must be positive: $k")
    val toks = TextAnalysis.tokens(col("text"))
    // postings for query terms only: work ∝ matches after the filter
    val tf = docs.select(col("doc_id"), explode(toks).as("tok"))
      .filter(col("tok").isInCollection(terms))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .pivot("tok", terms)
      .agg(first(col("tf")))
      .select(col("doc_id") +: terms.zipWithIndex.map { case (t, i) =>
        coalesce(col(s"`$t`"), lit(0L)).cast("int").as(s"tf_$i")
      }: _*)
    // corpus stats: same aggregate as bm25TopK (one broadcast row);
    // df from match counts so the stats scan never widens to text
    val dls = docs.select(col("doc_id"), size(toks).as("dl"))
    val dfRow = tf.select(terms.indices.map(i =>
      sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")): _*)
    val nRow = dls.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_dl"))
    val score = terms.indices
      .map(i => termScore(col(s"tf_$i"), col(s"df_$i"), col("dl"),
        col("n_docs"), col("total_dl")))
      .reduceLeft(_ + _)
    tf.join(dls, Seq("doc_id"))
      .crossJoin(broadcast(nRow))
      .crossJoin(broadcast(dfRow))
      .select(col("doc_id") +: col("dl") +:
        terms.indices.map(i => col(s"tf_$i")) :+ score.as("score"): _*)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** DuckDB oracle text for [[bm25TopK]], generated from the same term
    * list and constants so the two expression trees cannot drift.
    * `from` names the corpus relation; `preludeCtes` (must end with a
    * comma when non-empty) lets a composite define that relation as
    * CTEs ahead of the generated ones — the search-pipeline entry
    * scores its curated slice this way.
    */
  def bm25OracleSql(terms: Seq[String], k: Int = 25,
      from: String = "documents", preludeCtes: String = ""): String = {
    val tfs = terms.zipWithIndex.map { case (t, i) =>
      val esc = t.replace("'", "''") // keep the literal well-formed
      s"CAST(len(list_filter(string_split(text, ' '), x -> x = '$esc')) AS INT) AS tf_$i"
    }.mkString(",\n       ")
    val dfs = terms.indices.map(i =>
      s"sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i")
      .mkString(",\n       ")
    val contribs = terms.indices.map { i =>
      s"""(((CAST(n_docs AS DOUBLE) - CAST(df_$i AS DOUBLE)) + 0.5) /
         |(CAST(df_$i AS DOUBLE) + 0.5)) *
         |((CAST(tf_$i AS DOUBLE) * $K1PlusOne) /
         |(CAST(tf_$i AS DOUBLE) + $K1 * ($OneMinusB +
         |($B * CAST(dl AS DOUBLE)) /
         |(CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"""
        .stripMargin.linesIterator.mkString(" ")
    }.mkString(" + ")
    val tfOut = terms.indices.map(i => s"tf_$i").mkString(", ")
    s"""WITH ${preludeCtes}base AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |       CAST(len(string_split(text, ' ')) AS INT) AS dl,
       |       $tfs
       |  FROM $from
       |), stats AS (
       |  SELECT count(*) AS n_docs, sum(dl) AS total_dl,
       |       $dfs
       |  FROM base
       |)
       |SELECT doc_id, dl, $tfOut, score
       |FROM (SELECT b.*, $contribs AS score FROM base b CROSS JOIN stats)
       |WHERE score > 0
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  /** nDCG@k of the BM25 ranking against a graded relevance label
    * (total query-term occurrences capped at 4) — the retrieval-eval
    * gate run before trusting a ranker change. One row per cutoff:
    * dcg/idcg in µ-units and ndcg_ppm.
    *
    * Determinism contract: each rank's gain term rounds to an INTEGER
    * µ-unit before summation (the PSI trick — float sums are
    * order-sensitive, integer sums are not), ranks are total-ordered
    * by (score desc, doc_id) on the exact BM25 doubles, and
    * ndcg_ppm = dcg_u·10⁶ div idcg_u replays as pure integer
    * arithmetic. Shape for scale: both sides are the BM25 corpus
    * passes + a top-k heap (TakeOrderedAndProject); the unpartitioned
    * rank windows run over ≤ max(cutoffs) rows, never the corpus.
    */
  def ndcgAtK(docs: DataFrame, terms: Seq[String],
      cutoffs: Seq[Int] = Seq(5, 10, 20)): DataFrame = {
    require(cutoffs.nonEmpty && cutoffs.forall(_ >= 1),
      s"cutoffs must be positive: $cutoffs")
    import org.apache.spark.sql.expressions.Window
    import docs.sparkSession.implicits._
    val k = cutoffs.max
    val relOf: Column => Column = tot => least(tot, lit(4))
    def gainU(rel: Column, rk: Column): Column =
      round((pow(lit(2.0), rel.cast("double")) - 1) /
        log2(rk.cast("double") + 1) * 1e6).cast("long")
    val retrieved = bm25TopK(docs, terms, k)
    val tfTotal = terms.indices.map(i => col(s"tf_$i")).reduce(_ + _)
    val rterm = retrieved
      .withColumn("rk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("rk"), gainU(relOf(tfTotal), col("rk")).as("term_u"))
    val toks = TextAnalysis.tokens(col("text"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === t)).as(s"tf_$i")
    }
    val ideal = docs.select(col("doc_id") +: tfCols: _*)
      .select(col("doc_id"), relOf(tfTotal).as("rel"))
      .filter(col("rel") > 0)
      .orderBy(col("rel").desc, col("doc_id")).limit(k)
    val iterm = ideal
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rel").desc, col("doc_id"))))
      .select(col("rk"), gainU(col("rel"), col("rk")).as("term_u"))
    val cuts = cutoffs.toDF("k")
    val d = cuts.join(rterm, col("rk") <= col("k"))
      .groupBy("k").agg(sum("term_u").as("dcg_u"))
    val i = cuts.join(iterm, col("rk") <= col("k"))
      .groupBy("k").agg(sum("term_u").as("idcg_u"))
      .withColumnRenamed("k", "ik")
    d.join(i, col("k") === col("ik"))
      .select(col("k"), col("dcg_u"), col("idcg_u"),
        expr("dcg_u * 1000000L div idcg_u").as("ndcg_ppm"))
  }

  /** DuckDB oracle for [[ndcgAtK]] — same generated scoring tree as
    * [[bm25OracleSql]], same µ-unit gain rounding, same integer
    * division.
    */
  def ndcgOracleSql(terms: Seq[String],
      cutoffs: Seq[Int] = Seq(5, 10, 20)): String = {
    val k = cutoffs.max
    val tfs = terms.zipWithIndex.map { case (t, i) =>
      val esc = t.replace("'", "''")
      s"CAST(len(list_filter(string_split(text, ' '), x -> x = '$esc')) AS INT) AS tf_$i"
    }.mkString(",\n       ")
    val dfs = terms.indices.map(i =>
      s"sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i")
      .mkString(",\n       ")
    val contribs = terms.indices.map { i =>
      s"""(((CAST(n_docs AS DOUBLE) - CAST(df_$i AS DOUBLE)) + 0.5) /
         |(CAST(df_$i AS DOUBLE) + 0.5)) *
         |((CAST(tf_$i AS DOUBLE) * $K1PlusOne) /
         |(CAST(tf_$i AS DOUBLE) + $K1 * ($OneMinusB +
         |($B * CAST(dl AS DOUBLE)) /
         |(CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"""
        .stripMargin.linesIterator.mkString(" ")
    }.mkString(" + ")
    val tfTotal = terms.indices.map(i => s"tf_$i").mkString(" + ")
    val cutRows = cutoffs.map(c => s"SELECT $c AS k").mkString(" UNION ALL ")
    s"""WITH base AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |       CAST(len(string_split(text, ' ')) AS INT) AS dl,
       |       $tfs
       |  FROM documents
       |), stats AS (
       |  SELECT count(*) AS n_docs, sum(dl) AS total_dl,
       |       $dfs
       |  FROM base
       |), scored AS (
       |  SELECT doc_id, least($tfTotal, 4) AS rel, score
       |  FROM (SELECT b.*, $contribs AS score FROM base b CROSS JOIN stats)
       |  WHERE score > 0
       |), ranked AS (
       |  SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rk, rel
       |  FROM scored
       |), rterm AS (
       |  SELECT rk, CAST(round((pow(2, rel) - 1) / log2(rk + 1) * 1000000)
       |             AS BIGINT) AS term_u
       |  FROM ranked WHERE rk <= $k
       |), iranked AS (
       |  SELECT row_number() OVER (ORDER BY rel DESC, doc_id) AS rk, rel
       |  FROM (SELECT doc_id, least($tfTotal, 4) AS rel FROM base
       |        WHERE $tfTotal > 0)
       |), iterm AS (
       |  SELECT rk, CAST(round((pow(2, rel) - 1) / log2(rk + 1) * 1000000)
       |             AS BIGINT) AS term_u
       |  FROM iranked WHERE rk <= $k
       |), c AS ($cutRows),
       |d AS (SELECT k, CAST(sum(term_u) AS BIGINT) AS dcg_u
       |      FROM c JOIN rterm ON rk <= k GROUP BY k),
       |i AS (SELECT k, CAST(sum(term_u) AS BIGINT) AS idcg_u
       |      FROM c JOIN iterm ON rk <= k GROUP BY k)
       |SELECT d.k, dcg_u, idcg_u,
       |       CAST(dcg_u * 1000000 // idcg_u AS BIGINT) AS ndcg_ppm
       |FROM d JOIN i USING (k)""".stripMargin
  }

  /** Keyword-in-context (KWIC) span extraction — the corpus-auditing
    * view behind "show me every use of X with ±w words of context".
    * Pure column expressions: hit positions from a filtered index
    * sequence, context from bounded slices — one codegen'd map-local
    * Generate, no shuffle, output ∝ term occurrences.
    */
  def keywordInContext(docs: DataFrame, term: String, window: Int = 3)
      : DataFrame = {
    require(window >= 0, s"window must be non-negative: $window")
    val toks = TextAnalysis.tokens(col("text"))
    val hits = filter(sequence(lit(1), size(toks)),
      i => element_at(toks, i) === term)
    val start = greatest(col("pos") - window, lit(1))
    val stop = least(col("pos") + window, size(col("ws")))
    docs.select(col("doc_id"), toks.as("ws"), explode(hits).as("pos"))
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", slice(col("ws"), start, stop - start + 1))
          .as("snippet"))
  }

  /** Inverted index: token → document/collection frequency + the first
    * `maxPostings` doc ids (sorted). Tokens below `minDf` documents are
    * dropped (hapax noise). One token-keyed shuffle with map-side
    * partial aggregation; postings use [[graft.functions.BoundedMinSetAgg]]
    * (the `limit` smallest distinct ids with O(limit) state) so a
    * stopword's posting buffer never materializes its full O(corpus)
    * distinct set on one reducer — `slice(sort_array(collect_set(...)))`
    * would cap only the OUTPUT, after the unbounded set was already
    * built. Serialized as a CSV string so the relational compare stays
    * sortable.
    */
  def invertedIndex(docs: DataFrame, maxPostings: Int = 32,
      minDf: Long = 2L): DataFrame = {
    require(maxPostings > 0, s"maxPostings must be positive: $maxPostings")
    docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("coll_freq"),
        count_distinct(col("doc_id")).as("doc_freq"),
        graft.functions.BoundedMinSet
          .bounded_min_set(col("doc_id"), maxPostings).as("post_arr"))
      .filter(col("doc_freq") >= minDf)
      .select(col("tok"), col("doc_freq"), col("coll_freq"),
        concat_ws(",", transform(col("post_arr"), _.cast("string")))
          .as("postings"))
  }
}
