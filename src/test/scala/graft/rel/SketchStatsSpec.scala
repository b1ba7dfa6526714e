package graft.rel

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the corpus-sketch and statistics entries added
  * in round 7: KMV slice overlap, token entropy, Jensen-Shannon drift,
  * integer ACF, and the chi-square independence test — driven through
  * the REAL registered queries over per-test fixture dirs.
  */
class SketchStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = 1704067200L * 1000000000L // 2024-01-01T00:00Z ns
  private val day = 86400L * 1000000000L
  private val hour = 3600L * 1000000000L

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("ss_docs").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  private def eventsDir(
      rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("ss_ev").toString
    rows.map { case (id, ns, u, t, v) => (id, ns, u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  private def run(name: String, dir: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, dir)

  test("dd_kmv_overlap: exact small sets give the true Jaccard") {
    // 3-token docs produce exactly ONE shingle each; k=128 >> distinct,
    // so the sketches are exact and the estimate IS |A∩B| / |A∪B|.
    // A = {abc, def}, B = {abc, ghi} -> J = 1/3.
    val dir = docsDir(Seq(
      (0L, "a b c", "srcA"), (1L, "d e f", "srcA"),
      (2L, "a b c", "srcB"), (3L, "g h i", "srcB")))
    val r = run("dd_kmv_overlap", dir).collect().head
    assert(r.getAs[String]("slice_a") == "srcA")
    assert(r.getAs[String]("slice_b") == "srcB")
    assert(r.getAs[Int]("k_used") == 3)
    assert(r.getAs[Long]("n_common") == 1L)
    assert(r.getAs[Long]("jaccard_ppm") == 333333L)
  }

  test("kmvOverlap: identical slices estimate J = 1 at any k") {
    // bottom-k of identical hash sets are identical sketches, so the
    // estimator returns exactly 1e6 ppm even when k << distinct count
    val rows = (0L until 60L).flatMap { i =>
      Seq((i, s"tok$i x y", "sA"), (i + 100L, s"tok$i x y", "sB"))
    }
    val r = Dedup.kmvOverlap(
      spark.read.parquet(s"${docsDir(rows)}/documents.parquet"),
      k = 16).collect().head
    assert(r.getAs[Int]("k_used") == 16)
    assert(r.getAs[Long]("n_common") == 16L)
    assert(r.getAs[Long]("jaccard_ppm") == 1000000L)
  }

  test("t_entropy: uniform tokens give H = ln(nd), norm = 1; " +
      "degenerate gives 0") {
    val dir = docsDir(Seq(
      (0L, "a b c d", "u"),   // 4 distinct, uniform -> H = ln 4
      (1L, "x x x x", "d"))) // 1 distinct -> H = 0, norm pinned 0
    val m = run("t_entropy", dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("entropy_nats"),
          r.getAs[Double]("entropy_norm"))).toMap
    assert(m("u")._1 == 4L && m("u")._2 == 4L)
    assert(math.abs(m("u")._3 - math.log(4)) < 1e-6)
    assert(m("u")._4 == 1.0)
    assert(m("d") == ((4L, 1L, 0.0, 0.0)))
  }

  test("t_js_divergence: identical halves 0; disjoint halves ln 2") {
    // doc_id parity splits the halves
    val same = docsDir(Seq(
      (0L, "a a b b", "s"), (1L, "a a b b", "s")))
    val r0 = run("t_js_divergence", same).collect().head
    assert(r0.getAs[Double]("js_nats") == 0.0)
    val disj = docsDir(Seq((0L, "a a", "s"), (1L, "b b", "s")))
    val r1 = run("t_js_divergence", disj).collect().head
    assert(math.abs(r1.getAs[Double]("js_nats") - math.log(2)) < 1e-6)
    assert(math.abs(r1.getAs[Double]("js_bits") - 1.0) < 1e-6)
  }

  test("ts_acf: alternating series has the textbook signature") {
    // daily xu: 20000, 0, 20000, 0 -> dv = ±10000 around mu = 10000
    // den = 4e8; lag sums: -3e8, +2e8, -1e8, null, null
    val dir = eventsDir((0 until 4).map(i =>
      (i.toLong, base + i * day, 1L, "click",
        if (i % 2 == 0) 2.0 else 0.0)))
    val m = run("ts_acf", dir).collect()
      .map(r => r.getAs[Int]("lag") ->
        Option(r.getAs[Any]("acf")).map(_.asInstanceOf[Double])).toMap
    assert(m(1).contains(-0.75) && m(2).contains(0.5) &&
      m(3).contains(-0.25))
    assert(m(4).isEmpty && m(5).isEmpty)
  }

  test("la_chisq: exact independence gives chi2 = 0") {
    // 2 types x 2 hours, every cell = r*c/N exactly
    val dir = eventsDir(Seq(
      (0L, base, 1L, "a", 0.0), (1L, base + hour, 1L, "a", 0.0),
      (2L, base, 1L, "b", 0.0), (3L, base + hour, 1L, "b", 0.0)))
    val r = run("la_chisq", dir).collect().head
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_cells") == 4L)
    assert(r.getAs[Long]("dof") == 1L && r.getAs[Double]("chi2") == 0.0)
  }

  test("la_chisq: perfect 2x2 association gives chi2 = N, " +
      "empty grid cells included") {
    val dir = eventsDir(Seq(
      (0L, base, 1L, "a", 0.0), (1L, base + 1L, 1L, "a", 0.0),
      (2L, base + hour, 1L, "b", 0.0), (3L, base + hour + 1L, 1L, "b", 0.0)))
    val r = run("la_chisq", dir).collect().head
    // observed cells: (a,0)=2, (b,1)=2; grid adds (a,1)=0 and (b,0)=0
    assert(r.getAs[Long]("n_cells") == 4L)
    assert(r.getAs[Double]("chi2") == 4.0)
  }

  test("la_ks_test: hand-computed ECDF gap on a tied fixture") {
    // arm A (even users): {1,2,3}; arm B (odd): {2,3,4,4}
    // scaled gaps |ca*nb - cb*na| over the grid: 4, 5, 6, 0 -> D = 6/12
    val dir = eventsDir(Seq(
      (0L, base, 2L, "a", 1.0), (1L, base, 2L, "a", 2.0),
      (2L, base, 4L, "a", 3.0), (3L, base, 1L, "a", 2.0),
      (4L, base, 1L, "a", 3.0), (5L, base, 3L, "a", 4.0),
      (6L, base, 3L, "a", 4.0)))
    val r = run("la_ks_test", dir).collect().head
    assert(r.getAs[Long]("na") == 3L && r.getAs[Long]("nb") == 4L)
    assert(r.getAs[Double]("ks_d") == 0.5)
  }

  test("la_mannwhitney: average-rank U and tie-corrected z") {
    // same fixture: combined 1,2,2,3,3,4,4 -> avg ranks 1, 2.5, 4.5, 6.5
    // R_A = 1 + 2.5 + 4.5 = 8, U_A = 8 - 3*4/2 = 2
    // tie3 = 3*(2^3-2) = 18; var = (3*4/12)*((7+1) - 18/(7*6)) = 7.571428..
    val dir = eventsDir(Seq(
      (0L, base, 2L, "a", 1.0), (1L, base, 2L, "a", 2.0),
      (2L, base, 4L, "a", 3.0), (3L, base, 1L, "a", 2.0),
      (4L, base, 1L, "a", 3.0), (5L, base, 3L, "a", 4.0),
      (6L, base, 3L, "a", 4.0)))
    val r = run("la_mannwhitney", dir).collect().head
    assert(r.getAs[Double]("u_a") == 2.0)
    val expectedZ = (4.0 - 12.0) / (2.0 * math.sqrt(8.0 - 18.0 / 42.0))
    assert(math.abs(r.getAs[Double]("z") - expectedZ) < 1e-6)
  }

  test("la_benford: exact first digits, zero-and-negative exclusion") {
    // values 1.0, 2.5, 0.09, 19.0 -> digits 1, 2, 9, 1; 0 and -3 drop
    val dir = eventsDir(Seq(
      (0L, base, 1L, "a", 1.0), (1L, base, 1L, "a", 2.5),
      (2L, base, 1L, "a", 0.09), (3L, base, 1L, "a", 19.0),
      (4L, base, 1L, "a", 0.0), (5L, base, 1L, "a", -3.0)))
    val rows = run("la_benford", dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(4)))).toMap
    assert(rows.keySet == Set(1, 2, 9))
    assert(rows(1) == ((2L, 500000L, 500000L - 301029L)))
    assert(rows(2) == ((1L, 250000L, 250000L - 176091L)))
    assert(rows(9) == ((1L, 250000L, 250000L - 45757L)))
  }

  test("t_curation_funnel: stage counts and retention on a " +
      "hand-built corpus") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("ss_fun").toString
    Seq(
      (1L, "a b c d e", "en", "s", 9L),
      (2L, "a b c d e", "en", "s", 9L), // exact duplicate of 1
      (3L, "x y", "en", "s", 3L), // too short
      (4L, "a a a a a a", "en", "s", 11L), // distinct ratio 1/6
      (5L, "uno dos tres cuatro cinco", "de", "s", 25L), // wrong lang
      (6L, null.asInstanceOf[String], "en", "s", 0L)) // null text
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val rows = run("t_curation_funnel", d).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(rows(0) == (("input", 5L, 23L, 1000000L)))
    assert(rows(1) == (("language", 4L, 18L, 800000L)))
    assert(rows(2) == (("quality", 2L, 10L, 400000L)))
    assert(rows(3) == (("dedup", 1L, 5L, 200000L)))
  }

  test("la_spearman: monotone, anti-monotone, and tied-rank cases") {
    // hours 1..4 with strictly increasing values -> rho = 1
    val up = eventsDir(Seq(
      (0L, base + 1 * hour, 1L, "up", 1.0),
      (1L, base + 2 * hour, 1L, "up", 2.0),
      (2L, base + 3 * hour, 1L, "up", 3.0),
      (3L, base + 4 * hour, 1L, "up", 4.0)))
    assert(run("la_spearman", up).collect()
      .head.getAs[Double]("rho_s") == 1.0)
    // decreasing -> rho = -1; tied pairs (avg ranks) stay rho = 1
    val mixed = eventsDir(Seq(
      (0L, base + 1 * hour, 1L, "dn", 30.0),
      (1L, base + 2 * hour, 1L, "dn", 20.0),
      (2L, base + 3 * hour, 1L, "dn", 10.0),
      (3L, base + 1 * hour, 1L, "tie", 5.0),
      (4L, base + 1 * hour, 1L, "tie", 5.0),
      (5L, base + 2 * hour, 1L, "tie", 7.0),
      (6L, base + 2 * hour, 1L, "tie", 7.0)))
    val m = run("la_spearman", mixed).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("rho_s")).toMap
    assert(m("dn") == -1.0)
    assert(m("tie") == 1.0)
  }

  test("t_gopher_rules: per-rule failure attribution on a hand corpus") {
    val dir = docsDir(Seq(
      (0L, "the cat and dog run fast over long green hill", "s"), // pass
      (1L, "tiny doc", "s"), // fails len (2 tokens) + stop (0 hits)
      (2L, "a a a a a a a a a a", "s"))) // fails wordlen + rep
    val r = run("t_gopher_rules", dir).collect().head
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_pass") == 1L)
    assert(r.getAs[Long]("fail_len") == 1L)
    assert(r.getAs[Long]("fail_wordlen") == 1L)
    assert(r.getAs[Long]("fail_alpha") == 0L)
    assert(r.getAs[Long]("fail_stop") == 1L)
    assert(r.getAs[Long]("fail_rep") == 1L)
    assert(r.getAs[Long]("pass_ppm") == 333333L)
  }

  test("t_ngram_diversity: type-token and hapax shares on known grams") {
    // "a b c d" -> grams {a b c, b c d}; "a b c" -> {a b c}
    // 3 occurrences, 2 types, 1 hapax (b c d)
    val dir = docsDir(Seq((0L, "a b c d", "s"), (1L, "a b c", "s")))
    val r = run("t_ngram_diversity", dir).collect().head
    assert(r.getAs[Long]("n_grams") == 3L)
    assert(r.getAs[Long]("n_types") == 2L)
    assert(r.getAs[Long]("n_hapax") == 1L)
    assert(r.getAs[Long]("ttr_ppm") == 666666L)
    assert(r.getAs[Long]("hapax_ppm") == 500000L)
  }

  test("t_quality_auc: separable scores give AUC 1, identical give 0.5") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("ss_auc").toString
    Seq(
      // sep: en docs are all-stopword (score 0.6484), zh docs score 0.25
      (0L, "the of and to in is it for", "en", "sep", 26L),
      (1L, "the of and to in is it for", "en", "sep", 26L),
      (2L, "zzzz yyyy xxxx wwww", "zh", "sep", 19L),
      (3L, "zzzz yyyy xxxx wwww", "zh", "sep", 19L),
      // tie: identical text across labels -> AUC = 1/2 by avg rank
      (4L, "same text here", "en", "tie", 14L),
      (5L, "same text here", "zh", "tie", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val m = run("t_quality_auc", d).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("npos"),
        r.getAs[Long]("nneg"), r.getAs[Double]("auc")))).toMap
    assert(m("sep") == ((2L, 2L, 1.0)))
    assert(m("tie") == ((1L, 1L, 0.5)))
  }

  test("t_ndcg: perfect when score order matches relevance; degraded " +
      "when a rare term outranks the relevant doc") {
    // identical docs -> identical scores and rels, doc_id tiebreak on
    // both sides -> every cutoff exactly 1.0
    val perfect = docsDir(Seq(
      (0L, "dup spark a b", "s"), (1L, "dup spark a b", "s"),
      (2L, "dup spark a b", "s"), (3L, "x y z", "s")))
    run("t_ndcg", perfect).collect().foreach { r =>
      assert(r.getAs[Long]("ndcg_ppm") == 1000000L)
      assert(r.getAs[Long]("dcg_u") == r.getAs[Long]("idcg_u"))
    }
    // rare 'dup' (df=1) outscores the rel-4 spark doc -> dcg < idcg
    val skewed = docsDir(Seq(
      (0L, "spark spark spark spark", "s"),
      (1L, "dup a b c", "s"),
      (2L, "spark a b c", "s"),
      (3L, "spark b c d", "s")))
    val r = run("t_ndcg", skewed).collect()
      .find(_.getAs[Int]("k") == 5).get
    assert(r.getAs[Long]("dcg_u") > 0L)
    assert(r.getAs[Long]("dcg_u") < r.getAs[Long]("idcg_u"))
    val ppm = r.getAs[Long]("ndcg_ppm")
    assert(ppm > 500000L && ppm < 1000000L)
  }

  test("ts_mase: constant series has zero MAE; lag coverage counts") {
    // 9 consecutive days, constant value -> both MAEs 0, mase null
    val dir = eventsDir((0 until 9).map(i =>
      (i.toLong, base + i * day, 1L, "a", 5.0)))
    val r = run("ts_mase", dir).collect().head
    assert(r.getAs[Long]("n_days") == 9L)
    assert(r.getAs[Long]("n_naive") == 8L) // days 2..9 have a lag-1
    assert(r.getAs[Long]("n_snaive") == 2L) // days 8..9 have a lag-7
    assert(r.getAs[Long]("mae_naive_u") == 0L)
    assert(r.getAs[Long]("mae_snaive_u") == 0L)
    assert(r.isNullAt(r.fieldIndex("mase_ppm"))) // 0-denominator guarded
  }

  test("ts_mase: weekly-periodic series scores snaive far below naive") {
    // value = day-of-week index over 14 days: snaive error 0, naive > 0
    val dir = eventsDir((0 until 14).map(i =>
      (i.toLong, base + i * day, 1L, "a", (i % 7).toDouble)))
    val r = run("ts_mase", dir).collect().head
    // naive: |diff| = 1 six times then |0-6|=6, per week; 13 lag pairs
    // sae = 6*1+6 + 6*1 = 18 over 13 -> floor 13846 on the x1e4 grid
    assert(r.getAs[Long]("mae_naive_u") == 180000L / 13L)
    assert(r.getAs[Long]("mae_snaive_u") == 0L)
    assert(r.getAs[Long]("mase_ppm") == 0L)
  }

  test("ts_breakpoint: level shift found at the true split day") {
    // 8 days: 4 at value 1.0 then 4 at 5.0 -> best split at rn = 4,
    // mean_left_u = 10000, mean_right_u = 50000, gap 40000 ppm-u
    val dir = eventsDir((0 until 8).map(i =>
      (i.toLong, base + i * day, 1L, "a", if (i < 4) 1.0 else 5.0)))
    val r = run("ts_breakpoint", dir).collect().head
    assert(r.getAs[Long]("split_idx") == 4L)
    assert(r.getAs[Long]("n_days") == 8L)
    assert(r.getAs[Long]("mean_left_u") == 10000L)
    assert(r.getAs[Long]("mean_right_u") == 50000L)
    // score = |40000*4 - 200000*4| * 1e6 / (4*4) = delta-mean 40000
    // in x1e4 grid units, micro-scaled
    assert(r.getAs[Long]("score_u") == 40000L * 1000000L)
  }

  test("la_diff_in_diff: hand-built cells give did_u = 10000") {
    // pivot = day0 + 1 day; A(users even) pre 1.0 -> post 3.0,
    // B pre 1.0 -> post 2.0: did = (3-1) - (2-1) = 1.0 -> 10000 u
    val dir = eventsDir(Seq(
      (0L, base, 2L, "a", 1.0), (1L, base + 2 * day, 2L, "a", 3.0),
      (2L, base, 1L, "a", 1.0), (3L, base + 2 * day, 1L, "a", 2.0)))
    val r = run("la_diff_in_diff", dir).collect().head
    assert(r.getAs[Long]("pre_a_u") == 10000L)
    assert(r.getAs[Long]("post_a_u") == 30000L)
    assert(r.getAs[Long]("pre_b_u") == 10000L)
    assert(r.getAs[Long]("post_b_u") == 20000L)
    assert(r.getAs[Long]("did_u") == 10000L)
  }

  test("t_datacard: volume, language mix, dup rate, quality on a " +
      "hand corpus") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("ss_dc").toString
    Seq(
      (0L, "a b", "en", "s", 3L), (1L, "a b", "en", "s", 3L), // dup pair
      (2L, "c d e", "de", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val r = run("t_datacard", d).collect().head
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_tokens") == 7L)
    assert(r.getAs[Long]("mean_tokens_x100") == 233L)
    assert(r.getAs[Long]("n_langs") == 2L)
    assert(r.getAs[String]("top_lang") == "en")
    assert(r.getAs[Long]("top_lang_ppm") == 666666L)
    assert(r.getAs[Long]("dup_ppm") == 333333L)
    // scores: "a b" = 0.5625 (x2), "c d e" = 0.0625 -> mean 3958
    assert(r.getAs[Long]("mean_quality_u") == 3958L)
  }

  test("la_kaplan_meier: censoring reduces risk without an event") {
    // 4 users: u1 spans d0-d10 (censored: last seen at stream end),
    // u2 d0-d2 (event, t=2), u3 d0-d2 (event, t=2), u4 d0 only
    // (event, t=0). Stream max = d10; censor window = last 7 days.
    val dir = eventsDir(Seq(
      (0L, base, 1L, "a", 1.0), (1L, base + 10 * day, 1L, "a", 1.0),
      (2L, base, 2L, "a", 1.0), (3L, base + 2 * day, 2L, "a", 1.0),
      (4L, base, 3L, "a", 1.0), (5L, base + 2 * day, 3L, "a", 1.0),
      (6L, base, 4L, "a", 1.0)))
    val rows = run("la_kaplan_meier", dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // t=0: d=1 (u4), n=4 -> S = 1e6*3/4 = 750000
    assert(rows(0L) == ((1L, 4L, 750000L)))
    // t=2: d=2, n=3 -> S = 750000*(1/3) = 250000
    assert(rows(2L) == ((2L, 3L, 250000L)))
    // t=10: u1 censored -> d=0, n=1, S unchanged
    assert(rows(10L) == ((0L, 1L, 250000L)))
  }

  test("t_pmi_pairs: exact lift and min-count floor on a hand corpus") {
    // (x, y) co-occur in 5 of 6 docs; z is independent filler.
    // lift = 5*6/(5*5) = 1.2 -> 1200000 ppm, pmi = ln(1.2)
    val dir = docsDir((0 until 5).map(i => (i.toLong, "x y", "s")) :+
      (5L, "z w", "s"))
    val rows = run("t_pmi_pairs", dir).collect()
    assert(rows.length == 1) // (z, w) at c_ab=1 is below the floor
    val r = rows.head
    assert((r.getString(0), r.getString(1)) == (("x", "y")))
    assert(r.getAs[Long]("c_ab") == 5L)
    assert(r.getAs[Long]("lift_ppm") == 1200000L)
    assert(r.getAs[Double]("pmi") == 0.182322)
  }

  test("la_mannwhitney: identical arms give U = na*nb/2 and z = 0") {
    val dir = eventsDir(Seq(
      (0L, base, 2L, "a", 1.0), (1L, base, 1L, "a", 1.0),
      (2L, base, 4L, "a", 2.0), (3L, base, 3L, "a", 2.0)))
    val r = run("la_mannwhitney", dir).collect().head
    assert(r.getAs[Double]("u_a") == 2.0) // na*nb/2 = 2
    assert(r.getAs[Double]("z") == 0.0)
  }
}
