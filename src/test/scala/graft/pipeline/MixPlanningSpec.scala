package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the r11 mixture-planning additions, driven through
  * the REAL registered queries over tiny fixture dirs (not copies of
  * their logic): the sequence-length planning curve's truncation/
  * padding accounting and the excess-loss (DoReMi-linearized) domain
  * reweighting's KL arithmetic.
  */
class MixPlanningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("mixplan").toString
    rows.map { case (id, text, lang) => (id, text, lang, "web", 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("t_seqlen_curve: truncation loss and chunk-pad utilization " +
      "match hand accounting at L=64 and L=256") {
    // token counts 1, 64, 65, 200 (whitespace tokens)
    val dir = writeDocs(Seq(
      (0L, "w", "en"),
      (1L, Seq.fill(64)("w").mkString(" "), "en"),
      (2L, Seq.fill(65)("w").mkString(" "), "en"),
      (3L, Seq.fill(200)("w").mkString(" "), "en")))
    val out = TextQueries.queries("t_seqlen_curve")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val a = out(64L)
    // docs>64: {65, 200}; kept = 1+64+64+64; lost = 1+136
    assert(a.getAs[Long]("n_docs") == 4L)
    assert(a.getAs[Long]("total_tokens") == 330L)
    assert(a.getAs[Long]("docs_truncated") == 2L)
    assert(a.getAs[Long]("kept_trunc") == 193L)
    assert(a.getAs[Long]("lost_trunc") == 137L)
    assert(a.getAs[Long]("kept_trunc_ppm") == 193L * 1000000L / 330L)
    // chunks: 1+1+2+4 = 8; pad = 63+0+63+56 = 182
    assert(a.getAs[Long]("n_chunks") == 8L)
    assert(a.getAs[Long]("chunk_pad_tokens") == 182L)
    assert(a.getAs[Long]("chunk_util_ppm") == 330L * 1000000L / 512L)
    val b = out(256L)
    // nothing truncated; every doc one chunk, pad to 256 each
    assert(b.getAs[Long]("docs_truncated") == 0L)
    assert(b.getAs[Long]("lost_trunc") == 0L)
    assert(b.getAs[Long]("n_chunks") == 4L)
    assert(b.getAs[Long]("chunk_pad_tokens") == 255L + 192L + 191L + 56L)
    assert(b.getAs[Long]("chunk_util_ppm") == 330L * 1000000L / 1024L)
  }

  test("t_domain_reweight: KL(domain ‖ corpus) in µ-nats and the " +
      "linearized EG update match an independent replay") {
    // lang aa: tokens {x:3, y:1}; lang bb: {y:3, z:1}; corpus
    // {x:3, y:4, z:1}, T=8. KL_aa = (3·ln2 − ln2)/4; KL_bb =
    // (3·ln1.5 + ln2)/4 — bb diverges more, so its weight must rise
    // ABOVE its token share while aa's falls below.
    val dir = writeDocs(Seq(
      (0L, "x x x y", "aa"),
      (1L, "y y y z", "bb")))
    val out = TextQueries.queries("t_domain_reweight")(spark, dir)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    def unat(terms: Seq[(Long, Double)], td: Long): Long = {
      val s = terms.map { case (c, r) => c.toDouble * math.log(r) }.sum
      math.round(s / td * 1e6)
    }
    val klA = unat(Seq((3L, 3.0 * 8 / (3 * 4)), (1L, 1.0 * 8 / (4 * 4))), 4L)
    val klB = unat(Seq((3L, 3.0 * 8 / (4 * 4)), (1L, 1.0 * 8 / (1 * 4))), 4L)
    assert(out("aa").getAs[Long]("kl_unat") == klA)
    assert(out("bb").getAs[Long]("kl_unat") == klB)
    assert(out("aa").getAs[Long]("share_ppm") == 500000L)
    val numA = 500000L * (1000000L + klA)
    val numB = 500000L * (1000000L + klB)
    assert(out("aa").getAs[Long]("reweight_ppm") ==
      numA * 1000000L / (numA + numB))
    assert(out("bb").getAs[Long]("reweight_ppm") ==
      numB * 1000000L / (numA + numB))
    assert(out("bb").getAs[Long]("reweight_ppm") > 500000L)
    assert(out("aa").getAs[Long]("reweight_ppm") < 500000L)
    // weights sum to 10⁶ up to the two floor drops
    val tot = out("aa").getAs[Long]("reweight_ppm") +
      out("bb").getAs[Long]("reweight_ppm")
    assert(tot <= 1000000L && tot >= 1000000L - 2L)
  }

  test("st_seqlen_curve: streaming replay equals the batch curve") {
    val dir = writeDocs(Seq(
      (0L, "w", "en"),
      (1L, Seq.fill(64)("w").mkString(" "), "en"),
      (2L, Seq.fill(65)("w").mkString(" "), "en"),
      (3L, Seq.fill(200)("w").mkString(" "), "en")))
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val st = asMap(graft.streaming.StreamQueries
      .queries("st_seqlen_curve")(spark, dir).collect())
    val batch = asMap(TextQueries.queries("t_seqlen_curve")(spark, dir).collect())
    assert(st == batch && st.size == 5)
  }

  test("st_domain_reweight: streaming replay equals the batch twin " +
      "(collision-free md5-u48 hashing at 4096 on the fixture)") {
    val dir = writeDocs(Seq(
      (0L, "x x x y", "aa"),
      (1L, "y y y z", "bb")))
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) -> r.toSeq.tail).toMap
    val st = asMap(graft.streaming.StreamQueries
      .queries("st_domain_reweight")(spark, dir).collect())
    val batch = asMap(TextQueries.queries("t_domain_reweight")(spark, dir).collect())
    // bucket counts are isomorphic to token counts while hashing is
    // collision-free, so KL and the weights agree EXACTLY
    assert(st == batch)
  }

  test("t_ccnet_buckets: lower-tercile cutoffs replayed independently; " +
      "junk lands in tail, the reference-like doc in head") {
    import spark.implicits._
    val buckets = (0L until 64L).toDF("doc_id")
      .select(col("doc_id"),
        (Sampling.hashBucket("doc_id") % 2 === 0).as("is_ref"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val refIds = (0L until 64L).filter(buckets).take(6)
    val oddIds = (0L until 64L).filterNot(buckets).take(6)
    val normal = "n0 n1 n2 n3 n4"
    // scored docs mix ref-known and OOV bigrams in varying shares so
    // the six scores spread
    val scoredTexts = Seq(normal, "n0 n1 n2 n3 j0", "n0 n1 n2 j0 j1",
      "n0 n1 j0 j1 j2", "n0 j0 j1 j2 j3", "j0 j1 j2 j3 j4")
    val dir = writeDocs(refIds.map(id => (id, normal, "en")) ++
      oddIds.zip(scoredTexts).map { case (id, t) => (id, t, "en") })
    // independent replay of the tercile rule over the REAL scores
    val sc = graft.text.TextAnalysis.heldoutBigramLm(
        graft.io.Tables.load(spark, dir, "documents"),
        Sampling.hashBucket("doc_id") % 2 === 0)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_bigrams"), r.getAs[Long]("lm_u")))
    val sorted = sc.map(_._3).sorted
    val n = sorted.length
    def cut(num: Int) = sorted(
      sorted.indices.find(i => (i + 1) * 3 >= n * num).get)
    val (c1, c2) = (cut(1), cut(2))
    def bucketOf(u: Long) =
      if (u >= c2) "head" else if (u >= c1) "middle" else "tail"
    val expected = sc.groupBy(t => bucketOf(t._3)).map { case (b, xs) =>
      b -> ((xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).min,
        xs.map(_._3).max))
    }
    val out = TextQueries.queries("t_ccnet_buckets")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == expected)
    // the ref-identical doc carries the maximum score -> head. (No
    // claim about WHICH junk mix lands lowest: add-1 smoothing scores
    // an all-OOV bigram 1e6/V, HIGHER than a known-start unseen
    // transition's 1e6/(c1+V) — the ordering is about denominators,
    // not junk share.)
    val byId = sc.map(t => t._1 -> t._3).toMap
    assert(byId(oddIds.head) == sorted.last)
    assert(bucketOf(byId(oddIds.head)) == "head")
    // buckets are ordered by construction AND non-degenerate here
    assert(expected.keySet == Set("head", "middle", "tail"))
  }

  test("t_lm_memgap: a junk clone cluster in the scored half carries a " +
      "larger self-vs-heldout gap than a genuinely regular doc") {
    import spark.implicits._
    // partition candidate ids by the REAL md5 half-split the entry uses
    val buckets = (0L until 64L).toDF("doc_id")
      .select(col("doc_id"),
        (Sampling.hashBucket("doc_id") % 2 === 0).as("is_ref"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val refIds = (0L until 64L).filter(buckets).take(8)
    val oddIds = (0L until 64L).filterNot(buckets).take(5)
    val normal = "n0 n1 n2 n3 n4"
    val junk = "j0 j1 j2 j3 j4"
    val dir = writeDocs(
      refIds.map(id => (id, normal, "en")) ++
        oddIds.take(4).map(id => (id, junk, "en")) ++
        Seq((oddIds(4), normal, "en")))
    val out = TextQueries.queries("t_lm_memgap")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 5) // only the scored (odd) half appears
    // junk: every bigram deterministic in the self model -> 1e6;
    // unseen by the ref model (V = |{n1..n4}|+1 = 5) -> 1e6/5
    val j = out(oddIds.head)
    assert(j.getAs[Long]("n_bigrams") == 4L)
    assert(j.getAs[Long]("self_u") == 1000000L)
    assert(j.getAs[Long]("ref_u") == 200000L)
    assert(j.getAs[Long]("gap_u") == 800000L)
    // normal: deterministic in self too, but the ref model has seen
    // its bigrams 8 times -> (8+1)*1e6 div (8+5)
    val n = out(oddIds(4))
    assert(n.getAs[Long]("self_u") == 1000000L)
    assert(n.getAs[Long]("ref_u") == 9L * 1000000L / 13L)
    assert(n.getAs[Long]("gap_u") < j.getAs[Long]("gap_u"))
  }
}
