package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bigram-LM scoring vs a brute-force model, and the OHLC pick rule. */
class LmResampleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bpeLearn: hand-computed merges with total-order tie-break") {
    import spark.implicits._
    val docs = Seq(1L -> "a b a b c", 2L -> "a b b").toDF("doc_id", "text")
    // r1: (a,b)=3 wins; r2: all pairs tie at 1, 'a@@b' < 'b' < 'c'
    // so (a@@b, a@@b) wins; r3: (a@@b, b) beats (a@@b@@a@@b, c) on w1
    val m = TextAnalysis.bpeLearn(docs, rounds = 3).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getString(2),
        r.getLong(3)))).toMap
    assert(m(1) == (("a", "b", 3L)))
    assert(m(2) == (("a@@b", "a@@b", 1L)))
    assert(m(3) == (("a@@b", "b", 1L)))
  }

  test("bpeApply: per-doc compression counts every merge applied") {
    import spark.implicits._
    val docs = Seq(1L -> "a b a b c", 2L -> "a b b").toDF("doc_id", "text")
    // doc1: 'a b a b c' -> 'a@@b a@@b c' -> 'a@@b@@a@@b c' (5 -> 2)
    // doc2: 'a b b' -> 'a@@b b' -> 'a@@b@@b' (3 -> 1)
    val m = TextAnalysis.bpeApply(docs, rounds = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(m(1L) == ((5L, 2L, 3L)))
    assert(m(2L) == ((3L, 1L, 2L)))
  }

  test("bpeApply: overlapping same-token pairs merge left to right") {
    import spark.implicits._
    // 'a a a' merges positions 1-2 only (leftmost non-overlapping)
    val docs = Seq(1L -> "a a a").toDF("doc_id", "text")
    val r = TextAnalysis.bpeApply(docs, rounds = 1).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 2L, 1L)))
  }

  test("bigramLm matches a brute-force bigram model") {
    import spark.implicits._
    val texts = Seq(
      1L -> "the cat sat on the mat",
      2L -> "the cat sat on the hat",
      3L -> "mat the on sat cat the", // same tokens, scrambled order
      4L -> "one",                    // single token: no bigrams, dropped
      5L -> null.asInstanceOf[String])
    val docs = texts.toDF("doc_id", "text")

    // brute-force model over the same corpus
    val bigrams = texts.collect { case (id, t) if t != null =>
      val toks = t.split(" ")
      id -> toks.zip(toks.tail)
    }.filter(_._2.nonEmpty)
    val c12 = bigrams.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val c1 = bigrams.flatMap(_._2.map(_._1)).groupBy(identity)
      .view.mapValues(_.size)
    val expect = bigrams.map { case (id, bs) =>
      val ss = bs.map(b => c12(b).toLong * 1000000L / c1(b._1))
      id -> (bs.length.toLong, ss.sum / bs.length)
    }.toMap

    val got = TextAnalysis.bigramLm(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
    // predictable docs outscore the scrambled permutation of the same
    // tokens — the signal unigram models are blind to
    assert(got(1L)._2 > got(3L)._2 && got(2L)._2 > got(3L)._2)
    assert(!got.contains(4L) && !got.contains(5L))
  }

  test("heldoutBigramLm: ref-trained model scores only the held-out half") {
    import spark.implicits._
    val texts = Seq(
      2L -> "the cat sat on the mat", // ref (even ids in this spec)
      4L -> "the cat sat on the hat", // ref
      1L -> "the cat sat on the mat", // tgt: fully in-model
      3L -> "mat the on sat cat the", // tgt: same tokens, scrambled
      5L -> "quux the cat",           // tgt: OOV start token
      6L -> "one",                    // single token: dropped
      7L -> null.asInstanceOf[String])
    val docs = texts.toDF("doc_id", "text")
    val got = TextAnalysis.heldoutBigramLm(docs, col("doc_id") % 2 === 0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap

    // brute-force model from the ref half only, add-1 smoothed
    val refBigrams = texts.collect { case (id, t) if t != null && id % 2 == 0 =>
      val tk = t.split(" "); tk.zip(tk.tail).toSeq
    }.flatten
    val c12 = refBigrams.groupBy(identity).view.mapValues(_.size).toMap
    val c1 = refBigrams.map(_._1).groupBy(identity)
      .view.mapValues(_.size).toMap
    val v = refBigrams.map(_._2).distinct.size + 1
    val expect = texts.collect { case (id, t) if t != null && id % 2 != 0 =>
      val tk = t.split(" "); id -> tk.zip(tk.tail).toSeq
    }.filter(_._2.nonEmpty).map { case (id, bs) =>
      val ss = bs.map(b => (c12.getOrElse(b, 0) + 1).toLong * 1000000L /
        (c1.getOrElse(b._1, 0) + v))
      id -> ((bs.length.toLong, ss.sum / bs.length))
    }.toMap
    assert(got == expect)
    // ref/dropped docs never appear in the scored output
    assert(Seq(2L, 4L, 6L, 7L).forall(!got.contains(_)))
    // in-model word order outscores the scrambled permutation
    assert(got(1L)._2 > got(3L)._2)
  }

  test("dsirWeights up-weights target-like raw documents") {
    import spark.implicits._
    // target domain speaks "alpha beta"; raw remainder speaks "zeta eta"
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha", "tgt"),
      (2L, "beta alpha beta alpha beta", "tgt"),
      (3L, "zeta eta zeta eta zeta eta", "raw"),
      (4L, "eta zeta eta zeta", "raw"),
      (5L, "alpha beta alpha alpha", "raw"),   // target-like raw doc
      (6L, "zeta zeta eta eta zeta", "raw"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.dsirWeights(docs, Seq("tgt"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getInt(4)))).toMap
    // the target-like raw doc scores positive (keep=1); the raw-like
    // raw docs score negative
    assert(got(5L)._1 > 0 && got(5L)._2 == 1)
    assert(got(3L)._1 < 0 && got(3L)._2 == 0)
    assert(got(6L)._1 < 0 && got(6L)._2 == 0)
    // hashed features with ample buckets (no collisions in a 4-token
    // vocab at 2^16) reproduce the unhashed scores exactly
    val hashed = TextAnalysis.dsirWeights(docs, Seq("tgt"),
      hashBuckets = Some(1 << 16))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(hashed == got.view.mapValues(_._1).toMap)
  }

  test("winnow matches brute force and keeps the shared-run guarantee") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta" // 7 tokens
    val docs = Seq(
      (1L, s"one two $shared three four five six seven"),
      (2L, s"red blue green $shared yellow purple"),
      (3L, "totally different words in this unrelated document here"),
      (4L, "ab cd"))                // < k tokens: dropped
      .toDF("doc_id", "text")
    val k = 3; val w = 4

    // brute-force winnowing in test code
    def brute(text: String): Set[(Int, Long)] = {
      val t = text.split(" ")
      val hs = (1 to t.length - k + 1).map { i =>
        val gram = t.slice(i - 1, i - 1 + k).mkString(" ")
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(gram.getBytes("UTF-8"))
        val hex = md.map("%02x".format(_)).mkString.take(12)
        i -> java.lang.Long.parseLong(hex, 16)
      }
      val smax = math.max(hs.length - w + 1, 1)
      (1 to smax).map { s =>
        val win = hs.slice(s - 1, s - 1 + w)
        val mh = win.map(_._2).min
        win.filter(_._2 == mh).map(_._1).max -> mh
      }.toSet
    }
    val fp = TextAnalysis.winnowFingerprints(docs, k, w).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1).toInt, r.getLong(2))).toSet)
      .toMap
    assert(fp(1L) == brute(s"one two $shared three four five six seven"))
    assert(fp(2L) == brute(s"red blue green $shared yellow purple"))
    assert(!fp.contains(4L))
    // guarantee: the shared 7-token run (= w + k) yields >= 1 common
    // fingerprint hash between docs 1 and 2; doc 3 shares none
    val h1 = fp(1L).map(_._2); val h2 = fp(2L).map(_._2)
    assert((h1 & h2).nonEmpty)
    assert((h1 & fp(3L).map(_._2)).isEmpty)
    // summary view is consistent with the fingerprint table
    val sm = TextAnalysis.winnow(docs, k, w).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(sm(1L)._1 == fp(1L).size.toLong)
    assert(sm(1L)._2 == fp(1L).toSeq.map(_._2).sum)
  }

  test("ohlc struct pick takes first/last by (ts, event_id)") {
    import spark.implicits._
    val rows = Seq(
      // same day, out of insertion order; event_id breaks the ts tie
      (1L, "2024-03-05 10:00:00", 5.0),
      (3L, "2024-03-05 09:00:00", 7.0), // first by ts -> open
      (2L, "2024-03-05 23:00:00", 2.0),
      (4L, "2024-03-05 23:00:00", 9.0)) // ts tie, higher id -> close
      .toDF("event_id", "ts_s", "value")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("value"), lit("click").as("event_type"))
    val r = rows.groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close"),
        max(col("value")).as("high"), min(col("value")).as("low"))
      .collect().head
    assert(r.getAs[Double]("open") == 7.0)
    assert(r.getAs[Double]("close") == 9.0)
    assert(r.getAs[Double]("high") == 9.0 && r.getAs[Double]("low") == 2.0)
  }
}
