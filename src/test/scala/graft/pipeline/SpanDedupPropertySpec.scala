package graft.pipeline

import graft.dedup.SpanDedup
import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the sketch/dedup pipeline operators: SpanDedup's
  * relational pipeline (gram windows + gaps-and-islands) against a
  * direct in-memory reference on random small-vocabulary corpora —
  * small vocab forces genuine cross-doc k-gram repeats, including
  * overlapping and adjacent spans — and CountMin's one-sided error
  * guarantee across random skewed streams and sketch geometries.
  */
class SpanDedupPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def forAll[T](gen: Gen[T], n: Int = 25)(f: T => Unit): Unit = {
    var seed = 0L
    var done = 0
    while (done < n && seed < n * 30L) {
      gen.apply(Gen.Parameters.default, Seed(seed)) match {
        case Some(v) => f(v); done += 1
        case None =>
      }
      seed += 1
    }
    assert(done == n, s"only $done/$n generator samples produced")
  }

  private val corpusGen: Gen[(Seq[(Long, Array[String])], Int)] = for {
    k <- Gen.choose(2, 4)
    nDocs <- Gen.choose(3, 10)
    vocab <- Gen.choose(4, 7)
    seed <- Gen.choose(0L, 100000L)
  } yield {
    val rnd = new scala.util.Random(seed)
    val docs = (1L to nDocs).map { id =>
      val len = 2 + rnd.nextInt(30)
      id -> Array.fill(len)(('a' + rnd.nextInt(vocab)).toChar.toString)
    }
    (docs, k)
  }

  /** Reference implementation: hash-free, direct sets and scans. */
  private def refSpans(docs: Seq[(Long, Array[String])], k: Int)
      : Set[(Long, Int, Int, Long)] = {
    val grams = docs.flatMap { case (id, toks) =>
      (0 to toks.length - k).map(i => (id, i + 1, toks.slice(i, i + k).mkString(" ")))
    }
    val docsPerGram = grams.groupBy(_._3).view
      .mapValues(_.map(_._1).distinct.size).toMap
    val hitsByDoc = grams.filter(g => docsPerGram(g._3) >= 2)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    hitsByDoc.flatMap { case (id, ps) =>
      // gaps-and-islands over sorted positions
      val islands = ps.foldLeft(List.empty[List[Int]]) {
        case (Nil, p) => List(List(p))
        case (cur :: done, p) =>
          if (p - cur.head <= k) (p :: cur) :: done
          else List(p) :: cur :: done
      }
      islands.map(isl =>
        (id, isl.last, isl.head + k - 1, isl.size.toLong))
    }.toSet
  }

  test("degenerate corpus: 2000 identical docs -> one full-width span each") {
    import spark.implicits._
    val text = (0 until 40).map(i => s"t$i").mkString(" ")
    val df = (1L to 2000L).map(id => (id, text)).toDF("doc_id", "text")
    val spans = SpanDedup.duplicateSpans(df, k = 8).collect()
    assert(spans.length == 2000)
    assert(spans.forall(r => r.getAs[Int]("span_start") == 1 &&
      r.getAs[Int]("span_end") == 40 && r.getAs[Long]("n_dup_grams") == 33L))
    // keeper policy: doc 1 keeps everything, the other 1999 are emptied
    val clean = SpanDedup.spanDedupClean(df, k = 8)
      .groupBy("clean_text").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean(text) == 1L && clean("") == 1999L)
  }

  test("count-min: one-sided bound holds on random zipf-ish corpora") {
    import spark.implicits._
    val gen: Gen[(Seq[String], Int, Int)] = for {
      nDocs <- Gen.choose(2, 12)
      vocab <- Gen.choose(3, 60)
      d <- Gen.choose(1, 4)
      w <- Gen.oneOf(2, 7, 16, 64)
      seed <- Gen.choose(0L, 100000L)
    } yield {
      val rnd = new scala.util.Random(seed)
      val docs = (1 to nDocs).map { _ =>
        // zipf-ish: low ids drawn far more often
        Seq.fill(5 + rnd.nextInt(40))(
          s"v${(rnd.nextInt(vocab) * rnd.nextDouble()).toInt}")
          .mkString(" ")
      }
      (docs, d, w)
    }
    forAll(gen, n = 20) { case (texts, d, w) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val rows = graft.functions.CountMin.estimates(df, d = d, w = w)
        .collect()
      val exact = texts.flatMap(_.split(" ")).groupBy(identity)
        .map { case (t, g) => t -> g.size.toLong }
      assert(rows.length == exact.size)
      rows.foreach { r =>
        val (tok, est, ex) = (r.getAs[String]("tok"),
          r.getAs[Long]("est_count"), r.getAs[Long]("exact_cnt"))
        assert(ex == exact(tok), s"exact drifted for $tok")
        assert(est >= ex, s"CMS underestimated $tok: $est < $ex (d=$d w=$w)")
      }
    }
  }

  test("duplicateSpans equals the in-memory reference on random corpora") {
    import spark.implicits._
    forAll(corpusGen) { case (docs, k) =>
      val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = SpanDedup.duplicateSpans(df, k = k).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
          r.getAs[Int]("span_end"), r.getAs[Long]("n_dup_grams"))).toSet
      val want = refSpans(docs, k)
      assert(got == want, s"k=$k docs=${docs.map(_._2.mkString(" "))}")
    }
  }

  test("spanDedupClean: keeper survives; others lose exactly the covered tokens") {
    import spark.implicits._
    forAll(corpusGen, n = 15) { case (docs, k) =>
      val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = SpanDedup.spanDedupClean(df, k = k).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("clean_text"), r.getAs[Long]("n_removed")))
        .toMap
      // reference removal: per gram, keeper = min doc containing it;
      // positions covered by a non-keeper occurrence are dropped
      val grams = docs.flatMap { case (id, toks) =>
        (0 to toks.length - k)
          .map(i => (id, i + 1, toks.slice(i, i + k).mkString(" ")))
      }
      val byGram = grams.groupBy(_._3).view
        .mapValues(g => (g.map(_._1).min, g.map(_._1).distinct.size)).toMap
      docs.foreach { case (id, toks) =>
        val removedPos = grams.collect {
          case (d, p, g) if d == id && byGram(g)._2 >= 2 &&
            byGram(g)._1 != id => (p to p + k - 1)
        }.flatten.toSet
        val kept = toks.zipWithIndex.collect {
          case (t, i) if !removedPos.contains(i + 1) => t
        }
        assert(got(id)._1 == kept.mkString(" "), s"doc $id k=$k")
        assert(got(id)._2 == removedPos.size.toLong, s"doc $id k=$k")
      }
    }
  }
}
