package graft.text

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for winnowing: brute-force parity on random
  * small-vocabulary corpora (small vocab forces repeated grams and
  * hash ties — the adversarial case for the rightmost-min rule), the
  * density bound, and the shared-run recall guarantee.
  */
class WinnowPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def forAll[T](gen: Gen[T], n: Int = 12)(f: T => Unit): Unit = {
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

  private val k = 3; private val w = 4

  private def brute(text: String): Set[(Int, Long)] = {
    val t = text.split(" ")
    val hs = (1 to t.length - k + 1).map { i =>
      val gram = t.slice(i - 1, i - 1 + k).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(gram.getBytes("UTF-8"))
      i -> java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(12), 16)
    }
    val smax = math.max(hs.length - w + 1, 1)
    (1 to smax).map { s =>
      val win = hs.slice(s - 1, s - 1 + w)
      val mh = win.map(_._2).min
      win.filter(_._2 == mh).map(_._1).max -> mh
    }.toSet
  }

  private val docGen: Gen[String] = for {
    n <- Gen.choose(3, 40)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e"))
  } yield toks.mkString(" ")

  test("winnowFingerprints equals brute force on random small-vocab docs") {
    import spark.implicits._
    forAll(Gen.listOfN(6, docGen), n = 10) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = TextAnalysis.winnowFingerprints(docs, k, w).collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(r =>
          (r.getLong(1).toInt, r.getLong(2))).toSet).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got.getOrElse(i.toLong, Set.empty) == brute(t),
          s"doc $i: '$t'")
      }
      // density bound: never more fingerprints than complete windows
      got.foreach { case (id, fps) =>
        val ng = texts(id.toInt).split(" ").length - k + 1
        assert(fps.size <= math.max(ng - w + 1, 1))
      }
    }
  }

  test("shared runs of >= w+k-1 tokens always share a fingerprint") {
    import spark.implicits._
    // the run's w in-run grams form one complete window in BOTH docs;
    // each doc picks that window's rightmost-min — the same gram, so
    // the same 48-bit value, whatever surrounds it
    val runGen = Gen.listOfN(w + k - 1,
      Gen.oneOf("p", "q", "r", "s", "t")).map(_.mkString(" "))
    forAll(for {
      pre <- docGen; post <- docGen; run <- runGen
    } yield (pre, post, run), n = 10) { case (pre, post, run) =>
      val docs = Seq((1L, s"$pre $run"), (2L, s"$run $post"))
        .toDF("doc_id", "text")
      val got = TextAnalysis.winnowFingerprints(docs, k, w).collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(2)).toSet).toMap
      assert((got(1L) & got(2L)).nonEmpty,
        s"no shared fingerprint for run '$run' ('$pre' / '$post')")
    }
  }
}
