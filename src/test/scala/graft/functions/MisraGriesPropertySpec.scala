package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based check of the Misra–Gries guarantee at the aggregation
  * buffer level (no Spark session): for ANY stream, ANY split into
  * partials, and ANY merge order, every item with true frequency
  * > N/(k+1) must be present in the final summary — this is the
  * invariant [[graft.text.TextAnalysis.guaranteedHeavyHitters]]'s exact
  * recount relies on. Raw ScalaCheck generators with fixed seeds (the
  * scalatestplus bridge is not in the offline cache), deterministic.
  */
class MisraGriesPropertySpec extends AnyFunSuite {

  private def forAll[T](gen: Gen[T], n: Int = 40)(f: T => Unit): Unit = {
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

  /** Zipf-ish stream: a few hot items over a uniform tail. */
  private val streamGen: Gen[(Seq[String], Int, Int)] = for {
    k <- Gen.choose(5, 40)
    nHot <- Gen.choose(1, 4)
    tailDistinct <- Gen.choose(50, 400)
    tailLen <- Gen.choose(500, 4000)
    parts <- Gen.choose(1, 7)
    seed <- Gen.choose(0L, 100000L)
  } yield {
    val rnd = new scala.util.Random(seed)
    val n = tailLen + nHot * (tailLen / 2)
    // each hot item appears > N/(k+1) times by construction
    val hotFreq = n / (k + 1) + tailLen / 2
    val hot = (0 until nHot).flatMap(h => Seq.fill(hotFreq)(s"hot$h"))
    val tail = (0 until tailLen).map(_ => s"t${rnd.nextInt(tailDistinct)}")
    (rnd.shuffle(hot ++ tail), k, parts)
  }

  private def eval(agg: MisraGriesAgg,
      b: java.util.HashMap[String, Long]): Set[String] =
    agg.eval(b).asInstanceOf[GenericArrayData].array
      .map(_.asInstanceOf[UTF8String].toString).toSet

  test("every item with freq > N/(k+1) survives any split + merge order") {
    forAll(streamGen) { case (stream, k, parts) =>
      val agg = MisraGriesAgg(BoundReference(0, StringType, nullable = true), k)
      // split round-robin into `parts` partials (worst-case interleave)
      val buffers = Array.fill(parts)(agg.createAggregationBuffer())
      stream.zipWithIndex.foreach { case (s, i) =>
        agg.update(buffers(i % parts),
          InternalRow(UTF8String.fromString(s)))
      }
      // serialize round-trip each partial, then fold-merge
      val merged = buffers.map(b => agg.deserialize(agg.serialize(b)))
        .reduce(agg.merge)
      val cands = eval(agg, merged)
      assert(cands.size <= k, s"summary exceeded k=$k: ${cands.size}")
      val n = stream.length
      val trueCounts = stream.groupBy(identity).map { case (s, xs) =>
        s -> xs.length
      }
      trueCounts.filter(_._2 > n / (k + 1)).keys.foreach { heavy =>
        assert(cands.contains(heavy),
          s"item $heavy (freq ${trueCounts(heavy)} > N/(k+1) = " +
            s"${n / (k + 1)}) missing from $parts-way merged summary")
      }
    }
  }
}
