package graft.ts

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5.2): classifier/kernel laws that
  * must hold for any input, not just fixtures. Uses raw ScalaCheck
  * generators sampled with fixed seeds (scalatestplus bridge is not in
  * the offline dependency cache), so runs are deterministic.
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[T](gen: Gen[T], n: Int = 60)(f: T => Unit): Unit = {
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

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(for { a <- ga; b <- gb } yield (a, b))(t => f(t._1, t._2))

  private val seriesGen: Gen[Array[Double]] = for {
    n <- Gen.choose(8, 64)
    slope <- Gen.choose(-5.0, 5.0)
    noise <- Gen.choose(0.01, 2.0)
    seed <- Gen.choose(0L, 1000000L)
  } yield {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(n)(i => slope * i + rnd.nextGaussian() * noise)
  }

  test("direction == sign(slope); significance consistent with p-value") {
    forAll(seriesGen) { y =>
      PolyTrend.classify(y, 0.05).foreach { r =>
        assert(r.direction == (if (r.slope < 0) -1 else 1))
        assert((r.significance == 1) == (r.pValue < 0.05))
        assert(Set(-1, 0, 1, 2, 3).contains(r.trendType))
        // a reported linear trend requires a significant slope
        if (r.trendType == 1) assert(r.significance == 1)
        // no-trend means the slope test failed
        if (r.trendType == 0) assert(r.significance == -1)
      }
    }
  }

  test("classification is invariant under value translation") {
    forAll(seriesGen, Gen.choose(-100.0, 100.0)) { (y: Array[Double], shift: Double) =>
      val a = PolyTrend.classify(y, 0.05)
      val b = PolyTrend.classify(y.map(_ + shift), 0.05)
      (a, b) match {
        case (Some(ra), Some(rb)) =>
          // slope and direction are exactly shift-invariant; the
          // degree decision can flip only at t-test boundaries, so
          // compare the robust invariants
          assert(math.abs(ra.slope - rb.slope) < 1e-6 * math.max(1, math.abs(ra.slope)))
          assert(ra.direction == rb.direction)
        case _ => assert(a.isEmpty == b.isEmpty)
      }
    }
  }

  test("OLS linear fit matches closed-form slope") {
    forAll(seriesGen) { y =>
      val f = Ols.fit(y, 1)
      val n = y.length
      val c = (n + 1) / 2.0
      val xs = Array.tabulate(n)(i => (i + 1) - c)
      val sxy = xs.zip(y).map { case (x, v) => x * v }.sum
      val sxx = xs.map(x => x * x).sum
      assert(math.abs(f.coeffs(1) - sxy / sxx) < 1e-9)
    }
  }

  test("STL recomposition identity and seasonal centering") {
    val gen = for {
      cycles <- Gen.choose(3, 8)
      amp <- Gen.choose(0.1, 5.0)
      trendSlope <- Gen.choose(-1.0, 1.0)
      seed <- Gen.choose(0L, 100000L)
    } yield {
      val n = cycles * 12
      val rnd = new scala.util.Random(seed)
      Array.tabulate(n)(i => trendSlope * i +
        amp * math.sin(2 * math.Pi * i / 12) + rnd.nextGaussian() * 0.1)
    }
    forAll(gen) { y =>
      val d = Stl.decompose(y, 12)
      y.indices.foreach { i =>
        assert(math.abs(d.trend(i) + d.seasonal(i) + d.remainder(i) - y(i)) < 1e-9)
      }
      // periodic seasonal: identical value at the same phase
      for (i <- 0 until 12; j <- 1 until y.length / 12) {
        assert(math.abs(d.seasonal(i) - d.seasonal(i + 12 * j)) < 1e-12)
      }
    }
  }

  test("DBEST change list is bounded and ranked by |change|") {
    forAll(seriesGen.suchThat(_.length >= 24)) { y =>
      val p = Dbest.Params(seasonality = 4, breakpointsNo = 3, duration = 4)
      val r = Dbest.changeDetection(y, p)
      assert(r.changes.length <= 3)
      r.changes.sliding(2).foreach {
        case Array(a, b) => assert(math.abs(a.change) >= math.abs(b.change))
        case _ =>
      }
      r.changes.foreach { ch =>
        assert(ch.start >= 0 && ch.end < y.length && ch.start < ch.end)
      }
      // fit recomposes through every vertex pair inside bounds
      assert(r.fit.length == y.length)
    }
  }

  test("DBEST generalization f_local telescopes to the fit's net change") {
    forAll(seriesGen.suchThat(_.length >= 24)) { y =>
      val g = Dbest.generalization(y, Dbest.Params(seasonality = 4))
      assert(g.fLocal.length == g.fit.length)
      assert(g.fLocal(0) == 0.0)
      // sum of per-step deltas == total trend change (telescoping)
      val net = g.fit.last - g.fit.head
      assert(math.abs(g.fLocal.sum - net) < 1e-9 * (1 + math.abs(net)),
        s"sum ${g.fLocal.sum} vs net $net")
    }
  }

  test("minhash estimate within tolerance of true jaccard") {
    val docGen = for {
      n <- Gen.choose(30, 80)
      overlap <- Gen.choose(0.0, 1.0)
    } yield {
      val base = Seq.tabulate(n)(i => s"t$i")
      val kept = (n * overlap).toInt
      val other = base.take(kept) ++ Seq.tabulate(n - kept)(i => s"u$i")
      (base, other)
    }
    forAll(docGen) { case (a, b) =>
      val sa = Dedup2.sig(a)
      val sb = Dedup2.sig(b)
      val est = sa.zip(sb).count(t => t._1 == t._2).toDouble / sa.length
      val shA = a.sliding(3).map(_.mkString(" ")).toSet
      val shB = b.sliding(3).map(_.mkString(" ")).toSet
      val trueJ = (shA & shB).size.toDouble / (shA | shB).size
      assert(math.abs(est - trueJ) < 0.35, s"est $est vs true $trueJ")
    }
  }

  private object Dedup2 {
    def sig(t: Seq[String]): Array[Long] =
      graft.dedup.Dedup.minhashSignature(t, 128, 3, 42L)
  }
}
