package graft.functions

import graft.functions.BoundedLevenshtein.bounded_levenshtein
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The banded edit distance against the full DP and Spark's builtin. */
class BoundedLevenshteinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def full(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1),
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1))
    d(a.length)(b.length)
  }

  private def banded(a: String, b: String, k: Int): Int =
    BoundedLevenshtein.banded(
      UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("equals the full DP when within bound, k+1 otherwise (randomized)") {
    val rnd = new scala.util.Random(5)
    val alpha = "abcde"
    def word() = (0 until 1 + rnd.nextInt(12))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 2000; k <- Seq(0, 1, 2, 4)) {
      val (a, b) = (word(), word())
      val exact = full(a, b)
      val got = banded(a, b, k)
      if (exact <= k) assert(got == exact, s"($a, $b, $k)")
      else assert(got == k + 1, s"($a, $b, $k): exact=$exact got=$got")
    }
  }

  test("edge cases: empty strings, identical, pure length gap") {
    assert(banded("", "", 3) == 0)
    assert(banded("abc", "abc", 0) == 0)
    assert(banded("", "ab", 3) == 2)
    assert(banded("", "abcd", 3) == 4)   // length gap exceeds bound
    assert(banded("abcdefgh", "abc", 4) == 5)
  }

  test("column form matches Spark's levenshtein inside the bound") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val rows = (1 to 500).map { _ =>
      def w() = (0 until 1 + rnd.nextInt(10))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      (w(), w())
    }.toDF("a", "b")
    val bad = rows.select(
        levenshtein(col("a"), col("b")).as("lv"),
        bounded_levenshtein(col("a"), col("b"), 3).as("bl"))
      .filter((col("lv") <= 3 && col("lv") =!= col("bl")) ||
        (col("lv") > 3 && col("bl") =!= 4))
      .count()
    assert(bad == 0)
  }
}
