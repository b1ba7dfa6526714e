package graft.functions

import graft.functions.JaroWinkler.jaro_winkler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer vectors captured from DuckDB's
  * `jaro_winkler_similarity` (the oracle dialect the driver compares
  * against), plus the edge cases that define the dialect: empty
  * strings score 0, the Winkler boost fires only above 0.7, and the
  * common prefix caps at 4.
  */
class JaroWinklerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("DuckDB known-answer vectors") {
    val eps = 1e-12
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < eps)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < eps)
    assert(math.abs(jw("DwAyNE", "DuANE") - 0.8400000000000001) < eps)
    assert(math.abs(jw("kitten", "sitting") - 0.746031746031746) < eps)
    assert(math.abs(jw("ab", "abcdefghij") - 0.7866666666666667) < eps)
    assert(math.abs(jw("prefix", "prefixxxxxxxxxxx") - 0.875) < eps)
    assert(math.abs(jw("abcde", "abcdz") - 0.92) < eps)
  }

  test("dialect edge cases") {
    assert(jw("", "") == 0.0)            // DuckDB: empty => 0, not 1
    assert(jw("a", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("x", "y") == 0.0)
    // below the 0.7 boost threshold the prefix must NOT be rewarded
    assert(math.abs(jw("abcdxxxxxx", "abcdyyyyyy") - 0.6) < 1e-12)
    // prefix capped at 4: jaro 0.733..., jw = j + 4*0.1*(1-j)
    val j = 0.7333333333333334
    assert(math.abs(jw("abcdefxxxx", "abcdefyyyy") -
      (j + 4 * 0.1 * (1 - j))) < 1e-12)
  }

  test("symmetric and within [0, 1] (randomized)") {
    val rnd = new scala.util.Random(11)
    val alpha = "abcde "
    def word() = (0 until rnd.nextInt(14))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 2000) {
      val (a, b) = (word(), word())
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"($a, $b)")
      assert(jw(b, a) == s, s"asymmetric on ($a, $b)")
    }
  }

  test("codegen path agrees with interpreted eval on a DataFrame") {
    val s = spark
    import s.implicits._
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("", ""), ("abc", "abc")).toDF("a", "b")
    val got = df.select(round(jaro_winkler(col("a"), col("b")), 9))
      .as[Double].collect().toSeq
    assert(got == Seq(0.961111111, 0.813333333, 0.0, 1.0))
  }
}
