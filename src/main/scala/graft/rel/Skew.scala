package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot join keys (SURVEY build prompt:
  * "skewed keys → salting or AQE skew-join"). AQE's skew-join split
  * handles sort-merge skew automatically; explicit salting is the tool
  * when one side must hash-join against a replicated small side with a
  * few dominant keys.
  */
object Skew {

  /** Salted equi-join: the skewed (big) side gets a random salt in
    * [0, salt); the small side is replicated `salt` times, so each hot
    * key spreads over `salt` reducers. Inner joins only (salting does
    * not preserve outer-join semantics).
    *
    * `spark.sql.files/shuffle` layout is unchanged — this is a plan
    * rewrite: join key (k) becomes (k, salt_bucket).
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val salted = big.withColumn("__salt",
      (rand(seed = 42) * salt).cast("int"))
    val replicated = small.withColumn("__rep",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) &&
          salted("__salt") === replicated("__rep"))
      .drop("__salt", "__rep")
  }
}
