package graft.functions

/** DuckDB-dialect SQL fragments replaying [[SplitMix64]] exactly in
  * mod-2⁶⁴ HUGEINT arithmetic — XOR via 32-bit BIGINT halves, multiply
  * via 32-bit split products (HUGEINT is 128-bit, so the 64×64 products
  * never overflow before the final mod). Shared by every oracle that
  * replays a splitmix64-seeded derived stream (bootstrap draws, sign
  * matrices); the engine side uses the native codegen expression.
  */
object SplitMix64Sql {

  val M64 = "18446744073709551616" // 2^64

  def u(x: Long): String = java.lang.Long.toUnsignedString(x)

  def xor64(a: String, b: String): String =
    s"(CAST(xor(CAST(($a) // 4294967296 AS BIGINT), " +
      s"CAST(($b) // 4294967296 AS BIGINT)) AS HUGEINT) * 4294967296 + " +
      s"CAST(xor(CAST(($a) % 4294967296 AS BIGINT), " +
      s"CAST(($b) % 4294967296 AS BIGINT)) AS HUGEINT))"

  def mulmod(x: String, m: Long): String = {
    val mhi = (m >>> 32) & 0xffffffffL
    val mlo = m & 0xffffffffL
    s"(((($x) % 4294967296) * $mlo + " +
      s"(((($x) % 4294967296) * $mhi + (($x) // 4294967296) * $mlo) " +
      s"% 4294967296) * 4294967296) % $M64)"
  }

  /** The three mixer rounds as chained same-SELECT aliases: given a
    * HUGEINT column alias `x0` already in scope, emits
    * `x1, ..., x4` where `x4` is the finalized unsigned mix in
    * [0, 2⁶⁴). Append further aliases referencing `x4` after it.
    */
  def mixAliases: String =
    s"""(x0 + ${u(0x9e3779b97f4a7c15L)}) % $M64 AS x1,
       |${mulmod(xor64("x1", "x1 // 1073741824"), 0xbf58476d1ce4e5b9L)} AS x2,
       |${mulmod(xor64("x2", "x2 // 134217728"), 0x94d049bb133111ebL)} AS x3,
       |${xor64("x3", "x3 // 2147483648")} AS x4""".stripMargin
}
