package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve keys for multi-dimensional data layout.
  *
  * Sorting/range-partitioning a table by the interleaved key keeps
  * 2-D tiles contiguous on disk, so a 2-D range predicate (the F2
  * operator's lon/lat box) prunes to O(perimeter) file ranges instead
  * of scanning one full dimension — the standard lakehouse layout
  * trick for spatial/temporal co-location at 100 TB. Pairs with
  * [[ObservationStore]]'s bucketed layout: bucket by pixel for joins,
  * z-order within files for range scans.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integral
    * columns: bit b of `x` lands at position 2b, bit b of `y` at
    * 2b+1. Pure integer bit arithmetic (shift/and/or) — codegen'd,
    * exact at any magnitude, and replayable in ANSI SQL as
    * `(x DIV 2^b) % 2 * 2^(2b)` sums (the `s_zorder_key` oracle).
    */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { b =>
      shiftleft(shiftright(xl, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(
          shiftleft(shiftright(yl, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_ bitwiseOR _)
  }
}
