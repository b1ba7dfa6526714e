package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join at scale.
  *
  * Spark plans a pure inequality join (`p.t >= i.s AND p.t < i.e`, no
  * equi key) as BroadcastNestedLoopJoin — O(|points|·|intervals|) work
  * and a broadcast of one whole side, which dies at scale. The standard
  * fix is BUCKETING the range dimension: each point hashes to one
  * bucket `floor(t/w)`, each interval explodes to every bucket it
  * overlaps, and the join becomes an EQUI-join on the bucket id with
  * the exact range predicate as residual — shuffled-hash/sort-merge
  * planable, AQE-replannable, skew-salvageable like any other equi
  * join. A (point, interval) pair can only meet in the point's single
  * bucket, so no dedup is needed.
  *
  * Pick `bucketWidth` near the typical interval length: cost is
  * O(points + intervals · avgSpan/width) exploded rows; too-small
  * widths inflate the interval side, too-large widths inflate the
  * residual false-positive rate within buckets.
  */
object RangeJoin {

  /** Join each point row to every interval row whose [start, end) range
    * contains the point. Time columns must be integral (epoch seconds /
    * bucket indices).
    *
    * @param points      left side, one time column `tCol`
    * @param intervals   right side, `sCol` inclusive, `eCol` exclusive
    * @param bucketWidth bucket size in the shared time unit
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      tCol: String, sCol: String, eCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // Integer floor-division: `/` casts to double, which rounds above
    // 2^53 and can put a point and its interval in DIFFERENT buckets,
    // silently dropping matches. (x - pmod(x, w)) is exactly divisible
    // by w, so integral `div` (truncating) equals floor for negatives
    // too — exact at any Long magnitude.
    def floorDiv(c: org.apache.spark.sql.Column) =
      call_function("div",
        c - pmod(c, lit(bucketWidth)), lit(bucketWidth)).cast("long")
    val pts = points.withColumn("__rj_bucket", floorDiv(col(tCol)))
    val ivs = intervals
      .filter(col(eCol) > col(sCol)) // empty intervals match nothing
      .withColumn("__rj_bucket",
        explode(sequence(
          floorDiv(col(sCol)),
          floorDiv(col(eCol) - 1))))
    pts.join(ivs,
        pts("__rj_bucket") === ivs("__rj_bucket") &&
          col(tCol) >= col(sCol) && col(tCol) < col(eCol))
      .drop("__rj_bucket")
  }

  /** Interval x interval OVERLAP join, same bucketing trick: both
    * sides explode to the buckets they span, meet on the bucket equi
    * key, and the exact overlap predicate (`l.s < r.e AND r.s < l.e`,
    * half-open on both) runs as residual. Unlike point-in-interval, a
    * pair can meet in EVERY shared bucket, so the join would duplicate
    * matches — the standard fix keeps only the pair's FIRST shared
    * bucket (`greatest(floor(ls/w), floor(rs/w))`), an exact
    * dedup-free predicate instead of a distinct over the output.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      lsCol: String, leCol: String, rsCol: String, reCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def floorDiv(c: org.apache.spark.sql.Column) =
      call_function("div",
        c - pmod(c, lit(bucketWidth)), lit(bucketWidth)).cast("long")
    def exploded(df: DataFrame, s: String, e: String, b: String) =
      df.filter(col(e) > col(s))
        .withColumn(b, explode(sequence(floorDiv(col(s)),
          floorDiv(col(e) - 1))))
    val l = exploded(left, lsCol, leCol, "__rj_lb")
    val r = exploded(right, rsCol, reCol, "__rj_rb")
    l.join(r,
        col("__rj_lb") === col("__rj_rb") &&
          col(lsCol) < col(reCol) && col(rsCol) < col(leCol) &&
          col("__rj_lb") === greatest(floorDiv(col(lsCol)),
            floorDiv(col(rsCol))))
      .drop("__rj_lb", "__rj_rb")
  }

  /** 2-D spatial point-in-box join — the bucketing trick on TWO axes.
    * Boxes explode to every (cellX, cellY) grid cell they overlap;
    * each point lives in exactly ONE cell, so every matching
    * (point, box) pair meets in exactly one joined row — like
    * point-in-interval, no dedup is ever needed. The join is a plain
    * equi join on the composite cell key: shuffled-hash planable,
    * AQE-replannable. Boxes are [x1, x2) × [y1, y2) half-open;
    * coordinates must be integral.
    *
    * Cell sizing is per axis (`cellW`, `cellH`), chosen like the 1-D
    * width: near the typical box extent on that axis. Cost is
    * O(points + Σ boxes · cellsCovered).
    */
  def pointInBox(points: DataFrame, boxes: DataFrame,
      pxCol: String, pyCol: String,
      x1Col: String, y1Col: String, x2Col: String, y2Col: String,
      cellW: Long, cellH: Long): DataFrame = {
    require(cellW > 0 && cellH > 0, "cell sizes must be positive")
    def floorDiv(c: org.apache.spark.sql.Column, w: Long) =
      call_function("div", c - pmod(c, lit(w)), lit(w)).cast("long")
    val pts = points
      .withColumn("__rj_cx", floorDiv(col(pxCol), cellW))
      .withColumn("__rj_cy", floorDiv(col(pyCol), cellH))
    val bxs = boxes
      .filter(col(x2Col) > col(x1Col) && col(y2Col) > col(y1Col))
      .withColumn("__rj_cx", explode(sequence(
        floorDiv(col(x1Col), cellW), floorDiv(col(x2Col) - 1, cellW))))
      .withColumn("__rj_cy", explode(sequence(
        floorDiv(col(y1Col), cellH), floorDiv(col(y2Col) - 1, cellH))))
    pts.join(bxs,
        pts("__rj_cx") === bxs("__rj_cx") &&
          pts("__rj_cy") === bxs("__rj_cy") &&
          col(pxCol) >= col(x1Col) && col(pxCol) < col(x2Col) &&
          col(pyCol) >= col(y1Col) && col(pyCol) < col(y2Col))
      .drop("__rj_cx", "__rj_cy")
  }
}
