package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** splitmix64 finalizer (Steele, Lea & Flood 2014 — the JDK
  * SplittableRandom mixer) of a 64-bit key, as a native codegen
  * `Expression`: the cheap deterministic per-row hash for derived
  * pseudo-random streams (bootstrap replica draws, salt derivation).
  * ~30× faster than the md5-string path for integer keys (no string
  * materialization, three multiply/xor-shift rounds), and exactly
  * replayable in integer SQL via mod-2⁶⁴ HUGEINT arithmetic — the
  * same toolkit the SimHash / collection-source oracles already use.
  * Long arithmetic wraps natively (unaffected by ANSI overflow
  * checks, which govern SQL operators, not JVM code).
  */
case class SplitMix64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"splitmix64 needs a bigint input, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SplitMix64.mix(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val x = ctx.freshName("x")
      s"""
         |long $x = $c + 0x9e3779b97f4a7c15L;
         |$x = ($x ^ ($x >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$x = ($x ^ ($x >>> 27)) * 0x94d049bb133111ebL;
         |${ev.value} = $x ^ ($x >>> 31);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SplitMix64 =
    copy(child = newChild)
}

object SplitMix64 {
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Column-level entry point: `splitmix64($"key")`. */
  def splitmix64(c: Column): Column =
    ColumnBridge.toColumn(SplitMix64(ColumnBridge.toExpression(c)))
}
