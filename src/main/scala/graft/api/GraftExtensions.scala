package graft.api

import graft.functions.{CosineSimilarity, PolyEval, RollingHash}
import graft.plans.{AsOfFilterPushdown, AsOfJoinStrategy}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: makes the native expressions
  * available in any session configured with
  * `spark.sql.extensions=graft.api.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) — the deployment-grade
  * alternative to per-session temp-function registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      exprs => RollingHash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("poly_eval"),
      new ExpressionInfo(classOf[PolyEval].getName, "poly_eval"),
      exprs => PolyEval(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => AsOfFilterPushdown)
  }
}
