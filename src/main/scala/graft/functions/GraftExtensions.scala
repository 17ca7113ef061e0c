package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injection point for the engine's native functions —
  * the deployment-grade registration path: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` on spark-submit and
  * every session (including thriftserver/connect sessions that never run
  * driver code) gets `graft_hash64` as a built-in, no per-session
  * `register()` call needed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_hash64"),
      new ExpressionInfo(classOf[Hash64Expr].getName, "graft_hash64"),
      (exprs: Seq[Expression]) => Hash64Expr(GraftExtensions.exactlyOne("graft_hash64", exprs))))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineExpr].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => {
        val (a, b) = CosineExpr.exactlyTwo("graft_cosine", exprs); CosineExpr(a, b)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZorderExpr].getName, "graft_zorder"),
      (exprs: Seq[Expression]) => {
        val (a, b) = CosineExpr.exactlyTwo("graft_zorder", exprs); ZorderExpr(a, b)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_heavy_hitters"),
      (exprs: Seq[Expression]) => MisraGriesAgg.buildFromExprs(exprs)))
    // whole-operator rung: the native as-of join's planner strategy, plus
    // the optimizer-rule rung — left-only filters pushed below the node
    // (riding the fixed-point operator-optimization batch, so pushed
    // predicates keep sinking into the scan)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsofJoinLeftFilterPushdown)
  }
}

object GraftExtensions {
  /** Arity gate shared by both registration paths: a zero-arg call must not
    * surface as NoSuchElementException and extra args must not be silently
    * ignored — raise a proper analysis-time error instead. */
  private[functions] def exactlyOne(name: String, exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name, "expectedNum" -> "1",
          "actualNum" -> exprs.length.toString, "docroot" -> ""))
    exprs.head
  }
}
