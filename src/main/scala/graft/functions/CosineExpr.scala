package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over `array<float>`
  * embedding columns.
  *
  * Why an Expression (second rung of the capability ladder, like
  * [[Hash64Expr]]): the declarative alternative — `aggregate(zip_with(...))`
  * — is built from higher-order functions, and Spark's higher-order
  * functions do NOT participate in whole-stage codegen (they evaluate
  * interpreted lambdas per element and `zip_with` materializes an
  * intermediate array per row). `doGenCode` here emits one static call over
  * the two `ArrayData` values: no per-element virtual dispatch, no
  * intermediate allocation, and the expression fuses into the surrounding
  * WholeStageCodegen span (filters, joins).
  *
  * Semantics: accumulation is double-precision in index order —
  * bit-identical to the `aggregate(zip_with(...))` chain it replaces, so
  * thresholds validated against the HOF formulation (and the DuckDB
  * oracles) carry over. Degenerate inputs (length mismatch, zero norm,
  * empty arrays) yield NULL — deliberately NOT NaN: Spark orders NaN
  * GREATER than every double (`nan > x` is true), so a NaN would PASS a
  * `>= threshold` filter and surface garbage pairs; NULL fails every
  * comparison.
  */
case class CosineExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // nullable beyond input nullability: degenerate vectors produce NULL
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine needs two array<float> arguments, got (${left.dataType}, ${right.dataType})")

  protected override def nullSafeEval(a: Any, b: Any): Any =
    CosineExpr.cosineBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.CosineExpr.cosineBoxed($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }""")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineExpr =
    copy(left = newLeft, right = newRight)
}

object CosineExpr {

  /** dot(a,b) / (|a|·|b|) with double accumulators in index order; null on
    * length mismatch / zero norm / empty (null fails every threshold filter
    * — NaN would not, because Spark orders NaN above all doubles). */
  def cosineBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      // null elements read as 0.0 via the primitive accessor (embedding
      // arrays are non-null by construction; see the containsNull=false
      // schema of the embeddings table)
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na * nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  private[functions] def exactlyTwo(name: String, exprs: Seq[Expression]): (Expression, Expression) = {
    if (exprs.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name, "expectedNum" -> "2",
          "actualNum" -> exprs.length.toString, "docroot" -> ""))
    (exprs.head, exprs(1))
  }

  /** SQL + Column registration: `graft_cosine(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => { val (a, b) = exactlyTwo("graft_cosine", exprs); CosineExpr(a, b) },
      "built-in")

  /** Column-level entry point (requires register() on the session first). */
  def graft_cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_cosine", a, b)
}
