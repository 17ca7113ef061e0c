package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression computing a 64-bit Morton (z-order) value by
  * bit-interleaving two 32-bit keys — the clustering key behind
  * `EncodedGraphTable.writeClustered`.
  *
  * Why it exists: a 100 TB fact table has TWO hot access paths — by subject
  * (page) and by object (entity) — and a layout partitioned on either one
  * serves only that one. Sorting files by the interleaved z-value gives each
  * parquet row group a SMALL min/max rectangle in (page, entity) space, so a
  * range/equality predicate on EITHER dimension overlaps few rectangles and
  * the scan skips the rest on footer stats alone (measured in
  * `ClusteredLayoutSpec`). This is the same layout idea Delta/Iceberg expose
  * as OPTIMIZE ZORDER BY; here it is a plain column expression any writer
  * can `repartitionByRange` + `sortWithinPartitions` on.
  *
  * Why an Expression and not a UDF: the z-value is computed once per row in
  * the write path right next to the exchange — a UDF would break the
  * whole-stage-codegen span and pay per-row boxing for two ints. `doGenCode`
  * emits one static call with no allocation.
  *
  * Semantics: signed order of the result equals unsigned lexicographic order
  * of the interleaved sign-flipped inputs, i.e. z-neighbors are coordinate
  * neighbors, negatives (the `ent_id = -1` non-mention sentinel) sort
  * before non-negatives as one contiguous z-range. Inputs must fit in 32
  * bits — a long outside int range fails LOUDLY (truncation would silently
  * fold far-apart keys onto each other and destroy the locality the layout
  * claims); keys wider than 32 bits must be range-reduced by the caller
  * (e.g. `page_id >> shift` or a rank join) before interleaving.
  */
case class ZorderExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left.dataType, right.dataType).forall(t => t == IntegerType || t == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder needs int/long arguments, got (${left.dataType}, ${right.dataType})")
  }

  private def toChecked(e: Expression, v: Any): Int = e.dataType match {
    case IntegerType => v.asInstanceOf[Int]
    case LongType => ZorderExpr.intExact(v.asInstanceOf[Long])
  }

  protected override def nullSafeEval(l: Any, r: Any): Any =
    ZorderExpr.interleave(toChecked(left, l), toChecked(right, r))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => {
      def narrowed(e: Expression, c: String) = e.dataType match {
        case IntegerType => c
        case LongType => s"graft.functions.ZorderExpr.intExact($c)"
      }
      s"graft.functions.ZorderExpr.interleave(${narrowed(left, l)}, ${narrowed(right, r)})"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZorderExpr =
    copy(left = newLeft, right = newRight)
}

object ZorderExpr {

  /** Loud 32-bit narrowing — see the class doc for why truncation is banned. */
  def intExact(v: Long): Int = {
    if (v < Int.MinValue || v > Int.MaxValue)
      throw new ArithmeticException(
        s"graft_zorder: value $v exceeds 32 bits — range-reduce the key before interleaving")
    v.toInt
  }

  /** Spreads the 32 bits of `x` (as unsigned) into the even bit positions
    * of a long — the classic Morton magic-mask ladder. */
  def spread(x: Int): Long = {
    var v = x & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** The frozen contract: z(a, b) with a's bits in the odd (higher)
    * positions. Sign bits are flipped going in so signed input order matches
    * unsigned bit order, and the result's top bit is flipped back so SIGNED
    * long comparison of z-values walks the curve in order. */
  def interleave(a: Int, b: Int): Long =
    ((spread(a ^ Int.MinValue) << 1) | spread(b ^ Int.MinValue)) ^ Long.MinValue

  /** SQL + Column registration: `graft_zorder(a, b)` / call_function. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_zorder",
      exprs => {
        val (a, b) = CosineExpr.exactlyTwo("graft_zorder", exprs); ZorderExpr(a, b)
      }, "built-in")

  /** Column-level entry point (requires register() on the session first). */
  def graft_zorder(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_zorder", a, b)
}
