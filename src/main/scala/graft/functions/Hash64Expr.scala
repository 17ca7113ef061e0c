package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's frozen 64-bit content hash
  * (FNV-1a over UTF-8 bytes folded through a splitmix finalizer — the same
  * family as TextOps.hash64).
  *
  * Why an Expression and not a UDF (the one place the capability ladder
  * justifies custom Catalyst work in this engine): content-addressed
  * dataset splits and dedup keys want to live INSIDE whole-stage codegen
  * next to filters and aggregates — a Scala UDF breaks the codegen span and
  * pays per-row serialization, and a mapPartitions stage forces an object
  * boundary for a single scalar. `doGenCode` emits a static call on the
  * UTF8String bytes, so generated code keeps one monomorphic call site and
  * allocates nothing.
  *
  * The hash is frozen: splits computed today remain valid for every future
  * run — the property a training-data pipeline needs from train/val/test
  * assignment.
  */
case class Hash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_hash64 needs a string argument, got ${child.dataType}")

  protected override def nullSafeEval(input: Any): Any =
    Hash64Expr.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash64Expr.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash64Expr =
    copy(child = newChild)
}

object Hash64Expr {
  /** hashes the UTF-8 bytes directly — the frozen contract of this expression */
  def hashUtf8(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    // splitmix finalizer (TextOps.mix64)
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** SQL + Column registration: `graft_hash64(text)` / call_function. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hash64",
      exprs => Hash64Expr(GraftExtensions.exactlyOne("graft_hash64", exprs)), "built-in")

  /** Column-level entry point (requires register() on the session first). */
  def graft_hash64(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_hash64", c)
}
