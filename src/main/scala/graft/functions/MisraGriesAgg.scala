package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native Catalyst aggregate (the
  * third rung of the capability ladder beside [[Hash64Expr]]/[[CosineExpr]]:
  * a custom `TypedImperativeAggregate` with full partial/merge support).
  *
  * Why custom: Spark's built-in approximate frequency surface
  * (`df.stat.freqItems`) is a driver-side action that returns ONE row of
  * candidate arrays with no counts and cannot appear under `groupBy` — so
  * per-group heavy hitters (heavy entities per language, heavy tokens per
  * source) have no built-in form short of an exact full aggregation, whose
  * intermediate is O(group cardinality × vocabulary). This sketch is a
  * bounded O(k) mergeable state per group: partial aggregation happens
  * map-side, merges are associative, and the output is the candidate map.
  *
  * Guarantee (the property everything downstream leans on): for a group
  * whose stream has total weight n, every item with true count
  * > n/(k+1) is present in the result, and each reported count is within
  * [true − n/(k+1), true]. The sketch may keep ITEMS below the bound and
  * counts UNDERestimate — so consumers use it as a pruned candidate set
  * and exact-verify with a second pass (the `kg_heavy_entities` contract
  * query's shape), which makes the final output exact and
  * partition-invariant even though the sketch itself is neither.
  *
  * Merge rule is the mergeable-summaries formulation (Agarwal et al.,
  * PODS'12): sum counts, then subtract the (k+1)-th largest count from
  * every entry and drop non-positive ones — the same error accounting as
  * per-item MG decrements, valid for arbitrary merge trees (Spark's
  * partial aggregation is exactly such a tree).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.Summary] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "graft_heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string column, got ${child.dataType}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): MisraGriesAgg.Summary = new MisraGriesAgg.Summary(k)

  override def update(buf: MisraGriesAgg.Summary, input: InternalRow): MisraGriesAgg.Summary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MisraGriesAgg.Summary, other: MisraGriesAgg.Summary): MisraGriesAgg.Summary = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: MisraGriesAgg.Summary): Any = {
    val entries = buf.entries.toArray.sortBy { case (s, c) => (-c, s) }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1): Any)),
      new GenericArrayData(entries.map(e => e._2: Any)))
  }

  override def serialize(buf: MisraGriesAgg.Summary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    val es = buf.entries.toArray // materialize: .size on the raw iterator would consume it
    out.writeInt(es.length)
    es.foreach { case (s, c) => out.writeUTF(s); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesAgg.Summary = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val s = new MisraGriesAgg.Summary(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { s.putRaw(in.readUTF(), in.readLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(n: Int): MisraGriesAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MisraGriesAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {

  /** Bounded sketch state: at most k (item, count) entries. */
  final class Summary(val k: Int) {
    private val counts = mutable.HashMap.empty[String, Long]

    private[functions] def putRaw(s: String, c: Long): Unit = counts.update(s, c)
    def entries: Iterator[(String, Long)] = counts.iterator
    def estimate(s: String): Long = counts.getOrElse(s, 0L)
    def size: Int = counts.size

    def add(s: String, w: Long): Unit = {
      counts.update(s, counts.getOrElse(s, 0L) + w)
      if (counts.size > k) compress()
    }

    def mergeIn(o: Summary): Unit = {
      o.counts.foreach { case (s, c) => counts.update(s, counts.getOrElse(s, 0L) + c) }
      if (counts.size > k) compress()
    }

    /** Subtract the (k+1)-th largest count from every entry, drop ≤ 0 —
      * leaves ≤ k entries; total subtraction over a weight-n stream is
      * ≤ n/(k+1) per surviving item (the MG error bound). */
    private def compress(): Unit = {
      val vals = counts.values.toArray
      java.util.Arrays.sort(vals)
      val t = vals(vals.length - k - 1)
      val keep = counts.iterator.collect { case (s, c) if c > t => (s, c - t) }.toArray
      counts.clear()
      keep.foreach { case (s, c) => counts.update(s, c) }
    }
  }

  private[functions] def buildFromExprs(exprs: Seq[Expression]): MisraGriesAgg = {
    val (col, kExpr) = CosineExpr.exactlyTwo("graft_heavy_hitters", exprs)
    // fold first so CAST(64 AS INT)-style determinable constants work; a
    // genuinely non-constant k gets an error that SAYS so (not a bogus
    // wrong-argument-count message)
    val folded = if (kExpr.foldable) Literal.create(kExpr.eval(), kExpr.dataType) else kExpr
    val k = folded match {
      case Literal(v: Int, IntegerType) => v
      case _ => throw new IllegalArgumentException(
        s"graft_heavy_hitters(col, k): k must be a constant INTEGER, got ${kExpr.sql}")
    }
    MisraGriesAgg(col, k)
  }

  /** SQL + Column registration: `graft_heavy_hitters(col, k)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_heavy_hitters", buildFromExprs, "built-in")

  /** Column-level entry point (requires register() on the session first). */
  def graft_heavy_hitters(c: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "graft_heavy_hitters", c, org.apache.spark.sql.functions.lit(k))
}
