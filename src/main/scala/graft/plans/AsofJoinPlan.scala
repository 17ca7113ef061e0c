package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Native as-of (backward) join — the whole-operator rung of the custom-
  * Catalyst ladder: a logical node ([[AsofJoinNode]]), a planner strategy
  * ([[AsofJoinStrategy]]), and a sort-merge physical operator
  * ([[AsofJoinExec]]) registered through `SparkSessionExtensions`
  * (graft.functions.GraftExtensions) or per-session via
  * `spark.experimental.extraStrategies`.
  *
  * Why a custom operator when `AsofJoin.backward` already composes one from
  * built-ins: the composition unions both sides into ONE stream of wide
  * null-padded rows (every row carries a null struct for the other side's
  * payload), sorts that combined stream, and pays the window-frame machinery
  * for a running `last`. The native operator keeps the sides apart — each is
  * hash-partitioned on the key and sorted independently (two smaller sorts
  * that AQE can coalesce separately), and the merge itself is a streaming
  * two-pointer pass holding exactly ONE candidate row, emitting unsafe rows
  * with no struct pack/unpack. Same shuffle count (one per side, exactly
  * what any co-partitioned join pays), strictly less data through the sorts,
  * no window operator. Semantics are locked to the composed operator by
  * `AsofJoinNativeSpec` (randomized parity incl. ties, null keys/timestamps,
  * tolerance) and by `ev_asof_join_native` sharing `ev_asof_join`'s DuckDB
  * oracle.
  *
  * Tie rule (identical to the composed operator): a right row at exactly
  * `leftTs` matches (`<=`); among right rows sharing a timestamp the
  * greatest payload tuple wins — enforced here by the required child
  * ordering (key, ts, payload...) plus last-match-wins in the merge.
  */
object AsofJoinNative {

  /** Drop-in for `AsofJoin.backward` on the native operator. */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      toleranceSec: Option[Long] = None): DataFrame =
    build(left, right, key, leftTs, rightTs, rightPayload, toleranceSec, fwd = false)

  /** Forward as-of: for each left row, the EARLIEST right row with the same
    * key at-or-after `leftTs` (DuckDB `ASOF LEFT JOIN ... ON l.ts <= r.ts`);
    * optional tolerance bounds `rightTs - leftTs`. Null timestamps on either
    * side never match (a "next event" for an unknown time is meaningless);
    * among right rows sharing the earliest timestamp the greatest payload
    * tuple wins — the same tie rule as backward. Same plan shape: per-side
    * exchange + sort (ts DESCENDING here, so the streaming merge consumes
    * candidates down toward each left timestamp). */
  def forward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      toleranceSec: Option[Long] = None): DataFrame =
    build(left, right, key, leftTs, rightTs, rightPayload, toleranceSec, fwd = true)

  private def build(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      toleranceSec: Option[Long], fwd: Boolean): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)

    val payloadCols = (rightTs +: rightPayload.filterNot(_ == rightTs)).distinct
    val outClash = payloadCols.map(c => s"asof_$c").toSet.intersect(left.columns.toSet)
    require(outClash.isEmpty,
      s"left input collides with generated output column(s): ${outClash.mkString(",")}")

    // narrow the right side to key + payload before analysis (Catalyst's
    // generic ColumnPruning also prunes through the node later — this keeps
    // the node's attrs minimal from the start)
    val rightPruned = right.select((key +: payloadCols).distinct.map(col): _*)
    val lPlan = left.queryExecution.analyzed
    // re-alias the right side so a self-join (both sides from one relation)
    // never carries duplicate exprIds into the node
    val rAnalyzed = rightPruned.queryExecution.analyzed
    val rPlan = Project(rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)

    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"$side side has no column `$n`"))
    val lk = attr(lPlan, key, "left"); val rk = attr(rPlan, key, "right")
    val lt = attr(lPlan, leftTs, "left"); val rt = attr(rPlan, rightTs, "right")
    require(lk.dataType == rk.dataType,
      s"key type mismatch: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"timestamp type mismatch: ${lt.dataType} vs ${rt.dataType}")
    toleranceSec.foreach { _ =>
      require(lt.dataType == TimestampType || lt.dataType == TimestampNTZType,
        s"tolerance needs a timestamp column, got ${lt.dataType}")
    }
    val payload = payloadCols.map(attr(rPlan, _, "right"))
    (lk +: lt +: payload).foreach { a =>
      require(RowOrdering.isOrderable(a.dataType),
        s"column `${a.name}` of type ${a.dataType} is not orderable")
    }
    val payloadOut = payload.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())

    org.apache.spark.sql.graftshim.GraftSqlShim.ofRows(spark,
      AsofJoinNode(lPlan, rPlan, lk, rk, lt, rt, payload, payloadOut,
        toleranceSec.map(_ * 1000000L), fwd))
  }

  /** Idempotent per-session registration (the extensions path in
    * `GraftExtensions` covers deployments; this covers ad-hoc sessions).
    * The pushdown rule lands in `extraOptimizations` here (runs after the
    * main batches: filter reaches below the node, not into the scan); the
    * extensions path injects it into the fixed-point operator-optimization
    * batch where it composes with PushDownPredicates all the way down. */
  def ensureStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        AsofJoinStrategy +: spark.experimental.extraStrategies
    }
    if (!spark.experimental.extraOptimizations.contains(AsofJoinLeftFilterPushdown)) {
      spark.experimental.extraOptimizations =
        AsofJoinLeftFilterPushdown +: spark.experimental.extraOptimizations
    }
  }
}

/** Pushes the left-only deterministic conjuncts of a Filter sitting on an
  * [[AsofJoinNode]] below the node. Safe because the as-of join is a left
  * map: every output row derives from exactly one left row (the right side
  * only contributes the `asof_*` payload), so dropping left rows before the
  * join drops exactly the corresponding output rows — and the surviving
  * rows' matches are computed from the UNFILTERED right side either way.
  * At scale this is the difference between filtering before and after the
  * left side's exchange+sort. Catalyst's generic ColumnPruning already
  * prunes columns through the node (it only needs `references`/`output`);
  * predicate pushdown has no such generic case — hence this rule, the
  * `Rule[LogicalPlan]` rung of the custom-Catalyst ladder. */
object AsofJoinLeftFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsofJoinNode) =>
      // same split discipline as PushPredicateThroughJoin: deterministic
      // conjuncts are candidates, nondeterministic ones must stay above
      // (and keep their evaluation order)
      val (deterministic, nonDeterministic) =
        splitConjunctivePredicates(cond).partition(_.deterministic)
      val (push, stay) =
        deterministic.partition(_.references.subsetOf(a.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(push.reduce(And), a.left))
        (stay ++ nonDeterministic).reduceOption(And)
          .map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Logical as-of join. `payloadOut` attrs are minted once at construction
  * (fresh exprIds, nullable) and must stay stable across plan copies. */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute], payloadOut: Seq[Attribute],
    toleranceMicros: Option[Long], forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofJoinNode =>
      AsofJoinExec(n.leftKey, n.rightKey, n.leftTs, n.rightTs,
        n.payload, n.payloadOut, n.toleranceMicros, n.forward,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Requires both children clustered on the key
  * (EnsureRequirements inserts the two hash exchanges and keeps them
  * co-partitioned) and sorted by (key, ts[, payload...]); the merge is a
  * single streaming pass per partition holding one candidate match. */
case class AsofJoinExec(
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute], payloadOut: Seq[Attribute],
    toleranceMicros: Option[Long], forward: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // the payload columns in the right ordering pin the tie rule: among right
  // rows at one (key, ts) the LAST in this order — the greatest payload
  // tuple — is the one the merge retains. Forward mode walks time DOWNWARD:
  // ts sorts Descending (nulls last), so the merge consumes right rows from
  // the far future toward each left timestamp and the retained candidate is
  // the EARLIEST at-or-after match.
  private def tsDir = if (forward) Descending else Ascending
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, tsDir)),
    SortOrder(rightKey, Ascending) +: SortOrder(rightTs, tsDir) +:
      payload.filterNot(_.semanticEquals(rightTs)).map(a => SortOrder(a, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val tol = toleranceMicros
    val fwd = forward
    val lOut = left.output
    val rOut = right.output
    val localOutput = output
    val localPayloadOut = payloadOut
    val lKeyB = BindReferences.bindReference(leftKey: Expression, lOut)
    val lTsB = BindReferences.bindReference(leftTs: Expression, lOut)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, rOut)
    val rTsB = BindReferences.bindReference(rightTs: Expression, rOut)
    val payloadB = payload.map(a => BindReferences.bindReference(a: Expression, rOut))
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val nPayload = payload.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val payloadProj = UnsafeProjection.create(payloadB)
        private val joiner = new JoinedRow
        private val outProj = UnsafeProjection.create(localOutput, lOut ++ localPayloadOut)
        private val nullPayload = new GenericInternalRow(nPayload)
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var hasMatch = false
        private var matchKey: Any = null
        private var matchTs: Any = null
        private var matchPayload: UnsafeRow = null

        // null-safe compare matching SortOrder's default asc-nulls-first
        @inline private def cmp(ord: Ordering[Any], a: Any, b: Any): Int =
          if (a == null) { if (b == null) 0 else -1 }
          else if (b == null) 1
          else ord.compare(a, b)

        // backward: right row qualifies at rt <= lt (null group matches the
        // null group, mirroring the composed operator's nulls-first window).
        // forward: right row qualifies at rt >= lt, nulls NEVER match — in
        // the Descending (nulls-last) right order the null-ts tail of a key
        // is simply left unconsumed until the next key advances past it.
        @inline private def tsQualifies(rt: Any, lt: Any): Boolean =
          if (fwd) rt != null && lt != null && cmp(tsOrd, rt, lt) >= 0
          else cmp(tsOrd, rt, lt) <= 0

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyB.eval(l)
          val lt = lTsB.eval(l)
          var scanning = rHead != null
          while (scanning) {
            val rk = rKeyB.eval(rHead)
            val kc = cmp(keyOrd, rk, lk)
            if (kc < 0 || (kc == 0 && tsQualifies(rTsB.eval(rHead), lt))) {
              if (kc == 0) {
                // values/rows from the iterator are reused buffers — copy
                hasMatch = true
                matchKey = InternalRow.copyValue(rk)
                matchTs = InternalRow.copyValue(rTsB.eval(rHead))
                matchPayload = payloadProj(rHead).copy()
              }
              rHead = if (rIter.hasNext) rIter.next() else null
              scanning = rHead != null
            } else scanning = false
          }
          val keyValid = hasMatch && cmp(keyOrd, matchKey, lk) == 0 &&
            (!fwd || (lt != null && matchTs != null))
          val valid = keyValid && (tol match {
            case Some(t) =>
              if (fwd) matchTs.asInstanceOf[Long] - lt.asInstanceOf[Long] <= t
              else lt != null && matchTs != null &&
                lt.asInstanceOf[Long] - matchTs.asInstanceOf[Long] <= t
            case None => true
          })
          numOut += 1
          outProj(joiner(l, if (valid) matchPayload else nullPayload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
