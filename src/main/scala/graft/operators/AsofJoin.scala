package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the single latest right row
  * with `rightTs <= leftTs` for the same key — the canonical event-alignment
  * operator Spark lacks as a built-in.
  *
  * Composition (per the custom-operator preference order: compose built-ins
  * before custom Catalyst work): tag and union both sides, ONE shuffle on
  * (key), and a running `last(right_payload, ignoreNulls)` window carries
  * each right row forward to the left rows that follow it in time. No range
  * cross-product, no per-key collect — at 100 TB this is a single
  * hash-partitioned sort per side. Skew caveat: AQE skew mitigation splits
  * shuffle JOIN partitions, not window exchanges — a key with 10⁸ events is
  * one window task here. The task is still memory-safe (the running-last
  * frame holds one row and the sort spills; `AsofJoinSpec` pins a planted
  * 10⁶-event hot key), but it serializes that key's wall-clock; for
  * pathological keys, sub-bucket by time range and merge each bucket's last
  * carried row forward.
  *
  * Tie semantics: a right row at exactly `leftTs` matches (<=); among right
  * rows sharing a timestamp the greatest payload struct wins
  * (deterministic).
  */
object AsofJoin {

  /** @param rightPayload right columns to carry; emitted as `asof_<name>`
    * @param toleranceSec if set, matches older than this are nulled out */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      toleranceSec: Option[Long] = None): DataFrame = {

    val reserved = Set("__k", "__ts", "__side", "__rp", "__lrow", "__match")
    val clash = (left.columns ++ right.columns).distinct.filter(reserved.contains)
    require(clash.isEmpty, s"input uses reserved column(s): ${clash.mkString(",")}")
    val payloadCols = (rightTs +: rightPayload.filterNot(_ == rightTs)).distinct
    val outClash = payloadCols.map(c => s"asof_$c").toSet.intersect(left.columns.toSet)
    require(outClash.isEmpty,
      s"left input collides with generated output column(s): ${outClash.mkString(",")}")
    val rpType = right.select(struct(payloadCols.map(col): _*)).schema.head.dataType
    val lrowType = left.select(struct(left.columns.map(col).toIndexedSeq: _*)).schema.head.dataType

    val l2 = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast(rpType).as("__rp"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__lrow"))
    val r2 = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      struct(payloadCols.map(col): _*).as("__rp"),
      lit(null).cast(lrowType).as("__lrow"))

    // right rows sort before left rows at equal timestamps so `<=` holds
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts").asc, col("__side").asc, col("__rp").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l2.unionByName(r2)
      .withColumn("__match", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val bounded = toleranceSec match {
      case Some(tol) =>
        // microsecond-exact tolerance: unix_timestamp truncates to seconds,
        // which would admit matches up to 999 ms beyond the cutoff while the
        // rest of the engine (RangeJoin, sessions) is µs-exact. timestampdiff
        // subtracts NTZ values in their own (naive) domain — a cast through
        // TIMESTAMP would route via the session timezone, shifting the
        // cutoff by the offset delta when the two sides straddle a DST
        // transition in a non-UTC session.
        carried.withColumn("__match",
          when(col("__match").isNotNull &&
            expr(s"timestampdiff(MICROSECOND, __match.`$rightTs`, __ts)") <= tol * 1000000L,
            col("__match")))
      case None => carried
    }

    val leftOut: Seq[Column] = left.columns.toIndexedSeq.map(c => col(s"__lrow.$c").as(c))
    val rightOut: Seq[Column] = payloadCols.map(c => col(s"__match.$c").as(s"asof_$c"))
    bounded.select(leftOut ++ rightOut: _*)
  }
}
