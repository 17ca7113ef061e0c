package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded equi-key range (interval) join: pairs every left row with the
  * right rows sharing its key whose timestamp falls in
  * `[leftTs - beforeSec, leftTs + afterSec]` (inclusive, microsecond-exact).
  *
  * Spark has no native range-join strategy; the naive formulation
  * (`l.join(r, key && between)`) degenerates to a per-key cross product with
  * the range as a post-filter — quadratic in hot keys and fatal at 100 TB.
  * This operator bands time into `beforeSec + afterSec`-wide buckets so each
  * right row lands in exactly ONE bucket and each left row's window overlaps
  * at most TWO; the join runs equi on `(key, bucket)` (hash join, AQE-sized,
  * skew-splittable) and the exact range predicate filters the band residue.
  * Cost is one shuffle per side and ≤2× left replication — independent of
  * key hotness.
  *
  * Right columns are emitted as `range_<name>`; left columns keep their
  * names. Matches appear exactly once (the single-bucket right placement
  * guarantees no double-count across bands).
  */
object RangeJoin {

  def band(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      beforeSec: Long, afterSec: Long,
      rightPayload: Seq[String]): DataFrame = {
    require(beforeSec >= 0 && afterSec >= 0 && beforeSec + afterSec > 0,
      "window must be non-empty")
    val reserved = Set("__lep", "__band", "__rk", "__rep")
    val leftClash = left.columns.filter(reserved.contains)
    require(leftClash.isEmpty, s"left input uses reserved column(s): ${leftClash.mkString(",")}")
    val outClash = (rightTs +: rightPayload).map(c => s"range_$c").toSet
      .intersect(left.columns.toSet)
    require(outClash.isEmpty,
      s"left input collides with generated output column(s): ${outClash.mkString(",")}")
    val beforeUs = beforeSec * 1000000L
    val afterUs = afterSec * 1000000L
    val wUs = beforeUs + afterUs // band width in microseconds

    // microsecond-exact epoch as long (NTZ-safe: NTZ interprets in session tz;
    // both sides go through the same conversion so the relative window holds)
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    // floor division on longs (pmod keeps it correct for negative epochs;
    // the double step is exact: the numerator is a multiple of wUs < 2^53)
    def bandOf(c: Column): Column = ((c - pmod(c, lit(wUs))) / wUs).cast("long")

    val l2 = left
      .withColumn("__lep", us(col(leftTs)))
      .withColumn("__band",
        explode(sequence(bandOf(col("__lep") - beforeUs), bandOf(col("__lep") + afterUs))))
    val rCols = (rightTs +: rightPayload.filterNot(_ == rightTs)).distinct
    val r2 = right
      .select((col(key).as("__rk") +: us(col(rightTs)).as("__rep") +:
        rCols.map(c => col(c).as(s"range_$c"))): _*)
      .withColumn("__band", bandOf(col("__rep")))

    l2.join(r2, l2(key) === r2("__rk") && l2("__band") === r2("__band"))
      .filter(col("__rep") >= col("__lep") - beforeUs &&
              col("__rep") <= col("__lep") + afterUs)
      .drop("__lep", "__band", "__rk", "__rep")
  }
}
