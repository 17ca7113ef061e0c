package graft.operators

import graft.SparkTestBase
import graft.util.Rng
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {

  /** deterministic two-sided event stream with microsecond jitter */
  private def sides() = {
    val sps = spark; import sps.implicits._
    val base = 1700000000000L // ms epoch
    def ts(i: Int, seed: Int): Timestamp = {
      val rng = Rng.at(seed, i)
      val t = new Timestamp(base + rng.nextInt(2000000).toLong * 7L)
      t.setNanos(rng.nextInt(1000000) * 1000) // microsecond fraction
      t
    }
    val left = (0 until 300).map(i => (i.toLong, (i % 17).toLong, ts(i, 31)))
    val right = (0 until 900).map(i => (1000L + i, (i % 17).toLong, ts(i, 32)))
    (spark.createDataset(left).toDF("event_id", "user_id", "ts"),
      spark.createDataset(right).toDF("event_id", "user_id", "ts"))
  }

  test("banded range join equals the brute-force range join") {
    val (l, r) = sides()
    val got = RangeJoin.band(l, r, "user_id", "ts", "ts",
        beforeSec = 600, afterSec = 120, rightPayload = Seq("event_id"))
      .select(col("event_id"), col("range_event_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet

    val lr = l.collect().map(x => (x.getLong(0), x.getLong(1), x.getTimestamp(2)))
    val rr = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getTimestamp(2)))
    val want = (for {
      (lid, lk, lts) <- lr
      (rid, rk, rts) <- rr
      if lk == rk
      dUs = (lts.getTime / 1000 * 1000000 + lts.getNanos / 1000) -
        (rts.getTime / 1000 * 1000000 + rts.getNanos / 1000)
      if dUs >= -120L * 1000000 && dUs <= 600L * 1000000
    } yield (lid, rid)).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("each matching pair appears exactly once (no band double-count)") {
    val (l, r) = sides()
    val pairs = RangeJoin.band(l, r, "user_id", "ts", "ts", 600, 120, Seq("event_id"))
      .groupBy("event_id", "range_event_id").count()
      .filter(col("count") > 1).count()
    assert(pairs == 0)
  }

  test("randomized windows agree with brute force") {
    val (l, r) = sides()
    val lr = l.collect().map(x => (x.getLong(0), x.getLong(1), x.getTimestamp(2)))
    val rr = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getTimestamp(2)))
    def us(t: Timestamp): Long = t.getTime / 1000 * 1000000 + t.getNanos / 1000
    (0 until 5).foreach { trial =>
      val rng = Rng.at(777, trial)
      val before = rng.nextInt(3) match {
        case 0 => 0L; case 1 => 1L + rng.nextInt(900); case _ => 1000L + rng.nextInt(5000)
      }
      val after = if (before == 0) 1L + rng.nextInt(900) else rng.nextInt(900).toLong
      val got = RangeJoin.band(l, r, "user_id", "ts", "ts", before, after, Seq("event_id"))
        .select(col("event_id"), col("range_event_id")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val want = (for {
        (lid, lk, lts) <- lr; (rid, rk, rts) <- rr
        if lk == rk
        d = us(lts) - us(rts)
        if d >= -after * 1000000 && d <= before * 1000000
      } yield (lid, rid)).toSet
      assert(got == want, s"trial $trial before=$before after=$after")
    }
  }

  test("plan is an equi hash join, not a cross product with a filter") {
    val (l, r) = sides()
    val df = RangeJoin.band(l, r, "user_id", "ts", "ts", 600, 120, Seq("event_id"))
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"), physical)
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
  }

  test("reserved internal and generated output names are rejected, not shadowed") {
    val (l, r) = sides()
    val badInternal = l.withColumn("__band", org.apache.spark.sql.functions.lit(1))
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.band(badInternal, r, "user_id", "ts", "ts", 600, 0, Seq("event_id"))
    }
    assert(e1.getMessage.contains("__band"))
    val badOutput = l.withColumn("range_event_id", org.apache.spark.sql.functions.lit(1))
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.band(badOutput, r, "user_id", "ts", "ts", 600, 0, Seq("event_id"))
    }
    assert(e2.getMessage.contains("range_event_id"))
  }
}
