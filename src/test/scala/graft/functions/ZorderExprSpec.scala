package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ZorderExprSpec extends SparkTestBase {

  /** Naive bit-by-bit reference for the magic-mask ladder. */
  private def naive(a: Int, b: Int): Long = {
    val au = (a ^ Int.MinValue).toLong & 0xffffffffL
    val bu = (b ^ Int.MinValue).toLong & 0xffffffffL
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((au >> i) & 1L) << (2 * i + 1)
      z |= ((bu >> i) & 1L) << (2 * i)
      i += 1
    }
    z ^ Long.MinValue
  }

  test("interleave matches the bit-by-bit reference incl. negatives and extremes") {
    val rnd = new scala.util.Random(7)
    val probes = Seq(0, 1, -1, 42, -42, Int.MaxValue, Int.MinValue) ++
      Seq.fill(500)(rnd.nextInt())
    for (a <- probes; b <- probes.take(20))
      assert(ZorderExpr.interleave(a, b) == naive(a, b), s"($a, $b)")
  }

  test("signed z order is monotonic in each coordinate with the other fixed") {
    // this is the property the clustered layout leans on: walking one key
    // with the other pinned walks the curve monotonically, so coordinate
    // ranges map to contiguous-ish z ranges (incl. across the sign boundary
    // — the ent_id = -1 sentinel sorts just below ent 0)
    val vals = Seq(Int.MinValue, -1000, -1, 0, 1, 7, 4096, Int.MaxValue)
    for (fixed <- vals; w <- vals.sliding(2)) {
      assert(ZorderExpr.interleave(w(0), fixed) < ZorderExpr.interleave(w(1), fixed))
      assert(ZorderExpr.interleave(fixed, w(0)) < ZorderExpr.interleave(fixed, w(1)))
    }
  }

  test("long inputs outside 32 bits fail LOUDLY, never truncate") {
    intercept[ArithmeticException](ZorderExpr.intExact(1L << 33))
    intercept[ArithmeticException](ZorderExpr.intExact(Int.MinValue.toLong - 1))
    assert(ZorderExpr.intExact(Int.MaxValue.toLong) == Int.MaxValue)
    val sps = spark; import sps.implicits._
    ZorderExpr.register(spark)
    val df = Seq((5_000_000_000L, 1)).toDF("a", "b")
      .select(ZorderExpr.graft_zorder(col("a"), col("b")))
    val e = intercept[Exception](df.collect())
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(_.isInstanceOf[ArithmeticException]), e.toString)
  }

  test("codegen (DataFrame) and interpreted (eval) paths agree") {
    val sps = spark; import sps.implicits._
    ZorderExpr.register(spark)
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(300)(i => (rnd.nextInt().toLong, rnd.nextInt()))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), ZorderExpr.graft_zorder(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    for ((a, b) <- rows) {
      val expect = ZorderExpr.interleave(a.toInt, b)
      assert(got((a, b)) == expect)
      assert(ZorderExpr(Literal(a), Literal(b)).eval(null) == expect,
        "interpreted eval must match codegen")
    }
    // null in → null out (nullIntolerant)
    val z = Seq((Option.empty[Long], 3)).toDF("a", "b")
      .select(ZorderExpr.graft_zorder(col("a"), col("b"))).head
    assert(z.isNullAt(0))
  }
}
