package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Hand-derived canonicalization cases — each rule exercised alone and in
  * combination, plus the cases the rules must NOT touch (path case, real
  * query params, non-default ports). */
class UrlCanonSpec extends SparkTestBase {

  private def canon(urls: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    urls.toDF("u").select(UrlCanon.canonical(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("each rule, hand-derived") {
    val cases = Seq(
      // scheme+host case, path case preserved
      "HTTPS://Host-3.Example/p/PaTh" -> "https://host-3.example/p/PaTh",
      // default ports dropped, scheme-dependent
      "https://h.example:443/p/1" -> "https://h.example/p/1",
      "http://h.example:80/p/1" -> "http://h.example/p/1",
      // non-default port kept
      "https://h.example:8443/p/1" -> "https://h.example:8443/p/1",
      // fragment dropped
      "https://h.example/p/1#sec-2" -> "https://h.example/p/1",
      // pure tracking query dropped; mixed query kept
      "https://h.example/p/1?utm_source=a&utm_medium=b" -> "https://h.example/p/1",
      "https://h.example/p/1?utm_source=a&page=2" -> "https://h.example/p/1?utm_source=a&page=2",
      "https://h.example/p/1?q=x" -> "https://h.example/p/1?q=x",
      // trailing slashes stripped, including the bare root
      "https://h.example/p/1/" -> "https://h.example/p/1",
      "https://h.example/" -> "https://h.example",
      // everything at once
      "HTTP://H.Example:80/a/B/?utm_x=1#f" -> "http://h.example/a/B",
      // idempotence on an already-canonical url
      "https://host-0.example/p/42" -> "https://host-0.example/p/42")
    val got = canon(cases.map(_._1): _*)
    cases.map(_._2).zip(got).zipWithIndex.foreach { case ((want, g), i) =>
      assert(g == want, s"case ${cases(i)._1}: got $g want $want")
    }
  }

  test("idempotent: canonical(canonical(u)) == canonical(u)") {
    val messy = Seq("HTTPS://A.B:443/x/?utm_a=1#f", "http://c.d:80/e//",
      "https://h/p?utm_1=x&utm_2=y", "https://h/p?keep=1&utm_2=y")
    val once = canon(messy: _*)
    val twice = canon(once: _*)
    assert(once == twice)
  }
}
