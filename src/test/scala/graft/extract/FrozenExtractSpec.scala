package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.synth.PagesSynth

/** Freezes the extractor + generator against ANY drift (input_hint: text
  * must be byte-identical per url forever): hardcoded SHA-256 prefixes of
  * the extracted text for fixed page indices. If this test fails, the
  * extractor version MUST be bumped and downstream fingerprints regenerated
  * — never "fix" the hashes silently.
  */
class FrozenExtractSpec extends AnyFunSuite {

  private val frozen = Seq(
    ("https://host-4.example/p/0", 0L, "fdf8be669180d0ed"),
    ("https://host-1.example/p/1", 1L, "e85873258d53cbd7"),
    ("https://host-0.example/p/7", 7L, "a3d4a5a9bb39bbe2"),
    ("https://host-0.example/p/99", 99L, "c6d407c2324e0953"),
    ("https://host-1.example/p/1234", 1234L, "e94e3cc4193a005b"))

  test("extractor v1 output hashes are frozen per url") {
    assert(TextExtract.version == "1", "version bump requires regenerating frozen hashes")
    frozen.foreach { case (url, i, expect) =>
      val pg = PagesSynth.pageAt(i, 2000L)
      assert(pg.page.url == url, s"generator drift: url of page $i changed")
      val ext = TextExtract.extract(pg.page.html)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val h = md.digest(ext.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
      assert(h == expect, s"extraction drift on page $i ($url)")
      assert(ext == pg.page.text, "byte-identity invariant")
    }
  }
}
