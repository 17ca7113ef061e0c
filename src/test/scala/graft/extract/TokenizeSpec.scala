package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.util.Rng

class TokenizeSpec extends AnyFunSuite {

  private def regexCount(s: String): Int = {
    val m = java.util.regex.Pattern.compile(Tokenize.BpePattern).matcher(s)
    var c = 0
    while (m.find()) c += 1
    c
  }

  test("BPE scanner equals the regex on hand-picked cases") {
    val cases = Seq(
      "", " ", "hello", "hello world", "  two  spaces ", "a1b2",
      "don't stop", "x=42; y=7!", "tab\tand\nnewline", " leading",
      "trailing ", "...", "a ... b 123", "café au lait", "¡hola! 世界")
    cases.foreach { s =>
      assert(Tokenize.bpeTokenCount(s) == regexCount(s), s"input: '$s'")
    }
  }

  test("BPE scanner equals the regex on randomized inputs") {
    val alphabet = "ab Z9 .,!\t\n\r\f  é#'-".toCharArray
    (0 until 300).foreach { i =>
      val rng = Rng.at(555, i)
      val s = new String(Array.fill(rng.nextInt(80))(alphabet(rng.nextInt(alphabet.length))))
      assert(Tokenize.bpeTokenCount(s) == regexCount(s), s"input: '$s'")
    }
  }

  test("letter/digit tokenizer yields offsets that slice back to the token") {
    val text = "The Quantum Falcon flew 42 km."
    val ts = Tokenize.tokens(text)
    assert(ts.map(_.norm) == Vector("the", "quantum", "falcon", "flew", "42", "km"))
    ts.foreach(t => assert(text.substring(t.start, t.end).toLowerCase == t.norm))
  }
}
