package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Tokenize

class TextOpsSpec extends AnyFunSuite {

  test("langId classifies stopword-rich samples and falls back to 'und'") {
    assert(TextOps.langId("the cat sat on the mat and it was happy") == "en")
    assert(TextOps.langId("der hund ist nicht auf der wiese und das ist gut") == "de")
    assert(TextOps.langId("le chat est dans la maison et il est content") == "fr")
    assert(TextOps.langId("el perro es muy grande y la casa es bonita") == "es")
    assert(TextOps.langId("xyzzy plugh qwerty") == "und")
    assert(TextOps.langId("") == "und")
  }

  test("quality features count punctuation, digits and stopwords") {
    val q = TextOps.quality("The cat, the dog; 42 birds!")
    assert(q.n_punct == 3)
    assert(q.n_digits == 2)
    assert(q.n_tokens == 6)
    assert(q.stopword_hits == 2)
    assert(q.score > 0 && q.score <= 1)
  }

  test("simhash: identical texts collide, different texts differ") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    assert(TextOps.simhash64(a) == TextOps.simhash64(a))
    val b = a.replace("gamma", "CHANGED")
    assert(TextOps.hamming(TextOps.simhash64(a), TextOps.simhash64(b)) > 0)
    assert(TextOps.hamming(TextOps.simhash64(a), TextOps.simhash64(b)) < 32)
  }

  test("tokenizer emits offsets that slice back to the surface") {
    val t = "Hello, World 42!"
    val toks = Tokenize.tokens(t)
    assert(toks.map(_.norm) == Vector("hello", "world", "42"))
    toks.foreach(tok => assert(t.substring(tok.start, tok.end).toLowerCase == tok.norm))
    assert(Tokenize.wsTokenCount("  a  b\tc \n") == 3)
    assert(Tokenize.wsTokenCount("") == 0)
  }

  test("minhash signatures approximate jaccard") {
    val a = TextOps.shingles("alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val b = TextOps.shingles("alpha beta gamma delta epsilon zeta eta theta iota CHANGED")
    val sa = TextOps.minhashSignature(a)
    val sb = TextOps.minhashSignature(b)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.length
    val real = TextOps.jaccard(a, b)
    assert(math.abs(est - real) < 0.25, s"est $est real $real")
  }

  test("hyperplane buckets are deterministic and separate far vectors") {
    val v1 = Array.fill(16)(1.0f)
    val v2 = v1.map(-_)
    assert(TextOps.hyperplaneBucket(v1) == TextOps.hyperplaneBucket(v1))
    assert(TextOps.hyperplaneBucket(v1) == (~TextOps.hyperplaneBucket(v2) & 0xfff))
  }
}
