package graft.extract

/** Frozen tokenizer for mention detection: maximal runs of Unicode
  * letters/digits, with original-text offsets. Normalization = lowercase
  * (ROOT locale — no Turkish-i surprises). Pure function; no regex engine
  * in the hot loop.
  */
object Tokenize {
  final case class Token(start: Int, end: Int, norm: String)

  def tokens(text: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    val n = text.length
    var i = 0
    while (i < n) {
      if (Character.isLetterOrDigit(text.charAt(i))) {
        val s = i
        while (i < n && Character.isLetterOrDigit(text.charAt(i))) i += 1
        out += Token(s, i, text.substring(s, i).toLowerCase(java.util.Locale.ROOT))
      } else i += 1
    }
    out.result()
  }

  /** whitespace token count (the cheap `doc_token_count` metric) */
  def wsTokenCount(text: String): Int = {
    val t = text.trim
    if (t.isEmpty) 0 else t.split("\\s+").length
  }
}
