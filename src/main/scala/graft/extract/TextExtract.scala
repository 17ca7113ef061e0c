package graft.extract

/** FROZEN boilerplate-stripping text extractor (north-rule invariant:
  * byte-identical extracted `text` per url — BASELINE.json input_hint).
  *
  * Deterministic pure function over the html bytes: no locale, no regex
  * backtracking surprises, single forward scan. Versioned: any semantic
  * change must bump [[version]] and regenerate expected hashes in tests.
  *
  * Rules (v1):
  *   - bytes are decoded as UTF-8
  *   - <script>/<style> elements are dropped with their content
  *   - <nav>/<header>/<footer>/<aside> elements are dropped with content
  *     (boilerplate chrome)
  *   - HTML comments are dropped
  *   - remaining tags are stripped; close of a block element
  *     (p, div, h1..h6, li, br, tr, section, article) emits a newline
  *   - entities &amp; &lt; &gt; &quot; &#39; &nbsp; (and numeric &#NNN;)
  *     are decoded
  *   - runs of spaces/tabs collapse to one space; spaces around newlines
  *     are trimmed; leading/trailing whitespace trimmed; at most one
  *     consecutive newline survives
  */
object TextExtract {
  val version = "1"

  private val dropWithContent = Set("script", "style", "nav", "header", "footer", "aside")
  private val blockElems = Set("p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "br", "tr", "section", "article", "title")

  def extract(html: Array[Byte]): String = extract(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  def extract(html: String): String = {
    val out = new java.lang.StringBuilder(html.length / 2)
    val n = html.length
    var i = 0
    var dropUntil: String = null // inside a drop-with-content element

    def tagNameAt(start: Int): (String, Boolean, Int) = {
      // start points just after '<'; returns (lowercased name, isClose, index after '>')
      var j = start
      var close = false
      if (j < n && html.charAt(j) == '/') { close = true; j += 1 }
      val nameStart = j
      while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
      val name = html.substring(nameStart, j).toLowerCase
      while (j < n && html.charAt(j) != '>') j += 1
      (name, close, math.min(j + 1, n))
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val (name, close, after) = tagNameAt(i + 1)
          if (dropUntil != null) {
            if (close && name == dropUntil) dropUntil = null
            i = after
          } else if (!close && dropWithContent.contains(name)) {
            dropUntil = name
            i = after
          } else {
            if (close && blockElems.contains(name)) out.append('\n')
            if (!close && name == "br") out.append('\n')
            i = after
          }
        }
      } else if (dropUntil != null) {
        i += 1
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        if (semi > 0 && semi - i <= 8) {
          val ent = html.substring(i + 1, semi)
          val decoded = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "nbsp" => " "
            case e if e.startsWith("#") && e.drop(1).forall(_.isDigit) && e.length > 1 =>
              e.drop(1).toInt.toChar.toString
            case _ => null
          }
          if (decoded != null) { out.append(decoded); i = semi + 1 }
          else { out.append(c); i += 1 }
        } else { out.append(c); i += 1 }
      } else {
        out.append(if (c == '\t') ' ' else c)
        i += 1
      }
    }

    normalizeWhitespace(out.toString)
  }

  /** collapse space runs, trim around newlines, max one consecutive \n */
  private def normalizeWhitespace(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var pendingNewline = false
    var started = false
    s.foreach {
      case '\n' | '\r' => pendingNewline = true
      case ' ' => pendingSpace = true
      case ch =>
        if (started) {
          if (pendingNewline) out.append('\n')
          else if (pendingSpace) out.append(' ')
        }
        pendingSpace = false; pendingNewline = false
        started = true
        out.append(ch)
    }
    out.toString
  }
}
