package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import graft.model.Triple

/** N-Triples 1.1 serialization of the graft triple model — the standard
  * RDF interchange surface a user of the reference converter ultimately
  * wants (the reference emits an engine-native `.bin`; N-Triples is the
  * engine-neutral equivalent every triple store ingests).
  *
  * The engine's compact names (CURIEs like `web:mentions`, `cj:doc`,
  * bare names like `children`, dotted families like `city.prop.LoD`) map
  * to absolute IRIs through a fixed prefix table plus a default
  * namespace; name characters outside the unreserved set are
  * percent-encoded. Both mappings are BIJECTIVE, so
  * `parse(serialize(t)) == t` exactly — locked by the sink round-trip
  * matrix (KG corpus) and a dedicated CityJSON + adversarial-literal
  * spec. Literals get standard `\"`/`\\`/`\n`/`\r`/`\t` escapes (other
  * characters ride as UTF-8, as N-Triples 1.1 allows); typed literals
  * carry `^^<datatype>`.
  *
  * Serialization is a narrow per-row map (one text line per triple);
  * parsing is a narrow per-line scan. Both distribute like any other
  * columnar pass — the sink is `spark.read.text`/`write.text` underneath.
  */
object NTriples {

  /** prefix → namespace; longest-namespace wins on compaction */
  val Prefixes: Vector[(String, String)] = Vector(
    "rdf:" -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs:" -> "http://www.w3.org/2000/01/rdf-schema#",
    "owl:" -> "http://www.w3.org/2002/07/owl#",
    "xsd:" -> "http://www.w3.org/2001/XMLSchema#",
    "web:" -> "http://graft.example/web#",
    "ent:" -> "http://graft.example/entity#",
    "graft:" -> "http://graft.example/graft#",
    "cj:" -> "http://graft.example/cityjson#",
    "geom:" -> "http://graft.example/geom#")
  val DefaultNs = "http://graft.example/id/"

  private def needsEscape(c: Char): Boolean =
    !(c.isLetterOrDigit && c < 128) && c != '-' && c != '_' && c != '.' && c != '~'

  private[pipeline] def encodeName(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.getBytes("UTF-8").foreach { b =>
      val c = (b & 0xff).toChar
      if (c < 128 && !needsEscape(c)) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  private[pipeline] def decodeName(s: String): String = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3
      } else { out.write(c.toInt); i += 1 }
    }
    new String(out.toByteArray, "UTF-8")
  }

  /** Characters N-Triples 1.1 forbids inside an IRIREF (plus the ones that
    * would break our own line scan). Absolute IRIs pass through UNCHANGED
    * (percent-encoding them would break `parse∘line` bijectivity), so a
    * Triple carrying one of these in an absolute IRI cannot serialize
    * losslessly — [[line]] rejects it loudly instead of emitting a corrupt
    * or ambiguous line. */
  private def invalidInAbsoluteIri(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c <= ' ' || c == '<' || c == '>' || c == '"' || c == '{' || c == '}' ||
        c == '|' || c == '^' || c == '`' || c == '\\') return true
      i += 1
    }
    s.contains(AnnMarker) // would collide with the annotation convention
  }

  /** compact engine name → absolute IRI (bijective with [[compactIri]]) */
  def expandIri(name: String): String =
    if (name.contains("://")) { // already absolute (page urls)
      require(!invalidInAbsoluteIri(name),
        s"absolute IRI contains characters invalid in N-Triples (or the ${AnnMarker} marker): $name")
      name
    } else Prefixes.find { case (p, _) => name.startsWith(p) } match {
      case Some((p, ns)) => ns + encodeName(name.stripPrefix(p))
      case None => DefaultNs + encodeName(name)
    }

  def compactIri(iri: String): String =
    if (iri.startsWith(DefaultNs)) decodeName(iri.stripPrefix(DefaultNs))
    else Prefixes.find { case (_, ns) => iri.startsWith(ns) } match {
      case Some((p, ns)) => p + decodeName(iri.stripPrefix(ns))
      case None => iri // absolute url
    }

  private def escapeLit(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def unescapeLit(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb.append('\\'); case '"' => sb.append('"')
          case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
          case 't' => sb.append('\t')
          case other => sb.append('\\').append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Object triples may carry an annotation in obj_lit beside the obj_iri
    * (mention spans; the engine's array-element ordinals) — plain
    * N-Triples has no slot for it, so it rides as a `?graft_ann=` query
    * component on the object IRI. Bijective: a raw '?' inside a compact
    * name is itself percent-encoded, so the marker can only come from
    * this convention; pure-RDF consumers may strip it. */
  private val AnnMarker = "?graft_ann="

  def line(t: Triple): String = {
    require(t.obj_iri == null || t.obj_type == null,
      s"a triple cannot carry both obj_iri and obj_type (datatypes apply to literals): $t")
    val obj =
      if (t.obj_iri != null) {
        val ann = if (t.obj_lit != null) AnnMarker + encodeName(t.obj_lit) else ""
        s"<${expandIri(t.obj_iri)}$ann>"
      }
      else if (t.obj_type != null) "\"" + escapeLit(t.obj_lit) + "\"^^<" + expandIri(t.obj_type) + ">"
      else "\"" + escapeLit(t.obj_lit) + "\""
    s"<${expandIri(t.subj)}> <${expandIri(t.pred)}> $obj ."
  }

  /** Every delimiter lookup is bounds-checked with the offending line in
    * the message — a malformed line yields a clean IllegalArgumentException
    * (never StringIndexOutOfBounds or a runaway scan), which the lenient
    * reader turns into an error-side-channel row. */
  def parse(ln: String): Triple = {
    val (t, rest) = parseInner(ln)
    require(rest.isEmpty, s"unexpected term after the object (an N-Quads line? use parseQuad): $ln")
    t
  }

  /** N-Quads 1.1 line: the triple terms plus an OPTIONAL graph-label IRI
    * before the '.' — a line without one belongs to the default graph
    * (graph = null), exactly as the spec allows, so every valid N-Triples
    * file is also a valid N-Quads file through this parser. */
  def parseQuad(ln: String): (Triple, String) = {
    val (t, rest) = parseInner(ln)
    if (rest.isEmpty) (t, null)
    else {
      require(rest.startsWith("<") && rest.endsWith(">") && rest.indexOf('>') == rest.length - 1,
        s"graph label must be a single IRI: $ln")
      (t, compactIri(rest.substring(1, rest.length - 1)))
    }
  }

  /** Shared term scanner: parses subject/predicate/object and returns the
    * triple plus whatever sits between the object term and the final '.'
    * (empty for N-Triples, the graph IRI for N-Quads). */
  private def parseInner(ln: String): (Triple, String) = {
    val s = ln.trim
    require(s.endsWith("."), s"not an N-Triples line (no terminating '.'): $ln")
    def iriEnd(from: Int): Int = {
      val e = s.indexOf('>', from)
      require(e > 0, s"unterminated IRI (no '>'): $ln")
      e
    }
    require(s.startsWith("<"), s"subject must be an IRI: $ln")
    val se = iriEnd(1)
    val subj = compactIri(s.substring(1, se))
    val ps = s.indexOf('<', se + 1)
    require(ps > 0, s"missing predicate IRI: $ln")
    val pe = iriEnd(ps + 1)
    val pred = compactIri(s.substring(ps + 1, pe))
    var i = pe + 1
    while (i < s.length && s.charAt(i) == ' ') i += 1
    require(i < s.length - 1, s"missing object term: $ln")
    def rest(objEnd: Int): String = s.substring(objEnd + 1, s.length - 1).trim
    if (s.charAt(i) == '<') {
      val oe = iriEnd(i + 1)
      val raw = s.substring(i + 1, oe)
      val ann = raw.indexOf(AnnMarker)
      val t =
        if (ann >= 0)
          Triple(subj, pred, compactIri(raw.substring(0, ann)),
            decodeName(raw.substring(ann + AnnMarker.length)), null)
        else Triple(subj, pred, compactIri(raw), null, null)
      (t, rest(oe))
    } else {
      require(s.charAt(i) == '"', s"object must be IRI or literal: $ln")
      // find the closing unescaped quote
      var j = i + 1
      while (j < s.length && !(s.charAt(j) == '"' && {
        var bs = 0; var k = j - 1
        while (s.charAt(k) == '\\') { bs += 1; k -= 1 }
        bs % 2 == 0
      })) j += 1
      require(j < s.length, s"unterminated literal (no closing '\"'): $ln")
      val lit = unescapeLit(s.substring(i + 1, j))
      if (j + 2 < s.length && s.charAt(j + 1) == '^' && s.charAt(j + 2) == '^') {
        require(j + 4 < s.length && s.charAt(j + 3) == '<', s"malformed datatype suffix: $ln")
        val de = iriEnd(j + 4)
        (Triple(subj, pred, null, lit, compactIri(s.substring(j + 4, de))), rest(de))
      } else (Triple(subj, pred, null, lit, null), rest(j))
    }
  }

  /** Per-line error isolation for foreign files: a malformed line becomes a
    * Left(message) instead of failing the task — the P6 discipline
    * (per-object error isolation, cj/CjGeometry.scala) applied to the
    * interchange boundary, where other people's files are the norm.
    * Accepts N-Quads lines too (graph label DROPPED — N-Quads is a
    * superset format and a triple consumer reading a quads file should
    * see the triples, not an empty result); genuinely malformed tails
    * still error. */
  def parseEither(ln: String): Either[String, Triple] =
    parseQuadEither(ln).map(_._1)

  /** The ONE lenient parse shared by both distributed readers — a fix to
    * the error channel lands in one place. */
  def parseQuadEither(ln: String): Either[String, (Triple, String)] =
    try Right(parseQuad(ln))
    catch { case e if scala.util.control.NonFatal(e) => Left(String.valueOf(e.getMessage)) }

  /** GraphSink over N-Triples text files: the interchange layout. */
  final class Files(parts: Int = 32) extends GraphSink {
    val name = "ntriples"
    def write(triples: Dataset[Triple], target: String): Unit = {
      val spark = triples.sparkSession
      import spark.implicits._
      triples.repartition(parts).map(line).write.mode(SaveMode.Overwrite).text(target)
    }

    /** All lines, leniently: good triples carry a null `_error`; malformed
      * lines carry the parse failure (and null triple columns) — one
      * corrupt line in a foreign file never kills the distributed read. */
    def readAll(spark: SparkSession, target: String): DataFrame = {
      import spark.implicits._
      spark.read.textFile(target).map { ln =>
        parseEither(ln) match {
          case Right(t) => (t.subj, t.pred, t.obj_iri, t.obj_lit, t.obj_type, null: String)
          case Left(err) => (null: String, null: String, null: String, null: String, null: String, err)
        }
      }.toDF("subj", "pred", "obj_iri", "obj_lit", "obj_type", "_error")
    }

    /** Malformed lines only — the error side channel. */
    def errors(spark: SparkSession, target: String): DataFrame =
      readAll(spark, target).filter(col("_error").isNotNull).select("_error")

    def read(spark: SparkSession, target: String): DataFrame =
      readAll(spark, target).filter(col("_error").isNull).drop("_error")
  }

  /** N-Quads 1.1 line: [[line]] plus the graph-label IRI before the '.';
    * graph = null emits a plain (default-graph) N-Triples line. */
  def quadLine(t: Triple, graph: String): String =
    if (graph == null) line(t)
    else line(t).dropRight(1) + s"<${expandIri(graph)}> ."

  /** N-Quads text sink/source — the provenance-partitioned interchange form
    * (each crawl segment / source its own named graph). Input/output rows:
    * the five Triple columns + `graph` (null = default graph). Same
    * distribution shape as [[Files]]: narrow per-row serialize, narrow
    * per-line lenient parse with the error side channel. */
  object Quads {
    def write(quads: DataFrame, target: String, parts: Int = 32): Unit = {
      val spark = quads.sparkSession
      import spark.implicits._
      quads.select("subj", "pred", "obj_iri", "obj_lit", "obj_type", "graph")
        .as[(String, String, String, String, String, String)]
        .repartition(parts)
        .map { case (s, p, oi, ol, ot, g) => quadLine(Triple(s, p, oi, ol, ot), g) }
        .write.mode(SaveMode.Overwrite).text(target)
    }

    def readAll(spark: SparkSession, target: String): DataFrame = {
      import spark.implicits._
      spark.read.textFile(target).map { ln =>
        parseQuadEither(ln) match {
          case Right((t, g)) =>
            (t.subj, t.pred, t.obj_iri, t.obj_lit, t.obj_type, g, null: String)
          case Left(err) =>
            (null: String, null: String, null: String, null: String, null: String,
              null: String, err)
        }
      }.toDF("subj", "pred", "obj_iri", "obj_lit", "obj_type", "graph", "_error")
    }

    def read(spark: SparkSession, target: String): DataFrame =
      readAll(spark, target).filter(col("_error").isNull).drop("_error")
  }
}
