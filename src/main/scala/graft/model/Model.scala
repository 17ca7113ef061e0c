package graft.model

/** Core data model of the KG-construction engine.
  *
  * A [[Triple]] is the materialized form of every observable output of the
  * reference converter (I-Sokolov/RDF.cityJSON): each engine call
  * `SetDatatypeProperty` / `SetObjectProperty` / `CreateInstance` /
  * `SetClassParent` becomes one (or one-per-element) triple row
  * (see /root/reference/CityJsonRDF/CityModel.cpp and SURVEY.md §1.2).
  *
  * Exactly one of `obj_iri` / `obj_lit` is non-null. `obj_type` carries the
  * literal datatype tag (reference type lattice {bool, double, string,
  * double[]}, CityModel.cpp:498-556) or null for object triples. `obj_lit`
  * additionally carries the element ordinal for array-valued object
  * properties (engine `SetObjectTypeProperty` / `set_objects`) so that
  * member order survives the set-oriented representation.
  */
final case class Triple(
    subj: String,
    pred: String,
    obj_iri: String,
    obj_lit: String,
    obj_type: String)

/** Converter log row: mirrors the reference's ILog::Message contract
  * (CityJsonRDF.h:34-38). `category` is the printf format string — the CLI
  * dedups by it (cityJSON2bin/Main.cpp:63-65); `path` is the ConverterState
  * JSON path (CommonDefs.h:106-162), our lineage mechanism.
  */
final case class LogRow(level: String, category: String, msg: String, path: String)

/** A Common-Crawl-style web page row — the north-rule input shape. */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** A detected entity mention in a page's extracted text. */
final case class Mention(
    url: String,
    span_start: Int,
    span_end: Int,
    surface: String,
    alias_norm: String)

/** A scored entity link (after alias-index resolution). */
final case class Link(
    url: String,
    span_start: Int,
    span_end: Int,
    surface: String,
    entity_iri: String,
    score: Double)

/** One alias-index row (the broadcast side of the link join). */
final case class Alias(alias_norm: String, entity_iri: String, prior: Double)

object Vocab {
  val RdfType = "rdf:type"
  val RdfName = "rdf:name"
  val RdfsSubClassOf = "rdfs:subClassOf"
  val OwlClass = "owl:Class"
  val OwlDatatypeProperty = "owl:DatatypeProperty"
  val OwlObjectProperty = "owl:ObjectProperty"
  val GraftRange = "graft:range"
  val GraftRestriction = "graft:restriction"

  val XsdString = "xsd:string"
  val XsdDouble = "xsd:double"
  val XsdBoolean = "xsd:boolean"
  val XsdLong = "xsd:long"
  val XsdDoubleArray = "xsd:double[]"
  val XsdLongArray = "xsd:long[]"

  // Web-text graft vocabulary
  val WebPage = "web:Page"
  val WebUrl = "web:url"
  val WebLang = "web:lang"
  val WebWarcTs = "web:warc_ts"
  val WebMentions = "web:mentions"
  val WebNChars = "web:n_chars"
}
