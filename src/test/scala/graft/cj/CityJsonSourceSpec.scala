package graft.cj

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CityJsonSourceSpec extends SparkTestBase {

  private val examples = "/root/reference/examples"

  test("DSv2 source emits exactly the triples of the mapPartitions path, per doc") {
    val viaSource = spark.read.format("cityjson").load(examples)
    assert(viaSource.columns.toSeq ==
      Seq("doc_iri", "subj", "pred", "obj_iri", "obj_lit", "obj_type"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val expected = CjSpark.convertStats(CjSpark.referenceCorpus(spark)).collect()
      .map(d => d.doc_iri -> d.n_triples).toMap
    // per-document triple counts match the established distributed path
    val got = viaSource.groupBy("doc_iri").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected.filter(_._2 > 0), s"$got vs $expected")
    // and the full triple multiset matches exactly
    val a = canon(viaSource.select("subj", "pred", "obj_iri", "obj_lit", "obj_type"))
    val b = canon(CjSpark.convert(CjSpark.referenceCorpus(spark)).toDF())
    assert(a == b, "DSv2 triple multiset diverged from CjSpark.convert")
  }

  test("column pruning is pushed into the DSv2 reader") {
    val df = spark.read.format("cityjson").load(examples).select("pred")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    val readSchema = scans.head.scan.readSchema()
    assert(readSchema.fieldNames.toSeq == Seq("pred"),
      s"reader must materialize only the pruned columns, got $readSchema")
    assert(df.distinct().count() > 10) // predicates across the corpus
  }

  test("one input partition per document file (per-doc parallelism)") {
    val scan = new CityJsonScan("/root/reference/examples", CityJsonSource.schema)
    val parts = scan.planInputPartitions()
    assert(parts.length == 12)
    assert(parts.map(_.asInstanceOf[CityJsonFilePartition].filePath).distinct.length == 12)
  }

  test("short name registration and single-file loads work") {
    val one = spark.read.format("cityjson").load(s"$examples/tetra.city.json")
    // tetra's golden triple count is 47 (CjIndependentGoldenSpec)
    assert(one.count() == 47)
    assert(one.select("doc_iri").distinct().head.getString(0) == "cj:tetra")
  }
}
