package graft.cj

import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** Stand-in for a filesystem needing session configuration (S3 credentials,
  * custom defaultFS): resolves only through `fs.graftfs.impl` and refuses to
  * initialize without its "credential" key — if the DSv2 reader built a blank
  * `new Configuration()` on the executor (the round-3 bug), opening a
  * `graftfs:` path there would fail. */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def initialize(uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration): Unit = {
    require(conf.get("graft.test.token") == "sesame",
      "graftfs needs its credential token from the session Hadoop conf")
    super.initialize(uri, conf)
  }
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}

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

  test("size-binned packing: every file exactly once, oversized files seed their own bins") {
    val tiny = (0 until 100).map(i => (f"f$i%03d.json", 10L))
    val big = Seq(("big.json", 200L << 20))
    val bins = CityJsonSource.packPartitions(tiny ++ big,
      maxPartitionBytes = 128L << 20, openCostInBytes = 4L << 20, minPartitionNum = 4)
    assert(bins.flatten.sorted.toSeq == (tiny ++ big).map(_._1).sorted)
    // 200MB exceeds maxSplitBytes alone: its bin holds only it
    assert(bins.find(_.contains("big.json")).get.length == 1)
    // 100 tiny files amortize into ~4MB-costed slots of 128MB bins, not 100 tasks
    assert(bins.length <= 6, s"${bins.length} bins: ${bins.map(_.length).mkString(",")}")
  }

  test("a 1,000-tiny-file corpus in nested dirs plans O(cores) partitions (recursive listing + packing)") {
    val dir = Files.createTempDirectory("cjpack")
    (0 until 1000).foreach { i =>
      val sub = dir.resolve(s"batch=${i % 7}") // corpus laid out in subdirectories
      Files.createDirectories(sub)
      Files.write(sub.resolve(s"doc$i.json"), "{}".getBytes("UTF-8"))
    }
    val cores = spark.sparkContext.defaultParallelism
    // tiny docs: a sub-default open cost is the honest model, and exercises
    // that the packing knobs flow from the session SQL conf into the scan
    spark.conf.set("spark.sql.files.openCostInBytes", (512L * 1024).toString)
    try {
      val df = spark.read.format("cityjson").load(dir.toString)
      val parts = df.rdd.getNumPartitions
      assert(parts <= cores * 4, s"$parts partitions for 1000 tiny files at $cores cores")
      assert(parts >= 1)
      // {} is an invalid CityJSON doc -> NULL-model contract: zero rows, no errors
      assert(df.count() == 0)
    } finally spark.conf.unset("spark.sql.files.openCostInBytes")
    // direct scan probe: all 1000 files listed recursively, each exactly once
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val scan = new CityJsonScan(dir.toString, CityJsonSource.schema, conf,
      maxPartitionBytes = 128L << 20, openCostInBytes = 512L * 1024, minPartitionNum = cores)
    val files = scan.planInputPartitions()
      .flatMap(_.asInstanceOf[CityJsonFilePartition].filePaths)
    assert(files.distinct.length == 1000, s"${files.distinct.length}")
  }

  test("the session Hadoop conf reaches executor-side readers (credentialed scheme end-to-end)") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    hc.set("fs.graftfs.impl.disable.cache", "true") // force initialize() per resolve
    hc.set("graft.test.token", "sesame")
    try {
      val expected = spark.read.format("cityjson").load(s"$examples/tetra.city.json").count()
      // the planned partition must KEEP the graftfs scheme (qualified against
      // the fs uri) — otherwise the reader-side resolution is not exercised
      val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
      val scan = new CityJsonScan(s"graftfs:$examples/tetra.city.json",
        CityJsonSource.schema, conf, 128L << 20, 4L << 20, 2)
      val partPaths = scan.planInputPartitions()
        .flatMap(_.asInstanceOf[CityJsonFilePartition].filePaths)
      assert(partPaths.nonEmpty && partPaths.forall(_.startsWith("graftfs:")), partPaths.toSeq)
      val df = spark.read.format("cityjson").load(s"graftfs:$examples/tetra.city.json")
      // the reader must open the graftfs: path on the executor with the
      // SESSION conf — a blank Configuration has neither the scheme mapping
      // nor the credential token and would throw
      assert(df.count() == expected && expected == 47)
    } finally {
      hc.unset("fs.graftfs.impl"); hc.unset("fs.graftfs.impl.disable.cache")
      hc.unset("graft.test.token")
    }
  }

  test("short name registration and single-file loads work") {
    val one = spark.read.format("cityjson").load(s"$examples/tetra.city.json")
    // tetra's golden triple count is 47 (CjIndependentGoldenSpec)
    assert(one.count() == 47)
    assert(one.select("doc_iri").distinct().head.getString(0) == "cj:tetra")
  }
}
